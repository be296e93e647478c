package graft

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Transforms
import graft.sources.JdbcIngest

/** S9 end-to-end against a REAL database: embedded Derby (bundled with
  * Spark) — subquery pushdown, filter pushdown into the JDBC WHERE clause,
  * range-partitioned parallel read, and a write round-trip. The in-memory
  * DB is visible to executor threads because local mode is one JVM; on a
  * cluster the same code points at a networked database. */
class JdbcSpec extends AnyFunSuite {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = new Properties()

  private lazy val setup: Unit = {
    System.setProperty("derby.stream.error.file", "target/derby.log")
    val con = DriverManager.getConnection(url)
    val st = con.createStatement()
    st.execute(
      """CREATE TABLE readings (
        |  site VARCHAR(16) NOT NULL,
        |  seq BIGINT NOT NULL,
        |  ts TIMESTAMP NOT NULL,
        |  val DOUBLE NOT NULL)""".stripMargin)
    val ins = con.prepareStatement("INSERT INTO readings VALUES (?, ?, ?, ?)")
    var seq = 0L
    for (site <- Seq("alpha", "beta", "gamma"); day <- 1 to 9) {
      ins.setString(1, site)
      ins.setLong(2, seq)
      ins.setTimestamp(3, java.sql.Timestamp.valueOf(f"2026-03-$day%02d 12:00:00"))
      ins.setDouble(4, seq * 1.5)
      ins.executeUpdate()
      seq += 1
    }
    ins.close(); st.close(); con.close()
  }

  test("watermark subquery is aggregated database-side (S9 read shape)") {
    setup
    val spark = SparkTestBase.session
    val wm = JdbcIngest.readWatermarks(spark, url, "readings", "site", "ts")
    // the scan's relation IS the subquery — Spark reads 3 rows, not 27
    val rel = wm.queryExecution.analyzed.collectLeaves().mkString
    assert(rel.contains("GROUP BY"), s"subquery not pushed: $rel")
    val got = wm.collect().map(r => r.getString(0) -> r.getTimestamp(1).toString).toMap
    assert(got == Map(
      "alpha" -> "2026-03-09 12:00:00.0",
      "beta" -> "2026-03-09 12:00:00.0",
      "gamma" -> "2026-03-09 12:00:00.0"))
  }

  test("filter + projection reach the database (PushedFilters in the plan)") {
    setup
    val spark = SparkTestBase.session
    val df = JdbcIngest.readTable(spark, url, "readings")
      .filter(col("val") > 30.0)
      .select("site", "seq", "val")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("GreaterThan(VAL,30.0)") || plan.contains("VAL > 30"), plan)
    assert(df.count() == 27 - 21) // seq*1.5 > 30 → seq >= 21
  }

  test("watermark filter over a real JDBC incremental load (J1 over S9)") {
    setup
    val spark = SparkTestBase.session
    // yesterday's watermarks: pretend the last load saw up to day 7
    val wm = JdbcIngest.readQuery(spark, url,
      "SELECT site, MAX(ts) AS max_date FROM readings WHERE ts < TIMESTAMP('2026-03-08 00:00:00') GROUP BY site")
    val incoming = JdbcIngest.readTable(spark, url, "readings")
    val fresh = Transforms.watermarkFilter(incoming, wm,
      Seq("SITE"), "TS", "MAX_DATE")
    // only days 8 and 9 survive, per site
    assert(fresh.count() == 3 * 2)
    assert(fresh.agg(min(col("TS"))).head().getTimestamp(0).toString
      .startsWith("2026-03-08"))
  }

  test("range-partitioned parallel read opens N concurrent cursors") {
    setup
    val spark = SparkTestBase.session
    val df = JdbcIngest.readPartitioned(spark, url, "readings",
      "seq", 0L, 27L, 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 27)
    // partition bounds must not drop or duplicate boundary rows
    assert(df.agg(countDistinct(col("SEQ"))).head().getLong(0) == 27)
  }

  test("write round-trip: append aggregates back, read them again") {
    setup
    val spark = SparkTestBase.session
    val daily = JdbcIngest.readTable(spark, url, "readings")
      .groupBy(col("SITE"))
      .agg(count(lit(1)).cast("long").as("N"), sum(col("VAL")).as("TOTAL"))
    JdbcIngest.append(daily, url, "site_totals")
    val back = JdbcIngest.readTable(spark, url, "site_totals")
    val got = back.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = daily.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want && got.size == 3)
  }
}
