package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: phase timing for the q18 broadcast kNN path (not part of the
  * contract). */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val cust = graft.Tables.customer(spark, sfDir).selectExpr("c_custkey",
      "CAST((c_custkey * 37) % 17000 AS DOUBLE) / 100 - 85 AS lat",
      "CAST((c_custkey * 91) % 35000 AS DOUBLE) / 100 - 175 AS lon")
    val supp = graft.Tables.supplier(spark, sfDir).selectExpr("s_suppkey",
      "CAST((s_suppkey * 53) % 17000 AS DOUBLE) / 100 - 85 AS s_lat",
      "CAST((s_suppkey * 71) % 35000 AS DOUBLE) / 100 - 175 AS s_lon")

    time("count-right")(supp.count())
    val bc = time("build-df")(graft.operators.GeoJoin.knnBroadcast(
      cust, supp, 3, "c_custkey", "s_suppkey", "lat", "lon", "s_lat", "s_lon"))
    time("run1")(bc.write.format("noop").mode("overwrite").save())
    time("run2")(bc.write.format("noop").mode("overwrite").save())
    bc.explain("formatted")

    // q38 radius join phases
    val rj = graft.operators.GeoJoin.radiusJoin(
      cust, supp, 1000000.0, "lat", "lon", "s_lat", "s_lon")
    time("radius-run1")(rj.write.format("noop").mode("overwrite").save())
    time("radius-run2")(rj.write.format("noop").mode("overwrite").save())
    val lExp = cust.withColumn("gk", explode(array((1 to 9).map(i =>
      struct(lit(i).as("band"), lit(i).as("cell"))): _*)))
    time("explode-only")(lExp.write.format("noop").mode("overwrite").save())
    rj.explain("formatted")

    // raw scalar loop cost for comparison
    val pts = supp.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val custRows = cust.collect().map(r => (r.getDouble(1), r.getDouble(2)))
    time("driver-loop") {
      var acc = 0.0
      custRows.foreach { case (la, lo) =>
        pts.foreach { case (_, sla, slo) =>
          acc += graft.functions.GeoFunctions.haversine(la, lo, sla, slo)
        }
      }
      println(s"[probe] acc=$acc")
    }
    spark.stop()
  }
}
