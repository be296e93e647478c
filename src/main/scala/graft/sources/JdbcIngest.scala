package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S9 — JDBC ingestion with database-side pushdown.
  *
  * The reference reads watermarks and slices with hand-built SQL over a
  * driver-side connection (`HTGPIOILWTI/__init__.py:57-66`,
  * `HTIPNEXSITE/__init__.py:92-131`, `HTGPIPROPHEDEX/__init__.py:78-87`):
  * one cursor, one machine. Spark-first form:
  *
  *  - aggregates/joins that must run IN the database go in as a derived
  *    table (`(SELECT ...) t`) — the engine ships the whole subquery and
  *    reads only its result ([[readQuery]]);
  *  - row filters on a plain table scan stay declarative — Catalyst
  *    compiles `.filter` into the JDBC `WHERE` clause (PushedFilters),
  *    so the database, not Spark, drops the rows;
  *  - large tables split into `numPartitions` range-bounded SELECTs that
  *    executors open in parallel ([[readPartitioned]]) — the 100 TB shape:
  *    per-executor connections, no single-cursor bottleneck.
  */
object JdbcIngest {

  /** Ship a whole query to the database; Spark reads only its result set.
    * The subquery alias is required by the JDBC source contract. */
  def readQuery(spark: SparkSession, url: String, sql: String,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, s"($sql) pushed", props)

  /** The reference's watermark read: `SELECT key, MAX(ts) GROUP BY key`,
    * aggregated database-side. */
  def readWatermarks(spark: SparkSession, url: String, table: String,
      key: String, ts: String, out: String = "max_date",
      props: Properties = new Properties()): DataFrame =
    readQuery(spark, url, s"SELECT $key, MAX($ts) AS $out FROM $table GROUP BY $key", props)

  /** Plain table scan — pair with `.filter`/`.select`, which reach the
    * database as `WHERE` / column lists via Catalyst pushdown. */
  def readTable(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Range-partitioned parallel scan: `numPartitions` concurrent
    * range-bounded cursors across the executors. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long, numPartitions: Int,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lower, upper, numPartitions, props)

  /** Append a result back (the reference's INSERT loop,
    * `HTGPIOILWTI/__init__.py:88-96` — here one distributed batched write). */
  def append(df: DataFrame, url: String, table: String,
      props: Properties = new Properties()): Unit =
    df.write.mode("append").jdbc(url, table, props)
}
