package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver corpus (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. `/root/testdata/sf0.01`) and read the
  * TPC-H-ish tables plus `events`, `documents`, `embeddings` from it. Schemas
  * are fixed in the parquet footers, so no `inferSchema` cost; Catalyst prunes
  * columns and pushes filters into the vectorized parquet scan.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** Normalize an event-time column to session-TZ `TIMESTAMP`, whatever
    * physical parquet encoding it arrived in. Corpus regenerations have
    * shipped all three, and any pandas/Arrow-written lake will too:
    *   - `TIMESTAMP(NANOS)` → Spark reads it only as a nanosecond long
    *     (`spark.sql.legacy.parquet.nanosAsLong=true`, set by
    *     Verify/Bench/tests); exact `div 1000` to micros — the corpus has
    *     microsecond granularity, so lossless.
    *   - `TIMESTAMP(MICROS, isAdjustedToUTC=false)` → Spark reads
    *     `TIMESTAMP_NTZ`; every entry point pins the session TZ to UTC, so
    *     `cast(TimestampType)` reinterprets the naive micros as UTC exactly —
    *     matching DuckDB's naive-timestamp semantics in the oracle.
    *   - `TIMESTAMP` (UTC-adjusted) → pass-through. */
  def normalizeEventTime(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case LongType =>
        // `div` is SQL integer division — exact on the full long range,
        // unlike Column./ which widens to double and loses ns precision.
        df.withColumn(colName, timestamp_micros(expr(s"`$colName` div 1000")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case _ => df
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTime(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
