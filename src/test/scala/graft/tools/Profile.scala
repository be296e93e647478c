package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Scratch profiling main for local iteration (not part of the contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    // q95 phase breakdown
    val par = spark.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    val perDoc = spread
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        explode(TextFunctions.wordShinglesRaw(
          TextFunctions.tokens(lower(col("text"))), 5)).as("s"))
      .groupBy(col("doc_id"), col("s")).agg(count(lit(1)).as("_m"))
    time("q95-perDoc")(perDoc.count())
    time("q95-perDoc-again")(perDoc.count())
    val dict = perDoc.groupBy(col("s")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2).select(col("s"), lit(1).as("_b"))
    time("q95-dict")(dict.count())
    time("q95-full") {
      val r = perDoc.join(broadcast(dict), Seq("s"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_distinct"),
          count(col("_b")).cast("long").as("n_boiler"))
      r.write.format("noop").mode("overwrite").save(); 0L
    }
    time("q95-op-cold") {
      Dedup.boilerplateSpans(docs, "doc_id", "text", 5, 2)
        .write.format("noop").mode("overwrite").save(); 0L
    }
    time("q95-op-warm") {
      Dedup.boilerplateSpans(docs, "doc_id", "text", 5, 2)
        .write.format("noop").mode("overwrite").save(); 0L
    }
    spark.stop()
  }
}
