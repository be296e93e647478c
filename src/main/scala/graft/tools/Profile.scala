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

    val shing = docs.select(col("doc_id"),
      explode(graft.functions.ShingleOps.wordShinglesCol(col("text"), 3)).as("s"))
    time("explode-shingles")(shing.count())
    val lanes = (0 until 16).map(i => min(xxhash64(col("s"), lit(i))).as(s"h$i"))
    val sig = shing.groupBy(col("doc_id")).agg(lanes.head, lanes.tail: _*)
    time("sig-agg")(sig.count())
    time("candidates")(Dedup.minhashCandidates(docs, "doc_id", "text").count())
    time("candidates-warm")(Dedup.minhashCandidates(docs, "doc_id", "text").count())

    // q18 phase breakdown
    val cust = graft.Tables.customer(spark, sfDir).selectExpr("c_custkey",
      "CAST((c_custkey * 37) % 17000 AS DOUBLE) / 100 - 85 AS lat",
      "CAST((c_custkey * 91) % 35000 AS DOUBLE) / 100 - 175 AS lon")
    val supp = graft.Tables.supplier(spark, sfDir).selectExpr("s_suppkey",
      "CAST((s_suppkey * 53) % 17000 AS DOUBLE) / 100 - 85 AS s_lat",
      "CAST((s_suppkey * 71) % 35000 AS DOUBLE) / 100 - 175 AS s_lon")
    val R = 2000000.0
    time("geo-radius-cand")(graft.operators.GeoJoin.radiusJoin(
      cust, supp, R, "lat", "lon", "s_lat", "s_lon").count())
    val cand = graft.operators.GeoJoin.radiusJoin(
      cust, supp, R, "lat", "lon", "s_lat", "s_lon")
    val ranked = graft.operators.Transforms.topKPerGroup(cand,
      Seq(org.apache.spark.sql.functions.col("c_custkey")),
      Seq(col("dist_m").asc, col("s_suppkey").asc), 3, "knn_rank")
    time("geo-ranked")(ranked.count())
    time("geo-uncovered")(cust.join(
      ranked.filter(col("knn_rank") === 3).select("c_custkey"),
      Seq("c_custkey"), "left_anti").count())
    time("geo-knn-full")(graft.operators.GeoJoin.knnJoin(cust, supp, 3, R,
      "c_custkey", "s_suppkey", "lat", "lon", "s_lat", "s_lon").count())
    spark.stop()
  }
}
