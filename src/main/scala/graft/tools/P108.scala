package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Corpus

/** Scratch q108 phase profiling (not part of the contract). */
object P108 {
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
    val docs = graft.Tables.documents(spark, sfDir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[p108] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // warm
    docs.count()
    val bi = Corpus.docBigrams(docs, "doc_id", "text")
    time("bigrams")(bi.count())
    time("bigrams-again")(bi.count())
    val model = Corpus.bigramModel(bi)
    time("model-fit")(model.count())
    val ckpt = model.localCheckpoint()
    time("ckpt-again")(ckpt.count())
    time("full")(Corpus.bigramSurprisal(docs, "doc_id", "text").count())
    time("full-again")(Corpus.bigramSurprisal(docs, "doc_id", "text").count())
    spark.stop()
  }
}
