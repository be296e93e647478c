package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Prints Catalyst's static size estimate for the exploded toks chain on
  * the sf0.1 documents table and the rehearsal corpora — calibrates the
  * danger-zone condition for the r15 honest-stats checkpoint. */
object EstProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val inputs = Seq(
      "sf0.001" -> graft.Tables.documents(spark, "/root/testdata/sf0.001"),
      "sf0.01" -> graft.Tables.documents(spark, "/root/testdata/sf0.01"),
      "sf0.1" -> graft.Tables.documents(spark, "/root/testdata/sf0.1"),
      "rehearsal10x" ->
        spark.read.parquet("target/scale_rehearsal_docs.parquet"))
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    println(s"[est] autoBroadcastJoinThreshold=$thr")
    inputs.foreach { case (name, docs) =>
      val base = docs.filter(length(trim(col("text"))) > 0)
      val toksPlan = base
        .select(col("doc_id"),
          TextFunctions.charShingles(
            TextFunctions.normalize(col("text")), 8).as("arr"))
        .select(col("doc_id"), size(col("arr")).as("n"),
          explode(col("arr")).as("tok"))
      val est = toksPlan.queryExecution.optimizedPlan.stats.sizeInBytes
      val inEst = docs.queryExecution.optimizedPlan.stats.sizeInBytes
      println(s"[est] $name input=$inEst toksPlan=$est")
    }
    spark.stop()
  }
}
