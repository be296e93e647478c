package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Scratch: phase timing for q29/q30 portable hash paths. */
object HashProbe {
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
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.Tables.documents(spark, sfDir)
    docs.write.format("noop").mode("overwrite").save() // warm scan

    // q30 phases
    val toks = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(TextFunctions.normalize(col("text")))).as("t"))
    time("q30-toks")(toks.write.format("noop").mode("overwrite").save())
    val nibCols = (0 until 16).map(q =>
      conv(substring(md5(col("t")), q + 1, 1), 16, 10).cast("int").as(s"nib$q"))
    val nibs = toks.select(col("doc_id") +: nibCols: _*)
    time("q30-nibs")(nibs.write.format("noop").mode("overwrite").save())
    val bitSums = (0 until 64).map { j =>
      sum(shiftright(col(s"nib${j / 4}"), 3 - j % 4).bitwiseAND(lit(1))).as(s"s$j")
    }
    val agg = nibs.groupBy(col("doc_id")).agg(count(lit(1)).as("n"), bitSums: _*)
    time("q30-agg")(agg.write.format("noop").mode("overwrite").save())
    time("q30-agg2")(agg.write.format("noop").mode("overwrite").save())

    // q29 phases
    val shing = docs.select(col("doc_id"),
      explode(graft.functions.ShingleOps.wordShinglesCol(col("text"), 3)).as("s"))
      .select(col("doc_id"), md5(col("s")).as("ph"))
    time("q29-prep")(shing.write.format("noop").mode("overwrite").save())
    val lanes = (0 until 16).map(i => min(substring(col("ph"), 2 * i + 1, 8)).as(s"h$i"))
    val sig = shing.groupBy(col("doc_id")).agg(lanes.head, lanes.tail: _*)
    time("q29-sig")(sig.write.format("noop").mode("overwrite").save())
    time("q29-full")(Dedup.minhashCandidatesPortable(docs, "doc_id", "text")
      .write.format("noop").mode("overwrite").save())
    time("q29-full-xx")(Dedup.minhashCandidates(docs, "doc_id", "text")
      .write.format("noop").mode("overwrite").save())

    // q28 phases
    val sample = docs.filter(col("doc_id") % 20 === 0)
    val sh28 = sample.select(col("doc_id"), col("lang").as("blk"),
      explode(TextFunctions.charShingles(lower(col("text")), 3)).as("s")).distinct()
    time("q28-shingles")(sh28.write.format("noop").mode("overwrite").save())
    time("q28-full")(Dedup.ngramJaccardPairs(sample, "doc_id", "text", "lang", 3)
      .write.format("noop").mode("overwrite").save())
    time("q28-full2")(Dedup.ngramJaccardPairs(sample, "doc_id", "text", "lang", 3)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
