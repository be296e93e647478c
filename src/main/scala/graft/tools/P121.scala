package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: q121 stage timing at a given sfDir. */
object P121 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r"); r
    }
    import graft.functions.TextFunctions
    val docs = graft.Tables.documents(spark, d)
    val toks = docs.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        explode(TextFunctions.charShingles(
          TextFunctions.normalize(col("text")), 8)).as("tok"))
      .distinct()
    val t2 = time("toks count")(toks.count())
    val toksC = time("toks checkpoint")(toks.localCheckpoint())
    val dfreq = toksC.groupBy(col("tok")).agg(count(lit(1)).as("dfreq"))
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val ranked = toksC.join(dfreq, "tok")
      .withColumn("rn", row_number().over(wDoc.orderBy(col("dfreq"), col("tok"))))
      .withColumn("n", count(lit(1)).over(wDoc))
    time("ranked count")(ranked.count())
    val wTok = org.apache.spark.sql.expressions.Window.partitionBy(col("tok"))
    val prefix = ranked
      .filter(col("rn") <= col("n") - expr("(n * 3 + 4) DIV 5") + 1)
      .select(col("doc_id"), col("tok"))
      .withColumn("nd", count(lit(1)).over(wTok))
      .filter(col("nd") <= 20)
      .select(col("doc_id"), col("tok"))
    time("prefix count")(prefix.count())
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    time("cand count")(cand.count())
    val candC = cand.localCheckpoint()
    val arrs = docs.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        TextFunctions.charShingleHashes(
          TextFunctions.normalize(col("text")), 8).as("tokset"))
      .withColumn("n", size(col("tokset")))
    time("arrs count")(arrs.count())
    val fin = candC
      .join(arrs.as("sa"), col("sa.doc_id") === col("d1"))
      .join(arrs.as("sb"), col("sb.doc_id") === col("d2"))
      .withColumn("n_inter",
        TextFunctions.sortedIntersectCount(col("sa.tokset"), col("sb.tokset")))
      .filter(col("n_inter") * 5 >= (col("sa.n") + col("sb.n") - col("n_inter")) * 3)
    time("final count")(fin.count())
    spark.stop()
  }
}
