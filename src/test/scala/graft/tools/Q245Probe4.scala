package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Disposable r16 adjudication probe: the EXACT r14 q245 chain
  * (collect_list + array_sort + slice, no n column, inputSmall-gated
  * checkpoint) vs the current Dedup.prefixHotness, interleaved on the
  * same host/JVM — separates the band question from host speed. */
object Q245Probe4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (numT, denT) = (3, 5)
    val par = spark.sparkContext.defaultParallelism

    def release(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(
        _.unpersist(blocking = true))
    def time(name: String)(f: => Array[_]): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p4] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=${r.length}")
      release()
    }

    def r14chain(): Array[_] = {
      val spread =
        if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
      val base = spread.filter(length(trim(col("text"))) > 0)
      val toksPlan = base.select(col("doc_id"),
        explode(TextFunctions.charShingles(
          TextFunctions.normalize(col("text")), 8)).as("tok"))
      val toks = toksPlan.localCheckpoint()
      val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("dfreq"))
      val prefixPre = toks.join(dfreq, "tok")
        .groupBy(col("doc_id"))
        .agg(collect_list(struct(col("dfreq"), col("tok"))).as("td"))
        .select(col("doc_id"), size(col("td")).as("n"), explode(expr(
          s"slice(array_sort(td), 1, size(td) - (size(td) * $numT + ${denT - 1}) DIV $denT + 1)")).as("x"))
        .select(col("doc_id"), col("n"), col("x.tok").as("tok"))
      prefixPre.groupBy(col("tok")).agg(count(lit(1)).as("nd"))
        .groupBy(col("nd")).agg(count(lit(1)).as("n_toks"))
        .orderBy(col("nd").desc).collect()
    }

    (1 to 3).foreach { i =>
      time(s"r14-chain-$i")(r14chain())
      time(s"current-$i")(
        Dedup.prefixHotness(docs, "doc_id", "text").collect())
    }
    spark.stop()
  }
}
