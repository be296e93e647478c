package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Disposable isolation probe for the prefix-aggregate gap (r15): times the
  * join, the bare aggregates (no explode), and the exploded forms for both
  * the PrefixMinK and collect_list shapes, and prints the physical plans —
  * to localize whether the delta is the aggregate operator, the exchange,
  * or a plan-shape difference (join strategy / AQE decision). */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(args.headOption.getOrElse(
      "target/scale_rehearsal_docs.parquet"))
    val (numT, denT) = (3, 5)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }

    val base = docs.filter(length(trim(col("text"))) > 0)
    val toks = base
      .select(col("doc_id"),
        TextFunctions.charShingles(
          TextFunctions.normalize(col("text")), 8).as("arr"))
      .select(col("doc_id"), size(col("arr")).as("n"),
        explode(col("arr")).as("tok")) // recompute config — the P121 shape
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("dfreq"))
    val joined = toks.join(dfreq, "tok")
    time("join-only")(joined.count())
    time("join-only-warm")(joined.count())

    val aggNew = joined.groupBy(col("doc_id"))
      .agg(graft.functions.PrefixMinK.column(numT, denT)(
        col("n"), col("dfreq"), col("tok")).as("pk"))
    // count() PRUNES the aggregate function — force eval via an aggregate
    // over the result column instead
    time("agg-new-forced")(
      aggNew.agg(max(size(col("pk.items")))).head().getInt(0).toLong)
    time("agg-new-forced-warm")(
      aggNew.agg(max(size(col("pk.items")))).head().getInt(0).toLong)

    val aggOld = joined.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("dfreq"), col("tok"))).as("td"))
    time("agg-old-forced")(
      aggOld.agg(max(size(col("td")))).head().getInt(0).toLong)
    time("agg-old-forced-sortslice")(
      aggOld.select(expr(s"slice(array_sort(td), 1, size(td) - (size(td) " +
        s"* $numT + ${denT - 1}) DIV $denT + 1)").as("it"))
        .agg(max(size(col("it")))).head().getInt(0).toLong)

    val newFull = aggNew
      .select(col("doc_id"), col("pk.n").as("n"),
        explode(col("pk.items")).as("x"))
      .select(col("doc_id"), col("n"), col("x.tok").as("tok"))
    time("new-exploded")(newFull.count())
    time("new-exploded-warm")(newFull.count())
    val oldFull = aggOld
      .select(col("doc_id"), size(col("td")).as("n"), explode(expr(
        s"slice(array_sort(td), 1, size(td) - (size(td) * $numT + ${denT - 1}) DIV $denT + 1)")).as("x"))
      .select(col("doc_id"), col("n"), col("x.tok").as("tok"))
    time("old-exploded")(oldFull.count())
    time("old-exploded-warm")(oldFull.count())

    val newHinted = toks.join(dfreq.hint("merge"), "tok")
      .groupBy(col("doc_id"))
      .agg(graft.functions.PrefixMinK.column(numT, denT)(
        col("n"), col("dfreq"), col("tok")).as("pk"))
      .select(col("doc_id"), col("pk.n").as("n"),
        explode(col("pk.items")).as("x"))
      .select(col("doc_id"), col("n"), col("x.tok").as("tok"))
    time("new-merge-hint")(newHinted.count())
    time("new-merge-hint-warm")(newHinted.count())
    println("==== HINTED final (post-AQE) ====")
    println(newHinted.queryExecution.executedPlan.toString.take(3000))

    println("==== NEW plan ====")
    newFull.explain()
    println("==== OLD plan ====")
    oldFull.explain()
    spark.stop()
  }
}
