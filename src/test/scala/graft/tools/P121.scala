package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Scratch phase breakdown for q121 prefixJaccardPairs (dev probe).
  * Arg: a raw documents parquet path (e.g. the ScaleRehearsal corpus
  * `target/scale_rehearsal_docs.parquet`) — defaults to the
  * `SPARK_GRAFT_SF_DIR` documents table. The staged section mirrors the
  * SHIPPED operator shape (aggregate + semi-join cap, PPJoin length
  * filter), so per-stage numbers localize rehearsal-band variance to
  * explode / prefix aggregate / candidates / verify (r12 VERDICT item 7). */
object P121 {
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
    val docs = args.headOption match {
      case Some(p) if p.endsWith(".parquet") => spark.read.parquet(p)
      case _ => graft.Tables.documents(spark, sfDir)
    }
    val (idCol, textCol) = ("doc_id", "text")
    val (shingleK, numT, denT, maxDocsPerTok) = (8, 3, 5, 20)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[p121] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val par = spark.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    val base = spread.filter(length(trim(col(textCol))) > 0)
    // checkpointed like the shipped small-input shape — ALSO the honest-
    // stats guard (r15): without it the content-blind static estimate can
    // broadcast the exploded fan-out side of the dfreq join
    val toks = base
      .select(col(idCol).as("doc_id"),
        TextFunctions.charShingles(
          TextFunctions.normalize(col(textCol)), shingleK).as("arr"))
      .select(col("doc_id"), size(col("arr")).as("n"),
        explode(col("arr")).as("tok"))
      .localCheckpoint()
    time("toks")(toks.count())
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("dfreq"))
    time("dfreq")(dfreq.count())
    val wTok = org.apache.spark.sql.expressions.Window.partitionBy(col("tok"))
    // staged probe = the SHIPPED shape: n carried on the tok rows, prefix
    // via the native bounded k-min aggregate (r15 — replaced collect_list
    // + array_sort + slice, the ~50% stage), the hot-token cap as
    // aggregate + semi-join (splittable), PPJoin length filter at the
    // candidate level
    // the replaced declarative form, kept as an A/B stage so the table
    // records the delta on the same corpus/run
    val prefixOld = toks.join(dfreq, "tok")
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("dfreq"), col("tok"))).as("td"))
      .select(col("doc_id"), size(col("td")).as("n"), explode(expr(
        s"slice(array_sort(td), 1, size(td) - (size(td) * $numT + ${denT - 1}) DIV $denT + 1)")).as("x"))
      .select(col("doc_id"), col("n"), col("x.tok").as("tok"))
    time("prefix-collect-list-OLD")(prefixOld.count())
    val prefix0 = toks.join(dfreq, "tok")
      .groupBy(col("doc_id"))
      .agg(graft.functions.PrefixMinK.column(numT, denT)(
        col("n"), col("dfreq"), col("tok")).as("pk"))
      .select(col("doc_id"), col("pk.n").as("n"),
        explode(col("pk.items")).as("x"))
      .select(col("doc_id"), col("n"), col("x.tok").as("tok"))
    time("prefix-pre-cap")(prefix0.count())
    val keepToks = prefix0.groupBy(col("tok"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") <= maxDocsPerTok).select(col("tok"))
    val prefix = prefix0
      .join(keepToks, "tok")
      .select(col("doc_id"), col("n"), col("tok"))
      .localCheckpoint()
    time("prefix-capped-ckpt")(prefix.count())
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .filter(least(col("a.n"), col("b.n")) * denT >=
        greatest(col("a.n"), col("b.n")) * numT)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    time("cand")(cand.count())
    val arrs = docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        TextFunctions.charShingleHashes(
          TextFunctions.normalize(col(textCol)), shingleK).as("tokset"))
      .withColumn("n", size(col("tokset")))
    time("arrs")(arrs.count())
    val joined = cand
      .join(arrs.as("sa"), col("sa.doc_id") === col("d1"))
      .join(arrs.as("sb"), col("sb.doc_id") === col("d2"))
      .withColumn("n_inter",
        TextFunctions.sortedIntersectCount(col("sa.tokset"), col("sb.tokset")))
    time("verify")(joined.count())
    time("full-op") {
      graft.operators.Dedup.prefixJaccardPairs(docs, idCol, textCol)
        .write.format("noop").mode("overwrite").save(); 0L
    }
    time("full-op-warm") {
      graft.operators.Dedup.prefixJaccardPairs(docs, idCol, textCol)
        .write.format("noop").mode("overwrite").save(); 0L
    }

    // Variant B: localCheckpoint the corpus-sized toks so dfreq + join read
    // one materialization instead of recomputing the explode.
    def variantB(): Long = {
      val toksC = base
        .select(col(idCol).as("doc_id"),
          explode(TextFunctions.charShingles(
            TextFunctions.normalize(col(textCol)), shingleK)).as("tok"))
        .localCheckpoint()
      val dfreqB = toksC.groupBy(col("tok")).agg(count(lit(1)).as("dfreq"))
      val prefixB = toksC.join(dfreqB, "tok")
        .groupBy(col("doc_id"))
        .agg(collect_list(struct(col("dfreq"), col("tok"))).as("td"))
        .select(col("doc_id"), explode(expr(
          s"slice(array_sort(td), 1, size(td) - (size(td) * $numT + ${denT - 1}) DIV $denT + 1)")).as("x"))
        .select(col("doc_id"), col("x.tok").as("tok"))
        .withColumn("nd", count(lit(1)).over(wTok))
        .filter(col("nd") <= maxDocsPerTok)
        .select(col("doc_id"), col("tok"))
        .localCheckpoint()
      val candB = prefixB.as("a")
        .join(prefixB.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
      val r = candB
        .join(arrs.as("sa"), col("sa.doc_id") === col("d1"))
        .join(arrs.as("sb"), col("sb.doc_id") === col("d2"))
        .withColumn("n_inter",
          TextFunctions.sortedIntersectCount(col("sa.tokset"), col("sb.tokset")))
        .count()
      toksC.unpersist(); r
    }
    time("variantB-ckpt-toks")(variantB())
    time("variantB-warm")(variantB())

    // Variant C: dfreq via a count window over tok — one pass over toks,
    // no join, at the price of an unsplittable per-tok window partition.
    def variantC(): Long = {
      val prefixC = toks
        .withColumn("dfreq", count(lit(1)).over(wTok))
        .groupBy(col("doc_id"))
        .agg(collect_list(struct(col("dfreq"), col("tok"))).as("td"))
        .select(col("doc_id"), explode(expr(
          s"slice(array_sort(td), 1, size(td) - (size(td) * $numT + ${denT - 1}) DIV $denT + 1)")).as("x"))
        .select(col("doc_id"), col("x.tok").as("tok"))
        .withColumn("nd", count(lit(1)).over(wTok))
        .filter(col("nd") <= maxDocsPerTok)
        .select(col("doc_id"), col("tok"))
        .localCheckpoint()
      val candC = prefixC.as("a")
        .join(prefixC.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
      candC
        .join(arrs.as("sa"), col("sa.doc_id") === col("d1"))
        .join(arrs.as("sb"), col("sb.doc_id") === col("d2"))
        .withColumn("n_inter",
          TextFunctions.sortedIntersectCount(col("sa.tokset"), col("sb.tokset")))
        .count()
    }
    time("variantC-window-dfreq")(variantC())
    time("variantC-warm")(variantC())
    spark.stop()
  }
}
