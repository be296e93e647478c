package graft.tools
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
object P121b {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p121b] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      val par = s.sparkContext.defaultParallelism
      val spread = if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
      val base = spread.filter(length(trim(col("text"))) > 0)
      val toks = time("A toks ckpt")(base.select(col("doc_id"),
        explode(TextFunctions.charShingles(
          TextFunctions.normalize(col("text")), 8)).as("tok")).localCheckpoint())
      val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("dfreq"))
      val prefixPre = toks.join(broadcast(dfreq), "tok")
        .groupBy(col("doc_id"))
        .agg(collect_list(struct(col("dfreq"), col("tok"))).as("td"))
        .select(col("doc_id"), explode(expr(
          "slice(array_sort(td), 1, size(td) - (size(td) * 3 + 4) DIV 5 + 1)")).as("x"))
        .select(col("doc_id"), col("x.tok").as("tok"))
      val keepToks = prefixPre.groupBy(col("tok")).agg(count(lit(1)).as("nd"))
        .filter(col("nd") <= 20).select(col("tok"))
      val prefix = time("B prefix ckpt")(prefixPre
        .join(broadcast(keepToks), "tok")
        .select(col("doc_id"), col("tok")).localCheckpoint())
      val cand = prefix.as("a").join(prefix.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct()
      val arrs = docs.filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), TextFunctions.charShingleHashes(
          TextFunctions.normalize(col("text")), 8).as("tokset"))
        .withColumn("n", size(col("tokset")))
      val candC = cand.localCheckpoint()
      println("cand ckpt parts=" + candC.rdd.getNumPartitions)
      time("C1 cand ckpt")(candC.count())
      time("C2 arrs sa broadcast build")(arrs.count())
      val j = candC
        .join(arrs.as("sa"), col("sa.doc_id") === col("d1"))
        .join(arrs.as("sb"), col("sb.doc_id") === col("d2"))
      time("C3 join only noop")(j.select(col("d1"), col("d2")).write.format("noop").mode("overwrite").save())
      val jr = candC.repartition(par)
        .join(arrs.as("sa"), col("sa.doc_id") === col("d1"))
        .join(arrs.as("sb"), col("sb.doc_id") === col("d2"))
        .withColumn("n_inter", TextFunctions.sortedIntersectCount(col("sa.tokset"), col("sb.tokset")))
        .filter(col("n_inter") * 5 >= (col("sa.n") + col("sb.n") - col("n_inter")) * 3)
      time("C5 respread intersect noop")(jr.select(col("d1"), col("d2"), col("n_inter")).write.format("noop").mode("overwrite").save())
      val j6 = candC.repartition(par)
        .join(arrs.as("sa"), col("sa.doc_id") === col("d1"))
        .join(arrs.as("sb"), col("sb.doc_id") === col("d2"))
        .select(col("d1"), col("d2"), (size(col("sa.tokset")) + size(col("sb.tokset"))).as("sz"))
      time("C6 arrays through join, no scan")(j6.write.format("noop").mode("overwrite").save())
      val j7 = candC.repartition(par)
        .join(arrs.as("sa"), col("sa.doc_id") === col("d1"))
        .join(arrs.as("sb"), col("sb.doc_id") === col("d2"))
        .select(sum(size(col("sa.tokset"))+size(col("sb.tokset"))).as("work"))
      time("C7 total scan work")(println("  work=" + j7.head.getLong(0)))
      val j8 = candC.repartition(par)
        .join(arrs.as("sa"), col("sa.doc_id") === col("d1"))
        .join(arrs.as("sb"), col("sb.doc_id") === col("d2"))
        .filter(least(col("sa.n"), col("sb.n")) * 5 >= greatest(col("sa.n"), col("sb.n")) * 3)
        .withColumn("n_inter", TextFunctions.sortedIntersectCount(col("sa.tokset"), col("sb.tokset")))
        .filter(col("n_inter") * 5 >= (col("sa.n") + col("sb.n") - col("n_inter")) * 3)
      time("C8 sizefilter+intersect")(j8.select(col("d1"), col("d2"), col("n_inter")).write.format("noop").mode("overwrite").save())
      val j9 = candC.repartition(par)
        .join(arrs.as("sa"), col("sa.doc_id") === col("d1"))
        .join(arrs.as("sb"), col("sb.doc_id") === col("d2"))
        .filter(least(col("sa.n"), col("sb.n")) * 5 >= greatest(col("sa.n"), col("sb.n")) * 3)
      time("C9 survivors count")(println("  survivors=" + j9.count()))
      val ji = j.withColumn("n_inter", TextFunctions.sortedIntersectCount(col("sa.tokset"), col("sb.tokset")))
        .filter(col("n_inter") * 5 >= (col("sa.n") + col("sb.n") - col("n_inter")) * 3)
      time("C4 with intersect noop")(ji.select(col("d1"), col("d2"), col("n_inter")).write.format("noop").mode("overwrite").save())
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking=false))
    }
    s.stop()
  }
}
