package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Disposable r16 probe: is the r15 `n`-carrying explode shape evaluating
  * charShingles twice per row? Times localCheckpoint of the r14 shape
  * (bare explode), the r15 shape (arr select → size + explode), and a
  * posexplode-free variant, and prints the optimized plans. */
object Q245Probe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val par = spark.sparkContext.defaultParallelism

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p3] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def release(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(
        _.unpersist(blocking = true))

    (1 to 2).foreach { round =>
      println(s"=== round $round ===")
      val spread =
        if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
      val base = spread.filter(length(trim(col("text"))) > 0)
      val old14 = base.select(col("doc_id"),
        explode(TextFunctions.charShingles(
          TextFunctions.normalize(col("text")), 8)).as("tok"))
      val new15 = base.select(col("doc_id"),
        TextFunctions.charShingles(
          TextFunctions.normalize(col("text")), 8).as("arr"))
        .select(col("doc_id"), size(col("arr")).as("n"),
          explode(col("arr")).as("tok"))
      val sh = TextFunctions.charShingles(
        TextFunctions.normalize(col("text")), 8)
      val fix16 = base
        .select(col("doc_id"), size(sh).as("n"), col("text"))
        .select(col("doc_id"), col("n"), explode(sh).as("tok"))
      time("ckpt-r14-shape")(old14.localCheckpoint()); release()
      time("ckpt-r15-shape")(new15.localCheckpoint()); release()
      time("ckpt-r16-shape")(fix16.localCheckpoint()); release()
      if (round == 1) {
        println("---- r15 optimized plan ----")
        println(new15.queryExecution.optimizedPlan.toString.take(1200))
        println("---- r16 optimized plan ----")
        println(fix16.queryExecution.optimizedPlan.toString.take(1200))
      }
    }
    spark.stop()
  }
}
