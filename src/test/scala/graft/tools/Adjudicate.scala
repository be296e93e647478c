package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (not part of the contract): runs each named query K times in
  * ONE warm JVM with Bench's exact hygiene (noop sink, unpersist+cache
  * clear between runs) and prints every iteration. Separates the
  * first-execution floor (codegen compile + JIT) from the steady state —
  * the adjudication evidence VERDICT items ask for when an in-run bench
  * number looks off. Usage:
  *   sbt "runMain graft.tools.Adjudicate q186_linear_attribution q25_quality_score"
  */
object Adjudicate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      sec
    }

    runOnce("q01_pricing_summary") // executor + parquet warmup
    val names =
      if (args.nonEmpty) args.toSeq.filter(graft.SparkEntry.queries.contains)
      else Seq("q186_linear_attribution", "q25_quality_score",
        "q121_prefix_jaccard")
    names.foreach { n =>
      val ts = (1 to reps).map(_ => runOnce(n))
      println(f"[adjudicate] $n reps=${ts.map(t => f"$t%.2f").mkString(",")} " +
        f"first=${ts.head}%.2f warm_min=${ts.tail.min}%.2f")
    }
    spark.stop()
  }
}
