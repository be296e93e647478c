package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch warm/cold timing for q154 containmentPairs (dev probe). */
object P154 {
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
    val docs = graft.Tables.documents(spark, sfDir)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.operators.Dedup.containmentPairs(docs, "doc_id", "text",
          shingleK = 8, numT = 3, denT = 4, maxDocsPerTok = 20)
        .write.format("noop").mode("overwrite").save()
      println(f"[p154] run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
