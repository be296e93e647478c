package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q154 containment stage probe (r11; r15 refresh): times the shipped
  * operator on the sf0.1 documents table and prints the post-AQE join
  * strategies, to attribute band movement to plan shape vs host axis. */
object P154 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[p154] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }

    (1 to 3).foreach { i =>
      time(s"containment-run$i") {
        graft.operators.Dedup.containmentPairs(docs, "doc_id", "text")
          .write.format("noop").mode("overwrite").save(); 0L
      }
    }
    val df = graft.operators.Dedup.containmentPairs(docs, "doc_id", "text")
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    println("[p154] join nodes: " + plan.linesIterator
      .filter(l => l.contains("Join") || l.contains("BroadcastExchange"))
      .map(_.trim.take(90)).mkString(" | "))
    spark.stop()
  }
}
