package graft.tools
import org.apache.spark.sql.SparkSession
object TenXCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("target/scale_rehearsal_docs.parquet")
    def t(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[10x] $n: ${(System.nanoTime()-t0)/1e9}%.1f s count=$c")
    }
    (1 to 2).foreach { i =>
      t(s"q121-$i")(graft.operators.Dedup.prefixJaccardPairs(docs, "doc_id", "text").count())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      t(s"q154-$i")(graft.operators.Dedup.containmentPairs(docs, "doc_id", "text").count())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
