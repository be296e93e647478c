package graft.tools
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
object P88 {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s (n=$n)")
    }
    val docs = graft.Tables.documents(s, d).filter(length(trim(col("text"))) > 0)
    time("warm scan")(docs.count())
    time("tokens only")(docs.select(size(TextFunctions.tokens(lower(col("text")))).as("n")).agg(sum("n")).head().getLong(0))
    def sh3raw = explode(TextFunctions.wordShinglesRaw(TextFunctions.tokens(lower(col("text"))), 3)).as("s")
    time("raw shingle explode")(docs.select(col("doc_id"), sh3raw).count())
    val bench = docs.filter(col("doc_id") < 2).select(sh3raw).distinct()
    time("bench build")(bench.count())
    time("full q88")(graft.SparkEntry.queries("q88_decontamination")(s, d).count())
    time("full q88 again")(graft.SparkEntry.queries("q88_decontamination")(s, d).count())
    s.stop()
  }
}
