package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev-only: count "Exchange hashpartitioning" lines in executedPlan
  * strings (the ScaleSpec lock metric) for given queries at sf0.001. */
object ExCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      val p = graft.SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString
      println(s"$n hashEx=" +
        p.split("\n").count(_.contains("Exchange hashpartitioning")))
    }
    spark.stop()
  }
}
