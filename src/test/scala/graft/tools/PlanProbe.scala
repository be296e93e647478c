package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val left = (1 to 5).map(i =>
      (i.toLong, ((i * 37) % 17000) / 100.0 - 85, ((i * 91) % 35000) / 100.0 - 175))
      .toDF("lid", "lat", "lon")
    val right = (1 to 4).map(i =>
      (i.toLong, ((i * 53) % 17000) / 100.0 - 85, ((i * 71) % 35000) / 100.0 - 175))
      .toDF("rid", "s_lat", "s_lon")
    val planned = graft.operators.GeoJoin.knnBroadcastPlanned(left, right, 2,
      "lid", "rid", "lat", "lon", "s_lat", "s_lon")
    println("=== executedPlan"); println(planned.queryExecution.executedPlan)
    println("=== rows")
    planned.collect().foreach(println)
    spark.stop()
  }
}
