package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch: where does q01's time go — scan, decimal convert, or agg? */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = graft.Tables.lineitem(spark, sfDir)
    time("scan-all-cols")(li.write.format("noop").mode("overwrite").save())
    time("scan-again")(li.write.format("noop").mode("overwrite").save())
    val one = lit(1).cast(DecimalType(4, 2))
    val price = col("l_extendedprice").cast(DecimalType(12, 2))
    val disc = one - col("l_discount").cast(DecimalType(4, 2))
    val tax = one + col("l_tax").cast(DecimalType(4, 2))
    val q01 = li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
      sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
      sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_base_price"),
      sum(price * disc).cast("double").as("sum_disc_price"),
      sum(price * disc * tax).cast("double").as("sum_charge"),
      count(lit(1)).as("count_order"))
    time("q01-decimal")(q01.write.format("noop").mode("overwrite").save())
    time("q01-decimal2")(q01.write.format("noop").mode("overwrite").save())
    // long-cents variant
    def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
    val p100 = cents(col("l_extendedprice"))
    val d100 = lit(100L) - cents(col("l_discount"))
    val t100 = lit(100L) + cents(col("l_tax"))
    val q01c = li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
      (sum(cents(col("l_quantity"))).cast("double") / 100.0).as("sum_qty"),
      (sum(p100).cast("double") / 100.0).as("sum_base_price"),
      ((sum((p100 * d100).cast(DecimalType(18, 0)))
        / lit(10000)).cast("double")).as("sum_disc_price"),
      ((sum((p100 * d100 * t100).cast(DecimalType(18, 0)))
        / lit(1000000)).cast("double")).as("sum_charge"),
      count(lit(1)).as("count_order"))
    time("q01-cents")(q01c.write.format("noop").mode("overwrite").save())
    time("q01-cents2")(q01c.write.format("noop").mode("overwrite").save())
    // compare values
    val a = q01.orderBy("l_returnflag", "l_linestatus").collect()
    val b = q01c.orderBy("l_returnflag", "l_linestatus").collect()
    println("[probe] equal=" + a.zip(b).forall { case (x, y) =>
      (2 to 5).forall(i => x.getDouble(i) == y.getDouble(i)) })
    spark.stop()
  }
}
