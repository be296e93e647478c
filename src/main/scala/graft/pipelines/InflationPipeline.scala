package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Transforms

/** US inflation ingestion (`HTGPIINFLATUS/__init__.py:80-113`).
  *
  * Reference pattern: `pd.read_html(...)` wide year×month table → drop the
  * last 3 aggregate columns → melt to long `(Year, Month, Inflation)` →
  * month-name → number dict → `'–'`/empty → null repair → end-of-month date →
  * keep rows newer than the watermark → stamp → CSV.
  */
object InflationPipeline {

  val monthCols: Seq[String] = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  private val monthNum: Map[String, String] = monthCols.zipWithIndex
    .map { case (m, i) => m -> f"${i + 1}%02d" }.toMap

  /** Wide → long with month numbers, numeric repair, end-of-month date
    * (SO2 melt `__init__.py:91`, F9 `relativedelta(day=31)` → `last_day`). */
  def transform(wide: DataFrame): DataFrame = {
    val long = Transforms.melt(
      wide.select(col("Year") +: monthCols.map(c => col(c).cast("string")): _*),
      Seq("Year"), monthCols, "Month", "InflationRaw")
    long
      .withColumn("Month", element_at(typedLit(monthNum), col("Month")))
      .withColumn("Inflation",
        when(col("InflationRaw").isin("–", "-", ""), lit(null))
          .otherwise(col("InflationRaw")).try_cast("double"))
      .drop("InflationRaw")
      .withColumn("date",
        last_day(to_date(concat_ws("-", col("Year"), col("Month"), lit("01")))))
  }

  /** P3 watermark + stamp (`__init__.py:100-102,110-111`). */
  def incremental(long: DataFrame, watermark: java.sql.Date): DataFrame =
    Transforms.stampActualizacion(long.filter(col("date") > lit(watermark)))
}
