package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Transforms

/** The four market-data incremental pipelines, as batch transforms over
  * staged inputs (the HTTP fetch itself is an ingestion-adapter concern —
  * SURVEY §4: adapters accept pushed date ranges so the watermark bounds
  * the fetch, exactly like the reference's API params).
  */
object MarketPipelines {

  /** Yahoo historical prices (`HTGPIYAHOO/__init__.py:40-96`): drop rows with
    * null Close (F14 `:52-53`), then per-symbol watermark application (J1
    * `:74-96`) — one broadcast join instead of the reference's per-symbol
    * Python loop. */
  def yahoo(prices: DataFrame, watermarks: DataFrame): DataFrame =
    Transforms.stampActualizacion(
      Transforms.watermarkFilter(
        prices.na.drop(Seq("Close")),
        watermarks, Seq("Symbol"), "Date", "max_date"))

  /** Agricensus FOB feed (`HTGPIAGRICENSUS/__init__.py:69-93`): CSV-over-
    * HTTP staged to a path, drop the junk `name` column (P2 `:77`), keep
    * rows strictly newer than the global watermark (P3 `:80-82`), stamp the
    * load date (F11 `:84`); the empty-result guard (P7 `:86-87`) is the
    * caller's `isEmpty` check before the sink. */
  def agricensus(feed: DataFrame, maxDate: java.sql.Date): DataFrame = {
    // a null watermark would make `date > NULL` drop every row — the
    // bootstrap (no watermark yet) must be explicit, not a silent no-op
    require(maxDate != null,
      "agricensus: null watermark; pass an epoch sentinel for the first load")
    Transforms.stampActualizacion(
      feed.drop("name").filter(col("date") > lit(maxDate)))
  }

  /** S&P 500 via the chart JSON payload (`HTGPISNP500/__init__.py:84-92`):
    * F15 nested extraction — `result[0].response[0]` arrays of epoch-second
    * timestamps zipped with closes — then P4 range filter
    * `(wm + 1 day, now - 1 day]`. */
  def snp500(payload: DataFrame, watermark: java.sql.Timestamp,
      now: java.sql.Timestamp): DataFrame = {
    val zipped = payload.select(
      explode(arrays_zip(
        col("chart.result")(0)("timestamp"),
        col("chart.result")(0)("indicators")("quote")(0)("close"))).as("z"))
    // TIMESTAMP interval arithmetic, not date_add: the reference's
    // `timedelta(days=1)` keeps time-of-day, and Yahoo bars carry market
    // time — date_add would truncate both bounds to midnight, excluding
    // same-day bars inside the documented (wm + 1 day, now − 1 day]
    // window until the next run (r14 review).
    Transforms.stampActualizacion(
      zipped.select(
        timestamp_seconds(col("z.timestamp")).as("Date"),
        col("z.close").cast("double").as("Close"))
        .filter(col("Date") > lit(watermark) + expr("INTERVAL 1 DAY") &&
          col("Date") <= lit(now) - expr("INTERVAL 1 DAY")))
  }

  /** WTI oil JSON `[Date, Close]` pairs (`HTGPIOILWTI/__init__.py:68-91`):
    * global MAX watermark, empty-result guard (P7 `:90-91`). */
  def oilWti(pairs: DataFrame, watermark: java.sql.Date): Option[DataFrame] = {
    val out = Transforms.stampActualizacion(
      pairs.select(to_date(col("Date")).as("Date"), col("Close").cast("double"))
        .filter(col("Date") > lit(watermark)))
    if (out.isEmpty) None else Some(out)
  }

  /** CFTC disaggregated futures (`HTGPICFT/__init__.py:92-107`): managed-money
    * net position `calculo = Long - Short` (F13 `:102`), `año` (F10 `:105`),
    * NaN→0 (F14 `:103`), watermark on report date (P3 `:104`). */
  def cftc(report: DataFrame, watermark: java.sql.Date): DataFrame =
    Transforms.stampActualizacion(
      report
        .na.fill(0.0, Seq("M_Money_Positions_Long_ALL", "M_Money_Positions_Short_ALL"))
        .withColumn("calculo",
          col("M_Money_Positions_Long_ALL") - col("M_Money_Positions_Short_ALL"))
        .withColumn("año", year(col("Report_Date_as_MM_DD_YYYY")))
        .filter(col("Report_Date_as_MM_DD_YYYY") > lit(watermark)))
}
