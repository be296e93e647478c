package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Transforms

/** S2 — fixed-width text source (NOAA ENSO `.for` layout:
  * `pd.read_fwf(widths=[10,5,4,...], skiprows=4)`,
  * `HTGPIENSO/__init__.py:77-78`).
  *
  * Implemented as `spark.read.text` + per-column `substring` projection, so
  * the scan is distributed and the slicing is codegen'd — unlike the
  * reference's driver-side pandas parse. Header skipping is positional
  * (`monotonically_increasing_id` is NOT safe across multiple files; we use a
  * per-file line index via `input_file_name`-free zipWithIndex only when
  * `skipLines > 0` — acceptable because headers exist only in single-file
  * feeds like the reference's).
  */
object FixedWidthReader {

  def read(spark: SparkSession, path: String, layout: Seq[(String, Int)],
      skipLines: Int = 0): DataFrame = {
    val raw = spark.read.text(path)
    val body =
      if (skipLines == 0) raw
      else {
        // Single-feed header skip: index lines within the (single) file.
        val rdd = raw.rdd.zipWithIndex().filter(_._2 >= skipLines).map(_._1)
        spark.createDataFrame(rdd, raw.schema)
      }
    body.select(Transforms.parseFixedWidth(col("value"), layout): _*)
  }
}
