package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Transforms

/** WASDE supply/use sheet extraction — the reference's hardest code:
  * ~1,000 lines of positional header detection + stateful row iteration per
  * page (`HTGPIWASDE/__init__.py:248-1196`, SURVEY §7.4 risk 1).
  *
  * Re-expressed Spark-first over a `(sheet, rowIdx, geo, beginning,
  * production, imports, dom_feed, dom_total, exports, ending)` row table
  * (the XLS→rows decode is an ingestion-adapter step — Apache-POI-style
  * binary parsing is out of scope for the engine itself, see SURVEY §2.1 S6):
  *
  *  - the reference's "remember the current group while iterating" state
  *    (`:684-690`) becomes a last-non-null carry-forward window (W4);
  *  - blank continuation geographies (`:807-808,924-925`) likewise;
  *  - footnote markers `1/..10/` are stripped by one regex (`:1198-1202`);
  *  - `''`/`'NA'` → 0 numeric repair (`:1204-1207`);
  *  - `Total Use` and guarded `Stocks to Use` (`:714-718,388-396`).
  *
  * Everything is a window/projection over `(sheet, rowIdx)` — embarrassingly
  * parallel across sheets at scale, ordered within a sheet.
  */
object WasdeTransforms {

  val groupLabels: Seq[String] = Seq("World", "Major Exporters", "Major Importers")
  val skipLabels: Seq[String] = Seq("Selected Other")

  private val numericCols = Seq("beginning", "production", "imports",
    "dom_feed", "dom_total", "exports", "ending")

  /** Strip footnote markers (`1/` … `10/`) from a label. Word-boundary +
    * 1-2 digits only, so harvest-year labels like `2025/26` survive. */
  def stripFootnotes(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(c, "\\b\\d{1,2}/", ""))

  /** Parse one or many sheets of supply/use rows into the measured table. */
  def parseSupplyUse(rows: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("sheet")).orderBy(col("rowIdx"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val labeled = rows
      .withColumn("label", stripFootnotes(col("geo")))
      // group-header rows carry no numbers
      .withColumn("is_group", col("label").isin(groupLabels: _*))
      // year header rows like `2025/26 (Est.)` / `2025/26 (Proj.)`
      .withColumn("is_year", col("label").rlike("^\\d{4}/\\d{2}"))
      .withColumn("grupo",
        last(when(col("is_group"), col("label")), ignoreNulls = true).over(run))
      .withColumn("tipo",
        last(when(col("is_year"),
          when(col("label").contains("Est"), "EST")
            .when(col("label").contains("Proj"), "PROJ")
            .otherwise("YEAR")), ignoreNulls = true).over(run))
      .withColumn("harvest",
        last(when(col("is_year"), regexp_extract(col("label"), "^(\\d{4}/\\d{2})", 1)),
          ignoreNulls = true).over(run))
      // blank continuation geography → previous row's geography
      .withColumn("geography",
        last(when(col("label") =!= "", col("label")), ignoreNulls = true).over(run))

    val measured = numericCols.foldLeft(labeled) { (df, c) =>
      df.withColumn(c, Transforms.repairNumeric(col(c)))
    }

    measured
      .filter(!col("is_group") && !col("is_year") &&
        !col("geography").isin(skipLabels: _*) && col("grupo").isNotNull)
      .withColumn("total_use", col("dom_total") + col("exports"))
      .withColumn("stocks_to_use",
        Transforms.guardedRatio(col("ending"), col("total_use"), lit(100)))
      .withColumn("orden",
        row_number().over(Window.partitionBy(col("sheet"), col("tipo"))
          .orderBy(col("rowIdx"))))
      .select(Seq(col("sheet"), col("rowIdx"), col("grupo"), col("tipo"),
        col("harvest"), col("geography"), col("orden")) ++
        numericCols.map(col) ++
        Seq(col("total_use"), col("stocks_to_use")): _*)
  }

  /** SO4 — the p11 transpose (`HTGPIWASDE/__init__.py:358,369`): a block
    * parsed as attributes-as-rows × years-as-columns flips to one row per
    * year with attributes as columns. `DataFrame.T` in pandas; melt + pivot
    * here (blocks are <20×10, but the plan is distributed regardless). */
  def transposeBlock(block: DataFrame, attrCol: String,
      yearCols: Seq[String]): DataFrame = {
    val long = Transforms.melt(block, Seq(attrCol), yearCols, "year", "v")
    val attrs = block.select(col(attrCol)).collect().map(_.getString(0)).toSeq
    Transforms.pivotAgg(long, Seq(col("year")), attrCol, attrs,
      Seq(first(col("v"))))
  }

  /** Idempotent month re-load: the reference DELETEs the month slice before
    * re-inserting (`HTGPIWASDE/__init__.py:124-134`); on Spark that is
    * dynamic partition overwrite on a month-partitioned table. */
  def writeMonthOverwrite(df: DataFrame, path: String, monthCol: String): Unit =
    df.write
      .partitionBy(monthCol)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path)
}
