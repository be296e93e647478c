package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions
import graft.operators.Transforms

/** Geospatial site-scoring read path (`PGSITE/__init__.py:100-384`,
  * `HTIPNEXSITE/__init__.py:133-375`): clean POI names → regex-categorize
  * (~40 rules, last-writer-wins) → geodesic distances → per-category feature
  * vector → model inference → top-3 nearest stored points.
  *
  * The reference computes distances row-by-row with `iterrows` (its biggest
  * perf sin, SURVEY §2.9) and feature-aggregates in a Python loop over 40
  * categories × 5 metrics (`:302-357`); here both are one codegen'd
  * expression and one `groupBy().pivot().agg()`.
  */
object SiteScoringPipeline {

  /** Representative slice of the 40-rule categorizer
    * (`PGSITE/__init__.py:144-281`); config-driven, last rule wins. */
  val defaultRules: Seq[(String, String)] = Seq(
    "RESTAURANT|TACOS|PIZZA|COMIDA" -> "RESTAURANTE",
    "BANCO|BANK|BBVA|SANTANDER|BANORTE" -> "BANCO",
    "ESCUELA|COLEGIO|UNIVERSIDAD|SCHOOL" -> "ESCUELA",
    "HOSPITAL|CLINICA|FARMACIA" -> "SALUD",
    "OXXO|SEVEN|7 ELEVEN|TIENDA" -> "CONVENIENCIA",
    "WALMART|SORIANA|CHEDRAUI|BODEGA AURRERA" -> "AUTOSERVICIO",
    "GASOLINERA|PEMEX" -> "GASOLINERA",
    "HOTEL|MOTEL" -> "HOTEL",
    "KFC|MCDONALD|BURGER KING|DOMINOS|SUBWAY" -> "CADENA QSR")
  val defaultCategory = "OTROS SIN CLASIFICACION"

  /** Name cleanup (`PGSITE/__init__.py:129-140`): upper, trim, accent fold,
    * punctuation strip — `translate` + `regexp_replace`, all codegen'd. */
  def cleanName(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      translate(upper(trim(c)), "ÁÉÍÓÚÜÑ", "AEIOUUN"),
      "['\",.]", "")

  /** POI table prep: clean, categorize, distance, dedup
    * (`PGSITE/__init__.py:126-284`). Input: one row per (site, poi). */
  def preparePois(pois: DataFrame,
      rules: Seq[(String, String)] = defaultRules): DataFrame =
    pois
      .withColumn("poi_name", cleanName(col("poi_name")))
      .withColumn("poi_category",
        Transforms.categorize(rules, defaultCategory)(col("poi_name")))
      .withColumn("distance_mtrs",
        GeoFunctions.haversineMeters(col("rst_lat"), col("rst_lon"),
          col("poi_lat"), col("poi_lon")))
      .dropDuplicates("rst_cd", "poi_id")

  /** PGSITE-style wide feature vector (`:302-357`): per (site, category)
    * count within 300 m, count within 100 m, max/min/mean distance — the
    * reference's 40-category Python loop as ONE pivoted aggregation.
    * Missing categories: counts → 0, min dist → 10000
    * (`HTIPNEXSITE/__init__.py:343-348`). */
  def featureVector(prepared: DataFrame, categories: Seq[String]): DataFrame = {
    val piv = prepared
      .groupBy(col("rst_cd"))
      .pivot("poi_category", categories)
      .agg(
        count(lit(1)).as("300M_CNT"),
        count(when(col("distance_mtrs") <= 100, 1)).as("100M_CNT"),
        max(col("distance_mtrs")).as("MAX_DIST"),
        min(col("distance_mtrs")).as("MIN_DIST"),
        avg(col("distance_mtrs")).as("MEAN_DIST"))
    val countCols = piv.columns.filter(c => c.endsWith("_CNT"))
    val minCols = piv.columns.filter(_.endsWith("MIN_DIST"))
    piv.na.fill(0, countCols).na.fill(10000.0, minCols)
  }

  /** Global counts (`PGSITE/__init__.py:308-309`). */
  def globalCounts(prepared: DataFrame): DataFrame =
    prepared.groupBy(col("rst_cd")).agg(
      count(lit(1)).as("GEO_POI_300M_CNT"),
      count(when(col("distance_mtrs") <= 100, 1)).as("GEO_POI_100M_CNT"))

  /** Top-3 nearest stored points to each site — the reference's generated
    * `ROW_NUMBER() OVER (ORDER BY mdist)` T-SQL (`HTIPNEXSITE/__init__.py:
    * 92-131`) as broadcast theta-join + windowed top-k (J3/W1/W2). */
  def closePoints(sites: DataFrame, pos: DataFrame, k: Int = 3): DataFrame = {
    val joined = sites.crossJoin(broadcast(pos))
      .select(col("rst_cd"), col("POS_NM"),
        round(GeoFunctions.haversineMeters(col("rst_lat"), col("rst_lon"),
          col("LTT"), col("LGT")), 0).as("POS_DIST"))
    Transforms.topKPerGroup(joined, Seq(col("rst_cd")),
        Seq(col("POS_DIST").asc, col("POS_NM").asc), k, "POS_RANK")
      .select(col("rst_cd"), col("POS_RANK"), col("POS_NM"), col("POS_DIST"))
  }

  /** Response assembly (`PGSITE/__init__.py:376-384`): one JSON document per
    * site with nested poi + close-point arrays (F16/S14). */
  def assembleResponse(prepared: DataFrame, close: DataFrame,
      forecast: DataFrame): DataFrame = {
    val pois = prepared.groupBy(col("rst_cd")).agg(
      collect_list(struct(col("poi_name"), col("poi_category"),
        col("distance_mtrs"))).as("pois"))
    val cps = close.groupBy(col("rst_cd")).agg(
      collect_list(struct(col("POS_RANK"), col("POS_NM"), col("POS_DIST")))
        .as("close_points"))
    forecast.join(pois, Seq("rst_cd"), "left").join(cps, Seq("rst_cd"), "left")
      .select(col("rst_cd"),
        to_json(struct(col("forecast"), col("pois"), col("close_points")))
          .as("response"))
  }
}
