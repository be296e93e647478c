package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions

/** Distance-bounded point joins at scale (SURVEY §4 "planned custom piece 3":
  * rewrite `crossJoin + distance filter` into a banded range join).
  *
  * The reference's nearest-point query is a full cross-distance scan in
  * generated T-SQL (`HTIPNEXSITE/__init__.py:106-122`) — O(|L|·|R|). At 100 TB
  * that cross join is the bottleneck, so `radiusJoin` prefilters by latitude
  * band: a degree of latitude is ≥ 110.57 km everywhere, so any pair within
  * `radiusM` differs by at most `radiusM / 110000` degrees of latitude
  * (conservative divisor → correct-by-construction candidate set). Each left
  * row is exploded into its band ±1, equi-joined on the band id (shuffle hash
  * join on a dense int key instead of a cross product), then the exact
  * haversine predicate is applied. Results are identical to the cross join —
  * only the plan changes. Longitude sub-banding (cos-weighted) can further
  * cut candidates but needs pole handling; latitude banding alone is exact.
  */
object GeoJoin {

  /** Meters per degree latitude, conservative lower bound. */
  private val MetersPerDegLat = 110000.0

  /** All (left, right) pairs with haversine distance ≤ radiusM.
    * `left` must have columns (lKey, lat, lon); `right` (rKey, rLat, rLon). */
  def radiusJoin(left: DataFrame, right: DataFrame, radiusM: Double,
      lat1: String, lon1: String, lat2: String, lon2: String): DataFrame = {
    val bandDeg = radiusM / MetersPerDegLat
    val lBand = explode(array(
      (floor(col(lat1) / bandDeg) - 1).cast("long"),
      floor(col(lat1) / bandDeg).cast("long"),
      (floor(col(lat1) / bandDeg) + 1).cast("long"))).as("band")
    val l = left.withColumn("band", lBand)
    val r = right.withColumn("band", floor(col(lat2) / bandDeg).cast("long"))
    l.join(r, Seq("band"))
      .withColumn("dist_m",
        GeoFunctions.haversineMeters(col(lat1), col(lon1), col(lat2), col(lon2)))
      .filter(col("dist_m") <= radiusM)
      .drop("band")
  }
}
