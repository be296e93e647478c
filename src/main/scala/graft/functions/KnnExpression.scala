package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-row k-nearest-neighbor scan against a small in-memory point set —
  * the expression behind [[graft.operators.GeoJoin.knnBroadcast]].
  *
  * The reference's nearest-site query asks "top 3 closest points" against a
  * dimension of O(100) sites (`HTIPNEXSITE/__init__.py:106-122`). When the
  * right side fits in memory (the broadcast-join regime), the optimal
  * distributed plan is NOT a join at all: each left row scans the point
  * array once, keeping a k-slot insertion buffer — no shuffle, no candidate
  * materialization, no window. `(lat, lon) → ARRAY<STRUCT<key, dist>>`
  * sorted by (dist, key) ascending; `posexplode` downstream yields ranks.
  *
  * Distances call [[GeoFunctions.haversine]], the same scalar the codegen'd
  * column formula lowers to, so results are bit-identical to the
  * crossJoin+window plan. Codegen emits one virtual call per row; the
  * O(|points|) inner loop is compiled Scala either way.
  */
case class KnnAgainstPoints(left: Expression, right: Expression,
    keys: Array[Long], lats: Array[Double], lons: Array[Double], k: Int)
  extends BinaryExpression {
  // Children must already be DoubleType — callers wrap them in Cast
  // (AbstractDataType, hence ExpectsInputTypes, is private[sql] in Spark 4).

  require(k > 0, "k must be positive")
  require(keys.length == lats.length && keys.length == lons.length)

  override def dataType: DataType = ArrayType(
    new StructType().add("key", LongType, nullable = false)
      .add("dist", DoubleType, nullable = false),
    containsNull = false)
  override def prettyName: String = "knn_against_points"

  /** candidate (d, key) orders before incumbent (pd, pk)? — the
    * (dist ASC, key ASC) total order row_number would use. Used both for the
    * chord prefilter (negated dot products) and the exact re-rank. */
  @inline private def beats(d: Double, key: Long, pd: Double, pk: Long): Boolean =
    d < pd || (d == pd && key < pk)

  /** Chord margin: the prefilter keeps k+Margin candidates by 3-D dot
    * product before the exact haversine re-rank, absorbing any
    * floating-point rank inversions between chord and great-circle order
    * (they agree exactly in real arithmetic — both strictly monotone in the
    * central angle — so only last-ulp rounding can reorder, and only between
    * near-equal distances; 16 slots of slack covers even a ring of
    * near-equidistant points around the k-th boundary). */
  private val Margin = 16

  // Unit vectors of the point set, computed once per JVM (lazy vals
  // re-materialize after task deserialization). The inner per-pair loop is
  // then 3 multiplies + 2 adds — no transcendentals.
  @transient private lazy val ux: Array[Double] = Array.tabulate(keys.length) { i =>
    Math.cos(Math.toRadians(lats(i))) * Math.cos(Math.toRadians(lons(i)))
  }
  @transient private lazy val uy: Array[Double] = Array.tabulate(keys.length) { i =>
    Math.cos(Math.toRadians(lats(i))) * Math.sin(Math.toRadians(lons(i)))
  }
  @transient private lazy val uz: Array[Double] =
    Array.tabulate(keys.length)(i => Math.sin(Math.toRadians(lats(i))))

  def compute(lat: Double, lon: Double): ArrayData = {
    val n = keys.length
    val m = math.min(k + Margin, n)
    val vx = ux; val vy = uy; val vz = uz
    val latR = Math.toRadians(lat)
    val lonR = Math.toRadians(lon)
    val cosLat = Math.cos(latR)
    val x = cosLat * Math.cos(lonR)
    val y = cosLat * Math.sin(lonR)
    val z = Math.sin(latR)
    // Phase 1: top-(k+Margin) by negated dot product (monotone in chord,
    // hence in great-circle distance), tiebreak key ASC; carries the point
    // index alongside for phase 2.
    val bk = new Array[Long](m)
    val bd = new Array[Double](m)
    val bi = new Array[Int](m)
    var cnt = 0
    var i = 0
    while (i < n) {
      val d = -(x * vx(i) + y * vy(i) + z * vz(i))
      val key = keys(i)
      if (cnt < m) {
        var p = cnt
        while (p > 0 && beats(d, key, bd(p - 1), bk(p - 1))) {
          bd(p) = bd(p - 1); bk(p) = bk(p - 1); bi(p) = bi(p - 1); p -= 1
        }
        bd(p) = d; bk(p) = key; bi(p) = i; cnt += 1
      } else if (beats(d, key, bd(m - 1), bk(m - 1))) {
        var p = m - 1
        while (p > 0 && beats(d, key, bd(p - 1), bk(p - 1))) {
          bd(p) = bd(p - 1); bk(p) = bk(p - 1); bi(p) = bi(p - 1); p -= 1
        }
        bd(p) = d; bk(p) = key; bi(p) = i
      }
      i += 1
    }
    // Phase 2: exact haversine for the survivors, re-ranked by (dist, key) —
    // the bit-exact order the crossJoin+row_number plan produces.
    val ek = new Array[Long](cnt)
    val ed = new Array[Double](cnt)
    var c2 = 0
    var j = 0
    while (j < cnt) {
      val key = bk(j)
      val idx = bi(j)
      val d = GeoFunctions.haversine(lat, lon, lats(idx), lons(idx))
      var p = c2
      while (p > 0 && beats(d, key, ed(p - 1), ek(p - 1))) {
        ed(p) = ed(p - 1); ek(p) = ek(p - 1); p -= 1
      }
      ed(p) = d; ek(p) = key; c2 += 1
      j += 1
    }
    val out = math.min(k, c2)
    new GenericArrayData(
      Array.tabulate[Any](out)(j => InternalRow(ek(j), ed(j))))
  }

  override def nullSafeEval(lat: Any, lon: Any): Any =
    compute(lat.asInstanceOf[Double], lon.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("knnPts", this, classOf[KnnAgainstPoints].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
