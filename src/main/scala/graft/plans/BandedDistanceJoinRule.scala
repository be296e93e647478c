package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.HaversineDistance

/** SURVEY §4 "planned custom piece 3": an optimizer rule that rewrites
  *
  *   `a CROSS JOIN b WHERE haversine_m(a.lat, a.lon, b.lat, b.lon) <= r`
  *
  * into the latitude/longitude-banded equi-join of
  * [[graft.operators.GeoJoin.radiusJoin]] — a Generate(Explode) of ≤9 grid
  * keys on the left, one computed key on the right, an Inner join on the
  * dense long key, with the original distance predicate kept for exactness.
  * The cartesian product never materializes; results are provably identical
  * (the predicate is untouched, the banding only prunes pairs that cannot
  * satisfy it — same construction as GeoJoin, factor-2 lon safety margin,
  * pole bands collapse to one cell).
  *
  * Fires for the SQL surface (`haversine_m` registered by
  * [[graft.GraftExtensions]], which also injects this rule); DataFrame users
  * call `GeoJoin.radiusJoin` directly.
  */
object BandedDistanceJoinRule extends Rule[LogicalPlan] {

  private val MetersPerDegLat = 110000.0
  private val MetersPerDegLonEq = 111320.0
  /** cell id stride inside the composite long key: cells < 2^26, bands offset */
  private val CellStride = 1L << 26

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // the `_graft_gk_l` guard keeps the rule idempotent: its own output
    // still contains the haversine conjunct and must not re-match
    case j @ Join(left, right, Inner | Cross, Some(cond), hint)
        if !cond.references.exists(_.name == "_graft_gk_l") =>
      val conjuncts = splitConjuncts(cond)
      conjuncts.iterator.flatMap(c => matchDistancePredicate(c, left, right))
        .nextOption() match {
        case Some((lat1, lon1, lat2, lon2, r)) =>
          rewrite(left, right, cond, hint, lat1, lon1, lat2, lon2, r, j)
        case None => j
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** `haversine_m(l.lat, l.lon, r.lat, r.lon) <= radius` with the first pair
    * bound to the left side and the second to the right (we do not rewrite
    * the swapped orientation — SQL users write it left-to-right). */
  private def matchDistancePredicate(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Expression, Double)] =
    e match {
      case cmp @ (_: LessThanOrEqual | _: LessThan) =>
        val (h, lim) = cmp match {
          case LessThanOrEqual(a, b) => (a, b)
          case LessThan(a, b) => (a, b)
        }
        (h, lim) match {
          case (HaversineDistance(lat1, lon1, lat2, lon2), Literal(r, DoubleType))
            if lat1.references.subsetOf(left.outputSet) &&
              lon1.references.subsetOf(left.outputSet) &&
              lat2.references.subsetOf(right.outputSet) &&
              lon2.references.subsetOf(right.outputSet) &&
              r.asInstanceOf[Double] > 0 =>
            Some((lat1, lon1, lat2, lon2, r.asInstanceOf[Double]))
          case _ => None
        }
      case _ => None
    }

  private def lit(d: Double): Literal = Literal(d, DoubleType)

  private def bandOf(lat: Expression, bandDeg: Double): Expression =
    Cast(Floor(Divide(Cast(lat, DoubleType), lit(bandDeg))), LongType)

  /** Lon cell width for a band, matching GeoJoin.cellDegOf. */
  private def cellDegOf(band: Expression, bandDeg: Double, radiusM: Double): Expression = {
    val bd = Cast(band, DoubleType)
    val maxAbsExt = Add(
      Greatest(Seq(Abs(Multiply(bd, lit(bandDeg))),
        Abs(Multiply(Add(bd, lit(1.0)), lit(bandDeg))))),
      lit(bandDeg))
    If(GreaterThanOrEqual(maxAbsExt, lit(89.0)), lit(360.0),
      Least(Seq(lit(360.0),
        Divide(lit(2.0 * radiusM / MetersPerDegLonEq), Cos(ToRadians(maxAbsExt))))))
  }

  private def nCellsOf(cellDeg: Expression): Expression =
    Greatest(Seq(Cast(Floor(Divide(lit(360.0), cellDeg)), LongType), Literal(1L)))

  /** Composite long key `band * 2^26 + cell` (cells ≤ 360/(2r/111320) < 2^26
    * for any radius ≥ ~10 m; bands fit trivially). */
  private def key(band: Expression, lon: Expression, dLon: Int,
      bandDeg: Double, radiusM: Double): Expression = {
    val cd = cellDegOf(band, bandDeg, radiusM)
    val n = nCellsOf(cd)
    val rawCell = Cast(Floor(Divide(Add(Cast(lon, DoubleType), lit(180.0)), cd)), LongType)
    val cell = Pmod(Add(rawCell, Literal(dLon.toLong)), n)
    Add(Multiply(band, Literal(CellStride)), cell)
  }

  private def rewrite(left: LogicalPlan, right: LogicalPlan, cond: Expression,
      hint: JoinHint, lat1: Expression, lon1: Expression, lat2: Expression,
      lon2: Expression, radiusM: Double, original: Join): LogicalPlan = {
    val bandDeg = radiusM / MetersPerDegLat

    val leftKeys = ArrayDistinct(CreateArray(
      (for (dB <- -1 to 1; dL <- -1 to 1) yield {
        val band = Add(bandOf(lat1, bandDeg), Literal(dB.toLong))
        key(band, lon1, dL, bandDeg, radiusM)
      }).toSeq))
    // nullable = true: a left row with NULL lat/lon makes every array
    // element null, and Explode then emits a null key — declaring the
    // attribute non-nullable would let codegen skip the null check and
    // read the zeroed slot as key 0 (band 0/cell 0), handing the row to
    // NullPropagation/join-key optimizations as live bait (r14 review;
    // today the retained haversine conjunct filters such rows, but the
    // nullability must still tell the truth).
    val gkL = AttributeReference("_graft_gk_l", LongType, nullable = true)()
    val gen = Generate(Explode(leftKeys), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(gkL), child = left)

    val rKey = key(bandOf(lat2, bandDeg), lon2, 0, bandDeg, radiusM)
    val gkR = Alias(rKey, "_graft_gk_r")()
    val proj = Project(right.output :+ gkR, right)

    val joined = Join(gen, proj, Inner,
      Some(And(EqualTo(gkL, gkR.toAttribute), cond)), hint)
    // restore the original schema (drop the grid keys)
    Project(original.output, joined)
  }
}
