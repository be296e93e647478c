package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** The full custom-operator ladder (SURVEY §4 / guide case (c)) for the
  * broadcast kNN join: logical node → planner strategy → physical operator.
  *
  * The production path for q18 stays the codegen-friendly
  * [[graft.functions.KnnAgainstPoints]] expression (it lives inside
  * whole-stage codegen; this exec node is iterator-based). This plan-level
  * form exists for operators that need PHYSICAL control — custom
  * partitioning, out-of-row state, multi-column emission — and is the
  * template the engine extends when an operator outgrows an expression:
  * GeoJoinSpec proves it row-identical to both other implementations.
  *
  * Semantics: for each input row `(key, lat, lon)`, emit k rows
  * `(key, knn_rank, point_key, dist_m)` — the k nearest of the broadcast
  * point set by (haversine dist, point key) ascending.
  */
case class KnnJoinLogical(child: LogicalPlan,
    keys: Array[Long], lats: Array[Double], lons: Array[Double], k: Int,
    output: Seq[Attribute])
  extends UnaryNode {
  // child must produce exactly (key: Long, lat: Double, lon: Double);
  // output attrs are constructor-carried so plan copies keep their exprIds
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  // the node consumes every child column positionally — without this,
  // ColumnPruning sees no references and strips the child to zero columns
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object KnnJoinLogical {
  /** Fresh output attributes for a new node instance. */
  def outputAttrs(): Seq[Attribute] = Seq(
    AttributeReference("left_key", LongType, nullable = false)(),
    AttributeReference("knn_rank", LongType, nullable = false)(),
    AttributeReference("right_key", LongType, nullable = false)(),
    AttributeReference("dist_m", DoubleType, nullable = false)())
}

case class KnnJoinExec(child: SparkPlan,
    keys: Array[Long], lats: Array[Double], lons: Array[Double], k: Int,
    output: Seq[Attribute])
  extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override protected def doExecute(): RDD[InternalRow] = {
    val ks = keys; val la = lats; val lo = lons; val kk = k
    val out = output
    child.execute().mapPartitions { it =>
      // Reuse the expression's insertion-buffer scan for identical ranking
      // semantics (chord prefilter + exact re-rank).
      val scorer = graft.functions.KnnAgainstPoints(
        org.apache.spark.sql.catalyst.expressions.Literal(0.0),
        org.apache.spark.sql.catalyst.expressions.Literal(0.0),
        ks, la, lo, kk)
      val proj = UnsafeProjection.create(out.map(_.dataType).toArray)
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4)
      it.flatMap { r =>
        val key = r.getLong(0)
        val arr = scorer.compute(r.getDouble(1), r.getDouble(2))
        (0 until arr.numElements()).iterator.map { i =>
          val nn = arr.getStruct(i, 2)
          row.update(0, key)
          row.update(1, (i + 1).toLong)
          row.update(2, nn.getLong(0))
          row.update(3, nn.getDouble(1))
          proj(row)
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Planner strategy: lower the logical node to the physical operator. */
object KnnJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case KnnJoinLogical(child, keys, lats, lons, k, out) =>
      KnnJoinExec(planLater(child), keys, lats, lons, k, out) :: Nil
    case _ => Nil
  }
}
