package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregate: keeps the k smallest `(sortKey, id)` pairs,
  * ordered by (sortKey asc, id asc). The buffer never exceeds k entries, so
  * partial aggregation combines map-side and the shuffle carries k rows per
  * group instead of the whole group — the aggregate-shaped alternative to
  * `row_number().over(...) <= k`, which must shuffle every candidate row
  * into its partition before ranking. Exactly the reference's
  * `SELECT TOP 3 ... ORDER BY mdist` (`HTIPNEXSITE/__init__.py:110-121`)
  * as a mergeable aggregate. */
case class TopKBuf(items: Seq[(Double, Long)])

class BoundedTopKAgg(k: Int) extends Aggregator[(Double, Long), TopKBuf, Seq[(Double, Long)]] {
  // fail at construction, not as an opaque NoSuchElementException on
  // items.last deep inside a Spark task (the BloomAgg validation rule)
  require(k > 0, s"top-k needs k > 0: $k")
  private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortBy(identity).take(k)

  override def zero: TopKBuf = TopKBuf(Seq.empty)
  private val ord = implicitly[Ordering[(Double, Long)]]

  override def reduce(b: TopKBuf, x: (Double, Long)): TopKBuf =
    // avoid the sort when x can't displace anything
    if (b.items.size >= k && ord.lteq(b.items.last, x)) b
    else TopKBuf(trim(b.items :+ x))
  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKBuf(trim(a.items ++ b.items))
  override def finish(b: TopKBuf): Seq[(Double, Long)] = b.items
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object BoundedTopKAgg {
  /** `topk(sortCol, idCol)` → array<struct<_1: double, _2: bigint>>. */
  def column(k: Int)(sortCol: Column, idCol: Column): Column =
    udaf(new BoundedTopKAgg(k), Encoders.product[(Double, Long)])
      .apply(sortCol, idCol)
}
