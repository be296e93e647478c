package graft.functions



import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, NullType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded k-min buffer for [[PrefixMinK]]: a binary MAX-heap over
  * `(dfreq, tok)` holding the k smallest pairs seen so far (root = largest
  * kept, so a new smaller element replaces the root in O(log k)). `k` is
  * derived from the doc's total distinct-shingle count `n`, carried on
  * every input row, so the bound is known from the FIRST row — the whole
  * point versus `collect_list`: the partial (map-side) buffer never holds
  * more than k elements, where collect_list's partial holds every element
  * it sees and ships all of them through the doc-side exchange.
  *
  * Tok comparisons use `UTF8String.compareTo` — BINARY order, identical to
  * `array_sort` on `struct(dfreq, tok)` and to the oracle's `row_number`
  * over UTF-8 collation. A JVM `String` ordering would diverge on
  * supplementary characters (UTF-16 surrogates sort below U+E000..U+FFFF);
  * staying on UTF8String avoids both that trap and per-row decode cost.
  */
final class PrefixKHeap {
  var n: Int = -1 // doc's distinct-shingle count; -1 = uninitialized
  var k: Int = 0
  var m: Int = 0
  var dfreqs: Array[Long] = null
  var toks: Array[UTF8String] = null
  // 8-byte left-aligned big-endian tok prefixes (the UnsafeExternalSorter
  // prefix trick): in a dedup corpus MOST shingles have dfreq 1-2, so the
  // (dfreq, tok) order ties on dfreq almost every time and a naive
  // comparator pays a byte-array UTF8String.compareTo per heap level —
  // measured as the dominant stage cost at 21 M inserts. An unsigned
  // long compare settles the tie except when the first 8 UTF-8 bytes
  // collide, and the char-8-shingle tokens ARE 8 bytes for ASCII text,
  // so the full compare is all but eliminated.
  var prefixes: Array[Long] = null

  @inline private def tokPrefix(t: UTF8String): Long = {
    val lim = math.min(t.numBytes, 8)
    var p = 0L
    var i = 0
    while (i < lim) { p = (p << 8) | (t.getByte(i) & 0xffL); i += 1 }
    p << (8 * (8 - lim))
  }

  @inline private def less(d1: Long, p1: Long, t1: UTF8String,
      d2: Long, p2: Long, t2: UTF8String): Boolean =
    if (d1 != d2) d1 < d2
    else {
      val c = java.lang.Long.compareUnsigned(p1, p2)
      if (c != 0) c < 0 else t1.compareTo(t2) < 0
    }

  @inline private def lessAt(i: Int, j: Int): Boolean =
    less(dfreqs(i), prefixes(i), toks(i), dfreqs(j), prefixes(j), toks(j))

  /** Arrays grow by doubling, capped at k — NOT allocated at k up front.
    * The map-side hash map holds one buffer per (group, partition) and a
    * partition typically sees far fewer than k of a doc's shingles
    * (n/partitions), so eager k-slot arrays were measured at 2× the
    * collect_list stage time on the 10× rehearsal (1.6 M buffers × two
    * 170-slot arrays ≈ 4 GB of dead allocation); growth from 8 slots
    * keeps the partial buffer proportional to what it actually holds. */
  def init(n0: Int, k0: Int): Unit = {
    n = n0
    k = math.max(k0, 0)
    m = 0
    val cap = math.min(k, 8)
    dfreqs = new Array[Long](cap)
    toks = new Array[UTF8String](cap)
    prefixes = new Array[Long](cap)
  }

  private def ensureCapacity(): Unit =
    if (m == dfreqs.length && m < k) {
      val cap = math.min(k, math.max(dfreqs.length * 2, 8))
      dfreqs = java.util.Arrays.copyOf(dfreqs, cap)
      toks = java.util.Arrays.copyOf(toks, cap)
      prefixes = java.util.Arrays.copyOf(prefixes, cap)
    }

  private def swap(i: Int, j: Int): Unit = {
    val d = dfreqs(i); dfreqs(i) = dfreqs(j); dfreqs(j) = d
    val t = toks(i); toks(i) = toks(j); toks(j) = t
    val q = prefixes(i); prefixes(i) = prefixes(j); prefixes(j) = q
  }

  /** Insert, keeping only the k smallest. `tok` is CLONED on store — the
    * incoming UTF8String may point into a buffer the scan reuses for the
    * next row (the same rule collect_list follows). */
  def insert(d: Long, tok: UTF8String): Unit = {
    if (m == k) { // full: reject fast unless strictly below the root
      val tp = tokPrefix(tok)
      if (k == 0 || !less(d, tp, tok, dfreqs(0), prefixes(0), toks(0))) return
      dfreqs(0) = d
      toks(0) = tok.clone()
      prefixes(0) = tp
      var i = 0
      var cont = true
      while (cont) {
        val l = 2 * i + 1
        val r = l + 1
        var big = i
        if (l < m && lessAt(big, l)) big = l
        if (r < m && lessAt(big, r)) big = r
        if (big == i) cont = false else { swap(i, big); i = big }
      }
    } else {
      ensureCapacity()
      dfreqs(m) = d
      toks(m) = tok.clone()
      prefixes(m) = tokPrefix(tok)
      m += 1
      var i = m - 1
      var cont = i > 0
      while (cont) {
        val p = (i - 1) >> 1
        if (lessAt(p, i)) { swap(p, i); i = p; cont = i > 0 }
        else cont = false
      }
    }
  }

  /** The kept elements sorted ASCENDING by (dfreq, tok) — exactly
    * `slice(array_sort(td), 1, k)` of the full element list, since the k
    * smallest of a duplicate-free set are unique. */
  def sortedPairs(): Array[(Long, UTF8String)] = {
    val out = Array.tabulate(m)(i => (dfreqs(i), toks(i)))
    scala.util.Sorting.stableSort(out, (a: (Long, UTF8String),
        b: (Long, UTF8String)) =>
      a._1 < b._1 || (a._1 == b._1 && a._2.compareTo(b._2) < 0))
    out
  }

  /** Restore the prefix array after [[PrefixMinK.deserialize]] rebuilt
    * dfreqs/toks directly (cheaper to recompute m longs than to ship). */
  def rebuildPrefixes(): Unit = {
    prefixes = new Array[Long](toks.length)
    var i = 0
    while (i < m) { prefixes(i) = tokPrefix(toks(i)); i += 1 }
  }
}

/** `prefix_min_k(n, dfreq, tok)` → `struct(n, items: array<struct<dfreq,
  * tok>>)`: the PPJoin prefix aggregate as a native bounded-buffer
  * [[TypedImperativeAggregate]]. Keeps, per group, the
  * `k = n − ⌈n·numT/denT⌉ + 1` smallest `(dfreq, tok)` pairs (the doc's
  * RAREST-shingle prefix), with `items` emitted in ascending order —
  * value-identical to the declarative
  * `collect_list(struct(dfreq, tok))` → `array_sort` → `slice` chain it
  * replaces (PropertySpec pins the equivalence), but strictly cheaper in
  * the shapes that dominate the q121/q154 stage tables (BASELINE.md P121:
  * the prefix aggregate was ~50% of the chain):
  *
  *  - the map-side partial buffer is BOUNDED at k, so when a partition
  *    carries more than k of a doc's shingles (big documents, or AQE
  *    coalescing scan partitions at 100 TB) the exchange ships k structs
  *    per doc instead of all n — collect_list ships every element;
  *  - partial buffers serialize to a compact blob (longs + raw UTF-8
  *    bytes) instead of one UnsafeRow per element;
  *  - the final per-doc sort is O(k log k) over the kept prefix, not
  *    O(n log n) over the full shingle list, and no n-element array is
  *    ever materialized per doc.
  *
  * Spark has no built-in bounded "k smallest structs" aggregate
  * (`min_by(..., k)` keeps k rows but takes a fixed k, and the prefix k
  * varies per doc), hence the custom expression — same preference-order
  * rationale as [[KnnAgainstPoints]] (compose > custom expression >
  * custom plan). Used by `Dedup.prefixJaccardPairs` and
  * `Dedup.containmentPairs`; see the reference dedup semantics cited
  * there.
  */
case class PrefixMinK(
    first: Expression, second: Expression, third: Expression,
    numT: Int, denT: Int,
    fixedK: Int = 0,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PrefixKHeap]
  with TernaryLike[Expression] {

  require(numT > 0 && denT > numT, s"threshold must be in (0,1): $numT/$denT")

  // fixedK > 0 = RAREST-K mode (r20, the one-sided containment route's
  // probe): keep the min(fixedK, n) globally-rarest (dfreq, tok) pairs
  // instead of the threshold-derived prefix. Same heap, same (dfreq,
  // tok) binary order, same ascending output — only the bound differs.
  // Distinct prettyName so plan-shape assertions can tell the two
  // probes apart (the rehearsals' route-engagement detection greps the
  // optimized plan for the aggregate name).
  override def prettyName: String =
    if (fixedK > 0) "rarest_min_k" else "prefix_min_k"
  // no ExpectsInputTypes: AbstractDataType is private[sql] in Spark 4.
  // The single construction site (PrefixMinK.column) binds exact types;
  // anything else fails loudly here at analysis time. NullType children
  // are accepted — pre-resolution Column plumbing passes NullType
  // placeholders through copy() (the same acceptance WordGrams needed,
  // ShingleExpression r14); the analyzer re-checks after resolution.
  require(!(first.resolved && second.resolved && third.resolved) ||
    Seq(first.dataType, second.dataType, third.dataType)
      .zip(Seq(IntegerType, LongType, StringType))
      .forall { case (got, want) => got == want || got == NullType },
    s"prefix_min_k needs (int, bigint, string) inputs, got " +
      s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("dfreq", LongType, nullable = false),
      StructField("tok", StringType, nullable = false))),
      containsNull = false), nullable = false)))

  /** prefix length: n − ⌈n·numT/denT⌉ + 1, the `slice` bound in the
    * declarative form (`(n*numT + denT-1) DIV denT` = the ceiling).
    * Rarest-k mode keeps min(fixedK, n) — when n ≤ fixedK every shingle
    * is probed, so the one-sided route is EXACT for tiny docs and the
    * heuristic (1−t)^k miss bound applies only above it. */
  private def kOf(n: Int): Int =
    if (fixedK > 0) math.min(fixedK, n)
    else n - ((n.toLong * numT + denT - 1) / denT).toInt + 1

  override def createAggregationBuffer(): PrefixKHeap = new PrefixKHeap

  override def update(h: PrefixKHeap, input: InternalRow): PrefixKHeap = {
    val nV = first.eval(input)
    val dV = second.eval(input)
    val tV = third.eval(input)
    if (nV != null && dV != null && tV != null) {
      if (h.n < 0) {
        val n0 = nV.asInstanceOf[Int]
        h.init(n0, kOf(n0))
      }
      h.insert(dV.asInstanceOf[Long], tV.asInstanceOf[UTF8String])
    }
    h
  }

  override def merge(a: PrefixKHeap, b: PrefixKHeap): PrefixKHeap =
    if (b.n < 0) a
    else if (a.n < 0) b
    else {
      var i = 0
      while (i < b.m) { a.insert(b.dfreqs(i), b.toks(i)); i += 1 }
      a
    }

  override def eval(h: PrefixKHeap): Any = {
    val items = h.sortedPairs().map { case (d, t) =>
      InternalRow(d, t): Any
    }
    new GenericInternalRow(Array[Any](
      math.max(h.n, 0), new GenericArrayData(items)))
  }

  // serialize/deserialize run once per (group, partition) buffer — tens
  // of millions of elements pass through them on a corpus-sized aggregate.
  // Exact-size ByteBuffer packing, NOT DataOutputStream over a
  // ByteArrayOutputStream: BAOS methods are synchronized and writeLong
  // issues eight 1-byte writes, which measured as a large share of the
  // stage on the 10× rehearsal.
  override def serialize(h: PrefixKHeap): Array[Byte] = {
    var size = 12 + 12 * h.m
    var i = 0
    while (i < h.m) { size += h.toks(i).numBytes; i += 1 }
    val buf = java.nio.ByteBuffer.allocate(size)
    buf.putInt(h.n).putInt(h.k).putInt(h.m)
    i = 0
    while (i < h.m) { buf.putLong(h.dfreqs(i)); i += 1 }
    i = 0
    while (i < h.m) {
      buf.putInt(h.toks(i).numBytes)
      h.toks(i).writeTo(buf)
      i += 1
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): PrefixKHeap = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val h = new PrefixKHeap
    val n0 = buf.getInt()
    val k0 = buf.getInt()
    val m0 = buf.getInt()
    if (n0 >= 0) {
      h.init(n0, k0)
      // direct index writes below — size the growable arrays to m0 once
      if (m0 > 0) {
        h.dfreqs = new Array[Long](m0)
        h.toks = new Array[UTF8String](m0)
      }
      var i = 0
      while (i < m0) { h.dfreqs(i) = buf.getLong(); i += 1 }
      i = 0
      while (i < m0) {
        val len = buf.getInt()
        val b = new Array[Byte](len)
        buf.get(b)
        h.toks(i) = UTF8String.fromBytes(b)
        i += 1
      }
      h.m = m0 // heap order was preserved element-by-element
      h.rebuildPrefixes()
    }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PrefixMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PrefixMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PrefixMinK =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PrefixMinK {
  /** `prefix_min_k(n, dfreq, tok)` as a Column aggregate:
    * `struct(n, items)` with `items` the ascending rarest-prefix pairs. */
  def column(numT: Int, denT: Int)(n: Column, dfreq: Column,
      tok: Column): Column =
    GraftBridge.column(PrefixMinK(
      GraftBridge.expression(n), GraftBridge.expression(dfreq),
      GraftBridge.expression(tok), numT, denT).toAggregateExpression())

  /** `rarest_min_k(n, dfreq, tok)`: the fixed-width rarest-k variant —
    * keeps each group's min(k, n) globally-rarest (dfreq, tok) pairs in
    * ascending order. The one-sided containment route's probe (r20):
    * value-identical to `slice(array_sort(collect_list(struct(dfreq,
    * tok))), 1, k)`, mirrored in the oracle as
    * `row_number() OVER (ORDER BY dfreq, tok) <= k`. The threshold pair
    * passed underneath is a placeholder satisfying the constructor
    * invariant; fixedK overrides it. */
  def columnK(k: Int)(n: Column, dfreq: Column, tok: Column): Column = {
    require(k > 0, s"rarest_min_k needs k > 0: $k")
    GraftBridge.column(PrefixMinK(
      GraftBridge.expression(n), GraftBridge.expression(dfreq),
      GraftBridge.expression(tok), 1, 2, fixedK = k).toAggregateExpression())
  }
}
