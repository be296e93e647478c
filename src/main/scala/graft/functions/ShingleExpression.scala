package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram shingling: `word_shingles(text, n) -> array<string>`.
  *
  * The built-in formulation (`transform(sequence(...), i => concat_ws(" ",
  * slice(tokens, i+1, n)))`) is *expressible* but pathological: Spark's
  * higher-order functions evaluate their lambda interpreted, per element,
  * outside whole-stage codegen — measured ~100× slower than this single
  * compiled pass (normalize + split + n-gram join in one tight loop).
  * This is the documented case (b) of the custom-operator preference order:
  * a scalar Catalyst expression with `doGenCode`. */
object ShingleOps {

  /** Lower-case, whitespace-tokenize, emit n-gram shingles joined by a
    * single space. Mirrors TextFunctions.normalize + tokens + wordShingles
    * semantics (non-deduplicated; MIN-based consumers are unaffected). */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = splitLower(text)
    val count = math.max(toks.length - n + 1, if (toks.length == 0) 0 else 1)
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n && i + j < toks.length) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Overlapping word n-grams of a token ARRAY, gram i starting at
    * toks[i] — the array-input twin of [[wordShingles]] for callers that
    * already hold a token array and need gram START POSITIONS in the
    * caller's own index space (span rewriting: the rewrite must drop
    * token i exactly when a hot gram covers index i, so tokenization must
    * stay the caller's, not this expression's). Byte-for-byte the
    * semantics of the HOF formulation it replaces
    * (`transform(sequence(0, greatest(size(toks)-n, 0)),
    * i -> concat_ws(' ', slice(toks, i+1, n)))`): an empty array yields
    * one empty-string gram, 0 < size < n yields one partial gram, null
    * elements are skipped by the space join exactly as concat_ws skips
    * them. The HOF evaluates its lambda interpreted per gram — this is
    * one compiled pass (same case-(b) rationale as [[wordShingles]]).
    *
    * ONE deliberate divergence from the HOF: a NULL input ARRAY is
    * NULL-in/NULL-out (standard nullSafeEval contract), where the HOF
    * chain returns `[""]` (greatest(null-size, 0) = 0 → one empty gram).
    * Unreachable for internal callers (Dedup/SparkEntry filter
    * `length(trim(text)) > 0` upstream) but observable to SQL users of
    * `word_grams`; pinned by the PropertySpec null-array case. */
  def wordGrams(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    val count = math.max(len - n + 1, 1)
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder()
      var first = true
      var j = 0
      while (j < n && i + j < len) {
        if (!toks.isNullAt(i + j)) {
          if (!first) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString)
          first = false
        }
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Tokens of `toks` NOT covered by any width-`n` span starting at the
    * positions in `starts` (SORTED ascending, 0-based): token i is
    * dropped iff some start s has s <= i <= s+n-1. One merge sweep over
    * (tokens, starts) — O(len + |starts|) — replacing the HOF
    * `filter(toks, (t, i) -> NOT exists(starts, s -> ...))`, whose
    * interpreted exists() makes the rewrite O(len × |starts|) per
    * document: a boilerplate-heavy doc with hundreds of hot-gram starts
    * paid quadratically in the one place the whole operator exists to
    * clean up. Null start elements are rejected at analysis time
    * (TokenSpanFilter.checkInputDataTypes — getInt would silently read a
    * null slot as 0 and fabricate a span at position 0); an UNSORTED
    * start array is normalized here with a one-off copy+sort after a
    * linear sortedness check, so the internal sort_array(collect_set)
    * caller pays one extra O(|starts|) scan and SQL callers get correct
    * output regardless of order. */
  def tokenSpanFilter(toks: ArrayData, starts: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    val ns = starts.numElements()
    var isSorted = true
    var k = 1
    while (isSorted && k < ns) {
      if (starts.getInt(k) < starts.getInt(k - 1)) isSorted = false
      k += 1
    }
    val st =
      if (isSorted) starts
      else {
        val a = starts.toIntArray()
        java.util.Arrays.sort(a)
        UnsafeArrayData.fromPrimitiveArray(a)
      }
    val out = new scala.collection.mutable.ArrayBuffer[Any](len)
    var si = 0
    var activeEnd = -1L // rightmost s+n-1 among starts with s <= i
    var i = 0
    while (i < len) {
      while (si < ns && st.getInt(si) <= i) {
        val e = st.getInt(si).toLong + (n - 1)
        if (e > activeEnd) activeEnd = e
        si += 1
      }
      if (i > activeEnd)
        out += (if (toks.isNullAt(i)) null else toks.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** SymSpell deletion neighborhood: [s, s minus char 1, …, s minus char
    * len] — index 0 is the identity variant. Byte-for-byte the HOF
    * `transform(sequence(0, length(s)), i -> IF(i = 0, s,
    * concat(substring(s, 1, i-1), substring(s, i+1, len-i))))` it
    * replaces (substringSQL is the built-in Substring's own code, so
    * non-ASCII positions agree); that lambda evaluates interpreted
    * len+1 times per string. */
  def deletionVariants(s: UTF8String): ArrayData = {
    val len = s.numChars()
    val out = new Array[Any](len + 1)
    out(0) = s
    var i = 1
    while (i <= len) {
      out(i) = UTF8String.concat(
        s.substringSQL(1, i - 1), s.substringSQL(i + 1, len - i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Lower-case + whitespace-split (Character.isWhitespace), the shared
    * tokenizer of the native text-hash expressions. */
  def splitLower(text: UTF8String): Array[String] = {
    val s = text.toString.toLowerCase
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length / 5 + 1)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }

  def wordShinglesCol(text: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(text), n))

  /** Distinct overlapping character k-shingles, first-occurrence order.
    * Byte-for-byte the semantics of the HOF formulation it replaces
    * (`array_distinct(transform(sequence(1, greatest(len-k+1, 1)),
    * i => concat(text, ' '*(k-1)).substr(i, k)))`, see
    * TextFunctions.charShingles): the input is right-padded with k-1
    * spaces so a string shorter than k yields exactly one padded shingle,
    * and an empty string yields the k-1-space shingle. `substringSQL`
    * is the same code the built-in Substring expression runs, so
    * non-ASCII positions agree. The HOF chain evaluates its lambda
    * interpreted per element AND re-evaluates the concat inside it per
    * position — O(len²) character copies per row outside codegen;
    * this is one compiled pass. */
  def charShingles(text: UTF8String, k: Int): ArrayData = {
    val padded = UTF8String.concat(text, UTF8String.fromString(" " * (k - 1)))
    val n = math.max(text.numChars() - k + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 1
    while (i <= n) {
      seen.add(padded.substringSQL(i, k))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }

  /** Sorted DISTINCT 64-bit hashes (xxhash64, Spark's seed 42) of the
    * character k-shingles of `text` — the compact per-document set
    * representation for exact-Jaccard verification. Set SIZE and
    * intersection counts match the string-set versions unless two
    * distinct shingles of one document collide in 64 bits (~n²/2⁶⁵ per
    * doc — negligible and deterministic). Primitive `array<long>` with
    * no nulls: downstream merge-scans never box. */
  def charShingleHashes(text: UTF8String, k: Int): ArrayData = {
    val padded = UTF8String.concat(text, UTF8String.fromString(" " * (k - 1)))
    val n = math.max(text.numChars() - k + 1, 1)
    val set = new java.util.HashSet[java.lang.Long](n * 2)
    var i = 1
    while (i <= n) {
      set.add(XxHash64Function.hash(padded.substringSQL(i, k), StringType, 42L))
      i += 1
    }
    val arr = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    java.util.Arrays.sort(arr)
    UnsafeArrayData.fromPrimitiveArray(arr)
  }

  /** |A ∩ B| for two SORTED distinct long arrays — one merge scan, no
    * allocation, no boxing (vs `size(array_intersect(...))`, which builds
    * a boxed hash set per row). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val va = a.getLong(i); val vb = b.getLong(j)
      if (va < vb) i += 1
      else if (va > vb) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  def charShinglesCol(text: Column, k: Int): Column =
    GraftBridge.column(CharShingles(GraftBridge.expression(text), k))

  def charShingleHashesCol(text: Column, k: Int): Column =
    GraftBridge.column(CharShingleHashes(GraftBridge.expression(text), k))

  def sortedIntersectCountCol(a: Column, b: Column): Column =
    GraftBridge.column(SortedLongIntersectCount(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def wordGramsCol(toks: Column, n: Int): Column =
    GraftBridge.column(WordGrams(GraftBridge.expression(toks), n))

  def deletionVariantsCol(s: Column): Column =
    GraftBridge.column(DeletionVariants(GraftBridge.expression(s)))

  def tokenSpanFilterCol(toks: Column, starts: Column, n: Int): Column =
    GraftBridge.column(TokenSpanFilter(
      GraftBridge.expression(toks), GraftBridge.expression(starts), n))

  // SQL registration lives in GraftExtensions.injectFunction (with the
  // robust intArg coercion + ExpressionInfo help text) — a second
  // temp-function path here would drift (r14 review; the duplicate was
  // unused and its literal coercion broke on long literals).
}

/** `word_shingles(text, n) -> array<string>` (codegen'd). */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.wordShingles(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `char_shingles(text, k) -> array<string>` — distinct, first-occurrence
  * order, codegen'd (see ShingleOps.charShingles for exact semantics). */
case class CharShingles(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.charShingles(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.charShingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `char_shingle_hashes(text, k) -> array<long>` — sorted distinct xxhash64
  * of each char k-shingle, codegen'd. */
case class CharShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_shingle_hashes"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.charShingleHashes(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.charShingleHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `sorted_intersect_count(array<long>, array<long>) -> long` — merge-scan
  * intersection size of two sorted distinct long arrays, codegen'd. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  // elements are read through getLong: any other array element type (e.g.
  // array<string>, whose UnsafeArrayData slots hold offset/size words)
  // would be read as garbage longs — silently wrong counts, no error.
  // Reject at analysis time, same guard as WordGrams/TokenSpanFilter;
  // NullType stays accepted (null-in/null-out via nullSafeEval).
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) | NullType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects two array<bigint>, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleOps.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ShingleOps.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `word_grams(array<string>, n) -> array<string>` — overlapping n-grams
  * of a token array, gram i starting at toks[i], codegen'd (see
  * ShingleOps.wordGrams for exact HOF-equivalence semantics). */
case class WordGrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"
  // elements are read through getUTF8String: anything but array<string>
  // (e.g. array<int>, whose UnsafeArrayData packs 4-byte slots) would
  // read misaligned offset/size words at runtime — garbage strings or a
  // JVM crash. Reject at analysis time, same guard as TokenSpanFilter.
  // NullType IS accepted (r13 ADVICE): a bare SQL NULL literal — or an
  // all-null untyped column — is always null-in/null-out, the same
  // contract the help text documents for a typed null array; eval never
  // reaches nullSafeEval and codegen short-circuits to a null result.
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_grams expects array<string>, got ${t.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    ShingleOps.wordGrams(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      // a NullType child can't feed the ArrayData-typed helper call (its
      // codegen slot is Object) — the result is a constant null
      case NullType => ExprCode.forNullValue(dataType)
      case _ =>
        defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.wordGrams($c, $n)")
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `deletion_variants(string) -> array<string>` — SymSpell deletion
  * neighborhood with the identity variant at index 0, codegen'd (see
  * ShingleOps.deletionVariants for exact HOF-equivalence semantics). */
case class DeletionVariants(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "deletion_variants"

  override def nullSafeEval(v: Any): Any =
    ShingleOps.deletionVariants(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.deletionVariants($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `token_span_filter(array<string>, array<int>, n) -> array<string>` —
  * tokens not covered by any width-n span starting at the given sorted
  * positions; one merge sweep, codegen'd (see ShingleOps.tokenSpanFilter). */
case class TokenSpanFilter(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  // kept tokens pass through verbatim, so nullability follows the input
  // array's elements — claim nullable to stay truthful for any caller
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "token_span_filter"
  // starts are read through getInt: reject anything but array<int> at
  // analysis time (a SQL caller handing array<bigint> would otherwise
  // silently produce wrong spans — they must cast explicitly), and
  // reject nullable start elements (getInt reads a null slot as 0,
  // fabricating a span at position 0 that drops tokens 0..n-1; the
  // internal sort_array(collect_set) caller is containsNull=false by
  // construction, SQL callers must array_compact first). Unsorted starts
  // are NOT a precondition — eval normalizes with a copy+sort.
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _),
            ArrayType(org.apache.spark.sql.types.IntegerType, false)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _),
            ArrayType(org.apache.spark.sql.types.IntegerType, true)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "token_span_filter requires non-nullable start elements " +
            "(array<int> with containsNull=false) - wrap in array_compact")
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_span_filter expects (array<string>, array<int>), got " +
            s"(${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(toks: Any, starts: Any): Any =
    ShingleOps.tokenSpanFilter(
      toks.asInstanceOf[ArrayData], starts.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ShingleOps.tokenSpanFilter($a, $b, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
