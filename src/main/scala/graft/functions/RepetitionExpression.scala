package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style word-n-gram repetition statistics (Rae et al. 2021,
  * "Scaling Language Models: ... Gopher", table A1: fraction of characters
  * in the most frequent {2,3,4}-gram, fraction of characters in duplicated
  * {5..10}-grams) — THE standard pre-training repetition gate.
  *
  * Repetition is a strictly per-document property, so the 100 TB-correct
  * plan is a map-only projection: one compiled pass per document computing
  * every n's statistics, zero shuffle (vs the naive explode → groupBy
  * (doc, n, gram) formulation, which shuffles ~5× the corpus token count;
  * the DuckDB oracle mirrors THAT formulation, which is what proves this
  * single-pass version equivalent). Documented custom-operator case (b):
  * scalar Catalyst expression with `doGenCode`.
  *
  * All outputs are exact integers — char MASSES (count × gram char length),
  * not float fractions — so oracle comparison is immune to float-tie
  * divergence; consumers divide by `norm_chars` themselves, and the
  * keep/drop gate is decided in integer cross-multiplication.
  */
object RepetitionOps {

  /** The n values computed, in output order: top-gram stats are meaningful
    * for small n (Gopher gates n=2,3,4 on the most frequent gram), dup-gram
    * mass for the large n (Gopher gates n=5..10 on all duplicated grams;
    * we carry the two endpoints). */
  val Ns: Array[Int] = Array(2, 3, 4, 5, 10)

  /** Per n: `score = maxOverGrams(count * 2^31 + gramChars)` — one integer
    * that carries the top gram's count AND char length with a deterministic
    * tie-break (same count → longer gram wins; same count and length →
    * equal char mass either way, so the decoded mass is unique). */
  private final val Enc = 1L << 31

  /** array<long> of 2*Ns.length + 2: [score_n, dupMass_n] per n in
    * [[Ns]], then [n_words, norm_chars]. A document with fewer than n
    * tokens contributes score=0, dupMass=0 for that n. Gram identity is
    * the exact token sequence (single-space joined, lower-cased,
    * whitespace-split — the same tokenizer as every other text operator
    * here); char length counts Unicode code points to match `length()` in
    * both Spark and DuckDB. n_words/norm_chars come from the SAME
    * tokenization as the gram masses — numerator and denominator of every
    * downstream ratio agree by construction (computing the denominator
    * with a different splitter, e.g. regex `\s+`, diverges on Unicode
    * whitespace the regex doesn't cover). */
  def gopherStats(text: UTF8String): ArrayData = {
    val toks = ShingleOps.splitLower(text)
    val out = new Array[Long](Ns.length * 2 + 2)
    var normChars = if (toks.length > 0) (toks.length - 1).toLong else 0L
    var t = 0
    while (t < toks.length) {
      val w = toks(t)
      normChars += w.codePointCount(0, w.length)
      t += 1
    }
    out(Ns.length * 2) = toks.length.toLong
    out(Ns.length * 2 + 1) = normChars
    var ni = 0
    while (ni < Ns.length) {
      val n = Ns(ni)
      val m = toks.length - n + 1
      if (m > 0) {
        val counts = new java.util.HashMap[String, Int](m * 2)
        var i = 0
        while (i < m) {
          val sb = new java.lang.StringBuilder
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          val g = sb.toString
          counts.put(g, counts.getOrDefault(g, 0) + 1)
          i += 1
        }
        var top = 0L
        var dup = 0L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val cnt = e.getValue.toLong
          val g = e.getKey
          val glen = g.codePointCount(0, g.length).toLong
          val score = cnt * Enc + glen
          if (score > top) top = score
          if (cnt >= 2L) dup += cnt * glen
        }
        out(ni * 2) = top
        out(ni * 2 + 1) = dup
      }
      ni += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def gopherStatsCol(text: Column): Column =
    GraftBridge.column(GopherRepetition(GraftBridge.expression(text)))
}

/** `gopher_repetition(text) -> array<long>` — [topScore_n, dupMass_n] for
  * n in {2,3,4,5,10}; see [[RepetitionOps.gopherStats]]. */
case class GopherRepetition(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gopher_repetition"
  override def nullSafeEval(v: Any): Any =
    RepetitionOps.gopherStats(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionOps.gopherStats($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
