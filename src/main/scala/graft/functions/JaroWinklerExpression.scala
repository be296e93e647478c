package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity: `jaro_winkler(a, b) -> double`.
  *
  * Spark has `levenshtein` but no Jaro-Winkler; record-linkage practice
  * (name/address matching) leans on JW because it weights shared prefixes
  * and tolerates transpositions. Textbook definition, matching DuckDB's
  * `jaro_winkler_similarity` (the oracle) on every sampled fixture:
  * match window ⌊max(l1,l2)/2⌋−1, half-counted transpositions,
  * jaro = (m/l1 + m/l2 + (m−t)/m)/3, Winkler boost
  * jw = jaro + ℓ·0.1·(1−jaro) for common prefix ℓ ≤ 4 applied only when
  * jaro > 0.7; both-empty and no-match pairs score 0.0 (DuckDB
  * convention). Operates on Unicode CODEPOINTS (like the oracle), not
  * UTF-16 code units, so supplementary-plane characters count as one
  * symbol (r11, ADVICE). One compiled pass per pair, O(l1·l2) worst case
  * with the usual early exits. */
object JaroWinklerOps {

  def jaroWinkler(s1: UTF8String, s2: UTF8String): Double = {
    val a = s1.toString.codePoints().toArray
    val b = s2.toString.codePoints().toArray
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val jLo = math.max(0, i - window)
      val jHi = math.min(l2 - 1, i + window)
      var j = jLo
      var found = false
      while (j <= jHi && !found) {
        if (!m2(j) && a(i) == b(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (a(i) != b(j)) t += 1
        j += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t / 2.0) / m) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val maxL = math.min(4, math.min(l1, l2))
      while (l < maxL && a(l) == b(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }

  def jaroWinklerCol(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinkler(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** `jaro_winkler(a, b) -> double` (codegen'd). */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerOps.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinklerOps.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
