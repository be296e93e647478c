package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode case/accent folding for match keys: lower-case (root locale),
  * canonical-decompose (NFD), drop non-spacing marks (Mn — the accents),
  * re-compose (NFC). 'Café' and 'cafe', 'naïve' and 'naive' normalize to
  * the same key — the standard pre-dedup / pre-join text canonicalization.
  *
  * Deliberately NOT a compatibility fold: ligatures (ﬁ), fractions (½)
  * and ß pass through unchanged, mirroring
  * `strip_accents(nfc_normalize(lower(x)))` in engines that expose those
  * primitives (the DuckDB oracle spells it exactly that way; parity is
  * fixture-verified). One compiled pass per row; Spark has no built-in
  * for any of the three steps. */
object UnicodeOps {

  def fold(s: UTF8String): UTF8String = {
    val lowered = s.toString.toLowerCase(java.util.Locale.ROOT)
    val nfd = java.text.Normalizer.normalize(lowered, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(
      java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC))
  }

  def foldCol(text: Column): Column =
    GraftBridge.column(UnicodeFold(GraftBridge.expression(text)))
}

/** `unicode_fold(text) -> string` (codegen'd). */
case class UnicodeFold(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_fold"

  override def nullSafeEval(v: Any): Any =
    UnicodeOps.fold(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeOps.fold($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
