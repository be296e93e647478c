package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined chunking: `cdc_chunks(text, w, d) -> array<string>`.
  *
  * One compiled pass computing every trailing-window rolling hash and
  * slicing the chunk substrings. The HOF formulation it replaces
  * (transform(sequence) over per-position `ascii(substr(...))` + a filter
  * lambda + a slicing transform) evaluates three interpreted lambdas per
  * row outside whole-stage codegen — measured ~6.7 s for q219 at sf0.1;
  * this pass brings the chunking itself to scan speed (case (b) of the
  * custom-operator ladder, as ShingleOps).
  *
  * Semantics are BYTE-IDENTICAL to the HOF/oracle formulation on any
  * corpus where `ascii(substr(t,i,1))` equals the i-th codepoint (all
  * single-codepoint characters): boundary after 1-based position
  * i ∈ [w, n−1] iff Σ_{k<w} code(i−k)·31^k ≡ 0 (mod d), plus the final
  * boundary at n; chunks are the substrings between boundaries. The hash
  * is exact in LONG (max codepoint ·31^7·w ≈ 2.4e17 < 2^63). */
object CdcOps {

  def cdcChunks(text: UTF8String, w: Int, divisor: Int): ArrayData = {
    val s = text.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    val pows = new Array[Long](w)
    var p = 1L
    var k = 0
    while (k < w) { pows(k) = p; p *= 31L; k += 1 }
    val bounds = new scala.collection.mutable.ArrayBuffer[Int](n / 16 + 2)
    var i = w // 1-based end position of the trailing window
    while (i <= n - 1) {
      var h = 0L
      k = 0
      while (k < w) { h += cps(i - 1 - k).toLong * pows(k); k += 1 }
      if (h % divisor == 0) bounds += i
      i += 1
    }
    bounds += n
    val out = new Array[Any](bounds.length)
    var prev = 0
    var j = 0
    while (j < bounds.length) {
      val b = bounds(j)
      out(j) = UTF8String.fromString(new String(cps, prev, b - prev))
      prev = b
      j += 1
    }
    new GenericArrayData(out)
  }

  def cdcChunksCol(text: Column, w: Int, divisor: Int): Column =
    GraftBridge.column(CdcChunks(GraftBridge.expression(text), w, divisor))
}

/** `cdc_chunks(text, w, d) -> array<string>` (codegen'd). */
case class CdcChunks(child: Expression, w: Int, divisor: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(v: Any): Any =
    CdcOps.cdcChunks(v.asInstanceOf[UTF8String], w, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcOps.cdcChunks($c, $w, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
