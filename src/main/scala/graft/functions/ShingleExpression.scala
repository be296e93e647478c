package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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

  def register(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles",
      exprs => WordShingles(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int]),
      "scala_udf")
  }
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
