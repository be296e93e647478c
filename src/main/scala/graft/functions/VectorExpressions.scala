package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, NullType}

/** Dense-vector kernels as native expressions. The built-in spelling
  * (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) is correct but evaluates its
  * lambdas interpreted per element (higher-order functions sit outside
  * whole-stage codegen) and allocates an intermediate array per row — on the
  * ANN paths that is the entire runtime. One compiled loop, no allocation,
  * same sequential left-to-right accumulation order (so results are
  * bit-identical to the HOF form and to the oracle's ordered sum) — and the
  * same NULL semantics (r14 review): a length mismatch or a null element
  * yields NULL, exactly as `zip_with`'s null padding poisons the HOF sum. A
  * dimension-mismatched embedding must surface as NULL, not as a
  * plausible-looking truncated similarity. */
object VectorOps {

  /** Boxed result: null for length mismatch or any null element (the HOF
    * form's semantics); the boxing is elided by escape analysis on the
    * hot non-null path. */
  def dot(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  private[functions] def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def dotCol(a: Column, b: Column): Column =
    GraftBridge.column(ArrayDotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  private[functions] def floatFlag(e: Expression): Boolean =
    isFloatArray(e.dataType)
}

/** `array_dot(array<float|double>, array<float|double>) -> double`. */
case class ArrayDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"
  // null even for non-null inputs: length mismatch / null element
  override def nullable: Boolean = true

  // elements are read through getFloat/getDouble: any other element type
  // would be read as garbage — reject at analysis time (the WordGrams
  // guard); NullType stays accepted (null-in/null-out).
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) | NullType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"array_dot expects array<float|double> on both sides, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  private lazy val lf = VectorOps.floatFlag(left)
  private lazy val rf = VectorOps.floatFlag(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lf, rf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
         |java.lang.Double $tmp = graft.functions.VectorOps.dot($a, $b, $lf, $rf);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
}
