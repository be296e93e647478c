package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dense-vector kernels as native expressions. The built-in spelling
  * (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) is correct but evaluates its
  * lambdas interpreted per element (higher-order functions sit outside
  * whole-stage codegen) and allocates an intermediate array per row — on the
  * ANN paths that is the entire runtime. One compiled loop, no allocation,
  * same sequential left-to-right accumulation order (so results are
  * bit-identical to the HOF form and to the oracle's ordered sum). */
object VectorOps {

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  private def isFloatArray(t: DataType): Boolean = t match {
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

  private lazy val lf = VectorOps.floatFlag(left)
  private lazy val rf = VectorOps.floatFlag(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lf, rf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOps.dot($a, $b, $lf, $rf)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
}
