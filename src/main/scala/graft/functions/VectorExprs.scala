package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two array<double> columns.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * runs interpreted — higher-order functions get no codegen — and
  * allocates a zipped array per row; at 2M candidate pairs × 64 dims
  * that measured 148 s for the embedding near-dup operator. This
  * expression is a tight primitive loop over ArrayData inside
  * whole-stage codegen: same math, no allocation, ~30× faster.
  */
object VectorImpls {
  /** Shared by interpreted eval and generated code (static forwarder). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

case class ArrayDotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorImpls.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorImpls.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Dot product of two array<double> columns (native, codegen'd). */
  def array_dot(a: Column, b: Column): Column =
    GraftShims.column(ArrayDotProduct(GraftShims.expression(a), GraftShims.expression(b)))
}
