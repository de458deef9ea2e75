package graft.codecs

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen bridge for the tape lookup: reads the three tape buffers in
  * their Tungsten form (byte[] + ArrayData) with NO per-row buffer
  * copies — string/number slots are accessed lazily through the shared
  * [[JsoncTape.getCore]] walker, and only the slots the path actually
  * touches get materialized.
  */
object JsoncTapeBridge {
  def get(nodes: Array[Byte], strings: ArrayData, numbers: ArrayData,
      path: Array[String]): UTF8String = {
    val r = JsoncTape.getCore(nodes,
      i => strings.getUTF8String(i).toString,
      i => numbers.getDouble(i),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(path))
    if (r == null) null else UTF8String.fromString(r)
  }
}

/** Native tape dot-path lookup (the reference's jsonc query operator,
  * benches/query.rs:23-28) — the promoted form of the JsoncCodec.get
  * UDF: stays inside whole-stage codegen, no ScalaUDF serialization of
  * the buffers. `path` is a plan-time constant, shipped to generated
  * code as a reference object.
  */
case class JsoncGetExpr(nodes: Expression, strings: Expression,
    numbers: Expression, path: Seq[String]) extends TernaryExpression {

  override def first: Expression = nodes
  override def second: Expression = strings
  override def third: Expression = numbers
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "jsonc_get"

  private lazy val pathArr: Array[String] = path.toArray

  override def nullSafeEval(n: Any, s: Any, d: Any): Any =
    JsoncTapeBridge.get(n.asInstanceOf[Array[Byte]],
      s.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData], pathArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pathRef = ctx.addReferenceObj("jsoncPath", pathArr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, (n, s, d) => {
      s"""
         |${ev.value} = graft.codecs.JsoncTapeBridge.get($n, $s, $d, $pathRef);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): JsoncGetExpr =
    copy(nodes = newFirst, strings = newSecond, numbers = newThird)
}

object JsoncFunctions {
  /** Column API: tape dot-path lookup with quoted-token semantics. */
  def jsonc_get(nodes: Column, strings: Column, numbers: Column, path: Seq[String]): Column =
    GraftShims.column(JsoncGetExpr(GraftShims.expression(nodes),
      GraftShims.expression(strings), GraftShims.expression(numbers), path))
}
