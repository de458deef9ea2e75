package graft.codecs

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, StringType, StructField, StructType}
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

  def encode(doc: UTF8String): InternalRow = {
    val t = JsoncTape.encode(doc.toString)
    new GenericInternalRow(Array[Any](
      t.nodes,
      new GenericArrayData(t.strings.map(UTF8String.fromString).toArray[Any]),
      new GenericArrayData(t.numbers.toArray)))
  }

  def decode(nodes: Array[Byte], strings: ArrayData, numbers: ArrayData): UTF8String = {
    // decode touches every slot, so wholesale conversion costs nothing extra
    val strs = new Array[String](strings.numElements())
    var i = 0
    while (i < strs.length) { strs(i) = strings.getUTF8String(i).toString; i += 1 }
    UTF8String.fromString(JsoncTape.decode(nodes,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(strs),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(numbers.toDoubleArray())))
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

/** Native tape encoder: JSON text → struct<nodes,strings,numbers>
  * (the reference's jsonc encode, jsonc.rs:52-58) — Jackson streaming
  * parse per row inside whole-stage codegen, no ScalaUDF boundary. */
case class JsoncEncodeExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = JsoncEncodeExpr.schema
  override def prettyName: String = "jsonc_encode"

  override def nullSafeEval(v: Any): Any =
    JsoncTapeBridge.encode(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.codecs.JsoncTapeBridge.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): JsoncEncodeExpr =
    copy(child = newChild)
}

object JsoncEncodeExpr {
  val schema: StructType = StructType(Seq(
    StructField("nodes", BinaryType, nullable = false),
    StructField("strings", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("numbers", ArrayType(DoubleType, containsNull = false), nullable = false)))
}

/** Native tape decoder: tape buffers → JSON text (jsonc.rs:60-62). */
case class JsoncDecodeExpr(nodes: Expression, strings: Expression, numbers: Expression)
    extends TernaryExpression {
  override def first: Expression = nodes
  override def second: Expression = strings
  override def third: Expression = numbers
  override def dataType: DataType = StringType
  override def prettyName: String = "jsonc_decode"

  override def nullSafeEval(n: Any, s: Any, d: Any): Any =
    JsoncTapeBridge.decode(n.asInstanceOf[Array[Byte]],
      s.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (n, s, d) => s"graft.codecs.JsoncTapeBridge.decode($n, $s, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): JsoncDecodeExpr =
    copy(nodes = newFirst, strings = newSecond, numbers = newThird)
}

object JsoncFunctions {
  /** Column API: tape dot-path lookup with quoted-token semantics. */
  def jsonc_get(nodes: Column, strings: Column, numbers: Column, path: Seq[String]): Column =
    GraftShims.column(JsoncGetExpr(GraftShims.expression(nodes),
      GraftShims.expression(strings), GraftShims.expression(numbers), path))

  /** Column API: JSON text → tape struct. */
  def jsonc_encode(doc: Column): Column =
    GraftShims.column(JsoncEncodeExpr(GraftShims.expression(doc)))

  /** Column API: tape buffers → JSON text. */
  def jsonc_decode(nodes: Column, strings: Column, numbers: Column): Column =
    GraftShims.column(JsoncDecodeExpr(GraftShims.expression(nodes),
      GraftShims.expression(strings), GraftShims.expression(numbers)))
}
