package graft.functions

import org.apache.spark.sql.{Column, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-fingerprint surface —
  * preference order (b) of the build rules: a custom `Expression` with
  * codegen beats a Scala UDF (no Row boxing, stays inside whole-stage
  * codegen, null handling for free via nullSafeEval/defineCodeGen).
  *
  * The reference has no equivalent operators (SURVEY §2.2: scalar
  * string functions absent) — these power the north-star dedup/text
  * pipeline (SimHash near-dup banding, content fingerprint dedup keys).
  */
case class TokenFingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "token_fingerprint64"

  override def nullSafeEval(v: Any): Any =
    HashImpls.tokenFingerprint64(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashImpls.tokenFingerprint64($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): TokenFingerprint64 =
    copy(child = newChild)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any =
    HashImpls.simHash64(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.simHash64($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Column-API + SQL-registry front door for the native expressions. */
object functions {
  def token_fingerprint64(c: Column): Column =
    GraftShims.column(TokenFingerprint64(GraftShims.expression(c)))

  def simhash64(c: Column): Column =
    GraftShims.column(SimHash64(GraftShims.expression(c)))

  /** Idempotent SQL registration: `SELECT simhash64(text) FROM ...`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_fingerprint64", exprs => TokenFingerprint64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
  }
}
