package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native trigram→md5-bucket count vector (t26's deterministic text
  * encoder).
  *
  * The composable form (`transform(sequence(...), i -> ... md5(substr)
  * ...)` + one `filter` per dimension) runs interpreted — higher-order
  * functions get no codegen — and allocates a UTF8String per trigram
  * per pass; at sf0.1 the encoder pass alone measured 22 s of t26's
  * 21 s wall (the joins are negligible). This expression is one tight
  * loop per row inside whole-stage codegen: one md5 per trigram
  * (thread-local digest, no per-call getInstance), counts accumulated
  * in a primitive array. Same math, same code-point window semantics
  * as Spark's `substr` (OperatorSpec pins native == composable on
  * ASCII, non-BMP, and sub-trigram inputs).
  */
object TrigramImpls {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Shared by interpreted eval and generated code. Semantics pinned to
    * the composable twin: windows of 3 CODE POINTS (Spark substr
    * counts code points), bucket = md5's first hex digit (the high
    * nibble of byte 0) mod `dims`, counts as doubles; inputs shorter
    * than one trigram return the zero vector. */
  def bucketCounts(s: UTF8String, dims: Int): ArrayData = {
    val str = s.toString
    val counts = new Array[Double](dims)
    val nChars = str.length
    // code-point start offsets (char units)
    var n = 0
    var ci = 0
    while (ci < nChars) { ci += Character.charCount(str.codePointAt(ci)); n += 1 }
    if (n >= 3) {
      val idx = new Array[Int](n + 1)
      ci = 0
      var k = 0
      while (k < n) {
        idx(k) = ci
        ci += Character.charCount(str.codePointAt(ci))
        k += 1
      }
      idx(n) = nChars
      val digest = md.get()
      var i = 0
      while (i + 3 <= n) {
        digest.reset()
        val h = digest.digest(str.substring(idx(i), idx(i + 3))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        counts(((h(0) >> 4) & 0xF) % dims) += 1.0
        i += 1
      }
    }
    new GenericArrayData(counts)
  }
}

case class TrigramBucketCounts(child: Expression, dims: Int)
    extends UnaryExpression {
  // the bucket is the md5 HIGH NIBBLE (0-15) mod dims — the rule the
  // DuckDB oracle replays verbatim. dims > 16 would leave buckets
  // 16..dims-1 permanently zero with no error (round-16 advice), so
  // the contract is enforced here, at the only constructor
  require(dims >= 1 && dims <= 16,
    s"trigram_bucket_counts dims must be in [1, 16] (md5 high-nibble " +
      s"bucket rule — buckets beyond 16 would never fill): got $dims")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "trigram_bucket_counts"

  override def nullSafeEval(s: Any): Any =
    TrigramImpls.bucketCounts(s.asInstanceOf[UTF8String], dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.TrigramImpls.bucketCounts($s, $dims)")

  override protected def withNewChildInternal(
      newChild: Expression): TrigramBucketCounts =
    copy(child = newChild)
}

object TrigramFunctions {
  /** md5-trigram bucket count vector of a string column (native). */
  def trigram_bucket_counts(s: Column, dims: Int): Column =
    GraftShims.column(TrigramBucketCounts(GraftShims.expression(s), dims))
}
