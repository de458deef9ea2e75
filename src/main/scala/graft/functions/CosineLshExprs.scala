package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native random-hyperplane LSH band keys for cosine similarity.
  *
  * The composable form projects bitsB×bandsL separate `array_dot(e,
  * typedLit(plane))` expressions per row (96 for the d09 config) and
  * assembles them through when/struct/explode. This expression makes
  * the same decisions in ONE operator: the row's vector is read once,
  * every plane dot runs in a tight primitive loop, and the output is
  * directly `array<int>` of bandsL sign-bit keys, ready to posexplode
  * into the LSH bucket join.
  *
  * Determinism contract: planes are the `scala.util.Random(seed)`
  * Gaussian matrix in fill order — byte-identical to the literal
  * planes the composable form embedded, and the dot products accumulate
  * in the same index order, so the produced keys are EXACTLY the ones
  * the previous formulation produced (pinned by OperatorSpec's planted
  * fixtures). Plane matrices are cached per (seed, planes, dim) — one
  * materialization per executor JVM, not per row.
  */
object CosineLshImpls {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Array[Double]]]()

  def planes(seed: Long, nPlanes: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((seed, nPlanes, dim), _ => {
      val rnd = new scala.util.Random(seed)
      Array.fill(nPlanes, dim)(rnd.nextGaussian())
    })

  def bandKeys(e: ArrayData, seed: Long, bitsB: Int, bandsL: Int): ArrayData = {
    val dim = e.numElements()
    val ps = planes(seed, bitsB * bandsL, dim)
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) { v(i) = e.getDouble(i); i += 1 }
    val keys = new Array[Int](bandsL)
    var band = 0
    while (band < bandsL) {
      var k = 0
      var b = 0
      while (b < bitsB) {
        val p = ps(band * bitsB + b)
        var d = 0.0
        var j = 0
        while (j < dim) { d += v(j) * p(j); j += 1 }
        if (d >= 0) k |= (1 << b)
        b += 1
      }
      keys(band) = k
      band += 1
    }
    new GenericArrayData(keys)
  }
}

case class CosineBandKeys(child: Expression, seed: Long, bitsB: Int, bandsL: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cosine_band_keys"

  override def nullSafeEval(v: Any): Any =
    CosineLshImpls.bandKeys(v.asInstanceOf[ArrayData], seed, bitsB, bandsL)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CosineLshImpls.bandKeys($c, ${seed}L, $bitsB, $bandsL)")

  override protected def withNewChildInternal(newChild: Expression): CosineBandKeys =
    copy(child = newChild)
}

object CosineLshFunctions {
  def cosine_band_keys(e: Column, seed: Long, bitsB: Int, bandsL: Int): Column =
    GraftShims.column(CosineBandKeys(GraftShims.expression(e), seed, bitsB, bandsL))
}
