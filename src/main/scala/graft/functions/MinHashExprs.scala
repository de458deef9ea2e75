package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash+LSH band keys.
  *
  * The composable form — 32 `transform(shingles, s => xxhash64(s, p))`
  * lambdas under `array_min` — runs interpreted (no codegen for
  * higher-order functions) and re-walks the shingle array once per
  * permutation. This expression makes ONE pass: each shingle's bytes
  * are hashed once (FNV-1a 64), then each "permutation" is a cheap
  * splitmix64 remix of that base hash — the standard one-hash-many-
  * permutations MinHash construction. Slot minima combine pairwise
  * into band keys, so the output is directly `array<long>` of
  * numBands keys, ready to posexplode into the LSH bucket join.
  */
object MinHashImpls {

  /** splitmix64 finalizer — decorrelates (baseHash, perm) pairs. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** One pass over the shingles: per-shingle FNV base hash, remixed
    * into numPerms slot hashes, tracking minima; minima then combine
    * into numPerms/bandRows band keys. */
  def bandKeys(shingles: ArrayData, numPerms: Int, bandRows: Int): ArrayData = {
    val mins = Array.fill(numPerms)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val bytes = shingles.getUTF8String(i).getBytes
      var h = HashImpls.FNV_OFFSET
      var j = 0
      while (j < bytes.length) {
        h = (h ^ (bytes(j) & 0xffL)) * HashImpls.FNV_PRIME
        j += 1
      }
      var p = 0
      while (p < numPerms) {
        val v = mix(h + p * 0xc2b2ae3d27d4eb4fL)
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    val nBands = numPerms / bandRows
    val keys = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var k = 0xcbf29ce484222325L ^ b
      var r = 0
      while (r < bandRows) {
        k = mix(k ^ mins(b * bandRows + r))
        r += 1
      }
      keys(b) = k
      b += 1
    }
    new GenericArrayData(keys)
  }
}

case class MinHashBandKeys(child: Expression, numPerms: Int, bandRows: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_keys"

  override def nullSafeEval(v: Any): Any =
    MinHashImpls.bandKeys(v.asInstanceOf[ArrayData], numPerms, bandRows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashImpls.bandKeys($c, $numPerms, $bandRows)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

object MinHashFunctions {
  def minhash_band_keys(shingles: Column, numPerms: Int, bandRows: Int): Column =
    GraftShims.column(MinHashBandKeys(GraftShims.expression(shingles), numPerms, bandRows))
}
