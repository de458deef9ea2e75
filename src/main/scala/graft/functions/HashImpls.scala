package graft.functions

/** Scalar hash kernels shared by interpreted eval and generated code.
  *
  * Being a top-level Scala object with no companion class, these compile
  * to static forwarders on `graft.functions.HashImpls`, so whole-stage
  * generated Java can call them directly (`HashImpls.simHash64(...)`).
  *
  * Both are pure, allocation-light functions over UTF-8 bytes —
  * deterministic across JVMs, which is what makes fingerprints usable
  * as distributed dedup keys.
  */
object HashImpls {

  final val FNV_OFFSET: Long = 0xcbf29ce484222325L
  final val FNV_PRIME: Long = 0x100000001b3L

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r' || b == '\f'

  /** FNV-1a 64 over the byte stream with runs of whitespace collapsed to
    * a single separator — a content fingerprint stable under reflow.
    * (Reference has no fingerprint op; this is a north-star text op.)
    */
  def tokenFingerprint64(bytes: Array[Byte]): Long = {
    var h = FNV_OFFSET
    var i = 0
    var pendingSep = false
    var started = false
    while (i < bytes.length) {
      val b = bytes(i)
      if (isSpace(b)) { if (started) pendingSep = true }
      else {
        if (pendingSep) { h = (h ^ 0x20L) * FNV_PRIME; pendingSep = false }
        h = (h ^ (b & 0xffL)) * FNV_PRIME
        started = true
      }
      i += 1
    }
    h
  }

  /** 64-bit SimHash over whitespace tokens: each token FNV-1a-hashed,
    * each signature bit votes ±1, sign of the tally becomes the bit.
    * Near-identical token multisets → small Hamming distance.
    */
  def simHash64(bytes: Array[Byte]): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && isSpace(bytes(i))) i += 1
      if (i < bytes.length) {
        var h = FNV_OFFSET
        while (i < bytes.length && !isSpace(bytes(i))) {
          h = (h ^ (bytes(i) & 0xffL)) * FNV_PRIME
          i += 1
        }
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }
}
