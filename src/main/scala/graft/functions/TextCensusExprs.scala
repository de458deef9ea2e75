package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass subword-piece census (TextOps.t06). The composable
  * form ran FOUR `regexp_extract_all` passes per row — each walks the
  * document with the regex automaton AND materializes an array of
  * match substrings that exists only to be size()'d — and was the 10×
  * gate's slowest query (~15.5 s, round-11 verdict item 5). This is
  * ONE allocation-free linear walk over the raw UTF-8 bytes inside
  * whole-stage codegen computing all four counts at once.
  */
object TextCensusImpls {

  /** [n_pieces, n_word, n_num, n_punct] for the t06 tokenizer classes:
    * maximal [A-Za-z]+ runs, maximal [0-9]+ runs, and single
    * non-alnum-non-whitespace CODEPOINTS (whitespace = Java regex \s =
    * ASCII 0x09-0x0D + space, the class the regex form used;
    * n_pieces = word + num + punct, exactly the alternation
    * "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"). Works on UTF-8 bytes
    * directly: all class tests are ASCII, and a non-ASCII codepoint
    * counts one punct at its LEAD byte ((b & 0xC0) != 0x80 —
    * continuation bytes are skipped), which is exactly the regex's
    * per-codepoint semantics including astral-plane chars.
    *
    * PRECONDITION: input must be VALID UTF-8. An ORPHAN continuation
    * byte (no preceding lead) is silently skipped here, while the
    * regex formulation — operating on a decoded string — would count
    * the resulting U+FFFD replacement as punct; the two only diverge
    * on invalid UTF-8, which text columns read through Spark's string
    * type can never contain (Spark validates/replaces at decode, so
    * by the time this expression sees bytes they are well-formed).
    * Binary-ish inputs must go through a string cast first, never a
    * raw reinterpret (round-12 advice item 4). */
  def bpeCensus(s: UTF8String): ArrayData = {
    val n = s.numBytes()
    var w = 0L
    var d = 0L
    var p = 0L
    var prev = 0 // 0 = other/whitespace, 1 = in letter run, 2 = in digit run
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xff
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
        if (prev != 1) w += 1
        prev = 1
      } else if (b >= '0' && b <= '9') {
        if (prev != 2) d += 1
        prev = 2
      } else if (b == 0x20 || (b >= 0x09 && b <= 0x0d)) {
        prev = 0
      } else if ((b & 0xc0) != 0x80) { // codepoint lead byte
        p += 1
        prev = 0
      } // else: UTF-8 continuation byte of the punct codepoint — skip
      i += 1
    }
    new GenericArrayData(Array(w + d + p, w, d, p))
  }
}

case class BpePieceCensus(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bpe_piece_census"

  override def nullSafeEval(v: Any): Any =
    TextCensusImpls.bpeCensus(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCensusImpls.bpeCensus($c)")

  override protected def withNewChildInternal(newChild: Expression): BpePieceCensus =
    copy(child = newChild)
}

object TextCensusFunctions {
  def bpe_piece_census(c: Column): Column =
    GraftShims.column(BpePieceCensus(GraftShims.expression(c)))
}
