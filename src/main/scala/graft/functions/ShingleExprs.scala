package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-k-shingles.
  *
  * Equivalent to `array_distinct(transform(sequence(...), i =>
  * concat_ws(" ", slice(split(text, "\s+"), i, k))))` but in one
  * codegen'd pass: those higher-order functions run interpreted and
  * rebuild the token array per use site after projection collapse.
  *
  * Semantics match Spark's `split(text, "\s+")` exactly — including
  * the leading empty token when the text starts with whitespace — so
  * the DuckDB oracle (string_split_regex) stays aligned.
  */
object ShingleImpls {

  @inline private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' || c == '\r'

  def wordShingles(text: UTF8String, k: Int): GenericArrayData = {
    val s = text.toString
    // tokenize like java's split("\\s+"): leading empty token kept,
    // trailing empties dropped
    val toks = new scala.collection.mutable.ArrayBuffer[String](32)
    var i = 0
    val n = s.length
    if (n > 0 && isSpace(s.charAt(0))) toks += ""
    while (i < n) {
      while (i < n && isSpace(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isSpace(s.charAt(i))) i += 1
        toks += s.substring(start, i)
      }
    }
    if (toks.isEmpty && n == 0) toks += "" // "".split -> [""]
    val m = toks.length
    if (m < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((m - k + 1) * 2)
    var j = 0
    while (j <= m - k) {
      val sb = new java.lang.StringBuilder()
      var g = 0
      while (g < k) {
        if (g > 0) sb.append(' ')
        sb.append(toks(j + g))
        g += 1
      }
      seen.add(sb.toString)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  /** ALL word-k-grams in document order, WITH multiplicity — the
    * counting twin of [[wordShingles]] (which dedupes for the Jaccard
    * tier; frequency operators like the t14 bigram LM need every
    * occurrence). Same tokenizer, same single codegen'd pass. */
  def wordNgrams(text: UTF8String, k: Int): GenericArrayData = {
    val s = text.toString
    val toks = new scala.collection.mutable.ArrayBuffer[String](32)
    var i = 0
    val n = s.length
    if (n > 0 && isSpace(s.charAt(0))) toks += ""
    while (i < n) {
      while (i < n && isSpace(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isSpace(s.charAt(i))) i += 1
        toks += s.substring(start, i)
      }
    }
    if (toks.isEmpty && n == 0) toks += "" // "".split -> [""]
    val m = toks.length
    if (m < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - k + 1)
    var j = 0
    while (j <= m - k) {
      val sb = new java.lang.StringBuilder()
      var g = 0
      while (g < k) {
        if (g > 0) sb.append(' ')
        sb.append(toks(j + g))
        g += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(v: Any): Any =
    ShingleImpls.wordShingles(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleImpls.wordShingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

case class WordNgrams(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(v: Any): Any =
    ShingleImpls.wordNgrams(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleImpls.wordNgrams($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object ShingleFunctions {
  def word_shingles(text: Column, k: Int): Column =
    GraftShims.column(WordShingles(GraftShims.expression(text), k))

  def word_ngrams(text: Column, k: Int): Column =
    GraftShims.column(WordNgrams(GraftShims.expression(text), k))
}
