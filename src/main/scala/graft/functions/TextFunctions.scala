package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text-pipeline column builders — all built-in (codegen'd)
  * expressions so every derived operator both scales and stays
  * DuckDB-oracle-expressible.
  */
object TextFunctions {

  /** Whitespace tokenization. Both engines tokenize rtrim(text): Java's
    * split drops trailing empty tokens but DuckDB's string_split_regex
    * keeps them, so a document ending in whitespace would diverge —
    * rtrim on BOTH sides pins one semantic (oracles rtrim too). */
  def tokens(text: Column): Column = split(rtrim(text), "\\s+")

  /** Distinct word k-shingles: positions 1..n-k+1, k words joined by a
    * single space; empty array for texts shorter than k. Native
    * codegen'd expression (graft.functions.WordShingles) — the
    * composable HOF form re-tokenized per use site after projection
    * collapse and ran interpreted. */
  def wordShingles(text: Column, k: Int): Column =
    ShingleFunctions.word_shingles(rtrim(text), k)

  /** ALL word k-grams in order WITH multiplicity — the counting twin
    * of [[wordShingles]] (same native single-pass tokenizer; the t14
    * bigram LM needs every occurrence, not the distinct set). */
  def wordNgrams(text: Column, k: Int): Column =
    ShingleFunctions.word_ngrams(rtrim(text), k)

  /** Occurrence count of tokens drawn from a fixed vocabulary. */
  def vocabHits(text: Column, vocab: Seq[String]): Column =
    size(filter(tokens(text), w => w.isin(vocab.map(x => x: Any): _*))).cast("long")

  // Tiny per-language stopword vocabularies for the n-gram/stopword
  // language-ID heuristic. Order matters: ties resolve en > es > de > fr.
  val enStops = Seq("the", "and", "of", "to", "a", "in", "is", "on", "for", "with")
  val esStops = Seq("el", "la", "de", "los", "las", "y", "en", "que", "por", "un")
  val deStops = Seq("der", "die", "und", "das", "ist", "von", "mit", "auf", "ein", "zu")
  val frStops = Seq("le", "la", "et", "les", "des", "un", "une", "dans", "pour", "sur")
}
