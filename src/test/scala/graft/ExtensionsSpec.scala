package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions injection: a session built with
  * `withExtensions(new GraftExtensions)` (≡ --conf spark.sql.extensions)
  * can reach the whole native surface from pure SQL.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("native functions resolve from pure SQL via extensions") {
    // getOrCreate ignores withExtensions when a session already exists,
    // so clear the active/default session (keeping the SparkContext)
    // and build a genuinely new one with the extensions applied.
    val prior = TestSpark.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = try {
      SparkSession.builder().master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions).getOrCreate()
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
    val row = ext.sql(
      """SELECT
        |  simhash64('a b c') AS sh,
        |  token_fingerprint64('a  b c') AS fp,
        |  array_dot(array(1.0d, 2.0d), array(2.0d, 3.0d)) AS d,
        |  jsonc_get(t.nodes, t.strings, t.numbers, 'k') AS g,
        |  jsonc_decode(t.nodes, t.strings, t.numbers) AS doc
        |FROM (SELECT jsonc_encode('{"k": "v", "n": 1}') AS t)""".stripMargin)
      .collect().head
    assert(row.getLong(0) == graft.functions.HashImpls.simHash64("a b c".getBytes("UTF-8")))
    assert(row.getLong(1) == graft.functions.HashImpls.tokenFingerprint64("a b c".getBytes("UTF-8")))
    assert(row.getDouble(2) == 8.0)
    assert(row.getString(3) == "\"v\"") // quoted-token semantics survive SQL
    assert(row.getString(4) == """{"k":"v","n":1}""")

    // int8 quantization census from pure SQL: scale 1.0 (micro 1e6),
    // values ±1.0 and 0.5·scale quantize with err 0 / ~scale/254
    val qc = ext.sql(
      "SELECT int8_qcensus(array(1.0d, -1.0d, 0.503937d)) AS c").collect().head
      .getSeq[Long](0)
    assert(qc(0) == 1000000L, s"scale_micro: $qc")
    assert(qc(2) <= 1000000L / 254 + 1, s"max err above half-step: $qc")
    assert(qc(1) >= qc(2), s"sum below max: $qc")

    // t06's one-pass subword census from pure SQL: runs="ab c7!", so
    // words {ab, c}, digits {7}, punct {!} — and a non-ASCII codepoint
    // counts ONE punct (the regex-per-codepoint semantics)
    val bc = ext.sql("SELECT bpe_piece_census('ab c7! é') AS c")
      .collect().head.getSeq[Long](0)
    assert(bc == Seq(5L, 2L, 1L, 2L), s"bpe census: $bc")

    // the LSH/dedup primitives resolve too, matching the DataFrame forms
    val lsh = ext.sql(
      """SELECT
        |  word_shingles('a b c d', 3) AS sh,
        |  size(minhash_band_keys(array('x', 'y'), 32, 2)) AS nbands,
        |  size(cosine_band_keys(array(1.0d, -1.0d), 4242L, 8, 12)) AS ncos
        |""".stripMargin).collect().head
    assert(lsh.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(lsh.getInt(1) == 16) // 32 perms / 2 rows per band
    assert(lsh.getInt(2) == 12)

    // word_ngrams: the counting twin — multiplicity preserved, in
    // document order (word_shingles would collapse the repeat)
    val ng = ext.sql("SELECT word_ngrams('a b a b', 2) AS ng").collect().head
    assert(ng.getSeq[String](0) == Seq("a b", "b a", "a b"))

    // the runtime-filter bloom pair: build in a scalar subquery over a
    // keyed view, probe with might_contain — present keys always hit
    // (no false negatives), and a disjoint probe set mostly misses
    ext.range(0, 1000).createOrReplaceTempView("graft_ext_bloom")
    val bloom = ext.sql(
      """SELECT
        |  sum(CASE WHEN might_contain(
        |    (SELECT bloom_agg(xxhash64(id)) FROM graft_ext_bloom), xxhash64(id))
        |    THEN 1 ELSE 0 END) AS hits_present,
        |  sum(CASE WHEN might_contain(
        |    (SELECT bloom_agg(xxhash64(id)) FROM graft_ext_bloom), xxhash64(id + 1000000))
        |    THEN 1 ELSE 0 END) AS hits_absent
        |FROM graft_ext_bloom""".stripMargin).collect().head
    assert(bloom.getLong(0) == 1000L, s"bloom must have no false negatives: $bloom")
    assert(bloom.getLong(1) < 100L, s"disjoint keys should mostly miss: $bloom")
  }
  test("t26 native trigram encoder equals the composable twin (ASCII, non-BMP, sub-trigram)") {
    val spark = TestSpark.session
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // the native expression exists for speed only — semantics are the
    // composable Column form's, pinned here on the edge inputs that
    // could diverge: code-point windows (non-BMP emoji), accents,
    // below-trigram strings (zero vector), empty
    val rows = Seq("spark join fast", "ab", "", "abc",
      "\u03b1\u03b2\u03b3\u03b4\u03b5", "a\ud83d\ude00b\ud83d\ude00c\ud83d\ude00d",
      "Hello, w\u00f6rld!").toDF("s")
    val both = rows.select(col("s"),
      graft.operators.TextOps.t26Vec(col("s")).as("nat"),
      graft.operators.TextOps.t26VecComposable(col("s")).as("ref")).collect()
    both.foreach { r =>
      assert(r.getSeq[Double](1) == r.getSeq[Double](2),
        s"native encoder diverged on '${r.getString(0)}': " +
          s"${r.getSeq[Double](1)} vs ${r.getSeq[Double](2)}")
    }
  }
  test("trigram_bucket_counts rejects dims outside the md5 high-nibble range") {
    import org.apache.spark.sql.functions.lit
    // the bucket is the md5 high nibble (0-15) mod dims — dims > 16
    // would leave buckets 16.. permanently zero with no error (the
    // round-16 advice); the constructor now enforces the contract
    val e = intercept[IllegalArgumentException] {
      graft.functions.TrigramFunctions.trigram_bucket_counts(lit("abc"), 17)
    }
    assert(e.getMessage.contains("[1, 16]"), e.getMessage)
    intercept[IllegalArgumentException] {
      graft.functions.TrigramFunctions.trigram_bucket_counts(lit("abc"), 0)
    }: Unit
  }
}
