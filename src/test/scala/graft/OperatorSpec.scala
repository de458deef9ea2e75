package graft

import graft.functions.HashImpls
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantics tests for the operators that have no DuckDB oracle
  * (hash-based dedup, LSH ANN) plus codegen sanity for the native
  * expressions. Oracle-checked operators are covered by the driver
  * gate (scripts/check_oracle.py replicates it locally).
  */
class OperatorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("token_fingerprint64: stable under whitespace reflow, sensitive to content") {
    def fp(s: String) = HashImpls.tokenFingerprint64(s.getBytes("UTF-8"))
    assert(fp("a b c") == fp("a  b\n c "))
    assert(fp("a b c") != fp("a b d"))
    assert(fp("") == fp("   "))
  }

  test("simhash64: near-identical texts land at small hamming distance") {
    def sh(s: String) = HashImpls.simHash64(s.getBytes("UTF-8"))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val far = "completely different words about spark shuffles and parquet row groups"
    assert(sh(base) == sh(base.replace(" ", "  ")))
    assert(ham(sh(base), sh(near)) < 16, "one-token edit should stay close")
    assert(ham(sh(base), sh(far)) > 16, "unrelated text should be far")
  }

  test("native expressions run inside codegen and via SQL registry") {
    import spark.implicits._
    // parquet-backed scan (a local Seq would fold into LocalTableScan)
    val df = graft.core.Tables(spark, sf, "documents")
    val out = df.select($"text",
      graft.functions.functions.token_fingerprint64($"text").as("fp"),
      graft.functions.functions.simhash64($"text").as("sh"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("token_fingerprint64") && plan.contains("simhash64"))
    // no UDF boundary: expressions are native, not ScalaUDF
    assert(!plan.contains("ScalaUDF"))
    // "*(n)" prefix = operator inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), "projection should be codegen'd")
    val r = out.orderBy($"doc_id").limit(1).collect().head
    assert(r.getLong(1) == HashImpls.tokenFingerprint64(r.getString(0).getBytes("UTF-8")))
    graft.functions.functions.register(spark)
    val viaSql = spark.sql("SELECT simhash64('a b c') AS s").collect().head.getLong(0)
    assert(viaSql == HashImpls.simHash64("a b c".getBytes("UTF-8")))
  }

  test("d05 simhash banding finds the planted near-duplicates") {
    val simPairs = Dedup.d05SimHash(spark, sf)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = Dedup.d03NgramJaccard(spark, sf)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.nonEmpty, "fixture should contain planted near-dups")
    val caught = exactPairs.intersect(simPairs).size.toDouble / exactPairs.size
    assert(caught >= 0.8, s"simhash should catch most planted pairs, got $caught")
  }

  test("s02 ANN recall@5 against s01 exact top-k") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.s01KnnBrute(spark, sf))
    val approx = pairs(Similarity.s02AnnLsh(spark, sf))
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(s"ANN recall@5 = $recall (${approx.size} approx pairs)")
    // uniform-random vectors are the ANN worst case; require a meaningful
    // fraction, not parity — planted-neighbor data would score ~1.0
    assert(recall >= 0.3, s"recall too low: $recall")
  }

  test("multimodal decoder seam: partition-batched, deterministic, full coverage") {
    val out = Multimodal.decodeFeatures(spark, sf)
    val rows = out.collect()
    val nDocs = graft.core.Tables(spark, sf, "documents").count()
    assert(rows.length == nDocs, "one feature vector per media row")
    assert(rows.forall(_.getSeq[Float](1).length == 8), "fixed batch shape (8 dims)")
    // deterministic: same input → same features
    val again = Multimodal.decodeFeatures(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).toSeq ==
      again.map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).toSeq)
  }

  test("q23 HLL sketch stays within its error bound") {
    val rows = Relational.q23(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("s03 IVF recall@5 against s01 exact top-k") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.s01KnnBrute(spark, sf))
    val ivf = pairs(Similarity.s03AnnIvf(spark, sf))
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    info(s"IVF recall@5 = $recall")
    assert(recall >= 0.4, s"recall too low: $recall")
  }

  test("minhash-LSH output equals exact ngram-jaccard output (recall holds)") {
    val lsh = Dedup.d04MinHashLsh(spark, sf).collect().map(_.toSeq).toSet
    val exact = Dedup.d03NgramJaccard(spark, sf).collect().map(_.toSeq).toSet
    assert(lsh == exact)
  }
}
