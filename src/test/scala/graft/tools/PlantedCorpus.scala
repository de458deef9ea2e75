package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Shared planted-corpus generators for the dev-only scale tools
  * (test scope — never ships). Fully columnar, seeded by xxhash64 —
  * deterministic across partitionings and re-runs.
  *
  * documents (the REAL testdata schema — doc_id, text, lang, source,
  * n_chars — so every gate query runs against it, not just the dedup
  * tier):
  *  - `background` docs: 120 words drawn per-doc from a 30k
  *    vocabulary — word 3-gram shingles are effectively unique, so no
  *    cross-doc similarity;
  *  - `clusters` planted clusters × `clusterSize` members: members
  *    share a cluster base text and differ in exactly 3 of 120 word
  *    positions (pairwise Jaccard ≈ 0.74 — above the 0.6 dedup
  *    threshold);
  *  - `boilerplate` byte-identical docs: the DEGENERATE band key —
  *    above the corpus-relative band caps, so the LSH tiers must skip
  *    it (d01/d02's exact tier is what catches identical docs); its
  *    shingles also exceed the d08/d10 df caps, so the Jaccard and
  *    decontamination domains drop them entirely.
  *
  * embeddings: `background` centered uniform vectors (dim 64, vec_ids
  * from 0 so the s-tier's vec_id<10 query set exists) + `dups`
  * planted near-dup pairs at cosine ≈ 0.9999 for the d09 tier.
  */
object PlantedCorpus {

  val Background = 48000L
  val Clusters = 250
  val ClusterSize = 8
  val Boilerplate = 1000L

  /** Pairs within planted clusters — the ground truth the capped dedup
    * tiers must recover. */
  def plantedPairs: Long = Clusters.toLong * ClusterSize * (ClusterSize - 1) / 2

  /** Docs come from the PRODUCT generator (graft.gen.DocsGenerator) at
    * this fixture's parameters — verified byte-identical to the
    * original in-file generator before the delegation (bit_xor'd
    * xxhash over every column, round 11), so every recorded sweep
    * number stands unchanged. */
  def buildDocs(spark: SparkSession, dir: String): Unit =
    graft.gen.DocsGenerator
      .generate(spark, Background, Clusters, ClusterSize, Boilerplate)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  def buildEmbeddings(spark: SparkSession, dir: String,
      background: Long, dups: Long): Unit = {
    // centered uniform components in [-1, 1); dup of vec p gets a
    // ~1e-3 per-component perturbation (cosine ≈ 0.9999)
    def comp(id: Column, i: Column) =
      (pmod(xxhash64(id, i), lit(2000001L)).cast("double") / 1e6) - lit(1.0)
    val base = spark.range(background).toDF("vec_id")
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(63)), i => comp(col("vec_id"), i)).as("embedding"))
    val dupRows = spark.range(dups).toDF("src")
      .select((col("src") + 1000000L).as("vec_id"),
        transform(sequence(lit(0), lit(63)), i =>
          comp(col("src"), i) +
            (pmod(xxhash64(lit(99L), col("src"), i), lit(2001L)).cast("double") / 1e6 - lit(0.001))
        ).as("embedding"))
    base.unionAll(dupRows)
      // the real testdata stores FLOAT[] + an int label; match it so
      // every query sees the production column types
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"),
        pmod(xxhash64(col("vec_id"), lit(11L)), lit(10)).cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }
}
