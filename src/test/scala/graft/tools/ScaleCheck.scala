package graft.tools

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only sf1-scale validation (test scope — never ships): builds a
  * 10×-sf0.1 synthetic corpus WITH planted structure, runs the capped
  * dedup tiers against it, and prints planted-recall + wall-times +
  * the bucket-cap census. This is the scale story the small-SF gates
  * can't tell: the caps must (a) skip the degenerate keys and (b) keep
  * every legitimate planted cluster, at 10× the driver's largest SF.
  *
  * Corpus (fully columnar, seeded by xxhash64 — deterministic across
  * partitionings and re-runs):
  *  - 48 000 background docs: 120 words drawn per-doc from a 30k
  *    vocabulary — word 3-gram shingles are effectively unique, so no
  *    cross-doc similarity;
  *  - 250 planted clusters × 8 members (2 000 docs): members share a
  *    cluster base text and differ in exactly 3 of 120 word positions
  *    (pairwise Jaccard ≈ 0.74 — above the 0.6 dedup threshold);
  *  - 1 000 byte-identical boilerplate docs: the DEGENERATE band key —
  *    above the corpus-relative band cap (max(64, 1%·51000) = 510), so
  *    the LSH tiers must skip it (d01/d02's exact tier is what catches
  *    identical docs); its shingles also exceed the d08 df cap
  *    (max(4, 0.2%·51000) = 102), so d08 drops them from the Jaccard
  *    domain entirely.
  *  - embeddings: 50 000 centered uniform vectors (dim 64) + 500
  *    planted near-dup pairs at cosine ≈ 0.9999 for the d09 tier.
  *
  * Run: sbt "Test/runMain graft.tools.ScaleCheck"; results recorded in
  * NOTES.md per round.
  */
object ScaleCheck {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private val Background = PlantedCorpus.Background
  private val Clusters = PlantedCorpus.Clusters
  private val ClusterSize = PlantedCorpus.ClusterSize
  private val EmbBackground = 50000L
  private val EmbDups = 500L

  private def buildDocs(spark: SparkSession, dir: String): Unit =
    PlantedCorpus.buildDocs(spark, dir)

  private def buildEmbeddings(spark: SparkSession, dir: String): Unit =
    PlantedCorpus.buildEmbeddings(spark, dir, EmbBackground, EmbDups)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = graft.core.IO.scratchDir("graft-sf1")
    buildDocs(spark, dir)
    buildEmbeddings(spark, dir)

    val plantedPairs = Clusters * ClusterSize * (ClusterSize - 1) / 2 // 7000

    def pairCount(df: DataFrame): Long = df.count()

    // d08: df-capped exact Jaccard — must keep all planted pairs and
    // drop the boilerplate (its shingles exceed the df cap)
    val (d08n, d08s) = time(pairCount(Dedup.d08NgramJaccardCapped(spark, dir)))
    println(f"SCALE d08_pairs=$d08n (planted=$plantedPairs) wall=$d08s%.1fs")

    // d04: minhash-LSH + band cap + exact verify — boilerplate bucket
    // (1000 > cap 510) skipped; planted clusters (8-member buckets) kept
    val (d04n, d04s) = time(pairCount(Dedup.d04MinHashLsh(spark, dir)))
    println(f"SCALE d04_pairs=$d04n (planted>=${plantedPairs * 999 / 1000}) wall=$d04s%.1fs")

    // d09: hyperplane LSH + exact verify at τ=0.8 over 50.5k vectors —
    // planted 500 dup pairs at cos≈0.9999 must be recovered. Both
    // physical forms (candidates-then-join vs fused verify) are timed:
    // this uniform corpus is the candidates >> n regime where the
    // fused plan should win (see lshCosineVerifiedPairs scaladoc).
    val (d09n, d09s) = time(pairCount(Dedup.d09RawPairs(spark, dir)))
    println(f"SCALE d09_pairs=$d09n (planted=$EmbDups) wall=$d09s%.1fs")
    val embDf = graft.core.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val (d09fn, d09fs) = time(pairCount(Dedup.lshCosineVerifiedPairsFused(
      embDf, Dedup.D09Tau, Dedup.D09Bits, Dedup.D09Bands)))
    println(f"SCALE d09_fused_pairs=$d09fn (must equal ${d09n}) wall=$d09fs%.1fs")

    // similarity tier at 50.5k vectors: exact baseline, IVF, trained IVF
    val (s01n, s01s) = time(Similarity.s01KnnBrute(spark, dir).count())
    println(f"SCALE s01_rows=$s01n wall=$s01s%.1fs")
    val (s03n, s03s) = time(Similarity.s03AnnIvf(spark, dir).count())
    println(f"SCALE s03_rows=$s03n wall=$s03s%.1fs")
    val (s04n, s04s) = time(Similarity.s04AnnIvfKmeans(spark, dir).count())
    println(f"SCALE s04_rows=$s04n wall=$s04s%.1fs")

    println("SCALE bucket census:")
    Dedup.lshBucketCensus(spark, dir).collect().foreach { r =>
      println(s"SCALE   ${r.getString(0)} cap=${r.getLong(1)} buckets=${r.getLong(2)} " +
        s"max=${r.getLong(3)} skipped_buckets=${r.getLong(4)} skipped_rows=${r.getLong(5)}")
    }
    spark.stop()
  }
}
