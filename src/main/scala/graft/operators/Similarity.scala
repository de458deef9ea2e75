package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float
  * vectors). Two tiers, mirroring how ANN actually deploys at scale:
  *
  *  - s01: brute-force exact top-k — the correctness baseline. The
  *    query set broadcasts (it's small by construction); candidates
  *    stream through one narrow scan; ranking is a per-query window.
  *  - s02: random-hyperplane LSH — buckets co-partition the corpus, so
  *    at 100 TB the search shuffles once by bucket key and each probe
  *    touches only its bucket's partitions instead of the full corpus.
  *    Multi-probe (flipping each of the 12 sign bits) bounds recall
  *    loss; the ScalaTest pins recall@5 against s01.
  */
object Similarity {

  private val K = 5
  private val NumQueries = 10 // query set: vec_id < 10

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  /** s01: exact cosine top-k for each query vector. Deterministic
    * cross-engine ranking: order by round(cos, 6) then neighbor id. */
  def s01KnnBrute(spark: SparkSession, dir: String): DataFrame = {
    val all = emb(spark, dir)
    val queries = all.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val scored = all.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        Dedup.cosine(col("qe"), col("e")).as("c"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("c"), 6).desc, col("nid").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("qid").as("query_id"), col("rn").as("rnk"),
        col("nid").as("neighbor_id"), round(col("c"), 4).as("cos_sim"))
      .orderBy("query_id", "rnk")
  }

  private val NumPlanes = 8

  /** Deterministic random hyperplanes (seeded PRNG, materialized as a
    * literal — no runtime randomness, so plans are reproducible). */
  private def planes(dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(NumPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-bit bucket id of a vector under the fixed hyperplanes. */
  private def bucketOf(e: Column, dim: Int): Column = {
    val ps = planes(dim)
    (0 until NumPlanes).map { p =>
      val plane = typedLit(ps(p).toSeq)
      val d = aggregate(zip_with(e, plane, (x, y) => x * y), lit(0.0), (a, v) => a + v)
      when(d >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** s02: LSH-bucketed ANN. Corpus hashed once into sign-bit buckets;
    * each query probes its own bucket plus all 1-bit-flip neighbors
    * (multi-probe), then exact-ranks within the candidates. Output
    * shape matches s01 for direct recall comparison; hash-partitioned
    * bucket join is the scale path. Rows-only oracle (bucket layout is
    * engine-specific); recall pinned in ScalaTest.
    */
  def s02AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val all = emb(spark, dir).withColumn("bucket", bucketOf(col("e"), dim))
    val queries = all.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("bucket").as("qb"))
    // multi-probe: own bucket + every ≤2-bit flip (1 + n + n(n-1)/2 probes)
    val flips: Seq[Long] = 0L +:
      ((0 until NumPlanes).map(p => 1L << p) ++
        (for (p <- 0 until NumPlanes; q <- p + 1 until NumPlanes)
          yield (1L << p) | (1L << q)))
    val probes = queries
      .withColumn("flip", explode(array(flips.map(lit(_)): _*)))
      .select(col("qid"), col("qe"), col("qb").bitwiseXOR(col("flip")).as("probe"))
    val cands = probes.join(all, col("probe") === col("bucket") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), Dedup.cosine(col("qe"), col("e")).as("c"))
      .distinct()
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("c"), 6).desc, col("nid").asc)
    cands.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("qid").as("query_id"), col("rn").as("rnk"),
        col("nid").as("neighbor_id"), round(col("c"), 4).as("cos_sim"))
      .orderBy("query_id", "rnk")
  }

  val oracles: Map[String, String] = Map(
    "s01_knn_brute" ->
      ("WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id < 10), " +
        "sc AS (SELECT q.qid, e.vec_id AS nid, " +
        "list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS c " +
        "FROM q JOIN embeddings e ON e.vec_id <> q.qid) " +
        "SELECT qid AS query_id, rn AS rnk, nid AS neighbor_id, round(c, 4) AS cos_sim " +
        "FROM (SELECT qid, nid, c, row_number() OVER (PARTITION BY qid ORDER BY round(c, 6) DESC, nid) AS rn FROM sc) " +
        "WHERE rn <= 5 ORDER BY query_id, rnk")
  )
}
