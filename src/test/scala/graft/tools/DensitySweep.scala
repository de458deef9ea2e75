package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only crossover measurement for the d09 plan router (test scope —
  * never ships): generates uniform 64-dim corpora at increasing sizes,
  * prints the routing signal (expected pair events per corpus row) next
  * to the wall time of BOTH physical plans, so the
  * Dedup.D09FusedCrossover constant is set from measured walls, not
  * guessed. Uniform centered vectors are the signal sweep: with 8-bit
  * bands a background pair collides in a band w.p. ~0.5^8, so expected
  * pair events grow ~0.023·n² — sweeping n sweeps pe/n directly.
  * Run: sbt "Test/runMain graft.tools.DensitySweep"
  */
object DensitySweep {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private val Planted = 500L

  /** Seeded centered-uniform corpus, fully columnar (ScaleCheck's
    * embedding construction at parameterized size) PLUS [[Planted]]
    * near-dup pairs at cos ≈ 0.9999 (the D12AtScale construction) so
    * the three plans' pair counts are compared on a NON-EMPTY truth
    * set at every n — uniform background alone sheds zero pairs at
    * τ = 0.8 and an empty-vs-empty equality can't distinguish
    * "identical" from "both broken". */
  private def uniform(spark: SparkSession, n: Long): DataFrame = {
    def comp(id: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      (pmod(xxhash64(id, i), lit(2000001L)).cast("double") / 1e6) - lit(1.0)
    val base = spark.range(n).toDF("vec_id")
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(63)), i => comp(col("vec_id"), i)).as("e"))
    val dups = spark.range(Planted).toDF("src")
      .select((col("src") + 10000000L).as("vec_id"),
        transform(sequence(lit(0), lit(63)), i =>
          comp(col("src"), i) +
            (pmod(xxhash64(lit(99L), col("src"), i), lit(2001L)).cast("double") / 1e6 - lit(0.001))
        ).as("e"))
    base.unionAll(dups)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (n <- Seq(2000L, 5000L, 10000L, 20000L, 40000L)) {
      // materialize the corpus so plan walls don't include generation
      val emb = uniform(spark, n).localCheckpoint()
      val keyed = Dedup.cappedCosineBands(emb, Dedup.D09Bits, Dedup.D09Bands, n)
      val (pe, peSec) = time(Dedup.expectedPairEvents(keyed))
      val (nu, tu) = time(Dedup.lshCosineVerifiedPairs(
        emb, Dedup.D09Tau, Dedup.D09Bits, Dedup.D09Bands).count())
      val (nf, tf) = time(Dedup.lshCosineVerifiedPairsFused(
        emb, Dedup.D09Tau, Dedup.D09Bits, Dedup.D09Bands).count())
      val (nb, tb) = time(Dedup.lshCosineVerifiedPairsBucketLocal(
        emb, Dedup.D09Tau, Dedup.D09Bits, Dedup.D09Bands).count())
      println(f"SWEEP n=$n pe=$pe pe_per_n=${pe.toDouble / n}%.1f census=$peSec%.2fs " +
        f"unfused=$tu%.1fs fused=$tf%.1fs bucketlocal=$tb%.1fs pairs=$nu/$nf/$nb")
      emb.unpersist()
    }
    spark.stop()
  }
}
