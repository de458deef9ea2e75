package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only datapoint (test scope — never ships): the PQ
  * compression-recall trade (round-11 verdict item 7), so the s07/s09
  * defaults (M = 8 subquantizers, 4 fine probes) are defended with
  * data instead of asserted. On the sf0.1 embeddings (50k × 64-dim):
  *
  *  - M sweep: exhaustive ADC (s07 form) at M ∈ {4, 8, 16}
  *    (compression 128× / 64× / 32× vs the 4-byte-float vectors) —
  *    recall@5 vs the exact s01 baseline and end-to-end wall;
  *  - probe sweep: s09 IVF-PQ at fine probes ∈ {2, 4, 8} — recall@5
  *    vs s01 plus the measured scanned-code fraction (probed cells'
  *    population / corpus), the factor the cell restriction buys.
  *
  * Run: sbt "Test/runMain graft.tools.PqSweep [sfDir]"; NOTES.md. */
object PqSweep {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def top5Sets(df: DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  private def recall(exact: Map[Long, Set[Long]], got: Map[Long, Set[Long]]): Double = {
    val hits = exact.map { case (q, s) => (got.getOrElse(q, Set.empty) & s).size }.sum
    hits.toDouble / exact.values.map(_.size).sum
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-pq-sweep").master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val exact = top5Sets(Similarity.s01KnnBrute(spark, dir))
    println(s"PQSWEEP dir=$dir queries=${exact.size}")

    for (m <- Seq(4, 8, 16)) {
      val ((got, rc), w) = time {
        val g = top5Sets(Similarity.s07AdcAt(spark, dir, m, Similarity.S07Rounds))
        (g, recall(exact, g))
      }
      val _ = got
      val compression = 256.0 / (m * 0.5) // 64 floats vs M 4-bit codes
      println(f"PQSWEEP adc M=$m%-2d compression=${compression}%.0fx " +
        f"recall@5=$rc%.2f wall=$w%.1fs")
    }

    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    for (probes <- Seq(2, 4, 8)) {
      val ((rc, frac), w) = time {
        val g = top5Sets(Similarity.s09At(spark, dir, probes))
        // scanned fraction: probed cells' population over the corpus
        // (model retrains deterministically — same cells as the run)
        val (k1, k2) = Similarity.d12Factors(n)
        val (cc, fc, assigned) =
          Similarity.twoLevelModel(spark, dir, k1, k2, 3)
        val probed = Similarity.probeCells(spark, dir, cc, fc, k2, probes)
          .select(col("qid"), col("cid"))
        val scanned = probed.join(
            assigned.groupBy(col("cid")).agg(count(lit(1)).as("m")), "cid")
          .agg(sum(col("m"))).head().getLong(0)
        (recall(exact, g), scanned.toDouble / (n * exact.size))
      }
      println(f"PQSWEEP s09 probes=$probes%-2d recall@5=$rc%.2f " +
        f"scanned_frac=$frac%.4f wall=$w%.1fs")
    }
    // the refine tier: exact re-rank of the ADC top-R — how much of
    // PQ's resolution loss the R full-vector reads buy back
    val (rc10, w10) = time {
      recall(exact, top5Sets(Similarity.s10IvfPqRerank(spark, dir)))
    }
    // ceiling: what a PERFECT re-rank could reach = exact ranking over
    // the probed cells (s06 at the same probes)
    val (rc06, _) = time {
      recall(exact, top5Sets(Similarity.s06AnnIvf2Level(spark, dir)))
    }
    println(f"PQSWEEP s10 rerank R=${Similarity.S10Rerank} recall@5=$rc10%.2f " +
      f"(probe ceiling s06=$rc06%.2f) wall=$w10%.1fs")
    spark.stop()
  }
}
