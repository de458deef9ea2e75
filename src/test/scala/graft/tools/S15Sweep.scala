package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only datapoint (test scope — never ships): the s15 budget-vs-
  * recall-vs-scanned trade, so the [[Similarity.S15BudgetCells]] = 3
  * default is defended with data instead of asserted. At each budget
  * multiplier b ∈ {1, 2, 3, 4, 6} average cells' worth of candidates:
  *
  *  - recall@5 vs the exact s01 baseline;
  *  - the realized nprobe spread (min/mean/max across the 10 queries);
  *  - the realized candidate count (sum of probed cells' populations),
  *    i.e. what the budget actually buys vs what it asked for.
  *
  * The useful property to observe: recall saturates at the fixed-probe
  * ceiling while realized scan cost keeps growing with b — the
  * knee defends the default.
  *
  * Run: sbt "Test/runMain graft.tools.S15Sweep [sfDir]"; NOTES.md. */
object S15Sweep {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def top5Sets(df: DataFrame, nidCol: String): Map[Long, Set[Long]] =
    df.select(col("query_id"), col(nidCol)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  private def recall(exact: Map[Long, Set[Long]], got: Map[Long, Set[Long]]): Double = {
    val hits = exact.map { case (q, s) => (got.getOrElse(q, Set.empty) & s).size }.sum
    hits.toDouble / exact.values.map(_.size).sum
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-s15-sweep").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exact = top5Sets(Similarity.s01KnnBrute(spark, dir), "neighbor_id")
    for (b <- Seq(1.0, 2.0, 3.0, 4.0, 6.0)) {
      val (res, w) = time(Similarity.s15At(spark, dir, b).cache())
      res.count()
      val got = top5Sets(res, "neighbor_id")
      val probes = res.select(col("query_id"), col("n_probes")).distinct()
        .collect().map(_.getLong(1))
      val r = recall(exact, got)
      println(f"S15SWEEP budget=${b}%.0f recall@5=$r%.2f " +
        f"nprobe_min=${probes.min} nprobe_mean=${probes.sum.toDouble / probes.length}%.1f " +
        f"nprobe_max=${probes.max} wall=$w%.1fs")
      res.unpersist()
    }
    spark.stop()
  }
}
