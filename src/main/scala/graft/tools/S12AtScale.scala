package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off at-scale datapoint for s12 (NOTES.md): fold-in cost vs full
  * rebuild on a 1M-vector corpus with a 10% delta — the quantitative
  * case for incremental index maintenance. Also checks planted-copy
  * recall through the folded store: 5 delta vectors are near-copies of
  * the queries, so the folded index must return them at rank 1.
  *
  * Usage: runMain graft.tools.S12AtScale [nTotal]
  */
object S12AtScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // uniform corpus + 5 planted near-copies of queries 0-4 at the TOP
    // of the id space (inside the 10% delta slice)
    def comp(id: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      (pmod(xxhash64(id, i), lit(2000001L)).cast("double") / 1e6) - lit(1.0)
    val base = spark.range(n - 5).toDF("vec_id")
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(63)), i => comp(col("vec_id"), i)).as("embedding"))
    val dups = spark.range(5).toDF("src")
      .select((col("src") + (n - 5)).as("vec_id"),
        transform(sequence(lit(0), lit(63)), i =>
          comp(col("src"), i) + lit(0.0005)).as("embedding"))
    val full = java.nio.file.Files.createTempDirectory("s12scale").toString
    base.unionAll(dups)
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .write.mode("overwrite").parquet(s"$full/embeddings.parquet")

    val sim = graft.operators.Similarity
    // (a) build over the base slice + fold the delta in
    val ((codesT, ccT, fcT, cbT, nBase, k2), buildSec) =
      time(sim.s12BuildBase(spark, full))
    val delta = spark.read.parquet(s"$full/embeddings.parquet")
      .filter(col("vec_id") >= nBase)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val (_, foldSec) = time(sim.s12FoldIn(spark, delta, codesT, ccT, fcT, cbT, k2))
    // (b) the non-incremental alternative: full rebuild over 100%
    val (_, rebuildSec) = time(sim.s11BuildIndex(spark, full))
    // (c) search the FOLDED store; planted copies must come back #1
    val (top1, searchSec) = time {
      sim.s11Search(spark, full, codesT, ccT, fcT, cbT, k2)
        .filter(col("rnk") === 1 && col("query_id") < 5)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    }
    val recall1 = top1.count { case (q, nb) => nb == q + (n - 5) } / 5.0
    println(f"S12ATSCALE n=$n nBase=$nBase build_sec=$buildSec%.1f " +
      f"fold_sec=$foldSec%.1f rebuild_sec=$rebuildSec%.1f " +
      f"fold_vs_rebuild=${rebuildSec / foldSec}%.1fx " +
      f"search_sec=$searchSec%.1f planted_recall1=$recall1%.2f top1=$top1")
    spark.stop()
  }
}
