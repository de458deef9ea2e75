package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only sweep (test scope — never ships): the d12 cell-target
  * trade, measured (round-10 verdict item 7). The SemDeDup census wall
  * is bounded by per-cell population (~cellTarget²/2 pairs per cell ×
  * n/cellTarget cells ⇒ within-cell pair events ≈ n·cellTarget/2),
  * while recall (planted-pair co-location) IMPROVES with larger cells
  * — fewer cell boundaries to straddle. Sweeping the target at
  * 512/1024/2048 on one planted corpus puts numbers on both sides so
  * the D11CellTarget=1024 default is defended with data, not guessed.
  *
  * Corpus: 1,000,000 background + 2,000 planted near-dup pairs at
  * cosine ≈ 0.9999 (the D12AtScale construction at 1/5 scale, so the
  * ×3 sweep stays inside one tool run). Per target: end-to-end census
  * wall (train coarse + train fine + assign + within-cell pairs),
  * n_dropped (= caught planted pairs — uniform background sheds
  * nothing at τ=0.8), and the implied catch rate.
  *
  * Run: sbt "Test/runMain graft.tools.D12CellSweep"; results in
  * NOTES.md.
  */
object D12CellSweep {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-d12-cell-sweep").master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = "/tmp/graft_d12_cellsweep"
    val Background = 1000000L
    val Dups = 2000L
    val DupOffset = 10000000L

    def comp(id: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      (pmod(xxhash64(id, i), lit(2000001L)).cast("double") / 1e6) - lit(1.0)
    val (_, wGen) = time {
      val base = spark.range(Background).toDF("vec_id")
        .select(col("vec_id"),
          transform(sequence(lit(0), lit(63)), i => comp(col("vec_id"), i)).as("embedding"))
      val dupRows = spark.range(Dups).toDF("src")
        .select((col("src") + DupOffset).as("vec_id"),
          transform(sequence(lit(0), lit(63)), i =>
            comp(col("src"), i) +
              (pmod(xxhash64(lit(99L), col("src"), i), lit(2001L)).cast("double") / 1e6 - lit(0.001))
          ).as("embedding"))
      base.unionAll(dupRows)
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"),
          pmod(xxhash64(col("vec_id"), lit(11L)), lit(10)).cast("int").as("label"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    val n = Background + Dups
    println(f"CELLSWEEP corpus n=$n gen=$wGen%.1fs planted=$Dups")

    for (target <- Seq(512L, 1024L, 2048L)) {
      val (k1, k2) = Similarity.d12FactorsAt(n, target)
      val (census, w) = time {
        Similarity.d12CensusAt(spark, dir, target, 3).collect()
      }
      val totVecs = census.map(_.getLong(1)).sum
      val totDropped = census.map(_.getLong(3)).sum
      val maxCell = census.map(_.getLong(1)).max
      println(f"CELLSWEEP target=$target k1=$k1 k2=$k2 K=${k1.toLong * k2} " +
        f"wall=$w%.1fs cells=${census.length} max_cell=$maxCell " +
        f"dropped=$totDropped catch=${totDropped.toDouble / Dups}%.3f " +
        f"conserved=${totVecs == n}")
    }
    spark.stop()
  }
}
