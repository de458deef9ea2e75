package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only datapoint (test scope — never ships): runs the d12
  * two-level SemDeDup pipeline END-TO-END at a corpus size whose
  * corpus-relative cell count exceeds the flat quantizer's K=4096 cap
  * (r9 verdict item 3's "done" condition) — the regime d12 exists for,
  * unreachable from the driver testdata (embeddings top out at ~50k
  * rows even in the 10× gate ⇒ K ≤ 48).
  *
  * Corpus: 5,000,000 background vectors (deterministic xxhash64
  * components, same construction as [[PlantedCorpus.buildEmbeddings]]
  * but with the duplicate block offset moved to 10,000,000 so ids
  * cannot collide at this n) + 5,000 planted near-dup pairs
  * (per-component ~1e-3 perturbation ⇒ cosine ≈ 0.9999 ≥ τ=0.8).
  * n = 5,005,000 ⇒ K = n/1024 = 4887 > 4096, factored k1 = 70, k2 = 70.
  *
  * Checks (printed + asserted):
  *  - conservation: the census's total n_vecs equals the corpus count
  *    (every vector lands in exactly one (coarse, fine) cell);
  *  - non-vacuous drops: planted pairs make n_dropped > 0;
  *  - planted co-location: the fraction of planted pairs whose two
  *    sides land in the SAME composite cell (the only way SemDeDup can
  *    catch them — the documented boundary-miss approximation is
  *    exactly 1 minus this), measured and floor-asserted at 0.5;
  *  - per-stage walls: corpus write, end-to-end d12 (train coarse +
  *    train fine + assign + pair census), assignment-only.
  *
  * Run: sbt "Test/runMain graft.tools.D12AtScale"; results in NOTES.md.
  */
object D12AtScale {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-d12-at-scale").master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = "/tmp/graft_d12_scale"
    val Background = 5000000L
    val Dups = 5000L
    val DupOffset = 10000000L

    // same deterministic construction as PlantedCorpus.buildEmbeddings
    // (components uniform in [-1, 1) from xxhash64; dup = ~1e-3
    // per-component perturbation of its source), dup ids at an offset
    // no background id can reach
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
    val (k1, k2) = Similarity.d12Factors(n)
    println(f"D12SCALE corpus n=$n k1=$k1 k2=$k2 K=${k1.toLong * k2} gen=$wGen%.1fs")
    assert(n / 1024 > 4096, "datapoint must exceed the flat-quantizer cap")

    // end-to-end d12: coarse train + fine train + assign + pair census
    val (census, wE2e) = time {
      Similarity.d12SemanticDedup2Level(spark, dir).collect()
    }
    val totVecs = census.map(_.getLong(1)).sum
    val totDropped = census.map(_.getLong(3)).sum
    println(f"D12SCALE e2e=$wE2e%.1fs cells=${census.length} " +
      f"n_vecs=$totVecs n_dropped=$totDropped")
    assert(totVecs == n, s"census must conserve the corpus: $totVecs != $n")
    assert(totDropped > 0, "planted near-dups must make drops non-vacuous")

    // assignment-only wall + planted co-location (the SemDeDup catch
    // bound: a planted pair is catchable iff both sides share a cell)
    val (asg, wAsg) = time {
      val a = Similarity.twoLevelAssign(spark, dir, k1, k2, 3)
        .select(col("vec_id"), col("cid"))
      a.count()
      a
    }
    val srcCells = asg.select(col("vec_id").as("src"), col("cid").as("cid_src"))
    val dupCells = asg.filter(col("vec_id") >= DupOffset)
      .select((col("vec_id") - DupOffset).as("src"), col("cid").as("cid_dup"))
    val co = dupCells.join(srcCells, "src")
      .agg(count(lit(1)).as("pairs"),
        sum(when(col("cid_src") === col("cid_dup"), 1L).otherwise(0L)).as("same"))
      .collect()(0)
    val rate = co.getLong(1).toDouble / co.getLong(0)
    println(f"D12SCALE assign=$wAsg%.1fs planted=${co.getLong(0)} " +
      f"colocated=${co.getLong(1)} rate=$rate%.3f")
    assert(co.getLong(0) == Dups, "every planted pair must be joinable")
    assert(rate >= 0.5, f"co-location floor: $rate%.3f < 0.5")

    spark.stop()
  }
}
