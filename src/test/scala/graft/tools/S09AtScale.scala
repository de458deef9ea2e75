package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only datapoint (test scope — never ships): s09 IVF-PQ at a
  * corpus size whose corpus-relative cell count exceeds the flat
  * quantizer's K = 4096 cap — the billion-vector-shaped regime the
  * composition exists for, unreachable from the driver testdata. Same
  * planted corpus as [[S06AtScale]]/[[D12AtScale]]: 5,000,000 uniform
  * background vectors + 5,000 near-copies at cosine ≈ 0.9999
  * (n = 5,005,000 ⇒ K = 4887, k1 = k2 = 70).
  *
  * Measures (printed + asserted):
  *  - planted recall@1: each query (vec_id < 10) has a planted
  *    near-copy whose PQ code should coincide with the query's own —
  *    the ADC global minimum — and whose cell co-locates w.p. ≈ 0.998
  *    (D12AtScale); floor 0.7 (PQ code collisions with lower-id
  *    background vectors are the loss mode the floor absorbs);
  *  - recall@5 vs the exact s01 brute baseline (uniform corpora are
  *    ANN's adversarial case — recorded, not floored);
  *  - the SCAN REDUCTION the verdict asked to see (round-11 item 1):
  *    ADC-scored code rows (probed cells' population summed over
  *    queries) vs the n·Q rows s07's exhaustive scan touches.
  *
  * Run: sbt "Test/runMain graft.tools.S09AtScale"; results in NOTES.md.
  */
object S09AtScale {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-s09-at-scale").master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = "/tmp/graft_s09_scale"
    val Background = 5000000L
    val Dups = 5000L
    val DupOffset = 10000000L

    // identical construction to S06AtScale/D12AtScale
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
    println(f"S09SCALE corpus n=$n k1=$k1 k2=$k2 K=${k1.toLong * k2} gen=$wGen%.1fs")
    assert(n / 1024 > 4096, "datapoint must exceed the flat-quantizer cap")

    // ---- end-to-end s09 (two-level train + PQ train + index + search) ----
    val (rows, wS09) = time { Similarity.s09IvfPq(spark, dir).collect() }
    val top1 = rows.filter(_.getLong(1) == 1L)
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val hits = (0L until 10L).count(q => top1.get(q).contains(q + DupOffset))
    println(f"S09SCALE e2e=$wS09%.1fs recall@1(planted)=${hits / 10.0}%.2f " +
      s"top1=${top1.toSeq.sortBy(_._1)}")
    assert(hits >= 7, s"planted recall@1 floor 0.7: got $hits/10")

    // ---- recall@5 vs the exact brute baseline ----
    val s09Sets = rows.map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val (exactRows, wExact) = time { Similarity.s01KnnBrute(spark, dir).collect() }
    val exactSets = exactRows.map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val hit5 = exactSets.map { case (q, s) =>
      (s09Sets.getOrElse(q, Set.empty[Long]) & s).size }.sum
    println(f"S09SCALE recall@5(vs s01)=${hit5.toDouble / exactSets.values.map(_.size).sum}%.2f " +
      f"s01_wall=$wExact%.1fs")

    // ---- scan reduction vs s07's exhaustive ADC ----
    val (cc, fc, assigned) = Similarity.twoLevelModel(spark, dir, k1, k2, 3)
    val scanned = Similarity.probeCells(spark, dir, cc, fc, k2)
      .select(col("qid"), col("cid"))
      .join(assigned.groupBy(col("cid")).agg(count(lit(1)).as("m")), "cid")
      .agg(sum(col("m"))).head().getLong(0)
    val q = exactSets.size
    println(f"S09SCALE scanned_rows=$scanned of ${n * q} " +
      f"(frac=${scanned.toDouble / (n * q)}%.5f, reduction=${n.toDouble * q / scanned}%.0fx)")
    assert(scanned < n * q / 100, "cell restriction must cut the scan ≥100×  at this K")
    spark.stop()
  }
}
