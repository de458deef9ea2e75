package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only datapoint (test scope — never ships): the s06 SEARCH face
  * at a corpus size whose corpus-relative cell count exceeds the flat
  * quantizer's K=4096 cap (round-10 verdict item 1's "done"
  * condition) — the regime the two-level IVF search exists for,
  * unreachable from the driver testdata. Same planted corpus as
  * [[D12AtScale]]: 5,000,000 background vectors + 5,000 near-copies
  * at cosine ≈ 0.9999, n = 5,005,000 ⇒ K = 4887 > 4096, k1 = k2 = 70.
  *
  * Measures (printed + asserted):
  *  - planted recall@1: each query vec_id < 10 has a planted
  *    near-copy; s06's hierarchical probe must retrieve it at rank 1
  *    (floor 0.9 — a boundary miss can cost at most the co-location
  *    rate measured by D12AtScale, 0.998);
  *  - the SEARCH-side crossover: probe-stage wall (rank centroids,
  *    pick probed cells) for a Q-query batch, hierarchical
  *    (k1 + [[Similarity.S06CoarseProbes]]·k2 ≈ 210 distances/query)
  *    vs FLAT (all k1·k2 = 4900 composite centroids ranked per
  *    query) over the same trained centroids — the query-side twin of
  *    TwoLevelSweep's assignment crossover.
  *
  * Run: sbt "Test/runMain graft.tools.S06AtScale"; results in NOTES.md.
  */
object S06AtScale {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-s06-at-scale").master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorFunctions.array_dot

    val dir = "/tmp/graft_s06_scale"
    val Background = 5000000L
    val Dups = 5000L
    val DupOffset = 10000000L

    // identical construction to D12AtScale (components uniform in
    // [-1, 1) from xxhash64; dup = ~1e-3 per-component perturbation)
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
    println(f"S06SCALE corpus n=$n k1=$k1 k2=$k2 K=${k1.toLong * k2} gen=$wGen%.1fs")
    assert(n / 1024 > 4096, "datapoint must exceed the flat-quantizer cap")

    // ---- end-to-end s06 search (train + index + probe + search) ----
    val (rows, wS06) = time { Similarity.s06AnnIvf2Level(spark, dir).collect() }
    val top1 = rows.filter(_.getLong(1) == 1L)
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val hits = (0L until 10L).count(q => top1.get(q).contains(q + DupOffset))
    println(f"S06SCALE e2e=$wS06%.1fs recall@1(planted)=${hits / 10.0}%.2f " +
      s"top1=${top1.toSeq.sortBy(_._1)}")
    assert(hits >= 9, s"planted recall@1 floor 0.9: got $hits/10")

    // ---- search-side probe crossover: hierarchical vs flat ranking ----
    // same trained centroids for both; Q background vectors as the
    // query batch. Flat = rank ALL k1·k2 composite centroids per query
    // (what a flat quantizer's probe costs at this K); hierarchical =
    // rank k1 coarse, then the probed coarse cells' fine centroids.
    val (ccents, fcents, _) = Similarity.twoLevelModel(spark, dir, k1, k2, 3)
    val fc = fcents.select((col("ccid").cast("long") * k2 + col("fcid")).as("cid"),
      col("ccid"), col("fcid"), col("ce"), col("cnrm")).cache()
    val cc = ccents.cache()
    fc.count(); cc.count() // train once, outside the timed region
    for (q <- Seq(10000L, 50000L)) {
      val queries = spark.range(q).toDF("qid")
        .join(spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id").as("qid"),
            col("embedding").cast("array<double>").as("qe")), "qid")
        .withColumn("qnrm", sqrt(array_dot(col("qe"), col("qe"))))
        .cache()
      queries.count()
      val wHier = {
        val wC = Window.partitionBy(col("qid"))
          .orderBy(round(col("cos_c"), 6).desc, col("cid").asc)
        val cpr = queries.crossJoin(broadcast(cc))
          .withColumn("cos_c", array_dot(col("qe"), col("ce")) / (col("qnrm") * col("cnrm")))
          .withColumn("rk", row_number().over(wC))
          .filter(col("rk") <= Similarity.S06CoarseProbes)
          .select(col("qid"), col("qe"), col("qnrm"), col("cid").as("ccid"))
        val wF = Window.partitionBy(col("qid"))
          .orderBy(round(col("cos_f"), 6).desc, col("ccid").asc, col("fcid").asc)
        val (_, w) = time {
          cpr.join(broadcast(fc.drop("cid")), Seq("ccid"))
            .withColumn("cos_f", array_dot(col("qe"), col("ce")) / (col("qnrm") * col("cnrm")))
            .withColumn("rk2", row_number().over(wF))
            .filter(col("rk2") <= Similarity.S06FineProbes)
            .select(col("qid"), (col("ccid").cast("long") * k2 + col("fcid")).as("cid"))
            .write.format("noop").mode("overwrite").save()
        }
        w
      }
      val wFlat = {
        val wAll = Window.partitionBy(col("qid"))
          .orderBy(round(col("cos_a"), 6).desc, col("cid").asc)
        val (_, w) = time {
          queries.crossJoin(broadcast(fc))
            .withColumn("cos_a", array_dot(col("qe"), col("ce")) / (col("qnrm") * col("cnrm")))
            .withColumn("rk", row_number().over(wAll))
            .filter(col("rk") <= Similarity.S06FineProbes)
            .select(col("qid"), col("cid"))
            .write.format("noop").mode("overwrite").save()
        }
        w
      }
      println(f"S06SCALE probe q=$q hier=$wHier%.1fs flat=$wFlat%.1fs " +
        f"speedup=${wFlat / wHier}%.1fx")
      queries.unpersist()
    }
    spark.stop()
  }
}
