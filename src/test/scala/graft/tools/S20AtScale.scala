package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off at-scale datapoint for the binary tier (NOTES.md): at
  * n = 1M 64-dim vectors, measure (a) the one-time signature-store
  * build (map-only), (b) the s21 serve path — 16 B/row Hamming scan +
  * top-50 exact re-rank — against (c) the full-precision brute scan,
  * and (d) planted-copy recall@1 through the binary tier (5 near-
  * copies of queries 0-4 planted at the top of the id space; a
  * near-copy's sign pattern matches its query's except components
  * within 0.0005 of zero, so it nominates at Hamming ≈ 0 and the
  * exact re-rank must return it at rank 1).
  *
  * Usage: Test/runMain graft.tools.S20AtScale [nTotal]
  */
object S20AtScale {
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
    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      if (!d.exists()) 0L else d.listFiles().map(f => f.length()).sum
    }
    // the S12AtScale corpus: uniform + 5 planted near-copies on top
    def comp(id: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      (pmod(xxhash64(id, i), lit(2000001L)).cast("double") / 1e6) - lit(1.0)
    val base = spark.range(n - 5).toDF("vec_id")
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(63)), i => comp(col("vec_id"), i)).as("embedding"))
    val dups = spark.range(5).toDF("src")
      .select((col("src") + (n - 5)).as("vec_id"),
        transform(sequence(lit(0), lit(63)), i =>
          comp(col("src"), i) + lit(0.0005)).as("embedding"))
    val root = java.nio.file.Files.createTempDirectory("s20scale").toString
    base.unionAll(dups)
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .write.mode("overwrite").parquet(s"$root/embeddings.parquet")

    val sim = graft.operators.Similarity
    // (a) the one-time signature-store build
    val (sigPath, buildSec) = time(sim.s21BuildSigStore(spark, root))
    val sigBytes = dirBytes(sigPath)
    val vecBytes = dirBytes(s"$root/embeddings.parquet")
    // (b) the binary serve path: Hamming scan + top-50 exact re-rank
    val (bq, serveSec) = time {
      sim.s21Search(spark, root, sigPath)
        .select(col("query_id"), col("rnk"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    // (c) the full-precision comparator: brute exact cosine top-5
    val all = spark.read.parquet(s"$root/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val q = all.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val wEx = Window.partitionBy(col("qid"))
      .orderBy(round(col("c"), 6).desc, col("nid").asc)
    val (_, bruteSec) = time {
      all.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nid"),
          graft.operators.Dedup.cosine(col("qe"), col("e")).as("c"))
        .withColumn("rn", row_number().over(wEx)).filter(col("rn") <= 5)
        .select("qid", "nid").collect()
    }
    // (d) planted recall@1 through the binary tier
    val top1 = bq.filter(t => t._2 == 1L && t._1 < 5).map(t => (t._1, t._3)).sorted
    val recall1 = top1.count { case (qid, nb) => nb == qid + (n - 5) } / 5.0
    println(f"S20ATSCALE n=$n build_sec=$buildSec%.1f serve_sec=$serveSec%.1f " +
      f"brute_sec=$bruteSec%.1f speedup=${bruteSec / serveSec}%.1fx " +
      f"sig_bytes=$sigBytes vec_bytes=$vecBytes " +
      f"store_ratio=${vecBytes.toDouble / sigBytes}%.1fx " +
      f"planted_recall1=$recall1%.2f top1=${top1.toSeq}")
    spark.stop()
  }
}
