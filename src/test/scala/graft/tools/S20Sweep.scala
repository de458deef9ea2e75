package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only s20/s21 rerank-depth sweep (test scope — never ships): the
  * binary tier's R knob (full-vector reads per query) against exact
  * top-5 recall, on the real corpus at a chosen SF. R is the binary
  * tier's nprobe — the budget that buys recall back from the 1-bit
  * signatures' resolution loss. Results in NOTES.md (round 14).
  *
  * Run: sbt "Test/runMain graft.tools.S20Sweep [sfDir]"
  */
object S20Sweep {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val exact = topk(exactScores(spark, sfDir))
    println(f"${"R"}%6s ${"recall@5"}%9s")
    for (r <- Seq(25, 50, 100, 200, 400)) {
      val got = topk(rerank(spark, sfDir, r))
      val hit = got.intersect(exact).size.toDouble / exact.size
      println(f"$r%6d $hit%9.2f")
    }
    spark.stop()
  }

  private def topk(scored: DataFrame): Set[(Long, Long)] = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("c"), 6).desc, col("nid").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def emb(spark: SparkSession, dir: String): DataFrame =
    graft.core.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  private def exactScores(spark: SparkSession, dir: String): DataFrame = {
    val all = emb(spark, dir)
    val q = all.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    all.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        graft.operators.Dedup.cosine(col("qe"), col("e")).as("c"))
  }

  /** s20's nominate(R)+exact-rerank pool as scored (qid, nid, c). */
  private def rerank(spark: SparkSession, dir: String, r: Int): DataFrame = {
    val all = emb(spark, dir)
    val sigs = graft.operators.Similarity.s20SigCols(all)
      .select(col("vec_id"), col("h0"), col("h1"))
    val qs = sigs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("h0").as("q0"), col("h1").as("q1"))
    val wHam = Window.partitionBy(col("qid"))
      .orderBy(col("ham").asc, col("nid").asc)
    val nominated = sigs.join(broadcast(qs), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        (bit_count(col("h0").bitwiseXOR(col("q0"))) +
          bit_count(col("h1").bitwiseXOR(col("q1")))).cast("long").as("ham"))
      .withColumn("rn", row_number().over(wHam))
      .filter(col("rn") <= r)
      .select("qid", "nid")
    val q = all.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    broadcast(nominated.join(broadcast(q), Seq("qid")))
      .join(all, col("nid") === col("vec_id"))
      .select(col("qid"), col("nid"),
        graft.operators.Dedup.cosine(col("qe"), col("e")).as("c"))
  }
}
