package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only λ sweep for s18's MMR re-rank: for each (relW, divW)
  * weighting, measure (a) overlap@5 with the exact top-5 (relevance
  * retention) and (b) the mean pairwise cosine among each query's
  * selected set (result diversity — lower = more diverse). λ = 1 is
  * pure relevance by construction (overlap 1.0); decreasing λ trades
  * retention for diversity. Run:
  * sbt "Test/runMain graft.tools.S18Sweep [sfDir]". Results in NOTES.md.
  */
object S18Sweep {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.core.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    def cosM(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      round(round(graft.operators.Dedup.cosine(a, b), 6) * 1e6, 0).cast("long")
    val wPool = Window.partitionBy(col("qid"))
      .orderBy(col("rel_m").desc, col("nid").asc)
    val pool = emb.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), col("e"),
        cosM(col("qe"), col("e")).as("rel_m"))
      .withColumn("rn", row_number().over(wPool))
      .filter(col("rn") <= graft.operators.Similarity.MmrPool)
      .select("qid", "nid", "e", "rel_m").cache()
    val exactTop = pool.withColumn("rk", row_number().over(wPool))
      .filter(col("rk") <= 5).select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((rw, dw) <- Seq((10L, 0L), (8L, 2L), (7L, 3L), (5L, 5L), (3L, 7L))) {
      val sel = graft.operators.Similarity.mmrSelect(pool, 5, rw, dw)
        .select(col("qid"), col("nid"), col("e")).cache()
      val pairs = sel.select(col("qid"), col("nid").as("na"), col("e").as("ea"))
        .join(sel.select(col("qid"), col("nid").as("nb"), col("e").as("eb")),
          Seq("qid"))
        .filter(col("na") < col("nb"))
        .agg(avg(graft.operators.Dedup.cosine(col("ea"), col("eb"))).as("m"))
        .head().getDouble(0)
      val picked = sel.select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val overlap = picked.intersect(exactTop).size.toDouble / exactTop.size
      println(f"S18SWEEP relW=$rw divW=$dw overlap@5=$overlap%.2f mean_pair_cos=$pairs%.4f")
      sel.unpersist()
    }
    spark.stop()
  }
}
