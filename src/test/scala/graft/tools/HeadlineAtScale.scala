package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only 100×-sf0.1 datapoint for the FIVE headline pipelines
  * (round-14 verdict item 8, the stretch decade above the routine 10×
  * gate): e01 curation, e02 incremental curation, e05 serving, d13
  * incremental dedup, s11 persisted IVF-PQ build+serve. The d16 and
  * e05 plan defects were only visible at 10× — one more decade is the
  * cheapest way to surface the next superlinear shape.
  *
  * Corpus: the PLANTED generators at 100× the sf0.1 document/embedding
  * row counts (~510k docs incl. 2.5k near-dup clusters + 10k
  * boilerplate; 202k vectors incl. 2k planted near-dup pairs). The
  * five pipelines read only documents/embeddings, so the relational
  * replication of GateAtScale is skipped. Results → NOTES.md.
  *
  * Run: sbt "Test/runMain graft.tools.HeadlineAtScale [docMult]"
  */
object HeadlineAtScale {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dst = graft.core.IO.scratchDir("graft-headline100x")
    val (_, buildSec) = time {
      graft.gen.DocsGenerator
        .generate(spark, 4800L * mult, 25 * mult, 8, 100L * mult)
        .write.mode("overwrite").parquet(s"$dst/documents.parquet")
      PlantedCorpus.buildEmbeddings(spark, dst, 2000L * mult, 20L * mult)
    }
    println(f"HEADLINE100X mult=$mult corpus_build=$buildSec%.1fs dst=$dst")

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val names = Seq("d13_incremental_dedup", "s11_persisted_ivf_pq",
      "e01_curation_pipeline", "e02_incremental_curation",
      "e05_serving_pipeline",
      // the GRAPH CHAIN (round-16 verdict item 9): build the store,
      // stream folds + compaction, serve the pruned graph, then the
      // incremental graph curation census — the lifecycle the s29/s30
      // round persisted, measured one decade up
      "s22_knn_graph", "st18_streaming_graph", "s25_pruned_search",
      "e07_incremental_curation")
    var failed = 0
    for (name <- names) {
      try {
        val (_, sec) = time(force(SparkEntry.queries(name)(spark, dst)))
        println(f"HEADLINE100X $name wall=$sec%.1fs")
      } catch {
        case e: Throwable =>
          failed += 1
          println(s"HEADLINE100X $name FAILED: ${e.getMessage.take(300)}")
      }
    }
    // the fold-count-independence datapoint: the post-stream serve
    // walks ONE compacted bucketed store whatever the fold count was —
    // time the walk alone over st18's compacted adjacency
    try {
      val (folded, st18Sec) = time {
        val (_, _, f) = graft.streaming.StreamingOps.st18Core(spark, dst)
        f.localCheckpoint()
      }
      val sim = graft.operators.Similarity
      val (_, walkSec) = time {
        val (vis, _, _) = sim.s23WalkFrames(spark, sim.emb(spark, dst),
          folded, sim.s23SeedFrontier(spark, dst, 8), 4, 8)
        force(vis)
      }
      println(f"HEADLINE100X st18_compacted_store=$st18Sec%.1fs " +
        f"postcompact_walk=$walkSec%.1fs (walk input = one bucketed " +
        "store, fold-count-independent)")
    } catch {
      case e: Throwable =>
        failed += 1
        println(s"HEADLINE100X postcompact_walk FAILED: ${e.getMessage.take(300)}")
    }
    println(s"HEADLINE100X done failed=$failed")
    spark.stop()
  }
}
