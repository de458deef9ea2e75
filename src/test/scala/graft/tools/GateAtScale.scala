package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only sf1-scale gate run (test scope — never ships): builds a
  * 10×-sf0.1 corpus by KEY-SHIFTED REPLICATION — every table becomes
  * ten copies with primary/foreign keys shifted consistently per copy,
  * so join cardinalities scale exactly ×10 and every relational result
  * stays well-defined — then executes the driver-gate queries against
  * it and prints per-query wall times. This is the tier ScaleCheck does
  * NOT cover (it validates the dedup/similarity caps on a planted
  * corpus): the relational/codec/text/multimodal/sink/streaming
  * queries' plans at 10× the driver's largest SF (round-4 verdict
  * item 6).
  *
  * The document-pair dedup tier (d03-d09) is SKIPPED here: replicated
  * documents make every doc a 10-way exact duplicate, which sends the
  * Jaccard pair space quadratic (and the d09 gate embeds an exact
  * all-pairs truth side) — that tier's 10× behavior is ScaleCheck's
  * job, with a properly planted corpus. The linear exact tiers
  * (d01/d02) and every other family run as-is.
  *
  * Run: sbt "Test/runMain graft.tools.GateAtScale"; results in NOTES.md.
  */
object GateAtScale {

  /** Replication factor — override with the first CLI arg. */
  private var Copies = 10

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Key columns to shift, grouped by key domain — columns sharing a
    * domain (pk + the fks referencing it) shift by the same offset so
    * referential integrity survives replication. */
  private val keyDomains: Map[String, Seq[(String, String)]] = Map(
    // domain -> (table, column)
    "custkey" -> Seq("customer" -> "c_custkey", "orders" -> "o_custkey"),
    "orderkey" -> Seq("orders" -> "o_orderkey", "lineitem" -> "l_orderkey"),
    "partkey" -> Seq("part" -> "p_partkey", "lineitem" -> "l_partkey"),
    "suppkey" -> Seq("supplier" -> "s_suppkey", "lineitem" -> "l_suppkey"),
    "event_id" -> Seq("events" -> "event_id"),
    "user_id" -> Seq("events" -> "user_id"),
    "doc_id" -> Seq("documents" -> "doc_id"),
    "vec_id" -> Seq("embeddings" -> "vec_id"))

  private def buildCorpus(spark: SparkSession, src: String, dst: String): Unit = {
    // events.parquet carries TIMESTAMP(NANOS): read ts as raw nanos and
    // write it back as plain BIGINT — core.Tables/StreamingOps handle
    // both layouts identically (`ts div 1000` on a long)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (t <- tables) {
      val df = spark.read.parquet(s"$src/$t.parquet")
      // one offset per key domain (pk table's max key + 1), applied to
      // every column of the domain present in THIS table
      val domainOffsets: Map[String, Long] = keyDomains.flatMap { case (_, cols) =>
        val (pkTable, pkCol) = cols.head
        lazy val off = spark.read.parquet(s"$src/$pkTable.parquet")
          .agg(max(col(pkCol))).head().getLong(0) + 1L
        cols.collect { case (`t`, c) => c -> off }
      }
      val out =
        if (t == "region" || t == "nation") df // dims: fk targets stay fixed
        else {
          val copies = broadcast(spark.range(Copies).toDF("_copy"))
          df.crossJoin(copies).select(df.columns.map { c =>
            domainOffsets.get(c) match {
              case Some(off) => (col(c) + col("_copy") * off).as(c)
              case None => col(c)
            }
          }: _*)
        }
      if (t == "events") {
        // the streaming source (StreamingOps.readEvents) globs for a
        // FILE named events.parquet, matching the driver testdata's
        // single-file layout — flatten the write into one plain file
        val tmp = s"$dst/_events_tmp"
        out.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
          .filter(p => p.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        java.nio.file.Files.move(part,
          java.nio.file.Paths.get(s"$dst/events.parquet"))
        graft.core.IO.deleteRecursively(java.nio.file.Paths.get(tmp))
      } else out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
  }

  // quadratic-by-replication tier — covered by ScaleCheck instead
  private val Skip = Set("d03_ngram_jaccard", "d04_minhash_lsh", "d05_simhash",
    "d06_embedding_neardup", "d07_dedup_clusters", "d08_ngram_jaccard_capped",
    "d09_lsh_cosine_neardup")

  def main(args: Array[String]): Unit = {
    args.headOption.foreach(a => Copies = a.toInt)
    println(s"SF1GATE copies=$Copies")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dst = graft.core.IO.scratchDir("graft-sf1-gate")
    val (_, buildSec) = time(buildCorpus(spark, "/root/testdata/sf0.1", dst))
    println(f"SF1GATE corpus_build=$buildSec%.1fs dst=$dst")

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    var total = 0.0
    var failed = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if !Skip.contains(name)) {
      try {
        val (_, sec) = time(force(fn(spark, dst)))
        total += sec
        println(f"SF1GATE $name wall=$sec%.2fs")
      } catch {
        case e: Throwable =>
          failed += 1
          println(s"SF1GATE $name FAILED: ${e.getMessage.take(200)}")
      }
    }
    println(f"SF1GATE total=$total%.1fs failed=$failed skipped=${Skip.size}")

    // plan spot-checks at 10×: the star join must still broadcast its
    // dims, the salted join must stay free of single-key hotspots
    val q03plan = graft.operators.Relational.q03(spark, dst)
      .queryExecution.executedPlan.toString
    println("SF1GATE q03_broadcasts=" + q03plan.linesIterator
      .count(_.contains("BroadcastHashJoin")))
    spark.stop()
  }
}
