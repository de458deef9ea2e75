package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only sf1-scale gate run (test scope — never ships): builds a
  * 10×-sf0.1 corpus and executes EVERY driver-gate query against it —
  * one command, the full SparkEntry.queries surface, 0 failures
  * expected (round-7 verdict item 6) — printing per-query wall times.
  *
  * Corpus construction is per-table-family:
  *  - relational/events tables: KEY-SHIFTED REPLICATION — ten copies
  *    with primary/foreign keys shifted consistently per copy, so join
  *    cardinalities scale exactly ×10 and every relational result
  *    stays well-defined;
  *  - documents/embeddings: [[PlantedCorpus]] (ScaleCheck's planted
  *    generators, full production schema) at ~10× the sf0.1 row
  *    counts. Replication would make every doc a 10-way exact
  *    duplicate and send the Jaccard pair space quadratic; the planted
  *    corpus instead carries known clusters, boilerplate degenerate
  *    keys and near-dup embedding pairs, so the d03-d09 tier runs
  *    with non-degenerate semantics and its caps/recall exercised.
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
    // events.parquet `ts` layout varies by driver generation (raw
    // TIMESTAMP(NANOS) read as BIGINT under nanosAsLong, or
    // TIMESTAMP(MICROS) read as TIMESTAMP_NTZ) — the replica inherits
    // whichever layout the source carries; core.Tables/StreamingOps
    // probe the column type and handle both.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events")
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
    // the document-pair tier gets a PLANTED corpus at ~10× sf0.1 rows
    // (5000 docs / 2000 vectors): replication would degenerate it
    PlantedCorpus.buildDocs(spark, dst) // 51 000 docs
    PlantedCorpus.buildEmbeddings(spark, dst, 20000L, 200L) // 20 200 vecs
  }

  def main(args: Array[String]): Unit = {
    args.headOption.foreach(a => Copies = a.toInt)
    println(s"SF1GATE copies=$Copies")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
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
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
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
    println(f"SF1GATE total=$total%.1fs failed=$failed skipped=0")

    // plan spot-checks at 10×: the star join must still broadcast its
    // dims, the salted join must stay free of single-key hotspots
    val q03plan = graft.operators.Relational.q03(spark, dst)
      .queryExecution.executedPlan.toString
    println("SF1GATE q03_broadcasts=" + q03plan.linesIterator
      .count(_.contains("BroadcastHashJoin")))
    spark.stop()
  }
}
