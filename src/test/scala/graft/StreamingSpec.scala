package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming coverage: the streaming windowed aggregation
  * must agree with its batch equivalent on a bounded source, and the
  * stateful sessionizer must partition each user's events into
  * gap-consistent sessions.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("streaming windowed agg equals the batch computation") {
    val stream = StreamingOps.readEvents(spark, sf)
    val agg = StreamingOps.windowedCounts(stream)
    val streamed = StreamingOps.runToMemory(spark, agg, "win_counts")
      .orderBy("win_start", "event_type")
      .collect().map(_.toSeq)

    val batch = graft.core.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")
      .collect().map(_.toSeq)

    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming dedup matches batch distinct") {
    import org.apache.spark.sql.streaming.OutputMode
    val stream = StreamingOps.dedupped(StreamingOps.readEvents(spark, sf))
      .groupBy().count()
    val q = stream.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("dedup_count").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("dedup_count").collect().head.getLong(0)
    val batch = graft.core.Tables.events(spark, sf)
      .dropDuplicates("event_id", "ts").count()
    assert(streamed == batch)
  }

  test("stream-stream join equals the batch join") {
    import org.apache.spark.sql.streaming.OutputMode
    val joined = StreamingOps.purchaseSignupJoin(StreamingOps.readEvents(spark, sf))
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ss_join").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ss_join")
      .orderBy("purchase_id", "signup_id").collect().map(_.toSeq)

    val ev = graft.core.Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val s = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"), col("ts").as("s_ts"))
    val batch = p.join(s,
        col("user_id") === col("s_user") && col("s_ts") <= col("p_ts") &&
          col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("signup_id"), col("user_id"))
      .orderBy("purchase_id", "signup_id").collect().map(_.toSeq)

    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("foreachBatch sink lands a partitioned table equal to the source") {
    val out = graft.core.IO.scratchDir("graft-stream-sink")
    val q = StreamingOps.sinkPartitioned(StreamingOps.readEvents(spark, sf), out)
    q.processAllAvailable(); q.stop()
    val written = spark.read.parquet(out)
    val src = graft.core.Tables.events(spark, sf)
    assert(written.count() == src.count())
    // partition layout exists per event_type
    val parts = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(parts.exists(_.startsWith("event_type=")), parts.mkString(","))
    // partition-pruned read returns the right slice
    assert(written.filter(col("event_type") === "purchase").count() ==
      src.filter(col("event_type") === "purchase").count())
  }

  test("streaming sessionizer closes sessions by event-time timeout, keeps open ones") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    // offset from epoch: the initial watermark is 0, and an event AT
    // the watermark is dropped as late — epoch-0 timestamps vanish
    def ts(min: Long) = new Timestamp((100 + min) * 60 * 1000)
    val input = MemoryStream[StreamingOps.Ev](spark)
    val sessions = StreamingOps.sessionizeStreaming(input.toDS())
    val q = sessions.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .format("memory").queryName("timeout_sessions").start()
    try {
      // batch 1: user 1 has two events 10 min apart (one open session)
      input.addData(StreamingOps.Ev(1L, ts(0), 1.0), StreamingOps.Ev(1L, ts(10), 2.0))
      q.processAllAvailable()
      assert(spark.table("timeout_sessions").isEmpty,
        "session still open — nothing may be emitted yet")
      // batch 2: user 2 far in the future moves the watermark (10 min
      // delay) past user 1's end+gap = 10+30 = 40 min; the timeout for
      // user 1 fires on the following trigger
      input.addData(StreamingOps.Ev(2L, ts(120), 5.0))
      q.processAllAvailable()
      // batch 3: empty-ish trigger so the new watermark is applied to
      // timeout processing (watermark updates take effect next batch)
      input.addData(StreamingOps.Ev(2L, ts(121), 6.0))
      q.processAllAvailable()
      val emitted = spark.table("timeout_sessions").as[StreamingOps.Session].collect()
      assert(emitted.toSeq == Seq(StreamingOps.Session(1L, 2, ts(0), ts(10), 3.0)),
        s"expected user 1's closed session, got ${emitted.toSeq}")
      assert(!emitted.exists(_.user_id == 2L), "user 2's session must stay open in state")
    } finally q.stop()
  }

  test("streaming sessionizer merges watermark-admitted LATE events without regressing bounds") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp((100 + min) * 60 * 1000)
    val input = MemoryStream[StreamingOps.Ev](spark)
    val q = StreamingOps.sessionizeStreaming(input.toDS()).writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .format("memory").queryName("late_sessions").start()
    try {
      input.addData(StreamingOps.Ev(1L, ts(60), 1.0)) // 13:40; watermark → 13:30
      q.processAllAvailable()
      // LATE but admitted (13:31 > watermark): must WIDEN the open
      // session backwards, not overwrite its end
      input.addData(StreamingOps.Ev(1L, ts(51), 2.0))
      q.processAllAvailable()
      // 14:05 is 25 min after the TRUE end (13:40): same session. With
      // the regressed end (13:31) it would have been 34 min — a bogus
      // session split (the bug this test pins)
      input.addData(StreamingOps.Ev(1L, ts(85), 4.0))
      q.processAllAvailable()
      // advance the watermark far past end+gap, then one more trigger
      // so the timeout fires
      input.addData(StreamingOps.Ev(2L, ts(300), 0.0))
      q.processAllAvailable()
      input.addData(StreamingOps.Ev(2L, ts(301), 0.0))
      q.processAllAvailable()
      val got = spark.table("late_sessions").as[StreamingOps.Session]
        .collect().filter(_.user_id == 1L).toSeq
      assert(got == Seq(StreamingOps.Session(1L, 3, ts(51), ts(85), 7.0)),
        s"expected one merged session, got $got")
    } finally q.stop()
  }

  test("session_window runs verbatim over readStream; finalized sessions match batch") {
    import org.apache.spark.sql.streaming.OutputMode
    def sessionAgg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s"),
          col("n_events"), col("total_value"),
          col("session_window.end").as("w_end"))
    val agg = sessionAgg(StreamingOps.readEvents(spark, sf).withWatermark("ts", "10 minutes"))
      .drop("w_end")
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sw_stream").start()
    q.processAllAvailable(); q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))
    val streamed = spark.table("sw_stream").collect().map(key).toSet

    val ev = graft.core.Tables.events(spark, sf)
    val batchRows = sessionAgg(ev).collect()
    val batch = batchRows.map(key).toSet
    // append mode emits a session once the watermark passes its window
    // end; the final watermark on a bounded run is max(ts) - delay, so
    // sessions ending strictly inside that horizon MUST all be out,
    // and nothing may be emitted that batch doesn't have
    val horizonMs = ev.agg(max(col("ts"))).head().getTimestamp(0).getTime - 10 * 60 * 1000
    val mustEmit = batchRows
      .filter(_.getTimestamp(4).getTime < horizonMs - 1000).map(key).toSet
    assert(streamed.nonEmpty && streamed.subsetOf(batch),
      s"streamed sessions disagree with batch: ${(streamed -- batch).take(3)}")
    assert(mustEmit.subsetOf(streamed),
      s"watermark-cleared sessions missing: ${(mustEmit -- streamed).take(3)}")
  }

  test("st12 streaming CDC merge: 3 micro-batch upserts equal the one-shot batch merge") {
    val (outDf, n) = StreamingOps.st12Core(spark, sf)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val streamed = outDf.collect().map(key).toSeq
    val batch = graft.operators.Sinks.p12MergeUpsert(spark, sf).collect().map(key).toSeq
    assert(n == 3, s"expected exactly 3 non-empty micro-batch merges, got $n")
    assert(streamed == batch,
      s"streamed snapshot diverged from the one-shot merge " +
        s"(${streamed.size} vs ${batch.size} rows)")
  }

  test("st15 streaming view maintenance: 3 micro-batch refreshes equal the one-shot incremental view") {
    val (outDf, n) = StreamingOps.st15Core(spark, sf)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
    val streamed = outDf.collect().map(key).toSeq
    val batch = graft.operators.Sinks.p15IncrementalView(spark, sf)
      .collect().map(key).toSeq
    assert(n == 3, s"expected exactly 3 non-empty micro-batch refreshes, got $n")
    assert(streamed == batch,
      s"streamed view diverged from the one-shot incremental view " +
        s"(${streamed.size} vs ${batch.size} rows)")
  }

  test("st16 streaming CMS: 3 micro-batch folds compose to the one-shot sketch, cell for cell") {
    import org.apache.spark.sql.functions._
    val (outDf, n, grid) = StreamingOps.st16Core(spark, sf)
    assert(n == 3, s"expected exactly 3 non-empty micro-batch folds, got $n")
    val cellKey = (r: org.apache.spark.sql.Row) =>
      ((r.getInt(0), r.getLong(1)), r.getLong(2))
    val streamedGrid = grid.collect().map(cellKey).toMap
    val batchGrid = graft.operators.TextOps.t13CellsOf(
        graft.core.Tables(spark, sf, "documents").select(col("text")))
      .collect().map(cellKey).toMap
    // mergeability made real: cellwise-summed batch grids == the
    // one-shot grid exactly (not within-epsilon — EXACTLY)
    assert(streamedGrid == batchGrid,
      s"streamed grid diverged from one-shot (${streamedGrid.size} vs ${batchGrid.size} cells)")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3))
    val streamed = outDf.collect().map(key).toSeq
    val batch = graft.operators.TextOps.t13CmsHeavyHitters(spark, sf)
      .collect().map(key).toSeq
    assert(streamed == batch, "streamed heavy-hitter report diverged from batch t13")
  }

  test("st17 streaming lexical index: 3 folds equal the one-shot index, df term-for-term") {
    import org.apache.spark.sql.functions._
    val (outDf, n, dfFolded) = StreamingOps.st17Core(spark, sf)
    assert(n == 3, s"expected exactly 3 non-empty micro-batch folds, got $n")
    // the folded df table == the one-shot corpus df, term for term —
    // the term-wise-sum merge law made real
    val streamedDf = dfFolded.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val d = graft.core.Tables(spark, sf, "documents")
    val batchDf = d.select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("term").agg(count(lit(1)).as("df")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamedDf == batchDf,
      s"folded df diverged (${streamedDf.size} vs ${batchDf.size} terms)")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val streamed = outDf.collect().map(key).toSeq
    val batch = graft.operators.TextOps.t18Bm25(spark, sf).collect().map(key).toSeq
    assert(streamed == batch, "streamed BM25 serve diverged from batch t18")
  }

  test("st18 streaming graph ingest: 3 folds equal the one-shot s26 insert, edge for edge") {
    import org.apache.spark.sql.functions._
    val (outDf, n, folded) = StreamingOps.st18Core(spark, sf)
    assert(n == 3, s"expected exactly 3 non-empty micro-batch folds, got $n")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    val streamed = outDf.collect().map(key).toSeq
    val batch = graft.operators.Similarity.s26GraphInsert(spark, sf)
      .collect().map(key).toSeq
    // batch-split invariance made real: top-k folding is associative,
    // so three streamed folds == the one-shot insert EXACTLY
    assert(streamed == batch,
      s"streamed graph fold diverged from one-shot s26 (${streamed.size} vs ${batch.size} rows)")
    // the folded graph serves through the unchanged s23/s25 walk: the
    // back-link face is LIVE (some delta node won a base node's edge
    // slot — a delta vector only becomes reachable by beating an
    // incumbent, the s26 contract) and the walk visits live nodes
    val nBase = graft.core.Tables(spark, sf, "embeddings").count() *
      graft.operators.Similarity.S12BaseNum / graft.operators.Similarity.S12BaseDen
    assert(folded.filter(col("dst_id") >= nBase).count() > 0,
      "no delta node won any in-edge — the back-link face is dead")
    val g = folded.localCheckpoint()
    val (vis, _, _) = graft.operators.Similarity.s23WalkFrames(spark,
      graft.operators.Similarity.emb(spark, sf), g,
      graft.operators.Similarity.s23SeedFrontier(spark, sf, 8), 2, 8)
    assert(vis.count() > 0, "the folded graph must walk")
  }

  test("st19 streaming snapshots: per-batch commits equal batch p13; replay keeps manifest rows exactly-once") {
    import org.apache.spark.sql.functions._
    val (outDf, n, root) = StreamingOps.st19Core(spark, sf)
    assert(n == 2, s"expected exactly 2 committed micro-batches, got $n")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val streamed = outDf.collect().map(key).toSeq
    val batch = graft.operators.Sinks.p13TimeTravel(spark, sf)
      .collect().map(key).toSeq
    assert(streamed == batch,
      s"streamed snapshots diverged from batch p13 (${streamed.size} vs ${batch.size} rows)")
    // exactly-once manifest rows: one (snap, pk) entry across the
    // whole commit history …
    def manifest() = spark.read
      .parquet(s"$root/manifest", s"$root/manifest_b*")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val m0 = manifest()
    assert(m0.map(r => (r._1, r._2)).distinct.size == m0.size,
      s"duplicate manifest rows after the stream: $m0")
    // the roll-up is metadata-identical to the commit history (and
    // idempotent — a second roll-up rewrites the same rows)
    def rolled() = spark.read.parquet(s"$root/manifest_rolled")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(rolled() == m0, "rolled-up manifest must equal the history")
    StreamingOps.st19RollUpManifests(spark, root)
    assert(rolled() == m0, "a second roll-up must be a no-op")
    // … and a FORCED REPLAY of both committed batches is a no-op: the
    // marker (each commit dir's _SUCCESS, written last) short-circuits,
    // so the manifest — and therefore every snapshot — is unchanged
    val d = graft.core.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    assert(!StreamingOps.st19CommitIfAbsent(spark, root, 1L,
      graft.operators.Sinks.p12Changes(d)), "replayed batch 1 must skip")
    assert(!StreamingOps.st19CommitIfAbsent(spark, root, 2L,
      graft.operators.Sinks.p13Changes2(d)), "replayed batch 2 must skip")
    assert(manifest() == m0, "a replay must not change the manifest")
  }

  test("st20 commit-log vacuum: O(1) dirs, replay-after-vacuum no-op, serve unchanged, log stays writable") {
    import org.apache.spark.sql.functions._
    val (outDf, n, root) = StreamingOps.st20Core(spark, sf)
    assert(n == 2, s"expected exactly 2 committed micro-batches, got $n")
    // O(1) retention: the batchId-keyed commit dirs are GONE — the
    // rolled manifest + the HWM mark are the whole remaining history
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftover = Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$root/manifest_b*"))).toSeq.flatten
    assert(leftover.isEmpty, s"commit dirs survived the vacuum: " +
      leftover.map(_.getPath.getName).mkString(", "))
    assert(StreamingOps.commitLogHwm(spark, root) == 2L,
      "HWM must record the largest absorbed snapshot")
    // serve unchanged: the vacuumed table still time-travels to
    // exactly the batch p13 snapshots (st20Core already forced the
    // replay-after-vacuum no-ops via its own require()s)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val streamed = outDf.collect().map(key).toSeq
    val batch = graft.operators.Sinks.p13TimeTravel(spark, sf)
      .collect().map(key).toSeq
    assert(streamed == batch, "post-vacuum snapshots diverged from batch p13")
    // the log stays WRITABLE: a NEW commit (v=3 > HWM) is not blocked
    // by the watermark and bases on the rolled-up manifest (its
    // predecessor's dir was vacuumed)
    val d = graft.core.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    assert(StreamingOps.st19CommitIfAbsent(spark, root, 3L,
      graft.operators.Sinks.p13Changes2(d)),
      "a fresh commit above the HWM must run")
    val v2 = graft.operators.Sinks.p13Read(spark, root, 2L, "manifest_rolled")
    val v3 = graft.operators.Sinks.p13Read(spark, root, 3L, "manifest_b3")
    assert(v3.count() == v2.count(),
      "the post-vacuum commit must produce a coherent snapshot")
    assert(v3.filter(col("ver") === 3L).count() > 0,
      "the post-vacuum commit must version its changed rows")
  }

  test("st07 streaming delta-vs-index dedup: planted near-dup flagged, fresh content not, matches batch") {
    import spark.implicits._
    import graft.operators.Dedup
    // the d13 OperatorSpec fixture: 120-word docs, near-dup differs in
    // 3 positions (Jaccard ≈ 0.86 > 0.6)
    def words(base: Int): Seq[String] = (0 until 120).map(i => s"w${base + i}")
    def mutate(ws: Seq[String], tag: String): Seq[String] =
      ws.zipWithIndex.map { case (w, i) =>
        if (i == 10 || i == 50 || i == 90) s"x$tag$i" else w }
    val corpus = Seq(
      1L -> words(0).mkString(" "), 2L -> words(1000).mkString(" "))
      .toDF("doc_id", "text")
    val delta = Seq(
      100L -> mutate(words(0), "a").mkString(" "), // near-dup of doc 1
      101L -> words(2000).mkString(" ")            // fresh content
    ).toDF("doc_id", "text")
    val (bandT, shT) = Dedup.d13BuildIndex(spark, corpus)
    val deltaRoot = graft.core.IO.scratchDir("graft-st07-test")
    delta.write.mode("overwrite").parquet(deltaRoot)
    val deltaStream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING"))
      .parquet(deltaRoot)
    val streamed = StreamingOps.runToFiles(spark,
      Dedup.d13DeltaVsIndexStream(spark, deltaStream, bandT, shT), "graft-st07-t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed.map(p => (p._1, p._2)) == Seq((100L, 1L)),
      s"stream must flag exactly the planted near-dup: $streamed")
    val batch = Dedup.d13DeltaVsIndex(spark, delta, bandT, shT)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed.sorted == batch.sorted,
      s"stream/batch divergence: $streamed vs $batch")
  }

  test("st08 drops exactly the late rows below the watermark, boundary window included") {
    import spark.implicits._
    // evens (batch 1): max ts 12:00 → watermark 11:50. odds (batch 3):
    //  id 1 @ 10:01 → window end 10:05 ≤ wm → dropped
    //  id 3 @ 11:48 → window end 11:50 == wm EXACTLY → dropped (the
    //                 boundary pin: end must be STRICTLY above the wm)
    //  id 5 @ 11:52 → window end 11:55 > wm → kept
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val fixture = java.nio.file.Files.createTempDirectory("st08fix").toString
    Seq((0L, ts("2024-03-01 10:00:00")), (2L, ts("2024-03-01 12:00:00")),
        (1L, ts("2024-03-01 10:01:00")), (3L, ts("2024-03-01 11:48:00")),
        (5L, ts("2024-03-01 11:52:00")))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$fixture/events.parquet")
    val row = StreamingOps.st08StreamingLateData(spark, fixture).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getBoolean(3)) ==
      ((3L, 3L, 2L, true)), s"unexpected st08 row: $row")
  }

  test("st13 outer join emits null rows only via eviction, hand-built fixture exact") {
    import spark.implicits._
    // p1 has a signup 30 min before (matched); p2's only same-user
    // signup is 2 h before — outside the 1-hour range (unmatched, must
    // null-emit at eviction); p3's user never signs up (unmatched)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val fixture = java.nio.file.Files.createTempDirectory("st13fix").toString
    Seq(
      (10L, ts("2024-03-01 09:30:00"), 1L, "signup", 0.0, "{}"),
      (11L, ts("2024-03-01 10:00:00"), 1L, "purchase", 1.0, "{}"),
      (20L, ts("2024-03-01 08:00:00"), 2L, "signup", 0.0, "{}"),
      (21L, ts("2024-03-01 10:00:00"), 2L, "purchase", 1.0, "{}"),
      (31L, ts("2024-03-01 10:00:00"), 3L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$fixture/events.parquet")
    val row = StreamingOps.st13StreamingOuterJoin(spark, fixture).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getBoolean(3)) ==
      ((3L, 1L, 2L, true)), s"unexpected st13 row: $row")
  }

  test("st14 bounded-state dedup: within-delay dup dropped, post-eviction re-emission") {
    val got = StreamingOps.st14EmittedRows(spark).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString)).toSet
    // A's FIRST occurrence and its post-eviction re-occurrence emit;
    // the 10:01 within-delay duplicate must NOT (its ts never appears)
    assert(got == Set(
      ("A", "2024-03-01 10:00:00.0"),
      ("A", "2024-03-01 12:00:00.0"),
      ("B", "2024-03-01 10:30:00.0")),
      s"bounded-state dedup emitted the wrong occurrences: $got")
  }

  test("st09 restart restores the watermark: post-restart drops equal the unbroken run") {
    import spark.implicits._
    // the st08 fixture verbatim — but the odds arrive AFTER a
    // stop/restart cycle, with no barrier batch: the restored
    // checkpoint watermark must drop ids 1 and 3 (boundary included)
    // and keep id 5, exactly like the unbroken st08 run
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val fixture = java.nio.file.Files.createTempDirectory("st09fix").toString
    Seq((0L, ts("2024-03-01 10:00:00")), (2L, ts("2024-03-01 12:00:00")),
        (1L, ts("2024-03-01 10:01:00")), (3L, ts("2024-03-01 11:48:00")),
        (5L, ts("2024-03-01 11:52:00")))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$fixture/events.parquet")
    val row = StreamingOps.st09StreamingRestart(spark, fixture).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getBoolean(3)) ==
      ((3L, 3L, 2L, true)), s"unexpected st09 row: $row")
  }

  test("st06 gate: timeout sessionizer reproduces st01's sessions on the real feed") {
    // the gate form (sentinel-closed EventTimeTimeout run over the
    // events file) must agree with the declarative session_window
    // surface on (user, bounds, count); totals are gated in exact cents
    // by the DuckDB oracle, not compared against st01's rounded dollars
    val st06 = StreamingOps.st06StreamingSessionize(spark, sf).collect()
    assert(st06.nonEmpty && !st06.exists(_.getLong(0) < 0),
      "sentinel user must never reach the gate output")
    val k06 = st06.map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val k01 = StreamingOps.st01SessionWindow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(k06 == k01,
      s"st06 vs st01 session sets differ: ${(k06 diff k01).take(3)} / ${(k01 diff k06).take(3)}")
  }

  test("session_window SQL surface agrees with the stateful sessionizer") {
    import spark.implicits._
    val sql = StreamingOps.st01SessionWindow(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSet
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
      .as[StreamingOps.Ev]
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS").withZone(java.time.ZoneOffset.UTC)
    def f(t: java.sql.Timestamp) = fmt.format(t.toInstant)
    // the stateful form reports the same [min ts, max ts] per session
    // (full microsecond precision via Instant)
    val stateful = StreamingOps.sessionize(ev).collect()
      .map(s => (s.user_id, f(s.start), f(s.end),
        s.n_events.toLong,
        BigDecimal(s.total_value).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSet
    assert(sql == stateful,
      s"only-in-sql=${(sql -- stateful).take(3)} only-in-stateful=${(stateful -- sql).take(3)}")
  }

  test("sessionization: gap-consistent per-user sessions covering all events") {
    import spark.implicits._
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
      .as[StreamingOps.Ev]
    val sessions = StreamingOps.sessionize(ev).collect()
    val nEvents = ev.count()

    assert(sessions.map(_.n_events.toLong).sum == nEvents,
      "every event lands in exactly one session")
    sessions.foreach { s =>
      assert(!s.start.after(s.end), s"session start after end: $s")
    }
    // per user: sessions don't overlap and are separated by >= 30 min
    // (the session_window boundary rule: diff >= gap starts a session)
    sessions.groupBy(_.user_id).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.start.getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.start.getTime - a.end.getTime >= 30L * 60 * 1000,
            s"sessions closer than the gap: $a | $b")
        case _ => ()
      }
    }
  }
}
