package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface over the events table. The reference is
  * pure batch (SURVEY §2.2: streaming absent) — this is north-star
  * coverage, built the idiomatic way: readStream → event-time window
  * aggregation with a watermark, plus arbitrary stateful processing
  * (session windows via mapGroupsWithState).
  *
  * Scale notes: the windowed aggregation is a streaming two-phase hash
  * agg keyed on (window, event_type) — state size is bounded by the
  * watermark horizon, not the stream length; sessionization state is
  * per-user and evicted on timeout, so a 1000-executor cluster shards
  * it by user_id.
  */
object StreamingOps {

  /** Events schema as the streaming source sees it, parameterized on
    * the on-disk `ts` layout (raw nanos long vs TIMESTAMP_NTZ — see
    * graft.core.Tables for the two driver generations). */
  private def eventsSchema(tsDdl: String): StructType = StructType.fromDDL(
    s"event_id BIGINT, ts $tsDdl, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING")

  /** Streaming source over the events parquet with a proper timestamp.
    * The file-stream source requires a DIRECTORY; the testdata ships one
    * file per table, so glob-filter the sf dir down to events.parquet
    * (a production events feed would be a directory of files anyway).
    * A one-file batch probe picks the on-disk `ts` layout; the contract
    * out of this reader matches core.Tables.events: TimestampType at
    * microsecond precision. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // explicit 3-way layout match, mirroring core.Tables.events: a
    // third driver-generation layout must fail HERE with the observed
    // type, not stream mis-declared schema downstream (round-10 drift
    // lesson, ADVICE round 10)
    val tsDdl = spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType match {
      case LongType         => "BIGINT"
      case TimestampNTZType => "TIMESTAMP_NTZ"
      case TimestampType    => "TIMESTAMP"
      case other => throw new IllegalStateException(
        s"events.parquet ts has unsupported type $other — " +
          "known layouts: INT64 nanos, TIMESTAMP(MICROS) NTZ, " +
          "TimestampType. Update StreamingOps.readEvents " +
          "(and core.Tables.events) for the new driver layout.")
    }
    val src = spark.readStream
      .schema(eventsSchema(tsDdl))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    if (tsDdl == "BIGINT")
      // integer `div`, same rationale as core.Tables.events
      src.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else
      src.withColumn("ts",
        col("ts").cast(org.apache.spark.sql.types.TimestampType))
  }

  /** 5-minute tumbling window counts per event type with a 10-minute
    * watermark (late data beyond it is dropped, state is evicted). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact dedup — the streaming face of Dedup.d01: state
    * keyed on event_id, bounded by the watermark horizon (late
    * duplicates beyond 10 minutes age out of state instead of
    * accumulating forever — the property that makes streaming dedup
    * viable on an unbounded 100 TB/day feed). */
  def dedupped(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id", "ts")

  /** Stream-stream inner join: each purchase joined to signup events of
    * the same user within the preceding hour. Both sides carry
    * watermarks and the join has an event-time range constraint, so
    * state on both sides is evicted as the watermark advances — the
    * property that bounds memory on unbounded feeds (without the range
    * constraint Spark would rightly keep all history).
    */
  def purchaseSignupJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val signups = events.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"))
      .withWatermark("s_ts", "10 minutes")
    purchases.join(signups,
      col("user_id") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("signup_id"), col("user_id"))
  }

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class Session(user_id: Long, n_events: Int, start: java.sql.Timestamp,
      end: java.sql.Timestamp, total_value: Double)
  // public: the streaming state serializer's GENERATED code (another
  // package) must call the accessors/constructor — a private class
  // compiles to restricted bytecode and Janino fails at runtime (the
  // batch path never serializes state, so only streaming trips it).
  // Times are MICROSECONDS since epoch: Timestamp.getTime truncates to
  // millis and the events feed carries real microsecond components —
  // milli state would silently report truncated session bounds (and
  // disagree with the SQL-surface session_window form, which keeps
  // full precision).
  case class SessionState(n: Int, startUs: Long, endUs: Long, total: Double)

  private val GapUs = 30L * 60 * 1000 * 1000

  private def micros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }
  private def tsOfMicros(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  /** Session windows per user (30-minute inactivity gap) via
    * flatMapGroupsWithState — emits a session when a new event arrives
    * past the gap, carries the open one in state. On a bounded source
    * the final open session is emitted too (and state cleared), so the
    * output is the complete sessionization of the batch.
    *
    * BOUNDED-FEED ONLY: NoTimeout + the end-of-group flush means state
    * for a user is only revisited when that user sends another event —
    * on an unbounded feed a user who goes quiet would pin their open
    * session in state forever, and each invocation buffers the user's
    * full event group in memory for the sort. Deploy
    * [[sessionizeStreaming]] on continuous sources: same gap
    * semantics, but sessions close by EVENT-TIME TIMEOUT against the
    * watermark, so state is bounded by concurrently-active users. */
  def sessionize(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          // per-group arrival order is not guaranteed: sort by ts
          val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.value))
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var st = state.getOption.getOrElse(SessionState(0, -1L, -1L, 0.0))
          def close(): Unit = if (st.n > 0)
            out += Session(uid, st.n, tsOfMicros(st.startUs),
              tsOfMicros(st.endUs), st.total)
          for (e <- sorted) {
            val t = micros(e.ts)
            // >= gap starts a new session — the same boundary rule as
            // session_window's merge condition, so the declarative and
            // stateful forms agree exactly
            st = if (st.n == 0 || t - st.endUs >= GapUs) {
              close()
              SessionState(1, t, t, e.value)
            } else SessionState(st.n + 1, st.startUs, t, st.total + e.value)
          }
          close() // bounded-source semantics: flush the open session
          state.remove()
          out.iterator
      }
  }

  /** The unbounded-feed sessionizer: same 30-minute-gap semantics as
    * [[sessionize]], hardened for continuous sources. A user's open
    * session lives in state with an event-time timeout at
    * session_end + gap: when the WATERMARK passes that point no
    * further event can extend the session (anything older is dropped
    * by the watermark), so the state fires once, emits the session,
    * and is evicted. State size is therefore bounded by the number of
    * users active inside one watermark horizon — not by stream length
    * — which is what makes per-user sessionization deployable on a
    * 100 TB/day feed (keyed state shards by user_id across executors).
    *
    * Sessions close on TIMEOUT (watermark movement), not on batch end:
    * a bounded test must advance the watermark past end + gap to see
    * the final sessions (StreamingSpec does exactly that).
    */
  def sessionizeStreaming(
      events: Dataset[Ev], watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          def toSession(st: SessionState) =
            Session(uid, st.n, tsOfMicros(st.startUs),
              tsOfMicros(st.endUs), st.total)
          if (state.hasTimedOut) {
            // watermark passed end+gap: the session can no longer grow
            val done = toSession(state.get)
            state.remove()
            Iterator.single(done)
          } else {
            // batch arrival order within the group is not guaranteed
            val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.value))
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            var st = state.getOption.getOrElse(SessionState(0, -1L, -1L, 0.0))
            for (e <- sorted) {
              val t = micros(e.ts)
              st = if (st.n == 0 || t - st.endUs >= GapUs) {
                if (st.n > 0) out += toSession(st) // gap crossed in-batch
                SessionState(1, t, t, e.value)
              } else
                // MERGE, don't append: a watermark-admitted late event
                // can precede the stored session bounds (it arrives in a
                // LATER batch than in-session events already processed),
                // so the bounds widen by min/max — assigning end := t
                // unconditionally would REGRESS the session end and both
                // misclassify the next gap and fire the timeout early
                SessionState(st.n + 1, Math.min(st.startUs, t),
                  Math.max(st.endUs, t), st.total + e.value)
            }
            state.update(st)
            // fire when no event can extend the session any more
            // (timeout API is millis; round UP so we never fire early)
            state.setTimeoutTimestamp(Math.ceil((st.endUs + GapUs) / 1000.0).toLong)
            out.iterator
          }
      }
  }

  /** Streaming sink into hive-partitioned ZSTD parquet via foreachBatch
    * — the streaming face of Sinks.p01: each micro-batch lands as
    * partition-pruned files, and downstream batch readers see a normal
    * partitioned table. Returns the running query (caller stops it). */
  def sinkPartitioned(events: DataFrame, outDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("append").partitionBy("event_type")
          .option("compression", "zstd").parquet(outDir)
      }
      .start()

  /** st01: sessionization at the SQL surface — `session_window` (gap
    * semantics: a new session starts when the inter-event gap is ≥ 30
    * minutes; Spark merges overlapping [t, t+gap) windows). The same
    * expression works verbatim over `readStream` with a watermark —
    * this is the declarative face of [[sessionizeStreaming]], and the
    * one to prefer when the per-session output is plain aggregates
    * (Catalyst plans it as a streaming-capable session agg; custom
    * state logic is the only reason to drop to
    * flatMapGroupsWithState). Output reports [min(ts), max(ts)] per
    * session so the DuckDB oracle (lag + running-sum sessionization)
    * compares exactly. */
  def st01SessionWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.core.Tables.events(spark, dir)
    ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")
  }

  /** st02: the streaming RUNTIME itself under the driver gate. st01
    * gates the batch face of sessionization; every other streaming op
    * is batch-equivalence-tested in ScalaTest only — this query runs
    * [[windowedCounts]] as an ACTUAL streaming query (readStream →
    * watermark → windowed agg → snapshot file sink, processed to
    * completion on the bounded events source) inside the query
    * function, then compares it structurally against the identical
    * batch aggregate and emits one engine-independent invariant row
    * (n_windows, n_events, stream_matches_batch).
    *
    * The comparison is on (window start, event_type, count) — counts
    * are exact under any execution order, while a summed double could
    * diverge in the last ulp between the streaming and batch partial-
    * aggregation orders and flip a rounded cent (the q20 lesson).
    * The streamed result lands through [[runToSnapshotFiles]] (Complete
    * mode can't use the append-only file sink, so foreachBatch
    * overwrites a parquet snapshot per micro-batch) — like st03/st04,
    * nothing in the equivalence path is ever held on the driver: the
    * exceptAll over the landed files is a shuffled anti-join. */
  def st02StreamingCounts(spark: SparkSession, dir: String): DataFrame = {
    val streamed = runToSnapshotFiles(spark,
      windowedCounts(readEvents(spark, dir)), "graft-st02", evBytes(dir))
      .select(col("win_start"), col("event_type"), col("n"))
    val batch = graft.core.Tables.events(spark, dir)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"))
    val mismatches = streamed.exceptAll(batch).unionAll(batch.exceptAll(streamed))
    batch.agg(count(lit(1)).as("n_windows"), sum(col("n")).as("n_events"))
      .crossJoin(mismatches.agg((count(lit(1)) === 0).as("stream_matches_batch")))
  }

  /** st03: streaming DEDUP under the driver gate. The events feed has
    * unique ids, so the source is unioned with itself — every event
    * arrives (at least) twice and [[dedupped]]'s keyed state must
    * collapse the copies; the result is compared against batch
    * DISTINCT. Append mode (dropDuplicates is not an aggregation, so
    * Complete is illegal); on the bounded source nothing is
    * watermark-dropped — all rows arrive before the watermark first
    * advances. */
  def st03StreamingDedup(spark: SparkSession, dir: String): DataFrame = {
    val doubled = readEvents(spark, dir).unionAll(readEvents(spark, dir))
    val streamed = runToFiles(spark,
      dedupped(doubled).select(col("event_id")), "graft-st03", 2 * evBytes(dir))
    val batch = graft.core.Tables.events(spark, dir).select(col("event_id")).distinct()
    val mismatches = streamed.exceptAll(batch).unionAll(batch.exceptAll(streamed))
    batch.agg(count(lit(1)).as("n_distinct"))
      .crossJoin(mismatches.agg((count(lit(1)) === 0).as("stream_matches_batch")))
  }

  /** st04: the stream-stream JOIN under the driver gate —
    * [[purchaseSignupJoin]] (watermarked both sides + event-time range
    * constraint) run to completion on the bounded source, compared
    * against the identical batch join. */
  def st04StreamingJoin(spark: SparkSession, dir: String): DataFrame = {
    val streamed = runToFiles(spark,
      purchaseSignupJoin(readEvents(spark, dir)), "graft-st04", evBytes(dir))
    val ev = graft.core.Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val s = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"))
    val batch = p.join(s,
        col("user_id") === col("s_user") &&
          col("s_ts") <= col("p_ts") &&
          col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("signup_id"), col("user_id"))
    val mismatches = streamed.exceptAll(batch).unionAll(batch.exceptAll(streamed))
    batch.agg(count(lit(1)).as("n_pairs"))
      .crossJoin(mismatches.agg((count(lit(1)) === 0).as("stream_matches_batch")))
  }

  /** st05: the foreachBatch PARTITIONED SINK under the driver gate —
    * [[sinkPartitioned]] streams the events feed into hive-partitioned
    * ZSTD parquet (fresh scratch dir per call; each micro-batch appends
    * its partition files), then the gate reads the landed table back
    * through a partition-pruned scan and emits the same per-hour
    * purchase census as the batch sink p01 — so the oracle is
    * literally p01's SQL: what the streaming sink lands must be
    * indistinguishable from what the batch sink writes. */
  def st05StreamingSink(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.core.IO.scratchDir("graft-st05") + "/events"
    val q = sinkPartitioned(readEvents(spark, dir), out)
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(out)
      .filter(col("event_type") === "purchase") // → partition pruning
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy("hour")
  }

  /** st06: the UNBOUNDED-FEED sessionizer under the driver gate —
    * [[sessionizeStreaming]] (EventTimeTimeout state machine: timeout
    * eviction, late-event bound-widening) run as an actual streaming
    * query over the events feed, landed through [[runToFiles]], and
    * oracled against the same lag-based SQL sessionization as st01.
    * st01 gates the declarative face (session_window); this gates the
    * production state machine itself — previously the only streaming
    * op with ScalaTest-only coverage.
    *
    * Two gate-shaped choices:
    *  - Sessions close by TIMEOUT, so a bounded run would hold the tail
    *    sessions (end + gap inside the final watermark horizon) in
    *    state forever. One far-future sentinel event (user_id -1, a key
    *    that cannot occur in the data) is unioned in from a scratch
    *    file source: it pushes the final watermark past every real
    *    session's end + gap, every real session times out and emits,
    *    and only the sentinel's own session stays open (filtered out).
    *    This is the bounded-gate equivalent of the feed going quiet.
    *  - Event values are scaled to integer CENTS before the stateful
    *    fold: the state total then only ever adds integer-valued
    *    doubles (exact in IEEE up to 2^53), so the session total is
    *    independent of fold order and the gate compares exact integers
    *    — the q20/st02 double-summation-order lesson applied to
    *    arbitrary stateful aggregation.
    *
    * All files (events + sentinel) arrive in the first micro-batch, so
    * nothing is watermark-dropped (the watermark only advances AFTER
    * that batch); the timeout-firing no-data batch runs before
    * processAllAvailable returns. */
  def st06StreamingSessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val maxTs = graft.core.Tables.events(spark, dir)
      .agg(max(col("ts"))).head().getTimestamp(0) // scalar routing read
    val tailRoot = graft.core.IO.scratchDir("graft-st06-tail")
    Seq((-1L, new java.sql.Timestamp(maxTs.getTime + 48L * 3600 * 1000), 0.0))
      .toDF("user_id", "ts", "value")
      .write.mode("overwrite").parquet(tailRoot)
    val real = readEvents(spark, dir)
      .select(col("user_id"), col("ts"), round(col("value") * 100).as("value"))
    val sentinel = spark.readStream
      .schema(StructType.fromDDL("user_id BIGINT, ts TIMESTAMP, value DOUBLE"))
      .parquet(tailRoot)
    val sessions = sessionizeStreaming(real.unionAll(sentinel).as[Ev])
    runToFiles(spark, sessions.toDF(), "graft-st06", evBytes(dir))
      .filter(col("user_id") >= 0)
      .select(col("user_id"),
        date_format(col("start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(col("end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        col("n_events").cast("long").as("n_events"),
        col("total_value").cast("long").as("value_cents"))
      .orderBy("user_id", "session_start")
  }

  /** st07: the INCREMENTAL-DEDUP INGEST CYCLE under the streaming
    * runtime — the continuous face of d13. The batch gate proves
    * delta-vs-index dedup works when someone RUNS it; a production
    * 100 TB pipeline wants it to happen AS data lands: documents
    * arrive as files, each micro-batch is shingled/banded and joined
    * STREAM-STATIC against the persisted bucketed MinHash index
    * ([[graft.operators.Dedup.d13DeltaVsIndexStream]]), verified by
    * exact Jaccard against the static shingle store, and flagged
    * duplicates land in an append file sink. Only the delta ever
    * enters the streaming state; the corpus index is the static side
    * of both joins and is never re-shuffled per batch.
    *
    * Gate shape: the same (corpus, delta + canary) split as d13
    * ([[graft.operators.Dedup.d13GateSplit]]), the delta landed to a
    * scratch dir and streamed back (the file-ingest shape), and the
    * invariant row compares the streamed pair multiset against the
    * batch [[graft.operators.Dedup.d13DeltaVsIndex]] over the SAME
    * index tables — st03's equivalence pattern applied to the ingest
    * cycle. The canary guarantees n_pairs ≥ 1 at every SF, so the
    * equivalence is never vacuous. */
  def st07StreamingDeltaDedup(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    val (corpus, delta) = Dedup.d13GateSplit(spark, dir)
    val (bandT, shT) = Dedup.d13BuildIndex(spark, corpus)
    val deltaRoot = graft.core.IO.scratchDir("graft-st07-delta")
    delta.write.mode("overwrite").parquet(deltaRoot)
    val deltaStream = spark.readStream
      .schema(StructType.fromDDL("doc_id BIGINT, text STRING"))
      .parquet(deltaRoot)
    val streamed = runToFiles(spark,
      Dedup.d13DeltaVsIndexStream(spark, deltaStream, bandT, shT), "graft-st07")
    val batch = Dedup.d13DeltaVsIndex(spark, delta, bandT, shT)
    val mismatches = streamed.exceptAll(batch).unionAll(batch.exceptAll(streamed))
    batch.agg(count(lit(1)).as("n_pairs"))
      .crossJoin(mismatches.agg((count(lit(1)) === 0).as("stream_matches_batch")))
  }

  /** st10: STREAMING VECTOR INGEST into the persisted IVF-PQ index —
    * the continuous face of s12, completing the ingest-cycle symmetry:
    * text deltas stream against the d13 index (st07), and now
    * embedding deltas stream INTO the s11 index as they land. The
    * index builds over the base slice ([[graft.operators.Similarity
    * .s12BuildBase]]); the delta lands as THREE files and streams back
    * under `maxFilesPerTrigger=1`, so the fold runs as three separate
    * micro-batch appends — each micro-batch flows through the FROZEN
    * stored model inside foreachBatch ([[graft.operators.Similarity
    * .s12FoldIn]]: assignment joins against broadcast stored
    * centroids/codebooks, bucket-compatible append, the existing code
    * store never read). The gate then searches the stream-folded store
    * through the unchanged serve path and the ORACLE IS s12's
    * verbatim: a full-corpus index whose model trained on the base —
    * i.e. continuous ingest must be semantically invisible, batch-
    * split invariance included (three appends must compose to exactly
    * one fold; a row lost, duplicated, or encoded against a drifted
    * model in any micro-batch breaks the row-for-row hash).
    *
    * 100 TB: per-micro-batch cost is O(batch) assignment work + a
    * batch-sized bucketed append — the streaming state is EMPTY (no
    * watermark, no keyed state; foreachBatch is a stateless sink), so
    * ingest rate is bounded by the assignment joins, not by state
    * growth. */
  def st10StreamingVectorIngest(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val (codesT, ccT, fcT, cbT, nBase, k2) = Similarity.s12BuildBase(spark, dir)
    val deltaRoot = graft.core.IO.scratchDir("graft-st10-delta")
    graft.core.Tables(spark, dir, "embeddings")
      .filter(col("vec_id") >= nBase)
      .repartition(3) // three landed files → three micro-batch folds
      .write.mode("overwrite").parquet(deltaRoot)
    val deltaStream = spark.readStream
      .schema(StructType.fromDDL("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"))
      .option("maxFilesPerTrigger", 1)
      .parquet(deltaRoot)
    val chk = graft.core.IO.scratchDir("graft-st10-chk")
    val q = deltaStream.writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        Similarity.s12FoldIn(spark,
          batch.select(col("vec_id"),
            col("embedding").cast("array<double>").as("e")),
          codesT, ccT, fcT, cbT, k2)
      }
      .start()
    q.processAllAvailable()
    q.stop()
    Similarity.s11Search(spark, dir, codesT, ccT, fcT, cbT, k2)
  }

  /** st11: STREAMING MEDIA INGEST-DEDUP — the third and last leg of
    * the continuous-ingest symmetry (text st07, vectors st10, media
    * here): media payloads arrive as streamed files and dedup
    * stream-static against the persisted m08 banded-dHash + content
    * index, the decode seam running per micro-batch over delta
    * payloads only — the corpus is decoded exactly once at index
    * build and never re-decoded or re-shuffled per batch. Gate shape
    * is st07's verbatim: the same (corpus + canary, delta + canary
    * twin) split as the m08 batch gate, the delta landed and streamed
    * back, and the invariant row proving the streamed pair multiset
    * equals batch [[graft.operators.Multimodal.m08DeltaVsIndex]] over
    * the SAME index tables — the constructed Hamming-1 BMP pair keeps
    * n_pairs ≥ 1 at every SF. */
  def st11StreamingMediaIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.{Multimodal, Sinks}
    val base = Multimodal.media(spark, dir).select(col("media_id"), col("payload"))
    val corpus = base.filter(Sinks.splitBucket(col("media_id")) < 990)
      .unionAll(Seq((-1L, Multimodal.canaryBmp(false))).toDF("media_id", "payload"))
    val delta = base.filter(Sinks.splitBucket(col("media_id")) >= 990)
      .unionAll(Seq((-2L, Multimodal.canaryBmp(true))).toDF("media_id", "payload"))
    val (bandT, contT) = Multimodal.m08BuildIndex(spark, corpus)
    val deltaRoot = graft.core.IO.scratchDir("graft-st11-delta")
    delta.write.mode("overwrite").parquet(deltaRoot)
    val deltaStream = spark.readStream
      .schema(StructType.fromDDL("media_id BIGINT, payload BINARY"))
      .parquet(deltaRoot)
    val streamed = runToFiles(spark,
      Multimodal.m08DeltaVsIndexStream(spark, deltaStream, bandT, contT),
      "graft-st11")
    val batch = Multimodal.m08DeltaVsIndex(spark, delta, bandT, contT)
    val mismatches = streamed.exceptAll(batch).unionAll(batch.exceptAll(streamed))
    batch.agg(count(lit(1)).as("n_pairs"))
      .crossJoin(mismatches.agg((count(lit(1)) === 0).as("stream_matches_batch")))
  }

  /** st12: STREAMING CDC MERGE — the continuous face of p12, closing
    * the ingest symmetry on the TABLE side (text st07, vectors st10,
    * media st11, and now the keyed snapshot itself): change rows
    * arrive as streamed files and each micro-batch applies the SAME
    * copy-on-write merge ([[graft.operators.Sinks.p12ApplyChanges]])
    * against the landed snapshot inside foreachBatch — per batch, only
    * the buckets that batch touches are rewritten. The CDC batch lands
    * as three files and streams back under `maxFilesPerTrigger=1`, so
    * the merge runs as three separate sequential upserts; because a
    * key appears in at most one change op, batch boundaries commute
    * and the final snapshot equals the one-shot p12 merge — which is
    * exactly what the oracle states (p12's merge-semantics SQL,
    * shared verbatim). At deploy the staged-commit rename p12 relies
    * on becomes a table-format transaction (the Delta/Iceberg MERGE
    * loop); the Spark-side plumbing — keyed full-outer join per
    * batch, bucket-pruned base scan, dynamic overwrite — is
    * identical. */
  def st12StreamingCdcMerge(spark: SparkSession, dir: String): DataFrame =
    st12Core(spark, dir)._1

  /** Seam returning (final snapshot, n non-empty micro-batches) — the
    * StreamingSpec pins batches = 3 and equality with batch p12. */
  private[graft] def st12Core(spark: SparkSession,
      dir: String): (DataFrame, Int) = {
    import graft.operators.Sinks
    val d = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val snap = graft.core.IO.scratchDir("graft-st12") + "/snap"
    Sinks.p12LandBase(d, snap)
    val chRoot = graft.core.IO.scratchDir("graft-st12-ch")
    Sinks.p12Changes(d).repartition(3) // three landed files → 3 merges
      .write.mode("overwrite").parquet(chRoot)
    val chStream = spark.readStream
      .schema(StructType.fromDDL(
        "doc_id BIGINT, op STRING, text STRING, pk BIGINT"))
      .option("maxFilesPerTrigger", 1)
      .parquet(chRoot)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val chk = graft.core.IO.scratchDir("graft-st12-chk")
    val q = chStream.writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          nBatches.incrementAndGet()
          Sinks.p12ApplyChanges(spark, snap, batch.toDF())
        }
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(snap)
      .select(col("doc_id"), col("pk").cast("long").as("pk"), col("ver"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy("doc_id")
    (out, nBatches.get())
  }

  /** st08: WATERMARK LATE-DATA ACCOUNTING under the driver gate — the
    * one streaming-semantics face st01-st07 don't exercise: what the
    * engine DROPS. Every earlier gate feeds its bounded source in one
    * micro-batch, so the watermark never advances past live data and
    * nothing is late; production ingest is exactly the opposite — data
    * arrives out of order and the watermark trades completeness for
    * bounded state. This gate constructs that regime deterministically:
    *
    *  - batch 1 = even event_ids (spanning the full time range, so the
    *    watermark jumps to max(ts)−10min after the first micro-batch);
    *  - batch 2 = a ZERO-ROW BARRIER file. Spark ≥3.4 runs two
    *    watermarks per batch: eviction uses the current value but
    *    LATE-EVENT FILTERING uses the previous batch's (so a restart
    *    never drops rows a first run kept). Without a barrier the odd
    *    rows would arrive while the late-filter watermark is still the
    *    initial −∞ and nothing would drop — the barrier burns one batch
    *    so the filter watermark catches up to max(even ts)−10min;
    *  - batch 3 = odd event_ids — every odd row whose 5-minute window
    *    closed at or below the batch-1 watermark is now LATE and is
    *    dropped by the aggregation's late-row filter
    *    (numRowsDroppedByWatermark in the query progress);
    *  - batch 4 = a far-future sentinel (the st06 pattern) that pushes
    *    the watermark past every real window so append mode finalizes
    *    them all (the sentinel's own window stays unfinalized and never
    *    lands).
    *
    *  Determinism requires ONE FILE PER MICRO-BATCH (a multi-file batch
    *  split arbitrarily would advance the watermark between its own
    *  fragments): each feed lands as a single renamed parquet file with
    *  an explicit modification time, and `maxFilesPerTrigger=1` makes
    *  the file source replay them oldest-first. A production feed gets
    *  the same guarantee from its ingest commit order, not file mtimes.
    *
    * The invariant row compares the landed streamed counts against the
    * batch REPLAY of the drop rule — window.end > watermark keeps the
    * row (Spark finalizes and drops windows whose end is ≤ the
    * watermark) — and publishes the census a pipeline operator watches:
    * how many windows landed, how many events survived, how many were
    * dropped late. The two scalar reads (max ts for the sentinel and
    * the watermark literal) are narrow routing aggregates (st06
    * precedent); everything else is distributed — the equivalence
    * compare is a shuffled anti-join over the landed files. */
  def st08StreamingLateData(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.core.Tables.events(spark, dir).select(col("event_id"), col("ts"))
    val early = ev.filter(pmod(col("event_id"), lit(2)) === 0)
    val late = ev.filter(pmod(col("event_id"), lit(2)) === 1)
    val root = graft.core.IO.scratchDir("graft-st08-feed")
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0) // scalar routing read
    val t0 = System.currentTimeMillis() - 600000L
    landSingleFile(early, root, "b1", t0)
    landSingleFile(early.limit(0), root, "b2", t0 + 60000L) // watermark barrier
    landSingleFile(late, root, "b3", t0 + 120000L)
    landSingleFile(Seq((-1L, new java.sql.Timestamp(maxTs.getTime + 48L * 3600 * 1000)))
      .toDF("event_id", "ts"), root, "b4", t0 + 180000L)
    val streamed = runToFiles(spark, lateFeedCounts(spark, root), "graft-st08",
      evBytes(dir))
    lateDropCensus(spark, early, late, streamed)
  }

  /** Land `df` as ONE parquet file named `root/name.parquet` with a
    * pinned modification time — the deterministic-feed unit of
    * st08/st09: one file per micro-batch, replayed oldest-mtime-first
    * by the file source under maxFilesPerTrigger=1. */
  private def landSingleFile(df: DataFrame, root: String, name: String,
      mtime: Long): Unit = {
    val stage = s"$root/_stage_$name"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    // batch ordering in st08/st09 depends ENTIRELY on these mtimes
    // landing in ascending order: a broken staging dir or a filesystem
    // that refuses the mtime must fail the gate loudly, never degrade
    // into an order-dependent feed (round-11 advice item 2)
    val staged = new java.io.File(stage).listFiles()
    require(staged != null, s"staging dir unreadable: $stage")
    val part = staged
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .headOption.getOrElse(sys.error(s"no part file staged under $stage"))
    val dst = new java.io.File(s"$root/$name.parquet")
    java.nio.file.Files.move(part.toPath, dst.toPath)
    require(dst.setLastModified(mtime), s"setLastModified failed on $dst")
  }

  /** The st08/st09 streaming plan: watermarked 5-minute windowed counts
    * over the single-file feed dir. */
  private def lateFeedCounts(spark: SparkSession, root: String): DataFrame =
    spark.readStream
      .schema(StructType.fromDDL("event_id BIGINT, ts TIMESTAMP"))
      .option("pathGlobFilter", "b*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(root)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("n"))

  /** Batch replay of the late-drop rule + the invariant census row
    * shared by st08/st09: the watermark after the even batch is
    * max(even ts) − 10 min; an odd row survives iff its window end is
    * strictly above it. The landed streamed counts must equal the
    * replay row-for-row. */
  private def lateDropCensus(spark: SparkSession, early: DataFrame,
      late: DataFrame, streamed: DataFrame): DataFrame = {
    val wmMicros = // scalar routing read: the watermark literal
      early.agg(max(col("ts"))).head().getTimestamp(0).getTime * 1000L -
        10L * 60 * 1000 * 1000
    val keptLate = late.filter(
      (floor(unix_timestamp(col("ts")) / 300) + 1) * 300 * 1000000L > wmMicros)
    val replay = early.unionAll(keptLate)
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("n"))
    val mismatches = streamed.exceptAll(replay).unionAll(replay.exceptAll(streamed))
    val lateCensus = late.agg(count(lit(1)).as("n_late_total"))
      .crossJoin(keptLate.agg(count(lit(1)).as("n_late_kept")))
      .select((col("n_late_total") - col("n_late_kept")).as("n_late_dropped"))
    replay.agg(count(lit(1)).as("n_windows"), sum(col("n")).as("n_events_kept"))
      .crossJoin(lateCensus)
      .crossJoin(mismatches.agg((count(lit(1)) === 0).as("stream_matches_replay")))
  }

  /** st09: CHECKPOINT RESTART RECOVERY — the remaining runtime face
    * after st08: a production streaming job is killed and restarted
    * from its checkpoint, and the result must be as if it never
    * stopped. The gate runs st08's feed in two SEPARATE query
    * incarnations sharing one checkpoint and one output sink:
    *
    *  - run 1 sees ONLY the even batch, processes it to completion and
    *    stops — the checkpoint now holds the offsets AND the advanced
    *    watermark (max even ts − 10 min);
    *  - the odd batch and the far-future sentinel land while the query
    *    is DOWN;
    *  - run 2 starts from the same checkpoint. Its first batch (the
    *    odds) must be late-filtered against the RESTORED watermark —
    *    note st08 needed a zero-row barrier batch for the lagged
    *    late-event watermark to catch up, st09 needs none: the restart
    *    boundary itself is the barrier (the restored value IS the
    *    "previous batch's" watermark).
    *
    * If restart lost the watermark (or replayed/duplicated offsets),
    * the streamed counts would keep the late rows (or double-count the
    * evens) and the invariant row flips false. Census + oracle are
    * exactly st08's — the drop rule does not change because the engine
    * restarted, which is precisely the property under test. */
  def st09StreamingRestart(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.core.Tables.events(spark, dir).select(col("event_id"), col("ts"))
    val early = ev.filter(pmod(col("event_id"), lit(2)) === 0)
    val late = ev.filter(pmod(col("event_id"), lit(2)) === 1)
    val feedRoot = graft.core.IO.scratchDir("graft-st09-feed")
    val outRoot = graft.core.IO.scratchDir("graft-st09-out")
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0) // scalar routing read
    val t0 = System.currentTimeMillis() - 600000L
    def startQuery() = lateFeedCounts(spark, feedRoot).writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$outRoot/chk")
      .format("parquet").option("path", s"$outRoot/out").start()
    landSingleFile(early, feedRoot, "b1", t0)
    // both incarnations run under the scale-adaptive state-shard count
    // (run 2 re-reads the pinned value from run 1's checkpoint anyway —
    // state partitioning is fixed at batch 0 for the query's lifetime)
    withStreamShards(spark, evBytes(dir)) {
      val run1 = startQuery()
      run1.processAllAvailable()
      run1.stop() // the "crash": checkpoint holds offsets + watermark
      landSingleFile(late, feedRoot, "b2", t0 + 60000L)
      landSingleFile(Seq((-1L, new java.sql.Timestamp(maxTs.getTime + 48L * 3600 * 1000)))
        .toDF("event_id", "ts"), feedRoot, "b3", t0 + 120000L)
      val run2 = startQuery()
      run2.processAllAvailable()
      run2.stop()
    }
    lateDropCensus(spark, early, late, spark.read.parquet(s"$outRoot/out"))
  }

  /** st13: stream-stream LEFT OUTER join — the streaming semantic
    * st04's inner join never exercises: an unmatched left row may only
    * emit its null-padded result once the WATERMARK proves no matching
    * right row can still arrive (Spark emits it at state eviction, not
    * at end-of-data). A one-batch bounded feed therefore never
    * produces outer results at all — the st08 feed discipline builds
    * the regime deterministically instead:
    *
    *  - b1 = all real events in one file (inner matches emit here;
    *    watermark still −∞ during the batch);
    *  - b2 = a far-future sentinel pair (user_id −1, both event
    *    types) that advances both sides' watermarks past every real
    *    timestamp;
    *  - b3 = a zero-row barrier: eviction runs with the watermark
    *    computed from PRIOR batches, so the sentinel's watermark only
    *    becomes effective one batch later — b3 is the batch in which
    *    every remaining unmatched purchase is evicted and emitted
    *    with a NULL signup (st08's two-watermark lesson, applied to
    *    join state).
    *
    * The gate compares the landed streamed multiset against the batch
    * LEFT JOIN replay (sentinels filtered by user_id ≥ 0) and
    * publishes the matched/unmatched census — n_unmatched > 0 is what
    * proves the null-emission path actually ran. Scale: state is
    * bounded by the 1-hour join range + 10-minute delay on both
    * sides; eviction is the mechanism that keeps a 100 TB/day join's
    * state finite. */
  def st13StreamingOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val root = graft.core.IO.scratchDir("graft-st13-feed")
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0) // scalar routing read
    val far = new java.sql.Timestamp(maxTs.getTime + 48L * 3600 * 1000)
    val t0 = System.currentTimeMillis() - 600000L
    landSingleFile(ev, root, "b1", t0)
    landSingleFile(Seq((-1L, far, -1L, "purchase"), (-2L, far, -1L, "signup"))
      .toDF("event_id", "ts", "user_id", "event_type"), root, "b2", t0 + 60000L)
    landSingleFile(ev.limit(0), root, "b3", t0 + 120000L) // eviction barrier
    val src = spark.readStream
      .schema(StructType.fromDDL(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"))
      .option("pathGlobFilter", "b*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(root)
    val sp = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val ss = src.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"))
      .withWatermark("s_ts", "10 minutes")
    val joined = sp.join(ss,
        col("user_id") === col("s_user") &&
          col("s_ts") <= col("p_ts") &&
          col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"), "left_outer")
      .select(col("purchase_id"), col("signup_id"), col("user_id"))
    val streamed = runToFiles(spark, joined, "graft-st13", evBytes(dir))
      .filter(col("user_id") >= 0)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
    val s = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"))
    val batch = p.join(s,
        col("user_id") === col("s_user") &&
          col("s_ts") <= col("p_ts") &&
          col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"), "left_outer")
      .select(col("purchase_id"), col("signup_id"), col("user_id"))
    val mismatches = streamed.exceptAll(batch).unionAll(batch.exceptAll(streamed))
    batch.agg(count(lit(1)).as("n_rows"),
        count(col("signup_id")).as("n_matched"),
        sum(when(col("signup_id").isNull, 1L).otherwise(0L)).as("n_unmatched"))
      .crossJoin(mismatches.agg((count(lit(1)) === 0).as("stream_matches_batch")))
  }

  /** st14: BOUNDED-STATE streaming dedup — `dropDuplicatesWithinWatermark`,
    * the production form of st03's unbounded `dropDuplicates`: per-key
    * state is EVICTED once the watermark passes the first occurrence's
    * event time + delay, so state size is bounded by the watermark
    * window instead of growing with every key ever seen (the only
    * dedup a forever-running 100 TB/day ingest can afford). The
    * tradeoff it buys that st03 never shows: a re-occurrence AFTER
    * eviction is emitted AGAIN. The constructed single-file feed
    * (st08 discipline) makes both faces deterministic:
    *
    *  - b1: key A at 10:00 and again at 10:01 (duplicate WITHIN the
    *    10-minute delay → dropped), key B at 10:30;
    *  - b2: a far-later advancer row (11:30) pushes the watermark to
    *    11:20 — past A@10:00+10min and B@10:30+10min, so both keys'
    *    state evicts;
    *  - b3: key A again at 12:00 (above the watermark, NOT late) —
    *    state is gone, so A emits a SECOND time.
    *
    * Gate output = per-key emitted counts (A→2 proves eviction +
    * re-admission, B→1 proves plain dedup; the advancer key is
    * excluded): hand-derivable from the construction, so the oracle
    * states the literals it provably is (m10's canary-literal shape).
    * StreamingSpec pins the same censuses. */
  /** The streamed half of st14: run the constructed feed through
    * `dropDuplicatesWithinWatermark` and return the landed emitted
    * rows (k, ts) with the advancer key filtered — spec-visible so
    * StreamingSpec can pin WHICH occurrences emitted, not just the
    * counts. */
  private[graft] def st14EmittedRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val root = graft.core.IO.scratchDir("graft-st14-feed")
    val b1 = Seq(
      ("A", ts("2024-03-01 10:00:00")),
      ("A", ts("2024-03-01 10:01:00")),
      ("B", ts("2024-03-01 10:30:00"))).toDF("k", "ts")
    val b2 = Seq(("W", ts("2024-03-01 11:30:00"))).toDF("k", "ts")
    val b3 = Seq(("A", ts("2024-03-01 12:00:00"))).toDF("k", "ts")
    val t0 = System.currentTimeMillis() - 600000L
    landSingleFile(b1, root, "b1", t0)
    landSingleFile(b2, root, "b2", t0 + 60000L)
    landSingleFile(b3, root, "b3", t0 + 120000L)
    val deduped = spark.readStream
      .schema(StructType.fromDDL("k STRING, ts TIMESTAMP"))
      .option("pathGlobFilter", "b*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(root)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
    runToFiles(spark, deduped, "graft-st14", graft.core.IO.pathSize(root))
      .filter(col("k") =!= "W")
  }

  def st14StreamingTtlDedup(spark: SparkSession, dir: String): DataFrame =
    st14EmittedRows(spark)
      .groupBy(col("k")).agg(count(lit(1)).as("n_emitted"))
      .orderBy("k")

  /** st15: STREAMING INCREMENTAL VIEW MAINTENANCE — p15's streaming
    * leg, completing the batch↔streaming symmetry on the AGGREGATE
    * side the way st12 did for the keyed snapshot (p12↔st12,
    * p15↔st15): the stored (event_type, day) view is built over the
    * base slice, then the SAME delta p15 folds in one shot arrives as
    * three streamed files and each micro-batch runs
    * [[graft.operators.Sinks.p15Refresh]] inside foreachBatch —
    * partial-aggregate the batch, read back only its touched days'
    * stored partials, merge, dynamic-overwrite. sum/count partials
    * are associative, so ANY batch split composes: a day split across
    * micro-batches is folded twice, the second fold reading the
    * first's partials — and the final stored view must equal the full
    * recompute, which is exactly what the shared p15 oracle states
    * (hash equality IS streamed-incremental == full). Per batch the
    * touched-day list is a bounded routing read (≤ 2 days here; ≤
    * days-per-batch in general). At deploy this is the Delta/Iceberg
    * continuous MERGE-into-aggregate loop; state lives in the table,
    * not the stream (no watermark, no keyed state — the st10
    * stateless-fold discipline on the aggregate side). */
  def st15StreamingViewMaintenance(spark: SparkSession, dir: String): DataFrame =
    st15Core(spark, dir)._1

  /** Seam returning (final view, n non-empty micro-batches) — the
    * StreamingSpec pins batches = 3 and equality with batch p15. */
  private[graft] def st15Core(spark: SparkSession,
      dir: String): (DataFrame, Int) = {
    import graft.operators.Sinks
    val wh = graft.core.IO.scratchDir("graft-st15") + "/view"
    val ev = Sinks.p15Events(spark, dir)
    val (_, lateDay, isDelta) = Sinks.p15Regime(ev)
    Sinks.p15Build(wh, ev.filter(!isDelta))
    val dRoot = graft.core.IO.scratchDir("graft-st15-delta")
    ev.filter(isDelta).repartition(3) // three landed files → 3 refreshes
      .write.mode("overwrite").parquet(dRoot)
    val dStream = spark.readStream
      .schema(StructType.fromDDL(
        "event_id BIGINT, event_type STRING, day BIGINT, cents BIGINT"))
      .option("maxFilesPerTrigger", 1)
      .parquet(dRoot)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val chk = graft.core.IO.scratchDir("graft-st15-chk")
    // foreachBatch is AT-LEAST-ONCE: a batch retried after its
    // overwrite landed but before the checkpoint committed would fold
    // the same delta into the stored partials twice. The standard
    // guard (Delta's txnVersion idea): a per-batchId marker recorded
    // beside the view AFTER the overwrite — replays of an already-
    // applied batchId skip the fold. `_applied` is underscore-hidden,
    // so the view's parquet reads never see it. Residual window
    // (documented, not closable without a transactional table format):
    // a crash BETWEEN the overwrite and its marker still replays —
    // Delta closes it by committing marker and data in one txn.
    val q = dStream.writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val marker = new org.apache.hadoop.fs.Path(s"$wh/_applied/b$batchId")
        val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!batch.isEmpty && !fs.exists(marker)) {
          nBatches.incrementAndGet()
          // bounded routing read: the batch's own touched-day list
          val touched = batch.select("day").distinct()
            .collect().map(_.getLong(0)).toSeq
          Sinks.p15Refresh(spark, wh, batch.toDF(), touched)
          fs.mkdirs(marker): Unit
        }
      }
      .start()
    q.processAllAvailable()
    q.stop()
    (Sinks.p15ViewRead(spark, wh, lateDay), nBatches.get())
  }

  /** st16: STREAMING SKETCH MAINTENANCE — t13's Count-Min sketch run
    * the way a production hot-token/trend monitor runs it, closing the
    * batch↔streaming symmetry on the MERGEABLE-SKETCH side (p12↔st12
    * keyed snapshots, p15↔st15 aggregate views, t13↔st16 sketches):
    * the corpus arrives as three streamed document files and each
    * micro-batch folds ITS OWN 4×1024 cell grid into the stored sketch
    * by cellwise sum inside foreachBatch — the merge CMS exists for
    * (Cormode & Muthukrishnan 2005 §4: sketches of disjoint streams
    * sum cell-for-cell into the sketch of the union). State is the
    * 32 KB grid itself, version-addressed per batch (read prev, write
    * next — never overwrite what a concurrent read may hold open), so
    * ingest cost per batch is one batch-sized tokenize + a 4096-row
    * merge, independent of everything already absorbed. The st15
    * idempotency discipline applies: the batch's grid version is keyed
    * by batchId, so an at-least-once replay finds its version already
    * landed and skips the fold. The final heavy-hitter report probes
    * the STREAMED grid through t13's unchanged estimation half and
    * shares t13's oracle verbatim — hash equality proves the three
    * streamed folds compose to exactly the one-shot sketch
    * (StreamingSpec additionally pins the grids equal cell-for-cell
    * and batches = 3). */
  def st16StreamingCms(spark: SparkSession, dir: String): DataFrame =
    st16Core(spark, dir)._1

  /** Seam returning (gate output, non-empty batches, streamed grid) —
    * StreamingSpec pins batches = 3 and grid == the one-shot t13
    * grid. */
  private[graft] def st16Core(spark: SparkSession,
      dir: String): (DataFrame, Int, DataFrame) = {
    import graft.operators.TextOps
    val wh = graft.core.IO.scratchDir("graft-st16")
    val d = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val dRoot = graft.core.IO.scratchDir("graft-st16-delta")
    d.repartition(3).write.mode("overwrite").parquet(dRoot)
    val dStream = spark.readStream
      .schema(StructType.fromDDL("doc_id BIGINT, text STRING"))
      .option("maxFilesPerTrigger", 1)
      .parquet(dRoot)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val latest = new java.util.concurrent.atomic.AtomicLong(-1L)
    val chk = graft.core.IO.scratchDir("graft-st16-chk")
    val q = dStream.writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val vDir = new org.apache.hadoop.fs.Path(s"$wh/grid_b$batchId")
        val fs = vDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!batch.isEmpty) {
          // landed = the COMMITTED write's _SUCCESS, not bare dir
          // existence: a crashed partial write leaves a dir a replay
          // must redo (overwrite), never trust (round-15 advice)
          // batches ≤ the commit log's high-water mark are absorbed in
          // the compacted artifact — committed even with the dir
          // vacuumed (st20 discipline); above it, the dir's _SUCCESS
          // (written last) is the marker
          if (batchId > commitLogHwm(spark, wh) &&
              !fs.exists(new org.apache.hadoop.fs.Path(vDir, "_SUCCESS"))) {
            nBatches.incrementAndGet()
            val cells = TextOps.t13CellsOf(batch.toDF())
            val merged =
              if (latest.get() < 0) cells
              else cells
                .unionByName(spark.read.parquet(s"$wh/grid_b${latest.get()}"))
                .groupBy(col("r"), col("b")).agg(sum(col("c")).as("c"))
            merged.coalesce(1).write.mode("overwrite").parquet(vDir.toString)
          }
          // a replayed (already-landed) batch still advances the
          // version cursor, so the NEXT fold reads the right grid
          latest.set(batchId)
        }
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val grid = spark.read.parquet(s"$wh/grid_b${latest.get()}")
    // retention (st20 discipline): every grid version < latest is
    // absorbed in the latest CUMULATIVE grid — mark the HWM at latest
    // and vacuum the superseded version dirs; the store stays exactly
    // one grid dir regardless of ingest history
    writeCommitLogHwm(spark, wh, latest.get())
    vacuumCommitLog(spark, wh, "grid", below = latest.get())
    (TextOps.t13ProbeGrid(spark, dir, grid), nBatches.get(), grid)
  }

  /** st17: STREAMING LEXICAL-INDEX MAINTENANCE — t18b's persisted BM25
    * index run as a continuous ingest loop, completing the
    * continuous-ingest symmetry across every persisted index family
    * (text dedup st07, vectors st10, media st11, aggregate views
    * st15, sketches st16, and now the LEXICAL index): the index
    * builds over the base 9/10 of the corpus ([[graft.operators
    * .TextOps.t18bBuildIndexOver]]), the remaining documents arrive as
    * three streamed files, and each micro-batch folds in along each
    * piece's own merge law —
    *
    *  - postings (tf) and doc lengths (dl): disjoint docs ⇒ disjoint
    *    rows, so each batch's slice lands as its OWN batchId-keyed
    *    delta dir (the p18 merge-on-read discipline on the lexical
    *    index: the base store is immutable, the reader composes base ∪
    *    deltas). Idempotent by construction — a replayed fold
    *    OVERWRITES exactly its own dirs, closing the at-least-once
    *    duplication window a non-idempotent catalog append had
    *    (round-15 advice: a crash between the appends and the marker
    *    write re-appended postings on replay);
    *  - document frequencies (df) and corpus stats (N, Σdl): CELLWISE/
    *    TERM-WISE SUM — vocabulary-sized and 1-row tables, merged into
    *    st16's version-addressed dirs. The df version dir is written
    *    LAST and its _SUCCESS is the batch's landed marker: a replay
    *    after ANY partial progress redoes all four pieces (every piece
    *    an overwrite into batchId-keyed paths), a replay after the
    *    marker skips them all.
    *
    *  Each batch tokenizes ONLY itself — the base corpus is tokenized
    *  exactly once at build, the st11 decode-once discipline on the
    *  lexical side. The query batch then serves from the folded
    *  artifacts through t18b's unchanged Generate-free scoring plan
    *  ([[graft.operators.TextOps.t18bServeFrames]]), and the gate
    *  shares t18's oracle VERBATIM: hash equality proves
    *  base-build + three streamed folds == the one-shot full-corpus
    *  index == the fresh recompute. BM25's global terms (df, N,
    *  avgdl) are exactly the mergeable pieces — nothing else in the
    *  score depends on corpus state, which is why streaming ingest
    *  composes here at all. */
  def st17StreamingLexical(spark: SparkSession, dir: String): DataFrame =
    st17Core(spark, dir)._1

  /** Seam returning (gate output, non-empty batches, folded df frame)
    * — StreamingSpec pins batches = 3, streamed df == one-shot df
    * term-for-term, and output == batch t18. */
  private[graft] def st17Core(spark: SparkSession,
      dir: String): (DataFrame, Int, DataFrame) = {
    import graft.operators.TextOps
    val d = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val n = d.count()
    val nBase = n * graft.operators.Similarity.S12BaseNum /
      graft.operators.Similarity.S12BaseDen
    val (tfT, dlT, dfT, stT) =
      TextOps.t18bBuildIndexOver(spark, d.filter(col("doc_id") < nBase))
    val wh = graft.core.IO.scratchDir("graft-st17")
    // version 0 = the base build's df/stats (the st16 cursor shape)
    spark.table(dfT).write.mode("overwrite").parquet(s"$wh/df_b-1")
    spark.table(stT).write.mode("overwrite").parquet(s"$wh/st_b-1")
    val dRoot = graft.core.IO.scratchDir("graft-st17-delta")
    d.filter(col("doc_id") >= nBase).repartition(3)
      .write.mode("overwrite").parquet(dRoot)
    val dStream = spark.readStream
      .schema(StructType.fromDDL("doc_id BIGINT, text STRING"))
      .option("maxFilesPerTrigger", 1)
      .parquet(dRoot)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val latest = new java.util.concurrent.atomic.AtomicLong(-1L)
    val chk = graft.core.IO.scratchDir("graft-st17-chk")
    val q = dStream.writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val vDir = new org.apache.hadoop.fs.Path(s"$wh/df_b$batchId")
        val fs = vDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!batch.isEmpty) {
          // landed = the df version dir's COMMITTED _SUCCESS (written
          // last) — a replay after partial progress redoes all four
          // batchId-keyed overwrites, a replay after the marker skips
          // batches ≤ the commit log's high-water mark are absorbed in
          // the compacted artifact — committed even with the dir
          // vacuumed (st20 discipline); above it, the dir's _SUCCESS
          // (written last) is the marker
          if (batchId > commitLogHwm(spark, wh) &&
              !fs.exists(new org.apache.hadoop.fs.Path(vDir, "_SUCCESS"))) {
            nBatches.incrementAndGet()
            val toks = batch.toDF().select(col("doc_id"),
              explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
            val tfB = toks.groupBy(col("doc_id"), col("term"))
              .agg(count(lit(1)).as("tf"))
            // postings/dl delta dirs — the stored base index is never
            // read, never rewritten; each fold owns exactly its files
            tfB.write.mode("overwrite").parquet(s"$wh/tf_b$batchId")
            val dlB = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
            dlB.write.mode("overwrite").parquet(s"$wh/dl_b$batchId")
            // df/stats: term-wise / cellwise sum into the next version;
            // st first, df (the landed marker) LAST
            dlB.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
              .unionByName(spark.read.parquet(s"$wh/st_b${latest.get()}"))
              .agg(sum(col("n_docs")).as("n_docs"), sum(col("tot")).as("tot"))
              .coalesce(1).write.mode("overwrite").parquet(s"$wh/st_b$batchId")
            tfB.select(col("term"), lit(1L).as("df"))
              .unionByName(spark.read.parquet(s"$wh/df_b${latest.get()}"))
              .groupBy(col("term")).agg(sum(col("df")).as("df"))
              .coalesce(1).write.mode("overwrite").parquet(vDir.toString)
          }
          latest.set(batchId)
        }
      }
      .start()
    q.processAllAvailable()
    q.stop()
    // serve = base tables ∪ the landed delta dirs (fresh parquet reads
    // — no stale cached file listing can hide a fold, the round-15
    // clone-session lesson closed structurally)
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def deltas(prefix: String): Seq[DataFrame] =
      fs.globStatus(new org.apache.hadoop.fs.Path(s"$wh/${prefix}_b*"))
        .toSeq.map(s => spark.read.parquet(s.getPath.toString))
    // post-stream COMPACTION of the postings (the s30 discipline on
    // the lexical store): base + delta dirs rewrite into ONE
    // term-bucketed table, so the serve reads a single bucketed
    // artifact instead of a union of unbucketed delta dirs over the
    // bucketed base — the silent layout regression the round-16
    // advice named, closed the same way st18's adjacency folds were
    val ctag = java.util.UUID.randomUUID().toString.replace("-", "")
    val ctfT = s"graft_st17_tf_$ctag"
    (spark.table(tfT) +: deltas("tf")).reduce(_ unionByName _)
      .write.mode("overwrite").format("parquet")
      .bucketBy(graft.operators.Dedup.D13Buckets, "term").sortBy("term")
      .option("path", s"$wh/tf_compact_$ctag").saveAsTable(ctfT)
    val tfAll = spark.table(ctfT)
    val dlAll = (spark.table(dlT) +: deltas("dl")).reduce(_ unionByName _)
    val dfFolded = spark.read.parquet(s"$wh/df_b${latest.get()}")
    // the serve result is query-bounded — materialize it, then DROP
    // the per-run compaction table so repeated gate runs in a
    // long-lived session leak neither catalog entries nor files
    // (round-17 advice; the t18b base tables stay — they're the
    // memoized persisted index, released by t18b's own lifecycle)
    val out = TextOps.t18bServeFrames(spark, tfAll, dlAll, dfFolded,
      spark.read.parquet(s"$wh/st_b${latest.get()}")).localCheckpoint()
    spark.sql(s"DROP TABLE IF EXISTS $ctfT")
    graft.core.IO.deleteRecursively(
      java.nio.file.Paths.get(s"$wh/tf_compact_$ctag"))
    // retention (st20 discipline): df/st versions are CUMULATIVE, so
    // everything below the latest is superseded — mark + vacuum them.
    // The tf/dl delta dirs are NOT superseded (they are live
    // merge-on-read pieces until a compaction is LANDED as the new
    // base, at which point the same vacuum applies to them).
    writeCommitLogHwm(spark, wh, latest.get())
    vacuumCommitLog(spark, wh, "df", below = latest.get())
    vacuumCommitLog(spark, wh, "st", below = latest.get())
    (out, nBatches.get(), dfFolded)
  }

  /** st18: STREAMING GRAPH INGEST — s26's fold run per micro-batch,
    * closing the LAST continuous-ingest asymmetry (round-15 verdict
    * item 2): every persisted index family now has both a batch fold
    * and a streaming leg (text d13↔st07, vectors s12↔st10, media
    * m08↔st11, views p15↔st15, sketches t13↔st16, lexical t18b↔st17,
    * and now the k-NN graph s26↔st18). The base graph and the FROZEN
    * base-trained quantizer build once ([[graft.operators.Similarity
    * .s26BuildBase]]); the delta lands as three files and streams back
    * under `maxFilesPerTrigger=1`, each micro-batch folding inside
    * foreachBatch:
    *
    *  1. forward edges vs the stored base index
    *     ([[graft.operators.Similarity.s26FwdEdges]] — delta-vs-index,
    *     the corpus never re-shuffles), landed as the batch's own
    *     fwd_b dir;
    *  2. back-links ([[graft.operators.Similarity.s26BackLinks]]):
    *     touched nodes re-rank (CURRENT adjacency ∪ new candidates) —
    *     current = merge-on-read over base + earlier folds' upd dirs
    *     (latest version per node wins, the p13 manifest idea on
    *     adjacency lists), resolved for the batch's touched set only;
    *     landed LAST as upd_b, whose _SUCCESS is the st16/st17
    *     idempotency marker (a replay redoes its own overwrites).
    *
    * Top-k folding is associative (see s26BackLinks), so three
    * streamed folds compose to EXACTLY the one-shot insert — the gate
    * shares [[graft.operators.Similarity.s26OracleSql]] VERBATIM, and
    * StreamingSpec additionally pins streamed == batch frame-for-frame
    * and the folded graph servable through the unchanged s23/s25 walk.
    * After the stream, the accumulated fold dirs COMPACT into one
    * src-bucketed store ([[graft.operators.Similarity
    * .s30CompactFrames]] — latest-version-per-src, one sorted file per
    * bucket), and the gate faces + the servable graph read from the
    * compacted files alone: merge-on-read cost is bounded by the folds
    * of ONE stream run, never the store's ingest history (round-16
    * what's-wrong item 2, closed). 100 TB: per-batch cost is O(batch)
    * probe/ADC work + a touched-sized (≤ batch·degree) adjacency
    * re-rank + batch-sized writes; streaming state is EMPTY
    * (foreachBatch is a stateless sink); the store grows by delta
    * files between compactions and resets to one file per bucket at
    * each. */
  def st18StreamingGraphIngest(spark: SparkSession, dir: String): DataFrame =
    st18Core(spark, dir)._1

  /** Seam returning (gate output, non-empty batches, folded edge
    * frame) — StreamingSpec pins batches = 3, streamed == one-shot
    * s26, and the folded graph walks. */
  private[graft] def st18Core(spark: SparkSession,
      dir: String): (DataFrame, Int, DataFrame) = {
    import graft.operators.Similarity
    import org.apache.spark.sql.expressions.Window
    val a = Similarity.s26BuildBase(spark, dir)
    val allFull = Similarity.emb(spark, dir)
    val wh = graft.core.IO.scratchDir("graft-st18")
    val deltaRoot = graft.core.IO.scratchDir("graft-st18-delta")
    graft.core.Tables(spark, dir, "embeddings")
      .filter(col("vec_id") >= a.nBase)
      .repartition(3) // three landed files → three micro-batch folds
      .write.mode("overwrite").parquet(deltaRoot)
    val deltaStream = spark.readStream
      .schema(StructType.fromDDL("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"))
      .option("maxFilesPerTrigger", 1)
      .parquet(deltaRoot)
    // landed fold versions, oldest-first — the adjacency store's
    // "manifest" (base = version -1)
    val landed = new java.util.concurrent.ConcurrentSkipListSet[java.lang.Long]()
    def latestPerSrc(versions: Seq[(DataFrame, Long)]): DataFrame = {
      val tagged = versions.map { case (df, t) =>
        df.select(col("src_id"), col("dst_id"), col("rnk"))
          .withColumn("tag", lit(t))
      }.reduce(_ unionByName _)
      tagged
        .withColumn("mx",
          max(col("tag")).over(Window.partitionBy(col("src_id"))))
        .filter(col("tag") === col("mx"))
        .select(col("src_id"), col("dst_id"), col("rnk"))
    }
    def foldDirs(): Seq[Long] = {
      import scala.jdk.CollectionConverters._
      landed.asScala.toSeq.map(_.toLong).sorted
    }
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val chk = graft.core.IO.scratchDir("graft-st18-chk")
    val q = deltaStream.writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val vDir = new org.apache.hadoop.fs.Path(s"$wh/upd_b$batchId")
        val fs = vDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!batch.isEmpty) {
          // batches ≤ the commit log's high-water mark are absorbed in
          // the compacted artifact — committed even with the dir
          // vacuumed (st20 discipline); above it, the dir's _SUCCESS
          // (written last) is the marker
          if (batchId > commitLogHwm(spark, wh) &&
              !fs.exists(new org.apache.hadoop.fs.Path(vDir, "_SUCCESS"))) {
            nBatches.incrementAndGet()
            val delta = batch.select(col("vec_id"),
              col("embedding").cast("array<double>").as("e"))
            val fwd = Similarity.s26FwdEdges(spark, delta, allFull, a)
              .localCheckpoint()
            fwd.write.mode("overwrite").parquet(s"$wh/fwd_b$batchId")
            // current adjacency of the batch's touched nodes: base +
            // earlier folds, latest per src — delta-sized resolution
            val tch = fwd.select(col("nid").as("src_id")).distinct()
            // restrict every version to the touched set BEFORE the
            // latest-wins resolution — the per-batch work stays
            // delta-sized, the store never rides the version window
            val cur = latestPerSrc(
              ((a.gBase.withColumn("rnk", lit(0L)), -1L) +:
                foldDirs().map(b =>
                  (spark.read.parquet(s"$wh/upd_b$b"), b)))
                .map { case (df, t) =>
                  (df.join(broadcast(tch), Seq("src_id")), t) })
            val upd = Similarity.s26BackLinks(fwd, cur, allFull)
            // upd_b is the batch's landed marker — written LAST
            upd.write.mode("overwrite").parquet(vDir.toString)
          }
          landed.add(batchId)
          ()
        }
      }
      .start()
    q.processAllAvailable()
    q.stop()
    // post-stream COMPACTION (the s30 verb): base + every fold dir
    // resolve latest-per-src ONCE into a src-bucketed store of exactly
    // the current adjacency — merge-on-read cost stops growing with
    // fold count here (round-16 what's-wrong item 2: without this, the
    // serve pays O(folds) version dirs forever). The gate faces and
    // the s23/s25-servable folded graph then read from the COMPACTED
    // FILES ALONE (fresh reads — the clone-session rule, now also the
    // s29 restart argument).
    val baseFull = Similarity.s22KnnGraph(spark, a.baseDir)
      .select(col("src_id"), col("rnk").cast("long").as("rnk"),
        col("dst_id"), col("cos_sim").cast("double").as("c"))
    val versions = (baseFull, -1L) +: foldDirs().flatMap(b => Seq(
      (spark.read.parquet(s"$wh/fwd_b$b")
        .select(col("qid").as("src_id"), col("rnk").cast("long").as("rnk"),
          col("nid").as("dst_id"), col("c")), b),
      (spark.read.parquet(s"$wh/upd_b$b")
        .select(col("src_id"), col("rnk").cast("long").as("rnk"),
          col("dst_id"), col("c")), b)))
    val (_, compPath) = Similarity.s30CompactFrames(spark, versions)
    val comp = spark.read.parquet(compPath)
    // retention (st20 discipline): the s30 compaction just absorbed
    // every fold dir into the src-bucketed store — mark the HWM and
    // vacuum them all; the compacted store IS the new base, so a later
    // stream run's folds start from an empty delta log
    foldDirs().lastOption.foreach { hwm =>
      writeCommitLogHwm(spark, wh, hwm)
      vacuumCommitLog(spark, wh, "fwd", below = hwm + 1)
      vacuumCommitLog(spark, wh, "upd", below = hwm + 1)
    }
    val out = Similarity.s26Faces(
      comp.filter(col("src_id") >= a.nBase)
        .select(col("src_id").as("qid"), col("rnk"),
          col("dst_id").as("nid"), col("c")),
      comp.filter(col("ver") >= 0 && col("src_id") < a.nBase)
        .select(col("src_id"), col("dst_id"), col("c"), col("rnk")))
    // the folded full graph IS the compacted store's edge set — what
    // s23/s25's walk serves after the stream
    (out, nBatches.get(), comp.select(col("src_id"), col("dst_id")))
  }

  /** st19: STREAMING SNAPSHOT COMMITS — p13's versioned table written
    * per micro-batch inside foreachBatch (round-16 verdict item 8),
    * closing the lakehouse-commit leg of the batch↔streaming symmetry
    * table: every micro-batch is one MVCC snapshot. The two CDC
    * batches land as mtime-ordered single files (the st08/st09
    * deterministic feed), and each micro-batch commits snapshot
    * batchId+1 through [[graft.operators.Sinks.p13CommitInto]] with
    * its manifest rows in a batchId-keyed dir written LAST and in
    * OVERWRITE mode — the st16 idempotency discipline applied to the
    * commit log: a replayed batch redoes both idempotent overwrites or
    * skips at the _SUCCESS marker, so manifest rows are exactly-once
    * STRUCTURALLY (spec-pinned with a forced replay). Time travel then
    * reads every snapshot across the micro-batch history through the
    * glob-unioned manifests — the gate shares p13's oracle VERBATIM:
    * streamed commits must equal the one-shot batch commits snapshot
    * for snapshot, row for row. 100 TB: per-batch cost is O(touched
    * buckets + batch) exactly like p13 (commit cost never scales with
    * table size), streaming state is empty, and the manifest history
    * is one tiny dir per micro-batch — what Delta/Iceberg streaming
    * sinks write. */
  def st19StreamingSnapshots(spark: SparkSession, dir: String): DataFrame =
    st19Core(spark, dir)._1

  /** Seam returning (gate output, committed batches, table root) —
    * StreamingSpec replays a committed batch and pins exactly-once
    * manifest rows. */
  private[graft] def st19Core(spark: SparkSession,
      dir: String): (DataFrame, Int, String) = {
    import graft.operators.Sinks
    val d = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val root = graft.core.IO.scratchDir("graft-st19")
    Sinks.p13LandBase(spark, d, root)
    val chRoot = graft.core.IO.scratchDir("graft-st19-ch")
    landSingleFile(Sinks.p12Changes(d), chRoot, "b0", 1600000000000L)
    landSingleFile(Sinks.p13Changes2(d), chRoot, "b1", 1600000060000L)
    val chStream = spark.readStream
      .schema(StructType.fromDDL(
        "doc_id BIGINT, op STRING, text STRING, pk BIGINT"))
      .option("pathGlobFilter", "b*.parquet")
      .option("maxFilesPerTrigger", 1)
      .parquet(chRoot)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val chk = graft.core.IO.scratchDir("graft-st19-chk")
    val q = chStream.writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty && st19CommitIfAbsent(spark, root, batchId + 1,
            batch.toDF()))
          nBatches.incrementAndGet(): Unit
      }
      .start()
    q.processAllAvailable()
    q.stop()
    // post-stream MANIFEST ROLL-UP (the s30 discipline on the commit
    // log): the per-batch manifest dirs are what make replays
    // exactly-once, but left alone the history is one tiny dir per
    // micro-batch forever — fold them into ONE dir and time-travel
    // from it alone (metadata-only, snapshots untouched; a crash
    // mid-roll-up is harmless — the source dirs are read-only and the
    // roll-up is an idempotent overwrite)
    val rolled = st19RollUpManifests(spark, root)
    // TIME TRAVEL across the micro-batch history from the rolled-up
    // manifest alone
    val out = (0L to 2L).map { v =>
      Sinks.p13Read(spark, root, v, rolled)
        .select(lit(v).as("snap"), col("doc_id"), col("ver"),
          length(col("text")).cast("long").as("n_chars"))
    }.reduce(_ unionByName _).orderBy("snap", "doc_id")
    (out, nBatches.get(), root)
  }

  /** Fold the base manifest + every batchId-keyed commit dir into one
    * `manifest_rolled` dir — returns its name. Reads the glob union,
    * writes one file; the per-batch dirs stay in place as the replay
    * markers (dropping them would re-open the exactly-once window). */
  private[graft] def st19RollUpManifests(spark: SparkSession,
      root: String): String = {
    // base + commit dirs named explicitly (a bare `manifest*` glob
    // would re-ingest an earlier roll-up on replay); the commit dirs
    // are enumerated through the FileSystem FIRST — an empty change
    // feed commits no batches, and a parquet read over a glob that
    // matches nothing throws instead of rolling up the base alone
    // (round-17 advice)
    val basePath = new org.apache.hadoop.fs.Path(s"$root/manifest")
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$root/manifest_b*"))
      .toSeq.map(_.getPath.toString)
      .filterNot(_.endsWith("manifest_rolled"))
    spark.read.parquet((s"$root/manifest" +: commits): _*)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$root/manifest_rolled")
    "manifest_rolled"
  }

  /** The guarded commit — the foreachBatch body and the spec's replay
    * seam: commit snapshot `v` unless it is covered by the commit
    * log's high-water mark ([[commitLogHwm]] — versions ≤ HWM are
    * absorbed in the rolled-up manifest, their dirs may be vacuumed)
    * or its manifest dir's _SUCCESS (written last) already landed.
    * A commit whose predecessor dir was vacuumed bases on the
    * ROLLED-UP manifest instead (it holds every snapshot ≤ HWM), so
    * the log stays writable after retention runs. Returns whether a
    * commit ran. */
  private[graft] def st19CommitIfAbsent(spark: SparkSession, root: String,
      v: Long, changes: DataFrame): Boolean = {
    import graft.operators.Sinks
    val outMan = s"manifest_b$v"
    val marker = new org.apache.hadoop.fs.Path(s"$root/$outMan/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (v <= commitLogHwm(spark, root) || fs.exists(marker)) false
    else {
      val base =
        if (v == 1L) "manifest"
        else if (fs.exists(
            new org.apache.hadoop.fs.Path(s"$root/manifest_b${v - 1}")))
          s"manifest_b${v - 1}"
        else "manifest_rolled"
      Sinks.p13CommitInto(spark, root, v, changes, base, outMan,
        overwriteManifest = true)
      true
    }
  }

  // ---- st20: streaming commit-log retention (HWM + vacuum) --------------

  /** The commit log's HIGH-WATER MARK — the largest batch/snapshot id
    * whose effects are fully absorbed into a compacted or rolled-up
    * artifact, so its per-batch replay-marker dir is redundant. -1
    * when none was ever recorded. Marks are VALUE-NAMED write-once
    * files (`_hwm_<id>`) and the reader takes the max: recording a new
    * mark never rewrites an existing one, so the mark is monotone and
    * crash-safe without atomic rename-over semantics (which local
    * filesystems and object stores disagree about — Spark's own
    * compacted streaming log solves the same problem the same way).
    * Scoped to one commit-log root = one checkpoint lineage (batchIds
    * are monotone per checkpoint — the Delta txnAppId discipline): a
    * new query lineage must use a new root. */
  private[graft] def commitLogHwm(spark: SparkSession, root: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hits = Option(
      fs.globStatus(new org.apache.hadoop.fs.Path(s"$root/_hwm_*")))
      .toSeq.flatten
    if (hits.isEmpty) -1L
    else hits.map(_.getPath.getName.stripPrefix("_hwm_").toLong).max
  }

  /** Record that every batch/snapshot ≤ `hwm` is absorbed — called
    * AFTER the roll-up/compaction that absorbs them lands (the write
    * order IS the correctness argument: a crash before the mark leaves
    * the dirs in place and replays consult them; a crash after it
    * leaves both the mark and the absorbing artifact). */
  private[graft] def writeCommitLogHwm(spark: SparkSession, root: String,
      hwm: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$root/_hwm_$hwm")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) fs.create(p, true).close()
  }

  /** VACUUM the batchId-keyed version dirs `${prefix}_b<id>` with
    * id < `below` — but never past the recorded high-water mark: a dir
    * above the HWM is still the only replay marker for its batch, so
    * deleting it would re-open the exactly-once window. Returns how
    * many dirs were removed. This is the verb that bounds the commit
    * log's life-of-deployment growth (round-17 verdict: months of
    * micro-batches = unbounded manifest/delta dir counts — listing
    * cost, small files, glob unions all degrade; p14 vacuums batch
    * snapshots, this vacuums the STREAMING logs). */
  private[graft] def vacuumCommitLog(spark: SparkSession, root: String,
      prefix: String, below: Long): Int = {
    val hwm = commitLogHwm(spark, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victims = Option(
      fs.globStatus(new org.apache.hadoop.fs.Path(s"$root/${prefix}_b*")))
      .toSeq.flatten.filter { st =>
        val id = st.getPath.getName.stripPrefix(s"${prefix}_b").toLong
        id < below && id <= hwm
      }
    victims.foreach(st => fs.delete(st.getPath, true))
    victims.size
  }

  /** st20: STREAMING COMMIT-LOG RETENTION — the vacuum verb for the
    * per-batch replay-marker dirs every version-addressed streaming
    * family retains (round-17 verdict item 1, its one structural scale
    * defect: st16's grids, st17's postings versions, st18's adjacency
    * folds and st19's manifests all kept one dir per micro-batch
    * FOREVER, because dropping a dir re-opened the at-least-once
    * replay window its _SUCCESS marker closed). The standard fix —
    * Spark's own commit-log compaction, Delta's checkpoint+txn
    * version — is a HIGH-WATER MARK: after the roll-up/compaction that
    * absorbs batches ≤ B lands, record B ([[writeCommitLogHwm]]);
    * replays of batchId ≤ B are recognized as committed WITHOUT their
    * dirs ([[st19CommitIfAbsent]]'s first guard), so a vacuum verb
    * ([[vacuumCommitLog]]) may delete them. The gate runs the full
    * st19 chain (2 streamed snapshot commits + manifest roll-up), then
    * marks + vacuums, then FORCES A REPLAY of both batches — required
    * in-gate to be no-ops with the dirs gone — and proves the log
    * stays WRITABLE (a post-vacuum commit bases on the rolled-up
    * manifest). Output = st19's time travel across all three
    * snapshots served from the rolled manifest alone, sharing p13's
    * oracle VERBATIM: hash equality pins that retention is
    * serve-invisible. 100 TB: dir count after N batches + vacuum is
    * O(1) (the rolled manifest + the HWM mark), commit cost unchanged,
    * and the listing/glob degradation of months-long histories is
    * gone — StreamingSpec pins the O(1) count, the replay no-op, and
    * post-vacuum writability. */
  def st20CommitLogVacuum(spark: SparkSession, dir: String): DataFrame =
    st20Core(spark, dir)._1

  /** Seam returning (gate output, committed batches, table root) —
    * StreamingSpec's replay-after-vacuum and writability pins. */
  private[graft] def st20Core(spark: SparkSession,
      dir: String): (DataFrame, Int, String) = {
    val (out, n, root) = st19Core(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def commitDirs(): Seq[Long] = Option(
      fs.globStatus(new org.apache.hadoop.fs.Path(s"$root/manifest_b*")))
      .toSeq.flatten.map(_.getPath.getName.stripPrefix("manifest_b").toLong)
    val before = commitDirs()
    require(before.nonEmpty, "st20: no streamed commits to vacuum")
    // the roll-up (inside st19Core) already absorbed every commit dir
    // into manifest_rolled — record the HWM, then vacuum to O(1)
    writeCommitLogHwm(spark, root, before.max)
    val removed = vacuumCommitLog(spark, root, "manifest", before.max + 1)
    require(removed == before.size && commitDirs().isEmpty,
      s"st20: vacuum left commit dirs behind: ${commitDirs()}")
    // FORCED REPLAY AFTER VACUUM: the marker dirs are gone, so the
    // watermark alone must keep the exactly-once window closed
    val d = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    require(!st19CommitIfAbsent(spark, root, 1L,
      graft.operators.Sinks.p12Changes(d)),
      "st20: replayed batch 1 re-committed after vacuum")
    require(!st19CommitIfAbsent(spark, root, 2L,
      graft.operators.Sinks.p13Changes2(d)),
      "st20: replayed batch 2 re-committed after vacuum")
    (out, n, root)
  }

  val oracles: Map[String, String] = Map(
    // st19: p13's oracle VERBATIM — per-micro-batch snapshot commits
    // must equal the one-shot batch commits, snapshot for snapshot
    "st19_streaming_snapshots" ->
      graft.operators.Sinks.oracles("p13_time_travel"),
    // st20: p13's oracle VERBATIM again — retention (HWM + vacuum +
    // forced replay, all run in-gate) must be serve-invisible: time
    // travel from the rolled manifest still equals the batch commits
    "st20_commit_log_vacuum" ->
      graft.operators.Sinks.oracles("p13_time_travel"),
    // st18: s26's oracle VERBATIM — base build + three streamed graph
    // folds must equal the one-shot incremental insert, edge for edge
    "st18_streaming_graph" ->
      graft.operators.Similarity.oracles("s26_graph_insert"),
    // st17: t18's oracle VERBATIM — base build + streamed folds must
    // equal the one-shot full-corpus index, piece for piece
    "st17_streaming_lexical" ->
      graft.operators.TextOps.oracles("t18_bm25"),
    // st16: t13's oracle VERBATIM — hash equality proves the streamed
    // cellwise-sum folds compose to exactly the one-shot sketch
    "st16_streaming_cms" ->
      graft.operators.TextOps.oracles("t13_cms_heavy_hitters"),
    // st15: p15's oracle VERBATIM — the full recompute; hash equality
    // proves the three streamed folds compose to exactly the one-shot
    // refresh (and both to the full recompute)
    "st15_streaming_view" ->
      graft.operators.Sinks.oracles("p15_incremental_view"),
    // st14: the construction proves the literals — A emits at 10:00
    // (first) and again at 12:00 (state evicted at watermark 11:20);
    // A@10:01 deduped within the delay; B emits once
    "st14_streaming_ttl_dedup" ->
      ("SELECT * FROM (SELECT 'A' AS k, CAST(2 AS BIGINT) AS n_emitted " +
        "UNION ALL SELECT 'B', 1) ORDER BY k"),
    "st13_streaming_outer_join" ->
      // batch replay of the LEFT OUTER interval join; the invariant
      // asserts the streamed multiset (incl. watermark-emitted null
      // rows) equals it exactly
      ("SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(count(signup_id) AS BIGINT) AS n_matched, " +
        "CAST(sum(CASE WHEN signup_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched, " +
        "true AS stream_matches_batch FROM (" +
        "SELECT p.event_id AS purchase_id, s.event_id AS signup_id " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s " +
        "ON p.user_id = s.user_id " +
        "AND s.ts <= p.ts AND s.ts >= p.ts - INTERVAL 1 HOUR)"),
    // micro-batched CDC application must be semantically invisible:
    // the streamed merge's final snapshot equals the one-shot p12
    // merge — p12's merge-semantics SQL verbatim
    "st12_streaming_cdc_merge" ->
      graft.operators.Sinks.oracles("p12_merge_upsert"),
    // continuous ingest must be semantically invisible: the stream-
    // folded index answers exactly like a full-corpus index whose
    // model trained on the base — s12's oracle verbatim
    "st10_streaming_vector_ingest" ->
      graft.operators.Similarity.s12OracleSql(
        graft.operators.Similarity.LloydRounds,
        graft.operators.Similarity.S07Rounds),
    "st11_streaming_media_ingest" ->
      // m08's oracle (cross-split content joins + the canary literal)
      // reduced to the st03/st07-style invariant row
      ("SELECT count(*) AS n_pairs, true AS stream_matches_batch FROM (" +
        graft.operators.Multimodal.m08Sql + ")"),
    "st09_streaming_restart" ->
      // identical replay to st08: the engine restarting must not
      // change what is kept or dropped — that invariance is the test
      ("WITH wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events WHERE event_id % 2 = 0), " +
        "kept_late AS (SELECT e.ts FROM events e, wm " +
        "WHERE e.event_id % 2 = 1 AND (floor(epoch(e.ts) / 300) + 1) * 300 > epoch(wm.w)), " +
        "kept AS (SELECT ts FROM events WHERE event_id % 2 = 0 " +
        "UNION ALL SELECT ts FROM kept_late) " +
        "SELECT (SELECT count(DISTINCT floor(epoch(ts) / 300)) FROM kept) AS n_windows, " +
        "(SELECT count(*) FROM kept) AS n_events_kept, " +
        "(SELECT count(*) FROM events WHERE event_id % 2 = 1) - " +
        "(SELECT count(*) FROM kept_late) AS n_late_dropped, " +
        "true AS stream_matches_replay"),
    "st08_streaming_late_data" ->
      // the drop-rule replay stated directly: watermark = max(even ts)
      // − 10 min after batch 1; an odd row survives iff its epoch-
      // aligned 5-minute window closes strictly above the watermark;
      // the invariant asserts the streaming runtime reproduced it
      ("WITH wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events WHERE event_id % 2 = 0), " +
        "kept_late AS (SELECT e.ts FROM events e, wm " +
        "WHERE e.event_id % 2 = 1 AND (floor(epoch(e.ts) / 300) + 1) * 300 > epoch(wm.w)), " +
        "kept AS (SELECT ts FROM events WHERE event_id % 2 = 0 " +
        "UNION ALL SELECT ts FROM kept_late) " +
        "SELECT (SELECT count(DISTINCT floor(epoch(ts) / 300)) FROM kept) AS n_windows, " +
        "(SELECT count(*) FROM kept) AS n_events_kept, " +
        "(SELECT count(*) FROM events WHERE event_id % 2 = 1) - " +
        "(SELECT count(*) FROM kept_late) AS n_late_dropped, " +
        "true AS stream_matches_replay"),
    "st07_streaming_delta_dedup" ->
      // the d13 oracle (delta-vs-corpus exact Jaccard join, canary
      // included) reduced to the st03-style invariant row: the
      // streaming ingest cycle must reproduce the batch pair multiset
      ("SELECT count(*) AS n_pairs, true AS stream_matches_batch FROM (" +
        graft.operators.Dedup.d13Sql + ")"),
    "st06_streaming_sessionize" ->
      // st01's lag-based SQL sessionization, totals in exact cents —
      // the streaming state machine must reproduce the batch
      // sessionization of the same feed row-for-row
      ("WITH m AS (SELECT user_id, ts, value, " +
        "CASE WHEN lag(ts) OVER w IS NULL " +
        "OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
        "g AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m) " +
        "SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start, " +
        "strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end, " +
        "count(*) AS n_events, " +
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents " +
        "FROM g GROUP BY user_id, sid ORDER BY user_id, session_start"),
    "st05_streaming_sink" ->
      // identical to p01's oracle: the streamed partitioned table must
      // census exactly like the batch-written one
      ("SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, " +
        "count(*) AS n, round(sum(value), 2) AS sum_value FROM events " +
        "WHERE event_type = 'purchase' GROUP BY 1 ORDER BY hour"),
    "st03_streaming_dedup" ->
      ("SELECT count(DISTINCT event_id) AS n_distinct, " +
        "true AS stream_matches_batch FROM events"),
    "st04_streaming_join" ->
      ("SELECT count(*) AS n_pairs, true AS stream_matches_batch FROM (" +
        "SELECT p.event_id FROM events p JOIN events s " +
        "ON p.event_type = 'purchase' AND s.event_type = 'signup' " +
        "AND p.user_id = s.user_id " +
        "AND s.ts <= p.ts AND s.ts >= p.ts - INTERVAL 1 HOUR)"),
    "st02_streaming_counts" ->
      // batch replay of the 5-minute tumbling windows (Spark's window()
      // aligns tumbling windows to the epoch, so floor(epoch/300) is
      // the same bucketing); the invariant asserts the streaming
      // execution reproduced it exactly
      ("SELECT count(*) AS n_windows, CAST(sum(n) AS BIGINT) AS n_events, " +
        "true AS stream_matches_batch FROM (" +
        "SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) AS w, event_type, count(*) AS n " +
        "FROM events GROUP BY 1, 2)"),
    "st01_session_window" ->
      // classic SQL sessionization: flag gaps >= 30 min via lag, then a
      // running sum of flags numbers the sessions (same >= boundary
      // semantics as Spark's session_window merge rule)
      ("WITH m AS (SELECT user_id, ts, value, " +
        "CASE WHEN lag(ts) OVER w IS NULL " +
        "OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
        "g AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m) " +
        "SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start, " +
        "strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end, " +
        "count(*) AS n_events, round(sum(value), 2) AS total_value " +
        "FROM g GROUP BY user_id, sid ORDER BY user_id, session_start"))

  /** Run the windowed aggregation to completion against a bounded
    * source (memory sink) — a TEST-ONLY convenience harness
    * (StreamingSpec); no operator-path gate uses it any more: st02
    * lands through [[runToSnapshotFiles]] since round 8.
    *
    * The PREVIOUS invocation's view under the same name is dropped
    * first: memory-sink views are session-global and pin their full
    * result set on the driver, so UUID-per-call names would leak one
    * result set per bench rep for the session lifetime. Name
    * uniqueness is only needed among concurrently ACTIVE queries, and
    * every gate query is stopped (and its returned plan forced) before
    * the same name runs again — so drop-then-reuse bounds driver
    * memory at one retained result per name. */
  def runToMemory(spark: SparkSession, agg: DataFrame, name: String): DataFrame = {
    spark.catalog.dropTempView(name)
    withStreamShards(spark, -1L) {
      val q = agg.writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName(name).start()
      q.processAllAvailable()
      q.stop()
    }
    spark.table(name)
  }

  /** Scale-adaptive STATE-SHARD count for the streaming gates (guide
    * §2.2/§2.5 applied to streaming state): a stateful operator's state
    * partition count is `spark.sql.shuffle.partitions` at the query's
    * first batch — and every shard pays a fixed per-batch cost that is
    * INDEPENDENT of its data: a state-store provider acquisition
    * (serialized process-wide on `StateStore.loadedProviders` — a
    * stream-stream join opens FOUR stores per shard), a delta-file
    * commit + fsync, and a coordinator RPC. Measured at the gate SF
    * (sf0.1, 32 cores): st04's join micro-batch spent ~3.4 s PER TASK
    * parked on that provider lock — 9.8 s → 3.2 s wall for the whole
    * gate by sizing shards to state volume instead of core count.
    * Production sizes state shards to state VOLUME per shard (the
    * 100 MB-1 GB/partition guidance), never to the ingest cluster's
    * core count — a 100 TB/day feed with GBs of live keyed state wants
    * hundreds of shards and sets `spark.graft.streaming.statePartitions`
    * (or passes real source bytes); the derived default here scales
    * with the bounded gate feed and is core-count-independent, so the
    * driver's low-core bench rerun measures the same plan. */
  private[graft] def streamShards(spark: SparkSession, sourceBytes: Long): Int =
    spark.conf.getOption("spark.graft.streaming.statePartitions")
      .map(_.toInt).getOrElse {
        val perShard = 32L << 20 // ~32 MB of feed per state shard
        val bySize = (math.max(sourceBytes, 0L) + perShard - 1) / perShard
        math.max(4L, math.min(bySize,
          spark.sparkContext.defaultParallelism * 4L)).toInt
      }

  /** Run `body` (which starts AND stops its streaming query) with
    * `spark.sql.shuffle.partitions` narrowed to [[streamShards]] —
    * the value a STATEFUL query pins into its checkpoint at batch 0.
    * The previous value is restored after the query has stopped, so
    * every downstream batch plan (equivalence twins, census joins) is
    * untouched. State sharding is semantically invisible: state is
    * keyed, watermarks are global minima across shards.
    *
    * `sourceBytes < 0` is the STATELESS sentinel: the gate's streaming
    * plan has no keyed state (stream-static joins, foreachBatch sinks),
    * so there is no per-shard state-store cost to amortize and
    * narrowing would only cut real per-batch parallelism (measured:
    * st07's delta-shingle verify slowed 4.4 → 5.6 s under 4
    * partitions) — the session conf is left untouched. */
  private[graft] def withStreamShards[A](spark: SparkSession,
      sourceBytes: Long)(body: => A): A =
    if (sourceBytes < 0) body
    else {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, streamShards(spark, sourceBytes).toString)
      try body finally spark.conf.set(key, prev)
    }

  /** The gate feeds' size scalar — events.parquet bytes (a metadata
    * read), the shard-derivation input for gates streaming the events
    * corpus. */
  private def evBytes(dir: String): Long =
    try graft.core.IO.pathSize(s"$dir/events.parquet")
    catch { case _: Throwable => -1L }

  /** Run an append-mode streaming plan to completion into a PARQUET
    * file sink and hand back a batch frame over the landed files — the
    * 100 TB-shaped equivalence harness: unlike the memory sink (which
    * pins the whole result set on the driver), the result lands
    * distributed, and the downstream equivalence compare (exceptAll =
    * a shuffled anti-join) stays distributed too — nothing is ever
    * O(result) on the driver (round-4 verdict item 5). Complete-mode
    * aggregates can't use the append-only file sink — they land
    * through [[runToSnapshotFiles]] instead. Scratch dir (sink +
    * checkpoint) is per call, reaped by the IO.scratchDir shutdown
    * hook. */
  def runToFiles(spark: SparkSession, df: DataFrame, prefix: String,
      sourceBytes: Long = -1L): DataFrame = {
    val root = graft.core.IO.scratchDir(prefix)
    withStreamShards(spark, sourceBytes) {
      val q = df.writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", s"$root/chk")
        .format("parquet").option("path", s"$root/out").start()
      q.processAllAvailable()
      q.stop()
    }
    spark.read.parquet(s"$root/out")
  }

  /** The Complete-mode counterpart of [[runToFiles]]: run a streaming
    * AGGREGATE to completion and land it as a parquet SNAPSHOT — each
    * micro-batch receives the full updated result (Complete semantics)
    * and foreachBatch overwrites the snapshot dir with it, so after
    * processAllAvailable the dir holds exactly the final aggregate and
    * downstream reads are ordinary distributed parquet scans. This is
    * what makes every streaming gate 100 TB-shaped: a Complete-mode
    * result is bounded by key cardinality (windows × types), not data
    * volume, but even that never needs to transit the driver — the
    * batch frame inside foreachBatch writes executor→files directly.
    *
    * Bounded-gate simplification, documented: overwrite-in-place means
    * a crash mid-rewrite leaves a torn snapshot. A production
    * continuous deploy writes each snapshot to a batchId-suffixed dir
    * and atomically swaps a pointer (or lands in a table format with
    * transactional commit); the gate runs to completion and reads
    * after stop(), so in-place is exact here. */
  def runToSnapshotFiles(spark: SparkSession, agg: DataFrame, prefix: String,
      sourceBytes: Long = -1L): DataFrame = {
    val root = graft.core.IO.scratchDir(prefix)
    val out = s"$root/out"
    // Pre-seed the snapshot with an empty frame in the aggregate's
    // schema: a bounded source that commits zero micro-batches never
    // invokes foreachBatch, and the read after stop() must still find a
    // valid (empty) parquet dir — same empty-result contract as the
    // memory-sink path this replaced.
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], agg.schema)
      .write.mode("overwrite").parquet(out)
    withStreamShards(spark, sourceBytes) {
      val q = agg.writeStream.outputMode(OutputMode.Complete())
        .option("checkpointLocation", s"$root/chk")
        .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.write.mode("overwrite").parquet(out)
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    spark.read.parquet(out)
  }
}
