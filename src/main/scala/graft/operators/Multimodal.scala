package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media payloads as opaque `binary`
  * columns with typed metadata, and run decode / feature-extract /
  * frame-sample as distributed column pipelines.
  *
  * The container has no image/audio libraries, so the DECODE step is a
  * clearly-marked deterministic stub (see [[fakeFeature]]): it derives
  * features from the raw bytes instead of pixels. Everything around it
  * — binary schema, batch shapes, partition-parallel extraction, the
  * query surface — is real, tested, and oracle-checked. A real decoder
  * drops in at the marked seam (mapPartitions over the binary column
  * with a native lib, one batch per partition, no driver involvement).
  *
  * The binary payloads themselves are derived deterministically from
  * `documents.text` (UTF-8 bytes), since the driver testdata ships no
  * media table.
  */
object Multimodal {

  /** The media table: binary payload + metadata, the schema a real
    * ingest would carry. */
  def media(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      // metadata a real pipeline would attach at ingest:
      struct(
        length(col("text")).cast("long").as("n_bytes"),
        col("source").as("origin")).as("meta"))

  /** Stub format sniff: FIRST BYTE of the binary payload mod 3 → a
    * modality bucket (in place of a real magic-number table). The byte
    * is read from the hex rendering (`conv` base 16 → 10), NEVER via
    * `payload.cast("string")`: a cast decodes UTF-8 and real media
    * bytes (0x80-0xFF leads, invalid sequences → replacement chars)
    * would collapse distinct leading bytes onto one modality. The
    * DuckDB oracles derive the identical byte from hex(encode(text)).
    * OperatorSpec pins the non-UTF8 case. */
  private[graft] def modality(payload: Column): Column = {
    val b0 = conv(substring(hex(payload), 1, 2), 16, 10).cast("int")
    when(b0 % 3 === 0, "image").when(b0 % 3 === 1, "audio").otherwise("video")
  }

  /** m01: metadata + format sniff over the binary column — byte length,
    * leading magic bytes as hex, and the deterministic (stub) modality
    * tag ([[modality]]). */
  def m01BinaryMeta(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir).select(
        col("media_id"),
        col("meta.n_bytes").as("n_bytes"),
        substring(hex(col("payload")), 1, 8).as("magic_hex"),
        modality(col("payload")).as("modality"))
      .orderBy("media_id")

  /** m02: feature extraction — 8-dim vector per payload, exploded to
    * (media_id, dim, val) rows. [[fakeFeature]] is the decode stub; a
    * real embedding model replaces exactly that expression. */
  def m02Features(spark: SparkSession, dir: String): DataFrame = {
    // >>> DECODE STUB: byte i (1-based) scaled to [0,1); a real decoder
    // >>> would decode pixels/samples here instead of reading raw bytes.
    def fakeFeature(i: Int) =
      round((ascii(substring(col("payload").cast("string"), i, 1)) % 256) / 255.0, 4)
    val dims = (1 to 8).map(i => struct(lit(i.toLong).as("dim"), fakeFeature(i).as("val")))
    media(spark, dir)
      .select(col("media_id"), explode(array(dims: _*)).as("f"))
      .select(col("media_id"), col("f.dim").as("dim"), col("f.val").as("val"))
      .orderBy("media_id", "dim")
  }

  /** The decoder seam: a real media decoder (JNI/native lib) implements
    * this signature — one call per PARTITION, receiving an iterator of
    * (id, payload) so the implementation can batch into whatever shape
    * the underlying library wants (contiguous buffers, GPU batches).
    * The default is the deterministic byte-derived fake used everywhere
    * in this container (no media libraries available).
    */
  type BatchDecoder = Iterator[(Long, Array[Byte])] => Iterator[(Long, Array[Float])]

  /** >>> DECODE STUB — deterministic fake: 8 floats from the first 8
    * bytes. Replace with a real decoder at deployment. */
  val fakeDecoder: BatchDecoder = batch =>
    batch.map { case (id, bytes) =>
      id -> Array.tabulate(8)(i =>
        if (i < bytes.length) (bytes(i) & 0xff) / 255.0f else 0.0f)
    }

  /** Partition-parallel decode through the seam: mapPartitions keeps
    * the batch shape (one decoder call per partition, streaming
    * iterator in/out — no per-row library setup, no driver transfer).
    */
  def decodeFeatures(spark: SparkSession, dir: String,
      decoder: BatchDecoder = fakeDecoder): DataFrame = {
    import spark.implicits._
    media(spark, dir)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(decoder)
      .toDF("media_id", "features")
  }

  private val FrameBytes = 16
  private val SampleEvery = 4

  /** m03: frame sampling — every 4th 16-byte "frame" of the payload,
    * with its offset and a hex prefix (the shape a video keyframe
    * sampler produces: one row per sampled frame, partition-parallel).
    */
  def m03FrameSample(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir)
      .select(col("media_id"), col("payload"),
        // floor() because Column `/` is fractional division in both
        // engines (and DuckDB CAST(double AS BIGINT) ROUNDS, not truncates)
        explode(sequence(lit(0L),
          floor((col("meta.n_bytes") - 1) / lit(16.0)).cast("long"),
          lit(SampleEvery.toLong))).as("frame_no"))
      .select(col("media_id"),
        col("frame_no").cast("long").as("frame_no"),
        (col("frame_no") * FrameBytes).cast("long").as("offset"),
        // frame prefix sliced from the hex rendering (2 hex chars/byte):
        // DuckDB 1.0 has no BLOB substring, so both engines slice hex
        hex(col("payload")).substr(
          (col("frame_no") * (FrameBytes * 2) + 1).cast("int"), lit(8))
          .as("frame_hex"))
      .orderBy("media_id", "frame_no")

  /** m04: exact MEDIA dedup census — the multimodal face of d01: blobs
    * are identical iff their content hash is, so the census is one
    * map-side md5 over the binary column + a per-modality aggregate
    * (count-distinct over fixed-width hashes shuffles 16 bytes/row, not
    * payloads — the property that matters when payloads are megabytes).
    * md5 here is a CONTENT FINGERPRINT, not security material, chosen
    * because both engines compute the identical hex for the same bytes
    * (xxhash64 would be cheaper but is Spark-only, and the gate needs
    * cross-engine equality). */
  def m04MediaDedup(spark: SparkSession, dir: String): DataFrame = {
    media(spark, dir)
      .select(modality(col("payload")).as("modality"), md5(col("payload")).as("h"))
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_media"),
        countDistinct(col("h")).as("n_distinct"),
        (count(lit(1)) - countDistinct(col("h"))).as("n_dupes"))
      .orderBy("modality")
  }

  /** The oracle-side twin of [[modality]]: first PAYLOAD BYTE (not
    * code point — ascii() would diverge on non-ASCII text) decoded
    * from the hex rendering, DuckDB having no BLOB substring or conv:
    * two hex digits → value via strpos on the digit alphabet. */
  private val modalitySql: String = {
    def digit(i: Int) =
      s"(strpos('0123456789ABCDEF', substring(hex(encode(text)), $i, 1)) - 1)"
    s"CASE (${digit(1)} * 16 + ${digit(2)}) % 3 " +
      "WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
  }

  val oracles: Map[String, String] = Map(
    "m04_media_dedup" ->
      (s"SELECT $modalitySql AS modality, " +
        "count(*) AS n_media, count(DISTINCT md5(text)) AS n_distinct, " +
        "count(*) - count(DISTINCT md5(text)) AS n_dupes " +
        "FROM documents GROUP BY modality ORDER BY modality"),
    "m01_binary_meta" ->
      ("SELECT doc_id AS media_id, CAST(length(text) AS BIGINT) AS n_bytes, " +
        "substring(hex(encode(text)), 1, 8) AS magic_hex, " +
        s"$modalitySql AS modality FROM documents ORDER BY media_id"),
    "m02_media_features" ->
      ("SELECT doc_id AS media_id, dim, round((ascii(substring(text, dim, 1)) % 256) / 255.0, 4) AS val " +
        "FROM documents, (SELECT unnest(range(1, 9)) AS dim) ORDER BY media_id, dim"),
    "m03_frame_sample" ->
      ("SELECT doc_id AS media_id, CAST(frame_no AS BIGINT) AS frame_no, " +
        "CAST(frame_no * 16 AS BIGINT) AS offset, " +
        "substring(hex(encode(text)), frame_no * 32 + 1, 8) AS frame_hex " +
        "FROM (SELECT doc_id, text, unnest(range(0, CAST(floor((length(text) - 1) / 16.0) AS BIGINT) + 1, 4)) AS frame_no " +
        "FROM documents) ORDER BY media_id, frame_no")
  )
}
