package graft.operators

import graft.codecs.Codecs
import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Codec lifecycle as oracle-checked queries: the reference's
  * encode→decode and flush→load round trips (src/codec.rs:21-33)
  * expressed as a census the DuckDB gate can hash — for every codec,
  * every document must survive the trip with its content intact
  * (semantic equality on the extracted field, mirroring the
  * reference's decode-comparison tests, jsonc.rs:178).
  */
object CodecLifecycle {

  private def props(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(col("props").as("doc"))

  /** c06: encode→decode round-trip census per codec — count, sum and
    * NDV of the extracted field over the DECODED documents must equal
    * the same census over the raw inputs (decode may legally normalize
    * whitespace; the content must survive). Join-free: any corruption
    * shifts the sum or the distinct count. */
  def c06RoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val src = props(spark, dir)
    val censuses = Seq("plain_json", "variant", "jsonc").map { name =>
      val codec = Codecs(name)
      val decoded = codec.decode(codec.encode(src))
      decoded.agg(
        lit(name).as("codec"),
        count(lit(1)).as("n_docs"),
        sum(get_json_object(col("doc"), "$.k").cast("long")).as("sum_k"),
        countDistinct(get_json_object(col("doc"), "$.k")).as("n_distinct_k"))
    }
    censuses.reduce(_ union _).orderBy("codec")
  }

  /** c07: flush→load round-trip census per codec — writes each encoded
    * frame to ZSTD parquet, reads it back, decodes, and counts rows +
    * distinct payload values surviving the storage trip. */
  def c07FlushLoad(spark: SparkSession, dir: String): DataFrame = {
    val src = props(spark, dir)
    val tmp = graft.core.IO.scratchDir("graft-flush")
    val censuses = Seq("plain_json", "variant", "jsonc").map { name =>
      val codec = Codecs(name)
      codec.flush(codec.encode(src), s"$tmp/$name")
      val decoded = codec.decode(codec.load(spark, s"$tmp/$name"))
      decoded.agg(
        lit(name).as("codec"),
        count(lit(1)).as("n_docs"),
        countDistinct(get_json_object(col("doc"), "$.k")).as("n_distinct_k"))
    }
    censuses.reduce(_ union _).orderBy("codec")
  }

  /** c13: CSV source/sink ROUNDTRIP — the interchange format the
    * reference's NDJSON/parquet surface doesn't cover, stressed where
    * CSV actually breaks: the `props` column is a JSON string full of
    * commas, quotes and braces, so the write must RFC-4180-quote
    * (quote '"', escape by doubling) and the read must undo it
    * byte-exactly — one mis-escaped quote and `get_json_object`
    * nulls out and the census hash diverges from the oracle (which
    * reads the ORIGINAL parquet: the roundtrip must be invisible).
    * The read runs FAILFAST so a malformed row is an error, never a
    * silent null. 100 TB: plain (uncompressed) CSV stays SPLITTABLE —
    * each file chunks across tasks like parquet row-groups do; gzip
    * CSV would serialize each file onto one core, which is why the
    * sink doesn't write it. CSV remains the interchange tier; parquet
    * is the analytics tier (no stats, no pruning, no column skip
    * here). Precondition: no embedded NEWLINES in field values (the
    * corpus has none) — supporting them needs multiLine=true, which
    * parses whole files single-threaded and gives up splittability;
    * CodecSpec pins the quote/comma/brace cases this mode does own. */
  def c13CsvRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("props"))
    val tmp = graft.core.IO.scratchDir("graft-c13")
    ev.write.mode("overwrite")
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(tmp)
    spark.read
      .schema("event_id BIGINT, event_type STRING, props STRING")
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .option("mode", "FAILFAST")
      .csv(tmp)
      .groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
        countDistinct(get_json_object(col("props"), "$.k")).as("n_distinct_k"))
      .orderBy("event_type")
  }

  /** c14: NDJSON SINK roundtrip — the write half of the §2.1 #1 NDJSON
    * source, completing the interchange tier (parquet c07, CSV c13,
    * NDJSON c14): one JSON object per line via the engine's JSON sink,
    * read back FAILFAST with an explicit schema and censused against
    * the original table. The `props` column is itself a JSON STRING —
    * the writer must embed it as an escaped string value, not splice
    * it as nested JSON, and the reader must return it byte-identical
    * (the census's get_json_object proves the escaping round-tripped).
    * Doubles survive via Jackson's shortest-roundtrip rendering; the
    * census still counts integer cents so the gate never hashes a
    * double. Timestamps are deliberately excluded: the JSON sink's
    * default timestamp format is millisecond-precision and the corpus
    * carries real microseconds — an NDJSON interchange of event times
    * ships unix_micros BIGINTs instead (documented, not silently
    * truncated). Splittable at 100 TB: plain text lines, one object
    * per line. */
  def c14JsonRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"), col("props"))
    val tmp = graft.core.IO.scratchDir("graft-c14")
    ev.write.mode("overwrite").json(tmp)
    spark.read
      .schema("event_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .option("mode", "FAILFAST")
      .json(tmp)
      .groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
        countDistinct(get_json_object(col("props"), "$.k")).as("n_distinct_k"))
      .orderBy("event_type")
  }

  val oracles: Map[String, String] = Map(
    "c14_json_roundtrip" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents, " +
        "CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, " +
        "count(DISTINCT json_extract_string(props, '$.k')) AS n_distinct_k " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "c13_csv_roundtrip" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, " +
        "count(DISTINCT json_extract_string(props, '$.k')) AS n_distinct_k " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "c06_roundtrip" ->
      ("SELECT codec, count(*) AS n_docs, " +
        "CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, " +
        "count(DISTINCT json_extract_string(props, '$.k')) AS n_distinct_k FROM events, " +
        "(SELECT unnest(['jsonc', 'plain_json', 'variant']) AS codec) " +
        "GROUP BY codec ORDER BY codec"),
    "c07_flush_load" ->
      ("SELECT codec, count(*) AS n_docs, " +
        "count(DISTINCT json_extract_string(props, '$.k')) AS n_distinct_k FROM events, " +
        "(SELECT unnest(['jsonc', 'plain_json', 'variant']) AS codec) " +
        "GROUP BY codec ORDER BY codec")
  )
}
