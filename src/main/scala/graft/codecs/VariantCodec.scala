package graft.codecs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binary self-describing codec — Spark 4 `VariantType`.
  *
  * Plays the role of the reference's *jsonb* format
  * (/root/reference/src/format/jsonb.rs): encode parses JSON text into a
  * compact binary, path-addressable representation (:29-35), decode
  * serializes back to JSON text (:37-43), and `get` extracts by dot path
  * without re-parsing the text (benches/query.rs:7-21, `get_by_path`).
  *
  * Spark's Variant is the direct architectural analog of JSONB: binary
  * metadata+value encoding, O(log n) field lookup, shredding-aware
  * parquet writes. The physical bytes differ from datafuselabs JSONB —
  * this is capability parity, not byte parity (SURVEY §1.5).
  *
  * Everything is a built-in codegen'd expression; at scale the variant
  * binary also dictionary-encodes in parquet like the reference's Binary
  * column.
  */
object VariantCodec extends JsonCodec {
  val name = "variant"

  def encode(raw: DataFrame): DataFrame =
    raw.select(parse_json(col("doc")).as("v"))

  def decode(encoded: DataFrame): DataFrame =
    encoded.select(to_json(col("v")).as("doc"))

  /** `variant_get` returns the raw JSON-typed value; cast to string for
    * the common "result" surface (reference asserts `as_str`,
    * benches/query.rs:20).
    */
  def get(encoded: DataFrame, path: Seq[String]): DataFrame =
    encoded.select(
      variant_get(col("v"), path.mkString("$.", ".", ""), "string").as("result"))

  /** Reference `flush` with Spark 4 VARIANT SHREDDING pinned ON: the
    * writer infers a shredding schema and materializes typed columns
    * next to the binary (the parquet-standard shredded layout) — the
    * "modern equivalent" of the reference's shredded format (SURVEY
    * §1.5): one write serves both the self-describing and the typed
    * access paths. On read, `variant_get` over the result is rewritten
    * by PushVariantIntoScan into a TYPED column scan with pushed
    * filters — no binary decode on the hot path (pinned in PlanSpec).
    *
    * NOTE (measured, Spark 4.1.2): `writeShredding.enabled` and
    * `inferShreddingSchema` both default to TRUE, so the plain [[flush]]
    * already produces this layout — every "variant" storage ratio in
    * the bench is the shredded layout. This method pins the behavior
    * against environments with different session defaults;
    * [[flushUnshredded]] is the explicit opt-out that writes the pure
    * binary layout (the reference jsonb's true analog), benched as
    * `ratio_unshredded`. Session confs are restored after the write. */
  def flushShredded(encoded: DataFrame, path: String): Unit =
    withShredding(encoded, "true")(graft.core.IO.writeParquetZstd(encoded, path))

  /** Write the variant column UNSHREDDED — one binary value column, no
    * inferred typed columns (see [[flushShredded]] note). */
  def flushUnshredded(encoded: DataFrame, path: String): Unit =
    withShredding(encoded, "false")(graft.core.IO.writeParquetZstd(encoded, path))

  /** NOT thread-safe across writers: this toggles SESSION-level conf
    * around the write, so a concurrent variant parquet write on the
    * same SparkSession could observe the temporary setting. Callers
    * needing concurrent mixed-layout writes should clone the session
    * (`spark.newSession()`) per writer. */
  private def withShredding(encoded: DataFrame, on: String)(body: => Unit): Unit = {
    val conf = encoded.sparkSession.conf
    val keys = Seq("spark.sql.variant.writeShredding.enabled",
      "spark.sql.variant.inferShreddingSchema")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      keys.foreach(conf.set(_, on))
      body
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
