package graft.codecs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tape codec on Spark: encode/decode/get over the 3-buffer tape struct.
  *
  * Physical schema mirrors the reference's flush layout
  * (/root/reference/src/format/jsonc.rs:64-108 — Struct of three Lists):
  * here `struct<nodes: binary, strings: array<string>, numbers:
  * array<double>>` — BinaryType is the Spark-native compact form of
  * List<UInt8>, and unlike the reference we give the fields real names
  * (Spark requires them; SURVEY §1.2 cosmetics note).
  *
  * The three ops are Scala UDFs over [[JsoncTape]] — per-row scalar
  * work with no state, so they parallelize embarrassingly; the plan
  * around them (scan → project → write) stays whole-stage codegen'd.
  * If the bench ever flags the UDF boundary, the upgrade path is a
  * native Catalyst Expression with doGenCode (SURVEY §7 risks).
  */
object JsoncCodec extends JsonCodec {
  val name = "jsonc"

  private val encodeUdf = udf { (doc: String) => JsoncTape.encode(doc) }

  private val decodeUdf = udf {
    (nodes: Array[Byte], strings: Seq[String], numbers: Seq[Double]) =>
      JsoncTape.decode(nodes, strings, numbers)
  }


  def encode(raw: DataFrame): DataFrame =
    raw.select(encodeUdf(col("doc")).as("tape"))
      .select(col("tape.nodes").as("nodes"),
        col("tape.strings").as("strings"),
        col("tape.numbers").as("numbers"))

  def decode(encoded: DataFrame): DataFrame =
    encoded.select(
      decodeUdf(col("nodes"), col("strings"), col("numbers")).as("doc"))

  /** Quoted-token semantics: a string value comes back WITH its JSON
    * quotes (reference benches/query.rs:99). Native codegen'd
    * expression — the promoted form of the original UDF (SURVEY §7's
    * flagged upgrade path). */
  def get(encoded: DataFrame, path: Seq[String]): DataFrame =
    encoded.select(
      JsoncFunctions.jsonc_get(col("nodes"), col("strings"), col("numbers"), path)
        .as("result"))
}
