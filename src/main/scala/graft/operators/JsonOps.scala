package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's query surface (dot-path point lookups,
  * /root/reference/benches/query.rs) hosted on the driver testdata's
  * `events.props` JSON column, once per codec.
  *
  * Every query keeps the JSON machinery inside whole-stage codegen:
  * get_json_object / from_json / variant_get are Spark-native, and the
  * jsonc path uses our own codegen'd Catalyst expressions
  * (JsoncEncodeExpr/JsoncGetExpr — no UDF anywhere). Scans read just
  * the columns they touch, so column pruning reaches the parquet scan.
  */
object JsonOps {

  def events(spark: SparkSession, dir: String): DataFrame =
    graft.core.Tables.events(spark, dir)

  /** Plain-text path get — reference serde lookup (query.rs:30-37). */
  def plainGet(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_id"), get_json_object(col("props"), "$.k").as("k_str"))
      .orderBy("event_id")

  /** Variant (jsonb-role) path get (query.rs:7-21): parse once into the
    * binary self-describing form, then extract without re-parsing. */
  def variantGet(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_id"),
        variant_get(parse_json(col("props")), "$.k", "string").as("k_str"))
      .orderBy("event_id")

  /** jsonc tape get (query.rs:23-28): encode props to the tape, then
    * path-get on the tape — number tokens come back bare, strings would
    * come back quoted (§1.2 semantics). Both steps are native codegen'd
    * expressions fused into one stage (whole-stage CSE evaluates the
    * encode once). */
  def jsoncGet(spark: SparkSession, dir: String): DataFrame = {
    import graft.codecs.JsoncFunctions._
    events(spark, dir)
      .select(col("event_id"), jsonc_encode(col("props")).as("tape"))
      .select(col("event_id"),
        jsonc_get(col("tape.nodes"), col("tape.strings"), col("tape.numbers"), Seq("k"))
          .as("k_str"))
      .orderBy("event_id")
  }

  /** c08: jsonc tape get through ARRAY path segments — documents with a
    * nested array are built deterministically from event columns, tape-
    * encoded, and read back via the numeric-index path ["items","1","q"]
    * (SURVEY §1.3: the reference's corpora include deep arrays —
    * canada.json — and its tape get walks arbitrary nodes). DuckDB
    * replays the same construction + $.items[1].q. */
  def jsoncArrayGet(spark: SparkSession, dir: String): DataFrame = {
    import graft.codecs.JsoncFunctions._
    events(spark, dir)
      .select(col("event_id"),
        concat(lit("{\"items\":[{\"q\":"), (col("event_id") % 7).cast("string"),
          lit("},{\"q\":"), ((col("event_id") + 1) % 7).cast("string"),
          lit("}],\"tag\":\"x\"}")).as("doc"))
      .select(col("event_id"), jsonc_encode(col("doc")).as("tape"))
      .select(col("event_id"),
        jsonc_get(col("tape.nodes"), col("tape.strings"), col("tape.numbers"),
          Seq("items", "1", "q")).as("q1"))
      .orderBy("event_id")
  }

  /** c09-c12: the reference's EP3 correctness assertions as gate
    * queries — the four literal dot-path lookups its query benchmark
    * asserts (/root/reference/benches/query.rs:46-67) over the
    * reference's own corpora (canada/citm_catalog/twitter.json), run
    * through all three codecs ON THE ENCODED FORM. The output keeps
    * each codec's raw token semantics (jsonc returns quoted string
    * tokens — SURVEY §1.2, query.rs:99; plain/variant return bare
    * strings), and the DuckDB oracle is the literal row set — so the
    * driver gate asserts the reference's exact expectations per codec,
    * not just in ScalaTest (round-4 verdict item 2). The corpus files
    * are fixed reference inputs, independent of the sf dir (like the
    * generator's g01, the query is corpus-parameterized, not
    * table-parameterized). */
  private def ep3Suite(spark: SparkSession, file: String, path: Seq[String]): DataFrame = {
    import graft.codecs.Codecs
    val raw = spark.read.option("wholetext", "true")
      .text(s"/root/reference/json/$file.json")
      .select(col("value").as("doc"))
    Seq("plain_json", "variant", "jsonc").map { name =>
      val codec = Codecs(name)
      codec.get(codec.encode(raw), path)
        .select(lit(name).as("codec"), col("result").as("v"))
    }.reduce(_ unionAll _).orderBy("codec")
  }

  def c09CanadaType(spark: SparkSession, dir: String): DataFrame =
    ep3Suite(spark, "canada", Seq("type"))

  def c10CitmArea(spark: SparkSession, dir: String): DataFrame =
    ep3Suite(spark, "citm_catalog", Seq("areaNames", "205705994"))

  def c11CitmTopic(spark: SparkSession, dir: String): DataFrame =
    ep3Suite(spark, "citm_catalog", Seq("topicNames", "324846100"))

  def c12TwitterMaxId(spark: SparkSession, dir: String): DataFrame =
    ep3Suite(spark, "twitter", Seq("search_metadata", "max_id_str"))

  /** Literal-row oracle for one EP3 suite: plain/variant return the
    * bare string, jsonc the quoted token. */
  private def ep3Oracle(expected: String): String =
    s"""SELECT codec, v FROM (VALUES ('jsonc', '"$expected"'), """ +
      s"('plain_json', '$expected'), ('variant', '$expected')) " +
      "AS t(codec, v) ORDER BY codec"

  /** Shredded (variant-role) path: project to typed columns at encode
    * time, filter/aggregate on real columns — Catalyst prunes + pushes. */
  def shreddedAgg(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"), StructType.fromDDL("k INT")).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"))
      .orderBy("event_type")

  /** Typed filter on a shredded field — predicate on the extracted int. */
  def shreddedFilter(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_id"),
        from_json(col("props"), StructType.fromDDL("k INT")).getField("k").as("k"))
      .filter(col("k") >= 90)
      .orderBy("event_id")

  val oracles: Map[String, String] = Map(
    "c01_json_get_plain" ->
      "SELECT event_id, json_extract_string(props, '$.k') AS k_str FROM events ORDER BY event_id",
    "c02_json_get_variant" ->
      "SELECT event_id, json_extract_string(props, '$.k') AS k_str FROM events ORDER BY event_id",
    "c03_jsonc_get" ->
      "SELECT event_id, json_extract_string(props, '$.k') AS k_str FROM events ORDER BY event_id",
    "c08_jsonc_array_get" ->
      ("SELECT event_id, json_extract_string(" +
        "'{\"items\":[{\"q\":' || CAST(event_id % 7 AS VARCHAR) || '},{\"q\":' || " +
        "CAST((event_id + 1) % 7 AS VARCHAR) || '}],\"tag\":\"x\"}', " +
        "'$.items[1].q') AS q1 FROM events ORDER BY event_id"),
    "c04_shred_agg" ->
      ("SELECT event_type, count(*) AS n, CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k, " +
        "round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "c05_shred_filter" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events " +
        "WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 90 ORDER BY event_id"),
    "c09_ep3_canada_type" -> ep3Oracle("FeatureCollection"),
    "c10_ep3_citm_area" -> ep3Oracle("1er balcon central"),
    "c11_ep3_citm_topic" -> ep3Oracle("Formations musicales"),
    "c12_ep3_twitter_max_id" -> ep3Oracle("505874924095815681")
  )
}
