package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NDV-controlled events generator — the Spark job equivalent of the
  * reference's scripts/json-generator.py (template examples/events.json:1-7).
  *
  * Reference semantics preserved:
  *  - payload shape {"name": str, "timestamp": iso, "attributes":
  *    {"event_attributes": float}} with timestamps unique per line and
  *    name/attributes drawn from ceil(ndv*n) distinct values
  *    (json-generator.py:66-79);
  *  - every distinct value appears at least once — the generator
  *    samples "with cover" (json-generator.py:26-39). Here: row i takes
  *    value index i while i < numDistinct, then a hash of i (pmod), so
  *    cover is guaranteed deterministically rather than by shuffling.
  *
  * Spark-first: `spark.range(n)` is an embarrassingly parallel source —
  * at any scale this generates in O(n/cores) with zero shuffle, which
  * is what makes 100 TB-scale benchmarking inputs feasible (SURVEY §7
  * build step 5). Fully seeded/deterministic: same (n, ndv, seed) ⇒
  * byte-identical corpus, independent of partitioning.
  */
object EventsGenerator {

  /** Base timestamp of the corpus: 2024-07-25T00:00:00Z in micros. */
  private val BaseMicros = 1721865600000000L

  def numDistinct(n: Long, ndv: Double): Long = math.ceil(ndv * n).toLong

  /** One NDJSON document per row in column "doc". */
  def generate(spark: SparkSession, n: Long, ndv: Double, seed: Long = 42L): DataFrame = {
    val nd = lit(numDistinct(n, ndv))
    val base = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
    // cover-guaranteeing distinct-value index (see scaladoc)
    def idx(salt: String) =
      when(col("id") < nd, col("id"))
        .otherwise(pmod(xxhash64(lit(salt), col("id"), lit(seed)), nd))
    val name = concat(lit("n"), lower(hex(xxhash64(lit("name-val"), idx("name"), lit(seed)))))
    // value space 1e9 ≫ numDistinct² keeps value-collision probability
    // negligible, so distinct-value counts stay exactly ceil(ndv*n)
    val attr = round(
      pmod(xxhash64(lit("attr-val"), idx("attr"), lit(seed)), lit(1000000000L)) / 1000000.0, 6)
    val ts = date_format(
      timestamp_micros(lit(BaseMicros) + col("id")), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    base.select(
      to_json(struct(
        name.as("name"),
        ts.as("timestamp"),
        struct(attr.as("event_attributes")).as("attributes"))).as("doc"))
  }

  /** Materialize a corpus as NDJSON text files (the reference's on-disk
    * input format, json/ dir) — one part-file per partition, ready for
    * IO.readNdjson. */
  def writeNdjson(spark: SparkSession, path: String, n: Long, ndv: Double,
      seed: Long = 42L): Unit =
    generate(spark, n, ndv, seed).write.mode("overwrite").text(path)

  /** NDV-invariant census of a generated corpus — used both as a
    * SparkEntry query (g01) with a literal oracle and by the bench. */
  def census(spark: SparkSession, n: Long, ndv: Double): DataFrame = {
    val df = generate(spark, n, ndv)
    df.select(
        get_json_object(col("doc"), "$.name").as("name"),
        get_json_object(col("doc"), "$.timestamp").as("ts"),
        get_json_object(col("doc"), "$.attributes.event_attributes").as("attr"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("name")).as("n_names"),
        countDistinct(col("attr")).as("n_attrs"),
        countDistinct(col("ts")).as("n_ts"))
  }

  /** g01 driver query: generator invariants at n=1024, ndv=0.1.
    * numDistinct = ceil(102.4) = 103; timestamps unique per line. */
  def g01(spark: SparkSession, dir: String): DataFrame = census(spark, 1024, 0.1)

  val oracles: Map[String, String] = Map(
    // the invariants are literals by construction (cover guarantee)
    "g01_generator_ndv" ->
      ("SELECT CAST(1024 AS BIGINT) AS n_rows, CAST(103 AS BIGINT) AS n_names, " +
        "CAST(103 AS BIGINT) AS n_attrs, CAST(1024 AS BIGINT) AS n_ts")
  )
}
