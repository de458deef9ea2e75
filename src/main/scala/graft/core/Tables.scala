package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Central table readers for the driver testdata (TESTDATA.md).
  *
  * `events.parquet` has shipped with two `ts` layouts across driver
  * generations, and readers must accept both:
  *
  *  - INT64 TIMESTAMP(NANOS), which Spark's parquet reader rejects
  *    outright (PARQUET_TYPE_ILLEGAL) — the scan fails even for queries
  *    that prune `ts` away, because schema conversion covers the whole
  *    footer. We read nanos as long
  *    (`spark.sql.legacy.parquet.nanosAsLong`) and rebuild a proper
  *    timestamp at microsecond precision. DuckDB keeps full nanos;
  *    every oracle-checked output only ever exposes second-level
  *    buckets or formatted strings, so the truncation is invisible to
  *    the correctness gate.
  *  - TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads as
  *    TIMESTAMP_NTZ. All graft sessions pin
  *    `spark.sql.session.timeZone=UTC`, so casting to the instant type
  *    preserves the wall-clock value DuckDB sees — and keeps every
  *    downstream operator (watermarks, `window()`, `date_format`) on
  *    the same TimestampType they were built against.
  *
  * Either way the contract out of this reader is the same: `ts` is
  * TimestampType at microsecond precision.
  */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        // nanos layout. `ts div 1000`, NOT `ts / 1000`: Spark's `/` is
        // double division and epoch nanos (~1.7e18) exceed double's
        // 53-bit exact range, so the truncated quotient can land 1us
        // below floor(ts/1000) — `div` stays in integer space.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      // already the contract type — nothing to transform
      case TimestampType => raw
      // any third driver-generation layout must fail HERE with the
      // observed type, not flow downstream untransformed and break 20
      // tests obscurely (the round-10 NANOS→MICROS drift lesson)
      case other => throw new IllegalStateException(
        s"events.parquet ts has unsupported type $other — " +
          "known layouts: INT64 nanos (LongType via nanosAsLong), " +
          "TIMESTAMP(MICROS) NTZ, TimestampType. Update Tables.events " +
          "(and StreamingOps.readEvents) for the new driver layout.")
    }
  }
}
