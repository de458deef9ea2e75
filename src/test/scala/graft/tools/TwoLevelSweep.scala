package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.array_dot

/** Dev-only crossover measurement for the d12 two-level quantizer (test
  * scope — never ships): at cell counts past d11's flat-quantizer cap
  * (K > 4096) the flat assignment's n·K dot products dominate while the
  * two-level form pays n·(k1+k2) ≈ 2n√K. This tool times BOTH
  * assignment plans over a seeded uniform corpus at a sweep of K, so
  * the d12 scaladoc's cost claim is a measured wall, not arithmetic.
  * Training cost is excluded on both sides (stride seeds, no Lloyd
  * rounds): training scales with the same assignment primitive, so the
  * assignment wall IS the crossover signal.
  * Run: sbt "Test/runMain graft.tools.TwoLevelSweep"; results → NOTES.md.
  */
object TwoLevelSweep {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Seeded centered-uniform corpus (DensitySweep's construction). */
  private def uniform(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).toDF("vec_id")
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(63)), i =>
          (pmod(xxhash64(col("vec_id"), i), lit(2000001L)).cast("double") / 1e6) - lit(1.0))
          .as("e"))
      .withColumn("nrm", sqrt(array_dot(col("e"), col("e"))))

  /** Stride-seed centroids with ids 0..k-1 (the trainedCentroids seed
    * rule, minus Lloyd rounds). */
  private def seeds(all: DataFrame, n: Long, k: Int): DataFrame = {
    val stride = math.max(1L, n / k)
    all.filter(col("vec_id") % stride === 0 && col("vec_id") / stride < k)
      .select((col("vec_id") / stride).cast("int").as("cid"),
        col("e").as("ce"), col("nrm").as("cnrm"))
  }

  /** Deterministic argmax-cosine over the joined candidate rows (the
    * assignCells max_by shape). */
  private def argmax(idCol: String): Column =
    max_by(col(idCol), struct(round(col("cos_c"), 6).as("c"), (-col(idCol)).as("nc")))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val all = uniform(spark, n).localCheckpoint()

    for (k <- Seq(256, 1024, 4096, 8192, 16384)) {
      val k1 = math.ceil(math.sqrt(k.toDouble)).toInt
      val k2 = (k + k1 - 1) / k1
      // flat: n·K dot products against a broadcast of all K centroids
      val (_, tFlat) = time {
        val cents = seeds(all, n, k)
        all.crossJoin(broadcast(cents))
          .withColumn("cos_c", array_dot(col("e"), col("ce")) / (col("nrm") * col("cnrm")))
          .groupBy(col("vec_id")).agg(argmax("cid").as("cid"))
          .write.format("noop").mode("overwrite").save()
      }
      // two-level: n·k1 coarse (broadcast cross) + n·k2 fine (equi-join
      // on the coarse cell) — the d12 assignment shape
      val (_, tTwo) = time {
        val coarseCents = seeds(all, n, k1)
        val coarse = all.crossJoin(broadcast(coarseCents))
          .withColumn("cos_c", array_dot(col("e"), col("ce")) / (col("nrm") * col("cnrm")))
          .groupBy(col("vec_id"))
          .agg(argmax("cid").as("ccid"),
            first(col("e")).as("e"), first(col("nrm")).as("nrm"))
        val wRank = org.apache.spark.sql.expressions.Window
          .partitionBy(col("ccid")).orderBy(col("vec_id"))
        val ranked = coarse
          .withColumn("rk", row_number().over(wRank).cast("long") - 1)
          .withColumn("m", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("ccid"))))
          .withColumn("stride", greatest(lit(1L), expr(s"m div $k2")))
        val fineCents = ranked
          .filter(col("rk") % col("stride") === 0 && expr("rk div stride") < k2)
          .select(col("ccid"), expr("rk div stride").cast("int").as("fcid"),
            col("e").as("ce"), col("nrm").as("cnrm"))
        coarse.join(broadcast(fineCents), Seq("ccid"))
          .withColumn("cos_c", array_dot(col("e"), col("ce")) / (col("nrm") * col("cnrm")))
          .groupBy(col("vec_id"))
          .agg(argmax("fcid").as("fcid"), first(col("ccid")).as("ccid"))
          .write.format("noop").mode("overwrite").save()
      }
      println(f"TWOLEVEL n=$n K=$k k1=$k1 k2=$k2 flat=$tFlat%.2fs twolevel=$tTwo%.2fs " +
        f"ratio=${tFlat / tTwo}%.2f")
    }
    spark.stop()
  }
}
