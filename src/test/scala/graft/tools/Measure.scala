package graft.tools

import graft.operators._
import org.apache.spark.sql.SparkSession

/** Dev-only measurement harness (test scope — never ships): prints the
  * recall / catch-rate numbers the no-oracle invariant queries gate on,
  * so thresholds are set from MEASURED values at the driver's SFs, not
  * guessed. Run: sbt "Test/runMain graft.tools.Measure"
  */
object Measure {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      def pairs(df: org.apache.spark.sql.DataFrame, a: String, b: String) =
        df.select(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(Similarity.s01KnnBrute(spark, sf), "query_id", "neighbor_id")
      val ann = pairs(Similarity.s02AnnLsh(spark, sf), "query_id", "neighbor_id")
      val recall = exact.intersect(ann).size.toDouble / exact.size
      val d03 = pairs(Dedup.d03NgramJaccard(spark, sf), "ida", "idb")
      val d05 = pairs(Dedup.d05SimHash(spark, sf), "ida", "idb")
      val catchRate = d03.intersect(d05).size.toDouble / d03.size
      println(s"MEASURE $sf s02_recall=$recall d05_catch=$catchRate d03_n=${d03.size}")
      // d05 band-cap sensitivity: catch rate at 0.5%/1%/2% cap
      // fractions and uncapped, same floor math as the gate
      val nDocs = graft.core.Tables(spark, sf, "documents").count()
      val sweep = Seq(0.005, 0.01, 0.02).map { frac =>
        val cap = math.max(Dedup.BandBucketFloor, math.ceil(frac * nDocs).toLong)
        val got = pairs(Dedup.d05SimHashCapped(spark, sf, cap), "ida", "idb")
        f"$frac%.3f:${d03.intersect(got).size.toDouble / d03.size}%.3f"
      }.mkString(" ")
      val uncapped = pairs(Dedup.d05SimHashCapped(spark, sf, Long.MaxValue), "ida", "idb")
      println(s"MEASURE $sf d05_catch_by_capfrac $sweep " +
        f"uncapped:${d03.intersect(uncapped).size.toDouble / d03.size}%.3f")
      // why are truth pairs missed? hamming histogram of d03 pairs the
      // UNCAPPED simhash tier missed: hamming > 6 = inherent simhash/
      // Jaccard divergence (no cap or banding change recovers those);
      // hamming <= 6 missed = banding recall loss
      locally {
        import spark.implicits._
        val missed = d03 -- uncapped
        if (missed.nonEmpty) {
          val sigs = graft.core.Tables(spark, sf, "documents")
            .select(org.apache.spark.sql.functions.col("doc_id"),
              graft.functions.functions.simhash64(
                org.apache.spark.sql.functions.col("text")).as("sig"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          val hist = missed.toSeq
            .map { case (a, b) => java.lang.Long.bitCount(sigs(a) ^ sigs(b)) }
            .groupBy(identity).toSeq.sortBy(_._1)
            .map { case (h, xs) => s"$h:${xs.size}" }.mkString(" ")
          println(s"MEASURE $sf d05_missed_hamming_hist $hist (n_missed=${missed.size})")
        } else println(s"MEASURE $sf d05_missed_hamming_hist - (n_missed=0)")
      }
      // s04 recall-vs-Lloyd-rounds curve (0 = raw stride seeds ≈ s03)
      val curve = (0 to 3).map { r =>
        val got = pairs(Similarity.s04WithRounds(spark, sf, r), "query_id", "neighbor_id")
        f"$r:${exact.intersect(got).size.toDouble / exact.size}%.3f"
      }.mkString(" ")
      println(s"MEASURE $sf s04_recall_by_rounds $curve")
    }
    spark.stop()
  }
}
