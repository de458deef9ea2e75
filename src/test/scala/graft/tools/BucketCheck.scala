package graft.tools

import graft.operators._
import org.apache.spark.sql.SparkSession

/** Dev-only: prints the LSH band-bucket occupancy census at the driver
  * SFs, so the corpus-relative cap (Dedup.bandCap) is verified to sit
  * clear of every real bucket before the gates run. Run:
  * sbt "Test/runMain graft.tools.BucketCheck"
  */
object BucketCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      println(s"== $sf ==")
      Dedup.lshBucketCensus(spark, sf)
        .unionAll(Similarity.s02BucketCensus(spark, sf))
        .show(false)
    }
    spark.stop()
  }
}
