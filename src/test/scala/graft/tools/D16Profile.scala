package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time d16 alone against the 10×-gate planted corpus (the
  * 1000-doc byte-identical boilerplate group that made the posting
  * join quadratic — 809 s in the r13 gate before the identical-text
  * collapse). Run: sbt "Test/runMain graft.tools.D16Profile". */
object D16Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dst = graft.core.IO.scratchDir("graft-d16-profile")
    PlantedCorpus.buildDocs(spark, dst)
    val t0 = System.nanoTime()
    val n = graft.operators.Dedup.d16EditJoin(spark, dst).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"D16PROFILE rows=$n wall=$sec%.1fs")
    spark.stop()
  }
}
