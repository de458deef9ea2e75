package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: reproduce m09_cross_modal at the 10x planted-doc scale in
  * a FRESH JVM — isolates the operator's own wall from gate-JVM state
  * (accumulated cache/checkpoint blocks, heap history). args = [reps]. */
object M09Repro {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .appName("graft-m09-repro").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dst = graft.core.IO.scratchDir("graft-m09-repro")
    PlantedCorpus.buildDocs(spark, dst)
    println(s"M09REPRO corpus built at $dst")
    for (rep <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.operators.Multimodal.m09CrossModalSearch(spark, dst)
        .collect().length
      println(f"M09REPRO rep$rep ${(System.nanoTime() - t0) / 1e9}%.1f s rows=$n")
    }
    spark.stop()
  }
}
