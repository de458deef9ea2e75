package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** Dev-only recall/cost sweep for s04's Lloyd round count (test scope
  * — never ships): measures recall@5 against the exact s01 top-k and
  * wall time for rounds 0..4, per SF dir, so LloydRounds and the
  * OperatorSpec recall floor are set from measured recall, not
  * guessed (round-7 verdict item 7). Rounds=0 is the raw s03 seed
  * quantizer — the baseline a trained quantizer must beat.
  * Run: sbt "Test/runMain graft.tools.S04Sweep [dir ...]"
  */
object S04Sweep {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    for (dir <- dirs) {
      val exact = pairs(Similarity.s01KnnBrute(spark, dir))
      for (rounds <- 0 to 4) {
        val (got, sec) = time(pairs(Similarity.s04WithRounds(spark, dir, rounds)))
        val recall = exact.intersect(got).size.toDouble / exact.size
        println(f"S04SWEEP dir=$dir rounds=$rounds recall=$recall%.3f wall=$sec%.1fs")
      }
    }
    spark.stop()
  }
}
