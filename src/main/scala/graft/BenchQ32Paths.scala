package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: interleaved A/B of q32's default vs escalated cumulative-
  * rank shapes at a given sf dir (both paths forced via the injectable
  * threshold) — the calibration input for Relational.Q32EscalateBytes.
  * Usage: runMain graft.BenchQ32Paths <sfDir> [reps]
  */
object BenchQ32Paths {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(esc: Boolean): Double = {
      val t0 = System.nanoTime()
      noop(graft.operators.Relational
        .q32Stages(spark, sfDir, escalateBytes = if (esc) -1L else Long.MaxValue).result)
      (System.nanoTime() - t0) / 1e9
    }
    // warm both
    time(esc = false); time(esc = true)
    val d = Array.newBuilder[Double]
    val e = Array.newBuilder[Double]
    (1 to reps).foreach { _ => d += time(esc = false); e += time(esc = true) }
    println(f"Q32PATHS $sfDir default=${d.result().map(t => f"$t%.3f").mkString(",")} " +
      f"escalated=${e.result().map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
