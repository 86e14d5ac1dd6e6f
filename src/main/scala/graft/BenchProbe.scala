package graft

import graft.pipeline.FilterPipeline
import org.apache.spark.sql.SparkSession

/** Scaling diagnostics (not part of the per-round bench): decomposes one
  * pipeline measurement at local[k] into fixed per-job overhead vs
  * data-proportional work by timing the SAME plan at several input sizes
  * in one JVM. Prints one line per size:
  * `PROBE <k> <rows> <t1> <t2> ...`.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val k = args(0).toInt
    val path = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val sizes: Seq[Long] =
      if (args.length > 3) args(3).split(",").map(_.toLong).toSeq
      else Seq(10000L, 0L) // 0 = full input

    val spark = SparkSession.builder()
      .master(s"local[$k]")
      .appName(s"graft-probe-$k")
      .config("spark.sql.shuffle.partitions", (k * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val bc = spark.sparkContext.broadcast(graft.train.FixtureCorpus.model)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val pages = spark.read.parquet(path)
    // warmup
    noop(FilterPipeline.run(spark, pages.limit(50000), bc))

    sizes.foreach { n =>
      // materialize the slice as its own parquet (tmpfs) so the measured
      // plan has the SAME shape as the full run — a limit() would collapse
      // to one partition and distort the probe
      val in =
        if (n == 0L) pages
        else {
          val p = s"/dev/shm/graft-probe-$n"
          pages.limit(n.toInt).repartition(32)
            .write.mode("overwrite").parquet(p)
          spark.read.parquet(p)
        }
      val rows = if (n == 0L) pages.count() else n
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        noop(FilterPipeline.run(spark, in, bc))
        (System.nanoTime() - t0) / 1e9
      }
      println(s"PROBE $k $rows ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
