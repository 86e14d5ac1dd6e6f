package graft

import graft.pipeline.FilterPipeline
import org.apache.spark.sql.SparkSession

/** One pipeline measurement in a FRESH JVM (spawned by Bench): the sandbox
  * equivalent of one spark-submit at a given cluster size — no GC/JIT
  * contamination between parallelism levels. Prints one line:
  * `RESULT <k> <seconds>` (best of `reps` timed runs after warmup).
  */
object BenchPipelineRun {
  def main(args: Array[String]): Unit = {
    val k = args(0).toInt
    val path = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3

    val spark = SparkSession.builder()
      .master(s"local[$k]")
      .appName(s"graft-pipeline-$k")
      // 4 waves per core: smaller per-partition sorts + smoother load
      // balancing of the post-shuffle kernel stage
      .config("spark.sql.shuffle.partitions", (k * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      // shuffle.partitions is already sized to the cluster width (k*4);
      // AQE's size-based coalescing (64 MB advisory target) was observed to
      // shrink the post-shuffle kernel stage to ~19 tasks regardless of
      // parallelismFirst, capping the CPU-bound kernel at ~half width.
      // Skew-join splitting stays on; only coalescing is disabled.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // shuffle lives on tmpfs here (see Bench's -Dspark.local.dir):
      // lz4 on a RAM disk is pure CPU overhead on the measured path
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val bc = spark.sparkContext.broadcast(graft.train.FixtureCorpus.model)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    noop(FilterPipeline.run(spark, spark.read.parquet(path).limit(50000), bc))
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      noop(FilterPipeline.run(spark, spark.read.parquet(path), bc))
      (System.nanoTime() - t0) / 1e9
    }
    println(s"RESULT $k ${times.mkString(" ")}")
    spark.stop()
  }
}
