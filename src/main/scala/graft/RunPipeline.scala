package graft

import graft.pipeline.SnapshotStore
import org.apache.spark.sql.SparkSession

/** The deployment entry point: run the resumable quality-filter pipeline
  * over a day-partitioned pages table. This is what `spark-submit` targets
  * on a real cluster (`--class graft.RunPipeline`); in the sandbox it runs
  * under local[*].
  *
  * Usage: runMain graft.RunPipeline <pagesPath> <outRoot> [modelPath]
  *
  *  - pagesPath: parquet of (url, warc_ts, html, text, lang) with `p_date=`
  *    directory partitioning (the Iceberg-hidden-partitioning stand-in)
  *  - outRoot: SnapshotStore root — data/ + snapshots/ manifests; re-runs
  *    skip partitions already committed in the current manifest
  *  - modelPath: ModelIO parquet model (schema-hash checked); defaults to
  *    the deterministic fixture model
  *
  * Cluster-sizing notes encoded here rather than left to the operator:
  * shuffle partitions pinned to 4× parallelism and AQE partition
  * coalescing disabled — the detection kernel is CPU-bound and AQE's
  * 64 MB size-based coalescing otherwise folds its stage to a fraction of
  * the cluster width (measured in round 2; see BENCH.md).
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunPipeline <pagesPath> <outRoot> [modelPath]")
    val pagesPath = args(0)
    val outRoot = args(1)

    val builder = SparkSession.builder()
      .appName("graft-quality-filter")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
    // under spark-submit the master comes from the launcher; default local
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master(s"local[${Runtime.getRuntime.availableProcessors()}]")
                ).getOrCreate()
    if (spark.conf.get("spark.sql.shuffle.partitions") == "200")
      spark.conf.set("spark.sql.shuffle.partitions",
        (spark.sparkContext.defaultParallelism * 4).toString)
    spark.sparkContext.setLogLevel("WARN")

    val model =
      if (args.length > 2) graft.train.ModelIO.load(spark, args(2))
      else graft.train.FixtureCorpus.model
    val bc = spark.sparkContext.broadcast(model)

    val t0 = System.nanoTime()
    val processed = SnapshotStore.runResumable(spark, pagesPath, outRoot, bc)
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      s"""{"processed_partitions":${processed.length},""" +
      s""""partitions":[${processed.map(p => "\"" + p + "\"").mkString(",")}],""" +
      s""""seconds":${math.round(secs * 1000.0) / 1000.0}}""")
    spark.stop()
  }
}
