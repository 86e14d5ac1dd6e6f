package graft

import org.apache.spark.sql.SparkSession

/** Tooling main: materialize the distributed-generated pages corpus as
  * parquet for BenchPipelineRun / manual throughput probes.
  * Usage: runMain graft.GenPages [nPages] [outPath]
  */
object GenPages {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1200000L
    val out = if (args.length > 1) args(1) else "/tmp/graft_bench_pages"
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("graft-genpages")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.pipeline.PagesGen.pagesDfDistributed(spark, n)
      .write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
