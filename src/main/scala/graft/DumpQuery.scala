package graft
import org.apache.spark.sql.SparkSession

/** Dev helper: dump ONE SparkEntry query at any sf dir for ad-hoc oracle
  * comparison (Verify dumps all 38; this avoids the full sweep when
  * cross-checking a single operator at a larger scale factor).
  * Usage: runMain graft.DumpQuery <sfDir> <outDir> <queryName>
  */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, name) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(outDir)
    spark.stop()
  }
}
