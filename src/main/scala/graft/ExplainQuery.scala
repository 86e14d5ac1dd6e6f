package graft
import org.apache.spark.sql.SparkSession

/** Dev helper: write `.explain("formatted")` of SparkEntry queries to
  * files — the plan evidence the optimization rounds commit under
  * plans/r{N}/. Usage:
  *   runMain graft.ExplainQuery <sfDir> <outDir> <suffix> <q1,q2,...>
  * writes <outDir>/<query>_<suffix>.txt per query.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.split(",").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      println(s"EXPLAINED $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
