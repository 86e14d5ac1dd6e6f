package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** The dump-all loop, callable in-process (VerifyLoopSpec drives it to
    * gate the sequential cache handoff across all registered queries).
    * Returns (query, failure-message) per query, failures as Some.
    */
  def dumpAll(spark: SparkSession, sfDir: String, outDir: String): Seq[(String, Option[String])] = {
    new java.io.File(outDir).mkdirs()
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        (name, None)
      } catch { case e: Throwable =>
        (name, Some(s"${e.getClass.getSimpleName} ${e.getMessage}"))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // self-referential oracles (q23 over q21's dump, q28's gate recompute)
    // need the dump directory as an absolute path at SQL-run time
    val absOut = Paths.get(outDir).toAbsolutePath.toString
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__OUT_DIR__", absOut))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    results
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dumpAll(spark, sfDir, outDir).foreach {
      case (name, Some(msg)) => System.err.println(s"[verify] $name failed: $msg")
      case _ => ()
    }
    spark.stop()
  }
}
