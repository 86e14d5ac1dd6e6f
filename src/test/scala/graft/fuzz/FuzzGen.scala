package graft.fuzz

import org.apache.spark.sql.SparkSession

/** Writes a seeded hostile table directory for the out-of-band DuckDB
  * fuzz gate (see tools/fuzz_gate.sh):
  *
  *   sbt -batch "Test/runMain graft.fuzz.FuzzGen <seed> <outDir> [full]"
  *
  * Default profile is OracleSafe (DuckDB-comparable — run graft.Verify
  * over the directory, then tools/compare_oracle.py against it, exactly
  * like the driver's correctness gate but on hostile data).
  */
object FuzzGen {
  def main(args: Array[String]): Unit = {
    val seed = args(0).toLong
    val outDir = args(1)
    val profile = if (args.length > 2 && args(2) == "full") FuzzTables.Full
                  else FuzzTables.OracleSafe
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    FuzzTables.write(spark, seed, outDir, profile)
    println(s"FUZZGEN wrote $outDir seed=$seed profile=$profile")
    spark.stop()
  }
}
