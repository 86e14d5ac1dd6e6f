package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions installs the engine's native functions") {
    // getOrCreate ignores configs on a pre-existing session (other suites
    // share one per JVM) — stop it so the extensions config truly applies
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val h = spark.sql("SELECT fnv_hash64('alter') AS h").head().getLong(0)
      assert(h == graft.lang.NgramHash.ofString("alter"))
      val c = spark.sql(
        "SELECT cosine_sim(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS c").head().getDouble(0)
      assert(math.abs(c - 1.0) < 1e-12)
    } finally spark.stop()
  }
}
