package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must run — not crash — over 0-row tables with
  * the production schemas. At 100 TB this is not a corner case: a
  * partition-pruned read, an over-tight filter, or a fresh ingest date
  * hands every operator an empty input, and a driver-side
  * `collect()(0)` on an empty aggregate or a seeded sample from an
  * empty table kills the job. Row counts are not asserted (an empty
  * corpus trivially yields empty results); the contract is "plans
  * build, jobs run, schema intact".
  */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val emptyDir: String = {
    val src = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("all registered queries run over 0-row tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, emptyDir).collect()
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, s"${failures.size} queries crash on empty input:\n${failures.mkString("\n")}")
  }
}
