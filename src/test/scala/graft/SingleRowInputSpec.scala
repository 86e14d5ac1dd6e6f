package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The n = 1 twin of EmptyInputSpec (VERDICT r6 #7): every registered
  * query must run over SINGLE-ROW tables. One row is a different hazard
  * class from zero rows — samplers must sample from a population of 1
  * (q26/q30 plane and centroid construction), banding must band one
  * document (q17), pair enumeration must enumerate nothing without
  * indexing past the lone element (q19), as-of must find no earlier
  * event (q31), and rank arithmetic must collapse both brackets onto
  * rank 1 (q32 — covered value-wise in PercentileEdgeSpec, covered
  * crash-wise here alongside everything else). Row counts are not
  * asserted; the contract is "plans build, jobs run, schema intact".
  */
class SingleRowInputSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("all registered queries run over 1-row tables") {
    val dir = TinyInputs.write(spark, rows = 1)
    try {
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        try {
          fn(spark, dir).collect()
          None
        } catch {
          case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
        }
      }
      assert(failures.isEmpty,
        s"${failures.size} queries crash on single-row input:\n${failures.mkString("\n")}")
    } finally TinyInputs.delete(dir)
  }
}
