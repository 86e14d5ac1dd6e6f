package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.fuzz.FuzzTables

/** VERDICT r7 #5: the relational surface fuzzed the way FuzzSpec fuzzed
  * the text kernels. Seeded hostile schema-shaped tables (nulls in every
  * survivable column, non-finite doubles, duplicate/orphan keys, empty
  * and full-Unicode strings incl. lone surrogates and NUL, epoch-negative
  * timestamps, ragged embeddings — FuzzTables.Full) are run through the
  * whole query registry, asserting:
  *
  *  - no crash: every query plans and executes (the r6/r7 lesson twice
  *    over — clean testdata keeps green oracles from ever seeing the
  *    hostile region);
  *  - determinism: a second execution over the same tables is
  *    value-identical (catches iteration-order and partition-order
  *    dependence that hostile ties/dup keys would surface);
  *  - schema stability: result schemas do not depend on the data drawn
  *    (two independent seeds produce identical result schemas).
  *
  * q28 is exempt: its input is the self-generated pages corpus
  * (FilterPipeline.runGenerated ignores the table directory), already
  * fuzzed at kernel level by FuzzSpec's page-wrapped hostile bytes.
  *
  * DuckDB value-equality on hostile tables — the other half of the
  * verdict item — cannot run under sbt (DuckDB is driver-side Python
  * only); it is the out-of-band gate: `Test/runMain graft.fuzz.FuzzGen`
  * writes the OracleSafe profile and tools/fuzz_gate.sh replays the
  * driver's Verify + compare_oracle pipeline over it (results recorded
  * in ROADMAP.md). The OracleSafe constraints and the engine-convention
  * probes behind them are documented on FuzzTables.
  */
class RelationalFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val exempt = Set("q28_pipeline_filter")

  private def fuzzDir(seed: Long): String = {
    val dir = s"target/fuzz-tables-$seed-${java.util.UUID.randomUUID().toString.take(8)}"
    FuzzTables.write(spark, seed, dir, FuzzTables.Full)
    dir
  }

  /** Canonical value snapshot: sorted row renderings (row order is not
    * part of any query's contract here; q05-style ordered outputs are
    * still covered because their VALUES must match). */
  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  test("registry is deterministic and crash-free over hostile tables (seed 1)") {
    val dir = fuzzDir(101L)
    try {
      // vacuity guard: the generator must actually have landed hostility
      val docs = spark.read.parquet(s"$dir/documents.parquet").collect()
      assert(docs.exists(_.isNullAt(1)), "no null text generated")
      assert(docs.exists(r => !r.isNullAt(1) && r.getString(1).isEmpty), "no empty text")
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_discount").collect().flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      assert(li.exists(_.isNaN) && li.exists(_.isInfinite), "no non-finite doubles generated")

      val failures = scala.collection.mutable.ArrayBuffer[String]()
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        if (!exempt(name)) {
          try {
            val a = canon(fn(spark, dir).collect())
            val b = canon(fn(spark, dir).collect())
            if (a != b) {
              val diff = a.zip(b).find { case (x, y) => x != y }
              failures += s"$name: NONDETERMINISTIC (${a.size}/${b.size} rows; first diff $diff)"
            }
          } catch {
            case e: Throwable =>
              failures += s"$name: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(300)}"
          }
        }
      }
      assert(failures.isEmpty,
        s"${failures.size} queries fail on hostile tables:\n${failures.mkString("\n")}")
    } finally TinyInputs.delete(dir)
  }

  test("result schemas are data-independent (seed 2 vs seed 1)") {
    val d1 = fuzzDir(202L)
    val d2 = fuzzDir(303L)
    try {
      val failures = scala.collection.mutable.ArrayBuffer[String]()
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        if (!exempt(name)) {
          try {
            val s1 = fn(spark, d1).schema
            val df2 = fn(spark, d2)
            df2.collect() // seed-2 no-crash
            if (s1 != df2.schema)
              failures += s"$name: schema drift\n  seed2=${s1.simpleString}\n  seed3=${df2.schema.simpleString}"
          } catch {
            case e: Throwable =>
              failures += s"$name: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(300)}"
          }
        }
      }
      assert(failures.isEmpty,
        s"${failures.size} queries fail across seeds:\n${failures.mkString("\n")}")
    } finally { TinyInputs.delete(d1); TinyInputs.delete(d2) }
  }
}
