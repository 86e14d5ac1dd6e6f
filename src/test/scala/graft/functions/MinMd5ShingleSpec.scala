package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinMd5ShingleSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The declarative reference form the round-2 oracle used (and the
    * DuckDB oracle still uses): min over an explicitly materialized array
    * of shingle md5s. The native expression must match it exactly.
    */
  private def declarative(k: Int) =
    when(length(col("t")) >= k,
      array_min(expr(
        s"transform(sequence(1, length(t) - ${k - 1}), i -> md5(cast(substring(t, i, $k) as binary)))")))
      .otherwise(lit(null).cast("string"))

  test("matches the declarative transform/array_min form, incl. unicode") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alphabets = Seq(
      "abcdefgh \n\t", // ascii
      "äöüßéèñç ", // 2-byte utf-8
      "経済の話です日本語 ", // 3-byte
      "😀😁😂🤣😃 ", // 4-byte (surrogate pairs in java, single cps in utf-8)
      "aä経😀 b" // mixed widths
    )
    val texts = (for {
      a <- alphabets
      len <- Seq(0, 1, 4, 5, 6, 37, 200)
    } yield (1 to len).map(_ => a(rnd.nextInt(a.length))).mkString) ++
      Seq("exact", "exactly6", "ßßßßß", "😀😀😀😀😀")
    val df = texts.toDF("t")
    Seq(3, 5, 8).foreach { k =>
      val rows = df
        .select(col("t"), MinMd5Shingle(col("t"), k).as("native"),
          declarative(k).as("ref"))
        .collect()
      rows.foreach { r =>
        assert(r.get(1) == r.get(2), s"k=$k text='${r.getString(0)}'")
      }
    }
  }

  test("null for short input, null-safe, SQL-registered, codegen") {
    import spark.implicits._
    val df = Seq(Some("abcd"), Some("abcde"), None).toDF("t")
      .withColumn("m", MinMd5Shingle(col("t"), 5))
    val got = df.select("m").collect().map(r => Option(r.getString(0)))
    assert(got(0).isEmpty && got(1).nonEmpty && got(2).isEmpty)
    MinMd5Shingle.register(spark)
    val viaSql = spark.sql("SELECT min_md5_shingle('abcde', 5)").head().getString(0)
    assert(viaSql == got(1).get)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("whole-stage codegen COMPILES (no silent interpreted fallback)") {
    // Regression: the static entry was named `eval`, which clashes with
    // Expression.eval(InternalRow) — Scala suppresses the static forwarder
    // on a name clash, janino failed to resolve the generated call, and
    // Spark silently fell back to the interpreted path. fallback=false
    // turns that silent fallback into a test failure.
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = Seq("abcdefgh").toDF("t")
        .select(MinMd5Shingle(col("t"), 5).as("m")).collect()
      assert(out.head.getString(0).length == 32)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("malformed utf-8 degrades deterministically (no crash)") {
    // truncated 3-byte sequence at end of buffer
    val bad = org.apache.spark.unsafe.types.UTF8String.fromBytes(
      Array[Byte]('a', 'b', 'c', 'd', 0xe6.toByte, 0x97.toByte))
    val once = MinMd5Shingle.evalShingle(bad, 5)
    val twice = MinMd5Shingle.evalShingle(bad, 5)
    assert(once != null && once == twice)
  }
}
