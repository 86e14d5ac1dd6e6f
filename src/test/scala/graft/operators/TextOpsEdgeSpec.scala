package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases the fixture corpus cannot probe: empty / sub-shingle-length
  * documents through q17 (must neither crash nor pair quadratically) and
  * q25's exact tokenization semantics (double spaces, leading/trailing
  * separators, empty text) against the SQL shape the DuckDB oracle uses.
  */
class TextOpsEdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Write a documents.parquet with the schema q17/q25 read. */
  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-edge").toString
    rows.toDF("doc_id", "text")
      .withColumn("source", lit("edge"))
      .withColumn("lang", lit("eng"))
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q17: empty and sub-shingle docs emit no band rows, no pairs, no crash") {
    val near = "the quick brown fox jumps over the lazy dog again and again"
    val dir = docsDir(Seq(
      (1L, ""), (2L, ""), (3L, "ab"), (4L, "abcd"), // un-shingleable
      (10L, near), (11L, near + "!") // one planted near-dup pair
    ))
    val out = TextOps.q17MinHashPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // empty docs pair with nothing (J = 0 < 0.7), planted pair survives
    assert(out == Set((10L, 11L)), s"got $out")
  }

  test("q17 and q18 tolerate null text (null ≡ empty doc)") {
    import spark.implicits._
    val near = "the quick brown fox jumps over the lazy dog again and again"
    val dir = java.nio.file.Files.createTempDirectory("graft-edge-null").toString
    Seq(
      (1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (10L, near), (11L, near + "!")
    ).toDF("doc_id", "text")
      .withColumn("source", lit("edge"))
      .withColumn("lang", lit("eng"))
      .write.parquet(s"$dir/documents.parquet")

    val pairs = TextOps.q17MinHashPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 11L)), s"q17 got $pairs")

    val sims = TextOps.q18SimHash(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(sims.keySet == Set(1L, 2L, 10L, 11L), "q18 keeps a row per doc")
    assert(sims(1L) == 0L && sims(2L) == 0L, "null hashes like the empty doc")
  }

  test("q25 typed map matches the SQL explode shape on separator edge cases") {
    import spark.implicits._
    val dir = docsDir(Seq(
      (1L, ""), // one empty token
      (2L, "a  b"), // double space -> empty middle token
      (3L, " lead"), (4L, "trail "), // boundary separators
      (5L, "x x x y"), (6L, "solo")
    ))
    val got = TextOps.q25Repetition(spark, dir)
      .select($"doc_id", $"repetition_ratio", $"n_words")
      .as[(Long, Double, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap

    // the oracle's shape: explode(split) + two-level aggregate
    val want = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        round(max(col("c")).cast("double") / sum(col("c")), 4).as("r"),
        sum(col("c")).as("n"))
      .as[(Long, Double, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(got == want, s"got $got want $want")
    assert(got(2L)._2 == 3L, "double space must yield an empty middle token")
  }
}
