package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosineSimSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("matches the declarative higher-order formulation bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.7, 0.33, 1e-9), Array(-0.5, 0.2, 0.9, 2e3)),
      (Array(1.0, 0.0), Array(0.0, 1.0))
    ).toDF("a", "b")
    val declarative = aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (s, x) => s + x) /
      (sqrt(aggregate(transform($"a", x => x * x), lit(0.0), (s, x) => s + x)) *
        sqrt(aggregate(transform($"b", x => x * x), lit(0.0), (s, x) => s + x)))
    val rows = df.select(
      CosineSim($"a", $"b").as("native"), declarative.as("ho")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
    }
  }

  test("participates in codegen and is SQL-registered") {
    import spark.implicits._
    CosineSim.register(spark)
    val df = Seq((Array(1.0, 2.0), Array(2.0, 4.0))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val v = spark.sql("SELECT cosine_sim(a, b) AS c FROM vecs").head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
    // codegen: the expression must not force interpreted fallback (use a
    // file-backed scan — a local Seq collapses to LocalTableScan with no
    // codegen stage to inspect)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("a"))
    val plan = emb.select(CosineSim($"a", $"a")).queryExecution.executedPlan.toString
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"), plan)
  }

  test("null inputs yield null") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]])).toDF("a", "b")
    assert(df.select(CosineSim($"a", $"b")).head().isNullAt(0))
  }
}
