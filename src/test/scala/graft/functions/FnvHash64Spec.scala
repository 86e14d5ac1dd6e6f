package graft.functions

import graft.lang.NgramHash
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FnvHash64Spec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("native expression matches the kernel hash, in codegen and SQL") {
    import spark.implicits._
    val texts = Seq("hello world", "", "überrascht", "a", "経済 の 話")
    val df = texts.toDF("t").withColumn("h", FnvHash64(col("t")))
    val got = df.select("t", "h").as[(String, Long)].collect().toMap
    texts.foreach { t =>
      assert(got(t) == NgramHash.ofString(t), s"'$t'")
    }
    // SQL registration
    FnvHash64.register(spark)
    val viaSql = spark.sql("SELECT fnv_hash64('hello world')").head().getLong(0)
    assert(viaSql == NgramHash.ofString("hello world"))
    // the expression must stay inside whole-stage codegen (no UDF boundary)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }
}
