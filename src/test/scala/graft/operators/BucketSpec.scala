package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: pre-partitioned co-located joins — the no-shuffle join path
  * for repeated fact-to-fact joins at 100 TB (SURVEY.md §2.2 join notes).
  */
class BucketSpec extends AnyFunSuite {
  private lazy val spark = {
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the merge path
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("bucketed tables join without any exchange") {
    val sf = "/root/testdata/sf0.001"
    Tables.lineitem(spark, sf)
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bucketed")
    Tables.orders(spark, sf)
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bucketed")

    val joined = spark.table("lineitem_bucketed")
      .join(
        spark.table("orders_bucketed"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed join must not shuffle:\n" + plan)
    assert(joined.count() == 6000L)
  }
}
