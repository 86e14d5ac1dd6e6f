package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q19's two physical plans — the per-source local ppjoin (small-group
  * fast path) and the gram-parallel distributed ppjoin (web-scale path) —
  * must produce the IDENTICAL exact-Jaccard pair set. The DuckDB oracle
  * only ever sees the plan the adaptive choice picks (local at test
  * scale), so this spec is what keeps the distributed plan honest.
  */
class JaccardSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("local and distributed q19 plans agree on sf0.001 and sf0.01") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val st = TextOps.q19Stages(spark, sf, 0.3)
      assert(st.usedLocalPlan, s"$sf should take the small-group fast path")
      val local = rows(st.result)
      val dist = rows(st.distResult())
      assert(local == dist,
        s"$sf: local ${local.size} vs dist ${dist.size}; diff=${(local diff dist) ++ (dist diff local)}")
      st.docs.unpersist()
    }
  }

  test("local plan emits ordered pairs with exact jaccard at a lower threshold") {
    // lower threshold => more pairs; checks the prefix/length filters are
    // not over-pruning when many borderline pairs exist
    val st = TextOps.q19Stages(spark, "/root/testdata/sf0.001", 0.15)
    val local = rows(st.result)
    val dist = rows(st.distResult())
    assert(local == dist, s"t=0.15: local ${local.size} vs dist ${dist.size}")
    assert(local.forall { case (a, b, j) => a < b && j >= 0.15 })
    st.docs.unpersist()
  }
}
