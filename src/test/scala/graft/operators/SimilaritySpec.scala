package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality gates: both approximate methods (hyperplane-LSH q26, IVF
  * q30) are measured against the EXACT cosine top-1/top-k — without a
  * recall number an ANN operator's correctness is unfalsifiable (the
  * driver's oracle can only row-count them).
  */
class SimilaritySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  /** exact best neighbor (top-1 by cosine, ties → lower id) per vector */
  private lazy val exactBest: Map[Long, Long] = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    emb.as("a").join(emb.as("b"), expr("a.vec_id <> b.vec_id"))
      .select(
        col("a.vec_id").as("id"),
        col("b.vec_id").as("cand"),
        Similarity.cosineCol(col("a.v"), col("b.v")).as("cos"))
      .groupBy($"id")
      .agg(max_by($"cand", struct($"cos", -$"cand")).as("best"))
      .as[(Long, Long)].collect().toMap
  }

  test("q26 LSH ANN: recall@1 >= 0.9 vs exact top-1") {
    import spark.implicits._
    val ann = Similarity.q26LshAnn(spark, sf)
      .select($"vec_id", $"ann_vec_id")
      .as[(Long, Long)].collect().toMap
    // every vector must receive SOME answer (multiprobe guarantees mates)
    assert(ann.size == exactBest.size, s"${ann.size} answered of ${exactBest.size}")
    val hits = exactBest.count { case (id, best) => ann.get(id).contains(best) }
    val recall = hits.toDouble / exactBest.size
    info(s"LSH recall@1 = $recall ($hits/${exactBest.size})")
    assert(recall >= 0.9, s"LSH recall@1 $recall below floor")
  }

  test("q30 IVF ANN: recall@1 >= 0.9 of exact top-1 for the probed queries") {
    import spark.implicits._
    val ann = Similarity.q30IvfAnn(spark, sf)
      .filter($"rnk" === 1)
      .select($"query_id", $"vec_id")
      .as[(Long, Long)].collect().toMap
    assert(ann.nonEmpty)
    val hits = ann.count { case (q, got) => exactBest.get(q).contains(got) }
    val recall = hits.toDouble / ann.size
    info(s"IVF recall@1 = $recall ($hits/${ann.size})")
    assert(recall >= 0.9, s"IVF recall@1 $recall below floor")
  }

  test("q26 bucket width scales with corpus size") {
    assert(Similarity.planesFor(64) == 2)
    assert(Similarity.planesFor(4096) == 6)
    assert(Similarity.planesFor(1L << 40) == 34) // 100 TB-ish row counts stay bounded
  }
}
