package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Distributed language-ID surface: the broadcast-model detector must
  * produce correct labels from inside Spark partition tasks — including
  * supplementary-plane scripts, whose membership masks come from the
  * lock-free block cache (ScriptLang.suppBlock) under concurrent
  * first-touch from multiple executor threads.
  */
class LangOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("detect_lang SQL UDF labels BMP and supplementary-plane text across partitions") {
    import spark.implicits._
    LangOps.registerSql(spark)
    // duplicated rows × 4 partitions: several tasks race the first touch
    // of the same supplementary blocks
    val rows = Seq(
      ("eng", "the house of the people"),
      ("rus", "хороший день сегодня"),
      ("eng_Dsrt", "𐐐𐐯𐑊𐐬"), // Deseret letters
      ("peo", "𐎠𐎡𐎢"),                 // Old Persian
      ("hmn_Hmng", "𖬀𖬁𖬂")             // Pahawh Hmong
    )
    val df = spark.createDataset(
      (1 to 8).flatMap(_ => rows)).toDF("expected", "text")
      .repartition(4)
    df.createOrReplaceTempView("langops_smoke")
    val bad = spark.sql(
      "SELECT expected, detect_lang(text)._1 AS got FROM langops_smoke")
      .where("expected != got").collect()
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("detect_lang UDF builds one Detector per thread, not per task or row") {
    import graft.lang.Detector
    LangOps.registerSql(spark)
    val nRows = 4000
    // 64 partitions × 3 repeat queries = 192 tasks: a per-TASK pool miss
    // (the r6 regression — each task deserializes its own Broadcast
    // wrapper, so identity-keyed pools never hit) constructs ≥ 192
    // detectors here; the id-keyed pool constructs at most one per live
    // executor thread for the whole block. The old 8-partition/≤16 bound
    // could not tell those apart (ADVICE r6).
    spark.range(nRows.toLong)
      .selectExpr("concat('the house of the people number ', id) AS text")
      .repartition(64)
      .createOrReplaceTempView("langops_alloc")
    // warm once so ThreadLocals for the pool exist on live threads
    spark.sql("SELECT count(detect_lang(text)._1) FROM langops_alloc").collect()
    val before = Detector.constructed.get()
    (1 to 3).foreach { _ =>
      spark.sql("SELECT count(detect_lang(text)._1) FROM langops_alloc").collect()
    }
    val made = Detector.constructed.get() - before
    // warm thread-locals: 0 expected; allow stragglers from fresh task
    // threads (the suite may share a wider context than local[4]), but
    // stay strictly under one-per-task
    assert(made <= 32, s"UDF constructed $made Detectors across 192 tasks " +
      "(per-task pool misses?)")
  }
}
