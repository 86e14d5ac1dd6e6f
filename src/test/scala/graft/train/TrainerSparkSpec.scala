package graft.train

import graft.lang.ScriptLang
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Distributed trainer == in-memory trainer, exactly (the Spark groupBy +
  * prefix/suffix joins must reproduce train/src/training_model.rs:37-64
  * semantics bit-for-bit on the same corpus).
  */
class TrainerSparkSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("trainSpark reproduces trainLocal relative frequencies exactly") {
    import spark.implicits._
    val langs = Seq("eng", "deu")
    val corpus = FixtureCorpus.corpus(nLinesPerLang = 60, langs = langs)

    val df = corpus.flatMap { case (l, ls) => ls.map(x => (l, x)) }.toDF("lang", "line")
    val sparkRows = Trainer.trainSpark(spark, df)
      .as[(String, Int, String, Double)].collect()
      .groupBy(r => (r._1, r._2))
      .map { case (k, v) => k -> v.map(r => r._3 -> r._4).toMap }

    corpus.foreach { case (lang, lines) =>
      val local = Trainer.trainLocal(ScriptLang.id(lang), lines)
      // local idx: 0..4 = uni..five, 5 = word; spark size: 1..5 char, 0 word
      for (size <- 0 to 5) {
        val localMap = if (size == 0) local(5) else local(size - 1)
        val sparkMap = sparkRows.getOrElse((lang, size), Map.empty)
        assert(sparkMap.keySet == localMap.keySet,
          s"$lang size $size: key sets differ " +
            s"(only-spark=${(sparkMap.keySet -- localMap.keySet).take(5)}, " +
            s"only-local=${(localMap.keySet -- sparkMap.keySet).take(5)})")
        localMap.foreach { case (ngram, p) =>
          assert(math.abs(sparkMap(ngram) - p) < 1e-12, s"$lang size $size ngram '$ngram'")
        }
      }
    }
  }

  test("broadcast and shuffle denominator-join paths emit identical fraction rows") {
    import spark.implicits._
    val corpus = FixtureCorpus.corpus(nLinesPerLang = 40, langs = Seq("eng", "fra"))
      .flatMap { case (l, ls) => ls.map(x => (l, x)) }.toDF("lang", "line")
    def rows(maxRows: Long): Set[(String, Int, String, Long, Long)] =
      Trainer.trainSparkFractions(spark, corpus, lowerBroadcastMaxRows = maxRows)
        .selectExpr("lang", "size", "ngram", "cast(freq as long)", "cast(denom as long)")
        .as[(String, Int, String, Long, Long)].collect().toSet
    val viaBroadcast = rows(Long.MaxValue) // (n−1)-gram side broadcast
    val viaShuffle = rows(0L)              // forced above-threshold fallback
    assert(viaBroadcast == viaShuffle,
      s"broadcast ${viaBroadcast.size} vs shuffle ${viaShuffle.size} rows; " +
        s"diff=${(viaBroadcast diff viaShuffle).take(3)} ${(viaShuffle diff viaBroadcast).take(3)}")
  }
}
