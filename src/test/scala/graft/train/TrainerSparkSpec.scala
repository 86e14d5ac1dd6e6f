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

  test("readLineCorpus recovers languages from OpenLID-style flat and sharded layouts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus")
    // flat: <lang>.txt
    java.nio.file.Files.write(dir.resolve("eng.txt"),
      java.util.Arrays.asList("the world", "people know"))
    // sharded: <lang>/part-*.txt
    val deu = java.nio.file.Files.createDirectory(dir.resolve("deu"))
    java.nio.file.Files.write(deu.resolve("part-00000.txt"),
      java.util.Arrays.asList("die welt"))
    java.nio.file.Files.write(deu.resolve("part-00001.txt"),
      java.util.Arrays.asList("leute wissen"))
    // stray non-.txt files inside a shard dir must get lang = "" (dropped),
    // not be silently trained as deu (ADVICE r4). (_SUCCESS-style markers
    // never even reach the reader — Spark's file index hides _ and .
    // prefixed paths — so README.md is the live hazard.)
    java.nio.file.Files.write(deu.resolve("README.md"),
      java.util.Arrays.asList("docs not corpus"))

    val rows = Trainer.readLineCorpus(spark, dir.toString)
      .as[(String, String)].collect().toSet
    assert(rows.filter(_._1.nonEmpty) == Set(
      ("eng", "the world"), ("eng", "people know"),
      ("deu", "die welt"), ("deu", "leute wissen")), rows)
    assert(rows.filter(_._1.isEmpty).map(_._2) == Set("docs not corpus"), rows)

    // the reader's output feeds the trainer directly: same model as the
    // equivalent in-memory corpus
    val viaFiles = Trainer.trainSpark(spark, Trainer.readLineCorpus(spark, dir.toString).toDF("lang", "line"))
      .as[(String, Int, String, Double)].collect().toSet
    val viaMemory = Trainer.trainSpark(spark,
      Seq(("eng", "the world"), ("eng", "people know"),
        ("deu", "die welt"), ("deu", "leute wissen")).toDF("lang", "line"))
      .as[(String, Int, String, Double)].collect().toSet
    assert(viaFiles == viaMemory)
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
