package graft.train

import graft.lang.{Detector, DetectorConfig, ScriptLang}
import graft.operators.LangOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ModelIOSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("model parquet round-trip preserves detection results") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-model").toString
    val corpus = FixtureCorpus
      .corpus(nLinesPerLang = 80, langs = Seq("eng", "deu", "fra"))
      .flatMap { case (l, ls) => ls.map(x => (l, x)) }
      .toDF("lang", "line")
    ModelIO.write(Trainer.trainSpark(spark, corpus), s"$tmp/model")
    val loaded = ModelIO.load(spark, s"$tmp/model")

    val direct = ModelIO.trainPacked(
      FixtureCorpus.corpus(nLinesPerLang = 80, langs = Seq("eng", "deu", "fra")))

    val cfg = DetectorConfig.default.copy(
      languages = Set("eng", "deu", "fra").map(ScriptLang.id))
    val dLoaded = new Detector(loaded, cfg)
    val dDirect = new Detector(direct, cfg)
    val texts = Seq(
      "the world is good", "das wasser ist gut", "la maison est bon",
      "to know the people and the time", "über die straße")
    texts.foreach { t =>
      assert(
        dLoaded.probabilities(t).toList == dDirect.probabilities(t).toList,
        s"round-trip drift on '$t'")
    }
    // floors and schema hash survive
    assert(loaded.schemaHash == direct.schemaHash)
    assert(loaded.wordgramFloor == direct.wordgramFloor)
  }

  test("pruned model keeps topK per (lang,size) and still detects") {
    import spark.implicits._
    val corpus = FixtureCorpus
      .corpus(nLinesPerLang = 80, langs = Seq("eng", "deu"))
      .flatMap { case (l, ls) => ls.map(x => (l, x)) }
      .toDF("lang", "line")
    val full = Trainer.trainSpark(spark, corpus)
    val pruned = ModelIO.prune(full, topK = 150)
    val counts = pruned.groupBy("lang", "size").count().as[(String, Int, Long)].collect()
    assert(counts.forall(_._3 <= 150))
    assert(pruned.count() < full.count())
    val packed = ModelIO.fromRows(
      pruned.as[(String, Int, String, Double)].collect())
    val det = new Detector(packed, DetectorConfig.default.copy(
      languages = Set("eng", "deu").map(ScriptLang.id)))
    assert(det.detectTopOneReordered("the world is good and the people know")
      .map(ScriptLang.code).contains("eng"))
    assert(det.detectTopOneReordered("das wasser ist gut für die leute")
      .map(ScriptLang.code).contains("deu"))
  }

  test("detect_lang SQL function over the broadcast model") {
    LangOps.registerSql(spark)
    val r = spark.sql(
      "SELECT detect_lang('das wasser ist gut für die leute') AS d").head()
    val s = r.getStruct(0)
    assert(s.getString(0) == "deu")
    assert(s.getDouble(1) > 0.5)
  }
}
