package graft.train

import graft.lang.{Detector, DetectorConfig, ScriptLang}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Model-scale realism (ROADMAP item 4): fixture models are tiny, so this
  * spec trains a 10× corpus across every vocabulary language, reports the
  * broadcast footprint, and walks ModelIO.prune's size/accuracy curve —
  * the knob a 188-language deployment turns to fit the executor-side
  * model budget.
  */
class ModelScaleSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // 10× the fixture corpus, all vocabulary languages
  private lazy val bigModel =
    ModelIO.trainPacked(FixtureCorpus.corpus(nLinesPerLang = 2000))

  test("10x corpus: broadcast footprint stays executor-friendly, detection holds") {
    val mb = bigModel.footprintBytes / 1e6
    info(f"languages=${bigModel.modeledLangs.length} entries=${bigModel.entryCount} footprint=$mb%.1f MB")
    // vocab-bounded fixtures plateau well under real-model footprints, but
    // the measurement machinery (and its growth vs the 200-line model) is
    // what future larger corpora will reuse
    assert(bigModel.footprintBytes > ModelIO.trainPacked(FixtureCorpus.corpus()).footprintBytes)
    val det = new Detector(bigModel, DetectorConfig.default)
    def top(text: String): String =
      det.detectTopOneReordered(text).map(ScriptLang.code).getOrElse("und")
    assert(top("the people know the world") == "eng")
    assert(top("das wasser ist gut für die leute") == "deu")
    assert(top("kufanya kazi kuhusu watu wengi") == "swh")
  }

  test("prune curve: entries shrink monotonically, accuracy degrades gracefully") {
    import spark.implicits._
    val langs = Seq("eng", "deu", "fra", "spa")
    val corpus = FixtureCorpus.corpus(nLinesPerLang = 300, langs = langs)
      .flatMap { case (l, ls) => ls.map(x => (l, x)) }.toDF("lang", "line")
    val modelDf = Trainer.trainSpark(spark, corpus).cache()

    // held-out phrases: fresh seed → different word draws than training
    val heldOut = langs.flatMap { l =>
      FixtureCorpus.lines(l, 25, seed = 0xbeefL).map(t => (l, t))
    }

    def accuracyAndEntries(topK: Option[Int]): (Double, Long) = {
      val df = topK.map(k => ModelIO.prune(modelDf, k)).getOrElse(modelDf)
      val packed = ModelIO.fromRows(
        df.select($"lang", $"size", $"ngram", $"logprob")
          .as[(String, Int, String, Double)].collect())
      val det = new Detector(packed,
        DetectorConfig.default.copy(languages = langs.map(ScriptLang.id).toSet))
      val ok = heldOut.count { case (l, t) =>
        det.detectTopOneReordered(t).map(ScriptLang.code).contains(l)
      }
      (ok.toDouble / heldOut.size, packed.entryCount)
    }

    val (accFull, nFull) = accuracyAndEntries(None)
    val (acc200, n200) = accuracyAndEntries(Some(200))
    val (acc50, n50) = accuracyAndEntries(Some(50))
    info(f"full: acc=$accFull%.3f entries=$nFull; top200: acc=$acc200%.3f entries=$n200; top50: acc=$acc50%.3f entries=$n50")
    assert(n50 < n200 && n200 < nFull, "prune must shrink the model monotonically")
    assert(accFull >= 0.95, s"unpruned accuracy $accFull")
    assert(acc200 >= 0.9, s"top-200 accuracy $acc200 — prune curve collapsed")
    modelDf.unpersist()
  }

  test("per-size sharded broadcast: shards bounded by one table, assembled model equals packDistributed") {
    import spark.implicits._
    // synthetic model at load-test scale: 5 languages × 6 sizes × 20k
    // entries (120k distinct n-grams, 600k postings) generated
    // distributed — the string/posting volume goes through the same
    // shuffle + toLocalIterator path a multi-GB OpenLID-class model would
    val langs = Vector("eng", "deu", "fra", "spa", "rus")
    val perSize = 20000L
    val rows = spark.range(0, langs.size * 6 * perSize).map { i =>
      val li = (i / (6L * perSize)).toInt
      val rem = i % (6L * perSize)
      val s = (rem / perSize).toInt // 0 = wordgram, 1..5 = char sizes
      val j = rem % perSize
      (langs(li), s, s"sg${s}_$j", -1.0 - (j % 97) * 0.05 - li * 0.01)
    }.toDF("lang", "size", "ngram", "logprob")

    val sharded = ModelIO.packShardedBroadcast(spark, rows)
    val direct = ModelIO.packDistributed(spark, rows)
    val m = sharded.model
    assert(m.entryCount == direct.entryCount)
    assert(m.footprintBytes == direct.footprintBytes)
    assert(m.modeledLangs.sameElements(direct.modeledLangs))
    assert(m.charFloors.sameElements(direct.charFloors))
    assert(m.wordgramFloor == direct.wordgramFloor)

    // posting-level equality on a deterministic probe sample
    for (s <- 0 to 5; j <- 0 until 50) {
      val key = graft.lang.NgramHash.ofString(s"sg${s}_$j")
      val (ta, tb) =
        if (s == 0) (m.wordTable, direct.wordTable)
        else (m.charTables(s - 1), direct.charTables(s - 1))
      val ia = ta.find(key)
      val ib = tb.find(key)
      assert(ia >= 0 && ib >= 0, s"probe sg${s}_$j missing")
      val pa = (0 until ta.lens(ia)).map(k =>
        (ta.postLangs(ta.starts(ia) + k), ta.postProbs(ta.starts(ia) + k)))
      val pb = (0 until tb.lens(ib)).map(k =>
        (tb.postLangs(tb.starts(ib) + k), tb.postProbs(tb.starts(ib) + k)))
      assert(pa == pb, s"postings differ for sg${s}_$j")
    }

    // shard bound: >= 2 non-empty shards and no single broadcast carries
    // the whole table payload — the property that keeps broadcast blocks
    // (and the driver's transient assembly) bounded by ONE table at real
    // model scale
    def payload(t: graft.lang.ProbTable): Long =
      t.keys.length.toLong * 8 + t.postLangs.length.toLong * 2 +
        t.postProbs.length.toLong * 4
    val shardSizes = sharded.tables.map(b => payload(b.value))
    assert(shardSizes.count(_ > 0) == 6)
    assert(shardSizes.max < shardSizes.sum, s"one shard dominates: ${shardSizes.mkString(",")}")

    // executor-side reassembly: the handle serializes into a task closure
    // and lazily assembles the view from the shard broadcasts
    val sh = sharded
    val execCounts = spark.range(0, 8).repartition(4)
      .mapPartitions(_ => Iterator.single(sh.model.entryCount)).collect()
    assert(execCounts.forall(_ == direct.entryCount))
  }

  test("sharded pack handles empty sizes (Han corpus: no wordgrams, bigram max)") {
    import spark.implicits._
    val corpus = FixtureCorpus.corpus(nLinesPerLang = 30, langs = Seq("cmn_Hans"))
      .flatMap { case (l, ls) => ls.map(x => (l, x)) }.toDF("lang", "line")
    val m = ModelIO.packShardedBroadcast(spark, Trainer.trainSpark(spark, corpus)).model
    assert(m.wordTable.size == 0, "Han trains no wordgrams")
    assert(m.charTables(0).size > 0 && m.charTables(1).size > 0)
    assert((2 to 4).forall(m.charTables(_).size == 0), "Han caps at bigrams")
  }
}
