package graft.operators

import graft.lang.{Detector, DetectorConfig}
import graft.train.FixtureCorpus
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Cross-context detector-pool gate (VERDICT r7 #4 + ADVICE r7): the
  * DetectorPools map is JVM-wide and keyed by broadcast id, and
  * broadcast ids RESTART at 0 per SparkContext — so a JVM hosting
  * successive contexts (local mode, notebooks, test suites) could alias
  * a new context's id onto a dead context's pool and hand out detectors
  * built over the old model. Two defenses exist and both are exercised
  * here: the per-context application-end listener (normal stop), and
  * the synchronous clear when registerSql hooks a NEW context (abnormal
  * stop — listener bus never drained). The poison-injection step also
  * proves the gate is load-bearing: an aliased pool entry under the
  * LIVE id fails the query loudly, so the pre-registerSql injection
  * passing means the clear really ran.
  */
class CrossContextPoolSpec extends AnyFunSuite {

  private def detectOne(spark: SparkSession, text: String): String = {
    import spark.implicits._
    // a 2-partition column query (not a constant) so the pool is hit
    // from task threads, the production shape
    Seq(text, text).toDF("text").repartition(2)
      .selectExpr("detect_lang(text)._1 AS lang")
      .collect().map(_.getString(0)).distinct.mkString(",")
  }

  test("a successor SparkContext never aliases a stale detector pool") {
    // this suite owns the session lifecycle (the GraftExtensionsSpec
    // pattern): stop whatever session the previous suite left so the
    // two-context story is real
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())

    val a = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ctx-a")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val appIdA = a.sparkContext.applicationId
    try {
      LangOps.registerSql(a)
      assert(detectOne(a, "the house of the people") == "eng")
      assert(LangOps.detectorPoolIds.nonEmpty, "pool must exist after a UDF call")
    } finally a.stop()

    // normal stop: the application-end listener clears the pool (stop()
    // drains the bus, but give a slow host a moment)
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (LangOps.detectorPoolIds.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(LangOps.detectorPoolIds.isEmpty,
      s"listener did not clear pools on normal stop: ${LangOps.detectorPoolIds}")

    // abnormal-stop simulation: a dead context's pools were never
    // cleared — they squat under the dead app's key space (the composite
    // key means the low BROADCAST ids alone can no longer collide, so the
    // squatting entries carry the dead context's real appId). Poison
    // throws on first use — if the successor ever aliases one, the query
    // dies loudly.
    def poison: ThreadLocal[Detector] = new ThreadLocal[Detector] {
      override def initialValue(): Detector =
        throw new IllegalStateException("stale pool aliased")
    }
    (0L until 64L).foreach(id =>
      LangOps.injectStalePool(LangOps.detectorPoolKey(appIdA, id), poison))

    val b = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ctx-b")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      LangOps.registerSql(b)
      // the new-context hook cleared synchronously, before any UDF call
      assert(LangOps.detectorPoolIds.isEmpty,
        s"registerSql on a new context must clear stale pools, left: ${LangOps.detectorPoolIds}")
      assert(detectOne(b, "the house of the people") == "eng")
      assert(detectOne(b, "хороший день сегодня") == "rus")

      // ADVICE r8 race: a straggler task thread of the DEAD context
      // re-inserts its pool AFTER the new context's clear. With the
      // composite key the orphan lands under the dead appId — inert; the
      // successor's queries never touch it even though its broadcast id
      // numerically matches the live one.
      val liveBcId = LangOps.broadcastModel(b).id
      LangOps.injectStalePool(LangOps.detectorPoolKey(appIdA, liveBcId), poison)
      assert(detectOne(b, "the house of the people") == "eng",
        "a dead context's post-clear re-insertion must never alias the live pool")

      // load-bearing check: alias the LIVE composite key and the same
      // query fails with the poison — so the clean passes above prove
      // isolation, not that aliasing is harmless
      val liveId = LangOps.detectorPoolKey(b.sparkContext.applicationId, liveBcId)
      LangOps.injectStalePool(liveId, poison)
      val e = intercept[Throwable] { detectOne(b, "the house of the people") }
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("stale pool aliased"))),
        s"expected the poisoned pool to surface, got: $e")

      // restore a working pool under the live id for any later consumer
      LangOps.injectStalePool(liveId, ThreadLocal.withInitial(
        () => new Detector(FixtureCorpus.model, DetectorConfig.default)))
      assert(detectOne(b, "the house of the people") == "eng")
    } finally b.stop()
  }
}
