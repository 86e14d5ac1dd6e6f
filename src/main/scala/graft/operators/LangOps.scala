package graft.operators

import graft.lang.{Detector, DetectorConfig, PackedModel}
import graft.train.FixtureCorpus
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Language-ID over document tables: the langram-equivalent detector driven
  * from a broadcast model inside a typed partition map — the north_star
  * shape ("language-model tables broadcast rather than joined").
  */
object LangOps {

  @transient private var cached: Broadcast[PackedModel] = _
  @transient private var cachedCtx: org.apache.spark.SparkContext = _

  /** Broadcast the deterministic fixture model once per SparkContext (a
    * cached broadcast from a stopped context must not be reused).
    */
  def broadcastModel(spark: SparkSession): Broadcast[PackedModel] = synchronized {
    val ctx = spark.sparkContext
    if (cached == null || (cachedCtx ne ctx) || ctx.isStopped) {
      cached = ctx.broadcast(FixtureCorpus.model)
      cachedCtx = ctx
    }
    cached
  }

  /** Per-document (lang, confidence): one Detector per partition (reusing
    * its scratch buffers), model shared via broadcast — one copy per
    * executor, exactly like the reference's mmap-shared model
    * (reference: README.md:16-17 → SURVEY.md §4).
    */
  def q21LangId(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bc = broadcastModel(spark)
    Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        val det = new Detector(bc.value, DetectorConfig.default)
        it.map { case (id, text) =>
          val (lang, conf) = det.detectWithConfidence(text)
          (id, lang, math.round(conf * 10000.0) / 10000.0)
        }
      }
      .toDF("doc_id", "lang_detected", "confidence")
  }

  /** One Detector per executor THREAD (not per row, not per task): a
    * Detector carries ~10 registry-sized scratch arrays (~20 KB at 346
    * languages), so the round-3 per-row `new Detector` inside the udf
    * closure cost ~10× the typed-map hot path in allocation alone. The
    * pool is a JVM-WIDE object keyed by broadcast id — a `@transient
    * lazy` field inside the serialized closure was rebuilt per TASK
    * (each task deserializes its own closure), so detectors were never
    * reused across tasks and the "O(threads)" claim held only per task
    * (ADVICE r4). The registry holds one ThreadLocal per broadcast
    * model — one model per context in practice — for the JVM lifetime.
    * LangOpsSpec asserts the construction count stays O(threads) across
    * repeated queries via Detector.constructed.
    */
  private object DetectorPools {
    // WeakHashMap keyed by broadcast IDENTITY (ADVICE r5): the old map
    // keyed by bc.id was never evicted — every context restart broadcasts
    // anew and the stale ThreadLocals (~20 KB of Detector per thread)
    // were retained for the JVM lifetime — and broadcast ids RESTART per
    // context, so a new context's id could alias an old entry. Weak keys
    // evict an entry when its broadcast is GC'd (context stopped + plan
    // dereferenced); the ThreadLocal initializer deliberately captures the
    // MODEL, not the broadcast, so the value never pins its own key (the
    // classic WeakHashMap self-retention trap). Per-call cost is one
    // synchronized lookup — negligible against the µs-scale detection the
    // SQL UDF wraps; the typed-map hot path (q21) never comes through
    // here.
    private val pools = java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[Broadcast[PackedModel], ThreadLocal[Detector]]())
    def get(bc: Broadcast[PackedModel]): Detector = {
      var pool = pools.get(bc)
      if (pool == null) {
        val model = bc.value
        val fresh =
          ThreadLocal.withInitial(() => new Detector(model, DetectorConfig.default))
        val prev = pools.putIfAbsent(bc, fresh)
        pool = if (prev != null) prev else fresh
      }
      pool.get()
    }
  }

  /** Register `detect_lang(text)` for SQL access, returning
    * STRUCT<lang STRING, confidence DOUBLE> (SURVEY.md §2.2 UDF surface).
    * The typed-map path (q21LangId) stays the hot path; this is the
    * SQL-ergonomics wrapper over the same broadcast model.
    */
  def registerSql(spark: SparkSession): Unit = {
    val bc = broadcastModel(spark)
    val f = org.apache.spark.sql.functions.udf { (text: String) =>
      if (text == null) ("und", 0.0)
      else DetectorPools.get(bc).detectWithConfidence(text)
    }
    spark.udf.register("detect_lang", f)
  }

  /** Corpus language profile: detected-language histogram. Confidence is
    * aggregated as an e4 FIXED-POINT SUM (q21 already rounds confidence to
    * 1e-4, so `round(confidence·10⁴)` is an exact integer in any engine):
    * the profile is integer-exact and therefore DuckDB-oracle-able over
    * the dumped q21 output — `round(avg(...), 4)` could flip its last
    * digit across engines on representational ties. avg_conf =
    * conf_sum_e4 / (n_docs·10⁴) when a reader wants it.
    */
  def q23LangProfile(spark: SparkSession, sfDir: String): DataFrame =
    q21LangId(spark, sfDir)
      .groupBy(col("lang_detected"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(round(col("confidence") * 10000).cast("long")).as("conf_sum_e4"))
      .orderBy(col("lang_detected"))
}
