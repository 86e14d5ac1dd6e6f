package graft.train

import graft.lang.{PackedModel, ScriptLang}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model persistence: Parquet instead of the reference's bespoke
  * brotli/encom/rkyv formats (reference: train/src/writer.rs:18-28,
  * src/bin_storage.rs:113-116). Schema:
  *
  * `model(lang STRING, size INT, ngram STRING, logprob DOUBLE)` where size
  * 1..5 = char n-gram length and 0 = wordgram, plus a `schema_hash` column
  * checked at load (the reference's layout-hash check,
  * src/detector/storage.rs:124-126).
  */
object ModelIO {

  /** One output file per (lang, size): `repartition` on the partition
    * columns keeps writes parallel across languages (the old
    * `repartition(1)` funneled the whole model through a single task —
    * fine for fixtures, a serial choke at 188-language scale) while still
    * producing one file per lang directory instead of one per shuffle
    * partition.
    */
  def write(model: DataFrame, path: String): Unit =
    model
      .withColumn("schema_hash", lit(PackedModel.registryHash))
      .repartition(col("lang"), col("size"))
      .write.mode("overwrite")
      .partitionBy("lang")
      .parquet(path)

  /** Load model rows and pack into the broadcast-ready runtime model. */
  def load(spark: SparkSession, path: String): PackedModel = {
    import spark.implicits._
    val df = spark.read.parquet(path)
    val hashes = df.select($"schema_hash").distinct().as[Long].collect()
    require(
      hashes.forall(_ == PackedModel.registryHash),
      s"model schema hash mismatch: ${hashes.mkString(",")} vs ${PackedModel.registryHash}"
    )
    packDistributed(spark, df.select($"lang", $"size", $"ngram", $"logprob"))
  }

  /** Distributed model pack: the postings aggregation — hash each ngram,
    * group by (size, hash), langId-sort, collision-check — runs IN SPARK;
    * the driver streams the finished (size, hash, postings) entries
    * through `toLocalIterator` into pre-sized ProbTable builders. At no
    * point does the driver hold the model ROWS or the ngram STRINGS — its
    * peak footprint is the final primitive arrays (the broadcast payload
    * itself) plus one in-flight partition. This replaces the round-2
    * `collect()`-everything pack, which at 188-language scale (GBs of
    * postings plus a string per ngram) made the driver the chokepoint of
    * O20/O26/O27 (reference: src/detector/storage.rs:40-135 loads via mmap;
    * broadcast-from-aggregated-parquet is the Spark shape of the same
    * step).
    */
  def packDistributed(spark: SparkSession, rows: DataFrame): PackedModel = {
    import spark.implicits._
    val hashed = hashedOf(spark, rows)
    val postings = postingsOf(spark, hashed)
    val dims = dimsOf(spark, postings)

    def builderFor(s: Int) = {
      val (k, p) = dims.getOrElse(s, (0, 0))
      new graft.lang.ProbTable.Builder(k, p)
    }
    val builders = Array.tabulate(6)(builderFor) // index: 0=word, 1..5=char

    // stream: one partition in driver memory at a time
    val it = postings
      .select($"gsize", $"hash", $"n_distinct", $"posts")
      .as[(Int, Long, Long, Array[(Int, Double)])]
      .toLocalIterator()
    while (it.hasNext) {
      val (s, h, nDistinct, posts) = it.next()
      require(nDistinct == 1L, s"ngram hash collision on key $h (size $s)")
      builders(s).add(h, posts.map(_._1), posts.map(_._2))
    }

    val m = metaOf(spark, hashed)

    new PackedModel(
      nLangs = m.nLangs,
      charFloors = m.charFloors,
      wordgramFloor = m.wordgramFloor,
      charTables = Array.tabulate(5)(s => builders(s + 1).result()),
      wordTable = builders(0).result(),
      modeledLangs = m.modeledLangs,
      schemaHash = m.schemaHash,
      stopwordHashes = m.stopwordHashes
    )
  }

  /** (size, hash, lang_id, prob, ngram) rows — the shared front of both
    * pack paths.
    */
  private def hashedOf(spark: SparkSession, rows: DataFrame): DataFrame = {
    import spark.implicits._
    rows
      .as[(String, Int, String, Double)]
      .map { case (lang, size, ngram, prob) =>
        (size, graft.lang.NgramHash.ofString(ngram), ScriptLang.id(lang), prob, ngram)
      }
      .toDF("gsize", "hash", "lang_id", "prob", "ngram")
  }

  /** Postings per (size, hash), langId-sorted (array_sort on the struct
    * orders by lang_id first); countDistinct(ngram) ≠ 1 ⇔ hash collision.
    */
  private def postingsOf(spark: SparkSession, hashed: DataFrame): DataFrame = {
    import spark.implicits._
    hashed
      .groupBy($"gsize", $"hash")
      .agg(
        countDistinct($"ngram").as("n_distinct"),
        array_sort(collect_list(struct($"lang_id", $"prob"))).as("posts"))
  }

  /** Per-size table dimensions for exact pre-allocation (tiny agg). */
  private def dimsOf(spark: SparkSession, postings: DataFrame): Map[Int, (Int, Int)] = {
    import spark.implicits._
    postings
      .groupBy($"gsize")
      .agg(count(lit(1)).as("n_keys"), sum(size($"posts")).as("n_posts"))
      .as[(Int, Long, Long)].collect()
      .map { case (s, k, p) => s -> ((k.toInt, p.toInt)) }.toMap
  }

  /** Everything in the runtime model that is not a ProbTable: per-language
    * floors, wordgram floor, model-derived stopword sets, modeled-language
    * list, schema hash. Small (O(registry) + stopwords).
    */
  final case class ModelMeta(
      nLangs: Int,
      charFloors: Array[Double],
      wordgramFloor: Double,
      modeledLangs: Array[Int],
      schemaHash: Long,
      stopwordHashes: Array[Array[Long]])

  private def metaOf(spark: SparkSession, hashed: DataFrame): ModelMeta = {
    import spark.implicits._
    val uniCounts = hashed.filter($"gsize" === 1)
      .groupBy($"lang_id").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect()
    val n = ScriptLang.count
    val floors = Array.fill(n)(Double.NegativeInfinity)
    uniCounts.foreach { case (lid, c) => floors(lid) = math.log(1.0 / c.toDouble) }
    val maxFloor = floors.max + 0.05
    var i = 0
    while (i < n) { floors(i) -= maxFloor; i += 1 }

    val wfRow = hashed.filter($"gsize" === 0).agg(min($"prob" * 4.0)).head()
    val wordFloor = if (wfRow.isNullAt(0)) 0.0 else math.min(0.0, wfRow.getDouble(0))

    val stopThreshold = math.log(0.01)
    val stopwords = Array.fill(n)(Array.emptyLongArray)
    hashed.filter($"gsize" === 0 && $"prob" >= stopThreshold)
      .groupBy($"lang_id").agg(collect_list($"hash").as("hs"))
      .as[(Int, Array[Long])].collect()
      .foreach { case (lid, hs) =>
        java.util.Arrays.sort(hs)
        stopwords(lid) = hs
      }

    val modeled = hashed.select($"lang_id").distinct().as[Int].collect().sorted
    ModelMeta(n, floors, wordFloor, modeled, PackedModel.registryHash, stopwords)
  }

  /** Per-size-sharded broadcast of a packed model (ROADMAP item 5 /
    * VERDICT r3 #7): ONE Spark broadcast per ProbTable (index 0 =
    * wordgram, 1..5 = char n-gram size) plus one for the small meta, so
    * no single broadcast block carries the whole model — each shard is
    * bounded by the LARGEST TABLE, not the model sum, which is what the
    * torrent distribution and the executor's block manager see at real
    * (multi-GB, 188-language OpenLID-class) model scale. Executors
    * reassemble a PackedModel VIEW lazily on first use; the view shares
    * the shard arrays (no copy).
    */
  final class ShardedModel(
      val meta: org.apache.spark.broadcast.Broadcast[ModelMeta],
      val tables: Array[org.apache.spark.broadcast.Broadcast[graft.lang.ProbTable]])
      extends Serializable {
    @transient private lazy val assembled: PackedModel = {
      val m = meta.value
      new PackedModel(
        nLangs = m.nLangs,
        charFloors = m.charFloors,
        wordgramFloor = m.wordgramFloor,
        charTables = Array.tabulate(5)(s => tables(s + 1).value),
        wordTable = tables(0).value,
        modeledLangs = m.modeledLangs,
        schemaHash = m.schemaHash,
        stopwordHashes = m.stopwordHashes)
    }
    /** The assembled runtime model (lazy per JVM; shards fetched on demand). */
    def model: PackedModel = assembled
  }

  /** Pack model rows and broadcast them per-size-sharded. The six table
    * passes run SEQUENTIALLY: each streams its postings through
    * `toLocalIterator` into a pre-sized builder, broadcasts the finished
    * table, and releases the builder before the next size starts — the
    * driver's transient assembly footprint is bounded by the largest
    * single table (plus one in-flight partition), never the model sum.
    * The shuffled postings are cached (memory-and-disk) across the six
    * filtered passes so the groupBy shuffle runs once.
    */
  def packShardedBroadcast(spark: SparkSession, rows: DataFrame): ShardedModel = {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    val hashed = hashedOf(spark, rows).persist(StorageLevel.MEMORY_AND_DISK)
    val postings = postingsOf(spark, hashed).persist(StorageLevel.MEMORY_AND_DISK)
    val dims = dimsOf(spark, postings)
    val sc = spark.sparkContext

    val tables = new Array[org.apache.spark.broadcast.Broadcast[graft.lang.ProbTable]](6)
    var s = 0
    while (s < 6) {
      val (k, p) = dims.getOrElse(s, (0, 0))
      val b = new graft.lang.ProbTable.Builder(k, p)
      val it = postings.filter($"gsize" === s)
        .select($"hash", $"n_distinct", $"posts")
        .as[(Long, Long, Array[(Int, Double)])]
        .toLocalIterator()
      while (it.hasNext) {
        val (h, nDistinct, posts) = it.next()
        require(nDistinct == 1L, s"ngram hash collision on key $h (size $s)")
        b.add(h, posts.map(_._1), posts.map(_._2))
      }
      tables(s) = sc.broadcast(b.result())
      s += 1
    }

    val meta = sc.broadcast(metaOf(spark, hashed))
    postings.unpersist()
    hashed.unpersist()
    new ShardedModel(meta, tables)
  }

  /** Load model rows from Parquet and broadcast per-size-sharded. */
  def loadShardedBroadcast(spark: SparkSession, path: String): ShardedModel = {
    import spark.implicits._
    val df = spark.read.parquet(path)
    val hashes = df.select($"schema_hash").distinct().as[Long].collect()
    require(
      hashes.forall(_ == PackedModel.registryHash),
      s"model schema hash mismatch: ${hashes.mkString(",")} vs ${PackedModel.registryHash}"
    )
    packShardedBroadcast(spark, df.select($"lang", $"size", $"ngram", $"logprob"))
  }

  /** Pack (lang, size∈{0..5}, ngram, logprob) rows; size 0 = wordgram. */
  def fromRows(rows: Array[(String, Int, String, Double)]): PackedModel = {
    val byLang = rows.groupBy(_._1)
    val models = byLang.toSeq.sortBy(_._1).map { case (lang, rs) =>
      val sizes = Array.fill(6)(Map.empty[String, Double])
      rs.groupBy(_._2).foreach { case (size, group) =>
        val idx = if (size == 0) 5 else size - 1
        sizes(idx) = group.map(r => r._3 -> r._4).toMap
      }
      ScriptLang.id(lang) -> sizes
    }
    PackedModel.fromModels(models)
  }

  /** Prune a model DataFrame: keep the top `topK` n-grams per
    * (lang, size) by probability. The Spark analog of langram_models'
    * "remove model ngrams and recompile so the binary is lighter"
    * (reference: README.md:33) — shrinks the broadcast footprint at a
    * controlled accuracy cost. Window-rank per group, one shuffle.
    */
  def prune(model: DataFrame, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"), col("size"))
      .orderBy(col("logprob").desc, col("ngram"))
    model
      .withColumn("rank_in_group", row_number().over(w))
      .filter(col("rank_in_group") <= topK)
      .drop("rank_in_group")
  }

  /** Train from a fixture corpus entirely on the driver (fast path for
    * tests and for SparkEntry queries that need a deterministic model).
    */
  def trainPacked(corpus: Seq[(String, Seq[String])]): PackedModel =
    PackedModel.fromModels(corpus.map { case (code, lines) =>
      ScriptLang.id(code) -> Trainer.trainLocal(ScriptLang.id(code), lines)
    })
}
