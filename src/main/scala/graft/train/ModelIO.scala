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
    val rows = df
      .select($"lang", $"size", $"ngram", $"logprob")
      .as[(String, Int, String, Double)]
      .collect()
    fromRows(rows)
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
