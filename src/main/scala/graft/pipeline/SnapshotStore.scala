package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Checkpoint-resumable snapshot writes with per-partition lineage +
  * metrics, emulating Iceberg's atomic snapshot commit (no Iceberg jar in
  * the sandbox — SURVEY.md §7): data files land under `data/`, then a new
  * `manifest-N.json` listing processed input partitions and their metrics
  * is moved into `snapshots/` atomically (write-temp + ATOMIC_MOVE), and
  * `CURRENT` is repointed. A crashed run leaves no visible manifest, so
  * re-running reprocesses only input partitions absent from the current
  * manifest — the north_rule's checkpoint/resume contract.
  */
final class SnapshotStore(root: String) {
  private val dataDir = Paths.get(root, "data")
  private val snapDir = Paths.get(root, "snapshots")
  private val currentPtr = Paths.get(root, "CURRENT")

  Files.createDirectories(dataDir)
  Files.createDirectories(snapDir)

  final case class PartitionEntry(
      partition: String, rows: Long, kept: Long, dataPath: String,
      dropReasons: Map[String, Long] = Map.empty)

  private def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Input partitions already committed in the current snapshot. */
  def committedPartitions(): Set[String] = {
    if (!Files.exists(currentPtr)) return Set.empty
    val manifest = Paths.get(root, Files.readString(currentPtr).trim)
    if (!Files.exists(manifest)) return Set.empty
    // minimal parse: "partition":"<value>"
    val re = """"partition"\s*:\s*"([^"]+)"""".r
    re.findAllMatchIn(Files.readString(manifest)).map(_.group(1)).toSet
  }

  private def nextSnapshotId(): Int = {
    val existing = Files.list(snapDir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("manifest-") =>
        s.stripPrefix("manifest-").stripSuffix(".json").toInt
      }
      .toSeq
    if (existing.isEmpty) 1 else existing.max + 1
  }

  /** Commit new partitions atomically: carries forward the previous
    * manifest's entries, appends the new ones, writes manifest to a temp
    * file and ATOMIC_MOVEs it in, then repoints CURRENT.
    */
  def commit(newEntries: Seq[PartitionEntry], metrics: Map[String, String]): Path = {
    val prev: Seq[String] =
      if (Files.exists(currentPtr)) {
        val m = Paths.get(root, Files.readString(currentPtr).trim)
        if (Files.exists(m)) {
          val re = """\{"partition":[^}]*\}""".r
          re.findAllIn(Files.readString(m)).toSeq
        } else Seq.empty
      } else Seq.empty

    val entriesJson = prev ++ newEntries.map { e =>
      val drops = e.dropReasons.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
      s"""{"partition":${q(e.partition)},"rows":${e.rows},"kept":${e.kept},""" +
        s""""drop_reasons":$drops,"data_path":${q(e.dataPath)}}"""
    }
    val id = nextSnapshotId()
    val metricsJson = metrics.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val json =
      s"""{"snapshot_id":$id,"entries":[${entriesJson.mkString(",")}],"metrics":$metricsJson}"""

    val tmp = Files.createTempFile(snapDir, "manifest-", ".tmp")
    Files.writeString(tmp, json)
    val target = snapDir.resolve(s"manifest-$id.json")
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)

    val ptrTmp = Files.createTempFile(Paths.get(root), "CURRENT-", ".tmp")
    Files.writeString(ptrTmp, s"snapshots/manifest-$id.json")
    Files.move(ptrTmp, currentPtr, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    target
  }

  def dataPath(partition: String): String =
    dataDir.resolve(s"p_date=$partition").toString
}

object SnapshotStore {

  /** Run the filter pipeline over a day-partitioned pages table with
    * resume: input partitions already in the current manifest are skipped;
    * each processed partition's output is written under `data/p_date=…` and
    * committed with row/keep counts (per-partition lineage) in ONE manifest
    * move.
    *
    * Returns the list of partitions processed in THIS run.
    */
  def runResumable(
      spark: SparkSession,
      pagesPath: String,
      outRoot: String,
      model: org.apache.spark.broadcast.Broadcast[graft.lang.PackedModel]
  ): Seq[String] = {
    import spark.implicits._
    val store = new SnapshotStore(outRoot)
    val done = store.committedPartitions()

    val pages = spark.read.parquet(pagesPath)
    val allParts = pages.select($"p_date").distinct().as[String].collect().sorted
    val todo = allParts.filterNot(done)
    if (todo.isEmpty) return Seq.empty

    val entries = todo.map { part =>
      val slice = pages.filter($"p_date" === part)
      val result = FilterPipeline.run(spark, slice, model)
      val out = store.dataPath(part)
      result.write.mode("overwrite").parquet(out)
      // metrics from the written snapshot (read back: single source of truth)
      val written = spark.read.parquet(out)
      val (rows, kept) = {
        val r = written.agg(count(lit(1)), sum(when($"keep", 1L).otherwise(0L))).head()
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      val drops = written.filter(!$"keep")
        .groupBy($"drop_reason").count()
        .as[(String, Long)].collect().toMap
      store.PartitionEntry(part, rows, kept, out, drops)
    }.toSeq

    store.commit(
      entries,
      Map(
        "job" -> "quality_filter",
        "model_hash" -> graft.lang.PackedModel.registryHash.toString,
        "partitions_in_run" -> todo.length.toString
      )
    )
    todo.toSeq
  }
}
