package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The Verify dump-all loop is the one production code path that runs
  * EVERY registered query back-to-back in one session — the sequential
  * twin of ConcurrentHandoffSpec (VERDICT r7 #4): each q19-style call
  * hands its pinned intermediate to the next call's swap, so the loop
  * must never hold more than the single live handoff cache, and a
  * settle release must return the registry to its pre-loop state. A
  * leak here compounds per query at crawl scale (the r4 ADVICE found
  * exactly this class: Verify once accumulated one shingle cache per
  * dumped query).
  */
class VerifyLoopSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def persistedIds(): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("dump-all over every registered query holds at most one handoff cache and settles to zero") {
    val before = persistedIds()
    val out = java.nio.file.Files.createDirectories(java.nio.file.Paths.get(
      s"target/verifyloop-${java.util.UUID.randomUUID().toString.take(8)}"))
      .toAbsolutePath.toString
    try {
      val failures = Verify.dumpAll(spark, "/root/testdata/sf0.001", out)
        .collect { case (name, Some(msg)) => s"$name: $msg" }
      assert(failures.isEmpty, s"dump-all failures:\n${failures.mkString("\n")}")
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/oracle_sql.json")))

      // post-loop: only the LAST swapped-in pin of each handoff operator
      // may remain (q19's shingle cache, q29's trainer gram counts,
      // q39's star forest — a sequential caller's lazy result plan still
      // needs its pin); more than one per operator means a handoff in
      // the loop failed to release. This gate is what caught q29's
      // unowned Dataset cache (`counts.cache()` with no release path —
      // one corpus-sized strand per dump-all).
      val live = persistedIds() -- before
      assert(live.size <= 3, s"dump-all loop stranded handoff caches: $live")

      graft.operators.TextOps.releaseQ19Cache()
      graft.train.Trainer.releaseTrainerCache()
      graft.operators.Clusters.releaseQ39Cache()
      var left = persistedIds() -- before
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (left.nonEmpty && System.nanoTime() < deadline) {
        Thread.sleep(100)
        left = persistedIds() -- before
      }
      assert(left.isEmpty, s"stranded caches after settle release: $left")
    } finally TinyInputs.delete(out)
  }
}
