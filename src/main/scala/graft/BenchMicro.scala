package graft

/** Standalone detector micro-bench main (the criterion-shaped measurement
  * Bench embeds) — for iterating on detector-core performance without the
  * full bench. Prints one line per group.
  */
object BenchMicro {
  def main(args: Array[String]): Unit = {
    BenchSentences.run().toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"MICRO $k ${v}%.1f us/batch")
    }
  }
}
