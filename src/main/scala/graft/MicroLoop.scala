package graft
/** Sustained single-thread detector loop (60 s) for profiling and for a
  * JIT-converged µs/batch figure that shared-host interference cannot fake
  * low — use alongside BenchSentences' criterion-style groups.
  */
object MicroLoop {
  def main(args: Array[String]): Unit = {
    val seconds = if (args.nonEmpty) args(0).toInt else 60
    val model = graft.train.FixtureCorpus.model
    val det = new graft.lang.Detector(model, graft.lang.DetectorConfig.default)
    val sents = BenchSentences.sentences
    val t0 = System.nanoTime()
    var n = 0L
    while ((System.nanoTime() - t0) < seconds * 1e9.toLong) {
      var i = 0
      while (i < sents.length) { det.detectTopOneRaw(sents(i)); i += 1 }
      n += 1
    }
    println(s"batches=$n us/batch=${(System.nanoTime() - t0) / 1e3 / n}")
  }
}
