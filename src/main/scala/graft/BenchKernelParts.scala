package graft

import graft.lang.{Detector, DetectorConfig, NgramHash, ScriptLang}
import graft.pipeline.{FilterPipeline, PagesGen}
import org.apache.spark.sql.SparkSession

/** Diagnostic (not part of the per-round bench): single-threaded timing of
  * the fused pipeline kernel's components over a sample of generated pages
  * — attributes the kernel stage's cost to detection vs quality loop vs
  * scrub vs hashing. Usage: runMain graft.BenchKernelParts [nDocs]
  */
object BenchKernelParts {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val texts: Array[String] = PagesGen.pagesDf(spark, n)
      .select($"text").as[String].collect()
    spark.stop()

    val model = graft.train.FixtureCorpus.model
    val config = DetectorConfig.default.copy(
      languages = PagesGen.pipelineLangs.map(ScriptLang.id).toSet)
    val det = new Detector(model, config)

    def timed(name: String)(f: => Long): Unit = {
      f // warm
      var best = Long.MaxValue
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        val sink = f
        val dt = System.nanoTime() - t0
        if (dt < best) best = dt
        if (sink == 42L) println("") // defeat DCE
      }
      println(f"KPART $name ${best / 1e9}%.3f s  (${best / 1e3 / texts.length}%.2f us/doc)")
    }

    timed("detect") {
      var acc = 0L
      var i = 0
      while (i < texts.length) { acc += det.detectInPlace(texts(i)); i += 1 }
      acc
    }
    timed("detect+pick+conf") {
      var acc = 0L
      var i = 0
      while (i < texts.length) {
        val nr = det.detectInPlace(texts(i))
        if (nr > 0) {
          val best = det.reorderPickInPlace(det.defaultReorderDistance)
          acc += best + (det.confidenceOfInPlace(best) * 1000).toLong
        }
        i += 1
      }
      acc
    }
    timed("wordfreq_loop") {
      // word-hash frequency + stopword probe over the token buffer
      var acc = 0L
      var i = 0
      while (i < texts.length) {
        det.detectInPlace(texts(i)) // fills the token buffer
        val toks = det.tokens
        val wc = toks.nWords
        var j = 0
        while (j < wc) {
          acc += NgramHash.ofWindow(toks.cps, toks.start(j), toks.len(j))
          j += 1
        }
        i += 1
      }
      acc
    }
    timed("scrub") {
      var acc = 0L
      var i = 0
      while (i < texts.length) { acc += FilterPipeline.scrub(texts(i)).length; i += 1 }
      acc
    }
    timed("text_hash") {
      var acc = 0L
      var i = 0
      while (i < texts.length) { acc += NgramHash.ofString(texts(i)); i += 1 }
      acc
    }
    timed("line_stats") {
      var acc = 0L
      var i = 0
      while (i < texts.length) {
        val text = texts(i)
        var nLines = 1
        var maxLine = 0
        var lineStart = 0
        var j = 0
        while (j <= text.length) {
          if (j == text.length || text.charAt(j) == '\n') {
            val len = j - lineStart
            if (len > maxLine) maxLine = len
            if (j < text.length) { nLines += 1; lineStart = j + 1 }
          }
          j += 1
        }
        acc += nLines + maxLine
        i += 1
      }
      acc
    }
  }
}
