package graft.lang

import graft.train.FixtureCorpus
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-level accuracy across ALL modeled languages on HELD-OUT generated
  * text (fresh seed → different word draws than the training corpus). The
  * golden suite checks hand-picked distinctive cases; this measures the
  * systematic confusion structure — a confusable language pair (shared
  * script + overlapping vocabulary) shows up here as a depressed per-pair
  * accuracy long before a user hits it.
  */
class AccuracySpec extends AnyFunSuite {

  test("held-out line accuracy >= 0.97 overall; no modeled language below 0.8") {
    val det = new Detector(FixtureCorpus.model, DetectorConfig.default)
    val perLang = FixtureCorpus.vocab.keys.toSeq.sorted.map { lang =>
      val lines = FixtureCorpus.lines(lang, nLines = 20, seed = 0x0ddba11L)
      val ok = lines.count { l =>
        det.detectTopOneReordered(l).map(ScriptLang.code).contains(lang)
      }
      lang -> (ok.toDouble / lines.size)
    }
    val overall = perLang.map(_._2).sum / perLang.size
    val worst = perLang.sortBy(_._2).take(8)
    info(f"overall held-out accuracy $overall%.4f over ${perLang.size} modeled languages")
    info(s"worst: ${worst.map { case (l, a) => f"$l=$a%.2f" }.mkString(", ")}")
    assert(overall >= 0.97, f"overall $overall%.4f; worst: $worst")
    worst.headOption.foreach { case (l, a) =>
      assert(a >= 0.8, f"$l held-out accuracy $a%.2f — confusable pair or vocab gap")
    }
  }
}
