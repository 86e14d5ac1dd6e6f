package graft.train

import graft.lang.{Detector, DetectorConfig, ScriptLang}
import org.scalatest.funsuite.AnyFunSuite

class TrainerSpec extends AnyFunSuite {

  test("relative frequencies: unigram = freq/total, bigram = freq/min(prefix,suffix)") {
    // corpus: single word "aab" twice → unigrams a:4 b:2, total 6
    // bigrams: aa:2 ab:2; aa → 2/min(cnt(a)=4, cnt(a)=4) = 0.5
    //          ab → 2/min(cnt(a)=4, cnt(b)=2) = 1.0
    val m = Trainer.trainLocal(ScriptLang.id("eng"), Seq("aab aab"))
    assert(math.abs(m(0)("a") - math.log(4.0 / 6.0)) < 1e-12)
    assert(math.abs(m(0)("b") - math.log(2.0 / 6.0)) < 1e-12)
    assert(math.abs(m(1)("aa") - math.log(0.5)) < 1e-12)
    assert(math.abs(m(1)("ab") - math.log(1.0)) < 1e-12)
    // wordgrams: "aab" 2/2
    assert(math.abs(m(5)("aab") - math.log(1.0)) < 1e-12)
  }

  test("training word filter drops words with out-of-alphabet chars") {
    // "señor" has ñ — not in the English alphabet → dropped for eng
    val m = Trainer.trainLocal(ScriptLang.id("eng"), Seq("hello señor"))
    assert(m(5).contains("hello") && !m(5).contains("señor"))
    // but kept for Spanish
    val ms = Trainer.trainLocal(ScriptLang.id("spa"), Seq("hola señor"))
    assert(ms(5).contains("señor"))
  }

  test("fixture model separates its languages on held-out phrases") {
    val det = new Detector(FixtureCorpus.model, DetectorConfig.default)
    def top(text: String): String =
      det.detectTopOneReordered(text).map(ScriptLang.code).getOrElse("und")
    assert(top("the people know the world") == "eng")
    assert(top("das wasser ist gut für die leute") == "deu")
    assert(top("la maison est très bon pour les gens") == "fra")
    assert(top("el mundo es bueno para la gente") == "spa")
    assert(top("это хорошо для людей") == "rus")
  }
}
