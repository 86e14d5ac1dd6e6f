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

  test("O23 fraction exactness: equal reduced fractions give bit-identical logprobs") {
    // the reference groups n-grams by exact GenericFraction before ln
    // (train/src/fraction.rs:10-27); double division of exact integer
    // counts is already value-exact for equal fractions, so the grouping
    // is a serialization concern only (Trainer scaladoc derivation)
    val rng = new FixtureCorpus.Rng(0xf4ac7L)
    (1 to 20000).foreach { _ =>
      val a = 1L + (rng.nextLong() >>> 44) // < 2^20
      val b = 1L + (rng.nextLong() >>> 44)
      val k = 1L + (rng.nextLong() >>> 44)
      val direct = math.log(a.toDouble / b.toDouble)
      val scaled = math.log((a * k).toDouble / (b * k).toDouble)
      assert(java.lang.Double.doubleToLongBits(direct) ==
        java.lang.Double.doubleToLongBits(scaled), s"a=$a b=$b k=$k")
    }
    // spot checks at the trainer's own call shape
    assert(java.lang.Double.doubleToLongBits(math.log(3.0 / 9.0)) ==
      java.lang.Double.doubleToLongBits(math.log(1.0 / 3.0)))
    assert(java.lang.Double.doubleToLongBits(math.log(7.0 / 21.0)) ==
      java.lang.Double.doubleToLongBits(math.log(5.0 / 15.0)))
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
