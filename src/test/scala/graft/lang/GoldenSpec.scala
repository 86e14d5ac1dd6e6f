package graft.lang

import graft.train.{FixtureCorpus, GoldenFixtures}
import org.scalatest.funsuite.AnyFunSuite

/** E2e golden-corpus parity (FIXTURES.md F2; reference tests/detector.rs):
  * the fixture-trained all-language model must reproduce the reference's
  * expected language per golden case under the same three APIs.
  */
class GoldenSpec extends AnyFunSuite {
  private lazy val model = FixtureCorpus.model
  private lazy val detector = new Detector(model, DetectorConfig.default)

  private def code(o: Option[Int]): String = o.map(ScriptLang.code).getOrElse("<none>")

  test("golden raw cases: detect_top_one_raw + or_none(0) + reordered") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    GoldenFixtures.cases.filter(_._3 == "raw").foreach { case (expected, text, _) =>
      val raw = code(detector.detectTopOneRaw(text))
      val orNone = code(detector.detectTopOneOrNone(text, 0.0))
      val reordered = code(detector.detectTopOneReordered(text))
      if (raw != expected) failures += s"raw '$text': got $raw want $expected"
      if (orNone != expected) failures += s"or_none '$text': got $orNone want $expected"
      if (reordered != expected) failures += s"reordered '$text': got $reordered want $expected"
    }
    assert(failures.isEmpty, s"${failures.size} golden failures:\n${failures.mkString("\n")}")
  }

  test("golden reordered-only cases") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    GoldenFixtures.cases.filter(_._3 == "reordered").foreach { case (expected, text, _) =>
      val got = code(detector.detectTopOneReordered(text))
      if (got != expected) failures += s"reordered '$text': got $got want $expected"
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("determinism under restricted language sets (x100)") {
    GoldenFixtures.determinismCases.foreach { case (text, langs) =>
      val det = new Detector(
        model, DetectorConfig.default.copy(languages = langs.map(ScriptLang.id)))
      val results = (1 to 100).map(_ => det.detectTopOneRaw(text)).toSet
      assert(results.size == 1, s"non-deterministic for $langs on '$text': $results")
    }
  }

  test("invalid inputs stay undetected with the full model") {
    Seq("", " \n  \t;", "3<856%)§").foreach { t =>
      assert(detector.detectTopOneRaw(t).isEmpty, s"'$t'")
    }
  }
}
