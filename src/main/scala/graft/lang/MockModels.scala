package graft.lang

/** The hand-built two-language mock model from the reference's unit parity
  * oracle (reference: src/detector/mock_tests.rs:22-93) — hand-picked
  * relative frequencies, stored as ln(prob). FIXTURES.md F1.
  */
object MockModels {
  private def m(pairs: (String, Double)*): Map[String, Double] =
    pairs.map { case (k, v) => k -> math.log(v) }.toMap

  val english: Array[Map[String, Double]] = Array(
    m("a" -> 0.01, "l" -> 0.02, "t" -> 0.03, "e" -> 0.04, "r" -> 0.05, "o" -> 1.0, "k" -> 1.0),
    m("al" -> 0.11, "lt" -> 0.12, "te" -> 0.13, "er" -> 0.14),
    m("alt" -> 0.19, "lte" -> 0.2, "ter" -> 0.21),
    m("alte" -> 0.25, "lter" -> 0.26),
    m("alter" -> 0.29),
    m("alter" -> 0.29)
  )

  val german: Array[Map[String, Double]] = Array(
    m("a" -> 0.06, "l" -> 0.07, "t" -> 0.08, "e" -> 0.09, "r" -> 0.1, "o" -> 1.0),
    m("al" -> 0.15, "lt" -> 0.16, "te" -> 0.17, "er" -> 0.18),
    m("alt" -> 0.22, "lte" -> 0.23, "ter" -> 0.24),
    m("alte" -> 0.27, "lter" -> 0.28),
    m("alter" -> 0.3),
    m("alter" -> 0.3)
  )

  lazy val englishAndGerman: PackedModel = PackedModel.fromModels(
    Seq(ScriptLang.id("eng") -> english, ScriptLang.id("deu") -> german)
  )
}
