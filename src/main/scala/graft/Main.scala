package graft

import graft.lang.{Detector, DetectorConfig, ScriptLang}
import graft.train.FixtureCorpus

/** CLI demo source/sink (reference O1: src/main.rs:8-32): detect the
  * language of argv (or stdin) text with the fixture model and print the
  * ranked relative probabilities, truncated to 6 rows.
  */
object Main {
  def main(args: Array[String]): Unit = {
    // read stdin as UTF-8 explicitly: the sandbox runs with an unset locale
    // (POSIX C), where the platform default charset would mangle non-ASCII
    val text =
      if (args.nonEmpty) args.mkString(" ")
      else scala.io.Source.fromInputStream(System.in, "UTF-8").getLines().mkString("\n")
    val det = new Detector(FixtureCorpus.model, DetectorConfig.default)
    val top = det.detectTopOneReordered(text).map(ScriptLang.code).getOrElse("<none>")
    println(s"top: $top")
    det.probabilitiesRelative(text).take(6).foreach { s =>
      println(f"  ${ScriptLang.code(s.langId)}%-10s ${s.prob}%.6f")
    }
  }
}
