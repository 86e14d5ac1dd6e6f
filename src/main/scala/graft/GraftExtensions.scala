package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The library's SparkSessionExtensions installer — the idiomatic way to
  * ship custom Catalyst expressions with a Spark library:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Injects the engine's native codegen expressions into the session's
  * function registry at build time (no temp-function registration needed):
  *  - `fnv_hash64(str)`  — the engine's versioned n-gram/content hash
  *  - `cosine_sim(a, b)` — primitive-loop cosine over array<double>
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  val functions: Seq[(String, ExpressionInfo, FunctionBuilder)] = Seq(
    ("fnv_hash64",
      info("fnv_hash64", "fnv_hash64(str) - versioned 64-bit FNV-1a over code points"),
      (exprs: Seq[Expression]) => graft.functions.FnvHash64(exprs.head)),
    ("cosine_sim",
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two array<double>"),
      (exprs: Seq[Expression]) => graft.functions.CosineSim(exprs.head, exprs(1))),
    ("min_md5_shingle",
      info("min_md5_shingle",
        "min_md5_shingle(str, k) - min md5 over all k-code-point shingles (hex), NULL if shorter than k"),
      (exprs: Seq[Expression]) => graft.functions.MinMd5Shingle(
        exprs.head, exprs(1).eval(null).asInstanceOf[Int]))
  )
}
