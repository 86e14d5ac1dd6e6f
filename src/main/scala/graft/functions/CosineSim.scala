package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Cosine similarity over two `array<double>` columns as a native Catalyst
  * expression WITH whole-stage codegen. The declarative alternative
  * (`aggregate(zip_with(a, b, _*_), ...)`) keeps the PLAN codegen'd but
  * evaluates the lambda per element through interpreted
  * HigherOrderFunction machinery (one boxed NamedLambdaVariable write per
  * element); this expression is one tight primitive loop per row, emitted
  * as a static call inside the surrounding generated function.
  *
  * Numerics are kept bit-identical to the previous formulation AND the
  * DuckDB oracle (`list_dot_product` based): left-to-right double
  * accumulation of dot/normA/normB, then `dot / (sqrt(na) * sqrt(nb))`.
  *
  * CORRUPT-EMBEDDING CONVENTION: a NaN result (zero-norm vector — 0/0 —
  * or a NaN-poisoned element, both real artifacts of a failed embedder
  * at crawl scale) is mapped to 0.0, "no similarity". Unguarded, the
  * NaN would WIN every descending top-k: Spark's double ordering places
  * NaN above every real value, so one zero vector in a 100 TB corpus
  * would outrank the genuine nearest neighbor of EVERY query (and pass
  * no `>= t` threshold on the near-dup path — the two consumers would
  * silently disagree). 0.0 keeps corrupt vectors out of top-ks and
  * below every meaningful threshold on all consumers at the cost of one
  * isNaN test per pair. Fixture embeddings are finite and non-zero, so
  * the DuckDB-oracle comparison is unaffected.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineSim.cosine($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}

object CosineSim {
  /** Static entry the generated code calls — primitive reads, no boxing. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val r = dot / (math.sqrt(na) * math.sqrt(nb))
    // zero-norm (0/0) or NaN-poisoned input → "no similarity" (see the
    // corrupt-embedding convention in the class scaladoc)
    if (java.lang.Double.isNaN(r)) 0.0 else r
  }

  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CosineSim(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs.head, exprs(1)), "built-in")
}
