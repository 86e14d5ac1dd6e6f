package graft.functions

import graft.lang.NgramHash
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's versioned FNV-1a-over-code-points hash as a native Catalyst
  * expression WITH whole-stage codegen (`doGenCode` emits a static call, so
  * the hash participates in the same generated function as the surrounding
  * projections — no UDF boundary, no boxing).
  *
  * This is the same hash the detector/trainer use for n-gram keys
  * (graft.lang.NgramHash), exposed relationally so SQL-side dedup and
  * fingerprinting group on EXACTLY the key the kernel computes — e.g.
  * joining kernel output back to a SQL-side exact-dup table cannot drift.
  */
case class FnvHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    FnvHash64.hashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FnvHash64.hashUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): FnvHash64 =
    copy(child = newChild)
  override def prettyName: String = "fnv_hash64"
}

object FnvHash64 {
  /** Static entry the generated code calls. Iterates code points of the
    * UTF8String without materializing a java.lang.String.
    */
  def hashUtf8(s: UTF8String): Long = {
    val str = s.toString // UTF8String exposes no cheap code-point iterator
    NgramHash.ofString(str)
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      FnvHash64(org.apache.spark.sql.GraftColumnBridge.expression(c)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv_hash64", exprs => FnvHash64(exprs.head), "built-in")
}
