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
  /** Static entry the generated code calls. Decodes code points straight
    * from the UTF8String's bytes — no java.lang.String materialization on
    * the codegen'd path (bit-equal to NgramHash.ofString on valid UTF-8).
    */
  def hashUtf8(s: UTF8String): Long = {
    val n = s.numBytes()
    var h = NgramHash.Seed
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xff
      val w = if (b0 < 0x80) 1 else if (b0 < 0xe0) 2 else if (b0 < 0xf0) 3 else 4
      var cp = 0
      if (i + w > n) {
        // truncated multi-byte sequence at end of buffer (malformed crawl
        // data): UTF8String.getByte is an UNCHECKED Platform read, so
        // running the normal decode would read past the buffer and hash
        // nondeterministically. Degrade deterministically instead: feed
        // the raw lead byte as the code point and stop.
        cp = b0; i = n
      } else if (w == 1) { cp = b0; i += 1 }
      else if (w == 2) {
        cp = ((b0 & 0x1f) << 6) | (s.getByte(i + 1) & 0x3f); i += 2
      } else if (w == 3) {
        cp = ((b0 & 0x0f) << 12) | ((s.getByte(i + 1) & 0x3f) << 6) |
          (s.getByte(i + 2) & 0x3f); i += 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3f) << 12) |
          ((s.getByte(i + 2) & 0x3f) << 6) | (s.getByte(i + 3) & 0x3f); i += 4
      }
      h = NgramHash.step(h, cp)
    }
    if (h == 0L) NgramHash.ZeroRemap else h
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      FnvHash64(org.apache.spark.sql.GraftColumnBridge.expression(c)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv_hash64", exprs => FnvHash64(exprs.head), "built-in")
}
