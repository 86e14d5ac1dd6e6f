package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `min_md5_shingle(text, k)`: the lexicographic minimum of
  * `md5(substring(text, i, k))` over every k-code-point shingle of `text`
  * (1 ≤ i ≤ numChars−k+1), as a lowercase hex string; NULL when the text
  * has fewer than k code points.
  *
  * Semantically identical to the declarative
  * `array_min(transform(sequence(1, length(text)-k+1), i ->
  * md5(cast(substring(text, i, k) as binary))))` — lowercase hex is
  * order-isomorphic to unsigned byte-wise digest comparison, so the min is
  * the same — but computed in ONE streaming pass with a reused digest and
  * a 16-byte running minimum. The declarative form materializes an
  * O(numChars) array of 32-char strings per row before `array_min`: on a
  * 10 MB crawl page that is a ~10M-element string array in one Tungsten
  * row (the round-2 q24 regression, 13.7 s at sf0.1, and an OOM risk at
  * 100 TB); this expression allocates O(k) per row regardless of length.
  *
  * Winnowing-fingerprint shape per Schleimer/Wilkerson/Aiken (SIGMOD'03)
  * with window = whole document; md5 keeps the operator reproducible in
  * ANSI SQL for the DuckDB oracle.
  */
case class MinMd5Shingle(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 64, s"shingle size out of range: $k")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinMd5Shingle.evalShingle(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinMd5Shingle.evalShingle($c, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MinMd5Shingle =
    copy(child = newChild)
  override def prettyName: String = "min_md5_shingle"
}

object MinMd5Shingle {
  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexDigits = "0123456789abcdef".toCharArray

  /** Static entry the generated code calls — named to avoid clashing with
    * Expression.eval(InternalRow): a same-named member suppresses the
    * Scala static forwarder, which made janino fail to resolve the call
    * and silently dropped the whole stage to the interpreted path.
    * Walks code-point start offsets
    * with a ring buffer; each k-code-point window is digested from the
    * UTF-8 bytes directly (no substring materialization) and compared
    * against the running 16-byte minimum. Malformed UTF-8 degrades
    * deterministically: a leading-byte width that would run past the end
    * is clamped to the buffer.
    */
  def evalShingle(s: UTF8String, k: Int): UTF8String = {
    val bytes = s.getBytes // one defensive copy; base may be off-heap
    val n = bytes.length
    val md = localMd.get()
    // ring of the last k+1 code-point start offsets (incl. the end
    // sentinel): the window ending at position p covers bytes
    // [start(p-k), start(p))
    val ring = new Array[Int](k + 1)
    val digest = new Array[Byte](16)
    val best = new Array[Byte](16)
    var found = false
    var i = 0 // byte offset of position `pos`
    var pos = 0 // code-point positions recorded so far
    var done = false
    while (!done) {
      ring(pos % (k + 1)) = i
      if (pos >= k) {
        val from = ring((pos - k) % (k + 1))
        md.reset()
        md.update(bytes, from, i - from)
        md.digest(digest, 0, 16)
        if (!found || unsignedLess(digest, best)) {
          System.arraycopy(digest, 0, best, 0, 16)
          found = true
        }
      }
      if (i >= n) done = true
      else {
        val b0 = bytes(i) & 0xff
        val w =
          if (b0 < 0x80) 1
          else if (b0 < 0xe0) 2
          else if (b0 < 0xf0) 3
          else 4
        i += math.min(w, n - i)
        pos += 1
      }
    }
    if (!found) return null
    val hex = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = hexDigits((best(j) >> 4) & 0xf).toByte
      hex(2 * j + 1) = hexDigits(best(j) & 0xf).toByte
      j += 1
    }
    UTF8String.fromBytes(hex)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def apply(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MinMd5Shingle(org.apache.spark.sql.GraftColumnBridge.expression(c), k))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "min_md5_shingle",
      exprs => MinMd5Shingle(
        exprs.head,
        exprs(1).eval(null).asInstanceOf[Int]),
      "built-in")
  }
