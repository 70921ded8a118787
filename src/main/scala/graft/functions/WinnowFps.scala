package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The winnowing fingerprint SET of a string, as one map-side kernel:
  * word k-grams ([[WordNGrams]] semantics — lowercased, maximal
  * non-whitespace runs) → 60-bit md5-prefix hashes (bit-identical to
  * [[graft.operators.Winnow.gramHash]], so the kernel, the
  * window-function operator, and the DuckDB oracle all select the
  * same fingerprints) → the SIGMOD'03 rightmost-min-per-window
  * selection → distinct selected hashes, ascending.
  *
  * Positions are deliberately dropped: this is the membership form
  * for gates and joins. [[graft.operators.Winnow.fingerprints]] keeps
  * (pos, fp) via window functions when provenance matters; WinnowSpec
  * asserts the two agree fingerprint-for-fingerprint.
  *
  * Why a native expression: the selection needs the whole hash
  * sequence of ONE document — no cross-row data — so it belongs in a
  * per-row kernel, not behind a per-document shuffle. That makes
  * winnowing available to Structured Streaming (stateless, any
  * output mode) and lets batch probes skip the window exchange
  * entirely. Selection is O(n·w) per document (w is tiny; the
  * rescan-free deque variant is not worth its allocation here).
  * Generated code is ONE static call (the HOF formulation would
  * interpret three lambda dispatches per window).
  *
  * Fewer than `w` complete windows (under k+w−1 words) yield an
  * empty array — the paper's guarantee threshold, identical to the
  * window-function operator. */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "gram size and window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowFps.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFps.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 15 hex digits of md5(bytes) as a non-negative long —
    * the big-endian value of the first 8 digest bytes, unsigned-
    * shifted 4 to drop the 16th hex digit. Equals
    * `conv(substring(md5(g), 1, 15), 16, 10)` exactly. */
  private def hash60(g: UTF8String): Long = {
    val d = md5.get().digest(g.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val grams = WordNGrams.compute(s, k)
    val n = grams.numElements()
    if (n < w) return new GenericArrayData(new Array[Long](0))
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = hash60(grams.getUTF8String(i)); i += 1 }
    // rightmost minimum of every window of w (<= keeps the later pos)
    val sel = new Array[Boolean](n)
    var j = 0
    while (j <= n - w) {
      var p = j
      var m = hs(j)
      var q = j + 1
      while (q < j + w) {
        if (hs(q) <= m) { m = hs(q); p = q }
        q += 1
      }
      sel(p) = true
      j += 1
    }
    var cnt = 0
    i = 0
    while (i < n) { if (sel(i)) cnt += 1; i += 1 }
    val out = new Array[Long](cnt)
    var o = 0
    i = 0
    while (i < n) { if (sel(i)) { out(o) = hs(i); o += 1 }; i += 1 }
    java.util.Arrays.sort(out)
    var u = 0
    i = 0
    while (i < cnt) {
      if (u == 0 || out(i) != out(u - 1)) { out(u) = out(i); u += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, u))
  }
}
