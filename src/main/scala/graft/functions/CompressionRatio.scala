package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a string's UTF-8 bytes:
  * `compressed_size / raw_size` (1.0 for the empty string).
  *
  * The classic cheap redundancy detector for LLM data curation:
  * templated boilerplate, repeated n-grams, and log spam compress far
  * better than natural prose, so a LOW ratio flags low-information
  * documents without any language model — complementary to the
  * word-level repetition profile ([[graft.operators.Stats.wordRepetition]]),
  * which misses sub-word and structural redundancy.
  *
  * Level 6 (zlib default) — fixed so results are deterministic for a
  * given zlib build. A fresh Deflater per call keeps the expression
  * thread-safe across whole-stage-codegen tasks; for ~KB documents the
  * setup cost is dwarfed by the deflate itself. Codegen is one static
  * call.
  */
case class CompressionRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "compression_ratio"

  override def nullSafeEval(input: Any): Any =
    CompressionRatio.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CompressionRatio.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CompressionRatio =
    copy(child = newChild)
}

object CompressionRatio {
  def compute(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.isEmpty) return 1.0
    val deflater = new java.util.zip.Deflater(6, /* nowrap = */ true)
    try {
      deflater.setInput(raw)
      deflater.finish()
      val buf = new Array[Byte](256)
      var total = 0L
      while (!deflater.finished()) total += deflater.deflate(buf)
      total.toDouble / raw.length
    } finally deflater.end()
  }
}
