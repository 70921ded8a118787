package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

/** Native kernels for product quantization (PQ) — the storage format
  * that shrinks a 100 TB fp32 embedding corpus ~`dim*4/m`× (e.g. 64-dim
  * fp32 → 8 bytes at m=8) while remaining ANN-searchable without
  * decompression via asymmetric distance computation (ADC).
  *
  * The codebook (`m` subspaces × `ksub` centroids × `dsub` dims,
  * flattened row-major) is trained driver-side on a bounded sample
  * ([[graft.operators.Pq.train]]) and shipped into the generated code
  * as a referenced object (`ctx.addReferenceObj`) — never as source
  * text, never broadcast-joined. All three expressions are total on
  * non-null inputs and generate a single static call each (library
  * bytecode JITs once per JVM; fused Janino trees don't).
  */
object PqKernels {

  /** codes[i] = argmin over centroids of sub i of L2²(subvec, centroid). */
  def assign(vec: ArrayData, cb: Array[Double], m: Int, ksub: Int): ArrayData = {
    val dsub = cb.length / (m * ksub)
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < ksub) {
        val base = (s * ksub + k) * dsub
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val diff = vec.getDouble(s * dsub + j) - cb(base + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      out(s) = best.toByte
      s += 1
    }
    new GenericArrayData(out)
  }

  /** lut[s*ksub + k] = dot(query subvec s, centroid k of sub s). */
  def lut(vec: ArrayData, cb: Array[Double], m: Int, ksub: Int): ArrayData = {
    val dsub = cb.length / (m * ksub)
    val out = new Array[Any](m * ksub)
    var s = 0
    while (s < m) {
      var k = 0
      while (k < ksub) {
        val base = (s * ksub + k) * dsub
        var d = 0.0
        var j = 0
        while (j < dsub) {
          d += vec.getDouble(s * dsub + j) * cb(base + j)
          j += 1
        }
        out(s * ksub + k) = d
        k += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC inner product: Σ_s lut[s*ksub + codes[s]] — approximates
    * dot(query, original vector) from the code alone. */
  def adc(codes: ArrayData, lut: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var s = 0
    var acc = 0.0
    while (s < m) {
      acc += lut.getDouble(s * ksub + (codes.getByte(s) & 0xFF))
      s += 1
    }
    acc
  }

  /** Decode: concatenated centroids of each sub's code — the PQ
    * reconstruction ~v̂ (for error audits and rerank-free use). */
  def decode(codes: ArrayData, cb: Array[Double], m: Int, ksub: Int): ArrayData = {
    val dsub = cb.length / (m * ksub)
    val out = new Array[Any](m * dsub)
    var s = 0
    while (s < m) {
      val base = (s * ksub + (codes.getByte(s) & 0xFF)) * dsub
      var j = 0
      while (j < dsub) { out(s * dsub + j) = cb(base + j); j += 1 }
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<double>` vector → `array<tinyint>` PQ code. */
case class PqAssignCode(child: Expression, codebook: Array[Double], m: Int, ksub: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_assign"

  override def nullSafeEval(input: Any): Any =
    PqKernels.assign(input.asInstanceOf[ArrayData], codebook, m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqKernels.assign($c, $cb, $m, $ksub);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAssignCode =
    copy(child = newChild)
}

/** `array<double>` query vector → `array<double>` ADC lookup table. */
case class PqLut(child: Expression, codebook: Array[Double], m: Int, ksub: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_lut"

  override def nullSafeEval(input: Any): Any =
    PqKernels.lut(input.asInstanceOf[ArrayData], codebook, m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqKernels.lut($c, $cb, $m, $ksub);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** (codes, lut) → ADC inner-product score. */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(a: Any, b: Any): Any =
    PqKernels.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PqKernels.adc($a, $b, $ksub);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

/** `array<tinyint>` code → reconstructed `array<double>` vector. */
case class PqDecode(child: Expression, codebook: Array[Double], m: Int, ksub: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_decode"

  override def nullSafeEval(input: Any): Any =
    PqKernels.decode(input.asInstanceOf[ArrayData], codebook, m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqKernels.decode($c, $cb, $m, $ksub);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDecode =
    copy(child = newChild)
}
