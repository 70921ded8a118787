package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The packed strided-band decomposition of a 64-bit signature
  * ([[Bits.packedBands]]) as ONE codegen call returning
  * `array<bigint>` — band tag in the top 8 bits, gathered bucket
  * below. `probe = true` additionally emits each bucket's single-bit
  * flips (the 1-error multi-probe side of the Hamming joins).
  *
  * Exists because the equivalent Column tree — a 12-16-term bit
  * gather per band × up to 69 array elements — generates a
  * multi-KB Janino method that exceeds HotSpot's huge-method JIT cap
  * and silently runs interpreted (the round-2 lesson). Never assigns
  * `ev.isNull`. */
case class HammingBands(child: Expression, nBands: Int, probe: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hamming_bands"

  override def nullSafeEval(input: Any): Any =
    HammingBands.compute(input.asInstanceOf[Long], nBands, probe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HammingBands.compute($c, $nBands, $probe);")

  override protected def withNewChildInternal(newChild: Expression): HammingBands =
    copy(child = newChild)
}

object HammingBands {
  def compute(sig: Long, nBands: Int, probe: Boolean): ArrayData =
    new GenericArrayData(Bits.packedBands(sig, nBands, probe))
}
