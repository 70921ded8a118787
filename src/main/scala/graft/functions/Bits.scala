package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared 64-bit kernels with ONE definition each:
  *
  *  - the splitmix64 finalizer the deterministic synthetic media
  *    fixtures key their pixel/sample PRFs on
  *    ([[graft.operators.Images.syntheticPng]] and friends);
  *  - the pigeonhole Hamming band layout every 64-bit signature
  *    family builds and probes with — SimHash pairs, image/audio
  *    perceptual-hash joins, the persisted Hamming state
  *    ([[graft.operators.Incremental.writeHammingState]]), the
  *    driver-built blocklist index
  *    ([[graft.operators.Dedup.hammingIndex]]) and its codegen probe
  *    ([[HammingNearSet]]).
  *
  * The layout appears in TWO forms — Column expressions for banded
  * joins, plain-Long arithmetic for driver index builds and the
  * codegen kernel — and the exactness guarantee ("a pair within the
  * Hamming budget shares at least one whole band") only holds while a
  * builder and its probe band IDENTICALLY. Defining both forms here,
  * side by side, is what keeps them bit-for-bit in sync: a layout
  * drift in any local copy would produce SILENT false negatives in a
  * dedup or blocklist gate.
  *
  * Layout: `maxHamming + 1` bands of `64 / (maxHamming + 1)` bits;
  * the LAST band absorbs the remainder bits.
  */
object Bits {

  /** splitmix64 finalizer (Steele/Lea/Flood, JDK SplittableRandom) —
    * the PRF behind every deterministic synthetic media fixture. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Band `b` of `sig` under the `maxHamming` layout — plain-Long
    * form (driver index builds, the [[HammingNearSet]] kernel). */
  def bandOf(sig: Long, b: Int, maxHamming: Int): Long = {
    val nBands = maxHamming + 1
    val width = 64 / nBands
    val lo = b * width
    val w = if (b == nBands - 1) 64 - lo else width
    val shifted = sig >>> lo
    if (w >= 64) shifted else shifted & ((1L << w) - 1)
  }

  /** The full band decomposition of a signature Column — one
    * `struct(band, bucket)` per band, ready for
    * `explode(array(bandStructs(...): _*))`. Bit-identical to
    * [[bandOf]]. */
  def bandStructs(sig: Column, maxHamming: Int): Seq[Column] = {
    require(maxHamming >= 0 && maxHamming < 32, "maxHamming must be in [0, 32)")
    val nBands = maxHamming + 1
    val width = 64 / nBands
    (0 until nBands).map { b =>
      val lo = b * width
      val w = if (b == nBands - 1) 64 - lo else width // last band absorbs the remainder
      val shifted = shiftrightunsigned(sig, lo)
      val bucket = if (w >= 64) shifted else shifted.bitwiseAND(lit((1L << w) - 1))
      struct(lit(b).as("band"), bucket.as("bucket"))
    }
  }
}
