package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bits

/** The band-layout invariants every Hamming join's exactness rests
  * on. Pure JVM — no Spark session. */
class BitsSpec extends AnyFunSuite {

  private val rnd = new java.util.Random(42)
  private def randSig(): Long = rnd.nextLong()
  private def flip(sig: Long, bits: Int): Long = {
    var v = sig
    val picked = scala.collection.mutable.Set.empty[Int]
    while (picked.size < bits) picked += rnd.nextInt(64)
    picked.foreach(b => v ^= 1L << b)
    v
  }

  test("strided bands partition the 64 bit positions") {
    for (k <- Seq(2, 3, 4, 5, 9, 16)) {
      val covered = (0 until k).flatMap(b => (b until 64 by k))
      assert(covered.sorted === (0 until 64),
        s"nBands=$k must cover every bit exactly once")
      (0 until k).foreach(b =>
        assert(Bits.bandWidthK(b, k) === (b until 64 by k).size))
    }
  }

  test("bandOfK gathers exactly its band's bits") {
    for (_ <- 1 to 200; k <- Seq(5, 9)) {
      val sig = randSig()
      (0 until k).foreach { b =>
        val bucket = Bits.bandOfK(sig, b, k)
        (0 until Bits.bandWidthK(b, k)).foreach { i =>
          assert(((bucket >>> i) & 1L) === ((sig >>> (b + i * k)) & 1L))
        }
      }
    }
  }

  test("exact layout: a within-budget pair shares a whole band") {
    val mh = 3 // joinBands(3) == 4 == mh + 1: the exact regime
    assert(Bits.joinBands(mh) === mh + 1)
    for (_ <- 1 to 500) {
      val a = randSig()
      val b = flip(a, rnd.nextInt(mh + 1))
      val shared = (0 until mh + 1).exists(i =>
        Bits.bandOfK(a, i, mh + 1) === Bits.bandOfK(b, i, mh + 1))
      assert(shared, s"pair within $mh bits must share a band")
    }
  }

  test("probe layout: a within-budget pair has a band with <= 1 differing bit") {
    val mh = 8
    val k = Bits.joinBands(mh)
    assert(k === Bits.probeBands(mh) && k === 5)
    for (_ <- 1 to 500) {
      val a = randSig()
      val b = flip(a, rnd.nextInt(mh + 1))
      val ok = (0 until k).exists { i =>
        java.lang.Long.bitCount(
          Bits.bandOfK(a, i, k) ^ Bits.bandOfK(b, i, k)) <= 1
      }
      assert(ok, "pair within 8 bits must have a <=1-bit band under 5 bands")
    }
  }

  test("packedBands: probe side reaches every exact bucket of a within-budget mate") {
    val mh = 8
    val k = Bits.joinBands(mh)
    for (_ <- 1 to 300) {
      val a = randSig()
      val b = flip(a, rnd.nextInt(mh + 1))
      val exactA = Bits.packedBands(a, k, probe = false).toSet
      val probedB = Bits.packedBands(b, k, probe = true).toSet
      assert(exactA.intersect(probedB).nonEmpty,
        "probe expansion must hit the exact side for a within-budget pair")
    }
  }

  test("packedBands round-trips band and bucket through the packing") {
    for (_ <- 1 to 100; k <- Seq(2, 5, 9)) {
      val sig = randSig()
      val packed = Bits.packedBands(sig, k, probe = false)
      packed.zipWithIndex.foreach { case (e, b) =>
        assert((e >>> 56).toInt === Bits.LayoutV1Tag + b)
        assert((e & ((1L << 56) - 1)) === Bits.bandOfK(sig, b, k))
      }
    }
  }

  test("beyond-budget pairs are NOT guaranteed a band (sanity: the guarantee is one-sided)") {
    // a pair at distance maxHamming+... may still collide in a band —
    // the popcount verify exists precisely because banding only
    // guarantees recall, never precision
    val a = 0L
    val far = -1L // distance 64
    val k = Bits.joinBands(8)
    val anyShared = (0 until k).exists(i =>
      Bits.bandOfK(a, i, k) === Bits.bandOfK(far, i, k))
    assert(!anyShared)
  }
}
