package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Actions

/** The driver-side action-overlap helper (guide §2.6) — failure and
  * result semantics, since every crash-window-ordered loop now leans
  * on it for its UNORDERED segments. */
class ActionsSpec extends AnyFunSuite {

  test("par2 returns both values, computed concurrently") {
    val gate = new java.util.concurrent.CyclicBarrier(2)
    // each branch blocks until the other has started: passing proves
    // genuine concurrency (a sequential fallback would deadlock the
    // barrier — bounded by its await timeout)
    val (a, b) = Actions.par2(
      { gate.await(10, java.util.concurrent.TimeUnit.SECONDS); 1 },
      { gate.await(10, java.util.concurrent.TimeUnit.SECONDS); "x" })
    assert(a == 1 && b == "x")
  }

  test("inParallel waits for every branch and rethrows the first failure") {
    val ran = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[RuntimeException] {
      Actions.inParallel(Seq(
        () => { ran.incrementAndGet(); throw new RuntimeException("boom") },
        () => { Thread.sleep(100); ran.incrementAndGet(); () }))
    }
    assert(e.getMessage == "boom")
    // the sibling branch was NOT abandoned: it completed before the
    // failure propagated
    assert(ran.get == 2)
  }

  test("inParallel attaches sibling failures as suppressed") {
    val e = intercept[RuntimeException] {
      Actions.inParallel(Seq(
        () => throw new RuntimeException("first"),
        () => throw new IllegalStateException("second")))
    }
    val all = e.getMessage +: e.getSuppressed.toSeq.map(_.getMessage)
    assert(all.toSet == Set("first", "second"))
  }

  test("single task runs inline") {
    var x = 0
    Actions.inParallel(Seq(() => x = 41))
    assert(x == 41)
    Actions.inParallel(Nil)
  }
}
