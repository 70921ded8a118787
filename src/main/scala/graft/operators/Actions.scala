package graft.operators

import java.util.concurrent.{Callable, ExecutionException, Executors}

/** Run INDEPENDENT Spark actions concurrently from the driver.
  *
  * Guide §2.6: inside one application, actions are only sequential
  * because driver code calls them sequentially — the scheduler happily
  * runs several jobs at once, and a later job's tasks back-fill
  * executors freed by the current job's straggler tail. The composed
  * state pipelines (ingest waves, cluster appends, takedowns) are
  * JOB-COUNT-bound at bench scale (JobProbe: 65–167 sequential jobs of
  * 6–300 ms plus driver gaps), and at 100 TB every such job is a full
  * pass — overlapping the independent ones converts sums of walls into
  * maxes without touching what any query computes.
  *
  * STRICTLY for actions with no ordering contract between them.
  * Crash-window-ordered writes stay sequential at the call sites:
  * state before gold (ingest loops), edges first / postings last
  * (cluster appends), tombstones last (takedowns).
  *
  * Failure semantics: waits for ALL branches, then rethrows the first
  * failure with the others attached as suppressed — a failed branch
  * never leaves a sibling action silently running.
  */
private[graft] object Actions {

  /** Run every thunk concurrently (one thread each — these block on
    * Spark actions, not CPU), wait for all, propagate failures. */
  def inParallel(tasks: Seq[() => Unit]): Unit = {
    if (tasks.sizeIs <= 1) { tasks.foreach(_.apply()); return }
    val pool = Executors.newFixedThreadPool(tasks.size)
    try {
      val futures = tasks.map(t => pool.submit(new Callable[Unit] {
        override def call(): Unit = t()
      }))
      val failures = futures.flatMap { f =>
        try { f.get(); None }
        catch {
          case e: ExecutionException => Some(Option(e.getCause).getOrElse(e))
          case e: InterruptedException =>
            Thread.currentThread().interrupt(); Some(e)
        }
      }
      failures.headOption.foreach { first =>
        failures.drop(1).foreach { other =>
          if (other ne first) first.addSuppressed(other)
        }
        throw first
      }
    } finally pool.shutdown()
  }

  /** Two independent VALUE-returning actions (e.g. a pair of eager
    * localCheckpoints) evaluated concurrently. */
  def par2[A, B](fa: => A, fb: => B): (A, B) = {
    var ra: Option[A] = None
    var rb: Option[B] = None
    inParallel(Seq(() => ra = Some(fa), () => rb = Some(fb)))
    (ra.get, rb.get)
  }
}
