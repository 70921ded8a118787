package graft

import scala.util.control.NonFatal

/** Per-stage retry + SLA semantics — the engine-side analog of the
  * reference DAG's task `default_args`
  * (/root/reference/airflow_dags/corc_nah_etl_dag.py:26-37: retries=3,
  * retry_delay=5min, retry_exponential_backoff=True,
  * max_retry_delay=30min, sla=2h). Airflow applies these around every
  * task; here the same policy wraps every [[MedallionPipeline]] stage,
  * so a transient failure (a flaky object store, a lost executor
  * wave) re-runs ONE stage from its parquet restart boundary instead
  * of failing the pipeline — and an SLA breach is recorded in the
  * metadata warehouse instead of an email.
  *
  * The scheduler-side concerns (cross-DAG deps, pools, email routing)
  * stay driver-program scope per SURVEY §3; this module is only the
  * retry/SLA semantics a library can own.
  */
object Orchestration {

  /** The reference DAG's retry knobs, defaults matching
    * corc_nah_etl_dag.py:26-37. `slaMs` is per-stage here (the DAG's
    * 2 h SLA is pipeline-wide; [[MedallionPipeline.runRetrying]]
    * checks the pipeline-wide budget too). */
  final case class RetryPolicy(
      retries: Int = 3,
      retryDelayMs: Long = 5L * 60 * 1000,
      exponentialBackoff: Boolean = true,
      maxRetryDelayMs: Long = 30L * 60 * 1000,
      slaMs: Long = 2L * 60 * 60 * 1000) {
    require(retries >= 0, "retries must be >= 0")
    require(retryDelayMs >= 0 && maxRetryDelayMs >= retryDelayMs,
      "delays must be non-negative and capped above the base delay")
  }

  /** Delay before retry i (0-based): base · 2^i, capped — Airflow's
    * retry_exponential_backoff + max_retry_delay. The shift saturates
    * relative to the BASE delay (a fixed `i < 62` guard is only
    * correct for a ≤ 2 ms base — the default 5-minute base overflows
    * Long at i ≥ 45, and a negative delay escapes the retry loop as a
    * Thread.sleep IllegalArgumentException). */
  def backoffDelays(p: RetryPolicy): Seq[Long] = {
    val maxShift =
      if (p.retryDelayMs <= 0) Int.MaxValue
      else java.lang.Long.numberOfLeadingZeros(p.retryDelayMs) - 1
    (0 until p.retries).map { i =>
      val d =
        if (p.exponentialBackoff && i < maxShift) p.retryDelayMs << i
        else if (p.exponentialBackoff) Long.MaxValue
        else p.retryDelayMs
      math.min(d, p.maxRetryDelayMs)
    }
  }

  /** One stage's outcome: how many attempts ran, the wall clock across
    * all of them (sleeps included — that is what an SLA means), whether
    * the stage SLA was missed, and every recorded failure. */
  final case class StageRun[T](
      stage: String,
      attempts: Int,
      wallMs: Long,
      slaMissed: Boolean,
      failures: Seq[String],
      result: T)

  /** Raised when a stage exhausts its retries; carries the last cause
    * so the driver sees the real failure, and the attempt count so
    * lineage can record it. */
  final class StageFailedException(
      val stage: String, val attempts: Int, cause: Throwable)
    extends RuntimeException(
      s"stage '$stage' failed after $attempts attempt(s)", cause)

  /** Run `body` under `policy`: up to 1 + retries attempts, sleeping
    * the backoff between them. `sleep` is injectable so specs assert
    * the exact delay sequence without waiting minutes. Only NonFatal
    * failures retry — an OOM or interrupt propagates immediately. */
  def runStage[T](stage: String, policy: RetryPolicy,
      sleep: Long => Unit = Thread.sleep)(body: => T): StageRun[T] = {
    val delays = backoffDelays(policy)
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val start = System.nanoTime()
    var attempt = 0
    var result: Option[T] = None
    var lastErr: Throwable = null
    while (result.isEmpty && attempt <= policy.retries) {
      try result = Some(body)
      catch {
        case NonFatal(e) =>
          lastErr = e
          failures += s"${e.getClass.getSimpleName}: ${e.getMessage}"
          if (attempt < policy.retries) sleep(delays(attempt))
      }
      attempt += 1
    }
    val wallMs = (System.nanoTime() - start) / 1000000L
    result match {
      case Some(t) =>
        StageRun(stage, attempt, wallMs, wallMs > policy.slaMs, failures.toSeq, t)
      case None => throw new StageFailedException(stage, attempt, lastErr)
    }
  }
}
