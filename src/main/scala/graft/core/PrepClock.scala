package graft.core

/** Harness-cost accumulator: fixture/ingest work a gate performs that is
  * NOT the operator under test (e.g. the stream gates write their
  * id-ranged slice files inside the timed gate — r9/r10 verdicts flagged
  * that the committed 1000× stream timings were therefore
  * ingest-inclusive and not interpretable across rounds). Gate code wraps
  * such segments in [[time]]; Verify/Bench drain the counter per gate and
  * report `(prep X s)` alongside the total, so artifacts decompose into
  * prep vs operator without changing what the gate computes.
  *
  * Thread-confined by contract: gates run sequentially on the main
  * harness thread (the AtomicLong is only for safety if a prep segment
  * ever runs inside a parallelized fixture builder).
  */
object PrepClock {
  private val nanos = new java.util.concurrent.atomic.AtomicLong()

  def time[T](f: => T): T = {
    val t0 = System.nanoTime()
    try f finally nanos.addAndGet(System.nanoTime() - t0)
  }

  /** Seconds accumulated since the last drain; resets to zero. */
  def drainSeconds(): Double = nanos.getAndSet(0L) / 1e9
}
