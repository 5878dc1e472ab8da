package graft.core

import java.util.concurrent.atomic.AtomicLong

/** Accumulates time spent in DRIVER-SIDE STAGING — scratch-tree deletes, CSV
  * file copies, embedded-Derby boots/shutdowns — so the bench can report it
  * separately from distributed Spark work. Round-4 lesson: q33's wall time
  * swung 18s↔91s across rounds and the single bundled number could not
  * distinguish "noisy neighbor during a 2100-dir recursive delete" from a
  * real Spark regression.
  *
  * Thread-safe accumulator (queries run sequentially in the bench, but the
  * ingest paths are `synchronized` and may be hit from tests in parallel).
  * `timed` nests safely: inner timings are subsumed by the outer interval
  * via a per-thread depth counter, so wrapping both a caller and its callee
  * never double-counts.
  */
object StagingClock {
  private val acc = new AtomicLong(0L)
  private val depth = new ThreadLocal[Integer] { override def initialValue(): Integer = 0 }

  def timed[T](body: => T): T = {
    val d = depth.get()
    depth.set(d + 1)
    val t0 = System.nanoTime()
    try body
    finally {
      depth.set(d)
      if (d == 0) acc.addAndGet(System.nanoTime() - t0)
    }
  }

  /** Read-and-reset, in seconds — the bench drains once per query. */
  def drainSeconds(): Double = acc.getAndSet(0L) / 1e9
}
