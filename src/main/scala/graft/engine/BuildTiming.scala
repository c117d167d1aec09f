package graft.engine

import java.util.concurrent.atomic.AtomicLong

/** Driver-side accounting of persisted-store BUILD/MAINTENANCE time
  * (AnnIndex build/compact/delete, TextIndex append/compact/delete),
  * so a benchmark can split a store-building query's wall time into
  * the amortizable build cost and the repeatable query cost — a
  * measured number instead of a framing. The instrumented entry
  * points are driver-blocking (they orchestrate Spark jobs and return
  * when the store is committed), so wrapping them on the calling
  * thread captures the full build wall time; a reentrancy guard keeps
  * nested maintenance (a build that compacts internally) from double
  * counting. The accumulator is process-global: harness mains drain
  * it per query OUTSIDE their timed windows; library callers that
  * never drain pay one AtomicLong add per store operation.
  */
object BuildTiming {
  private val acc = new AtomicLong(0)
  private val depth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  /** Run `f`, adding its wall time to the build accumulator unless
    * already inside an outer timed section on this thread.
    */
  def timed[T](f: => T): T =
    if (depth.get > 0) f
    else {
      depth.set(1)
      val t0 = System.nanoTime()
      try f
      finally {
        depth.set(0)
        acc.addAndGet(System.nanoTime() - t0)
      }
    }

  /** Seconds of build time accumulated since the last drain. */
  def drainSeconds(): Double = acc.getAndSet(0) / 1e9
}
