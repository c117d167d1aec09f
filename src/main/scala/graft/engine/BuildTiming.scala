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
  // Union accounting across threads: independent stores may build
  // CONCURRENTLY inside one query (q332/q334/q337 overlap their two
  // signal chains — guide-style independent-job overlap), and summing
  // each thread's wall time would report build_s larger than the
  // query's own wall clock. Instead the accumulator is credited with
  // the wall time during which AT LEAST ONE build section was active —
  // exactly the amortizable share of a serial bench window. The
  // per-thread depth guard still stops nested maintenance on the same
  // thread from double counting.
  private val lock = new Object
  private var active = 0
  private var unionStartNs = 0L

  /** Run `f`, adding its wall time to the build accumulator unless
    * already inside an outer timed section on this thread.
    */
  def timed[T](f: => T): T =
    if (depth.get > 0) f
    else {
      depth.set(1)
      lock.synchronized {
        if (active == 0) unionStartNs = System.nanoTime()
        active += 1
      }
      try f
      finally {
        depth.set(0)
        lock.synchronized {
          active -= 1
          if (active == 0) acc.addAndGet(System.nanoTime() - unionStartNs)
        }
      }
    }

  /** Seconds of build time accumulated since the last drain. */
  def drainSeconds(): Double = acc.getAndSet(0) / 1e9
}
