package graft.engine

/** Run independent Spark-action chains CONCURRENTLY and wait for all
  * (the optimization guide's overlap-independent-jobs rule): Spark
  * runs several jobs at once inside one application, and chains with
  * no data or ordering dependency between them — two store roots, a
  * ground-truth pass beside an index build, two scoring checkpoints —
  * only serialize because driver code calls their actions
  * sequentially. Each chain runs on its own thread so the next
  * chain's jobs back-fill cores the current chain's tail leaves idle;
  * failures rethrow after all chains settle. BuildTiming's union
  * accounting keeps build_s a wall-clock share under concurrent
  * builders.
  */
object Par {
  def inParallel(chains: (() => Unit)*): Unit = {
    val ts = chains.map { c =>
      val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val t = new Thread(() => try c() catch { case e: Throwable => err.set(e) })
      t.setDaemon(true)
      t.start()
      (t, err)
    }
    ts.foreach(_._1.join())
    ts.foreach { case (_, err) => if (err.get != null) throw err.get }
  }
}
