package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE query and print every Spark job's wall time with
  * its call site, so a multi-action query's cost decomposes into its
  * eager pieces (collects, checkpoints, store writes, final noop).
  *
  * Usage: runMain graft.JobProfile <sfDir> <q1,q2,...>
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, namesArg) = args.take(2)
    val names = namesArg.split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null)
          rows.add((je.jobId, (System.nanoTime() - s._1) / 1e9, s._2))
      }
    })
    // warm-up: JVM/codegen/file-index, untimed (Bench's protocol)
    try SparkEntry.queries("q01_scan_filter")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    try Seq[(SparkSession, String) => org.apache.spark.sql.DataFrame](
      graft.engine.Tables.documents, graft.engine.Tables.embeddings,
      graft.engine.Tables.events).foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    names.foreach { name =>
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      Thread.sleep(300)
      rows.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drain
      val js = rows.toArray(Array.empty[(Int, Double, String)]).sortBy(_._1)
      println(f"== $name total $total%.2f s; ${js.length} jobs summing ${js.map(_._2).sum}%.2f s")
      js.sortBy(-_._2).take(12).foreach {
        case (id, dt, site) => println(f"  job $id%3d  $dt%7.3f s  $site")
      }
    }
    spark.stop()
  }
}
