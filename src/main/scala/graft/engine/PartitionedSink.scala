package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet layout + small-file compaction — the two
  * storage-layout operators a 100 TB pipeline needs around the
  * medallion sinks.
  *
  * Partitioning by event date turns every watermark predicate
  * (`ts > w`) into directory-level partition pruning (PartitionFilters
  * in the scan — asserted in PartitionedSinkSpec), instead of relying
  * only on row-group min/max stats.
  */
object PartitionedSink {
  /** Write `df` partitioned by the date of `tsCol` (adds a `p_date`
    * partition column; original columns unchanged).
    */
  def writeByDate(df: DataFrame, tsCol: String, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode(mode).partitionBy("p_date").parquet(path)

  def readByDate(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compact a parquet directory to ~`targetMB` files: the streaming /
    * incremental-append small-file remedy. Hive-style partition
    * directories (`col=value`) are detected and PRESERVED — the rewrite
    * re-partitions by the same columns, so partition pruning survives
    * compaction (spec-asserted).
    *
    * The swap is delete-then-rename through a sibling temp dir: NOT
    * atomic — a crash between the two steps leaves the table absent,
    * and concurrent readers can observe the gap. Same single-writer /
    * no-concurrent-reader invariant as the rest of the parquet sinks
    * (a transactional table format is the managed answer).
    */
  def compact(spark: SparkSession, path: String, targetMB: Int = 128): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // discover the FULL hive partition chain (col1=.../col2=.../...),
    // walking one branch per level — a single level would silently
    // flatten deeper partitioning on rewrite
    val partitionCols = {
      val cols = scala.collection.mutable.ArrayBuffer.empty[String]
      var cur = p
      var descending = true
      while (descending) {
        val partDirs = fs.listStatus(cur).filter(s =>
          s.isDirectory && s.getPath.getName.contains("="))
        if (partDirs.isEmpty) descending = false
        else {
          cols += partDirs.head.getPath.getName.split("=")(0)
          cur = partDirs.head.getPath
        }
      }
      cols.toSeq
    }
    val bytes = fs.getContentSummary(p).getLength
    val parts = math.max(1, (bytes / (targetMB.toLong * 1024 * 1024)).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "._compacting")
    val df = spark.read.parquet(path)
    // partitioned tables: cluster rows by partition key so each output
    // partition is written by few tasks (coalesce would spray every
    // partition's rows across all tasks -> parts x n_partitions files)
    val sized =
      if (partitionCols.nonEmpty)
        df.repartition(parts, partitionCols.map(org.apache.spark.sql.functions.col): _*)
      else df.coalesce(parts)
    val writer = sized.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(tmp.toString)
    fs.delete(p, true)
    fs.rename(tmp, p)
  }
}
