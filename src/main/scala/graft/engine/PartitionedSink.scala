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
    val partitionCols = fs.listStatus(p).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.contains("=")).map(_.split("=")(0)).distinct
    val bytes = fs.getContentSummary(p).getLength
    val parts = math.max(1, (bytes / (targetMB.toLong * 1024 * 1024)).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "._compacting")
    val writer = spark.read.parquet(path).coalesce(parts)
      .write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(tmp.toString)
    fs.delete(p, true)
    fs.rename(tmp, p)
  }
}
