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
    * incremental-append small-file remedy. Rewrites via coalesce sized
    * from the current on-disk footprint, atomically swapped in by a
    * rename through a sibling temp dir.
    */
  def compact(spark: SparkSession, path: String, targetMB: Int = 128): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val parts = math.max(1, (bytes / (targetMB.toLong * 1024 * 1024)).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "._compacting")
    spark.read.parquet(path).coalesce(parts)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(p, true)
    fs.rename(tmp, p)
  }
}
