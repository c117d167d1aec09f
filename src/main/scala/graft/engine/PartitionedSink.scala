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

  def readByDate(spark: SparkSession, path: String): DataFrame = {
    heal(spark, path)
    spark.read.parquet(path)
  }

  /** Self-heal a table around an interrupted `compact` swap, so the
    * table is readable no matter where the writer died:
    *  - staging complete (_SUCCESS) but table dir missing → finish the
    *    swap (rename staging into place);
    *  - table dir missing but the pre-swap backup present → roll back;
    *  - table present → drop any leftover staging/backup (staging
    *    without the table having moved means the compact never
    *    committed; the backup with the table present means it did).
    * Rename is the only mutation between complete states, and each
    * rename is atomic on HDFS-like filesystems — readers resolve to
    * either the old or the new COMPLETE table, never a partial one.
    */
  def heal(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(path + "._compacting")
    val backup = new org.apache.hadoop.fs.Path(path + "._old")
    val stagingCommitted = fs.exists(
      new org.apache.hadoop.fs.Path(staging, "_SUCCESS"))
    if (!fs.exists(p)) {
      if (stagingCommitted) fs.rename(staging, p) // crash between renames
      else if (fs.exists(backup)) fs.rename(backup, p) // crash pre-commit
    }
    if (fs.exists(p)) { // tidy whichever leftover lost the race
      if (fs.exists(backup)) fs.delete(backup, true)
      if (fs.exists(staging)) fs.delete(staging, true)
    }
  }

  /** Compact a parquet directory to ~`targetMB` files: the streaming /
    * incremental-append small-file remedy. Hive-style partition
    * directories (`col=value`) are detected and PRESERVED — the rewrite
    * re-partitions by the same columns, so partition pruning survives
    * compaction (spec-asserted).
    *
    * Crash-safe publish: the rewrite lands in a staging dir (parquet's
    * `_SUCCESS` marks it complete), then the swap is two atomic renames
    * (table → backup, staging → table) and a backup delete. A writer
    * killed at ANY step leaves the table recoverable by `heal` — which
    * `readByDate` and `compact` both run first — so readers always see
    * a complete table (spec kills the swap mid-way and reads back the
    * full row count).
    *
    * Sizing is per-partition BEST EFFORT for hive tables: rows are
    * spread over (partition cols, salt), with the salt modulus sized
    * from the average partition's bytes — an oversized partition gets
    * ~saltMod files instead of one giant file; per-partition-exact
    * sizing would need a per-partition modulus map.
    */
  def compact(spark: SparkSession, path: String, targetMB: Int = 128): Unit = {
    heal(spark, path)
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
    val backup = new org.apache.hadoop.fs.Path(path + "._old")
    val df = spark.read.parquet(path)
    // partitioned tables: cluster rows by (partition key, salt) so each
    // output partition is written by few tasks (coalesce would spray
    // every partition's rows across all tasks -> parts x n_partitions
    // files), while the salt keeps one oversized partition from
    // collapsing into a single giant file
    val sized =
      if (partitionCols.nonEmpty) {
        val nLeaf = math.max(1L, countLeafPartitions(fs, p, partitionCols.length))
        val saltMod = math.max(1L,
          bytes / nLeaf / (targetMB.toLong * 1024 * 1024) + 1)
        df.withColumn("_salt",
            pmod(xxhash64(monotonically_increasing_id()), lit(saltMod)))
          .repartition(parts,
            (partitionCols.map(col) :+ col("_salt")): _*)
          .drop("_salt")
      } else df.coalesce(parts)
    val writer = sized.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(tmp.toString)
    // commit: two atomic renames; heal() recovers any crash in between
    fs.rename(p, backup)
    fs.rename(tmp, p)
    fs.delete(backup, true)
  }

  private def countLeafPartitions(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, depth: Int): Long =
    if (depth == 0) 1L
    else fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(d => countLeafPartitions(fs, d.getPath, depth - 1)).sum
}
