package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Insert-if-absent sink semantics on plain parquet directories.
  *
  * The reference's `INSERT ... ON CONFLICT (time_id) DO NOTHING`
  * (`silver_transform.py:81,105`, `gold_aggr.py:220`) drops late
  * duplicates silently and never updates. Without a transactional table
  * format the equivalent is: left-anti join the new batch against the
  * existing sink keys, then append.
  *
  * Scale notes:
  *  - The anti-join's right side is only the sink's KEY COLUMNS
  *    (column-pruned parquet scan); with a selective watermark filter on
  *    the new batch, Catalyst/AQE picks a broadcast anti-join when the
  *    batch is small — no full-sink shuffle.
  *  - `dropDuplicates(keys)` guards intra-batch duplicates, mirroring
  *    the reference's advisory primary key (`bronze_ingest.py:7-11`).
  *  - Append of parquet files is atomic per task commit but the
  *    read-keys/append pair is not transactional across concurrent
  *    writers — single-writer-per-table is the documented invariant
  *    (the reference has the same single-process assumption).
  */
object IdempotentSink {
  /** Pure form used by queries/tests: `batch` minus rows whose key tuple
    * already exists in `existing` (J2/S7), deduped within the batch.
    */
  def newRows(batch: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame = {
    val existingKeys = existing.select(keys.map(org.apache.spark.sql.functions.col): _*)
    batch.dropDuplicates(keys).join(existingKeys, keys, "left_anti")
  }

  /** I/O form: append only-new rows to a parquet directory sink. */
  def appendIfAbsent(spark: SparkSession, batch: DataFrame, path: String, keys: Seq[String]): Unit = {
    val toWrite =
      if (exists(spark, path)) newRows(batch, spark.read.parquet(path), keys)
      else batch.dropDuplicates(keys)
    toWrite.write.mode(SaveMode.Append).parquet(path)
  }

  /** Shared path-existence probe (single definition — swapping in e.g.
    * a _SUCCESS-marker check must happen in exactly one place).
    */
  private[graft] def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }
}
