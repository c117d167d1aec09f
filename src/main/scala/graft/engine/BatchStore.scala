package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Shared maintenance for the `batch_id=N` micro-batch stores
  * (`StreamingPower`'s dedup index, count-min / histogram sketch
  * stores, CDC changelog): each `foreachBatch` step writes its batch
  * dir directly and gates retries on that dir's `_SUCCESS`, so a
  * long-running stream accretes a directory per micro-batch forever —
  * the same small-file flaw, and the same staged-swap cure, as
  * `AnnIndex.compact` / `IdempotentSink.compact`.
  *
  * [[compact]] folds every committed generation into ONE at the MAX
  * folded id. Engine batch ids are strictly increasing, so ids below
  * the fold are never re-delivered, and a retry of the LAST folded id
  * finds its dir present-and-committed (the folded generation) — still
  * a no-op, exactly the invariant the stores' `_SUCCESS` gate encodes.
  * The optional `merge` hook lets a MERGEABLE store collapse rows, not
  * just files: count-min sums counters per (r, c), the histogram per
  * bin — after which the folded generation is constant-size no matter
  * how much stream has passed. `merge` MUST preserve the step schema
  * (future generations land beside its output) and MUST be a pure
  * refinement of the store's read-side merge, which is what makes the
  * fold invisible to readers.
  *
  * Crash discipline matches the siblings: the folded generation is
  * staged beside the store, its per-dir `_SUCCESS` marker — created
  * LAST — is the commit point, and the swap is two atomic renames.
  * [[heal]], run by every step and reader, rolls a kill at any point
  * forward (staging committed) or back (old store intact in the
  * backup). Single-writer-per-store, like every mutation here: call
  * [[compact]] from the store's own foreachBatch (see the streams'
  * `compactEvery`), never beside a live writer.
  */
object BatchStore {
  /** Committed generation ids: `batch_id=N` dirs carrying `_SUCCESS`. */
  def committedBatches(spark: SparkSession, path: String): Seq[Long] = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id=") &&
        fs.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("batch_id=").toLong)
      .sorted
  }

  /** Read the store restricted to COMMITTED generations (per-dir
    * `_SUCCESS`): a crashed step leaves a partial `batch_id=N` dir
    * whose rows are garbage pending the retry's overwrite — a bare
    * `spark.read.parquet(path)` would silently fold them into every
    * read-side merge (fatal for the sum-state stores: partial moment /
    * count-min rows corrupt totals, they don't just waste work). Every
    * report reader goes through here.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    heal(spark, path)
    spark.read.parquet(path)
      .filter(col("batch_id").isin(committedBatches(spark, path): _*))
  }

  /** Fold committed generations into one (see object doc). Uncommitted
    * dirs are garbage pending their retry's overwrite — dropped.
    */
  def compact(spark: SparkSession, path: String,
      merge: DataFrame => DataFrame = identity,
      subPartitionCols: Seq[String] = Nil,
      force: Boolean = false): Unit = {
    compactWithSignal(spark, path, merge, subPartitionCols, force); ()
  }

  /** [[compact]] returning TRUE iff the folded generation was
    * COMMITTED (the swap's renames completed): callers whose merge
    * hook has side conditions (TextIndex draining the tombstones its
    * fold applied) branch on the signal instead of re-scanning the
    * store to verify — a no-op or race-aborted fold returns false and
    * the caller must leave its pending state (tombstones) in place.
    */
  private[graft] def compactWithSignal(spark: SparkSession, path: String,
      merge: DataFrame => DataFrame = identity,
      subPartitionCols: Seq[String] = Nil,
      force: Boolean = false): Boolean = {
    heal(spark, path)
    val p = new Path(path)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return false
    val batches = committedBatches(spark, path)
    // `force` folds even a lone generation — callers whose merge hook
    // must rewrite rows regardless of batch count (e.g. TextIndex
    // applying tombstone deletes) opt in; the plain fold is a no-op on
    // a single batch by definition
    if (batches.isEmpty || (batches.size <= 1 && !force)) return false
    val genId = batches.max
    val staging = new Path(path + "._compacting")
    val backup = new Path(path + "._old")
    fs.delete(staging, true)
    fs.delete(backup, true)
    val folded = merge(
      spark.read.parquet(path)
        .filter(col("batch_id").isin(batches: _*))
        .drop("batch_id"))
      .withColumn("batch_id", lit(genId))
    // stores with a pruning sub-layout under each generation (e.g.
    // TextIndex's tok_bucket) keep it through the fold, so partition
    // pruning survives compaction — and are CLUSTERED by it before the
    // partitioned write (the appendBatch discipline): a merge hook
    // that shuffles (TextIndex's tombstone anti-join) otherwise leaves
    // every reduce task holding rows of every sub-partition value, and
    // the write fans out tasks x values small files per fold — the
    // small-file problem compaction exists to fix, reintroduced by
    // the fold itself.
    val clustered =
      if (subPartitionCols.isEmpty) folded
      else folded.repartition(subPartitionCols.map(col): _*)
    clustered.write.mode(SaveMode.Overwrite)
      .partitionBy("batch_id" +: subPartitionCols: _*)
      .parquet(staging.toString)
    // the steps gate retries on the BATCH DIR's _SUCCESS (they write
    // their dirs directly, so parquet puts the marker inside); the
    // partitioned staging write only marks its root — add the per-dir
    // marker, LAST, as the staging commit point
    fs.create(new Path(staging, s"batch_id=$genId/_SUCCESS")).close()
    // a CONCURRENT reader's heal may have deleted the live staging
    // between the write and the marker create (fs.create silently
    // recreates parent dirs): if parquet's root marker is gone, the
    // staged rows are gone — swapping would publish an EMPTY committed
    // generation and silently lose the store. Abort; a race landing
    // after this check makes a rename throw, which heal rolls back.
    if (!fs.exists(new Path(staging, "_SUCCESS"))) {
      fs.delete(staging, true)
      return false
    }
    renameOrThrow(fs, p, backup)
    renameOrThrow(fs, staging, p)
    fs.delete(backup, true)
    true
  }

  /** Recover around an interrupted [[compact]] swap: store missing
    * with COMMITTED staging (per-dir `_SUCCESS` present — created
    * last, so root markers alone never roll an unfinished fold
    * forward) → finish the swap; store missing with the backup
    * present → roll back; store present → drop leftovers. Each
    * transition is one atomic rename.
    */
  def heal(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    val staging = new Path(path + "._compacting")
    val backup = new Path(path + "._old")
    if (!fs.exists(p)) {
      val stagingCommitted = fs.exists(staging) &&
        fs.listStatus(staging).exists(s =>
          s.getPath.getName.startsWith("batch_id=") &&
            fs.exists(new Path(s.getPath, "_SUCCESS")))
      if (stagingCommitted) renameOrThrow(fs, staging, p)
      else if (fs.exists(backup)) renameOrThrow(fs, backup, p)
    }
    if (fs.exists(p)) {
      if (fs.exists(backup)) fs.delete(backup, true)
      if (fs.exists(staging)) fs.delete(staging, true)
    }
  }

  private def renameOrThrow(fs: FileSystem, src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"commit rename failed: $src -> $dst")

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
}
