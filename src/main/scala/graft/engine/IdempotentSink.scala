package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Insert-if-absent sink semantics on plain parquet directories.
  *
  * The reference's `INSERT ... ON CONFLICT (time_id) DO NOTHING`
  * (`silver_transform.py:81,105`, `gold_aggr.py:220`) drops late
  * duplicates silently and never updates. Without a transactional table
  * format the equivalent is: left-anti join the new batch against the
  * existing sink keys, then append.
  *
  * ATOMIC PUBLISH: a plain `mode(Append)` moves the batch's part files
  * into the table one rename at a time — a writer killed mid-publish
  * leaves a half-appended table. Here every append is staged as a
  * complete parquet directory first (parquet's `_SUCCESS` is the
  * durability marker) and COMMITTED by ONE directory rename into the
  * table as a `batch=<n>` hive partition. Readers list the table either
  * before or after that single atomic rename — never a partial file
  * set — and staging dirs are invisible to them (leading-dot names are
  * filtered by the file index). `heal` resolves a crashed writer:
  * staging without `_SUCCESS` rolls back (delete), staging with it
  * rolls forward (finish the rename). Same recipe as the streaming
  * index (`StreamingPower.dedupStepAgainstIndex`) and
  * `PartitionedSink.compact`'s swap.
  *
  * Scale notes:
  *  - The anti-join's right side is only the sink's KEY COLUMNS
  *    (column-pruned parquet scan); with a selective watermark filter on
  *    the new batch, Catalyst/AQE picks a broadcast anti-join when the
  *    batch is small — no full-sink shuffle.
  *  - `dropDuplicates(keys)` guards intra-batch duplicates, mirroring
  *    the reference's advisory primary key (`bronze_ingest.py:7-11`).
  *  - The read-keys/append pair is still not transactional across
  *    CONCURRENT writers — single-writer-per-table is the documented
  *    invariant (the reference has the same single-process assumption);
  *    atomicity here is about crash consistency for readers.
  */
object IdempotentSink {
  /** Pure form used by queries/tests: `batch` minus rows whose key tuple
    * already exists in `existing` (J2/S7), deduped within the batch.
    */
  def newRows(batch: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame = {
    val existingKeys = existing.select(keys.map(org.apache.spark.sql.functions.col): _*)
    batch.dropDuplicates(keys).join(existingKeys, keys, "left_anti")
  }

  /** Schema-evolution contract (dlt-parity on the bronze path,
    * `bronze_ingest.py:39-43`'s auto-normalize made EXPLICIT):
    * ADDITIVE evolution only. A batch may introduce new columns
    * (earlier generations read back NULL there via the merged-footer
    * read) or omit existing ones (this batch's rows read back NULL);
    * a TYPE CHANGE on a shared column is rejected LOUDLY at append
    * time, naming every conflicting column and both types — a
    * conflicting footer staged silently would instead poison every
    * later merged read of the whole table. Key columns must be
    * present in every batch (the anti-join needs them).
    */
  private[graft] def checkEvolution(
      existing: org.apache.spark.sql.types.StructType,
      incoming: org.apache.spark.sql.types.StructType,
      keys: Seq[String]): Unit = {
    val missing = keys.filterNot(k => incoming.fieldNames.contains(k))
    require(missing.isEmpty,
      s"batch is missing key column(s) ${missing.mkString(",")} — " +
        "keys must be present in every append")
    val byName = existing.fields.map(f => f.name -> f.dataType).toMap
    val conflicts = incoming.fields.flatMap { f =>
      byName.get(f.name).collect {
        case t if t != f.dataType => s"${f.name}: table=$t batch=${f.dataType}"
      }
    }
    require(conflicts.isEmpty,
      "schema evolution rejected — type change on shared column(s) " +
        s"[${conflicts.mkString("; ")}]; only ADDITIVE evolution is " +
        "supported (new columns NULL-backfill on read)")
  }

  /** I/O form: atomically append only-new rows to a batch-partitioned
    * parquet table (see object doc). Read it back with [[read]].
    * Additive schema evolution per [[checkEvolution]].
    */
  def appendIfAbsent(spark: SparkSession, batch: DataFrame, path: String,
      keys: Seq[String]): Unit = {
    heal(spark, path)
    val toWrite =
      if (exists(spark, path)) {
        val current = read(spark, path)
        checkEvolution(current.schema, batch.schema, keys)
        newRows(batch, current, keys)
      } else batch.dropDuplicates(keys)
    val p = new Path(path)
    val fs = fsOf(spark, p)
    val next = nextBatchId(fs, p)
    val staging = new Path(p, s"._staging_batch=$next")
    toWrite.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    // an all-duplicates batch can stage zero part files — nothing to
    // publish (committing a fileless dir would poison schema inference
    // on a table whose only batch is empty)
    if (fs.listStatus(staging).exists(_.getPath.getName.startsWith("part-")))
      renameOrThrow(fs, staging, new Path(p, s"batch=$next"))
    else fs.delete(staging, true)
  }

  /** The table's rows (batch bookkeeping column dropped), healed
    * first. `mergeSchema` unions the generations' schemas so a table
    * that evolved additively reads as ONE schema with NULL backfill on
    * the generations that predate a column — the other half of the
    * [[checkEvolution]] contract. (Cost: one footer read per file;
    * [[compact]] keeps the file count bounded, and re-unifies the
    * schema while it's at it.)
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    heal(spark, path)
    spark.read.option("mergeSchema", "true").parquet(path).drop("batch")
  }

  /** TIME-TRAVEL read: the table as it stood after batch `maxBatchId`
    * committed — the same partition-pruned scan as [[read]], filtered
    * on the `batch` partition column (no data file outside the asked
    * range is opened). Granularity is the RETAINED generations:
    * [[compact]] folds history into its max id — the usual retention
    * trade (fold small files, lose per-append history). Asking for a
    * state OLDER than the oldest retained generation THROWS instead of
    * returning an empty frame: rows existed as of that batch, and an
    * empty result would silently misreport them as "table was empty".
    */
  def readAsOf(spark: SparkSession, path: String, maxBatchId: Long): DataFrame = {
    heal(spark, path)
    val p = new Path(path)
    val fs = fsOf(spark, p)
    val batches =
      if (!fs.exists(p)) Seq.empty[Long]
      else fs.listStatus(p).map(_.getPath.getName).toSeq
        .collect { case n if n.startsWith("batch=") => n.stripPrefix("batch=").toLong }
    require(batches.nonEmpty && maxBatchId >= batches.min,
      s"as-of $maxBatchId predates the oldest retained generation " +
        s"(${batches.sorted.mkString(",")}) at $path — that history was " +
        "folded away by compaction; the state cannot be reconstructed")
    spark.read.option("mergeSchema", "true").parquet(path)
      .filter(org.apache.spark.sql.functions.col("batch") <= maxBatchId)
      .drop("batch")
  }

  /** Fold every committed `batch=N` generation into ONE — the
    * small-file remedy for a long-appending table, which otherwise
    * accretes a directory per append forever (same flaw, and same
    * staged-swap cure, as `AnnIndex.compact`). Rows are IDENTICAL
    * before and after; only the file layout changes.
    *
    * The merged generation keeps the MAX folded id, not 0: the next
    * append's id is max+1, so folded ids are never reissued and
    * [[readAsOf]] stays monotone. Publish is crash-safe: the merged
    * table is staged as a complete sibling directory (parquet's root
    * `_SUCCESS` marks it durable), then swapped in by two atomic
    * renames; [[heal]] — which every entry point runs first — rolls a
    * writer killed at any step forward (staging durable) or back (old
    * table intact in the backup). Single-writer-per-table, as for
    * every mutation here.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    heal(spark, path)
    if (!exists(spark, path)) return
    val p = new Path(path)
    val fs = fsOf(spark, p)
    val batches = fs.listStatus(p).map(_.getPath.getName)
      .collect { case n if n.startsWith("batch=") => n.stripPrefix("batch=").toLong }
    if (batches.length <= 1) return
    val genId = batches.max
    val staging = new Path(path + "._compacting")
    val backup = new Path(path + "._old")
    fs.delete(staging, true)
    fs.delete(backup, true)
    // merged read: compaction of an additively-evolved table rewrites
    // every row under the UNIFIED schema (explicit NULLs where a
    // generation predated a column), so post-compact reads no longer
    // pay the multi-footer merge
    spark.read.option("mergeSchema", "true").parquet(path)
      .withColumn("batch", org.apache.spark.sql.functions.lit(genId))
      .write.mode(SaveMode.Overwrite).partitionBy("batch")
      .parquet(staging.toString)
    renameOrThrow(fs, p, backup)
    renameOrThrow(fs, staging, p)
    fs.delete(backup, true)
  }

  /** Resolve a crashed writer: durable staging (has `_SUCCESS`) rolls
    * FORWARD — its single commit rename is completed; partial staging
    * rolls BACK (deleted). Either way readers see a complete table.
    *
    * Also MIGRATES a legacy flat-append table (loose `part-*` files at
    * the root, from the pre-batch layout) into a `batch=<n>` dir:
    * under the batch contract a flat table reads as "not a table", so
    * without migration the next `appendIfAbsent` would skip key-dedup
    * against its rows and then mix hive and non-hive layouts — which
    * parquet partition discovery rejects. The move is per-file renames
    * into one new batch dir; a crash mid-migration just leaves the
    * remaining loose files for the next heal (they land in a further
    * batch dir — readers union all batches, so placement is free).
    */
  def heal(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    // recover an interrupted [[compact]] swap first (the swap briefly
    // removes the table dir itself): durable staging (root `_SUCCESS`)
    // rolls FORWARD — checked before the backup, because a kill
    // between the two swap renames leaves BOTH and the staging is the
    // committed truth; otherwise the backup rolls BACK. With the
    // table present, leftovers are abandoned attempts — dropped.
    val staging = new Path(path + "._compacting")
    val backup = new Path(path + "._old")
    if (!fs.exists(p)) {
      if (fs.exists(new Path(staging, "_SUCCESS"))) renameOrThrow(fs, staging, p)
      else if (fs.exists(backup)) renameOrThrow(fs, backup, p)
    }
    if (fs.exists(p)) {
      if (fs.exists(backup)) fs.delete(backup, true)
      if (fs.exists(staging)) fs.delete(staging, true)
    }
    if (!fs.exists(p)) return
    fs.listStatus(p).filter(_.getPath.getName.startsWith("._staging_batch="))
      .foreach { s =>
        val target = new Path(p, s.getPath.getName.stripPrefix("._staging_"))
        if (fs.exists(new Path(s.getPath, "_SUCCESS")) && !fs.exists(target))
          renameOrThrow(fs, s.getPath, target)
        else fs.delete(s.getPath, true)
      }
    val loose = fs.listStatus(p).filter(s => s.isFile &&
      (s.getPath.getName.startsWith("part-") || s.getPath.getName == "_SUCCESS"))
    if (loose.exists(_.getPath.getName.startsWith("part-"))) {
      val dst = new Path(p, s"batch=${nextBatchId(fs, p)}")
      fs.mkdirs(dst)
      loose.foreach(s =>
        renameOrThrow(fs, s.getPath, new Path(dst, s.getPath.getName)))
    } else loose.foreach(s => fs.delete(s.getPath, false))
  }

  /** A table exists once it has ≥1 COMMITTED batch — a bare directory
    * left by a crashed first append is not a table.
    */
  private[graft] def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("batch="))
  }

  private def nextBatchId(fs: FileSystem, p: Path): Long =
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).map(_.getPath.getName)
      .collect { case n if n.startsWith("batch=") => n.stripPrefix("batch=").toLong }
      .foldLeft(-1L)(math.max) + 1L

  private def renameOrThrow(fs: FileSystem, src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"commit rename failed: $src -> $dst")

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
}
