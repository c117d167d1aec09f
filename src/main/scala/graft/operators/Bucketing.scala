package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (pre-shuffled) table layout for exchange-free co-located
  * joins — the storage-side answer to the shuffle that dominates big
  * fact⋈fact joins at scale.
  *
  * The reference joins its silver fact to dimension frames in-process
  * (`gold_aggr.py:96-97`), which is free at 1 row/min. At 100 TB the
  * same join is a full shuffle of both sides EVERY run. Bucketing pays
  * that shuffle ONCE at write time: both tables are written
  * `CLUSTERED BY (key) INTO n BUCKETS` (Spark's Hive-compatible
  * Murmur3 bucket spec), after which every join on the bucket key
  * plans a SortMergeJoin with NO ShuffleExchange on either side — the
  * scan's output partitioning already satisfies the join's
  * distribution requirement. A nightly pipeline that joins the same
  * fact tables dozens of times amortizes one layout write across every
  * downstream query, exactly like `ZOrder.zOrdered` amortizes one
  * range shuffle across every pruned scan.
  *
  * Written as EXTERNAL parquet tables (explicit `path`) so the layout
  * lives with the data, not the session's warehouse dir; the catalog
  * entry only carries the bucket spec. `writeBucketed` repartitions by
  * the bucket keys into `numBuckets` tasks first, so each task holds
  * exactly one bucket's rows (task hash-mod and bucket hash-mod agree)
  * and each bucket lands in ONE file — bounding file count and keeping
  * the per-bucket sort metadata usable.
  */
object Bucketing {

  /** Write `df` as an external bucketed+sorted parquet table named
    * `table` with data at `path`. Any prior catalog entry under the
    * name is dropped first (names are session-scoped; paths are not
    * reused across callers).
    */
  def writeBucketed(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      path: String,
      numBuckets: Int,
      keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "bucket keys must be non-empty")
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.repartition(numBuckets, keys.map(col): _*)
      .write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Inner-join two same-bucket-count tables on their bucket keys,
    * exchange-free. The `merge` hint pins a SortMergeJoin so the
    * planner (and AQE) cannot substitute a broadcast and mask the
    * layout's effect — the point IS the shuffle-free SMJ, and
    * `BucketingSpec` asserts no ShuffleExchange appears under it.
    */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String): DataFrame = {
    val l = spark.table(leftTable).hint("merge")
    val r = spark.table(rightTable).hint("merge")
    l.join(r, col(leftKey) === col(rightKey))
  }

  /** Drop the catalog entries created by `writeBucketed` (the data
    * path is the caller's to clean). */
  def dropTables(spark: SparkSession, tables: String*): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
}
