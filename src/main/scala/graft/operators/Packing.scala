package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{HashFamily, Md5Family}

/** Training-shard packing: assign documents to fixed-token-budget
  * shards — the step that turns a filtered corpus into the contiguous
  * ~N-token files a training run actually reads.
  *
  * Documents are laid out in a deterministic pseudo-random order (hash
  * of id, so shards are source/time-decorrelated), then greedily cut
  * at running-token-count budget boundaries: a document belongs to the
  * shard its STARTING offset falls in, so every shard except possibly
  * the last holds ≥ budget tokens and shard ids are dense.
  *
  * The running count is a DISTRIBUTED PREFIX SUM, not a global-window
  * sort: range-partition by the hash order, per-partition window sums
  * run in parallel, and only the tiny per-partition totals table (one
  * row per partition) passes through a single-partition window to
  * become start offsets, broadcast back. Wall-clock is one range
  * shuffle + parallel local windows at ANY corpus size — the
  * single-partition global window the naive form needs is exactly what
  * dies at scale. The result is invariant to where the sampled range
  * boundaries land (the concatenated order is the same total order),
  * which is what the SQL oracle's global-window rendering checks.
  */
object Packing {
  def packByTokenBudget(docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Long, numParts: Int = 0,
      hashes: HashFamily = Md5Family): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val spark = docs.sparkSession
    val parts =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    // localCheckpoint FREEZES the partition layout: repartitionByRange
    // samples its boundaries, so re-evaluating this frame in the two
    // consumers below could otherwise place rows in different
    // partitions per plan — corrupting the offsets it feeds.
    val ranged = docs
      .select(col(idCol),
        size(TextAnalysis.wsTokens(col(textCol))).cast("long").as("n_tokens"),
        hashes.hash(col(idCol).cast("string")).as("_h"))
      .repartitionByRange(parts, col("_h"), col(idCol))
      .sortWithinPartitions(col("_h"), col(idCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    // one row per partition → single-partition window is fine
    val offsets = ranged.groupBy("_pid").agg(sum(col("n_tokens")).as("_ptok"))
      .withColumn("_offset",
        coalesce(sum(col("_ptok")).over(
          Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_pid", "_offset")
    val w = Window.partitionBy("_pid").orderBy(col("_h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offsets), Seq("_pid"))
      .withColumn("_cum", col("_offset") + sum(col("n_tokens")).over(w))
      // integer div: float division of long running totals loses
      // exactness past 2^53 tokens
      .withColumn("shard_id",
        expr(s"(_cum - n_tokens) div ${budgetTokens}L").cast("int"))
      .select(col(idCol), col("n_tokens"), col("shard_id"))
      .orderBy(idCol)
  }
}
