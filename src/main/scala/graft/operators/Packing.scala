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

  /** Padding-waste report — the training-efficiency number behind
    * length-bucketed batching: sequences batched `batchSize` at a time
    * pad every member to the batch max, so the fraction of padded
    * slots is pure waste. Compares the LENGTH-SORTED batching
    * (length-bucketing's ideal) against deterministic-hash batching
    * (the shuffled-data baseline) on identical data: the gap is what
    * a bucketing stage buys. All counts exact; waste is ONE division.
    *
    * Scale note: each strategy ranks rows in one global order (the
    * q221 single-partition-window caveat — a REPORT over sequence
    * lengths, not a per-example pipeline stage; pre-bucket at extreme
    * scale). Output: (strategy, n_batches, token_slots, real_tokens,
    * waste), ordered by strategy.
    */
  def paddingReport(df: DataFrame, idCol: String, nTokensCol: String,
      batchSize: Int,
      hashes: graft.functions.HashFamily = graft.functions.Md5Family)
      : DataFrame = {
    require(batchSize >= 1, s"bad batchSize $batchSize")
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(col(idCol).as("_id"),
        col(nTokensCol).cast("long").as("_n"))
      .filter(col("_n").isNotNull).localCheckpoint()
    def strat(name: String, order: Seq[org.apache.spark.sql.Column]) =
      rows.withColumn("_r", row_number().over(Window.orderBy(order: _*)))
        .withColumn("_b", expr(s"(_r - 1) div $batchSize"))
        .groupBy(col("_b"))
        .agg(count(lit(1)).as("_c"), max(col("_n")).as("_mx"),
          sum(col("_n")).as("_tok"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("_mx") * col("_c")).as("token_slots"),
          sum(col("_tok")).as("real_tokens"))
        .select(lit(name).as("strategy"), col("n_batches"),
          col("token_slots"), col("real_tokens"),
          when(col("token_slots") > 0L,
            round((col("token_slots") - col("real_tokens")).cast("double")
              / col("token_slots").cast("double"), 6)).as("waste"))
    strat("hashed", Seq(hashes.hash(col("_id").cast("string")), col("_id")))
      .unionAll(strat("sorted", Seq(col("_n").desc, col("_id"))))
      .orderBy("strategy")
  }
}
