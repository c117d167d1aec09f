package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{HashFamily, XxHash64Family}

/** Distributed training for the model-based quality filter.
  *
  * [[TextAnalysis.linearQualityScore]] (q98) is the SCORING half of a
  * fastText-style quality classifier — it takes an exported weight
  * table as given. This is the TRAINING half: full-batch logistic
  * regression by gradient descent over hashed bag-of-words presence
  * features, the way a corpus-scale quality/domain classifier is
  * actually fit (hash features bound the state; a pass over the corpus
  * per iteration computes the exact batch gradient).
  *
  * Scale shape per iteration: ONE corpus pass — the (doc, bucket)
  * presence frame joins the broadcast weight table (≤ buckets+1 rows),
  * a per-doc margin aggregate (map-side combined), then a per-bucket
  * gradient aggregate whose post-combine state is `buckets` rows per
  * task. The driver loop holds only the tiny weight table
  * (localCheckpointed per step, like the Lloyd trainer in
  * `Similarity`); nothing corpus-sized collects, broadcasts, or grows
  * with iterations.
  *
  * Determinism (the q148 order-invariance rule): margins are exact
  * integer sums of micro-unit weights; the per-doc error and logloss
  * quantize to integer nanos AT BIRTH (one float expression over an
  * exact-integer margin), so gradient and loss aggregates are exact
  * integer sums — bit-identical under any partitioning, retry order,
  * or engine. The weight update is one float expression per bucket on
  * exact inputs, floored back to micros.
  */
object Classifier {

  /** Train `iters` full-batch GD steps from w=0 and report, per
    * iteration: the post-update weights and the pre-update training
    * metrics its gradient pass computed (sum of per-doc logloss in
    * nanos, and the number of correct `margin >= 0` predictions).
    *
    * Features: presence (0/1) of `hash(token) pmod buckets`, plus an
    * always-on bias feature at bucket −1. Labels must be 0/1.
    *
    * Output: (iter, bucket, w_micro, loss_sum_nano, n_correct),
    * ordered by (iter, bucket); bucket rows are the buckets observed
    * in the corpus (absent buckets have zero gradient and would stay
    * at w=0 forever).
    */
  def trainLogistic(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, buckets: Int = 64, iters: Int = 2,
      lrPpm: Long = 500000L,
      hashes: HashFamily = XxHash64Family): DataFrame = {
    require(buckets > 0 && iters >= 1 && lrPpm > 0)
    val labels = docs.select(col(idCol).as("_id"),
      col(labelCol).cast("long").as("_y")).localCheckpoint()
    val feat = docs
      .select(col(idCol).as("_id"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("_tok"))
      .select(col("_id"), pmod(hashes.hash(col("_tok")), lit(buckets))
        .cast("long").as("bucket"))
      .distinct()
      .union(labels.select(col("_id"), lit(-1L).as("bucket")))
      .localCheckpoint()
    val nDocs = labels.count() // one scalar, driver-side by design

    // weights enter iteration i as w_{i-1}; w_0 = 0 on every observed
    // bucket so the first margin pass is exactly zero
    var weights = feat.select(col("bucket")).distinct()
      .select(col("bucket"), lit(0L).as("w_micro"))
      .localCheckpoint()
    var out: DataFrame = null
    for (i <- 1 to iters) {
      val margins = feat
        .join(broadcast(weights), Seq("bucket"))
        .groupBy(col("_id")).agg(sum(col("w_micro")).as("_margin_micro"))
      val scored = labels.join(margins, Seq("_id"))
        .withColumn("_p",
          lit(1.0) / (lit(1.0)
            + exp(-(col("_margin_micro").cast("double") / lit(1e6)))))
        // quantize at birth: every cross-row aggregate below sums
        // exact integers (the q148 rule)
        .withColumn("_err_nano",
          floor((col("_p") - col("_y")) * lit(1e9) + lit(0.5)).cast("long"))
        .withColumn("_loss_nano",
          floor(-(col("_y") * log(col("_p"))
            + (lit(1L) - col("_y")) * log(lit(1.0) - col("_p")))
            * lit(1e9) + lit(0.5)).cast("long"))
        .withColumn("_correct",
          when((col("_margin_micro") >= 0) === (col("_y") === 1L), 1L)
            .otherwise(0L))
        .localCheckpoint()
      val metrics = scored.agg(
        sum(col("_loss_nano")).as("loss_sum_nano"),
        sum(col("_correct")).as("n_correct"))
      val grad = feat.join(scored.select(col("_id"), col("_err_nano")),
          Seq("_id"))
        .groupBy(col("bucket")).agg(sum(col("_err_nano")).as("_g_nano"))
      // one float expression on exact ints: lr * mean-gradient, in micros
      weights = weights.join(grad, Seq("bucket"), "left")
        .select(col("bucket"),
          (col("w_micro") - floor(
            (lit(lrPpm).cast("double") / lit(1e6))
              * (coalesce(col("_g_nano"), lit(0L)).cast("double")
                / lit(1e9) / lit(nDocs.toDouble))
              * lit(1e6) + lit(0.5)).cast("long")).as("w_micro"))
        .localCheckpoint()
      val step = weights
        .crossJoin(broadcast(metrics))
        .select(lit(i).as("iter"), col("bucket"), col("w_micro"),
          col("loss_sum_nano"), col("n_correct"))
      out = if (out == null) step else out.union(step)
    }
    out.orderBy("iter", "bucket")
  }
}
