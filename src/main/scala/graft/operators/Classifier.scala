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
  /** The hashed bag-of-words presence featurizer `trainLogistic`
    * trains on and every scorer must reproduce bit-for-bit: distinct
    * (id, hash(token) pmod buckets) pairs plus the always-on bias
    * feature at bucket −1.
    */
  private[graft] def bowPresence(docs: DataFrame, idCol: String,
      textCol: String, buckets: Int, hashes: HashFamily): DataFrame =
    docs
      .select(col(idCol).as("_id"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("_tok"))
      .select(col("_id"), pmod(hashes.hash(col("_tok")), lit(buckets))
        .cast("long").as("bucket"))
      .distinct()
      .union(docs.select(col(idCol).as("_id"), lit(-1L).as("bucket")))

  def trainLogistic(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, buckets: Int = 64, iters: Int = 2,
      lrPpm: Long = 500000L,
      hashes: HashFamily = XxHash64Family): DataFrame = {
    require(buckets > 0 && iters >= 1 && lrPpm > 0)
    val labels = docs.select(col(idCol).as("_id"),
      col(labelCol).cast("long").as("_y")).localCheckpoint()
    val feat = bowPresence(docs, idCol, textCol, buckets, hashes)
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

  /** Per-class evaluation of any (true-label, predicted-label) table —
    * the confusion-derived report every trained filter/classifier gets
    * before it gates data: per class, the exact tp / n_true / n_pred /
    * fp / fn counts plus precision, recall, and F1. Every ratio is ONE
    * division of exact integers (F1 = 2·tp / (2·tp + fp + fn), never
    * composed from the rounded p and r) and NULL when its denominator
    * is zero. Classes are the union of observed true and predicted
    * labels. Scale shape: one (t, p) count aggregate (map-side
    * combined), then class-count joins over ≤|classes|² rows.
    *
    * Output: (class, tp, n_true, n_pred, fp, fn, prec, rec, f1),
    * ordered by class.
    */
  def classifierEval(preds: DataFrame, labelCol: String,
      predCol: String): DataFrame = {
    val pairs = preds.groupBy(col(labelCol).as("t"), col(predCol).as("p"))
      .agg(count(lit(1)).as("n")).localCheckpoint()
    val classes = pairs.select(col("t").as("class"))
      .union(pairs.select(col("p").as("class"))).distinct()
    val tp = pairs.filter(col("t") === col("p"))
      .select(col("t").as("class"), col("n").as("tp"))
    val nTrue = pairs.groupBy(col("t").as("class")).agg(sum("n").as("n_true"))
    val nPred = pairs.groupBy(col("p").as("class")).agg(sum("n").as("n_pred"))
    classes.join(tp, Seq("class"), "left")
      .join(nTrue, Seq("class"), "left")
      .join(nPred, Seq("class"), "left")
      .select(col("class"), coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"))
      .withColumn("fp", col("n_pred") - col("tp"))
      .withColumn("fn", col("n_true") - col("tp"))
      .withColumn("prec", when(col("n_pred") > 0,
        round(col("tp").cast("double") / col("n_pred"), 6)))
      .withColumn("rec", when(col("n_true") > 0,
        round(col("tp").cast("double") / col("n_true"), 6)))
      .withColumn("f1", when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
        round((lit(2L) * col("tp")).cast("double")
          / (lit(2L) * col("tp") + col("fp") + col("fn")), 6)))
      .orderBy("class")
  }

  /** Calibration curve (reliability diagram) for a probabilistic
    * scorer against a boolean outcome: scores bucket into `bins`
    * equal-width bins and each bin reports its exact count, positive
    * count, mean predicted probability, and empirical positive rate —
    * the table a threshold is chosen from. Scores must already be
    * 6dp-rounded probabilities in [0, 1] (the repo's quantize-at-birth
    * convention): they convert to exact integer micros, so bin
    * membership and the bin sums are partition-order invariant; the
    * two ratios are one division each. A score of exactly 1.0 folds
    * into the top bin. Scale shape: one map-side projection + one
    * `bins`-row aggregate.
    *
    * Output: (bin, n, n_pos, mean_p, pos_rate), ordered by bin.
    */
  /** Weight-of-evidence / information-value profile of a binned
    * numeric feature against a binary label — the classic univariate
    * predictive-power screen (credit-scoring heritage, same use here:
    * "does this quality feature separate keep/drop before I spend a
    * training run on it"). WOEᵢ = ln((gᵢ/G)/(bᵢ/B)) per bin, IV
    * contribution (gᵢ/G − bᵢ/B)·WOEᵢ; IV ≳ 0.3 = strong feature.
    *
    * Determinism: bins are fixed-width floor divisions (never ntile —
    * tie order would leak engine differences); all counts exact
    * longs; WOE's ln argument is the exact rational gᵢ·B/(bᵢ·G);
    * per-bin contributions only — a global IV sum over float terms
    * would be accumulation-order-dependent, so callers sum the
    * (deterministically rounded) contributions themselves if they
    * want the scalar. NULL woe/iv on bins missing a class.
    *
    * Scale shape: one map-side projection + one bins-sized hash
    * aggregate + a broadcast totals join.
    *
    * Output: (bin, n, n_good, n_bad, good_share 6dp, bad_share 6dp,
    * woe 6dp, iv_contrib 6dp), ordered by bin.
    */
  def woeIv(df: DataFrame, valueCol: String, labelCol: String,
      binWidth: Double, maxBin: Int): DataFrame = {
    require(binWidth > 0 && maxBin > 0, s"bad bins: $binWidth/$maxBin")
    val binned = df.select(
      least(floor(col(valueCol) / lit(binWidth)), lit(maxBin.toLong))
        .cast("int").as("bin"),
      col(labelCol).cast("int").as("_y"))
    val per = binned.groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("_y").cast("long")).as("n_good"),
        (count(lit(1)) - sum(col("_y").cast("long"))).as("n_bad"))
    val tot = per.agg(sum(col("n_good")).as("_g"), sum(col("n_bad")).as("_b"))
    val gs = col("n_good").cast("double") / col("_g").cast("double")
    val bs = col("n_bad").cast("double") / col("_b").cast("double")
    val woe = log((col("n_good") * col("_b")).cast("double")
      / (col("n_bad") * col("_g")).cast("double"))
    per.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("n_good"), col("n_bad"),
        round(gs, 6).as("good_share"),
        round(bs, 6).as("bad_share"),
        when(col("n_good") > 0L && col("n_bad") > 0L, round(woe, 6))
          .as("woe"),
        when(col("n_good") > 0L && col("n_bad") > 0L,
          round((gs - bs) * woe, 6)).as("iv_contrib"))
      .orderBy("bin")
  }

  def calibrationCurve(scored: DataFrame, scoreCol: String,
      outcomeCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && 1000000 % bins == 0,
      s"bins must divide 1e6, got $bins")
    val width = 1000000 / bins
    scored.select(
        round(col(scoreCol) * lit(1e6)).cast("long").as("p_micro"),
        col(outcomeCol).cast("int").as("_pos"))
      .withColumn("bin",
        least(expr(s"p_micro div $width"), lit((bins - 1).toLong)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("_pos")).as("n_pos"),
        sum(col("p_micro")).as("_sp"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("_sp") / (col("n") * lit(1e6)), 6).as("mean_p"),
        round(col("n_pos").cast("double") / col("n"), 6).as("pos_rate"))
      .orderBy("bin")
  }

  /** Expected Calibration Error — the one-number summary of the
    * [[calibrationCurve]]: ECE = Σ_bins (n_b/N)·|acc_b − conf_b|,
    * where acc is the bin's empirical positive rate and conf its mean
    * predicted probability. Each bin's weighted gap is ONE float
    * expression over exact integers (n_pos, n, Σp_micro, N) floored
    * to nanos at birth, so the sum is exact. Same binning contract as
    * the curve (6dp scores → exact micros, 1.0 folds into the top
    * bin). Output: one row (n_items, bins_used, ece).
    */
  def expectedCalibrationError(scored: DataFrame, scoreCol: String,
      outcomeCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && 1000000 % bins == 0,
      s"bins must divide 1e6, got $bins")
    val width = 1000000 / bins
    import org.apache.spark.sql.expressions.Window
    val byBin = scored.select(
        round(col(scoreCol) * lit(1e6)).cast("long").as("p_micro"),
        col(outcomeCol).cast("int").as("_pos"))
      .withColumn("bin",
        least(expr(s"p_micro div $width"), lit((bins - 1).toLong)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("_pos")).as("n_pos"),
        sum(col("p_micro")).as("_sp"))
    // N as a single-partition window over the ≤ bins aggregated rows —
    // a crossJoin(broadcast(byBin.agg(...))) here would RE-RUN the whole
    // upstream scored chain a second time just to count it
    byBin
      .withColumn("n_items", sum(col("n")).over(Window.partitionBy()))
      .withColumn("_term_nano", floor(
        abs(col("n_pos").cast("double") / col("n")
          - col("_sp").cast("double") / (col("n") * lit(1e6)))
          * col("n") / col("n_items") * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col("n_items"))
      .agg(count(lit(1)).as("bins_used"), sum(col("_term_nano")).as("_sn"))
      .select(col("n_items"), col("bins_used"),
        round(col("_sn").cast("double") / lit(1e9), 6).as("ece"))
  }

  /** Exact ROC-AUC of a scorer against a boolean outcome, via the
    * Mann–Whitney rank statistic with average-rank tie handling:
    * grouping by distinct 6dp score, 2·Σ(rank of positives) =
    * Σ_s p_s·(2·cum_before_s + c_s + 1) stays integer, and
    * AUC = (2R − P(P+1)) / (2·P·N_neg) is ONE exact-integer division.
    * NULL when either class is absent.
    *
    * Scale shape: one map-side projection, one distinct-score
    * aggregate, then a single-partition running sum over the DISTINCT
    * scores — bounded by the 1e6+1 score resolution, never by the
    * corpus. Output: one row (n_items, n_pos, n_neg, auc).
    */
  def rocAuc(scored: DataFrame, scoreCol: String,
      outcomeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byScore = scored.select(
        round(col(scoreCol) * lit(1e6)).cast("long").as("sc"),
        col(outcomeCol).cast("long").as("_pos"))
      .groupBy(col("sc"))
      .agg(count(lit(1)).as("c"), sum(col("_pos")).as("p"))
    val w = Window.orderBy("sc")
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("cum", coalesce(sum(col("c")).over(w), lit(0L)))
      .agg(sum(col("c")).as("n_items"), sum(col("p")).as("n_pos"),
        sum(col("p") * (lit(2L) * col("cum") + col("c") + lit(1L)))
          .as("_r2"))
      .select(col("n_items"), col("n_pos"),
        (col("n_items") - col("n_pos")).as("n_neg"),
        when(col("n_pos") > 0L && col("n_items") - col("n_pos") > 0L,
          round((col("_r2") - col("n_pos") * (col("n_pos") + lit(1L)))
            .cast("double")
            / (lit(2L) * col("n_pos") * (col("n_items") - col("n_pos"))), 6))
          .as("auc"))
  }

  /** Margin-based active-learning selection — "which documents should
    * a human label next": train the [[trainLogistic]] filter, score
    * every document with the FINAL iteration's weights, and return
    * the k documents closest to the decision boundary (smallest
    * |margin|, ties to the smaller id). Margins are exact integer
    * micro sums, so the selection is bit-deterministic.
    *
    * Scale shape: the training loop's own shape plus one scoring pass
    * (broadcast weight table, per-doc sum) and a distributed top-k —
    * never a global sort.
    *
    * Output: (rank 1..k, idCol, margin_micro), ordered by rank.
    */
  def boundarySelect(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, k: Int = 20, buckets: Int = 64, iters: Int = 2,
      lrPpm: Long = 500000L,
      hashes: HashFamily = XxHash64Family): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"need k >= 1, got $k")
    val w = trainLogistic(docs, idCol, textCol, labelCol, buckets, iters,
        lrPpm, hashes)
      .filter(col("iter") === iters)
      .select(col("bucket"), col("w_micro")).localCheckpoint()
    val margins = bowPresence(docs, idCol, textCol, buckets, hashes)
      .join(broadcast(w), Seq("bucket"))
      .groupBy(col("_id")).agg(sum(col("w_micro")).as("margin_micro"))
    margins.orderBy(abs(col("margin_micro")), col("_id")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(abs(col("margin_micro")), col("_id"))))
      .select(col("rank"), col("_id").as(idCol), col("margin_micro"))
      .orderBy("rank")
  }

  /** Cohen's kappa for the same (true, predicted) table — chance-
    * corrected agreement: κ = (N·Σtp − Σ_c n_true_c·n_pred_c)
    * / (N² − Σ_c n_true_c·n_pred_c), algebraically identical to
    * (p_o − p_e)/(1 − p_e) but evaluated as ONE division of exact
    * integers. NULL when the denominator is zero (both raters constant
    * on one class). Output: one row (n_items, n_agree, sum_ntnp,
    * kappa).
    */
  def cohenKappa(preds: DataFrame, labelCol: String,
      predCol: String): DataFrame = {
    val pairs = preds.groupBy(col(labelCol).as("t"), col(predCol).as("p"))
      .agg(count(lit(1)).as("n")).localCheckpoint()
    val agg = pairs.agg(sum("n").as("n_items"),
      sum(when(col("t") === col("p"), col("n")).otherwise(lit(0L)))
        .as("n_agree"))
    val nTrue = pairs.groupBy(col("t").as("class")).agg(sum("n").as("nt"))
    val nPred = pairs.groupBy(col("p").as("class")).agg(sum("n").as("np"))
    val exp = nTrue.join(nPred, Seq("class"))
      .agg(coalesce(sum(col("nt") * col("np")), lit(0L)).as("sum_ntnp"))
    agg.crossJoin(broadcast(exp))
      .select(col("n_items"), col("n_agree"), col("sum_ntnp"),
        when(col("n_items") * col("n_items") - col("sum_ntnp") =!= 0L,
          round((col("n_items") * col("n_agree") - col("sum_ntnp"))
            .cast("double")
            / (col("n_items") * col("n_items") - col("sum_ntnp")), 6))
          .as("kappa"))
  }
}
