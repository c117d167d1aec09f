package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experimentation readouts over user-level metric tables — the A/B
  * analysis a data platform runs on hash-randomized assignments:
  * CUPED variance reduction (Deng et al. 2013, the pre-period
  * covariate adjustment every large experimentation platform applies)
  * and the minimum-detectable-effect planning report.
  *
  * Determinism discipline: callers quantize metrics to integer units
  * AT BIRTH (per-event, before any cross-row sum); every aggregate
  * here is an exact integer sum, and each reported statistic is ONE
  * float expression over those sums — partition-order and engine
  * invariant. Exact-long headroom: Σ x_u·y_u over users must fit
  * int64 — milli-unit quantization keeps test-scale corpora
  * comfortable; quantize coarser at extreme scale.
  */
object Experiment {

  /** CUPED-adjusted experiment readout. Input: one row per user with
    * (armCol, xCol, yCol) — x the PRE-period covariate and y the
    * experiment metric, both exact integer units. Pooled
    * θ = (n·Σxy − Σx·Σy)/(n·Σxx − Σx²) over all users (NULL x-variance
    * degrades to the raw readout, θ = 0), and each arm reports its raw
    * and adjusted means: adj = (Σy_a − θ·(Σx_a − n_a·x̄))/n_a. ρ² is
    * the theoretical variance-reduction fraction.
    *
    * Scale shape: one scalar aggregate over users + one per-arm
    * aggregate; nothing user-scale crosses twice.
    *
    * Output: (arm, n_users, mean_y, adj_mean_y, theta, rho2),
    * ordered by arm.
    */
  def cuped(metrics: DataFrame, armCol: String, xCol: String,
      yCol: String): DataFrame = {
    val rows = metrics.select(col(armCol).as("arm"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val tot = rows.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val arms = rows.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"), sum(col("x")).as("sxa"),
        sum(col("y")).as("sya"))
    val denomX = col("n").cast("double") * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val denomY = col("n").cast("double") * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    val covN = col("n").cast("double") * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    arms.crossJoin(broadcast(tot))
      .withColumn("_theta", when(denomX > 0.0, covN / denomX)
        .otherwise(lit(0.0)))
      .withColumn("_rho2", when(denomX > 0.0 && denomY > 0.0,
        covN * covN / (denomX * denomY)).otherwise(lit(0.0)))
      .select(col("arm"), col("n_users"),
        round(col("sya").cast("double") / col("n_users"), 6).as("mean_y"),
        round((col("sya").cast("double")
          - col("_theta") * (col("sxa").cast("double")
            - col("n_users").cast("double") * (col("sx").cast("double")
              / col("n").cast("double"))))
          / col("n_users"), 6).as("adj_mean_y"),
        round(col("_theta"), 6).as("theta"),
        round(col("_rho2"), 6).as("rho2"))
      .orderBy("arm")
  }

  /** Sample-ratio-mismatch check — the first thing a trustworthy
    * experiment platform validates: are the arm sizes consistent with
    * the intended uniform split? Chi-square goodness-of-fit against
    * equal allocation: Σ_arms (o·k − N)²/(N·k), each term ONE float
    * expression over exact integer counts floored to nanos at birth
    * (the [[StatTests.chiSquare]] discipline), dof = k − 1. A large
    * value means the assignment or logging pipeline is dropping one
    * arm's traffic and every downstream readout is suspect.
    *
    * Output: one row (n_items, n_arms, dof, chi2).
    */
  def srmCheck(metrics: DataFrame, armCol: String): DataFrame = {
    val arms = metrics.groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).as("o")).localCheckpoint()
    val tot = arms.agg(sum(col("o")).as("n"), count(lit(1)).as("k"))
    arms.crossJoin(broadcast(tot))
      .withColumn("_t_nano", floor(
        ((col("o") * col("k") - col("n")).cast("double")
          * (col("o") * col("k") - col("n")).cast("double")
          / (col("n") * col("k")).cast("double"))
          * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col("n"), col("k"))
      .agg(sum(col("_t_nano")).as("_sn"))
      .select(col("n").as("n_items"), col("k").as("n_arms"),
        (col("k") - 1).as("dof"),
        round(col("_sn").cast("double") / lit(1e9), 6).as("chi2"))
  }

  /** Minimum-detectable-effect planning report for a two-arm test on
    * the same user-level metric: with the observed pooled sample
    * variance s² and n users per arm (the smaller arm, conservative),
    * MDE_abs = (z_{1−α/2} + z_{power})·√(2s²/n) at the conventional
    * α = 5% / power = 80% (z constants are fixed literals, not a
    * quantile function — cross-engine by construction). s² from exact
    * integer sums, the rest one float expression.
    *
    * Output: one row (n_users, n_per_arm, mean_y, var_y, mde_abs,
    * mde_rel).
    */
  def minimumDetectableEffect(metrics: DataFrame, armCol: String,
      yCol: String): DataFrame = {
    // z_{0.975} + z_{0.80} as ONE parsed literal — summing the two
    // constants at runtime could differ from the oracle's parse by an
    // ulp
    val z = 2.801585
    val rows = metrics.select(col(armCol).as("arm"),
      col(yCol).cast("long").as("y"))
    val tot = rows.agg(count(lit(1)).as("n_users"), sum(col("y")).as("sy"),
      sum(col("y") * col("y")).as("syy"))
    val minArm = rows.groupBy(col("arm")).agg(count(lit(1)).as("_na"))
      .agg(min(col("_na")).as("n_per_arm"))
    tot.crossJoin(broadcast(minArm))
      .withColumn("_var", when(col("n_users") > 1L,
        (col("n_users").cast("double") * col("syy").cast("double")
          - col("sy").cast("double") * col("sy").cast("double"))
          / (col("n_users").cast("double")
            * (col("n_users") - 1).cast("double"))))
      .withColumn("_mde", when(col("n_per_arm") > 0L,
        lit(z) * sqrt(lit(2.0) * col("_var")
          / col("n_per_arm").cast("double"))))
      .select(col("n_users"), col("n_per_arm"),
        round(col("sy").cast("double") / col("n_users"), 6).as("mean_y"),
        round(col("_var"), 6).as("var_y"),
        round(col("_mde"), 6).as("mde_abs"),
        when(col("sy") > 0L, round(col("_mde")
          / (col("sy").cast("double") / col("n_users").cast("double")), 6))
          .as("mde_rel"))
  }

  /** Bradley–Terry strength fitting (Bradley & Terry 1952; Hunter's
    * MM iteration, 2004) over a pairwise win table — preference-data
    * QA: given "a beat b" counts (human preference pairs, model
    * head-to-heads), recover per-player latent strengths. The MM
    * update s_i ← W_i / Σ_{j≠i} n_ij/(s_i+s_j) runs a FIXED number of
    * unrolled rounds with strengths re-quantized to ppm after every
    * round and each denominator term quantized to nanos BEFORE the
    * sum — exact-integer accumulation, so the whole iteration chain
    * replays bit-identically in SQL regardless of partition or engine
    * summation order (the q231/q263 recurrence discipline).
    *
    * Scale shape: the player table is |players| rows (bounded — 5
    * event types here; thousands for real model leaderboards): each
    * round is two joins of the n_ij pair table against the strength
    * table and one grouped exact-integer sum, all map-side-combinable;
    * `matches` itself can be petabyte-derived (the caller aggregates
    * raw comparisons down to the win table first).
    *
    * Input: (a, b, wins) ordered pairs. Output per player: total
    * wins, s_ppm after `rounds` MM rounds, ordered by player.
    */
  def bradleyTerry(matches: DataFrame, rounds: Int = 8): DataFrame = {
    val n = matches.select(col("a"), col("b"), col("wins"))
      .union(matches.select(col("b").as("a"), col("a").as("b"), col("wins")))
      .groupBy("a", "b").agg(sum(col("wins")).as("n_ab"))
      .filter(col("n_ab") > 0L) // zero-count pairs carry no information
      .localCheckpoint() // feeds every round twice (the self-join rule)
    // Player universe = everyone who PLAYED (both columns of n), not
    // just winners: a winless player's n_ij terms must stay in
    // opponents' MM denominators (seeding from winners only silently
    // fits a reduced tournament and skews every strength). Winless
    // players report w_total 0 and reach s_ppm 0 after round 1 — the
    // BT MLE boundary — while their pair terms keep counting. An edge
    // never has two zero-strength endpoints (its head-to-head had a
    // winner), so round denominators stay positive.
    val w = n.select(col("a").as("player")).distinct()
      .join(matches.groupBy(col("a").as("player"))
        .agg(sum(col("wins")).as("_w")), Seq("player"), "left")
      .select(col("player"), coalesce(col("_w"), lit(0L)).as("w_total"))
      .localCheckpoint() // joined every round + the final readout
    var s = w.select(col("player"), lit(1000000L).as("s_ppm"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val den = n
        .join(s.select(col("player").as("a"), col("s_ppm").as("si")), Seq("a"))
        .join(s.select(col("player").as("b"), col("s_ppm").as("sj")), Seq("b"))
        .withColumn("term_nano",
          expr("cast(round(n_ab * 1000000.0d / (si + sj) * 1e9d) as bigint)"))
        .groupBy(col("a").as("player"))
        .agg(sum(col("term_nano")).as("den_nano"))
      s = w.join(den, Seq("player"))
        .withColumn("s_ppm", expr(
          "cast(round(w_total * 1e9d / den_nano * 1000000.0d) as bigint)"))
        .select("player", "s_ppm")
        .localCheckpoint()
    }
    w.join(s, Seq("player"))
      .select(col("player"), col("w_total"), col("s_ppm"))
      .orderBy("player")
  }
}
