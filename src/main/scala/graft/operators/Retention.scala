package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort/retention analytics over an event stream — the product
  * questions ("of the users first seen on day X, how many came back N
  * days later?", "how many distinct users were active in the trailing
  * week?") asked of every event table.
  */
object Retention {
  /** Cohort retention matrix: users are cohorted by their first active
    * day; each (cohort day, day offset) cell counts the distinct users
    * from that cohort active `offset` days after their first day.
    *
    * Scale shape: activity collapses to distinct (user, day) pairs
    * first (map-side partial dedup before the shuffle), the first-seen
    * table is a hash aggregate on the SAME user key — so the join back
    * reuses the aggregate's partitioning on one side — and the final
    * matrix is a hash aggregate over cohort cells. `count(1)` is exact
    * because (user, day) pairs are distinct by construction; no
    * count-distinct shuffle is needed.
    */
  /** Kaplan–Meier survival curve for time-to-conversion — the
    * right-censoring-correct answer to "how long until a signed-up
    * user first purchases?" (naive conversion rates understate the
    * tail: users who simply haven't converted YET are not failures —
    * they are censored at the observation horizon). Per user: start =
    * first `startType` event, event = first `eventType` at-or-after
    * it, duration in exact seconds; users without the event censor at
    * the corpus max timestamp. Then the product-limit estimator
    * S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over distinct durations.
    *
    * Determinism: durations, at-risk counts, and event/censor tallies
    * are exact longs; each KM factor's ln((n−d)/n) is the log of an
    * exact rational quantized to integer nanos at birth, the running
    * product is an exact integer SUM in log space, and exp/round
    * happen once per row (the established q184/q194 exp discipline).
    * If the curve hits exactly zero (last at-risk row all events),
    * survival reports 0 and ln_survival NULL from that row on.
    *
    * Scale shape: two filtered aggregates to per-user durations, one
    * (duration)-keyed aggregate, then an UNPARTITIONED running-sum
    * window over distinct durations (users, not events — the q221
    * documented trade). Output: (t_sec, n_risk, n_events,
    * n_censored, ln_survival 6dp, survival 6dp), ordered by t_sec.
    */
  /** Per-user conversion durations (t_sec, right-censor flag) shared
    * by [[kaplanMeier]] and [[logRank]]: start = first `startType`
    * event, event = first `eventType` at-or-after it, censor at the
    * corpus max timestamp. Output: (_u, t_sec, _evt).
    */
  private def conversionDurations(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, startType: String,
      eventType: String): DataFrame = {
    val s0 = events.filter(col(typeCol) === startType)
      .groupBy(col(userCol).as("_u"))
      .agg(min(unix_timestamp(col(tsCol))).as("_t0"))
    val mx = events.agg(max(unix_timestamp(col(tsCol))).as("_tmax"))
    val p = events.filter(col(typeCol) === eventType)
      .select(col(userCol).as("_u"), unix_timestamp(col(tsCol)).as("_tp"))
    s0.join(p, Seq("_u"), "left")
      .groupBy(col("_u"), col("_t0"))
      .agg(min(when(col("_tp") >= col("_t0"), col("_tp"))).as("_tp"))
      .crossJoin(broadcast(mx))
      .select(col("_u"),
        when(col("_tp").isNotNull, col("_tp") - col("_t0"))
          .otherwise(col("_tmax") - col("_t0")).as("t_sec"),
        col("_tp").isNotNull.cast("int").as("_evt"))
  }

  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, startType: String,
      eventType: String): DataFrame = {
    val du = conversionDurations(events, userCol, tsCol, typeCol,
      startType, eventType)
    val tb = du.groupBy("t_sec")
      .agg(sum(col("_evt").cast("long")).as("d"),
        sum(lit(1L) - col("_evt").cast("long")).as("c"))
    val tot = du.agg(count(lit(1)).as("_n"))
    val w = Window.orderBy("t_sec")
    val km = tb.crossJoin(broadcast(tot))
      .withColumn("n_risk", col("_n") - coalesce(
        sum(col("d") + col("c"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_term", when(col("d") > 0L && col("n_risk") > col("d"),
        floor(log((col("n_risk") - col("d")).cast("double")
          / col("n_risk").cast("double")) * lit(1e9) + lit(0.5))
          .cast("long")).otherwise(lit(0L)))
      .withColumn("_hit0",
        (col("d") > 0L && col("d") === col("n_risk")).cast("int"))
    km
      .withColumn("_cum",
        sum(col("_term")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_z",
        max(col("_hit0")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("t_sec"), col("n_risk"), col("d").as("n_events"),
        col("c").as("n_censored"),
        when(col("_z") === 0,
          round(col("_cum").cast("double") / lit(1e9), 6))
          .as("ln_survival"),
        when(col("_z") === 1, lit(0.0))
          .otherwise(round(exp(col("_cum").cast("double") / lit(1e9)), 6))
          .as("survival"))
      .orderBy("t_sec")
  }

  /** Log-rank test between two md5-randomized arms' conversion
    * curves — "did the treatment change time-to-conversion?" with
    * censoring handled correctly (a naive conversion-rate compare
    * throws away WHEN, and mishandles users still waiting). At each
    * distinct duration with events: O₁ = arm-A events, E₁ = d·n₁/n,
    * V = d·n₁·(n−n₁)·(n−d)/(n²·(n−1)); χ² = (ΣO−ΣE)²/ΣV ~ χ²(1).
    *
    * Determinism: at-risk/event tallies exact longs; each per-time
    * (O−E) and V term is ONE mirrored float expression, quantized to
    * integer nanos at birth so the sums are exact; χ² squares by
    * explicit self-multiplication. NULL χ² when ΣV = 0 (no comparable
    * event times). The V term's integer products are split into two
    * QUADRATIC factors — d·(n−d) and n₁·(n−n₁), each exact long up to
    * n ≈ 6e9, multiplied as doubles in an order mirrored verbatim in
    * the oracle — because the naive 4-factor long product
    * d·n₁·(n−n₁)·(n−d) exceeds Long.MaxValue (ANSI
    * ARITHMETIC_OVERFLOW) once n reaches ~1.1e5 (n⁴/16 > 2⁶³); the
    * cubic denominator n²·(n−1) is split the same way.
    *
    * Scale shape: [[conversionDurations]]' aggregates plus one
    * duration-keyed aggregate and an unpartitioned running window
    * over distinct durations (users, not events). Output: one row
    * (n_a, n_b, events_a, events_b, oe_a 6dp, var_lr 6dp, chi2 6dp).
    */
  def logRank(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, startType: String, eventType: String,
      hashes: graft.functions.HashFamily = graft.functions.Md5Family)
      : DataFrame = {
    val du = conversionDurations(events, userCol, tsCol, typeCol,
      startType, eventType)
      .withColumn("_a",
        (pmod(hashes.hash(col("_u").cast("string")), lit(2L)) === 0L)
          .cast("int"))
    val tb = du.groupBy("t_sec")
      .agg(count(lit(1)).as("all"), sum(col("_evt").cast("long")).as("d"),
        sum((col("_a") * col("_evt")).cast("long")).as("d1"),
        sum(col("_a").cast("long")).as("all1"))
    val tot = du.agg(count(lit(1)).as("_n"), sum(col("_a").cast("long"))
      .as("_n1"), sum(col("_evt").cast("long")).as("_dtot"),
      sum((col("_a") * col("_evt")).cast("long")).as("_dtot1"))
    val w = Window.orderBy("t_sec")
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    val km = tb.crossJoin(broadcast(tot))
      .withColumn("n",
        col("_n") - coalesce(sum(col("all")).over(prior), lit(0L)))
      .withColumn("n1",
        col("_n1") - coalesce(sum(col("all1")).over(prior), lit(0L)))
      .filter(col("d") > 0L && col("n") > 1L)
      .withColumn("_oe_nano",
        floor((col("d1") * col("n") - col("d") * col("n1")).cast("double")
          * lit(1e9) / col("n").cast("double") + lit(0.5)).cast("long"))
      .withColumn("_v_nano",
        floor((col("d") * (col("n") - col("d"))).cast("double")
          * (col("n1") * (col("n") - col("n1"))).cast("double")
          * lit(1e9)
          / ((col("n") * col("n")).cast("double")
            * (col("n") - 1L).cast("double"))
          + lit(0.5)).cast("long"))
    val agg = km.agg(coalesce(sum(col("_oe_nano")), lit(0L)).as("_soe"),
      coalesce(sum(col("_v_nano")), lit(0L)).as("_sv"))
    tot.crossJoin(broadcast(agg))
      .select(col("_n1").as("n_a"), (col("_n") - col("_n1")).as("n_b"),
        col("_dtot1").as("events_a"),
        (col("_dtot") - col("_dtot1")).as("events_b"),
        round(col("_soe").cast("double") / lit(1e9), 6).as("oe_a"),
        round(col("_sv").cast("double") / lit(1e9), 6).as("var_lr"),
        when(col("_sv") > 0L, round(
          (col("_soe").cast("double") / lit(1e9))
            * (col("_soe").cast("double") / lit(1e9))
            / (col("_sv").cast("double") / lit(1e9)), 6)).as("chi2"))
  }

  def cohortMatrix(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val act = events
      .select(col(userCol).as("user"), to_date(col(tsCol)).as("d"))
      .distinct()
    val first = act.groupBy("user").agg(min(col("d")).as("cohort_d"))
    act.join(first, Seq("user"))
      .groupBy(col("cohort_d"),
        datediff(col("d"), col("cohort_d")).as("offset_days"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Trailing-`windowDays` distinct active users per day.
    *
    * A day-range self-join (day d ⋈ activity in [d−6, d]) would
    * replicate the whole activity table per overlapping day WITH skew;
    * instead each distinct (user, day) pair fans out map-side to the
    * `windowDays` target days it contributes to (a bounded ×7
    * expansion), the fan-out is trimmed to days that actually occur
    * (broadcast semi-join against the tiny distinct-day table), and one
    * exact count-distinct aggregate per target day finishes the job.
    * Row volume is windowDays·|distinct pairs| regardless of how
    * skewed per-day traffic is.
    */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    val act = events
      .select(col(userCol).as("user"), to_date(col(tsCol)).as("d"))
      .distinct()
    val days = act.select(col("d").as("target_d")).distinct()
    act
      .select(col("user"),
        explode(sequence(col("d"), date_add(col("d"), windowDays - 1)))
          .as("target_d"))
      .join(broadcast(days), Seq("target_d"), "left_semi")
      .groupBy("target_d")
      .agg(count_distinct(col("user")).as("active_users"))
  }
}
