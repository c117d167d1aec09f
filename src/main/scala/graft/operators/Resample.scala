package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling: bucket an irregular event
  * stream to a fixed step, materialize every bucket between each key's
  * first and last observation, and fill the empty ones (forward-fill
  * and linear interpolation).
  *
  * This is the missing-minute repair a cadence feed needs before
  * window features are trustworthy: the reference's source is a 1-row-
  * per-minute feed (`/root/reference/pipelines/bronze_ingest.py:25-30`)
  * whose gold moving averages silently span gaps when rows are missing
  * (`gold_aggr.py:104-177`); resampling to the declared cadence makes
  * the gap explicit (`ffill_age_sec`) and fillable.
  *
  * Scale shape (100 TB honest):
  *   - per-bucket aggregation: ONE shuffle on (key, bucket), map-side
  *     partial aggregation;
  *   - grid generation: per-key bounds (tiny groupBy) exploded in
  *     CHUNK-bounded `sequence()` slices — no single array ever
  *     exceeds CHUNK elements no matter how long the span, so a
  *     key spanning years at 1 s cadence cannot blow a task;
  *   - fill: grid ∪ observations, ONE window shuffle on the key —
  *     forward and backward neighbors both read from the same sort
  *     (two frames over one ordering), the same cost bound as any
  *     partitioned window.
  * No joins, no cartesian grid×obs product, nothing driver-side.
  */
object Resample {

  /** Bound on any one generated `sequence()` array. */
  private val Chunk = 1024L

  /** Epoch-second bucket floor of `tsCol` at `stepSeconds`. */
  private def bucketCol(tsCol: String, stepSeconds: Long) =
    expr(s"unix_timestamp($tsCol) DIV $stepSeconds * $stepSeconds")

  /** Resample `df` to a `stepSeconds` grid per `keyCol`.
    *
    * Output, one row per (key, bucket) from each key's min to max
    * observed bucket, ordered by (key, bucket_sec):
    *   - `bucket_sec`   LONG epoch seconds (grid point)
    *   - `n_obs`        rows observed in the bucket (0 on gap rows)
    *   - `obs_value`    round(avg(value), 6) of the bucket, NULL on gaps
    *   - `ffill_value`  latest non-gap `obs_value` at or before the bucket
    *   - `ffill_age_sec` seconds since that observation (0 when present)
    *   - `interp_value` linear interpolation between the previous and
    *     next observed buckets; the observed value on non-gap rows; the
    *     forward-fill after the last observation (nothing precedes the
    *     first: the grid starts at an observed bucket by construction)
    *
    * The bucket value is the bucket MEAN — deterministic under
    * `round(_, 6)` without needing a tie-break row id, and the same
    * convention a pandas `resample().mean()` user expects.
    */
  def resample(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val obs = df
      .select(col(keyCol), bucketCol(tsCol, stepSeconds).as("bucket_sec"),
        col(valueCol).as("_v"))
      .groupBy(keyCol, "bucket_sec")
      .agg(count(lit(1)).as("_n_obs"), round(avg(col("_v")), 6).as("_val"))

    val bounds = obs.groupBy(keyCol)
      .agg(min("bucket_sec").as("_bmin"), max("bucket_sec").as("_bmax"))
      // `div`, not `/`: long `/` is DOUBLE division (CLAUDE.md trap) —
      // only exact while deltas are step-aligned multiples below 2^53,
      // an invariant no caller enforces. Operands are non-negative, so
      // truncating div == floor.
      .withColumn("_n_steps",
        call_function("div", col("_bmax") - col("_bmin"), lit(stepSeconds)))
    // Two bounded explodes: chunks of the step index range, then the
    // offsets inside each chunk — every sequence() array ≤ Chunk long.
    val grid = bounds
      .select(col(keyCol), col("_bmin"), col("_n_steps"),
        explode(sequence(lit(0L),
          call_function("div", col("_n_steps"), lit(Chunk))))
          .as("_chunk"))
      .select(col(keyCol), col("_bmin"), col("_chunk"), col("_n_steps"),
        explode(sequence(lit(0L),
          least(lit(Chunk - 1L), col("_n_steps") - col("_chunk") * lit(Chunk))))
          .as("_i"))
      .select(col(keyCol),
        (col("_bmin") + (col("_chunk") * lit(Chunk) + col("_i")) * lit(stepSeconds))
          .as("bucket_sec"))

    val unioned = obs.withColumn("_side", lit(0))
      .unionByName(grid
        .withColumn("_n_obs", lit(null) cast "long")
        .withColumn("_val", lit(null) cast "double")
        .withColumn("_side", lit(1)))

    val ord = Window.partitionBy(keyCol).orderBy(col("bucket_sec"), col("_side"))
    val back = ord.rowsBetween(Window.unboundedPreceding, 0)
    // The forward neighbor is NOT first() over (0, unboundedFollowing):
    // Spark evaluates an UnboundedFollowing frame by re-scanning the
    // remainder of the partition for EVERY row — O(n²) per key (9 s at
    // 105k grid rows; 60× worse at a year of minutes). A reversed sort
    // with a growing UnboundedPreceding frame computes the same value
    // incrementally in O(n): same single exchange (identical
    // partitioning), one extra in-partition sort.
    val fwd = Window.partitionBy(keyCol)
      .orderBy(col("bucket_sec").desc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val obsBucket = when(col("_val").isNotNull, col("bucket_sec"))
    val filled = unioned
      .withColumn("_fv", last(col("_val"), ignoreNulls = true).over(back))
      .withColumn("_fb", last(obsBucket, ignoreNulls = true).over(back))
      .withColumn("_fn", last(col("_n_obs"), ignoreNulls = true).over(back))
      .withColumn("_nv", last(col("_val"), ignoreNulls = true).over(fwd))
      .withColumn("_nb", last(obsBucket, ignoreNulls = true).over(fwd))
      .filter(col("_side") === 1)
    val present = col("_fb") === col("bucket_sec")
    filled.select(
      col(keyCol),
      col("bucket_sec"),
      when(present, col("_fn")).otherwise(lit(0L)).as("n_obs"),
      when(present, col("_fv")).as("obs_value"),
      col("_fv").as("ffill_value"),
      (col("bucket_sec") - col("_fb")).as("ffill_age_sec"),
      round(
        when(present, col("_fv"))
          .when(col("_fv").isNotNull && col("_nv").isNotNull,
            col("_fv") + (col("_nv") - col("_fv")) *
              (col("bucket_sec") - col("_fb")) / (col("_nb") - col("_fb")))
          .otherwise(col("_fv")),
        6).as("interp_value"))
      .orderBy(keyCol, "bucket_sec")
  }

  /** Per-key cadence report WITHOUT materializing the grid: expected
    * vs present bucket counts and the longest gap, from the observed
    * buckets alone (distinct + one lead window + one aggregate —
    * strictly cheaper than `resample` when only the report is needed).
    *
    *   - `n_expected`  grid size from min to max observed bucket
    *   - `n_present`   buckets with ≥1 row
    *   - `n_missing`   n_expected - n_present
    *   - `max_gap_sec` longest run of missing grid time (0 = gap-free)
    */
  def gapReport(df: DataFrame, keyCol: String, tsCol: String,
      stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    gapFromBuckets(
      df.select(col(keyCol), bucketCol(tsCol, stepSeconds).as("bucket_sec"))
        .distinct(),
      keyCol, stepSeconds)
  }

  /** The report body over an already-bucketed distinct
    * (key, bucket_sec) frame — shared with the streaming cadence
    * store, whose persisted state IS this frame.
    */
  private[graft] def gapFromBuckets(obs: DataFrame, keyCol: String,
      stepSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy("bucket_sec")
    obs.withColumn("_nb", lead(col("bucket_sec"), 1).over(w))
      .groupBy(keyCol)
      .agg(
        ((max("bucket_sec") - min("bucket_sec")) / lit(stepSeconds) cast "long")
          .plus(lit(1L)).as("n_expected"),
        count(lit(1)).as("n_present"),
        (((max("bucket_sec") - min("bucket_sec")) / lit(stepSeconds) cast "long")
          .plus(lit(1L)) - count(lit(1))).as("n_missing"),
        coalesce(max(col("_nb") - col("bucket_sec") - lit(stepSeconds)), lit(0L))
          .as("max_gap_sec"))
      .orderBy(keyCol)
  }

  /** Additive seasonal decomposition of the event-volume series —
    * classical trend (centered moving average over one full period +
    * 1 rows), seasonal (per-phase mean of the detrended series), and
    * residual, with a Poisson-style anomaly flag
    * |residual| > 3·√trend. The "is this hour's traffic off-profile
    * AFTER accounting for time-of-day" monitor next to [[gapReport]]
    * (missing data) and `Sessions.cusumDaily` (level shifts).
    *
    * Determinism (the q148 rule): counts are exact longs on a dense
    * zero-filled grid; the detrended value is kept as the exact
    * integer den·x − Σwindow (den = 2·halfWindow+1), per-phase
    * seasonal sums stay exact longs, and trend/seasonal/residual each
    * evaluate float division in ONE mirrored expression. Edge buckets
    * without a full centered window carry NULL trend/residual; a
    * phase with no full-window rows carries NULL seasonal.
    *
    * Scale shape: one map-side-combined bucket count collapses events
    * to the grid (≤ span/step rows), the chunked-sequence grid join
    * zero-fills, then one O(n·window) sliding window and a
    * period-sized broadcast join. The window runs UNPARTITIONED over
    * the bucket series — fine at bucket cardinality (hours/days), not
    * something to point at raw events; shard by key first if a keyed
    * variant is ever needed.
    *
    * Output: (bucket_sec, phase, cnt, trend 6dp, seasonal 6dp,
    * residual 6dp, is_anomaly) ordered by bucket_sec.
    */
  def seasonalDecompose(df: DataFrame, tsCol: String,
      stepSeconds: Long = 3600L, period: Int = 24,
      halfWindow: Int = 12): DataFrame =
    seasonalFromBuckets(
      df.select(bucketCol(tsCol, stepSeconds).as("bucket_sec"))
        .groupBy("bucket_sec").agg(count(lit(1)).as("cnt")),
      stepSeconds, period, halfWindow)

  /** The decomposition body over an already-bucketed (bucket_sec,
    * cnt) frame — shared with the streaming seasonal store, whose
    * persisted mergeable state IS this frame (fold = exact sum).
    */
  private[graft] def seasonalFromBuckets(bucketCounts: DataFrame,
      stepSeconds: Long, period: Int, halfWindow: Int): DataFrame = {
    require(stepSeconds > 0 && period > 1 && halfWindow > 0,
      s"bad step/period/halfWindow: $stepSeconds/$period/$halfWindow")
    val den = 2L * halfWindow + 1L
    val obs = bucketCounts.groupBy("bucket_sec")
      .agg(sum(col("cnt")).as("cnt"))
    val bounds = obs
      .agg(min("bucket_sec").as("_bmin"), max("bucket_sec").as("_bmax"))
      // Same `div`-not-`/` discipline as [[resample]]: this
      // private[graft] entry point is also fed by the streaming
      // seasonal store, whose bucket alignment it must not assume.
      .withColumn("_n_steps",
        call_function("div", col("_bmax") - col("_bmin"), lit(stepSeconds)))
    val grid = bounds
      .select(col("_bmin"), col("_n_steps"),
        explode(sequence(lit(0L),
          call_function("div", col("_n_steps"), lit(Chunk))))
          .as("_chunk"))
      .select(col("_bmin"), col("_chunk"), col("_n_steps"),
        explode(sequence(lit(0L),
          least(lit(Chunk - 1L), col("_n_steps") - col("_chunk") * lit(Chunk))))
          .as("_i"))
      .select((col("_bmin")
        + (col("_chunk") * lit(Chunk) + col("_i")) * lit(stepSeconds))
        .as("bucket_sec"))
    val dense = grid.join(obs, Seq("bucket_sec"), "left")
      .select(col("bucket_sec"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val w = Window.orderBy("bucket_sec").rowsBetween(-halfWindow, halfWindow)
    val t = dense
      .withColumn("_wn", count(lit(1)).over(w))
      .withColumn("_wsum", when(col("_wn") === den, sum(col("cnt")).over(w)))
      .withColumn("_detr", lit(den) * col("cnt") - col("_wsum"))
      .withColumn("phase",
        (expr(s"bucket_sec div $stepSeconds") % period).cast("int"))
    val seas = t.filter(col("_detr").isNotNull)
      .groupBy("phase")
      .agg(sum(col("_detr")).as("_snum"), count(lit(1)).as("_scnt"))
    val trendD = col("_wsum").cast("double") / lit(den.toDouble)
    val seasD = col("_snum").cast("double") /
      (lit(den) * col("_scnt")).cast("double")
    val residD = col("cnt").cast("double") - trendD - seasD
    t.join(broadcast(seas), Seq("phase"), "left")
      .select(col("bucket_sec"), col("phase"), col("cnt"),
        round(trendD, 6).as("trend"),
        round(seasD, 6).as("seasonal"),
        round(residD, 6).as("residual"),
        when(col("_wsum").isNotNull && col("_snum").isNotNull,
          (abs(residD) > lit(3.0) * sqrt(trendD)).cast("int"))
          .as("is_anomaly"))
      .orderBy("bucket_sec")
  }

  /** Exponentially-weighted moving average per key — the recursive
    * smoother behind drift dashboards and cadence anomaly baselines:
    * s₁ = v₁, sᵢ = (α·vᵢ + (1−α)·sᵢ₋₁), α given in ppm.
    *
    * Determinism (the q148 rule, applied to a RECURRENCE): values
    * quantize to integer micros at birth and every step is exact
    * integer arithmetic — sᵢ = ⌊(α_ppm·vᵢ + (1e6−α_ppm)·sᵢ₋₁)/1e6⌋,
    * the floor via subtract-pmod-then-divide so it is exact for either
    * sign (Spark `div`/DuckDB `//` truncate and would disagree with
    * floor on negatives). Step order is the (ts, v_micro) sort, total
    * even under duplicate timestamps.
    *
    * Scale shape: a linear recurrence cannot shuffle-parallelize
    * WITHIN a key without changing the floor-per-step semantics, so
    * each key's series folds in one task: one groupBy(key) shuffle,
    * then an in-row `aggregate` over the sorted series. Per-key series
    * length must fit a task (the `Packing`/`Chunking` bound); the
    * accumulator append is O(n²) in copying per key — fine for
    * cadence-feed series, pre-chunk by epoch for million-row keys.
    *
    * Output: (keyCol, step 1-based, ts_sec, v_micro, s_micro,
    * ewma 6dp), ordered by (keyCol, step) — `step` keeps the row
    * order unambiguous even under fully duplicate (ts, value) pairs,
    * whose smoothed values differ by chain position.
    */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      alphaPpm: Long = 300000L): DataFrame =
    ewmaWith(df, keyCol, tsCol, valueCol, alphaPpm, state = None)

  /** [[ewma]] SEEDED from persisted per-key state — the incremental/
    * streaming form: `state` rows (keyCol, step0, s0_micro) are each
    * key's last emitted step and smoothed value; the batch's first
    * observation then applies the recurrence against s0 instead of
    * self-seeding, and steps continue from step0. Feeding time-ordered
    * batches through this is EXACTLY the one-shot fold (the q234
    * streaming store's contract, spec-proved).
    */
  def ewmaWith(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, alphaPpm: Long,
      state: Option[DataFrame]): DataFrame = {
    require(alphaPpm > 0 && alphaPpm <= 1000000L,
      s"alphaPpm must be in (0, 1e6], got $alphaPpm")
    val m = lit(1000000L)
    // After the pmod subtraction the operand is an exact multiple of m,
    // so truncating integer `div` equals floor — and stays EXACT past
    // 2^53, where `/` (double division on longs) would shed low bits
    // and silently diverge from the oracle's integer `//`.
    def floorDivM(a: Column): Column =
      call_function("div", a - pmod(a, m), m)
    def step(v: Column, s: Column): Column =
      floorDivM(lit(alphaPpm) * v + (m - lit(alphaPpm)) * s)
    val rows = df.select(col(keyCol).as("_k"),
      unix_timestamp(col(tsCol)).as("ts_sec"),
      round(col(valueCol) * lit(1e6)).cast("long").as("v_micro"))
    val grouped = rows
      .groupBy(col("_k"))
      .agg(array_sort(collect_list(struct(col("ts_sec"), col("v_micro"))))
        .as("_series"))
    val seeded = state match {
      case Some(s) => grouped.join(
        s.select(col(keyCol).as("_k"), col("step0").as("_step0"),
          col("s0_micro").as("_s0")), Seq("_k"), "left")
      case None => grouped
        .withColumn("_step0", lit(null).cast("long"))
        .withColumn("_s0", lit(null).cast("long"))
    }
    val folded = seeded
      .withColumn("_out", aggregate(
        col("_series"),
        expr("CAST(array() AS ARRAY<STRUCT<ts_sec: BIGINT, v_micro: BIGINT, s_micro: BIGINT>>)"),
        (acc, x) => concat(acc, array(struct(
          x.getField("ts_sec").as("ts_sec"),
          x.getField("v_micro").as("v_micro"),
          when(size(acc) === 0,
            when(col("_s0").isNull, x.getField("v_micro"))
              .otherwise(step(x.getField("v_micro"), col("_s0"))))
            .otherwise(step(x.getField("v_micro"),
              element_at(acc, -1).getField("s_micro")))
            .as("s_micro"))))))
    folded.select(col("_k").as(keyCol), col("_step0"),
        posexplode(col("_out")).as(Seq("_p", "_e")))
      .select(col(keyCol),
        (col("_p") + 1 + coalesce(col("_step0"), lit(0L))).cast("long")
          .as("step"),
        col("_e.ts_sec").as("ts_sec"),
        col("_e.v_micro").as("v_micro"), col("_e.s_micro").as("s_micro"),
        round(col("_e.s_micro") / lit(1e6), 6).as("ewma"))
      .orderBy(keyCol, "step")
  }

  /** Holt linear (double-exponential) smoothing per key — [[ewma]]
    * plus an explicit trend state, the one-step-ahead forecaster
    * cadence dashboards run:
    *   l₁ = x₁, b₁ = 0;
    *   lᵢ = ⌊(α·xᵢ + (1e6−α)·(lᵢ₋₁ + bᵢ₋₁))/1e6⌋,
    *   bᵢ = ⌊(β·(lᵢ − lᵢ₋₁) + (1e6−β)·bᵢ₋₁)/1e6⌋,
    *   forecast = l + b.
    * Same exact-integer-recurrence contract as [[ewma]] (values
    * quantize to micros at birth, floor via subtract-pmod-then-div so
    * negative trends floor identically to DuckDB's mirrored form,
    * (ts, v_micro) step order total under duplicates) and the same
    * scale shape: one groupBy(key) shuffle, the coupled recurrence
    * folds in-row — a linear recurrence cannot shuffle-parallelize
    * within a key without changing per-step floors.
    *
    * Output: (keyCol, step 1-based, ts_sec, v_micro, l_micro,
    * b_micro, level 6dp, trend 6dp, forecast 6dp), by (keyCol, step).
    */
  def holt(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, alphaPpm: Long = 300000L,
      betaPpm: Long = 100000L): DataFrame = {
    require(alphaPpm > 0 && alphaPpm <= 1000000L
      && betaPpm > 0 && betaPpm <= 1000000L,
      s"alpha/beta ppm must be in (0, 1e6], got $alphaPpm/$betaPpm")
    val m = lit(1000000L)
    def floorDivM(a: Column): Column =
      call_function("div", a - pmod(a, m), m)
    // b's step needs the SAME step's l — inline l's (cheap, constant)
    // arithmetic rather than referencing a sibling struct field
    def lNext(v: Column, pl: Column, pb: Column): Column =
      floorDivM(lit(alphaPpm) * v + (m - lit(alphaPpm)) * (pl + pb))
    def bNext(v: Column, pl: Column, pb: Column): Column =
      floorDivM(lit(betaPpm) * (lNext(v, pl, pb) - pl)
        + (m - lit(betaPpm)) * pb)
    val rows = df.select(col(keyCol).as("_k"),
      unix_timestamp(col(tsCol)).as("ts_sec"),
      round(col(valueCol) * lit(1e6)).cast("long").as("v_micro"))
    val folded = rows
      .groupBy(col("_k"))
      .agg(array_sort(collect_list(struct(col("ts_sec"), col("v_micro"))))
        .as("_series"))
      .withColumn("_out", aggregate(
        col("_series"),
        expr("CAST(array() AS ARRAY<STRUCT<ts_sec: BIGINT, v_micro: BIGINT, l_micro: BIGINT, b_micro: BIGINT>>)"),
        (acc, x) => {
          val v = x.getField("v_micro")
          val pl = element_at(acc, -1).getField("l_micro")
          val pb = element_at(acc, -1).getField("b_micro")
          concat(acc, array(struct(
            x.getField("ts_sec").as("ts_sec"),
            v.as("v_micro"),
            when(size(acc) === 0, v).otherwise(lNext(v, pl, pb))
              .as("l_micro"),
            when(size(acc) === 0, lit(0L)).otherwise(bNext(v, pl, pb))
              .as("b_micro"))))
        }))
    folded.select(col("_k").as(keyCol),
        posexplode(col("_out")).as(Seq("_p", "_e")))
      .select(col(keyCol), (col("_p") + 1).cast("long").as("step"),
        col("_e.ts_sec").as("ts_sec"), col("_e.v_micro").as("v_micro"),
        col("_e.l_micro").as("l_micro"), col("_e.b_micro").as("b_micro"),
        round(col("_e.l_micro") / lit(1e6), 6).as("level"),
        round(col("_e.b_micro") / lit(1e6), 6).as("trend"),
        round((col("_e.l_micro") + col("_e.b_micro")) / lit(1e6), 6)
          .as("forecast"))
      .orderBy(keyCol, "step")
  }

  /** One-step-ahead backtest of [[holt]] — does the smoother actually
    * forecast better than persistence ("tomorrow = today")? Per key:
    * MAE of the Holt forecast (step i−1's level+trend vs step i's
    * value), MAE of the naive lag-1 forecast, and the skill ratio
    * holt/naive (< 1 ⟺ the model earns its keep — the
    * forecasting-literature MASE denominator convention).
    *
    * Determinism: absolute errors are exact micro-long differences of
    * the recurrence's own exact states; the two MAEs and the ratio
    * each divide once. NULL skill when the naive error is 0
    * (constant series — no skill is measurable).
    *
    * Scale shape: [[holt]]'s one groupBy(key) fold, one lag window on
    * the per-key series, one aggregate. Output: (keyCol, n_eval,
    * mae_holt 6dp, mae_naive 6dp, skill 6dp), ordered by keyCol.
    */
  def holtBacktest(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, alphaPpm: Long = 300000L,
      betaPpm: Long = 100000L): DataFrame = {
    val h = holt(df, keyCol, tsCol, valueCol, alphaPpm, betaPpm)
    val w = Window.partitionBy(keyCol).orderBy("step")
    val e = h
      .withColumn("_fp", lag(col("l_micro") + col("b_micro"), 1).over(w))
      .withColumn("_vp", lag(col("v_micro"), 1).over(w))
      .filter(col("_fp").isNotNull)
      .withColumn("_ae", abs(col("v_micro") - col("_fp")))
      .withColumn("_an", abs(col("v_micro") - col("_vp")))
    e.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_eval"), sum(col("_ae")).as("_sae"),
        sum(col("_an")).as("_san"))
      .select(col(keyCol), col("n_eval"),
        round(col("_sae").cast("double")
          / (col("n_eval") * lit(1000000L)).cast("double"), 6)
          .as("mae_holt"),
        round(col("_san").cast("double")
          / (col("n_eval") * lit(1000000L)).cast("double"), 6)
          .as("mae_naive"),
        when(col("_san") > 0L,
          round(col("_sae").cast("double") / col("_san").cast("double"), 6))
          .as("skill"))
      .orderBy(keyCol)
  }
}
