package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample distribution tests — the drift monitors a production
  * data pipeline runs between corpus slices, snapshots, or time
  * windows: PSI (the banking-world stability index), the exact
  * Kolmogorov–Smirnov statistic, and the chi-square independence test
  * for categorical columns.
  *
  * Determinism discipline (CLAUDE.md): every per-bin/per-cell float
  * term is computed by ONE float expression over exact integer counts
  * and quantized to integer nanos AT BIRTH, so the final sums are
  * exact integer sums — partition-order and engine invariant.
  */
object StatTests {

  /** Population Stability Index between two slices of `valueCol`
    * (rows where `groupCol` = a vs = b), over `bins` equal-width bins
    * on [lo, hi) with the top edge folded into the last bin and
    * out-of-range values clamped. Laplace-smoothed (+1 per bin), so
    * empty bins are defined and the index is finite; the usual read:
    * < 0.1 stable, 0.1–0.25 shifting, > 0.25 drifted.
    *
    * Shape: one map-side bin projection + one `bins`-row aggregate per
    * slice; the PSI fold is over `bins` rows.
    *
    * Output: one row (n_a, n_b, psi).
    */
  def psi(df: DataFrame, valueCol: String, groupCol: String,
      a: String, b: String, lo: Double, hi: Double,
      bins: Int = 10): DataFrame =
    psiFromCounts(psiBinCounts(df, valueCol, groupCol, a, b, lo, hi, bins),
      bins)

  /** The mergeable half of [[psi]]: per-bin exact (ca, cb) counts —
    * rows fold across any disjoint corpus split (the streaming-store
    * shape; `graft.streaming.StreamingPower.psiStep` persists them
    * per micro-batch).
    */
  def psiBinCounts(df: DataFrame, valueCol: String, groupCol: String,
      a: String, b: String, lo: Double, hi: Double,
      bins: Int): DataFrame = {
    require(bins >= 2 && hi > lo, s"bad bins/range: $bins, [$lo, $hi)")
    df.filter(col(groupCol) === a || col(groupCol) === b)
      .select((col(groupCol) === a).as("_is_a"),
        least(greatest(
          floor((col(valueCol) - lit(lo)) / lit((hi - lo) / bins))
            .cast("long"), lit(0L)), lit((bins - 1).toLong)).as("bin"))
      .groupBy(col("bin"))
      .agg(sum(when(col("_is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("_is_a"), 1L).otherwise(0L)).as("cb"))
  }

  /** The report half of [[psi]]: fold bin-count rows (so pre-split
    * inputs merge exactly), then the smoothed nano-quantized index.
    */
  def psiFromCounts(binCounts: DataFrame, bins: Int): DataFrame = {
    val counts = binCounts.groupBy(col("bin"))
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
    val tot = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    // every observed bin contributes; unobserved bins contribute the
    // identical smoothed mass on both sides -> zero term, so iterating
    // observed bins only is exact
    counts.crossJoin(broadcast(tot))
      .withColumn("_term_nano", floor(
        (((col("ca") + 1).cast("double") / (col("na") + lit(bins)))
          - ((col("cb") + 1).cast("double") / (col("nb") + lit(bins))))
          * log(((col("ca") + 1).cast("double") / (col("na") + lit(bins)))
            / ((col("cb") + 1).cast("double") / (col("nb") + lit(bins))))
          * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col("na"), col("nb"))
      .agg(sum(col("_term_nano")).as("_sn"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        round(col("_sn").cast("double") / lit(1e9), 6).as("psi"))
  }

  /** Categorical PSI between two slices of a discrete column (the
    * language-mix / source-mix drift monitor): categories are the
    * union observed in either slice, smoothing is Laplace +1 over
    * that category count, and each category's term is one float
    * expression over exact counts floored to nanos at birth — the
    * numeric [[psi]]'s discipline with categories as bins.
    *
    * Output: one row (n_a, n_b, n_categories, psi).
    */
  def psiCategorical(df: DataFrame, valueCol: String, groupCol: String,
      a: String, b: String): DataFrame = {
    val counts = df
      .filter(col(groupCol) === a || col(groupCol) === b)
      .groupBy(col(valueCol).as("category"))
      .agg(sum(when(col(groupCol) === a, 1L).otherwise(0L)).as("ca"),
        sum(when(col(groupCol) === b, 1L).otherwise(0L)).as("cb"))
      .localCheckpoint()
    val tot = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      count(lit(1)).as("ncat"))
    counts.crossJoin(broadcast(tot))
      .withColumn("_term_nano", floor(
        (((col("ca") + 1).cast("double") / (col("na") + col("ncat")))
          - ((col("cb") + 1).cast("double") / (col("nb") + col("ncat"))))
          * log(((col("ca") + 1).cast("double") / (col("na") + col("ncat")))
            / ((col("cb") + 1).cast("double") / (col("nb") + col("ncat"))))
          * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col("na"), col("nb"), col("ncat"))
      .agg(sum(col("_term_nano")).as("_sn"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        col("ncat").as("n_categories"),
        round(col("_sn").cast("double") / lit(1e9), 6).as("psi"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic between the same
    * two slices: D = max over observed values of
    * |cum_a/n_a − cum_b/n_b|, evaluated as max |cum_a·n_b − cum_b·n_a|
    * in exact integers with ONE division at the end. Grouping is by
    * the stored value (no arithmetic on the doubles), so cross-engine
    * equality is bit-exact.
    *
    * Scale note: the exact statistic needs a global CDF — a running
    * sum over DISTINCT values (single-partition window). Bounded by
    * value cardinality; for unbounded domains at extreme scale,
    * pre-quantize `valueCol` or use `Sketches.fixedHistogram` and
    * accept grid resolution.
    *
    * Output: one row (n_a, n_b, d_stat).
    */
  def ksTest(df: DataFrame, valueCol: String, groupCol: String,
      a: String, b: String): DataFrame = {
    val counts = df
      .filter(col(groupCol) === a || col(groupCol) === b)
      .groupBy(col(valueCol).as("v"))
      .agg(sum(when(col(groupCol) === a, 1L).otherwise(0L)).as("ca"),
        sum(when(col(groupCol) === b, 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = counts
      .withColumn("cum_a", sum(col("ca")).over(w))
      .withColumn("cum_b", sum(col("cb")).over(w))
    val tot = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    cum.crossJoin(broadcast(tot))
      .withColumn("_num", abs(col("cum_a") * col("nb")
        - col("cum_b") * col("na")))
      .groupBy(col("na"), col("nb"))
      .agg(max(col("_num")).as("_d_num"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        round(col("_d_num").cast("double") / (col("na") * col("nb")), 6)
          .as("d_stat"))
  }

  /** Chi-square test of independence between two categorical columns:
    * χ² = Σ_cells (O·N − r·c)² / (N·r·c) — each cell term ONE float
    * expression over exact integer counts (observed O, row total r,
    * column total c, grand total N), floored to nanos at birth.
    * Output: one row (n_items, n_rows_cat, n_cols_cat, dof, chi2).
    */
  def chiSquare(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val cells = df.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("o")).localCheckpoint()
    val rows = cells.groupBy(col("r")).agg(sum(col("o")).as("rt"))
    val cols = cells.groupBy(col("c")).agg(sum(col("o")).as("ct"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("r")).as("nr"), countDistinct(col("c")).as("nc"))
    // absent cells (O = 0) still contribute (rc)²/(N·rc) = rc/N — the
    // full grid comes from rows × cols, with observed counts joined in
    val grid = rows.crossJoin(broadcast(cols))
      .join(cells, Seq("r", "c"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    grid.crossJoin(broadcast(tot))
      .withColumn("_term_nano", floor(
        ((col("o") * col("n") - col("rt") * col("ct")).cast("double")
          * (col("o") * col("n") - col("rt") * col("ct")).cast("double")
          / (col("n") * col("rt") * col("ct")).cast("double"))
          * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col("n"), col("nr"), col("nc"))
      .agg(sum(col("_term_nano")).as("_sn"))
      .select(col("n").as("n_items"), col("nr").as("n_rows_cat"),
        col("nc").as("n_cols_cat"),
        ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
        round(col("_sn").cast("double") / lit(1e9), 6).as("chi2"))
  }
}
