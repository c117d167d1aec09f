package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-level data profiling — the per-column summary every dataset
  * onboarding run produces before a byte of it enters a training mix
  * (deequ's `ColumnProfiler`, Great Expectations' profile step):
  * row/null/distinct counts, lexicographic min/max, and the modal
  * value with its frequency, one output row per profiled column.
  *
  * Scale shape: ONE scan of the input explodes each row into
  * (column, value) pairs — a map-side projection, no join — and ONE
  * hash aggregate on (column, value) with map-side partials collapses
  * the corpus to its per-column value histogram. Everything after
  * (per-column rollup, modal-value window) runs on that collapsed
  * frame, whose size is the sum of per-column cardinalities — never
  * the row count. At 100 TB the single wide shuffle is the histogram
  * build; nothing downstream re-touches the input.
  *
  * Values are profiled through a CAST to string so one long-format
  * schema fits every column type; min/max are therefore LEXICOGRAPHIC
  * over that rendering (documented in the output column names).
  * Callers profile float columns at their own risk — float-to-string
  * rendering is engine-specific, so the registered query sticks to
  * string/integer/timestamp-free columns per the repo's cross-engine
  * rules.
  *
  * Modal-value tie-break is deterministic: highest count, then the
  * lexicographically LARGEST value. A column that is entirely NULL
  * profiles with NULL top_value/top_count (no non-null candidate).
  */
object Profile {
  /** The (column, value, cnt) histogram `columnProfile` is computed
    * from — exposed because it is the profile's MERGEABLE form: two
    * histograms over disjoint row sets fold by summing cnt per
    * (column, value), which is what the streaming profile store
    * persists per batch (`StreamingPower.profileStream`).
    */
  def valueHistogram(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column_name"), col(c).cast("string").as("value"))): _*))
      .as("_p"))
      .select(col("_p.*"))
      .groupBy("column_name", "value")
      .agg(count(lit(1)).as("cnt"))
  }

  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileFromCounts(valueHistogram(df, cols))

  /** The profile readout over a (column, value, cnt) histogram —
    * batch and merged-store paths share it, so streamed == batch by
    * construction once the histograms fold equal.
    */
  def profileFromCounts(counts: DataFrame): DataFrame = {
    val rollup = counts.groupBy("column_name").agg(
      sum("cnt").as("n_rows"),
      coalesce(sum(when(col("value").isNull, col("cnt"))), lit(0L)).as("n_null"),
      // counts frame has one row per distinct value; counting its
      // non-null rows IS the distinct-value count — no second
      // count-distinct shuffle.
      count(col("value")).as("n_distinct"),
      min("value").as("min_value"),
      max("value").as("max_value"))
    val w = Window.partitionBy("column_name")
      .orderBy(col("cnt").desc, col("value").desc)
    val top = counts.filter(col("value").isNotNull)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("column_name"), col("value").as("top_value"),
        col("cnt").as("top_count"))
    rollup.join(top, Seq("column_name"), "left")
      .orderBy("column_name")
  }

  /** k-anonymity profile over a quasi-identifier combination — the
    * privacy-governance check a dataset release runs: every row whose
    * QID equivalence class is smaller than `kMin` is re-identifiable
    * at that granularity. Reported as the group-size histogram
    * (exact integers: for each class size k, how many classes and how
    * many rows sit in them, flagged below the threshold) — the shape
    * that tells you both the risk mass and which generalization level
    * would clear it.
    *
    * Scale shape: one hash aggregate on the QID tuple (map-side
    * combined), then a second over class-size cardinality (≤ distinct
    * sizes, tiny). Nothing row-scale shuffles twice.
    */
  def kAnonymity(df: DataFrame, qidCols: Seq[String],
      kMin: Int = 5): DataFrame = {
    require(qidCols.nonEmpty)
    df.groupBy(qidCols.map(col): _*).agg(count(lit(1)).as("_k"))
      .groupBy(col("_k").as("group_size"))
      .agg(count(lit(1)).as("n_groups"), sum(col("_k")).as("n_rows"))
      .withColumn("below_k", (col("group_size") < kMin).cast("int"))
      .orderBy("group_size")
  }
}
