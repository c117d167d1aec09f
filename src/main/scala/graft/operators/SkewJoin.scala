package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join — the manual skew mitigation for when one join key
  * dominates (AQE's skew-join split handles sort-merge skew at
  * runtime; salting is the planned-ahead form that also works for
  * hash joins and pre-AQE engines, and the pattern the 100 TB design
  * calls out for hot LSH buckets / hot users).
  *
  * The skewed (large) side gets a deterministic salt derived from a
  * unique row id; the small side is replicated `numSalts` times. The
  * join key becomes (key, salt) — one hot key fans out across
  * `numSalts` reducers. Equality with the plain join is spec-tested.
  */
object SkewJoin {
  /** Inner equi-join `large ⋈ small` on `key`, with `large` salted by
    * `xxhash64(idCol) % numSalts` and `small` replicated per salt.
    */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
      idCol: String, numSalts: Int): DataFrame = {
    val salted = large.withColumn("_salt",
      pmod(xxhash64(col(idCol)), lit(numSalts.toLong)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(numSalts.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Join-key skew profile: the top-N hottest values of a key column
    * with each one's share of all rows — the diagnostic that decides
    * whether a join needs salting (one key at 20% of rows = one
    * reducer doing 20% of the work) and how many salts to use.
    *
    * Shape: hash aggregate with map-side partial combine (one row per
    * distinct key crosses the wire), total folded in as a 1-row
    * broadcast aggregate, then orderBy+limit — Spark plans a
    * per-partition top-N (TakeOrdered), NOT a global sort, so nothing
    * key-cardinality-sized ever sits in one task. NULL keys are
    * excluded (they route to no reducer in an inner join).
    */
  def keySkewProfile(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("_total"))
    val top = counts.crossJoin(broadcast(total))
      .orderBy(col("n_rows").desc, col(keyCol))
      .limit(topN)
    // row_number over the already-limited topN rows — the tiny frame,
    // not the full key space
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("n_rows").desc, col(keyCol))))
      .select(col(keyCol), col("rank"), col("n_rows"),
        round(col("n_rows").cast("double") / col("_total").cast("double"), 6)
          .as("share"))
      .orderBy("rank")
  }

  /** Pre-join cardinality and skew advisor — the planning probe a
    * 100 TB pipeline runs BEFORE a big equi-join: exact join output
    * size Σ_k ca(k)·cb(k) from the two per-key count tables (never
    * the join itself), the hottest key's contribution, and the
    * salting factor [[saltedInnerJoin]] would need. Everything after
    * the two count aggregates runs on matched-key rows; every number
    * is an exact integer except the two advisory ratios (one float
    * expression each, NULL on an empty join).
    *
    * `top_key` is the max-output key (ties to the LARGER key — the
    * (product, key) struct-max order); `suggested_salt` mirrors
    * [[keySkewReport]]: ⌈max_key_rows · n_keys_matched / est_rows⌉.
    *
    * Output: one row (n_left, n_right, n_keys_left, n_keys_right,
    * n_keys_matched, est_rows, max_key_rows, top_key, skew_ratio,
    * suggested_salt).
    */
  def joinSizeEstimate(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    val lc = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("ca"))
      .localCheckpoint()
    val rc = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cb"))
      .localCheckpoint()
    val lt = lc.agg(sum(col("ca")).as("n_left"),
      count(lit(1)).as("n_keys_left"))
    val rt = rc.agg(sum(col("cb")).as("n_right"),
      count(lit(1)).as("n_keys_right"))
    val m = lc.join(rc, Seq("k"))
      .select(col("k"), (col("ca") * col("cb")).as("p"))
      .agg(count(lit(1)).as("n_keys_matched"),
        coalesce(sum(col("p")), lit(0L)).as("est_rows"),
        max(struct(col("p"), col("k"))).as("_top"))
    lt.crossJoin(broadcast(rt)).crossJoin(broadcast(m))
      .select(col("n_left"), col("n_right"), col("n_keys_left"),
        col("n_keys_right"), col("n_keys_matched"), col("est_rows"),
        coalesce(col("_top.p"), lit(0L)).as("max_key_rows"),
        col("_top.k").as("top_key"),
        when(col("est_rows") > 0L,
          round(col("_top.p").cast("double") * col("n_keys_matched")
            / col("est_rows").cast("double"), 6)).as("skew_ratio"),
        when(col("est_rows") > 0L,
          expr("(_top.p * n_keys_matched + est_rows - 1) div est_rows"))
          .as("suggested_salt"))
  }
}
