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
}
