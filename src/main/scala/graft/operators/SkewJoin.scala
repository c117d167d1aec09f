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
}
