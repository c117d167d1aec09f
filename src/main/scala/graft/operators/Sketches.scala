package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{HashFamily, Md5Family}

/** Deterministic, engine-portable cardinality sketching.
  *
  * Spark's `approx_count_distinct` (HyperLogLog++) is fast but its
  * estimate is engine-specific — no cross-engine oracle can check it
  * (q47 is rows-only for exactly that reason). Linear counting over
  * md5-derived buckets is the portable alternative: both engines
  * compute the SAME buckets and the SAME closed-form estimate
  * `-k·ln((k−occupied)/k)`, so the result is hash-comparable, while
  * still shuffling at most `k` distinct bucket ids (map-side partial
  * distinct) instead of the raw values. Accurate while occupancy stays
  * below ~⅔; size `k` ≳ the expected cardinality.
  */
object Sketches {
  def linearCountDistinct(df: DataFrame, c: Column, k: Int = 4096,
      hashes: HashFamily = Md5Family): DataFrame =
    // NULLs are excluded EXPLICITLY: Spark's countDistinct skips the
    // NULL bucket that md5(NULL) produces, but a SQL oracle's
    // DISTINCT+count(*) counts it — filter on both sides so the parity
    // doesn't hinge on engine NULL-aggregation defaults.
    df.filter(c.isNotNull)
      .select(pmod(hashes.hash(c.cast("string")), lit(k.toLong)).as("b"))
      .agg(countDistinct(col("b")).as("occupied_buckets"))
      .select(col("occupied_buckets"),
        round(lit(-k.toDouble) *
          log((lit(k.toDouble) - col("occupied_buckets")) / lit(k.toDouble)), 6)
          .as("estimated_distinct"))
}
