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
  /** Deterministic HyperLogLog cardinality estimate — the portable
    * sibling of `approx_count_distinct` (whose HLL++ register layout is
    * engine-private and therefore un-oracle-able; that built-in remains
    * the prod default when no cross-engine check is needed).
    *
    * Layout on the 60-bit [[Md5Family]] hash: low `p` bits select the
    * register, the remaining `60-p` bits feed the rank
    * `rho = leading-zeros + 1`, computed EXACTLY via the bit length of
    * the remainder (`length(bin(w))`) — no floating log2, whose
    * last-ulp behavior differs across libm implementations. The
    * register sum `Z = Σ 2^-rho` is likewise accumulated as an exact
    * integer `Σ 2^(maxRho - rho)` (≤ m·2^maxRho < 2^63): float-summing
    * 2^-rho would make the estimate depend on addition order, which an
    * engine-parallel aggregation cannot pin down. Standard small-range
    * linear-counting correction below 2.5·m.
    *
    * Scale shape: one hash projection, then a ≤2^p-register shuffle
    * with map-side partial max — the sketch, not the data, crosses the
    * wire.
    */
  def hllDistinct(df: DataFrame, c: Column, p: Int = 12,
      hashes: HashFamily = Md5Family): DataFrame = {
    val m = 1 << p
    val wBits = 60 - p        // Md5Family range is [0, 2^60)
    val maxRho = wBits + 1
    val regs = df.filter(c.isNotNull)
      .select(hashes.hash(c.cast("string")).as("h"))
      .select(pmod(col("h"), lit(m.toLong)).as("bucket"),
        shiftright(col("h"), p).as("w"))
      .groupBy("bucket")
      .agg(max(when(col("w") === 0, lit(maxRho))
        .otherwise(lit(maxRho) - length(bin(col("w"))))).as("rho"))
    val alphaM2 = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
      lit(m.toDouble) * lit(m.toDouble)
    val pow2MaxRho = lit(1L << maxRho)
    regs
      .agg(count(lit(1)).as("occupied_buckets"),
        // SQL form: the DSL shiftleft only takes a literal shift count
        coalesce(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRho - rho)")),
          lit(0L)).as("z_num"))
      .select(col("occupied_buckets"),
        (col("z_num") + (lit(m.toLong) - col("occupied_buckets")) * pow2MaxRho)
          .as("z_int"),
        (lit(m.toLong) - col("occupied_buckets")).as("v_empty"))
      .select(col("occupied_buckets"),
        round(
          when((alphaM2 * pow2MaxRho.cast("double") / col("z_int").cast("double"))
              <= lit(2.5) * lit(m.toDouble) && col("v_empty") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v_empty")))
          .otherwise(alphaM2 * pow2MaxRho.cast("double") / col("z_int").cast("double")),
          6).as("hll_estimate"))
  }

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
