package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entropic optimal transport (Sinkhorn–Knopp scaling; Cuturi, NIPS
  * 2013 "Sinkhorn Distances") — the mixture-rebalancing primitive: a
  * transport PLAN moving supply mass (e.g. per-source corpus share)
  * onto a demand distribution (e.g. a target language mix) at minimal
  * regularized cost. Where the water-fill (q231) answers "how much of
  * each group", the plan answers "which groups cover which targets,
  * and at what mismatch".
  *
  * Cross-engine determinism is the q296/q231 unrolled-round
  * discipline: the Gibbs kernel ppm-quantizes AT BIRTH (floor 1 ppm so
  * a high-cost cell can never zero a denominator), both scaling
  * vectors live as exact ppm longs, each round's matrix-vector
  * product is an exact integer sum (order-free), and each rescale is
  * ONE truncating `div` of longs — so k unrolled oracle rounds replay
  * the Spark loop bit-identically. ANSI arithmetic bounds (ε ≥ ~0.1
  * of the max cost keeps kernel ratios ≤ ~e¹⁰): every product stays
  * under 2⁶³, and a violated bound throws loudly rather than
  * corrupting.
  *
  * Scale shape: everything after the caller's aggregates is
  * |src|×|dst| cells and |src|+|dst| scaling entries — bounded by the
  * GROUP cardinalities, never the corpus; `rounds` is a constant. The
  * corpus-sized work (counting masses, building costs) happens in the
  * caller's hash aggregates.
  *
  * Inputs: supply (src, a_ppm), demand (dst, b_ppm), cost
  * (src, dst, cost_ppm) — a FULL grid, ppm-scaled. Output per cell:
  * (src, dst, plan) with plan the transported mass share, round 6,
  * ordered.
  */
object Transport {
  def sinkhornPlan(supply: DataFrame, demand: DataFrame, cost: DataFrame,
      rounds: Int = 6, epsPpm: Long = 200000L): DataFrame = {
    require(rounds >= 1 && rounds <= 32, "sinkhorn rounds must be 1..32")
    require(epsPpm >= 1000L, "epsPpm too small for the ppm kernel")
    val spark = cost.sparkSession
    import spark.implicits._
    // the kernel/marginal tables are GROUP-bounded (they come from the
    // caller's hash aggregates), so the scaling loop runs on the
    // driver over the collected cells — the waterFill precedent: a
    // bounded collect, never the corpus. 12 tiny shuffle jobs (2 per
    // round) become one collect + one parallelize.
    val cells = cost
      .withColumn("k_ppm", greatest(lit(1L),
        round(exp(negate(col("cost_ppm").cast("double"))
          / lit(epsPpm.toDouble)) * lit(1e6)).cast("long")))
      .select(col("src").cast("string"), col("dst").cast("string"),
        col("k_ppm"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(cells.length <= 1000000, "sinkhorn grid too large to collect")
    val aMap = supply.select(col("src").cast("string"), col("a_ppm"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bMap = demand.select(col("dst").cast("string"), col("b_ppm"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    var u = aMap.map { case (k, _) => k -> 1000000L }
    var v = bMap.map { case (k, _) => k -> 1000000L }
    // overflow-CHECKED long arithmetic throughout the driver loop: the
    // docstring's "throws loudly rather than corrupting" contract must
    // hold on the Spark side too, not just in the DuckDB oracle's ANSI
    // arithmetic — plain `*`/`+` would silently wrap at 2^63 under a
    // skewed kernel/marginal combination
    def mul(x: Long, y: Long): Long = Math.multiplyExact(x, y)
    for (_ <- 1 to rounds) {
      // integer matrix-vector products: order-free exact sums, then
      // ONE truncating division per entry — identical to the oracle's
      // unrolled SQL rounds
      val kv = cells.groupBy(_._1).map { case (src, cs) =>
        src -> cs.map(c => mul(c._3, v(c._2))).foldLeft(0L)(Math.addExact) }
      u = aMap.map { case (src, a) => src -> mul(a, 1000000000000L) / kv(src) }
      val ku = cells.groupBy(_._2).map { case (dst, cs) =>
        dst -> cs.map(c => mul(c._3, u(c._1))).foldLeft(0L)(Math.addExact) }
      v = bMap.map { case (dst, b) => dst -> mul(b, 1000000000000L) / ku(dst) }
    }
    cells.map { case (src, dst, kp) =>
      // HALF_UP to 6dp — the same BigDecimal rounding Spark's
      // round(_, 6) and DuckDB's round() apply (rint would be
      // HALF_EVEN and could diverge at exact boundaries)
      (src, dst, BigDecimal(mul(mul(u(src), kp), v(dst)).toDouble / 1e18)
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    }.toSeq.toDF("src", "dst", "plan")
      .orderBy("src", "dst")
  }
}
