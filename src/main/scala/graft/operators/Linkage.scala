package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter, JASA 1969): score
  * candidate pairs from two sources by their field-agreement PATTERN,
  * weighting each field by log2(m/u) on agreement and
  * log2((1−m)/(1−u)) on disagreement — m = P(agree | same entity)
  * (declared per field), u = P(agree | random pair) (ESTIMATED from
  * the data as Σ (n_v/N)² over the field's value distribution — the
  * standard frequency-based u). High-information fields (near-unique
  * names) thus dominate; low-information fields (a 5-value segment)
  * contribute little — the reason FS beats naive agree-counting.
  *
  * Scale shape: candidate pairs come from BLOCKING (equi-join on the
  * blocking key — never all-pairs); u-estimates are one aggregate per
  * field producing a 1-row frame that broadcasts into the scoring
  * join; the pattern rollup is a hash aggregate over ≤ 2^|fields|
  * groups with map-side combine. Nothing driver-side, nothing
  * quadratic beyond the blocked candidates.
  *
  * Determinism: u = exact-integer Σ n_v² over exact N², one double
  * division, log2 once per field, the 3-term pattern weight summed in
  * fixed expression order and ppm-rounded ONCE — replayable
  * cross-engine (the q223 ln discipline).
  */
object Linkage {
  /** Deterministic "CRM dump" second source derived from customers —
    * every third customer reappears (crm_id = c_custkey + 1,000,000)
    * with closed-form dirt: an `X-` name prefix (1 in 13), a shifted
    * nationkey (1 in 7 — a BLOCKING miss, the realistic recall cost),
    * a wiped segment (1 in 4), a 50-cent balance drift (1 in 11).
    * Fixture prep for q291; a production pipeline brings a real
    * second source and starts at [[fellegiSunterPatterns]].
    */
  def crmSnapshot(customers: DataFrame): DataFrame =
    customers.filter(col("c_custkey") % 3 === 0).select(
      (col("c_custkey") + 1000000L).as("crm_id"),
      when(col("c_custkey") % 13 === 0, concat(lit("X-"), col("c_name")))
        .otherwise(col("c_name")).as("crm_name"),
      when(col("c_custkey") % 7 === 0, (col("c_nationkey") + 1) % 25)
        .otherwise(col("c_nationkey")).as("crm_nationkey"),
      when(col("c_custkey") % 4 === 0, lit("UNKNOWN"))
        .otherwise(col("c_mktsegment")).as("crm_segment"),
      (round(col("c_acctbal") * 100).cast("long") +
        when(col("c_custkey") % 11 === 0, 50L).otherwise(0L))
        .as("crm_bal_cents"))

  /** Pattern-level FS scoring of nationkey-blocked candidates.
    * Output one row per agreement pattern (name, segment, balance ±10
    * cents): pair count, TRUE-match count (the fixture knows ground
    * truth — crm_id − 1e6), and the pattern's ppm-quantized FS score.
    * m-probabilities are declared (name .92, segment .85, balance
    * .95); u-probabilities are frequency-estimated from the customer
    * side. Ordered by the pattern bits.
    */
  def fellegiSunterPatterns(customers: DataFrame, crm: DataFrame): DataFrame = {
    val cust = customers.select(col("c_custkey"),
      upper(col("c_name")).as("name_n"), col("c_nationkey"),
      col("c_mktsegment"),
      round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    // frequency-based u per field: Σ n_v² / N² — exact integer sums,
    // ONE double division (long/long is double division in Spark and
    // DuckDB alike, the intended use here); three 1-row frames fused
    // into one broadcast artifact (checkpointed, q102 rule)
    def uOf(field: String): DataFrame =
      cust.groupBy(col(field)).agg(count(lit(1)).as("cnt"))
        .agg((sum(col("cnt") * col("cnt")) /
          (sum(col("cnt")) * sum(col("cnt")))).as(s"u_$field"))
    val uRow = broadcast(
      uOf("name_n").crossJoin(broadcast(uOf("c_mktsegment")))
        .crossJoin(broadcast(uOf("bal_cents")))
        .localCheckpoint())
    val cand = crm.join(cust, col("crm_nationkey") === col("c_nationkey"))
      .withColumn("agree_name",
        (upper(col("crm_name")) === col("name_n")).cast("int"))
      .withColumn("agree_seg",
        (col("crm_segment") === col("c_mktsegment")).cast("int"))
      .withColumn("agree_bal",
        (abs(col("crm_bal_cents") - col("bal_cents")) <= 10).cast("int"))
      .withColumn("is_true",
        (col("crm_id") - 1000000L === col("c_custkey")).cast("long"))
    def w(agree: String, uCol: String, m: Double) =
      when(col(agree) === 1, log2(lit(m) / col(uCol)))
        .otherwise(log2(lit(1.0 - m) / (lit(1.0) - col(uCol))))
    cand.groupBy("agree_name", "agree_seg", "agree_bal")
      .agg(count(lit(1)).as("n_pairs"), sum(col("is_true")).as("n_true"))
      .crossJoin(uRow)
      .withColumn("score_ppm",
        round((w("agree_name", "u_name_n", 0.92) +
          w("agree_seg", "u_c_mktsegment", 0.85) +
          w("agree_bal", "u_bal_cents", 0.95)) * 1e6).cast("long"))
      .select(col("agree_name"), col("agree_seg"), col("agree_bal"),
        col("n_pairs"), col("n_true"), col("score_ppm"))
      .orderBy("agree_name", "agree_seg", "agree_bal")
  }
}
