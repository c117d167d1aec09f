package graft.medallion

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import graft.engine.Watermark

/** Gold layer (reference `gold_aggr.py:66-221`): the 5-row trailing
  * window feature table — 16 moving averages, 2 volatilities (sample
  * stddev), guarded ratios, time features — with the reference's own
  * incremental semantics: warm the frame with a pre-watermark lookback,
  * emit only rows past the watermark (`gold_aggr.py:98,219`).
  *
  * Two physical forms:
  *  - `features`: the reference-faithful single-ordering window
  *    (Catalyst collapses all 18 same-frame aggregates into ONE Window
  *    node with one sort — verified in PlanSpec). Correct at any size
  *    but serializes into a single partition, exactly like the
  *    reference's global ORDER BY.
  *  - `featuresPartitioned`: the 100 TB form — day-bucketed windows
  *    with cross-bucket frame repair: each bucket is augmented with the
  *    previous bucket's last 4 rows (warm-up), windows run partitioned
  *    (parallel, one shuffle on the bucket key), warm-up rows are
  *    trimmed. Equals `features` output exactly (GoldSpec property).
  *    This is the reference's own lookback+trim trick applied per
  *    bucket edge instead of per run.
  */
object Gold {
  private val frame: WindowSpec => WindowSpec = _.rowsBetween(-4, 0)

  private val avgCols: Seq[(String, String)] = Seq(
    "co2_emission" -> "avg_co2_emission",
    "total_production" -> "avg_total_production",
    "renewable_ratio" -> "avg_renewable_ratio",
    "solar_production" -> "avg_solar_production",
    "wind_production" -> "avg_wind_production",
    "offshore_wind_production" -> "avg_offshore_wind",
    "onshore_wind_production" -> "avg_onshore_wind",
    "production_large_plants" -> "avg_production_large_plants",
    "production_small_plants" -> "avg_production_small_plants",
    "exchange_sum" -> "avg_exchange_sum",
    "exchange_germany" -> "avg_exchange_germany",
    "exchange_netherlands" -> "avg_exchange_netherlands",
    "exchange_great_brt" -> "avg_exchange_great_brt",
    "exchange_norway" -> "avg_exchange_norway",
    "exchange_sweden" -> "avg_exchange_sweden",
    "exchange_dk1_dk2" -> "avg_exchange_dk1_dk2")

  /** time_series CTE (gold_aggr.py:67-99): fact ⋈ dim (J1; dim is the
    * broadcast side) + derived columns with the reference's asymmetric
    * ratio guards (renewable → 0, wind/solar → 1).
    */
  def timeSeries(fact: DataFrame, dim: DataFrame): DataFrame = {
    val total = col("production_large_plants") + col("production_small_plants")
    fact.join(broadcast(dim), Seq("time_id"))
      .withColumn("total_production", total)
      .withColumn("renewable_ratio",
        when(total > 0,
          (col("solar_production") + col("offshore_wind_production")
            + col("onshore_wind_production")) / total)
          .otherwise(lit(0.0)))
      .withColumn("wind_production",
        col("offshore_wind_production") + col("onshore_wind_production"))
      .withColumn("hour_of_day", col("hour"))
  }

  private def aggregated(ts: DataFrame, w: WindowSpec): DataFrame = {
    val withAvgs = avgCols.foldLeft(ts) { case (df, (src, dst)) =>
      df.withColumn(dst, avg(col(src)).over(w))
    }
    withAvgs
      .withColumn("production_volatility", stddev(col("total_production")).over(w))
      .withColumn("co2_volatility", stddev(col("co2_emission")).over(w))
      .withColumn("wind_solar_ratio",
        when(col("solar_production") > 0, col("wind_production") / col("solar_production"))
          .otherwise(lit(1.0)))
  }

  private val outputCols: Seq[String] =
    Seq("time_id") ++ avgCols.map(_._2) ++
      Seq("production_volatility", "co2_volatility", "wind_solar_ratio",
        "day_of_week", "hour_of_day", "is_weekend", "season")

  /** Reference-faithful gold increment: global-ordered frame, lookback
    * warm-up, trim past watermark. `lookbackRows` generalizes the
    * reference's 4-minute predicate (exact for 1-minute cadence) to
    * row counts, correct on gappy series too.
    */
  def features(fact: DataFrame, dim: DataFrame, watermark: Timestamp): DataFrame = {
    val warm = fact.filter(col("time_id") <= lit(watermark))
      .orderBy(col("time_id").desc).limit(4)
    val fresh = fact.filter(col("time_id") > lit(watermark))
    val ts = timeSeries(warm.union(fresh), dim)
    aggregated(ts, frame(Window.orderBy("time_id")))
      .filter(col("time_id") > lit(watermark))
      .select(outputCols.map(col): _*)
  }

  /** 100 TB form: windows partitioned by day bucket with edge repair
    * via `WindowRepair.withWarmup` — each bucket is warmed with the
    * last 4 rows GLOBALLY before its first row (spanning multiple
    * prior buckets when days are missing or hold fewer than 4 rows),
    * so equality with the global form holds for arbitrary sparsity
    * (gap-day and sparse-bucket cases in MedallionSpec). All buckets
    * compute in parallel; the only shuffle is on the bucket key.
    */
  def featuresPartitioned(fact: DataFrame, dim: DataFrame, watermark: Timestamp): DataFrame = {
    val warm = fact.filter(col("time_id") <= lit(watermark))
      .orderBy(col("time_id").desc).limit(4)
    val fresh = fact.filter(col("time_id") > lit(watermark))
    val ts = timeSeries(warm.union(fresh), dim)
      .withColumn("bucket", to_date(col("time_id")))
    val repaired = graft.operators.WindowRepair
      .withWarmup(ts, "bucket", Seq("time_id"), 4)
    val w = frame(Window.partitionBy("bucket").orderBy("time_id"))
    aggregated(repaired, w)
      .filter(!col("warmup") && col("time_id") > lit(watermark))
      .select(outputCols.map(col): _*)
  }

  /** CSV export (gold_aggr.py:234-254): the 13-column ordered ML
    * projection. `coalesce(1)` mirrors DuckDB COPY's single writer —
    * acceptable because the projection is small; at scale drop the
    * coalesce and export sharded.
    */
  def exportMlFeatures(gold: DataFrame, path: String): Unit =
    gold.select("time_id", "avg_co2_emission", "avg_total_production",
        "avg_renewable_ratio", "avg_solar_production", "avg_wind_production",
        "avg_offshore_wind", "avg_onshore_wind", "production_volatility",
        "co2_volatility", "wind_solar_ratio", "hour_of_day", "is_weekend", "season")
      .orderBy("time_id")
      .coalesce(1)
      .write.option("header", "true").mode("overwrite").csv(path)
}
