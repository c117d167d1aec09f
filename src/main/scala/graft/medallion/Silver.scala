package graft.medallion

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{TimeFeatures, Watermark}

/** Silver layer (reference `silver_transform.py:61-106`): star schema —
  * dim_time + fact_power_system — as pure DataFrame functions. The
  * ON-CONFLICT-DO-NOTHING insert is applied by the caller via
  * `IdempotentSink` (left-anti + append), matching the reference's
  * drop-never-update policy.
  */
object Silver {
  /** dim_time rows from a bronze increment (silver_transform.py:61-82):
    * SELECT DISTINCT over 7 time derivations, watermark-filtered.
    */
  def dimTime(bronze: DataFrame, watermark: Timestamp): DataFrame =
    TimeFeatures.dimTime(
      Watermark.pastWatermark(bronze, "minutes1_utc", watermark), "minutes1_utc")

  /** fact_power_system rows from a bronze increment
    * (silver_transform.py:85-106): rename projection (P1), the two
    * exchange sums (P2), watermark (P4) + NULL guard (P5).
    */
  def fact(bronze: DataFrame, watermark: Timestamp): DataFrame =
    Watermark.pastWatermark(bronze, "minutes1_utc", watermark)
      .filter(col("minutes1_utc").isNotNull)
      .select(
        col("minutes1_utc").as("time_id"),
        col("co2_emission"),
        col("production_ge100_mw").as("production_large_plants"),
        col("production_lt100_mw").as("production_small_plants"),
        col("solar_power").as("solar_production"),
        col("offshore_wind_power").as("offshore_wind_production"),
        col("onshore_wind_power").as("onshore_wind_production"),
        col("exchange_sum"),
        (col("exchange_dk1_de") + col("exchange_dk2_de")).as("exchange_germany"),
        col("exchange_dk1_nl").as("exchange_netherlands"),
        col("exchange_dk1_gb").as("exchange_great_brt"),
        col("exchange_dk1_no").as("exchange_norway"),
        (col("exchange_dk1_se") + col("exchange_dk2_se")).as("exchange_sweden"),
        col("exchange_dk1_dk2"))
}
