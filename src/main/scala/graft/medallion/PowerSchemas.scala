package graft.medallion

import org.apache.spark.sql.types._

/** Explicit schemas for the power-system medallion layers.
  *
  * Bronze mirrors dlt's snake_case normalization of the
  * PowerSystemRightNow JSON (reference `bronze_ingest.py:39-43`,
  * consumed at `silver_transform.py:64-68,88-104`); schema inference is
  * deliberately NOT used — at 100 TB schema-on-read inference is a
  * correctness and planning hazard (SURVEY §1.3).
  */
object PowerSchemas {
  val metricCols: Seq[String] = Seq(
    "co2_emission", "production_ge100_mw", "production_lt100_mw",
    "solar_power", "offshore_wind_power", "onshore_wind_power",
    "exchange_sum", "exchange_dk1_de", "exchange_dk2_de",
    "exchange_dk1_nl", "exchange_dk1_gb", "exchange_dk1_no",
    "exchange_dk1_se", "exchange_dk2_se", "exchange_dk1_dk2")

  /** bronze power_system_raw (FIXTURES.md A.1). */
  val raw: StructType = StructType(
    StructField("minutes1_utc", TimestampType, nullable = true) +:
      metricCols.map(StructField(_, DoubleType, nullable = true)))

  /** silver fact_power_system (silver_transform.py:34-52). */
  val fact: StructType = StructType(Seq(
    StructField("time_id", TimestampType, nullable = false),
    StructField("co2_emission", DoubleType),
    StructField("production_large_plants", DoubleType),
    StructField("production_small_plants", DoubleType),
    StructField("solar_production", DoubleType),
    StructField("offshore_wind_production", DoubleType),
    StructField("onshore_wind_production", DoubleType),
    StructField("exchange_sum", DoubleType),
    StructField("exchange_germany", DoubleType),
    StructField("exchange_netherlands", DoubleType),
    StructField("exchange_great_brt", DoubleType),
    StructField("exchange_norway", DoubleType),
    StructField("exchange_sweden", DoubleType),
    StructField("exchange_dk1_dk2", DoubleType)))

  /** silver dim_time (silver_transform.py:22-32). */
  val dimTime: StructType = StructType(Seq(
    StructField("time_id", TimestampType, nullable = false),
    StructField("date", DateType),
    StructField("hour", IntegerType),
    StructField("minute", IntegerType),
    StructField("day_of_week", IntegerType),
    StructField("is_weekend", BooleanType),
    StructField("season", IntegerType)))
}
