package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Time-dimension feature derivations.
  *
  * Reproduces the reference's dim_time column semantics
  * (`/root/reference/pipelines/silver_transform.py:61-82`):
  *   - day_of_week uses the DuckDB/Postgres `EXTRACT(DOW)` convention
  *     0=Sunday..6=Saturday (`silver_transform.py:68`). Spark's
  *     `dayofweek` is 1=Sunday..7=Saturday, hence the `- 1`.
  *   - is_weekend = DOW IN (0,6) (`silver_transform.py:69-72`).
  *   - season buckets months (12,1,2)->0 Winter, (3,4,5)->1 Spring,
  *     (6,7,8)->2 Summer, else->3 Fall (`silver_transform.py:73-78`).
  *
  * All derivations are built-in codegen'd expressions — they stay inside
  * WholeStageCodegen and never leave the scan's projection pipeline.
  */
object TimeFeatures {
  /** 0=Sunday .. 6=Saturday, matching DuckDB EXTRACT(DOW). */
  def dayOfWeek0Sun(ts: Column): Column = dayofweek(ts) - 1

  def isWeekend(ts: Column): Column = dayofweek(ts).isin(1, 7)

  def season(ts: Column): Column =
    when(month(ts).isin(12, 1, 2), 0)
      .when(month(ts).isin(3, 4, 5), 1)
      .when(month(ts).isin(6, 7, 8), 2)
      .otherwise(3)

  /** The reference's dim_time projection (silver_transform.py:61-82):
    * SELECT DISTINCT over 7 derived columns of the timestamp. The
    * distinct is a hash aggregate on the derived tuple; at scale the
    * cardinality equals distinct timestamps, so partial (map-side)
    * aggregation collapses duplicates before the shuffle.
    */
  def dimTime(df: DataFrame, tsCol: String): DataFrame = {
    val ts = col(tsCol)
    df.filter(ts.isNotNull)
      .select(
        ts.as("time_id"),
        ts.cast(DateType).as("date"),
        hour(ts).as("hour"),
        minute(ts).as("minute"),
        dayOfWeek0Sun(ts).as("day_of_week"),
        isWeekend(ts).as("is_weekend"),
        season(ts).as("season"))
      .distinct()
  }
}
