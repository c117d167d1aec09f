package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort/retention analytics over an event stream — the product
  * questions ("of the users first seen on day X, how many came back N
  * days later?", "how many distinct users were active in the trailing
  * week?") asked of every event table.
  */
object Retention {
  /** Cohort retention matrix: users are cohorted by their first active
    * day; each (cohort day, day offset) cell counts the distinct users
    * from that cohort active `offset` days after their first day.
    *
    * Scale shape: activity collapses to distinct (user, day) pairs
    * first (map-side partial dedup before the shuffle), the first-seen
    * table is a hash aggregate on the SAME user key — so the join back
    * reuses the aggregate's partitioning on one side — and the final
    * matrix is a hash aggregate over cohort cells. `count(1)` is exact
    * because (user, day) pairs are distinct by construction; no
    * count-distinct shuffle is needed.
    */
  def cohortMatrix(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val act = events
      .select(col(userCol).as("user"), to_date(col(tsCol)).as("d"))
      .distinct()
    val first = act.groupBy("user").agg(min(col("d")).as("cohort_d"))
    act.join(first, Seq("user"))
      .groupBy(col("cohort_d"),
        datediff(col("d"), col("cohort_d")).as("offset_days"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Trailing-`windowDays` distinct active users per day.
    *
    * A day-range self-join (day d ⋈ activity in [d−6, d]) would
    * replicate the whole activity table per overlapping day WITH skew;
    * instead each distinct (user, day) pair fans out map-side to the
    * `windowDays` target days it contributes to (a bounded ×7
    * expansion), the fan-out is trimmed to days that actually occur
    * (broadcast semi-join against the tiny distinct-day table), and one
    * exact count-distinct aggregate per target day finishes the job.
    * Row volume is windowDays·|distinct pairs| regardless of how
    * skewed per-day traffic is.
    */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    val act = events
      .select(col(userCol).as("user"), to_date(col(tsCol)).as("d"))
      .distinct()
    val days = act.select(col("d").as("target_d")).distinct()
    act
      .select(col("user"),
        explode(sequence(col("d"), date_add(col("d"), windowDays - 1)))
          .as("target_d"))
      .join(broadcast(days), Seq("target_d"), "left_semi")
      .groupBy("target_d")
      .agg(count_distinct(col("user")).as("active_users"))
  }
}
