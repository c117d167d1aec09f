package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — "which interval contains this
  * timestamp" — done as an EQUI-join.
  *
  * The naive `points.join(intervals, ts between start and end)` has no
  * equi-key for the hash-join planner, so Spark falls back to a
  * broadcast nested loop (or a cartesian product): O(|points| ×
  * |intervals|) comparisons, the classic range-join explosion. The
  * bucket trick restores an equi-key: quantize time into fixed-width
  * buckets, explode each interval over the buckets it covers, join
  * point-bucket to interval-bucket (plus any natural equi-keys like
  * user_id), and keep the exact containment filter. A point lives in
  * exactly one bucket, so no post-join dedup is needed.
  *
  * Scale: the join is a plain hash equi-shuffle; the only added volume
  * is interval replication ≈ interval length / `bucketSeconds` — the
  * tuning knob. Wide buckets → fewer replicas but more false candidates
  * for the filter; narrow buckets → the reverse. Skew from a hot bucket
  * is ordinary equi-join skew (AQE handles moderate cases).
  */
object RangeJoin {
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      equiKeys: Seq[String], tsCol: String, startCol: String, endCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    val pb = points
      .withColumn("_b", floor(unix_micros(col(tsCol)) / (bucketSeconds * 1000000L)))
    val ib = intervals
      // malformed (end < start) intervals match nothing by definition;
      // dropping them up front also keeps sequence() ascending (Spark
      // auto-steps -1 for inverted bounds, which would fabricate
      // buckets instead of failing)
      .filter(col(endCol) >= col(startCol))
      .withColumn("_b", explode(sequence(
        floor(unix_micros(col(startCol)) / (bucketSeconds * 1000000L)),
        floor(unix_micros(col(endCol)) / (bucketSeconds * 1000000L)))))
    pb.join(ib, equiKeys :+ "_b")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_b")
  }
}
