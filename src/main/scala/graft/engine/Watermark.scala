package graft.engine

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sink-derived watermark semantics.
  *
  * The reference persists an incremental cursor (dlt,
  * `bronze_ingest.py:13`) for ingest and recomputes per-layer watermarks
  * as `SELECT COALESCE(MAX(time_id), '1970-01-01'::TIMESTAMP)`
  * (`silver_transform.py:54-58`, `gold_aggr.py:59-63`). Here the probe
  * is a tiny ungrouped-max action: partial max per partition, single
  * combine at the driver — O(partitions) traffic, safe at any scale.
  */
object Watermark {
  val Epoch: Timestamp = Timestamp.valueOf("1970-01-01 00:00:00")

  /** `COALESCE(MAX(c), epoch)` as a driver-side scalar (A1). */
  def maxOrEpoch(sink: DataFrame, c: String): Timestamp =
    Option(sink.agg(max(col(c))).head.getTimestamp(0)).getOrElse(Epoch)

  /** Rows strictly past the watermark (P4) — the reference's
    * incremental predicate (`silver_transform.py:80,103`). Parquet
    * min/max stats + partition pruning make this a metadata-only skip
    * of already-processed data at scale.
    */
  def pastWatermark(df: DataFrame, c: String, w: Timestamp): DataFrame =
    df.filter(col(c) > lit(w))

  /** Watermark minus a lookback, for window-frame warm-up
    * (`gold_aggr.py:98`: re-read 4 minutes before the watermark so
    * trailing frames are warm, then trim to rows past the watermark).
    */
  def lookback(w: Timestamp, minutes: Long): Timestamp =
    Timestamp.from(w.toInstant.minusSeconds(minutes * 60))

  /** Cursor formatted as the reference's API param
    * (`bronze_ingest.py:25-30`, strftime "%Y-%m-%dT%H:%M").
    */
  def cursorString(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm")
}
