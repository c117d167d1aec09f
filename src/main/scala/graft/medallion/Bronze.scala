package graft.medallion

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Watermark

/** Bronze ingest semantics (reference `bronze_ingest.py`):
  * cursor-incremental fetch (S1/S2), append with advisory PK (S3).
  *
  * The HTTP fetch itself is outside the engine (the harness supplies
  * parquet batches standing in for the feed); what the layer owns is
  * the cursor filter, the PK dedup guard, and append ordering.
  */
object Bronze {
  /** Pure form: the rows a new batch contributes — strictly past the
    * cursor (`dlt.sources.incremental`, bronze_ingest.py:13), deduped
    * on the advisory PK (`primary_key="Minutes1UTC"`,
    * bronze_ingest.py:7-11).
    */
  def newRows(batch: DataFrame, cursor: Timestamp): DataFrame =
    Watermark.pastWatermark(batch, "minutes1_utc", cursor)
      .dropDuplicates("minutes1_utc")

  /** The cursor the next run resumes from (dlt state analog), as the
    * reference formats it (bronze_ingest.py:25-30 strftime
    * "%Y-%m-%dT%H:%M"). Pinned to UTC explicitly — the Spark session
    * timezone conf does not reach java.time formatting.
    */
  def nextCursorString(sink: DataFrame): String = {
    val w = Watermark.maxOrEpoch(sink, "minutes1_utc")
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm")
      .withZone(java.time.ZoneOffset.UTC)
      .format(w.toInstant)
  }
}
