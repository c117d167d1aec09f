package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming realizations of the reference's incremental
  * semantics (SURVEY §2.9): the reference's "run the batch again for
  * new data" contract IS micro-batch streaming, so each piece maps
  * 1:1 — dlt cursor → checkpointed source offsets, MAX(time_id)
  * watermark → `withWatermark`, ON-CONFLICT dedup → `dropDuplicates`
  * within the watermark.
  */
object StreamingPower {
  /** File-source incremental ingest: new parquet files appearing under
    * `srcDir` are exactly the reference's "new rows since cursor"
    * (bronze_ingest.py:13) — offsets checkpointed by the sink query.
    */
  def ingest(spark: SparkSession, srcDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(srcDir)

  /** Late-duplicate drop within the watermark horizon — the streaming
    * form of the PK guard (S3/S7).
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: String, keyCol: String,
      horizon: String): DataFrame =
    events.withWatermark(tsCol, horizon).dropDuplicates(keyCol, tsCol)

  /** Tumbling per-minute aggregate with event-time watermark — the
    * streaming analog of the gold per-minute feature row.
    */
  def minuteAggregate(events: DataFrame, horizon: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", horizon)
      .groupBy(window(col("ts"), "1 minute").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("minute_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** The medallion pipeline driven BY Structured Streaming: new feed
    * files arriving under `feedDir` become micro-batches, and each
    * micro-batch runs the full incremental bronze→silver→gold pass via
    * `foreachBatch` — the reference's rerun-for-new-data loop
    * (bronze_ingest.py:86-89) with checkpointed offsets instead of a
    * manual cursor. Watermark + lookback+trim semantics are exactly
    * the batch pipeline's (SURVEY §2.9 "same lookback+trim in
    * foreachBatch").
    */
  def medallionStream(spark: SparkSession, feedDir: String, checkpoint: String,
      paths: graft.medallion.PowerPipeline.Paths): org.apache.spark.sql.streaming.StreamingQuery =
    ingest(spark, feedDir, graft.medallion.PowerSchemas.raw)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.medallion.PowerPipeline.runIncrement(batch.sparkSession, batch, paths)
      }
      .start()

  // --- stateful sessionization (flatMapGroupsWithState) ---

  case class Evt(user_id: Long, ts: Timestamp, value: Double)
  case class SessionBuf(start: Long, end: Long, n: Long, total: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  /** Per-user gap sessionization with explicit state — the custom-state
    * form (`flatMapGroupsWithState`) of `Sessions.sessionize`. Emits a
    * session when a gap > `gapMinutes` is observed; the still-open
    * session stays in state (flushed by timeout in production; tests
    * read emitted-closed sessions).
    *
    * State per key is one fixed-size buffer — safe at any key
    * cardinality; skewed users cost sort time within their group only.
    */
  def sessionize(events: Dataset[Evt], gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    // µs precision throughout: Timestamp.getTime is ms-truncated, which
    // would both misorder same-ms events and shift gap boundaries.
    def micros(t: Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    def fromMicros(us: Long): Timestamp =
      Timestamp.from(java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Evt], state: GroupState[SessionBuf]) =>
          val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.value))
          var buf = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          sorted.foreach { e =>
            val us = micros(e.ts)
            if (buf == null) buf = SessionBuf(us, us, 1, e.value)
            else if (us - buf.end > gapUs) {
              out += SessionOut(user, fromMicros(buf.start), fromMicros(buf.end),
                buf.n, buf.total)
              buf = SessionBuf(us, us, 1, e.value)
            } else buf = SessionBuf(buf.start, us, buf.n + 1, buf.total + e.value)
          }
          if (buf != null) state.update(buf)
          out.iterator
      }
  }
}
