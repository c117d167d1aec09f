package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The reference's S1 surface — an HTTP JSON feed with an incremental
  * cursor (`bronze_ingest.py:21-43`: GET with a `start` param, records
  * under the `"records"` key, sorted by `Minutes1UTC`) — as a Spark
  * DataSource V2 `TableProvider`:
  *
  * {{{
  * spark.read.format("graft.sources.FeedSource")
  *   .option("endpoint", "/data/fetched")       // payload store
  *   .option("cursorField", "minutes1_utc")     // optional
  *   .option("startCursor", "2025-10-01T00:00") // optional
  *   .load()
  * }}}
  *
  * The transport is pluggable by URI scheme. Any Hadoop-addressable
  * endpoint (local path, `file:`, `hdfs:`, `s3a:` …) reads previously
  * fetched response payloads (one JSON body per file — the shape a
  * fetch sidecar or `curl` cron drops on shared storage); listing runs
  * on the driver with the session's Hadoop config and the partition
  * readers open payloads through the same serialized config, so
  * credentials and scheme impls reach the executors. Payload stores
  * are the robust form at scale: payloads land once, scans
  * parallelize per payload file with no rate-limited API in the job's
  * critical path.
  *
  * `http(s):` endpoints do a LIVE GET (the reference's transport,
  * `bronze_ingest.py:30-39`: `start`/`sort`/`offset` query params,
  * records under `"records"`). The batch planner first probes the API
  * with `limit=1` and reads the response's `total` field (the
  * Energinet response envelope); when present, the scan plans one
  * input partition per `offset`/`limit` page of `pageSize` records,
  * so the fetch itself parallelizes across executors — the reference's
  * single unbounded GET becomes a distributed paged read (each page
  * validated against the probe's promised count — a server that caps
  * `limit` below `pageSize` fails loudly instead of dropping rows).
  * APIs without a `total` field fall back to one sequential reader
  * that pages until an empty page. Transient failures (HTTP 429/5xx,
  * connection errors) retry with exponential backoff (`maxRetries`,
  * `backoffMs`). Offset paging is deterministic when the feed is
  * append-only and sorted ascending by the cursor (the `sort` param
  * is sent whenever `cursorField` is set); records that land after
  * the probe are simply picked up by the next incremental poll — the
  * same at-least-once contract the cursor/PK machinery already
  * absorbs. `readStream` on an `http(s):` endpoint is a RATE-CAPPED
  * polling stream ([[HttpPollingMicroBatchStream]]): the checkpointed
  * offset is the record POSITION in the cursor-bounded feed (stable
  * because the feed is append-only and cursor-sorted), each trigger
  * probes `total` at most once per `pollIntervalMs` and admits at
  * most `maxPagesPerPoll` pages, so a continuous query can never
  * hammer the API — and a payload store remains the recommended form
  * when a fetch sidecar is available (no API in the critical path at
  * all).
  *
  * - **Schema**: caller-supplied via `.schema(...)`, else inferred from
  *   the first payload's records (flat JSON: long/double/boolean/string
  *   — the reference feed is flat; nested nodes read as JSON strings).
  * - **Cursor pushdown**: `>=` / `>` filters on `cursorField` (and the
  *   `startCursor` option) are evaluated inside the partition readers
  *   before rows materialize — the V2 mirror of the API's server-side
  *   `start` param. `.explain` shows them under `PushedFilters`.
  * - **Column pruning**: only requested fields are parsed into rows.
  * - **Partitioning**: one input partition per payload file; a feed
  *   polled every N minutes scales out by file count, not record count.
  * - **Streaming**: `spark.readStream.format(...)` works too — a
  *   [[FeedMicroBatchStream]] whose checkpointed offset is the last
  *   payload file ingested, so each drop is read exactly once and a
  *   restarted query resumes mid-feed (the dlt incremental-state
  *   contract, engine-managed).
  *
  * Incremental loads compose with the existing machinery: read with
  * `startCursor` = `Watermark.cursor(...)` of the bronze table, then
  * append via `IdempotentSink` — the dlt `write_disposition="append"`
  * + `primary_key` contract, Spark-first.
  */
class FeedSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  /** `spark.read.format("graft-feed")` — registered via the standard
    * META-INF/services/org.apache.spark.sql.sources.DataSourceRegister
    * entry; the fully-qualified class name keeps working too.
    */
  override def shortName(): String = "graft-feed"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FeedSource.inferSchema(options)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new FeedTable(schema, new CaseInsensitiveStringMap(properties))
}

private[sources] class FeedTable(schema0: StructType,
    options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"feed(${FeedSource.endpoint(options)})"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new FeedScanBuilder(schema0, options)
}

private[sources] class FeedScanBuilder(full: StructType,
    options: CaseInsensitiveStringMap) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private val cursorField = FeedSource.cursorField(options)
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // record cursor lower bounds (the API's `start` param) so the
    // readers can prune records early, but return EVERY filter as
    // residual: the reader's single `>=` bound is a conservative
    // superset of a strict `>` (and of a bare IsNotNull), so Spark
    // must re-apply exact semantics above the scan. Filters NOT
    // returned here are treated as fully applied by the source —
    // swallowing a strict `>` would leak the boundary record.
    pushed = filters.filter {
      case GreaterThanOrEqual(a, _: String) => cursorField.contains(a)
      case GreaterThan(a, _: String) => cursorField.contains(a)
      case IsNotNull(a) => cursorField.contains(a)
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(full.fields.filter(f => keep.contains(f.name)))
  }

  override def build(): Scan = {
    val bound = (FeedSource.startCursor(options).toSeq ++ pushed.collect {
      case GreaterThanOrEqual(_, v: String) => v
      case GreaterThan(_, v: String) => v
    }).sorted.lastOption // tightest lower bound wins
    new FeedScan(required, FeedSource.endpoint(options),
      FeedSource.recordsField(options), cursorField, bound,
      FeedSource.httpConf(options))
  }
}

private[sources] class FeedScan(schema: StructType, endpoint: String,
    recordsField: String, cursorField: Option[String], bound: Option[String],
    http: HttpConf) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"FeedScan[endpoint=$endpoint, cursor=${cursorField.orNull} >= ${bound.orNull}]"
  override def planInputPartitions(): Array[InputPartition] =
    if (FeedSource.isHttp(endpoint)) {
      // one driver-side probe (limit=1) for the response envelope's
      // `total`; present -> one partition per offset page (the fetch
      // parallelizes across executors), absent -> one sequential pager
      HttpFeed.probeTotal(endpoint, cursorField, bound, http) match {
        case Some(total) =>
          // each partition carries the count the probe PROMISED it
          // (min(pageSize, total-offset)); the reader throws on a
          // shorter page, so a server that caps `limit` below pageSize
          // fails loudly instead of silently dropping rows per page
          (0L until total by http.pageSize)
            .map(o => HttpFeedPartition(o, http.pageSize,
              math.min(http.pageSize.toLong, total - o)): InputPartition)
            .toArray
        case None => Array(HttpFeedPartition(0L, -1, -1L))
      }
    } else {
      FeedSource.listPayloads(endpoint, FeedSource.driverConf())
        .map(f => FeedPartition(f): InputPartition).toArray
    }
  override def createReaderFactory(): PartitionReaderFactory =
    new FeedReaderFactory(schema, endpoint, recordsField, cursorField, bound,
      http,
      if (FeedSource.isHttp(endpoint)) null
      else new SerializableHadoopConf(FeedSource.driverConf()))
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    if (FeedSource.isHttp(endpoint))
      new HttpPollingMicroBatchStream(schema, endpoint, recordsField,
        cursorField, bound, http)
    else
      new FeedMicroBatchStream(schema, endpoint, recordsField, cursorField,
        bound)
}

/** Streaming face of the feed — the reference's poll loop (each dlt
  * run ingests records past the stored cursor) as a Spark
  * `MicroBatchStream`: the offset is the lexicographically last
  * payload file ingested, each micro-batch reads exactly the files
  * that arrived since, and the engine's checkpoint carries the offset
  * so restarts resume without re-reading (the dlt-state contract,
  * engine-managed). Requires monotonic payload names (fetch sidecars
  * name drops by timestamp), mirroring the cursor monotonicity the
  * reference's incremental load already assumes. The reader-side
  * cursor bound applies per batch, so late records below `startCursor`
  * stay out exactly as in the batch path.
  */
private[sources] class FeedMicroBatchStream(schema: StructType,
    endpoint: String, recordsField: String, cursorField: Option[String],
    bound: Option[String]) extends MicroBatchStream {
  override def initialOffset(): Offset = FeedOffset("")
  override def latestOffset(): Offset =
    FeedOffset(FeedSource.listPayloads(endpoint, FeedSource.driverConf())
      .lastOption.getOrElse(""))
  override def deserializeOffset(json: String): Offset =
    FeedOffset(FeedSource.offsetFromJson(json))
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[FeedOffset].lastFile
    val hi = end.asInstanceOf[FeedOffset].lastFile
    FeedSource.listPayloads(endpoint, FeedSource.driverConf())
      .filter(f => f > lo && f <= hi)
      .map(f => FeedPartition(f): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new FeedReaderFactory(schema, endpoint, recordsField, cursorField, bound,
      null, new SerializableHadoopConf(FeedSource.driverConf()))
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class FeedOffset(lastFile: String) extends Offset {
  override def json(): String = FeedSource.offsetToJson(lastFile)
}

/** Streaming face of the LIVE transport — the reference's "run the
  * pipeline again for new data" loop as a continuous query, without
  * putting an uncapped API fan-out in its critical path. The
  * checkpointed offset is the record POSITION within the
  * cursor-bounded feed: the feed is append-only and sorted ascending
  * by the cursor (the same monotonicity the batch pager and the
  * reference's incremental load already assume), so positions never
  * shift and a restarted query resumes exactly where it committed.
  * Rate caps, both enforced here rather than left to the trigger:
  *  - `pollIntervalMs`: the `total` probe (one GET) runs at most once
  *    per interval — a fast trigger reuses the cached total instead
  *    of re-probing;
  *  - `maxPagesPerPoll`: each micro-batch admits at most this many
  *    pages (`SupportsAdmissionControl`), so a backlogged feed drains
  *    in bounded steps and `Trigger.AvailableNow` catches up in
  *    several small batches instead of one unbounded fetch.
  * Requires the `total` envelope field (the Energinet shape the
  * reference polls); feeds without it should land payloads in a store
  * and stream that instead.
  */
private[sources] class HttpPollingMicroBatchStream(schema: StructType,
    endpoint: String, recordsField: String, cursorField: Option[String],
    bound: Option[String], http: HttpConf) extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {
  private var lastProbeAt = -1L
  private var lastTotal = 0L
  // Trigger.AvailableNow drain target, captured ONCE at query start
  // (Spark 4 requires the source itself to implement the trait —
  // without it the engine falls back to one unbounded Trigger.Once
  // batch, defeating the admission cap): batches advance toward this
  // fixed position in maxPagesPerPoll steps and the query stops there,
  // even if the feed keeps growing mid-drain.
  private var availableNowTarget = -1L
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = probedTotal()
  private def probedTotal(): Long = {
    val now = System.currentTimeMillis()
    if (lastProbeAt < 0 || now - lastProbeAt >= http.pollIntervalMs) {
      lastTotal = HttpFeed.probeTotal(endpoint, cursorField, bound, http)
        .getOrElse(throw new UnsupportedOperationException(
          s"live polling requires a '${http.totalField}' field in the " +
            "response envelope (positions are planned against it); for " +
            "feeds without one, poll into a payload store and stream " +
            "that endpoint instead"))
      lastProbeAt = now
    }
    lastTotal
  }

  override def initialOffset(): Offset = FeedPosOffset(0L)
  override def deserializeOffset(json: String): Offset =
    FeedPosOffset(FeedSource.posFromJson(json))
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) — this stream uses admission control")
  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(http.maxPagesPerPoll.toLong * http.pageSize)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[FeedPosOffset].pos
    val cap = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => Long.MaxValue // ReadAllAvailable: drain to the probe
    }
    val target =
      if (availableNowTarget >= 0) availableNowTarget else probedTotal()
    FeedPosOffset(math.min(target, s + cap))
  }
  override def reportLatestOffset(): Offset = FeedPosOffset(lastTotal)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FeedPosOffset].pos
    val e = end.asInstanceOf[FeedPosOffset].pos
    // pages within [s, e); e was admitted against a probed total, and
    // the feed is append-only, so every page is full — `expected`
    // doubles as the capped-server tripwire exactly as in batch
    (s until e by http.pageSize).map { o =>
      val l = math.min(http.pageSize.toLong, e - o)
      HttpFeedPartition(o, l.toInt, l): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new FeedReaderFactory(schema, endpoint, recordsField, cursorField, bound,
      http, null)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class FeedPosOffset(pos: Long) extends Offset {
  override def json(): String = s"""{"pos":$pos}"""
}

private[sources] case class FeedPartition(path: String) extends InputPartition

/** One HTTP page: GET `endpoint?offset=o&limit=pageSize` on the
  * executor that owns the partition. `limit == -1` marks the
  * no-`total` fallback — a single reader that pages sequentially from
  * `offset` until an EMPTY page. `expected` is the record count the
  * planner's `total` probe promised this page (the feed is
  * append-only, so the true page can only be >= it); a shorter page
  * means the server capped `limit` below the requested size and the
  * reader must fail loudly rather than lose rows.
  */
private[sources] case class HttpFeedPartition(offset: Long, limit: Int,
    expected: Long) extends InputPartition

/** Live-GET knobs, serialized to the executors with the reader
  * factory. Param names default to the Energinet envelope
  * (`offset`/`limit`/`start`/`sort`, `total` in the response) and are
  * overridable per deployment.
  */
private[sources] case class HttpConf(pageSize: Int, maxRetries: Int,
    backoffMs: Long, timeoutMs: Long, totalField: String,
    offsetParam: String, limitParam: String, startParam: String,
    sortParam: String, maxPagesPerPoll: Int, pollIntervalMs: Long)
    extends Serializable

/** Hadoop `Configuration` with Java serialization, so executor-side
  * readers open payloads through the SAME filesystem config the
  * driver planned with (credentials, scheme impls) — the payload
  * store can be any Hadoop-addressable FS (local, HDFS, S3A), not
  * just the driver's local disk.
  */
private[sources] class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

private[sources] class FeedReaderFactory(schema: StructType, endpoint: String,
    recordsField: String, cursorField: Option[String], bound: Option[String],
    http: HttpConf, conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case FeedPartition(path) =>
        new FeedReader(path, schema, recordsField, cursorField, bound, conf)
      case HttpFeedPartition(offset, limit, expected) =>
        new HttpFeedReader(endpoint, offset, limit, expected, schema,
          recordsField, cursorField, bound, http)
    }
}

private[sources] class FeedReader(path: String, schema: StructType,
    recordsField: String, cursorField: Option[String], bound: Option[String],
    conf: SerializableHadoopConf) extends PartitionReader[InternalRow] {
  private val records: Iterator[JsonNode] = {
    val it = FeedSource.records(
      FeedSource.parse(path, conf.value), recordsField)
    (cursorField, bound) match {
      case (Some(c), Some(b)) =>
        it.filter(n => n.hasNonNull(c) && n.get(c).asText() >= b)
      case _ => it
    }
  }
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (!records.hasNext) return false
    val n = records.next()
    row = InternalRow.fromSeq(schema.fields.toSeq.map(f =>
      FeedSource.catalystValue(n.get(f.name), f.dataType)))
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}

/** Executor-side live GET: one page per partition (`limit >= 0`), or
  * the sequential no-`total` pager (`limit == -1`, pages of
  * `http.pageSize` until an empty page). The cursor bound travels both
  * as the API's `start` param (server-side pruning, the reference's
  * incremental contract) AND as a reader-side re-filter — the same
  * conservative-superset stance as the payload-store reader, so a
  * server that ignores `start` still yields correct results.
  */
private[sources] class HttpFeedReader(endpoint: String, offset: Long,
    limit: Int, expected: Long, schema: StructType, recordsField: String,
    cursorField: Option[String], bound: Option[String], http: HttpConf)
    extends PartitionReader[InternalRow] {
  private def bounded(it: Iterator[JsonNode]): Iterator[JsonNode] =
    (cursorField, bound) match {
      case (Some(c), Some(b)) =>
        it.filter(n => n.hasNonNull(c) && n.get(c).asText() >= b)
      case _ => it
    }
  private def page(o: Long, l: Int): Vector[JsonNode] =
    FeedSource.records(
      HttpFeed.getJson(endpoint, o, l, cursorField, bound, http),
      recordsField).toVector

  private val records: Iterator[JsonNode] =
    if (limit >= 0) {
      // paged mode: the planner's probe promised `expected` records at
      // this offset (the feed is append-only, so the live count can
      // only be >=). A shorter page means the server honored a smaller
      // `limit` than requested — every partition would silently drop
      // rows, so fail loudly with the fix (a pageSize at or below the
      // server's cap).
      val raw = page(offset, limit)
      if (expected >= 0 && raw.length < expected)
        throw new java.io.IOException(
          s"feed page at offset=$offset returned ${raw.length} records, " +
            s"expected $expected: the server caps '${http.limitParam}' " +
            s"below the requested pageSize=$limit; set pageSize at or " +
            "below the server's page cap")
      bounded(raw.iterator)
    } else new Iterator[JsonNode] { // sequential pager
      private var at = offset
      private var cur: Iterator[JsonNode] = Iterator.empty
      private var done = false
      private def advance(): Unit =
        while (!cur.hasNext && !done) {
          val p = page(at, http.pageSize)
          at += p.length
          // only an EMPTY page ends the feed: a server that caps
          // `limit` below pageSize returns short-but-nonempty pages,
          // and stopping there would silently truncate the read (the
          // cost is one extra GET per scan on honest servers)
          done = p.isEmpty
          cur = bounded(p.iterator)
        }
      override def hasNext: Boolean = { advance(); cur.hasNext }
      override def next(): JsonNode = { advance(); cur.next() }
    }

  private var row: InternalRow = _
  override def next(): Boolean = {
    if (!records.hasNext) return false
    val n = records.next()
    row = InternalRow.fromSeq(schema.fields.toSeq.map(f =>
      FeedSource.catalystValue(n.get(f.name), f.dataType)))
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}

/** Shared HTTP plumbing: param-encoded URLs, bounded retries with
  * exponential backoff on transient failures (HTTP 429/5xx and
  * connection errors; other 4xx fail fast), and the `total` probe the
  * batch planner pages by.
  */
private[sources] object HttpFeed {
  private val mapper = new ObjectMapper()

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  private[sources] def pageUrl(endpoint: String, offset: Long, limit: Int,
      cursorField: Option[String], bound: Option[String],
      http: HttpConf): String = {
    val params =
      Seq(http.offsetParam -> offset.toString, http.limitParam -> limit.toString) ++
        bound.map(http.startParam -> _) ++
        cursorField.map(http.sortParam -> _)
    val sep = if (endpoint.contains("?")) "&" else "?"
    endpoint + sep + params.map { case (k, v) => enc(k) + "=" + enc(v) }
      .mkString("&")
  }

  /** Non-retryable HTTP failure (4xx other than 429): the request
    * itself is wrong, backing off won't fix it.
    */
  private[sources] final class ClientError(msg: String)
      extends RuntimeException(msg)

  /** GET with retries; returns the response body. Retries transient
    * failures (HTTP 429/5xx, connection-level IOExceptions) up to
    * `maxRetries` times with `backoffMs * 2^attempt` sleeps; other
    * 4xx fail fast.
    */
  private[sources] def get(url: String, http: HttpConf): String = {
    var attempt = 0
    while (true) {
      try {
        val conn = java.net.URI.create(url).toURL.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setConnectTimeout(http.timeoutMs.toInt)
        conn.setReadTimeout(http.timeoutMs.toInt)
        conn.setRequestProperty("Accept", "application/json")
        try {
          val code = conn.getResponseCode
          if (code >= 200 && code < 300) {
            val in = conn.getInputStream
            try return new String(in.readAllBytes(), "UTF-8")
            finally in.close()
          } else if (code == 429 || code >= 500) {
            throw new java.io.IOException(s"feed GET $url: HTTP $code")
          } else {
            throw new ClientError(s"feed GET $url failed with HTTP $code")
          }
        } finally conn.disconnect()
      } catch {
        case e: ClientError => throw e
        case e: java.io.IOException =>
          attempt += 1
          if (attempt > http.maxRetries)
            throw new java.io.IOException(
              s"feed GET failing after ${http.maxRetries} retries: " +
                e.getMessage, e)
          Thread.sleep(http.backoffMs << (attempt - 1))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private[sources] def getJson(endpoint: String, offset: Long, limit: Int,
      cursorField: Option[String], bound: Option[String],
      http: HttpConf): JsonNode =
    mapper.readTree(
      get(pageUrl(endpoint, offset, limit, cursorField, bound, http), http))

  /** `limit=1` probe for the response envelope's `total` (the count
    * matching the request's `start` bound). Absent / non-numeric ->
    * None -> sequential-pager fallback.
    */
  private[sources] def probeTotal(endpoint: String,
      cursorField: Option[String], bound: Option[String],
      http: HttpConf): Option[Long] = {
    val root = getJson(endpoint, 0L, 1, cursorField, bound, http)
    val t = root.path(http.totalField)
    if (t.isIntegralNumber) Some(t.asLong()) else None
  }
}

object FeedSource {
  private val mapper = new ObjectMapper()

  private[sources] def endpoint(o: CaseInsensitiveStringMap): String = {
    val e = o.get("endpoint")
    require(e != null && e.nonEmpty, "feed source requires an `endpoint` option")
    e
  }
  private[sources] def isHttp(endpoint: String): Boolean =
    endpoint.startsWith("http://") || endpoint.startsWith("https://")
  private def intOpt(o: CaseInsensitiveStringMap, k: String, d: Int): Int =
    Option(o.get(k)).map(_.toInt).getOrElse(d)
  private def strOpt(o: CaseInsensitiveStringMap, k: String, d: String): String =
    Option(o.get(k)).getOrElse(d)
  private[sources] def httpConf(o: CaseInsensitiveStringMap): HttpConf =
    HttpConf(
      pageSize = intOpt(o, "pageSize", 5000),
      maxRetries = intOpt(o, "maxRetries", 4),
      backoffMs = intOpt(o, "backoffMs", 200).toLong,
      timeoutMs = intOpt(o, "requestTimeoutMs", 30000).toLong,
      totalField = strOpt(o, "totalField", "total"),
      offsetParam = strOpt(o, "offsetParam", "offset"),
      limitParam = strOpt(o, "limitParam", "limit"),
      startParam = strOpt(o, "startParam", "start"),
      sortParam = strOpt(o, "sortParam", "sort"),
      maxPagesPerPoll = intOpt(o, "maxPagesPerPoll", 8),
      pollIntervalMs = intOpt(o, "pollIntervalMs", 1000).toLong)
  private[sources] def recordsField(o: CaseInsensitiveStringMap): String =
    Option(o.get("recordsField")).getOrElse("records")
  private[sources] def cursorField(o: CaseInsensitiveStringMap): Option[String] =
    Option(o.get("cursorField"))
  private[sources] def startCursor(o: CaseInsensitiveStringMap): Option[String] =
    Option(o.get("startCursor"))

  /** The driver-side Hadoop config: the active session's, so scheme
    * impls and credentials configured on the session reach both the
    * listing here and (via [[SerializableHadoopConf]]) the readers.
    */
  private[sources] def driverConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

  /** Payload files under the endpoint — any Hadoop-addressable store
    * (local path, `file:`, `hdfs:`, `s3a:` …): a single file, or every
    * `*.json` in a directory, sorted for deterministic partition order
    * (and for the streaming offset, which is the lexicographically
    * last name — monotonic drop names make the listing append-only).
    * A missing or empty directory is an empty feed, not an error:
    * streams start before the first drop lands.
    */
  private[sources] def listPayloads(endpoint: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(endpoint)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else {
      val st = fs.getFileStatus(p)
      if (st.isFile) Seq(st.getPath.toString)
      else fs.listStatus(p)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".json"))
        .map(_.getPath.toString).sorted.toSeq
    }
  }

  private[sources] def payloadFiles(o: CaseInsensitiveStringMap): Seq[String] =
    listPayloads(endpoint(o), driverConf())

  private[graft] def offsetToJson(lastFile: String): String =
    mapper.writeValueAsString(
      mapper.createObjectNode().put("lastFile", lastFile))

  private[graft] def offsetFromJson(json: String): String =
    mapper.readTree(json).path("lastFile").asText("")

  private[graft] def posFromJson(json: String): Long =
    mapper.readTree(json).path("pos").asLong(0L)

  private[sources] def parse(path: String,
      conf: org.apache.hadoop.conf.Configuration): JsonNode = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(conf).open(p)
    try mapper.readTree(in) finally in.close()
  }

  /** Records in a payload: the configured field of a response object,
    * or the payload itself when it is already a bare JSON array.
    */
  private[sources] def records(root: JsonNode, field: String): Iterator[JsonNode] = {
    val arr = if (root.isArray) root else root.path(field)
    require(arr.isArray, s"payload has no array under '$field'")
    arr.elements().asScala
  }

  /** Flat-record schema inference, ADDITIVE across EVERY payload (the
    * dlt auto-evolve contract made explicit: an API that adds a field
    * mid-feed yields the union schema, and payloads that predate the
    * field read it back as NULL — the same additive-only policy as
    * `IdempotentSink.checkEvolution` downstream): long ⊂ double
    * promotion across records, booleans, strings for text/timestamps/
    * nested nodes, a cross-payload type CONFLICT widens to string (the
    * lenient bronze-layer stance — the loud rejection point is the
    * sink's append, where a type change on a shared column throws).
    * Nullable throughout. Cost is one driver-side parse per payload
    * file — fine at poll-drop counts; a store big enough to feel it
    * should pass an explicit `.schema(...)`, which skips inference
    * entirely.
    */
  private[sources] def inferSchema(o: CaseInsensitiveStringMap): StructType = {
    val kinds = mutable.LinkedHashMap.empty[String, DataType]
    def fold(recs: Iterator[JsonNode]): Unit = recs.foreach { rec =>
      rec.properties().asScala.foreach { e =>
        val t = e.getValue match {
          case v if v.isNull => NullType
          case v if v.isBoolean => BooleanType
          case v if v.isIntegralNumber => LongType
          case v if v.isNumber => DoubleType
          case _ => StringType
        }
        kinds.get(e.getKey) match {
          case None | Some(NullType) => kinds(e.getKey) = t
          case Some(LongType) if t == DoubleType => kinds(e.getKey) = DoubleType
          case Some(prev) if prev != t && t != NullType &&
              !(prev == DoubleType && t == LongType) =>
            kinds(e.getKey) = StringType
          case _ => ()
        }
      }
    }
    val ep = endpoint(o)
    if (isHttp(ep)) {
      // one probe page (a pageSize-bounded GET): live APIs serve a
      // uniform current schema, so one page suffices — historic
      // payloads that predate a field live in payload stores, where
      // the cross-payload union below applies
      val http = httpConf(o)
      fold(records(
        HttpFeed.getJson(ep, 0L, http.pageSize, cursorField(o),
          startCursor(o), http), recordsField(o)))
      require(kinds.nonEmpty, s"feed endpoint $ep returned no records to infer from")
    } else {
      val files = payloadFiles(o)
      require(files.nonEmpty, "feed endpoint has no payload files")
      files.foreach(f => fold(records(parse(f, driverConf()), recordsField(o))))
    }
    StructType(kinds.toSeq.map { case (k, t) =>
      StructField(k, if (t == NullType) StringType else t)
    })
  }

  /** JSON node → catalyst value under the requested type. Lenient on
    * the string side (`asText` renders nested nodes as JSON text) and
    * strict enough on numerics to surface schema drift as nulls, the
    * bronze-layer convention.
    */
  private[sources] def catalystValue(n: JsonNode, dt: DataType): Any = {
    if (n == null || n.isNull || n.isMissingNode) return null
    dt match {
      case LongType => if (n.isNumber) n.asLong() else null
      case IntegerType => if (n.isNumber) n.asInt() else null
      case DoubleType => if (n.isNumber) n.asDouble() else null
      case BooleanType => if (n.isBoolean) n.asBoolean() else null
      case StringType =>
        UTF8String.fromString(if (n.isValueNode) n.asText() else n.toString)
      case other =>
        throw new UnsupportedOperationException(
          s"feed source supports flat long/int/double/boolean/string records; got $other")
    }
  }
}
