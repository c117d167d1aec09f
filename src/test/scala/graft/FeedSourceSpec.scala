package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** DataSource V2 feed source (the reference's S1 HTTP-ingest surface):
  * payload parsing, schema inference, cursor pushdown, column pruning,
  * per-payload partitioning, and the documented no-egress guard.
  */
class FeedSourceSpec extends SparkSpecBase {
  private val fmt = "graft.sources.FeedSource"

  private def writePayloads(): String = {
    val dir = Files.createTempDirectory("graft_feed").toString
    def w(name: String, body: String): Unit =
      Files.write(java.nio.file.Paths.get(dir, name), body.getBytes("UTF-8"))
    w("page0.json",
      """{"total": 3, "records": [
        |  {"minutes1_utc": "2025-10-01T00:00", "mw": 100, "price": 1.5, "area": "DK1", "ok": true},
        |  {"minutes1_utc": "2025-10-01T00:05", "mw": 110, "price": 2.5, "area": "DK2", "ok": false},
        |  {"minutes1_utc": "2025-10-01T00:10", "mw": null, "price": null, "area": null, "ok": null}
        |]}""".stripMargin)
    w("page1.json",
      """[{"minutes1_utc": "2025-10-01T00:15", "mw": 130, "price": 4.0, "area": "DK1", "ok": true}]""")
    dir
  }

  test("schema inference: long/double/boolean/string with null tolerance") {
    val df = spark.read.format(fmt).option("endpoint", writePayloads()).load()
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types == Map("minutes1_utc" -> "string", "mw" -> "bigint",
      "price" -> "double", "area" -> "string", "ok" -> "boolean"))
    assert(df.count() == 4)
    assert(df.filter(col("mw").isNull).count() == 1)
  }

  test("one input partition per payload file; records round-trip") {
    val df = spark.read.format(fmt).option("endpoint", writePayloads()).load()
    assert(df.rdd.getNumPartitions == 2)
    val got = df.orderBy("minutes1_utc").select("minutes1_utc", "mw")
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSeq == Seq(
      ("2025-10-01T00:00", 100L), ("2025-10-01T00:05", 110L),
      ("2025-10-01T00:10", -1L), ("2025-10-01T00:15", 130L)))
  }

  test("cursor lower bounds push into the scan (startCursor and filters agree)") {
    val dir = writePayloads()
    val viaOption = spark.read.format(fmt).option("endpoint", dir)
      .option("cursorField", "minutes1_utc")
      .option("startCursor", "2025-10-01T00:05").load()
    assert(viaOption.count() == 3)

    val viaFilter = spark.read.format(fmt).option("endpoint", dir)
      .option("cursorField", "minutes1_utc").load()
      .filter(col("minutes1_utc") >= "2025-10-01T00:05")
    assert(viaFilter.count() == 3)
    // the scan node itself carries the pushed bound (reader-side
    // pruning), while the filter stays above it as the exact residual
    val plan = viaFilter.queryExecution.executedPlan
    val scanDesc = plan.collectLeaves().map(_.toString).mkString("\n")
    assert(scanDesc.contains("minutes1_utc >= 2025-10-01T00:05"), scanDesc.take(800))
  }

  test("strict > keeps exact semantics (reader bound is a conservative superset)") {
    // the reader prunes with a single >= bound; the engine-side
    // residual must still drop the boundary record of a strict >
    val df = spark.read.format(fmt).option("endpoint", writePayloads())
      .option("cursorField", "minutes1_utc").load()
      .filter(col("minutes1_utc") > "2025-10-01T00:05")
    assert(df.collect().map(_.getAs[String]("minutes1_utc")).sorted.toSeq ==
      Seq("2025-10-01T00:10", "2025-10-01T00:15"))
  }

  test("column pruning reaches the reader") {
    val df = spark.read.format(fmt).option("endpoint", writePayloads()).load()
      .select("area")
    assert(df.schema.fieldNames.toSeq == Seq("area"))
    assert(df.collect().length == 4)
  }

  test("caller-supplied schema overrides inference") {
    val df = spark.read.format(fmt)
      .schema("minutes1_utc STRING, mw DOUBLE")
      .option("endpoint", writePayloads()).load()
    assert(df.schema("mw").dataType.simpleString == "double")
    assert(df.agg(sum("mw")).head.getDouble(0) == 340.0)
  }

  test("micro-batch stream ingests each payload exactly once and sees late drops") {
    val dir = Files.createTempDirectory("graft_feed_stream").toString
    def w(name: String, body: String): Unit =
      Files.write(java.nio.file.Paths.get(dir, name), body.getBytes("UTF-8"))
    w("drop-000.json",
      """{"records": [{"minutes1_utc": "2025-10-01T00:00", "mw": 100},
        |             {"minutes1_utc": "2025-10-01T00:05", "mw": 110}]}""".stripMargin)
    val q = spark.readStream.format(fmt)
      .schema("minutes1_utc STRING, mw BIGINT")
      .option("endpoint", dir)
      .option("cursorField", "minutes1_utc")
      .option("startCursor", "2025-10-01T00:05") // drops the 00:00 record
      .load()
      .writeStream.format("memory").queryName("feed_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("feed_mem").count() == 1) // 00:05 only
      // a later drop is a new micro-batch; the earlier file is not re-read
      w("drop-001.json",
        """{"records": [{"minutes1_utc": "2025-10-01T00:10", "mw": 120}]}""")
      q.processAllAvailable()
      val rows = spark.table("feed_mem").orderBy("minutes1_utc")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(rows.toSeq == Seq(("2025-10-01T00:05", 110L), ("2025-10-01T00:10", 120L)))
      // no new files -> no new rows (exactly-once per payload)
      q.processAllAvailable()
      assert(spark.table("feed_mem").count() == 2)
    } finally q.stop()
  }

  test("feed offsets round-trip through their JSON form") {
    import graft.sources.FeedSource
    for (f <- Seq("", "/tmp/x/drop-001.json", "we\"ird\\name.json"))
      assert(FeedSource.offsetFromJson(FeedSource.offsetToJson(f)) == f)
  }

  test("the graft-feed short name resolves through DataSourceRegister") {
    val df = spark.read.format("graft-feed")
      .option("endpoint", writePayloads()).load()
    assert(df.count() == 4)
  }

  test("live HTTP streaming without a total envelope refuses with payload-store guidance") {
    // live polling streams are real as of round 11 (FeedHttpSpec) but
    // PLAN against the envelope's `total` (positions); a feed without
    // one still gets the documented payload-store guidance
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/dataset/X",
      (x: com.sun.net.httpserver.HttpExchange) => {
        val body = """{"records": [{"minutes1_utc": "t", "mw": 1}]}"""
          .getBytes("UTF-8")
        x.sendResponseHeaders(200, body.length)
        x.getResponseBody.write(body)
        x.close()
      })
    server.start()
    try {
      val e = intercept[Throwable] {
        val q = spark.readStream.format(fmt)
          .schema("minutes1_utc STRING, mw BIGINT")
          .option("endpoint",
            s"http://127.0.0.1:${server.getAddress.getPort}/dataset/X")
          .option("backoffMs", "1")
          .load()
          .writeStream.format("memory").queryName("feed_http_stream")
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("payload store"), msgs)
    } finally server.stop(0)
  }
}
