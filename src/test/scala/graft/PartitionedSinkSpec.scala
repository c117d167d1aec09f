package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.{PartitionedSink, Tables}

class PartitionedSinkSpec extends SparkSpecBase {
  test("date-partitioned sink prunes partitions for watermark predicates") {
    val dir = Files.createTempDirectory("graft_part").toString + "/events"
    val events = Tables.events(spark, sf("sf0.001"))
    PartitionedSink.writeByDate(events, "ts", dir)

    val filtered = PartitionedSink.readByDate(spark, dir)
      .filter(col("p_date") > lit(java.sql.Date.valueOf("2024-01-20")))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(p_date"),
      s"no partition filter:\n$plan")
    // pruning is real: fewer files read than exist
    val expected = events.filter(to_date(col("ts")) > lit(java.sql.Date.valueOf("2024-01-20"))).count()
    assert(filtered.count() == expected)
  }

  test("compaction preserves data and reduces file count") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    val events = Tables.events(spark, sf("sf0.001"))
    events.repartition(37).write.parquet(dir) // deliberately fragmented
    def files() = new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    val before = files()
    val checksum = spark.read.parquet(dir).agg(sum(col("event_id")), count(lit(1))).head
    PartitionedSink.compact(spark, dir, targetMB = 128)
    assert(files() < before, s"no compaction: $before -> ${files()}")
    val after = spark.read.parquet(dir).agg(sum(col("event_id")), count(lit(1))).head
    assert(checksum == after)
  }
}
