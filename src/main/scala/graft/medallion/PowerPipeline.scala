package graft.medallion

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.{IdempotentSink, Watermark}

/** End-to-end bronze → silver → gold orchestration over parquet-dir
  * tables — the reference's three `__main__` scripts
  * (`bronze_ingest.py:85-90`, `silver_transform.py:123-124`,
  * `gold_aggr.py:224-255`) as one rerunnable increment. Each layer is
  * watermark-driven and idempotent (rerun with no new data = no-op),
  * matching dlt-cursor + ON-CONFLICT-DO-NOTHING semantics.
  */
object PowerPipeline {
  case class Paths(base: String) {
    val bronze = s"$base/bronze/power_system_raw"
    val dim = s"$base/silver/dim_time"
    val fact = s"$base/silver/fact_power_system"
    val gold = s"$base/gold/power_system_5min_avg"
    val mlCsv = s"$base/export/ml_features"
  }

  private def readOrEmpty(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (IdempotentSink.exists(spark, path)) IdempotentSink.read(spark, path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** One incremental run: ingest `batch` into bronze, propagate through
    * silver and gold. Safe to call repeatedly / with overlapping
    * batches.
    */
  def runIncrement(spark: SparkSession, batch: DataFrame, paths: Paths): Unit = {
    // bronze (S1-S3): cursor filter + PK dedup + append-if-absent
    val bronzeSink = readOrEmpty(spark, paths.bronze, PowerSchemas.raw)
    val cursor = Watermark.maxOrEpoch(bronzeSink, "minutes1_utc")
    IdempotentSink.appendIfAbsent(spark,
      Bronze.newRows(batch, cursor), paths.bronze, Seq("minutes1_utc"))

    // silver (S4-S7): watermark from fact sink, dim + fact upserts
    val bronze = IdempotentSink.read(spark, paths.bronze)
    val factSink = readOrEmpty(spark, paths.fact, PowerSchemas.fact)
    val silverWm = Watermark.maxOrEpoch(factSink, "time_id")
    IdempotentSink.appendIfAbsent(spark,
      Silver.dimTime(bronze, silverWm), paths.dim, Seq("time_id"))
    IdempotentSink.appendIfAbsent(spark,
      Silver.fact(bronze, silverWm), paths.fact, Seq("time_id"))

    // gold (J1, W1-W18, lookback+trim): watermark from gold sink
    val fact = IdempotentSink.read(spark, paths.fact)
    val dim = IdempotentSink.read(spark, paths.dim)
    val goldWm =
      if (IdempotentSink.exists(spark, paths.gold))
        Watermark.maxOrEpoch(IdempotentSink.read(spark, paths.gold), "time_id")
      else Watermark.Epoch
    IdempotentSink.appendIfAbsent(spark,
      Gold.features(fact, dim, goldWm), paths.gold, Seq("time_id"))
  }

  def exportCsv(spark: SparkSession, paths: Paths): Unit =
    Gold.exportMlFeatures(IdempotentSink.read(spark, paths.gold), paths.mlCsv)
}
