package graft

import java.sql.Timestamp
import org.apache.spark.sql.{Row, SparkSession}
import graft.medallion.{PowerPipeline, PowerSchemas}

/** Runnable end-to-end demo of the medallion pipeline — the library
  * consumer's view of Bronze→Silver→Gold: two incremental feed batches
  * (the reference's run-again-for-new-data contract,
  * bronze_ingest.py:86-89), an idempotent rerun, and the CSV export.
  *
  *   sbt "runMain graft.PowerPipelineDemo /tmp/power_demo"
  */
object PowerPipelineDemo {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/power_demo")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def feed(fromMin: Int, toMin: Int) = {
      val rows = (fromMin until toMin).map { i =>
        Row.fromSeq(Timestamp.valueOf(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00") +:
          Seq.tabulate(15)(c => 100.0 + i + c))
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows), PowerSchemas.raw)
    }

    val paths = PowerPipeline.Paths(base)
    println(s"== increment 1: minutes [0, 20) -> $base")
    PowerPipeline.runIncrement(spark, feed(0, 20), paths)
    println(s"== increment 2: minutes [15, 35) (overlapping — dupes must drop)")
    PowerPipeline.runIncrement(spark, feed(15, 35), paths)
    println(s"== rerun of increment 2 (must be a no-op)")
    PowerPipeline.runIncrement(spark, feed(15, 35), paths)
    PowerPipeline.exportCsv(spark, paths)

    val fact = graft.engine.IdempotentSink.read(spark, paths.fact)
    val gold = graft.engine.IdempotentSink.read(spark, paths.gold)
    println(s"fact rows: ${fact.count()} (expect 35, unique minutes)")
    println(s"gold rows: ${gold.count()} (expect 35)")
    gold.orderBy("time_id")
      .select("time_id", "avg_co2_emission", "production_volatility",
        "wind_solar_ratio", "day_of_week", "season")
      .show(8, truncate = false)
    val csv = spark.read.option("header", "true").csv(paths.mlCsv)
    println(s"ml_features.csv rows: ${csv.count()}, columns: ${csv.columns.length}")
    spark.stop()
  }
}
