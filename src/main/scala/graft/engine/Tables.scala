package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the harness testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file per scale-factor directory. At
  * 100 TB these would be partitioned parquet/Delta directories; the
  * reader below is path-shaped so swapping in a partitioned layout is a
  * zero-code change for every operator built on top of it. Filters and
  * projections applied by callers reach the parquet scan via Catalyst
  * pushdown (verified in `PlanSpec`).
  */
object Tables {
  /** The generated parquet has carried its timestamps as nanos
    * (pre-2026-08-13 regeneration) and as µs with isAdjustedToUTC=false
    * — which Spark 4 surfaces as TIMESTAMP_NTZ (`inferTimestampNTZ`).
    * Every operator and oracle here treats wall-clock == UTC instant
    * (session tz is UTC), so NTZ columns are cast to the session-zoned
    * TimestampType at the source: value-preserving under UTC, and it
    * keeps `unix_micros`/watermarks/windows working identically across
    * regenerations of the testdata.
    */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(s"$dir/$name.parquet"))

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * µs-precision TimestampType rejects outright. Read it as raw nanos
    * (`nanosAsLong` parquet option) and convert with integer division —
    * NOT float division: epoch-nanos ≈ 1.7e18 exceeds a double's 53-bit
    * mantissa, so `/ 1000` via double would corrupt low-order digits.
    * The feed's actual precision is µs, so the truncation is lossless
    * (DuckDB's µs timestamps agree).
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.option("nanosAsLong", "true").parquet(s"$dir/events.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = eventsRaw(spark, dir)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case _ => normalizeNtz(raw)
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
