package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout — multi-dimensional data clustering
  * for file skipping: interleaving the bits of two key columns gives a
  * 1-D sort key whose ranges are small rectangles in (x, y) space, so
  * range-partitioning + sorting by it makes EVERY file's min/max
  * narrow on BOTH columns at once. A filter on either column can then
  * skip most files via parquet footer stats — the property a single-
  * column sort only provides for its leading column. (Same layout idea
  * as Delta/Iceberg Z-ordering, expressed as plain bit arithmetic.)
  *
  * The z-value is a pure codegen projection (shifts/masks — no UDF, no
  * raw multiply that could trip ANSI overflow); the layout write is one
  * `repartitionByRange(z)` + `sortWithinPartitions(z)` — a single range
  * shuffle, the same cost as any global sort, paid once at write time.
  */
object ZOrder {
  /** Bit-interleaved Morton code of the low `bits` bits of x and y:
    * x's bit i lands at position 2i, y's at 2i+1. Keys wider than
    * `bits` should be range-ranked first (see rank note on zOrdered);
    * 16 bits/dimension addresses 4 G cells — enough that per-file
    * ranges, not key width, bound skipping precision.
    */
  def interleave(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The layout operator: z-value per row, then range-partition into
    * `numFiles` output partitions sorted by z — writing this frame
    * yields files whose (x, y) bounding boxes tile the space.
    *
    * Real keys are rarely dense in [0, 2^bits); production z-ordering
    * first maps each column to its range-partition RANK (Delta does the
    * same) so the curve is resolution-efficient. The testdata keys are
    * dense small ints, so the identity mapping is already tight.
    */
  def zOrdered(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int, bits: Int = 16): DataFrame =
    df.withColumn("z", interleave(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions("z")

  /** The SKIPPING-side evidence for the layout: tile the z-curve into
    * fixed-width z-ranges (`file` = z >> cellBits — each file is an
    * axis-aligned rectangle of 2^cellBits curve cells) and report, per
    * file, the row count and BOTH columns' min/max — exactly the
    * parquet footer stats a reader consults — plus whether a range
    * predicate on x alone, and on y alone, would have to read the
    * file (stats-overlap test, the pruning rule readers apply).
    *
    * On a z-ordered table EVERY file's box is narrow on both axes, so
    * both `read_x` and `read_y` are false for most files; a 1-D sort
    * gives that only for its leading column. One map-side projection +
    * one hash aggregate over row data here (the demo form); production
    * readers get the identical table for free from footer metadata —
    * one row per FILE, so the report stays tiny at 100 TB.
    */
  def pruningStats(df: DataFrame, xCol: String, yCol: String,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long,
      bits: Int = 16, cellBits: Int = 14): DataFrame = {
    val x = col(xCol)
    val y = col(yCol)
    df.select(shiftright(interleave(x, y, bits), cellBits).as("file"),
        x.as("_x"), y.as("_y"))
      .groupBy("file")
      .agg(count(lit(1)).as("n_rows"),
        min("_x").as("x_min"), max("_x").as("x_max"),
        min("_y").as("y_min"), max("_y").as("y_max"))
      .withColumn("read_x",
        col("x_min") <= lit(xHi) && col("x_max") >= lit(xLo))
      .withColumn("read_y",
        col("y_min") <= lit(yHi) && col("y_max") >= lit(yLo))
  }
}
