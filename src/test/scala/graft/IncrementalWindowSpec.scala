package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.IncrementalWindow
import graft.engine.Tables

/** The incremental-equivalence invariant (SURVEY §5.3): computing the
  * trailing window with warm-up rows and trimming equals computing over
  * the full history and filtering — for any watermark split.
  */
class IncrementalWindowSpec extends SparkSpecBase {
  test("lookback+trim == full-recompute-then-filter for several watermarks") {
    val events = Tables.events(spark, sf("sf0.001")).cache()
    val full = {
      val w = Window.orderBy("ts", "event_id").rowsBetween(-4, 0)
      events.select(col("event_id"), col("ts"), col("value"))
        .withColumn("avg_value", round(avg(col("value")).over(w), 6))
        .select("event_id", "ts", "avg_value")
    }
    Seq("2024-01-05 00:00:00", "2024-01-15 12:34:56", "2024-01-29 23:59:59")
      .map(Timestamp.valueOf).foreach { wm =>
        val expected = full.filter(col("ts") > lit(wm))
          .orderBy("ts", "event_id").collect()
        val got = IncrementalWindow.trailingAvgPastWatermark(events, wm).collect()
        assert(got.length == expected.length, s"row count at $wm")
        got.zip(expected).foreach { case (g, e) => assert(g == e, s"row mismatch at $wm") }
      }
    events.unpersist()
  }

  test("watermark past all data yields empty, before all data yields everything") {
    val events = Tables.events(spark, sf("sf0.001"))
    assert(IncrementalWindow
      .trailingAvgPastWatermark(events, Timestamp.valueOf("2030-01-01 00:00:00"))
      .isEmpty)
    assert(IncrementalWindow
      .trailingAvgPastWatermark(events, Timestamp.valueOf("2000-01-01 00:00:00"))
      .count() == events.count())
  }
}
