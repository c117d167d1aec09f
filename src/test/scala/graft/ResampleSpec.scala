package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Resample

class ResampleSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(hour: Int, min: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$min%02d:00")

  // key A: obs at hours 0 (value 10) and 3 (value 40); hours 1, 2 are
  // gaps. key B: two rows in hour 5 (mean 2.5), nothing else.
  private lazy val fixture = Seq(
    ("A", ts(0), 10.0),
    ("A", ts(3), 40.0),
    ("B", ts(5, 10), 2.0),
    ("B", ts(5, 40), 3.0)
  ).toDF("k", "t", "v")

  test("resample: grid, ffill, age, and linear interpolation by hand") {
    val out = Resample.resample(fixture, "k", "t", "v", 3600L).collect()
    val a = out.filter(_.getString(0) == "A").map(r =>
      (r.getLong(1), r.getLong(2), Option(r.get(3)), r.getDouble(4),
        r.getLong(5), r.getDouble(6)))
    val h0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    assert(a.toSeq == Seq(
      (h0, 1L, Some(10.0), 10.0, 0L, 10.0),
      (h0 + 3600, 0L, None, 10.0, 3600L, 20.0),
      (h0 + 7200, 0L, None, 10.0, 7200L, 30.0),
      (h0 + 10800, 1L, Some(40.0), 40.0, 0L, 40.0)))
    // B: single bucket, mean of the two rows, no gap rows.
    val b = out.filter(_.getString(0) == "B")
    assert(b.length == 1)
    assert(b.head.getDouble(3) == 2.5 && b.head.getLong(2) == 2L)
  }

  test("resample: interpolation targets the next bucket's MEAN") {
    val df = Seq(("A", ts(0), 1.0), ("A", ts(2), 7.0), ("A", ts(2, 30), 9.0))
      .toDF("k", "t", "v")
    val out = Resample.resample(df, "k", "t", "v", 3600L)
      .select("bucket_sec", "interp_value", "obs_value").collect()
    assert(out.length == 3)
    // hour 1 interpolates toward hour 2's MEAN (8.0): 1 + (8-1)/2 = 4.5
    assert(out(1).getDouble(1) == 4.5 && out(1).isNullAt(2))
    assert(out(2).getDouble(1) == 8.0)
  }

  test("resample: chunked grid survives a span far beyond one sequence chunk") {
    // 3000 steps at 1 s cadence: crosses the 1024-element chunk bound
    // twice; grid must still be exactly span+1 rows with no dupes.
    val df = Seq(("A", ts(0), 0.0), ("A", new Timestamp(ts(0).getTime + 3000 * 1000L), 30.0))
      .toDF("k", "t", "v")
    val out = Resample.resample(df, "k", "t", "v", 1L)
    assert(out.count() == 3001)
    assert(out.select("bucket_sec").distinct().count() == 3001)
    val mid = out.filter(col("bucket_sec") === ts(0).getTime / 1000 + 1500)
      .select("interp_value").head().getDouble(0)
    assert(mid == 15.0)
  }

  test("gapReport matches the materialized grid's bookkeeping") {
    val rep = Resample.gapReport(fixture, "k", "t", 3600L).collect()
    val a = rep.filter(_.getString(0) == "A").head
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4)) ==
      ((4L, 2L, 2L, 7200L)))
    val b = rep.filter(_.getString(0) == "B").head
    assert((b.getLong(1), b.getLong(2), b.getLong(3), b.getLong(4)) ==
      ((1L, 1L, 0L, 0L)))
    // cross-check n_expected/n_present against the full resample
    val grid = Resample.resample(fixture, "k", "t", "v", 3600L)
      .groupBy("k").agg(count(lit(1)).as("exp"),
        sum(when(col("obs_value").isNotNull, 1L).otherwise(0L)).as("pres"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(grid("A") == ((4L, 2L)) && grid("B") == ((1L, 1L)))
  }

  test("ewma: hand recurrence, floor (not trunc) on negatives, duplicate steps stay ordered") {
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val fix = Seq(("a", ts(1), 10.0), ("a", ts(2), 20.0), ("a", ts(3), 40.0))
      .toDF("k", "t", "v")
    val got = Resample.ewma(fix, "k", "t", "v", alphaPpm = 500000L)
      .select("k", "step", "v_micro", "s_micro", "ewma")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    // s: 10, (20+10)/2 = 15, (40+15)/2 = 27.5
    assert(got == Seq(("a", 1L, 10000000L, 10000000L, 10.0),
      ("a", 2L, 20000000L, 15000000L, 15.0),
      ("a", 3L, 40000000L, 27500000L, 27.5)), s"got $got")
    // floor semantics: 0.7·(−1 micro) must floor to −1, not trunc to 0
    val neg = Seq(("n", ts(1), -0.000001), ("n", ts(2), 0.0)).toDF("k", "t", "v")
    val ns = Resample.ewma(neg, "k", "t", "v", alphaPpm = 300000L)
      .select("s_micro").as[Long].collect().toSeq
    assert(ns == Seq(-1L, -1L), s"got $ns")
    // fully duplicate observations chain deterministically via step
    val dup = Seq(("d", ts(1), 8.0), ("d", ts(1), 8.0), ("d", ts(1), 4.0))
      .toDF("k", "t", "v")
    val ds = Resample.ewma(dup, "k", "t", "v", alphaPpm = 500000L)
      .select("step", "v_micro", "s_micro")
      .as[(Long, Long, Long)].collect().toSeq
    // (ts, v) sort puts 4 first: s = 4, (8+4)/2 = 6, (8+6)/2 = 7
    assert(ds == Seq((1L, 4000000L, 4000000L), (2L, 8000000L, 6000000L),
      (3L, 8000000L, 7000000L)), s"got $ds")
  }

  test("seasonal decompose: constant series is all-trend, edges NULL, one spike flags one anomaly") {
    // one event per hour for 20 hours → cnt 1 everywhere
    val flat = (0 until 20).map(h => ("e", ts(h))).toDF("k", "t")
    val out = Resample.seasonalDecompose(flat, "t", stepSeconds = 3600L,
      period = 4, halfWindow = 2).collect()
    assert(out.length == 20)
    // edges (first/last 2 rows) carry NULL trend/residual
    val edges = out.take(2) ++ out.takeRight(2)
    assert(edges.forall(r => r.isNullAt(3) && r.isNullAt(5)))
    // interior: trend 1, seasonal 0, residual 0, no anomaly
    val mid = out.slice(2, 18)
    assert(mid.forall(r => r.getDouble(3) == 1.0 && r.getDouble(4) == 0.0
      && r.getDouble(5) == 0.0 && r.getInt(6) == 0), s"got ${mid.toSeq}")

    // 9 extra events in hour 10 → that bucket (and only it) flags
    val spiked = flat.unionByName(
      (0 until 9).map(i => ("e", ts(10, i + 1))).toDF("k", "t"))
    val sOut = Resample.seasonalDecompose(spiked, "t", stepSeconds = 3600L,
      period = 4, halfWindow = 2).collect()
    val flagged = sOut.filter(r => !r.isNullAt(6) && r.getInt(6) == 1)
    val h10 = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
    assert(flagged.map(_.getLong(0)).toSeq == Seq(h10),
      s"flagged ${flagged.map(_.getLong(0)).toSeq}")
  }

  test("holt: hand recurrence with a negative trend, forecast = level + trend") {
    val df = Seq(("h", ts(1), 10.0), ("h", ts(2), 0.0), ("h", ts(3), 0.0))
      .toDF("k", "t", "v")
    val got = Resample.holt(df, "k", "t", "v",
      alphaPpm = 300000L, betaPpm = 300000L)
      .select("step", "l_micro", "b_micro", "forecast")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // l1=10e6 b1=0; l2=⌊.7·10e6⌋=7e6, b2=⌊.3·(7e6−10e6)⌋=−900000;
    // l3=⌊.7·(7e6−9e5)⌋=4270000, b3=⌊.3·(4.27e6−7e6)+.7·(−9e5)⌋=−1449000
    assert(got == Seq(
      (1L, 10000000L, 0L, 10.0),
      (2L, 7000000L, -900000L, 6.1),
      (3L, 4270000L, -1449000L, 2.821)), s"got $got")
  }

  test("resample plan: one window sort, no join, no cartesian") {
    val plan = Resample.resample(fixture, "k", "t", "v", 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"resample should not join grid to observations:\n$plan")
  }
}
