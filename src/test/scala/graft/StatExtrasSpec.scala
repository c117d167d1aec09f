package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.{Experiment, Linkage, Sketches, StatTests}

/** Round-10 statistical tier: Fellegi–Sunter linkage, Bradley–Terry
  * fitting, BH-FDR control, HLL set algebra — algebraic contracts on
  * hand fixtures plus sanity on the harness testdata.
  */
class StatExtrasSpec extends SparkSpecBase {
  import spark.implicits._

  test("FS linkage: true matches live in the all-agree pattern; weights order by information") {
    val cust = Tables.customer(spark, sf("sf0.01"))
    val rows = Linkage.fellegiSunterPatterns(cust, Linkage.crmSnapshot(cust))
      .collect()
    val byPat = rows.map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r).toMap
    // every true match agrees on the near-unique name (only the X-
    // prefix dirt breaks it), so n_true concentrates where agree_name=1
    val trueIn1 = rows.filter(_.getInt(0) == 1).map(_.getLong(4)).sum
    val trueIn0 = rows.filter(_.getInt(0) == 0).map(_.getLong(4)).sum
    assert(trueIn1 > trueIn0 * 5,
      s"true matches not concentrated under name agreement: $trueIn1 vs $trueIn0")
    // the all-agree pattern carries the maximum score
    val maxScore = rows.map(_.getLong(5)).max
    assert(byPat((1, 1, 1)).getLong(5) == maxScore)
    // name agreement is worth more than segment agreement (u_name ≪
    // u_segment): flipping name off costs more than flipping segment
    for (b <- Seq(0, 1)) {
      (byPat.get((1, 0, b)), byPat.get((0, 1, b))) match {
        case (Some(n1s0), Some(n0s1)) =>
          assert(n1s0.getLong(5) > n0s1.getLong(5))
        case _ => ()
      }
    }
  }

  test("Bradley-Terry: two-player strengths converge to the win-ratio") {
    val m = Seq(("a", "b", 30L), ("b", "a", 10L)).toDF("a", "b", "wins")
    val got = Experiment.bradleyTerry(m, rounds = 12).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // closed form: s_a/s_b -> w_ab/w_ba = 3 (scale set by the MM fixed
    // point); the ppm chain should be within quantization of that
    val ratio = got("a").toDouble / got("b").toDouble
    assert(math.abs(ratio - 3.0) < 0.01, s"ratio $ratio != 3")
  }

  test("Bradley-Terry: strengths are monotone in round-robin win totals") {
    // c > b > a in a full round robin
    val m = Seq(("c", "b", 8L), ("c", "a", 9L), ("b", "a", 7L),
      ("b", "c", 2L), ("a", "c", 1L), ("a", "b", 3L)).toDF("a", "b", "wins")
    val got = Experiment.bradleyTerry(m).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("c") > got("b") && got("b") > got("a"), got.toString)
  }

  test("Bradley-Terry: winless players stay in the tournament") {
    // c never wins but plays both a and b; its n_ij terms must stay in
    // a's and b's denominators (the symmetric fixture makes a and b
    // exactly equal ONLY when c's terms are kept for both)
    val m = Seq(("a", "b", 5L), ("b", "a", 5L),
      ("a", "c", 4L), ("b", "c", 4L)).toDF("a", "b", "wins")
    val got = Experiment.bradleyTerry(m).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set("a", "b", "c"), got.toString)
    assert(got("c") == (0L, 0L), s"winless player not at the boundary: $got")
    assert(got("a") == got("b"), s"symmetric players diverged: $got")
    assert(got("a")._2 > 0L)
  }

  test("BH-FDR: an extreme slice is rejected, uniform slices are not") {
    // 9 groups at the pooled rate, one group wildly off
    val rows = (0 until 10).flatMap { g =>
      val hits = if (g == 0) 90 else 30
      (0 until 100).map(i => (s"g$g", if (i < hits) 1 else 0))
    }
    val df = rows.toDF("grp", "hit")
    val got = StatTests.proportionFdr(df, "grp", col("hit") === 1)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("g0").getInt(6) == 1, "extreme slice not rejected")
    assert(got("g0").getInt(5) == 1, "extreme slice not rank 1")
    (1 until 10).foreach(g =>
      assert(got(s"g$g").getInt(6) == 0, s"uniform slice g$g rejected"))
    // p-values are valid ppm quantities
    got.values.foreach(r =>
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 2000000L))
  }

  test("HLL set ops: identical sets contain each other; disjoint sets add") {
    val li = Tables.lineitem(spark, sf("sf0.001"))
    val same = Sketches.hllSetOps(li, col("l_partkey"), li, col("l_partkey"))
      .head()
    assert(same.getDouble(0) == same.getDouble(1)) // est_a == est_b
    assert(same.getDouble(2) == same.getDouble(0)) // union == A
    assert(math.abs(same.getDouble(4) - 1.0) < 1e-9) // containment == 1
    // disjoint id spaces: union ≈ sum, intersection ≈ 0 (HLL noise)
    val a = li.select(col("l_partkey"))
    val b = li.select((col("l_partkey") + 10000000L).as("l_partkey"))
    val dis = Sketches.hllSetOps(a, col("l_partkey"), b, col("l_partkey"))
      .head()
    val (ea, eb, eu, ei) = (dis.getDouble(0), dis.getDouble(1),
      dis.getDouble(2), dis.getDouble(3))
    assert(math.abs(eu - (ea + eb)) / (ea + eb) < 0.1,
      s"disjoint union $eu far from $ea + $eb")
    assert(math.abs(ei) < 0.1 * (ea + eb), s"phantom intersection $ei")
  }

  test("Mann-Whitney AUC: hand-counted pairs, ties at half weight, perfect separation at 1") {
    // pos scores {3,4,5}, neg {1,2,3}: U = 2 + 0.5 + 3 + 3 = 8.5,
    // AUC = 8.5/9
    val rows = Seq(
      ("a", 3.0, true), ("a", 4.0, true), ("a", 5.0, true),
      ("a", 1.0, false), ("a", 2.0, false), ("a", 3.0, false),
      // group b: perfectly separated
      ("b", 10.0, true), ("b", 11.0, true),
      ("b", 1.0, false), ("b", 2.0, false),
      // group c: one class only -> dropped
      ("c", 1.0, true), ("c", 2.0, true))
      .toDF("g", "score", "hit")
    val got = graft.operators.StatTests.mannWhitneyAuc(
      rows, "g", "score", col("hit")).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("a", "b"))
    val a = got(0)
    assert(a.getLong(1) == 3 && a.getLong(2) == 3)
    assert(math.abs(a.getDouble(3) - 8.5 / 9.0) < 1e-6, a.toString)
    assert(a.getDouble(4) > 0, "positive separation must give z > 0")
    val b = got(1)
    assert(b.getDouble(3) == 1.0, b.toString)
    // AUC is label-flip symmetric: 1 - AUC on the complement
    val flip = graft.operators.StatTests.mannWhitneyAuc(
      rows, "g", "score", !col("hit")).collect()(0)
    assert(math.abs(flip.getDouble(3) - (1.0 - 8.5 / 9.0)) < 1e-6)
  }

  test("Mann-Whitney AUC: z/p agree with the classic large-sample U test on a known case") {
    // 20 pos uniformly above 20 neg, no ties: AUC=1, U=400,
    // z = (U - 200) / sqrt(400*41/12) = 5.410018
    val rows = ((0 until 20).map(i => (100.0 + i, true)) ++
      (0 until 20).map(i => (i.toDouble, false)))
      .map { case (s, h) => ("g", s, h) }.toDF("g", "score", "hit")
    val r = graft.operators.StatTests.mannWhitneyAuc(
      rows, "g", "score", col("hit")).collect()(0)
    assert(r.getDouble(3) == 1.0)
    assert(math.abs(r.getDouble(4) - 5.410018) < 1e-4, r.toString)
    assert(r.getLong(5) == 0L, s"p_ppm for z=5.4 must round to 0: $r")
  }

  test("gains table: distributed rank equals the global-window rank; perfect score captures early") {
    // 100 rows, all 20 hits in the top quintile of the score: bands
    // 0-1 capture everything, lift 5 in band 0
    val rows = (0 until 100).map(i => (i.toLong, 1000.0 - i, i < 20))
      .toDF("id", "score", "hit")
    val got = graft.operators.StatTests.gainsTable(
      rows, "id", "score", col("hit"), buckets = 10).collect()
    assert(got.length == 10)
    assert(got(0).getLong(2) == 10 && got(0).getDouble(3) == 5.0, got(0).toString)
    assert(got(1).getDouble(4) == 1.0, "top two deciles must capture all hits")
    assert(got(9).getLong(2) == 0)
    // equivalence with a naive single-window reference on real data
    // (the distributed prefix sum must reproduce the exact total order)
    val ev = Tables.events(spark, sf("sf0.001"))
      .filter(col("value").isNotNull)
    val dist = graft.operators.StatTests.gainsTable(
      ev, "event_id", "value", col("event_type") === "purchase").collect()
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("value").desc, col("event_id"))
    val n = ev.count()
    val naive = ev
      .withColumn("rn", row_number().over(w))
      // integer floor division: Spark `/` on longs is DOUBLE division
      .withColumn("band", expr(s"((rn - 1) * 10) div ${n}L").cast("int"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"),
        sum((col("event_type") === "purchase").cast("int")).as("pos"))
      .orderBy("band").collect()
    dist.zip(naive).foreach { case (d, nv) =>
      assert(d.getInt(0) == nv.getInt(0) && d.getLong(1) == nv.getLong(1)
        && d.getLong(2) == nv.getLong(2), s"$d != $nv")
    }
  }

  test("isotonic: minimax closed form reproduces hand-run PAV pooling") {
    // per-bin raw rates 1/2, 1/4, 1/2, 1/2, 0 (4 rows each). Hand PAV:
    // pool bins 0,1 -> 3/8; the trailing 0 pulls 3,4 -> 1/4, then
    // 2,3,4 -> 1/3, and 3/8 > 1/3 cascades the merge into one global
    // pool: 7 positives / 20 rows = 0.35 everywhere.
    val rows = Seq(
      (0.5, true), (0.5, true), (0.5, false), (0.5, false),
      (1.5, true), (1.5, false), (1.5, false), (1.5, false),
      (2.5, true), (2.5, true), (2.5, false), (2.5, false),
      (3.5, true), (3.5, true), (3.5, false), (3.5, false),
      (4.5, false), (4.5, false), (4.5, false), (4.5, false))
      .toDF("score", "hit")
    val got = graft.operators.Sampling.isotonicCalibration(
      rows.toDF, col("score"), col("hit"), bins = 5, binWidth = 1.0)
      .collect().map(r => (r.getInt(0), r.getDouble(4)))
    assert(got.map(_._1).toSeq == Seq(0, 1, 2, 3, 4))
    val iso = got.map(_._2)
    // global pool: total pos 7 over 20 rows
    assert(iso.forall(v => math.abs(v - 0.35) < 1e-9),
      s"expected the all-pooled fit 0.35, got ${iso.toSeq}")
  }

  test("isotonic: extreme scores clamp into edge bins, no ANSI CAST_OVERFLOW") {
    // |score/binWidth| >= 2^31 used to throw under ANSI because the
    // clamp ran AFTER a narrowing int cast; the docstring promises
    // clamping. Both edges, plus a sane mid value.
    val rows = Seq((1e18, true), (-1e18, false), (2.5, true), (2.5, false))
      .toDF("score", "hit")
    val got = graft.operators.Sampling.isotonicCalibration(
      rows, col("score"), col("hit"), bins = 5, binWidth = 1.0)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0, 1L, 0L), (2, 2L, 1L), (4, 1L, 1L)),
      s"edge clamp wrong: $got")
  }

  test("isotonic: fit is monotone and is the projection (pool means preserved)") {
    // strictly separable rates with one violation in the middle
    val rows = (0 until 600).map { i =>
      // blocks of 100 per bin: i%10 is uniform WITHIN each block
      // (i%6 would correlate with i%10 mod 2 and skew the rates)
      val bin = i / 100
      val hit = bin match {
        case 0 => i % 10 < 1 // 0.1
        case 1 => i % 10 < 3 // 0.3
        case 2 => i % 10 < 6 // 0.6  <- violates vs bin 3
        case 3 => i % 10 < 4 // 0.4
        case 4 => i % 10 < 7 // 0.7
        case 5 => i % 10 < 9 // 0.9
      }
      (bin.toDouble + 0.5, hit)
    }.toDF("score", "hit")
    val got = graft.operators.Sampling.isotonicCalibration(
      rows, col("score"), col("hit"), bins = 6, binWidth = 1.0)
      .collect()
    val iso = got.map(_.getDouble(4))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b + 1e-12 },
      s"not monotone: ${iso.toSeq}")
    // bins 2,3 pool to 0.5; the rest stay at their raw rates
    val expect = Seq(0.1, 0.3, 0.5, 0.5, 0.7, 0.9)
    iso.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"${iso.toSeq} != $expect") }
    // weighted mass is preserved overall (projection property)
    val n = got.map(_.getLong(1))
    val fitMass = iso.zip(n).map { case (v, w) => v * w }.sum
    val rawMass = got.map(_.getLong(2)).sum.toDouble
    assert(math.abs(fitMass - rawMass) < 1e-6)
  }

  test("Sinkhorn: uniform costs give the independent coupling; cheap diagonal concentrates") {
    import spark.implicits._
    val supply = Seq(("s1", 700000L), ("s2", 300000L)).toDF("src", "a_ppm")
    val demand = Seq(("d1", 400000L), ("d2", 600000L)).toDF("dst", "b_ppm")
    // equal costs: K is constant, so the fixed point is a x b
    val flat = Seq(("s1", "d1", 500000L), ("s1", "d2", 500000L),
      ("s2", "d1", 500000L), ("s2", "d2", 500000L))
      .toDF("src", "dst", "cost_ppm")
    val got = graft.operators.Transport
      .sinkhornPlan(supply, demand, flat)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(math.abs(got(("s1", "d1")) - 0.28) < 1e-3, got.toString)
    assert(math.abs(got(("s2", "d2")) - 0.18) < 1e-3, got.toString)
    // near-zero diagonal cost, expensive off-diagonal: mass stays home
    val sup2 = Seq(("s1", 500000L), ("s2", 500000L)).toDF("src", "a_ppm")
    val dem2 = Seq(("d1", 500000L), ("d2", 500000L)).toDF("dst", "b_ppm")
    val diag = Seq(("s1", "d1", 0L), ("s1", "d2", 1000000L),
      ("s2", "d1", 1000000L), ("s2", "d2", 0L))
      .toDF("src", "dst", "cost_ppm")
    val got2 = graft.operators.Transport
      .sinkhornPlan(sup2, dem2, diag)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got2(("s1", "d1")) > 0.49 && got2(("s1", "d2")) < 0.01, got2.toString)
  }

  test("Sinkhorn: a violated ANSI bound throws on the driver side, never wraps") {
    import spark.implicits._
    // a marginal past ~9.2e6 ppm overflows the a·10^12 rescale in
    // round 1 — the documented contract is a LOUD ArithmeticException
    // (multiplyExact/addExact in the driver loop), not a silent Long
    // wrap producing a corrupt plan (which plain `*` used to do)
    val supply = Seq(("s1", 10000000000L), ("s2", 1L)).toDF("src", "a_ppm")
    val demand = Seq(("d1", 500000L), ("d2", 500000L)).toDF("dst", "b_ppm")
    val cost = Seq(("s1", "d1", 0L), ("s1", "d2", 0L),
      ("s2", "d1", 0L), ("s2", "d2", 0L))
      .toDF("src", "dst", "cost_ppm")
    intercept[ArithmeticException] {
      graft.operators.Transport
        .sinkhornPlan(supply, demand, cost)
        .collect()
    }
  }

  test("Sinkhorn: the q321 plan matches both marginals on real data") {
    val plan = graft.queries.ExtensionQueries
      .queries("q321_sinkhorn_mix")(spark, sf("sf0.001")).collect()
    val byDst = plan.groupBy(_.getString(1)).view
      .mapValues(_.map(_.getDouble(2)).sum)
    byDst.foreach { case (d, m) =>
      assert(math.abs(m - 0.2) < 5e-3, s"col $d sum $m != 0.2") }
    val bySrc = plan.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(2)).sum).toMap
    val total = bySrc.values.sum
    assert(math.abs(total - 1.0) < 1e-2, s"total $total")
  }

  test("Wasserstein-1: point masses measure their distance; identical slices score 0") {
    import spark.implicits._
    // a concentrated at bin 0 (value 5), b at bin 31 (value 315):
    // CDF gap is 1 across 31 bins of width 10 -> W1 = 310
    val rows = (0 until 50).map(i => (s"r$i", "a", 5.0)) ++
      (0 until 70).map(i => (s"s$i", "b", 315.0))
    val far = graft.operators.StatTests.wasserstein1(
      rows.toDF("id", "grp", "value"), "value", "grp", "a", "b",
      lo = 0.0, hi = 320.0, bins = 32).collect()(0)
    assert(far.getLong(0) == 50 && far.getLong(1) == 70)
    assert(far.getDouble(2) == 310.0, far.toString)
    // identical distributions -> 0 (regardless of slice sizes)
    val same = (0 until 40).map(i => (s"r$i", "a", (i % 8) * 37.0)) ++
      (0 until 80).map(i => (s"s$i", "b", (i % 8) * 37.0))
    val zero = graft.operators.StatTests.wasserstein1(
      same.toDF("id", "grp", "value"), "value", "grp", "a", "b",
      lo = 0.0, hi = 320.0, bins = 32).collect()(0)
    assert(zero.getDouble(2) == 0.0, zero.toString)
    // a one-bin nudge of all mass moves W1 by exactly the bin width
    val nudge = (0 until 50).map(i => (s"r$i", "a", 5.0)) ++
      (0 until 50).map(i => (s"s$i", "b", 15.0))
    val w = graft.operators.StatTests.wasserstein1(
      nudge.toDF("id", "grp", "value"), "value", "grp", "a", "b",
      lo = 0.0, hi = 320.0, bins = 32).collect()(0)
    assert(w.getDouble(2) == 10.0, w.toString)
  }

  test("calibration error report: hand-computed ECE/Murphy terms on the PAV fixture") {
    import spark.implicits._
    // the all-pooled fixture: iso = pbar = 0.35 everywhere, raw rates
    // (.5,.25,.5,.5,0) with n=4 each -> ECE = 4*0.9/20 = 0.18,
    // rel = res = 4*0.2/20 = 0.04, unc = 0.35*0.65 = 0.2275
    val rows = Seq(
      (0.5, true), (0.5, true), (0.5, false), (0.5, false),
      (1.5, true), (1.5, false), (1.5, false), (1.5, false),
      (2.5, true), (2.5, true), (2.5, false), (2.5, false),
      (3.5, true), (3.5, true), (3.5, false), (3.5, false),
      (4.5, false), (4.5, false), (4.5, false), (4.5, false))
      .toDF("score", "hit")
    val r = graft.operators.Sampling.calibrationErrorReport(
      graft.operators.Sampling.isotonicCalibration(
        rows, col("score"), col("hit"), bins = 5, binWidth = 1.0))
      .collect()(0)
    assert(r.getLong(0) == 20 && r.getInt(1) == 5)
    assert(math.abs(r.getDouble(2) - 0.18) < 1e-9, s"ece $r")
    assert(math.abs(r.getDouble(3) - 0.04) < 1e-9, s"rel $r")
    assert(math.abs(r.getDouble(4) - 0.04) < 1e-9, s"res $r")
    assert(math.abs(r.getDouble(5) - 0.2275) < 1e-9, s"unc $r")
  }
}
