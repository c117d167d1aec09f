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
}
