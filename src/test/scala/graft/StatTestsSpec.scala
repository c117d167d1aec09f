package graft

import graft.operators.StatTests

/** Hand-computed goldens for the two-sample drift tests — independent
  * of the DuckDB oracle so a cross-engine-agreed-but-wrong formula
  * can't hide.
  */
class StatTestsSpec extends SparkSpecBase {

  test("psi: identical slices score 0, a full bin swap scores 2*(4/14)*ln5") {
    import spark.implicits._
    val same = (Seq.fill(3)(("a", 10.0)) ++ Seq.fill(3)(("b", 10.0)))
      .toDF("g", "v")
    val z = StatTests.psi(same, "v", "g", "a", "b", lo = 0.0, hi = 100.0)
      .as[(Long, Long, Double)].collect().toSeq
    assert(z == Seq((3L, 3L, 0.0)), s"got $z")
    // a all in bin 0, b all in bin 9: two symmetric smoothed terms,
    // each floor(0.285714...*ln5*1e9 + .5) = 459839404 nanos
    val shift = (Seq.fill(4)(("a", 1.0)) ++ Seq.fill(4)(("b", 99.0)))
      .toDF("g", "v")
    val s = StatTests.psi(shift, "v", "g", "a", "b", lo = 0.0, hi = 100.0)
      .as[(Long, Long, Double)].collect().toSeq
    assert(s == Seq((4L, 4L, 0.919679)), s"got $s")
  }

  test("categorical psi: identical mixes score 0, disjoint categories score 2*(2/3)*ln5") {
    import spark.implicits._
    val same = (Seq.fill(2)(("a", "en")) ++ Seq.fill(2)(("b", "en")) ++
      Seq(("a", "fr"), ("b", "fr"))).toDF("g", "lang")
    val z = StatTests.psiCategorical(same, "lang", "g", "a", "b")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(z == Seq((3L, 3L, 2L, 0.0)), s"got $z")
    // a all "en", b all "fr": two symmetric smoothed terms of
    // (5/6 - 1/6)*ln5 nanos each
    val disj = (Seq.fill(4)(("a", "en")) ++ Seq.fill(4)(("b", "fr")))
      .toDF("g", "lang")
    val d = StatTests.psiCategorical(disj, "lang", "g", "a", "b")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(d == Seq((4L, 4L, 2L, 2.145917)), s"got $d")
  }

  test("ks: max CDF gap with a shared value, exact 4/6") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 3.0),
      ("b", 4.0)).toDF("g", "v")
    val got = StatTests.ksTest(df, "v", "g", "a", "b")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((3L, 2L, 0.666667)), s"got $got")
  }

  test("ari: identical partitions score 1, the independent 2x2 uniform scores -0.5") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val same = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y"))
      .toDF("a", "b")
    val one = StatTests.adjustedRandIndex(same, "a", "b")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(one == Seq((4L, 2L, 2L, 2L, 1.0)), s"got $one")
    // uniform 2x2: S=0, A=B=2, C(4,2)=6 -> 2*(0-4)/(6*4-8) = -0.5
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val neg = StatTests.adjustedRandIndex(ind, "a", "b")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(neg == Seq((4L, 0L, 2L, 2L, -0.5)), s"got $neg")
    // one side trivial (single class both columns): denominator 0 -> NULL
    val triv = Seq(("x", "p"), ("x", "p")).toDF("a", "b")
    val n = StatTests.adjustedRandIndex(triv, "a", "b")
      .select(col("ari")).collect().head
    assert(n.isNullAt(0), s"expected NULL ari, got $n")
  }

  test("mutual information: independent grid scores 0, identical labels score nmi 1") {
    import spark.implicits._
    // every cell o = rt*ct/N exactly -> each term ln(1) = 0
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val z = StatTests.mutualInformation(ind, "a", "b")
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(z == Seq((4L, 2L, 2L, 0.0, 0.693147, 0.693147, 0.0)), s"got $z")
    // a == b: MI = H(a) = H(b) = ln 2 -> nmi exactly 1 (same nanos)
    val same = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y"))
      .toDF("a", "b")
    val m = StatTests.mutualInformation(same, "a", "b")
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(m == Seq((4L, 2L, 2L, 0.693147, 0.693147, 0.693147, 1.0)),
      s"got $m")
  }

  test("spearman: monotone 1, reversed -1, ties keep 1, constant column NULL") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val up = Seq((1, 10), (2, 40), (3, 60)).toDF("x", "y")
    assert(StatTests.spearman(up, "x", "y")
      .as[(Long, Double)].collect().toSeq == Seq((3L, 1.0)))
    val down = Seq((1, 60), (2, 40), (3, 10)).toDF("x", "y")
    assert(StatTests.spearman(down, "x", "y")
      .as[(Long, Double)].collect().toSeq == Seq((3L, -1.0)))
    // tied pairs rank identically on both axes -> still perfect
    val tied = Seq((1, 5), (1, 5), (2, 9)).toDF("x", "y")
    assert(StatTests.spearman(tied, "x", "y")
      .as[(Long, Double)].collect().toSeq == Seq((3L, 1.0)))
    val const = Seq((1, 7), (2, 7), (3, 7)).toDF("x", "y")
    val n = StatTests.spearman(const, "x", "y").select(col("rho"))
      .collect().head
    assert(n.isNullAt(0), s"expected NULL rho, got $n")
  }

  test("chi2: 2x2 table matches the closed form N(ad-bc)^2/(r1 r2 c1 c2), absent cell counts") {
    import spark.implicits._
    val df = Seq(("x", "p"), ("x", "p"), ("y", "p"), ("y", "q"))
      .toDF("r", "c")
    val got = StatTests.chiSquare(df, "r", "c")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // 4*(2*1-0*1)^2/(2*2*3*1) = 4/3; the (x,q) cell is absent from
    // the observed counts but still contributes 0.5
    assert(got == Seq((4L, 2L, 2L, 1L, 1.333333)), s"got $got")
  }

  test("cusum: level shift peaks at the regime boundary, constant series is all-zero") {
    import spark.implicits._
    import graft.operators.Sessions
    // daily counts 1,1,5,5 → n=4, total=12; devn = 4·cum − t·12 =
    // −8, −16, −8, 0 → peak (|devn| max) at day 2, cusum = devn/4
    val daily = Seq(("x", 0L, 1L), ("x", 1L, 1L), ("x", 2L, 5L),
      ("x", 3L, 5L)).toDF("group", "d", "c")
    val got = Sessions.cusumDaily(daily)
      .as[(String, Long, Long, Double, Int)].collect().toSeq
    assert(got == Seq(("x", 0L, 1L, -2.0, 0), ("x", 1L, 1L, -4.0, 1),
      ("x", 2L, 5L, -2.0, 0), ("x", 3L, 5L, 0.0, 0)), s"got $got")
    // constant volume: every deviation 0 → every day ties the peak
    val flat = Seq(("y", 0L, 3L), ("y", 1L, 3L), ("y", 2L, 3L))
      .toDF("group", "d", "c")
    val f = Sessions.cusumDaily(flat)
      .as[(String, Long, Long, Double, Int)].collect().toSeq
    assert(f.forall(r => r._4 == 0.0 && r._5 == 1), s"got $f")
  }

  test("conformal: ~90% coverage on exchangeable data; starved calibration reports NULL, not a clamp") {
    import spark.implicits._
    import graft.operators.Sampling
    val big = (1 to 400).map(i => ("g", i.toLong, i.toDouble))
      .toDF("grp", "id", "v")
    val r = Sampling.conformalOutlierReport(big, "id", "grp", "v",
      alphaPct = 10).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) + row.getLong(2) == 400L) // cal + eval
    assert(!row.isNullAt(4), "qhat should exist")
    assert(row.getDouble(6) >= 0.85 && row.getDouble(6) <= 1.0,
      s"coverage ${row.getDouble(6)}")
    // alpha 1% with a small calibration set: ⌈0.99(n+1)⌉ > n for all
    // n ≤ 98 → threshold is +∞, reported as NULL qhat/covered/coverage
    val starved = Sampling.conformalOutlierReport(big, "id", "grp", "v",
      alphaPct = 1, calPpm = 100000L).collect().head
    assert(starved.isNullAt(4) && starved.isNullAt(5)
      && starved.isNullAt(6), s"got $starved")
  }

  test("mann-kendall: monotone series hand case; all-tied variance is NULL z") {
    import spark.implicits._
    import graft.operators.Sessions
    // counts 1,2,3,4 on days 0..3: S = 6 (all pairs rising), no ties
    // → var18 = 4·3·13 = 156; every pairwise slope is exactly 1
    val up = Seq(("x", 0L, 1L), ("x", 1L, 2L), ("x", 2L, 3L),
      ("x", 3L, 4L)).toDF("group", "d", "c")
    val got = Sessions.mannKendall(up)
      .as[(String, Long, Long, Long, Long, Double, Double)]
      .collect().toSeq
    val zExp = math.round(5.0 / math.sqrt(156.0 / 18.0) * 1e6) / 1e6
    assert(got == Seq(("x", 4L, 6L, 6L, 156L, zExp, 1.0)), s"got $got")
    // constant series: S = 0 and the tie term cancels var18 exactly
    val flat = Seq(("y", 0L, 2L), ("y", 1L, 2L), ("y", 2L, 2L))
      .toDF("group", "d", "c")
    val f = Sessions.mannKendall(flat).collect().head
    assert(f.getLong(4) == 0L && f.isNullAt(5) && f.getDouble(6) == 0.0,
      s"got $f")
  }

  test("dispersion and acf: hand cases on tiny daily series") {
    import spark.implicits._
    import graft.operators.Sessions
    // constant: D = 0; (1,5): D = (2·26 − 36)/(1·6) = 16/6
    val d = Seq(("a", 0L, 1L), ("a", 1L, 1L), ("a", 2L, 1L),
      ("b", 0L, 1L), ("b", 1L, 5L)).toDF("group", "d", "c")
    val disp = Sessions.dispersionIndex(d)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(disp == Seq(("a", 3L, 3L, 1.0, 0.0),
      ("b", 2L, 6L, 3.0, 2.666667)), s"got $disp")
    // counts 1..4: devn = −6,−2,2,6; den = 80;
    // lag1 = 20/80, lag2 = −24/80, lag3 = −36/80
    val up = Seq(("x", 0L, 1L), ("x", 1L, 2L), ("x", 2L, 3L),
      ("x", 3L, 4L)).toDF("group", "d", "c")
    val acf = Sessions.dailyAcf(up, maxLag = 3)
      .as[(String, Int, Long, Double)].collect().toSeq
    assert(acf == Seq(("x", 1, 3L, 0.25), ("x", 2, 2L, -0.3),
      ("x", 3, 1L, -0.45)), s"got $acf")
  }

  test("woe/iv: two-bin hand case, one-class bin yields NULL woe") {
    import spark.implicits._
    import graft.operators.Classifier
    // bin 0 (v<10): 3 good 1 bad; bin 1: 1 good 3 bad → G=B=4
    val df = (Seq.fill(3)((1.0, true)) ++ Seq((2.0, false)) ++
      Seq((11.0, true)) ++ Seq.fill(3)((12.0, false)))
      .toDF("v", "label")
    val got = Classifier.woeIv(df, "v", "label", binWidth = 10.0,
      maxBin = 1).as[(Int, Long, Long, Long, Double, Double,
        Double, Double)].collect().toSeq
    val ln3 = math.round(math.log(3.0) * 1e6) / 1e6
    val iv0 = math.round(0.5 * math.log(3.0) * 1e6) / 1e6
    assert(got == Seq((0, 4L, 3L, 1L, 0.75, 0.25, ln3, iv0),
      (1, 4L, 1L, 3L, 0.25, 0.75, -ln3, iv0)), s"got $got")
    // a bin with no bad rows: woe/iv NULL, shares still emit
    val oneSided = (Seq.fill(2)((1.0, true)) ++
      Seq((11.0, true), (12.0, false))).toDF("v", "label")
    val os = Classifier.woeIv(oneSided, "v", "label", 10.0, 1).collect()
    assert(os.find(_.getInt(0) == 0).get.isNullAt(6))
  }
}
