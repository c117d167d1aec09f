package graft

import graft.operators.Profile

/** Hand-computed golden for the column profiler — counts, null
  * accounting, distincts, lexicographic min/max, and the deterministic
  * modal-value tie-break (highest count, then largest value).
  */
class ProfileSpec extends SparkSpecBase {

  test("column profile: counts, nulls, distincts, min/max, modal tie-breaks, all-null column") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("b"), Option.empty[String]),
      (2L, Option("a"), Option.empty[String]),
      (3L, Option("b"), Option.empty[String]),
      (4L, Option.empty[String], Option.empty[String]),
      (5L, Option("a"), Option.empty[String]))
      .toDF("id", "s", "all_null")
    val got = Profile.columnProfile(df, Seq("id", "s", "all_null"))
      .as[(String, Long, Long, Long, Option[String], Option[String],
        Option[String], Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      // a fully-NULL column keeps its row/null counts and has no
      // min/max/top candidates
      ("all_null", 5L, 5L, 0L, None, None, None, None),
      // id: five distinct singletons — modal tie-break falls to the
      // lexicographically largest value; min/max are lexicographic
      // over the string rendering
      ("id", 5L, 0L, 5L, Some("1"), Some("5"), Some("5"), Some(1L)),
      // s: a and b tie at count 2 — value DESC picks b; one NULL
      // counted, two distinct non-null values
      ("s", 5L, 1L, 2L, Some("a"), Some("b"), Some("b"), Some(2L))))
  }

  test("column profile is partition-layout invariant") {
    val docs = graft.engine.Tables.documents(spark, sf("sf0.001"))
    val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
    val base = Profile.columnProfile(docs, cols).collect().toSeq
    for (parts <- Seq(1, 7)) {
      assert(Profile.columnProfile(docs.repartition(parts), cols)
        .collect().toSeq == base, s"profile varies at $parts partitions")
    }
  }

  test("column profile: lexicographic (not numeric) min/max on integer renderings") {
    import spark.implicits._
    val df = Seq(9L, 10L, 100L).toDF("v")
    val row = Profile.columnProfile(df, Seq("v")).head()
    // "10" < "100" < "9" in binary string order
    assert(row.getString(4) == "10" && row.getString(5) == "9")
    assert(row.getLong(3) == 3L)
  }

  test("k-anonymity: exact class-size histogram with below-k flag") {
    import spark.implicits._
    // QID classes: (a,1)x1 — singleton; (a,2)x3; (b,1)x3; (b,2)x5
    val df = (Seq(("a", 1)) ++ Seq.fill(3)(("a", 2)) ++
      Seq.fill(3)(("b", 1)) ++ Seq.fill(5)(("b", 2))).toDF("q1", "q2")
    val got = Profile.kAnonymity(df, Seq("q1", "q2"), kMin = 5)
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 1L, 1),   // one singleton class, below k
      (3L, 2L, 6L, 1),   // two classes of 3, below k
      (5L, 1L, 5L, 0)), s"got $got")
    // row mass conserves
    assert(got.map(_._3).sum == 12L)
  }

  test("cross-source duplication: within-pair halves, cross-pair products, uniques drop") {
    import spark.implicits._
    // segLen 3: every doc is exactly one segment; "a b c" appears
    // twice in s1 and once in s2, "x y z" is unique
    val docs = Seq((1L, "a b c", "s1"), (2L, "a b c", "s1"),
      (3L, "a b c", "s2"), (4L, "x y z", "s3"))
      .toDF("doc_id", "text", "source")
    val got = Profile.crossSourceDuplication(docs, "doc_id", "text",
      "source", segLen = 3)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("s1", "s1", 1L, 1L), ("s1", "s2", 1L, 2L)),
      s"got $got")
  }

  test("embedding audit: norms, zero vector, NaN row isolated per label") {
    import spark.implicits._
    val fix = Seq(
      (0, Seq(3f, 4f)), (0, Seq(0f, 0f)),
      (1, Seq(1f, 0f)),
      (2, Seq(Float.NaN, 1f))).toDF("label", "embedding")
    val got = Profile.embeddingAudit(fix)
      .as[(Int, Long, Int, Int, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0, 2L, 2, 2, 1L, 0L, 2.5),  // (5.0 + 0.0) / 2
      (1, 1L, 2, 2, 0L, 0L, 1.0),
      (2, 1L, 2, 2, 0L, 1L, 0.0)), s"got $got")
  }

  test("key skew report: hand-computed quantiles, ratio, salting factor") {
    import spark.implicits._
    val rows = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .toDF("k")
    val got = Profile.keySkewReport(rows, "k")
      .as[(Long, Long, Long, Long, Long, Double, Long)].collect().toSeq
    // freqs {6,2,1,1}: p50 at ceil(2)=2nd of sorted -> 1,
    // p99 at ceil(3.96)=4th -> 6; skew 6*4/10; salt ceil(24/10)
    assert(got == Seq((10L, 4L, 6L, 1L, 6L, 2.4, 3L)), s"got $got")
  }

  test("trimmed mean: one row cut each side at 5% of 20, tiny groups cut nothing") {
    import spark.implicits._
    val fix = ((1 to 20).map(v => ("big", v, v.toLong)) ++
      Seq(("tiny", 1, 100L), ("tiny", 2, 200L), ("tiny", 3, 900L)))
      .toDF("src", "id", "v")
    val got = Profile.trimmedMean(fix, "src", "v", "id", trimPct = 5)
      .as[(String, Long, Long, Double)].collect().toSeq
    // big: drop {1} and {20} -> mean of 2..19 = 189/18 = 10.5;
    // tiny: cut = 0 -> plain mean 400
    assert(got == Seq(("big", 20L, 18L, 10.5), ("tiny", 3L, 3L, 400.0)),
      s"got $got")
  }

  test("gini: equal mass 0, one-holds-all (n-1)/n, hand case exact") {
    import spark.implicits._
    val fix = (Seq.fill(4)(("even", 5)) ++
      Seq(("top", 0), ("top", 0), ("top", 0), ("top", 10)) ++
      Seq(("mix", 1), ("mix", 2), ("mix", 3))).toDF("src", "v")
    val got = Profile.giniConcentration(fix, "src", "v")
      .as[(String, Long, Long, Double)].collect().toSeq
    // mix: (2*(1+4+9) - 4*6)/(3*6) = 4/18
    assert(got == Seq(("even", 4L, 20L, 0.0), ("mix", 3L, 6L, 0.222222),
      ("top", 4L, 10L, 0.75)), s"got $got")
  }

  test("benford: exact digit extraction, sub-1 rows dropped, 9-row zero-filled spine") {
    import spark.implicits._
    // digits: 30→3, 17.5→1, 9.99→9, 1000.49→1, 0.5→dropped, 2→2
    val df = Seq(30.0, 17.5, 9.99, 1000.49, 0.5, 2.0).toDF("v")
    val got = Profile.benford(df, "v").collect()
    assert(got.length == 9)
    val byDigit = got.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDigit == Map(1 -> 2L, 2 -> 1L, 3 -> 1L, 4 -> 0L, 5 -> 0L,
      6 -> 0L, 7 -> 0L, 8 -> 0L, 9 -> 1L), s"got $byDigit")
    val d1 = got.find(_.getInt(0) == 1).get
    assert(d1.getDouble(2) == 0.4) // share 2/5
    assert(math.abs(d1.getDouble(3) - math.log10(2.0)) < 1e-6)
    // zero-observed digit still carries its expectation and a
    // nonzero chi2 contribution
    val d4 = got.find(_.getInt(0) == 4).get
    assert(d4.getDouble(4) > 0.0)
  }

  test("selection parity: reference di=1, strict four-fifths boundary, zero-selection reference guard") {
    import spark.implicits._
    val df = (Seq.fill(10)(("a", 1)) ++
      Seq.fill(8)(("b", 1)) ++ Seq.fill(2)(("b", 0)) ++
      Seq.fill(7)(("c", 1)) ++ Seq.fill(3)(("c", 0))).toDF("g", "f")
    val got = Profile.selectionParity(df, "g", "f")
      .as[(String, Long, Long, Double, Double, Int)].collect().toSeq
    // rate 0.8 is NOT disparate (strict <); 0.7 is
    assert(got == Seq(("a", 10L, 10L, 1.0, 1.0, 0),
      ("b", 10L, 8L, 0.8, 0.8, 0), ("c", 10L, 7L, 0.7, 0.7, 1)),
      s"got $got")
    // nothing selected anywhere → di/flag NULL, never a NaN
    val none = Profile.selectionParity(
      Seq(("a", 0), ("b", 0)).toDF("g", "f"), "g", "f").collect()
    assert(none.forall(r => r.isNullAt(4) && r.isNullAt(5)))
  }
}
