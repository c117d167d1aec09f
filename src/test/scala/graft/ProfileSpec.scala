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
}
