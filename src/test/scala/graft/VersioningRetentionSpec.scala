package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import graft.operators.{Dedup, Retention, Scd2, SnapshotDiff}

/** Behavior specs for the versioning / retention / segment-dedup
  * operators: hand-computed goldens plus the plan-shape claims their
  * Scaladocs make.
  */
class VersioningRetentionSpec extends SparkSpecBase {
  import spark.implicits._

  // --- SnapshotDiff -------------------------------------------------

  private def snap(rows: Seq[(Long, String, String)]) =
    rows.toDF("id", "a", "b")

  test("snapshot diff classifies added / removed / changed and drops same") {
    val prev = snap(Seq((1L, "x", "y"), (2L, "x", "y"), (3L, "x", "y")))
    val next = snap(Seq((2L, "x", "y"), (3L, "x", "CHANGED"), (4L, "n", "n")))
    val got = SnapshotDiff.diff(prev, next, Seq("id"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "removed"), (3L, "changed"), (4L, "added")))
  }

  test("digest separates NULL from empty string and field boundaries") {
    val withNull = Seq((1L, null.asInstanceOf[String], "y")).toDF("id", "a", "b")
    val withEmpty = snap(Seq((1L, "", "y")))
    assert(SnapshotDiff.diff(withNull, withEmpty, Seq("id")).count() == 1,
      "NULL vs '' must hash differently")
    val ab_c = snap(Seq((1L, "ab", "c")))
    val a_bc = snap(Seq((1L, "a", "bc")))
    assert(SnapshotDiff.diff(ab_c, a_bc, Seq("id")).count() == 1,
      "boundary shift must hash differently")
  }

  test("digest ignores column order (sorted by name)") {
    val prev = snap(Seq((1L, "x", "y")))
    val reordered = Seq((1L, "y", "x")).toDF("id", "b", "a")
      .select("id", "a", "b")
    assert(SnapshotDiff.diff(prev, reordered, Seq("id")).count() == 0)
  }

  test("snapshot diff shuffles digests, not rows (join inputs are key+hash only)") {
    val docs = graft.engine.Tables.documents(spark, sf("sf0.001"))
    val d = SnapshotDiff.diff(docs, docs.limit(10), Seq("doc_id"))
    val joins = d.queryExecution.sparkPlan.collect { case j: SortMergeJoinExec => j }
    assert(joins.nonEmpty, "expected a sort-merge full outer join")
    joins.foreach { j =>
      assert(j.left.output.size == 2 && j.right.output.size == 2,
        s"join sides must carry (key, digest) only: ${j.left.output} / ${j.right.output}")
    }
  }

  // --- Scd2 ---------------------------------------------------------

  private def dim(rows: Seq[(Long, String, Int, Boolean)]) =
    rows.toDF("k", "attr", "version", "is_current")

  test("scd2 merge: new key opens v1, changed key closes and reopens, history untouched") {
    val d = dim(Seq(
      (1L, "keep", 1, true),          // untouched
      (2L, "old", 1, true),           // will change
      (2L, "ancient", 0, false),      // history row passes through
      (3L, "same", 1, true)))         // no-op update
    val u = Seq((2L, "new"), (3L, "same"), (4L, "fresh")).toDF("k", "attr")
    val out = Scd2.merge(d, u, "k", Seq("attr"))
      .orderBy("k", "version")
      .as[(Long, String, Int, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "keep", 1, true),
      (2L, "ancient", 0, false),
      (2L, "old", 1, false),
      (2L, "new", 2, true),
      (3L, "same", 1, true),
      (4L, "fresh", 1, true)))
  }

  test("scd2 merge is idempotent: re-applying the same updates is a no-op") {
    val d = dim(Seq((1L, "a", 1, true), (2L, "b", 1, true)))
    val u = Seq((1L, "a2"), (3L, "c")).toDF("k", "attr")
    val once = Scd2.merge(d, u, "k", Seq("attr"))
    val twice = Scd2.merge(once, u, "k", Seq("attr"))
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty,
      "second application of identical updates must change nothing")
  }

  // --- Retention ----------------------------------------------------

  private val ev = Seq(
    (10L, "2024-01-01 10:00:00"), (10L, "2024-01-01 11:00:00"), // same day dedups
    (10L, "2024-01-03 09:00:00"),
    (20L, "2024-01-01 09:00:00"),
    (30L, "2024-01-02 09:00:00"), (30L, "2024-01-09 09:00:00"))
    .toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))

  test("cohort matrix counts distinct users per (cohort day, offset)") {
    val got = Retention.cohortMatrix(ev, "user_id", "ts")
      .orderBy("cohort_d", "offset_days")
      .select(col("cohort_d").cast("string"), col("offset_days"), col("n_users"))
      .as[(String, Int, Long)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01", 0, 2L),  // users 10, 20
      ("2024-01-01", 2, 1L),  // user 10 back on day 3
      ("2024-01-02", 0, 1L),  // user 30
      ("2024-01-02", 7, 1L))) // user 30 back on day 9
  }

  test("rolling active users equals the naive day-range join") {
    val got = Retention.rollingActiveUsers(ev, "user_id", "ts")
      .orderBy("target_d")
      .select(col("target_d").cast("string"), col("active_users"))
      .as[(String, Long)].collect().toSeq
    // days present: 01-01 {10,20}, 01-02 {30}, 01-03 {10}, 01-09 {30};
    // the 01-09 window [01-03 .. 01-09] sees users {10, 30}
    assert(got == Seq(
      ("2024-01-01", 2L),
      ("2024-01-02", 3L),
      ("2024-01-03", 3L),
      ("2024-01-09", 2L)))
  }

  // --- Cdc ----------------------------------------------------------

  test("cdc apply keeps the highest-seq row per key and drops deleted keys") {
    val log = Seq(
      (1L, "a", 0L, "I"), (1L, "a2", 5L, "U"), (1L, "a1", 3L, "U"), // out-of-order ops
      (2L, "b", 0L, "I"), (2L, "b", 1L, "D"),                       // deleted
      (3L, "c", 0L, "I"), (3L, "c", 1L, "D"), (3L, "c2", 2L, "I"))  // reinserted
      .toDF("k", "attr", "seq", "op")
    val got = graft.operators.Cdc.applyChangelog(log, "k", "seq", "op", Seq("attr"))
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a2", 5L), (3L, "c2", 2L)))
  }

  test("cdc apply shuffles one candidate per key, not the changelog (partial max_by, no Window)") {
    val log = Seq((1L, "a", 0L, "I")).toDF("k", "attr", "seq", "op")
    val plan = graft.operators.Cdc.applyChangelog(log, "k", "seq", "op", Seq("attr"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_max_by"),
      s"expected a map-side partial max_by before the exchange:\n$plan")
    assert(!plan.contains("Window"),
      s"changelog compaction must not use a window (full-row shuffle):\n$plan")
  }

  // --- Expectations -------------------------------------------------

  test("expectations count NULL predicate results as violations") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (2L, null), (3L, -5L)).toDF("id", "v")
    val got = graft.operators.Expectations.validate(df, Seq(
      "v_positive" -> (col("v") > 0),
      "id_positive" -> (col("id") > 0)))
      .as[(String, Long, Boolean)].collect().toSeq
    // v > 0: row 2 is NULL (violation), row 3 negative → 2 violations
    assert(got == Seq(("id_positive", 0L, true), ("v_positive", 2L, false)))
  }

  test("expectations fold every check into one scan of the table") {
    val plan = graft.operators.Expectations.validate(
      graft.engine.Tables.lineitem(spark, sf("sf0.001")), Seq(
        "a" -> (col("l_quantity") > 0),
        "b" -> (col("l_discount") <= 0.05),
        "c" -> (col("l_extendedprice") >= 0)))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 table scan for 3 checks, got $scans:\n$plan")
  }

  test("referential violations count unmatched and NULL foreign keys") {
    val child = Seq[(java.lang.Long, String)]((1L, "a"), (7L, "b"), (null, "c"))
      .toDF("fk", "payload")
    val parent = Seq(1L, 2L).toDF("pk")
    val got = graft.operators.Expectations
      .referentialViolations(child, parent, "fk", "pk")
      .head.getLong(0)
    assert(got == 2L, "expected the unmatched key and the NULL key as orphans")
  }

  // --- identity properties ------------------------------------------

  test("segment dedup with an uncapped DF threshold is the identity on real docs") {
    val docs = graft.engine.Tables.documents(spark, sf("sf0.001"))
    val out = Dedup.segmentDedup(docs, "doc_id", "text",
      segLen = 8, maxDf = Long.MaxValue)
    assert(out.join(docs, "doc_id")
      .filter(col("text_clean") =!= col("text") ||
        col("kept_segments") =!= col("n_segments")).isEmpty,
      "uncapped segment dedup must reconstruct every doc exactly")
  }

  test("dup-span removal with an unreachable DF threshold is the identity on real docs") {
    val docs = graft.engine.Tables.documents(spark, sf("sf0.001"))
    val out = Dedup.dupSpanRemoval(docs, "doc_id", "text",
      spanLen = 8, minDf = Long.MaxValue)
    assert(out.join(docs, "doc_id")
      .filter(col("text_clean") =!= col("text") || col("n_removed") =!= 0).isEmpty,
      "unreachable DF threshold must remove nothing")
  }

  // --- segmentDedup -------------------------------------------------

  test("segment dedup drops corpus-frequent segments and reassembles in order") {
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    def uniq(d: Int) = (1 to 8).map(i => s"u${d}_$i").mkString(" ")
    // boilerplate segment appears in 4 docs (> maxDf=2) → dropped
    val docs = (1 to 4).map(d => (d.toLong, s"$boiler ${uniq(d)}"))
      .toDF("doc_id", "text")
    val got = Dedup.segmentDedup(docs, "doc_id", "text", segLen = 8, maxDf = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == (1 to 4).map(d => (d.toLong, 2L, 1L, uniq(d))))
  }

  test("segment dedup keeps segments at or below the DF cap and empties fully-hot docs") {
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val docs = ((1 to 3).map(d => (d.toLong, boiler)) :+ (9L, "short tail"))
      .toDF("doc_id", "text")
    val got = Dedup.segmentDedup(docs, "doc_id", "text", segLen = 8, maxDf = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // boilerplate df=3 > 2 → those docs lose everything; the short doc
    // (one sub-length segment, df=1) survives whole
    assert(got == Seq(
      (1L, 1L, 0L, ""), (2L, 1L, 0L, ""), (3L, 1L, 0L, ""),
      (9L, 1L, 1L, "short tail")))
  }

  test("kaplan-meier: textbook 3-user curve; all-events final row hits zero") {
    def fix(u2Buys: Boolean) = (Seq(
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "purchase", "2024-01-01 00:16:40"), // +1000 s
      (2L, "signup", "2024-01-01 00:00:00"),
      (3L, "signup", "2024-01-01 00:00:00"),
      (3L, "purchase", "2024-01-01 00:50:00")) ++ // +3000 s (= horizon)
      (if (u2Buys) Seq((2L, "purchase", "2024-01-01 00:50:00")) else Nil))
      .toDF("user_id", "event_type", "s")
      .select(col("user_id"), col("event_type"),
        col("s").cast("timestamp").as("ts"))
    val got = Retention.kaplanMeier(fix(u2Buys = false), "user_id", "ts",
      "event_type", "signup", "purchase")
      .as[(Long, Long, Long, Long, Option[Double], Double)]
      .collect().toSeq
    // t=1000: S = 2/3; t=3000: one event + one censor → S = 1/3
    assert(got == Seq(
      (1000L, 3L, 1L, 0L, Some(-0.405465), 0.666667),
      (3000L, 2L, 1L, 1L, Some(-1.098612), 0.333333)), s"got $got")
    // u2 buys at the horizon too: final row is all-events → S = 0
    val z = Retention.kaplanMeier(fix(u2Buys = true), "user_id", "ts",
      "event_type", "signup", "purchase")
      .as[(Long, Long, Long, Long, Option[Double], Double)]
      .collect().toSeq
    assert(z == Seq(
      (1000L, 3L, 1L, 0L, Some(-0.405465), 0.666667),
      (3000L, 2L, 2L, 0L, None, 0.0)), s"got $z")
  }

  test("log-rank: totals reconcile; no conversions → zero statistic, NULL chi2") {
    val ev2 = Seq(
      (1L, "signup", "2024-01-01 00:00:00"),
      (2L, "signup", "2024-01-01 00:00:00"),
      (3L, "signup", "2024-01-01 00:00:00"),
      (1L, "click", "2024-01-01 01:00:00"))
      .toDF("user_id", "event_type", "s")
      .select(col("user_id"), col("event_type"),
        col("s").cast("timestamp").as("ts"))
    val r = Retention.logRank(ev2, "user_id", "ts", "event_type",
      "signup", "purchase").collect().head
    assert(r.getLong(0) + r.getLong(1) == 3L) // n_a + n_b
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
    assert(r.isNullAt(6), "chi2 must be NULL when no event times exist")
  }
}
