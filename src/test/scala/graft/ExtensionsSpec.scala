package graft

import org.apache.spark.sql.SparkSession

/** The spark.sql.extensions integration path: a session built with
  * GraftSparkExtensions resolves the graft native functions from plain
  * SQL, no Scala-side registration call needed.
  */
class ExtensionsSpec extends SparkSpecBase {
  test("withExtensions(GraftSparkExtensions) exposes graft functions to SQL") {
    val shared = spark // force shared session (and its SparkContext) up first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // getOrCreate reuses the running SparkContext but builds a FRESH
      // session, so the extensions hook actually runs
      val s2 = SparkSession.builder()
        .withExtensions(new GraftSparkExtensions())
        .getOrCreate()
      val cos = s2.sql(
        "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d))")
        .head.getDouble(0)
      assert(cos == 1.0)
      val sig = s2.sql(
        "SELECT graft_minhash16(array(1L, 2L), array(3L, 4L)) AS s")
        .selectExpr("size(s)", "s[0]").head
      assert(sig.getInt(0) == 16)
      // p=0 permutation is min(h1 mod ring) = 1
      assert(sig.getLong(1) == 1L)
      // NFC: a decomposed e + combining acute composes to U+00E9
      // the Scala \u escape embeds the REAL combining acute in the
      // SQL text (Spark's chr() is ASCII-only)
      val nfc = s2.sql("SELECT graft_nfc('e\u0301')")
        .head.getString(0)
      assert(nfc == "\u00e9" && nfc.length == 1)
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("NFC normalization: composition, idempotence, dedup-equality repair") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.TextExpressions.nfcFast
    val decomposed = "cafe\u0301" // e + combining acute (5 code points)
    val composed = "caf\u00e9" // precomposed (4 code points)
    assert(decomposed != composed) // the bug NFC fixes
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"))
      .toDF("id", "t")
    val out = graft.operators.TextAnalysis.nfcNormalize(df, "id", "t")
      .as[(Long, String, Int, Int, Int)].collect().toSeq
    assert(out == Seq(
      (1L, composed, 1, 5, 4), // composed, flagged, one char shorter
      (2L, composed, 0, 4, 4),
      (3L, "plain ascii", 0, 11, 11)))
    // normalized forms now dedup as equals
    assert(df.select(nfcFast(spark)(col("t")).as("n"))
      .filter(col("n") === composed).count() == 2)
  }
}
