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
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }
}
