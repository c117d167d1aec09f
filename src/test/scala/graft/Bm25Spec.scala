package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.TextAnalysis

/** BM25 ranked retrieval: a hand-computed golden case and a driver-side
  * brute-force cross-check over the fixture (independent of the q139
  * DuckDB oracle, which replays the same formula in SQL).
  */
class Bm25Spec extends SparkSpecBase {

  private def bruteBm25(corpus: Seq[(Long, String)], queries: Seq[(Long, String)],
      k: Int, k1: Double = 1.2, b: Double = 0.75): Seq[(Long, Int, Long, Double)] = {
    val tf = corpus.map { case (id, t) =>
      id -> t.split(" ", -1).groupBy(identity).map { case (w, a) => w -> a.length }
    }.toMap
    val dl = corpus.map { case (id, t) => id -> t.split(" ", -1).length }.toMap
    val n = corpus.size.toDouble
    val avgdl = dl.values.sum.toDouble / n
    val df = tf.values.flatMap(_.keys).groupBy(identity).map { case (w, a) => w -> a.size }
    queries.flatMap { case (qid, qt) =>
      val terms = qt.split(" ", -1).distinct.filter(df.contains)
      val scored = corpus.flatMap { case (id, _) =>
        val s = terms.collect {
          case t if tf(id).contains(t) =>
            val f = tf(id)(t).toDouble
            math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) * f * (k1 + 1.0) /
              (f + k1 * (1.0 - b + b * dl(id) / avgdl))
        }.sum
        if (s > 0) Some((id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        else None
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex.map {
        case ((id, s), i) => (qid, i + 1, id, s)
      }
    }
  }

  test("hand-checkable golden case ranks the term-dense doc first") {
    val corpus = Seq(
      (1L, "wind wind wind power"),
      (2L, "wind power grid"),
      (3L, "solar power grid grid"),
      (4L, "coal plant output"))
    val queries = Seq((100L, "wind power"))
    val got = TextAnalysis.bm25TopK(
      spark.createDataFrame(corpus).toDF("doc_id", "text"), "doc_id", "text",
      spark.createDataFrame(queries).toDF("query_id", "qtext"), "query_id", "qtext",
      k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val expected = bruteBm25(corpus, queries, 4)
    assert(got.toSeq == expected, s"got ${got.toSeq} expected $expected")
    // doc 1 (3x wind) outranks doc 2 (1x wind + power); doc 4 never appears
    assert(got.head._3 == 1L && !got.map(_._3).contains(4L))
  }

  test("matches driver-side brute force on the fixture corpus and probes") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val corpus = docs.filter(col("source") =!= "src0").select("doc_id", "text")
    val probes = docs.filter(col("source") === "src0" && col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("qtext"))
    val got = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
      probes, "query_id", "qtext", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val expected = bruteBm25(
      corpus.collect().map(r => (r.getLong(0), r.getString(1))).toSeq,
      probes.collect().map(r => (r.getLong(0), r.getString(1))).toSeq, 10)
    assert(got.nonEmpty)
    // scores may differ in the last ulp from summation order; ranks and
    // ids must agree exactly, scores to 1e-5
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((gq, gr, gd, gs), (eq, er, ed, es)) =>
      assert(gq == eq && gr == er && gd == ed, s"rank mismatch: got=($gq,$gr,$gd) exp=($eq,$er,$ed)")
      assert(math.abs(gs - es) < 1e-5, s"score mismatch at ($gq,$gr): $gs vs $es")
    }
  }

  test("RM3 expansion bridges vocabulary mismatch: a doc sharing no query term becomes reachable") {
    import spark.implicits._
    // feedback docs pair "alpha" with "beta"; doc 10 speaks only
    // "beta" and is invisible to the raw query
    val corpus = Seq(
      (1L, "alpha beta common"), (2L, "alpha beta common"),
      (3L, "alpha beta filler"),
      (10L, "beta beta beta"),
      (20L, "gamma delta common"), (21L, "gamma epsilon filler"),
      (22L, "zeta eta common"), (23L, "theta iota filler"))
      .toDF("doc_id", "text")
    val probes = Seq((100L, "alpha")).toDF("query_id", "qtext")
    val raw = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
      probes, "query_id", "qtext", k = 10).collect()
    assert(!raw.map(_.getLong(2)).contains(10L),
      "doc 10 must be unreachable before expansion")
    // pct=60: "beta" has df 4/8 = 50%, above the production default
    // cap but a legitimate expansion term in this tiny fixture
    val exp = TextAnalysis.rm3ExpandedTopK(corpus, "doc_id", "text",
      probes, "query_id", "qtext", k = 10, fbDocs = 3, fbTerms = 2,
      maxExpansionDfPct = 60)
      .collect()
    assert(exp.map(_.getLong(2)).contains(10L),
      s"expansion did not surface doc 10: ${exp.mkString("; ")}")
    // original-term docs must stay retrievable (expansion adds, never
    // replaces)
    assert(exp.map(_.getLong(2)).toSet.intersect(Set(1L, 2L, 3L)).size == 3)
  }

  test("RM3 with zero feedback terms degrades to the plain BM25 ranking") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf("sf0.001"))
    val corpus = docs.filter(col("source") =!= "src0").select("doc_id", "text")
    val probes = docs
      .filter(col("source") === "src0" && col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("qtext"))
    val plain = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
      probes, "query_id", "qtext", k = 10).collect().toSeq
    val noExp = TextAnalysis.rm3ExpandedTopK(corpus, "doc_id", "text",
      probes, "query_id", "qtext", k = 10, fbDocs = 5, fbTerms = 0,
      maxExpansionDfPct = 100)
      .collect().toSeq
    assert(noExp == plain, "fbTerms=0 must reproduce the raw ranking")
  }
}
