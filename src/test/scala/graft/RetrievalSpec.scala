package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.{Retrieval, Similarity, TextAnalysis}

/** Reciprocal-rank fusion: algebraic contract on small hand-built
  * lists, brute-force equality on the q141 composition, and the
  * plan-shape guarantee that fusion never touches corpus-scale data.
  */
class RetrievalSpec extends SparkSpecBase {
  import spark.implicits._

  test("fusing a list with itself preserves its ranking") {
    val l = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val fused = Retrieval.rrfFuse(Seq(l, l), k = 3).collect()
    assert(fused.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq ==
      Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L)))
    // doubled contribution: 2/(60+rank), rounded like the operator
    assert(fused.map(_.getDouble(3)).toSeq ==
      Seq(1, 2, 3).map(r => math.rint(2.0 / (60 + r) * 1e6) / 1e6))
  }

  test("a doc ranked by only one list contributes exactly 1/(c+rank)") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 10L, 1), (1L, 99L, 2)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 10).collect()
      .map(r => (r.getLong(2), r.getDouble(3))).toMap
    val r1 = 1.0 / 61
    assert(got(10L) == math.rint(2 * r1 * 1e6) / 1e6) // both lists, rank 1
    assert(got(11L) == math.rint(1.0 / 62 * 1e6) / 1e6)
    assert(got(99L) == math.rint(1.0 / 62 * 1e6) / 1e6)
    // consensus at rank 1 beats either singleton
    assert(got(10L) > got(11L))
  }

  test("rank ties on fused score break by doc id") {
    // 11 and 99 tie at 1/62; 11 must take the lower rank
    val a = Seq((1L, 11L, 2)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 99L, 2)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 10).collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 11L), (2, 99L)))
  }

  test("q141 composition equals a driver-side fusion of its two tiers") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val corpus = docs.filter(col("source") =!= "src0").select("doc_id", "text")
    val probes = docs
      .filter(col("source") === "src0" && col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("qtext"))
    val sparse = TextAnalysis.bm25TopK(
        corpus, "doc_id", "text", probes, "query_id", "qtext", k = 10)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val dense = Similarity.bruteForceTopK(
        emb.join(corpus.select(col("doc_id").as("vec_id")), "vec_id"),
        emb.join(probes.select(col("query_id").as("vec_id")), "vec_id"),
        k = 10)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    val got = Retrieval.rrfFuse(Seq(sparse, dense), k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

    def ranks(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val (sr, dr) = (ranks(sparse), ranks(dense))
    val expected = (sr.keySet ++ dr.keySet).toSeq
      .map { case k @ (q, d) =>
        val s = sr.get(k).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          dr.get(k).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (q, d, math.rint(s * 1e6) / 1e6)
      }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy { case (_, d, s) => (-s, d) }.take(10).zipWithIndex
          .map { case ((q, d, s), i) => (q, i + 1, d, s) }
      }.sortBy(t => (t._1, t._2))
    assert(got.nonEmpty && got.toSeq == expected)
  }

  test("fusion shuffles only top-k-bounded rows (inputs aggregated pre-union)") {
    // the fused aggregate sits above the per-list rank<=k filters, so
    // every row entering the union is already top-k-bounded; assert the
    // plan has no join at all above the input frames (pure union+agg)
    val a = Seq((1L, 10L, 1)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 99L, 1)).toDF("query_id", "doc_id", "rank")
    val plan = Retrieval.rrfFuse(Seq(a, b), k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"fusion should not join:\n$plan")
    assert(plan.contains("Union"), s"fusion should union its lists:\n$plan")
  }

  test("MaxSim equals a driver-side late-interaction recomputation") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val probes = emb.filter(col("vec_id") < 3)
    val got = Retrieval.maxSimTopK(emb, probes, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got.size == 15) // 3 queries x dense top-5
    // independent recomputation: same chunk formulas, plain Scala
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def chunk(v: Array[Float], c: Int, dm: Int, cm: Int): Array[Double] =
      v.zipWithIndex.map { case (x, i) =>
        x.toDouble * (1.0 + 0.25 * ((i * dm + c * cm) % 5 - 2)) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    for (q <- 0L until 3L) {
      val scores = vecs.keys.filter(_ != q).map { d =>
        val s = (0 until 4).map { qc =>
          val qv = chunk(vecs(q), qc, 3, 17)
          (0 until 4).map(dc =>
            math.round(cos(qv, chunk(vecs(d), dc, 7, 13)) * 1e6)).max
        }.sum
        d -> s
      }.toSeq.sortBy { case (d, s) => (-s, d) }
      scores.take(5).zipWithIndex.foreach { case ((d, s), i) =>
        assert(got((q, i + 1)) == ((d, s)),
          s"q=$q rank=${i + 1}: got ${got((q, i + 1))}, want ($d, $s)")
      }
    }
  }

  test("rank eval: recall@k and MRR on hand fixtures, zero-hit query stays NULL") {
    val ranked = Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L), (2L, 1, 30L))
      .toDF("query_id", "rank", "doc_id")
    val rels = Seq((1L, 11L), (1L, 99L), (2L, 77L))
      .toDF("query_id", "doc_id")
    val got = Retrieval.rankEval(ranked, rels, k = 3).collect()
    val q1 = got.find(_.getLong(0) == 1L).get
    assert((q1.getLong(1), q1.getLong(2), q1.getInt(3),
      q1.getDouble(4), q1.getDouble(5)) == ((2L, 1L, 2, 0.5, 0.5)))
    val q2 = got.find(_.getLong(0) == 2L).get
    assert(q2.getLong(1) == 1L && q2.getLong(2) == 0L)
    assert(q2.isNullAt(3) && q2.getDouble(4) == 0.0 && q2.isNullAt(5))
  }

  test("nDCG: hand-computed grades, ungraded docs gain 0, perfect ranking scores 1") {
    val ranked = Seq((1L, 1, 10L), (1L, 2, 12L), (1L, 3, 99L))
      .toDF("query_id", "rank", "doc_id")
    val rels = Seq((1L, 10L, 3.0), (1L, 11L, 2.0), (1L, 12L, 1.0))
      .toDF("query_id", "doc_id", "rel")
    def nano(gain: Double, pos: Int): Long =
      math.floor(math.max(gain, 0.0) / (math.log(pos + 1) / math.log(2))
        * 1e9 + 0.5).toLong
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dn = nano(3.0, 1) + nano(1.0, 2) + nano(0.0, 3)
    val in = nano(3.0, 1) + nano(2.0, 2) + nano(1.0, 3)
    val row = Retrieval.ndcgAtK(ranked, rels, k = 10).head()
    assert(row.getDouble(1) == r6(dn / 1e9) && row.getDouble(2) == r6(in / 1e9))
    assert(row.getDouble(3) == r6(dn.toDouble / in))
    // ranking the graded docs in grade order is a perfect 1.0
    val perfect = Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L))
      .toDF("query_id", "rank", "doc_id")
    assert(Retrieval.ndcgAtK(perfect, rels, k = 10).head().getDouble(3) == 1.0)
    // zero ideal gain -> NULL ndcg
    val zeroRels = Seq((1L, 10L, 0.0)).toDF("query_id", "doc_id", "rel")
    assert(Retrieval.ndcgAtK(ranked, zeroRels, k = 10).head().isNullAt(3))
  }
}
