package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.Pca

/** Distributed-PCA family: the moment pass against a driver-side
  * brute force, eigen properties, and the codegen projection.
  */
class PcaSpec extends SparkSpecBase {
  private lazy val emb = Tables.embeddings(spark, sf("sf0.001")).cache()
  private val Dim = 64

  private lazy val raw: Array[Array[Double]] = emb
    .select(col("embedding").cast("array<double>"))
    .collect().map(_.getSeq[Double](0).toArray)

  test("covariance matches a driver-side brute force") {
    val got = Pca.covariance(emb, "embedding", Dim).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size == Dim * (Dim + 1) / 2)
    val n = raw.length.toDouble
    // 1e-5 absorbs the fixed-point quantization (δ ≤ 5e-7/coord →
    // ~1e-7/cell at |x| ≤ ~0.5) on top of the 6-dp rounding
    for (i <- 0 until Dim; j <- i until Dim) {
      val sx = raw.map(_(i)).sum; val sy = raw.map(_(j)).sum
      val sxy = raw.map(v => v(i) * v(j)).sum
      val exp = (sxy - sx * sy / n) / n
      assert(math.abs(got((i, j)) - exp) < 1e-5, s"cov($i,$j)")
    }
  }

  test("principal components: orthonormal, variance-ordered, sign-fixed") {
    val (values, vectors) = Pca.principalComponents(emb, "embedding", Dim)
    assert(values.length == Dim && vectors.length == Dim)
    // eigenvalues sorted descending, all >= 0 for a covariance matrix
    assert(values.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(values.forall(_ >= -1e-9))
    // orthonormal rows
    for (a <- 0 until Dim; b <- a until Dim) {
      val dot = (0 until Dim).map(d => vectors(a)(d) * vectors(b)(d)).sum
      val exp = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - exp) < 1e-9, s"<v$a, v$b> = $dot")
    }
    // sign convention: largest-|coeff| entry positive → deterministic
    vectors.foreach { v =>
      assert(v(v.indices.maxBy(i => math.abs(v(i)))) > 0)
    }
    // trace preserved: Σ eigenvalues == Σ var(dim) — tolerance covers
    // 64 dims of fixed-point quantization error (~1e-7 each)
    val n = raw.length.toDouble
    val trace = (0 until Dim).map { i =>
      val sx = raw.map(_(i)).sum
      (raw.map(v => v(i) * v(i)).sum - sx * sx / n) / n
    }.sum
    assert(math.abs(values.sum - trace) < 1e-4)
  }

  test("projection is codegen (no UDF) and its per-component variance equals the eigenvalue") {
    val (values, vectors) = Pca.principalComponents(emb, "embedding", Dim)
    val k = 4
    val proj = Pca.project(emb, "embedding", vectors, k)
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQL UDF"))
    val comps = proj.select((0 until k).map(c => col("proj")(c).as(s"c$c")): _*)
      .collect()
    for (c <- 0 until k) {
      val xs = comps.map(_.getDouble(c))
      val n = xs.length.toDouble
      val v = (xs.map(x => x * x).sum - xs.sum * xs.sum / n) / n
      // eigenvalues come from the QUANTIZED covariance, the projection
      // from raw doubles — 1e-4 covers the fixed-point delta
      assert(math.abs(v - values(c)) < 1e-4,
        s"component $c variance $v != eigenvalue ${values(c)}")
    }
    // top-k projection reconstructs better with more components
    def reconErr(k: Int): Double = {
      val p = Pca.project(emb, "embedding", vectors, k).select("proj").collect()
        .map(_.getSeq[Double](0).toArray)
      raw.zip(p).map { case (v, coords) =>
        val rec = Array.fill(Dim)(0.0)
        for (c <- 0 until k; d <- 0 until Dim) rec(d) += coords(c) * vectors(c)(d)
        // ||x - P_k x||² — monotone non-increasing in k
        v.indices.map { d => val diff = v(d) - rec(d); diff * diff }.sum
      }.sum
    }
    assert(reconErr(16) < reconErr(4))
  }

  test("JL sign projection: exact-integer coords, linear, concentration tightens with k") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val proj = graft.operators.Pca.signProjection(
      emb, "vec_id", "embedding", dim = 64, k = 16)
    val rows = proj.orderBy("vec_id").collect()
    assert(rows.length == 500 && rows.head.getSeq[Long](1).length == 16)
    // deterministic: a second evaluation is bit-identical
    val again = graft.operators.Pca.signProjection(
      emb, "vec_id", "embedding", dim = 64, k = 16)
      .orderBy("vec_id").collect()
    assert(rows.map(_.getSeq[Long](1)).toSeq == again.map(_.getSeq[Long](1)).toSeq)
    val rep = graft.operators.Pca.jlDistortionReport(
      emb, "vec_id", "embedding", dim = 64).collect()
    assert(rep.map(_.getInt(0)).toSeq == Seq(8, 16, 32))
    rep.foreach { r =>
      assert(r.getDouble(2) > 0.7 && r.getDouble(2) < 1.3,
        s"mean ratio off: $r")
    }
    // the JL concentration: the within-±50% share never degrades as
    // k grows (and strictly improves from 8 to 32 on any real data)
    val within = rep.map(_.getDouble(5))
    assert(within(0) <= within(1) + 1e-9 && within(1) <= within(2) + 1e-9,
      s"concentration not tightening: ${within.toSeq}")
    assert(within(2) > within(0), s"no improvement 8 -> 32: ${within.toSeq}")
  }
}
