package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}
import graft.functions.GramAggregator

/** Distributed PCA over an embedding column — the classic big-data
  * split: moments are accumulated in ONE distributed pass (a typed
  * gram Aggregator with map-side combine, ~2 KB per partition through
  * the shuffle), the dim×dim eigendecomposition runs on the driver
  * (bounded: dim ≤ a few hundred — 64×64 here), and the rotation is
  * broadcast back as a LITERAL expression so the projection is a pure
  * codegen map over the corpus (no UDF, no shuffle).
  *
  * All moment passes quantize coordinates to fixed-point
  * (round(x·10⁶) as long, [[Pca.quantize]]) and accumulate EXACT
  * integer sums — double partial sums depend on the partition merge
  * order, which varies run-to-run and flips round(_, 6) boundaries
  * against a sequential-order oracle (the CLAUDE.md order-invariance
  * invariant). Doubles are reconstructed once from the exact sums
  * with a fixed association both engines share.
  *
  * Uses: dimensionality reduction ahead of ANN (project-then-index),
  * decorrelation before product quantization (the rotation is the
  * "O" of OPQ), and embedding-drift diagnostics (covariance deltas).
  */
object Pca {

  /** Fixed-point quantization scale shared with every oracle:
    * q = round(x·10⁶) (half away from zero — Spark `round` and DuckDB
    * `round` agree), x ≈ q/10⁶, products at scale 10¹².
    */
  val Scale: Double = 1e6
  val Scale2: Double = 1e12

  /** array<double> → array<long> fixed-point coordinates (codegen map,
    * no UDF). Oracle equivalent: `CAST(round(v[i]*1e6) AS BIGINT)`.
    */
  def quantize(c: Column): Column =
    transform(c.cast("array<double>"), x => round(x * lit(Scale), 0).cast("long"))

  /** Population covariance as rows (dim_i, dim_j, cov), upper triangle
    * j >= i, round(_, 6) — the oracle-checkable face of the moment
    * pass: cov = (Σxy - Σx·Σy/n)/n over the quantized coordinates,
    * reconstructed from exact integer sums with a fixed association so
    * the oracle is bit-identical, not merely close.
    */
  def covariance(embeddings: DataFrame, embCol: String, dim: Int): DataFrame = {
    val spark = embeddings.sparkSession
    val (sums, prods, n) = moments(embeddings, embCol, dim)
    val rows = for {
      i <- 0 until dim
      j <- i until dim
    } yield Row(i, j, covCell(sums, prods, n, i, j, dim))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(StructField("dim_i", IntegerType, nullable = false),
        StructField("dim_j", IntegerType, nullable = false),
        StructField("cov", DoubleType, nullable = false))))
      .select(col("dim_i"), col("dim_j"), round(col("cov"), 6).as("cov"))
      .orderBy("dim_i", "dim_j")
  }

  /** One covariance cell from the exact integer moments — the ONE
    * float expression both engines evaluate, in this exact order:
    * (Σq_iq_j/10¹² − (Σq_i/10⁶)·(Σq_j/10⁶)/n)/n.
    */
  private def covCell(sums: Array[Long], prods: Array[Long], n: Long,
      i: Int, j: Int, dim: Int): Double =
    (prods(GramAggregator.triIndex(i, j, dim)).toDouble / Scale2 -
      sums(i).toDouble / Scale * (sums(j).toDouble / Scale) / n) / n

  /** One distributed pass over the QUANTIZED coordinates:
    * (Σq per dim, Σq_iq_j upper triangle, n) — exact integers.
    */
  private[graft] def moments(embeddings: DataFrame, embCol: String,
      dim: Int): (Array[Long], Array[Long], Long) = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val agg = new GramAggregator(dim).toColumn
    embeddings
      .select(quantize(col(embCol)).as("_e"))
      .as[Array[Long]]
      .select(agg.as[(Array[Long], Array[Long], Long)])
      .head()
  }

  /** Principal components from the moment pass: eigendecomposition of
    * the covariance matrix on the driver (breeze `eigSym`, shipped
    * with Spark). Returns (eigenvalues desc, eigenvectors row-major —
    * `vectors(c)` is the c-th component), sign-fixed so each
    * component's largest-|coefficient| entry is positive
    * (eigenvectors are only defined up to sign).
    */
  def principalComponents(embeddings: DataFrame, embCol: String,
      dim: Int): (Array[Double], Array[Array[Double]]) = {
    val (sums, prods, n) = moments(embeddings, embCol, dim)
    val cov = breeze.linalg.DenseMatrix.tabulate(dim, dim) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      covCell(sums, prods, n, a, b, dim)
    }
    val es = breeze.linalg.eigSym(cov)
    val order = (0 until dim).sortBy(c => -es.eigenvalues(c))
    val values = order.map(es.eigenvalues(_)).toArray
    val vectors = order.map { c =>
      val v = Array.tabulate(dim)(r => es.eigenvectors(r, c))
      val m = v.indices.maxBy(i => math.abs(v(i)))
      if (v(m) < 0) v.map(-_) else v
    }.toArray
    (values, vectors)
  }

  /** OPQ-style balanced allocation (Ge et al., CVPR 2013, the
    * parametric variant): permute the principal components so each of
    * `numSub` product-quantization subspaces receives dimensions whose
    * eigenvalue PRODUCTS are as equal as greedy assignment allows —
    * plain PCA concentrates variance in the leading dims, which
    * starves the trailing subspaces and wastes their codebooks; the
    * balanced permutation is what makes a PCA rotation help PQ
    * instead of hurting it. Returns the permuted component rows:
    * rows [m·d, (m+1)·d) form subspace m.
    */
  def balancedComponents(values: Array[Double], vectors: Array[Array[Double]],
      numSub: Int): Array[Array[Double]] = {
    val dim = values.length
    require(dim % numSub == 0, "numSub must divide dim")
    val d = dim / numSub
    val logs = values.map(v => math.log(math.max(v, 1e-12)))
    val slots = Array.fill(numSub)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val sums = new Array[Double](numSub)
    for (c <- 0 until dim) { // components arrive eigenvalue-descending
      val tgt = (0 until numSub).filter(slots(_).size < d).minBy(sums(_))
      slots(tgt) += c
      sums(tgt) += logs(c)
    }
    slots.flatMap(_.map(vectors(_))).toArray
  }

  /** Per-dimension drift between two embedding snapshots — the
    * monitoring face of the moment machinery: one exploded aggregate
    * over the union (conditional sums, map-side combined; neither
    * snapshot is joined or broadcast) yields each dimension's mean and
    * population variance per side plus the absolute mean shift. The
    * check that catches a changed encoder, a bad normalization, or a
    * shifted corpus before it poisons an ANN index built on top.
    *
    * Output per dim, ordered: (dim, mean_a, mean_b, var_a, var_b,
    * mean_shift), all round(_, 6). Sums run over the QUANTIZED
    * coordinates as exact longs (order-invariant); the float
    * association is fixed as mean = Σq/10⁶/n,
    * var = Σq²/10¹²/n − mean·mean so an oracle reproduces it
    * bit-stably.
    */
  def dimDrift(a: DataFrame, b: DataFrame, embCol: String = "embedding"): DataFrame = {
    val tagged = a.select(lit(0).as("_h"), col(embCol).as("_e"))
      .unionByName(b.select(lit(1).as("_h"), col(embCol).as("_e")))
    val u = tagged.select(col("_h"),
      posexplode(quantize(col("_e"))).as(Seq("dim", "q")))
    def side(h: Int, f: Column => Column) =
      f(when(col("_h") === h, col("q")))
    def mean(h: Int) = side(h, sum).cast("double") / lit(Scale) / side(h, count)
    // q² sums accumulate as decimal(38,0) — exact at any corpus size
    // (a long Σq² caps out near 10¹⁹, i.e. tens of millions of
    // unit-scale rows); one cast to double after aggregation
    def variance(h: Int) =
      side(h, c => sum(c.cast("decimal(19,0)") * c.cast("decimal(19,0)")))
        .cast("double") / lit(Scale2) / side(h, count) - mean(h) * mean(h)
    u.groupBy("dim").agg(
      round(mean(0), 6).as("mean_a"),
      round(mean(1), 6).as("mean_b"),
      round(variance(0), 6).as("var_a"),
      round(variance(1), 6).as("var_b"),
      round(abs(mean(0) - mean(1)), 6).as("mean_shift"))
      .orderBy("dim")
  }

  /** Project the embedding column onto the top-k components — a pure
    * literal-expression map (aggregate over zip_with), fully codegen,
    * no UDF: each output coordinate is Σ_d e[d]·rot[c][d] with the
    * rotation inlined as array literals.
    */
  def project(embeddings: DataFrame, embCol: String,
      components: Array[Array[Double]], k: Int, outCol: String = "proj"): DataFrame = {
    val comps = components.take(k)
    val e = col(embCol).cast("array<double>")
    val coords = comps.map { rot =>
      val rotLit = array(rot.map(lit): _*)
      aggregate(zip_with(e, rotLit, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    }
    embeddings.withColumn(outCol, array(coords: _*))
  }

  /** Deterministic ±1 JL sign matrix — entry (i, j) from the low bit
    * of the md5l-style 60-bit hash of "jl#seed#i#j" (the exact string
    * the oracle feeds DuckDB's md5), so both engines build the SAME
    * matrix. Bounded: dim × k ints, a fixed-size broadcastable
    * artifact computed once on the driver.
    */
  private[graft] def jlSigns(dim: Int, k: Int, seed: Long): Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim, k) { (i, j) =>
      val digest = md.digest(s"jl#$seed#$i#$j".getBytes("UTF-8"))
      val hex = digest.map("%02x".format(_)).mkString.take(15)
      if ((java.lang.Long.parseLong(hex, 16) & 1L) == 0L) 1 else -1
    }
  }

  /** Achlioptas sign random projection (STOC 2001 / JL lemma): map
    * dim-dimensional embeddings to k dimensions through a ±1 matrix —
    * the cheap-dimension-reduction step before ANN/clustering when 64
    * dims are more than the task needs. Coordinates are EXACT LONGS:
    * inputs micro-quantize ([[quantize]]) and the projection is a
    * fixed ±element_at sum chain (codegen'd, no shuffle, no float
    * accumulation order to pin). E‖Px‖² = k·‖x‖² under this scaling —
    * callers divide by k (or √k per-coordinate) when they need the
    * isometry normalized.
    */
  def signProjection(embeddings: DataFrame, idCol: String, embCol: String,
      dim: Int, k: Int, seed: Long = 42L): DataFrame = {
    val signs = jlSigns(dim, k, seed)
    val cols = (0 until k).map { j =>
      (0 until dim).map { i =>
        val e = element_at(col("_q"), i + 1)
        if (signs(i)(j) > 0) e else negate(e)
      }.reduce(_ + _)
    }
    embeddings
      .select(col(idCol), quantize(col(embCol)).as("_q"))
      .select(col(idCol), array(cols: _*).as("proj"))
  }

  /** The Johnson–Lindenstrauss CERTIFICATION for [[signProjection]]:
    * over consecutive-id pairs (an equi-join — never a cartesian),
    * the squared-distance ratio ‖Pa−Pb‖² / (k·‖a−b‖²) per target
    * dimension k, reported as (n, mean, min, max, share within ±50%).
    * Every distance is an exact integer of micro-quantized
    * coordinates; each ratio is ONE division ppm-quantized at birth,
    * so the concentration-improves-with-k readout hash-matches. The
    * per-pair work is dim·k_max adds — map-side, scan-shaped.
    */
  def jlDistortionReport(embeddings: DataFrame, idCol: String,
      embCol: String, dim: Int, ks: Seq[Int] = Seq(8, 16, 32),
      seed: Long = 42L): DataFrame = {
    require(ks.nonEmpty && ks.max <= 64)
    val kmax = ks.max
    val signs = jlSigns(dim, kmax, seed)
    val base = embeddings
      .select(col(idCol).as("id"), quantize(col(embCol)).as("q"))
      .localCheckpoint() // two join roles
    val pairs = base.select(col("id"), col("q").as("qa"))
      .join(base.select((col("id") - lit(1L)).as("id"), col("q").as("qb")),
        Seq("id"))
      .withColumn("dq", zip_with(col("qa"), col("qb"), (x, y) => x - y))
      .withColumn("d2in", aggregate(col("dq"), lit(0L), (a, v) => a + v * v))
      .filter(col("d2in") > 0L)
    val pds = (0 until kmax).map { j =>
      (0 until dim).map { i =>
        val e = element_at(col("dq"), i + 1)
        if (signs(i)(j) > 0) e else negate(e)
      }.reduce(_ + _).as(s"_pd$j")
    }
    val withPd = pairs.select(Seq(col("id"), col("d2in")) ++ pds: _*)
    val ratios = ks.map { k =>
      val d2out = (0 until k).map(j => col(s"_pd$j") * col(s"_pd$j"))
        .reduce(_ + _)
      round(d2out.cast("double")
        / (lit(k.toLong) * col("d2in")).cast("double") * lit(1e6))
        .cast("long").as(s"_r$k")
    }
    val rframe = withPd.select(Seq(col("id")) ++ ratios: _*)
      .localCheckpoint() // ks read it once each
    ks.map(k => rframe.select(lit(k).as("k"), col(s"_r$k").as("_ppm")))
      .reduce(_ unionByName _)
      .groupBy("k").agg(
        count(lit(1)).as("n_pairs"),
        round(sum("_ppm").cast("double") / count(lit(1)) / lit(1e6), 6)
          .as("mean_ratio"),
        round(min("_ppm").cast("double") / lit(1e6), 6).as("min_ratio"),
        round(max("_ppm").cast("double") / lit(1e6), 6).as("max_ratio"),
        round(sum(when(col("_ppm").between(500000L, 1500000L), 1)
          .otherwise(0)).cast("double") / count(lit(1)), 6)
          .as("frac_within_50pct"))
      .orderBy("k")
  }
}
