package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.CentroidAggregator
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Cross-checks among the dedup/similarity family: probabilistic paths
  * against their exact counterparts, and the typed Aggregator against
  * the explode-based centroid.
  */
class DedupSimilaritySpec extends SparkSpecBase {
  private lazy val docs = Tables.documents(spark, sf("sf0.001")).cache()
  private lazy val emb = Tables.embeddings(spark, sf("sf0.001")).cache()

  test("minhash-LSH pairs recover the exact high-jaccard pairs") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    // every true near-dup must be found; estimated-jaccard threshold may
    // keep a few borderline extras, all with real overlap
    assert(exact.subsetOf(lsh), s"missed: ${exact -- lsh}")
  }

  test("simhash discriminates: near-dup pairs are far closer in hamming than random pairs") {
    // SimHash is a similarity PROXY — on a small shared vocabulary some
    // unrelated bags land close, so the property to hold is
    // discrimination, not zero false positives.
    val sh = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sh(a) ^ sh(b))
    val planted = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(planted.nonEmpty)
    val plantedMean = planted.map { case (a, b) => ham(a, b) }.sum.toDouble / planted.length
    val rng = new scala.util.Random(7)
    val ids = sh.keys.toArray
    val randomMean = (0 until 500).map { _ =>
      ham(ids(rng.nextInt(ids.length)), ids(rng.nextInt(ids.length)))
    }.sum / 500.0
    assert(plantedMean < randomMean / 3,
      s"no discrimination: planted=$plantedMean random=$randomMean")
    // and the banded pair join finds planted pairs at a generous radius
    val found = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.nonEmpty)
  }

  test("LSH ANN pairs are a subset of exact threshold pairs (no false positives)") {
    val exact = Similarity.thresholdPairs(emb, 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNeighborPairs(emb, 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty && exact.nonEmpty)
    assert(lsh.subsetOf(exact))
    assert(lsh.size >= exact.size / 5, s"recall collapsed: ${lsh.size}/${exact.size}")
  }

  test("IVF top-k: correct scores, no self-matches, decent recall vs exact") {
    val probes = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, probes, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ivf = Similarity.ivfTopK(emb, probes, k = 3, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
    assert(ivf.nonEmpty)
    ivf.foreach { case ((q, n), _) => assert(q != n) }
    // every IVF hit that's also an exact hit must carry the same score
    ivf.foreach { case (k, c) => exact.get(k).foreach(e => assert(e == c)) }
    // these embeddings are near-random (max pairwise cosine ~0.5), so
    // IVF recall ~ probed corpus fraction (4/8 lists); on genuinely
    // clustered data recall would approach 1. Guard the floor.
    val recall = ivf.count(p => exact.contains(p._1)).toDouble / exact.size
    assert(recall >= 0.35, s"IVF recall@3 collapsed: $recall")
  }

  test("binary-Hamming ANN: packing exact, ranks dense, scores exact, recall floor") {
    import spark.implicits._
    // hand-computed packing: dims 0,2 positive in word 0; dim 33 -> bit 1 of word 1
    val v = Array.fill(64)(-1.0f)
    v(0) = 1f; v(2) = 1f; v(33) = 1f
    val one = Seq((0L, v, 0)).toDF("vec_id", "embedding", "label")
    val words = one.selectExpr(
      """transform(sequence(0, cast((size(embedding) - 1) div 32 as int)), w ->
        |  aggregate(sequence(0, 31), 0L, (acc, i) ->
        |    acc + IF(w * 32 + i < size(embedding)
        |             AND element_at(embedding, w * 32 + i + 1) > 0,
        |             shiftleft(1L, i), 0L))) AS w""".stripMargin)
      .head.getSeq[Long](0)
    assert(words == Seq(5L, 2L))

    val probes = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, probes, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val bin = Similarity.binaryHammingTopK(emb, probes, k = 5, shortlist = 50)
      .collect()
    assert(bin.nonEmpty)
    val ranks = bin.groupBy(_.getLong(0)).values
    ranks.foreach(rs => assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length)))
    bin.foreach { r =>
      assert(r.getLong(0) != r.getLong(2)) // no self-matches
      // any hit shared with the exact path carries the identical cosine
      exact.get((r.getLong(0), r.getLong(2)))
        .foreach(e => assert(e == r.getDouble(4)))
      assert(r.getInt(3) >= 0 && r.getInt(3) <= 64) // 64-dim corpus
    }
    // near-random embeddings: 64 sign bits are a noisy angle proxy, so
    // the 10%-of-corpus shortlist recalls a bounded fraction of the
    // exact top-5; clustered production data would approach 1. Floor it.
    val recall = bin.count(r => exact.contains((r.getLong(0), r.getLong(2))))
      .toDouble / exact.size
    assert(recall >= 0.25, s"binary-Hamming recall@5 collapsed: $recall")
  }

  test("PQ top-k: dense ranks, no self-matches, deterministic, recall vs exact L2") {
    val probes = emb.filter(col("vec_id") < 10)
    val pq = Similarity.pqTopKSeeded(emb, probes, k = 5, dim = 64).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(pq.nonEmpty)
    pq.foreach { case (q, _, n, d) => assert(q != n); assert(d >= 0.0) }
    pq.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.size),
        s"query $q ranks not dense")
    }
    // deterministic (seeded codebooks, integer orderings)
    val again = Similarity.pqTopKSeeded(emb, probes, k = 5, dim = 64).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(pq.sameElements(again))
    // recall@5 against exact L2 top-5, computed directly
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val exact = vecs.keys.filter(_ < 10).flatMap { q =>
      vecs.toSeq.filter(_._1 != q)
        .map { case (n, v) => (n, d2(vecs(q), v)) }
        .sortBy { case (n, dd) => (dd, n) }.take(5).map(p => (q, p._1))
    }.toSet
    val recall = pq.count(p => exact.contains((p._1, p._3))).toDouble / exact.size
    // 16 codes × 8 subspaces on NEAR-RANDOM vectors is the worst case
    // for quantization (no cluster structure to exploit) — guard only
    // a collapse floor here; the degeneracy test below pins semantics
    assert(recall >= 0.1, s"PQ recall@5 collapsed: $recall")
    // with a codebook as large as the corpus every subvector encodes
    // to itself, ADC distances become the exact subspace sums, and PQ
    // MUST reproduce the exact L2 top-k
    val full = Similarity.pqTopKSeeded(emb, probes, k = 5, dim = 64,
        numCodes = vecs.size).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(full == exact,
      s"full-codebook PQ != exact: missing ${exact -- full}, extra ${full -- exact}")
  }

  test("learned PQ sub-codebooks: deterministic, dense ranks, recall floor vs exact L2") {
    val probes = emb.filter(col("vec_id") < 10)
    val pq = Similarity.pqTopKLearned(emb, probes, k = 5, dim = 64).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(pq.nonEmpty)
    pq.foreach { case (q, _, n, d) => assert(q != n); assert(d >= 0.0) }
    pq.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.size),
        s"query $q ranks not dense")
    }
    // deterministic: the sample is hash-ordered and Lloyd is seeded by it
    val again = Similarity.pqTopKLearned(emb, probes, k = 5, dim = 64).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(pq.sameElements(again))
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val exact = vecs.keys.filter(_ < 10).flatMap { q =>
      vecs.toSeq.filter(_._1 != q)
        .map { case (n, v) => (n, d2(vecs(q), v)) }
        .sortBy { case (n, dd) => (dd, n) }.take(5).map(p => (q, p._1))
    }.toSet
    val recall = pq.count(p => exact.contains((p._1, p._3))).toDouble / exact.size
    assert(recall >= 0.1, s"learned-PQ recall@5 collapsed: $recall")
    // Lloyd refinement must not LOSE quantization quality vs the raw
    // hash-sampled init: compare total sample quantization error
    val seededErr = quantError(Similarity.pqLearnedCodebooks(
      emb, dim = 64, iters = 0), vecs.values.toSeq)
    val learnedErr = quantError(Similarity.pqLearnedCodebooks(
      emb, dim = 64, iters = 5), vecs.values.toSeq)
    assert(learnedErr <= seededErr,
      s"Lloyd increased quantization error: $learnedErr > $seededErr")
  }

  /** Total squared quantization error of `vecs` under per-subspace
    * codebooks (nearest codeword per subvector).
    */
  private def quantError(cbs: Array[Array[Array[Double]]],
      vecs: Seq[Array[Double]]): Double = {
    val numSub = cbs.length
    val d = cbs(0)(0).length
    vecs.map { v =>
      (0 until numSub).map { m =>
        val sub = v.slice(m * d, (m + 1) * d)
        cbs(m).map(c => sub.indices.map(i => (sub(i) - c(i)) * (sub(i) - c(i))).sum).min
      }.sum
    }.sum
  }

  test("IVF+PQ re-rank: exact cosines on the shortlist, recall never below the un-reranked path") {
    val probes = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, probes, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val plain = Similarity.ivfPqTopKSeeded(emb, probes, k = 3, dim = 64).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val rer = Similarity.ivfPqTopKReranked(emb, probes, k = 3, dim = 64).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
    assert(rer.nonEmpty)
    // re-ranked scores are EXACT cosines: any (query, neighbor) also in
    // the exact top-k carries the identical rounded cosine
    rer.foreach { case (key, c) => exact.get(key).foreach(e => assert(e == c)) }
    // an exact-top-k hit surviving in the PQ shortlist is by definition
    // re-ranked into the top k, so re-ranking can only add recall
    val recallPlain = plain.count(exact.contains).toDouble / exact.size
    val recallRer = rer.count(p => exact.contains(p._1)).toDouble / exact.size
    assert(recallRer >= recallPlain,
      s"re-rank lost recall: $recallRer < $recallPlain")
    assert(recallRer >= 0.2, s"re-ranked recall@3 collapsed: $recallRer")
  }

  test("fully-learned IVF+PQ: dense ranks, deterministic, recall floor vs exact cosine") {
    val probes = emb.filter(col("vec_id") < 10)
    val got = Similarity.ivfPqTopKLearned(emb, probes, k = 3, dim = 64).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (q, _, n) => assert(q != n) }
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.size),
        s"query $q ranks not dense")
    }
    val again = Similarity.ivfPqTopKLearned(emb, probes, k = 3, dim = 64).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.sameElements(again), "learned IVF+PQ not deterministic")
    val exact = Similarity.bruteForceTopK(emb, probes, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // fixture vectors are near-random (max pairwise cosine ~0.5), the
    // worst case for BOTH tiers: routing recall ~ nprobe/nlists and PQ
    // adds quantization noise on top — guard a collapse floor only
    // (measured 0.10 on this fixture; clustered data approaches 1)
    val recall = got.count(p => exact.contains((p._1, p._3))).toDouble / exact.size
    assert(recall >= 0.08, s"learned IVF+PQ recall@3 collapsed: $recall")
    // with EVERY list probed the routing prunes nothing, so the
    // composition must reproduce exhaustive learned-PQ exactly —
    // routing and scoring are orthogonal
    val allLists = Similarity.ivfPqTopKLearned(emb, probes, k = 3, dim = 64,
        nprobe = 8, nlists = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val exhaustive = Similarity.pqTopKLearned(emb, probes, k = 3, dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(allLists.sameElements(exhaustive),
      "all-lists IVF+PQ != exhaustive PQ under the same learned codebooks")
  }

  test("semdedup auto nlists follows the k-vs-N rule (⌈√N⌉) and matches the explicit form") {
    import spark.implicits._
    def mk(n: Int) = (0 until n).map { i =>
      (i.toLong, i % 4, Seq.tabulate(8)(dd => ((i * 31 + dd * 7) % 17 - 8).toDouble))
    }.toDF("vec_id", "label", "embedding")
    assert(Similarity.autoNlists(mk(100)) == 10)
    assert(Similarity.autoNlists(mk(401)) == 21)
    // per-list membership stays ≈ √N as the corpus grows — the whole
    // point of deriving nlists instead of fixing it
    Seq(100, 400).foreach { n =>
      assert(n.toDouble / Similarity.autoNlists(mk(n)) <= math.sqrt(n) + 1)
    }
    val df = mk(120)
    val auto = Similarity.semanticDedup(df, 0.99).orderBy("vec_id").collect().toSeq
    val explicit = Similarity.semanticDedup(df, 0.99, nlists = 11)
      .orderBy("vec_id").collect().toSeq
    assert(auto == explicit, "auto nlists != explicit ceil(sqrt N)")
  }

  test("IVF-PQ: same codes as exhaustive PQ, routing only prunes candidates") {
    val probes = emb.filter(col("vec_id") < 10)
    val ivfPq = Similarity.ivfPqTopKSeeded(emb, probes, k = 3, dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(ivfPq.nonEmpty)
    ivfPq.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.size),
        s"query $q ranks not dense")
    }
    // every (query, neighbor) distance must equal the exhaustive PQ
    // ADC distance for that pair — routing changes WHICH pairs are
    // scored, never the score
    val n = emb.count().toInt
    val fullPq = Similarity.pqTopKSeeded(emb, probes, k = n, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    ivfPq.foreach { case (q, _, nb, d) =>
      assert(fullPq((q, nb)) == d, s"($q,$nb): ivf-pq $d != pq ${fullPq((q, nb))}")
    }
    // deterministic
    val again = Similarity.ivfPqTopKSeeded(emb, probes, k = 3, dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(ivfPq.sameElements(again))
  }

  test("IVF works on UNLABELED input (learned codebook, no label column)") {
    val unlabeled = emb.select("vec_id", "embedding")
    val probes = unlabeled.filter(col("vec_id") < 10)
    val ivf = Similarity.ivfTopK(unlabeled, probes, k = 3, nprobe = 4).collect()
    assert(ivf.nonEmpty)
    // deterministic across invocations (seeded sample + fixed iterations)
    val again = Similarity.ivfTopK(unlabeled, probes, k = 3, nprobe = 4).collect()
    assert(ivf.sameElements(again))
  }

  test("typed CentroidAggregator == posexplode centroid") {
    import spark.implicits._
    val agg = new CentroidAggregator(64).toColumn
    val typed = emb
      .select(col("label"), col("embedding").cast("array<double>").as("v"))
      .as[(Int, Array[Double])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("centroid"))
      .collect().toMap
    val exploded = Similarity.labelCentroids(emb).collect()
      .groupBy(_.getInt(0))
      .map { case (l, rows) => l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)) }
    exploded.foreach { case (label, expected) =>
      val got = typed(label)
      expected.zip(got).foreach { case (e, g) =>
        assert(math.abs(e - math.rint(g * 1e6) / 1e6) < 1e-6, s"label $label")
      }
    }
  }

  test("fingerprints are deterministic and collision-free on distinct texts") {
    val fp1 = TextAnalysis.fingerprint(docs, "doc_id", "text").collect()
    val fp2 = TextAnalysis.fingerprint(docs, "doc_id", "text").collect()
    assert(fp1.sameElements(fp2))
    assert(fp1.map(_.getLong(1)).distinct.length == fp1.length)
  }

  test("fused minhash Expression == HOF double-hashing form bit-for-bit") {
    import graft.functions.{Md5Family, MinhashExpressions}
    val sh = Dedup.shingles(col("text"), 3)
    val bound = docs.select(col("doc_id"),
      transform(sh, g => Md5Family.hash(g)).as("h1"),
      transform(sh, g => Md5Family.hash2(g)).as("h2"))
    val hof = array((0 until 16).map { p =>
      array_min(zip_with(col("h1"), col("h2"), (a, b) => Md5Family.permute(a, b, p)))
    }: _*)
    val rows = bound.select(
      MinhashExpressions.minhashFast(spark)(col("h1"), col("h2"), 16, Md5Family.Ring)
        .as("fused"),
      hof.as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("Md5Family matches the DuckDB rendering (pinned cross-engine value)") {
    import spark.implicits._
    // DuckDB: SELECT CAST(concat('0x', substr(md5('hello'),1,15)) AS BIGINT)
    val v = Seq("hello").toDF("s")
      .select(graft.functions.Md5Family.hash(col("s"))).head.getLong(0)
    assert(v == 419982666956583591L)
  }

  test("canonical corpus keeps the min-id doc per cluster and counts removals") {
    import spark.implicits._
    val d = Seq((1L, "x x x x"), (2L, "x x x x"), (3L, "y y y y"), (4L, "z w q r"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text", threshold = 0.9)
    val out = Dedup.canonicalCorpus(d, pairs, "doc_id").orderBy("doc_id")
      .select("doc_id", "cluster_size", "removed_dups").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 1L), (3L, 1L, 0L), (4L, 1L, 0L)))
  }

  test("maxDf cap drops boilerplate shingles; clean pairs survive") {
    import spark.implicits._
    val d = Seq(
      (1L, "a a a a"), (2L, "a a a a"), (3L, "a a a a"), // identical boilerplate, df=3
      (4L, "p q r s t u"), (5L, "p q r s t v")           // genuine near-dups, shingle df<=2
    ).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(d, "doc_id", "text")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.ngramJaccardPairs(d, "doc_id", "text", maxDf = 2)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((4L, 5L)))
    assert(!capped.exists(p => Set(1L, 2L, 3L).contains(p._1)), "boilerplate pair survived cap")
    assert(capped.contains((4L, 5L)), "clean near-dup pair lost to cap")
  }

  test("connected components converge on a 64-node chain within maxIter (pointer jumping)") {
    import spark.implicits._
    // diameter 63 > maxIter 50: plain min-label propagation would throw
    // non-convergence; path doubling must finish in ~log2(63) rounds
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(chain, "doc_a", "doc_b").collect()
    assert(cc.length == 64)
    assert(cc.forall(_.getLong(1) == 0L), "wrong cluster id")
    assert(cc.forall(_.getLong(2) == 64L), "wrong cluster size")
  }

  test("large-star/small-star components match min-label on chain, star, and random graphs") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)]): (Set[(Long, Long, Long)], Set[(Long, Long, Long)]) = {
      val df = edges.toDF("doc_a", "doc_b")
      def toSet(r: org.apache.spark.sql.DataFrame) =
        r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      (toSet(Dedup.connectedComponentsStars(df, "doc_a", "doc_b")),
        toSet(Dedup.connectedComponents(df, "doc_a", "doc_b")))
    }
    // chain (worst diameter), star, two components + a triangle
    val cases = Seq(
      (0L until 40L).map(i => (i, i + 1)),
      (1L to 20L).map(i => (0L, i)),
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L)),
      // deterministic pseudo-random graph
      (0 until 120).map { i =>
        val a = (i * 2654435761L) % 97; val b = (i * 40503L + 7) % 97
        (math.min(a, b), math.max(a, b) + 1)
      })
    cases.foreach { es =>
      val (stars, minLabel) = run(es)
      assert(stars == minLabel, s"algorithms disagree on ${es.take(5)}...")
    }
  }

  test("adaptive components: union-find path == stars path on every graph shape") {
    import spark.implicits._
    def toSet(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val cases = Seq(
      (0L until 40L).map(i => (i, i + 1)),                       // chain
      (1L to 20L).map(i => (0L, i)),                             // star
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L)), // 2 comps
      Seq((5L, 5L), (1L, 2L)))                                   // self-loop dropped
    cases.foreach { es =>
      val df = es.toDF("doc_a", "doc_b")
      val auto = toSet(Dedup.connectedComponentsAuto(df, "doc_a", "doc_b"))
      val viaStars = toSet(Dedup.connectedComponentsAuto(df, "doc_a", "doc_b",
        smallEdges = 0L)) // force the distributed path
      assert(auto == viaStars, s"paths disagree on ${es.take(5)}...")
      assert(auto == toSet(Dedup.connectedComponentsStars(df, "doc_a", "doc_b")))
    }
  }

  test("incremental canonicalization == full CC recompute on append workloads") {
    import spark.implicits._
    def toSet(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val all = (0 until 150).map { i =>
      val a = (i * 2654435761L) % 61; val b = (i * 40503L + 7) % 61
      (math.min(a, b), math.max(a, b) + 1)
    }
    // split rules: which pairs were already in the standing corpus
    val splits: Seq[((Long, Long)) => Boolean] = Seq(
      { case (a, b) => a % 2 == 0 && b % 2 == 0 }, // arriving = odd-touching
      { case (a, b) => a < 30 && b < 30 },         // arriving = high ids
      _ => false,                                  // everything arrives at once
      _ => true)                                   // nothing arrives
    splits.foreach { isOld =>
      val oldPairs = all.filter(isOld).toDF("doc_a", "doc_b")
      val newPairs = all.filterNot(isOld).toDF("doc_a", "doc_b")
      val labels = Dedup.connectedComponentsAuto(oldPairs, "doc_a", "doc_b")
        .select("doc_id", "cluster_id")
      val inc = toSet(Dedup.assignToExistingClusters(labels, newPairs,
        "doc_a", "doc_b"))
      val full = toSet(Dedup.connectedComponentsAuto(
        all.toDF("doc_a", "doc_b"), "doc_a", "doc_b"))
      assert(inc == full, s"incremental diverged from full recompute")
    }
  }

  test("carried-size fast path == recount path for incremental canonicalization") {
    import spark.implicits._
    def toSet(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val all = (0 until 150).map { i =>
      val a = (i * 2654435761L) % 61; val b = (i * 40503L + 7) % 61
      (math.min(a, b), math.max(a, b) + 1)
    }
    val isOld: ((Long, Long)) => Boolean = { case (a, b) => a % 2 == 0 && b % 2 == 0 }
    val oldPairs = all.filter(isOld).toDF("doc_a", "doc_b")
    val newPairs = all.filterNot(isOld).toDF("doc_a", "doc_b")
    // full labels WITH sizes (as the streaming store persists them)
    val sized = Dedup.connectedComponentsAuto(oldPairs, "doc_a", "doc_b")
    val sizeless = sized.select("doc_id", "cluster_id")
    val fast = toSet(Dedup.assignToExistingClusters(sized, newPairs,
      "doc_a", "doc_b"))
    val slow = toSet(Dedup.assignToExistingClusters(sizeless, newPairs,
      "doc_a", "doc_b"))
    assert(fast == slow, "carried-size fast path diverged from the recount path")
    // untouched clusters' sizes pass through VERBATIM — corrupt one
    // carried size for a cluster no new pair touches, and the fast
    // path must preserve the corruption (proof it never re-counted it)
    val touchedIds = Dedup.connectedComponentsAuto(newPairs
        .join(sized.select(col("doc_id").as("doc_a"), col("cluster_id").as("ca")),
          Seq("doc_a"), "left")
        .join(sized.select(col("doc_id").as("doc_b"), col("cluster_id").as("cb")),
          Seq("doc_b"), "left")
        .select(coalesce(col("ca"), col("doc_a")).as("u"),
          coalesce(col("cb"), col("doc_b")).as("v")), "u", "v")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val untouchedCluster = sized.select("cluster_id").distinct()
      .collect().map(_.getLong(0)).find(!touchedIds.contains(_))
    untouchedCluster.foreach { cid =>
      val poisoned = sized.withColumn("cluster_size",
        when(col("cluster_id") === cid, lit(999L)).otherwise(col("cluster_size")))
      val out = Dedup.assignToExistingClusters(poisoned, newPairs, "doc_a", "doc_b")
        .filter(col("cluster_id") === cid).select("cluster_size")
        .distinct().collect().map(_.getLong(0)).toSeq
      assert(out == Seq(999L),
        s"fast path re-counted an untouched cluster (got $out)")
    }
  }

  test("incremental canonicalization merges two standing components bridged by one arriving doc") {
    import spark.implicits._
    // standing: {0,2} labeled 0 and {4,6} labeled 4; doc 1 arrives
    // pairing with both — union-find would merge them, so must we
    val labels = Dedup.connectedComponentsAuto(
      Seq((0L, 2L), (4L, 6L)).toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .select("doc_id", "cluster_id")
    val got = Dedup.assignToExistingClusters(labels,
      Seq((1L, 2L), (1L, 4L)).toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(0L, 1L, 2L, 4L, 6L).map(d => (d, 0L, 5L)),
      s"bridge merge wrong: $got")
  }

  test("duplicated-span removal cuts the shared passage at any offset and spares the rest") {
    import spark.implicits._
    val passage = (1 to 8).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 $passage a3"),         // passage at offset 2
      (2L, s"$passage b1 b2 b3"),         // passage at offset 0
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9"), // no dup spans
      (4L, "tiny doc"))                   // shorter than the span
      .toDF("doc_id", "text")
    val got = Dedup.dupSpanRemoval(docs, "doc_id", "text", spanLen = 8, minDf = 2)
      .orderBy("doc_id")
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (1L, 11, 1, 8, "a1 a2 a3"),
      (2L, 11, 1, 8, "b1 b2 b3"),
      (3L, 9, 0, 0, "c1 c2 c3 c4 c5 c6 c7 c8 c9"),
      (4L, 2, 0, 0, "tiny doc")))
  }

  test("duplicated-span removal merges overlapping duplicate windows") {
    import spark.implicits._
    // docs share a 9-token passage → two overlapping 8-windows in each;
    // coverage is their union (9 tokens), not 16
    val passage = (1 to 9).map(i => s"p$i").mkString(" ")
    val docs = Seq((1L, s"x1 $passage"), (2L, s"$passage y1"))
      .toDF("doc_id", "text")
    val got = Dedup.dupSpanRemoval(docs, "doc_id", "text", spanLen = 8, minDf = 2)
      .orderBy("doc_id")
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(got == Seq((1L, 10, 2, 9, "x1"), (2L, 10, 2, 9, "y1")))
  }

  test("duplicated-span removal: a 1-token gap between spans stays, same-doc repeats both cut") {
    import spark.implicits._
    val pA = (1 to 8).map(i => s"a$i").mkString(" ")
    val pB = (1 to 8).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      // two shared passages with a unique 1-token gap: the windows
      // straddling the gap differ between docs, so the gap token must
      // survive even though spans end at 7 and restart at 9
      (1L, s"$pA g1 $pB"),
      (2L, s"$pA h1 $pB"),
      // the same passage twice in ONE doc (df counts DISTINCT docs, so
      // both occurrences are duplicated spans and the doc empties)
      (3L, s"$pA $pA"))
      .toDF("doc_id", "text")
    val got = Dedup.dupSpanRemoval(docs, "doc_id", "text", spanLen = 8, minDf = 2)
      .orderBy("doc_id")
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (1L, 17, 2, 16, "g1"),
      (2L, 17, 2, 16, "h1"),
      (3L, 16, 2, 16, "")))
  }

  test("label diversity identity equals brute-force mean pairwise distance") {
    import spark.implicits._
    val vecs = Seq(
      (0L, 0, Seq(1.0, 0.0, 2.0)), (1L, 0, Seq(0.0, 1.0, -1.0)),
      (2L, 0, Seq(2.0, 2.0, 0.5)), (3L, 1, Seq(3.0, -1.0, 0.0)),
      (4L, 1, Seq(1.0, 1.0, 1.0)))
    val df = vecs.toDF("vec_id", "label", "embedding")
    val got = graft.operators.Similarity.labelDiversity(df)
      .as[(Int, Long, Double)].collect()
      .map { case (l, n, d) => l -> ((n, d)) }.toMap
    vecs.groupBy(_._2).foreach { case (label, vs) =>
      val xs = vs.map(_._3)
      val brute = (for (a <- xs; b <- xs)
        yield a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
        .sum / (xs.size.toDouble * xs.size)
      val (n, d) = got(label)
      assert(n == xs.size && math.abs(d - brute) < 1e-6,
        s"label $label: identity $d != brute $brute")
    }
  }

  test("semdedup with one coarse list equals exact-pair canonical dedup") {
    // a single centroid puts every vector in one cluster, so the
    // within-cluster pairs ARE the exact threshold pairs — the whole
    // composition (assign → pair → connect → survive) must then match
    // canonicalCorpus over thresholdPairs
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val sem = graft.operators.Similarity.semanticDedupWithCodebook(
      emb, 0.4, graft.operators.Similarity.seededCodebook(emb, 1))
    val exact = Dedup.canonicalCorpus(
      emb.select(col("vec_id"), col("label")),
      graft.operators.Similarity.thresholdPairs(emb, 0.4),
      "vec_id", "id_a", "id_b")
    assert(sem.exceptAll(exact).isEmpty && exact.exceptAll(sem).isEmpty,
      "one-list semdedup must equal the exact-pair dedup")
  }

  test("semdedup survivors never exceed the corpus and removals are accounted") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val out = graft.operators.Similarity.semanticDedup(emb, threshold = 0.4)
    val n = emb.count()
    val survivors = out.count()
    val removed = out.agg(sum(col("removed_dups"))).head.getLong(0)
    assert(survivors + removed == n,
      s"$survivors survivors + $removed removed != $n vectors")
  }

  test("bpe merge candidates count adjacent pairs with deterministic tie order") {
    import spark.implicits._
    val docs = Seq("a b a b c", "a b", "z").toDF("text")
    val got = graft.operators.TextAnalysis.bpeMergeCandidates(docs, "text", k = 3)
      .as[(String, Long)].collect().toSeq
    // pairs: doc1 → (a b),(b a),(a b),(b c); doc2 → (a b); doc3 → none
    assert(got == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("cross-corpus LSH join == self-join pairs restricted across the split") {
    import graft.functions.Md5Family
    val docs = Tables.documents(spark, sf("sf0.001"))
    val bucket = graft.operators.Sampling.hashBucket(col("doc_id"), 100, Md5Family)
    val newSide = docs.filter(bucket >= 50)
    val oldSide = docs.filter(bucket < 50)
    val newIds = newSide.select("doc_id").collect().map(_.getLong(0)).toSet
    val oldIds = oldSide.select("doc_id").collect().map(_.getLong(0)).toSet
    val cross = Dedup.minhashLshJoin(newSide, oldSide, "doc_id", "text",
        hashes = Md5Family)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // self-join over the whole corpus (uncapped, same params), keeping
    // only pairs that straddle the split, normalized to (new, old)
    val self = Dedup.minhashLshPairs(docs, "doc_id", "text",
        maxBucket = Int.MaxValue, hashes = Md5Family)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .collect {
        case (a, b, j) if newIds(a) && oldIds(b) => (a, b, j)
        case (a, b, j) if newIds(b) && oldIds(a) => (b, a, j)
      }.toSet
    assert(cross.nonEmpty, "degenerate fixture: no cross pairs")
    assert(cross == self, s"cross=${cross.size} self=${self.size}")
  }

  test("linear counting estimates distinct within 5% at one-third occupancy") {
    import graft.operators.Sketches
    val events = Tables.events(spark, sf("sf0.001"))
    val exact = events.select(countDistinct(col("user_id"))).head.getLong(0)
    val est = Sketches.linearCountDistinct(events, col("user_id"))
      .head.getDouble(1)
    assert(math.abs(est - exact) / exact < 0.05, s"estimate $est vs exact $exact")
  }

  test("MG heavy hitters == brute-force count/filter under any partitioning") {
    import graft.operators.Sketches
    val tok = Tables.documents(spark, sf("sf0.001"))
      .select(explode(split(col("text"), " ")).as("token"))
      .localCheckpoint()
    val n = tok.count()
    def brute(k: Int) = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > n)
      .withColumn("share", round(col("cnt").cast("double") / n, 6))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    def got(df: org.apache.spark.sql.DataFrame, k: Int) =
      Sketches.heavyHitters(df, "token", k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    for (k <- Seq(50, 200)) {
      val expected = brute(k)
      assert(expected.nonEmpty, s"degenerate fixture at k=$k")
      // default layout, adversarial few-partition, and sorted layout
      // (sorted packs each token into one partition — the MG stress)
      assert(got(tok, k) == expected)
      assert(got(tok.repartition(3), k) == expected)
      assert(got(tok.orderBy("token"), k) == expected)
    }
  }

  test("heavy hitters: no sentinel collision — a literal _OTHER_ token is reported") {
    import spark.implicits._
    import graft.operators.Sketches
    val rows = Seq.fill(50)("_OTHER_") ++ (1 to 50).map(i => s"t$i")
    val got = Sketches.heavyHitters(rows.toDF("token"), "token", k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("_OTHER_", 50L)))
  }

  test("join-size sketch: upper bound always; exact when vocabulary fits the width") {
    import graft.operators.Sketches
    import spark.implicits._
    // collision-free regime (8 keys « width): inner product is exact —
    // fa·fb summed = 3*2*1(k1) + 1*4(k2) + 2*0 + 0*5 = 10
    val a = Seq("k1", "k1", "k1", "k2", "k3", "k3").toDF("ka")
    val b = Seq("k1", "k1", "k2", "k2", "k2", "k2", "k4", "k4", "k4",
      "k4", "k4").toDF("kb")
    val r = Sketches.joinSizeEstimate(a, "ka", b, "kb").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((6L, 11L, 10L, 10L)), s"got $r")
    assert(r.getDouble(4) == 1.0)
    // disjoint key sets: exact 0, estimate may carry collision mass
    // but stays a NON-NEGATIVE upper bound with NULL ratio
    val d = Sketches.joinSizeEstimate(
      Seq("x1", "x2").toDF("ka"), "ka", Seq("y1").toDF("kb"), "kb")
      .collect()(0)
    assert(d.getLong(3) == 0L && d.getLong(2) >= 0L && d.isNullAt(4))
    // real-data regime (orderkey vocabulary » width): upper bound holds
    val s0 = Sketches.joinSizeEstimate(
      Tables.lineitem(spark, sf("sf0.001")), "l_orderkey",
      Tables.orders(spark, sf("sf0.001")), "o_orderkey",
      width = 256).collect()(0)
    assert(s0.getLong(2) >= s0.getLong(3),
      s"sketch under-estimated the join: $s0")
    assert(s0.getLong(3) == 6000L) // FK: every lineitem matches once
  }

  test("count-min estimates never undercount and nail the heavy hitters") {
    import graft.operators.Sketches
    val tok = Tables.documents(spark, sf("sf0.001"))
      .select(explode(split(col("text"), " ")).as("token"))
    val top = Sketches.countMinTopK(tok, "token", k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(top.length == 20)
    // CM property: estimate >= exact, always
    top.foreach { case (t, est, exact) =>
      assert(est >= exact, s"token $t: est $est < exact $exact") }
    // the sketch's top-20 should be the exact top-20 at this skew
    // (estimates may reorder within, so compare as sets)
    val exactTop = tok.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(20)
      .collect().map(_.getString(0)).toSet
    val overlap = top.map(_._1).toSet.intersect(exactTop).size
    assert(overlap >= 16, s"only $overlap/20 sketch heavy hitters are true heavy hitters")
  }

  test("histogram quantiles land within one bin width of exact percentiles") {
    import graft.operators.Sketches
    val li = Tables.lineitem(spark, sf("sf0.001"))
    val got = Sketches.histogramQuantiles(li, "l_extendedprice")
      .collect().map(r => (r.getDouble(0), r.getDouble(2))).toMap
    val Seq(lo, hi) = li.agg(min(col("l_extendedprice")), max(col("l_extendedprice")))
      .head.toSeq.map(_.asInstanceOf[Double])
    val binWidth = (hi - lo) / 1000.0
    for (q <- Seq(0.25, 0.5, 0.75, 0.9, 0.99)) {
      val exact = li.stat.approxQuantile("l_extendedprice", Array(q), 0.0).head
      assert(math.abs(got(q) - exact) <= 2 * binWidth,
        s"q$q: sketch ${got(q)} vs exact $exact (bin width $binWidth)")
    }
  }

  test("grouped histogram quantiles land within one bin width per group") {
    import graft.operators.Sketches
    val (lo, hi, bins) = (0.0, 5000.0, 500)
    val got = Sketches.groupedHistogramQuantiles(docs, "lang", "n_chars",
        lo, hi, bins)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3)).toMap
    val binWidth = (hi - lo) / bins
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    for (lang <- langs; q <- Seq(0.25, 0.5, 0.75, 0.9, 0.99)) {
      val exact = docs.filter(col("lang") === lang)
        .select(col("n_chars").cast("double"))
        .stat.approxQuantile("n_chars", Array(q), 0.0).head
      assert(math.abs(got((lang, q)) - exact) <= 2 * binWidth,
        s"$lang q$q: sketch ${got((lang, q))} vs exact $exact")
    }
  }

  test("exact dedup keeps min id and counts duplicates") {
    import spark.implicits._
    val df = Seq((1L, "aa"), (2L, "bb"), (3L, "aa"), (4L, "aa"))
      .toDF("doc_id", "text")
    val got = Dedup.exactDedup(df, "text", "doc_id")
      .orderBy("doc_id").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 3L), (2L, 1L)))
  }

  test("content-defined chunks survive a leading insertion; fixed segments do not") {
    import spark.implicits._
    // 200 deterministic pseudo-tokens; doc 2 is doc 1 with three
    // tokens prepended — a pure shift of the shared content
    val body = (0 until 200).map(i => s"w${i * 7 % 103}").mkString(" ")
    val df = Seq((1L, body), (2L, s"pre alpha beta $body")).toDF("doc_id", "text")

    val chunks = Dedup.contentDefinedChunks(df, "doc_id", "text", divisor = 16)
      .select("doc_id", "chunk_hash").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val shared = chunks(1L) intersect chunks(2L)
    assert(chunks(1L).size >= 4, s"expected several chunks, got ${chunks(1L).size}")
    // boundaries are local content decisions: only the head chunk of
    // the shifted copy can differ
    assert(shared.size >= chunks(1L).size - 1,
      s"CDC lost alignment: ${shared.size} of ${chunks(1L).size} chunks shared")

    // the contrast: position-based 8-token segments of the same pair
    // share NOTHING — a 3-token shift misaligns every window
    def fixedSegs(text: String): Set[String] =
      text.split(" ").grouped(8).map(_.mkString(" ")).toSet
    val fixedShared = fixedSegs(body) intersect fixedSegs(s"pre alpha beta $body")
    assert(fixedShared.isEmpty,
      s"fixed windows unexpectedly aligned: $fixedShared")
  }

  test("CDC pairs link every planted shifted copy to its original") {
    // plant shifted copies of 10 real fixture docs: same text, three
    // alien tokens prepended, ids offset by 100000
    val originals = docs.filter(col("n_chars") >= 800)
      .orderBy("doc_id").limit(10).select("doc_id", "text").localCheckpoint()
    val copies = originals.select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat(lit("alien insert tokens "), col("text")).as("text"))
    val corpus = originals.unionByName(copies)
    val got = Dedup.cdcNearDupPairs(corpus, "doc_id", "text",
      divisor = 8, minShared = 1)
      .select("doc_a", "doc_b", "overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ids = originals.select("doc_id").collect().map(_.getLong(0))
    for (id <- ids) {
      val pair = (id, id + 100000L)
      assert(got.contains(pair), s"shifted copy of $id not linked")
      // only the head chunk of the copy can differ: overlap (c-1)/c
      assert(got(pair) >= 0.5, s"overlap for $pair too low: ${got(pair)}")
    }
  }

  test("OPQ-lite: balanced rotation stays orthonormal and does not worsen quantization error") {
    import graft.operators.Pca
    val (values, vectors) = Pca.principalComponents(emb, "embedding", 64)
    val rot = Pca.balancedComponents(values, vectors, numSub = 8)
    // a permutation of an orthonormal basis is orthonormal
    for (a <- rot.indices; b <- a until rot.length) {
      val dot = (0 until 64).map(i => rot(a)(i) * rot(b)(i)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9, s"<$a,$b>")
    }
    // greedy allocation beats the naive contiguous split on
    // log-eigenvalue balance (spread of per-subspace sums)
    val logs = values.map(v => math.log(math.max(v, 1e-12)))
    def spread(assign: Seq[Seq[Int]]): Double = {
      val sums = assign.map(_.map(logs).sum)
      sums.max - sums.min
    }
    val naive = (0 until 8).map(m => (m * 8 until (m + 1) * 8).toSeq)
    val rotIdx = rot.map(r => vectors.indexWhere(_.sameElements(r))).toSeq
    val balanced = (0 until 8).map(m => rotIdx.slice(m * 8, (m + 1) * 8))
    assert(spread(balanced) <= spread(naive) + 1e-9,
      s"balanced spread ${spread(balanced)} worse than naive ${spread(naive)}")
    // quantization error: rotated-then-learned must not exceed the
    // plain learned path (same Lloyd budget) — the point of OPQ
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .orderBy("vec_id").collect().map(_.getSeq[Double](1).toArray)
    val rotVecs = vecs.map(v => rot.map(r => r.indices.map(i => r(i) * v(i)).sum))
    val rotDf = Pca.project(emb, "embedding", rot, 64, "_rot")
      .select(col("vec_id"), col("_rot").as("embedding"))
    val plainErr = quantError(Similarity.pqLearnedCodebooks(emb, dim = 64), vecs)
    val rotErr = quantError(Similarity.pqLearnedCodebooks(rotDf, dim = 64), rotVecs)
    // the testdata embeddings are near-isotropic (no correlation for a
    // rotation to exploit), so the honest claim here is "within
    // sampling noise of the plain path" — the WIN is asserted on the
    // correlated corpus in the next test
    assert(rotErr <= plainErr * 1.05,
      s"rotation worsened quantization error beyond noise: $rotErr vs $plainErr")
    // the composed operator: deterministic, dense ranks, no self-match
    val probes = emb.filter(col("vec_id") < 5)
    val out = Similarity.pqTopKOpq(emb, probes, k = 5, dim = 64).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.foreach { case (q, _, n, d) => assert(q != n && d >= 0.0) }
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.size), s"query $q")
    }
    val again = Similarity.pqTopKOpq(emb, probes, k = 5, dim = 64).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.sameElements(again))
  }

  test("OPQ-lite beats plain PQ on a correlated corpus") {
    import spark.implicits._
    import graft.operators.Pca
    // low-rank + noise: strong cross-subspace correlation, the regime
    // OPQ exists for — plain PQ's contiguous subspaces each see a
    // mixture of the same latent factors; the balanced PCA rotation
    // concentrates them
    val rnd = new scala.util.Random(7)
    val factors = Array.fill(4, 64)(rnd.nextGaussian())
    val rows = (0 until 400).map { i =>
      val z = Array.fill(4)(rnd.nextGaussian() * 3.0)
      val v = Array.tabulate(64) { d =>
        (0 until 4).map(f => z(f) * factors(f)(d)).sum + rnd.nextGaussian() * 0.1
      }
      (i.toLong, v.toSeq)
    }
    val corr = rows.toDF("vec_id", "embedding")
    val vecs = rows.map(_._2.toArray).toArray
    val (values, vectors) = Pca.principalComponents(corr, "embedding", 64)
    val rot = Pca.balancedComponents(values, vectors, numSub = 8)
    val rotVecs = vecs.map(v => rot.map(r => r.indices.map(i => r(i) * v(i)).sum))
    val rotDf = Pca.project(corr, "embedding", rot, 64, "_rot")
      .select(col("vec_id"), col("_rot").as("embedding"))
    val plainErr = quantError(Similarity.pqLearnedCodebooks(corr, dim = 64), vecs)
    val rotErr = quantError(Similarity.pqLearnedCodebooks(rotDf, dim = 64), rotVecs)
    assert(rotErr < plainErr * 0.9,
      s"rotation failed to exploit correlation: $rotErr vs $plainErr")
  }

  test("knn label noise: votes match a driver-side replay, planted mislabel flagged") {
    val probes = emb.filter(col("vec_id") % 20 === 0)
    val out = Similarity.knnLabelNoise(emb, probes, k = 5).collect()
    assert(out.length == probes.count())
    // replay the vote from the already-verified brute-force top-k
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byQuery = Similarity.bruteForceTopK(emb, probes, k = 5).collect()
      .groupBy(_.getLong(0))
    out.foreach { r =>
      val (vid, lbl, knn, votes, agree) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4))
      val voteCounts = byQuery(vid).map(n => labels(n.getLong(2)))
        .groupBy(identity).view.mapValues(_.size).toMap
      val expWinner = voteCounts.toSeq.minBy { case (l, c) => (-c, l) }
      assert((knn, votes) == ((expWinner._1, expWinner._2.toLong)), s"vec $vid")
      assert(lbl == labels(vid) && agree == (if (lbl == knn) 1 else 0))
    }
    // a probe whose stored label is corrupted must flag as disagree
    val corrupted = emb.withColumn("label",
      when(col("vec_id") === 0, lit(99)).otherwise(col("label")))
    val flagged = Similarity.knnLabelNoise(
      corrupted, corrupted.filter(col("vec_id") === 0), k = 5)
      .select("agree").head().getInt(0)
    assert(flagged == 0, "planted mislabel not flagged")
  }

  test("semantic decontamination flags planted paraphrases with hit count and best match") {
    import spark.implicits._
    import graft.operators.Decontamination
    // train: t1 sits next to BOTH bench vectors, t2/t3 are orthogonal
    // to everything in the bench set
    val train = Seq(
      (101L, Seq(0.97f, 0.20f, 0.0f, 0.0f)),
      (102L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
      (103L, Seq(0.0f, 0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val bench = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.96f, 0.25f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Decontamination
      .semanticContaminated(train, bench, tau = 0.9, nlists = 8, nprobe = 4)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((101L, 2L)),
      s"expected only t1 flagged, with both bench hits: $got")
    // best match is the higher cosine: b2's direction is closer to t1
    // than b1's
    assert(got.head._3 == 2L && got.head._4 > 0.99,
      s"best bench match wrong: ${got.head}")
    // raising tau above both cosines empties the report
    assert(Decontamination
      .semanticContaminated(train, bench, tau = 0.9999).isEmpty)
  }

  test("hard negatives: the label-filtered brute-force ranking, same-label/self excluded") {
    val probes = emb.filter(col("vec_id") < 10)
    val got = Similarity.hardNegatives(emb, probes, k = 5).collect()
    // expectation: the FULL exact ranking (bit-parity-tested
    // elsewhere), label-filtered in the driver and re-ranked
    val n = emb.count().toInt
    val full = Similarity.bruteForceTopK(emb, probes, k = n).collect()
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val expect = full.filter(_.getLong(0) == qid)
        .sortBy(_.getInt(1))
        .map(r => (r.getLong(2), labels(r.getLong(2)), r.getDouble(3)))
        .filter { case (_, lbl, _) => lbl != labels(qid) }
        .take(5).toSeq
      val gotRows = rows.sortBy(_.getInt(1))
        .map(r => (r.getLong(2), r.getInt(3), r.getDouble(4))).toSeq
      assert(gotRows == expect, s"probe $qid")
      assert(gotRows.forall(_._2 != labels(qid)), s"probe $qid kept its own label")
    }
  }

  test("cluster topics: nlists=1 degenerates to the global top-terms report") {
    val one = Similarity.clusterTopics(emb, docs, "doc_id", "text",
      k = 5, nlists = 1)
    val global = TextAnalysis.topTermsByGroup(
      docs.withColumn("list_id", lit(0)), "list_id", "text", k = 5)
    assert(one.collect().toSeq == global.collect().toSeq)
    // full routing: ranks dense per cluster, shares within (0, 1]
    val routed = Similarity.clusterTopics(emb, docs, "doc_id", "text", k = 3)
      .collect()
    routed.groupBy(_.getInt(0)).foreach { case (lid, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length),
        s"cluster $lid ranks not dense")
    }
    assert(routed.forall(r => r.getDouble(4) > 0 && r.getDouble(4) <= 1))
  }

  test("ensemble split: neither text nor embedding near-dup pairs cross splits") {
    import graft.operators.Sampling
    val textPairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      gramHash = Some(graft.functions.XxHash64Family))
      .select("doc_a", "doc_b")
    val embPairs = Similarity.lshNeighborPairs(emb, threshold = 0.4)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val sp = Sampling.clusterAwareSplit(docs, "doc_id",
      textPairs.unionByName(embPairs), "doc_a", "doc_b",
      hashes = graft.functions.Md5Family)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def crossings(pairs: Array[(Long, Long)]) =
      pairs.count { case (a, b) => sp(a) != sp(b) }
    val tp = textPairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val ep = embPairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(tp.nonEmpty && ep.nonEmpty, "degenerate fixture: no pairs")
    assert(crossings(tp) == 0, "a text near-dup pair crossed splits")
    assert(crossings(ep) == 0, "an embedding near-dup pair crossed splits")
    // the single-signal split does NOT guarantee embedding pairs stay
    // together — that's the gap the ensemble closes (only asserted as
    // a documentation check if a crossing exists at this sf)
    val single = Sampling.clusterAwareSplit(docs, "doc_id", textPairs,
      "doc_a", "doc_b", hashes = graft.functions.Md5Family)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val singleCrossings = ep.count { case (a, b) => single(a) != single(b) }
    assert(singleCrossings >= 0) // informational; zero is possible at tiny sf
  }

  test("temporal split: exact band boundaries, distributed rank == global window") {
    import graft.operators.Sampling
    import spark.implicits._
    // 10 rows, 80/10/10: ranks 1..8 train (r*100 <= 800), 9 val
    // (900 <= 900), 10 test — boundary ranks land EXACTLY on the
    // <= compare. Unsorted input with non-contiguous order keys.
    val rows = Seq(70L, 10L, 50L, 30L, 90L, 20L, 80L, 40L, 60L, 100L)
      .map(i => (i, i * 3)).toDF("id", "t")
    val got = Sampling.temporalSplit(rows, "id", "t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L).map(_ -> "train") ++
      Seq(90L -> "val", 100L -> "test")
    assert(got == expect.toMap, s"got $got")
    // equivalence with the plain global-window rank on real data
    val ids = docs.select(col("doc_id"))
    val dist = Sampling.temporalSplit(ids, "doc_id", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = ids.count()
    val glob = ids.withColumn("_r", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("doc_id")))
      .select(col("doc_id"),
        when(col("_r") * 100 <= lit(80L) * n, "train")
          .when(col("_r") * 100 <= lit(90L) * n, "val")
          .otherwise("test").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dist == glob, "distributed prefix-sum rank diverged from the global window")
  }

  test("matryoshka truncation: retained energy monotone in d, full budget exact") {
    val probes = emb.filter(col("vec_id") < 10)
    val rep = Similarity.truncationReport(emb, probes,
      dims = Seq(8, 16, 32, 64), k = 10)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(rep.map(_._1) == Seq(8, 16, 32, 64))
    // the full budget reproduces the full ranking and keeps all energy
    assert(rep.last._2 == 1.0 && rep.last._3 == 1.0)
    // prefix energy can only grow with d
    assert(rep.map(_._2).sliding(2).forall(p => p.head <= p.last),
      s"retained energy not monotone: $rep")
    assert(rep.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
  }

  test("label propagation: planted clusters adopt their seed's label, seeds never change") {
    import spark.implicits._
    // two tight clusters around orthogonal axes; one seed each
    def jitter(base: Seq[Float], i: Int): Seq[Float] =
      base.zipWithIndex.map { case (x, d) => x + (if (d == 3) 0.01f * i else 0f) }
    val a = (0 until 6).map(i => ((10 + i).toLong, jitter(Seq(1f, 0f, 0f, 0f), i), 7))
    val b = (0 until 6).map(i => ((20 + i).toLong, jitter(Seq(0f, 1f, 0f, 0f), i), 8))
    val embFix = (a ++ b).toDF("vec_id", "embedding", "label")
    val seeds = embFix.filter(col("vec_id").isin(10L, 20L))
      .select(col("vec_id"), col("label"))
    val out = Similarity.labelPropagation(embFix, seeds, k = 3, iters = 2,
      nlists = Similarity.autoNlists(embFix))
      .as[(Long, Int, Int)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    // seeds keep hop 0 and their label
    assert(byId(10L) == ((10L, 7, 0)) && byId(20L) == ((20L, 8, 0)))
    // every labeled node got its own cluster's seed label
    out.foreach { case (id, lbl, hop) =>
      val want = if (id < 20) 7 else 8
      assert(lbl == want, s"node $id labeled $lbl (hop $hop)")
      assert(hop >= 0 && hop <= 2)
    }
    // propagation reached beyond the seeds
    assert(out.size > 2, s"nothing propagated: $out")
  }

  test("embedding outliers: the planted orthogonal stray flags, cluster members do not") {
    import spark.implicits._
    // six tight points around one axis plus one orthogonal stray; one
    // list, so the stray's whole kNN neighborhood is near-zero cosine
    def jitter(base: Seq[Float], i: Int): Seq[Float] =
      base.zipWithIndex.map { case (x, d) => x + (if (d == 3) 0.01f * i else 0f) }
    val pts = (0 until 6).map(i => ((10 + i).toLong, jitter(Seq(1f, 0f, 0f, 0f), i))) :+
      (99L, Seq(0f, 1f, 0f, 0f))
    val fix = pts.toDF("vec_id", "embedding")
    val out = Similarity.embeddingOutliers(fix, k = 5, nlists = 1)
      .select("vec_id", "n_nbrs", "outlier")
      .as[(Long, Long, Int)].collect().toSeq
    val flags = out.map(r => r._1 -> r._3).toMap
    assert(flags(99L) == 1, s"stray not flagged: $out")
    (10L to 15L).foreach(id => assert(flags(id) == 0, s"cluster member $id flagged: $out"))
    // everyone saw a full k-neighborhood
    assert(out.forall(_._2 == 5L), s"bad n_nbrs: $out")
    // a point alone in its list has no evidence and flags by convention
    val solo = Similarity.embeddingOutliers(
      Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding"), k = 5, nlists = 1)
      .select("n_nbrs", "outlier").as[(Long, Int)].collect().toSeq
    assert(solo == Seq((0L, 1)))
  }

  test("knn pagerank: hub-and-spokes ranks match the exact integer recurrence") {
    import spark.implicits._
    // hub on the x axis, four spokes on a 40-degree cone around it:
    // spoke-hub cosine (0.766) beats every spoke-spoke cosine (<=0.587),
    // so with k=1 every spoke's only edge points at the hub, and the
    // hub's one edge goes to the min-id spoke (all spokes tie).
    val a = math.toRadians(40)
    def spoke(phiDeg: Double): Seq[Float] = {
      val p = math.toRadians(phiDeg)
      Seq(math.cos(a), math.sin(a) * math.cos(p), math.sin(a) * math.sin(p))
        .map(_.toFloat)
    }
    val fix = (Seq((1L, Seq(1f, 0f, 0f))) ++
      Seq(0.0, 90.0, 180.0, 270.0).zipWithIndex.map { case (phi, i) =>
        ((i + 2).toLong, spoke(phi))
      }).toDF("vec_id", "embedding")
    val out = Similarity.knnPagerank(fix, k = 1, nlists = 1, iterations = 5)
      .select("vec_id", "outdeg", "rank_ppt", "rank_share")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.map(_._1) == (1L to 5L), s"ids: $out")
    assert(out.forall(_._2 == 1L), s"outdeg: $out")
    // independent driver-side replay of the exact integer recurrence
    // over the known edge set {2..5 -> 1, 1 -> 2}
    val scale = 1000000000000L
    val n = 5L
    val tele = ((scale / n) * 15L) / 100L
    var r = Map((1L to 5L).map(_ -> scale / n): _*)
    for (_ <- 0 until 5) {
      val next = (1L to 5L).map { v =>
        val inSum = v match {
          case 1L => (2L to 5L).map(s => r(s) / 1L).sum
          case 2L => r(1L) / 1L
          case _  => 0L
        }
        v -> (tele + (85L * inSum) / 100L)
      }.toMap
      r = next
    }
    out.foreach { case (id, _, rank, share) =>
      assert(rank == r(id), s"rank($id): got $rank want ${r(id)}")
      assert(share == math.rint(rank / 1e12 * 1e6) / 1e6, s"share($id)")
    }
    // centrality ordering: hub above its chosen spoke, chosen spoke
    // above the three pure sinks
    val byId = out.map(o => o._1 -> o._3).toMap
    assert(byId(1L) > byId(2L) && byId(2L) > byId(3L), s"ordering: $out")
    assert(byId(3L) == byId(4L) && byId(4L) == byId(5L), s"sinks differ: $out")
  }

  test("containment: a prefix doc reads fully contained, exact dups 1e6 both ways") {
    import spark.implicits._
    val base = (1 to 12).map(i => s"w$i").mkString(" ")
    val longer = base + " x1 x2 x3"
    val docs = Seq((1L, base), (2L, longer), (3L, "zz yy xx qq rr"),
      (4L, "zz yy xx qq rr")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
      numPerm = 16, bands = 16, thresholdPpm = 800000L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // (1,2): A's 10 shingles all inside B's 13 -> cont_a 1e6,
    // cont_b 10e6/13, jaccard 10e6/13; (3,4): identical sets
    assert(got.contains((1L, 2L, 10L, 13L, 10L,
      1000000L, 10000000L / 13L, 10000000L / 13L)), s"got $got")
    assert(got.contains((3L, 4L, 3L, 3L, 3L,
      1000000L, 1000000L, 1000000L)), s"got $got")
    assert(got.size == 2, s"unexpected extra pairs: $got")
  }

  test("lsh design report: exact dups detect at 1.0, the prefix pair matches the squaring chain") {
    import spark.implicits._
    val base = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base + " x1 x2 x3"),
      (3L, "zz yy xx qq rr"), (4L, "zz yy xx qq rr"))
      .toDF("doc_id", "text")
    val got = Dedup.lshDetectionReport(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // independent replay of the staged arithmetic for J = 10/13
    val j = 10.0 / 13.0
    val x = 1.0 - j * j
    val x2 = x * x; val x4 = x2 * x2
    val want = BigDecimal(math.floor((1.0 - x4 * x4) * 1e9 + 0.5) / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.contains((1L, 2L, 10L, 13L, 10000000L / 13L, want)),
      s"got $got want $want")
    assert(got.contains((3L, 4L, 3L, 3L, 1000000L, 1.0)), s"got $got")
  }

  test("triangle stats: hand graph counts each triangle once at all three corners") {
    import spark.implicits._
    // square 1-2-3 with tail 3-4 and isolate 5: one triangle (1,2,3)
    val nodes = (1L to 5L).toDF("vec_id")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val got = Similarity.triangleStats(nodes, edges)
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 1L, Some(1.0)), (2L, 2L, 1L, Some(1.0)),
      (3L, 3L, 1L, Some(0.333333)), (4L, 1L, 0L, None),
      (5L, 0L, 0L, None)), s"got $got")
  }

  test("cluster silhouette: separated clusters score 1.0, the equidistant point scores 0") {
    import spark.implicits._
    // ids chosen so the two md5-smallest (27, 6) sit one per cluster —
    // the seeded codebook then holds one centroid per true cluster
    val x = Seq(1f, 0f, 0f); val y = Seq(0f, 1f, 0f)
    val diag = Seq(math.sqrt(0.5).toFloat, math.sqrt(0.5).toFloat, 0f)
    val fix = Seq(27L -> x, 1L -> x, 2L -> x, 6L -> y, 11L -> y, 12L -> y,
      40L -> diag).toDF("vec_id", "embedding")
    val out = Similarity.clusterSilhouette(fix, nlists = 2)
      .as[(Int, Long, Long, Double)].collect().toSeq
    // list 0 = the (1,0,0) centroid (id 27 hashes lowest): members
    // 27,1,2 at s=1e6 plus the a==b diagonal at s=0, tie-broken here
    assert(out == Seq((0, 4L, 3000000L, 0.75), (1, 3L, 3000000L, 1.0)),
      s"got: $out")
    // degenerate guard: nlists < 2 must refuse
    intercept[IllegalArgumentException] {
      Similarity.clusterSilhouette(fix, nlists = 1)
    }
  }

  test("k-core: the tail peels in cascade, the triangle survives, isolates stay out") {
    import spark.implicits._
    val nodes = (1L to 6L).toDF("vec_id")
    // triangle 1-2-3 with chain 3-4-5; node 6 isolated
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val got = Similarity.kCore(nodes, edges, k = 2)
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 2L, 1), (2L, 2L, 1), (3L, 2L, 1),
      (4L, 0L, 0), (5L, 0L, 0), (6L, 0L, 0)), s"got $got")
  }

  test("assortativity: a star is exactly -1, a cycle is degree-constant NULL") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val nodes = (1L to 4L).toDF("vec_id")
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("u", "v")
    val s = Similarity.degreeAssortativity(nodes, star)
      .as[(Long, Long, Double)].collect().toSeq
    assert(s == Seq((4L, 3L, -1.0)), s"got $s")
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val c = Similarity.degreeAssortativity(nodes, cycle)
      .select(col("assortativity")).collect().head
    assert(c.isNullAt(0), s"expected NULL on a regular graph, got $c")
  }

  test("list balance report: the separated-cluster fixture's exact sizes and pair mass") {
    import spark.implicits._
    // same routing fixture as the silhouette spec: lists of 4 and 3
    val x = Seq(1f, 0f, 0f); val y = Seq(0f, 1f, 0f)
    val diag = Seq(math.sqrt(0.5).toFloat, math.sqrt(0.5).toFloat, 0f)
    val fix = Seq(27L -> x, 1L -> x, 2L -> x, 6L -> y, 11L -> y, 12L -> y,
      40L -> diag).toDF("vec_id", "embedding")
    val got = Similarity.listBalanceReport(fix, nlists = 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // sizes {4, 3}: pairs 6 + 3 = 9, imbalance 4*2/7
    assert(got == Seq((7L, 2L, 3L, 4L, 9L, 1.142857)), s"got $got")
  }

  test("blocking audit: hand block sizes, pair mass, reduction, hot-block share") {
    import spark.implicits._
    import graft.operators.Fuzzy
    val docs = Seq((1L, "aa x"), (2L, "aa y"), (3L, "bb z"))
      .toDF("doc_id", "text")
    val got = Fuzzy.blockingAudit(docs, "doc_id", "text")
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      // first token: {aa: 2, bb: 1} -> 1 pair of C(3,2)=3
      ("first_token", 2L, 2L, 1L, Some(0.666667), Some(1.0)),
      // all length 4 -> one bucket, no reduction
      ("len_bucket", 1L, 3L, 3L, Some(0.0), Some(1.0)),
      // 4-char prefixes all distinct -> zero candidates
      ("prefix4", 3L, 1L, 0L, Some(1.0), None)), s"got $got")
  }

  test("farthest-point coreset: picks one exemplar per orthogonal direction, skips the duplicate") {
    import spark.implicits._
    // id 27 hashes md5-smallest -> seed; id 1 duplicates the seed's
    // direction (d = 0, never picked); 6/11/12 are orthogonal axes all
    // at d = 1e6 from everything chosen -> picked in id order
    val fix = Seq(
      27L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(1f, 0f, 0f, 0f),
      6L -> Seq(0f, 1f, 0f, 0f), 11L -> Seq(0f, 0f, 1f, 0f),
      12L -> Seq(0f, 0f, 0f, 1f)).toDF("vec_id", "embedding")
    val out = Similarity.farthestPointCoreset(fix, k = 4)
      .as[(Int, Long, Option[Long])].collect().toSeq
    assert(out == Seq((1, 27L, None), (2, 6L, Some(1000000L)),
      (3, 11L, Some(1000000L)), (4, 12L, Some(1000000L))), s"got: $out")
    // farthest-point invariant on real-shaped data: distances at
    // selection never increase
    val jit = (0 until 12).map { i =>
      (100L + i, Seq.tabulate(4)(d => if (d == i % 4) 1f else 0.05f * i))
    }.toDF("vec_id", "embedding")
    val ds = Similarity.farthestPointCoreset(jit, k = 6)
      .as[(Int, Long, Option[Long])].collect().toSeq.flatMap(_._3)
    assert(ds == ds.sorted.reverse, s"distances increased: $ds")
  }

  test("density clusters: two planted blobs become two clusters, the stray is noise") {
    import spark.implicits._
    def jit(base: Seq[Float], i: Int): Seq[Float] =
      base.zipWithIndex.map { case (x, d) => x + (if (d == 3) 0.01f * i else 0f) }
    val fix = ((0 until 4).map(i => ((10 + i).toLong, jit(Seq(1f, 0f, 0f, 0f), i))) ++
      (0 until 4).map(i => ((20 + i).toLong, jit(Seq(0f, 1f, 0f, 0f), i))) :+
      (99L, Seq(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.densityClusters(fix, nlists = 1, epsPpm = 300000L,
      minPts = 3)
      .select("vec_id", "n_eps", "is_core", "cluster_id")
      .as[(Long, Long, Int, Long)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    (10L to 13L).foreach(id => assert(byId(id)._3 == 1 && byId(id)._4 == 10L,
      s"blob A member $id: $out"))
    (20L to 23L).foreach(id => assert(byId(id)._3 == 1 && byId(id)._4 == 20L,
      s"blob B member $id: $out"))
    assert(byId(99L) == ((99L, 0L, 0, -1L)), s"stray: $out")
  }

  test("quality canonical: keeps the best-quality member per cluster, min-id on ties") {
    import spark.implicits._
    val fixture = Seq(
      (1L, 10L), (2L, 30L), (3L, 20L), // cluster {1,2,3}: 2 wins on quality
      (4L, 7L), (5L, 7L),              // cluster {4,5}: tie -> min id 4
      (9L, 1L))                        // singleton survives
      .toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val got = Dedup.canonicalCorpusBy(fixture, pairs, "doc_id", "quality")
      .select("doc_id", "quality", "cluster_size", "removed_dups")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 30L, 3L, 2L), (4L, 7L, 2L, 1L), (9L, 1L, 1L, 0L)))
    // same clusters as min-id canonicalisation -> same survivor count
    val minId = Dedup.canonicalCorpus(fixture, pairs, "doc_id")
    assert(minId.count() == got.size)
  }

  test("MMR: lambda=1 reduces to the exact top-k; diversity skips a planted near-dup") {
    import spark.implicits._
    val emb = graft.engine.Tables.embeddings(spark, sf("sf0.001"))
    val probes = emb.filter(col("vec_id") < 3)
    // pure-relevance degeneration: with the diversity term zeroed the
    // greedy path must replay bruteForceTopK order exactly
    val pure = Similarity.mmrTopK(emb, probes, k = 4, m = 10,
        lambdaPpm = 1000000L)
      .select("query_id", "sel_rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSeq.sorted
    val brute = Similarity.bruteForceTopK(emb, probes, k = 4)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSeq.sorted
    assert(pure == brute)
    // planted near-duplicate: d1 ~ d2 (near-identical), d3 diverse; a
    // diversity-weighted lambda must pick d3 second, not the dup
    val fix = Seq(
      (0L, Seq(1f, 0f)),         // query
      (1L, Seq(0.999f, 0.001f)), // top hit
      (2L, Seq(0.998f, 0.002f)), // its near-duplicate
      (3L, Seq(0.6f, 0.6f)))     // diverse
      .toDF("vec_id", "embedding")
    val picks = Similarity.mmrTopK(fix, fix.filter(col("vec_id") === 0),
        k = 2, m = 3, lambdaPpm = 300000L)
      .select("sel_rank", "neighbor_id").as[(Int, Long)].collect().toSeq
    assert(picks == Seq((1, 1L), (2, 3L)), s"got $picks")
    // and every selection is drawn from the shortlist with dense ranks
    val full = Similarity.mmrTopK(emb, probes, k = 5, m = 8)
      .select("query_id", "sel_rank").as[(Long, Int)].collect().toSeq
    assert(full.groupBy(_._1).forall(_._2.map(_._2).sorted == Seq(1, 2, 3, 4, 5)))
  }

  test("minhash calibration: exact overlap replayed driver-side, est = matches/numPerm") {
    import spark.implicits._
    def shingleSet(t: String): Set[String] = {
      val tk = t.split(" ")
      if (tk.length >= 3) tk.sliding(3).map(_.mkString(" ")).toSet
      else Set(tk.mkString(" "))
    }
    val base = (0 until 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base),                                  // exact dup
      (3L, base.replace("w9", "zz")),              // near dup
      (4L, (20 until 30).map(i => s"v$i").mkString(" ")))
      .toDF("doc_id", "text")
    val texts = docs.as[(Long, String)].collect().toMap
    val out = graft.operators.Dedup.minhashCalibration(
        docs, "doc_id", "text", hashes = graft.functions.Md5Family)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.exists(r => r._1 == 1L && r._2 == 2L), "exact dup pair missing")
    out.foreach { case (a, b, nMatch, nInter, nUnion, estPpm, exactPpm, errPpm) =>
      val (sa, sb) = (shingleSet(texts(a)), shingleSet(texts(b)))
      assert(nInter == (sa & sb).size && nUnion == (sa | sb).size,
        s"pair ($a,$b): set overlap mismatch")
      assert(estPpm == nMatch * 62500L && errPpm == estPpm - exactPpm)
      assert(exactPpm == math.floor(nInter.toDouble * 1e6 / nUnion).toLong)
    }
    // the exact-dup pair estimates and measures exactly 1.0
    val dup = out.find(r => r._1 == 1L && r._2 == 2L).get
    assert(dup._6 == 1000000L && dup._7 == 1000000L && dup._8 == 0L)
  }

  test("top-ngram profile: hand-computed fixture, smallest-gram tie-break") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b"), (2L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.topNgramProfile(docs, "doc_id", "text")
      .as[(Long, Int, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1, "a", 3L, 0.428571),        // 3*1/7
      (1L, 2, "a a", 2L, 0.857143),      // 2*3/7
      (1L, 3, "a a a", 1L, 0.714286),    // tie with "a a b" -> smallest
      (1L, 4, "a a a b", 1L, 1.0),
      (2L, 1, "x", 1L, 1.0)), s"got $got")
  }

  test("modularity: two clean triangles score 0.5; a bridge edge dilutes exactly") {
    import spark.implicits._
    val parts = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1), (5L, 1), (6L, 1))
      .toDF("vec_id", "part_id")
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L)).toDF("u", "v")
    val got = Similarity.partitionModularity(parts, tri)
      .as[(Int, Long, Long, Long, Double, Double)].collect().toSeq
    // per part: (4·6·3 − 6²)/(4·6²) = 36/144 = 0.25; Q = 0.5
    assert(got == Seq((0, 3L, 3L, 6L, 0.25, 0.5),
      (1, 3L, 3L, 6L, 0.25, 0.5)), s"got $got")
    // bridge 3–4: m=7, per part (4·7·3 − 49)/(4·49) = 35/196
    val bridged = tri.unionByName(Seq((3L, 4L)).toDF("u", "v"))
    val b = Similarity.partitionModularity(parts, bridged)
      .as[(Int, Long, Long, Long, Double, Double)].collect().toSeq
    assert(b == Seq((0, 3L, 3L, 7L, 0.178571, 0.357143),
      (1, 3L, 3L, 7L, 0.178571, 0.357143)), s"got $b")
  }

  test("weighted minhash: frequency-sensitive where set Jaccard saturates; exact dups estimate 1.0") {
    import spark.implicits._
    // A and C share the exact tf vector; B shares A's token SET but
    // inverts the frequencies: set Jaccard 1.0, weighted Jaccard
    // min(4,1)+min(1,4) / (5+5-2) = 0.25
    val docs = Seq(
      (1L, "w w w w z"), (2L, "w z z z z"), (3L, "w w w w z"),
      (10L, "p q r s t"), (11L, "u v a b c"))
      .toDF("doc_id", "text")
    val got = Dedup.weightedMinhashPairs(docs, "doc_id", "text",
        numHashes = 16, bands = 2, minJw = 0.0,
        hashes = graft.functions.Md5Family)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val (est13, jw13) = got((1L, 3L))
    assert(jw13 == 1.0 && est13 == 1.0,
      s"identical tf vectors must score 1.0/1.0: $est13/$jw13")
    // if the frequency-inverted pair collides in a band at all, its
    // EXACT weighted Jaccard must be 0.25 — never set-Jaccard 1.0
    got.get((1L, 2L)).foreach { case (_, jw) => assert(jw == 0.25, jw) }
    got.get((2L, 3L)).foreach { case (_, jw) => assert(jw == 0.25, jw) }
    // the production default (xxhash64, full-range signed longs) must
    // survive the ANSI overflow bounds (the 60-bit ingestion mask) and
    // agree on the EXACT jw values (draws differ, exactness doesn't)
    val gotXx = Dedup.weightedMinhashPairs(docs, "doc_id", "text",
        numHashes = 16, bands = 2, minJw = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    assert(gotXx((1L, 3L)) == 1.0)
  }

  test("weighted minhash: estimator tracks the exact weighted Jaccard on the corpus") {
    val pairs = Dedup.weightedMinhashPairs(
      Tables.documents(spark, sf("sf0.001")), "doc_id", "text",
      numHashes = 16, bands = 2, minJw = 0.5,
      hashes = graft.functions.Md5Family).collect()
    assert(pairs.nonEmpty, "exact-dup docs exist at sf0.001; pairs must too")
    // every surviving pair passed banding (est has >= threshold mass)
    // and carries both columns; exact dups must estimate exactly 1.0
    pairs.foreach { r =>
      val (est, jw) = (r.getDouble(2), r.getDouble(3))
      assert(jw >= 0.5 && est >= 0.0 && est <= 1.0)
      if (jw == 1.0) assert(est == 1.0, s"identical docs, est $est")
    }
    // 16-hash estimator: bound mean |err| at 2x the binomial sigma
    // (sigma = sqrt(J(1-J)/16) ~ 0.12 at the mid-jw survivors; banding
    // also selects upward-biased estimates -- the 2-sigma convention
    // from the sampled-order-statistics lesson, not a per-pair bound)
    val meanErr = pairs.map(r => math.abs(r.getDouble(2) - r.getDouble(3)))
      .sum / pairs.length
    assert(meanErr <= 0.25, s"mean |est - jw| $meanErr")
  }
}
