package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.functions.VectorExpressions.cosineFast

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the scale design in SURVEY.md:
  *  - `bruteForceTopK`: exact top-k for a small probe set. The probes
  *    are broadcast (`broadcast()` hint) so the corpus never shuffles
  *    for the join; the per-query ranking shuffles only nProbes × N
  *    scored rows, partitioned by query — at 100 TB with a bounded
  *    probe set this is a single map-side pass over the corpus plus a
  *    top-k per query (AQE coalesces the tiny ranking shuffle).
  *  - `lshNeighborPairs`: the all-pairs scale path. Random-hyperplane
  *    LSH (deterministic seed) buckets vectors by sign bits; only
  *    within-bucket candidate pairs are scored exactly. O(n²) becomes
  *    O(Σ bucket²) and the bucket join is a shuffle on the signature —
  *    the classic SimHash/LSH trade: recall < 1 for pairs straddling a
  *    hyperplane (tested against the exact path in SimilaritySpec).
  */
object Similarity {
  /** Exact cosine top-k: for each probe vector, the k nearest corpus
    * vectors (self excluded).
    * Output: query_id, rank, neighbor_id, cosine (rounded 6dp).
    *
    * Ranking orders on the ROUNDED cosine (6dp, neighbor_id tie-break):
    * two candidates whose cosines differ below cross-engine float noise
    * would otherwise swap ranks between Spark and the oracle engine.
    */
  def bruteForceTopK(embeddings: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val corpus = embeddings.select(
      col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("c_emb"))
    val q = probes.select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("q_emb"))
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        round(cosineFast(embeddings.sparkSession)(col("q_emb"), col("c_emb")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  /** kNN label-noise detection (Wilson's editing, 1972): each probe's
    * k nearest corpus neighbors (exact cosine, self excluded) vote on
    * its label; a majority disagreeing with the stored label flags a
    * probable mislabel — the embedding-space consistency check a
    * labeled training set gets before the labels are trusted.
    *
    * Vote tie-break is deterministic: highest count, then SMALLEST
    * label. Scale shape: the scored candidate set is |probes|·k rows —
    * that probe-bounded frame broadcasts into the label join, the
    * corpus-wide label table never shuffles and is never broadcast.
    *
    * Output per probe, ordered by vec_id: (vec_id, label, knn_label,
    * n_votes, agree 0/1).
    */
  def knnLabelNoise(embeddings: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    // localCheckpoint before broadcast: the broadcast side must be the
    // materialized probe-bounded artifact, never a plan that re-scans
    // the corpus under a BroadcastExchange (q102 regression class).
    val top = bruteForceTopK(embeddings, probes, k).localCheckpoint()
    val labels = embeddings.select(col("vec_id").as("neighbor_id"),
      col("label").as("n_label"))
    val votes = labels.join(broadcast(top), Seq("neighbor_id"))
      .groupBy(col("query_id"), col("n_label"))
      .agg(count(lit(1)).as("n_votes"))
    val wv = Window.partitionBy("query_id")
      .orderBy(col("n_votes").desc, col("n_label"))
    val winner = votes.withColumn("_r", row_number().over(wv))
      .filter(col("_r") === 1)
      .select(col("query_id"), col("n_label").as("knn_label"), col("n_votes"))
      .localCheckpoint()
    probes.select(col("vec_id"), col("label"))
      .join(broadcast(winner), col("vec_id") === col("query_id"))
      .select(col("vec_id"), col("label"), col("knn_label"), col("n_votes"),
        when(col("label") === col("knn_label"), 1).otherwise(0).as("agree"))
      .orderBy("vec_id")
  }

  /** Binary-quantized ANN (sign quantization + Hamming shortlist +
    * exact rerank): each vector packs to ⌈d/32⌉ sign-bit WORDS (32
    * bits per long — every engine's integer arithmetic stays exact
    * and overflow-free), the shortlist is the S smallest Hamming
    * distances per probe (integer xor/bit_count — codegen'd, ~2 ops
    * per 32 dims vs 2 FLOPs per dim for cosine), and only shortlist
    * survivors are rescored with exact cosine.
    *
    * The 100 TB story: the packed corpus is d/8 bytes per vector
    * (64-dim float32 → 16 bytes vs 256, a 16× smaller scan), the
    * Hamming shuffle carries only (query_id, neighbor_id, hamming)
    * ints, and the float vectors are touched again ONLY for the
    * |probes|·S shortlist rows — via a broadcast of the checkpointed
    * probe-bounded shortlist into the corpus scan, never a corpus
    * shuffle (the q102 broadcast rule).
    *
    * Determinism: Hamming is exact integer; shortlist ties break on
    * neighbor_id; the rerank orders on 6dp-rounded cosine then
    * neighbor_id (the cross-engine rank rule).
    *
    * Output: (query_id, rank, neighbor_id, hamming, cosine) ordered
    * by (query_id, rank).
    */
  def binaryHammingTopK(embeddings: DataFrame, probes: DataFrame, k: Int,
      shortlist: Int): DataFrame = {
    require(k >= 1 && shortlist >= k, s"need 1 <= k=$k <= shortlist=$shortlist")
    val spark = embeddings.sparkSession
    // sign-bit packing: word w holds dims [32w, 32w+32) as Σ 2^i —
    // distinct powers < 2^32, so the ANSI long sum can't overflow
    val packed = expr(
      """transform(sequence(0, cast((size(embedding) - 1) div 32 as int)), w ->
        |  aggregate(sequence(0, 31), 0L, (acc, i) ->
        |    acc + IF(w * 32 + i < size(embedding)
        |             AND element_at(embedding, w * 32 + i + 1) > 0,
        |             shiftleft(1L, i), 0L)))""".stripMargin)
    val corpusW = embeddings.select(col("vec_id").as("neighbor_id"),
      packed.as("c_words"))
    val probesW = probes.select(col("vec_id").as("query_id"),
      packed.as("q_words")).localCheckpoint()
    val scored = corpusW.crossJoin(broadcast(probesW))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("hamming", expr(
        "aggregate(zip_with(q_words, c_words, (a, b) -> bit_count(a ^ b))," +
          " 0, (acc, x) -> acc + x)"))
    val wS = Window.partitionBy("query_id")
      .orderBy(col("hamming"), col("neighbor_id"))
    val short = scored.withColumn("_s", row_number().over(wS))
      .filter(col("_s") <= shortlist)
      .select("query_id", "neighbor_id", "hamming")
      .localCheckpoint() // probe-bounded broadcast artifact (q102 rule)
    val corpusV = embeddings.select(col("vec_id").as("neighbor_id"),
      asDouble(col("embedding")).as("c_emb"))
    val probesV = probes.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("q_emb")).localCheckpoint()
    val wK = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    corpusV.join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(probesV), Seq("query_id"))
      .withColumn("cosine",
        round(cosineFast(spark)(col("q_emb"), col("c_emb")), 6))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("hamming"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  /** Maximal-marginal-relevance diversified top-k (Carbonell &
    * Goldstein 1998): greedy re-ranking of an exact-cosine shortlist —
    * step 1 takes the most relevant candidate, each later step the
    * argmax of `lambda·rel − (1−lambda)·max_sim_to_selected`, so
    * near-duplicate results can't crowd the answer list. The dedup
    * counterpart on the RETRIEVAL side of what SemDeDup does on the
    * corpus side.
    *
    * Determinism: relevance and pairwise similarities quantize to
    * integer ppm at birth (6dp-rounded cosines × 1e6), the MMR score
    * is exact BIGINT arithmetic (`lambda_ppm·rel_ppm −
    * (1e6−lambda_ppm)·max_sim_ppm`, magnitudes ≤ 1e12), ties break on
    * neighbor_id — the greedy path is bit-stable across engines and
    * partition layouts.
    *
    * Scale shape: the corpus is touched exactly once, by
    * [[bruteForceTopK]] (probes broadcast, corpus never shuffles); at
    * corpus scale the shortlist instead comes from the IVF/PQ tiers.
    * Everything after is probe-bounded: |probes|·m members, |probes|·m²
    * pairwise sims, k tiny greedy iterations over localCheckpointed
    * frames (checkpoints keep the k-step plan linear, and every
    * broadcast below is a checkpointed probe-bounded artifact — the
    * q102 rule).
    *
    * Output: (query_id, sel_rank 1..k, neighbor_id, cosine, mmr_score),
    * ordered by (query_id, sel_rank).
    */
  def mmrTopK(embeddings: DataFrame, probes: DataFrame, k: Int = 5,
      m: Int = 20, lambdaPpm: Long = 700000L): DataFrame = {
    require(k >= 1 && k <= m, s"need 1 <= k=$k <= m=$m")
    require(lambdaPpm >= 0L && lambdaPpm <= 1000000L)
    val spark = embeddings.sparkSession
    val short = bruteForceTopK(embeddings, probes, m)
      .withColumn("rel_ppm", round(col("cosine") * lit(1e6)).cast("long"))
      .localCheckpoint()
    val ids = short.select(col("query_id"), col("neighbor_id"))
    val mem = embeddings
      .select(col("vec_id").as("neighbor_id"),
        asDouble(col("embedding")).as("_e"))
      .join(broadcast(ids), Seq("neighbor_id"))
      .localCheckpoint()
    val pairs = mem
      .select(col("query_id"), col("neighbor_id").as("a_id"),
        col("_e").as("_ea"))
      .join(broadcast(mem.select(col("query_id"),
        col("neighbor_id").as("b_id"), col("_e").as("_eb"))), Seq("query_id"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("query_id"), col("a_id"), col("b_id"),
        round(round(cosineFast(spark)(col("_ea"), col("_eb")), 6) * lit(1e6))
          .cast("long").as("sim_ppm"))
      .localCheckpoint()
    var selected = short.filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("sel_rank"),
        (lit(lambdaPpm) * col("rel_ppm")).as("score_e12"))
      .localCheckpoint()
    for (i <- 2 to k) {
      val selIds = selected.select(col("query_id"), col("neighbor_id"))
      val cand = pairs
        .join(selIds.withColumnRenamed("neighbor_id", "b_id"),
          Seq("query_id", "b_id"))
        .groupBy(col("query_id"), col("a_id"))
        .agg(max(col("sim_ppm")).as("_mx"))
        .join(selIds.withColumnRenamed("neighbor_id", "a_id"),
          Seq("query_id", "a_id"), "left_anti")
      val w = Window.partitionBy("query_id")
        .orderBy(col("score_e12").desc, col("neighbor_id"))
      val pick = cand
        .join(short.select(col("query_id"), col("neighbor_id").as("a_id"),
          col("rel_ppm")), Seq("query_id", "a_id"))
        .select(col("query_id"), col("a_id").as("neighbor_id"),
          (lit(lambdaPpm) * col("rel_ppm")
            - lit(1000000L - lambdaPpm) * col("_mx")).as("score_e12"))
        .withColumn("_rk", row_number().over(w))
        .filter(col("_rk") === 1)
        .select(col("query_id"), col("neighbor_id"), lit(i).as("sel_rank"),
          col("score_e12"))
      selected = selected.union(pick).localCheckpoint()
    }
    selected
      .join(short.select("query_id", "neighbor_id", "cosine"),
        Seq("query_id", "neighbor_id"))
      // the score stays fixed-point (1e-12 units): it is a multiple of
      // 1e5 by construction (both coefficients are), so a 6dp-rounded
      // double would sit exactly on the .5 boundary for ~1 in 10 rows
      // and flip between engines — exact integers can't.
      .select(col("query_id"), col("sel_rank"), col("neighbor_id"),
        col("cosine"), col("score_e12").as("mmr_score_e12"))
      .orderBy("query_id", "sel_rank")
  }

  /** Hard-negative mining for contrastive training: each anchor's k
    * nearest corpus vectors whose label DIFFERS from the anchor's —
    * the negatives that actually move a contrastive loss, where
    * `Sampling.negativeSamples`' uniform draws are mostly trivial.
    * Exact tier, mirroring [[bruteForceTopK]]'s shape (probes
    * broadcast, corpus scanned once, per-query ranking shuffle is
    * |probes|·N rows); at corpus scale route through the IVF/PQ tiers
    * and post-filter labels on the reranked shortlist instead.
    *
    * Output: (query_id, rank, neighbor_id, neighbor_label, cosine),
    * rounded-cosine ranking with neighbor_id tie-break.
    */
  def hardNegatives(embeddings: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val corpus = embeddings.select(col("vec_id").as("neighbor_id"),
      col("label").as("neighbor_label"), asDouble(col("embedding")).as("c_emb"))
    val q = probes.select(col("vec_id").as("query_id"),
      col("label").as("q_label"), asDouble(col("embedding")).as("q_emb"))
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id") &&
        col("neighbor_label") =!= col("q_label"))
      .withColumn("cosine",
        round(cosineFast(embeddings.sparkSession)(col("q_emb"), col("c_emb")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("neighbor_label"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  /** Corpus cartography: embedding-space clusters (seeded coarse
    * codebook, each vector assigned to its nearest list) labeled by
    * their signature vocabulary — the top-k tokens of the documents
    * landing in each cluster, with token-volume share. The
    * "what is actually IN this data" report a mixture designer reads
    * before weighting sources.
    *
    * Scale shape: assignment is the map-side broadcast-codebook argmax
    * ([[nearestLists]]); docs join their cluster by id (one shuffle);
    * the term rollup is [[TextAnalysis.topTermsByGroup]] — per-cluster
    * state is vocabulary-sized, independent of corpus rows.
    */
  def clusterTopics(embeddings: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, k: Int, nlists: Int = 8): DataFrame = {
    val spark = embeddings.sparkSession
    val centroids = centroidsDf(spark, seededCodebook(embeddings, nlists))
    val assign = nearestListIds(
      embeddings.select(col("vec_id"), asDouble(col("embedding")).as("emb")),
      "vec_id", centroids)
      .select(col("vec_id").as(idCol), col("list_id"))
    val labeled = docs.select(col(idCol), col(textCol)).join(assign, Seq(idCol))
    TextAnalysis.topTermsByGroup(labeled, "list_id", textCol, k)
  }

  /** Matryoshka truncation report: what does retrieval lose if the
    * index stores only the first d dimensions? For each candidate
    * budget, the mean retained L2 energy of the prefix and the
    * recall@k of the truncated-cosine ranking against the full-vector
    * ranking — the storage/recall dial for MRL-style embeddings, where
    * prefixes are trained to be usable on their own (Kusupati et al.,
    * NeurIPS 2022).
    *
    * Cross-engine discipline: per-vector energy ratios quantize to
    * integer ppm at birth (exact integer sums); recall counts are
    * exact integers over rounded-cosine rankings; the two divisions
    * happen once in the final projection.
    *
    * Scale shape: one corpus scan per budget for each of energy
    * (map-side aggregate) and ranking (q24's probe-broadcast shape) —
    * a |dims|-pass report, run at index-design time, not per query.
    *
    * Output: (d, retained_energy, recall_at_k), ordered by d.
    */
  def truncationReport(embeddings: DataFrame, probes: DataFrame,
      dims: Seq[Int], k: Int): DataFrame = {
    require(dims.nonEmpty, "at least one dimension budget")
    def trunc(df: DataFrame, d: Int): DataFrame =
      df.withColumn("embedding", slice(col("embedding"), 1, d))
    val full = bruteForceTopK(embeddings, probes, k)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()
    val nProbes = probes.agg(count(lit(1)).as("n_probes"))
    val rankings = dims.map { d =>
      bruteForceTopK(trunc(embeddings, d), trunc(probes, d), k)
        .select(lit(d).as("d"), col("query_id"), col("neighbor_id"))
    }.reduce(_ unionByName _)
    val hits = rankings.join(broadcast(full), Seq("query_id", "neighbor_id"))
      .groupBy("d").agg(count(lit(1)).as("n_hits"))
    val energies = dims.map { d =>
      val v = asDouble(col("embedding"))
      val ed = aggregate(slice(v, lit(1), lit(d)), lit(0.0),
        (acc, x) => acc + x * x)
      val ef = aggregate(v, lit(0.0), (acc, x) => acc + x * x)
      embeddings
        .select(when(ef > 0,
          floor(ed / ef * lit(1e6) + lit(0.5)).cast("long"))
          .otherwise(lit(1000000L)).as("ppm"))
        .agg(sum(col("ppm")).as("sum_ppm"), count(lit(1)).as("n_vecs"))
        .select(lit(d).as("d"), col("sum_ppm"), col("n_vecs"))
    }.reduce(_ unionByName _)
    energies.join(hits, Seq("d"))
      .crossJoin(broadcast(nProbes))
      .select(col("d"),
        round((col("sum_ppm").cast("double") / lit(1e6)) / col("n_vecs"), 6)
          .as("retained_energy"),
        round(col("n_hits").cast("double") / (col("n_probes") * k), 6)
          .as("recall_at_k"))
      .orderBy("d")
  }

  /** Semi-supervised label propagation (Zhu & Ghahramani 2002, the
    * hard-label variant): a small seed set labels its neighbors, the
    * grown set labels THEIR neighbors, for `iters` synchronous rounds
    * — the standard way a 1%-labeled corpus becomes a weakly-labeled
    * training set. Deterministic form: a node adopts the majority
    * label of its already-labeled in-neighbors (count DESC, label ASC
    * tie-break); labeled nodes never change; `hop` records the round
    * a node was labeled (0 = seed).
    *
    * The kNN graph is IVF-routed, not exact: nodes meet only within
    * their coarse list (the SemDeDup shape — per-list candidate work
    * is (N/nlists)², so callers pass `nlists` ≈ ⌈√N⌉ via
    * [[autoNlists]]; never a cartesian), each node keeping its k
    * nearest in-list neighbors by rounded cosine with id tie-break.
    *
    * Scale shape: one list-keyed self-equi-join builds the graph
    * (checkpointed — it feeds every round); each round is one
    * graph⋈labels equi-join + an anti-join against the labeled set +
    * one majority window, all keyed by node; label state is node-
    * sized and checkpointed per round (the self-join-fed rule).
    *
    * Output: (vec_id, label, hop) for every node labeled within
    * `iters` rounds, ordered by vec_id.
    */
  def labelPropagation(embeddings: DataFrame, seeds: DataFrame, k: Int,
      iters: Int, nlists: Int): DataFrame = {
    val spark = embeddings.sparkSession
    val centroids = centroidsDf(spark, seededCodebook(embeddings, nlists))
    val asg = nearestLists(
      embeddings.select(col("vec_id"), asDouble(col("embedding")).as("emb")),
      "vec_id", 1, centroids)
      .select(col("vec_id"), col("list_id"), col("emb"))
      .localCheckpoint()
    val wk = Window.partitionBy("node").orderBy(col("cosine").desc, col("nbr"))
    val graph = asg.select(col("list_id"), col("vec_id").as("node"), col("emb").as("ea"))
      .join(asg.select(col("list_id"), col("vec_id").as("nbr"), col("emb").as("eb")),
        Seq("list_id"))
      .filter(col("node") =!= col("nbr"))
      .withColumn("cosine", round(cosineFast(spark)(col("ea"), col("eb")), 6))
      .withColumn("_r", row_number().over(wk))
      .filter(col("_r") <= k)
      .select(col("node"), col("nbr"))
      .localCheckpoint()
    var labels = seeds.select(col("vec_id"), col("label"), lit(0).as("hop"))
      .localCheckpoint()
    for (i <- 1 to iters) {
      val wv = Window.partitionBy("node").orderBy(col("n").desc, col("label"))
      val newly = graph
        .join(labels.select(col("vec_id").as("nbr"), col("label")), Seq("nbr"))
        .join(labels.select(col("vec_id").as("node")), Seq("node"), "left_anti")
        .groupBy("node", "label").agg(count(lit(1)).as("n"))
        .withColumn("_r", row_number().over(wv))
        .filter(col("_r") === 1)
        .select(col("node").as("vec_id"), col("label"), lit(i).as("hop"))
      labels = labels.unionByName(newly).localCheckpoint()
    }
    labels.orderBy("vec_id")
  }

  /** Embedding-space OUTLIER detection — the pruning complement of
    * SemDeDup: where `semanticDedup` removes points packed too close
    * to a neighbor, this flags points whose within-list kNN
    * neighborhood is too FAR (mean cosine to the k nearest co-listed
    * points below `tauPpm`) — mislabeled strays, corrupt embeddings,
    * off-distribution junk. Same IVF routing as `labelPropagation`
    * (⌈√N⌉ lists by the SemDeDup sizing rule), so per-list pair work
    * stays (N/nlists)² and nothing is all-pairs.
    *
    * Determinism: per-neighbor cosines quantize to integer ppm at
    * birth; the neighborhood sum is exact, and the outlier cut
    * compares `sum_ppm < tauPpm · n_nbrs` in exact integers (mean <
    * tau without a division). A point alone in its list has no
    * neighborhood evidence and flags as an outlier by convention.
    *
    * Output: (vec_id, list_id, n_nbrs, knn_sum_ppm, outlier 0/1),
    * ordered by vec_id.
    */
  def embeddingOutliers(embeddings: DataFrame, k: Int = 5,
      nlists: Int, tauPpm: Long = 300000L): DataFrame = {
    val asg = ivfAssignments(embeddings, nlists)
    val knn = withinListKnnEdges(asg, k)
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_nbrs"), sum(col("cos_ppm")).as("knn_sum_ppm"))
    asg.select(col("vec_id"), col("list_id"))
      .join(knn.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), col("list_id"),
        coalesce(col("n_nbrs"), lit(0L)).as("n_nbrs"),
        coalesce(col("knn_sum_ppm"), lit(0L)).as("knn_sum_ppm"))
      .withColumn("outlier",
        when(col("n_nbrs") === 0L
          || col("knn_sum_ppm") < lit(tauPpm) * col("n_nbrs"), 1)
          .otherwise(0))
      .orderBy("vec_id")
  }

  /** ⌈√N⌉-style seeded IVF assignment: (vec_id, list_id, emb), one row
    * per vector, checkpointed (it feeds a self-join downstream).
    */
  private def ivfAssignments(embeddings: DataFrame, nlists: Int): DataFrame = {
    val spark = embeddings.sparkSession
    val centroids = centroidsDf(spark, seededCodebook(embeddings, nlists))
    nearestLists(
      embeddings.select(col("vec_id"), asDouble(col("embedding")).as("emb")),
      "vec_id", 1, centroids)
      .select(col("vec_id"), col("list_id"), col("emb"))
      .localCheckpoint()
  }

  /** Directed kNN edges within each IVF list: for every vector, its k
    * nearest co-listed neighbors by ppm-quantized cosine (nbr-id
    * tie-break). Per-list pair work is (N/nlists)² — never all-pairs.
    * Output: (node, nbr, cos_ppm).
    */
  private def withinListKnnEdges(asg: DataFrame, k: Int): DataFrame = {
    val spark = asg.sparkSession
    val wk = Window.partitionBy("node").orderBy(col("cos_ppm").desc, col("nbr"))
    asg.select(col("list_id"), col("vec_id").as("node"), col("emb").as("ea"))
      .join(asg.select(col("list_id"), col("vec_id").as("nbr"),
        col("emb").as("eb")), Seq("list_id"))
      .filter(col("node") =!= col("nbr"))
      .withColumn("cos_ppm",
        round(round(cosineFast(spark)(col("ea"), col("eb")), 6) * lit(1e6))
          .cast("long"))
      .withColumn("_r", row_number().over(wk))
      .filter(col("_r") <= k)
      .select(col("node"), col("nbr"), col("cos_ppm"))
  }

  /** k-core membership over an UNDIRECTED edge list `(u, v)` — the
    * "dense cohesive region" selector (nodes that survive repeated
    * pruning of degree < k): each round recomputes degrees over edges
    * between surviving nodes and drops the under-k nodes, to a fixed
    * point. Runs ≤ `maxRounds` driver rounds with early exit — extra
    * rounds after the fixed point are no-ops, which is what lets the
    * oracle unroll a FIXED round count and still agree (the q231
    * argument); throws if the graph hasn't converged by `maxRounds`
    * (raise it) so a silent truncation can never ship.
    *
    * Scale shape: each round is one edge semi-join + one degree
    * aggregate over surviving edges (≤|E| rows); the node set only
    * shrinks. Output: (vec_id, degree, in_core) for every input
    * node — degree is the FINAL surviving-subgraph degree (0 outside
    * the core), ordered by vec_id.
    */
  def kCore(nodes: DataFrame, edges: DataFrame, k: Int,
      maxRounds: Int = 12): DataFrame = {
    require(k >= 1 && maxRounds >= 1, s"bad k/maxRounds: $k/$maxRounds")
    val und = edges.select(col("u"), col("v")).localCheckpoint()
    var alive = nodes.select(col("vec_id")).localCheckpoint()
    var aliveCount = alive.count()
    var rounds = 0
    var done = false
    while (!done) {
      require(rounds < maxRounds,
        s"k-core did not converge in $maxRounds rounds — raise maxRounds")
      val live = und
        .join(alive.select(col("vec_id").as("u")), Seq("u"), "left_semi")
        .join(alive.select(col("vec_id").as("v")), Seq("v"), "left_semi")
      val deg = live.select(col("u").as("vec_id"))
        .union(live.select(col("v").as("vec_id")))
        .groupBy("vec_id").agg(count(lit(1)).as("degree"))
      val next = deg.filter(col("degree") >= k)
        .select(col("vec_id")).localCheckpoint()
      val nextCount = next.count()
      if (nextCount == aliveCount) done = true
      else { alive = next; aliveCount = nextCount; rounds += 1 }
    }
    val live = und
      .join(alive.select(col("vec_id").as("u")), Seq("u"), "left_semi")
      .join(alive.select(col("vec_id").as("v")), Seq("v"), "left_semi")
    val deg = live.select(col("u").as("vec_id"))
      .union(live.select(col("v").as("vec_id")))
      .groupBy("vec_id").agg(count(lit(1)).as("degree"))
    nodes.select(col("vec_id"))
      .join(deg.join(alive, Seq("vec_id"), "left_semi"),
        Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("degree"), lit(0L)).as("degree"),
        col("degree").isNotNull.cast("int").as("in_core"))
      .orderBy("vec_id")
  }

  /** [[kCore]] over the symmetrized within-list kNN graph. */
  def knnKCore(embeddings: DataFrame, k: Int = 5, nlists: Int,
      coreK: Int = 2, maxRounds: Int = 12): DataFrame = {
    val asg = ivfAssignments(embeddings, nlists)
    val und = withinListKnnEdges(asg, k)
      .select(least(col("node"), col("nbr")).as("u"),
        greatest(col("node"), col("nbr")).as("v"))
      .distinct()
    kCore(asg.select(col("vec_id")), und, coreK, maxRounds)
  }

  /** Degree assortativity of an undirected edge list — Pearson
    * correlation of endpoint degrees over the edge ends (positive:
    * hubs link hubs; negative: hub-and-spoke): degrees are exact
    * integer counts, every correlation sum is an exact long over the
    * 2|E| (end, other-end) pairs, and r is ONE float expression.
    * NULL when either side is degree-constant.
    *
    * Output: one row (n_nodes, n_edges, assortativity).
    */
  def degreeAssortativity(nodes: DataFrame,
      edges: DataFrame): DataFrame = {
    val und = edges.select(col("u"), col("v")).localCheckpoint()
    val deg = und.select(col("u").as("vec_id"))
      .union(und.select(col("v").as("vec_id")))
      .groupBy("vec_id").agg(count(lit(1)).as("d")).localCheckpoint()
    // both orientations so the correlation is symmetric
    val ends = und.select(col("u").as("a"), col("v").as("b"))
      .union(und.select(col("v").as("a"), col("u").as("b")))
      .join(deg.select(col("vec_id").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("vec_id").as("b"), col("d").as("db")), Seq("b"))
    val tot = ends.agg(count(lit(1)).as("m"),
      sum(col("da")).as("sa"), sum(col("db")).as("sb"),
      sum(col("da") * col("db")).as("sab"),
      sum(col("da") * col("da")).as("saa"),
      sum(col("db") * col("db")).as("sbb"))
    val nN = nodes.agg(countDistinct(col("vec_id")).as("n_nodes"))
    val eN = und.agg(count(lit(1)).as("n_edges"))
    nN.crossJoin(broadcast(eN)).crossJoin(broadcast(tot))
      .select(col("n_nodes"), col("n_edges"),
        when((col("m").cast("double") * col("saa").cast("double")
          - col("sa").cast("double") * col("sa").cast("double")) > 0.0
          && (col("m").cast("double") * col("sbb").cast("double")
            - col("sb").cast("double") * col("sb").cast("double")) > 0.0,
          round((col("m").cast("double") * col("sab").cast("double")
            - col("sa").cast("double") * col("sb").cast("double"))
            / sqrt((col("m").cast("double") * col("saa").cast("double")
              - col("sa").cast("double") * col("sa").cast("double"))
              * (col("m").cast("double") * col("sbb").cast("double")
                - col("sb").cast("double") * col("sb").cast("double"))), 6))
          .as("assortativity"))
  }

  /** [[degreeAssortativity]] over the symmetrized kNN graph. */
  def knnAssortativity(embeddings: DataFrame, k: Int = 5,
      nlists: Int): DataFrame = {
    val asg = ivfAssignments(embeddings, nlists)
    val und = withinListKnnEdges(asg, k)
      .select(least(col("node"), col("nbr")).as("u"),
        greatest(col("node"), col("nbr")).as("v"))
      .distinct()
    degreeAssortativity(asg.select(col("vec_id")), und)
  }

  /** Newman modularity of a node partition over an UNDIRECTED edge
    * list `(u, v)` — how much denser the within-part edges are than a
    * degree-preserving random rewiring:
    *   Q = Σ_c [ L_c/m − (d_c/(2m))² ]
    * with L_c = intra-part edges, d_c = part degree sum, m = |E|.
    * The quality gate for IVF-as-community structure next to
    * [[clusterSilhouette]] (geometry) and [[listBalanceReport]] (cost).
    *
    * Determinism: every input to the two float divisions is an exact
    * long (edge/degree counts); each contribution is computed in one
    * expression as (4·m·L_c − d_c²) / (4m²) so the engines agree bit
    * for bit. The long products cap the method at m < 2³¹ edges per
    * evaluation — audit-sized graphs, not the raw corpus (the kNN
    * graph of a 10⁹-vector corpus would be sharded by list before a
    * modularity readout anyway).
    *
    * Scale shape: two broadcast-sized joins of the edge list against
    * the (node → part) map, then one aggregate per part; nothing
    * quadratic, no driver state beyond the m scalar row.
    *
    * Output: one row per part (part_id, n_nodes, intra_edges,
    * degree_sum, contrib) plus the global `modularity` repeated per
    * row, ordered by part_id.
    */
  def partitionModularity(parts: DataFrame, edges: DataFrame): DataFrame = {
    val und = edges.select(col("u"), col("v")).localCheckpoint()
    val deg = und.select(col("u").as("vec_id"))
      .union(und.select(col("v").as("vec_id")))
      .groupBy("vec_id").agg(count(lit(1)).as("d"))
    val nd = parts.select(col("vec_id"), col("part_id"))
      .join(deg, Seq("vec_id"), "left")
      .groupBy(col("part_id"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(coalesce(col("d"), lit(0L))).as("degree_sum"))
    val pu = parts.select(col("vec_id").as("u"), col("part_id").as("pu"))
    val pv = parts.select(col("vec_id").as("v"), col("part_id").as("pv"))
    val intra = und.join(pu, Seq("u")).join(pv, Seq("v"))
      .filter(col("pu") === col("pv"))
      .groupBy(col("pu").as("part_id"))
      .agg(count(lit(1)).as("intra_edges"))
    val m = und.agg(count(lit(1)).as("m"))
    val per = nd.join(intra, Seq("part_id"), "left")
      .select(col("part_id"), col("n_nodes"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        col("degree_sum"))
      .crossJoin(broadcast(m))
    val gl = per.agg(sum(col("intra_edges")).as("si"),
      sum(col("degree_sum") * col("degree_sum")).as("sdd"))
    def q(intraC: org.apache.spark.sql.Column,
        ddC: org.apache.spark.sql.Column) =
      round((lit(4L) * col("m") * intraC - ddC).cast("double")
        / (lit(4L) * col("m") * col("m")).cast("double"), 6)
    per.crossJoin(broadcast(gl))
      .select(col("part_id"), col("n_nodes"), col("intra_edges"),
        col("degree_sum"),
        q(col("intra_edges"), col("degree_sum") * col("degree_sum"))
          .as("contrib"),
        q(col("si"), col("sdd")).as("modularity"))
      .orderBy("part_id")
  }

  /** [[partitionModularity]] of the ⌈√N⌉ IVF routing over its own
    * symmetrized within-list kNN graph. All kNN edges are intra-list
    * by construction, so Q > 0 certifies (and quantifies) that the
    * seeded routing concentrates degree mass inside lists rather than
    * merely splitting the corpus evenly.
    */
  def listModularity(embeddings: DataFrame, k: Int = 5,
      nlists: Int): DataFrame = {
    val asg = ivfAssignments(embeddings, nlists)
    val und = withinListKnnEdges(asg, k)
      .select(least(col("node"), col("nbr")).as("u"),
        greatest(col("node"), col("nbr")).as("v"))
      .distinct()
    partitionModularity(
      asg.select(col("vec_id"), col("list_id").as("part_id")), und)
  }

  /** IVF list-balance report — is the ⌈√N⌉ seeded routing keeping
    * lists balanced enough to bound within-list pair work and probe
    * latency? One row: exact list-size extremes, the exact within-
    * list pair mass Σ C(n_l, 2) (what SemDeDup / kNN-graph / DBSCAN
    * builds actually pay), and the imbalance factor max·L/N (1 =
    * perfectly even; the straggler multiplier at scale).
    *
    * Output: one row (n_vecs, n_lists_used, min_list, max_list,
    * sum_pairs, imbalance).
    */
  def listBalanceReport(embeddings: DataFrame, nlists: Int): DataFrame =
    ivfAssignments(embeddings, nlists)
      .groupBy(col("list_id")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n")).as("n_vecs"), count(lit(1)).as("n_lists_used"),
        min(col("n")).as("min_list"), max(col("n")).as("max_list"),
        sum(expr("n * (n - 1) div 2")).as("sum_pairs"))
      .select(col("n_vecs"), col("n_lists_used"), col("min_list"),
        col("max_list"), col("sum_pairs"),
        round(col("max_list").cast("double") * col("n_lists_used")
          / col("n_vecs").cast("double"), 6).as("imbalance"))

  /** PageRank over the within-list kNN similarity graph — the
    * graph-centrality data-selection signal: vectors many neighbors
    * point at are "representative" of their region; low-rank vectors
    * are peripheral. Edges are `withinListKnnEdges` (directed node→nbr,
    * so rank flows TOWARD the vectors others choose as neighbors).
    *
    * Determinism: the whole power iteration runs in exact integer
    * arithmetic — ranks are parts-per-trillion longs, each round is
    *   rank'(u) = tele + (dampPct · Σ_{v→u} (rank(v) div outdeg(v))) div 100
    * with `div` = truncating integer division (identical to DuckDB `//`
    * on non-negative values), tele = ((SCALE div N) · (100−dampPct))
    * div 100. Vectors alone in their list have no out-edges; their mass
    * is dropped (the standard lost-mass variant) — deterministic, and
    * documented rather than redistributed.
    *
    * Scale shape: edges build once and checkpoint; each round is one
    * node-keyed join plus one dst-keyed aggregate over |E| ≤ kN rows —
    * O(iterations · kN), no driver-side state beyond the scalar N.
    *
    * Output: (vec_id, outdeg, rank_ppt, rank_share 6dp), by vec_id.
    */
  def knnPagerank(embeddings: DataFrame, k: Int = 5, nlists: Int,
      iterations: Int = 5, dampPct: Long = 85L): DataFrame = {
    val asg = ivfAssignments(embeddings, nlists)
    val edges = withinListKnnEdges(asg, k)
      .select(col("node"), col("nbr")).localCheckpoint()
    val nodes = asg.select(col("vec_id"))
      .join(edges.groupBy(col("node")).agg(count(lit(1)).as("outdeg"))
        .withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("outdeg"), lit(0L)).as("outdeg"))
      .localCheckpoint()
    val scale = 1000000000000L
    val n = nodes.count()
    val tele = ((scale / n) * (100L - dampPct)) / 100L
    var ranks = nodes.select(col("vec_id"), lit(scale / n).as("rank_ppt"))
    for (_ <- 0 until iterations) {
      val contrib = ranks.join(nodes, Seq("vec_id"))
        .filter(col("outdeg") > 0L)
        .select(col("vec_id").as("node"), expr("rank_ppt div outdeg").as("c"))
      val inflow = edges.join(contrib, Seq("node"))
        .groupBy(col("nbr")).agg(sum(col("c")).as("in_sum"))
        .withColumnRenamed("nbr", "vec_id")
      ranks = nodes.select(col("vec_id"))
        .join(inflow, Seq("vec_id"), "left")
        .select(col("vec_id"),
          expr(s"$tele + ($dampPct * coalesce(in_sum, CAST(0 AS BIGINT))) div 100")
            .as("rank_ppt"))
        .localCheckpoint()
    }
    ranks.join(nodes, Seq("vec_id"))
      .select(col("vec_id"), col("outdeg"), col("rank_ppt"),
        round(col("rank_ppt") / lit(scale.toDouble), 6).as("rank_share"))
      .orderBy("vec_id")
  }

  /** Triangle counts and local clustering coefficients over an
    * UNDIRECTED edge list `(u, v)` (callers pass u < v, deduplicated —
    * [[knnTriangles]] symmetrizes the kNN graph into this shape).
    * Each triangle a < b < c is found exactly once, as the wedge
    * (a,b),(a,c) closed by the edge (b,c); per-node counts credit all
    * three corners. Coefficient = 2·T / (deg·(deg−1)) — one float
    * expression over exact integer counts, NULL below degree 2.
    *
    * Scale shape: one self-join of the edge list on its lower
    * endpoint (Σ_u deg_lower(u)² candidate wedges — bounded, for a
    * symmetrized kNN graph, by (2k)²·N/2) closed by one equi-join
    * back to the edges; no all-pairs stage.
    *
    * Output: (vec_id, degree, triangles, clustering_coef) for every
    * node that appears in `nodes`, ordered by vec_id.
    */
  def triangleStats(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val und = edges.select(col("u"), col("v")).localCheckpoint()
    val deg = und.select(col("u").as("vec_id"))
      .union(und.select(col("v").as("vec_id")))
      .groupBy("vec_id").agg(count(lit(1)).as("degree"))
    val tri = und.as("e1")
      .join(und.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
      .join(und.select(col("u").as("b"), col("v").as("c")), Seq("b", "c"))
      .localCheckpoint()
    val perNode = tri.select(col("a").as("vec_id"))
      .union(tri.select(col("b").as("vec_id")))
      .union(tri.select(col("c").as("vec_id")))
      .groupBy("vec_id").agg(count(lit(1)).as("triangles"))
    nodes.select(col("vec_id"))
      .join(deg, Seq("vec_id"), "left")
      .join(perNode, Seq("vec_id"), "left")
      .withColumn("degree", coalesce(col("degree"), lit(0L)))
      .withColumn("triangles", coalesce(col("triangles"), lit(0L)))
      .withColumn("clustering_coef", when(col("degree") >= 2L,
        round(lit(2.0) * col("triangles").cast("double")
          / (col("degree") * (col("degree") - 1)).cast("double"), 6)))
      .select("vec_id", "degree", "triangles", "clustering_coef")
      .orderBy("vec_id")
  }

  /** Triangle / clustering-coefficient profile of the within-list kNN
    * similarity graph — the cohesion audit next to [[knnPagerank]]'s
    * centrality: high-coefficient regions are tight near-duplicate
    * neighborhoods, zero-triangle nodes are stragglers. The directed
    * kNN edges symmetrize to the undirected DISTINCT (min, max) pair
    * set first, so mutual and one-way neighbor picks weigh the same.
    */
  def knnTriangles(embeddings: DataFrame, k: Int = 5,
      nlists: Int): DataFrame = {
    val asg = ivfAssignments(embeddings, nlists)
    val und = withinListKnnEdges(asg, k)
      .select(least(col("node"), col("nbr")).as("u"),
        greatest(col("node"), col("nbr")).as("v"))
      .distinct()
    triangleStats(asg.select(col("vec_id")), und)
  }

  /** Centroid-based (simplified) silhouette per IVF list — the linear
    * O(N·nlists) cluster-quality audit (exact silhouette is O(N²)):
    * for each vector, a = ppm cosine-distance to its own centroid,
    * b = distance to the runner-up centroid, s = (b−a)/max(a,b)
    * ∈ [0, 1e6] ppm (a ≤ b by construction of the assignment).
    * Low per-list means flag lists whose members sit as close to a
    * neighboring centroid as their own — merge candidates / bad k.
    *
    * Determinism: distances quantize to integer ppm at birth
    * (d = 1e6 − cos_ppm); s_ppm = ((b−a)·1e6) div max(a,b) in exact
    * integers (0 when max = 0); per-list sums are exact, one division
    * at the end. Needs nlists ≥ 2 (no runner-up otherwise).
    *
    * Output: (list_id, n_pts, sum_s_ppm, mean_s 6dp), by list_id.
    */
  def clusterSilhouette(embeddings: DataFrame, nlists: Int): DataFrame = {
    require(nlists >= 2, s"silhouette needs nlists >= 2, got $nlists")
    val spark = embeddings.sparkSession
    val centroids = centroidsDf(spark, seededCodebook(embeddings, nlists))
    val scored = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .crossJoin(broadcast(centroids))
      .withColumn("d_ppm",
        lit(1000000L) - round(round(cosineFast(spark)(col("emb"), col("centroid")), 6)
          * lit(1e6)).cast("long"))
    val w = Window.partitionBy("vec_id").orderBy(col("d_ppm").asc, col("list_id"))
    val top2 = scored.withColumn("crank", row_number().over(w))
      .filter(col("crank") <= 2)
      .groupBy(col("vec_id"))
      .agg(
        min(when(col("crank") === 1, col("list_id"))).as("list_id"),
        min(when(col("crank") === 1, col("d_ppm"))).as("a_ppm"),
        min(when(col("crank") === 2, col("d_ppm"))).as("b_ppm"))
    top2.withColumn("s_ppm",
        when(greatest(col("a_ppm"), col("b_ppm")) === 0L, lit(0L))
          .otherwise(expr("((b_ppm - a_ppm) * 1000000) div greatest(a_ppm, b_ppm)")))
      .groupBy(col("list_id"))
      .agg(count(lit(1)).as("n_pts"), sum(col("s_ppm")).as("sum_s_ppm"))
      .withColumn("mean_s",
        round(col("sum_s_ppm") / (col("n_pts") * lit(1e6)), 6))
      .orderBy("list_id")
  }

  /** Greedy farthest-point (k-center / Gonzalez 1985) coreset: the
    * diversity-maximizing subset selection — start from the
    * md5-smallest vector (the codebook seeding convention) and
    * repeatedly take the point FARTHEST from the chosen set (max over
    * candidates of min ppm cosine-distance to any chosen; ties to the
    * smaller vec_id). The selected k points 2-approximate the optimal
    * k-center cover — the canonical "pick maximally diverse exemplars"
    * primitive for pruning redundant training data.
    *
    * Determinism: pair distances quantize to integer ppm at birth, the
    * argmax orders on (d_ppm DESC, vec_id). The seed's distance-at-
    * selection is NULL (nothing was chosen before it).
    *
    * Scale shape: k driver-side rounds, each one map-side pass over
    * the corpus against the BROADCAST chosen set (≤ k rows — a
    * fixed-size artifact, never corpus-derived growth) plus a 1-row
    * TakeOrdered; the corpus checkpoints once and never shuffles.
    *
    * Output: (sel_rank 1..k, vec_id, d_ppm), ordered by sel_rank.
    */
  def farthestPointCoreset(embeddings: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val pts = embeddings.select(col("vec_id"),
        asDouble(col("embedding")).as("emb"),
        graft.functions.Md5Family.hash(col("vec_id").cast("string")).as("_h"))
      .localCheckpoint()
    val seed = pts.orderBy(col("_h"), col("vec_id")).limit(1)
      .select(col("vec_id"), col("emb")).collect()(0)
    var chosen = Vector[(Long, Seq[Double], Option[Long])](
      (seed.getLong(0), seed.getSeq[Double](1), None))
    for (_ <- 2 to k) {
      val chosenDf = chosen.map { case (id, e, _) => (id, e) }
        .toDF("c_id", "c_emb")
      val next = pts
        .join(broadcast(chosenDf.select(col("c_id").as("vec_id"))),
          Seq("vec_id"), "left_anti")
        .crossJoin(broadcast(chosenDf))
        .withColumn("d_ppm",
          lit(1000000L) - round(round(cosineFast(spark)(col("emb"), col("c_emb")), 6)
            * lit(1e6)).cast("long"))
        .groupBy(col("vec_id"))
        .agg(min(col("d_ppm")).as("dmin"), first(col("emb")).as("emb"))
        .orderBy(col("dmin").desc, col("vec_id")).limit(1)
        .collect()(0)
      chosen = chosen :+ ((next.getLong(0), next.getSeq[Double](2),
        Some(next.getLong(1))))
    }
    chosen.zipWithIndex.map { case ((id, _, d), i) => (i + 1, id, d) }
      .toDF("sel_rank", "vec_id", "d_ppm")
      .orderBy("sel_rank")
  }

  /** [[farthestPointCoreset]]'s SCALE form — the k-means‖ oversampling
    * idea (Bahmani et al., VLDB 2012) determinized: instead of k
    * sequential corpus passes, `rounds` BATCH rounds each select the k
    * points farthest from the accumulated candidate set in ONE
    * distributed pass (min-distance aggregate + TakeOrdered on
    * (dmin DESC, vec_id) — no randomness, so it replays in SQL), then
    * the 1 + rounds·k candidates — a bounded fixed-size artifact,
    * never corpus-derived growth — reduce to the final k exemplars by
    * the exact greedy itself, run over the tiny candidate frame.
    * Corpus passes: rounds + 1 (seed probe included) regardless of k,
    * vs k for the sequential greedy — at k = 64 that is ~20x fewer
    * scans, the difference between an afternoon and a coffee on a
    * 100 TB corpus. Batch selection loses greedy's per-step
    * conditioning inside a round (two batch picks can be mutually
    * close); the final greedy reduction restores diversity among
    * candidates, the standard oversample-then-reduce contract.
    *
    * Output: (sel_rank 1..k, vec_id, d_ppm) like the exact form;
    * d_ppm is the distance-at-selection within the candidate
    * reduction (seed row NULL), ordered by sel_rank.
    */
  def coresetOversampled(embeddings: DataFrame, k: Int,
      rounds: Int = 2): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k, rounds >= 1; got $k, $rounds")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val pts = embeddings.select(col("vec_id"),
        asDouble(col("embedding")).as("emb"),
        graft.functions.Md5Family.hash(col("vec_id").cast("string")).as("_h"))
      .localCheckpoint()
    val seed = pts.orderBy(col("_h"), col("vec_id")).limit(1)
      .select(col("vec_id"), col("emb")).collect()(0)
    var cand = Vector[(Long, Seq[Double])](
      (seed.getLong(0), seed.getSeq[Double](1)))
    for (_ <- 1 to rounds) {
      val candDf = cand.toDF("c_id", "c_emb")
      val batch = pts
        .join(broadcast(candDf.select(col("c_id").as("vec_id"))),
          Seq("vec_id"), "left_anti")
        .crossJoin(broadcast(candDf))
        .withColumn("d_ppm",
          lit(1000000L) - round(round(cosineFast(spark)(col("emb"), col("c_emb")), 6)
            * lit(1e6)).cast("long"))
        .groupBy(col("vec_id"))
        .agg(min(col("d_ppm")).as("dmin"), first(col("emb")).as("emb"))
        .orderBy(col("dmin").desc, col("vec_id")).limit(k)
        .collect() // bounded: exactly k rows per round
      cand = cand ++ batch.map(r => (r.getLong(0), r.getSeq[Double](2)))
    }
    // final reduction: the exact greedy over the candidate frame only
    // (<= 1 + rounds*k rows) — same argmax rule, same seeding
    // convention, so the whole chain replays as unrolled SQL
    farthestPointCoreset(
      cand.toDF("vec_id", "embedding"), k)
  }

  /** DBSCAN* density clustering (Campello et al. 2013 — the
    * deterministic DBSCAN variant: only CORE points cluster, border
    * points are noise, so no insertion-order dependence) over the
    * within-list eps-neighbor graph: a point is core when ≥ `minPts`
    * co-listed points sit at cosine ≥ `epsPpm`; clusters are the
    * connected components of the core–core eps edges (min-id label);
    * everything else labels −1 (noise). The IVF routing bounds pair
    * work at (N/nlists)² — cross-list eps pairs are sacrificed, the
    * same locality trade every ANN/SemDeDup path here makes.
    *
    * Output: (vec_id, list_id, n_eps, is_core, cluster_id), by vec_id.
    */
  def densityClusters(embeddings: DataFrame, nlists: Int,
      epsPpm: Long = 300000L, minPts: Int = 3): DataFrame = {
    val spark = embeddings.sparkSession
    val asg = ivfAssignments(embeddings, nlists)
    val pairs = asg.select(col("list_id"), col("vec_id").as("node"),
        col("emb").as("ea"))
      .join(asg.select(col("list_id"), col("vec_id").as("nbr"),
        col("emb").as("eb")), Seq("list_id"))
      .filter(col("node") =!= col("nbr"))
      .withColumn("cos_ppm",
        round(round(cosineFast(spark)(col("ea"), col("eb")), 6) * lit(1e6))
          .cast("long"))
      .filter(col("cos_ppm") >= epsPpm)
      .select(col("node"), col("nbr"))
      .localCheckpoint()
    val core = pairs.groupBy(col("node")).agg(count(lit(1)).as("n_eps"))
      .filter(col("n_eps") >= minPts)
      .localCheckpoint()
    val coreEdges = pairs
      .join(core.select(col("node")), Seq("node"))
      .join(core.select(col("node").as("nbr")), Seq("nbr"))
      .filter(col("node") < col("nbr"))
    val cc = Dedup.connectedComponentsAuto(coreEdges, "node", "nbr")
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
    asg.select(col("vec_id"), col("list_id"))
      .join(pairs.groupBy(col("node").as("vec_id"))
        .agg(count(lit(1)).as("n_eps")), Seq("vec_id"), "left")
      .join(core.select(col("node").as("vec_id"), lit(1).as("is_core")),
        Seq("vec_id"), "left")
      .join(cc, Seq("vec_id"), "left")
      .select(col("vec_id"), col("list_id"),
        coalesce(col("n_eps"), lit(0L)).as("n_eps"),
        coalesce(col("is_core"), lit(0)).as("is_core"),
        when(col("is_core").isNull, lit(-1L))
          .otherwise(coalesce(col("cluster_id"), col("vec_id")))
          .as("cluster_id"))
      .orderBy("vec_id")
  }

  /** Exact all-pairs above a cosine threshold (the embedding-cosine
    * near-duplicate primitive). Quadratic — intended for small corpora
    * or as the verifier for the LSH path below.
    */
  def thresholdPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val a = embeddings.select(col("vec_id").as("id_a"), asDouble(col("embedding")).as("emb_a"))
    val b = embeddings.select(col("vec_id").as("id_b"), asDouble(col("embedding")).as("emb_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      // threshold on the ROUNDED cosine so a pair sitting within float
      // noise of the cut is included/excluded identically cross-engine
      .withColumn("cosine",
        round(cosineFast(embeddings.sparkSession)(col("emb_a"), col("emb_b")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
      .orderBy("id_a", "id_b")
  }

  /** Deterministic pseudo-random unit-free hyperplanes for sign-LSH.
    * Seeded so plans are reproducible across runs/sessions — and so the
    * DuckDB oracle for q26 can inline the SAME planes as literals.
    */
  private[graft] def hyperplanes(dim: Int, bits: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-LSH signature column: one bit per hyperplane. Uses the
    * codegen DOT expression for the plane projections — sign(dot) ==
    * sign(cosine) since norms are positive, so the routing is identical
    * to the cosine form (and to the DuckDB oracle's list_dot_product)
    * at a third of the arithmetic: no norm loops, no sqrts, per plane.
    */
  private def signature(spark: org.apache.spark.sql.SparkSession,
      emb: org.apache.spark.sql.Column, planes: Array[Array[Double]]) = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(graft.functions.VectorExpressions.dotFast(spark)(emb, planeCol) >= 0,
        lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed near-neighbor pairs: `tables` independent sign-LSH
    * hash tables of `bits` hyperplanes each; a pair is a candidate iff
    * it collides in ≥1 table, and candidates are scored exactly.
    *
    * Recall for a pair at angle θ is 1-(1-(1-θ/π)^bits)^tables — tuned
    * here for the 0.4-cosine regime; raise bits / lower tables for
    * higher thresholds. The candidate join is an equi-shuffle on
    * (table, bucket); candidate volume ≈ Σ_buckets n² per table, the
    * knob that replaces the brute-force O(n²).
    */
  /** The sign-LSH signature rows (vec_id, table, bucket) behind
    * [[lshNeighborPairs]], factored out so incremental pair miners
    * ([[PairStore]]) persist the SAME routing the one-shot operator
    * computes — a stored signature row and a freshly computed one are
    * bit-identical for the same (bits, tables, seed).
    */
  private[graft] def lshSignatureRows(embeddings: DataFrame, bits: Int = 6,
      tables: Int = 8, seed: Long = 42L): DataFrame = {
    val dim = 64
    val planes = hyperplanes(dim, bits * tables, seed)
    embeddings.select(
      col("vec_id"),
      posexplode(array((0 until tables).map { t =>
        signature(embeddings.sparkSession, asDouble(col("embedding")),
          planes.slice(t * bits, (t + 1) * bits))
      }: _*)).as(Seq("table", "bucket")))
  }

  def lshNeighborPairs(embeddings: DataFrame, threshold: Double, bits: Int = 6,
      tables: Int = 8, seed: Long = 42L): DataFrame = {
    // The candidate self-join deliberately carries ONLY (table, bucket,
    // id): shuffling the vectors with every candidate row would move
    // |candidates| × 2 × dim doubles through the exchange and the pair
    // dedup — the dominant cost of the old shape. Vectors are
    // re-attached AFTER dedup by two equi-joins against the (narrow)
    // corpus projection, so each surviving pair reads its two vectors
    // once. localCheckpoint: the signature projection feeds both sides
    // of the self-join.
    val sig = lshSignatureRows(embeddings, bits, tables, seed)
      .localCheckpoint()
    val a = sig.select(col("table"), col("bucket"), col("vec_id").as("id_a"))
    val b = sig.select(col("table"), col("bucket"), col("vec_id").as("id_b"))
    // dedupe candidates before the exact scoring: a pair colliding in
    // k of the 8 tables would otherwise pay k cosine evaluations
    val cand = a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    val emb = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    cand
      .join(emb.select(col("vec_id").as("id_a"), col("emb").as("emb_a")), Seq("id_a"))
      .join(emb.select(col("vec_id").as("id_b"), col("emb").as("emb_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosineFast(embeddings.sparkSession)(col("emb_a"), col("emb_b")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** Sampled-k-means coarse quantizer for IVF: a deterministic,
    * bounded sample (ordered by a hash of the id — pseudo-random but
    * reproducible) is collected to the driver (sampleN × dim doubles ≈
    * 256 KB at the defaults — NOT the corpus) and Lloyd-iterated there;
    * the k centroids come back as plain arrays to broadcast.
    *
    * This is the standard IVF training shape at any scale: train the
    * codebook on a sample, quantize the full corpus map-side. Cosine
    * assignment + mean update (spherical k-means; the mean is left
    * unnormalized — cosine is scale-invariant in the centroid, so
    * ranking is unaffected). Empty lists keep their previous centroid.
    */
  def kmeansCodebook(embeddings: DataFrame, k: Int, iters: Int = 5,
      sampleN: Int = 512): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .orderBy(xxhash64(col("vec_id")))
      .limit(sampleN)
      .select(col("emb"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.length >= k, s"sample (${sample.length}) smaller than k=$k")
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / math.sqrt(na * nb)
    }
    var centroids = sample.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val dim = centroids(0).length
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bestCos = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          val cos = cosine(v, centroids(c))
          if (cos > bestCos) { bestCos = cos; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k)(c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c)))
    }
    centroids
  }

  /** IVF-style ANN: a LEARNED coarse codebook (sampled k-means, no
    * labels required) partitions the corpus into `nlists` inverted
    * lists; each probe searches only the `nprobe` nearest lists.
    *
    * Scale shape: the codebook is tiny and broadcast twice (assignment
    * + probe routing); the corpus is scanned once to attach a list id
    * (map-side, no shuffle), and the candidate join is an equi-join on
    * the list id — the classic IVF trade of recall for a 1/nlists
    * candidate fraction. Recall vs the exact path is spec-tested,
    * including on unlabeled input.
    */
  def ivfTopK(embeddings: DataFrame, probes: DataFrame, k: Int, nprobe: Int = 2,
      nlists: Int = 8): DataFrame =
    ivfTopKWithCodebook(embeddings, probes, k, nprobe,
      kmeansCodebook(embeddings, nlists))

  /** Hash-seeded codebook: the `nlists` corpus vectors with the
    * smallest [[Md5Family]] hash of their id — i.e. a reproducible
    * uniform random sample used directly as the coarse quantizer
    * (k-means's own init step, skipping Lloyd refinement). Slightly
    * worse list balance than the learned codebook, but every step is
    * plain relational algebra, so the WHOLE IVF pipeline — seeding,
    * assignment, probe routing, candidate ranking — is expressible in
    * a SQL oracle and hash-checkable cross-engine.
    */
  def seededCodebook(embeddings: DataFrame, nlists: Int,
      hashes: graft.functions.HashFamily = graft.functions.Md5Family): Array[Array[Double]] =
    embeddings
      .select(asDouble(col("embedding")).as("emb"), col("vec_id"),
        hashes.hash(col("vec_id").cast("string")).as("_h"))
      .orderBy(col("_h"), col("vec_id")).limit(nlists)
      .select(col("emb")).collect().map(_.getSeq[Double](0).toArray)

  /** IVF over the hash-seeded codebook — the oracle-checkable variant. */
  def ivfTopKSeeded(embeddings: DataFrame, probes: DataFrame, k: Int,
      nprobe: Int = 2, nlists: Int = 8): DataFrame =
    ivfTopKWithCodebook(embeddings, probes, k, nprobe,
      seededCodebook(embeddings, nlists))

  /** The coarse codebook as a (list_id, centroid) frame. */
  private[operators] def centroidsDf(spark: org.apache.spark.sql.SparkSession,
      codebook: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    codebook.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list_id", "centroid")
  }

  /** The `n` nearest coarse lists per vector. Routing orders on the
    * ROUNDED cosine (6dp, list_id tie-break): ordering on raw doubles
    * relies on Spark and the oracle engine producing bit-identical
    * floats for every comparison — sub-noise differences would swap
    * assignments.
    */
  private[graft] def nearestLists(vecs: DataFrame, idCol: String, n: Int,
      centroids: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    val scored = vecs.crossJoin(broadcast(centroids))
      .withColumn("ccos", round(cosineFast(spark)(col("emb"), col("centroid")), 6))
    if (n == 1) {
      // the n == 1 case is a per-row argmax over the broadcast
      // centroids — corpus-scale at every IVF assignment site. A
      // max_by partial aggregate collapses each vector's |centroids|
      // scored rows map-side (they are colocated: the broadcast join
      // never moves the vector), so the exchange carries ONE row per
      // vector instead of one per centroid and the per-partition
      // row_number sort of the windowed form disappears. Ordering key
      // (ccos, -list_id) is total (list_id unique), so the picked row
      // is exactly the window's (ccos DESC, list_id ASC) rank-1 row.
      val others = vecs.columns.filterNot(_ == idCol).toSeq
      scored.groupBy(idCol)
        .agg(max_by(struct((col("list_id") +: others.map(col)): _*),
          struct(col("ccos"), -col("list_id"))).as("_best"))
        .select(vecs.columns.toSeq.map(c =>
          if (c == idCol) col(idCol) else col(s"_best.$c").as(c))
          :+ col("_best.list_id").as("list_id"): _*)
    } else {
      val w = Window.partitionBy(idCol).orderBy(col("ccos").desc, col("list_id"))
      scored.withColumn("crank", row_number().over(w))
        .filter(col("crank") <= n)
        .drop("centroid", "ccos", "crank")
    }
  }

  /** [[nearestLists]] (n = 1) for callers that need ONLY (id, list_id):
    * the max_by buffer carries a bare int instead of the full row
    * struct, so the assignment exchange moves ~12 bytes per vector —
    * the general form drags the embedding itself through the aggregate
    * buffer (Spark cannot prune inside max_by's struct), |dim| doubles
    * per row that the corpus-scale enc/list-routing sites never read.
    * Tie-break identical to [[nearestLists]]: (ccos DESC, list_id ASC).
    */
  private[graft] def nearestListIds(vecs: DataFrame, idCol: String,
      centroids: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    vecs.crossJoin(broadcast(centroids))
      .withColumn("ccos", round(cosineFast(spark)(col("emb"), col("centroid")), 6))
      .groupBy(idCol)
      .agg(max_by(col("list_id"), struct(col("ccos"), -col("list_id")))
        .as("list_id"))
  }

  private def ivfTopKWithCodebook(embeddings: DataFrame, probes: DataFrame,
      k: Int, nprobe: Int, codebook: Array[Array[Double]]): DataFrame = {
    val spark = embeddings.sparkSession
    val centroids = centroidsDf(spark, codebook)
    val corpus = nearestLists(
      embeddings.select(col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("emb")),
      "neighbor_id", 1, centroids)
      .select(col("list_id"), col("neighbor_id"), col("emb").as("c_emb"))
    val routed = nearestLists(
      probes.select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("emb")),
      "query_id", nprobe, centroids)
      .select(col("list_id"), col("query_id"), col("emb").as("q_emb"))

    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    routed.join(corpus, Seq("list_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", round(cosineFast(spark)(col("q_emb"), col("c_emb")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  /** Product-quantization (PQ) top-k — the COMPRESSED-index ANN tier:
    * each vector is cut into `numSub` subvectors and every subvector
    * replaced by the id of its nearest entry in a per-subspace
    * codebook, so a dim-D float vector becomes `numSub` small codes
    * (64 doubles → 8 bytes here). Queries never touch the original
    * vectors: a probe precomputes its distance to every codebook entry
    * (an numSub×numCodes table) and a candidate's approximate distance
    * is just `numSub` table lookups summed — asymmetric distance
    * computation (ADC), after Jégou et al., "Product Quantization for
    * Nearest Neighbor Search" (TPAMI 2011).
    *
    * Scale shape: the encoded corpus (the only thing scored per query)
    * is ~1% the bytes of the raw vectors — THAT is what makes 100 TB
    * of embeddings scannable. Codebooks and probe tables broadcast;
    * the corpus encode is one groupBy argmin (map-side partials via
    * `min(struct(...))`); ADC is a broadcast join + one partial-agg
    * sum keyed by (query, neighbor). In production PQ re-ranks IVF
    * list candidates; this exhaustive form is the verifiable core.
    *
    * Oracle discipline (same rules as the IVF/cosine family): sub-
    * codebooks are hash-seeded corpus subvectors (reproducible sample,
    * k-means init without Lloyd steps — swap in learned codebooks for
    * recall); per-subspace distances are floored once to integer ppm
    * so the cross-subspace sums and all argmin/rank orderings compare
    * exact integers, never order-varying doubles.
    *
    * Output: query_id, rank, neighbor_id, approx_d2 (squared L2, 6dp).
    */
  def pqTopKSeeded(embeddings: DataFrame, probes: DataFrame, k: Int,
      dim: Int, numSub: Int = 8, numCodes: Int = 16): DataFrame = {
    val (enc, probeTable) = pqArtifacts(embeddings, probes, dim, numSub, numCodes)
    pqAdcRank(enc, probeTable, k)
  }

  /** PQ top-k over LEARNED sub-codebooks: the production variant of
    * [[pqTopKSeeded]], with each subspace's codebook Lloyd-iterated on
    * a bounded driver sample instead of being raw hash-sampled
    * subvectors (k-means init without refinement). Lower quantization
    * error → better ADC ranking; recall vs the exact path is
    * spec-tested. Not SQL-oracle-expressible (iterative float
    * training), exactly like `kmeansCodebook` vs `seededCodebook`.
    */
  def pqTopKLearned(embeddings: DataFrame, probes: DataFrame, k: Int,
      dim: Int, numSub: Int = 8, numCodes: Int = 16, iters: Int = 5,
      sampleN: Int = 512): DataFrame = {
    val cb = pqCodebooksDf(embeddings.sparkSession,
      pqLearnedCodebooks(embeddings, dim, numSub, numCodes, iters, sampleN))
    val (enc, probeTable) = pqArtifactsWithCodebook(embeddings, probes, dim, numSub, cb)
    pqAdcRank(enc, probeTable, k)
  }

  /** OPQ-lite PQ top-k: PCA-rotate the corpus with balanced
    * eigenvalue allocation (`Pca.balancedComponents`) BEFORE product
    * quantization — decorrelated, variance-balanced subspaces give
    * the sub-codebooks less structure to waste bits on, lowering
    * quantization error (spec-verified against the unrotated path).
    * The rotation is orthonormal, so rotated squared-L2 == original
    * squared-L2 and the ADC ranking still targets the original
    * metric. Probes rotate with the CORPUS-trained rotation.
    *
    * Like [[pqTopKLearned]], not SQL-oracle-expressible (driver
    * eigendecomposition); the moment pass feeding it is q148's.
    */
  def pqTopKOpq(embeddings: DataFrame, probes: DataFrame, k: Int,
      dim: Int, numSub: Int = 8, numCodes: Int = 16, iters: Int = 5,
      sampleN: Int = 512): DataFrame = {
    val (values, vectors) = Pca.principalComponents(embeddings, "embedding", dim)
    val rot = Pca.balancedComponents(values, vectors, numSub)
    def rotate(df: DataFrame): DataFrame =
      Pca.project(df, "embedding", rot, dim, "_rot")
        .drop("embedding").withColumnRenamed("_rot", "embedding")
    val re = rotate(embeddings)
    val cb = pqCodebooksDf(embeddings.sparkSession,
      pqLearnedCodebooks(re, dim, numSub, numCodes, iters, sampleN))
    val (enc, probeTable) =
      pqArtifactsWithCodebook(re, rotate(probes), dim, numSub, cb)
    pqAdcRank(enc, probeTable, k)
  }

  /** Total PQ quantization error of the corpus under a sub-codebook
    * frame, as ONE exact-integer ppm sum (1-row frame, column
    * `err_ppm`) — per-(vector, subspace) nearest-codeword distances
    * quantize to longs before summing, so the total is order-invariant
    * (the q148/HLL rule) and cross-engine hash-stable. One scan, the
    * codebook broadcast; the distributed face of the spec-side
    * `quantError` driver replay.
    */
  def pqQuantErrorPpm(embeddings: DataFrame, dim: Int, numSub: Int,
      cb: DataFrame): DataFrame = {
    require(dim % numSub == 0, "numSub must divide dim")
    subvecs(embeddings, "vec_id", numSub, dim / numSub)
      .join(broadcast(cb), Seq("m"))
      .withColumn("d2", d2ppm)
      .groupBy("vec_id", "m").agg(min(col("d2")).as("d2min"))
      .agg(sum(col("d2min")).as("err_ppm"))
  }

  /** [[pqQuantErrorPpm]] under the hash-SEEDED sub-codebook — fully
    * SQL-replayable (the q99 codebook chain), so an oracle can pin the
    * exact integer.
    */
  def pqQuantErrorSeeded(embeddings: DataFrame, dim: Int, numSub: Int = 8,
      numCodes: Int = 16): DataFrame =
    pqQuantErrorPpm(embeddings, dim, numSub,
      seededSubCodebook(embeddings, dim, numSub, numCodes))

  /** [[pqQuantErrorPpm]] under the Lloyd-LEARNED sub-codebooks. */
  def pqQuantErrorLearned(embeddings: DataFrame, dim: Int, numSub: Int = 8,
      numCodes: Int = 16, iters: Int = 5, sampleN: Int = 512): DataFrame =
    pqQuantErrorPpm(embeddings, dim, numSub,
      pqCodebooksDf(embeddings.sparkSession,
        pqLearnedCodebooks(embeddings, dim, numSub, numCodes, iters, sampleN)))

  /** [[pqQuantErrorPpm]] under the OPQ path: balanced-PCA rotation,
    * then learned codebooks on the ROTATED corpus. The rotation is
    * orthonormal, so the error lives in the same L2 metric as the
    * unrotated paths and the three numbers are directly comparable.
    */
  def pqQuantErrorOpq(embeddings: DataFrame, dim: Int, numSub: Int = 8,
      numCodes: Int = 16, iters: Int = 5, sampleN: Int = 512): DataFrame = {
    val (values, vectors) = Pca.principalComponents(embeddings, "embedding", dim)
    val rot = Pca.balancedComponents(values, vectors, numSub)
    val re = Pca.project(embeddings, "embedding", rot, dim, "_rot")
      .drop("embedding").withColumnRenamed("_rot", "embedding")
      .localCheckpoint() // feeds both the Lloyd sample and the error scan
    pqQuantErrorLearned(re, dim, numSub, numCodes, iters, sampleN)
  }

  /** Shared ADC scorer: exhaustive scan of the encoded corpus against
    * the broadcast probe tables, per-query top-k on the exact-integer
    * distance sums.
    */
  private def pqAdcRank(enc: DataFrame, probeTable: DataFrame, k: Int): DataFrame = {
    val rank = Window.partitionBy("query_id").orderBy(col("sd"), col("neighbor_id"))
    enc.join(broadcast(probeTable), Seq("m", "code_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id").agg(sum(col("d2")).as("sd"))
      .withColumn("rank", row_number().over(rank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sd").cast("double") / lit(1000000.0), 6).as("approx_d2"))
      .orderBy("query_id", "rank")
  }

  /** Per-subspace Lloyd-refined codebooks (numSub × numCodes × dim/
    * numSub), trained on the same bounded hash-ordered driver sample
    * as [[kmeansCodebook]] — sampleN × dim doubles, never the corpus.
    * Metric is squared L2 (what PQ's ADC sums), not cosine. Empty
    * cells keep their previous centroid.
    */
  def pqLearnedCodebooks(embeddings: DataFrame, dim: Int, numSub: Int = 8,
      numCodes: Int = 16, iters: Int = 5, sampleN: Int = 512)
      : Array[Array[Array[Double]]] = {
    require(dim % numSub == 0, "numSub must divide dim")
    val d = dim / numSub
    val sample: Array[Array[Double]] = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .orderBy(xxhash64(col("vec_id"))).limit(sampleN)
      .select(col("emb")).collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= numCodes,
      s"sample (${sample.length}) smaller than numCodes=$numCodes")
    Array.tabulate(numSub) { m =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, m * d, (m + 1) * d))
      var cents = pts.take(numCodes).map(_.clone())
      for (_ <- 0 until iters) {
        val sums = Array.fill(numCodes)(new Array[Double](d))
        val counts = new Array[Int](numCodes)
        pts.foreach { p =>
          var best = 0; var bestD = Double.PositiveInfinity; var c = 0
          while (c < numCodes) {
            var s = 0.0; var i = 0
            while (i < d) { val t = p(i) - cents(c)(i); s += t * t; i += 1 }
            if (s < bestD) { bestD = s; best = c }
            c += 1
          }
          counts(best) += 1
          var i = 0
          while (i < d) { sums(best)(i) += p(i); i += 1 }
        }
        cents = Array.tabulate(numCodes)(c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c)))
      }
      cents
    }
  }

  /** Driver-trained sub-codebooks as a (m, code_id, c) frame — a local
    * relation, so downstream broadcasts carry no corpus scan.
    */
  private[operators] def pqCodebooksDf(spark: org.apache.spark.sql.SparkSession,
      cbs: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    cbs.zipWithIndex.flatMap { case (codes, m) =>
      codes.zipWithIndex.map { case (c, id) => (m, id, c.toSeq) }
    }.toSeq.toDF("m", "code_id", "c")
  }

  /** The encoded corpus (`neighbor_id, m, code_id` — the compressed
    * index) and the probes' ADC lookup tables (`query_id, m, code_id,
    * d2` in integer ppm) over hash-seeded sub-codebooks.
    */
  private def pqArtifacts(embeddings: DataFrame, probes: DataFrame,
      dim: Int, numSub: Int, numCodes: Int): (DataFrame, DataFrame) =
    pqArtifactsWithCodebook(embeddings, probes, dim, numSub,
      seededSubCodebook(embeddings, dim, numSub, numCodes))

  /** The hash-seeded per-subspace codebook as a checkpointed
    * (m, code_id, c) frame: the numCodes corpus subvectors with the
    * smallest hash(vec_id:m) per subspace — a reproducible sample,
    * SQL-expressible for the oracles.
    */
  private[operators] def seededSubCodebook(embeddings: DataFrame, dim: Int,
      numSub: Int, numCodes: Int): DataFrame = {
    require(dim % numSub == 0, "numSub must divide dim")
    val d = dim / numSub
    val hash = graft.functions.Md5Family.hash(
      concat(col("vec_id").cast("string"), lit(":"), col("m").cast("string")))
    val cbRank = Window.partitionBy("m").orderBy(hash, col("vec_id"))
    subvecs(embeddings, "vec_id", numSub, d)
      .withColumn("code_id", row_number().over(cbRank) - 1)
      .filter(col("code_id") < numCodes)
      .select(col("m"), col("code_id"), col("sub").as("c"))
      .localCheckpoint()
  }

  /** (id, m, sub): the numSub d-dim subvector slices of each vector. */
  private def subvecs(df: DataFrame, idAs: String, numSub: Int, d: Int): DataFrame =
    df.select(col("vec_id").as(idAs), asDouble(col("embedding")).as("emb"))
      .withColumn("m", explode(sequence(lit(0), lit(numSub - 1))))
      .select(col(idAs), col("m"),
        slice(col("emb"), col("m") * d + 1, lit(d)).as("sub"))

  /** Encode corpus + probe ADC tables against ANY (m, code_id, c)
    * sub-codebook frame — hash-seeded or learned. The codebook must be
    * a bounded local/checkpointed artifact: it feeds two broadcast
    * joins.
    */
  private def pqArtifactsWithCodebook(embeddings: DataFrame, probes: DataFrame,
      dim: Int, numSub: Int, cb: DataFrame): (DataFrame, DataFrame) =
    (pqEncodeWithCodebook(embeddings, dim, numSub, cb),
      pqProbeTable(probes, dim, numSub, cb))

  /** Exact-integer squared L2 (ppm) between `sub` and codeword `c`. */
  private def d2ppm = floor(aggregate(
    zip_with(col("sub"), col("c"), (x, y) => (x - y) * (x - y)),
    lit(0.0), (acc, v) => acc + v) * lit(1000000.0) + lit(0.5)).cast("long")

  /** The compressed index: (neighbor_id, m, code_id) — one groupBy
    * argmin over the broadcast codebook (map-side partials via
    * `min(struct(...))`).
    */
  private[operators] def pqEncodeWithCodebook(embeddings: DataFrame,
      dim: Int, numSub: Int, cb: DataFrame): DataFrame = {
    require(dim % numSub == 0, "numSub must divide dim")
    subvecs(embeddings, "neighbor_id", numSub, dim / numSub)
      .join(broadcast(cb), Seq("m"))
      .withColumn("d2", d2ppm)
      .groupBy("neighbor_id", "m")
      .agg(min(struct(col("d2"), col("code_id"))).getField("code_id").as("code_id"))
  }

  /** The probes' ADC lookup tables (query_id, m, code_id, d2) —
    * probe-bounded (|probes|·numSub·numCodes rows) and consumed via
    * broadcast by the ADC scorers, so it is materialized once and the
    * broadcast carries a bounded artifact, not a replayed file scan.
    */
  private[operators] def pqProbeTable(probes: DataFrame, dim: Int,
      numSub: Int, cb: DataFrame): DataFrame = {
    require(dim % numSub == 0, "numSub must divide dim")
    subvecs(probes, "query_id", numSub, dim / numSub)
      .join(broadcast(cb), Seq("m"))
      .select(col("query_id"), col("m"), col("code_id"), d2ppm.as("d2"))
      .localCheckpoint()
  }

  /** IVF + PQ — the production ANN composition: the coarse quantizer
    * routes each corpus vector to one inverted list and each probe to
    * its `nprobe` nearest lists (exactly `ivfTopKSeeded`'s routing),
    * and the candidates inside those lists are scored with PQ's
    * compressed-code ADC instead of their raw vectors. At 100 TB this
    * is the whole point of both halves combined: IVF bounds WHICH
    * candidates are touched (nprobe/nlists of the corpus), PQ bounds
    * WHAT is read per candidate (bytes of codes, not float vectors) —
    * the raw embeddings are needed only at index-build time.
    *
    * EVERY broadcast here is bounded by the PROBE set (or the fixed
    * codebooks), never by the corpus: the probe routing (|probes|·
    * nprobe rows) and the probes' ADC tables (|probes|·numSub·numCodes
    * rows) broadcast; the corpus side — encoded codes and list
    * assignment, both O(N) — meets them through one shuffle equi-join
    * on `neighbor_id` (hinted shuffle-hash: at scale neither side is
    * broadcastable, and the hint keeps AQE from "helpfully" inlining
    * the corpus list map at test scale). Earlier form materialized the
    * candidate set (probeLists ⋈ corpusLists ≈ |probes|·nprobe·N/
    * nlists rows — linear in the corpus) and broadcast THAT; at 100×
    * it OOMs driver and executors alike. The broadcast frames are
    * `localCheckpoint`ed bounded artifacts, which PlanSpec asserts
    * structurally: no file scan appears under any BroadcastExchange.
    */
  def ivfPqTopKSeeded(embeddings: DataFrame, probes: DataFrame, k: Int,
      dim: Int, nprobe: Int = 4, nlists: Int = 8, numSub: Int = 8,
      numCodes: Int = 16): DataFrame = {
    val (enc, probeTable) = pqArtifacts(embeddings, probes, dim, numSub, numCodes)
    ivfPqAdcRank(embeddings, probes, k, nprobe,
      seededCodebook(embeddings, nlists), enc, probeTable)
  }

  /** IVF+PQ with BOTH tiers learned — the full production index build:
    * Lloyd-refined coarse codebook (`kmeansCodebook`, cosine metric)
    * for the routing and Lloyd-refined per-subspace codebooks
    * (`pqLearnedCodebooks`, L2 metric) for the ADC scoring. Identical
    * join shape to the seeded form (probe-bounded broadcasts, shuffle
    * equi-join for the corpus meet); spec-tested for recall vs the
    * exact path, like every learned variant.
    */
  def ivfPqTopKLearned(embeddings: DataFrame, probes: DataFrame, k: Int,
      dim: Int, nprobe: Int = 4, nlists: Int = 8, numSub: Int = 8,
      numCodes: Int = 16, iters: Int = 5, sampleN: Int = 512): DataFrame = {
    val sub = pqCodebooksDf(embeddings.sparkSession,
      pqLearnedCodebooks(embeddings, dim, numSub, numCodes, iters, sampleN))
    val (enc, probeTable) = pqArtifactsWithCodebook(embeddings, probes, dim, numSub, sub)
    ivfPqAdcRank(embeddings, probes, k, nprobe,
      kmeansCodebook(embeddings, nlists, iters, sampleN), enc, probeTable)
  }

  /** The shared IVF+PQ join shape over any coarse codebook + encoded
    * corpus/probe-table pair (see `ivfPqTopKSeeded` for the scale
    * contract on each join).
    */
  private def ivfPqAdcRank(embeddings: DataFrame, probes: DataFrame, k: Int,
      nprobe: Int, coarse: Array[Array[Double]], enc: DataFrame,
      probeTable: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    val cents = centroidsDf(spark, coarse)
    val corpusLists = nearestListIds(
      embeddings.select(col("vec_id").as("neighbor_id"),
        asDouble(col("embedding")).as("emb")), "neighbor_id", cents)
      .select("list_id", "neighbor_id")
    val probeLists = nearestLists(
      probes.select(col("vec_id").as("query_id"),
        asDouble(col("embedding")).as("emb")), "query_id", nprobe, cents)
      .select("list_id", "query_id")
      .localCheckpoint()
    val rank = Window.partitionBy("query_id").orderBy(col("sd"), col("neighbor_id"))
    enc.join(corpusLists.hint("shuffle_hash"), Seq("neighbor_id"))
      .join(broadcast(probeLists), Seq("list_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .join(broadcast(probeTable), Seq("query_id", "m", "code_id"))
      .groupBy("query_id", "neighbor_id").agg(sum(col("d2")).as("sd"))
      .withColumn("rank", row_number().over(rank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sd").cast("double") / lit(1000000.0), 6).as("approx_d2"))
      .orderBy("query_id", "rank")
  }

  /** IVF+PQ with EXACT re-ranking — the last tier of the production
    * ANN stack: PQ's ADC shortlist (top k·candMult per query) is
    * re-scored with exact cosines against the raw vectors and re-cut
    * to k, recovering most of the recall the compressed codes lose
    * (spec-tested against `bruteForceTopK`).
    *
    * Scale shape: the shortlist is PROBE-bounded (|probes|·k·candMult
    * id pairs), so fetching the raw vectors is one broadcast join the
    * corpus scan flows through map-side — the corpus never shuffles
    * and only shortlisted rows carry a vector; probe vectors broadcast
    * the same way. Output: (query_id, rank, neighbor_id, cosine).
    */
  def ivfPqTopKReranked(embeddings: DataFrame, probes: DataFrame, k: Int,
      dim: Int, nprobe: Int = 4, nlists: Int = 8, numSub: Int = 8,
      numCodes: Int = 16, candMult: Int = 4): DataFrame = {
    val shortlist = ivfPqTopKSeeded(embeddings, probes, k * candMult, dim,
      nprobe, nlists, numSub, numCodes)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint()
    rerankExact(embeddings, probes, shortlist, k)
  }

  /** Seeded ANN artifacts shared across tiers WITHIN one query: recall
    * reports (q129, q159) run several tiers over the SAME seeded
    * codebooks, and without sharing each tier silently re-encodes the
    * whole corpus. enc and probeTable are localCheckpointed — multiple
    * tiers re-join them (the derived-frame rule). Returns
    * (coarse codebook, encoded corpus, probe ADC table); feed them to
    * the `*With` variants below, which produce bit-identical results
    * to their self-building counterparts at the same parameters.
    */
  def seededAnnArtifacts(embeddings: DataFrame, probes: DataFrame, dim: Int,
      nlists: Int = 8, numSub: Int = 8, numCodes: Int = 16)
      : (Array[Array[Double]], DataFrame, DataFrame) = {
    val (enc, pt) = pqArtifacts(embeddings, probes, dim, numSub, numCodes)
    (seededCodebook(embeddings, nlists),
      enc.localCheckpoint(), pt.localCheckpoint())
  }

  /** PQ ADC top-k over prebuilt artifacts ([[seededAnnArtifacts]]). */
  def pqTopKWith(enc: DataFrame, probeTable: DataFrame, k: Int): DataFrame =
    pqAdcRank(enc, probeTable, k)

  /** IVF+PQ top-k over prebuilt artifacts ([[seededAnnArtifacts]]). */
  def ivfPqTopKWith(embeddings: DataFrame, probes: DataFrame, k: Int,
      nprobe: Int, coarse: Array[Array[Double]], enc: DataFrame,
      probeTable: DataFrame): DataFrame =
    ivfPqAdcRank(embeddings, probes, k, nprobe, coarse, enc, probeTable)

  /** Reranked IVF+PQ over prebuilt artifacts ([[seededAnnArtifacts]]). */
  def ivfPqTopKRerankedWith(embeddings: DataFrame, probes: DataFrame, k: Int,
      nprobe: Int, coarse: Array[Array[Double]], enc: DataFrame,
      probeTable: DataFrame, candMult: Int = 4): DataFrame = {
    val shortlist = ivfPqTopKWith(embeddings, probes, k * candMult, nprobe,
      coarse, enc, probeTable)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint()
    rerankExact(embeddings, probes, shortlist, k)
  }

  /** Exact-cosine re-rank of a probe-bounded (query, neighbor)
    * shortlist: the corpus scan flows through a broadcast join against
    * the shortlist to fetch raw vectors map-side (the corpus never
    * shuffles; only shortlisted rows carry a vector), probe vectors
    * broadcast the same way. Shared by the inline and persisted-index
    * ANN paths.
    */
  private[operators] def rerankExact(corpus: DataFrame, probes: DataFrame,
      shortlist: DataFrame, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val vecs = corpus.select(col("vec_id").as("neighbor_id"),
      asDouble(col("embedding")).as("c_emb"))
    val probeVecs = probes.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("q_emb")).localCheckpoint()
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    vecs.join(broadcast(shortlist), Seq("neighbor_id"))
      .join(broadcast(probeVecs), Seq("query_id"))
      .withColumn("cosine", round(cosineFast(spark)(col("q_emb"), col("c_emb")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  /** Per-vector norm / quantization profile — the storage-planning
    * numbers an embedding pipeline reports before switching to int8:
    * l2 norm, max |component| (the symmetric-quantization scale), and
    * the int8 round-trip reconstruction MSE.
    *
    * Pure map-side projection (one pass, no shuffle). `max_abs` is
    * bound as a COLUMN before the quantization lambda references it —
    * a lambda body re-evaluates outer non-column subexpressions per
    * element (the O(n²) HOF trap), a bound attribute is free.
    */
  def embeddingStats(embeddings: DataFrame): DataFrame = {
    val scale = 127
    embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("max_abs", array_max(transform(col("e"), x => abs(x))))
      .select(
        col("vec_id"),
        round(sqrt(aggregate(col("e"), lit(0.0), (a, x) => a + x * x)), 6).as("l2_norm"),
        round(col("max_abs"), 6).as("max_abs"),
        // all-zero vector: max_abs = 0 and the quantization divide would
        // throw DIVIDE_BY_ZERO under ANSI mode; the round-trip of the
        // zero vector is exact, so its MSE is 0 by definition
        when(col("max_abs") === 0, lit(0.0)).otherwise(
          round(aggregate(
            transform(col("e"), x =>
              pow(x - round(x * scale / col("max_abs")) * col("max_abs") / scale, 2)),
            lit(0.0), (a, x) => a + x) / size(col("e")), 6)).as("int8_mse"))
      .orderBy("vec_id")
  }

  /** Symmetric int8 quantization of the embedding column — the actual
    * storage-reduction projection (`embeddingStats` is its planning
    * profile): q = round(x · 127 / max|x|), per-vector scale. Exploded
    * (vec_id, dim, q) output so every value is scalar-comparable
    * cross-engine. Pure map-side projection; `max_abs` is bound as a
    * column before the lambdas reference it (HOF re-eval trap), and
    * the all-zero vector quantizes to zeros rather than dividing by
    * zero under ANSI.
    */
  def quantizeInt8(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("max_abs", array_max(transform(col("e"), x => abs(x))))
      .select(col("vec_id"), col("max_abs"),
        posexplode(when(col("max_abs") === 0, transform(col("e"), _ => lit(0)))
          .otherwise(transform(col("e"),
            x => round(x * 127 / col("max_abs")).cast("int"))))
          .as(Seq("dim", "q")))
      .select(col("vec_id"), col("dim"), col("q"),
        round(col("max_abs"), 6).as("max_abs"))
      .orderBy("vec_id", "dim")

  /** Per-label centroid, exploded form: (label, dim, centroid value).
    * `posexplode` + hash-aggregate — fully parallel, no collect, and
    * SQL-expressible for the oracle. The typed-Aggregator form (whole
    * vector per row) is `CentroidAggregator`.
    */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(asDouble(col("embedding"))).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(round(avg(col("v")), 6).as("centroid_v"))
      .orderBy("label", "dim")

  /** Per-label embedding diversity WITHOUT pairwise work: the mean
    * squared distance over all ordered pairs in a group satisfies
    * E||x−y||² = 2·(E||x||² − ||E x||²), so a statistic that is
    * naively O(n²) per group folds into two linear aggregates (mean
    * squared norm + dim-wise mean vector) and a tiny per-label join —
    * the algebraic identity IS the scale plan. Low values flag
    * near-duplicate-saturated or collapsed label groups.
    */
  def labelDiversity(embeddings: DataFrame): DataFrame = {
    val d = embeddings.select(col("label"), asDouble(col("embedding")).as("e"))
    val norms = d
      .select(col("label"),
        aggregate(col("e"), lit(0.0), (a, x) => a + x * x).as("sq"))
      .groupBy("label").agg(count(lit(1)).as("n"), avg(col("sq")).as("s"))
    val means = d
      .select(col("label"), posexplode(col("e")).as(Seq("dim", "v")))
      .groupBy("label", "dim").agg(avg(col("v")).as("m"))
      .groupBy("label").agg(sum(col("m") * col("m")).as("m2"))
    norms.join(means, Seq("label"))
      .select(col("label"), col("n"),
        round(lit(2.0) * (col("s") - col("m2")), 6).as("mean_sq_dist"))
      .orderBy("label")
  }

  /** Label-centroid affinity matrix: cosine between every pair of
    * label centroids — the k×k view that drives mixture design
    * (which sources/labels are semantically redundant). Centroids are
    * dim-wise means ROUNDED to 6dp before the cosine so the matrix is
    * cross-engine exact; the pairing is a self-join of the k-row
    * centroid table (k tiny — this is a report, not a corpus op).
    */
  def centroidAffinity(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    val cents = embeddings
      .select(col("label"), posexplode(asDouble(col("embedding"))).as(Seq("dim", "v")))
      .groupBy("label", "dim").agg(round(avg(col("v")), 6).as("m"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        s => s.getField("m")).as("c"))
      .localCheckpoint()
    // broadcast the (tiny, k-row) right side explicitly: a checkpointed
    // frame has unknown size stats, and an unhinted cross join of two
    // unknown-size sides plans a CartesianProduct
    cents.select(col("label").as("label_a"), col("c").as("ca"))
      .crossJoin(broadcast(cents.select(col("label").as("label_b"), col("c").as("cb"))))
      .filter(col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        round(cosineFast(spark)(col("ca"), col("cb")), 6).as("cosine"))
      .orderBy("label_a", "label_b")
  }

  /** SemDeDup (Abbas et al., arXiv:2303.09540): cluster-then-prune
    * semantic dedup — assign every vector to its nearest coarse
    * centroid, score cosine pairs ONLY within a cluster, connect the
    * above-threshold pairs, keep the min-id survivor per component.
    *
    * Scale shape: the codebook broadcasts (tiny), list assignment is
    * map-side, and the all-pairs work is confined to an equi-join on
    * `list_id` — per-cluster quadratic, corpus-wide linear in the sum
    * of |list|², tuned by `nlists` (the paper's k). The survivor pass
    * is the adaptive connected-components join. Near-dup pairs that
    * straddle a cluster boundary are missed — that is SemDeDup's
    * stated recall trade, priced against the LSH-pair path (q74).
    *
    * Uses the hash-seeded codebook so every step is SQL-expressible
    * (the q115 oracle); pass `kmeansCodebook(...)` to
    * [[semanticDedupWithCodebook]] for the learned production variant.
    *
    * The k-vs-N rule: per-list pair work is (N/nlists)² per list,
    * N²/nlists corpus-wide — a FIXED nlists is quadratic in the corpus
    * and only looks fine at fixture scale. When `nlists` is not
    * supplied it is derived from the corpus count as ⌈√N⌉, which keeps
    * per-list membership at √N (bounded task memory) and total pair
    * work at N^1.5; for strictly-linear total work supply
    * nlists = N/targetClusterSize instead — the price is an O(nlists)
    * codebook, which must stay driver-collectable. (SemDeDup's paper
    * tunes k in this same regime: cluster count grows with N.)
    */
  def semanticDedup(embeddings: DataFrame, threshold: Double,
      nlists: Int = 0): DataFrame =
    semanticDedupWithCodebook(embeddings, threshold,
      seededCodebook(embeddings,
        if (nlists > 0) nlists else autoNlists(embeddings)))

  /** ⌈√N⌉ — the default SemDeDup cluster count (one count() action). */
  def autoNlists(embeddings: DataFrame): Int =
    math.max(1, math.ceil(math.sqrt(embeddings.count().toDouble)).toInt)

  def semanticDedupWithCodebook(embeddings: DataFrame, threshold: Double,
      codebook: Array[Array[Double]]): DataFrame = {
    val spark = embeddings.sparkSession
    val centroids = centroidsDf(spark, codebook)
    val assigned = nearestLists(
      embeddings.select(col("vec_id"), asDouble(col("embedding")).as("emb")),
      "vec_id", 1, centroids)
      .select(col("list_id"), col("vec_id"), col("emb"))
      .localCheckpoint() // feeds both sides of the within-list self-join
    val a = assigned.select(col("list_id"), col("vec_id").as("id_a"), col("emb").as("emb_a"))
    val b = assigned.select(col("list_id"), col("vec_id").as("id_b"), col("emb").as("emb_b"))
    val pairs = a.join(b, Seq("list_id"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosineFast(spark)(col("emb_a"), col("emb_b")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
    Dedup.canonicalCorpus(
      embeddings.select(col("vec_id"), col("label")), pairs,
      "vec_id", "id_a", "id_b")
  }

  /** SemDeDup fed by a PERSISTED [[AnnIndex]]: the coarse routing is
    * read off the index's live enc layout (`AnnIndex.listAssignments`
    * — committed batches, tombstones masked) instead of re-assigning
    * the corpus to centroids per audit, so the encode amortizes into
    * the index build and embedding dedup becomes incremental: append
    * batches to the index, re-read assignments. An index built with
    * the same seeded codebook routes identically to the inline
    * [[semanticDedup]], so this shares q115's oracle verbatim.
    *
    * The within-list self-join carries ONLY (list_id, id) — vectors
    * attach AFTER the candidate join by two equi-joins against the
    * corpus projection (the `lshNeighborPairs` discipline; the inline
    * operator shuffles both vectors with every candidate row).
    * `vectors` is the lake's embedding table — the index stores codes,
    * not raw embeddings, and the exact-cosine verify reads each
    * surviving pair's two vectors once.
    */
  def semanticDedupFromIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, vectors: DataFrame, threshold: Double): DataFrame = {
    val assigned = AnnIndex.listAssignments(spark, indexPath)
      .localCheckpoint() // both sides of the within-list self-join
    val cand = assigned.select(col("list_id"), col("neighbor_id").as("id_a"))
      .join(assigned.select(col("list_id"), col("neighbor_id").as("id_b")),
        Seq("list_id"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val emb = vectors.select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val pairs = cand
      .join(emb.select(col("vec_id").as("id_a"), col("emb").as("emb_a")), Seq("id_a"))
      .join(emb.select(col("vec_id").as("id_b"), col("emb").as("emb_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosineFast(spark)(col("emb_a"), col("emb_b")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
    Dedup.canonicalCorpus(
      vectors.select(col("vec_id"), col("label")), pairs,
      "vec_id", "id_a", "id_b")
  }
}
