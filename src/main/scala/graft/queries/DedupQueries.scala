package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{EpochStore, IdempotentSink, Tables}
import graft.functions.Md5Family
import graft.operators._
import graft.queries.QueryHelpers._

/** Deduplication family: exact/MinHash-LSH/SimHash/n-gram-Jaccard near-dup, connected components + incremental canonicalization, CDC chunking, span removal, fuzzy join, decontamination and split-leakage checks.
  *
  * Split from the former ExtensionQueries monolith (round 7) — query
  * bodies, registration names, and oracle SQL are unchanged;
  * [[ExtensionQueries]] re-aggregates every domain map.
  */
object DedupQueries {
  type Q = (SparkSession, String) => DataFrame


  private val dedupExact: Q = (s, dir) =>
    Dedup.exactDedup(Tables.documents(s, dir), "text", "doc_id")
      .select(col("doc_id"), col("dup_count"))
      .orderBy("doc_id")


  // The registered hash-based queries use Md5Family (not the xxhash64
  // production default) so the driver's DuckDB oracle can hash-verify
  // them end-to-end — md5 exists identically in both engines.
  private val minhashLsh: Q = (s, dir) =>
    Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text", hashes = Md5Family)


  /** q191: sketch-accuracy audit — estimated vs EXACT Jaccard for
    * every q21 LSH candidate pair, so numPerm/bands are sized from
    * measured error, not folklore.
    */
  private val minhashCalib: Q = (s, dir) =>
    Dedup.minhashCalibration(Tables.documents(s, dir), "doc_id", "text",
      hashes = Md5Family)


  /** q232: near-superset containment over the LSH candidates — the
    * quote/extract/exact-dup regime a Jaccard threshold misses; exact
    * directional shingle-set ratios, ≥0.8 containment either way.
    */
  private val containmentQ: Q = (s, dir) =>
    Dedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text",
      thresholdPpm = 800000L, hashes = Md5Family)


  /** q248: blocking-scheme audit for record linkage over documents —
    * candidate-pair mass per cheap key, computed from block sizes
    * alone (no pairs materialize).
    */
  private val blockingQ: Q = (s, dir) =>
    Fuzzy.blockingAudit(Tables.documents(s, dir), "doc_id", "text")


  /** q235: the LSH banding-design report — per candidate pair, exact
    * Jaccard and the 16/8 banding's detection probability via a
    * fixed repeated-squaring chain (cross-engine-exact, no pow()).
    */
  private val lshDesignQ: Q = (s, dir) =>
    Dedup.lshDetectionReport(Tables.documents(s, dir), "doc_id", "text",
      hashes = Md5Family)


  private val simhashPairs: Q = (s, dir) =>
    Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text", hashes = Md5Family)


  private val ngramJaccard: Q = (s, dir) =>
    Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text")


  /** Dedup clustering: exact near-dup pairs → connected components →
    * (doc, cluster, size). Oracled via DuckDB's WITH RECURSIVE
    * transitive closure over the identical pair set.
    */
  private val dedupClusters: Q = (s, dir) => {
    // pairs off the shared PairStore (identical to the inline hashed
    // mining — PairStoreSpec pins the equivalence; q23 keeps inline
    // string keys as the byte-exact reference, q334 times the mining)
    val pairs = storedNgramPairs(s, dir)
    Dedup.connectedComponentsAuto(pairs, "doc_a", "doc_b").orderBy("doc_id")
  }


  /** The end product of the dedup family: the deduplicated corpus
    * itself — min-id survivor per near-dup cluster, with how many
    * duplicates each survivor absorbed. Oracled via the q57 recursive
    * transitive closure joined back to documents.
    */
  private val canonicalCorpusQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val pairs = storedNgramPairs(s, dir)
    Dedup.canonicalCorpus(docs, pairs, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("cluster_size"), col("removed_dups"))
      .orderBy("doc_id")
  }


  /** q171: quality-aware canonical selection — q59's clusters, but the
    * survivor is each cluster's LONGEST doc (n_chars DESC, doc_id tie),
    * the keep-the-best-extraction policy (`Dedup.canonicalCorpusBy`).
    */
  private val qualityCanonicalQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val pairs = storedNgramPairs(s, dir)
    Dedup.canonicalCorpusBy(docs, pairs, "doc_id", "n_chars")
      .select(col("doc_id"), col("n_chars"),
        col("cluster_size"), col("removed_dups"))
      .orderBy("doc_id")
  }


  /** The production (skew-capped) form of q23: shingles present in more
    * than maxDf documents are dropped from the inverted index before
    * the self-join. Its own DuckDB oracle — the cap is SQL-expressible.
    */
  private val ngramJaccardCapped: Q = (s, dir) =>
    // xxhash64 gram keys: the hash never reaches the output (pair
    // jaccards are counts over distinct grams, invariant under any
    // collision-free keying), so the cheaper codegen hash is safe even
    // though the oracle derives the same counts from md5'd grams
    Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
      maxDf = 50, gramHash = Some(graft.functions.XxHash64Family))


  /** Benchmark decontamination: treat source 'src0' as the eval set,
    * everything else as training; flag train docs sharing any 5-gram.
    */
  private val decontaminate: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    Decontamination.contaminated(
      docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"),
      "doc_id", "text", k = 5)
  }


  /** Bloom-prefiltered decontamination — exact same result as q64 (the
    * Bloom stage only gates the exchange; the verify join removes its
    * false positives), so it shares q64's oracle semantics verbatim.
    */
  private val decontaminateBloom: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    Decontamination.contaminatedBloom(
      docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"),
      "doc_id", "text", k = 5)
  }


  /** Embedding-space canonical dedup: LSH near-neighbor pairs (q26's
    * params) → star-contraction clustering → min-id survivor per
    * cluster. The full embedding-dedup pipeline an LLM-data run ships,
    * end-to-end in one plan, oracled through the recursive-closure SQL
    * rendering.
    */
  private val embeddingDedup: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    // the store's emb signal IS lshNeighborPairs(0.4) — q26 keeps the
    // inline operator as the reference
    val pairs = storedPairs(s, dir).filter(col("signal") === "emb")
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
    Dedup.canonicalCorpus(emb.select(col("vec_id"), col("label")), pairs,
      "vec_id", "id_a", "id_b")
      .select(col("vec_id"), col("label"), col("cluster_size"), col("removed_dups"))
      .orderBy("vec_id")
  }


  /** Incremental dedup: the corpus hash-split 50/50 into "existing"
    * and "incoming" halves; incoming docs near-duplicating an existing
    * doc via the cross-corpus MinHash-LSH join — the daily-ingest
    * dedup-against-index shape.
    */
  private val incrementalDedup: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val bucket = Sampling.hashBucket(col("doc_id"), 100, Md5Family)
    Dedup.minhashLshJoin(
      docs.filter(bucket >= 50), docs.filter(bucket < 50),
      "doc_id", "text", hashes = Md5Family)
  }


  /** Split-leakage report: near-duplicate pairs (MinHash-LSH, the q21
    * operator) that STRADDLE a train/test hash split — the
    * contamination a benchmark-honest pipeline must count before
    * training. 50/50 md5 split (an 80/20 split yields zero cross pairs
    * on the small fixtures; the rule matches q78's).
    */
  private val splitLeakage: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    // the MinHash pair set is NOT store-decomposable (corpus-dependent
    // hot-bucket caps), so it comes off the per-corpus-generation
    // EPOCH store — mined once by the unchanged q21 operator, read by
    // every audit of this generation; the one-shot oracle is unchanged
    // because the store holds exactly the inline mining's output
    val pairs = storedMinhashPairs(s, dir)
    val splits = docs.select(col("doc_id"),
      when(Md5Family.hash(col("doc_id").cast("string")) % 100 < 50, lit("train"))
        .otherwise(lit("test")).as("split"))
    pairs
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("split_a")), Seq("doc_a"))
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("split_b")), Seq("doc_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("split_a") =!= col("split_b"), 1L).otherwise(0L)).as("n_cross_pairs"))
      .select(col("n_pairs"), col("n_cross_pairs"),
        round(col("n_cross_pairs").cast("double") / col("n_pairs"), 6).as("leakage_ratio"))
  }


  /** Cross-source n-gram overlap matrix — per source pair, how many
    * distinct (DF-capped, hashed) shingles they share and the shingle
    * Jaccard: the corpus-governance number behind "these two crawls are
    * mostly the same site". Same capped hashed index as q62; the
    * per-source distinct index is tiny relative to the corpus, so the
    * pair join is source-cardinality-bounded.
    */
  private val sourceOverlap: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    // DF-capped index = corpus-dependent hot list = epoch-store signal
    // (same non-decomposability argument as q91's pairs); q62 keeps
    // the inline operator as the capped-mining reference
    val grams = storedCappedGrams(s, dir)
    val gs = grams
      .join(docs.select(col("doc_id").as("doc"), col("source")), Seq("doc"))
      .select("source", "g").distinct().localCheckpoint()
    val sizes = gs.groupBy("source").agg(count(lit(1)).as("n"))
    val shared = gs.select(col("g"), col("source").as("source_a"))
      .join(gs.select(col("g"), col("source").as("source_b")), Seq("g"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("source").as("source_a"), col("n").as("n_a")), Seq("source_a"))
      .join(sizes.select(col("source").as("source_b"), col("n").as("n_b")), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        round(col("n_shared").cast("double") / (col("n_a") + col("n_b") - col("n_shared")), 6)
          .as("gram_jaccard"))
      .orderBy("source_a", "source_b")
  }


  /** q106: CCNet-style segment-level boilerplate removal — 8-token
    * segments, dropped when shared by more than 2 distinct docs,
    * reassembled in order. Registered on Md5Family so the full
    * hash → DF-count → anti-join → reassembly pipeline is DuckDB-
    * verifiable; xxhash64 stays the production default.
    */
  private val segmentDedupQ: Q = (s, dir) =>
    Dedup.segmentDedup(Tables.documents(s, dir), "doc_id", "text",
      segLen = 8, maxDf = 2, hashes = Md5Family)
      .orderBy("doc_id")


  /** q111: duplicated-span removal — tokens covered by any 8-token
    * window occurring in ≥2 distinct docs are cut (the exact-substring
    * dedup pass, at any offset). Md5Family for the DuckDB oracle.
    */
  private val dupSpanQ: Q = (s, dir) =>
    Dedup.dupSpanRemoval(Tables.documents(s, dir), "doc_id", "text",
      spanLen = 8, minDf = 2, hashes = Md5Family)
      .orderBy("doc_id")


  /** q115: SemDeDup — within-cluster cosine pruning over the
    * hash-seeded coarse codebook, min-id survivors. The learned-
    * codebook variant stays spec-verified via
    * `semanticDedupWithCodebook(kmeansCodebook(...))`.
    */
  private val semdedupQ: Q = (s, dir) =>
    Similarity.semanticDedup(Tables.embeddings(s, dir), threshold = 0.4, nlists = 8)
      .orderBy("vec_id")


  /** q120: per-source dedup governance report — doc counts, canonical
    * survivors, removed duplicates, and retention share per source
    * (the q59 canonical corpus re-aggregated by provenance).
    */
  private val sourceDedupReportQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val pairs = storedNgramPairs(s, dir)
    val canon = Dedup.canonicalCorpus(docs, pairs, "doc_id")
    docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(canon.groupBy("source")
        .agg(count(lit(1)).as("n_survivors"),
          sum(col("removed_dups")).as("n_removed")), Seq("source"))
      .select(col("source"), col("n_docs"), col("n_survivors"), col("n_removed"),
        round(col("n_survivors").cast("double") / col("n_docs"), 6).as("retention"))
      .orderBy("source")
  }


  /** q125: SemDeDup with the AUTO cluster count — nlists = ⌈√N⌉
    * derived from the corpus (the k-vs-N rule; a fixed nlists is
    * quadratic in the corpus). Same threshold and codebook rule as
    * q115, so the two differ only in cluster granularity.
    */
  private val semdedupAutoQ: Q = (s, dir) =>
    Similarity.semanticDedup(Tables.embeddings(s, dir), threshold = 0.4)
      .orderBy("vec_id")


  /** q127: C4-style corpus cleaning — the composed keep/drop report
    * (length, stopword density, type-token ratio, fixed precedence).
    */
  private val cleanCorpusQ: Q = (s, dir) =>
    TextAnalysis.cleanCorpus(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_id")


  /** q130: INCREMENTAL canonicalization — the corpus's near-dup pairs
    * are split into a standing half (pairs among even doc ids, labeled
    * by full CC) and an arriving half (any pair touching an odd id),
    * and the arriving pairs fold into the standing labels via
    * `Dedup.assignToExistingClusters` — no global CC replay. The
    * oracle is q57's FULL recursive-CC over the whole pair set:
    * hash-equality proves incremental == full recompute, including
    * bridges that merge two standing components.
    */
  private val incrementalCanonQ: Q = (s, dir) => {
    val pairs = storedNgramPairs(s, dir).localCheckpoint()
    val oldPairs = pairs.filter(col("doc_a") % 2 === 0 && col("doc_b") % 2 === 0)
    val newPairs = pairs.filter(col("doc_a") % 2 =!= 0 || col("doc_b") % 2 =!= 0)
    val labels = Dedup.connectedComponentsAuto(oldPairs, "doc_a", "doc_b")
      .select("doc_id", "cluster_id")
    Dedup.assignToExistingClusters(labels, newPairs, "doc_a", "doc_b")
      .orderBy("doc_id")
  }


  /** q136: cross-document duplicated-chunk report over content-defined
    * chunks — the shift-robust complement to q106's fixed segments
    * (see `Dedup.contentDefinedChunks`). Md5Family so DuckDB replays
    * the boundary decisions and chunk fingerprints bit-for-bit.
    */
  private val cdcChunksQ: Q = (s, dir) => {
    val chunks = Dedup.contentDefinedChunks(
      Tables.documents(s, dir).select("doc_id", "text"),
      "doc_id", "text", divisor = 16, hashes = Md5Family)
    chunks.groupBy("chunk_hash")
      .agg(max("n_tokens").as("n_tokens"),
        countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") > 1)
      .orderBy(desc("n_docs"), desc("n_occurrences"), col("chunk_hash"))
  }


  /** q137: shift-robust near-dup pairs by shared CDC chunks — the
    * chunk index is ~16× smaller than q23's shingle index for the
    * same corpus, and alignment survives edits/insertions.
    */
  private val cdcPairsQ: Q = (s, dir) =>
    Dedup.cdcNearDupPairs(
      Tables.documents(s, dir).select("doc_id", "text"),
      "doc_id", "text", divisor = 16, minShared = 2, maxDf = 50L,
      hashes = Md5Family)
      .orderBy("doc_a", "doc_b")


  /** q138: exact edit-distance fuzzy key join (entity resolution) —
    * ED-Join prefix filtering makes it index-driven; the levenshtein
    * verify makes it exact, so the DuckDB oracle is the plain
    * quadratic join and must match bit-for-bit.
    */
  private val fuzzyJoinQ: Q = (s, dir) =>
    Fuzzy.editDistancePairs(
      Tables.customer(s, dir).select("c_custkey", "c_name"),
      "c_custkey", "c_name", maxDist = 1, q = 3)
      .orderBy("id_a", "id_b")


  /** The session-shared NEAR-DUP PAIR STORE per sf dir — built ONCE
    * (three doc-disjoint increments per signal, exercising the
    * new×new ∪ new×standing mining) and then READ by every audit that
    * needs the pair graph (q142/q180/q325/q329). This is the q326
    * ingest-once discipline applied to pair mining: before the store,
    * each of those audits re-mined both signals from raw text/vectors
    * in-query — the dominant cost of the governance tier. Build time
    * is BuildTiming-accounted (amortizable `build_s`), and `Bench`
    * prewarms it outside any timed window.
    *
    * Store pairs ≡ one-shot mining bit-for-bit (the PairStore
    * decomposition argument), so every store-fed query keeps its
    * one-shot DuckDB oracle unchanged.
    */
  private val sharedPairStoreByDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def sharedPairStore(s: SparkSession, dir: String): String =
    sharedPairStoreByDir.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files
        .createTempDirectory("graft_shared_pairs").toString + "/store"
      val docs = Tables.documents(s, dir)
      val emb = Tables.embeddings(s, dir)
      (0L to 2L).foreach { b =>
        PairStore.appendDocs(docs.filter(col("doc_id") % 3 === b),
          "doc_id", "text", path, b)
        PairStore.appendEmbeddings(emb.filter(col("vec_id") % 3 === b),
          emb, path, b, threshold = 0.4)
      }
      path
    })

  /** Pre-build the shared pair store outside any timed window (Bench's
    * warm-up calls this so the store-fed audits time pure query cost).
    */
  def prewarmSharedPairStore(s: SparkSession, dir: String): Unit = {
    sharedPairStore(s, dir); ()
  }

  /** The session-shared EPOCH store per sf dir — the rebuild-per-
    * corpus-generation tier for the pair signals that are NOT
    * incrementally decomposable and so can never join the PairStore:
    * the q21 MinHash-LSH pair set (corpus-dependent hot-bucket cap)
    * and the q62 DF-capped hashed shingle index (corpus-dependent hot
    * list). Each is mined ONCE per corpus generation by the unchanged
    * inline operator and published as a committed `epoch=N` dir
    * (`EpochStore`); the audits that need them (q91 split leakage,
    * q92 source overlap) read the committed artifact. Store read ≡
    * inline mining bit-for-bit (EpochStoreSpec pins it), so the
    * one-shot DuckDB oracles are unchanged. Build time is
    * BuildTiming-accounted; Bench/Verify prewarm it outside timed
    * windows.
    */
  private val sharedEpochStoreByDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def sharedEpochStore(s: SparkSession, dir: String): String =
    sharedEpochStoreByDir.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files
        .createTempDirectory("graft_epoch_store").toString + "/store"
      val docs = Tables.documents(s, dir)
      EpochStore.rebuild(s, s"$path/minhash_pairs", 0L,
        Dedup.minhashLshPairs(docs, "doc_id", "text", hashes = Md5Family))
      EpochStore.rebuild(s, s"$path/capped_grams", 0L,
        Dedup.shingleIndex(docs, "doc_id", "text", k = 3, maxDf = 50,
          gramHash = Some(Md5Family)))
      path
    })

  /** Pre-build the shared epoch store outside any timed window. */
  def prewarmSharedEpochStore(s: SparkSession, dir: String): Unit = {
    sharedEpochStore(s, dir); ()
  }

  /** q21's MinHash-LSH pair set off the committed epoch. */
  private def storedMinhashPairs(s: SparkSession, dir: String): DataFrame =
    EpochStore.read(s, s"${sharedEpochStore(s, dir)}/minhash_pairs")

  /** q62's DF-capped hashed shingle index off the committed epoch. */
  private def storedCappedGrams(s: SparkSession, dir: String): DataFrame =
    EpochStore.read(s, s"${sharedEpochStore(s, dir)}/capped_grams")

  private[queries] def storedPairs(s: SparkSession, dir: String): DataFrame =
    PairStore.pairs(s, sharedPairStore(s, dir))

  /** The text-signal edge set (doc_a, doc_b) off the shared store —
    * identical to inline `ngramJaccardPairs(..., XxHash64Family)`; the
    * read every downstream CC/canonical/audit consumer shares.
    */
  private def storedNgramPairs(s: SparkSession, dir: String): DataFrame =
    storedPairs(s, dir).filter(col("signal") === "ngram")
      .select("doc_a", "doc_b")

  /** q142: the FIX for the leakage q91 measures — split assignment by
    * near-dup cluster (q57's edge set and CC), so cross-split near-dup
    * pairs are zero by construction. Singletons degrade to the plain
    * per-doc hash split. Pairs come off the shared PairStore (signal
    * 'ngram' = the exact `ngramJaccardPairs` edge set); the oracle is
    * the unchanged one-shot mining chain.
    */
  private val clusterSplitQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val pairs = storedPairs(s, dir).filter(col("signal") === "ngram")
      .select("doc_a", "doc_b")
    Sampling.clusterAwareSplit(docs, "doc_id", pairs, "doc_a", "doc_b",
        hashes = Md5Family)
      .select(col("doc_id"), col("cluster_id"), col("split"))
      .orderBy("doc_id")
  }


  /** q155: Bloom runtime-filter semi join — orders restricted to one
    * customer segment's keys through a map-side `might_contain`
    * prefilter before the exact join (`BloomJoin.semiJoin`); the
    * result is identical to the plain semi join, so the oracle is the
    * plain IN-subquery.
    */
  private val bloomSemiJoinQ: Q = (s, dir) => {
    val segment = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
    BloomJoin.semiJoin(Tables.orders(s, dir), segment,
      "o_custkey", "c_custkey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 6).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** q180: ENSEMBLE leakage-safe split — the assignment unit is the
    * connected component of the UNION of near-dup signals (q57's
    * shingle-Jaccard pairs ∪ q26's embedding sign-LSH pairs), so
    * neither a verbatim copy NOR a paraphrase can straddle
    * train/test. q142 is the single-signal (text) form.
    */
  private val ensembleSplitQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    // both signals off the shared PairStore — the ensemble audit reads
    // the persisted edge set instead of re-mining text AND vectors
    val pairs = storedPairs(s, dir).select("doc_a", "doc_b")
    Sampling.clusterAwareSplit(docs, "doc_id",
      pairs, "doc_a", "doc_b", hashes = Md5Family)
      .select(col("doc_id"), col("cluster_id"), col("split"))
      .orderBy("doc_id")
  }

  /** q207: cross-source duplication matrix — which provenance slices
    * copy each other (exact-dup pairs per unordered source pair,
    * within-source on the diagonal).
    */
  private val crossSourceDupQ: Q = (s, dir) =>
    Profile.crossSourceDuplication(Tables.documents(s, dir), "doc_id",
      "text", "source")

  /** q319: WEIGHTED MinHash (Ioffe ICWS) near-dup pairs over token
    * frequencies — collision probability = weighted Jaccard. All the
    * "randomness" (the per-(token, hash) Gamma/uniform draws) derives
    * from Md5Family hashes, so the oracle replays the full chain:
    * params → log-space argmin (nano-quantized packed longs) →
    * bit_xor band keys → collision pairs → estimate BESIDE the exact
    * integer-tf weighted Jaccard. A wrong draw, a flipped argmin, or
    * a lost band collision all flip the hash. 2 bands × 8 rows — the
    * HIGH-threshold S-curve ((1/b)^(1/r) ≈ 0.92): this synthetic
    * corpus has a ~0.54 weighted-Jaccard template floor across ALL
    * doc pairs, so permissive banding (8×2) would collide ~every
    * pair (the quadratic trap); the tight curve keeps candidates to
    * the true near-dup mass.
    */
  private val weightedMinhashQ: Q = (s, dir) =>
    Dedup.weightedMinhashPairs(Tables.documents(s, dir), "doc_id", "text",
      numHashes = 16, bands = 2, minJw = 0.8, hashes = Md5Family)

  private val weightedMinhashOracle: String = {
    // KM-derived uniforms: ((h1 + (5i+j) * (h2 & 2^56-1)) & 2^60-1 + 1)
    // / 2^60 — exact integer ops, mirrored from Dedup's u(j)
    def u(j: Int) =
      s"""((((h1 + (5 * i + $j) * (h2 & 72057594037927935))
         | & 1152921504606846975) + 1) / 1152921504606846976e0)""".stripMargin
    s"""WITH tf AS MATERIALIZED (
       |  SELECT doc, token, CAST(count(*) AS BIGINT) AS w FROM (
       |    SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS token
       |    FROM documents) GROUP BY 1, 2),
       |base AS (SELECT token,
       |    ${md5l("token")} AS h1,
       |    ${md5l("'2_' || token")} AS h2
       |  FROM (SELECT DISTINCT token FROM tf)),
       |par AS (SELECT token, i, h1, h2,
       |    -ln(${u(1)} * ${u(2)}) AS r,
       |    -ln(${u(3)} * ${u(4)}) AS c,
       |    ${u(5)} AS beta
       |  FROM base
       |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i)),
       |st0 AS (SELECT f.doc, p.i, p.r, p.c, p.beta, p.h1, p.h2,
       |    CAST(floor(ln(CAST(f.w AS DOUBLE)) / p.r + p.beta) AS BIGINT)
       |      AS t
       |  FROM tf f JOIN par p ON p.token = f.token),
       |st AS (SELECT doc, i,
       |    ((CAST(round((ln(c) - r * (t - beta) - r) * 1e9) AS BIGINT)
       |        + 274877906944) << 24)
       |      | ((h1 + ((t % 1048576) + 7) * (h2 & 4398046511103))
       |        & 16777215) AS packed
       |  FROM st0),
       |sig AS MATERIALIZED (SELECT doc, i, min(packed) AS skey
       |  FROM st GROUP BY 1, 2),
       |bnd AS MATERIALIZED (SELECT doc, CAST(i // 8 AS INTEGER) AS band,
       |    bit_xor(skey) AS band_hash
       |  FROM sig GROUP BY 1, 2),
       |hot AS (SELECT band, band_hash FROM (
       |    SELECT band, band_hash, count(*) AS n FROM bnd GROUP BY 1, 2)
       |  WHERE n > 1000),
       |bc AS (SELECT b.* FROM bnd b WHERE NOT EXISTS (
       |    SELECT 1 FROM hot h
       |    WHERE h.band = b.band AND h.band_hash = b.band_hash)),
       |cand AS MATERIALIZED (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
       |  FROM bc a JOIN bc b ON a.band = b.band
       |    AND a.band_hash = b.band_hash AND a.doc < b.doc),
       |est AS (SELECT c.doc_a, c.doc_b,
       |    round(CAST(SUM(CASE WHEN sa.skey = sb.skey THEN 1 ELSE 0 END)
       |      AS DOUBLE) / 16, 6) AS est_jw
       |  FROM cand c
       |  JOIN sig sa ON sa.doc = c.doc_a
       |  JOIN sig sb ON sb.doc = c.doc_b AND sb.i = sa.i
       |  GROUP BY 1, 2),
       |tot AS (SELECT doc, CAST(SUM(w) AS BIGINT) AS tw FROM tf GROUP BY 1),
       |cm AS (SELECT c.doc_a, c.doc_b,
       |    CAST(SUM(least(fa.w, fb.w)) AS BIGINT) AS cmin
       |  FROM cand c
       |  JOIN tf fa ON fa.doc = c.doc_a
       |  JOIN tf fb ON fb.doc = c.doc_b AND fb.token = fa.token
       |  GROUP BY 1, 2)
       |SELECT c.doc_a, c.doc_b, e.est_jw,
       |  round(CAST(coalesce(cm.cmin, 0) AS DOUBLE)
       |    / CAST(ta.tw + tb.tw - coalesce(cm.cmin, 0) AS DOUBLE), 6) AS jw
       |FROM cand c
       |JOIN est e ON e.doc_a = c.doc_a AND e.doc_b = c.doc_b
       |LEFT JOIN cm ON cm.doc_a = c.doc_a AND cm.doc_b = c.doc_b
       |JOIN tot ta ON ta.doc = c.doc_a
       |JOIN tot tb ON tb.doc = c.doc_b
       |WHERE round(CAST(coalesce(cm.cmin, 0) AS DOUBLE)
       |    / CAST(ta.tw + tb.tw - coalesce(cm.cmin, 0) AS DOUBLE), 6)
       |  >= 0.8e0
       |ORDER BY c.doc_a, c.doc_b""".stripMargin
  }

  /** q325: TEMPORAL-split leakage audit over the q180 ensemble
    * components — the one split dimension (time) the hash (q91) and
    * cluster (q142/q180) audits don't cover. `doc_id` order plays
    * crawl/ingestion time; the 80/10/10 prefix split is the
    * train-on-the-past protocol, assigned by the distributed
    * prefix-sum rank (`Sampling.temporalSplit` — no corpus-scale
    * global window). Reported PER SIGNAL (n-gram Jaccard vs
    * embedding LSH — the q180 components separately, so a clean text
    * signal can't mask a leaking paraphrase signal): per-boundary
    * cross-pair counts and the total straddle ratio. The expected
    * contrast vs q91: near-dup mass concentrates locally in crawl
    * order, so a temporal cut leaks less than a hash cut — this
    * query measures that, per signal.
    */
  private val temporalLeakageQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    // per-signal pairs off the shared PairStore — formerly the suite's
    // most expensive query BECAUSE it re-mined both signals in-query
    val sp = Sampling.temporalSplit(docs, "doc_id", "doc_id")
      .localCheckpoint() // two join roles
    def cross(a: String, b: String) = sum(when(
      (col("s_a") === a && col("s_b") === b)
        || (col("s_a") === b && col("s_b") === a), 1L).otherwise(0L))
    storedPairs(s, dir).select("doc_a", "doc_b", "signal")
      .join(sp.select(col("doc_id").as("doc_a"), col("split").as("s_a")),
        Seq("doc_a"))
      .join(sp.select(col("doc_id").as("doc_b"), col("split").as("s_b")),
        Seq("doc_b"))
      .groupBy("signal")
      .agg(count(lit(1)).as("n_pairs"),
        cross("train", "val").as("n_train_val"),
        cross("train", "test").as("n_train_test"),
        cross("val", "test").as("n_val_test"))
      .withColumn("leakage_ratio",
        round((col("n_train_val") + col("n_train_test") + col("n_val_test"))
          .cast("double") / col("n_pairs"), 6))
      .orderBy("signal")
  }

  /** q329: the persisted pair store READ OUT as a first-class audited
    * artifact — every committed (signal, doc_a, doc_b, score) edge.
    * The store was built in three doc-disjoint increments per signal
    * (new×new ∪ new×standing each), so hash-matching the ONE-SHOT
    * mining oracle is the streamed ≡ one-shot proof for the whole
    * store-fed audit tier (q142/q180/q325 read these same rows).
    */
  private val pairStoreQ: Q = (s, dir) =>
    storedPairs(s, dir)
      .select(col("signal"), col("doc_a"), col("doc_b"), col("score"))
      .orderBy("signal", "doc_a", "doc_b")

  /** q334: the pair-store BUILD itself as a timed entry (the
    * q161_text_index_build pattern): with q57/q59/q74/q120/q130/q142/
    * q171/q180/q325/q333 all reading the prewarmed shared store, the
    * mining cost would otherwise vanish from the bench record — this
    * query builds a FRESH scratch store in three doc-disjoint
    * increments per signal and reports the per-signal edge summary.
    * BuildTiming wraps the appends, so BENCH.json's build_s shows the
    * amortizable share explicitly. Oracle = the one-shot mining
    * aggregated to the same summary (scores as exact µ-units).
    */
  private val pairStoreBuildQ: Q = (s, dir) => {
    val scratch = java.nio.file.Files.createTempDirectory("graft_q334_ps")
    val path = scratch.toString + "/store"
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir)
    // the two signals write DISJOINT store roots (grams/sizes/
    // text_pairs vs sig/emb_pairs) and the store's single-writer
    // discipline is PER SIGNAL — so the text and embedding chains mine
    // concurrently (batch order stays sequential within each chain),
    // the same overlap a production text stream + embedding stream
    // would give. Wall time ≈ max(chain) instead of sum.
    inParallel(
      () => (0L to 2L).foreach { b =>
        PairStore.appendDocs(docs.filter(col("doc_id") % 3 === b),
          "doc_id", "text", path, b)
      },
      () => (0L to 2L).foreach { b =>
        PairStore.appendEmbeddings(emb.filter(col("vec_id") % 3 === b),
          emb, path, b, threshold = 0.4)
      })
    val out = PairStore.pairs(s, path)
      .groupBy("signal")
      .agg(count(lit(1)).as("n_pairs"),
        sum(round(col("score") * 1e6).cast("long")).as("score_sum_us"))
      .orderBy("signal")
      .localCheckpoint() // materialize before the scratch delete
    deleteRecursively(s, scratch.toString)
    out
  }

  /** q337: the EPOCH-STORE build itself as a timed entry (q334's
    * pattern applied to the non-decomposable signals): with q91/q92
    * reading the prewarmed shared epoch store, the once-per-corpus-
    * generation mining cost would otherwise vanish from the bench
    * record — this query rebuilds a FRESH scratch epoch (both
    * signals: q21's capped MinHash pairs, q62's DF-capped gram index)
    * and reports each signal's row count plus a bit_xor content
    * fingerprint (md5 of the canonical row rendering — xor, not sum:
    * the ANSI-overflow-safe set hash for distinct rows).
    * `EpochStore.rebuild` is BuildTiming-wrapped, so BENCH.json's
    * build_s isolates the amortizable epoch cost explicitly. Oracle =
    * the same two one-shot mining chains reduced to the same summary.
    */
  private val epochStoreBuildQ: Q = (s, dir) => {
    val scratch = java.nio.file.Files.createTempDirectory("graft_q337_es")
    val path = scratch.toString + "/store"
    val docs = Tables.documents(s, dir)
    // the two signals publish to DISJOINT epoch roots with no ordering
    // contract between them — rebuild concurrently (wall ≈ max, not sum)
    inParallel(
      () => EpochStore.rebuild(s, s"$path/minhash_pairs", 0L,
        Dedup.minhashLshPairs(docs, "doc_id", "text", hashes = Md5Family)),
      () => EpochStore.rebuild(s, s"$path/capped_grams", 0L,
        Dedup.shingleIndex(docs, "doc_id", "text", k = 3, maxDf = 50,
          gramHash = Some(Md5Family))))
    val mh = EpochStore.read(s, s"$path/minhash_pairs")
      .select(Md5Family.hash(concat_ws("_", col("doc_a"), col("doc_b"),
        round(col("est_jaccard") * 1e6).cast("long"))).as("h"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("fp"))
      .select(lit("minhash_pairs").as("signal"), col("n_rows"), col("fp"))
    val cg = EpochStore.read(s, s"$path/capped_grams")
      .select(Md5Family.hash(concat_ws("_", col("doc"), col("g"))).as("h"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("fp"))
      .select(lit("capped_grams").as("signal"), col("n_rows"), col("fp"))
    val out = mh.union(cg).orderBy("signal")
      .localCheckpoint() // materialize before the scratch delete
    deleteRecursively(s, scratch.toString)
    out
  }

  val queries: Map[String, Q] = Map(
    "q337_epoch_store_build" -> epochStoreBuildQ,
    "q334_pair_store_build" -> pairStoreBuildQ,
    "q329_pair_store" -> pairStoreQ,
    "q325_temporal_leakage" -> temporalLeakageQ,
    "q319_weighted_minhash" -> weightedMinhashQ,
    "q207_cross_source_dups" -> crossSourceDupQ,
    "q180_ensemble_split" -> ensembleSplitQ,
    "q155_bloom_semi_join" -> bloomSemiJoinQ,
    "q142_cluster_split" -> clusterSplitQ,
    "q138_fuzzy_join" -> fuzzyJoinQ,
    "q137_cdc_pairs" -> cdcPairsQ,
    "q136_cdc_chunks" -> cdcChunksQ,
    "q130_incremental_canon" -> incrementalCanonQ,
    "q127_clean_corpus" -> cleanCorpusQ,
    "q125_semdedup_auto" -> semdedupAutoQ,
    "q120_source_dedup_report" -> sourceDedupReportQ,
    "q115_semdedup" -> semdedupQ,
    "q111_dup_span_removal" -> dupSpanQ,
    "q106_segment_dedup" -> segmentDedupQ,
    "q91_split_leakage" -> splitLeakage,
    "q92_source_overlap" -> sourceOverlap,
    "q171_quality_canonical" -> qualityCanonicalQ,
    "q59_canonical_corpus" -> canonicalCorpusQ,
    "q71_decontaminate_bloom" -> decontaminateBloom,
    "q74_embedding_dedup" -> embeddingDedup,
    "q78_incremental_dedup" -> incrementalDedup,
    "q62_ngram_jaccard_capped" -> ngramJaccardCapped,
    "q64_decontaminate" -> decontaminate,
    "q57_dedup_clusters" -> dedupClusters,
    "q20_dedup_exact" -> dedupExact,
    "q21_minhash_lsh" -> minhashLsh,
    "q22_simhash_pairs" -> simhashPairs,
    "q23_ngram_jaccard" -> ngramJaccard,
    "q191_minhash_calib" -> minhashCalib,
    "q232_containment" -> containmentQ,
    "q235_lsh_design" -> lshDesignQ,
    "q248_blocking" -> blockingQ)

  /** The q191/q232 shared chain: Md5Family minhash bands →
    * bucket-capped candidate pairs → exact hashed-shingle sets,
    * sizes, and pairwise intersections. Verbatim the former q191
    * prefix; q232 reads cand/gset/sz/iv (est prunes away unused).
    */
  private lazy val minhashExactSetCtes: String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
      |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
      |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
      |g AS (SELECT doc_id, unnest(grams) AS g FROM sh),
      |h AS (SELECT doc_id, ${md5l("g")} % 1125899906842624 AS h1,
      |    ${md5l("concat('2_', g)")} % 1125899906842624 AS h2 FROM g),
      |mh AS (SELECT doc_id, p, min((h1 + p * h2) % 1125899906842624) AS mh
      |  FROM h, generate_series(0, 15) AS gs(p) GROUP BY doc_id, p),
      |bands AS (SELECT doc_id, CAST(p // 2 AS INTEGER) AS band,
      |    string_agg(CAST(mh AS VARCHAR), ',' ORDER BY p) AS band_str
      |  FROM mh GROUP BY doc_id, p // 2),
      |bh AS (SELECT doc_id, band,
      |    ${md5l("concat(band_str, '_', band)")} AS band_hash FROM bands),
      |capped AS (SELECT * FROM bh
      |  QUALIFY count(*) OVER (PARTITION BY band, band_hash) <= 1000),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM capped a JOIN capped b
      |    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
      |est AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_match
      |  FROM mh a JOIN mh b ON a.p = b.p
      |  JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
      |  GROUP BY 1, 2),
      |gset AS (SELECT DISTINCT doc_id, ${md5l("g")} AS gh FROM g),
      |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM gset GROUP BY 1),
      |iv AS (SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_inter
      |  FROM cand c JOIN gset a ON a.doc_id = c.doc_a
      |  JOIN gset b ON b.doc_id = c.doc_b AND b.gh = a.gh GROUP BY 1, 2)"""
      .stripMargin

  val oracleSql: Map[String, String] = Map(
    "q319_weighted_minhash" -> weightedMinhashOracle,
    // q248: block-size counts only; pair mass Σ C(n,2) exact, the two
    // ratios one float expression each.
    "q248_blocking" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |ft AS (SELECT lower(string_split(text, ' ')[1]) AS k
        |  FROM documents),
        |lb AS (SELECT CAST(length(text) // 16 AS VARCHAR) AS k
        |  FROM documents),
        |p4 AS (SELECT lower(substr(text, 1, 4)) AS k FROM documents),
        |a AS (
        |  SELECT 'first_token' AS scheme, CAST(count(*) AS BIGINT)
        |      AS n_blocks, CAST(MAX(c) AS BIGINT) AS max_block,
        |    CAST(coalesce(SUM(c * (c - 1) // 2), 0) AS BIGINT)
        |      AS cand_pairs
        |  FROM (SELECT k, count(*) AS c FROM ft GROUP BY 1)
        |  UNION ALL
        |  SELECT 'len_bucket', CAST(count(*) AS BIGINT),
        |    CAST(MAX(c) AS BIGINT),
        |    CAST(coalesce(SUM(c * (c - 1) // 2), 0) AS BIGINT)
        |  FROM (SELECT k, count(*) AS c FROM lb GROUP BY 1)
        |  UNION ALL
        |  SELECT 'prefix4', CAST(count(*) AS BIGINT),
        |    CAST(MAX(c) AS BIGINT),
        |    CAST(coalesce(SUM(c * (c - 1) // 2), 0) AS BIGINT)
        |  FROM (SELECT k, count(*) AS c FROM p4 GROUP BY 1))
        |SELECT scheme, n_blocks, max_block, cand_pairs,
        |  CASE WHEN n > 1 THEN ROUND(1e0 - CAST(cand_pairs AS DOUBLE)
        |    / CAST(n * (n - 1) // 2 AS DOUBLE), 6) END AS reduction,
        |  CASE WHEN cand_pairs > 0 THEN
        |    ROUND(CAST(max_block * (max_block - 1) // 2 AS DOUBLE)
        |      / CAST(cand_pairs AS DOUBLE), 6) END AS max_block_share
        |FROM a CROSS JOIN n ORDER BY scheme""".stripMargin,
    // q235: the staged x2/x4 squaring chain mirrors the Spark column
    // graph exactly — identical IEEE multiply order, nano floor.
    "q235_lsh_design" ->
      s"""WITH $minhashExactSetCtes,
        |p0 AS (SELECT c.doc_a, c.doc_b, coalesce(iv.n_inter, 0) AS n_inter,
        |    sa.n + sb.n - coalesce(iv.n_inter, 0) AS n_union
        |  FROM cand c LEFT JOIN iv USING (doc_a, doc_b)
        |  JOIN sz sa ON sa.doc_id = c.doc_a
        |  JOIN sz sb ON sb.doc_id = c.doc_b),
        |p1 AS (SELECT *, CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE)
        |    AS j FROM p0),
        |p2 AS (SELECT *, 1e0 - j * j AS x FROM p1),
        |p3 AS (SELECT *, x * x AS x2 FROM p2),
        |p4 AS (SELECT *, x2 * x2 AS x4 FROM p3)
        |SELECT doc_a, doc_b, n_inter, n_union,
        |  (n_inter * 1000000) // n_union AS exact_ppm,
        |  ROUND(CAST(floor((1e0 - x4 * x4) * 1000000000e0 + 0.5e0)
        |    AS BIGINT) / 1000000000e0, 6) AS detect_p
        |FROM p4 ORDER BY doc_a, doc_b""".stripMargin,
    // q232: the q191 chain's exact sets re-read for directional
    // containment; every ratio one floored integer division.
    "q232_containment" ->
      s"""WITH $minhashExactSetCtes
        |SELECT doc_a, doc_b, n_a, n_b, n_inter, cont_a_ppm, cont_b_ppm,
        |  jaccard_ppm FROM (
        |  SELECT c.doc_a, c.doc_b, sa.n AS n_a, sb.n AS n_b,
        |    coalesce(iv.n_inter, 0) AS n_inter,
        |    (coalesce(iv.n_inter, 0) * 1000000) // sa.n AS cont_a_ppm,
        |    (coalesce(iv.n_inter, 0) * 1000000) // sb.n AS cont_b_ppm,
        |    (coalesce(iv.n_inter, 0) * 1000000)
        |      // (sa.n + sb.n - coalesce(iv.n_inter, 0)) AS jaccard_ppm
        |  FROM cand c LEFT JOIN iv USING (doc_a, doc_b)
        |  JOIN sz sa ON sa.doc_id = c.doc_a
        |  JOIN sz sb ON sb.doc_id = c.doc_b)
        |WHERE greatest(cont_a_ppm, cont_b_ppm) >= 800000
        |ORDER BY doc_a, doc_b""".stripMargin,
    // q207: q106's segment CTEs (8-token windows), string segments
    // exact where Spark moves xxhash64 keys; pair arithmetic exact
    // (n(n-1)//2 within, na*nb across), unordered pairs via src <=.
    "q207_cross_source_dups" ->
      """WITH toks AS (SELECT source AS src, string_split(text, ' ') AS t
        |  FROM documents),
        |segarr AS (SELECT src,
        |    [array_to_string(t[i:i+7], ' ')
        |     FOR i IN generate_series(1, GREATEST(len(t), 1), 8)] AS segs
        |  FROM toks),
        |seg AS (SELECT src, segs[i] AS segment FROM segarr,
        |  LATERAL (SELECT unnest(generate_series(1, len(segs))) AS i) gs),
        |g AS (SELECT segment, src, CAST(count(*) AS BIGINT) AS n
        |  FROM seg GROUP BY 1, 2),
        |j AS (SELECT a.src AS src_a, b.src AS src_b,
        |    CASE WHEN a.src = b.src THEN a.n * (a.n - 1) // 2
        |         ELSE a.n * b.n END AS pairs
        |  FROM g a JOIN g b ON a.segment = b.segment AND a.src <= b.src)
        |SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_digests,
        |  CAST(SUM(pairs) AS BIGINT) AS n_pairs
        |FROM j WHERE pairs > 0 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q191: q21's chain without the threshold, matches kept as exact
    // integers, joined to the exact shingle-set intersection/union;
    // est_ppm = n_match·62500 exactly (16 divides 1e6), exact_ppm
    // floors one division of exact ints.
    "q191_minhash_calib" ->
      s"""WITH $minhashExactSetCtes
        |SELECT doc_a, doc_b, n_match, n_inter, n_union, est_ppm, exact_ppm,
        |  est_ppm - exact_ppm AS err_ppm FROM (
        |  SELECT e.doc_a, e.doc_b, e.n_match,
        |    coalesce(iv.n_inter, 0) AS n_inter,
        |    sa.n + sb.n - coalesce(iv.n_inter, 0) AS n_union,
        |    e.n_match * 62500 AS est_ppm,
        |    CAST(floor(CAST(coalesce(iv.n_inter, 0) AS DOUBLE) * 1000000e0
        |      / (sa.n + sb.n - coalesce(iv.n_inter, 0))) AS BIGINT) AS exact_ppm
        |  FROM est e LEFT JOIN iv USING (doc_a, doc_b)
        |  JOIN sz sa ON sa.doc_id = e.doc_a
        |  JOIN sz sb ON sb.doc_id = e.doc_b)
        |ORDER BY doc_a, doc_b""".stripMargin,
    // q155: the Bloom prefilter is invisible to results (false
    // positives die in the exact join, false negatives impossible) —
    // the oracle is the PLAIN semi join.
    "q155_bloom_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 6) AS sum_price
        |FROM orders WHERE o_custkey IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q334: the store-build summary — the same tjp/ejp one-shot mining
    // reduced to per-signal counts and exact µ-unit score sums.
    "q334_pair_store_build" ->
      s"""WITH $lshCandCtes,
        |toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |g AS (SELECT DISTINCT doc_id, unnest(grams) AS g FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |cpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |           FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |tjp AS (SELECT doc_a, doc_b,
        |         ROUND(CAST(common AS DOUBLE)/(sa.n + sb.n - common), 6) AS score
        |       FROM cpairs
        |       JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        |       WHERE ROUND(CAST(common AS DOUBLE)/(sa.n + sb.n - common), 6) >= 0.5),
        |ejp AS (SELECT id_a AS doc_a, id_b AS doc_b,
        |         ROUND(list_cosine_similarity(ea.e, eb.e), 6) AS score
        |  FROM cand
        |  JOIN emb ea ON ea.vec_id = id_a JOIN emb eb ON eb.vec_id = id_b
        |  WHERE ROUND(list_cosine_similarity(ea.e, eb.e), 6) >= 0.4),
        |lab AS (SELECT 'ngram' AS signal, score FROM tjp
        |        UNION ALL SELECT 'emb', score FROM ejp)
        |SELECT signal, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(CAST(round(score * 1e6) AS BIGINT)) AS BIGINT)
        |    AS score_sum_us
        |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin,
    // q329: the one-shot mining of BOTH signals (q325's tjp/ejp CTEs
    // with their scores kept) — the store's three-increment build must
    // reproduce it bit-for-bit, scores included.
    "q329_pair_store" ->
      s"""WITH $lshCandCtes,
        |toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |g AS (SELECT DISTINCT doc_id, unnest(grams) AS g FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |cpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |           FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |tjp AS (SELECT doc_a, doc_b,
        |         ROUND(CAST(common AS DOUBLE)/(sa.n + sb.n - common), 6) AS score
        |       FROM cpairs
        |       JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        |       WHERE ROUND(CAST(common AS DOUBLE)/(sa.n + sb.n - common), 6) >= 0.5),
        |ejp AS (SELECT id_a AS doc_a, id_b AS doc_b,
        |         ROUND(list_cosine_similarity(ea.e, eb.e), 6) AS score
        |  FROM cand
        |  JOIN emb ea ON ea.vec_id = id_a JOIN emb eb ON eb.vec_id = id_b
        |  WHERE ROUND(list_cosine_similarity(ea.e, eb.e), 6) >= 0.4)
        |SELECT signal, doc_a, doc_b, score FROM (
        |  SELECT 'ngram' AS signal, doc_a, doc_b, score FROM tjp
        |  UNION ALL SELECT 'emb', doc_a, doc_b, score FROM ejp)
        |ORDER BY signal, doc_a, doc_b""".stripMargin,
    // q325: q180's tjp/ejp pair CTEs verbatim (no closure needed —
    // the audit counts straddling PAIRS, not clusters), split by
    // row_number over doc_id order with exact r*100 <= pct*N band
    // compares (the Spark side computes the same rank distributed).
    "q325_temporal_leakage" ->
      s"""WITH $lshCandCtes,
        |toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |g AS (SELECT DISTINCT doc_id, unnest(grams) AS g FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |cpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |           FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |tjp AS (SELECT doc_a, doc_b FROM cpairs
        |       JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        |       WHERE ROUND(CAST(common AS DOUBLE)/(sa.n + sb.n - common), 6) >= 0.5),
        |ejp AS (SELECT id_a AS doc_a, id_b AS doc_b FROM cand
        |  JOIN emb ea ON ea.vec_id = id_a JOIN emb eb ON eb.vec_id = id_b
        |  WHERE ROUND(list_cosine_similarity(ea.e, eb.e), 6) >= 0.4),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |sp AS (SELECT doc_id,
        |    CASE WHEN r * 100 <= 80 * n THEN 'train'
        |         WHEN r * 100 <= 90 * n THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM (SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS r
        |        FROM documents) CROSS JOIN nn),
        |lab AS (SELECT 'ngram' AS signal, doc_a, doc_b FROM tjp
        |        UNION ALL SELECT 'emb', doc_a, doc_b FROM ejp),
        |j AS (SELECT signal, sa.split AS s_a, sb.split AS s_b
        |  FROM lab JOIN sp sa ON sa.doc_id = lab.doc_a
        |  JOIN sp sb ON sb.doc_id = lab.doc_b)
        |SELECT signal, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(CASE WHEN (s_a = 'train' AND s_b = 'val')
        |    OR (s_a = 'val' AND s_b = 'train') THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_train_val,
        |  CAST(SUM(CASE WHEN (s_a = 'train' AND s_b = 'test')
        |    OR (s_a = 'test' AND s_b = 'train') THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_train_test,
        |  CAST(SUM(CASE WHEN (s_a = 'val' AND s_b = 'test')
        |    OR (s_a = 'test' AND s_b = 'val') THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_val_test,
        |  round(CAST(SUM(CASE WHEN s_a <> s_b THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS leakage_ratio
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // q142: q57's recursive-CC cluster assignment, then the split is a
    // pure md5 of the CLUSTER id; docs outside every pair fall back to
    // their own id (singleton clusters).
    // q180: q142's closure over the UNION of the text jp (shingle
    // Jaccard) and the embedding jp (q26's seeded sign-LSH chain,
    // lshCandCtes) — same md5-of-cluster split.
    "q180_ensemble_split" ->
      s"""WITH RECURSIVE $lshCandCtes,
        |toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |g AS (SELECT DISTINCT doc_id, unnest(grams) AS g FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |cpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |           FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |tjp AS (SELECT doc_a, doc_b FROM cpairs
        |       JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        |       WHERE ROUND(CAST(common AS DOUBLE)/(sa.n + sb.n - common), 6) >= 0.5),
        |ejp AS (SELECT id_a AS doc_a, id_b AS doc_b FROM cand
        |  JOIN emb ea ON ea.vec_id = id_a JOIN emb eb ON eb.vec_id = id_b
        |  WHERE ROUND(list_cosine_similarity(ea.e, eb.e), 6) >= 0.4),
        |jp AS (SELECT * FROM tjp UNION SELECT * FROM ejp),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM jp
        |          UNION SELECT doc_b, doc_a FROM jp
        |          UNION SELECT doc_a, doc_a FROM jp UNION SELECT doc_b, doc_b FROM jp),
        |reach AS (SELECT u, v FROM edges
        |          UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        |cl AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
        |alld AS (SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS cluster_id
        |         FROM documents d LEFT JOIN cl USING (doc_id))
        |SELECT doc_id, cluster_id,
        |  CASE WHEN ${md5l("CAST(cluster_id AS VARCHAR)")} % 100 < 80 THEN 'train'
        |       WHEN ${md5l("CAST(cluster_id AS VARCHAR)")} % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM alld ORDER BY doc_id""".stripMargin,
    "q142_cluster_split" ->
      s"""WITH RECURSIVE toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |g AS (SELECT DISTINCT doc_id, unnest(grams) AS g FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |cpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |           FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |jp AS (SELECT doc_a, doc_b FROM cpairs
        |       JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        |       WHERE ROUND(CAST(common AS DOUBLE)/(sa.n + sb.n - common), 6) >= 0.5),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM jp
        |          UNION SELECT doc_b, doc_a FROM jp
        |          UNION SELECT doc_a, doc_a FROM jp UNION SELECT doc_b, doc_b FROM jp),
        |reach AS (SELECT u, v FROM edges
        |          UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        |cl AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
        |alld AS (SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS cluster_id
        |         FROM documents d LEFT JOIN cl USING (doc_id))
        |SELECT doc_id, cluster_id,
        |  CASE WHEN ${md5l("CAST(cluster_id AS VARCHAR)")} % 100 < 80 THEN 'train'
        |       WHEN ${md5l("CAST(cluster_id AS VARCHAR)")} % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM alld ORDER BY doc_id""".stripMargin,
    // q138: the oracle is the definitionally-exact quadratic join;
    // Spark's index-driven plan must reproduce it bit-for-bit.
    "q138_fuzzy_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_custkey < b.c_custkey
        | AND abs(length(a.c_name) - length(b.c_name)) <= 1
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    // q137: q136's chunk CTEs + a per-doc-distinct, DF-capped
    // inverted-index pair join. One double division at the very end.
    "q137_cdc_pairs" ->
      s"""WITH toks AS (SELECT doc_id, i - 1 AS pos, t[i] AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |  LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) gs),
        |b AS (SELECT doc_id, pos, tok,
        |  CASE WHEN lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
        |        AND (${md5l("tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos)")} % 16) = 0
        |       THEN 1 ELSE 0 END AS f
        |  FROM toks),
        |c AS (SELECT doc_id, pos, tok,
        |  coalesce(sum(f) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
        |  FROM b),
        |ch AS (SELECT doc_id, chunk_id,
        |  ${md5l("string_agg(tok, ' ' ORDER BY pos)")} AS chunk_hash
        |  FROM c GROUP BY doc_id, chunk_id),
        |idx AS (SELECT DISTINCT doc_id, chunk_hash FROM ch),
        |hot AS (SELECT chunk_hash FROM
        |  (SELECT chunk_hash, count(*) AS df FROM idx GROUP BY chunk_hash)
        |  WHERE df > 50),
        |kept AS (SELECT * FROM idx
        |  WHERE chunk_hash NOT IN (SELECT chunk_hash FROM hot)),
        |n AS (SELECT doc_id, count(*) AS n_chunks FROM kept GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    count(*) AS shared_chunks
        |  FROM kept a JOIN kept b
        |    ON a.chunk_hash = b.chunk_hash AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT doc_a, doc_b, shared_chunks,
        |  na.n_chunks AS n_a, nb.n_chunks AS n_b,
        |  round(CAST(shared_chunks AS DOUBLE)
        |    / LEAST(na.n_chunks, nb.n_chunks), 6) AS overlap
        |FROM p
        |JOIN n na ON doc_a = na.doc_id
        |JOIN n nb ON doc_b = nb.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin,
    // q136: DuckDB replays the CDC boundary rule (bigram md5 % 16)
    // and chunk fingerprints with the same window algebra.
    "q136_cdc_chunks" ->
      s"""WITH toks AS (SELECT doc_id, i - 1 AS pos, t[i] AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |  LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) gs),
        |b AS (SELECT doc_id, pos, tok,
        |  CASE WHEN lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
        |        AND (${md5l("tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos)")} % 16) = 0
        |       THEN 1 ELSE 0 END AS f
        |  FROM toks),
        |c AS (SELECT doc_id, pos, tok,
        |  coalesce(sum(f) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
        |  FROM b),
        |ch AS (SELECT doc_id, chunk_id,
        |  ${md5l("string_agg(tok, ' ' ORDER BY pos)")} AS chunk_hash,
        |  count(*) AS n_tokens
        |  FROM c GROUP BY doc_id, chunk_id)
        |SELECT chunk_hash, max(n_tokens) AS n_tokens,
        |  count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
        |FROM ch GROUP BY chunk_hash
        |HAVING count(DISTINCT doc_id) > 1
        |ORDER BY n_docs DESC, n_occurrences DESC, chunk_hash""".stripMargin,
    // q130's oracle is q57's full-recompute CC over the ENTIRE pair
    // set — the Spark side computes it incrementally (standing labels
    // + arriving batch), so the hash match IS the incremental==full
    // equivalence proof.
    "q130_incremental_canon" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |g AS (SELECT DISTINCT doc_id, unnest(grams) AS g FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |cpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |           FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |jp AS (SELECT doc_a, doc_b FROM cpairs
        |       JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        |       WHERE ROUND(CAST(common AS DOUBLE)/(sa.n + sb.n - common), 6) >= 0.5),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM jp
        |          UNION SELECT doc_b, doc_a FROM jp
        |          UNION SELECT doc_a, doc_a FROM jp UNION SELECT doc_b, doc_b FROM jp),
        |reach AS (SELECT u, v FROM edges
        |          UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
        |SELECT u AS doc_id, min(v) AS cluster_id,
        |  CAST(count(DISTINCT v) AS BIGINT) AS cluster_size
        |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin,
    "q120_source_dedup_report" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |g AS (SELECT DISTINCT doc_id, unnest(grams) AS g FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |cpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |           FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |jp AS (SELECT doc_a, doc_b FROM cpairs
        |       JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        |       WHERE ROUND(CAST(common AS DOUBLE)/(sa.n + sb.n - common), 6) >= 0.5),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM jp
        |          UNION SELECT doc_b, doc_a FROM jp
        |          UNION SELECT doc_a, doc_a FROM jp UNION SELECT doc_b, doc_b FROM jp),
        |reach AS (SELECT u, v FROM edges
        |          UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        |cc AS (SELECT u AS doc_id, min(v) AS cluster_id,
        |         count(DISTINCT v) AS cluster_size FROM reach GROUP BY u),
        |surv AS (SELECT d.doc_id, d.source,
        |           CAST(coalesce(cc.cluster_size, 1) AS BIGINT) AS cluster_size
        |         FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id
        |         WHERE cc.doc_id IS NULL OR cc.cluster_id = d.doc_id),
        |tot AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
        |SELECT t.source, t.n_docs, count(*) AS n_survivors,
        |  CAST(sum(s.cluster_size - 1) AS BIGINT) AS n_removed,
        |  ROUND(CAST(count(*) AS DOUBLE) / t.n_docs, 6) AS retention
        |FROM surv s JOIN tot t ON s.source = t.source
        |GROUP BY t.source, t.n_docs ORDER BY t.source""".stripMargin,
    "q115_semdedup" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |cb AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS list_id, v AS c
        |       FROM (SELECT vec_id, v, ${md5l("CAST(vec_id AS VARCHAR)")} AS h
        |             FROM e ORDER BY h, vec_id LIMIT 8)),
        |ca AS (SELECT e.vec_id, e.v, cb.list_id,
        |         row_number() OVER (PARTITION BY e.vec_id
        |           ORDER BY ROUND(list_cosine_similarity(e.v, cb.c), 6) DESC, cb.list_id)
        |           AS crank
        |       FROM e CROSS JOIN cb),
        |asg AS (SELECT vec_id, v, list_id FROM ca WHERE crank = 1),
        |jp AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM asg a JOIN asg b ON a.list_id = b.list_id AND a.vec_id < b.vec_id
        |  WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.4),
        |edges AS (SELECT id_a AS u, id_b AS v FROM jp
        |          UNION SELECT id_b, id_a FROM jp
        |          UNION SELECT id_a, id_a FROM jp UNION SELECT id_b, id_b FROM jp),
        |reach AS (SELECT u, v FROM edges
        |          UNION SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u),
        |clusters AS (SELECT u AS vec_id, min(v) AS cluster_id,
        |               CAST(count(DISTINCT v) AS BIGINT) AS cluster_size
        |             FROM reach GROUP BY u)
        |SELECT em.vec_id, em.label,
        |  coalesce(c.cluster_size, 1::BIGINT) AS cluster_size,
        |  coalesce(c.cluster_size, 1::BIGINT) - 1 AS removed_dups
        |FROM embeddings em LEFT JOIN clusters c ON em.vec_id = c.vec_id
        |WHERE c.cluster_id IS NULL OR c.cluster_id = em.vec_id
        |ORDER BY em.vec_id""".stripMargin,
    "q125_semdedup_auto" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |cb AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS list_id, v AS c
        |       FROM (SELECT vec_id, v, ${md5l("CAST(vec_id AS VARCHAR)")} AS h
        |             FROM e ORDER BY h, vec_id
        |             LIMIT (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM e))),
        |ca AS (SELECT e.vec_id, e.v, cb.list_id,
        |         row_number() OVER (PARTITION BY e.vec_id
        |           ORDER BY ROUND(list_cosine_similarity(e.v, cb.c), 6) DESC, cb.list_id)
        |           AS crank
        |       FROM e CROSS JOIN cb),
        |asg AS (SELECT vec_id, v, list_id FROM ca WHERE crank = 1),
        |jp AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM asg a JOIN asg b ON a.list_id = b.list_id AND a.vec_id < b.vec_id
        |  WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.4),
        |edges AS (SELECT id_a AS u, id_b AS v FROM jp
        |          UNION SELECT id_b, id_a FROM jp
        |          UNION SELECT id_a, id_a FROM jp UNION SELECT id_b, id_b FROM jp),
        |reach AS (SELECT u, v FROM edges
        |          UNION SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u),
        |clusters AS (SELECT u AS vec_id, min(v) AS cluster_id,
        |               CAST(count(DISTINCT v) AS BIGINT) AS cluster_size
        |             FROM reach GROUP BY u)
        |SELECT em.vec_id, em.label,
        |  coalesce(c.cluster_size, 1::BIGINT) AS cluster_size,
        |  coalesce(c.cluster_size, 1::BIGINT) - 1 AS removed_dups
        |FROM embeddings em LEFT JOIN clusters c ON em.vec_id = c.vec_id
        |WHERE c.cluster_id IS NULL OR c.cluster_id = em.vec_id
        |ORDER BY em.vec_id""".stripMargin,
    "q111_dup_span_removal" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |w AS (SELECT doc_id, i - 1 AS pos, ${md5l("array_to_string(t[i:i+7], ' ')")} AS gh
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i) gs
        |  WHERE len(t) >= 8),
        |dup AS (SELECT gh FROM (SELECT gh, count(DISTINCT doc_id) AS df
        |    FROM w GROUP BY gh) WHERE df >= 2),
        |st AS (SELECT doc_id, pos FROM w WHERE gh IN (SELECT gh FROM dup)),
        |cov AS (SELECT DISTINCT doc_id, pos + o AS p FROM st,
        |  LATERAL (SELECT unnest(generate_series(0, 7)) AS o) go),
        |tp AS (SELECT doc_id, i - 1 AS p, t[i] AS tok FROM toks,
        |  LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) gs),
        |keptp AS (SELECT tp.doc_id, tp.p, tp.tok FROM tp
        |  LEFT JOIN cov ON tp.doc_id = cov.doc_id AND tp.p = cov.p
        |  WHERE cov.p IS NULL),
        |nds AS (SELECT doc_id, count(*) AS n_dup_spans FROM st GROUP BY doc_id),
        |ncv AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id),
        |tc AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text_clean
        |  FROM keptp GROUP BY doc_id)
        |SELECT toks.doc_id, CAST(len(t) AS INTEGER) AS n_tokens,
        |  CAST(coalesce(n_dup_spans, 0) AS INTEGER) AS n_dup_spans,
        |  CAST(coalesce(n_removed, 0) AS INTEGER) AS n_removed,
        |  coalesce(text_clean, '') AS text_clean
        |FROM toks LEFT JOIN nds USING (doc_id) LEFT JOIN ncv USING (doc_id)
        |  LEFT JOIN tc USING (doc_id)
        |ORDER BY toks.doc_id""".stripMargin,
    "q106_segment_dedup" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |segarr AS (SELECT doc_id,
        |    [array_to_string(t[i:i+7], ' ') FOR i IN generate_series(1, GREATEST(len(t), 1), 8)]
        |      AS segs FROM toks),
        |seg AS (SELECT doc_id, i AS seg_idx, segs[i] AS segment
        |  FROM segarr, LATERAL (SELECT unnest(generate_series(1, len(segs))) AS i) gs),
        |h AS (SELECT doc_id, seg_idx, segment, ${md5l("segment")} AS seg_hash FROM seg),
        |hot AS (SELECT seg_hash FROM (SELECT seg_hash, count(DISTINCT doc_id) AS df
        |    FROM h GROUP BY seg_hash) WHERE df > 2),
        |kept AS (SELECT * FROM h WHERE seg_hash NOT IN (SELECT seg_hash FROM hot)),
        |n AS (SELECT doc_id, count(*) AS n_segments FROM h GROUP BY doc_id),
        |k AS (SELECT doc_id, count(*) AS kept_segments,
        |    string_agg(segment, ' ' ORDER BY seg_idx) AS text_clean
        |  FROM kept GROUP BY doc_id)
        |SELECT doc_id, n_segments,
        |  coalesce(kept_segments, 0) AS kept_segments,
        |  coalesce(text_clean, '') AS text_clean
        |FROM n LEFT JOIN k USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q91_split_leakage" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |g AS (SELECT doc_id, unnest(grams) AS g FROM sh),
        |h AS (SELECT doc_id, ${md5l("g")} % 1125899906842624 AS h1,
        |    ${md5l("concat('2_', g)")} % 1125899906842624 AS h2 FROM g),
        |mh AS (SELECT doc_id, p, min((h1 + p * h2) % 1125899906842624) AS mh
        |  FROM h, generate_series(0, 15) AS gs(p) GROUP BY doc_id, p),
        |bands AS (SELECT doc_id, CAST(p // 2 AS INTEGER) AS band,
        |    string_agg(CAST(mh AS VARCHAR), ',' ORDER BY p) AS band_str
        |  FROM mh GROUP BY doc_id, p // 2),
        |bh AS (SELECT doc_id, band,
        |    ${md5l("concat(band_str, '_', band)")} AS band_hash FROM bands),
        |capped AS (SELECT * FROM bh
        |  QUALIFY count(*) OVER (PARTITION BY band, band_hash) <= 1000),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM capped a JOIN capped b
        |    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
        |est AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    ROUND(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) / 16.0, 6) AS est_jaccard
        |  FROM mh a JOIN mh b ON a.p = b.p
        |  JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM est WHERE est_jaccard >= 0.5),
        |sp AS (SELECT doc_id,
        |    CASE WHEN ${md5l("CAST(doc_id AS VARCHAR)")} % 100 < 50
        |         THEN 'train' ELSE 'test' END AS split FROM documents)
        |SELECT count(*) AS n_pairs,
        |  CAST(sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_cross_pairs,
        |  ROUND(CAST(sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END) AS DOUBLE)
        |        / count(*), 6) AS leakage_ratio
        |FROM pairs JOIN sp sa ON sa.doc_id = doc_a
        |  JOIN sp sb ON sb.doc_id = doc_b""".stripMargin,
    // q337: both one-shot mining chains (q21's banded MinHash pairs,
    // q62's DF-capped hashed gram index) reduced to the store-read
    // summary — row count + bit_xor md5 content fingerprint per
    // signal. Hash-equality certifies the fresh epoch rebuild holds
    // exactly the inline mining's rows. Multi-referenced CTEs
    // MATERIALIZED per the repo invariant.
    "q337_epoch_store_build" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |sh AS MATERIALIZED (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |gstrs AS (SELECT doc_id, unnest(grams) AS gstr FROM sh),
        |g0 AS MATERIALIZED (SELECT DISTINCT doc_id, ${md5l("gstr")} AS g FROM gstrs),
        |hot AS (SELECT g FROM g0 GROUP BY g HAVING count(*) > 50),
        |gi AS (SELECT doc_id, g FROM g0 WHERE g NOT IN (SELECT g FROM hot)),
        |gmh AS (SELECT doc_id, unnest(grams) AS g FROM sh),
        |h AS (SELECT doc_id, ${md5l("g")} % 1125899906842624 AS h1,
        |    ${md5l("concat('2_', g)")} % 1125899906842624 AS h2 FROM gmh),
        |mh AS MATERIALIZED (SELECT doc_id, p, min((h1 + p * h2) % 1125899906842624) AS mh
        |  FROM h, generate_series(0, 15) AS gs(p) GROUP BY doc_id, p),
        |bands AS (SELECT doc_id, CAST(p // 2 AS INTEGER) AS band,
        |    string_agg(CAST(mh AS VARCHAR), ',' ORDER BY p) AS band_str
        |  FROM mh GROUP BY doc_id, p // 2),
        |bh AS (SELECT doc_id, band,
        |    ${md5l("concat(band_str, '_', band)")} AS band_hash FROM bands),
        |capped AS MATERIALIZED (SELECT * FROM bh
        |  QUALIFY count(*) OVER (PARTITION BY band, band_hash) <= 1000),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM capped a JOIN capped b
        |    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
        |est AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    ROUND(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) / 16.0, 6) AS est_jaccard
        |  FROM mh a JOIN mh b ON a.p = b.p
        |  JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
        |  GROUP BY 1, 2),
        |mhp AS (SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= 0.5)
        |SELECT * FROM (
        |  SELECT 'capped_grams' AS signal, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(bit_xor(${md5l("concat(CAST(doc_id AS VARCHAR), '_', CAST(g AS VARCHAR))")}) AS BIGINT) AS fp
        |  FROM gi
        |  UNION ALL
        |  SELECT 'minhash_pairs', CAST(count(*) AS BIGINT),
        |    CAST(bit_xor(${md5l("concat(CAST(doc_a AS VARCHAR), '_', CAST(doc_b AS VARCHAR), '_', CAST(CAST(round(est_jaccard * 1000000e0) AS BIGINT) AS VARCHAR))")}) AS BIGINT)
        |  FROM mhp
        |) ORDER BY signal""".stripMargin,
    "q92_source_overlap" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |gstrs AS (SELECT doc_id, unnest(grams) AS gstr FROM sh),
        |g0 AS (SELECT DISTINCT doc_id, ${md5l("gstr")} AS g FROM gstrs),
        |hot AS (SELECT g FROM g0 GROUP BY g HAVING count(*) > 50),
        |gi AS (SELECT doc_id, g FROM g0 WHERE g NOT IN (SELECT g FROM hot)),
        |gsr AS (SELECT DISTINCT d.source, gi.g
        |        FROM gi JOIN documents d USING (doc_id)),
        |sizes AS (SELECT source, count(*) AS n FROM gsr GROUP BY source),
        |shared AS (SELECT a.source AS source_a, b.source AS source_b,
        |    count(*) AS n_shared
        |  FROM gsr a JOIN gsr b ON a.g = b.g AND a.source < b.source GROUP BY 1, 2)
        |SELECT source_a, source_b, n_shared,
        |  ROUND(CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared), 6) AS gram_jaccard
        |FROM shared JOIN sizes sa ON sa.source = source_a
        |  JOIN sizes sb ON sb.source = source_b
        |ORDER BY source_a, source_b""".stripMargin,
    // q171: q57's recursive closure, survivor = per-cluster window on
    // (n_chars DESC, doc_id); singletons key by their own id.
    "q171_quality_canonical" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |g AS (SELECT DISTINCT doc_id, unnest(grams) AS g FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |cpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |           FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |jp AS (SELECT doc_a, doc_b FROM cpairs
        |       JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        |       WHERE ROUND(CAST(common AS DOUBLE)/(sa.n + sb.n - common), 6) >= 0.5),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM jp
        |          UNION SELECT doc_b, doc_a FROM jp
        |          UNION SELECT doc_a, doc_a FROM jp UNION SELECT doc_b, doc_b FROM jp),
        |reach AS (SELECT u, v FROM edges
        |          UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        |clusters AS (SELECT u AS doc_id, min(v) AS cluster_id,
        |               CAST(count(DISTINCT v) AS BIGINT) AS cluster_size
        |             FROM reach GROUP BY u),
        |sel AS (SELECT d.doc_id, d.n_chars,
        |          coalesce(c.cluster_id, d.doc_id) AS cl,
        |          coalesce(c.cluster_size, 1) AS cluster_size
        |        FROM documents d LEFT JOIN clusters c USING (doc_id))
        |SELECT doc_id, n_chars, CAST(cluster_size AS BIGINT) AS cluster_size,
        |  CAST(cluster_size - 1 AS BIGINT) AS removed_dups
        |FROM (SELECT *, row_number() OVER (PARTITION BY cl
        |        ORDER BY n_chars DESC, doc_id) AS rn FROM sel)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q59_canonical_corpus" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |g AS (SELECT DISTINCT doc_id, unnest(grams) AS g FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |cpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |           FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |jp AS (SELECT doc_a, doc_b FROM cpairs
        |       JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        |       WHERE ROUND(CAST(common AS DOUBLE)/(sa.n + sb.n - common), 6) >= 0.5),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM jp
        |          UNION SELECT doc_b, doc_a FROM jp
        |          UNION SELECT doc_a, doc_a FROM jp UNION SELECT doc_b, doc_b FROM jp),
        |reach AS (SELECT u, v FROM edges
        |          UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        |cc AS (SELECT u AS doc_id, min(v) AS cluster_id,
        |         count(DISTINCT v) AS cluster_size FROM reach GROUP BY u)
        |SELECT d.doc_id, d.lang, d.source, d.n_chars,
        |  CAST(coalesce(cc.cluster_size, 1) AS BIGINT) AS cluster_size,
        |  CAST(coalesce(cc.cluster_size, 1) - 1 AS BIGINT) AS removed_dups
        |FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id
        |WHERE cc.doc_id IS NULL OR cc.cluster_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q62_ngram_jaccard_capped" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |gs AS (SELECT doc_id, unnest(grams) AS gstr FROM sh),
        |g0 AS (SELECT DISTINCT doc_id, ${md5l("gstr")} AS g FROM gs),
        |hot AS (SELECT g FROM g0 GROUP BY g HAVING count(*) > 50),
        |g AS (SELECT doc_id, g FROM g0 WHERE g NOT IN (SELECT g FROM hot)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |          FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  ROUND(CAST(common AS DOUBLE) / (sa.n + sb.n - common), 6) AS jaccard
        |FROM pairs JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE ROUND(CAST(common AS DOUBLE) / (sa.n + sb.n - common), 6) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q64_decontaminate" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text,' ') AS t FROM documents),
        |sh AS (SELECT doc_id, source, CASE WHEN len(t) >= 5
        |  THEN [array_to_string(t[i:i+4], ' ') FOR i IN generate_series(1, len(t)-4)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |g AS (SELECT DISTINCT doc_id, source, unnest(grams) AS g FROM sh),
        |bench AS (SELECT DISTINCT g FROM g WHERE source = 'src0')
        |SELECT g.doc_id, count(*) AS shared_grams
        |FROM g JOIN bench USING (g) WHERE g.source <> 'src0'
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    // q71: the Bloom prefilter is performance-only (exact verify join
    // removes false positives), so the oracle is q64's, verbatim.
    "q71_decontaminate_bloom" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text,' ') AS t FROM documents),
        |sh AS (SELECT doc_id, source, CASE WHEN len(t) >= 5
        |  THEN [array_to_string(t[i:i+4], ' ') FOR i IN generate_series(1, len(t)-4)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |g AS (SELECT DISTINCT doc_id, source, unnest(grams) AS g FROM sh),
        |bench AS (SELECT DISTINCT g FROM g WHERE source = 'src0')
        |SELECT g.doc_id, count(*) AS shared_grams
        |FROM g JOIN bench USING (g) WHERE g.source <> 'src0'
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    "q74_embedding_dedup" -> embeddingDedupOracle,
    // q78: q21's minhash machinery, restricted to (incoming >= bucket 50)
    // × (existing < bucket 50) candidate pairs; no hot-bucket cap in the
    // cross form (mirrors Dedup.minhashLshJoin exactly).
    "q78_incremental_dedup" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t,
        |    ${md5l("CAST(doc_id AS VARCHAR)")} % 100 AS bucket FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |g AS (SELECT doc_id, unnest(grams) AS g FROM sh),
        |h AS (SELECT doc_id, ${md5l("g")} % 1125899906842624 AS h1,
        |    ${md5l("concat('2_', g)")} % 1125899906842624 AS h2 FROM g),
        |mh AS (SELECT doc_id, p, min((h1 + p * h2) % 1125899906842624) AS mh
        |  FROM h, generate_series(0, 15) AS gs(p) GROUP BY doc_id, p),
        |bands AS (SELECT doc_id, CAST(p // 2 AS INTEGER) AS band,
        |    string_agg(CAST(mh AS VARCHAR), ',' ORDER BY p) AS band_str
        |  FROM mh GROUP BY doc_id, p // 2),
        |bh AS (SELECT doc_id, band,
        |    ${md5l("concat(band_str, '_', band)")} AS band_hash FROM bands),
        |bk AS (SELECT doc_id, bucket FROM toks),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_new, b.doc_id AS doc_old
        |  FROM bh a JOIN bh b ON a.band = b.band AND a.band_hash = b.band_hash
        |  JOIN bk ba ON ba.doc_id = a.doc_id JOIN bk bb ON bb.doc_id = b.doc_id
        |  WHERE ba.bucket >= 50 AND bb.bucket < 50),
        |est AS (SELECT c.doc_new, c.doc_old,
        |    ROUND(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) / 16.0, 6) AS est_jaccard
        |  FROM cand c JOIN mh a ON a.doc_id = c.doc_new
        |    JOIN mh b ON b.doc_id = c.doc_old AND a.p = b.p
        |  GROUP BY c.doc_new, c.doc_old)
        |SELECT doc_new, doc_old, est_jaccard FROM est
        |WHERE est_jaccard >= 0.5 ORDER BY doc_new, doc_old""".stripMargin,
    "q21_minhash_lsh" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |g AS (SELECT doc_id, unnest(grams) AS g FROM sh),
        |h AS (SELECT doc_id, ${md5l("g")} % 1125899906842624 AS h1,
        |    ${md5l("concat('2_', g)")} % 1125899906842624 AS h2 FROM g),
        |mh AS (SELECT doc_id, p, min((h1 + p * h2) % 1125899906842624) AS mh
        |  FROM h, generate_series(0, 15) AS gs(p) GROUP BY doc_id, p),
        |bands AS (SELECT doc_id, CAST(p // 2 AS INTEGER) AS band,
        |    string_agg(CAST(mh AS VARCHAR), ',' ORDER BY p) AS band_str
        |  FROM mh GROUP BY doc_id, p // 2),
        |bh AS (SELECT doc_id, band,
        |    ${md5l("concat(band_str, '_', band)")} AS band_hash FROM bands),
        |capped AS (SELECT * FROM bh
        |  QUALIFY count(*) OVER (PARTITION BY band, band_hash) <= 1000),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM capped a JOIN capped b
        |    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
        |est AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    ROUND(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) / 16.0, 6) AS est_jaccard
        |  FROM mh a JOIN mh b ON a.p = b.p
        |  JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, est_jaccard FROM est
        |WHERE est_jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
    "q22_simhash_pairs" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
        |th AS (SELECT doc_id, tf, ${md5l("token")} AS h FROM tf),
        |bits AS (SELECT doc_id, b,
        |    SUM(CASE WHEN (h >> b) & 1 = 1 THEN tf ELSE -tf END) AS bsum
        |  FROM th, generate_series(0, 63) AS gs(b) GROUP BY doc_id, b),
        |sh AS (SELECT doc_id,
        |    CAST(SUM(CASE WHEN bsum > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END)
        |         AS BIGINT) AS simhash
        |  FROM bits GROUP BY doc_id),
        |seg AS (SELECT doc_id, simhash, s, (simhash >> CAST(s * 16 AS INTEGER)) & 65535 AS seg_val
        |  FROM sh, generate_series(0, 3) AS gs(s)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        |  FROM seg a JOIN seg b
        |    ON a.s = b.s AND a.seg_val = b.seg_val AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, hamming FROM cand
        |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,
    "q57_dedup_clusters" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |g AS (SELECT DISTINCT doc_id, unnest(grams) AS g FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |cpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |           FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |jp AS (SELECT doc_a, doc_b FROM cpairs
        |       JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        |       WHERE ROUND(CAST(common AS DOUBLE)/(sa.n + sb.n - common), 6) >= 0.5),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM jp
        |          UNION SELECT doc_b, doc_a FROM jp
        |          UNION SELECT doc_a, doc_a FROM jp UNION SELECT doc_b, doc_b FROM jp),
        |reach AS (SELECT u, v FROM edges
        |          UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
        |SELECT u AS doc_id, min(v) AS cluster_id,
        |  CAST(count(DISTINCT v) AS BIGINT) AS cluster_size
        |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin,
    "q20_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS dup_count
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,
    "q23_ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |g AS (SELECT DISTINCT doc_id, unnest(grams) AS g FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |          FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  ROUND(CAST(common AS DOUBLE) / (sa.n + sb.n - common), 6) AS jaccard
        |FROM pairs JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE ROUND(CAST(common AS DOUBLE) / (sa.n + sb.n - common), 6) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q127_clean_corpus" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents),
        |m AS (SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
        |  ROUND(CAST(len(list_filter(toks, x -> x IN
        |    ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
        |    / len(toks), 6) AS stopword_ratio,
        |  ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS ttr
        |FROM t),
        |r AS (SELECT doc_id, n_tokens, stopword_ratio, ttr,
        |  CASE WHEN n_tokens < 10 THEN 'too_short'
        |       WHEN stopword_ratio < 0.05e0 THEN 'low_stopword'
        |       WHEN ttr < 0.2e0 THEN 'low_ttr' ELSE 'kept' END AS drop_reason
        |FROM m)
        |SELECT doc_id, n_tokens, stopword_ratio, ttr, drop_reason,
        |  CAST(CASE WHEN drop_reason = 'kept' THEN 1 ELSE 0 END AS INTEGER) AS keep
        |FROM r ORDER BY doc_id""".stripMargin)
}
