package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{IdempotentSink, Tables}
import graft.functions.Md5Family
import graft.operators._
import graft.queries.QueryHelpers._

/** Text-analysis family: stats/quality/langid/fingerprint, tokenization and BPE, BM25 + persisted positional text index + phrase search + RRF hybrid retrieval, vocabulary reports.
  *
  * Split from the former ExtensionQueries monolith (round 7) — query
  * bodies, registration names, and oracle SQL are unchanged;
  * [[ExtensionQueries]] re-aggregates every domain map.
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame


  private val textStats: Q = (s, dir) =>
    TextAnalysis.textStats(Tables.documents(s, dir))


  private val tokenCounts: Q = (s, dir) =>
    TextAnalysis.tokenCounts(Tables.documents(s, dir), "doc_id", "text").orderBy("doc_id")


  /** The deterministic CJK rendering behind q331: odd doc_ids have
    * each whitespace token replaced by ONE ideograph from a fixed
    * 16-character alphabet (md5-indexed, so the oracle replays the
    * mapping), concatenated with NO separators — a no-space-script
    * corpus derived from the testdata instead of synthesized, per the
    * fixture rules. Even doc_ids keep their Latin text, so the same
    * query exercises BOTH tokenization routes.
    */
  private[queries] val CjkAlphabet: Seq[String] =
    (0 until 16).map(i => (0x4E00 + i).toChar.toString)

  private def mixedScriptDocs(s: SparkSession, dir: String): DataFrame = {
    val cjkText = array_join(transform(split(col("text"), " "),
      t => element_at(array(CjkAlphabet.map(lit): _*),
        (pmod(Md5Family.hash(t), lit(16L)) + 1).cast("int"))), "")
    Tables.documents(s, dir).select(col("doc_id"),
      when(col("doc_id") % 2 === 1, cjkText).otherwise(col("text")).as("text"))
  }

  /** q331: script-aware token statistics over a mixed-script corpus —
    * the whitespace tokenizer silently collapses a no-space (CJK)
    * document to ONE whole-line token; `TextAnalysis.scriptTokens`
    * routes such documents (≥ half non-whitespace chars in CJK/kana
    * ranges, an exact integer decision) to character bigrams instead.
    * The oracle replays the corpus derivation, the routing decision,
    * and both tokenizations.
    */
  private val cjkTokensQ: Q = (s, dir) =>
    TextAnalysis.tokenCounts(mixedScriptDocs(s, dir), "doc_id", "text")
      .orderBy("doc_id")


  private val quality: Q = (s, dir) =>
    TextAnalysis.qualityScore(Tables.documents(s, dir), "doc_id", "text").orderBy("doc_id")


  private val langId: Q = (s, dir) =>
    TextAnalysis.langId(Tables.documents(s, dir), "doc_id", "text").orderBy("doc_id")


  private val fingerprint: Q = (s, dir) =>
    TextAnalysis.fingerprint(Tables.documents(s, dir), "doc_id", "text", hashes = Md5Family)
      .orderBy("doc_id")


  /** Corpus vocabulary: token frequencies, top-100 — explode + hash
    * aggregate + TakeOrdered (per-partition top-k, no global sort).
    */
  private val vocab: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(100)


  private val tfidf: Q = (s, dir) =>
    TextAnalysis.tfidfTopTerms(Tables.documents(s, dir), "doc_id", "text", k = 3)


  /** Unigram log-probability quality proxy. */
  private val unigramLp: Q = (s, dir) =>
    TextAnalysis.unigramLogProb(Tables.documents(s, dir), "doc_id", "text")


  /** Corpus token-length histogram (fixed 50-token buckets, top capped
    * at bucket 9) — the length-distribution profile every data run
    * reports.
    */
  private val tokenHistogram: Q = (s, dir) => {
    val n = size(TextAnalysis.wsTokens(col("text")))
    Tables.documents(s, dir)
      .select(least(floor(n / lit(50.0)), lit(9.0)).cast("int").as("bucket"),
        n.as("n_tokens"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .orderBy("bucket")
  }


  /** Within-document shingle repetition (Gopher-style quality filter). */
  private val repetitionQ: Q = (s, dir) =>
    TextAnalysis.repetition(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_id")


  /** Gopher top-n-gram concentration profile (q67's complement: the
    * per-gram dominance cut, not the distinct-shingle ratio).
    */
  private val topNgramQ: Q = (s, dir) =>
    TextAnalysis.topNgramProfile(Tables.documents(s, dir), "doc_id", "text")


  /** q184: the TRAINING half of the q98 quality classifier — two
    * full-batch logistic GD steps over hashed bag-of-words presence
    * features, label = (lang = 'en'); registered with `Md5Family` so
    * the oracle replays the identical feature hashing.
    */
  private val trainLogisticQ: Q = (s, dir) =>
    Classifier.trainLogistic(
      Tables.documents(s, dir)
        .withColumn("y", when(col("lang") === "en", 1).otherwise(0)),
      "doc_id", "text", "y", buckets = 64, iters = 2, lrPpm = 500000L,
      hashes = Md5Family)


  /** q187: quality-filter funnel governance — the per-stage keep/drop
    * accounting every production cleaning pipeline reports (what did
    * each filter cost, in order): length → shingle repetition →
    * peak 2-gram concentration → char entropy. Every cut compares
    * EXACT integers (`50·(ns−nd) ≤ ns` instead of `ratio ≤ 0.02`,
    * `8·peak_cov ≤ n_chars` instead of a float fraction) or a
    * hash-verified 6dp signal against a 6dp-representable threshold,
    * so the funnel is bit-stable cross-engine. One signal pass + one
    * conditional-sum aggregate; the per-doc frames are the q67/q166
    * shapes (per-key state bounded by doc length).
    */
  private val qualityFunnelQ: Q = (s, dir) =>
    TextAnalysis.funnelReport(TextAnalysis.funnelCounts(
      TextAnalysis.funnelSignals(Tables.documents(s, dir), "doc_id",
        "text")))


  /** BPE-style regex pre-tokenization profile (fertility etc.). */
  private val regexTokensQ: Q = (s, dir) =>
    TextAnalysis.regexTokenProfile(Tables.documents(s, dir), "doc_id", "text")


  private val bigramLp: Q = (s, dir) =>
    TextAnalysis.bigramLogProb(Tables.documents(s, dir), "doc_id", "text")


  /** PII/policy scrub: standard URL/email/number patterns (exercised as
    * exact-string no-ops on this corpus) plus an entity denylist term
    * that does fire.
    */
  private val scrubQ: Q = (s, dir) =>
    TextAnalysis.scrub(Tables.documents(s, dir), "doc_id", "text", Seq(
      ("urls", "https?://[^ ]+", "<URL>"),
      ("emails", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
      ("numbers", "[0-9]{4,}", "<NUM>"),
      ("entities", "\\bcustomer\\b", "<ENTITY>")))


  /** q273: tokenizer fertility of the q192-trained BPE merges, per
    * language — tokens/word and chars/token after applying the
    * learned merge table: the "which language pays more tokens for
    * the same text" fairness readout (q261's dial for the tokenizer).
    * The 5-row merge table is a probe-bounded driver collect; sums
    * exact, one division per ratio.
    */
  private val bpeFertilityQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val merges = TextAnalysis.trainBpe(docs, "doc_id", "text", nMerges = 5)
      .orderBy("merge_rank").collect()
      .map { r =>
        val Array(a, b) = r.getString(1).split(" ", 2); (a, b)
      }.toSeq
    TextAnalysis.applyBpeMerges(docs, "doc_id", "text", merges)
      .join(docs.select(col("doc_id"), col("lang"), col("n_chars")),
        Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("n_words"),
        sum(col("n_tokens_bpe").cast("long")).as("n_bpe_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_bpe_tokens"), col("n_chars"),
        round(col("n_bpe_tokens").cast("double")
          / col("n_words").cast("double"), 6).as("tokens_per_word"),
        round(col("n_chars").cast("double")
          / col("n_bpe_tokens").cast("double"), 6).as("chars_per_token"))
      .orderBy("lang")
  }

  /** q272: per-source PII/policy exposure rollup off q90's rule set —
    * the governance view of the scrub pass (which source needs
    * redaction, at what density); exact counts, one division each.
    */
  private val piiBySourceQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    TextAnalysis.scrub(docs, "doc_id", "text", Seq(
      ("urls", "https?://[^ ]+", "<URL>"),
      ("emails", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
      ("numbers", "[0-9]{4,}", "<NUM>"),
      ("entities", "\\bcustomer\\b", "<ENTITY>")))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("changed").cast("long")).as("n_flagged"),
        sum(col("n_urls").cast("long")).as("urls"),
        sum(col("n_emails").cast("long")).as("emails"),
        sum(col("n_numbers").cast("long")).as("numbers"),
        sum(col("n_entities").cast("long")).as("entities"))
      .withColumn("exposure_rate",
        round(col("n_flagged").cast("double") / col("n_docs"), 6))
      .orderBy("source")
  }

  /** 5%-start, length-3 deterministic span corruption. */
  private val spanQ: Q = (s, dir) =>
    TextAnalysis.spanCorrupt(Tables.documents(s, dir), "doc_id", "text",
      hashes = Md5Family)


  /** 15% deterministic MLM masking over the documents table. */
  private val maskQ: Q = (s, dir) =>
    TextAnalysis.maskTokens(Tables.documents(s, dir), "doc_id", "text",
      hashes = Md5Family)


  /** Model-based quality filter over stub weights: the weight table a
    * trained classifier would export is faked deterministically
    * (hash-derived, uniform in [-1, 1]) so both engines reproduce it —
    * the join/OOV/exact-sum/threshold plumbing is the real thing.
    */
  private def stubWeights(docs: DataFrame): DataFrame = docs
    .select(explode(split(col("text"), " ")).as("token")).distinct()
    .select(col("token"),
      ((Md5Family.hash(col("token")) % 2001L - 1000L).cast("double")
        / 1000.0).as("weight"))

  private val linearQualityQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    TextAnalysis.linearQualityScore(docs, "doc_id", "text",
      stubWeights(docs)).orderBy("doc_id")
  }

  /** The (p_keep, funnel-pass) frame q205/q206 evaluate: the q98
    * model score joined to the q187 rule-funnel verdict per doc.
    */
  private def scoredVsFunnel(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val scored = TextAnalysis.linearQualityScore(docs, "doc_id", "text",
      stubWeights(docs))
    val sig = TextAnalysis.funnelSignals(docs, "doc_id", "text")
      .select(col("doc_id"),
        (col("f1") && col("f2") && col("f3") && col("f4")).as("pass"))
    scored.join(sig, Seq("doc_id"))
  }

  /** q208: n-gram novelty — fraction of each doc's distinct trigram
    * shingles with corpus df = 1 (memorization-risk / boilerplate
    * signal); df counts move hashed grams, never bodies.
    */
  private val noveltyQ: Q = (s, dir) =>
    TextAnalysis.ngramNovelty(Tables.documents(s, dir), "doc_id", "text")

  /** q205: calibration curve of the model-based quality score against
    * the rule-funnel verdict — does p_keep's probability mass track
    * the empirical pass rate per decile?
    */
  private val calibCurveQ: Q = (s, dir) =>
    Classifier.calibrationCurve(scoredVsFunnel(s, dir), "p_keep", "pass")

  /** q206: exact ROC-AUC (Mann–Whitney with average-rank ties) of the
    * same score against the same verdict — the single ranking-quality
    * number for the classifier-vs-rules audit.
    */
  private val rocAucQ: Q = (s, dir) =>
    Classifier.rocAuc(scoredVsFunnel(s, dir), "p_keep", "pass")

  /** q218: expected calibration error — q205's curve collapsed to the
    * weighted one-number summary.
    */
  private val eceQ: Q = (s, dir) =>
    Classifier.expectedCalibrationError(scoredVsFunnel(s, dir),
      "p_keep", "pass")


  /** q112: one word-level BPE training round — corpus-wide adjacent
    * token-pair counts, top 50 merge candidates.
    */
  private val bpeQ: Q = (s, dir) =>
    TextAnalysis.bpeMergeCandidates(Tables.documents(s, dir), "text", k = 50)


  /** q114: one-row dataset card — corpus size, token volume, exact-dup
    * and diversity counters in a single aggregate pass.
    */
  private val corpusStatsQ: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
    d.agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " "))).as("total_tokens"),
      count_distinct(col("text")).as("distinct_texts"),
      count_distinct(col("lang")).as("n_langs"),
      count_distinct(col("source")).as("n_sources"),
      round(avg(size(split(col("text"), " "))), 6).as("avg_doc_tokens"))
  }


  /** q139: BM25 ranked retrieval — probe queries are the first 6
    * tokens of every 50th src0 (eval) doc; the corpus is everything
    * else, so no probe retrieves itself.
    */
  private val bm25Q: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val corpus = docs.filter(col("source") =!= "src0").select("doc_id", "text")
    val probes = docs
      .filter(col("source") === "src0" && col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("qtext"))
    TextAnalysis.bm25TopK(corpus, "doc_id", "text",
      probes, "query_id", "qtext", k = 10)
  }


  /** q307: impact-pruned BM25 (static index pruning, Carmel 2001) —
    * the bounded-work text-retrieval scale path, certified the q282
    * way: per-query recall of the topM=512-postings-per-token pruned
    * ranking vs the exact q139 ranking, hash-verified on both sides.
    * Same corpus/probe split as q139 so the exact tier replays the
    * standing oracle chain verbatim. 512 caps per-term query work at
    * ~11% of this corpus's common-token df while measuring recall
    * 1.0 at the oracle factor (the harness vocabulary is near-
    * uniform, so scores accumulate over many mid-impact postings —
    * aggressive caps like 32 measure recall 0.14, which is exactly
    * the trade the report exists to surface).
    */
  private val bm25PrunedQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val corpus = docs.filter(col("source") =!= "src0").select("doc_id", "text")
    val probes = docs
      .filter(col("source") === "src0" && col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("qtext"))
    TextAnalysis.bm25TopKPruned(corpus, "doc_id", "text",
      probes, "query_id", "qtext", k = 10, topM = 512)
  }


  /** q318: RM3 pseudo-relevance-feedback expansion
    * (`TextAnalysis.rm3ExpandedTopK`) on the q139 corpus/probe split:
    * top-5 feedback docs per query, term weights as exact nano-long
    * sums of (tf/dl)·rsv, top-8 NEW terms joined to the query, then
    * the standard BM25 rescore. The oracle replays feedback → mining
    * → expansion → rescore on the shared q139 CTE chain, so a wrong
    * feedback doc, a mis-weighted term, or a second-pass scoring
    * drift all flip the hash.
    */
  private val rm3Q: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val corpus = docs.filter(col("source") =!= "src0").select("doc_id", "text")
    val probes = docs
      .filter(col("source") === "src0" && col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("qtext"))
    TextAnalysis.rm3ExpandedTopK(corpus, "doc_id", "text",
      probes, "query_id", "qtext", k = 10, fbDocs = 5, fbTerms = 8)
  }

  /** Session-shared POSITIONAL text index over the q139/q140 corpus
    * split (source != src0, two disjoint even/odd-doc_id batches) —
    * built once per (JVM, sf dir) and reused by q140 (BM25 query) and
    * q144 (phrase search). Index BUILD is the amortizable one-time
    * cost of a persisted index and is timed as its own entry
    * (q161_text_index_build); the standing q140/q144 entries then
    * measure QUERY cost, which is what repeats in production. Results
    * are identical to per-query scratch builds: batches hold disjoint
    * doc sets and the stats fold is exact integer addition.
    */
  private val sharedIdxByDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def buildCorpusIndex(s: SparkSession, dir: String, idx: String): Unit = {
    val corpus = Tables.documents(s, dir)
      .filter(col("source") =!= "src0").select("doc_id", "text")
    TextIndex.appendBatch(corpus.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", idx, batchId = 0L)
    TextIndex.appendBatch(corpus.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", idx, batchId = 1L)
  }

  private def sharedTextIndex(s: SparkSession, dir: String): String =
    sharedIdxByDir.computeIfAbsent(dir, _ => {
      val idx = java.nio.file.Files
        .createTempDirectory("graft_shared_tidx").toString + "/idx"
      buildCorpusIndex(s, dir, idx)
      idx
    })


  /** Pre-build the shared index outside any timed window (Bench's
    * warm-up calls this so q140/q144 timings are pure query cost).
    */
  def prewarmSharedTextIndex(s: SparkSession, dir: String): Unit = {
    sharedTextIndex(s, dir); ()
  }


  /** q140: BM25 over the PERSISTED inverted text index (the shared
    * two-batch store). Must answer exactly like the inline operator
    * (q139's oracle verbatim), with the scan pruned to the probed
    * token buckets.
    */
  private val textIndexQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val probes = docs
      .filter(col("source") === "src0" && col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("qtext"))
    TextIndex.query(s, sharedTextIndex(s, dir), probes,
      "query_id", "qtext", k = 10)
  }


  /** q338: hybrid retrieval with BOTH tiers answered by PERSISTED
    * indexes — the production RAG serving shape: the sparse tier is
    * BM25 off the session-shared positional text index (q140's read;
    * store ≡ inline is q140's proof), the dense tier is the seeded
    * IVF+PQ `AnnIndex` built over the same corpus split and queried
    * with the probe docs' vectors (partition-pruned enc scan —
    * q131's proof), fused by reciprocal rank exactly like q141. At
    * 100 TB neither tier rescans the corpus per query: BM25 touches
    * the probed token buckets, ANN the probed list partitions, and
    * only two top-10 rankings meet at the fusion. The scratch ANN
    * build is BuildTiming-wrapped (amortizable build_s share, the
    * q131/q334 discipline).
    */
  private val indexHybridQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir)
    val corpus = docs.filter(col("source") =!= "src0").select("doc_id", "text")
    val probes = docs
      .filter(col("source") === "src0" && col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("qtext"))
    val corpusEmb = emb.join(
      corpus.select(col("doc_id").as("vec_id")), "vec_id")
    val probeEmb = emb.join(
      probes.select(col("query_id").as("vec_id")), "vec_id")
    val scratch = java.nio.file.Files.createTempDirectory("graft_q338_ann")
    val idx = scratch.toString + "/ann"
    // The sparse tier (BM25 off the prewarmed shared index) and the
    // scratch ANN build touch disjoint stores and share nothing until
    // the RRF fusion — overlap them (the q282 build-∥-ground-truth
    // pattern); the sparse ranking materializes on its own thread
    // while the build's store jobs run.
    val sparseRef = new java.util.concurrent.atomic.AtomicReference[DataFrame]()
    graft.engine.Par.inParallel(
      () => sparseRef.set(
        TextIndex.query(s, sharedTextIndex(s, dir), probes,
            "query_id", "qtext", k = 10)
          .select("query_id", "doc_id", "rank")
          .localCheckpoint()),
      () => AnnIndex.build(corpusEmb, idx, dim = 64))
    val dense = AnnIndex.query(s, idx, probeEmb, k = 10, dim = 64)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    val out = Retrieval.rrfFuse(Seq(sparseRef.get, dense), k = 10)
      .localCheckpoint() // materialize before the scratch delete
    QueryHelpers.deleteRecursively(s, scratch.toString)
    out
  }


  /** q188: tombstone deletes on the persisted text index — build a
    * lean (BM25-only) scratch index over the q139 corpus split in two
    * batches, tombstone every `doc_id % 7 == 0`, compact (fold minus
    * dead + exact stats re-fit + tombstone drain), query. Must answer
    * exactly like the inline operator on the SURVIVING corpus — the
    * oracle is q139's chain with the survivor predicate.
    */
  private val textDeleteQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val corpus = docs.filter(col("source") =!= "src0").select("doc_id", "text")
    val probes = docs
      .filter(col("source") === "src0" && col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("qtext"))
    val scratch = java.nio.file.Files.createTempDirectory("graft_q188_tidx")
    val path = scratch.toString + "/tidx"
    TextIndex.appendBatch(corpus.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", path, batchId = 0L, withPositions = false)
    TextIndex.appendBatch(corpus.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", path, batchId = 1L, withPositions = false)
    TextIndex.delete(corpus.filter(col("doc_id") % 7 === 0)
      .select("doc_id"), "doc_id", path)
    TextIndex.compact(s, path)
    val out = TextIndex.query(s, path, probes, "query_id", "qtext", k = 10)
      .localCheckpoint()
    deleteRecursively(s, scratch.toString)
    out
  }


  /** q192: the full BPE training loop — five take-top-pair →
    * rewrite-corpus rounds over the documents table; the learned
    * merge table itself (pairs, counts, shrinking token totals) is
    * what the oracle hash-checks.
    */
  private val bpeTrainQ: Q = (s, dir) =>
    TextAnalysis.trainBpe(Tables.documents(s, dir), "doc_id", "text",
      nMerges = 5)


  /** q141: hybrid retrieval — q139's BM25 ranking and an exact cosine
    * ranking over the same probe/corpus split, fused by reciprocal
    * rank (`Retrieval.rrfFuse`). The dense tier here is the exact
    * top-k so the oracle can replay it; at scale it swaps for
    * `ivfPqTopKReranked` without touching the fusion.
    */
  private val hybridRrfQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir)
    val corpus = docs.filter(col("source") =!= "src0").select("doc_id", "text")
    val probes = docs
      .filter(col("source") === "src0" && col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("qtext"))
    val sparse = TextAnalysis.bm25TopK(
        corpus, "doc_id", "text", probes, "query_id", "qtext", k = 10)
      .select(col("query_id"), col("doc_id"), col("rank"))
    // doc_id ↔ vec_id are aligned ids; the dense tier retrieves over
    // the same corpus split, probing with the query docs' vectors
    val corpusEmb = emb.join(
      corpus.select(col("doc_id").as("vec_id")), "vec_id")
    val probeEmb = emb.join(
      probes.select(col("query_id").as("vec_id")), "vec_id")
    val dense = Similarity.bruteForceTopK(corpusEmb, probeEmb, k = 10)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    Retrieval.rrfFuse(Seq(sparse, dense), k = 10)
  }


  /** q143: exact corpus heavy hitters (tokens above 1/k of all token
    * occurrences) via the two-scan Misra–Gries + verify design — the
    * answer is exact, so the oracle is the plain count/filter.
    */
  private val heavyHittersQ: Q = (s, dir) => {
    val toks = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("token"))
    Sketches.heavyHitters(toks, "token", k = 200)
      .select(col("item").as("token"), col("cnt"), col("share"))
  }


  /** q144: exact phrase search over the persisted positional index
    * (the same shared store q140 queries — a positional index serves
    * both retrieval modes) — each probe doc's 2nd..4th tokens form the
    * phrase; a corpus doc matches when those tokens occur
    * consecutively, n_matches counts occurrences (overlaps included).
    */
  private val phraseSearchQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val probes = docs
      .filter(col("source") === "src0" && col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 2, 3)).as("phrase"))
    TextIndex.phraseSearch(s, sharedTextIndex(s, dir), probes,
      "query_id", "phrase")
  }


  /** q161: the index BUILD as its own timed, oracle-checked entry —
    * a fresh two-batch positional build on scratch, verified by
    * reading the committed postings back: doc count, summed document
    * length, and distinct (doc, token) posting count must equal the
    * raw corpus's. This is the amortized one-time cost that q140/q144
    * deliberately exclude (they query the session-shared store).
    */
  private val textIndexBuildQ: Q = (s, dir) => {
    val scratch = java.nio.file.Files.createTempDirectory("graft_q161_idx")
    val idx = scratch.toString + "/idx"
    buildCorpusIndex(s, dir, idx)
    val committed = TextIndex.committedBatches(s, idx)
    val out = s.read.parquet(idx + "/postings")
      .filter(col("batch_id").isin(committed: _*))
      .groupBy("doc").agg(max(col("dl")).as("dl"), count(lit(1)).as("nt"))
      .agg(lit(committed.size).as("n_batches"),
        count(lit(1)).as("n_docs"),
        sum(col("dl")).as("sum_dl"),
        sum(col("nt")).as("n_postings"))
      .localCheckpoint() // materialize BEFORE deleting the scratch
    deleteRecursively(s, scratch.toString)
    out
  }


  /** q153: exact vocabulary-overlap matrix between sources — pairwise
    * intersection and Jaccard of distinct token sets
    * (`TextAnalysis.vocabOverlap`): the provenance-similarity /
    * shared-boilerplate signal.
    */
  private val vocabOverlapQ: Q = (s, dir) =>
    TextAnalysis.vocabOverlap(Tables.documents(s, dir), "source", "text")


  /** q158: signature vocabulary per source — exact top-5 terms with
    * share of the source's token volume
    * (`TextAnalysis.topTermsByGroup`), the companion readout to
    * q153's overlap matrix.
    */
  private val sourceTopTermsQ: Q = (s, dir) =>
    TextAnalysis.topTermsByGroup(Tables.documents(s, dir), "source", "text",
      k = 5)


  /** q166: character-entropy quality signal
    * (`TextAnalysis.charEntropy`) — Σ cnt·ln(cnt) terms quantized to
    * integer nano-nats at birth so the cross-engine aggregate is an
    * exact integer sum (the q148 rule).
    */
  private val charEntropyQ: Q = (s, dir) =>
    TextAnalysis.charEntropy(Tables.documents(s, dir), "doc_id", "text")


  /** q168: interpolated trigram LM scoring
    * (`TextAnalysis.trigramLogProb`) — the perplexity-style quality
    * filter; per-position log terms quantized to integer nano-nats so
    * the per-doc mean is order-invariant (unlike q87's plain avg).
    */
  private val trigramLmQ: Q = (s, dir) =>
    TextAnalysis.trigramLogProb(Tables.documents(s, dir), "doc_id", "text")

  /** q200: CCNet-style per-language perplexity tertiles — q168's LM
    * scores cut into head/middle/tail per lang (ntile over
    * (avg_logprob DESC, doc_id)); the bucket CCNet keeps or
    * down-weights by.
    */
  private val pplBucketsQ: Q = (s, dir) =>
    TextAnalysis.perplexityBuckets(Tables.documents(s, dir), "doc_id",
      "text", "lang", nBuckets = 3)

  /** q176: retrieval evaluation — nDCG@10 of the q139 BM25 ranking
    * against dense graded relevance (each query's exact-cosine top-20
    * as grades): the sparse-vs-dense agreement number a retrieval
    * tier is tuned on (`Retrieval.ndcgAtK`).
    */
  private val ndcgQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir)
    val corpus = docs.filter(col("source") =!= "src0").select("doc_id", "text")
    val probes = docs
      .filter(col("source") === "src0" && col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("qtext"))
    val ranked = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
      probes, "query_id", "qtext", k = 10)
    val cEmb = emb.join(corpus.select(col("doc_id").as("vec_id")), Seq("vec_id"))
    val pEmb = emb.join(probes.select(col("query_id").as("vec_id")), Seq("vec_id"))
    val rels = Similarity.bruteForceTopK(cEmb, pEmb, k = 20)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("cosine").as("rel"))
      .localCheckpoint() // feeds both the DCG join and the ideal window
    Retrieval.ndcgAtK(ranked, rels, k = 10)
  }

  /** q177: per-source quality governance — mean char entropy, trigram
    * LM score, and repetition ratio per provenance slice, over docs
    * carrying all three signals. Each 6dp per-doc signal lifts to
    * exact integer micros before the mean, so the per-source
    * aggregates are order-invariant (the q148 rule).
    */
  private val sourceQualityQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    def m(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)).cast("long")
    val ent = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .select(col("doc_id"), col("entropy_nats"))
    val lm = TextAnalysis.trigramLogProb(docs, "doc_id", "text")
      .select(col("doc_id"), col("avg_logprob"))
    val rep = TextAnalysis.repetition(docs, "doc_id", "text")
      .select(col("doc_id"), col("repetition_ratio"))
    docs.select(col("doc_id"), col("source"))
      .join(ent, Seq("doc_id"))
      .join(lm, Seq("doc_id"))
      .join(rep, Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(m(col("entropy_nats"))).as("_e"),
        sum(m(col("avg_logprob"))).as("_l"),
        sum(m(col("repetition_ratio"))).as("_r"))
      .select(col("source"), col("n_docs"),
        round((col("_e").cast("double") / lit(1e6)) / col("n_docs"), 6)
          .as("mean_entropy"),
        round((col("_l").cast("double") / lit(1e6)) / col("n_docs"), 6)
          .as("mean_logprob"),
        round((col("_r").cast("double") / lit(1e6)) / col("n_docs"), 6)
          .as("mean_repetition"))
      .orderBy("source")
  }

  /** q178: binary-relevance retrieval metrics — recall@10 and MRR of
    * the q139 BM25 ranking against the dense exact-cosine top-5 as
    * the relevant set (`Retrieval.rankEval`); q176's nDCG is the
    * graded sibling.
    */
  private val rankEvalQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir)
    val corpus = docs.filter(col("source") =!= "src0").select("doc_id", "text")
    val probes = docs
      .filter(col("source") === "src0" && col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("qtext"))
    val ranked = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
      probes, "query_id", "qtext", k = 10)
    val cEmb = emb.join(corpus.select(col("doc_id").as("vec_id")), Seq("vec_id"))
    val pEmb = emb.join(probes.select(col("query_id").as("vec_id")), Seq("vec_id"))
    val rels = Similarity.bruteForceTopK(cEmb, pEmb, k = 5)
      .select(col("query_id"), col("neighbor_id").as("doc_id"))
      .localCheckpoint()
    Retrieval.rankEval(ranked, rels, k = 10)
  }

  /** q179: Unicode NFC normalization report
    * (`TextAnalysis.nfcNormalize`, codegen `NfcNormalizeExpr`) — on
    * this ASCII corpus the pass is provably a no-op (changed = 0
    * everywhere, hash-checked); the composition behavior itself is
    * golden-tested on decomposed fixtures in ExtensionsSpec.
    */
  private val nfcQ: Q = (s, dir) =>
    TextAnalysis.nfcNormalize(Tables.documents(s, dir), "doc_id", "text")

  /** q223: Zipf power-law fit over the top-200 token frequencies —
    * the one-row language-health profile (slope near −1 for natural
    * text); micro-quantized log-log OLS over exact integer sums.
    */
  private val zipfQ: Q = (s, dir) =>
    TextAnalysis.zipfFit(Tables.documents(s, dir), "doc_id", "text",
      topV = 200)

  /** q230: PMI collocations over the top-100 vocabulary — document-
    * level co-occurrence pairs with ≥5 co-docs; each pair's PMI is one
    * float expression over exact counts (no float accumulation).
    */
  private val pmiQ: Q = (s, dir) =>
    TextAnalysis.pmiCollocations(Tables.documents(s, dir), "doc_id",
      "text", topV = 100, minPairDf = 5L)

  /** q239: confusion audit of the q31 language-ID heuristic against
    * the stored labels (binarized en/unk) — the eval family applied
    * to a real in-repo signal; every ratio one exact division.
    */
  private val langidEvalQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val preds = TextAnalysis.langId(docs, "doc_id", "text")
      .select(col("doc_id"), col("predicted_lang"))
    val truth = docs.select(col("doc_id"),
      when(col("lang") === "en", lit("en")).otherwise(lit("unk"))
        .as("true_lang"))
    Classifier.classifierEval(truth.join(preds, Seq("doc_id")),
      "true_lang", "predicted_lang")
  }

  /** q240: margin-based active-learning pick — the 20 documents the
    * q184-trained filter is least sure about (smallest |margin| under
    * the final weights), the "label these next" list.
    */
  private val boundarySelectQ: Q = (s, dir) =>
    Classifier.boundarySelect(
      Tables.documents(s, dir)
        .withColumn("y", when(col("lang") === "en", 1).otherwise(0)),
      "doc_id", "text", "y", k = 20, buckets = 64, iters = 2,
      lrPpm = 500000L, hashes = Md5Family)

  /** q250: the consolidated Gopher §A1.1 rule report — exact-integer
    * flags per rule (ratios cross-multiplied, no float decisions).
    */
  private val gopherRulesQ: Q = (s, dir) =>
    TextAnalysis.gopherRules(Tables.documents(s, dir), "doc_id", "text")

  /** q254: the q250 rule report rolled up per provenance slice — the
    * data-card governance view (which source is failing which rule);
    * exact counts, pass_rate one division.
    */
  private val gopherBySourceQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    TextAnalysis.gopherRules(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("pass")).cast("long").as("n_pass"),
        sum(lit(1) - col("flag_words")).cast("long").as("fail_words"),
        sum(lit(1) - col("flag_word_len")).cast("long")
          .as("fail_word_len"),
        sum(lit(1) - col("flag_symbols")).cast("long").as("fail_symbols"),
        sum(lit(1) - col("flag_alpha")).cast("long").as("fail_alpha"),
        sum(lit(1) - col("flag_stopwords")).cast("long")
          .as("fail_stopwords"),
        sum(lit(1) - col("flag_lines")).cast("long").as("fail_lines"))
      .withColumn("pass_rate",
        round(col("n_pass").cast("double") / col("n_docs"), 6))
      .orderBy("source")
  }

  /** q261: selection-rate parity of the Gopher keep decision across
    * languages — the four-fifths adverse-impact screen pointed at
    * corpus governance; di and the flag from cross-multiplied exact
    * integers against the best-treated language.
    */
  private val selectionParityQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    Profile.selectionParity(
      TextAnalysis.gopherRules(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")),
      "lang", "pass")
  }

  /** q267: Heaps-law vocabulary-growth fit — the corpus-diversity
    * dial next to q223's Zipf frequency dial; exact cumulative
    * series, micro-quantized log-log OLS over ~200 strided docs.
    */
  private val heapsQ: Q = (s, dir) =>
    TextAnalysis.heapsFit(Tables.documents(s, dir), "doc_id", "text")

  val queries: Map[String, Q] = Map(
    "q261_selection_parity" -> selectionParityQ,
    "q267_heaps_fit" -> heapsQ,
    "q272_pii_by_source" -> piiBySourceQ,
    "q273_bpe_fertility" -> bpeFertilityQ,
    "q179_nfc_normalize" -> nfcQ,
    "q223_zipf_fit" -> zipfQ,
    "q230_pmi" -> pmiQ,
    "q239_langid_eval" -> langidEvalQ,
    "q240_boundary_select" -> boundarySelectQ,
    "q250_gopher_rules" -> gopherRulesQ,
    "q254_gopher_by_source" -> gopherBySourceQ,
    "q182_top_ngram" -> topNgramQ,
    "q184_train_logistic" -> trainLogisticQ,
    "q187_quality_funnel" -> qualityFunnelQ,
    "q188_text_delete" -> textDeleteQ,
    "q192_bpe_train" -> bpeTrainQ,
    "q178_rank_eval" -> rankEvalQ,
    "q177_source_quality" -> sourceQualityQ,
    "q176_ndcg" -> ndcgQ,
    "q168_trigram_lm" -> trigramLmQ,
    "q200_ppl_buckets" -> pplBucketsQ,
    "q205_calibration_curve" -> calibCurveQ,
    "q206_roc_auc" -> rocAucQ,
    "q208_ngram_novelty" -> noveltyQ,
    "q218_ece" -> eceQ,
    "q166_char_entropy" -> charEntropyQ,
    "q161_text_index_build" -> textIndexBuildQ,
    "q158_source_top_terms" -> sourceTopTermsQ,
    "q153_vocab_overlap" -> vocabOverlapQ,
    "q144_phrase_search" -> phraseSearchQ,
    "q143_heavy_hitters" -> heavyHittersQ,
    "q141_hybrid_rrf" -> hybridRrfQ,
    "q338_index_hybrid" -> indexHybridQ,
    "q140_text_index" -> textIndexQ,
    "q139_bm25" -> bm25Q,
    "q307_bm25_pruned" -> bm25PrunedQ,
    "q318_rm3_expansion" -> rm3Q,
    "q114_corpus_stats" -> corpusStatsQ,
    "q112_bpe_merges" -> bpeQ,
    "q105_span_corrupt" -> spanQ,
    "q104_mask_tokens" -> maskQ,
    "q98_linear_quality" -> linearQualityQ,
    "q90_scrub" -> scrubQ,
    "q84_regex_tokens" -> regexTokensQ,
    "q87_bigram_logprob" -> bigramLp,
    "q73_unigram_logprob" -> unigramLp,
    "q65_token_histogram" -> tokenHistogram,
    "q67_repetition" -> repetitionQ,
    "q46_tfidf_top_terms" -> tfidf,
    "q37_vocab" -> vocab,
    "q28_text_stats" -> textStats,
    "q29_token_counts" -> tokenCounts,
    "q30_quality_score" -> quality,
    "q31_langid" -> langId,
    "q32_fingerprint" -> fingerprint,
    "q331_cjk_tokens" -> cjkTokensQ)

  /** q184's oracle: the same two GD steps unrolled as CTEs. Margins
    * are exact BIGINT sums of micro-weights; per-doc error/logloss
    * quantize to nanos in the IDENTICAL float expression before the
    * exact gradient/loss sums; the weight update is the identical
    * one-shot float expression floored back to micros — so both
    * engines walk the same integer weight trajectory bit-for-bit.
    */
  /** The q184 training chain through the iteration-2 weights `w2` —
    * shared by q184's report and q240's boundary scoring.
    */
  private lazy val logisticChainCtes: String = {
    val iters = (1 to 2).map { i =>
      val p = i - 1
      s"""m$i AS (SELECT f.doc_id, CAST(SUM(w.w_micro) AS BIGINT) AS margin
         |  FROM feat f JOIN w$p w USING (bucket) GROUP BY 1),
         |s$i AS (SELECT d.doc_id, d.y, m.margin,
         |    1e0 / (1e0 + exp(-(CAST(m.margin AS DOUBLE) / 1000000e0))) AS p
         |  FROM d JOIN m$i m USING (doc_id)),
         |e$i AS (SELECT doc_id, y, margin,
         |    CAST(floor((p - y) * 1000000000e0 + 0.5e0) AS BIGINT)
         |      AS err_nano,
         |    CAST(floor(-((y * ln(p)) + (1 - y) * ln(1e0 - p))
         |      * 1000000000e0 + 0.5e0) AS BIGINT) AS loss_nano
         |  FROM s$i),
         |mt$i AS (SELECT CAST(SUM(loss_nano) AS BIGINT) AS loss_sum_nano,
         |    CAST(SUM(CASE WHEN (margin >= 0) = (y = 1) THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_correct FROM e$i),
         |g$i AS (SELECT f.bucket, CAST(SUM(e.err_nano) AS BIGINT) AS g_nano
         |  FROM feat f JOIN e$i e USING (doc_id) GROUP BY 1),
         |w$i AS (SELECT w.bucket,
         |    CAST(w.w_micro - CAST(floor((500000e0 / 1000000e0)
         |      * (CAST(coalesce(g.g_nano, 0) AS DOUBLE) / 1000000000e0
         |        / n_docs) * 1000000e0 + 0.5e0) AS BIGINT) AS BIGINT)
         |      AS w_micro
         |  FROM w$p w LEFT JOIN g$i g USING (bucket) CROSS JOIN n)"""
        .stripMargin
    }.mkString(",\n")
    s"""d AS (SELECT doc_id,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
       |    string_split(text, ' ') AS t FROM documents),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d),
       |feat AS (SELECT DISTINCT doc_id, ${md5l("tok")} % 64 AS bucket
       |    FROM (SELECT doc_id, unnest(t) AS tok FROM d)
       |  UNION ALL SELECT doc_id, CAST(-1 AS BIGINT) FROM d),
       |w0 AS (SELECT DISTINCT bucket, CAST(0 AS BIGINT) AS w_micro
       |       FROM feat),
       |$iters""".stripMargin
  }

  private lazy val trainLogisticOracle: String =
    s"""WITH $logisticChainCtes
       |SELECT CAST(1 AS INTEGER) AS iter, w1.bucket, w1.w_micro,
       |  mt1.loss_sum_nano, mt1.n_correct FROM w1 CROSS JOIN mt1
       |UNION ALL
       |SELECT CAST(2 AS INTEGER), w2.bucket, w2.w_micro,
       |  mt2.loss_sum_nano, mt2.n_correct FROM w2 CROSS JOIN mt2
       |ORDER BY iter, bucket""".stripMargin

  // Per-doc signal oracles, shared verbatim by their own entries and
  // the q177 per-source composition.
  private lazy val trigramLmOracle: String =
      // toks feeds four counts, bc joins twice, tgs twice — all flat
      // but each inlined reference re-tokenizes the corpus; the
      // MATERIALIZED hints pin one tokenize (24 s -> ~8 s at sf0.01)
      """WITH toks AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |n AS (SELECT CAST(sum(len(t)) AS BIGINT) AS n_tokens FROM toks),
        |uc AS MATERIALIZED (SELECT w, count(*) AS uf FROM
        |  (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
        |bc AS MATERIALIZED (SELECT bigram, count(*) AS bf FROM
        |  (SELECT array_to_string(t[i:i+1], ' ') AS bigram FROM toks,
        |     LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS i) gs)
        |  GROUP BY 1),
        |tgs AS MATERIALIZED (SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
        |  FROM toks,
        |  LATERAL (SELECT unnest(generate_series(1, len(t)-2)) AS i) gs),
        |tc AS MATERIALIZED (SELECT w1, w2, w3, count(*) AS tf FROM tgs GROUP BY 1, 2, 3),
        |sc AS (SELECT g.doc_id,
        |    CAST(floor(ln(0.6e0 * tf / bp.bf + 0.3e0 * bs.bf / u2.uf
        |        + 0.1e0 * u3.uf / n_tokens) * 1000000000e0 + 0.5e0)
        |      AS BIGINT) AS tn
        |  FROM tgs g
        |  JOIN tc USING (w1, w2, w3)
        |  JOIN bc bp ON bp.bigram = g.w1 || ' ' || g.w2
        |  JOIN bc bs ON bs.bigram = g.w2 || ' ' || g.w3
        |  JOIN uc u2 ON u2.w = g.w2
        |  JOIN uc u3 ON u3.w = g.w3
        |  CROSS JOIN n)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
        |  round((CAST(sum(tn) AS BIGINT) / 1000000000e0) / count(*), 6)
        |    AS avg_logprob
        |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin

  private lazy val charEntropyOracle: String =
      """WITH d AS (SELECT doc_id, text, len(text) AS n FROM documents
        |  WHERE text IS NOT NULL AND len(text) > 0),
        |ch AS (SELECT doc_id, n, substr(text, i, 1) AS ch FROM d,
        |  LATERAL (SELECT unnest(generate_series(1, n)) AS i) gs),
        |c AS (SELECT doc_id, n, ch, count(*) AS cnt FROM ch GROUP BY 1, 2, 3),
        |t AS (SELECT doc_id, n,
        |        CAST(floor(cnt * ln(cnt) * 1000000000e0 + 0.5e0) AS BIGINT) AS tn
        |      FROM c),
        |a AS (SELECT doc_id, n, CAST(sum(tn) AS BIGINT) AS sum_nano,
        |        CAST(count(*) AS BIGINT) AS n_unique_chars
        |      FROM t GROUP BY 1, 2)
        |SELECT doc_id, CAST(n AS INTEGER) AS n_chars_counted, n_unique_chars,
        |  round(ln(n) - (CAST(sum_nano AS DOUBLE) / 1000000000e0) / n, 6)
        |    AS entropy_nats
        |FROM a ORDER BY doc_id""".stripMargin

  private lazy val repetitionOracle: String =
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks)
        |SELECT doc_id,
        |  CAST(len(grams) AS INTEGER) AS n_shingles,
        |  CAST(len(list_distinct(grams)) AS INTEGER) AS n_distinct,
        |  ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
        |    AS repetition_ratio
        |FROM sh ORDER BY doc_id""".stripMargin

  /** q187's oracle: the same four exact-integer cuts over the q67
    * shingle shape, the peak 2-gram coverage, and the q166 entropy
    * oracle as a derived table; funnel counts are conditional sums of
    * exact booleans.
    */
  /** Shared CTE chain for q205/q206: the q98 scoring chain plus the
    * q187 per-doc funnel signals, ending in `d(doc_id, p_micro, pass)`
    * — p_keep re-quantized to exact integer micros at birth.
    */
  private lazy val scoredPassCtes: String =
    s"""toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |    FROM documents),
      |v AS (SELECT DISTINCT token FROM toks),
      |w AS (SELECT token,
      |    CAST(floor(CAST(${md5l("token")} % 2001 - 1000 AS DOUBLE)
      |               / 1000.0e0 * 1000000e0) AS BIGINT) AS w_ppm FROM v),
      |sq AS (SELECT doc_id, count(*) AS n_tokens,
      |    CAST(sum(coalesce(w_ppm, 0)) AS BIGINT) AS sw
      |  FROM toks LEFT JOIN w USING (token) GROUP BY doc_id),
      |t AS (SELECT doc_id, len(text) AS nc,
      |    string_split(text, ' ') AS tk FROM documents),
      |shg AS (SELECT doc_id, CASE WHEN len(tk) >= 3
      |  THEN [array_to_string(tk[i:i+2], ' ')
      |        FOR i IN generate_series(1, len(tk)-2)]
      |  ELSE [array_to_string(tk, ' ')] END AS g FROM t),
      |rep AS (SELECT doc_id, len(g) AS ns, len(list_distinct(g)) AS nd
      |  FROM shg),
      |g2 AS (SELECT doc_id, unnest([array_to_string(tk[i:i+1], ' ')
      |    FOR i IN generate_series(1, len(tk)-1)]) AS gram
      |  FROM t WHERE len(tk) >= 2),
      |c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2),
      |cov AS (SELECT doc_id, CAST(max(cnt * len(gram)) AS BIGINT) AS cov2
      |  FROM c2 GROUP BY 1),
      |ent AS (SELECT doc_id, entropy_nats FROM ($charEntropyOracle)),
      |sig AS (SELECT t.doc_id,
      |    len(tk) >= 24 AS f1,
      |    (r.ns - r.nd) * 50 <= r.ns AS f2,
      |    coalesce(cov.cov2, 0) * 8 <= t.nc AS f3,
      |    coalesce(ent.entropy_nats, 0e0) >= 2.7e0 AS f4
      |  FROM t JOIN rep r USING (doc_id)
      |  LEFT JOIN cov USING (doc_id) LEFT JOIN ent USING (doc_id)),
      |d AS (SELECT sq.doc_id,
      |    CAST(round(ROUND(1.0e0 / (1.0e0 + exp(-(CAST(sw AS DOUBLE)
      |      / 1000000e0 / CAST(n_tokens AS DOUBLE)))), 6) * 1000000e0)
      |      AS BIGINT) AS p_micro,
      |    (sig.f1 AND sig.f2 AND sig.f3 AND sig.f4) AS pass
      |  FROM sq JOIN sig ON sig.doc_id = sq.doc_id)""".stripMargin

  private[queries] lazy val qualityFunnelOracle: String =
      s"""WITH t AS (SELECT doc_id, len(text) AS nc,
        |    string_split(text, ' ') AS tk FROM documents),
        |shg AS (SELECT doc_id, CASE WHEN len(tk) >= 3
        |  THEN [array_to_string(tk[i:i+2], ' ')
        |        FOR i IN generate_series(1, len(tk)-2)]
        |  ELSE [array_to_string(tk, ' ')] END AS g FROM t),
        |rep AS (SELECT doc_id, len(g) AS ns, len(list_distinct(g)) AS nd
        |  FROM shg),
        |g2 AS (SELECT doc_id, unnest([array_to_string(tk[i:i+1], ' ')
        |    FOR i IN generate_series(1, len(tk)-1)]) AS gram
        |  FROM t WHERE len(tk) >= 2),
        |c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2),
        |cov AS (SELECT doc_id, CAST(max(cnt * len(gram)) AS BIGINT) AS cov2
        |  FROM c2 GROUP BY 1),
        |ent AS (SELECT doc_id, entropy_nats FROM ($charEntropyOracle)),
        |sig AS (SELECT t.doc_id,
        |    len(tk) >= 24 AS f1,
        |    (r.ns - r.nd) * 50 <= r.ns AS f2,
        |    coalesce(cov.cov2, 0) * 8 <= t.nc AS f3,
        |    coalesce(ent.entropy_nats, 0e0) >= 2.7e0 AS f4
        |  FROM t JOIN rep r USING (doc_id)
        |  LEFT JOIN cov USING (doc_id) LEFT JOIN ent USING (doc_id)),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS a1,
        |    CAST(SUM(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS a2,
        |    CAST(SUM(CASE WHEN f1 AND f2 AND f3 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a3,
        |    CAST(SUM(CASE WHEN f1 AND f2 AND f3 AND f4 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a4 FROM sig)
        |SELECT * FROM (
        |  SELECT CAST(1 AS INTEGER) AS stage, 'length' AS filter,
        |    n0 AS n_in, n0 - a1 AS n_drop, a1 AS n_out FROM a
        |  UNION ALL SELECT 2, 'repetition', a1, a1 - a2, a2 FROM a
        |  UNION ALL SELECT 3, 'ngram_conc', a2, a2 - a3, a3 FROM a
        |  UNION ALL SELECT 4, 'entropy', a3, a3 - a4, a4 FROM a)
        |ORDER BY stage""".stripMargin

  /** q192's oracle: the same five BPE rounds unrolled. Each round's
    * rewrite uses the double-space sentinel trick so plain (non-regex)
    * `replace` reproduces left-to-right non-overlapping merge
    * semantics exactly: tokens are re-joined with TWO spaces and the
    * padded pattern ` a  b ` consumes one boundary space from each
    * side, so adjacent occurrences ("a a a a") merge pairwise just
    * like the operator's single-pass loop.
    */
  /** The 5-round BPE training chain (c0..c5, m_i, n_i) — shared by
    * q192 (the merge table) and q273 (fertility of the trained
    * tokenizer, read off c5).
    */
  private lazy val bpeChainCtes: String = {
    val steps = (1 to 5).map { i =>
      val p = i - 1
      s"""t$i AS (SELECT string_split(_t, ' ') AS t FROM c$p),
         |pc$i AS (SELECT array_to_string(t[j:j+1], ' ') AS pair,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM t$i, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS j) gs
         |  WHERE len(t) >= 2 GROUP BY 1),
         |m$i AS MATERIALIZED (SELECT pair, cnt,
         |    ' ' || replace(pair, ' ', '  ') || ' ' AS pat,
         |    ' ' || replace(pair, ' ', '_') || ' ' AS rep
         |  FROM pc$i ORDER BY cnt DESC, pair LIMIT 1),
         |c$i AS MATERIALIZED (SELECT doc_id,
         |    replace(trim(replace(' ' || replace(_t, ' ', '  ') || ' ',
         |      (SELECT pat FROM m$i), (SELECT rep FROM m$i))), '  ', ' ')
         |      AS _t
         |  FROM c$p),
         |n$i AS (SELECT CAST(SUM(len(string_split(_t, ' '))) AS BIGINT)
         |    AS n_after FROM c$i)""".stripMargin
    }.mkString(",\n")
    // each c(i-1) feeds BOTH t_i and the rewrite c_i, and each m_i is
    // read twice by c_i plus the readout — MATERIALIZED, or inlining
    // re-derives the whole corpus rewrite chain 2^rounds times (the
    // q201/q231 lesson; 27 s -> ~2 s at sf0.01, rows identical)
    s"""c0 AS MATERIALIZED (SELECT doc_id, text AS _t FROM documents),
       |$steps""".stripMargin
  }

  private lazy val bpeTrainOracle: String = {
    val rows = (1 to 5).map { i =>
      s"""SELECT CAST($i AS INTEGER) AS merge_rank,
         |  (SELECT pair FROM m$i) AS merge_pair,
         |  (SELECT cnt FROM m$i) AS n_occurrences,
         |  (SELECT n_after FROM n$i) AS n_tokens_after""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $bpeChainCtes
       |SELECT * FROM (
       |$rows
       |) ORDER BY merge_rank""".stripMargin
  }

  /** The q250 per-doc rule chain (b, m, f) — shared by the q254
    * per-source rollup.
    */
  private lazy val gopherCtes: String =
    """b AS (SELECT doc_id, text, string_split(text, ' ') AS t
        |  FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(len(t) AS BIGINT) AS n_words,
        |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT)
        |      AS n_word_chars,
        |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
        |      + CAST((length(text) - length(replace(text, '...', '')))
        |        // 3 AS BIGINT) AS n_symbols,
        |    CAST(len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))
        |      AS BIGINT) AS n_alpha_words,
        |    CAST(len(list_intersect(list_distinct(t),
        |      ['the','be','to','of','and','that','have','with']))
        |      AS BIGINT) AS n_stopwords,
        |    CAST(len(string_split(text, chr(10))) AS BIGINT) AS nl,
        |    CAST(len(list_filter(string_split(text, chr(10)),
        |      x -> x LIKE '-%' OR x LIKE '*%')) AS BIGINT) AS bl,
        |    CAST(len(list_filter(string_split(text, chr(10)),
        |      x -> x LIKE '%...')) AS BIGINT) AS el
        |  FROM b),
        |f AS (SELECT *,
        |    CAST(n_words >= 50 AND n_words <= 100000 AS INTEGER)
        |      AS flag_words,
        |    CAST(n_word_chars >= 3 * n_words
        |      AND n_word_chars <= 10 * n_words AS INTEGER)
        |      AS flag_word_len,
        |    CAST(n_symbols * 10 <= n_words AS INTEGER) AS flag_symbols,
        |    CAST(n_alpha_words * 10 >= n_words * 9 AS INTEGER)
        |      AS flag_alpha,
        |    CAST(n_stopwords >= 2 AS INTEGER) AS flag_stopwords,
        |    CAST(bl * 10 <= nl * 9 AND el * 10 <= nl * 3 AS INTEGER)
        |      AS flag_lines
        |  FROM m)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q192_bpe_train" -> bpeTrainOracle,
    // q273: the q192 training chain's c5 IS the merged corpus — read
    // fertility off it per language; exact sums, one division each.
    "q273_bpe_fertility" ->
      s"""WITH $bpeChainCtes,
        |fin AS (SELECT doc_id,
        |    CAST(len(string_split(_t, ' ')) AS BIGINT) AS ntb FROM c5),
        |j AS (SELECT d.lang,
        |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS nw,
        |    fin.ntb, d.n_chars
        |  FROM documents d JOIN fin ON fin.doc_id = d.doc_id)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(nw) AS BIGINT) AS n_words,
        |  CAST(SUM(ntb) AS BIGINT) AS n_bpe_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |  ROUND(CAST(SUM(ntb) AS DOUBLE) / CAST(SUM(nw) AS DOUBLE), 6)
        |    AS tokens_per_word,
        |  ROUND(CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(ntb) AS DOUBLE),
        |    6) AS chars_per_token
        |FROM j GROUP BY 1 ORDER BY lang""".stripMargin,
    // q250: every flag compares exact integers (cross-multiplied
    // ratios); mean_word_len is reporting-only. Chain shared with the
    // q254 per-source rollup.
    "q250_gopher_rules" ->
      s"""WITH $gopherCtes
        |SELECT doc_id, n_words, n_word_chars,
        |  CASE WHEN n_words > 0 THEN
        |    ROUND(CAST(n_word_chars AS DOUBLE) / n_words, 6)
        |  END AS mean_word_len,
        |  n_symbols, n_alpha_words, n_stopwords,
        |  flag_words, flag_word_len, flag_symbols, flag_alpha,
        |  flag_stopwords, flag_lines,
        |  CAST(flag_words + flag_word_len + flag_symbols + flag_alpha
        |    + flag_stopwords + flag_lines = 6 AS INTEGER) AS pass
        |FROM f ORDER BY doc_id""".stripMargin,
    // q254: the q250 chain rolled up per source; exact counts, one
    // division.
    "q254_gopher_by_source" ->
      s"""WITH $gopherCtes,
        |j AS (SELECT f.*, d.source FROM f
        |  JOIN documents d USING (doc_id))
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN flag_words + flag_word_len + flag_symbols
        |    + flag_alpha + flag_stopwords + flag_lines = 6
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
        |  CAST(SUM(1 - flag_words) AS BIGINT) AS fail_words,
        |  CAST(SUM(1 - flag_word_len) AS BIGINT) AS fail_word_len,
        |  CAST(SUM(1 - flag_symbols) AS BIGINT) AS fail_symbols,
        |  CAST(SUM(1 - flag_alpha) AS BIGINT) AS fail_alpha,
        |  CAST(SUM(1 - flag_stopwords) AS BIGINT) AS fail_stopwords,
        |  CAST(SUM(1 - flag_lines) AS BIGINT) AS fail_lines,
        |  ROUND(CAST(SUM(CASE WHEN flag_words + flag_word_len
        |      + flag_symbols + flag_alpha + flag_stopwords + flag_lines
        |      = 6 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
        |    AS pass_rate
        |FROM j GROUP BY 1 ORDER BY source""".stripMargin,

    // q272: q90's regex chain rolled up per source; exact counts, one
    // division (matches on the ORIGINAL text, as scrub counts them).
    "q272_pii_by_source" ->
      """WITH s AS (SELECT d.doc_id, d.source,
        |    CAST(len(regexp_extract_all(text, 'https?://[^ ]+'))
        |      AS BIGINT) AS u,
        |    CAST(len(regexp_extract_all(text,
        |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS e,
        |    CAST(len(regexp_extract_all(text, '[0-9]{4,}')) AS BIGINT)
        |      AS nn,
        |    CAST(len(regexp_extract_all(text, '\bcustomer\b'))
        |      AS BIGINT) AS en,
        |    regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(text,
        |      'https?://[^ ]+', '<URL>', 'g'),
        |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |      '[0-9]{4,}', '<NUM>', 'g'),
        |      '\bcustomer\b', '<ENTITY>', 'g') <> text AS ch
        |  FROM documents d)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN ch THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged,
        |  CAST(SUM(u) AS BIGINT) AS urls,
        |  CAST(SUM(e) AS BIGINT) AS emails,
        |  CAST(SUM(nn) AS BIGINT) AS numbers,
        |  CAST(SUM(en) AS BIGINT) AS entities,
        |  ROUND(CAST(SUM(CASE WHEN ch THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS exposure_rate
        |FROM s GROUP BY 1 ORDER BY source""".stripMargin,
    // q267: cumulative token/vocab series exact longs; the log-log
    // OLS mirrors q223 (micros so product sums stay in long range);
    // stride keeps the point set ~200 at any corpus size.
    "q267_heaps_fit" ->
      """WITH td AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(text, '\s+')) AS t
        |  FROM documents),
        |pd AS (SELECT doc_id,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT)
        |      AS ntok FROM documents),
        |fo AS (SELECT t, CAST(min(doc_id) AS BIGINT) AS doc_id
        |  FROM td GROUP BY 1),
        |nf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nf
        |  FROM fo GROUP BY 1),
        |se AS (SELECT pd.doc_id, pd.ntok,
        |    CAST(row_number() OVER (ORDER BY pd.doc_id) AS BIGINT) AS rn,
        |    CAST(SUM(pd.ntok) OVER (ORDER BY pd.doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok,
        |    CAST(SUM(coalesce(nf.nf, 0)) OVER (ORDER BY pd.doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_v
        |  FROM pd LEFT JOIN nf ON nf.doc_id = pd.doc_id),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS ndocs,
        |    CAST(SUM(ntok) AS BIGINT) AS n_tokens,
        |    greatest(1, CAST(count(*) AS BIGINT) // 200) AS step
        |  FROM pd),
        |vo AS (SELECT CAST(count(*) AS BIGINT) AS vocab FROM fo),
        |pts AS (SELECT
        |    CAST(floor(ln(CAST(cum_tok AS DOUBLE)) * 1000000e0 + 0.5e0)
        |      AS BIGINT) AS x,
        |    CAST(floor(ln(CAST(cum_v AS DOUBLE)) * 1000000e0 + 0.5e0)
        |      AS BIGINT) AS y
        |  FROM se CROSS JOIN st
        |  WHERE rn % step = 0 AND cum_tok > 0 AND cum_v > 0),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy FROM pts)
        |SELECT st.ndocs AS n_docs, st.n_tokens, vo.vocab,
        |  a.n AS n_points,
        |  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS beta,
        |  ROUND((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
        |    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * 1000000e0), 6) AS ln_k,
        |  CASE WHEN (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0e0 THEN
        |    ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |  END AS r2
        |FROM st CROSS JOIN vo CROSS JOIN a""".stripMargin,
    // q261: the q250 chain joined to lang; rates are one division of
    // exact longs, the reference is the (rate DESC, group) argmax,
    // di/flag from cross-multiplied exact integers.
    "q261_selection_parity" ->
      s"""WITH $gopherCtes,
        |j AS (SELECT f.doc_id, d.lang,
        |    CASE WHEN flag_words + flag_word_len + flag_symbols
        |      + flag_alpha + flag_stopwords + flag_lines = 6
        |      THEN 1 ELSE 0 END AS pass
        |  FROM f JOIN documents d USING (doc_id)),
        |per AS (SELECT lang AS "group", CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(pass) AS BIGINT) AS n_selected FROM j GROUP BY 1),
        |rk AS (SELECT "group", n, n_selected, row_number() OVER (
        |    ORDER BY CAST(n_selected AS DOUBLE) / n DESC, "group")
        |    AS r FROM per),
        |ref AS (SELECT n AS n_ref, n_selected AS s_ref
        |  FROM rk WHERE r = 1)
        |SELECT "group", n, n_selected,
        |  ROUND(CAST(n_selected AS DOUBLE) / n, 6) AS rate,
        |  CASE WHEN s_ref > 0 THEN
        |    ROUND(CAST(n_selected * n_ref AS DOUBLE)
        |      / CAST(n * s_ref AS DOUBLE), 6) END AS di_ratio,
        |  CASE WHEN s_ref > 0 THEN
        |    CAST(n_selected * n_ref * 10 < n * s_ref * 8 AS INTEGER)
        |  END AS flag_disparate
        |FROM per CROSS JOIN ref ORDER BY "group"""".stripMargin,
    // q230: document-presence counts exact; PMI per pair one float
    // expression floored to nanos; (df DESC, tok) vocab cut and the
    // binary tok_a < tok_b pair order match Spark's.
    "q230_pmi" ->
      """WITH dt AS (SELECT DISTINCT id, tok FROM (
        |    SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)),
        |vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
        |  FROM dt GROUP BY 1 ORDER BY df DESC, tok LIMIT 100),
        |dv AS (SELECT dt.id, dt.tok, vocab.df
        |  FROM dt JOIN vocab USING (tok)),
        |tot AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n
        |  FROM documents),
        |p AS (SELECT a.tok AS tok_a, b.tok AS tok_b,
        |    a.df AS df_a, b.df AS df_b, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM dv a JOIN dv b ON a.id = b.id AND a.tok < b.tok
        |  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 5)
        |SELECT tok_a, tok_b, df_a, df_b, n_ab,
        |  ROUND(CAST(floor(ln(CAST(n_ab AS DOUBLE) * CAST(n AS DOUBLE)
        |      / (CAST(df_a AS DOUBLE) * CAST(df_b AS DOUBLE)))
        |    * 1000000000e0 + 0.5e0) AS BIGINT) / 1000000000e0, 6) AS pmi
        |FROM p CROSS JOIN tot ORDER BY tok_a, tok_b""".stripMargin,
    // q223: ln(rank)/ln(count) quantize to integer micros at birth
    // (nanos would overflow the product sums); the OLS sums are exact
    // integers, slope/intercept/r2 one float expression each.
    "q223_zipf_fit" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |c AS (SELECT t, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
        |top AS (SELECT t, cnt FROM c ORDER BY cnt DESC, t LIMIT 200),
        |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, t) AS rnk
        |  FROM top),
        |q AS (SELECT
        |    CAST(floor(ln(CAST(rnk AS DOUBLE)) * 1000000e0 + 0.5e0)
        |      AS BIGINT) AS x,
        |    CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000e0 + 0.5e0)
        |      AS BIGINT) AS y FROM r),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy FROM q)
        |SELECT n AS n_terms,
        |  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
        |  ROUND((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
        |    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1000000e0), 6)
        |    AS intercept,
        |  CASE WHEN (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0e0
        |    THEN ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |  END AS r2
        |FROM a""".stripMargin,
    // q188: q139's chain over the survivor corpus — compaction re-fit
    // the stats, so the deleted index must answer exactly like the
    // inline operator on what remains.
    "q188_text_delete" ->
      s"""WITH ${bm25CtesWhere(" AND doc_id % 7 <> 0")}
        |SELECT query_id, rank, doc AS doc_id, score FROM
        |  (SELECT query_id, doc, score,
        |     CAST(row_number() OVER (PARTITION BY query_id
        |       ORDER BY score DESC, doc) AS INTEGER) AS rank
        |   FROM sc)
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "q187_quality_funnel" -> qualityFunnelOracle,
    "q184_train_logistic" -> trainLogisticOracle,
    // q240: one more scoring pass against w2, distributed top-20 by
    // (|margin|, doc_id) — margins exact micro integers.
    "q240_boundary_select" ->
      s"""WITH $logisticChainCtes,
        |m3 AS (SELECT f.doc_id, CAST(SUM(w.w_micro) AS BIGINT)
        |    AS margin_micro
        |  FROM feat f JOIN w2 w USING (bucket) GROUP BY 1),
        |r AS (SELECT doc_id, margin_micro, row_number() OVER (
        |    ORDER BY abs(margin_micro), doc_id) AS rank FROM m3)
        |SELECT CAST(rank AS INTEGER) AS rank, doc_id, margin_micro
        |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // q239: the q31 heuristic chain feeding the q203 confusion rollup;
    // classes binarized en/unk on both sides.
    "q239_langid_eval" ->
      """WITH tt AS (SELECT doc_id, regexp_split_to_array(text, '\s+')
        |    AS toks FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(list_filter(toks, x -> x IN
        |    ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
        |    / len(toks) AS r
        |FROM tt),
        |pr AS (SELECT doc_id,
        |    CASE WHEN r >= 0.05 THEN 'en' ELSE 'unk' END AS p FROM m),
        |j AS (SELECT CASE WHEN d.lang = 'en' THEN 'en' ELSE 'unk' END AS t,
        |    pr.p
        |  FROM documents d JOIN pr USING (doc_id)),
        |pairs AS (SELECT t, p, CAST(count(*) AS BIGINT) AS n
        |  FROM j GROUP BY 1, 2),
        |nt AS (SELECT t AS class, CAST(SUM(n) AS BIGINT) AS n_true
        |  FROM pairs GROUP BY 1),
        |np AS (SELECT p AS class, CAST(SUM(n) AS BIGINT) AS n_pred
        |  FROM pairs GROUP BY 1),
        |cls AS (SELECT class FROM nt UNION SELECT class FROM np),
        |tp AS (SELECT t AS class, n AS tp FROM pairs WHERE t = p)
        |SELECT cls.class, coalesce(tp.tp, 0) AS tp,
        |  coalesce(nt.n_true, 0) AS n_true,
        |  coalesce(np.n_pred, 0) AS n_pred,
        |  coalesce(np.n_pred, 0) - coalesce(tp.tp, 0) AS fp,
        |  coalesce(nt.n_true, 0) - coalesce(tp.tp, 0) AS fn,
        |  CASE WHEN coalesce(np.n_pred, 0) > 0 THEN
        |    ROUND(CAST(coalesce(tp.tp, 0) AS DOUBLE) / np.n_pred, 6)
        |  END AS prec,
        |  CASE WHEN coalesce(nt.n_true, 0) > 0 THEN
        |    ROUND(CAST(coalesce(tp.tp, 0) AS DOUBLE) / nt.n_true, 6)
        |  END AS rec,
        |  CASE WHEN coalesce(np.n_pred, 0) + coalesce(nt.n_true, 0) > 0 THEN
        |    ROUND(CAST(2 * coalesce(tp.tp, 0) AS DOUBLE)
        |      / (coalesce(np.n_pred, 0) + coalesce(nt.n_true, 0)), 6)
        |  END AS f1
        |FROM cls LEFT JOIN tp ON tp.class = cls.class
        |  LEFT JOIN nt ON nt.class = cls.class
        |  LEFT JOIN np ON np.class = cls.class
        |ORDER BY cls.class""".stripMargin,
    // q182: the fraction is ONE division of exact integers
    // (count * chars(gram) / chars(doc)), so no float order varies;
    // top-gram ties break lexicographically in both engines.
    "q182_top_ngram" ->
      """WITH toks AS (SELECT doc_id, len(text) AS n_chars,
        |    string_split(text, ' ') AS t FROM documents
        |  WHERE text IS NOT NULL AND len(text) > 0),
        |ns(n) AS (VALUES (1), (2), (3), (4)),
        |grams AS (SELECT doc_id, n_chars, n,
        |    unnest([array_to_string(t[i:i+n-1], ' ')
        |            FOR i IN generate_series(1, len(t)-n+1)]) AS gram
        |  FROM toks CROSS JOIN ns WHERE len(t) >= n),
        |c AS (SELECT doc_id, n_chars, n, gram, count(*) AS cnt
        |  FROM grams GROUP BY 1, 2, 3, 4),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id, n
        |    ORDER BY cnt DESC, gram) AS rk FROM c)
        |SELECT doc_id, CAST(n AS INTEGER) AS n, gram AS top_gram,
        |  CAST(cnt AS BIGINT) AS n_occurrences,
        |  ROUND(CAST(cnt * len(gram) AS DOUBLE) / n_chars, 6)
        |    AS top_gram_char_frac
        |FROM r WHERE rk = 1 ORDER BY doc_id, n""".stripMargin,
    // q176: q139's BM25 chain + q141's dense-cosine tier as graded
    // relevance; each position's discounted gain floors to integer
    // nano-units in the IDENTICAL expression order before the exact
    // sums, one final division per query.
    // q179: the JDK and DuckDB both implement Unicode-standard NFC,
    // which is what makes the normalization pass oracle-checkable.
    "q179_nfc_normalize" ->
      """SELECT doc_id, nfc_normalize(text) AS text_nfc,
        |  CASE WHEN text <> nfc_normalize(text) THEN 1 ELSE 0 END AS changed,
        |  CAST(len(text) AS INTEGER) AS n_chars_raw,
        |  CAST(len(nfc_normalize(text)) AS INTEGER) AS n_chars_nfc
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q178: q139's BM25 chain + the dense top-5 as the relevant set;
    // counts/min-rank exact integers, two final divisions.
    "q178_rank_eval" ->
      s"""WITH $bm25Ctes,
        |bm AS (SELECT query_id, doc, rank FROM
        |  (SELECT query_id, doc,
        |     CAST(row_number() OVER (PARTITION BY query_id
        |       ORDER BY score DESC, doc) AS INTEGER) AS rank
        |   FROM sc) WHERE rank <= 10),
        |qv AS (SELECT query_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings JOIN probes ON vec_id = query_id),
        |cv AS (SELECT vec_id AS doc, CAST(embedding AS DOUBLE[]) AS ce
        |  FROM embeddings JOIN corpus ON vec_id = doc_id),
        |ds AS (SELECT query_id, doc,
        |    ROUND(list_cosine_similarity(qe, ce), 6) AS cos FROM qv, cv),
        |rels AS (SELECT query_id, doc FROM
        |  (SELECT query_id, doc,
        |     row_number() OVER (PARTITION BY query_id
        |       ORDER BY cos DESC, doc) AS r FROM ds) WHERE r <= 5),
        |tot AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
        |  FROM rels GROUP BY 1),
        |h AS (SELECT b.query_id, CAST(count(*) AS BIGINT) AS n_rel_at_k,
        |    CAST(min(b.rank) AS INTEGER) AS first_rel_rank
        |  FROM bm b JOIN rels r ON r.query_id = b.query_id AND r.doc = b.doc
        |  GROUP BY 1)
        |SELECT t.query_id, n_rel,
        |  CAST(coalesce(n_rel_at_k, 0) AS BIGINT) AS n_rel_at_k,
        |  first_rel_rank,
        |  round(CAST(coalesce(n_rel_at_k, 0) AS DOUBLE)
        |    / least(n_rel, 10), 6) AS recall_at_k,
        |  round(1e0 / first_rel_rank, 6) AS rr
        |FROM tot t LEFT JOIN h USING (query_id)
        |ORDER BY t.query_id""".stripMargin,
    // q177: the three per-doc signal oracles verbatim as derived
    // tables, joined per doc, each 6dp signal lifted to exact integer
    // micros before the per-source mean (order-invariant).
    "q177_source_quality" ->
      s"""WITH ent AS (SELECT * FROM ($charEntropyOracle)),
        |lm AS (SELECT * FROM ($trigramLmOracle)),
        |rep AS (SELECT * FROM ($repetitionOracle)),
        |j AS (SELECT d.source,
        |    CAST(floor(e.entropy_nats * 1000000e0 + 0.5e0) AS BIGINT) AS em,
        |    CAST(floor(l.avg_logprob * 1000000e0 + 0.5e0) AS BIGINT) AS lmm,
        |    CAST(floor(r.repetition_ratio * 1000000e0 + 0.5e0) AS BIGINT) AS rm
        |  FROM documents d
        |  JOIN ent e USING (doc_id)
        |  JOIN lm l USING (doc_id)
        |  JOIN rep r USING (doc_id))
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  round((CAST(sum(em) AS DOUBLE) / 1000000e0) / count(*), 6)
        |    AS mean_entropy,
        |  round((CAST(sum(lmm) AS DOUBLE) / 1000000e0) / count(*), 6)
        |    AS mean_logprob,
        |  round((CAST(sum(rm) AS DOUBLE) / 1000000e0) / count(*), 6)
        |    AS mean_repetition
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q176_ndcg" ->
      s"""WITH $bm25Ctes,
        |bm AS (SELECT query_id, doc, rank FROM
        |  (SELECT query_id, doc,
        |     CAST(row_number() OVER (PARTITION BY query_id
        |       ORDER BY score DESC, doc) AS INTEGER) AS rank
        |   FROM sc) WHERE rank <= 10),
        |qv AS (SELECT query_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings JOIN probes ON vec_id = query_id),
        |cv AS (SELECT vec_id AS doc, CAST(embedding AS DOUBLE[]) AS ce
        |  FROM embeddings JOIN corpus ON vec_id = doc_id),
        |ds AS (SELECT query_id, doc,
        |    ROUND(list_cosine_similarity(qe, ce), 6) AS cos FROM qv, cv),
        |rels AS (SELECT query_id, doc, cos AS rel FROM
        |  (SELECT query_id, doc, cos,
        |     row_number() OVER (PARTITION BY query_id
        |       ORDER BY cos DESC, doc) AS r FROM ds) WHERE r <= 20),
        |dn AS (SELECT b.query_id,
        |    CAST(sum(CAST(floor(greatest(coalesce(r.rel, 0e0), 0e0)
        |        / log2(b.rank + 1) * 1000000000e0 + 0.5e0) AS BIGINT))
        |      AS BIGINT) AS dnano
        |  FROM bm b LEFT JOIN rels r
        |    ON r.query_id = b.query_id AND r.doc = b.doc
        |  GROUP BY 1),
        |idn AS (SELECT query_id,
        |    CAST(sum(CAST(floor(greatest(rel, 0e0)
        |        / log2(pos + 1) * 1000000000e0 + 0.5e0) AS BIGINT))
        |      AS BIGINT) AS inano
        |  FROM (SELECT query_id, doc, rel,
        |          row_number() OVER (PARTITION BY query_id
        |            ORDER BY rel DESC, doc) AS pos FROM rels)
        |  WHERE pos <= 10 GROUP BY 1)
        |SELECT d.query_id,
        |  round(CAST(dnano AS DOUBLE) / 1000000000e0, 6) AS dcg,
        |  round(CAST(coalesce(inano, 0) AS DOUBLE) / 1000000000e0, 6) AS idcg,
        |  CASE WHEN coalesce(inano, 0) > 0
        |    THEN round(CAST(dnano AS DOUBLE) / inano, 6) END AS ndcg
        |FROM dn d LEFT JOIN idn USING (query_id) ORDER BY query_id""".stripMargin,
    // q168: counts replayed from the same single-space tokenization
    // (q87's rendering), the interpolation evaluated in the IDENTICAL
    // left-associated expression order with e0 float constants, each
    // position floored to nano-nats before the exact integer sum.
    "q168_trigram_lm" -> trigramLmOracle,
    // q208: the q142 shingle CTE shape (whole-text sentinel for short
    // docs), string grams exact where the Spark side moves xxhash64
    // gram keys — same-distribution equivalence as q57's hashed pairs.
    "q208_ngram_novelty" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ')
        |        FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |gr AS (SELECT DISTINCT doc_id, unnest(grams) AS gram FROM sh),
        |d AS (SELECT gram, CAST(count(*) AS BIGINT) AS df
        |  FROM gr GROUP BY 1)
        |SELECT gr.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unique,
        |  ROUND(CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS novelty
        |FROM gr JOIN d USING (gram) GROUP BY 1 ORDER BY 1""".stripMargin,
    // q205: decile bins over exact p_micro; both ratios one division.
    "q205_calibration_curve" ->
      s"""WITH $scoredPassCtes,
        |b AS (SELECT LEAST(p_micro // 100000, 9) AS bin, p_micro, pass
        |      FROM d)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  ROUND(CAST(SUM(p_micro) AS BIGINT) / (count(*) * 1000000e0), 6)
        |    AS mean_p,
        |  ROUND(CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS pos_rate
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    // q218: per-bin weighted |acc - conf| gaps floored to nanos at
    // birth over exact integers; sum exact, one division at the end.
    "q218_ece" ->
      s"""WITH $scoredPassCtes,
        |bb AS (SELECT LEAST(p_micro // 100000, 9) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS np,
        |    CAST(SUM(p_micro) AS BIGINT) AS sp
        |  FROM d GROUP BY 1),
        |tt AS (SELECT CAST(SUM(n) AS BIGINT) AS n_items FROM bb),
        |s AS (SELECT n_items, CAST(floor(
        |    abs(np / CAST(n AS DOUBLE) - sp / (n * 1000000e0))
        |    * n / n_items * 1000000000e0 + 0.5e0) AS BIGINT) AS tn
        |  FROM bb CROSS JOIN tt)
        |SELECT n_items, CAST(count(*) AS BIGINT) AS bins_used,
        |  ROUND(CAST(SUM(tn) AS BIGINT) / 1000000000e0, 6) AS ece
        |FROM s GROUP BY 1""".stripMargin,
    // q206: Mann-Whitney over distinct-score groups; 2R stays integer
    // via p*(2*cum + c + 1), AUC is one exact division.
    "q206_roc_auc" ->
      s"""WITH $scoredPassCtes,
        |bs AS (SELECT p_micro AS scv, CAST(count(*) AS BIGINT) AS c,
        |    CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS p
        |  FROM d GROUP BY 1),
        |cm AS (SELECT scv, c, p, CAST(coalesce(SUM(c) OVER (ORDER BY scv
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS cum FROM bs),
        |ag AS (SELECT CAST(SUM(c) AS BIGINT) AS n_items,
        |    CAST(SUM(p) AS BIGINT) AS n_pos,
        |    CAST(SUM(p * (2 * cum + c + 1)) AS BIGINT) AS r2 FROM cm)
        |SELECT n_items, n_pos, n_items - n_pos AS n_neg,
        |  CASE WHEN n_pos > 0 AND n_items - n_pos > 0 THEN
        |    ROUND(CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE)
        |      / (2 * n_pos * (n_items - n_pos)), 6) END AS auc
        |FROM ag""".stripMargin,
    // q200: q168's LM as a CTE, ntile(3) per lang on the identical
    // (avg_logprob DESC, doc_id) order.
    "q200_ppl_buckets" ->
      s"""WITH lm AS (SELECT * FROM ($trigramLmOracle)),
        |j AS (SELECT d.doc_id, d.lang, lm.n_trigrams, lm.avg_logprob,
        |        CAST(ntile(3) OVER (PARTITION BY d.lang
        |          ORDER BY lm.avg_logprob DESC, d.doc_id) AS INTEGER) AS tier
        |      FROM documents d JOIN lm ON lm.doc_id = d.doc_id)
        |SELECT doc_id, lang, n_trigrams, avg_logprob, tier,
        |  CASE WHEN tier = 1 THEN 'head' WHEN tier = 3 THEN 'tail'
        |       ELSE 'middle' END AS ppl_bucket
        |FROM j ORDER BY doc_id""".stripMargin,
    // q166: characters via the LATERAL generate_series + substr walk
    // (see charEntropyOracle).
    "q166_char_entropy" -> charEntropyOracle,
    // q161: the built index's committed postings must reproduce the
    // raw corpus exactly — doc count, summed doc length (q139's
    // string_split tokenization), distinct (doc, token) postings.
    "q161_text_index_build" ->
      """WITH c AS (SELECT doc_id, len(string_split(text, ' ')) AS dl
        |  FROM documents WHERE source <> 'src0'),
        |p AS (SELECT DISTINCT doc_id, token FROM
        |  (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |   FROM documents WHERE source <> 'src0'))
        |SELECT 2 AS n_batches, count(*) AS n_docs,
        |  CAST(sum(dl) AS BIGINT) AS sum_dl,
        |  (SELECT count(*) FROM p) AS n_postings
        |FROM c""".stripMargin,
    // q158: definitional per-group counts + rank on (cnt DESC, token);
    // share divides exact integers, float only at the end.
    "q158_source_top_terms" ->
      """WITH t AS (SELECT source AS g, u.tok FROM documents,
        |  LATERAL (SELECT unnest(regexp_split_to_array(text, '\s+')) AS tok) u
        |  WHERE u.tok <> ''),
        |c AS (SELECT g, tok AS token, count(*) AS cnt FROM t GROUP BY 1, 2),
        |r AS (SELECT g, token, cnt,
        |    CAST(row_number() OVER (PARTITION BY g
        |      ORDER BY cnt DESC, token) AS INTEGER) AS rank,
        |    round(cnt/sum(cnt) OVER (PARTITION BY g), 6) AS share FROM c)
        |SELECT g AS source, rank, token, cnt, share FROM r WHERE rank <= 5
        |ORDER BY source, rank""".stripMargin,
    // q153: definitional distinct-token pair join; counts exact
    // integers, only the final Jaccard divides (BIGINT/BIGINT is
    // float division in both engines).
    "q153_vocab_overlap" ->
      """WITH st AS (SELECT DISTINCT source AS g, t.tok FROM documents,
        |  LATERAL (SELECT unnest(regexp_split_to_array(text, '\s+')) AS tok) t
        |  WHERE t.tok <> ''),
        |sz AS (SELECT g, count(*) AS n FROM st GROUP BY 1),
        |px AS (SELECT a.g AS source_a, b.g AS source_b, count(*) AS n_shared
        |  FROM st a JOIN st b ON a.tok = b.tok AND a.g < b.g GROUP BY 1, 2)
        |SELECT source_a, source_b, sa.n AS n_a, sb.n AS n_b, n_shared,
        |  round(n_shared/(sa.n + sb.n - n_shared), 6) AS jaccard
        |FROM px JOIN sz sa ON px.source_a = sa.g
        |  JOIN sz sb ON px.source_b = sb.g
        |ORDER BY source_a, source_b""".stripMargin,
    // q144: the same base = pos - tok_idx alignment the index query
    // runs, replayed definitionally over raw token positions: a base
    // covered by every phrase token index is one (overlap-counting)
    // occurrence.
    "q144_phrase_search" ->
      """WITH probes AS (SELECT doc_id AS query_id,
        |    array_to_string(string_split(text, ' ')[2:4], ' ') AS phrase
        |  FROM documents WHERE source = 'src0' AND doc_id % 50 = 0),
        |qt AS (SELECT query_id, gs.i - 1 AS tok_idx, string_split(phrase, ' ')[gs.i] AS token
        |  FROM probes, LATERAL (SELECT unnest(generate_series(1,
        |    len(string_split(phrase, ' ')))) AS i) gs),
        |plen AS (SELECT query_id, count(*) AS plen FROM qt GROUP BY 1),
        |dt AS (SELECT doc_id, gs.i - 1 AS pos, string_split(text, ' ')[gs.i] AS tok
        |  FROM documents, LATERAL (SELECT unnest(generate_series(1,
        |    len(string_split(text, ' ')))) AS i) gs
        |  WHERE source <> 'src0'),
        |cov AS (SELECT query_id, doc_id, dt.pos - qt.tok_idx AS base,
        |    count(DISTINCT qt.tok_idx) AS cov
        |  FROM qt JOIN dt ON qt.token = dt.tok GROUP BY 1, 2, 3)
        |SELECT query_id, doc_id, count(*) AS n_matches
        |FROM cov JOIN plen USING (query_id)
        |WHERE cov = plen
        |GROUP BY 1, 2 ORDER BY query_id, doc_id""".stripMargin,
    // q143: the Spark side is exact by construction (MG candidates are
    // a superset, the verify pass re-counts exactly), so the oracle is
    // the definitional count/threshold.
    "q143_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |n AS (SELECT count(*) AS n FROM t),
        |c AS (SELECT token, count(*) AS cnt FROM t GROUP BY 1)
        |SELECT token, cnt, ROUND(CAST(cnt AS DOUBLE) / n.n, 6) AS share
        |FROM c, n WHERE cnt * 200 > n.n ORDER BY token""".stripMargin,
    "q141_hybrid_rrf" -> hybridRrfOracle,
    "q338_index_hybrid" -> indexHybridOracle,
    "q140_text_index" -> bm25Oracle,
    "q139_bm25" -> bm25Oracle,
    "q307_bm25_pruned" -> bm25PrunedOracle,
    "q318_rm3_expansion" -> rm3Oracle,
    "q114_corpus_stats" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(count(DISTINCT text) AS BIGINT) AS distinct_texts,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |  ROUND(avg(len(string_split(text, ' '))), 6) AS avg_doc_tokens
        |FROM documents""".stripMargin,
    "q112_bpe_merges" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |p AS (SELECT array_to_string(t[i:i+1], ' ') AS merge_pair
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) gs
        |  WHERE len(t) >= 2)
        |SELECT merge_pair, count(*) AS n_occurrences
        |FROM p GROUP BY merge_pair
        |ORDER BY n_occurrences DESC, merge_pair LIMIT 50""".stripMargin,
    "q105_span_corrupt" -> {
      def st(j: String) =
        s"${md5l(s"concat(CAST(doc_id AS VARCHAR), ':', CAST($j AS VARCHAR), ':s')")} % 100 < 5"
      val cov = s"(${st("i - 1")} OR (i >= 2 AND ${st("i - 2")})" +
        s" OR (i >= 3 AND ${st("i - 3")}))"
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |m AS (SELECT doc_id, toks,
        |    [CASE WHEN $cov THEN '<X>' ELSE toks[i] END
        |     FOR i IN generate_series(1, len(toks))] AS ct,
        |    [i FOR i IN generate_series(1, len(toks)) IF ${st("i - 1")}] AS starts,
        |    [i FOR i IN generate_series(1, len(toks)) IF $cov] AS cov
        |  FROM t)
        |SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
        |  CAST(len(starts) AS INTEGER) AS n_spans,
        |  CAST(len(cov) AS INTEGER) AS n_masked,
        |  array_to_string(ct, ' ') AS corrupted_text
        |FROM m ORDER BY doc_id""".stripMargin
    },
    "q104_mask_tokens" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |m AS (SELECT doc_id, toks,
        |    [CASE WHEN ${md5l("concat(CAST(doc_id AS VARCHAR), ':', CAST(i - 1 AS VARCHAR))")}
        |            % 100 < 15
        |          THEN '<MASK>' ELSE toks[i] END
        |     FOR i IN generate_series(1, len(toks))] AS mt,
        |    [i FOR i IN generate_series(1, len(toks))
        |     IF ${md5l("concat(CAST(doc_id AS VARCHAR), ':', CAST(i - 1 AS VARCHAR))")}
        |        % 100 < 15] AS hits
        |  FROM t)
        |SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
        |  CAST(len(hits) AS INTEGER) AS n_masked,
        |  array_to_string(mt, ' ') AS masked_text
        |FROM m ORDER BY doc_id""".stripMargin,
    "q98_linear_quality" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |    FROM documents),
        |v AS (SELECT DISTINCT token FROM toks),
        |w AS (SELECT token,
        |    CAST(floor(CAST(${md5l("token")} % 2001 - 1000 AS DOUBLE)
        |               / 1000.0e0 * 1000000e0) AS BIGINT) AS w_ppm FROM v),
        |s AS (SELECT doc_id, count(*) AS n_tokens,
        |    CAST(sum(coalesce(w_ppm, 0)) AS BIGINT) AS sw
        |  FROM toks LEFT JOIN w USING (token) GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        |  ROUND(1.0e0 / (1.0e0 + exp(-(CAST(sw AS DOUBLE) / 1000000e0
        |    / CAST(n_tokens AS DOUBLE)))), 6) AS p_keep,
        |  sw >= 0 AS keep
        |FROM s ORDER BY doc_id""".stripMargin,
    "q90_scrub" ->
      """WITH s AS (SELECT doc_id, text,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |      'https?://[^ ]+', '<URL>', 'g'),
        |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |      '[0-9]{4,}', '<NUM>', 'g'),
        |      '\bcustomer\b', '<ENTITY>', 'g') AS scrubbed_text
        |  FROM documents)
        |SELECT doc_id, scrubbed_text,
        |  CAST(len(regexp_extract_all(text, 'https?://[^ ]+')) AS INTEGER) AS n_urls,
        |  CAST(len(regexp_extract_all(text,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '[0-9]{4,}')) AS INTEGER) AS n_numbers,
        |  CAST(len(regexp_extract_all(text, '\bcustomer\b')) AS INTEGER) AS n_entities,
        |  scrubbed_text <> text AS changed
        |FROM s ORDER BY doc_id""".stripMargin,
    "q84_regex_tokens" ->
      """WITH r AS (SELECT doc_id,
        |    regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS sub,
        |    len(regexp_split_to_array(text, '\s+')) AS n_ws
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(n_ws AS INTEGER) AS n_ws_tokens,
        |  CAST(len(sub) AS INTEGER) AS n_subtokens,
        |  CAST(len(list_filter(sub, x -> regexp_matches(x, '^[A-Za-z]+$'))) AS INTEGER)
        |    AS n_word,
        |  CAST(len(list_filter(sub, x -> regexp_matches(x, '^[0-9]+$'))) AS INTEGER)
        |    AS n_number,
        |  CAST(len(sub) - len(list_filter(sub, x -> regexp_matches(x, '^[A-Za-z]+$')))
        |       - len(list_filter(sub, x -> regexp_matches(x, '^[0-9]+$'))) AS INTEGER)
        |    AS n_punct,
        |  ROUND(CAST(len(sub) AS DOUBLE) / n_ws, 6) AS fertility
        |FROM r ORDER BY doc_id""".stripMargin,
    "q87_bigram_logprob" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bgs AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 2
        |    THEN [array_to_string(t[i:i+1], ' ') FOR i IN generate_series(1, len(t)-1)]
        |    ELSE [array_to_string(t, ' ')] END) AS bigram FROM toks),
        |bg AS (SELECT doc_id, bigram FROM bgs
        |       WHERE len(string_split(bigram, ' ')) = 2),
        |c AS (SELECT bigram, count(*) AS bf, string_split(bigram, ' ')[1] AS w1
        |      FROM bg GROUP BY bigram),
        |p AS (SELECT w1, CAST(sum(bf) AS BIGINT) AS pf FROM c GROUP BY w1),
        |t AS (SELECT doc_id,
        |    CAST(floor(ln(CAST(bf AS DOUBLE) / CAST(pf AS DOUBLE))
        |        * 1000000000e0 + 0.5e0) AS BIGINT) AS tn
        |  FROM bg JOIN c USING (bigram) JOIN p USING (w1))
        |SELECT doc_id, count(*) AS n_bigrams,
        |  ROUND((CAST(sum(tn) AS BIGINT) / 1000000000e0) / count(*), 6)
        |    AS avg_logprob
        |FROM t
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q73_unigram_logprob" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
        |             FROM documents),
        |c AS (SELECT token, count(*) AS tf FROM tok GROUP BY token),
        |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS total FROM c),
        |t AS (SELECT doc_id,
        |    CAST(floor(ln(CAST(tf AS DOUBLE) / CAST(total AS DOUBLE))
        |        * 1000000000e0 + 0.5e0) AS BIGINT) AS tn
        |  FROM tok JOIN c USING (token) CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  ROUND((CAST(sum(tn) AS BIGINT) / 1000000000e0) / count(*), 6)
        |    AS avg_logprob
        |FROM t
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q65_token_histogram" ->
      """WITH n AS (SELECT len(regexp_split_to_array(text, '\s+')) AS n_tokens
        |           FROM documents)
        |SELECT CAST(LEAST(FLOOR(n_tokens / 50.0), 9) AS INTEGER) AS bucket,
        |  count(*) AS n_docs,
        |  CAST(min(n_tokens) AS INTEGER) AS min_tokens,
        |  CAST(max(n_tokens) AS INTEGER) AS max_tokens
        |FROM n GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q67_repetition" -> repetitionOracle,
    "q32_fingerprint" ->
      s"""WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, text, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |g AS (SELECT doc_id, text, unnest(grams) AS g FROM sh)
        |SELECT doc_id, ${md5l("text")} AS text_hash,
        |  min(${md5l("g")}) AS min_shingle_hash
        |FROM g GROUP BY doc_id, text ORDER BY doc_id""".stripMargin,
    "q46_tfidf_top_terms" ->
      """WITH tf AS (
        |  SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tfc AS (SELECT doc, token, count(*) AS tf FROM tf GROUP BY doc, token),
        |dfc AS (SELECT token, count(DISTINCT doc) AS df FROM tfc GROUP BY token),
        |scored AS (
        |  SELECT doc, tfc.token,
        |    ROUND(tf * ln((SELECT count(*) FROM documents) / CAST(df AS DOUBLE)), 6)
        |      AS tfidf
        |  FROM tfc JOIN dfc ON tfc.token = dfc.token),
        |ranked AS (
        |  SELECT doc, token, tfidf,
        |    CAST(row_number() OVER (PARTITION BY doc ORDER BY tfidf DESC, token)
        |         AS INTEGER) AS term_rank
        |  FROM scored)
        |SELECT doc AS doc_id, term_rank, token, tfidf
        |FROM ranked WHERE term_rank <= 3 ORDER BY doc_id, term_rank""".stripMargin,
    "q37_vocab" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin,
    "q28_text_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  ROUND(avg(n_chars), 6) AS avg_chars,
        |  ROUND(avg(len(regexp_split_to_array(text, '\s+'))), 6) AS avg_tokens
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    // q331: the mixed-script corpus derivation (md5-indexed fixed CJK
    // alphabet for odd doc_ids), the exact-integer no-space routing
    // decision, and both tokenizations — char bigrams via the
    // generate_series comprehension, ws via regexp split — replayed
    // end-to-end. The UTF-8 alphabet literals are interpolated from the
    // SAME Scala constants the Spark side uses.
    "q331_cjk_tokens" -> {
      val alpha = CjkAlphabet.map(c => s"'$c'").mkString("[", ",", "]")
      s"""WITH mixed AS (SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 1 THEN
        |      array_to_string([($alpha)[1 + CAST(${md5l("t")} % 16 AS INTEGER)]
        |        FOR t IN string_split(text, ' ')], '')
        |    ELSE text END AS text
        |  FROM documents),
        |f AS (SELECT doc_id, text,
        |    length(regexp_replace(text,
        |      '[^\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}]', '', 'g')) AS n_cjk,
        |    length(regexp_replace(text, '\\s', '', 'g')) AS n_nonws,
        |    regexp_replace(text, '\\s', '', 'g') AS s
        |  FROM mixed),
        |tk AS (SELECT doc_id,
        |    CASE WHEN n_nonws > 0 AND n_cjk * 2 >= n_nonws THEN
        |      [substr(s, i, 2)
        |       FOR i IN generate_series(1, greatest(length(s) - 1, 1))]
        |    ELSE regexp_split_to_array(text, '\\s+') END AS toks
        |  FROM f)
        |SELECT doc_id,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
        |  ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS ttr,
        |  ROUND(CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
        |      AS DOUBLE) / len(toks), 6) AS mean_token_len
        |FROM tk ORDER BY doc_id""".stripMargin
    },
    "q29_token_counts" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(text, '\s+')) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(regexp_split_to_array(text, '\s+'))) AS INTEGER) AS n_distinct,
        |  ROUND(CAST(len(list_distinct(regexp_split_to_array(text, '\s+'))) AS DOUBLE)
        |        / len(regexp_split_to_array(text, '\s+')), 6) AS ttr,
        |  ROUND(CAST(list_aggregate(list_transform(regexp_split_to_array(text, '\s+'),
        |          x -> length(x)), 'sum') AS DOUBLE)
        |        / len(regexp_split_to_array(text, '\s+')), 6) AS mean_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q30_quality_score" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(list_filter(toks, x -> x IN
        |    ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
        |    / len(toks) AS stop_ratio,
        |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
        |  LEAST(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) AS len_score
        |FROM t)
        |SELECT doc_id, ROUND(stop_ratio, 6) AS stopword_ratio, ROUND(ttr, 6) AS ttr,
        |  ROUND(len_score, 6) AS length_score,
        |  ROUND(0.4 * len_score + 0.3 * stop_ratio + 0.3 * ttr, 6) AS quality_score
        |FROM m ORDER BY doc_id""".stripMargin,
    "q31_langid" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(list_filter(toks, x -> x IN
        |    ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
        |    / len(toks) AS r
        |FROM t)
        |SELECT doc_id, ROUND(r, 6) AS en_stopword_ratio,
        |  CASE WHEN r >= 0.05 THEN 'en' ELSE 'unk' END AS predicted_lang
        |FROM m ORDER BY doc_id""".stripMargin)
}
