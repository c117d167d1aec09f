package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{IdempotentSink, Tables}
import graft.functions.Md5Family
import graft.operators._

/** North-star extension queries (BASELINE.json): the LLM-training-data
  * pipeline operators — dedup, similarity search, text analysis,
  * sessionization, JSON extraction, multimodal plumbing — over the
  * documents/embeddings/events tables. DuckDB oracles wherever the
  * semantics are SQL-expressible — including the hash-based operators,
  * registered with the md5-derived `Md5Family` so both engines compute
  * identical hashes (golden specs additionally cover the xxhash64
  * production default).
  */
object ExtensionQueries {
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

  private val simhashPairs: Q = (s, dir) =>
    Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text", hashes = Md5Family)

  private val ngramJaccard: Q = (s, dir) =>
    Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text")

  private val annTopK: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
  }

  // `Similarity.thresholdPairs` (the exact O(n²) all-pairs scorer) is
  // deliberately NOT registered: its plan is a cartesian product by
  // construction, a scale-killer no suite query may contain
  // (QueriesSmokeSpec asserts CartesianProduct-free plans suite-wide).
  // It remains the spec-only verifier for the LSH path, exactly like
  // the single-task union-find verifies connectedComponentsStars.

  private val annLsh: Q = (s, dir) =>
    Similarity.lshNeighborPairs(Tables.embeddings(s, dir), threshold = 0.4)

  private val centroids: Q = (s, dir) =>
    Similarity.labelCentroids(Tables.embeddings(s, dir))

  private val textStats: Q = (s, dir) =>
    TextAnalysis.textStats(Tables.documents(s, dir))

  private val tokenCounts: Q = (s, dir) =>
    TextAnalysis.tokenCounts(Tables.documents(s, dir), "doc_id", "text").orderBy("doc_id")

  private val quality: Q = (s, dir) =>
    TextAnalysis.qualityScore(Tables.documents(s, dir), "doc_id", "text").orderBy("doc_id")

  private val langId: Q = (s, dir) =>
    TextAnalysis.langId(Tables.documents(s, dir), "doc_id", "text").orderBy("doc_id")

  private val fingerprint: Q = (s, dir) =>
    TextAnalysis.fingerprint(Tables.documents(s, dir), "doc_id", "text", hashes = Md5Family)
      .orderBy("doc_id")

  private val jsonExtract: Q = (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id")

  private val sessionizeQ: Q = (s, dir) =>
    Sessions.sessionize(Tables.events(s, dir), gapMinutes = 30)

  private val tumbling: Q = (s, dir) =>
    Sessions.tumblingHourly(Tables.events(s, dir))

  private val multimodal: Q = (s, dir) =>
    Multimodal.decodeFeatures(Tables.documents(s, dir)).toDF()
      // text stand-in payloads take the deterministic stub branch;
      // the branch flag is q162's concern, not part of this contract
      .select("doc_id", "n_bytes", "width", "height", "channels")
      .orderBy("doc_id")

  /** q162: REAL image decode end-to-end — each doc's text renders to a
    * true PNG with deterministic dimensions (8 + doc_id % 24 wide,
    * 8 + utf8len % 24 tall, `Multimodal.withImagePayload`), and
    * `decodePayloads` parses the actual container via javax.imageio:
    * recovered width/height/channels and the real-decode branch flag
    * are oracle-predicted. n_bytes (the PNG's compressed size) is
    * encoder-dependent and deliberately excluded.
    */
  private val imageDecodeQ: Q = (s, dir) =>
    Multimodal.decodePayloads(
        Multimodal.withImagePayload(Tables.documents(s, dir))).toDF()
      .select("doc_id", "width", "height", "channels", "real_decode")
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

  /** Schema-on-read JSON parsing (from_json with an explicit schema —
    * the structured sibling of q33's get_json_object path).
    */
  private val fromJson: Q = (s, dir) =>
    Tables.events(s, dir)
      .withColumn("p", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        min(col("p.k")).as("min_k"),
        max(col("p.k")).as("max_k"),
        round(avg(col("p.k")), 6).as("avg_k"))
      .orderBy("event_type")

  /** IVF over the hash-seeded codebook, so the full pipeline (seed
    * selection → list assignment → probe routing → candidate ranking)
    * is SQL-expressible and hash-checked; the learned-k-means codebook
    * (`Similarity.ivfTopK`) is the production default and keeps its
    * recall spec.
    */
  private val annIvf: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfTopKSeeded(emb, emb.filter(col("vec_id") < 10), k = 3, nprobe = 4)
  }

  /** As-of attribution: each purchase joined to the user's most recent
    * prior (or simultaneous) click — oracled against DuckDB's native
    * ASOF JOIN, implemented here with the union+window form (one
    * shuffle on user_id, no range-join explosion).
    */
  private val asofAttribution: Q = (s, dir) => {
    val events = Tables.events(s, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
    AsofJoin.asofLookup(purchases, clicks, "user_id", "ts", Seq("click_id", "click_ts"))
      .select(col("purchase_id"), col("user_id"), col("ts").as("purchase_ts"),
        col("asof_click_id").as("click_id"), col("asof_click_ts").as("click_ts"))
      .orderBy("purchase_id")
  }

  /** Interpolated percentiles per group (Spark `percentile` ==
    * DuckDB `quantile_cont` semantics — verified by the oracle).
    */
  private val percentiles: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(percentile(col("value"), lit(0.5)), 6).as("med"),
        round(percentile(col("value"), lit(0.9)), 6).as("p90"))
      .orderBy("event_type")

  /** Pivot (cross-tab): linestatus columns per returnflag — Spark's
    * pivot == manual CASE aggregation (the oracle's portable form).
    */
  private val pivotQ: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(col("l_quantity")))
      .withColumnsRenamed(Map("F" -> "qty_f", "O" -> "qty_o"))
      .orderBy("l_returnflag")

  /** Ranking-window family (absent from the reference, SURVEY §2.5
    * notes — added as extension coverage): row_number / rank /
    * dense_rank / lag / lead / ntile over a user-partitioned ordering.
    */
  private val rankWindows: Q = (s, dir) => {
    val byUser = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    Tables.events(s, dir)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), col("value"),
        row_number().over(byUser).as("rn"),
        rank().over(byUser).as("rnk"),
        dense_rank().over(byUser).as("drnk"),
        lag(col("value"), 1).over(byUser).as("prev_value"),
        lead(col("value"), 1).over(byUser).as("next_value"),
        ntile(4).over(byUser).as("quartile"))
      .orderBy("user_id", "rn")
  }

  private val tfidf: Q = (s, dir) =>
    TextAnalysis.tfidfTopTerms(Tables.documents(s, dir), "doc_id", "text", k = 3)

  /** Spark's NATIVE session_window, verified against the same oracle
    * as the lag/cumsum formulation (q34) — the two sessionization
    * idioms are proven equivalent on this data. (Boundary note: the
    * built-in merges on gap < 30min strictly, the lag form on <=; no
    * exact-30-minute gaps exist at any sf, checked.) Session bounds are
    * re-derived as min/max event time because session_window.end is
    * last_event + gap, not the last event itself.
    */
  private val sessionWindowBuiltin: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("total_value"))
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .orderBy("user_id", "session_start")

  private val multimodalFrames: Q = (s, dir) =>
    Multimodal.frameSample(Tables.documents(s, dir), nFrames = 4)
      .toDF().orderBy("doc_id", "frame_idx")

  /** Dedup clustering: exact near-dup pairs → connected components →
    * (doc, cluster, size). Oracled via DuckDB's WITH RECURSIVE
    * transitive closure over the identical pair set.
    */
  private val dedupClusters: Q = (s, dir) => {
    // hashed gram keys: same pair set as the string-keyed exact form
    // (the oracle's), narrower index shuffle — q23 keeps string keys as
    // the byte-exact reference
    val pairs = Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
      gramHash = Some(graft.functions.XxHash64Family))
    Dedup.connectedComponentsAuto(pairs, "doc_a", "doc_b").orderBy("doc_id")
  }

  /** The end product of the dedup family: the deduplicated corpus
    * itself — min-id survivor per near-dup cluster, with how many
    * duplicates each survivor absorbed. Oracled via the q57 recursive
    * transitive closure joined back to documents.
    */
  private val canonicalCorpusQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      gramHash = Some(graft.functions.XxHash64Family))
    Dedup.canonicalCorpus(docs, pairs, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
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

  /** Deterministic hash-bucket train/val/test split (Md5Family so the
    * bucket function is engine-portable and the oracle exact).
    */
  private val hashSplit: Q = (s, dir) =>
    Sampling.split(Tables.documents(s, dir), "doc_id", hashes = Md5Family)
      .select(col("doc_id"), col("bucket"), col("split"))
      .orderBy("doc_id")

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

  /** Token-budget shard packing over the hash order — oracled against
    * the global-window cumulative-sum rendering.
    */
  private val shardPack: Q = (s, dir) =>
    Packing.packByTokenBudget(Tables.documents(s, dir), "doc_id", "text",
      budgetTokens = 10000L)

  /** Unigram log-probability quality proxy. */
  private val unigramLp: Q = (s, dir) =>
    TextAnalysis.unigramLogProb(Tables.documents(s, dir), "doc_id", "text")

  /** Embedding-space canonical dedup: LSH near-neighbor pairs (q26's
    * params) → star-contraction clustering → min-id survivor per
    * cluster. The full embedding-dedup pipeline an LLM-data run ships,
    * end-to-end in one plan, oracled through the recursive-closure SQL
    * rendering.
    */
  private val embeddingDedup: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val pairs = Similarity.lshNeighborPairs(emb, threshold = 0.4)
    Dedup.canonicalCorpus(emb.select(col("vec_id"), col("label")), pairs,
      "vec_id", "id_a", "id_b")
      .select(col("vec_id"), col("label"), col("cluster_size"), col("removed_dups"))
      .orderBy("vec_id")
  }

  /** Ordered conversion funnel over the event stream: users who
    * viewed, then clicked at/after their first view, then purchased
    * at/after that click. Each step is a pushdown-filtered scan +
    * per-user min aggregate; steps join on user_id (one shuffle key
    * throughout) and only per-user step times cross stages.
    */
  private val funnel: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id")).filter(col("ts") >= col("t_view"))
      .groupBy("user_id").agg(min(col("ts")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id")).filter(col("ts") >= col("t_click"))
      .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_full_funnel")))
  }

  /** Point-in-interval range join done as a bucketed equi-join:
    * purchases attributed to the click-session interval containing
    * them. The naive `ts BETWEEN start AND end` join has no equi-key
    * and falls back to a nested loop — `RangeJoin.pointInInterval`
    * restores a hash shuffle (spec-asserted: no BNLJ/cartesian in the
    * plan).
    */
  private val intervalJoin: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    // 4h-gap sessions over the user's non-purchase activity; purchases
    // are then attributed to the activity interval containing them
    val sessions = Sessions
      .sessionize(ev.filter(col("event_type") =!= "purchase"), gapMinutes = 240)
      .select(col("user_id"), col("session_start"), col("session_end"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    RangeJoin.pointInInterval(purchases, sessions, Seq("user_id"),
      "ts", "session_start", "session_end")
      .select(col("event_id"), col("user_id"), col("ts"), col("session_start"))
      .orderBy("event_id")
  }

  /** Canonical text normalization (lowercase / strip punctuation /
    * collapse whitespace) — pure projection.
    */
  private val normalizeQ: Q = (s, dir) =>
    TextAnalysis.normalize(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_id")

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

  /** Mixture balancing with computed rates: cap every language at ~100
    * docs, keep smaller languages whole (q70 is the fixed-rate form).
    */
  private val capGroupsQ: Q = (s, dir) =>
    Sampling.capGroups(Tables.documents(s, dir), "doc_id", "lang",
      cap = 100L, hashes = Md5Family)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")

  /** Exact-k complement of q81: exactly min(100, |lang|) docs kept per
    * language, chosen by hash order.
    */
  private val capGroupsExactQ: Q = (s, dir) =>
    Sampling.capGroupsExact(Tables.documents(s, dir), "doc_id", "lang",
      cap = 100, hashes = Md5Family)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")

  /** q128: token-budget mixture trim — each lang keeps hash-priority
    * docs until 5000 cumulative tokens (UniMax-style: budgets are in
    * tokens, not documents).
    */
  private val capTokensQ: Q = (s, dir) =>
    Sampling.capGroupsByTokens(
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).as("n_tokens")),
      "doc_id", "lang", "n_tokens", budgetTokens = 5000L, hashes = Md5Family)
      .orderBy("doc_id")

  /** Int8 quantization of the embedding table (q66 is its profile). */
  private val quantizeQ: Q = (s, dir) =>
    Similarity.quantizeInt8(Tables.embeddings(s, dir))

  /** Join-key skew profile over events.user_id — the pre-salting
    * diagnostic.
    */
  private val skewProfile: Q = (s, dir) =>
    SkewJoin.keySkewProfile(Tables.events(s, dir), "user_id", topN = 10)

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

  /** Per-vector norm/quantization profile (storage planning for int8). */
  private val embeddingNorms: Q = (s, dir) =>
    Similarity.embeddingStats(Tables.embeddings(s, dir))

  /** Within-document shingle repetition (Gopher-style quality filter). */
  private val repetitionQ: Q = (s, dir) =>
    TextAnalysis.repetition(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Portable approximate distinct (linear counting over md5 buckets) —
    * the oracle-checkable sibling of q47's HLL.
    */
  private val linearCount: Q = (s, dir) =>
    Sketches.linearCountDistinct(Tables.events(s, dir), col("user_id"))

  /** Corpus rebalancing: downsample the dominant language (en keeps
    * 30%), keep the rest at 80% — per-group deterministic hash
    * sampling.
    */
  private val stratified: Q = (s, dir) =>
    Sampling.stratifiedSample(Tables.documents(s, dir), "doc_id", "lang",
        Map("en" -> 30), defaultPct = 80, hashes = Md5Family)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")

  /** Salted skew join, oracle-checked against the PLAIN inner join —
    * the salt is pure execution strategy, invisible in the result.
    */
  private val saltedJoin: Q = (s, dir) => {
    val orders = Tables.orders(s, dir)
    val customer = Tables.customer(s, dir)
      .withColumnRenamed("c_custkey", "o_custkey")
    SkewJoin.saltedInnerJoin(orders, customer, "o_custkey",
        idCol = "o_orderkey", numSalts = 7)
      .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** Cross-table composite: document metadata ⋈ embeddings (doc_id ==
    * vec_id in the testdata) → per-language embedding centroids — the
    * metadata-conditioned-centroid shape of real corpus analytics.
    */
  private val langCentroids: Q = (s, dir) =>
    Tables.documents(s, dir).select(col("doc_id"), col("lang"))
      .join(Tables.embeddings(s, dir), col("doc_id") === col("vec_id"))
      .select(col("lang"), posexplode(col("embedding").cast("array<double>"))
        .as(Seq("dim", "v")))
      .groupBy("lang", "dim")
      .agg(count(lit(1)).as("n_docs"), round(avg(col("v")), 6).as("centroid_v"))
      .orderBy("lang", "dim")

  /** Context-window chunking: 64-token windows every 48 tokens. */
  private val chunkQ: Q = (s, dir) =>
    Chunking.chunkByTokens(Tables.documents(s, dir), "doc_id", "text",
      chunkSize = 64, stride = 48)

  /** BPE-style regex pre-tokenization profile (fertility etc.). */
  private val regexTokensQ: Q = (s, dir) =>
    TextAnalysis.regexTokenProfile(Tables.documents(s, dir), "doc_id", "text")

  /** Morton z-value of (l_partkey, l_suppkey) — the sort key behind the
    * z-order layout (the layout write itself is spec'd in ZOrderSpec;
    * partition/file boundaries depend on range sampling, so only the
    * deterministic key computation is oracle-checked).
    */
  private val zorderQ: Q = (s, dir) =>
    Tables.lineitem(s, dir).select(
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
      ZOrder.interleave(col("l_partkey"), col("l_suppkey")).as("z"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Hopping (sliding) 60-minute windows every 15 minutes — each event
    * lands in size/slide = 4 windows; the built-in `window()` generator
    * handles the multi-assignment (and runs unchanged on a stream).
    */
  private val hoppingQ: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "60 minutes", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 6).as("total_value"))
      .select(col("w.start").as("window_start"), col("n_events"), col("total_value"))
      .orderBy("window_start")

  private val bigramLp: Q = (s, dir) =>
    TextAnalysis.bigramLogProb(Tables.documents(s, dir), "doc_id", "text")

  /** Histogram-sketch quantiles over lineitem prices — the mergeable
    * constant-memory alternative to the exact sort-based q42.
    */
  private val histQuantiles: Q = (s, dir) =>
    Sketches.histogramQuantiles(Tables.lineitem(s, dir), "l_extendedprice")

  /** Count-min heavy hitters over the document token stream. */
  private val countMin: Q = (s, dir) =>
    Sketches.countMinTopK(
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("token")),
      "token")

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

  /** Split-leakage report: near-duplicate pairs (MinHash-LSH, the q21
    * operator) that STRADDLE a train/test hash split — the
    * contamination a benchmark-honest pipeline must count before
    * training. 50/50 md5 split (an 80/20 split yields zero cross pairs
    * on the small fixtures; the rule matches q78's).
    */
  private val splitLeakage: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", hashes = Md5Family)
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
    val grams = Dedup.shingleIndex(docs, "doc_id", "text", k = 3, maxDf = 50,
      gramHash = Some(Md5Family))
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

  /** Aspect-preserving resize planning over the decoded stub dims. */
  private val resizePlanQ: Q = (s, dir) =>
    Multimodal.resizePlan(Tables.documents(s, dir)).toDF().orderBy("doc_id")

  /** JSONL rendering — the standard training-data interchange format:
    * one compact JSON object per row via `to_json(struct(...))`
    * (numeric/string fields only; engines agree on compact rendering).
    * Writing `.text` files of this column IS the JSONL export sink.
    */
  private val jsonlExport: Q = (s, dir) =>
    Tables.documents(s, dir).select(col("doc_id"),
      to_json(struct(col("doc_id"), col("lang"), col("source"), col("n_chars")))
        .as("jsonl"))
      .orderBy("doc_id")

  /** 5%-start, length-3 deterministic span corruption. */
  private val spanQ: Q = (s, dir) =>
    TextAnalysis.spanCorrupt(Tables.documents(s, dir), "doc_id", "text",
      hashes = Md5Family)

  /** 15% deterministic MLM masking over the documents table. */
  private val maskQ: Q = (s, dir) =>
    TextAnalysis.maskTokens(Tables.documents(s, dir), "doc_id", "text",
      hashes = Md5Family)

  /** Mixture-governance report for the temperature rebalance: per
    * language, corpus share before vs after — the number a data-mixing
    * review actually signs off on. Two tiny hash aggregates; fractions
    * divide exact integer counts so both engines agree bit-for-bit.
    */
  private val mixReport: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val kept = Sampling.temperatureSample(docs, "doc_id", "lang",
      targetFrac = 0.5, hashes = Md5Family)
    val before = docs.groupBy("lang").agg(count(lit(1)).as("n_before"))
    val after = kept.groupBy("lang").agg(count(lit(1)).as("n_after"))
    val joined = before.join(after, Seq("lang"), "left")
      .select(col("lang"), col("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
    val totals = joined.agg(sum(col("n_before")).as("_tb"),
      sum(col("n_after")).as("_ta"))
    joined.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_before"), col("n_after"),
        round(col("n_before") / col("_tb"), 6).as("frac_before"),
        round(col("n_after") / col("_ta"), 6).as("frac_after"))
      .orderBy("lang")
  }

  /** IVF routing (q40's coarse quantizer, nprobe=4/nlists=8) with PQ
    * ADC scoring (q99's codes) — the composed production ANN path.
    */
  private val annIvfPq: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfPqTopKSeeded(emb, emb.filter(col("vec_id") < 10), k = 3,
      dim = 64)
  }

  /** Per-language document-length quantiles off the mergeable
    * fixed-edge histogram (declared [0, 5000)×500 bins) — the grouped,
    * constant-memory alternative to exact percentiles.
    */
  private val groupedQuantilesQ: Q = (s, dir) =>
    Sketches.groupedHistogramQuantiles(Tables.documents(s, dir), "lang",
      "n_chars", lo = 0.0, hi = 5000.0, bins = 500)

  /** The composed data-mixing stage — what a training-data pipeline
    * actually ships: temperature-rebalance the corpus (q95's rule),
    * then lay the kept docs into a reproducible epoch-1 training
    * order (q97's rule). Operators compose as plain DataFrame
    * transforms; the corpus is touched by one broadcast-join filter
    * and one shard exchange end to end.
    */
  private val mixturePipeline: Q = (s, dir) => {
    val sampled = Sampling.temperatureSample(Tables.documents(s, dir),
      "doc_id", "lang", targetFrac = 0.5, hashes = Md5Family)
    Sampling.epochShuffle(sampled, "doc_id", epoch = 1, numShards = 8,
      hashes = Md5Family)
      .select(col("doc_id"), col("lang"), col("shard"), col("pos"))
      .orderBy("shard", "pos")
  }

  /** PQ-compressed ANN: same probe set as q24, distances via 8×16
    * hash-seeded sub-codebooks and exact-integer ADC sums.
    */
  private val annPq: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    Similarity.pqTopKSeeded(emb, emb.filter(col("vec_id") < 10), k = 5,
      dim = 64)
  }

  /** Model-based quality filter over stub weights: the weight table a
    * trained classifier would export is faked deterministically
    * (hash-derived, uniform in [-1, 1]) so both engines reproduce it —
    * the join/OOV/exact-sum/threshold plumbing is the real thing.
    */
  private val linearQualityQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val weights = docs
      .select(explode(split(col("text"), " ")).as("token")).distinct()
      .select(col("token"),
        ((Md5Family.hash(col("token")) % 2001L - 1000L).cast("double")
          / 1000.0).as("weight"))
    TextAnalysis.linearQualityScore(docs, "doc_id", "text", weights)
      .orderBy("doc_id")
  }

  /** Per-file footer-stats report for the z-order layout: each z-range
    * cell's (partkey, suppkey) bounding box plus the would-read flags
    * for one range predicate per axis — the file-skipping evidence.
    */
  private val zorderStatsQ: Q = (s, dir) =>
    ZOrder.pruningStats(Tables.lineitem(s, dir), "l_partkey", "l_suppkey",
      xLo = 100L, xHi = 300L, yLo = 10L, yHi = 20L)
      .orderBy("file")

  /** Epoch-1 deterministic training shuffle into 8 shards. */
  private val epochShuffleQ: Q = (s, dir) =>
    Sampling.epochShuffle(Tables.documents(s, dir), "doc_id", epoch = 1,
      numShards = 8, hashes = Md5Family)
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("shard", "pos")

  /** α=0.5 temperature rebalancing by language, half-corpus target. */
  private val temperatureQ: Q = (s, dir) =>
    Sampling.temperatureSample(Tables.documents(s, dir), "doc_id", "lang",
      targetFrac = 0.5, hashes = Md5Family)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")

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

  /** q107: dataset-versioning diff — two simulated snapshots of
    * `documents` (drops + edits derived deterministically from doc_id)
    * compared by md5 row digest; output is the change set only.
    */
  private val snapshotDiffQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val prev = docs.filter(col("doc_id") % 10 =!= 3)
    val next = docs.filter(col("doc_id") % 7 =!= 2)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
    SnapshotDiff.diff(prev, next, Seq("doc_id")).orderBy("doc_id")
  }

  /** q108: SCD2 merge — the customer dimension at version 1 merged
    * with an update batch touching every 7th key (acctbal shift);
    * changed keys close their v1 row and open a v2 row.
    */
  private val scd2Q: Q = (s, dir) => {
    val cust = Tables.customer(s, dir)
    val dim = cust
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .withColumn("version", lit(1))
      .withColumn("is_current", lit(true))
    val updates = cust.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"), col("c_mktsegment"),
        (col("c_acctbal") + 100.0).as("c_acctbal"))
    Scd2.merge(dim, updates, "c_custkey", Seq("c_mktsegment", "c_acctbal"))
      .orderBy("c_custkey", "version")
  }

  /** q109: cohort retention matrix over events. */
  private val retentionQ: Q = (s, dir) =>
    Retention.cohortMatrix(Tables.events(s, dir), "user_id", "ts")
      .orderBy("cohort_d", "offset_days")

  /** q110: trailing-7-day distinct active users per day. */
  private val rollingActiveQ: Q = (s, dir) =>
    Retention.rollingActiveUsers(Tables.events(s, dir), "user_id", "ts")
      .orderBy("target_d")

  /** q111: duplicated-span removal — tokens covered by any 8-token
    * window occurring in ≥2 distinct docs are cut (the exact-substring
    * dedup pass, at any offset). Md5Family for the DuckDB oracle.
    */
  private val dupSpanQ: Q = (s, dir) =>
    Dedup.dupSpanRemoval(Tables.documents(s, dir), "doc_id", "text",
      spanLen = 8, minDf = 2, hashes = Md5Family)
      .orderBy("doc_id")

  /** q112: one word-level BPE training round — corpus-wide adjacent
    * token-pair counts, top 50 merge candidates.
    */
  private val bpeQ: Q = (s, dir) =>
    TextAnalysis.bpeMergeCandidates(Tables.documents(s, dir), "text", k = 50)

  /** q113: CDC changelog compaction — base snapshot (seq 0) + updates
    * (seq 1, every 7th key) + deletes (seq 2, every 11th key) folded
    * to current state by one max_by hash aggregate.
    */
  private val cdcQ: Q = (s, dir) => {
    val cust = Tables.customer(s, dir)
    def slice(extra: DataFrame => DataFrame, seq: Long, op: String) =
      extra(cust)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .withColumn("seq", lit(seq)).withColumn("op", lit(op))
    val base = slice(identity, 0L, "I")
    val upd = slice(_.filter(col("c_custkey") % 7 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0), 1L, "U")
    val del = slice(_.filter(col("c_custkey") % 11 === 0), 2L, "D")
    Cdc.applyChangelog(base.unionByName(upd).unionByName(del),
      "c_custkey", "seq", "op", Seq("c_mktsegment", "c_acctbal"))
      .orderBy("c_custkey")
  }

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

  /** q115: SemDeDup — within-cluster cosine pruning over the
    * hash-seeded coarse codebook, min-id survivors. The learned-
    * codebook variant stays spec-verified via
    * `semanticDedupWithCodebook(kmeansCodebook(...))`.
    */
  private val semdedupQ: Q = (s, dir) =>
    Similarity.semanticDedup(Tables.embeddings(s, dir), threshold = 0.4, nlists = 8)
      .orderBy("vec_id")

  /** q116: trailing z-score anomaly flags — each event scored against
    * its user's previous-5-event mean/stddev (the gold-layer
    * volatility machinery turned into a detector). Window is
    * partitioned by user — no global sort; sample stddev is NULL on
    * short frames in both engines, and those rows are excluded.
    */
  private val anomalyQ: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-5, -1)
    Tables.events(s, dir)
      .withColumn("mu", avg(col("value")).over(w))
      .withColumn("sd", stddev(col("value")).over(w))
      .filter(col("sd").isNotNull && col("sd") > 0)
      .select(col("event_id"), col("user_id"), col("value"),
        round((col("value") - col("mu")) / col("sd"), 6).as("z"),
        (abs(round((col("value") - col("mu")) / col("sd"), 6)) > 3)
          .as("is_anomaly"))
      .orderBy("event_id")
  }

  /** q117: data-quality expectations — four named constraints over
    * lineitem folded in one aggregate scan (one has real violations,
    * so pass AND fail paths are exercised).
    */
  private val expectationsQ: Q = (s, dir) =>
    Expectations.validate(Tables.lineitem(s, dir), Seq(
      "qty_positive" -> (col("l_quantity") > 0),
      "price_nonneg" -> (col("l_extendedprice") >= 0),
      "discount_le_5pct" -> (col("l_discount") <= 0.05),
      "shipdate_in_range" -> col("l_shipdate").between(
        lit("1992-01-01").cast("date"), lit("1998-12-31").cast("date"))))

  /** q118: referential-integrity count — lineitem rows orphaned by a
    * parent snapshot missing every 5th order key.
    */
  private val refIntegrityQ: Q = (s, dir) =>
    Expectations.referentialViolations(
      Tables.lineitem(s, dir),
      Tables.orders(s, dir).filter(col("o_orderkey") % 5 =!= 0),
      "l_orderkey", "o_orderkey")

  /** q119: winsorization — event values clamped to the [p05, p95]
    * band estimated from the mergeable fixed-bin histogram (q88's
    * machinery reused as thresholds; clamp is map-side).
    */
  private val winsorizeQ: Q = (s, dir) =>
    Sketches.winsorize(Tables.events(s, dir), "event_id", "value")
      .orderBy("event_id")

  /** q120: per-source dedup governance report — doc counts, canonical
    * survivors, removed duplicates, and retention share per source
    * (the q59 canonical corpus re-aggregated by provenance).
    */
  private val sourceDedupReportQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      gramHash = Some(graft.functions.XxHash64Family))
    val canon = Dedup.canonicalCorpus(docs, pairs, "doc_id")
    docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(canon.groupBy("source")
        .agg(count(lit(1)).as("n_survivors"),
          sum(col("removed_dups")).as("n_removed")), Seq("source"))
      .select(col("source"), col("n_docs"), col("n_survivors"), col("n_removed"),
        round(col("n_survivors").cast("double") / col("n_docs"), 6).as("retention"))
      .orderBy("source")
  }

  /** q121: the documents → training-sequences layout path, composed
    * end-to-end: context-window chunking (q83's 64/48 windows) feeding
    * token-budget shard packing (q72's distributed prefix sum) keyed
    * by a per-chunk id. Plain DataFrame composition — no new
    * machinery, which is the point.
    */
  private val chunkPackQ: Q = (s, dir) => {
    val chunks = Chunking.chunkByTokens(Tables.documents(s, dir), "doc_id", "text",
      chunkSize = 64, stride = 48)
      .select(concat(col("doc_id").cast("string"), lit(":"),
        col("chunk_id").cast("string")).as("chunk_key"),
        col("chunk_text"))
    Packing.packByTokenBudget(chunks, "chunk_key", "chunk_text",
      budgetTokens = 2000L)
      .orderBy("chunk_key")
  }

  /** q122: per-label embedding diversity via the linear-time
    * E||x−y||² identity (no pairwise join).
    */
  private val diversityQ: Q = (s, dir) =>
    Similarity.labelDiversity(Tables.embeddings(s, dir))

  /** q123: label-centroid cosine affinity matrix (mixture-design
    * redundancy report).
    */
  private val affinityQ: Q = (s, dir) =>
    Similarity.centroidAffinity(Tables.embeddings(s, dir))

  /** q124: deterministic negative sampling — 4 hash-drawn negatives
    * per anchor over the dense vec_id space, labels attached via one
    * equi-join.
    */
  private val negSamplesQ: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    Sampling.negativeSamples(emb.select(col("vec_id")), "vec_id", k = 4)
      .join(emb.select(col("vec_id").as("neg_id"), col("label").as("neg_label")),
        Seq("neg_id"))
      .select(col("anchor_id"), col("sample_idx"), col("neg_id"), col("neg_label"))
      .orderBy("anchor_id", "sample_idx")
  }

  /** q125: SemDeDup with the AUTO cluster count — nlists = ⌈√N⌉
    * derived from the corpus (the k-vs-N rule; a fixed nlists is
    * quadratic in the corpus). Same threshold and codebook rule as
    * q115, so the two differ only in cluster granularity.
    */
  private val semdedupAutoQ: Q = (s, dir) =>
    Similarity.semanticDedup(Tables.embeddings(s, dir), threshold = 0.4)
      .orderBy("vec_id")

  /** q126: IVF+PQ with exact re-ranking — q102's shortlist widened to
    * k·candMult, re-scored with exact cosines from the raw vectors,
    * re-cut to k.
    */
  private val annIvfPqRerank: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfPqTopKReranked(emb, emb.filter(col("vec_id") < 10), k = 3,
      dim = 64)
  }

  /** q127: C4-style corpus cleaning — the composed keep/drop report
    * (length, stopword density, type-token ratio, fixed precedence).
    */
  private val cleanCorpusQ: Q = (s, dir) =>
    TextAnalysis.cleanCorpus(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** q129: registered ANN accuracy report — recall@k of the compressed
    * IVF+PQ tier (q102's path) and its exact-reranked tier (q126's)
    * against the brute-force exact top-k, so the accuracy claim is
    * hash-verified cross-engine like the speed paths themselves.
    * Counts are exact integers; the one division happens last.
    */
  private val annRecallQ: Q = (s, dir) => {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val probes = emb.filter(col("vec_id") < 10)
    val k = 3
    val exact = Similarity.bruteForceTopK(emb, probes, k)
      .select("query_id", "neighbor_id").localCheckpoint()
    val approx =
      Similarity.ivfPqTopKSeeded(emb, probes, k, dim = 64)
        .select(col("query_id"), col("neighbor_id"),
          lit("ivfpq_adc").as("method"))
        .union(Similarity.ivfPqTopKReranked(emb, probes, k, dim = 64)
          .select(col("query_id"), col("neighbor_id"),
            lit("ivfpq_rerank").as("method")))
    val hits = approx.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy("method").agg(count(lit(1)).as("hits"))
    val total = exact.agg(count(lit(1)).as("total"))
    Seq("ivfpq_adc", "ivfpq_rerank").toDF("method")
      .join(hits, Seq("method"), "left")
      .crossJoin(broadcast(total))
      .select(col("method"), coalesce(col("hits"), lit(0L)).as("hits"),
        col("total"),
        round(coalesce(col("hits"), lit(0L)) / col("total"), 6).as("recall"))
      .orderBy("method")
  }

  /** q159: recall certification for the LEARNED ANN tier — the
    * production (Lloyd-trained) PQ and IVF+PQ codebooks against the
    * hash-seeded ones q99/q102 oracle directly. Training is driver-side
    * k-means (not SQL-expressible), so the oracle replays the SEEDED
    * tier (q99's CTE chain at probes<50, k=5) and pins the exact
    * integer seeded hit count; the learned tiers' hit counts enter as
    * the hash-checked BOOLEANS learned >= seeded per tier — if Lloyd
    * training ever degrades recall below the raw seeded init, the
    * booleans flip and the gate goes red. (Margins at the gate's
    * sf0.01: learned 67 vs seeded 31 PQ hits of 250 — far from the
    * flip point.)
    */
  private val annRecallLearnedQ: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val probes = emb.filter(col("vec_id") < 50)
    val k = 5
    val exact = Similarity.bruteForceTopK(emb, probes, k)
      .select("query_id", "neighbor_id").localCheckpoint()
    def hits(df: DataFrame, as: String): DataFrame =
      df.select("query_id", "neighbor_id")
        .join(exact, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as(as))
    val pqS = hits(Similarity.pqTopKSeeded(emb, probes, k, dim = 64), "seeded_hits")
    val pqL = hits(Similarity.pqTopKLearned(emb, probes, k, dim = 64), "pq_learned")
    val ivS = hits(Similarity.ivfPqTopKSeeded(emb, probes, k, dim = 64), "ivf_seeded")
    val ivL = hits(Similarity.ivfPqTopKLearned(emb, probes, k, dim = 64), "ivf_learned")
    exact.agg(count(lit(1)).as("total"))
      .crossJoin(broadcast(pqS)).crossJoin(broadcast(pqL))
      .crossJoin(broadcast(ivS)).crossJoin(broadcast(ivL))
      .select(col("total"), col("seeded_hits"),
        round(col("seeded_hits") / col("total"), 6).as("seeded_recall"),
        (col("pq_learned") >= col("seeded_hits")).as("pq_learned_ge_seeded"),
        (col("ivf_learned") >= col("ivf_seeded")).as("ivfpq_learned_ge_seeded"))
  }

  /** q160: the OPQ win, hash-verified end-to-end — a DETERMINISTIC
    * correlated corpus (rank-4 linear mix of each embedding's first 4
    * coordinates under fixed integer loadings + 1% self-noise, the
    * regime OPQ exists for, derivable in SQL) is quantization-scored
    * under three codebook tiers: hash-seeded (oracle replays the q99
    * chain and pins the exact integer ppm error), Lloyd-learned, and
    * OPQ (balanced-PCA rotation then learned). The corpus fingerprint
    * (bit_xor of md5-hashed fixed-point coordinates) proves both
    * engines scored the SAME corpus; the learned/OPQ tiers (driver
    * training, not SQL-expressible) enter as hash-checked booleans —
    * learned ≤ seeded and opq < learned/2, measured at 0.66× and
    * 0.05–0.08× respectively, so a training regression flips the gate
    * red long before the win is gone.
    */
  private val opqGainQ: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val v = col("embedding").cast("array<double>")
    def loading(f: Int, d: Int): Double = ((d * (f + 3) + f) % 7 - 3).toDouble
    val w = array((0 until 64).map { d =>
      (0 until 4).map(f => v.getItem(f) * lit(loading(f, d))).reduce(_ + _) +
        lit(0.01) * v.getItem(d)
    }: _*)
    val corr = emb.select(col("vec_id"), w.as("embedding")).localCheckpoint()
    val fp = corr
      .select(col("vec_id"),
        posexplode(Pca.quantize(col("embedding"))).as(Seq("dim", "q")))
      .select(graft.functions.Md5Family.hash(concat(
        col("vec_id").cast("string"), lit(":"),
        col("dim").cast("string"), lit(":"),
        col("q").cast("string"))).as("h"))
      .agg(expr("bit_xor(h)").as("corpus_fp"))
    val se = Similarity.pqQuantErrorSeeded(corr, dim = 64)
      .select(col("err_ppm").as("seeded_err_ppm"))
    val le = Similarity.pqQuantErrorLearned(corr, dim = 64)
      .select(col("err_ppm").as("learned_err"))
    val oe = Similarity.pqQuantErrorOpq(corr, dim = 64)
      .select(col("err_ppm").as("opq_err"))
    corr.agg(count(lit(1)).as("n_vecs"))
      .crossJoin(broadcast(fp)).crossJoin(broadcast(se))
      .crossJoin(broadcast(le)).crossJoin(broadcast(oe))
      .select(col("n_vecs"), col("corpus_fp"), col("seeded_err_ppm"),
        (col("learned_err") <= col("seeded_err_ppm")).as("learned_le_seeded"),
        (col("opq_err") * 2 < col("learned_err")).as("opq_halves_learned"))
  }

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
    val pairs = Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id",
      "text", gramHash = Some(graft.functions.XxHash64Family))
      .localCheckpoint()
    val oldPairs = pairs.filter(col("doc_a") % 2 === 0 && col("doc_b") % 2 === 0)
    val newPairs = pairs.filter(col("doc_a") % 2 =!= 0 || col("doc_b") % 2 =!= 0)
    val labels = Dedup.connectedComponentsAuto(oldPairs, "doc_a", "doc_b")
      .select("doc_id", "cluster_id")
    Dedup.assignToExistingClusters(labels, newPairs, "doc_a", "doc_b")
      .orderBy("doc_id")
  }

  /** q131: the PERSISTED ANN index end-to-end — build the stored
    * index at a scratch path, then answer through its on-disk tables
    * (partition-pruned enc scan, manifest-gated batches). Same seeded
    * codebooks and routing as q102, whose oracle it shares verbatim:
    * a hash match certifies the store/encode/prune/read path itself.
    */
  private val annIndexQ: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val scratch = java.nio.file.Files.createTempDirectory("graft_q131_idx")
    val idx = scratch.toString + "/idx"
    AnnIndex.build(emb, idx, dim = 64)
    // materialize BEFORE deleting the scratch index (the frame is
    // lazy), so repeated bench/verify invocations don't accrete
    // sf-scale index copies under /tmp
    val out = AnnIndex.query(s, idx, emb.filter(col("vec_id") < 10),
      k = 3, dim = 64).localCheckpoint()
    deleteRecursively(s, scratch.toString)
    out
  }

  private def deleteRecursively(s: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** q132: the training-data pipeline FUNNEL, end-to-end per source —
    * raw docs → C4-style clean (q127's operator) → exact dedup among
    * the keepers (q20's operator, keyed on md5(text) so the dedup
    * shuffle moves 32-char digests, not document bodies) → canonical
    * token totals → mixture share. One registered DAG composing the
    * real operators, not re-implementations: the hash match certifies
    * that the STAGES compose, which is what a pipeline user actually
    * runs. Counts stay exact integers; the single share division is
    * last. Scale: two doc-partitioned projections, one digest-keyed
    * dedup shuffle, a 20-group aggregate, and a broadcast 1-row total.
    */
  private val pipelineFunnelQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val clean = TextAnalysis.cleanCorpus(docs, "doc_id", "text")
    // kept feeds BOTH sides of the dedup self-join below — checkpoint
    // it once (project invariant) instead of cleaning the corpus twice
    val kept = docs.select("doc_id", "source", "text").join(
      clean.filter(col("keep") === 1).select("doc_id", "n_tokens"), Seq("doc_id"))
      .localCheckpoint()
    val canonIds = Dedup.exactDedup(
      kept.withColumn("text_key", md5(col("text"))), "text_key", "doc_id")
      .select("doc_id")
    val canonDocs = kept.join(canonIds, Seq("doc_id"))
    val base = docs.groupBy("source").agg(count(lit(1)).as("docs_in"))
    val keptAgg = kept.groupBy("source").agg(count(lit(1)).as("docs_kept"))
    val canonAgg = canonDocs.groupBy("source").agg(
      count(lit(1)).as("docs_canonical"),
      sum(col("n_tokens").cast("long")).as("tokens_canonical"))
    val total = canonDocs.agg(
      sum(col("n_tokens").cast("long")).as("total_tokens"))
    base.join(keptAgg, Seq("source"), "left")
      .join(canonAgg, Seq("source"), "left")
      .crossJoin(broadcast(total))
      .select(col("source"), col("docs_in"),
        coalesce(col("docs_kept"), lit(0L)).as("docs_kept"),
        coalesce(col("docs_canonical"), lit(0L)).as("docs_canonical"),
        coalesce(col("tokens_canonical"), lit(0L)).as("tokens_canonical"),
        round(coalesce(col("tokens_canonical"), lit(0L)).cast("double")
          / col("total_tokens"), 6).as("token_share"))
      .orderBy("source")
  }

  /** q133: the batch STORE end-to-end — documents flow into an
    * `IdempotentSink` table in three key-overlapping appends (each
    * re-delivers a slice of the previous batch, as a retrying loader
    * would), the generations are compacted, and the table is read
    * back through the healed reader into a per-source summary. The
    * oracle is a plain aggregate over `documents`: a hash match
    * certifies the stage/commit/key-dedup/compact/read path preserved
    * exactly one copy of every row — the store's whole contract.
    */
  private val sinkRoundtripQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
      .select("doc_id", "source", "text").localCheckpoint()
    val scratch = java.nio.file.Files.createTempDirectory("graft_q133_sink")
    val store = scratch.toString + "/t"
    // three appends with overlapping key ranges: [0,45%), [40%,75%),
    // [70%,100%) of the id space — every boundary slice re-delivers
    val ids = docs.agg(min("doc_id"), max("doc_id")).head()
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val span = math.max(1L, hi - lo + 1)
    def slice(a: Double, b: Double) = docs.filter(
      col("doc_id") >= lo + (span * a).toLong &&
        col("doc_id") < lo + (span * b).toLong + (if (b >= 1.0) 1 else 0))
    IdempotentSink.appendIfAbsent(s, slice(0.0, 0.45), store, Seq("doc_id"))
    IdempotentSink.appendIfAbsent(s, slice(0.40, 0.75), store, Seq("doc_id"))
    IdempotentSink.appendIfAbsent(s, slice(0.70, 1.0), store, Seq("doc_id"))
    IdempotentSink.compact(s, store)
    // materialize the 20-row summary, then drop the scratch store
    // (same hygiene as q131)
    val out = IdempotentSink.read(s, store)
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(length(col("text")).cast("long")).as("chars"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("source")
      .localCheckpoint()
    deleteRecursively(s, scratch.toString)
    out
  }

  /** q134: quality-weighted mixture draw — Efraimidis–Spirakis
    * weighted sampling without replacement, 3 docs per source with
    * inclusion probability ∝ n_chars. The u draws are Md5Family-
    * deterministic, so DuckDB reproduces the "random" sample
    * bit-for-bit: the hash match certifies the weighting math, not
    * just the plumbing. Output carries only integers (rank + row
    * columns) — the continuous float key never leaves the plan, so
    * there is no cross-engine float-rounding surface at all.
    */
  private val weightedSampleQ: Q = (s, dir) =>
    Sampling.weightedSample(
      Tables.documents(s, dir).select("doc_id", "source", "n_chars"),
      "doc_id", "n_chars", k = 3, groupCol = "source")
      .select(col("source"), col("rank"), col("doc_id"), col("n_chars"))
      .orderBy("source", "rank")

  /** q135: bucketed co-located join — orders ⋈ customer on the
    * customer key with BOTH sides pre-bucketed, so the join itself
    * plans zero ShuffleExchange (BucketingSpec asserts the plan
    * shape; this query hash-verifies that the exchange-free layout
    * computes the same answer as the oracle's plain join). The
    * layout write is part of the query on purpose: at scale it is
    * the one-off cost a pipeline amortizes across every downstream
    * join, same as q85's z-order range shuffle.
    */
  private val bucketedJoinQ: Q = (s, dir) => {
    val scratch = java.nio.file.Files.createTempDirectory("graft_q135_bkt")
    val tag = math.abs(scratch.toString.hashCode).toString
    val (ot, ct) = (s"graft_bkt_orders_$tag", s"graft_bkt_customer_$tag")
    Bucketing.writeBucketed(s,
      Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
      ot, scratch.toString + "/orders", 8, Seq("o_custkey"))
    Bucketing.writeBucketed(s,
      Tables.customer(s, dir).select("c_custkey", "c_mktsegment"),
      ct, scratch.toString + "/customer", 8, Seq("c_custkey"))
    val out = Bucketing.colocatedJoin(s, ot, ct, "o_custkey", "c_custkey")
      .groupBy("c_mktsegment")
      // revenue in exact integer cents: double sums over a shuffled
      // join visit rows in engine-dependent order (CLAUDE.md: exact
      // integer accumulation for order-varying cross-engine sums)
      .agg(count(lit(1)).as("orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("revenue_cents"))
      .orderBy("c_mktsegment")
      .localCheckpoint()
    Bucketing.dropTables(s, ot, ct)
    deleteRecursively(s, scratch.toString)
    out
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

  /** q142: the FIX for the leakage q91 measures — split assignment by
    * near-dup cluster (q57's edge set and CC), so cross-split near-dup
    * pairs are zero by construction. Singletons degrade to the plain
    * per-doc hash split.
    */
  private val clusterSplitQ: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      gramHash = Some(graft.functions.XxHash64Family))
    Sampling.clusterAwareSplit(docs, "doc_id", pairs, "doc_a", "doc_b",
        hashes = Md5Family)
      .select(col("doc_id"), col("cluster_id"), col("split"))
      .orderBy("doc_id")
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

  /** q145: regular-grid hourly resample of the event stream per user —
    * every hour from each user's first to last event, bucket mean,
    * forward-fill with staleness, and linear interpolation across gaps
    * (`Resample.resample`). The cadence-repair pass a 1-row-per-minute
    * feed needs before window features are trustworthy.
    */
  private val resampleQ: Q = (s, dir) =>
    Resample.resample(
      Tables.events(s, dir).filter(col("user_id") % 10 === 0),
      "user_id", "ts", "value", stepSeconds = 3600L)

  /** q146: per-user cadence/gap report from observed buckets alone —
    * expected vs present hourly buckets and the longest missing run
    * (`Resample.gapReport`; no grid materialized).
    */
  private val gapReportQ: Q = (s, dir) =>
    Resample.gapReport(Tables.events(s, dir), "user_id", "ts",
      stepSeconds = 3600L)

  /** q147: kNN label-noise detection (Wilson editing) — each probe's 5
    * nearest corpus neighbors by exact cosine vote on its label;
    * disagreement flags probable mislabels (`Similarity.knnLabelNoise`).
    */
  private val knnLabelNoiseQ: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    Similarity.knnLabelNoise(emb, emb.filter(col("vec_id") % 20 === 0), k = 5)
  }

  /** q148: embedding covariance matrix (upper triangle) from ONE
    * distributed moment pass (`Pca.covariance` / `GramAggregator`) —
    * the oracle-checkable face of the distributed-PCA split whose
    * eigendecomposition/projection half is spec-verified (`PcaSpec`).
    */
  private val embeddingCovQ: Q = (s, dir) =>
    Pca.covariance(Tables.embeddings(s, dir), "embedding", dim = 64)

  /** q149: per-dimension drift between two embedding snapshots (even
    * vs odd vec_id as stand-in cohorts) — mean/variance per side and
    * the absolute mean shift (`Pca.dimDrift`), the encoder-change /
    * normalization-regression monitor for an embedding pipeline.
    */
  private val dimDriftQ: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    Pca.dimDrift(emb.filter(col("vec_id") % 2 === 0),
      emb.filter(col("vec_id") % 2 =!= 0))
  }

  /** q150: per-language score calibration of document lengths —
    * z-score against the group's own moments + in-group percentile
    * rank (`Sampling.scoreCalibration`): the step that makes a global
    * quality threshold language-fair.
    */
  private val scoreCalibrationQ: Q = (s, dir) =>
    Sampling.scoreCalibration(Tables.documents(s, dir),
      "doc_id", "lang", "n_chars")

  /** q151: streaming cadence store — the event stream's distinct
    * (user, hourly-bucket) grid points folded across three
    * micro-batch appends plus a compaction, then read out as the gap
    * report. Same oracle as q146: the persisted-store path must be
    * indistinguishable from the one-shot batch computation.
    */
  private val cadenceStoreQ: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val scratch = java.nio.file.Files.createTempDirectory("graft_q151_cad")
    val store = scratch.toString + "/cadence"
    (0L until 3L).foreach { b =>
      graft.streaming.StreamingPower.cadenceStep(
        ev.filter(col("event_id") % 3 === b), "user_id", "ts",
        stepSeconds = 3600L, store, batchId = b)
    }
    graft.engine.BatchStore.compact(s, store,
      graft.streaming.StreamingPower.cadenceMerge)
    val out = graft.streaming.StreamingPower
      .cadenceReport(s, store, "user_id", stepSeconds = 3600L)
      .localCheckpoint()
    deleteRecursively(s, scratch.toString)
    out
  }

  /** q152: streaming embedding-moment store — per-dim (n, Σx, Σx²)
    * folded across three micro-batch appends plus a compaction, read
    * out as per-dim mean/variance. The incremental face of q148/q149:
    * drift monitoring over an unbounded stream, constant-size state.
    */
  private val momentStoreQ: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val scratch = java.nio.file.Files.createTempDirectory("graft_q152_mom")
    val store = scratch.toString + "/moments"
    (0L until 3L).foreach { b =>
      graft.streaming.StreamingPower.momentStep(
        emb.filter(col("vec_id") % 3 === b), "embedding", store, batchId = b)
    }
    graft.engine.BatchStore.compact(s, store,
      graft.streaming.StreamingPower.momentMerge)
    val out = graft.streaming.StreamingPower.momentReport(s, store)
      .localCheckpoint()
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

  /** q154: robust per-language calibration — median/MAD z-scores and
    * deterministic decile bins (`Sampling.robustCalibration`), the
    * outlier-proof sibling of q150 plus the curriculum-binning
    * primitive.
    */
  private val robustCalibrationQ: Q = (s, dir) =>
    Sampling.robustCalibration(Tables.documents(s, dir),
      "doc_id", "lang", "n_chars")

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

  /** q156: per-event session features — session index, in-session
    * position, integer seconds since previous event and since session
    * start (`Sessions.sessionFeatures`): the behavioral-model feature
    * projection over the q34 sessionization.
    */
  private val sessionFeaturesQ: Q = (s, dir) =>
    Sessions.sessionFeatures(Tables.events(s, dir), gapMinutes = 30)

  /** q157: gap-robust anomaly detection — rolling z-score over the
    * RESAMPLED (gap-filled) grid, so a burst after a quiet stretch is
    * judged against true elapsed time, not against however many rows
    * happened to exist (the q116-style raw-row window silently spans
    * gaps). Composes q145's grid with one more partitioned window;
    * the flag compares ROUNDED z so the cut is cross-engine exact.
    */
  private val gridAnomalyQ: Q = (s, dir) => {
    val grid = Resample.resample(
      Tables.events(s, dir).filter(col("user_id") % 10 === 0),
      "user_id", "ts", "value", stepSeconds = 3600L)
    val w = Window.partitionBy("user_id").orderBy("bucket_sec")
      .rowsBetween(-23, 0)
    grid
      .withColumn("_m", avg(col("interp_value")).over(w))
      .withColumn("_sd", stddev(col("interp_value")).over(w))
      .withColumn("z", round(
        when(col("_sd") > 0, (col("interp_value") - col("_m")) / col("_sd")), 6))
      .filter(abs(col("z")) > 2.5)
      .select(col("user_id"), col("bucket_sec"), col("interp_value"), col("z"))
      .orderBy("user_id", "bucket_sec")
  }

  /** q158: signature vocabulary per source — exact top-5 terms with
    * share of the source's token volume
    * (`TextAnalysis.topTermsByGroup`), the companion readout to
    * q153's overlap matrix.
    */
  private val sourceTopTermsQ: Q = (s, dir) =>
    TextAnalysis.topTermsByGroup(Tables.documents(s, dir), "source", "text",
      k = 5)

  val queries: Map[String, Q] = Map(
    "q162_image_decode" -> imageDecodeQ,
    "q161_text_index_build" -> textIndexBuildQ,
    "q160_opq_gain" -> opqGainQ,
    "q159_ann_recall_learned" -> annRecallLearnedQ,
    "q158_source_top_terms" -> sourceTopTermsQ,
    "q157_grid_anomaly" -> gridAnomalyQ,
    "q156_session_features" -> sessionFeaturesQ,
    "q155_bloom_semi_join" -> bloomSemiJoinQ,
    "q154_robust_calibration" -> robustCalibrationQ,
    "q153_vocab_overlap" -> vocabOverlapQ,
    "q152_moment_store" -> momentStoreQ,
    "q151_cadence_store" -> cadenceStoreQ,
    "q150_score_calibration" -> scoreCalibrationQ,
    "q149_dim_drift" -> dimDriftQ,
    "q148_embedding_cov" -> embeddingCovQ,
    "q147_knn_label_noise" -> knnLabelNoiseQ,
    "q146_gap_report" -> gapReportQ,
    "q145_resample" -> resampleQ,
    "q144_phrase_search" -> phraseSearchQ,
    "q143_heavy_hitters" -> heavyHittersQ,
    "q142_cluster_split" -> clusterSplitQ,
    "q141_hybrid_rrf" -> hybridRrfQ,
    "q140_text_index" -> textIndexQ,
    "q139_bm25" -> bm25Q,
    "q138_fuzzy_join" -> fuzzyJoinQ,
    "q137_cdc_pairs" -> cdcPairsQ,
    "q136_cdc_chunks" -> cdcChunksQ,
    "q135_bucketed_join" -> bucketedJoinQ,
    "q134_weighted_sample" -> weightedSampleQ,
    "q133_sink_roundtrip" -> sinkRoundtripQ,
    "q132_pipeline_funnel" -> pipelineFunnelQ,
    "q131_ann_index" -> annIndexQ,
    "q130_incremental_canon" -> incrementalCanonQ,
    "q129_ann_recall" -> annRecallQ,
    "q128_cap_groups_tokens" -> capTokensQ,
    "q127_clean_corpus" -> cleanCorpusQ,
    "q126_ann_ivfpq_rerank" -> annIvfPqRerank,
    "q125_semdedup_auto" -> semdedupAutoQ,
    "q124_negative_samples" -> negSamplesQ,
    "q123_centroid_affinity" -> affinityQ,
    "q122_embedding_diversity" -> diversityQ,
    "q121_chunk_pack" -> chunkPackQ,
    "q120_source_dedup_report" -> sourceDedupReportQ,
    "q119_winsorize" -> winsorizeQ,
    "q118_ref_integrity" -> refIntegrityQ,
    "q117_expectations" -> expectationsQ,
    "q116_anomaly_flags" -> anomalyQ,
    "q115_semdedup" -> semdedupQ,
    "q114_corpus_stats" -> corpusStatsQ,
    "q113_cdc_apply" -> cdcQ,
    "q112_bpe_merges" -> bpeQ,
    "q111_dup_span_removal" -> dupSpanQ,
    "q110_rolling_active" -> rollingActiveQ,
    "q109_retention" -> retentionQ,
    "q108_scd2_merge" -> scd2Q,
    "q107_snapshot_diff" -> snapshotDiffQ,
    "q106_segment_dedup" -> segmentDedupQ,
    "q105_span_corrupt" -> spanQ,
    "q104_mask_tokens" -> maskQ,
    "q103_mix_report" -> mixReport,
    "q102_ann_ivf_pq" -> annIvfPq,
    "q101_grouped_quantiles" -> groupedQuantilesQ,
    "q100_mixture_pipeline" -> mixturePipeline,
    "q99_ann_pq" -> annPq,
    "q98_linear_quality" -> linearQualityQ,
    "q96_zorder_stats" -> zorderStatsQ,
    "q97_epoch_shuffle" -> epochShuffleQ,
    "q95_temperature_sample" -> temperatureQ,
    "q94_jsonl_export" -> jsonlExport,
    "q93_multimodal_resize" -> resizePlanQ,
    "q91_split_leakage" -> splitLeakage,
    "q92_source_overlap" -> sourceOverlap,
    "q90_scrub" -> scrubQ,
    "q88_histogram_quantiles" -> histQuantiles,
    "q89_count_min" -> countMin,
    "q83_chunk" -> chunkQ,
    "q84_regex_tokens" -> regexTokensQ,
    "q85_zorder" -> zorderQ,
    "q86_hopping_window" -> hoppingQ,
    "q87_bigram_logprob" -> bigramLp,
    "q59_canonical_corpus" -> canonicalCorpusQ,
    "q71_decontaminate_bloom" -> decontaminateBloom,
    "q72_shard_pack" -> shardPack,
    "q73_unigram_logprob" -> unigramLp,
    "q74_embedding_dedup" -> embeddingDedup,
    "q75_funnel" -> funnel,
    "q76_interval_join" -> intervalJoin,
    "q77_normalize" -> normalizeQ,
    "q78_incremental_dedup" -> incrementalDedup,
    "q79_skew_profile" -> skewProfile,
    "q80_quantize_int8" -> quantizeQ,
    "q81_cap_groups" -> capGroupsQ,
    "q82_cap_groups_exact" -> capGroupsExactQ,
    "q62_ngram_jaccard_capped" -> ngramJaccardCapped,
    "q63_hash_split" -> hashSplit,
    "q64_decontaminate" -> decontaminate,
    "q65_token_histogram" -> tokenHistogram,
    "q66_embedding_norms" -> embeddingNorms,
    "q67_repetition" -> repetitionQ,
    "q68_linear_count_distinct" -> linearCount,
    "q69_salted_join" -> saltedJoin,
    "q70_stratified_sample" -> stratified,
    "q58_lang_centroids" -> langCentroids,
    "q57_dedup_clusters" -> dedupClusters,
    "q52_multimodal_frames" -> multimodalFrames,
    "q51_session_window_builtin" -> sessionWindowBuiltin,
    "q46_tfidf_top_terms" -> tfidf,
    "q43_pivot" -> pivotQ,
    "q44_rank_windows" -> rankWindows,
    "q41_asof_attribution" -> asofAttribution,
    "q42_percentiles" -> percentiles,
    "q37_vocab" -> vocab,
    "q38_from_json" -> fromJson,
    "q40_ann_ivf" -> annIvf,
    "q20_dedup_exact" -> dedupExact,
    "q21_minhash_lsh" -> minhashLsh,
    "q22_simhash_pairs" -> simhashPairs,
    "q23_ngram_jaccard" -> ngramJaccard,
    "q24_ann_topk" -> annTopK,
    "q26_ann_lsh" -> annLsh,
    "q27_centroids" -> centroids,
    "q28_text_stats" -> textStats,
    "q29_token_counts" -> tokenCounts,
    "q30_quality_score" -> quality,
    "q31_langid" -> langId,
    "q32_fingerprint" -> fingerprint,
    "q33_json_extract" -> jsonExtract,
    "q34_sessionize" -> sessionizeQ,
    "q35_tumbling_hourly" -> tumbling,
    "q36_multimodal_decode" -> multimodal)

  /** DuckDB rendering of `Md5Family.hash` — must stay in lockstep with
    * graft.functions.Md5Family (top 15 hex chars of md5 as a bigint).
    */
  private def md5l(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 15)) AS BIGINT)"

  /** q26's oracle inlines the SAME seeded hyperplanes the Spark plan
    * uses (`Similarity.hyperplanes` is deterministic on (dim, n, seed))
    * as literal DOUBLE[] rows, so the sign-LSH bucket routing is
    * reproduced exactly in DuckDB via list_dot_product (sign(cosine) ==
    * sign(dot): norms are positive).
    */
  /** Shared CTE block rendering the sign-LSH candidate generation
    * (planes → signatures → bucket-collision candidates) — used by the
    * q26 oracle and, composed with a recursive closure, by q74's.
    */
  private def lshCandCtes: String = {
    val bits = 6; val tables = 8
    val planes = Similarity.hyperplanes(64, bits * tables, 42L)
    val rows = (0 until tables).flatMap { t =>
      (0 until bits).map { b =>
        s"($t, $b, [${planes(t * bits + b).mkString(",")}]::DOUBLE[])"
      }
    }.mkString(", ")
    s"""planes(tbl, bit, pl) AS (VALUES $rows),
       |emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |sig AS (SELECT vec_id, tbl,
       |    CAST(SUM(CASE WHEN list_dot_product(e, pl) >= 0
       |             THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM emb CROSS JOIN planes GROUP BY vec_id, tbl),
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM sig a JOIN sig b
       |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id)""".stripMargin
  }

  private def annLshOracle: String =
    s"""WITH $lshCandCtes
       |SELECT id_a, id_b, ROUND(list_cosine_similarity(ea.e, eb.e), 6) AS cosine
       |FROM cand JOIN emb ea ON ea.vec_id = id_a JOIN emb eb ON eb.vec_id = id_b
       |WHERE ROUND(list_cosine_similarity(ea.e, eb.e), 6) >= 0.4
       |ORDER BY id_a, id_b""".stripMargin

  /** q74: LSH pairs (same params as q26) → transitive closure →
    * min-id survivor per cluster — the embedding-space rendering of
    * the canonical-corpus pipeline.
    */
  private def embeddingDedupOracle: String =
    s"""WITH RECURSIVE $lshCandCtes,
       |jp AS (SELECT id_a, id_b
       |  FROM cand JOIN emb ea ON ea.vec_id = id_a JOIN emb eb ON eb.vec_id = id_b
       |  WHERE ROUND(list_cosine_similarity(ea.e, eb.e), 6) >= 0.4),
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
       |ORDER BY em.vec_id""".stripMargin

  /** DuckDB equivalents — every registered query has one: q40 routes
    * through the hash-seeded IVF codebook and q47 through the
    * deterministic portable HLL precisely so that the last two
    * formerly rows-only checks became hash-checkable.
    */
  /** DuckDB rendering of `ZOrder.interleave` — bit-for-bit the same
    * shift/mask terms the Spark expression builds.
    */
  private def zTermsSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")

  /** DuckDB rendering of `SnapshotDiff.rowDigest` over the documents
    * table: non-key columns in sorted name order (lang, n_chars,
    * source, text), unit-separator joined, NULL → record separator.
    */
  private def docDigest(textExpr: String): String =
    s"""md5(concat_ws(chr(31),
       |    coalesce(CAST(lang AS VARCHAR), chr(30)),
       |    coalesce(CAST(n_chars AS VARCHAR), chr(30)),
       |    coalesce(CAST(source AS VARCHAR), chr(30)),
       |    coalesce(CAST($textExpr AS VARCHAR), chr(30))))""".stripMargin

  /** q102's full IVF+PQ chain in DuckDB — shared verbatim by q131 (the
    * persisted index must reproduce the inline operator exactly).
    */
  private lazy val ivfPqSeededOracle: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |ccb AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS list_id, v AS cc
      |       FROM (SELECT vec_id, v, ${md5l("CAST(vec_id AS VARCHAR)")} AS h
      |             FROM e ORDER BY h, vec_id LIMIT 8)),
      |ca AS (SELECT e.vec_id, e.v, ccb.list_id,
      |         row_number() OVER (PARTITION BY e.vec_id
      |           ORDER BY ROUND(list_cosine_similarity(e.v, ccb.cc), 6) DESC,
      |             ccb.list_id) AS crank
      |       FROM e CROSS JOIN ccb),
      |corpus AS (SELECT vec_id AS neighbor_id, list_id FROM ca WHERE crank = 1),
      |pl AS (SELECT vec_id AS query_id, list_id
      |       FROM ca WHERE crank <= 4 AND vec_id < 10),
      |cand AS (SELECT p.query_id, c.neighbor_id
      |         FROM pl p JOIN corpus c USING (list_id)
      |         WHERE c.neighbor_id <> p.query_id),
      |ms AS (SELECT unnest(generate_series(0, 7)) AS m),
      |sub AS (SELECT vec_id, m, v[m*8+1 : m*8+8] AS s FROM e, ms),
      |cb AS (SELECT m, code_id, s AS c FROM (
      |    SELECT m, s, row_number() OVER (PARTITION BY m ORDER BY
      |        ${md5l("concat(CAST(vec_id AS VARCHAR), ':', CAST(m AS VARCHAR))")},
      |        vec_id) - 1 AS code_id
      |    FROM sub) WHERE code_id < 16),
      |enc AS (SELECT vec_id AS neighbor_id, m, code_id FROM (
      |    SELECT sub.vec_id, sub.m, cb.code_id,
      |      CAST(floor(list_aggregate(
      |          [(sub.s[i] - cb.c[i]) * (sub.s[i] - cb.c[i])
      |           FOR i IN generate_series(1, 8)], 'sum')
      |        * 1000000e0 + 0.5e0) AS BIGINT) AS d2
      |    FROM sub JOIN cb USING (m))
      |  QUALIFY row_number() OVER (PARTITION BY neighbor_id, m
      |      ORDER BY d2, code_id) = 1),
      |pt AS (SELECT sub.vec_id AS query_id, sub.m, cb.code_id,
      |      CAST(floor(list_aggregate(
      |          [(sub.s[i] - cb.c[i]) * (sub.s[i] - cb.c[i])
      |           FOR i IN generate_series(1, 8)], 'sum')
      |        * 1000000e0 + 0.5e0) AS BIGINT) AS d2
      |    FROM sub JOIN cb USING (m) WHERE sub.vec_id < 10),
      |adc AS (SELECT cd.query_id, cd.neighbor_id, CAST(sum(pt.d2) AS BIGINT) AS sd
      |    FROM cand cd
      |    JOIN enc ON enc.neighbor_id = cd.neighbor_id
      |    JOIN pt ON pt.query_id = cd.query_id AND pt.m = enc.m
      |           AND pt.code_id = enc.code_id
      |    GROUP BY 1, 2)
      |SELECT query_id, rank, neighbor_id,
      |  ROUND(CAST(sd AS DOUBLE) / 1000000e0, 6) AS approx_d2
      |FROM (SELECT query_id, neighbor_id, sd,
      |        CAST(row_number() OVER (PARTITION BY query_id
      |            ORDER BY sd, neighbor_id) AS INTEGER) AS rank
      |      FROM adc)
      |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  // q139/q140: full BM25 replay — same tokenizer, Lucene idf, float
  // constants in e0 notation so DuckDB keeps them DOUBLE, scores
  // rounded BEFORE ranking with the doc-id tie-break. q140 (the
  // persisted index) must answer exactly like the inline operator,
  // so it shares this oracle verbatim.
  // CTE chain through the per-(query, doc) BM25 score `sc`, shared by
  // the q139/q140 oracle and q141's sparse tier.
  private lazy val bm25Ctes: String =
      """corpus AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'),
        |probes AS (SELECT doc_id AS query_id, string_split(text, ' ') AS t
        |  FROM documents WHERE source = 'src0' AND doc_id % 50 = 0),
        |qt AS (SELECT DISTINCT query_id, t[i] AS token FROM probes,
        |  LATERAL (SELECT unnest(generate_series(1, least(6, len(t)))) AS i) gs),
        |tfc AS (SELECT doc, token, count(*) AS tf FROM
        |  (SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS token
        |   FROM corpus) GROUP BY 1, 2),
        |dfc AS (SELECT token, count(*) AS df FROM tfc GROUP BY 1),
        |dl AS (SELECT doc_id AS doc, len(string_split(text, ' ')) AS dl
        |  FROM corpus),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |  avg(len(string_split(text, ' '))) AS avgdl FROM corpus),
        |sc AS (SELECT query_id, tfc.doc,
        |    round(sum(ln(1e0 + (n_docs - df + 0.5e0) / (df + 0.5e0))
        |      * tf * (1.2e0 + 1e0)
        |      / (tf + 1.2e0 * (1e0 - 0.75e0 + 0.75e0 * dl / avgdl))), 6)
        |      AS score
        |  FROM tfc
        |  JOIN qt USING (token)
        |  JOIN dfc USING (token)
        |  JOIN dl ON tfc.doc = dl.doc
        |  CROSS JOIN stats
        |  GROUP BY 1, 2)""".stripMargin

  private lazy val bm25Oracle: String =
    s"""WITH $bm25Ctes
       |SELECT query_id, rank, doc AS doc_id, score FROM
       |  (SELECT query_id, doc, score,
       |     CAST(row_number() OVER (PARTITION BY query_id
       |       ORDER BY score DESC, doc) AS INTEGER) AS rank
       |   FROM sc)
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  // q141: RRF fusion of the BM25 ranking above and the exact cosine
  // ranking over the same corpus split. Ranks are integers (exact
  // cross-engine given q139/q24 green), each (query, doc) sums at most
  // TWO double contributions — a single IEEE addition, order-free —
  // and the fused score rounds to 6dp before ranking, doc tie-break.
  private lazy val hybridRrfOracle: String =
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
       |dn AS (SELECT query_id, doc, rank FROM
       |  (SELECT query_id, doc,
       |     CAST(row_number() OVER (PARTITION BY query_id
       |       ORDER BY cos DESC, doc) AS INTEGER) AS rank
       |   FROM ds) WHERE rank <= 10),
       |u AS (SELECT query_id, doc, rank FROM bm
       |      UNION ALL SELECT query_id, doc, rank FROM dn),
       |f AS (SELECT query_id, doc, ROUND(SUM(1e0 / (60 + rank)), 6) AS rrf
       |      FROM u GROUP BY 1, 2)
       |SELECT query_id, rank, doc AS doc_id, rrf FROM
       |  (SELECT query_id, doc, rrf,
       |     CAST(row_number() OVER (PARTITION BY query_id
       |       ORDER BY rrf DESC, doc) AS INTEGER) AS rank
       |   FROM f)
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // q160: the derived rank-4 corpus and its seeded-tier ppm error
    // are replayed exactly (fixed integer loadings, q99's codebook
    // chain); the corpus fingerprint proves both engines scored the
    // same vectors; learned/OPQ tiers enter as asserted booleans.
    "q160_opq_gain" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |wt AS (SELECT vec_id,
        |    [v[1]*CAST((d*3) % 7 - 3 AS DOUBLE)
        |     + v[2]*CAST((d*4+1) % 7 - 3 AS DOUBLE)
        |     + v[3]*CAST((d*5+2) % 7 - 3 AS DOUBLE)
        |     + v[4]*CAST((d*6+3) % 7 - 3 AS DOUBLE)
        |     + 0.01e0*v[d+1]
        |     FOR d IN generate_series(0, 63)] AS w
        |  FROM e),
        |u AS (SELECT vec_id, gs.i - 1 AS dim,
        |    CAST(round(w[gs.i]*1e6) AS BIGINT) AS q
        |  FROM wt, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) gs),
        |fp AS (SELECT bit_xor(${md5l(
             "concat(CAST(vec_id AS VARCHAR), ':', CAST(dim AS VARCHAR), ':', CAST(q AS VARCHAR))")})
        |    AS corpus_fp FROM u),
        |ms AS (SELECT unnest(generate_series(0, 7)) AS m),
        |sub AS (SELECT vec_id, m, w[m*8+1 : m*8+8] AS s FROM wt, ms),
        |cb AS (SELECT m, code_id, s AS c FROM (
        |    SELECT m, s, row_number() OVER (PARTITION BY m ORDER BY
        |        ${md5l("concat(CAST(vec_id AS VARCHAR), ':', CAST(m AS VARCHAR))")},
        |        vec_id) - 1 AS code_id
        |    FROM sub) WHERE code_id < 16),
        |mind AS (SELECT vec_id, m, min(d2) AS d2min FROM (
        |    SELECT sub.vec_id, sub.m,
        |      CAST(floor(list_aggregate(
        |          [(sub.s[i] - cb.c[i]) * (sub.s[i] - cb.c[i])
        |           FOR i IN generate_series(1, 8)], 'sum')
        |        * 1000000e0 + 0.5e0) AS BIGINT) AS d2
        |    FROM sub JOIN cb USING (m)) GROUP BY 1, 2),
        |err AS (SELECT CAST(sum(d2min) AS BIGINT) AS seeded_err_ppm FROM mind)
        |SELECT (SELECT count(*) FROM e) AS n_vecs, fp.corpus_fp,
        |  err.seeded_err_ppm,
        |  true AS learned_le_seeded, true AS opq_halves_learned
        |FROM fp CROSS JOIN err""".stripMargin,
    // q159: the seeded-PQ tier is replayed exactly (q99's chain at
    // probes<50, k=5) against the exact cosine top-5; the learned
    // tiers (driver-side Lloyd, not SQL-expressible) enter as the
    // asserted booleans learned >= seeded — Spark computes the real
    // comparison, so a Lloyd regression flips the hash red.
    "q159_ann_recall_learned" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ms AS (SELECT unnest(generate_series(0, 7)) AS m),
        |sub AS (SELECT vec_id, m, v[m*8+1 : m*8+8] AS s FROM e, ms),
        |cb AS (SELECT m, code_id, s AS c FROM (
        |    SELECT m, s, row_number() OVER (PARTITION BY m ORDER BY
        |        ${md5l("concat(CAST(vec_id AS VARCHAR), ':', CAST(m AS VARCHAR))")},
        |        vec_id) - 1 AS code_id
        |    FROM sub) WHERE code_id < 16),
        |enc AS (SELECT vec_id AS neighbor_id, m, code_id FROM (
        |    SELECT sub.vec_id, sub.m, cb.code_id,
        |      CAST(floor(list_aggregate(
        |          [(sub.s[i] - cb.c[i]) * (sub.s[i] - cb.c[i])
        |           FOR i IN generate_series(1, 8)], 'sum')
        |        * 1000000e0 + 0.5e0) AS BIGINT) AS d2
        |    FROM sub JOIN cb USING (m))
        |  QUALIFY row_number() OVER (PARTITION BY neighbor_id, m
        |      ORDER BY d2, code_id) = 1),
        |pt AS (SELECT sub.vec_id AS query_id, sub.m, cb.code_id,
        |      CAST(floor(list_aggregate(
        |          [(sub.s[i] - cb.c[i]) * (sub.s[i] - cb.c[i])
        |           FOR i IN generate_series(1, 8)], 'sum')
        |        * 1000000e0 + 0.5e0) AS BIGINT) AS d2
        |    FROM sub JOIN cb USING (m) WHERE sub.vec_id < 50),
        |adc AS (SELECT query_id, neighbor_id, CAST(sum(d2) AS BIGINT) AS sd
        |    FROM enc JOIN pt USING (m, code_id)
        |    WHERE neighbor_id <> query_id GROUP BY 1, 2),
        |sl AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY sd, neighbor_id) AS rank FROM adc)
        |  WHERE rank <= 5),
        |ex AS (SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 6) DESC,
        |          c.vec_id) AS rank
        |    FROM e q, e c WHERE q.vec_id < 50 AND c.vec_id <> q.vec_id)
        |  WHERE rank <= 5),
        |h AS (SELECT count(*) AS seeded_hits
        |      FROM sl JOIN ex USING (query_id, neighbor_id)),
        |tot AS (SELECT count(*) AS total FROM ex)
        |SELECT tot.total, h.seeded_hits,
        |  ROUND(CAST(h.seeded_hits AS DOUBLE) / tot.total, 6) AS seeded_recall,
        |  true AS pq_learned_ge_seeded, true AS ivfpq_learned_ge_seeded
        |FROM tot CROSS JOIN h""".stripMargin,
    // q162: the PNG fixture's dimensions are derived from the doc, so
    // a decode that parses the real container must recover them; the
    // flag certifies the imageio branch ran, not the stub.
    "q162_image_decode" ->
      """SELECT doc_id,
        |  CAST(8 + doc_id % 24 AS INTEGER) AS width,
        |  CAST(8 + octet_length(encode(text)) % 24 AS INTEGER) AS height,
        |  3 AS channels, true AS real_decode
        |FROM documents ORDER BY doc_id""".stripMargin,
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
    // q157: q145's grid CTE + one more 24-bucket window; sample
    // stddev (NULL under 2 rows) and the cut on ROUNDED z in both
    // engines.
    "q157_grid_anomaly" ->
      """WITH obs AS (
        |  SELECT user_id, epoch_us(ts)//1000000//3600*3600 AS b,
        |         count(*) AS n, round(avg(value), 6) AS v
        |  FROM events WHERE user_id % 10 = 0 GROUP BY 1, 2),
        |bounds AS (SELECT user_id, min(b) AS bmin, max(b) AS bmax
        |  FROM obs GROUP BY 1),
        |grid AS (SELECT user_id, gs.b FROM bounds,
        |  LATERAL (SELECT unnest(generate_series(bmin, bmax, 3600)) AS b) gs),
        |u AS (SELECT user_id, b, 0 AS side, n, v FROM obs
        |  UNION ALL SELECT user_id, b, 1, NULL, NULL FROM grid),
        |w AS (SELECT user_id, b, side,
        |    last_value(v IGNORE NULLS) OVER back AS fv,
        |    last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER back AS fb,
        |    first_value(v IGNORE NULLS) OVER fwd AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER fwd AS nb
        |  FROM u WINDOW
        |    back AS (PARTITION BY user_id ORDER BY b, side
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    fwd AS (PARTITION BY user_id ORDER BY b, side
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |r AS (SELECT user_id, b AS bucket_sec,
        |    round(CASE WHEN fb = b THEN fv
        |      WHEN fv IS NOT NULL AND nv IS NOT NULL
        |        THEN fv + (nv - fv) * (b - fb) / (nb - fb)
        |      ELSE fv END, 6) AS interp_value
        |  FROM w WHERE side = 1),
        |zz AS (SELECT user_id, bucket_sec, interp_value,
        |    avg(interp_value) OVER wz AS m,
        |    stddev_samp(interp_value) OVER wz AS sd
        |  FROM r WINDOW wz AS (PARTITION BY user_id ORDER BY bucket_sec
        |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
        |SELECT user_id, bucket_sec, interp_value,
        |  round((interp_value - m)/sd, 6) AS z
        |FROM zz WHERE sd > 0
        |  AND abs(round((interp_value - m)/sd, 6)) > 2.5e0
        |ORDER BY user_id, bucket_sec""".stripMargin,
    // q156: the same lag → flag → running-sum chain definitionally;
    // second deltas are exact integer µs divisions, so no float time
    // math on either side.
    "q156_session_features" ->
      """WITH f AS (SELECT event_id, user_id, ts,
        |    lag(ts) OVER w AS prev_ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT f.*, CAST(sum(new_s) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS BIGINT) AS session_idx FROM f)
        |SELECT event_id, user_id, session_idx,
        |  CAST(row_number() OVER ws AS INTEGER) AS event_idx,
        |  CASE WHEN new_s = 1 THEN 0
        |    ELSE (epoch_us(ts) - epoch_us(prev_ts))//1000000 END
        |    AS secs_since_prev,
        |  epoch_us(ts)//1000000
        |    - min(epoch_us(ts)//1000000) OVER ws AS secs_since_start
        |FROM g WINDOW ws AS (PARTITION BY user_id, session_idx
        |  ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    // q155: the Bloom prefilter is invisible to results (false
    // positives die in the exact join, false negatives impossible) —
    // the oracle is the PLAIN semi join.
    "q155_bloom_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 6) AS sum_price
        |FROM orders WHERE o_custkey IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q154: interpolated medians at 0.5 are bit-identical across both
    // engines' quantile conventions; the ntile tie-break on
    // (score, id) pins bin membership; 1.4826e0 per the float-constant
    // rule.
    "q154_robust_calibration" ->
      """WITH med AS (SELECT lang, quantile_cont(n_chars, 0.5e0) AS med
        |  FROM documents GROUP BY 1),
        |dev AS (SELECT d.doc_id, d.lang, d.n_chars, m.med,
        |    abs(d.n_chars - m.med) AS adev
        |  FROM documents d JOIN med m USING (lang)),
        |mad AS (SELECT lang, quantile_cont(adev, 0.5e0) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT doc_id, lang, n_chars,
        |  round(CASE WHEN mad > 0
        |    THEN (n_chars - med)/(1.4826e0 * mad) END, 6) AS robust_z,
        |  CAST(ntile(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
        |    AS INTEGER) AS bin
        |FROM dev JOIN mad USING (lang)
        |ORDER BY doc_id""".stripMargin,
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
    // q152: definitional per-dim mean/variance over the full corpus on
    // the FIXED-POINT coordinates (q = round(x*1e6), Pca.quantize) —
    // the store's merged integer sums are exact and order-invariant,
    // so this is bit-identical to the one-shot computation (same
    // association as q148/q149: mean = Σq/1e6/n, var = Σq²/1e12/n −
    // mean·mean).
    "q152_moment_store" ->
      """WITH t AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |u AS (SELECT CAST(gs.i - 1 AS INTEGER) AS dim,
        |    CAST(round(v[gs.i]*1e6) AS BIGINT) AS q
        |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) gs)
        |SELECT dim, count(*) AS n,
        |  round(CAST(sum(q) AS DOUBLE)/1e6/count(*), 6) AS mean,
        |  round(CAST(sum(q*q) AS DOUBLE)/1e12/count(*)
        |    - CAST(sum(q) AS DOUBLE)/1e6/count(*)
        |      *(CAST(sum(q) AS DOUBLE)/1e6/count(*)), 6) AS variance
        |FROM u GROUP BY dim ORDER BY dim""".stripMargin,
    // q151: q146's oracle VERBATIM — the store-backed streaming path
    // must be indistinguishable from the one-shot batch gap report.
    "q151_cadence_store" ->
      """WITH obs AS (SELECT DISTINCT user_id,
        |    epoch_us(ts)//1000000//3600*3600 AS b FROM events),
        |d AS (SELECT user_id, b,
        |    lead(b) OVER (PARTITION BY user_id ORDER BY b) AS nb FROM obs)
        |SELECT user_id,
        |  (max(b) - min(b))//3600 + 1 AS n_expected,
        |  count(*) AS n_present,
        |  (max(b) - min(b))//3600 + 1 - count(*) AS n_missing,
        |  coalesce(max(nb - b - 3600), 0) AS max_gap_sec
        |FROM d GROUP BY 1 ORDER BY user_id""".stripMargin,
    // q150: same two windows over the group partitioning; z guarded to
    // NULL when the sample stddev is 0/undefined; percent_rank is the
    // ANSI (rank-1)/(n-1) in both engines.
    "q150_score_calibration" ->
      """SELECT doc_id, lang, n_chars,
        |  round(CASE WHEN stddev_samp(n_chars) OVER wg > 0
        |    THEN (n_chars - avg(n_chars) OVER wg)
        |         / stddev_samp(n_chars) OVER wg END, 6) AS z,
        |  round(percent_rank() OVER (PARTITION BY lang ORDER BY n_chars), 6)
        |    AS pct_rank
        |FROM documents
        |WINDOW wg AS (PARTITION BY lang)
        |ORDER BY doc_id""".stripMargin,
    // q149: conditional sums over the FIXED-POINT coordinates (q =
    // round(x*1e6), matching Pca.quantize) — exact integers, so only
    // the final reconstruction is float, with the Spark side's exact
    // association: mean = Σq/1e6/n, var = Σq²/1e12/n - mean·mean.
    "q149_dim_drift" ->
      """WITH t AS (SELECT CASE WHEN vec_id % 2 = 0 THEN 0 ELSE 1 END AS h,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |u AS (SELECT h, CAST(gs.i - 1 AS INTEGER) AS dim,
        |    CAST(round(v[gs.i]*1e6) AS BIGINT) AS q
        |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) gs)
        |SELECT dim,
        |  round(CAST(sum(CASE WHEN h=0 THEN q END) AS DOUBLE)/1e6
        |    /count(CASE WHEN h=0 THEN q END), 6) AS mean_a,
        |  round(CAST(sum(CASE WHEN h=1 THEN q END) AS DOUBLE)/1e6
        |    /count(CASE WHEN h=1 THEN q END), 6) AS mean_b,
        |  round(CAST(sum(CASE WHEN h=0 THEN q*q END) AS DOUBLE)/1e12
        |      /count(CASE WHEN h=0 THEN q END)
        |    - CAST(sum(CASE WHEN h=0 THEN q END) AS DOUBLE)/1e6
        |      /count(CASE WHEN h=0 THEN q END)
        |      * (CAST(sum(CASE WHEN h=0 THEN q END) AS DOUBLE)/1e6
        |        /count(CASE WHEN h=0 THEN q END)), 6) AS var_a,
        |  round(CAST(sum(CASE WHEN h=1 THEN q*q END) AS DOUBLE)/1e12
        |      /count(CASE WHEN h=1 THEN q END)
        |    - CAST(sum(CASE WHEN h=1 THEN q END) AS DOUBLE)/1e6
        |      /count(CASE WHEN h=1 THEN q END)
        |      * (CAST(sum(CASE WHEN h=1 THEN q END) AS DOUBLE)/1e6
        |        /count(CASE WHEN h=1 THEN q END)), 6) AS var_b,
        |  round(abs(CAST(sum(CASE WHEN h=0 THEN q END) AS DOUBLE)/1e6
        |      /count(CASE WHEN h=0 THEN q END)
        |    - CAST(sum(CASE WHEN h=1 THEN q END) AS DOUBLE)/1e6
        |      /count(CASE WHEN h=1 THEN q END)), 6) AS mean_shift
        |FROM u GROUP BY dim ORDER BY dim""".stripMargin,
    // q148: definitional covariance over the FIXED-POINT coordinates
    // (q = round(x*1e6) as BIGINT, matching Pca.quantize): integer
    // sums are exact and order-invariant on both engines, so the one
    // float reconstruction — (Σqq/1e12 - Σq/1e6·(Σq/1e6)/n)/n, the
    // SAME association covCell uses — is bit-identical, not merely
    // close (the CLAUDE.md order-invariance invariant; double partial
    // sums here flipped a 6-dp boundary in round 6).
    "q148_embedding_cov" ->
      """WITH e AS (SELECT row_number() OVER () AS rid,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |u AS (SELECT rid, gs.i AS d, CAST(round(v[gs.i]*1e6) AS BIGINT) AS q
        |  FROM e,
        |  LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) gs)
        |SELECT CAST(a.d - 1 AS INTEGER) AS dim_i,
        |  CAST(b.d - 1 AS INTEGER) AS dim_j,
        |  round((CAST(sum(a.q*b.q) AS DOUBLE)/1e12
        |    - CAST(sum(a.q) AS DOUBLE)/1e6*(CAST(sum(b.q) AS DOUBLE)/1e6)
        |      /count(*))/count(*), 6) AS cov
        |FROM u a JOIN u b ON a.rid = b.rid AND b.d >= a.d
        |GROUP BY 1, 2 ORDER BY dim_i, dim_j""".stripMargin,
    // q147: definitional quadratic kNN + vote — rank on the ROUNDED
    // cosine (q24's convention), majority with (count DESC, label)
    // tie-break, both deterministic cross-engine.
    "q147_knn_label_noise" ->
      """WITH q AS (SELECT vec_id AS query_id, label AS q_label,
        |    CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id % 20 = 0),
        |c AS (SELECT vec_id AS neighbor_id, label AS n_label,
        |    CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
        |s AS (SELECT query_id, q_label, neighbor_id, n_label,
        |    ROUND(list_cosine_similarity(qe, ce), 6) AS cos
        |  FROM q, c WHERE neighbor_id <> query_id),
        |r AS (SELECT query_id, q_label, n_label,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, neighbor_id) AS rank FROM s),
        |v AS (SELECT query_id, q_label, n_label, count(*) AS n_votes
        |  FROM r WHERE rank <= 5 GROUP BY 1, 2, 3),
        |w AS (SELECT query_id, q_label, n_label, n_votes,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY n_votes DESC, n_label) AS vr FROM v)
        |SELECT query_id AS vec_id, q_label AS label, n_label AS knn_label,
        |  n_votes, CASE WHEN q_label = n_label THEN 1 ELSE 0 END AS agree
        |FROM w WHERE vr = 1 ORDER BY vec_id""".stripMargin,
    // q145: same grid ∪ observations + one window definitionally —
    // buckets are epoch-second floors, the grid is generate_series
    // over each user's bucket span, fills read off the same
    // (bucket, side) ordering with obs rows sorted first.
    "q145_resample" ->
      """WITH obs AS (
        |  SELECT user_id, epoch_us(ts)//1000000//3600*3600 AS b,
        |         count(*) AS n, round(avg(value), 6) AS v
        |  FROM events WHERE user_id % 10 = 0 GROUP BY 1, 2),
        |bounds AS (SELECT user_id, min(b) AS bmin, max(b) AS bmax
        |  FROM obs GROUP BY 1),
        |grid AS (SELECT user_id, gs.b FROM bounds,
        |  LATERAL (SELECT unnest(generate_series(bmin, bmax, 3600)) AS b) gs),
        |u AS (SELECT user_id, b, 0 AS side, n, v FROM obs
        |  UNION ALL SELECT user_id, b, 1, NULL, NULL FROM grid),
        |w AS (SELECT user_id, b, side,
        |    last_value(v IGNORE NULLS) OVER back AS fv,
        |    last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER back AS fb,
        |    last_value(n IGNORE NULLS) OVER back AS fn,
        |    first_value(v IGNORE NULLS) OVER fwd AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER fwd AS nb
        |  FROM u WINDOW
        |    back AS (PARTITION BY user_id ORDER BY b, side
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    fwd AS (PARTITION BY user_id ORDER BY b, side
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, b AS bucket_sec,
        |  CASE WHEN fb = b THEN fn ELSE 0 END AS n_obs,
        |  CASE WHEN fb = b THEN fv END AS obs_value,
        |  fv AS ffill_value,
        |  b - fb AS ffill_age_sec,
        |  round(CASE WHEN fb = b THEN fv
        |    WHEN fv IS NOT NULL AND nv IS NOT NULL
        |      THEN fv + (nv - fv) * (b - fb) / (nb - fb)
        |    ELSE fv END, 6) AS interp_value
        |FROM w WHERE side = 1
        |ORDER BY user_id, bucket_sec""".stripMargin,
    // q146: cadence report from observed buckets alone — expected =
    // span/step + 1, longest gap from the lead() delta between
    // successive present buckets.
    "q146_gap_report" ->
      """WITH obs AS (SELECT DISTINCT user_id,
        |    epoch_us(ts)//1000000//3600*3600 AS b FROM events),
        |d AS (SELECT user_id, b,
        |    lead(b) OVER (PARTITION BY user_id ORDER BY b) AS nb FROM obs)
        |SELECT user_id,
        |  (max(b) - min(b))//3600 + 1 AS n_expected,
        |  count(*) AS n_present,
        |  (max(b) - min(b))//3600 + 1 - count(*) AS n_missing,
        |  coalesce(max(nb - b - 3600), 0) AS max_gap_sec
        |FROM d GROUP BY 1 ORDER BY user_id""".stripMargin,
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
    // q142: q57's recursive-CC cluster assignment, then the split is a
    // pure md5 of the CLUSTER id; docs outside every pair fall back to
    // their own id (singleton clusters).
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
    "q141_hybrid_rrf" -> hybridRrfOracle,
    "q140_text_index" -> bm25Oracle,
    "q139_bm25" -> bm25Oracle,
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
    // q135: the oracle is the PLAIN join — the bucketed layout must
    // change the plan, never the answer.
    "q135_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS orders,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // q134: same E-S keys from the same md5-derived uniforms; the
    // float key exists only inside the ORDER BY (continuous → no
    // cross-engine ties), the output is integers.
    "q134_weighted_sample" ->
      s"""WITH keyed AS (SELECT source, doc_id, n_chars,
        |  ln((${md5l("CAST(doc_id AS VARCHAR)")} + 1) / 1152921504606846976e0)
        |    / CAST(n_chars AS DOUBLE) AS k
        |  FROM documents WHERE n_chars > 0)
        |SELECT source, rank, doc_id, n_chars FROM (
        |  SELECT source, doc_id, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY k DESC, doc_id) AS INTEGER) AS rank
        |  FROM keyed)
        |WHERE rank <= 3 ORDER BY source, rank""".stripMargin,
    // q133: the store round-trip must reproduce the source table
    // exactly — the oracle aggregates `documents` directly, so the
    // hash match is over WHAT SURVIVED the staged appends, key dedup,
    // compaction, and healed read.
    "q133_sink_roundtrip" ->
      """SELECT source, count(*) AS docs,
        |  CAST(sum(len(text)) AS BIGINT) AS chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // q132: q127's clean rules + q20's dedup (keyed on md5(text)) +
    // token totals, per source — the funnel every stage's own oracle
    // already verifies in isolation, composed. Counts CAST to BIGINT
    // (DuckDB sums INTEGER into HUGEINT); the share division is last.
    "q132_pipeline_funnel" ->
      """WITH t AS (SELECT doc_id, source, text,
        |  regexp_split_to_array(text, '\s+') AS toks FROM documents),
        |m AS (SELECT doc_id, source, text,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  ROUND(CAST(len(list_filter(toks, x -> x IN
        |    ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
        |    / len(toks), 6) AS stopword_ratio,
        |  ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS ttr
        |FROM t),
        |kept AS (SELECT doc_id, source, text, n_tokens FROM m
        |  WHERE n_tokens >= 10 AND stopword_ratio >= 0.05e0 AND ttr >= 0.2e0),
        |canon AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
        |canon_docs AS (SELECT k.source, k.n_tokens
        |  FROM kept k JOIN canon c USING (doc_id)),
        |base AS (SELECT source, count(*) AS docs_in FROM documents GROUP BY source),
        |keptagg AS (SELECT source, count(*) AS docs_kept FROM kept GROUP BY source),
        |canonagg AS (SELECT source, count(*) AS docs_canonical,
        |  CAST(sum(n_tokens) AS BIGINT) AS tokens_canonical
        |  FROM canon_docs GROUP BY source),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM canon_docs)
        |SELECT b.source, b.docs_in,
        |  coalesce(k.docs_kept, 0) AS docs_kept,
        |  coalesce(c.docs_canonical, 0) AS docs_canonical,
        |  coalesce(c.tokens_canonical, 0) AS tokens_canonical,
        |  ROUND(CAST(coalesce(c.tokens_canonical, 0) AS DOUBLE)
        |    / t.total_tokens, 6) AS token_share
        |FROM base b
        |LEFT JOIN keptagg k USING (source)
        |LEFT JOIN canonagg c USING (source)
        |CROSS JOIN tot t
        |ORDER BY b.source""".stripMargin,
    // q129: q102's ADC chain + q126's rerank + q24's exact top-k,
    // composed into one recall report — every tier's result set is the
    // SAME CTE shape its own oracle uses, so a hash match here means
    // the recall numbers, not just the rankings, agree cross-engine.
    "q129_ann_recall" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ccb AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS list_id, v AS cc
        |       FROM (SELECT vec_id, v, ${md5l("CAST(vec_id AS VARCHAR)")} AS h
        |             FROM e ORDER BY h, vec_id LIMIT 8)),
        |ca AS (SELECT e.vec_id, e.v, ccb.list_id,
        |         row_number() OVER (PARTITION BY e.vec_id
        |           ORDER BY ROUND(list_cosine_similarity(e.v, ccb.cc), 6) DESC,
        |             ccb.list_id) AS crank
        |       FROM e CROSS JOIN ccb),
        |corpus AS (SELECT vec_id AS neighbor_id, list_id FROM ca WHERE crank = 1),
        |pl AS (SELECT vec_id AS query_id, list_id
        |       FROM ca WHERE crank <= 4 AND vec_id < 10),
        |cand AS (SELECT p.query_id, c.neighbor_id
        |         FROM pl p JOIN corpus c USING (list_id)
        |         WHERE c.neighbor_id <> p.query_id),
        |ms AS (SELECT unnest(generate_series(0, 7)) AS m),
        |sub AS (SELECT vec_id, m, v[m*8+1 : m*8+8] AS s FROM e, ms),
        |cb AS (SELECT m, code_id, s AS c FROM (
        |    SELECT m, s, row_number() OVER (PARTITION BY m ORDER BY
        |        ${md5l("concat(CAST(vec_id AS VARCHAR), ':', CAST(m AS VARCHAR))")},
        |        vec_id) - 1 AS code_id
        |    FROM sub) WHERE code_id < 16),
        |enc AS (SELECT vec_id AS neighbor_id, m, code_id FROM (
        |    SELECT sub.vec_id, sub.m, cb.code_id,
        |      CAST(floor(list_aggregate(
        |          [(sub.s[i] - cb.c[i]) * (sub.s[i] - cb.c[i])
        |           FOR i IN generate_series(1, 8)], 'sum')
        |        * 1000000e0 + 0.5e0) AS BIGINT) AS d2
        |    FROM sub JOIN cb USING (m))
        |  QUALIFY row_number() OVER (PARTITION BY neighbor_id, m
        |      ORDER BY d2, code_id) = 1),
        |pt AS (SELECT sub.vec_id AS query_id, sub.m, cb.code_id,
        |      CAST(floor(list_aggregate(
        |          [(sub.s[i] - cb.c[i]) * (sub.s[i] - cb.c[i])
        |           FOR i IN generate_series(1, 8)], 'sum')
        |        * 1000000e0 + 0.5e0) AS BIGINT) AS d2
        |    FROM sub JOIN cb USING (m) WHERE sub.vec_id < 10),
        |adc AS (SELECT cd.query_id, cd.neighbor_id, CAST(sum(pt.d2) AS BIGINT) AS sd
        |    FROM cand cd
        |    JOIN enc ON enc.neighbor_id = cd.neighbor_id
        |    JOIN pt ON pt.query_id = cd.query_id AND pt.m = enc.m
        |           AND pt.code_id = enc.code_id
        |    GROUP BY 1, 2),
        |pq AS (SELECT query_id, neighbor_id,
        |        row_number() OVER (PARTITION BY query_id
        |          ORDER BY sd, neighbor_id) AS rank
        |      FROM adc),
        |sl AS (SELECT query_id, neighbor_id FROM pq WHERE rank <= 12),
        |rr AS (SELECT sl.query_id, sl.neighbor_id,
        |        row_number() OVER (PARTITION BY sl.query_id
        |          ORDER BY ROUND(list_cosine_similarity(eq.v, en.v), 6) DESC,
        |            sl.neighbor_id) AS rank
        |      FROM sl JOIN e eq ON eq.vec_id = sl.query_id
        |              JOIN e en ON en.vec_id = sl.neighbor_id),
        |ex AS (SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 6) DESC,
        |          c.vec_id) AS rank
        |    FROM e q, e c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
        |  WHERE rank <= 3),
        |mm AS (SELECT 'ivfpq_adc' AS method, query_id, neighbor_id
        |         FROM pq WHERE rank <= 3
        |       UNION ALL
        |       SELECT 'ivfpq_rerank', query_id, neighbor_id
        |         FROM rr WHERE rank <= 3),
        |h AS (SELECT method, count(*) AS hits FROM mm
        |      JOIN ex USING (query_id, neighbor_id) GROUP BY method),
        |tot AS (SELECT count(*) AS total FROM ex)
        |SELECT names.method, CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
        |  tot.total,
        |  ROUND(CAST(COALESCE(h.hits, 0) AS DOUBLE) / tot.total, 6) AS recall
        |FROM (SELECT unnest(['ivfpq_adc', 'ivfpq_rerank']) AS method) names
        |LEFT JOIN h ON h.method = names.method
        |CROSS JOIN tot
        |ORDER BY names.method""".stripMargin,
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
    "q124_negative_samples" ->
      s"""WITH nn AS (SELECT count(*) AS n FROM embeddings),
        |d AS (SELECT e.vec_id AS anchor_id, gs.i AS sample_idx,
        |        ${md5l("concat(CAST(e.vec_id AS VARCHAR), ':', CAST(gs.i AS VARCHAR), ':neg')")} % nn.n AS draw
        |      FROM embeddings e, nn,
        |        LATERAL (SELECT unnest(generate_series(0, 3)) AS i) gs),
        |s AS (SELECT anchor_id, sample_idx,
        |        CASE WHEN draw = anchor_id
        |             THEN (draw + 1) % (SELECT n FROM nn) ELSE draw END AS neg_id
        |      FROM d)
        |SELECT anchor_id, CAST(sample_idx AS INTEGER) AS sample_idx, neg_id,
        |  e2.label AS neg_label
        |FROM s JOIN embeddings e2 ON e2.vec_id = s.neg_id
        |ORDER BY anchor_id, sample_idx""".stripMargin,
    "q122_embedding_diversity" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT label, count(*) AS n,
        |        avg(list_dot_product(v, v)) AS s FROM e GROUP BY label),
        |dm AS (SELECT label, gs.d AS dim, avg(v[gs.d]) AS m
        |       FROM e, LATERAL (SELECT unnest(generate_series(1, len(v))) AS d) gs
        |       GROUP BY label, gs.d),
        |m2 AS (SELECT label, sum(m * m) AS m2 FROM dm GROUP BY label)
        |SELECT label, n, ROUND(2.0e0 * (s - m2), 6) AS mean_sq_dist
        |FROM n JOIN m2 USING (label) ORDER BY label""".stripMargin,
    "q123_centroid_affinity" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |dm AS (SELECT label, gs.d AS dim, ROUND(avg(v[gs.d]), 6) AS m
        |       FROM e, LATERAL (SELECT unnest(generate_series(1, len(v))) AS d) gs
        |       GROUP BY label, gs.d),
        |c AS (SELECT label, list(m ORDER BY dim) AS c FROM dm GROUP BY label)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  ROUND(list_cosine_similarity(a.c, b.c), 6) AS cosine
        |FROM c a JOIN c b ON a.label < b.label
        |ORDER BY label_a, label_b""".stripMargin,
    "q121_chunk_pack" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
        |           FROM documents),
        |c AS (SELECT doc_id, toks, len(toks) AS n,
        |        CASE WHEN len(toks) <= 64 THEN 1
        |             ELSE CAST(ceil((len(toks) - 64) / 48.0) AS BIGINT) + 1 END AS n_chunks
        |      FROM t),
        |ch AS (SELECT concat(CAST(doc_id AS VARCHAR), ':', CAST(gs.i AS VARCHAR)) AS chunk_key,
        |         array_to_string(toks[gs.i * 48 + 1 : gs.i * 48 + 64], ' ') AS chunk_text
        |       FROM c, LATERAL (SELECT unnest(generate_series(0, n_chunks - 1)) AS i) gs),
        |t2 AS (SELECT chunk_key,
        |         CAST(len(regexp_split_to_array(chunk_text, '\\s+')) AS BIGINT) AS n_tokens,
        |         ${md5l("chunk_key")} AS h FROM ch),
        |c2 AS (SELECT chunk_key, n_tokens,
        |        sum(n_tokens) OVER (ORDER BY h, chunk_key
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t2)
        |SELECT chunk_key, n_tokens,
        |  CAST((cum - n_tokens) // 2000 AS INTEGER) AS shard_id
        |FROM c2 ORDER BY chunk_key""".stripMargin,
    "q119_winsorize" ->
      """WITH s AS (SELECT min(value) AS lo, max(value) AS hi,
        |                  count(value) AS n FROM events),
        |b AS (SELECT CASE WHEN hi = lo THEN 0
        |        ELSE CAST(LEAST(999, floor((value - lo) / (hi - lo) * 1000))
        |             AS INTEGER) END AS bin
        |      FROM events, s),
        |h AS (SELECT bin, count(*) AS bcnt FROM b GROUP BY bin),
        |c AS (SELECT bin, sum(bcnt) OVER (ORDER BY bin) AS cum FROM h),
        |t AS (SELECT p, CAST(ceil(p * n) AS BIGINT) AS target
        |      FROM s, (VALUES (0.05e0), (0.95e0)) pp(p)),
        |q AS (SELECT p, min(bin) AS bin FROM t JOIN c ON cum >= target GROUP BY p),
        |qv AS (SELECT p, ROUND(lo + bin * (hi - lo) / 1000e0, 6) AS v FROM q, s),
        |th AS (SELECT min(CASE WHEN p = 0.05e0 THEN v END) AS ql,
        |              min(CASE WHEN p = 0.95e0 THEN v END) AS qh FROM qv)
        |SELECT event_id, value,
        |  ROUND(LEAST(GREATEST(value, ql), qh), 6) AS value_w
        |FROM events, th ORDER BY event_id""".stripMargin,
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
    "q117_expectations" ->
      """WITH s AS (SELECT
        |  CAST(sum(CASE WHEN coalesce(l_quantity > 0, false) THEN 0 ELSE 1 END) AS BIGINT) AS c0,
        |  CAST(sum(CASE WHEN coalesce(l_extendedprice >= 0, false) THEN 0 ELSE 1 END) AS BIGINT) AS c1,
        |  CAST(sum(CASE WHEN coalesce(l_discount <= 0.05e0, false) THEN 0 ELSE 1 END) AS BIGINT) AS c2,
        |  CAST(sum(CASE WHEN coalesce(l_shipdate BETWEEN DATE '1992-01-01' AND DATE '1998-12-31', false) THEN 0 ELSE 1 END) AS BIGINT) AS c3
        |  FROM lineitem)
        |SELECT 'discount_le_5pct' AS check_name, c2 AS n_violations, c2 = 0 AS passed FROM s
        |UNION ALL SELECT 'price_nonneg', c1, c1 = 0 FROM s
        |UNION ALL SELECT 'qty_positive', c0, c0 = 0 FROM s
        |UNION ALL SELECT 'shipdate_in_range', c3, c3 = 0 FROM s
        |ORDER BY check_name""".stripMargin,
    "q118_ref_integrity" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_orphans
        |FROM lineitem l LEFT JOIN
        |  (SELECT o_orderkey FROM orders WHERE o_orderkey % 5 != 0) o
        |  ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey IS NULL""".stripMargin,
    "q116_anomaly_flags" ->
      """WITH x AS (SELECT event_id, user_id, value,
        |    avg(value) OVER w AS mu, stddev_samp(value) OVER w AS sd
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, value,
        |  ROUND((value - mu) / sd, 6) AS z,
        |  abs(ROUND((value - mu) / sd, 6)) > 3 AS is_anomaly
        |FROM x WHERE sd IS NOT NULL AND sd > 0
        |ORDER BY event_id""".stripMargin,
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
    "q113_cdc_apply" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0e0
        |       ELSE c_acctbal END AS c_acctbal,
        |  CAST(CASE WHEN c_custkey % 7 = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS last_seq
        |FROM customer WHERE c_custkey % 11 != 0
        |ORDER BY c_custkey""".stripMargin,
    "q114_corpus_stats" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(count(DISTINCT text) AS BIGINT) AS distinct_texts,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |  ROUND(avg(len(string_split(text, ' '))), 6) AS avg_doc_tokens
        |FROM documents""".stripMargin,
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
    "q112_bpe_merges" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |p AS (SELECT array_to_string(t[i:i+1], ' ') AS merge_pair
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) gs
        |  WHERE len(t) >= 2)
        |SELECT merge_pair, count(*) AS n_occurrences
        |FROM p GROUP BY merge_pair
        |ORDER BY n_occurrences DESC, merge_pair LIMIT 50""".stripMargin,
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
    "q107_snapshot_diff" ->
      s"""WITH prev AS (SELECT doc_id, ${docDigest("text")} AS h1
        |  FROM documents WHERE doc_id % 10 != 3),
        |nxt AS (SELECT doc_id,
        |    ${docDigest("CASE WHEN doc_id % 5 = 0 THEN concat(text, ' v2') ELSE text END")} AS h2
        |  FROM documents WHERE doc_id % 7 != 2),
        |j AS (SELECT coalesce(prev.doc_id, nxt.doc_id) AS doc_id, h1, h2
        |  FROM prev FULL OUTER JOIN nxt ON prev.doc_id = nxt.doc_id)
        |SELECT doc_id,
        |  CASE WHEN h1 IS NULL THEN 'added'
        |       WHEN h2 IS NULL THEN 'removed'
        |       ELSE 'changed' END AS status
        |FROM j WHERE h1 IS NULL OR h2 IS NULL OR h1 != h2
        |ORDER BY doc_id""".stripMargin,
    "q108_scd2_merge" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  CAST(1 AS INTEGER) AS version,
        |  (c_custkey % 7 != 0) AS is_current
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, c_mktsegment, c_acctbal + 100.0e0,
        |  CAST(2 AS INTEGER), true
        |FROM customer WHERE c_custkey % 7 = 0
        |ORDER BY c_custkey, version""".stripMargin,
    "q109_retention" ->
      """WITH act AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
        |  FROM events),
        |f AS (SELECT u, min(d) AS cohort_d FROM act GROUP BY u)
        |SELECT cohort_d, CAST(d - cohort_d AS INTEGER) AS offset_days,
        |  count(*) AS n_users
        |FROM act JOIN f USING (u)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q110_rolling_active" ->
      """WITH act AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
        |  FROM events),
        |days AS (SELECT DISTINCT d AS target_d FROM act)
        |SELECT target_d, count(DISTINCT u) AS active_users
        |FROM days JOIN act ON act.d BETWEEN target_d - 6 AND target_d
        |GROUP BY 1 ORDER BY 1""".stripMargin,
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
    "q103_mix_report" ->
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |w AS (SELECT lang, n,
        |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000e0) AS BIGINT) AS w FROM c),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot, CAST(sum(w) AS BIGINT) AS sumw
        |       FROM w),
        |r AS (SELECT lang,
        |    LEAST(1000000, CAST(floor(0.5e0 * tot * w / sumw / n * 1000000e0) AS BIGINT))
        |      AS ppm
        |  FROM w, t),
        |kept AS (SELECT d.lang, count(*) AS n_after
        |  FROM documents d JOIN r USING (lang)
        |  WHERE ${md5l("CAST(d.doc_id AS VARCHAR)")} % 1000000 < r.ppm
        |  GROUP BY d.lang),
        |j AS (SELECT c.lang, CAST(c.n AS BIGINT) AS n_before,
        |        CAST(coalesce(k.n_after, 0) AS BIGINT) AS n_after
        |      FROM c LEFT JOIN kept k USING (lang)),
        |tt AS (SELECT CAST(sum(n_before) AS BIGINT) AS tb,
        |         CAST(sum(n_after) AS BIGINT) AS ta FROM j)
        |SELECT lang, n_before, n_after,
        |  ROUND(n_before / tb, 6) AS frac_before,
        |  ROUND(n_after / ta, 6) AS frac_after
        |FROM j, tt ORDER BY lang""".stripMargin,
    "q102_ann_ivf_pq" -> ivfPqSeededOracle,
    // q131 shares q102's oracle VERBATIM: the persisted index must
    // return exactly what the inline operator returns — the hash match
    // proves the store/encode/prune/read path, not just the algebra.
    "q131_ann_index" -> ivfPqSeededOracle,
    "q126_ann_ivfpq_rerank" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ccb AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS list_id, v AS cc
        |       FROM (SELECT vec_id, v, ${md5l("CAST(vec_id AS VARCHAR)")} AS h
        |             FROM e ORDER BY h, vec_id LIMIT 8)),
        |ca AS (SELECT e.vec_id, e.v, ccb.list_id,
        |         row_number() OVER (PARTITION BY e.vec_id
        |           ORDER BY ROUND(list_cosine_similarity(e.v, ccb.cc), 6) DESC,
        |             ccb.list_id) AS crank
        |       FROM e CROSS JOIN ccb),
        |corpus AS (SELECT vec_id AS neighbor_id, list_id FROM ca WHERE crank = 1),
        |pl AS (SELECT vec_id AS query_id, list_id
        |       FROM ca WHERE crank <= 4 AND vec_id < 10),
        |cand AS (SELECT p.query_id, c.neighbor_id
        |         FROM pl p JOIN corpus c USING (list_id)
        |         WHERE c.neighbor_id <> p.query_id),
        |ms AS (SELECT unnest(generate_series(0, 7)) AS m),
        |sub AS (SELECT vec_id, m, v[m*8+1 : m*8+8] AS s FROM e, ms),
        |cb AS (SELECT m, code_id, s AS c FROM (
        |    SELECT m, s, row_number() OVER (PARTITION BY m ORDER BY
        |        ${md5l("concat(CAST(vec_id AS VARCHAR), ':', CAST(m AS VARCHAR))")},
        |        vec_id) - 1 AS code_id
        |    FROM sub) WHERE code_id < 16),
        |enc AS (SELECT vec_id AS neighbor_id, m, code_id FROM (
        |    SELECT sub.vec_id, sub.m, cb.code_id,
        |      CAST(floor(list_aggregate(
        |          [(sub.s[i] - cb.c[i]) * (sub.s[i] - cb.c[i])
        |           FOR i IN generate_series(1, 8)], 'sum')
        |        * 1000000e0 + 0.5e0) AS BIGINT) AS d2
        |    FROM sub JOIN cb USING (m))
        |  QUALIFY row_number() OVER (PARTITION BY neighbor_id, m
        |      ORDER BY d2, code_id) = 1),
        |pt AS (SELECT sub.vec_id AS query_id, sub.m, cb.code_id,
        |      CAST(floor(list_aggregate(
        |          [(sub.s[i] - cb.c[i]) * (sub.s[i] - cb.c[i])
        |           FOR i IN generate_series(1, 8)], 'sum')
        |        * 1000000e0 + 0.5e0) AS BIGINT) AS d2
        |    FROM sub JOIN cb USING (m) WHERE sub.vec_id < 10),
        |adc AS (SELECT cd.query_id, cd.neighbor_id, CAST(sum(pt.d2) AS BIGINT) AS sd
        |    FROM cand cd
        |    JOIN enc ON enc.neighbor_id = cd.neighbor_id
        |    JOIN pt ON pt.query_id = cd.query_id AND pt.m = enc.m
        |           AND pt.code_id = enc.code_id
        |    GROUP BY 1, 2),
        |sl AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY sd, neighbor_id) AS prank
        |    FROM adc) WHERE prank <= 12)
        |SELECT query_id, rank, neighbor_id, cosine FROM (
        |  SELECT sl.query_id, sl.neighbor_id,
        |    ROUND(list_cosine_similarity(eq.v, en.v), 6) AS cosine,
        |    CAST(row_number() OVER (PARTITION BY sl.query_id
        |        ORDER BY ROUND(list_cosine_similarity(eq.v, en.v), 6) DESC,
        |          sl.neighbor_id) AS INTEGER) AS rank
        |  FROM sl JOIN e eq ON eq.vec_id = sl.query_id
        |          JOIN e en ON en.vec_id = sl.neighbor_id)
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "q101_grouped_quantiles" ->
      """WITH b AS (SELECT lang,
        |    CAST(LEAST(499, GREATEST(0,
        |      floor((CAST(n_chars AS DOUBLE) - 0e0) / 5000e0 * 500)))
        |      AS INTEGER) AS bin
        |  FROM documents WHERE n_chars IS NOT NULL),
        |h AS (SELECT lang, bin, count(*) AS bcnt FROM b GROUP BY 1, 2),
        |c AS (SELECT lang, bin, sum(bcnt) OVER (PARTITION BY lang ORDER BY bin)
        |        AS cum FROM h),
        |n AS (SELECT lang, CAST(sum(bcnt) AS BIGINT) AS n FROM h GROUP BY lang),
        |t AS (SELECT lang, p.percentile, ceil(p.percentile * n) AS target
        |      FROM n, (SELECT unnest([0.25e0, 0.5e0, 0.75e0, 0.9e0, 0.99e0])
        |                 AS percentile) p),
        |r AS (SELECT t.lang, t.percentile, min(c.bin) AS bin
        |      FROM t JOIN c ON t.lang = c.lang AND c.cum >= t.target
        |      GROUP BY 1, 2)
        |SELECT lang, percentile, bin,
        |  ROUND(0e0 + bin * 5000e0 / 500e0, 6) AS value_est
        |FROM r ORDER BY lang, percentile""".stripMargin,
    "q100_mixture_pipeline" ->
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |w AS (SELECT lang, n,
        |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000e0) AS BIGINT) AS w FROM c),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot, CAST(sum(w) AS BIGINT) AS sumw
        |       FROM w),
        |r AS (SELECT lang,
        |    LEAST(1000000, CAST(floor(0.5e0 * tot * w / sumw / n * 1000000e0) AS BIGINT))
        |      AS ppm
        |  FROM w, t),
        |kept AS (SELECT d.doc_id, d.lang
        |  FROM documents d JOIN r USING (lang)
        |  WHERE ${md5l("CAST(d.doc_id AS VARCHAR)")} % 1000000 < r.ppm),
        |h AS (SELECT doc_id, lang,
        |    ${md5l("concat(CAST(doc_id AS VARCHAR), ':1')")} AS h FROM kept)
        |SELECT doc_id, lang, h % 8 AS shard,
        |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS INTEGER)
        |    AS pos
        |FROM h ORDER BY shard, pos""".stripMargin,
    "q99_ann_pq" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ms AS (SELECT unnest(generate_series(0, 7)) AS m),
        |sub AS (SELECT vec_id, m, v[m*8+1 : m*8+8] AS s FROM e, ms),
        |cb AS (SELECT m, code_id, s AS c FROM (
        |    SELECT m, s, row_number() OVER (PARTITION BY m ORDER BY
        |        ${md5l("concat(CAST(vec_id AS VARCHAR), ':', CAST(m AS VARCHAR))")},
        |        vec_id) - 1 AS code_id
        |    FROM sub) WHERE code_id < 16),
        |enc AS (SELECT vec_id AS neighbor_id, m, code_id FROM (
        |    SELECT sub.vec_id, sub.m, cb.code_id,
        |      CAST(floor(list_aggregate(
        |          [(sub.s[i] - cb.c[i]) * (sub.s[i] - cb.c[i])
        |           FOR i IN generate_series(1, 8)], 'sum')
        |        * 1000000e0 + 0.5e0) AS BIGINT) AS d2
        |    FROM sub JOIN cb USING (m))
        |  QUALIFY row_number() OVER (PARTITION BY neighbor_id, m
        |      ORDER BY d2, code_id) = 1),
        |pt AS (SELECT sub.vec_id AS query_id, sub.m, cb.code_id,
        |      CAST(floor(list_aggregate(
        |          [(sub.s[i] - cb.c[i]) * (sub.s[i] - cb.c[i])
        |           FOR i IN generate_series(1, 8)], 'sum')
        |        * 1000000e0 + 0.5e0) AS BIGINT) AS d2
        |    FROM sub JOIN cb USING (m) WHERE sub.vec_id < 10),
        |adc AS (SELECT query_id, neighbor_id, CAST(sum(d2) AS BIGINT) AS sd
        |    FROM enc JOIN pt USING (m, code_id)
        |    WHERE neighbor_id <> query_id GROUP BY 1, 2)
        |SELECT query_id, rank, neighbor_id,
        |  ROUND(CAST(sd AS DOUBLE) / 1000000e0, 6) AS approx_d2
        |FROM (SELECT query_id, neighbor_id, sd,
        |        CAST(row_number() OVER (PARTITION BY query_id
        |            ORDER BY sd, neighbor_id) AS INTEGER) AS rank
        |      FROM adc)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
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
    "q96_zorder_stats" ->
      s"""WITH z AS (SELECT CAST(${zTermsSql("l_partkey", "l_suppkey")} AS BIGINT) >> 14
        |    AS file, l_partkey AS x, l_suppkey AS y FROM lineitem),
        |s AS (SELECT file, count(*) AS n_rows,
        |    min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max
        |  FROM z GROUP BY file)
        |SELECT file, n_rows, x_min, x_max, y_min, y_max,
        |  (x_min <= 300 AND x_max >= 100) AS read_x,
        |  (y_min <= 20 AND y_max >= 10) AS read_y
        |FROM s ORDER BY file""".stripMargin,
    "q97_epoch_shuffle" ->
      s"""WITH h AS (SELECT doc_id,
        |    ${md5l("concat(CAST(doc_id AS VARCHAR), ':1')")} AS h FROM documents)
        |SELECT doc_id, h % 8 AS shard,
        |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS INTEGER)
        |    AS pos
        |FROM h ORDER BY shard, pos""".stripMargin,
    "q95_temperature_sample" ->
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |w AS (SELECT lang, n,
        |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000e0) AS BIGINT) AS w FROM c),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot, CAST(sum(w) AS BIGINT) AS sumw
        |       FROM w),
        |r AS (SELECT lang,
        |    LEAST(1000000, CAST(floor(0.5e0 * tot * w / sumw / n * 1000000e0) AS BIGINT))
        |      AS ppm
        |  FROM w, t)
        |SELECT d.doc_id, d.lang, d.source, d.n_chars
        |FROM documents d JOIN r USING (lang)
        |WHERE ${md5l("CAST(d.doc_id AS VARCHAR)")} % 1000000 < r.ppm
        |ORDER BY d.doc_id""".stripMargin,
    "q94_jsonl_export" ->
      """SELECT doc_id,
        |  CAST(to_json(struct_pack(doc_id := doc_id, lang := lang,
        |    source := source, n_chars := n_chars)) AS VARCHAR) AS jsonl
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q93_multimodal_resize" ->
      """WITH m AS (SELECT doc_id,
        |    CAST(64 + octet_length(encode(text)) % 512 AS INTEGER) AS src_w,
        |    CAST(64 + ascii(substr(text, 1, 1)) % 512 AS INTEGER) AS src_h
        |  FROM documents),
        |s AS (SELECT doc_id, src_w, src_h,
        |    LEAST(256.0e0 / src_w, 256.0e0 / src_h, 1.0e0) AS sc FROM m)
        |SELECT doc_id, src_w, src_h,
        |  CAST(GREATEST(1, floor(src_w * sc)) AS INTEGER) AS dst_w,
        |  CAST(GREATEST(1, floor(src_h * sc)) AS INTEGER) AS dst_h,
        |  ROUND(sc, 6) AS scale
        |FROM s ORDER BY doc_id""".stripMargin,
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
    "q88_histogram_quantiles" ->
      """WITH s AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi,
        |                  count(*) AS n FROM lineitem),
        |b AS (SELECT CASE WHEN hi = lo THEN 0
        |        ELSE CAST(LEAST(999, floor((l_extendedprice - lo) / (hi - lo) * 1000))
        |             AS INTEGER) END AS bin
        |      FROM lineitem, s),
        |h AS (SELECT bin, count(*) AS bcnt FROM b GROUP BY bin),
        |c AS (SELECT bin, sum(bcnt) OVER (ORDER BY bin
        |        ROWS UNBOUNDED PRECEDING) AS cum FROM h),
        |q AS (SELECT unnest([0.25e0, 0.5e0, 0.75e0, 0.9e0, 0.99e0]) AS percentile),
        |t AS (SELECT percentile, ceil(percentile * n) AS target, lo, hi FROM q, s),
        |r AS (SELECT percentile, lo, hi, min(bin) AS bin
        |      FROM t JOIN c ON c.cum >= t.target GROUP BY percentile, lo, hi)
        |SELECT percentile, bin,
        |  ROUND(lo + bin * (hi - lo) / 1000.0e0, 6) AS value_est
        |FROM r ORDER BY percentile""".stripMargin,
    "q89_count_min" ->
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |hx AS (SELECT token, r,
        |    ${md5l("concat(token, '_', CAST(r AS VARCHAR))")} % 1024 AS c
        |  FROM tok, generate_series(0, 3) AS gs(r)),
        |cm AS (SELECT r, c, count(*) AS cnt FROM hx GROUP BY r, c),
        |est AS (SELECT token, min(cnt) AS est_count
        |        FROM (SELECT DISTINCT token, r, c FROM hx) d JOIN cm USING (r, c)
        |        GROUP BY token),
        |ex AS (SELECT token, count(*) AS exact_count FROM tok GROUP BY token)
        |SELECT token, est_count, exact_count
        |FROM est JOIN ex USING (token)
        |ORDER BY est_count DESC, token LIMIT 20""".stripMargin,
    "q83_chunk" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks
        |           FROM documents),
        |c AS (SELECT doc_id, toks, len(toks) AS n,
        |        CASE WHEN len(toks) <= 64 THEN 1
        |             ELSE CAST(ceil((len(toks) - 64) / 48.0) AS BIGINT) + 1 END AS n_chunks
        |      FROM t)
        |SELECT doc_id, CAST(gs.i AS INTEGER) AS chunk_id,
        |  CAST(LEAST(64, n - gs.i * 48) AS INTEGER) AS n_chunk_tokens,
        |  array_to_string(toks[gs.i * 48 + 1 : gs.i * 48 + 64], ' ') AS chunk_text
        |FROM c, LATERAL (SELECT unnest(generate_series(0, n_chunks - 1)) AS i) gs
        |ORDER BY doc_id, chunk_id""".stripMargin,
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
    "q85_zorder" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  CAST(${zTermsSql("l_partkey", "l_suppkey")} AS BIGINT) AS z
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q86_hopping_window" ->
      """WITH b AS (SELECT ts, value,
        |    date_trunc('hour', ts)
        |      + (CAST(minute(ts) AS BIGINT) // 15) * INTERVAL 15 MINUTE AS bucket
        |  FROM events),
        |w AS (SELECT ts, value, bucket - o.o * INTERVAL 15 MINUTE AS window_start
        |      FROM b, (SELECT unnest(generate_series(0, 3)) AS o) o
        |      WHERE ts < bucket - o.o * INTERVAL 15 MINUTE + INTERVAL 60 MINUTE)
        |SELECT window_start, count(*) AS n_events,
        |  ROUND(sum(value), 6) AS total_value
        |FROM w GROUP BY window_start ORDER BY window_start""".stripMargin,
    "q87_bigram_logprob" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bgs AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 2
        |    THEN [array_to_string(t[i:i+1], ' ') FOR i IN generate_series(1, len(t)-1)]
        |    ELSE [array_to_string(t, ' ')] END) AS bigram FROM toks),
        |bg AS (SELECT doc_id, bigram FROM bgs
        |       WHERE len(string_split(bigram, ' ')) = 2),
        |c AS (SELECT bigram, count(*) AS bf, string_split(bigram, ' ')[1] AS w1
        |      FROM bg GROUP BY bigram),
        |p AS (SELECT w1, CAST(sum(bf) AS BIGINT) AS pf FROM c GROUP BY w1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  ROUND(avg(ln(CAST(bf AS DOUBLE) / CAST(pf AS DOUBLE))), 6) AS avg_logprob
        |FROM bg JOIN c USING (bigram) JOIN p USING (w1)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q40_ann_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cb AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS list_id, v AS c
        |       FROM (SELECT vec_id, v,
        |               CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |             FROM e ORDER BY h, vec_id LIMIT 8)),
        |ca AS (SELECT e.vec_id, e.v, cb.list_id,
        |         row_number() OVER (PARTITION BY e.vec_id
        |           ORDER BY ROUND(list_cosine_similarity(e.v, cb.c), 6) DESC, cb.list_id)
        |           AS crank
        |       FROM e CROSS JOIN cb),
        |corpus AS (SELECT vec_id AS neighbor_id, v, list_id FROM ca WHERE crank = 1),
        |probes AS (SELECT vec_id AS query_id, v AS q, list_id
        |           FROM ca WHERE crank <= 4 AND vec_id < 10),
        |cand AS (SELECT p.query_id, c.neighbor_id,
        |           ROUND(list_cosine_similarity(p.q, c.v), 6) AS cos
        |         FROM probes p JOIN corpus c USING (list_id)
        |         WHERE c.neighbor_id <> p.query_id),
        |r AS (SELECT query_id, neighbor_id, cos,
        |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
        |             AS INTEGER) AS rank
        |      FROM cand)
        |SELECT query_id, rank, neighbor_id, cos AS cosine
        |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
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
    "q63_hash_split" ->
      s"""WITH b AS (SELECT doc_id,
        |    ${md5l("CAST(doc_id AS VARCHAR)")} % 100 AS bucket FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
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
    // q72: global-window rendering of the distributed prefix sum —
    // identical running totals, shards cut where a doc's START offset
    // crosses a budget boundary.
    "q72_shard_pack" ->
      s"""WITH t AS (SELECT doc_id,
        |         CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens,
        |         ${md5l("CAST(doc_id AS VARCHAR)")} AS h
        |       FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |        sum(n_tokens) OVER (ORDER BY h, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM t)
        |SELECT doc_id, n_tokens,
        |  CAST((cum - n_tokens) // 10000 AS INTEGER) AS shard_id
        |FROM c ORDER BY doc_id""".stripMargin,
    "q73_unigram_logprob" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
        |             FROM documents),
        |c AS (SELECT token, count(*) AS tf FROM tok GROUP BY token),
        |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS total FROM c)
        |SELECT doc_id, count(*) AS n_tokens,
        |  ROUND(avg(ln(CAST(tf AS DOUBLE) / CAST(total AS DOUBLE))), 6) AS avg_logprob
        |FROM tok JOIN c USING (token) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q65_token_histogram" ->
      """WITH n AS (SELECT len(regexp_split_to_array(text, '\s+')) AS n_tokens
        |           FROM documents)
        |SELECT CAST(LEAST(FLOOR(n_tokens / 50.0), 9) AS INTEGER) AS bucket,
        |  count(*) AS n_docs,
        |  CAST(min(n_tokens) AS INTEGER) AS min_tokens,
        |  CAST(max(n_tokens) AS INTEGER) AS max_tokens
        |FROM n GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q66_embedding_norms" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (SELECT vec_id, v,
        |        list_max(list_transform(v, x -> abs(x))) AS max_abs FROM e)
        |SELECT vec_id,
        |  ROUND(sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')), 6)
        |    AS l2_norm,
        |  ROUND(max_abs, 6) AS max_abs,
        |  CASE WHEN max_abs = 0 THEN 0.0 ELSE
        |    ROUND(list_aggregate(list_transform(v,
        |        x -> pow(x - ROUND(x * 127 / max_abs) * max_abs / 127, 2)), 'sum')
        |      / len(v), 6) END AS int8_mse
        |FROM m ORDER BY vec_id""".stripMargin,
    "q67_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks)
        |SELECT doc_id,
        |  CAST(len(grams) AS INTEGER) AS n_shingles,
        |  CAST(len(list_distinct(grams)) AS INTEGER) AS n_distinct,
        |  ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
        |    AS repetition_ratio
        |FROM sh ORDER BY doc_id""".stripMargin,
    "q68_linear_count_distinct" ->
      s"""WITH b AS (SELECT DISTINCT ${md5l("CAST(user_id AS VARCHAR)")} % 4096 AS b
        |           FROM events WHERE user_id IS NOT NULL)
        |SELECT count(*) AS occupied_buckets,
        |  ROUND(-4096 * ln((4096 - count(*)) / 4096.0), 6) AS estimated_distinct
        |FROM b""".stripMargin,
    "q69_salted_join" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q70_stratified_sample" ->
      s"""SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE ${md5l("CAST(doc_id AS VARCHAR)")} % 100 <
        |  CASE WHEN lang = 'en' THEN 30 ELSE 80 END
        |ORDER BY doc_id""".stripMargin,
    "q26_ann_lsh" -> annLshOracle,
    "q74_embedding_dedup" -> embeddingDedupOracle,
    "q76_interval_join" ->
      """WITH g AS (SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w > INTERVAL 240 MINUTE THEN 1 ELSE 0 END AS ns
        |  FROM events WHERE event_type <> 'purchase'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM g),
        |iv AS (SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end
        |       FROM s GROUP BY user_id, sid)
        |SELECT p.event_id, p.user_id, p.ts, iv.session_start
        |FROM events p JOIN iv ON p.user_id = iv.user_id
        |  AND p.ts >= iv.session_start AND p.ts <= iv.session_end
        |WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,
    "q75_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.t_view
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        |      GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_view_click,
        |  (SELECT count(*) FROM p) AS n_full_funnel""".stripMargin,
    "q82_cap_groups_exact" ->
      s"""SELECT doc_id, lang, source, n_chars FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang
        |  ORDER BY ${md5l("CAST(doc_id AS VARCHAR)")}, doc_id) <= 100
        |ORDER BY doc_id""".stripMargin,
    "q128_cap_groups_tokens" ->
      s"""WITH t AS (SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |    ${md5l("CAST(doc_id AS VARCHAR)")} AS h
        |  FROM documents),
        |c AS (SELECT doc_id, lang, n_tokens,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM t)
        |SELECT doc_id, lang, n_tokens, cum_tokens FROM c
        |WHERE cum_tokens <= 5000 ORDER BY doc_id""".stripMargin,
    "q81_cap_groups" ->
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |k AS (SELECT lang, LEAST(1000000, 100000000 // n) AS ppm FROM c)
        |SELECT d.doc_id, d.lang, d.source, d.n_chars
        |FROM documents d JOIN k USING (lang)
        |WHERE ${md5l("CAST(d.doc_id AS VARCHAR)")} % 1000000 < k.ppm
        |ORDER BY d.doc_id""".stripMargin,
    "q80_quantize_int8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (SELECT vec_id, v,
        |        list_max(list_transform(v, x -> abs(x))) AS max_abs FROM e)
        |SELECT vec_id, CAST(gs.i - 1 AS INTEGER) AS dim,
        |  CAST(CASE WHEN max_abs = 0 THEN 0
        |       ELSE round(v[gs.i] * 127 / max_abs) END AS INTEGER) AS q,
        |  ROUND(max_abs, 6) AS max_abs
        |FROM m, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) gs
        |ORDER BY vec_id, dim""".stripMargin,
    "q79_skew_profile" ->
      """WITH c AS (SELECT user_id, count(*) AS n_rows FROM events
        |           WHERE user_id IS NOT NULL GROUP BY user_id),
        |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM c),
        |r AS (SELECT user_id, n_rows, total,
        |        CAST(row_number() OVER (ORDER BY n_rows DESC, user_id) AS INTEGER) AS rank
        |      FROM c CROSS JOIN t)
        |SELECT user_id, rank, n_rows,
        |  ROUND(CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
        |FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "q77_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |       ' +', ' ', 'g')) AS norm_text,
        |  CAST(length(trim(regexp_replace(regexp_replace(lower(text),
        |       '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS INTEGER) AS n_chars_norm,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |       ' +', ' ', 'g')) <> text AS changed
        |FROM documents ORDER BY doc_id""".stripMargin,
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
    "q32_fingerprint" ->
      s"""WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, text, CASE WHEN len(t) >= 3
        |  THEN [array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, len(t)-2)]
        |  ELSE [array_to_string(t, ' ')] END AS grams FROM toks),
        |g AS (SELECT doc_id, text, unnest(grams) AS g FROM sh)
        |SELECT doc_id, ${md5l("text")} AS text_hash,
        |  min(${md5l("g")}) AS min_shingle_hash
        |FROM g GROUP BY doc_id, text ORDER BY doc_id""".stripMargin,
    "q58_lang_centroids" ->
      """SELECT d.lang, CAST(gs.dim - 1 AS INTEGER) AS dim,
        |  count(*) AS n_docs,
        |  ROUND(AVG(CAST(e.embedding[gs.dim] AS DOUBLE)), 6) AS centroid_v
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id,
        |  LATERAL (SELECT unnest(generate_series(1, len(e.embedding))) AS dim) gs
        |GROUP BY d.lang, gs.dim ORDER BY d.lang, dim""".stripMargin,
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
    "q52_multimodal_frames" ->
      """SELECT doc_id, CAST(f.i AS INTEGER) AS frame_idx,
        |  CAST((f.i * octet_length(encode(text))) // 4 AS INTEGER) AS frame_offset,
        |  ascii(substr(text,
        |    CAST((f.i * octet_length(encode(text))) // 4 AS INTEGER) + 1, 1))
        |    AS frame_hash
        |FROM documents, (SELECT unnest(generate_series(0, 3)) AS i) f
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q51_session_window_builtin" ->
      """WITH g AS (SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM g)
        |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  COUNT(*) AS n_events, ROUND(SUM(value), 6) AS total_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
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
    "q43_pivot" ->
      """SELECT l_returnflag,
        |  sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f,
        |  sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q44_rank_windows" ->
      """SELECT user_id, event_id, value,
        |  CAST(row_number() OVER w AS INTEGER) AS rn,
        |  CAST(rank() OVER w AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
        |ORDER BY user_id, rn""".stripMargin,
    "q41_asof_attribution" ->
      """SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
        |  c.event_id AS click_id, c.ts AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY purchase_id""".stripMargin,
    "q42_percentiles" ->
      """SELECT event_type, count(*) AS n,
        |  ROUND(quantile_cont(value, 0.5), 6) AS med,
        |  ROUND(quantile_cont(value, 0.9), 6) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q37_vocab" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin,
    "q38_from_json" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(min(json_extract_string(props, '$.k') :: INTEGER) AS INTEGER) AS min_k,
        |  CAST(max(json_extract_string(props, '$.k') :: INTEGER) AS INTEGER) AS max_k,
        |  ROUND(avg(json_extract_string(props, '$.k') :: INTEGER), 6) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
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
    "q24_ann_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
        |s AS (SELECT query_id, neighbor_id, ROUND(list_cosine_similarity(qe, ce), 6) AS cos
        |      FROM q, c WHERE neighbor_id <> query_id),
        |r AS (SELECT query_id, neighbor_id, cos,
        |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
        |             AS INTEGER) AS rank
        |      FROM s)
        |SELECT query_id, rank, neighbor_id, cos AS cosine
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q27_centroids" ->
      """SELECT label, CAST(gs.dim - 1 AS INTEGER) AS dim,
        |  ROUND(AVG(CAST(embedding[gs.dim] AS DOUBLE)), 6) AS centroid_v
        |FROM embeddings,
        |  LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS dim) gs
        |GROUP BY label, gs.dim ORDER BY label, dim""".stripMargin,
    "q28_text_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  ROUND(avg(n_chars), 6) AS avg_chars,
        |  ROUND(avg(len(regexp_split_to_array(text, '\s+'))), 6) AS avg_tokens
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
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
        |FROM r ORDER BY doc_id""".stripMargin,
    "q31_langid" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(list_filter(toks, x -> x IN
        |    ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
        |    / len(toks) AS r
        |FROM t)
        |SELECT doc_id, ROUND(r, 6) AS en_stopword_ratio,
        |  CASE WHEN r >= 0.05 THEN 'en' ELSE 'unk' END AS predicted_lang
        |FROM m ORDER BY doc_id""".stripMargin,
    "q33_json_extract" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q34_sessionize" ->
      """WITH g AS (SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM g)
        |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  COUNT(*) AS n_events, ROUND(SUM(value), 6) AS total_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "q35_tumbling_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_start, COUNT(*) AS n_events,
        |  ROUND(SUM(value), 6) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q36_multimodal_decode" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  CAST(64 + octet_length(encode(text)) % 512 AS INTEGER) AS width,
        |  CAST(64 + ascii(substr(text, 1, 1)) % 512 AS INTEGER) AS height,
        |  3 AS channels
        |FROM documents ORDER BY doc_id""".stripMargin)
}
