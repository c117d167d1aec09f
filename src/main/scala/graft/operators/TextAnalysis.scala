package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{HashFamily, XxHash64Family}

/** Text-analysis operators for a training-data pipeline: token
  * counting, per-corpus stats, quality scoring, language-ID heuristic,
  * and document fingerprinting. All built-in expressions — each is a
  * single codegen'd projection or hash aggregate.
  */
object TextAnalysis {
  /** Whitespace tokenization (regex), robust to repeated whitespace. */
  def wsTokens(text: Column): Column = split(text, "\\s+")

  /** TRUE for documents dominated by a NO-SPACE script: CJK unified
    * ideographs + kana codepoints make up at least half of the
    * non-whitespace characters (exact integer compare, so the DuckDB
    * oracle replays the decision bit-for-bit). Whitespace tokenization
    * silently degrades to whole-line tokens on such text — this is the
    * routing predicate of [[scriptTokens]].
    */
  def isNoSpaceScript(text: Column): Column = {
    val noSpace = length(regexp_replace(text,
      "[^\\u3040-\\u30FF\\u4E00-\\u9FFF]", ""))
    val nonWs = length(regexp_replace(text, "\\s", ""))
    // the rlike guard short-circuits the two regexp_replace passes on
    // CJK-free text (codegen And evaluates lazily): any doc the
    // arithmetic rule accepts has >= 1 CJK char, so the guard is an
    // exact no-op on the decision — pure-Latin corpora pay one
    // char-class scan, not two full replaces
    text.rlike("[\\u3040-\\u30FF\\u4E00-\\u9FFF]") &&
      (nonWs > 0 && noSpace.cast("long") * 2 >= nonWs.cast("long"))
  }

  /** Script-aware tokenization: whitespace tokens for space-delimited
    * scripts, overlapping CHARACTER BIGRAMS (the standard CJK IR
    * fallback) for documents [[isNoSpaceScript]] flags — computed over
    * the whitespace-stripped text, single-character documents yielding
    * their one character. On pure space-delimited text this is
    * [[wsTokens]] bit-for-bit, so routing an operator through it
    * changes nothing on Latin-script corpora while un-degrading every
    * token statistic on CJK text.
    *
    * Implementation note: bigrams are a zip_with of two shifted char
    * slices (the `Dedup.shingles` pattern) — NOT
    * `transform(sequence(...), i => substr(s, i, 2))`, whose lambda
    * would re-run the whitespace strip once per bigram (the O(n²)
    * lambda trap). DuckDB mirror of the bigram list:
    * `[substr(s, i, 2) FOR i IN generate_series(1, greatest(length(s)-1, 1))]`.
    */
  def scriptTokens(text: Column): Column = {
    val stripped = regexp_replace(text, "\\s", "")
    // split on "" keeps a trailing empty string (Java split semantics)
    // — filter it so the char array is exactly the codepoints
    val chars = filter(split(stripped, ""), ch => length(ch) > 0)
    val m = size(chars) - 1
    val bigrams = zip_with(slice(chars, lit(1), m), slice(chars, lit(2), m),
      (a, b) => concat(a, b))
    when(isNoSpaceScript(text),
      when(size(chars) >= 2, bigrams)
        .otherwise(array(concat_ws("", chars))))
      .otherwise(wsTokens(text))
  }

  /** A small fixed English stopword list used by the quality and
    * language-ID heuristics. Deterministic and oracle-expressible.
    */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Per-document token counts: total, distinct, type-token ratio,
    * mean token length. Tokenization is [[scriptTokens]] — identical
    * to whitespace tokens on space-delimited text, character bigrams
    * on no-space scripts (q331 exercises the CJK route; q29's oracle
    * is unchanged because the testdata corpus is space-delimited).
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // project the token array ONCE: scriptTokens is no longer a cheap
    // split (three regexp passes + the bigram chain), six inline uses
    // would re-tokenize per use — the interpreted aggregate() HOF slot
    // is outside codegen subexpression elimination. CollapseProject
    // keeps the two selects apart (the alias is referenced repeatedly
    // and is non-cheap), so the array materializes once per row.
    val t = col("_t")
    docs.select(col(idCol), scriptTokens(col(textCol)).as("_t"))
      .select(
        col(idCol),
        size(t).as("n_tokens"),
        size(array_distinct(t)).as("n_distinct"),
        round(size(array_distinct(t)).cast("double") / size(t), 6).as("ttr"),
        round(aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t), 6)
          .as("mean_token_len"))
  }

  /** Corpus stats per (lang, source): volume, char and token means. */
  def textStats(docs: DataFrame): DataFrame =
    docs.groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        round(avg(col("n_chars")), 6).as("avg_chars"),
        round(avg(size(wsTokens(col("text")))), 6).as("avg_tokens"))
      .orderBy("lang", "source")

  /** Document quality score — the standard cheap heuristics (length,
    * stopword ratio, type-token ratio) combined into one bounded score.
    * Weights are arbitrary but fixed; the value of the operator is the
    * shape (pure projection, no shuffle), not the constants.
    */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = wsTokens(col(textCol))
    val nTok = size(t)
    val stopRatio = size(filter_function_alias(t)).cast("double") / nTok
    val ttr = size(array_distinct(t)).cast("double") / nTok
    val lenScore = least(nTok.cast("double") / 100.0, lit(1.0))
    docs.select(
      col(idCol),
      round(stopRatio, 6).as("stopword_ratio"),
      round(ttr, 6).as("ttr"),
      round(lenScore, 6).as("length_score"),
      round(lit(0.4) * lenScore + lit(0.3) * stopRatio + lit(0.3) * ttr, 6)
        .as("quality_score"))
  }

  private def filter_function_alias(t: Column): Column =
    filter(t, x => x.isin(Stopwords: _*))

  /** N-gram/stopword language-ID heuristic: stopword density says
    * "looks English"; otherwise unknown. (The testdata's `lang` labels
    * are synthetic and uncorrelated with the text, so this is graded as
    * an operator shape, with its own golden spec — not against labels.)
    */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = wsTokens(col(textCol))
    val stopRatio = size(filter_function_alias(t)).cast("double") / size(t)
    docs.select(
      col(idCol),
      round(stopRatio, 6).as("en_stopword_ratio"),
      when(stopRatio >= 0.05, lit("en")).otherwise(lit("unk")).as("predicted_lang"))
  }

  /** C4-style corpus cleaning report — the composed keep/drop decision
    * a pre-training pipeline runs over every document: length floor,
    * stopword-density floor (the langID rule), type-token-ratio floor,
    * applied in FIXED precedence so each dropped doc carries exactly
    * one reason (the standard way cleaning pipelines report attrition
    * per rule). Thresholds are parameters; the shape is the point:
    * one pure codegen projection over the corpus, no shuffle — at
    * 100 TB this runs at scan speed. Rules compare the ROUNDED (6dp)
    * ratios so the keep/drop cut is cross-engine exact.
    *
    * Output: (id, n_tokens, stopword_ratio, ttr, drop_reason, keep).
    */
  def cleanCorpus(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 10, minStopRatio: Double = 0.05,
      minTtr: Double = 0.2): DataFrame = {
    val t = wsTokens(col(textCol))
    val nTok = size(t)
    docs.select(
      col(idCol),
      nTok.as("n_tokens"),
      round(size(filter_function_alias(t)).cast("double") / nTok, 6)
        .as("stopword_ratio"),
      round(size(array_distinct(t)).cast("double") / nTok, 6).as("ttr"))
      .withColumn("drop_reason",
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("stopword_ratio") < minStopRatio, "low_stopword")
          .when(col("ttr") < minTtr, "low_ttr")
          .otherwise("kept"))
      .withColumn("keep",
        when(col("drop_reason") === "kept", 1).otherwise(0))
  }

  /** TF-IDF scoring: explode tokens → per-(doc, token) TF hash
    * aggregate → document-frequency join → score. The top-`k` terms
    * per document are ranked on the ROUNDED score (6dp) with a token
    * tie-break, so cross-engine ranking is deterministic.
    *
    * Scale: two hash aggregates + one join on token (the DF table is
    * vocabulary-sized → broadcast); per-doc ranking shuffles (doc)
    * partitions. No collect, no per-doc loops.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    // Corpus size N folded INTO the plan as a broadcast 1-row aggregate
    // (an eager docs.count() here would run a full extra job at query
    // CONSTRUCTION time, before the real plan executes). The count(*)
    // scan reads no columns — parquet footer metadata only.
    val nDocs = docs.agg(count(lit(1)).cast("double").as("_n_docs"))
    val tf = docs
      .select(col(idCol).as("doc"), explode(split(col(textCol), " ")).as("token"))
      .groupBy("doc", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(countDistinct(col("doc")).as("df"))
    val scored = tf.join(broadcast(df), Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(col("tf") * log(col("_n_docs") / col("df")), 6))
      .drop("_n_docs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy(col("tfidf").desc, col("token"))
    scored.withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= k)
      .select(col("doc").as(idCol), col("term_rank"), col("token"), col("tfidf"))
      .orderBy(idCol, "term_rank")
  }

  /** Canonical text normalization — the cleanup pass that runs before
    * any hash-based dedup so that trivially-different copies (case,
    * punctuation, whitespace) collide: lowercase, strip
    * non-alphanumerics to spaces, collapse whitespace runs, trim.
    * Pure codegen projection, no shuffle; `changed` flags rows whose
    * bytes moved (the usual monitoring metric for a cleanup pass).
    */
  def normalize(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " "), " +", " "))
    docs.select(
      col(idCol),
      norm.as("norm_text"),
      length(norm).as("n_chars_norm"),
      (norm =!= col(textCol)).as("changed"))
  }

  /** Corpus-conditional unigram log-probability — the cheapest
    * language-model quality proxy: score(doc) = mean over its tokens of
    * ln P(token), with P estimated from the corpus itself (tf / total
    * tokens). Low scores flag documents full of tokens the corpus has
    * never seen (noise, wrong language, mojibake); it is the 1-gram end
    * of the perplexity-filter family every pre-training pipeline runs.
    *
    * Scale shape: vocabulary counts are a hash aggregate (bounded by
    * vocab size, not corpus size) and broadcast back over the token
    * stream; the corpus total folds in as a 1-row broadcast aggregate —
    * in-plan, no eager job. Per-document mean is one map-side-partial
    * aggregate. Nothing corpus-sized shuffles.
    */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc"),
      explode(wsTokens(col(textCol))).as("token"))
    val counts = tok.groupBy("token").agg(count(lit(1)).as("tf"))
    val total = counts.agg(sum(col("tf")).as("_total"))
    tok.join(broadcast(counts), Seq("token"))
      .crossJoin(broadcast(total))
      // nano-nat quantization per position (the q148 rule): the mean
      // assembles from an exact integer sum, order-invariant
      .withColumn("term_nano",
        floor(log(col("tf").cast("double") / col("_total").cast("double"))
          * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col("doc").as(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("term_nano")).as("_sum_nano"))
      .select(col(idCol), col("n_tokens"),
        round((col("_sum_nano").cast("double") / lit(1e9))
          / col("n_tokens"), 6).as("avg_logprob"))
      .orderBy(idCol)
  }

  /** Conditional bigram log-probability — the 2-gram member of the
    * perplexity-filter family (`unigramLogProb` is the 1-gram end):
    * score(doc) = mean over its bigrams (w1 w2) of ln P(w2 | w1), with
    * P(w2|w1) = count(w1 w2) / count(w1 ·) estimated from the corpus
    * itself. Sharper than the unigram score at flagging scrambled or
    * machine-mangled text, whose words are individually common but
    * whose transitions are not. Documents with fewer than two tokens
    * have no bigrams and drop out (same contract as pair-based dedup).
    *
    * Scale shape: bigram counts are a hash aggregate; unlike the
    * unigram vocabulary they are NOT bounded by a dictionary, so the
    * count and prefix tables join back by plain equi-join (AQE may
    * still broadcast them at small scale) rather than a forced
    * broadcast. Everything else is map-side + one per-doc aggregate.
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = docs
      .select(col(idCol).as("doc"), explode(Dedup.shingles(col(textCol), 2)).as("bigram"))
      // shingles() emits a whole-text sentinel for docs shorter than k;
      // a 1-token doc has no bigram, so drop the 1-word sentinel
      .filter(size(split(col("bigram"), " ")) === 2)
    val counts = bg.groupBy("bigram").agg(count(lit(1)).as("bf"))
      .withColumn("w1", element_at(split(col("bigram"), " "), 1))
    val prefix = counts.groupBy("w1").agg(sum(col("bf")).as("pf"))
    bg.join(counts, Seq("bigram"))
      .join(prefix, Seq("w1"))
      // each position's log term is a deterministic function of two
      // exact integer counts — quantized to integer nano-nats at birth
      // so the per-doc mean assembles from an order-invariant exact
      // integer sum (the q148 rule; a plain avg of doubles varies with
      // partition layout and can flip the 6dp rounding)
      .withColumn("term_nano",
        floor(log(col("bf").cast("double") / col("pf").cast("double"))
          * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col("doc").as(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("term_nano")).as("_sum_nano"))
      .select(col(idCol), col("n_bigrams"),
        round((col("_sum_nano").cast("double") / lit(1e9))
          / col("n_bigrams"), 6).as("avg_logprob"))
      .orderBy(idCol)
  }

  /** Interpolated trigram LM scoring — the KenLM-style perplexity
    * quality filter: every position i≥3 scores
    * ln(λ3·P(w₃|w₁w₂) + λ2·P(w₃|w₂) + λ1·P(w₃)), corpus-trained, and a
    * document's mean log-probability is the filter signal (low = the
    * corpus LM finds the text surprising — OCR noise, lorem, key-mash;
    * suspiciously high = boilerplate the corpus has memorized).
    * Interpolation (Jelinek–Mercer smoothing) keeps positions whose
    * trigram is unseen *in context* finite via the bigram/unigram
    * backoff mass.
    *
    * Scale shape: three count tables (unigram/bigram/trigram) are hash
    * aggregates with map-side partials; scoring is five vocabulary-
    * keyed equi-joins — no broadcast of anything corpus-derived, the
    * single-row token total rides a broadcast cross join. Cross-engine
    * float discipline: every position's probability is a deterministic
    * rational of exact integer counts evaluated in one fixed expression
    * order, its log quantized to integer nano-nats at birth (the q148
    * rule), so the per-doc mean assembles from an exact integer sum.
    *
    * Output per doc with ≥1 trigram: (id, n_trigrams, avg_logprob).
    */
  def trigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tg = docs
      .select(col(idCol).as("doc"),
        explode(Dedup.shingles(col(textCol), 3)).as("trigram"))
      // drop the whole-text sentinel shingles() emits for short docs
      .filter(size(split(col("trigram"), " ")) === 3)
      .select(col("doc"), col("trigram"),
        element_at(split(col("trigram"), " "), 1).as("w1"),
        element_at(split(col("trigram"), " "), 2).as("w2"),
        element_at(split(col("trigram"), " "), 3).as("w3"))
    // count tables are vocabulary-sized and feed joins against the
    // frame they derive from — materialize once (the self-join-fed
    // rule), so scoring re-reads counts, not the corpus. The three
    // count passes are independent corpus scans — their checkpoints
    // overlap (independent-job rule) instead of serializing the
    // query's three dominant jobs.
    val uniRef = new java.util.concurrent.atomic.AtomicReference[DataFrame]()
    val bgRef = new java.util.concurrent.atomic.AtomicReference[DataFrame]()
    val triRef = new java.util.concurrent.atomic.AtomicReference[DataFrame]()
    graft.engine.Par.inParallel(
      () => uniRef.set(docs.select(explode(Dedup.tokens(col(textCol))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("uf"))
        .localCheckpoint()),
      () => bgRef.set(docs
        .select(explode(Dedup.shingles(col(textCol), 2)).as("bigram"))
        .filter(size(split(col("bigram"), " ")) === 2)
        .groupBy("bigram").agg(count(lit(1)).as("bf"))
        .localCheckpoint()),
      () => triRef.set(tg.groupBy("trigram").agg(count(lit(1)).as("tf"))
        .localCheckpoint()))
    val uni = uniRef.get
    val bg = bgRef.get
    val tri = triRef.get
    val nTokens = uni.agg(sum(col("uf")).as("n_tokens"))
    // λ3·tf/c(w1w2) + λ2·c(w2w3)/c(w2) + λ1·c(w3)/N — one fixed
    // left-associated expression order on both engines
    val p = (lit(0.6) * col("tf") / col("bfp")) +
      (lit(0.3) * col("bfs") / col("uf2")) +
      (lit(0.1) * col("uf3") / col("n_tokens"))
    tg.join(tri, Seq("trigram"))
      .join(bg.select(col("bigram"), col("bf").as("bfp")),
        concat(col("w1"), lit(" "), col("w2")) === col("bigram"))
      .drop("bigram")
      .join(bg.select(col("bigram"), col("bf").as("bfs")),
        concat(col("w2"), lit(" "), col("w3")) === col("bigram"))
      .join(uni.select(col("w").as("w2"), col("uf").as("uf2")), Seq("w2"))
      .join(uni.select(col("w").as("w3"), col("uf").as("uf3")), Seq("w3"))
      .crossJoin(broadcast(nTokens))
      .withColumn("term_nano",
        floor(log(p) * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col("doc").as(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(col("term_nano")).as("_sum_nano"))
      .select(col(idCol), col("n_trigrams"),
        round((col("_sum_nano").cast("double") / lit(1e9))
          / col("n_trigrams"), 6).as("avg_logprob"))
      .orderBy(idCol)
  }

  /** BPE-style regex pre-tokenization profile: the `\w+ | digits |
    * single punctuation` split every subword tokenizer applies before
    * merges, with per-class counts and the subtoken-to-word ratio
    * (fertility) — the number a tokenizer-budget planner actually
    * wants per corpus slice. Pure projection, no shuffle; the regex
    * avoids lookarounds so the same pattern runs identically on Java
    * and RE2-family engines.
    */
  def regexTokenProfile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
    val bound = docs.select(
      col(idCol),
      regexp_extract_all(col(textCol), lit(pattern), lit(0)).as("_sub"),
      size(wsTokens(col(textCol))).as("n_ws_tokens"))
    bound.select(
      col(idCol),
      col("n_ws_tokens"),
      size(col("_sub")).as("n_subtokens"),
      size(filter(col("_sub"), x => x.rlike("^[A-Za-z]+$"))).as("n_word"),
      size(filter(col("_sub"), x => x.rlike("^[0-9]+$"))).as("n_number"),
      (size(col("_sub"))
        - size(filter(col("_sub"), x => x.rlike("^[A-Za-z]+$")))
        - size(filter(col("_sub"), x => x.rlike("^[0-9]+$")))).as("n_punct"),
      round(size(col("_sub")).cast("double") / col("n_ws_tokens"), 6)
        .as("fertility"))
      .orderBy(idCol)
  }

  /** Within-document repetition (a Gopher-style quality signal): the
    * fraction of k-word shingles that repeat an earlier shingle — high
    * values flag boilerplate / looping generations, one of the standard
    * pre-training filters. Pure projection, no shuffle.
    */
  def repetition(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val sh = Dedup.shingles(col(textCol), k)
    docs.select(
      col(idCol),
      size(sh).as("n_shingles"),
      size(array_distinct(sh)).as("n_distinct"),
      round(lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh), 6)
        .as("repetition_ratio"))
  }

  /** Pattern scrubbing — the PII/policy redaction pass of a training
    * pipeline: each (name, regex, replacement) rule is applied in order
    * (order matters: URLs before digit runs, or the run inside a URL is
    * masked first), with per-rule match counts taken on the ORIGINAL
    * text and a `changed` flag. Pure codegen projection, no shuffle;
    * patterns avoid lookarounds so the same regex runs identically on
    * Java and RE2-family engines.
    */
  def scrub(docs: DataFrame, idCol: String, textCol: String,
      rules: Seq[(String, String, String)]): DataFrame = {
    val scrubbed = rules.foldLeft(col(textCol)) {
      case (c, (_, p, r)) => regexp_replace(c, p, r)
    }
    val counts = rules.map { case (name, p, _) =>
      size(regexp_extract_all(col(textCol), lit(p), lit(0))).as(s"n_$name")
    }
    docs.select(
      (col(idCol) +: scrubbed.as("scrubbed_text") +: counts)
        :+ (scrubbed =!= col(textCol)).as("changed"): _*)
      .orderBy(idCol)
  }

  /** Linear (fastText-style) quality scoring — the model-based filter
    * stage: a broadcast bag-of-words weight table is joined onto the
    * token stream, summed per document, and squashed through a
    * sigmoid; `keep` is the threshold decision. The weights here are
    * whatever a trained classifier exported — the engine only supplies
    * the plumbing (OOV tokens score 0 via the left join's coalesce).
    *
    * Determinism discipline: a raw double sum over tokens would vary
    * with partitioning/retry order, making the keep decision
    * non-idempotent across reruns — so weights are floored once to
    * integer ppm on the (tiny) weight table and summed exactly; the
    * sigmoid runs once per document on the exact sum. `keep` is
    * decided on the exact integer sum (sigmoid is monotone, so
    * p ≥ 0.5 ⟺ sum ≥ 0 when bias = 0), never on the rounded float.
    *
    * Scale shape: weight table broadcast (vocab-bounded), token stream
    * never shuffles for the join, one map-side-partial aggregate per
    * document.
    */
  def linearQualityScore(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame /* (token, weight: Double) */): DataFrame = {
    val wPpm = weights.select(col("token"),
      floor(col("weight") * lit(1000000.0)).as("_w_ppm"))
    val toks = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("token"))
    toks.join(broadcast(wPpm), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("_w_ppm"), lit(0L))).as("_sw"))
      .select(col(idCol), col("n_tokens"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(col("_sw").cast("double") / lit(1000000.0)
            / col("n_tokens").cast("double")))), 6).as("p_keep"),
        (col("_sw") >= 0L).as("keep"))
  }

  /** Deterministic token masking — the MLM/span-corruption prep step:
    * each token position is masked iff hash(doc_id:position) lands
    * under the rate, so the mask pattern is a pure function of the
    * document (reproducible across reruns/partitionings, stable as the
    * corpus grows — the same discipline as `Sampling.split`, applied
    * per position). Pure map-side projection, no shuffle; the mask
    * count is derived from the same hash test, never by matching the
    * mask token text (a document containing the literal mask string
    * can't skew it).
    */
  def maskTokens(docs: DataFrame, idCol: String, textCol: String,
      ratePct: Int = 15, maskTok: String = "<MASK>",
      hashes: HashFamily = XxHash64Family): DataFrame = {
    require(ratePct >= 0 && ratePct <= 100, "ratePct in [0,100]")
    def hit(i: Column): Column =
      pmod(hashes.hash(concat(col(idCol).cast("string"), lit(":"),
        i.cast("string"))), lit(100L)) < ratePct
    val toks = split(col(textCol), " ")
    docs.select(col(idCol), toks.as("_t"))
      .select(col(idCol),
        size(col("_t")).as("n_tokens"),
        size(filter(sequence(lit(0), size(col("_t")) - 1), i => hit(i)))
          .as("n_masked"),
        array_join(transform(col("_t"),
          (t, i) => when(hit(i), lit(maskTok)).otherwise(t)), " ")
          .as("masked_text"))
      .orderBy(idCol)
  }

  /** Deterministic SPAN corruption — the T5-style variant of
    * `maskTokens`: a span STARTS at position i iff hash(doc:i:s) lands
    * under the rate, and covers the next `spanLen` tokens; every
    * covered token is replaced. Same purity guarantee (the corruption
    * pattern is a function of the document alone), same map-side
    * shape. Emitted per doc: token/span/masked counts and the
    * corrupted text (one mask token per covered position; collapsing
    * each span to a single numbered sentinel is a trivial post-pass).
    */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
      ratePct: Int = 5, spanLen: Int = 3, maskTok: String = "<X>",
      hashes: HashFamily = XxHash64Family): DataFrame = {
    require(ratePct >= 0 && ratePct <= 100, "ratePct in [0,100]")
    require(spanLen >= 1, "spanLen >= 1")
    def start(i: Column): Column =
      pmod(hashes.hash(concat(col(idCol).cast("string"), lit(":"),
        i.cast("string"), lit(":s"))), lit(100L)) < ratePct
    // the start bitmap is hashed ONCE and bound as an array column;
    // coverage is then spanLen array lookups, not spanLen re-hashes
    // (the hash is the expensive part — md5 for the oracle family)
    def covered(i: Column): Column =
      (0 until spanLen).map(o =>
        when(i - o >= 0, element_at(col("_s"), i - o + 1)).otherwise(lit(false)))
        .reduce(_ || _)
    val toks = split(col(textCol), " ")
    docs.select(col(idCol), toks.as("_t"))
      .withColumn("_s",
        transform(sequence(lit(0), size(col("_t")) - 1), i => start(i)))
      .select(col(idCol),
        size(col("_t")).as("n_tokens"),
        size(filter(col("_s"), b => b)).as("n_spans"),
        size(filter(sequence(lit(0), size(col("_t")) - 1), i => covered(i)))
          .as("n_masked"),
        array_join(transform(col("_t"),
          (t, i) => when(covered(i), lit(maskTok)).otherwise(t)), " ")
          .as("corrupted_text"))
      .orderBy(idCol)
  }

  /** Content-defined fingerprints: full-text hash (exact-dup key) and
    * the minimum rolling 3-shingle hash (a 1-perm MinHash — stable
    * under small appends). With `Md5Family` the values are DuckDB-
    * expressible, so the registered query carries a full SQL oracle.
    */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String,
      hashes: HashFamily = XxHash64Family): DataFrame =
    docs.select(
      col(idCol),
      hashes.hash(col(textCol)).as("text_hash"),
      array_min(transform(Dedup.shingles(col(textCol), 3), g => hashes.hash(g)))
        .as("min_shingle_hash"))

  /** One BPE training round at the word level: count every ADJACENT
    * token pair across the corpus and return the top-`k` merge
    * candidates — the statistic a distributed tokenizer trainer
    * recomputes each merge iteration (at the byte level the loop is
    * identical, only the initial alphabet differs).
    *
    * Scale shape: pairs are built map-side by zipping the token array
    * with its own 1-shifted slice (bound once — no lambda-trap
    * re-tokenization), counted by a hash aggregate with map-side
    * partial collapse, and the top-k is TakeOrdered (per-partition
    * heads), never a global sort of the pair vocabulary.
    */
  def bpeMergeCandidates(docs: DataFrame, textCol: String,
      k: Int = 50): DataFrame = {
    val t = Dedup.tokens(col(textCol))
    val pairs = when(size(t) >= 2,
      zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array())
    docs.select(explode(pairs).as("merge_pair"))
      .groupBy("merge_pair").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("merge_pair"))
      .limit(k)
  }

  /** Apply a learned merge table (`bpeMergeCandidates` output order =
    * rank order) to the corpus — the other half of word-level BPE:
    * each rule `(a, b)` rewrites every adjacent occurrence of tokens
    * a,b to the single token "a_b", rules applied strictly in rank
    * order (the standard BPE apply loop), left-to-right and
    * non-overlapping within a rule. Later rules may reference merged
    * forms, so multi-word units build up across ranks.
    *
    * Scale shape: the merge table is driver-small by construction
    * (top-k ranked rules) and broadcasts; application is a pure
    * mapPartitions projection — one pass per rule over each doc's
    * token array, O(rules × tokens), no shuffle. This is per-doc
    * imperative token surgery with data-dependent loop structure —
    * the documented `mapPartitions` exception, not expressible as
    * relational ops.
    *
    * Output: (id, text_bpe, n_tokens, n_tokens_bpe).
    */
  def applyBpeMerges(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mergesB = spark.sparkContext.broadcast(merges.toArray)
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rules = mergesB.value
        it.map { case (id, text) =>
          var toks = text.split(" ")
          rules.foreach { case (a, b) =>
            if (toks.length >= 2) {
              val out = Array.newBuilder[String]
              var i = 0
              while (i < toks.length) {
                if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
                  out += a + "_" + b; i += 2
                } else { out += toks(i); i += 1 }
              }
              toks = out.result()
            }
          }
          (id, toks.mkString(" "), text.split(" ").length, toks.length)
        }
      }
      .toDF(idCol, "text_bpe", "n_tokens", "n_tokens_bpe")
  }

  /** Per-doc quality-funnel flags (the q187 cuts): length → shingle
    * repetition → peak 2-gram concentration → char entropy, every cut
    * an exact-integer comparison (or a hash-verified 6dp signal
    * against a 6dp-representable threshold) so the funnel is
    * bit-stable cross-engine. One signal pass; the per-doc frames are
    * the q67/q166 shapes (per-key state bounded by doc length).
    */
  def funnelSignals(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val ent = charEntropy(docs, idCol, textCol)
      .select(col(idCol), col("entropy_nats"))
    val sh = Dedup.shingles(col(textCol), 3)
    val cov2 = docs
      .filter(size(wsTokens(col(textCol))) >= 2)
      .select(col(idCol), length(col(textCol)).as("_nc"),
        wsTokens(col(textCol)).as("_t"))
      .select(col(idCol), col("_nc"), explode(expr(
        "transform(sequence(1, size(_t) - 1)," +
          " i -> concat_ws(' ', slice(_t, i, 2)))")).as("gram"))
      .groupBy(col(idCol), col("_nc"), col("gram"))
      .agg(count(lit(1)).as("_cnt"))
      .groupBy(col(idCol), col("_nc"))
      .agg(max(col("_cnt") * length(col("gram"))).as("_cov2"))
    docs
      .select(col(idCol), length(col(textCol)).as("_nchars"),
        size(wsTokens(col(textCol))).as("_ntok"),
        size(sh).as("_ns"), size(array_distinct(sh)).as("_nd"))
      .join(cov2.select(col(idCol), col("_cov2")), Seq(idCol), "left")
      .join(ent, Seq(idCol), "left")
      .select(col(idCol),
        (col("_ntok") >= 24).as("f1"),
        ((col("_ns") - col("_nd")) * 50 <= col("_ns")).as("f2"),
        (coalesce(col("_cov2"), lit(0L)) * 8 <= col("_nchars")).as("f3"),
        (coalesce(col("entropy_nats"), lit(0.0)) >= 2.7).as("f4"))
  }

  /** The funnel's MERGEABLE form: one row of cumulative-pass counters
    * (exact integer sums of indicator products — folds across any
    * disjoint split of the corpus, the streaming-store shape).
    */
  def funnelCounts(signals: DataFrame): DataFrame = {
    val cnt = (c: Column) => sum(when(c, 1L).otherwise(0L))
    signals.agg(
      count(lit(1)).as("n0"),
      cnt(col("f1")).as("a1"),
      cnt(col("f1") && col("f2")).as("a2"),
      cnt(col("f1") && col("f2") && col("f3")).as("a3"),
      cnt(col("f1") && col("f2") && col("f3") && col("f4")).as("a4"))
  }

  /** Render a (possibly folded) counters row as the per-stage
    * keep/drop funnel report.
    */
  def funnelReport(counts: DataFrame): DataFrame =
    counts.selectExpr(
      """stack(4,
        | 1, 'length',     n0, n0 - a1, a1,
        | 2, 'repetition', a1, a1 - a2, a2,
        | 3, 'ngram_conc', a2, a2 - a3, a3,
        | 4, 'entropy',    a3, a3 - a4, a4)
        | AS (stage, filter, n_in, n_drop, n_out)""".stripMargin)
      .orderBy("stage")

  /** Iterative word-level BPE TRAINING (the loop [[bpeMergeCandidates]]
    * and [[applyBpeMerges]] are the two halves of): `nMerges` rounds of
    * take-the-top-pair → rewrite-the-corpus, exactly the Sennrich et
    * al. procedure at word granularity. Each round is one corpus pass
    * (a hash aggregate for the pair counts, a mapPartitions projection
    * for the rewrite); the driver holds only the 1-row argmax per
    * round (the Lloyd-trainer pattern) and the corpus iterates through
    * localCheckpoints so the plan stays one round deep.
    *
    * Ties break (count DESC, pair ASC) — deterministic cross-engine,
    * so the learned merge TABLE (not just its size) is
    * oracle-checkable.
    *
    * Output per round: (merge_rank, merge_pair, n_occurrences [the
    * adjacency count at selection time], n_tokens_after), ordered by
    * merge_rank.
    */
  def trainBpe(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int): DataFrame = {
    require(nMerges >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    var corpus = docs.select(col(idCol).as("_id"), col(textCol).as("_t"))
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Long, Long)]
    for (i <- 1 to nMerges) {
      val top = bpeMergeCandidates(corpus, "_t", k = 1).head() // 1 row
      val pair = top.getString(0)
      val cnt = top.getLong(1)
      val Array(a, b) = pair.split(" ", 2)
      val applied = applyBpeMerges(corpus, "_id", "_t", Seq((a, b)))
        .localCheckpoint()
      corpus = applied.select(col("_id"), col("text_bpe").as("_t"))
      val nAfter = applied.agg(sum(col("n_tokens_bpe"))).head().getLong(0)
      out += ((i, pair, cnt, nAfter))
    }
    out.toSeq
      .toDF("merge_rank", "merge_pair", "n_occurrences", "n_tokens_after")
      .orderBy("merge_rank")
  }

  /** BM25 ranked retrieval (Robertson–Spärck Jones / Okapi): top-`k`
    * corpus documents per probe query, scored
    *   Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the non-negative
    * Lucene variant. Scores round(_, 6) BEFORE ranking with a doc-id
    * tie-break, so cross-engine ranking is deterministic.
    *
    * Scale shape: corpus term frequencies and doc lengths are two hash
    * aggregates off one tokenize pass; `queries` is a probe set, so
    * everything query-sized is broadcast — query terms join the
    * vocabulary-sized DF table FIRST (shuffle), and only the surviving
    * probe-term DF rows (≤ |query terms|) broadcast into the inverted-
    * index join. Per-(query, doc) partials then take one grouped
    * aggregate and a per-query top-k window. The corpus never
    * broadcasts and is shuffled only by its own aggregate keys.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKTerms(docs, idCol, textCol,
      queries.select(col(queryIdCol).as("query_id"),
          explode(split(col(queryTextCol), " ")).as("token"))
        .distinct(),
      k, k1, b)

  /** [[bm25TopK]] over an explicit per-query TERM SET — (query_id,
    * token) rows instead of query text. The seam query-expansion
    * passes ([[rm3ExpandedTopK]]) rescore through: expansion changes
    * the term set, never the scoring chain.
    */
  def bm25TopKTerms(docs: DataFrame, idCol: String, textCol: String,
      qterms: DataFrame, k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val stats = docs.agg(
      count(lit(1)).cast("double").as("_n_docs"),
      avg(size(wsTokens(col(textCol)))).as("_avgdl"))
    val tf = docs
      .select(col(idCol).as("doc"), explode(split(col(textCol), " ")).as("token"))
      .groupBy("doc", "token").agg(count(lit(1)).as("tf"))
    val dl = docs.select(col(idCol).as("doc"),
      size(split(col(textCol), " ")).as("dl"))
    bm25ScoreTerms(tf, dl, stats, qterms, idCol, k, k1, b)
  }

  private def bm25ScoreTerms(tf: DataFrame, dl: DataFrame,
      stats: DataFrame, qterms: DataFrame, idCol: String, k: Int,
      k1: Double, b: Double): DataFrame =
    bm25ScoreTermsDf(tf, tf.groupBy("token").agg(count(lit(1)).as("df")),
      dl, stats, qterms, idCol, k, k1, b)

  /** The scoring half of [[bm25TopKTerms]] over prebuilt corpus
    * statistics — the seam multi-pass retrieval ([[rm3ExpandedTopK]])
    * shares so the corpus tokenizes ONCE, not once per pass.
    */
  private def bm25ScoreTermsDf(tf: DataFrame, df: DataFrame,
      dl: DataFrame, stats: DataFrame, qterms: DataFrame, idCol: String,
      k: Int, k1: Double, b: Double): DataFrame = {
    val qdf = qterms.join(df, Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("_n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
    // Probe-term filter FIRST (map-side broadcast semi-filter on the
    // big tf table), so the doc-length join's left side is already
    // query-bounded — AQE turns it into a broadcast join at runtime.
    // per-term contributions nano-quantize AT BIRTH and accumulate as
    // exact longs (the order-invariant-aggregate rule / q176 w_nano
    // precedent): a per-(query,doc) multi-term double sum's order is
    // unpinnable across engines, so round(sum(double),6) is the q148
    // failure class — one boundary-straddling score would flip the
    // hash on a testdata regeneration. The long sum is order-free;
    // ONE division converts back (nano sums ≤ ~1e11 « 2^53, exact).
    val partials = tf
      .join(broadcast(qdf), Seq("token"))
      .join(dl, Seq("doc"))
      .withColumn("contrib",
        round(lit(1e9) * (col("idf") * col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("_avgdl")))))
          .cast("long"))
    val scored = partials.groupBy("query_id", "doc")
      .agg(round(sum(col("contrib")).cast("double") / lit(1e9), 6).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("doc"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc").as(idCol), col("score"))
      .orderBy("query_id", "rank")
  }

  /** Pseudo-relevance-feedback query expansion (the RM3 recipe,
    * Lavrenko & Croft SIGIR 2001 relevance models as popularized in
    * Anserini/Pyserini): run the query, treat its top `fbDocs` hits
    * as relevant, weight each of their terms by
    * Σ over feedback docs of (tf(t,d)/dl(d)) · rsv(d) — the relevance
    * model estimate with the BM25 score as the document weight — add
    * the top `fbTerms` NEW terms to the query, and rescore. The
    * vocabulary-mismatch fix sparse retrieval ships with: a query
    * phrased differently from its relevant docs inherits their
    * wording.
    *
    * Determinism: per-(term, doc) weights quantize to integer nano at
    * birth (the order-invariant-aggregate rule — a 5-double sum's
    * order is unpinnable), so term weights are exact longs ranked with
    * token tie-breaks; both retrieval passes are the standard
    * 6dp-rounded BM25 rankings.
    *
    * Scale shape: pass 1 is [[bm25TopK]]; the feedback table is
    * |queries|·fbDocs rows (broadcast); term mining joins it
    * map-side against the tf table; pass 2 is [[bm25TopKTerms]] over
    * ≤ original+fbTerms terms per query. Nothing beyond the standard
    * BM25 joins ever materializes corpus-scale.
    *
    * Output: pass-2 (query_id, rank, idCol, score) top-k.
    */
  def rm3ExpandedTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int = 10, fbDocs: Int = 5, fbTerms: Int = 8,
      maxExpansionDfPct: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // corpus statistics built ONCE; tf/dl checkpoint because pass 1,
    // term mining, and pass 2 all read them (3 tokenize passes
    // otherwise). qt / tf / dl are independent passes — their
    // checkpoints overlap (independent-job rule)
    val qtRef = new java.util.concurrent.atomic.AtomicReference[DataFrame]()
    val tfRef = new java.util.concurrent.atomic.AtomicReference[DataFrame]()
    val dlRef = new java.util.concurrent.atomic.AtomicReference[DataFrame]()
    val statsRef = new java.util.concurrent.atomic.AtomicReference[DataFrame]()
    graft.engine.Par.inParallel(
      () => qtRef.set(queries
        .select(col(queryIdCol).as("query_id"),
          explode(split(col(queryTextCol), " ")).as("token"))
        .distinct()
        .localCheckpoint()), // feeds pass 1, the NOT-IN filter, and pass 2
      () => tfRef.set(docs
        .select(col(idCol).as("doc"), explode(split(col(textCol), " ")).as("token"))
        .groupBy("doc", "token").agg(count(lit(1)).as("tf"))
        .localCheckpoint()),
      () => dlRef.set(docs.select(col(idCol).as("doc"),
        size(split(col(textCol), " ")).as("dl"))
        .localCheckpoint()),
      // checkpointed like bm25TopKPruned's: left lazy it re-tokenizes
      // the corpus inside BOTH passes' broadcast subtrees
      () => statsRef.set(docs.agg(
        count(lit(1)).cast("double").as("_n_docs"),
        avg(size(wsTokens(col(textCol)))).as("_avgdl")).localCheckpoint()))
    val qt = qtRef.get
    val tf = tfRef.get
    val dl = dlRef.get
    val stats = statsRef.get
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
      .localCheckpoint() // both scoring passes read it
    val fb = bm25ScoreTermsDf(tf, df, dl, stats, qt, idCol, fbDocs, k1, b)
      .select(col("query_id"), col(idCol).as("doc"), col("score"))
      .localCheckpoint() // |queries|·fbDocs rows — the broadcast seam
    val weights = tf.join(broadcast(fb), Seq("doc")).join(dl, Seq("doc"))
      .withColumn("_w_nano",
        round(lit(1e9) * ((col("tf").cast("double") / col("dl").cast("double"))
          * col("score"))).cast("long"))
      .groupBy("query_id", "token").agg(sum("_w_nano").as("w_nano"))
    // df cap on expansion candidates (exact-integer compare): the
    // relevance model loves high-(tf/dl) near-stopwords whose postings
    // are corpus-sized — without the cap, pass-2 cost per query grows
    // with df(expansion) ~ N and the ScaleProbe curve goes 10x the
    // single-pass text query. Capping df at maxExpansionDfPct% keeps
    // the informative mid-df terms (standard RM3 practice) and bounds
    // pass-2 postings at the cap.
    // corpus doc count off the stats checkpoint (exact: _n_docs is a
    // count cast to double, < 2^53) — not another corpus scan
    val nd = stats.select(col("_n_docs").cast("long").as("_nd"))
    val expansion = weights
      .join(df.select(col("token"), col("df").as("_df")), Seq("token"))
      .crossJoin(broadcast(nd))
      .filter(col("_df") * 100 <= lit(maxExpansionDfPct.toLong) * col("_nd"))
      .join(qt, Seq("query_id", "token"), "left_anti") // NEW terms only
      .withColumn("_er", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("w_nano").desc, col("token"))))
      .filter(col("_er") <= fbTerms)
      .select("query_id", "token")
    val qt2 = qt.unionByName(expansion).distinct().localCheckpoint()
    bm25ScoreTermsDf(tf, df, dl, stats, qt2, idCol, k, k1, b)
  }

  /** Impact-ordered static index pruning (Carmel et al., SIGIR 2001)
    * for BM25 top-k — the flat-latency scale path exact BM25 cannot
    * offer: a token's postings grow with its document frequency
    * (∝ corpus), so exact query cost is linear in N (SCALING.md's
    * text_index_query curve). Keeping only each token's top-`topM`
    * postings by IMPACT — the doc-dependent BM25 factor
    * tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)), which orders a token's
    * docs exactly as their score contribution would — bounds per-term
    * query work at topM rows regardless of corpus size. Pruning is
    * lossy at the tail (a doc accumulating many small contributions
    * can drop out of the top-k), so the operator returns the
    * per-query RECALL REPORT against the exact ranking (the
    * q129/q282 certification pattern): the accuracy trade is a
    * hash-verified number, not a faith claim.
    *
    * Scale shape: the prune is ONE window over the (doc, token) tf
    * table partitioned by token; the rank ≤ topM filter plans a
    * WindowGroupLimit (PlanSpec), so each map task forwards at most
    * topM rows per token below the shuffle — the prune itself scales
    * like a scan. Both rankings share one tokenize pass; df/idf come
    * from the FULL corpus (pruning changes candidates, never term
    * statistics); everything query-sized broadcasts. Impact and
    * scores round to 6dp before ranking with doc-id tie-breaks, the
    * cross-engine determinism convention.
    *
    * Output: (query_id, n_full, n_pruned, n_overlap, recall) per
    * probe query with ≥1 exact result; recall = overlap/n_full @6dp.
    */
  def bm25TopKPruned(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, topM: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // stats / tf / dl are three independent passes over docs — their
    // checkpoints overlap (independent-job rule) instead of serializing
    val statsRef = new java.util.concurrent.atomic.AtomicReference[DataFrame]()
    val tfRef = new java.util.concurrent.atomic.AtomicReference[DataFrame]()
    val dlRef = new java.util.concurrent.atomic.AtomicReference[DataFrame]()
    graft.engine.Par.inParallel(
      () => statsRef.set(docs.agg(
        count(lit(1)).cast("double").as("_n_docs"),
        avg(size(wsTokens(col(textCol)))).as("_avgdl")).localCheckpoint()),
      () => tfRef.set(docs
        .select(col(idCol).as("doc"), explode(split(col(textCol), " ")).as("token"))
        .groupBy("doc", "token").agg(count(lit(1)).as("tf"))
        .localCheckpoint()), // feeds the prune window AND both scorings
      () => dlRef.set(docs.select(col(idCol).as("doc"),
        size(split(col(textCol), " ")).as("dl")).localCheckpoint()))
    val stats = statsRef.get
    val tf = tfRef.get
    val dl = dlRef.get
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val qterms = queries
      .select(col(queryIdCol).as("query_id"),
        explode(split(col(queryTextCol), " ")).as("token"))
      .distinct()
    val qdf = qterms.join(df, Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("_n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .localCheckpoint() // broadcast into both scorings
    def topk(postings: DataFrame): DataFrame = {
      // nano-quantized long accumulation — see bm25ScoreTermsDf
      val partials = postings
        .join(broadcast(qdf), Seq("token"))
        .join(dl, Seq("doc"))
        .withColumn("contrib",
          round(lit(1e9) * (col("idf") * col("tf") * (lit(k1) + 1.0) /
            (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("_avgdl")))))
            .cast("long"))
      val scored = partials.groupBy("query_id", "doc")
        .agg(round(sum(col("contrib")).cast("double") / lit(1e9), 6).as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("score").desc, col("doc"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("query_id", "doc")
    }
    val prunedPostings = impactPrune(tf, dl, stats, topM, k1, b)
    // the exact and pruned rankings read only the checkpointed
    // tf/dl/stats/qdf — no dependency between them, so their two
    // scoring checkpoints overlap (independent-job rule) instead of
    // serializing the query's two dominant jobs
    val fullRef = new java.util.concurrent.atomic.AtomicReference[DataFrame]()
    val prunedRef = new java.util.concurrent.atomic.AtomicReference[DataFrame]()
    graft.engine.Par.inParallel(
      () => fullRef.set(topk(tf).localCheckpoint()), // feeds count + overlap join
      () => prunedRef.set(topk(prunedPostings).localCheckpoint()))
    val full = fullRef.get
    val pruned = prunedRef.get
    val nFull = full.groupBy("query_id").agg(count(lit(1)).as("n_full"))
    val nPruned = pruned.groupBy("query_id").agg(count(lit(1)).as("n_pruned"))
    val overlap = full.join(pruned, Seq("query_id", "doc"))
      .groupBy("query_id").agg(count(lit(1)).as("n_overlap"))
    nFull.join(nPruned, Seq("query_id"), "left")
      .join(overlap, Seq("query_id"), "left")
      .select(col("query_id"), col("n_full"),
        coalesce(col("n_pruned"), lit(0L)).as("n_pruned"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        round(coalesce(col("n_overlap"), lit(0L)).cast("double")
          / col("n_full"), 6).as("recall"))
      .orderBy("query_id")
  }

  /** The prune at [[bm25TopKPruned]]'s core, standalone — per-token
    * top-`topM` postings by 6dp-rounded impact (doc tie-break),
    * returned as (doc, token, tf). Useful on its own: persist the
    * pruned postings as the serving tier of a text index whose query
    * cost is bounded by terms × topM, independent of corpus size. One
    * token-partitioned window; the rank filter plans a
    * WindowGroupLimit (PlanSpec), so map tasks forward at most topM
    * rows per token below the shuffle.
    */
  def impactPrunedPostings(docs: DataFrame, idCol: String, textCol: String,
      topM: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val stats = docs.agg(
      count(lit(1)).cast("double").as("_n_docs"),
      avg(size(wsTokens(col(textCol)))).as("_avgdl"))
    val tf = docs
      .select(col(idCol).as("doc"), explode(split(col(textCol), " ")).as("token"))
      .groupBy("doc", "token").agg(count(lit(1)).as("tf"))
    val dl = docs.select(col(idCol).as("doc"),
      size(split(col(textCol), " ")).as("dl"))
    impactPrune(tf, dl, stats, topM, k1, b)
  }

  private def impactPrune(tf: DataFrame, dl: DataFrame, stats: DataFrame,
      topM: Int, k1: Double, b: Double): DataFrame = {
    val wTok = org.apache.spark.sql.expressions.Window
      .partitionBy("token").orderBy(col("_impact").desc, col("doc"))
    tf.join(dl, Seq("doc")).crossJoin(broadcast(stats))
      .withColumn("_impact",
        round(col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("_avgdl"))), 6))
      .withColumn("_r", row_number().over(wTok))
      .filter(col("_r") <= topM)
      .select("doc", "token", "tf")
  }

  /** Exact top-k terms per group (source) with each term's share of
    * the group's token volume — the "signature vocabulary" view of
    * provenance (pairs with [[vocabOverlap]]: overlap says two crawls
    * look alike, this says WHAT dominates each).
    *
    * One (group, token) hash aggregate (map-side combined), then two
    * windows over the same group partitioning — per-group state is
    * vocabulary-sized, independent of corpus row count. Rank is
    * (count DESC, token): deterministic cross-engine.
    */
  def topTermsByGroup(docs: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    val counts = docs
      .select(col(groupCol).as("g"), explode(wsTokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("g", "token").agg(count(lit(1)).as("cnt"))
    val byGroup = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val rank = byGroup.orderBy(col("cnt").desc, col("token"))
    counts
      .withColumn("rank", row_number().over(rank))
      .withColumn("share",
        round(col("cnt").cast("double") / sum(col("cnt")).over(byGroup), 6))
      .filter(col("rank") <= k)
      .select(col("g").as(groupCol), col("rank"), col("token"), col("cnt"),
        col("share"))
      .orderBy(groupCol, "rank")
  }

  /** Exact vocabulary-overlap matrix between groups (sources): for
    * every group pair, the intersection size and Jaccard similarity of
    * their distinct token sets — the provenance-level similarity /
    * shared-boilerplate signal (two "independent" crawls with a high
    * vocabulary Jaccard are not independent).
    *
    * Scale shape: one distinct over (group, token) — the only
    * corpus-sized shuffle — then a self-equi-join PER TOKEN, whose
    * fan-out is bounded by |groups-containing-token|² ≤ |groups|² per
    * token regardless of corpus size; pair aggregation output is
    * |groups|²/2 rows. Sizes attach from a |groups|-row broadcast.
    * All counts exact integers; only the final Jaccard divides.
    * Pairs sharing NO token are absent from the output (inner token
    * join), not emitted as zero rows.
    */
  def vocabOverlap(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val st = docs
      .select(col(groupCol).as("g"), explode(wsTokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .distinct()
      .localCheckpoint() // feeds sizes, and both sides of the pair join
    val sizes = st.groupBy("g").agg(count(lit(1)).as("n"))
    val pairs = st.select(col("g").as("source_a"), col("tok"))
      .join(st.select(col("g").as("source_b"), col("tok")), Seq("tok"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(sizes.select(col("g").as("source_a"), col("n").as("n_a"))),
        Seq("source_a"))
      .join(broadcast(sizes.select(col("g").as("source_b"), col("n").as("n_b"))),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_shared"),
        round(col("n_shared").cast("double")
          / (col("n_a") + col("n_b") - col("n_shared")), 6).as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** Unicode NFC normalization report — the canonical-composition
    * pass that must run before any string-EQUALITY operator on web
    * text (exact dedup, shingles, vocabulary): precomposed and
    * decomposed renderings of the same glyph are different strings,
    * different shingles, different md5 digests until normalized.
    * Codegen end-to-end via [[graft.functions.NfcNormalizeExpr]] (a
    * UDF here would break whole-stage codegen in dedup's hottest
    * projection). Output: (id, text_nfc, changed, n_chars_raw,
    * n_chars_nfc), ordered by id.
    */
  def nfcNormalize(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nfc = graft.functions.TextExpressions
      .nfcFast(docs.sparkSession)(col(textCol))
    docs.select(col(idCol),
      nfc.as("text_nfc"),
      when(col(textCol) =!= nfc, 1).otherwise(0).as("changed"),
      length(col(textCol)).as("n_chars_raw"),
      length(nfc).as("n_chars_nfc"))
      .orderBy(idCol)
  }

  /** Character-unigram Shannon entropy per document (nats) — the
    * compressibility quality signal: machine-generated or boilerplate
    * text (key-mash, repeated padding, base64 blobs) sits at the
    * entropy extremes while natural language clusters mid-range, so
    * entropy cuts catch junk that token/stopword ratios miss.
    *
    * Computed as ln(n) − Σ cnt·ln(cnt)/n over the per-character counts
    * (the algebraic form needs no per-character p=cnt/n division).
    * Cross-engine float discipline: each cnt·ln(cnt) term is a
    * DETERMINISTIC function of one integer, quantized to integer
    * nano-nats at birth, so the aggregate is an exact integer sum —
    * order-invariant under any partitioning (the q148 rule). The final
    * 6dp rounding happens once, on a value assembled from exact
    * integers plus the single deterministic ln(n) term.
    *
    * Scale shape: one character explode (map-side) into one hash
    * aggregate on (doc, char) with map-side partials, then a per-doc
    * rollup — the alphabet bounds the post-combine state per task, and
    * nothing joins or broadcasts.
    *
    * Output per non-empty doc: (id, n_chars_counted, n_unique_chars,
    * entropy_nats), ordered by id.
    */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = docs
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol), length(col(textCol)).as("n_chars_counted"),
        explode(split(col(textCol), "")).as("ch"))
      // Spark's split keeps the trailing empty match of the empty
      // pattern (limit = -1 semantics); it is not a character.
      .filter(col("ch") =!= "")
    chars.groupBy(idCol, "n_chars_counted", "ch")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("term_nano",
        floor(col("cnt").cast("double") * log(col("cnt").cast("double"))
          * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col(idCol), col("n_chars_counted"))
      .agg(sum("term_nano").as("_sum_nano"),
        count(lit(1)).as("n_unique_chars"))
      .select(col(idCol), col("n_chars_counted"), col("n_unique_chars"),
        round(log(col("n_chars_counted").cast("double"))
          - (col("_sum_nano").cast("double") / lit(1e9))
            / col("n_chars_counted"), 6).as("entropy_nats"))
      .orderBy(idCol)
  }

  /** Gopher-style top-n-gram repetition profile (Rae et al. 2021,
    * table A1): for each n in `ns`, the document's most frequent word
    * n-gram and the fraction of the document's characters its
    * occurrences cover (`count * chars(gram) / chars(doc)`; overlaps
    * can push it past 1, which is exactly the boilerplate signal).
    * [[repetition]] is the distinct-shingle ratio; this is the
    * per-gram concentration cut the Gopher filters add on top —
    * together they catch both "many different shingles repeat" and
    * "one phrase dominates".
    *
    * Determinism: the top gram ties break lexicographically smallest
    * (UTF8String binary compare == DuckDB collation); the fraction is
    * one division of exact integers, so no float accumulates across
    * rows. Scale shape: every gram of a doc originates from ONE input
    * row, so the whole profile computes IN-ROW through the fused
    * [[graft.functions.TopGramExpr]] codegen expression — one O(L)
    * hash-map pass per (doc, n), zero gram strings ever reach a
    * shuffle (the previous (doc, n, gram) hash-aggregate form shuffled
    * 27 MB of raw n-gram strings at sf0.1, the suite's largest —
    * ~27 GB at 100×, for strings that never needed to leave the scan);
    * per-row work is bounded by document length, never corpus size.
    *
    * Output per (doc, n) with at least n tokens: (id, n, top_gram,
    * n_occurrences, top_gram_char_frac), ordered by (id, n).
    */
  def topNgramProfile(docs: DataFrame, idCol: String, textCol: String,
      ns: Seq[Int] = Seq(1, 2, 3, 4)): DataFrame = {
    val topGram = graft.functions.TextExpressions
      .topGramFast(docs.sparkSession) _
    docs
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol), length(col(textCol)).as("_n_chars"),
        wsTokens(col(textCol)).as("_t"))
      .select(col(idCol), col("_n_chars"),
        explode(array(ns.map(lit): _*)).as("n"), col("_t"))
      .filter(size(col("_t")) >= col("n"))
      .select(col(idCol), col("_n_chars"), col("n"),
        topGram(col("_t"), col("n")).as("_top"))
      .select(col(idCol), col("n"), col("_top.g").as("top_gram"),
        col("_top.c").as("n_occurrences"),
        round((col("_top.c") * length(col("_top.g"))).cast("double")
          / col("_n_chars"), 6).as("top_gram_char_frac"))
      .orderBy(idCol, "n")
  }

  /** N-gram novelty per document — the memorization-risk / boilerplate
    * signal: the fraction of a doc's DISTINCT k-shingles that occur in
    * no other document (corpus df = 1). Low novelty = the doc is
    * assembled from corpus-common n-grams (template/boilerplate); high
    * novelty = mostly unique content. Shingle df aggregates on the
    * hashed gram (bodies shuffle once, as hashes); the ratio is one
    * division of exact counts. Short docs fall back to the whole-text
    * sentinel shingle, so every doc reports.
    *
    * Output: (id, n_grams, n_unique, novelty 6dp), ordered by id.
    */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol),
        explode(array_distinct(Dedup.shingles(col(textCol), k))).as("g"))
      .select(col(idCol), xxhash64(col("g")).as("gh"))
      .localCheckpoint()
    val df = sh.groupBy(col("gh")).agg(count(lit(1)).as("_df"))
    sh.join(df, Seq("gh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_df") === 1L, 1L).otherwise(0L)).as("n_unique"))
      .select(col(idCol), col("n_grams"), col("n_unique"),
        round(col("n_unique").cast("double") / col("n_grams"), 6)
          .as("novelty"))
      .orderBy(idCol)
  }

  /** CCNet-style per-language perplexity bucketing: score every doc
    * with the interpolated trigram LM (`trigramLogProb`) and split
    * each language into `nBuckets` equal tiers by LM fit — tier 1
    * ("head") is the best-scoring third, "tail" the worst; CCNet
    * keeps head+middle and drops or down-weights tail. Docs too short
    * to produce a trigram are unscored and excluded (they fall to the
    * length-based quality filters instead).
    *
    * Determinism: `avg_logprob` is 6dp-rounded at the LM; ntile orders
    * on (avg_logprob DESC, id) so ties can't swap tiers cross-engine.
    * Scale shape: the LM scoring dominates; the bucketing itself is
    * one per-language window — a per-lang total order is what CCNet's
    * semantics demand (at extreme scale swap ntile for approx-quantile
    * cut points if a per-language sort is unaffordable).
    *
    * Output: (id, lang, n_trigrams, avg_logprob, tier, ppl_bucket).
    */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, s"need nBuckets >= 2, got $nBuckets")
    val lm = trigramLogProb(docs, idCol, textCol)
    val w = Window.partitionBy(langCol)
      .orderBy(col("avg_logprob").desc, col(idCol))
    docs.select(col(idCol), col(langCol))
      .join(lm, Seq(idCol))
      .withColumn("tier", ntile(nBuckets).over(w))
      .withColumn("ppl_bucket",
        when(col("tier") === 1, lit("head"))
          .when(col("tier") === nBuckets, lit("tail"))
          .otherwise(lit("middle")))
      .select(col(idCol), col(langCol), col("n_trigrams"),
        col("avg_logprob"), col("tier"), col("ppl_bucket"))
      .orderBy(idCol)
  }

  /** Zipf power-law fit over the corpus's top-`topV` token
    * frequencies — the one-row language-health profile (natural text
    * fits ln f ≈ a + b·ln r with b near −1; templated/synthetic
    * corpora bend away from it): OLS of ln(freq) on ln(rank) with the
    * rank order pinned to (count DESC, token ASC).
    *
    * Determinism: ln(rank) and ln(count) quantize to integer MICROS
    * at birth (nanos would overflow the Σx·y products), so every OLS
    * sum is an exact integer; slope, intercept, and r² are each one
    * float expression over those sums. r² is NULL when the top-V
    * counts are all equal (zero y-variance).
    *
    * Scale shape: one token count aggregate, a TakeOrdered top-V, and
    * a ≤V-row window + scalar fold — the corpus is touched once.
    *
    * Output: one row (n_terms, slope, intercept, r2).
    */
  /** The consolidated Gopher quality-rule report (Rae et al. 2021,
    * §A1.1) — the canonical rule set production corpus cleaning
    * starts from, one row per document with each rule's evidence and
    * flag plus the overall verdict:
    *   1. 50 ≤ word count ≤ 100 000
    *   2. 3 ≤ mean word length ≤ 10 (compared as 3n ≤ Σlen ≤ 10n —
    *      exact integers, no float mean in the decision)
    *   3. symbol-to-word ratio (# and "...") ≤ 0.1
    *   4. ≥ 90 % of words contain an alphabetic character
    *   5. ≥ 2 distinct Gopher stopwords present
    *   6. ≤ 90 % of lines bullet-started, ≤ 30 % ellipsis-ended
    * Every flag compares exact integers (ratios cross-multiplied);
    * `mean_word_len` is reported 6dp for humans but never drives a
    * flag. Pure map-side projection.
    *
    * Output: (id, n_words, n_word_chars, mean_word_len, n_symbols,
    * n_alpha_words, n_stopwords, flag_words, flag_word_len,
    * flag_symbols, flag_alpha, flag_stopwords, flag_lines, pass),
    * ordered by id.
    */
  def gopherRules(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val t = wsTokens(col(textCol))
    val n = size(t).cast("long")
    // single-byte-safe char mass of the words themselves
    val wordChars = length(regexp_replace(col(textCol), "\\s", ""))
      .cast("long")
    val symbols = (length(col(textCol))
      - length(regexp_replace(col(textCol), "#", ""))).cast("long") +
      ((length(col(textCol))
        - length(regexp_replace(col(textCol), "\\.\\.\\.", "")))
        / lit(3)).cast("long")
    val alphaWords = size(filter(t, w => w.rlike("[A-Za-z]"))).cast("long")
    val gopherStops = array(Seq("the", "be", "to", "of", "and", "that",
      "have", "with").map(lit): _*)
    val stops = size(array_intersect(array_distinct(t), gopherStops))
      .cast("long")
    val lines = split(col(textCol), "\n")
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines,
      l => l.startsWith("-") || l.startsWith("*"))).cast("long")
    val ellLines = size(filter(lines, l => l.endsWith("..."))).cast("long")
    docs.select(col(idCol), n.as("n_words"), wordChars.as("n_word_chars"),
        symbols.as("n_symbols"), alphaWords.as("n_alpha_words"),
        stops.as("n_stopwords"), nLines.as("_nl"),
        bulletLines.as("_bl"), ellLines.as("_el"))
      .withColumn("mean_word_len", when(col("n_words") > 0L,
        round(col("n_word_chars").cast("double") / col("n_words"), 6)))
      .withColumn("flag_words",
        (col("n_words") >= 50L && col("n_words") <= 100000L).cast("int"))
      .withColumn("flag_word_len",
        (col("n_word_chars") >= col("n_words") * 3L
          && col("n_word_chars") <= col("n_words") * 10L).cast("int"))
      .withColumn("flag_symbols",
        (col("n_symbols") * 10L <= col("n_words")).cast("int"))
      .withColumn("flag_alpha",
        (col("n_alpha_words") * 10L >= col("n_words") * 9L).cast("int"))
      .withColumn("flag_stopwords", (col("n_stopwords") >= 2L).cast("int"))
      .withColumn("flag_lines",
        (col("_bl") * 10L <= col("_nl") * 9L
          && col("_el") * 10L <= col("_nl") * 3L).cast("int"))
      .withColumn("pass",
        (col("flag_words") + col("flag_word_len") + col("flag_symbols")
          + col("flag_alpha") + col("flag_stopwords") + col("flag_lines")
          === 6).cast("int"))
      .select(col(idCol), col("n_words"), col("n_word_chars"),
        col("mean_word_len"), col("n_symbols"), col("n_alpha_words"),
        col("n_stopwords"), col("flag_words"), col("flag_word_len"),
        col("flag_symbols"), col("flag_alpha"), col("flag_stopwords"),
        col("flag_lines"), col("pass"))
      .orderBy(idCol)
  }

  /** PMI collocations over the top-`topV` vocabulary — the
    * co-occurrence miner behind phrase/boilerplate discovery:
    * for token pairs (a < b) within the capped vocabulary,
    * PMI = ln(n_ab·N / (df_a·df_b)) over DOCUMENT-level
    * presence counts. Every count is an exact integer; each pair's
    * PMI is ONE float expression quantized to nanos (no cross-row
    * float accumulation at all). Pairs below `minPairDf` co-docs are
    * cut (classic sparse-PMI noise guard).
    *
    * Scale shape: the df-capped inverted-index discipline (q62): the
    * corpus meets only the BROADCAST top-V vocabulary, per-doc pair
    * work is bounded by min(|doc|, V)², and the pair aggregate moves
    * (tok_a, tok_b) rows — never text.
    *
    * Output: (tok_a, tok_b, df_a, df_b, n_ab, pmi), ordered by
    * (tok_a, tok_b).
    */
  def pmiCollocations(docs: DataFrame, idCol: String, textCol: String,
      topV: Int = 100, minPairDf: Long = 5L): DataFrame = {
    require(topV >= 2, s"need topV >= 2, got $topV")
    val dt = docs
      .select(col(idCol).as("_id"),
        explode(wsTokens(col(textCol))).as("tok"))
      .distinct().localCheckpoint()
    val vocab = dt.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok")).limit(topV)
    val dv = dt.join(broadcast(vocab), Seq("tok")).localCheckpoint()
    val tot = docs.agg(countDistinct(col(idCol)).as("_n"))
    dv.select(col("_id"), col("tok").as("tok_a"), col("df").as("df_a"))
      .join(dv.select(col("_id"), col("tok").as("tok_b"),
        col("df").as("df_b")), Seq("_id"))
      .filter(col("tok_a") < col("tok_b"))
      .groupBy(col("tok_a"), col("tok_b"), col("df_a"), col("df_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairDf)
      .crossJoin(broadcast(tot))
      .withColumn("_pmi_nano", floor(
        log(col("n_ab").cast("double") * col("_n").cast("double")
          / (col("df_a").cast("double") * col("df_b").cast("double")))
          * lit(1e9) + lit(0.5)).cast("long"))
      .select(col("tok_a"), col("tok_b"), col("df_a"), col("df_b"),
        col("n_ab"), round(col("_pmi_nano") / lit(1e9), 6).as("pmi"))
      .orderBy("tok_a", "tok_b")
  }

  /** Heaps-law vocabulary-growth fit — V(n) ≈ K·n^β over the corpus
    * in id order: how fast does NEW vocabulary keep arriving as the
    * corpus grows? β well below the reference ~0.5 flags a
    * boilerplate/duplication-heavy source; β near 1 flags noise
    * (every doc minting tokens). The diversity dial next to
    * [[zipfFit]]'s frequency dial.
    *
    * Determinism: per-doc token counts, first-occurrence vocabulary
    * increments, and both cumulative series are exact longs; the
    * log-log OLS runs on micro-quantized ints (the q223 pattern —
    * micros, not nanos, so the product sums stay in long range), over
    * ~`samplePoints` evenly-strided docs so Σx² stays ≤ ~1e16 at any
    * corpus size. β/ln K/r² are one mirrored float expression each.
    *
    * Scale shape: one token explode + (token → min doc) aggregate
    * dominates; the cumulative windows run UNPARTITIONED over the
    * per-doc frame (docs, not tokens — the documented global-sort
    * cost, q221's trade). Output: one row (n_docs, n_tokens, vocab,
    * n_points, beta 6dp, ln_k 6dp, r2 6dp).
    */
  def heapsFit(docs: DataFrame, idCol: String, textCol: String,
      samplePoints: Int = 200): DataFrame = {
    require(samplePoints >= 2, s"need samplePoints >= 2, got $samplePoints")
    val toks = docs.select(col(idCol).as("_id"),
      explode(wsTokens(col(textCol))).as("t"))
    val perDoc = docs.select(col(idCol).as("_id"),
      size(wsTokens(col(textCol))).cast("long").as("ntok"))
    val firsts = toks.groupBy(col("t")).agg(min(col("_id")).as("_id"))
      .localCheckpoint()
    val nf = firsts.groupBy("_id").agg(count(lit(1)).as("nf"))
    val w = Window.orderBy("_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, 0)
    val series = perDoc.join(nf, Seq("_id"), "left")
      .select(col("_id"), col("ntok"),
        coalesce(col("nf"), lit(0L)).as("nf"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum_tok", sum(col("ntok")).over(cum))
      .withColumn("cum_v", sum(col("nf")).over(cum))
    val st = perDoc.agg(count(lit(1)).as("ndocs"),
        sum(col("ntok")).as("n_tokens"))
      .withColumn("step",
        greatest(lit(1L), expr(s"ndocs div $samplePoints")))
      .localCheckpoint()
    val pts = series.crossJoin(broadcast(st))
      .filter(pmod(col("rn"), col("step")) === 0L
        && col("cum_tok") > 0L && col("cum_v") > 0L)
      .select(
        floor(log(col("cum_tok").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long").as("x"),
        floor(log(col("cum_v").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long").as("y"))
    val vocab = firsts.agg(count(lit(1)).as("vocab"))
    val a = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    st.crossJoin(broadcast(vocab)).crossJoin(broadcast(a))
      .select(col("ndocs").as("n_docs"), col("n_tokens"), col("vocab"),
        col("n").as("n_points"),
        round((col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / (col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")), 6)
          .as("beta"),
        round((col("sy").cast("double") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sxy").cast("double"))
          / ((col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
            * lit(1e6)), 6).as("ln_k"),
        when((col("n").cast("double") * col("syy").cast("double")
          - col("sy").cast("double") * col("sy").cast("double")) > 0.0,
          round((col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            * (col("n").cast("double") * col("sxy").cast("double")
              - col("sx").cast("double") * col("sy").cast("double"))
            / ((col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
              * (col("n").cast("double") * col("syy").cast("double")
                - col("sy").cast("double") * col("sy").cast("double"))), 6))
          .as("r2"))
  }

  def zipfFit(docs: DataFrame, idCol: String, textCol: String,
      topV: Int = 200): DataFrame = {
    require(topV >= 2, s"need topV >= 2, got $topV")
    val top = docs
      .select(explode(wsTokens(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("t")).limit(topV)
    val w = Window.orderBy(col("cnt").desc, col("t"))
    val q = top.withColumn("rnk", row_number().over(w))
      .select(
        floor(log(col("rnk").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long").as("x"),
        floor(log(col("cnt").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long").as("y"))
    q.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n").as("n_terms"),
        round((col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / (col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")), 6)
          .as("slope"),
        round((col("sy").cast("double") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sxy").cast("double"))
          / ((col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
            * lit(1e6)), 6).as("intercept"),
        when((col("n").cast("double") * col("syy").cast("double")
          - col("sy").cast("double") * col("sy").cast("double")) > 0.0,
          round((col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            * (col("n").cast("double") * col("sxy").cast("double")
              - col("sx").cast("double") * col("sy").cast("double"))
            / ((col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
              * (col("n").cast("double") * col("syy").cast("double")
                - col("sy").cast("double") * col("sy").cast("double"))), 6))
          .as("r2"))
  }
}
