package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact edit-distance self-join — fuzzy key matching for entity
  * resolution (near-identical customer/part/vendor keys that differ by
  * a typo), the one dedup family the shingle/MinHash tier can't serve:
  * those bound set overlap, not string edits.
  *
  * Algorithm: q-gram prefix filtering in the ED-Join family (Xiao,
  * Wang, Lin — "Ed-Join: an efficient algorithm for similarity joins
  * with edit distance constraints", VLDB 2008; count bound from
  * Gravano et al., VLDB 2001). One edit operation destroys at most `q`
  * of a string's positional q-gram tokens, so two strings within
  * distance `d` share ≥ n_max − d·q gram tokens (n = len − q + 1).
  * Encoding each token as (gram, occurrence#) makes the set
  * intersection of the encodings equal the multiset intersection of
  * the grams, so the All-Pairs prefix lemma applies with a per-side
  * prefix of just **d·q + 1 globally-rarest elements** — any
  * qualifying pair must collide on one of them. Candidates are then
  * verified with the codegen `levenshtein` built-in, so the result is
  * EXACT: provably no false negatives, verified no false positives.
  *
  * Scale shape: the inverted index carries only prefix elements
  * (d·q + 1 rows per doc regardless of string length), each with its
  * doc's string, so verification runs INSIDE the candidate join's map
  * stage — over-generated candidates (low-entropy keys can produce
  * 40× more collisions than matches) die before they ever shuffle;
  * only verified pairs reach the dedup exchange. Carrying the string
  * costs (d·q + 1)× its bytes in the index — linear, the right trade
  * for the short keys this operator targets. Rarest-first prefixes
  * mean hot grams (shared boilerplate like a common key prefix) never
  * enter the pair join — the skew cap other dedup paths need via
  * `maxDf` is built into the algorithm, without costing exactness.
  * Strings too short for the count bound to bite (n ≤ d·q, where a
  * pair can share zero grams yet match) pair among themselves through
  * a length-band equi-join — for entity keys that set is tiny; its
  * quadratic worst-case is confined to same-length-band short strings.
  */
object Fuzzy {

  /** All pairs (id_a < id_b) whose strings are within `maxDist`
    * Levenshtein edits, with the exact distance. Output columns:
    * (id_a, id_b, dist: int), unordered — callers sort.
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1, q: Int = 2): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    require(q >= 2, "q must be >= 2")
    val pfx = maxDist * q + 1
    val base = df
      .select(col(idCol).as("_fid"), col(strCol).as("_fs"))
      .filter(col("_fs").isNotNull)
      .withColumn("_len", length(col("_fs")))

    // Positional-multiset q-gram elements for every doc with >= 1 gram.
    // occ = occurrence index of the gram within the doc (by position),
    // so element-set intersection == gram-multiset intersection.
    // The element/prefix construction carries IDS ONLY — the string
    // payload used to ride every gram row through two window shuffles
    // and the frequency join (L x the corpus's string bytes on the
    // wire); it re-attaches to the d·q+1 surviving prefix rows below.
    val elements = base.filter(col("_len") >= q)
      .select(col("_fid"), col("_len"),
        posexplode(expr(s"transform(sequence(1, _len - ${q - 1}), " +
          s"p -> substring(_fs, p, $q))")).as(Seq("_p", "_g")))
      .withColumn("_occ", row_number().over(
        Window.partitionBy("_fid", "_g").orderBy("_p")))
    // Global element frequency defines the total order; rarest-first
    // prefixes keep hot elements out of the pair join entirely.
    val freq = elements.groupBy("_g", "_occ").agg(count(lit(1)).as("_df"))
    val prefix = elements
      .join(freq, Seq("_g", "_occ"))
      .withColumn("_rk", row_number().over(
        Window.partitionBy("_fid").orderBy(col("_df"), col("_g"), col("_occ"))))
      .filter(col("_rk") <= pfx)
      .join(base.select(col("_fid"), col("_fs")), Seq("_fid"))
      .select(col("_fid"), col("_fs"), col("_len"), col("_g"), col("_occ"))
      .localCheckpoint() // feeds both sides of the candidate self-join
    // The candidate join's INPUT is small (d·q+1 rows per doc) but its
    // OUTPUT is the over-generated candidate stream — AQE sizes the
    // join by input bytes and would coalesce the verification map
    // stage onto one partition. Pin the join's parallelism instead,
    // and verify with the banded threshold levenshtein (O(d·len),
    // early-exit, -1 past the bound) rather than the full O(len²) DP.
    //
    // Skew: low-entropy keys concentrate the prefix elements in few
    // (_g, _occ) buckets (Zipf), and a within-bucket self-join does
    // C(n_b, 2) work on whatever single task the hot bucket hashes to
    // — the stage walls on one straggler while the rest of the cluster
    // idles (guide's max/median pathology). SALT the join: the right
    // side takes a deterministic salt (xxhash of the doc id — never
    // rand(), which re-draws under task retry), the left side fans out
    // over all k salt values, so a hot bucket's pair block splits into
    // k tasks. Each unordered pair still surfaces exactly twice
    // ((x,y) at t = salt(y), (y,x) at t = salt(x)) and the id_a < id_b
    // filter keeps one, exactly as unsalted. k derives from the
    // MEASURED hottest bucket (pairs-per-task target 256k — the salt
    // replicates the exploded side's string payload k-fold, so k is
    // the smallest split that un-straggles the hot bucket, not the
    // core count), so unskewed inputs pay k = 1 (no replication) and
    // the factor tracks the data.
    val shuffleN = df.sparkSession.sparkContext.defaultParallelism
    val maxBucketRow = prefix.groupBy("_g", "_occ")
      .agg(count(lit(1)).as("_n")).agg(max(col("_n"))).head()
    val maxBucket = if (maxBucketRow.isNullAt(0)) 0L else maxBucketRow.getLong(0)
    val salts = math.max(1L, math.min(shuffleN.toLong,
      maxBucket * maxBucket / (1L << 18))).toInt
    val left = prefix
      .withColumn("_t", explode(sequence(lit(0), lit(salts - 1))))
      .repartition(shuffleN, col("_g"), col("_occ"), col("_t"))
    val right = prefix
      .withColumn("_t", pmod(xxhash64(col("_fid")), lit(salts.toLong)).cast("int"))
    val pairsLong = left.select(col("_fid").as("id_a"), col("_fs").as("_stra"),
        col("_len").as("_la"), col("_g"), col("_occ"), col("_t"))
      .join(right.select(col("_fid").as("id_b"), col("_fs").as("_strb"),
        col("_len").as("_lb"), col("_g"), col("_occ"), col("_t")),
        Seq("_g", "_occ", "_t"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("_la") - col("_lb")) <= maxDist)
      .withColumn("dist", levenshtein(col("_stra"), col("_strb"), maxDist))
      .filter(col("dist") >= 0)
      .select("id_a", "id_b", "dist")

    // Short strings (n_grams <= d·q): the count bound is vacuous only
    // when BOTH sides are short, so shorts pair among themselves via a
    // length-band equi-join (a short x long pair still collides in the
    // prefix index above — the short side's prefix is its full set).
    val shorts = base.filter(col("_len") - (q - 1) <= maxDist * q)
    val pairsShort = shorts
      .select(col("_fid").as("_sa"), col("_fs").as("_ssa"),
        explode(sequence(col("_len"), col("_len") + maxDist)).as("_band"))
      .join(shorts.select(col("_fid").as("_sb"), col("_fs").as("_ssb"),
        col("_len").as("_band")), Seq("_band"))
      .filter(col("_sa") =!= col("_sb"))
      .withColumn("dist", levenshtein(col("_ssa"), col("_ssb"), maxDist))
      .filter(col("dist") >= 0)
      .select(least(col("_sa"), col("_sb")).as("id_a"),
        greatest(col("_sa"), col("_sb")).as("id_b"), col("dist"))

    // A pair can surface through several shared elements (and a short
    // pair through both paths); only these verified survivors — not
    // the raw candidates — pay the dedup shuffle.
    pairsLong.unionByName(pairsShort).distinct()
  }

  /** Blocking-scheme audit for a record-linkage / fuzzy join — the
    * planning probe run BEFORE choosing a blocking key: for each
    * scheme, the candidate-pair mass Σ_blocks C(n_b, 2) computed from
    * block-size counts alone (the pairs themselves never
    * materialize), the hottest block, and the reduction vs the
    * unblocked C(N, 2). All counts exact; the two ratios are one
    * float expression each.
    *
    * Schemes audited: `first_token` (lowercased), `len_bucket`
    * (length div 16), `prefix4` (lowercased 4-char prefix) — the
    * classic cheap keys.
    *
    * Output: (scheme, n_blocks, max_block, cand_pairs,
    * reduction, max_block_share), ordered by scheme.
    */
  def blockingAudit(df: DataFrame, idCol: String,
      strCol: String): DataFrame = {
    val s = col(strCol)
    val schemes: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "first_token" -> lower(element_at(split(s, " "), 1)),
      "len_bucket" -> expr(s"length($strCol) div 16").cast("string"),
      "prefix4" -> lower(substring(s, 1, 4)))
    val tot = df.agg(count(lit(1)).as("_n"))
    schemes.map { case (name, key) =>
      df.select(key.as("_k"))
        .groupBy(col("_k")).agg(count(lit(1)).as("_c"))
        .agg(count(lit(1)).as("n_blocks"),
          max(col("_c")).as("max_block"),
          coalesce(sum(expr("_c * (_c - 1) div 2")), lit(0L))
            .as("cand_pairs"))
        .crossJoin(broadcast(tot))
        .select(lit(name).as("scheme"), col("n_blocks"), col("max_block"),
          col("cand_pairs"),
          when(col("_n") > 1L, round(lit(1.0)
            - col("cand_pairs").cast("double")
              / expr("(_n * (_n - 1) div 2)").cast("double"), 6))
            .as("reduction"),
          when(col("cand_pairs") > 0L,
            round(expr("(max_block * (max_block - 1) div 2)")
              .cast("double") / col("cand_pairs").cast("double"), 6))
            .as("max_block_share"))
    }.reduce(_ unionAll _).orderBy("scheme")
  }
}
