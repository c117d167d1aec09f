package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for multi-signal retrieval — the glue between the
  * sparse (BM25, `TextAnalysis.bm25TopK` / `TextIndex.query`) and
  * dense (`Similarity.bruteForceTopK` / `ivfPqTopKReranked`) tiers:
  * a training-data curation pipeline that retrieves with both signals
  * needs one fused ranking per query.
  *
  * Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
  * each input list contributes 1/(c + rank) for the documents it
  * ranked; documents are ordered by the summed contribution. Fusing on
  * RANKS rather than scores means BM25 scores and cosines never need
  * calibrating against each other — the published reason RRF wins
  * fusion bake-offs despite its simplicity.
  *
  * Scale: every input is already top-k-bounded PER QUERY by its
  * retrieval tier, so the union this operator shuffles is
  * |queries| × k × |lists| rows — independent of corpus size. One
  * hash aggregation on (query, doc), one per-query window over ≤ k ×
  * |lists| rows; nothing here ever sees the corpus.
  *
  * Determinism: contributions are exact rationals evaluated in double;
  * a (query, doc) group sums ≤ |lists| of them. With ≤ 2 lists the sum
  * is a single IEEE addition (commutative, order-free); beyond that,
  * sort-free cross-engine stability would need rationals — fuse
  * pairwise if that ever matters. Fused scores are rounded to 6dp
  * BEFORE ranking, doc-id tie-break, same as every ranked operator in
  * the engine.
  */
object Retrieval {
  /** ColBERT-style late-interaction (MaxSim) retrieval (Khattab &
    * Zaharia, SIGIR 2020): documents and queries are MULTI-vector —
    * a set of token/chunk vectors each — and the relevance of doc d
    * to query q is Σ over q's vectors of the MAX cosine against d's
    * vectors. Late interaction keeps per-token granularity (a query
    * term can match its best-matching passage chunk) while staying a
    * sum of per-token maxima — exactly the shape that distributes:
    *
    *  - score = two-level aggregation: `max` per (query, doc,
    *    q_chunk) then `sum` per (query, doc). Both hash-aggregate
    *    with map-side partial combine; the shuffle after scoring
    *    carries only (query_id, doc_id, q_chunk, max_ppm) ints,
    *    never vectors.
    *  - the query token set is probe-bounded and broadcast
    *    (checkpointed — the q102 rule); the corpus token table
    *    streams through ONE scan. At 100 TB the corpus side would be
    *    the ANN-shortlisted candidate set instead of the full scan —
    *    the aggregation shape is unchanged.
    *
    * The multi-vector sets here are derived deterministically from
    * the single-vector testdata (per-chunk exact binary-fraction
    * reweighting — multiples of 0.25, so every product is bit-exact
    * in any IEEE engine and the oracle replays it closed-form); a
    * production corpus brings real per-chunk embeddings and the
    * operator is unchanged from `chunkScores` down.
    *
    * Determinism: cosines quantize to ppm longs at birth, maxima and
    * sums are exact integers, ranking ties break on doc_id.
    *
    * Output: (query_id, rank, doc_id, maxsim_ppm) ordered by
    * (query_id, rank).
    */
  def maxSimTopK(embeddings: DataFrame, probes: DataFrame, k: Int,
      nChunks: Int = 4): DataFrame = {
    require(k >= 1 && nChunks >= 1)
    val spark = embeddings.sparkSession
    // derive chunk vectors: separate selects so the generator column
    // is never read in the select that creates it (CLAUDE invariant)
    def chunks(df: DataFrame, idAs: String, chunkAs: String, vecAs: String,
        dimMult: Int, chunkMult: Int): DataFrame =
      df.select(col("vec_id").as(idAs), col("embedding"),
          explode(sequence(lit(0), lit(nChunks - 1))).as(chunkAs))
        .select(col(idAs), col(chunkAs),
          expr(s"""transform(embedding, (x, i) -> cast(x as double) *
                  |  (1.0d + 0.25d * cast((i * $dimMult + $chunkAs * $chunkMult) % 5 - 2 as double)))"""
            .stripMargin).as(vecAs))
    val docs = chunks(embeddings, "doc_id", "d_chunk", "d_vec", 7, 13)
    val qs = chunks(probes, "query_id", "q_chunk", "q_vec", 3, 17)
      .localCheckpoint()
    val wK = Window.partitionBy("query_id")
      .orderBy(col("maxsim_ppm").desc, col("doc_id"))
    docs.crossJoin(broadcast(qs))
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("cos_ppm",
        round(graft.functions.VectorExpressions.cosineFast(spark)(
          col("q_vec"), col("d_vec")) * 1e6).cast("long"))
      .groupBy("query_id", "doc_id", "q_chunk")
      .agg(max("cos_ppm").as("mx"))
      .groupBy("query_id", "doc_id")
      .agg(sum("mx").as("maxsim_ppm"))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("maxsim_ppm"))
      .orderBy("query_id", "rank")
  }

  /** Fuse per-query ranked lists into one top-`k` ranking.
    *
    * Each input must carry `queryCol`, `docCol`, and an integer
    * `rank` column (1-based, as all the engine's retrieval operators
    * emit). Output: (queryCol, rank, docCol, rrf), ordered.
    */
  def rrfFuse(lists: Seq[DataFrame], k: Int, c: Int = 60,
      queryCol: String = "query_id", docCol: String = "doc_id"): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val contribs = lists.map(_.select(
      col(queryCol), col(docCol),
      (lit(1.0) / (lit(c) + col("rank"))).as("contrib")))
    val fused = contribs.reduce(_.unionByName(_))
      .groupBy(queryCol, docCol)
      .agg(round(sum(col("contrib")), 6).as("rrf"))
    val w = Window.partitionBy(queryCol).orderBy(col("rrf").desc, col(docCol))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryCol), col("rank"), col(docCol), col("rrf"))
      .orderBy(queryCol, "rank")
  }

  /** Ranking-quality evaluation: nDCG@k of a ranked list against a
    * graded relevance table — the number a retrieval tier is tuned
    * on (Järvelin & Kekäläinen, TOIS 2002). DCG sums
    * gain/log2(pos+1) over the list's top-k positions; the ideal DCG
    * re-ranks each query's relevance grades descending (doc tie-break)
    * and sums the same discounts; nDCG = DCG/IDCG.
    *
    * Cross-engine float discipline: each position's discounted gain is
    * a deterministic function of (grade, position), quantized to
    * integer nano-units at birth (the q148 rule), so both sums are
    * exact integers and the single final division is deterministic.
    * Negative grades clamp to 0 (standard); queries with zero ideal
    * gain emit NULL nDCG.
    *
    * Scale shape: the ranked list is top-k-bounded per query by its
    * retrieval tier; relevance joins by (query, doc); the ideal
    * ranking is one window over each query's graded docs. Nothing
    * sees the corpus.
    *
    * Output: (queryCol, dcg, idcg, ndcg), ordered by query.
    */
  /** Binary-relevance ranking metrics: per query, how many of its
    * relevant docs the top-k retrieved (recall@k) and where the first
    * one landed (reciprocal rank). Everything is exact integers until
    * the two final divisions — no float aggregation at all.
    *
    * Output per query in `rels`: (queryCol, n_rel, n_rel_at_k,
    * first_rel_rank [NULL if none retrieved], recall_at_k,
    * rr [NULL if none]), ordered by query.
    */
  def rankEval(ranked: DataFrame, rels: DataFrame, k: Int,
      queryCol: String = "query_id", docCol: String = "doc_id"): DataFrame = {
    val totals = rels.groupBy(queryCol).agg(count(lit(1)).as("n_rel"))
    val hits = ranked.filter(col("rank") <= k)
      .join(rels.select(col(queryCol), col(docCol)), Seq(queryCol, docCol))
      .groupBy(queryCol)
      .agg(count(lit(1)).as("n_rel_at_k"), min(col("rank")).as("first_rel_rank"))
    totals.join(hits, Seq(queryCol), "left")
      .select(col(queryCol), col("n_rel"),
        coalesce(col("n_rel_at_k"), lit(0L)).as("n_rel_at_k"),
        col("first_rel_rank"),
        round(coalesce(col("n_rel_at_k"), lit(0L)).cast("double")
          / least(col("n_rel"), lit(k.toLong)), 6).as("recall_at_k"),
        round(lit(1.0) / col("first_rel_rank"), 6).as("rr"))
      .orderBy(queryCol)
  }

  def ndcgAtK(ranked: DataFrame, rels: DataFrame, k: Int,
      queryCol: String = "query_id", docCol: String = "doc_id",
      relCol: String = "rel"): DataFrame = {
    def termNano(gain: org.apache.spark.sql.Column,
        pos: org.apache.spark.sql.Column) =
      floor(greatest(gain, lit(0.0)) / log2(pos + lit(1)) * lit(1e9)
        + lit(0.5)).cast("long")
    val dcg = ranked.filter(col("rank") <= k)
      .join(rels.select(col(queryCol), col(docCol), col(relCol)),
        Seq(queryCol, docCol), "left")
      .withColumn("_t", termNano(coalesce(col(relCol), lit(0.0)), col("rank")))
      .groupBy(queryCol).agg(sum(col("_t")).as("_dcg_nano"))
    val wi = Window.partitionBy(queryCol)
      .orderBy(col(relCol).desc, col(docCol))
    val idcg = rels
      .withColumn("_pos", row_number().over(wi))
      .filter(col("_pos") <= k)
      .withColumn("_t", termNano(col(relCol), col("_pos")))
      .groupBy(queryCol).agg(sum(col("_t")).as("_idcg_nano"))
    dcg.join(idcg, Seq(queryCol), "left")
      .select(col(queryCol),
        round(col("_dcg_nano").cast("double") / lit(1e9), 6).as("dcg"),
        round(coalesce(col("_idcg_nano"), lit(0L)).cast("double") / lit(1e9), 6)
          .as("idcg"),
        when(coalesce(col("_idcg_nano"), lit(0L)) > 0,
          round(col("_dcg_nano").cast("double") / col("_idcg_nano"), 6))
          .as("ndcg"))
      .orderBy(queryCol)
  }
}
