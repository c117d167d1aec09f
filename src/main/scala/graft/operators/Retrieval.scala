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
}
