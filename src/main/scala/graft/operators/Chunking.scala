package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-window chunking — splitting documents into fixed-size token
  * windows with overlap (stride < chunkSize), the standard prep step
  * between a cleaned corpus and sequence packing: a 10k-token document
  * becomes ⌈(n − size)/stride⌉ + 1 windows of `chunkSize` tokens, each
  * starting `stride` tokens after the previous so no span longer than
  * (chunkSize − stride) is lost at a boundary.
  *
  * Scale shape: one projection binding the token array, one generator
  * (posexplode over the per-doc chunk count), one final projection
  * slicing the bound array — all map-side, no shuffle; output rows ≈
  * corpus tokens / stride. The token array is bound to a column BEFORE
  * the generator/slice reference it (HOF/generator re-eval trap), and
  * the generator lives in its own select (a generator and a same-name
  * alias in one projection trips the lateral-alias INTERNAL_ERROR).
  */
object Chunking {
  /** (id, chunk_id, n_chunk_tokens, chunk_text) — whitespace-token
    * windows of `chunkSize` every `stride` tokens. Documents shorter
    * than `chunkSize` yield one (short) chunk. The final window is the
    * only one allowed to be short, and every token is covered.
    */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 64, stride: Int = 48): DataFrame = {
    require(stride > 0 && stride <= chunkSize, "need 0 < stride <= chunkSize")
    val bound = docs.select(
      col(idCol),
      split(col(textCol), "\\s+").as("_toks"),
      size(split(col(textCol), "\\s+")).as("_n"))
    val counted = bound.withColumn("_n_chunks",
      when(col("_n") <= chunkSize, lit(1L))
        .otherwise(ceil((col("_n") - chunkSize) / lit(stride.toDouble)) + 1))
    counted
      .select(col(idCol), col("_toks"), col("_n"),
        posexplode(sequence(lit(0L), col("_n_chunks") - 1)).as(Seq("_pos", "_chunk")))
      .select(
        col(idCol),
        col("_chunk").cast("int").as("chunk_id"),
        least(lit(chunkSize), col("_n") - col("_chunk").cast("int") * stride)
          .as("n_chunk_tokens"),
        concat_ws(" ", slice(col("_toks"),
          col("_chunk").cast("int") * stride + 1, lit(chunkSize))).as("chunk_text"))
      .orderBy(idCol, "chunk_id")
  }
}
