package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** PERSISTED IVF+PQ index — the build/publish/query separation a
  * production ANN service runs: `Similarity.ivfPqTopKSeeded` computes
  * codebooks, routing and codes inline per call, which is right for a
  * one-shot batch job but wrong for a standing corpus queried
  * repeatedly; here the expensive parts (codebook derivation, corpus
  * encode, list assignment) are paid ONCE at build time and each query
  * touches only its probed slice of the stored index.
  *
  * Layout under `path/`:
  *  - `coarse/` — (list_id, centroid), nlists rows;
  *  - `sub/`    — (m, code_id, c), numSub·numCodes rows;
  *  - `enc/`    — (neighbor_id, m, code_id) PARTITIONED BY list_id.
  *
  * The `list_id` partitioning is what makes the IVF promise PHYSICAL:
  * a query filters the enc scan to its probes' nprobe lists, so
  * partition pruning keeps nprobe/nlists of the index files off disk
  * entirely (PartitionFilters in the scan — spec-asserted), instead of
  * reading everything and discarding rows. At 100 TB that is the
  * difference between scanning ~1 TB and scanning the corpus.
  *
  * `appendBatch` encodes NEW vectors against the PERSISTED codebooks
  * (quantizing a batch never retrains — the standard IVF maintenance
  * contract; rebuild when drift warrants it) and appends per-list
  * files. Single-writer-per-index, like every batch sink here.
  */
object AnnIndex {
  private def coarsePath(path: String) = s"$path/coarse"
  private def subPath(path: String) = s"$path/sub"
  private def encPath(path: String) = s"$path/enc"

  /** Derive seeded codebooks from the corpus, encode it, and publish
    * the three index tables.
    */
  def build(embeddings: DataFrame, path: String, dim: Int, nlists: Int = 8,
      numSub: Int = 8, numCodes: Int = 16): Unit = {
    val spark = embeddings.sparkSession
    val cents = Similarity.centroidsDf(spark,
      Similarity.seededCodebook(embeddings, nlists))
    cents.coalesce(1).write.mode(SaveMode.Overwrite).parquet(coarsePath(path))
    val sub = Similarity.seededSubCodebook(embeddings, dim, numSub, numCodes)
    sub.coalesce(1).write.mode(SaveMode.Overwrite).parquet(subPath(path))
    writeEnc(embeddings, cents, sub, path, dim, numSub, SaveMode.Overwrite)
  }

  /** Encode a new batch with the index's PERSISTED codebooks and
    * append its per-list files.
    */
  def appendBatch(batch: DataFrame, path: String, dim: Int,
      numSub: Int = 8): Unit = {
    val spark = batch.sparkSession
    val cents = spark.read.parquet(coarsePath(path)).localCheckpoint()
    val sub = spark.read.parquet(subPath(path)).localCheckpoint()
    writeEnc(batch, cents, sub, path, dim, numSub, SaveMode.Append)
  }

  private def writeEnc(vectors: DataFrame, cents: DataFrame, sub: DataFrame,
      path: String, dim: Int, numSub: Int, mode: SaveMode): Unit = {
    val enc = Similarity.pqEncodeWithCodebook(vectors, dim, numSub, sub)
    val lists = Similarity.nearestLists(
      vectors.select(col("vec_id").as("neighbor_id"),
        asDouble(col("embedding")).as("emb")),
      "neighbor_id", 1, cents)
      .select("list_id", "neighbor_id")
    // codes ⋈ list assignment: both O(N) — shuffle equi-join, same
    // contract as the inline IVF+PQ path
    enc.join(lists.hint("shuffle_hash"), Seq("neighbor_id"))
      .write.mode(mode).partitionBy("list_id").parquet(encPath(path))
  }

  /** Top-k ADC search against the stored index. Probe routing and ADC
    * tables are probe-bounded broadcasts (as in the inline path); the
    * enc scan is FILTERED to the probed list ids, which prunes whole
    * partition directories.
    */
  def query(spark: SparkSession, path: String, probes: DataFrame, k: Int,
      dim: Int, nprobe: Int = 4, numSub: Int = 8): DataFrame = {
    val cents = spark.read.parquet(coarsePath(path)).localCheckpoint()
    val sub = spark.read.parquet(subPath(path)).localCheckpoint()
    val probeLists = Similarity.nearestLists(
      probes.select(col("vec_id").as("query_id"),
        asDouble(col("embedding")).as("emb")),
      "query_id", nprobe, cents)
      .select("list_id", "query_id")
      .localCheckpoint()
    // |probes|·nprobe ids — driver-collected to a literal IN so the
    // filter lands as a static PartitionFilter on the scan
    val probed = probeLists.select("list_id").distinct()
      .collect().map(_.get(0))
    val enc = spark.read.parquet(encPath(path))
      .filter(col("list_id").isin(probed: _*))
    val probeTable = Similarity.pqProbeTable(probes, dim, numSub, sub)
    val rank = Window.partitionBy("query_id").orderBy(col("sd"), col("neighbor_id"))
    enc.join(broadcast(probeLists), Seq("list_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .join(broadcast(probeTable), Seq("query_id", "m", "code_id"))
      .groupBy("query_id", "neighbor_id").agg(sum(col("d2")).as("sd"))
      .withColumn("rank", row_number().over(rank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sd").cast("double") / lit(1000000.0), 6).as("approx_d2"))
      .orderBy("query_id", "rank")
  }
}
