package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share
  * k-gram shingles with an evaluation/benchmark corpus, the standard
  * pre-training hygiene step (a benchmark item leaking into training
  * data inflates eval scores).
  *
  * Scale shape: the benchmark corpus is small by definition, so its
  * DISTINCT shingle set broadcasts; the training corpus is scanned
  * once, its shingle index joins map-side against the broadcast set,
  * and the per-document overlap count is a hash aggregate with map-side
  * partial aggregation. Nothing about the (huge) training side ever
  * shuffles except the matched rows.
  */
object Decontamination {
  /** Training docs with ≥1 shared k-shingle against `bench`:
    * (idCol, shared_grams = number of DISTINCT shared shingles).
    */
  def contaminated(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, k: Int = 5): DataFrame = {
    val trainGrams = train.select(col(idCol).as("doc"),
      explode(array_distinct(Dedup.shingles(col(textCol), k))).as("g"))
    val benchGrams = bench
      .select(explode(array_distinct(Dedup.shingles(col(textCol), k))).as("g"))
      .distinct()
    trainGrams.join(broadcast(benchGrams), Seq("g"))
      .groupBy(col("doc").as(idCol))
      .agg(count(lit(1)).as("shared_grams"))
      .orderBy(idCol)
  }

  /** The next scale tier of `contaminated`: when the benchmark shingle
    * set is too large for a broadcast-join hash table (~GBs at 10^8
    * shingles) but fits a Bloom filter (~100 MB at 1% fpp), prefilter
    * the training shingles MAP-SIDE through a broadcast Bloom filter,
    * then exact-verify only the survivors with an equi-join. False
    * positives are removed by the verify join and false negatives are
    * impossible, so the result is EXACTLY `contaminated`'s — the Bloom
    * stage is pure shuffle-volume reduction (only ~fpp of the clean
    * training shingles reach the exchange), which is why the same SQL
    * oracle checks this operator.
    *
    * The filter itself is built distributed (Catalyst's
    * `bloom_filter_agg` merges per-partition sketches map-side); the
    * one eager job it needs — sizing off the SMALL side's count — is
    * the standard price of sketch construction, never paid on the
    * training corpus. The per-row membership probe is Catalyst's
    * codegen `BloomFilterMightContain` over an xxhash64 key — the same
    * build/probe pair Spark's own runtime row-level filtering injects,
    * so the hot filter stays inside whole-stage codegen with no UDF
    * node in the plan (PlanSpec-asserted). A Scala-UDF probe remains as
    * the fallback if the internal expressions ever move; correctness
    * never depends on the probe either way (the verify join follows).
    */
  def contaminatedBloom(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, k: Int = 5, fpp: Double = 0.01): DataFrame = {
    val benchGrams = bench
      .select(explode(array_distinct(Dedup.shingles(col(textCol), k))).as("g"))
      .distinct().localCheckpoint()
    val trainGrams = train
      .select(col(idCol).as("doc"),
        explode(array_distinct(Dedup.shingles(col(textCol), k))).as("g"))
    // build/probe machinery shared with the generic runtime-filter
    // join (`BloomJoin`): codegen bloom_filter_agg/might_contain with
    // the UDF fallback inside
    trainGrams.filter(BloomJoin.probeColumn(benchGrams, "g", col("g"), fpp))
      .join(benchGrams, Seq("g"))
      .groupBy(col("doc").as(idCol))
      .agg(count(lit(1)).as("shared_grams"))
      .orderBy(idCol)
  }

  /** SEMANTIC decontamination — the modern complement of the shingle
    * probes above: a benchmark item that was paraphrased or translated
    * into the training set shares no 5-grams, but its embedding still
    * sits next to the benchmark's. Flags every training vector whose
    * cosine against ANY benchmark vector reaches `tau`, with the
    * benchmark hit count and the best-matching item.
    *
    * Routing reuses the seeded-IVF machinery ([[Similarity]]): coarse
    * codebook seeded FROM THE TRAINING CORPUS (hash-sampled, so the
    * whole chain stays oracle-expressible), corpus assigned to its 1
    * nearest list, bench probes fanned to `nprobe` lists — candidate
    * pairs are (corpus ∩ probed lists), never all pairs. Like any IVF
    * probe the flag set is approximate-by-routing: a paraphrase pair
    * split across non-probed lists is missed, the recall/cost dial is
    * `nprobe` (= nlists recovers the exact scan).
    *
    * Scale shape: the corpus never shuffles (its list assignment is a
    * map-side broadcast-codebook argmax) and never broadcasts; the
    * routed BENCH side — probe-bounded by definition — is
    * localCheckpointed and broadcast into the list-keyed join (the
    * q102 rule: a broadcast side must be a materialized probe/codebook
    * artifact, never a plan re-scanning a corpus). Per-corpus-vector
    * rollup is two window functions over ONE (train_id) partitioning.
    *
    * Output: (train_id, n_bench_hits, bench_id, cosine) for flagged
    * training vectors, best match per the (cosine DESC, bench_id)
    * tie-break, ordered by train_id. Thresholding compares the ROUNDED
    * 6dp cosine per the repo's cross-engine float rule.
    */
  def semanticContaminated(train: DataFrame, bench: DataFrame, tau: Double,
      nlists: Int = 8, nprobe: Int = 4): DataFrame = {
    import graft.functions.VectorFunctions.asDouble
    import graft.functions.VectorExpressions.cosineFast
    import org.apache.spark.sql.expressions.Window
    val spark = train.sparkSession
    val centroids = Similarity.centroidsDf(spark,
      Similarity.seededCodebook(train, nlists))
    val corpus = Similarity.nearestLists(
      train.select(col("vec_id").as("train_id"),
        asDouble(col("embedding")).as("emb")),
      "train_id", 1, centroids)
      .select(col("list_id"), col("train_id"), col("emb").as("t_emb"))
    val probes = Similarity.nearestLists(
      bench.select(col("vec_id").as("bench_id"),
        asDouble(col("embedding")).as("emb")),
      "bench_id", nprobe, centroids)
      .select(col("list_id"), col("bench_id"), col("emb").as("b_emb"))
      .localCheckpoint()
    val hits = corpus.join(broadcast(probes), Seq("list_id"))
      .withColumn("cosine",
        round(cosineFast(spark)(col("t_emb"), col("b_emb")), 6))
      .filter(col("cosine") >= tau)
    val byTrain = Window.partitionBy("train_id")
    val best = byTrain.orderBy(col("cosine").desc, col("bench_id"))
    hits
      .withColumn("n_bench_hits", count(lit(1)).over(byTrain))
      .withColumn("_rn", row_number().over(best))
      .filter(col("_rn") === 1)
      .select(col("train_id"), col("n_bench_hits"), col("bench_id"),
        col("cosine"))
      .orderBy("train_id")
  }

  /** [[semanticContaminated]] fed by a PERSISTED [[AnnIndex]] built
    * over the training corpus: the corpus-side routing is READ off the
    * index's live enc layout (`AnnIndex.listAssignments` — committed
    * batches, tombstones masked) and the bench probes route through
    * the index's persisted coarse centroids, so the per-audit cost is
    * a pruned read + the probe-bounded list join — the corpus is never
    * re-assigned. An index built with the same seeded codebook routes
    * identically to the inline operator (same centroids round-tripped
    * exactly through parquet doubles), so this shares q167's oracle
    * verbatim; `vectors` is the lake's embedding table for the
    * exact-cosine attach (the index stores codes, not raw embeddings).
    */
  def semanticContaminatedFromIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, vectors: DataFrame, bench: DataFrame, tau: Double,
      nprobe: Int = 4): DataFrame = {
    import graft.functions.VectorFunctions.asDouble
    import graft.functions.VectorExpressions.cosineFast
    import org.apache.spark.sql.expressions.Window
    val centroids = AnnIndex.coarseCentroids(spark, indexPath)
      .localCheckpoint()
    val corpus = AnnIndex.listAssignments(spark, indexPath)
      .select(col("list_id"), col("neighbor_id").as("train_id"))
      .join(vectors.select(col("vec_id").as("train_id"),
        asDouble(col("embedding")).as("t_emb")), Seq("train_id"))
    val probes = Similarity.nearestLists(
      bench.select(col("vec_id").as("bench_id"),
        asDouble(col("embedding")).as("emb")),
      "bench_id", nprobe, centroids)
      .select(col("list_id"), col("bench_id"), col("emb").as("b_emb"))
      .localCheckpoint()
    val hits = corpus.join(broadcast(probes), Seq("list_id"))
      .withColumn("cosine",
        round(cosineFast(spark)(col("t_emb"), col("b_emb")), 6))
      .filter(col("cosine") >= tau)
    val byTrain = Window.partitionBy("train_id")
    val best = byTrain.orderBy(col("cosine").desc, col("bench_id"))
    hits
      .withColumn("n_bench_hits", count(lit(1)).over(byTrain))
      .withColumn("_rn", row_number().over(best))
      .filter(col("_rn") === 1)
      .select(col("train_id"), col("n_bench_hits"), col("bench_id"),
        col("cosine"))
      .orderBy("train_id")
  }
}
