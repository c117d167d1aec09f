package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{BatchStore, BuildTiming}
import graft.functions.HashFamily

/** Persisted NEAR-DUP PAIR store: the (doc_a, doc_b, signal, score)
  * edge set every governance audit reads, maintained INCREMENTALLY so
  * pair mining — the dominant cost of a 100 TB dedup/audit tier — is
  * paid once per document, not once per audit. Before this store,
  * q142/q180/q325 each re-ran `ngramJaccardPairs` + `lshNeighborPairs`
  * from raw text/vectors in-query (q325 alone re-mined BOTH signals);
  * now they read committed pairs and the mining cost amortizes across
  * the audit tier exactly like q326's ingest-once image hashes.
  *
  * Exactness (streamed ≡ one-shot): both mined signals are PURE
  * PAIRWISE predicates — n-gram Jaccard with no df cap
  * (`round(|A∩B|/(|A|+|B|−|A∩B|), 6) >= t` over each doc's own
  * distinct shingles) and seeded sign-LSH banding + exact cosine
  * (collision is a function of the two docs' own signatures) — so
  * pairs(corpus) decomposes exactly into per-batch increments: a pair
  * (a, b) with a ∈ batch_i, b ∈ batch_j (i ≤ j) is mined exactly once,
  * at batch_j, as new×standing (or new×new when i == j). The union
  * over batches equals the one-shot mining bit-for-bit, which is what
  * lets the store-fed queries keep their one-shot DuckDB oracles.
  *
  * Incremental cost: a batch pays |batch shingles| ⋈ standing-index
  * lookups (an equi-join against the persisted gram/signature stores),
  * never a corpus re-scan — the per-doc state rows (hashed grams, LSH
  * signatures, sizes) persist beside the pairs so standing docs are
  * never re-tokenized or re-projected.
  *
  * Layout — five `BatchStore` roots under one path, each with the
  * per-dir `_SUCCESS` contract (committed-skip retries, staged-swap
  * [[compact]], heal at every entry point):
  * {{{
  *   path/grams       (doc, g)                  hashed-shingle index rows
  *   path/sizes       (doc, n)                  distinct-shingle counts
  *   path/sig         (vec_id, table, bucket)   sign-LSH signatures
  *   path/text_pairs  (doc_a, doc_b, score)     mined Jaccard pairs
  *   path/emb_pairs   (doc_a, doc_b, score)     mined cosine pairs
  * }}}
  * Commit ORDER inside a step is load-bearing: the batch's PAIRS land
  * first, its per-doc STATE rows last — the state dir is the retry
  * gate, so a crash between the two re-mines (overwriting the pair dir
  * idempotently) instead of losing the batch from the standing index.
  * Standing reads filter `batch_id < current`, so a half-committed
  * crash leftover can never feed its own retry's mining.
  */
object PairStore {
  private def grams(p: String) = s"$p/grams"
  private def sizes(p: String) = s"$p/sizes"
  private def sig(p: String) = s"$p/sig"
  private def textPairs(p: String) = s"$p/text_pairs"
  private def embPairs(p: String) = s"$p/emb_pairs"

  // one owner for the per-dir _SUCCESS commit convention: BatchStore
  private def committed(spark: SparkSession, root: String, batchId: Long): Boolean =
    BatchStore.committedBatches(spark, root).contains(batchId)

  /** Drop batch dirs in the DEPENDENT stores (pairs, intermediate
    * state like sizes) newer than the GATE store's newest committed
    * dir. A crash inside a step's commit sequence (pairs → sizes →
    * grams; the gate lands LAST) leaves ORPHAN generations in the
    * earlier stores; the retry gate correctly re-mines them — but if a
    * compaction ran in between, an orphan id would have been folded
    * into that store's max generation, and the retry's overwrite of
    * that dir would destroy every previously folded row (pairs lost
    * outright; a sizes loss additionally empties the retry's standing
    * side so its new×standing pairs silently vanish). Dropping orphans
    * at every mutation entry point keeps the retry's overwrite target
    * and any fold disjoint; the dropped rows are exactly what the
    * retry re-computes, so nothing is lost.
    *
    * HEALS every root first: a crash mid-swap of the GATE store's own
    * compaction (root renamed to backup, second rename pending) would
    * otherwise read as zero committed gate batches and the drop would
    * delete every committed dependent dir — permanent loss, since the
    * gate's heal then restores the state and those docs are never
    * re-mined. Heal-before-drop is the same order [[appendDocs]]
    * always had; this puts it inside the drop so the compaction entry
    * points inherit it too.
    */
  private def dropOrphans(spark: SparkSession, gateRoot: String,
      dependentRoots: Seq[String]): Unit = {
    (gateRoot +: dependentRoots).foreach(BatchStore.heal(spark, _))
    val gateMax = BatchStore.committedBatches(spark, gateRoot)
      .foldLeft(-1L)(math.max)
    dependentRoots.foreach { root =>
      val fs = new Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      BatchStore.committedBatches(spark, root)
        .filter(_ > gateMax)
        .foreach(b => fs.delete(new Path(s"$root/batch_id=$b"), true))
    }
  }

  /** Committed generations strictly BEFORE `batchId` — the standing
    * side of an increment. Post-compaction the folded generation keeps
    * the MAX folded id and ids are never reissued, so the strict
    * filter is correct across folds; `empty` supplies the schema when
    * no earlier generation exists.
    */
  private def standing(spark: SparkSession, root: String, batchId: Long,
      empty: DataFrame): DataFrame = {
    BatchStore.heal(spark, root)
    if (!BatchStore.committedBatches(spark, root).exists(_ < batchId)) empty
    else BatchStore.read(spark, root)
      .filter(col("batch_id") < batchId).drop("batch_id")
  }

  private def writeBatch(df: DataFrame, root: String, batchId: Long): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$root/batch_id=$batchId")

  /** Append one DOC batch: mines the n-gram-Jaccard pairs touching the
    * batch (new×new ∪ new×standing via the persisted gram index) into
    * `text_pairs`, then lands the batch's gram/size state. Batches
    * must partition the corpus by doc (the profile-store contract); a
    * retried committed batch is a no-op. Defaults mirror
    * `Dedup.ngramJaccardPairs`'s q142/q180/q325 configuration.
    */
  def appendDocs(batch: DataFrame, idCol: String, textCol: String,
      path: String, batchId: Long, k: Int = 3, threshold: Double = 0.5,
      gramHash: Option[HashFamily] = Some(graft.functions.XxHash64Family)): Unit =
    BuildTiming.timed {
      val spark = batch.sparkSession
      dropOrphans(spark, grams(path), Seq(textPairs(path), sizes(path)))
      if (!committed(spark, grams(path), batchId)) { // committed retry = no-op
      // the exploded batch index feeds both mining join sides, the
      // size table, and its own persist — checkpoint or it shingles 4×
      val gNew = Dedup.shingleIndex(batch, idCol, textCol, k,
        maxDf = Int.MaxValue, gramHash = gramHash).localCheckpoint()
      val nNew = gNew.groupBy("doc").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val gOld0 = standing(spark, grams(path), batchId, gNew.limit(0))
      // Bloom-prefilter the STANDING gram scan to (probably) batch
      // grams before its shuffle: the standing index is corpus-scale
      // (the store's fat table) while a batch touches only its own
      // gram vocabulary — without this, every increment shuffles the
      // whole standing index. Map-side codegen might_contain; false
      // positives are dropped by the exact equi-join below, so the
      // mined pairs are unchanged (BloomJoin's contract).
      val gOld = gOld0.filter(BloomJoin.probeColumn(gNew, "g", col("g")))
      val nOld = standing(spark, sizes(path), batchId, nNew.limit(0))
      // pairs touching the batch, each exactly once: anchor ∈ new;
      // other ∈ standing (batches are doc-disjoint) or new with
      // anchor < other
      val aNew = gNew.select(col("doc").as("da"), col("g"))
      val hits = aNew
        .join(gOld.select(col("doc").as("db"), col("g")), Seq("g"))
        .select(least(col("da"), col("db")).as("doc_a"),
          greatest(col("da"), col("db")).as("doc_b"))
        .unionByName(aNew
          .join(gNew.select(col("doc").as("db"), col("g")), Seq("g"))
          .filter(col("da") < col("db"))
          .select(col("da").as("doc_a"), col("db").as("doc_b")))
      val common = hits.groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
      val allN = nOld.unionByName(nNew)
      val mined = common
        .join(allN.select(col("doc").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
        .join(allN.select(col("doc").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
        .withColumn("score", round(col("common").cast("double")
          / (col("n_a") + col("n_b") - col("common")), 6))
        .filter(col("score") >= threshold)
        .select(col("doc_a"), col("doc_b"), col("score"))
      // pairs FIRST (a retry re-mines and overwrites them — idempotent),
      // state LAST (the retry gate: a crash in between must re-mine,
      // never lose the batch from the standing index)
      writeBatch(mined, textPairs(path), batchId)
      writeBatch(nNew, sizes(path), batchId)
      writeBatch(gNew, grams(path), batchId)
      }
    }

  /** Append one EMBEDDING batch: mines the sign-LSH + exact-cosine
    * pairs touching the batch into `emb_pairs`, then lands the batch's
    * signature rows. `vectors` is the lake's embedding table (any
    * frame covering every id appended SO FAR) — only the candidate
    * pairs' two vectors are attached, the store itself never copies
    * embeddings. Defaults mirror `Similarity.lshNeighborPairs`'s
    * q180/q325 configuration.
    */
  def appendEmbeddings(batch: DataFrame, vectors: DataFrame, path: String,
      batchId: Long, threshold: Double = 0.4, bits: Int = 6,
      tables: Int = 8, seed: Long = 42L): Unit =
    BuildTiming.timed {
      val spark = batch.sparkSession
      dropOrphans(spark, sig(path), Seq(embPairs(path)))
      if (!committed(spark, sig(path), batchId)) { // committed retry = no-op
      val sNew = Similarity.lshSignatureRows(batch, bits, tables, seed)
        .localCheckpoint() // both mining join sides + its own persist
      val sOld = standing(spark, sig(path), batchId, sNew.limit(0))
      val aNew = sNew.select(col("table"), col("bucket"), col("vec_id").as("ia"))
      val cand = aNew
        .join(sOld.select(col("table"), col("bucket"), col("vec_id").as("ib")),
          Seq("table", "bucket"))
        .select(least(col("ia"), col("ib")).as("doc_a"),
          greatest(col("ia"), col("ib")).as("doc_b"))
        .unionByName(aNew
          .join(sNew.select(col("table"), col("bucket"), col("vec_id").as("ib")),
            Seq("table", "bucket"))
          .filter(col("ia") < col("ib"))
          .select(col("ia").as("doc_a"), col("ib").as("doc_b")))
        .dropDuplicates("doc_a", "doc_b")
      val emb = vectors.select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("emb"))
      val mined = cand
        .join(emb.select(col("vec_id").as("doc_a"), col("emb").as("ea")), Seq("doc_a"))
        .join(emb.select(col("vec_id").as("doc_b"), col("emb").as("eb")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          round(graft.functions.VectorExpressions.cosineFast(spark)(
            col("ea"), col("eb")), 6).as("score"))
        .filter(col("score") >= threshold)
      writeBatch(mined, embPairs(path), batchId)
      writeBatch(sNew, sig(path), batchId)
      }
    }

  /** Every committed pair, both signals — what the audit tier reads.
    * A signal whose store has no committed generation yet contributes
    * zero rows (schema pinned), so a docs-only or embeddings-only
    * store still reads.
    */
  def pairs(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_a", LongType), StructField("doc_b", LongType),
      StructField("score", DoubleType), StructField("signal", StringType)))
    def readSignal(root: String, signal: String): DataFrame = {
      BatchStore.heal(spark, root)
      if (BatchStore.committedBatches(spark, root).isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else BatchStore.read(spark, root).drop("batch_id")
        .select(col("doc_a").cast("long"), col("doc_b").cast("long"),
          col("score").cast("double"), lit(signal).as("signal"))
    }
    readSignal(textPairs(path), "ngram")
      .unionByName(readSignal(embPairs(path), "emb"))
  }

  /** Fold the TEXT signal's sub-stores (grams/sizes/text_pairs) into
    * one generation each — what the text stream's own foreachBatch may
    * call. Orphan pair/sizes dirs are dropped FIRST (after healing all
    * three roots) so a crash-window orphan can never be folded into
    * the generation a retry will overwrite.
    */
  def compactText(spark: SparkSession, path: String): Unit =
    BuildTiming.timed {
      dropOrphans(spark, grams(path), Seq(textPairs(path), sizes(path)))
      Seq(grams(path), sizes(path), textPairs(path))
        .foreach(BatchStore.compact(spark, _))
    }

  /** Fold the EMBEDDING signal's sub-stores (sig/emb_pairs) — the
    * embedding stream's own compaction hook.
    */
  def compactEmbeddings(spark: SparkSession, path: String): Unit =
    BuildTiming.timed {
      dropOrphans(spark, sig(path), Seq(embPairs(path)))
      Seq(sig(path), embPairs(path)).foreach(BatchStore.compact(spark, _))
    }

  /** Fold every sub-store (the `BatchStore.compact` staged-swap
    * contract; identity merge — rows are disjoint across batches by
    * construction). Single-writer discipline applies PER SIGNAL: call
    * this only when NO stream is writing either signal; a live text
    * stream may call [[compactText]] and a live embedding stream
    * [[compactEmbeddings]] — each folds only the stores its own
    * foreachBatch writes, never the sibling stream's.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    compactText(spark, path)
    compactEmbeddings(spark, path)
  }

  /** The doc-side store as a streaming query over a document stream
    * (the embedding side runs the same way off an embedding stream
    * with [[appendEmbeddings]] in its own foreachBatch). Compaction
    * folds ONLY this stream's stores ([[compactText]]) so a sibling
    * embedding stream's committed batches are never swapped out from
    * under it.
    */
  def textPairStream(rows: DataFrame, idCol: String, textCol: String,
      storePath: String, checkpoint: String,
      compactEvery: Int = 0): org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendDocs(batch, idCol, textCol, storePath, batchId)
        if (compactEvery > 0 && BatchStore
            .committedBatches(batch.sparkSession, grams(storePath))
            .size >= compactEvery)
          compactText(batch.sparkSession, storePath)
      }
      .start()
}
