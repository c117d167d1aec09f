package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.{AnnIndex, Similarity}

/** The persisted IVF+PQ index: I/O round-trip equals the inline
  * operator, queries prune unprobed list partitions at the scan, and
  * appended batches are searchable without retraining.
  */
class AnnIndexSpec extends SparkSpecBase {
  private lazy val emb = Tables.embeddings(spark, sf("sf0.001")).cache()

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))

  test("stored-index query == inline IVF+PQ under the same seeded codebooks") {
    val dir = Files.createTempDirectory("graft_annidx").toString + "/idx"
    AnnIndex.build(emb, dir, dim = 64)
    val probes = emb.filter(col("vec_id") < 10)
    val fromIndex = AnnIndex.query(spark, dir, probes, k = 3, dim = 64)
      .collect().map(key)
    val inline = Similarity.ivfPqTopKSeeded(emb, probes, k = 3, dim = 64)
      .collect().map(key)
    assert(fromIndex.nonEmpty)
    assert(fromIndex.sameElements(inline),
      s"index round-trip diverged: ${fromIndex.take(3).toSeq} vs ${inline.take(3).toSeq}")
  }

  test("query reads only probed list partitions (PartitionFilters on list_id)") {
    val dir = Files.createTempDirectory("graft_annprune").toString + "/idx"
    AnnIndex.build(emb, dir, dim = 64)
    val probes = emb.filter(col("vec_id") < 3)
    val plan = AnnIndex.query(spark, dir, probes, k = 3, dim = 64, nprobe = 2)
      .queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(l =>
      l.contains("PartitionFilters") && l.contains("list_id"))
    assert(scanLine.isDefined,
      s"enc scan carries no list_id partition filter:\n$plan")
  }

  test("stored-index re-ranked query == inline re-ranked operator") {
    val dir = Files.createTempDirectory("graft_annrr").toString + "/idx"
    AnnIndex.build(emb, dir, dim = 64)
    val probes = emb.filter(col("vec_id") < 10)
    val fromIndex = AnnIndex.queryReranked(spark, dir, probes, emb, k = 3,
      dim = 64).collect().map(key)
    val inline = Similarity.ivfPqTopKReranked(emb, probes, k = 3, dim = 64)
      .collect().map(key)
    assert(fromIndex.nonEmpty && fromIndex.sameElements(inline),
      "re-ranked index round-trip diverged from the inline operator")
  }

  test("retried batch append is a no-op once committed — no duplicate codes corrupt ADC sums") {
    val dir = Files.createTempDirectory("graft_annretry").toString + "/idx"
    AnnIndex.build(emb, dir, dim = 64)
    val probes = emb.filter(col("vec_id") < 10)
    val extra = probes.withColumn("vec_id", col("vec_id") + 10000L)
    AnnIndex.appendBatch(extra, dir, dim = 64, batchId = 1L)
    val first = AnnIndex.query(spark, dir, probes, k = 3, dim = 64)
      .collect().map(key)
    // a foreachBatch retry re-delivers the SAME batch id
    AnnIndex.appendBatch(extra, dir, dim = 64, batchId = 1L)
    val second = AnnIndex.query(spark, dir, probes, k = 3, dim = 64)
      .collect().map(key)
    assert(first.nonEmpty && first.sameElements(second),
      "retried append changed query results")
  }

  test("streaming ingestion: first micro-batch builds the index, later ones append") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("graft_annstream").toString
    val dir = s"$base/idx"
    val rows = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val ms = MemoryStream[(Long, Seq[Double])]
    val q = AnnIndex.indexStream(ms.toDF().toDF("vec_id", "embedding"),
      dir, s"$base/ckpt", dim = 64)
    try {
      ms.addData(rows.filter(_._1 % 2 == 0).toSeq)
      q.processAllAvailable()
      assert(AnnIndex.exists(spark, dir), "first micro-batch did not build")
      ms.addData(rows.filter(_._1 % 2 == 1).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val probes = emb.filter(col("vec_id") < 10)
    val got = AnnIndex.query(spark, dir, probes, k = 5, dim = 64).collect()
    assert(got.nonEmpty)
    val neighbors = got.map(_.getLong(2)).toSet
    assert(neighbors.exists(_ % 2 == 1),
      s"appended (odd-id) vectors never surface in results: $neighbors")
  }

  test("appended exact-duplicate vectors become searchable without retraining") {
    val dir = Files.createTempDirectory("graft_annapp").toString + "/idx"
    AnnIndex.build(emb, dir, dim = 64)
    val probes = emb.filter(col("vec_id") < 10)
    // append copies of the probe vectors under new ids: they quantize
    // to the probes' own codes, so each lands in the probe's own list
    // with the minimal possible ADC distance for that probe
    AnnIndex.appendBatch(
      probes.withColumn("vec_id", col("vec_id") + 10000L), dir, dim = 64)
    val got = AnnIndex.query(spark, dir, probes, k = 3, dim = 64).collect()
    got.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.size),
        s"query $q ranks not dense")
      assert(rows.exists(_.getLong(2) == q + 10000L),
        s"appended duplicate of $q not in its top-3: ${rows.map(_.getLong(2)).toSeq}")
    }
  }
}
