package graft

import org.apache.spark.sql.functions._
import graft.operators.{Chunking, ZOrder}

/** Invariants for the round-4 layout/prep operators: token chunking
  * (coverage/overlap/reconstruction) and z-order clustering (bit
  * interleave correctness + the file-skipping property the layout
  * exists for: narrow per-partition min/max on BOTH key columns).
  */
class ChunkingZOrderSpec extends SparkSpecBase {

  test("chunking covers every token with the declared overlap") {
    import spark.implicits._
    val chunkSize = 10
    val stride = 7
    // lengths straddling every edge: < chunk, == chunk, == chunk+1,
    // exact multiple-of-stride landings, and a long one
    val docs = Seq(1 -> 3, 2 -> 10, 3 -> 11, 4 -> 17, 5 -> 24, 6 -> 80)
      .map { case (id, n) => (id.toLong, (0 until n).map(i => s"t$i").mkString(" ")) }
      .toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(docs, "doc_id", "text", chunkSize, stride)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    for ((id, n) <- Seq(1 -> 3, 2 -> 10, 3 -> 11, 4 -> 17, 5 -> 24, 6 -> 80)) {
      val chunks = out.filter(_._1 == id).sortBy(_._2)
      val expected = if (n <= chunkSize) 1
        else math.ceil((n - chunkSize).toDouble / stride).toInt + 1
      assert(chunks.length == expected, s"doc $id: ${chunks.length} chunks, want $expected")
      // every chunk's text is exactly the declared token slice
      chunks.foreach { case (_, cid, nTok, text) =>
        val want = (cid * stride until math.min(cid * stride + chunkSize, n))
          .map(i => s"t$i").mkString(" ")
        assert(text == want, s"doc $id chunk $cid text mismatch")
        assert(nTok == math.min(chunkSize, n - cid * stride))
      }
      // coverage: union of [start, start+len) spans is [0, n)
      val covered = chunks.flatMap { case (_, cid, nTok, _) =>
        cid * stride until (cid * stride + nTok) }.toSet
      assert(covered == (0 until n).toSet, s"doc $id: tokens not fully covered")
    }
  }

  test("interleave places x bits at even and y bits at odd positions") {
    import spark.implicits._
    val df = Seq((5L, 3L), (0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L))
      .toDF("x", "y")
    val got = df.select(ZOrder.interleave(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x=0b101, y=0b011 → z bits (from 0): x0=1,y0=1,x1=0,y1=1,x2=1,y2=0 = 0b011011
    def ref(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))).reduce(_ | _)
    assert(got == Seq((5L, 3L), (0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L))
      .map { case (x, y) => ref(x, y) })
    assert(ref(5L, 3L) == 27L)
  }

  test("z-order layout narrows per-file ranges on BOTH columns; 1-D sort does not") {
    // uniform 128×128 grid: 7 bits per dimension, so 16 range
    // partitions cut the top 4 z bits = 2 bits per dimension → each
    // file's (x, y) bounding box is ~1/4 of the global range on BOTH
    // axes. (A lopsided-cardinality pair like partkey×suppkey would
    // degenerate toward the wide key — that's a property of the curve,
    // not the implementation, and why zOrdered documents rank-mapping.)
    val n = 128 * 128
    val grid = spark.range(n).select(
      (col("id") % 128).as("x"), (col("id") / 128).cast("long").as("y"))
    val numFiles = 16
    def avgRange(df: org.apache.spark.sql.DataFrame, c: String): Double =
      df.withColumn("_pid", spark_partition_id())
        .groupBy("_pid").agg((max(col(c)) - min(col(c))).as("r"))
        .agg(avg(col("r"))).head.getDouble(0)
    val z = ZOrder.zOrdered(grid, "x", "y", numFiles).localCheckpoint()
    val oneD = grid.repartitionByRange(numFiles, col("x"))
      .sortWithinPartitions("x").localCheckpoint()
    // z-order: BOTH columns' per-file ranges shrink well below global
    assert(avgRange(z, "x") < 0.45 * 127,
      s"z x range ${avgRange(z, "x")} vs global 127")
    assert(avgRange(z, "y") < 0.45 * 127,
      s"z y range ${avgRange(z, "y")} vs global 127")
    // 1-D sort: the non-sorted column stays ~global per file
    assert(avgRange(oneD, "y") > 0.8 * 127,
      "1-D layout unexpectedly narrowed the secondary column")
  }

  test("pruningStats: z-cell files skip on both axes for range predicates") {
    // 128×128 grid, cellBits=10 → 16 files, each a 32×32 rectangle.
    // A 32-wide predicate on either axis overlaps exactly one row/
    // column of rectangles: 4 of 16 files read, 12 skipped.
    val grid = spark.range(128L * 128L).select(
      (col("id") % 128).as("x"), (col("id") / 128).cast("long").as("y"))
    val stats = ZOrder.pruningStats(grid, "x", "y",
      xLo = 0, xHi = 31, yLo = 0, yHi = 31, bits = 7, cellBits = 10)
      .collect()
    assert(stats.length == 16, s"${stats.length} files, want 16")
    stats.foreach { r =>
      assert(r.getAs[Long]("n_rows") == 1024L)
      assert(r.getAs[Long]("x_max") - r.getAs[Long]("x_min") == 31L)
      assert(r.getAs[Long]("y_max") - r.getAs[Long]("y_min") == 31L)
    }
    assert(stats.count(_.getAs[Boolean]("read_x")) == 4)
    assert(stats.count(_.getAs[Boolean]("read_y")) == 4)
    // the predicate on both axes together touches exactly ONE file
    assert(stats.count(r =>
      r.getAs[Boolean]("read_x") && r.getAs[Boolean]("read_y")) == 1)
  }
}
