package graft

import org.apache.spark.sql.functions._

import graft.engine.{BuildTiming, Par}

/** Pins for the round-14 optimization internals: Par.inParallel's
  * failure/ordering contract, BuildTiming's UNION accounting under
  * concurrent builders, and the nearestLists n=1 argmax rewrite's
  * exact equivalence to the windowed rank-1 form it replaced.
  */
class ParOverlapSpec extends SparkSpecBase {

  test("inParallel runs all chains and rethrows a chain failure after all settle") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    Par.inParallel(
      () => { hits.incrementAndGet(); () },
      () => { hits.incrementAndGet(); () },
      () => { hits.incrementAndGet(); () })
    assert(hits.get == 3)
    val late = new java.util.concurrent.atomic.AtomicBoolean(false)
    val e = intercept[RuntimeException] {
      Par.inParallel(
        () => throw new RuntimeException("boom"),
        () => { Thread.sleep(150); late.set(true) })
    }
    assert(e.getMessage == "boom")
    // the failing chain must not cancel its sibling — all settle first
    assert(late.get)
  }

  test("BuildTiming union-accounts concurrent sections: wall of the union, not the thread sum") {
    BuildTiming.drainSeconds() // reset
    // two fully-overlapping 300 ms sections on separate threads: the
    // per-thread-sum accounting would record ~0.6 s; union ~0.3 s
    Par.inParallel(
      () => BuildTiming.timed { Thread.sleep(300) },
      () => BuildTiming.timed { Thread.sleep(300) })
    val union = BuildTiming.drainSeconds()
    assert(union >= 0.29 && union < 0.5,
      s"expected ~0.3 s union, got $union")
    // serial + nested behavior unchanged: nesting on one thread counts once
    BuildTiming.timed { BuildTiming.timed { Thread.sleep(120) } }
    val serial = BuildTiming.drainSeconds()
    assert(serial >= 0.11 && serial < 0.3, s"expected ~0.12 s, got $serial")
  }

  test("nearestLists n=1 argmax equals the windowed rank-1 assignment on a seeded corpus") {
    import org.apache.spark.sql.expressions.Window
    val s = spark
    import s.implicits._
    // deterministic pseudo-random 8-dim vectors, including exact ties
    // against duplicated centroids (rows 0 and 1 of the corpus double
    // as centroids, and centroid 3 duplicates centroid 2 so the
    // -list_id tie-break is exercised on every vector nearest to it)
    def vec(seed: Long): Seq[Double] =
      (0 until 8).map(j => ((seed * 31 + j * 17) % 101 - 50) / 50.0)
    val corpus = (0L until 40L).map(i => (i, vec(i))).toDF("vec_id", "emb")
    val cb = Seq(0L, 1L, 2L, 2L).zipWithIndex
      .map { case (seed, li) => (li, vec(seed)) }.toDF("list_id", "centroid")
    val scored = corpus.crossJoin(broadcast(cb))
      .withColumn("ccos", round(graft.functions.VectorExpressions
        .cosineFast(s)(col("emb"), col("centroid")), 6))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("list_id"))
    val windowed = scored.withColumn("crank", row_number().over(w))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("list_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val assigned = graft.operators.Similarity
      .nearestLists(corpus, "vec_id", 1, cb)
      .select(col("vec_id"), col("list_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigned.size == 40)
    assert(assigned == windowed)
    // the duplicated-centroid tie must resolve to the SMALLER list id
    assert(!assigned.values.exists(_ == 3),
      "centroid 3 duplicates centroid 2 — ties must pick list 2")
    // the lean (id, list_id)-only variant (round-15: the enc/routing
    // sites that never read the vector back) must pick the SAME rows,
    // including the duplicated-centroid tie-break
    val lean = graft.operators.Similarity
      .nearestListIds(corpus, "vec_id", cb)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(lean == windowed)
  }
}
