package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.IncrementalWindow

/** ScalaCheck properties for the two invariants at the heart of the
  * reference's incremental design (SURVEY §5.3):
  *  1. incremental lookback+trim == full recompute, for ANY watermark;
  *  2. window results are invariant under input row order/partitioning.
  */
class PropertySpec extends SparkSpecBase {
  private def mkEvents(rows: Seq[(Long, Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "off_s", "value")
      .select(col("event_id"),
        expr("timestamp_micros(cast(1704067200000000 + off_s * 1000000 as long))").as("ts"),
        col("value"))
  }

  private val seriesGen: Gen[Seq[(Long, Long, Double)]] = for {
    n <- Gen.choose(1, 50)
    offs <- Gen.listOfN(n, Gen.choose(0L, 3600L))
    vals <- Gen.listOfN(n, Gen.choose(-100, 100).map(_ / 7.0))
  } yield offs.zip(vals).zipWithIndex.map { case ((o, v), i) => (i.toLong, o, v) }

  private def runProp(p: Prop, trials: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(trials).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  test("property: incremental window == full recompute for any watermark") {
    val p = Prop.forAll(seriesGen, Gen.choose(-10L, 3700L)) { (rows, wmOff) =>
      val events = mkEvents(rows)
      val wm = Timestamp.from(
        java.time.Instant.ofEpochSecond(1704067200L + wmOff))
      val w = Window.orderBy("ts", "event_id").rowsBetween(-4, 0)
      val full = events
        .withColumn("avg_value", round(avg(col("value")).over(w), 6))
        .filter(col("ts") > lit(wm))
        .select("event_id", "ts", "avg_value")
        .orderBy("ts", "event_id").collect().toSeq
      val inc = IncrementalWindow.trailingAvgPastWatermark(events, wm)
        .collect().toSeq
      full == inc
    }
    runProp(p, 15)
  }

  test("property: partitioned trailing window == global, arbitrary bucket sparsity") {
    // offsets span 5 days with clustering, so generated series contain
    // empty days and days with <4 rows — the cases that break naive
    // tail-forwarding repair
    val sparseGen: Gen[Seq[(Long, Long, Double)]] = for {
      n <- Gen.choose(1, 40)
      offs <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(0L, 3600L), // day 1 cluster
        Gen.choose(2L * 86400L, 2L * 86400L + 600L), // sparse day 3
        Gen.choose(4L * 86400L, 5L * 86400L - 1))) // day 5
      vals <- Gen.listOfN(n, Gen.choose(-50, 50).map(_ / 3.0))
    } yield offs.zip(vals).zipWithIndex.map { case ((o, v), i) => (i.toLong, o, v) }
    val p = Prop.forAll(sparseGen) { rows =>
      val events = mkEvents(rows)
      val w = Window.orderBy("ts", "event_id").rowsBetween(-4, 0)
      val global = events
        .withColumn("avg_value", round(avg(col("value")).over(w), 6))
        .withColumn("stddev_value", round(stddev(col("value")).over(w), 6))
        .select("event_id", "ts", "value", "avg_value", "stddev_value")
        .orderBy("ts", "event_id").collect().toSeq
      val parted = IncrementalWindow.partitionedTrailingStats(events).collect().toSeq
      global == parted
    }
    runProp(p, 10)
  }

  test("property: canonical corpus keeps exactly one doc per duplicate-text group") {
    import graft.operators.Dedup
    // random corpora with planted exact duplicates: survivors must be
    // the min id of every text group, and removed counts must add up
    val corpusGen: Gen[Seq[(Long, String)]] = for {
      nGroups <- Gen.choose(1, 8)
      texts <- Gen.listOfN(nGroups, Gen.choose(0, 4).map(i =>
        s"alpha beta gamma delta word$i epsilon zeta"))
      copies <- Gen.listOfN(nGroups, Gen.choose(1, 4))
    } yield texts.zip(copies).flatMap { case (t, c) => Seq.fill(c)(t) }
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val p = Prop.forAll(corpusGen) { rows =>
      import spark.implicits._
      val docs = rows.toDF("doc_id", "text")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.99)
      val out = Dedup.canonicalCorpus(docs, pairs, "doc_id").collect()
      val byText = rows.groupBy(_._2)
      val expectSurvivors = byText.values.map(_.map(_._1).min).toSet
      val gotSurvivors = out.map(_.getLong(0)).toSet
      val removedSum = out.map(r => r.getAs[Long]("removed_dups")).sum
      gotSurvivors == expectSurvivors &&
        removedSum == (rows.size - byText.size)
    }
    runProp(p, 10)
  }

  test("property: hash split is invariant under row order and partitioning") {
    import graft.operators.Sampling
    val idsGen: Gen[Seq[Long]] = Gen.choose(1, 60)
      .flatMap(n => Gen.listOfN(n, Gen.choose(0L, 100000L))).map(_.distinct)
    val p = Prop.forAll(idsGen, Gen.choose(1, 8)) { (ids, parts) =>
      import spark.implicits._
      def splitOf(df: DataFrame) =
        Sampling.split(df, "doc_id").select("doc_id", "split")
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val base = splitOf(ids.toDF("doc_id"))
      val shuffled = splitOf(
        scala.util.Random.shuffle(ids).toDF("doc_id").repartition(parts))
      base == shuffled
    }
    runProp(p, 10)
  }

  test("cluster-aware split: zero cross-split near-dup pairs; singletons == plain split") {
    import spark.implicits._
    import graft.operators.Sampling
    // edges chain 0-1-2 into one cluster, {10,11} another; 20, 21 are
    // singletons (present in docs, absent from pairs)
    val docs = Seq(0L, 1L, 2L, 10L, 11L, 20L, 21L).toDF("doc_id")
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Sampling.clusterAwareSplit(docs, "doc_id", pairs, "doc_a", "doc_b")
      .select("doc_id", "cluster_id", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // every member of a cluster shares the min-id label AND the split
    assert(Seq(0L, 1L, 2L).map(got(_)._1).distinct == Seq(0L))
    assert(Seq(0L, 1L, 2L).map(got(_)._2).distinct.size == 1)
    assert(Seq(10L, 11L).map(got(_)._1).distinct == Seq(10L))
    assert(Seq(10L, 11L).map(got(_)._2).distinct.size == 1)
    // therefore no pair straddles a split boundary
    assert(Seq((0L, 1L), (1L, 2L), (10L, 11L)).forall { case (a, b) =>
      got(a)._2 == got(b)._2 })
    // singletons cluster to their own id and get the plain hash split
    val plain = Sampling.split(docs, "doc_id").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(20L) == ((20L, plain(20L))) && got(21L) == ((21L, plain(21L))))
  }

  test("temperature sampling flattens the mixture toward sqrt weights") {
    import graft.operators.Sampling
    import spark.implicits._
    // 3 groups with strongly skewed sizes: 4000 / 900 / 100.
    val rows = (0 until 4000).map(i => (i.toLong, "big")) ++
      (0 until 900).map(i => (10000L + i, "mid")) ++
      (0 until 100).map(i => (20000L + i, "small"))
    val docs = rows.toDF("doc_id", "grp").repartition(7)
    val kept = Sampling.temperatureSample(docs, "doc_id", "grp",
      targetFrac = 0.5)
    val byGrp = kept.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = Map("big" -> 4000.0, "mid" -> 900.0, "small" -> 100.0)
    // Expected per-group quota: T * sqrt(n_i) / sum(sqrt) with T = 2500.
    val sumw = n.values.map(math.sqrt).sum
    n.foreach { case (g, ni) =>
      val quota = 0.5 * 5000.0 * math.sqrt(ni) / sumw
      val expected = math.min(ni, quota)
      val got = byGrp.getOrElse(g, 0L).toDouble
      // Binomial noise: 5 sigma around the quota.
      val sigma = math.sqrt(expected) * 5 + 5
      assert(math.abs(got - expected) <= sigma,
        s"$g: got $got expected ~$expected (±$sigma)")
    }
    // α=0.5 flattens: small group's keep RATE must exceed big group's.
    val rateSmall = byGrp("small").toDouble / 100.0
    val rateBig = byGrp("big").toDouble / 4000.0
    assert(rateSmall > rateBig * 2,
      s"flattening failed: small=$rateSmall big=$rateBig")
    // Stability: membership is a pure function of the id.
    val again = Sampling.temperatureSample(
      docs.repartition(3).orderBy(col("doc_id").desc), "doc_id", "grp")
      .select("doc_id").as[Long].collect().toSet
    val first = kept.select("doc_id").as[Long].collect().toSet
    assert(first == again, "membership changed under repartition/reorder")
  }

  test("epoch shuffle: dense per-shard positions, epoch-dependent, stable") {
    import graft.operators.Sampling
    import spark.implicits._
    val docs = (0L until 500L).toDF("doc_id")
    def orderOf(epoch: Int, parts: Int) =
      Sampling.epochShuffle(docs.repartition(parts), "doc_id", epoch, 8)
        .select("doc_id", "shard", "pos")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2))))
        .toMap
    val e1 = orderOf(1, 4)
    // positions are dense 1..n within each shard
    e1.values.groupBy(_._1).foreach { case (shard, members) =>
      val ps = members.map(_._2).toSeq.sorted
      assert(ps == (1 to ps.size), s"shard $shard positions not dense: $ps")
    }
    // pure function of (id, epoch): partitioning does not matter
    assert(e1 == orderOf(1, 11), "order changed under repartition")
    // a different epoch yields a different permutation
    val e2 = orderOf(2, 4)
    assert(e1 != e2, "epoch 2 produced the same order as epoch 1")
    // and every doc still appears exactly once
    assert(e2.keySet == (0L until 500L).toSet)
  }

  test("bloom-prefiltered decontamination == broadcast-exact decontamination") {
    import graft.operators.Decontamination
    val docs = graft.engine.Tables.documents(spark, sf("sf0.001"))
    val train = docs.filter(col("source") =!= "src0")
    val bench = docs.filter(col("source") === "src0")
    def toMap(df: DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = toMap(Decontamination.contaminated(train, bench, "doc_id", "text"))
    val bloom = toMap(Decontamination.contaminatedBloom(train, bench, "doc_id", "text"))
    assert(exact.nonEmpty, "degenerate fixture: no contamination found")
    assert(bloom == exact, "bloom prefilter changed the exact result")
  }

  test("shard packing: deterministic, dense shards that meet the token budget") {
    import graft.operators.Packing
    val docs = graft.engine.Tables.documents(spark, sf("sf0.001"))
    val budget = 5000L
    def run() = Packing.packByTokenBudget(docs, "doc_id", "text", budget, numParts = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val a = run(); val b = run()
    // deterministic across runs despite sampled range boundaries
    assert(a.sameElements(b), "packing not reproducible across runs")
    // shards are dense 0..max and every shard except the last reaches
    // the budget (a doc is assigned to the shard its start offset is in)
    val perShard = a.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val maxShard = perShard.keys.max
    assert(perShard.keySet == (0 to maxShard).toSet, "shard ids not dense")
    (0 until maxShard).foreach { s =>
      val withNext = perShard(s)
      assert(withNext >= budget - a.map(_._2).max && perShard(s) > 0,
        s"shard $s underfilled: ${perShard(s)}")
    }
  }

  test("property: token-budget cap is maximal — kept set fits, next hash-priority doc would not") {
    import spark.implicits._
    import graft.functions.Md5Family
    val docs = graft.engine.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).as("n_tokens"))
    val budget = 500L
    val kept = graft.operators.Sampling
      .capGroupsByTokens(docs, "doc_id", "lang", "n_tokens", budget,
        hashes = Md5Family)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(kept.nonEmpty)
    // full hash-priority order per group, computed independently
    val all = docs.withColumn("_h", Md5Family.hash(col("doc_id").cast("string")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    all.groupBy(_._2).foreach { case (lang, rows) =>
      val order = rows.sortBy(r => (r._4, r._1))
      val keptIds = kept.filter(_._2 == lang).map(_._1).toSet
      // kept = the maximal hash-order prefix whose token sum fits
      var cum = 0L
      order.foreach { case (id, _, n, _) =>
        cum += n
        assert(keptIds.contains(id) == (cum <= budget),
          s"$lang/$id: cum=$cum budget=$budget kept=${keptIds.contains(id)}")
      }
    }
  }

  test("property: weighted sampling matches a brute-force E-S draw; infinite weight forces inclusion") {
    import spark.implicits._
    import graft.functions.Md5Family
    val docs = graft.engine.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("source"), col("n_chars"))
    val got = graft.operators.Sampling
      .weightedSample(docs, "doc_id", "n_chars", k = 2, groupCol = "source")
      .collect().map(r => (r.getString(1), r.getInt(3), r.getLong(0))).toSet
    // brute-force reference: same deterministic u, same E-S key, local
    val rows = docs.withColumn("_h", Md5Family.hash(col("doc_id").cast("string")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expect = rows.groupBy(_._2).toSeq.flatMap { case (src, rs) =>
      rs.map { case (id, _, w, h) =>
        (id, math.log((h + 1).toDouble / math.pow(2, 60)) / w)
      }.sortBy { case (id, k) => (-k, id) }.take(2).zipWithIndex
        .map { case ((id, _), i) => (src, i + 1, id) }
    }.toSet
    assert(got == expect, s"E-S draw diverged:\n got=$got\n exp=$expect")
    // weight → ∞ forces inclusion: key ln(u)/w → 0 beats every finite key
    val boosted = docs.withColumn("n_chars",
      when(col("doc_id") === 7L, lit(1000000000L)).otherwise(col("n_chars")))
    val top = graft.operators.Sampling
      .weightedSample(boosted, "doc_id", "n_chars", k = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(top == Seq(7L), s"boosted doc not forced into the sample: $top")
    // non-positive weights are excluded, never sampled
    val zeroed = docs.withColumn("n_chars",
      when(col("doc_id") < 100L, lit(0L)).otherwise(col("n_chars")))
    val ids = graft.operators.Sampling
      .weightedSample(zeroed, "doc_id", "n_chars", k = 50)
      .select("doc_id").collect().map(_.getLong(0))
    assert(ids.forall(_ >= 100L), "zero-weight doc sampled")
  }

  test("property: window output invariant under input shuffling/partitioning") {
    val p = Prop.forAll(seriesGen, Gen.choose(1, 8)) { (rows, parts) =>
      val base = mkEvents(rows)
      val shuffled = mkEvents(scala.util.Random.shuffle(rows)).repartition(parts)
      def result(df: DataFrame) = {
        val w = Window.orderBy("ts", "event_id").rowsBetween(-4, 0)
        df.withColumn("avg_value", round(avg(col("value")).over(w), 6))
          .orderBy("ts", "event_id").collect().toSeq
      }
      result(base) == result(shuffled)
    }
    runProp(p, 10)
  }

  // small-vocab corpora so duplicate windows/segments actually occur
  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    nDocs <- Gen.choose(2, 6)
    vocab <- Gen.choose(2, 4)
    docs <- Gen.listOfN(nDocs, Gen.choose(0, 18).flatMap(len =>
      Gen.listOfN(len, Gen.choose(97, 96 + vocab).map(_.toChar.toString))))
  } yield docs.zipWithIndex.map { case (toks, i) => (i.toLong, toks.mkString(" ")) }

  test("property: duplicated-span removal matches a brute-force reference") {
    import spark.implicits._
    val L = 3
    val p = Prop.forAll(corpusGen) { docs =>
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
      val wins = toks.toSeq.flatMap { case (id, ts) =>
        if (ts.size >= L)
          (0 to ts.size - L).map(s => (id, s, ts.slice(s, s + L).mkString(" ")))
        else Seq.empty
      }
      val df = wins.groupBy(_._3).map { case (g, o) => g -> o.map(_._1).distinct.size }
      val dup = df.filter(_._2 >= 2).keySet
      val expected = docs.map { case (id, _) =>
        val ts = toks(id)
        val starts = wins.filter(w => w._1 == id && dup(w._3)).map(_._2)
        val covered = starts.flatMap(s => s until s + L).toSet
        val clean = ts.zipWithIndex
          .filterNot { case (_, i) => covered(i) }.map(_._1).mkString(" ")
        (id, ts.size, starts.size, covered.size, clean)
      }.sortBy(_._1)
      val got = graft.operators.Dedup
        .dupSpanRemoval(docs.toDF("doc_id", "text"), "doc_id", "text",
          spanLen = L, minDf = 2)
        .orderBy("doc_id").as[(Long, Int, Int, Int, String)].collect().toSeq
      got == expected
    }
    runProp(p, 12)
  }

  test("property: segment dedup matches a brute-force reference") {
    import spark.implicits._
    val L = 3
    val p = Prop.forAll(corpusGen) { docs =>
      val segsByDoc = docs.map { case (id, t) =>
        val ts = t.split(" ", -1).toSeq
        id -> (1 to math.max(ts.size, 1) by L)
          .map(s => ts.slice(s - 1, s - 1 + L).mkString(" "))
      }.toMap
      val df = segsByDoc.toSeq.flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (g, o) => g -> o.size }
      val hot = df.filter(_._2 > 1).keySet
      val expected = docs.map { case (id, _) =>
        val ss = segsByDoc(id)
        val kept = ss.filterNot(hot)
        (id, ss.size.toLong, kept.size.toLong, kept.mkString(" "))
      }.sortBy(_._1)
      val got = graft.operators.Dedup
        .segmentDedup(docs.toDF("doc_id", "text"), "doc_id", "text",
          segLen = L, maxDf = 1)
        .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
      got == expected
    }
    runProp(p, 12)
  }

  test("score calibration: z-scores vs a driver replay; constant/singleton groups NULL") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", 100L), (2L, "en", 200L), (3L, "en", 300L),
      (4L, "fr", 50L), (5L, "fr", 50L), // constant group → z NULL
      (6L, "zh", 7L) // singleton → z NULL
    ).toDF("doc_id", "lang", "score")
    val out = graft.operators.Sampling.scoreCalibration(docs, "doc_id", "lang", "score")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]), r.getDouble(4))).toMap
    // en: mean 200, sample stddev 100 → z = -1, 0, 1
    assert(out(1L)._1.contains(-1.0) && out(2L)._1.contains(0.0) &&
      out(3L)._1.contains(1.0))
    assert(out(4L)._1.isEmpty && out(5L)._1.isEmpty && out(6L)._1.isEmpty)
    // percent_rank: ties share a rank; singleton rank 0
    assert(out(1L)._2 == 0.0 && out(2L)._2 == 0.5 && out(3L)._2 == 1.0)
    assert(out(4L)._2 == 0.0 && out(5L)._2 == 0.0 && out(6L)._2 == 0.0)
  }

  test("vocab overlap: counts match hand-built token sets, no cartesian plan") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "a b c"), (2L, "s1", "c d"),      // s1 = {a,b,c,d}
      (3L, "s2", "c d e"),                          // s2 = {c,d,e}
      (4L, "s3", "x y")                             // s3 = {x,y}
    ).toDF("doc_id", "source", "text")
    val out = graft.operators.TextAnalysis.vocabOverlap(docs, "source", "text")
    val got = out.collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got(("s1", "s2")) == ((4L, 3L, 2L, 0.4)))  // {c,d} / {a,b,c,d,e}
    // zero-overlap pairs are ABSENT (inner token join), not 0-rows
    assert(!got.contains(("s1", "s3")) && !got.contains(("s2", "s3")))
    assert(got.size == 1)
    assert(!out.queryExecution.executedPlan.toString.contains("CartesianProduct"))
  }

  test("robust calibration: hand-computed median/MAD z; bins stable under repartition") {
    import spark.implicits._
    // en: scores 1..5 → med 3, adev {2,1,0,1,2} → mad 1, z = (x-3)/1.4826
    // fr: constant scores → MAD 0 → z NULL
    val docs = (1L to 5L).map(i => (i, "en", i.toDouble)).toSeq ++
      Seq((10L, "fr", 7.0), (11L, "fr", 7.0))
    val df = docs.toDF("doc_id", "lang", "score")
    val out = graft.operators.Sampling
      .robustCalibration(df, "doc_id", "lang", "score", bins = 2)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]), r.getInt(4))).toMap
    assert(out(3L)._1.contains(0.0))
    assert(out(1L)._1.contains(math.rint(-2.0 / 1.4826 * 1e6) / 1e6))
    assert(out(5L)._1.contains(math.rint(2.0 / 1.4826 * 1e6) / 1e6))
    assert(out(10L)._1.isEmpty && out(11L)._1.isEmpty)
    // deterministic bins: (score, id) tie-break pins membership
    assert(Seq(1L, 2L, 3L).forall(out(_)._2 == 1) &&
      Seq(4L, 5L).forall(out(_)._2 == 2))
    assert(out(10L)._2 == 1 && out(11L)._2 == 2)
    val again = graft.operators.Sampling
      .robustCalibration(df.repartition(7), "doc_id", "lang", "score", bins = 2)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]), r.getInt(4))).toMap
    assert(again == out, "calibration not invariant under partitioning")
  }

  test("session features agree with sessionize: counts, firsts, monotone positions") {
    import graft.operators.Sessions
    val events = graft.engine.Tables.events(spark, sf("sf0.001"))
    val feats = Sessions.sessionFeatures(events, gapMinutes = 30).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    assert(feats.length == events.count())
    val bySession = feats.groupBy(f => (f._2, f._3))
    val sessions = Sessions.sessionize(events, gapMinutes = 30).collect()
    assert(bySession.size == sessions.length,
      s"${bySession.size} feature sessions vs ${sessions.length} sessionize rows")
    val nEvents = sessions.map(r => r.getLong(0) -> r.getLong(3))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    bySession.groupBy(_._1._1).foreach { case (user, ss) =>
      assert(ss.values.map(_.size.toLong).sum == nEvents(user), s"user $user")
    }
    bySession.values.foreach { evs =>
      val sorted = evs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to evs.size), "event_idx not dense")
      val first = sorted.head
      assert(first._5 == 0L && first._6 == 0L,
        s"session start has nonzero deltas: $first")
      // secs_since_start is non-decreasing along the session
      assert(sorted.map(_._6).toSeq == sorted.map(_._6).sorted.toSeq)
    }
  }

  test("dim drift: zero on identical snapshots, detects a planted shift") {
    val emb = graft.engine.Tables.embeddings(spark, sf("sf0.001"))
    val self = graft.operators.Pca.dimDrift(emb, emb)
    assert(self.count() == 64)
    assert(self.filter(col("mean_shift") =!= 0.0).count() == 0)
    // shift dim 0 of the b side by +10: only dim 0 reports the shift
    val shifted = emb.withColumn("embedding",
      concat(array(element_at(col("embedding"), 1) + lit(10.0f)),
        slice(col("embedding"), 2, 63)))
    val drift = graft.operators.Pca.dimDrift(emb, shifted)
      .filter(col("mean_shift") > 0.001).collect()
    assert(drift.length == 1 && drift.head.getInt(0) == 0)
    assert(math.abs(drift.head.getDouble(5) - 10.0) < 0.01)
  }

  test("DSIR resampling: target-vocab docs outrank raw, layout-invariant importances") {
    import spark.implicits._
    // target docs speak "alpha/beta", raw background speaks
    // "noise0..4"; the mixed doc sits between — importance must order
    // target-vocab > mixed > background
    val docs = (
      (0 until 5).map(i => (i.toLong, "alpha beta alpha beta", 1)) ++
      Seq((5L, "alpha beta noise0 noise1", 0)) ++
      (6 until 30).map(i =>
        (i.toLong, s"noise${i % 5} noise${(i + 1) % 5} noise${(i + 2) % 5}", 0)))
      .toDF("doc_id", "text", "tgt")
    val out = graft.operators.Sampling
      .importanceResample(docs, "doc_id", "text", "tgt", n = 30, buckets = 64)
      .select("rank", "doc_id", "imp_nano")
      .as[(Int, Long, Long)].collect().toSeq
    val imp = out.map(r => r._2 -> r._3).toMap
    val targetMin = (0L until 5L).map(imp).min
    val backgroundMax = (6L until 30L).map(imp).max
    assert(targetMin > imp(5L) && imp(5L) > backgroundMax,
      s"importance ordering broken: $imp")
    // exact-integer importances: any repartitioning is bit-identical
    val re = graft.operators.Sampling
      .importanceResample(docs.repartition(7), "doc_id", "text", "tgt",
        n = 30, buckets = 64)
      .select("rank", "doc_id", "imp_nano")
      .as[(Int, Long, Long)].collect().toSeq
    assert(re == out)
  }

  test("decayed engagement: hand-computed weights, exact-integer layout invariance") {
    import spark.implicits._
    val tau = 100L
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(secs: Long) = new java.sql.Timestamp(t0.getTime + secs * 1000)
    // user 1: one event AT the max time (weight 1), one exactly tau
    // earlier (weight e^-1); user 2 defines the max time
    val ev = Seq(
      (1L, at(0), 10.0), (1L, at(100), 10.0), (2L, at(100), 2.0))
      .toDF("user_id", "ts", "value")
    val got = graft.operators.Sessions
      .decayedEngagement(ev, "user_id", "ts", "value", tau)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(got(0)._2 == 2L && got(1)._3 == 2000000L)
    val expected1 = (math.floor(10.0 * math.exp(-1.0) * 1e9 + 0.5).toLong
      + math.floor(10.0 * 1e9 + 0.5).toLong + 500L) / 1000L
    assert(got(0)._3 == expected1, s"got ${got(0)._3}, want $expected1")
    // layout invariance: exact integer sums
    val re = graft.operators.Sessions
      .decayedEngagement(ev.repartition(3), "user_id", "ts", "value", tau)
      .as[(Long, Long, Long)].collect().toSeq
    assert(re == got)
  }

  test("data card: within-source duplicate mass counts copies beyond the first") {
    import spark.implicits._
    val docs = Seq(
      (1L, "dup text", "en", "sA", 8L), (2L, "dup text", "en", "sA", 8L),
      (3L, "dup text", "fr", "sA", 8L), (4L, "unique", "en", "sA", 6L),
      (5L, "other", "de", "sB", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // replicate the registered query's body on the fixture (the
    // registered form reads the harness tables)
    val base = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), "\\s+"))).as("n_tokens"),
      sum(col("n_chars")).as("n_chars_total"),
      countDistinct(col("lang")).as("n_langs"))
    val dups = docs.select(col("source"), md5(col("text")).as("_d"))
      .groupBy("source", "_d").agg(count(lit(1)).as("_c"))
      .filter(col("_c") > 1)
      .groupBy("source").agg(sum(col("_c") - 1).as("n_dup_docs"))
    val card = base.join(dups, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_langs"),
        coalesce(col("n_dup_docs"), lit(0L)).as("n_dup_docs"))
      .orderBy("source")
      .as[(String, Long, Long, Long)].collect().toSeq
    // sA: 4 docs, 2 langs (en, fr), "dup text" x3 -> 2 copies beyond
    // the first
    assert(card == Seq(("sA", 4L, 2L, 2L), ("sB", 1L, 1L, 0L)), s"$card")
  }

  test("histogram matching: normalizer accepts all, zero-ref buckets reject all, shape converges") {
    import spark.implicits._
    // raw skews short (bucket 0-heavy), ref is uniform over 0..2
    val raw = (0 until 600).map(i => (i.toLong, (i % 6) match {
      case 0 | 1 | 2 | 3 => 0L; case 4 => 1L; case 5 => 2L
    })).toDF("doc_id", "b")
    val ref = (0 until 90).map(i => (10000L + i, (i % 3).toLong))
      .toDF("doc_id", "b")
    val rep = graft.operators.Sampling.histogramMatch(raw, ref, "doc_id", "b")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val byB = rep.map(r => r._1 -> r).toMap
    // raw is scarcest (relative to ref) in buckets 1 and 2 (100 raw
    // each vs 30 ref): they tie as normalizer -> acc exactly 1e6
    assert(byB(1L)._4 == 1000000L && byB(2L)._4 == 1000000L, s"got $rep")
    assert(byB(1L)._5 == byB(1L)._3 && byB(2L)._5 == byB(2L)._3,
      "normalizer buckets must keep every row")
    // bucket 0 is 4x over-represented -> acc 1/4, kept ~ n_raw/4
    assert(byB(0L)._4 == 250000L, s"expected 250000 ppm, got ${byB(0L)._4}")
    val kept0 = byB(0L)._5.toDouble / byB(0L)._3
    assert(kept0 > 0.15 && kept0 < 0.35, s"kept share $kept0 far from 1/4")
    // deterministic and layout-invariant
    val re = graft.operators.Sampling
      .histogramMatch(raw.repartition(7), ref, "doc_id", "b")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(re == rep)
    // a bucket absent from ref rejects everything
    val raw2 = raw.union(Seq((9999L, 5L)).toDF("doc_id", "b"))
    val rep2 = graft.operators.Sampling
      .histogramMatch(raw2, ref, "doc_id", "b")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val b5 = rep2.find(_._1 == 5L).get
    assert(b5._4 == 0L && b5._5 == 0L)
  }

  test("event funnel: order matters, same-timestamp ties count, drop-offs accumulate") {
    import spark.implicits._
    import graft.operators.Sessions
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // u1 completes in order; u2 clicked BEFORE signup (click must not
    // count) and never purchases; u3 signup+click same instant (tie
    // counts) but purchase precedes click -> no stage 3; u4 never
    // signs up, their click/purchase are invisible to the funnel
    val ev = Seq(
      (1L, ts(1), 1L, "signup"), (2L, ts(2), 1L, "click"),
      (3L, ts(3), 1L, "purchase"),
      (4L, ts(1), 2L, "click"), (5L, ts(5), 2L, "signup"),
      (6L, ts(2), 3L, "signup"), (7L, ts(2), 3L, "click"),
      (8L, ts(1), 3L, "purchase"),
      (9L, ts(1), 4L, "click"), (10L, ts(2), 4L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Sessions.eventFunnel(ev, "user_id", "ts", "event_type",
      Seq("signup", "click", "purchase"))
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(got == Seq((1, "signup", 3L, 1.0), (2, "click", 2L, 0.666667),
      (3, "purchase", 1L, 0.333333)), s"got $got")
  }

  test("event transitions: lead pairs under (ts, id) order, probs sum to 1 per prev") {
    import spark.implicits._
    import graft.operators.Sessions
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // u1: a->b->b ; u2: a->c ; same-timestamp pair ordered by event_id
    val ev = Seq(
      (1L, ts(1), 1L, "a"), (2L, ts(2), 1L, "b"), (3L, ts(2), 1L, "b"),
      (4L, ts(1), 2L, "a"), (5L, ts(2), 2L, "c"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Sessions.eventTransitions(ev, "user_id", "ts", "event_id",
      "event_type").as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("a", "b", 1L, 0.5), ("a", "c", 1L, 0.5),
      ("b", "b", 1L, 1.0)), s"got $got")
  }

  test("inter-arrival: hand gaps, exact Fano, degenerate users NULL") {
    import spark.implicits._
    import graft.operators.Sessions
    def ts(sec: Int) = new Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, ts(0), 1L), (2L, ts(10), 1L), (3L, ts(20), 1L), (4L, ts(50), 1L),
      (5L, ts(7), 2L),
      (6L, ts(0), 3L), (7L, ts(5), 3L))
      .toDF("event_id", "ts", "user_id")
    val got = Sessions.interArrival(ev, "user_id", "ts", "event_id")
      .as[(Long, Long, Long, Option[Double], Option[Long], Option[Double])]
      .collect().toSeq
    // u1 gaps {10,10,30}: mean 50/3, var_s (3*1100-2500)/6 = 800/6,
    // fano = (800/6)/(50/3) = 8 exactly
    assert(got == Seq(
      (1L, 4L, 3L, Some(16.666667), Some(30L), Some(8.0)),
      (2L, 1L, 0L, None, None, None),
      (3L, 2L, 1L, Some(5.0), Some(5L), None)), s"got $got")
  }

  test("curriculum interleave: dense per-bin positions, arithmetic round-robin rank") {
    import spark.implicits._
    import graft.operators.Sampling
    val rows = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L),
      (6L, 3L)).toDF("doc_id", "bin")
    val got = Sampling.curriculumInterleave(rows, "doc_id", "bin", nBins = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // rank arithmetic and global ordering
    got.foreach { case (_, bin, pos, gr) =>
      assert(gr == (pos - 1) * 3 + bin, s"rank arithmetic: $got")
    }
    assert(got.map(_._4) == got.map(_._4).sorted, "not ordered by rank")
    // per-bin positions are dense 1..|bin|
    got.groupBy(_._2).foreach { case (b, rs) =>
      assert(rs.map(_._3).sorted == (1L to rs.size), s"bin $b positions")
    }
    // the first training window (rank <= 3 slots) holds one row per bin
    val firstWave = got.filter(_._3 == 1).map(_._2).sorted
    assert(firstWave == Seq(1L, 2L, 3L), s"first wave: $got")
  }

  test("neyman allocation: weights track N·sd, largest remainder spends the budget exactly") {
    import spark.implicits._
    import graft.operators.Sampling
    // a: 4 rows sd 0 -> weight 0; b: high variance; c: low variance
    val rows = (Seq.fill(4)(("a", 10)) ++
      Seq(("b", 0), ("b", 100), ("b", 0), ("b", 100)) ++
      Seq(("c", 50), ("c", 52), ("c", 50), ("c", 52))).toDF("g", "v")
    val got = Sampling.neymanAllocation(rows, "g", "v", budget = 10L)
      .as[(String, Long, Double, Long, Long, Int)].collect().toSeq
    assert(got.map(_._5).sum == 10L, s"budget not spent exactly: $got")
    val byG = got.map(r => r._1 -> r).toMap
    assert(byG("a")._4 == 0L && byG("a")._5 == 0L, s"zero-sd stratum: $got")
    assert(byG("b")._5 > byG("c")._5, s"variance ordering: $got")
    // b's sd = 57.735027 (sample sd of {0,100,0,100}); weight 4x that
    assert(byG("b")._3 == 57.735027, s"sd: $got")
    assert(byG("b")._4 == 230940107676L, s"weight: $got")
  }

  test("rfm: five distinct users land one per quintile on every axis") {
    import spark.implicits._
    import graft.operators.Sessions
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // user i: last day 10+i, i events, value 10*i each
    val ev = (1 to 5).flatMap { i =>
      (1 to i).map(j => (i.toLong * 100 + j, ts(10 + i), i.toLong,
        10.0 * i))
    }.toDF("event_id", "ts", "user_id", "value")
    val got = Sessions.rfmSegments(ev, "user_id", "ts", "value",
      asOfDay = "2024-01-31")
      .as[(Long, Long, Long, Long, Int, Int, Int, String)].collect().toSeq
    got.foreach { case (u, rec, freq, mon, r, f, m, seg) =>
      assert(rec == 31 - (10 + u), s"recency($u): $got")
      assert(freq == u && mon == 10 * u * u, s"freq/mon($u): $got")
      assert(r == u && f == u && m == u, s"scores($u): $got")
      assert(seg == s"$u$u$u", s"segment($u): $got")
    }
  }

  test("srm: balanced arms score 0, an 8/2 split scores the closed form 3.6") {
    import spark.implicits._
    import graft.operators.Experiment
    val even = (Seq.fill(5)("A") ++ Seq.fill(5)("B")).toDF("arm")
    assert(Experiment.srmCheck(even, "arm")
      .as[(Long, Long, Long, Double)].collect().toSeq ==
      Seq((10L, 2L, 1L, 0.0)))
    // (8*2-10)^2/20 + (2*2-10)^2/20 = 1.8 + 1.8
    val skewed = (Seq.fill(8)("A") ++ Seq.fill(2)("B")).toDF("arm")
    assert(Experiment.srmCheck(skewed, "arm")
      .as[(Long, Long, Long, Double)].collect().toSeq ==
      Seq((10L, 2L, 1L, 3.6)))
  }

  test("top paths: sliding windows under (ts, id) order, exact counts, rank ties on path") {
    import spark.implicits._
    import graft.operators.Sessions
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      (1L, ts(1), 1L, "a"), (2L, ts(2), 1L, "b"), (3L, ts(3), 1L, "c"),
      (4L, ts(4), 1L, "d"),
      (5L, ts(1), 2L, "a"), (6L, ts(2), 2L, "b"), (7L, ts(3), 2L, "c"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Sessions.topPaths(ev, "user_id", "ts", "event_id",
      "event_type", len = 3, k = 10)
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "a>b>c", 2L), (2, "b>c>d", 1L)), s"got $got")
  }

  test("volume trend: linear daily growth reports the exact slope") {
    import spark.implicits._
    import graft.operators.Sessions
    def ts(day: Int, i: Int) =
      Timestamp.valueOf(f"2024-01-${10 + day}%02d 0$i:00:00")
    val ev = ((1 to 2).map(i => ("click", ts(0, i))) ++
      (1 to 4).map(i => ("click", ts(1, i))) ++
      (1 to 6).map(i => ("click", ts(2, i)))).toDF("event_type", "ts")
    val got = Sessions.volumeTrend(ev, "event_type", "ts")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(("click", 3L, 12L, 4.0, 2.0)), s"got $got")
  }

  test("cuped: a fully explanatory covariate equalizes arms; zero x-variance degrades to raw") {
    import spark.implicits._
    import graft.operators.Experiment
    // y = 2x exactly -> theta 2, rho2 1, both arms adjust to 50
    val m = Seq(("A", 10L, 20L), ("A", 20L, 40L),
      ("B", 30L, 60L), ("B", 40L, 80L)).toDF("arm", "x", "y")
    val got = Experiment.cuped(m, "arm", "x", "y")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got == Seq(("A", 2L, 30.0, 50.0, 2.0, 1.0),
      ("B", 2L, 70.0, 50.0, 2.0, 1.0)), s"got $got")
    val flat = Seq(("A", 5L, 20L), ("A", 5L, 40L),
      ("B", 5L, 60L), ("B", 5L, 80L)).toDF("arm", "x", "y")
    val raw = Experiment.cuped(flat, "arm", "x", "y")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(raw == Seq(("A", 2L, 30.0, 30.0, 0.0, 0.0),
      ("B", 2L, 70.0, 70.0, 0.0, 0.0)), s"got $raw")
  }

  test("mde: hand variance and the fixed z-constant formula") {
    import spark.implicits._
    import graft.operators.Experiment
    val m = Seq(("A", 0L), ("A", 2L), ("B", 0L), ("B", 2L)).toDF("arm", "y")
    val got = Experiment.minimumDetectableEffect(m, "arm", "y")
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val varY = (4.0 * 8.0 - 16.0) / (4.0 * 3.0)
    val mde = 2.801585 * math.sqrt(2.0 * varY / 2.0)
    assert(got == ((4L, 2L, 1.0, r6(varY), r6(mde), r6(mde / 1.0))),
      s"got $got want ${r6(mde)}")
  }

  test("padding report: sorted batching hits the hand-computed waste and never loses to hashed") {
    import spark.implicits._
    import graft.operators.Packing
    val rows = (1L to 8L).map(i => (i, i.toInt)).toDF("id", "n")
    val got = Packing.paddingReport(rows, "id", "n", batchSize = 4)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    val sorted = got.find(_._1 == "sorted").get
    // desc batches [8,7,6,5][4,3,2,1]: slots 32+16 = 48, real 36
    assert(sorted == (("sorted", 2L, 48L, 36L, 0.25)), s"got $sorted")
    val hashed = got.find(_._1 == "hashed").get
    assert(hashed._2 == 2L && hashed._4 == 36L, s"got $hashed")
    // sorted grouping minimizes the sum of per-batch maxima
    assert(hashed._3 >= sorted._3, s"hashed beat sorted?! $got")
  }

  test("table fingerprint: order/partition invariant, sensitive to cells and duplicate counts") {
    import spark.implicits._
    import graft.operators.Profile
    val base = Seq((1L, "a"), (2L, "b"), (3L, null.asInstanceOf[String]))
      .toDF("id", "s")
    def fp(df: org.apache.spark.sql.DataFrame) =
      Profile.tableFingerprint(df, Seq("id", "s"))
        .as[(Long, Long, Long)].collect().head
    val f0 = fp(base)
    assert(f0._1 == 3L && f0._2 == 3L)
    assert(fp(base.repartition(7)) == f0, "partitioning changed the fingerprint")
    assert(fp(base.orderBy(col("s").desc_nulls_last)) == f0,
      "row order changed the fingerprint")
    // a changed cell changes it
    val mut = Seq((1L, "a"), (2L, "B"), (3L, null.asInstanceOf[String]))
      .toDF("id", "s")
    assert(fp(mut)._3 != f0._3, "cell mutation went undetected")
    // doubling a row changes it (the naive xor would cancel a pair)
    val dup = base.unionAll(Seq((1L, "a")).toDF("id", "s"))
    val f2 = fp(dup.unionAll(Seq((1L, "a")).toDF("id", "s")))
    assert(f2._1 == 5L && f2._2 == 3L && f2._3 != f0._3,
      s"even-multiplicity duplicates cancelled: $f2 vs $f0")
  }

  test("bootstrap CI: constant column collapses the band, spread straddles the mean, layout-invariant") {
    import spark.implicits._
    import graft.operators.Sampling
    val const = (1L to 60L).map(i => (i, 42)).toDF("id", "v")
    val c = Sampling.bootstrapCiMean(const, "id", "v", b = 40)
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(c == ((60L, 40L, 42.0, 42.0, 42.0)), s"got $c")
    val spread = (1L to 100L).map(i => (i, i.toInt)).toDF("id", "v")
    val s = Sampling.bootstrapCiMean(spread, "id", "v", b = 200)
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(s._1 == 100L && s._2 == 200L && s._3 == 50.5, s"got $s")
    assert(s._4 < 50.5 && 50.5 < s._5, s"band must straddle the mean: $s")
    assert(s._4 > 30 && s._5 < 70, s"band implausibly wide: $s")
    val re = Sampling.bootstrapCiMean(spread.repartition(13), "id", "v",
      b = 200).as[(Long, Long, Double, Double, Double)].collect().head
    assert(re == s, "partitioning changed the CI")
  }

  test("water-fill mix: small groups saturate, refilled quota reaches the big group") {
    import spark.implicits._
    import graft.functions.Md5Family
    import graft.operators.Sampling
    // a:10 b:2 c:3, budget 0.8*15 = 12 -> q=4 saturates b,c (5 rows),
    // refill leaves a a quota of 7 -> rate 700000 ppm
    val docs = ((1 to 10).map(i => (i.toLong, "a")) ++
      Seq((11L, "b"), (12L, "b"), (13L, "c"), (14L, "c"), (15L, "c")))
      .toDF("id", "g")
    val got = Sampling.waterFillMix(docs, "id", "g", targetPpm = 800000L)
      .as[(String, Long, Int, Long, Long, Long)].collect().toSeq
    val expKeptA = docs.filter(col("g") === "a")
      .filter(pmod(Md5Family.hash(col("id").cast("string")), lit(1000000L))
        < lit(700000L)).count()
    assert(got == Seq(("a", 10L, 0, 7L, 700000L, expKeptA),
      ("b", 2L, 1, 2L, 1000000L, 2L),
      ("c", 3L, 1, 3L, 1000000L, 3L)), s"got $got (expKeptA=$expKeptA)")
    // full budget: everyone saturates
    val all = Sampling.waterFillMix(docs, "id", "g", targetPpm = 1000000L)
      .as[(String, Long, Int, Long, Long, Long)].collect().toSeq
    assert(all.forall(r => r._3 == 1 && r._6 == r._2), s"got $all")
  }

  test("rendezvous shards: moves only land on the new shard, assignment is layout-invariant") {
    import spark.implicits._
    import graft.operators.Sampling
    val ids = (1L to 400L).toDF("doc_id")
    val got = Sampling.rendezvousShards(ids, "doc_id", numShards = 8)
      .as[(Long, Int, Int, Int)].collect().toSeq
    assert(got.map(_._1) == (1L to 400L), "ids")
    assert(got.forall(r => r._2 >= 0 && r._2 < 8), "shard range")
    assert(got.forall(r => r._3 >= 0 && r._3 < 9), "shard_next range")
    // THE rendezvous property: growing 8 -> 9 shards can only move a
    // key to the NEW shard — old shards never trade keys
    got.filter(_._4 == 1).foreach { r =>
      assert(r._3 == 8, s"moved key landed on an old shard: $r")
    }
    got.filter(_._4 == 0).foreach { r =>
      assert(r._2 == r._3, s"unmoved key changed shard: $r")
    }
    // ~1/9 of keys move in expectation; allow a wide band
    val moved = got.count(_._4 == 1)
    assert(moved > 10 && moved < 120, s"moved=$moved of 400")
    // pure projection of the id -> any partition layout agrees
    val re = Sampling.rendezvousShards(ids.repartition(7), "doc_id", 8)
      .as[(Long, Int, Int, Int)].collect().toSeq
    assert(re == got, "layout changed the assignment")
  }

  test("property: isotonic minimax fit equals sequential PAV for any binned outcome") {
    import spark.implicits._
    val binGen: Gen[Seq[(Int, Int, Int)]] = for {
      b <- Gen.choose(2, 10)
      ns <- Gen.listOfN(b, Gen.choose(1, 30))
      ps <- Gen.sequence[Seq[Int], Int](ns.map(n => Gen.choose(0, n)))
    } yield (0 until b).map(i => (i, ns(i), ps(i)))
    // reference: the classic stack-based pool-adjacent-violators
    def pav(bins: Seq[(Long, Long)]): Seq[Double] = {
      val st = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double)]
      for ((n, pos) <- bins) {
        st += ((1, n.toDouble, pos.toDouble))
        while (st.length >= 2 && {
          val a = st(st.length - 2); val b = st.last
          a._3 / a._2 > b._3 / b._2 + 1e-12
        }) {
          val b = st.remove(st.length - 1); val a = st.remove(st.length - 1)
          st += ((a._1 + b._1, a._2 + b._2, a._3 + b._3))
        }
      }
      st.toSeq.flatMap { case (k, n, pos) => Seq.fill(k)(pos / n) }
    }
    val p = Prop.forAll(binGen) { bins =>
      val df = bins.toDF("bin", "n", "pos")
        .select(col("bin"), col("n").cast("long").as("n"),
          col("pos").cast("long").as("pos"))
      val got = graft.operators.Sampling.isotonicFromBins(df).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(4)))
        .sortBy(_._1)
      val iso = got.map(_._3)
      val ref = pav(bins.map(t => (t._2.toLong, t._3.toLong)))
      val monotone = iso.zip(iso.drop(1)).forall { case (a, b) => a <= b + 1e-9 }
      val matches = iso.zip(ref).forall { case (g, r) => math.abs(g - r) < 1.1e-6 }
      monotone && matches && iso.length == bins.length
    }
    runProp(p, 60)
  }

  test("property: AUC is in [0,1], label-flip antisymmetric, and matches brute-force pair counting") {
    import spark.implicits._
    val rowsGen: Gen[Seq[(Double, Boolean)]] = for {
      n <- Gen.choose(4, 60)
      scores <- Gen.listOfN(n, Gen.choose(0, 20).map(_ / 3.0))
      hits <- Gen.listOfN(n, Gen.oneOf(true, false))
    } yield scores.zip(hits)
    val p = Prop.forAll(rowsGen) { rows =>
      val nPos = rows.count(_._2); val nNeg = rows.size - nPos
      if (nPos == 0 || nNeg == 0) true
      else {
        val df = rows.map { case (sc, h) => ("g", sc, h) }
          .toDF("g", "score", "hit")
        val r = graft.operators.StatTests.mannWhitneyAuc(
          df, "g", "score", col("hit")).collect()(0)
        val auc = r.getDouble(3)
        // brute-force pair counting: wins + half-ties
        val pos = rows.filter(_._2).map(_._1)
        val neg = rows.filterNot(_._2).map(_._1)
        val u2 = pos.map(pp => neg.map(nn =>
          if (pp > nn) 2L else if (pp == nn) 1L else 0L).sum).sum
        val brute = u2.toDouble / (2.0 * nPos * nNeg)
        val flip = graft.operators.StatTests.mannWhitneyAuc(
          df, "g", "score", !col("hit")).collect()(0).getDouble(3)
        auc >= 0.0 && auc <= 1.0 &&
          math.abs(auc - (math.rint(brute * 1e6) / 1e6)) < 2e-6 &&
          math.abs(auc + flip - 1.0) < 2e-6
      }
    }
    runProp(p, 60)
  }
}
