package graft

import org.apache.spark.sql.functions._
import graft.operators.{Classifier, TextAnalysis}

/** Hand-computed golden fixtures for the round-4 text operators —
  * independent of the DuckDB oracle, so a cross-engine-agreed-but-wrong
  * formula can't hide.
  */
class TextOpsGoldenSpec extends SparkSpecBase {

  test("logistic training: signal bucket learns positive weight, loss falls, layout-invariant") {
    import spark.implicits._
    import graft.operators.Classifier
    import graft.functions.Md5Family
    // y = presence of the token "good" — after one GD step from w=0
    // the gradient is lr·mean((y−0.5)·x_b), so "good"'s bucket must
    // carry the largest positive weight
    val docs = (0 until 40).map { i =>
      val hasGood = i % 2 == 0
      val text = (if (hasGood) "good " else "") + s"w${i % 5} w${i % 7} filler"
      (i.toLong, text, if (hasGood) 1 else 0)
    }.toDF("doc_id", "text", "y")
    val out = Classifier.trainLogistic(docs, "doc_id", "text", "y",
      buckets = 32, iters = 2, lrPpm = 500000L, hashes = Md5Family)
    val rows = out.as[(Int, Long, Long, Long, Long)].collect().toSeq
    // replay the operator's own bucketing to find "good"'s bucket
    val gb = docs.sparkSession.range(1)
      .select(org.apache.spark.sql.functions.pmod(
        Md5Family.hash(org.apache.spark.sql.functions.lit("good")),
        org.apache.spark.sql.functions.lit(32)).cast("long"))
      .as[Long].head()
    val it1 = rows.filter(_._1 == 1)
    assert(it1.maxBy(_._3)._2 == gb,
      s"bucket $gb ('good') should carry the max weight after step 1")
    // loss and accuracy: step 2's pre-update metrics (scored with w1)
    // must improve on step 1's zero-weight baseline
    val (l1, c1) = (it1.head._4, it1.head._5)
    val it2 = rows.filter(_._1 == 2)
    assert(it2.head._4 < l1, "loss should fall after one update")
    assert(it2.head._5 >= c1, "accuracy should not fall after one update")
    // partition-layout invariance: exact-integer aggregation means any
    // repartitioning yields the bit-identical weight trajectory
    val re = Classifier.trainLogistic(docs.repartition(7), "doc_id",
      "text", "y", buckets = 32, iters = 2, lrPpm = 500000L,
      hashes = Md5Family)
    assert(re.as[(Int, Long, Long, Long, Long)].collect().toSeq == rows)
  }

  test("BPE apply: rank order, left-to-right non-overlap, merged forms compose") {
    import spark.implicits._
    val docs = Seq(
      (1L, "new york city new york"),
      (2L, "a a a"),
      (3L, "solo")).toDF("doc_id", "text")
    // rule 2 references rule 1's merged form — multi-word unit builds up
    val out = TextAnalysis.applyBpeMerges(docs, "doc_id", "text",
        Seq(("new", "york"), ("new_york", "city")))
      .orderBy("doc_id").as[(Long, String, Int, Int)].collect().toSeq
    assert(out == Seq(
      (1L, "new_york_city new_york", 5, 2),
      (2L, "a a a", 3, 3),
      (3L, "solo", 1, 1)))
    // self-pair merges left-to-right without overlap: "a a a" -> "a_a a"
    val aa = TextAnalysis.applyBpeMerges(docs.filter(col("doc_id") === 2),
        "doc_id", "text", Seq(("a", "a")))
      .select("text_bpe").as[String].head()
    assert(aa == "a_a a")
    // composition with the learner: applying the top candidate shrinks
    // the corpus by exactly its occurrence count
    val corpus = Seq((1L, "x y x y"), (2L, "x y z")).toDF("doc_id", "text")
    val top = TextAnalysis.bpeMergeCandidates(corpus, "text", k = 1).head()
    assert(top.getString(0) == "x y" && top.getLong(1) == 3L)
    val applied = TextAnalysis.applyBpeMerges(corpus, "doc_id", "text",
        Seq(("x", "y")))
      .agg(sum(col("n_tokens")), sum(col("n_tokens_bpe"))).head()
    assert(applied.getLong(0) - applied.getLong(1) == 3L)
  }

  test("BPE training loop: greedy ranks, tie-break, exact token shrinkage") {
    import spark.implicits._
    val docs = Seq((1L, "x y x y z"), (2L, "x y q")).toDF("doc_id", "text")
    val got = TextAnalysis.trainBpe(docs, "doc_id", "text", nMerges = 2)
      .as[(Int, String, Long, Long)].collect().toSeq
    // round 1: "x y" wins with 3 adjacencies; all 3 merge -> 8-3=5 tokens
    // round 2: three pairs tie at 1 -> lexicographic smallest "x_y q"
    assert(got == Seq(
      (1, "x y", 3L, 5L),
      (2, "x_y q", 1L, 4L)), s"got $got")
  }

  test("nano-nat quantized scores are partition-layout invariant (the q148 rule, pinned)") {
    // the documented point of quantizing per-position terms to exact
    // integers: any repartitioning must yield BIT-identical results
    val docs = graft.engine.Tables.documents(spark, sf("sf0.001"))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq
    for (parts <- Seq(1, 7)) {
      val re = docs.repartition(parts)
      assert(canon(TextAnalysis.charEntropy(re, "doc_id", "text")) ==
        canon(TextAnalysis.charEntropy(docs, "doc_id", "text")),
        s"charEntropy varies at $parts partitions")
      assert(canon(TextAnalysis.trigramLogProb(re, "doc_id", "text")) ==
        canon(TextAnalysis.trigramLogProb(docs, "doc_id", "text")),
        s"trigramLogProb varies at $parts partitions")
      assert(canon(TextAnalysis.unigramLogProb(re, "doc_id", "text")) ==
        canon(TextAnalysis.unigramLogProb(docs, "doc_id", "text")),
        s"unigramLogProb varies at $parts partitions")
    }
  }

  test("trigram LM: matches an independent reference on a known corpus; short docs absent") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c a b c"), (2L, "a b d"), (3L, "x y"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.trigramLogProb(corpus, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSeq

    // independent reference: plain Scala maps + the same quantization
    val docs = Map(1L -> "a b c a b c".split(" ").toSeq,
      2L -> "a b d".split(" ").toSeq, 3L -> Seq("x", "y"))
    val toks = docs.values.flatten.toSeq
    val uf = toks.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val bf = docs.values.flatMap(_.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
      .toSeq.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val tf = docs.values.flatMap(_.sliding(3).filter(_.size == 3).map(_.mkString(" ")))
      .toSeq.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val n = toks.size.toDouble
    def expected(id: Long): (Long, Double) = {
      val terms = docs(id).sliding(3).filter(_.size == 3).map { w =>
        val p = 0.6 * tf(w.mkString(" ")) / bf(w.take(2).mkString(" ")) +
          0.3 * bf(w.drop(1).mkString(" ")) / uf(w(1)) +
          0.1 * uf(w(2)) / n
        math.floor(math.log(p) * 1e9 + 0.5).toLong
      }.toSeq
      val avg = (terms.sum.toDouble / 1e9) / terms.size
      (terms.size.toLong,
        BigDecimal(avg).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // doc3 (2 tokens) has no trigram and is absent
    assert(got.map(_._1) == Seq(1L, 2L))
    got.foreach { case (id, nTri, avg) =>
      assert((nTri, avg) == expected(id), s"doc $id")
    }
  }

  test("script-aware tokens: ws on Latin, char bigrams on CJK, exact routing threshold") {
    import spark.implicits._
    val cjk = (0x4E00 to 0x4E05).map(_.toChar).mkString // 6 ideographs
    val docs = Seq(
      (1L, "the quick brown fox"),        // Latin → ws tokens
      (2L, cjk),                          // pure CJK → 5 bigrams
      (3L, cjk.take(1)),                  // single ideograph → itself
      (4L, s"${cjk.take(2)} ab"),         // 2 CJK of 4 non-ws = half → bigrams
      (5L, s"${cjk.take(1)} abc")         // 1 of 4 → below half → ws route
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextAnalysis.scriptTokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(got(1L) === List("the", "quick", "brown", "fox"))
    assert(got(2L) === (0 until 5).map(i => cjk.substring(i, i + 2)).toList)
    assert(got(3L) === List(cjk.take(1)))
    // doc 4: whitespace stripped THEN bigrams — the bigram at the
    // script seam spans the removed space
    assert(got(4L) === List(cjk.substring(0, 2), cjk.substring(1, 2) + "a", "ab"))
    assert(got(5L) === List(cjk.take(1), "abc"))
  }

  test("char entropy: hand-computed nats, degenerate and uniform docs, empty/null filtered") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aabb"), // 2×2 → ln4 − 2·2ln2/4 = ln2
      (2L, "aaaa"), // single symbol → 0
      (3L, "abcd"), // uniform → ln4
      (4L, ""), // empty: filtered
      (6L, "z")) // one char → 0
      .toDF("doc_id", "text")
      .union(Seq((5L, Option.empty[String])).toDF("doc_id", "text"))
    val got = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 4, 2L, 0.693147),
      (2L, 4, 1L, 0.0),
      (3L, 4, 4L, 1.386294),
      (6L, 1, 1L, 0.0)))
  }

  test("clean corpus: drop-reason precedence and threshold edges") {
    import spark.implicits._
    val docs = Seq(
      (1L, "short text"), // 2 tokens
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // no stopwords
      (3L, "the the the the the the the the the the"), // stopword rule passes (ratio 1.0); ttr 0.1 fails
      (4L, "the quick brown fox jumps over a lazy dog today")) // 2/10 stopwords, ttr 1.0
      .toDF("doc_id", "text")
    val got = TextAnalysis.cleanCorpus(docs, "doc_id", "text")
      .orderBy("doc_id").select("doc_id", "drop_reason", "keep")
      .as[(Long, String, Int)].collect().toSeq
    assert(got == Seq(
      (1L, "too_short", 0),
      (2L, "low_stopword", 0),
      (3L, "low_ttr", 0),
      (4L, "kept", 1)))
  }

  test("regex token profile: counts and fertility on a known sentence") {
    import spark.implicits._
    // subtokens of "ab 12345 c-d!": [ab, 12345, c, -, d, !] → 6
    // ws tokens: [ab, 12345, c-d!] → 3; words: ab, c, d → 3; numbers: 1
    val df = Seq((1L, "ab 12345 c-d!")).toDF("doc_id", "text")
    val r = TextAnalysis.regexTokenProfile(df, "doc_id", "text").head
    assert(r.getInt(1) == 3, "n_ws_tokens")
    assert(r.getInt(2) == 6, "n_subtokens")
    assert(r.getInt(3) == 3, "n_word")
    assert(r.getInt(4) == 1, "n_number")
    assert(r.getInt(5) == 2, "n_punct")
    assert(r.getDouble(6) == 2.0, "fertility")
  }

  test("scrub applies rules in order with per-rule counts on the original text") {
    import spark.implicits._
    val df = Seq(
      (1L, "visit https://x.io/1234 or mail a@b.co code 99887766"),
      (2L, "nothing to redact here")).toDF("doc_id", "text")
    val rules = Seq(
      ("urls", "https?://[^ ]+", "<URL>"),
      ("emails", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
      ("numbers", "[0-9]{4,}", "<NUM>"))
    val out = TextAnalysis.scrub(df, "doc_id", "text", rules)
      .collect().map(r => r.getLong(0) -> r).toMap
    // URL rule runs FIRST, so the 1234 inside the URL is already gone
    // when the number rule runs — only 99887766 is counted/redacted
    // by position in the scrubbed text, but counts are on the ORIGINAL
    // text, so n_numbers sees both digit runs
    assert(out(1L).getString(1) == "visit <URL> or mail <EMAIL> code <NUM>")
    assert(out(1L).getInt(2) == 1, "n_urls")
    assert(out(1L).getInt(3) == 1, "n_emails")
    assert(out(1L).getInt(4) == 2, "n_numbers (both runs, counted on original)")
    assert(out(1L).getBoolean(5), "changed")
    assert(out(2L).getString(1) == "nothing to redact here")
    assert(!out(2L).getBoolean(5), "unchanged doc flagged")
  }

  test("bigram log-prob: hand-computed conditional probabilities") {
    import spark.implicits._
    // corpus bigrams: doc1 "a b a b" → (a b), (b a), (a b)
    //                 doc2 "a c"     → (a c)
    // counts: (a b)=2, (b a)=1, (a c)=1; prefix a·=3, b·=1
    // doc1 score = mean(ln(2/3), ln(1/1), ln(2/3)) = (2·ln(2/3))/3
    // doc2 score = ln(1/3)
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 3, "doc1 bigram count")
    assert(out(2L)._1 == 1, "doc2 bigram count")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L)._2 == r6((2 * math.log(2.0 / 3.0)) / 3.0), "doc1 score")
    assert(out(2L)._2 == r6(math.log(1.0 / 3.0)), "doc2 score")
    // a single-token doc has no bigram and must drop out entirely
    val single = TextAnalysis.bigramLogProb(
      Seq((1L, "only"), (2L, "a b")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(_.getLong(0)).toSeq
    assert(single == Seq(2L), "1-token doc leaked into bigram scoring")
  }

  test("linear quality score: hand-computed sigmoid, OOV = 0, exact keep") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // binary-exact weights so floor(w * 1e6) is the obvious integer
    val weights = Seq(("a", 0.5), ("b", -0.25), ("c", -0.125))
      .toDF("token", "weight")
    val docs = Seq(
      (1L, "a b"),     // (500000 - 250000)/2 → mean 0.125, keep
      (2L, "c"),       // -0.125, drop
      (3L, "a oov"),   // OOV contributes 0 → mean 0.25, keep
      (4L, "b c a a")  // (-250000 - 125000 + 1000000)/4 → 0.15625, keep
    ).toDF("doc_id", "text")
    val got = TextAnalysis.linearQualityScore(docs, "doc_id", "text", weights)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    def sig(x: Double) = 1.0 / (1.0 + math.exp(-x))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got(1L) == ((2L, r6(sig(0.125)), true)))
    assert(got(2L) == ((1L, r6(sig(-0.125)), false)))
    assert(got(3L) == ((2L, r6(sig(0.25)), true)))
    assert(got(4L) == ((4L, r6(sig(0.15625)), true)))
  }

  test("token masking: rate edges, count consistency, repartition-stable") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = (1L to 40L)
      .map(id => (id, (0 until 25).map(i => s"w${id}_$i").mkString(" ")))
      .toDF("doc_id", "text")
    def run(rate: Int, df: org.apache.spark.sql.DataFrame = docs) =
      TextAnalysis.maskTokens(df, "doc_id", "text", ratePct = rate)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // rate 0: nothing masked, text unchanged
    run(0).zip(docs.orderBy("doc_id").collect()).foreach { case ((_, n, m, t), orig) =>
      assert(m == 0 && n == 25 && t == orig.getString(1))
    }
    // rate 100: everything masked
    run(100).foreach { case (_, n, m, t) =>
      assert(m == n && t.split(" ").forall(_ == "<MASK>"))
    }
    // default rate: n_masked matches the mask tokens in the output
    // (inputs contain no literal <MASK>), and the global rate is ~15%
    val at15 = run(15)
    at15.foreach { case (_, _, m, t) =>
      assert(t.split(" ").count(_ == "<MASK>") == m)
    }
    val frac = at15.map(_._3).sum.toDouble / at15.map(_._2).sum
    assert(frac > 0.08 && frac < 0.25, s"mask rate $frac far from 0.15")
    // pure function of (doc, position): partitioning is irrelevant
    assert(run(15, docs.repartition(7)).sameElements(at15))
  }

  test("span corruption: contiguous spans, counts bounded by span starts") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = (1L to 40L)
      .map(id => (id, (0 until 30).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.spanCorrupt(docs, "doc_id", "text",
      ratePct = 10, spanLen = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4)))
    assert(got.exists(_._3 > 0), "no spans started at 10% over 1200 positions")
    got.foreach { case (id, n, spans, masked, text) =>
      assert(n == 30)
      val toks = text.split(" ")
      val maskedIdx = toks.zipWithIndex.collect { case ("<X>", i) => i }
      assert(maskedIdx.length == masked, s"doc $id: count != rendered masks")
      // overlapping spans merge, so: spans ≤ masked ≤ spans * spanLen
      assert(masked >= spans && masked <= spans * 3, s"doc $id: $spans/$masked")
      // every masked RUN is at least... a run can be clipped only at
      // the text end; interior runs are >= spanLen long is not true
      // under overlap, but every masked position must be within 2 of
      // some run that extends 3 back — check runs end-aligned: any
      // maximal run not touching the end has length >= spanLen
      val runs = maskedIdx.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, i) if i == e + 1 => (s, i) :: rest
        case (acc, i) => (i, i) :: acc
      }
      runs.foreach { case (s, e) =>
        if (e != 29) assert(e - s + 1 >= 3, s"doc $id: interior run ($s,$e) < spanLen")
      }
    }
  }

  test("classifier eval + kappa: hand-computed confusion on four classes") {
    import spark.implicits._
    // (true, pred) multiset: (0,0)x3 (0,1)x1 (1,1)x2 (1,0)x1 (2,1)x1
    // (2,3)x1 -> class 2 never predicted, class 3 never true
    val preds = (Seq.fill(3)((0, 0)) ++ Seq((0, 1)) ++ Seq.fill(2)((1, 1)) ++
      Seq((1, 0), (2, 1), (2, 3))).toDF("label", "pred")
    val ev = Classifier.classifierEval(preds, "label", "pred")
      .as[(Int, Long, Long, Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(ev == Seq(
      (0, 3L, 4L, 4L, 1L, 1L, Some(0.75), Some(0.75), Some(0.75)),
      (1, 2L, 3L, 4L, 2L, 1L, Some(0.5), Some(0.666667), Some(0.571429)),
      (2, 0L, 2L, 0L, 0L, 2L, None, Some(0.0), Some(0.0)),
      (3, 0L, 0L, 1L, 1L, 0L, Some(0.0), None, Some(0.0))), s"got: $ev")
    val k = Classifier.cohenKappa(preds, "label", "pred")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    // kappa = (9*5 - 28) / (81 - 28) = 17/53
    assert(k == Seq((9L, 5L, 28L, Some(0.320755))), s"got: $k")
    // degenerate: both sides constant -> denominator 0 -> NULL
    val const = Seq.fill(4)((1, 1)).toDF("label", "pred")
    val kc = Classifier.cohenKappa(const, "label", "pred")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(kc == Seq((4L, 4L, 16L, None)), s"got: $kc")
  }

  test("ngram novelty: shared trigram halves novelty, short doc falls to sentinel") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "q"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // "a b c" df=2; "b c d"/"b c e" unique; short doc's whole-text
    // sentinel "q" unique
    assert(got == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5),
      (3L, 1L, 1L, 1.0)), s"got $got")
  }

  test("calibration curve + ROC-AUC: hand-computed bins, ties, and the 1.0 clamp") {
    import spark.implicits._
    val scored = Seq((0.1, false), (0.1, false), (0.3, true), (0.7, true),
      (0.7, false), (1.0, true)).toDF("p", "pass")
    val cal = Classifier.calibrationCurve(scored, "p", "pass")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(cal == Seq((1L, 2L, 0L, 0.1, 0.0), (3L, 1L, 1L, 0.3, 1.0),
      (7L, 2L, 1L, 0.7, 0.5), (9L, 1L, 1L, 1.0, 1.0)), s"got: $cal")
    // AUC: 7.5 of 9 pos-neg pairs won (the 0.7 tie counts half) = 5/6
    val auc = Classifier.rocAuc(scored, "p", "pass")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(auc == Seq((6L, 3L, 3L, Some(0.833333))), s"got: $auc")
    // single-class input -> NULL
    val one = Classifier.rocAuc(
      Seq((0.2, true), (0.9, true)).toDF("p", "pass"), "p", "pass")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(one == Seq((2L, 2L, 0L, None)), s"got: $one")
    // ECE on the same fixture: 0.1*2/6 + 0.7/6 + 0.2*2/6 + 0 nanos
    val ece = Classifier.expectedCalibrationError(scored, "p", "pass")
      .as[(Long, Long, Double)].collect().toSeq
    assert(ece == Seq((6L, 4L, 0.216667)), s"got: $ece")
    // a 0.55-constant scorer at a 0.5 hit rate gaps by exactly 0.05
    val flat = Seq((0.55, true), (0.55, false), (0.55, true),
      (0.55, false)).toDF("p", "pass")
    val e0 = Classifier.expectedCalibrationError(flat, "p", "pass")
      .as[(Long, Long, Double)].collect().toSeq
    assert(e0 == Seq((4L, 1L, 0.05)), s"got: $e0")
  }

  test("gopher rules: each rule trips on its crafted violator, clean doc passes") {
    import spark.implicits._
    val clean = ((1 to 60).map(i => s"word$i") ++
      Seq("the", "of", "and")).mkString(" ")           // 63 words, all rules ok
    val short = "the of and"                            // < 50 words
    val longWords = (1 to 60).map(_ => "a" * 12).mkString(" ") +
      " the of"                                         // mean word len > 10
    val symbols = ((1 to 50).map(i => s"w$i") ++
      Seq.fill(10)("#") ++ Seq("the", "of")).mkString(" ") // 10 '#' > 62/10
    val docs = Seq((1L, clean), (2L, short), (3L, longWords),
      (4L, symbols)).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .select("doc_id", "flag_words", "flag_word_len", "flag_symbols",
        "flag_alpha", "flag_stopwords", "flag_lines", "pass")
      .as[(Long, Int, Int, Int, Int, Int, Int, Int)].collect().toSeq
    // doc 2 also trips word-len (8 chars < 3*3); doc 4's '#' tokens
    // drag mean word length under 3 as well as tripping symbols/alpha
    assert(got == Seq(
      (1L, 1, 1, 1, 1, 1, 1, 1),
      (2L, 0, 0, 1, 1, 1, 1, 0),
      (3L, 1, 0, 1, 1, 1, 1, 0),
      (4L, 1, 0, 0, 0, 1, 1, 0)), s"got $got")
  }

  test("boundary select: dense ranks by |margin|, uncertain docs first, k respected") {
    import spark.implicits._
    import graft.functions.Md5Family
    // half the docs carry the label-defining token, a few are mixed
    val docs = (0 until 30).map { i =>
      val y = if (i % 2 == 0) 1 else 0
      val text = if (i < 4) "good bad good bad"
        else if (y == 1) s"good token$i" else s"bad token$i"
      (i.toLong, text, y)
    }.toDF("doc_id", "text", "y")
    val got = Classifier.boundarySelect(docs, "doc_id", "text", "y",
      k = 5, buckets = 16, iters = 2, hashes = Md5Family)
      .as[(Int, Long, Long)].collect().toSeq
    assert(got.map(_._1) == (1 to 5), s"ranks not dense: $got")
    val absMargins = got.map(g => math.abs(g._3))
    assert(absMargins == absMargins.sorted, s"not by |margin|: $got")
    // scoring must agree with the final trained weights re-applied
    val w = Classifier.trainLogistic(docs, "doc_id", "text", "y",
      buckets = 16, iters = 2, hashes = Md5Family)
      .filter(col("iter") === 2).select("bucket", "w_micro")
    val m = Classifier.bowPresence(docs, "doc_id", "text", 16, Md5Family)
      .join(w, Seq("bucket"))
      .groupBy("_id").agg(sum("w_micro").as("m"))
      .as[(Long, Long)].collect().toMap
    got.foreach { case (_, id, margin) =>
      assert(m(id) == margin, s"margin mismatch for $id: $got")
    }
  }

  test("pmi collocations: hand counts, sparse pairs cut, nano quantization") {
    import spark.implicits._
    // df_x = df_y = 8 over 10 docs, co-docs 6; filler pairs die at
    // minPairDf
    val docs = ((1 to 6).map(i => (i.toLong, s"x y f$i")) ++
      Seq((7L, "x"), (8L, "x"), (9L, "y"), (10L, "y")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, "doc_id", "text",
      topV = 20, minPairDf = 5L)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    val want = BigDecimal(
      math.floor(math.log(6.0 * 10.0 / (8.0 * 8.0)) * 1e9 + 0.5) / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(("x", "y", 8L, 8L, 6L, want)), s"got $got want $want")
  }

  test("zipf fit: known counts reproduce the micro-quantized OLS exactly") {
    import spark.implicits._
    // token counts 8/4/2/1 -> ranks 1..4 by (count desc, token)
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(2)("c") ++ Seq("d")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = TextAnalysis.zipfFit(docs, "doc_id", "text", topV = 4)
      .as[(Long, Double, Double, Double)].collect().toSeq
    // independent replay of the quantize-then-OLS arithmetic
    val xs = (1 to 4).map(r => math.floor(math.log(r) * 1e6 + 0.5).toLong)
    val ys = Seq(8L, 4L, 2L, 1L)
      .map(c => math.floor(math.log(c.toDouble) * 1e6 + 0.5).toLong)
    val n = 4.0
    val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble
    val sxx = xs.map(a => a * a).sum.toDouble
    val syy = ys.map(a => a * a).sum.toDouble
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val slope = r6((n * sxy - sx * sy) / (n * sxx - sx * sx))
    val icept = r6((sy * sxx - sx * sxy) / ((n * sxx - sx * sx) * 1e6))
    val r2 = r6((n * sxy - sx * sy) * (n * sxy - sx * sy)
      / ((n * sxx - sx * sx) * (n * syy - sy * sy)))
    assert(got == Seq((4L, slope, icept, r2)), s"got $got want $slope $icept $r2")
    assert(slope < -1.0 && slope > -2.0, s"slope off the Zipf scale: $slope")
  }

  test("perplexity buckets: equal per-lang tiers ordered by LM fit, short docs unscored") {
    import spark.implicits._
    // six scoreable docs per lang (varying LM fit via repetition vs
    // unique tails) plus one 2-token doc that can't form a trigram
    def doc(lang: String, i: Int): String =
      "the cat sat on the mat " + (Seq.fill(6 - i)("the cat sat").mkString(" ") +
        " " + Seq.tabulate(i)(j => s"rare$lang$i$j").mkString(" "))
    val docs = (for {
      lang <- Seq("en", "fr"); i <- 1 to 6
    } yield (lang match { case "en" => 10L + i; case _ => 20L + i },
        doc(lang, i), lang)) :+ (99L, "too short", "en")
    val fix = docs.toDF("doc_id", "text", "lang")
    val out = TextAnalysis.perplexityBuckets(fix, "doc_id", "text", "lang")
      .select("doc_id", "lang", "avg_logprob", "tier", "ppl_bucket")
      .as[(Long, String, Double, Int, String)].collect().toSeq
    assert(!out.exists(_._1 == 99L), s"unscored doc bucketed: $out")
    Seq("en", "fr").foreach { lang =>
      val g = out.filter(_._2 == lang)
      assert(g.size == 6, s"$lang size: $out")
      assert(g.groupBy(_._4).view.mapValues(_.size).toMap ==
        Map(1 -> 2, 2 -> 2, 3 -> 2), s"$lang tiers uneven: $g")
      // tiers respect the score order: sort by (score desc, id) and
      // the tier sequence must be non-decreasing
      val tiers = g.sortBy(r => (-r._3, r._1)).map(_._4)
      assert(tiers == tiers.sorted, s"$lang tier order: $g")
      assert(g.filter(_._4 == 1).forall(_._5 == "head") &&
        g.filter(_._4 == 2).forall(_._5 == "middle") &&
        g.filter(_._4 == 3).forall(_._5 == "tail"), s"$lang labels: $g")
    }
  }
}
