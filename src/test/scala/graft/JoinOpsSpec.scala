package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.{AsofJoin, SkewJoin}

/** As-of join and salted-join operator specs. */
class JoinOpsSpec extends SparkSpecBase {
  test("asof lookup: left-join semantics, monotone prior timestamps") {
    val events = Tables.events(spark, sf("sf0.001"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
    val out = AsofJoin.asofLookup(purchases, clicks, "user_id", "ts",
      Seq("click_id", "click_ts")).cache()

    // left-join cardinality: one output row per purchase
    assert(out.count() == purchases.count())
    // every attached click is the user's click and is not in the future
    val bad = out.filter(col("asof_click_ts") > col("ts")).count()
    assert(bad == 0, "attached click after the purchase")
    // spot-check against a direct subquery evaluation for 5 users
    val byUser = clicks.collect().groupBy(_.getLong(0))
    out.filter(col("asof_click_id").isNotNull).limit(50).collect().foreach { r =>
      val user = r.getLong(1); val pts = r.getTimestamp(2)
      val expected = byUser(user).filter(!_.getTimestamp(1).after(pts))
        .maxBy(_.getTimestamp(1).getTime)
      assert(r.getLong(3) == expected.getLong(2), s"user $user at $pts")
    }
    out.unpersist()
  }

  test("asof lookup survives a value column sharing a name with a left column") {
    import spark.implicits._
    // right's "amount" collides with left's non-key "amount" — the padding
    // step must not null the extracted asof values (ADVICE regression)
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    val left = Seq((1L, t("10:00:00"), 99.0), (1L, t("11:00:00"), 98.0))
      .toDF("k", "ts", "amount")
    val right = Seq((1L, t("09:30:00"), 7.0), (1L, t("10:30:00"), 8.0))
      .toDF("k", "ts", "amount")
    val out = AsofJoin.asofLookup(left, right, "k", "ts", Seq("amount"))
      .orderBy("ts").collect()
    assert(out.map(_.getDouble(2)).toSeq == Seq(99.0, 98.0), "left values clobbered")
    assert(out.map(_.getDouble(3)).toSeq == Seq(7.0, 8.0),
      s"asof values nulled/wrong: ${out.toSeq}")
  }

  test("salted inner join == plain inner join") {
    val orders = Tables.orders(spark, sf("sf0.001"))
    val customer = Tables.customer(spark, sf("sf0.001"))
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
      .select("o_orderkey", "c_name").orderBy("o_orderkey").collect()
    val salted = SkewJoin.saltedInnerJoin(orders, customer, "o_custkey",
        idCol = "o_orderkey", numSalts = 7)
      .select("o_orderkey", "c_name").orderBy("o_orderkey").collect()
    assert(plain.length == salted.length)
    assert(plain.sameElements(salted))
  }

  test("bloom semi join == plain semi join, probe codegen, prefilter below the join") {
    import graft.operators.BloomJoin
    val orders = Tables.orders(spark, sf("sf0.001"))
    val segment = Tables.customer(spark, sf("sf0.001"))
      .filter(col("c_mktsegment") === "BUILDING")
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val bloomed = BloomJoin.semiJoin(orders, segment, "o_custkey", "c_custkey")
    val got = keys(bloomed)
    val plain = keys(orders.join(segment,
      orders("o_custkey") === segment("c_custkey"), "leftsemi"))
    assert(got.nonEmpty && got == plain,
      s"bloom semi join diverged: ${(got -- plain).take(3)} extra, ${(plain -- got).take(3)} missing")
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"builtin bloom probe missing (fell back to the UDF?):\n$plan")
    assert(!plan.contains("UDF"), s"UDF node in the hot path:\n$plan")
    // the probe must sit on the SCAN side, not above the join: in the
    // tree string the Filter carrying might_contain appears strictly
    // below the first join node
    val joinAt = plan.indexOf("Join")
    val probeAt = plan.indexOf("might_contain")
    assert(joinAt >= 0 && probeAt > joinAt,
      s"bloom probe not below the join:\n$plan")
  }

  test("join size estimate: hand counts, hottest key, salt — without running the join") {
    import spark.implicits._
    val left = Seq(1L, 1L, 2L).toDF("lk")
    val right = (Seq.fill(3)(1L) ++ Seq.fill(5)(3L)).toDF("rk")
    val got = SkewJoin.joinSizeEstimate(left, right, "lk", "rk")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Double, Long)]
      .collect().toSeq
    // matched key 1 only: est = 2*3 = 6 = max -> skew 1.0, salt 1
    assert(got == Seq((3L, 8L, 2L, 2L, 1L, 6L, 6L, 1L, 1.0, 1L)), s"got $got")
    // two matched keys with skew: left 4x1 + 1x2, right 5x1 + 1x2
    val l2 = (Seq.fill(4)(1L) ++ Seq(2L)).toDF("lk")
    val r2 = (Seq.fill(5)(1L) ++ Seq(2L)).toDF("rk")
    val g2 = SkewJoin.joinSizeEstimate(l2, r2, "lk", "rk")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Double, Long)]
      .collect().toSeq
    // est = 20 + 1 = 21, max = 20 on key 1, skew = 20*2/21, salt = ceil(40/21)=2
    assert(g2 == Seq((5L, 6L, 2L, 2L, 2L, 21L, 20L, 1L, 1.904762, 2L)),
      s"got $g2")
  }
}
