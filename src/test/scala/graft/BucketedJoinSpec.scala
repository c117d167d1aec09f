package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Bucketing evidence for the 100 TB design: two tables bucketed on
  * the join key join WITHOUT a shuffle (no Exchange above either scan)
  * — the co-located join strategy the scale notes promise for
  * repeatedly-joined big tables.
  */
class BucketedJoinSpec extends SparkSpecBase {
  test("join of co-bucketed tables has no shuffle") {
    val orders = Tables.orders(spark, sf("sf0.001"))
    val lineitem = Tables.lineitem(spark, sf("sf0.001"))
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("lineitem_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), Seq("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum(col("l_quantity")).as("q"))
      joined.collect() // force final (AQE) plan
      val plan = joined.queryExecution.executedPlan.toString
      val joinPart = plan.split("HashAggregate").last
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$plan")
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
