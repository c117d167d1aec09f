package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-bucket frame repair for bucketed trailing ROW windows,
  * correct for ARBITRARY bucket sparsity.
  *
  * A trailing k-row frame computed per bucket needs each bucket warmed
  * with the last k rows GLOBALLY before the bucket's first row — which
  * may span several preceding buckets when those hold fewer than k
  * rows (the naive "replicate each bucket's tail one bucket forward"
  * under-warms sparse buckets).
  *
  * Shape (no global sort anywhere):
  *  1. per-bucket row_number (one shuffle on the bucket key);
  *  2. per-bucket counts → prefix sum over the BUCKET table (tiny: one
  *     row per bucket; at petabyte scale still only thousands) gives
  *     each bucket's global start row number;
  *  3. every row's global rn = bucket start + local rn − 1;
  *  4. a row is warm-up for bucket b iff start(b) ∈ (rn, rn+k] — a
  *     broadcast range join against the bucket table replicates each
  *     row into at most k target buckets.
  *
  * Output: original rows (`warmup=false`) plus replicas re-tagged to
  * their target bucket (`warmup=true`); callers window partitioned by
  * `bucketCol` ordered by `orderCols` and drop `warmup` rows after.
  * Proven equal to the global window for gap days AND sparse buckets
  * (MedallionSpec, IncrementalWindowSpec).
  */
object WindowRepair {
  def withWarmup(df: DataFrame, bucketCol: String, orderCols: Seq[String],
      k: Int): DataFrame = {
    val wb = Window.partitionBy(bucketCol).orderBy(orderCols.map(col): _*)
    val local = df.withColumn("_rn_local", row_number().over(wb))
      .localCheckpoint() // feeds own rows + replicas + the bucket table

    val starts = local.groupBy(bucketCol).agg(count(lit(1)).as("_n"))
      .withColumn("_start_rn",
        sum(col("_n")).over(Window.orderBy(bucketCol)
          .rowsBetween(Window.unboundedPreceding, 0)) - col("_n") + 1)
      .select(col(bucketCol), col("_start_rn"))

    val withGlobal = local
      .join(broadcast(starts), Seq(bucketCol))
      .withColumn("_rn", col("_start_rn") + col("_rn_local") - 1)

    val own = withGlobal.withColumn("warmup", lit(false))
      .drop("_rn_local", "_start_rn", "_rn")
    val targets = starts.select(
      col(bucketCol).as("_target_bucket"), col("_start_rn").as("_target_start"))
    val replicas = withGlobal
      .join(broadcast(targets),
        col("_target_start") > col("_rn") && col("_target_start") <= col("_rn") + k)
      .withColumn(bucketCol, col("_target_bucket"))
      .withColumn("warmup", lit(true))
      .drop("_rn_local", "_start_rn", "_rn", "_target_bucket", "_target_start")

    own.unionByName(replicas)
  }
}
