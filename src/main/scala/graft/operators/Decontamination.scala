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
}
