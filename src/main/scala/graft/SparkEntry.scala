package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{ExtensionQueries, ParityQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator family from
  * SURVEY.md §2 (+ the LLM-pipeline extensions); `oracleSql` holds the
  * equivalent DuckDB SQL for every query whose semantics are
  * SQL-expressible — the driver hash-compares the two at sf0.01.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full gold composite: dim join + guarded ratios + 5-row trailing
    * window aggregates + watermark trim in one plan (SURVEY §3.3).
    */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.queries("q16_gold_composite")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ ExtensionQueries.queries

  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ ExtensionQueries.oracleSql
}
