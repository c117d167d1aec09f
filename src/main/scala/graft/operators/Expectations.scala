package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the constraint-gate pattern (Delta Live
  * Tables expectations, deequ checks) as a pure transform: declare
  * named boolean predicates over a table, get one row per check with
  * its violation count and pass flag.
  *
  * Scale shape: ALL row-local checks fold in ONE aggregate pass over
  * the table (a single scan, one conditional sum per check, map-side
  * partials); the per-check rows are exploded from the one-row
  * aggregate, so no check adds a scan. NULL predicate results count as
  * violations — an unknown is not a pass.
  */
object Expectations {
  def validate(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val sums = checks.zipWithIndex.map { case ((_, cond), i) =>
      sum(when(coalesce(cond, lit(false)), 0L).otherwise(1L)).as(s"_c$i")
    }
    val one = df.agg(sums.head, sums.tail: _*)
    one.select(explode(array(checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("check_name"),
        col(s"_c$i").as("n_violations"),
        (col(s"_c$i") === 0L).as("passed"))
    }: _*)).as("_r"))
      .select(col("_r.*"))
      .orderBy("check_name")
  }

  /** Referential-integrity check: rows of `child` whose `fk` has no
    * match in `parent.pk` (NULL fks are orphans too — an unresolvable
    * reference). One anti-join on the key, child side pruned to the fk
    * column before the shuffle.
    */
  def referentialViolations(child: DataFrame, parent: DataFrame,
      fk: String, pk: String): DataFrame =
    child.select(col(fk))
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
}
