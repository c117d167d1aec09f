package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively,
  * composed from built-ins per the preference order (SURVEY §7.4a):
  * no custom SparkPlan needed because union + partitioned window
  * expresses the semantics exactly, scalably.
  *
  * For each left row, attach the latest right row with
  * `right.ts <= left.ts` within the same key — the classic
  * attribution/"most recent reading" join.
  *
  * Shape: tag both sides, union, ONE shuffle on the key, per-key sort
  * by (ts, side) with the right side ordered first on ties (so an
  * equal-timestamp right row is visible to the left row, matching
  * DuckDB ASOF's `>=`), then `last_value(..., ignoreNulls)` over an
  * unbounded-preceding frame. No range-join explosion, no per-row
  * probes; skewed keys cost one partition's sort, the same bound as
  * any windowed operator.
  */
object AsofJoin {
  /** @param left  rows to enrich; must carry `keyCol`, `tsCol`
    * @param right rows to look up; must carry `keyCol`, `tsCol`
    * @param rightValueCols right columns to attach (emitted as
    *        `asof_<name>`, NULL when no prior right row exists).
    *        The FIRST one must be a unique id of the right row: it is
    *        the deterministic tie-break when several right rows share a
    *        timestamp (without it the attached row would depend on
    *        partition sort order).
    */
  def asofLookup(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, rightValueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val taggedLeft = rightValueCols.foldLeft(left.withColumn("_side", lit(1))) {
      (df, c) => df.withColumn(s"_rv_$c", lit(null).cast(right.schema(c).dataType))
    }
    // Extract the _rv_ value columns BEFORE padding the right side with
    // null left-schema columns: padding overwrites any right column that
    // shares a name with a non-key left column, and extracting after it
    // would silently null the asof values for colliding names.
    val taggedRight = leftCols.filterNot(c => c == keyCol || c == tsCol)
      .foldLeft(
        right.withColumn("_side", lit(0))
          .withColumns(rightValueCols.map(c => s"_rv_$c" -> col(c)).toMap)) {
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
      .select((leftCols :+ "_side") ++ rightValueCols.map("_rv_" + _) map col: _*)

    val unioned = taggedLeft
      .select((leftCols :+ "_side") ++ rightValueCols.map("_rv_" + _) map col: _*)
      .unionByName(taggedRight)

    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("_side"),
        col(s"_rv_${rightValueCols.head}").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    val enriched = rightValueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"_rv_$c"), ignoreNulls = true).over(w))
    }
    enriched.filter(col("_side") === 1)
      .select(leftCols.map(col) ++ rightValueCols.map(c => col(s"asof_$c")): _*)
  }
}
