package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) merge — the MERGE INTO pattern
  * expressed as a pure DataFrame transform (no table format required).
  *
  * The dimension carries (key, attrs..., version, is_current); an
  * incoming update batch carries (key, attrs...). The merge emits the
  * next dimension state:
  *   - closed history rows (is_current = false) pass through untouched;
  *   - a current row whose key has an update with DIFFERENT attributes
  *     is closed (is_current := false) and a new version+1 row opens;
  *   - a current row with no update, or an identical update, passes
  *     through;
  *   - an update key absent from the dimension opens at version 1.
  *
  * Scale shape: ONE full-outer equi-join of the current slice against
  * the updates on the key (history rows never join — they are filtered
  * out before the join and unioned back as a pure pass-through). The
  * 1-or-2 output rows per joined key come from exploding a
  * map-side-built array of named structs, so no branch re-scans the
  * join. Attribute comparison is column-wise null-safe equality — no
  * hashing, whole-stage-codegen throughout.
  */
object Scd2 {
  def merge(dim: DataFrame, updates: DataFrame, keyCol: String,
      attrCols: Seq[String]): DataFrame = {
    val history = dim.filter(!col("is_current"))
    val current = dim.filter(col("is_current"))
    val upd = updates.select(
      (col(keyCol) +: attrCols.map(c => col(c).as(s"_u_$c"))) :+
        lit(true).as("_u_present"): _*)
    val joined = current.join(upd, Seq(keyCol), "full_outer")
    val changed = attrCols.map(c => !(col(c) <=> col(s"_u_$c"))).reduce(_ || _)
    val hasCurrent = col("is_current").isNotNull
    val hasUpdate = col("_u_present").isNotNull

    def mkRow(attrs: Seq[Column], version: Column, isCur: Column): Column =
      struct(
        (col(keyCol).as(keyCol) +:
          attrCols.zip(attrs).map { case (n, c) => c.as(n) }) :+
          version.as("version") :+ isCur.as("is_current"): _*)

    val closedOld = mkRow(attrCols.map(col), col("version"), lit(false))
    val keptOld = mkRow(attrCols.map(col), col("version"), lit(true))
    val newVersion = mkRow(attrCols.map(c => col(s"_u_$c")),
      coalesce(col("version"), lit(0)) + 1, lit(true))
    joined.select(explode(
      when(!hasCurrent, array(newVersion))            // brand-new key
        .when(!hasUpdate, array(keptOld))             // untouched key
        .when(changed, array(closedOld, newVersion))  // real change
        .otherwise(array(keptOld))                    // no-op update
    ).as("_r"))
      .select(col("_r.*"))
      .unionByName(history.select(
        (col(keyCol) +: attrCols.map(col)) :+ col("version") :+ col("is_current"): _*))
  }
}
