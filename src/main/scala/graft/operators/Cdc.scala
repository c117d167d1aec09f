package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture compaction — the merge-on-read "apply the
  * changelog" step of every CDC-fed lakehouse table (Debezium feed →
  * Delta/Hudi/Iceberg-style current state), as a pure transform.
  *
  * Input rows carry (key, attrs..., `seq`, `op`): a monotonically
  * increasing per-key sequence and an op code `I`/`U`/`D`. The current
  * state is, per key, the attributes of the HIGHEST sequence number —
  * unless that last op is a delete, in which case the key is gone.
  *
  * Scale shape: ONE aggregate with `max_by(struct(...), seq)` —
  * map-side partials keep one candidate row per key per partition, so
  * the shuffle carries one row per DISTINCT KEY, not the changelog.
  * (The struct-valued buffer makes Spark plan a SortAggregate — a
  * per-partition sort on the grouping key — but the partial/final
  * split is intact, which is the part that matters at scale: the
  * window-function alternative, row_number over key ORDER BY seq
  * DESC, would shuffle EVERY changelog row and then sort each key
  * group.) Ties are the caller's contract: `seq` must be unique per
  * key (CDC feeds guarantee this).
  */
object Cdc {
  def applyChangelog(changelog: DataFrame, keyCol: String, seqCol: String,
      opCol: String, attrCols: Seq[String]): DataFrame = {
    val payload = struct((attrCols.map(col) :+ col(opCol).as("_op")): _*)
    changelog
      .groupBy(col(keyCol))
      .agg(max_by(payload, col(seqCol)).as("_last"),
        max(col(seqCol)).as("last_seq"))
      .filter(col("_last._op") =!= "D")
      .select(col(keyCol) +: attrCols.map(c => col(s"_last.$c").as(c))
        :+ col("last_seq"): _*)
  }
}
