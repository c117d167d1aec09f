package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.Fuzzy

/** Exactness proofs for the ED-Join prefix-filtered edit-distance
  * self-join: equality with the O(n²) brute-force verifier (spec-only;
  * the registered q138 carries the DuckDB quadratic oracle), and the
  * short-string band path the count bound can't cover.
  */
class FuzzySpec extends SparkSpecBase {

  private def brute(df: org.apache.spark.sql.DataFrame, d: Int): Set[(Long, Long, Int)] = {
    val a = df.select(col("id").as("id_a"), col("s").as("sa"))
    val b = df.select(col("id").as("id_b"), col("s").as("sb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .filter(col("dist") <= d)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def fuzzy(df: org.apache.spark.sql.DataFrame, d: Int, q: Int = 2): Set[(Long, Long, Int)] =
    Fuzzy.editDistancePairs(df, "id", "s", maxDist = d, q = q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("prefix-filtered join equals brute force on customer keys, d=1 and d=2") {
    val cust = Tables.customer(spark, sf("sf0.001"))
      .select(col("c_custkey").cast("long").as("id"), col("c_name").as("s"))
      .localCheckpoint()
    for (d <- Seq(1, 2)) {
      val expected = brute(cust, d)
      val got = fuzzy(cust, d)
      assert(expected.nonEmpty, s"fixture should have close keys at d=$d")
      assert(got == expected,
        s"d=$d mismatch: missed=${expected -- got} extra=${got -- expected}")
    }
  }

  test("prefix-filtered join equals brute force with q=3 and mixed-length strings") {
    val words = Seq("energy", "energi", "enery", "exergy", "allocation",
      "alocation", "allocutions", "wind", "wint", "solar", "sola",
      "turbine", "turbines", "meter", "meters", "metre")
    val df = spark.createDataFrame(words.zipWithIndex.map { case (w, i) => (i.toLong, w) })
      .toDF("id", "s").localCheckpoint()
    for (d <- Seq(1, 2)) {
      val expected = brute(df, d)
      val got = fuzzy(df, d, q = 3)
      assert(got == expected,
        s"d=$d mismatch: missed=${expected -- got} extra=${got -- expected}")
    }
  }

  test("short strings below the count bound pair through the band join") {
    // with q=2, d=1 every string of length <= 3 has n_grams <= d*q: the
    // gram count bound is vacuous for short x short pairs ("ab"/"cb"
    // share zero bigrams yet dist=1) — the length-band path must find
    // them, including around the empty string.
    val df = spark.createDataFrame(Seq(
      (1L, ""), (2L, "a"), (3L, "b"), (4L, "ab"), (5L, "cb"),
      (6L, "abc"), (7L, "xbc"), (8L, "abcd"), (9L, "zzzz")))
      .toDF("id", "s").localCheckpoint()
    val expected = brute(df, 1)
    val got = fuzzy(df, 1)
    assert(expected.contains((4L, 5L, 1)) && expected.contains((1L, 2L, 1)))
    assert(got == expected,
      s"mismatch: missed=${expected -- got} extra=${got -- expected}")
  }
}
