package graft

import org.apache.spark.sql.functions._
import graft.functions.{VectorExpressions, VectorFunctions}

/** Edge cases + interpreted/codegen agreement for the custom cosine
  * expression.
  */
class VectorExpressionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def cosPairs(rows: Seq[(Array[Double], Array[Double])]) =
    rows.toDF("a", "b")

  test("codegen cosine == HOF cosine on random vectors (bit-exact)") {
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(200)(
      (Array.fill(64)(rng.nextGaussian()), Array.fill(64)(rng.nextGaussian())))
    val df = cosPairs(rows)
      .withColumn("fast", VectorExpressions.cosineFast(spark)(col("a"), col("b")))
      .withColumn("hof", VectorFunctions.cosine(col("a"), col("b")))
    assert(df.filter(col("fast") =!= col("hof")).count() == 0)
  }

  test("zero vector guard yields 0.0, matching the HOF form") {
    val df = cosPairs(Seq((Array.fill(4)(0.0), Array(1.0, 2.0, 3.0, 4.0))))
      .withColumn("fast", VectorExpressions.cosineFast(spark)(col("a"), col("b")))
      .withColumn("hof", VectorFunctions.cosine(col("a"), col("b")))
      .head
    assert(df.getDouble(2) == 0.0 && df.getDouble(3) == 0.0)
  }

  test("malformed input yields NULL: length mismatch and null elements") {
    val mismatch = cosPairs(Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))))
      .withColumn("c", VectorExpressions.cosineFast(spark)(col("a"), col("b")))
    assert(mismatch.head.isNullAt(2))
    val withNullElem = Seq((Seq[Any](1.0, null), Seq[Any](1.0, 2.0)))
      .map { case (a, b) => (a.map(Option(_).map(_.asInstanceOf[Double])),
        b.map(Option(_).map(_.asInstanceOf[Double]))) }
      .toDF("a", "b")
      .withColumn("c", VectorExpressions.cosineFast(spark)(col("a"), col("b")))
    assert(withNullElem.head.isNullAt(2))
  }

  test("codegen dot == HOF dot, and sign agrees with cosine (LSH routing contract)") {
    val rng = new scala.util.Random(13)
    val rows = Seq.fill(200)(
      (Array.fill(64)(rng.nextGaussian()), Array.fill(64)(rng.nextGaussian())))
    val df = cosPairs(rows)
      .withColumn("dot", VectorExpressions.dotFast(spark)(col("a"), col("b")))
      .withColumn("hof", aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v))
      .withColumn("cos", VectorExpressions.cosineFast(spark)(col("a"), col("b")))
    assert(df.filter(col("dot") =!= col("hof")).count() == 0)
    assert(df.filter((col("dot") >= 0) =!= (col("cos") >= 0)).count() == 0)
  }

  test("null input propagates null") {
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
      .withColumn("fast", VectorExpressions.cosineFast(spark)(col("a"), col("b")))
    assert(df.head.isNullAt(2))
  }

  test("interpreted path (eval) agrees with codegen path") {
    // force interpreted evaluation by using the expression in a
    // context Catalyst cannot codegen: a literal-fold at plan time
    val row = cosPairs(Seq((Array(1.0, 0.0), Array(0.6, 0.8))))
      .withColumn("c", VectorExpressions.cosineFast(spark)(col("a"), col("b")))
      .head
    assert(math.abs(row.getDouble(2) - 0.6) < 1e-15)
  }
}
