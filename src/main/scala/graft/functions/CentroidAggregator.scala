package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: element-wise mean of fixed-dimension vectors — the one
  * custom aggregate the extension justifies (SURVEY.md §2.10): a
  * per-group embedding centroid without exploding rows.
  *
  * Buffer is (running sum vector, count); merge is element-wise — the
  * partial-aggregation (map-side combine) contract holds, so each
  * partition ships one (dim+1)-sized buffer per group through the
  * shuffle instead of its rows. For 100 TB of embeddings this is the
  * difference between shuffling the corpus and shuffling
  * n_groups × dim doubles.
  */
class CentroidAggregator(dim: Int)
    extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {
  def zero: (Array[Double], Long) = (Array.fill(dim)(0.0), 0L)

  def reduce(b: (Array[Double], Long), v: Array[Double]): (Array[Double], Long) = {
    val (s, n) = b
    var i = 0
    while (i < dim) { s(i) += v(i); i += 1 }
    (s, n + 1)
  }

  def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    val (sx, nx) = x; val (sy, ny) = y
    var i = 0
    while (i < dim) { sx(i) += sy(i); i += 1 }
    (sx, nx + ny)
  }

  def finish(b: (Array[Double], Long)): Array[Double] = {
    val (s, n) = b
    if (n == 0L) s else s.map(_ / n)
  }

  def bufferEncoder: Encoder[(Array[Double], Long)] = ExpressionEncoderHelper.buf

  def outputEncoder: Encoder[Array[Double]] = ExpressionEncoderHelper.doubleArray
}

private[functions] object ExpressionEncoderHelper {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val doubleArray: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  val buf: Encoder[(Array[Double], Long)] = ExpressionEncoder[(Array[Double], Long)]()
}
