package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: second-moment (gram) accumulation of fixed-dimension
  * vectors — the distributed half of PCA/covariance. Buffer is
  * (sum vector, upper-triangular sum-of-products, count): dim +
  * dim(dim+1)/2 + 1 doubles, merged element-wise, so the map-side
  * combine ships ONE ~2 KB buffer per partition through the shuffle
  * no matter how many rows it saw — at 100 TB the covariance of a
  * billion embeddings costs one scan plus a 2 KB-per-partition
  * reduce, never an exploded (row × dim²) shuffle.
  *
  * Upper-triangle flattening: (i, j) with j >= i sits at
  * `i*dim - i*(i-1)/2 + (j-i)`.
  */
class GramAggregator(dim: Int)
    extends Aggregator[Array[Double], (Array[Double], Array[Double], Long),
      (Array[Double], Array[Double], Long)] {
  private val triLen = dim * (dim + 1) / 2

  def zero: (Array[Double], Array[Double], Long) =
    (Array.fill(dim)(0.0), Array.fill(triLen)(0.0), 0L)

  def reduce(b: (Array[Double], Array[Double], Long),
      v: Array[Double]): (Array[Double], Array[Double], Long) = {
    val (s, p, n) = b
    var i = 0
    var idx = 0
    while (i < dim) {
      s(i) += v(i)
      var j = i
      while (j < dim) { p(idx) += v(i) * v(j); idx += 1; j += 1 }
      i += 1
    }
    (s, p, n + 1)
  }

  def merge(x: (Array[Double], Array[Double], Long),
      y: (Array[Double], Array[Double], Long)): (Array[Double], Array[Double], Long) = {
    val (sx, px, nx) = x; val (sy, py, ny) = y
    var i = 0
    while (i < dim) { sx(i) += sy(i); i += 1 }
    var t = 0
    while (t < triLen) { px(t) += py(t); t += 1 }
    (sx, px, nx + ny)
  }

  def finish(b: (Array[Double], Array[Double], Long)): (Array[Double], Array[Double], Long) = b

  def bufferEncoder: Encoder[(Array[Double], Array[Double], Long)] =
    GramAggregator.bufEnc

  def outputEncoder: Encoder[(Array[Double], Array[Double], Long)] =
    GramAggregator.bufEnc
}

object GramAggregator {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  private[functions] val bufEnc: Encoder[(Array[Double], Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Array[Double], Long)]()

  /** Flat upper-triangle index of (i, j), j >= i. */
  def triIndex(i: Int, j: Int, dim: Int): Int = i * dim - i * (i - 1) / 2 + (j - i)
}
