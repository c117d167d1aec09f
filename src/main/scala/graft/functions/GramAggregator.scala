package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: second-moment (gram) accumulation of fixed-dimension
  * vectors — the distributed half of PCA/covariance. Buffer is
  * (sum vector, upper-triangular sum-of-products, count): dim +
  * dim(dim+1)/2 + 1 values, merged element-wise, so the map-side
  * combine ships ONE ~2 KB buffer per partition through the shuffle
  * no matter how many rows it saw — at 100 TB the covariance of a
  * billion embeddings costs one scan plus a 2 KB-per-partition
  * reduce, never an exploded (row × dim²) shuffle.
  *
  * Input coordinates are FIXED-POINT quantized longs (`Pca.quantize`:
  * round(x·10⁶)), and every accumulation is exact integer arithmetic —
  * IEEE-double partial sums would make the result depend on the
  * partition merge ORDER, which varies run-to-run and flips 6-dp
  * rounding boundaries against a sequential-order oracle (the CLAUDE.md
  * order-invariance invariant; the q148 regression class). Doubles are
  * reconstructed once, after aggregation, from the exact sums.
  * Capacity: |x| ≤ ~100 quantizes to ≤ 1e8, products ≤ 1e16 — ~900
  * such products fit a signed long per partial; the final merge bound
  * is n·q² ≤ 9.2e18, i.e. exact up to ~90 B unit-scale vectors per
  * covariance pass.
  *
  * Upper-triangle flattening: (i, j) with j >= i sits at
  * `i*dim - i*(i-1)/2 + (j-i)`.
  */
class GramAggregator(dim: Int)
    extends Aggregator[Array[Long], (Array[Long], Array[Long], Long),
      (Array[Long], Array[Long], Long)] {
  private val triLen = dim * (dim + 1) / 2

  def zero: (Array[Long], Array[Long], Long) =
    (Array.fill(dim)(0L), Array.fill(triLen)(0L), 0L)

  def reduce(b: (Array[Long], Array[Long], Long),
      v: Array[Long]): (Array[Long], Array[Long], Long) = {
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

  def merge(x: (Array[Long], Array[Long], Long),
      y: (Array[Long], Array[Long], Long)): (Array[Long], Array[Long], Long) = {
    val (sx, px, nx) = x; val (sy, py, ny) = y
    var i = 0
    while (i < dim) { sx(i) += sy(i); i += 1 }
    var t = 0
    while (t < triLen) { px(t) += py(t); t += 1 }
    (sx, px, nx + ny)
  }

  def finish(b: (Array[Long], Array[Long], Long)): (Array[Long], Array[Long], Long) = b

  def bufferEncoder: Encoder[(Array[Long], Array[Long], Long)] =
    GramAggregator.bufEnc

  def outputEncoder: Encoder[(Array[Long], Array[Long], Long)] =
    GramAggregator.bufEnc
}

object GramAggregator {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  private[functions] val bufEnc: Encoder[(Array[Long], Array[Long], Long)] =
    ExpressionEncoder[(Array[Long], Array[Long], Long)]()

  /** Flat upper-triangle index of (i, j), j >= i. */
  def triIndex(i: Int, j: Int, dim: Int): Int = i * dim - i * (i - 1) / 2 + (j - i)
}
