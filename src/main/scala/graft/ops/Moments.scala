package graft.ops

import org.apache.spark.sql.{Encoder, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Corpus-level embedding moments via a custom typed [[Aggregator]] —
  * the whitening / drift-detection statistic (population covariance)
  * computed the way a 100 TB corpus has to: ONE aggregation whose
  * buffer is O(dims²) regardless of row count, merged tree-wise by
  * Spark's partial aggregation. The naive SQL shape (explode to
  * (row, i, v) then self-join on row) materializes n·dims² rows — the
  * oracle does exactly that in DuckDB at sf0.01 to cross-check this
  * implementation, but it is not a corpus-scale plan.
  *
  * Buffer layout: [n, Σx_0..Σx_{d-1}, upper-triangle Σx_i·x_j in
  * row-major (i ≤ j) order] — 1 + d + d(d+1)/2 doubles (~17 KB at
  * d = 64). `finish` expands to the full symmetric d×d matrix in
  * row-major order with cov(i,j) = Σx_i·x_j/n − (Σx_i/n)(Σx_j/n),
  * each entry rounded to 6 dp via BigDecimal HALF_UP (bit-identical
  * to Spark's `round`, absorbing partial-aggregation summation-order
  * noise so the oracle compares exactly).
  */
object Moments {

  class CovarianceAgg(dims: Int)
      extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    private val nTri = dims * (dims + 1) / 2

    override def zero: Array[Double] = new Array[Double](1 + dims + nTri)

    override def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
      if (v == null) return b
      require(v.length == dims,
        s"CovarianceAgg($dims) fed a ${v.length}-dim vector")
      val x = v.toArray
      b(0) += 1
      var i = 0
      while (i < dims) { b(1 + i) += x(i); i += 1 }
      i = 0
      var t = 1 + dims
      while (i < dims) {
        var j = i
        while (j < dims) { b(t) += x(i) * x(j); j += 1; t += 1 }
        i += 1
      }
      b
    }

    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(b: Array[Double]): Seq[Double] = {
      val n = b(0)
      require(n > 0, "covariance of an empty corpus")
      val out = new Array[Double](dims * dims)
      var i = 0
      var t = 1 + dims
      while (i < dims) {
        var j = i
        while (j < dims) {
          val c = BigDecimal(b(t) / n - (b(1 + i) / n) * (b(1 + j) / n))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          out(i * dims + j) = c
          out(j * dims + i) = c
          j += 1; t += 1
        }
        i += 1
      }
      out.toSeq
    }

    override def bufferEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Top principal component by POWER ITERATION on the 6-dp-rounded
    * covariance matrix — a dims×dims TRAINED CONSTANT (collect the
    * [[CovarianceAgg]] row once; the matrix is seed-free and
    * engine-equal, which the embedding_covariance gate proves), so the
    * iteration runs on the driver in microseconds and the corpus-wide
    * projection is a zero-shuffle literal dot product. Deterministic
    * across engines: fixed start v₀ = round6(1/√dims), a fixed
    * iteration count, and each iterate rounded to 6 dp AFTER
    * normalization (unit-scale components, so the rounding keeps 6
    * significant decimals; the pre-normalization matrix-vector sums
    * carry only summation-order noise, absorbed by the rounding). The
    * sign is pinned by the deterministic start — no eigensign
    * ambiguity.
    */
  def topComponent(cov: Seq[Double], dims: Int, iters: Int = 3): Seq[Double] = {
    require(cov.length == dims * dims,
      s"covariance must be $dims×$dims row-major, got ${cov.length}")
    var v: IndexedSeq[Double] =
      IndexedSeq.fill(dims)(round6(1.0 / math.sqrt(dims.toDouble)))
    for (_ <- 0 until iters) {
      val u = (0 until dims).map(i =>
        (0 until dims).map(j => cov(i * dims + j) * v(j)).sum)
      val norm = math.sqrt(u.map(x => x * x).sum)
      require(norm > 0, "power iteration collapsed to the zero vector " +
        "(constant corpus?)")
      v = u.map(x => round6(x / norm))
    }
    v
  }
}
