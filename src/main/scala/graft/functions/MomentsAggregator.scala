package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One-pass second-moment accumulation over d-dimensional vector rows
  * (SURVEY §3: custom typed aggregate).
  *
  * The buffer is (n, Σx, packed upper-triangular Σxxᵀ) — d(d+3)/2 + 1
  * doubles (≈ 17 KB at d = 64), independent of row count, and it
  * partial-aggregates map-side: the shuffle carries one buffer per map
  * task, never per-row outer products (exploding (i, j) index pairs per
  * row would shuffle d²·n rows — 4096× the corpus at d = 64). Mean and
  * covariance derive from the single merged buffer on the driver, the
  * justified-scalar class (d×d stats, corpus-size-independent).
  */
object MomentsAggregator {

  case class Moments(n: Long, s: Array[Double], ss: Array[Double])

  class VectorMoments(dim: Int)
    extends Aggregator[Seq[Double], Moments, Moments] {
    private val triLen = dim * (dim + 1) / 2

    override def zero: Moments =
      Moments(0L, new Array[Double](dim), new Array[Double](triLen))

    override def reduce(b: Moments, x: Seq[Double]): Moments = {
      require(x.length == dim, s"expected dim $dim, got ${x.length}")
      val xa = x.toArray
      var i = 0
      var t = 0
      while (i < dim) {
        b.s(i) += xa(i)
        var j = i
        while (j < dim) { b.ss(t) += xa(i) * xa(j); t += 1; j += 1 }
        i += 1
      }
      Moments(b.n + 1, b.s, b.ss)
    }

    override def merge(a: Moments, b: Moments): Moments = {
      var i = 0
      while (i < dim) { a.s(i) += b.s(i); i += 1 }
      i = 0
      while (i < triLen) { a.ss(i) += b.ss(i); i += 1 }
      Moments(a.n + b.n, a.s, a.ss)
    }

    override def finish(m: Moments): Moments = m

    override def bufferEncoder: Encoder[Moments] = ExpressionEncoder[Moments]()
    override def outputEncoder: Encoder[Moments] = ExpressionEncoder[Moments]()
  }

  /** Untyped Column form: `df.agg(vectorMoments(64)(vecCol))` yields one
    * struct<n, s, ss> row for the whole frame (or per group). */
  def vectorMoments(dim: Int): Column => Column = {
    val fn = udaf(new VectorMoments(dim), ExpressionEncoder[Seq[Double]]())
    v => fn(v)
  }
}
