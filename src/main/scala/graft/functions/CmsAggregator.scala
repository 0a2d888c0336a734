package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-min sketch as a typed Aggregator (Cormode & Muthukrishnan
  * 2005) — the MERGEABLE frequency sketch completing the sketch family
  * beside hll_sketch_agg (distinct counts) and percentile_approx
  * (quantiles): approximate per-item counts in fixed memory with a
  * ONE-SIDED error: count ≤ estimate, and estimate ≤ count + εN with
  * probability 1−δ (ε ≈ e/width, δ ≈ e^−depth).
  *
  * Architecture property the 100 TB layer needs: sketches ADD — daily
  * partitions keep their (depth×width longs) sketch and any rollup
  * window merges them cell-wise WITHOUT rescanning rows. One pass,
  * map-side partial merge, O(depth·width) state per group.
  *
  * Row hashes are murmur-finalizer mixes of (item ⊕ row seed) — the
  * standard engineering construction (not formally pairwise
  * independent; the ε bound is property-checked empirically in
  * CmsSpec). Fixed seeds → the same corpus always yields the same
  * sketch, regardless of partitioning.
  */
object CmsAggregator {

  /** MurmurHash3 64-bit finalizer (public domain avalanche). */
  private def fmix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  private def seed(d: Int): Long = 0x9e3779b97f4a7c15L * (d + 1)

  private def cell(x: Long, d: Int, width: Int): Int =
    Math.floorMod(fmix64(x ^ seed(d)), width.toLong).toInt

  class Cms(depth: Int, width: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {

    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(buf: Array[Long], x: Long): Array[Long] = {
      var d = 0
      while (d < depth) {
        buf(d * width + cell(x, d, width)) += 1L
        d += 1
      }
      buf
    }

    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Column form: one sketch per group from the item's xxhash64.
    * `df.agg(cms(5, 2048)(xxhash64(col)))` → array<bigint> sketch. */
  def cms(depth: Int, width: Int): Column => Column = {
    val fn = udaf(new Cms(depth, width), Encoders.scalaLong)
    x => fn(x)
  }

  /** Point estimate from a finished sketch: min over the depth cells. */
  def estimate(sketch: Array[Long], depth: Int, width: Int, x: Long): Long = {
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val v = sketch(d * width + cell(x, d, width))
      if (v < best) best = v
      d += 1
    }
    best
  }

  /** Cell-wise sketch merge (the mergeability property itself, exposed
    * for rollups over stored per-partition sketches). */
  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    require(x.length == y.length, "sketch shapes must match")
    x.zip(y).map { case (p, q) => p + q }
  }
}
