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
  * Row hashes are Carter–Wegman affine maps over the key split into
  * 30-bit limbs: cell(x, d) = ((a_d·x₀ + b_d·x₁ + c_d·x₂ + e_d) mod p)
  * mod width with p = 1e9+7 and x = x₂·2⁶⁰ + x₁·2³⁰ + x₀ — a genuinely
  * 2-universal family (affine in the limb vector), so the CMS ε = e/w,
  * δ = e^−d bound holds by the textbook proof rather than empirically.
  * Every intermediate fits a 64-bit long (a·x₀ < 2⁶⁰, three terms
  * < 2⁶²), and the SAME arithmetic is expressible in ANSI SQL over
  * BIGINT — the st_cms DuckDB oracle rebuilds the full depth×width
  * table from these constants and per-value exact counts (the flip
  * from rows-only to hash-checked; SparkEntry.oracleSql("st_cms")).
  * Fixed constants → the same corpus always yields the same sketch,
  * regardless of partitioning.
  */
object CmsAggregator {

  private val P = 1000000007L
  private val M30 = (1L << 30) - 1
  // fixed CW coefficients per row (depth ≤ 8); duplicated as literals
  // in the st_cms oracle SQL — change BOTH or the hash gate fails
  private[graft] val CwA = Array(764258976L, 179424673L, 433024223L,
    982451653L, 715225739L, 868864373L, 336500717L, 542868483L)
  private[graft] val CwB = Array(611957299L, 524287387L, 858599509L,
    298154327L, 141650963L, 963726515L, 790738119L, 217645199L)
  private[graft] val CwC = Array(87178291L, 479001599L, 355687428L,
    720720733L, 655360001L, 122949829L, 938475263L, 394871531L)
  private[graft] val CwE = Array(15485863L, 32452843L, 49979687L,
    67867967L, 86028121L, 104395301L, 122949823L, 141650939L)

  private[graft] def cell(x: Long, d: Int, width: Int): Int = {
    val x0 = x & M30
    val x1 = (x >>> 30) & M30
    val x2 = x >>> 60
    (((CwA(d) * x0 + CwB(d) * x1 + CwC(d) * x2 + CwE(d)) % P) %
      width.toLong).toInt
  }

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
