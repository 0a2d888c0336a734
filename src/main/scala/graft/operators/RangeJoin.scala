package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned point-in-interval range join.
  *
  * Spark plans a bare `p BETWEEN s AND e` join as BroadcastNestedLoop —
  * quadratic probes. Binning both sides by a fixed time bin turns it
  * into a hash equi-join on the bin id plus a cheap residual predicate:
  * each interval explodes into the bins it spans (bounded when bin size
  * ≳ interval length), each point maps to exactly one bin. This is the
  * standard lakehouse range-join optimization, hand-rolled from
  * built-ins so Catalyst/AQE still see a plain equi-join.
  */
object RangeJoin {

  /** Join `points` (micros column `pUs`) to `intervals` ([sUs, eUs],
    * inclusive) on containment. `binUs` trades explode factor
    * (intervals spanning many bins) against bucket selectivity. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pUs: String, sUs: String, eUs: String,
                      binUs: Long): DataFrame = {
    val binned = points.withColumn("__bin", (col(pUs) / binUs).cast("long"))
    val spanned = intervals.withColumn("__bin",
      explode(sequence((col(sUs) / binUs).cast("long"),
        (col(eUs) / binUs).cast("long"))))
    binned.join(spanned, "__bin")
      .filter(col(pUs) >= col(sUs) && col(pUs) <= col(eUs))
      .drop("__bin")
  }

  /** INTERVAL × INTERVAL overlap join, same binning idea: both sides
    * explode into the bins they span, candidates meet on the bin
    * equi-join, the true overlap predicate refines, and each matched
    * pair is kept exactly ONCE row-locally — at the bin containing the
    * later of the two starts (both intervals provably span that bin, no
    * other bin qualifies) — so no candidate-wide distinct() shuffle.
    * A bare overlap join plans as BNLJ; this stays hash-join shaped for
    * AQE/skew handling. Explode factor is span/binUs per row — pick
    * binUs ≳ the typical interval length. Columns must be pre-aliased
    * distinctly on the two sides (s1/e1 vs s2/e2). */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      s1: String, e1: String, s2: String, e2: String,
                      binUs: Long): DataFrame = {
    val a = left.withColumn("__bin",
      explode(sequence((col(s1) / binUs).cast("long"),
        (col(e1) / binUs).cast("long"))))
    val b = right.withColumn("__bin",
      explode(sequence((col(s2) / binUs).cast("long"),
        (col(e2) / binUs).cast("long"))))
    a.join(b, "__bin")
      .filter(col(s1) <= col(e2) && col(s2) <= col(e1))
      .filter(col("__bin") ===
        (greatest(col(s1), col(s2)) / binUs).cast("long"))
      .drop("__bin")
  }
}
