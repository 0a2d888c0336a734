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
}
