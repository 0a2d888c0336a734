package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator rung of SURVEY §3's extension
  * preference order (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`),
  * alongside the composition-based `operators/AsOfJoin` (union +
  * last_value window; reference point-in-time semantics per SURVEY §2
  * q19). Both are kept: the composition is the portable default; this
  * node exists to (a) exercise the full planner-extension mechanism and
  * (b) drop the union's padding overhead — the window plan shuffles and
  * sorts the UNION of both sides carrying a null right-struct on every
  * left row and a `__kind` tag on every row, while this node shuffles
  * and sorts each side separately at its natural width and streams a
  * per-partition merge with O(1) state (the single current-key
  * candidate), exactly like a sort-merge join's buffered side but
  * without materializing a match buffer.
  *
  * Semantics (locked to `AsOfJoin.asof` by `NativeAsOfJoinSpec`): for
  * each left row, the latest right row with the same key and
  * right.ts <= left.ts (ties match — DuckDB/QuestDB ASOF JOIN); no
  * match yields null payload columns (left-outer shape). Null keys
  * group together, as window partitioning does.
  *
  * Scale: the only movement is one hash shuffle per side on the key —
  * the same lower bound a shuffled join has. Each task's merge is
  * single-pass over both sorted streams; no per-key buffering (unlike
  * SMJ's inner match buffer), so skewed keys cost sort time, not
  * memory. AQE still plans the exchanges (skew-split applies to the
  * sorts' shuffles as usual).
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    rightPayload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] to [[AsOfJoinExec]]; registered per-session via
  * `spark.experimental.extraStrategies` (NativeAsOf.ensureRegistered) or
  * at build time through `GraftExtensions`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lts, rk, rts, pay) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, rk, rts, pay) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join. Requires both children clustered on their key
  * and sorted by (key, ts) — EnsureRequirements inserts the exchanges
  * and sorts, and guarantees the two hash partitionings are compatible,
  * so `zipPartitions` pairs identical key ranges. Iterator-based (no
  * codegen), like SMJ's outer path; the merge loop advances the right
  * stream at most once per right row per partition (amortized O(1) per
  * row) holding only the current candidate match. */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    rightPayload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
    ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // Rows stream out in left's order with left's partitioning — callers
  // chaining another key-clustered op reuse the exchange.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output; val rOut = right.output
    val lk = leftKey; val lts = leftTs
    val rk = rightKey; val rts = rightTs
    val payload = rightPayload
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (!lIter.hasNext) Iterator.empty
      else {
        val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
        val lTsProj = UnsafeProjection.create(Seq(lts), lOut)
        val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
        val rTsProj = UnsafeProjection.create(Seq(rts), rOut)
        val rPayProj = UnsafeProjection.create(payload, rOut)
        // Natural ascending ordering: nulls first, null==null — so
        // null-keyed rows pair with each other, matching the window
        // composition's PARTITION BY null group.
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
        val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lts.dataType))
        val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
        val nullPay: InternalRow = new GenericInternalRow(payload.length)
        val joined = new JoinedRow
        // Child iterators reuse row buffers, so the one lookahead row we
        // hold across left rows must be copied — one copy per right row,
        // the same cost SMJ pays for its buffered side.
        var rNext: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
        var cand: InternalRow = null // latest right row for the current key with ts <= left ts
        def pullRight(): Unit =
          rNext = if (rIter.hasNext) rIter.next().copy() else null
        lIter.map { l =>
          val lKeyR = lKeyProj(l)
          val lTsR = lTsProj(l)
          if (cand != null && keyOrd.compare(rKeyProj(cand), lKeyR) != 0) {
            cand = null // left moved past the candidate's key group
          }
          var advancing = true
          while (advancing && rNext != null) {
            val c = keyOrd.compare(rKeyProj(rNext), lKeyR)
            if (c < 0) pullRight()
            else if (c == 0 && tsOrd.compare(rTsProj(rNext), lTsR) <= 0) {
              cand = rNext; pullRight()
            } else advancing = false
          }
          resultProj(joined(l, if (cand != null) rPayProj(cand) else nullPay))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
