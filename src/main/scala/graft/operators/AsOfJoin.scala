package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the latest right row
  * with the same key and right.ts <= left.ts. Spark has no native asof
  * join (pandas-on-Spark's merge_asof plans a range join); this is the
  * union + last_value(ignoreNulls) composition: tag both sides, union,
  * and run ONE window over (key, ts) — a single shuffle on the key,
  * linear scan per partition, no range-join explosion. The canonical
  * training-data use is point-in-time feature joins (no future leakage);
  * here it powers click→purchase attribution on the events table.
  *
  * Ties (right.ts == left.ts) match, like DuckDB/QuestDB ASOF JOIN —
  * the right side sorts before the left at equal timestamps.
  */
object AsOfJoin {

  /** Generic form: left/right must share `key` and `ts` column names;
    * all other right columns come back in a `matched` struct (null if
    * nothing precedes the left row). */
  def asof(left: DataFrame, right: DataFrame,
           key: String, ts: String): DataFrame = {
    val rightPayload = right.columns.filterNot(c => c == key || c == ts)
    val rightStruct = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c)))
    val l = left
      .withColumn("__kind", lit(1))
      .withColumn("__r", lit(null).cast(rightStruct))
    val r = right
      .select(col(key), col(ts),
        struct(rightPayload.toIndexedSeq.map(col): _*).as("__r"))
      .withColumn("__kind", lit(0))
    val lCols = left.columns
    val unioned = l.selectExpr((Seq(key, ts, "__kind", "__r") ++
        lCols.filterNot(c => c == key || c == ts).map(c => s"`$c`")): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col(ts), col("__kind"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("matched", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
      .drop("__kind", "__r")
  }

  /** Native-plan form of [[asof]]: same semantics, planned through
    * graft's custom `AsOfJoinNode`/`AsOfJoinExec`
    * (plans/NativeAsOfJoin.scala) instead of the union+window
    * composition. Output is FLAT — left columns followed by the right
    * payload columns (null when nothing precedes) — because a physical
    * merge emits joined rows, not a struct. Spec-locked equal to
    * [[asof]] modulo that struct flattening (NativeAsOfJoinSpec). */
  def asofNative(left: DataFrame, right: DataFrame,
                 key: String, ts: String): DataFrame = {
    import graft.plans.{AsOfJoinNode, AsOfJoinStrategy}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val spark = left.sparkSession
    ColumnBridge.addStrategy(spark, AsOfJoinStrategy)
    // Fresh-alias shield: when both sides scan the same base relation
    // (e.g. clicks and purchases from events), the analyzer's
    // DeduplicateRelations rewrites one subtree's exprIds — it cannot
    // rewrite the Attribute fields of a node type it doesn't know. An
    // all-column alias Project gives each side stable output exprIds
    // that dedup rewrites BELOW, never at, so the node's fields stay
    // valid no matter which subtree gets re-id'd.
    def shield(df: DataFrame): DataFrame =
      df.select(df.columns.toIndexedSeq.map(c => col(s"`$c`").as(c)): _*)
    val lPlan = shield(left).queryExecution.analyzed
    val rPlan = shield(right).queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))
    val payload = rPlan.output.filterNot(a => a.name == key || a.name == ts)
    val clash = payload.map(_.name).toSet intersect left.columns.toSet
    require(clash.isEmpty, s"right payload columns clash with left: $clash")
    ColumnBridge.ofRows(spark, AsOfJoinNode(
      lPlan, rPlan,
      attr(lPlan, key), attr(lPlan, ts),
      attr(rPlan, key), attr(rPlan, ts), payload))
  }

  /** Attribution: for each purchase, the user's most recent prior (or
    * simultaneous) click, inner-join semantics (unattributed purchases
    * dropped). */
  def clickAttribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("c_event_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"), col("ts"))
    asof(purchases, clicks, "user_id", "ts")
      .filter(col("matched").isNotNull)
      .select(col("p_event_id"), col("user_id"),
        unix_micros(col("ts")).as("p_ts_us"),
        col("matched.c_event_id").as("c_event_id"))
  }

  /** [[clickAttribution]] through the native plan node — same output
    * schema and rows (shares q19's DuckDB ASOF JOIN oracle). */
  def clickAttributionNative(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("c_event_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"), col("ts"))
    asofNative(purchases, clicks, "user_id", "ts")
      .filter(col("c_event_id").isNotNull)
      .select(col("p_event_id"), col("user_id"),
        unix_micros(col("ts")).as("p_ts_us"), col("c_event_id"))
  }
}
