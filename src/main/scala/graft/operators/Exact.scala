package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-exact quantization helpers — the oracle-boundary discipline
  * SURVEY §8.6 mandates (the sp_variogram lesson, re-learned in r9 by
  * ann_l2 / ml_stump / ts_pettitt).
  *
  * Two distinct traps live at a `round(double*scale)` oracle boundary:
  *
  *  1. **Half-case convention skew** — engines (and engine VERSIONS)
  *     disagree on .5 ties (HALF_UP vs HALF_EVEN). Cure: never call
  *     engine `round()` at an exact-compare boundary; spell
  *     `floor(x*scale + 0.5)` IDENTICALLY on both sides — floor of the
  *     same IEEE expression is bit-identical everywhere.
  *  2. **Accumulated float error under the boundary** — `avg(double)`
  *     sums in partition/thread order, so the ulp the quantizer sees
  *     is not reproducible even within one engine. floor-vs-round is
  *     irrelevant here; the cure is EXACT integer arithmetic end to
  *     end: quantize each row to its exact integer representation
  *     (events.value carries exactly 2 decimals → cents), sum as
  *     longs (order-independent), divide as integers.
  *
  * These helpers implement cure 2 (which subsumes cure 1). */
object Exact {

  /** Exact per-row cents: events.value has exactly 2 decimals and is
    * positive, so value*100 sits within an ulp of its integer and
    * floor(+0.5) recovers it identically on any engine. */
  def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")

  /** Engine-exact `round(avg(value)*1e6)` replacement as ONE aggregate
    * expression: micro-units mean = sum_cents·10⁴/n, rounded half-up
    * via exact integer arithmetic (floor((20000·Σcents + n) / 2n) —
    * all longs, order-independent, no float ever touches the
    * boundary). Spark's `div` TRUNCATES toward zero while DuckDB's
    * `//` FLOORS — they disagree on negative numerators (a real case:
    * specs plant ±1.0 series) — so the Spark side spells floor
    * division explicitly (trunc minus one on inexact negatives).
    * The DuckDB twin is
    * `(sum(CAST(floor(value*100+0.5) AS BIGINT))*20000 + count(*))
    *   // (2*count(*))`. */
  val avgValueMicros: Column = {
    val a = "(sum(cast(floor(value * 100 + 0.5) as bigint)) * 20000" +
      " + count(1))"
    val b = "(2 * count(1))"
    expr(s"($a div $b) - (case when $a % $b != 0 and $a < 0" +
      " then 1 else 0 end)")
  }

  /** Engine-exact `round(avg(value)*1e4)` (ten-thousandths units, the
    * rolling-corr/peaks quantization): same construction as
    * [[avgValueMicros]] at scale 10² over cents. DuckDB twin:
    * (sum(CAST(floor(value*100+0.5) AS BIGINT))*200 + count(*))
    * // (2*count(*)). */
  val avgValue4dp: Column = {
    val a = "(sum(cast(floor(value * 100 + 0.5) as bigint)) * 200" +
      " + count(1))"
    val b = "(2 * count(1))"
    expr(s"($a div $b) - (case when $a % $b != 0 and $a < 0" +
      " then 1 else 0 end)")
  }

  /** Exact `round(sum(money-grid term), 2)` → CENTS: `termSql` is an
    * integer SQL expression in (100·unitsPerCent)-ths of a dollar (e4
    * units → unitsPerCent 100, e6 → 10000), summed as exact longs
    * (order-independent; ANSI overflow is loud — rescale to
    * decimal(38,0) per the giniStump recipe if a deployment's group
    * sums approach 2⁶³), then one half-up integer division. Cure for
    * the tpch_q9 class the r12 sf0.05 gate caught: Σ double(price·
    * (1−disc)) is partition-order noise on a 1e-4 grid ROUNDED AT
    * 1e-2, so any group with S ≡ 50 mod 100 (about 1% of groups) is a
    * representation coin toss. DuckDB twin:
    * (2*sum(TERM) + U) // (2*U) with U = unitsPerCent. */
  def roundSumToCents(termSql: String, unitsPerCent: Long): Column = {
    val a = s"(2 * sum($termSql) + $unitsPerCent)"
    val b = s"(2 * $unitsPerCent)"
    expr(s"($a div $b) - (case when $a % $b != 0 and $a < 0" +
      s" then 1 else 0 end)")
  }

  /** Revenue term in exact e4 units: cents(price) · (100 − disc%). */
  val RevenueE4: String =
    "cast(floor(l_extendedprice * 100 + 0.5) as bigint)" +
      " * (100 - cast(floor(l_discount * 100 + 0.5) as bigint))"

  /** [[avgValueMicros]] over an arbitrary SQL value expression (e.g. a
    * `case when event_type = 'click' then value end` conditional mean):
    * null rows drop from both the sum and the count exactly as `avg`
    * drops them, and an all-null group returns NULL (nullif guard)
    * rather than dividing by zero — matching `round(avg(...), 6)`'s
    * NULL. The r12 grid audit showed hourly/per-user means REACH the
    * 1e-6 half-boundary whenever 32 | n (89 type-hour hits at sf0.1,
    * 3 per-user hits at sf0.01), so every `round(avg(value-grid), 6)`
    * interface column rides this instead of engine round(). DuckDB
    * twin: (sum(CAST(floor((V)*100+0.5) AS BIGINT))*20000 + count(V))
    * // nullif(2*count(V), 0). */
  def avgMicrosExpr(valueExpr: String): Column = {
    val a = s"(sum(cast(floor(($valueExpr) * 100 + 0.5) as bigint))" +
      s" * 20000 + count($valueExpr))"
    val b = s"(2 * count($valueExpr))"
    expr(s"($a div nullif($b, 0)) - (case when $a % nullif($b, 0) != 0" +
      s" and $a < 0 then 1 else 0 end)")
  }
}
