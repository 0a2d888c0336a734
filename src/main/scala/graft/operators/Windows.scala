package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions & sessionization — the reference's cyclist-trip
  * workflow (reference: work/TD_pySpark.ipynb:224-370: lag + change detection,
  * cumulative-sum trip numbering, row_number first-rows, rowsBetween
  * rolling windows, per-trip summaries) re-expressed on the `events`
  * stream table.
  *
  * Scale design: ONE hash-partitioning on user_id serves the whole chain
  * (lag → flag → running sum → row_number) — Catalyst reuses the single
  * Exchange because every window spec shares partitionBy(user_id). The
  * reference computed the change flag with a Python UDF; here it is a
  * codegen'd `when` over `lag`, so the whole chain stays inside
  * WholeStageCodegen after the sort.
  *
  * Ordering is always (ts, event_id) — timestamps alone may tie, and the
  * tiebreak keeps results engine-reproducible.
  */
object Windows {

  private val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")

  /** lag + state-change detection (TD ex.: sur_velo transitions). */
  def lagChange(events: DataFrame): DataFrame =
    events
      .withColumn("prev_type", lag("event_type", 1).over(byUser))
      .withColumn("changed",
        when(col("prev_type").isNull, 0)
          .when(col("event_type") =!= col("prev_type"), 1)
          .otherwise(0))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("prev_type"), col("changed"))

  /** Gap-based sessionization: a session break is a >gap pause, session id
    * is the running sum of breaks (the reference's trip numbering, with
    * time-gap instead of sur_velo as the break predicate). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_no",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-row session assignment (driver-comparable projection). */
  def sessionNumbers(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .select(col("event_id"), col("user_id"), col("session_no"))

  /** row_number → first event per user (TD ex.: first row of each trip). */
  def firstEventPerUser(events: DataFrame): DataFrame =
    events
      .withColumn("rn", row_number().over(byUser))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"))

  /** Rolling rowsBetween aggregate (TD ex.: 2-preceding window preview). */
  def rollingValue(events: DataFrame): DataFrame =
    events
      .withColumn("roll_avg",
        round(avg("value").over(byUser.rowsBetween(-2, 0)), 4))
      .withColumn("roll_max",
        round(max("value").over(byUser.rowsBetween(-2, 0)), 4))
      .select(col("event_id"), col("user_id"), col("roll_avg"), col("roll_max"))

  /** Conversion latency distribution (first `from` → first `to` per
    * user): both firsts come from ONE conditional-min partial-agg pass
    * (never two scans or a self-join); a user converts only if the
    * first `to` is at-or-after the first `from`. Output is a 1-row
    * summary (starters, converters, exact median/p90 latency);
    * percentile_approx is the 100 TB drop-in. */
  def conversionLatency(events: DataFrame, from: String = "signup",
                        to: String = "purchase"): DataFrame = {
    val per = events.groupBy("user_id").agg(
      min(when(col("event_type") === from, col("ts"))).as("t0"),
      min(when(col("event_type") === to, col("ts"))).as("t1"))
    per.filter(col("t0").isNotNull)
      .withColumn("lat_s",
        when(col("t1").isNotNull && col("t1") >= col("t0"),
          unix_timestamp(col("t1")) - unix_timestamp(col("t0"))))
      .agg(count(lit(1)).as("n_started"),
        count("lat_s").as("n_converted"),
        round(expr("percentile(lat_s, 0.5)"), 4).as("median_latency_s"),
        round(expr("percentile(lat_s, 0.9)"), 4).as("p90_latency_s"))
  }

  /** Longest consecutive-active-day streak per user — the classic
    * gaps-and-islands pattern (day − row_number is constant within a
    * run, so runs become groups without a self-join or a loop). One
    * exchange on user_id feeds the dedup, the ranking window, and the
    * island agg; ties (equal-length streaks) resolve to the earliest
    * start. */
  def activityStreaks(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("day")
    events.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("rn", row_number().over(w))
      .withColumn("anchor", expr("date_sub(day, rn)"))
      .groupBy("user_id", "anchor")
      .agg(count(lit(1)).as("len"), min("day").as("start"))
      .groupBy("user_id")
      .agg(min(struct((-col("len")).as("nl"), col("start").as("s"))).as("b"))
      .select(col("user_id"), (-col("b.nl")).as("streak_days"),
        col("b.s").as("start_day"))
  }

  /** Rolling EXACT median per user (robust rolling center — w4's mean
    * is outlier-dragged): exact interpolated percentile over the last
    * lookback+1 events. O(frame) state per row on the same single user
    * exchange; percentile_approx over the frame is the constant-memory
    * 100 TB drop-in. */
  def rollingMedian(events: DataFrame, lookback: Int = 20): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-lookback, 0)
    events.select(col("event_id"), col("user_id"),
      round(expr("percentile(value, 0.5)").over(w), 6).as("roll_median"))
  }

  /** RANGE-frame rolling window — each event's trailing-hour count and
    * value total per user (w4's ROWS frame counts rows; a RANGE frame
    * bounds by the ORDER-BY VALUE, so sparse and bursty users get the
    * same time horizon). Integer epoch seconds keep the frame bounds
    * engine-stable, and RANGE semantics make ties (equal seconds)
    * order-independent by construction. One exchange on user_id. */
  def trailingWindowSums(events: DataFrame, seconds: Long = 3600L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_sec")
      .rangeBetween(-seconds, 0)
    events
      .withColumn("ts_sec", unix_timestamp(col("ts")))
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_trailing"),
        round(sum("value").over(w), 4).as("sum_trailing"))
  }

  /** Rolling DISTINCT count — how many distinct event types each user
    * has touched up to each event (the "breadth so far" feature; plain
    * window aggs can't say DISTINCT). collect_set's window state is
    * bounded by the type cardinality, not the frame length, so a
    * million-event user costs O(|types|) memory; one exchange on
    * user_id, unique (ts, event_id) order for a deterministic frame. */
  def rollingDistinctTypes(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(col("event_id"), col("user_id"),
      size(collect_set("event_type").over(w)).as("n_types_seen"))
  }

  /** rank / dense_rank / lead coverage (reference: preparation_noaa rank
    * window; TD lead/lag navigation): per-user value ranking with the
    * next event's timestamp. */
  def rankAndLead(events: DataFrame): DataFrame = {
    val byValue = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id"))
    events.select(
      col("event_id"), col("user_id"), col("value"),
      rank().over(byValue).as("rnk"),
      dense_rank().over(byValue).as("drnk"),
      lead(unix_micros(col("ts")), 1).over(byUser).as("next_ts_us"))
      .filter(col("rnk") <= 3)
  }

  /** Distribution-position windows: percent_rank / cume_dist / ntile
    * per user — the per-key normalization pass of feature engineering
    * (one (user_id) exchange serves all three frames). Total ordering
    * (value, event_id) keeps every rank deterministic. */
  def distributionRanks(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("value"), col("event_id"))
    events.select(
      col("event_id"), col("user_id"), col("value"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume"),
      ntile(4).over(w).as("quartile"))
  }

  /** Nested array flatten (reference: work/batch_profiling_enriched.py
    * explode(arrays_zip(hourly.time, hourly.temperature, ...))): events
    * are packed into per-user parallel arrays (struct-of-arrays, the
    * shape of the reference's raw JSON history), then flattened back via
    * arrays_zip + explode — covers collect_list/sort_array/transform/
    * arrays_zip/explode in one round-trip whose output equals the input. */
  def nestedFlattenRoundtrip(events: DataFrame): DataFrame = {
    val packed = events
      .select(col("user_id"), struct(unix_micros(col("ts")).as("ts_us"),
        col("value")).as("s"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("s"))).as("arr"))
      .select(col("user_id"),
        transform(col("arr"), x => x.getField("ts_us")).as("ts_arr"),
        transform(col("arr"), x => x.getField("value")).as("value_arr"))
    packed
      .select(col("user_id"),
        explode(arrays_zip(col("ts_arr"), col("value_arr"))).as("z"))
      .select(col("user_id"), col("z.ts_arr").as("ts_us"),
        col("z.value_arr").as("value"))
  }

  /** Per-session summary: bounds, duration, event count, mean value
    * (TD ex.: trajets_summary). Reuses the sessionize partitioning — the
    * groupBy keys are a superset of the window partition key, so AQE can
    * avoid a second full shuffle. */
  def sessionSummary(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy("user_id", "session_no")
      .agg(
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        count(lit(1)).as("n_events"),
        round(avg("value"), 4).as("avg_value"))
      .withColumn("duration_sec",
        round((col("end_us") - col("start_us")) / 1e6, 6))

  /** Ordered FUNNEL analysis: per user, the earliest time each stage of
    * `stages` is reached STRICTLY AFTER the previous stage's hit (the
    * first signup, the first click after that signup, the first purchase
    * after that click, …) plus the depth reached. The self-join-chain
    * formulation shuffles the events table once per stage; this is ONE
    * shuffle on user_id total: `groupByKey.flatMapSortedGroups` streams
    * each user's events through a spill-safe (ts, event_id)-sorted
    * iterator with a stage cursor as the only state — the same shape as
    * the EWMA recurrence, and the scan cost is independent of the stage
    * count. */
  def funnelStages(events: DataFrame, stages: Seq[String]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    require(stages.nonEmpty && stages.size <= 3,
      "contract projection emits t1..t3; widen the output for more stages")
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapSortedGroups($"ts_us", $"event_id") { (k, it) =>
        val hit = Array.fill(3)(Option.empty[Long])
        var next = 0
        var prevTs = Long.MinValue
        it.foreach { case (_, ts, _, et) =>
          // STRICTLY after: a next-stage event sharing the previous
          // hit's exact timestamp does not count (matches the oracle's
          // `e.ts > prev.t` semantics; ties on ts are not ordered causally)
          if (next < stages.size && et == stages(next) &&
              (next == 0 || ts > prevTs)) {
            hit(next) = Some(ts); prevTs = ts; next += 1
          }
        }
        Iterator.single((k, next, hit(0), hit(1), hit(2)))
      }
      .toDF("user_id", "funnel_depth", "t1_us", "t2_us", "t3_us")
  }

  /** Cohort retention matrix: users cohort by the WEEK of their first
    * event (epoch-day / 7 — calendar-free integer weeks, stable across
    * engines and timezones), and each later active week counts them at
    * its offset. Output (cohort_week, week_offset, n_users) is the
    * classic retention triangle.
    *
    * Scale shape: one exchange on user_id feeds the first-day window
    * min, then the triangle aggregate groups 16 bytes of keys — the
    * events payload never reshuffles. countDistinct is exact by
    * contract here; approx_count_distinct is the drop-in at 100 TB. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    events
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .as("__d"))
      .withColumn("__d0", min(col("__d")).over(byUser))
      .select(floor(col("__d0") / 7).cast("long").as("cohort_week"),
        floor((col("__d") - col("__d0")) / 7).cast("long").as("week_offset"),
        col("user_id"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** First-order Markov transition matrix over event types: for every
    * (from, to) pair of CONSECUTIVE events per user, the transition
    * count and probability — the model behind "after a click, 40% of
    * users purchase" product analytics (and the statistical summary of
    * w11_path's raw journeys).
    *
    * Scale shape: one user_id exchange feeds the lead() window, then
    * only (from, to) string pairs reach the counting aggregate
    * (map-side partials) — the events payload never reshuffles. The
    * probability normalization is a window over the types×types result
    * frame, which is tiny by construction. */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val wf = Window.partitionBy("from_type")
    events
      .withColumn("to_type", lead("event_type", 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prob", round(col("n") / sum("n").over(wf), 6))
  }

  /** RFM segmentation: per-user Recency (days since last event, against
    * the corpus high-water mark), Frequency (event count) and Monetary
    * (purchase value sum), each scored 1–5 by its exact corpus quintile
    * — the classic customer-value segmentation.
    *
    * Scale shape: one partial-agg pass collapses events to a per-user
    * frame; the quintile BOUNDARIES are one aggregate row broadcast
    * back, and scoring is a codegen'd when-chain — no global ntile()
    * window, which would serialize every user onto one task. Recency
    * stays integer microseconds→days (engine-stable); `percentile` is
    * exact by contract here, `approx_percentile` is the drop-in bound
    * source at 100 TB (same join shape, like st_winsorize). */
  def rfmSegments(events: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    val per = events.groupBy("user_id").agg(
      max(unix_micros(col("ts"))).as("__last"),
      count(lit(1)).as("frequency"),
      round(sum(when(col("event_type") === "purchase", col("value"))
        .otherwise(0.0)), 4).as("monetary"))
    val hwm = per.agg(max("__last").as("__hwm"))
    val users = per.crossJoin(broadcast(hwm))
      .withColumn("recency_days",
        expr(s"(__hwm - __last) div ${dayUs}L"))
      .drop("__last", "__hwm")
    val qs = Seq(0.2, 0.4, 0.6, 0.8)
    val bAggs =
      qs.map(q => expr(s"percentile(recency_days, $q)").as(s"r${(q*10).toInt}")) ++
      qs.map(q => expr(s"percentile(frequency, $q)").as(s"f${(q*10).toInt}")) ++
      qs.map(q => expr(s"percentile(monetary, $q)").as(s"m${(q*10).toInt}"))
    val bounds = users.agg(bAggs.head, bAggs.tail: _*)
    def band(c: Column, p: String): Column =
      when(c <= col(s"${p}2"), 1).when(c <= col(s"${p}4"), 2)
        .when(c <= col(s"${p}6"), 3).when(c <= col(s"${p}8"), 4).otherwise(5)
    users.crossJoin(broadcast(bounds))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary"),
        // low recency = recently active = best score
        (lit(6) - band(col("recency_days"), "r")).as("r_score"),
        band(col("frequency"), "f").as("f_score"),
        band(col("monetary"), "m").as("m_score"))
      .withColumn("rfm_cell",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
  }

  /** Top user-journey paths: each user's first `depth` events (by time)
    * joined into a "a>b>c" path string, counted and ranked — the
    * product-analytics "what do users do first" query.
    *
    * Scale shape: the rank filter is a LITERAL bound, so it plans as a
    * map-side WindowGroupLimit (each task forwards ≤ depth rows per
    * user before the exchange); the per-user path aggregate reuses the
    * window's user_id partitioning (no second wide exchange — plan-
    * audited), path counting groups short strings, and the final top-20
    * is TakeOrdered. Path assembly sorts the collected (rn, type) pairs
    * row-locally — collect_list order is NOT deterministic across
    * retries, the explicit array_sort on rn is what makes it stable. */
  def journeyPaths(events: DataFrame, depth: Int = 5): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= depth)
      .groupBy("user_id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(desc("n_users"), asc("path"))
      .limit(20)
  }

  /** Activity concentration (the Pareto question): what share of all
    * events and purchase revenue comes from the users STRICTLY above
    * the p90 activity level? NO global user ranking — the cutoff is an
    * exact percentile of the per-user event counts riding back as a
    * 1-row broadcast (approx_percentile is the 100 TB drop-in), so the
    * whole report is one user rollup + one conditional re-aggregate of
    * that user-sized frame. Money sums as exact integer cents; shares
    * divide once at the end. */
  def activityConcentration(events: DataFrame): DataFrame = {
    val per = events.groupBy("user_id").agg(
      count(lit(1)).as("n_ev"),
      sum(when(col("event_type") === "purchase",
        round(col("value") * 100).cast("long")).otherwise(lit(0L)))
        .as("__cents"))
    val top = col("n_ev") > col("__c")
    per.crossJoin(broadcast(per.agg(expr("percentile(n_ev, 0.9)").as("__c"))))
      .agg(count(lit(1)).as("n_users"),
        sum(when(top, 1L).otherwise(0L)).as("n_top"),
        round(sum(when(top, col("n_ev")).otherwise(0L)) / sum("n_ev"), 6)
          .as("event_share"),
        round(sum(when(top, col("__cents")).otherwise(0L)) / sum("__cents"),
          6).as("value_share"))
  }

  /** First-touch attribution: credit each user's total purchase value
    * to the CHANNEL of their first-ever event (the acquisition-source
    * report every growth team runs). Output per channel: users
    * acquired, users who ever purchased, and attributed revenue.
    *
    * Scale shape: NO window — the first event is min(struct(ts,
    * event_id, event_type)) (lexicographic min ≡ earliest event with
    * the event_id tiebreak), so the whole per-user pass is ONE
    * partial-agg shuffle on user_id, then a channel-count-sized rollup.
    * A row_number window would sort every partition; the min-struct
    * form combines map-side. Engine-exact money: purchase values sum
    * as exact integer cents, divided once at the end. */
  /** Max concurrent open sessions per day — the interval-overlap sweep
    * (+1 at open, −1 at close, running sum, max), the load-planning
    * question behind capacity sizing. A session is [ts, ts+hold),
    * clipped at its start day's end so every interval lives in exactly
    * one day partition.
    *
    * Scale shape: the sweep is a window partitioned BY DAY — never a
    * global single-partition running sum. Ties are exact by
    * construction: ORDER BY (t, delta) puts closes before opens at the
    * same microsecond (touching intervals don't overlap), and the
    * RANGE-default frame gives all peer rows the post-peer sum in both
    * engines, so max is engine-stable. */
  def dailyConcurrency(events: DataFrame, holdSeconds: Long = 300L): DataFrame = {
    val day = to_date(col("ts"))
    val dayEndUs = unix_micros(to_timestamp(date_add(day, 1)))
    val iv = events.select(day.as("day"),
      unix_micros(col("ts")).as("s"),
      least(unix_micros(col("ts")) + lit(holdSeconds * 1000000L), dayEndUs)
        .as("e"))
    val pts = iv.select(col("day"), col("s").as("t"), lit(1).as("delta"))
      .unionByName(iv.select(col("day"), col("e").as("t"),
        lit(-1).as("delta")))
    val w = Window.partitionBy("day").orderBy(col("t"), col("delta"))
    pts.withColumn("c", sum("delta").over(w))
      .groupBy("day")
      .agg(max("c").cast("long").as("max_concurrent"),
        (count(lit(1)) / 2).cast("long").as("n_sessions"))
  }

  def firstTouchAttribution(events: DataFrame): DataFrame = {
    val isPurchase = col("event_type") === "purchase"
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .groupBy("user_id")
      .agg(
        min(struct(col("ts"), col("event_id"), col("event_type")))
          .getField("event_type").as("channel"),
        sum(when(isPurchase, round(col("value") * 100).cast("long"))
          .otherwise(lit(0L))).as("__cents"),
        max(when(isPurchase, lit(1)).otherwise(lit(0))).as("__purchased"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_users"),
        sum(col("__purchased")).as("n_converted"),
        round(sum(col("__cents")) / 100.0, 2).as("purchase_value"))
  }

  /** Distribution rank — each event's percent_rank and cume_dist of
    * `value` WITHIN its event type (the "where does this observation
    * sit in its cohort" surface; both are tie-stable by definition:
    * equal values share a rank, so no arbitrary tiebreak leaks into
    * the output). One exchange on event_type serves both window
    * functions — same partitioning, same sort — and the per-partition
    * sort is the only O(n log n) work; skewed types are bounded by the
    * type cardinality of the corpus, not by key hotness. */
  def distributionRank(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("value")
    events.select(col("event_id"), col("event_type"), col("value"))
      .withColumn("pr", round(percent_rank().over(w), 6))
      .withColumn("cd", round(cume_dist().over(w), 6))
  }

  /** ENTROPY RATE of the per-user event-type sequence under its own
    * first-order Markov model — how predictable the NEXT action is
    * given the current one (the information-theoretic session metric:
    * H = −Σᵢⱼ π̂ᵢ p̂ᵢⱼ ln p̂ᵢⱼ collapses to −Σᵢⱼ (cᵢⱼ/C)·ln(cᵢⱼ/cᵢ·),
    * all from transition COUNTS — exact integers until the final
    * logs). One (user, time)-windowed lead pass to transition pairs,
    * one states²-sized rollup; predictability = 1 − H/ln k normalizes
    * against the uniform-chain ceiling. */
  def entropyRate(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")), col("event_id"))
    val trans = events
      .withColumn("to_state", lead("event_type", 1).over(w))
      .filter(col("to_state").isNotNull)
      .groupBy(col("event_type").as("from_state"), col("to_state"))
      .agg(count(lit(1)).as("c"))
    val wf = Window.partitionBy("from_state")
    trans.withColumn("cf", sum("c").over(wf))
      .agg(sum("c").as("nt"),
        sum(col("c") * log(col("c").cast("double") / col("cf")))
          .as("hnum"),
        countDistinct("from_state").as("k"))
      .select(col("nt").as("n_transitions"), col("k").as("n_states"),
        round(-col("hnum") / col("nt"), 6).as("entropy_rate"),
        round(lit(1.0) + col("hnum") / col("nt") /
          log(col("k").cast("double")), 6).as("predictability"))
  }

  /** MARKOV removal-effect attribution — the principled multi-touch
    * model next to [[firstTouchAttribution]]'s heuristic (first/last
    * touch hand the whole conversion to one arbitrary touchpoint;
    * removal effect asks the counterfactual: how much conversion
    * DISAPPEARS if this channel's transitions are severed — Anderl et
    * al.'s standard formulation). Journeys = each user's pre-conversion
    * event-type sequence, START-prefixed, absorbed by CONV (the user
    * purchased) or NULL (they didn't).
    *
    * Distributed part: ONE lag-window pass builds the transition-count
    * frame (states² ≤ ~50 rows). Driver part: the absorbing-chain
    * conversion probability under each channel removal — a power
    * iteration over a ≤7-state matrix, the parameter-sized scalar
    * class (codebook/PACF precedent). Deterministic: fixed iteration
    * count, exact integer counts in, 6dp out. Output: one row per
    * channel — removal_effect and the normalized attribution share.
    *
    * Replayability (r9 [oracle] flip): every float operation runs in a
    * CANONICAL order — the mass vector is indexed by SORTED channel
    * name, each new mass/conversion term is a left-assoc sum over
    * sources in that order, and per-step conversion adds as ONE
    * parenthesized group — so a DuckDB recursive CTE carrying the same
    * (mass…, conv) row through the same 200 steps reproduces the
    * doubles bit-for-bit (the ts_pacf Durbin–Levinson discipline,
    * extended from unrolled stages to a keyed recursion). */
  def markovAttribution(events: DataFrame,
                        convType: String = "purchase",
                        iters: Int = 200): DataFrame = {
    val spark = events.sparkSession
    // first conversion time per user (+∞ when never converting)
    val firstConv = events.filter(col("event_type") === convType)
      .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("cts"))
    val pre = events.filter(col("event_type") =!= convType)
      .join(firstConv, Seq("user_id"), "left")
      .filter(col("cts").isNull || unix_micros(col("ts")) < col("cts"))
      .withColumn("converted", col("cts").isNotNull)
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")), col("event_id"))
    val steps = pre
      .withColumn("to_type", lead("event_type", 1).over(w))
      .withColumn("from0",
        when(row_number().over(w) === 1, lit("__START__"))
          .otherwise(lit(null)))
    val trans = steps.select(col("event_type").as("from_state"),
        coalesce(col("to_type"),
          when(col("converted"), "__CONV__").otherwise("__NULL__"))
          .as("to_state"))
      .unionByName(steps.filter(col("from0").isNotNull)
        .select(col("from0").as("from_state"),
          col("event_type").as("to_state")))
      .groupBy("from_state", "to_state").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // driver-side absorbing chain over the tiny matrix, every float op
    // in canonical sorted-channel order (see scaladoc: oracle replay)
    val channels = trans.flatMap(t => Seq(t._1, t._2))
      .filter(s => !s.startsWith("__")).distinct.sorted
    def pConv(removed: Option[String]): Double = {
      // transitions into/out of the removed channel divert to __NULL__
      val eff = trans.map { case (f, t, n) =>
        val f2 = if (removed.contains(f)) "__NULL__" else f
        val t2 = if (removed.contains(t)) "__NULL__" else t
        (f2, t2, n)
      }.filter(_._1 != "__NULL__")
      // out-degree totals stay exact longs; each probability is one
      // long-sum / long-sum double division — identical on any engine
      val tot = eff.groupBy(_._1).map { case (f, ts) =>
        f -> ts.map(_._3).sum.toDouble }
      val pr = eff.groupBy(t => (t._1, t._2)).map { case (k, xs) =>
        k -> xs.map(_._3).sum / tot(k._1) }
      def p(f: String, t: String): Double = pr.getOrElse((f, t), 0.0)
      // step 1 moves the unit mass out of __START__ (structurally no
      // START→CONV edge exists, but the term is kept for the twin)
      var m = channels.map(c => p("__START__", c))
      var conv = p("__START__", "__CONV__")
      for (_ <- 2 to iters) {
        val next = channels.map(t =>
          channels.indices.map(i => m(i) * p(channels(i), t)).sum)
        conv += channels.indices.map(i =>
          m(i) * p(channels(i), "__CONV__")).sum
        m = next
      }
      conv
    }
    val base = pConv(None)
    val effects = channels.map(c =>
      (c, if (base == 0.0) 0.0 else
        math.max(0.0, 1.0 - pConv(Some(c)) / base)))
    val totalEff = effects.map(_._2).sum
    import spark.implicits._
    effects.toSeq.map { case (c, e) =>
      (c, math.rint(e * 1e6) / 1e6,
        if (totalEff == 0.0) 0.0
        else math.rint(e / totalEff * 1e6) / 1e6)
    }.toDF("channel", "removal_effect", "attribution")
  }

  /** DAU/MAU STICKINESS per day — the engagement ratio next to
    * [[newVsReturning]]'s acquisition split ("of everyone active this
    * month, what share showed up today"): DAU = distinct users that
    * day, MAU = distinct users in the trailing `window` days. COUNT
    * DISTINCT over a sliding range can't partial-aggregate, so the
    * design expands the DISTINCT (user, day) activity frame — already
    * collapsed from raw events, users×active-days sized — `window`×
    * via a day-grid range join and counts distinct per grid day. The
    * amplification applies to the activity frame, never the raw
    * corpus; at 100 TB that frame is users×days, the same class every
    * retention rollup already touches. Integer counts; one final
    * ratio, round 4. */
  def stickiness(events: DataFrame, window: Int = 30): DataFrame = {
    val ud = events.select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val grid = ud.select(col("day").as("gday")).distinct()
    val mau = ud.join(grid,
        col("day") <= col("gday") &&
        col("day") > date_sub(col("gday"), window))
      .groupBy("gday")
      .agg(countDistinct("user_id").as("mau"))
    val dau = ud.groupBy("day").agg(countDistinct("user_id").as("dau"))
    dau.join(mau, col("day") === col("gday"))
      .select(col("day"), col("dau"), col("mau"),
        round(col("dau") / col("mau").cast("double"), 4).as("stickiness"))
  }

  /** Daily NEW vs RETURNING active users — the product-analytics
    * growth/stickiness split (w10_retention's cohort matrix answers
    * "who came back"; this answers "of today's actives, who is
    * acquisition vs retention"). Two narrow passes: a user-count-sized
    * first-seen-day frame (one partial-agg pass), and the distinct
    * (user, day) activity frame joined to it on the user key (plain
    * equi-join — AQE broadcasts the first-seen side when it fits,
    * shuffles it co-partitioned when it doesn't), rolled up per day.
    * All integer counts — no float anywhere. */
  def newVsReturning(events: DataFrame): DataFrame = {
    val firstDay = events.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("first_day"))
    events.select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .join(firstDay, "user_id")
      .groupBy("day")
      .agg(
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
          .as("new_users"),
        sum(when(col("day") =!= col("first_day"), 1L).otherwise(0L))
          .as("returning_users"))
  }

  /** ATTRIBUTION-WINDOW sensitivity ladder — the robustness check on
    * w19's single-window credit: how many conversions have a preceding
    * click within 1 h / 6 h / 24 h? If credited share swings hard
    * across windows, the attribution model is an artifact of the
    * window choice, not the marketing (the first question an
    * attribution audit asks).
    *
    * ONE user-partitioned ordered window finds each purchase's latest
    * preceding click (a conditional running max — no self-join, no
    * per-window pass), then the whole ladder is conditional sums over
    * the purchases frame; gaps are exact integer seconds. */
  def attributionWindows(events: DataFrame,
                         windows: Seq[Long] = Seq(3600L, 21600L, 86400L))
      : DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy("ts_s", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val purchases = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_seconds(col("ts")).as("ts_s"))
      .withColumn("last_click",
        max(when(col("event_type") === "click", col("ts_s")))
          .over(byUser))
      .filter(col("event_type") === "purchase")
      .withColumn("gap", col("ts_s") - col("last_click"))
    val aggCols = count(lit(1)).as("n_purchases") +:
      windows.map(w =>
        sum(when(col("gap").isNotNull && col("gap") <= w, 1L)
          .otherwise(0L)).as(s"c_$w"))
    val one = purchases.agg(aggCols.head, aggCols.tail: _*)
      .localCheckpoint(true)
    windows.map { w =>
      one.select(lit(w).as("window_s"), col("n_purchases"),
        col(s"c_$w").as("n_credited"),
        round(col(s"c_$w").cast("double") / col("n_purchases"), 6)
          .as("credited_share"))
    }.reduce(_.unionByName(_))
  }

  /** GROWTH ACCOUNTING (the new/retained/resurrected/churned weekly
    * ledger) — the decomposition that explains WHY the active count
    * moved, which w23's new-vs-returning daily split and w10's cohort
    * retention each only half-answer: every active user-week is
    * exactly one of NEW (first week ever), RETAINED (also active last
    * week) or RESURRECTED (seen before, skipped last week), and
    * CHURNED(w) = active(w−1) − retained(w) closes the ledger —
    * active(w) = active(w−1) + new + resurrected − churned holds row
    * by row (spec-locked identity).
    *
    * Scale shape: the corpus collapses ONCE to distinct (user, week);
    * first-weeks are a user-sized rollup; last-week activity aligns by
    * an equi-join on the shifted week key (AQE broadcast-or-co-
    * partition); all outputs are exact integer counts on a weeks-sized
    * frame. */
  def growthAccounting(events: DataFrame): DataFrame = {
    val uw = events
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("week"))
      .distinct()
      .localCheckpoint(true)
    val firsts = uw.groupBy("user_id").agg(min("week").as("first_week"))
    val prev = uw.select(col("user_id"),
      date_add(col("week"), 7).as("week"), lit(1).as("was_active"))
    val states = uw
      .join(firsts, Seq("user_id"))
      .join(prev, Seq("user_id", "week"), "left")
      .select(col("week"),
        (col("week") === col("first_week")).as("is_new"),
        col("was_active").isNotNull.as("was_active"))
    val weekly = states.groupBy("week").agg(
      count(lit(1)).as("n_active"),
      sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"),
      sum(when(!col("is_new") && col("was_active"), 1L).otherwise(0L))
        .as("n_retained"),
      sum(when(!col("is_new") && !col("was_active"), 1L).otherwise(0L))
        .as("n_resurrected"))
    val prevActive = weekly.select(date_add(col("week"), 7).as("week"),
      col("n_active").as("prev_active"))
    weekly.join(prevActive, Seq("week"), "left")
      .select(col("week"), col("n_active"), col("n_new"),
        col("n_retained"), col("n_resurrected"),
        (coalesce(col("prev_active"), lit(0L)) - col("n_retained"))
          .as("n_churned"))
  }

  /** MERGE-OVERLAPPING-INTERVALS per user (the classic islands
    * problem, w21's per-user complement — w21 asks "how many sessions
    * overlap right now GLOBALLY", this asks "how much wall-clock did
    * EACH user actually cover"): every event opens a [ts, ts+window)
    * interval; touching/overlapping intervals fuse into blocks, and
    * the per-user answer is block count + covered seconds — the
    * dwell-time metric naive sum-of-durations double-counts.
    *
    * Pure integer arithmetic on epoch seconds (no rounding anywhere):
    * a block starts where start > running max of previous ends (ROWS
    * window per user), block id = running sum of those starts, cover =
    * max(end) − min(start) per block. Windows partition on user_id —
    * nothing global, the classic scale shape. */
  def intervalMerge(events: DataFrame, windowSec: Long = 1800L)
      : DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy("start", "event_id")
    val prev = byUser.rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), col("event_id"),
        unix_seconds(col("ts")).as("start"),
        (unix_seconds(col("ts")) + windowSec).as("end"))
      .withColumn("new_block",
        when(col("start") > coalesce(max("end").over(prev),
          lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("block", sum("new_block").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "block")
      .agg(min("start").as("s"), max("end").as("e"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("e") - col("s")).as("covered_seconds"))
  }

  /** COHORT-LTV triangle — the revenue companion to [[retention]]'s
    * activity counts: users cohort by the week of their FIRST purchase,
    * and each (cohort, weeks_since) cell reports the cohort's active
    * purchasers, that week's revenue, and the running LTV per cohort
    * user (cumulative revenue / cohort size — the curve whose flattening
    * says when a cohort stops paying back). Revenue stays exact-integer
    * cents until the display division; the cumulative window runs per
    * cohort over the weeks frame (report-sized). One pass to per-user
    * firsts, one to the (cohort, week) rollup. */
  def cohortLtv(events: DataFrame): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("wk"),
        round(col("value") * 100).cast("long").as("cents"))
    val firsts = p.groupBy("user_id").agg(min("wk").as("cohort"))
    val sizes = firsts.groupBy("cohort").agg(count(lit(1)).as("n_cohort"))
    val cells = p.join(firsts, Seq("user_id"))
      .groupBy(col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("int")
          .as("weeks_since"))
      .agg(countDistinct("user_id").as("n_active"),
        sum("cents").as("cents"))
    val w = Window.partitionBy("cohort").orderBy("weeks_since")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.join(sizes, Seq("cohort"))
      .select(col("cohort"), col("weeks_since"), col("n_cohort"),
        col("n_active"),
        round(col("cents") / lit(100.0), 2).as("revenue"),
        round(sum("cents").over(w) /
          (col("n_cohort") * lit(100.0)), 4).as("cum_ltv_per_user"))
  }

  /** TIME-WEIGHTED AVERAGE (TWAP) per event type — the mean that
    * respects HOW LONG each observation was the current one (the
    * plain mean over-weights bursty periods: 100 readings in a hot
    * minute count 100×, though the state they describe lasted one
    * minute; TWAP is the finance/ops standard for "average level over
    * the period"): each value holds from its timestamp to the NEXT
    * observation of the same type (the last observation holds no
    * interval and drops — documented), weight = exact integer
    * microseconds.
    *
    * Exact path: value in cents (long) × holding micros (long)
    * accumulate in decimal(38,0); the divide happens once per type.
    * The simple mean rides the same pass for the bias report
    * (twap_minus_mean is the burstiness signature). One window over
    * the per-type exchange, one rollup. */
  def twap(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("us", "event_id")
    val dec = "decimal(38,0)"
    events
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        graft.operators.Exact.cents(col("value")).as("c"))
      .withColumn("hold", lead("us", 1).over(w) - col("us"))
      .filter(col("hold").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("c").cast(dec) * col("hold").cast(dec)).as("cw"),
        sum(col("hold").cast(dec)).as("tw"),
        sum(col("c")).as("sc"))
      .select(col("event_type"), col("n_intervals"),
        round(col("cw").cast("double") / col("tw").cast("double")
          / 100.0, 6).as("twap"),
        round(col("sc").cast("double") / col("n_intervals") / 100.0, 6)
          .as("plain_mean"))
  }
}
