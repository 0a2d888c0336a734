package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §5 (oracle
  * discipline). Every implemented operator registers a query here; the
  * driver replays `oracleSql` in DuckDB over the same parquet tables and
  * hash-compares. Column names are aliased identically on both sides and
  * doubles are rounded on both sides (see SURVEY §5).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(Tables.lineitem(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- B. core relational ----
    "q1_agg" -> ((s, d) => Relational.pricingSummary(Tables.lineitem(s, d))),
    "q2_filter_project" -> ((s, d) => Relational.revenueFilter(Tables.lineitem(s, d))),
    "q3_join_broadcast" -> ((s, d) =>
      Relational.regionalRevenue(Tables.orders(s, d), Tables.customer(s, d),
        Tables.nation(s, d), Tables.region(s, d))),
    "q4_topn" -> ((s, d) => Relational.topOrders(Tables.orders(s, d), 10)),
    "q5_distinct" -> ((s, d) => Relational.distinctPartsPerFlag(Tables.lineitem(s, d))),
    "q6_union" -> ((s, d) => Relational.unionDistinctSegments(Tables.customer(s, d))),
    "q7_except" -> ((s, d) => Relational.exceptAllByStatus(Tables.orders(s, d), "F")),
    "q8_casewhen" -> ((s, d) => Relational.priceBands(Tables.orders(s, d))),
    "q9_sql_view" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql("""SELECT o_orderpriority, count(*) AS n FROM orders_v o
               WHERE EXISTS (SELECT 1 FROM lineitem_v l
                             WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
               GROUP BY o_orderpriority""")
    }),
    "q10_rollup" -> ((s, d) =>
      Relational.revenueRollup(Tables.orders(s, d), Tables.customer(s, d),
        Tables.nation(s, d), Tables.region(s, d))),
    "q11_semijoin" -> ((s, d) =>
      Relational.customersByOrderExistence(Tables.customer(s, d), Tables.orders(s, d))),
    "q12_selfjoin" -> ((s, d) => Relational.lineitemPairCount(Tables.lineitem(s, d))),
    "q13_crossjoin_agg" -> ((s, d) =>
      Relational.regionNationCombos(Tables.region(s, d), Tables.nation(s, d))),
    // ---- C. statistics & profiling ----
    "st_describe" -> ((s, d) =>
      Stats.profile(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount"))),
    "st_quantiles" -> ((s, d) =>
      Stats.quantiles(Tables.lineitem(s, d), "l_extendedprice", Seq(0.25, 0.5, 0.75))),
    "st_corr_cov" -> ((s, d) =>
      Stats.corrCov(Tables.lineitem(s, d), "l_quantity", "l_extendedprice")),
    "st_sample" -> ((s, d) =>
      Stats.sampleFraction(Tables.customer(s, d), 0.1, seed = 42)
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("sampled_rows"))),
    "st_freq_topn" -> ((s, d) => Stats.freqTopN(Tables.part(s, d), "p_brand", 10)),
  )

  /** DuckDB twins of `queries` (identical aliases + rounding — SURVEY §5). */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity),2) AS sum_qty,
           round(sum(l_extendedprice),2) AS sum_base_price,
           round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
           round(avg(l_quantity),4) AS avg_qty,
           round(avg(l_discount),6) AS avg_disc,
           count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q2_filter_project" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue
         FROM lineitem
         WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q3_join_broadcast" ->
      """SELECT r_name, n_name,
           round(sum(o_totalprice),2) AS total_revenue, count(*) AS order_count
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "q4_topn" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q5_distinct" ->
      """SELECT l_returnflag,
           count(DISTINCT l_partkey) AS distinct_parts,
           count(DISTINCT l_suppkey) AS distinct_supps
         FROM lineitem GROUP BY l_returnflag""",
    "q6_union" ->
      """SELECT c_mktsegment, count(*) AS n FROM (
           SELECT * FROM customer WHERE c_acctbal > 1000
           UNION
           SELECT * FROM customer WHERE c_mktsegment = 'BUILDING'
         ) GROUP BY c_mktsegment""",
    "q7_except" ->
      """SELECT o_orderstatus, count(*) AS n FROM (
           SELECT * FROM orders
           EXCEPT ALL
           SELECT * FROM orders WHERE o_orderstatus = 'F'
         ) GROUP BY o_orderstatus""",
    "q8_casewhen" ->
      """SELECT o_orderstatus,
           CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 200000 THEN 'mid'
                ELSE 'high' END AS price_band,
           count(*) AS n, round(avg(o_totalprice),2) AS avg_price
         FROM orders GROUP BY 1, 2""",
    "q9_sql_view" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
         GROUP BY o_orderpriority""",
    "q10_rollup" ->
      """SELECT r_name, n_name,
           round(sum(o_totalprice),2) AS total_revenue, count(*) AS order_count
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)""",
    "q11_semijoin" ->
      """SELECT c_nationkey, has_orders, count(*) AS n FROM (
           SELECT c_nationkey, TRUE AS has_orders FROM customer
           WHERE c_custkey IN (SELECT o_custkey FROM orders)
           UNION ALL
           SELECT c_nationkey, FALSE AS has_orders FROM customer
           WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
         ) GROUP BY c_nationkey, has_orders""",
    "q12_selfjoin" ->
      """SELECT count(*) AS pair_count
         FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber""",
    "q13_crossjoin_agg" ->
      """SELECT r_name, count(*) AS combos
         FROM region CROSS JOIN nation GROUP BY r_name""",
    "st_describe" ->
      """SELECT 'l_quantity' AS column, count(l_quantity) AS n,
           round(avg(l_quantity),4) AS mean, round(stddev_samp(l_quantity),4) AS std,
           round(min(l_quantity),4) AS minv, round(max(l_quantity),4) AS maxv
         FROM lineitem
         UNION ALL
         SELECT 'l_extendedprice', count(l_extendedprice),
           round(avg(l_extendedprice),4), round(stddev_samp(l_extendedprice),4),
           round(min(l_extendedprice),4), round(max(l_extendedprice),4)
         FROM lineitem
         UNION ALL
         SELECT 'l_discount', count(l_discount),
           round(avg(l_discount),4), round(stddev_samp(l_discount),4),
           round(min(l_discount),4), round(max(l_discount),4)
         FROM lineitem""",
    "st_quantiles" ->
      """SELECT round(quantile_cont(l_extendedprice, 0.25),4) AS q25,
           round(quantile_cont(l_extendedprice, 0.5),4) AS q50,
           round(quantile_cont(l_extendedprice, 0.75),4) AS q75
         FROM lineitem""",
    "st_corr_cov" ->
      """SELECT round(corr(l_quantity, l_extendedprice),6) AS corr_xy,
           round(covar_samp(l_quantity, l_extendedprice),4) AS cov_xy
         FROM lineitem""",
    "st_freq_topn" ->
      """SELECT p_brand, count(*) AS n FROM part
         GROUP BY p_brand ORDER BY n DESC, p_brand LIMIT 10""",
    // st_sample: seeded sampling is engine-specific → rows-only check.
  )
}
