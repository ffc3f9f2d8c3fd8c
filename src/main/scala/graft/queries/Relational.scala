package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables

/** Tier-B SQL operator surface (SURVEY.md §2, B1–B26) expressed
  * Spark-first with the DataFrame API, each paired with an ANSI/DuckDB
  * oracle over the same parquet tables.
  *
  * Determinism rules (oracle hash-matching):
  *  - every query ends in a total ORDER BY (unique tie-break key);
  *  - no raw double aggregation: doubles are cast to DECIMAL before
  *    SUM (exact arithmetic) and the final value cast back to DOUBLE —
  *    identical bits in Spark and DuckDB regardless of sum order, which
  *    also keeps the plan partial-aggregate friendly at scale;
  *  - timestamps leave the query as formatted strings or dates.
  */
object Relational {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  /** Exact-sum of a double column: cast to decimal first (order-independent
    * result), surface as double. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  private def dec(c: Column, scale: Int = 2): Column =
    c.cast(DecimalType(18, scale))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B1: projection + alias (+ deterministic top-n)
    "q_scan_project" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity").as("qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    }),

    // B2 + B5: WHERE with AND — predicates push to the parquet scan
    "q_filter_where" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // B3: LIKE
    "q_like" -> ((s, d) => {
      t(s, d, "part")
        .filter(col("p_name").like("%red%"))
        .select(col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey"))
    }),

    // B4: IS NULL via left outer join (customers without any large order)
    "q_outer_join_null" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 440000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .filter(col("o_orderkey").isNull)
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // B6 + B7: ORDER BY DESC + LIMIT → TakeOrderedAndProject (top-k, no full sort)
    "q_topk" -> ((s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(50)
    }),

    // B8: COUNT(*)
    "q_count_star" -> ((s, d) => {
      t(s, d, "lineitem").agg(count(lit(1)).as("n"))
    }),

    // B9: TPC-H Q1 shape — grouped aggregate with exact decimal sums
    "q1_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate").cast(DateType) <= lit(java.sql.Date.valueOf("1999-12-31")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"), 4))
            .cast(DoubleType).as("sum_disc_price"),
          count(lit(1)).as("count_order"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // GROUP BY + HAVING
    "q_group_having" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("total_qty"))
        .filter(col("n") > 100)
        .orderBy(col("l_suppkey"))
    }),

    // B15: equi-join with explicit broadcast of the small dimension
    "q_join_broadcast" -> ((s, d) => {
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("c_mktsegment"))
    }),

    // TPC-H Q5 shape: 6-way join, dims broadcast, fact tables shuffle on keys
    "q_join_multi" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      val li = t(s, d, "lineitem")
      val supp = t(s, d, "supplier")
      val nat = t(s, d, "nation")
      val reg = t(s, d, "region")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp),
          col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"), 4))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("n_name"))
    }),

    // B16: EXISTS → left semi join
    "q_semi_join" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // B16: NOT EXISTS → left anti join
    "q_anti_join" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // B16: uncorrelated scalar subquery → 1-row broadcast cross join
    "q_scalar_subquery" -> ((s, d) => {
      val p = t(s, d, "part")
      val avgPrice = p.agg((dsum(col("p_retailprice")) / count(lit(1))).as("avg_price"))
      p.crossJoin(broadcast(avgPrice))
        .filter(col("p_retailprice") > col("avg_price"))
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
    }),

    // B16: IN subquery → left semi join against a derived key set
    "q_in_subquery" -> ((s, d) => {
      val asianNations = t(s, d, "nation")
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      t(s, d, "supplier")
        .join(broadcast(asianNations), col("s_nationkey") === col("n_nationkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    }),

    // B26: CTE shape — per-customer order stats folded into segment stats
    "q_cte_agg" -> ((s, d) => {
      val perCust = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_ord"), dsum(col("o_totalprice")).as("spend"))
      t(s, d, "customer")
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(coalesce(col("n_ord"), lit(0L))).as("orders_total"),
          count(lit(1)).as("n_cust"))
        .orderBy(col("c_mktsegment"))
    }),

    // B26: top-3 per segment. NOT a row_number window: c_mktsegment has ~5
    // distinct values, so Window.partitionBy would funnel every customer
    // row into 5 tasks and sort whole segments at 100 TB. The bounded
    // top-k aggregator keeps <=3 rows per group in the partial aggregate.
    "q_window_rank" -> ((s, d) => {
      graft.ops.GraftAggregates.register(s)
      t(s, d, "customer")
        .groupBy("c_mktsegment")
        .agg(expr("graft_top_k(struct(-c_acctbal AS s, c_custkey AS c, c_acctbal AS bal), 3)").as("top"))
        .select(col("c_mktsegment"), posexplode(col("top")))
        .select(col("c_mktsegment"), (col("pos") + 1).as("rn"),
          col("col.c").as("c_custkey"), col("col.bal").as("c_acctbal"))
        .orderBy(col("c_mktsegment"), col("rn"))
    }),

    // B26: window — running sum (ordered frame ⇒ deterministic)
    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "lineitem")
        .filter(col("l_orderkey") <= 1000)
        .select(col("l_orderkey"), col("l_linenumber"),
          sum(dec(col("l_quantity"))).over(w).cast(DoubleType).as("running_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // B26: window — lag/lead offsets (ordered frame, per-order partition)
    "q_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
      t(s, d, "lineitem")
        .filter(col("l_orderkey") <= 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          dec(col("l_quantity")).cast(DoubleType).as("qty"),
          lag(dec(col("l_quantity")), 1).over(w).cast(DoubleType).as("prev_qty"),
          lead(dec(col("l_quantity")), 1).over(w).cast(DoubleType).as("next_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // B26: exact interpolated percentiles per group (sort-based exact
    // aggregate, not an approximate sketch)
    "q_percentile" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("med"),
          expr("percentile(o_totalprice, 0.9)").as("p90"))
        .orderBy(col("o_orderpriority"))
    }),

    // string similarity scalar: levenshtein distance (codegen built-in)
    "q_levenshtein" -> ((s, d) => {
      t(s, d, "part")
        .select(col("p_partkey"), col("p_name"),
          levenshtein(col("p_name"), lit("forest green navy")).as("dist"))
        .orderBy(col("dist"), col("p_partkey"))
        .limit(50)
    }),

    // B26: CUBE grouping sets
    "q_cube" -> ((s, d) => {
      t(s, d, "orders")
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n"))
        .orderBy(col("priority"), col("status"))
    }),

    // B26 set ops
    "q_union_setop" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .distinct()
        .orderBy(col("nk"))
    }),
    "q_intersect_setop" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy(col("nk"))
    }),
    "q_except_setop" -> ((s, d) => {
      t(s, d, "customer").select(col("c_custkey").as("k"))
        .except(t(s, d, "orders").filter(col("o_totalprice") > 440000)
          .select(col("o_custkey").as("k")))
        .orderBy(col("k"))
    }),

    // B26: ROLLUP (grouping sets)
    "q_rollup" -> ((s, d) => {
      t(s, d, "nation")
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n"))
        .orderBy(col("region"), col("nation"))
    }),

    // PIVOT — wide report of order revenue by month × priority, via the
    // native RelationalGroupedDataset.pivot with PINNED values (the
    // values list is what lets Catalyst plan ONE hash aggregate with
    // 5 conditional sums — leaving it implicit costs an extra distinct
    // job AND makes the schema data-dependent, both wrong at 100 TB).
    // Money goes through the integer-cents grid (round→BIGINT) so the
    // pivoted sums are exact in any aggregation order; the output
    // columns are renamed to identifier-safe names shared with the
    // oracle's conditional-aggregation spelling.
    "q_pivot_report" -> ((s, d) => {
      val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")
      val renames = Map("1-URGENT" -> "urgent_cents", "2-HIGH" -> "high_cents",
        "3-MEDIUM" -> "medium_cents", "4-NOT SPECIFIED" -> "notspec_cents",
        "5-LOW" -> "low_cents")
      t(s, d, "orders")
        .select(expr("CAST(month(o_orderdate) AS BIGINT)").as("month"),
          col("o_orderpriority"),
          expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("cents"))
        .groupBy("month")
        .pivot("o_orderpriority", priorities)
        .agg(sum("cents"))
        .withColumnsRenamed(renames)
        .orderBy("month")
    }),

    // B26: DISTINCT
    "q_distinct" -> ((s, d) => {
      t(s, d, "orders").select(col("o_orderpriority")).distinct()
        .orderBy(col("o_orderpriority"))
    }),

    // B26: CASE WHEN bucketing
    "q_case_bucket" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(
          when(col("l_quantity") < 10, "low")
            .when(col("l_quantity") < 30, "mid")
            .otherwise("high").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),

    // B13: TRY_CAST null-on-failure parity. Casts are projected AFTER the
    // top-k: each failing TRY_CAST costs a caught per-row exception, so
    // computing 100 instead of |orders| matters (and the result is
    // identical — the sort key is untouched).
    "q_try_cast" -> ((s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"),
          expr("TRY_CAST(o_orderstatus AS INT)").as("bad_int"),
          expr("TRY_CAST(CAST(o_custkey AS STRING) AS INT)").as("good_int"))
        .orderBy(col("o_orderkey"))
    }),

    // B11-adjacent: JSON field extraction + typed aggregation
    "q_json_extract" -> ((s, d) => {
      t(s, d, "events")
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // B10/B14: UNNEST → explode (Generate) + aggregate over the derived column
    "q_unnest_words" -> ((s, d) => {
      t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(20)
    }),

    // time-bucketed aggregate (event-time windowing, batch form)
    "q_date_trunc_hour" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 4).as("sum_value"))
        .orderBy(col("hour"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity AS qty FROM lineitem
        |ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q_filter_where" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_like" ->
      "SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%red%' ORDER BY p_partkey",
    "q_outer_join_null" ->
      """SELECT c_custkey, c_name FROM customer
        |LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 440000) o ON c_custkey = o_custkey
        |WHERE o_orderkey IS NULL ORDER BY c_custkey""".stripMargin,
    "q_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50",
    "q_count_star" ->
      "SELECT COUNT(*) AS n FROM lineitem",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '1999-12-31'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_group_having" ->
      """SELECT l_suppkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 100 ORDER BY l_suppkey""".stripMargin,
    "q_join_broadcast" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_multi" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |WHERE p_retailprice > (
        |  SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM part)
        |ORDER BY p_partkey""".stripMargin,
    "q_in_subquery" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_nationkey IN (
        |  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA')
        |ORDER BY s_suppkey""".stripMargin,
    "q_cte_agg" ->
      """WITH per_cust AS (
        |  SELECT o_custkey, COUNT(*) AS n_ord FROM orders GROUP BY o_custkey
        |)
        |SELECT c_mktsegment, CAST(SUM(COALESCE(n_ord, 0)) AS BIGINT) AS orders_total, COUNT(*) AS n_cust
        |FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_window_rank" ->
      """SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) x
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "q_window_running" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_orderkey ORDER BY l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem WHERE l_orderkey <= 1000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_window_lag" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS qty,
        |  CAST(LAG(CAST(l_quantity AS DECIMAL(18,2)), 1) OVER (
        |    PARTITION BY l_orderkey ORDER BY l_linenumber) AS DOUBLE) AS prev_qty,
        |  CAST(LEAD(CAST(l_quantity AS DECIMAL(18,2)), 1) OVER (
        |    PARTITION BY l_orderkey ORDER BY l_linenumber) AS DOUBLE) AS next_qty
        |FROM lineitem WHERE l_orderkey <= 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_percentile" ->
      """SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med,
        |  quantile_cont(o_totalprice, 0.9) AS p90
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_levenshtein" ->
      """SELECT p_partkey, p_name, levenshtein(p_name, 'forest green navy') AS dist
        |FROM part ORDER BY dist, p_partkey LIMIT 50""".stripMargin,
    "q_cube" ->
      """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COALESCE(o_orderstatus, 'ALL') AS status, COUNT(*) AS n
        |FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
        |ORDER BY priority, status""".stripMargin,
    "q_union_setop" ->
      """SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier
        |ORDER BY nk""".stripMargin,
    "q_intersect_setop" ->
      """SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier
        |ORDER BY nk""".stripMargin,
    "q_except_setop" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 440000
        |ORDER BY k""".stripMargin,
    "q_rollup" ->
      """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
        |  COUNT(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region, nation""".stripMargin,
    "q_distinct" ->
      "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority",
    "q_pivot_report" ->
      """SELECT CAST(month(o_orderdate) AS BIGINT) AS month,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
        |    THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS urgent_cents,
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
        |    THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS high_cents,
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
        |    THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS medium_cents,
        |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
        |    THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS notspec_cents,
        |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
        |    THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS low_cents
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,
    "q_case_bucket" ->
      """SELECT CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity < 30 THEN 'mid'
        |  ELSE 'high' END AS bucket, COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_try_cast" ->
      """SELECT o_orderkey, TRY_CAST(o_orderstatus AS INT) AS bad_int,
        |  TRY_CAST(CAST(o_custkey AS VARCHAR) AS INT) AS good_int
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_unnest_words" ->
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT UNNEST(string_split(text, ' ')) AS word FROM documents) x
        |WHERE word <> '' GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin,
    "q_date_trunc_hour" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin
  )
}
