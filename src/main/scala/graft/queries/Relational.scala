package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational operator inventory (SURVEY.md §2.1–2.8) expressed over
  * the driver testdata tables, one query per operator family, each paired
  * with an ANSI-SQL oracle in [[oracles]] runnable by DuckDB on the same
  * parquet tables.
  *
  * Conventions (scale + oracle discipline):
  *  - Every query ends in a deterministic `orderBy` on a unique key so the
  *    driver's hash compare is order-stable (SURVEY.md §7.4.5).
  *  - Double aggregates are `round(_, 2/4)` on BOTH sides so floating-point
  *    summation-order differences between engines can't flip the hash.
  *    Pass-through stored doubles are NOT rounded (identical bits).
  *  - Integer sums are kept BIGINT on both sides (DuckDB sums to HUGEINT —
  *    oracles cast back).
  *  - Small dimensions are broadcast explicitly; fact-fact joins shuffle on
  *    their keys and rely on AQE at scale.
  */
object Relational {
  private val round2 = (c: Column) => round(c, 2)
  private val round4 = (c: Column) => round(c, 4)

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------------
  // Aggregations (A1–A3) + scan/filter/project (S1, P3/P4/P6)
  // ---------------------------------------------------------------------

  /** TPC-H-Q1-style multi-aggregate group-by (A2 analog at scale).
    * Hash aggregate with map-side partial agg; one shuffle on the two
    * low-cardinality group keys. Ref: ml_project.py:131-132. */
  val q1Agg: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round2(sum("l_quantity")).as("sum_qty"),
        round2(sum("l_extendedprice")).as("sum_base_price"),
        round2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        round4(avg("l_quantity")).as("avg_qty"),
        round4(avg("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Equality filter + projection (P4: tournament == 'FIFA World Cup'
    * analog). Predicate reaches the parquet scan as a pushed filter. */
  val qFilterEq: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")

  /** Projection + rename + arithmetic (P3/P6 analog). */
  val qProject: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey").as("okey"),
        col("l_linenumber").as("line"),
        // raw product, no rounding: both engines do the same IEEE ops on
        // the same stored doubles → bit-identical (round() halfway cases
        // differ between Spark and DuckDB, SURVEY.md §7.4.5)
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))
      .orderBy("okey", "line")

  /** value_counts: group-count sorted desc (A1, ml_project.py:112). */
  val qValueCounts: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("event_type"))

  /** Multi-aggregate group-by: sum/count/mean (A2, ml_project.py:131-132). */
  val qMultiAgg: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round2(sum("l_quantity")).as("total_qty"),
        count(lit(1)).as("nb_rows"),
        round4(avg("l_quantity")).as("avg_qty"))
      .orderBy("l_returnflag")

  /** Global column means, no grouping (A3, ml_project.py:178). */
  val qGlobalMeans: Q = (s, d) =>
    Tables.lineitem(s, d)
      .agg(
        round4(avg("l_quantity")).as("avg_qty"),
        round4(avg("l_extendedprice")).as("avg_price"))

  // ---------------------------------------------------------------------
  // Top-k / sorts (T1–T5)
  // ---------------------------------------------------------------------

  /** Top-10 by group count (T1). Plans as partial-agg + shuffle +
    * TakeOrderedAndProject — no global sort materialization. */
  val qTopkCount: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("o_custkey"))
      .limit(10)

  /** Top-10 by metric (T2–T4, sort_values desc head). */
  val qTopkMetric: Q = (s, d) =>
    Tables.customer(s, d)
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
      .limit(10)

  /** Multi-key tiebreak ranking sort (T5, ml_project.py:312). */
  val qSortMultikey: Q = (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(100)

  // ---------------------------------------------------------------------
  // Set ops (U1/U2) — home/away-style unpivot union
  // ---------------------------------------------------------------------

  /** UNION ALL unpivot (U1 analog: customer/supplier balances stacked the
    * way home/away team-score columns are, ml_project.py:126-129), then
    * re-aggregated. */
  val qUnionUnpivot: Q = (s, d) => {
    val cust = Tables.customer(s, d)
      .select(col("c_nationkey").as("nkey"), col("c_acctbal").as("bal"))
    val supp = Tables.supplier(s, d)
      .select(col("s_nationkey").as("nkey"), col("s_acctbal").as("bal"))
    cust.unionByName(supp)
      .groupBy("nkey")
      .agg(round2(sum("bal")).as("total_bal"), count(lit(1)).as("cnt"))
      .orderBy("nkey")
  }

  // ---------------------------------------------------------------------
  // Joins (the capability the reference's star schema exists to serve, §2.3)
  // ---------------------------------------------------------------------

  /** Star join: fact lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region,
    * revenue by region. nation/region/customer are broadcast (small dims);
    * lineitem⋈orders is the only shuffle join and AQE handles skew. */
  val qStarJoin: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        round2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name")
  }

  /** Left-semi join (EXISTS). */
  val qSemiJoin: Q = (s, d) => {
    val big = Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 49)
      .select("l_orderkey")
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Left-anti join (NOT EXISTS): customers with no high-value orders. */
  val qAntiJoin: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .filter(col("o_totalprice") > 300000)
      .select("o_custkey")
    Tables.customer(s, d)
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------------
  // Window functions (§2.5 — harness surface; reference imports Window but
  // never uses it)
  // ---------------------------------------------------------------------

  /** row_number ranking per partition, top-3 per supplier. */
  val qWindowRank: Q = (s, d) => {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("l_suppkey", "rn", "l_orderkey", "l_linenumber")
      .orderBy("l_suppkey", "rn")
  }

  /** Running (cumulative) sum per customer over order date. */
  val qWindowRunning: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("running_total", round2(sum("o_totalprice").over(w)))
      .select("o_custkey", "o_orderkey", "running_total")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** lag() analytic: previous event value per user. */
  val qWindowLag: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_value", lag("value", 1).over(w))
      .select("user_id", "event_id", "value", "prev_value")
      .orderBy("user_id", "event_id")
  }

  // ---------------------------------------------------------------------
  // Distinct / rollup / pivot / casts / cleaning scalar ops (F2/F3/F6)
  // ---------------------------------------------------------------------

  /** DISTINCT (exact dedup primitive on key columns). */
  val qDistinct: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** Exact + approximate distinct counts. Exact only in the oracle;
    * HLL sketch value is engine-specific (see qApproxDistinct). */
  val qCountDistinct: Q = (s, d) =>
    Tables.orders(s, d)
      .agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        count(lit(1)).as("n_orders"))

  /** ROLLUP grouping sets with explicit null ordering (DuckDB defaults
    * NULLS LAST; Spark asc defaults nulls first — pinned on both sides). */
  val qRollup: Q = (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(round2(sum("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val eventTypes = Seq("click", "view", "purchase", "signup", "error")

  /** PIVOT: event_type → columns, sum(value). Explicit value list keeps
    * the output schema static (no extra distinct-scan job). */
  val qPivot: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .agg(round2(sum("value")))
      .orderBy("user_id")

  /** Canonicalizing casts (F6, spark_etl_job.py:72). floor() before the
    * double→int cast so Spark (truncate) and DuckDB (round-half-even)
    * agree. */
  val qCasts: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey").cast("string").as("okey_str"),
        col("l_linenumber").cast("long").as("line_l"),
        floor(col("l_quantity")).cast("int").as("qty_int"),
        col("l_orderkey").as("okey"))
      .orderBy("okey", "line_l")

  /** NaN→null scrub (F2) + null-fill default (F3, the reference's intended
    * semantics of na.fill). */
  val qCleanScrub: Q = (s, d) =>
    Tables.events(s, d)
      .select(when(isnan(col("value")), lit(null)).otherwise(col("value")).as("v"))
      .na.fill(Map("v" -> -1.0))
      .agg(round2(sum("v")).as("sum_v"), count(lit(1)).as("cnt"))

  /** Case normalization (F4 lower / F5 initcap intent). */
  val qCaseNorm: Q = (s, d) =>
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        lower(col("c_name")).as("lname"),
        initcap(lower(col("c_mktsegment"))).as("segment"))
      .orderBy("c_custkey")

  /** Conditional weight expression (F8/F9 analog: substring-contains CASE,
    * ml_project.py:191-198) — native when/contains, no UDF. */
  val qConditionalWeight: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn(
        "weight",
        when(col("text").contains("join") || col("text").contains("merge"), lit(1))
          .otherwise(lit(100)))
      .groupBy("lang")
      .agg(sum("weight").as("total_weight"), count(lit(1)).as("cnt"))
      .orderBy("lang")

  // ---------------------------------------------------------------------
  // Multi-format date parse (F1) — the reference's signature transform
  // ---------------------------------------------------------------------

  /** Round-trips o_orderdate through the two formats present in the
    * reference CSV (dd-MM-yyyy / yyyy-MM-dd, BASELINE.md), then re-parses
    * with the 4-format coalesce idiom (spark_etl_job.py:33-34). try_to_date
    * keeps the null-on-mismatch semantics under ANSI mode. */
  val qDateParseMulti: Q = (s, d) => {
    val stamped = Tables.orders(s, d).select(
      col("o_orderkey"),
      when(col("o_orderkey") % 2 === 0, date_format(col("o_orderdate"), "dd-MM-yyyy"))
        .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .as("dstr"))
    stamped
      // string-typed output pins down the date representation across
      // engines (DATE vs TIMESTAMP dtype ambiguity in the compare layer)
      .select(date_format(graft.etl.Clean.parseDateMulti(col("dstr")), "yyyy-MM-dd").as("d"))
      .groupBy("d")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("d")
  }

  // ---------------------------------------------------------------------
  // JSON + event-time ops (extension layer over events)
  // ---------------------------------------------------------------------

  /** JSON field extraction from the props string column. */
  val qJsonExtract: Q = (s, d) =>
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"), round2(sum("value")).as("sum_value"))
      .orderBy("k")

  /** Tumbling event-time window via date_trunc (batch analog of the
    * streaming windowed agg; oracle-portable, unlike window()'s struct). */
  val qTimeWindow: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"), round2(sum("value")).as("sum_value"))
      .orderBy("hour")

  // ---------------------------------------------------------------------
  // Deterministic star-schema ETL (the reference's core pipeline, §1.4/P2/P5,
  // with row_number surrogate keys instead of monotonically_increasing_id —
  // SURVEY.md §7.4.1)
  // ---------------------------------------------------------------------

  /** Builds a date dimension with dense surrogate keys and the fact keyed
    * by it — the deterministic, oracle-checkable variant of
    * spark_etl_job.py:46-78. Keys come from Scale.denseIds (range
    * partition + zipWithIndex: no single-partition window even when the
    * dim isn't tiny); the dim IS tiny here → broadcast back. */
  val qEtlStar: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val dateDim = graft.operators.Scale.denseIds(
      o.select(col("o_orderdate").as("dt")).distinct(), "date_id", Seq("dt"))
    o.join(broadcast(dateDim), col("o_orderdate") === col("dt"))
      .select(
        col("o_orderkey").as("game_id"),
        col("date_id"),
        col("o_totalprice"))
      .orderBy("game_id")
  }

  // ---------------------------------------------------------------------
  // registry
  // ---------------------------------------------------------------------

  val all: Map[String, Q] = Map(
    "q1_agg" -> q1Agg,
    "q_filter_eq" -> qFilterEq,
    "q_project" -> qProject,
    "q_value_counts" -> qValueCounts,
    "q_multi_agg" -> qMultiAgg,
    "q_global_means" -> qGlobalMeans,
    "q_topk_count" -> qTopkCount,
    "q_topk_metric" -> qTopkMetric,
    "q_sort_multikey" -> qSortMultikey,
    "q_union_unpivot" -> qUnionUnpivot,
    "q_star_join" -> qStarJoin,
    "q_semi_join" -> qSemiJoin,
    "q_anti_join" -> qAntiJoin,
    "q_window_rank" -> qWindowRank,
    "q_window_running" -> qWindowRunning,
    "q_window_lag" -> qWindowLag,
    "q_distinct" -> qDistinct,
    "q_count_distinct" -> qCountDistinct,
    "q_rollup" -> qRollup,
    "q_pivot" -> qPivot,
    "q_casts" -> qCasts,
    "q_clean_scrub" -> qCleanScrub,
    "q_case_norm" -> qCaseNorm,
    "q_conditional_weight" -> qConditionalWeight,
    "q_date_parse_multi" -> qDateParseMulti,
    "q_json_extract" -> qJsonExtract,
    "q_time_window" -> qTimeWindow,
    "q_etl_star" -> qEtlStar,
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_filter_eq" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin,
    "q_project" ->
      """SELECT l_orderkey AS okey, l_linenumber AS line,
        | l_extendedprice * (1 - l_discount) AS net_price
        |FROM lineitem ORDER BY okey, line""".stripMargin,
    "q_value_counts" ->
      """SELECT event_type, count(*) AS cnt FROM events
        |GROUP BY event_type ORDER BY cnt DESC, event_type""".stripMargin,
    "q_multi_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS total_qty,
        | count(*) AS nb_rows, round(avg(l_quantity), 4) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_global_means" ->
      """SELECT round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price FROM lineitem""".stripMargin,
    "q_topk_count" ->
      """SELECT o_custkey, count(*) AS cnt FROM orders
        |GROUP BY o_custkey ORDER BY cnt DESC, o_custkey LIMIT 10""".stripMargin,
    "q_topk_metric" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 10""".stripMargin,
    "q_sort_multikey" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_union_unpivot" ->
      """SELECT nkey, round(sum(bal), 2) AS total_bal, count(*) AS cnt
        |FROM (SELECT c_nationkey AS nkey, c_acctbal AS bal FROM customer
        |      UNION ALL
        |      SELECT s_nationkey AS nkey, s_acctbal AS bal FROM supplier)
        |GROUP BY nkey ORDER BY nkey""".stripMargin,
    "q_star_join" ->
      """SELECT r_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q_window_rank" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber FROM (
        | SELECT l_suppkey, l_orderkey, l_linenumber,
        |  row_number() OVER (PARTITION BY l_suppkey
        |                     ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        | FROM lineitem)
        |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_lag" ->
      """SELECT user_id, event_id, value,
        | lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_count_distinct" ->
      """SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
        | count(*) AS n_orders FROM orders""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        | count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        | round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
        | round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view,
        | round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
        | round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup,
        | round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_casts" ->
      """SELECT CAST(l_orderkey AS VARCHAR) AS okey_str,
        | CAST(l_linenumber AS BIGINT) AS line_l,
        | CAST(floor(l_quantity) AS INT) AS qty_int,
        | l_orderkey AS okey
        |FROM lineitem ORDER BY okey, line_l""".stripMargin,
    "q_clean_scrub" ->
      """SELECT round(sum(coalesce(CASE WHEN isnan(value) THEN NULL ELSE value END, -1.0)), 2) AS sum_v,
        | count(*) AS cnt FROM events""".stripMargin,
    "q_case_norm" ->
      """SELECT c_custkey, lower(c_name) AS lname,
        | upper(substr(lower(c_mktsegment), 1, 1)) || substr(lower(c_mktsegment), 2) AS segment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_conditional_weight" ->
      """SELECT lang,
        | CAST(sum(CASE WHEN text LIKE '%join%' OR text LIKE '%merge%'
        |               THEN 1 ELSE 100 END) AS BIGINT) AS total_weight,
        | count(*) AS cnt
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_date_parse_multi" ->
      """SELECT d, count(*) AS cnt FROM (
        | SELECT strftime(coalesce(
        |   CAST(try_strptime(dstr, '%m/%d/%Y') AS DATE),
        |   CAST(try_strptime(dstr, '%Y-%m-%d') AS DATE),
        |   CAST(try_strptime(dstr, '%d-%m-%Y') AS DATE),
        |   CAST(try_strptime(dstr, '%d/%m/%Y') AS DATE)), '%Y-%m-%d') AS d
        | FROM (SELECT CASE WHEN o_orderkey % 2 = 0
        |                   THEN strftime(o_orderdate, '%d-%m-%Y')
        |                   ELSE strftime(o_orderdate, '%Y-%m-%d') END AS dstr
        |       FROM orders))
        |GROUP BY d ORDER BY d""".stripMargin,
    "q_json_extract" ->
      """SELECT CAST(props->>'$.k' AS INT) AS k, count(*) AS cnt,
        | round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_time_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, count(*) AS cnt,
        | round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_etl_star" ->
      """SELECT o_orderkey AS game_id, date_id, o_totalprice
        |FROM orders
        |JOIN (SELECT dt, row_number() OVER (ORDER BY dt) AS date_id
        |      FROM (SELECT DISTINCT o_orderdate AS dt FROM orders)) AS dd
        |  ON o_orderdate = dd.dt
        |ORDER BY game_id""".stripMargin,
  )
}
