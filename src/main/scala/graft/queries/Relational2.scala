package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.TemporalJoins

/** Coverage batch 2: grouping-set variants, set ops, analytic windows,
  * string/math scalar surface, SQL-string entry, temporal joins,
  * approximate aggregates. Same determinism/oracle discipline as
  * [[Relational]]. */
object Relational2 {
  type Q = (SparkSession, String) => DataFrame

  /** CUBE over two keys. */
  val qCube: Q = (s, d) =>
    Tables.lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** GROUPING SETS through the SQL parser (P1: the reference's SQL-string
    * entry point, with a real query). */
  val qGroupingSets: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** INTERSECT (distinct): customers with both F- and O-status orders. */
  val qIntersect: Q = (s, d) => {
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "F").select("o_custkey")
      .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** EXCEPT (distinct): customers with F-status but no O-status orders. */
  val qExcept: Q = (s, d) => {
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "F").select("o_custkey")
      .except(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** UNION DISTINCT of two single-column domains. */
  val qUnionDistinct: Q = (s, d) =>
    Tables.lineitem(s, d).select(col("l_returnflag").as("flag"))
      .union(Tables.orders(s, d).select(col("o_orderstatus").as("flag")))
      .distinct()
      .orderBy("flag")

  /** Analytic windows: lead, dense_rank, ntile in one pass per customer. */
  val qWindowAnalytic: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("next_price", lead("o_totalprice", 1).over(w))
      .withColumn("drank", dense_rank().over(w).cast("long"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .select("o_custkey", "o_orderkey", "next_price", "drank", "quartile")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** String scalar surface: substring, concat_ws, replace, lpad, upper,
    * regexp_extract. */
  val qStringFuncs: Q = (s, d) =>
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        substring(col("c_name"), 1, 8).as("prefix"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
        upper(col("c_mktsegment")).as("seg_upper"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"))
      .orderBy("c_custkey")

  /** Second string battery: edit distance + character-level rewrites
    * (levenshtein, translate, repeat, reverse, rpad, ascii) — the
    * fuzzy-matching / normalization surface the first battery doesn't
    * cover; every function replays exactly in DuckDB. */
  val qStringFuncs2: Q = (s, d) =>
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        levenshtein(col("c_name"), col("c_mktsegment")).cast("long").as("lev"),
        translate(col("c_name"), "Customer#", "cUSTOMER_").as("tr"),
        repeat(col("c_mktsegment"), 2).as("rep"),
        reverse(col("c_name")).as("rev"),
        rpad(col("c_mktsegment"), 12, ".").as("rp"),
        ascii(col("c_name")).cast("long").as("first_code"))
      .orderBy("c_custkey")

  /** Math scalar surface on stored doubles (IEEE-exact ops only: abs,
    * floor, ceil, sqrt, sign, greatest/least — no pow/exp/log, whose libm
    * results differ across engines in the last ulp). */
  val qMathFuncs: Q = (s, d) =>
    Tables.supplier(s, d)
      .select(
        col("s_suppkey"),
        abs(col("s_acctbal")).as("abs_bal"),
        floor(col("s_acctbal")).cast("long").as("floor_bal"),
        ceil(col("s_acctbal")).cast("long").as("ceil_bal"),
        sqrt(abs(col("s_acctbal"))).as("sqrt_bal"),
        signum(col("s_acctbal")).as("sign_bal"),
        greatest(col("s_acctbal"), lit(0.0)).as("pos_bal"))
      .orderBy("s_suppkey")

  /** Order-statistic aggregates: exact median + interpolated percentiles
    * (portable: both engines interpolate), spread stats rounded.
    *
    * Computed via [[graft.operators.Percentiles.groupedQuantiles]] — the
    * sort-based spillable path — NOT Spark's `median`/`percentile`
    * aggregates, whose ObjectHashAggregate buffers every group value in
    * executor memory (the one plan shape that cannot survive a 100×
    * scale-up; PlanSpec pins its absence). The approximate sibling for
    * single-pass sketched answers is `q_approx_percentile`. */
  val qPercentiles: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val qty = graft.operators.Percentiles.groupedQuantiles(
      li, "l_returnflag", "l_quantity", Seq(0.5 -> "med_qty_raw"))
    // Interpolate the price percentiles over exact integer CENTS: the
    // stored 2-decimal price as a double is inexact, so lo+frac·(hi−lo)
    // is order/ulp-sensitive and at sf0.001 the p75 landed exactly on a
    // 2-decimal rounding midpoint (81364.255 — engines rounded opposite
    // ways). Integer-cent doubles make every interpolation intermediate
    // exactly representable (frac ∈ {0,.25,.5,.75}), so the quarter-cent
    // result is bit-identical in any engine; rounding at 4 decimals is
    // then the identity (quarter-cents are exact 4-decimal values, never
    // midpoints of a 4-decimal round).
    val priceCents = li.withColumn("price_cents",
      round(col("l_extendedprice") * 100).cast("long").cast("double"))
    val price = graft.operators.Percentiles.groupedQuantiles(
      priceCents, "l_returnflag", "price_cents",
      Seq(0.25 -> "p25_price_raw", 0.75 -> "p75_price_raw"))
    // stddev from exact integer moments (n, Σq, Σq² — quantities are
    // integer-valued), divided in the same order the oracle uses:
    // stddev_samp(double) accumulates in engine-specific order, a
    // cross-engine hazard of the same class as the interpolated
    // percentile below. Identical integers → identical doubles.
    val q_ = col("l_quantity").cast("long")
    val spread = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("__sn"), sum(q_).as("__s1"),
        sum(q_ * q_).as("__s2"))
      .select(col("l_returnflag"),
        round(sqrt(
          (col("__sn") * col("__s2") - col("__s1") * col("__s1")).cast("double")
            / (col("__sn") * (col("__sn") - 1)).cast("double")), 4).as("sd_qty"))
    qty.join(price, "l_returnflag").join(spread, "l_returnflag")
      .select(
        col("l_returnflag"),
        round(col("med_qty_raw"), 4).as("med_qty"),
        round(col("p25_price_raw") / 100, 4).as("p25_price"),
        round(col("p75_price_raw") / 100, 4).as("p75_price"),
        col("sd_qty"))
      .orderBy("l_returnflag")
  }

  /** As-of join: each purchase matched to the user's latest signup at or
    * before it (graft.operators.TemporalJoins — DuckDB expresses the same
    * with native ASOF JOIN). */
  val qAsofJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val signups = ev.filter(col("event_type") === "signup")
      .select("user_id", "ts", "event_id")
    TemporalJoins.asOf(purchases, signups, "user_id", "ts",
        Map("event_id" -> "signup_event_id"))
      .select("user_id", "event_id", "value", "signup_event_id")
      .orderBy("user_id", "event_id")
  }

  /** The SAME as-of join through the custom physical operator
    * ([[graft.plans.AsOfJoinExec]] — planner-inserted exchanges+sorts,
    * one streaming merge pass per co-partition). Shares q_asof_join's
    * oracle: DuckDB replays both with its native ASOF JOIN, so the
    * custom exec's output is certified identical to the composed form's
    * AND to the reference semantics. */
  val qAsofNative: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val signups = ev.filter(col("event_type") === "signup")
      .select("user_id", "ts", "event_id")
    TemporalJoins.asOfNative(purchases, signups, "user_id", "ts")
      .select(col("user_id"), col("event_id"), col("value"),
        col("r_event_id").as("signup_event_id"))
      .orderBy("user_id", "event_id")
  }

  /** Range self-join: event pairs within 60 seconds (bucketed equi-join,
    * not a nested-loop inequality join). */
  val qRangeJoin: Q = (s, d) =>
    TemporalJoins.rangeSelfJoin(Tables.events(s, d), "event_id", "ts", 60L)
      .orderBy("a_id", "b_id")

  /** HLL sketch count-distinct (rows-only: sketch estimates are
    * engine-specific) next to exact, with per-engine relative error
    * asserted in specs instead. */
  val qApproxDistinct: Q = (s, d) =>
    Tables.lineitem(s, d)
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))

  /** MERGEABLE HLL sketches — the re-aggregation pattern approx_count_
    * distinct can't do: per-group Datasketches HLL sketches are built
    * once (`hll_sketch_agg`), persisted as binary, and then UNIONED to
    * answer coarser-rollup distinct counts WITHOUT rescanning the fact
    * table. At 100 TB this is the difference between one scan feeding
    * every rollup level and one scan per level: daily sketches merge
    * into monthly into all-time, each merge touching kilobytes.
    * Rows-only: sketch estimates are engine-specific; spec asserts the
    * merged estimate equals re-sketching from scratch and tracks exact. */
  val qHllUnion: Q = (s, d) => {
    val perFlag = Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(hll_sketch_agg(col("l_partkey")).as("sketch"))
    perFlag.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_parts_all"),
      count(lit(1)).as("n_sketches"))
  }

  val all: Map[String, Q] = Map(
    "q_cube" -> qCube,
    "q_grouping_sets" -> qGroupingSets,
    "q_intersect" -> qIntersect,
    "q_except" -> qExcept,
    "q_union_distinct" -> qUnionDistinct,
    "q_window_analytic" -> qWindowAnalytic,
    "q_string_funcs" -> qStringFuncs,
    "q_string_funcs2" -> qStringFuncs2,
    "q_math_funcs" -> qMathFuncs,
    "q_percentiles" -> qPercentiles,
    "q_asof_join" -> qAsofJoin,
    "q_asof_native" -> qAsofNative,
    "q_range_join" -> qRangeJoin,
    "q_approx_distinct" -> qApproxDistinct,
    "q_hll_union" -> qHllUnion,
  )

  val oracles: Map[String, String] = Map(
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        | count(*) AS cnt
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        | count(*) AS cnt
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    "q_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    "q_union_distinct" ->
      """SELECT l_returnflag AS flag FROM lineitem
        |UNION
        |SELECT o_orderstatus AS flag FROM orders
        |ORDER BY flag""".stripMargin,
    "q_window_analytic" ->
      """SELECT o_custkey, o_orderkey,
        | lead(o_totalprice, 1) OVER w AS next_price,
        | CAST(dense_rank() OVER w AS BIGINT) AS drank,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_string_funcs" ->
      """SELECT c_custkey,
        | substring(c_name, 1, 8) AS prefix,
        | concat_ws('|', c_mktsegment, c_name) AS joined,
        | regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
        | lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
        | upper(c_mktsegment) AS seg_upper,
        | regexp_extract(c_name, '([0-9]+)', 1) AS digits
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_string_funcs2" ->
      """SELECT c_custkey,
        | CAST(levenshtein(c_name, c_mktsegment) AS BIGINT) AS lev,
        | translate(c_name, 'Customer#', 'cUSTOMER_') AS tr,
        | repeat(c_mktsegment, 2) AS rep,
        | reverse(c_name) AS rev,
        | rpad(c_mktsegment, 12, '.') AS rp,
        | CAST(ascii(c_name) AS BIGINT) AS first_code
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT s_suppkey,
        | abs(s_acctbal) AS abs_bal,
        | CAST(floor(s_acctbal) AS BIGINT) AS floor_bal,
        | CAST(ceil(s_acctbal) AS BIGINT) AS ceil_bal,
        | sqrt(abs(s_acctbal)) AS sqrt_bal,
        | CASE WHEN s_acctbal > 0 THEN 1.0 WHEN s_acctbal < 0 THEN -1.0 ELSE 0.0 END AS sign_bal,
        | greatest(s_acctbal, 0.0) AS pos_bal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        | round(median(l_quantity), 4) AS med_qty,
        | round(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25) / 100, 4) AS p25_price,
        | round(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.75) / 100, 4) AS p75_price,
        | round(sqrt(CAST(count(*) * sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
        |            - sum(CAST(l_quantity AS BIGINT)) * sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
        |        / CAST(count(*) * (count(*) - 1) AS DOUBLE)), 4) AS sd_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_asof_join" ->
      """SELECT l.user_id, l.event_id, l.value, r.event_id AS signup_event_id
        |FROM (SELECT user_id, ts, event_id, value FROM events
        |      WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events
        |                WHERE event_type = 'signup') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.user_id, l.event_id""".stripMargin,
    "q_asof_native" ->
      """SELECT l.user_id, l.event_id, l.value, r.event_id AS signup_event_id
        |FROM (SELECT user_id, ts, event_id, value FROM events
        |      WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events
        |                WHERE event_type = 'signup') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.user_id, l.event_id""".stripMargin,
    "q_range_join" ->
      """SELECT a.event_id AS a_id, b.event_id AS b_id,
        | CAST(epoch(date_trunc('second', b.ts)) - epoch(date_trunc('second', a.ts)) AS BIGINT) AS gap_sec
        |FROM events a
        |JOIN events b
        |  ON a.event_id < b.event_id
        | AND abs(epoch(date_trunc('second', a.ts)) - epoch(date_trunc('second', b.ts))) <= 60
        |ORDER BY a_id, b_id""".stripMargin,
  )
}
