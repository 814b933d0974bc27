package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Coverage batch 3: schema'd JSON parsing, null-handling scalar surface,
  * calendar functions. Cross-engine traps handled: Spark dayofweek is
  * 1=Sunday..7, DuckDB 0=Sunday..6 (+1 in the oracle); date-typed results
  * go out as formatted strings (DATE vs TIMESTAMP dtype ambiguity). */
object Relational3 {
  type Q = (SparkSession, String) => DataFrame

  private val propsSchema = StructType(Seq(StructField("k", IntegerType)))

  /** from_json with an explicit schema (vs the path-based
    * get_json_object in q_json_extract). */
  val qFromJson: Q = (s, d) =>
    // avg from integer cents, divided in the SAME order both engines
    // use: a raw avg(double) accumulates in engine-specific order, and a
    // group mean of 2-decimal money lands EXACTLY on a round-4 halfway
    // rational whenever cents·100/k terminates in …5 (common for small
    // groups — bit sf0.001 in r8: 60.13125 rounded opposite ways).
    // Identical integer inputs + identical op order → byte-identical
    // doubles → identical rounding at any scale.
    Tables.events(s, d)
      .withColumn("parsed", from_json(col("props"), propsSchema))
      .select(col("parsed.k").as("k"), col("value"))
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"),
        round(sum(expr("CAST(round(value * 100) AS BIGINT)")).cast("double")
          / 100.0 / count(lit(1)), 4).as("avg_value"))
      .orderBy("k")

  /** Null-handling scalars: nullif, coalesce, conditional defaults. */
  val qNullFuncs: Q = (s, d) =>
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nb"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("<dropped>")).as("seg_filled"),
        when(col("c_acctbal") < 0, lit(null).cast("double"))
          .otherwise(col("c_acctbal")).as("bal_pos_only"))
      .orderBy("c_custkey")

  /** Calendar functions over o_orderdate. */
  val qDateFuncs: Q = (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("q"),
        dayofweek(col("o_orderdate")).as("dow"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("long").as("days_since"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"))
      .orderBy("o_orderkey")

  /** RANGE-frame window: 7-day trailing order count/sum per customer
    * (range frames are value-based — all rows within the bound join the
    * frame, unlike ROWS frames). */
  val qWindowRangeFrame: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val days = datediff(col("o_orderdate"), lit("1995-01-01")).cast("long")
    val w = Window.partitionBy("o_custkey").orderBy(col("days_since"))
      .rangeBetween(-7, 0)
    Tables.orders(s, d)
      .withColumn("days_since", days)
      .withColumn("cnt_7d", count(lit(1)).over(w))
      .withColumn("sum_7d", round(sum("o_totalprice").over(w), 2))
      .select("o_custkey", "o_orderkey", "days_since", "cnt_7d", "sum_7d")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Approximate order statistics: percentile_approx's GK sketch is
    * mergeable, so the agg stays one partial+final shuffle at any scale —
    * the approximate sibling of q_percentiles' exact sort-based path.
    * Rows-only (sketch internals are engine-specific, not ANSI SQL). */
  val qApproxPercentile: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.95)), lit(10000)).as("pctiles"),
        count(lit(1)).as("cnt"))
      .select(col("l_returnflag"),
        round(element_at(col("pctiles"), 1), 2).as("p50"),
        round(element_at(col("pctiles"), 2), 2).as("p95"),
        col("cnt"))
      .orderBy("l_returnflag")

  /** Stratified sample — the training-data mixing knob: downsample
    * over-represented strata at read time, no shuffle at all. The
    * DETERMINISTIC id-hash form ([[graft.operators.Scale.stratifiedHashSample]]:
    * keep iff Knuth-hash bucket < stratum percent) rather than seeded
    * `sampleBy`, so the DuckDB oracle replays the exact row set
    * bit-identically; the seeded-RNG variant stays spec-covered
    * (ScaleSpec) as the when-you-don't-need-replayability option. */
  val qSampleStratified: Q = (s, d) =>
    graft.operators.Scale.stratifiedHashSample(
      Tables.documents(s, d), "doc_id", "lang",
      Map("en" -> 25, "es" -> 80, "fr" -> 80, "de" -> 80, "zh" -> 80))
      .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
      .orderBy("lang")

  /** Fixed-SIZE per-stratum sample — exactly n docs per lang (vs the
    * rate sampling of [[qSampleStratified]], whose output size is
    * binomial): rank within each stratum by the Knuth-hashed id — a
    * seedless pseudo-random total order any engine replays (the
    * multiplier is odd, so ·2654435761 mod 2³¹ permutes ids < 2³¹
    * bijectively) — and keep the first 20. Plan: the rank-≤-n predicate
    * over the window becomes partial WindowGroupLimit, so each task
    * keeps ≤ n rows PER STRATUM before the lang exchange — the
    * post-shuffle partition sees n·tasks rows, never the stratum. */
  val qSampleFixedN: Q = (s, d) => {
    val hv = graft.operators.Scale.knuthPerm(col("doc_id"))
    Tables.documents(s, d)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(hv.asc, col("doc_id").asc)))
      .filter(col("rk") <= 20)
      .select(col("lang"), col("doc_id"), col("rk").cast("long").as("rk"))
      .orderBy("lang", "rk")
  }

  /** TPC-H Q5-shaped six-table join — revenue per nation for one region
    * and a date band. The plan showcase the star schema exists for:
    * region/nation broadcast (tiny dims), customer/supplier broadcast or
    * shuffle by size, lineitem⋈orders as the one big shuffle pair;
    * Catalyst + AQE pick per-side strategies from stats. The
    * c_nationkey = s_nationkey predicate makes it a genuine cyclic join
    * graph, not a pure star. */
  val qMultiJoin: Q = (s, d) => {
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
    val l = Tables.lineitem(s, d)
    val su = Tables.supplier(s, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(su, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy("n_name")
  }

  /** Correlated-free scalar subquery through the SQL entry point —
    * Catalyst plans the inner agg once as a subquery broadcast, not a
    * per-row rescan. */
  val qScalarSubquery: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("cust_v")
    s.sql("""SELECT c_custkey, c_acctbal FROM cust_v
            |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM cust_v)
            |ORDER BY c_custkey""".stripMargin)
  }

  /** Multiset set-ops: EXCEPT ALL / INTERSECT ALL keep multiplicity
    * (unlike q_except/q_intersect's set semantics). */
  val qExceptAll: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    li.filter(col("l_quantity") < 20).select("l_suppkey")
      .exceptAll(li.filter(col("l_quantity") > 40).select("l_suppkey"))
      .groupBy("l_suppkey").agg(count(lit(1)).as("multiplicity"))
      .orderBy("l_suppkey")
  }

  val qIntersectAll: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    li.filter(col("l_quantity") < 20).select("l_suppkey")
      .intersectAll(li.filter(col("l_quantity") > 40).select("l_suppkey"))
      .groupBy("l_suppkey").agg(count(lit(1)).as("multiplicity"))
      .orderBy("l_suppkey")
  }

  /** Grouped list aggregation + array scalar functions. collect_list is
    * order-nondeterministic under parallel input, so sort_array
    * canonicalizes before any element access; outputs stay scalar (array
    * dtype repr differs across engines in the hash compare). listagg via
    * concat_ws over the sorted array. */
  val qArrayAgg: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list("l_linenumber")).as("arr"))
      .select(
        col("l_orderkey"),
        size(col("arr")).as("n_lines"),
        element_at(col("arr"), 1).as("first_ln"),
        element_at(col("arr"), -1).as("last_ln"),
        array_contains(col("arr"), 3).as("has3"),
        concat_ws(",", col("arr")).as("lines_csv"))
      .orderBy("l_orderkey")

  /** Native unpivot/melt (wide → long) — the API counterpart of the
    * manual unionByName unpivot in q_union_unpivot. Values cast to double
    * first: unpivot requires a common value type. */
  val qMelt: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double").as("l_quantity"),
        col("l_discount").cast("double").as("l_discount"),
        col("l_tax").cast("double").as("l_tax"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "metric", "val")
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // val joins the sort key so tie order is deterministic cross-engine
      .orderBy("l_orderkey", "l_linenumber", "metric", "val")

  /** Correlated EXISTS through the SQL entry — Catalyst decorrelates to a
    * left-semi join (never a per-row subquery rescan). */
  val qExistsCorrelated: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
    s.sql("""SELECT o_orderkey, o_totalprice FROM orders_v o
            |WHERE EXISTS (SELECT 1 FROM lineitem_v l
            |              WHERE l.l_orderkey = o.o_orderkey
            |                AND l.l_quantity > 45)
            |ORDER BY o_orderkey""".stripMargin)
  }

  /** Skew-salted two-phase aggregation registered as a graded query: the
    * (key, salt) pre-aggregation splits a hot key across reducers, the
    * second phase merges partials — result identical to the plain
    * group-by (l_quantity is whole-numbered, so the reassociated double
    * sum is exact), which is what the oracle checks. */
  val qSaltedAgg: Q = (s, d) =>
    graft.operators.Scale
      .saltedSumCount(Tables.lineitem(s, d), "l_returnflag", "l_quantity", 8)
      .orderBy("l_returnflag")

  /** Salted broadcast join (r7s): the skew-mitigation JOIN pattern as a
    * certified query — the big side gets a per-row salt, the 100-row
    * supplier dim is replicated ×8 and broadcast, and the join runs on
    * (key, salt) so one hot supplier's rows spread across 8 tasks
    * instead of one straggler. Semantics are provably identical to the
    * plain join: the oracle replays it unsalted. AQE's skew splitting
    * handles sort-merge skew at runtime; explicit salting is the tool
    * when the hot key is known and the build side broadcastable —
    * [[graft.operators.Scale.saltedBroadcastJoin]]. */
  val qSaltedJoin: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .select(col("l_suppkey").as("suppkey"), col("l_quantity"))
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    graft.operators.Scale.saltedBroadcastJoin(li, sup, "suppkey", 8)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("total_qty"))
      .orderBy("s_nationkey")
  }

  /** first_value / last_value over a full-partition frame: each order row
    * carries its customer's first and latest order price. last_value needs
    * the explicit unbounded-following frame (the default frame stops at
    * CURRENT ROW, silently returning the current row's value). */
  val qWindowFirstLast: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .withColumn("first_price", first("o_totalprice").over(w))
      .withColumn("last_price", last("o_totalprice").over(w))
      .select("o_custkey", "o_orderkey", "first_price", "last_price")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Conditional aggregation — count/sum restricted by a predicate inside
    * one grouped pass (the FILTER-clause idiom; count ignores the
    * when-otherwise null, sum takes an explicit 0 arm). */
  val qConditionalAgg: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("cnt"),
        count(when(col("o_orderstatus") === "F", 1)).as("cnt_f"),
        round(sum(when(col("o_totalprice") > 100000, col("o_totalprice"))
          .otherwise(0.0)), 2).as("big_total"))
      .orderBy("o_orderpriority")

  /** Null-safe equality join (`<=>`): null keys match each other, unlike
    * plain `=` which drops them. Nation 3 is nulled on both sides to
    * manufacture the null-key case; Spark still plans this as a hash join
    * (null-safe equality is a valid equi-join key). */
  val qNullSafeJoin: Q = (s, d) => {
    val c = Tables.customer(s, d)
      .select(nullif(col("c_nationkey"), lit(3)).as("ck"), col("c_custkey"))
    val su = Tables.supplier(s, d)
      .select(nullif(col("s_nationkey"), lit(3)).as("sk"), col("s_suppkey"))
    c.join(su, col("ck") <=> col("sk"))
      .groupBy(coalesce(col("ck"), lit(-1)).as("nation_key"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("nation_key")
  }

  val all: Map[String, Q] = Map(
    "q_from_json" -> qFromJson,
    "q_null_safe_join" -> qNullSafeJoin,
    "q_conditional_agg" -> qConditionalAgg,
    "q_window_first_last" -> qWindowFirstLast,
    "q_salted_agg" -> qSaltedAgg,
    "q_salted_join" -> qSaltedJoin,
    "q_melt" -> qMelt,
    "q_exists_correlated" -> qExistsCorrelated,
    "q_multi_join" -> qMultiJoin,
    "q_scalar_subquery" -> qScalarSubquery,
    "q_except_all" -> qExceptAll,
    "q_intersect_all" -> qIntersectAll,
    "q_array_agg" -> qArrayAgg,
    "q_null_funcs" -> qNullFuncs,
    "q_date_funcs" -> qDateFuncs,
    "q_window_range_frame" -> qWindowRangeFrame,
    "q_approx_percentile" -> qApproxPercentile,
    "q_sample_stratified" -> qSampleStratified,
    "q_sample_fixed_n" -> qSampleFixedN,
  )

  val oracles: Map[String, String] = Map(
    "q_sample_stratified" ->
      """SELECT lang, count(*) AS n_sampled FROM (
        | SELECT lang,
        |  ((((doc_id % 2147483648) * 2246822519) % 2147483648) * 100) // 2147483648
        |   AS bucket
        | FROM documents)
        |WHERE bucket < CASE lang WHEN 'en' THEN 25
        |                         WHEN 'es' THEN 80 WHEN 'fr' THEN 80
        |                         WHEN 'de' THEN 80 WHEN 'zh' THEN 80
        |                         ELSE 0 END
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_sample_fixed_n" ->
      """WITH h AS (
        | SELECT lang, doc_id,
        |  ((doc_id % 2147483648) * 2654435761) % 2147483648 AS hv
        | FROM documents),
        |r AS (
        | SELECT lang, doc_id,
        |  row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rk
        | FROM h)
        |SELECT lang, doc_id, rk FROM r WHERE rk <= 20
        |ORDER BY lang, rk""".stripMargin,
    "q_null_safe_join" ->
      """SELECT coalesce(nullif(c_nationkey, 3), -1) AS nation_key,
        | count(*) AS n_pairs
        |FROM customer c JOIN supplier s
        | ON nullif(c_nationkey, 3) IS NOT DISTINCT FROM nullif(s_nationkey, 3)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_conditional_agg" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        | count(*) FILTER (WHERE o_orderstatus = 'F') AS cnt_f,
        | round(sum(CASE WHEN o_totalprice > 100000 THEN o_totalprice
        |                ELSE 0.0 END), 2) AS big_total
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_window_first_last" ->
      """SELECT o_custkey, o_orderkey,
        | first_value(o_totalprice) OVER w AS first_price,
        | last_value(o_totalprice) OVER w AS last_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_salted_agg" ->
      """SELECT l_returnflag, sum(l_quantity) AS total,
        | count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_salted_join" ->
      """SELECT s_nationkey, count(*) AS n_items,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q_melt" ->
      """SELECT l_orderkey, l_linenumber, metric, val FROM (
        | UNPIVOT (SELECT l_orderkey, l_linenumber,
        |            CAST(l_quantity AS DOUBLE) AS l_quantity,
        |            CAST(l_discount AS DOUBLE) AS l_discount,
        |            CAST(l_tax AS DOUBLE) AS l_tax
        |          FROM lineitem)
        | ON l_quantity, l_discount, l_tax
        | INTO NAME metric VALUE val)
        |ORDER BY l_orderkey, l_linenumber, metric, val""".stripMargin,
    "q_exists_correlated" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin,
    "q_array_agg" ->
      """WITH a AS (
        | SELECT l_orderkey, list_sort(list(l_linenumber)) AS arr
        | FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey,
        | CAST(len(arr) AS INT) AS n_lines,
        | arr[1] AS first_ln,
        | arr[-1] AS last_ln,
        | list_contains(arr, 3) AS has3,
        | array_to_string(arr, ',') AS lines_csv
        |FROM a ORDER BY l_orderkey""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    "q_except_all" ->
      """SELECT l_suppkey, count(*) AS multiplicity FROM (
        | SELECT l_suppkey FROM lineitem WHERE l_quantity < 20
        | EXCEPT ALL
        | SELECT l_suppkey FROM lineitem WHERE l_quantity > 40)
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "q_intersect_all" ->
      """SELECT l_suppkey, count(*) AS multiplicity FROM (
        | SELECT l_suppkey FROM lineitem WHERE l_quantity < 20
        | INTERSECT ALL
        | SELECT l_suppkey FROM lineitem WHERE l_quantity > 40)
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "q_multi_join" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        | JOIN orders   ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation   ON s_nationkey = n_nationkey
        | JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        | AND o_orderdate >= TIMESTAMP '1995-01-01'
        | AND o_orderdate <  TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_from_json" ->
      """SELECT CAST(props->>'$.k' AS INT) AS k, count(*) AS cnt,
        | round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
        |   / 100.0 / count(*), 4) AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_null_funcs" ->
      """SELECT c_custkey,
        | nullif(c_mktsegment, 'BUILDING') AS seg_nb,
        | coalesce(nullif(c_mktsegment, 'BUILDING'), '<dropped>') AS seg_filled,
        | CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_pos_only
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INT) AS y,
        | CAST(month(o_orderdate) AS INT) AS m,
        | CAST(day(o_orderdate) AS INT) AS dom,
        | CAST(quarter(o_orderdate) AS INT) AS q,
        | CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        | date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
        | strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        | strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_window_range_frame" ->
      """SELECT o_custkey, o_orderkey, days_since,
        | count(*) OVER w AS cnt_7d,
        | round(sum(o_totalprice) OVER w, 2) AS sum_7d
        |FROM (SELECT *, date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since
        |      FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY days_since
        |             RANGE BETWEEN 7 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
  )
}
