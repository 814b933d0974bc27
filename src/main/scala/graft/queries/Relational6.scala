package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** r7h — the two classic TPC-H ad-hoc shapes most often quoted as
  * engine acceptance tests, run through the SQL surface
  * (`spark.sql` over temp views, not the DataFrame API — exercising the
  * parser/analyzer path the reference's `spark.sql` usage implies), with
  * revenue in exact integer 10⁻⁴-dollar units so both engines agree
  * bit-for-bit.
  */
object Relational6 {
  type Q = (SparkSession, String) => DataFrame

  private def withViews(s: SparkSession, d: String): Unit = {
    Tables.customer(s, d).createOrReplaceTempView("v_customer")
    Tables.orders(s, d).createOrReplaceTempView("v_orders")
    Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
    Tables.supplier(s, d).createOrReplaceTempView("v_supplier")
    Tables.nation(s, d).createOrReplaceTempView("v_nation")
    Tables.region(s, d).createOrReplaceTempView("v_region")
  }

  /** TPC-H Q3 (shipping-priority, minus the column the testdata lacks):
    * top-10 unshipped BUILDING orders by discounted revenue as of the
    * cutoff. Revenue term = cents × (100 − discount %) — exact BIGINT.
    *
    * Plan: two broadcast-joined dims around the fact scan (customer and
    * orders both prune + filter before the join), one partial-agg'd
    * groupBy, TakeOrderedAndProject for the top-10 — the fact table is
    * the only input-sized participant. */
  val qTpchQ3: Q = (s, d) => {
    withViews(s, d)
    s.sql(
      """SELECT l_orderkey,
        |  date_format(o_orderdate, 'yyyy-MM-dd') AS o_date,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS revenue_u
        |FROM v_customer JOIN v_orders ON c_custkey = o_custkey
        |JOIN v_lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |  AND CAST(l_shipdate AS DATE) > DATE '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue_u DESC, l_orderkey
        |LIMIT 10""".stripMargin)
  }

  /** TPC-H Q1 in full (pricing summary report): all eight aggregates —
    * q1_agg covers the minimal shape; this is the complete report with
    * discounted and taxed extensions, averages, and counts. Money terms
    * in integer cents × integer percent units (exact BIGINT sums);
    * averages divide the exact sums at report time (round 4).
    *
    * Plan: one partial-agg'd groupBy over the filtered fact — the
    * canonical map-side-combine aggregation. */
  val qTpchQ1: Q = (s, d) => {
    withViews(s, d)
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_base_c,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS sum_disc_u,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      (100 - CAST(round(l_discount * 100) AS BIGINT)) *
        |      (100 + CAST(round(l_tax * 100) AS BIGINT))) AS sum_charge_u2,
        |  round(sum(CAST(l_quantity AS BIGINT)) / CAST(count(*) AS DOUBLE), 4) AS avg_qty,
        |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) /
        |        (CAST(count(*) AS DOUBLE) * 100.0), 4) AS avg_price,
        |  round(sum(CAST(round(l_discount * 100) AS BIGINT)) /
        |        (CAST(count(*) AS DOUBLE) * 100.0), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM v_lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '2001-06-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** TPC-H Q18 (large-volume customers): orders whose total quantity
    * exceeds 250, with customer and order context. The HAVING subquery
    * aggregates the fact ONCE; the outer join-back is an equality join
    * on the (rare) qualifying keys.
    *
    * Plan: fact aggregated to per-order quantity (partial agg), the
    * ~1% surviving keys broadcast back against orders/customer dims —
    * no second fact-wide shuffle. */
  val qTpchQ18: Q = (s, d) => {
    withViews(s, d)
    s.sql(
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM v_lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
        |SELECT c_custkey, c_name, o_orderkey,
        |  date_format(o_orderdate, 'yyyy-MM-dd') AS o_date,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS total_c,
        |  sum_qty
        |FROM big JOIN v_orders ON o_orderkey = l_orderkey
        |JOIN v_customer ON c_custkey = o_custkey
        |ORDER BY total_c DESC, o_orderkey""".stripMargin)
  }

  /** TPC-H Q5 (local-supplier volume): revenue by nation for one region
    * and one order year, counting only lineitems whose supplier sits in
    * the CUSTOMER's nation. Revenue term = cents × (100 − discount %) —
    * exact BIGINT, as everywhere on this surface.
    *
    * Plan: customer/supplier/nation/region are all broadcast dims (the
    * biggest, customer, is ~1.5% of the fact); the only fact-sized
    * exchange is the orders⋈lineitem equi-join, and AQE usually folds
    * the filtered orders side to a broadcast too. The co-nation
    * condition rides the supplier broadcast as a post-join filter —
    * never a second fact shuffle. */
  val qTpchQ5: Q = (s, d) => {
    withViews(s, d)
    s.sql(
      """SELECT n_name,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS revenue_u
        |FROM v_customer JOIN v_orders ON c_custkey = o_custkey
        |JOIN v_lineitem ON l_orderkey = o_orderkey
        |JOIN v_supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN v_nation ON s_nationkey = n_nationkey
        |JOIN v_region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue_u DESC, n_name""".stripMargin)
  }

  /** TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    * lost to returns in one quarter, with nation context.
    *
    * Plan: the R-flagged lineitem slice joins date-filtered orders
    * (both filters reach their scans), customer + nation broadcast, one
    * partial-agg'd groupBy on the customer key, TakeOrderedAndProject
    * for the top-20. */
  val qTpchQ10: Q = (s, d) => {
    withViews(s, d)
    s.sql(
      """SELECT c_custkey, c_name, n_name,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS revenue_u
        |FROM v_customer JOIN v_orders ON c_custkey = o_custkey
        |JOIN v_lineitem ON l_orderkey = o_orderkey
        |JOIN v_nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
        |GROUP BY c_custkey, c_name, n_name, c_acctbal
        |ORDER BY revenue_u DESC, c_custkey
        |LIMIT 20""".stripMargin)
  }

  val all: Map[String, Q] = Map(
    "q_tpch_q1" -> qTpchQ1,
    "q_tpch_q3" -> qTpchQ3,
    "q_tpch_q5" -> qTpchQ5,
    "q_tpch_q10" -> qTpchQ10,
    "q_tpch_q18" -> qTpchQ18,
  )

  val oracles: Map[String, String] = Map(
    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |     (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_u,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |     (100 - CAST(round(l_discount * 100) AS BIGINT)) *
        |     (100 + CAST(round(l_tax * 100) AS BIGINT))) AS BIGINT) AS sum_charge_u2,
        | round(CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) /
        |       CAST(count(*) AS DOUBLE), 4) AS avg_qty,
        | round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) /
        |       (CAST(count(*) AS DOUBLE) * 100.0), 4) AS avg_price,
        | round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) /
        |       (CAST(count(*) AS DOUBLE) * 100.0), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '2001-06-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_tpch_q3" ->
      """SELECT l_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |     (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_u
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |  AND CAST(l_shipdate AS DATE) > DATE '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue_u DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q_tpch_q5" ->
      """SELECT n_name,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |     (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_u
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue_u DESC, n_name""".stripMargin,
    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        | CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |     (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_u
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
        |GROUP BY c_custkey, c_name, n_name, c_acctbal
        |ORDER BY revenue_u DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q_tpch_q18" ->
      """WITH big AS (
        | SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        | FROM lineitem GROUP BY l_orderkey
        | HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
        |SELECT c_custkey, c_name, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        | CAST(round(o_totalprice * 100) AS BIGINT) AS total_c,
        | sum_qty
        |FROM big JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY total_c DESC, o_orderkey""".stripMargin,
  )
}
