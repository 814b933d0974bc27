package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r8 tail batch 2 — OLAP-window and distribution-readout completion:
  * discrete (datum) percentiles, share-of-total reporting, fixed-probe
  * ECDF, and the grouped top-k row selector whose physical plan is the
  * WindowGroupLimit rank-pushdown.
  *
  * Every output is either a datum read straight from the source
  * (bit-identical across engines by construction) or integer
  * arithmetic (counts, cents, floor-divided ppm shares) — nothing in
  * this batch touches a float rounding boundary at any scale.
  */
object Analytics15 {
  type Q = (SparkSession, String) => DataFrame

  /** Discrete percentiles of the price column per return flag: the
    * datum at rank max(1, ⌈p·n⌉) — DuckDB's `quantile_disc` rule —
    * via [[graft.operators.Percentiles.groupedQuantilesDisc]], the
    * spillable sort path (NOT Spark's ObjectHashAggregate `percentile`,
    * which buffers whole groups in memory). Complements q_percentiles
    * (interpolated) and q_weighted_median (weighted datum): a datum
    * never needs rounding discipline — the bytes come from parquet. */
  val qPercentileDisc: Q = (s, d) =>
    graft.operators.Percentiles.groupedQuantilesDisc(
      Tables.lineitem(s, d), "l_returnflag", "l_extendedprice",
      Seq(0.25 -> "p25_price", 0.5 -> "p50_price", 0.75 -> "p75_price"))
      .orderBy("l_returnflag")

  /** Share-of-total report (Oracle's RATIO_TO_REPORT): each nation's
    * revenue as an integer-ppm share of its region's total. The
    * fact-sized work is ONE partial-agg'd groupBy to |nations| rows;
    * the share window runs over that 25-row aggregate (the
    * boundary-window pattern — never a window over the fact). Integer
    * cents → floor-div ppm: exact in both engines (operands positive,
    * so Spark `div` ≡ DuckDB `//`). The ×10⁶ product is taken in
    * DECIMAL(38,0), not int64: a region's revenue-in-cents overflows
    * the int64 product past ~$92B, which TPC-H reaches around sf≈2 —
    * and Spark (non-ANSI) would wrap silently while DuckDB raises,
    * the exact divergence class [[Analytics12.qGridRadiusJoin]]
    * eliminated. Decimal keeps the product exact to 10³⁸; the oracle
    * widens to HUGEINT, not DECIMAL — DuckDB routes DECIMAL division
    * through DOUBLE, which rounds at the floor boundary (measured:
    * 177602 vs 177603 at sf0.01), while HUGEINT `//` is exact. */
  val qRatioToReport: Q = (s, d) => {
    val rev = Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .as("revenue_c"))
    val w = Window.partitionBy("r_name")
    rev.withColumn("region_total_c", sum("revenue_c").over(w))
      .withColumn("share_ppm",
        expr("CAST((CAST(revenue_c AS DECIMAL(38,0)) * 1000000)" +
          " div region_total_c AS BIGINT)"))
      .orderBy("r_name", "n_name")
  }

  /** Fixed-probe empirical CDF: per return flag, what fraction of
    * rows (integer ppm) have quantity ≤ each probe threshold — the
    * inverse readout of q_percentiles (value→fraction instead of
    * fraction→value), the distribution fingerprint monitoring
    * compares across data drops. ONE pass: all probes are conditional
    * partial-aggregable sums, unpivoted AFTER aggregation via stack —
    * the fact is never exploded |probes|×. */
  val qEcdf: Q = (s, d) => {
    val probes = Seq(10, 20, 30, 40, 50)
    val conds = probes.map(p =>
      sum(when(col("l_quantity") <= p, 1L).otherwise(0L)).as(s"le_$p"))
    val agg = Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), conds: _*)
    val stacked = probes.map(p => s"$p, le_$p").mkString(", ")
    agg.select(col("l_returnflag"), col("n"),
        expr(s"stack(${probes.size}, $stacked) AS (probe, n_le)"))
      .select(col("l_returnflag"), col("n"), col("probe"), col("n_le"),
        expr("(n_le * 1000000) div n").as("cdf_ppm"))
      .orderBy("l_returnflag", "probe")
  }

  /** Grouped top-k ROW selector: the 3 highest-value orders per
    * priority class, ties broken by key — the "show me the rows"
    * operator behind every leaderboard export (q_topk_* return
    * aggregates; this returns source rows). The row_number-then-filter
    * form is exactly what Spark 4 plans as WindowGroupLimit: a
    * per-map-partition top-k BEFORE the exchange, so a 100 TB fact
    * ships ≤ k·|maptasks| rows into the window sort instead of
    * everything — the spec pins that operator's presence. */
  val qGroupTopk: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority").as("priority"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("total_c"))
    val w = Window.partitionBy("priority")
      .orderBy(col("total_c").desc, col("o_orderkey").asc)
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("priority", "rn")
  }

  val all: Map[String, Q] = Map(
    "q_percentile_disc" -> qPercentileDisc,
    "q_ratio_to_report" -> qRatioToReport,
    "q_ecdf" -> qEcdf,
    "q_group_topk" -> qGroupTopk,
  )

  val oracles: Map[String, String] = Map(
    "q_percentile_disc" ->
      """SELECT l_returnflag,
        | quantile_disc(l_extendedprice, 0.25) AS p25_price,
        | quantile_disc(l_extendedprice, 0.5) AS p50_price,
        | quantile_disc(l_extendedprice, 0.75) AS p75_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_ratio_to_report" ->
      """WITH rev AS (
        | SELECT r.r_name, n.n_name,
        |  CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_c
        | FROM orders o
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        | JOIN region r ON n.n_regionkey = r.r_regionkey
        | GROUP BY r.r_name, n.n_name)
        |SELECT r_name, n_name, revenue_c,
        | CAST(sum(revenue_c) OVER (PARTITION BY r_name) AS BIGINT)
        |   AS region_total_c,
        | CAST((CAST(revenue_c AS HUGEINT) * 1000000)
        |   // sum(revenue_c) OVER (PARTITION BY r_name) AS BIGINT)
        |   AS share_ppm
        |FROM rev ORDER BY r_name, n_name""".stripMargin,
    "q_ecdf" ->
      """WITH probes AS (SELECT unnest([10, 20, 30, 40, 50]) AS probe),
        |n AS (SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1)
        |SELECT li.l_returnflag, n.n, p.probe,
        | CAST(sum(CASE WHEN li.l_quantity <= p.probe THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_le,
        | CAST((sum(CASE WHEN li.l_quantity <= p.probe THEN 1 ELSE 0 END)
        |   * 1000000) // n.n AS BIGINT) AS cdf_ppm
        |FROM lineitem li CROSS JOIN probes p
        |JOIN n ON li.l_returnflag = n.l_returnflag
        |GROUP BY li.l_returnflag, n.n, p.probe
        |ORDER BY li.l_returnflag, p.probe""".stripMargin,
    "q_group_topk" ->
      """SELECT o_orderkey, o_orderpriority AS priority,
        | CAST(round(o_totalprice * 100) AS BIGINT) AS total_c,
        | CAST(rn AS BIGINT) AS rn
        |FROM (
        | SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  row_number() OVER (
        |    PARTITION BY o_orderpriority
        |    ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
        |             o_orderkey ASC) AS rn
        | FROM orders)
        |WHERE rn <= 3 ORDER BY priority, rn""".stripMargin,
  )
}
