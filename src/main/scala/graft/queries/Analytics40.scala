package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 22: credit-scoring bins, customer-value migration, and the
  * newsvendor fractile — risk/CRM/operations staples. WOE follows the
  * per-cell micro-nat discipline; everything else is exact integer
  * censuses and rank selection.
  */
object Analytics40 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Weight of Evidence / Information Value of price deciles against
    * the 'F' order status: per decile, WOEµ = round(ln((badᵢ/B)/
    * (goodᵢ/G))·10⁶) (one rounded ln per bin) and the IV contribution
    * (pb_ppm − pg_ppm)·WOEµ as an exact integer pico term — the
    * credit-scorer's feature-strength table. Deciles by ntile over
    * the deterministic (price, orderkey) order.
    *
    * 100 TB shape: one fact-wide ntile window (range-partitionable
    * external sort) + a 10-row census; at real scale the decile edges
    * come from the value census instead (q_percentile_disc pattern). */
  val qWoeIv: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("pc"),
        col("o_orderkey"),
        (col("o_orderstatus") === "F").cast("long").as("bad"))
    val w = Window.orderBy("pc", "o_orderkey")
    val binned = o.withColumn("bin", ntile(10).over(w).cast("long"))
    val cells = binned.groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("bad").as("bad_n"))
      .withColumn("good_n", col("n") - col("bad_n"))
    val tot = cells.agg(sum("bad_n").as("b_tot"), sum("good_n").as("g_tot"))
    cells.join(broadcast(tot))
      .select(col("bin"), col("n"), col("bad_n"), col("good_n"),
        expr("""CAST(round(ln((CAST(bad_n AS DOUBLE) / b_tot)
                / (CAST(good_n AS DOUBLE) / g_tot)) * 1000000) AS BIGINT)""")
          .as("woe_micro"),
        expr("""((bad_n * 1000000) div b_tot - (good_n * 1000000) div g_tot)
                * CAST(round(ln((CAST(bad_n AS DOUBLE) / b_tot)
                  / (CAST(good_n AS DOUBLE) / g_tot)) * 1000000) AS BIGINT)""")
          .as("iv_pico"))
      .orderBy("bin")
  }

  /** Customer revenue-decile migration 1995→1996: each customer's
    * within-year revenue decile (ntile over rev desc, custkey), the
    * 10×10 transition census over customers active both years, and
    * the stay rate per origin decile in exact ppm — the CRM value-
    * migration matrix.
    *
    * 100 TB shape: two year-partitioned aggs + ntile windows over
    * |customers|; the matrix census is ≤100 keys. */
  val qDecileMigration: Q = (s, d) => {
    val rev = Tables.orders(s, d)
      .filter(expr("year(CAST(o_orderdate AS DATE)) IN (1995, 1996)"))
      .groupBy(col("o_custkey").as("ck"),
        expr("year(CAST(o_orderdate AS DATE))").as("yr"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
    val w = Window.partitionBy("yr").orderBy(col("rev").desc, col("ck"))
    val dec = rev.withColumn("d", ntile(10).over(w).cast("long"))
    val m = dec.filter(col("yr") === 1995).select(col("ck"), col("d").as("d95"))
      .join(dec.filter(col("yr") === 1996).select(col("ck"), col("d").as("d96")), "ck")
    val cells = m.groupBy("d95", "d96").agg(count(lit(1)).as("n"))
    val rows = cells.groupBy("d95").agg(sum("n").as("row_n"))
    cells.join(rows, "d95")
      .select(col("d95"), col("d96"), col("n"),
        expr("(n * 1000000) div row_n").as("share_ppm"))
      .orderBy("d95", "d96")
  }

  /** Newsvendor order quantity at the literal critical fractile 0.8
    * (underage:overage = 4:1): Q* is the smallest daily-demand value
    * whose cumulative day count reaches ⌈0.8·n⌉ (exact rank selection
    * on the demand census), with the exact expected over/under unit
    * sums and the implied cost at (cᵤ, cₒ) = (4, 1).
    *
    * 100 TB shape: fact → |days| demand frame → census + one cumsum
    * window; the over/under sums are one broadcast-Q* pass over the
    * census. */
  val qNewsvendor: Q = (s, d) => {
    val daily = Tables.lineitem(s, d)
      .groupBy(expr("CAST(l_shipdate AS DATE)").as("day"))
      .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("dem"))
    val census = daily.groupBy("dem").agg(count(lit(1)).as("cnt"))
    val wv = Window.orderBy("dem").rowsBetween(Window.unboundedPreceding, 0)
    val tot = daily.agg(count(lit(1)).as("n_days"))
    val qStar = census.withColumn("upto", sum("cnt").over(wv))
      .join(broadcast(tot))
      .filter(expr("upto * 5 >= n_days * 4"))
      .agg(min("dem").as("q_star"))
    census.join(broadcast(qStar)).join(broadcast(tot))
      .agg(max("n_days").as("n_days"), max("q_star").as("q_star"),
        sum(expr("CASE WHEN dem < q_star THEN (q_star - dem) * cnt ELSE 0 END"))
          .as("over_units"),
        sum(expr("CASE WHEN dem > q_star THEN (dem - q_star) * cnt ELSE 0 END"))
          .as("under_units"))
      .withColumn("cost_units", expr("4 * under_units + 1 * over_units"))
  }

  val all: Map[String, Q] = Map(
    "q_woe_iv" -> qWoeIv,
    "q_decile_migration" -> qDecileMigration,
    "q_newsvendor" -> qNewsvendor,
  )

  val oracles: Map[String, String] = Map(
    "q_woe_iv" ->
      """WITH o AS (
        | SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS pc, o_orderkey,
        |   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
        | FROM orders),
        |binned AS (
        | SELECT bad, CAST(ntile(10) OVER (ORDER BY pc, o_orderkey) AS BIGINT)
        |   AS bin
        | FROM o),
        |cells AS (
        | SELECT bin, count(*) AS n, CAST(sum(bad) AS BIGINT) AS bad_n,
        |   count(*) - CAST(sum(bad) AS BIGINT) AS good_n
        | FROM binned GROUP BY bin),
        |tot AS (
        | SELECT CAST(sum(bad_n) AS BIGINT) AS b_tot,
        |   CAST(sum(good_n) AS BIGINT) AS g_tot FROM cells)
        |SELECT bin, n, bad_n, good_n,
        | CAST(round(ln((CAST(bad_n AS DOUBLE) / b_tot)
        |   / (CAST(good_n AS DOUBLE) / g_tot)) * 1000000) AS BIGINT) AS woe_micro,
        | ((bad_n * 1000000) // b_tot - (good_n * 1000000) // g_tot)
        |   * CAST(round(ln((CAST(bad_n AS DOUBLE) / b_tot)
        |     / (CAST(good_n AS DOUBLE) / g_tot)) * 1000000) AS BIGINT) AS iv_pico
        |FROM cells, tot ORDER BY bin""".stripMargin,
    "q_decile_migration" ->
      """WITH rev AS (
        | SELECT o_custkey AS ck, year(CAST(o_orderdate AS DATE)) AS yr,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        | FROM orders WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)
        | GROUP BY 1, 2),
        |dec AS (
        | SELECT ck, yr,
        |   CAST(ntile(10) OVER (PARTITION BY yr ORDER BY rev DESC, ck) AS BIGINT)
        |     AS d
        | FROM rev),
        |m AS (
        | SELECT a.ck, a.d AS d95, b.d AS d96
        | FROM (SELECT * FROM dec WHERE yr = 1995) a
        | JOIN (SELECT * FROM dec WHERE yr = 1996) b USING (ck)),
        |cells AS (SELECT d95, d96, count(*) AS n FROM m GROUP BY 1, 2),
        |rows_ AS (SELECT d95, CAST(sum(n) AS BIGINT) AS row_n FROM cells GROUP BY 1)
        |SELECT d95, d96, n, (n * 1000000) // row_n AS share_ppm
        |FROM cells JOIN rows_ USING (d95)
        |ORDER BY d95, d96""".stripMargin,
    "q_newsvendor" ->
      """WITH daily AS (
        | SELECT CAST(l_shipdate AS DATE) AS day,
        |   CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS dem
        | FROM lineitem GROUP BY 1),
        |census AS (SELECT dem, count(*) AS cnt FROM daily GROUP BY dem),
        |tot AS (SELECT count(*) AS n_days FROM daily),
        |qs AS (
        | SELECT min(dem) AS q_star
        | FROM (SELECT dem,
        |    sum(cnt) OVER (ORDER BY dem ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS upto
        |   FROM census) c, tot
        | WHERE upto * 5 >= n_days * 4)
        |SELECT any_value(n_days) AS n_days, any_value(q_star) AS q_star,
        | CAST(sum(CASE WHEN dem < q_star THEN (q_star - dem) * cnt ELSE 0 END)
        |   AS BIGINT) AS over_units,
        | CAST(sum(CASE WHEN dem > q_star THEN (dem - q_star) * cnt ELSE 0 END)
        |   AS BIGINT) AS under_units,
        | CAST(4 * sum(CASE WHEN dem > q_star THEN (dem - q_star) * cnt ELSE 0 END)
        |   + 1 * sum(CASE WHEN dem < q_star THEN (q_star - dem) * cnt ELSE 0 END)
        |   AS BIGINT) AS cost_units
        |FROM census, qs, tot""".stripMargin,
  )
}
