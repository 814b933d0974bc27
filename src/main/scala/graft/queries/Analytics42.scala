package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 24: retrieval/finance/product metrics — mean reciprocal
  * rank, drawdown episode segmentation, repeat-purchase intervals, and
  * price-ending digit preference. Exact integer censuses and rank
  * selection throughout; reciprocal ranks floor once to micro units.
  */
object Analytics42 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Mean reciprocal rank of the "balance finds a heavy orderer"
    * retrieval task (the q_ndcg / q_roc_curve family): per segment,
    * the rank of the FIRST customer with ≥8 orders in the
    * balance-descending list, rr = ⌊10⁶/rank⌋, and the 5-segment MRR
    * as an exact integer mean.
    *
    * 100 TB shape: the rank window partitions by segment;
    * WindowGroupLimit-style early stop applies once the first
    * relevant row per segment is found (min-agg over relevant only). */
  val qMrr: Q = (s, d) => {
    val cnts = Tables.orders(s, d).groupBy("o_custkey").agg(count(lit(1)).as("n_o"))
    val ranked = Tables.customer(s, d)
      .join(cnts, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_mktsegment").as("seg"), col("c_custkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bc"),
        (coalesce(col("n_o"), lit(0L)) >= 8).as("rel"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("seg").orderBy(col("bc").desc, col("c_custkey"))))
    val firsts = ranked.filter(col("rel"))
      .groupBy("seg").agg(min("rk").as("first_rank"))
      .withColumn("rr_micro", expr("1000000 div first_rank"))
    val mrr = firsts.agg(expr("sum(rr_micro) div count(1)").as("mrr_micro"))
    firsts.join(broadcast(mrr))
      .select(col("seg"), col("first_rank").cast("long").as("first_rank"),
        col("rr_micro"), col("mrr_micro"))
      .orderBy("seg")
  }

  /** Drawdown episode segmentation of daily revenue: an episode opens
    * when the series drops below its running max and closes at the
    * next new peak; per episode the trough (earliest deepest day),
    * depth in cents, and length in days. Top 5 by depth. The
    * episode-id is the running count of new-peak days — one cumsum
    * window, no self-joins.
    *
    * 100 TB shape: |days| frame, two windows, ≤|days| episode groups. */
  val qDrawdownEpisodes: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
    val wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    val marked = daily
      .withColumn("runmax", max("x").over(wd))
      .withColumn("is_peak", (col("x") === col("runmax")).cast("long"))
      .withColumn("epi", sum("is_peak").over(wd))
    marked.filter(col("x") < col("runmax"))
      .groupBy("epi")
      .agg(count(lit(1)).as("days_under"),
        max("runmax").as("peak_c"),
        max(expr("runmax - x")).as("depth_c"))
      .orderBy(col("depth_c").desc, col("epi"))
      .limit(5)
  }

  /** Repeat-purchase interval distribution: per-user gaps between
    * consecutive purchases (event-time order, id tiebreak) in whole
    * minutes, then the exact lower median / p90 by rank selection
    * plus the floor mean — the product-frequency readout behind
    * replenishment and churn models.
    *
    * 100 TB shape: one per-user lag window over the purchase subset;
    * order statistics from the gap census. */
  val qRepurchaseInterval: Q = (s, d) => {
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
    val wu = Window.partitionBy("user_id").orderBy("us", "event_id")
    val gaps = p.withColumn("prev", lag("us", 1).over(wu))
      .filter(col("prev").isNotNull)
      .select(expr("(us - prev) div 60000000").as("gap_min"))
    val census = gaps.groupBy("gap_min").agg(count(lit(1)).as("cnt"))
    val wv = Window.orderBy("gap_min").rowsBetween(Window.unboundedPreceding, 0)
    val tot = gaps.agg(count(lit(1)).as("n"), sum("gap_min").as("s"))
    census.withColumn("upto", sum("cnt").over(wv))
      .join(broadcast(tot))
      .agg(max("n").as("n_gaps"),
        min(expr("CASE WHEN upto * 2 >= n + 1 THEN gap_min END")).as("median_min"),
        min(expr("CASE WHEN upto * 10 >= n * 9 THEN gap_min END")).as("p90_min"),
        max(expr("s div n")).as("mean_min"))
  }

  /** Price-ending digit preference: the census of cents mod 100 with
    * the top-10 endings in exact ppm and the χ²-vs-uniform numerator
    * (100·Σo² − N²)·10⁶ div N² as an exact integer — Benford's
    * trailing-digit cousin, the psychological-pricing detector.
    *
    * 100 TB shape: one 100-key census; everything after is bounded. */
  val qPriceEndings: Q = (s, d) => {
    val census = Tables.orders(s, d)
      .groupBy(expr("CAST(round(o_totalprice * 100) AS BIGINT) % 100").as("ending"))
      .agg(count(lit(1)).as("cnt"))
    val tot = census.agg(sum("cnt").as("n"), count(lit(1)).as("k"),
      sum(expr("CAST(cnt AS DECIMAL(38,0)) * cnt")).as("so2"))
    census.join(broadcast(tot))
      .select(col("ending"), col("cnt"),
        expr("(cnt * 1000000) div n").as("ppm"),
        expr("""CAST(((CAST(100 AS DECIMAL(38,0)) * so2 - CAST(n AS DECIMAL(38,0)) * n)
                * 1000000) div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)""")
          .as("chi2_uniform_scaled_micro"))
      .orderBy(col("cnt").desc, col("ending"))
      .limit(10)
  }

  val all: Map[String, Q] = Map(
    "q_mrr" -> qMrr,
    "q_drawdown_episodes" -> qDrawdownEpisodes,
    "q_repurchase_interval" -> qRepurchaseInterval,
    "q_price_endings" -> qPriceEndings,
  )

  val oracles: Map[String, String] = Map(
    "q_mrr" ->
      """WITH cnts AS (SELECT o_custkey, count(*) AS n_o FROM orders GROUP BY 1),
        |ranked AS (
        | SELECT c_mktsegment AS seg, c_custkey,
        |   coalesce(n_o, 0) >= 8 AS rel,
        |   row_number() OVER (PARTITION BY c_mktsegment
        |     ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC, c_custkey)
        |     AS rk
        | FROM customer LEFT JOIN cnts ON c_custkey = o_custkey),
        |firsts AS (
        | SELECT seg, min(rk) AS first_rank,
        |   1000000 // min(rk) AS rr_micro
        | FROM ranked WHERE rel GROUP BY seg),
        |m AS (SELECT sum(rr_micro) // count(*) AS mrr_micro FROM firsts)
        |SELECT seg, CAST(first_rank AS BIGINT) AS first_rank,
        | CAST(rr_micro AS BIGINT) AS rr_micro, CAST(mrr_micro AS BIGINT) AS mrr_micro
        |FROM firsts, m ORDER BY seg""".stripMargin,
    "q_drawdown_episodes" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        | FROM orders GROUP BY 1),
        |rm AS (
        | SELECT day, x,
        |  max(x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS runmax
        | FROM daily),
        |marked AS (
        | SELECT day, x, runmax,
        |  sum(CASE WHEN x = runmax THEN 1 ELSE 0 END)
        |    OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS epi
        | FROM rm)
        |SELECT CAST(epi AS BIGINT) AS epi, count(*) AS days_under,
        | CAST(max(runmax) AS BIGINT) AS peak_c,
        | CAST(max(runmax - x) AS BIGINT) AS depth_c
        |FROM marked WHERE x < runmax
        |GROUP BY epi ORDER BY depth_c DESC, epi LIMIT 5""".stripMargin,
    "q_repurchase_interval" ->
      """WITH p AS (
        | SELECT user_id, epoch_us(ts) AS us, event_id
        | FROM events WHERE event_type = 'purchase'),
        |gaps AS (
        | SELECT (us - prev) // 60000000 AS gap_min
        | FROM (SELECT us, lag(us) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id) AS prev FROM p) t
        | WHERE prev IS NOT NULL),
        |census AS (SELECT gap_min, count(*) AS cnt FROM gaps GROUP BY 1),
        |tot AS (SELECT count(*) AS n, CAST(sum(gap_min) AS BIGINT) AS s FROM gaps),
        |cum AS (
        | SELECT gap_min,
        |  sum(cnt) OVER (ORDER BY gap_min ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS upto
        | FROM census)
        |SELECT any_value(n) AS n_gaps,
        | min(CASE WHEN upto * 2 >= n + 1 THEN gap_min END) AS median_min,
        | min(CASE WHEN upto * 10 >= n * 9 THEN gap_min END) AS p90_min,
        | any_value(s // n) AS mean_min
        |FROM cum, tot""".stripMargin,
    "q_price_endings" ->
      """WITH census AS (
        | SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 100 AS ending,
        |   count(*) AS cnt
        | FROM orders GROUP BY 1),
        |tot AS (
        | SELECT CAST(sum(cnt) AS HUGEINT) AS n, count(*) AS k,
        |   CAST(sum(CAST(cnt AS HUGEINT) * cnt) AS HUGEINT) AS so2
        | FROM census)
        |SELECT ending, CAST(cnt AS BIGINT) AS cnt,
        | CAST((cnt * 1000000) // n AS BIGINT) AS ppm,
        | CAST(((100 * so2 - n * n) * 1000000) // (n * n) AS BIGINT)
        |   AS chi2_uniform_scaled_micro
        |FROM census, tot ORDER BY cnt DESC, ending LIMIT 10""".stripMargin,
  )
}
