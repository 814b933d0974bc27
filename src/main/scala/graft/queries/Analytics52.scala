package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 34: extreme-value bookkeeping — record highs against the
  * harmonic-number expectation (records in an i.i.d. series are a
  * parameter-free randomness test), and the mean-excess table at three
  * rank-selected thresholds (the POT/GPD diagnostic under every tail
  * model). All integers.
  */
object Analytics52 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Record highs in daily revenue: observed count of running-max
    * days vs the i.i.d. expectation H_n = Σ1/k, carried as the exact
    * integer Σ⌊10⁶/k⌋ over a sequence frame (floor receipts < n µ,
    * documented) — a distribution-free trend detector: records ≫ H_n
    * means the series drifts upward.
    *
    * 100 TB shape: one running-max window over |days|; the harmonic
    * sum explodes a sequence(1, n) — bounded by |days|. */
  val qRecordHighs: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    val rec = daily.withColumn("runmax", max("x").over(w))
      .agg(count(lit(1)).as("n"),
        sum((col("x") === col("runmax")).cast("long")).as("n_records"))
    rec.select(col("n"), col("n_records"),
        expr("""aggregate(sequence(1, CAST(n AS INT)), CAST(0 AS BIGINT),
                (a, k) -> a + 1000000 div k)""").as("expected_micro"))
      .withColumn("excess_records",
        expr("n_records * 1000000 - expected_micro"))
  }

  /** Mean-excess table at the p90/p95/p99 rank-selected thresholds of
    * daily revenue: for each u, the count above and the exact floor
    * mean of (x−u) — rising mean excess diagnoses a heavy (Pareto)
    * tail, flat means exponential, falling means bounded. Exact
    * integers; thresholds are data values.
    *
    * 100 TB shape: census + cumsum for the thresholds; one broadcast
    * pass for the three excess means. */
  val qMeanExcess: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
    val wv = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    val census = daily.groupBy("x").agg(count(lit(1)).as("cnt"))
      .withColumn("upto", sum("cnt").over(wv))
    val tot = daily.agg(count(lit(1)).as("n"))
    import s.implicits._
    val probes = broadcast(Seq((90L, 10L), (95L, 20L), (99L, 100L)).toDF("pct", "inv"))
    val thresholds = census.join(broadcast(tot)).crossJoin(probes)
      .filter(expr("upto * inv >= n * (inv - 1)"))
      .groupBy("pct").agg(min("x").as("u"))
    daily.crossJoin(broadcast(thresholds))
      .filter(col("x") > col("u"))
      .groupBy("pct", "u")
      .agg(count(lit(1)).as("n_exceed"),
        expr("sum(x - u) div count(1)").as("mean_excess_c"))
      .orderBy("pct")
  }

  val all: Map[String, Q] = Map(
    "q_record_highs" -> qRecordHighs,
    "q_mean_excess" -> qMeanExcess,
  )

  val oracles: Map[String, String] = Map(
    "q_record_highs" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        | FROM orders GROUP BY 1),
        |rm AS (
        | SELECT x, max(x) OVER (ORDER BY day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
        | FROM daily),
        |rec AS (
        | SELECT count(*) AS n,
        |  CAST(sum(CASE WHEN x = runmax THEN 1 ELSE 0 END) AS BIGINT) AS n_records
        | FROM rm),
        |harm AS (
        | SELECT CAST(sum(1000000 // k) AS BIGINT) AS expected_micro
        | FROM (SELECT row_number() OVER (ORDER BY day) AS k FROM daily) t)
        |SELECT CAST(n AS BIGINT) AS n, n_records, expected_micro,
        | n_records * 1000000 - expected_micro AS excess_records
        |FROM rec, harm""".stripMargin,
    "q_mean_excess" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        | FROM orders GROUP BY 1),
        |census AS (
        | SELECT x, count(*) AS cnt,
        |  sum(count(*)) OVER (ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS upto
        | FROM daily GROUP BY x),
        |tot AS (SELECT count(*) AS n FROM daily),
        |probes AS (SELECT * FROM (VALUES (90, 10), (95, 20), (99, 100))
        |  AS t(pct, inv)),
        |thr AS (
        | SELECT pct, min(x) AS u
        | FROM census, tot, probes
        | WHERE upto * inv >= n * (inv - 1)
        | GROUP BY pct)
        |SELECT CAST(pct AS BIGINT) AS pct, u, count(*) AS n_exceed,
        | CAST(sum(x - u) // count(*) AS BIGINT) AS mean_excess_c
        |FROM daily JOIN thr ON x > u
        |GROUP BY pct, u ORDER BY pct""".stripMargin,
  )
}
