package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 31: clustering without floats — three unrolled Lloyd
  * iterations of 1-D 2-means where centers stay EXACT RATIONALS
  * (sum, count) and assignments compare cross-multiplied integers, and
  * the shorth (shortest half-sample interval + its exact mean), the
  * robust mode estimator.
  */
object Analytics49 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** 1-D 2-means on daily revenue, 3 Lloyd iterations, ZERO floats:
    * centers are carried as rationals (Σ, n) and the assignment
    * "2x ≤ c₁+c₂" evaluates as 2x·n₁·n₂ ≤ s₁·n₂ + s₂·n₁ in exact
    * DECIMAL — so the oracle replays every iteration bit-free.
    * Seeds are the rank-selected p25/p75. Outputs cluster sizes and
    * floor-div centers after round 3.
    *
    * 100 TB shape: each iteration is one partial-agg'd pass over the
    * |days| census with the 1-row center rationals broadcast — the
    * k-means shape with driver-free state. */
  val qLloyd1d: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
    val census = daily.groupBy("x").agg(count(lit(1)).as("cnt"))
      .coalesce(1).localCheckpoint()
    val wr = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    val n1f = daily.agg(count(lit(1)).as("n"))
    val seeds = census.withColumn("upto", sum("cnt").over(wr))
      .join(broadcast(n1f))
      .agg(
        min(expr("CASE WHEN upto * 4 >= n THEN x END")).as("c1x"),
        min(expr("CASE WHEN upto * 4 >= 3 * n THEN x END")).as("c2x"))
      .select(col("c1x").cast("decimal(38,0)").as("s1"),
        lit(1L).cast("decimal(38,0)").as("n1"),
        col("c2x").cast("decimal(38,0)").as("s2"),
        lit(1L).cast("decimal(38,0)").as("n2"))
    def step(centers: org.apache.spark.sql.DataFrame) =
      census.join(broadcast(centers))
        .withColumn("to1", expr(
          "CAST(2 AS DECIMAL(38,0)) * x * n1 * n2 <= s1 * n2 + s2 * n1"))
        .agg(
          sum(expr("CASE WHEN to1 THEN CAST(x AS DECIMAL(38,0)) * cnt ELSE 0 END")).as("s1"),
          sum(expr("CASE WHEN to1 THEN CAST(cnt AS DECIMAL(38,0)) ELSE 0 END")).as("n1"),
          sum(expr("CASE WHEN NOT to1 THEN CAST(x AS DECIMAL(38,0)) * cnt ELSE 0 END")).as("s2"),
          sum(expr("CASE WHEN NOT to1 THEN CAST(cnt AS DECIMAL(38,0)) ELSE 0 END")).as("n2"))
    val fin = step(step(step(seeds)))
    fin.select(
      expr("CAST(n1 AS BIGINT)").as("n_lo"),
      expr("CAST(n2 AS BIGINT)").as("n_hi"),
      expr("CAST(s1 div n1 AS BIGINT)").as("center_lo_c"),
      expr("CAST(s2 div n2 AS BIGINT)").as("center_hi_c"))
  }

  /** The shorth: the shortest interval containing ⌈n/2⌉+… (h = n div 2
    * + 1) of the daily revenue values, and its exact floor mean — the
    * classic robust mode/location estimator (Andrews 1972). One rank
    * frame, one offset self-join on rank+h−1, prefix-sum means; ties
    * break on the earliest start.
    *
    * 100 TB shape: |days| rank + prefix windows, one equi-join on the
    * offset rank. */
  val qShorth: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
    val w = Window.orderBy("x", "day")
    val ranked = daily
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("pre", sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val n1f = daily.agg(count(lit(1)).as("n"))
      .withColumn("h", expr("n div 2 + 1"))
    val lo = ranked.select(col("rn"), col("x").as("x_lo"),
      (col("pre") - col("x")).as("pre_lo"))
    val hi = ranked.select(col("rn").as("rn2"), col("x").as("x_hi"),
      col("pre").as("pre_hi"))
    lo.join(broadcast(n1f))
      .join(hi, expr("rn2 = rn + h - 1"))
      .withColumn("width", col("x_hi") - col("x_lo"))
      .orderBy(col("width").asc, col("rn").asc)
      .limit(1)
      .select(col("n"), col("h"), col("x_lo").as("lo_c"), col("x_hi").as("hi_c"),
        col("width").as("width_c"),
        expr("CAST((pre_hi - pre_lo) div h AS BIGINT)").as("shorth_mean_c"))
  }

  val all: Map[String, Q] = Map(
    "q_lloyd_1d" -> qLloyd1d,
    "q_shorth" -> qShorth,
  )

  val oracles: Map[String, String] = Map(
    "q_lloyd_1d" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        | FROM orders GROUP BY 1),
        |census AS (SELECT x, count(*) AS cnt FROM daily GROUP BY x),
        |n_ AS (SELECT count(*) AS n FROM daily),
        |cum AS (
        | SELECT x, cnt, sum(cnt) OVER (ORDER BY x
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS upto
        | FROM census),
        |seeds AS (
        | SELECT CAST(min(CASE WHEN upto * 4 >= n THEN x END) AS HUGEINT) AS s1,
        |   CAST(1 AS HUGEINT) AS n1,
        |   CAST(min(CASE WHEN upto * 4 >= 3 * n THEN x END) AS HUGEINT) AS s2,
        |   CAST(1 AS HUGEINT) AS n2
        | FROM cum, n_),
        |i1 AS (
        | SELECT
        |  CAST(sum(CASE WHEN 2 * CAST(x AS HUGEINT) * n1 * n2 <= s1 * n2 + s2 * n1
        |    THEN CAST(x AS HUGEINT) * cnt ELSE 0 END) AS HUGEINT) AS s1,
        |  CAST(sum(CASE WHEN 2 * CAST(x AS HUGEINT) * n1 * n2 <= s1 * n2 + s2 * n1
        |    THEN cnt ELSE 0 END) AS HUGEINT) AS n1,
        |  CAST(sum(CASE WHEN NOT (2 * CAST(x AS HUGEINT) * n1 * n2 <= s1 * n2 + s2 * n1)
        |    THEN CAST(x AS HUGEINT) * cnt ELSE 0 END) AS HUGEINT) AS s2,
        |  CAST(sum(CASE WHEN NOT (2 * CAST(x AS HUGEINT) * n1 * n2 <= s1 * n2 + s2 * n1)
        |    THEN cnt ELSE 0 END) AS HUGEINT) AS n2
        | FROM census, seeds),
        |i2 AS (
        | SELECT
        |  CAST(sum(CASE WHEN 2 * CAST(x AS HUGEINT) * n1 * n2 <= s1 * n2 + s2 * n1
        |    THEN CAST(x AS HUGEINT) * cnt ELSE 0 END) AS HUGEINT) AS s1,
        |  CAST(sum(CASE WHEN 2 * CAST(x AS HUGEINT) * n1 * n2 <= s1 * n2 + s2 * n1
        |    THEN cnt ELSE 0 END) AS HUGEINT) AS n1,
        |  CAST(sum(CASE WHEN NOT (2 * CAST(x AS HUGEINT) * n1 * n2 <= s1 * n2 + s2 * n1)
        |    THEN CAST(x AS HUGEINT) * cnt ELSE 0 END) AS HUGEINT) AS s2,
        |  CAST(sum(CASE WHEN NOT (2 * CAST(x AS HUGEINT) * n1 * n2 <= s1 * n2 + s2 * n1)
        |    THEN cnt ELSE 0 END) AS HUGEINT) AS n2
        | FROM census, i1),
        |i3 AS (
        | SELECT
        |  CAST(sum(CASE WHEN 2 * CAST(x AS HUGEINT) * n1 * n2 <= s1 * n2 + s2 * n1
        |    THEN CAST(x AS HUGEINT) * cnt ELSE 0 END) AS HUGEINT) AS s1,
        |  CAST(sum(CASE WHEN 2 * CAST(x AS HUGEINT) * n1 * n2 <= s1 * n2 + s2 * n1
        |    THEN cnt ELSE 0 END) AS HUGEINT) AS n1,
        |  CAST(sum(CASE WHEN NOT (2 * CAST(x AS HUGEINT) * n1 * n2 <= s1 * n2 + s2 * n1)
        |    THEN CAST(x AS HUGEINT) * cnt ELSE 0 END) AS HUGEINT) AS s2,
        |  CAST(sum(CASE WHEN NOT (2 * CAST(x AS HUGEINT) * n1 * n2 <= s1 * n2 + s2 * n1)
        |    THEN cnt ELSE 0 END) AS HUGEINT) AS n2
        | FROM census, i2)
        |SELECT CAST(n1 AS BIGINT) AS n_lo, CAST(n2 AS BIGINT) AS n_hi,
        | CAST(s1 // n1 AS BIGINT) AS center_lo_c,
        | CAST(s2 // n2 AS BIGINT) AS center_hi_c
        |FROM i3""".stripMargin,
    "q_shorth" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        | FROM orders GROUP BY 1),
        |ranked AS (
        | SELECT x, day, row_number() OVER (ORDER BY x, day) AS rn,
        |   sum(x) OVER (ORDER BY x, day
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
        | FROM daily),
        |n_ AS (SELECT count(*) AS n, count(*) // 2 + 1 AS h FROM daily),
        |pairs AS (
        | SELECT a.rn, a.x AS x_lo, a.pre - a.x AS pre_lo,
        |   b.x AS x_hi, b.pre AS pre_hi, n, h
        | FROM ranked a CROSS JOIN n_
        | JOIN ranked b ON b.rn = a.rn + h - 1)
        |SELECT CAST(n AS BIGINT) AS n, CAST(h AS BIGINT) AS h,
        | x_lo AS lo_c, x_hi AS hi_c, x_hi - x_lo AS width_c,
        | CAST((pre_hi - pre_lo) // h AS BIGINT) AS shorth_mean_c
        |FROM pairs ORDER BY width_c ASC, rn ASC LIMIT 1""".stripMargin,
  )
}
