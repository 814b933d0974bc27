package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions.tokens

/** r9 batch 29: distribution transport, ranked-list agreement, and
  * tail risk — Wasserstein-1 computed EXACTLY from the merged value
  * census (the CDF-gap integral has integer numerators), rank-biased
  * overlap of top-k token lists, and CVaR by census rank selection.
  */
object Analytics47 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Wasserstein-1 (earth mover's) distance between the two largest
    * nations' daily-revenue distributions: W₁ = ∫|F_A−F_B| dv over the
    * merged value census — each gap contributes (v₊₁−v)·|cumA·n_B −
    * cumB·n_A|, an EXACT integer; the final division by n_A·n_B floors
    * once into micro-cents. No sorting beyond the census, no
    * quantile interpolation, no floats.
    *
    * 100 TB shape: two daily collapses → merged census → one cumsum +
    * lead window over it; everything integer. */
  val qWasserstein1: Q = (s, d) => {
    val rev = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"),
        col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("v"))
    val top2 = rev.groupBy("nk").agg(sum("v").as("tot"))
      .orderBy(col("tot").desc, col("nk")).limit(2)
      .withColumn("rnk", expr("row_number() OVER (ORDER BY tot DESC, nk)"))
    val tagged = rev.join(broadcast(top2.select("nk", "rnk")), "nk")
    val census = tagged.groupBy("v")
      .agg(sum((col("rnk") === 1).cast("long")).as("ca"),
        sum((col("rnk") === 2).cast("long")).as("cb"))
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    val tot = tagged.agg(sum((col("rnk") === 1).cast("long")).as("na"),
      sum((col("rnk") === 2).cast("long")).as("nb"))
    census
      .withColumn("cuma", sum("ca").over(w))
      .withColumn("cumb", sum("cb").over(w))
      .withColumn("dv", lead("v", 1).over(Window.orderBy("v")) - col("v"))
      .filter(col("dv").isNotNull)
      .join(broadcast(tot))
      .agg(max("na").as("n_a"), max("nb").as("n_b"),
        sum(expr("CAST(dv AS DECIMAL(38,0)) * abs(cuma * nb - cumb * na)"))
          .as("num"))
      .select(col("n_a"), col("n_b"),
        expr("""CAST((num * 1000000) div (CAST(n_a AS DECIMAL(38,0)) * n_b)
                AS BIGINT)""").as("w1_microcents"))
  }

  /** Rank-biased overlap (Webber 2010, p=0.9, depth 50) between the
    * top-50 token lists of even- vs odd-id documents — does the vocab
    * head drift across the split? Per-depth terms (1−p)·p^{d−1}·X_d/d
    * round to µ integers (order-free sum); X_d counts tokens ranked
    * ≤ d in BOTH lists, from one full-outer rank-pair frame against a
    * broadcast 50-row depth frame.
    *
    * 100 TB shape: two token censuses → two top-50s → a 50-row pair
    * frame × 50 depths; corpus touched once per half. */
  val qRbo: Q = (s, d) => {
    import s.implicits._
    def top(par: Int) = Tables.documents(s, d)
      .filter(col("doc_id") % 2 === par)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(50)
      .withColumn("r", row_number().over(Window.orderBy(col("c").desc, col("w"))))
      .select("w", "r")
    val pairs = top(0).withColumnRenamed("r", "ra")
      .join(top(1).withColumnRenamed("r", "rb"), Seq("w"), "full")
    val depths = broadcast((1 to 50).toDF("dep"))
    val xd = pairs.crossJoin(depths)
      .filter(col("ra") <= col("dep") && col("rb") <= col("dep"))
      .groupBy("dep").agg(count(lit(1)).as("x_d"))
    depths.join(xd, Seq("dep"), "left")
      .withColumn("x_d", coalesce(col("x_d"), lit(0L)))
      .select(expr(
        """CAST(round(0.1 * pow(0.9, dep - 1) * x_d / dep * 1000000) AS BIGINT)""")
        .as("term_micro"), col("x_d"), col("dep"))
      .agg(sum("term_micro").as("rbo_micro"),
        max(expr("CASE WHEN dep = 50 THEN x_d END")).as("overlap_at_50"))
  }

  /** CVaR / expected shortfall at 95%: the exact mean of the worst 5%
    * revenue days — VaR by census rank selection, the tail mean as an
    * integer floor over exactly the ⌈0.05·n⌉ worst days (sub-VaR days
    * plus the boundary remainder — the textbook discrete ES).
    *
    * 100 TB shape: |days| census + one cumsum; the tail mean reads the
    * census again below the broadcast VaR. */
  val qCvar: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
    val census = daily.groupBy("x").agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    val tot = daily.agg(count(lit(1)).as("n"))
    val cum = census.withColumn("upto", sum("cnt").over(w))
      .join(broadcast(tot))
      .withColumn("m", expr("(n + 19) div 20"))
    val varRow = cum.filter(col("upto") >= col("m"))
      .agg(min("x").as("var_c"))
    cum.join(broadcast(varRow))
      .agg(max("n").as("n_days"), max("m").as("tail_n"), max("var_c").as("var_c"),
        // exact tail sum: all strictly-below-VaR mass + boundary remainder
        sum(expr("CASE WHEN x < var_c THEN CAST(x AS DECIMAL(38,0)) * cnt ELSE 0 END")).as("below_sum"),
        sum(expr("CASE WHEN x < var_c THEN cnt ELSE 0 END")).as("below_n"))
      .select(col("n_days"), col("var_c"),
        expr("CAST((below_sum + (tail_n - below_n) * var_c) div tail_n AS BIGINT)")
          .as("cvar_c"))
  }

  val all: Map[String, Q] = Map(
    "q_wasserstein1" -> qWasserstein1,
    "q_rbo" -> qRbo,
    "q_cvar" -> qCvar,
  )

  val oracles: Map[String, String] = Map(
    "q_wasserstein1" ->
      """WITH rev AS (
        | SELECT c_nationkey AS nk, CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | GROUP BY 1, 2),
        |top2 AS (
        | SELECT nk, row_number() OVER (ORDER BY sum(v) DESC, nk) AS rnk
        | FROM rev GROUP BY nk ORDER BY sum(v) DESC, nk LIMIT 2),
        |tagged AS (SELECT rev.*, rnk FROM rev JOIN top2 USING (nk)),
        |census AS (
        | SELECT v, sum(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS ca,
        |   sum(CASE WHEN rnk = 2 THEN 1 ELSE 0 END) AS cb
        | FROM tagged GROUP BY v),
        |tot AS (
        | SELECT CAST(sum(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |   CAST(sum(CASE WHEN rnk = 2 THEN 1 ELSE 0 END) AS BIGINT) AS nb
        | FROM tagged),
        |cum AS (
        | SELECT v,
        |  sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS cuma,
        |  sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS cumb,
        |  lead(v) OVER (ORDER BY v) - v AS dv
        | FROM census)
        |SELECT na AS n_a, nb AS n_b,
        | CAST((CAST(sum(CAST(dv AS HUGEINT) * abs(cuma * nb - cumb * na))
        |   AS HUGEINT) * 1000000) // (CAST(na AS HUGEINT) * nb) AS BIGINT)
        |   AS w1_microcents
        |FROM cum, tot WHERE dv IS NOT NULL
        |GROUP BY na, nb""".stripMargin,
    "q_rbo" ->
      """WITH tk AS (
        | SELECT doc_id % 2 AS par, w
        | FROM (SELECT doc_id,
        |         unnest(string_split_regex(trim(text), '\s+')) AS w
        |       FROM documents) u
        | WHERE length(w) > 0),
        |ta AS (
        | SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS ra
        | FROM tk WHERE par = 0 GROUP BY w
        | ORDER BY count(*) DESC, w LIMIT 50),
        |tb AS (
        | SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS rb
        | FROM tk WHERE par = 1 GROUP BY w
        | ORDER BY count(*) DESC, w LIMIT 50),
        |pairs AS (SELECT ta.w, ra, rb FROM ta FULL JOIN tb USING (w)),
        |xd AS (
        | SELECT dep, count(*) AS x_d
        | FROM pairs CROSS JOIN range(1, 51) t(dep)
        | WHERE ra <= dep AND rb <= dep
        | GROUP BY dep),
        |terms AS (
        | SELECT dep, coalesce(x_d, 0) AS x_d,
        |  CAST(round(0.1 * pow(0.9, dep - 1) * coalesce(x_d, 0) / dep * 1000000)
        |    AS BIGINT) AS term_micro
        | FROM range(1, 51) t(dep) LEFT JOIN xd USING (dep))
        |SELECT CAST(sum(term_micro) AS BIGINT) AS rbo_micro,
        | CAST(max(CASE WHEN dep = 50 THEN x_d END) AS BIGINT) AS overlap_at_50
        |FROM terms""".stripMargin,
    "q_cvar" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        | FROM orders GROUP BY 1),
        |census AS (SELECT x, count(*) AS cnt FROM daily GROUP BY x),
        |tot AS (SELECT count(*) AS n, (count(*) + 19) // 20 AS m FROM daily),
        |cum AS (
        | SELECT x, cnt,
        |  sum(cnt) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS upto
        | FROM census),
        |vr AS (SELECT min(x) AS var_c FROM cum, tot WHERE upto >= m)
        |SELECT any_value(n) AS n_days, any_value(var_c) AS var_c,
        | CAST((sum(CASE WHEN x < var_c THEN CAST(x AS HUGEINT) * cnt ELSE 0 END)
        |   + (any_value(m) - sum(CASE WHEN x < var_c THEN cnt ELSE 0 END))
        |     * any_value(var_c)) // any_value(m) AS BIGINT) AS cvar_c
        |FROM census, tot, vr""".stripMargin,
  )
}
