package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 10: market-basket triples, gap imputation, robust outlier
  * fences, product growth accounting, position-based attribution, and
  * sequence entropy — exact-integer interiors; the only libm calls are
  * the ≤25 per-cell lns of the transition matrix (the q_js_divergence
  * micro-nat discipline).
  */
object Analytics28 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** 3-itemset support histogram over order baskets — the Apriori
    * level-3 census that q_basket_pairs' pair support leads into:
    * how many part triples co-occur in k orders. The triple explode is
    * bounded by Σ C(basket,3) ≤ 35·|orders| (baskets cap at ~7 parts),
    * so the pair-join fan-out is LINEAR in orders.
    *
    * 100 TB shape: two equi-joins on the order key with p1<p2<p3
    * orientation (each triple built exactly once), then two hash aggs. */
  val qItemset3: Q = (s, d) => {
    // o-partitioned checkpoint (r16, the qLinkPredict treatment): items
    // feeds all THREE legs of the triple self-join — un-checkpointed,
    // each leg replayed the lineitem scan + distinct, and the o
    // partitioning makes both o-keyed joins exchange-free
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .repartition(col("o")).distinct()
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val triples = items.as("a")
      .join(items.as("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .join(items.as("c"), col("b.o") === col("c.o") && col("b.p") < col("c.p"))
      .select(col("a.p").as("p1"), col("b.p").as("p2"), col("c.p").as("p3"))
    triples.groupBy("p1", "p2", "p3").agg(count(lit(1)).as("support"))
      .groupBy("support").agg(count(lit(1)).as("n_triples"))
      .orderBy("support")
  }

  /** Calendar densify + linear gap imputation of the daily revenue
    * series: missing days get v_prev + (v_next−v_prev)·(d−d_prev) div
    * (d_next−d_prev), all integer cents (truncating div — identical in
    * both engines). The ETL gap-repair companion to q_resample_ffill's
    * step-hold.
    *
    * 100 TB shape: revenue collapses to the bounded daily frame before
    * the calendar join; the IGNORE NULLS windows run over ≤|days| rows. */
  val qInterpolateLinear: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
    val bounds = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val cal = bounds.select(explode(expr("sequence(d0, d1)")).as("day"))
    val j = cal.join(daily, Seq("day"), "left")
      .withColumn("i", expr("CAST(datediff(day, DATE '1992-01-01') AS BIGINT)"))
    val wPrev = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.orderBy("i").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    j.withColumn("pv", last(col("rev_c"), ignoreNulls = true).over(wPrev))
      .withColumn("pi", last(when(col("rev_c").isNotNull, col("i")), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("rev_c"), ignoreNulls = true).over(wNext))
      .withColumn("ni", first(when(col("rev_c").isNotNull, col("i")), ignoreNulls = true).over(wNext))
      .select(col("day").cast("string").as("day"),
        when(col("rev_c").isNotNull, col("rev_c"))
          .otherwise(expr("pv + (nv - pv) * (i - pi) div (ni - pi)"))
          .as("rev_interp_c"),
        col("rev_c").isNull.cast("long").as("is_interp"))
      .orderBy("day")
  }

  /** Tukey IQR fences per return flag: quartiles of the extended price
    * picked by RANK SELECTION (exact data values, the
    * q_percentile_disc discipline), fences q1−1.5·IQR / q3+1.5·IQR
    * held in half-cents (×2 clears the .5 — the whole census is
    * integer), and the outlier share in ppm.
    *
    * 100 TB shape: per-flag rank window (3 partitions), one broadcast
    * of the 3-row fence frame back over the scan. */
  val qIqrFences: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("ec"))
    val wr = Window.partitionBy("flag").orderBy("ec")
    val ranked = li.withColumn("rn", row_number().over(wr))
    val counts = li.groupBy("flag").agg(count(lit(1)).as("n"))
    val quarts = ranked.join(counts, "flag")
      .filter(col("rn") === expr("(n + 3) div 4") ||
        col("rn") === expr("(3 * n + 3) div 4"))
      .groupBy("flag", "n")
      .agg(min("ec").as("q1"), max("ec").as("q3"))
    li.join(broadcast(quarts), "flag")
      .groupBy(col("flag"), col("n"), col("q1"), col("q3"))
      .agg(sum((col("ec") * 2 < col("q1") * 5 - col("q3") * 3).cast("long")).as("n_below"),
        sum((col("ec") * 2 > col("q3") * 5 - col("q1") * 3).cast("long")).as("n_above"))
      .select(col("flag"), col("n"), col("q1"), col("q3"), col("n_below"), col("n_above"),
        expr("((n_below + n_above) * 1000000) div n").as("out_ppm"))
      .orderBy("flag")
  }

  /** Growth accounting (new / retained / resurrected / churned users
    * per day) — the product-analytics ledger behind every DAU chart.
    * Status from each user's previous active day (lag over the
    * per-user day frame); churn on day d = users active on the
    * PREVIOUS calendar day who did not return, derived from the
    * day-census lag so the identity n_churned = prev_active −
    * n_retained holds exactly.
    *
    * 100 TB shape: one (user × day) distinct collapse, one per-user
    * lag window, one day census — no self-joins. */
  val qGrowthAccounting: Q = (s, d) => {
    val act = Tables.events(s, d)
      .select(col("user_id"),
        expr("CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)").as("i"),
        col("ts").cast("date").cast("string").as("day"))
      .distinct()
    val wu = Window.partitionBy("user_id").orderBy("i")
    val st = act.withColumn("prev", lag(col("i"), 1).over(wu))
    val census = st.groupBy("day", "i")
      .agg(count(lit(1)).as("n_active"),
        sum(col("prev").isNull.cast("long")).as("n_new"),
        // null-prev rows must count as 0, not NULL-out the whole first day
        sum(when(col("prev") === col("i") - 1, 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("prev") < col("i") - 1, 1L).otherwise(0L)).as("n_resurrected"))
    val wd = Window.orderBy("i")
    census
      .withColumn("lag_i", lag(col("i"), 1).over(wd))
      .withColumn("lag_active", lag(col("n_active"), 1).over(wd))
      .select(col("day"), col("n_active"), col("n_new"), col("n_retained"),
        col("n_resurrected"),
        expr("""CASE WHEN lag_i IS NULL THEN 0
                WHEN lag_i = i - 1 THEN lag_active - n_retained
                ELSE lag_active END""").as("n_churned"))
      .orderBy("day")
  }

  /** U-shaped (position-based) attribution: 40% first touch, 40% last,
    * 20% split across the middle — the position-aware complement to
    * q_attribution's even split, same 24 h window. Credits are exact
    * ppm integers (the div remainder on the middle split is documented
    * truncation).
    *
    * 100 TB shape: the purchases ⋈ touches equi-join is bounded by
    * per-user activity; position ranks run inside per-purchase
    * partitions. */
  val qAttrUshape: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        unix_micros(col("ts")).as("p_us"))
    val touch = ev.filter(col("event_type").isin("click", "view", "signup"))
      .select(col("user_id"), col("event_type").as("channel"),
        col("event_id").as("t_id"), unix_micros(col("ts")).as("t_us"))
    val hits = purch.join(touch, Seq("user_id"))
      .filter(col("t_us") <= col("p_us") &&
        col("p_us") - col("t_us") < lit(86400000000L))
    val wp = Window.partitionBy("p_id").orderBy(col("t_us"), col("t_id"))
    val wpd = Window.partitionBy("p_id").orderBy(col("t_us").desc, col("t_id").desc)
    val pos = hits
      .withColumn("rn", row_number().over(wp))
      .withColumn("rnd", row_number().over(wpd))
      .withColumn("nt", count(lit(1)).over(Window.partitionBy("p_id")))
      .withColumn("credit_ppm", expr(
        """CASE WHEN nt = 1 THEN 1000000
           WHEN nt = 2 THEN 500000
           WHEN rn = 1 OR rnd = 1 THEN 400000
           ELSE 200000 div (nt - 2) END"""))
    pos.groupBy("channel")
      .agg(sum("credit_ppm").as("credit_ppm"),
        countDistinct("p_id").as("n_purchases"),
        sum((col("rn") === 1).cast("long")).as("n_first"),
        sum((col("rnd") === 1).cast("long")).as("n_last"))
      .orderBy("channel")
  }

  /** Per-state entropy of the user event-type transition matrix — the
    * sequence-predictability readout over q_markov_transitions' counts.
    * Each of the ≤25 cells contributes round(−p·ln p·10⁶) integer
    * micro-nats (order-free sum, the q_js_divergence discipline);
    * transitions are ordered by (ts, event_id) within user.
    *
    * 100 TB shape: one per-user lag window, a 25-cell census,
    * everything after on the bounded matrix frame. */
  val qTransitionEntropy: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
    val wu = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val bi = ev.withColumn("prev_type", lag(col("event_type"), 1).over(wu))
      .filter(col("prev_type").isNotNull)
    val cells = bi.groupBy("prev_type", "event_type").agg(count(lit(1)).as("c"))
    val rows = cells.groupBy("prev_type").agg(sum("c").as("r"))
    cells.join(rows, "prev_type")
      .withColumn("t", expr(
        "CAST(round(-(CAST(c AS DOUBLE) / r) * ln(CAST(c AS DOUBLE) / r) * 1000000) AS BIGINT)"))
      .groupBy("prev_type")
      .agg(max("r").as("n_trans"), count(lit(1)).as("n_dest"),
        sum("t").as("entropy_micronats"))
      .orderBy("prev_type")
  }

  val all: Map[String, Q] = Map(
    "q_itemset3" -> qItemset3,
    "q_interpolate_linear" -> qInterpolateLinear,
    "q_iqr_fences" -> qIqrFences,
    "q_growth_accounting" -> qGrowthAccounting,
    "q_attr_ushape" -> qAttrUshape,
    "q_transition_entropy" -> qTransitionEntropy,
  )

  val oracles: Map[String, String] = Map(
    "q_itemset3" ->
      """WITH items AS (
        | SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |triples AS (
        | SELECT a.p AS p1, b.p AS p2, c.p AS p3
        | FROM items a
        | JOIN items b ON a.o = b.o AND a.p < b.p
        | JOIN items c ON b.o = c.o AND b.p < c.p),
        |sup AS (
        | SELECT p1, p2, p3, count(*) AS support FROM triples GROUP BY 1, 2, 3)
        |SELECT support, count(*) AS n_triples
        |FROM sup GROUP BY support ORDER BY support""".stripMargin,
    "q_interpolate_linear" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        | FROM orders GROUP BY 1),
        |cal AS (
        | SELECT unnest(generate_series(
        |   (SELECT min(day) FROM daily), (SELECT max(day) FROM daily),
        |   INTERVAL 1 DAY))::DATE AS day),
        |j AS (
        | SELECT c.day, d.rev_c,
        |   date_diff('day', DATE '1992-01-01', c.day) AS i
        | FROM cal c LEFT JOIN daily d USING (day)),
        |f AS (
        | SELECT day, rev_c, i,
        |  last_value(rev_c IGNORE NULLS) OVER
        |    (ORDER BY i ROWS UNBOUNDED PRECEDING) AS pv,
        |  last_value(CASE WHEN rev_c IS NOT NULL THEN i END IGNORE NULLS) OVER
        |    (ORDER BY i ROWS UNBOUNDED PRECEDING) AS pi,
        |  first_value(rev_c IGNORE NULLS) OVER
        |    (ORDER BY i ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |  first_value(CASE WHEN rev_c IS NOT NULL THEN i END IGNORE NULLS) OVER
        |    (ORDER BY i ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ni
        | FROM j)
        |SELECT CAST(day AS VARCHAR) AS day,
        | CAST(CASE WHEN rev_c IS NOT NULL THEN rev_c
        |  ELSE pv + (nv - pv) * (i - pi) // (ni - pi) END AS BIGINT)
        |   AS rev_interp_c,
        | CAST(rev_c IS NULL AS BIGINT) AS is_interp
        |FROM f ORDER BY day""".stripMargin,
    "q_iqr_fences" ->
      """WITH li AS (
        | SELECT l_returnflag AS flag,
        |   CAST(round(l_extendedprice * 100) AS BIGINT) AS ec
        | FROM lineitem),
        |ranked AS (
        | SELECT flag, ec, row_number() OVER (PARTITION BY flag ORDER BY ec) AS rn
        | FROM li),
        |counts AS (SELECT flag, count(*) AS n FROM li GROUP BY flag),
        |quarts AS (
        | SELECT r.flag, c.n, min(ec) AS q1, max(ec) AS q3
        | FROM ranked r JOIN counts c ON r.flag = c.flag
        | WHERE rn = (n + 3) // 4 OR rn = (3 * n + 3) // 4
        | GROUP BY 1, 2)
        |SELECT li.flag, q.n, q.q1, q.q3,
        | CAST(sum(CASE WHEN ec * 2 < q1 * 5 - q3 * 3 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_below,
        | CAST(sum(CASE WHEN ec * 2 > q3 * 5 - q1 * 3 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_above,
        | CAST(((sum(CASE WHEN ec * 2 < q1 * 5 - q3 * 3 THEN 1 ELSE 0 END)
        |   + sum(CASE WHEN ec * 2 > q3 * 5 - q1 * 3 THEN 1 ELSE 0 END))
        |   * 1000000) // q.n AS BIGINT) AS out_ppm
        |FROM li JOIN quarts q ON li.flag = q.flag
        |GROUP BY li.flag, q.n, q.q1, q.q3 ORDER BY li.flag""".stripMargin,
    "q_growth_accounting" ->
      """WITH act AS (
        | SELECT DISTINCT user_id,
        |   date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS i,
        |   CAST(CAST(ts AS DATE) AS VARCHAR) AS day
        | FROM events),
        |st AS (
        | SELECT day, i, user_id,
        |   lag(i) OVER (PARTITION BY user_id ORDER BY i) AS prev
        | FROM act),
        |census AS (
        | SELECT day, i, count(*) AS n_active,
        |  CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(sum(CASE WHEN prev = i - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |  CAST(sum(CASE WHEN prev < i - 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_resurrected
        | FROM st GROUP BY day, i),
        |lagged AS (
        | SELECT day, n_active, n_new, n_retained, n_resurrected,
        |   lag(i) OVER (ORDER BY i) AS lag_i, i,
        |   lag(n_active) OVER (ORDER BY i) AS lag_active
        | FROM census)
        |SELECT day, n_active, n_new, n_retained, n_resurrected,
        | CAST(CASE WHEN lag_i IS NULL THEN 0
        |  WHEN lag_i = i - 1 THEN lag_active - n_retained
        |  ELSE lag_active END AS BIGINT) AS n_churned
        |FROM lagged ORDER BY day""".stripMargin,
    "q_attr_ushape" ->
      """WITH purch AS (
        | SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us
        | FROM events WHERE event_type = 'purchase'),
        |touch AS (
        | SELECT user_id, event_type AS channel, event_id AS t_id,
        |   epoch_us(ts) AS t_us
        | FROM events WHERE event_type IN ('click', 'view', 'signup')),
        |hits AS (
        | SELECT p.p_id, t.channel, t.t_id, t.t_us
        | FROM purch p JOIN touch t USING (user_id)
        | WHERE t.t_us <= p.p_us AND p.p_us - t.t_us < 86400000000),
        |pos AS (
        | SELECT channel, p_id,
        |  row_number() OVER (PARTITION BY p_id ORDER BY t_us, t_id) AS rn,
        |  row_number() OVER (PARTITION BY p_id ORDER BY t_us DESC, t_id DESC) AS rnd,
        |  count(*) OVER (PARTITION BY p_id) AS nt
        | FROM hits)
        |SELECT channel,
        | CAST(sum(CASE WHEN nt = 1 THEN 1000000
        |   WHEN nt = 2 THEN 500000
        |   WHEN rn = 1 OR rnd = 1 THEN 400000
        |   ELSE 200000 // (nt - 2) END) AS BIGINT) AS credit_ppm,
        | count(DISTINCT p_id) AS n_purchases,
        | CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
        | CAST(sum(CASE WHEN rnd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_last
        |FROM pos GROUP BY channel ORDER BY channel""".stripMargin,
    "q_transition_entropy" ->
      """WITH ev AS (
        | SELECT user_id, event_type, epoch_us(ts) AS us, event_id
        | FROM events),
        |bi AS (
        | SELECT lag(event_type) OVER
        |    (PARTITION BY user_id ORDER BY us, event_id) AS prev_type,
        |   event_type
        | FROM ev),
        |cells AS (
        | SELECT prev_type, event_type, count(*) AS c
        | FROM bi WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |rows_ AS (
        | SELECT prev_type, CAST(sum(c) AS BIGINT) AS r
        | FROM cells GROUP BY prev_type)
        |SELECT c.prev_type, max(r.r) AS n_trans, count(*) AS n_dest,
        | CAST(sum(CAST(round(-(CAST(c.c AS DOUBLE) / r.r)
        |   * ln(CAST(c.c AS DOUBLE) / r.r) * 1000000) AS BIGINT)) AS BIGINT)
        |   AS entropy_micronats
        |FROM cells c JOIN rows_ r USING (prev_type)
        |GROUP BY c.prev_type ORDER BY c.prev_type""".stripMargin,
  )
}
