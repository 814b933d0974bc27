package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 11: rolling median, Kruskal–Wallis, Welch t, NDCG@10,
  * Brier decomposition, and price-volume-mix — the ranking/testing/
  * FP&A statistics a curation+reporting engine still lacked. The
  * integer disciplines of the r8/r9 statistics batches apply
  * throughout: rank arithmetic in 2×-avg-rank integers, effects in
  * cents with DECIMAL(38,0) products and documented floor-div
  * truncation (Spark `div` ≡ DuckDB HUGEINT `//` on these
  * non-negative-denominator rationals), and NDCG's log2 discounts as
  * a LITERAL 10-row micro-integer table so the whole query is
  * libm-free. The only doubles are Welch's one-row readout, built
  * from exact integer moments with IEEE-exact ops (+,−,×,/,sqrt) in
  * the same textual order on both engines — the q_spearman
  * byte-identity argument.
  */
object Analytics29 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** 7-day rolling LOWER median of daily revenue — the robust
    * centerline behind ops dashboards (median shrugs off the
    * single-day spikes that drag q_ewma). Lower median = element at
    * rank (w+1) div 2 of the sorted window: an EXACT data value
    * (the q_percentile_disc discipline), never an average, so the
    * whole query is integer cents.
    *
    * 100 TB shape: the fact collapses to the bounded |days| frame
    * (one partial-agg'd groupBy) BEFORE any window; the 7-row list
    * window runs over ≤2.4k rows on one core. collect_list here is
    * not a scale hazard — its frame is 7 rows by construction. */
  val qRollingMedian: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
    val w = Window.orderBy("day").rowsBetween(-6, 0)
    daily
      .withColumn("win", sort_array(collect_list(col("rev_c")).over(w)))
      .select(col("day").cast("string").as("day"), col("rev_c"),
        expr("element_at(win, CAST((size(win) + 1) div 2 AS INT))").as("med7_c"),
        size(col("win")).cast("long").as("win_n"))
      .orderBy("day")
  }

  /** Kruskal–Wallis H across the five order priorities on price
    * cents — the k-group extension of q_mann_whitney. Average ranks
    * are carried as exact 2×avg-rank integers built from the VALUE
    * CENSUS (min-rank = 1 + running count of smaller values), so the
    * per-group rank sums are DECIMAL(38,0)-exact; H and its
    * tie-corrected form are pure integer micro-unit arithmetic:
    *   Hµ = (3·Σⱼ⌊S2ⱼ²·10⁶/nⱼ⌋) div (N(N+1)) − 3(N+1)·10⁶
    *   Hcorrµ = Hµ·10⁹ div C_ppb,  C_ppb = ⌊(N³−N−ΣT)·10⁹/(N³−N)⌋
    * (floor-div receipts documented; ΣT = Σ(t³−t) over tie groups).
    * No doubles anywhere. The per-group quotient ⌊S2ⱼ²·10⁶/nⱼ⌋ is
    * ~N³·10⁶/k — past int64 at sf0.1 already — so it is taken in
    * EXACT decimal arithmetic as (a − a%b)/b (remainder subtracted
    * first, so the decimal divide is integral and exact; Spark `div`
    * can't carry it, its IntegralDivide returns int64). Exactness
    * holds to S2²·10⁶ < 10³⁸ ⇒ N ≲ 10⁸ rows per statistic — beyond
    * that a test statistic is stratified anyway (HUGEINT hits the
    * same wall at 1.7e38).
    *
    * 100 TB shape: rank census = one groupBy to |distinct prices|
    * rows (bounded by the price domain, ~10⁷) + one running-sum
    * window over that census, then a 5-row readout. The fact is
    * touched once. */
  val qKruskalWallis: Q = (s, d) => {
    val vals = Tables.orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("pc"))
    val census = vals.groupBy("pc").agg(count(lit(1)).as("cnt"))
    val wv = Window.orderBy("pc").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = census
      .withColumn("below", coalesce(sum("cnt").over(wv), lit(0L)))
      .withColumn("x2", (col("below") * 2 + col("cnt") + 1).cast("decimal(38,0)"))
    val perGroup = vals.groupBy("grp", "pc").agg(count(lit(1)).as("gc"))
      .join(ranked.select("pc", "x2"), "pc")
      .groupBy("grp")
      .agg(sum(col("gc")).as("n_g"),
        sum(col("x2") * col("gc")).as("s2"))
      .withColumn("num", expr("s2 * s2 * 1000000"))
      .withColumn("term",
        expr("CAST((num - num % n_g) / n_g AS DECIMAL(38,0))"))
    val ties = census.agg(
      sum(expr("CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt")).as("t_sum"),
      sum("cnt").as("n_total"))
    perGroup.agg(sum("term").as("term_sum"), count(lit(1)).as("k_groups"))
      .join(broadcast(ties))
      .withColumn("h_micro",
        expr("""CAST((3 * term_sum) div (CAST(n_total AS DECIMAL(38,0)) * (n_total + 1))
                - 3 * (n_total + 1) * 1000000 AS BIGINT)"""))
      .withColumn("c_ppb",
        expr("""CAST(((CAST(n_total AS DECIMAL(38,0)) * n_total * n_total - n_total - t_sum)
                * 1000000000)
                div (CAST(n_total AS DECIMAL(38,0)) * n_total * n_total - n_total)
                AS BIGINT)"""))
      .select(col("n_total").as("n"), col("k_groups").as("k"), col("h_micro"),
        expr("CAST((CAST(h_micro AS DECIMAL(38,0)) * 1000000000) div c_ppb AS BIGINT)")
          .as("h_corr_micro"))
  }

  /** Welch's unequal-variance t-test with Satterthwaite df between
    * the BUILDING and MACHINERY segments' account balances — the
    * df-carrying upgrade of q_ab_test's z. Moments (n, Σx, Σx²) are
    * DECIMAL(38,0)-exact cents; the one-row readout uses only
    * IEEE-exact double ops (+,−,×,/ and correctly-rounded sqrt) in
    * the same textual order as the oracle, so the 6dp rounds agree
    * byte-for-byte (the q_spearman argument — no libm calls).
    *
    * 100 TB shape: one partial-aggregable moment pass over the
    * filtered scan; everything after is on 2 rows. */
  val qWelchTtest: Q = (s, d) => {
    val m = Tables.customer(s, d)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment").as("seg"),
        expr("CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DECIMAL(38,0))").as("bc"))
      .groupBy("seg")
      .agg(count(lit(1)).as("n"), sum("bc").as("sx"),
        sum(col("bc") * col("bc")).as("sxx"))
    val a = m.filter(col("seg") === "BUILDING")
      .select(col("n").as("n1"), col("sx").as("sx1"), col("sxx").as("sxx1"))
    val b = m.filter(col("seg") === "MACHINERY")
      .select(col("n").as("n2"), col("sx").as("sx2"), col("sxx").as("sxx2"))
    a.join(broadcast(b))
      .select(col("n1"), col("n2"),
        expr("""CAST(round((CAST(sx1 AS DOUBLE) / n1 - CAST(sx2 AS DOUBLE) / n2)
            / sqrt((CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * (CAST(sx1 AS DOUBLE) / n1)) / (n1 - 1) / n1
                 + (CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * (CAST(sx2 AS DOUBLE) / n2)) / (n2 - 1) / n2), 6)
            AS DOUBLE)""").as("t_stat"),
        expr("""CAST(round(
            ((CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * (CAST(sx1 AS DOUBLE) / n1)) / (n1 - 1) / n1
             + (CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * (CAST(sx2 AS DOUBLE) / n2)) / (n2 - 1) / n2)
            * ((CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * (CAST(sx1 AS DOUBLE) / n1)) / (n1 - 1) / n1
             + (CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * (CAST(sx2 AS DOUBLE) / n2)) / (n2 - 1) / n2)
            / ((CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * (CAST(sx1 AS DOUBLE) / n1)) / (n1 - 1) / n1
               * ((CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * (CAST(sx1 AS DOUBLE) / n1)) / (n1 - 1) / n1)
               / (n1 - 1)
             + (CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * (CAST(sx2 AS DOUBLE) / n2)) / (n2 - 1) / n2
               * ((CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * (CAST(sx2 AS DOUBLE) / n2)) / (n2 - 1) / n2)
               / (n2 - 1)), 6) AS DOUBLE)""").as("df_welch"))
  }

  /** NDCG@10 of the "rank customers by account balance" retrieval
    * task per market segment, with graded relevance = min(3,
    * orders div 4). The log2 position discounts are a LITERAL 10-row
    * micro-integer table (⌊10⁶/log2(i+1)⌉ precomputed), so
    * DCG/IDCG are pure integer sums — zero libm, zero float. Gains
    * are 2^rel−1 ∈ {0,1,3,7}; ndcg_ppm = dcg·10⁶ div idcg.
    *
    * 100 TB shape: relevance = one partial-agg'd count join; the two
    * top-10 rank windows partition by segment (5 partitions,
    * WindowGroupLimit prunes to 10 rows each before the exchange at
    * scale); the discount join broadcasts 10 rows. */
  val qNdcg: Q = (s, d) => {
    import s.implicits._
    val disc = Seq(
      (1, 1000000L), (2, 630930L), (3, 500000L), (4, 430677L),
      (5, 386853L), (6, 356207L), (7, 333333L), (8, 315465L),
      (9, 301030L), (10, 289065L)).toDF("pos", "disc_ppm")
    val cnts = Tables.orders(s, d).groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"))
    val graded = Tables.customer(s, d)
      .join(cnts, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_mktsegment").as("seg"), col("c_custkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bc"),
        expr("CAST(pow(2, least(coalesce(n_orders, 0) div 4, 3)) AS BIGINT) - 1")
          .as("gain"))
    val wRank = Window.partitionBy("seg").orderBy(col("bc").desc, col("c_custkey"))
    val wIdeal = Window.partitionBy("seg").orderBy(col("gain").desc, col("c_custkey"))
    val dcg = graded.withColumn("pos", row_number().over(wRank))
      .filter(col("pos") <= 10)
      .join(broadcast(disc), "pos")
      .groupBy("seg").agg(sum(col("gain") * col("disc_ppm")).as("dcg_micro"))
    val idcg = graded.withColumn("pos", row_number().over(wIdeal))
      .filter(col("pos") <= 10)
      .join(broadcast(disc), "pos")
      .groupBy("seg").agg(sum(col("gain") * col("disc_ppm")).as("idcg_micro"))
    dcg.join(idcg, "seg")
      .select(col("seg"), col("dcg_micro"), col("idcg_micro"),
        expr("CAST((CAST(dcg_micro AS DECIMAL(38,0)) * 1000000) div idcg_micro AS BIGINT)")
          .as("ndcg_ppm"))
      .orderBy("seg")
  }

  /** Murphy decomposition of the Brier score (reliability −
    * resolution + uncertainty) for the "will this order finish F"
    * forecast: probabilities fit per priority bin on the EVEN order
    * keys, evaluated on the ODD keys — a real train/test split, so
    * reliability is non-degenerate. All pieces are integer ppm/pico:
    * p̂ and ȳ are floor-div ppm rates; the squared gaps are emitted
    * PER-OBSERVATION ((p̂−ȳ)² pico ≤ 10¹², never n-scaled), so no
    * product can overflow int64 at any corpus size — the weighted
    * reliability/resolution sums Σnₖ·gapₖ²/N are one downstream
    * multiply on the 5-row output.
    *
    * 100 TB shape: two partial-agg'd passes (train rates, test
    * census) to |bins| rows, a broadcast of the 1-row test mean; the
    * fact is never shuffled wider than 5 keys. */
  val qBrierDecomp: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_orderpriority").as("bin"), col("o_orderkey"),
        (col("o_orderstatus") === "F").cast("long").as("y"))
    val train = o.filter(col("o_orderkey") % 2 === 0)
      .groupBy("bin")
      .agg(expr("(sum(y) * 1000000) div count(1)").as("phat_ppm"))
    val test = o.filter(col("o_orderkey") % 2 === 1)
      .groupBy("bin")
      .agg(count(lit(1)).as("n_test"), sum("y").as("y_sum"))
      .withColumn("ybar_ppm", expr("(y_sum * 1000000) div n_test"))
    val glob = test.agg(
      expr("(sum(y_sum) * 1000000) div sum(n_test)").as("g_ppm"))
    test.join(train, "bin").join(broadcast(glob))
      .select(col("bin"), col("n_test"), col("phat_ppm"), col("ybar_ppm"),
        col("g_ppm"),
        expr("(phat_ppm - ybar_ppm) * (phat_ppm - ybar_ppm)").as("rel_pico"),
        expr("(ybar_ppm - g_ppm) * (ybar_ppm - g_ppm)").as("res_pico"))
      .orderBy("bin")
  }

  /** Price-volume-mix bridge of 1995→1996 revenue per part brand —
    * the FP&A waterfall: volume = growth at constant mix and price,
    * mix = brand-share shift at constant price, price = the rest.
    * Effects are exact-rational cents floored once per term via
    * DECIMAL(38,0) div (rev·qty products overflow int64 past ~sf3);
    * the floor receipts land in residual_c, so the bridge identity
    * vol+mix+price+residual = Δrev holds EXACTLY row by row.
    * Restricted to brands trading in both years (documented — new/
    * exited brands belong to a volume-of-assortment line this query
    * does not model).
    *
    * 100 TB shape: fact → |brand×2| partial agg (the part join
    * broadcasts at any SF: |part| keys but narrow dim — bucketed at
    * real scale); totals broadcast as a 1-row frame. */
  val qPvmDecomp: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .filter(year(col("o_orderdate").cast("date")).isin(1995, 1996))
      .groupBy(col("p_brand").as("brand"),
        year(col("o_orderdate").cast("date")).as("yr"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("rev_c"),
        sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("qty"))
    val y0 = li.filter(col("yr") === 1995)
      .select(col("brand"), col("rev_c").cast("decimal(38,0)").as("rev0"),
        col("qty").cast("decimal(38,0)").as("q0"))
    val y1 = li.filter(col("yr") === 1996)
      .select(col("brand"), col("rev_c").cast("decimal(38,0)").as("rev1"),
        col("qty").cast("decimal(38,0)").as("q1"))
    val both = y0.join(y1, "brand")
    val tot = both.agg(sum("q0").as("tq0"), sum("q1").as("tq1"))
    both.join(broadcast(tot))
      .select(col("brand"),
        col("rev0").cast("long").as("rev0_c"),
        col("rev1").cast("long").as("rev1_c"),
        col("q0").cast("long").as("q0"), col("q1").cast("long").as("q1"),
        expr("CAST((rev0 * (tq1 - tq0)) div tq0 AS BIGINT)").as("vol_c"),
        expr("CAST((rev0 * q1) div q0 - (rev0 * tq1) div tq0 AS BIGINT)").as("mix_c"),
        expr("CAST(rev1 - (rev0 * q1) div q0 AS BIGINT)").as("price_c"))
      .withColumn("residual_c",
        expr("rev1_c - rev0_c - vol_c - mix_c - price_c"))
      .orderBy("brand")
  }

  val all: Map[String, Q] = Map(
    "q_rolling_median" -> qRollingMedian,
    "q_kruskal_wallis" -> qKruskalWallis,
    "q_welch_ttest" -> qWelchTtest,
    "q_ndcg" -> qNdcg,
    "q_brier_decomp" -> qBrierDecomp,
    "q_pvm_decomp" -> qPvmDecomp,
  )

  val oracles: Map[String, String] = Map(
    "q_rolling_median" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        | FROM orders GROUP BY 1),
        |w AS (
        | SELECT day, rev_c,
        |   list_sort(list(rev_c) OVER
        |     (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
        | FROM daily)
        |SELECT CAST(day AS VARCHAR) AS day, rev_c,
        | win[(len(win) + 1) // 2] AS med7_c,
        | CAST(len(win) AS BIGINT) AS win_n
        |FROM w ORDER BY day""".stripMargin,
    "q_kruskal_wallis" ->
      """WITH vals AS (
        | SELECT o_orderpriority AS grp,
        |   CAST(round(o_totalprice * 100) AS BIGINT) AS pc
        | FROM orders),
        |census AS (SELECT pc, count(*) AS cnt FROM vals GROUP BY pc),
        |ranked AS (
        | SELECT pc, cnt,
        |  CAST(coalesce(sum(cnt) OVER
        |    (ORDER BY pc ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    * 2 + cnt + 1 AS HUGEINT) AS x2
        | FROM census),
        |pg AS (
        | SELECT grp, CAST(sum(gc) AS HUGEINT) AS n_g,
        |   CAST(sum(x2 * gc) AS HUGEINT) AS s2
        | FROM (SELECT grp, v.pc, count(*) AS gc FROM vals v GROUP BY 1, 2) g
        | JOIN ranked r ON g.pc = r.pc GROUP BY grp),
        |ties AS (
        | SELECT CAST(sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS HUGEINT) AS t_sum,
        |   CAST(sum(cnt) AS HUGEINT) AS n_total
        | FROM census),
        |terms AS (
        | SELECT CAST(sum((s2 * s2 * 1000000) // n_g) AS HUGEINT) AS term_sum,
        |   count(*) AS k_groups
        | FROM pg)
        |SELECT CAST(n_total AS BIGINT) AS n, CAST(k_groups AS BIGINT) AS k,
        | CAST((3 * term_sum) // (n_total * (n_total + 1))
        |   - 3 * (n_total + 1) * 1000000 AS BIGINT) AS h_micro,
        | CAST(((3 * term_sum) // (n_total * (n_total + 1))
        |    - 3 * (n_total + 1) * 1000000) * 1000000000
        |   // ((n_total * n_total * n_total - n_total - t_sum) * 1000000000
        |      // (n_total * n_total * n_total - n_total)) AS BIGINT)
        |   AS h_corr_micro
        |FROM terms, ties""".stripMargin,
    "q_welch_ttest" ->
      """WITH m AS (
        | SELECT c_mktsegment AS seg, count(*) AS n,
        |   CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS HUGEINT) AS sx,
        |   CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)
        |     * CAST(round(c_acctbal * 100) AS BIGINT)) AS HUGEINT) AS sxx
        | FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        | GROUP BY 1),
        |a AS (SELECT n AS n1, sx AS sx1, sxx AS sxx1 FROM m WHERE seg = 'BUILDING'),
        |b AS (SELECT n AS n2, sx AS sx2, sxx AS sxx2 FROM m WHERE seg = 'MACHINERY')
        |SELECT n1, n2,
        | CAST(round((CAST(sx1 AS DOUBLE) / n1 - CAST(sx2 AS DOUBLE) / n2)
        |   / sqrt((CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * (CAST(sx1 AS DOUBLE) / n1)) / (n1 - 1) / n1
        |        + (CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * (CAST(sx2 AS DOUBLE) / n2)) / (n2 - 1) / n2), 6)
        |   AS DOUBLE) AS t_stat,
        | CAST(round(
        |   ((CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * (CAST(sx1 AS DOUBLE) / n1)) / (n1 - 1) / n1
        |    + (CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * (CAST(sx2 AS DOUBLE) / n2)) / (n2 - 1) / n2)
        |   * ((CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * (CAST(sx1 AS DOUBLE) / n1)) / (n1 - 1) / n1
        |    + (CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * (CAST(sx2 AS DOUBLE) / n2)) / (n2 - 1) / n2)
        |   / ((CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * (CAST(sx1 AS DOUBLE) / n1)) / (n1 - 1) / n1
        |      * ((CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * (CAST(sx1 AS DOUBLE) / n1)) / (n1 - 1) / n1)
        |      / (n1 - 1)
        |    + (CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * (CAST(sx2 AS DOUBLE) / n2)) / (n2 - 1) / n2
        |      * ((CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * (CAST(sx2 AS DOUBLE) / n2)) / (n2 - 1) / n2)
        |      / (n2 - 1)), 6) AS DOUBLE) AS df_welch
        |FROM a, b""".stripMargin,
    "q_ndcg" ->
      """WITH disc AS (
        | SELECT * FROM (VALUES (1, 1000000), (2, 630930), (3, 500000),
        |   (4, 430677), (5, 386853), (6, 356207), (7, 333333),
        |   (8, 315465), (9, 301030), (10, 289065)) AS t(pos, disc_ppm)),
        |cnts AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1),
        |graded AS (
        | SELECT c_mktsegment AS seg, c_custkey,
        |   CAST(round(c_acctbal * 100) AS BIGINT) AS bc,
        |   CAST(pow(2, least(coalesce(n_orders, 0) // 4, 3)) AS BIGINT) - 1 AS gain
        | FROM customer LEFT JOIN cnts ON c_custkey = o_custkey),
        |dcg AS (
        | SELECT seg, CAST(sum(gain * disc_ppm) AS BIGINT) AS dcg_micro
        | FROM (SELECT seg, gain, row_number() OVER
        |    (PARTITION BY seg ORDER BY bc DESC, c_custkey) AS pos FROM graded) r
        | JOIN disc USING (pos) WHERE pos <= 10 GROUP BY seg),
        |idcg AS (
        | SELECT seg, CAST(sum(gain * disc_ppm) AS BIGINT) AS idcg_micro
        | FROM (SELECT seg, gain, row_number() OVER
        |    (PARTITION BY seg ORDER BY gain DESC, c_custkey) AS pos FROM graded) r
        | JOIN disc USING (pos) WHERE pos <= 10 GROUP BY seg)
        |SELECT seg, dcg_micro, idcg_micro,
        | CAST((CAST(dcg_micro AS HUGEINT) * 1000000) // idcg_micro AS BIGINT)
        |   AS ndcg_ppm
        |FROM dcg JOIN idcg USING (seg) ORDER BY seg""".stripMargin,
    "q_brier_decomp" ->
      """WITH o AS (
        | SELECT o_orderpriority AS bin, o_orderkey,
        |   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        | FROM orders),
        |train AS (
        | SELECT bin, (sum(y) * 1000000) // count(*) AS phat_ppm
        | FROM o WHERE o_orderkey % 2 = 0 GROUP BY bin),
        |test AS (
        | SELECT bin, count(*) AS n_test, sum(y) AS y_sum,
        |   (sum(y) * 1000000) // count(*) AS ybar_ppm
        | FROM o WHERE o_orderkey % 2 = 1 GROUP BY bin),
        |gmean AS (
        | SELECT (sum(y_sum) * 1000000) // sum(n_test) AS g_ppm FROM test)
        |SELECT bin, CAST(n_test AS BIGINT) AS n_test,
        | CAST(phat_ppm AS BIGINT) AS phat_ppm,
        | CAST(ybar_ppm AS BIGINT) AS ybar_ppm,
        | CAST(g_ppm AS BIGINT) AS g_ppm,
        | CAST((phat_ppm - ybar_ppm) * (phat_ppm - ybar_ppm) AS BIGINT)
        |   AS rel_pico,
        | CAST((ybar_ppm - g_ppm) * (ybar_ppm - g_ppm) AS BIGINT) AS res_pico
        |FROM test JOIN train USING (bin), gmean ORDER BY bin""".stripMargin,
    "q_pvm_decomp" ->
      """WITH li AS (
        | SELECT p_brand AS brand, year(CAST(o_orderdate AS DATE)) AS yr,
        |   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT)
        |     AS rev_c,
        |   CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS HUGEINT) AS qty
        | FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN part ON l_partkey = p_partkey
        | WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)
        | GROUP BY 1, 2),
        |y0 AS (SELECT brand, rev_c AS rev0, qty AS q0 FROM li WHERE yr = 1995),
        |y1 AS (SELECT brand, rev_c AS rev1, qty AS q1 FROM li WHERE yr = 1996),
        |paired AS (SELECT * FROM y0 JOIN y1 USING (brand)),
        |tot AS (SELECT sum(q0) AS tq0, sum(q1) AS tq1 FROM paired),
        |eff AS (
        | SELECT brand,
        |  CAST(rev0 AS BIGINT) AS rev0_c, CAST(rev1 AS BIGINT) AS rev1_c,
        |  CAST(q0 AS BIGINT) AS q0, CAST(q1 AS BIGINT) AS q1,
        |  CAST((rev0 * (tq1 - tq0)) // tq0 AS BIGINT) AS vol_c,
        |  CAST((rev0 * q1) // q0 - (rev0 * tq1) // tq0 AS BIGINT) AS mix_c,
        |  CAST(rev1 - (rev0 * q1) // q0 AS BIGINT) AS price_c
        | FROM paired, tot)
        |SELECT brand, rev0_c, rev1_c, q0, q1, vol_c, mix_c, price_c,
        | rev1_c - rev0_c - vol_c - mix_c - price_c AS residual_c
        |FROM eff ORDER BY brand""".stripMargin,
  )
}
