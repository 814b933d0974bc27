package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 15: operations-analytics flagships — an actuarial
  * chain-ladder development triangle, FIFO lot matching as an
  * interval-overlap join, ABC/XYZ inventory classification, the
  * standardized effect-size family, and source-similarity as a
  * sparse matrix product. Integer cents/ppm everywhere; the only
  * doubles are 6dp one-row readouts from exact moments (q_spearman
  * discipline).
  */
object Analytics33 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Chain-ladder development triangle: revenue by order month,
    * developed by ship-lag months k=0..5, with the volume-weighted
    * development factors f_k = ΣᵢC(i,k+1)·10⁶ div ΣᵢC(i,k) over the
    * accident months that are FULLY OBSERVED at k+1 (the standard
    * triangle restriction — no partial diagonals). All integer cents;
    * cumulation is a bounded window over the |months|×6 frame.
    *
    * 100 TB shape: fact → (month, lag) census (≤|months|·6 rows) in
    * one partial agg; everything after is frame-sized. */
  val qLossTriangle: Q = (s, d) => {
    val cells = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(
        expr("CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT)")
          .as("om"),
        expr("""CAST(year(CAST(l_shipdate AS DATE)) * 12 + month(CAST(l_shipdate AS DATE)) - 1 AS BIGINT)
                - CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT)""")
          .as("lag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("rc"))
      .filter(col("lag") >= 0 && col("lag") <= 5)
      .groupBy("om", "lag").agg(sum("rc").as("inc_c"))
    val wCum = Window.partitionBy("om").orderBy("lag")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = cells.withColumn("cum_c", sum("inc_c").over(wCum))
    val maxOm = cum.agg(max("om").as("t_max"))
    // factor rows: for k = 0..4, months fully observed at k+1
    val k = cum.join(broadcast(maxOm))
      .filter(col("lag") <= 4 && col("om") + col("lag") + 1 <= col("t_max"))
      .select(col("om"), col("lag").as("k"), col("cum_c"))
    val k1 = cum.select(col("om"), (col("lag") - 1).as("k"), col("cum_c").as("cum1_c"))
    k.join(k1, Seq("om", "k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_months"),
        sum("cum_c").as("c_k"), sum("cum1_c").as("c_k1"))
      .withColumn("factor_ppm",
        expr("CAST((CAST(c_k1 AS DECIMAL(38,0)) * 1000000) div c_k AS BIGINT)"))
      .orderBy("k")
  }

  /** FIFO lot matching as an interval-overlap join: per part, odd
    * line numbers are receipts and even ones issues, each stream
    * cumulated (in ship-date order) into quantity intervals
    * [cum−q, cum); FIFO allocation is exactly the interval
    * intersection, so the match is ONE range self-join — no loops, no
    * per-row state. Reports per brand: matched units, pair count, and
    * the quantity-weighted issue−receipt age in unit-days (the FIFO
    * inventory-age readout). Identity (asserted in the spec): matched
    * units per part = min(Σreceipts, Σissues).
    *
    * 100 TB shape: the cumsum windows partition by part (parallel,
    * bounded frames); the overlap join is part-local and its output is
    * linear — a FIFO chain of r receipts and s issues intersects in at
    * most r+s−1 pairs. */
  val qFifoMatch: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey").as("pk"), col("l_linenumber").as("ln"),
        col("l_orderkey").as("ok"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS BIGINT)").as("sd"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("q"))
    val wS = Window.partitionBy("pk").orderBy("sd", "ok", "ln")
    def stream(parity: Int) = li.filter(col("ln") % 2 === parity)
      .withColumn("hi", sum("q").over(wS))
      .withColumn("lo", col("hi") - col("q"))
    val rec = stream(1).select(col("pk"), col("lo").as("r_lo"),
      col("hi").as("r_hi"), col("sd").as("r_sd"))
    val iss = stream(0).select(col("pk"), col("lo").as("i_lo"),
      col("hi").as("i_hi"), col("sd").as("i_sd"))
    val pairs = rec.join(iss, Seq("pk"))
      .filter(col("r_lo") < col("i_hi") && col("i_lo") < col("r_hi"))
      .select(col("pk"),
        (least(col("r_hi"), col("i_hi")) - greatest(col("r_lo"), col("i_lo")))
          .as("m_q"),
        (col("i_sd") - col("r_sd")).as("age_d"))
    pairs.join(broadcast(Tables.part(s, d)), col("pk") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n_pairs"), sum("m_q").as("matched_q"),
        sum(col("m_q") * col("age_d")).as("age_qty_days"))
      .orderBy("brand")
  }

  /** ABC/XYZ inventory matrix: parts classed A/B/C by cumulative
    * revenue share (≤80%, ≤95%, rest — strictly-before cum share, the
    * q_pareto convention) and X/Y/Z by demand volatility (cv² of
    * monthly revenue: ≤0.25, ≤1.0, rest — cv² kept as an EXACT ppm
    * rational (n·Σx²−(Σx)²)·10⁶ div ((n−1)·(Σx)²/n)… computed as the
    * variance-to-mean² ratio in one integer division). Emits the 3×3
    * census with revenue shares in ppm.
    *
    * 100 TB shape: two part-keyed partial aggs + one |parts| rank
    * window (range-partitioned); the census is 9 rows. */
  val qAbcXyz: Q = (s, d) => {
    val monthly = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_partkey").as("pk"),
        expr("CAST(year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) AS BIGINT)")
          .as("m"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("mc"))
    val perPart = monthly.groupBy("pk")
      .agg(sum("mc").as("rev_c"), count(lit(1)).as("n_m"),
        sum(expr("CAST(mc AS DECIMAL(38,0)) * mc")).as("smm"))
      // cv² ppm = ((n·Σx² − (Σx)²)·n·10⁶) div ((n−1)·(Σx)²); n_m=1 → 0
      .withColumn("cv2_ppm", expr(
        """CASE WHEN n_m = 1 THEN CAST(0 AS BIGINT)
           ELSE CAST(((n_m * smm - CAST(rev_c AS DECIMAL(38,0)) * rev_c) * n_m * 1000000)
                div ((n_m - 1) * CAST(rev_c AS DECIMAL(38,0)) * rev_c) AS BIGINT) END"""))
    val wCum = Window.orderBy(col("rev_c").desc, col("pk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = perPart.agg(sum("rev_c").as("tot_c"))
    val classed = perPart.join(broadcast(tot))
      .withColumn("cum_before", coalesce(sum("rev_c").over(wCum), lit(0L)))
      .withColumn("abc", expr(
        """CASE WHEN cum_before * 5 < tot_c * 4 THEN 'A'
           WHEN cum_before * 20 < tot_c * 19 THEN 'B' ELSE 'C' END"""))
      .withColumn("xyz", expr(
        """CASE WHEN cv2_ppm <= 250000 THEN 'X'
           WHEN cv2_ppm <= 1000000 THEN 'Y' ELSE 'Z' END"""))
    classed.groupBy("abc", "xyz")
      .agg(count(lit(1)).as("n_parts"), sum("rev_c").as("rev_c"))
      .join(broadcast(tot))
      .withColumn("share_ppm",
        expr("CAST((CAST(rev_c AS DECIMAL(38,0)) * 1000000) div tot_c AS BIGINT)"))
      .select("abc", "xyz", "n_parts", "rev_c", "share_ppm")
      .orderBy("abc", "xyz")
  }

  /** Standardized effect sizes for the BUILDING vs MACHINERY balance
    * contrast (the q_welch_ttest pairing): Cohen's d from the pooled
    * SD, Hedges' g via the exact-rational small-sample factor
    * 1 − 3/(4(n₁+n₂)−9) (no gamma function), and the rank-biserial
    * correlation from the EXACT integer Mann–Whitney 2U built on the
    * value census — rb_ppm = (2U − nm)·10⁶ div (nm).
    *
    * 100 TB shape: one moment pass + one value-census pass; both
    * partial-aggregable. */
  val qEffectSizes: Q = (s, d) => {
    val bal = Tables.customer(s, d)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select((col("c_mktsegment") === "BUILDING").as("is_a"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bc"))
    val census = bal.groupBy("bc")
      .agg(sum(col("is_a").cast("long")).as("ca"),
        sum((!col("is_a")).cast("long")).as("cb"))
    val wv = Window.orderBy("bc").rowsBetween(Window.unboundedPreceding, -1)
    val u2 = census
      .withColumn("b_before", coalesce(sum("cb").over(wv), lit(0L)))
      .agg(sum(expr("CAST(ca AS DECIMAL(38,0)) * (2 * b_before + cb)")).as("u2"),
        sum("ca").as("n1"), sum("cb").as("n2"))
    val m = bal.groupBy("is_a")
      .agg(count(lit(1)).as("n"),
        sum(col("bc").cast("decimal(38,0)")).as("sx"),
        sum(expr("CAST(bc AS DECIMAL(38,0)) * bc")).as("sxx"))
    val a = m.filter(col("is_a")).select(col("n").as("na"), col("sx").as("sxa"),
      col("sxx").as("sxxa"))
    val b = m.filter(!col("is_a")).select(col("n").as("nb"), col("sx").as("sxb"),
      col("sxx").as("sxxb"))
    val dExpr =
      """((CAST(sxa AS DOUBLE) / na - CAST(sxb AS DOUBLE) / nb)
         / sqrt(((CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE) * (CAST(sxa AS DOUBLE) / na))
               + (CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE) * (CAST(sxb AS DOUBLE) / nb)))
              / (na + nb - 2)))""".stripMargin.replace("\n", " ")
    a.join(broadcast(b)).join(broadcast(u2))
      .select(col("na"), col("nb"),
        expr(s"CAST(round($dExpr, 6) AS DOUBLE)").as("cohen_d"),
        expr(s"""CAST(round($dExpr * (1 - CAST(3 AS DOUBLE) / (4 * (na + nb) - 9)), 6)
                AS DOUBLE)""").as("hedges_g"),
        expr("""CAST(((u2 - CAST(n1 AS DECIMAL(38,0)) * n2) * 1000000)
                div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)""")
          .as("rank_biserial_ppm"))
  }

  /** Source-to-source cosine similarity as a SPARSE MATRIX PRODUCT:
    * tf vectors meet only on shared tokens (token-keyed equi-join of
    * the census with itself — the AᵀA pattern), dot products stay
    * exact DECIMAL integers, and the 190-row readout divides by the
    * sqrt norms once (6dp). The dense-pair complement of
    * q_source_vocab_overlap's set Jaccard.
    *
    * 100 TB shape: cost is Σ_w |sources(w)|² with |sources(w)| ≤ 20 —
    * linear in vocabulary; norms are a 20-row agg. */
  val qSourceCosine: Q = (s, d) => {
    val cnt = Tables.documents(s, d)
      .select(col("source"), explode(graft.text.TextFunctions.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val norms = cnt.groupBy("source")
      .agg(sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("nrm2"))
    val dots = cnt.as("a").join(cnt.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
      .agg(sum(expr("CAST(a.c AS DECIMAL(38,0)) * b.c")).as("dot"))
    dots
      .join(norms.select(col("source").as("s1"), col("nrm2").as("n1")), "s1")
      .join(norms.select(col("source").as("s2"), col("nrm2").as("n2")), "s2")
      .select(col("s1"), col("s2"),
        expr("""CAST(round(CAST(dot AS DOUBLE)
                / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))), 6) AS DOUBLE)""")
          .as("cosine"))
      .orderBy("s1", "s2")
  }

  val all: Map[String, Q] = Map(
    "q_loss_triangle" -> qLossTriangle,
    "q_fifo_match" -> qFifoMatch,
    "q_abc_xyz" -> qAbcXyz,
    "q_effect_sizes" -> qEffectSizes,
    "q_source_cosine" -> qSourceCosine,
  )

  val oracles: Map[String, String] = Map(
    "q_loss_triangle" ->
      """WITH cells AS (
        | SELECT CAST(year(CAST(o_orderdate AS DATE)) * 12
        |     + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS om,
        |   CAST(year(CAST(l_shipdate AS DATE)) * 12
        |     + month(CAST(l_shipdate AS DATE)) - 1 AS BIGINT)
        |   - CAST(year(CAST(o_orderdate AS DATE)) * 12
        |     + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS lag,
        |   CAST(round(l_extendedprice * 100) AS BIGINT) AS rc
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |g AS (
        | SELECT om, lag, CAST(sum(rc) AS BIGINT) AS inc_c
        | FROM cells WHERE lag BETWEEN 0 AND 5 GROUP BY 1, 2),
        |cum AS (
        | SELECT om, lag,
        |   sum(inc_c) OVER (PARTITION BY om ORDER BY lag
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c
        | FROM g),
        |tm AS (SELECT max(om) AS t_max FROM cum),
        |k AS (
        | SELECT om, lag AS k, cum_c FROM cum, tm
        | WHERE lag <= 4 AND om + lag + 1 <= t_max),
        |k1 AS (SELECT om, lag - 1 AS k, cum_c AS cum1_c FROM cum)
        |SELECT k, count(*) AS n_months,
        | CAST(sum(cum_c) AS BIGINT) AS c_k, CAST(sum(cum1_c) AS BIGINT) AS c_k1,
        | CAST((CAST(sum(cum1_c) AS HUGEINT) * 1000000) // sum(cum_c) AS BIGINT)
        |   AS factor_ppm
        |FROM k JOIN k1 USING (om, k)
        |GROUP BY k ORDER BY k""".stripMargin,
    "q_fifo_match" ->
      """WITH li AS (
        | SELECT l_partkey AS pk, l_linenumber AS ln, l_orderkey AS ok,
        |   date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS sd,
        |   CAST(round(l_quantity) AS BIGINT) AS q
        | FROM lineitem),
        |rec AS (
        | SELECT pk, sd AS r_sd,
        |   sum(q) OVER (PARTITION BY pk ORDER BY sd, ok, ln
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r_hi,
        |   sum(q) OVER (PARTITION BY pk ORDER BY sd, ok, ln
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - q AS r_lo
        | FROM li WHERE ln % 2 = 1),
        |iss AS (
        | SELECT pk, sd AS i_sd,
        |   sum(q) OVER (PARTITION BY pk ORDER BY sd, ok, ln
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS i_hi,
        |   sum(q) OVER (PARTITION BY pk ORDER BY sd, ok, ln
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - q AS i_lo
        | FROM li WHERE ln % 2 = 0),
        |pairs AS (
        | SELECT r.pk,
        |   least(r_hi, i_hi) - greatest(r_lo, i_lo) AS m_q,
        |   i_sd - r_sd AS age_d
        | FROM rec r JOIN iss i ON r.pk = i.pk
        | WHERE r_lo < i_hi AND i_lo < r_hi)
        |SELECT p_brand AS brand, count(*) AS n_pairs,
        | CAST(sum(m_q) AS BIGINT) AS matched_q,
        | CAST(sum(m_q * age_d) AS BIGINT) AS age_qty_days
        |FROM pairs JOIN part ON pk = p_partkey
        |GROUP BY 1 ORDER BY brand""".stripMargin,
    "q_abc_xyz" ->
      """WITH monthly AS (
        | SELECT l_partkey AS pk,
        |   CAST(year(CAST(o_orderdate AS DATE)) * 12
        |     + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS m,
        |   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS mc
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | GROUP BY 1, 2),
        |pp AS (
        | SELECT pk, CAST(sum(mc) AS BIGINT) AS rev_c, count(*) AS n_m,
        |   CAST(sum(CAST(mc AS HUGEINT) * mc) AS HUGEINT) AS smm
        | FROM monthly GROUP BY pk),
        |cls AS (
        | SELECT pk, rev_c, n_m,
        |  CASE WHEN n_m = 1 THEN CAST(0 AS BIGINT)
        |   ELSE CAST(((n_m * smm - CAST(rev_c AS HUGEINT) * rev_c) * n_m * 1000000)
        |        // ((n_m - 1) * CAST(rev_c AS HUGEINT) * rev_c) AS BIGINT) END AS cv2_ppm,
        |  coalesce(sum(rev_c) OVER (ORDER BY rev_c DESC, pk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
        |  sum(rev_c) OVER () AS tot_c
        | FROM pp),
        |lab AS (
        | SELECT rev_c,
        |  CASE WHEN cum_before * 5 < tot_c * 4 THEN 'A'
        |   WHEN cum_before * 20 < tot_c * 19 THEN 'B' ELSE 'C' END AS abc,
        |  CASE WHEN cv2_ppm <= 250000 THEN 'X'
        |   WHEN cv2_ppm <= 1000000 THEN 'Y' ELSE 'Z' END AS xyz,
        |  tot_c
        | FROM cls)
        |SELECT abc, xyz, count(*) AS n_parts, CAST(sum(rev_c) AS BIGINT) AS rev_c,
        | CAST((CAST(sum(rev_c) AS HUGEINT) * 1000000) // any_value(tot_c) AS BIGINT)
        |   AS share_ppm
        |FROM lab GROUP BY 1, 2 ORDER BY abc, xyz""".stripMargin,
    "q_effect_sizes" ->
      """WITH bal AS (
        | SELECT c_mktsegment = 'BUILDING' AS is_a,
        |   CAST(round(c_acctbal * 100) AS BIGINT) AS bc
        | FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |census AS (
        | SELECT bc, sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
        |   sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS cb
        | FROM bal GROUP BY bc),
        |u AS (
        | SELECT CAST(sum(CAST(ca AS HUGEINT) * (2 * coalesce(bb, 0) + cb)) AS HUGEINT) AS u2,
        |   CAST(sum(ca) AS HUGEINT) AS n1, CAST(sum(cb) AS HUGEINT) AS n2
        | FROM (SELECT ca, cb,
        |    sum(cb) OVER (ORDER BY bc ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING) AS bb
        |   FROM census) t),
        |m AS (
        | SELECT is_a, count(*) AS n,
        |   CAST(sum(bc) AS HUGEINT) AS sx, CAST(sum(bc * bc) AS HUGEINT) AS sxx
        | FROM bal GROUP BY is_a),
        |a AS (SELECT n AS na, sx AS sxa, sxx AS sxxa FROM m WHERE is_a),
        |b AS (SELECT n AS nb, sx AS sxb, sxx AS sxxb FROM m WHERE NOT is_a)
        |SELECT na, nb,
        | CAST(round(((CAST(sxa AS DOUBLE) / na - CAST(sxb AS DOUBLE) / nb) / sqrt(((CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE) * (CAST(sxa AS DOUBLE) / na)) + (CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE) * (CAST(sxb AS DOUBLE) / nb))) / (na + nb - 2))), 6) AS DOUBLE) AS cohen_d,
        | CAST(round(((CAST(sxa AS DOUBLE) / na - CAST(sxb AS DOUBLE) / nb) / sqrt(((CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE) * (CAST(sxa AS DOUBLE) / na)) + (CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE) * (CAST(sxb AS DOUBLE) / nb))) / (na + nb - 2))) * (1 - CAST(3 AS DOUBLE) / (4 * (na + nb) - 9)), 6) AS DOUBLE) AS hedges_g,
        | CAST(((u2 - n1 * n2) * 1000000) // (n1 * n2) AS BIGINT)
        |   AS rank_biserial_ppm
        |FROM a CROSS JOIN b CROSS JOIN u""".stripMargin,
    "q_source_cosine" ->
      """WITH cnt AS (
        | SELECT source, w, count(*) AS c
        | FROM (SELECT source,
        |         unnest(string_split_regex(trim(text), '\s+')) AS w
        |       FROM documents) u
        | WHERE length(w) > 0 GROUP BY 1, 2),
        |norms AS (
        | SELECT source, CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS nrm2
        | FROM cnt GROUP BY source),
        |dots AS (
        | SELECT a.source AS s1, b.source AS s2,
        |   CAST(sum(CAST(a.c AS HUGEINT) * b.c) AS HUGEINT) AS dot
        | FROM cnt a JOIN cnt b ON a.w = b.w AND a.source < b.source
        | GROUP BY 1, 2)
        |SELECT s1, s2,
        | CAST(round(CAST(dot AS DOUBLE)
        |   / (sqrt(CAST(n1.nrm2 AS DOUBLE)) * sqrt(CAST(n2.nrm2 AS DOUBLE))), 6)
        |   AS DOUBLE) AS cosine
        |FROM dots
        |JOIN norms n1 ON n1.source = s1
        |JOIN norms n2 ON n2.source = s2
        |ORDER BY s1, s2""".stripMargin,
  )
}
