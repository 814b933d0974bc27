package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** r7o batch — the statistical-testing and curation-policy operators a
  * large corpus pipeline runs between ingestion and training: a second
  * rank-based two-sample test (Mann–Whitney U, complementing the KS test
  * in [[Analytics5]]), multiple-testing control (Benjamini–Hochberg),
  * t-closeness privacy auditing, deterministic T5-style span-corruption
  * accounting, robust Theil–Sen trend estimation, and
  * neighborhood-overlap link prediction on the purchase graph.
  *
  * House oracle discipline throughout: every statistic is carried as
  * exact BIGINT cross-multiplied integers for as long as possible; at
  * most ONE IEEE double division/sqrt chain at report time, then
  * `round`. Ratios of exact integers are bit-identical across Spark and
  * DuckDB.
  */
object Analytics8 {
  type Q = (SparkSession, String) => DataFrame

  /** Mann–Whitney U (Wilcoxon rank-sum) over document lengths: English
    * docs vs the rest. Tie-corrected, and EXACT until the final z:
    * with per-value counts, the doubled mid-rank of the tie group at
    * value v is `2·(docs below v) + (docs at v) + 1` (always integer),
    * so the doubled rank-sum R2 and doubled U2 = R2 − n_a(n_a+1) stay
    * BIGINT. The tie-corrected variance term Σ(t³−t) is also exact; z
    * spends the one allowed double chain (σ = sqrt, one division).
    *
    * 100 TB shape: one partial-agg'd pass to per-length counts
    * (domain-bounded ~500 rows), ordered scan on that tiny frame —
    * input-scale-free, same contract as the KS query. */
  val qMannWhitney: Q = (s, d) => {
    val labeled = Tables.documents(s, d).select(
      when(col("lang") === "en", 1L).otherwise(0L).as("in_a"), col("n_chars"))
    val perValue = labeled.groupBy("n_chars")
      .agg(sum(col("in_a")).as("a_v"), count(lit(1)).as("t_v"))
    val w = Window.orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = perValue
      .withColumn("cum_t", sum("t_v").over(w))
      // doubled mid-rank of the tie block: 2*(cum_t - t_v) + t_v + 1
      .withColumn("rank2", lit(2) * (col("cum_t") - col("t_v")) + col("t_v") + 1)
    ranked
      .agg(
        sum(col("a_v") * col("rank2")).as("r2_a"),
        sum(col("a_v")).as("n_a"),
        sum(col("t_v")).as("n"),
        sum(col("t_v") * col("t_v") * col("t_v") - col("t_v")).as("tie3"))
      .select(
        col("n_a"), (col("n") - col("n_a")).as("n_b"),
        (col("r2_a") - col("n_a") * (col("n_a") + 1)).as("u2_a"),
        col("tie3"),
        round(
          // z = (U_a - n_a n_b / 2) / sqrt(var); doubled scale: numerator
          // (U2_a - n_a n_b) / 2 over sqrt of the tie-corrected variance.
          ((col("r2_a") - col("n_a") * (col("n_a") + 1) -
            col("n_a") * (col("n") - col("n_a"))).cast("double") / 2.0) /
            sqrt((col("n_a") * (col("n") - col("n_a"))).cast("double") / 12.0 *
              ((col("n") + 1).cast("double") -
                col("tie3").cast("double") / (col("n") * (col("n") - 1)))),
          4).as("z_score"))
  }

  /** Benjamini–Hochberg step-up FDR control at α=0.05: the
    * multiple-testing gate a pipeline applies over one p-value per
    * corpus slice before acting on "significant" drifts. The p-value
    * column is an exact-rational plug-in surrogate (a fixed
    * Knuth-multiplicative hash of the source id over the prime
    * 1,000,003) so the PROCEDURE itself — order statistics, the
    * step-up `max{k : p(k) ≤ kα/m}` scan, per-test discovery flags —
    * is oracle-certified end-to-end; a real deployment swaps the
    * column for upstream test output. The threshold comparison is
    * cross-multiplied to integers (`p_num·m·20 ≤ k·1000003`): no float
    * boundary anywhere.
    *
    * 100 TB shape: m = slice count (thousands at most) — the whole
    * procedure runs on an aggregate-sized frame; the only input-scale
    * work is the slice aggregation feeding it. */
  val qBhFdr: Q = (s, d) => {
    val perSource = Tables.documents(s, d)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("src_num",
        regexp_extract(col("source"), "(\\d+)", 1).cast("long"))
      .withColumn("p_num", pmod(col("src_num") * 2654435761L, lit(1000003L)))
    val m = perSource.count() // driver-side scalar: slice count, tiny by contract
    val wRank = Window.orderBy(col("p_num"), col("source"))
    val ranked = perSource
      .withColumn("k", row_number().over(wRank))
      // step-up: discovery iff k ≤ max{j : p(j)·m·20 ≤ j·1000003}
      .withColumn("passes", (col("p_num") * m * 20 <= col("k") * 1000003L).cast("long"))
    val kMax = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked
      .withColumn("k_star", max(when(col("passes") === 1, col("k"))).over(kMax))
      .select(col("source"), col("n_docs"), col("k").as("p_rank"),
        round(col("p_num").cast("double") / 1000003.0, 6).as("p_value"),
        when(col("k") <= col("k_star"), 1L).otherwise(0L).as("discovery"))
      .orderBy("p_rank")
  }

  /** t-closeness audit (Li et al., ICDE'07): for each quasi-identifier
    * group (customer nation), the Earth-Mover's Distance between the
    * group's distribution of the sensitive attribute (account-balance
    * band, ordered) and the global distribution. For an ordered
    * 1-D attribute EMD is the mean absolute cumulative-probability
    * gap — kept exact by cross-multiplication: at band b,
    * |cum_g(b)·N − cum_all(b)·n_g| summed over bands, divided once by
    * n_bands·n_g·N at report time. Groups with EMD > t=0.2 violate.
    *
    * 100 TB shape: one pass to (nation, band) counts; everything after
    * runs on |nations|×|bands| rows. */
  val qTCloseness: Q = (s, d) => {
    val banded = Tables.customer(s, d)
      .join(Tables.nation(s, d),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT) div 200000").as("band"))
    val cell = banded.groupBy("n_name", "band").agg(count(lit(1)).as("n_gb"))
    // complete the (nation × band) grid so cumulative sums align — both
    // sides are domain-bounded aggregates, so the cross join is tiny
    val grid = cell.select("n_name").distinct()
      .crossJoin(cell.select("band").distinct())
      .join(cell, Seq("n_name", "band"), "left")
      .withColumn("n_gb", coalesce(col("n_gb"), lit(0L)))
    val wCum = Window.partitionBy("n_name").orderBy("band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val global = cell.groupBy("band").agg(sum("n_gb").as("n_ab"))
      .withColumn("cum_all", sum("n_ab").over(wAll))
    val totals = cell.agg(sum("n_gb").as("n_total"),
      countDistinct("band").as("n_bands"))
    val perNation = cell.groupBy("n_name").agg(sum("n_gb").as("n_g"))
    grid
      .withColumn("cum_g", sum("n_gb").over(wCum))
      .join(global.select("band", "cum_all"), "band")
      .join(perNation, "n_name")
      .crossJoin(totals)
      .groupBy("n_name")
      .agg(max("n_g").as("n_g"), max("n_total").as("n_total"),
        max("n_bands").as("n_bands"),
        sum(abs(col("cum_g") * col("n_total") -
          col("cum_all") * col("n_g"))).as("gap_sum"))
      .select(col("n_name"), col("n_g"), col("gap_sum"),
        round(col("gap_sum").cast("double") /
          (col("n_bands") * col("n_g") * col("n_total")), 6).as("emd"),
        (col("gap_sum") * 5 > col("n_bands") * col("n_g") * col("n_total"))
          .cast("long").as("violates_t02"))
      .orderBy("n_name")
  }

  /** Deterministic T5-style span-corruption accounting over the
    * documents table: whitespace tokens are masked by an overflow-safe
    * arithmetic rule (`((doc_id mod 97)·131 + pos) mod 10 = 0` — ~10%
    * rate, identical arithmetic in any engine), and the report counts
    * tokens, masked tokens, contiguous mask SPANS (gaps-and-islands
    * over positions), and the corruption ratio per document.
    *
    * Spark side uses the distributed shape — posexplode + a
    * partitioned window — so the operator exercises the real 100 TB
    * plan (per-doc partitions, no global window); the oracle replays
    * the same rule with DuckDB list lambdas. */
  val qSpanMask: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("masked",
        (pmod((pmod(col("doc_id"), lit(97L)) * 131L + col("pos")), lit(10L)) === 0L)
          .cast("long"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    toks
      .withColumn("prev_masked", lag(col("masked"), 1, 0L).over(w))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum("masked").as("n_masked"),
        sum(when(col("masked") === 1 && col("prev_masked") === 0, 1L)
          .otherwise(0L)).as("n_spans"))
      .withColumn("mask_ratio",
        round(col("n_masked").cast("double") / col("n_tokens"), 4))
      .orderBy("doc_id")
  }

  /** Theil–Sen robust trend estimate of monthly revenue per nation:
    * the median over all month-pair slopes ((rev_j − rev_i)/(j − i)),
    * the estimator that shrugs off the outlier months a mean-square
    * fit chases. Monthly revenues are exact integer cents; each slope
    * is one IEEE division (identical in both engines since the inputs
    * are identical integers); the median interpolates the sorted
    * slopes (round 4).
    *
    * 100 TB shape: the fact aggregates to (nation × month) — ~2k rows
    * — before the O(months²) pair join, which therefore runs on an
    * aggregate-sized frame regardless of input size. */
  val qTheilSen: Q = (s, d) => {
    val monthly = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
    val a = monthly.select(col("n_name"), col("m").as("m1"), col("rev_c").as("r1"))
    val b = monthly.select(col("n_name"), col("m").as("m2"), col("rev_c").as("r2"))
    a.join(b, Seq("n_name")).filter(col("m1") < col("m2"))
      .withColumn("slope",
        (col("r2") - col("r1")).cast("double") / (col("m2") - col("m1")))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile(slope, 0.5)"), 4).as("sen_slope"))
      .orderBy("n_name")
  }

  /** Link prediction by neighborhood overlap on the customer–part
    * purchase graph: for customer pairs, the common-part count and the
    * Jaccard of their part sets — the collaborative-filtering
    * candidate-generation step. Built from the part-side inverted
    * index (the equality-join shape, never a cartesian), with a hot-
    * item cap (parts bought by > 100 customers are dropped from
    * candidate GENERATION — the standard df-cap that bounds
    * Σ|customers(part)|²; degrees still count every part). Top-100 by
    * (common, jaccard) with a deterministic tiebreak.
    *
    * 100 TB shape: candidate volume is bounded by the df cap; degrees
    * and the verify join are partial-agg'd equality joins throughout. */
  val qLinkPredict: Q = (s, d) => {
    // checkpoint: the bipartite edge list feeds the degree census, the
    // part census, and the cold-part join — each otherwise replayed
    // orders⋈lineitem + distinct (r15)
    val edges = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .distinct()
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val deg = edges.groupBy("cust").agg(count(lit(1)).as("deg"))
    val partDf = edges.groupBy("part").agg(count(lit(1)).as("n_cust"))
    val cold = edges.join(partDf.filter(col("n_cust") <= 100), Seq("part"))
    val common = cold.select(col("part"), col("cust").as("c1"))
      .join(cold.select(col("part"), col("cust").as("c2")), Seq("part"))
      .filter(col("c1") < col("c2"))
      .groupBy("c1", "c2").agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= 3)
    common
      .join(deg.select(col("cust").as("c1"), col("deg").as("deg1")), Seq("c1"))
      .join(deg.select(col("cust").as("c2"), col("deg").as("deg2")), Seq("c2"))
      .select(col("c1"), col("c2"), col("n_common"), col("deg1"), col("deg2"),
        round(col("n_common").cast("double") /
          (col("deg1") + col("deg2") - col("n_common")), 6).as("jaccard"))
      .orderBy(col("n_common").desc, col("jaccard").desc, col("c1"), col("c2"))
      .limit(100)
  }

  val all: Map[String, Q] = Map(
    "q_mann_whitney" -> qMannWhitney,
    "q_bh_fdr" -> qBhFdr,
    "q_tcloseness" -> qTCloseness,
    "q_span_mask" -> qSpanMask,
    "q_theil_sen" -> qTheilSen,
    "q_link_predict" -> qLinkPredict,
  )

  val oracles: Map[String, String] = Map(
    "q_mann_whitney" ->
      """WITH labeled AS (
        | SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS in_a, n_chars
        | FROM documents),
        |pv AS (
        | SELECT n_chars, sum(in_a) AS a_v, count(*) AS t_v
        | FROM labeled GROUP BY n_chars),
        |ranked AS (
        | SELECT a_v, t_v,
        |   2 * (sum(t_v) OVER (ORDER BY n_chars) - t_v) + t_v + 1 AS rank2
        | FROM pv),
        |agg AS (
        | SELECT sum(a_v * rank2) AS r2_a, sum(a_v) AS n_a, sum(t_v) AS n,
        |   sum(t_v * t_v * t_v - t_v) AS tie3
        | FROM ranked)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n - n_a AS BIGINT) AS n_b,
        | CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
        | CAST(tie3 AS BIGINT) AS tie3,
        | round(((r2_a - n_a * (n_a + 1) - n_a * (n - n_a)) / 2.0) /
        |   sqrt(CAST(n_a * (n - n_a) AS DOUBLE) / 12.0 *
        |     (CAST(n + 1 AS DOUBLE) - CAST(tie3 AS DOUBLE) / (n * (n - 1)))), 4)
        |   AS z_score
        |FROM agg""".stripMargin,
    "q_bh_fdr" ->
      """WITH per_source AS (
        | SELECT source, count(*) AS n_docs,
        |   CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) AS src_num
        | FROM documents GROUP BY source),
        |withp AS (
        | SELECT source, n_docs,
        |   ((src_num * 2654435761) % 1000003 + 1000003) % 1000003 AS p_num,
        |   (SELECT count(*) FROM per_source) AS m
        | FROM per_source),
        |ranked AS (
        | SELECT source, n_docs, p_num, m,
        |   row_number() OVER (ORDER BY p_num, source) AS k
        | FROM withp),
        |flagged AS (
        | SELECT *, CASE WHEN p_num * m * 20 <= k * 1000003 THEN k END AS pass_k
        | FROM ranked)
        |SELECT source, n_docs, k AS p_rank,
        | round(p_num / 1000003.0, 6) AS p_value,
        | CASE WHEN k <= max(pass_k) OVER () THEN 1 ELSE 0 END AS discovery
        |FROM flagged
        |ORDER BY p_rank""".stripMargin,
    "q_tcloseness" ->
      """WITH banded AS (
        | SELECT n_name,
        |   CAST(round(c_acctbal * 100) AS BIGINT) // 200000 AS band
        | FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |cell AS (
        | SELECT n_name, band, count(*) AS n_gb FROM banded GROUP BY n_name, band),
        |grid AS (
        | SELECT n.n_name, b.band, coalesce(c.n_gb, 0) AS n_gb
        | FROM (SELECT DISTINCT n_name FROM cell) n
        | CROSS JOIN (SELECT DISTINCT band FROM cell) b
        | LEFT JOIN cell c ON c.n_name = n.n_name AND c.band = b.band),
        |gstat AS (
        | SELECT band, sum(n_gb) AS n_ab,
        |   sum(sum(n_gb)) OVER (ORDER BY band) AS cum_all
        | FROM cell GROUP BY band),
        |tot AS (
        | SELECT sum(n_gb) AS n_total, count(DISTINCT band) AS n_bands FROM cell),
        |pern AS (SELECT n_name, sum(n_gb) AS n_g FROM cell GROUP BY n_name),
        |cum AS (
        | SELECT g.n_name, g.band,
        |   sum(g.n_gb) OVER (PARTITION BY g.n_name ORDER BY g.band) AS cum_g
        | FROM grid g)
        |SELECT c.n_name, CAST(p.n_g AS BIGINT) AS n_g,
        | CAST(sum(abs(c.cum_g * t.n_total - gl.cum_all * p.n_g)) AS BIGINT) AS gap_sum,
        | round(CAST(sum(abs(c.cum_g * t.n_total - gl.cum_all * p.n_g)) AS DOUBLE) /
        |   (t.n_bands * p.n_g * t.n_total), 6) AS emd,
        | CASE WHEN sum(abs(c.cum_g * t.n_total - gl.cum_all * p.n_g)) * 5 >
        |   t.n_bands * p.n_g * t.n_total THEN 1 ELSE 0 END AS violates_t02
        |FROM cum c JOIN gstat gl ON c.band = gl.band
        |JOIN pern p ON c.n_name = p.n_name
        |CROSS JOIN tot t
        |GROUP BY c.n_name, p.n_g, t.n_bands, t.n_total
        |ORDER BY c.n_name""".stripMargin,
    "q_span_mask" ->
      """WITH toks AS (
        | SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |masks AS (
        | SELECT doc_id, len(tk) AS n_tokens,
        |   list_transform(range(0, len(tk)),
        |     i -> CASE WHEN ((doc_id % 97) * 131 + i) % 10 = 0
        |          THEN 1 ELSE 0 END) AS mk
        | FROM toks)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        | CAST(list_sum(mk) AS BIGINT) AS n_masked,
        | CAST(list_sum(list_transform(range(0, n_tokens),
        |   i -> CASE WHEN mk[i + 1] = 1 AND (i = 0 OR mk[i] = 0)
        |        THEN 1 ELSE 0 END)) AS BIGINT) AS n_spans,
        | round(CAST(list_sum(mk) AS DOUBLE) / n_tokens, 4) AS mask_ratio
        |FROM masks
        |ORDER BY doc_id""".stripMargin,
    "q_theil_sen" ->
      """WITH monthly AS (
        | SELECT n_name,
        |   year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) AS m,
        |   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | GROUP BY n_name, m),
        |slopes AS (
        | SELECT a.n_name,
        |   CAST(b.rev_c - a.rev_c AS DOUBLE) / (b.m - a.m) AS slope
        | FROM monthly a JOIN monthly b
        |   ON a.n_name = b.n_name AND a.m < b.m)
        |SELECT n_name, count(*) AS n_pairs,
        | round(quantile_cont(slope, 0.5), 4) AS sen_slope
        |FROM slopes GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_link_predict" ->
      """WITH edges AS (
        | SELECT DISTINCT o_custkey AS cust, l_partkey AS part
        | FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |deg AS (SELECT cust, count(*) AS deg FROM edges GROUP BY cust),
        |pdf AS (SELECT part, count(*) AS n_cust FROM edges GROUP BY part),
        |cold AS (SELECT e.* FROM edges e JOIN pdf USING (part) WHERE n_cust <= 100),
        |common AS (
        | SELECT a.cust AS c1, b.cust AS c2, count(*) AS n_common
        | FROM cold a JOIN cold b ON a.part = b.part AND a.cust < b.cust
        | GROUP BY c1, c2 HAVING count(*) >= 3)
        |SELECT c1, c2, n_common, d1.deg AS deg1, d2.deg AS deg2,
        | round(CAST(n_common AS DOUBLE) / (d1.deg + d2.deg - n_common), 6) AS jaccard
        |FROM common JOIN deg d1 ON c1 = d1.cust JOIN deg d2 ON c2 = d2.cust
        |ORDER BY n_common DESC, jaccard DESC, c1, c2
        |LIMIT 100""".stripMargin,
  )
}
