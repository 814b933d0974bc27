package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r8 tail batch — four oracle-green operators closing remaining
  * inventory gaps: rank statistics (Spearman), categorical association
  * (Cramér's V), per-node graph clustering coefficient, and the
  * docs-per-domain frequency cap every C4/RefinedWeb-style web corpus
  * applies before content dedup.
  *
  * Cross-engine discipline (the r8 float-hazard lesson): every reported
  * number is either an exact integer, a division of exact integers
  * rounded where the value can never sit on a rounding midpoint, or a
  * fixed-order double formula over moments that are bit-identical in
  * both engines because they are cast from the SAME exact integers.
  */
object Analytics14 {
  type Q = (SparkSession, String) => DataFrame

  /** Spearman rank correlation between quantity and price per return
    * flag — the monotone-association statistic (robust to the price
    * column's heavy tail, unlike Pearson on raw values). Ties get
    * textbook AVERAGE ranks, carried as exact integers via
    * 2·avgrank = 2·rank_min + tie_count − 1, so the five moment sums
    * are integer-exact (DECIMAL(38,0) here, HUGEINT in DuckDB — both
    * overflow-free at any SF; a BIGINT Σx² overflows near sf1). Each
    * moment casts to double by the same round-to-nearest rule on the
    * same integer, and the Pearson-on-ranks formula is evaluated in the
    * same operation order, so both engines produce byte-identical
    * doubles before the 6dp round.
    *
    * 100 TB shape (r11 rewrite — was two full-row external sorts, the
    * repo's slowest honest n·log n at sf1): per-row ranks depend only
    * on the VALUE CENSUS, so rank assignment becomes (a) one map-side-
    * combined (flag, qty, price) joint census — the only full-input
    * shuffle, hash not sort — then (b) cumsum windows over the two
    * marginal censuses (|distinct qty| ≈ 50 rows broadcast back;
    * |distinct price| ≪ n rows), and (c) census-weighted moment sums.
    * 2·avgrank(v) = 2·cum_before(v) + count(v) + 1 — the same exact
    * integers as ranking every row, so the moments (and the oracle) are
    * unchanged. */
  val qSpearman: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
    val joint = li.groupBy("l_returnflag", "l_quantity", "l_extendedprice")
      .agg(count(lit(1)).as("c"))
    def census(valCol: String, rankCol: String) = {
      val w = Window.partitionBy("l_returnflag").orderBy(valCol)
        .rowsBetween(Window.unboundedPreceding, -1)
      joint.groupBy("l_returnflag", valCol).agg(sum("c").as("cv"))
        .withColumn(rankCol,
          (lit(2L) * coalesce(sum("cv").over(w), lit(0L)) + col("cv") + 1L)
            .cast("decimal(38,0)"))
        .drop("cv")
    }
    val ranked = joint
      .join(broadcast(census("l_quantity", "x")), Seq("l_returnflag", "l_quantity"))
      .join(census("l_extendedprice", "y"), Seq("l_returnflag", "l_extendedprice"))
    val m = ranked.groupBy("l_returnflag").agg(
      sum(col("c")).as("n_rows"),
      sum(col("x") * col("c")).as("sx"), sum(col("y") * col("c")).as("sy"),
      sum(col("x") * col("y") * col("c")).as("sxy"),
      sum(col("x") * col("x") * col("c")).as("sxx"),
      sum(col("y") * col("y") * col("c")).as("syy"))
    val n = col("n_rows").cast("double")
    def dd(c: String) = col(c).cast("double")
    m.select(
        col("l_returnflag"), col("n_rows"),
        round((n * dd("sxy") - dd("sx") * dd("sy"))
          / (sqrt(n * dd("sxx") - dd("sx") * dd("sx"))
            * sqrt(n * dd("syy") - dd("sy") * dd("sy"))), 6).as("rho"))
      .orderBy("l_returnflag")
  }

  /** Cramér's V: strength of association between order status and
    * priority from the χ² of the contingency table — the categorical
    * drift statistic (mutual information's bounded-[0,1] cousin; pairs
    * with q_chi_square, which tests ONE margin against uniform).
    * Per-cell χ² contributions are rounded at 6dp BEFORE the final sum:
    * the contributions are then 6-decimal grid values whose sum is
    * order-independent far below the rounding grain, killing the
    * engine-specific summation-order hazard on the 15-row reduce.
    *
    * 100 TB shape: one partial-aggregable count shuffle builds the
    * cells; margins and χ² are O(cells) = O(15) driver-sized frames
    * joined by broadcast. */
  val qCramersV: Q = (s, d) => {
    val cells = Tables.orders(s, d)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy("o_orderstatus").agg(sum("o").as("rt"))
    val colT = cells.groupBy("o_orderpriority").agg(sum("o").as("ct"))
    val tot = cells.agg(
      sum("o").as("n"),
      countDistinct("o_orderstatus").as("n_r"),
      countDistinct("o_orderpriority").as("n_c"))
    val e = col("rt").cast("double") * col("ct").cast("double") / col("n").cast("double")
    val contrib = cells
      .join(broadcast(rowT), "o_orderstatus")
      .join(broadcast(colT), "o_orderpriority")
      .crossJoin(broadcast(tot))
      .select(col("n"), col("n_r"), col("n_c"),
        round((col("o").cast("double") - e) * (col("o").cast("double") - e) / e, 6)
          .as("cell_chi2"))
    contrib.groupBy("n", "n_r", "n_c")
      .agg(round(sum("cell_chi2"), 6).as("chi2"))
      .select(
        col("n").as("n_rows"), col("n_r"), col("n_c"), col("chi2"),
        round(sqrt(col("chi2")
          / (col("n").cast("double") * least(col("n_r") - 1, col("n_c") - 1).cast("double"))),
          6).as("cramers_v"))
  }

  /** Local clustering coefficient per node of the co-order part graph
    * (same edge set as q_triangles: part pairs co-occurring in ≥ 2
    * orders, stored once with a<b): C(i) = 2·T(i) / (deg(i)·(deg(i)−1))
    * for deg ≥ 2 — "how clique-like is each part's neighborhood", the
    * per-node refinement of the global triangle count. Triangles are
    * enumerated once by the oriented a<b<c join chain (each triangle
    * found exactly once, wedge volume bounded by Σdeg²), then exploded
    * to their three corners for the per-node tally. The coefficient is
    * reported in exact PARTS-PER-MILLION: round(2T·10⁶ / (d·(d−1)))
    * over exact integers is deterministic across engines — any exact
    * x.5 midpoint is an exactly-representable double that both HALF_UP
    * and half-away-from-zero round up, and every non-midpoint rational
    * sits ≥ 1/(2·d·(d−1)) from the boundary, orders above double error.
    *
    * 100 TB shape: three equi-joins on part keys plus two
    * partial-aggregable counts — no all-pairs step anywhere; the
    * production variant orients edges low-degree→high-degree to bound
    * wedges by Σdeg^{3/2} (same plan, different orientation key). */
  val qClusteringCoeff: Q = (s, d) => {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pkey"))
      .distinct()
    val edges = items.as("x")
      .join(items.as("y"),
        col("x.okey") === col("y.okey") && col("x.pkey") < col("y.pkey"))
      .groupBy(col("x.pkey").as("a"), col("y.pkey").as("b"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
      .select("a", "b")
      // checkpoint: edges feeds the degree census plus THREE triangle
      // join legs — each otherwise replayed the items self-join + weight
      // agg (r15, the q_triangles fix)
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val deg = edges.select(col("a").as("node"))
      .union(edges.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val tri = edges.as("e1")
      .join(edges.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("a"), col("e1.b").as("b"), col("e2.b").as("c"))
      .as("w")
      .join(edges.as("e3"),
        col("w.a") === col("e3.a") && col("w.c") === col("e3.b"))
      .select(col("w.a").as("a"), col("w.b").as("b"), col("w.c").as("c"))
    val tpn = tri.select(col("a").as("node"))
      .union(tri.select(col("b").as("node")))
      .union(tri.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.filter(col("degree") >= 2)
      .join(tpn, Seq("node"), "left")
      .select(
        col("node").as("pkey"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        round(coalesce(col("n_tri"), lit(0L)) * lit(2000000.0)
          / (col("degree") * (col("degree") - 1)).cast("double"))
          .cast("long").as("coeff_ppm"))
      .orderBy("pkey")
  }

  /** Docs-per-domain frequency cap — the web-corpus governor applied
    * before content dedup: no single domain may contribute more than
    * CAP documents (mega-domains otherwise dominate the training mix).
    * Domains are planted deterministically from (source, doc_id) since
    * the testdata carries no URL column; kept docs are the CAP smallest
    * doc_ids per domain (a deterministic, re-run-stable policy — a
    * random cap would churn the corpus on every build), proven by the
    * kept-id checksum. Pure integer counting — exact cross-engine.
    *
    * 100 TB shape: one range-partitioned external sort under the
    * row_number window (spillable, O(1) frame state even for a
    * mega-domain), one partial-aggregable reduce. The kept-rows-only
    * production variant filters rn ≤ CAP directly, which Spark 4 plans
    * as WindowGroupLimit — a per-map-partition top-CAP that never
    * shuffles a mega-domain's long tail. */
  val qDomainCap: Q = (s, d) => {
    val cap = 8
    val docs = Tables.documents(s, d).select("doc_id", "source")
      .withColumn("domain", concat(col("source"), lit("/d"),
        (((col("doc_id") % 37) * (col("doc_id") % 37)) % 37).cast("string")))
    val w = Window.partitionBy("domain").orderBy("doc_id")
    docs.withColumn("rn", row_number().over(w))
      .groupBy("domain")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("rn") <= cap, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rn") > cap, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("rn") <= cap, col("doc_id")).otherwise(0L))
          .as("kept_id_sum"))
      .orderBy("domain")
  }

  val all: Map[String, Q] = Map(
    "q_spearman" -> qSpearman,
    "q_cramers_v" -> qCramersV,
    "q_clustering_coeff" -> qClusteringCoeff,
    "q_domain_cap" -> qDomainCap,
  )

  val oracles: Map[String, String] = Map(
    "q_spearman" ->
      """WITH r AS (
        | SELECT l_returnflag,
        |  2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
        |    + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1 AS x,
        |  2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
        |    + count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1 AS y
        | FROM lineitem),
        |m AS (
        | SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(count(*) AS DOUBLE) AS n,
        |  CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |  CAST(sum(x * y) AS DOUBLE) AS sxy,
        |  CAST(sum(x * x) AS DOUBLE) AS sxx,
        |  CAST(sum(y * y) AS DOUBLE) AS syy
        | FROM r GROUP BY l_returnflag)
        |SELECT l_returnflag, n_rows,
        | round((n * sxy - sx * sy)
        |   / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS rho
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_cramers_v" ->
      """WITH cells AS (
        | SELECT o_orderstatus, o_orderpriority, count(*) AS o
        | FROM orders GROUP BY 1, 2),
        |rt AS (SELECT o_orderstatus, sum(o) AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT o_orderpriority, sum(o) AS ct FROM cells GROUP BY 1),
        |tot AS (SELECT sum(o) AS n, count(DISTINCT o_orderstatus) AS n_r,
        |        count(DISTINCT o_orderpriority) AS n_c FROM cells),
        |contrib AS (
        | SELECT tot.n, tot.n_r, tot.n_c,
        |  round((CAST(cells.o AS DOUBLE)
        |     - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |   * (CAST(cells.o AS DOUBLE)
        |     - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |   / (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(tot.n AS DOUBLE)),
        |   6) AS cell_chi2
        | FROM cells
        | JOIN rt USING (o_orderstatus)
        | JOIN ct USING (o_orderpriority)
        | CROSS JOIN tot),
        |agg AS (
        | SELECT n, n_r, n_c, round(sum(cell_chi2), 6) AS chi2
        | FROM contrib GROUP BY n, n_r, n_c)
        |SELECT CAST(n AS BIGINT) AS n_rows,
        | CAST(n_r AS BIGINT) AS n_r, CAST(n_c AS BIGINT) AS n_c, chi2,
        | round(sqrt(chi2 / (CAST(n AS DOUBLE)
        |   * CAST(least(n_r - 1, n_c - 1) AS DOUBLE))), 6) AS cramers_v
        |FROM agg""".stripMargin,
    "q_clustering_coeff" ->
      """WITH items AS (
        | SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem),
        |edges AS (
        | SELECT x.pkey AS a, y.pkey AS b
        | FROM items x JOIN items y ON x.okey = y.okey AND x.pkey < y.pkey
        | GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (
        | SELECT node, count(*) AS degree FROM (
        |  SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)
        | GROUP BY node),
        |tri AS (
        | SELECT e1.a AS a, e1.b AS b, e2.b AS c
        | FROM edges e1
        | JOIN edges e2 ON e1.b = e2.a
        | JOIN edges e3 ON e1.a = e3.a AND e2.b = e3.b),
        |tpn AS (
        | SELECT node, count(*) AS n_tri FROM (
        |  SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri)
        | GROUP BY node)
        |SELECT d.node AS pkey, d.degree,
        | CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri,
        | CAST(round(coalesce(t.n_tri, 0) * 2000000.0
        |   / (d.degree * (d.degree - 1))) AS BIGINT) AS coeff_ppm
        |FROM deg d LEFT JOIN tpn t ON d.node = t.node
        |WHERE d.degree >= 2
        |ORDER BY pkey""".stripMargin,
    "q_domain_cap" ->
      """WITH ranked AS (
        | SELECT doc_id,
        |  source || '/d'
        |    || CAST(((doc_id % 37) * (doc_id % 37)) % 37 AS VARCHAR) AS domain,
        |  row_number() OVER (
        |    PARTITION BY source || '/d'
        |      || CAST(((doc_id % 37) * (doc_id % 37)) % 37 AS VARCHAR)
        |    ORDER BY doc_id) AS rn
        | FROM documents)
        |SELECT domain, count(*) AS n_docs,
        | CAST(sum(CASE WHEN rn <= 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | CAST(sum(CASE WHEN rn > 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        | CAST(sum(CASE WHEN rn <= 8 THEN doc_id ELSE 0 END) AS BIGINT)
        |   AS kept_id_sum
        |FROM ranked GROUP BY domain ORDER BY domain""".stripMargin,
  )
}
