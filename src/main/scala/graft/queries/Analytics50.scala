package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 32: evidence synthesis — fixed-effect inverse-variance
  * meta-analysis of per-nation segment gaps (with Cochran's Q and I²),
  * and the indirectly standardized morbidity/conversion ratio (SMR)
  * with exact integer expected counts.
  */
object Analytics50 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Fixed-effect meta-analysis: each nation contributes the
    * BUILDING−MACHINERY mean-balance gap with weight 1/SE² (pooled-
    * variance SE from exact decimal moments); outputs the pooled
    * effect, its SE, Cochran's Q and I² (6dp one-row readout built in
    * oracle-identical op order). Nations need ≥2 customers per arm.
    *
    * 100 TB shape: one (nation × segment) moment pass; the synthesis
    * runs on a ≤25-row frame. */
  val qMetaPool: Q = (s, d) => {
    val m = Tables.customer(s, d)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .groupBy(col("c_nationkey").as("nk"),
        (col("c_mktsegment") === "BUILDING").as("is_a"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DECIMAL(38,0))"
          + " * CAST(round(c_acctbal * 100) AS BIGINT)")).as("sxx"))
    val a = m.filter(col("is_a")).select(col("nk"), col("n").as("na"),
      col("sx").as("sxa"), col("sxx").as("sxxa"))
    val b = m.filter(!col("is_a")).select(col("nk"), col("n").as("nb"),
      col("sx").as("sxb"), col("sxx").as("sxxb"))
    val studies = a.join(b, "nk")
      .filter(col("na") >= 2 && col("nb") >= 2)
      .withColumn("theta", expr(
        "CAST(sxa AS DOUBLE) / na - CAST(sxb AS DOUBLE) / nb"))
      .withColumn("se2", expr(
        """((CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE) * (CAST(sxa AS DOUBLE) / na))
           + (CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE) * (CAST(sxb AS DOUBLE) / nb)))
           / (na + nb - 2) * (1.0 / na + 1.0 / nb)"""))
    // quantize RELATIVE weights (w'=10⁶·se²_min/se² ≤ 10⁶) to integers
    // BEFORE summing — a 25-study double sum is order-dependent,
    // integer sums are not; the common 1/(10⁶·se²_min) factor cancels
    // in the pooled mean and reappears once in SE and Q (deterministic
    // 1-row doubles)
    val seMin = studies.agg(min("se2").as("se2min"))
    val quant = studies.join(broadcast(seMin))
      .withColumn("wq", expr("CAST(round(1000000.0 * se2min / se2) AS BIGINT)"))
      .withColumn("wtq", expr("CAST(round(theta * (1000000.0 * se2min / se2)) AS BIGINT)"))
      .withColumn("wt2q", expr(
        "CAST(round(theta * theta * (1000000.0 * se2min / se2)) AS BIGINT)"))
    quant.agg(count(lit(1)).as("k_studies"),
        sum("wq").as("sw"), sum("wtq").as("swt"), sum("wt2q").as("swt2"),
        max("se2min").as("se2min"))
      .withColumn("q_abs", expr(
        """(swt2 - CAST(swt AS DOUBLE) * (CAST(swt AS DOUBLE) / sw))
           / (1000000.0 * se2min)"""))
      .select(col("k_studies"),
        expr("CAST(round(CAST(swt AS DOUBLE) / sw, 6) AS DOUBLE)").as("pooled_gap_c"),
        expr("CAST(round(sqrt(1000000.0 * se2min / sw), 6) AS DOUBLE)").as("pooled_se_c"),
        // + 0.0 normalizes IEEE signed zero: at degenerate SFs Q hits
        // exactly 0 and the engines disagree on -0.0 vs 0.0 (hash split)
        expr("CAST(round(q_abs, 6) + 0.0 AS DOUBLE)").as("cochran_q"),
        expr("""CAST(CASE WHEN q_abs <= 0 THEN CAST(0 AS DOUBLE)
                ELSE round(greatest(CAST(0 AS DOUBLE),
                  (q_abs - (k_studies - 1)) / q_abs), 6) END AS DOUBLE)""").as("i2"))
  }

  /** Indirectly standardized conversion ratio: does the odd-user
    * cohort purchase more than the even-user cohort would at the same
    * hour-of-day mix? Expected = Σ strata n·(reference rate), floored
    * per stratum in micro-events; SMR = observed·10⁶ div ⌊expected⌋.
    * Exact integers end to end — the epidemiology workhorse on the
    * engine's event stream.
    *
    * 100 TB shape: two (hour × cohort) censuses; the 24-row reference
    * rate frame broadcasts. */
  val qSmr: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select((col("user_id") % 2 === 1).as("cohort"),
        hour(col("ts")).cast("long").as("h"),
        (col("event_type") === "purchase").cast("long").as("y"))
    val ref = ev.filter(!col("cohort"))
      .groupBy("h").agg(sum("y").as("k0"), count(lit(1)).as("n0"))
    val coh = ev.filter(col("cohort"))
      .groupBy("h").agg(sum("y").as("obs"), count(lit(1)).as("n1"))
    coh.join(ref, "h")
      .agg(sum("obs").as("observed"),
        sum(expr(
          "CAST((CAST(n1 AS DECIMAL(38,0)) * k0 * 1000000) div n0 AS DECIMAL(38,0))"))
          .as("expected_micro"),
        count(lit(1)).as("n_strata"))
      .select(col("n_strata"), col("observed"),
        expr("expected_micro div 1000000").as("expected"),
        expr("""CAST((CAST(observed AS DECIMAL(38,0)) * 1000000000000)
                div expected_micro AS BIGINT)""").as("smr_ppm"))
  }

  val all: Map[String, Q] = Map(
    "q_meta_pool" -> qMetaPool,
    "q_smr" -> qSmr,
  )

  val oracles: Map[String, String] = Map(
    "q_meta_pool" ->
      """WITH m AS (
        | SELECT c_nationkey AS nk, c_mktsegment = 'BUILDING' AS is_a,
        |   count(*) AS n,
        |   CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS HUGEINT) AS sx,
        |   CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)
        |     * CAST(round(c_acctbal * 100) AS BIGINT)) AS HUGEINT) AS sxx
        | FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        | GROUP BY 1, 2),
        |st AS (
        | SELECT a.nk,
        |  CAST(a.sx AS DOUBLE) / a.n - CAST(b.sx AS DOUBLE) / b.n AS theta,
        |  ((CAST(a.sxx AS DOUBLE) - CAST(a.sx AS DOUBLE) * (CAST(a.sx AS DOUBLE) / a.n))
        |   + (CAST(b.sxx AS DOUBLE) - CAST(b.sx AS DOUBLE) * (CAST(b.sx AS DOUBLE) / b.n)))
        |   / (a.n + b.n - 2) * (1.0 / a.n + 1.0 / b.n) AS se2
        | FROM (SELECT * FROM m WHERE is_a) a
        | JOIN (SELECT * FROM m WHERE NOT is_a) b USING (nk)
        | WHERE a.n >= 2 AND b.n >= 2),
        |semin AS (SELECT min(se2) AS se2min FROM st),
        |qz AS (
        | SELECT CAST(round(1000000.0 * se2min / se2) AS BIGINT) AS wq,
        |   CAST(round(theta * (1000000.0 * se2min / se2)) AS BIGINT) AS wtq,
        |   CAST(round(theta * theta * (1000000.0 * se2min / se2)) AS BIGINT) AS wt2q
        | FROM st, semin),
        |agg AS (
        | SELECT count(*) AS k_studies, CAST(sum(wq) AS BIGINT) AS sw,
        |   CAST(sum(wtq) AS BIGINT) AS swt,
        |   CAST(sum(wt2q) AS BIGINT) AS swt2,
        |   any_value(se2min) AS se2min
        | FROM qz, semin),
        |fin AS (
        | SELECT k_studies, sw, swt, se2min,
        |  (swt2 - CAST(swt AS DOUBLE) * (CAST(swt AS DOUBLE) / sw))
        |    / (1000000.0 * se2min) AS q_abs
        | FROM agg)
        |SELECT CAST(k_studies AS BIGINT) AS k_studies,
        | CAST(round(CAST(swt AS DOUBLE) / sw, 6) AS DOUBLE) AS pooled_gap_c,
        | CAST(round(sqrt(1000000.0 * se2min / sw), 6) AS DOUBLE) AS pooled_se_c,
        | CAST(round(q_abs, 6) + 0.0 AS DOUBLE) AS cochran_q,
        | CAST(CASE WHEN q_abs <= 0 THEN CAST(0 AS DOUBLE)
        |  ELSE round(greatest(CAST(0 AS DOUBLE),
        |   (q_abs - (k_studies - 1)) / q_abs), 6) END AS DOUBLE) AS i2
        |FROM fin""".stripMargin,
    "q_smr" ->
      """WITH ev AS (
        | SELECT user_id % 2 = 1 AS cohort, hour(ts) AS h,
        |   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        | FROM events),
        |ref AS (
        | SELECT h, CAST(sum(y) AS BIGINT) AS k0, count(*) AS n0
        | FROM ev WHERE NOT cohort GROUP BY h),
        |coh AS (
        | SELECT h, CAST(sum(y) AS BIGINT) AS obs, count(*) AS n1
        | FROM ev WHERE cohort GROUP BY h)
        |SELECT count(*) AS n_strata, CAST(sum(obs) AS BIGINT) AS observed,
        | CAST(sum((CAST(n1 AS HUGEINT) * k0 * 1000000) // n0) // 1000000 AS BIGINT) AS expected,
        | CAST((CAST(sum(obs) AS HUGEINT) * 1000000000000)
        |   // CAST(sum((CAST(n1 AS HUGEINT) * k0 * 1000000) // n0) AS HUGEINT) AS BIGINT)
        |   AS smr_ppm
        |FROM coh JOIN ref USING (h)""".stripMargin,
  )
}
