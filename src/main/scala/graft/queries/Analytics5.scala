package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** r7f batch — statistical comparison and model-evaluation operators:
  * two-sample Kolmogorov–Smirnov (integer-exact D), degree
  * assortativity of the co-purchase graph, and the classifier
  * evaluation report (exact tie-corrected AUC + calibration deciles)
  * for the learned quality gate.
  */
object Analytics5 {
  type Q = (SparkSession, String) => DataFrame

  /** Two-sample Kolmogorov–Smirnov over document lengths: corpus A
    * (single-digit sources, src0–src9) vs corpus B (the rest) — the
    * distribution-equality test a curation pipeline runs before mixing
    * feeds. D is kept EXACT by cross-multiplication: at every distinct
    * length v, |cum_A(v)·n_B − cum_B(v)·n_A| over the common
    * denominator n_A·n_B — no float CDFs; the classical α=0.05
    * threshold 1.358·√((n_A+n_B)/(n_A·n_B)) is evaluated once at report
    * time.
    *
    * 100 TB shape: one partial-agg'd pass to per-(value) counts; the
    * ordered scan runs on the |distinct lengths| frame (domain-bounded,
    * ~500 rows) — input-scale-free. */
  val qKsTest: Q = (s, d) => {
    val labeled = Tables.documents(s, d).select(
      when(length(col("source")) === 4, 1L).otherwise(0L).as("in_a"),
      col("n_chars"))
    val perValue = labeled.groupBy("n_chars")
      .agg(sum(col("in_a")).as("a_v"), sum(lit(1L) - col("in_a")).as("b_v"))
    val w = Window.orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = perValue
      .withColumn("cum_a", sum("a_v").over(w))
      .withColumn("cum_b", sum("b_v").over(w))
      .crossJoin(labeled.agg(sum("in_a").as("n_a"),
        (count(lit(1)) - sum("in_a")).as("n_b")))
      .withColumn("gap", abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
    curve.groupBy("n_a", "n_b")
      .agg(max("gap").as("d_scaled"))
      .select(col("n_a"), col("n_b"), col("d_scaled"),
        expr("(d_scaled * 1000L) div (n_a * n_b)").as("d_milli"),
        round(lit(1.358) * sqrt((col("n_a") + col("n_b")).cast("double") /
          (col("n_a") * col("n_b"))), 6).as("crit_005"),
        (col("d_scaled").cast("double") / (col("n_a") * col("n_b")) >
          lit(1.358) * sqrt((col("n_a") + col("n_b")).cast("double") /
            (col("n_a") * col("n_b")))).cast("long").as("significant"))
  }

  /** Degree assortativity of the bipartite co-purchase graph: every
    * lineitem is an (order, part) edge; the report is the Pearson
    * correlation, over edges, between the order's degree and the part's
    * degree — positive means big orders disproportionately touch
    * popular parts (the hub-hub mixing that shapes partition skew).
    * All five moments are exact BIGINTs; one double division at the
    * end (round 6).
    *
    * 100 TB shape: two partial-agg'd degree passes, two equality joins
    * back onto the edge list (shuffle on the natural keys), one scalar
    * agg — no adjacency materialization beyond the edge list itself. */
  val qAssortativity: Q = (s, d) => {
    val edges = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
    val degO = edges.groupBy("l_orderkey").agg(count(lit(1)).as("deg_o"))
    val degP = edges.groupBy("l_partkey").agg(count(lit(1)).as("deg_p"))
    edges.join(degO, "l_orderkey").join(degP, "l_partkey")
      .agg(count(lit(1)).as("n_edges"),
        sum("deg_o").as("sx"), sum("deg_p").as("sy"),
        sum(col("deg_o") * col("deg_p")).as("sxy"),
        sum(col("deg_o") * col("deg_o")).as("sxx"),
        sum(col("deg_p") * col("deg_p")).as("syy"))
      .select(col("n_edges"), col("sx"), col("sy"),
        round((col("n_edges") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n_edges") * col("sxx") - col("sx") * col("sx")).cast("double")) *
           sqrt((col("n_edges") * col("syy") - col("sy") * col("sy")).cast("double"))), 6)
          .as("assortativity"))
  }

  /** Evaluation report for the learned quality gate
    * ([[graft.ml.QualityClassifier]]): exact tie-corrected AUC (the
    * Mann–Whitney rank form — average ranks over score ties, so equal
    * scores contribute 1/2) plus a 10-bucket calibration table
    * (predicted-probability decile → observed rule-label rate, integer
    * milli units). Rows-only (LBFGS weights aren't SQL-portable);
    * Analytics5Spec replays AUC and calibration from the scored frame.
    *
    * AUC ranks on the probability QUANTIZED to 4 decimals — that bounds
    * the ordered rank scan to ≤10⁴+1 distinct values at ANY input size
    * (raw LR scores are all-distinct, which would make the scan frame
    * data-sized); ties introduced by quantization get the standard 1/2
    * credit, so the reported AUC is exactly "AUC at 10⁻⁴ score
    * resolution" — the deterministic contract the spec replays.
    *
    * 100 TB shape: ranks via one groupBy-quantized-score + ordered scan
    * over the ≤10⁴-row frame; calibration is a partial-aggregable
    * bucket agg. */
  val qClassifierEval: Q = (s, d) => {
    import graft.ml.QualityClassifier
    val feat = QualityClassifier.featurize(Tables.documents(s, d))
    val scored = QualityClassifier.score(QualityClassifier.fit(feat), feat)
      .select(col("doc_id"), col("quality_score").as("p"), col("label"))
      .withColumn("pq", round(col("p"), 4))
    // average rank per distinct quantized score: cum count up to the
    // previous distinct score + (tied_count + 1)/2 — tie-corrected MW
    val perScore = scored.groupBy("pq")
      .agg(count(lit(1)).as("c"), sum("label").cast("long").as("pos_c"))
    val w = Window.orderBy("pq").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perScore
      .withColumn("below", coalesce(sum("c").over(w), lit(0L)))
      .withColumn("rank_avg2", lit(2L) * col("below") + col("c") + 1L) // 2·avg rank
    val auc = ranked
      .crossJoin(scored.agg(sum("label").cast("long").as("n_pos"),
        (count(lit(1)) - sum("label")).cast("long").as("n_neg")))
      .agg(first("n_pos").as("n_pos"), first("n_neg").as("n_neg"),
        sum(col("pos_c") * col("rank_avg2")).as("rank_sum2"))
      .select(col("n_pos"), col("n_neg"),
        round((col("rank_sum2").cast("double") / 2.0 -
          col("n_pos").cast("double") * (col("n_pos") + 1L) / 2.0) /
          (col("n_pos").cast("double") * col("n_neg")), 6).as("auc"))
    val calib = scored
      .withColumn("bucket", least(floor(col("p") * 10).cast("long"), lit(9L)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        expr("CAST(round(avg(p) * 1000) AS BIGINT)").as("mean_pred_milli"),
        expr("(CAST(sum(label) AS BIGINT) * 1000) div count(1)").as("label_rate_milli"))
    calib.crossJoin(auc).orderBy("bucket")
  }

  /** word2vec-style negative-sampling table: the top-50 corpus tokens
    * with their count^0.75 sampling weights — the unigram-smoothing
    * table a skip-gram trainer draws negatives from. The ¾ power is
    * computed as sqrt(sqrt(count³)): both sqrt and small-integer cubes
    * are IEEE-exact in every engine (pow()'s libm ulps are NOT — the
    * repo's float discipline), so the quantized weight is bit-portable.
    *
    * 100 TB shape: one token-count agg (partial-agg'd) +
    * TakeOrderedAndProject; per-row math only. */
  val qNegativeSampling: Q = (s, d) => {
    Tables.documents(s, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .withColumn("weight_q",
        floor(sqrt(sqrt((col("cnt") * col("cnt") * col("cnt")).cast("double"))) *
          lit(1000.0)).cast("long"))
      .withColumn("uniform_boost_milli",
        expr("(weight_q * 1000L) div (cnt * 1000L)"))
      .orderBy(col("cnt").desc, col("token")).limit(50)
  }

  /** Wilson-score ranking of event types by high-value rate — ranking
    * under uncertainty: the lower bound of the 95% Wilson interval for
    * P(value > 100) demotes small-sample categories a raw rate would
    * overrank. sqrt-only arithmetic (IEEE-exact cross-engine), one
    * double division chain per row, round 6.
    *
    * 100 TB shape: one conditional-sum agg to |event types| rows;
    * everything after is per-row on a 5-row frame. */
  val qWilsonRank: Q = (s, d) => {
    val z = 1.96
    val agg = Tables.events(s, d).groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") > 100, 1L).otherwise(0L)).as("pos"))
    agg
      .withColumn("p", col("pos").cast("double") / col("n"))
      .withColumn("wilson_lo", round(
        (col("p") + lit(z * z) / (col("n") * 2) -
          lit(z) * sqrt((col("p") * (lit(1.0) - col("p")) +
            lit(z * z) / (col("n") * 4)) / col("n"))) /
          (lit(1.0) + lit(z * z) / col("n")), 6))
      .select(col("event_type"), col("n"), col("pos"),
        round(col("p"), 6).as("rate"), col("wilson_lo"))
      .orderBy(col("wilson_lo").desc, col("event_type"))
  }

  val all: Map[String, Q] = Map(
    "q_ks_test" -> qKsTest,
    "q_assortativity" -> qAssortativity,
    "q_classifier_eval" -> qClassifierEval,
    "q_negative_sampling" -> qNegativeSampling,
    "q_wilson_rank" -> qWilsonRank,
  )

  val oracles: Map[String, String] = Map(
    "q_ks_test" ->
      """WITH labeled AS (
        | SELECT CAST(len(source) = 4 AS BIGINT) AS in_a, n_chars FROM documents),
        |pv AS (
        | SELECT n_chars, CAST(sum(in_a) AS BIGINT) AS a_v,
        |  CAST(sum(1 - in_a) AS BIGINT) AS b_v
        | FROM labeled GROUP BY n_chars),
        |tot AS (
        | SELECT CAST(sum(in_a) AS BIGINT) AS n_a,
        |  CAST(count(*) - sum(in_a) AS BIGINT) AS n_b
        | FROM labeled),
        |curve AS (
        | SELECT
        |  CAST(sum(a_v) OVER (ORDER BY n_chars
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
        |  CAST(sum(b_v) OVER (ORDER BY n_chars
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b
        | FROM pv),
        |g AS (
        | SELECT n_a, n_b, max(abs(cum_a * n_b - cum_b * n_a)) AS d_scaled
        | FROM curve CROSS JOIN tot GROUP BY n_a, n_b)
        |SELECT n_a, n_b, CAST(d_scaled AS BIGINT) AS d_scaled,
        | (d_scaled * 1000) // (n_a * n_b) AS d_milli,
        | round(1.358 * sqrt(CAST(n_a + n_b AS DOUBLE) / (n_a * n_b)), 6) AS crit_005,
        | CAST(CAST(d_scaled AS DOUBLE) / (n_a * n_b) >
        |      1.358 * sqrt(CAST(n_a + n_b AS DOUBLE) / (n_a * n_b)) AS BIGINT)
        |   AS significant
        |FROM g""".stripMargin,
    "q_negative_sampling" ->
      """WITH tc AS (
        | SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        | FROM documents),
        |c AS (SELECT token, count(*) AS cnt FROM tc GROUP BY token)
        |SELECT token, cnt,
        | CAST(floor(sqrt(sqrt(CAST(cnt * cnt * cnt AS DOUBLE))) * 1000.0) AS BIGINT)
        |   AS weight_q,
        | (CAST(floor(sqrt(sqrt(CAST(cnt * cnt * cnt AS DOUBLE))) * 1000.0) AS BIGINT)
        |   * 1000) // (cnt * 1000) AS uniform_boost_milli
        |FROM c ORDER BY cnt DESC, token LIMIT 50""".stripMargin,
    "q_wilson_rank" ->
      """WITH a AS (
        | SELECT event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS pos
        | FROM events GROUP BY event_type),
        |w AS (
        | SELECT event_type, n, pos, CAST(pos AS DOUBLE) / n AS p FROM a)
        |SELECT event_type, n, pos, round(p, 6) AS rate,
        | round((p + (1.96 * 1.96) / (n * 2) -
        |   1.96 * sqrt((p * (1.0 - p) + (1.96 * 1.96) / (n * 4)) / n)) /
        |  (1.0 + (1.96 * 1.96) / n), 6) AS wilson_lo
        |FROM w ORDER BY wilson_lo DESC, event_type""".stripMargin,
    "q_assortativity" ->
      """WITH e AS (SELECT l_orderkey, l_partkey FROM lineitem),
        |dego AS (SELECT l_orderkey, count(*) AS deg_o FROM e GROUP BY 1),
        |degp AS (SELECT l_partkey, count(*) AS deg_p FROM e GROUP BY 1),
        |j AS (
        | SELECT deg_o, deg_p FROM e JOIN dego USING (l_orderkey)
        | JOIN degp USING (l_partkey)),
        |m AS (
        | SELECT count(*) AS n_edges,
        |  CAST(sum(deg_o) AS BIGINT) AS sx, CAST(sum(deg_p) AS BIGINT) AS sy,
        |  CAST(sum(deg_o * deg_p) AS BIGINT) AS sxy,
        |  CAST(sum(deg_o * deg_o) AS BIGINT) AS sxx,
        |  CAST(sum(deg_p * deg_p) AS BIGINT) AS syy
        | FROM j)
        |SELECT n_edges, sx, sy,
        | round((n_edges * sxy - sx * sy) /
        |  (sqrt(CAST(n_edges * sxx - sx * sx AS DOUBLE)) *
        |   sqrt(CAST(n_edges * syy - sy * sy AS DOUBLE))), 6) AS assortativity
        |FROM m""".stripMargin,
  )
}
