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

  /** Classifier evaluation report — exact tie-corrected AUC (the
    * Mann–Whitney rank form: average ranks over score ties, so equal
    * scores contribute 1/2) plus a 10-bucket score-decile calibration
    * table (mean score vs observed label rate, integer milli units).
    *
    * The scorer under evaluation is a closed-form learned model fitted
    * IN the query: a smoothed class-rate-difference naive-Bayes over
    * binned Gopher-gate features (token count, mean word length,
    * stopword count, distinct ratio — the same statistics
    * [[graft.ml.QualityClassifier]] feeds its LR; that model's LBFGS
    * weights stay spec-verified under `q_quality_classifier`). Every
    * step here — Laplace-smoothed per-bin class rates in integer ppm,
    * additive score, rank scan, calibration — is EXACT integer
    * arithmetic (mean-word-length gates compare charsum·10 vs nt·39,
    * never a double), so fit + score + AUC + calibration all replay
    * bit-for-bit in DuckDB: the whole eval pipeline is
    * oracle-certified, not just deterministic (r8 was rows-only behind
    * the LBFGS fit). The only float op is the final one-division AUC.
    *
    * 100 TB shape: featurize is a narrow per-row map; the fit is four
    * |bins|-sized partial-agg'd counts joined back by BROADCAST (the
    * weight tables are ≤13 rows each — scoring is shuffle-free); the
    * rank scan runs over the ≤13·13·11·11 distinct-score frame —
    * bounded at ANY input size; calibration buckets derive from the
    * same bounded frame's cumulative counts. */
  val qClassifierEval: Q = (s, d) => {
    import graft.text.TextFunctions
    val tk = col("tk")
    val st = Tables.documents(s, d)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
      .select(col("doc_id"),
        size(tk).cast("long").as("nt"),
        aggregate(tk, lit(0L), (a, t) => a + length(t)).as("charsum"),
        size(filter(tk, t => t.isin(
          TextFunctions.stopwords.map(_.asInstanceOf[Any]): _*))).cast("long").as("ns"),
        size(array_distinct(tk)).cast("long").as("ndist"))
      .withColumn("label", (col("nt") >= 30 && col("nt") <= 80 &&
        col("charsum") * 10 >= col("nt") * 39 &&
        col("charsum") * 10 <= col("nt") * 51 &&
        col("ns") >= 2 && col("ndist") * 2 >= col("nt")).cast("long"))
      .withColumn("b1", least(expr("nt div 10"), lit(12L)))
      .withColumn("b2", least(expr("(charsum * 2) div nt"), lit(12L)))
      .withColumn("b3", least(col("ns"), lit(10L)))
      .withColumn("b4", least(expr("(ndist * 10) div nt"), lit(10L)))
    val tot = st.agg(sum("label").cast("long").as("n1"),
      (count(lit(1)) - sum("label")).cast("long").as("n0"))
    // per-bin Laplace-smoothed class-rate difference in ppm; Bk = bin count
    def wTab(bcol: String, bk: Int) = st.groupBy(bcol)
      .agg(sum("label").cast("long").as("c1"),
        (count(lit(1)) - sum("label")).cast("long").as("c0"))
      .crossJoin(broadcast(tot))
      .select(col(bcol),
        (expr(s"((c1 + 1) * 1000000) div (n1 + $bk)") -
          expr(s"((c0 + 1) * 1000000) div (n0 + $bk)")).as(s"w_$bcol"))
    val scored = st
      .join(broadcast(wTab("b1", 13)), "b1")
      .join(broadcast(wTab("b2", 13)), "b2")
      .join(broadcast(wTab("b3", 11)), "b3")
      .join(broadcast(wTab("b4", 11)), "b4")
      .crossJoin(broadcast(tot))
      .withColumn("score",
        expr("(n1 * 1000000) div (n1 + n0) - (n0 * 1000000) div (n1 + n0)") +
          col("w_b1") + col("w_b2") + col("w_b3") + col("w_b4"))
      .select("doc_id", "label", "score")
    // average rank per distinct score: cum count below + (tied + 1)/2,
    // carried ×2 to stay integral — tie-corrected MW
    val perScore = scored.groupBy("score")
      .agg(count(lit(1)).as("c"), sum("label").cast("long").as("pos_c"))
    val w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perScore
      .withColumn("below", coalesce(sum("c").over(w), lit(0L)))
      .withColumn("rank_avg2", lit(2L) * col("below") + col("c") + 1L)
    val auc = ranked
      .crossJoin(broadcast(tot))
      .agg(first("n1").as("n_pos"), first("n0").as("n_neg"),
        sum(col("pos_c") * col("rank_avg2")).as("rank_sum2"))
      // Exact integer ppm (r10): rank_sum2, n_pos, n_neg are exact integers,
      // so AUC needs NO float at all — auc_ppm = ((rank_sum2 − P(P+1))·5e5)
      // div (P·N). rank_sum2 ≥ P(P+1) always (all-positives-first minimum),
      // so truncating div (Spark) and flooring // (DuckDB) agree. DECIMAL
      // numerator keeps the ×5e5 product overflow-free at any SF. The
      // previous round(double, 6) readout tripped the driver hash in r9.
      // Degenerate guard (r11): with zero positives or zero negatives the
      // engines diverge (Spark non-ANSI div→NULL, DuckDB // raises) — make
      // both emit NULL explicitly so degenerate data can't hash-split.
      .select(col("n_pos"), col("n_neg"),
        expr("""CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(NULL AS BIGINT)
                ELSE CAST((CAST(rank_sum2 AS DECIMAL(38,0))
                - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)) * 500000
                div (CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT) END""")
          .as("auc_ppm"))
    // score-decile buckets from the bounded frame's cumulative counts;
    // the +5e6 shift keeps the mean's integer division on non-negative
    // operands (Spark div truncates, DuckDB // floors — they only agree
    // on non-negatives)
    val calib = ranked
      .crossJoin(broadcast(tot))
      .withColumn("bucket", least(expr("(10 * below) div (n1 + n0)"), lit(9L)))
      .groupBy("bucket")
      .agg(sum("c").as("n"),
        (expr("(sum((score + 5000000) * c) * 1000) div sum(c)") -
          lit(5000000000L)).as("mean_score_milli"),
        expr("(sum(pos_c) * 1000) div sum(c)").as("label_rate_milli"))
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
    "q_classifier_eval" ->
      """WITH st AS (
        | SELECT doc_id, len(tk) AS nt,
        |  CAST(list_aggregate(list_transform(tk, t -> strlen(t)), 'sum')
        |    AS BIGINT) AS charsum,
        |  len(list_filter(tk,
        |    t -> t IN ('the', 'a', 'data', 'row', 'value'))) AS ns,
        |  len(list_distinct(tk)) AS ndist
        | FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |       FROM documents)),
        |lab AS (
        | SELECT doc_id,
        |  CAST(nt >= 30 AND nt <= 80 AND charsum * 10 >= nt * 39
        |   AND charsum * 10 <= nt * 51 AND ns >= 2 AND ndist * 2 >= nt
        |   AS BIGINT) AS label,
        |  least(nt // 10, 12) AS b1,
        |  least((charsum * 2) // nt, 12) AS b2,
        |  least(ns, 10) AS b3,
        |  least((ndist * 10) // nt, 10) AS b4
        | FROM st),
        |tot AS (SELECT CAST(sum(label) AS BIGINT) AS n1,
        |  CAST(count(*) - sum(label) AS BIGINT) AS n0 FROM lab),
        |w1 AS (SELECT b1,
        |  ((CAST(sum(label) AS BIGINT) + 1) * 1000000)
        |    // ((SELECT n1 FROM tot) + 13)
        |   - ((CAST(count(*) - sum(label) AS BIGINT) + 1) * 1000000)
        |     // ((SELECT n0 FROM tot) + 13) AS w
        | FROM lab GROUP BY b1),
        |w2 AS (SELECT b2,
        |  ((CAST(sum(label) AS BIGINT) + 1) * 1000000)
        |    // ((SELECT n1 FROM tot) + 13)
        |   - ((CAST(count(*) - sum(label) AS BIGINT) + 1) * 1000000)
        |     // ((SELECT n0 FROM tot) + 13) AS w
        | FROM lab GROUP BY b2),
        |w3 AS (SELECT b3,
        |  ((CAST(sum(label) AS BIGINT) + 1) * 1000000)
        |    // ((SELECT n1 FROM tot) + 11)
        |   - ((CAST(count(*) - sum(label) AS BIGINT) + 1) * 1000000)
        |     // ((SELECT n0 FROM tot) + 11) AS w
        | FROM lab GROUP BY b3),
        |w4 AS (SELECT b4,
        |  ((CAST(sum(label) AS BIGINT) + 1) * 1000000)
        |    // ((SELECT n1 FROM tot) + 11)
        |   - ((CAST(count(*) - sum(label) AS BIGINT) + 1) * 1000000)
        |     // ((SELECT n0 FROM tot) + 11) AS w
        | FROM lab GROUP BY b4),
        |scored AS (
        | SELECT l.label,
        |  (t.n1 * 1000000) // (t.n1 + t.n0) - (t.n0 * 1000000) // (t.n1 + t.n0)
        |   + w1.w + w2.w + w3.w + w4.w AS score
        | FROM lab l CROSS JOIN tot t
        | JOIN w1 ON l.b1 = w1.b1 JOIN w2 ON l.b2 = w2.b2
        | JOIN w3 ON l.b3 = w3.b3 JOIN w4 ON l.b4 = w4.b4),
        |per_score AS (
        | SELECT score, count(*) AS c, CAST(sum(label) AS BIGINT) AS pos_c
        | FROM scored GROUP BY score),
        |ranked AS (
        | SELECT score, c, pos_c,
        |  coalesce(sum(c) OVER (ORDER BY score
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        | FROM per_score),
        |auc AS (
        | SELECT (SELECT n1 FROM tot) AS n_pos, (SELECT n0 FROM tot) AS n_neg,
        |  CASE WHEN (SELECT n1 FROM tot) = 0 OR (SELECT n0 FROM tot) = 0
        |   THEN CAST(NULL AS BIGINT)
        |   ELSE CAST(((CAST(sum(pos_c * (2 * below + c + 1)) AS HUGEINT)
        |     - CAST((SELECT n1 FROM tot) AS HUGEINT) * ((SELECT n1 FROM tot) + 1))
        |    * 500000)
        |    // (CAST((SELECT n1 FROM tot) AS HUGEINT) * (SELECT n0 FROM tot))
        |    AS BIGINT) END AS auc_ppm
        | FROM ranked),
        |buckets AS (
        | SELECT least((10 * below) // ((SELECT n1 + n0 FROM tot)), 9) AS bucket,
        |  CAST(sum(c) AS BIGINT) AS n,
        |  (CAST(sum((score + 5000000) * c) AS BIGINT) * 1000) // sum(c)
        |    - 5000000000 AS mean_score_milli,
        |  (CAST(sum(pos_c) AS BIGINT) * 1000) // sum(c) AS label_rate_milli
        | FROM ranked GROUP BY 1)
        |-- bucket derives from a windowed sum → HUGEINT in DuckDB, which the
        |-- driver's fetch renders as float64 (the r10 hash break); CAST it.
        |SELECT CAST(bucket AS BIGINT) AS bucket, n,
        | CAST(mean_score_milli AS BIGINT) AS mean_score_milli,
        | CAST(label_rate_milli AS BIGINT) AS label_rate_milli,
        | n_pos, n_neg, auc_ppm
        |FROM buckets CROSS JOIN auc ORDER BY bucket""".stripMargin,
  )
}
