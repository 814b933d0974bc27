package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.FootballEtl
import graft.ml.{PoissonModel, Simulate}

/** ML + reference-pipeline queries. All rows-only (no DuckDB oracle): GLM
  * fitting and seeded simulation aren't ANSI-SQL-expressible; the FIFA ETL
  * reads the reference CSV, not the sf testdata. Each is deterministic so
  * reruns hash identically.
  */
object Ml {
  type Q = (SparkSession, String) => DataFrame

  /** M1: the reference's weighted Poisson GLM (ml_project.py:198-212) on
    * its own data: ALL cleaned matches, home/away-stacked, with the F9
    * recency weight 1/((2019−year)·tournament-base). Rows the formula
    * makes unusable for IRLS are dropped exactly as statsmodels would
    * refuse them — null goals (unparsed scores), non-positive weights
    * (post-2019 matches) and the Infinity weights of 2019 matches (the
    * full formula surface incl. those edges is oracle-checked by
    * q_model_data). Output: coefficient table. */
  val qGlmPoisson: Q = (s, _) => {
    import s.implicits._
    val data = FootballEtl.modelData(s, Ml.footballCsv)
      .filter(col("goals").isNotNull && col("weight") > 0 &&
        col("weight") =!= lit(Double.PositiveInfinity))
    // frequency-weighted Poisson is exactly invariant under collapsing
    // identical (factors, response) rows and summing their weights — the
    // engine collapses to sufficient-statistic rows before IRLS ever runs
    // (spec-verified equivalence in MlSpec)
    // cached for the fit: IRLS + the RFormula indexers traverse the frame
    // ~a dozen times, and each pass would otherwise replay the CSV scan +
    // clean + union lineage (unpersisted as soon as the eager fit returns
    // — this is a multi-pass consumer, unlike the single-pass operators
    // where caching measured as a net loss)
    // coalesce(4): the collapsed frame is bounded by the factor-level
    // cross product (|teams|·|opponents|·goal range — ~18k rows here,
    // CONSTANT in input size), but it inherits the shuffle's 32
    // partitions, so every one of the ~30 RFormula/IRLS passes pays
    // 32-task scheduling overhead on near-empty partitions. Narrowing to
    // 4 keeps each pass a 4-task job; at any input scale the collapsed
    // frame stays this small, so the narrow width is scale-correct.
    // (idle-box r8: min 4.63 s → 3.43 s)
    val collapsed = data.groupBy("goals", "team", "opponent")
      .agg(sum("weight").as("weight")).coalesce(4).cache()
    val fitted =
      try PoissonModel.fit(collapsed)
      finally collapsed.unpersist()
    PoissonModel.coefficients(fitted)
      .toDF("feature_idx", "coef")
      .select(col("feature_idx"), round(col("coef"), 4).as("coef"))
      .orderBy("feature_idx")
  }

  /** F9 + U2 oracle surface: the model-data frame itself — every cleaned
    * match stacked home/away with the faithful recency-weight values
    * (incl. +Infinity at year 2019 and negative post-2019 weights).
    * Full-row sort makes the multiset compare order-stable. */
  val qModelData: Q = (s, _) =>
    FootballEtl.modelData(s, Ml.footballCsv)
      .orderBy("team", "opponent", "goals", "weight")

  /** M3–M5: seeded tournament simulation. Team strengths λ derived
    * relationally (customer balances per nation, min-max scaled to
    * [0.8, 2.2]), simulation driver-side over the 8-team field — the
    * reference's engine/driver split (SURVEY.md §2.9). */
  val qSimulation: Q = (s, d) => {
    import s.implicits._
    val strengthRows = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(avg("c_acctbal").as("bal"))
      .orderBy("n_name")
      .collect()
    val bals = strengthRows.map(_.getDouble(1))
    val (lo, hi) = (bals.min, bals.max)
    val strength = strengthRows.map { r =>
      val scaled = if (hi == lo) 1.5 else 0.8 + 1.4 * (r.getDouble(1) - lo) / (hi - lo)
      r.getString(0) -> scaled
    }.toMap
    val teams = strength.keys.toSeq.sorted.take(8)
    val groups = teams.grouped(4).toSeq
    val (standings, ko) = Simulate.tournament(seed = 42L, groups, strength)
    val groupRows = standings.map { case (phase, st) =>
      (phase, st.team, st.points.toLong, st.diff.toLong, st.goals.toLong)
    }
    val koRows = ko.map { case (round, team) => ("knockout", team, round.toLong, 0L, 0L) }
    (groupRows ++ koRows).toDF("phase", "team", "points", "diff", "goals")
      .orderBy(col("phase"), desc("points"), desc("diff"), desc("goals"), asc("team"))
  }

  /** The reference's flagship pipeline end-to-end on its own dataset:
    * CSV → clean → FIFA filter → deterministic keys → star results table.
    * sfDir is unused — the input is the reference CSV itself; the oracle
    * replays the same pipeline in DuckDB SQL over read_csv. Date goes out
    * as a yyyy-MM-dd string (cross-engine dtype discipline). */
  val qFifaStar: Q = (s, _) => {
    val star = FootballEtl.run(s, Ml.footballCsv, deterministicKeys = true)
    star("results")
      .withColumn("date", date_format(col("date"), "yyyy-MM-dd"))
      .orderBy("date_id")
  }

  val footballCsv = "/root/reference/football_results.csv"

  /** F12 columnar: per-returnflag score distribution on the INTEGER-MICRO
    * grid (r11 oracle upgrade; was rows-only because exp() isn't
    * bit-portable): λ is quantized to exact micro-units
    * (λµ = (Σ round(qty) · 10⁶) div n), and the Poisson weight profile is
    * the integer recursion wµ(0) = 10⁶, wµ(k) = (wµ(k−1) · λµ) div (k·10⁶)
    * — each step a DECIMAL(38) product and a floor division, so both
    * engines run the identical integer recursion (pmf(k)/pmf(k−1) = λ/k;
    * the e^{−λ} factor cancels into the truncated-grid normalizer
    * pmf_milli = (wµ·10³) div Σwµ). The float pmf from the codegen'd
    * poisson_pmf expression stays spec-certified against this grid and in
    * the q_simulation path.
    *
    * 100 TB shape: one partial agg to |returnflag| rows; the recursion is
    * an 11-step fold on a 3-row frame. */
  val qScoreDist: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("sq"))
      .withColumn("lam_micro", expr("(sq * 1000000) div n"))
      .withColumn("ws", expr(
        """aggregate(sequence(1, 10), array(CAST(1000000 AS BIGINT)),
             (acc, k) -> concat(acc, array(CAST(
               (CAST(element_at(acc, -1) AS DECIMAL(38,0)) * lam_micro)
                 div (CAST(k AS BIGINT) * 1000000) AS BIGINT))))"""))
      .withColumn("wsum", expr("aggregate(ws, CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .select(col("l_returnflag"), col("lam_micro"), col("wsum"),
        posexplode(col("ws")).as(Seq("k", "w_micro")))
      .select(col("l_returnflag"), col("k").cast("long").as("k"),
        col("lam_micro"), col("w_micro"),
        expr("(w_micro * 1000) div wsum").as("pmf_milli"))
      .orderBy("l_returnflag", "k")

  /** FastText-style linear quality classifier over hashed token
    * features, weak-labeled by the Gopher rule gate
    * ([[graft.ml.QualityClassifier]]). Reported per source: docs, rule
    * passes, model passes (P > 0.5), rule↔model agreement — the report
    * a curation run reads to decide whether the learned gate can
    * replace the rules. Rows-only (LBFGS weights aren't SQL-portable);
    * accuracy/agreement/determinism are spec-pinned (MlSpec). */
  val qQualityClassifier: Q = (s, d) => {
    import graft.ml.QualityClassifier
    // materialize the featurized frame ONCE, slimmed to what training
    // and scoring actually read (r13): without the checkpoint the
    // tokenize+hash+assemble lineage re-runs for the scoring pass and
    // for spark.ml's own instances conversion, and the heavy toks/tf
    // intermediates ride every replay — the measured source of the
    // 2.5× med/min spread at sf10 (VERDICT r12 task 6)
    val feat = QualityClassifier.featurize(Tables.documents(s, d))
      .select("doc_id", "label", "features")
      .localCheckpoint()
    val model = QualityClassifier.fit(feat)
    QualityClassifier.score(model, feat)
      .join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("label")).cast("long").as("rule_pass"),
        sum(when(col("quality_score") > 0.5, 1L).otherwise(0L)).as("model_pass"),
        sum(when((col("quality_score") > 0.5) === (col("label") === 1.0), 1L)
          .otherwise(0L)).as("agree"))
      .orderBy("source")
  }

  val all: Map[String, Q] = Map(
    "q_glm_poisson" -> qGlmPoisson,
    "q_model_data" -> qModelData,
    "q_simulation" -> qSimulation,
    "q_fifa_star" -> qFifaStar,
    "q_score_dist" -> qScoreDist,
    "q_quality_classifier" -> qQualityClassifier,
  )

  val oracles: Map[String, String] = Map(
    // integer-micro Poisson grid: the same 11-step floor recursion via a
    // recursive CTE (HUGEINT intermediates; readouts cast to BIGINT)
    "q_score_dist" ->
      """WITH a AS (
        | SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq
        | FROM lineitem GROUP BY 1),
        |l AS (SELECT l_returnflag, (sq * 1000000) // n AS lam_micro FROM a),
        |rec AS (
        | WITH RECURSIVE r(l_returnflag, k, w) AS (
        |  SELECT l_returnflag, 0, CAST(1000000 AS HUGEINT) FROM l
        |  UNION ALL
        |  SELECT r.l_returnflag, r.k + 1,
        |   (r.w * l.lam_micro) // ((r.k + 1) * 1000000)
        |  FROM r JOIN l USING (l_returnflag) WHERE r.k < 10)
        | SELECT * FROM r),
        |tot AS (SELECT l_returnflag, sum(w) AS wsum FROM rec GROUP BY 1)
        |SELECT rec.l_returnflag, CAST(rec.k AS BIGINT) AS k, l.lam_micro,
        | CAST(rec.w AS BIGINT) AS w_micro,
        | CAST((rec.w * 1000) // tot.wsum AS BIGINT) AS pmf_milli
        |FROM rec JOIN l USING (l_returnflag) JOIN tot USING (l_returnflag)
        |ORDER BY l_returnflag, k""".stripMargin,
    "q_fifa_star" ->
      """WITH raw AS (
        | SELECT * FROM read_csv('/root/reference/football_results.csv',
        |   header=true,
        |   columns={'date':'VARCHAR','home_team':'VARCHAR','away_team':'VARCHAR',
        |            'home_score':'INTEGER','away_score':'INTEGER','tournament':'VARCHAR',
        |            'city':'VARCHAR','country':'VARCHAR','neutral':'BOOLEAN'})),
        |cleaned AS (
        | SELECT coalesce(
        |     CAST(try_strptime(date, '%m/%d/%Y') AS DATE),
        |     CAST(try_strptime(date, '%Y-%m-%d') AS DATE),
        |     CAST(try_strptime(date, '%d-%m-%Y') AS DATE),
        |     CAST(try_strptime(date, '%d/%m/%Y') AS DATE)) AS date,
        |  home_team, away_team, home_score, away_score, tournament, city, country, neutral
        | FROM raw WHERE tournament = 'FIFA World Cup'),
        |keyed AS (
        | SELECT *, row_number() OVER (ORDER BY date, home_team, away_team, tournament) AS date_id
        | FROM cleaned)
        |SELECT CAST(date_id AS BIGINT) AS date_id, strftime(date, '%Y-%m-%d') AS date,
        | CAST(date_id + 4 AS BIGINT) AS game_id,
        | home_team, away_team, home_score, away_score, tournament, city, country, neutral
        |FROM keyed ORDER BY date_id""".stripMargin,
    "q_model_data" ->
      """WITH raw AS (
        | SELECT * FROM read_csv('/root/reference/football_results.csv',
        |   header=true,
        |   columns={'date':'VARCHAR','home_team':'VARCHAR','away_team':'VARCHAR',
        |            'home_score':'INTEGER','away_score':'INTEGER','tournament':'VARCHAR',
        |            'city':'VARCHAR','country':'VARCHAR','neutral':'BOOLEAN'})),
        |cleaned AS (
        | SELECT coalesce(
        |     CAST(try_strptime(date, '%m/%d/%Y') AS DATE),
        |     CAST(try_strptime(date, '%Y-%m-%d') AS DATE),
        |     CAST(try_strptime(date, '%d-%m-%Y') AS DATE),
        |     CAST(try_strptime(date, '%d/%m/%Y') AS DATE)) AS date,
        |  home_team, away_team, home_score, away_score, tournament
        | FROM raw),
        |w AS (
        | SELECT *, CASE WHEN contains(tournament, 'Cup')
        |             OR contains(tournament, 'Euro') THEN 1 ELSE 100 END AS base
        | FROM cleaned),
        |ww AS (
        | SELECT *, CASE WHEN (2019 - year(date)) * base = 0
        |   THEN 'Infinity'::DOUBLE
        |   ELSE 1.0 / CAST((2019 - year(date)) * base AS DOUBLE) END AS weight
        | FROM w)
        |SELECT team, opponent, goals, weight FROM (
        | SELECT home_team AS team, away_team AS opponent,
        |        home_score AS goals, weight FROM ww
        | UNION ALL
        | SELECT away_team AS team, home_team AS opponent,
        |        away_score AS goals, weight FROM ww)
        |ORDER BY team ASC NULLS FIRST, opponent ASC NULLS FIRST,
        |         goals ASC NULLS FIRST, weight ASC NULLS FIRST""".stripMargin,
  )
}
