package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.Scale

/** r7d analytics batch — distribution and linkage operators: RFM customer
  * segmentation on exact global quintiles, Lorenz/Gini concentration,
  * integer-exact lagged autocorrelation, CUSUM changepoint localization,
  * Jaro–Winkler record linkage (native codegen'd expression), and
  * hard-negative mining over the embedding corpus. All quantile ranks go
  * through [[graft.operators.Scale.denseIds]] (range-partitioned global
  * rank — no single-partition window on a data-sized frame); day-level
  * and report-level frames may use plain ordered windows because their
  * row count is calendar/bucket-bounded, not input-bounded.
  */
object Analytics3 {
  type Q = (SparkSession, String) => DataFrame

  /** RFM segmentation: per purchasing user, Recency (hours from last
    * purchase to corpus end), Frequency (purchase count), Monetary
    * (total cents), each cut into exact global quintiles (1..5; recency
    * quintile 5 = most recent, so higher is always better), then the
    * per-segment census. Quintiles come from three [[Scale.denseIds]]
    * total-order ranks ((id−1)·5 div n) — ties broken by user_id, so
    * both engines assign identical buckets.
    *
    * 100 TB shape: events collapse to the user dimension first (one
    * partial-agg'd shuffle); the three rank passes run on |users| ≪
    * |events| rows, each range-partitioned — never a one-partition
    * ntile. */
  val qRfmSegments: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val horizon = ev.agg(max(unix_micros(col("ts"))).as("end_us"))
    val users = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("f"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("m"))
      .crossJoin(horizon)
      .select(col("user_id"),
        expr("(end_us - last_us) div 3600000000L").as("r_hours"),
        col("f"), col("m"))
    def quintile(metric: String, asc: Boolean): DataFrame = {
      val ranked = Scale.denseIds(
        users.select(col("user_id"),
          (if (asc) col(metric) else -col(metric)).as("mv")),
        "rid", Seq("mv", "user_id"))
      ranked.crossJoin(users.agg(count(lit(1)).as("n")))
        .select(col("user_id"),
          (expr("((rid - 1) * 5) div n") + 1L).as(s"q_$metric"))
    }
    users
      .join(quintile("r_hours", asc = false), Seq("user_id")) // recent = small r_hours = high q
      .join(quintile("f", asc = true), Seq("user_id"))
      .join(quintile("m", asc = true), Seq("user_id"))
      .groupBy(col("q_r_hours").as("rq"), col("q_f").as("fq"), col("q_m").as("mq"))
      .agg(count(lit(1)).as("n_users"),
        expr("sum(r_hours) div count(1)").as("avg_r_hours"),
        expr("sum(f) div count(1)").as("avg_f"),
        expr("sum(m) div count(1)").as("avg_m_c"))
      .orderBy("rq", "fq", "mq")
  }

  /** Lorenz curve + Gini coefficient of order-value concentration:
    * ranks every order by value ([[Scale.denseIds]] — distributed total
    * order), reports the cumulative value share at each decile boundary
    * and the exact Gini (2Σi·xᵢ − (n+1)Σx)/(nΣx) from BIGINT moments
    * (the rank-sum identity — no pairwise |xᵢ−xⱼ| join). Within-decile
    * Σx is invariant to tie ordering (equal ranks ↔ equal values), so a
    * price-only sort key is exact.
    *
    * 100 TB shape: one range-partitioned rank pass, one 10-row decile
    * agg, one scalar agg — Σi·x fits int64 to ~10¹⁸ (≈10¹¹ rows at
    * TPC-H prices; beyond that move the moments to DECIMAL(38,0)). */
  val qGiniLorenz: Q = (s, d) => {
    val priced = Tables.orders(s, d).select(
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("price_c"))
    val ranked = Scale.denseIds(priced, "i", Seq("price_c"))
    val moments = ranked.agg(
      count(lit(1)).as("n"), sum("price_c").as("tot"),
      sum(col("i") * col("price_c")).as("ix"))
    val deciles = ranked.crossJoin(moments.select("n"))
      .groupBy(expr("((i - 1) * 10) div n").as("decile"))
      .agg(count(lit(1)).as("n_orders"), sum("price_c").as("dec_value_c"))
    deciles
      .withColumn("cum_value_c", sum("dec_value_c").over(
        Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(moments)
      .select(col("decile"), col("n_orders"), col("dec_value_c"),
        expr("(cum_value_c * 1000L) div tot").as("cum_share_milli"),
        round((lit(2.0) * col("ix") - (col("n") + 1) * col("tot")) /
          (col("n") * col("tot")), 6).as("gini"))
      .orderBy("decile")
  }

  /** Lag-k autocorrelation (k = 1..7) of the daily event count — the
    * seasonality probe for a feed (a weekly cycle shows as a peak at
    * k=7). Days join on integer epoch-day (day, day+k); every Pearson
    * moment (Σxy, Σx, Σx², counts) is an exact BIGINT, with one double
    * division rounded at the end — no FP accumulation-order hazard.
    *
    * 100 TB shape: the daily-count agg is the only input-sized pass;
    * the lag join and moments run on the |days|·7 calendar frame. */
  val qAutocorr: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("day_i"))
      .agg(count(lit(1)).as("x"))
    val lagged = daily.select(col("day_i"), col("x"))
      .withColumn("k", explode(sequence(lit(1), lit(7))))
      .withColumn("day_j", col("day_i") + col("k"))
      .join(daily.select(col("day_i").as("day_j"), col("x").as("y")), Seq("day_j"))
    lagged.groupBy("k")
      .agg(count(lit(1)).as("n_pairs"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("k").cast("long").as("k"), col("n_pairs"),
        round((col("n_pairs") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n_pairs") * col("syy") - col("sy") * col("sy")).cast("double"))), 6)
          .as("r"))
      .orderBy("k")
  }

  /** CUSUM changepoint scan over the daily event count: the cumulative
    * deviation from the global mean, kept exact by scaling with n
    * (n·Σ_{i≤t}xᵢ − t·Σx — integers only), peaks at the most likely
    * level-shift point. Emits the full curve with the peak flagged —
    * the monitoring artifact a feed-health dashboard plots.
    *
    * 100 TB shape: input-sized work is the daily agg; the scan is one
    * ordered window over the calendar frame. */
  val qCusumChangepoint: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("day_i"))
      .agg(count(lit(1)).as("x"))
    val w = Window.orderBy("day_i")
    val curve = daily
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("cum_x", sum("x").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(daily.agg(count(lit(1)).as("n"), sum("x").as("tot")))
      .withColumn("cusum_scaled", col("n") * col("cum_x") - col("t") * col("tot"))
    curve
      .crossJoin(curve.agg(max(abs(col("cusum_scaled"))).as("peak")))
      .select(col("day_i").cast("long").as("day_i"), col("x"), col("cusum_scaled"),
        (abs(col("cusum_scaled")) === col("peak")).cast("long").as("is_peak"))
      .orderBy("day_i")
  }

  /** Record linkage over part names: same-brand candidate pairs whose
    * names land at Jaro–Winkler ≥ 0.92, computed ON DISTINCT NAMES and
    * expanded back to record pairs. The r7 shape (equality self-join on
    * the 25-value brand key) was the one shipped plan that grew
    * quadratically: block cardinality was CONSTANT in data size, so
    * candidate pairs — and JW evaluations — went 79 k → 8 M → 800 M as
    * data scaled. The verify work, though, only depends on the NAME
    * domain: dedupe names first (|distinct| ≪ n whenever linkage is
    * meaningful), token-block the distinct side (candidate name pairs
    * must share a name token — the inverted-index equi-join from
    * [[graft.dedup.Dedup]], never all-pairs), JW-verify once per name
    * pair with the native codegen'd [[graft.functions.JaroWinklerSim]],
    * then expand matches to record pairs via two equi-joins on
    * (name, brand). JW cost drops from O(n²/|brands|) to
    * O(Σ|token block|²) over DISTINCT names; everything downstream is
    * output-sized, which is the information-theoretic floor — the
    * matching pairs ARE the answer. RECALL BOUND: JW ≥ 0.92 does NOT
    * formally guarantee a shared whitespace token (a leading
    * transposition inside one long token scores ≥ 0.92 with disjoint
    * token sets), so token blocking is a heuristic whose zero-loss
    * property on this name domain is PINNED BY TEST — Analytics3Spec
    * brute-forces all pairs and asserts set equality with this blocked
    * pipeline at sf0.001 AND sf0.01; the DuckDB oracle replays the same
    * blocking, so the spec (not the oracle) is the recall guard.
    * DuckDB's jaro_winkler_similarity implements the identical
    * conditional-boost Winkler; the oracle replays the same
    * distinct+block+expand pipeline.
    *
    * 100 TB shape: the n-sized inputs take exactly two exchanges (name
    * dedupe; the expand join on (name, brand)); the JW verify runs on
    * the distinct-name index whose blocks a skewed token would salt the
    * same way [[Dedup]]'s inverted index does. */
  /** The matched NAME pairs (unordered: na ≤ nb once, self-pairs kept —
    * JW(x,x)=1 links distinct records sharing a name), shared by both
    * linkage readouts below. */
  private def linkageMatchedNames(s: SparkSession, d: String) = {
    val names = Tables.part(s, d).select(col("p_name").as("nm")).distinct()
    val toks = names.select(col("nm"), explode(split(col("nm"), " ")).as("tok"))
    toks.as("a").join(toks.as("b"), col("a.tok") === col("b.tok"))
      .filter(col("a.nm") <= col("b.nm"))
      .select(col("a.nm").as("na"), col("b.nm").as("nb")).distinct()
      .withColumn("jw", round(
        graft.functions.JaroWinkler.jaro_winkler(col("na"), col("nb")), 6))
      .filter(col("jw") >= 0.92)
  }

  /** The full record-pair expansion (the pre-r12 q_record_linkage
    * output): every same-brand record pair whose names matched, one row
    * per pair. OUTPUT-sized — on the replicated sfN corpora true-pair
    * count grows ~replicas² (the r11 sf10 decade measured 64.9×, all of
    * it answer cardinality) — so the registry entry now reports the
    * work-bound per-brand census instead; this variant stays available
    * and is the referee the spec brute-forces against all-pairs AND
    * reconciles with the census readout. */
  def recordLinkagePairs(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).select(
      col("p_brand").as("brand"), col("p_partkey").as("pk"), col("p_name").as("nm"))
    val matched = linkageMatchedNames(s, d)
    // both orientations back, so the (name=na, name=nb) × (pk order)
    // expansion below needs only one join shape
    val both = matched.union(
      matched.filter(col("na") =!= col("nb"))
        .select(col("nb").as("na"), col("na").as("nb"), col("jw")))
    val b = p.select(col("brand").as("brand_b"), col("pk").as("pk_b"),
      col("nm").as("nm_b"))
    p.join(broadcast(both), col("nm") === col("na"))
      .join(b, col("nm_b") === col("nb") && col("brand") === col("brand_b") &&
        col("pk") < col("pk_b"))
      .select(col("brand"), col("pk").as("pk_a"), col("pk_b"), col("jw"))
      .orderBy("brand", "pk_a", "pk_b")
  }

  val qRecordLinkage: Q = (s, d) => {
    // r12 work-bound readout (VERDICT r11 task 3): the record-pair count
    // per matched name pair is pure arithmetic over per-(brand, name)
    // record counts — c_a·c_b for na ≠ nb (each unordered record pair has
    // exactly one pk_a < pk_b orientation), C(c,2) for na = nb — so the
    // quadratic pair set is never enumerated. The bench then measures the
    // WORK (distinct-name dedupe, token-blocked candidate join, JW verify,
    // two domain-sized count joins), all ~linear in records, instead of
    // the answer's ~replicas² cardinality. The spec reconciles this census
    // against aggregating the full recordLinkagePairs frame.
    val p = Tables.part(s, d).select(
      col("p_brand").as("brand"), col("p_partkey").as("pk"), col("p_name").as("nm"))
    val matched = linkageMatchedNames(s, d)
      .withColumn("jw_micro", expr("CAST(round(jw * 1000000) AS BIGINT)"))
    val counts = p.groupBy("brand", "nm").agg(count(lit(1)).as("c"))
    // distinct column names on the two count sides: a .as()-aliased
    // self-join over the same aggregate risks ambiguous-attribute
    // resolution; renamed selects are unambiguous by construction
    val ca = counts.select(col("brand"), col("nm").as("nm_a"), col("c").as("c_a"))
    val cb = counts.select(col("brand").as("brand_b"), col("nm").as("nm_b"),
      col("c").as("c_b"))
    val perPair = ca.join(broadcast(matched), col("nm_a") === col("na"))
      .join(cb, col("nm_b") === col("nb") && col("brand_b") === col("brand"))
      .select(col("brand"), col("jw_micro"),
        when(col("na") === col("nb"), expr("c_a * (c_a - 1) div 2"))
          .otherwise(col("c_a") * col("c_b")).as("n_pr"))
      .filter(col("n_pr") > 0)
    perPair.groupBy("brand")
      .agg(count(lit(1)).as("n_name_pairs"),
        sum("n_pr").as("n_pairs"),
        sum(col("n_pr") * col("jw_micro")).as("jw_micro_wsum"))
      .orderBy("brand")
  }

  /** Hard-negative mining for contrastive training: for each probe
    * vector (vec_id ≡ 0 mod 50), the 3 nearest OTHER-label vectors by
    * cosine — the near-misses a metric-learning loss needs. The
    * label-mismatch filter runs BEFORE ranking, and the top-k is the
    * partial WindowGroupLimit shape ([[DedupSim]] brute-kNN plan): each
    * task keeps only k rows per probe before the exchange.
    *
    * 100 TB shape: probes broadcast (driver-sized by the mod filter);
    * the corpus streams through one codegen'd dot-product pass — no
    * corpus shuffle, exchange volume is k·|probes|. */
  val qHardNegatives: Q = (s, d) => {
    import graft.functions.GraftFunctions.dot_product
    val v = Tables.embeddings(s, d).select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("vec"))
      .withColumn("nrm", sqrt(dot_product(col("vec"), col("vec"))))
    val probes = v.filter(col("vec_id") % 50 === 0).select(
      col("vec_id").as("q_id"), col("label").as("q_label"),
      col("vec").as("q_vec"), col("nrm").as("q_nrm"))
    val sims = v.join(broadcast(probes), col("vec_id") =!= col("q_id"))
      .filter(col("label") =!= col("q_label"))
      .select(col("q_id"), col("vec_id").as("n_id"), col("label").as("n_label"),
        round(dot_product(col("q_vec"), col("vec")) / (col("q_nrm") * col("nrm")), 6)
          .as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("q_id", "rank", "n_id", "n_label", "sim")
      .orderBy("q_id", "rank")
  }

  val all: Map[String, Q] = Map(
    "q_rfm_segments" -> qRfmSegments,
    "q_gini_lorenz" -> qGiniLorenz,
    "q_autocorr" -> qAutocorr,
    "q_cusum_changepoint" -> qCusumChangepoint,
    "q_record_linkage" -> qRecordLinkage,
    "q_hard_negatives" -> qHardNegatives,
  )

  val oracles: Map[String, String] = Map(
    "q_rfm_segments" ->
      """WITH horizon AS (SELECT max(epoch_us(ts)) AS end_us FROM events),
        |u AS (
        | SELECT user_id,
        |  (end_us - max(epoch_us(ts))) // 3600000000 AS r_hours,
        |  count(*) AS f,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS m
        | FROM events CROSS JOIN horizon
        | WHERE event_type = 'purchase' GROUP BY user_id, end_us),
        |n AS (SELECT count(*) AS n FROM u),
        |qr AS (SELECT user_id, ((row_number() OVER (ORDER BY -r_hours, user_id) - 1) * 5) // n + 1 AS rq FROM u CROSS JOIN n),
        |qf AS (SELECT user_id, ((row_number() OVER (ORDER BY f, user_id) - 1) * 5) // n + 1 AS fq FROM u CROSS JOIN n),
        |qm AS (SELECT user_id, ((row_number() OVER (ORDER BY m, user_id) - 1) * 5) // n + 1 AS mq FROM u CROSS JOIN n)
        |SELECT CAST(rq AS BIGINT) AS rq, CAST(fq AS BIGINT) AS fq, CAST(mq AS BIGINT) AS mq,
        | count(*) AS n_users,
        | CAST(sum(r_hours) AS BIGINT) // count(*) AS avg_r_hours,
        | CAST(sum(f) AS BIGINT) // count(*) AS avg_f,
        | CAST(sum(m) AS BIGINT) // count(*) AS avg_m_c
        |FROM u JOIN qr USING (user_id) JOIN qf USING (user_id) JOIN qm USING (user_id)
        |GROUP BY 1, 2, 3 ORDER BY rq, fq, mq""".stripMargin,
    "q_gini_lorenz" ->
      """WITH priced AS (
        | SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS price_c FROM orders),
        |ranked AS (
        | SELECT price_c, CAST(row_number() OVER (ORDER BY price_c) AS BIGINT) AS i
        | FROM priced),
        |m AS (SELECT count(*) AS n, CAST(sum(price_c) AS BIGINT) AS tot,
        |       CAST(sum(i * price_c) AS BIGINT) AS ix FROM ranked),
        |dec AS (
        | SELECT ((i - 1) * 10) // n AS decile, count(*) AS n_orders,
        |  CAST(sum(price_c) AS BIGINT) AS dec_value_c
        | FROM ranked CROSS JOIN m GROUP BY 1),
        |cum AS (
        | SELECT decile, n_orders, dec_value_c,
        |  CAST(sum(dec_value_c) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_value_c
        | FROM dec)
        |SELECT CAST(decile AS BIGINT) AS decile, n_orders, dec_value_c,
        | (cum_value_c * 1000) // tot AS cum_share_milli,
        | round((2.0 * ix - (n + 1) * tot) / (CAST(n AS DOUBLE) * tot), 6) AS gini
        |FROM cum CROSS JOIN m ORDER BY decile""".stripMargin,
    "q_autocorr" ->
      """WITH daily AS (
        | SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_i,
        |  count(*) AS x
        | FROM events GROUP BY 1),
        |lagged AS (
        | SELECT k.k, a.x AS x, b.x AS y
        | FROM daily a CROSS JOIN (SELECT unnest(range(1, 8)) AS k) k
        | JOIN daily b ON b.day_i = a.day_i + k.k)
        |SELECT CAST(k AS BIGINT) AS k, count(*) AS n_pairs,
        | round((count(*) * CAST(sum(x * y) AS BIGINT) -
        |         CAST(sum(x) AS BIGINT) * CAST(sum(y) AS BIGINT)) /
        |  (sqrt(CAST(count(*) * CAST(sum(x * x) AS BIGINT) -
        |         CAST(sum(x) AS BIGINT) * CAST(sum(x) AS BIGINT) AS DOUBLE)) *
        |   sqrt(CAST(count(*) * CAST(sum(y * y) AS BIGINT) -
        |         CAST(sum(y) AS BIGINT) * CAST(sum(y) AS BIGINT) AS DOUBLE))), 6) AS r
        |FROM lagged GROUP BY k ORDER BY k""".stripMargin,
    "q_cusum_changepoint" ->
      """WITH daily AS (
        | SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_i,
        |  count(*) AS x
        | FROM events GROUP BY 1),
        |m AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS tot FROM daily),
        |curve AS (
        | SELECT day_i, x,
        |  CAST(row_number() OVER (ORDER BY day_i) AS BIGINT) AS t,
        |  CAST(sum(x) OVER (ORDER BY day_i
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_x
        | FROM daily),
        |sc AS (
        | SELECT day_i, x, n * cum_x - t * tot AS cusum_scaled
        | FROM curve CROSS JOIN m),
        |pk AS (SELECT max(abs(cusum_scaled)) AS peak FROM sc)
        |SELECT CAST(day_i AS BIGINT) AS day_i, x,
        | CAST(cusum_scaled AS BIGINT) AS cusum_scaled,
        | CAST(abs(cusum_scaled) = peak AS BIGINT) AS is_peak
        |FROM sc CROSS JOIN pk ORDER BY day_i""".stripMargin,
    "q_record_linkage" ->
      """WITH names AS (SELECT DISTINCT p_name AS nm FROM part),
        |toks AS (SELECT nm, unnest(string_split(nm, ' ')) AS tok FROM names),
        |cand AS (SELECT DISTINCT a.nm AS na, b.nm AS nb
        |         FROM toks a JOIN toks b ON a.tok = b.tok
        |         WHERE a.nm <= b.nm),
        |matched AS (SELECT na, nb, round(jaro_winkler_similarity(na, nb), 6) AS jw
        |            FROM cand
        |            WHERE round(jaro_winkler_similarity(na, nb), 6) >= 0.92),
        |counts AS (SELECT p_brand AS brand, p_name AS nm, count(*) AS c
        |           FROM part GROUP BY 1, 2),
        |g AS (
        | SELECT ca.brand,
        |  CAST(round(m.jw * 1000000) AS BIGINT) AS jw_micro,
        |  CASE WHEN m.na = m.nb THEN ca.c * (ca.c - 1) // 2
        |       ELSE ca.c * cb.c END AS n_pr
        | FROM matched m
        | JOIN counts ca ON m.na = ca.nm
        | JOIN counts cb ON m.nb = cb.nm AND cb.brand = ca.brand)
        |SELECT brand, CAST(count(*) AS BIGINT) AS n_name_pairs,
        | CAST(sum(n_pr) AS BIGINT) AS n_pairs,
        | CAST(sum(n_pr * jw_micro) AS BIGINT) AS jw_micro_wsum
        |FROM g WHERE n_pr > 0
        |GROUP BY brand ORDER BY brand""".stripMargin,
    "q_hard_negatives" ->
      """WITH v AS (
        | SELECT vec_id, label,
        |  list_transform(embedding, x -> x::DOUBLE) AS vec
        | FROM embeddings),
        |n AS (
        | SELECT vec_id, label, vec,
        |  sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
        | FROM v),
        |probes AS (SELECT * FROM n WHERE vec_id % 50 = 0),
        |sims AS (
        | SELECT p.vec_id AS q_id, c.vec_id AS n_id, c.label AS n_label,
        |  round(list_sum(list_transform(range(1, len(p.vec) + 1),
        |    i -> p.vec[i] * c.vec[i])) / (p.nrm * c.nrm), 6) AS sim
        | FROM probes p JOIN n c
        |  ON c.vec_id <> p.vec_id AND c.label <> p.label),
        |r AS (
        | SELECT q_id, n_id, n_label, sim,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT) AS rank
        | FROM sims)
        |SELECT q_id, rank, n_id, n_label, sim FROM r WHERE rank <= 3
        |ORDER BY q_id, rank""".stripMargin,
  )
}
