package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions.tokens

/** r9 batch 18: measurement-science and vector-stat operators —
  * Deming regression, Gumbel block-maxima fit (literal Euler constant,
  * no special functions), jackknife SE for a ratio estimator, the
  * sequence-length packing histogram, and embedding anisotropy via
  * micro-integer normalized components (the one place row-level
  * doubles would otherwise poison sum order).
  */
object Analytics36 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Deming regression (errors in BOTH variables, δ=1) of price cents
    * on quantity: slope = (s_yy−s_xx + √((s_yy−s_xx)²+4s_xy²)) / (2s_xy)
    * from exact decimal central-moment numerators (n-scaled, so no
    * division before the closed form). The lab-calibration complement
    * of [[Analytics31.qRidgeClosed]]'s OLS family.
    *
    * 100 TB shape: ONE moment pass; the solve is a 1-row readout. */
  val qDeming: Q = (s, d) => {
    val m = Tables.lineitem(s, d).select(
        expr("CAST(CAST(round(l_quantity) AS BIGINT) AS DECIMAL(38,0))").as("x"),
        expr("CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))").as("y"))
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    // Split-conversion for the >2^53 second moments (r11, caught by the
    // 3-SF sweep at sf0.1): Spark's DECIMAL→DOUBLE is correctly rounded
    // (BigDecimal.doubleValue) but DuckDB's HUGEINT→DOUBLE goes through
    // upper·2⁶⁴ + lower (two roundings) — above 2^53 the two engines can
    // land 1 ulp apart, and intercept_micro's grid (1e-6 of a ~4.5e9
    // statistic) is FINER than that ulp. hi·1e9 + lo with hi, lo < 2^53
    // is the SAME fixed sequence of exactly-representable inputs and
    // correctly-rounded ops on both engines → bit-identical by
    // construction (identical ≻ correct — it need not equal the
    // one-rounding conversion, only match cross-engine).
    def toD(c: String) =
      s"(CAST($c div 1000000000 AS DOUBLE) * 1.0E9 + CAST($c % 1000000000 AS DOUBLE))"
    val cxx = s"(n * ${toD("sxx")} - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    val cyy = s"(n * ${toD("syy")} - ${toD("sy")} * ${toD("sy")})"
    val cxy = s"(n * ${toD("sxy")} - CAST(sx AS DOUBLE) * ${toD("sy")})"
    val slope = s"(($cyy - $cxx + sqrt(($cyy - $cxx) * ($cyy - $cxx) + 4 * $cxy * $cxy)) / (2 * $cxy))"
    // Integer micro-unit readout (r10): round(x, 6) AS DOUBLE re-represents
    // the rounded decimal as a binary double, and Spark (BigDecimal HALF_UP)
    // vs DuckDB (binary-double rounding) can land on DIFFERENT nearest
    // doubles on ulp-boundary data — this query tripped the driver hash in
    // r9. round(x * 1e6) AS BIGINT carries the same 6dp information with no
    // float in the hashed output.
    m.select(col("n"),
      expr(s"CAST(round($slope * 1000000) AS BIGINT)").as("slope_micro"),
      expr(s"""CAST(round((${toD("sy")} / n - $slope * (CAST(sx AS DOUBLE) / n))
              * 1000000) AS BIGINT)""").as("intercept_micro"))
  }

  /** Gumbel (EV-I) fit to monthly block maxima of daily revenue by the
    * method of moments: σ̂ = s·√6/π, μ̂ = x̄ − γσ̂ with √6/π and the
    * Euler–Mascheroni γ as 16-digit LITERALS — no digamma, no MLE
    * iteration. Block maxima are exact integer cents (max per month of
    * the daily frame); only the final 1-row readout is double.
    *
    * 100 TB shape: fact → |days| → |months| maxima → one moment agg. */
  val qGumbelFit: Q = (s, d) => {
    val maxima = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
      .groupBy(expr("CAST(year(day) * 12 + month(day) AS BIGINT)").as("m"))
      .agg(max("rev_c").as("mx"))
    val mm = maxima.agg(count(lit(1)).as("k"),
      sum(col("mx").cast("decimal(38,0)")).as("sx"),
      sum(expr("CAST(mx AS DECIMAL(38,0)) * mx")).as("sxx"))
    val sd = "sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / k)) / (k - 1))"
    mm.select(col("k").as("n_blocks"),
      expr(s"CAST(round($sd * 0.7796968012336761E0, 6) AS DOUBLE)").as("sigma_c"),
      expr(s"""CAST(round(CAST(sx AS DOUBLE) / k
              - 0.5772156649015329E0 * ($sd * 0.7796968012336761E0), 6) AS DOUBLE)""")
        .as("mu_c"))
  }

  /** Jackknife standard error for the ratio estimator revenue/quantity
    * with nations as the leave-one-out groups: each LOO ratio is an
    * exact rational readout from the complement sums, pseudo-value
    * variance on the 25-row frame in fixed-order doubles (6dp). The
    * delete-a-group jackknife is THE scale-friendly resampler — no
    * replication of the fact, just one census and k complements.
    *
    * 100 TB shape: one nation-keyed partial agg; complements come from
    * broadcasting the 1-row total back over 25 rows. */
  val qJackknifeRatio: Q = (s, d) => {
    val byNation = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("rev"),
        sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("qty"))
    val tot = byNation.agg(sum("rev").as("trev"), sum("qty").as("tqty"),
      count(lit(1)).as("k"))
    val loo = byNation.join(broadcast(tot))
      .withColumn("theta_i", expr(
        "CAST(trev - rev AS DOUBLE) / CAST(tqty - qty AS DOUBLE)"))
    loo.agg(
        max(col("k")).as("k_groups"),
        max(expr("CAST(trev AS DOUBLE) / tqty")).as("theta_hat"),
        sum("theta_i").as("sum_theta"),
        sum(expr("theta_i * theta_i")).as("sum_theta2"))
      .select(col("k_groups"),
        expr("CAST(round(theta_hat, 6) AS DOUBLE)").as("ratio_c_per_unit"),
        expr("""CAST(round(sqrt((k_groups - 1.0) / k_groups
                * (sum_theta2 - sum_theta * (sum_theta / k_groups))), 6) AS DOUBLE)""")
          .as("jackknife_se"))
  }

  /** Sequence-length packing histogram: documents bucketed by
    * power-of-two token counts (bucket = bit length, integer-exact in
    * both engines — no libm log2), with doc share and TOKEN MASS share
    * in exact ppm — the planning table behind q_pack_sequences' bin
    * packing and any context-length curriculum.
    *
    * 100 TB shape: per-row token count in the scan, one ≤64-key agg. */
  val qSeqlenHistogram: Q = (s, d) => {
    val t = Tables.documents(s, d)
      .select(expr("size(filter(split(trim(text), '\\\\s+'), w -> length(w) > 0))")
        .cast("long").as("n_tok"))
      .withColumn("bucket", expr("length(bin(n_tok)) - 1").cast("long"))
    val tot = t.agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_toks"))
    t.groupBy("bucket")
      .agg(count(lit(1)).as("docs"), sum("n_tok").as("toks"),
        min("n_tok").as("min_tok"), max("n_tok").as("max_tok"))
      .join(broadcast(tot))
      .select(col("bucket"), col("docs"), col("toks"), col("min_tok"), col("max_tok"),
        expr("(docs * 1000000) div n_docs").as("doc_ppm"),
        expr("(toks * 1000000) div n_toks").as("tok_ppm"))
      .orderBy("bucket")
  }

  /** Embedding anisotropy (Ethayarajh 2019 readout): the average
    * pairwise cosine of a set of unit vectors equals ‖mean unit
    * vector‖² (up to the 1/n self-term) — so ONE pass over per-row
    * L2-normalized components suffices. Row doubles would make the
    * component sums order-dependent, so each normalized component is
    * micro-rounded to an INTEGER before summing (order-free; the
    * quantization bias is O(10⁻⁶), eleven orders under the signal).
    *
    * 100 TB shape: one narrow projection + one 64-component integer
    * agg; no pairwise anything. */
  val qEmbedAnisotropy: Q = (s, d) => {
    val v = Tables.embeddings(s, d)
      .select(col("vec_id"), expr(
        """transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) / sqrt(aggregate(embedding,
             CAST(0.0 AS DOUBLE), (a, e) -> a + CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))
             * 1000000) AS BIGINT))""").as("unit_micro"))
    val sums = v.select(explode(expr(
        "transform(unit_micro, (x, i) -> named_struct('i', i, 'x', x))")).as("c"))
      .select(col("c.i").as("i"), col("c.x").as("x"))
      .groupBy("i").agg(sum("x").as("sx"))
    val n = v.agg(count(lit(1)).as("n"))
    sums.join(broadcast(n))
      .agg(max("n").as("n_vecs"),
        sum(expr("CAST(sx AS DECIMAL(38,0)) * sx")).as("norm2_micro2"))
      .select(col("n_vecs"),
        expr("""CAST(round(CAST(norm2_micro2 AS DOUBLE)
                / (CAST(n_vecs AS DOUBLE) * n_vecs) / 1000000000000.0, 6) AS DOUBLE)""")
          .as("mean_vec_norm2"),
        expr("""CAST(round((CAST(norm2_micro2 AS DOUBLE)
                / (CAST(n_vecs AS DOUBLE) * n_vecs) / 1000000000000.0 * n_vecs - 1)
                / (n_vecs - 1), 6) AS DOUBLE)""").as("avg_pairwise_cos"))
  }

  val all: Map[String, Q] = Map(
    "q_deming" -> qDeming,
    "q_gumbel_fit" -> qGumbelFit,
    "q_jackknife_ratio" -> qJackknifeRatio,
    "q_seqlen_histogram" -> qSeqlenHistogram,
    "q_embed_anisotropy" -> qEmbedAnisotropy,
  )

  val oracles: Map[String, String] = Map(
    "q_deming" -> {
      // same split-conversion as the Spark side (// == div on these
      // non-negative moments): identical exact inputs + identical
      // correctly-rounded op sequence → bit-identical doubles
      def toD(c: String) =
        s"(CAST($c // 1000000000 AS DOUBLE) * 1.0E9 + CAST($c % 1000000000 AS DOUBLE))"
      val cxx = s"(n * ${toD("sxx")} - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
      val cyy = s"(n * ${toD("syy")} - ${toD("sy")} * ${toD("sy")})"
      val cxy = s"(n * ${toD("sxy")} - CAST(sx AS DOUBLE) * ${toD("sy")})"
      val slope = s"(($cyy - $cxx + sqrt(($cyy - $cxx) * ($cyy - $cxx) + 4 * $cxy * $cxy)) / (2 * $cxy))"
      s"""WITH m AS (
        | SELECT count(*) AS n,
        |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS HUGEINT) AS sx,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS sy,
        |  CAST(sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)) AS HUGEINT) AS sxx,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS syy,
        |  CAST(sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS sxy
        | FROM lineitem)
        |SELECT n,
        | CAST(round($slope * 1000000) AS BIGINT) AS slope_micro,
        | CAST(round((${toD("sy")} / n - $slope * (CAST(sx AS DOUBLE) / n))
        |   * 1000000) AS BIGINT) AS intercept_micro
        |FROM m""".stripMargin
    },
    "q_gumbel_fit" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        | FROM orders GROUP BY 1),
        |maxima AS (
        | SELECT CAST(year(day) * 12 + month(day) AS BIGINT) AS m,
        |   max(rev_c) AS mx
        | FROM daily GROUP BY 1),
        |mm AS (
        | SELECT count(*) AS k, CAST(sum(mx) AS HUGEINT) AS sx,
        |   CAST(sum(CAST(mx AS HUGEINT) * mx) AS HUGEINT) AS sxx
        | FROM maxima)
        |SELECT k AS n_blocks,
        | CAST(round(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / k)) / (k - 1))
        |   * 0.7796968012336761E0, 6) AS DOUBLE) AS sigma_c,
        | CAST(round(CAST(sx AS DOUBLE) / k
        |   - 0.5772156649015329E0 * (sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / k)) / (k - 1))
        |     * 0.7796968012336761E0), 6) AS DOUBLE) AS mu_c
        |FROM mm""".stripMargin,
    "q_jackknife_ratio" ->
      """WITH bn AS (
        | SELECT c_nationkey AS nk,
        |   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev,
        |   CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        | FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | GROUP BY 1),
        |tot AS (
        | SELECT CAST(sum(rev) AS BIGINT) AS trev, CAST(sum(qty) AS BIGINT) AS tqty,
        |   count(*) AS k
        | FROM bn),
        |loo AS (
        | SELECT k, CAST(trev AS DOUBLE) / tqty AS theta_hat,
        |   CAST(trev - rev AS DOUBLE) / CAST(tqty - qty AS DOUBLE) AS theta_i
        | FROM bn, tot)
        |SELECT any_value(k) AS k_groups,
        | CAST(round(any_value(theta_hat), 6) AS DOUBLE) AS ratio_c_per_unit,
        | CAST(round(sqrt((any_value(k) - 1.0) / any_value(k)
        |   * (sum(theta_i * theta_i) - sum(theta_i) * (sum(theta_i) / any_value(k)))), 6)
        |   AS DOUBLE) AS jackknife_se
        |FROM loo""".stripMargin,
    "q_seqlen_histogram" ->
      """WITH t AS (
        | SELECT len(list_filter(string_split_regex(trim(text), '\s+'),
        |   w -> length(w) > 0)) AS n_tok
        | FROM documents),
        |b AS (SELECT n_tok, CAST(length(bin(n_tok)) - 1 AS BIGINT) AS bucket
        |      FROM t),
        |tot AS (SELECT count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_toks
        |        FROM b)
        |SELECT bucket, count(*) AS docs, CAST(sum(n_tok) AS BIGINT) AS toks,
        | CAST(min(n_tok) AS BIGINT) AS min_tok, CAST(max(n_tok) AS BIGINT) AS max_tok,
        | (count(*) * 1000000) // any_value(n_docs) AS doc_ppm,
        | (CAST(sum(n_tok) AS BIGINT) * 1000000) // any_value(n_toks) AS tok_ppm
        |FROM b, tot GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_embed_anisotropy" ->
      """WITH unitized AS (
        | SELECT vec_id,
        |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)
        |    / sqrt(list_sum(list_transform(embedding,
        |        e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE))))
        |    * 1000000) AS BIGINT)) AS um
        | FROM embeddings),
        |comps AS (
        | SELECT i, CAST(sum(um[i]) AS HUGEINT) AS sx
        | FROM unitized, range(1, 65) t(i)
        | GROUP BY i),
        |n_ AS (SELECT count(*) AS n_vecs FROM unitized),
        |agg AS (
        | SELECT CAST(sum(sx * sx) AS HUGEINT) AS norm2_micro2 FROM comps)
        |SELECT CAST(n_vecs AS BIGINT) AS n_vecs,
        | CAST(round(CAST(norm2_micro2 AS DOUBLE)
        |   / (CAST(n_vecs AS DOUBLE) * n_vecs) / 1000000000000.0, 6) AS DOUBLE)
        |   AS mean_vec_norm2,
        | CAST(round((CAST(norm2_micro2 AS DOUBLE)
        |   / (CAST(n_vecs AS DOUBLE) * n_vecs) / 1000000000000.0 * n_vecs - 1)
        |   / (n_vecs - 1), 6) AS DOUBLE) AS avg_pairwise_cos
        |FROM agg, n_""".stripMargin,
  )
}
