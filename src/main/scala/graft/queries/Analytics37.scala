package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 19: the signal-processing tail of the time-series layer —
  * Haar wavelet energy decomposition, partial autocorrelation,
  * Grubbs' outlier statistic, lead–lag cross-correlation, and SAX
  * symbolization motifs. Wavelet coefficients are UNNORMALIZED integer
  * cents (the √2 factors become documented powers of two); SAX
  * breakpoints are 16-digit N(0,1) quartile literals; everything else
  * follows the exact-moment + 6dp-readout discipline.
  */
object Analytics37 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  private def dailyArr(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
      .agg(count(lit(1)).as("n_days"),
        expr("transform(array_sort(collect_list(struct(day, rev_c))), x -> x.rev_c)")
          .as("ys"))

  /** Three-level unnormalized Haar decomposition of daily revenue:
    * at each level, pairs (x₂ᵢ₋₁, x₂ᵢ) become approx sums and detail
    * differences (integer cents; the orthonormal 1/√2 scalings are
    * the documented 2^level factors on the energies, kept OUT of the
    * engine so everything stays integral; odd tails drop). Detail
    * energies Σd² in DECIMAL — the scale-vs-noise budget of the
    * series in three numbers.
    *
    * 100 TB shape: fact → |days| array; three transform/aggregate
    * passes over ≤2.4k elements on one core (the bounded-frame
    * exception class). */
  val qWaveletEnergy: Q = (s, d) => {
    def down(src: String, n: String) =
      s"transform(sequence(1, $n div 2), i -> element_at($src, CAST(2 * i - 1 AS INT)) + element_at($src, CAST(2 * i AS INT)))"
    def detail(src: String, n: String) =
      s"transform(sequence(1, $n div 2), i -> CAST(element_at($src, CAST(2 * i - 1 AS INT)) - element_at($src, CAST(2 * i AS INT)) AS DECIMAL(38,0)))"
    def energy(arr: String) =
      s"aggregate($arr, CAST(0 AS DECIMAL(38,0)), (a, x) -> a + x * x)"
    dailyArr(s, d)
      .withColumn("a1", expr(down("ys", "size(ys)")))
      .withColumn("e1", expr(energy(detail("ys", "size(ys)"))))
      .withColumn("a2", expr(down("a1", "size(a1)")))
      .withColumn("e2", expr(energy(detail("a1", "size(a1)"))))
      .withColumn("e3", expr(energy(detail("a2", "size(a2)"))))
      .select(col("n_days"),
        expr("CAST(e1 AS DECIMAL(38,0))").cast("double").as("d1_energy"),
        expr("CAST(e2 AS DECIMAL(38,0))").cast("double").as("d2_energy"),
        expr("CAST(e3 AS DECIMAL(38,0))").cast("double").as("d3_energy"))
  }

  /** Partial autocorrelation at lags 1 and 2 of daily revenue via
    * Durbin–Levinson: φ₁₁ = r₁, φ₂₂ = (r₂ − r₁²)/(1 − r₁²), with each
    * rₖ a Pearson correlation over the n−k overlapping pairs from
    * exact integer window moments (lead() on the bounded daily
    * frame) — is yesterday's signal direct or just carried? (The
    * partial complement of q_autocorr.)
    *
    * 100 TB shape: two lead windows + two moment aggs over |days|. */
  val qPacf: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
    val w = Window.orderBy("day")
    val led = daily
      .withColumn("x1", lead("x", 1).over(w))
      .withColumn("x2", lead("x", 2).over(w))
    def r(lagCol: String) = {
      val m = led.filter(col(lagCol).isNotNull)
        .select(col("x").cast("decimal(38,0)").as("a"),
          col(lagCol).cast("decimal(38,0)").as("b"))
        .agg(count(lit(1)).as("n"), sum("a").as("sa"), sum("b").as("sb"),
          sum(col("a") * col("a")).as("saa"), sum(col("b") * col("b")).as("sbb"),
          sum(col("a") * col("b")).as("sab"))
      m.select(expr(
        """(n * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
           / (sqrt(n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
            * sqrt(n * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))""")
        .as("r"))
    }
    r("x1").select(col("r").as("r1"))
      .join(broadcast(r("x2").select(col("r").as("r2"))))
      .select(
        expr("CAST(round(r1, 6) AS DOUBLE)").as("pacf1"),
        expr("CAST(round((r2 - r1 * r1) / (1 - r1 * r1), 6) AS DOUBLE)").as("pacf2"))
  }

  /** Grubbs' outlier statistic on order prices: G = max|x−x̄|/s from
    * exact moments plus min/max (no per-row z pass — the extreme
    * deviation is max(max−x̄, x̄−min)). Emits G, the offending side,
    * and the extreme value.
    *
    * 100 TB shape: ONE partial-aggregable pass (moments + min/max). */
  val qGrubbs: Q = (s, d) => {
    Tables.orders(s, d)
      .select(expr("CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(38,0))").as("pc"))
      .agg(count(lit(1)).as("n"), sum("pc").as("sx"),
        sum(col("pc") * col("pc")).as("sxx"),
        min("pc").as("mn"), max("pc").as("mx"))
      .select(col("n"),
        expr("CAST(mx AS BIGINT)").as("max_c"), expr("CAST(mn AS BIGINT)").as("min_c"),
        expr("""CAST(CASE WHEN CAST(mx AS DOUBLE) - CAST(sx AS DOUBLE) / n
                >= CAST(sx AS DOUBLE) / n - CAST(mn AS DOUBLE) THEN 'high' ELSE 'low' END
                AS STRING)""").as("side"),
        expr("""CAST(round(greatest(CAST(mx AS DOUBLE) - CAST(sx AS DOUBLE) / n,
                  CAST(sx AS DOUBLE) / n - CAST(mn AS DOUBLE))
                / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / n))
                       / (n - 1)), 6) AS DOUBLE)""").as("g_stat"))
  }

  /** Lead–lag cross-correlation between the two largest nations'
    * daily revenue at lags −14..14 (day-index equi-join per lag — the
    * 29-lag frame broadcasts, so the "sweep" is one join): which
    * market moves first? Exact integer moments per lag; r in 6dp
    * doubles; the best row is flagged (max r, tie → smallest lag).
    *
    * 100 TB shape: two nation-filtered daily collapses, one
    * |days|×29 equi-join on (i+lag), 29 moment groups. */
  val qLeadLag: Q = (s, d) => {
    val rev = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)").as("i"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("v"))
    val top2 = rev.groupBy("nk").agg(sum("v").as("tot"))
      .orderBy(col("tot").desc, col("nk")).limit(2)
      .withColumn("rnk", expr("row_number() OVER (ORDER BY tot DESC, nk)"))
    val a = rev.join(broadcast(top2.filter(col("rnk") === 1).select("nk")), "nk")
      .select(col("i"), col("v").cast("decimal(38,0)").as("va"))
    val b = rev.join(broadcast(top2.filter(col("rnk") === 2).select("nk")), "nk")
      .select(col("i").as("j"), col("v").cast("decimal(38,0)").as("vb"))
    import s.implicits._
    val lags = broadcast((-14 to 14).toDF("lag"))
    val m = a.crossJoin(lags)
      .join(b, expr("j = i + lag"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n"), sum("va").as("sa"), sum("vb").as("sb"),
        sum(col("va") * col("va")).as("saa"), sum(col("vb") * col("vb")).as("sbb"),
        sum(col("va") * col("vb")).as("sab"))
      .withColumn("r", expr(
        """CAST(round((n * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
           / (sqrt(n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
            * sqrt(n * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6)
           AS DOUBLE)"""))
    val wBest = Window.orderBy(col("r").desc, col("lag"))
    m.withColumn("is_best", (row_number().over(wBest) === 1).cast("long"))
      .select(col("lag").cast("long").as("lag"), col("n"), col("r"), col("is_best"))
      .orderBy("lag")
  }

  /** SAX symbolization (Lin et al. 2003) of daily revenue into the
    * 4-symbol alphabet at the N(0,1) quartile breakpoints
    * (±0.6744897501960817 as literals), then the top-10 3-symbol
    * motifs — recurring weekly shapes as strings. The z-scores feed
    * comparisons only, computed identically in both engines from
    * exact moments.
    *
    * 100 TB shape: |days| frame; the motif census is ≤64 keys. */
  val qSaxMotifs: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
    val mm = daily.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
    val sym = daily.join(broadcast(mm))
      .withColumn("z", expr(
        """(x - CAST(sx AS DOUBLE) / n)
           / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / n))
                  / (n - 1))"""))
      .withColumn("sym", expr(
        """CASE WHEN z < -0.6744897501960817E0 THEN 'a'
           WHEN z < 0.0 THEN 'b'
           WHEN z < 0.6744897501960817E0 THEN 'c' ELSE 'd' END"""))
    val w = Window.orderBy("day")
    val motifs = sym
      .withColumn("s1", lead("sym", 1).over(w))
      .withColumn("s2", lead("sym", 2).over(w))
      .filter(col("s2").isNotNull)
      .select(concat(col("sym"), col("s1"), col("s2")).as("motif"))
    motifs.groupBy("motif").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("motif")).limit(10)
  }

  val all: Map[String, Q] = Map(
    "q_wavelet_energy" -> qWaveletEnergy,
    "q_pacf" -> qPacf,
    "q_grubbs" -> qGrubbs,
    "q_lead_lag" -> qLeadLag,
    "q_sax_motifs" -> qSaxMotifs,
  )

  val oracles: Map[String, String] = Map(
    "q_wavelet_energy" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        | FROM orders GROUP BY 1),
        |arr AS (
        | SELECT count(*) AS n_days, list(rev_c ORDER BY day) AS ys FROM daily),
        |l1 AS (
        | SELECT n_days, ys,
        |  list_transform(range(1, len(ys) // 2 + 1),
        |    i -> ys[CAST(2 * i - 1 AS INT)] + ys[CAST(2 * i AS INT)]) AS a1,
        |  list_sum(list_transform(range(1, len(ys) // 2 + 1),
        |    i -> CAST(ys[CAST(2 * i - 1 AS INT)] - ys[CAST(2 * i AS INT)] AS HUGEINT)
        |       * (ys[CAST(2 * i - 1 AS INT)] - ys[CAST(2 * i AS INT)]))) AS e1
        | FROM arr),
        |l2 AS (
        | SELECT n_days, e1,
        |  list_transform(range(1, len(a1) // 2 + 1),
        |    i -> a1[CAST(2 * i - 1 AS INT)] + a1[CAST(2 * i AS INT)]) AS a2,
        |  list_sum(list_transform(range(1, len(a1) // 2 + 1),
        |    i -> CAST(a1[CAST(2 * i - 1 AS INT)] - a1[CAST(2 * i AS INT)] AS HUGEINT)
        |       * (a1[CAST(2 * i - 1 AS INT)] - a1[CAST(2 * i AS INT)]))) AS e2
        | FROM l1),
        |l3 AS (
        | SELECT n_days, e1, e2,
        |  list_sum(list_transform(range(1, len(a2) // 2 + 1),
        |    i -> CAST(a2[CAST(2 * i - 1 AS INT)] - a2[CAST(2 * i AS INT)] AS HUGEINT)
        |       * (a2[CAST(2 * i - 1 AS INT)] - a2[CAST(2 * i AS INT)]))) AS e3
        | FROM l2)
        |SELECT CAST(n_days AS BIGINT) AS n_days,
        | CAST(e1 AS DOUBLE) AS d1_energy, CAST(e2 AS DOUBLE) AS d2_energy,
        | CAST(e3 AS DOUBLE) AS d3_energy
        |FROM l3""".stripMargin,
    "q_pacf" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        | FROM orders GROUP BY 1),
        |led AS (
        | SELECT x, lead(x, 1) OVER (ORDER BY day) AS x1,
        |   lead(x, 2) OVER (ORDER BY day) AS x2
        | FROM daily),
        |m1 AS (
        | SELECT count(*) AS n, CAST(sum(x) AS HUGEINT) AS sa,
        |  CAST(sum(x1) AS HUGEINT) AS sb,
        |  CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS saa,
        |  CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS sbb,
        |  CAST(sum(CAST(x AS HUGEINT) * x1) AS HUGEINT) AS sab
        | FROM led WHERE x1 IS NOT NULL),
        |m2 AS (
        | SELECT count(*) AS n, CAST(sum(x) AS HUGEINT) AS sa,
        |  CAST(sum(x2) AS HUGEINT) AS sb,
        |  CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS saa,
        |  CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS sbb,
        |  CAST(sum(CAST(x AS HUGEINT) * x2) AS HUGEINT) AS sab
        | FROM led WHERE x2 IS NOT NULL),
        |r1_ AS (
        | SELECT (n * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
        |   / (sqrt(n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |    * sqrt(n * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
        |   AS r1 FROM m1),
        |r2_ AS (
        | SELECT (n * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
        |   / (sqrt(n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |    * sqrt(n * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
        |   AS r2 FROM m2)
        |SELECT CAST(round(r1, 6) AS DOUBLE) AS pacf1,
        | CAST(round((r2 - r1 * r1) / (1 - r1 * r1), 6) AS DOUBLE) AS pacf2
        |FROM r1_, r2_""".stripMargin,
    "q_grubbs" ->
      """WITH m AS (
        | SELECT count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS HUGEINT) AS sx,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)
        |    * CAST(round(o_totalprice * 100) AS BIGINT)) AS HUGEINT) AS sxx,
        |  min(CAST(round(o_totalprice * 100) AS BIGINT)) AS mn,
        |  max(CAST(round(o_totalprice * 100) AS BIGINT)) AS mx
        | FROM orders)
        |SELECT n, mx AS max_c, mn AS min_c,
        | CASE WHEN CAST(mx AS DOUBLE) - CAST(sx AS DOUBLE) / n
        |   >= CAST(sx AS DOUBLE) / n - CAST(mn AS DOUBLE) THEN 'high' ELSE 'low' END
        |   AS side,
        | CAST(round(greatest(CAST(mx AS DOUBLE) - CAST(sx AS DOUBLE) / n,
        |     CAST(sx AS DOUBLE) / n - CAST(mn AS DOUBLE))
        |   / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / n))
        |          / (n - 1)), 6) AS DOUBLE) AS g_stat
        |FROM m""".stripMargin,
    "q_lead_lag" ->
      """WITH rev AS (
        | SELECT c_nationkey AS nk,
        |   date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS i,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | GROUP BY 1, 2),
        |top2 AS (
        | SELECT nk, row_number() OVER (ORDER BY sum(v) DESC, nk) AS rnk
        | FROM rev GROUP BY nk ORDER BY sum(v) DESC, nk LIMIT 2),
        |a AS (SELECT i, CAST(v AS HUGEINT) AS va FROM rev
        |      JOIN top2 USING (nk) WHERE rnk = 1),
        |b AS (SELECT i AS j, CAST(v AS HUGEINT) AS vb FROM rev
        |      JOIN top2 USING (nk) WHERE rnk = 2),
        |m AS (
        | SELECT lag, count(*) AS n,
        |  CAST(sum(va) AS HUGEINT) AS sa, CAST(sum(vb) AS HUGEINT) AS sb,
        |  CAST(sum(va * va) AS HUGEINT) AS saa, CAST(sum(vb * vb) AS HUGEINT) AS sbb,
        |  CAST(sum(va * vb) AS HUGEINT) AS sab
        | FROM a CROSS JOIN range(-14, 15) t(lag) JOIN b ON j = i + lag
        | GROUP BY lag),
        |r_ AS (
        | SELECT lag, n,
        |  CAST(round((n * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
        |   / (sqrt(n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |    * sqrt(n * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6)
        |   AS DOUBLE) AS r
        | FROM m)
        |SELECT CAST(lag AS BIGINT) AS lag, n, r,
        | CAST(CASE WHEN row_number() OVER (ORDER BY r DESC, lag) = 1
        |   THEN 1 ELSE 0 END AS BIGINT) AS is_best
        |FROM r_ ORDER BY lag""".stripMargin,
    "q_sax_motifs" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        | FROM orders GROUP BY 1),
        |mm AS (
        | SELECT count(*) AS n, CAST(sum(x) AS HUGEINT) AS sx,
        |   CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
        | FROM daily),
        |sym AS (
        | SELECT day,
        |  CASE WHEN z < -0.6744897501960817E0 THEN 'a'
        |   WHEN z < 0.0 THEN 'b'
        |   WHEN z < 0.6744897501960817E0 THEN 'c' ELSE 'd' END AS sym
        | FROM (
        |  SELECT day,
        |   (x - CAST(sx AS DOUBLE) / n)
        |   / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / n))
        |          / (n - 1)) AS z
        |  FROM daily, mm) t),
        |motifs AS (
        | SELECT sym || lead(sym, 1) OVER (ORDER BY day)
        |   || lead(sym, 2) OVER (ORDER BY day) AS motif
        | FROM sym)
        |SELECT motif, count(*) AS cnt
        |FROM motifs WHERE motif IS NOT NULL
        |GROUP BY motif ORDER BY cnt DESC, motif LIMIT 10""".stripMargin,
  )
}
