package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions.tokens

/** r9 batch 30: count-of-counts corpus estimators — Chao1 unseen-
  * vocabulary richness, Good–Turing discounts, and distinct-n
  * diversity. All three live entirely on the token count-of-counts
  * frame: exact integers end to end.
  */
object Analytics48 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Chao1 species-richness estimate per source: V + F₁²/(2F₂) with
    * the correction term as an exact floor (F₁ = hapax, F₂ = dis
    * legomena) — how much vocabulary the crawl HASN'T seen yet. The
    * bias-corrected form F₁(F₁−1)/(2(F₂+1)) rides along (defined even
    * when F₂ = 0).
    *
    * 100 TB shape: token census → count-of-counts → 20-row readout. */
  val qChao1: Q = (s, d) => {
    val cc = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(count(lit(1)).as("v"),
        sum((col("c") === 1).cast("long")).as("f1"),
        sum((col("c") === 2).cast("long")).as("f2"))
    cc.select(col("source"), col("v"), col("f1"), col("f2"),
        expr("v + (f1 * f1) div (2 * greatest(f2, 1))").as("chao1"),
        expr("v + (f1 * (f1 - 1)) div (2 * (f2 + 1))").as("chao1_bc"))
      .orderBy("source")
  }

  /** Good–Turing smoothed counts r* = (r+1)·N_{r+1}/N_r for r = 1..5
    * over the word-TRIGRAM frequency spectrum (this corpus's unigram
    * spectrum has no rare types — ~50 words, thousands of occurrences
    * each; trigrams keep N₁..N₆ populated at every SF), exact milli
    * units — the discount table under Katz backoff. N₀ mass (the
    * unseen probability) = N₁/N in ppm.
    *
    * 100 TB shape: trigram census → count-of-counts (bounded by max
    * frequency) → 5-row readout. */
  val qGoodTuring: Q = (s, d) => {
    val grams = Tables.documents(s, d)
      .withColumn("ws", filter(tokens(col("text")), w => length(w) > 0))
      .filter(size(col("ws")) >= 3)
      .select(explode(expr(
        """transform(sequence(1, size(ws) - 2),
           i -> concat(element_at(ws, CAST(i AS INT)), ' ',
                element_at(ws, CAST(i + 1 AS INT)), ' ',
                element_at(ws, CAST(i + 2 AS INT))))""")).as("w"))
    val spectrum = grams.groupBy("w").agg(count(lit(1)).as("c"))
      .groupBy("c").agg(count(lit(1)).as("n_r"))
    val tot = grams.agg(count(lit(1)).as("n_tokens"))
    val nr1 = spectrum.select((col("c") - 1).as("c"), col("n_r").as("n_r1"))
    spectrum.join(nr1, "c")
      .filter(col("c").between(1, 5))
      .join(broadcast(spectrum.filter(col("c") === 1)
        .select(col("n_r").as("f1"))))
      .join(broadcast(tot))
      .select(col("c").as("r"), col("n_r"), col("n_r1").as("n_r_plus1"),
        expr("((r + 1) * n_r_plus1 * 1000) div n_r").as("r_star_milli"),
        expr("(f1 * 1000000) div n_tokens").as("p0_ppm"))
      .orderBy("r")
  }

  /** Distinct-n diversity (Li et al. 2016) per source: unique
    * unigrams and bigrams over their totals in exact ppm — the
    * repetitiveness readout generation evals report as distinct-1/2.
    *
    * 100 TB shape: two map-side-combinable censuses (token and
    * adjacent-bigram), one 20-row readout. */
  val qDistinctN: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .withColumn("ws", filter(tokens(col("text")), w => length(w) > 0))
    val uni = toks.select(col("source"), explode(col("ws")).as("g"))
      .groupBy("source")
      .agg(countDistinct("g").as("d1"), count(lit(1)).as("n1"))
    val bi = toks.filter(size(col("ws")) >= 2)
      .select(col("source"), explode(expr(
        """zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),
           (a, b) -> concat(a, ' ', b))""")).as("g"))
      .groupBy("source")
      .agg(countDistinct("g").as("d2"), count(lit(1)).as("n2"))
    uni.join(bi, "source")
      .select(col("source"), col("d1"), col("n1"), col("d2"), col("n2"),
        expr("(d1 * 1000000) div n1").as("distinct1_ppm"),
        expr("(d2 * 1000000) div n2").as("distinct2_ppm"))
      .orderBy("source")
  }

  val all: Map[String, Q] = Map(
    "q_chao1" -> qChao1,
    "q_good_turing" -> qGoodTuring,
    "q_distinct_n" -> qDistinctN,
  )

  val oracles: Map[String, String] = Map(
    "q_chao1" ->
      """WITH cnt AS (
        | SELECT source, w, count(*) AS c
        | FROM (SELECT source,
        |         unnest(string_split_regex(trim(text), '\s+')) AS w
        |       FROM documents) u
        | WHERE length(w) > 0 GROUP BY 1, 2),
        |cc AS (
        | SELECT source, count(*) AS v,
        |   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |   CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        | FROM cnt GROUP BY source)
        |SELECT source, v, f1, f2,
        | CAST(v + (f1 * f1) // (2 * greatest(f2, 1)) AS BIGINT) AS chao1,
        | CAST(v + (f1 * (f1 - 1)) // (2 * (f2 + 1)) AS BIGINT) AS chao1_bc
        |FROM cc ORDER BY source""".stripMargin,
    "q_good_turing" ->
      """WITH dd AS (
        | SELECT list_filter(string_split_regex(trim(text), '\s+'),
        |   w -> length(w) > 0) AS ws
        | FROM documents),
        |toks AS (
        | SELECT unnest(list_transform(range(1, len(ws) - 1),
        |   i -> ws[CAST(i AS INT)] || ' ' || ws[CAST(i + 1 AS INT)]
        |     || ' ' || ws[CAST(i + 2 AS INT)])) AS w
        | FROM dd WHERE len(ws) >= 3),
        |spectrum AS (
        | SELECT c, count(*) AS n_r
        | FROM (SELECT w, count(*) AS c FROM toks GROUP BY w) t
        | GROUP BY c),
        |tot AS (SELECT count(*) AS n_tokens FROM toks),
        |f1_ AS (SELECT n_r AS f1 FROM spectrum WHERE c = 1)
        |SELECT s.c AS r, s.n_r, s1.n_r AS n_r_plus1,
        | CAST(((s.c + 1) * s1.n_r * 1000) // s.n_r AS BIGINT) AS r_star_milli,
        | CAST((f1 * 1000000) // n_tokens AS BIGINT) AS p0_ppm
        |FROM spectrum s
        |JOIN spectrum s1 ON s1.c = s.c + 1
        |CROSS JOIN f1_ CROSS JOIN tot
        |WHERE s.c BETWEEN 1 AND 5
        |ORDER BY r""".stripMargin,
    "q_distinct_n" ->
      """WITH docs AS (
        | SELECT source,
        |   list_filter(string_split_regex(trim(text), '\s+'),
        |     w -> length(w) > 0) AS ws
        | FROM documents),
        |uni AS (
        | SELECT source, count(DISTINCT g) AS d1, count(*) AS n1
        | FROM (SELECT source, unnest(ws) AS g FROM docs) u GROUP BY source),
        |bi AS (
        | SELECT source, count(DISTINCT g) AS d2, count(*) AS n2
        | FROM (
        |  SELECT source, unnest(list_transform(range(1, len(ws)),
        |    i -> ws[CAST(i AS INT)] || ' ' || ws[CAST(i + 1 AS INT)])) AS g
        |  FROM docs WHERE len(ws) >= 2) b
        | GROUP BY source)
        |SELECT source, d1, CAST(n1 AS BIGINT) AS n1, d2, CAST(n2 AS BIGINT) AS n2,
        | (d1 * 1000000) // n1 AS distinct1_ppm,
        | (d2 * 1000000) // n2 AS distinct2_ppm
        |FROM uni JOIN bi USING (source) ORDER BY source""".stripMargin,
  )
}
