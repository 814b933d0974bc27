package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions.tokens

/** r9 batch 20: the LLM-tokenization/dedup layer rounded out with
  * fully ORACLE-CERTIFIABLE variants — a GPT-style pretokenizer
  * fertility census, RAKE keyphrase extraction, a portable md5 SimHash
  * whose banded Hamming histogram DuckDB replays bit-for-bit (the
  * oracle-green counterpart of the xxhash-based q_dedup_simhash), and
  * iterative proportional fitting with integer-ppm weights.
  */
object Analytics38 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Pretokenizer fertility: whitespace tokens vs GPT-style regex
    * pretokens (letter runs / digit runs / single punctuation —
    * ASCII classes, identical in Java regex and RE2) per language,
    * fertility in exact ppm. The planning number behind every "how
    * many tokens is this corpus really" estimate.
    *
    * 100 TB shape: two regexp_count projections in the scan, one
    * 5-row agg. */
  val qPretokenize: Q = (s, d) => {
    Tables.documents(s, d)
      .select(col("lang"),
        expr("size(filter(split(trim(text), '\\\\s+'), w -> length(w) > 0))")
          .cast("long").as("n_ws"),
        expr("regexp_count(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]')")
          .cast("long").as("n_pre"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_ws").as("ws_tokens"),
        sum("n_pre").as("pre_tokens"))
      .withColumn("fertility_ppm", expr("(pre_tokens * 1000000) div ws_tokens"))
      .orderBy("lang")
  }

  /** RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    * are maximal stopword-free token runs (run id = cumulative
    * stopword count per doc — one window, no regex split ambiguity);
    * word score = deg/freq over the phrase corpus in floor-ppm; a
    * phrase scores the sum of its words' ppm scores (integer). Top 10
    * phrases of length 2..4 by (score, phrase).
    *
    * 100 TB shape: posexplode → per-doc cumsum window → two
    * token-keyed censuses; everything downstream is phrase-keyed and
    * map-side combinable. */
  val qRakeKeyphrases: Q = (s, d) => {
    val stop = "('the','a','of','and','to','in','is','for','on','with')"
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(lower(col("text")))).as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
      .withColumn("is_stop", expr(s"CAST(w IN $stop AS INT)"))
    val wd = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, 0)
    val runs = toks.withColumn("run_id", sum("is_stop").over(wd))
      .filter(col("is_stop") === 0)
    val phrases = runs.groupBy("doc_id", "run_id")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(pos, w))), x -> x.w), ' ')")
        .as("phrase"),
        count(lit(1)).as("plen"))
      .filter(col("plen").between(2, 4))
    val wordStats = runs
      .join(phrases.select("doc_id", "run_id", "plen"), Seq("doc_id", "run_id"))
      .groupBy("w")
      .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
      .withColumn("score_ppm", expr("(deg * 1000000) div freq"))
    val scored = runs
      .join(phrases, Seq("doc_id", "run_id"))
      .join(wordStats.select("w", "score_ppm"), "w")
      .groupBy("doc_id", "run_id", "phrase")
      .agg(sum("score_ppm").as("phrase_score_ppm"))
    scored.groupBy("phrase")
      .agg(count(lit(1)).as("n_occurrences"),
        max("phrase_score_ppm").as("score_ppm"))
      .orderBy(col("score_ppm").desc, col("phrase"))
      .limit(10)
  }

  /** Portable 32-bit SimHash (md5-derived token hash bits, majority
    * vote with the deterministic votes>0 rule) + the banded Hamming
    * histogram: docs sharing the top-8-bit band pair up, and the
    * pairwise bit_count(xor) census is the near-dup radar. Unlike
    * q_dedup_simhash (engine-native xxhash, rows-only), every bit here
    * replays in DuckDB — the signature path itself is oracle-certified.
    *
    * 100 TB shape: token census → 32-way bit explode collapses
    * immediately into (doc, bit) partial sums; banding makes the pair
    * stage Σ|band|², the LSH bound. */
  val qSimhashPortable: Q = (s, d) => {
    // fan out the one-row-group doc scan (r15): the tokenize+explode+md5
    // +partial-distinct map side otherwise runs single-task (measured
    // 3.4 s of the query's 4.3 s in ONE 2-task job at sf0.1)
    val dt = graft.operators.Scale.fanOutScan(Tables.documents(s, d))
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .withColumn("h", expr("CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)"))
    // ONE bit-count aggregation instead of a 32× row explode through two
    // aggregations (r15): the former transform/named_struct/pow() chain
    // evaluated 32 struct allocations + double pow()s per (doc, token)
    // row — measured as a 3.4 s stage holding most of the query at
    // sf0.1. Exact integer identity with the oracle's formulation:
    // vote_k = Σ_tokens ±1 = 2·|{tokens: bit k set}| − n_tokens, and
    // (h div 2^k) % 2 = (h >> k) & 1 for the nonnegative 32-bit md5
    // word — so sig is bit-identical and the DuckDB replay is untouched.
    val bitSums = dt.groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        (0 until 32).map(k =>
          sum(shiftright(col("h"), k).bitwiseAND(lit(1L))).as(s"s$k")): _*)
    val sigs = bitSums.select(col("doc_id"),
        (0 until 32).map(k =>
          when(lit(2L) * col(s"s$k") > col("n"), lit(1L << k)).otherwise(lit(0L)))
          .reduce(_ + _).as("sig"))
      .withColumn("band", expr("sig div 16777216"))
    sigs.as("a").join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(expr("bit_count(a.sig ^ b.sig)").as("hamming"))
      .groupBy("hamming").agg(count(lit(1)).as("n_pairs"))
      .select(col("hamming").cast("long").as("hamming"), col("n_pairs"))
      .orderBy("hamming")
  }

  /** Iterative proportional fitting (raking): the priority×status cell
    * counts from the EVEN half of orders are raked in 3 row/column
    * rounds to match the FULL table's margins — survey weighting's
    * workhorse. Weights live in integer ppm with one floor-div receipt
    * per cell per half-round (documented); margin residuals are
    * emitted so convergence is visible.
    *
    * 100 TB shape: the fact collapses to a 15-cell frame + two margin
    * frames; the iteration is frame-sized joins, unrolled (no
    * driver loop state). */
  val qIpfRaking: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_orderpriority").as("r"), col("o_orderstatus").as("c"),
        col("o_orderkey"))
    // localCheckpoint the three fact-derived frames ONCE (the PageRank
    // discipline): six unrolled rake rounds otherwise re-derive the
    // orders scan through an exponentially reused lineage
    val seed = o.filter(col("o_orderkey") % 2 === 0)
      .groupBy("r", "c").agg(count(lit(1)).as("n0"))
      .withColumn("w", expr("n0 * 1000000"))
      .coalesce(1).localCheckpoint()
    val rowT = o.groupBy("r").agg(count(lit(1)).as("rt"))
      .coalesce(1).localCheckpoint()
    val colT = o.groupBy("c").agg(count(lit(1)).as("ct"))
      .coalesce(1).localCheckpoint()
    // each half-round is a WINDOW normalization over the 15-cell frame
    // (margin sums via partition windows — no per-round agg+join jobs;
    // the whole 6-round chain is ONE plan)
    val base = seed.join(broadcast(rowT), "r").join(broadcast(colT), "c")
    def rakeRows(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("w", expr(
        """CAST((CAST(w AS DECIMAL(38,0)) * rt * 1000000)
           div (sum(w) OVER (PARTITION BY r)) AS BIGINT)"""))
    def rakeCols(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("w", expr(
        """CAST((CAST(w AS DECIMAL(38,0)) * ct * 1000000)
           div (sum(w) OVER (PARTITION BY c)) AS BIGINT)"""))
    val raked = rakeCols(rakeRows(rakeCols(rakeRows(rakeCols(rakeRows(base))))))
      .select("r", "c", "n0", "w")
    val rowGap = raked.groupBy("r").agg(sum("w").as("rsum"))
      .join(broadcast(rowT), "r")
      .select(col("r"), expr("rsum - rt * 1000000").as("row_gap_ppm"))
    raked.join(broadcast(rowGap), "r")
      .select(col("r"), col("c"), col("n0"), col("w").as("w_ppm"), col("row_gap_ppm"))
      .orderBy("r", "c")
  }

  val all: Map[String, Q] = Map(
    "q_pretokenize" -> qPretokenize,
    "q_rake_keyphrases" -> qRakeKeyphrases,
    "q_simhash_portable" -> qSimhashPortable,
    "q_ipf_raking" -> qIpfRaking,
  )

  val oracles: Map[String, String] = Map(
    "q_pretokenize" ->
      """WITH t AS (
        | SELECT lang,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |    w -> length(w) > 0)) AS n_ws,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
        |    AS n_pre
        | FROM documents)
        |SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_ws) AS BIGINT) AS ws_tokens,
        | CAST(sum(n_pre) AS BIGINT) AS pre_tokens,
        | (CAST(sum(n_pre) AS BIGINT) * 1000000) // CAST(sum(n_ws) AS BIGINT)
        |   AS fertility_ppm
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    "q_rake_keyphrases" ->
      """WITH toks AS (
        | SELECT doc_id, pos, w,
        |  CASE WHEN w IN ('the','a','of','and','to','in','is','for','on','with')
        |    THEN 1 ELSE 0 END AS is_stop
        | FROM (
        |  SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |            x -> length(x) > 0) AS ws
        |        FROM documents) t0) t1),
        |runs AS (
        | SELECT doc_id, pos, w,
        |   sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        | FROM toks WHERE is_stop = 0
        |   OR is_stop = 1),
        |content AS (SELECT * FROM runs WHERE w NOT IN
        |  ('the','a','of','and','to','in','is','for','on','with')),
        |phrases AS (
        | SELECT doc_id, run_id,
        |   string_agg(w, ' ' ORDER BY pos) AS phrase, count(*) AS plen
        | FROM content GROUP BY 1, 2
        | HAVING count(*) BETWEEN 2 AND 4),
        |ws AS (
        | SELECT w, count(*) AS freq, CAST(sum(plen) AS BIGINT) AS deg,
        |   (CAST(sum(plen) AS BIGINT) * 1000000) // count(*) AS score_ppm
        | FROM content JOIN phrases USING (doc_id, run_id)
        | GROUP BY w),
        |scored AS (
        | SELECT doc_id, run_id, phrase,
        |   CAST(sum(score_ppm) AS BIGINT) AS phrase_score_ppm
        | FROM content JOIN phrases USING (doc_id, run_id)
        | JOIN ws USING (w)
        | GROUP BY 1, 2, 3)
        |SELECT phrase, count(*) AS n_occurrences,
        | CAST(max(phrase_score_ppm) AS BIGINT) AS score_ppm
        |FROM scored GROUP BY phrase
        |ORDER BY score_ppm DESC, phrase LIMIT 10""".stripMargin,
    "q_simhash_portable" ->
      """WITH dt AS (
        | SELECT DISTINCT doc_id, w,
        |  CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) AS h
        | FROM (SELECT doc_id,
        |         unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |       FROM documents) u
        | WHERE length(w) > 0),
        |votes AS (
        | SELECT doc_id, k,
        |   CAST(sum(CASE WHEN (h // CAST(pow(2, k) AS BIGINT)) % 2 = 1
        |     THEN 1 ELSE -1 END) AS BIGINT) AS vote
        | FROM dt, range(0, 32) t(k) GROUP BY 1, 2),
        |sigs AS (
        | SELECT doc_id,
        |   CAST(sum(CASE WHEN vote > 0 THEN CAST(pow(2, k) AS BIGINT) ELSE 0 END)
        |     AS BIGINT) AS sig
        | FROM votes GROUP BY doc_id),
        |banded AS (SELECT doc_id, sig, sig // 16777216 AS band FROM sigs)
        |SELECT CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming,
        | count(*) AS n_pairs
        |FROM banded a JOIN banded b
        | ON a.band = b.band AND a.doc_id < b.doc_id
        |GROUP BY 1 ORDER BY hamming""".stripMargin,
    "q_ipf_raking" ->
      """WITH o AS (
        | SELECT o_orderpriority AS r, o_orderstatus AS c, o_orderkey FROM orders),
        |seed AS (
        | SELECT r, c, count(*) AS n0, count(*) * 1000000 AS w
        | FROM o WHERE o_orderkey % 2 = 0 GROUP BY 1, 2),
        |rt AS (SELECT r, count(*) AS rt FROM o GROUP BY r),
        |ct AS (SELECT c, count(*) AS ct FROM o GROUP BY c),
        |i1 AS (
        | SELECT s.r, s.c, n0,
        |  CAST((CAST(w AS HUGEINT) * rt.rt * 1000000)
        |    // (sum(w) OVER (PARTITION BY s.r)) AS BIGINT) AS w
        | FROM seed s JOIN rt ON s.r = rt.r),
        |i2 AS (
        | SELECT i1.r, i1.c, n0,
        |  CAST((CAST(w AS HUGEINT) * ct.ct * 1000000)
        |    // (sum(w) OVER (PARTITION BY i1.c)) AS BIGINT) AS w
        | FROM i1 JOIN ct ON i1.c = ct.c),
        |i3 AS (
        | SELECT i2.r, i2.c, n0,
        |  CAST((CAST(w AS HUGEINT) * rt.rt * 1000000)
        |    // (sum(w) OVER (PARTITION BY i2.r)) AS BIGINT) AS w
        | FROM i2 JOIN rt ON i2.r = rt.r),
        |i4 AS (
        | SELECT i3.r, i3.c, n0,
        |  CAST((CAST(w AS HUGEINT) * ct.ct * 1000000)
        |    // (sum(w) OVER (PARTITION BY i3.c)) AS BIGINT) AS w
        | FROM i3 JOIN ct ON i3.c = ct.c),
        |i5 AS (
        | SELECT i4.r, i4.c, n0,
        |  CAST((CAST(w AS HUGEINT) * rt.rt * 1000000)
        |    // (sum(w) OVER (PARTITION BY i4.r)) AS BIGINT) AS w
        | FROM i4 JOIN rt ON i4.r = rt.r),
        |i6 AS (
        | SELECT i5.r, i5.c, n0,
        |  CAST((CAST(w AS HUGEINT) * ct.ct * 1000000)
        |    // (sum(w) OVER (PARTITION BY i5.c)) AS BIGINT) AS w
        | FROM i5 JOIN ct ON i5.c = ct.c),
        |gap AS (
        | SELECT r, CAST(sum(w) - any_value(rt.rt) * 1000000 AS BIGINT)
        |   AS row_gap_ppm
        | FROM i6 JOIN rt USING (r) GROUP BY r)
        |SELECT i6.r AS r, i6.c AS c, CAST(n0 AS BIGINT) AS n0, w AS w_ppm,
        | row_gap_ppm
        |FROM i6 JOIN gap ON i6.r = gap.r
        |ORDER BY i6.r, i6.c""".stripMargin,
  )
}
