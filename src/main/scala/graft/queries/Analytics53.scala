package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions.tokens

/** r9 batch 35: sequence alignment and circular time — Needleman–
  * Wunsch global alignment scored via a DP-row fold (the LIS/HW array
  * machinery applied to the classic bioinformatics kernel), edit
  * distance between language head-vocabularies through both engines'
  * native levenshtein, and circular statistics of purchase time-of-day
  * with µ-rounded trig terms (order-free integer sums).
  */
object Analytics53 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Needleman–Wunsch global alignment score between the first-40-
    * token sequences of the two longest English documents (match +1,
    * mismatch/gap −1): the DP table folds row by row, each new row a
    * left-to-right inner fold building the array — both engines run
    * the identical integer recursion (Spark nested `aggregate`,
    * DuckDB recursive CTE over a list state).
    *
    * 100 TB shape: fixed 40×40 DP on a 1-row frame; sequence pulls
    * are TakeOrdered picks. */
  val qNeedleman: Q = (s, d) => {
    val en = Tables.documents(s, d).filter(col("lang") === "en")
      .orderBy(col("n_chars").desc, col("doc_id")).limit(2)
      .select(col("doc_id"),
        expr("slice(filter(split(trim(text), '\\\\s+'), w -> length(w) > 0), 1, 40)")
          .as("toks"))
      .orderBy("doc_id")
    val a = en.limit(1).select(col("toks").as("ta"))
    val b = en.orderBy(col("doc_id").desc).limit(1).select(col("toks").as("tb"))
    a.join(broadcast(b))
      .withColumn("fin", expr(
        """aggregate(ta,
             transform(sequence(0, size(tb)), j -> CAST(-j AS BIGINT)),
             (prev, aw) -> aggregate(
               transform(sequence(1, size(tb)), j -> named_struct(
                 'j', j, 'bw', element_at(tb, CAST(j AS INT)),
                 'diag', element_at(prev, CAST(j AS INT)),
                 'up', element_at(prev, CAST(j + 1 AS INT)))),
               array(element_at(prev, 1) - 1),
               (row, e) -> concat(row, array(greatest(
                 e.diag + CASE WHEN e.bw = aw THEN 1 ELSE -1 END,
                 e.up - 1,
                 element_at(row, CAST(e.j AS INT)) - 1)))))"""))
      .select(
        expr("size(ta)").cast("long").as("len_a"),
        expr("size(tb)").cast("long").as("len_b"),
        expr("element_at(fin, -1)").as("nw_score"))
  }

  /** Edit distance between language head-vocabularies: levenshtein of
    * the space-joined top-20 token lists for every language pair —
    * both engines' NATIVE levenshtein kernels must agree on all 10
    * pairs (a builtin-parity certification on nontrivial ~150-char
    * inputs), normalized ppm by the longer string.
    *
    * 100 TB shape: token censuses → 5 top-20 strings; the pair frame
    * is 10 rows. */
  val qLangEditDistance: Q = (s, d) => {
    val top = Tables.documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("lang", "w").agg(count(lit(1)).as("c"))
      .withColumn("rn", expr(
        "row_number() OVER (PARTITION BY lang ORDER BY c DESC, w)"))
      .filter(col("rn") <= 20)
      .groupBy("lang")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(rn, w))), x -> x.w), ' ')")
        .as("head"))
    top.as("a").join(top.as("b"), col("a.lang") < col("b.lang"))
      .select(col("a.lang").as("l1"), col("b.lang").as("l2"),
        expr("levenshtein(a.head, b.head)").cast("long").as("edit_dist"),
        expr("""CAST((levenshtein(a.head, b.head) * 1000000)
                div greatest(length(a.head), length(b.head)) AS BIGINT)""")
          .as("edit_ppm"))
      .orderBy("l1", "l2")
  }

  /** Circular statistics of purchase time-of-day per event type:
    * each event contributes µ-rounded cos/sin of its day-angle
    * (order-free integer sums — the only trig is per-row, identically
    * computed), resultant length R̄ in ppm plus the EXACT integer
    * component sums (cos_sum_micro, sin_sum_micro) from which a
    * consumer derives the mean hour via atan2 locally. The r10 form
    * pushed atan2 (NOT correctly rounded in either libm) through
    * round(x*1e6) — a 1-ulp divergence near a half-micro boundary
    * flips the BIGINT readout; emitting the exact sums removes the
    * hazard entirely (ADVICE r10).
    *
    * 100 TB shape: one partial-aggregable pass; per-row trig is
    * codegen'd scan work. */
  val qCircularStats: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("event_type"),
        expr("CAST((unix_micros(ts) % 86400000000) AS DOUBLE) / 86400000000.0 * 2 * pi()")
          .as("theta"))
      .select(col("event_type"),
        expr("CAST(round(cos(theta) * 1000000) AS BIGINT)").as("c_micro"),
        expr("CAST(round(sin(theta) * 1000000) AS BIGINT)").as("s_micro"))
    ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("c_micro").as("sc"), sum("s_micro").as("ss"))
      .select(col("event_type"), col("n"),
        // sqrt and ×/÷ are IEEE-correctly-rounded: identical doubles in →
        // identical double out → safe under round(); atan2 is not.
        expr("""CAST(round(sqrt(CAST(sc AS DOUBLE) * sc + CAST(ss AS DOUBLE) * ss)
                / n) AS BIGINT)""").as("resultant_ppm"),
        col("sc").cast("long").as("cos_sum_micro"),
        col("ss").cast("long").as("sin_sum_micro"))
      .orderBy("event_type")
  }

  val all: Map[String, Q] = Map(
    "q_needleman" -> qNeedleman,
    "q_lang_edit_distance" -> qLangEditDistance,
    "q_circular_stats" -> qCircularStats,
  )

  val oracles: Map[String, String] = Map(
    "q_needleman" ->
      """WITH en AS (
        | SELECT doc_id,
        |   list_filter(string_split_regex(trim(text), '\s+'),
        |     w -> length(w) > 0)[1:40] AS toks
        | FROM documents WHERE lang = 'en'
        | ORDER BY n_chars DESC, doc_id LIMIT 2),
        |a AS (SELECT toks AS ta FROM en ORDER BY doc_id LIMIT 1),
        |b AS (SELECT toks AS tb FROM en ORDER BY doc_id DESC LIMIT 1),
        |ab AS (SELECT ta, tb FROM a, b),
        |rec AS (
        | WITH RECURSIVE h(i, row) AS (
        |  SELECT 0, list_transform(range(0, len(tb) + 1),
        |    j -> CAST(-j AS BIGINT)) FROM ab
        |  UNION ALL
        |  -- DuckDB 1.0.0 has only 2-arg list_reduce (no init argument), so
        |  -- the fold's seed row is PREPENDED and the column indices are
        |  -- wrapped as 1-element lists so the accumulator type (BIGINT[])
        |  -- unifies with the element type (the r10 3-arg form binder-failed).
        |  SELECT i + 1,
        |   list_reduce(
        |     list_prepend([h.row[1] - 1],
        |       list_transform(range(1, len(ab.tb) + 1), j -> [CAST(j AS BIGINT)])),
        |     (acc_row, jl) -> list_append(acc_row, greatest(
        |       h.row[jl[1]] + CASE WHEN ab.tb[jl[1]] = ab.ta[h.i + 1]
        |         THEN 1 ELSE -1 END,
        |       h.row[jl[1] + 1] - 1,
        |       acc_row[len(acc_row)] - 1)))
        |  FROM h, ab WHERE h.i < len(ab.ta))
        | SELECT * FROM h)
        |SELECT CAST(len(ta) AS BIGINT) AS len_a, CAST(len(tb) AS BIGINT) AS len_b,
        | r.row[len(tb) + 1] AS nw_score
        |FROM ab JOIN rec r ON r.i = len(ab.ta)""".stripMargin,
    "q_lang_edit_distance" ->
      """WITH cnt AS (
        | SELECT lang, w, count(*) AS c
        | FROM (SELECT lang,
        |         unnest(string_split_regex(trim(text), '\s+')) AS w
        |       FROM documents) u
        | WHERE length(w) > 0 GROUP BY 1, 2),
        |top AS (
        | SELECT lang, string_agg(w, ' ' ORDER BY rn) AS head
        | FROM (SELECT lang, w,
        |    row_number() OVER (PARTITION BY lang ORDER BY c DESC, w) AS rn
        |   FROM cnt) r
        | WHERE rn <= 20 GROUP BY lang)
        |SELECT a.lang AS l1, b.lang AS l2,
        | CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist,
        | CAST((levenshtein(a.head, b.head) * 1000000)
        |   // greatest(length(a.head), length(b.head)) AS BIGINT) AS edit_ppm
        |FROM top a JOIN top b ON a.lang < b.lang
        |ORDER BY l1, l2""".stripMargin,
    "q_circular_stats" ->
      """WITH ev AS (
        | SELECT event_type,
        |  CAST(round(cos(CAST((epoch_us(ts) % 86400000000) AS DOUBLE)
        |    / 86400000000.0 * 2 * pi()) * 1000000) AS BIGINT) AS c_micro,
        |  CAST(round(sin(CAST((epoch_us(ts) % 86400000000) AS DOUBLE)
        |    / 86400000000.0 * 2 * pi()) * 1000000) AS BIGINT) AS s_micro
        | FROM events)
        |SELECT event_type, count(*) AS n,
        | CAST(round(sqrt(CAST(sum(c_micro) AS DOUBLE) * sum(c_micro)
        |   + CAST(sum(s_micro) AS DOUBLE) * sum(s_micro)) / count(*)) AS BIGINT)
        |   AS resultant_ppm,
        | CAST(sum(c_micro) AS BIGINT) AS cos_sum_micro,
        | CAST(sum(s_micro) AS BIGINT) AS sin_sum_micro
        |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
