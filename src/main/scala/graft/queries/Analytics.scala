package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.dedup.Dedup
import graft.text.TextFunctions._

/** r7b analytics batch — four cross-domain operators a curation/BI stack
  * reaches for next: Pareto-frontier selection (skyline), directional
  * containment dedup, first-occurrence n-gram novelty, and multi-touch
  * purchase attribution. All four DuckDB-oracle-paired; float discipline
  * follows the repo convention (integer thresholds and integer credit
  * units wherever a comparison or a sum could drift, rounding only on
  * final reported values).
  */
object Analytics {
  type Q = (SparkSession, String) => DataFrame

  /** Per-brand Pareto frontier (skyline) of parts on (minimize price,
    * maximize size): a part survives iff no same-brand part is cheaper
    * with at-least-equal size, or equal-priced with strictly larger size.
    *
    * The naive skyline is an O(n²) dominance self-join; this is the
    * sort-based O(n log n) staircase instead: order each brand by price
    * and compare every row's size against (1) the max size over all
    * STRICTLY cheaper rows (RANGE … 1 PRECEDING — exact because the key
    * is integer cents) and (2) the max size among its price ties (RANGE
    * CURRENT ROW spans peers). Both are one window pass.
    *
    * 100 TB shape: the window partitions by brand — embarrassingly
    * parallel across brands, spillable external sort within one; no
    * self-join, no cross product. Price in integer cents so the RANGE
    * frame bound and every comparison are exact cross-engine. */
  val qSkyline: Q = (s, d) => {
    val p = Tables.part(s, d).select(
      col("p_brand").as("brand"), col("p_partkey").cast("long").as("partkey"),
      expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("price_c"),
      col("p_size").cast("long").as("size"))
    val byPrice = Window.partitionBy("brand").orderBy("price_c")
    val cheaper = byPrice.rangeBetween(Window.unboundedPreceding, -1)
    val peers = byPrice.rangeBetween(Window.currentRow, Window.currentRow)
    p.withColumn("m_cheaper", max("size").over(cheaper))
      .withColumn("m_same", max("size").over(peers))
      .filter((col("m_cheaper").isNull || col("m_cheaper") < col("size")) &&
        col("m_same") === col("size"))
      .select("brand", "partkey", "price_c", "size")
      .orderBy("brand", "price_c", "partkey")
  }

  /** Directional containment near-dup: (a, b) pairs where ≥ 4/5 of a's
    * word-trigram shingles also occur in b — catches the short-doc-
    * quoted-inside-long-doc duplication Jaccard's union denominator
    * hides. Inverted-index join via [[Dedup.containmentPairs]]; the 4/5
    * threshold is compared in integers (5·common ≥ 4·na), never floats. */
  val qContainment: Q = (s, d) =>
    Dedup.containmentPairs(Tables.documents(s, d), num = 4, den = 5)
      .orderBy("a_id", "b_id")

  /** First-occurrence n-gram novelty per source: the fraction of each
    * doc's shingles whose FIRST corpus appearance (min doc_id over the
    * whole corpus) is that doc itself, averaged per source — the
    * "marginal new content" signal behind source-level dedup and mixing
    * budgets (a source whose docs are mostly re-statements of earlier
    * shingles adds little).
    *
    * 100 TB shape: one shingle-keyed hash-agg for the global first-doc
    * map (map-side combined), one join back on the shingle, then
    * doc- and source-level aggs. The join carries (doc, distinct shingle)
    * rows — never per-occurrence. Novelty averaged from exact integer
    * counts and rounded 4dp on both engines. */
  val qNgramNovelty: Q = (s, d) => {
    val sh = Dedup.shingled(Tables.documents(s, d))
      .select(col("doc_id"), col("nsh"), explode(col("sh")).as("shingle"))
    val first = sh.groupBy("shingle").agg(min("doc_id").as("first_doc"))
    val perDoc = sh.join(first, "shingle")
      .groupBy("doc_id", "nsh")
      .agg(sum((col("first_doc") === col("doc_id")).cast("long")).as("n_novel"))
    Tables.documents(s, d).select("doc_id", "source").join(perDoc, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_novel").cast("double") / col("nsh")), 4).as("avg_novelty"))
      .orderBy("source")
  }

  /** Linear multi-touch attribution: every purchase splits one unit of
    * credit equally across the user's click/view touches in the
    * preceding 24 h; untouched purchases credit a 'direct' bucket. The
    * standard marketing-channel report, here per touch type.
    *
    * Credit is computed in integer micro-units (1 000 000 div n per
    * touch) and summed as longs — IEEE summation order can flip a
    * 4dp-rounded float total between engines, an exact integer sum
    * cannot. The ≤ 0.000001 allocation remainder from the integer div is
    * a deterministic definition, not drift.
    *
    * 100 TB shape: purchases ⋈ touches is an equi-join on user_id with
    * the 24 h bound as a residual range predicate (the q_conversion_24h
    * shape — bounded by per-user activity, never a time cross product);
    * everything after is per-(purchase, channel) aggs, map-side
    * combined. */
  val qAttribution: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        unix_micros(col("ts")).as("p_us"))
    val touch = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_type").as("channel"),
        unix_micros(col("ts")).as("t_us"))
    val hits = purch.join(touch, Seq("user_id"))
      .filter(col("t_us") <= col("p_us") &&
        col("p_us") - col("t_us") < lit(86400000000L))
    val cnt = hits.groupBy("p_id", "channel").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("p_id").agg(sum("c").as("n"))
    val attributed = cnt.join(tot, "p_id")
      .withColumn("cr", col("c") * expr("1000000 div n"))
      .groupBy("channel")
      .agg(round(sum("cr") / 1e6, 4).as("credit"),
        countDistinct("p_id").as("n_purchases"))
    val touched = tot.select(col("p_id").as("t_p_id"))
    val direct = purch.join(touched, col("p_id") === col("t_p_id"), "left_anti")
      .agg(count(lit(1)).as("n_direct"))
      .select(lit("direct").as("channel"),
        round(col("n_direct").cast("double"), 4).as("credit"),
        col("n_direct").as("n_purchases"))
    attributed.unionByName(direct).orderBy("channel")
  }

  val all: Map[String, Q] = Map(
    "q_skyline" -> qSkyline,
    "q_containment" -> qContainment,
    "q_ngram_novelty" -> qNgramNovelty,
    "q_attribution" -> qAttribution,
  )

  val oracles: Map[String, String] = Map(
    "q_skyline" ->
      """WITH p AS (
        | SELECT p_brand AS brand, CAST(p_partkey AS BIGINT) AS partkey,
        |  CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
        |  CAST(p_size AS BIGINT) AS size
        | FROM part),
        |w AS (
        | SELECT *,
        |  max(size) OVER (PARTITION BY brand ORDER BY price_c
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_cheaper,
        |  max(size) OVER (PARTITION BY brand ORDER BY price_c
        |    RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS m_same
        | FROM p)
        |SELECT brand, partkey, price_c, size FROM w
        |WHERE (m_cheaper IS NULL OR m_cheaper < size) AND m_same = size
        |ORDER BY brand, price_c, partkey""".stripMargin,
    // shingle convention mirrors q_dedup_jaccard's oracle: distinct word
    // trigrams over whitespace tokens, docs with >= 3 tokens
    "q_containment" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(ts)-1),
        |   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
        | FROM toks WHERE len(ts) >= 3),
        |e AS (SELECT doc_id, len(s) AS nsh, unnest(s) AS shingle FROM sh),
        |c AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.nsh AS na,
        |  count(*) AS common
        | FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        | GROUP BY 1, 2, 3)
        |SELECT a_id, b_id, CAST(na AS BIGINT) AS na,
        | CAST(common AS BIGINT) AS common,
        | round(CAST(common AS DOUBLE) / na, 4) AS containment
        |FROM c WHERE common * 5 >= na * 4
        |ORDER BY a_id, b_id""".stripMargin,
    "q_ngram_novelty" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(ts)-1),
        |   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
        | FROM toks WHERE len(ts) >= 3),
        |e AS (SELECT doc_id, len(s) AS nsh, unnest(s) AS shingle FROM sh),
        |f AS (SELECT shingle, min(doc_id) AS first_doc FROM e GROUP BY 1),
        |pd AS (
        | SELECT e.doc_id, max(e.nsh) AS nsh,
        |  sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END) AS n_novel
        | FROM e JOIN f USING (shingle) GROUP BY e.doc_id)
        |SELECT d.source, count(*) AS n_docs,
        | round(avg(CAST(pd.n_novel AS DOUBLE) / pd.nsh), 4) AS avg_novelty
        |FROM documents d JOIN pd ON d.doc_id = pd.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "q_attribution" ->
      """WITH p AS (
        | SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us
        | FROM events WHERE event_type = 'purchase'),
        |t AS (
        | SELECT user_id, event_type AS channel, epoch_us(ts) AS t_us
        | FROM events WHERE event_type IN ('click', 'view')),
        |hits AS (
        | SELECT p.p_id, t.channel FROM p JOIN t USING (user_id)
        | WHERE t.t_us <= p.p_us AND p.p_us - t.t_us < 86400000000),
        |cnt AS (SELECT p_id, channel, count(*) AS c FROM hits GROUP BY 1, 2),
        |tot AS (SELECT p_id, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
        |att AS (
        | SELECT channel,
        |  round(sum(c * (1000000 // n)) / 1e6, 4) AS credit,
        |  count(DISTINCT cnt.p_id) AS n_purchases
        | FROM cnt JOIN tot USING (p_id) GROUP BY channel),
        |dir AS (
        | SELECT 'direct' AS channel,
        |  round(CAST(count(*) AS DOUBLE), 4) AS credit,
        |  count(*) AS n_purchases
        | FROM p WHERE p_id NOT IN (SELECT p_id FROM tot))
        |SELECT * FROM att UNION ALL SELECT * FROM dir ORDER BY channel""".stripMargin,
  )
}
