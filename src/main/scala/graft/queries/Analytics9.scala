package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.text.TextFunctions.tokens

/** r7p batch — retrieval and monitoring operators: exact phrase search
  * over a positional inverted index (the capability BM25 bag-of-words
  * retrieval cannot express), integer-exact HITS hub/authority scoring
  * on the purchase graph, and a trailing-window burst detector with a
  * local (not global) baseline.
  */
object Analytics9 {
  type Q = (SparkSession, String) => DataFrame

  /** Exact phrase search ("table value") via a positional inverted
    * index: posexplode to (doc, pos, token) postings, then the phrase
    * match is an equality self-join on (doc, pos+1) — the classical
    * positional-index evaluation, generalizing to k-word phrases as
    * k−1 position-chained joins. The phrase's words are distinct, so
    * occurrences cannot overlap and the count is well-defined; the
    * oracle replays the same positional rule with DuckDB list lambdas
    * (an independent evaluation strategy over identical semantics).
    *
    * 100 TB shape: both join sides are the SAME posting slice filtered
    * to the phrase's terms BEFORE the join — posting-list-sized, never
    * corpus-sized; the per-term filter prunes at the scan. */
  val qPhraseSearch: Q = (s, d) => {
    val Seq(w1, w2) = Seq("table", "value")
    val postings = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .filter(col("tok").isin(w1, w2))
    val a = postings.filter(col("tok") === w1).select(col("doc_id"), col("pos"))
    val b = postings.filter(col("tok") === w2)
      .select(col("doc_id"), (col("pos") - 1).as("pos"))
    a.join(b, Seq("doc_id", "pos"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"), min("pos").as("first_pos"))
      .orderBy("doc_id")
  }

  /** HITS hub/authority scores (Kleinberg) on the bipartite
    * customer→part purchase graph, two UNNORMALIZED iterations so every
    * score stays an exact BIGINT (normalization only rescales the
    * ranking; the classical float iterate diverges across engines,
    * integer sums cannot): h₁(c) = deg(c); a₁(p) = Σ_{c∈N(p)} h₁(c);
    * h₂(c) = Σ_{p∈N(c)} a₁(p); a₂(p) = Σ h₂. Top-20 authority parts.
    * Score magnitude is bounded by edges³ ≈ 10¹⁷ at sf0.1 — inside
    * BIGINT by construction; one more round would need the normalized
    * (float) form.
    *
    * 100 TB shape: each half-iteration is one equality join of the
    * edge list against the previous score vector (score vectors are
    * node-sized aggregates, broadcastable) + a partial-agg'd groupBy —
    * the PageRank traffic pattern, fixed depth. */
  val qHits: Q = (s, d) => {
    // checkpoint: the bipartite edge list feeds five consumers (h1 and
    // one join per hub/authority half-step) — each otherwise replayed
    // orders⋈lineitem + distinct (r15). |E|-sized, same storage policy
    // as the other graph checkpoints.
    val edges = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .distinct()
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val h1 = edges.groupBy("cust").agg(count(lit(1)).as("h1"))
    val a1 = edges.join(h1, "cust").groupBy("part").agg(sum("h1").as("a1"))
    val h2 = edges.join(a1, "part").groupBy("cust").agg(sum("a1").as("h2"))
    val a2 = edges.join(h2, "cust").groupBy("part").agg(sum("h2").as("a2"))
    a2.join(a1, "part")
      .select(col("part"), col("a1"), col("a2"))
      .orderBy(col("a2").desc, col("part"))
      .limit(20)
  }

  /** Trailing-window burst detector: hours whose event count exceeds
    * 3× the mean of the PRECEDING 24 full hours (local baseline — a
    * diurnal service's quiet-night mean differs from rate_anomaly's
    * global-σ alarm), evaluated per event type. The threshold compare
    * is cross-multiplied to integers (`cnt·24 > 3·trailing_sum`), and
    * hours without a full trailing window are excluded — no float
    * boundary, no partial-baseline false positives. Hour gaps matter:
    * the frame is over the DENSE hour sequence (hours with zero events
    * count as zero via the completed grid).
    *
    * 100 TB shape: one (type, hour)-keyed map-side-combined agg; the
    * grid completion and window run on |types|×|hours| rows. */
  val qBurstDetect: Q = (s, d) => {
    val hourly = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"))
    // complete the (type × hour) grid so the trailing frame is dense
    val grid = hourly.select("event_type").distinct()
      .crossJoin(hourly.select("hour").distinct())
      .join(hourly, Seq("event_type", "hour"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(-24, -1)
    grid
      .withColumn("trail_sum", sum("cnt").over(w))
      .withColumn("trail_n", count(lit(1)).over(w))
      .filter(col("trail_n") === 24 && col("cnt") * 24 > col("trail_sum") * 3)
      .select(col("event_type"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("cnt"), col("trail_sum"))
      .orderBy("event_type", "hour")
  }

  /** Count–min sketch frequency estimates (r7r): per returnflag group,
    * the sketch's estimate for five probe part keys — the constant-
    * memory frequency oracle for key spaces too large to groupBy
    * exactly. Backed by the [[graft.functions.CountMinEstimate]]
    * TypedImperativeAggregate: local d×w grids, elementwise partial
    * merge (d·w·8 bytes of shuffle per task — input-size-free), probe
    * answering at eval. Runs the sketch's PORTABLE slot function (md5
    * bucket, the r8 seeded-md5 discipline) so DuckDB replays the
    * identical d×w grid cell-for-cell and the estimates are
    * oracle-certified, not just deterministic — the production default
    * stays splitmix64 (no digest per row); only the bucket permutation
    * differs, never the guarantees. CmsSpec additionally proves the
    * never-underestimate bound, partition-invariance, and
    * splitmix↔md5 mode parity of the error bound. */
  val qCmsFreq: Q = (s, d) => {
    val probes = Seq(1L, 2L, 3L, 4L, 5L)
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(graft.functions.CountMinEstimate
        .cmsEstimate(col("l_partkey"), probes, 4, 1024, portable = true).as("est"))
      .select(col("l_returnflag"),
        posexplode(col("est")).as(Seq("probe_idx", "est_count")))
      .withColumn("probe_key", col("probe_idx").cast("long") + 1)
      .select("l_returnflag", "probe_key", "est_count")
      .orderBy("l_returnflag", "probe_key")
  }

  val all: Map[String, Q] = Map(
    "q_phrase_search" -> qPhraseSearch,
    "q_hits" -> qHits,
    "q_burst_detect" -> qBurstDetect,
    "q_cms_freq" -> qCmsFreq,
    "q_isotonic_calibration" -> ((s, d) => graft.ml.Isotonic.calibrateReturns(s, d)),
  )

  val oracles: Map[String, String] = Map(
    // exact integer minimax PAVA (see graft.ml.Isotonic doc): every block
    // average is rational, floor commutes with min/max, so floor-ppm
    // max-of-min over BIGINTs is bit-portable. All readout columns are
    // explicitly BIGINT (no HUGEINT slips past the final select).
    "q_isotonic_calibration" ->
      """WITH pts AS (
        | SELECT l_quantity AS qty, count(*) AS n,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r
        | FROM lineitem GROUP BY 1),
        |cum AS (
        | SELECT qty, n, n_r,
        |  row_number() OVER (ORDER BY qty) AS i,
        |  CAST(sum(n) OVER (ORDER BY qty
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
        |  CAST(sum(n_r) OVER (ORDER BY qty
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cr
        | FROM pts),
        |pre AS (
        | SELECT i + 1 AS j, cn AS cnp, cr AS crp FROM cum
        | UNION ALL SELECT 1, 0, 0),
        |ratios AS (
        | SELECT pre.j, c.i AS k,
        |  ((c.cr - pre.crp) * 1000000) // (c.cn - pre.cnp) AS ppm
        | FROM pre JOIN cum c ON c.i >= pre.j),
        |fit AS (
        | SELECT i, CAST(max(mn) AS BIGINT) AS calibrated_ppm
        | FROM (SELECT c.i, r.j, min(r.ppm) AS mn
        |       FROM cum c JOIN ratios r ON r.j <= c.i AND r.k >= c.i
        |       GROUP BY c.i, r.j)
        | GROUP BY i)
        |SELECT cum.qty, CAST(cum.n AS BIGINT) AS n, cum.n_r,
        | CAST((cum.n_r * 1000000) // cum.n AS BIGINT) AS raw_rate_ppm,
        | fit.calibrated_ppm
        |FROM cum JOIN fit USING (i) ORDER BY qty""".stripMargin,
    "q_phrase_search" ->
      """WITH sp AS (
        | SELECT doc_id, string_split(trim(text), ' ') AS tk FROM documents),
        |hits AS (
        | SELECT doc_id,
        |   list_sum(list_transform(range(1, len(tk)),
        |     i -> CASE WHEN tk[i] = 'table' AND tk[i + 1] = 'value'
        |          THEN 1 ELSE 0 END)) AS n_matches,
        |   list_min(list_filter(list_transform(range(1, len(tk)),
        |     i -> CASE WHEN tk[i] = 'table' AND tk[i + 1] = 'value'
        |          THEN i - 1 END), x -> x IS NOT NULL)) AS first_pos
        | FROM sp)
        |SELECT doc_id, CAST(n_matches AS BIGINT) AS n_matches,
        | CAST(first_pos AS INTEGER) AS first_pos
        |FROM hits WHERE n_matches >= 1
        |ORDER BY doc_id""".stripMargin,
    "q_hits" ->
      """WITH edges AS (
        | SELECT DISTINCT o_custkey AS cust, l_partkey AS part
        | FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |h1 AS (SELECT cust, count(*) AS h1 FROM edges GROUP BY cust),
        |a1 AS (
        | SELECT part, CAST(sum(h1) AS BIGINT) AS a1
        | FROM edges JOIN h1 USING (cust) GROUP BY part),
        |h2 AS (
        | SELECT cust, CAST(sum(a1) AS BIGINT) AS h2
        | FROM edges JOIN a1 USING (part) GROUP BY cust),
        |a2 AS (
        | SELECT part, CAST(sum(h2) AS BIGINT) AS a2
        | FROM edges JOIN h2 USING (cust) GROUP BY part)
        |SELECT part, a1, a2 FROM a2 JOIN a1 USING (part)
        |ORDER BY a2 DESC, part
        |LIMIT 20""".stripMargin,
    "q_burst_detect" ->
      """WITH hourly AS (
        | SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS cnt
        | FROM events GROUP BY event_type, hour),
        |grid AS (
        | SELECT t.event_type, h.hour, coalesce(c.cnt, 0) AS cnt
        | FROM (SELECT DISTINCT event_type FROM hourly) t
        | CROSS JOIN (SELECT DISTINCT hour FROM hourly) h
        | LEFT JOIN hourly c ON c.event_type = t.event_type AND c.hour = h.hour),
        |trailed AS (
        | SELECT event_type, hour, cnt,
        |   sum(cnt) OVER (PARTITION BY event_type ORDER BY hour
        |     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trail_sum,
        |   count(*) OVER (PARTITION BY event_type ORDER BY hour
        |     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trail_n
        | FROM grid)
        |SELECT event_type, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
        | CAST(cnt AS BIGINT) AS cnt, CAST(trail_sum AS BIGINT) AS trail_sum
        |FROM trailed
        |WHERE trail_n = 24 AND cnt * 24 > trail_sum * 3
        |ORDER BY event_type, hour""".stripMargin,
    "q_cms_freq" ->
      """WITH rows_ AS (SELECT unnest(range(0, 4)) AS rw),
        |flags AS (SELECT DISTINCT l_returnflag FROM lineitem),
        |grid AS (
        | SELECT l_returnflag, rw,
        |  CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 8 * rw + 1, 8)
        |    AS BIGINT) % 1024 AS bucket,
        |  count(*) AS cnt
        | FROM lineitem CROSS JOIN rows_ GROUP BY 1, 2, 3),
        |pb AS (
        | SELECT probe_key, rw,
        |  CAST('0x' || substr(md5(CAST(probe_key AS VARCHAR)), 8 * rw + 1, 8)
        |    AS BIGINT) % 1024 AS bucket
        | FROM (SELECT unnest([1, 2, 3, 4, 5]) AS probe_key) CROSS JOIN rows_)
        |SELECT f.l_returnflag, CAST(pb.probe_key AS BIGINT) AS probe_key,
        | CAST(min(coalesce(g.cnt, 0)) AS BIGINT) AS est_count
        |FROM flags f CROSS JOIN pb
        |LEFT JOIN grid g ON g.l_returnflag = f.l_returnflag
        |  AND g.rw = pb.rw AND g.bucket = pb.bucket
        |GROUP BY f.l_returnflag, pb.probe_key
        |ORDER BY f.l_returnflag, probe_key""".stripMargin,
  )
}
