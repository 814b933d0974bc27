package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Scale

/** r7e batch — retrieval fusion, irregular-time-series aggregation,
  * schema-drift ingestion, and diversity re-ranking: reciprocal-rank
  * fusion of two retrieval rankings, per-user time-weighted averages,
  * a mergeSchema read across parquet generations with drifted schemas,
  * and embedding-MMR result diversification. Integer discipline per repo
  * convention (rank scores in milli units, time weights in exact µs).
  */
object Analytics4 {
  type Q = (SparkSession, String) => DataFrame

  private lazy val evoScratch: String =
    java.nio.file.Files.createTempDirectory("graft_evo").toString
  private val evoRun = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Reciprocal-rank fusion of two retrieval rankings — the standard
    * zero-tuning way to combine heterogeneous scorers (lexical + dense,
    * or here: raw term count for `scan` vs per-token density of `join`):
    * fused(d) = Σ_r 60000 div (60 + rank_r(d)), integer milli units.
    * Global ranks come from [[Scale.denseIds]] (range-partitioned — no
    * one-partition window over the corpus) with doc_id tie-breaks; the
    * final top-20 is an orderBy+limit → TakeOrderedAndProject, never a
    * full result sort.
    *
    * 100 TB shape: two rank passes over the doc dimension + one join on
    * doc_id; constant-size output. */
  val qRrfFusion: Q = (s, d) => {
    val toks = Tables.documents(s, d).select(col("doc_id"),
      split(trim(col("text")), "\\s+").as("ts"))
    val scored = toks.select(col("doc_id"),
      expr("CAST(size(filter(ts, t -> t = 'scan')) AS BIGINT)").as("tf_scan"),
      expr("(CAST(size(filter(ts, t -> t = 'join')) AS BIGINT) * 1000L) div size(ts)")
        .as("density_join_milli"))
    def ranks(metric: String, rankName: String): DataFrame =
      Scale.denseIds(
        scored.select(col("doc_id"), (-col(metric)).as("neg")),
        rankName, Seq("neg", "doc_id"))
        .select("doc_id", rankName)
    scored
      .join(ranks("tf_scan", "rank_a"), Seq("doc_id"))
      .join(ranks("density_join_milli", "rank_b"), Seq("doc_id"))
      .select(col("doc_id"), col("tf_scan"), col("density_join_milli"),
        col("rank_a"), col("rank_b"),
        expr("60000L div (60 + rank_a) + 60000L div (60 + rank_b)").as("rrf_milli"))
      .orderBy(col("rrf_milli").desc, col("doc_id")).limit(20)
  }

  /** Per-user time-weighted average of `value` — the correct mean for
    * irregularly sampled series (a value holds until the next reading;
    * the arithmetic mean over-weights bursts). Each event's weight is
    * the µs gap to the user's next event (lead window — last event
    * carries zero weight); TWA = Σ value_c·Δt div Σ Δt, all BIGINT
    * (value cents ≤ 5·10⁴, per-user span ≤ years of µs → products
    * < 2⁶³).
    *
    * 100 TB shape: one user-partitioned window + one partial-agg'd
    * groupBy — embarrassingly parallel across users; single-event users
    * (no weighted support) are reported with null TWA rather than
    * dropped. */
  val qTimeWeightedAvg: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v_c"))
      .withColumn("dt_us", lead("us", 1).over(w) - col("us"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("v_c") * col("dt_us")).as("vw"),
        sum("dt_us").as("span_us"))
      .select(col("user_id"), col("n_events"),
        expr("vw div span_us").as("twa_c"), col("span_us"))
      .orderBy("user_id")
  }

  /** Schema-drift ingestion: two parquet generations of the same feed —
    * gen 0 without, gen 1 with the late-added `price_c` column — land in
    * ONE directory; a single mergeSchema scan unifies them (missing
    * columns read as null, no rewrite of old files), and the report
    * proves the contract: per generation, row count and non-null count
    * of the drifted column. The write is the operator's fixture; the
    * read path (union-by-name schema reconciliation at the SCAN, not a
    * backfill job) is what survives a 100 TB archive whose history can't
    * be rewritten. */
  val qSchemaEvolution: Q = (s, d) => {
    val dir = s"$evoScratch/run_${evoRun.incrementAndGet()}"
    val o = Tables.orders(s, d)
    o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .write.mode("overwrite").parquet(dir)
    o.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("price_c"))
      .write.mode("append").parquet(dir)
    s.read.option("mergeSchema", "true").parquet(dir)
      .groupBy((col("o_orderkey") % 2).as("gen"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("price_c")).as("price_nonnull"),
        sum("o_orderkey").as("key_checksum"))
      .orderBy("gen")
  }

  /** MMR (maximal-marginal-relevance) diversification of a dense
    * retrieval: from vec 0's top-30 cosine candidates, greedily pick 10
    * maximizing λ·relevance − (1−λ)·max-similarity-to-picked (λ=0.7) —
    * the re-ranker that stops a result page (or a RAG context window)
    * from being 10 near-copies. Candidate generation is the distributed
    * brute-kNN shape; the greedy runs on the COLLECTED top-30 (driver-
    * sized by construction, the IVF-centroid precedent) over round-6
    * sims with id tie-breaks — deterministic; the greedy is replayed in
    * DuckDB as a recursive CTE over a list-state row (r11 oracle
    * upgrade), plus the Analytics4Spec referee. */
  val qMmrDiversify: Q = (s, d) => {
    import graft.functions.GraftFunctions.dot_product
    val v = Tables.embeddings(s, d).select(col("vec_id"),
      col("embedding").cast("array<double>").as("vec"))
      .withColumn("nrm", sqrt(dot_product(col("vec"), col("vec"))))
    val q = v.filter(col("vec_id") === 0)
      .select(col("vec").as("q_vec"), col("nrm").as("q_nrm"))
    val cands = v.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), col("vec"), col("nrm"),
        round(dot_product(col("q_vec"), col("vec")) / (col("q_nrm") * col("nrm")), 6)
          .as("rel"))
      .orderBy(col("rel").desc, col("vec_id")).limit(30)
      .collect() // 30 rows by construction
    val vecs = cands.map(_.getSeq[Double](1).toArray)
    val nrms = cands.map(_.getDouble(2))
    def sim(i: Int, j: Int): Double = {
      var acc = 0.0
      var k = 0
      while (k < vecs(i).length) { acc += vecs(i)(k) * vecs(j)(k); k += 1 }
      BigDecimal(acc / (nrms(i) * nrms(j)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val lambda = 0.7
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val remaining = scala.collection.mutable.LinkedHashSet(cands.indices: _*)
    while (picked.length < 10 && remaining.nonEmpty) {
      val best = remaining.minBy { i =>
        val maxSim = if (picked.isEmpty) 0.0 else picked.map(p => sim(i, p._1)).max
        val mmr = lambda * cands(i).getDouble(3) - (1 - lambda) * maxSim
        (-mmr, cands(i).getLong(0)) // deterministic: score desc, id asc
      }
      val maxSim = if (picked.isEmpty) 0.0 else picked.map(p => sim(best, p._1)).max
      picked += ((best, lambda * cands(best).getDouble(3) - (1 - lambda) * maxSim))
      remaining -= best
    }
    import s.implicits._
    picked.toSeq.zipWithIndex.map { case ((i, score), r) =>
      (r + 1L, cands(i).getLong(0), cands(i).getDouble(3),
        BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("rank", "vec_id", "rel", "mmr")
  }

  val all: Map[String, Q] = Map(
    "q_rrf_fusion" -> qRrfFusion,
    "q_time_weighted_avg" -> qTimeWeightedAvg,
    "q_schema_evolution" -> qSchemaEvolution,
    "q_mmr_diversify" -> qMmrDiversify,
  )

  val oracles: Map[String, String] = Map(
    // r11 upgrade (was rows-only): the greedy replayed as a recursive CTE
    // over a single list-state row — the 30×30 round-6 sim matrix and
    // rel/id lists ride as lists, each step argmaxes via list_max over
    // (score, -id) structs (same total order as the Scala (-mmr, id)
    // minBy). All inputs are round-6 doubles from the identical
    // sequential dot, so the selection compares bit-identical values.
    "q_mmr_diversify" ->
      """WITH v AS (
        | SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb,
        |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
        | FROM embeddings),
        |q AS (SELECT emb AS qe, nrm AS qn FROM v WHERE vec_id = 0),
        |cand0 AS (
        | SELECT vec_id, emb, nrm,
        |  round(list_sum(list_transform(range(1, len(emb)+1), i -> emb[i] * qe[i]))
        |    / (qn * nrm), 6) AS rel
        | FROM v, q WHERE vec_id <> 0
        | ORDER BY rel DESC, vec_id LIMIT 30),
        |cand AS (
        | SELECT *, row_number() OVER (ORDER BY rel DESC, vec_id) AS rn FROM cand0),
        |lists AS (
        | SELECT list(vec_id ORDER BY rn) AS idl, list(rel ORDER BY rn) AS rell FROM cand),
        |srows AS (
        | SELECT a.rn AS i,
        |  list(round(list_sum(list_transform(range(1, len(a.emb)+1),
        |      k -> a.emb[k] * b.emb[k])) / (a.nrm * b.nrm), 6) ORDER BY b.rn) AS srow
        | FROM cand a JOIN cand b ON true GROUP BY a.rn),
        |smat AS (SELECT list(srow ORDER BY i) AS m FROM srows),
        |rec AS (
        | WITH RECURSIVE r(step, picked, scores) AS (
        |  SELECT 0, CAST([] AS BIGINT[]), CAST([] AS DOUBLE[]) FROM smat
        |  UNION ALL
        |  SELECT r.step + 1,
        |   list_append(r.picked,
        |    (list_max(list_filter(list_transform(range(1, 31), i ->
        |      CASE WHEN list_contains(r.picked, i) THEN NULL
        |      ELSE {'s': 0.7 * l.rell[i] - 0.3 * (CASE WHEN len(r.picked) = 0 THEN 0.0
        |              ELSE list_max(list_transform(r.picked, p -> sm.m[i][p])) END),
        |            'negid': -l.idl[i], 'rn': i} END), x -> x IS NOT NULL))).rn),
        |   list_append(r.scores,
        |    (list_max(list_filter(list_transform(range(1, 31), i ->
        |      CASE WHEN list_contains(r.picked, i) THEN NULL
        |      ELSE {'s': 0.7 * l.rell[i] - 0.3 * (CASE WHEN len(r.picked) = 0 THEN 0.0
        |              ELSE list_max(list_transform(r.picked, p -> sm.m[i][p])) END),
        |            'negid': -l.idl[i], 'rn': i} END), x -> x IS NOT NULL))).s)
        |  FROM r, smat sm, lists l WHERE r.step < 10)
        | SELECT picked, scores FROM r WHERE step = 10)
        |SELECT CAST(t.k AS BIGINT) AS rank,
        | l.idl[rec.picked[t.k]] AS vec_id,
        | l.rell[rec.picked[t.k]] AS rel,
        | round(rec.scores[t.k], 6) AS mmr
        |FROM rec, lists l, range(1, 11) t(k)
        |ORDER BY rank""".stripMargin,
    "q_rrf_fusion" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |scored AS (
        | SELECT doc_id,
        |  CAST(len(list_filter(ts, t -> t = 'scan')) AS BIGINT) AS tf_scan,
        |  CAST(len(list_filter(ts, t -> t = 'join')) AS BIGINT) * 1000 // len(ts)
        |    AS density_join_milli
        | FROM toks),
        |ra AS (
        | SELECT doc_id, CAST(row_number() OVER (ORDER BY -tf_scan, doc_id) AS BIGINT) AS rank_a
        | FROM scored),
        |rb AS (
        | SELECT doc_id, CAST(row_number() OVER (ORDER BY -density_join_milli, doc_id) AS BIGINT) AS rank_b
        | FROM scored)
        |SELECT doc_id, tf_scan, density_join_milli, rank_a, rank_b,
        | 60000 // (60 + rank_a) + 60000 // (60 + rank_b) AS rrf_milli
        |FROM scored JOIN ra USING (doc_id) JOIN rb USING (doc_id)
        |ORDER BY rrf_milli DESC, doc_id LIMIT 20""".stripMargin,
    "q_time_weighted_avg" ->
      """WITH e AS (
        | SELECT user_id, event_id, epoch_us(ts) AS us,
        |  CAST(round(value * 100) AS BIGINT) AS v_c
        | FROM events),
        |g AS (
        | SELECT user_id, v_c,
        |  lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS dt_us
        | FROM e)
        |SELECT user_id, count(*) AS n_events,
        | CAST(sum(v_c * dt_us) AS BIGINT) // CAST(sum(dt_us) AS BIGINT) AS twa_c,
        | CAST(sum(dt_us) AS BIGINT) AS span_us
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_schema_evolution" ->
      """WITH merged AS (
        | SELECT o_orderkey, o_orderstatus, NULL::BIGINT AS price_c
        | FROM orders WHERE o_orderkey % 2 = 0
        | UNION ALL
        | SELECT o_orderkey, o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT)
        | FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT CAST(o_orderkey % 2 AS BIGINT) AS gen, count(*) AS n_rows,
        | count(price_c) AS price_nonnull,
        | CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
        |FROM merged GROUP BY 1 ORDER BY gen""".stripMargin,
  )
}
