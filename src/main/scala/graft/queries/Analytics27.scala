package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 9: bounded-hop graph centrality, robust location, count
  * dispersion, rolling association, and classifier gains — the same
  * exact-integer-interior discipline as batch 8 (floats only in the
  * final fixed-order readout, 6dp grid).
  */
object Analytics27 {
  type Q = (org.apache.spark.sql.SparkSession, String) => DataFrame

  private val revC = expr("CAST(round(o_totalprice * 100) AS BIGINT)")

  /** Harmonic centrality (Boldi & Vigna 2014) within 3 hops for the 20
    * highest-degree parts of the co-order part graph — the
    * influence readout next to q_pagerank/q_hits that needs no damping
    * constant. Σ 1/hop stays EXACT as ×6 integers (6, 3, 2 for hops
    * 1..3). Min-hop labels per (seed, node) via 3 frontier-join rounds,
    * the q_bfs_layers shape fanned out over a bounded seed set.
    *
    * 100 TB shape: seeds bounded at 20, so per-round state is ≤
    * 20×|parts| labels; edges built once and checkpointed; every round
    * is one equi-join + min-agg — no all-pairs anywhere. */
  val qHarmonicCentrality: Q = (s, d) => {
    // checkpoint: items feeds the edge self-join AND the degree-ranked
    // seed census (different grouping keys, so no exchange reuse) —
    // each otherwise re-scans lineitem and re-distincts (r15).
    // Partitioned by o BEFORE the distinct (r16, guide §2.4 two ops
    // sharing one exchange): hashpartitioning(o) satisfies the (o,p)
    // distinct (partition key ⊆ grouping keys) AND both sides of the
    // o-keyed self-join below, so the join plans ZERO exchanges where it
    // re-shuffled the items frame twice.
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .repartition(col("o")).distinct()
      // |E|-scale frame: serialized residency like every other |E|-sized
      // checkpoint (r16, ADVICE r15 — the deserialized default is the
      // unroll-OOM class the r14/r15 probes documented)
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val edges = items.as("a").join(items.as("b"), col("a.o") === col("b.o"))
      .filter(col("a.p") =!= col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst"))
      // partition by dst BEFORE the distinct (r16): one exchange either
      // way (dst replaces the (src,dst) distinct shuffle), but the
      // checkpoint then captures hashpartitioning(dst) = the hop joins'
      // OUTPUT key, so each round's wedge pre-aggregation below runs on
      // the join output IN PLACE — the per-round shuffle carries the
      // ≤seeds·|V| min-set, never the wedge product
      .repartition(col("dst")).distinct()
      // |E|-sized checkpoint → MEMORY_AND_DISK_SER (r15, VERDICT r14
      // task 1; supersedes r14 DISK_ONLY): the sf100 probe killed the
      // context at 64 g with the memory-resident DESERIALIZED default
      // (unrolled row objects compete with execution memory), but
      // DISK_ONLY cost this query 2.5× at sf10 (50.7 → 124.9 s) —
      // harmonic re-reads the edge list against 20 seed frontiers per
      // hop, the most re-read-intensive inner loop in the repo, so
      // forfeiting RAM residency where the edges FIT is the worst
      // possible default here. Serialized blocks bound the unroll
      // (compact byte buffers, spill on pressure) AND stay resident
      // when they fit — A/B'd per SF in PLANS.md r15. Node-sized
      // frames (labels, ≤ seeds·|V|) stay memory-resident.
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val seeds = items.groupBy("p").agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("p")).limit(20)
      .select(col("p").as("seed"))
    var labels = seeds
      .select(col("seed"), col("seed").as("id"), lit(0L).as("hop"))
      .localCheckpoint()
    for (h <- 1 to 3) {
      val frontier = labels.filter(col("hop") === (h - 1))
      // pre-aggregate the wedge product BEFORE the union-merge (r16,
      // guide §2.3 aggregate before you shuffle): the hop join emits
      // |frontier|·deg rows, and the old union-merge shuffled all of
      // them; min over (labels ∪ next) = min over (labels ∪ min-per-key
      // of next), so dedup next first — on the broadcast-join output
      // this agg rides the checkpoint's dst partitioning with NO
      // exchange, and the merge below shuffles two node-sized frames
      val next = edges.join(frontier, edges("src") === frontier("id"))
        .select(col("seed"), col("dst").as("id"), lit(h.toLong).as("hop"))
        .groupBy("seed", "id").agg(min("hop").as("hop"))
      labels = labels.union(next)
        .groupBy("seed", "id").agg(min("hop").as("hop"))
        .localCheckpoint()
    }
    labels.filter(col("hop") > 0)
      .groupBy("seed")
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("6 div hop")).as("harmonic_x6"))
      .orderBy("seed")
  }

  /** Hodges–Lehmann pseudomedian of daily order revenue: the median of
    * all Walsh averages (yᵢ+yⱼ)/2, i≤j — the rank-based location
    * estimate that pairs with q_theil_sen's slope. Selection semantics
    * keep it exact: the median Walsh SUM is picked by rank over the
    * bounded |days|² pair frame (cents×2, integer), and the /2 is one
    * terminal integer division.
    *
    * 100 TB shape: pairwise only over the collapsed ≤|days| frame —
    * cost independent of row count, the q_theil_sen discipline. */
  val qHodgesLehmann: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(revC).as("y"))
      .withColumn("i", expr("CAST(datediff(day, DATE '1992-01-01') AS BIGINT)"))
    // same bounded-frame fan-out before the pair expansion as qTheilSen
    val fanned = daily.repartition(s.sparkContext.defaultParallelism)
    val sums = fanned.as("a").join(daily.as("b"), col("a.i") <= col("b.i"))
      .select((col("a.y") + col("b.y")).as("walsh_c2"))
    // parallel global-rank selection (r16, the qTheilSen treatment —
    // supersedes the r15 "left alone" note now that the value-selection
    // argument is pinned): rank permutation within equal walsh_c2 values
    // cannot change the selected VALUE, and every output column is a
    // function of that value, so range-partitioned ranking is exact;
    // the denseIds checkpoint also stops the count branch from
    // re-executing the pair join.
    val ranked = graft.operators.Scale.denseIds(sums, "rn", Seq("walsh_c2"))
    val cnt = ranked.agg(count(lit(1)).as("n_pairs"))
    ranked.crossJoin(broadcast(cnt))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("n_pairs"), col("walsh_c2"),
        expr("walsh_c2 div 2").as("hl_cents"))
  }

  /** Index-of-dispersion test per event type (variance-to-mean ratio of
    * daily counts): D = (n−1)s²/x̄ collapses to the all-integer
    * (nΣx²−(Σx)²)/Σx, reported in ppm. The overdispersion call (D >
    * n−1 + 2√(2(n−1)), the normal approximation to the χ²ₙ₋₁ 97.7%
    * point) is decided with the sqrt SQUARED AWAY — the inequality is
    * checked entirely in int64.
    *
    * 100 TB shape: one (type × day) census, then a per-type 1-row
    * moment agg. */
  val qPoissonDispersion: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n"), col("sx"),
        expr("((n * sxx - sx * sx) * 1000000) div sx").as("d_ppm"),
        expr("""CAST(((n * sxx - sx * sx) * 1000000) div sx > (n - 1) * 1000000
                AND (((n * sxx - sx * sx) * 1000000) div sx - (n - 1) * 1000000)
                    * (((n * sxx - sx * sx) * 1000000) div sx - (n - 1) * 1000000)
                    > 8 * (n - 1) * 1000000000000 AS BIGINT)""").as("overdispersed"))
      .orderBy("event_type")
  }

  /** 30-day rolling Pearson correlation between daily order count and
    * daily revenue (whole dollars — the truncating div keeps every
    * window moment inside int64 through sf1; documented bound). Window
    * sums are exact integers; the only float step is the fixed-order
    * (nΣxy−ΣxΣy)/√(nΣx²−(Σx)²)/√(nΣy²−(Σy)²) per window, 6dp grid.
    *
    * 100 TB shape: moments collapse to the bounded daily frame first;
    * the rolling window then runs over ≤|days| rows. */
  val qRollingCorr: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").cast("string").as("day"))
      .agg(count(lit(1)).as("x"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100")).as("y"))
    val w = Window.orderBy("day").rowsBetween(-29, 0)
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("syy", sum(col("y") * col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .filter(col("n") === 30)
      .select(col("day"),
        round(expr("CAST(n * sxy - sx * sy AS DOUBLE)") /
          sqrt(expr("CAST(n * sxx - sx * sx AS DOUBLE)")) /
          sqrt(expr("CAST(n * syy - sy * sy AS DOUBLE)")), 6).as("r30"))
      .orderBy("day")
  }

  /** Cumulative gains / lift by activity decile: rank users by event
    * count (the "model score"), label = made a purchase, and report per
    * decile the cumulative share of all purchasers captured and the
    * lift over random targeting — the classifier-triage readout next to
    * q_classifier_eval's AUC. All ppm integers.
    *
    * 100 TB shape: per-user reduce, decile rank window over the user
    * frame, 10-row running census. */
  val qCumGains: Q = (s, d) => {
    val perUser = Tables.events(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("score"),
        max((col("event_type") === "purchase").cast("long")).as("label"))
    val deciled = perUser.withColumn("decile",
      ntile(10).over(Window.orderBy(col("score").desc, col("user_id"))).cast("long"))
    val census = deciled.groupBy("decile")
      .agg(count(lit(1)).as("n_users"), sum("label").as("n_pos"))
    val wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = census.agg(sum("n_users").as("n_total"), sum("n_pos").as("pos_total"))
    census
      .withColumn("cum_n", sum(col("n_users")).over(wc))
      .withColumn("cum_pos", sum(col("n_pos")).over(wc))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n_users"), col("n_pos"),
        expr("(cum_pos * 1000000) div pos_total").as("gain_ppm"),
        expr("(cum_pos * n_total * 1000000) div (pos_total * cum_n)").as("lift_ppm"))
      .orderBy("decile")
  }

  val all: Map[String, Q] = Map(
    "q_harmonic_centrality" -> qHarmonicCentrality,
    "q_hodges_lehmann" -> qHodgesLehmann,
    "q_poisson_dispersion" -> qPoissonDispersion,
    "q_rolling_corr" -> qRollingCorr,
    "q_cum_gains" -> qCumGains,
  )

  val oracles: Map[String, String] = Map(
    "q_harmonic_centrality" ->
      """WITH RECURSIVE items AS (
        | SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |edges AS (
        | SELECT DISTINCT a.p AS src, b.p AS dst
        | FROM items a JOIN items b ON a.o = b.o WHERE a.p <> b.p),
        |seeds AS (
        | SELECT p AS seed FROM (
        |  SELECT p, count(*) AS deg FROM items GROUP BY p
        |  ORDER BY deg DESC, p LIMIT 20)),
        |r(seed, id, hop) AS (
        | SELECT seed, seed, 0 FROM seeds
        | UNION
        | SELECT r.seed, e.dst, r.hop + 1
        | FROM r JOIN edges e ON e.src = r.id WHERE r.hop < 3),
        |mh AS (
        | SELECT seed, id, min(hop) AS hop FROM r GROUP BY seed, id)
        |SELECT seed, count(*) AS n_reached,
        | CAST(sum(6 // hop) AS BIGINT) AS harmonic_x6
        |FROM mh WHERE hop > 0 GROUP BY seed ORDER BY seed""".stripMargin,
    "q_hodges_lehmann" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y,
        |   date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS i
        | FROM orders GROUP BY 1),
        |sums AS (
        | SELECT a.y + b.y AS walsh_c2
        | FROM daily a JOIN daily b ON a.i <= b.i),
        |ranked AS (
        | SELECT walsh_c2, row_number() OVER (ORDER BY walsh_c2) AS rn FROM sums),
        |cnt AS (SELECT count(*) AS n_pairs FROM sums)
        |SELECT n_pairs, CAST(walsh_c2 AS BIGINT) AS walsh_c2,
        | CAST(walsh_c2 // 2 AS BIGINT) AS hl_cents
        |FROM ranked, cnt WHERE rn = (n_pairs + 1) // 2""".stripMargin,
    "q_poisson_dispersion" ->
      """WITH daily AS (
        | SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
        | FROM events GROUP BY 1, 2),
        |mo AS (
        | SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |   CAST(sum(x * x) AS BIGINT) AS sxx
        | FROM daily GROUP BY 1)
        |SELECT event_type, n, sx,
        | CAST(((n * sxx - sx * sx) * 1000000) // sx AS BIGINT) AS d_ppm,
        | CAST(((n * sxx - sx * sx) * 1000000) // sx > (n - 1) * 1000000
        |  AND (((n * sxx - sx * sx) * 1000000) // sx - (n - 1) * 1000000)
        |      * (((n * sxx - sx * sx) * 1000000) // sx - (n - 1) * 1000000)
        |      > 8 * (n - 1) * 1000000000000 AS BIGINT) AS overdispersed
        |FROM mo ORDER BY event_type""".stripMargin,
    "q_rolling_corr" ->
      """WITH daily AS (
        | SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
        |   count(*) AS x,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT) // 100) AS BIGINT) AS y
        | FROM orders GROUP BY 1),
        |rolled AS (
        | SELECT day,
        |  count(*) OVER w AS n,
        |  CAST(sum(x) OVER w AS BIGINT) AS sx, CAST(sum(y) OVER w AS BIGINT) AS sy,
        |  CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
        |  CAST(sum(y * y) OVER w AS BIGINT) AS syy,
        |  CAST(sum(x * y) OVER w AS BIGINT) AS sxy
        | FROM daily
        | WINDOW w AS (ORDER BY day ROWS BETWEEN 29 PRECEDING AND CURRENT ROW))
        |SELECT day,
        | round(CAST(n * sxy - sx * sy AS DOUBLE)
        |   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |   / sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r30
        |FROM rolled WHERE n = 30 ORDER BY day""".stripMargin,
    "q_cum_gains" ->
      """WITH per_user AS (
        | SELECT user_id, count(*) AS score,
        |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS label
        | FROM events GROUP BY user_id),
        |deciled AS (
        | SELECT CAST(ntile(10) OVER (ORDER BY score DESC, user_id) AS BIGINT)
        |   AS decile, label
        | FROM per_user),
        |census AS (
        | SELECT decile, count(*) AS n_users, CAST(sum(label) AS BIGINT) AS n_pos
        | FROM deciled GROUP BY decile),
        |tot AS (
        | SELECT CAST(sum(n_users) AS BIGINT) AS n_total,
        |   CAST(sum(n_pos) AS BIGINT) AS pos_total FROM census),
        |run AS (
        | SELECT decile, n_users, n_pos,
        |  CAST(sum(n_users) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS cum_n,
        |  CAST(sum(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS cum_pos
        | FROM census)
        |SELECT decile, n_users, n_pos,
        | CAST((cum_pos * 1000000) // pos_total AS BIGINT) AS gain_ppm,
        | CAST((cum_pos * n_total * 1000000) // (pos_total * cum_n) AS BIGINT)
        |   AS lift_ppm
        |FROM run, tot ORDER BY decile""".stripMargin,
  )
}
