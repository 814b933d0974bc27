package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** r9 batch 3: infrastructure + metrics operators — rendezvous
  * sharding, time-weighted averages, grouped OLS, winsorized robust
  * means, association rules, sliding-window distinct counts, and BFS
  * hop layers. Same float discipline: integer/decimal cores, selection
  * instead of interpolation, md5 for any hashing the oracle must
  * replay.
  */
object Analytics21 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Rendezvous (highest-random-weight) sharding: key k goes to the
    * shard s maximizing md5(s ‖ ':' ‖ k) — the consistent-routing
    * scheme whose defining property (removing one shard only remaps
    * that shard's keys) every distributed ingest layer leans on.
    * Reported per shard: key count + skew vs the uniform share in ppm
    * (integer). The weight argmax is a `greatest(struct(...))` over 8
    * per-shard hex slices — no explode, no shuffle beyond the census
    * agg.
    *
    * 100 TB shape: per-row expressions + one |shards|-row partial agg;
    * routing itself never shuffles. */
  val qRendezvous: Q = (s, d) => {
    val nShards = 8
    // argmax by lexicographic (hex-weight, shard) pair — fixed-width
    // lowercase hex compares like the integer it encodes
    val pick = greatest((0 until nShards).map(sh =>
      struct(md5(concat(lit(s"shard$sh:"), col("o_orderkey"))).as("w"),
        lit(sh.toLong).as("sh"))): _*)
    val routed = Tables.orders(s, d)
      .select(col("o_orderkey"), pick.getField("sh").as("shard"))
    val n = routed.agg(count(lit(1)).as("n_total"))
    routed.groupBy("shard").agg(count(lit(1)).as("n_keys"))
      .crossJoin(broadcast(n))
      .select(col("shard"), col("n_keys"),
        expr(s"((n_keys * $nShards - n_total) * 1000000) div n_total")
          .as("skew_ppm"))
      .orderBy("shard")
  }

  /** Time-weighted average value (TWAP) per user — the metric that is
    * robust to irregular sampling: each event's value holds until the
    * next event, weighted by its holding interval in microseconds;
    * integer µs × integer cents accumulate in DECIMAL(38,0), one
    * terminal division. Users with a single event (no held interval)
    * report their value directly.
    *
    * 100 TB shape: one user-keyed sort window (lead), one partial-agg'd
    * reduce — the same single shuffle sessionization pays. */
  val qTwap: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val held = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v_c"))
      .withColumn("next_us",
        lead(unix_micros(col("ts")), 1).over(w))
      .withColumn("dur_us",
        (col("next_us") - unix_micros(col("ts"))).cast("decimal(38,0)"))
    held.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("next_us").isNotNull,
          col("dur_us") * col("v_c")).otherwise(lit(0))
          .cast("decimal(38,0)")).as("wsum"),
        sum(when(col("next_us").isNotNull, col("dur_us"))
          .otherwise(lit(0)).cast("decimal(38,0)")).as("dsum"),
        min(struct(col("ts"), col("event_id"), col("v_c"))).as("first"))
      .select(col("user_id"), col("n_events"),
        when(col("dsum") > 0,
          round(expr("CAST(wsum AS DOUBLE) / CAST(dsum AS DOUBLE)") / 100.0, 6))
          .otherwise(col("first.v_c").cast("double") / 100.0).as("twap"))
      .orderBy("user_id")
  }

  /** Grouped OLS: per return flag, slope/intercept of extended price on
    * quantity plus r² — the per-segment trend readout, entirely from
    * exact integer moments (cents × integer quantity) with the standard
    * closed forms; fixed-order IEEE, r² as one ratio of exact
    * cross-moment products.
    *
    * 100 TB shape: 5 moment sums per group, one partial-agg'd pass. */
  val qGroupOls: Q = (s, d) => {
    val m = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("x"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))")).as("syy"))
    m.select(col("l_returnflag"), col("n"),
        round(((col("sxy").cast("double") * col("n") -
          col("sx").cast("double") * col("sy")) /
          (col("sxx").cast("double") * col("n") -
            col("sx").cast("double") * col("sx")) / 100.0), 6).as("slope"),
        round((col("sy").cast("double") / col("n") -
          (col("sxy").cast("double") * col("n") -
            col("sx").cast("double") * col("sy")) /
            (col("sxx").cast("double") * col("n") -
              col("sx").cast("double") * col("sx")) *
            (col("sx").cast("double") / col("n"))) / 100.0, 4).as("intercept"),
        round((col("sxy").cast("double") * col("n") -
          col("sx").cast("double") * col("sy")) *
          (col("sxy").cast("double") * col("n") -
            col("sx").cast("double") * col("sy")) /
          ((col("sxx").cast("double") * col("n") -
            col("sx").cast("double") * col("sx")) *
            (expr("CAST(syy AS DOUBLE)") * col("n") -
              col("sy").cast("double") * col("sy"))), 6).as("r2"))
      .orderBy("l_returnflag")
  }

  /** Winsorized mean: per return flag, the mean of extended price with
    * the tails clamped to the exact p05/p95 DATA VALUES (selected by
    * rank — percentile_disc semantics, no interpolation), the robust
    * location estimate that keeps sample size (unlike trimming).
    * Clamping and summing happen in integer cents; one division.
    *
    * 100 TB shape: rank selection via one sort window per group (the
    * q_percentiles external-sort shape), then a partial-agg'd clamped
    * sum — two passes, both spillable. */
  val qWinsorized: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
    val w = Window.partitionBy("l_returnflag").orderBy("v")
    val ranked = li.withColumn("rn", row_number().over(w))
    val counts = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    val bounds = ranked.join(counts, "l_returnflag")
      .filter(col("rn") === expr("greatest((n * 5) div 100, 1)") ||
        col("rn") === expr("greatest((n * 95) div 100, 1)"))
      .groupBy("l_returnflag")
      .agg(min("v").as("p05"), max("v").as("p95"))
    li.join(bounds, "l_returnflag")
      .select(col("l_returnflag"),
        greatest(least(col("v"), col("p95")), col("p05")).as("vw"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(sum("vw").cast("double") / count(lit(1)) / 100.0, 4)
          .as("winsorized_mean"))
      .join(bounds, "l_returnflag")
      .select(col("l_returnflag"), col("n"), col("p05"), col("p95"),
        col("winsorized_mean"))
      .orderBy("l_returnflag")
  }

  /** Association rules over co-purchased part BRANDS: for brand pairs
    * in the same order, support/confidence/lift in exact ppm integers
    * (lift_ppm = N·c_ab·10⁶ div (c_a·c_b) in DECIMAL(38,0) — no float
    * probability anywhere). The market-basket readout on top of the
    * q_basket_pairs co-occurrence machinery; brands (25 values) keep
    * the rule table bounded.
    *
    * 100 TB shape: per-order brand-set explode is bounded by |brands|;
    * both aggs partial; the rule join is |brands|²-sized. */
  val qAssocRules: Q = (s, d) => {
    val ob = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("o"), col("p_brand").as("b")).distinct()
    val nOrders = Tables.lineitem(s, d).select("l_orderkey").distinct()
      .agg(count(lit(1)).as("n_orders"))
    val single = ob.groupBy("b").agg(count(lit(1)).as("c"))
    val pairs = ob.as("x").join(ob.as("y"),
        col("x.o") === col("y.o") && col("x.b") < col("y.b"))
      .groupBy(col("x.b").as("b_a"), col("y.b").as("b_b"))
      .agg(count(lit(1)).as("c_ab"))
    pairs
      .join(single.select(col("b").as("b_a"), col("c").as("c_a")), "b_a")
      .join(single.select(col("b").as("b_b"), col("c").as("c_b")), "b_b")
      .crossJoin(broadcast(nOrders))
      .filter(col("c_ab") >= 20)
      .select(col("b_a"), col("b_b"), col("c_ab"),
        expr("(c_ab * 1000000) div n_orders").as("support_ppm"),
        expr("(c_ab * 1000000) div c_a").as("conf_a_to_b_ppm"),
        expr("CAST((CAST(n_orders AS DECIMAL(38,0)) * c_ab * 1000000)" +
          " div (CAST(c_a AS DECIMAL(38,0)) * c_b) AS BIGINT)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("b_a"), col("b_b"))
      .limit(50)
  }

  /** Sliding-window distinct count — daily 7-day-trailing distinct
    * active users, the DAU/WAU machinery Spark windows cannot express
    * (COUNT(DISTINCT) over a moving frame): implemented as the
    * (user, day)-distinct frame joined to the day grid within the
    * trailing range, then a partial-agg'd distinct count per grid day.
    *
    * 100 TB shape: the join fans each (user, active-day) row out to ≤ 7
    * grid days — linear with a constant-factor 7, partial-agg'd; no
    * per-day rescan of the fact. */
  val qWindowDistinct: Q = (s, d) => {
    val ud = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
    val grid = ud.select(col("day").as("g_day")).distinct()
    ud.join(grid,
        col("day") <= col("g_day") &&
          col("day") >= date_sub(col("g_day"), 6))
      .groupBy("g_day")
      .agg(countDistinct("user_id").as("wau"))
      .select(col("g_day").cast("string").as("day"), col("wau"))
      .orderBy("day")
  }

  /** BFS hop layers from the max-degree part node over the co-purchase
    * graph — frontier expansion with min-hop labels, 3 bounded rounds
    * (the "how far does influence reach" readout; the recursive-CTE
    * oracle replays the closure). Per layer: node count + min/max id
    * checksum. Iterative-bounded, each round one equi-join + min-agg.
    *
    * 100 TB shape: frontier joins are id-keyed; rounds bounded by the
    * hop cap, labels checkpointed per round. */
  val qBfsLayers: Q = (s, d) => {
    // items checkpointed: it feeds the edge self-join AND the seed
    // census (no shared exchange); edges at MEMORY_AND_DISK_SER like
    // every other |E|-sized graph checkpoint (r15)
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      // o-partitioned BEFORE the distinct (r16, the qHarmonicCentrality
      // treatment): satisfies the (o,p) distinct AND both self-join
      // sides — the join plans zero exchanges
      .repartition(col("o")).distinct()
      // |E|-scale frame: serialized residency like every other |E|-sized
      // checkpoint (r16, ADVICE r15 — the deserialized default is the
      // unroll-OOM class the r14/r15 probes documented)
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val edges = items.as("a").join(items.as("b"), col("a.o") === col("b.o"))
      .filter(col("a.p") =!= col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst"))
      // dst-partitioned checkpoint so each round's wedge pre-agg runs on
      // the hop-join output in place (r16, see qHarmonicCentrality)
      .repartition(col("dst")).distinct()
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val source = items.groupBy("p").agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("p")).limit(1)
      .select(col("p").as("id"), lit(0L).as("hop"))
    var labels = source.localCheckpoint()
    for (h <- 1 to 3) {
      val frontier = labels.filter(col("hop") === (h - 1))
      // wedge pre-agg before the union-merge (r16, §2.3 — min over
      // (labels ∪ next) = min over (labels ∪ min-per-key of next)); on
      // the broadcast-join output it rides the dst partitioning with no
      // exchange, so the merge shuffles node-sized frames only
      val next = edges.join(frontier, edges("src") === frontier("id"))
        .select(col("dst").as("id"), lit(h.toLong).as("hop"))
        .groupBy("id").agg(min("hop").as("hop"))
      labels = labels.union(next)
        .groupBy("id").agg(min("hop").as("hop"))
        .localCheckpoint()
    }
    labels.groupBy("hop")
      .agg(count(lit(1)).as("n_nodes"), min("id").as("min_id"),
        max("id").as("max_id"), sum("id").as("id_sum"))
      .orderBy("hop")
  }

  val all: Map[String, Q] = Map(
    "q_rendezvous" -> qRendezvous,
    "q_twap" -> qTwap,
    "q_group_ols" -> qGroupOls,
    "q_winsorized" -> qWinsorized,
    "q_assoc_rules" -> qAssocRules,
    "q_window_distinct" -> qWindowDistinct,
    "q_bfs_layers" -> qBfsLayers,
  )

  val oracles: Map[String, String] = Map(
    "q_rendezvous" ->
      """WITH routed AS (
        | SELECT o_orderkey,
        |  (SELECT sh FROM (
        |     SELECT sh, md5('shard' || sh || ':' || o_orderkey) AS w
        |     FROM (SELECT unnest(range(0, 8)) AS sh))
        |   ORDER BY w DESC, sh DESC LIMIT 1) AS shard
        | FROM orders),
        |n AS (SELECT count(*) AS n_total FROM orders)
        |SELECT shard, count(*) AS n_keys,
        | CAST(((count(*) * 8 - n.n_total) * 1000000) // n.n_total AS BIGINT)
        |   AS skew_ppm
        |FROM routed CROSS JOIN n
        |GROUP BY shard, n.n_total ORDER BY shard""".stripMargin,
    "q_twap" ->
      """WITH held AS (
        | SELECT user_id, ts, event_id,
        |  CAST(round(value * 100) AS BIGINT) AS v_c,
        |  lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS next_us,
        |  epoch_us(ts) AS t_us,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS rn
        | FROM events),
        |agg AS (
        | SELECT user_id, count(*) AS n_events,
        |  sum(CASE WHEN next_us IS NOT NULL
        |    THEN CAST(next_us - t_us AS HUGEINT) * v_c ELSE 0 END) AS wsum,
        |  sum(CASE WHEN next_us IS NOT NULL
        |    THEN CAST(next_us - t_us AS HUGEINT) ELSE 0 END) AS dsum,
        |  max(CASE WHEN rn = 1 THEN v_c END) AS first_v
        | FROM held GROUP BY user_id)
        |SELECT user_id, n_events,
        | CASE WHEN dsum > 0
        |  THEN round(CAST(wsum AS DOUBLE) / CAST(dsum AS DOUBLE) / 100.0, 6)
        |  ELSE CAST(first_v AS DOUBLE) / 100.0 END AS twap
        |FROM agg ORDER BY user_id""".stripMargin,
    "q_group_ols" ->
      """WITH m AS (
        | SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sy,
        |  CAST(sum(CAST(l_quantity AS BIGINT)
        |    * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sxy,
        |  CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
        |    AS BIGINT) AS sxx,
        |  sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
        |    * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS syy
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        | round((CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * sy)
        |   / (CAST(sxx AS DOUBLE) * n - CAST(sx AS DOUBLE) * sx) / 100.0, 6)
        |   AS slope,
        | round((CAST(sy AS DOUBLE) / n
        |   - (CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * sy)
        |     / (CAST(sxx AS DOUBLE) * n - CAST(sx AS DOUBLE) * sx)
        |     * (CAST(sx AS DOUBLE) / n)) / 100.0, 4) AS intercept,
        | round((CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * sy)
        |   * (CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * sy)
        |   / ((CAST(sxx AS DOUBLE) * n - CAST(sx AS DOUBLE) * sx)
        |     * (CAST(syy AS DOUBLE) * n - CAST(sy AS DOUBLE) * sy)), 6) AS r2
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_winsorized" ->
      """WITH li AS (
        | SELECT l_returnflag,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        | FROM lineitem),
        |ranked AS (
        | SELECT l_returnflag, v,
        |  row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn,
        |  count(*) OVER (PARTITION BY l_returnflag) AS n
        | FROM li),
        |bounds AS (
        | SELECT l_returnflag, min(v) AS p05, max(v) AS p95
        | FROM ranked
        | WHERE rn = greatest((n * 5) // 100, 1)
        |    OR rn = greatest((n * 95) // 100, 1)
        | GROUP BY l_returnflag)
        |SELECT li.l_returnflag, count(*) AS n, b.p05, b.p95,
        | round(CAST(sum(greatest(least(li.v, b.p95), b.p05)) AS DOUBLE)
        |   / count(*) / 100.0, 4) AS winsorized_mean
        |FROM li JOIN bounds b USING (l_returnflag)
        |GROUP BY li.l_returnflag, b.p05, b.p95
        |ORDER BY li.l_returnflag""".stripMargin,
    "q_assoc_rules" ->
      """WITH ob AS (
        | SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
        | FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
        |single AS (SELECT b, count(*) AS c FROM ob GROUP BY b),
        |pairs AS (
        | SELECT x.b AS b_a, y.b AS b_b, count(*) AS c_ab
        | FROM ob x JOIN ob y ON x.o = y.o AND x.b < y.b
        | GROUP BY x.b, y.b)
        |SELECT p.b_a, p.b_b, p.c_ab,
        | CAST((p.c_ab * 1000000) // n.n_orders AS BIGINT) AS support_ppm,
        | CAST((p.c_ab * 1000000) // a.c AS BIGINT) AS conf_a_to_b_ppm,
        | CAST((CAST(n.n_orders AS HUGEINT) * p.c_ab * 1000000)
        |   // (CAST(a.c AS HUGEINT) * b.c) AS BIGINT) AS lift_ppm
        |FROM pairs p
        |JOIN single a ON p.b_a = a.b
        |JOIN single b ON p.b_b = b.b
        |CROSS JOIN n
        |WHERE p.c_ab >= 20
        |ORDER BY lift_ppm DESC, p.b_a, p.b_b LIMIT 50""".stripMargin,
    "q_window_distinct" ->
      """WITH ud AS (
        | SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |grid AS (SELECT DISTINCT day AS g_day FROM ud)
        |SELECT CAST(g.g_day AS VARCHAR) AS day,
        | count(DISTINCT u.user_id) AS wau
        |FROM ud u JOIN grid g
        |  ON u.day <= g.g_day AND u.day >= g.g_day - 6
        |GROUP BY g.g_day ORDER BY day""".stripMargin,
    "q_bfs_layers" ->
      """WITH items AS (
        | SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |edges AS (
        | SELECT DISTINCT a.p AS src, b.p AS dst
        | FROM items a JOIN items b ON a.o = b.o AND a.p <> b.p),
        |src AS (
        | SELECT p AS id FROM items GROUP BY p
        | ORDER BY count(*) DESC, p LIMIT 1),
        |h0 AS (SELECT id, 0::BIGINT AS hop FROM src),
        |h1 AS (
        | SELECT id, min(hop) AS hop FROM (
        |  SELECT * FROM h0
        |  UNION ALL
        |  SELECT e.dst AS id, 1::BIGINT FROM edges e
        |   JOIN h0 ON e.src = h0.id AND h0.hop = 0) GROUP BY id),
        |h2 AS (
        | SELECT id, min(hop) AS hop FROM (
        |  SELECT * FROM h1
        |  UNION ALL
        |  SELECT e.dst AS id, 2::BIGINT FROM edges e
        |   JOIN h1 ON e.src = h1.id AND h1.hop = 1) GROUP BY id),
        |h3 AS (
        | SELECT id, min(hop) AS hop FROM (
        |  SELECT * FROM h2
        |  UNION ALL
        |  SELECT e.dst AS id, 3::BIGINT FROM edges e
        |   JOIN h2 ON e.src = h2.id AND h2.hop = 2) GROUP BY id)
        |SELECT hop, count(*) AS n_nodes, min(id) AS min_id,
        | max(id) AS max_id, CAST(sum(id) AS BIGINT) AS id_sum
        |FROM h3 GROUP BY hop ORDER BY hop""".stripMargin,
  )
}
