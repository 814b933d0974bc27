package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** r9 batch 5: community detection, SLA bands, dedup survivorship, and
  * path-hierarchy rollup.
  */
object Analytics23 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Community detection by synchronous label propagation (Raghavan et
    * al. 2007), 3 deterministic rounds over the part co-purchase graph:
    * each round every node adopts its neighborhood's modal label
    * (count DESC, then label ASC — a total order, so the sync update is
    * reproducible, unlike the classic random-order variant). Reported:
    * per-community size census of the ≥3-member communities plus label
    * checksum.
    *
    * 100 TB shape: each round is one edge⋈label equi-join + a
    * two-level agg (count per (node, label), then argmax per node) —
    * all id-keyed partial-agg'd shuffles; rounds bounded at 3;
    * labels checkpointed per round (the dupClusters discipline).
    * The deterministic argmax is max(struct(cnt, -label)) — no sort
    * window.
    *
    * BUCKETED-EDGE + BROADCAST-LABEL rounds (r13, the hedge named in
    * PLANS.md's r12 adjudication, taken one step further after the
    * dst-bucketed variant measured 17.5× — the join re-shuffle it
    * removed was not the bottleneck; the per-round (src,lbl) count
    * exchange still moved |edges| rows/round): the edge list is
    * hash-partitioned on `src` ONCE before its checkpoint, and each
    * round joins the NODE-sized label frame in as a broadcast on dst.
    * The join output then carries the src partitioning, which
    * satisfies both the (src,lbl) count grouping and the (src) argmax
    * grouping (partition keys ⊆ grouping keys), so a round plans ZERO
    * shuffles — the only per-round traffic is the |V|-row label
    * broadcast. Labels here are the part dimension (|V| ≪ |E|, the
    * dimension-vs-fact gap that makes this the right 100 TB plan: 10⁸
    * nodes × 16 B ≈ 1.6 GB broadcast, fine on executor-class memory);
    * for a node set too big to broadcast the dst-bucketed shuffle-join
    * variant is the fallback, with the same oracle. PlanSpec asserts
    * the zero-shuffle round shape. */
  val qLabelProp: Q = (s, d) => {
    // o-partitioned checkpoint (r16, the qHarmonicCentrality treatment):
    // items feeds both sides of the o-keyed self-join — un-checkpointed,
    // each side replayed the lineitem scan + distinct, and each paid its
    // own exchange; hashpartitioning(o) satisfies the (o,p) distinct and
    // both join sides, so the edge build now plans one items exchange
    // total
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .repartition(col("o")).distinct()
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // MEMORY_AND_DISK_SER edge checkpoint (r15, VERDICT r14 task 1;
    // supersedes r14's blanket DISK_ONLY): the edge list is |E|-sized
    // (~930 M rows at sf31) and scanned 3× (once per round). The r14
    // lesson stands — memory-resident DESERIALIZED blocks OOM'd the
    // sf31 probe (unrolled row objects compete with execution memory)
    // — but DISK_ONLY overpaid at mid-scale (harmonic sf10 2.5×) by
    // forfeiting RAM residency where the edges fit. Serialized blocks
    // keep the bounded incremental unroll that prevents the OOM class
    // (a block is one compact byte buffer, unrolled via the memory
    // manager with spill-to-disk on pressure), yet stay RAM-resident
    // when they fit — strictly dominating DISK_ONLY on this box
    // (PLANS.md r15 A/B: sf1/sf10/sf31). Same LogicalRDD mechanics,
    // so the captured hashpartitioning(src) — the zero-shuffle round
    // shape — is unchanged (PlanSpec asserts it).
    val edges = items.as("a").join(items.as("b"), col("a.o") === col("b.o"))
      .filter(col("a.p") =!= col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst"))
      .repartition(col("src"))
      .distinct()
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // checkpoint BEFORE aliasing lbl = id: a Project aliasing the
    // partition key reports PartitioningCollection(lbl, id) and the
    // checkpoint's LogicalRDD keeps only its head (lbl), which a
    // partitioning-reuse consumer on `id` can't use — checkpointing the
    // bare id frame captures hashpartitioning(id), the alias rides on top
    var labels = edges.select(col("src").as("id")).distinct()
      .localCheckpoint()
      .withColumn("lbl", col("id"))
    for (_ <- 1 to 3) {
      val neigh = edges.join(broadcast(labels), edges("dst") === labels("id"))
        .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("cnt"))
      labels = neigh
        .groupBy(col("src").as("id"))
        .agg(max(struct(col("cnt"), (-col("lbl")).as("neg"))).as("m"))
        .select(col("id"), (-col("m.neg")).as("lbl"))
        .localCheckpoint()
    }
    labels.groupBy("lbl")
      .agg(count(lit(1)).as("sz"), sum("id").as("id_sum"))
      .filter(col("sz") >= 3)
      .orderBy(col("sz").desc, col("lbl"))
      .limit(50)
  }

  /** Daily SLA bands: per order day, the p50/p95 order values by RANK
    * SELECTION inside the day partition (percentile_disc semantics —
    * data values, no interpolation) plus the day's count — the
    * latency-band dashboard query.
    *
    * 100 TB shape: ONE day-partitioned sort window (parallel across
    * days, spillable within), conditional agg keeps two rows per day —
    * never a global sort, never a per-group value buffer. */
  val qDailyBands: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_orderdate").cast("date").cast("string").as("day"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"))
    val w = Window.partitionBy("day").orderBy(col("v"), lit(1))
    val ranked = o.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("day")))
    ranked
      .filter(col("rn") === expr("greatest((n * 50) div 100, 1)") ||
        col("rn") === expr("greatest((n * 95) div 100, 1)"))
      .groupBy("day")
      .agg(max("n").as("n_orders"),
        min(when(col("rn") === expr("greatest((n * 50) div 100, 1)"), col("v")))
          .as("p50_c"),
        min(when(col("rn") === expr("greatest((n * 95) div 100, 1)"), col("v")))
          .as("p95_c"))
      .orderBy("day")
  }

  /** Near-dup cluster SURVIVORSHIP — after clustering, a real curation
    * pipeline keeps each cluster's BEST document, not its min-id one:
    * canonical = argmax(n_chars, then min doc_id) per cluster
    * ([[graft.dedup.Dedup.dupClusters]] output joined back to document
    * stats). Reports each multi-doc cluster's canonical pick and what
    * it displaced — the golden-record step of dedup.
    *
    * 100 TB shape: clusters from the checkpointed pair pipeline; the
    * survivorship argmax is one struct-max agg per cluster — no window,
    * no sort. */
  val qClusterCanon: Q = (s, d) => {
    import graft.dedup.Dedup
    val docs = Tables.documents(s, d)
    val clusters = Dedup.dupClusters(Dedup.jaccardPairs(docs, 0.6, maxDf = 16))
    val stats = clusters.join(docs.select(col("doc_id").as("id"),
      col("n_chars")), "id")
    stats.groupBy("cluster_id")
      .agg(count(lit(1)).as("sz"),
        max(struct(col("n_chars"), (-col("id")).as("neg"))).as("m"),
        sum("id").as("member_id_sum"))
      .filter(col("sz") >= 2)
      .select(col("cluster_id"), col("sz"),
        (-col("m.neg")).as("canonical_id"),
        col("m.n_chars").as("canonical_chars"),
        col("member_id_sum"))
      .orderBy("cluster_id")
  }

  /** URL path-hierarchy rollup over the planted event URLs (the
    * q_url_canonical fixture): explode each path's prefixes
    * (/a, /a/b, /a/b/c) and census hits per prefix at each depth — the
    * web-corpus directory profile. Prefix fan-out is bounded by path
    * depth (≤3 here); string/integer only.
    *
    * 100 TB shape: bounded explode + one partial-agg'd census. */
  val qPathRollup: Q = (s, d) => {
    val path = concat(lit("/p"), (col("event_id") % 5).cast("string"),
      lit("/s"), (col("event_id") % 3).cast("string"),
      lit("/f"), (col("event_id") % 2).cast("string"))
    val parts = split(path, "/")
    Tables.events(s, d)
      .select(col("event_id"), posexplode(
        array(
          concat(lit("/"), element_at(parts, 2)),
          concat(lit("/"), element_at(parts, 2), lit("/"), element_at(parts, 3)),
          concat(lit("/"), element_at(parts, 2), lit("/"), element_at(parts, 3),
            lit("/"), element_at(parts, 4))))
        .as(Seq("depth0", "prefix")))
      .select((col("depth0") + 1).cast("long").as("depth"), col("prefix"))
      .groupBy("depth", "prefix")
      .agg(count(lit(1)).as("n_hits"))
      .orderBy("depth", "prefix")
  }

  val all: Map[String, Q] = Map(
    "q_label_prop" -> qLabelProp,
    "q_daily_bands" -> qDailyBands,
    "q_cluster_canon" -> qClusterCanon,
    "q_path_rollup" -> qPathRollup,
  )

  val oracles: Map[String, String] = Map(
    "q_label_prop" ->
      """WITH items AS (
        | SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |edges AS (
        | SELECT DISTINCT a.p AS src, b.p AS dst
        | FROM items a JOIN items b ON a.o = b.o AND a.p <> b.p),
        |l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM edges),
        |r1 AS (
        | SELECT e.src AS id, l.lbl, count(*) AS cnt
        | FROM edges e JOIN l0 l ON e.dst = l.id GROUP BY 1, 2),
        |l1 AS (
        | SELECT id, lbl FROM (
        |  SELECT id, lbl, row_number() OVER (PARTITION BY id
        |    ORDER BY cnt DESC, lbl ASC) AS rk FROM r1) WHERE rk = 1),
        |r2 AS (
        | SELECT e.src AS id, l.lbl, count(*) AS cnt
        | FROM edges e JOIN l1 l ON e.dst = l.id GROUP BY 1, 2),
        |l2 AS (
        | SELECT id, lbl FROM (
        |  SELECT id, lbl, row_number() OVER (PARTITION BY id
        |    ORDER BY cnt DESC, lbl ASC) AS rk FROM r2) WHERE rk = 1),
        |r3 AS (
        | SELECT e.src AS id, l.lbl, count(*) AS cnt
        | FROM edges e JOIN l2 l ON e.dst = l.id GROUP BY 1, 2),
        |l3 AS (
        | SELECT id, lbl FROM (
        |  SELECT id, lbl, row_number() OVER (PARTITION BY id
        |    ORDER BY cnt DESC, lbl ASC) AS rk FROM r3) WHERE rk = 1)
        |SELECT lbl, count(*) AS sz, CAST(sum(id) AS BIGINT) AS id_sum
        |FROM l3 GROUP BY lbl HAVING count(*) >= 3
        |ORDER BY sz DESC, lbl LIMIT 50""".stripMargin,
    "q_cluster_canon" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(ts)-1),
        |   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
        | FROM toks WHERE len(ts) >= 3),
        |e AS (SELECT doc_id, len(s) AS nsh, unnest(s) AS shingle FROM sh),
        |common AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.nsh AS na, b.nsh AS nb,
        |        count(*) AS c
        | FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        | GROUP BY 1, 2, 3, 4),
        |pairs AS (
        | SELECT a_id, b_id FROM common WHERE CAST(c AS DOUBLE)/(na+nb-c) >= 0.6),
        |edges AS (
        | SELECT a_id AS src, b_id AS dst FROM pairs
        | UNION ALL
        | SELECT b_id, a_id FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |r(id, n) AS (
        | SELECT id, id FROM nodes
        | UNION
        | SELECT r.id, e.dst FROM r JOIN edges e ON e.src = r.n),
        |cl AS (SELECT id, min(n) AS cluster_id FROM r GROUP BY id),
        |st AS (
        | SELECT cl.cluster_id, cl.id, d.n_chars
        | FROM cl JOIN documents d ON d.doc_id = cl.id),
        |canon AS (
        | SELECT cluster_id, id AS canonical_id, n_chars AS canonical_chars
        | FROM (SELECT cluster_id, id, n_chars, row_number() OVER (
        |   PARTITION BY cluster_id ORDER BY n_chars DESC, id ASC) AS rk
        |  FROM st) WHERE rk = 1),
        |agg AS (
        | SELECT cluster_id, count(*) AS sz,
        |  CAST(sum(id) AS BIGINT) AS member_id_sum
        | FROM st GROUP BY cluster_id HAVING count(*) >= 2)
        |SELECT a.cluster_id, a.sz, c.canonical_id,
        | CAST(c.canonical_chars AS BIGINT) AS canonical_chars,
        | a.member_id_sum
        |FROM agg a JOIN canon c USING (cluster_id)
        |ORDER BY a.cluster_id""".stripMargin,
    "q_daily_bands" ->
      """WITH o AS (
        | SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS v
        | FROM orders),
        |ranked AS (
        | SELECT day, v,
        |  row_number() OVER (PARTITION BY day ORDER BY v) AS rn,
        |  count(*) OVER (PARTITION BY day) AS n
        | FROM o)
        |SELECT day, CAST(max(n) AS BIGINT) AS n_orders,
        | CAST(min(CASE WHEN rn = greatest((n * 50) // 100, 1) THEN v END)
        |   AS BIGINT) AS p50_c,
        | CAST(min(CASE WHEN rn = greatest((n * 95) // 100, 1) THEN v END)
        |   AS BIGINT) AS p95_c
        |FROM ranked
        |WHERE rn = greatest((n * 50) // 100, 1)
        |   OR rn = greatest((n * 95) // 100, 1)
        |GROUP BY day ORDER BY day""".stripMargin,
    "q_path_rollup" ->
      """WITH pp AS (
        | SELECT event_id,
        |  '/p' || CAST(event_id % 5 AS VARCHAR) AS s1,
        |  '/s' || CAST(event_id % 3 AS VARCHAR) AS s2,
        |  '/f' || CAST(event_id % 2 AS VARCHAR) AS s3
        | FROM events),
        |ex AS (
        | SELECT 1 AS depth, s1 AS prefix FROM pp
        | UNION ALL SELECT 2, s1 || s2 FROM pp
        | UNION ALL SELECT 3, s1 || s2 || s3 FROM pp)
        |SELECT CAST(depth AS BIGINT) AS depth, prefix, count(*) AS n_hits
        |FROM ex GROUP BY depth, prefix ORDER BY depth, prefix""".stripMargin,
  )
}
