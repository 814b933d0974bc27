package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality and association analytics over the star schema:
  * market-basket co-occurrence (support / confidence / lift), Benford
  * leading-digit profiling, and referential-integrity auditing — the
  * pre-ingest validation and association surface of a warehouse. All
  * three are exact-integer (counts and ratios of counts), so the
  * oracles replay with no rounding anywhere.
  */
object Quality {
  type Q = (SparkSession, String) => DataFrame

  /** Market-basket analysis: for part pairs co-occurring in the same
    * order, support count, confidence P(p2|p1), and lift
    * (n_pair·n_orders)/(n_p1·n_p2). The self-join is keyed on
    * l_orderkey EQUALITY with p1 < p2 inside the order — pair
    * explosion is bounded by (items per order)² (≤ 7 in TPC-H-shaped
    * data), so the plan stays linear in lineitem regardless of total
    * scale; there is no vocabulary cross-join anywhere. Confidence and
    * lift are long/long divisions of exact integer products (all
    * < 2⁵³), bit-identical cross-engine. Top-100 by (support desc,
    * pair) — a deterministic total order. */
  val qBasketPairs: Q = (s, d) => {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pkey"))
      .distinct()
    val itemN = items.groupBy("pkey").agg(count(lit(1)).as("n_item"))
    val totals = items.agg(countDistinct("okey").as("n_orders"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.okey") === col("b.okey") && col("a.pkey") < col("b.pkey"))
      .groupBy(col("a.pkey").as("p1"), col("b.pkey").as("p2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= 2)
    pairs
      .join(itemN.select(col("pkey").as("p1"), col("n_item").as("n_p1")), "p1")
      .join(itemN.select(col("pkey").as("p2"), col("n_item").as("n_p2")), "p2")
      .crossJoin(totals)
      .select(
        col("p1"), col("p2"), col("n_pair"), col("n_p1"), col("n_p2"),
        (col("n_pair") / col("n_p1")).as("confidence"),
        ((col("n_pair") * col("n_orders")) / (col("n_p1") * col("n_p2")))
          .as("lift"))
      .orderBy(col("n_pair").desc, col("p1"), col("p2"))
      .limit(100)
  }

  /** Benford leading-digit profile of l_extendedprice — the fraud /
    * synthetic-data detector: frequency of each first significant
    * digit vs the expected log distribution. The digit is extracted
    * from the INTEGER cents string (round(price·100) is exact for
    * money-granular data; long→string is identical cross-engine), so
    * there is no float log10/pow anywhere; the share is long/long.
    * One map-side-combinable count keyed by 9 digits. */
  val qBenford: Q = (s, d) => {
    val digits = Tables.lineitem(s, d)
      .select(substring(
        round(col("l_extendedprice") * 100).cast("long").cast("string"),
        1, 1).as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum("n").as("n_total"))
    digits.crossJoin(total)
      .select(col("digit"), col("n"), (col("n") / col("n_total")).as("share"))
      .orderBy("digit")
  }

  /** Referential-integrity audit of every FK edge in the star schema:
    * child row count + orphan count (children whose parent key is
    * missing) per edge. Each branch is a key-only left-anti join —
    * the parent side is pruned to its key column, so the shuffle
    * carries 8-byte rows; the four branches are independent scans
    * that union into a 4-row report. The ingest gate a warehouse runs
    * before accepting a batch. */
  val qFkIntegrity: Q = (s, d) => {
    def audit(edge: String, child: DataFrame, ck: String,
              parent: DataFrame, pk: String): DataFrame = {
      val orphans = child.select(col(ck))
        .join(parent.select(col(pk)), col(ck) === col(pk), "left_anti")
      child.agg(count(lit(1)).as("n_child"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(edge).as("fk_edge"), col("n_child"), col("n_orphans"))
    }
    val li = Tables.lineitem(s, d)
    audit("lineitem.l_orderkey->orders.o_orderkey",
        li, "l_orderkey", Tables.orders(s, d), "o_orderkey")
      .unionAll(audit("lineitem.l_partkey->part.p_partkey",
        li, "l_partkey", Tables.part(s, d), "p_partkey"))
      .unionAll(audit("lineitem.l_suppkey->supplier.s_suppkey",
        li, "l_suppkey", Tables.supplier(s, d), "s_suppkey"))
      .unionAll(audit("orders.o_custkey->customer.c_custkey",
        Tables.orders(s, d), "o_custkey", Tables.customer(s, d), "c_custkey"))
      .orderBy("fk_edge")
  }

  /** Sequence mining: the 20 most common opening event paths (first 5
    * events per user, in (ts, event_id) order, joined with '>'). The
    * per-user sequence is assembled ORDER-SAFELY: collect_list carries
    * (rn, type) structs and array_sort orders by rn before the join —
    * collect_list alone has no order guarantee under parallel merge.
    * One user-keyed window + one user-keyed aggregate; path strings are
    * ≤5 tokens so the final count is keyed by a bounded vocabulary. */
  val qTopPaths: Q = (s, d) => {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val paths = Tables.events(s, d)
      .withColumn("rn", row_number().over(byUser))
      .filter(col("rn") <= 5)
      .groupBy("user_id")
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(rn, event_type)))," +
          " x -> x.event_type)"), ">").as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(20)
  }

  /** Join-key skew diagnostics for every lineitem FK — the report that
    * decides salting/AQE-skew-split settings BEFORE a 100 TB join runs:
    * per key, the cardinality, max and LOWER-MEDIAN rows per key value
    * (datum-valued — [[graft.operators.Percentiles.groupedMedianLow]],
    * no interpolation to diverge on), and the skew ratio
    * max·n_keys/total as one exact-integer-product division. Per-key
    * counts are one map-side-combinable pass per FK; the median is the
    * spillable two-pass sort — no per-group value buffer. */
  val qSkewReport: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    def keyCounts(c: String): DataFrame = li
      .groupBy(col(c).as("k")).agg(count(lit(1)).as("cnt"))
      .select(lit(c).as("join_key"), col("cnt"))
    val counts = keyCounts("l_orderkey")
      .unionAll(keyCounts("l_partkey"))
      .unionAll(keyCounts("l_suppkey"))
    val stats = counts.groupBy("join_key").agg(
      count(lit(1)).as("n_keys"),
      sum("cnt").as("total_rows"),
      max("cnt").as("max_per_key"))
    val med = graft.operators.Percentiles
      .groupedMedianLow(counts, "join_key", "cnt", "median_per_key")
    stats.join(med, "join_key")
      .select(col("join_key"), col("n_keys"), col("total_rows"),
        col("max_per_key"), col("median_per_key"),
        ((col("max_per_key") * col("n_keys")) / col("total_rows"))
          .as("skew_ratio"))
      .orderBy("join_key")
  }

  /** Deterministic 5-fold cross-validation assignment over documents:
    * fold = top bits of the Knuth-permuted doc_id (the
    * [[graft.operators.Scale.knuthPerm]] idiom — seedless, shuffle-free,
    * and a DIFFERENT multiplier than the train-split/sampling decisions
    * so fold membership is independent of them). Report: per-fold doc
    * count and char mass — the balance check before cross-validated
    * training; the oracle replays the permutation verbatim, so the
    * EXACT assignment (not just the counts) is certified via the
    * per-fold sums. */
  val qKfold: Q = (s, d) => {
    val folds = Tables.documents(s, d)
      .select(shiftrightunsigned(
          graft.operators.Scale.knuthPerm(col("doc_id"), 3266489917L) * 5, 31)
          .as("fold"),
        length(col("text")).cast("long").as("n_chars"))
    folds.groupBy("fold")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("fold")
  }

  /** Table-snapshot diff — the reconciliation report between two
    * versions of a keyed table: added / removed / changed / unchanged
    * row counts plus the total absolute value drift of changed rows.
    * The two snapshots are carved DETERMINISTICALLY from orders (old
    * drops keys ≡3 mod 10, new drops ≡7 and bumps prices on keys ≡0
    * mod 5), so the full-outer key join — the one shuffle — exercises
    * every branch. Value compare in exact cents; the drift sum is pure
    * integer. At scale this is one co-partitionable join keyed by the
    * primary key, the same plan as an incremental upsert validation. */
  val qTableDiff: Q = (s, d) => {
    val base = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val old = base.filter(col("k") % 10 =!= 3)
      .select(col("k"), col("cents").as("old_cents"))
    val neu = base.filter(col("k") % 10 =!= 7)
      .select(col("k"),
        (col("cents") + when(col("k") % 5 === 0, 100L).otherwise(0L))
          .as("new_cents"))
    old.join(neu, Seq("k"), "full_outer")
      .select(
        when(col("old_cents").isNull, "added")
          .when(col("new_cents").isNull, "removed")
          .when(col("old_cents") =!= col("new_cents"), "changed")
          .otherwise("unchanged").as("change_type"),
        abs(coalesce(col("new_cents"), lit(0L)) -
          coalesce(col("old_cents"), lit(0L))).as("drift"))
      .groupBy("change_type")
      .agg(count(lit(1)).as("n_rows"), sum("drift").as("abs_drift_cents"))
      .orderBy("change_type")
  }

  /** Denormalized nested export — the document-assembly step that feeds
    * a feature store / retrieval index / LLM-context builder from a
    * normalized star: each order becomes ONE row carrying its line
    * items as an order-preserved nested payload (here serialized
    * "ln:part:cents|…" so the oracle can replay it with ordered
    * string_agg). The per-group array is bounded by items-per-order
    * (≤ 7 in TPC-H shape) — the collect_list can never buffer an
    * unbounded group; one equi-join + one okey-keyed agg, so the plan
    * is linear at any order count. */
  val qDenormExport: Q = (s, d) => {
    val li = Tables.lineitem(s, d).filter(col("l_orderkey") < 500)
      .select(col("l_orderkey").as("okey"), col("l_linenumber").as("ln"),
        col("l_partkey").as("pk"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val o = Tables.orders(s, d).filter(col("o_orderkey") < 500)
      .select(col("o_orderkey").as("okey"), col("o_custkey").as("custkey"))
    o.join(li, "okey")
      .groupBy("okey", "custkey")
      .agg(count(lit(1)).as("n_items"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("ln"), col("pk"), col("cents")))),
            x => concat_ws(":",
              x.getField("ln"), x.getField("pk"), x.getField("cents"))),
          "|").as("items"))
      .orderBy("okey")
  }

  /** Distribution-drift report — the data-quality monitor that catches a
    * silently shifted upstream feed: equi-width histogram ($50k bins on
    * order value) of a reference window (orders < 1995) vs the current
    * window (≥ 1995), compared in floored MILLI-proportions with the
    * per-bin L1 gap — a PSI-style drift signal without PSI's ln()
    * (integer arithmetic end to end, so Spark and the oracle agree
    * bit-for-bit; a monotone report for the same alerting decision).
    * Two partial-aggregable bin counts + one full-outer join on bin —
    * shuffle volume is |bins|, never |rows|; the 1-row totals arrive
    * via crossJoin (constant broadcast). */
  val qHistDrift: Q = (s, d) => {
    val binned = Tables.orders(s, d).select(
      year(col("o_orderdate")).as("yr"),
      expr("cast(round(o_totalprice * 100) as long) div 5000000").as("bin"))
    val a = binned.filter(col("yr") < 1995)
      .groupBy("bin").agg(count(lit(1)).as("cnt_a"))
    val b = binned.filter(col("yr") >= 1995)
      .groupBy("bin").agg(count(lit(1)).as("cnt_b"))
    a.join(b, Seq("bin"), "full_outer")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
      .crossJoin(a.agg(sum("cnt_a").as("tot_a")))
      .crossJoin(b.agg(sum("cnt_b").as("tot_b")))
      .select(col("bin"), col("cnt_a"), col("cnt_b"),
        expr("(cnt_a * 1000L) div tot_a").as("pa_milli"),
        expr("(cnt_b * 1000L) div tot_b").as("pb_milli"))
      .withColumn("drift_milli", abs(col("pa_milli") - col("pb_milli")))
      .orderBy("bin")
  }

  /** Sequence-completeness audit (gaps & islands, scale form) — did the
    * upstream feed drop ids? The classic lag-over-global-sort answer
    * single-partitions the world; instead keys fold into range buckets
    * (k div 1000) where within-bucket missing = (max−min+1) − count is
    * pure partial-aggregable arithmetic, and only the |buckets|-row
    * summary passes through the one ordered window for boundary gaps
    * (widen the bucket span to keep |buckets| driver-sized at any key
    * range — the sqrt-decomposition contract of Prefix). Emits only
    * anomalous buckets. The synthetic feed is gap-free, so dropped rows
    * are PLANTED deterministically (every k ≡ 13 mod 97 — the qRedact
    * planted-pattern idiom) and must all be localized. */
  val qSeqAudit: Q = (s, d) => {
    val b = Tables.orders(s, d)
      .filter(col("o_orderkey") % 97 =!= 13)
      .groupBy(expr("o_orderkey div 1000").as("bucket"))
      .agg(count(lit(1)).as("present"),
        min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .withColumn("missing_within", col("hi") - col("lo") + 1 - col("present"))
    val w = Window.orderBy("bucket")
    b.withColumn("gap_before",
        coalesce(col("lo") - lag("hi", 1).over(w) - 1, lit(0L)))
      .filter(col("missing_within") > 0 || col("gap_before") > 0)
      .select("bucket", "present", "lo", "hi", "missing_within", "gap_before")
      .orderBy("bucket")
  }

  /** Pareto concentration (80/20) — how many top parts carry 80% of
    * revenue. The global cumulative share runs through
    * [[graft.operators.Prefix.runningSum]] with a REVENUE-BAND bucket
    * (−(cents div 10⁷), monotone in the descending revenue order), so
    * no window ever sees more than one band; the 80% threshold compare
    * is cross-multiplied integers (5·cum_prev < 4·total — the covering
    * set includes the crossing part, exact at any scale). One summary
    * row certifies the whole curve. */
  val qPareto: Q = (s, d) => {
    val rev = Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
    val cum = graft.operators.Prefix.runningSum(rev,
      expr("-(cents div 10000000)"),
      Seq(col("cents").desc, col("pk").asc), col("cents"), "cum_cents")
    cum.crossJoin(rev.agg(sum("cents").as("total_cents")))
      .filter((col("cum_cents") - col("cents")) * 5 < col("total_cents") * 4)
      .agg(count(lit(1)).as("n_top"),
        max("cum_cents").as("top_cents"),
        max("total_cents").as("total_cents"))
      .crossJoin(rev.agg(count(lit(1)).as("n_parts")))
      .select(col("n_parts"), col("n_top"), col("top_cents"),
        col("total_cents"),
        expr("(top_cents * 1000L) div total_cents").as("share_milli"),
        expr("(n_top * 1000L) div n_parts").as("parts_milli"))
  }

  val all: Map[String, Q] = Map(
    "q_kfold" -> qKfold,
    "q_hist_drift" -> qHistDrift,
    "q_denorm_export" -> qDenormExport,
    "q_seq_audit" -> qSeqAudit,
    "q_pareto" -> qPareto,
    "q_table_diff" -> qTableDiff,
    "q_basket_pairs" -> qBasketPairs,
    "q_benford" -> qBenford,
    "q_fk_integrity" -> qFkIntegrity,
    "q_top_paths" -> qTopPaths,
    "q_skew_report" -> qSkewReport,
  )

  val oracles: Map[String, String] = Map(
    "q_seq_audit" ->
      """WITH b AS (
        | SELECT o_orderkey // 1000 AS bucket,
        |  CAST(count(*) AS BIGINT) AS present,
        |  min(o_orderkey) AS lo, max(o_orderkey) AS hi
        | FROM orders WHERE o_orderkey % 97 <> 13 GROUP BY 1),
        |g AS (
        | SELECT bucket, present, lo, hi,
        |  hi - lo + 1 - present AS missing_within,
        |  coalesce(lo - lag(hi) OVER (ORDER BY bucket) - 1, 0) AS gap_before
        | FROM b)
        |SELECT bucket, present, lo, hi, missing_within, gap_before
        |FROM g WHERE missing_within > 0 OR gap_before > 0
        |ORDER BY bucket""".stripMargin,
    "q_pareto" ->
      """WITH rev AS (
        | SELECT l_partkey AS pk,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        | FROM lineitem GROUP BY 1),
        |c AS (
        | SELECT cents, sum(cents) OVER (ORDER BY cents DESC, pk
        |   ROWS UNBOUNDED PRECEDING) AS cum_cents
        | FROM rev),
        |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents,
        |       CAST(count(*) AS BIGINT) AS n_parts FROM rev),
        |f AS (SELECT c.*, t.total_cents, t.n_parts
        |      FROM c CROSS JOIN t
        |      WHERE (cum_cents - cents) * 5 < total_cents * 4)
        |SELECT max(n_parts) AS n_parts, CAST(count(*) AS BIGINT) AS n_top,
        | CAST(max(cum_cents) AS BIGINT) AS top_cents,
        | max(total_cents) AS total_cents,
        | (CAST(max(cum_cents) AS BIGINT) * 1000) // max(total_cents) AS share_milli,
        | (CAST(count(*) AS BIGINT) * 1000) // max(n_parts) AS parts_milli
        |FROM f""".stripMargin,
    "q_denorm_export" ->
      """WITH li AS (
        | SELECT l_orderkey AS okey, l_linenumber AS ln, l_partkey AS pk,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        | FROM lineitem WHERE l_orderkey < 500)
        |SELECT o.o_orderkey AS okey, o.o_custkey AS custkey,
        | CAST(count(*) AS BIGINT) AS n_items,
        | string_agg(ln || ':' || pk || ':' || cents, '|' ORDER BY ln, pk, cents) AS items
        |FROM orders o JOIN li ON o.o_orderkey = li.okey
        |WHERE o.o_orderkey < 500
        |GROUP BY o.o_orderkey, o.o_custkey
        |ORDER BY okey""".stripMargin,
    "q_hist_drift" ->
      """WITH binned AS (
        | SELECT year(o_orderdate) AS yr,
        |  CAST(round(o_totalprice * 100) AS BIGINT) // 5000000 AS bin
        | FROM orders),
        |a AS (SELECT bin, CAST(count(*) AS BIGINT) AS cnt_a
        |      FROM binned WHERE yr < 1995 GROUP BY bin),
        |b AS (SELECT bin, CAST(count(*) AS BIGINT) AS cnt_b
        |      FROM binned WHERE yr >= 1995 GROUP BY bin),
        |j AS (SELECT coalesce(a.bin, b.bin) AS bin,
        |       coalesce(cnt_a, 0) AS cnt_a, coalesce(cnt_b, 0) AS cnt_b
        |      FROM a FULL OUTER JOIN b ON a.bin = b.bin),
        |t AS (SELECT (SELECT sum(cnt_a) FROM a) AS tot_a,
        |             (SELECT sum(cnt_b) FROM b) AS tot_b),
        |p AS (SELECT bin, cnt_a, cnt_b,
        |       CAST((cnt_a * 1000) // tot_a AS BIGINT) AS pa_milli,
        |       CAST((cnt_b * 1000) // tot_b AS BIGINT) AS pb_milli
        |      FROM j CROSS JOIN t)
        |SELECT bin, cnt_a, cnt_b, pa_milli, pb_milli,
        | abs(pa_milli - pb_milli) AS drift_milli
        |FROM p ORDER BY bin""".stripMargin,
    "q_kfold" ->
      """WITH f AS (
        | SELECT ((((doc_id % 2147483648) * 3266489917) % 2147483648) * 5)
        |   // 2147483648 AS fold,
        |  length(text) AS n_chars
        | FROM documents)
        |SELECT fold, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM f GROUP BY fold ORDER BY fold""".stripMargin,
    "q_table_diff" ->
      """WITH base AS (
        | SELECT o_orderkey AS k,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        | FROM orders),
        |old AS (SELECT k, cents AS old_cents FROM base WHERE k % 10 <> 3),
        |neu AS (
        | SELECT k, cents + CASE WHEN k % 5 = 0 THEN 100 ELSE 0 END AS new_cents
        | FROM base WHERE k % 10 <> 7),
        |j AS (
        | SELECT
        |  CASE WHEN old_cents IS NULL THEN 'added'
        |       WHEN new_cents IS NULL THEN 'removed'
        |       WHEN old_cents <> new_cents THEN 'changed'
        |       ELSE 'unchanged' END AS change_type,
        |  abs(coalesce(new_cents, 0) - coalesce(old_cents, 0)) AS drift
        | FROM old FULL OUTER JOIN neu USING (k))
        |SELECT change_type, count(*) AS n_rows,
        | CAST(sum(drift) AS BIGINT) AS abs_drift_cents
        |FROM j GROUP BY change_type ORDER BY change_type""".stripMargin,
    "q_basket_pairs" ->
      """WITH items AS (
        | SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem),
        |item_n AS (SELECT pkey, count(*) AS n_item FROM items GROUP BY pkey),
        |totals AS (SELECT count(DISTINCT okey) AS n_orders FROM items),
        |pairs AS (
        | SELECT a.pkey AS p1, b.pkey AS p2, count(*) AS n_pair
        | FROM items a JOIN items b ON a.okey = b.okey AND a.pkey < b.pkey
        | GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT p1, p2, CAST(n_pair AS BIGINT) AS n_pair,
        | CAST(na.n_item AS BIGINT) AS n_p1, CAST(nb.n_item AS BIGINT) AS n_p2,
        | CAST(n_pair AS BIGINT) / CAST(na.n_item AS BIGINT) AS confidence,
        | CAST(n_pair * t.n_orders AS BIGINT) /
        |  CAST(na.n_item * nb.n_item AS BIGINT) AS lift
        |FROM pairs
        | JOIN item_n na ON na.pkey = p1
        | JOIN item_n nb ON nb.pkey = p2
        | CROSS JOIN totals t
        |ORDER BY n_pair DESC, p1, p2 LIMIT 100""".stripMargin,
    "q_benford" ->
      """WITH d AS (
        | SELECT substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
        |   AS VARCHAR), 1, 1) AS digit
        | FROM lineitem),
        |c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit)
        |SELECT digit, CAST(n AS BIGINT) AS n,
        | CAST(n AS BIGINT) / CAST((SELECT sum(n) FROM c) AS BIGINT) AS share
        |FROM c ORDER BY digit""".stripMargin,
    "q_fk_integrity" ->
      """SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS fk_edge,
        | (SELECT count(*) FROM lineitem) AS n_child,
        | (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |   (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |  AS n_orphans
        |UNION ALL
        |SELECT 'lineitem.l_partkey->part.p_partkey',
        | (SELECT count(*) FROM lineitem),
        | (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |   (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        |UNION ALL
        |SELECT 'lineitem.l_suppkey->supplier.s_suppkey',
        | (SELECT count(*) FROM lineitem),
        | (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |   (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        |UNION ALL
        |SELECT 'orders.o_custkey->customer.c_custkey',
        | (SELECT count(*) FROM orders),
        | (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |   (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |ORDER BY fk_edge""".stripMargin,
    "q_top_paths" ->
      """WITH r AS (
        | SELECT user_id, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        | FROM events),
        |p AS (
        | SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        | FROM r WHERE rn <= 5 GROUP BY user_id)
        |SELECT path, count(*) AS n_users FROM p GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,
    "q_skew_report" ->
      """WITH c AS (
        | SELECT 'l_orderkey' AS join_key, l_orderkey AS k, count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2
        | UNION ALL SELECT 'l_partkey', l_partkey, count(*)
        |  FROM lineitem GROUP BY 1, 2
        | UNION ALL SELECT 'l_suppkey', l_suppkey, count(*)
        |  FROM lineitem GROUP BY 1, 2),
        |s AS (
        | SELECT join_key, count(*) AS n_keys,
        |  CAST(sum(cnt) AS BIGINT) AS total_rows,
        |  CAST(max(cnt) AS BIGINT) AS max_per_key
        | FROM c GROUP BY join_key),
        |m AS (
        | SELECT join_key, cnt,
        |  row_number() OVER (PARTITION BY join_key ORDER BY cnt) AS rn,
        |  count(*) OVER (PARTITION BY join_key) AS n
        | FROM c)
        |SELECT s.join_key, s.n_keys, s.total_rows, s.max_per_key,
        | CAST(m.cnt AS BIGINT) AS median_per_key,
        | CAST(s.max_per_key * s.n_keys AS BIGINT) / s.total_rows AS skew_ratio
        |FROM s JOIN m ON s.join_key = m.join_key AND m.rn = (m.n + 1) // 2
        |ORDER BY s.join_key""".stripMargin,
  )
}
