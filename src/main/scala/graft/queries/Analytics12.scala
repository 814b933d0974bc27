package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** r7y batch — profiling and planning statistics (column entropy,
  * timeline gaps, self-join blow-up, compaction bins) plus the
  * feature-store point-in-time backfill.
  */
object Analytics12 {
  type Q = (SparkSession, String) => DataFrame

  /** Per-column Shannon entropy over the low-cardinality categorical
    * columns — the profiling statistic behind encoding choices
    * (dictionary vs plain), partition-key vetting (low entropy → few
    * distinct values → giant partitions), and drift alarms. One
    * count-agg per column (the shuffle carries |distinct| rows), the
    * entropy folds on the tiny aggregate. */
  val qEntropyProfile: Q = (s, d) => {
    def ent(df: DataFrame, table: String, column: String): DataFrame = {
      val counts = df.select(col(column).cast("string").as("v"))
        .groupBy("v").agg(count(lit(1)).as("n"))
      counts.agg(
          lit(s"$table.$column").as("column_name"),
          count(lit(1)).as("n_distinct"),
          sum("n").as("n_rows"),
          round(
            (log(2.0, sum("n")) -
              sum(col("n") * log(2.0, col("n"))) / sum("n")), 6)
            .as("entropy_bits"))
    }
    ent(Tables.orders(s, d), "orders", "o_orderstatus")
      .unionByName(ent(Tables.orders(s, d), "orders", "o_orderpriority"))
      .unionByName(ent(Tables.lineitem(s, d), "lineitem", "l_returnflag"))
      .unionByName(ent(Tables.lineitem(s, d), "lineitem", "l_linestatus"))
      .unionByName(ent(Tables.customer(s, d), "customer", "c_mktsegment"))
      .unionByName(ent(Tables.events(s, d), "events", "event_type"))
      .orderBy("column_name")
  }

  /** Timeline gap detection: which (hour × event_type) cells in the
    * events table's span saw ZERO events — the monitoring primitive for
    * "did ingestion stall" that a plain groupBy can never answer
    * (absent rows don't group). The hour spine generates from the
    * global min/max (driver-sized: one `sequence()` over the span),
    * cross-joined with the |types|-sized type list, anti-joined against
    * observed cells; only the compact per-type summary leaves the
    * executor. */
  val qGapDetect: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
    val bounds = ev.agg(min("hour").as("lo"), max("hour").as("hi"))
    val hours = bounds.select(explode(
      expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
    val types = ev.select("event_type").distinct()
    val observed = ev.distinct()
    hours.crossJoin(types)
      .join(observed, Seq("hour", "event_type"), "left_anti")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_missing_hours"),
        date_format(min("hour"), "yyyy-MM-dd HH:mm:ss").as("first_missing"),
        date_format(max("hour"), "yyyy-MM-dd HH:mm:ss").as("last_missing"))
      .orderBy("event_type")
  }

  /** Self-join size estimation from the key-degree histogram: for
    * l_partkey, how many keys have each degree and how many output
    * pairs Σ d² each degree class would contribute to a self-join —
    * THE pre-flight statistic for any similarity/dedup join (this
    * engine's own jaccard path budgets Σ|docs(shingle)|² with exactly
    * this number). Two aggs, both shuffling only key-level rows. */
  val qSelfjoinSize: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy("l_partkey").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_keys"))
      .select(col("degree"), col("n_keys"),
        (col("degree") * col("degree") * col("n_keys")).as("selfjoin_pairs"))
      .orderBy("degree")
  }

  /** Compaction planning: greedy contiguous bin packing of per-source
    * document byte totals into ~256 KB target bins — the small-files
    * maintenance pass every lakehouse table needs. The sizes are a
    * |sources|-row aggregate; bin assignment is one window cumsum over
    * that aggregate (bin = exclusive-prefix-bytes div target), so the
    * planning cost is independent of table size. */
  val qCompactionPlan: Q = (s, d) => {
    val target = 256L * 1024L
    val sizes = Tables.documents(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(length(col("text"))).as("bytes"))
    val w = Window.orderBy("source")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sizes
      .withColumn("cum_bytes", sum("bytes").over(w))
      .select(col("source"), col("n_docs"), col("bytes"),
        ((col("cum_bytes") - col("bytes")) / target).cast("long").as("bin_id"))
      .orderBy("source")
  }

  /** Point-in-time feature backfill: for every order, the customer's
    * STRICTLY-PRIOR order count and exact-cent spend at that order's
    * date — the leakage-free feature join a training pipeline needs
    * (a feature computed with ≥ instead of > silently trains on the
    * label). One customer-keyed window, range-framed to end 1 day
    * before the current row; ties on the same day are excluded
    * together, which is the conservative (no-intraday-ordering)
    * convention. Reported as per-prior-count histogram so the output
    * stays compact at any scale. */
  val qPitFeatures: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
      .rangeBetween(Window.unboundedPreceding, -86400L)
    val feats = o
      .withColumn("prior_orders", count(lit(1)).over(w))
      .withColumn("prior_spend_c", coalesce(sum("cents").over(w), lit(0L)))
    feats.groupBy("prior_orders")
      .agg(count(lit(1)).as("n_orders"),
        sum("prior_spend_c").as("total_prior_spend_c"))
      .orderBy("prior_orders")
  }

  val all: Map[String, Q] = Map(
    "q_entropy_profile" -> qEntropyProfile,
    "q_gap_detect" -> qGapDetect,
    "q_selfjoin_size" -> qSelfjoinSize,
    "q_compaction_plan" -> qCompactionPlan,
    "q_pit_features" -> qPitFeatures,
  )

  val oracles: Map[String, String] = Map(
    "q_entropy_profile" ->
      """WITH src AS (
        | SELECT 'orders.o_orderstatus' AS column_name, o_orderstatus AS v FROM orders
        | UNION ALL SELECT 'orders.o_orderpriority', o_orderpriority FROM orders
        | UNION ALL SELECT 'lineitem.l_returnflag', l_returnflag FROM lineitem
        | UNION ALL SELECT 'lineitem.l_linestatus', l_linestatus FROM lineitem
        | UNION ALL SELECT 'customer.c_mktsegment', c_mktsegment FROM customer
        | UNION ALL SELECT 'events.event_type', event_type FROM events),
        |counts AS (
        | SELECT column_name, v, count(*) AS n FROM src GROUP BY column_name, v)
        |SELECT column_name, count(*) AS n_distinct,
        | CAST(sum(n) AS BIGINT) AS n_rows,
        | round(log2(sum(n)) - sum(n * log2(n)) / sum(n), 6) AS entropy_bits
        |FROM counts GROUP BY column_name
        |ORDER BY column_name""".stripMargin,
    "q_gap_detect" ->
      """WITH ev AS (
        | SELECT date_trunc('hour', ts) AS hour, event_type FROM events),
        |bounds AS (SELECT min(hour) AS lo, max(hour) AS hi FROM ev),
        |hours AS (
        | SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |observed AS (SELECT DISTINCT hour, event_type FROM ev),
        |missing AS (
        | SELECT h.hour, t.event_type
        | FROM hours h CROSS JOIN types t
        | LEFT JOIN observed o ON h.hour = o.hour AND t.event_type = o.event_type
        | WHERE o.hour IS NULL)
        |SELECT event_type, count(*) AS n_missing_hours,
        | strftime(min(hour), '%Y-%m-%d %H:%M:%S') AS first_missing,
        | strftime(max(hour), '%Y-%m-%d %H:%M:%S') AS last_missing
        |FROM missing GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q_selfjoin_size" ->
      """WITH deg AS (
        | SELECT l_partkey, count(*) AS degree FROM lineitem GROUP BY l_partkey)
        |SELECT degree, count(*) AS n_keys,
        | CAST(degree * degree * count(*) AS BIGINT) AS selfjoin_pairs
        |FROM deg GROUP BY degree
        |ORDER BY degree""".stripMargin,
    "q_compaction_plan" ->
      """WITH sizes AS (
        | SELECT source, count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS bytes
        | FROM documents GROUP BY source)
        |SELECT source, n_docs, bytes,
        | CAST((sum(bytes) OVER (ORDER BY source
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bytes)
        |      // 262144 AS BIGINT) AS bin_id
        |FROM sizes
        |ORDER BY source""".stripMargin,
    "q_pit_features" ->
      """WITH o AS (
        | SELECT o_custkey, o_orderdate,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        | FROM orders),
        |feats AS (
        | SELECT o_custkey, cents,
        |  count(*) OVER w AS prior_orders,
        |  coalesce(sum(cents) OVER w, 0) AS prior_spend_c
        | FROM o
        | WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(CAST(o_orderdate AS TIMESTAMP))
        |   RANGE BETWEEN UNBOUNDED PRECEDING AND 86400 PRECEDING))
        |SELECT prior_orders, count(*) AS n_orders,
        | CAST(sum(prior_spend_c) AS BIGINT) AS total_prior_spend_c
        |FROM feats GROUP BY prior_orders
        |ORDER BY prior_orders""".stripMargin,
  )
}
