package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** r9 batch 4: calendar/business-day arithmetic, skew diagnostics,
  * stratified splitting, JS-divergence drift, and a generated date
  * dimension. Integer cores throughout; the one libm surface (JS ln) is
  * confined to per-bin micro-nat terms over a ≤20-row bounded frame.
  */
object Analytics22 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Business-day fulfillment latency per order priority — weekday
    * counting via the closed-form prefix function F(t) = 5·(t div 7) +
    * min(t mod 7, 5) on Monday-anchored shifted epoch days (t = e+3):
    * busdays in (order, ship] = F(t₂+1) − F(t₁+1), SIGNED (the
    * synthetic ship dates are not ordered against order dates; a
    * reversed pair reports a negative count rather than clamping —
    * the data-quality signal survives into the aggregate). Pure
    * integer div/mod — no calendar UDF, no per-day explode, exact in
    * every engine.
    *
    * 100 TB shape: two per-row expressions + one partial-agg'd
    * reduce. */
  val qBusinessDays: Q = (s, d) => {
    // F(e+4) with t = e+3 Monday-anchored: weekdays in (order, ship];
    // integer div/mod only (Column./ would be double division)
    def f(dateCol: String) =
      s"""(5 * ((CAST(datediff($dateCol, DATE '1970-01-01') AS BIGINT) + 4)
         |  div 7)
         | + least((CAST(datediff($dateCol, DATE '1970-01-01') AS BIGINT) + 4)
         |  % 7, 5))""".stripMargin
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        expr(s"${f("l_shipdate")} - ${f("o_orderdate")}").as("busdays"))
      .groupBy("priority")
      .agg(count(lit(1)).as("n"),
        sum("busdays").as("busdays_total"),
        max("busdays").as("max_busdays"))
      // the total can be negative (signed latency); both engines'
      // integer division TRUNCATES toward zero (Spark div by
      // definition; DuckDB's // measured: (-7)//2 = -3), so plain div
      // is sign-safe — a floor-div shift here would DIVERGE on
      // negative totals
      .withColumn("avg_busdays_milli",
        expr("(busdays_total * 1000) div n"))
      .select("priority", "n", "busdays_total", "avg_busdays_milli",
        "max_busdays")
      .orderBy("priority")
  }

  /** Shuffle-key skew report for l_partkey — the diagnosis a join
    * planner wants before picking salting: key count, max/top-1 share,
    * rank-selected p99 count, and the Herfindahl concentration index,
    * all exact integers (HHI as Σc²·10⁶ div n² in DECIMAL — the
    * probability-of-collision reading needs no floats).
    *
    * 100 TB shape: one partial-agg'd key count, then the p99 ORDER
    * STATISTIC from the COUNT-OF-COUNTS frame — |distinct count
    * values| rows, orders of magnitude below |keys|, so the cumulative
    * window never sees a data-sized frame (a row_number over the raw
    * key counts would be a single-partition sort of the key domain).
    * The rank-k count from the top is the largest c whose
    * descending-cumulative key tally reaches k — identical to rank
    * selection, ties and all. */
  val qSkewReport: Q = (s, d) => {
    val counts = Tables.lineitem(s, d).groupBy("l_partkey")
      .agg(count(lit(1)).as("c"))
    val stats = counts.agg(
      count(lit(1)).as("n_keys"), sum("c").as("n_rows"),
      max("c").as("max_cnt"),
      sum(expr("CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))")).as("ssq"))
    // count-of-counts: how many keys share each count value
    val coc = counts.groupBy("c").agg(count(lit(1)).as("k"))
    val w = Window.orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p99 = coc.withColumn("cumk", sum("k").over(w))
      .crossJoin(broadcast(stats.select(col("n_keys"))))
      .filter(col("cumk") >= expr("greatest(n_keys div 100, 1)"))
      .agg(max("c").as("p99_cnt"))
    stats.crossJoin(broadcast(p99))
      .select(col("n_keys"), col("n_rows"), col("max_cnt"), col("p99_cnt"),
        expr("(max_cnt * 1000000) div n_rows").as("top_share_ppm"),
        expr("CAST((ssq * 1000000) div (CAST(n_rows AS DECIMAL(38,0))" +
          " * n_rows) AS BIGINT)").as("hhi_ppm"))
  }

  /** Stratified 80/10/10 train/val/test split: within each
    * (lang, source) stratum, documents rank by md5('split:' ‖ doc_id)
    * and the cut points are exact integer apportionments — every
    * stratum is proportionally represented (the property a global
    * random split loses on small strata), the assignment is
    * deterministic and engine-replayable, and re-runs never migrate a
    * document between splits.
    *
    * 100 TB shape: one stratum-keyed rank window (spillable sort),
    * counts partial-agg'd; no global ordering anywhere. */
  val qStratifiedSplit: Q = (s, d) => {
    val w = Window.partitionBy("lang", "source")
      .orderBy(col("h"), col("doc_id"))
    val ranked = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        md5(concat(lit("split:"), col("doc_id"))).as("h"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy("lang", "source")))
    ranked
      .withColumn("split",
        when(col("rn") <= expr("(n * 80) div 100"), lit("train"))
          .when(col("rn") <= expr("(n * 90) div 100"), lit("val"))
          .otherwise(lit("test")))
      .groupBy("lang", "source", "split")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_sum"))
      .orderBy("lang", "source", "split")
  }

  /** Jensen–Shannon divergence between the two extreme sources'
    * doc-length distributions (20 equi-width bins of n_chars) — the
    * symmetric, bounded drift measure PSI complements. Per-bin terms
    * p·ln(p/m) are rounded to integer MICRO-NATS before summing
    * (integer sum — order-free; the ≤40 lns are the only libm calls,
    * on the bounded bin frame, never per row).
    *
    * 100 TB shape: one binned census per source (partial-agg'd);
    * everything after runs on ≤20 rows. */
  val qJsDivergence: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val srcs = docs.agg(min("source").as("sa"), max("source").as("sb"))
    val binned = docs.crossJoin(broadcast(srcs))
      .filter(col("source") === col("sa") || col("source") === col("sb"))
      .select(when(col("source") === col("sa"), lit("a")).otherwise(lit("b"))
        .as("side"),
        least(expr("n_chars div 100"), lit(19L)).as("bin"))
      .groupBy("bin")
      .agg(sum(when(col("side") === "a", 1L).otherwise(0L)).as("ca"),
        sum(when(col("side") === "b", 1L).otherwise(0L)).as("cb"))
    val tot = binned.agg(sum("ca").as("na"), sum("cb").as("nb"))
    val terms = binned.crossJoin(broadcast(tot))
      .select(col("bin"), col("ca"), col("cb"),
        (col("ca").cast("double") / col("na")).as("p"),
        (col("cb").cast("double") / col("nb")).as("q"))
      .withColumn("m", (col("p") + col("q")) / 2.0)
      .withColumn("t_a", when(col("ca") > 0,
        expr("CAST(round(p * ln(p / m) * 1000000) AS BIGINT)")).otherwise(0L))
      .withColumn("t_b", when(col("cb") > 0,
        expr("CAST(round(q * ln(q / m) * 1000000) AS BIGINT)")).otherwise(0L))
    terms.agg(
        sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        count(lit(1)).as("n_bins"),
        expr("CAST((sum(t_a) + sum(t_b)) div 2 AS BIGINT)").as("js_micronats"))
  }

  /** Generated calendar dimension over the order-date span, with the
    * integer Monday-anchored weekday ((e+3) mod 7 — engine-neutral,
    * unlike dayofweek whose week start differs per engine) and the
    * per-day order census LEFT-joined on (days without orders stay,
    * with 0) — the date-dim build step every warehouse runs.
    *
    * 100 TB shape: the dimension is |days|-sized (bounded); the census
    * is one partial-agg'd reduce joined to it. */
  val qCalendarDim: Q = (s, d) => {
    val span = Tables.orders(s, d).agg(
      min(col("o_orderdate").cast("date")).as("d0"),
      max(col("o_orderdate").cast("date")).as("d1"))
    val days = span.select(explode(expr(
      "sequence(d0, d1, interval 1 day)")).as("day"))
    val census = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n_orders"))
    days.join(census, Seq("day"), "left")
      .select(col("day").cast("string").as("day"),
        year(col("day")).cast("long").as("yr"),
        quarter(col("day")).cast("long").as("qtr"),
        month(col("day")).cast("long").as("mon"),
        expr("(CAST(datediff(day, DATE '1970-01-01') AS BIGINT) + 3) % 7")
          .as("dow_mon0"),
        (expr("(CAST(datediff(day, DATE '1970-01-01') AS BIGINT) + 3) % 7")
          >= 5).cast("long").as("is_weekend"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("day")
  }

  val all: Map[String, Q] = Map(
    "q_business_days" -> qBusinessDays,
    "q_key_hhi" -> qSkewReport,
    "q_stratified_split" -> qStratifiedSplit,
    "q_js_divergence" -> qJsDivergence,
    "q_calendar_dim" -> qCalendarDim,
  )

  val oracles: Map[String, String] = Map(
    "q_business_days" ->
      """WITH b AS (
        | SELECT o.o_orderpriority AS priority,
        |  (5 * ((CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(l.l_shipdate AS DATE)) AS BIGINT) + 4) // 7)
        |   + least((CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(l.l_shipdate AS DATE)) AS BIGINT) + 4) % 7, 5))
        |  - (5 * ((CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(o.o_orderdate AS DATE)) AS BIGINT) + 4) // 7)
        |   + least((CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(o.o_orderdate AS DATE)) AS BIGINT) + 4) % 7, 5))
        |  AS busdays
        | FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT priority, count(*) AS n,
        | CAST(sum(busdays) AS BIGINT) AS busdays_total,
        | CAST((sum(busdays) * 1000) // count(*) AS BIGINT)
        |   AS avg_busdays_milli,
        | CAST(max(busdays) AS BIGINT) AS max_busdays
        |FROM b GROUP BY priority ORDER BY priority""".stripMargin,
    "q_key_hhi" ->
      """WITH counts AS (
        | SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY l_partkey),
        |stats AS (
        | SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
        |  CAST(max(c) AS BIGINT) AS max_cnt,
        |  sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS ssq
        | FROM counts),
        |ranked AS (
        | SELECT c, row_number() OVER (ORDER BY c DESC, l_partkey) AS rn
        | FROM counts),
        |p99 AS (
        | SELECT c AS p99_cnt FROM ranked CROSS JOIN stats
        | WHERE rn = greatest(n_keys // 100, 1))
        |SELECT s.n_keys, s.n_rows, s.max_cnt, p.p99_cnt,
        | CAST((s.max_cnt * 1000000) // s.n_rows AS BIGINT) AS top_share_ppm,
        | CAST((s.ssq * 1000000) // (CAST(s.n_rows AS HUGEINT) * s.n_rows)
        |   AS BIGINT) AS hhi_ppm
        |FROM stats s CROSS JOIN p99 p""".stripMargin,
    "q_stratified_split" ->
      """WITH ranked AS (
        | SELECT doc_id, lang, source,
        |  row_number() OVER (PARTITION BY lang, source
        |    ORDER BY md5('split:' || doc_id), doc_id) AS rn,
        |  count(*) OVER (PARTITION BY lang, source) AS n
        | FROM documents)
        |SELECT lang, source,
        | CASE WHEN rn <= (n * 80) // 100 THEN 'train'
        |      WHEN rn <= (n * 90) // 100 THEN 'val'
        |      ELSE 'test' END AS split,
        | count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM ranked GROUP BY 1, 2, 3 ORDER BY lang, source, split""".stripMargin,
    "q_js_divergence" ->
      """WITH srcs AS (
        | SELECT min(source) AS sa, max(source) AS sb FROM documents),
        |binned AS (
        | SELECT least(n_chars // 100, 19) AS bin,
        |  CAST(sum(CASE WHEN source = s.sa THEN 1 ELSE 0 END) AS BIGINT)
        |    AS ca,
        |  CAST(sum(CASE WHEN source = s.sb THEN 1 ELSE 0 END) AS BIGINT)
        |    AS cb
        | FROM documents CROSS JOIN srcs s
        | WHERE source = s.sa OR source = s.sb
        | GROUP BY 1),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |  CAST(sum(cb) AS BIGINT) AS nb FROM binned),
        |terms AS (
        | SELECT bin, ca, cb,
        |  CAST(ca AS DOUBLE) / t.na AS p, CAST(cb AS DOUBLE) / t.nb AS q,
        |  (CAST(ca AS DOUBLE) / t.na + CAST(cb AS DOUBLE) / t.nb) / 2.0 AS m
        | FROM binned CROSS JOIN tot t)
        |SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
        | count(*) AS n_bins,
        | CAST((sum(CASE WHEN ca > 0
        |    THEN CAST(round(p * ln(p / m) * 1000000) AS BIGINT) ELSE 0 END)
        |  + sum(CASE WHEN cb > 0
        |    THEN CAST(round(q * ln(q / m) * 1000000) AS BIGINT) ELSE 0 END))
        |  // 2 AS BIGINT) AS js_micronats
        |FROM terms""".stripMargin,
    "q_calendar_dim" ->
      """WITH span AS (
        | SELECT CAST(min(o_orderdate) AS DATE) AS d0,
        |  CAST(max(o_orderdate) AS DATE) AS d1 FROM orders),
        |days AS (
        | SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
        |   AS day
        | FROM span),
        |census AS (
        | SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
        | FROM orders GROUP BY 1)
        |SELECT CAST(d.day AS VARCHAR) AS day,
        | CAST(year(d.day) AS BIGINT) AS yr,
        | CAST(quarter(d.day) AS BIGINT) AS qtr,
        | CAST(month(d.day) AS BIGINT) AS mon,
        | (CAST(date_diff('day', DATE '1970-01-01', d.day) AS BIGINT) + 3) % 7
        |   AS dow_mon0,
        | CAST((CAST(date_diff('day', DATE '1970-01-01', d.day) AS BIGINT) + 3)
        |   % 7 >= 5 AS BIGINT) AS is_weekend,
        | CAST(coalesce(c.n_orders, 0) AS BIGINT) AS n_orders
        |FROM days d LEFT JOIN census c ON d.day = c.day
        |ORDER BY day""".stripMargin,
  )
}
