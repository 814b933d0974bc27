package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Coverage batch 5 (round 6): distribution-shape statistics, robust
  * outlier detection, quantile binning, and the ORC columnar round-trip —
  * the profiling/feature-engineering surface a training-data pipeline
  * runs before and after every curation pass, with the same oracle
  * discipline as [[Relational]].
  */
object Relational5 {
  type Q = (SparkSession, String) => DataFrame

  /** Higher-moment distribution statistics per group — skewness, excess
    * kurtosis, correlation, covariance — computed from RAW POWER SUMS
    * with the identical closed-form formula on both engines, NOT the
    * built-in `skewness`/`kurtosis` aggregates: engines disagree on
    * bias correction (sample vs population estimators), while
    * Σx,Σx²,Σx³,Σx⁴ are definition-free. One partial-aggregable pass
    * (8 sums per group — map-side combine, constant state), formulas
    * applied on the 3-row aggregate; 4-dp rounding absorbs
    * partition-order float-summation noise. x = l_quantity (values
    * 1–50, so power sums stay far from double cancellation; price-scale
    * columns would lose precision in Σx⁴). */
  val qStatsMoments: Q = (s, d) => {
    val base = Tables.lineitem(s, d).select(
        col("l_returnflag").as("flag"),
        col("l_quantity").as("x"),
        col("l_extendedprice").as("y"))
      .withColumn("x2", col("x") * col("x"))
      .withColumn("x3", col("x2") * col("x"))
      .withColumn("x4", col("x3") * col("x"))
      .withColumn("y2", col("y") * col("y"))
      .withColumn("xy", col("x") * col("y"))
    val sums = base.groupBy("flag").agg(
      count(lit(1)).cast("double").as("n"),
      sum("x").as("sx"), sum("x2").as("sx2"),
      sum("x3").as("sx3"), sum("x4").as("sx4"),
      sum("y").as("sy"), sum("y2").as("sy2"), sum("xy").as("sxy"))
    val n = col("n"); val mu = col("sx") / n
    val m2 = col("sx2") / n - mu * mu
    val m3 = col("sx3") / n - lit(3.0) * mu * (col("sx2") / n) +
      lit(2.0) * mu * mu * mu
    val m4 = col("sx4") / n - lit(4.0) * mu * (col("sx3") / n) +
      lit(6.0) * mu * mu * (col("sx2") / n) - lit(3.0) * mu * mu * mu * mu
    sums.select(
        col("flag"),
        n.cast("long").as("n"),
        round(mu, 4).as("mean_qty"),
        // + 0.0 on the sign-ambiguous moments: a symmetric group yields
        // exactly 0 and the engines split on -0.0 vs 0.0 (sf0.001 sweep)
        (round(m3 / (m2 * sqrt(m2)), 4) + lit(0.0)).as("skew_qty"),
        (round(m4 / (m2 * m2) - 3.0, 4) + lit(0.0)).as("kurt_qty"),
        (round((n * col("sxy") - col("sx") * col("sy")) /
          (sqrt(n * col("sx2") - col("sx") * col("sx")) *
           sqrt(n * col("sy2") - col("sy") * col("sy"))), 4) + lit(0.0))
          .as("corr_qty_price"),
        (round((col("sxy") - col("sx") * col("sy") / n) / (n - 1), 2) + lit(0.0))
          .as("covar_qty_price"))
      .orderBy("flag")
  }

  /** Robust outlier detection via MAD (median absolute deviation): per
    * group, lower-median price, MAD around it, and the count of rows
    * beyond 2×MAD — the heavy-tail-safe alternative to z-scores whose
    * mean/stddev a single wild value can drag.
    *
    * Both medians come from [[graft.operators.Percentiles.groupedMedianLow]]
    * — actual data values, bit-identical cross-engine, so the strict
    * `dv > 2·MAD` threshold comparison can NEVER flip on a last-ulp
    * difference (money-granular prices make exact threshold ties
    * realistic, which is why the interpolated median is the wrong tool
    * here). Two spillable sort-window passes; the per-group medians join
    * back broadcast-sized. */
  val qRobustMad: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice").as("v"))
    val med = graft.operators.Percentiles
      .groupedMedianLow(li, "l_returnflag", "v", "med")
    val dev = li.join(broadcast(med), "l_returnflag")
      .withColumn("dv", abs(col("v") - col("med")))
    val mad = graft.operators.Percentiles.groupedMedianLow(
      dev.select(col("l_returnflag"), col("dv")), "l_returnflag", "dv", "mad")
    dev.join(broadcast(mad), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(
        first(col("med")).as("med_price"),
        first(col("mad")).as("mad_price"),
        sum(when(col("dv") > lit(2.0) * col("mad"), 1L).otherwise(0L))
          .as("n_out"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Quantile binning: NTILE(10) decile assignment over price within
    * each return flag — the feature-discretization pass (equal-frequency
    * bucketing) every tabular training pipeline applies. The window
    * ORDER BY is made TOTAL with key tiebreakers: ntile assigns by
    * position, so an engine-dependent order among price ties would
    * otherwise move rows across decile boundaries. Per-decile count and
    * exact min/max bounds (data values — bit-identical). One spillable
    * sort window + one aggregation. */
  val qNtileBucketize: Q = (s, d) => {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, d)
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy("l_returnflag", "decile")
      .agg(count(lit(1)).as("cnt"),
        min("l_extendedprice").as("lo"),
        max("l_extendedprice").as("hi"))
      .orderBy("l_returnflag", "decile")
  }

  /** Per-group simple linear regression (price ~ quantity): slope,
    * intercept, and R² from the SAME raw power sums as
    * [[qStatsMoments]] — not the built-in `regr_*` aggregates, for the
    * same reason (one definition, zero bias-correction ambiguity). One
    * partial-aggregable pass; 4-dp rounding absorbs summation order.
    * R² for simple regression = corr², so it shares the correlation
    * denominator. */
  val qLinreg: Q = (s, d) => {
    val base = Tables.lineitem(s, d).select(
        col("l_returnflag").as("flag"),
        col("l_quantity").as("x"),
        col("l_extendedprice").as("y"))
      .withColumn("x2", col("x") * col("x"))
      .withColumn("y2", col("y") * col("y"))
      .withColumn("xy", col("x") * col("y"))
    val sums = base.groupBy("flag").agg(
      count(lit(1)).cast("double").as("n"),
      sum("x").as("sx"), sum("x2").as("sx2"),
      sum("y").as("sy"), sum("y2").as("sy2"), sum("xy").as("sxy"))
    val n = col("n")
    val cov = n * col("sxy") - col("sx") * col("sy")
    val varX = n * col("sx2") - col("sx") * col("sx")
    val varY = n * col("sy2") - col("sy") * col("sy")
    val slope = cov / varX
    sums.select(
        col("flag"),
        n.cast("long").as("n"),
        round(slope, 4).as("slope"),
        round((col("sy") - slope * col("sx")) / n, 4).as("intercept"),
        round(cov * cov / (varX * varY), 4).as("r2"))
      .orderBy("flag")
  }

  /** One scratch root per JVM, one subdirectory per invocation (same
    * isolation rationale as the JSONL round-trip's). */
  private lazy val orcScratch: String =
    java.nio.file.Files.createTempDirectory("graft_orc").toString
  private val orcRun = new java.util.concurrent.atomic.AtomicLong(0L)

  /** ORC round-trip through the source layer ([[graft.sources.Sources]]):
    * documents exported to ORC — the other columnar warehouse format a
    * migration brings — and re-read (ORC carries its own schema; the
    * scan gets the same pushdown/pruning machinery as parquet), then
    * aggregated per stratum with id/char checksums against the parquet
    * originals. A green row certifies the export+scan is lossless. */
  val qOrcRoundtrip: Q = (s, d) => {
    val dir = s"$orcScratch/run_${orcRun.incrementAndGet()}"
    graft.sources.Sources.writeOrc(
      Tables.documents(s, d).select("doc_id", "text", "lang"), dir)
    graft.sources.Sources.readOrc(s, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"),
        sum("doc_id").as("id_sum"))
      .orderBy("lang")
  }

  /** Winsorized robust mean: clip prices at the exact interpolated
    * p05/p95 per group ([[graft.operators.Percentiles.groupedQuantiles]]
    * — the spillable sort path, broadcast back as 2 values/group), then
    * average — the outlier-robust aggregate that keeps row count (unlike
    * trimming). Clip-at-boundary ulp differences vanish into the 2-dp
    * rounding of the final mean; the bounds themselves are also output
    * (interpolated, 2-dp). */
  val qWinsorize: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice").as("v"))
    val bounds = graft.operators.Percentiles.groupedQuantiles(
      li, "l_returnflag", "v", Seq(0.05 -> "lo", 0.95 -> "hi"))
    li.join(broadcast(bounds), "l_returnflag")
      .withColumn("w", greatest(col("lo"), least(col("hi"), col("v"))))
      .groupBy("l_returnflag")
      .agg(
        round(avg("v"), 2).as("raw_mean"),
        round(avg("w"), 2).as("winsorized_mean"),
        round(first("lo"), 2).as("p05"),
        round(first("hi"), 2).as("p95"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Deterministic MODE per group — the categorical-profile aggregate:
    * most frequent order priority per status, ties broken by the
    * LEXICOGRAPHICALLY SMALLEST value. Two stacked exact steps: value
    * counts (partial-aggregable), then a row_number pick over
    * (cnt desc, value asc). Spark's own `mode()` and DuckDB's both
    * break ties arbitrarily, so neither built-in can be oracle-paired;
    * the explicit tie-break can. */
  val qMode: Q = (s, d) => {
    val counts = Tables.orders(s, d)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("cnt").desc, col("o_orderpriority").asc)
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderstatus"),
        col("o_orderpriority").as("mode_priority"), col("cnt"))
      .orderBy("o_orderstatus")
  }

  private lazy val incrScratch: String =
    java.nio.file.Files.createTempDirectory("graft_incr").toString
  private val incrRun = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Incremental aggregate maintenance ([[graft.operators.IncrementalAgg]]):
    * lineitem arrives as two disjoint delta batches (orderkey parity —
    * stands in for daily partitions); each folds into a persisted
    * mergeable (cnt, sum) state without rescanning the other. The oracle
    * aggregates the WHOLE table in one pass — a green row proves
    * incremental refresh ≡ full recompute, including the derived mean
    * (sums of sums, never averages of averages). 2/4-dp rounding absorbs
    * the extra float-merge step's summation order. */
  val qIncrAgg: Q = (s, d) => {
    val store = s"$incrScratch/run_${incrRun.incrementAndGet()}/state"
    val li = Tables.lineitem(s, d).select(col("l_returnflag"),
      col("l_orderkey"), col("l_quantity"))
    graft.operators.IncrementalAgg.refresh(
      s, store, li.filter(col("l_orderkey") % 2 === 0), "l_returnflag", "l_quantity")
    graft.operators.IncrementalAgg.refresh(
      s, store, li.filter(col("l_orderkey") % 2 === 1), "l_returnflag", "l_quantity")
    graft.operators.IncrementalAgg.readState(s, store)
      .select(col("l_returnflag"), col("cnt"),
        round(col("total"), 2).as("total_qty"),
        round(col("mean"), 4).as("mean_qty"))
      .orderBy("l_returnflag")
  }

  /** Orderless table checksum — cross-system data reconciliation: per
    * group, row count + the SUM of per-row content fingerprints
    * ([[graft.text.TextFunctions.fingerprint]], the polynomial rolling
    * hash whose DuckDB replay is already oracle-certified). Sum is
    * commutative, so the checksum is partition-order-free and
    * partial-aggregable — two systems compare 3 rows instead of moving
    * 100 TB. Only integer/string fields enter the row string (double
    * FORMATTING is engine-specific; integral doubles are cast first). */
  val qTableChecksum: Q = (s, d) => {
    val rowStr = concat_ws("|",
      col("l_orderkey"), col("l_linenumber"),
      col("l_returnflag"), col("l_linestatus"),
      col("l_quantity").cast("long"))
    // project to the 5 fingerprinted columns, THEN fan out (r16): the
    // per-row polynomial hash is CPU-bound and the few-split scan pinned
    // it to 3 tasks (measured 3.4 s of the query's 3.7 s in one 3-task
    // job at sf0.1); projecting first keeps the exchange narrow
    graft.operators.Scale.fanOutScan(
        Tables.lineitem(s, d).select("l_returnflag", "l_orderkey",
          "l_linenumber", "l_linestatus", "l_quantity"))
      .select(col("l_returnflag"),
        graft.text.TextFunctions.fingerprint(rowStr).as("fp"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("fp").as("checksum"))
      .orderBy("l_returnflag")
  }

  /** Quantity-weighted median price per flag
    * ([[graft.operators.Percentiles.groupedWeightedMedian]]) next to the
    * unweighted lower median — the pair that shows WHY weighting
    * matters (they differ when cheap lines carry big quantities). Both
    * are data values; the oracle replays the cumulative-weight
    * selection with a flat window. */
  val qWeightedMedian: Q = (s, d) => {
    val li = Tables.lineitem(s, d).select(col("l_returnflag"),
      col("l_extendedprice").as("v"), col("l_quantity"))
    val wmed = graft.operators.Percentiles.groupedWeightedMedian(
      li, "l_returnflag", "v", "l_quantity", "wmed_price")
    val med = graft.operators.Percentiles.groupedMedianLow(
      li.select(col("l_returnflag"), col("v")), "l_returnflag", "v", "med_price")
    wmed.join(med, "l_returnflag")
      .select(col("l_returnflag"), col("wmed_price"), col("med_price"))
      .orderBy("l_returnflag")
  }

  val all: Map[String, Q] = Map(
    "q_mode" -> qMode,
    "q_incr_agg" -> qIncrAgg,
    "q_table_checksum" -> qTableChecksum,
    "q_weighted_median" -> qWeightedMedian,
    "q_stats_moments" -> qStatsMoments,
    "q_robust_mad" -> qRobustMad,
    "q_ntile_bucketize" -> qNtileBucketize,
    "q_orc_roundtrip" -> qOrcRoundtrip,
    "q_linreg" -> qLinreg,
    "q_winsorize" -> qWinsorize,
  )

  val oracles: Map[String, String] = Map(
    "q_mode" ->
      """WITH c AS (
        | SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        | FROM orders GROUP BY o_orderstatus, o_orderpriority),
        |r AS (
        | SELECT *, row_number() OVER (PARTITION BY o_orderstatus
        |   ORDER BY cnt DESC, o_orderpriority ASC) AS rn
        | FROM c)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
        |FROM r WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,
    "q_stats_moments" ->
      """WITH base AS (
        | SELECT l_returnflag AS flag, l_quantity AS x, l_extendedprice AS y,
        |  l_quantity*l_quantity AS x2,
        |  (l_quantity*l_quantity)*l_quantity AS x3,
        |  ((l_quantity*l_quantity)*l_quantity)*l_quantity AS x4,
        |  l_extendedprice*l_extendedprice AS y2,
        |  l_quantity*l_extendedprice AS xy
        | FROM lineitem),
        |sums AS (
        | SELECT flag, CAST(count(*) AS DOUBLE) AS n,
        |  sum(x) AS sx, sum(x2) AS sx2, sum(x3) AS sx3, sum(x4) AS sx4,
        |  sum(y) AS sy, sum(y2) AS sy2, sum(xy) AS sxy
        | FROM base GROUP BY flag)
        |SELECT flag, CAST(n AS BIGINT) AS n,
        | round(sx/n, 4) AS mean_qty,
        | round((sx3/n - 3.0*(sx/n)*(sx2/n) + 2.0*(sx/n)*(sx/n)*(sx/n))
        |   / ((sx2/n - (sx/n)*(sx/n)) * sqrt(sx2/n - (sx/n)*(sx/n))), 4) + 0.0
        |   AS skew_qty,
        | round((sx4/n - 4.0*(sx/n)*(sx3/n) + 6.0*(sx/n)*(sx/n)*(sx2/n)
        |    - 3.0*(sx/n)*(sx/n)*(sx/n)*(sx/n))
        |   / ((sx2/n - (sx/n)*(sx/n)) * (sx2/n - (sx/n)*(sx/n))) - 3.0, 4) + 0.0
        |   AS kurt_qty,
        | round((n*sxy - sx*sy)
        |   / (sqrt(n*sx2 - sx*sx) * sqrt(n*sy2 - sy*sy)), 4) + 0.0
        |   AS corr_qty_price,
        | round((sxy - sx*sy/n) / (n - 1), 2) + 0.0 AS covar_qty_price
        |FROM sums ORDER BY flag""".stripMargin,
    "q_robust_mad" ->
      """WITH li AS (SELECT l_returnflag, l_extendedprice AS v FROM lineitem),
        |rk AS (SELECT l_returnflag, v,
        |   row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn,
        |   count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM li),
        |med AS (SELECT l_returnflag, v AS med FROM rk WHERE rn = (n+1)//2),
        |dev AS (SELECT li.l_returnflag, abs(li.v - med.med) AS dv, med.med
        |  FROM li JOIN med USING (l_returnflag)),
        |rk2 AS (SELECT l_returnflag, dv,
        |   row_number() OVER (PARTITION BY l_returnflag ORDER BY dv) AS rn,
        |   count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM dev),
        |mad AS (SELECT l_returnflag, dv AS mad FROM rk2 WHERE rn = (n+1)//2)
        |SELECT d.l_returnflag, max(d.med) AS med_price, max(m.mad) AS mad_price,
        | CAST(sum(CASE WHEN d.dv > 2.0*m.mad THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_out,
        | count(*) AS n
        |FROM dev d JOIN mad m USING (l_returnflag)
        |GROUP BY d.l_returnflag ORDER BY d.l_returnflag""".stripMargin,
    "q_ntile_bucketize" ->
      """WITH b AS (
        | SELECT l_returnflag, l_extendedprice,
        |  ntile(10) OVER (PARTITION BY l_returnflag
        |    ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS decile
        | FROM lineitem)
        |SELECT l_returnflag, CAST(decile AS BIGINT) AS decile,
        | count(*) AS cnt, min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |FROM b GROUP BY l_returnflag, decile
        |ORDER BY l_returnflag, decile""".stripMargin,
    "q_weighted_median" ->
      """WITH nn AS (
        | SELECT l_returnflag, l_extendedprice AS v,
        |  CAST(l_quantity AS BIGINT) AS w
        | FROM lineitem),
        |t AS (SELECT l_returnflag, sum(w) AS tw FROM nn GROUP BY l_returnflag),
        |c AS (SELECT l_returnflag, v,
        |  sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
        | FROM nn),
        |wm AS (SELECT c.l_returnflag, min(c.v) AS wmed_price
        | FROM c JOIN t USING (l_returnflag)
        | WHERE c.cw * 2 >= t.tw GROUP BY c.l_returnflag),
        |rk AS (SELECT l_returnflag, v,
        |  row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn,
        |  count(*) OVER (PARTITION BY l_returnflag) AS n
        | FROM nn),
        |m AS (SELECT l_returnflag, v AS med_price FROM rk WHERE rn = (n+1)//2)
        |SELECT wm.l_returnflag, wm.wmed_price, m.med_price
        |FROM wm JOIN m USING (l_returnflag)
        |ORDER BY wm.l_returnflag""".stripMargin,
    "q_table_checksum" ->
      """WITH r AS (
        | SELECT l_returnflag,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(
        |      concat_ws('|', l_orderkey, l_linenumber, l_returnflag,
        |        l_linestatus, CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)), ''),
        |      c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
        | FROM lineitem)
        |SELECT l_returnflag, count(*) AS n, CAST(sum(fp) AS BIGINT) AS checksum
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_incr_agg" ->
      """SELECT l_returnflag, count(*) AS cnt,
        | round(sum(l_quantity), 2) AS total_qty,
        | round(sum(l_quantity) / count(*), 4) AS mean_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_linreg" ->
      """WITH base AS (
        | SELECT l_returnflag AS flag, l_quantity AS x, l_extendedprice AS y,
        |  l_quantity*l_quantity AS x2,
        |  l_extendedprice*l_extendedprice AS y2,
        |  l_quantity*l_extendedprice AS xy
        | FROM lineitem),
        |sums AS (
        | SELECT flag, CAST(count(*) AS DOUBLE) AS n,
        |  sum(x) AS sx, sum(x2) AS sx2,
        |  sum(y) AS sy, sum(y2) AS sy2, sum(xy) AS sxy
        | FROM base GROUP BY flag)
        |SELECT flag, CAST(n AS BIGINT) AS n,
        | round((n*sxy - sx*sy) / (n*sx2 - sx*sx), 4) AS slope,
        | round((sy - ((n*sxy - sx*sy) / (n*sx2 - sx*sx))*sx) / n, 4)
        |   AS intercept,
        | round((n*sxy - sx*sy)*(n*sxy - sx*sy)
        |   / ((n*sx2 - sx*sx)*(n*sy2 - sy*sy)), 4) AS r2
        |FROM sums ORDER BY flag""".stripMargin,
    "q_winsorize" ->
      """WITH li AS (SELECT l_returnflag, l_extendedprice AS v FROM lineitem),
        |b AS (SELECT l_returnflag,
        |   quantile_cont(v, 0.05) AS lo, quantile_cont(v, 0.95) AS hi
        |  FROM li GROUP BY l_returnflag)
        |SELECT li.l_returnflag,
        | round(avg(li.v), 2) AS raw_mean,
        | round(avg(greatest(b.lo, least(b.hi, li.v))), 2) AS winsorized_mean,
        | round(max(b.lo), 2) AS p05, round(max(b.hi), 2) AS p95,
        | count(*) AS n
        |FROM li JOIN b USING (l_returnflag)
        |GROUP BY li.l_returnflag ORDER BY li.l_returnflag""".stripMargin,
    "q_orc_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(length(text)) AS BIGINT) AS total_chars,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
  )
}
