package graft.queries

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions.tokens

/** r7x batch — spatial grid-bucketed radius join, consistent hash
  * sampling, Zipf rank–frequency fit, the watermarked stream-stream
  * interval join on the oracle surface, and functional-dependency
  * profiling.
  */
object Analytics11 {
  type Q = (SparkSession, String) => DataFrame

  private val run = new AtomicLong()

  /** Bounded-radius spatial join via grid bucketing: how many suppliers
    * sit within Chebyshev radius 250 of each customer, reported as a
    * histogram (suppliers-in-radius → customer count, zero bucket
    * included). Coordinates are derived deterministically from the keys
    * (Knuth multiplicative hash mod a 10 000² space) so the oracle can
    * re-derive them exactly in integer arithmetic.
    *
    * The scalable shape: points land in cells of side = radius, the
    * probe side expands to its 3×3 cell neighbourhood (a supplier within
    * radius is provably within ±1 cell), and the join is a plain
    * equi-join on the cell key — no cross product, fan-out bounded by
    * per-cell density. Each supplier occupies exactly one cell, so a
    * (customer, supplier) pair is examined at most once and needs no
    * post-join dedup. 100 TB: cell density is the knob; skewed cells
    * AQE-split like any hash join.
    */
  val qGridRadiusJoin: Q = (s, d) => {
    val r = 250L
    // reduce the key mod 10⁴ BEFORE the hash multiply: (id·k) mod m ≡
    // ((id mod m)·k) mod m, and the bounded operand (< 10⁴·2.7e9 ≈ 2.7e13)
    // can never overflow int64 — Spark would wrap silently (non-ANSI)
    // where DuckDB raises, an engine divergence for keys above ~3.5e9
    def coords(df: DataFrame, key: String): DataFrame = df
      .select(col(key).cast("long").as("id"))
      .withColumn("x", pmod(pmod(col("id"), lit(10000L)) * 2654435761L, lit(10000L)))
      .withColumn("y", pmod(pmod(col("id"), lit(10000L)) * 40503L, lit(10000L)))
    val cust = coords(Tables.customer(s, d), "c_custkey")
      .withColumnRenamed("id", "cust_id")
    val supp = coords(Tables.supplier(s, d), "s_suppkey")
      .select(col("id").as("supp_id"), col("x").as("sx"), col("y").as("sy"),
        (col("x") / r).cast("long").as("cx"), (col("y") / r).cast("long").as("cy"))
    val probes = cust
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("cust_id"), col("x"), col("y"),
        ((col("x") / r).cast("long") + col("dx")).as("cx"),
        ((col("y") / r).cast("long") + col("dy")).as("cy"))
    val matched = probes.join(supp, Seq("cx", "cy"))
      .filter(abs(col("x") - col("sx")) <= r && abs(col("y") - col("sy")) <= r)
      .groupBy("cust_id").agg(count(lit(1)).as("n_supp"))
    val hist = matched.groupBy("n_supp").agg(count(lit(1)).as("n_customers"))
    val totals = cust.agg(count(lit(1)).as("total")).crossJoin(
      matched.agg(count(lit(1)).as("with_any")))
    val zero = totals.select(lit(0L).as("n_supp"),
        (col("total") - col("with_any")).as("n_customers"))
      .filter(col("n_customers") > 0)
    hist.unionByName(zero).orderBy("n_supp")
  }

  /** Consistent (deterministic hash) sampling: keep a document iff the
    * first two hex digits of md5(doc_id) fall below "20" — a stable
    * 1/8 sample that any independent system (here: DuckDB) reproduces
    * bit-for-bit from the key alone, no RNG state, no coordination.
    * This is how a 100 TB corpus gets a consistent eval holdout across
    * reprocessing runs: membership is a pure function of the key, so
    * re-partitioning, re-ordering, or incremental appends cannot
    * perturb it. Reported per source with an id-sum checksum so the
    * oracle certifies the exact membership, not just the rate. */
  val qConsistentSample: Q = (s, d) => {
    Tables.documents(s, d)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < "20")
      .groupBy("source")
      .agg(count(lit(1)).as("n_sampled"), sum("doc_id").as("id_checksum"))
      .orderBy("source")
  }

  /** Zipf rank–frequency fit: OLS slope/intercept of ln(freq) on
    * ln(rank) over the top-1000 token frequencies — the corpus-health
    * statistic that flags template/boilerplate floods (slope drifting
    * far from ≈ −1) before any manual inspection. Counting is one
    * token-keyed agg; the regression runs on the 1000-row top-k.
    *
    * r11 float-discipline conversion: `regr_slope`/`regr_intercept`
    * accumulate raw libm doubles in engine-specific partial-agg order —
    * the one unbounded-frame order-dependent moment readout left in the
    * repo (flip risk ~1e-5 per round at the 6dp grid). Now each ln is
    * quantized per row to integer micro (divergence between the two
    * engines' ln is ~1 ulp ≈ 1e-9 of the µ-grid → ~4e-9 flip risk per
    * value), moments are EXACT DECIMAL sums (order-free), and the
    * readout is a fixed-order double expression on the 1-row moment
    * frame — bit-portable like every other moment readout. */
  val qZipfFit: Q = (s, d) => {
    val freqs = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(1000)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("token"))))
      .select(
        expr("CAST(round(ln(rank) * 1000000) AS BIGINT)").as("lx"),
        expr("CAST(round(ln(freq) * 1000000) AS BIGINT)").as("ly"))
    // Split-conversion for the >2^53 moments (r12, ADVICE): sxx/sxy reach
    // ~5e16 µ² and the combined n·sxy − sx·sy ~1e19-1e20 — Spark's
    // DECIMAL(38,0)→DOUBLE is single-rounded but DuckDB's HUGEINT→DOUBLE
    // double-rounds via upper·2⁶⁴ + lower, a 1-ulp cross-engine split that
    // a round-half 6dp boundary would surface as a hash mismatch at some
    // SF. hi·1e9 + lo with hi, lo < 2^53 is the same exactly-representable
    // inputs and correctly-rounded op sequence on both engines →
    // bit-identical by construction (Analytics36's toD; div == // here
    // because lx, ly ≥ 0 make every moment non-negative). sx/sy stay
    // single-cast: ≤ ~2e10 < 2^53, the cast is exact on both engines.
    val toD = (c: String) =>
      s"(CAST($c div 1000000000 AS DOUBLE) * 1.0E9 + CAST($c % 1000000000 AS DOUBLE))"
    val cnum = s"(n * ${toD("sxy")} - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    val cden = s"(n * ${toD("sxx")} - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    freqs.agg(
      count(lit(1)).as("n"),
      sum(expr("CAST(lx AS DECIMAL(38,0))")).as("sx"),
      sum(expr("CAST(ly AS DECIMAL(38,0))")).as("sy"),
      sum(expr("CAST(lx AS DECIMAL(38,0)) * ly")).as("sxy"),
      sum(expr("CAST(lx AS DECIMAL(38,0)) * lx")).as("sxx"))
      .select(col("n").as("n_tokens"),
        expr(s"round($cnum / $cden, 6)").as("zipf_slope"),
        expr(s"""round((CAST(sy AS DOUBLE) / 1000000
                - ($cnum / $cden)
                  * (CAST(sx AS DOUBLE) / 1000000)) / n, 6)""").as("zipf_intercept"))
  }

  /** Watermarked stream-stream interval join ON the oracle surface:
    * errors within 10 minutes after a click by the same user, run
    * through the real streaming engine (readStream → symmetric join
    * state → AvailableNow) and certified row-for-row by the batch SQL
    * oracle. Both sides carry watermarks and the condition bounds event
    * time on both ends, so join state evicts as the watermark advances —
    * bounded memory at any scale — and the inner join provably emits
    * exactly the batch result (eviction only discards rows past any
    * possible match window). */
  val qStreamJoin: Q = (s, d) => {
    import graft.streaming.Streaming
    val joined = Streaming.clickErrorJoin(Streaming.readEvents(s, d))
    val name = s"graft_stream_join_${run.incrementAndGet()}"
    Streaming.runAvailableNow(s, joined, name,
        org.apache.spark.sql.streaming.OutputMode.Append(),
        // 4 join stores × partitions committed per micro-batch: state
        // width sized to this stream's throughput, not the batch default
        statePartitions = Some(8))
      .select(col("user_id"), col("click_id"), col("err_id"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        date_format(col("err_ts"), "yyyy-MM-dd HH:mm:ss").as("err_ts"))
      .orderBy("user_id", "click_id", "err_id")
  }

  /** Functional-dependency discovery over orders ∪ lineitem columns:
    * for each candidate determinant→dependent pair, the number of
    * determinant values and how many of them map to >1 dependent value
    * (violations). An FD that "almost holds" (tiny violation rate) is a
    * normalization or data-quality lead; one that holds exactly can be
    * exploited by the optimizer (drop a group-by column). Each pair is
    * one distinct-agg over the two columns — the per-pair cost is a
    * shuffle of the PAIR's distinct values, never the full table
    * twice — and pairs union into one report. */
  val qFdDiscovery: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    // dep coalesced to a sentinel so a NULL dependent counts as ONE
    // distinct value in both engines (Spark's distinct keeps the null
    // row; DuckDB's count(DISTINCT dep) would drop it — divergent on
    // any nullable candidate column)
    def fd(df: DataFrame, det: String, dep: String): DataFrame = df
      .select(col(det).as("det"),
        coalesce(col(dep).cast("string"), lit(" null")).as("dep"))
      .distinct()
      .groupBy("det").agg(count(lit(1)).as("n_dep"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("n_dep") > 1, 1L).otherwise(0L)).as("n_violating"))
      .select(lit(s"$det->$dep").as("fd"), col("n_keys"), col("n_violating"))
    fd(o, "o_orderkey", "o_custkey")
      .unionByName(fd(o, "o_custkey", "o_orderstatus"))
      .unionByName(fd(l, "l_orderkey", "l_returnflag"))
      .unionByName(fd(l, "l_partkey", "l_suppkey"))
      .unionByName(fd(l, "l_returnflag", "l_linestatus"))
      .orderBy("fd")
  }

  val all: Map[String, Q] = Map(
    "q_grid_radius_join" -> qGridRadiusJoin,
    "q_consistent_sample" -> qConsistentSample,
    "q_zipf_fit" -> qZipfFit,
    "q_stream_join" -> qStreamJoin,
    "q_fd_discovery" -> qFdDiscovery,
  )

  val oracles: Map[String, String] = Map(
    "q_grid_radius_join" ->
      """WITH cust AS (
        | SELECT c_custkey AS cust_id,
        |  ((c_custkey % 10000) * 2654435761) % 10000 AS x,
        |  ((c_custkey % 10000) * 40503) % 10000 AS y
        | FROM customer),
        |supp AS (
        | SELECT s_suppkey AS supp_id,
        |  ((s_suppkey % 10000) * 2654435761) % 10000 AS sx,
        |  ((s_suppkey % 10000) * 40503) % 10000 AS sy
        | FROM supplier),
        |matched AS (
        | SELECT cust_id, count(*) AS n_supp
        | FROM cust JOIN supp
        |   ON abs(x - sx) <= 250 AND abs(y - sy) <= 250
        | GROUP BY cust_id),
        |hist AS (
        | SELECT n_supp, count(*) AS n_customers FROM matched GROUP BY n_supp),
        |zero AS (
        | SELECT 0 AS n_supp,
        |  (SELECT count(*) FROM cust) - (SELECT count(*) FROM matched) AS n_customers)
        |SELECT CAST(n_supp AS BIGINT) AS n_supp,
        | CAST(n_customers AS BIGINT) AS n_customers
        |FROM (SELECT * FROM hist UNION ALL SELECT * FROM zero WHERE n_customers > 0)
        |ORDER BY n_supp""".stripMargin,
    "q_consistent_sample" ->
      """SELECT source, count(*) AS n_sampled,
        | CAST(sum(doc_id) AS BIGINT) AS id_checksum
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '20'
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    "q_zipf_fit" -> {
      // same split-conversion as the Spark side (// == div on these
      // non-negative moments): identical exact inputs + identical
      // correctly-rounded op sequence → bit-identical doubles
      val toD = (c: String) =>
        s"(CAST($c // 1000000000 AS DOUBLE) * 1.0E9 + CAST($c % 1000000000 AS DOUBLE))"
      val cnum = s"(n * ${toD("sxy")} - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
      val cden = s"(n * ${toD("sxx")} - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
      s"""WITH freqs AS (
        | SELECT token, count(*) AS freq
        | FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
        |       FROM documents)
        | GROUP BY token
        | ORDER BY freq DESC, token
        | LIMIT 1000),
        |ranked AS (
        | SELECT freq, row_number() OVER (ORDER BY freq DESC, token) AS rank
        | FROM freqs),
        |q AS (
        | SELECT CAST(round(ln(rank) * 1000000) AS BIGINT) AS lx,
        |  CAST(round(ln(freq) * 1000000) AS BIGINT) AS ly
        | FROM ranked),
        |m AS (
        | SELECT count(*) AS n,
        |  CAST(sum(lx) AS HUGEINT) AS sx, CAST(sum(ly) AS HUGEINT) AS sy,
        |  CAST(sum(CAST(lx AS HUGEINT) * ly) AS HUGEINT) AS sxy,
        |  CAST(sum(CAST(lx AS HUGEINT) * lx) AS HUGEINT) AS sxx
        | FROM q)
        |SELECT CAST(n AS BIGINT) AS n_tokens,
        | round($cnum / $cden, 6) AS zipf_slope,
        | round((CAST(sy AS DOUBLE) / 1000000
        |  - ($cnum / $cden)
        |    * (CAST(sx AS DOUBLE) / 1000000)) / n, 6) AS zipf_intercept
        |FROM m""".stripMargin
    },
    "q_stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, e.event_id AS err_id,
        | strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        | strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS err_ts
        |FROM events c JOIN events e
        |  ON c.user_id = e.user_id
        | AND c.event_type = 'click' AND e.event_type = 'error'
        | AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 10 MINUTE
        |ORDER BY c.user_id, click_id, err_id""".stripMargin,
    "q_fd_discovery" ->
      """WITH pairs AS (
        | SELECT 'o_orderkey->o_custkey' AS fd, o_orderkey::VARCHAR AS det, o_custkey::VARCHAR AS dep FROM orders
        | UNION ALL
        | SELECT 'o_custkey->o_orderstatus', o_custkey::VARCHAR, o_orderstatus FROM orders
        | UNION ALL
        | SELECT 'l_orderkey->l_returnflag', l_orderkey::VARCHAR, l_returnflag FROM lineitem
        | UNION ALL
        | SELECT 'l_partkey->l_suppkey', l_partkey::VARCHAR, l_suppkey::VARCHAR FROM lineitem
        | UNION ALL
        | SELECT 'l_returnflag->l_linestatus', l_returnflag, l_linestatus FROM lineitem),
        |per_det AS (
        | SELECT fd, det, count(DISTINCT coalesce(dep, ' null')) AS n_dep
        | FROM pairs GROUP BY fd, det)
        |SELECT fd, count(*) AS n_keys,
        | CAST(sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
        |FROM per_det GROUP BY fd
        |ORDER BY fd""".stripMargin,
  )
}
