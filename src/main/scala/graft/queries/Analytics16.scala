package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** r8 tail batch 3 — drift/association/sampling completion: true PSI
  * (the ln-weighted drift index q_hist_drift deliberately avoided),
  * the bitwise-aggregate surface, a single-pass Pearson correlation
  * matrix, and deterministic weighted sampling by priority order.
  *
  * Portability discipline: integer counts everywhere; ln/division
  * doubles are computed from identical integers in identical op order
  * (1-ulp libm skew vanishes under the 6dp grid-round-before-sum
  * pattern, same contract as q_dp_release); the sampling order is a
  * single IEEE division of exact integers — byte-identical ranks. */
object Analytics16 {
  type Q = (SparkSession, String) => DataFrame

  /** Population Stability Index between the purchase and view value
    * distributions: 10 fixed-width 50-unit bins over integer cents,
    * +1 Laplace smoothing (PSI's ln explodes on empty bins — the
    * production guard, and it keeps every probability a ratio of
    * exact integers), per-bin terms (pₐ−p_b)·ln(pₐ/p_b) rounded to
    * the 6dp grid BEFORE the total sum. Output: one row per bin plus
    * a bin = −1 total row.
    *
    * 100 TB shape: ONE partial-aggregable (side, bin) count shuffle;
    * everything after runs on the 20-row frame. */
  val qPsi: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_type"),
        least(floor(expr("CAST(round(value * 100) AS BIGINT)") / 5000L), lit(9L))
          .cast("long").as("bin"))
    val cells = ev.groupBy("bin").agg(
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c_a"),
      sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("c_b"))
    val tot = cells.agg(sum("c_a").as("n_a"), sum("c_b").as("n_b"))
    val pa = (col("c_a") + 1).cast("double") / (col("n_a") + 10).cast("double")
    val pb = (col("c_b") + 1).cast("double") / (col("n_b") + 10).cast("double")
    val terms = cells.crossJoin(broadcast(tot))
      .select(col("bin"), col("c_a"), col("c_b"),
        round((pa - pb) * log(pa / pb), 6).as("psi_term"))
    val total = terms.crossJoin(broadcast(tot))
      .groupBy(col("n_a"), col("n_b"))
      .agg(round(sum("psi_term"), 6).as("psi_term"))
      .select(lit(-1L).as("bin"), col("n_a").as("c_a"),
        col("n_b").as("c_b"), col("psi_term"))
    terms.unionByName(total).orderBy("bin")
  }

  /** Bitwise-aggregate surface: each event type carries a flag bit;
    * per (user, day), `bit_or` folds the session's engagement MASK
    * (which behaviors that user showed that day — lifetime masks
    * saturate to all-bits on any active user), then the mask census
    * counts user-days per exact behavior combination with `bit_count`
    * breadth — the engagement segmentation a funnel report reads. All
    * integer bit arithmetic, exact in any engine.
    *
    * 100 TB shape: two partial-aggregable shuffles (user-day fold,
    * mask census) — bit_or/bit_count are combiner-friendly. */
  val qBitflags: Q = (s, d) => {
    val mask = when(col("event_type") === "view", 1L)
      .when(col("event_type") === "click", 2L)
      .when(col("event_type") === "purchase", 4L)
      .when(col("event_type") === "signup", 8L)
      .otherwise(16L)
    Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), mask.as("m"))
      .groupBy("user_id", "day")
      .agg(bit_or(col("m")).as("mask"), count(lit(1)).as("n_ev"))
      .groupBy("mask")
      .agg(count(lit(1)).as("n_user_days"), sum("n_ev").as("n_events"))
      .select(col("mask"), bit_count(col("mask")).cast("long").as("breadth"),
        col("n_user_days"), col("n_events"))
      .orderBy("mask")
  }

  /** Single-pass Pearson correlation matrix over the four lineitem
    * measures (quantity, price cents, discount bp, tax bp): all 14
    * moments (4 sums, 4 squares, 6 cross products) accumulate as
    * DECIMAL(38,0)/HUGEINT in ONE partial-aggregable pass — the
    * d²-moment pattern q_pca_project uses, here on the SQL surface —
    * then each pair's r comes from the same fixed-order formula as
    * q_spearman. One fact scan for the whole matrix; a naive per-pair
    * corr() would scan 6×. */
  val qCorrMatrix: Q = (s, d) => {
    val vars = Seq(
      "q" -> expr("CAST(l_quantity AS BIGINT)"),
      "p" -> expr("CAST(round(l_extendedprice * 100) AS BIGINT)"),
      "disc" -> expr("CAST(round(l_discount * 10000) AS BIGINT)"),
      "tax" -> expr("CAST(round(l_tax * 10000) AS BIGINT)"))
    // fan out the projected scan (r16, guide §2.5 — the q_partial_corr
    // fix): the 14-moment DECIMAL(38,0) pass otherwise runs fused onto
    // the lineitem scan's few row-group splits (measured: one 1.9 s
    // 3-task job = 70% of the query on a 32-core box). The exchange
    // carries the four RAW source columns — the round/scale/decimal
    // casts run POST-exchange on all cores (casting before the fan-out
    // left a 1.4 s 3-task map stage: the wide decimal rows also made
    // the exchange itself heavier). Self-disables at scale.
    val base = graft.operators.Scale.fanOutScan(Tables.lineitem(s, d)
        .select("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .select(vars.map { case (n, e) => e.cast("decimal(38,0)").as(n) }: _*)
    val pairs = for {
      (i, _) <- vars.zipWithIndex.collect { case ((n, _), i) => (n, i) }
      (j, _) <- vars.zipWithIndex.collect { case ((n, _), k) => (n, k) }
      if vars.indexWhere(_._1 == i) < vars.indexWhere(_._1 == j)
    } yield (i, j)
    val moments =
      Seq(count(lit(1)).as("n")) ++
        vars.map { case (n, _) => sum(col(n)).as(s"s_$n") } ++
        vars.map { case (n, _) => sum(col(n) * col(n)).as(s"ss_$n") } ++
        pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"sp_${a}_$b") }
    val agg = base.agg(moments.head, moments.tail: _*)
    def dd(c: String): Column = col(c).cast("double")
    val n = dd("n")
    val rCols = pairs.map { case (a, b) =>
      round((n * dd(s"sp_${a}_$b") - dd(s"s_$a") * dd(s"s_$b"))
        / (sqrt(n * dd(s"ss_$a") - dd(s"s_$a") * dd(s"s_$a"))
          * sqrt(n * dd(s"ss_$b") - dd(s"s_$b") * dd(s"s_$b"))), 6)
        .as(s"r_${a}_$b")
    }
    val wide = agg.select(col("n").as("n_rows") +: rCols: _*)
    val stacked = pairs.map { case (a, b) => s"'${a}_$b', r_${a}_$b" }
      .mkString(", ")
    wide.select(col("n_rows"),
        expr(s"stack(${pairs.size}, $stacked) AS (pair, r)"))
      .orderBy("pair")
  }

  /** Deterministic weighted sample (Duffield/Thorup/Lund priority
    * sampling): priority = w / u with u a seeded md5-uniform — the
    * top-k priorities ARE a weighted sample without replacement, and
    * every re-run reproduces it (an epoch-stable corpus subsample, the
    * property a training-data pipeline needs for auditability).
    * u is the exact dyadic rational (h+1)/2³², so the priority is ONE
    * IEEE division of exact integers — byte-identical rank order in
    * any engine, no pow()/ln() in the sort key (the A-ES u^(1/w) key
    * would put 1-ulp libm skew INTO the ordering).
    *
    * 100 TB shape: scan-side codegen'd arithmetic + TakeOrderedAndProject
    * (per-partition top-k, never a global sort). */
  val qWeightedSample: Q = (s, d) => {
    val h = conv(substring(md5(concat(lit("ws-seed-1"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        ((col("n_chars").cast("double") * 4294967296.0)
          / (h + 1).cast("double")).as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), col("n_chars"),
        round(col("priority"), 4).as("priority"))
  }

  val all: Map[String, Q] = Map(
    "q_psi" -> qPsi,
    "q_bitflags" -> qBitflags,
    "q_corr_matrix" -> qCorrMatrix,
    "q_weighted_sample" -> qWeightedSample,
  )

  private val corrPairSql: String = {
    val vars = Seq("q", "p", "disc", "tax")
    (for {
      i <- vars.indices; j <- vars.indices if i < j
    } yield {
      val (a, b) = (vars(i), vars(j))
      s"""SELECT n_rows, '${a}_$b' AS pair,
         | round((n * sp_${a}_$b - s_$a * s_$b)
         |   / (sqrt(n * ss_$a - s_$a * s_$a) * sqrt(n * ss_$b - s_$b * s_$b)),
         |  6) AS r FROM m""".stripMargin
    }).mkString("\nUNION ALL\n")
  }

  val oracles: Map[String, String] = Map(
    "q_psi" ->
      """WITH ev AS (
        | SELECT event_type,
        |  least(CAST(round(value * 100) AS BIGINT) // 5000, 9) AS bin
        | FROM events WHERE event_type IN ('purchase', 'view')),
        |cells AS (
        | SELECT bin,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c_b
        | FROM ev GROUP BY bin),
        |tot AS (SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
        |        CAST(sum(c_b) AS BIGINT) AS n_b FROM cells),
        |terms AS (
        | SELECT bin, c_a, c_b,
        |  round((CAST(c_a + 1 AS DOUBLE) / CAST(n_a + 10 AS DOUBLE)
        |      - CAST(c_b + 1 AS DOUBLE) / CAST(n_b + 10 AS DOUBLE))
        |    * ln((CAST(c_a + 1 AS DOUBLE) / CAST(n_a + 10 AS DOUBLE))
        |       / (CAST(c_b + 1 AS DOUBLE) / CAST(n_b + 10 AS DOUBLE))), 6)
        |    AS psi_term
        | FROM cells CROSS JOIN tot)
        |SELECT bin, c_a, c_b, psi_term FROM terms
        |UNION ALL
        |SELECT -1, n_a, n_b, round((SELECT sum(psi_term) FROM terms), 6)
        |FROM tot
        |ORDER BY bin""".stripMargin,
    "q_bitflags" ->
      """WITH m AS (
        | SELECT user_id, CAST(ts AS DATE) AS day,
        |  CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |   WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8 ELSE 16 END AS m
        | FROM events),
        |u AS (
        | SELECT user_id, day, bit_or(m) AS mask, count(*) AS n_ev
        | FROM m GROUP BY user_id, day)
        |SELECT mask, CAST(bit_count(mask) AS BIGINT) AS breadth,
        | count(*) AS n_user_days, CAST(sum(n_ev) AS BIGINT) AS n_events
        |FROM u GROUP BY mask ORDER BY mask""".stripMargin,
    "q_corr_matrix" ->
      s"""WITH v AS (
         | SELECT CAST(l_quantity AS BIGINT) AS q,
         |  CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
         |  CAST(round(l_discount * 10000) AS BIGINT) AS disc,
         |  CAST(round(l_tax * 10000) AS BIGINT) AS tax
         | FROM lineitem),
         |m AS (
         | SELECT count(*) AS n_rows, CAST(count(*) AS DOUBLE) AS n,
         |  CAST(sum(q) AS DOUBLE) AS s_q, CAST(sum(p) AS DOUBLE) AS s_p,
         |  CAST(sum(disc) AS DOUBLE) AS s_disc, CAST(sum(tax) AS DOUBLE) AS s_tax,
         |  CAST(sum(q * q) AS DOUBLE) AS ss_q, CAST(sum(p * p) AS DOUBLE) AS ss_p,
         |  CAST(sum(disc * disc) AS DOUBLE) AS ss_disc,
         |  CAST(sum(tax * tax) AS DOUBLE) AS ss_tax,
         |  CAST(sum(q * p) AS DOUBLE) AS sp_q_p,
         |  CAST(sum(q * disc) AS DOUBLE) AS sp_q_disc,
         |  CAST(sum(q * tax) AS DOUBLE) AS sp_q_tax,
         |  CAST(sum(p * disc) AS DOUBLE) AS sp_p_disc,
         |  CAST(sum(p * tax) AS DOUBLE) AS sp_p_tax,
         |  CAST(sum(disc * tax) AS DOUBLE) AS sp_disc_tax
         | FROM v)
         |$corrPairSql
         |ORDER BY pair""".stripMargin,
    "q_weighted_sample" ->
      """SELECT doc_id, n_chars,
        | round((CAST(n_chars AS DOUBLE) * 4294967296.0)
        |   / CAST(CAST('0x' || substr(md5('ws-seed-1' || CAST(doc_id AS VARCHAR)), 1, 8)
        |       AS BIGINT) + 1 AS DOUBLE), 4) AS priority
        |FROM documents
        |ORDER BY (CAST(n_chars AS DOUBLE) * 4294967296.0)
        |   / CAST(CAST('0x' || substr(md5('ws-seed-1' || CAST(doc_id AS VARCHAR)), 1, 8)
        |       AS BIGINT) + 1 AS DOUBLE) DESC, doc_id
        |LIMIT 20""".stripMargin,
  )
}
