package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** r7w batch — format-function breadth and failure-mode arithmetic:
  * `from_xml` and `from_csv` embedded-record parsing (the last two
  * text formats a feed-ingestion layer meets after JSON), and the
  * `try_*` arithmetic family whose NULL-on-failure contract replaces
  * job-killing exceptions at 100 TB (one malformed row must not fail a
  * million-task stage).
  */
object Relational9 {
  type Q = (SparkSession, String) => DataFrame

  /** XML record extraction: each event's payload re-serialized as an
    * XML fragment (deterministic arithmetic on the JSON value — the
    * fixture has no native XML, so the query PLANTS it, the planting
    * replayed by the oracle), then parsed back with `from_xml` and a
    * typed schema. Certifies the parse round trip, not just the
    * planting: sums over the EXTRACTED field must match sums the
    * oracle computes from the source values. */
  val qXmlExtract: Q = (s, d) => {
    val planted = Tables.events(s, d)
      .withColumn("k", expr("CAST(get_json_object(props, '$.k') AS BIGINT)"))
      .withColumn("xml",
        concat(lit("<rec><k>"), col("k"), lit("</k><t>"),
          col("event_type"), lit("</t></rec>")))
    planted
      .withColumn("parsed", expr("from_xml(xml, 'k BIGINT, t STRING')"))
      .groupBy(col("parsed.t").as("event_type"))
      .agg(count(lit(1)).as("n"), sum("parsed.k").as("sum_k"),
        sum(when(col("parsed.k") =!= col("k"), 1L).otherwise(0L))
          .as("roundtrip_errors"))
      .orderBy("event_type")
  }

  /** CSV record extraction: the same round-trip contract through
    * `from_csv` with an explicit schema — the embedded-delimited-record
    * case (log lines carrying CSV fields inside a column). */
  val qFromCsv: Q = (s, d) => {
    val planted = Tables.orders(s, d)
      .withColumn("line",
        concat_ws(",", col("o_orderkey"), col("o_orderstatus"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)")))
    planted
      .withColumn("parsed",
        expr("from_csv(line, 'okey BIGINT, status STRING, cents BIGINT')"))
      .groupBy(col("parsed.status").as("status"))
      .agg(count(lit(1)).as("n"), sum("parsed.cents").as("total_c"),
        sum(when(col("parsed.okey") =!= col("o_orderkey"), 1L).otherwise(0L))
          .as("roundtrip_errors"))
      .orderBy("status")
  }

  /** try_* failure-mode arithmetic: planted overflow (BIGINT max + qty),
    * division by a planted zero, and a malformed cast all yield NULL
    * instead of killing the stage — the per-row error-tolerance
    * contract, reported as exact null/success counts per class. The
    * failures are PREDICATE-GATED (≈1/1000 rows via co-prime moduli on
    * the key) rather than universal: the r7 version planted overflow
    * and a bad cast on EVERY row, so all ~1.2 M try-evaluations took
    * `TryEval`'s exception throw/catch slow path (~15 µs each — an 18 s
    * aggregate over 600 k rows). Malformed data is rare by nature; with
    * rare planting the common path stays inside whole-stage codegen and
    * the query costs what it is — one scan (r8: 18.4 s → sub-second).
    * The oracle replays each planted predicate with CASE WHEN guards
    * (the classical armor try_* replaces). */
  val qTryArithmetic: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT
        |  count(*) AS n,
        |  sum(CASE WHEN try_add(
        |        CASE WHEN l_orderkey % 997 = 0
        |             THEN 9223372036854775807L ELSE 0L END,
        |        CAST(l_quantity AS BIGINT)) IS NULL THEN 1 ELSE 0 END) AS add_overflows,
        |  sum(CASE WHEN try_divide(l_extendedprice,
        |        CASE WHEN l_orderkey % 983 = 0 THEN 0L
        |             ELSE CAST(round(l_discount * 100) AS BIGINT) + 1L END) IS NULL
        |      THEN 1 ELSE 0 END) AS div_nulls,
        |  sum(CASE WHEN try_cast(
        |        CASE WHEN l_orderkey % 991 = 0 THEN l_returnflag
        |             ELSE CAST(l_orderkey AS STRING) END AS BIGINT) IS NULL
        |      THEN 1 ELSE 0 END) AS bad_casts,
        |  CAST(sum(try_multiply(CAST(round(l_extendedprice * 100) AS BIGINT),
        |        CAST(1 AS BIGINT))) AS BIGINT) AS safe_sum_c
        |FROM v_lineitem""".stripMargin)
  }

  /** Exact DECIMAL money path (r7x): the library's integer-cent
    * convention exists because doubles drift — this query certifies the
    * ALTERNATIVE a migrating user may already have: DECIMAL(20,2)
    * arithmetic end to end (construction from exact cents, sum,
    * report rendered as canonical digit strings so the compare is
    * textual-exact). Decimal ops are exact in both engines. */
  val qDecimalMoney: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("v_orders")
    s.sql(
      """SELECT o_orderstatus AS status,
        |  CAST(CAST(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(20, 2))
        |      / 100) AS DECIMAL(20, 2)) AS STRING) AS total_dec,
        |  count(*) AS n
        |FROM v_orders
        |GROUP BY o_orderstatus
        |ORDER BY status""".stripMargin)
  }

  /** Explicit null-ordering semantics (r7x): engines DISAGREE by
    * default (Spark ascends NULLS FIRST, DuckDB NULLS LAST), so any
    * cross-engine sort contract must pin the placement — this query
    * plants nulls deterministically (`nullif` on a key predicate) and
    * orders with explicit NULLS LAST on both sides, certifying that
    * the pinned form agrees. */
  val qNullOrdering: Q = (s, d) => {
    Tables.supplier(s, d).createOrReplaceTempView("v_supplier")
    s.sql(
      """SELECT s_suppkey,
        |  nullif(s_nationkey, s_suppkey % 25) AS nk_nullable
        |FROM v_supplier
        |ORDER BY nk_nullable ASC NULLS LAST, s_suppkey""".stripMargin)
  }

  val all: Map[String, Q] = Map(
    "q_xml_extract" -> qXmlExtract,
    "q_from_csv" -> qFromCsv,
    "q_try_arithmetic" -> qTryArithmetic,
    "q_decimal_money" -> qDecimalMoney,
    "q_null_ordering" -> qNullOrdering,
  )

  val oracles: Map[String, String] = Map(
    "q_decimal_money" ->
      """SELECT o_orderstatus AS status,
        | CAST(CAST(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(20, 2))
        |     / 100) AS DECIMAL(20, 2)) AS VARCHAR) AS total_dec,
        | count(*) AS n
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY status""".stripMargin,
    "q_null_ordering" ->
      """SELECT s_suppkey,
        | nullif(s_nationkey, s_suppkey % 25) AS nk_nullable
        |FROM supplier
        |ORDER BY nk_nullable ASC NULLS LAST, s_suppkey""".stripMargin,
    "q_xml_extract" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | CAST(0 AS BIGINT) AS roundtrip_errors
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q_from_csv" ->
      """SELECT o_orderstatus AS status, count(*) AS n,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c,
        | CAST(0 AS BIGINT) AS roundtrip_errors
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY status""".stripMargin,
    "q_try_arithmetic" ->
      """SELECT count(*) AS n,
        | CAST(sum(CASE WHEN l_orderkey % 997 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS add_overflows,
        | CAST(sum(CASE WHEN l_orderkey % 983 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS div_nulls,
        | CAST(sum(CASE WHEN l_orderkey % 991 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS bad_casts,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS safe_sum_c
        |FROM lineitem""".stripMargin,
  )
}
