package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** r7v batch — the Spark 4 SQL-surface features a migrating user
  * expects to keep working: SQL-defined scalar functions (`CREATE
  * FUNCTION ... RETURN`), the VARIANT semi-structured type
  * (`parse_json`/`variant_get`), and case-insensitive collations
  * (`collate(..., 'UTF8_LCASE')`). Each is oracle-paired with an
  * equivalent classical formulation, certifying the new surface against
  * the old semantics.
  */
object Relational8 {
  type Q = (SparkSession, String) => DataFrame

  /** SQL-defined scalar UDF: the discounted-revenue unit expression
    * declared ONCE as a catalog function and reused — the
    * maintainability surface for the exact-money convention used across
    * this library. Catalyst inlines the body (it is a pure SQL
    * expression), so codegen and pushdown are identical to writing the
    * arithmetic inline — the oracle does exactly that. */
  val qSqlUdf: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION revenue_u(p DOUBLE, disc DOUBLE)
        |RETURNS BIGINT
        |RETURN CAST(round(p * 100) AS BIGINT) *
        |       (100 - CAST(round(disc * 100) AS BIGINT))""".stripMargin)
    s.sql(
      """SELECT l_returnflag, sum(revenue_u(l_extendedprice, l_discount)) AS rev_u,
        |  count(*) AS n
        |FROM v_lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  }

  /** VARIANT ingestion of the semi-structured payload: parse_json once
    * into a variant column, typed extraction with variant_get — the
    * schema-on-read path that replaces per-access string re-parsing
    * (get_json_object) with a parsed binary encoding; at 100 TB the
    * parse happens once per row instead of once per extraction. The
    * oracle replays the same report over DuckDB's JSON reader. */
  val qVariantExtract: Q = (s, d) => {
    Tables.events(s, d).createOrReplaceTempView("v_events")
    s.sql(
      """WITH v AS (
        |  SELECT event_type, parse_json(props) AS pv FROM v_events)
        |SELECT event_type,
        |  count(*) AS n,
        |  sum(variant_get(pv, '$.k', 'long')) AS sum_k,
        |  min(variant_get(pv, '$.k', 'long')) AS min_k,
        |  max(variant_get(pv, '$.k', 'long')) AS max_k
        |FROM v
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)
  }

  /** Case-insensitive grouping via collation: deterministic case
    * variants are PLANTED on part names (upper/initcap/lower by key mod
    * 3 — the crawl-normalization situation), then grouped under
    * UTF8_LCASE so all spellings of a name fold together. Output key is
    * lower()-normalized (the group's representative value is
    * unspecified under a case-folding collation). The oracle groups the
    * ORIGINAL all-lowercase names directly — the planted case variants
    * must vanish under the collation for every count to line up, which
    * is exactly the property under test. */
  val qCollatedGroup: Q = (s, d) => {
    Tables.part(s, d).createOrReplaceTempView("v_part")
    s.sql(
      """WITH planted AS (
        |  SELECT CASE WHEN p_partkey % 3 = 0 THEN upper(p_name)
        |              WHEN p_partkey % 3 = 1 THEN initcap(p_name)
        |              ELSE p_name END AS name,
        |         p_retailprice
        |  FROM v_part)
        |SELECT lower(CAST(collate(name, 'UTF8_LCASE') AS STRING)) AS name_ci,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS price_c
        |FROM planted
        |GROUP BY collate(name, 'UTF8_LCASE')
        |ORDER BY name_ci""".stripMargin)
  }

  val all: Map[String, Q] = Map(
    "q_sql_udf" -> qSqlUdf,
    "q_variant_extract" -> qVariantExtract,
    "q_collated_group" -> qCollatedGroup,
  )

  val oracles: Map[String, String] = Map(
    "q_sql_udf" ->
      """SELECT l_returnflag,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |     (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_u,
        | count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_variant_extract" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        | CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q_collated_group" ->
      """SELECT p_name AS name_ci, count(*) AS n,
        | CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS price_c
        |FROM part
        |GROUP BY p_name
        |ORDER BY name_ci""".stripMargin,
  )
}
