package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** r8 tail batch 5 — semi-structured and reshaping surface: nested
  * array-of-structs JSON flattening (the event-payload shape
  * q_from_json's flat schema can't express) and the multi-aggregate
  * pivot. Planted payloads are integer-valued so every output is
  * exact.
  */
object Analytics18 {
  type Q = (SparkSession, String) => DataFrame

  private val itemsSchema = ArrayType(StructType(Seq(
    StructField("k", LongType), StructField("v", LongType))))

  /** Nested-JSON flatten: each event carries a JSON ARRAY of
    * {k, v} line items (planted deterministically — the testdata's
    * props column is flat); parse with an explicit array<struct>
    * schema, explode, and aggregate per item key. This is the
    * order-lines/shopping-cart payload shape — one row in, many
    * typed rows out — that a flat get_json_object path cannot reach.
    *
    * 100 TB shape: parse + explode are per-row scan work (2× row
    * expansion, codegen'd Generate); the only exchange is the
    * partial-agg'd key reduce. */
  val qJsonFlatten: Q = (s, d) => {
    val planted = Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("j", concat(
        lit("""[{"k":"""), col("user_id") % 5,
        lit(""","v":"""), col("cents"),
        lit("""},{"k":"""), (col("user_id") + 1) % 5,
        lit(""","v":"""), col("cents") * 2, lit("}]")))
    planted
      .select(col("event_id"), explode(from_json(col("j"), itemsSchema)).as("item"))
      .select(col("item.k").as("k"), col("item.v").as("v"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_items"), sum("v").as("total_v"),
        max("v").as("max_v"))
      .orderBy("k")
  }

  /** Multi-aggregate pivot: order count AND revenue cents per
    * (priority × status) cell, statuses pivoted wide with explicit
    * values — the explicit list keeps the pivot a one-pass
    * conditional aggregation (an unlisted pivot needs a distinct-scan
    * first) and pins the output schema for the oracle. All integer.
    *
    * 100 TB shape: ONE partial-aggregable shuffle on the groupBy key;
    * each pivot cell is a conditional partial agg — never a
    * per-status scan. */
  val qPivotMulti: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderpriority").as("priority"), col("o_orderstatus"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy("priority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
      .orderBy("priority")

  val all: Map[String, Q] = Map(
    "q_json_flatten" -> qJsonFlatten,
    "q_pivot_multi" -> qPivotMulti,
  )

  val oracles: Map[String, String] = Map(
    "q_json_flatten" ->
      """WITH planted AS (
        | SELECT event_id,
        |  '[{"k":' || (user_id % 5) || ',"v":' || CAST(round(value * 100) AS BIGINT)
        |  || '},{"k":' || ((user_id + 1) % 5) || ',"v":'
        |  || (CAST(round(value * 100) AS BIGINT) * 2) || '}]' AS j
        | FROM events),
        |flat AS (
        | SELECT u.item.k AS k, u.item.v AS v
        | FROM planted t,
        |  LATERAL (SELECT unnest(json_transform(t.j,
        |    '[{"k":"BIGINT","v":"BIGINT"}]')) AS item) u)
        |SELECT k, count(*) AS n_items, CAST(sum(v) AS BIGINT) AS total_v,
        | max(v) AS max_v
        |FROM flat GROUP BY k ORDER BY k""".stripMargin,
    "q_pivot_multi" ->
      """SELECT o_orderpriority AS priority,
        | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F_n,
        | CAST(sum(CASE WHEN o_orderstatus = 'F'
        |   THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS F_cents,
        | CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O_n,
        | CAST(sum(CASE WHEN o_orderstatus = 'O'
        |   THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS O_cents,
        | CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P_n,
        | CAST(sum(CASE WHEN o_orderstatus = 'P'
        |   THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS P_cents
        |FROM orders GROUP BY o_orderpriority ORDER BY priority""".stripMargin,
  )
}
