package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** r7t batch — event-stream governance operators: semi-structured
  * payload profiling (the schema-inference report run before hardening
  * a JSON contract), deterministic pseudonymization with a collision
  * audit (the GDPR-adjacent id-scrubbing step), and per-transition
  * dwell-time statistics (the latency complement to the Markov
  * transition-count matrix).
  */
object Events2 {
  type Q = (SparkSession, String) => DataFrame

  /** JSON payload profile: per (event type, key) — presence count and,
    * for numeric values, exact integer min/max/sum. The report that
    * decides whether `props` can be promoted to a typed column
    * (`from_json` with a fixed schema) or needs PERMISSIVE handling.
    * Keys enumerated with `json_object_keys` (no schema assumption),
    * values extracted per key.
    *
    * 100 TB shape: one explode of the (small) per-row key list + a
    * map-side-combined agg on (type, key) — |types|×|keys| output. */
  val qJsonProfile: Q = (s, d) => {
    Tables.events(s, d)
      .select(col("event_type"), col("props"),
        explode(expr("json_object_keys(props)")).as("key"))
      .withColumn("val_str", expr("get_json_object(props, concat('$.', key))"))
      .withColumn("val_num", col("val_str").cast("long"))
      .groupBy("event_type", "key")
      .agg(count(lit(1)).as("n_present"),
        sum(when(col("val_num").isNotNull, 1L).otherwise(0L)).as("n_numeric"),
        min("val_num").as("min_v"), max("val_num").as("max_v"),
        sum("val_num").as("sum_v"))
      .orderBy("event_type", "key")
  }

  /** Deterministic pseudonymization audit: user ids mapped through a
    * fixed multiplicative hash (overflow-safe on this id domain —
    * `id·2654435761 mod 1000000007`: ids ≤ 10⁶ keep the product inside
    * BIGINT, identical arithmetic in any engine), with the collision
    * report a privacy pipeline must publish before shipping the
    * pseudonymized table: ids in, distinct pseudonyms out, collided
    * pseudonym count, and the max collision multiplicity.
    *
    * The hash — not a random mapping — is what makes the scrub
    * REPEATABLE across tables and batches (the same user pseudonymizes
    * identically everywhere, joins still work). A production run keys
    * the multiplier from a secret; the audit shape is unchanged.
    *
    * 100 TB shape: two nested aggs (ids → pseudonyms → report), both
    * map-side combined. */
  val qPseudonymize: Q = (s, d) => {
    val mapped = Tables.events(s, d)
      .select(col("user_id")).distinct()
      .withColumn("pseudo", pmod(col("user_id") * 2654435761L, lit(1000000007L)))
    val perPseudo = mapped.groupBy("pseudo").agg(count(lit(1)).as("n_ids"))
    perPseudo.agg(
      sum("n_ids").as("n_users"),
      count(lit(1)).as("n_pseudonyms"),
      sum(when(col("n_ids") > 1, 1L).otherwise(0L)).as("n_collided"),
      max("n_ids").as("max_multiplicity"))
  }

  /** Per-transition dwell time: for each (from_type → to_type) pair of
    * CONSECUTIVE events of one user, exact microsecond gap statistics —
    * count, min, max, mean (one integer division, rounded) — the
    * latency matrix next to q_markov_transitions' count matrix (how
    * LONG users sit between steps, not just where they go).
    *
    * 100 TB shape: one user-partitioned, ts-ordered window (the
    * sessionize shape — user partitions bound the sort), then a
    * |types|² agg. */
  val qDwellStats: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .withColumn("gap_us", unix_micros(col("ts")) -
        lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"),
        min("gap_us").as("min_us"), max("gap_us").as("max_us"),
        expr("sum(gap_us) div count(1)").as("mean_us_floor"))
      .orderBy("from_type", "to_type")
  }

  val all: Map[String, Q] = Map(
    "q_json_profile" -> qJsonProfile,
    "q_pseudonymize" -> qPseudonymize,
    "q_dwell_stats" -> qDwellStats,
  )

  val oracles: Map[String, String] = Map(
    "q_json_profile" ->
      """WITH kv AS (
        | SELECT event_type, props, unnest(json_keys(props)) AS key
        | FROM events),
        |vals AS (
        | SELECT event_type, key,
        |   json_extract_string(props, '$.' || key) AS val_str,
        |   TRY_CAST(json_extract_string(props, '$.' || key) AS BIGINT) AS val_num
        | FROM kv)
        |SELECT event_type, key, count(*) AS n_present,
        | CAST(sum(CASE WHEN val_num IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric,
        | min(val_num) AS min_v, max(val_num) AS max_v,
        | CAST(sum(val_num) AS BIGINT) AS sum_v
        |FROM vals
        |GROUP BY event_type, key
        |ORDER BY event_type, key""".stripMargin,
    "q_pseudonymize" ->
      """WITH mapped AS (
        | SELECT DISTINCT user_id,
        |   ((user_id * 2654435761) % 1000000007 + 1000000007) % 1000000007 AS pseudo
        | FROM events),
        |per_pseudo AS (
        | SELECT pseudo, count(*) AS n_ids FROM mapped GROUP BY pseudo)
        |SELECT CAST(sum(n_ids) AS BIGINT) AS n_users,
        | count(*) AS n_pseudonyms,
        | CAST(sum(CASE WHEN n_ids > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_collided,
        | CAST(max(n_ids) AS BIGINT) AS max_multiplicity
        |FROM per_pseudo""".stripMargin,
    "q_dwell_stats" ->
      """WITH seq AS (
        | SELECT user_id, event_type, epoch_us(ts) AS us,
        |   lag(event_type) OVER w AS prev_type,
        |   epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT prev_type AS from_type, event_type AS to_type,
        | count(*) AS n, min(gap_us) AS min_us, max(gap_us) AS max_us,
        | CAST(sum(gap_us) // count(*) AS BIGINT) AS mean_us_floor
        |FROM seq WHERE prev_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY from_type, to_type""".stripMargin,
  )
}
