package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.Streaming

/** r9 batch 33: an EWMA control chart (the fold carries the smoothed
  * level AND the exact (1−λ)^2t limit factor as a recursively-updated
  * product — no pow) and streaming exact dedup through the state store
  * (a doubled input stream collapses back to the batch truth).
  */
object Analytics51 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** EWMA control chart (λ=0.2, L=3) over daily revenue: the fold
    * carries (zₜ, (1−λ)^{2t}, violation count); limits use
    * σ̂·√(λ/(2−λ)·(1−(1−λ)^{2t})) with σ̂ from the moving range
    * (mR̄·1000/1128, the q_we_rules rational) — the time-varying-limit
    * chart XmR can't give. The (1−λ)^{2t} factor updates by
    * multiplication inside the fold, so there is no pow() anywhere.
    *
    * 100 TB shape: |days| fold (bounded-frame sequential exception);
    * moments and mR̄ come from one pass. */
  val qEwmaChart: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
    val arr = daily.agg(
      count(lit(1)).as("n_days"),
      expr("transform(array_sort(collect_list(struct(day, x))), e -> CAST(e.x AS DOUBLE))")
        .as("ys"))
    val mr = daily
      .withColumn("prev", lag("x", 1).over(
        org.apache.spark.sql.expressions.Window.orderBy("day")))
      .agg(expr("sum(x) div count(1)").as("xbar_c"),
        expr("sum(abs(x - prev)) div count(prev)").as("mrbar_c"))
    arr.join(broadcast(mr))
      .withColumn("fin", expr(
        """aggregate(ys,
           named_struct('z', CAST(xbar_c AS DOUBLE), 'f', CAST(1.0 AS DOUBLE),
             'viol', CAST(0 AS BIGINT)),
           (acc, y) -> named_struct(
             'z', 0.2 * y + 0.8 * acc.z,
             'f', acc.f * 0.64,
             'viol', acc.viol + CASE WHEN
               abs((0.2 * y + 0.8 * acc.z) - xbar_c) >
               3.0 * (CAST(mrbar_c AS DOUBLE) * 1000 / 1128)
                 * sqrt(0.2E0 / 1.8E0 * (1.0 - acc.f * 0.64))
               THEN 1 ELSE 0 END))"""))
      .select(col("n_days"),
        expr("CAST(round(fin.z, 6) AS DOUBLE)").as("ewma_final"),
        expr("fin.viol").as("n_violations"),
        expr("""CAST(round(3.0 * (CAST(mrbar_c AS DOUBLE) * 1000 / 1128)
                * sqrt(0.2E0 / 1.8E0), 6) AS DOUBLE)""").as("asymptotic_halfwidth_c"))
  }

  /** Streaming exact dedup through the state store: the event stream
    * UNIONED WITH ITSELF (every row twice) runs through
    * dropDuplicates("event_id") and a per-type census — the streaming
    * engine must collapse the doubled input back to the batch truth,
    * certifying dedup state bookkeeping end to end.
    *
    * 100 TB shape: dedup state is one key per event inside the
    * watermark horizon; production would use
    * dropDuplicatesWithinWatermark to bound it (documented). */
  val qStreamDedup: Q = (s, d) => {
    val ev = Streaming.readEvents(s, d)
    val doubled = ev.union(ev)
    val agg = doubled.dropDuplicates("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_c"))
    Streaming.runAvailableNow(s, agg, s"graft_stream_dedup_${System.nanoTime()}")
      .select(col("event_type"), col("n_events"), col("value_c"))
      .orderBy("event_type")
  }

  val all: Map[String, Q] = Map(
    "q_ewma_chart" -> qEwmaChart,
    "q_stream_dedup" -> qStreamDedup,
  )

  val oracles: Map[String, String] = Map(
    "q_ewma_chart" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        | FROM orders GROUP BY 1),
        |arr AS (
        | SELECT count(*) AS n_days, list(CAST(x AS DOUBLE) ORDER BY day) AS ys
        | FROM daily),
        |mr AS (
        | SELECT sum(x) // count(*) AS xbar_c,
        |   sum(abs(x - prev)) // count(prev) AS mrbar_c
        | FROM (SELECT x, lag(x) OVER (ORDER BY day) AS prev FROM daily) t),
        |rec AS (
        | WITH RECURSIVE h(t, z, f, viol) AS (
        |  SELECT 0, CAST(xbar_c AS DOUBLE), CAST(1.0 AS DOUBLE),
        |    CAST(0 AS BIGINT)
        |  FROM mr
        |  UNION ALL
        |  SELECT t2, z2, f2,
        |   viol1 + CASE WHEN abs(z2 - xbar_c) >
        |     3.0 * (CAST(mrbar_c AS DOUBLE) * 1000 / 1128)
        |       * sqrt(0.2E0 / 1.8E0 * (1.0 - f2)) THEN 1 ELSE 0 END
        |  FROM (
        |   SELECT h.t + 1 AS t2,
        |     0.2 * arr.ys[h.t + 1] + 0.8 * h.z AS z2,
        |     h.f * 0.64 AS f2, h.viol AS viol1
        |   FROM h, arr WHERE h.t < arr.n_days) s, mr)
        | SELECT * FROM h)
        |SELECT a.n_days,
        | CAST(round(r.z, 6) AS DOUBLE) AS ewma_final,
        | r.viol AS n_violations,
        | CAST(round(3.0 * (CAST(m.mrbar_c AS DOUBLE) * 1000 / 1128)
        |   * sqrt(0.2E0 / 1.8E0), 6) AS DOUBLE) AS asymptotic_halfwidth_c
        |FROM arr a CROSS JOIN mr m JOIN rec r ON r.t = a.n_days""".stripMargin,
    "q_stream_dedup" ->
      """SELECT event_type, count(*) AS n_events,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
        |FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
