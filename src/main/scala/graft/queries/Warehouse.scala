package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** r7g warehouse-layout operators — the physical-design moves that
  * decide shuffle bills at scale, surfaced as end-to-end registry
  * queries (ScaleSpec pins their plan properties; these pin their
  * results against the DuckDB oracle): a bucketed co-located join and a
  * partition-pruned sink/scan round trip.
  */
object Warehouse {
  type Q = (SparkSession, String) => DataFrame

  private val run = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Revenue rollup over a BUCKETED orders ⋈ lineitem join: both sides
    * are written `bucketBy(8, key)` ([[graft.operators.Scale
    * .bucketedPair]]) so the join consumes the on-disk bucketing instead
    * of exchanging either side — the pre-shuffle that amortizes ONE
    * layout write across every subsequent join on the key. ScaleSpec
    * proves the no-Exchange plan (broadcast disabled); this query proves
    * the full write→catalog→scan→join path end-to-end against the
    * oracle's logical replay.
    *
    * 100 TB shape: the exchange this layout removes is the fact-fact
    * shuffle — the single largest data movement in the unbucketed plan;
    * bucket count scales with cluster width, not data size. */
  val qBucketedJoin: Q = (s, d) => {
    val id = run.incrementAndGet()
    val o = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_c"))
    val (bo, bli) = graft.operators.Scale.bucketedPair(
      s, o, li, "o_orderkey", 8, s"wh_orders_b$id", s"wh_lineitem_b$id")
    bo.join(bli, Seq("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("total_qty"),
        sum("price_c").as("revenue_c"))
      .orderBy("o_orderpriority")
  }

  /** Partition-pruned sink/scan round trip: events land partitioned BY
    * EVENT TYPE (the predicate column of the downstream workload); the
    * read filters one type, so the scan's `PartitionFilters` prune to
    * that directory — file listing and IO proportional to the slice,
    * not the archive (WarehouseSpec pins the pruned plan). The report
    * is the purchase-only daily value rollup off the pruned scan.
    *
    * 100 TB shape: partition-by-predicate is the first layout decision
    * of any event archive; pruning happens at PLANNING time, before a
    * single executor task launches. */
  val qPartitionedSink: Q = (s, d) => {
    val dir = java.nio.file.Files.createTempDirectory("graft_psink").toString +
      s"/run_${run.incrementAndGet()}"
    Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v_c"))
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    s.read.parquet(dir)
      .filter(col("event_type") === "purchase")
      .groupBy("day")
      .agg(count(lit(1)).as("n_purchases"), sum("v_c").as("value_c"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_purchases"), col("value_c"))
      .orderBy("day")
  }

  val all: Map[String, Q] = Map(
    "q_bucketed_join" -> qBucketedJoin,
    "q_partitioned_sink" -> qPartitionedSink,
  )

  val oracles: Map[String, String] = Map(
    "q_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_partitioned_sink" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        | count(*) AS n_purchases,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY day""".stripMargin,
  )
}
