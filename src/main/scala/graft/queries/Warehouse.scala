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

  /** Scan-planning metadata from parquet FOOTERS — row counts and
    * column min/max straight off `ParquetFileReader`, no data pages
    * read: the statistics a planner consults to prune row groups before
    * any executor task launches (what `.explain`'s PushedFilters
    * ultimately hit). Reported for lineitem's key column;
    * oracle-checked since r8 via DuckDB's `parquet_metadata()` over the
    * same file (path injected by Verify's `__SF_DIR__` substitution),
    * with WarehouseSpec additionally pinning the stats against the data.
    *
    * 100 TB shape: one footer read per file — at scale the file list
    * becomes a DataFrame and footers are read in parallel inside
    * mapPartitions; nothing here touches data pages. */
  val qFooterStats: Q = (s, d) => {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.fs.Path
    import scala.jdk.CollectionConverters._
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new Path(s"$d/lineitem.parquet"), s.sessionState.newHadoopConf()))
    val (nGroups, totalRows, minKey, maxKey) =
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        val stats = blocks.flatMap(_.getColumns.asScala
          .filter(_.getPath.toDotString == "l_orderkey").map(_.getStatistics))
        (blocks.size.toLong, blocks.map(_.getRowCount).sum,
          stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min,
          stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max)
      } finally reader.close()
    import s.implicits._
    Seq((nGroups, totalRows, minKey, maxKey))
      .toDF("n_rowgroups", "total_rows", "min_l_orderkey", "max_l_orderkey")
  }

  /** MERGE-INTO upsert (the Delta/Iceberg headline op, expressed on a
    * plain parquet store): target = per-customer spend snapshot from
    * orders before 1997; change batch = the 1997 orders aggregated the
    * same way. Matched keys UPDATE (sums add), unmatched-by-target keys
    * INSERT, unmatched-by-source rows are KEPT — each row labeled with
    * its `merge_action`. The target round-trips through parquet so the
    * store path (write → catalog-less scan → merge) is the real one.
    *
    * 100 TB shape: one equi-shuffle (full-outer on the snapshot key) —
    * the same bill as q_table_diff; at scale the rewrite narrows to
    * changed partitions via the partition-pruned sink layout, and the
    * change batch is usually broadcast-sized. */
  val qMergeUpsert: Q = (s, d) => {
    val dir = java.nio.file.Files.createTempDirectory("graft_merge").toString +
      s"/run_${run.incrementAndGet()}"
    def spend(df: DataFrame) = df
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("spend_c"))
    val orders = Tables.orders(s, d)
      .withColumn("o_date", to_date(col("o_orderdate")))
    spend(orders.filter(col("o_date") < lit("1997-01-01")))
      .write.mode("overwrite").parquet(dir)
    val target = s.read.parquet(dir)
    val changes = spend(orders
        .filter(col("o_date") >= lit("1997-01-01") &&
          col("o_date") < lit("1998-01-01")))
      .select(col("o_custkey").as("c_key"), col("n_orders").as("c_n"),
        col("spend_c").as("c_spend"))
    target.join(changes, col("o_custkey") === col("c_key"), "full_outer")
      .select(
        coalesce(col("o_custkey"), col("c_key")).as("custkey"),
        (coalesce(col("n_orders"), lit(0L)) + coalesce(col("c_n"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("spend_c"), lit(0L)) + coalesce(col("c_spend"), lit(0L)))
          .as("spend_c"),
        when(col("o_custkey").isNull, "insert")
          .when(col("c_key").isNull, "keep")
          .otherwise("update").as("merge_action"))
      .orderBy("custkey")
  }

  val all: Map[String, Q] = Map(
    "q_bucketed_join" -> qBucketedJoin,
    "q_partitioned_sink" -> qPartitionedSink,
    "q_footer_stats" -> qFooterStats,
    "q_merge_upsert" -> qMergeUpsert,
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
    "q_merge_upsert" ->
      """WITH spend AS (
        | SELECT o_custkey, CAST(o_orderdate AS DATE) AS o_date,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        | FROM orders),
        |t AS (
        | SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(price_c) AS BIGINT) AS spend_c
        | FROM spend WHERE o_date < DATE '1997-01-01' GROUP BY 1),
        |c AS (
        | SELECT o_custkey AS c_key, count(*) AS c_n,
        |  CAST(sum(price_c) AS BIGINT) AS c_spend
        | FROM spend WHERE o_date >= DATE '1997-01-01'
        |  AND o_date < DATE '1998-01-01' GROUP BY 1)
        |SELECT coalesce(o_custkey, c_key) AS custkey,
        | coalesce(n_orders, 0) + coalesce(c_n, 0) AS n_orders,
        | coalesce(spend_c, 0) + coalesce(c_spend, 0) AS spend_c,
        | CASE WHEN o_custkey IS NULL THEN 'insert'
        |      WHEN c_key IS NULL THEN 'keep'
        |      ELSE 'update' END AS merge_action
        |FROM t FULL OUTER JOIN c ON o_custkey = c_key
        |ORDER BY custkey""".stripMargin,
    // __SF_DIR__ is substituted by Verify at dump time (the only query
    // whose oracle reads FOOTERS, not rows — parquet_metadata() needs a
    // constant file path, and only Verify knows the scale-factor dir).
    "q_footer_stats" ->
      """WITH m AS (
        | SELECT * FROM parquet_metadata('__SF_DIR__/lineitem.parquet'))
        |SELECT CAST(count(DISTINCT row_group_id) AS BIGINT) AS n_rowgroups,
        | (SELECT CAST(sum(row_group_num_rows) AS BIGINT)
        |    FROM (SELECT DISTINCT row_group_id, row_group_num_rows FROM m))
        |   AS total_rows,
        | min(CASE WHEN path_in_schema = 'l_orderkey'
        |          THEN CAST(stats_min AS BIGINT) END) AS min_l_orderkey,
        | max(CASE WHEN path_in_schema = 'l_orderkey'
        |          THEN CAST(stats_max AS BIGINT) END) AS max_l_orderkey
        |FROM m""".stripMargin,
  )
}
