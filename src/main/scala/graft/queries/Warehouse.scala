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
    * ultimately hit). Reported for lineitem's key column; rows-only
    * (row-group structure isn't SQL-derivable) with WarehouseSpec
    * pinning the stats against the data.
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

  val all: Map[String, Q] = Map(
    "q_bucketed_join" -> qBucketedJoin,
    "q_partitioned_sink" -> qPartitionedSink,
    "q_footer_stats" -> qFooterStats,
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
