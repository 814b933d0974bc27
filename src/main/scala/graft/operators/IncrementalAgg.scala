package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view refresh
  * pattern: a persisted MERGEABLE state table (group, cnt, sum) that
  * daily batches fold into WITHOUT rescanning history.
  *
  * At 100 TB this is the difference between "tonight's refresh scans
  * tonight's partition" and "tonight's refresh scans the year": each
  * `refresh` aggregates ONLY the delta (one partial-aggregable pass over
  * the batch), then merges with the state table — whose size is bounded
  * by group cardinality, not by history. Means and other ratios are
  * DERIVED from (sum, cnt) at read time: averages of averages are wrong,
  * sums of sums are not — which is why the state holds the mergeable
  * pair, never the mean.
  *
  * Writes go through a staging dir + delete/rename swap (the
  * SignatureStore.compact pattern). Crash safety: the staging write
  * completes BEFORE the old state is touched, and readers fall back to
  * staging when the primary dir is missing — so a crash before the
  * delete serves the old state, and a crash inside the delete+rename
  * window serves the complete NEW state from staging. Deltas must be
  * exactly-once: folding the same batch twice double-counts (the usual
  * contract for incremental MV maintenance — pair with the idempotent
  * upsert layer if the source can replay).
  */
object IncrementalAgg {

  private def stagingPath(path: String) = s"$path.tmp"

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new org.apache.hadoop.fs.Path(dir))

  /** Resolve the serving state dir: primary, else the completed staging
    * left by a crash inside the swap window (see class doc). */
  private def servingPath(spark: SparkSession, path: String): Option[String] =
    if (exists(spark, path)) Some(path)
    else if (exists(spark, stagingPath(path))) Some(stagingPath(path))
    else None

  /** Fold one delta batch into the state at `path` (creating it on the
    * first call). State schema: (grpCol, cnt: long, total: double). */
  def refresh(spark: SparkSession, path: String, delta: DataFrame,
      grpCol: String, valCol: String): Unit = {
    val deltaState = delta.groupBy(grpCol).agg(
      count(lit(1)).as("cnt"), sum(col(valCol)).as("total"))
    val merged = servingPath(spark, path) match {
      case Some(dir) =>
        spark.read.parquet(dir).unionByName(deltaState)
          .groupBy(grpCol).agg(sum("cnt").as("cnt"), sum("total").as("total"))
      case None => deltaState
    }
    // materialize the merge somewhere NEW before touching what it reads:
    // a recovery run may be reading FROM staging, so land in a fresh dir
    // first, then promote it to staging, then swap
    val staging = stagingPath(path)
    val fresh = s"$path.next"
    merged.write.mode("overwrite").parquet(fresh)
    val f = fs(spark, path)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    if (f.exists(p(staging))) f.delete(p(staging), true)
    require(f.rename(p(fresh), p(staging)), s"rename $fresh -> $staging failed")
    if (f.exists(p(path))) f.delete(p(path), true)
    require(f.rename(p(staging), p(path)), s"rename $staging -> $path failed")
  }

  /** Current state with the derived mean — the read-time view. */
  def readState(spark: SparkSession, path: String): DataFrame = {
    val dir = servingPath(spark, path).getOrElse(
      sys.error(s"no aggregate state at $path"))
    spark.read.parquet(dir)
      .withColumn("mean", col("total") / col("cnt"))
  }
}
