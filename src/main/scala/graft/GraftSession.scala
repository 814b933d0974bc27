package graft

import org.apache.spark.sql.SparkSession
import graft.functions.GraftExtensions

/** Recommended session wiring for deployments of this library — the
  * knob sheet a 100 TB cluster run starts from, as code:
  *
  *  - `spark.sql.shuffle.partitions`: size for 2-3× TOTAL executor
  *    cores (AQE coalesces small post-shuffle partitions down, so err
  *    high; too low and one reducer spills). The harness/test value is
  *    the core count itself — right for single-digit-GB local runs.
  *  - `spark.sql.files.maxPartitionBytes` 256 MB: scan tasks over a
  *    columnar corpus are cheap per byte; fewer, larger tasks cut
  *    scheduling overhead on million-file tables. Shrink only when
  *    per-row work is heavy (e.g. media decode).
  *  - parquet zstd: the corpus is cold data read many times — zstd
  *    trades a little encode CPU for materially smaller storage and
  *    scan I/O than snappy.
  *  - UTC session timezone: timestamp determinism across engines (the
  *    DuckDB oracle replays in UTC).
  *  - bloom-filter size caps raised to 10⁸ items / 2³⁰ bits:
  *    `BloomFilterAggregate` silently CLAMPS to these confs (defaults:
  *    4M items, 8 MB), which would quietly turn a large decontamination
  *    sketch ([[graft.functions.BloomFilters]]) into a pass-through.
  *  - [[graft.functions.GraftExtensions]]: the custom expressions reach
  *    SQL strings, and the sorted-intersect optimizer rewrite is active.
  *
  * AQE, its skew-join splitting, and exchange reuse are on by default
  * in Spark 4 and relied upon — nothing here turns them off.
  */
object GraftSession {

  /** Builder for a fresh deployment (cluster master/deploy confs come
    * from spark-submit; this adds the library's recommendations). */
  def builder(appName: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (256L << 20).toString)
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", (100_000_000L).toString)
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", (1L << 30).toString)

  /** Apply the same wiring to an ALREADY-BUILT session (the harness
    * driver owns session construction): runtime-settable confs plus the
    * function/rule registration. Returns the session for chaining. */
  def tune(spark: SparkSession, shufflePartitions: Int): SparkSession = {
    spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (256L << 20).toString)
    spark.conf.set("spark.sql.parquet.compression.codec", "zstd")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
      (100_000_000L).toString)
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
      (1L << 30).toString)
    GraftExtensions.install(spark)
    spark
  }
}
