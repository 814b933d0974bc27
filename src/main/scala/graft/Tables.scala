package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every accessor is a plain parquet scan; Catalyst handles column pruning
  * and predicate pushdown into the scan (`PushedFilters` / `ReadSchema`),
  * so callers should `.select`/`.filter` freely rather than pre-trimming.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet's `ts` physical type has drifted across testdata
    * generations — INT64 TIMESTAMP(NANOS) originally, TIMESTAMP_MICROS
    * (isAdjustedToUTC=false → TIMESTAMP_NTZ) now — so load first and
    * branch on the ARRIVED dataType instead of assuming a layout.
    * Canonical downstream type is microsecond TimestampType: with the
    * UTC session timezone ([[GraftSession]]) an NTZ→TZ cast is an exact
    * epoch-micros identity, matching what the DuckDB oracle reads from
    * the same file. Legacy nanos arrive as long (runtime-settable conf,
    * a no-op on non-nanos files) and downconvert via integer `div` to
    * avoid double-precision loss on ~1.7e18 nanos. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    canonicalTs(load(s, d, "events"))
  }

  /** Normalize an events frame's `ts` to the canonical type, whatever
    * physical form it arrived in. Shared by the batch loader above and
    * the file-source stream ([[graft.streaming.Streaming.readEvents]]),
    * so batch and stream cannot drift on the conversion. */
  private[graft] def canonicalTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other; expected nanos-long, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
