package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Pre-flight over the ENTIRE query registry: every `SparkEntry.queries`
  * entry must ANALYZE against the current testdata. This is the loud
  * failure mode for schema drift — when a driver regeneration changes a
  * table's physical types (as events.ts did: INT64-nanos → micros → NTZ),
  * the breakage surfaces here as N named test failures instead of rows
  * silently vanishing from the correctness file.
  *
  * Analysis only (`queryExecution.analyzed`), not execution — QueriesSpec
  * and the Verify gate own result correctness; this spec owns "still
  * resolves against what is on disk".
  */
class RegistrySpec extends AnyFunSuite with SharedSpark {

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name analyzes against current testdata") {
      val df = fn(spark, sfDir)
      assert(df.queryExecution.analyzed.resolved, s"$name failed to resolve")
      assert(df.schema.nonEmpty, s"$name produced an empty schema")
    }
  }

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries without a query: $orphans")
  }

  /** Pins the events timestamp convention end-to-end (VERDICT r6 item 7):
    * the file stores TIMESTAMP_MICROS isAdjustedToUTC=false (NTZ); the
    * canonical in-engine type is TimestampType under the UTC session
    * timezone, which makes `unix_micros(ts)` EXACTLY the micros stored in
    * the file — the same integers DuckDB's `epoch_us` sees reading the
    * same parquet. A drift in either the file layout or the load branch
    * breaks the literal comparison below.
    */
  test("events.ts canonical type is TimestampType with epoch micros equal to the raw file values") {
    val canon = Tables.events(spark, sfDir)
    assert(canon.schema("ts").dataType == TimestampType,
      s"canonical ts must be TimestampType, got ${canon.schema("ts").dataType}")

    // raw read, no Tables branch: whatever type arrives, normalize to
    // epoch micros without any timezone reinterpretation
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val rawMicros = raw.schema("ts").dataType match {
      case LongType => raw.select(col("event_id"), expr("ts div 1000").as("us"))
      case _ => // NTZ or TZ: micros since epoch of the stored value
        raw.select(col("event_id"),
          expr("unix_micros(cast(ts as timestamp))").as("us"))
    }
    val got = canon.select(col("event_id"), unix_micros(col("ts")).as("us"))
    val diff = got.as("a").join(rawMicros.as("b"), "event_id")
      .filter(col("a.us") =!= col("b.us")).count()
    assert(diff == 0L, s"$diff events disagree on epoch micros between canonical load and raw file")
    // anchor against absolute drift too: all micros inside [2020, 2030)
    val range = canon.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    assert(range.getLong(0) > 1577836800000000L && range.getLong(1) < 1893456000000000L,
      s"events ts outside sane epoch range: $range")
  }
}
