package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval / sweep-line analytics: peak concurrency over closed
  * intervals WITHOUT a single-partition global window.
  *
  * A running sum over all boundary events is a global prefix sum — the
  * naive `Window.orderBy(ts)` form funnels the whole dataset through ONE
  * task. This implements the distributed two-level prefix sum instead:
  *
  *  1. bucket boundaries by hour; per-bucket delta totals (one tiny row
  *     per hour — partial-aggregable);
  *  2. cumulative OFFSETS over the bucket totals — the only unpartitioned
  *     window, over rows bounded by the time span (720 rows/month),
  *     never by data volume;
  *  3. a bucket-PARTITIONED running sum, shifted by each bucket's offset
  *     — identical to the global prefix because hour buckets respect
  *     timestamp order.
  *
  * Boundary ordering is (ts ASC, delta DESC): a start and an end at the
  * same instant count as overlapping (closed intervals). Tied rows'
  * individual running values depend on tie order, but every per-hour
  * aggregate taken here is tie-order-invariant, so results are
  * deterministic and replay exactly in SQL.
  */
object Intervals {

  /** Hourly peak concurrency + session-start counts over closed
    * intervals `(s, e)` (timestamps, s ≤ e).
    *
    * Peak accounts for concurrency carried INTO the hour: for each
    * boundary row, `conc − delta` is the level just before it — its max
    * with `conc` covers both the carry-in level (first row of the hour)
    * and every post-boundary level. Hours with no boundary at all (an
    * interval spanning them whole) produce no row — the output is "hours
    * with session-boundary activity", documented contract.
    *
    * @return (bucket: timestamp hour, peak_concurrent: long, n_starts: long)
    */
  def hourlyPeakConcurrency(intervals: DataFrame): DataFrame = {
    val bounds = intervals.select(col("s").as("ts"), lit(1L).as("delta"))
      .union(intervals.select(col("e").as("ts"), lit(-1L).as("delta")))
      .withColumn("bucket", date_trunc("hour", col("ts")))
    // hour buckets are monotone in ts and bounded by the time span —
    // exactly the Prefix bucketing contract
    Prefix.runningSum(bounds, col("bucket"),
        Seq(col("ts").asc, col("delta").desc), col("delta"), "conc")
      .groupBy("bucket")
      .agg(
        max(greatest(col("conc"), col("conc") - col("delta")))
          .as("peak_concurrent"),
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_starts"))
  }
}
