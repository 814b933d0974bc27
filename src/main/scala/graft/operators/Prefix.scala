package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sums — the primitive behind sweep-line
  * concurrency ([[Intervals]]) and systematic PPS sampling: a running
  * sum in a TOTAL order without funneling the dataset through one
  * `Window.orderBy` partition.
  *
  * Two-level decomposition: per-bucket totals (partial-aggregable),
  * cumulative OFFSETS over the bucket totals (the only unpartitioned
  * window — one row per bucket), then a bucket-partitioned running sum
  * shifted by its bucket's offset. Correct whenever `bucketCol` is
  * MONOTONE in the intended global order (hour truncation of a
  * timestamp, id div K): bucket boundaries then respect the order and
  * the two-level sum equals the flat one (oracle-proven equal for both
  * consumers).
  *
  * Choosing buckets: cardinality is the offsets window's row count —
  * time-derived buckets are bounded by the time span; for id-derived
  * buckets pick K ≈ √N (sqrt decomposition: both levels see √N rows).
  * At extreme scale add a third level the same way — offsets are
  * themselves a prefix sum.
  */
object Prefix {

  /** Inclusive running sum of `valCol` in the total order
    * (bucketCol, orderCols…), emitted as `outCol`.
    *
    * @param orderCols within-bucket order completing the total order;
    *                  may carry .asc/.desc
    */
  def runningSum(df: DataFrame, bucketCol: Column, orderCols: Seq[Column],
      valCol: Column, outCol: String): DataFrame = {
    val bucketed = df.withColumn("__bucket", bucketCol)
      .withColumn("__v", valCol)
    val totals = bucketed.groupBy("__bucket").agg(sum("__v").as("__tot"))
    val offsets = totals.withColumn("__offset",
        coalesce(sum("__tot").over(Window.orderBy("__bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__bucket", "__offset")
    val wIn = Window.partitionBy("__bucket").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      // one row per bucket — broadcast-sized by the bucketing contract
      .join(broadcast(offsets), "__bucket")
      .withColumn(outCol, col("__offset") + sum("__v").over(wIn))
      .drop("__bucket", "__v", "__offset")
  }
}
