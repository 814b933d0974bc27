package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** In-flight pipeline metrics — data-quality gates WITHOUT a second
  * scan: `observe()` attaches aggregate metrics (row counts, null
  * counts, value bounds) to a frame and Spark's CollectMetrics operator
  * accumulates them DURING whatever action the caller runs — at 100 TB
  * the alternative is re-scanning the input once per quality check.
  * The [[Observation]] handle blocks on `get` until the first action
  * completes, then serves the metric row; attach one per pipeline stage
  * and assert bounds before promoting the stage's output (the
  * freshness/completeness gate of a production feed).
  */
object Monitor {

  /** Attach named metrics to `df`; returns the instrumented frame and
    * the handle to read after the caller's own action. */
  def observed(df: DataFrame, name: String,
               metrics: Seq[Column]): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
