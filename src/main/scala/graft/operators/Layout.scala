package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, expr, max, min}
import graft.functions.ZOrder2

/** Physical-layout operators: how a table is ARRANGED on disk, the lever
  * that turns parquet min/max column statistics into file pruning at
  * scan time. At 100 TB the scan you avoid is worth more than any
  * operator tuning — a well-clustered layout lets a point/range filter
  * on either clustered key read a few files instead of all of them.
  */
object Layout {

  /** Integer 16-bit min-max normalization of a long key (as a SQL `div`
    * expression over a named column with inlined bounds), overflow-free
    * for any range: compress by `step = range div 2^16 + 1`, then
    * stretch the compressed range to [0, 65535]. Monotone. Without it,
    * the larger-ranged key owns all the high Morton bits and the curve
    * degrades into a plain sort on that key. */
  private def scale16(name: String, mn: Long, mx: Long): String = {
    val step = (mx - mn) / 65536L + 1L
    val crange = (mx - mn) / step
    s"((($name - ${mn}L) div ${step}L) * 65535L) div ${crange + 1L}L"
  }

  /** Z-order clustering: range-partition and sort by the Morton
    * interleave of two 16-bit-normalized keys ([[graft.functions.ZOrder2]]),
    * so BOTH keys end up with narrow per-file min/max spans (a
    * lexicographic sort would cluster only its leading key). Write the
    * result with any file sink; downstream scans filtering either key
    * prune on parquet footer stats.
    *
    * Key bounds come from one cheap stats-only aggregation (collected:
    * 4 longs). `numFiles` sizes the range partitioning — at cluster
    * scale pick (table bytes / target file size); the range boundaries
    * come from Spark's reservoir sampling of the z column, after which
    * the layout is one exchange + per-partition sort.
    *
    * This is the INTEGER-key path: the scaling and z-value are exact
    * integer math, replayable bit-for-bit by any engine (the
    * q_zorder_layout oracle does). For float keys use the double-scaled
    * writer [[graft.operators.Scale.zorderWrite]] — same ZOrder2
    * expression, double min-max normalization. */
  def zorderLayout(df: DataFrame, k1: Column, k2: Column,
                   numFiles: Int): DataFrame = {
    val named = df
      .withColumn("__k1", k1.cast("long"))
      .withColumn("__k2", k2.cast("long"))
    val b = named.agg(min("__k1"), max("__k1"), min("__k2"), max("__k2")).head()
    named
      .withColumn("__z", ZOrder2.zorder2(
        expr(scale16("__k1", b.getLong(0), b.getLong(1))),
        expr(scale16("__k2", b.getLong(2), b.getLong(3)))))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__k1", "__k2")
  }
}
