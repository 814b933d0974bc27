package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** NATIVE as-of join — the whole-operator tier of the custom-operator
  * ladder (SURVEY §3: custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`): for each left row, the latest right row with
  * right.time <= left.time within the same key, left-outer semantics.
  *
  * Spark has no as-of join; the composed form
  * ([[graft.operators.TemporalJoins.asOf]]) unions both sides through a
  * carry-forward window, which materializes every right column as a
  * null-padded slot on every UNION row and pays the window machinery.
  * This operator instead asks the PLANNER for exactly what the
  * algorithm needs — `ClusteredDistribution` on the key for both
  * children and per-partition `(key, time)` ordering, so Catalyst
  * inserts the same exchange+sort pair it would for a sort-merge join
  * (AQE still free to coalesce/skew-split them) — then joins each
  * partition in ONE streaming merge pass: O(|L|+|R|), zero allocation
  * per row beyond the single buffered right candidate, no union blowup,
  * no window state. Same cost shape as a sort-merge join, strictly less
  * data movement than the composed form.
  *
  * Keys must be LongType and both time columns the same
  * long-representable type (long / timestamp / timestamp_ntz / int /
  * date) — the engine's id+event-time shape; enforced at construction.
  * Ties (right.time == left.time) match, mirroring DuckDB
  * `ASOF JOIN ... ON l.ts >= r.ts` and the composed operator.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] to [[AsOfJoinExec]]; everything else falls through
  * to the built-in strategies. Injected via
  * [[graft.functions.GraftExtensions]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(planLater(j.left), planLater(j.right),
        j.leftKey, j.rightKey, j.leftTime, j.rightTime) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  private def longReadable(e: Expression): Boolean = e.dataType match {
    case LongType | TimestampType | TimestampNTZType | IntegerType | DateType => true
    case _ => false
  }
  require(leftKey.dataType == LongType && rightKey.dataType == LongType,
    s"as-of keys must be long, got ${leftKey.dataType}/${rightKey.dataType}")
  require(longReadable(leftTime) && rightTime.dataType == leftTime.dataType,
    s"as-of times must share a long-representable type, got " +
      s"${leftTime.dataType}/${rightTime.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // the planner provides the shuffles + sorts: cluster both children by
  // the key, order each partition by (key, time) — identical requirements
  // to a sort-merge join, so EnsureRequirements/AQE treat it the same way
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending) :: SortOrder(leftTime, Ascending) :: Nil,
      SortOrder(rightKey, Ascending) :: SortOrder(rightTime, Ascending) :: Nil)
  // left rows pass through untouched, in order — expose both facts so
  // downstream operators can reuse the partitioning and the sort
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    SortOrder(leftKey, Ascending) :: SortOrder(leftTime, Ascending) :: Nil

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKey = leftKey
    val rKey = rightKey
    val lTime = leftTime
    val rTime = rightTime
    val intTime = lTime.dataType == IntegerType || lTime.dataType == DateType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // generated projections are not serializable — build per partition
      val lProj = UnsafeProjection.create(Seq(lKey, lTime), lOut)
      val rProj = UnsafeProjection.create(Seq(rKey, rTime), rOut)
      val resultProj = UnsafeProjection.create(output, output)
      def time(row: InternalRow): Long =
        if (intTime) row.getInt(1).toLong else row.getLong(1)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // single-candidate state: cand = latest right already proven
      // (candKey, candTime) <= current left (key, time) in as-of order;
      // ahead = the next right row not yet admitted
      var cand: InternalRow = null
      var candKey = 0L
      var ahead: InternalRow = null
      var aheadKey = 0L
      var aheadTime = 0L
      def advanceAhead(): Unit =
        if (rIter.hasNext) {
          ahead = rIter.next().copy() // iterators reuse their row buffer
          val kt = rProj(ahead)
          aheadKey = kt.getLong(0)
          aheadTime = time(kt)
        } else ahead = null
      advanceAhead()
      lIter.map { lRow =>
        val kt = lProj(lRow)
        val k = kt.getLong(0)
        val t = time(kt)
        // admit every right row at or before (k, t); the last one admitted
        // with the same key is the as-of match (right sorted by (key, time))
        while (ahead != null &&
          (aheadKey < k || (aheadKey == k && aheadTime <= t))) {
          cand = ahead
          candKey = aheadKey
          advanceAhead()
        }
        // cand was admitted under an earlier-or-equal left, so its time is
        // <= t whenever its key is k; a stale cand from a previous key
        // simply fails the key test
        if (cand != null && candKey == k) resultProj(joined(lRow, cand))
        else resultProj(joined(lRow, nullRight))
      }
    }
  }
}
