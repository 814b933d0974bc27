package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join operators Spark lacks natively, composed from built-ins
  * (preference (a) of the custom-operator ladder — no custom SparkPlan
  * needed; both shapes scale as one shuffle + sort):
  *
  *  - [[asOf]]: for each left row, the latest right row with
  *    right.ts <= left.ts per key. Implemented as union → per-key
  *    time-ordered window → last(ignoreNulls) carry-forward → filter left
  *    side. One shuffle on the key, one sort per partition — the same
  *    cost profile as a sort-merge join, no point-in-time loop.
  *  - [[rangeSelfJoin]]: pairs within ±tolerance seconds, via tolerance-
  *    width time buckets: right side replicated to 3 adjacent buckets,
  *    equality join on bucket, exact filter after. Turns an inequality
  *    join (nested-loop at scale) into an equi-join shuffle.
  */
object TemporalJoins {

  /** As-of (point-in-time) join. `rightVals` are the right columns carried
    * onto left rows (renamed as given). Left rows with no prior right row
    * keep nulls — left-outer as-of semantics. */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           rightVals: Map[String, String]): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == key || c == ts)
    val rightSchema = right.schema
    // unified row shape: key, ts, side (right=0 sorts before left=1 at
    // equal ts → ties match, i.e. >= semantics), left payload, right payload
    val l = left
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col(ts), col("__side")) ++
        leftCols.map(col) ++
        rightVals.map { case (src, dst) =>
          lit(null).cast(rightSchema(src).dataType).as(dst) }.toSeq: _*)
    val r = right
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col(ts), col("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map { case (src, dst) => col(src).as(dst) }.toSeq: _*)
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.values.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side")
  }

  /** NATIVE as-of join via the custom physical operator
    * ([[graft.plans.AsOfJoinExec]] — requires
    * [[graft.functions.GraftExtensions]] installed on the session).
    * Same semantics as [[asOf]] (latest right.ts <= left.ts per key,
    * ties match, left-outer), but planned as one streaming merge pass
    * per co-partition instead of the union+window composition. Every
    * right column is carried, prefixed `rPrefix` — the fresh aliases
    * also give the right side new expression ids, which keeps the two
    * sides' attributes disjoint even when both derive from the same
    * scan (a requirement for hand-built binary nodes). */
  def asOfNative(left: DataFrame, right: DataFrame, key: String, ts: String,
                 rPrefix: String = "r_"): DataFrame = {
    import org.apache.spark.sql.graftshim
    // idempotent: the strategy must live in whatever session plans this
    // frame (the harness driver builds plain sessions)
    graft.functions.GraftExtensions.install(left.sparkSession)
    val r2 = right.select(right.columns.toSeq.map(c => col(c).as(rPrefix + c)): _*)
    val lPlan = graftshim.analyzed(left)
    val rPlan = graftshim.analyzed(r2)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      p.output.find(_.name == name).getOrElse(
        sys.error(s"asOfNative: no column '$name' in ${p.output.map(_.name)}"))
    require(lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "asOfNative: left/right attribute ids collide — alias the right side")
    graftshim.ofRows(left.sparkSession,
      graft.plans.AsOfJoin(lPlan, rPlan,
        attr(lPlan, key), attr(rPlan, rPrefix + key),
        attr(lPlan, ts), attr(rPlan, rPrefix + ts)))
  }

  /** Self range join on a timestamp: unordered pairs (idA < idB) whose
    * epoch-second difference is ≤ toleranceSec. */
  def rangeSelfJoin(df: DataFrame, id: String, ts: String,
                    toleranceSec: Long): DataFrame = {
    val withSec = df.withColumn("__sec", col(ts).cast("long"))
      .withColumn("__bucket", expr(s"__sec div $toleranceSec"))
    val a = withSec.select(col(id).as("a_id"), col("__sec").as("a_sec"), col("__bucket"))
    val b = withSec.select(col(id).as("b_id"), col("__sec").as("b_sec"),
        explode(array(col("__bucket") - 1, col("__bucket"), col("__bucket") + 1)).as("__bucket"))
    a.join(b, Seq("__bucket"))
      .filter(col("a_id") < col("b_id") &&
        abs(col("a_sec") - col("b_sec")) <= toleranceSec)
      .select(col("a_id"), col("b_id"), (col("b_sec") - col("a_sec")).as("gap_sec"))
  }
}
