package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

/** Measured shuffle-volume guards — "measure, don't guess" turned into
  * assertions: for plans whose scale story is "the shuffle carries an
  * aggregate, not the input", read the ACTUAL shuffle records from the
  * executed plan's SQLMetrics and pin them. A regression that silently
  * moves full rows through an exchange (lost partial agg, dropped
  * broadcast) fails here even if the answer stays correct.
  */
class MetricsSpec extends AnyFunSuite with SharedSpark {

  /** Sum of `shuffle records written` across every shuffle exchange in
    * the executed (post-AQE) plan. */
  private def shuffleRecords(root: SparkPlan): Long = {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    var total = 0L
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case s: ShuffleExchangeLike =>
        total += s.metrics.get("shuffleRecordsWritten")
          .orElse(s.metrics.get("numOutputRows")).map(_.value).getOrElse(0L)
        s.children.foreach(walk)
      case other =>
        other.children.foreach(walk)
        other.subqueries.foreach(walk)
    }
    walk(root)
    total
  }
  private def walkTotal(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    shuffleRecords(df.queryExecution.executedPlan)
  }

  test("q1_agg's shuffles carry combiner rows, not the input") {
    val inputRows = Tables.lineitem(spark, sfDir).count()
    val df = SparkEntry.queries("q1_agg")(spark, sfDir)
    val shuffled = walkTotal(df)
    // partial agg → per-task group rows; 4 tasks × 6 groups plus the
    // final sort exchange — orders of magnitude under the input
    assert(shuffled < inputRows / 10,
      s"q1_agg shuffled $shuffled records against $inputRows input rows")
  }

  test("q_star_join never shuffles the fact table") {
    val inputRows = Tables.lineitem(spark, sfDir).count()
    val df = SparkEntry.queries("q_star_join")(spark, sfDir)
    val shuffled = walkTotal(df)
    assert(shuffled < inputRows / 10,
      s"q_star_join shuffled $shuffled records against $inputRows fact rows")
  }

  test("jaccardPairs sizes joins: AQE converts both to broadcasts at small scale") {
    // r14 ADVICE adjudication: the two post-agg joins against the
    // per-doc `sizes` frame carry NO static broadcast hint — sizes is
    // data-sized (n docs), so a hard broadcast() would OOM at 10⁹ docs.
    // The contract is instead: AQE sees the runtime size and converts
    // both joins to broadcasts whenever sizes fits (always, at any SF a
    // single box can host), and keeps the id-keyed sort-merge join at
    // the scales where broadcast would be fatal. Pin the SIZES joins
    // specifically (r15, ADVICE — with maxDf=16 the hotPerDoc left
    // joins are ALSO unhinted a_id/b_id joins, so a bare "some BHJ on
    // a_id" assert could pass while the sizes joins regress to SMJ):
    // the sizes build sides are the only frames carrying the nsh
    // aliases na/nb, so assert a BHJ keyed on a_id whose BUILD side
    // outputs `na`, and one keyed on b_id whose build side outputs
    // `nb`.
    import org.apache.spark.sql.catalyst.optimizer.BuildLeft
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val docs = Tables.documents(spark, sfDir)
    val pairs = graft.dedup.Dedup.jaccardPairs(docs, 0.6, maxDf = 16)
    pairs.collect()
    // (join keys, build-side output column names) per BroadcastHashJoin
    var bhjs = List.empty[(Set[String], Set[String])]
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case b: BroadcastHashJoinExec =>
        val keys = (b.leftKeys ++ b.rightKeys).flatMap(_.references)
          .map(_.name).toSet
        val build = if (b.buildSide == BuildLeft) b.left else b.right
        bhjs ::= (keys, build.output.map(_.name).toSet)
        b.children.foreach(walk)
      case other =>
        other.children.foreach(walk)
        other.subqueries.foreach(walk)
    }
    walk(pairs.queryExecution.executedPlan)
    assert(
      bhjs.exists(j => j._1.contains("a_id") && j._2.contains("na")) &&
        bhjs.exists(j => j._1.contains("b_id") && j._2.contains("nb")),
      s"expected AQE-broadcast SIZES joins (build side carrying na/nb) " +
        s"on a_id and b_id, got (keys, buildOutput): $bhjs\n" +
        pairs.queryExecution.executedPlan.toString)
  }

  test("q_topk_count's TakeOrdered ships only per-partition heads") {
    val df = SparkEntry.queries("q_topk_count")(spark, sfDir)
    val shuffled = walkTotal(df)
    // group-by-key agg shuffles distinct keys; the top-k itself ships
    // ≤ k rows per partition
    val distinctKeys = 3000 // l_partkey domain at sf0.001 (2000 parts) + slack
    assert(shuffled < distinctKeys * 2,
      s"q_topk_count shuffled $shuffled records")
  }
}
