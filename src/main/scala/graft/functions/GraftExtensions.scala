package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's custom Catalyst expressions as
  * SQL functions (`dot_product`, `poisson_pmf`), so the SQL-string entry
  * point (SURVEY.md §3 entry 1) reaches them too:
  *
  *   spark = SparkSession.builder().withExtensions(new GraftExtensions)...
  *   spark.sql("SELECT dot_product(a, b) FROM vecs")
  *
  * [[GraftExtensions.install]] does the same on an already-built session
  * (the driver owns session construction in this harness). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectOptimizerRule(_ => SortedIntersectRewrite)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  val definitions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("poisson_pmf",
      new ExpressionInfo(classOf[PoissonPmf].getName, "poisson_pmf"),
      (args: Seq[Expression]) => PoissonPmf(args(0), args(1))),
    ("sorted_intersect_count",
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args(0))),
    ("nfc_normalize",
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => NfcNormalize(args(0))),
    ("zorder2",
      new ExpressionInfo(classOf[ZOrder2].getName, "zorder2"),
      (args: Seq[Expression]) => ZOrder2(args(0), args(1))),
    ("vector_stats",
      new ExpressionInfo(classOf[VectorStats].getName, "vector_stats"),
      (args: Seq[Expression]) => VectorStats(args(0)).toAggregateExpression()),
    ("cms_estimate",
      new ExpressionInfo(classOf[CountMinEstimate].getName, "cms_estimate"),
      (args: Seq[Expression]) =>
        if (args.length >= 5)
          CountMinEstimate(args(0), args(1), args(2), args(3), args(4))
        else CountMinEstimate(args(0), args(1), args(2), args(3))))

  /** Runtime registration on an existing session (functions + the
    * sorted-intersect optimizer rule via experimental.extraOptimizations,
    * the post-construction injection point). */
  def install(spark: SparkSession): Unit = {
    definitions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(SortedIntersectRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SortedIntersectRewrite
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
  }
}
