package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan dump tool behind PLANS.md: executes the named registry
  * queries at the given sf dir and prints each one's executed plan
  * (post-AQE), the exact trees the plan audit documents.
  *
  * Usage: runMain graft.PlanDump <sfDir> <queryName> [more names...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <query> [query...]")
    val spark = SparkSession.builder()
      .appName("graft-plandump")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      for (name <- args.drop(1)) {
        val df = SparkEntry.queries(name)(spark, args(0))
        df.collect() // drive AQE so the final plan is the real one
        println(s"==== $name ====")
        println(df.queryExecution.executedPlan.toString)
        // the formatted tree too (r15): operator list + per-node details
        // (PushedFilters, ReadSchema, join strategy/build side) — the
        // artifact plans/r15/<query>_{before,after}.txt commits
        println(s"---- $name formatted ----")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    } finally spark.stop()
  }
}
