package graft

import org.apache.spark.sql.SparkSession

/** Depth-knob probe for [[graft.queries.DedupSim.semdedup]] at an
  * EXPLICIT cluster count g (r14, VERDICT r13 task 6): the registry
  * queries derive g = n/1000, so the fourth-decade claim — at
  * g = 30,000 depth L = 3 does ~364 dots/row while L = 4 stays ~152 —
  * needs a harness that fixes g independently of corpus size. Timing
  * methodology mirrors [[Bench]] (noop-write materialization, System.gc
  * outside the timer, median of N runs).
  *
  * Usage: runMain graft.ProbeSemdedup <sfDir> <g> <levels> [runs]
  */
object ProbeSemdedup {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ProbeSemdedup <sfDir> <g> <levels> [runs]")
    val dir = args(0)
    val g = args(1).toLong
    val levels = args(2).toInt
    val runs = if (args.length > 3) args(3).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.embeddings(spark, dir)
    val b = graft.queries.DedupSim.rootCeil(g, levels)
    // one warm run (JIT + codegen + parquet footers), then timed runs
    def once(): Double = {
      System.gc()
      val t0 = System.nanoTime()
      graft.queries.DedupSim.semdedup(base, g, levels)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    once()
    val times = Seq.fill(runs)(once()).sorted
    println(s"""{"metric":"semdedup_probe","sf":"$dir","g":$g,"levels":$levels,"b":$b,""" +
      s""""median_sec":${times(times.size / 2)},"min_sec":${times.head},"runs":$runs}""")
    spark.stop()
  }
}
