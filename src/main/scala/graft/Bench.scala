package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  /** Materialize the way Verify does: a noop-format write executes the
    * FULL physical plan — including final sorts and exchanges that a
    * `count()` would let Catalyst elide — without any sink I/O, so timings
    * reflect what a consumer of the result actually pays. */
  private def materialize(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JIT + codegen + parquet footer caches, outside the timers
    try {
      Seq("q1_agg", "q_knn_brute", "q_text_stats", "q_value_counts")
        .foreach(q => SparkEntry.queries.get(q).foreach(fn => materialize(fn(spark, sfDir))))
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { materialize(fn(spark, sfDir)) } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
