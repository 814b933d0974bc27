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
    // warm-up: JIT + codegen + parquet footer caches + spark.ml class
    // loading, outside the timers. The two heaviest queries are included
    // because their cold-start (codegen of the wide shingling/one-hot
    // expressions) is 2-3× their steady state and would otherwise
    // dominate run-to-run variance (measured: jaccard 9.1 s cold,
    // 3.1-3.9 s warm).
    try {
      Seq("q1_agg", "q_knn_brute", "q_text_stats", "q_value_counts",
          "q_dedup_jaccard", "q_glm_poisson",
          // 64 per-row minhash lambdas / ImageIO / AudioSystem: codegen +
          // JIT + codec-registry cold start measured 2-8x steady state
          "q_dedup_incremental", "q_image_decode", "q_audio_decode")
        .foreach(q => SparkEntry.queries.get(q).foreach(fn => materialize(fn(spark, sfDir))))
    } catch { case _: Throwable => () }
    // a crashing query must surface as an error, NOT as its
    // time-to-failure (which would let a regression that breaks a query
    // *improve* the bench total): failures are excluded from the timing
    // map and totals and reported in a separate "errors" object
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { materialize(fn(spark, sfDir)); None } catch {
        case t: Throwable =>
          Some(Option(t.getMessage).getOrElse(t.getClass.getName)
            .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200))
      }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val ok = results.collect { case (k, v, None) => k -> v }
    val qs = ok.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"$k\":\"$e\"" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    // "materialization" documents the timing methodology change from r1
    // (count(), which let Catalyst elide final sorts) to the noop write
    // (full plan incl. sorts) — totals are not directly comparable to r1
    // n_errors rides next to the total so a consumer comparing "value"
    // across runs can't mistake a broken-query drop for a speedup
    // without ignoring an explicit failure count
    val nErr = results.count(_._3.isDefined)
    val json = s"""{"metric":"total","value":$total,"unit":"sec","n_errors":$nErr,"queries":$qs,"errors":$errs,"sf":"$sfDir","materialization":"noop-write"}"""
    println(json)
    // Stdout of this run may be tail-truncated by the harness that
    // launched it; the on-disk copy keeps the complete per-query map
    // available for cross-round diffing regardless.
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
