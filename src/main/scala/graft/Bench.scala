package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared helpers for the two benchmark mains. */
private[graft] object BenchUtil {
  /** Full JSON string escape — quote, backslash, and ALL control chars
    * (< 0x20). Mirrors Verify's `q()`: an exception message carrying \b
    * or a raw control byte must not produce invalid JSON and silently
    * zero a round's bench output. */
  def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def errString(t: Throwable): String =
    jsonEscape(Option(t.getMessage).getOrElse(t.getClass.getName).take(200))
}

object Bench {
  /** Materialize the way Verify does: a noop-format write executes the
    * FULL physical plan — including final sorts and exchanges that a
    * `count()` would let Catalyst elide — without any sink I/O, so timings
    * reflect what a consumer of the result actually pays. */
  private def materialize(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  /** Queries whose first timed run exceeds this get two more runs and
    * report the median: single-shot timings on the heavy set are ±2×
    * noisy at local[32] (same session measured q_dedup_clusters at both
    * 8.2 s and 4.1 s), which swamps real regressions. The sub-second
    * tail stays single-shot to bound wall time — its absolute noise is
    * correspondingly sub-second. */
  private val medianThresholdSec = 1.0

  /** Box-state provenance (r14, VERDICT r13 task 3): the r13 +24%
    * headline was box-state (probe-order page-cache thrash), not code,
    * and cost a judge-session to adjudicate. Record 1-min load and
    * page-cache residency AT BENCH START plus an optional operator note
    * (SPARK_GRAFT_BENCH_NOTE, e.g. "idle-first, pre-probe") so the next
    * cross-round comparison carries its own context. Best-effort: on a
    * box without /proc the fields are null, never a crash. */
  private def boxState(): String = {
    def readNum(path: String, pick: Iterator[String] => Option[Double]): Option[Double] =
      try {
        val src = scala.io.Source.fromFile(path)
        try pick(src.getLines()) finally src.close()
      } catch { case _: Throwable => None }
    val load1 = readNum("/proc/loadavg",
      _.nextOption().flatMap(_.split("\\s+").headOption).flatMap(_.toDoubleOption))
    val cachedGib = readNum("/proc/meminfo",
      _.find(_.startsWith("Cached:")).flatMap(_.split("\\s+").lift(1))
        .flatMap(_.toDoubleOption).map(_ / 1048576.0))
    val note = sys.env.get("SPARK_GRAFT_BENCH_NOTE")
      .map(n => "\"" + BenchUtil.jsonEscape(n) + "\"").getOrElse("null")
    // Locale.ROOT (r15, ADVICE): f"$x%.2f" uses the JVM default locale
    // — a comma-decimal locale (de_DE) would emit "6,10" and corrupt
    // the JSON line the driver parses. Match the locale-independent
    // Double.toString used elsewhere in the line.
    val fmt = (v: Option[Double]) => v
      .map(x => String.format(java.util.Locale.ROOT, "%.2f", Double.box(x)))
      .getOrElse("null")
    s"""{"loadavg1":${fmt(load1)},"page_cache_gib":${fmt(cachedGib)},"note":$note}"""
  }

  def main(args: Array[String]): Unit = {
    // optional trailing names restrict the run for local iteration; the
    // driver passes none and gets the full registry
    val only: Set[String] = args.toSet
    // SPARK_GRAFT_BENCH_RUNS (r13): run-count override for manual
    // hour-class scale probes (a 3×-repeated 500 s sf100 query buys
    // little statistical power for 25 minutes of box time). Validated
    // ONCE here (r14, ADVICE): inside the per-query try a malformed
    // value was caught and misreported as a query failure, and <= 0
    // silently disabled the median-of-N repeat.
    val nRuns = sys.env.get("SPARK_GRAFT_BENCH_RUNS") match {
      case None => 3
      case Some(v) => v.toIntOption match {
        case Some(n) if n >= 1 => n
        case _ => sys.error(
          s"SPARK_GRAFT_BENCH_RUNS must be a positive integer, got '$v'")
      }
    }
    val provenance = boxState()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle-partition override for scale-factor sweeps (r12). Measured
    // outcome of the r11 "pinned-partition" hypothesis (PLANS.md r12): the
    // sf10 graph-trio over-linear residue was MEMORY starvation, not sort
    // depth — partitions ∝ SF at fixed heap made the trio slower (3200:
    // harmonic 125→236 s) or OOM (320/3200: kcore), while heap ∝ SF at the
    // pinned 32 partitions (SPARK_DRIVER_MEM=64g) dropped every decade step
    // to ≤ linear (harmonic 4.1×, pagerank 5.0×, kcore 5.0× min-of-3). A
    // real cluster scales MEMORY with data (more executors); this override
    // plus SPARK_DRIVER_MEM lets the sweep emulate either axis.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JIT + codegen + parquet footer caches + spark.ml class
    // loading, outside the timers. The two heaviest queries are included
    // because their cold-start (codegen of the wide shingling/one-hot
    // expressions) is 2-3× their steady state and would otherwise
    // dominate run-to-run variance (measured: jaccard 9.1 s cold,
    // 3.1-3.9 s warm).
    val warmups =
      if (only.nonEmpty) only.toSeq // restricted run: warm exactly the timed set
      else Seq("q1_agg", "q_knn_brute", "q_text_stats", "q_value_counts",
        "q_dedup_jaccard", "q_glm_poisson",
        // 64 per-row minhash lambdas / ImageIO / AudioSystem: codegen +
        // JIT + codec-registry cold start measured 2-8x steady state
        "q_dedup_incremental", "q_image_decode", "q_audio_decode")
    warmups
      .foreach { q =>
        // a failed warm-up must be VISIBLE (it degrades every subsequent
        // timing) but not abort the run — per-query catch, named warning
        try SparkEntry.queries.get(q).foreach(fn => materialize(fn(spark, sfDir)))
        catch { case t: Throwable =>
          System.err.println(s"[bench] WARM-UP FAILED for $q: ${t.getMessage}")
        }
      }
    // a crashing query must surface as an error, NOT as its
    // time-to-failure (which would let a regression that breaks a query
    // *improve* the bench total): failures are excluded from the timing
    // map and totals and reported in a separate "errors" object
    val results = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      try {
        def once(): Double = {
          // full GC before the timer: heap garbage left by the PREVIOUS
          // query otherwise lands as collection pauses inside THIS one's
          // window (r6 measured 3-13x med/min spreads on queries following
          // heavy ones — q_model_data 2.1 s min vs 27.7 s median). The
          // pause moves outside the timer; measured work stays identical.
          System.gc()
          val t0 = System.nanoTime()
          materialize(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        val t1 = once()
        val times =
          if (t1 >= medianThresholdSec && nRuns > 1)
            (t1 +: Seq.fill(nRuns - 1)(once())).sorted
          else Seq(t1)
        (name, Some(times), Option.empty[String])
      } catch {
        case t: Throwable => (name, None, Some(BenchUtil.errString(t)))
      }
    }
    val ok = results.collect { case (k, Some(times), None) => (k, times) }
    // headline per-query time = median (robust to a single outlier run);
    // "mins" rides alongside because bench noise is strictly additive
    // (interference only ever ADDS time), making min-of-3 the more
    // stable statistic for cross-round regression comparison
    val qs = ok.map { case (k, ts) => s"\"" + k + "\":" + ts(ts.size / 2) }
      .mkString("{", ",", "}")
    val mins = ok.map { case (k, ts) => s"\"" + k + "\":" + ts.head }
      .mkString("{", ",", "}")
    val runs = ok.map { case (k, ts) => s"\"" + k + "\":" + ts.size }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"$k\":\"$e\"" }
      .mkString("{", ",", "}")
    val total = ok.map { case (_, ts) => ts(ts.size / 2) }.sum
    // "materialization" documents the timing methodology change from r1
    // (count(), which let Catalyst elide final sorts) to the noop write
    // (full plan incl. sorts) — totals are not directly comparable to r1
    // n_errors rides next to the total so a consumer comparing "value"
    // across runs can't mistake a broken-query drop for a speedup
    // without ignoring an explicit failure count
    val nErr = results.count(_._3.isDefined)
    val json = s"""{"metric":"total","value":$total,"unit":"sec","n_errors":$nErr,"queries":$qs,"mins":$mins,"runs":$runs,"errors":$errs,"sf":"$sfDir","box_state":$provenance,"materialization":"noop-write","timing":"median-of-3 for queries >= ${medianThresholdSec}s, single-shot below; mins = fastest run"}"""
    println(json)
    // The launching harness captures only a TAIL WINDOW of stdout; the
    // full per-query line above is tens of KB, so on its own it is
    // guaranteed to arrive truncated (= unparseable) — r5–r7 all
    // recorded `parsed: null`. Emit a second, complete, SHORT summary
    // line LAST so the tail always contains one whole JSON object; the
    // full map lives in target/bench.json.
    // a compact headline-queries map keeps the line schema-compatible
    // with the full one ("queries" present) while staying well inside
    // any plausible tail window
    val headline = Seq("q1_agg", "q_dedup_jaccard", "q_record_linkage",
        "q_try_arithmetic", "q_knn_brute", "q_cc_bigstar",
        // r16 (VERDICT r15 task 3, additions only — timers untouched):
        // the heavy-tail queries the optimization rounds actually move,
        // so the round-over-round summary can see them
        "q_harmonic_centrality", "q_label_prop", "q_gif_frames",
        "q_curate_full", "q_bfs_layers", "q_link_predict", "q_pagerank",
        "q_kcore", "q_knn_ivfpq", "q_simhash_portable")
      .flatMap(k => ok.find(_._1 == k))
      .map { case (k, ts) => s"\"" + k + "\":" + ts(ts.size / 2) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_errors":$nErr,"n_queries":${ok.size},"queries":$headline,"sf":"$sfDir","box_state":$provenance,"detail":"target/bench.json"}""")
    // Stdout of this run may be tail-truncated by the harness that
    // launched it; the on-disk copy keeps the complete per-query map
    // available for cross-round diffing regardless. Restricted runs are
    // for iteration — don't clobber the full-run artifact (the judge's
    // evidence) with a partial query map (r12; BenchScaling already
    // guards the same way).
    if (only.isEmpty) {
      val out = java.nio.file.Paths.get("target/bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8")): Unit
    }
    spark.stop()
  }
}
