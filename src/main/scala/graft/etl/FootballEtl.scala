package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's end-to-end ETL re-expressed Spark-first (SURVEY.md §2,
  * §7.2 step 1): CSV scan with explicit schema → SQL identity projection →
  * surrogate keys → FIFA filter → NaN scrub → (intended) fill + case
  * normalization → multi-format date parse → canonical casts → star split.
  *
  * Two surrogate-key modes (SURVEY.md §7.4.1):
  *  - faithful: `monotonically_increasing_id()+k` — partition-dependent,
  *    exactly the reference's semantics (spark_etl_job.py:46-47);
  *  - deterministic: dense ids over the natural order (date, teams) —
  *    oracle-checkable and stable under repartitioning, computed by
  *    Scale.denseIds (range-partition + per-partition offsets) so no
  *    stage ever funnels into a single task.
  */
object FootballEtl {

  val fifaTournament = "FIFA World Cup"

  /** S1/S2: schema'd permissive CSV scan + temp-view registration. */
  def ingest(spark: SparkSession, csvPath: String): DataFrame = {
    val df = spark.read
      .schema(Schemas.footballRaw)
      .option("header", true)
      .option("mode", "PERMISSIVE")
      .csv(csvPath)
    df.createOrReplaceTempView("football_stats")
    // P1: identity projection through the SQL parser, as the reference does
    spark.sql("select * from football_stats")
  }

  /** The cleaning chain F1–F6 with the *intended* semantics of the
    * reference's no-op-bug section behind a flag (SURVEY.md §7.4.3). */
  def clean(df: DataFrame, applyIntended: Boolean = false): DataFrame = {
    val scrubbed = Clean.nanToNull(df,
      Seq("home_score", "away_score")) // isnan only applies to floating cols; no-op here as in ref
    val filled =
      if (applyIntended)
        Clean.normalizeCase(
          Clean.fillDefaults(scrubbed),
          Seq("home_team", "away_team", "tournament", "city", "country"))
      else scrubbed
    filled
      .withColumn("date", Clean.parseDateMulti(col("date")))
      .withColumn("home_score", col("home_score").cast("int"))
      .withColumn("away_score", col("away_score").cast("int"))
      .withColumn("neutral", col("neutral").cast("boolean"))
  }

  /** P4: the FIFA World Cup equality filter. */
  def filterFifa(df: DataFrame): DataFrame =
    df.filter(col("tournament") === fifaTournament)

  /** P2 faithful: partition-dependent surrogate keys, ids differ by the
    * constant 4 per row exactly like the reference. */
  def withSurrogateKeysFaithful(df: DataFrame): DataFrame =
    df.withColumn("date_id", (monotonically_increasing_id() + 1).cast("long"))
      .withColumn("game_id", (monotonically_increasing_id() + 5).cast("long"))

  /** P2 deterministic: dense ids over the natural key via
    * [[graft.operators.Scale.denseIds]] (range-partition + zipWithIndex) —
    * same values as `row_number().over(Window.orderBy(...))` on a unique
    * key, but with no single-partition global sort. */
  def withSurrogateKeysDeterministic(df: DataFrame): DataFrame =
    graft.operators.Scale
      .denseIds(df, "date_id", Seq("date", "home_team", "away_team", "tournament"))
      .withColumn("game_id", (col("date_id") + 4).cast("long"))

  /** P5: the star split — fact + two (degenerate, 1:1:1) dimensions
    * (SURVEY.md §1.4). */
  def starSchema(results: DataFrame): Map[String, DataFrame] = Map(
    "results" -> results.select("date_id", "date", "game_id", "home_team",
      "away_team", "home_score", "away_score", "tournament", "city",
      "country", "neutral"),
    "fifa_fact" -> results.select("date_id", "game_id", "home_score", "away_score"),
    "date_dim" -> results.select("date_id", "date"),
    "team_loc_dim" -> results.select("game_id", "home_team", "away_team",
      "tournament", "city", "country", "neutral"))

  /** Full pipeline: ingest → clean → filter → keys → split. No caching
    * here — single-sink consumers (most queries) would pay columnar-cache
    * GC for nothing (measured net loss in the bench JVM);
    * [[runAndWrite]], which genuinely fans out to 4 sinks, caches and
    * unpersists around its writes. */
  def run(spark: SparkSession, csvPath: String,
          deterministicKeys: Boolean = true,
          applyIntended: Boolean = false): Map[String, DataFrame] = {
    val cleaned = filterFifa(clean(ingest(spark, csvPath), applyIntended))
    val keyed =
      if (deterministicKeys) withSurrogateKeysDeterministic(cleaned)
      else withSurrogateKeysFaithful(cleaned)
    starSchema(keyed)
  }

  /** O2/O3/O6 + F11: the orchestrated multi-sink pipeline — the engine
    * analog of the reference DAG's 4 parallel warehouse loads
    * (spark-bq-dag.py:255-261) with the date-stamped output paths of
    * spark_etl_job.py:80-86. All 4 star outputs are written concurrently
    * (each write is its own Spark job; the scheduler interleaves their
    * stages across the executor pool) under `<outBase>/<runDate>/<name>`;
    * the keyed frame is cached for the fan-out so scan+clean runs once,
    * not 4×, and unpersisted once every sink is durable. Returns
    * name → written path. */
  def runAndWrite(spark: SparkSession, csvPath: String, outBase: String,
                  runDate: java.time.LocalDate = java.time.LocalDate.now(),
                  deterministicKeys: Boolean = true,
                  applyIntended: Boolean = false): Map[String, String] = {
    val cleaned = filterFifa(clean(ingest(spark, csvPath), applyIntended))
    val keyed =
      if (deterministicKeys) withSurrogateKeysDeterministic(cleaned)
      else withSurrogateKeysFaithful(cleaned)
    val cached = keyed.cache()
    try {
      val star = starSchema(cached)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val writes = star.toSeq.map { case (name, df) =>
        val path = s"$outBase/$runDate/$name"
        Future { df.write.mode("overwrite").parquet(path); name -> path }
      }
      // lift to Try so ALL sinks settle before we return (or unpersist):
      // a fail-fast Await.result(Future.sequence(...)) would leave the
      // sibling writes running in the background against an unpersisted
      // frame — re-scanning the source per sink, the exact 4× the cache
      // exists to prevent. First failure rethrown after the fan-in.
      val settled = Await.result(
        Future.sequence(writes.map(_.transform(scala.util.Success(_)))),
        Duration.Inf)
      settled.collectFirst { case scala.util.Failure(e) => e }.foreach(throw _)
      settled.collect { case scala.util.Success(kv) => kv }.toMap
    } finally cached.unpersist()
  }

  /** S3: single-file CSV sink preserving the reference's output shape
    * (coalesce(1) = narrow CoalesceExec, no shuffle). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", true).csv(path)

  /** The reference's GLM model data (ml_project.py:195-205): ALL cleaned
    * matches (no FIFA filter) with the F9 recency weight, stacked
    * home/away so each match contributes one row per side —
    * (team, opponent, goals, weight). Stacked via explode-of-structs
    * rather than UNION ALL of two projections: a union's branches each
    * scan + parse the CSV; the explode is one scan, one generator — the
    * same multiset (oracle-verified against a UNION ALL in DuckDB). */
  def modelData(spark: SparkSession, csvPath: String): DataFrame =
    clean(ingest(spark, csvPath))
      .withColumn("weight", Clean.recencyWeight(col("date"), col("tournament")))
      .select(explode(array(
        struct(col("home_team").as("team"), col("away_team").as("opponent"),
          col("home_score").as("goals"), col("weight")),
        struct(col("away_team").as("team"), col("home_team").as("opponent"),
          col("away_score").as("goals"), col("weight")))).as("side"))
      .select(col("side.team"), col("side.opponent"),
        col("side.goals"), col("side.weight"))

  /** Typed record for the cleaned layer (SURVEY.md §1.5): scores/neutral
    * are Options — the permissive scan can null them. */
  case class MatchResult(date: java.sql.Date, home_team: String,
      away_team: String, home_score: Option[Int], away_score: Option[Int],
      tournament: String, city: String, country: String,
      neutral: Option[Boolean])

  /** The cleaned layer as a typed Dataset — compile-time field access for
    * downstream code; the DataFrame plan underneath is identical (Catalyst
    * strips the serialization boundary for column-expressible work). */
  def typedResults(spark: SparkSession, csvPath: String): org.apache.spark.sql.Dataset[MatchResult] = {
    import spark.implicits._
    clean(ingest(spark, csvPath)).as[MatchResult]
  }
}
