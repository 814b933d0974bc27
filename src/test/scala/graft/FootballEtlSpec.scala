package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.{Clean, FootballEtl}

/** Golden-output tests on the reference's own dataset (SURVEY.md §5.2):
  * measured invariants from BASELINE.md — 41,586 raw rows, 900 FIFA rows,
  * 100% date parse across the 41,459/127 format split, key offset 4. */
class FootballEtlSpec extends AnyFunSuite with SharedSpark {

  private val csv = "/root/reference/football_results.csv"
  private def available = new java.io.File(csv).exists()

  test("raw scan row count and schema") {
    assume(available)
    val raw = FootballEtl.ingest(spark, csv)
    assert(raw.count() == 41586L)
    assert(raw.schema.fieldNames.toSeq == Seq("date", "home_team", "away_team",
      "home_score", "away_score", "tournament", "city", "country", "neutral"))
  }

  test("multi-format date parse: zero nulls on the full file") {
    assume(available)
    val cleaned = FootballEtl.clean(FootballEtl.ingest(spark, csv))
    assert(cleaned.filter(col("date").isNull).count() == 0L)
  }

  test("FIFA filter yields 900 rows; star outputs consistent") {
    assume(available)
    val star = FootballEtl.run(spark, csv, deterministicKeys = true)
    assert(star("results").count() == 900L)
    assert(star("fifa_fact").count() == 900L)
    assert(star("date_dim").count() == 900L)
    assert(star("team_loc_dim").count() == 900L)
    // deterministic keys: game_id - date_id == 4 on every row (the
    // reference's constant-offset invariant, FIXTURES.md A.2)
    assert(star("results").filter(col("game_id") - col("date_id") =!= 4).count() == 0L)
  }

  test("faithful surrogate keys also hold the offset-4 invariant") {
    assume(available)
    val star = FootballEtl.run(spark, csv, deterministicKeys = false)
    assert(star("results").filter(col("game_id") - col("date_id") =!= 4).count() == 0L)
  }

  test("parseDateMulti handles all four reference formats, nulls garbage") {
    import spark.implicits._
    val rows = Seq("03/25/1994", "1994-03-25", "25-03-1994", "25/03/1994", "garbage", "1994-25-03")
    val parsed = rows.toDF("d")
      .select(date_format(Clean.parseDateMulti($"d"), "yyyy-MM-dd").as("p"))
      .collect().map(r => Option(r.getString(0)))
    assert(parsed.take(4).forall(_.contains("1994-03-25")))
    assert(parsed(4).isEmpty && parsed(5).isEmpty)
  }

  test("intended cleaning: fill defaults + case normalization") {
    import spark.implicits._
    val df = Seq((Some("x y"), None: Option[String], Some(1)), (None, Some("AB CD"), None))
      .toDF("a", "b", "n")
    val filled = Clean.fillDefaults(df)
    assert(filled.filter($"a".isNull || $"b".isNull || $"n".isNull).count() == 0)
    val normed = Clean.normalizeCase(Seq("hELLo WoRLD").toDF("a"), Seq("a"))
    assert(normed.head().getString(0) == "Hello World")
  }

  test("runAndWrite: 4 parallel sinks at date-stamped paths, cache released") {
    assume(available)
    val base = java.nio.file.Files.createTempDirectory("graft_etl_out").toString
    val day = java.time.LocalDate.of(2026, 1, 15)
    val cacheWasEmpty = spark.sharedState.cacheManager.isEmpty
    val written = FootballEtl.runAndWrite(spark, csv, base, runDate = day)
    assert(written.keySet == Set("results", "fifa_fact", "date_dim", "team_loc_dim"))
    written.foreach { case (name, path) =>
      assert(path == s"$base/2026-01-15/$name", s"path not date-stamped: $path")
      assert(spark.read.parquet(path).count() == 900L, s"$name row count")
    }
    // the fan-out cache must not outlive the pipeline
    if (cacheWasEmpty)
      assert(spark.sharedState.cacheManager.isEmpty, "keyed frame left cached")
  }

  test("runAndWrite: a failing sink surfaces the error and still releases the cache") {
    assume(available)
    val cacheWasEmpty = spark.sharedState.cacheManager.isEmpty
    intercept[Exception] {
      FootballEtl.runAndWrite(spark, csv, "unknownscheme://nope",
        runDate = java.time.LocalDate.of(2026, 1, 15))
    }
    if (cacheWasEmpty)
      assert(spark.sharedState.cacheManager.isEmpty, "cache leaked on failure")
  }

  test("recency weight F9: faithful to 1/((2019-year)*tournament-base)") {
    import spark.implicits._
    val rows = Seq(
      ("2014-07-13", "FIFA World Cup"),   // Cup → base 1, 1/5
      ("2014-07-13", "Friendly"),         // base 100, 1/500
      ("2016-06-10", "UEFA Euro"),        // Euro → base 1, 1/3
      ("2019-06-01", "Copa America"),     // 2019 → ÷0 → +Infinity (Cup? no — base 100 but year hits 0)
      ("2019-07-07", "FIFA World Cup"),   // 2019 Cup → +Infinity
      ("2020-02-01", "Friendly"))         // post-2019 → negative
    val got = rows.toDF("d", "tournament")
      .select(Clean.recencyWeight(to_date($"d"), $"tournament").as("w"))
      .collect().map(_.getDouble(0))
    // driver-side replay of the pandas formula
    def expected(year: Int, t: String): Double = {
      val base = if (t.contains("Cup") || t.contains("Euro")) 1 else 100
      val denom = (2019 - year) * base
      if (denom == 0) Double.PositiveInfinity else 1.0 / denom
    }
    val want = rows.map { case (d, t) => expected(d.take(4).toInt, t) }
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g vs $w") }
    assert(got(3).isPosInfinity && got(4).isPosInfinity)
    assert(got(5) == -0.01)
  }

  test("typed cleaned layer: Dataset[MatchResult] with typed lambdas") {
    val ds = FootballEtl.typedResults(spark, csv)
    assert(ds.count() == 41586)
    // typed filter — compile-time field access on the case class
    assert(ds.filter(_.tournament == FootballEtl.fifaTournament).count() == 900)
    val m = ds.head()
    assert(m.home_team.nonEmpty && m.date != null)
  }
}
