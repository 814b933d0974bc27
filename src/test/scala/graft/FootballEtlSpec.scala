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

  test("typed cleaned layer: Dataset[MatchResult] with typed lambdas") {
    val ds = FootballEtl.typedResults(spark, csv)
    assert(ds.count() == 41586)
    // typed filter — compile-time field access on the case class
    assert(ds.filter(_.tournament == FootballEtl.fifaTournament).count() == 900)
    val m = ds.head()
    assert(m.home_team.nonEmpty && m.date != null)
  }
}
