package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory + the
  * training-data-pipeline extensions) to DataFrame builders over a
  * testdata sf directory; `oracleSql` holds the DuckDB-equivalent SQL for
  * every query whose semantics are ANSI-SQL-expressible.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.qStarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.all ++
      graft.queries.Relational2.all ++
      graft.queries.Relational3.all ++
      graft.queries.Relational4.all ++
      graft.queries.Relational5.all ++
      graft.queries.Relational6.all ++
      graft.queries.Relational7.all ++
      graft.queries.Relational8.all ++
      graft.queries.Relational9.all ++
      graft.queries.Text.all ++
      graft.queries.DedupSim.all ++
      graft.queries.Media.all ++
      graft.queries.Ml.all ++
      graft.queries.Graph.all ++
      graft.queries.Events.all ++
      graft.queries.Events2.all ++
      graft.queries.Quality.all ++
      graft.queries.Corpus.all ++
      graft.queries.Corpus2.all ++
      graft.queries.Analytics.all ++
      graft.queries.Analytics2.all ++
      graft.queries.Analytics3.all ++
      graft.queries.Analytics4.all ++
      graft.queries.Analytics5.all ++
      graft.queries.Analytics6.all ++
      graft.queries.Analytics7.all ++
      graft.queries.Analytics8.all ++
      graft.queries.Analytics9.all ++
      graft.queries.Analytics10.all ++
      graft.queries.Analytics11.all ++
      graft.queries.Analytics12.all ++
      graft.queries.Analytics13.all ++
      graft.queries.Analytics14.all ++
      graft.queries.Analytics15.all ++
      graft.queries.Analytics16.all ++
      graft.queries.Analytics17.all ++
      graft.queries.Analytics18.all ++
      graft.queries.Analytics19.all ++
      graft.queries.Analytics20.all ++
      graft.queries.Analytics21.all ++
      graft.queries.Analytics22.all ++
      graft.queries.Analytics23.all ++
      graft.queries.Analytics24.all ++
      graft.queries.Analytics25.all ++
      graft.queries.Analytics26.all ++
      graft.queries.Analytics27.all ++
      graft.queries.Analytics28.all ++
      graft.queries.Analytics29.all ++
      graft.queries.Analytics30.all ++
      graft.queries.Analytics31.all ++
      graft.queries.Analytics32.all ++
      graft.queries.Analytics33.all ++
      graft.queries.Analytics34.all ++
      graft.queries.Analytics35.all ++
      graft.queries.Analytics36.all ++
      graft.queries.Analytics37.all ++
      graft.queries.Analytics38.all ++
      graft.queries.Analytics39.all ++
      graft.queries.Analytics40.all ++
      graft.queries.Analytics41.all ++
      graft.queries.Analytics42.all ++
      graft.queries.Analytics43.all ++
      graft.queries.Analytics44.all ++
      graft.queries.Analytics45.all ++
      graft.queries.Analytics46.all ++
      graft.queries.Analytics47.all ++
      graft.queries.Analytics48.all ++
      graft.queries.Analytics49.all ++
      graft.queries.Analytics50.all ++
      graft.queries.Analytics51.all ++
      graft.queries.Analytics52.all ++
      graft.queries.Analytics53.all ++
      graft.queries.StreamingQ.all ++
      graft.queries.Warehouse.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Relational2.oracles ++
      graft.queries.Relational3.oracles ++
      graft.queries.Relational4.oracles ++
      graft.queries.Relational5.oracles ++
      graft.queries.Relational6.oracles ++
      graft.queries.Relational7.oracles ++
      graft.queries.Relational8.oracles ++
      graft.queries.Relational9.oracles ++
      graft.queries.Text.oracles ++
      graft.queries.DedupSim.oracles ++
      graft.queries.Media.oracles ++
      graft.queries.Ml.oracles ++
      graft.queries.Graph.oracles ++
      graft.queries.Events.oracles ++
      graft.queries.Events2.oracles ++
      graft.queries.Quality.oracles ++
      graft.queries.Corpus.oracles ++
      graft.queries.Corpus2.oracles ++
      graft.queries.Analytics.oracles ++
      graft.queries.Analytics2.oracles ++
      graft.queries.Analytics3.oracles ++
      graft.queries.Analytics4.oracles ++
      graft.queries.Analytics5.oracles ++
      graft.queries.Analytics6.oracles ++
      graft.queries.Analytics7.oracles ++
      graft.queries.Analytics8.oracles ++
      graft.queries.Analytics9.oracles ++
      graft.queries.Analytics10.oracles ++
      graft.queries.Analytics11.oracles ++
      graft.queries.Analytics12.oracles ++
      graft.queries.Analytics13.oracles ++
      graft.queries.Analytics14.oracles ++
      graft.queries.Analytics15.oracles ++
      graft.queries.Analytics16.oracles ++
      graft.queries.Analytics17.oracles ++
      graft.queries.Analytics18.oracles ++
      graft.queries.Analytics19.oracles ++
      graft.queries.Analytics20.oracles ++
      graft.queries.Analytics21.oracles ++
      graft.queries.Analytics22.oracles ++
      graft.queries.Analytics23.oracles ++
      graft.queries.Analytics24.oracles ++
      graft.queries.Analytics25.oracles ++
      graft.queries.Analytics26.oracles ++
      graft.queries.Analytics27.oracles ++
      graft.queries.Analytics28.oracles ++
      graft.queries.Analytics29.oracles ++
      graft.queries.Analytics30.oracles ++
      graft.queries.Analytics31.oracles ++
      graft.queries.Analytics32.oracles ++
      graft.queries.Analytics33.oracles ++
      graft.queries.Analytics34.oracles ++
      graft.queries.Analytics35.oracles ++
      graft.queries.Analytics36.oracles ++
      graft.queries.Analytics37.oracles ++
      graft.queries.Analytics38.oracles ++
      graft.queries.Analytics39.oracles ++
      graft.queries.Analytics40.oracles ++
      graft.queries.Analytics41.oracles ++
      graft.queries.Analytics42.oracles ++
      graft.queries.Analytics43.oracles ++
      graft.queries.Analytics44.oracles ++
      graft.queries.Analytics45.oracles ++
      graft.queries.Analytics46.oracles ++
      graft.queries.Analytics47.oracles ++
      graft.queries.Analytics48.oracles ++
      graft.queries.Analytics49.oracles ++
      graft.queries.Analytics50.oracles ++
      graft.queries.Analytics51.oracles ++
      graft.queries.Analytics52.oracles ++
      graft.queries.Analytics53.oracles ++
      graft.queries.StreamingQ.oracles ++
      graft.queries.Warehouse.oracles
}
