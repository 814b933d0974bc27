package graft.etl

import org.apache.spark.sql.types._

/** Explicit schemas applied at every ingest boundary, mirroring the
  * reference's declare-never-infer discipline (SURVEY.md §1.2;
  * /root/reference/spark_etl_job.py:20-31 for the read schema,
  * spark-bq-dag.py:64-232 for the warehouse contracts). */
object Schemas {

  /** Raw football_results read schema — date deliberately String (mixed
    * formats in the raw file, parsed later by Clean.parseDateMulti). */
  val footballRaw: StructType = StructType(Seq(
    StructField("date", StringType),
    StructField("home_team", StringType),
    StructField("away_team", StringType),
    StructField("home_score", IntegerType),
    StructField("away_score", IntegerType),
    StructField("tournament", StringType),
    StructField("city", StringType),
    StructField("country", StringType),
    StructField("neutral", BooleanType)))

  /** Cleaned + keyed results layer (the denormalized 11-column table,
    * spark_etl_job.py:48). */
  val results: StructType = StructType(Seq(
    StructField("date_id", IntegerType),
    StructField("date", DateType),
    StructField("game_id", IntegerType),
    StructField("home_team", StringType),
    StructField("away_team", StringType),
    StructField("home_score", IntegerType),
    StructField("away_score", IntegerType),
    StructField("tournament", StringType),
    StructField("city", StringType),
    StructField("country", StringType),
    StructField("neutral", BooleanType)))
}
