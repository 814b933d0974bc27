package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Source/sink layer beyond the parquet testdata: schema'd CSV and
  * JSON-lines, with the reference's declare-never-infer discipline
  * (SURVEY.md §1.2) and explicit malformed-row policy.
  *
  * PERMISSIVE + a corrupt-record column is the 100 TB default: a bad row
  * becomes data you can route to a quarantine sink instead of a failed
  * 6-hour job; FAILFAST is for the strict warehouse boundary the
  * reference enforces with max_bad_records=0. */
object Sources {

  /** Schema'd CSV scan; `strict=false` = PERMISSIVE with the malformed
    * source line captured in `_corrupt_record`. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              strict: Boolean = false): DataFrame =
    if (strict)
      spark.read.schema(schema).option("header", true)
        .option("mode", "FAILFAST").csv(path)
    else
      spark.read
        .schema(schema.add(StructField("_corrupt_record", StringType)))
        .option("header", true)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)

  /** Schema'd JSON-lines scan (same policy knobs). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(StructField("_corrupt_record", StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Splits a PERMISSIVE read into (clean, quarantine) — the route-don't-
    * fail pattern. The input is cached first: Spark refuses corrupt-
    * record-only queries against raw file scans (the parsed result must be
    * materialized once — [UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN]). */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val cached = df.cache()
    val bad = cached.filter(col("_corrupt_record").isNotNull)
    val good = cached.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    (good, bad)
  }

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Schema-evolution parquet scan: daily increments that GAINED columns
    * (the WRITE_APPEND reality of a long-lived ingest path) read as one
    * table — mergeSchema unions the footers, old files yield null for
    * columns they predate. Off by default in Spark because footer-merging
    * costs a pass over file metadata; turn it on per-read at the
    * evolution boundary only, not globally. */
  def readParquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", true).parquet(path)

  /** ORC scan — the other columnar format a warehouse migration brings;
    * same pushdown/pruning machinery as parquet (predicate pushdown via
    * ORC searchArguments, column pruning, vectorized read). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header).csv(path)
}
