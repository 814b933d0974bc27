package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cleaning transforms — the reference ETL's scalar surface (SURVEY.md
  * §2.8, F1–F6), re-expressed as pure `Column => Column` / `DataFrame =>
  * DataFrame` compositions of built-ins so everything stays inside
  * whole-stage codegen. No UDFs.
  */
object Clean {

  /** The reference's 4-format date-parse order
    * (/root/reference/spark_etl_job.py:33-34). */
  val dateFormats: Seq[String] =
    Seq("MM/dd/yyyy", "yyyy-MM-dd", "dd-MM-yyyy", "dd/MM/yyyy")

  /** Multi-format date parse (F1): try each format in order, first
    * non-null wins. `try_to_date` (not `to_date`) keeps the
    * null-on-mismatch semantics the coalesce idiom requires even under
    * ANSI mode (SURVEY.md §7.4.2). */
  def parseDateMulti(c: Column, formats: Seq[String] = dateFormats): Column =
    coalesce(formats.map(f => try_to_date(c, f)): _*)

  /** NaN→null scrub (F2, spark_etl_job.py:52-55) over numeric columns.
    * `isnan` only applies to floating types; other columns pass through. */
  def nanToNull(df: DataFrame, cols: Seq[String]): DataFrame = {
    val floating = Set("double", "float")
    cols.foldLeft(df) { (d, c) =>
      if (floating.contains(d.schema(c).dataType.typeName))
        d.withColumn(c, when(isnan(col(c)), lit(null)).otherwise(col(c)))
      else d
    }
  }

  /** Null-fill defaults (F3 — the *intended* semantics of the reference's
    * unassigned na.fill at spark_etl_job.py:57-62): booleans→false,
    * numerics→-1, strings→"-1". */
  def fillDefaults(df: DataFrame): DataFrame = {
    val byType = df.schema.fields.groupBy(_.dataType.typeName)
    val d1 = byType.get("boolean").map(fs => df.na.fill(false, fs.map(_.name))).getOrElse(df)
    val numeric = Seq("integer", "long", "double", "float", "short", "byte")
    val numCols = df.schema.fields.filter(f => numeric.contains(f.dataType.typeName)).map(_.name)
    val d2 = if (numCols.nonEmpty) d1.na.fill(-1, numCols) else d1
    val strCols = df.schema.fields.filter(_.dataType.typeName == "string").map(_.name)
    if (strCols.nonEmpty) d2.na.fill("-1", strCols) else d2
  }

  /** Case normalization (F4/F5 intent, spark_etl_job.py:65-68 + pptx
    * slide 8): lowercase then title-case each listed string column. */
  def normalizeCase(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, initcap(lower(col(c)))))

  /** Canonicalizing casts (F6, spark_etl_job.py:72). */
  def castColumns(df: DataFrame, casts: Map[String, String]): DataFrame =
    casts.foldLeft(df) { case (d, (c, t)) => d.withColumn(c, col(c).cast(t)) }

  /** F9 — the reference's model recency weight
    * (/root/reference/ml_project.py:191-199): base weight 1 for
    * tournaments containing "Cup" or "Euro", else 100; then
    * 1 / ((2019 − year(date)) · base). Faithful to the pandas float
    * semantics at the edges: a 2019 match divides by zero → +Infinity,
    * a post-2019 match yields a negative weight (both occur in the
    * dataset; the GLM fit filters to finite positive weights). All-double
    * IEEE arithmetic so the DuckDB oracle matches bit-exactly. */
  def recencyWeight(date: Column, tournament: Column): Column = {
    val base = when(tournament.contains("Cup") || tournament.contains("Euro"),
      lit(1)).otherwise(lit(100))
    val denom = ((lit(2019) - year(date)) * base).cast("double")
    // ANSI mode errors on x/0 even for doubles; the pandas semantics this
    // reproduces is IEEE 1/0 → +Infinity, so guard the zero case
    when(denom === 0.0, lit(Double.PositiveInfinity))
      .otherwise(lit(1.0) / denom)
  }
}
