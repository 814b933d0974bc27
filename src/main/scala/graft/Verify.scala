package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Single-SF mode (`Verify <sfDir> <outDir> [name...]`) is the driver's
  * contract. Multi-SF mode (`Verify <sfA,sfB,sfC> <outDir> [--doubles-only]
  * [name...]`) dumps one subdir per SF (each with its own substituted
  * oracle_sql.json) so `tools/oracle_check.py` certifies the same queries
  * at every scale — the float-hazard sweep: `--doubles-only` restricts to
  * queries whose RESULT schema carries floating-point columns (inspected
  * from the lazy plan, nothing executed), the only place a
  * passes-at-sf0.01-only rounding hazard can hide.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfArg, outDir) = args.take(2)
    val flags = args.drop(2).filter(_.startsWith("--")).toSet
    val only: Set[String] = args.drop(2).filterNot(_.startsWith("--")).toSet
    val doublesOnly = flags("--doubles-only")
    val sfDirs = sfArg.split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def hasFloat(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasFloat(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasFloat(a.elementType)
      case m: org.apache.spark.sql.types.MapType => hasFloat(m.keyType) || hasFloat(m.valueType)
      case _ => false
    }

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    def dump(sfDir: String, dest: String): Unit = {
      new java.io.File(dest).mkdirs()
      val selected = SparkEntry.queries
        .filter { case (name, _) => only.isEmpty || only(name) }
      selected.foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          if (!doublesOnly || df.schema.fields.exists(f => hasFloat(f.dataType)))
            df.coalesce(1).write.mode("overwrite").parquet(s"$dest/$name")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
      // __SF_DIR__ → the actual scale-factor dir: lets an oracle address
      // the parquet FILE (parquet_metadata needs a constant path) — the
      // driver's DuckDB run sees only the substituted SQL.
      val json = SparkEntry.oracleSql
        .map { case (k, v) => s"${q(k)}: ${q(v.replace("__SF_DIR__",
          new java.io.File(sfDir).getAbsolutePath))}" }
        .mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$dest/oracle_sql.json"), json)
    }

    if (sfDirs.length == 1) dump(sfDirs.head, outDir)
    else sfDirs.foreach { sf =>
      dump(sf, s"$outDir/${new java.io.File(sf).getName}")
    }
    spark.stop()
  }
}
