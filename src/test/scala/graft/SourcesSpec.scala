package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources

class SourcesSpec extends AnyFunSuite with SharedSpark {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_src").toString

  test("json-lines round trip preserves values and schema") {
    val dir = tmp()
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value")
    Sources.writeJsonl(ev, dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val back = Sources.readJsonl(spark, dir, schema)
    val (good, bad) = Sources.quarantine(back)
    assert(bad.count() == 0)
    assert(good.count() == ev.count())
    val a = ev.orderBy("event_id").collect()
    val b = good.select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id").collect()
    assert(a.sameElements(b))
  }

  test("csv round trip with explicit schema") {
    val dir = tmp()
    val c = Tables.customer(spark, sfDir)
    Sources.writeCsv(c, dir)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    val (good, bad) = Sources.quarantine(Sources.readCsv(spark, dir, schema))
    assert(bad.count() == 0)
    assert(good.count() == c.count())
  }

  test("orc round trip preserves values and schema") {
    val dir = tmp()
    val c = Tables.customer(spark, sfDir)
    Sources.writeOrc(c, dir)
    val back = Sources.readOrc(spark, dir)
    assert(back.schema == c.schema)
    assert(back.orderBy("c_custkey").collect()
      .sameElements(c.orderBy("c_custkey").collect()))
    // pushdown reaches the ORC scan like parquet
    val plan = back.filter(col("c_custkey") === 7).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,7)]"), plan)
  }

  test("PERMISSIVE csv quarantines malformed rows instead of failing") {
    val dir = tmp()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "data.csv"),
      "id,score\n1,10\n2,notanumber\n3,30\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("score", IntegerType)))
    val (good, bad) = Sources.quarantine(Sources.readCsv(spark, s"$dir/data.csv", schema))
    assert(good.count() == 2)
    assert(bad.count() == 1)
    assert(bad.head().getAs[String]("_corrupt_record").contains("notanumber"))
    // the malformed numeric itself reads as null in the permissive row
    val permissive = Sources.readCsv(spark, s"$dir/data.csv", schema)
    assert(permissive.filter(col("id") === 2 && col("score").isNull).count() == 1)
  }

  test("parquet schema evolution: increments that gained columns merge") {
    import spark.implicits._
    val dir = tmp()
    // day 1 wrote (doc_id, text); day 2's pipeline added lang
    Seq((1L, "alpha")).toDF("doc_id", "text")
      .write.parquet(s"$dir/day=1")
    Seq((2L, "beta", "en")).toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/day=2")
    val merged = Sources.readParquetMerged(spark, dir)
    assert(merged.columns.toSet == Set("doc_id", "text", "lang", "day"))
    val byId = merged.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[String]("lang") == null) // pre-evolution file
    assert(byId(2L).getAs[String]("lang") == "en")
    // default read (no mergeSchema) picks ONE footer and can miss the
    // evolved column — the gotcha readParquetMerged exists to avoid
    val plain = spark.read.parquet(dir)
    assert(plain.count() == 2)
  }

  test("FAILFAST csv throws on malformed rows (the strict boundary)") {
    val dir = tmp()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "data.csv"),
      "id,score\n1,10\n2,notanumber\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("score", IntegerType)))
    val ex = intercept[org.apache.spark.SparkException] {
      Sources.readCsv(spark, s"$dir/data.csv", schema, strict = true).collect()
    }
    // the MALFORMED_RECORD_IN_PARSING error sits in the cause chain under
    // FAILED_READ_FILE
    val messages = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("\n")
    assert(messages.contains("MALFORMED_RECORD_IN_PARSING"), messages)
  }
}
