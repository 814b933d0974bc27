package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftExtensions
import graft.multimodal.Multimodal

class ExtensionsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("custom expressions callable from SQL after install") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "poisson_pmf(2, 2.3d) AS p").head()
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - graft.ml.Simulate.poissonPmf(2, 2.3)) < 1e-12)
  }

  test("SQL dot_product over a table matches the Column API") {
    GraftExtensions.install(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      """SELECT vec_id, dot_product(cast(embedding as array<double>),
        |                           cast(embedding as array<double>)) AS d
        |FROM emb_sql ORDER BY vec_id LIMIT 5""".stripMargin).collect()
    val viaCol = graft.similarity.Similarity.prepared(Tables.embeddings(spark, sfDir))
      .select($"vec_id", (col("nrm") * col("nrm")).as("d"))
      .orderBy("vec_id").limit(5).collect()
    viaSql.zip(viaCol).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-9)
    }
  }

  test("sorted_intersect_count: parity with size(array_intersect) on sorted sets") {
    import graft.functions.SortedIntersectCount.sorted_intersect_count
    val rng = new scala.util.Random(13L)
    val rows = (1 to 200).map { _ =>
      val a = Seq.fill(rng.nextInt(20))(rng.nextInt(30).toLong).distinct.sorted
      val b = Seq.fill(rng.nextInt(20))(rng.nextInt(30).toLong).distinct.sorted
      (a, b)
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq(5L), Seq.empty[Long]))
    val df = rows.toDF("a", "b")
      .select(
        sorted_intersect_count($"a", $"b").as("merge_count"),
        size(array_intersect($"a", $"b")).cast("long").as("builtin_count"))
    assert(df.filter($"merge_count" =!= $"builtin_count").count() == 0)
    // SQL registration
    GraftExtensions.install(spark)
    assert(spark.sql(
      "SELECT sorted_intersect_count(array(1L,3L,5L), array(3L,4L,5L))").head().getLong(0) == 2L)
    // analysis-time type contract: int arrays coerce, strings fail cleanly
    assert(spark.sql(
      "SELECT sorted_intersect_count(array(1,2,3), array(2,3,4))").head().getLong(0) == 2L)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT sorted_intersect_count(array('a'), array('a'))").collect()
    }
  }

  test("resize stub: aspect preserved, no-op under bound, payload intact") {
    val media = Multimodal.stubDecode(Multimodal.asMediaTable(
      Tables.documents(spark, sfDir)))
    val resized = Multimodal.resizeStub(media, 128)
    val rows = resized.select(
      col("meta.width"), col("meta.height"), length(col("payload"))).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(0) <= 128 + 1 && r.getInt(1) <= 128 + 1) // int-math slack
      assert(r.getInt(2) > 0)
    }
    // originals under the bound are untouched
    val small = media.filter(col("meta.width") <= 128 && col("meta.height") <= 128)
      .select(col("media_id"), col("meta.width").as("w0"))
    val after = Multimodal.resizeStub(media, 128)
      .select(col("media_id"), col("meta.width").as("w1"))
    val joined = small.join(after, "media_id")
      .filter(col("w0") =!= col("w1")).count()
    assert(joined == 0)
  }
}
