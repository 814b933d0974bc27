package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftExtensions
import graft.multimodal.Multimodal

/** JVM-static probe for [[Multimodal.MediaDecoder.init]] — a lambda
  * field would be serialized per task and its increments lost. */
object FakeInitProbe {
  val count = new java.util.concurrent.atomic.AtomicInteger(0)
}

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

  test("simhash64 reachable from SQL, equals the Column-API expression") {
    GraftExtensions.install(spark)
    val viaSql = spark.sql(
      "SELECT simhash64(array('alpha', 'beta', 'gamma'))").head().getLong(0)
    val viaCol = Seq(Seq("alpha", "beta", "gamma")).toDF("t")
      .select(graft.functions.SimHash64.simhash64($"t")).head().getLong(0)
    assert(viaSql == viaCol)
    assert(viaSql != 0L)
  }

  test("nfc_normalize: composed == decomposed after, SQL-reachable, ASCII untouched") {
    import graft.functions.NfcNormalize.nfc_normalize
    val df = Seq(
      ("cafe\u0301", "caf\u00e9"),   // decomposed vs composed e-acute
      ("A\u030a", "\u00c5"),          // A + combining ring vs composed
      ("plain ascii", "plain ascii")
    ).toDF("a", "b")
      .select(nfc_normalize($"a").as("na"), nfc_normalize($"b").as("nb"), $"a", $"b")
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"NFC forms differ: ${r.getString(0)} vs ${r.getString(1)}")
    }
    // ASCII passes through unchanged (quick-check fast path)
    assert(df.filter($"a" === lit("plain ascii") && $"na" =!= $"a").count() == 0)
    GraftExtensions.install(spark)
    // NB: Spark's chr() is mod-256 (ASCII), so the combining char goes
    // in as a string literal, not chr(769) like the DuckDB oracle uses
    assert(spark.sql("SELECT nfc_normalize('cafe\u0301')").head().getString(0)
      == "caf\u00e9")
    // analysis-time type contract: non-string input fails cleanly
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT nfc_normalize(array(1))").collect()
    }
  }

  test("MediaDecoder SPI: external decoder chains in front, per-partition init runs") {
    // the plug-point an mp3/video codec jar would use: a fake decoder
    // claiming payloads with a magic prefix, chained BEFORE the built-in
    // ImageIO decoder — magic rows route to the fake, real PNGs to
    // ImageIO, garbage to the stub fallback, all in one stage
    object FakeDecoder extends Multimodal.MediaDecoder[Multimodal.DecodedImage] {
      override def init(): Unit = { FakeInitProbe.count.incrementAndGet(); () }
      def decode(id: Long, bytes: Array[Byte]): Option[Multimodal.DecodedImage] =
        if (bytes.length >= 4 && new String(bytes.take(4), "UTF-8") == "FAKE")
          Some(Multimodal.DecodedImage(id, "image/fake-codec",
            77L, 99L, 1L, 0.5, 0.5, 0.5, decoded = true))
        else None
    }
    val ids = Tables.documents(spark, sfDir).select("doc_id").limit(12)
    val pngs = Multimodal.syntheticPngs(spark, ids).filter($"media_id" % 3 === 0)
    val mixed = pngs
      .union(ids.filter($"doc_id" % 3 === 1)
        .select($"doc_id".as("media_id"),
          concat(lit("FAKE".getBytes("UTF-8")), lit("x".getBytes("UTF-8"))).as("payload")))
      .union(ids.filter($"doc_id" % 3 === 2)
        .select($"doc_id".as("media_id"), lit("not media".getBytes("UTF-8")).as("payload")))
    FakeInitProbe.count.set(0)
    val out = Multimodal.decodeWith(spark, mixed,
        Seq(FakeDecoder, Multimodal.ImageIoDecoder), Multimodal.imageStubFallback)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(8))).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, (mediaType, wasDecoded)) =>
      (id % 3) match {
        case 0 => assert(mediaType == "image/decoded" && wasDecoded,
          s"id=$id: PNG must pass THROUGH the fake to ImageIO")
        case 1 => assert(mediaType == "image/fake-codec" && wasDecoded,
          s"id=$id: magic payload must be claimed by the chained decoder")
        case _ => assert(mediaType == "application/octet-stream" && !wasDecoded,
          s"id=$id: garbage must fall back to the stub")
      }
    }
    // init ran on the executors (once per partition, so >= 1 overall);
    // local[*] shares the JVM, making the static probe visible here
    assert(FakeInitProbe.count.get() >= 1, "decoder init() never ran")
  }

  test("real PNG decode: round trip matches a driver-side ImageIO replay") {
    val ids = Tables.documents(spark, sfDir).select("doc_id").limit(50)
    val decoded = Multimodal.decodeImages(spark, Multimodal.syntheticPngs(spark, ids))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(8))).toMap
    assert(decoded.nonEmpty)
    decoded.foreach { case (id, (w, h, channels, meanR, wasDecoded)) =>
      assert(wasDecoded, s"PNG for id=$id fell back to the stub")
      assert(channels == 3L)
      // driver-side replay: independently re-encode and re-decode this id
      val ew = 4 + (id % 60).toInt
      val eh = 4 + ((id * 7) % 60).toInt
      val rgb = ((id * 2654435761L) % 16777216L).toInt
      assert((w, h) == (ew.toLong, eh.toLong), s"id=$id dims")
      val img = new java.awt.image.BufferedImage(
        ew, eh, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until eh).foreach(y => (0 until ew).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      assert(meanR == (((back.getRGB(0, 0) >> 16) & 0xff).toDouble), s"id=$id mean_r")
    }
  }

  test("real WAV decode: samples round-trip (sine RMS = amp/sqrt(2)), garbage falls back") {
    val ids = Tables.documents(spark, sfDir).select("doc_id").limit(40)
    val decoded = Multimodal.decodeAudio(spark, Multimodal.syntheticWavs(spark, ids))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
          r.getBoolean(7))).toMap
    assert(decoded.size == 40)
    decoded.foreach { case (id, (rate, ch, frames, durMs, rms, wasDecoded)) =>
      assert(wasDecoded, s"WAV for id=$id fell back to the stub")
      val eRate = 8000 + (id % 4) * 4000
      val eFrames = (eRate / 100) * (1 + id % 5)
      assert(rate == eRate && ch == 1L && frames == eFrames, s"id=$id metadata")
      assert(durMs == 10.0 * (1 + id % 5), s"id=$id duration")
      // the SAMPLES decoded, not just the header: a 0.5-amplitude sine's
      // RMS is 0.5·32767/√2 ≈ 11586, up to windowing error on the
      // few-cycle clips
      val expected = 0.5 * 32767.0 / math.sqrt(2.0)
      assert(math.abs(rms - expected) / expected < 0.15,
        s"id=$id rms $rms vs ~$expected")
    }
    // per-row fallback on undecodable payloads, mixed with real WAVs
    import spark.implicits._
    val mixed = Multimodal.syntheticWavs(spark, Seq(1L).toDF("doc_id"))
      .union(Seq((99L, "not audio".getBytes("UTF-8"))).toDF("media_id", "payload"))
    val rows = Multimodal.decodeAudio(spark, mixed).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getBoolean(7))
    assert(!rows(99L).getBoolean(7) && rows(99L).getDouble(6) == 0.0)
  }

  test("decode falls back per-row to stub dims on undecodable payloads") {
    val mixed = Multimodal.syntheticPngs(spark,
        Seq(1L, 2L).toDF("doc_id"))
      .union(Seq((99L, "not an image at all".getBytes("UTF-8")))
        .toDF("media_id", "payload"))
    val rows = Multimodal.decodeImages(spark, mixed).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getBoolean(8) && rows(2L).getBoolean(8))
    val garbage = rows(99L)
    assert(!garbage.getBoolean(8))
    val n = "not an image at all".getBytes("UTF-8").length.toLong
    assert(garbage.getLong(2) == 64 + n % 512) // stub width
    assert(garbage.getLong(4) == 0L)           // channels: none decoded
  }

  test("GraftSession.tune wires confs, SQL functions, and the optimizer rule") {
    // snapshot EVERY conf tune mutates — the shared session serves every
    // suite, so a leaked codec/timezone would be order-dependent flake
    val keys = Seq("spark.sql.shuffle.partitions", "spark.sql.session.timeZone",
      "spark.sql.files.maxPartitionBytes", "spark.sql.parquet.compression.codec",
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      val s = GraftSession.tune(spark,
        spark.conf.get("spark.sql.shuffle.partitions").toInt)
      assert(s.conf.get("spark.sql.files.maxPartitionBytes") == (256L << 20).toString)
      assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
      assert(s.sql("SELECT sorted_intersect_count(array(1L,2L), array(2L,3L))")
        .head().getLong(0) == 1L)
      assert(s.experimental.extraOptimizations
        .contains(graft.functions.SortedIntersectRewrite))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("optimizer rule rewrites size(array_intersect) of sorted distinct sets") {
    GraftExtensions.install(spark)
    // spark.range input: literal Seqs would be constant-folded into a
    // LocalRelation before the rule could be observed
    val base = spark.range(3).select(
      array($"id", $"id" * 2 + 1, lit(4L)).as("a"),
      array($"id" + 1, lit(4L)).as("b"))
    val df = base.select(size(array_intersect(
      array_sort(array_distinct($"a")),
      array_sort(array_distinct($"b")))).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("sorted_intersect_count"),
      "rewrite did not fire:\n" + optimized)
    // values match the un-rewritten semantics
    // id=0: [0,1,4]∩[1,4]=2; id=1: [1,3,4]∩[2,4]=1; id=2: [2,4,5]∩[3,4]=1
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(2, 1, 1))
    // soundness guards hold the rewrite back where it would change results
    val unsorted = base.select(size(array_intersect($"a", $"b")).as("n"))
    assert(!unsorted.queryExecution.optimizedPlan.toString
      .contains("sorted_intersect_count"))
    val dups = base.select(
      size(array_intersect(array_sort($"a"), array_sort($"b"))).as("n"))
    assert(!dups.queryExecution.optimizedPlan.toString
      .contains("sorted_intersect_count"), "no array_distinct proof → must not fire")
    // an array_distinct BELOW the sort is not proof either: transform
    // above it reintroduces duplicates (here: everything mod 2), where
    // array_intersect dedups but a merge count would not
    val reintroduced = base.select(size(array_intersect(
      array_sort(transform(array_distinct($"a"), x => pmod(x, lit(2L)))),
      array_sort(transform(array_distinct($"b"), x => pmod(x, lit(2L)))))).as("n"))
    assert(!reintroduced.queryExecution.optimizedPlan.toString
      .contains("sorted_intersect_count"),
      "distinct-below-transform must not count as a distinctness proof")
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
