package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streaming

/** Streaming == batch parity on the same files (AvailableNow replay). */
class StreamingSpec extends AnyFunSuite with SharedSpark {

  test("per-row bandBucketArray equals the aggregated bandBuckets") {
    // the stream side signs docs with pure expressions; the store was
    // built with the groupBy signature pass — candidates only line up if
    // the (band, bucket) values are bit-identical
    val d = Tables.documents(spark, sfDir)
    val viaAgg = graft.dedup.Dedup.bandBuckets(d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaExpr = graft.dedup.Dedup.shingleHashSets(d)
      .select(col("doc_id"),
        posexplode(graft.dedup.Dedup.bandBucketArray(col("hs"))).as(Seq("band", "bucket")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaExpr == viaAgg)
  }

  test("streaming incremental dedup equals the batch cross-store pairs") {
    val d = Tables.documents(spark, sfDir)
    val b1 = d.filter(col("doc_id") % 2 === 0)
    val b2 = d.filter(col("doc_id") % 2 === 1)
    val storePath = java.nio.file.Files.createTempDirectory("graft_stream_store").toString
    graft.dedup.SignatureStore.write(b1, storePath)
    val store = graft.dedup.SignatureStore.read(spark, storePath)
    // stream the increment from parquet files
    val incPath = java.nio.file.Files.createTempDirectory("graft_stream_inc").toString
    b2.write.mode("overwrite").parquet(incPath)
    val streamDocs = spark.readStream.schema(b2.schema).parquet(incPath)
    val flagged = Streaming.runAvailableNow(spark,
      Streaming.incrementalDedupStream(streamDocs, store, 0.6),
      "stream_incremental", org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // expected: exactly the batch incremental pairs that CROSS the store
    // boundary (within-increment pairs are the batch pass's job); the
    // stream emits (new_doc, stored_doc), i.e. (odd, even) ids here
    val expected = graft.dedup.Dedup.incrementalPairs(b2, store, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => (a % 2 == 0) != (b % 2 == 0) }
      .map { case (a, b, j) => if (a % 2 == 1) (a, b, j) else (b, a, j) }
      .toSet
    assert(expected.nonEmpty, "fixture should have cross-parity near-dups")
    assert(flagged == expected,
      s"stream missed ${(expected -- flagged).size}, fabricated ${(flagged -- expected).size}")
  }

  test("dedupedStream: bounded-state dedup emits exactly one row per in-window content") {
    val base = Tables.documents(spark, sfDir).limit(50)
      .withColumn("ts", col("doc_id").cast("timestamp"))
    // planted copies arrive 60s after their originals — inside the
    // 10-minute disorder window, so state still remembers the original
    val copies = base.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 100000)
      .withColumn("ts", col("ts") + expr("INTERVAL 60 SECONDS"))
    val inDir = java.nio.file.Files.createTempDirectory("graft_ddw_in").toString
    val all = base.unionByName(copies)
    all.write.mode("overwrite").parquet(inDir)
    val stream = spark.readStream.schema(all.schema).parquet(inDir)
    val out = Streaming.runAvailableNow(spark,
      Streaming.dedupedStream(stream, "ts", "10 minutes"),
      "stream_ddw", org.apache.spark.sql.streaming.OutputMode.Append())
    // exactly one survivor per distinct content (the corpus itself has
    // planted exact dups, so expected = distinct texts of the union)
    val expected = all.select("text").distinct().count()
    assert(out.count() == expected)
    assert(out.select("text").distinct().count() == expected)
  }

  test("streaming ingest sees store growth from earlier micro-batches") {
    // the frozen-file-listing caveat, closed: batch 2's drop decisions
    // must depend on signatures batch 1 APPENDED mid-stream, which the
    // one-shot stream-static join can never see.
    val d = Tables.documents(spark, sfDir)
    val b0 = d.filter(col("doc_id") % 3 === 0)
    val b1 = d.filter(col("doc_id") % 3 === 1)
    val b2 = d.filter(col("doc_id") % 3 === 2)
    val storePath = java.nio.file.Files.createTempDirectory("graft_singest_store").toString
    graft.dedup.SignatureStore.write(b0, storePath)
    // stream input: one file per micro-batch, ordered by mod time
    val inDir = java.nio.file.Files.createTempDirectory("graft_singest_in").toFile
    def addFile(df: org.apache.spark.sql.DataFrame, name: String, modTime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_singest_tmp").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dst = new java.io.File(inDir, name)
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      assert(dst.setLastModified(modTime))
    }
    val t0 = System.currentTimeMillis() - 60000
    addFile(b1, "0001.parquet", t0)
    addFile(b2, "0002.parquet", t0 + 30000)
    val outPath = java.nio.file.Files.createTempDirectory("graft_singest_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_singest_ckpt").toString
    val stream = spark.readStream.schema(d.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
    Streaming.runStreamingIngest(spark, stream, storePath, 0.6, outPath, ckpt)
    // equivalence: the streamed two-batch ingest == sequential batch
    // ingests (the mid-sequence pair/loser snapshots are collected
    // EAGERLY — the store DataFrames re-list files on action, so lazy
    // frames would silently see the post-b2 store)
    val seqPath = java.nio.file.Files.createTempDirectory("graft_singest_seq").toString
    graft.dedup.SignatureStore.write(b0, seqPath)
    val (seqS1, _) = graft.dedup.SignatureStore.ingest(spark, b1, seqPath, 0.6)
    val storeMid = graft.dedup.SignatureStore.read(spark, seqPath)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val exactMid = ids(graft.dedup.Dedup.incrementalExactLosers(b2, storeMid))
    val pairsMid = graft.dedup.Dedup.incrementalPairs(b2, storeMid, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (seqS2, _) = graft.dedup.SignatureStore.ingest(spark, b2, seqPath, 0.6)
    val streamS1 = ids(spark.read.parquet(s"$outPath/survivors/batch_id=0"))
    val streamS2 = ids(spark.read.parquet(s"$outPath/survivors/batch_id=1"))
    assert(streamS1 == ids(seqS1))
    assert(streamS2 == ids(seqS2))
    // the growth-detection witness: a batch-2 doc dropped ONLY because of
    // a b1-survivor near-dup partner appended mid-stream — droppable for
    // no other reason (not vs b0, not within-batch, not an exact loser).
    // The frozen-listing stream-static join could never drop it.
    val dropped2 = ids(spark.read.parquet(s"$outPath/dropped/batch_id=1"))
    val dueToB1 = pairsMid.collect {
      case (a, b) if a % 3 == 1 && b % 3 == 2 => b
      case (a, b) if b % 3 == 1 && a % 3 == 2 => a
    }.toSet
    val withinDrops = pairsMid.collect {
      case (a, b) if a % 3 == 2 && b % 3 == 2 => b
    }.toSet
    val vsB0Only = {
      val p0 = java.nio.file.Files.createTempDirectory("graft_singest_b0").toString
      graft.dedup.SignatureStore.write(b0, p0)
      val s0 = graft.dedup.SignatureStore.read(spark, p0)
      ids(graft.dedup.Dedup.incrementalPairs(b2, s0, 0.6)
        .filter(col("a_id") % 3 === 0 || col("b_id") % 3 === 0)
        .select(when(col("a_id") % 3 === 2, col("a_id"))
          .otherwise(col("b_id")).as("doc_id")))
    }
    val witness = dueToB1 -- vsB0Only -- withinDrops -- exactMid
    assert(witness.nonEmpty,
      "no batch-2 drop depended solely on batch-1's mid-stream append — fixture too weak")
    assert(witness.subsetOf(dropped2),
      s"stream missed growth-dependent drops: ${witness -- dropped2}")
    // and the store grew to cover every accepted doc
    assert(graft.dedup.SignatureStore.read(spark, storePath).hashes.count() ==
      b0.count() + streamS1.size + streamS2.size)
  }

  test("foreachBatch sink: batch-id overwrite is replay-idempotent") {
    val out = java.nio.file.Files.createTempDirectory("graft_fb_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fb_ckpt").toString
    val ev = Streaming.readEvents(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value")
    Streaming.runForeachBatchParquet(ev, out, ckpt)
    val want = Tables.events(spark, sfDir).count()
    assert(spark.read.parquet(out).count() == want)
    // second run from the same checkpoint: nothing new to process, no
    // duplicates appended
    Streaming.runForeachBatchParquet(ev, out, ckpt)
    assert(spark.read.parquet(out).count() == want)
  }

  test("streaming incremental agg across micro-batches equals one batch aggregate") {
    import graft.operators.IncrementalAgg
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"))
    val src = java.nio.file.Files.createTempDirectory("graft_sagg_src").toString
    // several files → maxFilesPerTrigger=1 forces MULTIPLE micro-batches,
    // each folding separately into the state store
    li.repartition(4).write.mode("overwrite").parquet(src)
    val state = java.nio.file.Files
      .createTempDirectory("graft_sagg_state").toString + "/state"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sagg_ckpt").toString
    val stream = spark.readStream.schema(li.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    Streaming.runStreamingAgg(spark, stream, state, "l_returnflag", "l_quantity", ckpt)
    val got = IncrementalAgg.readState(spark, state)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("total"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == want.length)
    got.zip(want).foreach { case ((gf, gn, gt), (wf, wn, wt)) =>
      assert(gf == wf && gn == wn, s"$gf $gn vs $wf $wn")
      assert(math.abs(gt - wt) < 1e-6 * math.max(1.0, math.abs(wt)))
    }
    // restart from the same checkpoint: nothing new → state unchanged
    Streaming.runStreamingAgg(spark, stream, state, "l_returnflag", "l_quantity", ckpt)
    val again = IncrementalAgg.readState(spark, state)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(again.sameElements(got), "checkpoint replay must not double-count")
  }

  test("streaming heavy hitters from count state equal the exact batch top-k") {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .withColumn("one", lit(1.0))
    val src = java.nio.file.Files.createTempDirectory("graft_shh_src").toString
    toks.repartition(4).write.mode("overwrite").parquet(src)
    val state = java.nio.file.Files
      .createTempDirectory("graft_shh_state").toString + "/state"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_shh_ckpt").toString
    val stream = spark.readStream.schema(toks.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    Streaming.runStreamingAgg(spark, stream, state, "token", "one", ckpt)
    val got = Streaming.topTokensFromState(spark, state, 20).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("token")).limit(20).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(want),
      s"stream top-k ${got.take(3).mkString(",")} != batch ${want.take(3).mkString(",")}")
    // checkpoint replay: nothing new → identical top-k, no double counts
    Streaming.runStreamingAgg(spark, stream, state, "token", "one", ckpt)
    val again = Streaming.topTokensFromState(spark, state, 20).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(again.sameElements(got))
  }

  test("streaming rate anomaly equals batch q_rate_anomaly given the batch moments") {
    // reference moments from the batch profile (NOT the stream: an online
    // mean would adapt to the anomaly it should flag)
    val hourly = Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val m = hourly.agg(round(avg("cnt"), 4), round(stddev_samp("cnt"), 4)).head()
    val (mu, sigma) = (m.getDouble(0), m.getDouble(1))
    val stream = Streaming.rateAnomaly(
      Streaming.readEvents(spark, sfDir), mu, sigma)
    val got = Streaming.runAvailableNow(spark, stream, "stream_rate_anomaly")
      .orderBy("hour").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
    val want = graft.queries.Events.qRateAnomaly(spark, sfDir)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty && got.sameElements(want),
      s"stream ${got.take(3).mkString(",")} != batch ${want.take(3).mkString(",")}")
  }

  test("windowed stream agg equals batch date_trunc agg") {
    val stream = Streaming.windowedAgg(Streaming.readEvents(spark, sfDir))
    val result = Streaming.runAvailableNow(spark, stream, "stream_windowed")
      .orderBy("hour").collect()
    val batch = Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .orderBy("hour").collect()
    assert(result.length == batch.length)
    result.zip(batch).foreach { case (s, b) =>
      assert(s.getTimestamp(0) == b.getTimestamp(0))
      assert(s.getLong(1) == b.getLong(1))
      assert(math.abs(s.getDouble(2) - b.getDouble(2)) < 1e-6)
    }
  }

  test("native session_window stream agg equals batch session_window and q_sessionize structure") {
    val stream = Streaming.sessionWindowAgg(Streaming.readEvents(spark, sfDir))
    val result = Streaming.runAvailableNow(spark, stream, "stream_session_win")
      .orderBy("user_id", "session_start").collect()
    // batch sibling: the SAME native session_window over the same files
    val batch = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("session_value"))
      .orderBy("user_id", "session_start").collect()
    assert(result.length == batch.length && result.nonEmpty)
    result.zip(batch).foreach { case (s, b) =>
      assert(s.getLong(0) == b.getLong(0))
      assert(s.getTimestamp(1) == b.getTimestamp(1))
      assert(s.getTimestamp(2) == b.getTimestamp(2))
      assert(s.getLong(3) == b.getLong(3))
      assert(math.abs(s.getDouble(4) - b.getDouble(4)) < 1e-6)
    }
    // structural cross-check against the oracle-paired lag+cumsum form:
    // same (sessions, events) per user — the two split rules differ only
    // at a gap of exactly 30:00.000000, absent from real timestamps
    val native = result.groupBy(_.getLong(0)).view
      .mapValues(rs => (rs.length.toLong, rs.map(_.getLong(3)).sum)).toMap
    val legacy = graft.queries.Text.qSessionize(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(native == legacy,
      s"session_window structure diverges from q_sessionize for users: " +
        (native.keySet ++ legacy.keySet).filter(k => native.get(k) != legacy.get(k)).take(5))
  }

  test("streaming dedup with watermark matches batch distinct") {
    val deduped = Streaming.readEvents(spark, sfDir)
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
    val result = Streaming.runAvailableNow(spark, deduped, "stream_dedup",
      org.apache.spark.sql.streaming.OutputMode.Append())
    // single-batch AvailableNow: watermark can't advance mid-batch, so the
    // stateful dedup degenerates to exact distinct over the input
    val expected = Tables.events(spark, sfDir)
      .select("user_id", "event_type").distinct().count()
    assert(result.count() == expected)
  }

  test("watermarked stream-stream interval join equals batch join") {
    val stream = Streaming.clickErrorJoin(Streaming.readEvents(spark, sfDir))
    val result = Streaming.runAvailableNow(spark, stream, "stream_ss_join",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("err_user"), col("ts").as("err_ts"),
        col("event_id").as("err_id"))
    val batch = clicks.join(errors,
      col("user_id") === col("err_user") &&
        col("err_ts") >= col("click_ts") &&
        col("err_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))
    assert(result.count() == batch.count())
    assert(batch.count() > 0, "no click→error pairs in fixture; test is vacuous")
    // spot-check: identical (click_id, err_id) pair sets
    val got = result.select("click_id", "err_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = batch.select("click_id", "err_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("left-outer stream-stream join: matches equal batch; null rows flushed past the watermark") {
    val stream = Streaming.clickErrorJoinLeftOuter(Streaming.readEvents(spark, sfDir))
    val result = Streaming.runAvailableNow(spark, stream, "stream_ss_louter",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("err_user"), col("ts").as("err_ts"),
        col("event_id").as("err_id"))
    val batch = clicks.join(errors,
      col("user_id") === col("err_user") &&
        col("err_ts") >= col("click_ts") &&
        col("err_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
    // matched pairs emit immediately — must equal the batch inner matches
    val gotMatched = result.filter(col("err_id").isNotNull)
      .select("click_id", "err_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantMatched = batch.filter(col("err_id").isNotNull)
      .select("click_id", "err_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wantMatched.nonEmpty, "no click→error pairs in fixture; test is vacuous")
    assert(gotMatched == wantMatched)
    // null-extended rows emit only once the watermark proves no match can
    // arrive. The GLOBAL watermark is the MIN across both sides' nodes
    // (each computes max(its own ts) − 1 h, and errors are sparse — the
    // last error lands hours before the last click), so the flush
    // horizon is min(maxClickTs, maxErrTs) − 1 h − the 10-min join
    // interval; 75 min + a 5-min boundary margin below that min. Every
    // batch-unmatched click older than the horizon must have flushed;
    // nothing outside the batch-unmatched set may ever appear.
    val maxClick = ev.filter(col("event_type") === "click")
      .agg(max("ts")).collect()(0).getTimestamp(0)
    val maxErr = ev.filter(col("event_type") === "error")
      .agg(max("ts")).collect()(0).getTimestamp(0)
    val minMax = if (maxClick.before(maxErr)) maxClick else maxErr
    val horizon = new java.sql.Timestamp(minMax.getTime - 75 * 60 * 1000L)
    val gotNull = result.filter(col("err_id").isNull)
      .select("click_id").collect().map(_.getLong(0)).toSet
    val wantNullAll = batch.filter(col("err_id").isNull)
      .select("click_id").collect().map(_.getLong(0)).toSet
    val wantNullFlushed = batch.filter(col("err_id").isNull &&
        col("click_ts") < lit(horizon))
      .select("click_id").collect().map(_.getLong(0)).toSet
    assert(wantNullFlushed.nonEmpty, "fixture has no flushable unmatched clicks")
    assert(gotNull.subsetOf(wantNullAll),
      s"stream fabricated unmatched clicks: ${(gotNull -- wantNullAll).take(5)}")
    assert(wantNullFlushed.subsetOf(gotNull),
      s"stream failed to flush ${(wantNullFlushed -- gotNull).size} past-watermark clicks")
  }

  test("stream-static enrichment join equals batch join") {
    val dim = Tables.events(spark, sfDir).select("user_id").distinct()
      .withColumn("tier", (col("user_id") % 3).cast("long"))
    val stream = Streaming.enriched(
        Streaming.readEvents(spark, sfDir), dim, "user_id")
      .groupBy("tier")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
    val result = Streaming.runAvailableNow(spark, stream, "stream_enriched")
      .orderBy("tier").collect()
    val batch = Tables.events(spark, sfDir).join(dim, Seq("user_id"))
      .groupBy("tier")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .orderBy("tier").collect()
    assert(result.length == batch.length)
    result.zip(batch).foreach { case (s, b) =>
      assert(s.getLong(0) == b.getLong(0) && s.getLong(1) == b.getLong(1))
      assert(math.abs(s.getDouble(2) - b.getDouble(2)) < 1e-6)
    }
  }

  test("transformWithState running totals equal batch aggregates (RocksDB state store)") {
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      val stream = Streaming.runningTotals(spark, Streaming.readEvents(spark, sfDir))
      // Update mode: keep only each user's LAST emitted row (memory sink
      // accumulates per-batch updates; AvailableNow may run several)
      val result = Streaming.runAvailableNow(spark, stream, "stream_tws",
          org.apache.spark.sql.streaming.OutputMode.Update())
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
      val batch = Tables.events(spark, sfDir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
        .collect().map(r => r.getLong(0) -> (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toMap
      assert(result.keySet == batch.keySet)
      result.foreach { case (u, (_, n, s)) =>
        assert(n == batch(u)._2, s"user $u count")
        assert(math.abs(s - batch(u)._3) < 1e-6, s"user $u sum")
      }
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("flatMapGroupsWithState closed sessions equal batch minus each user's open tail") {
    val stream = Streaming.closedSessions(spark, Streaming.readEvents(spark, sfDir))
    val result = Streaming.runAvailableNow(spark, stream, "stream_closed",
        org.apache.spark.sql.streaming.OutputMode.Append())
      .select(col("user_id"), col("session_id"), col("n_events"),
        round(col("session_value"), 2).as("sv"))
      .orderBy("user_id", "session_id").collect()
    // batch sessionize minus the LAST session per user (still open under
    // AvailableNow — nothing after it proves the gap)
    val batch = graft.queries.Text.qSessionize(spark, sfDir)
    val lastPerUser = batch.groupBy("user_id").agg(max("session_id").as("last_sid"))
    val closedBatch = batch.join(lastPerUser, Seq("user_id"))
      .filter(col("session_id") < col("last_sid"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("session_value").as("sv"))
      .orderBy("user_id", "session_id").collect()
    assert(result.length == closedBatch.length)
    result.zip(closedBatch).foreach { case (s, b) =>
      assert(s.getLong(0) == b.getLong(0) && s.getLong(1) == b.getLong(1))
      assert(s.getLong(2) == b.getLong(2), s"n_events for user ${s.getLong(0)}")
      assert(math.abs(s.getDouble(3) - b.getDouble(3)) < 1e-6)
    }
  }

  test("mapGroupsWithState session counts match batch sessionization") {
    val stream = Streaming.sessionCounts(spark, Streaming.readEvents(spark, sfDir))
    val result = Streaming.runAvailableNow(spark, stream, "stream_sessions",
        org.apache.spark.sql.streaming.OutputMode.Update())
      .orderBy("user_id").collect()
    // batch q_sessionize: final session id per user == session count
    val batch = graft.queries.Text.qSessionize(spark, sfDir)
      .groupBy("user_id").agg(max("session_id").as("n_sessions"))
      .orderBy("user_id").collect()
    assert(result.length == batch.length)
    result.zip(batch).foreach { case (s, b) =>
      assert(s.getLong(0) == b.getLong(0), "user mismatch")
      assert(s.getLong(1) == b.getLong(1), s"session count mismatch for user ${s.getLong(0)}")
    }
  }

  test("streaming embedding ingest appends to the IVF index; probes see new vectors") {
    import graft.similarity.{Ivf, Similarity}
    val vecs = Tables.embeddings(spark, sfDir)
    val idx = java.nio.file.Files.createTempDirectory("graft_sivf").toString + "/ivf"
    Ivf.writeIndex(vecs, idx)
    val baseCount = spark.read.parquet(s"$idx/cells").count()
    // planted ±2% copies arrive as the stream (cosine ~0.9998 to originals)
    val newV = Similarity.withPlantedDups(vecs).filter(col("vec_id") >= 100000L)
      .select(col("vec_id"), col("embedding"))
    val src = java.nio.file.Files.createTempDirectory("graft_sivf_src").toString
    newV.repartition(2).write.mode("overwrite").parquet(src)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sivf_ck").toString
    // maxFilesPerTrigger=1 => multiple micro-batches, each appending
    val stream = spark.readStream.schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    Streaming.runIndexIngest(spark, stream, idx, ckpt)
    assert(spark.read.parquet(s"$idx/cells").count() == baseCount + newV.count())
    // a query at an ORIGINAL vector must now see its streamed copy first
    val q = vecs.filter(col("vec_id") === 0L)
    val top = Ivf.topKFromIndex(spark, idx, q, 1).collect()
    assert(top.length == 1 && top.head.getLong(2) == 100000L,
      s"expected streamed copy 100000 at rank 1, got ${top.toSeq}")
    // restart on the same checkpoint: no new files => no double-append
    Streaming.runIndexIngest(spark, stream, idx, ckpt)
    assert(spark.read.parquet(s"$idx/cells").count() == baseCount + newV.count(),
      "checkpoint replay must not re-append committed batches")
  }

  test("streaming drift monitor equals the batch replay of the same windows") {
    val batchEvents = Tables.events(spark, sfDir)
    // baseline = first half of the feed by day; the stream replays ALL
    // of it, so late windows carry whatever drift the tail has
    val cut = batchEvents.agg(min(to_date(col("ts")))).collect().head.getDate(0)
      .toLocalDate.plusDays(15)
    val baseline = Streaming.driftBaseline(
      batchEvents.filter(to_date(col("ts")) < lit(java.sql.Date.valueOf(cut))))
    assert(baseline.length == 10 && math.abs(baseline.sum - 1000L) <= 10,
      s"baseline shares must be ~1000 milli total: $baseline")
    val stream = Streaming.driftMonitor(Streaming.readEvents(spark, sfDir), baseline)
    val got = Streaming.runAvailableNow(spark, stream, "stream_drift")
      .orderBy("win_start").collect()
    // batch referee: identical arithmetic over the same 6h windows
    val bin = expr("CAST(round(value * 100) AS BIGINT) div 5000")
    val binSums = (0 until 10).map(k =>
      sum(when(bin === k, 1L).otherwise(0L)).as(s"b$k"))
    val expected = batchEvents
      .groupBy(window(col("ts"), "6 hours"))
      .agg(binSums.head, binSums.tail :+ count(lit(1)).as("total"): _*)
      .select(col("window.start").as("win_start"), col("total"),
        (0 until 10).map(k =>
          abs(expr(s"(b$k * 1000L) div total") - lit(baseline(k)))).reduce(_ + _)
          .as("drift_milli"))
      .orderBy("win_start").collect()
    assert(got.length == expected.length && got.length > 10,
      s"expected many 6h windows, got ${got.length}")
    got.zip(expected).foreach { case (g, e) =>
      assert(g.getTimestamp(0) == e.getTimestamp(0))
      assert(g.getLong(1) == e.getLong(1), s"total at ${g.getTimestamp(0)}")
      assert(g.getLong(2) == e.getLong(2), s"drift at ${g.getTimestamp(0)}")
    }
    assert(got.map(_.getLong(2)).max > 0, "fixture must show some nonzero drift")
  }
}
