package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scale

/** Plan-level proof of the scale utilities: bucketed joins drop their
  * exchanges, salting preserves aggregate results, partitioned sinks
  * prune at read. */
class ScaleSpec extends AnyFunSuite with SharedSpark {

  test("bucketed join plans with no shuffle exchange") {
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val (bo, bli) = Scale.bucketedPair(spark, o, li, "o_orderkey", 4,
      "orders_b", "lineitem_b")
    // force sort-merge (tiny test tables would broadcast otherwise, which
    // hides the exchange the bucketing is supposed to eliminate)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = bo.join(bli, Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join still shuffles:\n" + plan)
      // and the same join on unbucketed parquet DOES shuffle
      val unbucketed = o.join(li, Seq("o_orderkey"))
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
      // correctness unchanged
      assert(joined.count() == unbucketed.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("fanOutScan: fans out tiny file scans, passes streaming and in-memory frames through") {
    // tiny parquet scan (1 row group) on a 4-core session: estimated
    // splits*2 <= cores, so the floor repartitions to defaultParallelism
    val docs = Tables.documents(spark, sfDir)
    val fanned = Scale.fanOutScan(docs)
    assert(fanned.queryExecution.executedPlan.toString
      .contains("Exchange RoundRobinPartitioning"),
      "tiny one-row-group scan not fanned out:\n" +
        fanned.queryExecution.executedPlan.toString)
    assert(fanned.count() == docs.count())
    // in-memory frame: no file leaf, returned untouched (no exchange)
    import spark.implicits._
    val mem = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(Scale.fanOutScan(mem) eq mem)
    // streaming frame: must NOT touch df.rdd (r15 regression: analysis
    // exception from Streaming.incrementalDedupStream via Dedup.shingled)
    val dir = java.nio.file.Files.createTempDirectory("fanout_stream").toString
    docs.limit(2).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val passed = Scale.fanOutScan(stream)
    assert(passed.isStreaming && (passed eq stream))
  }

  test("salted aggregation equals plain aggregation") {
    val li = Tables.lineitem(spark, sfDir)
    val salted = Scale.saltedSumCount(li, "l_returnflag", "l_quantity", 8)
      .orderBy("l_returnflag").collect()
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("total"), count(lit(1)).as("cnt"))
      .orderBy("l_returnflag").collect()
    assert(salted.length == plain.length)
    salted.zip(plain).foreach { case (s, p) =>
      assert(s.getString(0) == p.getString(0))
      assert(math.abs(s.getDouble(1) - p.getDouble(1)) < 1e-6)
      assert(s.getLong(2) == p.getLong(2))
    }
  }

  test("salted broadcast join equals plain join") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sfDir).select(
      col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val saltedCnt = Scale.saltedBroadcastJoin(li, o, "l_orderkey", 4).count()
    val plainCnt = li.join(o, Seq("l_orderkey")).count()
    assert(saltedCnt == plainCnt)
  }

  test("denseIds equals global-window row_number, with no 1-partition stage") {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate")
    val viaWindow = o.withColumn("id",
        row_number().over(Window.orderBy("o_orderkey")).cast("long"))
      .select("o_orderkey", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDense = Scale.denseIds(o, "id", Seq("o_orderkey"), 4)
    assert(viaDense.rdd.getNumPartitions > 1)
    val got = viaDense.collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Long]("id")).toMap
    assert(got == viaWindow)
    // columnar: the checkpoint scan serves InternalRows directly — no
    // DeserializeToObject/SerializeFromObject row round trip in the plan
    // (which is what .rdd + createDataFrame(zipWithIndex) used to insert)
    val plan = viaDense.queryExecution.executedPlan.toString
    assert(!plan.contains("SerializeFromObject"), plan)
    assert(!plan.contains("DeserializeToObject"), plan)
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    // the 100 TB skew story AQE owns (salting covers aggregation skew):
    // one hot key dominating a sort-merge join gets its partition split
    // into parallel subtasks. Thresholds lowered so local-scale data
    // qualifies as "skewed"; the executed plan must record the split.
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      // 50k rows on ONE key vs 100 spread keys; the payload pads the hot
      // partition's size and is PSEUDO-RANDOM HEX so shuffle compression
      // can't collapse it under the 20KB skew threshold on any
      // codec/version (a constant pad compressed to nearly nothing and
      // flaked the assertion)
      def pad(i: Int): String =
        (0 until 8).map(j => f"${i * 2654435761L + j * 40503L}%016x").mkString
      val big = (1 to 50000).map(i => (if (i <= 49900) 7L else (i % 100).toLong,
        pad(i))).toDF("k", "payload")
      val dim = (0 until 100).map(i => (i.toLong, s"d$i")).toDF("k", "name")
      val joined = big.join(dim, "k")
      // collect() executes joined's OWN query execution (count() would
      // wrap it in a new one and leave this plan un-finalized)
      assert(joined.collect().length == 50000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew="), "no skew handling recorded:\n" + plan)
      assert(plan.contains("isFinalPlan=true"))
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("upsertByKey: updates land, others persist, untouched partitions untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val base = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
    Scale.writeKeyed(base, "k", 8, dir)
    // record the file set of every partition before the upsert
    def partFiles(): Map[String, Set[String]] =
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("part="))
        .map(d => d.getName -> d.listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).toSet).toMap
    val before = partFiles()
    // update 2 keys, insert 1 new one
    val updates = Seq((7L, "SEVEN"), (42L, "FORTY-TWO"), (101L, "new")).toDF("k", "v")
    Scale.upsertByKey(spark, dir, updates, "k", 8)
    val after = spark.read.parquet(dir).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after.size == 101)
    assert(after(7L) == "SEVEN" && after(42L) == "FORTY-TWO" && after(101L) == "new")
    assert(after(8L) == "v8") // untouched keys keep their values
    // dynamic overwrite: partitions not hit by an update keep their
    // exact original files
    val touched = updates.select(pmod(xxhash64($"k"), lit(8L))).collect()
      .map("part=" + _.getLong(0)).toSet
    val untouchedSame = partFiles().filter { case (p, _) => !touched(p) }
    assert(untouchedSame.nonEmpty)
    untouchedSame.foreach { case (p, files) =>
      assert(files == before(p), s"partition $p was rewritten")
    }
  }

  test("upsertByKey crash window: a partition lost at commit is restorable from source") {
    // the DOCUMENTED failure mode (Scale.upsertByKey): a crash during
    // commitJob's delete-then-rename phase can leave a touched partition
    // deleted but not yet replaced. Simulate that end state by removing
    // one touched partition dir, then run the documented recovery —
    // re-derive the lost partition's rows from the source of truth and
    // rewrite JUST that partition (dynamic overwrite) — and verify the
    // table is whole again.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_crash").toString
    val base = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
    Scale.writeKeyed(base, "k", 8, dir)
    val updates = Seq((7L, "SEVEN"), (101L, "new")).toDF("k", "v")
    Scale.upsertByKey(spark, dir, updates, "k", 8)
    val lostPart = updates.select(pmod(xxhash64($"k"), lit(8L))).head().getLong(0)
    val lostDir = new java.io.File(dir, s"part=$lostPart")
    assert(lostDir.isDirectory)
    lostDir.listFiles().foreach(f => assert(f.delete()))
    assert(lostDir.delete())
    assert(spark.read.parquet(dir).count() < 101) // the crash lost rows
    // recovery: source of truth = base with updates applied (what a real
    // deployment re-derives from its upstream corpus + correction log)
    val truth = base.join(updates.select($"k"), Seq("k"), "left_anti")
      .unionByName(updates)
    val lostRows = truth
      .withColumn("part", pmod(xxhash64($"k"), lit(8L)))
      .filter($"part" === lostPart)
    val saved = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try lostRows.write.mode("overwrite").partitionBy("part").parquet(dir)
    finally saved match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val after = spark.read.parquet(dir).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after.size == 101)
    assert(after(7L) == "SEVEN" && after(101L) == "new" && after(8L) == "v8")
  }

  test("writeShards: n disjoint sorted shards") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    Scale.writeShards(Tables.documents(spark, sfDir), 4, "doc_id", dir)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length == 4)
    val ranges = files.map { f =>
      val ids = spark.read.parquet(f.getAbsolutePath)
        .select("doc_id").collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted), s"${f.getName} not sorted")
      (ids.min, ids.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi < lo, "shard ranges overlap")
    }
    val total = spark.read.parquet(dir).count()
    assert(total == Tables.documents(spark, sfDir).count())
  }

  test("pctBucket survives strided id allocations (the (id*C) mod 100 failure mode)") {
    import spark.implicits._
    // ids on a stride of 100: the old low-bit form ((id*C) mod 100) saw
    // only id mod 100 = 0, mapping EVERY doc to one bucket — a 25%
    // sample kept 100% or 0% of the stratum. High-bit extraction must
    // keep ≈25%, and the split must stay ≈80/10/10 on the same ids.
    val strided = (1L to 400L).map(i => (i * 100L, "en")).toDF("doc_id", "lang")
    val kept = Scale.stratifiedHashSample(strided, "doc_id", "lang", Map("en" -> 25))
      .count()
    assert(kept > 50 && kept < 150, s"strided-id sample rate ${kept / 400.0}")
    val train = Scale.idSplit(strided, "doc_id")
      .filter(col("split") === "train").count()
    assert(train > 250 && train < 390, s"strided-id train share ${train / 400.0}")
  }

  test("stratifiedHashSample: near-target rates, deterministic, split-uncorrelated") {
    val docs = Tables.documents(spark, sfDir)
    val pc = Map("en" -> 25, "es" -> 80, "fr" -> 80, "de" -> 80, "zh" -> 80)
    def rates(df: org.apache.spark.sql.DataFrame): Map[String, Double] = {
      val full = docs.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      df.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1).toDouble / full(r.getString(0))).toMap
    }
    val s1 = Scale.stratifiedHashSample(docs, "doc_id", "lang", pc)
    val r = rates(s1)
    pc.foreach { case (lang, p) =>
      assert(math.abs(r.getOrElse(lang, 0.0) - p / 100.0) < 0.25,
        s"$lang rate ${r.get(lang)} vs requested ${p / 100.0}")
    }
    // bit-identical on re-evaluation (no RNG state anywhere)
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Scale.stratifiedHashSample(docs, "doc_id", "lang", pc)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // decorrelated from idSplit: the 25% en-sample must NOT be a subset
    // of en-train (same-constant hashing would make it one)
    val enTrain = Scale.idSplit(docs.filter(col("lang") === "en"), "doc_id")
      .filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val enSample = Scale.stratifiedHashSample(
        docs.filter(col("lang") === "en"), "doc_id", "lang", Map("en" -> 25))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((enSample -- enTrain).nonEmpty, "sample ⊆ train: hash constants correlated")
  }

  test("stratified sample respects per-stratum fractions") {
    val docs = Tables.documents(spark, sfDir)
    val fractions = Map("en" -> 0.25, "es" -> 0.8, "fr" -> 0.8, "de" -> 0.8, "zh" -> 0.8)
    val sampled = docs.stat.sampleBy("lang", fractions, 42L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fractions.foreach { case (lang, f) =>
      val rate = sampled.getOrElse(lang, 0L).toDouble / full(lang)
      assert(math.abs(rate - f) < 0.25, s"$lang rate $rate vs requested $f")
    }
  }

  test("compactParquet merges a fragmented directory, data unchanged") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact")
    val frag = base.resolve("frag").toString
    val out = base.resolve("out").toString
    Tables.lineitem(spark, sfDir).repartition(16).write.parquet(frag)
    val fragFiles = new java.io.File(frag).listFiles()
      .count(_.getName.startsWith("part-"))
    assert(fragFiles == 16)
    Scale.compactParquet(spark, frag, out, targetFileBytes = 512L << 20)
    val outFiles = new java.io.File(out).listFiles()
      .count(_.getName.startsWith("part-"))
    assert(outFiles == 1, s"expected 1 compacted file, got $outFiles")
    assert(spark.read.parquet(out).count() ==
      Tables.lineitem(spark, sfDir).count())
  }

  test("zorderWrite: per-file bounding boxes tighter than single-key sort") {
    val base = java.nio.file.Files.createTempDirectory("graft_zorder")
    val zDir = base.resolve("z").toString
    val linDir = base.resolve("lin").toString
    val df = Tables.lineitem(spark, sfDir).select("l_partkey", "l_suppkey")
    Scale.zorderWrite(df, "l_partkey", "l_suppkey", 8, zDir)
    Scale.writeShards(df, 8, "l_partkey", linDir)
    // the z-order win is BALANCED extent: a single-key sort gives files
    // spanning 1/n of the sort key but 100% of every other column (a
    // suppkey filter prunes nothing); z-ordered files cover a bounded
    // fraction of BOTH dimensions, so min/max stats prune either filter
    def avgSpan(dir: String, c: String): Double = {
      val full = df.agg(max(c), min(c)).first()
      val width = (full.getLong(0) - full.getLong(1)).toDouble
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("part-"))
      files.map { f =>
        val s = spark.read.parquet(f.getAbsolutePath).agg(max(c), min(c)).first()
        (s.getLong(0) - s.getLong(1)) / width
      }.sum / files.length
    }
    val zSupp = avgSpan(zDir, "l_suppkey")
    val linSupp = avgSpan(linDir, "l_suppkey")
    assert(linSupp > 0.9, s"linear layout should span ~full suppkey: $linSupp")
    assert(zSupp < 0.7, s"z-order files should cover a suppkey fraction: $zSupp")
    assert(avgSpan(zDir, "l_partkey") < 0.7, "partkey extent not bounded")
    assert(spark.read.parquet(zDir).count() == df.count())
  }

  test("idSplit: deterministic, total, near the requested proportions") {
    val docs = Tables.documents(spark, sfDir)
    val split = Scale.idSplit(docs, "doc_id")
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(counts.values.sum == n.toLong, "every row assigned")
    assert(math.abs(counts("train") / n - 0.8) < 0.1, counts.toString)
    assert(math.abs(counts.getOrElse("val", 0L) / n - 0.1) < 0.08)
    assert(math.abs(counts.getOrElse("test", 0L) / n - 0.1) < 0.08)
    // re-run assigns identically (id-keyed, no RNG state)
    assert(Scale.idSplit(docs, "doc_id").collect()
      .sameElements(split.collect()))
  }

  test("IncrementalAgg: N-way incremental refresh equals full recompute, any N") {
    import graft.operators.IncrementalAgg
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_quantity"))
    val full = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("total"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    for (ways <- Seq(2, 3)) {
      val store = java.nio.file.Files
        .createTempDirectory(s"graft_incr_$ways").toString + "/state"
      (0 until ways).foreach { k =>
        IncrementalAgg.refresh(spark, store,
          li.filter(col("l_orderkey") % ways === k), "l_returnflag", "l_quantity")
      }
      val got = IncrementalAgg.readState(spark, store)
        .orderBy("l_returnflag").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      full.zip(got).foreach { case ((f, n, t), (gf, gn, gt)) =>
        assert(f == gf && n == gn, s"$ways-way: $f $n vs $gf $gn")
        assert(math.abs(t - gt) < 1e-6 * math.max(1.0, math.abs(t)),
          s"$ways-way total: $t vs $gt")
      }
    }
  }

  test("IncrementalAgg: a crash inside the swap window still serves the new state") {
    import graft.operators.IncrementalAgg
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_quantity"))
    val store = java.nio.file.Files
      .createTempDirectory("graft_incr_crash").toString + "/state"
    IncrementalAgg.refresh(spark, store, li, "l_returnflag", "l_quantity")
    val before = IncrementalAgg.readState(spark, store)
      .orderBy("l_returnflag").collect().map(_.toString)
    // simulate dying between "delete primary" and "rename staging":
    // primary gone, the COMPLETE staging dir left behind
    val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(store),
      new org.apache.hadoop.fs.Path(s"$store.tmp")))
    val after = IncrementalAgg.readState(spark, store)
      .orderBy("l_returnflag").collect().map(_.toString)
    assert(after.sameElements(before), "staging fallback must serve the new state")
  }

  test("partitioned sink prunes partitions at read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = Tables.events(spark, sfDir)
      .withColumn("etype", col("event_type"))
    Scale.writePartitioned(ev, "etype", dir)
    val read = spark.read.parquet(dir).filter(col("etype") === "error")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(etype"),
      "no partition filter in scan:\n" + plan)
    assert(read.count() ==
      Tables.events(spark, sfDir).filter(col("event_type") === "error").count())
  }
}
