package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup
import graft.similarity.Similarity

class DedupSimSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s")).withColumn("n_chars", length($"text").cast("long"))

  test("exact dedup finds planted duplicate groups") {
    val d = docs(1L -> "a b c d e", 2L -> "x y z w v", 3L -> "a b c d e", 4L -> "q r s t u")
    val groups = Dedup.exactDupGroups(d).collect()
    assert(groups.length == 1)
    assert(groups.head.getLong(0) == 1L && groups.head.getLong(1) == 2L)
  }

  test("exactDupLosers drops exactly the non-min copies") {
    val d = docs(1L -> "a b c d e", 2L -> "x y z w v", 3L -> "a b c d e",
      4L -> "q r s t u", 5L -> "a b c d e", 6L -> "x y z w v")
    val losers = Dedup.exactDupLosers(d).collect().map(_.getLong(0)).toSet
    assert(losers == Set(3L, 5L, 6L))
  }

  test("contaminatedBy flags only docs sharing a probe 3-gram") {
    val corpus = docs(
      10L -> "the quick brown fox jumps high",   // shares "the quick brown"
      11L -> "totally unrelated training text here",
      12L -> "lazy dog sleeps all day long")     // shares "lazy dog sleeps"
    val bench = docs(
      1L -> "the quick brown cat",
      2L -> "a lazy dog sleeps now")
    val flagged = Dedup.contaminatedBy(corpus, bench).collect().map(_.getLong(0)).toSet
    assert(flagged == Set(10L, 12L))
  }

  test("jaccard inverted-index join finds near-dups, skips dissimilar") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy cat today", // 1 token diff
      3L -> "completely different words entirely unrelated content here now then soon")
    val pairs = Dedup.jaccardPairs(d, 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("prefix-filtered jaccard equals the count-aggregating join") {
    val d = Tables.documents(spark, sfDir)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(asSet(Dedup.jaccardPairsPrefix(d, 0.6)) ==
      asSet(Dedup.jaccardPairs(d, 0.6)))
    // a lower threshold exercises longer prefixes
    assert(asSet(Dedup.jaccardPairsPrefix(d, 0.35)) ==
      asSet(Dedup.jaccardPairs(d, 0.35)))
    // rarest-first ordering: same output (the prefix lemma holds under any
    // single global total order), strictly fewer-or-equal candidates
    assert(asSet(Dedup.jaccardPairsPrefix(d, 0.6, rarestFirst = true)) ==
      asSet(Dedup.jaccardPairs(d, 0.6)))
    assert(asSet(Dedup.jaccardPairsPrefix(d, 0.35, rarestFirst = true)) ==
      asSet(Dedup.jaccardPairs(d, 0.35)))
  }

  test("minhash LSH recalls the exact-jaccard pairs on testdata") {
    val d = Tables.documents(spark, sfDir)
    val exact = Dedup.jaccardPairs(d, 0.6).select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashPairs(d, 0.6).select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact verification step makes minhash ⊆ exact; recall should be high
    assert(mh.subsetOf(exact))
    assert(exact.isEmpty || mh.size.toDouble / exact.size >= 0.8,
      s"minhash recall too low: ${mh.size}/${exact.size}")
  }

  test("simhash: identical docs collide, near-dups within hamming radius") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "totally other tokens list without overlap at all")
    val sig = Dedup.simhash(d).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sig(1L) == sig(2L))
    val pairs = Dedup.simhashPairs(d, 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("per-row simhash64 expression is bit-identical to the aggregated referee") {
    // the codegen'd expression replaced the explode+64-vote-agg path in
    // the hot pipeline; both derive from xxhash64(token, seed 42) ±1
    // votes, so every (w0, w1) must match exactly — corpus-wide, not
    // just on toy docs (multiplicity, ties, and unicode all exercised)
    val d = Tables.documents(spark, sfDir)
    val fast = Dedup.simhash(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ref = Dedup.simhashAggregated(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fast.keySet == ref.keySet)
    assert(fast.nonEmpty)
    fast.foreach { case (id, sig) => assert(sig == ref(id), s"doc $id differs") }
  }

  test("brute-force knn is exact and deterministic") {
    val vecs = Tables.embeddings(spark, sfDir)
    val res = Similarity.bruteTopK(vecs, vecs.filter($"vec_id" < 2), 5).collect()
    assert(res.length == 10) // 2 queries × 5
    val ranks = res.filter(_.getLong(0) == 0L).map(_.getLong(1)).sorted
    assert(ranks.sameElements(Array(1L, 2L, 3L, 4L, 5L)))
    // sims non-increasing per query
    val sims = res.filter(_.getLong(0) == 0L).sortBy(_.getLong(1)).map(_.getDouble(3))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("quantized knn: integer dots, bounded magnitude, high recall vs brute") {
    val vecs = Tables.embeddings(spark, sfDir)
    val qs = vecs.filter($"vec_id" < 5)
    val dim = vecs.select(size($"embedding")).head().getInt(0)
    val quant = Similarity.quantizedTopK(vecs, qs, 10).collect()
    assert(quant.length == 50) // exact search: always k per query
    // |dot_q| ≤ 128²·dim (each quantized coord in [-128, 128] after the +0.5)
    assert(quant.forall(r => math.abs(r.getLong(3)) <= 128L * 128L * dim))
    val brute = Similarity.bruteTopK(vecs, qs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = quant.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (hits & brute).size.toDouble / brute.size
    // int8 on unit vectors loses <1% of cosine resolution; top-10 sets
    // should agree almost everywhere
    assert(recall >= 0.8, s"quantized recall@10 too low: $recall")
  }

  test("quantized dot approximates cosine within the int8 resolution bound") {
    val vecs = Tables.embeddings(spark, sfDir)
    val qs = vecs.filter($"vec_id" < 5)
    val dim = vecs.select(size($"embedding")).head().getInt(0)
    val cos = Similarity.bruteTopK(vecs, qs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val quant = Similarity.quantizedTopK(vecs, qs, 10).collect()
    // per-coord quantization error ≤ 0.5/127 on unit vectors; the dot of
    // two quantized vectors then deviates from the true cosine by at most
    // ~(|a|₁+|b|₁)·(0.5/127) + dim·(0.5/127)² ≤ 2·√dim·0.5/127 + ε
    val bound = math.sqrt(dim.toDouble) / 127.0 + dim / (4.0 * 127 * 127) + 1e-6
    val checked = quant.flatMap { r =>
      cos.get((r.getLong(0), r.getLong(2))).map { c =>
        (r.getLong(3) / (127.0 * 127.0), c)
      }
    }
    assert(checked.length > 30, "too few overlapping pairs to check")
    checked.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact) <= bound,
        s"quantized $approx vs cosine $exact exceeds bound $bound")
    }
  }

  test("ivf knn: valid sims, full result set, recall vs brute force") {
    val vecs = Tables.embeddings(spark, sfDir)
    val qs = vecs.filter($"vec_id" < 5)
    val brute = Similarity.bruteTopK(vecs, qs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = graft.similarity.Ivf.topK(vecs, qs, 10).collect()
    assert(ivf.length == 50) // 5 queries × 10 (cells are big enough)
    assert(ivf.forall(r => math.abs(r.getDouble(3)) <= 1.0))
    val hits = ivf.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (hits & brute).size.toDouble / brute.size
    assert(recall >= 0.4, s"IVF recall@10 too low: $recall")
  }

  test("kmeans|| seeding beats first-k on a skewed planted-cluster corpus") {
    // adversarial id layout: ids 0..49 ALL sit in cluster 0, so first-k
    // seeding starts every centroid inside one tight cluster; 4 clusters
    // at the corners of a scaled simplex, hash-jittered
    val dim = 8
    val rows = (0 until 200).map { id =>
      val cluster = id / 50
      val emb = Array.tabulate(dim) { j =>
        val base = if (j == cluster) 10.0f else 0.0f
        // avalanche-mixed jitter: with all first-k seeds near one center,
        // assignment among them is decided by jitter alone — mixing makes
        // that split pseudo-random, scattering each cluster across cells
        var h = id.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xC2B2AE3D27D4EB4FL
        h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
        base + (java.lang.Math.floorMod(h, 201L) - 100L) * 0.001f
      }
      (id.toLong, emb.toSeq)
    }
    val vecs = rows.toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" % 50 < 3) // 3 queries per cluster
    val brute = Similarity.bruteTopK(vecs, qs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // iters = 0 isolates SEEDING quality (Lloyd steps can partially bail
    // out a bad init; the point here is where the seeds start)
    def recall(firstK: Boolean): Double = {
      val hits = graft.similarity.Ivf.topK(vecs, qs, 10,
          nCells = 4, nprobe = 1, iters = 0, firstKSeed = firstK)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (hits & brute).size.toDouble / brute.size
    }
    val naive = recall(firstK = true)
    val seeded = recall(firstK = false)
    assert(seeded >= naive, s"kmeans|| recall $seeded < first-k $naive")
    assert(seeded >= 0.9, s"kmeans|| seeding should near-fully recall tight clusters: $seeded")
    assert(naive < 0.9, s"fixture no longer adversarial for first-k (recall $naive) — strengthen it")
  }

  test("persisted IVF index: probe equals in-memory topK, cells partition-pruned") {
    val vecs = Tables.embeddings(spark, sfDir)
    val qs = vecs.filter($"vec_id" < 5)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    graft.similarity.Ivf.writeIndex(vecs, path)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val fromIndex = graft.similarity.Ivf.topKFromIndex(spark, path, qs, 10)
    assert(asSet(fromIndex) == asSet(graft.similarity.Ivf.topK(vecs, qs, 10)))
    // the cells directory is laid out one partition per cell, so an
    // nprobe-cell probe prunes to that fraction of the files
    val cellDirs = new java.io.File(s"$path/cells").listFiles()
      .filter(_.getName.startsWith("cid=")).map(_.getName).toSet
    assert(cellDirs.size > 1, s"expected per-cell partitions, got $cellDirs")
  }

  test("IVF incremental append: probes see appends, equals rebuild at same centroids") {
    val vecs = Tables.embeddings(spark, sfDir)
    val base = vecs.filter($"vec_id" % 4 =!= 0)
    val extra = vecs.filter($"vec_id" % 4 === 0)
    val qs = vecs.filter($"vec_id" < 5)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val a = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    graft.similarity.Ivf.writeIndex(base, a)
    graft.similarity.Ivf.appendToIndex(spark, a, extra)
    val appended = graft.similarity.Ivf.topKFromIndex(spark, a, qs, 10)
    // probe results must include appended vectors (the whole point)
    assert(appended.collect().map(_.getLong(2)).exists(_ % 4 == 0),
      "no appended vector reachable from the probe")
    // append+probe == rebuilding the cells at the SAME (frozen) centroids
    // over the full corpus — exact result equality, not just recall:
    // append uses the very assignment expression a rebuild would
    val b = java.nio.file.Files.createTempDirectory("graft_ivf_reb").toString
    graft.similarity.Ivf.writeIndex(base, b) // deterministic ⇒ same centroids
    graft.similarity.Ivf.rebuildCells(spark, b, vecs)
    assert(asSet(appended) ==
      asSet(graft.similarity.Ivf.topKFromIndex(spark, b, qs, 10)))
  }

  test("IVF append recall equals full re-clustered rebuild on the planted fixture") {
    // same-distribution appends (the documented no-drift contract): hold
    // out 1/5 of each planted cluster, append it, and compare recall
    // against an index re-clustered from scratch on the full corpus
    val dim = 8
    val rows = (0 until 200).map { id =>
      val cluster = id / 50
      val emb = Array.tabulate(dim) { j =>
        val base = if (j == cluster) 10.0f else 0.0f
        var h = id.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xC2B2AE3D27D4EB4FL
        h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
        base + (java.lang.Math.floorMod(h, 201L) - 100L) * 0.001f
      }
      (id.toLong, emb.toSeq)
    }
    val vecs = rows.toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" % 50 < 3)
    val brute = Similarity.bruteTopK(vecs, qs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallOf(hits: Set[(Long, Long)]): Double =
      (hits & brute).size.toDouble / brute.size
    val p = java.nio.file.Files.createTempDirectory("graft_ivf_drift").toString
    graft.similarity.Ivf.writeIndex(vecs.filter($"vec_id" % 5 =!= 0), p,
      nCells = 4)
    graft.similarity.Ivf.appendToIndex(spark, p, vecs.filter($"vec_id" % 5 === 0))
    val appendRecall = recallOf(
      graft.similarity.Ivf.topKFromIndex(spark, p, qs, 10, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet)
    val full = java.nio.file.Files.createTempDirectory("graft_ivf_full").toString
    graft.similarity.Ivf.writeIndex(vecs, full, nCells = 4)
    val rebuildRecall = recallOf(
      graft.similarity.Ivf.topKFromIndex(spark, full, qs, 10, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet)
    assert(appendRecall == rebuildRecall,
      s"append recall $appendRecall != rebuild recall $rebuildRecall")
    assert(appendRecall >= 0.9, s"planted clusters should near-fully recall: $appendRecall")
  }

  test("poisson_pmf expression matches the driver-side math") {
    val df = Seq((0, 2.3), (2, 2.3), (10, 0.5)).toDF("k", "lam")
      .select(graft.functions.PoissonPmf.poisson_pmf($"k", $"lam").as("p"))
    val got = df.collect().map(_.getDouble(0))
    val want = Seq(graft.ml.Simulate.poissonPmf(0, 2.3),
      graft.ml.Simulate.poissonPmf(2, 2.3), graft.ml.Simulate.poissonPmf(10, 0.5))
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("jaccard DF-capped join equals the uncapped join (hot-shingle correction)") {
    val d = Tables.documents(spark, sfDir)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val uncapped = asSet(Dedup.jaccardPairs(d, 0.6))
    // cap 4 is active on this corpus (shingle DF reaches 9): hot shingles
    // leave the join and come back through the exact correction, so the
    // pair set AND the jaccard values must be identical
    assert(asSet(Dedup.jaccardPairs(d, 0.6, maxDf = 4)) == uncapped)
    assert(uncapped.nonEmpty)
  }

  test("jaccard hot-shingle correction restores exact values on a hot corpus") {
    // "common common common" trigram appears in all 4 docs → hot at cap 2;
    // rare tails make each pair's jaccard depend on the hot overlap
    val d = docs(
      1L -> "common common common common rare1 rare2",
      2L -> "common common common common rare1 rare2",
      3L -> "common common common common other1 other2",
      4L -> "unrelated tokens entirely different text here")
    val uncapped = Dedup.jaccardPairs(d, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = Dedup.jaccardPairs(d, 0.5, maxDf = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped == uncapped)
    assert(uncapped.exists { case (a, b, j) => (a, b) == (1L, 2L) && j == 1.0 })
  }

  test("DF-16 cap is output-equal to uncapped on the sf0.1 oracle corpus") {
    // q_dedup_jaccard/q_dedup_clusters/q_curate_full run capped (maxDf=16)
    // against UNCAPPED DuckDB oracles; this certifies cap-safety on the
    // exact corpus the correctness gate measures, so a data regen that
    // broke the all-common-shingles-hot assumption would fail HERE first,
    // not as a mystery oracle mismatch
    val dir = "/root/testdata/sf0.1"
    assume(new java.io.File(dir).isDirectory)
    val d = Tables.documents(spark, dir)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(asSet(Dedup.jaccardPairs(d, 0.6, maxDf = 16)) ==
      asSet(Dedup.jaccardPairs(d, 0.6)))
  }

  test("incremental dedup through the persisted store equals full recompute") {
    val d = Tables.documents(spark, sfDir)
    val b1 = d.filter($"doc_id" % 2 === 0)
    val b2 = d.filter($"doc_id" % 2 === 1)
    val path = java.nio.file.Files.createTempDirectory("graft_sigstore_spec").toString
    graft.dedup.SignatureStore.write(b1, path)
    val store = graft.dedup.SignatureStore.read(spark, path)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = asSet(Dedup.minhashPairs(d, 0.6))
    val prior = asSet(Dedup.minhashPairs(b1, 0.6))
    val inc = asSet(Dedup.incrementalPairs(b2, store, 0.6))
    // incremental emits exactly the full-recompute pairs that touch ≥1 new
    // doc: nothing missed, nothing re-emitted from the prior run
    assert((prior union inc) == full,
      s"missed ${(full -- prior -- inc).size}, fabricated ${((prior union inc) -- full).size}")
    assert((inc intersect prior).isEmpty)
    assert(inc.nonEmpty, "corpus should have cross-parity near-dup pairs")
    // store-update: appending the new batch makes the store cover b1 ∪ b2
    graft.dedup.SignatureStore.append(b2, path)
    val updated = graft.dedup.SignatureStore.read(spark, path)
    assert(updated.buckets.count() == Dedup.bandBuckets(d).count())
    assert(updated.sets.count() == Dedup.shingleHashSets(d).count())
    assert(updated.hashes.count() == d.count())
  }

  test("incrementalPairs: store side of the bucket join plans with NO exchange") {
    // the 100 TB contract of the persisted layout: a daily increment must
    // not re-shuffle the historical corpus's buckets. Broadcast would hide
    // the question at test scale (and stops applying long before 100 TB),
    // so force shuffle joins and disable AQE to inspect the static plan.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val d = Tables.documents(spark, sfDir)
    val path = java.nio.file.Files.createTempDirectory("graft_sigstore_plan").toString
    graft.dedup.SignatureStore.write(d.filter($"doc_id" % 2 === 0), path)
    val store = graft.dedup.SignatureStore.read(spark, path)
    val conf = spark.conf
    val saved = Seq("spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Dedup
        .incrementalPairs(d.filter($"doc_id" % 2 === 1), store, 0.6)
        .queryExecution.executedPlan
      def storeSideNoShuffle(side: SparkPlan): Boolean = {
        val bucketScans = side.collect {
          case s: FileSourceScanExec if s.relation.bucketSpec.isDefined &&
            s.relation.location.rootPaths.exists(_.toString.contains("graft_sigstore_plan")) => s
        }
        bucketScans.nonEmpty &&
          side.collect { case e: ShuffleExchangeExec => e }.isEmpty
      }
      val joinSides = plan.collect {
        case j: SortMergeJoinExec => Seq(j.left, j.right)
        case j: ShuffledHashJoinExec => Seq(j.left, j.right)
      }.flatten
      assert(joinSides.exists(storeSideNoShuffle),
        "no shuffle join reads the store's buckets exchange-free:\n" + plan)
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("store read after catalog loss re-registers the bucketed table from disk") {
    // cross-run reality: the session that wrote the store is gone, and
    // with it the in-memory catalog entry. read() must restore the
    // CLUSTERED BY registration from the on-disk bucket files so the
    // next increment still joins exchange-free — and see identical rows.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val d = Tables.documents(spark, sfDir).limit(200)
    val path = java.nio.file.Files.createTempDirectory("graft_sigstore_reg").toString
    graft.dedup.SignatureStore.write(d, path)
    val before = graft.dedup.SignatureStore.read(spark, path)
      .buckets.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // simulate the fresh session: drop THIS store's catalog entry
    // (external table — the bucket files stay on disk); name derivation
    // mirrors SignatureStore.bucketsTable (MD5 of the QUALIFIED path)
    val qualified = {
      val p = new org.apache.hadoop.fs.Path(s"$path/buckets")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      p.makeQualified(fs.getUri, fs.getWorkingDirectory).toString
    }
    val tbl = "graft_sigstore_" + java.security.MessageDigest.getInstance("MD5")
      .digest(qualified.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    spark.sql(s"DROP TABLE $tbl")
    val reread = graft.dedup.SignatureStore.read(spark, path)
    assert(reread.buckets.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet == before)
    val bucketed = reread.buckets.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec if s.relation.bucketSpec.isDefined => s
    }
    assert(bucketed.nonEmpty, "re-registered scan lost the bucket spec")
    // appending from the 'new session' still validates against the spec
    graft.dedup.SignatureStore.append(
      Tables.documents(spark, sfDir).limit(250).filter($"doc_id" >= 200), path)
    assert(graft.dedup.SignatureStore.read(spark, path).buckets.count() > before.size)
  }

  test("store compaction: same rows, fewer bucket files, still exchange-free") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val d = Tables.documents(spark, sfDir).limit(120)
    val path = java.nio.file.Files.createTempDirectory("graft_sigstore_compact").toString
    graft.dedup.SignatureStore.write(d.filter($"doc_id" < 40), path)
    graft.dedup.SignatureStore.append(d.filter($"doc_id" >= 40 && $"doc_id" < 80), path)
    graft.dedup.SignatureStore.append(d.filter($"doc_id" >= 80), path)
    def bucketFiles(): Int = new java.io.File(s"$path/buckets").listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    def snapshot() = {
      val s = graft.dedup.SignatureStore.read(spark, path)
      (s.buckets.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet,
        s.sets.count(), s.hashes.count())
    }
    val before = snapshot()
    val filesBefore = bucketFiles()
    graft.dedup.SignatureStore.compact(spark, path)
    assert(snapshot() == before, "compaction changed store contents")
    assert(bucketFiles() < filesBefore,
      s"expected fewer bucket files, $filesBefore -> ${bucketFiles()}")
    // still a bucketed scan after the rewrite
    val scan = graft.dedup.SignatureStore.read(spark, path)
      .buckets.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec if s.relation.bucketSpec.isDefined => s
      }
    assert(scan.nonEmpty, "compacted buckets lost the bucket spec")
  }

  test("store path spellings normalize to one catalog table") {
    // trailing/duplicate slashes must hash to the SAME table name:
    // a second registration over the same files would bypass the
    // existing table's bucket-spec validation on append
    val d = Tables.documents(spark, sfDir).limit(60)
    val path = java.nio.file.Files.createTempDirectory("graft_sigstore_norm").toString
    graft.dedup.SignatureStore.write(d, path)
    def sigTables(): Set[String] = spark.sql("SHOW TABLES")
      .collect().map(_.getString(1)).filter(_.startsWith("graft_sigstore_")).toSet
    graft.dedup.SignatureStore.read(spark, path): Unit
    val before = sigTables()
    // same location, different spellings — none may register a new table
    val rows = graft.dedup.SignatureStore.read(spark, path).buckets.count()
    for (alias <- Seq(s"$path/", s"$path//", path.replace("/graft", "//graft"))) {
      assert(graft.dedup.SignatureStore.read(spark, alias).buckets.count() == rows,
        s"alias $alias read differs")
    }
    assert(sigTables() == before,
      s"aliased spellings registered extra tables: ${sigTables() -- before}")
  }

  test("crashed compact leaves the live store serving the OLD consistent state") {
    val d = Tables.documents(spark, sfDir).limit(100)
    val path = java.nio.file.Files.createTempDirectory("graft_sigstore_crash").toString
    graft.dedup.SignatureStore.write(d.filter($"doc_id" < 50), path)
    graft.dedup.SignatureStore.append(d.filter($"doc_id" >= 50), path)
    def snapshot() = {
      val s = graft.dedup.SignatureStore.read(spark, path)
      (s.buckets.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet,
        s.sets.count(), s.hashes.count())
    }
    val before = snapshot()
    // simulate a compact killed mid-rewrite: a partial staging dir with
    // a half-written artifact (the dominant crash window — the whole
    // data-write phase targets $path.tmp, never the live store)
    val staging = new java.io.File(s"$path.tmp/sets")
    staging.mkdirs()
    java.nio.file.Files.write(staging.toPath.resolve("part-00000.parquet"),
      Array.fill[Byte](16)(0x7f))
    assert(snapshot() == before,
      "partial staging leaked into live store reads")
    // recovery: the next compact clears the leftovers and swaps cleanly
    graft.dedup.SignatureStore.compact(spark, path)
    assert(snapshot() == before, "post-crash compact changed store contents")
    assert(!new java.io.File(s"$path.tmp").exists(), "staging dir not cleaned")
    assert(!new java.io.File(s"$path.old").exists(), "old dir not cleaned")
  }

  test("ingest increment: drops dups vs store and batch, appends survivors, idempotent") {
    val d = Tables.documents(spark, sfDir)
    val b1 = d.filter($"doc_id" % 2 === 0)
    val b2 = d.filter($"doc_id" % 2 === 1)
    val path = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    graft.dedup.SignatureStore.write(b1, path)
    val storeBefore = graft.dedup.SignatureStore.read(spark, path)
    val (survivors, dropped) =
      graft.dedup.SignatureStore.ingest(spark, b2, path, 0.6)
    val sIds = survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    val dIds = dropped.collect().map(_.getLong(0)).toSet
    assert((sIds & dIds).isEmpty)
    assert(sIds.size + dIds.size == b2.count())
    assert(dIds.nonEmpty, "fixture should drop some cross-parity near-dups")
    // survivors must be NON-empty and stable after the append: a cached
    // (rather than checkpointed) frame recomputes against the grown
    // store post-append, where every survivor exact-matches itself, and
    // silently collapses to ∅ — every other assertion here would still
    // pass in that degenerate state
    assert(sIds.nonEmpty, "ingest returned no survivors — post-append recompute bug")
    assert(survivors.select("doc_id").collect().map(_.getLong(0)).toSet == sIds)
    // the clean-corpus guarantee: survivors qualify against NOTHING —
    // not the pre-ingest store (those were dropped) and not each other
    // (every new-new pair drops its larger id), so re-running the
    // detector over the survivors finds zero pairs
    assert(graft.dedup.Dedup
      .incrementalPairs(d.filter($"doc_id".isin(sIds.toSeq: _*)), storeBefore, 0.6)
      .count() == 0, "survivors still contain qualifying pairs")
    // idempotency: re-ingesting the same batch drops EVERYTHING (every
    // doc now exact-matches either a stored survivor or a stored original)
    val (again, droppedAgain) = graft.dedup.SignatureStore.ingest(spark, b2, path, 0.6)
    assert(again.count() == 0)
    assert(droppedAgain.count() == b2.count())
  }

  test("incremental exact losers: cross-run hash matches + within-batch copies") {
    val b1 = docs(1L -> "alpha beta gamma delta", 2L -> "epsilon zeta eta theta")
    val b2 = docs(
      10L -> "alpha beta gamma delta",  // copy of stored doc 1 → drop
      11L -> "iota kappa lambda mu",    // new unique, min of its pair → keep
      12L -> "iota kappa lambda mu",    // within-batch copy of 11 → drop
      13L -> "nu xi omicron pi")        // new unique → keep
    val store = graft.dedup.SignatureStore.build(b1)
    val losers = Dedup.incrementalExactLosers(b2, store)
      .collect().map(_.getLong(0)).toSet
    assert(losers == Set(10L, 12L))
  }

  test("bloom decontamination equals the broadcast semi-join path") {
    val d = Tables.documents(spark, sfDir)
    val corpus = d.filter($"doc_id" >= 5)
    val probes = d.filter($"doc_id" < 5)
    val exact = Dedup.contaminatedBy(corpus, probes)
      .collect().map(_.getLong(0)).toSet
    val bloom = Dedup.contaminatedByBloom(corpus, probes)
      .collect().map(_.getLong(0)).toSet
    assert(exact.nonEmpty)
    assert(bloom == exact, s"bloom path diverged: missing ${(exact -- bloom).size}, " +
      s"extra ${(bloom -- exact).size}")
    // an undersized sketch (high FPP) must still be output-identical —
    // the exact verify stage owns correctness, the bloom only pre-filters
    val tiny = Dedup.contaminatedByBloom(corpus, probes, expectedProbeShingles = 8)
      .collect().map(_.getLong(0)).toSet
    assert(tiny == exact)
  }

  test("dupClusters on an empty pair set returns an empty frame") {
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.dupClusters(empty).count() == 0)
  }

  test("dupClusters: connected components with min-id labels") {
    // chain 1-2, 2-3 plus isolated pair 5-6: components {1,2,3} and {5,6}
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a_id", "b_id")
    val got = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("dupClusters on testdata: every pair lands in one cluster, labels are member minima") {
    val pairs = Dedup.jaccardPairs(Tables.documents(spark, sfDir), 0.6, maxDf = 16)
    val labels = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ps = pairs.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ps.forall { case (a, b) => labels(a) == labels(b) })
    // each cluster's label is the min id among its members
    labels.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min == label)
    }
  }

  test("cosinePairsLsh equals brute cosinePairs on the planted-dup corpus") {
    val aug = Similarity.withPlantedDups(Tables.embeddings(spark, sfDir))
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = asSet(Similarity.cosinePairs(aug, 0.9))
    val lsh = asSet(Similarity.cosinePairsLsh(aug, 0.9))
    assert(brute.nonEmpty, "planted dups should qualify at 0.9")
    assert(lsh == brute, s"LSH missed ${(brute -- lsh).size} pairs, " +
      s"fabricated ${(lsh -- brute).size}")
  }

  test("withPlantedDups: copies are near-1 cosine to originals, ids offset") {
    val aug = Similarity.withPlantedDups(Tables.embeddings(spark, sfDir))
    val n = Tables.embeddings(spark, sfDir).count()
    assert(aug.count() == n + (n + 1) / 2)
    val pairs = Similarity.cosinePairs(aug, 0.9).collect()
    // every planted pair is (orig even id, orig + 100000)
    assert(pairs.forall(r => r.getLong(1) == r.getLong(0) + 100000L))
    assert(pairs.forall(_.getDouble(2) > 0.99))
  }

  test("lsh knn results are a subset of brute-force candidates (same bucket)") {
    val vecs = Tables.embeddings(spark, sfDir)
    val qs = vecs.filter($"vec_id" < 5)
    val lsh = Similarity.lshTopK(vecs, qs, 10).collect()
    assert(lsh.nonEmpty)
    // every reported neighbor must carry a valid sim ∈ [-1, 1]
    assert(lsh.forall(r => math.abs(r.getDouble(3)) <= 1.0))
  }

  test("multi-probe lsh recall dominates single-probe at equal index cost") {
    val vecs = Tables.embeddings(spark, sfDir)
    val qs = vecs.filter($"vec_id" < 10)
    val brute = Similarity.bruteTopK(vecs, qs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(probes: Int): Double = {
      val hits = Similarity.lshTopK(vecs, qs, 10, planes = 6, probes = probes)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (hits & brute).size.toDouble / brute.size
    }
    val r1 = recall(1)
    val r4 = recall(4)
    assert(r4 >= r1, s"multi-probe recall $r4 < single-probe $r1")
    assert(r4 > 0.0)
    // probing flips only the smallest-margin bits: the probe buckets are
    // distinct, so no (query, neighbor) pair can be double-reported
    val mp = Similarity.lshTopK(vecs, qs, 10, planes = 6, probes = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(mp.length == mp.distinct.length)
  }

  test("dupSpans reports exact maximal span bounds on a planted fixture") {
    // docs 1 and 2 share tokens 3..12 (a 10-token run => three 8-token
    // windows at positions 3,4,5 in doc 1 — wait, 10-token run has 3
    // windows; they overlap/adjoin into ONE maximal span of 10 tokens).
    val shared = (1 to 10).map(i => s"dup$i").mkString(" ")
    val d = docs(
      1L -> s"a1 a2 a3 $shared z1 z2",
      2L -> s"b1 b2 b3 b4 $shared y1",
      3L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12 c13 c14 c15")
    val out = Dedup.dupSpans(d, 8).orderBy("doc_id").collect()
    // doc 3 shares nothing — absent
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L))
    val r1 = out(0)
    // doc 1: windows start at pos 3,4,5 (0-based; shared run = tokens
    // 3..12), merging to span [3, 13) = 10 tokens; 15 tokens total
    assert(r1.getLong(1) == 1L, "n_spans")
    assert(r1.getLong(2) == 10L, "dup_tokens")
    assert(r1.getLong(3) == 10L, "max_span")
    assert(r1.getDouble(4) == math.round(10.0 / 15.0 * 10000) / 10000.0)
    val r2 = out(1)
    assert(r2.getLong(1) == 1L && r2.getLong(2) == 10L)
  }

  test("dupSpans merges adjacent islands but splits across a gap") {
    // two shared runs separated by a >w gap in doc 1 => two spans
    val runA = (1 to 8).map(i => s"pa$i").mkString(" ")
    val runB = (1 to 8).map(i => s"pb$i").mkString(" ")
    val gap = (1 to 12).map(i => s"g$i").mkString(" ")
    val d = docs(
      1L -> s"$runA $gap $runB",
      2L -> s"x1 x2 $runA x3 x4",
      3L -> s"y1 y2 y3 $runB y4")
    val out = Dedup.dupSpans(d, 8).orderBy("doc_id").collect()
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getLong(1) == 2L, s"expected 2 spans, got ${r1.getLong(1)}")
    assert(r1.getLong(2) == 16L, "dup_tokens = both runs")
    assert(r1.getLong(3) == 8L, "max_span = one run")
  }

  test("exciseDupSpans keeps the canonical copy and strips the later one") {
    val shared = (1 to 10).map(i => s"dup$i").mkString(" ")
    val d = docs(
      1L -> s"a1 a2 a3 $shared z1 z2",
      2L -> s"b1 b2 b3 b4 $shared y1",
      3L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12 c13 c14 c15")
    val out = Dedup.exciseDupSpans(d, 8).orderBy("doc_id").collect()
    assert(out.length == 3, "every doc must appear in the rewrite")
    // doc 1 is canonical (min doc_id): untouched
    assert(out(0).getLong(2) == out(0).getLong(1))
    assert(out(0).getString(3) == s"a1 a2 a3 $shared z1 z2")
    // doc 2 loses exactly the shared run: windows at pos 4,5,6 merge to
    // [4, 14) => kept = 4 prefix tokens + y1
    assert(out(1).getString(3) == "b1 b2 b3 b4 y1")
    assert(out(1).getLong(1) == 15L && out(1).getLong(2) == 5L)
    // doc 3 shares nothing: untouched
    assert(out(2).getLong(2) == 15L)
    // the one-copy guarantee: every duplicated window text still occurs
    // in the surviving corpus (here: in the canonical doc)
    assert(out(0).getString(3).contains(shared))
  }

  test("semdedup: removals have genuine lower-id near-dups; recall on planted dups") {
    val removed = graft.queries.DedupSim.qSemdedup(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    // precision referee: brute all-pairs cosine >= 0.9 over the same
    // augmented corpus — every removal must have a lower-id partner
    val brute = Similarity.cosinePairs(
      Similarity.withPlantedDups(Tables.embeddings(spark, sfDir)), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val loserSide = brute.map(_._2).toSet
    assert(removed.subsetOf(loserSide),
      s"removed ids with no genuine near-dup: ${removed -- loserSide}")
    // recall: planted copies (id >= 100000) sit at cosine ~0.9998 to
    // their originals; only cluster-boundary splits may miss — bound it
    val planted = brute.count(_._2 >= 100000L)
    val caught = removed.count(_ >= 100000L)
    assert(planted > 0 && caught >= (planted * 0.9).toInt,
      s"semdedup caught $caught of $planted planted dups")
  }

  test("semdedup re-shard: g=1 invariance; precision and recall hold at g=5") {
    val base = Tables.embeddings(spark, sfDir)
    // the wrapper's g-formula yields 1 below 1000 vectors — the driver's
    // correctness SFs run the fixed-K-identical path by construction
    val viaWrapper = graft.queries.DedupSim.qSemdedup(spark, sfDir).collect()
    val viaG1 = graft.queries.DedupSim.semdedup(base, 1L).collect()
    assert(viaWrapper.toSeq == viaG1.toSeq)
    // forced fine sharding (K = 50 cells on 500 base vectors): every
    // removal still has a genuine lower-id near-dup (precision is exact —
    // pairs are verified within a cell), and planted-dup recall stays
    // high (only a copy argmax-assigned across a cell boundary can slip)
    val sharded = graft.queries.DedupSim.semdedup(base, 5L).collect()
    assert(sharded.forall(r => r.getLong(1) >= 0L && r.getLong(1) < 50L))
    val removed5 = sharded.map(_.getLong(0)).toSet
    val brute = Similarity.cosinePairs(
      Similarity.withPlantedDups(base), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(removed5.subsetOf(brute.map(_._2).toSet))
    val planted = brute.count(_._2 >= 100000L)
    val caught5 = removed5.count(_ >= 100000L)
    assert(caught5 >= (planted * 0.9).toInt,
      s"sharded semdedup caught $caught5 of $planted planted dups")
  }

  /** r12 (VERDICT r11 task 7): the sharded path faces an EXACT oracle
    * replay on a corpus dense enough that g > 1 — n = 2500 (5 GenScale-
    * style replicas of the 500-vector base, keys offset by 10⁹, dim-0
    * perturbed so replicas aren't exact duplicates), so the wrapper's
    * g-formula gives 2. The referee recomputes the whole pipeline
    * driver-side with the engine's float discipline (left-to-right dots,
    * 6dp HALF_UP rounds, (−score, cl) tie order) and asserts row-exact
    * equality — the same certification the DuckDB oracle gives at
    * sf0.1's n = 2000 (g = 2, green in the 3-SF sweep), here at spec
    * speed on a denser fixture. */
  /** Driver-side exact replay of the L-level descent (the r13
    * generalization of the r12 three-level replay): recomputes
    * centroids (mean over raw member vectors, 6dp HALF_UP), the
    * level-by-level argmax with the engine's float discipline
    * (left-to-right dots, (−score, id) tie order, parent-restricted
    * candidates located by id arithmetic), and the within-cluster
    * pairing — then asserts row-exact equality with the engine. */
  private def replaySemdedup(dense: org.apache.spark.sql.DataFrame,
                             g: Long, levels: Int): Unit = {
    import org.apache.spark.sql.functions._
    val engine = graft.queries.DedupSim.semdedup(dense, g, levels).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dotLR(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val baseRows = dense
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("emb"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    // aug comes from the SAME spark transform the engine uses — the
    // replay covers centroids/assignment/pairing, the g-dependent path
    val augRows = Similarity.withPlantedDups(dense).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val dim = baseRows.head._3.length
    val b = graft.queries.DedupSim.rootCeil(g, levels)
    def ipow(x: Long, e: Int): Long = (0 until e).foldLeft(1L)((a, _) => a * x)
    val divs = (0 until levels).map(l => ipow(b, levels - 1 - l))
    val ns = divs.map(dv => (g + dv - 1L) / dv)
    def meanCent(rows: Array[(Long, Int, Array[Double])]): Array[Double] =
      Array.tabulate(dim)(d => round6(rows.map(_._3(d)).sum / rows.length))
    // per level: (id = label·N_ℓ + nk, parent id, centroid, norm)
    val levelCents = (0 until levels).map { l =>
      baseRows.groupBy(r => (r._2.toLong, (r._1 % g) / divs(l)))
        .map { case ((label, nk), rows) =>
          val c = meanCent(rows)
          val par = if (l == 0) 0L else label * ns(l - 1) + nk / b
          (label * ns(l) + nk, par, c, math.sqrt(dotLR(c, c)))
        }.toArray
    }
    val assigned = augRows.map { case (id, v) =>
      var want = -1L
      for (l <- 0 until levels) {
        val cands =
          if (want < 0L) levelCents(l)
          else levelCents(l).filter(_._2 == want)
        want = cands.map { case (cid, _, c, cn) =>
          (-1.0 * dotLR(v, c) / cn, cid)
        }.minBy(identity)._2
      }
      (want, id, v, math.sqrt(dotLR(v, v)))
    }
    val expected = assigned.groupBy(_._1).toSeq.flatMap { case (cl, members) =>
      val pairs = for {
        a <- members; b <- members
        if a._2 < b._2
        sim = round6(dotLR(a._3, b._3) / (a._4 * b._4))
        if sim >= 0.9
      } yield (b._2, sim)
      pairs.groupBy(_._1).map { case (bId, ps) =>
        (bId, cl, ps.size.toLong, ps.map(_._2).max)
      }
    }.sortBy(_._1)
    assert(expected.nonEmpty, "fixture must produce near-dup pairs")
    assert(engine.toSeq == expected,
      s"L=$levels g=$g engine=${engine.take(3).toSeq} expected=${expected.take(3)} " +
        s"(sizes ${engine.length}/${expected.size})")
  }

  /** GenScale-style dense fixture: `replicas` key-offset copies of the
    * base corpus, dim-0 perturbed so replicas aren't exact duplicates. */
  private def denseFixture(replicas: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val base0 = Tables.embeddings(spark, sfDir)
    (0 until replicas).map { r =>
      val off = base0.withColumn("vec_id", col("vec_id") + lit(r * 1000000000L))
      if (r == 0) off
      else off.withColumn("embedding",
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(r * 0.001f)).otherwise(x)))
    }.reduce(_ unionByName _)
  }

  test("semdedup dense-corpus replay: exact equality at g = 2 (n = 2500)") {
    val dense = denseFixture(5)
    assert(dense.count() / 1000L == 2L, "fixture must trigger the sharded path")
    replaySemdedup(dense, 2L, 3)
  }

  test("semdedup generalized depth: replay equality at g = 5, L = 3 and L = 4") {
    // g = 5 with b = 2 gives a non-collapsed tree at BOTH depths (top
    // nodes 2 per label at L=3; levels 1..3 all restrict at L=4), so
    // the parent arithmetic and the per-level candidate restriction —
    // not just the g≤2 collapse — face the exact replay
    val dense = denseFixture(10)
    assert(dense.count() / 1000L == 5L, "fixture must reach g = 5")
    replaySemdedup(dense, 5L, 3)
    replaySemdedup(dense, 5L, 4)
  }

  test("leakage-free split keeps every near-dup cluster in one split") {
    val split = graft.queries.DedupSim.qLeakageSplit(spark, sfDir)
    val perCluster = split.groupBy("cluster_id")
      .agg(countDistinct("split").as("n_splits"))
      .filter($"n_splits" > 1).count()
    assert(perCluster == 0L, "a near-dup cluster straddles splits")
  }

  test("raw id-hash split separates near-dup pairs; cluster split never does") {
    // construct a near-dup pair whose RAW ids hash to different splits —
    // the eval-contamination bug the cluster split exists to prevent
    import graft.operators.Scale
    val buckets = spark.range(0, 200)
      .select(col("id"), Scale.pctBucket(col("id"), 2654435761L).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // two ids landing in different splits (bucket <80 vs >=80)
    val trainId = (0L until 200L).find(buckets(_) < 80).get
    val testId = (0L until 200L).find(buckets(_) >= 80).get
    val same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = docs(trainId -> same, testId -> same,
      999L -> "totally unrelated filler content words here now then soon verily")
    val clusters = Dedup.dupClusters(Dedup.jaccardPairs(d, 0.6))
    val assigned = d.select(col("doc_id"))
      .join(clusters, d("doc_id") === clusters("id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val byCluster = Scale.idSplit(assigned, "cluster_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val byRawId = Scale.idSplit(assigned, "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byRawId(trainId) != byRawId(testId),
      "fixture ids chosen to demonstrate raw-id leakage")
    assert(byCluster(trainId) == byCluster(testId),
      "cluster-keyed split must keep the near-dup pair together")
  }

  test("minhash calibration: estimator tracks exact jaccard within the 64-hash error band") {
    val rows = graft.queries.DedupSim.qMinhashCalibration(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // the candidate population must reach the near-dup range (the
    // sf0.001 corpus carries planted near-dups but no byte-identical text)
    assert(rows.map(_._1).max >= 8L, "near-dup deciles must be present")
    // global mean abs error weighted by pairs: inside ~2.5x the binomial std
    val n = rows.map(_._2).sum
    val err = rows.map(r => r._2 * r._4).sum.toDouble / n
    assert(err < 150, s"mean |est-exact| = $err milli; 64-hash band is ~60")
    // if byte-identical pairs appear (larger SFs), they estimate exactly
    rows.filter(r => r._1 == 10L && r._3 == 1000L).foreach { r =>
      assert(r._4 == 0L, s"identical-signature pairs must have zero error: $r")
    }
  }
}
