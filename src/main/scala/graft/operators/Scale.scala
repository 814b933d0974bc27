package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out utilities — the knobs a 100 TB deployment turns that tiny
  * scale factors never force (builder prompt: partitioning, co-location,
  * skew). Each is exercised by a spec that asserts the *plan* property
  * (shuffle count), since the data here is too small to measure wall-clock
  * effects.
  */
object Scale {

  /** Scale-ADAPTIVE scan fan-out for CPU-heavy per-row stages (r15,
    * optimization guide §2.5 "input skew — one huge unsplittable file
    * … repartition immediately after the read"): a small dimension-ish
    * table written as one parquet row group plans as ONE scan task, so
    * every narrow stage fused onto it (tokenize → shingle → hash, the
    * most CPU-intensive per-row work in the repo) runs on one core
    * while the rest idle — measured 3.4 s single-task stages at sf0.1
    * on a 32-core box. Repartition ONLY when the scan's own splits
    * can't feed half the cores: at warehouse scale the input has
    * thousands of row groups, the condition is false, and NO extra
    * exchange is planned — this is not a local-mode constant, it is a
    * floor that self-disables exactly where the shuffle would cost.
    * Round-robin keeps sortBeforeRepartition's deterministic
    * row-to-partition assignment (guide §2.5 retry-safety).
    *
    * The split count is ESTIMATED from the scan's file index (sizes +
    * file count run through the same openCost/maxSplitBytes packing
    * formula `FilePartition` uses), NOT from `df.rdd` (r16): `.rdd`
    * forced a full analysis+physical-planning pass of the
    * un-repartitioned frame on every call — pure driver latency — and
    * it THROWS on streaming DataFrames, which broke
    * `Streaming.incrementalDedupStream` via `Dedup.shingled` in r15.
    * Streaming frames and frames with other leaf kinds (in-memory test
    * data) pass through untouched: the floor exists for one-row-group
    * FILE scans and narrow checkpoint residues, and micro-batch sources
    * size their own splits. A checkpointed upstream (LogicalRDD leaf,
    * e.g. the curation pipeline's dedup residue) contributes its RDD's
    * KNOWN partition count — the RDD already exists, so reading it
    * plans nothing. */
  def fanOutScan(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val conf = spark.sessionState.conf
    val openCost = conf.filesOpenCostInBytes
    var known = true
    val estSplits = df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            val totalBytes = fs.location.sizeInBytes
            val nFiles = math.max(1L, fs.location.inputFiles.length.toLong)
            val padded = totalBytes + nFiles * openCost
            val bytesPerCore = padded / math.max(1, target)
            val maxSplit = math.min(conf.filesMaxPartitionBytes,
              math.max(openCost, bytesPerCore))
            math.max(1L, (padded + maxSplit - 1) / maxSplit)
          case _ => known = false; 0L
        }
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.getNumPartitions.toLong
      case leaf if leaf.children.isEmpty => known = false; 0L
    }.sum
    if (known && estSplits > 0 && estSplits * 2 <= target) df.repartition(target)
    else df
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Writes both sides bucketed on the join key into the session warehouse
    * and returns the bucketed tables. A subsequent equi-join on the bucket
    * key needs NO exchange on either side (SortMergeJoin reads co-located
    * buckets) — the pre-shuffle trade: pay one write-time shuffle, join
    * shuffle-free forever after. */
  def bucketedPair(spark: SparkSession, left: DataFrame, right: DataFrame,
                   key: String, buckets: Int,
                   leftName: String, rightName: String): (DataFrame, DataFrame) = {
    Seq(leftName, rightName).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a previously interrupted run can leave the managed location behind
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (loc.exists()) deleteRecursively(loc)
    }
    left.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(leftName)
    right.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(rightName)
    (spark.table(leftName), spark.table(rightName))
  }

  /** Salted high-cardinality aggregation: two-phase agg where phase 1
    * groups on (key, salt) to split a hot key across `salts` reducers,
    * phase 2 merges the partials. Correct for algebraic aggregates
    * (sum/count here). AQE's skew handling covers joins; salting covers
    * aggregation skew AQE can't split. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     salts: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(crc32(col(key).cast("string")), lit(salts)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum("__psum").as("total"), sum("__pcnt").as("cnt"))
  }

  /** Salted broadcast-side replication for a skewed equi-join: the big
    * (skewed) side gets a random-ish deterministic salt, the small side is
    * replicated across all salt values; join on (key, salt). Use when one
    * key dominates and the small side fits broadcast. */
  def saltedBroadcastJoin(big: DataFrame, small: DataFrame, key: String,
                          salts: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(crc32(monotonically_increasing_id().cast("string")), lit(salts)))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    bigSalted.join(broadcast(smallReplicated), Seq(key, "__salt")).drop("__salt")
  }

  /** Hive-style partitioned parquet sink (partition pruning at read). */
  def writePartitioned(df: DataFrame, partitionCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** The hash-bucketed layout [[upsertByKey]] maintains: rows land in
    * `part = pmod(xxhash64(key), buckets)` directories. */
  def writeKeyed(df: DataFrame, keyCol: String, buckets: Int, path: String): Unit =
    df.withColumn("part", pmod(xxhash64(col(keyCol)), lit(buckets.toLong)))
      .write.mode("overwrite").partitionBy("part").parquet(path)

  /** Keyed UPSERT over partitioned parquet WITHOUT a table format: the
    * update set is hashed to its partitions, ONLY those partitions are
    * read back (partition-pruned scan), old versions of updated keys are
    * anti-joined away, and the merged rows are written with DYNAMIC
    * partition overwrite — untouched partitions' files are never read or
    * rewritten. Cost scales with the update set's partition footprint,
    * not the table: the mutation pattern for a corpus that receives
    * corrections, next to the append-only signature-store path (a table
    * format like Iceberg/Delta buys ACID on top; the data movement is
    * exactly this).
    *
    * Failure semantics — two WARNINGS a deployment must plan around:
    *  - NOT crash-atomic. A crash while the merge job is still WRITING
    *    is safe (the V1 committer stages output and touches old files
    *    only at commitJob, after this function's read finished), but a
    *    crash DURING the commit's delete-then-rename phase can leave a
    *    touched partition deleted and not yet replaced — those
    *    partitions' pre-upsert rows are gone and must be RESTORED FROM
    *    SOURCE (re-derive the lost partitions' rows and [[writeKeyed]]-
    *    style rewrite them; spec-pinned recovery in ScaleSpec). The read
    *    also depends on the frozen InMemoryFileIndex listing taken
    *    before the write begins. A table format's transactional commit
    *    closes both windows; the data movement is unchanged.
    *  - NOT safe under concurrent writers — that's what the table
    *    formats' commit protocols add.
    *
    * Deliberately NOT the staging-dir + rename swap that
    * [[graft.dedup.SignatureStore.compact]] uses: compact rewrites the
    * WHOLE store anyway, so staging costs nothing extra, while an upsert
    * touches only the update set's partition footprint — staging+swapping
    * the whole table would re-copy every untouched partition and destroy
    * the operation's cost model. Closing the per-partition commit window
    * without full rewrites is exactly the delta a transactional table
    * format (Iceberg/Delta) adds over raw parquet; until then, the
    * spec-pinned restore-from-source recovery (ScaleSpec) is the
    * documented contract. */
  def upsertByKey(spark: SparkSession, path: String, updates: DataFrame,
                  keyCol: String, buckets: Int): Unit = {
    val upd = updates
      .withColumn("part", pmod(xxhash64(col(keyCol)), lit(buckets.toLong)))
    val touched = upd.select("part").distinct()
      .collect().map(_.getLong(0)) // ≤ buckets values — driver-sized
    val existing = spark.read.parquet(path)
      .filter(col("part").isin(touched.toIndexedSeq: _*)) // partition-pruned
    val kept = existing.join(
      upd.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    val saved = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      kept.unionByName(upd)
        .write.mode("overwrite").partitionBy("part").parquet(path)
    finally saved match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Training-shard export: exactly `n` parquet files, range-partitioned
    * and sorted by `sortCol` — downstream loaders get disjoint ordered
    * shards, and parquet row-group min/max stats actually prune on the
    * sort key. One range-exchange; the sort is per-shard, never global. */
  def writeShards(df: DataFrame, n: Int, sortCol: String, path: String): Unit =
    df.repartitionByRange(n, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)

  /** Small-file compaction — 100 TB housekeeping: rewrite a parquet
    * directory into ⌈totalBytes / targetFileBytes⌉ evenly-sized files.
    * Returns the file count written. Round-robin repartition (no key
    * needed); pair with [[writeShards]] when a sort key should survive. */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
                     targetFileBytes: Long = 128L << 20): Int = {
    import org.apache.hadoop.fs.Path
    val p = new Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(p).filter(_.getPath.getName.startsWith("part-"))
      .map(_.getLen).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(inPath).repartition(n)
      .write.mode("overwrite").parquet(outPath)
    n
  }

  /** Z-order (Morton-curve) clustered write on two numeric columns:
    * min/max-normalize each to 16 bits, interleave the bits via the
    * codegen'd [[graft.functions.ZOrder2]] expression (one fused loop —
    * replaces this method's original 16-term shift/mask Column reduce,
    * which evaluated 48 expression nodes per row), then range-partition +
    * sort by the z-value. Each output file then covers a tight rectangle
    * in (x, y), so parquet min/max stats prune scans filtered on EITHER
    * column — multi-dimensional pruning from a one-dimensional layout.
    * Stats collection is one tiny agg job.
    *
    * This is the general NUMERIC path (double min-max scaling, works for
    * float columns); for integer keys where the z-value itself must be
    * integer-exact / cross-engine-replayable, use
    * [[graft.operators.Layout.zorderLayout]]. */
  def zorderWrite(df: DataFrame, colX: String, colY: String, n: Int,
                  path: String): Unit = {
    val r = df.agg(min(colX), max(colX), min(colY), max(colY)).first()
    def d(i: Int) = r.get(i).toString.toDouble
    val (loX, hiX, loY, hiY) = (d(0), d(1), d(2), d(3))
    def norm16(c: Column, lo: Double, hi: Double): Column =
      if (hi == lo) lit(0L)
      else least(lit(65535L),
        ((c.cast("double") - lit(lo)) / lit(hi - lo) * 65536.0).cast("long"))
    val z = graft.functions.ZOrder2.zorder2(
      norm16(col(colX), loX, hiX), norm16(col(colY), loY, hiY))
    df.withColumn("__z", z)
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Knuth multiplicative permutation of a (masked) id on the 31-bit
    * ring: ((id mod 2³¹) · C) mod 2³¹ — a bijection on [0, 2³¹) for odd
    * C, overflow-free under ANSI at any id (product ≤ 2³¹·C ≈ 5e18 <
    * 2⁶³−1; ids beyond 2³¹ share the masked id's value). The SEEDLESS
    * pseudo-random order behind every deterministic sampling/splitting
    * operator here; the DuckDB oracles replay it verbatim. */
  def knuthPerm(id: Column, multiplier: Long = 2654435761L): Column =
    pmod(pmod(id, lit(2147483648L)) * lit(multiplier), lit(2147483648L))

  /** Percentage bucket in [0, 100) from the TOP bits of [[knuthPerm]]:
    * (perm · 100) >> 31 — Knuth's actual prescription (take the high
    * bits of id·C). The obvious-looking alternative, (id·C) mod 100, is
    * NOT a hash: multiplication mod 100 depends only on id mod 100, so
    * that bucket was PERIODIC in the id with period 100 — strided id
    * allocations (per-shard blocks of 100, ids scaled by 100) collapsed
    * whole strata into one bucket, and two different multipliers still
    * produced functionally dependent buckets (each a fixed permutation
    * of id mod 100), silently re-correlating decisions that must be
    * independent. High bits of id·C mix every input bit; spec-pinned on
    * strided ids (ScaleSpec). */
  def pctBucket(id: Column, multiplier: Long): Column =
    shiftrightunsigned(knuthPerm(id, multiplier) * lit(100L), 31)

  /** Deterministic train/val/test assignment from a stable id key:
    * bucket = [[pctBucket]] of the Knuth-permuted id, range-mapped by
    * the given percentage cuts. Id-keyed (not content-keyed) on
    * purpose: the split survives re-tokenization/re-cleaning of the
    * content, the property a training pipeline actually needs. Pure
    * per-row arithmetic — no shuffle, no RNG state, reproducible on any
    * engine (the DuckDB oracle replays it verbatim). */
  def idSplit(df: DataFrame, idCol: String,
              cuts: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10)): DataFrame = {
    require(cuts.map(_._2).sum == 100, "split percentages must sum to 100")
    val bucket = pctBucket(col(idCol), 2654435761L)
    val bounds = cuts.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val expr = cuts.zip(bounds).foldLeft(None: Option[Column]) {
      case (acc, ((name, _), hi)) =>
        Some(acc match {
          case None => when(bucket < hi, lit(name))
          case Some(c) => c.when(bucket < hi, lit(name))
        })
    }.get
    df.withColumn("split", expr)
  }

  /** Deterministic per-stratum sampling from a stable id key — the
    * oracle-replayable form of `df.stat.sampleBy`: keep a row iff its
    * [[pctBucket]] (multiplier 2246822519) falls below the stratum's
    * kept PERCENTAGE. Same shuffle-free, RNG-free, re-tokenization-
    * stable properties as [[idSplit]]. The multiplier DIFFERS from
    * [[idSplit]]'s on purpose: with the same constant a 25% sample
    * would be a strict subset of the train split (the two decisions
    * would read the same bucket), biasing any pipeline that composes
    * them. Strata absent from `percents` are dropped. */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
                           percents: Map[String, Int]): DataFrame = {
    require(percents.values.forall(p => p >= 0 && p <= 100),
      "percentages must be in [0, 100]")
    val bucket = pctBucket(col(idCol), 2246822519L)
    val rate = coalesce(element_at(typedLit(percents), col(strataCol)), lit(0))
    df.filter(bucket < rate)
  }

  /** Token-budget corpus mixing: per stratum, keep documents — in the
    * same seedless Knuth-hash pseudo-random order as
    * [[stratifiedHashSample]] — until the stratum's TOKEN budget is
    * exhausted (running sum ≤ budget). This is the mixture-weights
    * primitive of training-corpus assembly: budgets per source express
    * the target mix in tokens (what the model actually consumes), not
    * documents, and the hash order makes the selection reproducible and
    * stable under corpus appends (a new doc displaces only docs hashed
    * after it in its own stratum). The cumulative-sum window scans each
    * stratum's partition sequentially — for strata far larger than
    * their budget, pre-thin with [[stratifiedHashSample]] first so the
    * window sees a budget-sized candidate set rather than the stratum. */
  def tokenBudgetSample(df: DataFrame, idCol: String, strataCol: String,
                        tokenCol: String, budgetPerStratum: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hv = knuthPerm(col(idCol))
    val cum = sum(col(tokenCol))
      .over(Window.partitionBy(strataCol).orderBy(hv.asc, col(idCol).asc))
    df.withColumn("__cum", cum)
      .filter(col("__cum") <= budgetPerStratum)
      .drop("__cum")
  }

  /** Deterministic dense ids 1..n ordered by `sortCols`, WITHOUT the
    * single-partition global window that `row_number().over(Window.orderBy)`
    * costs: range-repartition on the sort key (total order across
    * partitions), sort within each partition, then add per-partition
    * offsets from one lightweight count job. Equal to global row_number
    * when the sort key is unique, and every stage stays fully parallel at
    * any scale.
    *
    * COLUMNAR — no RDD zipWithIndex (whose `.rdd` decodes every row out
    * of Tungsten into external `Row`s and re-encodes them): the sorted
    * layout is materialized ONCE with an eager localCheckpoint, the
    * within-partition index is the low 33 bits of
    * `monotonically_increasing_id()` (by its contract: pid << 33 |
    * per-partition counter — valid while a partition holds < 2³³ ≈ 8.5B
    * rows, guaranteed by any sane maxPartitionBytes), and the offsets are
    * one ≤`parts`-row count job turned into a literal lookup map.
    *
    * The materialization barrier is load-bearing, not a convenience:
    * range-exchange boundaries are re-SAMPLED per execution (the sampler
    * is seeded by the rdd id), so a counts job and the final pass over a
    * lazy plan can see DIFFERENT partitionings — measured: ids silently
    * off by ±partition-size drift (in-query ReusedExchange can't be
    * relied on either; column pruning diverges the branch subtrees).
    * zipWithIndex pays the same barrier by re-reading its shuffle files;
    * here the frozen layout stays InternalRow-encoded end to end. On a
    * real cluster swap localCheckpoint for a reliable checkpoint dir.
    * The id expression is non-deterministic, which also keeps Catalyst
    * from reordering it below the checkpoint scan. */
  def denseIds(df: DataFrame, idCol: String, sortCols: Seq[String],
               numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(parts, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .localCheckpoint(eager = true)
    // rows per (now frozen) partition — driver-sized by construction.
    // The same job GUARDS the monotonically_increasing_id bit-layout
    // assumption (pid << 33 | counter is "the current implementation"
    // per Spark's docs): if a future Spark changes the layout, ids would
    // silently corrupt at deploy time — so verify, per partition, that
    // the high bits equal the pid and the low 33 bits are exactly the
    // contiguous counter 0..n-1, and fail loudly otherwise.
    val lowMask = (1L << 33) - 1
    val stats = sorted
      .select(spark_partition_id().as("__pid"),
        monotonically_increasing_id().as("__mid"))
      .groupBy(col("__pid"))
      .agg(count(lit(1)).as("n"),
        min(shiftrightunsigned(col("__mid"), 33)).as("hi_min"),
        max(shiftrightunsigned(col("__mid"), 33)).as("hi_max"),
        min(col("__mid").bitwiseAND(lit(lowMask))).as("lo_min"),
        max(col("__mid").bitwiseAND(lit(lowMask))).as("lo_max"))
      .collect()
    stats.foreach { r =>
      val (pid, n) = (r.getInt(0), r.getLong(1))
      require(r.getLong(2) == pid && r.getLong(3) == pid &&
        r.getLong(4) == 0L && r.getLong(5) == n - 1,
        s"monotonically_increasing_id bit layout changed (partition $pid: " +
          s"hi=[${r.getLong(2)},${r.getLong(3)}] lo=[${r.getLong(4)},${r.getLong(5)}] " +
          s"n=$n) — denseIds needs a new per-partition index derivation")
    }
    val counts = stats.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val offsetByPid = typedLit((0 until parts).map(p => p -> offsets(p)).toMap)
    sorted.withColumn(idCol,
      element_at(offsetByPid, spark_partition_id()) +
        monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)) + lit(1L))
  }
}
