package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The persisted artifact of cross-run incremental dedup: the LSH band
  * buckets (candidate generation) and sorted shingle-hash sets (exact
  * verification) of every document already admitted to the corpus.
  *
  * Lifecycle per increment: read the store → [[Dedup.incrementalPairs]]
  * (new batch vs store + within batch) → drop/cluster the flagged docs →
  * [[SignatureStore.append]] the SURVIVORS' signatures so the next
  * increment dedups against everything kept so far. Only the new batch is
  * ever tokenized/shingled/hashed; the historical corpus contributes
  * 8-byte bucket keys and hash arrays straight from parquet.
  *
  * 100 TB layout: `buckets` is the join-heavy side, so it is PERSISTED
  * BUCKETED on (band, bucket) — written via `bucketBy(BucketCount).
  * saveAsTable` to an explicit location, re-registered from disk by
  * [[SignatureStore.read]] in later sessions — and each increment's
  * (new × store) bucket join plans with NO exchange on the store side:
  * only the new batch (tiny vs corpus) shuffles into the store's layout
  * (spec-pinned in DedupSimSpec). `sets` is only ever joined on doc_id
  * for the (small) candidate list, so a semi-join prunes that scan to
  * candidate row groups; it stays flat parquet.
  */
final case class SignatureStore(buckets: DataFrame, sets: DataFrame,
                                hashes: DataFrame)

object SignatureStore {
  /** Disk-bucket count for the `buckets` artifact. Every writer and
    * reader of one store path must agree on it (the table registration
    * pins it; saveAsTable append validates against the existing spec).
    * 8 matches the test harness's parallelism; a 100 TB deployment
    * raises it to O(cluster cores) — e.g. 4096 — when the store is
    * FIRST created. Appends add files per bucket, so also re-compact
    * (one bucketed rewrite) if increments make buckets many-filed. */
  val BucketCount = 8

  private def bucketsPath(path: String) = s"$path/buckets"
  private def setsPath(path: String) = s"$path/sets"
  private def hashesPath(path: String) = s"$path/hashes"

  /** Fully-qualified canonical spelling of a directory: scheme +
    * authority added, relative paths resolved against the FS working
    * directory, duplicate/trailing slashes collapsed. Every spelling of
    * one location must map to ONE catalog table name below — otherwise
    * a second registration over the same files would bypass the existing
    * table's bucket-spec validation on append. */
  private def qualified(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    p.makeQualified(fs.getUri, fs.getWorkingDirectory).toString
  }

  /** Catalog table name for a store path's buckets — derived from the
    * NORMALIZED path so distinct stores in one session never collide and
    * re-registration is idempotent per location (not per spelling). */
  private def bucketsTable(spark: SparkSession, path: String): String =
    "graft_sigstore_" + java.security.MessageDigest.getInstance("MD5")
      .digest(qualified(spark, bucketsPath(path)).getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString

  /** Re-register the bucketed external table over an existing on-disk
    * store (fresh session — the cross-run case: the in-memory catalog
    * died with the session that wrote the store, but the bucket-id file
    * naming survives on disk, so a CLUSTERED BY re-registration restores
    * exchange-free reads). No-op when already registered. */
  private def registerBuckets(spark: SparkSession, path: String): Unit = {
    val tbl = bucketsTable(spark, path)
    if (!spark.catalog.tableExists(tbl)) {
      val loc = bucketsPath(path)
      val ddl = spark.read.parquet(loc).schema.toDDL
      // single quotes doubled: a path like /data/bob's corpus must not
      // terminate the LOCATION string literal
      val locSql = loc.replace("'", "''")
      spark.sql(
        s"""CREATE TABLE $tbl ($ddl) USING PARQUET
           |CLUSTERED BY (band, bucket) SORTED BY (band, bucket)
           |INTO $BucketCount BUCKETS
           |LOCATION '$locSql'""".stripMargin): Unit
    }
  }

  private def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Filesystem-agnostic existence check (java.io.File would always say
    * no for hdfs:// or s3a:// paths — exactly the deployments the store
    * exists for). */
  private def dirExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Compute the store frames for a batch (nothing is written):
    * band buckets + shingle-hash sets (near-dup) and content hashes
    * (exact dedup, [[Dedup.incrementalExactLosers]]). Buckets come from
    * the per-row banding expression over the sets (spec-pinned identical
    * to the aggregated path) so both artifacts share one shingling
    * lineage. */
  def build(docs: DataFrame, numHashes: Int = 64, bands: Int = 8): SignatureStore = {
    import org.apache.spark.sql.functions._
    val sets = Dedup.shingleHashSets(docs)
    SignatureStore(
      sets.select(col("doc_id"),
        posexplode(Dedup.bandBucketArray(col("hs"), numHashes, bands))
          .as(Seq("band", "bucket"))),
      sets,
      docs.select(col("doc_id"), xxhash64(col("text")).as("h")))
  }

  /** Initialize (or replace) the on-disk store with a batch's signatures. */
  def write(docs: DataFrame, path: String,
            numHashes: Int = 64, bands: Int = 8): Unit =
    save(build(docs, numHashes, bands), path, "overwrite")

  /** Store-update writer: append a new batch's signatures (run AFTER its
    * incremental pass, over the batch's surviving docs). */
  def append(docs: DataFrame, path: String,
             numHashes: Int = 64, bands: Int = 8): Unit =
    save(build(docs, numHashes, bands), path, "append")

  /** ONE FULL INGEST INCREMENT — the lifecycle the store exists for,
    * composed end to end: drop the new batch's exact duplicates
    * ([[Dedup.incrementalExactLosers]]) and near-duplicates
    * ([[Dedup.incrementalPairs]] ≥ threshold), append the survivors'
    * signatures, return (survivors, dropped).
    *
    * Drop policy per near-dup pair: the STORE side is always canonical
    * (those docs were already accepted by an earlier increment); within
    * the batch, CONSERVATIVE single-pass greedy — the larger id of EVERY
    * new-new pair is dropped, whether or not its partner survives. On a
    * chain (1,2),(2,3) this drops both 2 and 3 even though 3's only
    * partner was itself dropped: near-dup chains lose everything but
    * their smallest member. That over-drops relative to a
    * frontier/cluster policy (which needs the iterative closure —
    * [[Dedup.dupClusters]] — per increment) but guarantees pairwise-
    * clean survivors in ONE pass with no iteration. Idempotent:
    * re-ingesting the same batch drops everything (spec-pinned). Docs
    * too short to shingle can only be dropped by the exact-hash path. */
  def ingest(spark: SparkSession, newDocs: DataFrame, path: String,
             threshold: Double,
             numHashes: Int = 64, bands: Int = 8): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions._
    val store = read(spark, path)
    val exactLosers = Dedup.incrementalExactLosers(newDocs, store)
    // persist: the pair subtree (signing + store joins + exact verify) is
    // referenced three times by the drop policy below — without the cache
    // the dominant cost of the lifecycle runs 3×+. Explicitly unpersisted
    // once the `dropped` checkpoint below has materialized (a long-lived
    // session running daily increments must not accumulate blocks
    // waiting on GC).
    val pairs = Dedup.incrementalPairs(newDocs, store, threshold, numHashes, bands)
      .persist()
    val storeIds = store.sets.select("doc_id")
    val dropPartnerOfStoreA = pairs
      .join(storeIds.withColumnRenamed("doc_id", "a_id"), Seq("a_id"), "left_semi")
      .select(col("b_id").as("doc_id"))
    val dropPartnerOfStoreB = pairs
      .join(storeIds.withColumnRenamed("doc_id", "b_id"), Seq("b_id"), "left_semi")
      .select(col("a_id").as("doc_id"))
    val dropNewerOfNewPair = pairs
      .join(storeIds.withColumnRenamed("doc_id", "a_id"), Seq("a_id"), "left_anti")
      .join(storeIds.withColumnRenamed("doc_id", "b_id"), Seq("b_id"), "left_anti")
      .select(col("b_id").as("doc_id"))
    // The returned frames are locally-CHECKPOINTED (lineage cut), not
    // merely persisted — load-bearing, not a convenience: the append
    // below ends with Spark's refreshByPath on the store location, which
    // invalidates and lazily RE-COMPILES every cached plan referencing
    // the store's files. A persisted `survivors` would therefore silently
    // recompute against the GROWN store on the caller's next action —
    // where every surviving doc exact-matches its own just-appended
    // signature — and collapse to the empty set (observed; spec-pinned in
    // StreamingSpec/DedupSimSpec). Checkpointed rows reference nothing,
    // so they are immune. Blocks release when the frames are GC'd; swap
    // for a reliable checkpoint dir on a real cluster.
    val (survivors, dropped) =
      try {
        val dropped = exactLosers
          .union(dropPartnerOfStoreA).union(dropPartnerOfStoreB)
          .union(dropNewerOfNewPair).distinct().localCheckpoint()
        (newDocs.join(dropped, Seq("doc_id"), "left_anti").localCheckpoint(), dropped)
      } finally { pairs.unpersist(); () }
    append(survivors, path, numHashes, bands)
    (survivors, dropped)
  }

  /** Drop this session's cached relation/file-listing entry for the
    * store's bucketed table, so the next [[read]] re-lists the location.
    * Needed before reading a store ANOTHER process may have appended to:
    * same-session appends refresh the catalog entry automatically (the
    * insert command invalidates it), but a foreign writer's new bucket
    * files are invisible to a session that cached the listing. No-op if
    * the table isn't registered yet. */
  def refresh(spark: SparkSession, path: String): Unit = {
    val tbl = bucketsTable(spark, path)
    if (spark.catalog.tableExists(tbl)) spark.catalog.refreshTable(tbl)
  }

  def read(spark: SparkSession, path: String): SignatureStore = {
    registerBuckets(spark, path)
    SignatureStore(spark.table(bucketsTable(spark, path)),
      spark.read.parquet(setsPath(path)),
      spark.read.parquet(hashesPath(path)))
  }

  /** Leftover-staging location for [[compact]]'s rewrite — sibling of the
    * store dir so the final swap is a same-filesystem rename. */
  private def stagingPath(path: String) = s"$path.tmp"

  private def rename(spark: SparkSession, src: String, dst: String): Unit = {
    val s = new org.apache.hadoop.fs.Path(src)
    val fs = s.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.rename(s, new org.apache.hadoop.fs.Path(dst)),
      s"rename $src -> $dst failed")
  }

  /** Housekeeping for a long-lived store: every [[append]] adds one file
    * per task per bucket, so a daily cadence accumulates
    * O(days × tasks) small files per bucket — eventually the scan's
    * open-file overhead dwarfs the data. Rewrites all three artifacts
    * (buckets re-bucketed on the same spec, so incremental joins stay
    * exchange-free; sets/hashes to one compact pass) into a STAGING dir
    * (`$path.tmp`), then swaps it in via rename. The entire data-write
    * phase — the minutes-to-hours part — therefore leaves the live store
    * untouched: a crash mid-rewrite strands only a `.tmp` dir (cleaned on
    * the next compact) and readers keep serving the old consistent state
    * (spec-pinned, DedupSimSpec). Staging also removes the
    * read-own-input race and the refreshByPath cache invalidation the
    * old in-place rewrite had to localCheckpoint around.
    *
    * Residual non-atomic window: the swap itself is two directory
    * renames (live → `.old`, staging → live) — pure metadata, no data
    * copy. A crash between them leaves both `$path.old` and the staged
    * copy intact; recover by renaming either back. Concurrent ingests
    * during the swap still belong in a maintenance window (or a
    * transactional table format). */
  def compact(spark: SparkSession, path: String): Unit = {
    val staging = stagingPath(path)
    deleteDir(spark, staging) // clear any crashed predecessor's leftovers
    val store = read(spark, path)
    save(store, staging, "overwrite")
    // the staged table entry points at $path.tmp — drop both catalog
    // entries before the swap; re-register at the final location after
    // (bucket-id file naming survives the rename, so the CLUSTERED BY
    // re-registration restores exchange-free reads)
    spark.sql(s"DROP TABLE IF EXISTS ${bucketsTable(spark, staging)}"): Unit
    spark.sql(s"DROP TABLE IF EXISTS ${bucketsTable(spark, path)}"): Unit
    val old = s"$path.old"
    deleteDir(spark, old)
    rename(spark, path, old)
    rename(spark, staging, path)
    deleteDir(spark, old)
    registerBuckets(spark, path)
  }

  private def save(store: SignatureStore, path: String, mode: String): Unit = {
    val spark = store.sets.sparkSession
    // three artifacts, one shingling: the sets frame feeds the bucket
    // derivation, so cache it across the two writes (eager, so the
    // unpersist in `finally` is safe)
    val sets = store.sets.persist()
    try {
      sets.write.mode(mode).parquet(setsPath(path))
      val tbl = bucketsTable(spark, path)
      if (mode == "overwrite") {
        // drop + clear location so the CREATE under saveAsTable starts
        // clean (CTAS refuses a non-empty external location)
        spark.sql(s"DROP TABLE IF EXISTS $tbl"): Unit
        deleteDir(spark, bucketsPath(path))
      } else if (dirExists(spark, bucketsPath(path))) {
        // appending from a session that didn't create the store: restore
        // the table entry first so saveAsTable validates the bucket spec
        // instead of creating a fresh (conflicting) table
        registerBuckets(spark, path)
      }
      store.buckets.write.mode(mode)
        .bucketBy(BucketCount, "band", "bucket").sortBy("band", "bucket")
        .option("path", bucketsPath(path))
        .format("parquet")
        .saveAsTable(tbl)
      store.hashes.write.mode(mode).parquet(hashesPath(path))
    } finally { sets.unpersist(); () }
  }
}
