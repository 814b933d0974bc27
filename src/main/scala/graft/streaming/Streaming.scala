package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming layer (SURVEY.md §2.10): the reference's daily
  * cron + WRITE_APPEND pattern subsumed by a file-source stream with
  * `Trigger.AvailableNow`, plus watermarked tumbling-window aggregation
  * and mapGroupsWithState sessionization — the stateful ops a
  * training-data pipeline needs for incremental ingest.
  *
  * The batch layer's q_time_window / q_sessionize are the oracle-checked
  * semantics; the specs assert stream output == batch output on the same
  * files (the exactly-once replay guarantee).
  */
object Streaming {

  /** File-source stream over the events table inside an sf directory
    * (file sources need a directory; the glob filter selects the table).
    *
    * File streams require an explicit schema, but the testdata's `ts`
    * physical type has drifted across generations (INT64 nanos →
    * TIMESTAMP_MICROS/NTZ), so the schema is SNIFFED from the parquet
    * footer via a batch read (footer-only, no row I/O) instead of being
    * hardcoded, and the ts canonicalization is the same shared branch
    * the batch loader uses ([[graft.Tables.canonicalTs]]) — stream and
    * batch cannot disagree on timestamp semantics. */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val physical = spark.read
      .option("pathGlobFilter", "events.parquet").parquet(sfDir).schema
    graft.Tables.canonicalTs(
      spark.readStream
        .schema(physical)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir))
  }

  /** Watermarked tumbling 1-hour window counts + sums (the streaming form
    * of q_time_window). */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("hour"), col("cnt"), col("sum_value"))

  /** Streaming event-rate anomaly alarm — the streaming sibling of batch
    * q_rate_anomaly: watermarked hourly counts z-scored against FIXED
    * reference moments (mu, sigma), emitting only anomalous hours. The
    * moments come from a trailing batch profile (the batch query), not
    * from the stream itself: an online mean would adapt TO the anomaly it
    * is supposed to flag. State is the engine-managed window store,
    * evicted past the watermark — bounded like the tumbling agg. */
  def rateAnomaly(events: DataFrame, mu: Double, sigma: Double): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("hour"), col("cnt"))
      .withColumn("z", round((col("cnt") - lit(mu)) / lit(sigma), 4))
      .filter(abs(col("z")) > 2.0)

  /** Native gap-based SESSION WINDOWS — the streaming sibling of batch
    * q_sessionize's lag+cumsum: `session_window(ts, gap)` opens a window
    * [ts, ts+gap) per event and merges overlapping windows per user, so
    * a >gap silence closes the session. Engine-managed state, evicted
    * once the watermark passes a session's end — bounded like the
    * tumbling-window agg, no custom-state code. Boundary nuance vs the
    * batch query: session_window SPLITS at a gap of exactly `gap`
    * (abutting windows don't overlap) while q_sessionize's
    * `diff > 1800` split keeps it — identical everywhere else, and on
    * real timestamps an exact-to-the-microsecond gap is measure-zero
    * (the stream-equals-batch spec also cross-checks structure against
    * the lag+cumsum form on the fixture). */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("session_value"))

  /** Runs a streaming query to completion with Trigger.AvailableNow into
    * an in-memory table; returns the result. AvailableNow = process all
    * available input then stop — the cron-batch replacement.
    *
    * `statePartitions`: stateful operators create one state-store
    * instance PER shuffle partition PER store (a stream-stream join
    * keeps four stores per partition), and every micro-batch commits
    * every instance to the checkpoint — so the state partition count is
    * a per-query throughput knob, not something to inherit from the
    * batch session default. It is pinned into the offset log at first
    * start, exactly as a production deployment sizes it per checkpoint.
    * The override is scoped to a CLONED session (`newSession` shares the
    * SparkContext but conf is session-local), so batch queries planned
    * concurrently in the caller's session — e.g. parallel test suites
    * on a shared SparkSession — never observe the streaming value; the
    * query plan is rebound into the clone via the logical plan. Results
    * are partition-count invariant (oracle-checked). Measured on the
    * interval join: 32 → 8 partitions cuts 128 store commits/batch
    * to 32. */
  def runAvailableNow(spark: SparkSession, out: DataFrame, tableName: String,
                      outputMode: OutputMode = OutputMode.Complete(),
                      statePartitions: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.graftshim
    val (sess, df) = statePartitions match {
      case Some(n) =>
        val s2 = spark.newSession()
        s2.conf.set("spark.sql.shuffle.partitions", n.toString)
        (s2, graftshim.ofRows(s2, graftshim.analyzed(out)))
      case None => (spark, out)
    }
    val q = df.writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    sess.table(tableName)
  }

  /** Watermarked stream-stream interval join: errors within 10 minutes
    * after a click by the same user. Both sides carry watermarks and the
    * join condition bounds event time on both ends, so the state store
    * evicts rows once the watermark passes — bounded state at any scale
    * (an unbounded-interval stream join would grow state forever). */
  def clickErrorJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val errors = events.filter(col("event_type") === "error")
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("err_user"), col("ts").as("err_ts"),
        col("event_id").as("err_id"))
    clicks.join(errors,
      col("user_id") === col("err_user") &&
        col("err_ts") >= col("click_ts") &&
        col("err_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))
      .select("user_id", "click_id", "err_id", "click_ts", "err_ts")
  }

  /** LEFT-OUTER watermarked stream-stream join — the "clicks that got NO
    * error within 10 minutes" detector. Same bounded-state interval join
    * as [[clickErrorJoin]], but unmatched clicks are ALSO emitted
    * (NULL-extended) once the watermark proves no matching error can
    * still arrive. Matches emit immediately; a null row for click c
    * emits only after watermark > c.click_ts + 10 min, where the GLOBAL
    * watermark is the MIN across both sides' watermark nodes — with a
    * sparse error stream the errors side is the binding one, so the
    * unmatched tail inside min(max click ts, max error ts) − 70 min
    * stays in state at stream end (spec-pinned). */
  def clickErrorJoinLeftOuter(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val errors = events.filter(col("event_type") === "error")
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("err_user"), col("ts").as("err_ts"),
        col("event_id").as("err_id"))
    clicks.join(errors,
      col("user_id") === col("err_user") &&
        col("err_ts") >= col("click_ts") &&
        col("err_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
      .select("user_id", "click_id", "err_id", "click_ts", "err_ts")
  }

  /** Streaming distribution-drift monitor — the in-flight form of batch
    * q_hist_drift: per watermarked 6-hour window, the event-value
    * histogram (10 fixed $50-wide bins, cents div 5000) is compared
    * against a FIXED baseline profile (milli-shares from a trailing
    * batch profile — an online baseline would adapt to the drift it
    * should flag), emitting one row per window with the per-bin L1 gap
    * in milli units. The whole check is ONE streaming aggregation: bin
    * counts land as 10 conditional sums in the SAME groupBy(window) agg
    * (never a second agg on an agg, which append mode cannot run), and
    * the share/compare arithmetic is per-row — so state is the
    * engine-managed window store, evicted past the watermark.
    * Integer milli arithmetic end to end, matching the batch sibling. */
  def driftMonitor(events: DataFrame, baselineMilli: Seq[Long]): DataFrame = {
    require(baselineMilli.length == 10, "baseline must carry 10 bin shares")
    val bin = expr("CAST(round(value * 100) AS BIGINT) div 5000")
    val binSums = (0 until 10).map(k =>
      sum(when(bin === k, 1L).otherwise(0L)).as(s"b$k"))
    val agged = events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "6 hours"))
      .agg(binSums.head, binSums.tail :+ count(lit(1)).as("total"): _*)
    val drift = (0 until 10).map(k =>
      abs(expr(s"(b$k * 1000L) div total") - lit(baselineMilli(k))))
      .reduce(_ + _)
    agged.select(col("window.start").as("win_start"), col("total"),
      drift.as("drift_milli"))
  }

  /** Batch-side baseline profile for [[driftMonitor]]: milli-share per
    * $50 value bin over a reference frame. Driver-sized (10 rows) by
    * construction. */
  def driftBaseline(reference: DataFrame): Seq[Long] = {
    val counts = reference
      .groupBy(expr("CAST(round(value * 100) AS BIGINT) div 5000").as("bin"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    (0 until 10).map(k => counts.getOrElse(k.toLong, 0L) * 1000L / total)
  }

  /** Stream-static enrichment join: each micro-batch of the stream joins
    * a static dimension; the static side is broadcast (re-resolved per
    * batch, so slowly-changing dims pick up updates between triggers).
    * The standard shape for decorating an event stream with reference
    * data — no state store involved, unlike stream-stream joins. */
  def enriched(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key))

  /** STREAMING incremental near-dup flagging — the in-flight form of
    * [[graft.dedup.Dedup.incrementalPairs]]: each micro-batch of incoming
    * docs computes its minhash band buckets PER ROW (pure expressions —
    * [[graft.dedup.Dedup.bandBucketArray]] — no aggregation, so no stream
    * state), stream-static joins them against the persisted store's
    * buckets, and exact-verifies surviving candidates against the store's
    * shingle-hash sets. Emits (doc_id, dup_of, jaccard): an arriving doc
    * flagged against every stored near-dup ≥ t.
    *
    * No state store anywhere — the store side is a static parquet scan,
    * and dedup WITHIN an increment stays the batch pass's job
    * ([[graft.dedup.Dedup.incrementalPairs]]), keeping the stream
    * unconditionally replay-safe. CAVEAT: a path-based parquet static
    * side freezes its FILE LISTING when the store DataFrames are
    * created — survivors appended to the store while this stream runs
    * are NOT picked up by later micro-batches. To dedup against a store
    * that grows mid-stream, rebuild the join inside `foreachBatch`
    * (re-reading the store per batch) or back the store with a table
    * format whose file index refreshes. Statelessness has a
    * price: a pair colliding in k > 1 bands is emitted k times
    * (a streaming `distinct` would grow a state store forever) — flag
    * consumers key on (doc_id, dup_of), where the multiplicity is
    * idempotent. */
  def incrementalDedupStream(docs: DataFrame, store: graft.dedup.SignatureStore,
                             threshold: Double,
                             numHashes: Int = 64, bands: Int = 8): DataFrame = {
    // the ONE spec-pinned signature lineage (Dedup.shingleHashSets) —
    // not a local re-derivation, so a tokenizer/shingling change can't
    // silently desynchronize stream-side candidates from the store
    val withSig = graft.dedup.Dedup.shingleHashSets(docs)
      .withColumn("bucket_arr",
        graft.dedup.Dedup.bandBucketArray(col("hs"), numHashes, bands))
      .select(col("doc_id"), col("hs"),
        posexplode(col("bucket_arr")).as(Seq("band", "bucket")))
    val cand = withSig
      .join(store.buckets.withColumnRenamed("doc_id", "dup_of"), Seq("band", "bucket"))
      .filter(col("doc_id") =!= col("dup_of"))
      .select("doc_id", "hs", "dup_of")
    cand
      .join(store.sets.select(col("doc_id").as("dup_of"), col("hs").as("hsb")),
        Seq("dup_of"))
      .withColumn("common",
        graft.functions.SortedIntersectCount.sorted_intersect_count(col("hs"), col("hsb")))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("hs")) + size(col("hsb")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id"), col("dup_of"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Streaming EXACT dedup with BOUNDED state: drop rows whose content
    * hash was already seen within the event-time watermark window.
    * Plain streaming `dropDuplicates` keys state forever — unbounded
    * growth on an unbounded stream; `dropDuplicatesWithinWatermark`
    * evicts a key's state once the watermark passes it, so memory is
    * O(keys per watermark window) at any stream length. The contract a
    * crawl-ingest front door wants: exact copies land together or close
    * (re-fetches, mirror bursts), so a disorder-bounded window catches
    * them; copies farther apart than the watermark are the batch/store
    * layer's job ([[runStreamingIngest]]'s exact-hash path, which
    * consults ALL history). Emits first-seen rows.
    *
    * State key is (xxhash64, length) — the batch exact-dedup path rejoins
    * on full text so a 2⁻⁶⁴ hash collision can never drop a
    * non-duplicate (Dedup.exactDupLosers); streaming state can't hold
    * full texts, so the length widens the collision bar to "same 64-bit
    * hash AND same byte length" at 8 bytes/key of extra state. */
  def dedupedStream(docs: DataFrame, tsCol: String, watermark: String): DataFrame =
    docs
      .withColumn("__h", xxhash64(col("text")))
      .withColumn("__len", length(col("text")).cast("long"))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__h", "__len")
      .drop("__h", "__len")

  /** STREAMING INGEST — the store-GROWTH-aware form of
    * [[incrementalDedupStream]]: instead of one stream-static join whose
    * store file listing freezes when the stream starts, each micro-batch
    * runs the FULL [[graft.dedup.SignatureStore.ingest]] lifecycle inside
    * `foreachBatch` — flag duplicates against (store ∪ batch), drop them,
    * APPEND the survivors' signatures — re-reading the store per batch
    * (plus an explicit [[graft.dedup.SignatureStore.refresh]], so bucket
    * files appended by a DIFFERENT process between triggers are re-listed
    * too). A near-dup arriving a micro-batch after its original is
    * therefore dropped — the frozen-listing join provably misses it
    * (spec-pinned, StreamingSpec). The store must exist at `storePath`
    * before the stream starts ([[graft.dedup.SignatureStore.write]] a
    * seed batch, possibly empty).
    *
    * Batch i's survivors land at `outPath/survivors/batch_id=i` and its
    * dropped ids at `outPath/dropped/batch_id=i` (idempotent per-batch
    * overwrite, same pattern as [[runForeachBatchParquet]]).
    *
    * Exactly-once CAVEAT: the store append and the checkpoint commit are
    * two non-atomic writes. A crash BETWEEN them replays the batch
    * against a store that already holds its signatures, so the replayed
    * docs exact-match themselves and the batch's survivor set
    * under-reports (the store itself stays duplicate-free — re-appending
    * zero survivors is harmless). A transactional table format under the
    * store (or staging appends keyed by batch id) closes that window;
    * the data movement is unchanged. */
  def runStreamingIngest(spark: SparkSession, docs: DataFrame,
                         storePath: String, threshold: Double,
                         outPath: String, checkpointDir: String,
                         numHashes: Int = 64, bands: Int = 8): Unit = {
    val q = docs.writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.dedup.SignatureStore.refresh(spark, storePath)
        // ingest returns checkpointed snapshots (their blocks release
        // with the closure's references once this batch completes)
        val (survivors, dropped) = graft.dedup.SignatureStore.ingest(
          spark, batch, storePath, threshold, numHashes, bands)
        survivors.write.mode("overwrite").parquet(s"$outPath/survivors/batch_id=$id")
        dropped.write.mode("overwrite").parquet(s"$outPath/dropped/batch_id=$id")
      }
      .start()
    q.awaitTermination()
  }

  /** STREAMING MATERIALIZED-VIEW MAINTENANCE: each micro-batch folds
    * into the [[graft.operators.IncrementalAgg]] state via its
    * staging-swap refresh — the streaming face of the same mergeable
    * (cnt, sum) store the batch path uses, so a dashboard reads ONE
    * state table regardless of how the data arrived. Per-batch work is
    * one partial aggregate over the batch plus a merge bounded by group
    * cardinality — no growing Spark streaming state, no watermark
    * (running totals over all time).
    *
    * Exactly-once CAVEAT (same shape as [[runStreamingIngest]]): the
    * state swap and the checkpoint commit are two non-atomic writes — a
    * crash between them replays the batch into a state that already
    * holds it, double-counting that batch. foreachBatch delivers
    * at-least-once; a transactional table under the state closes the
    * window. Stream ≡ batch is spec-pinned (StreamingSpec). */
  def runStreamingAgg(spark: SparkSession, rows: DataFrame,
                      statePath: String, grpCol: String, valCol: String,
                      checkpointDir: String): Unit = {
    val q = rows.writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.IncrementalAgg.refresh(
          spark, statePath, batch, grpCol, valCol)
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming heavy hitters — the stream sibling of
    * [[graft.text.HeavyHitters]]: [[runStreamingAgg]] with a unit value
    * folds each micro-batch's token counts into the crash-safe
    * staging-swap state ([[graft.operators.IncrementalAgg]]), and top-k
    * at ANY point in the stream is a TakeOrdered over the vocab-sized
    * state table — counts are exact merges of exact partials, so unlike
    * count-min/SpaceSaving there is no error term to track across
    * batches; the state table (one row per distinct token) is the only
    * thing that grows. */
  def topTokensFromState(spark: SparkSession, statePath: String,
                         k: Int): DataFrame =
    graft.operators.IncrementalAgg.readState(spark, statePath)
      .select(col("token"), col("cnt"))
      .orderBy(desc("cnt"), asc("token")).limit(k)

  /** foreachBatch parquet sink — the escape hatch to any batch writer,
    * made replay-safe: each micro-batch overwrites its own
    * `batch_id=<id>` directory, so a batch replayed after a failure
    * lands on top of itself instead of appending duplicates (the
    * idempotent-overwrite pattern; the reference's cron WRITE_APPEND has
    * no such guard). With `checkpointDir`, a re-run processes nothing
    * already committed — exactly-once end to end. */
  def runForeachBatchParquet(out: DataFrame, path: String,
                             checkpointDir: String): Unit = {
    val q = out.writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.write.mode("overwrite").parquet(s"$path/batch_id=$id")
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming ANN ingest — the embedding-pipeline front door: each
    * micro-batch of new vectors assigns to the index's EXISTING
    * centroids and appends to its cell partitions
    * ([[graft.similarity.Ivf.appendToIndex]] — the signature-store
    * ingest pattern applied to the vector index). Probes see appended
    * vectors as soon as their batch commits. The stream checkpoint
    * makes COMPLETED batches exactly-once across restarts; a crash
    * inside a batch replays that batch's append — the same non-atomic
    * window the batch append documents (run one ingest stream per
    * index). Recall-drift bound and re-cluster rule: see
    * [[graft.similarity.Ivf.appendToIndex]]. */
  def runIndexIngest(spark: SparkSession, newVecs: DataFrame,
                     indexPath: String, checkpointDir: String): Unit = {
    val q = newVecs.writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.similarity.Ivf.appendToIndex(spark, indexPath, batch)
      }
      .start()
    q.awaitTermination()
  }

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long, value: Double)
  case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

  /** `transformWithState` processor (the Spark 4 arbitrary-state API —
    * successor of mapGroupsWithState: named state variables, TTL,
    * timers): per-user running totals in a ValueState, emitting the
    * updated cumulative row per user per micro-batch. TTLConfig.NONE
    * here; a production deployment bounds state with a TTL instead of
    * the GroupStateTimeout dance. */
  private class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserTotals] {
    @transient private var totals:
      org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)]("totals",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaDouble),
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[Event],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTotals] = {
      var (n, s) = if (totals.exists()) totals.get() else (0L, 0.0)
      rows.foreach { e => n += 1; s += e.value }
      totals.update((n, s))
      Iterator.single(UserTotals(user, n, s))
    }
  }

  /** Per-user running totals via `transformWithState` — requires the
    * RocksDB state store provider (set here on the session; the HDFS
    * default doesn't support the new state API). Update output mode:
    * each micro-batch emits the refreshed cumulative row for every user
    * it touched. Under AvailableNow the final row per user equals the
    * batch aggregate (spec-pinned). */
  def runningTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    events.select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("value")).as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
      .toDF()
  }
  case class SessionState(sessionId: Long, lastTs: Long, nEvents: Long, sumValue: Double)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long, session_value: Double)
  case class OpenSession(sessionId: Long, startTs: Long, lastTs: Long,
                         nEvents: Long, sumValue: Double)
  case class ClosedSession(user_id: Long, session_id: Long, n_events: Long,
                           session_value: Double, session_start: Long)

  /** flatMapGroupsWithState sessionization emitting CLOSED sessions — the
    * production shape: a session is emitted the moment a >30-min gap
    * proves it over, rather than aggregating forever; state holds exactly
    * one open session per user. Under AvailableNow each user's final
    * session stays open (no later event closes it) — the spec accounts
    * for that; a live deployment would close it via event-time timeout.
    *
    * Ordering: rows are sorted within each micro-batch; an event that
    * arrives in a LATER batch with a timestamp behind the open session's
    * frontier is dropped (watermark-style too-late semantics) — folding
    * it in would rewind `lastTs` and fabricate or merge session splits
    * that globally-ordered batch processing would never produce. */
  def closedSessions(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = events.select(
      col("event_id"), col("ts").cast("timestamp").as("ts"),
      col("user_id"), col("value")).as[Event]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, rows, state: GroupState[OpenSession]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val closed = scala.collection.mutable.ListBuffer.empty[ClosedSession]
          var open = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime / 1000
            open match {
              case Some(s) if t < s.lastTs => // too late: behind the frontier
              case Some(s) if t - s.lastTs <= 1800 =>
                open = Some(s.copy(lastTs = t,
                  nEvents = s.nEvents + 1, sumValue = s.sumValue + e.value))
              case Some(s) =>
                closed += ClosedSession(user, s.sessionId, s.nEvents,
                  s.sumValue, s.startTs)
                open = Some(OpenSession(s.sessionId + 1, t, t, 1L, e.value))
              case None =>
                open = Some(OpenSession(1L, t, t, 1L, e.value))
            }
          }
          open.foreach(state.update)
          closed.iterator
      }.toDF()
  }

  /** mapGroupsWithState sessionization (gap > 30 min splits sessions) —
    * the custom-state streaming op (KeyValueGroupedDataset). Batch
    * q_sessionize is the same semantics via lag+cumsum. Here state holds
    * only the *open* session per user: O(users) memory, watermark-bounded
    * at scale. For simplicity this AvailableNow demo emits the final
    * per-user session count. */
  def sessionCounts(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = events.select(
      col("event_id"), col("ts").cast("timestamp").as("ts"),
      col("user_id"), col("value")).as[Event]
    typed.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](GroupStateTimeout.NoTimeout()) {
        (user, rows, state: GroupState[SessionState]) =>
          // batch-per-trigger arrival: sort this trigger's rows by time
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0.0))
          sorted.foreach { e =>
            val t = e.ts.getTime / 1000
            st =
              if (st.lastTs != Long.MinValue && t - st.lastTs <= 1800)
                st.copy(lastTs = t, nEvents = st.nEvents + 1, sumValue = st.sumValue + e.value)
              else
                SessionState(st.sessionId + 1, t, 1L, e.value)
          }
          state.update(st)
          SessionOut(user, st.sessionId, st.nEvents, st.sumValue)
      }.toDF()
  }
}
