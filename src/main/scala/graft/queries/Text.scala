package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.text.TextFunctions._

/** Text-analysis queries over the documents table (training-data-pipeline
  * layer): per-doc stats, token frequencies, quality scoring, language ID,
  * fingerprinting, sessionization of the events stream.
  *
  * All per-row scalar work + one hash-agg shuffle where grouped — linear
  * scale-out; nothing here materializes more than (docs × tokens) rows.
  */
object Text {
  type Q = (SparkSession, String) => DataFrame

  /** Per-document stats: token count, char length, stopword ratio.
    * Ratio is a single int/int division → bit-identical cross-engine. */
  val qTextStats: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("len_chars"),
        round(stopwordRatio(col("toks")), 4).as("stop_ratio"))
      .orderBy("doc_id")

  /** Quality scoring + BPE-ish token counting, aggregated per source. */
  val qTextQuality: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("quality", qualityScore(col("toks")))
      .withColumn("bpeish", tokenCountBpeIsh(col("toks")))
      .groupBy("source")
      .agg(
        round(avg("quality"), 4).as("avg_quality"),
        sum("bpeish").as("total_bpeish"),
        count(lit(1)).as("n_docs"))
      .orderBy("source")

  /** Token frequency top-20 (explode → hash-agg → TakeOrderedAndProject).
    * The generator-side UDTF surface (§2.11 has none in the reference). */
  val qTokenTopk: Q = (s, d) =>
    Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("token"))
      .limit(20)

  /** Language-ID heuristic vs the labeled lang column: confusion counts.
    * Oracle-paired: the contains-scoring profiles are generated into the
    * DuckDB SQL from the same [[TextFunctions.langProfiles]] map, with the
    * argmax tie-break (max score, then lexicographically last code)
    * expressed as a row_number over (score DESC, cand DESC). */
  val qLangId: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("lt", lower(col("text")))
      .withColumn("lang_pred", langId(col("lt")))
      .groupBy("lang", "lang_pred")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "lang_pred")

  /** Mixed-language detection — the intra-document consistency check a
    * corpus audit runs after [[qLangId]]: language-ID each HALF of the
    * document independently; disagreement flags spliced/concatenated
    * documents (the crawl artifact a doc-level language label hides).
    * Halves are char-exact `substr` splits; each half's langId runs on a
    * BOUND column (the 25-reference caveat on [[TextFunctions.langId]]).
    * Per-source report in integer milli rates.
    *
    * 100 TB shape: pure per-row expressions + one partial-agg'd source
    * census — zero extra shuffles over the scan. */
  val qMixedLang: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("lt", lower(col("text")))
      .withColumn("h1", expr("substr(lt, 1, length(lt) div 2)"))
      .withColumn("h2", expr("substr(lt, length(lt) div 2 + 1, length(lt))"))
      .withColumn("p1", langId(col("h1")))
      .withColumn("p2", langId(col("h2")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("p1") =!= col("p2"), 1L).otherwise(0L)).as("n_mixed"))
      .withColumn("mixed_milli", expr("(n_mixed * 1000L) div n_docs"))
      .orderBy("source")

  /** Rolling-hash document fingerprint (order-sensitive content hash).
    * Oracle-paired: DuckDB replays the identical left fold with
    * list_reduce over the character codes, seeded by a prepended 0. */
  val qFingerprint: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Benchmark decontamination: docs (id ≥ 5) sharing any word 3-gram
    * with the "benchmark" (docs 0-4) — the flag-and-drop step run before
    * training on any corpus that might contain eval data. */
  val qDecontam: Q = (s, d) => {
    val all = Tables.documents(s, d)
    graft.dedup.Dedup.contaminatedBy(
        all.filter(col("doc_id") >= 5), all.filter(col("doc_id") < 5))
      .orderBy("doc_id")
  }

  /** Same decontamination contract through the bloom-sketch pre-filter
    * path (large-probe-set shape: sketch broadcast + per-row might_contain
    * + exact verify of survivors only). Same DuckDB oracle as q_decontam —
    * a green row certifies the bloom stage is output-invisible. */
  val qDecontamBloom: Q = (s, d) => {
    val all = Tables.documents(s, d)
    graft.dedup.Dedup.contaminatedByBloom(
        all.filter(col("doc_id") >= 5), all.filter(col("doc_id") < 5))
      .orderBy("doc_id")
  }

  /** Graded decontamination: per-doc fraction of distinct 3-gram shingles
    * shared with the probe set ([[graft.dedup.Dedup.contaminationOverlap]]) —
    * the threshold input a real decontamination policy reads, where
    * q_decontam only flags. Oracle replays the distinct-shingle left join
    * in DuckDB. */
  val qContamOverlap: Q = (s, d) => {
    val all = Tables.documents(s, d)
    graft.dedup.Dedup.contaminationOverlap(
        all.filter(col("doc_id") >= 5), all.filter(col("doc_id") < 5))
      .orderBy("doc_id")
  }

  /** Per-document LM quality signal (CCNet-style filtering): perplexity
    * of each doc under the corpus's OWN bigram LM ([[qNgramLm]]'s
    * estimator, unfiltered — every doc bigram was counted from this
    * corpus, so P > 0 and no smoothing is needed). Low perplexity =
    * templated/repetitive, high = noise — the two tails a quality filter
    * trims. Plan: one bigram explode, two hash-aggs for the LM, one
    * (w1,w2) equi-join back to the doc bigram instances, one doc agg —
    * every stage partial-aggregatable, nothing vocab²-sized. */
  /** (doc_id, n_bigrams, ppl) under the corpus's own bigram LM —
    * unrounded; shared by [[qDocPerplexity]] and the curation capstone. */
  private def docPerplexity(base: DataFrame): DataFrame = {
    val bg = base
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val cnt = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("w1").agg(sum("c").as("tot"))
    val lm = cnt.join(tot, "w1")
      .select(col("w1"), col("w2"), (col("c").cast("double") / col("tot")).as("p"))
    bg.join(lm, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), exp(-avg(log(col("p")))).as("ppl"))
  }

  val qDocPerplexity: Q = (s, d) =>
    docPerplexity(Tables.documents(s, d))
      .select(col("doc_id"), col("n_bigrams"), round(col("ppl"), 2).as("ppl"))
      .orderBy("doc_id")

  /** Sliding-window token chunking — context preparation for training /
    * retrieval: each doc becomes overlapping 64-token chunks on a
    * 48-token stride (16-token overlap, so no span is ever split across
    * a boundary without also appearing whole in a neighbor). Pure
    * per-row array expressions (sequence → slice), one explode — no
    * shuffle at all until a consumer aggregates. */
  val qChunking: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("toks")) - 1, lit(48)),
        st => slice(col("toks"), st + 1, lit(64)))).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(col("chunk")).cast("long").as("n_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")

  /** Token-budget corpus mixing ([[graft.operators.Scale.tokenBudgetSample]]):
    * every source stratum contributes documents, in seedless hash order,
    * until its 600-token budget is spent — the mixture-assembly step of
    * corpus building, reported as per-source kept docs + tokens. */
  val qCorpusMix: Q = (s, d) =>
    graft.operators.Scale.tokenBudgetSample(
      Tables.documents(s, d)
        .withColumn("n_tokens", size(tokens(col("text"))).cast("long")),
      "doc_id", "source", "n_tokens", 600L)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("kept_tokens"))
      .orderBy("source")

  /** Per-stratum z-score outlier detection on token counts — the
    * length-filter step of corpus QA (truncated docs, concatenation
    * accidents): docs beyond 1.8σ of their lang's mean (1.8: tight enough to
    * flag genuine tails, loose enough to fire on near-uniform synthetic
    * lengths at every test sf). Two hash-aggs +
    * one broadcast-sized join; the per-lang stats frame is |langs| rows. */
  val qOutliers: Q = (s, d) => {
    val t = Tables.documents(s, d)
      .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
    val st = t.groupBy("lang")
      .agg(avg("n_tokens").as("mu"), stddev_samp("n_tokens").as("sigma"))
    t.join(st, "lang")
      .filter(abs(col("n_tokens") - col("mu")) > lit(1.8) * col("sigma"))
      .select(col("doc_id"), col("lang"), col("n_tokens"))
      .orderBy("doc_id")
  }

  /** The LLM-DATA capstone — the quality-curation pass of a training
    * corpus assembled from this round's new stages, each already
    * oracle-verified alone: per-lang token-count outlier removal (1.8σ)
    * → corpus-LM perplexity gate (26 ≤ ppl ≤ 34, trimming the
    * templated and noise tails) → graded decontamination (3-gram
    * overlap with the doc<5 benchmark ≤ 0.2; shingle-less docs pass) →
    * exact dedup (keep min id) → per-source 600-token budget mixing in
    * seedless hash order. Reported as the per-source mix actually
    * assembled. The oracle replays the ENTIRE composition in one DuckDB
    * query — the capstone claim is that the stages compose, not just
    * pass alone. */
  val qCurateLlm: Q = (s, d) => {
    val base = Tables.documents(s, d)
    val withTok = base
      .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
    val st = withTok.groupBy("lang")
      .agg(avg("n_tokens").as("mu"), stddev_samp("n_tokens").as("sigma"))
    // gate operands are ROUNDED (4dp z-score, 2dp ppl) in both engines:
    // mu/sigma/ppl are float aggregates whose partition-merge order and
    // libm ulps differ Spark vs DuckDB, so an unrounded threshold compare
    // could flip a boundary doc between runs/engines
    val inRange = withTok.join(st, "lang")
      .filter(round(abs(col("n_tokens") - col("mu")), 4)
        <= round(lit(1.8) * col("sigma"), 4))
      .select("doc_id", "source", "n_tokens")
    val ppl = docPerplexity(base).select("doc_id", "ppl")
    val overlap = graft.dedup.Dedup.contaminationOverlap(
      base.filter(col("doc_id") >= 5), base.filter(col("doc_id") < 5))
      .select("doc_id", "overlap")
    val losers = graft.dedup.Dedup.exactDupLosers(base.filter(col("doc_id") >= 5))
    val curated = inRange.filter(col("doc_id") >= 5)
      .join(ppl, "doc_id").filter(round(col("ppl"), 2).between(26.0, 34.0))
      .join(overlap, Seq("doc_id"), "left")
      .filter(coalesce(col("overlap"), lit(0.0)) <= 0.2)
      .join(losers, Seq("doc_id"), "left_anti")
    graft.operators.Scale
      .tokenBudgetSample(curated, "doc_id", "source", "n_tokens", 600L)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("kept_tokens"))
      .orderBy("source")
  }

  /** PII exposure audit — the measurement half of [[qRedact]]'s scrub:
    * per-source counts of emails, URLs, and 6+-digit runs (the latter on
    * URL-redacted text, mirroring redact's ordering so URL digits don't
    * double-fire). The SQL oracle interpolates the SAME regex constants
    * the Spark expressions use (Java∩RE2 subset — both engines agree). */
  val qPiiStats: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("no_url", regexp_replace(col("text"), urlRe, "<URL>"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(regexp_count(col("text"), lit(emailRe))).as("n_emails"),
        sum(regexp_count(col("text"), lit(urlRe))).as("n_urls"),
        sum(regexp_count(col("no_url"), lit(longNumRe))).as("n_longnums"))
      .orderBy("source")

  /** Vocabulary construction: tokens ranked by global frequency into
    * dense ids (count desc, token asc tiebreak) — the id-assignment step
    * of tokenizer training, top 100 here. The vocab cap comes FIRST
    * (orderBy+limit plans as TakeOrderedAndProject: per-partition top-k,
    * no global sort), so the single-partition ranking window only ever
    * sees `limit` rows — at any corpus size. */
  val qVocab: Q = (s, d) => {
    val top = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("token")).limit(100)
    top.withColumn("token_id", row_number().over(
        Window.orderBy(desc("cnt"), asc("token"))).cast("long"))
      .select("token_id", "token", "cnt")
      .orderBy("token_id")
  }

  /** TF-IDF term scoring — the retrieval/quality-weighting primitive:
    * tf = per-(doc, term) count, idf = ln(N/df) with df = docs containing
    * the term and N = docs with ≥1 token. IDF statistics come from the
    * WHOLE corpus (two partial-aggregable passes over the exploded
    * tokens — both shuffles carry (token)-keyed counts, never documents);
    * output is restricted to doc_id < 100 to keep the verify artifact
    * bounded while the df/N inputs stay corpus-global. Score rounded 4dp
    * (ln is transcendental; same cross-engine discipline as
    * q_doc_perplexity). */
  val qTfidf: Q = (s, d) => {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tok.groupBy("token")
      .agg(countDistinct(col("doc_id")).as("df"))
    val n = tok.select(countDistinct(col("doc_id")).as("n_docs"))
    tf.filter(col("doc_id") < 100)
      .join(df, "token")
      .crossJoin(n) // 1×1 aggregate frame — broadcast literal, not a blowup
      .select(col("doc_id"), col("token"), col("tf"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4)
          .as("tfidf"))
      .orderBy("doc_id", "token")
  }

  /** PII-ish scrubbing over a corpus that provably exercises every
    * pattern: the synthetic documents carry no contact strings, so the
    * query plants a deterministic contact suffix on every third doc and
    * redacts — the oracle replays both the planting and the scrub, so a
    * green row certifies each replacement (email, URL incl. its digits,
    * standalone long number). */
  val qRedact: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("dirty",
        when(col("doc_id") % 3 === 0,
          concat(col("text"),
            lit(" reach me at user"), col("doc_id").cast("string"),
            lit("@mail.example.com or https://t.example.org/u/"),
            col("doc_id").cast("string"), lit("/9876543 ref 12345678")))
          .otherwise(col("text")))
      .select(col("doc_id"), redact(col("dirty")).as("clean"))
      .orderBy("doc_id")

  /** Sessionization of the events stream in batch: a session break is a
    * >30-min gap per user; session ids via cumulative sum over the break
    * flags — the lag/cumsum idiom that mapGroupsWithState replaces in
    * streaming (see graft.streaming). */
  val qSessionize: Q = (s, d) => {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(s, d)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum("brk").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ev.groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("session_value"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"))
      .orderBy("user_id", "session_id")
  }

  /** Native gap-based session windows in BATCH — the declarative sibling
    * of [[qSessionize]]'s lag+cumsum (and the same `session_window`
    * expression the streaming layer uses, so this oracle certifies that
    * path's semantics too): windows [ts, ts+30min) merge per user while
    * they overlap; a ≥30-min silence splits. The DuckDB oracle replays
    * the split rule on epoch MICROseconds (exactly Spark's timestamp
    * grain) and reconstructs end = last_ts + gap. One shuffle on
    * user_id; the merge itself is a sort-based per-partition pass —
    * no per-group buffering beyond a session's accumulator. */
  val qSessionWindow: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("session_value"))
      .orderBy("user_id", "session_start")

  /** Unicode NFC normalization — the canonicalization pass a crawled
    * corpus needs before exact dedup / shingling / vocab construction
    * (composed U+00E9 "é" and decomposed e+U+0301 are different bytes,
    * identical text — unnormalized they silently halve dedup recall on
    * accented languages). The corpus is ASCII, so the query PLANTS both
    * spellings deterministically (qRedact's planting pattern): after the
    * codegen'd [[graft.functions.NfcNormalize]] expression both forms
    * are byte-identical, which the oracle (DuckDB `nfc_normalize`)
    * certifies on the full output strings. */
  val qNfcNormalize: Q = (s, d) => {
    import graft.functions.NfcNormalize.nfc_normalize
    // doc%3==0 plants DECOMPOSED e+U+0301, doc%3==1 plants COMPOSED U+00E9
    val dirty = when(col("doc_id") % 3 === 0, concat(col("text"), lit(" cafe\u0301")))
      .when(col("doc_id") % 3 === 1, concat(col("text"), lit(" caf\u00e9")))
      .otherwise(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        nfc_normalize(dirty).as("norm_text"),
        (nfc_normalize(dirty) =!= dirty).cast("long").as("changed"))
      .orderBy("doc_id")
  }

  /** PARAGRAPH-level dedup — boilerplate removal at sub-document
    * granularity (the pass that strips repeated headers/footers/license
    * blocks a document-level dedup can't see): split on sentence
    * boundaries, keep each distinct paragraph only at its FIRST
    * occurrence (min (doc_id, pos)), reassemble surviving paragraphs in
    * original order. Two hash shuffles on the paragraph text (keeper
    * agg + join back), both content-keyed — no window over the whole
    * corpus; the reassembly groups by doc_id. Oracle replays the whole
    * split → first-occurrence → reassemble composition. */
  val qParaDedup: Q = (s, d) => {
    val paras = Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(split(col("text"), "\\. ")).as(Seq("pos", "para")))
      .filter(length(trim(col("para"))) > 0)
    val keepers = paras.groupBy("para")
      .agg(min(struct(col("doc_id"), col("pos"))).as("k"))
      .select(col("para"), col("k.doc_id").as("doc_id"), col("k.pos").as("pos"))
    paras.join(keepers, Seq("para", "doc_id", "pos"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_paras"),
        concat_ws(". ",
          transform(array_sort(collect_list(struct(col("pos"), col("para")))),
            x => x.getField("para"))).as("cleaned"))
      .orderBy("doc_id")
  }

  /** SCD Type-2 style change tracking — the warehouse versioning
    * operator: each user's consecutive run of one event_type becomes a
    * versioned row with [valid_from, valid_to) bounds, valid_to = the
    * next version's start (null for the current version). Change points
    * via lag, version ids via cumsum — the sessionize idiom with a
    * value-change predicate instead of a time gap; bounds via lead over
    * the per-user version sequence. One shuffle on user_id, all three
    * windows share it. */
  val qScd2: Q = (s, d) => {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val runs = Tables.events(s, d)
      .withColumn("prev_type", lag("event_type", 1).over(byUser))
      .withColumn("chg",
        when(col("prev_type").isNull || col("prev_type") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version", sum("chg").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "version")
      .agg(first("event_type").as("event_type"),
        min("ts").as("from_ts"), count(lit(1)).as("n_events"))
    val byVersion = Window.partitionBy("user_id").orderBy("version")
    runs
      .withColumn("to_ts", lead("from_ts", 1).over(byVersion))
      .select(col("user_id"), col("version"), col("event_type"),
        date_format(col("from_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("to_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        col("n_events"))
      .orderBy("user_id", "version")
  }

  /** End-to-end curation pipeline — the composition a training-data
    * pipeline actually runs: exact-dedup (keep min doc_id per content,
    * hash-first so the wide shuffle carries 16-byte rows, not documents —
    * [[graft.dedup.Dedup.exactDupLosers]]), then a quality gate and
    * token-length band. Everything else per-row. */
  val qCuration: Q = (s, d) => {
    val base = Tables.documents(s, d)
    val docs = base
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("quality", qualityScore(col("toks")))
    docs.join(graft.dedup.Dedup.exactDupLosers(base), Seq("doc_id"), "left_anti")
      .filter(col("quality") >= 0.5 && col("n_tokens").between(5, 200))
      .select(col("doc_id"), col("n_tokens"), round(col("quality"), 4).as("quality"))
      .orderBy("doc_id")
  }

  /** The CAPSTONE composition — the full curation pass a training-data
    * pipeline runs end to end, each stage an already-oracle-verified
    * operator: redact → exact dedup (hash-first, keep min id) → near-dup
    * Jaccard pairs → cluster resolution (keep each cluster's min) →
    * quality + length gate. One call curates a corpus; the oracle replays
    * the identical composition in a single DuckDB query (recursive CTE
    * for the cluster closure). */
  val qCurateFull: Q = (s, d) => {
    import graft.dedup.Dedup
    // r16 A/B NOTE: three rewrites were measured and REVERTED — fanning
    // the scan before redact (bench-median 5.6 s), checkpointing base
    // against its two consumers (5.6 s), and both (6.1 s profile) all
    // LOSE to this shape (5.3 s): the query's local cost is ~40 small
    // orchestration jobs from the dedup pipeline, and AQE already
    // overlaps the two base replays, so extra exchanges/materialization
    // barriers only add wall. Numbers in OPTIMIZATION_r16.md.
    val base = Tables.documents(s, d)
      .withColumn("text", redact(col("text")))
    // localCheckpoint: the deduped corpus feeds BOTH the pair generator
    // (materialized during cluster construction) and the final anti-join
    // (materialized by the consumer later) — eager checkpoint computes the
    // redact + exact-dedup chain once, and the ContextCleaner reclaims the
    // blocks when the result frame is dropped (no leaked tracked cache).
    // Measured 11.8 → 8.1 s at sf0.1.
    val noExact = base.join(Dedup.exactDupLosers(base), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val nearLosers = Dedup.dupClusters(Dedup.jaccardPairs(noExact, 0.6, maxDf = 16))
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("doc_id"))
    noExact.join(nearLosers, Seq("doc_id"), "left_anti")
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("quality", qualityScore(col("toks")))
      .filter(col("quality") >= 0.5 && col("n_tokens").between(5, 200))
      .select(col("doc_id"), col("n_tokens"), round(col("quality"), 4).as("quality"))
      .orderBy("doc_id")
  }

  /** Count-based bigram language model over the corpus: conditional
    * probabilities P(w2 | w1) = c(w1,w2) / Σ_w c(w1,w) for bigrams seen
    * ≥ 5 times — the n-gram-LM estimation step (quality/perplexity
    * scoring's statistical core) as two hash-aggs and one join on w1.
    * Integer-count division is IEEE-exact, so the probabilities compare
    * bit-for-bit cross-engine. */
  val qNgramLm: Q = (s, d) => {
    val bg = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= 2)
      .select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val cnt = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("w1").agg(sum("c").as("tot"))
    cnt.join(tot, "w1")
      .filter(col("c") >= 5)
      .select(col("w1"), col("w2"), col("c"),
        round(col("c") / col("tot"), 4).as("p_cond"))
      .orderBy("w1", "w2")
  }

  /** Training-loader shard assignment — contiguous global positions
    * 0..n−1 in (lang, doc_id) order WITHOUT a single-partition window:
    * [[graft.operators.Scale.denseIds]] (range-partition + frozen
    * per-partition offsets, bit-layout-guarded) supplies the
    * enumeration; shard/slot are pure arithmetic on it. This is the
    * step that turns a curated corpus into fixed-size loader shards
    * whose order is reproducible across reruns and engines — certified
    * here against the oracle's literal row_number() replay (the
    * operator's only other coverage is spec + ETL surrogate keys). */
  val qShardAssign: Q = (s, d) => {
    val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
    graft.operators.Scale.denseIds(docs, "gid", Seq("lang", "doc_id"))
      .select(col("lang"), col("doc_id"), (col("gid") - 1).as("gid"))
      .withColumn("shard", expr("gid div 64"))
      .withColumn("slot", expr("gid % 64"))
      .orderBy("gid")
  }

  /** Vocabulary-coverage / OOV report — the tokenizer-fit metric that
    * decides whether a vocab is big enough for a corpus slice: share of
    * token OCCURRENCES outside the top-1000 frequency vocab, per
    * language, in floored milli-units (exact integers — the corpus OOV
    * rate is a ratio of counts). The vocab is driver-sized by
    * construction (TakeOrdered 1000 with the count-desc/token-asc total
    * order) and arrives broadcast; the token stream never re-shuffles
    * for membership — only the per-lang partial counts do. */
  val qVocabCoverage: Q = (s, d) => {
    val tok = Tables.documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("token"))
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("token")).limit(1000)
      .select(col("token"), lit(1L).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("token"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_milli", expr("(n_oov * 1000L) div n_tokens"))
      .orderBy("lang")
  }

  /** Cross-source duplication provenance — WHICH feeds copy from which:
    * for every byte-identical text appearing under two sources, one
    * (src_a < src_b) pair per text, counted into the source×source
    * matrix. Distinct (text, source) first, then a text-keyed self-join
    * — only multi-source texts survive the a < b predicate, so pair
    * volume is bounded by dup groups × sources², never corpus².
    * (Production would self-join on xxhash64(text) with a text verify —
    * the q_dedup_exact discipline; the oracle-parity form joins on text
    * directly, same as q_dedup_exact's GROUP BY text.) The synthetic
    * corpus never duplicates across sources, so a scraping "mirror"
    * feed is PLANTED deterministically (every 13th doc re-tagged — the
    * qRedact planting idiom) and its provenance must be recovered. */
  val qDupProvenance: Q = (s, d) => {
    val base = Tables.documents(s, d)
    val mirror = base.filter(col("doc_id") % 13 === 2)
      .withColumn("source", lit("mirror"))
    val ds = base.unionByName(mirror).select("text", "source").distinct()
    val a = ds.select(col("text"), col("source").as("src_a"))
    val b = ds.select(col("text"), col("source").as("src_b"))
    a.join(b, "text").filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_texts"))
      .orderBy("src_a", "src_b")
  }

  /** Skip-gram pair extraction (window ±2) — the training-pair
    * generator of word2vec/fastText-style embedding pipelines: for each
    * token, the ordered pairs with its next 1 and next 2 neighbors,
    * counted corpus-wide. Both distances are ZIP_WITH of the token
    * array against its own shifted slice — per-row expansion bounded by
    * 2·tokens, no positional self-join, no (doc, pos) shuffle; the only
    * exchange carries (pair, count) from the partial agg. Top-100 by
    * (count desc, pair) via TakeOrderedAndProject. */
  val qSkipgrams: Q = (s, d) => {
    def shifted(k: Int) = zip_with(
      slice(col("toks"), lit(1), size(col("toks")) - k),
      slice(col("toks"), lit(k + 1), size(col("toks")) - k),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= 2)
      .select(explode(concat(shifted(1),
        when(size(col("toks")) >= 3, shifted(2))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))))
        .as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("w1"), asc("w2"))
      .limit(100)
  }

  /** Diversity-capped selection — the anti-domain-domination pass of
    * corpus curation: per language, pick the top-20 docs by length but
    * let no single source contribute more than 5 (greedy
    * best-score-first selection under a per-source quota ≡ rank within
    * (lang, source), keep rank ≤ m, THEN rank the survivors per lang —
    * the cap runs first, so the per-lang ranking window sees at most
    * m·|sources| rows per language regardless of corpus size; the wide
    * (lang, source) window is the only one that touches every doc and
    * it carries key cardinality, not a global sort). Pure integer
    * ordering (n_chars, doc_id tiebreak) — exact cross-engine. */
  val qDiversitySelect: Q = (s, d) => {
    val bySrc = Window.partitionBy("lang", "source")
      .orderBy(desc("n_chars"), asc("doc_id"))
    val byLang = Window.partitionBy("lang")
      .orderBy(desc("n_chars"), asc("doc_id"))
    Tables.documents(s, d)
      .withColumn("src_rank", row_number().over(bySrc).cast("long"))
      .filter(col("src_rank") <= 5)
      .withColumn("sel_rank", row_number().over(byLang).cast("long"))
      .filter(col("sel_rank") <= 20)
      .select(col("lang"), col("sel_rank"), col("doc_id"), col("source"),
        col("n_chars"), col("src_rank"))
      .orderBy("lang", "sel_rank")
  }

  /** Collocation mining — the phrase-extraction primitive of tokenizer /
    * vocab curation: bigrams whose observed count beats the independence
    * expectation, ranked by PMI's monotone integer form. With left/right
    * positional marginals l(w1) = Σ_w c(w1,w), r(w2) = Σ_w c(w,w2) and
    * N = total bigrams, lift = c·N / (l·r) (= e^PMI); emitted as
    * `lift_milli = (c·1000·N) div (l·r)` — exact integer arithmetic end
    * to end, no transcendentals, no float compare (the [[qDecayedSum]]
    * discipline). Three (token)-keyed hash-agg shuffles + two equi-joins
    * on the count frames — documents never re-shuffle. The int64 product
    * bounds c·1000·N < 2⁶³ (N ≲ 9·10⁷ per partition of the vocab work);
    * beyond that cast the three factors to decimal(38,0) — Spark's
    * IntegralDivide and DuckDB `//` are both exact there. Top-100 via
    * orderBy+limit = TakeOrderedAndProject (per-partition top-k, no
    * global sort). */
  val qCollocations: Q = (s, d) => {
    val bg = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= 2)
      .select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val cnt = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    val left = cnt.groupBy("w1").agg(sum("c").as("l_cnt"))
    val right = cnt.groupBy("w2").agg(sum("c").as("r_cnt"))
    val n = cnt.agg(sum("c").as("n_bigrams"))
    cnt.filter(col("c") >= 5)
      .join(left, "w1").join(right, "w2")
      .crossJoin(n)
      .select(col("w1"), col("w2"), col("c"),
        expr("(c * 1000L * n_bigrams) div (l_cnt * r_cnt)").as("lift_milli"))
      .orderBy(desc("lift_milli"), asc("w1"), asc("w2"))
      .limit(100)
  }

  /** Sequential-funnel analysis over the events stream: users who signed
    * up, then clicked AFTER signing up, then purchased AFTER that click —
    * each stage a min-timestamp aggregation joined to the previous
    * stage's frontier (three hash-aggs + two id-equality joins; no
    * window over the full stream, no per-user collect). The per-stage
    * time ordering is what distinguishes a funnel from three counts. */
  val qFunnel: Q = (s, d) => {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t_signup"))
    val click = ev.filter(col("event_type") === "click")
      .join(signup, "user_id").filter(col("ts") >= col("t_signup"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val purchase = ev.filter(col("event_type") === "purchase")
      .join(click, "user_id").filter(col("ts") >= col("t_click"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    signup.agg(count(lit(1)).as("n_signup"))
      .crossJoin(click.agg(count(lit(1)).as("n_click")))
      .crossJoin(purchase.agg(count(lit(1)).as("n_purchase")))
      .select(col("n_signup"), col("n_click"), col("n_purchase"),
        round(col("n_click") / col("n_signup"), 4).as("click_rate"),
        round(col("n_purchase") / col("n_signup"), 4).as("purchase_rate"))
  }

  /** Within-document repetition signals — the n-gram repetition quality
    * gates a web-scale curation pipeline runs per doc (duplicate-bigram
    * fraction and most-frequent-bigram mass; high values = boilerplate /
    * degenerate repetition): two chained hash-aggs over the exploded
    * bigrams, linear in corpus size. */
  val qRepetition: Q = (s, d) => {
    val bg = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
    bg.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"), count(lit(1)).as("n_distinct"),
        max("c").as("mx"))
      .select(col("doc_id"), col("n_bigrams"),
        round(lit(1.0) - col("n_distinct") / col("n_bigrams"), 4).as("dup_frac"),
        round(col("mx") / col("n_bigrams"), 4).as("top_frac"))
      .orderBy("doc_id")
  }

  /** Sequence PACKING: assign docs to fixed-token-budget training
    * sequences (2048 here) by running token count — the
    * concatenate-and-chunk step between curation and tokenization.
    * Sharded FIRST (doc_id mod 8), cumulative window per shard: the
    * global-order window a naive packer uses is a single-partition
    * bottleneck; per-shard packing is how it parallelizes at corpus
    * scale (each shard's sequences are independent). */
  val qPackSequences: Q = (s, d) => {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
      .withColumn("shard", pmod(col("doc_id"), lit(8L)))
      .withColumn("prev_tokens", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor(col("prev_tokens") / 2048.0).cast("long").as("seq_id"))
      .orderBy("doc_id")
  }

  /** Train/val/test split counts: deterministic id-hash assignment
    * (80/10/10), aggregated per (split, lang) to show stratification. */
  val qTrainSplit: Q = (s, d) =>
    graft.operators.Scale.idSplit(Tables.documents(s, d), "doc_id")
      .groupBy("split", "lang").agg(count(lit(1)).as("cnt"))
      .orderBy("split", "lang")

  /** Approximate heavy hitters: top-20 tokens via the bucket-capped
    * two-phase plan ([[graft.text.HeavyHitters]]) — the scale path for
    * corpora whose vocabulary is too large to shuffle exactly.
    * Oracle-checked against the EXACT top-k SQL: phase-2 counts are exact
    * and recall at oracle scale is deterministically 1.0, so the
    * approximate plan is held to the exact answer; recall + parity vs
    * [[qTokenTopk]] are additionally spec-pinned. */
  val qHeavyHitters: Q = (s, d) =>
    graft.text.HeavyHitters.topTokens(
      Tables.documents(s, d).select(explode(tokens(col("text"))).as("token")), 20)

  /** Gopher-style rule-based quality gate (Rae et al. 2021, §A1.1 —
    * adapted thresholds: this corpus has no newlines or symbols, so the
    * bullet/ellipsis/symbol rules would be vacuous; the four kept rules
    * all discriminate here). Per language: documents failing each rule
    * and documents passing ALL — the report a curation run reads before
    * deciding which gates to tighten.
    *
    * Every rule is an integer comparison or a SINGLE int/int division
    * against a decimal literal — bit-identical cross-engine, no rounding
    * anywhere:
    *  - r1 word count in [30, 80]
    *  - r2 mean word length in [3.9, 5.1]
    *  - r3 at least 2 stopwords
    *  - r4 distinct-token ratio ≥ 0.5 (repetition gate)
    */
  val qGopherRules: Q = (s, d) => {
    val toks = col("toks")
    val nToks = size(toks).cast("long")
    val meanWordLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
      .cast("double") / nToks.cast("double")
    val nStop = size(filter(toks,
      t => t.isin(stopwords.map(_.asInstanceOf[Any]): _*)))
    val distinctRatio =
      size(array_distinct(toks)).cast("double") / nToks.cast("double")
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .select(
        col("lang"),
        (nToks >= 30 && nToks <= 80).as("r1"),
        (meanWordLen >= 3.9 && meanWordLen <= 5.1).as("r2"),
        (nStop >= 2).as("r3"),
        (distinctRatio >= 0.5).as("r4"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(!col("r1"), 1L).otherwise(0L)).as("fail_wordcount"),
        sum(when(!col("r2"), 1L).otherwise(0L)).as("fail_wordlen"),
        sum(when(!col("r3"), 1L).otherwise(0L)).as("fail_stopwords"),
        sum(when(!col("r4"), 1L).otherwise(0L)).as("fail_repetition"),
        sum(when(col("r1") && col("r2") && col("r3") && col("r4"), 1L)
          .otherwise(0L)).as("pass_all"))
      .orderBy("lang")
  }

  /** Systematic PPS (probability-proportional-to-size) sampling: k=20
    * docs chosen with inclusion probability ∝ n_chars — the
    * size-weighted corpus sample (token-budget estimation, eval-set
    * drawing) where uniform sampling over-represents short docs.
    * Deterministic and RNG-free: an exact integer cumulative weight
    * ([[graft.operators.Prefix.runningSum]] — sqrt-decomposition
    * buckets on doc_id, no global window) and a doc is selected when
    * its scaled weight interval crosses an integer boundary:
    * (prev·k) div W < (cum·k) div W. Pure BIGINT arithmetic — the
    * oracle replays it with a flat window cumsum, proving the
    * two-level prefix equals the flat one on ids as well as times. */
  val qPpsSample: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(
      col("doc_id"), col("lang"), col("n_chars"))
    val total = docs.agg(sum("n_chars").as("w"))
    val k = 20
    graft.operators.Prefix.runningSum(
        docs, expr("doc_id div 1000"),
        Seq(col("doc_id").asc), col("n_chars"), "cum")
      .join(broadcast(total))
      .filter(expr(s"((cum - n_chars) * $k) div w < (cum * $k) div w"))
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  /** Corpus-diversity profile per language: token count, vocabulary
    * size, type-token ratio (one int/int division — bit-exact), and
    * Shannon token entropy in nats via H = ln n − (Σ c·ln c)/n — the
    * numerically stable form that never materializes per-token
    * probabilities. Two stacked hash-aggregations (token counts are
    * map-side combinable). `ln` is the one transcendental (JVM log vs
    * libm can differ in the last ulp) — 4-dp rounding over ~1e-15 noise
    * is eleven orders of margin, same budget as q_doc_perplexity. */
  val qTokenEntropy: Q = (s, d) => {
    val counts = Tables.documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("t"))
      .groupBy("lang", "t").agg(count(lit(1)).as("cnt"))
    counts.groupBy("lang")
      .agg(
        sum("cnt").cast("double").as("n"),
        count(lit(1)).as("vocab"),
        sum(col("cnt") * log(col("cnt"))).as("slc"))
      .select(
        col("lang"),
        col("n").cast("long").as("n_tokens"),
        col("vocab"),
        round(col("vocab") / col("n"), 4).as("ttr"),
        round(log(col("n")) - col("slc") / col("n"), 4).as("entropy_nats"))
      .orderBy("lang")
  }

  /** String-similarity self-join: vocabulary token pairs at edit
    * distance EXACTLY 1 — the typo/variant detector — via SymSpell-style
    * DELETION-KEY blocking: every token emits itself plus each
    * single-character deletion as join keys; any pair within edit
    * distance 1 provably shares a key (delete→the shorter word IS a key
    * of the longer; substitute→both share the deletion at the differing
    * position), so an EQUALITY join on keys generates all candidates —
    * O(Σ|t|) keys, no vocabulary cross-join — and `levenshtein` verifies
    * exactly (shared keys can also arise at distance 2, e.g. ab/ba).
    * The oracle brute-forces the quadratic join; the blocked plan must
    * find the identical pair set. The synthetic vocab has no natural
    * ed-1 neighbors, so typo variants are PLANTED deterministically
    * (delete/insert/substitute of real tokens on every 7th doc — the
    * q_redact planted-pattern idiom) and must all be recovered. */
  val qTypoPairs: Q = (s, d) => {
    val dirty = Tables.documents(s, d)
      .withColumn("text2",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" tabl vallue queryy spork")))
          .otherwise(col("text")))
    val vocab = dirty
      .select(explode(tokens(col("text2"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cnt"))
    val keyed = vocab.select(col("t"), col("cnt"), explode(expr(
      """array_union(array(t),
        | transform(sequence(1, length(t)),
        |   i -> concat(substr(t, 1, i-1), substr(t, i+1, length(t)))))"""
        .stripMargin)).as("k"))
    val a = keyed.select(col("k"), col("t").as("tok_a"), col("cnt").as("cnt_a"))
    val b = keyed.select(col("k"), col("t").as("tok_b"), col("cnt").as("cnt_b"))
    a.join(b, "k")
      .filter(col("tok_a") < col("tok_b"))
      .select("tok_a", "tok_b", "cnt_a", "cnt_b").distinct()
      .filter(levenshtein(col("tok_a"), col("tok_b")) === 1)
      .orderBy("tok_a", "tok_b")
  }

  /** BPE merge-rule training over the corpus ([[graft.text.Bpe]]):
    * distributed word counting capped to a deterministic top-1000
    * vocabulary, then 10 driver-side merges. Rows-only (iterative
    * rewriting isn't ANSI SQL); the merge sequence on the classic
    * Sennrich fixture and cross-run determinism are spec-pinned. */
  val qBpeMerges: Q = (s, d) =>
    graft.text.Bpe.train(s,
        Tables.documents(s, d).select(explode(tokens(col("text"))).as("token")),
        numMerges = 10, maxVocab = 1000)
      .orderBy("rank")

  /** BPE ENCODE with the merges trained on the same corpus — the
    * inference side of q_bpe_merges (distinct-token encode + join back,
    * [[graft.text.Bpe.encode]]). Per-language compression report:
    * tokens, emitted pieces, piece vocabulary, and the pieces-per-token
    * ratio as exact long/long. Rows-only: the merge table comes from
    * the iterative trainer; determinism + losslessness are spec-pinned
    * instead (BpeSpec). */
  val qBpeEncode: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("token"))
    val merges = graft.text.Bpe.train(s, toks.select("token"),
      numMerges = 10, maxVocab = 1000)
    graft.text.Bpe.encode(s, toks, merges)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(size(col("pieces")).cast("long")).as("n_pieces"))
      .withColumn("pieces_per_token", col("n_pieces") / col("n_tokens"))
      .orderBy("lang")
  }

  /** Conjunctive term search ("docs containing ALL of these terms") in
    * the shuffle-bounded form: filter the token stream to the query
    * terms FIRST (predicate reaches the scan), distinct (doc, term),
    * then one doc-keyed count — docs matching every term have
    * count == |terms|. No posting-list materialization, no array
    * intersection over unbounded lists; the shuffle carries only
    * (doc, term) pairs for the query's own terms. Exact-integer report
    * keeps the whole match SET certified via the id checksum. */
  val qAndSearch: Q = (s, d) => {
    val terms = Seq("join", "merge")
    val hits = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .filter(col("token").isin(terms: _*))
      .distinct()
    hits.groupBy("doc_id").agg(count(lit(1)).as("nt"))
      .filter(col("nt") === terms.length)
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_checksum"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
  }

  /** Duplicate-SPAN detection at 8-token-window granularity — see
    * [[graft.dedup.Dedup.dupSpans]] (maximal merged spans per affected
    * doc; hash-first candidates, text-verified, collision-proof). */
  val qDupSpans: Q = (s, d) =>
    graft.dedup.Dedup.dupSpans(Tables.documents(s, d), 8).orderBy("doc_id")

  /** Duplicate-span EXCISION — the corpus rewrite keeping one canonical
    * copy of every duplicated 8-token substring; see
    * [[graft.dedup.Dedup.exciseDupSpans]]. The oracle replays the whole
    * canonical-window → interval-merge → token-filter rewrite. */
  val qDupExcise: Q = (s, d) =>
    graft.dedup.Dedup.exciseDupSpans(Tables.documents(s, d), 8).orderBy("doc_id")

  val all: Map[String, Q] = Map(
    "q_and_search" -> qAndSearch,
    "q_dup_spans" -> qDupSpans,
    "q_dup_excise" -> qDupExcise,
    "q_text_stats" -> qTextStats,
    "q_gopher_rules" -> qGopherRules,
    "q_bpe_merges" -> qBpeMerges,
    "q_bpe_encode" -> qBpeEncode,
    "q_pps_sample" -> qPpsSample,
    "q_token_entropy" -> qTokenEntropy,
    "q_typo_pairs" -> qTypoPairs,
    "q_text_quality" -> qTextQuality,
    "q_token_topk" -> qTokenTopk,
    "q_heavy_hitters" -> qHeavyHitters,
    "q_lang_id" -> qLangId,
    "q_mixed_lang" -> qMixedLang,
    "q_fingerprint" -> qFingerprint,
    "q_redact" -> qRedact,
    "q_decontam" -> qDecontam,
    "q_decontam_bloom" -> qDecontamBloom,
    "q_contam_overlap" -> qContamOverlap,
    "q_doc_perplexity" -> qDocPerplexity,
    "q_chunking" -> qChunking,
    "q_corpus_mix" -> qCorpusMix,
    "q_outliers" -> qOutliers,
    "q_pii_stats" -> qPiiStats,
    "q_repetition" -> qRepetition,
    "q_pack_sequences" -> qPackSequences,
    "q_funnel" -> qFunnel,
    "q_ngram_lm" -> qNgramLm,
    "q_collocations" -> qCollocations,
    "q_diversity_select" -> qDiversitySelect,
    "q_shard_assign" -> qShardAssign,
    "q_skipgrams" -> qSkipgrams,
    "q_vocab_coverage" -> qVocabCoverage,
    "q_dup_provenance" -> qDupProvenance,
    "q_vocab" -> qVocab,
    "q_sessionize" -> qSessionize,
    "q_session_window" -> qSessionWindow,
    "q_tfidf" -> qTfidf,
    "q_scd2" -> qScd2,
    "q_para_dedup" -> qParaDedup,
    "q_nfc_normalize" -> qNfcNormalize,
    "q_curation" -> qCuration,
    "q_curate_full" -> qCurateFull,
    "q_curate_llm" -> qCurateLlm,
    "q_train_split" -> qTrainSplit,
  )

  private val stopList = stopwords.map(w => s"'$w'").mkString(", ")

  /** One SELECT per language scoring its profile trigrams by contains —
    * generated from the same langProfiles map the Spark expression uses. */
  private val langScoreSql: String = langProfiles.toSeq.sortBy(_._1).map {
    case (lang, grams) =>
      val score = grams.map(g => s"CAST(contains(t, '$g') AS INT)").mkString(" + ")
      s" SELECT doc_id, lang, '$lang' AS cand, $score AS score FROM lt"
  }.mkString("\n UNION ALL\n")

  /** The same generated scorer over a document HALF (for q_mixed_lang). */
  private def halfScoreSql(halfCol: String): String =
    langProfiles.toSeq.sortBy(_._1).map { case (lang, grams) =>
      val score = grams.map(g => s"CAST(contains($halfCol, '$g') AS INT)")
        .mkString(" + ")
      s" SELECT doc_id, source, '$lang' AS cand, $score AS score FROM halves"
    }.mkString("\n UNION ALL\n")

  /** r11 upgrade (was rows-only): the 10 BPE merge rounds UNROLLED as 10
    * chained CTE stages (the q_ipf_raking precedent) — per stage, a
    * weighted adjacent-pair census over the ≤1000-word symbol frame,
    * argmax by (count DESC, left, right) (= the trainer's minBy
    * (−n, a, b); binary UTF-8 order ≡ Java order on this ASCII vocab),
    * and the non-overlapping left-to-right rewrite as a list_reduce fold
    * (replacing the just-appended left symbol can never cascade: the
    * merged token l||r ≠ l). Verified row-exact against the trainer.
    *
    * Early-stop safety (r12, ADVICE): the per-round join against best$k
    * is a LEFT JOIN ON TRUE, so a round with NO adjacent pairs (degenerate
    * corpus: every word already single-symbol) yields NULL b.l/b.r, the
    * CASE falls through to the identity rebuild, and words/enc carry
    * forward unchanged — matching Bpe.train's early stop (merge$k is
    * empty, so the merges readout emits only the learned rounds) instead
    * of a cross join zeroing every later stage. Once a round is empty all
    * later rounds are too (merging can't create new adjacency). */
  private val bpeMergesStages: String = {
    val stages = (0 until 10).map { k =>
      s"""pairs$k AS (
         | SELECT w.syms[u.i] AS l, w.syms[u.i + 1] AS r, CAST(sum(w.cnt) AS BIGINT) AS c
         | FROM words$k w, unnest(range(1, len(w.syms))) AS u(i)
         | GROUP BY 1, 2),
         |best$k AS (SELECT l, r, c FROM pairs$k ORDER BY c DESC, l, r LIMIT 1),
         |merge$k AS (SELECT CAST(${k + 1} AS INTEGER) AS rank, l AS "left",
         |  r AS "right", l || r AS merged, c AS pair_count FROM best$k),
         |words${k + 1} AS (
         | SELECT list_reduce(
         |   list_prepend(CAST([] AS VARCHAR[]), list_transform(w.syms, s -> [s])),
         |   (acc, sl) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = b.l AND sl[1] = b.r
         |     THEN list_append(acc[:len(acc)-1], b.l || b.r)
         |     ELSE list_append(acc, sl[1]) END) AS syms,
         |  w.cnt
         | FROM words$k w LEFT JOIN best$k b ON TRUE)""".stripMargin
    }
    """WITH tok AS (
      | SELECT unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
      |vocab AS (
      | SELECT token, count(*) AS cnt FROM tok GROUP BY token
      | ORDER BY cnt DESC, token LIMIT 1000),
      |words0 AS (
      | SELECT list_filter(string_split(token, ''), s -> s <> '') AS syms, cnt FROM vocab),
      |""".stripMargin + stages.mkString(",\n")
  }

  private val bpeMergesOracle: String =
    bpeMergesStages + "\n" +
      (0 until 10).map(k => s"SELECT * FROM merge$k").mkString(" UNION ALL ") +
      "\nORDER BY rank"

  /** r11 upgrade (was rows-only): encode = train-replay. Applying the
    * merge ranks in ascending order ONCE each (enc0..enc10 below, over
    * ALL distinct corpus tokens) reaches the same fixpoint as
    * encodeWord's repeated lowest-rank search: a rank-k pair's symbols
    * can only be produced by merges of rank < k, so after the ascending
    * pass no lower-rank pair can reappear. Per-language stats then come
    * from one occurrence join against the ≤|vocab|-row segmentation. */
  private val bpeEncodeOracle: String = {
    val apply = (0 until 10).map { k =>
      s"""enc${k + 1} AS (
         | SELECT e.token, list_reduce(
         |   list_prepend(CAST([] AS VARCHAR[]), list_transform(e.syms, s -> [s])),
         |   (acc, sl) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = b.l AND sl[1] = b.r
         |     THEN list_append(acc[:len(acc)-1], b.l || b.r)
         |     ELSE list_append(acc, sl[1]) END) AS syms
         | FROM enc$k e LEFT JOIN best$k b ON TRUE)""".stripMargin
    }
    bpeMergesStages +
      """,
        |enc0 AS (
        | SELECT token, list_filter(string_split(token, ''), s -> s <> '') AS syms
        | FROM (SELECT DISTINCT token FROM tok)),
        |""".stripMargin + apply.mkString(",\n") +
      """,
        |tok2 AS (
        | SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS token
        | FROM documents)
        |SELECT t.lang, count(*) AS n_tokens,
        | CAST(sum(len(e.syms)) AS BIGINT) AS n_pieces,
        | CAST(sum(len(e.syms)) AS BIGINT) / count(*) AS pieces_per_token
        |FROM tok2 t JOIN enc10 e USING (token)
        |GROUP BY t.lang ORDER BY t.lang""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_bpe_merges" -> bpeMergesOracle,
    "q_bpe_encode" -> bpeEncodeOracle,
    "q_and_search" ->
      """WITH hits AS (
        | SELECT DISTINCT doc_id, tok FROM (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents)
        | WHERE tok IN ('join', 'merge')),
        |m AS (
        | SELECT doc_id FROM hits GROUP BY doc_id HAVING count(*) = 2)
        |SELECT count(*) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_checksum,
        | min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM m""".stripMargin,
    "q_typo_pairs" ->
      """WITH v AS (
        | SELECT t, count(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(trim(
        |    CASE WHEN doc_id % 7 = 0
        |      THEN text || ' tabl vallue queryy spork'
        |      ELSE text END), '\s+')) AS t
        |  FROM documents)
        | GROUP BY t)
        |SELECT a.t AS tok_a, b.t AS tok_b,
        | a.cnt AS cnt_a, b.cnt AS cnt_b
        |FROM v a JOIN v b ON a.t < b.t AND levenshtein(a.t, b.t) = 1
        |ORDER BY tok_a, tok_b""".stripMargin,
    "q_token_entropy" ->
      """WITH toks AS (
        | SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS t
        | FROM documents),
        |c AS (SELECT lang, t, count(*) AS cnt FROM toks GROUP BY lang, t),
        |a AS (SELECT lang, CAST(sum(cnt) AS DOUBLE) AS n,
        |  count(*) AS vocab, sum(cnt * ln(cnt)) AS slc
        | FROM c GROUP BY lang)
        |SELECT lang, CAST(n AS BIGINT) AS n_tokens,
        | CAST(vocab AS BIGINT) AS vocab,
        | round(vocab / n, 4) AS ttr,
        | round(ln(n) - slc / n, 4) AS entropy_nats
        |FROM a ORDER BY lang""".stripMargin,
    "q_pps_sample" ->
      """WITH c AS (
        | SELECT doc_id, lang, n_chars,
        |  sum(n_chars) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM documents),
        |t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS w FROM documents)
        |SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        |FROM c, t
        |WHERE ((cum - n_chars) * 20) // w < (cum * 20) // w
        |ORDER BY doc_id""".stripMargin,
    "q_gopher_rules" ->
      s"""WITH t AS (
         | SELECT lang, string_split_regex(trim(text), '\\s+') AS ts
         | FROM documents),
         |r AS (
         | SELECT lang,
         |  (len(ts) >= 30 AND len(ts) <= 80) AS r1,
         |  (CAST(list_sum(list_transform(ts, x -> length(x))) AS DOUBLE)
         |     / len(ts) >= 3.9
         |   AND CAST(list_sum(list_transform(ts, x -> length(x))) AS DOUBLE)
         |     / len(ts) <= 5.1) AS r2,
         |  (len(list_filter(ts, x -> x IN ($stopList))) >= 2) AS r3,
         |  (CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) >= 0.5) AS r4
         | FROM t)
         |SELECT lang, count(*) AS n_docs,
         | CAST(sum(CASE WHEN NOT r1 THEN 1 ELSE 0 END) AS BIGINT) AS fail_wordcount,
         | CAST(sum(CASE WHEN NOT r2 THEN 1 ELSE 0 END) AS BIGINT) AS fail_wordlen,
         | CAST(sum(CASE WHEN NOT r3 THEN 1 ELSE 0 END) AS BIGINT) AS fail_stopwords,
         | CAST(sum(CASE WHEN NOT r4 THEN 1 ELSE 0 END) AS BIGINT) AS fail_repetition,
         | CAST(sum(CASE WHEN r1 AND r2 AND r3 AND r4 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS pass_all
         |FROM r GROUP BY lang ORDER BY lang""".stripMargin,
    "q_text_stats" ->
      s"""SELECT doc_id,
         | len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         | CAST(length(text) AS BIGINT) AS len_chars,
         | round(CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |   t -> t IN ($stopList))) AS DOUBLE)
         |  / len(string_split_regex(trim(text), '\\s+')), 4) AS stop_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      s"""WITH t AS (
         | SELECT source, string_split_regex(trim(text), '\\s+') AS ts FROM documents),
         |m AS (
         | SELECT source,
         |  least(CAST(len(ts) AS DOUBLE) / 100.0, 1.0) *
         |   (1.0 - (CAST(len(list_filter(ts, t -> t IN ($stopList))) AS DOUBLE)
         |           / len(ts)) * 0.5) AS quality,
         |  list_sum(list_transform(ts,
         |    t -> greatest(1, CAST(ceil(length(t) / 4.0) AS BIGINT)))) AS bpeish
         | FROM t)
         |SELECT source, round(avg(quality), 4) AS avg_quality,
         | CAST(sum(bpeish) AS BIGINT) AS total_bpeish, count(*) AS n_docs
         |FROM m GROUP BY source ORDER BY source""".stripMargin,
    "q_token_topk" ->
      """SELECT token, count(*) AS cnt FROM (
        | SELECT unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents)
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin,
    // the bucket-capped approximate path is held to the EXACT top-20: its
    // counts are exact by construction (phase-2 recount) and at oracle
    // scale its recall is 1.0 deterministically (xxhash64 is seedless), so
    // any miss is a real algorithmic break, not sampling noise
    "q_heavy_hitters" ->
      """SELECT token, count(*) AS cnt FROM (
        | SELECT unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents)
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin,
    "q_curation" ->
      s"""WITH t AS (
         | SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS ts
         | FROM documents),
         |m AS (
         | SELECT doc_id, len(ts) AS n_tokens,
         |  least(CAST(len(ts) AS DOUBLE) / 100.0, 1.0) *
         |   (1.0 - (CAST(len(list_filter(ts, x -> x IN ($stopList))) AS DOUBLE)
         |           / len(ts)) * 0.5) AS quality
         | FROM t),
         |k AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text)
         |SELECT m.doc_id, CAST(m.n_tokens AS BIGINT) AS n_tokens,
         | round(m.quality, 4) AS quality
         |FROM m JOIN k USING (doc_id)
         |WHERE m.quality >= 0.5 AND m.n_tokens BETWEEN 5 AND 200
         |ORDER BY m.doc_id""".stripMargin,
    "q_lang_id" ->
      s"""WITH lt AS (SELECT doc_id, lang, lower(text) AS t FROM documents),
         |scores AS (
         |$langScoreSql),
         |ranked AS (
         | SELECT lang, cand,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand DESC) AS rn
         | FROM scores)
         |SELECT lang, cand AS lang_pred, count(*) AS cnt FROM ranked
         |WHERE rn = 1 GROUP BY lang, cand ORDER BY lang, lang_pred""".stripMargin,
    "q_mixed_lang" ->
      s"""WITH halves AS (
         | SELECT doc_id, source,
         |  substr(lower(text), 1, length(lower(text)) // 2) AS h1,
         |  substr(lower(text), length(lower(text)) // 2 + 1, length(lower(text))) AS h2
         | FROM documents),
         |s1 AS (
         |${halfScoreSql("h1")}),
         |s2 AS (
         |${halfScoreSql("h2")}),
         |p1 AS (
         | SELECT doc_id, source, cand FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand DESC) AS rn
         |  FROM s1) WHERE rn = 1),
         |p2 AS (
         | SELECT doc_id, source, cand FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand DESC) AS rn
         |  FROM s2) WHERE rn = 1),
         |j AS (
         | SELECT p1.source, CAST(p1.cand <> p2.cand AS BIGINT) AS mixed
         | FROM p1 JOIN p2 USING (doc_id, source))
         |SELECT source, count(*) AS n_docs, CAST(sum(mixed) AS BIGINT) AS n_mixed,
         | (CAST(sum(mixed) AS BIGINT) * 1000) // count(*) AS mixed_milli
         |FROM j GROUP BY source ORDER BY source""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id, list_reduce(
        |  list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |  (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_ngram_lm" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |bg AS (
        | SELECT unnest(list_transform(range(1, len(ts)),
        |   i -> {'w1': ts[i], 'w2': ts[i+1]})) AS p
        | FROM toks WHERE len(ts) >= 2),
        |cnt AS (
        | SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS c FROM bg GROUP BY 1, 2),
        |tot AS (SELECT w1, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY w1)
        |SELECT cnt.w1, cnt.w2, CAST(cnt.c AS BIGINT) AS c,
        | round(CAST(cnt.c AS DOUBLE) / tot.t, 4) AS p_cond
        |FROM cnt JOIN tot ON cnt.w1 = tot.w1
        |WHERE cnt.c >= 5
        |ORDER BY cnt.w1, cnt.w2""".stripMargin,
    "q_collocations" ->
      """WITH toks AS (
        | SELECT string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |bg AS (
        | SELECT unnest(list_transform(range(1, len(ts)),
        |   i -> {'w1': ts[i], 'w2': ts[i+1]})) AS p
        | FROM toks WHERE len(ts) >= 2),
        |cnt AS (
        | SELECT p.w1 AS w1, p.w2 AS w2, CAST(count(*) AS BIGINT) AS c
        | FROM bg GROUP BY 1, 2),
        |lm AS (SELECT w1, CAST(sum(c) AS BIGINT) AS l_cnt FROM cnt GROUP BY w1),
        |rm AS (SELECT w2, CAST(sum(c) AS BIGINT) AS r_cnt FROM cnt GROUP BY w2),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n_bigrams FROM cnt)
        |SELECT cnt.w1, cnt.w2, cnt.c,
        | (cnt.c * 1000 * n.n_bigrams) // (lm.l_cnt * rm.r_cnt) AS lift_milli
        |FROM cnt JOIN lm USING (w1) JOIN rm USING (w2) CROSS JOIN n
        |WHERE cnt.c >= 5
        |ORDER BY lift_milli DESC, w1, w2
        |LIMIT 100""".stripMargin,
    "q_diversity_select" ->
      """WITH r AS (
        | SELECT lang, source, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY lang, source
        |                     ORDER BY n_chars DESC, doc_id) AS src_rank
        | FROM documents),
        |sel AS (
        | SELECT lang, doc_id, source, n_chars, src_rank,
        |  row_number() OVER (PARTITION BY lang
        |                     ORDER BY n_chars DESC, doc_id) AS sel_rank
        | FROM r WHERE src_rank <= 5)
        |SELECT lang, sel_rank, doc_id, source, n_chars, src_rank
        |FROM sel WHERE sel_rank <= 20
        |ORDER BY lang, sel_rank""".stripMargin,
    "q_shard_assign" ->
      """WITH g AS (
        | SELECT lang, doc_id,
        |  row_number() OVER (ORDER BY lang, doc_id) - 1 AS gid
        | FROM documents)
        |SELECT lang, doc_id, gid, gid // 64 AS shard, gid % 64 AS slot
        |FROM g ORDER BY gid""".stripMargin,
    "q_skipgrams" ->
      """WITH toks AS (
        | SELECT string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |p AS (
        | SELECT unnest(list_transform(range(1, len(ts)),
        |   i -> {'w1': ts[i], 'w2': ts[i+1]})) AS p
        | FROM toks WHERE len(ts) >= 2
        | UNION ALL
        | SELECT unnest(list_transform(range(1, len(ts)-1),
        |   i -> {'w1': ts[i], 'w2': ts[i+2]})) AS p
        | FROM toks WHERE len(ts) >= 3)
        |SELECT p.w1 AS w1, p.w2 AS w2, CAST(count(*) AS BIGINT) AS cnt
        |FROM p GROUP BY 1, 2
        |ORDER BY cnt DESC, w1, w2 LIMIT 100""".stripMargin,
    "q_vocab_coverage" ->
      """WITH tok AS (
        | SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS token
        | FROM documents),
        |vocab AS (
        | SELECT token FROM (
        |  SELECT token, count(*) AS cnt FROM tok GROUP BY token)
        | ORDER BY cnt DESC, token LIMIT 1000),
        |f AS (
        | SELECT t.lang,
        |  CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
        | FROM tok t LEFT JOIN vocab v USING (token))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
        | CAST(sum(oov) AS BIGINT) AS n_oov,
        | (CAST(sum(oov) AS BIGINT) * 1000) // count(*) AS oov_milli
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin,
    "q_dup_provenance" ->
      """WITH u AS (
        | SELECT text, source FROM documents
        | UNION ALL
        | SELECT text, 'mirror' AS source FROM documents WHERE doc_id % 13 = 2),
        |ds AS (SELECT DISTINCT text, source FROM u)
        |SELECT a.source AS src_a, b.source AS src_b,
        | CAST(count(*) AS BIGINT) AS n_texts
        |FROM ds a JOIN ds b ON a.text = b.text AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,
    "q_funnel" ->
      """WITH signup AS (
        | SELECT user_id, min(ts) AS t_signup FROM events
        | WHERE event_type = 'signup' GROUP BY user_id),
        |click AS (
        | SELECT e.user_id, min(e.ts) AS t_click
        | FROM events e JOIN signup s ON e.user_id = s.user_id
        | WHERE e.event_type = 'click' AND e.ts >= s.t_signup
        | GROUP BY e.user_id),
        |purchase AS (
        | SELECT e.user_id, min(e.ts) AS t_purchase
        | FROM events e JOIN click c ON e.user_id = c.user_id
        | WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        | GROUP BY e.user_id)
        |SELECT
        | (SELECT count(*) FROM signup) AS n_signup,
        | (SELECT count(*) FROM click) AS n_click,
        | (SELECT count(*) FROM purchase) AS n_purchase,
        | round(CAST((SELECT count(*) FROM click) AS DOUBLE)
        |   / (SELECT count(*) FROM signup), 4) AS click_rate,
        | round(CAST((SELECT count(*) FROM purchase) AS DOUBLE)
        |   / (SELECT count(*) FROM signup), 4) AS purchase_rate""".stripMargin,
    "q_repetition" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |bg AS (
        | SELECT doc_id, list_transform(range(1, len(ts)),
        |   i -> ts[i] || ' ' || ts[i+1]) AS bgs
        | FROM toks WHERE len(ts) >= 2),
        |e AS (SELECT doc_id, unnest(bgs) AS b FROM bg),
        |cnt AS (SELECT doc_id, b, count(*) AS c FROM e GROUP BY 1, 2),
        |agg AS (
        | SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |  count(*) AS n_distinct, max(c) AS mx
        | FROM cnt GROUP BY doc_id)
        |SELECT doc_id, n_bigrams,
        | round(1.0 - CAST(n_distinct AS DOUBLE) / n_bigrams, 4) AS dup_frac,
        | round(CAST(mx AS DOUBLE) / n_bigrams, 4) AS top_frac
        |FROM agg ORDER BY doc_id""".stripMargin,
    "q_pack_sequences" ->
      """WITH base AS (
        | SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  doc_id % 8 AS shard
        | FROM documents),
        |cum AS (
        | SELECT doc_id, shard, n_tokens,
        |  coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_tokens
        | FROM base)
        |SELECT doc_id, shard, n_tokens,
        | CAST(floor(prev_tokens / 2048.0) AS BIGINT) AS seq_id
        |FROM cum ORDER BY doc_id""".stripMargin,
    "q_train_split" ->
      """WITH b AS (
        | SELECT lang,
        |  ((((doc_id % 2147483648) * 2654435761) % 2147483648) * 100) // 2147483648
        |   AS bucket
        | FROM documents),
        |s AS (
        | SELECT lang,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val'
        |       ELSE 'test' END AS split
        | FROM b)
        |SELECT split, lang, count(*) AS cnt FROM s
        |GROUP BY split, lang ORDER BY split, lang""".stripMargin,
    "q_dup_spans" ->
      """WITH t AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        | FROM documents),
        |w AS (
        | SELECT doc_id, len(toks) AS n_tokens, i - 1 AS pos,
        |  array_to_string(toks[i:i+7], ' ') AS win
        | FROM t, unnest(range(1, len(toks) - 6)) AS u(i)
        | WHERE len(toks) >= 8),
        |dup AS (
        | SELECT win FROM w GROUP BY win HAVING count(DISTINCT doc_id) > 1),
        |p AS (SELECT w.doc_id, w.n_tokens, w.pos FROM w JOIN dup USING (win)),
        |l AS (
        | SELECT doc_id, n_tokens, pos,
        |  lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        | FROM p),
        |b AS (
        | SELECT *, CASE WHEN prev IS NULL OR pos > prev + 8
        |   THEN 1 ELSE 0 END AS brk
        | FROM l),
        |isl AS (
        | SELECT doc_id, n_tokens, pos,
        |  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        | FROM b),
        |sp AS (
        | SELECT doc_id, any_value(n_tokens) AS n_tokens, island,
        |  min(pos) AS s0, max(pos) + 8 AS s1
        | FROM isl GROUP BY doc_id, island)
        |SELECT doc_id, count(*) AS n_spans,
        | CAST(sum(s1 - s0) AS BIGINT) AS dup_tokens,
        | CAST(max(s1 - s0) AS BIGINT) AS max_span,
        | round(CAST(sum(s1 - s0) AS DOUBLE) / any_value(n_tokens), 4) AS dup_ratio
        |FROM sp GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_dup_excise" ->
      """WITH t AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        | FROM documents),
        |w AS (
        | SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+7], ' ') AS win
        | FROM t, unnest(range(1, len(toks) - 6)) AS u(i)
        | WHERE len(toks) >= 8),
        |ws AS (
        | SELECT win, count(DISTINCT doc_id) AS nd,
        |  min(struct_pack(doc_id := doc_id, pos := pos)) AS canon
        | FROM w GROUP BY win),
        |rem AS (
        | SELECT w.doc_id, w.pos FROM w JOIN ws USING (win)
        | WHERE ws.nd > 1 AND ws.canon.doc_id < w.doc_id),
        |tok AS (
        | SELECT doc_id, i - 1 AS idx, toks[i] AS tk
        | FROM t, unnest(range(1, len(toks) + 1)) AS u(i)),
        |kept AS (
        | SELECT tok.doc_id, tok.idx, tok.tk FROM tok
        | WHERE NOT EXISTS (SELECT 1 FROM rem
        |   WHERE rem.doc_id = tok.doc_id
        |     AND tok.idx >= rem.pos AND tok.idx < rem.pos + 8)),
        |k2 AS (
        | SELECT doc_id, count(*) AS n_after,
        |  string_agg(tk, ' ' ORDER BY idx) AS text_after
        | FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_before,
        | CAST(coalesce(k2.n_after, 0) AS BIGINT) AS n_after,
        | coalesce(k2.text_after, '') AS text_after
        |FROM t LEFT JOIN k2 USING (doc_id) ORDER BY t.doc_id""".stripMargin,
    "q_decontam" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(ts)-1),
        |   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
        | FROM toks WHERE len(ts) >= 3),
        |e AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |probe AS (SELECT DISTINCT shingle FROM e WHERE doc_id < 5)
        |SELECT DISTINCT doc_id FROM e
        |WHERE doc_id >= 5 AND shingle IN (SELECT shingle FROM probe)
        |ORDER BY doc_id""".stripMargin,
    // the bloom path must be output-identical to the semi-join path:
    // same oracle text
    "q_decontam_bloom" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(ts)-1),
        |   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
        | FROM toks WHERE len(ts) >= 3),
        |e AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |probe AS (SELECT DISTINCT shingle FROM e WHERE doc_id < 5)
        |SELECT DISTINCT doc_id FROM e
        |WHERE doc_id >= 5 AND shingle IN (SELECT shingle FROM probe)
        |ORDER BY doc_id""".stripMargin,
    "q_pii_stats" ->
      s"""SELECT source, count(*) AS n_docs,
         | CAST(sum(len(regexp_extract_all(text, '$emailRe'))) AS BIGINT) AS n_emails,
         | CAST(sum(len(regexp_extract_all(text, '$urlRe'))) AS BIGINT) AS n_urls,
         | CAST(sum(len(regexp_extract_all(
         |   regexp_replace(text, '$urlRe', '<URL>', 'g'), '$longNumRe'))) AS BIGINT)
         |  AS n_longnums
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_curate_llm" ->
      """WITH t AS (
        | SELECT doc_id, source, lang, text,
        |  string_split_regex(trim(text), '\s+') AS ts
        | FROM documents),
        |tok AS (SELECT doc_id, source, lang, CAST(len(ts) AS BIGINT) AS n_tokens FROM t),
        |st AS (SELECT lang, avg(n_tokens) AS mu, stddev_samp(n_tokens) AS sigma
        |       FROM tok GROUP BY 1),
        |inrange AS (
        | SELECT tok.doc_id, tok.source, tok.n_tokens
        | FROM tok JOIN st ON tok.lang = st.lang
        | WHERE round(abs(n_tokens - mu), 4) <= round(1.8 * sigma, 4)),
        |bg AS (
        | SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
        | FROM t, unnest(range(1, len(ts))) AS u(i) WHERE len(ts) >= 2),
        |cnt AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
        |tot AS (SELECT w1, sum(c) AS tot FROM cnt GROUP BY 1),
        |lm AS (SELECT w1, w2, CAST(c AS DOUBLE) / tot AS p FROM cnt JOIN tot USING (w1)),
        |ppl AS (SELECT doc_id, exp(-avg(ln(p))) AS ppl
        |        FROM bg JOIN lm USING (w1, w2) GROUP BY 1),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(ts)-1),
        |   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
        | FROM t WHERE len(ts) >= 3),
        |e AS (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE doc_id >= 5),
        |probe AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id < 5),
        |ov AS (
        | SELECT e.doc_id,
        |  round(CAST(count(probe.shingle) AS DOUBLE) / count(*), 4) AS overlap
        | FROM e LEFT JOIN probe ON e.shingle = probe.shingle GROUP BY 1),
        |losers AS (
        | SELECT doc_id FROM (
        |  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS keep
        |  FROM documents WHERE doc_id >= 5)
        | WHERE doc_id <> keep),
        |curated AS (
        | SELECT i.doc_id, i.source, i.n_tokens
        | FROM inrange i
        | JOIN ppl ON i.doc_id = ppl.doc_id
        | LEFT JOIN ov ON i.doc_id = ov.doc_id
        | WHERE i.doc_id >= 5
        |  AND round(ppl.ppl, 2) BETWEEN 26 AND 34
        |  AND coalesce(ov.overlap, 0) <= 0.2
        |  AND i.doc_id NOT IN (SELECT doc_id FROM losers)),
        |h AS (
        | SELECT source, doc_id, n_tokens,
        |  ((doc_id % 2147483648) * 2654435761) % 2147483648 AS hv
        | FROM curated),
        |c AS (
        | SELECT source, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY source ORDER BY hv, doc_id) AS cum
        | FROM h)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS kept_tokens
        |FROM c WHERE cum <= 600
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_outliers" ->
      """WITH t AS (
        | SELECT doc_id, lang,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        | FROM documents),
        |s AS (SELECT lang, avg(n_tokens) AS mu, stddev_samp(n_tokens) AS sigma
        |      FROM t GROUP BY 1)
        |SELECT doc_id, t.lang, n_tokens
        |FROM t JOIN s ON t.lang = s.lang
        |WHERE abs(n_tokens - mu) > 1.8 * sigma
        |ORDER BY doc_id""".stripMargin,
    "q_chunking" ->
      """WITH t AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |c AS (
        | SELECT doc_id, st // 48 AS chunk_idx, ts[st+1 : st+64] AS chunk
        | FROM t, unnest(range(0, len(ts), 48)) AS u(st)
        | WHERE len(ts) > 0)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        | CAST(len(chunk) AS BIGINT) AS n_tokens,
        | array_to_string(chunk, ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_corpus_mix" ->
      """WITH t AS (
        | SELECT source, doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  ((doc_id % 2147483648) * 2654435761) % 2147483648 AS hv
        | FROM documents),
        |c AS (
        | SELECT source, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY source ORDER BY hv, doc_id) AS cum
        | FROM t)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS kept_tokens
        |FROM c WHERE cum <= 600
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_contam_overlap" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(ts)-1),
        |   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
        | FROM toks WHERE len(ts) >= 3),
        |e AS (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE doc_id >= 5),
        |probe AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id < 5)
        |SELECT e.doc_id, count(*) AS n_shingles,
        | round(CAST(count(probe.shingle) AS DOUBLE) / count(*), 4) AS overlap
        |FROM e LEFT JOIN probe ON e.shingle = probe.shingle
        |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin,
    "q_doc_perplexity" ->
      """WITH t AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |bg AS (
        | SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
        | FROM t, unnest(range(1, len(ts))) AS u(i) WHERE len(ts) >= 2),
        |cnt AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
        |tot AS (SELECT w1, sum(c) AS tot FROM cnt GROUP BY 1),
        |lm AS (SELECT w1, w2, CAST(c AS DOUBLE) / tot AS p
        |       FROM cnt JOIN tot USING (w1))
        |SELECT doc_id, count(*) AS n_bigrams,
        | round(exp(-avg(ln(p))), 2) AS ppl
        |FROM bg JOIN lm USING (w1, w2)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_vocab" ->
      """WITH counts AS (
        | SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents)
        | GROUP BY token),
        |ranked AS (
        | SELECT row_number() OVER (ORDER BY cnt DESC, token) AS token_id,
        |        token, cnt
        | FROM counts)
        |SELECT token_id, token, cnt FROM ranked
        |WHERE token_id <= 100 ORDER BY token_id""".stripMargin,
    "q_redact" ->
      """WITH dirty AS (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0
        |   THEN text || ' reach me at user' || doc_id ||
        |        '@mail.example.com or https://t.example.org/u/' ||
        |        doc_id || '/9876543 ref 12345678'
        |   ELSE text END AS d
        | FROM documents)
        |SELECT doc_id,
        | regexp_replace(
        |  regexp_replace(
        |   regexp_replace(d, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   'https?://[^\s]+', '<URL>', 'g'),
        |  '[0-9]{6,}', '<NUM>', 'g') AS clean
        |FROM dirty ORDER BY doc_id""".stripMargin,
    "q_curate_full" ->
      ("""WITH RECURSIVE red AS (
        | SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^\s]+', '<URL>', 'g'),
        |    '[0-9]{6,}', '<NUM>', 'g') AS text
        | FROM documents),
        |keepx AS (SELECT min(doc_id) AS doc_id FROM red GROUP BY text),
        |nx AS (SELECT rr.doc_id, rr.text FROM red rr JOIN keepx USING (doc_id)),
        |toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM nx),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(ts)-1),
        |   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
        | FROM toks WHERE len(ts) >= 3),
        |e AS (SELECT doc_id, len(s) AS nsh, unnest(s) AS shingle FROM sh),
        |common AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.nsh AS na, b.nsh AS nb, count(*) AS c
        | FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        | GROUP BY 1, 2, 3, 4),
        |pairs AS (SELECT a_id, b_id FROM common WHERE CAST(c AS DOUBLE)/(na+nb-c) >= 0.6),
        |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
        |          UNION ALL SELECT b_id, a_id FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |r(id, n) AS (
        | SELECT id, id FROM nodes
        | UNION
        | SELECT r.id, e2.dst FROM r JOIN edges e2 ON e2.src = r.n),
        |losers AS (
        | SELECT id FROM (SELECT id, min(n) AS c FROM r GROUP BY id) WHERE id <> c),
        |m AS (
        | SELECT doc_id, len(ts) AS n_tokens,
        |  least(CAST(len(ts) AS DOUBLE) / 100.0, 1.0) *
        |   (1.0 - (CAST(len(list_filter(ts, t -> t IN (""".stripMargin + stopList + """))) AS DOUBLE)
        |           / len(ts)) * 0.5) AS quality
        | FROM toks WHERE doc_id NOT IN (SELECT id FROM losers))
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, round(quality, 4) AS quality
        |FROM m WHERE quality >= 0.5 AND n_tokens BETWEEN 5 AND 200 ORDER BY doc_id""".stripMargin),
    "q_sessionize" ->
      """WITH w AS (
        | SELECT user_id, event_id, value, ts,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events),
        |b AS (
        | SELECT *, CASE WHEN prev_ts IS NULL
        |   OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS brk
        | FROM w),
        |sess AS (
        | SELECT user_id, event_id, value, ts,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM b)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        | count(*) AS n_events, round(sum(value), 2) AS session_value,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q_nfc_normalize" ->
      """WITH t AS (
        | SELECT doc_id, CASE
        |   WHEN doc_id % 3 = 0 THEN text || ' cafe' || chr(769)
        |   WHEN doc_id % 3 = 1 THEN text || ' caf' || chr(233)
        |   ELSE text END AS dirty
        | FROM documents)
        |SELECT doc_id, nfc_normalize(dirty) AS norm_text,
        | CAST(nfc_normalize(dirty) <> dirty AS BIGINT) AS changed
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_para_dedup" ->
      """WITH t AS (
        | SELECT doc_id, string_split(text, '. ') AS ps FROM documents),
        |p AS (
        | SELECT doc_id, i - 1 AS pos, ps[i] AS para
        | FROM t, unnest(range(1, len(ps) + 1)) AS u(i)
        | WHERE length(trim(ps[i])) > 0),
        |keepers AS (
        | SELECT para, min(struct_pack(doc_id := doc_id, pos := pos)) AS k
        | FROM p GROUP BY para)
        |SELECT p.doc_id, count(*) AS n_paras,
        | string_agg(p.para, '. ' ORDER BY p.pos) AS cleaned
        |FROM p JOIN keepers ON p.para = keepers.para
        | AND p.doc_id = keepers.k.doc_id AND p.pos = keepers.k.pos
        |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin,
    "q_scd2" ->
      """WITH w AS (
        | SELECT user_id, event_id, event_type, ts,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        | FROM events),
        |b AS (
        | SELECT *, CASE WHEN prev_type IS NULL OR prev_type <> event_type
        |   THEN 1 ELSE 0 END AS chg
        | FROM w),
        |v AS (
        | SELECT user_id, event_type, ts,
        |  sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
        | FROM b),
        |runs AS (
        | SELECT user_id, version, min(event_type) AS event_type,
        |  min(ts) AS from_ts, count(*) AS n_events
        | FROM v GROUP BY user_id, version)
        |SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
        | strftime(from_ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        | strftime(lead(from_ts) OVER (PARTITION BY user_id ORDER BY version),
        |   '%Y-%m-%d %H:%M:%S') AS valid_to,
        | n_events
        |FROM runs ORDER BY user_id, version""".stripMargin,
    "q_tfidf" ->
      """WITH tok AS (
        | SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
        | FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok)
        |SELECT tf.doc_id, tf.token, tf.tf,
        | round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS tfidf
        |FROM tf JOIN df USING (token) CROSS JOIN n
        |WHERE tf.doc_id < 100
        |ORDER BY tf.doc_id, tf.token""".stripMargin,
    "q_session_window" ->
      """WITH e AS (
        | SELECT user_id, event_id, value, epoch_us(ts) AS tus,
        |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tus
        | FROM events),
        |b AS (
        | SELECT user_id, event_id, value, tus, CASE WHEN prev_tus IS NULL
        |   OR tus - prev_tus >= 1800000000 THEN 1 ELSE 0 END AS brk
        | FROM e),
        |sess AS (
        | SELECT user_id, value, tus,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM b)
        |SELECT user_id,
        | strftime(make_timestamp(min(tus)), '%Y-%m-%d %H:%M:%S') AS session_start,
        | strftime(make_timestamp(max(tus) + 1800000000), '%Y-%m-%d %H:%M:%S') AS session_end,
        | count(*) AS n_events, round(sum(value), 2) AS session_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
  )
}
