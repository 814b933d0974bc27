package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions.tokens

/** r7q batch — corpus-hygiene operators: boilerplate/template
  * detection by shared prefixes, truncation-duplicate discovery (docs
  * that are exact token-prefixes of longer docs — the dup class exact
  * hashing misses because the full-text hashes differ), and file-level
  * accounting through Spark's `_metadata` hidden column over a
  * partitioned sink.
  */
object Corpus2 {
  type Q = (SparkSession, String) => DataFrame

  /** Boilerplate template detection: first-3-token prefixes shared by
    * ≥2 documents — the header/banner fingerprint a curation pass
    * strips before dedup (shared openings inflate shingle overlap and
    * drag unrelated docs into near-dup clusters). Reports each
    * template's document count, covered characters, and an id sample.
    *
    * 100 TB shape: one map-side-combined agg on an 8-ish-byte prefix
    * key; no joins, no windows. */
  val qTemplateDetect: Q = (s, d) => {
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .withColumn("prefix", concat_ws(" ", slice(col("toks"), 1, 3)))
      .groupBy("prefix")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars_covered"),
        min("doc_id").as("min_doc_id"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("prefix"))
  }

  /** Truncation-duplicate discovery: (shorter, longer) doc pairs where
    * the shorter doc's token sequence is an exact proper prefix of the
    * longer's. Exact-hash dedup cannot catch these (different full
    * texts), yet truncated re-crawls are a common real dup class.
    * Banding: candidates must agree on the first-8-token fingerprint —
    * an equality join on a short string key — and only candidates are
    * token-verified; docs under 8 tokens are out of scope (they fall to
    * the shingle-based near-dup path).
    *
    * 100 TB shape: the fingerprint join is the standard inverted-index
    * equality shape (hot prefixes = the template keys above — a
    * production run feeds qTemplateDetect's output in as a stoplist);
    * the O(len) verify runs per candidate pair only. */
  val qPrefixDups: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tok", size(col("toks")))
      .filter(col("n_tok") >= 8)
      .withColumn("fp", concat_ws(" ", slice(col("toks"), 1, 8)))
      .select(col("doc_id"), col("toks"), col("n_tok"), col("fp"))
    val a = docs.select(col("doc_id").as("short_id"), col("toks").as("a_toks"),
      col("n_tok").as("a_n"), col("fp"))
    val b = docs.select(col("doc_id").as("long_id"), col("toks").as("b_toks"),
      col("n_tok").as("b_n"), col("fp"))
    a.join(b, Seq("fp"))
      .filter(col("a_n") < col("b_n"))
      .filter(concat_ws(" ", col("a_toks")) ===
        concat_ws(" ", expr("slice(b_toks, 1, a_n)")))
      .select(col("short_id"), col("long_id"), col("a_n").as("prefix_tokens"),
        (col("b_n") - col("a_n")).as("extra_tokens"))
      .orderBy("short_id", "long_id")
  }

  /** File-level accounting via the `_metadata` hidden column: write the
    * events table partitioned by type (one file per partition via
    * repartition-on-key), read it back, and report per-file row counts
    * with the partition value parsed from the file path — the
    * sink-audit a pipeline runs to catch small-file explosions and
    * partition skew at the storage layer. The oracle replays the
    * per-type counts (file identity ≡ partition identity by
    * construction here).
    *
    * 100 TB shape: `_metadata` is populated at scan time from the
    * file index — no extra I/O; the accounting agg is map-side
    * combined on the file-path key. */
  private val run = new java.util.concurrent.atomic.AtomicLong()
  val qFileAccounting: Q = (s, d) => {
    val dir = java.nio.file.Files.createTempDirectory("graft_facct").toString +
      s"/run_${run.incrementAndGet()}"
    Tables.events(s, d)
      .select(col("event_type"), col("event_id"))
      .repartition(col("event_type"))
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    s.read.parquet(dir)
      .select(col("event_type"), col("_metadata.file_path").as("fp"))
      .groupBy("event_type")
      .agg(countDistinct("fp").as("n_files"), count(lit(1)).as("n_rows"))
      .orderBy("event_type")
  }

  val all: Map[String, Q] = Map(
    "q_template_detect" -> qTemplateDetect,
    "q_prefix_dups" -> qPrefixDups,
    "q_file_accounting" -> qFileAccounting,
  )

  val oracles: Map[String, String] = Map(
    "q_template_detect" ->
      """WITH t AS (
        | SELECT doc_id, n_chars, string_split(trim(text), ' ') AS tk
        | FROM documents
        | WHERE len(string_split(trim(text), ' ')) >= 3)
        |SELECT array_to_string(tk[1:3], ' ') AS prefix,
        | count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS chars_covered,
        | min(doc_id) AS min_doc_id
        |FROM t GROUP BY prefix HAVING count(*) >= 2
        |ORDER BY n_docs DESC, prefix""".stripMargin,
    "q_prefix_dups" ->
      """WITH t AS (
        | SELECT doc_id, string_split(trim(text), ' ') AS tk
        | FROM documents
        | WHERE len(string_split(trim(text), ' ')) >= 8)
        |SELECT a.doc_id AS short_id, b.doc_id AS long_id,
        | CAST(len(a.tk) AS INTEGER) AS prefix_tokens,
        | CAST(len(b.tk) - len(a.tk) AS INTEGER) AS extra_tokens
        |FROM t a JOIN t b
        | ON array_to_string(a.tk[1:8], ' ') = array_to_string(b.tk[1:8], ' ')
        | AND len(a.tk) < len(b.tk)
        | AND array_to_string(b.tk[1:len(a.tk)], ' ') = array_to_string(a.tk, ' ')
        |ORDER BY short_id, long_id""".stripMargin,
    "q_file_accounting" ->
      """SELECT event_type, CAST(1 AS BIGINT) AS n_files, count(*) AS n_rows
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
  )
}
