package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline layer:
  * tokenization, shingling, quality metrics, language ID, fingerprinting.
  *
  * All pure `Column => Column` compositions of built-ins (higher-order
  * array functions, no UDFs) so they distribute trivially and stay inside
  * codegen where Spark supports it. Designed for a documents table of any
  * size: everything is per-row scalar work, no shuffles.
  */
object TextFunctions {

  /** Whitespace tokenization; trim first so no empty boundary tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word n-gram shingles (n=3) — the unit for Jaccard/MinHash
    * dedup. Empty for docs with fewer than 3 tokens.
    *
    * Built from three shifted `slice`s zipped together rather than
    * `element_at` lookups inside a lambda: expressions captured by a
    * higher-order-function lambda are re-evaluated per element (so a
    * `split` feeding `element_at` would run O(tokens) times per row);
    * slice arguments are evaluated once per row. */
  def shingles3(toks: Column): Column = {
    val m = greatest(size(toks) - 2, lit(0))
    val ab = zip_with(slice(toks, lit(1), m), slice(toks, lit(2), m),
      (x, y) => concat(x, lit(" "), y))
    array_distinct(zip_with(ab, slice(toks, lit(3), m),
      (xy, z) => concat(xy, lit(" "), z)))
  }

  /** Tiny stopword list matched to the synthetic vocab; the op (stopword
    * ratio) is what matters, the list is a parameter. */
  val stopwords: Seq[String] = Seq("the", "a", "data", "row", "value")

  /** Fraction of tokens that are stopwords — single int/int division, so
    * bit-identical across engines without rounding. */
  def stopwordRatio(toks: Column): Column = {
    val stops = filter(toks, t => t.isin(stopwords.map(_.asInstanceOf[Any]): _*))
    size(stops).cast("double") / size(toks).cast("double")
  }

  /** Composite quality score in [0,1]-ish: rewards length up to 100 tokens,
    * penalizes stopword share. Rational arithmetic only (no transcendentals
    * — libm vs java.Math differ in ulps across engines). */
  def qualityScore(toks: Column): Column = {
    val lenScore = least(size(toks).cast("double") / 100.0, lit(1.0))
    lenScore * (lit(1.0) - stopwordRatio(toks) * 0.5)
  }

  /** BPE-ish subword count estimate: whitespace tokens plus an extra unit
    * per 4 chars of long words (a cheap deterministic stand-in for a real
    * tokenizer's subword splits). */
  def tokenCountBpeIsh(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => acc + greatest(lit(1L), ceil(length(t).cast("double") / 4.0).cast("long")))

  /** Character-trigram profiles per language for the n-gram language-ID
    * heuristic. Tiny on purpose: real profiles are a fitted parameter. */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "ing", "ion", "and", "ed "),
    "es" -> Seq("de ", "la ", "os ", "ción", "ar "),
    "fr" -> Seq("le ", "es ", "de ", "ent", "eur"),
    "de" -> Seq("der", "ein", "sch", "ung", "en "),
    "zh" -> Seq("zh", "ng ", "sh", "xi", "ao"))

  /** N-gram-heuristic language ID: score = number of profile trigrams that
    * occur in the text; argmax wins, ties broken by language code order.
    * Returns the winning language code.
    *
    * `loweredText` should be a plain column reference (e.g. a prior
    * `withColumn("lt", lower(text))`): the expression references it ~25
    * times, and a non-trivial subtree there would be re-evaluated per
    * reference. */
  def langId(loweredText: Column): Column = {
    val scored = langProfiles.toSeq.sortBy(_._1).map { case (lang, grams) =>
      val score = grams.map(g => when(loweredText.contains(g), 1).otherwise(0))
        .reduce((a, b) => a + b)
      struct(score.as("score"), lit(lang).as("lang"))
    }
    // array_max on (score, lang) structs: max score, then max lang code —
    // deterministic. Ties pick the lexicographically last code.
    array_max(array(scored: _*)).getField("lang")
  }

  /** PII-ish redaction patterns — kept to the regex subset Java and RE2
    * interpret identically (no lookaround/backrefs) so the DuckDB oracle
    * replays them verbatim. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlRe = "https?://[^\\s]+"
  val longNumRe = "[0-9]{6,}"

  /** Training-corpus scrubbing: emails → <EMAIL>, URLs → <URL>, then
    * 6+-digit runs → <NUM> (after URLs so their digits don't double-fire).
    * Pure per-row regexp_replace chain — codegen'd, no shuffles. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        urlRe, "<URL>"),
      longNumRe, "<NUM>")

  /** Rolling polynomial fingerprint over the document's characters:
    * acc = (acc * 31 + ascii(char)) mod 1e9+7. Order-sensitive (unlike a
    * token-set hash) so it distinguishes permuted documents. */
  def fingerprint(text: Column): Column = {
    val chars = split(text, "")
    aggregate(chars, lit(0L),
      (acc, c) => pmod(acc * 31 + ascii(c), lit(1000000007L)))
  }
}
