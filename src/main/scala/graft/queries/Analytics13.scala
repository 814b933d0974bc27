package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** r8 batch — web-ingest URL canonicalization (the Common-Crawl-style
  * dedup key an LLM-corpus pipeline computes before any content dedup)
  * and a differentially-private count release with deterministic
  * seeded noise. Both fully oracle-checked: every step is portable
  * string/float arithmetic.
  */
object Analytics13 {
  type Q = (SparkSession, String) => DataFrame

  /** URL canonicalization + URL-keyed dedup: raw crawl URLs differ in
    * scheme/host case, default ports, tracking parameters, parameter
    * order, and fragments while naming the same resource; the canonical
    * form (lowercased base, `:80` stripped, `utm_*` dropped, remaining
    * query params sorted, fragment removed) is the dedup key a web
    * corpus computes FIRST — it collapses re-crawls before any content
    * hashing runs. URLs are planted deterministically from events (the
    * testdata carries no URL column) with case/order/tracking variants
    * split across rows, so the report's `n_raw_variants > 1` proves the
    * unification; the oracle replays the identical canonicalization.
    * Lowercasing the whole base (not just scheme+host) is exact here —
    * planted paths are lowercase; a strict RFC canonicalizer would
    * split host from path first.
    *
    * 100 TB shape: all per-row work (split/filter/sort/join over a
    * handful of params) is codegen'd string arithmetic in the scan; the
    * only exchange is the hash-agg on the canonical key. The
    * count(DISTINCT url) runs as a standard two-phase partial-distinct
    * agg under the same key — no second shuffle of raw rows. */
  val qUrlCanonical: Q = (s, d) => {
    val planted = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .withColumn("url", concat(
        when(col("event_id") % 2 === 0, lit("HTTP://Example.COM:80/"))
          .otherwise(lit("http://example.com/")),
        col("event_type"), lit("/page"),
        when(col("event_id") % 2 === 0,
          concat(lit("?utm_source=x&id="), col("user_id") % 50,
            lit("&b=2&a="), col("event_id") % 3))
          .otherwise(concat(lit("?a="), col("event_id") % 3,
            lit("&utm_campaign=y&b=2&id="), col("user_id") % 50)),
        when(col("event_id") % 5 === 0, lit("#frag")).otherwise(lit(""))))
    val nofrag = element_at(split(col("url"), "#"), 1)
    val base = lower(expr("replace(element_at(split(nofrag, '\\\\?'), 1), ':80/', '/')"))
    val q = coalesce(element_at(split(nofrag, "\\?"), 2), lit(""))
    val sortedQ = array_join(
      array_sort(filter(split(q, "&"), (p: Column) => !p.startsWith("utm_"))),
      "&")
    planted
      .withColumn("nofrag", nofrag)
      .withColumn("canonical_url", concat(base,
        when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ))))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_hits"), countDistinct(col("url")).as("n_raw_variants"))
      .orderBy("canonical_url")
  }

  /** Differentially-private count release: per-event-type counts plus
    * Laplace(1/ε) noise via the inverse CDF, with the uniform drawn
    * DETERMINISTICALLY from md5(seed ‖ group key) — no RNG state, so an
    * auditor (here: DuckDB) reproduces the released figures bit-for-bit
    * from the seed, and re-running the release never re-randomizes
    * (re-randomization would let averaging cancel the noise — the
    * classic DP deployment mistake). ε = 0.5, sensitivity 1 (counts),
    * scale b = 2. The noise column is reported alongside for the test
    * surface; a production release would publish `released` only.
    *
    * 100 TB shape: one partial-agg'd count shuffle; the noise is O(1)
    * arithmetic per released GROUP, applied after aggregation — the
    * data-sized pass never sees it. */
  val qDpRelease: Q = (s, d) => {
    val u = (conv(substring(md5(concat(lit("dp-seed-1"), col("event_type"))), 1, 8),
      16, 10).cast("double") / 4294967296.0).as("u")
    val noiseRaw = lit(-2.0) * signum(col("u") - 0.5) *
      log(lit(1.0) - lit(2.0) * abs(col("u") - 0.5))
    Tables.events(s, d)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .withColumn("u", u)
      .select(col("event_type"), lit(0.5).as("epsilon"),
        round(noiseRaw, 6).as("noise"),
        round(col("n") + noiseRaw, 4).as("released"))
      .orderBy("event_type")
  }

  /** HTML → text extraction (the WET step of a web-corpus pipeline):
    * strip script blocks (dotall non-greedy — their CONTENT must go,
    * not just the tags), then all remaining tags, decode the minimal
    * entity set, collapse whitespace; extract the <title> separately
    * via one anchored regexp_extract. HTML is planted deterministically
    * around each document's text (the testdata carries no HTML column)
    * with a script block and entities in every row, so the report's
    * length deltas prove the stripping; the oracle replays the same
    * regex pipeline (patterns kept in the Java∩RE2 common dialect;
    * DuckDB's regexp_replace needs the explicit 'g' flag Spark
    * defaults to). Reported per source: doc count, extracted-title
    * match count, total raw vs extracted length.
    *
    * 100 TB shape: pure per-row regex arithmetic in the scan (all
    * codegen'd string expressions — no UDF, no parser object), one
    * partial-agg'd shuffle on source. Real boilerplate removal
    * (readability-style DOM scoring) would be a mapPartitions library
    * call; the regex WET path is the one that runs at crawl scale. */
  val qHtmlExtract: Q = (s, d) => {
    val planted = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"))
      .withColumn("html", concat(
        lit("<html><head><title>"), col("source"), lit(" #"), col("doc_id"),
        lit("</title></head><body><p class=\"main\">"), col("text"),
        lit(" &amp; more &lt;tags&gt;</p><script>var x = 1;</script></body></html>")))
    val noScript = regexp_replace(col("html"),
      "(?s)<script[^>]*>.*?</script>", " ")
    val noTags = regexp_replace(noScript, "<[^>]*>", " ")
    val decoded = expr(
      "replace(replace(replace(no_tags, '&lt;', '<'), '&gt;', '>'), '&amp;', '&')")
    val clean = trim(regexp_replace(decoded, "\\s+", " "))
    val title = regexp_extract(col("html"), "<title>([^<]*)</title>", 1)
    planted
      .withColumn("no_tags", noTags)
      .withColumn("extracted", clean)
      .withColumn("title", title)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("title") =!= "", 1L).otherwise(0L)).as("n_titled"),
        sum(length(col("html"))).as("raw_chars"),
        sum(length(col("extracted"))).as("text_chars"))
      .orderBy("source")
  }

  /** License/boilerplate detection: the per-source census of documents
    * carrying copyright or license markers — the filter every
    * code/text-corpus pipeline runs before training (and the report a
    * dataset card cites). Markers are PLANTED on deterministic co-prime
    * key subsets (÷7 copyright headers, ÷11 license footers) so
    * overlap, per-class and any-class counts are all exercised; the
    * detectors are plain lowercase substring containment — portable,
    * codegen'd, no regex needed at this tier (a production run adds a
    * pattern pack; the plan shape is identical).
    *
    * 100 TB shape: per-row string scans in the read stage, one
    * source-keyed partial-agg'd exchange. */
  val qLicenseFilter: Q = (s, d) => {
    val planted = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        concat(
          when(col("doc_id") % 7 === 0,
            lit("Copyright (c) 2020 Example Corp. All rights reserved. "))
            .otherwise(lit("")),
          col("text"),
          when(col("doc_id") % 11 === 0,
            lit(" Licensed under the Apache License, Version 2.0"))
            .otherwise(lit(""))).as("text"))
    val lower_ = lower(col("text"))
    planted
      .withColumn("has_copy", lower_.contains("copyright").cast("long"))
      .withColumn("has_rights", lower_.contains("all rights reserved").cast("long"))
      .withColumn("has_lic", lower_.contains("licensed under").cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("has_copy").as("n_copyright"),
        sum("has_rights").as("n_rights"),
        sum("has_lic").as("n_licensed"),
        sum(when(col("has_copy") + col("has_rights") + col("has_lic") > 0, 1L)
          .otherwise(0L)).as("n_flagged"))
      .orderBy("source")
  }

  /** Code-vs-prose detection by character-class density: the fraction
    * of code-signal characters ({}();=_*: — braces, terminators,
    * assignment, snake_case) per document, thresholded at 2% — how a
    * corpus pipeline estimates its code fraction without a tokenizer.
    * Code-like text is PLANTED on the ÷3 key subset (co-prime with the
    * 20-way source assignment so every source sees both classes); the
    * integer cross-multiplied threshold (code·1000 ≥ len·20) is exact
    * in both engines.
    *
    * 100 TB shape: two length() evaluations per row in the scan stage,
    * one source-keyed partial-agg'd exchange. */
  val qCodeDetect: Q = (s, d) => {
    val planted = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 3 === 0,
          concat(lit("def f_"), col("doc_id"), lit("(x): { return (x * 2); };  "),
            expr("replace(text, ' ', '_')")))
          .otherwise(col("text")).as("text"))
    planted
      .withColumn("n", length(col("text")).cast("long"))
      .withColumn("code_chars", (length(col("text")) -
        length(regexp_replace(col("text"), "[{}();=_*:]", ""))).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("code_chars") * 1000 >= col("n") * 20, 1L).otherwise(0L))
          .as("n_code"),
        sum("code_chars").as("total_code_chars"))
      .orderBy("source")
  }

  /** Anchor/link extraction — the link-graph source operator: pull
    * every href from planted HTML (`regexp_extract_all` → explode),
    * reduce to target host, and report per-host in-link and
    * linking-document counts (the in-degree table PageRank and spam
    * scoring consume). Two anchors per document, hosts derived
    * co-prime so every host collects links from across the corpus.
    *
    * 100 TB shape: extraction is a Generate (explode) over a codegen'd
    * regex — rows fan out by links-per-doc, bounded by content size;
    * one host-keyed partial-agg'd exchange with the distinct-doc count
    * as a standard two-phase partial distinct. */
  val qAnchorLinks: Q = (s, d) => {
    val planted = Tables.documents(s, d)
      .select(col("doc_id"), concat(
        lit("<p>"), col("text"),
        lit("</p><a href=\"http://site"), col("doc_id") % 7,
        lit(".example/p/"), col("doc_id"),
        lit("\">first</a> <a href=\"http://site"), (col("doc_id") + 3) % 7,
        lit(".example/q/"), col("doc_id"), lit("\">second</a>")).as("html"))
    planted
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(html, 'href=\"([^\"]+)\"', 1)")).as("url"))
      .withColumn("host", element_at(split(col("url"), "/"), 3))
      .groupBy("host")
      .agg(count(lit(1)).as("n_inlinks"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("host")
  }

  /** Mirror & re-crawl-drift detection: cross-referencing URL identity
    * against CONTENT identity catches the two crawl pathologies URL
    * dedup alone cannot — the same content served from many hosts
    * (mirrors: group by content key, count distinct hosts) and the
    * same URL yielding different content across crawls (drift: group
    * by URL, count distinct content keys). Content is keyed by md5
    * (portable — unlike xxhash64 this census is oracle-checkable);
    * both phenomena are PLANTED deterministically (÷11 docs collapse
    * onto 3 boilerplate variants spread across all 10 hosts; the ÷100
    * path modulus folds multiple crawls onto each URL). Two summary
    * rows: groups affected, docs involved, max fan-out per kind.
    *
    * 100 TB shape: two independent hash-agg shuffles (content key,
    * URL), each carrying 16-byte keys + counts after partial agg; the
    * distinct-host/variant counts are standard two-phase partial
    * distincts. No joins, no pair explosion — fan-out lives in the
    * counts. */
  val qMirrorDetect: Q = (s, d) => {
    val keyed = Tables.documents(s, d).select(
      col("doc_id"),
      concat(lit("http://site"), col("doc_id") % 10, lit(".example/d/"),
        col("doc_id") % 100).as("url"),
      concat(lit("site"), col("doc_id") % 10, lit(".example")).as("host"),
      md5(when(col("doc_id") % 11 === 0,
        concat(lit("Mirrored boilerplate page variant "), col("doc_id") % 3))
        .otherwise(col("text"))).as("content_key"))
    val mirror = keyed.groupBy("content_key")
      .agg(countDistinct(col("host")).as("fanout"), count(lit(1)).as("nd"))
    val drift = keyed.groupBy("url")
      .agg(countDistinct(col("content_key")).as("fanout"), count(lit(1)).as("nd"))
    def summarize(df: DataFrame, kind: String) = df.agg(
      sum(when(col("fanout") > 1, 1L).otherwise(0L)).as("n_groups"),
      coalesce(sum(when(col("fanout") > 1, col("nd"))), lit(0L)).as("n_docs"),
      coalesce(max(col("fanout")), lit(0L)).as("max_fanout"))
      .select(lit(kind).as("kind"), col("n_groups"), col("n_docs"),
        col("max_fanout"))
    summarize(mirror, "mirror")
      .unionByName(summarize(drift, "recrawl_drift"))
      .orderBy("kind")
  }

  val all: Map[String, Q] = Map(
    "q_url_canonical" -> qUrlCanonical,
    "q_dp_release" -> qDpRelease,
    "q_html_extract" -> qHtmlExtract,
    "q_license_filter" -> qLicenseFilter,
    "q_code_detect" -> qCodeDetect,
    "q_anchor_links" -> qAnchorLinks,
    "q_mirror_detect" -> qMirrorDetect,
  )

  val oracles: Map[String, String] = Map(
    "q_url_canonical" ->
      """WITH planted AS (
        | SELECT event_id,
        |  (CASE WHEN event_id % 2 = 0 THEN 'HTTP://Example.COM:80/'
        |        ELSE 'http://example.com/' END)
        |   || event_type || '/page'
        |   || (CASE WHEN event_id % 2 = 0
        |        THEN '?utm_source=x&id=' || (user_id % 50) || '&b=2&a=' || (event_id % 3)
        |        ELSE '?a=' || (event_id % 3) || '&utm_campaign=y&b=2&id=' || (user_id % 50) END)
        |   || (CASE WHEN event_id % 5 = 0 THEN '#frag' ELSE '' END) AS url
        | FROM events),
        |split1 AS (
        | SELECT url, string_split(url, '#')[1] AS nofrag FROM planted),
        |parts AS (
        | SELECT url,
        |  lower(replace(string_split(nofrag, '?')[1], ':80/', '/')) AS base,
        |  coalesce(list_aggregate(list_sort(list_filter(
        |    string_split(coalesce(string_split(nofrag, '?')[2], ''), '&'),
        |    p -> NOT starts_with(p, 'utm_'))), 'string_agg', '&'), '') AS q
        | FROM split1)
        |SELECT base || CASE WHEN q = '' THEN '' ELSE '?' || q END AS canonical_url,
        | count(*) AS n_hits, count(DISTINCT url) AS n_raw_variants
        |FROM parts GROUP BY 1 ORDER BY canonical_url""".stripMargin,
    "q_dp_release" ->
      """WITH counts AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        |noised AS (
        | SELECT event_type, n,
        |  CAST('0x' || substr(md5('dp-seed-1' || event_type), 1, 8) AS BIGINT)
        |    / 4294967296.0 AS u
        | FROM counts)
        |SELECT event_type, 0.5 AS epsilon,
        | round(-2.0 * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)), 6) AS noise,
        | round(n + -2.0 * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)), 4) AS released
        |FROM noised ORDER BY event_type""".stripMargin,
    "q_html_extract" ->
      """WITH planted AS (
        | SELECT doc_id, source,
        |  '<html><head><title>' || source || ' #' || doc_id
        |   || '</title></head><body><p class="main">' || text
        |   || ' &amp; more &lt;tags&gt;</p><script>var x = 1;</script></body></html>'
        |   AS html
        | FROM documents),
        |stripped AS (
        | SELECT source, html,
        |  trim(regexp_replace(
        |    replace(replace(replace(
        |      regexp_replace(
        |        regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
        |        '<[^>]*>', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
        |    '\s+', ' ', 'g')) AS extracted,
        |  regexp_extract(html, '<title>([^<]*)</title>', 1) AS title
        | FROM planted)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(CASE WHEN title <> '' THEN 1 ELSE 0 END) AS BIGINT) AS n_titled,
        | CAST(sum(length(html)) AS BIGINT) AS raw_chars,
        | CAST(sum(length(extracted)) AS BIGINT) AS text_chars
        |FROM stripped GROUP BY source ORDER BY source""".stripMargin,
    "q_license_filter" ->
      """WITH planted AS (
        | SELECT doc_id, source,
        |  (CASE WHEN doc_id % 7 = 0
        |    THEN 'Copyright (c) 2020 Example Corp. All rights reserved. '
        |    ELSE '' END)
        |  || text
        |  || (CASE WHEN doc_id % 11 = 0
        |    THEN ' Licensed under the Apache License, Version 2.0' ELSE '' END)
        |  AS text
        | FROM documents),
        |sig AS (
        | SELECT source,
        |  CASE WHEN contains(lower(text), 'copyright') THEN 1 ELSE 0 END AS has_copy,
        |  CASE WHEN contains(lower(text), 'all rights reserved') THEN 1 ELSE 0 END AS has_rights,
        |  CASE WHEN contains(lower(text), 'licensed under') THEN 1 ELSE 0 END AS has_lic
        | FROM planted)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(has_copy) AS BIGINT) AS n_copyright,
        | CAST(sum(has_rights) AS BIGINT) AS n_rights,
        | CAST(sum(has_lic) AS BIGINT) AS n_licensed,
        | CAST(sum(CASE WHEN has_copy + has_rights + has_lic > 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_flagged
        |FROM sig GROUP BY source ORDER BY source""".stripMargin,
    "q_code_detect" ->
      """WITH planted AS (
        | SELECT doc_id, source,
        |  CASE WHEN doc_id % 3 = 0
        |   THEN 'def f_' || doc_id || '(x): { return (x * 2); };  '
        |     || replace(text, ' ', '_')
        |   ELSE text END AS text
        | FROM documents),
        |m AS (
        | SELECT source, length(text) AS n,
        |  length(text) - length(regexp_replace(text, '[{}();=_*:]', '', 'g'))
        |    AS code_chars
        | FROM planted)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(CASE WHEN code_chars * 1000 >= n * 20 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_code,
        | CAST(sum(code_chars) AS BIGINT) AS total_code_chars
        |FROM m GROUP BY source ORDER BY source""".stripMargin,
    "q_anchor_links" ->
      """WITH planted AS (
        | SELECT doc_id,
        |  '<p>' || text || '</p><a href="http://site' || (doc_id % 7)
        |  || '.example/p/' || doc_id
        |  || '">first</a> <a href="http://site' || ((doc_id + 3) % 7)
        |  || '.example/q/' || doc_id || '">second</a>' AS html
        | FROM documents),
        |links AS (
        | SELECT doc_id,
        |  unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) AS url
        | FROM planted),
        |hosts AS (
        | SELECT doc_id, string_split(url, '/')[3] AS host FROM links)
        |SELECT host, count(*) AS n_inlinks, count(DISTINCT doc_id) AS n_docs
        |FROM hosts GROUP BY host ORDER BY host""".stripMargin,
    "q_mirror_detect" ->
      """WITH keyed AS (
        | SELECT doc_id,
        |  'http://site' || (doc_id % 10) || '.example/d/' || (doc_id % 100) AS url,
        |  'site' || (doc_id % 10) || '.example' AS host,
        |  md5(CASE WHEN doc_id % 11 = 0
        |    THEN 'Mirrored boilerplate page variant ' || (doc_id % 3)
        |    ELSE text END) AS content_key
        | FROM documents),
        |drift AS (
        | SELECT url, count(DISTINCT content_key) AS fanout, count(*) AS nd
        | FROM keyed GROUP BY url),
        |mirror AS (
        | SELECT content_key, count(DISTINCT host) AS fanout, count(*) AS nd
        | FROM keyed GROUP BY content_key)
        |SELECT 'mirror' AS kind,
        | CAST(sum(CASE WHEN fanout > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_groups,
        | CAST(coalesce(sum(CASE WHEN fanout > 1 THEN nd END), 0) AS BIGINT)
        |   AS n_docs,
        | CAST(coalesce(max(fanout), 0) AS BIGINT) AS max_fanout
        |FROM mirror
        |UNION ALL
        |SELECT 'recrawl_drift',
        | CAST(sum(CASE WHEN fanout > 1 THEN 1 ELSE 0 END) AS BIGINT),
        | CAST(coalesce(sum(CASE WHEN fanout > 1 THEN nd END), 0) AS BIGINT),
        | CAST(coalesce(max(fanout), 0) AS BIGINT)
        |FROM drift
        |ORDER BY kind""".stripMargin,
  )
}
