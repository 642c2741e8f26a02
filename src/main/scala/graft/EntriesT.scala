package graft

import graft.engine.SparkGraftEngine
import graft.functions.{Dedup, Multimodal, Similarity, Sketches, TextFunctions}
import graft.transform.Transform
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.EntryHelpers._

/** text-analysis (t*) conformance queries and their DuckDB oracles — split out
 * of SparkEntry by family so the registries stay reviewable (the
 * assembled maps are behavior-identical; entries were moved verbatim).
 * Shared fixtures/loaders live in [[EntryHelpers]]. */
private[graft] object EntriesT {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // budget-bounded selection, FULL oracle: quality-ranked prefix whose
    // running token total fits the budget — a plain SQL window on the
    // DuckDB side, the distributed prefix sum (range sort + per-partition
    // offsets, never a single-partition window) on ours. The synthetic
    // score is a Knuth-hash of doc_id: deterministic, integer-exact in
    // both engines, and uncorrelated with n_chars
    "t34_budget_select" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          ((col("doc_id") * lit(2654435761L)) % 1000).as("score"))
      graft.functions.Sampling.selectByBudget(docs, col("n_chars"), "score",
        Seq("doc_id"), budget = 100000L)
    }),

    // BM25 corpus retrieval, FULL oracle: every 23rd document's first 4
    // tokens as the query set, Okapi BM25 (Lucene +1 idf) top-10 per
    // query — per-token contributions rounded to the declared 9-decimal
    // precision BEFORE the exact decimal sum (the t13 transcendental
    // policy), rank ties broken by doc id on both engines
    "t35_bm25" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 23 === 0)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ",
            slice(split(trim(lower(col("text"))), "\\s+"), 1, 4)).as("qtext"))
      TextFunctions.bm25TopK(docs, "doc_id", "text",
        queries, "query_id", "qtext", topK = 10, scoreDigits = Some(9))
    }),

    // interpolated trigram-LM cross-entropy (Jelinek–Mercer over
    // self-trained trigram/bigram/Laplace-unigram models), FULL oracle:
    // per-position log-probs at the declared 9-decimal precision, decimal
    // bridged sums; lambda1 = 1 − λ3 − λ2 computed in DOUBLE arithmetic
    // on both engines (a decimal-literal 0.1 would diverge in the ulps)
    "t36_trigram_ce" -> ((s, dir) =>
      TextFunctions.trigramCrossEntropy(
        t(s, dir, "documents"), "doc_id", "text")),

    // Gopher quality-rule bundle over a corpus deterministically salted
    // with rule triggers (short docs, #-runs, bullet lines, ellipses),
    // FULL oracle: every metric and every rule verdict recomputed by
    // DuckDB from identical scalar/list arithmetic
    "t38_gopher_rules" -> ((s, dir) => {
      val tcol = coalesce(col("text"), lit(""))
      val injected = t(s, dir, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 5 === 0, substring(tcol, 1, 60)).otherwise(tcol),
          when(col("doc_id") % 4 === 1, lit(" ### ## #")).otherwise(lit("")),
          when(col("doc_id") % 4 === 2,
            lit("\n- item one\n- item two\n• third")).otherwise(lit("")),
          when(col("doc_id") % 4 === 3, lit(" wait... more..."))
            .otherwise(lit(""))).as("text"))
      TextFunctions.gopherRules(injected, "doc_id", "text", minWords = 20)
    }),

    // C4-style line retention + document verdict over a deterministically
    // multi-lined corpus (unterminated lines, a javascript line, brace /
    // lorem-ipsum pages), FULL oracle: cleaned text byte-identical,
    // verdicts replayed by DuckDB
    "t39_c4_clean" -> ((s, dir) => {
      val tcol = coalesce(col("text"), lit(""))
      val injected = t(s, dir, "documents").select(col("doc_id"),
        concat(tcol, lit("."),
          lit("\nshort line\n"),
          lit("This middle line has some javascript code in it.\n"),
          lit("This is a good second sentence with enough words!"),
          when(col("doc_id") % 7 === 0, lit("\nbad { brace }"))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0, lit("\nLorem Ipsum dolor sit amet."))
            .otherwise(lit(""))).as("text"))
      TextFunctions.c4Clean(injected, "doc_id", "text")
    }),

    // URL canonicalization (the normalization pass BEFORE exact dedup of
    // a crawl's URL column): scheme/host case, default ports, fragments,
    // unreserved percent-escapes, dot segments and query-param sort all
    // erased; the fixture URLs rotate every rule and the oracle replays
    // raw AND canonical closed forms — the dot-segment resolution and
    // escape decode are the engine's, only their results are replayed
    "t40_url_canon" -> ((s, dir) => {
      val raw = t(s, dir, "documents").selectExpr("doc_id",
        """concat(
          | CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'HTTP'
          |   WHEN 1 THEN 'Https' ELSE 'http' END,
          | '://WWW.Example', CAST(doc_id % 50 AS STRING),
          | CASE WHEN doc_id % 2 = 0 THEN '.COM' ELSE '.com' END,
          | CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN ':80'
          |   WHEN 1 THEN ':8080' WHEN 2 THEN ':443' ELSE '' END,
          | '/a/./p', CAST(doc_id % 9 AS STRING), '/../x%41/%7e',
          | '?z=1&a=', CAST(doc_id % 5 AS STRING),
          | CASE WHEN doc_id % 3 = 0 THEN '&m=%2f' ELSE '' END,
          | CASE WHEN doc_id % 2 = 0
          |   THEN concat('#sec', CAST(doc_id % 7 AS STRING))
          |   ELSE '' END) AS url""".stripMargin)
      graft.functions.Urls.canonicalizeUrls(raw, "doc_id", "url")
    }),

    // subtitle cue extraction (SRT + WebVTT auto-detect): the aligned-
    // transcript source of a video corpus — cue timings to integer ms,
    // multi-line text joined, NOTE blocks and cue settings/identifiers
    // erased, CRLF and hour-optional VTT timestamps rotated; id%7==5
    // docs are clean-but-empty (zero cues, not corruption); the oracle
    // replays the cue formulas
    "t41_subtitle_cues" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Subtitles.subtitleCues(
        graft.functions.Subtitles.syntheticSubtitles(ids, "doc_id"),
        "doc_id", "sub_text")
    }),

    // robots.txt parsing (RFC 9309): group structure (consecutive UA
    // lines share a group), allow/disallow patterns, crawl-delay,
    // global sitemaps — flattened to the broadcastable rule rows a
    // compliant crawl filter joins against; field-name casing rotates,
    // comment/junk lines are strewn through the fixture; the matcher
    // (longest-UA-prefix group, longest-pattern rule, tie→allow) is
    // spec-pinned in RobotsSpec against the RFC examples
    "t42_robots_rules" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Robots.robotsRules(
        graft.functions.Robots.syntheticRobotsFiles(ids, "doc_id"),
        "doc_id", "robots_text")
    }),

    // robots ENFORCEMENT join, the 100 TB shape: 20 hosts' robots files
    // parsed once and broadcast, the URL stream a narrow map adding an
    // `allowed` verdict (zero crawl shuffle); the oracle replays the
    // longest-match decision closed-form — group bot<u> applies iff
    // u < n(host), its /private<u>/ disallow matches iff the path's
    // group digit equals u, and the longer ok-file allow overrides
    // exactly when the host's group carries it
    "t42x_robots_filter" -> ((s, dir) => {
      val urls = t(s, dir, "documents").selectExpr("doc_id",
        "concat('host', CAST(doc_id % 20 AS STRING)) AS host",
        ("concat('/private', CAST((doc_id div 4) % 4 AS STRING), " +
          "CASE WHEN doc_id % 6 = 0 " +
          "THEN concat('/ok', CAST(doc_id % 10 AS STRING), '.html') " +
          "ELSE concat('/x', CAST(doc_id % 10 AS STRING), '.html') " +
          "END) AS path"),
        "concat('bot', CAST(doc_id % 4 AS STRING)) AS ua")
      val robots = graft.functions.Robots
        .syntheticRobotsFiles(s.range(20).selectExpr("id AS doc_id"),
          "doc_id")
        .selectExpr("concat('host', CAST(doc_id AS STRING)) AS host",
          "robots_text")
      graft.functions.Robots.filterByRobots(
        urls, "host", "path", "ua", robots, "host", "robots_text")
        .select("doc_id", "host", "ua", "allowed")
    }),

    // JSON SHAPE census — the schema-inference primitive for JSONL /
    // event-props lakes: one (key, type) row per top-level field via
    // Jackson streaming (nested values skipped, never materialized),
    // then an ordinary Catalyst GROUP BY — the operator emits pairs,
    // Spark plans the shuffle; truncated docs (id%11==5) poison to
    // zero rows, and meta's INNER keys must not leak into the census
    "t44_json_shape" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Json.jsonShape(
        graft.functions.Json.syntheticJsons(ids, "doc_id"),
        "doc_id", "json_text")
        .groupBy("key", "vtype")
        .agg(count(lit(1)).cast("long").as("n"))
    }),

    // EML (RFC 5322) header extraction with RFC 2047 encoded-word
    // decoding: folded headers unfold to one SP, B- and Q-encoded words
    // decode (adjacent ones joined without the separating whitespace,
    // §6.2), the body after the blank line is never read — the fixture
    // plants a colonless body line that would poison the header walk if
    // it were; the oracle replays the DECODED values, so the base64/QP
    // encodings round-trip under the differential
    "t43_eml_headers" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Eml.emailHeaders(
        graft.functions.Eml.syntheticEmls(ids, "doc_id"),
        "doc_id", "eml_text")
    }),

    // MIME multipart BODY census (RFC 2045/2046) — the walk t43 stops
    // short of by design: LEAF parts only (nested multiparts recursed,
    // depth-bounded), declared charset, transfer encoding, and DECODED
    // byte size computed WITHOUT retaining a payload byte (base64 =
    // 3n/4 minus padding after validation, QP = escape accounting);
    // the fixture rotates quoted/bare boundary params, preamble/
    // epilogue, a nested multipart/alternative, and a malformed-
    // boundary negative (id%13==7: a part opens, the close delimiter
    // never comes → strict None, zero rows); the oracle replays every
    // part formula including the exact decoded sizes
    "t45_mime_parts" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Mime.mimeParts(
        graft.functions.Mime.syntheticMimes(ids, "doc_id"),
        "doc_id", "mime_text")
    }),


    // sitemap census (sitemaps.org 0.9) — the discovery half of the
    // crawl-politeness pair (t42's robots.txt Sitemap: lines point
    // here): urlset AND sitemapindex records with XML-unescaped loc
    // plus lastmod/changefreq/priority; extension subtrees
    // (image:image) and self-closed extension tags are skipped by a
    // balanced depth-bounded scan; id%11==9 documents never close the
    // root (strict None, zero rows); the oracle replays every record
    // formula with the DECODED loc
    "t46_sitemap" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Sitemap.sitemapItems(
        graft.functions.Sitemap.syntheticSitemaps(ids, "doc_id"),
        "doc_id", "sitemap_text")
    }),


    // sitemap.xml.gz census (m34 ∘ t46): the sitemaps.org protocol
    // explicitly allows gzip-compressed sitemaps, and t46's own index
    // fixtures advertise `.xml.gz` locs — this is the walker for them.
    // Gzip members located and re-extracted through the verified
    // locator path (id%5==0 payloads split into TWO members
    // mid-document; RFC 1952 reassembly must be byte-exact), UTF-8
    // decoded, then the strict sitemap grammar walk; id%10==4 carries
    // a flipped gzip ISIZE (locator refuses), id%11==9 stays the
    // unclosed-root malformation THROUGH a clean gzip layer — both to
    // zero rows
    "t48_sitemap_gz" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Sitemap.sitemapGzItems(
        graft.functions.Sitemap.syntheticSitemapGzs(ids, "doc_id"),
        "doc_id", "payload")
    }),

    // robots↔sitemap CROSS-WALK (t49 = t42 ∘ t48 ∘ t46 — the first
    // composition a crawl-curation pipeline runs): every host's
    // robots.txt is walked for its `Sitemap:` directives; the declared
    // URLs are then joined (BROADCAST — the fetched-sitemap dimension
    // is bounded by the URL universe, not the crawl) against the
    // fetched `.xml.gz` payloads walked by the t48 gzip-locator +
    // strict-grammar path, censusing which declared sitemaps RESOLVE
    // and how many URLs each contributes. The ex4 payload carries the
    // corrupt-gzip rotation — its declarations report resolved=0 with
    // null n_urls (a dead seek surface is reported, never guessed).
    // Crawl side stays a narrow map + one broadcast join, zero big
    // shuffles
    "t49_robots_sitemap" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      val declared = graft.functions.Robots.robotsRules(
          graft.functions.Robots.syntheticRobotsFiles(ids, "doc_id"),
          "doc_id", "robots_text")
        .filter(col("kind") === "sitemap")
        .select(col("doc_id"), col("value").as("sitemap_url"))
      val fetched = graft.functions.Sitemap.sitemapGzItems(
          graft.functions.Sitemap.syntheticSitemapGzs(
            s.range(5).selectExpr("id AS doc_id"), "doc_id"),
          "doc_id", "payload")
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_urls"))
        .selectExpr(
          "concat('https://ex', CAST(doc_id AS STRING), '.com/sitemap.xml')" +
            " AS sitemap_url",
          "n_urls")
      declared.join(broadcast(fetched), Seq("sitemap_url"), "left")
        .select(col("doc_id"), col("sitemap_url"),
          when(col("n_urls").isNotNull, 1).otherwise(0).cast("int")
            .as("resolved"),
          col("n_urls"))
    }),

    // CSV dialect sniffing — the ingest audit BEFORE spark.read.csv
    // with guessed options: deterministic delimiter scoring over a
    // 16-record quote-aware sample, RFC 4180 quoting (doubled quotes,
    // delimiters inside quotes), header detection, and whole-document
    // shape consistency; the id%7==2 fixtures hide their ragged record
    // BEYOND the sample (the sniff resolves, consistent flips to 0 —
    // the sample-vs-whole distinction the census exists for);
    // unterminated quotes (id%13==11) refuse to zero rows. r15: the
    // sniff is now BYTE-level — the fixture rotates plain-UTF-8 /
    // UTF-8-BOM / UTF-16LE / UTF-16BE encodings by id%4 and the
    // census reports the detected charset plus the record-separator
    // convention (CRLF on even ids, LF on odd) — the two remaining
    // loader knobs
    "t47_csv_sniff" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select("doc_id")
      graft.functions.Csv.csvSniffBytes(
        graft.functions.Csv.syntheticCsvPayloads(ids, "doc_id"),
        "doc_id", "payload")
    }),

    // host-level link-graph extraction (the WARC→HTML→graph bridge),
    // FULL oracle: per-doc source hosts + injected outbound URLs → edge
    // list with link counts; mixed-case hosts on both sides pin the
    // lowercasing; DuckDB replays the identical UrlRegex host group
    "t37_link_graph" -> ((s, dir) => {
      val injected = t(s, dir, "documents").select(
        concat(lit("Host"), (col("doc_id") % 11).cast("string"),
          lit(".Example.COM")).as("host"),
        concat(coalesce(col("text"), lit("")),
          lit(" see https://site"), (col("doc_id") % 7).cast("string"),
          lit(".example.org/p/"), col("doc_id").cast("string"),
          lit(" and http://CDN.example.net/x"),
          when(col("doc_id") % 3 === 0,
            lit(" plus https://host1.example.com/self"))
            .otherwise(lit(""))).as("text"))
      TextFunctions.linkGraph(injected, "host", "text")
    }),

    // ---- beyond-reference: text analysis ------------------------------
    "t01_text_analyze" -> ((s, dir) =>
      TextFunctions.analyze(t(s, dir, "documents"), "doc_id", "text")),

    "t02_tokens_quality" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(Seq(col("doc_id")) ++
        TextFunctions.qualityMetrics(col("text")).map { case (n, c) => c.as(n) }: _*)
    }),

    "t03_langid" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"), col("lang"),
        TextFunctions.langId(col("text")).as("lang_pred"))),

    // token-budget packing: deterministic shard assignment, exact oracle
    "t04_pack" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tokens"))
      TextFunctions.packByTokenBudget(d, "n_tokens", budget = 2000, orderCol = "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("shard_id"))
    }),

    // rebalance differential: uniform targets over a skewed lang mix —
    // the scarcest lang must be kept in full and the mix must flatten
    "t06_rebalance" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val langs = Seq("de", "en", "es", "fr", "zh")
      val r = graft.functions.Sampling.rebalance(docs, "lang",
        langs.map(_ -> 1.0).toMap, seed = 7L)
      val outStats = r.groupBy("lang").agg(count(lit(1)).as("n"))
        .agg(min(col("n")).as("mn"), max(col("n")).as("mx"))
      val inMin = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .agg(min(col("n")).as("imn"))
      // per-lang counts concentrate around imn (the feasible uniform
      // share); Bernoulli variance bounds rather than equality
      outStats.crossJoin(inMin)
        .select((col("mn") >= col("imn") * 0.8 &&
          col("mx") <= col("imn") * 1.35).cast("bigint").as("rebalance_ok"))
    }),

    // quality filter: bounds over the oracle-able metrics
    "t05_quality_filter" -> ((s, dir) =>
      TextFunctions.qualityFilter(t(s, dir, "documents"), "text",
        minTokens = 30, maxStopwordRatio = 0.4)
        .select("doc_id", "lang")),

    // PII redaction: inject deterministic synthetic PII (the corpus has
    // none), scrub it, and match the oracle's byte-identical RE2 rewrites
    "t07_pii_redact" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.redactPii(piiInjected).as("redacted"))))

  val oracles: Map[String, String] = Map(

    "t02_tokens_quality" ->
      """SELECT doc_id,
        | CAST(length(text) AS INTEGER) AS n_chars,
        | CAST(CASE WHEN length(regexp_replace(text, '\s', '', 'g')) = 0 THEN 0
        |   ELSE len(string_split_regex(trim(text), '\s+')) END AS INTEGER) AS n_tokens,
        | CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS INTEGER) AS n_punct,
        | CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS INTEGER) AS n_digits,
        | CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |   t -> t IN ('the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it'))) AS INTEGER) AS n_stopwords,
        | CASE WHEN length(regexp_replace(text, '\s', '', 'g')) > 0
        |   THEN CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |     t -> t IN ('the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it'))) AS DOUBLE)
        |     / len(string_split_regex(trim(text), '\s+'))
        |   ELSE 0.0 END AS stopword_ratio,
        | CASE WHEN length(regexp_replace(text, '\s', '', 'g')) > 0
        |   THEN CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        |     / len(string_split_regex(trim(text), '\s+'))
        |   ELSE 0.0 END AS mean_word_len
        |FROM documents""".stripMargin,

    "t04_pack" ->
      s"""WITH d AS (
        | SELECT doc_id, CAST($SqlNTokens AS INTEGER) AS n_tokens
        | FROM documents)
        |SELECT doc_id, n_tokens,
        | CAST(floor(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0) AS BIGINT) AS shard_id
        |FROM d""".stripMargin,

    "t05_quality_filter" ->
      s"""SELECT doc_id, lang FROM documents
        |WHERE ($SqlNTokens) >= 30
        | AND ($SqlStopwordRatio) <= 0.4""".stripMargin,

    "t06_rebalance" -> "SELECT CAST(1 AS BIGINT) AS rebalance_ok",

    "t34_budget_select" ->
      """WITH s AS (
        | SELECT doc_id, n_chars,
        |  CAST((doc_id * 2654435761) % 1000 AS BIGINT) AS score
        | FROM documents),
        |c AS (
        | SELECT doc_id, n_chars, score,
        |  CAST(sum(n_chars) OVER (ORDER BY score DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_size
        | FROM s)
        |SELECT doc_id, n_chars, score, cum_size
        |FROM c WHERE cum_size <= 100000""".stripMargin,

    "t38_gopher_rules" ->
      """WITH injected AS (
        | SELECT doc_id,
        |  concat(
        |   CASE WHEN doc_id % 5 = 0 THEN substr(coalesce(text, ''), 1, 60)
        |        ELSE coalesce(text, '') END,
        |   CASE WHEN doc_id % 4 = 1 THEN ' ### ## #' ELSE '' END,
        |   CASE WHEN doc_id % 4 = 2
        |        THEN chr(10) || '- item one' || chr(10) || '- item two'
        |          || chr(10) || '• third' ELSE '' END,
        |   CASE WHEN doc_id % 4 = 3 THEN ' wait... more...' ELSE '' END) AS text
        | FROM documents),
        |m AS (
        | SELECT doc_id, text,
        |  list_filter(string_split_regex(trim(text), '\s+'),
        |    w -> length(w) > 0) AS words,
        |  list_filter(list_transform(string_split(text, chr(10)),
        |    l -> trim(l)), l -> length(l) > 0) AS lines
        | FROM injected),
        |m2 AS (
        | SELECT doc_id, text, words, lines, len(words) AS nw, len(lines) AS nl,
        |  CASE WHEN len(words) > 0 THEN
        |   CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
        |     / len(words) ELSE 0.0 END AS mean_word_len,
        |  CASE WHEN len(words) > 0 THEN
        |   CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
        |     / len(words) ELSE 0.0 END AS symbol_ratio,
        |  CASE WHEN len(words) > 0 THEN
        |   CAST((length(text) - length(regexp_replace(text, '\.\.\.', '', 'g')))
        |     / 3 AS DOUBLE) / len(words) ELSE 0.0 END AS ellipsis_ratio,
        |  CASE WHEN len(lines) > 0 THEN
        |   CAST(len(list_filter(lines, l -> starts_with(l, '•')
        |     OR starts_with(l, '- ') OR starts_with(l, '* '))) AS DOUBLE)
        |     / len(lines) ELSE 0.0 END AS bullet_line_frac,
        |  CASE WHEN len(lines) > 0 THEN
        |   CAST(len(list_filter(lines, l -> ends_with(l, '...'))) AS DOUBLE)
        |     / len(lines) ELSE 0.0 END AS ellipsis_line_frac,
        |  CASE WHEN len(words) > 0 THEN
        |   CAST(len(list_filter(words, w -> regexp_matches(w, '\p{L}')))
        |     AS DOUBLE) / len(words) ELSE 0.0 END AS alpha_word_frac,
        |  len(list_intersect(list_transform(words, w -> lower(w)),
        |   ['the','be','to','of','and','that','have','with'])) AS n_stop_hits
        | FROM m)
        |SELECT doc_id, CAST(nw AS BIGINT) AS n_words, mean_word_len,
        | symbol_ratio, ellipsis_ratio, bullet_line_frac, ellipsis_line_frac,
        | alpha_word_frac, CAST(n_stop_hits AS BIGINT) AS n_stop_hits,
        | (nw >= 20 AND nw <= 100000) AS rule_words,
        | (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS rule_word_len,
        | (symbol_ratio <= 0.1) AS rule_symbols,
        | (ellipsis_ratio <= 0.1) AS rule_ellipsis,
        | (bullet_line_frac <= 0.9) AS rule_bullets,
        | (ellipsis_line_frac <= 0.3) AS rule_line_ellipsis,
        | (alpha_word_frac >= 0.8) AS rule_alpha,
        | (n_stop_hits >= 2) AS rule_stopwords,
        | ((nw >= 20 AND nw <= 100000)
        |  AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
        |  AND symbol_ratio <= 0.1 AND ellipsis_ratio <= 0.1
        |  AND bullet_line_frac <= 0.9 AND ellipsis_line_frac <= 0.3
        |  AND alpha_word_frac >= 0.8 AND n_stop_hits >= 2) AS passes
        |FROM m2""".stripMargin,

    "t39_c4_clean" ->
      """WITH injected AS (
        | SELECT doc_id,
        |  concat(coalesce(text, ''), '.',
        |   chr(10) || 'short line' || chr(10),
        |   'This middle line has some javascript code in it.' || chr(10),
        |   'This is a good second sentence with enough words!',
        |   CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'bad { brace }'
        |        ELSE '' END,
        |   CASE WHEN doc_id % 11 = 0
        |        THEN chr(10) || 'Lorem Ipsum dolor sit amet.'
        |        ELSE '' END) AS text
        | FROM documents),
        |m AS (
        | SELECT doc_id, text,
        |  list_filter(list_transform(string_split(text, chr(10)),
        |    l -> trim(l)), l -> length(l) > 0) AS nonblank
        | FROM injected),
        |m2 AS (
        | SELECT doc_id, text, nonblank,
        |  list_filter(nonblank, l ->
        |   substr(l, -1, 1) IN ('.', '!', '?', '"')
        |   AND len(list_filter(string_split_regex(l, '\s+'),
        |     w -> length(w) > 0)) >= 3
        |   AND NOT contains(lower(l), 'javascript')) AS kept_lines
        | FROM m),
        |m3 AS (
        | SELECT doc_id, text, nonblank, kept_lines,
        |  array_to_string(kept_lines, chr(10)) AS cleaned
        | FROM m2)
        |SELECT doc_id, cleaned AS text,
        | CAST(len(kept_lines) AS BIGINT) AS n_lines_kept,
        | CAST(len(nonblank) - len(kept_lines) AS BIGINT) AS n_lines_dropped,
        | (NOT contains(text, '{') AND NOT contains(text, '}')
        |  AND NOT contains(lower(text), 'lorem ipsum')
        |  AND length(cleaned) - length(regexp_replace(cleaned, '[.!?]', '', 'g'))
        |    >= 3) AS kept
        |FROM m3""".stripMargin,

    // replay of t40's raw-URL closed form AND its canonical form — the
    // normalization algorithm (escape decode, dot-segment resolution,
    // param sort) runs only on the engine side; the oracle states the
    // expected result directly from the same doc_id formulas
    "t40_url_canon" ->
      """SELECT doc_id,
        | (CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'HTTP'
        |    WHEN 1 THEN 'Https' ELSE 'http' END)
        | || '://WWW.Example' || CAST(doc_id % 50 AS VARCHAR)
        | || (CASE WHEN doc_id % 2 = 0 THEN '.COM' ELSE '.com' END)
        | || (CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN ':80'
        |    WHEN 1 THEN ':8080' WHEN 2 THEN ':443' ELSE '' END)
        | || '/a/./p' || CAST(doc_id % 9 AS VARCHAR) || '/../x%41/%7e'
        | || '?z=1&a=' || CAST(doc_id % 5 AS VARCHAR)
        | || (CASE WHEN doc_id % 3 = 0 THEN '&m=%2f' ELSE '' END)
        | || (CASE WHEN doc_id % 2 = 0
        |    THEN '#sec' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END) AS url,
        | (CASE WHEN doc_id % 3 = 1 THEN 'https' ELSE 'http' END)
        | || '://www.example' || CAST(doc_id % 50 AS VARCHAR) || '.com'
        | || (CASE CAST(doc_id % 4 AS INTEGER)
        |      WHEN 0 THEN CASE WHEN doc_id % 3 = 1 THEN ':80' ELSE '' END
        |      WHEN 1 THEN ':8080'
        |      WHEN 2 THEN CASE WHEN doc_id % 3 = 1 THEN '' ELSE ':443' END
        |      ELSE '' END)
        | || '/a/xA/~'
        | || '?a=' || CAST(doc_id % 5 AS VARCHAR)
        | || (CASE WHEN doc_id % 3 = 0 THEN '&m=%2F' ELSE '' END)
        | || '&z=1' AS canon_url
        |FROM documents""".stripMargin,

    // replay of Subtitles.syntheticSubtitle's cue formulas; the
    // format/framing rotation (VTT vs SRT, CRLF, hour-optional stamps,
    // NOTE blocks, identifiers, settings) is the engine's to erase
    "t41_subtitle_cues" ->
      """WITH d AS (SELECT doc_id, CAST(2 + doc_id % 3 AS INTEGER) AS n
        |  FROM documents WHERE doc_id % 7 <> 5),
        |c AS (SELECT doc_id, CAST(unnest(range(0, n)) AS INTEGER) AS j
        |  FROM d)
        |SELECT doc_id, j AS cue_no,
        | CAST(j * 5000 + doc_id % 1000 AS BIGINT) AS start_ms,
        | CAST(j * 5000 + doc_id % 1000 + 2000 + (doc_id + j) % 500
        |   AS BIGINT) AS end_ms,
        | 'line_' || CAST(doc_id AS VARCHAR) || '_' || CAST(j AS VARCHAR)
        |  || CASE WHEN (doc_id + j) % 2 = 0
        |     THEN chr(10) || 'cont_' || CAST(j AS VARCHAR) ELSE '' END
        |  AS text
        |FROM c""".stripMargin,

    // replay of Robots.syntheticRobots' group/rule formulas: per group
    // agents first (bot<g>, then crawler<g> on even id+g), then rules in
    // file order, then crawl_delay (rendered <n>.0 — the value is
    // parsed, not echoed); the wildcard group (id%5==3) is group n;
    // sitemaps are global under group_no -1
    "t42_robots_rules" ->
      """WITH d AS (SELECT doc_id, CAST(1 + doc_id % 3 AS INTEGER) AS n
        |  FROM documents),
        |g AS (SELECT doc_id, n, CAST(unnest(range(0, n)) AS INTEGER) AS gg
        |  FROM d),
        |f AS (SELECT doc_id, gg,
        |   ((doc_id + gg) % 2 = 0) AS two_ua,
        |   ((doc_id + gg) % 3 = 0) AS has_allow,
        |   ((doc_id + gg) % 4 = 1) AS has_tmp,
        |   ((doc_id + gg) % 4 = 2) AS has_delay
        |  FROM g),
        |items AS (
        |  SELECT doc_id, gg AS group_no, 0 AS item_no, 'ua' AS kind,
        |    'bot' || CAST(gg AS VARCHAR) AS value FROM f
        |  UNION ALL
        |  SELECT doc_id, gg, 1, 'ua', 'crawler' || CAST(gg AS VARCHAR)
        |  FROM f WHERE two_ua
        |  UNION ALL
        |  SELECT doc_id, gg,
        |    CASE WHEN two_ua THEN 2 ELSE 1 END, 'disallow',
        |    '/private' || CAST(gg AS VARCHAR) || '/' FROM f
        |  UNION ALL
        |  SELECT doc_id, gg,
        |    CASE WHEN two_ua THEN 3 ELSE 2 END, 'allow',
        |    '/private' || CAST(gg AS VARCHAR) || '/ok'
        |      || CAST(doc_id % 10 AS VARCHAR) || '.html'
        |  FROM f WHERE has_allow
        |  UNION ALL
        |  SELECT doc_id, gg,
        |    CASE WHEN two_ua THEN 2 ELSE 1 END
        |      + CASE WHEN has_allow THEN 1 ELSE 0 END + 1, 'disallow',
        |    '/tmp' || CAST(gg AS VARCHAR) || '/*.log$'
        |  FROM f WHERE has_tmp
        |  UNION ALL
        |  SELECT doc_id, gg,
        |    CASE WHEN two_ua THEN 2 ELSE 1 END
        |      + CASE WHEN has_allow THEN 1 ELSE 0 END
        |      + CASE WHEN has_tmp THEN 1 ELSE 0 END + 1, 'crawl_delay',
        |    CAST(1 + doc_id % 9 AS VARCHAR) || '.0'
        |  FROM f WHERE has_delay
        |  UNION ALL
        |  SELECT doc_id, n, 0, 'ua', '*' FROM d WHERE doc_id % 5 = 3
        |  UNION ALL
        |  SELECT doc_id, n, 1, 'disallow',
        |    '/all' || CAST(doc_id % 4 AS VARCHAR) || '/'
        |  FROM d WHERE doc_id % 5 = 3
        |  UNION ALL
        |  SELECT doc_id, -1, 0, 'sitemap',
        |    'https://ex' || CAST(doc_id % 5 AS VARCHAR)
        |      || '.com/sitemap.xml'
        |  FROM d WHERE doc_id % 2 = 0)
        |SELECT doc_id, CAST(group_no AS INTEGER) AS group_no,
        |  CAST(item_no AS INTEGER) AS item_no, kind, value
        |FROM items""".stripMargin,

    // closed-form replay of the RFC 9309 decision against
    // Robots.syntheticRobots(h): ua group u applies iff u < n(h) =
    // 1 + h%3; its /private<u>/ disallow matches iff the path's group
    // digit (doc_id div 4 % 4) equals u; the longer allow overrides iff
    // the path IS the ok-file and the group carries the allow rule
    // ((h+u)%3=0); u >= n falls to the wildcard group (whose /all rule
    // never matches these paths) or to no group — allowed either way
    "t42x_robots_filter" ->
      """WITH u AS (SELECT doc_id,
        |  doc_id % 20 AS h, doc_id % 4 AS ua_g,
        |  (doc_id // 4) % 4 AS gp,
        |  (doc_id % 6 = 0) AS okfile FROM documents)
        |SELECT doc_id, 'host' || CAST(h AS VARCHAR) AS host,
        | 'bot' || CAST(ua_g AS VARCHAR) AS ua,
        | CAST(CASE
        |   WHEN ua_g >= 1 + h % 3 THEN 1
        |   WHEN gp <> ua_g THEN 1
        |   WHEN okfile AND (h + ua_g) % 3 = 0 THEN 1
        |   ELSE 0 END AS INTEGER) AS allowed
        |FROM u""".stripMargin,

    // replay of Json.syntheticJson's key/type rotations: per-key doc
    // counts over the non-truncated ids
    "t44_json_shape" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 11 <> 5),
        |rows_ AS (
        | SELECT 'id' AS key, 'int' AS vtype, count(*) AS n FROM d
        | UNION ALL SELECT 'name', 'string', count(*) FROM d
        | UNION ALL SELECT 'score', 'float', count(*) FROM d
        |   WHERE doc_id % 3 <> 1
        | UNION ALL SELECT 'tags', 'array', count(*) FROM d
        |   WHERE doc_id % 4 = 0
        | UNION ALL SELECT 'meta', 'object', count(*) FROM d
        |   WHERE doc_id % 5 = 2
        | UNION ALL SELECT 'flag', 'bool', count(*) FROM d
        | UNION ALL SELECT 'opt', 'null', count(*) FROM d
        |   WHERE doc_id % 7 = 3)
        |SELECT key, vtype, CAST(n AS BIGINT) AS n FROM rows_
        |WHERE n > 0""".stripMargin,

    // replay of Eml.syntheticEml's header formulas AFTER decoding: the
    // B-encoded (id%3=0) and split-Q-encoded (id%3=2) subjects both
    // decode to the same sübject_<n> string; X-Folded unfolds to one SP
    "t43_eml_headers" ->
      """WITH d AS (SELECT doc_id, (doc_id % 4 = 2) AS folded
        |  FROM documents),
        |hs AS (
        |  SELECT doc_id, 0 AS header_no, 'From' AS name,
        |    'sender' || CAST(doc_id % 50 AS VARCHAR) || '@ex'
        |      || CAST(doc_id % 7 AS VARCHAR) || '.example' AS value
        |  FROM d
        |  UNION ALL
        |  SELECT doc_id, 1, 'To',
        |    'rcpt' || CAST(doc_id % 30 AS VARCHAR) || '@ex'
        |      || CAST(doc_id % 5 AS VARCHAR) || '.example'
        |  FROM d
        |  UNION ALL
        |  SELECT doc_id, 2, 'Subject',
        |    CASE WHEN doc_id % 3 = 1 THEN 'subject_' ELSE 'sübject_' END
        |      || CAST(doc_id % 100 AS VARCHAR)
        |  FROM d
        |  UNION ALL
        |  SELECT doc_id, 3, 'X-Folded',
        |    'alpha beta_' || CAST(doc_id % 10 AS VARCHAR)
        |  FROM d WHERE folded
        |  UNION ALL
        |  SELECT doc_id, CASE WHEN folded THEN 4 ELSE 3 END, 'Message-ID',
        |    '<m' || CAST(doc_id AS VARCHAR) || '@ex.example>'
        |  FROM d
        |  UNION ALL
        |  SELECT doc_id, CASE WHEN folded THEN 5 ELSE 4 END, 'Date',
        |    'Mon, ' || CAST(1 + doc_id % 28 AS VARCHAR)
        |      || ' Jan 2024 0' || CAST(doc_id % 10 AS VARCHAR)
        |      || ':00:00 +0000'
        |  FROM d)
        |SELECT doc_id, CAST(header_no AS INTEGER) AS header_no, name,
        |  lower(name) AS name_lc, value
        |FROM hs""".stripMargin,

    // replay of Csv.syntheticCsv's dialect formulas plus the r15
    // byte-level deltas: charset from the id%4 encoding rotation and
    // the record-separator convention from the id parity; the
    // unterminated-quote ids (%13==11) contribute zero rows
    "t47_csv_sniff" ->
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'crlf' ELSE 'lf' END AS newline,
        |  CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 'ascii'
        |    WHEN 1 THEN 'utf-8-bom' WHEN 2 THEN 'utf-16le'
        |    ELSE 'utf-16be' END AS charset
        | FROM documents WHERE doc_id % 13 <> 11),
        |single AS (
        | SELECT doc_id, 'none' AS delimiter, 0 AS quoted, 0 AS has_header,
        |  1 AS n_cols, CAST(2 + doc_id % 3 AS BIGINT) AS n_records,
        |  1 AS consistent, newline, charset
        | FROM d WHERE doc_id % 11 = 10),
        |std AS (
        | SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN ',' WHEN 1 THEN ';'
        |    WHEN 2 THEN 'tab' ELSE '|' END AS delimiter,
        |  CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS quoted,
        |  CASE WHEN doc_id % 5 <> 1 THEN 1 ELSE 0 END AS has_header,
        |  2 + doc_id % 4 AS n_cols,
        |  CAST(CASE WHEN doc_id % 7 = 2 THEN 19 ELSE 3 + doc_id % 6 END
        |    + CASE WHEN doc_id % 5 <> 1 THEN 1 ELSE 0 END AS BIGINT)
        |    AS n_records,
        |  CASE WHEN doc_id % 7 = 2 THEN 0 ELSE 1 END AS consistent,
        |  newline, charset
        | FROM d WHERE doc_id % 11 <> 10)
        |SELECT doc_id, delimiter, CAST(quoted AS INTEGER) AS quoted,
        | CAST(has_header AS INTEGER) AS has_header,
        | CAST(n_cols AS INTEGER) AS n_cols, n_records,
        | CAST(consistent AS INTEGER) AS consistent, newline, charset
        |FROM (SELECT * FROM single UNION ALL SELECT * FROM std)""".stripMargin,

    // replay of Sitemap.syntheticSitemap's record formulas; the loc
    // with the XML-escaped query (&amp;) is replayed DECODED — the
    // unescape is pinned by the differential; %11==9 ids (unclosed
    // root) contribute zero rows
    "t46_sitemap" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 11 <> 9),
        |idx AS (
        | SELECT doc_id, CAST(unnest(range(0, 2 + doc_id % 3)) AS INTEGER) AS j
        | FROM d WHERE doc_id % 6 = 5),
        |urls AS (
        | SELECT doc_id, CAST(unnest(range(0, 1 + doc_id % 5)) AS INTEGER) AS j
        | FROM d WHERE doc_id % 6 <> 5),
        |rows_ AS (
        | SELECT doc_id, j, 'sitemap' AS kind,
        |  'https://h' || CAST(doc_id % 20 AS VARCHAR) || '.example/s'
        |    || CAST(j AS VARCHAR) || '.xml.gz' AS loc,
        |  CASE WHEN j % 2 = 0 THEN '2024-0' || CAST(1 + doc_id % 9 AS VARCHAR)
        |    || '-1' || CAST(j % 10 AS VARCHAR) END AS lastmod,
        |  CAST(NULL AS VARCHAR) AS changefreq,
        |  CAST(NULL AS VARCHAR) AS priority
        | FROM idx
        | UNION ALL
        | SELECT doc_id, j, 'url',
        |  'https://site' || CAST(doc_id % 30 AS VARCHAR) || '.example/p/'
        |    || CAST(doc_id AS VARCHAR) || '/' || CAST(j AS VARCHAR)
        |    || CASE WHEN doc_id % 4 = 2
        |         THEN '?a=1&b=' || CAST(j AS VARCHAR) ELSE '' END,
        |  CASE WHEN doc_id % 3 <> 1 THEN '2024-0'
        |    || CAST(1 + j % 9 AS VARCHAR) || '-0'
        |    || CAST(1 + doc_id % 9 AS VARCHAR) END,
        |  CASE WHEN j % 2 = 0 THEN
        |    ['daily', 'weekly', 'monthly'][CAST(1 + (doc_id + j) % 3 AS INTEGER)]
        |  END,
        |  CASE WHEN j % 3 = 0 THEN '0.' || CAST((doc_id + j) % 10 AS VARCHAR) END
        | FROM urls)
        |SELECT doc_id, j AS item_no, kind, loc, lastmod, changefreq, priority
        |FROM rows_""".stripMargin,

    // the t46 replay through the gzip layer: the XML is identical
    // after RFC 1952 reassembly, so the only oracle delta is the
    // corrupted-gzip exclusion (%10==4) joining the unclosed-root
    // exclusion (%11==9)
    "t48_sitemap_gz" ->
      """WITH d AS (SELECT doc_id FROM documents
        |  WHERE doc_id % 11 <> 9 AND doc_id % 10 <> 4),
        |idx AS (
        | SELECT doc_id, CAST(unnest(range(0, 2 + doc_id % 3)) AS INTEGER) AS j
        | FROM d WHERE doc_id % 6 = 5),
        |urls AS (
        | SELECT doc_id, CAST(unnest(range(0, 1 + doc_id % 5)) AS INTEGER) AS j
        | FROM d WHERE doc_id % 6 <> 5),
        |rows_ AS (
        | SELECT doc_id, j, 'sitemap' AS kind,
        |  'https://h' || CAST(doc_id % 20 AS VARCHAR) || '.example/s'
        |    || CAST(j AS VARCHAR) || '.xml.gz' AS loc,
        |  CASE WHEN j % 2 = 0 THEN '2024-0' || CAST(1 + doc_id % 9 AS VARCHAR)
        |    || '-1' || CAST(j % 10 AS VARCHAR) END AS lastmod,
        |  CAST(NULL AS VARCHAR) AS changefreq,
        |  CAST(NULL AS VARCHAR) AS priority
        | FROM idx
        | UNION ALL
        | SELECT doc_id, j, 'url',
        |  'https://site' || CAST(doc_id % 30 AS VARCHAR) || '.example/p/'
        |    || CAST(doc_id AS VARCHAR) || '/' || CAST(j AS VARCHAR)
        |    || CASE WHEN doc_id % 4 = 2
        |         THEN '?a=1&b=' || CAST(j AS VARCHAR) ELSE '' END,
        |  CASE WHEN doc_id % 3 <> 1 THEN '2024-0'
        |    || CAST(1 + j % 9 AS VARCHAR) || '-0'
        |    || CAST(1 + doc_id % 9 AS VARCHAR) END,
        |  CASE WHEN j % 2 = 0 THEN
        |    ['daily', 'weekly', 'monthly'][CAST(1 + (doc_id + j) % 3 AS INTEGER)]
        |  END,
        |  CASE WHEN j % 3 = 0 THEN '0.' || CAST((doc_id + j) % 10 AS VARCHAR) END
        | FROM urls)
        |SELECT doc_id, j AS item_no, kind, loc, lastmod, changefreq, priority
        |FROM rows_""".stripMargin,

    // closed form of the t49 cross-walk: only even ids declare a
    // sitemap (the robots fixture), pointing at ex<id%5>; fetched
    // payload e parses to 1+e urls except e=4 (the corrupt-gzip
    // rotation) which must report resolved=0 with null n_urls
    "t49_robots_sitemap" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 5 AS INTEGER) AS ex
        | FROM documents WHERE doc_id % 2 = 0)
        |SELECT doc_id,
        | 'https://ex' || CAST(ex AS VARCHAR) || '.com/sitemap.xml'
        |   AS sitemap_url,
        | CAST(CASE WHEN ex = 4 THEN 0 ELSE 1 END AS INTEGER) AS resolved,
        | CASE WHEN ex = 4 THEN NULL
        |   ELSE CAST(1 + ex AS BIGINT) END AS n_urls
        |FROM d""".stripMargin,

    // replay of Mime.syntheticMime's leaf-part formulas: decoded sizes
    // derive from the literal part bodies (dk = digits of doc_id%100);
    // the malformed-boundary ids (%13==7) contribute zero rows — the
    // strict posture IS part of the differential
    "t45_mime_parts" ->
      """WITH d AS (
        | SELECT doc_id,
        |  length(CAST(doc_id % 100 AS VARCHAR)) AS dk
        | FROM documents WHERE doc_id % 13 <> 7),
        |leaves AS (
        | SELECT doc_id, 0 AS part_no, 0 AS depth,
        |  'text/plain' AS ctype, 'utf-8' AS charset,
        |  CASE doc_id % 3 WHEN 0 THEN '7bit'
        |    WHEN 1 THEN 'quoted-printable' ELSE 'base64' END AS encoding,
        |  CASE doc_id % 3 WHEN 0 THEN 7 + dk + doc_id % 30
        |    WHEN 1 THEN 8 + dk + doc_id % 5
        |    ELSE 15 + doc_id % 40 END AS decoded_bytes
        | FROM d WHERE doc_id % 7 = 3
        | UNION ALL
        | SELECT doc_id, 0, 1, 'text/plain', 'us-ascii', '7bit',
        |  3 + dk + doc_id % 40
        | FROM d WHERE doc_id % 7 <> 3
        | UNION ALL
        | SELECT doc_id, 1, 1, 'application/octet-stream', NULL,
        |  'base64', 20 + doc_id % 50
        | FROM d WHERE doc_id % 7 <> 3
        | UNION ALL
        | SELECT doc_id, 2, 1, 'text/html', 'iso-8859-1',
        |  'quoted-printable', 3 + dk + doc_id % 7
        | FROM d WHERE doc_id % 7 <> 3 AND doc_id % 4 = 1
        | UNION ALL
        | SELECT doc_id, CASE WHEN doc_id % 4 = 1 THEN 3 ELSE 2 END, 2,
        |  'text/plain', NULL, '7bit', 3 + dk
        | FROM d WHERE doc_id % 7 <> 3 AND doc_id % 5 = 2
        | UNION ALL
        | SELECT doc_id, CASE WHEN doc_id % 4 = 1 THEN 4 ELSE 3 END, 2,
        |  'text/html', 'utf-8', '7bit', 10 + dk
        | FROM d WHERE doc_id % 7 <> 3 AND doc_id % 5 = 2)
        |SELECT doc_id, CAST(part_no AS INTEGER) AS part_no,
        | CAST(depth AS INTEGER) AS depth, ctype, charset, encoding,
        | CAST(decoded_bytes AS BIGINT) AS decoded_bytes
        |FROM leaves""".stripMargin,

    "t37_link_graph" ->
      (s"""WITH injected AS (
        | SELECT lower(concat('Host', CAST(doc_id % 11 AS VARCHAR),
        |   '.Example.COM')) AS src,
        |  concat(coalesce(text, ''), ' see https://site',
        |   CAST(doc_id % 7 AS VARCHAR), '.example.org/p/',
        |   CAST(doc_id AS VARCHAR), ' and http://CDN.example.net/x',
        |   CASE WHEN doc_id % 3 = 0
        |     THEN ' plus https://host1.example.com/self' ELSE '' END) AS text
        | FROM documents),
        |hits AS (
        | SELECT src, lower(unnest(regexp_extract_all(text,
        |  '${graft.functions.TextFunctions.UrlRegex}', 1))) AS dst
        | FROM injected)
        |SELECT src, dst, CAST(count(*) AS BIGINT) AS n_links
        |FROM hits GROUP BY 1, 2""").stripMargin,

    "t35_bm25" ->
      """WITH toks0 AS (
        | SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        | FROM documents),
        |toks AS (SELECT doc_id, tok FROM toks0 WHERE length(tok) > 0),
        |postings AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM postings GROUP BY 1),
        |dfreq AS (SELECT tok, count(*) AS df FROM postings GROUP BY 1),
        |stats AS (SELECT count(*) AS n,
        |  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
        |qt0 AS (
        | SELECT doc_id AS query_id,
        |  unnest(list_slice(string_split_regex(trim(lower(text)), '\s+'), 1, 4)) AS tok
        | FROM documents WHERE doc_id % 23 = 0),
        |qt AS (SELECT query_id, tok, count(*) AS qtf FROM qt0
        | WHERE length(tok) > 0 GROUP BY 1, 2),
        |contrib AS (
        | SELECT q.query_id, p.doc_id,
        |  round(CAST(q.qtf AS DOUBLE)
        |   * ln(1.0 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
        |   * (CAST(p.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
        |   / (CAST(p.tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
        |      * (1.0 - CAST(0.75 AS DOUBLE)
        |         + CAST(0.75 AS DOUBLE) * CAST(d.dl AS DOUBLE) / s.avgdl)), 9) AS c
        | FROM postings p
        | JOIN qt q USING (tok)
        | JOIN dfreq USING (tok)
        | JOIN dl d ON p.doc_id = d.doc_id
        | CROSS JOIN stats s),
        |scored AS (SELECT query_id, doc_id,
        |  CAST(sum(CAST(c AS DECIMAL(25,10))) AS DOUBLE) AS score
        | FROM contrib GROUP BY 1, 2)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, score FROM (
        | SELECT *, row_number() OVER (PARTITION BY query_id
        |   ORDER BY score DESC, doc_id ASC) AS rank
        | FROM scored) x WHERE rank <= 10""".stripMargin,

    "t36_trigram_ce" ->
      """WITH base AS (
        | SELECT doc_id,
        |  list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |    x -> length(x) > 0) AS w
        | FROM documents),
        |tri AS (
        | SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
        |   i -> {'w1': w[i], 'w2': w[i+1], 'w3': w[i+2]})) AS t
        | FROM base WHERE len(w) >= 3),
        |trips AS (SELECT doc_id, t.w1 AS w1, t.w2 AS w2, t.w3 AS w3 FROM tri),
        |pairs AS (
        | SELECT unnest(list_transform(range(1, len(w)),
        |   i -> {'p1': w[i], 'p2': w[i+1]})) AS p
        | FROM base WHERE len(w) >= 2),
        |c12 AS (SELECT p.p1 AS p1, p.p2 AS p2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
        |c12ctx AS (SELECT w1, w2, count(*) AS c12a FROM trips GROUP BY 1, 2),
        |ctx1 AS (SELECT p.p1 AS p1, count(*) AS c2 FROM pairs GROUP BY 1),
        |toks AS (SELECT unnest(w) AS tok FROM base),
        |uni AS (SELECT tok, count(*) AS c1 FROM toks GROUP BY 1),
        |nv AS (SELECT count(*) AS n, count(DISTINCT tok) AS v FROM toks),
        |c123 AS (SELECT w1, w2, w3, count(*) AS c123 FROM trips GROUP BY 1, 2, 3),
        |scored AS (
        | SELECT trips.doc_id,
        |  round(ln(
        |    CAST(0.7 AS DOUBLE)
        |      * (CAST(c123.c123 AS DOUBLE) / CAST(b12.c12a AS DOUBLE))
        |    + CAST(0.2 AS DOUBLE)
        |      * (CAST(coalesce(b23.c12, 0) AS DOUBLE) / CAST(x2.c2 AS DOUBLE))
        |    + (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE) - CAST(0.2 AS DOUBLE))
        |      * (CAST(u3.c1 + 1 AS DOUBLE) / CAST(nv.n + nv.v AS DOUBLE))), 9) AS lp
        | FROM trips
        | JOIN c123 ON trips.w1 = c123.w1 AND trips.w2 = c123.w2 AND trips.w3 = c123.w3
        | JOIN c12ctx b12 ON trips.w1 = b12.w1 AND trips.w2 = b12.w2
        | LEFT JOIN c12 b23 ON trips.w2 = b23.p1 AND trips.w3 = b23.p2
        | JOIN ctx1 x2 ON trips.w2 = x2.p1
        | JOIN uni u3 ON trips.w3 = u3.tok
        | CROSS JOIN nv)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
        | -CAST(sum(CAST(lp AS DECIMAL(20,10))) AS DOUBLE) / count(*) AS trigram_ce
        |FROM scored GROUP BY doc_id""".stripMargin,

    // the oracle applies the SAME patterns (generated from PiiPatterns —
    // RE2-safe by construction) to the same injected text
    "t07_pii_redact" ->
      s"SELECT doc_id, ${sqlRedacted(SqlInjectedPii)} AS redacted FROM documents",

    // full text-analysis oracle: langid (stopword-type argmax, ties to
    // en<es<de<fr, CJK-density zh gate), the EXACT base-31 rolling
    // fingerprint (HUGEINT modular arithmetic reproduces the JVM's 64-bit
    // wraparound), and the quality-metric bundle — all per-row scalar
    // arithmetic, no FP-order hazards. Stopword lists mirror
    // TextFunctions.StopwordsEn / LangStopwords.
    // norm mirrors Fingerprint64.hash's Character.isWhitespace set, not
    // RE2 \s: collapse EVERY Java-whitespace run (incl. U+2000-series and
    // the \x1C-\x1F separators; NBSP is NOT Java whitespace) to one
    // space, then strip the single leading/trailing space the collapse
    // leaves — plain trim() would miss a trailing '\n'. Known residual
    // divergence: astral chars (JVM hashes UTF-16 units) and
    // locale-special lowercasing — absent from this corpus.
    "t01_text_analyze" ->
      s"""WITH base AS (
        | SELECT doc_id, text,
        |  lower(trim(regexp_replace(text,
        |    '[\\t-\\r\\x{1c}-\\x{1f} \\x{1680}\\x{2000}-\\x{2006}\\x{2008}-\\x{200a}\\x{2028}\\x{2029}\\x{205f}\\x{3000}]+',
        |    ' ', 'g'), ' ')) AS norm,
        |  string_split_regex(trim(lower(text)), '\\s+') AS ltoks,
        |  CASE WHEN length(regexp_replace(text, '\\s', '', 'g')) = 0
        |   THEN CAST(0 AS INTEGER)
        |   ELSE CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER)
        |  END AS n_tok
        | FROM documents),
        |scored AS (
        | SELECT *, $SqlLangScores FROM base),
        |fp AS (
        | SELECT doc_id,
        |  CASE WHEN text IS NULL THEN CAST(0 AS BIGINT) ELSE (
        |   SELECT CASE WHEN m >= CAST('9223372036854775808' AS HUGEINT)
        |    THEN CAST(m - CAST('18446744073709551616' AS HUGEINT) AS BIGINT)
        |    ELSE CAST(m AS BIGINT) END
        |   FROM (SELECT list_reduce(
        |     list_prepend(CAST(1125899906842597 AS HUGEINT),
        |       list_transform(range(1, length(norm)+1),
        |         i -> CAST(unicode(norm[i]) AS HUGEINT))),
        |     (a, b) -> (a * 31 + b) % CAST('18446744073709551616' AS HUGEINT)) AS m)
        |  ) END AS fingerprint
        | FROM base)
        |SELECT s.doc_id, $SqlLangCase AS lang_pred, f.fingerprint,
        | CAST(length(s.text) AS INTEGER) AS n_chars,
        | s.n_tok AS n_tokens,
        | CAST(length(s.text) - length(regexp_replace(s.text, '[[:punct:]]', '', 'g')) AS INTEGER) AS n_punct,
        | CAST(length(s.text) - length(regexp_replace(s.text, '[0-9]', '', 'g')) AS INTEGER) AS n_digits,
        | CAST(len(list_filter(s.ltoks, t -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it'], t))) AS INTEGER) AS n_stopwords,
        | CASE WHEN s.n_tok > 0 THEN CAST(len(list_filter(s.ltoks, t -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it'], t))) AS DOUBLE) / s.n_tok ELSE 0.0 END AS stopword_ratio,
        | CASE WHEN s.n_tok > 0 THEN CAST(length(regexp_replace(s.text, '\\s+', '', 'g')) AS DOUBLE) / s.n_tok ELSE 0.0 END AS mean_word_len
        |FROM scored s JOIN fp f ON s.doc_id = f.doc_id""".stripMargin,

    "t03_langid" ->
      s"""WITH base AS (
        | SELECT doc_id, lang, text,
        |  string_split_regex(trim(lower(text)), '\\s+') AS ltoks
        | FROM documents),
        |scored AS (SELECT *, $SqlLangScores FROM base)
        |SELECT doc_id, lang, $SqlLangCase AS lang_pred FROM scored""".stripMargin)
}
