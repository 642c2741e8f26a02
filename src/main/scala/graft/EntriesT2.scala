package graft

import graft.engine.SparkGraftEngine
import graft.functions.{Dedup, Multimodal, Similarity, Sketches, TextFunctions}
import graft.transform.Transform
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.EntryHelpers._

/** (continued registry) text-analysis (t*) conformance queries and their DuckDB oracles — split out
 * of SparkEntry by family so the registries stay reviewable (the
 * assembled maps are behavior-identical; entries were moved verbatim).
 * Shared fixtures/loaders live in [[EntryHelpers]]. */
private[graft] object EntriesT2 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // overlapping token-window chunking (50-token chunks, 10-token overlap)
    "t08_chunking" -> ((s, dir) =>
      TextFunctions.chunkByTokens(t(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 50, overlapTokens = 10)),

    // vocabulary encoding: corpus tokens -> ids against the corpus's own
    // top-200 vocabulary (t14), OOV -> -1; exact DuckDB oracle
    "t19_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = TextFunctions.buildVocab(docs, "text", size = 200, minCount = 2L)
      // ids rendered as a space-joined string: the driver's pandas
      // comparator cannot sort raw array cells (r3 gate err), and the
      // canonical scalar rendering is hash-comparable across engines
      TextFunctions.encodeWithVocab(docs, "doc_id", "text", vocab)
        .select(col("doc_id"), array_join(col("ids"), " ").as("ids_str"),
          col("n_tokens"), col("n_unk"))
    }),

    // URL/domain source analysis over a deterministically URL-injected
    // corpus (the corpus itself has none) — exact DuckDB oracle
    "t22_url_domains" -> ((s, dir) => {
      // coalesce: Spark concat is null-on-any-null, DuckDB concat skips
      // nulls — guard both sides identically
      val injected = t(s, dir, "documents").select(col("doc_id"),
        concat(coalesce(col("text"), lit("")),
          lit(" see https://site"), (col("doc_id") % 7).cast("string"),
          lit(".example.org/p/"), col("doc_id").cast("string"),
          lit(" and http://cdn.example.net/img.jpg")).as("text"))
      TextFunctions.urlDomainStats(injected, "doc_id", "text")
    }),

    // Dolma/CCNet-style line-level boilerplate dedup over a
    // deterministically multi-lined corpus (the synthetic text is
    // single-line, so inject: a universal boilerplate line, the doc's
    // 40-char prefix as a semi-shared line, and a parity-gated footer) —
    // exact DuckDB oracle recomputes doc-frequencies and the rebuild
    "t23_line_dedup" -> ((s, dir) => {
      val tcol = coalesce(col("text"), lit(""))
      val multi = t(s, dir, "documents").select(col("doc_id"),
        concat(tcol, lit("\nsubscribe to our newsletter\n"),
          substring(tcol, 1, 40),
          when(col("doc_id") % 2 === 0, lit("\nall rights reserved"))
            .otherwise(lit(""))).as("mtext"))
      Dedup.lineDedup(multi, "doc_id", "mtext", maxDocFrequency = 5)
        .select(col("doc_id"), col("dedup_text"),
          col("n_lines").cast("long").as("n_lines"),
          col("n_kept").cast("long").as("n_kept"))
    }),

    // BPE tokenizer training differential: deterministic across runs, the
    // first merge equals the SQL-brute-forced max adjacent pair of the
    // initial character state, merge table well-formed, and applying the
    // merges is lossless (subword concat == whitespace-stripped text)
    "t21_bpe" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val m1 = TextFunctions.learnBpe(docs, "text", numMerges = 40)
      val m2 = TextFunctions.learnBpe(docs, "text", numMerges = 40)
      val det = graft.api.DfUtils.dfEq(m1, m2)
      // SQL brute force of round 1: adjacent pairs of (chars :+ </w>)
      val words = docs
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .select(col("cnt"),
          concat(split(col("w"), ""), array(lit("</w>"))).as("syms"))
      val top = words
        .select(col("cnt"), posexplode(slice(col("syms"), lit(1),
          size(col("syms")) - 1)).as(Seq("i", "l")),
          col("syms"))
        .select(col("cnt"), col("l"),
          element_at(col("syms"), col("i") + 2).as("r"))
        .groupBy("l", "r").agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect().head
      val first = m1.orderBy("rank").limit(1).collect().head
      val firstOk = first.getString(1) == top.getString(0) &&
        first.getString(2) == top.getString(1) &&
        first.getLong(4) == top.getLong(2)
      val rows = m1.collect()
      val wellformed = rows.length == 40 &&
        rows.forall(r => r.getString(3) == r.getString(1) + r.getString(2)) &&
        rows.map(_.getLong(0)).sorted.toSeq == (1L to 40L)
      val mergeList = rows.sortBy(_.getLong(0))
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val lossless = docs.select(
        array_join(TextFunctions.applyBpe(col("text"), mergeList), "").as("a"),
        regexp_replace(trim(lower(col("text"))), "\\s+", "").as("b"))
        .filter(col("a") =!= col("b")).isEmpty
      eng(s).toDF(Seq(Seq(
        if (det && firstOk && wellformed && lossless) 1L else 0L)), "bpe_ok:long")
    }),

    // sequence packing: the tokenized corpus sliced into 128-token
    // training examples via the distributed prefix sum; exact oracle
    "t20_pack_sequences" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = TextFunctions.buildVocab(docs, "text", size = 200, minCount = 2L)
      val enc = TextFunctions.encodeWithVocab(docs, "doc_id", "text", vocab)
        .select("doc_id", "ids")
      // same scalar rendering as t19 — see the comment there
      TextFunctions.packSequences(enc, "doc_id", "ids", seqLen = 128)
        .select(col("example_id"), array_join(col("ids"), " ").as("ids_str"),
          col("n_tokens"))
    }),

    // raw-text cleanup: zero-width/control/unicode-space scrub over a
    // deterministically dirtied corpus, byte-identical RE2 chain both sides
    "t18_clean_text" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.cleanText(dirtyInjected).as("cleaned"))),

    // DSIR-style data selection: importance = mean log-likelihood ratio of
    // a target LM (docs 0-19) vs the raw corpus LM, exact DuckDB oracle
    // (integer ln arguments — see the t12 cross-libm note)
    "t17_importance" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextFunctions.importanceWeights(docs, "doc_id", "text",
        docs.filter(col("doc_id") < 20), "text")
    }),

    // domain-mixture plan: token-budget sampling rates per source toward
    // target weights (binary-fraction weights → FP-exact both engines)
    "t16_mixture_plan" -> ((s, dir) =>
      graft.functions.Sampling.mixturePlan(t(s, dir, "documents"), "source",
        TextFunctions.tokenCount(col("text")),
        Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.125, "src3" -> 0.125),
        budget = 50000L)),

    // Gopher-style repetition stats: most-frequent-2-gram char coverage
    // and duplicate-2-gram char fraction, exact vs the DuckDB oracle
    "t15_ngram_stats" -> ((s, dir) =>
      TextFunctions.ngramRepetitionStats(t(s, dir, "documents"),
        "doc_id", "text", n = 2)),

    // repetition quality signal: duplicate-3-gram fraction per document
    "t10_repetition" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.repetitionRatio(col("text"), k = 3).as("rep_ratio"))),

    // benchmark decontamination: 5-gram overlap of every document with the
    // "eval set" (docs 0-19), exact scores vs the DuckDB list-ops oracle
    "t11_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val evalSet = docs.filter(col("doc_id") < 20)
      Dedup.contaminationScores(docs, "doc_id", "text", evalSet, "text",
        shingleK = 5)
        .select(col("id").as("doc_id"), col("n_shingles"), col("n_matched"),
          col("contamination"))
    }),

    // unigram-LM cross-entropy (CCNet-style self-trained LM filter):
    // exact per-doc scores vs the DuckDB oracle (decimal-bridged log-prob
    // sums make the FP result order-independent on both engines)
    // NOTE on cross-libm FP: t12/t17 compare EXACTLY — their ln arguments
    // are integers (token counts), which java.lang.Math.log and DuckDB's
    // libm round identically (verified at sf0.01 and sf0.1). Rounding the
    // output instead INTRODUCES boundary-straddle risk (a 9th-decimal
    // half boundary between two ulp-equal values — observed at sf0.1).
    // t13 is the opposite case: its idf ln takes a RATIO, where the two
    // libms genuinely disagree, so there the declared-precision rounding
    // is required.
    "t12_lm_score" -> ((s, dir) =>
      TextFunctions.unigramCrossEntropy(t(s, dir, "documents"), "doc_id", "text")),

    // TF-IDF keyword extraction: top-5 tokens per document against the
    // corpus's own document frequencies, exact scores vs the DuckDB oracle
    // scores rounded to 9 decimals BEFORE ranking on BOTH engines: the
    // idf ln is a transcendental whose last ulp differs between
    // java.lang.Math.log and DuckDB's libm for some arguments (caught by
    // the sf0.1 gate — the sf0.01 arguments happen to agree)
    "t13_tfidf" -> ((s, dir) =>
      TextFunctions.tfidfKeywords(t(s, dir, "documents"), "doc_id", "text",
        topK = 5, scoreDigits = Some(9))),

    // vocabulary construction: top-200 tokens with >=2 support, dense ids
    // by descending frequency — exact vs the DuckDB oracle
    "t14_vocab" -> ((s, dir) =>
      TextFunctions.buildVocab(t(s, dir, "documents"), "text",
        size = 200, minCount = 2L)),

    // fingerprint differential: fingerprint-equality classes must coincide
    // with normalized-text-equality classes on the (ASCII) corpus — i.e. a
    // bijection between distinct fingerprints and distinct normalized texts
    "t09_fingerprint_consistency" -> ((s, dir) => {
      val g = t(s, dir, "documents")
        .select(TextFunctions.fingerprint(col("text")).as("fp"),
          lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("nt"))
        .distinct()
      g.agg(countDistinct(col("fp")).as("nfp"),
          countDistinct(col("nt")).as("nnt"), count(lit(1)).as("npair"))
        .select((col("nfp") === col("nnt") && col("nfp") === col("npair"))
          .cast("bigint").as("fp_ok"))
    }),

    // duplicated-span diagnostic (exact-substring dedup family): stride-1
    // 3-token windows, corpus-wide occurrence counts — exact DuckDB
    // oracle regroups by the span STRING (Spark groups by its 64-bit
    // hash; identical modulo collisions)
    "t24_span_dedup" -> ((s, dir) =>
      Dedup.duplicateSpanStats(t(s, dir, "documents"), "doc_id", "text",
        spanTokens = 3, minCount = 2)),

    // exact-substring span REMOVAL (rewrite half of t24's diagnostic):
    // winner occurrence = lexicographically least (doc_id, pos), every
    // other occurrence masked — exact DuckDB oracle replays the whole
    // rewrite (frequency election, winner election, interval-union mask)
    // grouping by span STRING where Spark groups by its 64-bit hash
    "t25_span_removal" -> ((s, dir) =>
      Dedup.removeDuplicateSpans(t(s, dir, "documents"), "doc_id", "text",
        spanTokens = 3, minCount = 2)),

    // learned quality filter: logistic regression (MLlib LBFGS,
    // treeAggregate gradient passes) over the t01/t02 feature set, on a
    // margin-separated synthetic labeling (stopword_ratio vs 0.06 with a
    // 0.01 dead zone) — separable-with-margin data must train to >= 95%
    // accuracy on the training corpus; n_train is oracle-exact (DuckDB
    // recomputes the ratio and the margin filter bit-identically)
    "t26_quality_model" -> ((s, dir) => {
      import graft.functions.QualityModel
      val feats = QualityModel.withFeatures(
        t(s, dir, "documents").select("doc_id", "text"), "text")
      val labeled = feats
        .filter(abs(col("stopword_ratio") - 0.06) > 0.01)
        .withColumn("label", (col("stopword_ratio") > 0.06).cast("double"))
      val model = QualityModel.train(labeled)
      val scored = QualityModel.score(labeled, model)
      scored.agg(
        count(lit(1)).as("n_train"),
        (avg(when(col("quality_pred") === col("label"), 1.0).otherwise(0.0))
          >= 0.95).as("acc_ok"),
        min(col("quality_prob")).between(0.0, 1.0).as("prob_in_range"))
    }),

    // Unicode normalization over a deterministically decomposed corpus
    // (combining acute / ring appended to every doc) — DuckDB's
    // nfc_normalize oracles the NFC path exactly; the NFD and NFKC forms
    // are pinned per-row by round-trip (NFC∘NFD ≡ NFC) and a known
    // compatibility fold (U+FB01 'ﬁ' → "fi")
    "t27_normalize_unicode" -> ((s, dir) => {
      val dirty = concat(coalesce(col("text"), lit("")),
        lit(" cafe\u0301 A\u030A caf\u00E9"))
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.normalizeUnicode(dirty).as("norm_text"),
        (TextFunctions.normalizeUnicode(
          TextFunctions.normalizeUnicode(dirty, "NFD")) ===
          TextFunctions.normalizeUnicode(dirty)).as("nfd_roundtrip_ok"),
        (TextFunctions.normalizeUnicode(lit("\uFB01ne"), "NFKC") === "fine")
          .as("nfkc_ok"))
    }),

    // URL canonicalization over deterministically injected URLs covering
    // every branch: uppercase scheme/host + default port + mid-query
    // tracking param + fragment; first-position tracking param leaving an
    // empty path; non-http(s) scheme; no-scheme pass-through — exact
    // DuckDB oracle replays the identical anchored-RE2 chain
    "t28_url_canon" -> ((s, dir) => {
      val d = col("doc_id")
      val url = when(d % 4 === 0,
        concat(lit("HTTP://Site"), (d % 5).cast("string"),
          lit(".Example.ORG:80/a/b?utm_campaign=x&q="), d.cast("string"),
          lit("#top")))
        .when(d % 4 === 1, lit("https://cdn.example.net:443/?utm_source=a"))
        .when(d % 4 === 2,
          concat(lit("ftp://Files.example.com/data/"), d.cast("string")))
        .otherwise(concat(lit("  not a url "), d.cast("string"), lit("  ")))
      t(s, dir, "documents").select(col("doc_id"), url.as("url"),
        TextFunctions.canonicalizeUrl(url).as("canon_url"))
    }),

    // domain blocklist with suffix semantics (entry blocks host + every
    // subdomain, never a same-suffix lookalike) via the keyed double
    // anti-join — exact DuckDB oracle writes the predicate directly
    "t29_domain_blocklist" -> ((s, dir) => {
      val d = col("doc_id")
      val url = when(d % 4 === 0,
        concat(lit("https://site"), (d % 7).cast("string"),
          lit(".example.org/p/"), d.cast("string")))
        .when(d % 4 === 1, lit("http://cdn.example.net/img.jpg"))
        .when(d % 4 === 2, lit("https://keep.example.com/ok"))
        .otherwise(lit("https://notexample.net/a"))
      val docs = t(s, dir, "documents").select(col("doc_id"), url.as("url"))
      val blocked = eng(s).toDF(
        Seq(Seq("example.net"), Seq("site3.example.org")), "domain:str")
      TextFunctions.filterBlockedDomains(docs, "url", blocked)
    }),

    // bigram LM cross-entropy (Laplace-smoothed conditional, self-trained)
    // — exact DuckDB oracle via the t12 decimal-bridge policy
    "t30_bigram_ce" -> ((s, dir) =>
      TextFunctions.bigramCrossEntropy(
        t(s, dir, "documents"), "doc_id", "text")),

    // mojibake repair over a corpus corrupted end-to-end IN the query
    // (UTF-8 bytes re-read as Latin-1 via Spark's encode/decode, plus a
    // literal cp1252-class "â€™" artifact) — repair∘corrupt ≡ identity
    // gives a full DuckDB oracle: the expected output is just the
    // uncorrupted construction
    "t31_fix_mojibake" -> ((s, dir) => {
      val dirty = concat(coalesce(col("text"), lit("")),
        lit(" café ’quote’ €9"))
      val corrupted = concat(
        decode(encode(dirty, "UTF-8"), "ISO-8859-1"),
        lit(" â€™"))
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.fixMojibake(corrupted).as("repaired"),
        (corrupted =!= TextFunctions.fixMojibake(corrupted))
          .as("was_corrupted"))
    }),

    // HTML text extraction + link-density boilerplate stats over a
    // deterministically HTML-wrapped corpus: script/style subtrees with
    // bare `<`/`>` in code, comments, per-doc-varying nav anchors, the
    // `&amp;lt;` single-decode case, and an unknown `&copy;` passthrough —
    // exact DuckDB oracle replays the identical RE2 chain
    "t32_html_extract" -> ((s, dir) => {
      val d = col("doc_id")
      val html = concat(
        lit("<!DOCTYPE html><html><head><title>Doc "), d.cast("string"),
        lit("</title><style type=\"text/css\">body { color: #fff; }</style>" +
          "<script>var x = 1; if (x < 2) { x = \"a > b\"; }</script></head>" +
          "<body><nav class=\"menu\"><a href=\"/\">Home</a> " +
          "<a href=\"/about\">About us</a>"),
        when(d % 3 === 0,
          lit(" <a href=\"/archive\">Archive of older posts</a>"))
          .otherwise(lit("")),
        lit("</nav><h1>Title &amp; intro &amp;lt;escaped&amp;gt;</h1><p>"),
        coalesce(col("text"), lit("")),
        lit("</p><!-- tracking --><div class=\"footer\">&copy; Example" +
          "&nbsp;Co &#39;quoted&#39; <a href=\"/contact\">Contact</a></div>" +
          "</body></html>"))
      TextFunctions.htmlTextStats(
        t(s, dir, "documents").select(d, html.as("html")), "doc_id", "html")
    }),

    // compression-ratio quality signal: DuckDB has no zlib, so the gate is
    // a law differential over the whole corpus — (1) natural text of
    // >=100 chars lands in (0, 1.1]; (2) a highly repetitive string
    // compresses strictly better than same-corpus hex noise; (3) self-
    // concatenation at least quarters off the ratio (the second copy is
    // one window back-reference); (4) the expression is deterministic
    // across two independent evaluations
    "t33_compression_ratio" -> ((s, dir) => {
      val tcol = coalesce(col("text"), lit(""))
      val docs = t(s, dir, "documents").filter(length(tcol) >= 100)
      def ratios(df: DataFrame) = df.select(col("doc_id"),
        TextFunctions.compressionRatio(tcol).as("r_text"),
        TextFunctions.compressionRatio(repeat(substring(tcol, 1, 10), 30))
          .as("r_rep"),
        TextFunctions.compressionRatio(concat(sha2(tcol, 256),
          sha2(concat(tcol, lit("1")), 256),
          sha2(concat(tcol, lit("2")), 256))).as("r_rnd"),
        TextFunctions.compressionRatio(concat(tcol, tcol)).as("r_dup"))
      val base = ratios(docs)
      val laws = base.agg(
        min((col("r_text") > 0 && col("r_text") <= 1.1 &&
          col("r_rep") < col("r_rnd") &&
          col("r_dup") < col("r_text") * 0.75).cast("long")).as("all_ok"),
        count(lit(1)).as("n")).collect().head
      val det = graft.api.DfUtils.dfEq(base, ratios(docs))
      eng(s).toDF(Seq(Seq(
        if (laws.getLong(0) == 1L && laws.getLong(1) > 0 && det) 1L else 0L)),
        "comp_ok:long")
    }))

  val oracles: Map[String, String] = Map(

    "t33_compression_ratio" -> "SELECT CAST(1 AS BIGINT) AS comp_ok",

    "t24_span_dedup" ->
      """WITH w AS (
        | SELECT doc_id,
        |  CASE WHEN length(regexp_replace(text, '\s', '', 'g')) = 0 THEN []
        |   ELSE string_split_regex(trim(text), '\s+') END AS toks
        | FROM documents),
        |idx AS (SELECT doc_id, toks,
        |  unnest(range(1, len(toks) - 1)) AS i FROM w),
        |spans AS (SELECT doc_id,
        |  array_to_string(toks[i:i+2], ' ') AS span FROM idx),
        |freq AS (SELECT span FROM spans GROUP BY span HAVING count(*) >= 2),
        |dup AS (SELECT s.doc_id, count(*) AS n_dup
        | FROM spans s JOIN freq f USING (span) GROUP BY 1),
        |ns AS (SELECT doc_id, greatest(len(toks) - 2, 0) AS n_spans FROM w)
        |SELECT n.doc_id, CAST(n.n_spans AS BIGINT) AS n_spans,
        | CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup_spans,
        | CASE WHEN n.n_spans > 0
        |  THEN CAST(coalesce(d.n_dup, 0) AS DOUBLE) / n.n_spans
        |  ELSE 0.0 END AS dup_ratio
        |FROM ns n LEFT JOIN dup d USING (doc_id)""".stripMargin,

    "t25_span_removal" ->
      """WITH w AS (
        | SELECT doc_id, text,
        |  CASE WHEN length(regexp_replace(text, '\s', '', 'g')) = 0 THEN []
        |   ELSE string_split_regex(trim(text), '\s+') END AS toks
        | FROM documents),
        |idx AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i FROM w),
        |spans AS (SELECT doc_id, i, array_to_string(toks[i:i+2], ' ') AS span
        | FROM idx),
        |freq AS (SELECT span FROM spans GROUP BY 1 HAVING count(*) >= 2),
        |dup AS (SELECT s.doc_id, s.i, s.span FROM spans s JOIN freq USING (span)),
        |win AS (SELECT doc_id, i,
        |  row_number() OVER (PARTITION BY span ORDER BY doc_id, i) AS rk
        | FROM dup),
        |kills AS (SELECT doc_id, list(i) AS ks FROM win WHERE rk > 1 GROUP BY 1),
        |kept AS (
        | SELECT w.doc_id, w.text, w.toks, k.ks,
        |  CASE WHEN k.ks IS NULL THEN NULL
        |   ELSE list_filter(range(1, len(w.toks) + 1),
        |     ti -> len(list_filter(k.ks, p -> ti >= p AND ti < p + 3)) = 0)
        |  END AS keep
        | FROM w LEFT JOIN kills k USING (doc_id))
        |SELECT doc_id,
        | CASE WHEN ks IS NULL THEN text
        |  -- array_to_string([]) is NULL in DuckDB; Spark's array_join is ''
        |  ELSE coalesce(
        |   array_to_string(list_transform(keep, ti -> toks[ti]), ' '), '')
        | END AS dedup_text,
        | CAST(len(toks) AS BIGINT) AS n_tokens,
        | CAST(CASE WHEN ks IS NULL THEN 0 ELSE len(toks) - len(keep) END
        |  AS BIGINT) AS n_removed_tokens
        |FROM kept""".stripMargin,

    "t26_quality_model" ->
      """WITH b AS (
        | SELECT string_split_regex(trim(lower(text)), '\s+') AS ltoks,
        |  CASE WHEN length(regexp_replace(text, '\s', '', 'g')) = 0
        |   THEN CAST(0 AS INTEGER)
        |   ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER)
        |  END AS n_tok
        | FROM documents),
        |s AS (SELECT CASE WHEN n_tok > 0
        |  THEN CAST(len(list_filter(ltoks, t -> list_contains(
        |   ['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it'],
        |   t))) AS DOUBLE) / n_tok ELSE 0.0 END AS r FROM b)
        |SELECT CAST(count(*) AS BIGINT) AS n_train, TRUE AS acc_ok,
        | TRUE AS prob_in_range
        |FROM s WHERE abs(r - 0.06) > 0.01""".stripMargin,

    "t09_fingerprint_consistency" -> "SELECT CAST(1 AS BIGINT) AS fp_ok",

    "t08_chunking" ->
      """WITH t AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        | FROM documents WHERE length(regexp_replace(text, '\s', '', 'g')) > 0),
        |c AS (
        | SELECT doc_id, w,
        |  greatest(1, CAST(ceil((len(w) - 10) / 40.0) AS INT)) AS m
        | FROM t),
        |j AS (
        | SELECT doc_id, w, unnest(generate_series(0, m - 1)) AS cid FROM c)
        |SELECT doc_id, CAST(cid AS INTEGER) AS chunk_id,
        | array_to_string(w[cid*40+1 : cid*40+50], ' ') AS chunk_text,
        | CAST(len(w[cid*40+1 : cid*40+50]) AS INTEGER) AS n_tokens
        |FROM j""".stripMargin,

    "t21_bpe" -> "SELECT CAST(1 AS BIGINT) AS bpe_ok",

    "t22_url_domains" ->
      (s"""WITH injected AS (
        | SELECT doc_id, concat(coalesce(text, ''), ' see https://site',
        |  CAST(doc_id % 7 AS VARCHAR), '.example.org/p/',
        |  CAST(doc_id AS VARCHAR), ' and http://cdn.example.net/img.jpg') AS text
        | FROM documents),
        |hits AS (
        | SELECT doc_id,
        |  unnest(regexp_extract_all(text, '${graft.functions.TextFunctions.UrlRegex}', 1)) AS domain
        | FROM injected),
        |per_doc AS (SELECT domain, doc_id, count(*) AS n FROM hits GROUP BY 1, 2)
        |SELECT domain, CAST(sum(n) AS BIGINT) AS n_urls,
        | CAST(count(*) AS BIGINT) AS n_docs
        |FROM per_doc GROUP BY domain""").stripMargin,

    "t23_line_dedup" ->
      """WITH docs AS (
        | SELECT doc_id, concat(coalesce(text, ''), chr(10),
        |  'subscribe to our newsletter', chr(10),
        |  substr(coalesce(text, ''), 1, 40),
        |  CASE WHEN doc_id % 2 = 0 THEN concat(chr(10), 'all rights reserved')
        |   ELSE '' END) AS mtext
        | FROM documents),
        |sp AS (SELECT doc_id, string_split(mtext, chr(10)) AS ls FROM docs),
        |lines AS (SELECT doc_id, unnest(ls) AS l,
        |  generate_subscripts(ls, 1) AS pos FROM sp),
        |banned AS (
        | SELECT trim(l) AS nl FROM lines WHERE length(trim(l)) > 0
        | GROUP BY 1 HAVING count(DISTINCT doc_id) > 5),
        |kept AS (
        | SELECT doc_id, pos, l FROM lines
        | WHERE length(trim(l)) = 0 OR trim(l) NOT IN (SELECT nl FROM banned))
        |SELECT s.doc_id,
        | coalesce(k.dedup_text, '') AS dedup_text,
        | CAST(len(s.ls) AS BIGINT) AS n_lines,
        | CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
        |FROM sp s LEFT JOIN (
        | SELECT doc_id, string_agg(l, chr(10) ORDER BY pos) AS dedup_text,
        |  count(*) AS n_kept FROM kept GROUP BY doc_id) k USING (doc_id)""".stripMargin,

    // chr(769)=U+0301 combining acute, chr(778)=U+030A combining ring,
    // chr(233)=U+00E9 composed é — mirrors the Spark-side injected escapes
    "t27_normalize_unicode" ->
      """SELECT doc_id,
        | nfc_normalize(concat(coalesce(text, ''), ' cafe', chr(769), ' A',
        |  chr(778), ' caf', chr(233))) AS norm_text,
        | TRUE AS nfd_roundtrip_ok, TRUE AS nfkc_ok
        |FROM documents""".stripMargin,

    "t28_url_canon" ->
      s"""WITH injected AS (
        | SELECT doc_id, CASE
        |  WHEN doc_id % 4 = 0 THEN concat('HTTP://Site',
        |   CAST(doc_id % 5 AS VARCHAR),
        |   '.Example.ORG:80/a/b?utm_campaign=x&q=', CAST(doc_id AS VARCHAR),
        |   '#top')
        |  WHEN doc_id % 4 = 1 THEN 'https://cdn.example.net:443/?utm_source=a'
        |  WHEN doc_id % 4 = 2 THEN concat('ftp://Files.example.com/data/',
        |   CAST(doc_id AS VARCHAR))
        |  ELSE concat('  not a url ', CAST(doc_id AS VARCHAR), '  ') END AS url
        | FROM documents),
        |c1 AS (SELECT doc_id, url, trim(url) AS u FROM injected),
        |c2 AS (SELECT *,
        |  lower(regexp_extract(u, '${TextFunctions.UrlSchemeRegex}', 1)) AS scheme,
        |  lower(regexp_extract(u, '${TextFunctions.UrlHostPortRegex}', 1)) AS hostport,
        |  regexp_extract(u, '${TextFunctions.UrlRestRegex}', 1) AS rest0 FROM c1),
        |c3 AS (SELECT *,
        |  CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
        |   WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
        |   ELSE hostport END AS host,
        |  regexp_replace(regexp_replace(rest0,
        |    '${TextFunctions.TrackAmpRegex}', '', 'g'),
        |   '${TextFunctions.TrackFirstRegex}', '?', 'g') AS rest2 FROM c2),
        |c4 AS (SELECT *, regexp_replace(regexp_replace(rest2, '\\?&', '?', 'g'),
        |  '[?&]$$', '') AS rest4 FROM c3)
        |SELECT doc_id, url, CASE WHEN scheme = '' THEN u
        | ELSE concat(scheme, '://', host,
        |  CASE WHEN rest4 = '' THEN '/' ELSE rest4 END) END AS canon_url
        |FROM c4""".stripMargin,

    "t29_domain_blocklist" ->
      s"""WITH injected AS (
        | SELECT doc_id, CASE
        |  WHEN doc_id % 4 = 0 THEN concat('https://site',
        |   CAST(doc_id % 7 AS VARCHAR), '.example.org/p/',
        |   CAST(doc_id AS VARCHAR))
        |  WHEN doc_id % 4 = 1 THEN 'http://cdn.example.net/img.jpg'
        |  WHEN doc_id % 4 = 2 THEN 'https://keep.example.com/ok'
        |  ELSE 'https://notexample.net/a' END AS url
        | FROM documents),
        |h AS (SELECT doc_id, url,
        |  lower(regexp_extract(trim(url), '${TextFunctions.UrlHostRegex}', 1)) AS host
        | FROM injected)
        |SELECT doc_id, url FROM h
        |WHERE NOT (host = 'example.net' OR host LIKE '%.example.net'
        |  OR host = 'site3.example.org' OR host LIKE '%.site3.example.org')""".stripMargin,

    // chr(233)=é, chr(8217)=', chr(8364)=€ — the uncorrupted construction;
    // the corruption+repair happen Spark-side and must invert exactly
    "t31_fix_mojibake" ->
      """SELECT doc_id,
        | concat(coalesce(text, ''), ' caf', chr(233), ' ', chr(8217),
        |  'quote', chr(8217), ' ', chr(8364), '9', ' ', chr(8217))
        |  AS repaired,
        | TRUE AS was_corrupted
        |FROM documents""".stripMargin,

    "t32_html_extract" ->
      s"""WITH h AS (SELECT doc_id,
        | concat('<!DOCTYPE html><html><head><title>Doc ',
        |  CAST(doc_id AS VARCHAR),
        |  '</title><style type="text/css">body { color: #fff; }</style>',
        |  '<script>var x = 1; if (x < 2) { x = "a > b"; }</script></head>',
        |  '<body><nav class="menu"><a href="/">Home</a> ',
        |  '<a href="/about">About us</a>',
        |  CASE WHEN doc_id % 3 = 0
        |   THEN ' <a href="/archive">Archive of older posts</a>'
        |   ELSE '' END,
        |  '</nav><h1>Title &amp; intro &amp;lt;escaped&amp;gt;</h1><p>',
        |  coalesce(text, ''),
        |  '</p><!-- tracking --><div class="footer">&copy; Example',
        |  '&nbsp;Co &#39;quoted&#39; <a href="/contact">Contact</a></div>',
        |  '</body></html>') AS html
        | FROM documents),
        |x AS (SELECT doc_id,
        |  ${sqlHtmlText("html")} AS text,
        |  ${sqlHtmlText(
             "array_to_string(regexp_extract_all(html, '" +
               graft.functions.TextFunctions.HtmlAnchorRegex + "', 1), ' ')")}
        |   AS atext,
        |  len(regexp_extract_all(html,
        |   '${graft.functions.TextFunctions.HtmlAnchorRegex}', 0)) AS n_links
        | FROM h)
        |SELECT doc_id, text,
        | CAST(n_links AS BIGINT) AS n_links,
        | CAST(length(atext) AS BIGINT) AS link_chars,
        | CAST(length(text) AS BIGINT) AS text_chars,
        | CASE WHEN length(text) > 0
        |  THEN CAST(length(atext) AS DOUBLE) / length(text)
        |  ELSE 0.0 END AS link_density
        |FROM x""".stripMargin,

    "t30_bigram_ce" ->
      """WITH toks0 AS (
        | SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |   x -> length(x) > 0) AS w
        | FROM documents),
        |b AS (SELECT doc_id, w FROM toks0 WHERE len(w) >= 2),
        |ix AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i FROM b),
        |pr AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2 FROM ix),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM pr GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM pr GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS v FROM (
        |  SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |    x -> length(x) > 0)) AS tok FROM documents)),
        |lp AS (
        | SELECT doc_id,
        |  ln(CAST(coalesce(c12, 0) + 1 AS DOUBLE)) - ln(CAST(c1 + v AS DOUBLE)) AS lp
        | FROM pr JOIN c1 USING (w1) LEFT JOIN c12 USING (w1, w2), v)
        |SELECT doc_id, count(*) AS n_bigrams,
        | -CAST(sum(CAST(lp AS DECIMAL(20,10))) AS DOUBLE) / count(*) AS bigram_ce
        |FROM lp GROUP BY doc_id""".stripMargin,

    "t18_clean_text" ->
      s"SELECT doc_id, ${sqlCleaned(SqlInjectedDirty)} AS cleaned FROM documents",

    "t19_encode" ->
      """WITH vt AS (
        | SELECT unnest(string_split_regex(trim(lower(text)),'\s+')) AS token
        | FROM documents),
        |counts AS (SELECT token, count(*) AS cnt FROM vt
        | WHERE length(token) > 0 GROUP BY token HAVING count(*) >= 2),
        |vocab AS (SELECT token, CAST(token_id AS INTEGER) AS token_id FROM (
        | SELECT token, row_number() OVER (ORDER BY cnt DESC, token ASC) AS token_id
        | FROM counts) x WHERE token_id <= 200),
        |t AS (SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS w
        | FROM documents),
        |tk0 AS (SELECT doc_id, unnest(generate_series(1, len(w))) AS pos, w FROM t),
        |tk AS (SELECT doc_id, pos, w[pos] AS tok FROM tk0 WHERE length(w[pos]) > 0)
        |SELECT doc_id,
        | array_to_string(
        |   list(CAST(coalesce(v.token_id, -1) AS BIGINT) ORDER BY pos),
        |   ' ') AS ids_str,
        | CAST(count(*) AS BIGINT) AS n_tokens,
        | CAST(sum(CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
        |FROM tk LEFT JOIN vocab v ON tk.tok = v.token
        |GROUP BY doc_id""".stripMargin,

    "t20_pack_sequences" ->
      """WITH vt AS (
        | SELECT unnest(string_split_regex(trim(lower(text)),'\s+')) AS token
        | FROM documents),
        |counts AS (SELECT token, count(*) AS cnt FROM vt
        | WHERE length(token) > 0 GROUP BY token HAVING count(*) >= 2),
        |vocab AS (SELECT token, CAST(token_id AS INTEGER) AS token_id FROM (
        | SELECT token, row_number() OVER (ORDER BY cnt DESC, token ASC) AS token_id
        | FROM counts) x WHERE token_id <= 200),
        |t AS (SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS w
        | FROM documents),
        |tk0 AS (SELECT doc_id, unnest(generate_series(1, len(w))) AS pos, w FROM t),
        |tk AS (SELECT doc_id, pos, w[pos] AS tok FROM tk0 WHERE length(w[pos]) > 0),
        |enc AS (SELECT doc_id, pos,
        |  CAST(coalesce(v.token_id, -1) AS BIGINT) AS tid
        | FROM tk LEFT JOIN vocab v ON tk.tok = v.token),
        |g AS (SELECT tid,
        |  row_number() OVER (ORDER BY doc_id, pos) - 1 AS gpos FROM enc)
        |SELECT CAST(gpos // 128 AS BIGINT) AS example_id,
        | array_to_string(list(tid ORDER BY gpos), ' ') AS ids_str,
        | CAST(count(*) AS BIGINT) AS n_tokens
        |FROM g GROUP BY 1""".stripMargin,

    "t17_importance" ->
      """WITH rt AS (
        | SELECT doc_id, unnest(string_split_regex(trim(lower(text)),'\s+')) AS tok
        | FROM documents),
        |rtoks AS (SELECT doc_id, tok FROM rt WHERE length(tok) > 0),
        |rc AS (SELECT tok, count(*) AS cnt_r FROM rtoks GROUP BY tok),
        |tc AS (SELECT tok, count(*) AS cnt_t FROM rtoks
        | WHERE doc_id < 20 GROUP BY tok),
        |v AS (SELECT coalesce(rc.tok, tc.tok) AS tok,
        |  coalesce(cnt_r, 0) AS cnt_r, coalesce(cnt_t, 0) AS cnt_t
        | FROM rc FULL JOIN tc ON rc.tok = tc.tok),
        |tot AS (SELECT sum(cnt_r) AS nr, sum(cnt_t) AS nt, count(*) AS v FROM v),
        |llr AS (SELECT tok,
        |  ln(CAST(cnt_t + 1 AS DOUBLE)) - ln(CAST(nt + v AS DOUBLE))
        |   - ln(CAST(cnt_r + 1 AS DOUBLE)) + ln(CAST(nr + v AS DOUBLE)) AS llr
        | FROM v, tot)
        |SELECT doc_id, count(*) AS n_tokens,
        | CAST(sum(CAST(llr AS DECIMAL(20,10))) AS DOUBLE) / count(*) AS importance
        |FROM rtoks JOIN llr USING (tok)
        |GROUP BY doc_id""".stripMargin,

    "t16_mixture_plan" ->
      """WITH szs AS (
        | SELECT source AS domain,
        |  CASE WHEN length(regexp_replace(text,'\s','','g')) > 0
        |    THEN len(string_split_regex(trim(text),'\s+')) ELSE 0 END AS sz
        | FROM documents),
        |agg AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(sz) AS BIGINT) AS available FROM szs GROUP BY domain),
        |w AS (SELECT domain, n_rows, available,
        |  CASE domain WHEN 'src0' THEN CAST(0.5 AS DOUBLE)
        |   WHEN 'src1' THEN CAST(0.25 AS DOUBLE)
        |   WHEN 'src2' THEN CAST(0.125 AS DOUBLE)
        |   WHEN 'src3' THEN CAST(0.125 AS DOUBLE)
        |   ELSE CAST(0.0 AS DOUBLE) END AS wt
        | FROM agg)
        |SELECT domain, n_rows, available,
        | wt * 50000 AS target_size,
        | CASE WHEN available > 0
        |   THEN least(CAST(1.0 AS DOUBLE), wt * 50000 / available)
        |   ELSE 0.0 END AS sampling_rate,
        | CASE WHEN available > 0 THEN wt * 50000 / available
        |   ELSE 0.0 END AS epochs
        |FROM w""".stripMargin,

    "t15_ngram_stats" ->
      """WITH base AS (
        | SELECT doc_id,
        |  CASE WHEN length(regexp_replace(text,'\s','','g')) > 0
        |    THEN string_split_regex(trim(text),'\s+')
        |    ELSE [] END AS w
        | FROM documents),
        |b2 AS (SELECT doc_id, w, length(array_to_string(w,' ')) AS nchars FROM base),
        |grams AS (
        | SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |   i -> w[i] || ' ' || w[i+1])) AS gram
        | FROM b2 WHERE len(w) >= 2),
        |counts AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY 1, 2),
        |ranked AS (SELECT doc_id, gram, cnt,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn
        | FROM counts),
        |tops AS (SELECT doc_id, gram AS top_gram, cnt AS top_cnt
        | FROM ranked WHERE rn = 1),
        |aggd AS (SELECT doc_id,
        |  sum(CASE WHEN cnt > 1 THEN cnt * length(gram) ELSE 0 END) AS dupw,
        |  sum(cnt * length(gram)) AS totw
        | FROM counts GROUP BY doc_id)
        |SELECT b2.doc_id, coalesce(top_gram, '') AS top_ngram,
        | CASE WHEN nchars > 0 AND top_cnt IS NOT NULL
        |   THEN CAST(top_cnt * length(top_gram) AS DOUBLE) / nchars
        |   ELSE 0.0 END AS top_ngram_char_frac,
        | CASE WHEN totw > 0 THEN CAST(dupw AS DOUBLE) / totw
        |   ELSE 0.0 END AS dup_ngram_char_frac
        |FROM b2 LEFT JOIN tops USING (doc_id) LEFT JOIN aggd USING (doc_id)""".stripMargin,

    "t10_repetition" ->
      """WITH toks AS (
        | SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w FROM documents)
        |SELECT doc_id,
        | CASE WHEN len(w) >= 3 AND length(trim(text)) > 0
        |   THEN 1.0 - CAST(len(list_distinct(list_transform(range(1, len(w)-1),
        |     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS DOUBLE) / (len(w)-2)
        |   ELSE 0.0 END AS rep_ratio
        |FROM toks""".stripMargin,

    "t11_decontaminate" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w)-3),
        |   i -> array_to_string(w[i:i+4], ' '))) AS s
        | FROM toks WHERE len(w) >= 5),
        |ev AS (SELECT list_distinct(flatten(list(s))) AS es FROM sh WHERE doc_id < 20)
        |SELECT doc_id, CAST(len(s) AS INTEGER) AS n_shingles,
        | CAST(len(list_intersect(s, es)) AS BIGINT) AS n_matched,
        | CAST(len(list_intersect(s, es)) AS DOUBLE) / len(s) AS contamination
        |FROM sh, ev""".stripMargin,

    "t12_lm_score" ->
      """WITH toks0 AS (
        | SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        | FROM documents),
        |toks AS (SELECT doc_id, tok FROM toks0 WHERE length(tok) > 0),
        |vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        |total AS (SELECT sum(cnt) AS n FROM vocab),
        |logp AS (SELECT tok, ln(CAST(cnt AS DOUBLE)) - ln(CAST(n AS DOUBLE)) AS logp
        | FROM vocab, total)
        |SELECT doc_id, count(*) AS n_tokens,
        | -CAST(sum(CAST(logp AS DECIMAL(20,10))) AS DOUBLE) / count(*) AS cross_entropy
        |FROM toks JOIN logp USING (tok)
        |GROUP BY doc_id""".stripMargin,

    "t13_tfidf" ->
      """WITH toks0 AS (
        | SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        | FROM documents),
        |toks AS (SELECT doc_id, token FROM toks0 WHERE length(token) > 0),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
        |scored AS (
        | SELECT doc_id, token, tf,
        |  round((ln(CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)) + 1.0)
        |    * CAST(tf AS DOUBLE), 9) AS score
        | FROM tf JOIN dfreq USING (token), nd)
        |SELECT doc_id, CAST(rank AS INTEGER) AS rank, token, tf, score FROM (
        | SELECT *, row_number() OVER (PARTITION BY doc_id
        |   ORDER BY score DESC, token ASC) AS rank
        | FROM scored) x WHERE rank <= 5""".stripMargin,

    "t14_vocab" ->
      """WITH toks0 AS (
        | SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        | FROM documents),
        |counts AS (SELECT token, count(*) AS cnt FROM toks0
        | WHERE length(token) > 0 GROUP BY token HAVING count(*) >= 2)
        |SELECT token, cnt, CAST(token_id AS INTEGER) AS token_id FROM (
        | SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token ASC) AS token_id
        | FROM counts) x WHERE token_id <= 200""".stripMargin)
}
