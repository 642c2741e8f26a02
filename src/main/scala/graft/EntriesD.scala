package graft

import graft.engine.SparkGraftEngine
import graft.functions.{Dedup, Multimodal, Similarity, Sketches, TextFunctions}
import graft.transform.Transform
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.EntryHelpers._

/** deduplication-family (d*) conformance queries and their DuckDB oracles — split out
 * of SparkEntry by family so the registries stay reviewable (the
 * assembled maps are behavior-identical; entries were moved verbatim).
 * Shared fixtures/loaders live in [[EntryHelpers]]. */
private[graft] object EntriesD {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // directional n-gram containment join (quote/excerpt detection),
    // FULL oracle: |A ∩ B|/|A| over distinct trigram shingles — the
    // asymmetric complement of d04's symmetric Jaccard, same
    // inverted-index machinery, DuckDB recomputes with string list ops
    "d17_containment" -> ((s, dir) =>
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleK = 3, threshold = 0.5)),


    // ---- beyond-reference: dedup --------------------------------------
    "d01_dedup_exact" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents"), Seq("text"), "doc_id")),

    "d02_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashNearDupPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleK = 3, numHashes = 128, bands = 16, threshold = 0.5)
        .select("id_a", "id_b", "jaccard")),

    "d03_dedup_simhash" -> ((s, dir) =>
      Dedup.simhashNearDupPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3)),

    "d04_dedup_ngram" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleK = 3, threshold = 0.5)),

    // scale path by default: hyperplane-LSH bucketing, never a cartesian
    "d05_dedup_embed" -> ((s, dir) =>
      Similarity.lshCosinePairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.4, nTables = 16, nBits = 8, probes = 1)
        .select("id_a", "id_b")),

    // exact all-pairs variant (opt-in at scale) — full DuckDB oracle
    "d05x_dedup_embed_exact" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.4).select("id_a", "id_b")),

    // differential conformance: LSH pair recall vs the exact path ≥ 0.9
    // (single-row result; oracle is the constant the differential must hit)
    "d07_embed_lsh_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val exact = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.4)
        .select("id_a", "id_b")
      val lsh = Similarity.lshCosinePairs(emb, "vec_id", "embedding",
        threshold = 0.4, nTables = 16, nBits = 8, probes = 1).select("id_a", "id_b")
      val found = exact.join(lsh, Seq("id_a", "id_b"), "left_semi")
        .agg(count(lit(1)).as("n_found"))
      exact.agg(count(lit(1)).as("n_exact")).crossJoin(found)
        .select((col("n_found").cast("double") / col("n_exact") >= 0.9)
          .cast("bigint").as("recall_ok"))
    }),


    // simhash banding exactness: by pigeonhole, 4×16-bit banding finds
    // EVERY pair with hamming ≤ 3 — the banded result must equal the
    // all-pairs brute force over the same signatures exactly
    "d09_simhash_exactness" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // uncapped buckets: the exactness claim holds only without the skew
      // cap (a >maxBucketSize band bucket would silently drop pairs)
      val banded = Dedup.simhashNearDupPairs(docs, "doc_id", "text",
        maxHamming = 3, maxBucketSize = Int.MaxValue)
        .select("id_a", "id_b", "hamming")
      val sigs = docs.select(col("doc_id").as("id"),
        Dedup.simhash(col("text")).as("sig")).localCheckpoint(true)
      val brute = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
        .crossJoin(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")))
        .filter(col("id_a") < col("id_b"))
        .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
        .filter(col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
      eng(s).toDF(Seq(Seq(
        if (graft.api.DfUtils.dfEq(banded, brute)) 1L else 0L)), "exact_ok:long")
    }),

    // minhash-LSH precision differential: every LSH-found pair must appear
    // in the exact n-gram result with the identical jaccard (the verify
    // step computes exact jaccard, so LSH pairs ⊆ exact pairs always)
    "d08_minhash_precision" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val lsh = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      val spurious = lsh.join(exact, Seq("id_a", "id_b"), "left_anti")
        .agg(count(lit(1)).as("n_spurious"))
      val found = lsh.agg(count(lit(1)).as("n_found"))
      spurious.crossJoin(found)
        .select((col("n_spurious") === 0 && col("n_found") > 0)
          .cast("bigint").as("precision_ok"))
    }),

    // connected-components differential: the driver union-find fast path
    // and the distributed min-label loop must keep the identical id set
    "d10_cc_paths_agree" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // materialize once: both CC paths below consume the pair list, and
      // each would otherwise re-run the whole candidate/verify pipeline
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
        .localCheckpoint(true)
      val a = Dedup.dropNearDuplicates(docs, "doc_id", pairs).select("doc_id")
      val b = Dedup.dropNearDuplicates(docs, "doc_id", pairs,
        driverMaxEdges = 0).select("doc_id")
      eng(s).toDF(Seq(Seq(
        if (graft.api.DfUtils.dfEq(a, b)) 1L else 0L)), "cc_ok:long")
    }),

    // quality-aware dedup differential: (a) ascending-id quality reproduces
    // the min-id convention exactly; (b) best-quality keeps one rep per
    // component (same survivor COUNT as min-id) and drops the same ids
    // (survivor sets agree on membership of each component)
    "d11_dedup_best" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // materialized once — four CC invocations below read the pair list
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
        .localCheckpoint(true)
      val minId = Dedup.dropNearDuplicates(docs, "doc_id", pairs)
      val viaBy = Dedup.dropNearDuplicatesBy(docs, "doc_id", pairs, "doc_id",
        descending = false)
      val best = Dedup.dropNearDuplicatesBy(docs, "doc_id", pairs, "n_chars")
      val sameAsMinId = graft.api.DfUtils.dfEq(
        minId.select("doc_id"), viaBy.select("doc_id"))
      val oneRepPerComponent = best.count() == minId.count()
      // every best-quality survivor's component representative maps back to
      // a min-id survivor (same components survived)
      val comps = Dedup.nearDupComponents(docs, "doc_id", pairs)
      val sameComponents = graft.api.DfUtils.dfEq(
        comps.join(best.select("doc_id"), "doc_id").select("component"),
        comps.join(minId.select("doc_id"), "doc_id").select("component"))
      eng(s).toDF(Seq(Seq(
        if (sameAsMinId && oneRepPerComponent && sameComponents) 1L else 0L)),
        "best_ok:long")
    }),


    // exact edit-distance fuzzy join (record linkage): all customer-name
    // pairs within levenshtein 1, via deletion-neighborhood blocking +
    // exact verify — full DuckDB levenshtein oracle
    "d12_fuzzy_join" -> ((s, dir) =>
      Dedup.editDistanceJoin(t(s, dir, "customer"), "c_custkey", "c_name",
        maxDist = 1)
        .select(col("id_a"), col("id_b"), col("dist"))),

    // Bloom-filter line dedup differential vs the exact path, on the
    // same injected corpus as t23: (1) one-sided error — every line the
    // exact dedup drops, the Bloom dedup drops (per-doc Bloom-kept ⊆
    // exact-kept, checked positionally after removing exact-dropped
    // lines); (2) the false-positive overdrop stays under 5× fpp of the
    // exact-kept line mass; (3) line/blank accounting identical;
    // (4) deterministic across two independent evaluations
    "d16_bloom_line_dedup" -> ((s, dir) => {
      val tcol = coalesce(col("text"), lit(""))
      val multi = t(s, dir, "documents").select(col("doc_id"),
        concat(tcol, lit("\nsubscribe to our newsletter\n"),
          substring(tcol, 1, 40),
          when(col("doc_id") % 2 === 0, lit("\nall rights reserved"))
            .otherwise(lit(""))).as("mtext"))
      val fpp = 0.01
      val exact = Dedup.lineDedup(multi, "doc_id", "mtext",
        maxDocFrequency = 5)
      def bloom() = Dedup.bloomLineDedup(multi, "doc_id", "mtext",
        maxDocFrequency = 5, fpp = fpp)
      val b1 = bloom()
      val j = exact.select(col("doc_id"), col("dedup_text").as("e_text"),
          col("n_lines").as("e_lines"), col("n_kept").as("e_kept"))
        .join(b1.select(col("doc_id"), col("dedup_text").as("b_text"),
          col("n_lines").as("b_lines"), col("n_kept").as("b_kept")),
          Seq("doc_id"))
      // sequence containment: both outputs are subsequences of the SAME
      // original line sequence, and removal is all-or-nothing per line
      // VALUE (hash-keyed), so "Bloom-kept ⊆ exact-kept as a (doc, line,
      // occurrence#) multiset" already implies b_text is e_text with
      // whole value-classes removed, in order — no positional check
      // needed on top
      val eL = posexplode(split(col("e_text"), "\n", -1))
      val bL = posexplode(split(col("b_text"), "\n", -1))
      // n_kept == 0 renders as "" whose split yields a PHANTOM empty
      // line — at sf0.1 a false positive can legitimately empty a whole
      // document, and the phantom would fail the subset check against
      // an exact side that kept real lines. Skip emptied docs on each
      // side (n_kept counts blanks, so n_kept == 0 iff text == "").
      val eRows = j.filter(col("e_kept") > 0)
        .select(col("doc_id"), eL.as(Seq("e_pos", "line")))
        .withColumn("occ", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id"), col("line"))
            .orderBy(col("e_pos"))))
      val bRows = j.filter(col("b_kept") > 0)
        .select(col("doc_id"), bL.as(Seq("b_pos", "line")))
        .withColumn("occ", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id"), col("line"))
            .orderBy(col("b_pos"))))
      val matched = bRows.join(eRows, Seq("doc_id", "line", "occ"))
      val subsetOk = bRows.count() == matched.count()
      val agg = j.agg(
        sum(col("e_kept") - col("b_kept")).cast("double").as("dropped"),
        sum(col("e_kept")).cast("double").as("kept"),
        max((col("e_lines") =!= col("b_lines")).cast("int")).as("mismatch"))
        .collect().head
      val fpOk = agg.getDouble(0) <= math.max(5 * fpp * agg.getDouble(1), 8.0)
      val shapeOk = agg.getInt(2) == 0
      val det = graft.api.DfUtils.dfEq(b1, bloom())
      eng(s).toDF(Seq(Seq(
        if (subsetOk && fpOk && shapeOk && det) 1L else 0L)),
        "bloom_dedup_ok:long")
    }),

    // minhash recall differential: at jaccard >= 0.9, 16-band/128-hash
    // LSH misses a pair with probability (1-j^8)^16 ~ 1e-12 — the banded
    // result must contain EVERY exact pair (computed by the oracle-exact
    // inverted-index algorithm), and verification keeps precision exact
    "d15_minhash_recall" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.9)
        .select("id_a", "id_b").localCheckpoint(true)
      val lsh = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        shingleK = 3, numHashes = 128, bands = 16, threshold = 0.9)
        .select("id_a", "id_b").localCheckpoint(true)
      val missed = exact.join(lsh, Seq("id_a", "id_b"), "left_anti").count()
      val extra = lsh.join(exact, Seq("id_a", "id_b"), "left_anti").count()
      val nExact = exact.count()
      eng(s).toDF(Seq(Seq(nExact,
        if (missed == 0 && extra == 0 && nExact > 0) 1L else 0L)),
        "n_exact:long,recall_ok:long")
    }),

    // cross-corpus dedup join: new batch (doc_id >= 100) vs existing
    // corpus (doc_id < 100), exact 3-gram jaccard — full DuckDB oracle
    "d14_dedup_against" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.ngramJaccardJoin(
        docs.filter(col("doc_id") >= 100), "doc_id", "text",
        docs.filter(col("doc_id") < 100), "doc_id", "text",
        shingleK = 3, threshold = 0.5)
    }),

    // corpus-level exact segment dedup (RefinedWeb-style): 20-token
    // blocks, first occurrence wins corpus-wide, documents reassembled
    "d13_segment_dedup" -> ((s, dir) =>
      Dedup.segmentDedup(t(s, dir, "documents"), "doc_id", "text",
        segmentTokens = 20)),


    // ---- beyond-reference: full dedup pipeline ------------------------
    "d06_dedup_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // shared signature stage: the shingle+minhash pass materializes once
      // per session and is reused by d02 (and any other dedup flavor)
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
      val pairs = Dedup.minhashNearDupPairsFromSigs(sigs, threshold = 0.5)
      Dedup.dropNearDuplicates(docs, "doc_id", pairs).select("doc_id", "lang")
    }))

  val oracles: Map[String, String] = Map(

    "d01_dedup_exact" ->
      """SELECT doc_id, text, lang, source, n_chars FROM (
        | SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        | FROM documents) x WHERE rn = 1""".stripMargin,

    "d04_dedup_ngram" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
        |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        | FROM toks WHERE len(w) >= 3),
        |pairs AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS sa, len(b.s) AS sb
        | FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(inter AS DOUBLE)/(sa+sb-inter) AS jaccard
        |FROM pairs WHERE CAST(inter AS DOUBLE)/(sa+sb-inter) >= 0.5""".stripMargin,

    "d05x_dedup_embed_exact" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4""".stripMargin,

    // differential entries: the Spark side computes LSH-vs-exact recall and
    // emits 1 iff recall ≥ 0.9; the oracle is the constant it must hit
    "d07_embed_lsh_recall" -> "SELECT CAST(1 AS BIGINT) AS recall_ok",

    "d16_bloom_line_dedup" -> "SELECT CAST(1 AS BIGINT) AS bloom_dedup_ok",

    "d08_minhash_precision" -> "SELECT CAST(1 AS BIGINT) AS precision_ok",

    "d09_simhash_exactness" -> "SELECT CAST(1 AS BIGINT) AS exact_ok",

    "d17_containment" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
        |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        | FROM toks WHERE len(w) >= 3),
        |pairs AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS sa
        | FROM sh a JOIN sh b ON a.doc_id <> b.doc_id)
        |SELECT id_a, id_b, CAST(inter AS DOUBLE)/sa AS containment
        |FROM pairs WHERE CAST(inter AS DOUBLE)/sa >= 0.5""".stripMargin,

    "d10_cc_paths_agree" -> "SELECT CAST(1 AS BIGINT) AS cc_ok",

    "d11_dedup_best" -> "SELECT CAST(1 AS BIGINT) AS best_ok",

    // BOUNDED oracle (r9 verdict task 1): the old all-pairs form is O(n²)
    // list-intersects and wedges at sf1.0 (50k docs). This one is
    // prefix-filtered (Chaudhuri SSJoin / Bayardo all-pairs): under a
    // global token order (here rarest-first by corpus frequency, ties by
    // the token itself), any two sets with J >= t=0.9 must share a token
    // within each set's first len - ceil(t*len) + 1 tokens — because
    // J >= t forces |a ∩ b| >= t·|a|, and missing the whole prefix leaves
    // at most ceil(t*len) - 1 shared tokens. Candidates come from the
    // prefix self-join, then EXACT Jaccard verifies each candidate, so
    // the result is provably identical to all-pairs (differentially
    // confirmed vs the quadratic form at sf0.01 and sf0.1).
    // Cost: sf0.01 0.2s, sf0.1 5s, sf1.0 minutes (vs never-finishes).
    "d15_minhash_recall" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
        |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        | FROM toks WHERE len(w) >= 3),
        |ex AS (SELECT doc_id, unnest(s) AS g, len(s) AS n FROM sh),
        |freq AS (SELECT g, count(*) AS f FROM ex GROUP BY g),
        |rk AS (SELECT doc_id, ex.g, n,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY f, ex.g) AS r
        | FROM ex JOIN freq USING (g)),
        |pref AS (SELECT doc_id, g FROM rk
        | WHERE r <= n - CAST(ceil(0.9 * n) AS INT) + 1),
        |cand AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
        | FROM pref a JOIN pref b ON a.g = b.g AND a.doc_id < b.doc_id),
        |pairs AS (
        | SELECT len(list_intersect(x.s, y.s)) AS inter,
        |  len(x.s) AS sa, len(y.s) AS sb
        | FROM cand JOIN sh x ON x.doc_id = cand.ida
        |  JOIN sh y ON y.doc_id = cand.idb)
        |SELECT CAST(count(*) AS BIGINT) AS n_exact, CAST(1 AS BIGINT) AS recall_ok
        |FROM pairs WHERE CAST(inter AS DOUBLE)/(sa+sb-inter) >= 0.9""".stripMargin,

    // COST NOTE (r9 verdict task 6): this oracle is new-batch × corpus
    // shingle intersects — bounded (the new batch is a fixed doc_id slice,
    // not the whole table) but ~10 min of DuckDB at sf1.0 (100 replicated
    // new-batch names × 50k docs). Acceptable once per gate; keep it OUT
    // of any repeated-iteration path (same discipline as the d04/d06/d17/
    // t36 quadratic-oracle exclusion list in the gate scripts).
    "d14_dedup_against" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
        |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        | FROM toks WHERE len(w) >= 3),
        |pairs AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS sa, len(b.s) AS sb
        | FROM sh a JOIN sh b ON a.doc_id >= 100 AND b.doc_id < 100)
        |SELECT id_a, id_b, CAST(inter AS DOUBLE)/(sa+sb-inter) AS jaccard
        |FROM pairs WHERE CAST(inter AS DOUBLE)/(sa+sb-inter) >= 0.5""".stripMargin,

    "d13_segment_dedup" ->
      """WITH base AS (
        | SELECT doc_id,
        |  CASE WHEN length(regexp_replace(text,'\s','','g')) > 0
        |    THEN string_split_regex(trim(text),'\s+')
        |    ELSE [] END AS w
        | FROM documents),
        |c AS (SELECT doc_id, w, CAST(ceil(len(w)/20.0) AS INT) AS m FROM base),
        |segs AS (
        | SELECT doc_id, unnest(generate_series(0, m-1)) AS pos, w
        | FROM c WHERE m > 0),
        |s2 AS (SELECT doc_id, pos,
        |  array_to_string(w[pos*20+1 : pos*20+20],' ') AS seg FROM segs),
        |kept AS (
        | SELECT doc_id, pos, seg FROM (
        |  SELECT doc_id, pos, seg,
        |   row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
        |  FROM s2) x
        | WHERE rn = 1),
        |agg AS (
        | SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS dedup_text,
        |  count(*) AS n_kept
        | FROM kept GROUP BY doc_id)
        |SELECT c.doc_id, coalesce(a.dedup_text, '') AS dedup_text,
        | CAST(c.m AS INTEGER) AS n_segments,
        | CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept
        |FROM c LEFT JOIN agg a ON c.doc_id = a.doc_id""".stripMargin,

    // BOUNDED oracle (r9 verdict task 1): all-pairs levenshtein is 11G
    // comparisons at sf1.0 (150k customers) and never finishes. Deletion-
    // neighborhood blocking is provably lossless for dist <= 1: if
    // lev(a,b) <= 1 then N(a) ∩ N(b) != ∅ where N(s) = {s} ∪ {s minus one
    // char} — equal strings share s itself; a substitution at position i
    // shares both-minus-i; an insert/delete shares the shorter string.
    // Candidates from the key join, then exact levenshtein verifies, so
    // the result is identical to all-pairs (differentially confirmed at
    // sf0.01: 19,500 pairs both forms). Cost: sf1.0 ~6 min (26.9M output
    // pairs — each sf0.1 pair lifts 100x under ScaleUp's verbatim-name
    // replicas), vs never-finishes quadratic.
    "d12_fuzzy_join" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer),
        |keys AS (
        | SELECT c_custkey, c_name, c_name AS k FROM c
        | UNION ALL
        | SELECT c_custkey, c_name,
        |   substr(c_name, 1, CAST(i AS INT) - 1) ||
        |   substr(c_name, CAST(i AS INT) + 1) AS k
        | FROM (SELECT c_custkey, c_name,
        |        unnest(range(1, length(c_name) + 1)) AS i FROM c)),
        |cand AS (
        | SELECT DISTINCT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |   a.c_name AS na, b.c_name AS nb
        | FROM keys a JOIN keys b ON a.k = b.k AND a.c_custkey < b.c_custkey)
        |SELECT id_a, id_b, CAST(levenshtein(na, nb) AS INTEGER) AS dist
        |FROM cand WHERE levenshtein(na, nb) <= 1""".stripMargin,

    // composed dedup-pipeline oracle: exact 3-gram jaccard pairs (the
    // LSH candidate stage finds every >= 0.5 pair on this corpus — recall
    // pinned by d15; verification is exact either way), connected
    // components via recursive min-label reachability, keep each
    // component's min id
    "d06_dedup_pipeline" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
        |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        | FROM toks WHERE len(w) >= 3),
        |pairs AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b
        | FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        | WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |       (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
        |edges AS (
        | SELECT id_a AS u, id_b AS v FROM pairs
        | UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(u, l) AS (
        | SELECT DISTINCT u, u FROM edges
        | UNION
        | SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v),
        |comp AS (SELECT u, min(l) AS rep FROM reach GROUP BY u)
        |SELECT d.doc_id, d.lang FROM documents d LEFT JOIN comp c ON d.doc_id = c.u
        |WHERE c.u IS NULL OR c.rep = d.doc_id""".stripMargin)
}
