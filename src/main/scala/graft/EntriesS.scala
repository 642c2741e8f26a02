package graft

import graft.engine.SparkGraftEngine
import graft.functions.{Dedup, Multimodal, Similarity, Sketches, TextFunctions}
import graft.transform.Transform
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.EntryHelpers._

/** similarity / ANN / retrieval (s*) conformance queries and their DuckDB oracles — split out
 * of SparkEntry by family so the registries stay reviewable (the
 * assembled maps are behavior-identical; entries were moved verbatim).
 * Shared fixtures/loaders live in [[EntryHelpers]]. */
private[graft] object EntriesS {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // ---- beyond-reference: similarity search --------------------------
    "s01_knn_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
        .select("query_id", "rank", "neighbor_id")
    }),

    "s02_knn_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nTables = 16, nBits = 8, probes = 2)
    }),

    // IVF full-probe differential: probing ALL cells must equal brute force
    // exactly (cells partition the corpus), which checks assignment,
    // probing, and scoring end-to-end with a deterministic answer
    "s04_knn_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val cents = Similarity.trainIvfCentroids(emb, "embedding", k = 8,
        iterations = 2, sampleSize = 2000)
      // the quadratic brute-force result feeds dfEq (2 scans), the recall
      // join, and a count — materialize once
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id").localCheckpoint(true)
      val ivfFull = Similarity.ivfTopK(emb, q, "vec_id", "embedding", k = 5,
        cents, nProbe = 8).select("query_id", "neighbor_id")
      // near-uniform embeddings: recall ~ nProbe/k; 6-of-8 is the stable
      // >=0.8 operating point on this data
      val ivfProbe = Similarity.ivfTopK(emb, q, "vec_id", "embedding", k = 5,
        cents, nProbe = 6).select("query_id", "neighbor_id")
      val fullOk = graft.api.DfUtils.dfEq(ivfFull, exact)
      val found = exact.join(ivfProbe, Seq("query_id", "neighbor_id"), "left_semi")
        .count().toDouble
      val probeOk = found / exact.count() >= 0.8
      eng(s).toDF(Seq(Seq(if (fullOk) 1L else 0L, if (probeOk) 1L else 0L)),
        "full_probe_exact:long,probe_recall_ok:long")
    }),

    // IVF-PQ differential: (a) probing every cell with a shortlist
    // covering the corpus reproduces brute force EXACTLY (pins coarse
    // routing + ADC + exact rerank end-to-end); (b) at a modest budget
    // (shortlist = k·refine candidates) recall beats a same-budget
    // RANDOM shortlist's expectation 3× — the scale-portable phrasing
    // (see s05's rationale: i.i.d. embeddings mean absolute recall
    // decays with corpus size, relative-to-random does not).
    "s08_knn_ivfpq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val n = emb.count()
      val cents = Similarity.trainIvfCentroids(emb, "embedding", k = 8,
        iterations = 2, sampleSize = 2000, totalRows = Some(n))
      val books = Similarity.trainPqCodebooks(emb, "embedding",
        numSubspaces = 8, codebookSize = 16, iterations = 6,
        sampleSize = 2000, totalRows = Some(n))
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id").localCheckpoint(true)
      val fullBudget = Similarity.ivfPqTopK(emb, q, "vec_id", "embedding",
        k = 5, cents, books, nProbe = 8,
        refine = ((n - 1) / 5 + 1).toInt)
        .select("query_id", "neighbor_id")
      val fullOk = graft.api.DfUtils.dfEq(fullBudget, exact)
      val pq = Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", k = 5,
        cents, books, nProbe = 8, refine = 4).select("query_id", "neighbor_id")
      val found = exact.join(pq, Seq("query_id", "neighbor_id"), "left_semi")
        .count().toDouble
      val recall = found / exact.count()
      val randomExpect = math.min(1.0, 5.0 * 4 / math.max(1L, n - 1))
      val signalOk = recall >= math.min(0.95, 3.0 * randomExpect)
      eng(s).toDF(Seq(Seq(if (fullOk) 1L else 0L, if (signalOk) 1L else 0L)),
        "full_budget_exact:long,adc_signal_ok:long")
    }),


    // large-x-large ANN join differential: EVERY corpus row is a query
    // (the shape lshTopK's broadcast-queries design cannot serve);
    // recall vs brute force >= 0.9 and full left coverage
    "s09_ann_join" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val exact = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id").localCheckpoint(true)
      val joined = Similarity.annJoin(emb, emb, "vec_id", "embedding", k = 5,
        nTables = 16, nBits = 8, probes = 2, excludeSameId = true)
        .select("query_id", "neighbor_id").localCheckpoint(true)
      val found = exact.join(joined, Seq("query_id", "neighbor_id"), "left_semi")
        .count().toDouble
      val recallOk = found / exact.count() >= 0.9
      val coverageOk = joined.select("query_id").distinct().count() == emb.count()
      eng(s).toDF(Seq(Seq(if (recallOk) 1L else 0L, if (coverageOk) 1L else 0L)),
        "recall_ok:long,coverage_ok:long")
    }),


    // semantic decontamination, FULL oracle: DuckDB recomputes the exact
    // corpus x eval cosine screen with list_cosine_similarity (0.99
    // threshold; self-matches at cosine 1.0, random pairs ~0 — no
    // boundary sensitivity)
    "s10_semantic_decontaminate" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Dedup.semanticDecontaminate(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") % 50 === 0), "embedding", threshold = 0.99)
        .select("vec_id")
    }),


    // hard-negative mining, FULL oracle: DuckDB recomputes the exact
    // different-label top-k with the identical (cosine desc, id asc)
    // tie-break — the d05x precedent shows the cosine doubles agree
    "s11_hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.hardNegatives(emb.filter(col("vec_id") < 50),
        "vec_id", "embedding", "label", k = 3)
        .select(col("query_id"), col("rank").cast("int").as("rank"),
          col("neighbor_id"))
    }),


    // int8 scalar quantization, FULL oracle: the affine code mapping is
    // deterministic double arithmetic ((x−min)/scale positive, so Spark
    // HALF_UP and DuckDB half-away round identically) — DuckDB recomputes
    // every code byte-for-byte via list_transform
    // margin-based bitext mining (Artetxe & Schwenk ratio margin): the
    // even/odd embedding halves play src/tgt corpora; the oracle
    // recomputes both directions' top-4 neighborhoods, the hubness-
    // normalizing denominators and the argmax-margin match per src
    "s15_bitext_margin" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.marginMine(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", k = 4)
    }),


    // the SCALE path of s15: both kNN directions routed through annJoin
    // (LSH-bucketed candidates, NEITHER side broadcast) feeding the same
    // margin arithmetic — the verdict pins approx-vs-exact mined-PAIR
    // agreement on the s15 fixture at the declared ≥0.9 bound (like
    // s03/s05 pin brute-vs-LSH kNN recall); minMargin = -∞ so the
    // comparison covers every src, not just positive-margin ones
    "s15x_margin_approx" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val src = emb.filter(col("vec_id") % 2 === 0)
      val tgt = emb.filter(col("vec_id") % 2 === 1)
      val exact = Similarity.marginMine(src, tgt, "vec_id", "embedding",
        k = 4, minMargin = Double.NegativeInfinity)
        .select("src_id", "tgt_id")
      val approx = Similarity.marginMine(src, tgt, "vec_id", "embedding",
        k = 4, minMargin = Double.NegativeInfinity, approx = true,
        nTables = 16, nBits = 8, probes = 2)
        .select("src_id", "tgt_id")
      val agree = exact.join(approx, Seq("src_id", "tgt_id"), "left_semi")
        .agg(count(lit(1)).as("n_agree"))
      exact.agg(count(lit(1)).as("n_exact")).crossJoin(agree)
        .select(col("n_exact"),
          (col("n_agree").cast("double") / col("n_exact") >= 0.9)
            .cast("bigint").as("pair_agreement_ok"))
    }),


    // hybrid retrieval fusion: BM25 (lexical, over documents.text) and
    // brute-force cosine (dense, over embeddings) top-20 lists fused by
    // reciprocal rank — the calibration-free combiner curation pipelines
    // use for decontamination / hard-negative retrieval. The oracle
    // recomputes BOTH rankings and the fusion from first principles
    "s14_hybrid_rrf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 23 === 0)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ",
            slice(split(trim(lower(col("text"))), "\\s+"), 1, 4)).as("qtext"))
      val lexical = TextFunctions.bm25TopK(docs, "doc_id", "text",
        queries, "query_id", "qtext", topK = 20, scoreDigits = Some(9))
        .select(col("query_id"), col("rank"), col("doc_id"))
      val emb = t(s, dir, "embeddings")
      val dense = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") % 23 === 0), "vec_id", "embedding", k = 20)
        .select(col("query_id"), col("rank"), col("neighbor_id").as("doc_id"))
      Similarity.rrfFuse(Seq(lexical, dense), "query_id", "doc_id", topK = 10)
    }),


    "s13_quantize" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      emb.select(col("vec_id"),
        Similarity.quantizeInt8(col("embedding")).as("q"))
        .select(col("vec_id"), col("q.qmin").as("qmin"),
          col("q.qscale").as("qscale"),
          // CSV projection, not array<int>: the driver's pandas-based
          // canonicalizer cannot sort list-valued columns (r06 gate err)
          concat_ws(",",
            transform(col("q.codes"), c => c.cast("int"))).as("codes"))
    }),


    // distributed PCA invariant differential: one treeAggregate moment
    // pass + driver Jacobi. Floats wobble across layouts, so the pins are
    // the algebraic laws — components orthonormal, eigenvalues
    // descending and ≤ trace, per-axis projection variance ≡ eigenvalue
    // (the defining property), projections centered, and top-1
    // eigenvalue ≥ every coordinate variance (axes are candidate
    // directions, so the optimum cannot do worse)
    "s12_pca" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val k = 4
      val (proj, model) = graft.functions.Pca.fitTransform(
        emb, "vec_id", "embedding", k, "p")
      def dotv(a: Array[Double], b: Array[Double]): Double =
        a.zip(b).map { case (x, y) => x * y }.sum
      val ortho = (0 until k).forall { i =>
        (i until k).forall { j =>
          val want = if (i == j) 1.0 else 0.0
          math.abs(dotv(model.components(i), model.components(j)) - want) < 1e-8
        }
      }
      val descending = model.explainedVariance.sliding(2)
        .forall(w => w.length < 2 || w(0) >= w(1) - 1e-9)
      val bounded = model.explainedVariance.sum <= model.totalVariance + 1e-6
      // per-axis variance of the projections must equal the eigenvalues
      val stats = proj.select(posexplode(col("p")).as(Seq("axis", "x")))
        .groupBy("axis")
        .agg(avg(col("x")).as("m"), var_samp(col("x")).as("v"))
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val centered = (0 until k).forall(a => math.abs(stats(a)._1) < 1e-6)
      val varMatch = (0 until k).forall { a =>
        math.abs(stats(a)._2 - model.explainedVariance(a)) <=
          0.01 * math.max(1e-9, model.explainedVariance(a))
      }
      val coordVar = emb.select(posexplode(col("embedding")).as(Seq("i", "x")))
        .groupBy("i").agg(var_samp(col("x")).as("v"))
        .agg(max(col("v"))).collect()(0).getDouble(0)
      val optimal = model.explainedVariance(0) >= coordVar - 1e-9
      eng(s).toDF(Seq(Seq(
        if (ortho && descending && bounded && centered && varMatch && optimal) 1L
        else 0L)), "pca_ok:long")
    }),


    // differential conformance: LSH top-k recall vs brute force ≥ 0.9
    "s03_knn_lsh_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id")
      val lsh = Similarity.lshTopK(emb, q, "vec_id", "embedding", k = 5,
        nTables = 16, nBits = 8, probes = 2).select("query_id", "neighbor_id")
      val found = exact.join(lsh, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("n_found"))
      exact.agg(count(lit(1)).as("n_exact")).crossJoin(found)
        .select(col("n_exact"),
          (col("n_found").cast("double") / col("n_exact") >= 0.9)
            .cast("bigint").as("recall_ok"))
    }),


    // reduce–shortlist–rescore signal differential: the synthetic
    // embeddings are i.i.d. random (no neighbor structure — the
    // worst case for ANY dimensionality reduction; measured recall@5
    // decays with corpus size: 0.42 at 500 rows, projDim=32,
    // shortlist 10%), so an absolute recall bound is not
    // scale-portable. The conformance instead asserts the projection
    // carries real signal — recall ≥ 3× a same-budget RANDOM
    // shortlist's expectation (= the shortlist fraction) — which
    // holds with wide margin at every sf. Exactness of the pipeline
    // (full shortlist ⇒ identical to brute force; rescored cosines
    // are true cosines) is pinned by FunctionsSpec.
    "s05_knn_projected" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val k = 5
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k)
        .select("query_id", "neighbor_id")
      val proj = Similarity.projectedTopK(emb, q, "vec_id", "embedding", k,
        projDim = 32, overFetch = 10).select("query_id", "neighbor_id")
      val frac = math.min(1.0, (k * 10) / t(s, dir, "embeddings").count().toDouble)
      val found = exact.join(proj, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("n_found"))
      exact.agg(count(lit(1)).as("n_exact")).crossJoin(found)
        .select(col("n_exact"),
          (col("n_found").cast("double") / col("n_exact") >=
            math.min(0.95, 3 * frac)).cast("bigint").as("recall_ok"))
    }),


    // embedding k-means clustering differential: the plan-embedded
    // NearestCells assignment must equal an INDEPENDENT argmax computed
    // through a different code path — centroids exploded to a broadcast
    // k-row frame, per-(row,centroid) DotProduct, per-row min-index argmax
    // (matching the expression's lowest-index tie resolution; both dot
    // loops accumulate ascending, so FP results are bit-identical). Plus
    // coverage laws: every row assigned, clusters within [0, k), >1
    // cluster used (k=8 over 500+ vectors — a collapsed clustering fails)
    "s07_kmeans_cluster" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val k = 8
      val (assigned, cents) = Similarity.clusterEmbeddingsWithCentroids(
        emb, "vec_id", "embedding", k, iterations = 2, sampleSize = 2000)
      val centRows = cents.zipWithIndex.map { case (v, i) =>
        Row(i, v.toSeq)
      }.toSeq
      val centDf = s.createDataFrame(
        s.sparkContext.parallelize(centRows, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("c",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("cv",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType, containsNull = false)))))
      val independent = emb
        .select(col("vec_id"), Similarity.l2normalize(col("embedding")).as("v"))
        .crossJoin(broadcast(centDf))
        .withColumn("score", Similarity.dot(col("v"), col("cv")))
        .groupBy("vec_id")
        .agg(max_by(col("c"), struct(col("score"), -col("c"))).as("cluster"))
      val agree = graft.api.DfUtils.dfEq(
        assigned.select("vec_id", "cluster"),
        independent.select("vec_id", "cluster"))
      val stats = assigned.agg(
        count(lit(1)).as("n"),
        countDistinct(col("cluster")).as("n_clusters"),
        min(col("cluster")).as("mn"), max(col("cluster")).as("mx")).head()
      val lawsOk = stats.getLong(0) == emb.count() &&
        stats.getLong(1) > 1 && stats.getInt(2) >= 0 && stats.getInt(3) < k
      eng(s).toDF(Seq(Seq(if (agree && lawsOk) 1L else 0L)), "cluster_ok:long")
    }),

    // SemDeDup differential: (a) with full probing the cluster-then-dedup
    // composition must EQUAL dedup over the exact all-pairs graph; (b) at
    // the practical nProbe=4, candidate pairs are a subset of exact pairs
    // (precision 1 by construction) with recall >= 0.8
    "s06_semantic_dedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val k = 16
      val cents = Similarity.trainIvfCentroids(emb, "embedding", k)
      val exactPairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.4).select("id_a", "id_b").localCheckpoint(true)
      val semFull = Dedup.semanticDedup(emb, "vec_id", "embedding", 0.4,
        cents, nProbe = k, maxBucketSize = 100000)
      val exactDedup = Dedup.dropNearDuplicates(emb, "vec_id", exactPairs)
      val fullOk = graft.api.DfUtils.dfEq(
        semFull.select("vec_id"), exactDedup.select("vec_id"))
      val p2 = Similarity.ivfCosinePairs(emb, "vec_id", "embedding", 0.4,
        cents, nProbe = 4).select("id_a", "id_b").localCheckpoint(true)
      val subsetOk = p2.join(exactPairs, Seq("id_a", "id_b"), "left_anti").isEmpty
      val nExact = exactPairs.count()
      val nFound = exactPairs.join(p2, Seq("id_a", "id_b"), "left_semi").count()
      val recallOk = nExact == 0 || nFound.toDouble / nExact >= 0.8
      eng(s).toDF(Seq(Seq(
        if (fullOk && subsetOk && recallOk) 1L else 0L)), "sem_ok:long")
    }))

  val oracles: Map[String, String] = Map(

    "s01_knn_brute" ->
      """SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id FROM (
        | SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id) AS rank
        | FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id < 10) q
        | WHERE e.vec_id <> q.vec_id) x WHERE rank <= 5""".stripMargin,

    "s04_knn_ivf" ->
      "SELECT CAST(1 AS BIGINT) AS full_probe_exact, CAST(1 AS BIGINT) AS probe_recall_ok",

    "s03_knn_lsh_recall" ->
      """SELECT CAST(5 * COUNT(*) AS BIGINT) AS n_exact, CAST(1 AS BIGINT) AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "s05_knn_projected" ->
      """SELECT CAST(5 * COUNT(*) AS BIGINT) AS n_exact, CAST(1 AS BIGINT) AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "s06_semantic_dedup" -> "SELECT CAST(1 AS BIGINT) AS sem_ok",

    "s07_kmeans_cluster" -> "SELECT CAST(1 AS BIGINT) AS cluster_ok",

    "s08_knn_ivfpq" ->
      "SELECT CAST(1 AS BIGINT) AS full_budget_exact, CAST(1 AS BIGINT) AS adc_signal_ok",

    "s09_ann_join" ->
      "SELECT CAST(1 AS BIGINT) AS recall_ok, CAST(1 AS BIGINT) AS coverage_ok",

    "s12_pca" -> "SELECT CAST(1 AS BIGINT) AS pca_ok",

    // first-principles margin-mining oracle: full cosine matrix over the
    // halves, top-4 neighborhoods by raw cosine (tie: id), cosines
    // rounded to 7 digits before the decimal-bridged 4-average (the
    // engine's declared precision), margin quantized by the engine's
    // exact IEEE recipe floor(x*1e5 + 0.5)/1e5 (library round()s
    // disagree on .5-boundary doubles), argmax per src
    "s15_bitext_margin" ->
      """WITH a AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        | FROM embeddings WHERE vec_id % 2 = 0),
        |b AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        | FROM embeddings WHERE vec_id % 2 = 1),
        |ab0 AS (SELECT a.vec_id AS qa, b.vec_id AS nb,
        |  round(list_cosine_similarity(a.v, b.v), 7) AS c7,
        |  row_number() OVER (PARTITION BY a.vec_id
        |    ORDER BY list_cosine_similarity(a.v, b.v) DESC,
        |      b.vec_id ASC) AS rk
        | FROM a, b),
        |ab AS (SELECT * FROM ab0 WHERE rk <= 4),
        |ba0 AS (SELECT b.vec_id AS qb, a.vec_id AS na,
        |  round(list_cosine_similarity(b.v, a.v), 7) AS c7,
        |  row_number() OVER (PARTITION BY b.vec_id
        |    ORDER BY list_cosine_similarity(b.v, a.v) DESC,
        |      a.vec_id ASC) AS rk
        | FROM a, b),
        |ba AS (SELECT * FROM ba0 WHERE rk <= 4),
        |aavg AS (SELECT qa,
        |  CAST(sum(CAST(c7 AS DECIMAL(25,10))) AS DOUBLE)/4.0 AS a_avg
        | FROM ab GROUP BY qa),
        |bavg AS (SELECT qb,
        |  CAST(sum(CAST(c7 AS DECIMAL(25,10))) AS DOUBLE)/4.0 AS b_avg
        | FROM ba GROUP BY qb),
        |sc AS (SELECT ab.qa, ab.nb,
        |  floor(ab.c7 / (0.5*(aavg.a_avg + bavg.b_avg)) * 100000.0 + 0.5)
        |    / 100000.0 AS margin
        | FROM ab JOIN aavg USING (qa) JOIN bavg ON ab.nb = bavg.qb)
        |SELECT qa AS src_id, nb AS tgt_id, margin FROM (
        | SELECT *, row_number() OVER (PARTITION BY qa
        |   ORDER BY margin DESC, nb ASC) AS mr FROM sc) z
        |WHERE mr = 1""".stripMargin,

    // the exact side mines one pair per src (minMargin -inf keeps every
    // src); the approx-vs-exact agreement verdict is the engine's to
    // earn — the oracle pins the exact-pair count and the declared bound
    "s15x_margin_approx" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
        | CAST(1 AS BIGINT) AS pair_agreement_ok
        |FROM embeddings WHERE vec_id % 2 = 0""".stripMargin,

    // first-principles hybrid-RRF oracle: recompute the BM25 top-20 (the
    // t35 formulation, k1=1.2 b=0.75, contributions rounded to 9 digits
    // and decimal-summed), the dense cosine top-20 (the s01 formulation,
    // self excluded), then fuse with round(1/(60+rank), 12) summed
    // through decimal(25,12) — the engine's declared determinism bridge
    "s14_hybrid_rrf" ->
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
        |bscored AS (SELECT query_id, doc_id,
        |  CAST(sum(CAST(c AS DECIMAL(25,10))) AS DOUBLE) AS score
        | FROM contrib GROUP BY 1, 2),
        |lexical AS (SELECT query_id, rank, doc_id FROM (
        | SELECT *, row_number() OVER (PARTITION BY query_id
        |   ORDER BY score DESC, doc_id ASC) AS rank
        | FROM bscored) x WHERE rank <= 20),
        |dense AS (SELECT query_id, rank, doc_id FROM (
        | SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
        |      e.vec_id) AS rank
        | FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id % 23 = 0) q
        | WHERE e.vec_id <> q.vec_id) y WHERE rank <= 20),
        |fused AS (SELECT query_id, doc_id,
        |  CAST(sum(CAST(round(1.0/(60 + rank), 12) AS DECIMAL(25,12)))
        |    AS DOUBLE) AS rrf
        | FROM (SELECT * FROM lexical UNION ALL SELECT * FROM dense)
        | GROUP BY 1, 2)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, rrf FROM (
        | SELECT *, row_number() OVER (PARTITION BY query_id
        |   ORDER BY rrf DESC, doc_id ASC) AS rank
        | FROM fused) z WHERE rank <= 10""".stripMargin,

    "s13_quantize" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        | FROM embeddings),
        |q AS (SELECT vec_id, v, list_min(v) AS qmin,
        |  (list_max(v) - list_min(v)) / 255.0 AS qscale FROM e)
        |SELECT vec_id, qmin, qscale,
        | array_to_string(CASE WHEN qscale = 0
        |  THEN list_transform(v, x -> CAST(-128 AS INTEGER))
        |  ELSE list_transform(v,
        |   x -> CAST(round((x - qmin) / qscale) - 128 AS INTEGER)) END,
        |  ',') AS codes
        |FROM q""".stripMargin,

    "s11_hard_negatives" ->
      """WITH sub AS (SELECT * FROM embeddings WHERE vec_id < 50),
        |pairs AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    list_cosine_similarity(a.embedding, b.embedding) AS cosine
        |  FROM sub a JOIN sub b
        |    ON a.vec_id <> b.vec_id AND a.label IS DISTINCT FROM b.label),
        |ranked AS (
        |  SELECT query_id, neighbor_id,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM pairs)
        |SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 3""".stripMargin,

    "s10_semantic_decontaminate" ->
      """SELECT e.vec_id FROM embeddings e
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM embeddings v
        |  WHERE v.vec_id % 50 = 0
        |    AND list_cosine_similarity(e.embedding, v.embedding) >= 0.99)""".stripMargin)
}
