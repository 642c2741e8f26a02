package graft.functions

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Mergeable sketch summaries — the incremental-aggregation pattern for
 * 100 TB pipelines: per-batch (per-day, per-shard) partial sketches are
 * tiny binary columns that union associatively, so corpus-level
 * cardinalities and quantiles update without ever rescanning history.
 *
 * Built on Spark's native DataSketches HLL aggregates
 * (`hll_sketch_agg` / `hll_union_agg`, codegen'd, no UDFs) and the
 * KLL-backed `percentile_approx`. Reference analogue: fugue exposes the
 * engine's aggregate vocabulary (fugue/execution/execution_engine.py:253);
 * sketch aggregates are the scale-path members of that vocabulary.
 */
object Sketches {

  /**
   * Per-group DataSketches HLL partial: a mergeable binary sketch of the
   * distinct `valueCol` population, one row per key. `lgK` trades sketch
   * size for accuracy (relative standard error ≈ 1.04 / √2^lgK — ~1.6%
   * at the default 12). Persist these per ingest batch; they are the
   * only state an incremental distinct-count pipeline needs to keep.
   */
  def hllPartial(df: DataFrame, keys: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll_sketch"))

  /**
   * Merge partial sketches down to per-key cardinality estimates — a
   * pure sketch-space aggregation (register-wise max / coupon-set union),
   * no rescan of the underlying data. The union is ASSOCIATIVE: any
   * grouping of the partials merges to the identical estimate (q73 pins
   * this), so per-shard, per-day, and hierarchical rollups all agree.
   * NOTE the union result is NOT guaranteed byte-equal to a sketch built
   * directly over the whole stream: once a key's population crosses the
   * sparse(coupon)→dense transition, the direct sketch and the union
   * take different promotion paths and their estimates may differ within
   * the error envelope (observed at sf0.1: merged 1488 vs direct
   * 1480–1499 vs exact 1500) — both remain inside the lgK accuracy
   * bound, which is the guarantee that matters.
   */
  def hllMergeEstimate(partials: DataFrame, keys: Seq[String],
      sketchCol: String = "hll_sketch"): DataFrame =
    partials.groupBy(keys.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol), lit(false)))
        .as("estimate"))

  /** Merge partials to per-key MERGED SKETCHES (not estimates) — the
   * intermediate level of a hierarchical rollup (shard → day → corpus):
   * the output is itself a valid partial for further merging. */
  def hllMergePartial(partials: DataFrame, keys: Seq[String],
      sketchCol: String = "hll_sketch"): DataFrame =
    partials.groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col(sketchCol), lit(false)).as(sketchCol))

  /**
   * Per-(partition, key) Misra–Gries partial counters — the mergeable
   * frequent-items (heavy-hitters) summary (Misra & Gries 1982; merge rule
   * from Agarwal et al., "Mergeable Summaries", PODS 2012). One scan,
   * fixed memory: each partition keeps at most `k` counters per key; when
   * a new item overflows the budget every counter drops by the current
   * minimum (the batched decrement), evicting the minima.
   *
   * Output rows per (partition, key):
   *   - one per surviving counter: (keys..., item, mg_weight, 0, 0)
   *   - one summary sentinel:      (keys..., NULL, 0, local_rows, local_decr)
   * where `local_decr` is the EXACT total weight this partition discarded
   * for any single item (the per-item underestimation this partial can
   * contribute). Summing partials is associative, so these rows are safe
   * to persist per ingest batch and re-merge incrementally, exactly like
   * [[hllPartial]].
   *
   * Scale design: the exchange after this map-side pass carries at most
   * `numPartitions × (k+1)` rows per key — never the corpus. Key
   * cardinality is driver-bounded by construction of the caller (domains,
   * languages, shards); `maxKeysPerPartition` raises loudly rather than
   * silently OOMing when the grouping column is mis-chosen.
   */
  def frequentItemsPartial(
      df: DataFrame, keys: Seq[String], valueCol: String, k: Int,
      maxKeysPerPartition: Int = 1 << 16): DataFrame = {
    require(k >= 1 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")
    require(keys.nonEmpty, "at least one key column is required")
    val schema = df.schema
    val keyIdx = keys.map(schema.fieldIndex).toArray
    val vIdx = schema.fieldIndex(valueCol)
    val outSchema = StructType(
      keys.map(schema(_)) :+
        schema(vIdx).copy(name = "item", nullable = true) :+
        StructField("mg_weight", LongType, nullable = false) :+
        StructField("local_rows", LongType, nullable = false) :+
        StructField("local_decr", LongType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      // per-key state: counters + row/decrement accounting
      final class Mg {
        val counters = new java.util.HashMap[Any, Long](k * 2)
        var rows = 0L
        var decr = 0L
      }
      val state = new java.util.HashMap[Seq[Any], Mg]()
      it.foreach { row =>
        val key: Seq[Any] = keyIdx.map(row.get).toSeq
        var mg = state.get(key)
        if (mg == null) {
          require(state.size < maxKeysPerPartition,
            s"more than $maxKeysPerPartition distinct keys in one " +
              "partition — frequent-items keys must be low-cardinality " +
              "(group by domain/shard, not by document)")
          mg = new Mg; state.put(key, mg)
        }
        mg.rows += 1
        val item = row.get(vIdx)
        val cur = mg.counters.get(item)
        if (cur != 0L || mg.counters.containsKey(item)) {
          mg.counters.put(item, cur + 1)
        } else if (mg.counters.size < k) {
          mg.counters.put(item, 1L)
        } else {
          // batched decrement: drop every counter by the minimum, evict
          // zeros; the arriving item's single unit is discarded with them
          var min = Long.MaxValue
          val vit = mg.counters.values().iterator()
          while (vit.hasNext) { val v = vit.next(); if (v < min) min = v }
          val eit = mg.counters.entrySet().iterator()
          while (eit.hasNext) {
            val e = eit.next()
            val nv = e.getValue - min
            if (nv == 0L) eit.remove() else e.setValue(nv)
          }
          mg.decr += min
        }
      }
      state.entrySet().iterator().asScala.flatMap { e =>
        val key = e.getKey; val mg = e.getValue
        val counterRows = mg.counters.entrySet().iterator().asScala.map { c =>
          Row.fromSeq(key ++ Seq(c.getKey, c.getValue, 0L, 0L))
        }
        counterRows ++ Iterator(
          Row.fromSeq(key ++ Seq(null, 0L, mg.rows, mg.decr)))
      }
    }(enc)
  }

  /**
   * Merge Misra–Gries partials to per-key heavy-hitter candidates with
   * deterministic error bounds. For each surviving (key, item):
   * `estimate <= true count <= estimate + err_bound`, and EVERY item whose
   * true count exceeds `err_bound` is guaranteed present (`err_bound` is
   * the summed per-partition discard, itself <= n_rows / (k+1)). The merge
   * is a plain sum — sketch-space only, no rescan — so day-over-day
   * incremental maintenance is a union of partial tables.
   */
  def frequentItems(partials: DataFrame, keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    val totals = partials.filter(col("item").isNull)
      .groupBy(kc: _*)
      .agg(sum("local_rows").as("n_rows"), sum("local_decr").as("err_bound"))
    partials.filter(col("item").isNotNull)
      .groupBy(kc :+ col("item"): _*)
      .agg(sum("mg_weight").as("estimate"))
      .join(totals, keys)
      .select(kc ++ Seq(col("item"), col("estimate"),
        col("err_bound"), col("n_rows")): _*)
  }

  /** One-shot convenience: partial + merge in a single call. */
  def frequentItems(df: DataFrame, keys: Seq[String], valueCol: String,
      k: Int): DataFrame =
    frequentItems(frequentItemsPartial(df, keys, valueCol, k), keys)

  /**
   * Per-group Count–Min sketch partial (Cormode & Muthukrishnan 2005) over
   * Spark's native codegen'd `count_min_sketch` aggregate — point-frequency
   * estimates with the deterministic one-sided guarantee
   * `estimate >= true count` (always) and `estimate <= true + eps * n`
   * with probability `confidence`. The binary sketches are mergeable:
   * same (eps, confidence, seed) sketches merge by counter addition, so a
   * merged sketch is EXACTLY the sketch of the concatenated stream — the
   * same lossless-incremental property q73 pins for HLL.
   *
   * Width/depth are ceil(2/eps) × ceil(-ln(1-confidence)/ln 2) counters of
   * 8 bytes — eps 0.001 / confidence 0.99 is ~2000×7 longs ≈ 110 KB per
   * group: per-day partials for a 100 TB corpus are megabytes of state.
   */
  def cmsPartial(df: DataFrame, keys: Seq[String], valueCol: String,
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count_min_sketch(col(valueCol), lit(eps), lit(confidence),
        lit(seed)).as("cms_sketch"))

  /** Merge serialized CMS partials (must share eps/confidence/seed) into
   * one sketch — counter-wise addition, sketch-space only. */
  def cmsMerge(
      sketches: Iterable[Array[Byte]]): org.apache.spark.util.sketch.CountMinSketch = {
    require(sketches.nonEmpty, "cannot merge zero sketches")
    val it = sketches.iterator
    val acc = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(it.next()))
    while (it.hasNext)
      acc.mergeInPlace(org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(it.next())))
    acc
  }

  /** Probe a string item. Spark's SQL aggregate adds string columns as
   * UTF-8 BYTES (`CountMinSketchAgg` calls `addBinary`), so the probe
   * must hash the same representation — `estimateCount(String)` would
   * hash the Java string and read unrelated counters. */
  def cmsEstimate(cms: org.apache.spark.util.sketch.CountMinSketch,
      item: String): Long =
    cms.estimateCount(item.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /**
   * Corpus-overlap estimation: how much of corpus B's `valueCol`
   * population (URLs, document fingerprints, n-gram hashes) already
   * appears in corpus A — the contamination/coverage diagnostic run
   * BEFORE committing to an expensive exact decontamination join.
   * Inclusion–exclusion over HLL sketches:
   *
   *   |A∩B| ≈ |A| + |B| − |A∪B|,   jaccard ≈ |A∩B| / |A∪B|
   *
   * One row out: (n_a, n_b, n_union, n_intersection, jaccard).
   *
   * Scale shape: ONE union + ONE aggregation building all three sketches
   * in a single pass (each side feeds its own sketch via a null-routing
   * CASE; nulls are skipped by the aggregate) — no join, no distinct, no
   * second scan; the exchange carries three lgK-sized sketch partials
   * per task. The intersection inherits ~3× the single-sketch RSE
   * (error of three estimates), amplified when |A∩B| ≪ |A∪B| — for
   * overlap fractions below ~1% use the exact path
   * ([[Dedup.decontaminate]]-style anti-join) instead; this operator's
   * job is the cheap first look.
   */
  def overlapEstimate(dfA: DataFrame, dfB: DataFrame, valueCol: String,
      lgK: Int = 12): DataFrame = {
    val tagged = dfA.select(col(valueCol).as("__v"), lit("a").as("__side"))
      .unionByName(dfB.select(col(valueCol).as("__v"), lit("b").as("__side")))
    tagged
      .agg(
        hll_sketch_estimate(hll_sketch_agg(
          when(col("__side") === "a", col("__v")), lit(lgK))).as("n_a"),
        hll_sketch_estimate(hll_sketch_agg(
          when(col("__side") === "b", col("__v")), lit(lgK))).as("n_b"),
        hll_sketch_estimate(hll_sketch_agg(col("__v"), lit(lgK))).as("n_union"))
      .select(col("n_a"), col("n_b"), col("n_union"),
        greatest(lit(0L), col("n_a") + col("n_b") - col("n_union"))
          .as("n_intersection"))
      .withColumn("jaccard",
        when(col("n_union") > 0,
          col("n_intersection").cast("double") / col("n_union"))
          .otherwise(lit(0.0)))
  }
}
