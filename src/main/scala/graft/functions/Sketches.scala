package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
   * pure sketch-space aggregation (register-wise max), no rescan of the
   * underlying data. Union with the same lgK is lossless: merging
   * per-shard partials yields the identical estimate to sketching the
   * whole stream directly (q73 pins this).
   */
  def hllMergeEstimate(partials: DataFrame, keys: Seq[String],
      sketchCol: String = "hll_sketch"): DataFrame =
    partials.groupBy(keys.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol), lit(false)))
        .as("estimate"))
}
