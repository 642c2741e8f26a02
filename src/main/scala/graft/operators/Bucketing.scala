package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table helpers — the shuffle-free co-located join path.
 *
 * Writing both fact tables bucketed by the join key with the same bucket
 * count lets every subsequent equi-join/aggregation on that key skip the
 * exchange entirely (Catalyst sees compatible `HashPartitioning` from the
 * scan). At 100 TB this converts the dominant per-query cost (a full
 * shuffle of the fact table) into a one-time write-side cost — the single
 * biggest lever for repeated joins on a stable key (e.g. joining lineitem
 * to orders by orderkey in every pipeline run).
 */
object Bucketing {

  /** Save as a bucketed (+ optionally sorted) managed table. */
  def saveBucketed(
      df: DataFrame,
      table: String,
      bucketBy: Seq[String],
      numBuckets: Int,
      sortBy: Seq[String] = Nil,
      format: String = "parquet",
      mode: String = "overwrite"): Unit = {
    var w = df.write.format(format).mode(mode)
      .bucketBy(numBuckets, bucketBy.head, bucketBy.tail: _*)
    if (sortBy.nonEmpty) w = w.sortBy(sortBy.head, sortBy.tail: _*)
    w.saveAsTable(table)
  }

  /** True when the physical plan of `df` contains no shuffle exchange —
   * the co-location check for bucketed joins (broadcast exchanges are not
   * shuffles and don't count). Scans the explain text because under AQE the
   * root AdaptiveSparkPlanExec is a leaf node that hides the real plan from
   * tree traversal. */
  def isShuffleFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    // ShuffleExchangeExec prints as the bare word "Exchange";
    // BroadcastExchange/ReusedExchange are different tokens
    !"""(?<![A-Za-z])Exchange(?![A-Za-z])""".r.findFirstIn(plan).isDefined
  }
}
