package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Per-group outlier detection and clamping over a numeric column — the
 * distribution-gate a 100 TB curation pipeline runs on signals like
 * document length, token count or quality score before thresholding.
 *
 * Scale design: every method is group-stats (one groupBy aggregation with
 * map-side partials, #groups result rows) + a join back on the group
 * keys — never a window over the raw rows, so no per-group sort and no
 * single-partition pressure; AQE broadcasts the stats side when #groups
 * is small. Mean/stddev bridge through decimal(28,6) sums and are
 * emitted at a declared 9-digit precision, so flags are independent of
 * partition order and reproducible on any engine.
 */
object Outliers {

  /** Join the per-group stats back onto the rows. NULL-SAFE on the group
   * keys: groupBy emits a stats row for the null group, and a plain
   * equi-join would drop every null-keyed input row (null = null is
   * false) — a gate must never silently delete records. */
  private def statsJoin(df: DataFrame, groupCols: Seq[String],
      stats: DataFrame): DataFrame =
    if (groupCols.isEmpty) df.crossJoin(broadcast(stats)) // global stats: 1 row
    else {
      val renamed = groupCols.foldLeft(stats)((s, k) =>
        s.withColumnRenamed(k, s"__k_$k"))
      val cond = groupCols.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _)
      df.join(renamed, cond, "left")
        .drop(groupCols.map(k => s"__k_$k"): _*)
    }

  /**
   * Classic z-score flags: adds `zscore` (rounded to 6 digits) and
   * `is_outlier` (|z| > threshold). Groups with zero variance (or a
   * single row) get zscore 0 and no outliers; rows whose value is null
   * keep a null zscore but are NEVER flagged (`is_outlier` is false, not
   * null — three-valued logic must not make them vanish from both sides
   * of a filter).
   */
  def zscoreOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      threshold: Double = 3.0): DataFrame = {
    require(threshold > 0, "threshold must be > 0")
    val v = col(valueCol)
    val statsAgg = Seq(
      Moments.decimalMean(v).as("__mean"),
      Moments.decimalPopStddev(v).as("__std"))
    val stats =
      if (groupCols.isEmpty) df.agg(statsAgg.head, statsAgg.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(statsAgg.head, statsAgg.tail: _*)
    statsJoin(df, groupCols, stats)
      .withColumn("zscore",
        when(col("__std") > 0, round((v - col("__mean")) / col("__std"), 6))
          .otherwise(when(v.isNotNull, lit(0.0))))
      .withColumn("is_outlier", coalesce(abs(col("zscore")) > threshold, lit(false)))
      .drop("__mean", "__std")
  }

  /**
   * Median-absolute-deviation flags — robust to the very outliers being
   * hunted (one huge document cannot drag the gate the way it drags a
   * mean). Two stats passes (median, then MAD of |x − median|), still
   * zero windows. `modified z` = 0.6745·(x − median)/MAD (Iglewicz–
   * Hoaglin); MAD 0 (>50% identical values) flags nothing.
   */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      threshold: Double = 3.5): DataFrame = {
    require(threshold > 0, "threshold must be > 0")
    val v = col(valueCol)
    val med =
      if (groupCols.isEmpty) df.agg(percentile(v, lit(0.5)).as("__med"))
      else df.groupBy(groupCols.map(col): _*).agg(percentile(v, lit(0.5)).as("__med"))
    val withMed = statsJoin(df, groupCols, med)
    val mad =
      if (groupCols.isEmpty)
        withMed.agg(percentile(abs(v - col("__med")), lit(0.5)).as("__mad"))
      else withMed.groupBy(groupCols.map(col): _*)
        .agg(percentile(abs(v - col("__med")), lit(0.5)).as("__mad"))
    statsJoin(withMed, groupCols, mad)
      .withColumn("modified_z",
        when(col("__mad") > 0,
          round(lit(0.6745) * (v - col("__med")) / col("__mad"), 6))
          .otherwise(when(v.isNotNull, lit(0.0))))
      .withColumn("is_outlier",
        coalesce(abs(col("modified_z")) > threshold, lit(false)))
      .drop("__med", "__mad")
  }

  /**
   * Tukey-fence (IQR) flags: outside [q1 − k·iqr, q3 + k·iqr]. Exact
   * linear-interpolated quartiles by default; pass `approx = true` to
   * use approx_percentile partials at extreme scale (exact percentile
   * collects per-group value multisets into the aggregation state).
   */
  def iqrOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Double = 1.5, approx: Boolean = false): DataFrame = {
    require(k > 0, "k must be > 0")
    val v = col(valueCol)
    def pct(p: Double) =
      if (approx) approx_percentile(v, lit(p), lit(10000)).cast("double")
      else percentile(v, lit(p))
    val statsAgg = Seq(pct(0.25).as("__q1"), pct(0.75).as("__q3"))
    val stats =
      if (groupCols.isEmpty) df.agg(statsAgg.head, statsAgg.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(statsAgg.head, statsAgg.tail: _*)
    statsJoin(df, groupCols, stats)
      .withColumn("lower_fence", col("__q1") - lit(k) * (col("__q3") - col("__q1")))
      .withColumn("upper_fence", col("__q3") + lit(k) * (col("__q3") - col("__q1")))
      .withColumn("is_outlier",
        coalesce(v < col("lower_fence") || v > col("upper_fence"), lit(false)))
      .drop("__q1", "__q3")
  }

  /**
   * Winsorize: clamp `valueCol` into its per-group [lo, hi] quantile
   * range (new column `<valueCol>_winsorized`). The standard tail-taming
   * transform before averaging heavy-tailed signals.
   */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double = 0.01, hi: Double = 0.99, approx: Boolean = false): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, "need 0 <= lo < hi <= 1")
    val v = col(valueCol)
    def pct(p: Double) =
      if (approx) approx_percentile(v, lit(p), lit(10000)).cast("double")
      else percentile(v, lit(p))
    val statsAgg = Seq(pct(lo).as("__lo"), pct(hi).as("__hi"))
    val stats =
      if (groupCols.isEmpty) df.agg(statsAgg.head, statsAgg.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(statsAgg.head, statsAgg.tail: _*)
    statsJoin(df, groupCols, stats)
      .withColumn(s"${valueCol}_winsorized",
        least(greatest(v.cast("double"), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }
}
