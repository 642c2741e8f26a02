package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The decimal-bridged moment aggregates shared by [[Checks]] (mean/stddev
 * constraints) and [[Outliers]] (z-score gate): sums bridge through
 * decimal(28,6) so the result is independent of partition order, and both
 * emit at a declared 9-digit precision. ONE definition — these formulas
 * are oracled bit-for-bit by DuckDB (q89/q90), so the two call sites must
 * never drift apart.
 */
private[graft] object Moments {

  /** Decimal-bridged mean of `v`, rounded to 9 digits; null when no
   * non-null values exist (ANSI mode would otherwise throw on the /0). */
  def decimalMean(v: Column): Column =
    when(count(v) > 0,
      round(sum(v.cast("decimal(28,6)")).cast("double") / count(v), 9))

  /** Decimal-bridged population stddev of `v`, rounded to 9 digits; null
   * when no non-null values exist. */
  def decimalPopStddev(v: Column): Column = {
    val n = count(v).cast("double")
    val s1 = sum(v.cast("decimal(28,6)")).cast("double")
    val s2 = sum((v * v).cast("decimal(28,6)")).cast("double")
    when(count(v) > 0,
      round(sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), lit(0.0))), 9))
  }
}
