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

  /** `v` with NaN/±Infinity nulled out (comparison against +Inf is false
   * for NaN under Spark's NaN-is-largest ordering, so one predicate
   * covers both): the decimal cast silently maps non-finite values to
   * NULL, so WITHOUT this guard count(v) and the sums would disagree on
   * the row population and one NaN row would skew a whole group's mean. */
  private def finite(v: Column): Column =
    when(abs(v.cast("double")) < Double.PositiveInfinity, v)

  /** Decimal-bridged mean of `v` over its finite values, rounded to 9
   * digits; null when no finite values exist (ANSI mode would otherwise
   * throw on the /0). */
  def decimalMean(v: Column): Column = {
    val x = finite(v)
    when(count(x) > 0,
      round(sum(x.cast("decimal(28,6)")).cast("double") / count(x), 9))
  }

  /** Decimal-bridged population stddev of `v` over its finite values,
   * rounded to 9 digits; null when no finite values exist. */
  def decimalPopStddev(v: Column): Column = {
    val x = finite(v)
    val n = count(x).cast("double")
    val s1 = sum(x.cast("decimal(28,6)")).cast("double")
    val s2 = sum((x * x).cast("decimal(28,6)")).cast("double")
    when(count(x) > 0,
      round(sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), lit(0.0))), 9))
  }
}
