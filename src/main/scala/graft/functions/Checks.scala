package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality validation: a list of constraints is compiled
 * into ONE aggregation pass over the frame, and the result is a report
 * DataFrame `(constraint, column, metric, passed)` — one row per
 * constraint. Mirrors the role the reference ecosystem delegates to
 * validation callers around `transform` (fugue's repo ships a
 * fugueless validation cookbook; the engine itself has no gate), made
 * first-class because a 100 TB ingest without a cheap in-plan gate ships
 * corrupt partitions silently.
 *
 * Scale design:
 *   - every metric is an aggregate with a map-side partial (sum / count /
 *     min / max / count_distinct), so the pass is one shuffle of a single
 *     row per partition — cost is one corpus scan regardless of how many
 *     constraints ride along;
 *   - the report never leaves the plan: the single agg row explodes into
 *     report rows in-plan (no driver collect);
 *   - `uniqueCols`/`distinctCountBetween` use EXACT count_distinct —
 *     each distinct aggregate adds an Expand branch, so at extreme scale
 *     prefer [[Checks.approxDistinctBetween]] (HLL partials, no Expand);
 *   - mean/stddev bridge through decimal(28,6) sums, so metrics are
 *     independent of partition order (FP sum reordering cannot flip a
 *     boundary verdict between runs).
 *
 * Ratio metrics are rounded to 9 decimals on emission — declared
 * precision, same on any engine that recomputes them.
 */
object Checks {

  /** One declarative constraint: `metric` must be an aggregate
   * expression; `passed` maps the computed metric to the verdict. */
  final case class Check(
      name: String,
      column: String,
      metric: Column,
      passed: Column => Column)

  /** num/den at 9 digits, null when the denominator is 0 — under ANSI
   * mode (Spark 4 default) a bare division would THROW on an all-null
   * column instead of reporting the constraint as failed. */
  private def ratio(num: Column, den: Column): Column =
    when(den =!= 0, round(num.cast("double") / den.cast("double"), 9))

  /** Fraction of rows where `c` is non-null ≥ minRatio. */
  def completeness(c: String, minRatio: Double): Check =
    Check(s"completeness>=$minRatio", c,
      ratio(count(col(c)), count(lit(1))),
      m => m >= minRatio)

  /** No null values in `c`. */
  def notNull(c: String): Check =
    Check("not_null", c,
      (count(lit(1)) - count(col(c))).cast("double"),
      m => m === 0.0)

  /** Total row count within [lo, hi]. */
  def rowCountBetween(lo: Long, hi: Long): Check =
    Check(s"row_count[$lo,$hi]", "*",
      count(lit(1)).cast("double"),
      m => m >= lo.toDouble && m <= hi.toDouble)

  /** Non-null tuples of `cols` are pairwise distinct (exact). */
  def unique(cols: String*): Check = {
    require(cols.nonEmpty, "unique needs >= 1 column")
    val allSet = cols.map(col(_).isNotNull).reduce(_ && _)
    // a struct with a null field is itself non-null, so count_distinct
    // would include null-component tuples — null the tuple out instead
    val tuple = if (cols.length == 1) col(cols.head)
      else when(allSet, struct(cols.map(col): _*))
    val nonNull = count(when(allSet, 1))
    Check("unique", cols.mkString(","),
      (nonNull - countDistinct(tuple)).cast("double"),
      m => m === 0.0)
  }

  /** min(c) ≥ lo (vacuously true on all-null). */
  def minValue(c: String, lo: Double): Check =
    Check(s"min>=$lo", c, coalesce(min(col(c)).cast("double"), lit(lo)),
      m => m >= lo)

  /** max(c) ≤ hi (vacuously true on all-null). */
  def maxValue(c: String, hi: Double): Check =
    Check(s"max<=$hi", c, coalesce(max(col(c)).cast("double"), lit(hi)),
      m => m <= hi)

  /** Decimal-bridged mean of `c` in [lo, hi] ([[Moments.decimalMean]]). */
  def meanBetween(c: String, lo: Double, hi: Double): Check =
    Check(s"mean[$lo,$hi]", c, Moments.decimalMean(col(c)),
      m => m >= lo && m <= hi)

  /** Decimal-bridged population stddev of `c` in [lo, hi]
   * ([[Moments.decimalPopStddev]]). */
  def stddevBetween(c: String, lo: Double, hi: Double): Check =
    Check(s"stddev[$lo,$hi]", c, Moments.decimalPopStddev(col(c)),
      m => m >= lo && m <= hi)

  /** Fraction of non-null values of `c` inside `values` ≥ minRatio. */
  def inSet(c: String, values: Seq[Any], minRatio: Double = 1.0): Check =
    Check(s"in_set>=$minRatio", c,
      ratio(count(when(col(c).isin(values: _*), 1)), count(col(c))),
      m => m >= minRatio)

  /** Fraction of non-null values of `c` matching `pattern` ≥ minRatio. */
  def matchesRegex(c: String, pattern: String, minRatio: Double = 1.0): Check =
    Check(s"regex>=$minRatio", c,
      ratio(count(when(col(c).rlike(pattern), 1)), count(col(c))),
      m => m >= minRatio)

  /** Exact distinct count of `c` within [lo, hi]. */
  def distinctCountBetween(c: String, lo: Long, hi: Long): Check =
    Check(s"distinct[$lo,$hi]", c, countDistinct(col(c)).cast("double"),
      m => m >= lo.toDouble && m <= hi.toDouble)

  /** Approximate distinct count of `c` within [lo, hi] — the extreme-
   * scale variant of [[distinctCountBetween]] (HLL partials, no Expand
   * branch; rsd is Spark's relative standard deviation knob). The bounds
   * must already include the ±rsd slack the caller is willing to accept. */
  def approxDistinctBetween(c: String, lo: Long, hi: Long,
      rsd: Double = 0.05): Check =
    Check(s"approx_distinct[$lo,$hi]", c,
      approx_count_distinct(col(c), rsd).cast("double"),
      m => m >= lo.toDouble && m <= hi.toDouble)

  /** Fraction of rows satisfying an arbitrary row predicate ≥ minRatio
   * (deequ's "compliance"): `name` labels the report row. */
  def satisfies(predicate: Column, name: String, minRatio: Double = 1.0): Check =
    Check(s"satisfies($name)>=$minRatio", "*",
      ratio(count(when(predicate, 1)), count(lit(1))),
      m => m >= minRatio)

  /**
   * Parse the dialect rule mini-DSL into checks — one rule per
   * comma-separated entry, fields colon-separated:
   * `not_null:C` · `unique:C1|C2` · `completeness:C:MIN` · `min:C:LO` ·
   * `max:C:HI` · `mean:C:LO:HI` · `stddev:C:LO:HI` ·
   * `in_set:C:A|B|C[:RATIO]` · `distinct:C:LO:HI` ·
   * `approx_distinct:C:LO:HI` · `row_count:LO:HI` ·
   * `regex:C:RATIO:PATTERN` (pattern last so it may contain colons).
   * A literal comma inside a pattern or set value — e.g. the `{2,4}`
   * regex quantifier — is written `\,`; a literal backslash is `\\`
   * (so a pattern ENDING in a backslash cannot swallow the next rule).
   */
  def parseRules(spec: String): Seq[Check] = {
    // char-level tokenizer: '\' escapes exactly ',' or '\'; any other
    // backslash passes through untouched (regex patterns are full of
    // them). A regex lookbehind split cannot distinguish "\," (escaped
    // comma) from "\\," (escaped backslash then separator).
    val rules = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var i = 0
      while (i < spec.length) {
        spec.charAt(i) match {
          case '\\' if i + 1 < spec.length &&
              (spec.charAt(i + 1) == ',' || spec.charAt(i + 1) == '\\') =>
            cur += spec.charAt(i + 1); i += 2
          case ',' => out += cur.toString; cur.clear(); i += 1
          case c => cur += c; i += 1
        }
      }
      out += cur.toString
      out.toSeq
    }.map(_.trim).filter(_.nonEmpty)
    require(rules.nonEmpty, "empty rule spec")
    rules.map { r =>
      val parts = r.split(":")
      def need(n: Int): Unit = require(parts.length >= n,
        s"rule '$r' needs ${n - 1} argument(s)")
      parts(0) match {
        case "not_null" => need(2); notNull(parts(1))
        case "unique" => need(2); unique(parts(1).split("\\|").toSeq: _*)
        case "completeness" => need(3); completeness(parts(1), parts(2).toDouble)
        case "min" => need(3); minValue(parts(1), parts(2).toDouble)
        case "max" => need(3); maxValue(parts(1), parts(2).toDouble)
        case "mean" =>
          need(4); meanBetween(parts(1), parts(2).toDouble, parts(3).toDouble)
        case "stddev" =>
          need(4); stddevBetween(parts(1), parts(2).toDouble, parts(3).toDouble)
        case "in_set" =>
          need(3)
          inSet(parts(1), parts(2).split("\\|").toSeq,
            if (parts.length > 3) parts(3).toDouble else 1.0)
        case "distinct" =>
          need(4); distinctCountBetween(parts(1), parts(2).toLong, parts(3).toLong)
        case "approx_distinct" =>
          need(4)
          approxDistinctBetween(parts(1), parts(2).toLong, parts(3).toLong)
        case "row_count" => need(3); rowCountBetween(parts(1).toLong, parts(2).toLong)
        case "regex" =>
          need(4); matchesRegex(parts(1), r.split(":", 4)(3), parts(2).toDouble)
        case other =>
          throw new IllegalArgumentException(s"unknown rule kind '$other' in '$r'")
      }
    }
  }

  /**
   * Compile `checks` into one aggregation pass and return the report:
   * `(constraint string, column string, metric double, passed boolean)`,
   * one row per check, in the order given.
   */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate needs >= 1 check")
    val aggs = checks.zipWithIndex.map { case (c, i) => c.metric.as(s"__m$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val reportRows = checks.zipWithIndex.map { case (c, i) =>
      val m = col(s"__m$i").cast("double")
      struct(
        lit(c.name).as("constraint"),
        lit(c.column).as("column"),
        m.as("metric"),
        coalesce(c.passed(m), lit(false)).as("passed"))
    }
    one.select(explode(array(reportRows: _*)).as("r"))
      .select(col("r.constraint"), col("r.column"), col("r.metric"),
        col("r.passed"))
  }

  /** Convenience gate: throw if any constraint fails; returns `df`
   * unchanged otherwise, so it composes into pipelines. */
  def enforce(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val failed = validate(df, checks).filter(!col("passed"))
      .select("constraint", "column", "metric").collect()
    if (failed.nonEmpty) {
      // metric is null when a ratio's denominator is 0 (e.g. inSet over an
      // all-null column) — the gate must name the constraint, not NPE
      val msg = failed.map(r =>
        s"${r.getString(0)} on ${r.getString(1)} (metric=" +
          s"${if (r.isNullAt(2)) "null" else r.getDouble(2).toString})")
        .mkString("; ")
      throw new IllegalStateException(s"data-quality checks failed: $msg")
    }
    df
  }
}
