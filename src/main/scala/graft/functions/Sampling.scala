package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stratified sampling / rebalancing for corpus curation — adjusting a
 * training mix (e.g. language or source proportions) without a shuffle:
 * both operators are per-row Bernoulli filters with per-key fractions
 * (Spark `stat.sampleBy` semantics), evaluated in one scan.
 */
object Sampling {

  /** Per-key Bernoulli sample: keep rows of key k with probability
   * `fractions(k)` (missing keys → 0). Deterministic for a fixed seed.
   * The key column is cast to string so the string-keyed fraction map
   * matches non-string key columns (e.g. int source ids) instead of
   * silently sampling nothing. */
  def stratified(
      df: DataFrame, keyCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(col(keyCol).cast("string"), fractions, seed)

  /**
   * Rebalance key groups toward target relative proportions by
   * downsampling only (no replication): the achievable total is limited
   * by the scarcest key (T = min_k n_k / target_k); each key keeps
   * ~T·target_k rows.
   *
   * One count aggregation (small: one row per key) + one sampling scan.
   * Keys absent from `targets` are dropped.
   */
  def rebalance(
      df: DataFrame, keyCol: String,
      targets: Map[String, Double], seed: Long = 42L): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "targets must be positive proportions")
    val total = targets.values.sum
    val norm = targets.map { case (k, v) => k -> v / total }
    // null keys are dropped by sampleBy anyway; count on the same
    // string-cast key the sampler matches against so non-string key
    // columns can't diverge between counting and sampling
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("k")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = norm.filter { case (k, _) => counts.getOrElse(k, 0L) > 0 }
    require(present.nonEmpty, "no target key present in the data")
    val feasibleTotal = present.map { case (k, t) => counts(k) / t }.min
    val fractions = present.map { case (k, t) =>
      k -> math.min(1.0, feasibleTotal * t / counts(k))
    }
    stratified(df, keyCol, fractions, seed)
  }

  /**
   * Deterministic global shuffle: reorder rows by a seeded hash of the key
   * columns — the standard "shuffle the training set" step, reproducible
   * across runs and cluster sizes (the order is a pure function of data +
   * seed, unlike `orderBy(rand(seed))`, whose rand values depend on
   * partition layout). One range-partitioned sort.
   *
   * PRECONDITION: `keyCols` must uniquely identify rows (use the primary
   * id). Equal-hash ties break on the key columns themselves, so the
   * order is total over distinct keys — but rows DUPLICATED on all
   * keyCols have no defined relative order (their other columns are not
   * compared; map-typed payloads make a full-row tie-break impossible in
   * general).
   */
  def deterministicShuffle(
      df: DataFrame, keyCols: Seq[String], seed: Long = 42L): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val h = xxhash64((keyCols.map(col) :+ lit(seed)): _*)
    df.orderBy((h +: keyCols.map(col)): _*)
  }

  /**
   * Domain-mixture sampling plan: given per-row sizes (e.g. token counts),
   * target mixture weights per domain, and a total size budget, compute
   * for every domain the available mass, its target share, and the
   * sampling rate / epoch count that realizes the target:
   *
   *   target_size   = weight / Σweights × budget
   *   sampling_rate = min(1, target/available)  — downsample knob
   *   epochs        = target/available          — >1 means upsample/repeat
   *
   * The "data mixing" planning step of LLM training-set assembly (domain
   * weights à la Pile/LLaMA): feed `sampling_rate` to [[stratified]] for
   * the downsampling domains; `epochs` is the repetition factor for
   * upsampled ones. Domains absent from `weights` get zero targets.
   * Output: (domain, n_rows, available, target_size, sampling_rate,
   * epochs), one row per domain present in the data.
   *
   * Scale: one hash aggregation over (domain) — the plan itself is
   * domain-cardinality-sized. All arithmetic is one division per output
   * value on exact integer sums: order-independent, exact-oracle-safe.
   */
  def mixturePlan(
      df: DataFrame, domainCol: String, sizeCol: org.apache.spark.sql.Column,
      weights: Map[String, Double], budget: Long): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0),
      "weights must be non-negative")
    require(weights.values.sum > 0, "at least one weight must be positive")
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val total = weights.values.sum
    val wexpr = weights.foldLeft(lit(0.0)) { case (rest, (k, v)) =>
      when(col(domainCol) === lit(k), lit(v / total)).otherwise(rest)
    }
    df.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_rows"),
        // coalesce: an all-NULL-size domain must report 0, not NULL (the
        // DuckDB oracle's CASE-guarded sum yields 0 for that case)
        coalesce(sum(sizeCol.cast("long")), lit(0L)).as("available"),
        first(wexpr).as("__w"))
      .select(col("domain"), col("n_rows"), col("available"),
        (col("__w") * budget).as("target_size"),
        when(col("available") > 0,
          least(lit(1.0), col("__w") * budget / col("available")))
          .otherwise(lit(0.0)).as("sampling_rate"),
        when(col("available") > 0, col("__w") * budget / col("available"))
          .otherwise(lit(0.0)).as("epochs"))
  }

  /**
   * Group-aware train/validation/test split: every row of a GROUP lands
   * in the same split, so correlated rows (near-duplicate components,
   * documents of one source domain, a user's events) never straddle the
   * train/eval boundary — the standard leakage guard when splitting
   * deduplicated training data (pair with
   * [[Dedup.nearDupComponents]]'s `component` column as the group key).
   *
   * Assignment is a pure function of (group value, seed): the group's
   * seeded hash buckets into 1e6 cells, and cumulative weight ranges
   * claim cells — so splits are deterministic across runs, cluster
   * sizes, and partitionings, and ADDING rows to a group never moves the
   * group. Weights are normalized; they need not sum to 1.
   *
   * Output: the input plus a `split` column with the name of the
   * assigned split. Narrow (one projection, no shuffle, no action);
   * realized proportions converge to the weights at the number of
   * GROUPS, not rows (a heavy group moves its whole mass together —
   * that is the point).
   */
  def splitByGroup(
      df: DataFrame, groupCol: String,
      weights: Seq[(String, Double)], seed: Long = 42L): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    require(weights.map(_._1).distinct.size == weights.size,
      "split names must be distinct")
    val total = weights.map(_._2).sum
    val cells = 1000000L
    // cumulative upper cell bound per split, last bound pinned to the cap
    // so FP rounding can never leave a cell unclaimed
    val bounds = weights.inits.toSeq.reverse.tail
      .map(ws => ws.last._1 -> (ws.map(_._2).sum / total * cells).toLong)
    val cell = pmod(xxhash64(col(groupCol), lit(seed)), lit(cells))
    val assign = bounds.init.foldRight(
      lit(bounds.last._1)) { case ((name, ub), rest) =>
      when(cell < ub, lit(name)).otherwise(rest)
    }
    df.withColumn("split", assign)
  }

  /**
   * Budget-bounded corpus selection: rank rows by `rankCol` (descending
   * by default — highest quality first), walk the ranking accumulating
   * `sizeCol` (token counts), and keep exactly the prefix whose running
   * total stays within `budget` — the "take the best N tokens" step of
   * training-set assembly (quality-ranked selection under a token
   * budget, the per-corpus complement of [[mixturePlan]]'s cross-domain
   * split).
   *
   * Output: the input columns plus `cumCol` — the INCLUSIVE running
   * total in rank order, so `max(cumCol) ≤ budget` is checkable
   * downstream and the selection is reproducible as a plain SQL window
   * (`sum(size) OVER (ORDER BY rank DESC, id)` ≤ budget).
   *
   * Scale shape: this is [[graft.api.DfUtils.runningTotal]] — a
   * range-partitioned sort with per-partition offsets cumulated on the
   * driver (one row per partition), NEVER a single-partition global
   * window; the filter on the running total is a narrow map after it.
   *
   * PRECONDITION: `idCols` must break rank ties totally (use the
   * primary id); `sizeCol` must be integral (exact long totals);
   * `rankCol` must be numeric. Rows with a NULL rank are EXCLUDED (an
   * unscored document is not selectable — and Spark's nulls-first
   * ascending sort would otherwise award null-quality rows the budget
   * first, the opposite of the SQL twin's NULLS LAST).
   */
  def selectByBudget(
      df: DataFrame, sizeCol: org.apache.spark.sql.Column, rankCol: String,
      idCols: Seq[String], budget: Long, descending: Boolean = true,
      cumCol: String = "cum_size"): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    require(idCols.nonEmpty, "idCols must totally order rank ties")
    require(!df.columns.contains("__rank_ord"),
      "input column collides with internal name __rank_ord")
    val rankType = df.schema(rankCol).dataType
    require(rankType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"rank column '$rankCol' must be numeric, got ${rankType.catalogString}")
    // negate IN THE NATIVE TYPE for descending (runningTotal's range sort
    // is ascending-only): a double cast here would merge distinct long
    // ranks above 2^53 and silently change the selection
    val ord = if (descending) negate(col(rankCol)) else col(rankCol)
    val staged = df.filter(col(rankCol).isNotNull)
      .withColumn("__rank_ord", ord)
    val cum = graft.api.DfUtils.runningTotal(
      staged, "__rank_ord" +: idCols, sizeCol, cumCol)
    // exclusive prefix + own size = inclusive total; keep while it fits
    cum.withColumn(cumCol, col(cumCol) + coalesce(sizeCol.cast("long"), lit(0L)))
      .filter(col(cumCol) <= budget)
      .drop("__rank_ord")
  }

  /**
   * Weighted sample WITHOUT replacement: `n` rows per key group (all
   * rows one group when `keyCols` is empty), inclusion probability
   * proportional to `weightCol` — Efraimidis–Spirakis exponential keys:
   * each row draws priority ln(u)/w for a per-row uniform u, and the
   * top-n priorities are exactly a w-weighted sample without
   * replacement. The uniform is a seeded hash of `idCols` (a pure
   * function of data + seed, NOT partition layout), so the sample is
   * reproducible across runs and cluster sizes given unique ids.
   * Rows with null or non-positive weight are dropped.
   *
   * Scale shape: per-key path is one window top-n (WindowGroupLimit
   * prunes before the exchange); the global path is sort-limit
   * (TakeOrderedAndProject — distributed partial top-n, never a
   * single-partition window).
   */
  def weightedTake(
      df: DataFrame, keyCols: Seq[String], idCols: Seq[String],
      weightCol: String, n: Int, seed: Long = 42L): DataFrame = {
    require(n > 0, "n must be positive")
    require(idCols.nonEmpty, "idCols must identify rows for the seeded draw")
    // u in (0, 1): top 53 bits of the hash, offset half a ulp from 0 so
    // ln(u) is always finite
    val u = (shiftrightunsigned(
      xxhash64((idCols.map(col) :+ lit(seed)): _*), 11).cast("double") + 0.5) /
      9007199254740992.0
    val pri = log(u) / col(weightCol).cast("double")
    val base = df.filter(col(weightCol).isNotNull &&
      col(weightCol).cast("double") > 0).withColumn("__wpri", pri)
    val picked =
      if (keyCols.isEmpty) base.orderBy(col("__wpri").desc).limit(n)
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)
          .orderBy((col("__wpri").desc +: idCols.map(col(_).asc)): _*)
        base.withColumn("__wrn", row_number().over(w))
          .filter(col("__wrn") <= n).drop("__wrn")
      }
    picked.drop("__wpri")
  }

  /**
   * Rank (quantile) normalization of a score column: each row gets its
   * empirical quantile `(rank − 0.5) / n` (the Hazen plotting position,
   * ranks 1..n in `(valueCol, tieBreakCols...)` order) — the standard
   * way to make scores from DIFFERENT models comparable before mixing
   * them (an LM cross-entropy and a classifier logit both become uniform
   * [0,1] positions; average or threshold them meaningfully). Ties order
   * deterministically by the tie-break columns, which must complete a
   * total order (use a unique id last). NULL values sort FIRST (Spark's
   * ascending null ordering), so null-scored rows deterministically take
   * the lowest quantiles (the highest under `descending`) — filter them
   * beforehand if "no score" must not mean "worst score".
   *
   * Scale: the rank is [[graft.api.DfUtils.runningTotal]]'s distributed
   * prefix sum — range partition + local cumsum + driver-cumulated
   * partition bases, NEVER a single-partition global window; n comes
   * from the same materialized stage (no second count scan). One extra
   * column of doubles, nothing else moves.
   */
  def rankNormalize(
      df: DataFrame, valueCol: String, tieBreakCols: Seq[String],
      outCol: String = "quantile", descending: Boolean = false): DataFrame = {
    require(tieBreakCols.nonEmpty,
      "rankNormalize needs >= 1 tie-break column completing a total order")
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists")
    require(!df.columns.contains("__rank_neg"),
      "input column collides with internal name '__rank_neg'")
    // descending ranks over (value DESC, tieBreaks ASC) — a negated value
    // column keeps the prefix sum ascending while preserving the DECLARED
    // tie-break direction (1 − q_asc would silently reverse ties too)
    val staged =
      if (descending) df.withColumn("__rank_neg", negate(col(valueCol)))
      else df
    val orderCols =
      (if (descending) "__rank_neg" else valueCol) +: tieBreakCols
    val (indexed, n) = graft.api.DfUtils.runningTotalWithSum(
      staged, orderCols, lit(1L), "__rank_idx")
    val nn = math.max(n, 1L).toDouble
    indexed
      .withColumn(outCol, (col("__rank_idx").cast("double") + 0.5) / lit(nn))
      .drop("__rank_idx", "__rank_neg")
  }
}
