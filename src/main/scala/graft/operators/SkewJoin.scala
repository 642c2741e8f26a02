package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salted join for skewed keys — the manual fallback when AQE's runtime
 * skew-split (spark.sql.adaptive.skewJoin) cannot apply, e.g. when the
 * skewed side feeds an aggregation or the join is not sort-merge.
 *
 * Left (large, skewed) rows get a random salt in [0, factor); right (small
 * or moderate) rows are replicated `factor` times. The join key becomes
 * (keys ++ salt), splitting each hot key into `factor` shuffle partitions.
 * Row multiplicity is preserved exactly — replication is on the build side
 * only and each left row matches exactly one replica.
 *
 * At 100 TB: prefer AQE first; use this for the stubborn 1%-of-keys-is-90%-
 * of-rows corpora (e.g. joining documents to a domain dimension where one
 * domain dominates). `factor` ≈ skewed-key-rows / target-partition-rows.
 */
object SkewJoin {

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      how: String = "inner",
      factor: Int = 16,
      seed: Long = 42L): DataFrame = {
    require(Seq("inner", "left_outer", "left").contains(how.toLowerCase),
      "salted join supports inner/left_outer (right side is replicated)")
    val salted = left.withColumn("__salt",
      (rand(seed) * factor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    val joined = salted.join(replicated, keys :+ "__salt",
      if (how.toLowerCase == "left") "left_outer" else how)
    joined.drop("__salt")
  }

  /**
   * Advisor: map the MEASURED key histogram of the probe side to a salt
   * factor for [[saltedJoin]]. A shuffle join lands every row of one key
   * in one task regardless of `spark.sql.shuffle.partitions`, so the
   * hottest key bounds the largest task: `factor = ceil(max_key_rows /
   * targetRowsPerTask)`, clamped to `[1, maxFactor]`. 1 means "don't
   * salt" — no key exceeds a healthy task, and salting then only adds
   * build-side replication cost. This intentionally keys on max-vs-target
   * rather than a max/avg skew ratio: a UNIFORM histogram of 10M-row keys
   * still produces 10M-row tasks, and salting fixes that too.
   *
   * Cost: one groupBy-count + scalar aggregate over the probe side — a
   * bounded two-stage job whose collect is a single row; run it once and
   * reuse the factor (same discipline as DfUtils.keySkew, which renders
   * the same histogram for humans).
   *
   * At 100 TB: prefer AQE skew-join first; use this when a pipeline
   * PRE-KNOWS its hot keys recur (domain dims, language dims) and wants a
   * deterministic plan. Defaults: 2M rows/task (tens of MB for typical
   * doc rows), cap 256 (past that the build-side blowup dominates).
   */
  def suggestSalt(
      probe: DataFrame,
      keys: Seq[String],
      targetRowsPerTask: Long = 2000000L,
      maxFactor: Int = 256): Int = {
    require(keys.nonEmpty, "suggestSalt needs >= 1 key column")
    require(targetRowsPerTask > 0, "targetRowsPerTask must be positive")
    require(maxFactor >= 1, "maxFactor must be >= 1")
    val row = probe.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head()
    if (row.isNullAt(0)) 1 // empty probe side: nothing to salt
    else {
      val maxN = row.getLong(0)
      val f = (maxN + targetRowsPerTask - 1) / targetRowsPerTask
      math.max(1L, math.min(maxFactor.toLong, f)).toInt
    }
  }
}
