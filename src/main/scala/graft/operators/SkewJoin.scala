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
}
