package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional data layout: Z-order (Morton-curve) clustering, the
 * `OPTIMIZE ZORDER` pattern for making parquet row-group min/max skipping
 * effective on SEVERAL filter columns at once. A single-column sort gives
 * perfect pruning on one dimension and none on the others; interleaving
 * the rank bits of each dimension gives every dimension locality
 * proportional to 2^(-bits/dims) per output partition, so selective
 * predicates on ANY clustered column skip most of a 100 TB table's files.
 *
 * Scale shape: per-column quantile boundaries are the ONLY driver state
 * (2^bits doubles per column, from `approxQuantile`); ranking and bit
 * interleave are literal-array expressions inside whole-stage codegen (no
 * UDFs), and the placement is one `repartitionByRange` + local sort on
 * the z-value — exactly the cost of a global sort by one column.
 */
object Layout {

  /** Rank of `v` among sorted `bounds` (= #bounds ≤ v) as a BINARY-SEARCH
   * `when` tree: evaluation touches log2(n) comparisons per row, not n —
   * the difference between a layout pass that keeps up with the write and
   * one that dominates it. Nulls take every `otherwise` branch → rank 0. */
  private def searchRank(v: Column, bounds: Array[Double],
      lo: Int, hi: Int): Column =
    if (lo >= hi) lit(lo)
    else {
      val mid = (lo + hi) / 2
      when(v >= lit(bounds(mid)), searchRank(v, bounds, mid + 1, hi))
        .otherwise(searchRank(v, bounds, lo, mid))
    }

  /**
   * Cluster `df` on the Morton curve over `cols` (1–3 numeric columns,
   * `bits` rank bits each): range-partition + locally sort by the
   * interleaved z-value. Content-preserving — same rows, new placement.
   * Write the result with `save`/`write.parquet` to get multi-column
   * data skipping from ordinary parquet statistics.
   */
  def zorderBy(df: DataFrame, cols: Seq[String], bits: Int = 8,
      numPartitions: Option[Int] = None): DataFrame = {
    require(cols.nonEmpty && cols.size <= 3,
      s"zorderBy clusters 1-3 columns, got ${cols.size}")
    require(bits >= 1 && bits * cols.size <= 60,
      s"bits * dims must fit a long, got $bits x ${cols.size}")
    // ONE stats pass for every clustered column (multi-column
    // approxQuantile); boundaries are the only driver state
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    val allBounds = df.stat.approxQuantile(cols.toArray, probs, 0.001)
    val ranks = cols.zip(allBounds).map { case (c, bounds) =>
      if (bounds.isEmpty) lit(0)
      else searchRank(col(c).cast("double"), bounds, 0, bounds.length)
    }
    var z: Column = lit(0L)
    for (i <- 0 until bits; (r, d) <- ranks.zipWithIndex)
      z = z.bitwiseOR(shiftleft(
        shiftright(r, i).bitwiseAND(lit(1)).cast("long"), i * cols.size + d))
    val parts = numPartitions.getOrElse(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    df.withColumn("__zorder", z)
      .repartitionByRange(parts, col("__zorder"))
      .sortWithinPartitions("__zorder")
      .drop("__zorder")
  }
}
