package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal operators the DataFrame API lacks as primitives: as-of join and
 * gap-based sessionization. Both compile to single-shuffle window plans —
 * the distributed-systems formulation, not a per-key loop:
 *
 *  - as-of join: union the tagged sides and carry the latest right payload
 *    forward with `last(_, ignoreNulls)` over (key, time) order. No range
 *    explosion, no per-row probe: one exchange on the key, one sort —
 *    at 100 TB this is a plain sort-merge pass. (The alternative — a range
 *    join — explodes candidate pairs before filtering.)
 *  - sessionize: `lag` + running `sum` over the same (key, time) window.
 */
object TemporalOps {

  /**
   * For every left row, attach the payload columns of the latest right row
   * with `right.tsCol <= left.tsCol` within the same `keys` (an ASOF LEFT
   * JOIN). Right payload columns are emitted under their own names —
   * they must not collide with left column names. `tieBreak` orders rows
   * within an equal timestamp (right-before-left is already guaranteed).
   */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == tsCol)
    require(rightPayload.nonEmpty, "right side needs at least one payload column")
    rightPayload.foreach(c => require(!left.columns.contains(c),
      s"right payload column '$c' collides with a left column"))
    val leftCols = left.columns
    val leftPayload = leftCols.filterNot(c => keys.contains(c) || c == tsCol)
    // wire format: keys ++ ts ++ tag ++ left-payload struct ++ right-payload struct
    val lp =
      if (leftPayload.isEmpty) struct(lit(0).as("__none")) // keys+ts-only left
      else struct(leftPayload.map(col).toIndexedSeq: _*)
    val rp = struct(rightPayload.map(col).toIndexedSeq: _*)
    val lpType =
      if (leftPayload.isEmpty)
        new org.apache.spark.sql.types.StructType().add("__none", "int")
      else org.apache.spark.sql.types.StructType(
        leftPayload.map(c => left.schema(left.schema.fieldIndex(c))))
    val rpType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(right.schema.fieldIndex(c))))
    val lTagged = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as("__tag"), lp.as("__lp"),
        lit(null).cast(rpType).as("__rp")) ++
        tieBreak.filter(left.columns.contains).map(col): _*)
    // a right row with a null timestamp can never satisfy right.ts <=
    // left.ts (SQL comparison with null is false) — drop them, or the
    // nulls-first sort would carry their payload to rows with no true
    // predecessor
    val rightValid = right.filter(col(tsCol).isNotNull)
    val rTagged = rightValid.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as("__tag"),
        lit(null).cast(lpType).as("__lp"), rp.as("__rp")) ++
        tieBreak.filter(right.columns.contains).map(col): _*)
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right rows sort before left at equal ts (tag 0 < 1) → `<=` semantics
    val ordering = Seq(col(tsCol).asc, col("__tag").asc) ++
      tieBreak.map(c => col(c).asc_nulls_last)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__last_rp", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    carried.select(
      keys.map(col) ++ Seq(col(tsCol)) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol)
          .map(c => col("__lp").getField(c).as(c)) ++
        rightPayload.map(c => col("__last_rp").getField(c).as(c)): _*)
  }

  /**
   * Gap-based sessionization: appends a `session_id` column (0-based per
   * key) where a new session starts when the gap to the previous event
   * exceeds `gap` (a Spark interval string, e.g. "30 minutes").
   */
  def sessionize(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gap: String,
      tieBreak: Seq[String] = Nil,
      sessionCol: String = "session_id"): DataFrame = {
    val ordering = (col(tsCol).asc +: tieBreak.map(c => col(c).asc)).toIndexedSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    val prevTs = lag(col(tsCol), 1).over(w)
    val newSession = when(prevTs.isNull ||
      col(tsCol) > prevTs + expr(s"INTERVAL $gap"), 1).otherwise(0)
    df.withColumn("__new_s", newSession)
      .withColumn(sessionCol,
        sum(col("__new_s")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("long") - 1)
      .drop("__new_s")
  }
}
