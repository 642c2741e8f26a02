package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * CDC merge/upsert: apply a change feed to a base table — the batch
 * MERGE INTO every ingestion pipeline needs when a corpus is maintained
 * incrementally (crawl refreshes, takedown deletes, metadata fixes).
 *
 * Semantics per key: a change row with `opCol == deleteOp` removes the
 * base row; any other change row REPLACES it (or inserts, for keys new
 * to the base). Keys untouched by the feed pass through. When a key has
 * several change rows, `versionCol` (required in that case) picks the
 * winner: greatest version, ties broken toward the delete so a
 * same-version delete+upsert pair cannot resurrect a row
 * nondeterministically.
 *
 * Scale design: the winner election is a per-key WindowGroupLimit (one
 * candidate per map partition crosses the wire, like every take-per-key
 * in this library); the apply step is one left-anti join of base vs the
 * (small) key set of the feed plus a union with the surviving change
 * rows. A change feed is normally ≪ base, so AQE broadcasts the anti
 * join's right side and the base table never shuffles — the plan a
 * hand-written MERGE would choose.
 */
object Upsert {

  def upsert(
      base: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String = "op", deleteOp: String = "D",
      versionCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val baseCols = base.columns.toSeq
    require(!baseCols.contains(opCol),
      s"base already has a column named '$opCol'")
    keys.foreach(k => require(baseCols.contains(k),
      s"key '$k' missing from base (${baseCols.mkString(", ")})"))
    (keys :+ opCol).foreach(c => require(changes.columns.contains(c),
      s"changes is missing required column '$c'"))
    baseCols.foreach(c => require(changes.columns.contains(c),
      s"changes is missing base column '$c'"))

    val latest = versionCol match {
      case Some(v) =>
        require(changes.columns.contains(v), s"versionCol '$v' missing from changes")
        // greatest version wins; same-version delete beats upsert
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col(v).desc, (col(opCol) === deleteOp).desc)
        changes.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      case None => changes
    }
    val survivors = latest.filter(col(opCol) =!= deleteOp)
      .select(baseCols.map(col): _*)
    val untouched = base.join(
      latest.select(keys.map(col): _*), keys, "left_anti")
    untouched.unionByName(survivors)
  }
}
