package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Snapshot diff: classify every key of two dataset versions as added /
 * removed / changed (optionally unchanged) — the audit step between two
 * runs of a 100 TB pipeline ("what did this rebuild actually touch?"),
 * complementing [[Upsert]] (which applies changes) with the operator
 * that REPORTS them.
 *
 * Scale design: one full-outer shuffle join on the key columns. By
 * default the value columns ride through the join as a struct (needed if
 * the caller wants to see the changed rows); with `hashOnly = true` each
 * side collapses to (keys, 64-bit content hash) BEFORE the join, so the
 * exchange moves 8 bytes of payload per row regardless of row width —
 * the right mode for wide documents. Field names are interleaved into
 * the hash as anchors so a null shifting into the next column cannot
 * alias two different rows (hash(a=null,b="x") ≠ hash(a="x",b=null)).
 */
object Diff {

  /**
   * Returns `keys... , change` where change ∈ added | removed | changed
   * (| unchanged when `includeUnchanged`). `added` = key only in
   * `after`; `removed` = key only in `before`; value comparison is
   * null-safe. Assumes keys are unique per side (snapshot semantics);
   * duplicate keys follow join semantics (a row per pairing) — gate
   * with [[graft.functions.Checks.unique]] when uniqueness is not
   * already guaranteed upstream.
   */
  def snapshotDiff(
      before: DataFrame, after: DataFrame, keys: Seq[String],
      hashOnly: Boolean = false,
      includeUnchanged: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs >= 1 key column")
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"schemas differ: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    val valueCols = before.columns.filterNot(keys.contains).toSeq
    require(valueCols.nonEmpty, "snapshotDiff needs >= 1 non-key column")

    def side(df: DataFrame, tag: String): DataFrame = {
      val payload =
        if (hashOnly)
          xxhash64(valueCols.flatMap(c => Seq(lit(c), col(c))): _*)
        else struct(valueCols.map(col): _*)
      df.select(keys.map(col) :+ payload.as(s"__v_$tag") :+
        lit(1).as(s"__p_$tag"): _*)
    }

    val b = side(before, "b")
    val a = side(after, "a")
    val joined = b.join(a, keys, "full_outer")
    val change = when(col("__p_b").isNull, lit("added"))
      .when(col("__p_a").isNull, lit("removed"))
      .when(!(col("__v_b") <=> col("__v_a")), lit("changed"))
      .otherwise(lit("unchanged"))
    val out = joined.select(keys.map(col) :+ change.as("change"): _*)
    if (includeUnchanged) out else out.filter(col("change") =!= "unchanged")
  }

  /**
   * Diff with the changed rows attached: `keys..., change, before
   * (struct), after (struct)` — `before`/`after` are null for added/
   * removed keys respectively. Ships both row images through the join;
   * use [[snapshotDiff]] with `hashOnly` when only the classification
   * matters.
   */
  def snapshotDiffRows(
      before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiffRows needs >= 1 key column")
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"schemas differ: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    val valueCols = before.columns.filterNot(keys.contains).toSeq
    require(valueCols.nonEmpty, "snapshotDiffRows needs >= 1 non-key column")
    val b = before.select(keys.map(col) :+
      struct(valueCols.map(col): _*).as("before"): _*)
    val a = after.select(keys.map(col) :+
      struct(valueCols.map(col): _*).as("after"): _*)
    b.join(a, keys, "full_outer")
      .withColumn("change",
        when(col("before").isNull, lit("added"))
          .when(col("after").isNull, lit("removed"))
          .when(!(col("before") <=> col("after")), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("change") =!= "unchanged")
      .select(keys.map(col) :+ col("change") :+ col("before") :+ col("after"): _*)
  }
}
