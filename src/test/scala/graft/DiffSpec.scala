package graft

import graft.operators.Diff
import org.apache.spark.sql.functions._

class DiffSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val before = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
    (4L, null.asInstanceOf[String], 40.0), (5L, "e", 50.0))
    .toDF("id", "tag", "v")
  private lazy val after = Seq(
    (1L, "a", 10.0),                      // unchanged
    (2L, "b", 99.0),                      // changed value
    (4L, "d", 40.0),                      // null -> value = changed
    (5L, null.asInstanceOf[String], 50.0), // value -> null = changed
    (6L, "f", 60.0))                      // added; 3 removed
    .toDF("id", "tag", "v")

  private def classify(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.select("id", "change").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("snapshotDiff classifies added/removed/changed with null-safe compare") {
    val got = classify(Diff.snapshotDiff(before, after, Seq("id")))
    assert(got === Map(2L -> "changed", 3L -> "removed", 4L -> "changed",
      5L -> "changed", 6L -> "added"))
    // hashOnly agrees with the struct compare
    val hashed = classify(Diff.snapshotDiff(before, after, Seq("id"), hashOnly = true))
    assert(hashed === got)
    // includeUnchanged surfaces key 1
    val all = classify(Diff.snapshotDiff(before, after, Seq("id"),
      includeUnchanged = true))
    assert(all(1L) === "unchanged" && all.size === 6)
  }

  test("hashOnly: null shifting between columns does not alias rows") {
    val b = Seq((1L, Some("x"), Option.empty[String])).toDF("id", "a", "b")
    val a = Seq((1L, Option.empty[String], Some("x"))).toDF("id", "a", "b")
    val got = classify(Diff.snapshotDiff(b, a, Seq("id"), hashOnly = true))
    assert(got === Map(1L -> "changed"))
    // empty string vs null also distinct
    val b2 = Seq((1L, Some(""))).toDF("id", "a")
    val a2 = Seq((1L, Option.empty[String])).toDF("id", "a")
    assert(classify(Diff.snapshotDiff(b2, a2, Seq("id"), hashOnly = true)) ===
      Map(1L -> "changed"))
  }

  test("snapshotDiffRows carries both row images; guards reject bad input") {
    val rows = Diff.snapshotDiffRows(before, after, Seq("id"))
      .orderBy("id").collect()
    val byId = rows.map(r => r.getLong(0) ->
      (r.getString(1), r.isNullAt(2), r.isNullAt(3))).toMap
    assert(byId(6L) === (("added", true, false)))
    assert(byId(3L) === (("removed", false, true)))
    assert(byId(2L) === (("changed", false, false)))
    val changed2 = rows.find(_.getLong(0) == 2L).get
    assert(changed2.getStruct(2).getDouble(1) === 20.0)
    assert(changed2.getStruct(3).getDouble(1) === 99.0)
    intercept[IllegalArgumentException] {
      Diff.snapshotDiff(before, after.drop("v"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Diff.snapshotDiff(before.select("id"), after.select("id"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Diff.snapshotDiff(before, after, Seq.empty)
    }
  }
}
