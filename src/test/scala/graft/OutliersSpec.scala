package graft

import graft.functions.Outliers
import org.apache.spark.sql.functions._

class OutliersSpec extends SparkTestBase {
  import spark.implicits._

  // group a: tight cluster + one huge point; group b: zero variance
  private lazy val df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 11.0), ("a", 3L, 9.0), ("a", 4L, 10.0),
    ("a", 5L, 12.0), ("a", 6L, 8.0), ("a", 7L, 10.0), ("a", 8L, 1000.0),
    ("b", 9L, 5.0), ("b", 10L, 5.0), ("b", 11L, 5.0))
    .toDF("grp", "id", "v")

  test("zscoreOutliers flags the spike; zero-variance group flags nothing") {
    val out = Outliers.zscoreOutliers(df, Seq("grp"), "v", threshold = 2.0)
      .select("grp", "id", "zscore", "is_outlier").collect()
      .map(r => r.getLong(1) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(out(8L)._2, "the 1000.0 spike must be flagged")
    assert((1L to 7L).forall(i => !out(i)._2), "cluster rows must pass")
    assert((9L to 11L).forall(i => out(i) == ((0.0, false))),
      "zero-variance group gets z=0, no outliers")
    // z-scores sum to ~0 within a group (mean-centering sanity)
    val zsum = (1L to 8L).map(out(_)._1).sum
    assert(math.abs(zsum) < 1e-3)
  }

  test("madOutliers is robust: spike flagged, cluster untouched even at tight threshold") {
    val out = Outliers.madOutliers(df, Seq("grp"), "v", threshold = 3.5)
      .select("id", "modified_z", "is_outlier").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out(8L)._2)
    assert((1L to 7L).forall(i => !out(i)._2))
    // group a median = 10, MAD = 1 -> modified z of 11.0 is 0.6745
    assert(math.abs(out(2L)._1 - 0.6745) < 1e-9)
    // zero-MAD group: nothing flagged
    assert((9L to 11L).forall(i => out(i) == ((0.0, false))))
  }

  test("iqrOutliers computes Tukey fences; winsorize clamps into quantile range") {
    val a = Outliers.iqrOutliers(df.filter($"grp" === "a"), Seq.empty, "v", k = 1.5)
    val rows = a.select("id", "lower_fence", "upper_fence", "is_outlier").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(rows(8L)._3, "spike outside the upper fence")
    assert((1L to 7L).forall(i => !rows(i)._3))
    // fences identical on every row (single global group)
    assert(rows.values.map(t => (t._1, t._2)).toSet.size === 1)
    val w = Outliers.winsorize(df, Seq("grp"), "v", lo = 0.0, hi = 0.75)
      .select("id", "v_winsorized").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(8L) < 1000.0, "upper tail clamped")
    assert(w(1L) === 10.0, "interior values unchanged")
    intercept[IllegalArgumentException] {
      Outliers.winsorize(df, Seq("grp"), "v", lo = 0.9, hi = 0.1)
    }
    intercept[IllegalArgumentException] {
      Outliers.zscoreOutliers(df, Seq("grp"), "v", threshold = 0.0)
    }
  }

  test("null group keys and null values survive the gate unflagged") {
    val d = Seq(
      (Some("a"), 1L, Some(10.0)), (Some("a"), 2L, Some(11.0)),
      (Some("a"), 3L, Some(12.0)), (Some("a"), 4L, Some(500.0)),
      (None, 5L, Some(7.0)), (None, 6L, Some(8.0)),   // null-key group
      (Some("a"), 7L, Option.empty[Double]))           // null value
      .toDF("grp", "id", "v")
    for (out <- Seq(
      Outliers.zscoreOutliers(d, Seq("grp"), "v", threshold = 1.2),
      Outliers.madOutliers(d, Seq("grp"), "v"),
      Outliers.iqrOutliers(d, Seq("grp"), "v"),
      Outliers.winsorize(d, Seq("grp"), "v"))) {
      assert(out.count() === 7, "a gate must never delete rows")
    }
    val z = Outliers.zscoreOutliers(d, Seq("grp"), "v", threshold = 1.2)
      .select("id", "zscore", "is_outlier").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getBoolean(2))).toMap
    // null-key rows get their own group's stats, not a's
    assert(!z(5L)._2 && !z(6L)._2)
    assert(z(4L)._2, "spike in group a still flagged")
    // null value: null zscore, is_outlier FALSE (not null) so filters
    // on either polarity keep the row visible
    assert(z(7L) === ((None, false)))
    val kept = Outliers.zscoreOutliers(d, Seq("grp"), "v", threshold = 1.2)
      .filter(!col("is_outlier")).count()
    assert(kept === 6, "!is_outlier must keep null-valued rows")
  }

  test("no window in any plan: group stats join back, never sort-partition") {
    val plans = Seq(
      Outliers.zscoreOutliers(df, Seq("grp"), "v"),
      Outliers.madOutliers(df, Seq("grp"), "v"),
      Outliers.iqrOutliers(df, Seq("grp"), "v"),
      Outliers.winsorize(df, Seq("grp"), "v"))
    plans.foreach { p =>
      val hasWindow = p.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }.nonEmpty
      assert(!hasWindow, "outlier ops must not use windows")
    }
  }
}
