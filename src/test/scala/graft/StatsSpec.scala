package graft

import graft.functions.Stats
import org.apache.spark.sql.functions._

class StatsSpec extends SparkTestBase {
  import spark.implicits._

  test("histogram: equi-width buckets, max in last bucket, empty buckets kept") {
    val d = Seq(0.0, 1.0, 2.5, 4.9, 5.0, 5.0, 9.9, 10.0).toDF("v")
    val h = Stats.histogram(d, "v", 4).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(h.length === 4)
    assert(h.map(_._1).toSeq === Seq(0, 1, 2, 3))
    // width 2.5 over [0,10]: [0,2.5)->2, [2.5,5)->2, [5,7.5)->2, [7.5,10]->2
    assert(h.map(_._4).toSeq === Seq(2, 2, 2, 2))
    assert(h.head._2 === 0.0 && h.last._3 === 10.0)
    // empty bucket: single point far away
    val d2 = Seq(0.0, 0.5, 10.0).toDF("v")
    val h2 = Stats.histogram(d2, "v", 5).collect().map(r => r.getLong(3))
    assert(h2.toSeq === Seq(2L, 0L, 0L, 0L, 1L))
    // degenerate domain: one bucket carrying every non-null row
    val h3 = Stats.histogram(Seq(7.0, 7.0).toDF("v"), "v", 10).collect()
    assert(h3.length === 1 && h3.head.getLong(3) === 2L)
    intercept[IllegalArgumentException] { Stats.histogram(d, "v", 0) }
    // NaN and ±Inf excluded like null — neither may become max()/poison
    // the width (an Inf width would crash the ANSI bucket cast)
    val withNan = Seq(1.0, 2.0, 3.0, Double.NaN,
      Double.PositiveInfinity, Double.NegativeInfinity).toDF("v")
    val hn = Stats.histogram(withNan, "v", 2).collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(hn.map(_._3).sum === 3L)
    assert(hn.forall(t => !t._1.isNaN && !t._2.isNaN &&
      !t._1.isInfinite && !t._2.isInfinite), "bounds stay finite")
  }

  test("correlationMatrix: known correlations in one pass, nulls pairwise-deleted") {
    val d = Seq(
      (1.0, 2.0, -1.0, Some(1.0)),
      (2.0, 4.0, -2.0, Some(2.0)),
      (3.0, 6.0, -3.0, Option.empty[Double]),
      (4.0, 8.0, -4.0, Some(0.0))).toDF("x", "y2", "neg", "part")
    val got = Stats.correlationMatrix(d, Seq("x", "y2", "neg", "part"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(got.size === 6)
    assert(math.abs(got(("x", "y2")) - 1.0) < 1e-9)   // exact linear
    assert(math.abs(got(("x", "neg")) + 1.0) < 1e-9)  // exact inverse
    // pairwise deletion: (x, part) over rows 1,2,4 -> corr of (1,2,4) vs (1,2,0)
    val xs = Seq(1.0, 2.0, 4.0); val ps = Seq(1.0, 2.0, 0.0)
    val n = 3.0
    val expect = (n * xs.zip(ps).map(t => t._1 * t._2).sum - xs.sum * ps.sum) /
      math.sqrt((n * xs.map(a => a * a).sum - xs.sum * xs.sum) *
        (n * ps.map(a => a * a).sum - ps.sum * ps.sum))
    assert(math.abs(got(("x", "part")) - expect) < 1e-6)
    // zero variance -> null corr
    val z = Seq((1.0, 5.0), (2.0, 5.0)).toDF("a", "b")
    val zc = Stats.correlationMatrix(z, Seq("a", "b")).collect().head
    assert(zc.isNullAt(2))
    // one scan only (no distinct aggregates involved)
    val scans = Stats.correlationMatrix(d, Seq("x", "y2", "neg"))
      .queryExecution.optimizedPlan.collect {
        case s: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => s
        case s: org.apache.spark.sql.execution.LogicalRDD => s
      }
    assert(scans.length === 1)
    intercept[IllegalArgumentException] { Stats.correlationMatrix(d, Seq("x")) }
    intercept[IllegalArgumentException] { Stats.correlationMatrix(d, Seq("x", "x")) }
    // NaN and Inf rows pairwise-deleted exactly like nulls (n and sums agree)
    val withNan = Seq((1.0, 2.0), (2.0, 4.0), (Double.NaN, 9.0),
      (Double.PositiveInfinity, 7.0), (4.0, 8.0)).toDF("a", "b")
    val cn = Stats.correlationMatrix(withNan, Seq("a", "b")).collect().head
    assert(math.abs(cn.getDouble(2) - 1.0) < 1e-9,
      "remaining rows are exactly linear once non-finite rows are excluded")
  }

  test("populationStability: zero for identical snapshots, large for a shift") {
    val before = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
    val same = Stats.populationStability(before, before, "v", 10).collect()
    assert(same.length === 10)
    assert(same.map(_.getDouble(5)).forall(p => math.abs(p) < 1e-12),
      "identical snapshots have zero PSI in every bucket")
    assert(same.map(_.getLong(3)).sum === 1000L)
    // shifted population: mass moves to the top buckets → PSI over 0.25
    val after = (1 to 1000).map(i => 50.0 + (i % 50).toDouble).toDF("v")
    val drift = Stats.populationStability(before, after, "v", 10).collect()
    assert(drift.map(_.getDouble(5)).sum > 0.25, "a half-range shift is a red flag")
    // after-values beyond before's range clamp into the edge buckets
    val wide = Seq(-100.0, 500.0).toDF("v")
    val clamped = Stats.populationStability(before, wide, "v", 10).collect()
    assert(clamped.head.getLong(4) === 1L && clamped.last.getLong(4) === 1L)
    assert(clamped.map(_.getLong(4)).sum === 2L)
  }

  test("categoricalDrift: identical mixes zero, appearing/vanishing categories flag") {
    val before = (Seq.fill(60)("en") ++ Seq.fill(30)("fr") ++ Seq.fill(10)("de"))
      .toDF("lang")
    val same = Stats.categoricalDrift(before, before, "lang").collect()
    assert(same.length === 3)
    assert(same.forall(r => math.abs(r.getDouble(3)) < 1e-12))
    // "de" vanishes, "ja" appears: both contribute positive PSI; union
    // of categories is reported
    val after = (Seq.fill(50)("en") ++ Seq.fill(30)("fr") ++ Seq.fill(20)("ja"))
      .toDF("lang")
    val drift = Stats.categoricalDrift(before, after, "lang").collect()
    assert(drift.map(_.getString(0)).sorted.toSeq === Seq("de", "en", "fr", "ja"))
    val byCat = drift.map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(byCat("de") > 0 && byCat("ja") > 0)
    assert(drift.map(_.getDouble(3)).sum > 0.25, "category churn flags")
    // null is a REAL category, reported as a genuine NULL (a string
    // sentinel could collide with a real category value)
    val withNull = Seq("en", "en", null).toDF("lang")
    val n = Stats.categoricalDrift(before, withNull, "lang").collect()
    assert(n.exists(r => r.isNullAt(0) && r.getLong(2) === 1L))
    // a corpus whose column literally contains the string "<null>" stays
    // a distinct category from true nulls
    val tricky = Seq("<null>", null).toDF("lang")
    val tn = Stats.categoricalDrift(tricky, tricky, "lang").collect()
    assert(tn.length === 2)
    assert(tn.count(_.isNullAt(0)) === 1)
    assert(tn.exists(r => !r.isNullAt(0) && r.getString(0) === "<null>"))
  }

  test("populationStability: degenerate domain, NaN exclusion, guards") {
    val const = Seq(5.0, 5.0, 5.0).toDF("v")
    val deg = Stats.populationStability(const, const, "v", 8).collect()
    assert(deg.length === 1 && deg.head.getLong(3) === 3L)
    assert(math.abs(deg.head.getDouble(5)) < 1e-12)
    val withNan = Seq(1.0, 2.0, Double.NaN, Double.PositiveInfinity).toDF("v")
    val n = Stats.populationStability(withNan, withNan, "v", 2).collect()
    assert(n.map(_.getLong(3)).sum === 2L, "NaN/Inf excluded like null")
    intercept[IllegalArgumentException] {
      Stats.populationStability(const, const, "v", 0)
    }
    intercept[IllegalArgumentException] {
      Stats.populationStability(Seq(Double.NaN).toDF("v"), const, "v", 4)
    }
    // an after value billions of widths past the range must CLAMP into
    // the edge bucket, not overflow the ANSI int cast (regression: the
    // bucket index was cast to int before clamping)
    val narrow = (1 to 100).map(_.toDouble).toDF("v")
    val far = Seq(2.3e13).toDF("v")
    val clamped = Stats.populationStability(narrow, far, "v", 4).collect()
    assert(clamped.last.getLong(4) === 1L && clamped.map(_.getLong(4)).sum === 1L)
  }

  test("spearmanMatrix: monotone nonlinear = 1, ties averaged, nulls listwise") {
    import spark.implicits._
    // y = x^3 is monotone in x → spearman 1 even though pearson < 1
    val d = (1 to 50).map(i => (i.toDouble, math.pow(i.toDouble, 3),
      (i % 5).toDouble)).toDF("x", "y", "t")
    val got = Stats.spearmanMatrix(d, Seq("x", "y", "t"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(got(("x", "y")) === 1.0)
    // tie-averaged ranks: hand-check vs R's cor(method="spearman") for a
    // tiny tied vector: x=(1,2,2,3), w=(10,20,20,40) → rho = 1
    val tied = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0))
      .toDF("a", "b")
    val tr = Stats.spearmanMatrix(tied, Seq("a", "b")).collect().head
    assert(tr.getDouble(2) === 1.0)
    // anti-monotone → -1
    val anti = (1 to 20).map(i => (i.toDouble, -math.exp(i / 3.0)))
      .toDF("a", "b")
    assert(Stats.spearmanMatrix(anti, Seq("a", "b"))
      .collect().head.getDouble(2) === -1.0)
    // constant column → null
    val const = Seq((1.0, 7.0), (2.0, 7.0)).toDF("a", "b")
    assert(Stats.spearmanMatrix(const, Seq("a", "b")).collect().head.isNullAt(2))
    // null / NaN rows dropped listwise
    val withNull = Seq((Some(1.0), Some(1.0)), (Some(2.0), Some(4.0)),
      (None, Some(9.0)), (Some(Double.NaN), Some(2.0)), (Some(3.0), Some(9.0)))
      .toDF("a", "b")
    assert(Stats.spearmanMatrix(withNull, Seq("a", "b"))
      .collect().head.getDouble(2) === 1.0)
    intercept[IllegalArgumentException] { Stats.spearmanMatrix(d, Seq("x")) }
  }

  test("ksTest: identical samples D=0; disjoint shift D=1; verdict consistent") {
    import spark.implicits._
    val x = (1 to 100).map(_.toDouble).toDF("v")
    val same = Stats.ksTest(x, x, "v", bins = 10).collect().head
    assert(same.getDouble(2) === 0.0 && !same.getBoolean(4))
    assert(same.getLong(0) === 100L && same.getLong(1) === 100L)
    // fully disjoint supports → every cumulative step displaced → D = 1
    val y = (201 to 300).map(_.toDouble).toDF("v")
    val far = Stats.ksTest(x, y, "v", bins = 10).collect().head
    assert(far.getDouble(2) === 1.0 && far.getBoolean(4))
    // critical value formula: 1.3581 * sqrt((n+m)/(n*m))
    val expectCrit = BigDecimal(1.3581 * math.sqrt(200.0 / 10000.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(far.getDouble(3) === expectCrit)
    // a half-range location shift on the shared grid flags
    val shifted = (51 to 150).map(_.toDouble).toDF("v")
    val mid = Stats.ksTest(x, shifted, "v", bins = 20).collect().head
    assert(mid.getDouble(2) > 0.25 && mid.getBoolean(4))
    // NaN/Inf excluded like PSI; empty side rejected
    val dirty = (Seq(Double.NaN, Double.PositiveInfinity) ++
      (1 to 100).map(_.toDouble)).toDF("v")
    assert(Stats.ksTest(x, dirty, "v", bins = 10).collect().head
      .getLong(1) === 100L)
    intercept[IllegalArgumentException] {
      Stats.ksTest(x, Seq(Double.NaN).toDF("v"), "v")
    }
    intercept[IllegalArgumentException] { Stats.ksTest(x, y, "v", bins = 0) }
  }
}
