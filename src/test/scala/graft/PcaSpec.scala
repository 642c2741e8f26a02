package graft

import graft.functions.{Pca, Sampling, Sketches}
import org.apache.spark.sql.functions._

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("jacobiEigen: exact eigenpairs of a known symmetric matrix") {
    // [[2,1],[1,2]] has eigenvalues 3 (along (1,1)/√2) and 1
    val (values, vectors) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = values.sorted.reverse
    assert(math.abs(sorted(0) - 3.0) < 1e-10)
    assert(math.abs(sorted(1) - 1.0) < 1e-10)
    val top = values.indices.maxBy(values(_))
    val v = Array(vectors(0)(top), vectors(1)(top))
    assert(math.abs(math.abs(v(0)) - math.sqrt(0.5)) < 1e-10)
    assert(math.abs(v(0) - v(1)) < 1e-10, "eigenvector along (1,1)")
  }

  test("fit: recovers planted variance directions; invariants hold") {
    // variance 100 along e0, 25 along e1, ~0 along e2/e3
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      val a = rnd.nextGaussian() * 10.0
      val b = rnd.nextGaussian() * 5.0
      (i.toLong, Array(a + 3.0f, b - 1.0f, 0.01f * rnd.nextGaussian().toFloat, 0.0f)
        .map(_.toFloat))
    }
    val d = rows.toDF("id", "vec")
    val model = Pca.fit(d, "vec", 2)
    assert(model.dim === 4 && model.k === 2 && model.nRows === 500L)
    // components unit-norm and orthogonal
    model.components.foreach(c => assert(math.abs(dot(c, c) - 1.0) < 1e-9))
    assert(math.abs(dot(model.components(0), model.components(1))) < 1e-9)
    // descending explained variance, both below total
    assert(model.explainedVariance(0) >= model.explainedVariance(1))
    assert(model.explainedVariance.sum <= model.totalVariance + 1e-6)
    // planted directions recovered: |pc0·e0| ≈ 1, |pc1·e1| ≈ 1
    assert(math.abs(model.components(0)(0)) > 0.99)
    assert(math.abs(model.components(1)(1)) > 0.99)
    // mean recovered
    assert(math.abs(model.mean(0) - 3.0) < 1.5)
    assert(math.abs(model.mean(1) + 1.0) < 1.0)
    // sign convention: largest-|coordinate| positive
    model.components.foreach { c =>
      assert(c(c.indices.maxBy(i => math.abs(c(i)))) > 0)
    }
  }

  test("transform: projection variance matches eigenvalues; codegen'd plan") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map { i =>
      (i.toLong, Array.fill(6)(rnd.nextGaussian().toFloat))
    }
    val d = rows.toDF("id", "vec")
    val (proj, model) = Pca.fitTransform(d, "id", "vec", 3, "p")
    assert(proj.columns.toSeq === Seq("id", "p"))
    val mat = proj.select(col("p")).collect().map(_.getSeq[Double](0).toArray)
    assert(mat.forall(_.length === 3))
    // per-axis sample variance of the projections ≈ the eigenvalues
    (0 until 3).foreach { j =>
      val xs = mat.map(_(j))
      val m = xs.sum / xs.length
      val v = xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
      assert(math.abs(v - model.explainedVariance(j)) < 0.05 *
        math.max(1.0, model.explainedVariance(j)),
        s"axis $j variance $v vs eigenvalue ${model.explainedVariance(j)}")
    }
    // projection means are ~0 (centered)
    (0 until 3).foreach { j =>
      val xs = mat.map(_(j))
      assert(math.abs(xs.sum / xs.length) < 1e-9)
    }
    // the transform is a narrow plan: no exchange below the project
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }

  test("moments merge: shard partials fit the same model as one pass") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 300).map { i =>
      (i.toLong, Array.fill(5)(rnd.nextGaussian().toFloat))
    }
    val d = rows.toDF("id", "vec")
    val whole = Pca.fit(d, "vec", 3)
    val m1 = Pca.moments(d.filter(col("id") < 100), "vec")
    val m2 = Pca.moments(d.filter(col("id") >= 100 && col("id") < 200), "vec")
    val m3 = Pca.moments(d.filter(col("id") >= 200), "vec")
    // merge is associative in any grouping
    val merged = m1.merge(m2.merge(m3))
    val mergedLtr = m1.merge(m2).merge(m3)
    assert(merged.n === 300L && mergedLtr.n === 300L)
    merged.acc.zip(mergedLtr.acc).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9 * math.max(1.0, math.abs(a)))
    }
    val inc = Pca.fitFromMoments(merged, 3)
    assert(math.abs(inc.totalVariance - whole.totalVariance) < 1e-8)
    inc.explainedVariance.zip(whole.explainedVariance).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-8, s"$a vs $b")
    }
    inc.components.zip(whole.components).foreach { case (ci, cw) =>
      assert(math.abs(math.abs(dot(ci, cw)) - 1.0) < 1e-6,
        "same principal axes from merged partials")
    }
    // an EMPTY batch with a declared dim is a valid zero partial that
    // merges as the identity (the per-ingest-day incremental workflow
    // must tolerate an empty day)
    val emptyBatch = Pca.moments(
      Seq.empty[(Long, Array[Float])].toDF("id", "vec"), "vec", dim = Some(5))
    assert(emptyBatch.n === 0L && emptyBatch.dim === 5)
    val same = m1.merge(emptyBatch)
    assert(same.n === m1.n)
    same.acc.zip(m1.acc).foreach { case (a, b) => assert(a === b) }
    // cross-dimension merge pads the narrower shard (a widened embedding
    // ingest stays mergeable with stored partials)
    val narrow = Pca.moments(
      Seq((1L, Array(1.0f, 2.0f)), (2L, Array(2.0f, 4.0f))).toDF("id", "vec"),
      "vec")
    val wide = narrow.merge(m1)
    assert(wide.dim === 5 && wide.n === narrow.n + m1.n)
    // the padded tail contributes nothing: dim-0 sums add, dim-4 sums
    // are m1's alone
    assert(math.abs(wide.acc(1) - (narrow.acc(1) + m1.acc(1))) < 1e-9)
    assert(math.abs(wide.acc(5) - m1.acc(5)) < 1e-12)
  }

  test("project(whiten): unit variance per axis; tiny eigenvalues zeroed") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 400).map { i =>
      (i.toLong, Array((rnd.nextGaussian() * 9).toFloat,
        (rnd.nextGaussian() * 2).toFloat, 0.0f))
    }
    val d = rows.toDF("id", "vec")
    val model = Pca.fit(d, "vec", 3)
    val mat = d.select(Pca.project(col("vec"), model, whiten = true).as("p"))
      .collect().map(_.getSeq[Double](0).toArray)
    // informative axes whiten to variance ~1; the zero-variance third
    // axis is zeroed, not amplified into 1/sqrt(eps) noise
    (0 until 2).foreach { j =>
      val xs = mat.map(_(j))
      val m = xs.sum / xs.length
      val v = xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
      assert(math.abs(v - 1.0) < 0.02, s"axis $j variance $v")
    }
    assert(mat.forall(_(2) === 0.0), "degenerate axis zeroed")
    // the zero-axis threshold is RELATIVE: a corpus stored at a tiny
    // numeric scale whitens normally instead of zeroing every axis
    val tinyRows = (0 until 300).map { i =>
      (i.toLong, Array((rnd.nextGaussian() * 1e-5).toFloat,
        (rnd.nextGaussian() * 1e-6).toFloat))
    }
    val tiny = tinyRows.toDF("id", "vec")
    val tm = Pca.fit(tiny, "vec", 2)
    val tp = tiny.select(Pca.project(col("vec"), tm, whiten = true).as("p"))
      .collect().map(_.getSeq[Double](0).toArray)
    (0 until 2).foreach { j =>
      val xs = tp.map(_(j))
      val m = xs.sum / xs.length
      val v = xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
      assert(math.abs(v - 1.0) < 0.05, s"tiny-scale axis $j variance $v")
    }
  }

  test("fit: guards — empty corpus, k too large, null vectors skipped") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "vec")
    intercept[IllegalArgumentException] { Pca.fit(empty, "vec", 2) }
    val tiny = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(2.0f, 1.0f)))
      .toDF("id", "vec")
    intercept[IllegalArgumentException] { Pca.fit(tiny, "vec", 3) }
    val withNull = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, null.asInstanceOf[Array[Float]]), (4L, Array(1.0f, 1.0f)))
      .toDF("id", "vec")
    assert(Pca.fit(withNull, "vec", 1).nRows === 3L)
    // a NaN/Inf element excludes its VECTOR (not the whole fit): one
    // poisoned embedding must not NaN the covariance
    val withNan = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(Float.NaN, 1.0f)), (4L, Array(1.0f, Float.PositiveInfinity)),
      (5L, Array(2.0f, 2.0f))).toDF("id", "vec")
    val mNan = Pca.fit(withNan, "vec", 2)
    assert(mNan.nRows === 3L)
    assert(mNan.explainedVariance.forall(v => !v.isNaN))
    assert(mNan.mean.forall(v => !v.isNaN))
  }

  test("moments: ragged corpora zero-pad to the max dim; declared dim is strict") {
    // max dimension wins regardless of which row a scan surfaces first
    val ragged = Seq((1L, Array(1.0f)), (2L, Array(0.0f, 2.0f)),
      (3L, Array(3.0f, 1.0f, 2.0f))).toDF("id", "vec")
    val m = Pca.moments(ragged, "vec")
    assert(m.dim === 3 && m.n === 3L)
    // sums reflect zero-padding: dim-2 totals = 0+2+1, dim-3 = 0+0+2
    assert(math.abs(m.acc(2) - 3.0) < 1e-12)
    assert(math.abs(m.acc(3) - 2.0) < 1e-12)
    // an explicitly declared smaller dim FAILS LOUDLY instead of
    // silently truncating coordinates
    val err = intercept[org.apache.spark.SparkException] {
      Pca.moments(ragged, "vec", dim = Some(2))
    }
    assert(err.getMessage.contains("exceeds the declared dim") ||
      Option(err.getCause).exists(_.getMessage.contains("exceeds the declared dim")))
  }

  test("project: int-typed (quantized) embeddings cast and project correctly") {
    val ints = Seq((1L, Array(2, 0)), (2L, Array(0, 2)), (3L, Array(4, 4)))
      .toDF("id", "vec")
    val model = Pca.fit(ints, "vec", 1)
    val p = ints.select(Pca.project(col("vec"), model).as("p"))
      .collect().map(_.getSeq[Double](0).head)
    assert(p.length === 3 && p.forall(!_.isNaN))
    assert(math.abs(p.sum) < 1e-9, "projections centered")
  }

  test("selectByBudget: greedy quality-ranked prefix under a token budget") {
    val d = Seq(
      (1L, 10L, 0.9), (2L, 20L, 0.8), (3L, 30L, 0.7),
      (4L, 25L, 0.6), (5L, 5L, 0.5)
    ).toDF("id", "toks", "score")
    // budget 60: 10 (cum 10) + 20 (30) + 30 (60) fit; 25 would hit 85
    val got = Sampling.selectByBudget(d, col("toks"), "score", Seq("id"), 60L)
    assert(got.columns.toSeq === Seq("id", "toks", "score", "cum_size"))
    val rows = got.orderBy("cum_size").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(rows.toSeq === Seq((1L, 10L), (2L, 30L), (3L, 60L)))
    // ascending: lowest score first — id 5 (5 toks, cum 5) then id 4 (25, cum 30)
    val asc = Sampling.selectByBudget(d, col("toks"), "score", Seq("id"),
      30L, descending = false).select("id").as[Long].collect().sorted
    assert(asc.toSeq === Seq(4L, 5L))
    // a row larger than the whole budget excludes itself and the tail
    val none = Sampling.selectByBudget(d, col("toks"), "score", Seq("id"), 5L)
    assert(none.count() === 0L)
    intercept[IllegalArgumentException] {
      Sampling.selectByBudget(d, col("toks"), "score", Seq("id"), -1L)
    }
    intercept[IllegalArgumentException] {
      Sampling.selectByBudget(d, col("toks"), "score", Seq.empty, 10L)
    }
    // NULL ranks are excluded, never budget-first (Spark's nulls-first
    // ascending sort vs the SQL twin's NULLS LAST); non-numeric rejected
    val withNull = Seq((1L, 10L, Some(1L)), (2L, 10L, None), (3L, 10L, Some(2L)))
      .toDF("id", "toks", "score")
    val sel = Sampling.selectByBudget(withNull, col("toks"), "score",
      Seq("id"), 20L).select("id").as[Long].collect().sorted
    assert(sel.toSeq === Seq(1L, 3L))
    intercept[IllegalArgumentException] {
      Sampling.selectByBudget(
        Seq((1L, 10L, "a")).toDF("id", "toks", "score"),
        col("toks"), "score", Seq("id"), 20L)
    }
    // long ranks above 2^53 stay distinct (native-type ordering — a
    // double cast would merge them and reorder the selection)
    val big = Seq((1L, 10L, (1L << 53) + 1L), (2L, 10L, (1L << 53) + 2L))
      .toDF("id", "toks", "score")
    val picked = Sampling.selectByBudget(big, col("toks"), "score",
      Seq("id"), 10L).select("id").as[Long].collect()
    assert(picked.toSeq === Seq(2L), "the strictly larger rank wins the budget")
  }

  test("overlapEstimate: near-exact at small cardinality; jaccard well-defined") {
    val a = (1 to 400).map(i => s"k$i").toDF("v")
    val b = (201 to 600).map(i => s"k$i").toDF("v")
    val r = Sketches.overlapEstimate(a, b, "v").collect()(0)
    val (na, nb, nu, ni) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // coupon (sparse) mode: near-exact, but 26-bit coupon collisions can
    // shave a count by a few — bound, don't pin
    def within(got: Long, want: Long) =
      assert(math.abs(got - want) <= math.max(2L, (want * 0.02).toLong),
        s"$got vs $want")
    within(na, 400L); within(nb, 400L); within(nu, 600L)
    // the intersection compounds three estimates: bound by 3% of the UNION
    assert(math.abs(ni - 200L) <= (nu * 0.03).toLong, s"$ni vs 200")
    assert(math.abs(r.getDouble(4) - ni.toDouble / nu) < 1e-12)
    // disjoint corpora → ~zero intersection (floored at 0, never
    // negative; estimate noise can leave a few phantom items)
    val c = (1000 to 1100).map(i => s"x$i").toDF("v")
    val r2 = Sketches.overlapEstimate(a, c, "v").collect()(0)
    assert(r2.getLong(3) >= 0L && r2.getLong(3) <= 5L)
    // empty side
    val r3 = Sketches.overlapEstimate(a, spark.emptyDataset[String].toDF("v"), "v")
      .collect()(0)
    assert(r3.getLong(1) === 0L && r3.getLong(3) === 0L)
    within(r3.getLong(0), 400L)
  }
}
