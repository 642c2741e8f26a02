package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed principal-component analysis over an embedding column — the
 * data-dependent sibling of the Johnson–Lindenstrauss
 * [[Similarity.randomProject]]: where JL preserves distances obliviously,
 * PCA picks the k directions that capture the MOST variance of this
 * corpus, so a 64-dim embedding often compresses to 8–16 dims with far
 * less recall loss than a random projection of the same width
 * (reference behavior class: fugue has no linear algebra of its own —
 * this is part of the training-data toolbox layered on top, like
 * SemDeDup's "cluster then prune" which works in exactly such a reduced
 * space).
 *
 * Scale design (the MLlib RowMatrix.computeCovariance shape):
 *  - fit: ONE `treeAggregate` pass over the corpus accumulating
 *    (n, Σv, upper-triangular ΣvvT) — d(d+3)/2 + 1 doubles of state per
 *    task, merged log-depth; the driver never sees rows, only the
 *    O(d²) moment matrix. At d=64 that is ~2 k doubles — trivially
 *    broadcastable; the pass is compute-bound on the scan, exactly what
 *    a 100 TB aggregate should be.
 *  - eigensolve: cyclic Jacobi on the d×d covariance ON THE DRIVER
 *    (d ≤ a few hundred by construction of embedding columns; the
 *    solve is microseconds next to one corpus scan).
 *  - transform: a plan-embedded [[graft.functions.expressions.AffineProject]]
 *    expression — components ship once per executor as a codegen
 *    reference object; the projection is a narrow codegen'd map with no
 *    shuffle, no join, no UDF boxing.
 *
 * Determinism: float addition is order-sensitive, so the moment sums
 * (and hence the components) can wobble at the last few ulps across
 * partition layouts. The sign convention is fixed (largest-|coordinate|
 * positive) and every consumer-facing law in the conformance suite
 * checks INVARIANTS — orthonormality, descending variance,
 * captured-variance optimality — rather than raw floats.
 */
object Pca {

  /** Fitted model: `components` is k×d, rows are unit-norm principal
   * axes ordered by explained variance descending; `explainedVariance`
   * the matching eigenvalues; `totalVariance` the trace of the
   * covariance (sum of ALL eigenvalues); `mean` the column mean. */
  case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      explainedVariance: Array[Double],
      totalVariance: Double,
      nRows: Long) {
    def k: Int = components.length
    def dim: Int = mean.length
  }

  /**
   * Mergeable first+second moments of a vector corpus — the PCA analogue
   * of the [[Sketches]] partials: per-shard (per-day, per-ingest-batch)
   * moments are d(d+3)/2+1 doubles that ADD associatively, so the corpus
   * model refreshes from stored partials without rescanning history.
   * Layout: `acc(0)` = n, `acc(1..d)` = Σv, then the upper-triangular
   * ΣvvT row-major.
   */
  case class PcaMoments(dim: Int, acc: Array[Double]) {
    require(acc.length == 1 + dim + dim * (dim + 1) / 2,
      s"accumulator length ${acc.length} does not match dim $dim")
    def n: Long = acc(0).toLong
    /** Merge is associative across shards of DIFFERENT dimension too:
     * the smaller side zero-pads to the larger (exactly how a short
     * vector behaves within one shard), so per-day partials stay
     * mergeable when a new ingest widens the embedding. */
    def merge(other: PcaMoments): PcaMoments = {
      val (big, small) =
        if (dim >= other.dim) (this, other) else (other, this)
      val out = big.acc.clone()
      out(0) += small.acc(0)
      var i = 0
      while (i < small.dim) { out(1 + i) += small.acc(1 + i); i += 1 }
      var p = 1 + small.dim
      i = 0
      while (i < small.dim) {
        var j = i
        while (j < small.dim) {
          out(Pca.triIndex(big.dim, i, j)) += small.acc(p)
          p += 1
          j += 1
        }
        i += 1
      }
      PcaMoments(big.dim, out)
    }
  }

  /** Flat index of upper-triangular entry (i, j), i ≤ j, in the
   * [[PcaMoments]] accumulator layout for dimension `d`. */
  private[graft] def triIndex(d: Int, i: Int, j: Int): Int =
    1 + d + i * (2 * d - i + 1) / 2 + (j - i)

  /**
   * Fit a k-component model. One distributed pass (treeAggregate of the
   * first and second moments) + a driver-side Jacobi eigensolve.
   * Null vectors, and vectors containing NaN/±Infinity, are skipped
   * (one poisoned embedding must not NaN the whole covariance); shorter
   * vectors zero-pad to the corpus maximum dimension.
   */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel =
    fitFromMoments(moments(df, vecCol), k)

  /** The single corpus pass: mergeable moments of `vecCol` (see
   * [[PcaMoments]]). Persist `acc` per ingest batch and
   * [[PcaMoments.merge]] + [[fitFromMoments]] refresh the model
   * incrementally. Without `dim`, the accumulator GROWS to the corpus
   * maximum dimension inside the same pass (ragged vectors zero-pad) —
   * no separate max-length probe scan. With `dim` declared, a longer
   * vector raises rather than silently truncating. */
  def moments(df: DataFrame, vecCol: String,
      dim: Option[Int] = None): PcaMoments = {
    dim.foreach(d => require(d >= 1,
      s"embedding dimension must be >= 1, got $d"))
    val vc = col(vecCol).cast("array<double>")
    // null vectors and non-finite elements are excluded up front: a
    // single NaN would otherwise propagate through every moment sum
    val vecs = Dedup.spreadForCompute(df)
      .select(vc.as(vecCol))
      .filter(col(vecCol).isNotNull &&
        !exists(col(vecCol), x => x.isNaN || abs(x) === Double.PositiveInfinity))
    val d0 = dim.getOrElse(0)
    val zero = PcaMoments(d0, new Array[Double](1 + d0 + d0 * (d0 + 1) / 2))
    val m = vecs.rdd.treeAggregate(zero)(
      seqOp = (a0, row) => {
        val s = row.getSeq[Double](0)
        if (s.length > a0.dim && dim.isDefined)
          throw new IllegalArgumentException(
            s"vector of dimension ${s.length} exceeds the declared dim ${dim.get}")
        // grow the accumulator in-pass (zero-width moments of the new
        // tail merge exactly like a shorter shard)
        val a =
          if (s.length <= a0.dim) a0
          else a0.merge(PcaMoments(s.length,
            new Array[Double](1 + s.length + s.length * (s.length + 1) / 2)))
        val buf = a.acc
        val d = a.dim
        // hoist into a primitive array: the O(d²) product loop must not
        // pay boxed Seq apply per access (this is the corpus-scan hot path)
        val n = s.length
        val v = new Array[Double](n)
        var i = 0
        while (i < n) { v(i) = s(i); i += 1 }
        buf(0) += 1.0
        i = 0
        while (i < n) { buf(1 + i) += v(i); i += 1 }
        i = 0
        while (i < n) {
          val base = triIndex(d, i, i)
          val vi = v(i)
          var j = i
          while (j < n) { buf(base + (j - i)) += vi * v(j); j += 1 }
          i += 1
        }
        a
      },
      combOp = (a, b) =>
        if (a.dim == b.dim) {
          val out = a.acc
          var i = 0
          while (i < out.length) { out(i) += b.acc(i); i += 1 }
          PcaMoments(a.dim, out)
        } else a.merge(b))
    // with a DECLARED dim an empty batch is a valid ZERO partial (the
    // per-ingest-batch incremental workflow must tolerate an empty day —
    // it merges as the identity); only the inferred-dim path, which has
    // no dimension to report, must reject emptiness
    require(dim.isDefined || (m.dim >= 1 && m.n > 0),
      "cannot fit PCA on an empty corpus")
    m
  }

  /** Driver-side model from (possibly merged) moments: covariance +
   * Jacobi eigensolve — microseconds at embedding dims; no cluster
   * work at all. */
  def fitFromMoments(m: PcaMoments, k: Int): PcaModel = {
    require(k >= 1, s"k must be >= 1, got $k")
    val d = m.dim
    require(k <= d, s"k=$k exceeds the embedding dimension $d")
    val acc = m.acc
    val n = acc(0)
    require(n >= 2, s"need >= 2 rows to estimate a covariance, got ${n.toLong}")
    val mean = Array.tabulate(d)(i => acc(1 + i) / n)
    // sample covariance: (Σ vvT − n·μμT) / (n − 1)
    val cov = Array.ofDim[Double](d, d)
    var p = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (acc(p) - n * mean(i) * mean(j)) / (n - 1)
        cov(i)(j) = c
        cov(j)(i) = c
        p += 1
        j += 1
      }
      i += 1
    }
    val trace = (0 until d).map(i => cov(i)(i)).sum
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(i => -values(i)).take(k)
    val comps = order.map { idx =>
      val v = Array.tabulate(d)(r => vectors(r)(idx))
      // deterministic sign: largest-|coordinate| positive
      val m = v.indices.maxBy(i => math.abs(v(i)))
      if (v(m) < 0) v.map(-_) else v
    }.toArray
    PcaModel(mean, comps, order.map(i => math.max(0.0, values(i))).toArray,
      trace, n.toLong)
  }

  /** Project a vector column through a fitted model → `array<double>`
   * of length k (codegen'd plan-embedded expression, no shuffle). The
   * input casts to array<double> first, matching [[moments]] — an
   * int-typed (e.g. quantized) embedding column projects correctly
   * instead of tripping AffineProject's float/double type check.
   *
   * `whiten = true` scales each output axis by 1/√eigenvalue so the
   * projections have unit variance per axis (the standard preprocessing
   * before distance-based steps — k-means, SemDeDup — that would
   * otherwise be dominated by the top component); axes whose eigenvalue
   * is below `whitenEps` OF THE TOTAL VARIANCE are zeroed rather than
   * amplified into noise. The threshold is relative, so a corpus stored
   * at a uniformly tiny numeric scale whitens normally — only axes
   * that are degenerate RELATIVE to the data zero out. The scaling
   * folds into the projection matrix — still one expression, no extra
   * pass. */
  def project(v: Column, model: PcaModel, whiten: Boolean = false,
      whitenEps: Double = 1e-9): Column = {
    val floor = whitenEps * math.max(model.totalVariance, java.lang.Double.MIN_NORMAL)
    val mat =
      if (!whiten) model.components
      else model.components.zip(model.explainedVariance).map { case (row, ev) =>
        if (ev <= floor) row.map(_ => 0.0)
        else row.map(_ / math.sqrt(ev))
      }
    graft.functions.expressions.VectorExpressions
      .affineProject(v.cast("array<double>"), mat, model.mean)
  }

  /** Fit + transform in one call: (idCol, outCol k-dim projection).
   * Two corpus scans total — one for the moments, one for the map. */
  def fitTransform(df: DataFrame, idCol: String, vecCol: String, k: Int,
      outCol: String = "pca", whiten: Boolean = false): (DataFrame, PcaModel) = {
    val model = fit(df, vecCol, k)
    (df.select(col(idCol),
      project(col(vecCol), model, whiten).as(outCol)), model)
  }

  /**
   * Cyclic Jacobi eigendecomposition of a symmetric matrix — returns
   * (eigenvalues, eigenvector matrix with eigenvectors in COLUMNS).
   * Sweeps rotate away the largest off-diagonal mass; converges
   * quadratically, 30-sweep cap (d ≤ a few hundred here; a sweep is
   * O(d³/2) driver-side flops).
   */
  private[graft] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val eps = 1e-12 * math.max(1.0, (0 until d).map(i => math.abs(a(i)(i))).max)
    var sweep = 0
    var off = offDiag(a)
    while (off > eps && sweep < 30) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > eps * 1e-3) rotate(a, v, p, q)
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += math.abs(a(i)(j)); j += 1 }
      i += 1
    }
    s
  }

  private def rotate(a: Array[Array[Double]], v: Array[Array[Double]],
      p: Int, q: Int): Unit = {
    val d = a.length
    val apq = a(p)(q)
    val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
    val t = {
      val s = if (theta >= 0) 1.0 else -1.0
      s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
    }
    val c = 1.0 / math.sqrt(t * t + 1.0)
    val s = t * c
    var i = 0
    while (i < d) {
      val aip = a(i)(p); val aiq = a(i)(q)
      a(i)(p) = c * aip - s * aiq
      a(i)(q) = s * aip + c * aiq
      i += 1
    }
    i = 0
    while (i < d) {
      val api = a(p)(i); val aqi = a(q)(i)
      a(p)(i) = c * api - s * aqi
      a(q)(i) = s * api + c * aqi
      i += 1
    }
    i = 0
    while (i < d) {
      val vip = v(i)(p); val viq = v(i)(q)
      v(i)(p) = c * vip - s * viq
      v(i)(q) = s * vip + c * viq
      i += 1
    }
  }
}
