package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the embedding/minhash hot paths. A Scala
 * UDF pays per-element boxing (ArrayData → WrappedArray[java.lang.Double]);
 * these read ArrayData primitives directly, and the dot product generates
 * straight-line Java inside whole-stage codegen.
 */

/** `dot(a, b)` over two array<double> columns — codegen'd primitive loop. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `l2_normalize(v)` over array<float> or array<double> → unit-norm
 * array<double>. The loop lives in [[compute]]; codegen calls it directly
 * (children evaluated in-span — no CodegenFallback InternalRow detour). */
case class L2Normalize(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def compute(in: ArrayData): ArrayData = {
    val n = in.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = if (elemIsFloat) in.getFloat(i).toDouble else in.getDouble(i)
      out(i) = d
      s += d * d
      i += 1
    }
    if (s > 0) {
      val inv = 1.0 / math.sqrt(s)
      i = 0
      while (i < n) { out(i) *= inv; i += 1 }
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("l2norm", this, classOf[L2Normalize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/**
 * `minhash_sig(shingleHashes)` → array<long> of `numHashes` universal-hash
 * minima ((a·h + b) mod (2^61−1)); one primitive pass, coefficients fixed
 * by seed. The |shingles|·numHashes loop lives in [[compute]]; codegen
 * calls it directly so the signature stage stays inside the scan's
 * whole-stage span (this op dominates the 100 TB dedup cost model).
 */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // nullSafeEval returns null for an EMPTY shingle array (a signature of
  // Long.MaxValue minima would be meaningless); the inherited
  // children-based nullable=false would let that null flow unchecked into
  // consumers (no isNull guard is emitted for non-nullable expressions)
  override def nullable: Boolean = true

  private val P = (1L << 61) - 1
  private lazy val (as, bs) = {
    val rnd = new java.util.Random(seed)
    (Array.fill(numHashes)(1 + (rnd.nextLong().abs % (P - 1))),
      Array.fill(numHashes)(rnd.nextLong().abs % P))
  }

  @inline private def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val part = (lo & P) + (((hi << 3) | (lo >>> 61)) & P) + (hi >>> 58)
    val r = (part & P) + (part >>> 61)
    if (r >= P) r - P else r
  }

  /** Null (not a bogus all-MaxValue signature) for an empty shingle set. */
  def compute(hashes: ArrayData): ArrayData = {
    val m = hashes.numElements()
    if (m == 0) return null
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = (hashes.getLong(i) & Long.MaxValue) % P
      var j = 0
      while (j < numHashes) {
        val hv = {
          val s = mulmod(as(j), h) + bs(j)
          if (s >= P) s - P else s
        }
        if (hv < sig(j)) sig(j) = hv
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSignature].getName)
    // compute() returns null for an empty shingle array; surface that as
    // SQL NULL (nullable=true above) so no isNull guard is skipped
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = $ref.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * `hyperplane_keys(v)` → array<long> of random-hyperplane sign-bucket keys
 * for a normalized array<double> vector: `nBits` sign bits per table,
 * `nTables` independent tables, table index packed into the high 32 bits.
 * Plane coefficients are derived deterministically from `seed` on each
 * executor (lazy, ~nTables·nBits·dim doubles — tiny). Replaces a boxed
 * Seq[Double] UDF: reads ArrayData primitives directly.
 *
 * `probes` enables multi-probe LSH (Lv et al., VLDB'07): also emit every
 * key within Hamming distance `probes` of the base key (1 → +nBits flips,
 * 2 → +all two-bit flips). Probing one side of a join by Hamming-d keys
 * matches pairs whose sketches differ by ≤ d bits per table — the standard
 * recall knob that avoids paying for more tables on the large side.
 */
case class HyperplaneKeys(child: Expression, dim: Int, nTables: Int,
    nBits: Int, seed: Long, probes: Int = 0)
    extends UnaryExpression {
  require(probes >= 0 && probes <= 2, "probes must be 0, 1 or 2")
  // the table tag occupies the high 32 bits; sign/probe bits beyond 32
  // would silently alias buckets across tables
  require(nBits >= 1 && nBits <= 32, s"nBits must be in [1, 32], got $nBits")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val planes: Array[Array[Array[Double]]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nTables, nBits, dim)(rnd.nextGaussian())
  }

  private val keysPerTable =
    1 + (if (probes >= 1) nBits else 0) +
      (if (probes >= 2) nBits * (nBits - 1) / 2 else 0)

  def compute(in: ArrayData): ArrayData = {
    val n = math.min(dim, in.numElements())
    val out = new Array[Long](nTables * keysPerTable)
    var o = 0
    var t = 0
    while (t < nTables) {
      var key = 0L
      var b = 0
      while (b < nBits) {
        val p = planes(t)(b)
        var s = 0.0
        var i = 0
        while (i < n) { s += p(i) * in.getDouble(i); i += 1 }
        if (s >= 0) key |= (1L << b)
        b += 1
      }
      val tag = t.toLong << 32
      out(o) = tag | key; o += 1
      if (probes >= 1) {
        var j = 0
        while (j < nBits) { out(o) = tag | (key ^ (1L << j)); o += 1; j += 1 }
      }
      if (probes >= 2) {
        var j = 0
        while (j < nBits) {
          var l = j + 1
          while (l < nBits) {
            out(o) = tag | (key ^ (1L << j) ^ (1L << l)); o += 1; l += 1
          }
          j += 1
        }
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplanes", this, classOf[HyperplaneKeys].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * `shingle_hashes(text, k)` → array<long> of DISTINCT xxhash64 values of
 * the word k-shingles of a text column (first-occurrence order) — the
 * shared first stage of every text-dedup operator.
 *
 * Semantics are identical to the declarative formulation
 * `array_distinct(transform(seq, i => xxhash64(concat_ws(" ",
 * slice(split(trim(text), "\\s+"), i+1, k)))))` (pinned by a differential
 * test), but computed in ONE pass per row: Catalyst evaluates lambda
 * functions inside `transform` interpreted per element, and each `slice`
 * copies its window — measured ~25x slower than this expression on the
 * bench corpus. Tokenization matches Spark exactly: space-only `trim`,
 * then Java-regex `\s+` split with limit -1; window bytes are joined with
 * a single 0x20 and hashed with XXH64 seed 42 (Spark's `xxhash64`).
 */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, "shingle size k must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // fail analysis loudly on a non-string child instead of silently
  // hashing the internal value's toString (e.g. a binary column would
  // shingle "[B@..." garbage)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes requires a string column, got ${other.catalogString}")
    }

  // null text yields an EMPTY ARRAY, not null — the declarative
  // formulation's when/otherwise does the same, and the documented
  // contract is "empty/short docs yield an empty array"
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any =
    ShingleHashes.evalDistinct(
      child.eval(input).asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // custom (not nullSafeCodeGen): a NULL child still produces a non-null
    // empty array, so the output needs no isNull slot at all
    val c = child.genCode(ctx)
    val obj = "graft.functions.expressions.ShingleHashes$.MODULE$"
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = c.code +
        code"""
           |$javaType ${ev.value} =
           |  $obj.evalDistinct(${c.isNull} ? null : ${c.value}, $k);
         """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleHashes {
  private[expressions] val Empty = new GenericArrayData(Array.emptyLongArray)
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Codegen/eval entry: null text → shared empty array (never SQL null). */
  def evalDistinct(s: org.apache.spark.unsafe.types.UTF8String, k: Int): ArrayData =
    if (s == null) Empty else new GenericArrayData(compute(s.toString, k))

  /** Positional variant for [[SpanHashes]] — same null contract. */
  def evalAll(s: org.apache.spark.unsafe.types.UTF8String, k: Int): ArrayData =
    if (s == null) Empty else new GenericArrayData(computeAll(s.toString, k))

  /** Distinct k-shingle hashes of `text`, first-occurrence order.
   * All-whitespace text yields an empty array for EVERY k (without this
   * guard, regex split of a blank string produces empty-string tokens, and
   * at k=1 every blank doc would carry the same bogus hash("") shingle —
   * pairing all blank docs as jaccard-1.0 "near-duplicates").
   *
   * Known, pinned quirk for NON-blank text: Java-regex split with limit -1
   * keeps a boundary empty token when text starts or ends with non-space
   * whitespace ("foo\n" → ["foo", ""]), so such docs carry one extra
   * boundary shingle. This matches the declarative formulation AND the
   * DuckDB oracles (string_split_regex has identical artifacts) — the
   * cross-engine contract is tokenization-identical, so the artifact is
   * kept rather than silently diverging from every SQL oracle. */
  def compute(text: String, k: Int): Array[Long] =
    compute(text, k, dedup = true)

  /** Same tokenization and window hash, but EVERY position in order (no
   * dedup) — the exact-substring span family needs positional occurrence
   * counts, not the distinct shingle set. */
  def computeAll(text: String, k: Int): Array[Long] =
    compute(text, k, dedup = false)

  private def compute(text: String, k: Int, dedup: Boolean): Array[Long] = {
    var ci = 0
    var hasContent = false
    while (!hasContent && ci < text.length) {
      val ch = text.charAt(ci)
      hasContent = !(ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' ||
        ch == '\f' || ch == '\r')
      ci += 1
    }
    if (!hasContent) return Array.emptyLongArray
    // Spark `trim` strips 0x20 only (not \t\n — those become split tokens)
    var from = 0
    var to = text.length
    while (from < to && text.charAt(from) == ' ') from += 1
    while (to > from && text.charAt(to - 1) == ' ') to -= 1
    val toks = Ws.split(text.substring(from, to), -1)
    val n = toks.length
    if (n < k) return Array.emptyLongArray
    // UTF-8 bytes per token, once; windows share them
    val tokBytes = new Array[Array[Byte]](n)
    var i = 0
    var maxWin = 0
    while (i < n) {
      tokBytes(i) = toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    i = 0
    while (i <= n - k) {
      var len = k - 1
      var j = i
      while (j < i + k) { len += tokBytes(j).length; j += 1 }
      if (len > maxWin) maxWin = len
      i += 1
    }
    val buf = new Array[Byte](maxWin)
    val seen =
      if (dedup) new java.util.HashSet[java.lang.Long](n * 2) else null
    val out = new Array[Long](n - k + 1)
    var m = 0
    i = 0
    while (i <= n - k) {
      var pos = 0
      var j = i
      while (j < i + k) {
        if (j > i) { buf(pos) = ' '; pos += 1 }
        val tb = tokBytes(j)
        System.arraycopy(tb, 0, buf, pos, tb.length)
        pos += tb.length
        j += 1
      }
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, pos, 42L)
      if (!dedup || seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    if (m == out.length) out else java.util.Arrays.copyOf(out, m)
  }
}

/** Positional stride-1 window hashes (ShingleHashes without the distinct
 * filter): element p is the hash of tokens [p, p+k) space-joined — byte-
 * identical to `xxhash64(concat_ws(" ", slice(tokens, p+1, k)))`, so the
 * exact-substring oracles that group by the span STRING stay exact. One
 * flat JVM loop per row replaces an interpreted higher-order-function
 * chain (transform+slice+concat) that allocated a slice per window. */
case class SpanHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, "span size k must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"span_hashes requires a string column, got ${other.catalogString}")
    }

  // null/blank text yields an EMPTY ARRAY (same contract as ShingleHashes)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any =
    ShingleHashes.evalAll(
      child.eval(input).asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val obj = "graft.functions.expressions.ShingleHashes$.MODULE$"
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = c.code +
        code"""
           |$javaType ${ev.value} =
           |  $obj.evalAll(${c.isNull} ? null : ${c.value}, $k);
         """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit simhash from a shingle-hash array: per-bit majority vote.
 * Stateless — the vote loop is a static method the generated code calls. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    SimHash64.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = "graft.functions.expressions.SimHash64$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $obj.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object SimHash64 {
  def compute(hashes: ArrayData): Long = {
    val m = hashes.numElements()
    if (m == 0) return 0L
    val votes = new Array[Int](64)
    var i = 0
    while (i < m) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}

/**
 * `nearest_cells(v)` → array<int> of the `nProbe` centroid indices nearest
 * (by dot product — cosine for normalized inputs) to an array<double>
 * vector. Centroids are embedded in the expression (k×dim doubles, fit at
 * the driver and shipped once per task via the serialized plan), so cell
 * assignment is a pure scan — no shuffle, no join. The IVF building block:
 * corpus assignment uses nProbe=1, queries probe several cells.
 */
case class NearestCells(child: Expression,
    centroids: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression {
  require(nProbe >= 1 && nProbe <= centroids.length,
    "nProbe must be in [1, #centroids]")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  def compute(in: ArrayData): ArrayData = {
    val k = centroids.length
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cen = centroids(c)
      val n = math.min(cen.length, in.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += cen(i) * in.getDouble(i); i += 1 }
      scores(c) = s
      c += 1
    }
    // partial selection of the nProbe best cells (k is small: ≤ ~4096)
    val out = new Array[Int](nProbe)
    val taken = new Array[Boolean](k)
    var p = 0
    while (p < nProbe) {
      var best = -1
      var bestS = Double.NegativeInfinity
      c = 0
      while (c < k) {
        if (!taken(c) && scores(c) > bestS) { best = c; bestS = scores(c) }
        c += 1
      }
      if (best < 0) {
        // all remaining scores are NaN (bad vector): fall back to the first
        // untaken cell rather than crashing the job on one malformed row
        c = 0
        while (best < 0 && c < k) { if (!taken(c)) best = c; c += 1 }
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * 64-bit rolling polynomial document fingerprint (Rabin–Karp style, base
 * 31, FNV offset basis) over the whitespace-normalized lowercase character
 * stream — single pass, no normalized-string allocation, codegen'd.
 *
 * Normalization semantics (deliberate, pinned by ExpressionsSpec):
 * per-char `Character.toLowerCase` (locale-INDEPENDENT — unlike
 * `String.toLowerCase()`, which reads the JVM default locale and would
 * fingerprint the same document differently on a tr_TR executor) and
 * `Character.isWhitespace` (full Unicode whitespace: U+2028/U+2029 etc.,
 * broader than regex `\s`). Consequence: 1-to-N lowercase mappings
 * (e.g. U+0130 → "i" + combining dot) collapse to their 1-char
 * `Character.toLowerCase` image. Content-addressed identities are stable
 * across JVMs/locales but differ from any `String.toLowerCase`-based
 * scheme for such code points.
 */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  // same guard as ShingleHashes: a non-string child (e.g. binary) would
  // hash the JVM toString — an identity rendering that differs for equal
  // payloads and across executors, silently breaking fingerprint joins
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fingerprint64 requires a string column, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    Fingerprint64.hash(v.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = "graft.functions.expressions.Fingerprint64$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $obj.hash($c.toString());")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object Fingerprint64 {
  /** One pass: collapse whitespace runs to a single space, drop
   * leading/trailing whitespace, lowercase per char, polynomial-roll. */
  def hash(s: String): Long = {
    var h = 1125899906842597L
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) {
        if (started) pendingSpace = true
      } else {
        if (pendingSpace) { h = 31 * h + ' '; pendingSpace = false }
        h = 31 * h + Character.toLowerCase(c)
        started = true
      }
      i += 1
    }
    h
  }
}

/**
 * `random_project(v)` → array<double>: Rademacher (±1) random projection
 * to `outDim` dimensions — the Johnson–Lindenstrauss transform that
 * underlies "reduce, shortlist, exact-rescore" ANN retrieval. The sign
 * matrix is never materialized: row i's signs for ALL output dimensions
 * are the low `outDim` bits of one splitmix64 mix of (seed, i), which is
 * why `outDim ≤ 64`. Deterministic for fixed (seed) across partitionings,
 * JVMs, and cluster sizes.
 */
case class RandomProject(child: Expression, outDim: Int, seed: Long)
    extends UnaryExpression {
  require(outDim > 0 && outDim <= 64,
    s"outDim must be 1..64 (signs are one 64-bit mix per input index), got $outDim")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"random_project requires array<float|double>, got ${other.catalogString}")
    }

  def compute(in: ArrayData): ArrayData = {
    val n = in.numElements()
    val out = new Array[Double](outDim)
    var i = 0
    while (i < n) {
      val d = if (elemIsFloat) in.getFloat(i).toDouble else in.getDouble(i)
      var bits = RandomProject.mix(seed + 0x9e3779b97f4a7c15L * (i + 1))
      var j = 0
      while (j < outDim) {
        out(j) += (if ((bits & 1L) == 1L) d else -d)
        bits >>>= 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("randomProject", this, classOf[RandomProject].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object RandomProject {
  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/**
 * `bloom_might_contain(key)` — membership probe of a pre-built
 * `org.apache.spark.util.sketch.BloomFilter`, codegen'd so the probe
 * stays inside the scan's whole-stage-codegen span (the point of a Bloom
 * prefilter is to run AT the scan, before any exchange).
 *
 * The serialized filter rides in the expression; it is deserialized once
 * per JVM lazily and shipped to executors through the codegen reference
 * array (the same mechanism Spark's runtime row-level filtering uses).
 * Key encoding matches `DataFrameStatFunctions.bloomFilter`: integral
 * keys probe `mightContainLong`, strings probe their UTF-8 bytes — the
 * compatibility is pinned by ExtrasSpec against exact semi-join results.
 */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Predicate {

  @transient private lazy val filter: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain requires an integral or string key, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType =>
      filter.mightContainBinary(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    case _ => filter.mightContainLong(v.asInstanceOf[Number].longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    child.dataType match {
      case StringType =>
        nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bf.mightContainBinary($c.getBytes());")
      case _ =>
        nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bf.mightContainLong((long) $c);")
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * `long_set_contains(key)` — EXACT membership probe of a pre-collected
 * sorted `Array[Long]`, codegen'd binary search. The exact sibling of
 * [[BloomMightContain]]: a Bloom probe is the right tool when false
 * positives only cost verification work, but corpus-curation REMOVAL
 * decisions (line dedup, span masking) delete data on a hit, so the probe
 * must be exact. A sorted primitive array ships once per executor through
 * the codegen reference array (no boxing, 8 bytes/key, log2(n) probes
 * that stay inside the scan's whole-stage-codegen span).
 *
 * Caller contract: `sortedKeys` must be sorted ascending (callers build it
 * via `java.util.Arrays.sort`); this is not re-validated per row.
 */
case class LongSetContains(child: Expression, sortedKeys: Array[Long])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Predicate {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"long_set_contains requires a long key, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    java.util.Arrays.binarySearch(sortedKeys, v.asInstanceOf[Long]) >= 0

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("longSet", sortedKeys, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = java.util.Arrays.binarySearch($arr, (long) $c) >= 0;")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Product-quantization encoder: split an `array<double>` vector into
 * `codebooks.length` contiguous subspaces and emit, per subspace, the
 * index of the L2-nearest codeword. Output `array<int>` of length m —
 * the 100 TB compression step: a dim-64 float vector (256 B) becomes m
 * small ints (m ≤ 16), so the ANN candidate join shuffles codes, never
 * raw embeddings. Codebooks ride along as a task-broadcast reference
 * object (m × ksub × dsub doubles, driver/executor-resident once).
 */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "codebooks must have >= 1 subspace with >= 1 codeword each")
  private val m = codebooks.length
  private val dsub = codebooks(0)(0).length
  require(codebooks.forall(_.forall(_.length == dsub)),
    "all codewords must share one sub-dimension")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  def compute(in: ArrayData): ArrayData = {
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val base = s * dsub
      val book = codebooks(s)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val idx = base + i
          val x = if (idx < in.numElements()) in.getDouble(idx) else 0.0
          val diff = x - cw(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Asymmetric-distance (ADC) score: given a raw query vector and a PQ
 * code array, approximate `dot(query, reconstruct(codes))` as
 * Σ_s dot(query_sub_s, codebooks(s)(codes(s))). On unit vectors this
 * approximates the cosine; the query side is never quantized, so the
 * only error is the corpus-side reconstruction error.
 */
case class PqAdcScore(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "codebooks must have >= 1 subspace with >= 1 codeword each")
  private val m = codebooks.length
  private val dsub = codebooks(0)(0).length

  override def dataType: DataType = DoubleType

  def compute(qv: ArrayData, codes: ArrayData): Double = {
    // strict: scoring codes from a DIFFERENT codebook generation must
    // fail loudly, not clamp into plausible-but-wrong similarities
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"PQ code array has ${codes.numElements()} entries, codebooks have $m subspaces")
    var score = 0.0
    var s = 0
    while (s < m) {
      val code = codes.getInt(s)
      if (code < 0 || code >= codebooks(s).length)
        throw new IllegalArgumentException(
          s"PQ code $code out of range [0, ${codebooks(s).length}) in subspace $s")
      val cw = codebooks(s)(code)
      val base = s * dsub
      var i = 0
      while (i < dsub) {
        val idx = base + i
        if (idx < qv.numElements()) score += qv.getDouble(idx) * cw(i)
        i += 1
      }
      s += 1
    }
    score
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcScore].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/**
 * Affine projection `M · (v − mean)` with a constant k×d matrix — the PCA
 * transform step (and any fixed linear reduce). The matrix and offset ride
 * along as task-broadcast reference objects like [[PqEncode]]'s codebooks:
 * k·d doubles shipped once per executor, never per row. Accepts
 * array<float> or array<double> input; emits array<double> of length k.
 * Vectors shorter than d are zero-padded (a truncated embedding projects
 * as if its missing tail were the mean); vectors LONGER than d raise
 * (silently projecting a 128-dim vector through a 64-dim model would
 * produce a plausible-looking wrong embedding — the fit path raises for
 * the same case); vectors with null elements project to NULL (the fit
 * path excludes them — treating the null slot as a raw 0.0 would skew
 * the projection silently).
 */
case class AffineProject(child: Expression,
    matrix: Array[Array[Double]], mean: Array[Double])
    extends UnaryExpression {
  require(matrix.nonEmpty, "projection matrix must have >= 1 row")
  require(matrix.forall(_.length == mean.length),
    "every matrix row must match the mean's dimension")
  private val k = matrix.length
  private val d = mean.length

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        // an int/long array would silently mis-read 8-byte slots from
        // 4-byte storage — reject at analysis, callers cast first
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"affine_project requires array<float> or array<double>, got ${other.catalogString}")
    }

  private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def compute(in: ArrayData): Any = {
    val n = in.numElements()
    if (n > d)
      throw new IllegalArgumentException(
        s"vector of dimension $n exceeds the model dimension $d")
    // center once, not once per output row
    val c = new Array[Double](d)
    var i = 0
    while (i < n) {
      if (in.isNullAt(i)) return null
      val x = if (elemIsFloat) in.getFloat(i).toDouble else in.getDouble(i)
      c(i) = x - mean(i)
      i += 1
    }
    while (i < d) { c(i) = 0.0; i += 1 }
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val row = matrix(j)
      var s = 0.0
      i = 0
      while (i < d) { s += row(i) * c(i); i += 1 }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("affineProject", this, classOf[AffineProject].getName)
    val tmp = ctx.freshName("apres")
    nullSafeCodeGen(ctx, ev, c => s"""
       |Object $tmp = $ref.compute($c);
       |if ($tmp == null) { ${ev.isNull} = true; } else {
       |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp;
       |}
     """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Per-vector int8 scalar quantization: struct(qmin, qscale, codes) with
 * codes(i) = HALF_UP((x_i − min)/scale) − 128, scale = (max − min)/255.
 * One min/max pass + one code pass (O(2d) — the naive higher-order
 * `transform` formulation re-evaluates array_min/array_max inside the
 * lambda, O(d²) per vector). Vectors containing NaN/±Infinity quantize
 * to NULL — a poisoned embedding must yield a detectable null, not
 * silently collapsed codes. The arithmetic matches the SQL oracle
 * byte-for-byte: HALF_UP(t) = floor(t + 0.5) for the non-negative t
 * this mapping produces.
 */
case class QuantizeInt8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("qmin", DoubleType, nullable = false),
    StructField("qscale", DoubleType, nullable = false),
    StructField("codes", ArrayType(ByteType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_int8 requires array<float> or array<double>, got ${other.catalogString}")
    }

  private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def compute(in: ArrayData): Any = {
    val n = in.numElements()
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      if (in.isNullAt(i)) return null
      val x = if (elemIsFloat) in.getFloat(i).toDouble else in.getDouble(i)
      if (x.isNaN || x.isInfinite) return null
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    if (n == 0) return null
    val scale = (mx - mn) / 255.0
    val codes = new Array[Byte](n)
    i = 0
    while (i < n) {
      val x = if (elemIsFloat) in.getFloat(i).toDouble else in.getDouble(i)
      codes(i) =
        if (scale == 0.0) (-128).toByte
        else (math.floor((x - mn) / scale + 0.5) - 128).toByte
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](mn, scale, new GenericArrayData(codes)))
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantizeInt8", this, classOf[QuantizeInt8].getName)
    val tmp = ctx.freshName("qres")
    nullSafeCodeGen(ctx, ev, c => s"""
       |Object $tmp = $ref.compute($c);
       |if ($tmp == null) { ${ev.isNull} = true; } else {
       |  ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $tmp;
       |}
     """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Inverse of [[QuantizeInt8]]: struct(qmin, qscale, codes) →
 * array<double>, x̂_i = qmin + (code_i + 128)·qscale. One pass, no
 * per-element field re-evaluation. A NULL code element makes the whole
 * reconstruction NULL (a silent 0-byte read would fabricate a
 * plausible value — same policy as [[AffineProject]]). */
case class DequantizeInt8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // codes must be BYTES: an int-coded array would mis-read 1 byte of
      // each 4-byte slot on unsafe storage — reject at analysis like
      // AffineProject does for its input
      case s: StructType if s.length == 3 &&
        s(0).dataType == DoubleType && s(1).dataType == DoubleType &&
        (s(2).dataType match {
          case ArrayType(ByteType, _) => true
          case _ => false
        }) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dequantize_int8 requires struct(qmin: double, qscale: double, " +
            s"codes: array<tinyint>), got ${other.catalogString}")
    }

  def compute(row: InternalRow): Any = {
    val mn = row.getDouble(0)
    val scale = row.getDouble(1)
    val codes = row.getArray(2)
    val n = codes.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (codes.isNullAt(i)) return null
      out(i) = mn + (codes.getByte(i).toDouble + 128.0) * scale
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dequantizeInt8", this, classOf[DequantizeInt8].getName)
    val tmp = ctx.freshName("dqres")
    nullSafeCodeGen(ctx, ev, c => s"""
       |Object $tmp = $ref.compute($c);
       |if ($tmp == null) { ${ev.isNull} = true; } else {
       |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp;
       |}
     """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorExpressions {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def l2normalize(v: Column): Column =
    ColumnBridge.column(L2Normalize(ColumnBridge.expression(v)))
  def minhashSignature(sh: Column, numHashes: Int, seed: Long): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(sh), numHashes, seed))
  def shingleHashes(text: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), k))
  def spanHashes(text: Column, k: Int): Column =
    ColumnBridge.column(SpanHashes(ColumnBridge.expression(text), k))
  def simhash64(sh: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(sh)))
  def hyperplaneKeys(v: Column, dim: Int, nTables: Int, nBits: Int, seed: Long,
      probes: Int = 0): Column =
    ColumnBridge.column(HyperplaneKeys(ColumnBridge.expression(v), dim, nTables, nBits, seed, probes))
  def fingerprint64(text: Column): Column =
    ColumnBridge.column(Fingerprint64(ColumnBridge.expression(text)))
  def bloomMightContain(key: Column, bloomBytes: Array[Byte]): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(key), bloomBytes))
  def longSetContains(key: Column, sortedKeys: Array[Long]): Column =
    ColumnBridge.column(LongSetContains(ColumnBridge.expression(key), sortedKeys))
  def randomProject(v: Column, outDim: Int, seed: Long): Column =
    ColumnBridge.column(RandomProject(ColumnBridge.expression(v), outDim, seed))
  def nearestCells(v: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    ColumnBridge.column(NearestCells(ColumnBridge.expression(v), centroids, nProbe))
  def pqEncode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v), codebooks))
  def pqAdcScore(qv: Column, codes: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqAdcScore(ColumnBridge.expression(qv), ColumnBridge.expression(codes), codebooks))
  def affineProject(v: Column, matrix: Array[Array[Double]], mean: Array[Double]): Column =
    ColumnBridge.column(AffineProject(ColumnBridge.expression(v), matrix, mean))
  def quantizeInt8(v: Column): Column =
    ColumnBridge.column(QuantizeInt8(ColumnBridge.expression(v)))
  def dequantizeInt8(q: Column): Column =
    ColumnBridge.column(DequantizeInt8(ColumnBridge.expression(q)))
}
