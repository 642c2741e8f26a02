package graft.operators

import graft.functions.expressions.VectorExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bloom-prefiltered joins: the 100 TB pattern for joining a huge probe
 * side against a moderate build side when the join is selective. A plain
 * shuffle semi-join moves the ENTIRE probe side through the exchange; a
 * Bloom filter of the build side's keys, probed natively at the probe
 * side's scan, drops definitely-unmatched rows BEFORE the shuffle, so the
 * exchange carries only (matches + fpp·misses) rows. The exact join after
 * the prefilter removes Bloom false positives — the composition is
 * exactly the semi-join, never an approximation (Bloom filters have no
 * false negatives).
 *
 * This is the same mechanism as Spark's AQE runtime row-level filtering
 * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), exposed as an
 * explicit operator: the optimizer's version only fires on selective
 * broadcast-join patterns it can prove; this one is under user control
 * (reference has no counterpart — fugue delegates join planning wholesale,
 * SURVEY.md §4.1).
 *
 * Sizing: a Bloom filter at fpp=0.03 costs ~7.3 bits/key — 100 M build
 * keys ≈ 91 MB, at the edge of comfortable broadcast; beyond that raise
 * `fpp` (the join stays exact — fpp only tunes how many probe rows slip
 * through to the exchange) or fall back to a plain shuffle join.
 */
object BloomJoin {

  /** Serialized Bloom filter of `build[key]`, built distributed: per-
   * partition partial filters, OR-merged up a tree (`treeAggregate` — the
   * driver receives ONE filter, not one per partition). `expectedItems <
   * 0` triggers a `count()` of the build side — one cheap action over the
   * SMALL side, the same pattern as the reference's ROWCOUNT partitioning
   * (row count upper-bounds distinct keys; oversizing a Bloom filter only
   * costs bits, never correctness).
   *
   * Key encoding (must stay in lockstep with [[graft.functions.expressions
   * .BloomMightContain]]): integral keys `putLong`, strings their UTF-8
   * bytes; null keys are skipped (a null never equals any probe key). */
  def buildBloomBytes(
      build: DataFrame, key: String,
      fpp: Double = 0.03, expectedItems: Long = -1L): Array[Byte] = {
    import org.apache.spark.sql.types._
    import org.apache.spark.util.sketch.BloomFilter
    val n = if (expectedItems >= 0L) expectedItems else build.count()
    val put: (BloomFilter, Any) => Unit = build.schema(key).dataType match {
      case StringType => (f, v) =>
        f.putBinary(v.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case ByteType | ShortType | IntegerType | LongType => (f, v) =>
        f.putLong(v.asInstanceOf[Number].longValue())
      case other => throw new IllegalArgumentException(
        s"bloom join requires an integral or string key, got ${other.catalogString}")
    }
    val bf = build.select(key).rdd.treeAggregate(
      BloomFilter.create(math.max(n, 1L), fpp))(
      (f, row) => { if (!row.isNullAt(0)) put(f, row.get(0)); f },
      (a, b) => { a.mergeInPlace(b); a })
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Exact `probe LEFT SEMI JOIN build ON probe(key) = build(key)`, with
   * the probe side Bloom-prefiltered at its scan. */
  def semiJoin(
      probe: DataFrame, build: DataFrame, key: String,
      fpp: Double = 0.03, expectedItems: Long = -1L): DataFrame = {
    val bytes = buildBloomBytes(build, key, fpp, expectedItems)
    probe.filter(VectorExpressions.bloomMightContain(col(key), bytes))
      .join(build.select(key), Seq(key), "left_semi")
  }

  /** Exact `probe LEFT ANTI JOIN build`: rows the Bloom filter rejects are
   * DEFINITELY absent from the build side and bypass the join entirely;
   * only the "maybe" rows (matches + fpp·misses) reach the exchange. */
  def antiJoin(
      probe: DataFrame, build: DataFrame, key: String,
      fpp: Double = 0.03, expectedItems: Long = -1L): DataFrame = {
    val bytes = buildBloomBytes(build, key, fpp, expectedItems)
    val maybe = VectorExpressions.bloomMightContain(col(key), bytes)
    // null keys: mightContain is null-safe-eval'd to null → !null = null →
    // filtered out of BOTH branches, matching anti-join's null semantics
    // (a null key never equals any build key, so anti KEEPS it)
    val definiteMiss = probe.filter(!maybe || col(key).isNull)
    val maybeHit = probe.filter(maybe && col(key).isNotNull)
      .join(build.select(key), Seq(key), "left_anti")
    definiteMiss.unionByName(maybeHit)
  }
}
