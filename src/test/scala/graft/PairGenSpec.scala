package graft

import graft.functions.Dedup
import graft.functions.expressions.VectorExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential pinning for the r16 candidate-pair optimization: the
 * per-bucket [[graft.functions.expressions.SortedPairs]] generator must
 * reproduce the former self-join formulation EXACTLY (pair set for
 * bucketPairs, pair multiset for the co-occurrence counts), on the
 * adversarial shapes the join handled implicitly: duplicate ids in one
 * bucket, null ids, cap boundaries, string ids, single-member buckets. */
class PairGenSpec extends SparkTestBase {

  /** The former self-join formulation of bucketPairs, kept verbatim as the
   * semantic reference. */
  private def bucketPairsJoin(
      banded: DataFrame, bucketCols: Seq[String], maxBucketSize: Int): DataFrame = {
    val keys = bucketCols.map(col)
    val useful = banded.groupBy(keys: _*).agg(count(lit(1)).as("__bsz"))
      .filter(col("__bsz").between(2, maxBucketSize))
      .select(keys: _*)
    val pruned = banded.join(useful, bucketCols)
    val a = pruned.select((keys :+ col("id").as("id_a")): _*)
    val b = pruned.select((keys :+ col("id").as("id_b")): _*)
    a.join(b, bucketCols).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  private def pairsOf(d: DataFrame): Set[(Any, Any)] =
    d.collect().map(r => (r.get(0), r.get(1))).toSet

  test("sorted_pairs generator: basic, equal values, nulls, short arrays") {
    val d = df(Seq(
      Seq(Seq(1L, 2L, 3L)),
      Seq(Seq(5L, 5L, 7L)), // equal values pair only across, never within
      Seq(Seq(9L)), // single member: no pairs
      Seq(Seq.empty[Long])), "ids:[long]")
    val got = d.select(VectorExpressions.sortedPairs(col("ids"))
      .as(Seq("id_a", "id_b"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === Seq((1L, 2L), (1L, 3L), (2L, 3L), (5L, 7L), (5L, 7L)).sorted)
  }

  test("bucketPairs == former self-join: longs, dup ids, cap boundary") {
    val banded = df(Seq(
      // bucket 1: three distinct ids
      Seq(10L, 1L), Seq(11L, 1L), Seq(12L, 1L),
      // bucket 2: duplicate id (two rows of id 20) + one other
      Seq(20L, 2L), Seq(20L, 2L), Seq(21L, 2L),
      // bucket 3: exactly at the cap (4 rows with cap 4)
      Seq(30L, 3L), Seq(31L, 3L), Seq(32L, 3L), Seq(33L, 3L),
      // bucket 4: above the cap (5 rows with cap 4) — must vanish
      Seq(40L, 4L), Seq(41L, 4L), Seq(42L, 4L), Seq(43L, 4L), Seq(44L, 4L),
      // bucket 5: single member — no pairs
      Seq(50L, 5L)), "id:long,bk:long")
    for (cap <- Seq(4, 1000)) {
      val nw = pairsOf(Dedup.bucketPairs(banded, Seq("bk"), cap))
      val old = pairsOf(bucketPairsJoin(banded, Seq("bk"), cap))
      assert(nw === old, s"cap $cap")
    }
  }

  test("bucketPairs == former self-join: null ids count toward the cap") {
    // null id occupies a bucket slot (count-based guard) but pairs with
    // nothing — both formulations must agree, including at the boundary
    // where the null row pushes the bucket over the cap
    val banded = df(Seq(
      Seq[Any](null, 1L), Seq[Any](60L, 1L), Seq[Any](61L, 1L),
      Seq[Any](70L, 2L), Seq[Any](null, 2L)), "id:long,bk:long")
    for (cap <- Seq(2, 3, 1000)) {
      val nw = pairsOf(Dedup.bucketPairs(banded, Seq("bk"), cap))
      val old = pairsOf(bucketPairsJoin(banded, Seq("bk"), cap))
      assert(nw === old, s"cap $cap")
    }
  }

  test("bucketPairs == former self-join: string ids, multi-column bucket key") {
    val banded = df(Seq(
      Seq("docB", 1L, "x"), Seq("docA", 1L, "x"), Seq("docC", 1L, "x"),
      Seq("docA", 1L, "y"), Seq("docB", 1L, "y"),
      Seq("docZ", 2L, "x")), "id:str,band:long,bh:str")
    val nw = pairsOf(Dedup.bucketPairs(banded, Seq("band", "bh"), 100))
    val old = pairsOf(bucketPairsJoin(banded, Seq("band", "bh"), 100))
    assert(nw === old)
    // cross-bucket dedup: (docA, docB) appears in two buckets, one pair out
    assert(nw.contains(("docA", "docB")))
  }

  test("cooccur counts keep self-join multiplicity (shared-shingle counts)") {
    // doc 1 and 2 share shingles {100, 101}; doc 3 shares only {100}:
    // inter(1,2) = 2, inter(1,3) = inter(2,3) = 1 — through the public
    // jaccard surface so the generator path is what computes it
    val sigs = df(Seq(
      Seq(1L, Seq(100L, 101L, 102L)),
      Seq(2L, Seq(100L, 101L, 103L)),
      Seq(3L, Seq(100L, 104L, 105L))), "id:long,sh:[long]")
    val got = Dedup.ngramJaccardCooccur(sigs, threshold = 0.1, Int.MaxValue)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got((1L, 2L)) === 2.0 / 4.0)
    assert(got((1L, 3L)) === 1.0 / 5.0)
    assert(got((2L, 3L)) === 1.0 / 5.0)
  }
}
