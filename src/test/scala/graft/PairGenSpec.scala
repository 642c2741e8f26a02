package graft

import graft.functions.Dedup
import org.apache.spark.sql.DataFrame

/** Edge-semantics pinning for `Dedup.bucketPairs` (the candidate-pair core
 * shared by the minhash/simhash banding, hamming64Pairs and the
 * lsh/ivfCosinePairs stages), written during the r16 optimization round:
 * an experiment replaced the self-join with a per-bucket pair generator
 * and was REVERTED after an sf1-scale parallelism-collapse straggler
 * (OPTIMIZATION_r16.md experiment A2). These literal expectations pin the
 * exact semantics any future reformulation must reproduce: duplicate ids
 * in one bucket, null ids (count toward the cap, pair with nothing), cap
 * boundaries, cross-bucket pair dedup, string ids, multi-column keys. */
class PairGenSpec extends SparkTestBase {

  private def pairsOf(d: DataFrame): Set[(Any, Any)] =
    d.collect().map(r => (r.get(0), r.get(1))).toSet

  test("bucketPairs: distinct ids, dup ids, cap boundary, singleton buckets") {
    val banded = df(Seq(
      // bucket 1: three distinct ids
      Seq(10L, 1L), Seq(11L, 1L), Seq(12L, 1L),
      // bucket 2: duplicate id (two rows of id 20) + one other — no self
      // pair, (20, 21) exactly once after the distinct
      Seq(20L, 2L), Seq(20L, 2L), Seq(21L, 2L),
      // bucket 3: exactly at the cap (4 rows with cap 4) — admitted
      Seq(30L, 3L), Seq(31L, 3L), Seq(32L, 3L), Seq(33L, 3L),
      // bucket 4: above the cap (5 rows with cap 4) — must vanish
      Seq(40L, 4L), Seq(41L, 4L), Seq(42L, 4L), Seq(43L, 4L), Seq(44L, 4L),
      // bucket 5: single member — no pairs
      Seq(50L, 5L)), "id:long,bk:long")
    val capped = pairsOf(Dedup.bucketPairs(banded, Seq("bk"), 4))
    assert(capped === Set(
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L),
      (30L, 31L), (30L, 32L), (30L, 33L), (31L, 32L), (31L, 33L), (32L, 33L)))
    val uncapped = pairsOf(Dedup.bucketPairs(banded, Seq("bk"), 1000))
    assert(uncapped.size === capped.size + 10) // bucket 4's C(5,2) pairs
    assert(uncapped.contains((40L, 44L)))
  }

  test("bucketPairs: null ids count toward the cap but pair with nothing") {
    val banded = df(Seq(
      Seq[Any](null, 1L), Seq[Any](60L, 1L), Seq[Any](61L, 1L),
      Seq[Any](70L, 2L), Seq[Any](null, 2L)), "id:long,bk:long")
    // cap 2: bucket 1 holds 3 ROWS (null included) — over the cap, gone;
    // bucket 2 holds 2 rows but its only pair involves a null — empty
    assert(pairsOf(Dedup.bucketPairs(banded, Seq("bk"), 2)) === Set.empty)
    // cap 3: bucket 1 admitted; the null pairs with nothing
    assert(pairsOf(Dedup.bucketPairs(banded, Seq("bk"), 3)) === Set((60L, 61L)))
  }

  test("bucketPairs: string ids, multi-column bucket key, cross-bucket dedup") {
    val banded = df(Seq(
      Seq("docB", 1L, "x"), Seq("docA", 1L, "x"), Seq("docC", 1L, "x"),
      Seq("docA", 1L, "y"), Seq("docB", 1L, "y"),
      Seq("docZ", 2L, "x")), "id:str,band:long,bh:str")
    val got = pairsOf(Dedup.bucketPairs(banded, Seq("band", "bh"), 100))
    // (docA, docB) co-occurs in two buckets — exactly one output pair
    assert(got === Set(
      ("docA", "docB"), ("docA", "docC"), ("docB", "docC")))
  }

  test("bucketPairs: the pair set is invariant in the cap value above " +
      "every bucket size (pins any future capped-arm specialization)") {
    // the r17 salt experiment (reverted — see the bucketPairs comment)
    // specialized on the cap; any future arm split must keep pair sets
    // identical across the boundary, nulls and dup ids included
    val banded = df(Seq(
      Seq[Any](10L, 1L), Seq[Any](11L, 1L), Seq[Any](12L, 1L),
      Seq[Any](20L, 2L), Seq[Any](20L, 2L), Seq[Any](null, 2L), Seq[Any](21L, 2L),
      Seq[Any](30L, 3L)), "id:long,bk:long")
    val atBound = pairsOf(Dedup.bucketPairs(banded, Seq("bk"), 2048))
    val aboveBound = pairsOf(Dedup.bucketPairs(banded, Seq("bk"), 2049))
    assert(aboveBound === atBound)
    assert(atBound === Set((10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L)))
  }

  test("bucketPairs: a multi-thousand-member bucket emits the exact " +
      "complete pair set (pins the quadratic expansion's correctness)") {
    // 3000-member bucket (incl. one null and one duplicated id) with cap
    // 5000. Every pair of the 2998 distinct non-null ids exactly once —
    // the literal expectation any reformulation (salting, generators)
    // must reproduce.
    val rows = (1L to 2998L).map(i => Seq[Any](i, 7L)) ++
      Seq(Seq[Any](null, 7L), Seq[Any](1L, 7L)) ++
      Seq(Seq[Any](9001L, 8L), Seq[Any](9002L, 8L)) // small co-bucket
    val banded = df(rows, "id:long,bk:long")
    val out = Dedup.bucketPairs(banded, Seq("bk"), 5000)
    val n = out.count()
    assert(n === 2998L * 2997L / 2 + 1) // C(2998,2) + the bucket-8 pair
    val sample = out.filter("id_a = 1").count()
    assert(sample === 2997L)
  }

  test("cooccur counts keep pair multiplicity (shared-shingle counts)") {
    // doc 1 and 2 share shingles {100, 101}; doc 3 shares only {100}:
    // inter(1,2) = 2, inter(1,3) = inter(2,3) = 1
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
