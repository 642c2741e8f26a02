package graft.functions

import graft.SparkTestBase

/** Pins `Dedup.verifyJaccard` edge semantics — written during the r17
 * size-prefilter experiments (both variants measured slower on the real
 * d02 shape and were rejected; see the verifyJaccard comment). Any future
 * width optimization must reproduce these literal expectations:
 * exact-boundary pairs survive, FP-hostile thresholds don't lose pairs,
 * candidates absent from sigs drop via the inner join. */
class VerifyJaccardSpec extends SparkTestBase {

  test("exact-boundary pairs verify; size-incompatible and absent-id " +
      "candidates drop") {
    val sigs = df(Seq(
      Seq(1L, Seq(100L, 101L)),                  // sz 2
      Seq(2L, Seq(100L, 101L, 102L, 103L)),      // sz 4
      Seq(3L, Seq(900L)),                        // sz 1
      Seq(4L, Seq(100L, 101L))),                 // sz 2, dup of 1
      "id:long,sh:[long]")
    val candidates = df(Seq(
      Seq(1L, 2L),  // J = 2/4 = 0.5 — EXACTLY at threshold; size bound
                    // t*sz_b = 2 <= sz_a = 2 is boundary-exact too
      Seq(2L, 3L),  // size-incompatible at t=0.5 (1 vs 4) and J = 0
      Seq(1L, 4L),  // identical sets, J = 1
      Seq(1L, 99L)  // id absent from sigs — dropped by the inner join
    ), "id_a:long,id_b:long")
    val got = Dedup.verifyJaccard(candidates, sigs, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got === Map((1L, 2L) -> 0.5, (1L, 4L) -> 1.0))
  }

  test("threshold boundary under FP-hostile sizes (t*|S| lands a hair above " +
      "an integer)") {
    // |A| = 20, |B| = 11, inter = 11 (B ⊂ A): J = 11/20 = 0.55. At
    // t = 0.55 the size bound is t*20 = 11.000000000000002 in IEEE —
    // without the nudge |B| = 11 would be dropped and the qualifying pair
    // lost before verification.
    val aSh = (1L to 20L).toSeq
    val bSh = (1L to 11L).toSeq
    val sigs = df(Seq(Seq(1L, aSh), Seq(2L, bSh)), "id:long,sh:[long]")
    val candidates = df(Seq(Seq(1L, 2L)), "id_a:long,id_b:long")
    val got = Dedup.verifyJaccard(candidates, sigs, 0.55).collect()
    assert(got.length === 1 && got(0).getDouble(2) === 0.55)
  }
}
