package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Bench outlier self-adjudication (r15) reads its per-query
 * reference figures from BASELINE.md's fenced `json bench-ledger`
 * block — pin that the block exists, parses, and covers both suites,
 * so a malformed edit cannot silently disarm the re-measure pass. */
class BenchLedgerSpec extends AnyFunSuite {

  test("BASELINE.md bench-ledger parses and covers both suites") {
    val refs = Bench.ledger()
    assert(refs.size >= 36, s"ledger has ${refs.size} entries (want 14 + 22)")
    // headline + h-suite representatives, with sane magnitudes
    Seq("q01_agg", "d02_dedup_minhash", "t03_langid", "h01_tpch",
      "h22_tpch").foreach { q =>
      val v = refs.getOrElse(q, fail(s"$q missing from ledger"))
      assert(v > 0.01 && v < 60.0, s"$q=$v out of range")
    }
    // every benchQueries name has a reference (outlier pass covers all)
    SparkEntry.benchQueries.filter(SparkEntry.queries.contains).foreach { q =>
      assert(refs.contains(q), s"headline query $q missing from ledger")
    }
  }

  test("explicit SPARK_GRAFT_BASELINE override is authoritative (r17): a " +
      "missing path disables the ledger instead of falling back") {
    // the sf1 series points the override at a missing file to disarm the
    // sf0.1-based outlier pass; the old fallback silently re-armed it
    assert(Bench.ledger(_ => true, Some("/nonexistent/baseline.md")).isEmpty)
    assert(Bench.ledger(_ => true, None).nonEmpty) // unset -> BASELINE.md
  }
}
