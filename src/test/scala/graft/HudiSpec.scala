package graft

import graft.functions.Hudi
import org.scalatest.funsuite.AnyFunSuite

/** m63 — Hudi timeline census: properties parsing, instant lifecycle
 * invariants, write-stat aggregation, negatives. Pure (the Spark
 * path is gate-checked by the m63 oracle). */
class HudiSpec extends AnyFunSuite {

  test("parseProperties: contract") {
    val good = "#c\nhoodie.table.name=t1\nhoodie.table.type=COPY_ON_WRITE\n"
    assert(Hudi.parseProperties(good).get("hoodie.table.name") === "t1")
    assert(Hudi.parseProperties("hoodie.table.name=t1\n").isEmpty,
      "type is mandatory")
    assert(Hudi.parseProperties(good + "junkline\n").isEmpty)
    assert(Hudi.parseProperties(null).isEmpty)
  }

  test("closed-form replay (IDs 0-59): commits, pending, negatives") {
    (0L until 60L).foreach { t =>
      val files = Hudi.syntheticHudiTable(t)
      val got = Hudi.resolveTable(files)
      if (t % 9 == 4 || t % 11 == 6) {
        assert(got.isEmpty, s"t=$t must be withheld")
      } else {
        val rows = got.getOrElse(fail(s"t=$t did not resolve"))
        assert(rows.size === (1 + t % 3).toInt, s"t=$t commit count")
        rows.zipWithIndex.foreach { case (r, i) =>
          assert(r._1 === f"202401010000$i%02d", s"t=$t time")
          assert(r._2 === (if (t % 2 == 0) "commit" else "deltacommit"))
          val nParts = (1 + (t + i) % 2).toInt
          val files2 = (0 until nParts)
            .map(q => (1 + (t + i + q) % 2).toInt)
          assert(r._3 === nParts && r._4 === files2.sum, s"t=$t counts")
          val writes = (for {
            q <- 0 until nParts
            j <- 0 until (1 + (t + i + q) % 2).toInt
          } yield 10 + (t + i + q + j) % 20).sum
          assert(r._5 === writes, s"t=$t writes")
          assert(r._6 === files2.sum * ((t + i) % 3), s"t=$t deletes")
          assert(r._8 ===
            (if (t % 2 == 0) "COPY_ON_WRITE" else "MERGE_ON_READ"))
          assert(r._9 === (if (t % 4 == 1) 1 else 0), s"t=$t pending")
        }
      }
    }
  }

  test("lifecycle invariants refuse") {
    val t = 2L
    val files = Hudi.syntheticHudiTable(t)
    assert(Hudi.resolveTable(files).isDefined)
    // a completed instant missing its inflight transition
    assert(Hudi.resolveTable(
      files.filterNot(_._1 == "20240101000000.commit.inflight")).isEmpty)
    // malformed commit JSON
    assert(Hudi.resolveTable(files.map { case (n, c) =>
      if (n == "20240101000000.commit") (n, c.dropRight(3)) else (n, c)
    }).isEmpty)
    // a foreign file in the timeline directory
    assert(Hudi.resolveTable(files :+ (("notes.txt", "x"))).isEmpty)
    // no properties at all
    assert(Hudi.resolveTable(
      files.filterNot(_._1 == "hoodie.properties")).isEmpty)
  }
}
