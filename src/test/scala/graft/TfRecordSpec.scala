package graft

import graft.functions.TfRecord
import org.scalatest.funsuite.AnyFunSuite

/** TFRecord walk: the fixture against its closed record form, the
 * masked-CRC corruption contract, and the framing corners (truncation
 * at every boundary, crafted wrap-around lengths, empty records and
 * empty shards). */
class TfRecordSpec extends AnyFunSuite {

  test("fixture parses to the closed record form (IDs 0-199)") {
    (0L until 200L).foreach { id =>
      val got = TfRecord.parseRecords(TfRecord.syntheticTfRecord(id))
      if (id % 10 == 7) {
        assert(got.isEmpty, s"id=$id flipped data bit must refuse")
      } else {
        val rs = got.getOrElse(fail(s"id=$id did not parse"))
        val n = (2 + id % 5).toInt
        assert(rs.size === n, s"id=$id")
        var off = 0L
        (0 until n).foreach { k =>
          val m = if (k == 1 && id % 6 == 3) 0L
          else 10 + (id * 7 + k * 13) % 120
          assert(rs(k) === TfRecord.Rec(off, m), s"id=$id k=$k")
          off += 16 + m
        }
      }
    }
  }

  test(".tfrecord.gz composition: gzip layer reassembles, both corruption layers refuse") {
    (0L until 200L).foreach { id =>
      val gz = TfRecord.syntheticTfRecordGz(id)
      val decoded = graft.functions.Gzip.inflateConcat(gz)
      if (id % 9 == 8) {
        assert(decoded.isEmpty, s"id=$id flipped ISIZE must refuse at the gzip layer")
      } else {
        // RFC 1952 reassembly must be byte-exact vs the uncompressed fixture
        assert(java.util.Arrays.equals(
          decoded.getOrElse(fail(s"id=$id gzip layer refused")),
          TfRecord.syntheticTfRecord(id)), s"id=$id reassembly")
        // member layout: two members at a record boundary when id%4==1
        val nMembers = graft.functions.Gzip.parseMembers(gz).get.size
        assert(nMembers === (if (id % 4 == 1) 2 else 1), s"id=$id members")
        // the composed walk equals the plain walk on the decoded stream
        val direct = TfRecord.parseRecords(decoded.get)
        if (id % 10 == 7) assert(direct.isEmpty,
          s"id=$id record CRC corruption must survive the gzip layer")
        else assert(direct ===
          TfRecord.parseRecords(TfRecord.syntheticTfRecord(id)), s"id=$id")
      }
    }
  }

  test("framing corners: truncation, wrap lengths, empty forms") {
    val ok = TfRecord.syntheticTfRecord(2L)
    // truncation at EVERY byte boundary must refuse (a prefix of a
    // valid stream is only clean if it ends exactly between records)
    val recordEnds = TfRecord.parseRecords(ok).get
      .map(r => r.offset + 12 + r.dataBytes + 4).toSet
    (1 until ok.length).foreach { cut =>
      val got = TfRecord.parseRecords(ok.take(cut))
      if (recordEnds.contains(cut.toLong))
        assert(got.isDefined, s"cut=$cut is a record boundary")
      else assert(got.isEmpty, s"cut=$cut must refuse")
    }
    // flipped length-CRC byte refuses
    val badLenCrc = ok.clone()
    badLenCrc(8) = (badLenCrc(8) ^ 1).toByte
    assert(TfRecord.parseRecords(badLenCrc) === None)
    // crafted length near Long.MaxValue: the subtractive bound must
    // refuse instead of wrapping into a negative index
    val wrap = new Array[Byte](24)
    java.util.Arrays.fill(wrap, 0, 8, 0xff.toByte)
    wrap(7) = 0x7f.toByte
    assert(TfRecord.parseRecords(wrap) === None)
    // an empty shard is clean; null is not
    assert(TfRecord.parseRecords(Array.emptyByteArray) ===
      Some(IndexedSeq.empty))
    assert(TfRecord.parseRecords(null) === None)
    // a single empty record round-trips (id%6==3 plants one mid-shard)
    val withEmpty = TfRecord.syntheticTfRecord(3L)
    val rs = TfRecord.parseRecords(withEmpty).get
    assert(rs(1).dataBytes === 0L)
  }
}
