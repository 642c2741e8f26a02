package graft

import graft.functions.Xz
import org.scalatest.funsuite.AnyFunSuite

/** XZ census: the real-encoder fixture against its closed block form,
 * a size differential against the encoder's own decoder, and the
 * strict structure contract (CRCs, flags, padding, reserved ids). */
class XzSpec extends AnyFunSuite {

  test("fixture parses to the closed block form (IDs 0-199)") {
    (0L until 200L).foreach { id =>
      val got = Xz.parseBlocks(Xz.syntheticXz(id))
      if (id % 8 == 6) {
        assert(got.isEmpty, s"id=$id flipped index CRC must refuse")
      } else {
        val bs = got.getOrElse(fail(s"id=$id did not parse"))
        val chk = Seq("crc32", "crc64", "none")((id % 3).toInt)
        val n = (1 + id % 3).toInt
        val wantS0 = (0 until n).map(k =>
          (0, k, 30L + (id * 3 + k * 7) % 100, chk))
        val want = wantS0 ++ (if (id % 5 == 3)
          Seq((1, 0, 20L + id % 50, chk)) else Seq.empty)
        assert(bs.map(b => (b.stream, b.block, b.uncompressed, b.check))
          === want, s"id=$id")
        assert(bs.forall(_.unpadded > 12), s"id=$id unpadded positivity")
      }
    }
  }

  test("index sizes agree with the encoder's own decoder") {
    // total uncompressed size from OUR index walk must equal what
    // XZInputStream actually inflates — the metadata-vs-data check
    (0L until 40L).filter(_ % 8 != 6).foreach { id =>
      val payload = Xz.syntheticXz(id)
      val mine = Xz.parseBlocks(payload).get.map(_.uncompressed).sum
      val in = new org.tukaani.xz.XZInputStream(
        new java.io.ByteArrayInputStream(payload))
      var total = 0L
      val buf = new Array[Byte](4096)
      var k = in.read(buf)
      while (k >= 0) { total += k; k = in.read(buf) }
      in.close()
      assert(mine === total, s"id=$id")
    }
  }

  test("structure contract: the forms that must refuse") {
    val ok = Xz.syntheticXz(1L)
    assert(Xz.parseBlocks(null) === None)
    assert(Xz.parseBlocks(Array.emptyByteArray) === None)
    assert(Xz.parseBlocks("not xz at all, just text padding".getBytes)
      === None)
    // footer magic flip
    val badYz = ok.clone(); badYz(ok.length - 1) = 'Q'
    assert(Xz.parseBlocks(badYz) === None)
    // footer CRC flip
    val badFcrc = ok.clone()
    badFcrc(ok.length - 12) = (badFcrc(ok.length - 12) ^ 1).toByte
    assert(Xz.parseBlocks(badFcrc) === None)
    // header magic flip
    val badHdr = ok.clone(); badHdr(0) = 0
    assert(Xz.parseBlocks(badHdr) === None)
    // header/footer flag disagreement (check id byte in the header)
    val badFlag = ok.clone(); badFlag(7) = (badFlag(7) ^ 5).toByte
    assert(Xz.parseBlocks(badFlag) === None)
    // truncation anywhere refuses
    (1 until ok.length).foreach { cut =>
      assert(Xz.parseBlocks(ok.take(cut)) === None, s"cut=$cut")
    }
    // stream padding: multiples of 4 nulls parse, a ragged tail refuses
    assert(Xz.parseBlocks(ok ++ new Array[Byte](8)).isDefined)
    assert(Xz.parseBlocks(ok ++ new Array[Byte](2)) === None)
    // non-null bytes where padding belongs refuse
    assert(Xz.parseBlocks(ok ++ Array[Byte](0, 0, 0, 1)) === None)
  }
}
