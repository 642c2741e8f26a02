package graft

import graft.functions.Zstd
import org.scalatest.funsuite.AnyFunSuite

/** Zstd frame census: the fixture against its closed form (flags,
 * sizes, skippable frames, block walk), the 2-byte FCS form, and the
 * corrupt contract. */
class ZstdSpec extends AnyFunSuite {

  test("fixture decodes to the closed frame form (IDs 0-59)") {
    (0L until 60L).foreach { id =>
      val fs = Zstd.parseFrames(Zstd.syntheticZstd(id))
        .getOrElse(fail(s"id=$id did not parse"))
      val nZstd = (1 + id % 3).toInt
      val skippable = id % 4 == 1
      assert(fs.size === nZstd + (if (skippable) 1 else 0), s"id=$id")
      // offsets tile the payload exactly
      fs.sliding(2).foreach {
        case Seq(a, b) => assert(a.offset + a.frameBytes === b.offset)
        case _ =>
      }
      if (skippable) {
        val sk = fs(1)
        assert(sk.kind === "skippable", s"id=$id")
        assert(sk.frameBytes === 8 + 8 + id % 16, s"id=$id")
        assert(sk.contentSize === None)
      }
      fs.filter(_.kind == "zstd").zipWithIndex.foreach { case (fr, f) =>
        val nb = (1 + (id + f) % 2).toInt
        assert(fr.nBlocks === nb, s"id=$id f=$f")
        val total = (0 until nb).map { bk =>
          if ((id + f + bk) % 2 == 0) 10 + (id * 3 + f * 7 + bk) % 30
          else 5 + (id + f + bk) % 20
        }.sum
        val ss = (id + f) % 5 == 0
        if (ss) {
          assert(fr.windowSize === None, s"id=$id f=$f")
          assert(fr.contentSize === Some(total.toLong), s"id=$id f=$f")
        } else {
          val exp = ((id + f) % 10).toInt
          val man = ((id * 3 + f) % 8).toInt
          val base = 1L << (10 + exp)
          assert(fr.windowSize === Some(base + base / 8 * man), s"id=$id f=$f")
          val expectCs = ((id + f) % 3) match {
            case 0 => None
            case _ => Some(total.toLong)
          }
          assert(fr.contentSize === expectCs, s"id=$id f=$f")
        }
        val expectDict = ((id + f) % 4) match {
          case 0 => None
          case 1 => Some(1 + id % 200)
          case 2 => Some(300 + id % 60000)
          case _ => Some(70000 + id % 100000)
        }
        assert(fr.dictId === expectDict, s"id=$id f=$f")
        assert(fr.hasChecksum === ((id + f) % 3 == 0), s"id=$id f=$f")
      }
    }
  }

  test("the 2-byte FCS form decodes as value+256") {
    // hand-build: non-ss frame, fcsFlag=1, no dict, no checksum,
    // window byte 0, FCS field 0x0044 → content 0x44+256 = 324,
    // one RAW last block of 3 bytes
    val bo = new java.io.ByteArrayOutputStream()
    Seq(0x28, 0xb5, 0x2f, 0xfd).foreach(bo.write)
    bo.write(0x40) // fcsFlag=1
    bo.write(0x00) // window descriptor
    bo.write(0x44); bo.write(0x00) // FCS LE
    val bh = 1 | (3 << 3)
    bo.write(bh & 0xff); bo.write((bh >> 8) & 0xff); bo.write((bh >> 16) & 0xff)
    bo.write(7); bo.write(8); bo.write(9)
    val fs = Zstd.parseFrames(bo.toByteArray).getOrElse(fail("did not parse"))
    assert(fs.size === 1)
    assert(fs.head.contentSize === Some(324L))
    assert(fs.head.nBlocks === 1)
  }

  test("corrupt forms return None, never throw") {
    assert(Zstd.parseFrames(null) === None)
    assert(Zstd.parseFrames(Array.emptyByteArray) === None)
    assert(Zstd.parseFrames("not zstd data at all".getBytes) === None)
    val ok = Zstd.syntheticZstd(2L)
    // truncated mid-blocks
    assert(Zstd.parseFrames(ok.take(ok.length - 3)) === None)
    // reserved descriptor bit set
    val badFhd = ok.clone(); badFhd(4) = (badFhd(4) | 0x08).toByte
    assert(Zstd.parseFrames(badFhd) === None)
    // trailing garbage after the last frame
    assert(Zstd.parseFrames(ok ++ Array[Byte](1, 2, 3)) === None)
    // reserved block type: hand-build a minimal frame with type 3
    val bo = new java.io.ByteArrayOutputStream()
    Seq(0x28, 0xb5, 0x2f, 0xfd).foreach(bo.write)
    bo.write(0x00); bo.write(0x00) // fhd, window
    val bh = 1 | (3 << 1) | (2 << 3)
    bo.write(bh & 0xff); bo.write((bh >> 8) & 0xff); bo.write((bh >> 16) & 0xff)
    bo.write(1); bo.write(2)
    assert(Zstd.parseFrames(bo.toByteArray) === None)
  }

  test("skippable magic accepts the whole 0x184D2A50-5F nibble range") {
    (0 to 15).foreach { nib =>
      val bo = new java.io.ByteArrayOutputStream()
      val magic = 0x184D2A50L + nib
      bo.write((magic & 0xff).toInt); bo.write(((magic >> 8) & 0xff).toInt)
      bo.write(((magic >> 16) & 0xff).toInt); bo.write(((magic >> 24) & 0xff).toInt)
      Seq(2, 0, 0, 0).foreach(bo.write) // size 2
      bo.write(0xaa); bo.write(0xbb)
      val fs = Zstd.parseFrames(bo.toByteArray).getOrElse(fail(s"nib=$nib"))
      assert(fs === Vector(Zstd.Frame("skippable", 0L, 10L, None, None,
        None, hasChecksum = false, nBlocks = 0)))
    }
  }
}
