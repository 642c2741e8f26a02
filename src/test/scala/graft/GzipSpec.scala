package graft

import graft.functions.Gzip
import org.scalatest.funsuite.AnyFunSuite

/** Gzip member walk: the fixture against its closed form, a REAL
 * `Deflater`-compressed roundtrip (dynamic-huffman streams, not just the
 * fixture's stored blocks), multi-member concatenation, and the corrupt
 * contract (trailer CRC/ISIZE, FHCRC, reserved FLG, truncation, trailing
 * garbage). */
class GzipSpec extends AnyFunSuite {

  test("fixture decodes to the closed member form (IDs 0-59)") {
    (0L until 60L).foreach { id =>
      val ms = Gzip.parseMembers(Gzip.syntheticGzip(id))
        .getOrElse(fail(s"id=$id did not parse"))
      assert(ms.size === (1 + id % 3).toInt, s"id=$id")
      var expectOff = 0L
      ms.zipWithIndex.foreach { case (m, i) =>
        val len = (30 + (id * 3 + i * 11) % 70).toInt
        assert(m.offset === expectOff, s"id=$id m=$i")
        assert(m.uncompBytes === len.toLong, s"id=$id m=$i")
        val header = 10 +
          (if ((id + i) % 3 == 0) 2 + (4 + (id + i) % 10).toInt else 0) +
          (if ((id + i) % 2 == 0) 9 else 0) +
          (if ((id + i) % 5 == 1) 4 else 0) +
          (if ((id + i) % 4 == 2) 2 else 0)
        val nblocks = (len + 39) / 40
        assert(m.compBytes === header + nblocks * 5 + len + 8, s"id=$id m=$i")
        assert(m.fname ===
          (if ((id + i) % 2 == 0) Some(s"f${id % 10}_$i.txt") else None))
        assert(m.comment ===
          (if ((id + i) % 5 == 1) Some(s"gc${id % 10}") else None))
        assert(m.mtime === ((id * 1000 + i) & 0xffffffffL), s"id=$id m=$i")
        assert(m.os === ((id + i) % 14).toInt, s"id=$id m=$i")
        assert(m.ftext === ((id + i) % 7 == 3), s"id=$id m=$i")
        expectOff += m.compBytes
      }
    }
  }

  /** A real gzip member via the JDK's own writer — dynamic-huffman
   * deflate, exercising the inflate path the stored-block fixture
   * cannot. */
  private def realGzip(content: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bo)
    gz.write(content); gz.close()
    bo.toByteArray
  }

  test("real GZIPOutputStream members parse, sizes verified") {
    val content = Array.tabulate(100000)(j => ((j * 31) % 251).toByte)
    val one = realGzip(content)
    val ms = Gzip.parseMembers(one).getOrElse(fail("real member"))
    assert(ms.size === 1)
    assert(ms.head.uncompBytes === content.length.toLong)
    assert(ms.head.compBytes === one.length.toLong)
    // multi-member concatenation: the .warc.gz shape
    val c2 = Array.tabulate(777)(j => ((j * 7) % 250).toByte)
    val cat = one ++ realGzip(c2) ++ Gzip.syntheticGzip(4L)
    val all = Gzip.parseMembers(cat).getOrElse(fail("concat"))
    assert(all.size === 2 + (1 + 4 % 3))
    assert(all(1).uncompBytes === 777L)
    assert(all(1).offset === one.length.toLong)
    assert(all.map(_.compBytes).sum === cat.length.toLong)
  }

  test("corrupt contract: trailer, FHCRC, reserved FLG, truncation, garbage") {
    val good = Gzip.syntheticGzip(2L) // id=2: member 0 has FHCRC ((2+0)%4==2)
    assert(Gzip.parseMembers(good).isDefined)
    // trailer CRC byte flipped
    val crcBad = good.clone()
    crcBad(crcBad.length - 6) = (crcBad(crcBad.length - 6) ^ 0x01).toByte
    assert(Gzip.parseMembers(crcBad).isEmpty, "trailer CRC must be checked")
    // ISIZE flipped
    val szBad = good.clone()
    szBad(szBad.length - 1) = (szBad(szBad.length - 1) ^ 0x01).toByte
    assert(Gzip.parseMembers(szBad).isEmpty, "ISIZE must be checked")
    // FHCRC flipped (id=2 member 0 carries one right after the header)
    val hcrcBad = good.clone()
    hcrcBad(10) = (hcrcBad(10) ^ 0x01).toByte
    assert(Gzip.parseMembers(hcrcBad).isEmpty, "FHCRC must be checked")
    // reserved FLG bit
    val flgBad = good.clone()
    flgBad(3) = (flgBad(3) | 0x80).toByte
    assert(Gzip.parseMembers(flgBad).isEmpty, "reserved FLG bits poison")
    // non-deflate CM
    val cmBad = good.clone()
    cmBad(2) = 7
    assert(Gzip.parseMembers(cmBad).isEmpty, "CM != 8 poisons")
    // truncations at every byte must never parse (and never throw) —
    // EXCEPT at member boundaries, where the prefix is a legitimately
    // complete shorter file
    val boundaries = Gzip.parseMembers(good).get
      .map(m => (m.offset + m.compBytes).toInt).toSet
    (1 until good.length).filterNot(boundaries).foreach { cut =>
      assert(Gzip.parseMembers(good.take(cut)).isEmpty, s"cut=$cut")
    }
    // trailing garbage after the last member
    assert(Gzip.parseMembers(good ++ Array[Byte](0x1f, 0x00)).isEmpty)
    assert(Gzip.parseMembers(null).isEmpty)
    assert(Gzip.parseMembers(Array.emptyByteArray).isEmpty)
  }

  test("randomized member concatenation: sizes and boundaries exact") {
    // seeded RNG — deterministic; mixes real-Deflater and stored-block
    // members in one stream, the mixed shape a crawl actually carries
    val rnd = new scala.util.Random(4242)
    (0 until 20).foreach { trial =>
      val n = 1 + rnd.nextInt(5)
      val parts = (0 until n).map { _ =>
        if (rnd.nextBoolean()) {
          val content = Array.fill(rnd.nextInt(5000))(rnd.nextInt(256).toByte)
          (realGzip(content), content.length.toLong)
        } else {
          val id = rnd.nextInt(1000).toLong
          val g = Gzip.syntheticGzip(id)
          // syntheticGzip may emit multiple members; take it whole and
          // count its members' uncompressed total
          val ms = Gzip.parseMembers(g).get
          (g, ms.map(_.uncompBytes).sum)
        }
      }
      val cat = parts.map(_._1).reduce(_ ++ _)
      val ms = Gzip.parseMembers(cat)
        .getOrElse(fail(s"trial=$trial did not parse"))
      assert(ms.map(_.compBytes).sum === cat.length.toLong, s"trial=$trial")
      assert(ms.map(_.uncompBytes).sum === parts.map(_._2).sum, s"trial=$trial")
      // offsets tile exactly
      ms.sliding(2).foreach {
        case Seq(a, b) => assert(a.offset + a.compBytes === b.offset)
        case _ =>
      }
    }
  }

  test("inflateMemberAt re-extracts every member from its locator alone") {
    (0L until 40L).foreach { id =>
      val payload = Gzip.syntheticGzip(id)
      val ms = Gzip.parseMembers(payload).get
      ms.zipWithIndex.foreach { case (m, i) =>
        val body = Gzip.inflateMemberAt(payload, m.offset, m.compBytes)
          .getOrElse(fail(s"id=$id member=$i did not re-extract"))
        // the fixture's content formula: byte j of member m
        val len = (30 + (id * 3 + i * 11) % 70).toInt
        assert(body.length === len, s"id=$id member=$i")
        body.zipWithIndex.foreach { case (x, j) =>
          assert((x & 0xff) === ((id * 7 + i * 13 + j) & 0xff).toInt,
            s"id=$id member=$i byte=$j")
        }
        assert(body.length.toLong === m.uncompBytes)
      }
    }
  }

  test("inflateMemberAt rejects stale locators") {
    val payload = Gzip.syntheticGzip(7L) // 2 members
    val ms = Gzip.parseMembers(payload).get
    assert(ms.size === 2)
    val m = ms.head
    // off-by-one offset: no gzip magic there
    assert(Gzip.inflateMemberAt(payload, m.offset + 1, m.compBytes).isEmpty)
    // short length: deflate stream truncated / trailer gone
    assert(Gzip.inflateMemberAt(payload, m.offset, m.compBytes - 1).isEmpty)
    // long length spanning into the next member: >1 member in range
    assert(Gzip.inflateMemberAt(payload, m.offset,
      m.compBytes + ms(1).compBytes).isEmpty)
    // out of range entirely
    assert(Gzip.inflateMemberAt(payload, payload.length.toLong, 18L).isEmpty)
    assert(Gzip.inflateMemberAt(payload, -1L, m.compBytes).isEmpty)
    assert(Gzip.inflateMemberAt(null, 0L, 18L).isEmpty)
  }

  test("a stored-block deflate stream inflates to the exact content") {
    // cross-check the fixture's hand-rolled stored blocks against the
    // JDK's reference inflater via GZIPInputStream
    // id=6: a SINGLE member (GZIPInputStream reads concatenated members
    // transparently, so a multi-member id would compare joined content)
    val raw = Gzip.syntheticGzip(6L)
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(raw))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    val len = (30 + (6 * 3) % 70).toInt
    val expect = Array.tabulate(len)(j => ((6 * 7 + j) & 0xff).toByte)
    assert(out.toByteArray.sameElements(expect))
  }
}
