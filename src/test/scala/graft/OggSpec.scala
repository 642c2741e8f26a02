package graft

import graft.functions.Ogg
import org.scalatest.funsuite.AnyFunSuite

/** Ogg page walk (RFC 3533): the synthetic fixture against an
 * independent closed-form replay, the real-CRC contract (any byte slip
 * fails the parse), and the corrupt-payload contract (None, never
 * throw). */
class OggSpec extends AnyFunSuite {

  // independent closed-form replay of the fixture layout; mirrors the
  // shape documented on Ogg.syntheticShape
  private def expected(id: Long): IndexedSeq[(Int, Long, Int, Long, Long, Int)] = {
    val np = (2 + id % 5).toInt
    def nk(p: Int) = (1 + ((id + p) % 3)).toInt
    def size(p: Int, k: Int) = (50 + ((id * 31 + p * 17 + k * 7) % 230)).toInt
    var off = 0L
    (0 until np).map { p =>
      val sizes = (0 until nk(p)).map(size(p, _))
      val nseg = sizes.map(s => if (s >= 255) 2 else 1).sum
      val hdr = 27 + nseg
      val body = sizes.map(_.toLong).sum
      val gran = (p + 1L) * (100 + id % 50)
      val r = (p, off, hdr, body, gran, sizes.length)
      off += hdr + body
      r
    }
  }

  test("synthetic fixture resolves to the closed form (IDs 0-29)") {
    (0L until 30L).foreach { id =>
      val payload = Ogg.syntheticOgg(id)
      val pages = Ogg.parsePages(payload)
        .getOrElse(fail(s"id=$id did not parse"))
      val want = expected(id)
      assert(pages.length === want.length, s"id=$id page count")
      pages.zip(want).foreach { case (g, (no, off, hdr, body, gran, npk)) =>
        assert((g.no, g.offset, g.headerBytes, g.bodyBytes, g.granule,
          g.packetsDone) === ((no, off, hdr, body, gran, npk)), s"id=$id page $no")
        assert(g.serial === 1000 + id % 100, s"id=$id serial")
        assert(g.bos === (no == 0) && g.eos === (no == want.length - 1),
          s"id=$id flags")
        // body byte probes
        val b0 = (g.offset + g.headerBytes).toInt
        assert((payload(b0) & 0xff) === ((id + no * 131L) % 256).toInt)
        assert((payload(b0 + g.bodyBytes.toInt - 1) & 0xff) ===
          ((id + no * 131L + g.bodyBytes - 1) % 256).toInt)
      }
      val last = pages.last
      assert(last.offset + last.headerBytes + last.bodyBytes ===
        payload.length.toLong, s"id=$id EOF")
      // lacing-boundary coverage: some page in the 0-29 sweep must carry a
      // two-segment packet, or the 255-boundary path went untested
    }
    assert((0L until 30L).exists { id =>
      val (np, nk, size) = Ogg.syntheticShape(id)
      (0 until np).exists(p => (0 until nk(p)).exists(k => size(p, k) >= 255))
    }, "no fixture packet crosses the 255-lacing boundary")
  }

  test("the CRC is real: any flipped body or header byte fails the parse") {
    val ok = Ogg.syntheticOgg(7L)
    assert(Ogg.parsePages(ok).isDefined)
    // flip one body byte of the second page
    val pages = Ogg.parsePages(ok).get
    val flip = (pages(1).offset + pages(1).headerBytes + 3).toInt
    val bad = ok.clone(); bad(flip) = (bad(flip) ^ 0x01).toByte
    assert(Ogg.parsePages(bad) === None)
    // flip a granule byte (header, CRC-covered)
    val bad2 = ok.clone()
    bad2(pages(1).offset.toInt + 8) = (bad2(pages(1).offset.toInt + 8) ^ 0x40).toByte
    assert(Ogg.parsePages(bad2) === None)
  }

  test("corrupt forms return None, never throw") {
    val ok = Ogg.syntheticOgg(4L)
    // truncation mid-body and mid-header
    assert(Ogg.parsePages(ok.dropRight(5)) === None)
    assert(Ogg.parsePages(ok.take(20)) === None)
    // trailing garbage after the last page
    assert(Ogg.parsePages(ok ++ Array[Byte](1, 2, 3)) === None)
    // a spliced stream: drop the first page entirely → page_sequence of
    // the (now-first) page is 1, not 0
    val pages = Ogg.parsePages(ok).get
    assert(Ogg.parsePages(ok.drop((pages(0).headerBytes +
      pages(0).bodyBytes).toInt)) === None)
    // lying segment count overrunning the payload
    val lying = ok.clone(); lying(26) = 0xff.toByte
    assert(Ogg.parsePages(lying) === None)
    assert(Ogg.parsePages(null) === None)
    assert(Ogg.parsePages(Array.emptyByteArray) === None)
    assert(Ogg.parsePages("definitely not an ogg stream at all!!".getBytes) === None)
  }

  test("chained fixture: cross-page packets reassemble to the closed form") {
    (0L until 24L).foreach { id =>
      val payload = Ogg.syntheticChainedOgg(id)
      val (np, a, open, rem) = Ogg.syntheticChainedShape(id)
      val got = Ogg.parsePackets(payload)
        .getOrElse(fail(s"id=$id chained fixture did not parse"))
      // completion order: A(0), L(0), A(1), L(1), ..., A(np-1)
      assert(got.length === 2 * np - 1, s"id=$id packet count")
      (0 until np).foreach { p =>
        val sh = got(2 * p)
        assert((sh.size, sh.nPages, sh.endPage) === ((a(p).toLong, 1, p)),
          s"id=$id short $p")
        val off = if (p > 0) rem(p - 1) else 0
        assert((sh.bytes.head & 0xff) === ((id + p * 131L + off) % 256).toInt)
        assert((sh.bytes.last & 0xff) ===
          ((id + p * 131L + off + a(p) - 1) % 256).toInt)
        if (p < np - 1) {
          val lg = got(2 * p + 1)
          assert((lg.size, lg.nPages, lg.endPage) ===
            ((255L * open(p) + rem(p), 2, p + 1)), s"id=$id long $p")
          // the head sits in page p AFTER the short
          val off2 = off + a(p)
          assert((lg.bytes.head & 0xff) === ((id + p * 131L + off2) % 256).toInt)
          // the tail sits in page p+1 — unless the closing chunk is the
          // terminating 0 lacing, in which case the last byte is still
          // the final OPENING byte on page p
          if (rem(p) > 0)
            assert((lg.bytes.last & 0xff) ===
              ((id + (p + 1) * 131L + rem(p) - 1) % 256).toInt)
          else
            assert((lg.bytes.last & 0xff) ===
              ((id + p * 131L + off2 + 255L * open(p) - 1) % 256).toInt)
          // the byte right after the opening chunk comes from page p+1
          if (rem(p) > 0)
            assert((lg.bytes(255 * open(p)) & 0xff) ===
              ((id + (p + 1) * 131L) % 256).toInt, s"id=$id seam $p")
        }
      }
    }
    // lacing edge coverage: the 0-23 sweep must include a >510-byte
    // packet spanning >=3 segments AND an exact-510 packet closed by a
    // terminating 0 lacing — else the RFC 3533 edge shapes went untested
    val shapes = (0L until 24L).flatMap { id =>
      val (np, _, open, rem) = Ogg.syntheticChainedShape(id)
      (0 until np - 1).map(p => (open(p), rem(p)))
    }
    assert(shapes.exists { case (o, r) => o == 2 && r > 0 && 510 + r >= 600 },
      "no >=600-byte 3-segment packet in the sweep")
    assert(shapes.exists { case (o, r) => o == 2 && r == 0 },
      "no exact-510 terminating-0 packet in the sweep")
  }

  test("packets over the unchained fixture agree with the page census") {
    (0L until 12L).foreach { id =>
      val payload = Ogg.syntheticOgg(id)
      val pages = Ogg.parsePages(payload).get
      val packets = Ogg.parsePackets(payload)
        .getOrElse(fail(s"id=$id packets did not parse"))
      assert(packets.length === pages.map(_.packetsDone).sum, s"id=$id count")
      assert(packets.forall(_.nPages === 1), s"id=$id all in-page")
      // per-page packet sizes match the fixture formula
      val (_, kOf, size) = Ogg.syntheticShape(id)
      val wantSizes = pages.indices.flatMap(p =>
        (0 until kOf(p)).map(k => size(p, k).toLong))
      assert(packets.map(_.size) === wantSizes, s"id=$id sizes")
    }
  }

  test("packet-level corruption contracts: dangling partial, flag mismatches") {
    val id = 5L
    val payload = Ogg.syntheticChainedOgg(id)
    val pages = Ogg.parsePages(payload).get
    // truncate at the LAST page boundary: the stream ends with page np-2's
    // 255-opening dangling → packets None (pages themselves still parse)
    val cut = payload.take((pages.last.offset).toInt)
    assert(Ogg.parsePages(cut).isDefined)
    assert(Ogg.parsePackets(cut) === None)
    // clear page 1's continued flag (re-patching the CRC so the walk
    // reaches the flag logic): a pending partial into an unflagged page
    val unflagged = payload.clone()
    val p1 = pages(1).offset.toInt
    val p1len = (pages(1).headerBytes + pages(1).bodyBytes).toInt
    unflagged(p1 + 5) = (unflagged(p1 + 5) & ~0x01).toByte
    val c1 = Ogg.pageCrc(unflagged, p1, p1 + p1len, p1 + 22)
    (0 until 4).foreach(i =>
      unflagged(p1 + 22 + i) = ((c1 >> (8 * i)) & 0xff).toByte)
    assert(Ogg.parsePackets(unflagged) === None)
    // set the continued flag on an UNCHAINED stream's second page: a flag
    // with no pending partial
    val plain = Ogg.syntheticOgg(7L)
    val ppages = Ogg.parsePages(plain).get
    val flagged = plain.clone()
    val q1 = ppages(1).offset.toInt
    val q1len = (ppages(1).headerBytes + ppages(1).bodyBytes).toInt
    flagged(q1 + 5) = (flagged(q1 + 5) | 0x01).toByte
    val c2 = Ogg.pageCrc(flagged, q1, q1 + q1len, q1 + 22)
    (0 until 4).foreach(i =>
      flagged(q1 + 22 + i) = ((c2 >> (8 * i)) & 0xff).toByte)
    assert(Ogg.parsePackets(flagged) === None)
  }

  // flag-byte mutation with a re-patched CRC, so the walk reaches the
  // continuity logic instead of failing the checksum
  private def patchFlags(payload: Array[Byte], pageOff: Int, pageLen: Int,
      f: Int => Int): Array[Byte] = {
    val out = payload.clone()
    out(pageOff + 5) = f(out(pageOff + 5) & 0xff).toByte
    val c = Ogg.pageCrc(out, pageOff, pageOff + pageLen, pageOff + 22)
    (0 until 4).foreach(i =>
      out(pageOff + 22 + i) = ((c >> (8 * i)) & 0xff).toByte)
    out
  }

  test("chained bitstream (EOS->BOS serial reuse) walks; unclean restarts refuse") {
    (0L until 8L).foreach { id =>
      val payload = Ogg.syntheticLinkedOgg(id)
      val pages = Ogg.parsePages(payload)
        .getOrElse(fail(s"id=$id chain rejected"))
      val np0 = (2 + id % 2).toInt
      val np1 = (2 + (id + 1) % 2).toInt
      assert(pages.length === np0 + np1)
      // ONE serial throughout; bos/eos bracket each link
      assert(pages.map(_.serial).distinct === IndexedSeq(4000L + id % 100))
      assert(pages.map(_.bos) ===
        (0 until np0 + np1).map(p => p == 0 || p == np0))
      assert(pages.map(_.eos) ===
        (0 until np0 + np1).map(p => p == np0 - 1 || p == np0 + np1 - 1))
      // packets reassemble across the seam in file order, one per page
      val pk = Ogg.parsePackets(payload)
        .getOrElse(fail(s"id=$id chain packets rejected"))
      assert(pk.map(_.size) === pages.map(_.bodyBytes))
    }
    // a chained pair of comment fixtures (same id, so the SAME serial):
    // header consumers read the FIRST link — identical to the unchained
    // parse, not poisoned, not link 2's
    val single = Ogg.syntheticCommentedOgg(9L)
    val chained = single ++ single
    assert(Ogg.parsePages(chained).isDefined)
    assert(Ogg.parseComments(chained) === Ogg.parseComments(single))
    // negatives, each with a re-patched CRC:
    val ok = Ogg.syntheticLinkedOgg(3L)
    val pg = Ogg.parsePages(ok).get
    val np0 = 3 // id 3: link 0 has 2 + 3%2 = 3 pages
    def at(i: Int) =
      (pg(i).offset.toInt, (pg(i).headerBytes + pg(i).bodyBytes).toInt)
    // restart WITHOUT the prior EOS: clear link 0's last-page EOS flag
    val (e0, e0len) = at(np0 - 1)
    assert(Ogg.parsePages(patchFlags(ok, e0, e0len, _ & ~0x04)) === None)
    // restart WITHOUT BOS: clear link 1's first-page BOS flag
    val (b1, b1len) = at(np0)
    assert(Ogg.parsePages(patchFlags(ok, b1, b1len, _ & ~0x02)) === None)
    // restart with a NONZERO sequence number
    val seqBumped = ok.clone()
    seqBumped(b1 + 18) = (seqBumped(b1 + 18) + 1).toByte
    val c = Ogg.pageCrc(seqBumped, b1, b1 + b1len, b1 + 22)
    (0 until 4).foreach(i =>
      seqBumped(b1 + 22 + i) = ((c >> (8 * i)) & 0xff).toByte)
    assert(Ogg.parsePages(seqBumped) === None)
    // mid-stream BOS with NO preceding EOS on a plain stream: a spliced-in
    // stream start, not a chain
    val plain = Ogg.syntheticOgg(8L)
    val ppg = Ogg.parsePages(plain).get
    val (m1, m1len) =
      (ppg(1).offset.toInt, (ppg(1).headerBytes + ppg(1).bodyBytes).toInt)
    assert(Ogg.parsePages(patchFlags(plain, m1, m1len, _ | 0x02)) === None)
    // pages continuing after a mid-stream EOS without a BOS restart
    assert(Ogg.parsePages(patchFlags(plain, m1, m1len, _ | 0x04)) === None)
  }

  test("audio identification headers decode per the codec specs") {
    (0L until 24L).foreach { id =>
      val m = Ogg.parseAudioMeta(Ogg.syntheticAudioOgg(id))
        .getOrElse(fail(s"id=$id header did not decode"))
      if (id % 2 == 0) {
        assert(m.codec === "opus")
        assert(m.channels === (1 + (id / 2) % 2).toInt)
        assert(m.preskip === (312 + id % 100).toInt)
        assert(m.sampleRate === Seq(48000L, 24000L, 16000L)((id % 3).toInt))
      } else {
        assert(m.codec === "vorbis")
        assert(m.channels === (1 + (id / 2) % 2).toInt)
        assert(m.preskip === 0)
        assert(m.sampleRate === Seq(44100L, 32000L, 22050L)((id % 3).toInt))
      }
    }
    // an unrecognized first packet yields None, not garbage fields —
    // the plain fixture's first packet is deterministic filler bytes
    assert(Ogg.parseAudioMeta(Ogg.syntheticOgg(4L)) === None)
    assert(Ogg.parseAudioMeta("not ogg".getBytes) === None)
  }

  test("multiplexed streams: interleaved serials walk with per-serial sequences") {
    // hand-interleave two single-stream fixtures page-by-page; per-serial
    // page sequences stay 0,1,... so the walk must track them separately
    val a = Ogg.syntheticOgg(10L) // serial 1010
    val b = Ogg.syntheticOgg(11L) // serial 1011
    val pa = Ogg.parsePages(a).get
    val pb = Ogg.parsePages(b).get
    def slice(raw: Array[Byte], p: Ogg.Page): Array[Byte] =
      java.util.Arrays.copyOfRange(raw, p.offset.toInt,
        (p.offset + p.headerBytes + p.bodyBytes).toInt)
    val interleaved =
      pa.map(slice(a, _)).zipAll(pb.map(slice(b, _)),
        Array.emptyByteArray, Array.emptyByteArray)
        .flatMap { case (x, y) => Seq(x, y) }.reduce(_ ++ _)
    val got = Ogg.parsePages(interleaved)
      .getOrElse(fail("multiplexed stream did not parse"))
    assert(got.length === pa.length + pb.length)
    assert(got.count(_.serial == 1010L) === pa.length)
    assert(got.count(_.serial == 1011L) === pb.length)
    // packet reassembly must keep per-serial partials independent: two
    // interleaved CHAINED streams, both with packets open across seams
    val ca = Ogg.syntheticChainedOgg(20L) // serial 2020
    val cb = Ogg.syntheticChainedOgg(21L) // serial 2021
    val qa = Ogg.parsePages(ca).get
    val qb = Ogg.parsePages(cb).get
    val inter2 = qa.map(slice(ca, _)).zipAll(qb.map(slice(cb, _)),
      Array.emptyByteArray, Array.emptyByteArray)
      .flatMap { case (x, y) => Seq(x, y) }.reduce(_ ++ _)
    val gotP = Ogg.parsePackets(inter2)
      .getOrElse(fail("multiplexed chained packets did not parse"))
    def sizesOf(raw: Array[Byte]): Seq[Long] =
      Ogg.parsePackets(raw).get.map(_.size)
    assert(gotP.filter(_.serial == 2020L).map(_.size) === sizesOf(ca))
    assert(gotP.filter(_.serial == 2021L).map(_.size) === sizesOf(cb))
  }

  test("muxed fixture: interleaved partials reassemble to the closed form") {
    (0L until 24L).foreach { id =>
      val payload = Ogg.syntheticMuxedOgg(id)
      val (n, a, r) = Ogg.syntheticMuxedShape(id)
      val got = Ogg.parsePackets(payload)
        .getOrElse(fail(s"id=$id muxed fixture did not parse"))
      assert(got.length === 2 * (2 * n - 1), s"id=$id packet count")
      (0 until 2 * n).foreach { q =>
        val s = q % 2
        val p = q / 2
        val serial = (if (s == 0) 4000L else 4100L) + id % 100
        val rprev = if (p > 0) r(s, p - 1) else 0
        // the short completing on file page q
        val sh = got(if (q < 2) q else 2 * q - 1)
        assert((sh.serial, sh.size, sh.nPages, sh.endPage) ===
          ((serial, a(s, p).toLong, 1, q)), s"id=$id short q=$q")
        assert((sh.bytes.head & 0xff) ===
          ((id + q * 131L + rprev) % 256).toInt, s"id=$id short head q=$q")
        assert((sh.bytes.last & 0xff) ===
          ((id + q * 131L + rprev + a(s, p) - 1) % 256).toInt)
        // the long opening on q and closing on q+2 (one page later IN
        // ITS STREAM, two pages later in the file)
        if (p < n - 1) {
          val lg = got(2 * (q + 2) - 2)
          assert((lg.serial, lg.size, lg.nPages, lg.endPage) ===
            ((serial, 255L + r(s, p), 2, q + 2)), s"id=$id long q=$q")
          assert((lg.bytes.head & 0xff) ===
            ((id + q * 131L + rprev + a(s, p)) % 256).toInt)
          // the seam byte (index 255) comes from file page q+2, NOT from
          // the other stream's page q+1 sitting between them
          assert((lg.bytes(255) & 0xff) ===
            ((id + (q + 2) * 131L) % 256).toInt, s"id=$id seam q=$q")
          assert((lg.bytes.last & 0xff) ===
            ((id + (q + 2) * 131L + r(s, p) - 1) % 256).toInt)
        }
      }
      // both serials pending partials simultaneously at every interior
      // page boundary — the interleave is real, not sequential
      val pages = Ogg.parsePages(payload).get
      assert(pages.map(_.serial).distinct.length === 2, s"id=$id serials")
      assert(pages.map(_.serial).sliding(2).forall(w => w(0) != w(1)),
        s"id=$id pages strictly alternate serials")
    }
  }

  test("muxed spliced stream: continued flag without a pending partial") {
    val payload = Ogg.syntheticMuxedOgg(7L)
    assert(Ogg.parsePackets(payload).isDefined)
    val pages = Ogg.parsePages(payload).get
    // file page 1 is Y's FIRST page (bos, no pending Y partial): setting
    // its continued flag claims a partial that does not exist — splice
    // evidence, packets must refuse (re-patch the CRC so the walk
    // reaches the flag logic rather than bouncing off the checksum)
    val spliced = payload.clone()
    val p1 = pages(1).offset.toInt
    val p1len = (pages(1).headerBytes + pages(1).bodyBytes).toInt
    spliced(p1 + 5) = (spliced(p1 + 5) | 0x01).toByte
    val c = Ogg.pageCrc(spliced, p1, p1 + p1len, p1 + 22)
    (0 until 4).foreach(i =>
      spliced(p1 + 22 + i) = ((c >> (8 * i)) & 0xff).toByte)
    assert(Ogg.parsePackets(spliced) === None)
    // pages still walk (per-serial sequences are intact) — the refusal
    // is the PACKET layer's continued-flag contract, not a page error
    assert(Ogg.parsePages(spliced).isDefined)
  }

  test("comment headers decode per VorbisComment / OpusTags") {
    (0L until 24L).foreach { id =>
      val streams = Ogg.parseComments(Ogg.syntheticCommentedOgg(id))
        .getOrElse(fail(s"id=$id comments did not decode"))
      assert(streams.length === 1, s"id=$id stream count")
      val (serial, vendor, cs) = streams.head
      assert(serial === 5000L + id % 100, s"id=$id serial")
      assert(vendor === s"graft ${id % 7}", s"id=$id vendor")
      assert(cs === IndexedSeq(
        "TITLE" -> s"title_${id * 7 % 1000}",
        "ARTIST" -> s"artist_${id % 50}",
        "ALBUM" -> s"album_${id % 20}",
        "TRACKNUMBER" -> s"${1 + id % 12}",
        "PAD" -> ("x" * (200 + id % 200).toInt)), s"id=$id comments")
      // the PAD comment pushes the packet across a 255-lacing chain
      val packets = Ogg.parsePackets(Ogg.syntheticCommentedOgg(id)).get
      assert(packets(1).size > 255, s"id=$id comment packet spans lacings")
      // the id header in packet 1 still decodes (m20 composes with m24)
      assert(Ogg.parseAudioMeta(Ogg.syntheticCommentedOgg(id)).isDefined)
    }
    // streams without a comment-shaped second packet: detectable absence
    assert(Ogg.parseComments(Ogg.syntheticOgg(4L)) === None)
    assert(Ogg.parseComments("not ogg".getBytes) === None)
  }

  test("comments in MULTIPLEXED files resolve per serial, not file order") {
    // interleave two commented streams page-by-page: file completion
    // order puts stream B's ID HEADER at global packet index 1 — a
    // decoder reading 'the second packet' of the file instead of the
    // second packet of each SERIAL returns None here (review finding)
    def slice(raw: Array[Byte], p: Ogg.Page): Array[Byte] =
      java.util.Arrays.copyOfRange(raw, p.offset.toInt,
        (p.offset + p.headerBytes + p.bodyBytes).toInt)
    val a = Ogg.syntheticCommentedOgg(3L) // serial 5003
    val b = Ogg.syntheticCommentedOgg(4L) // serial 5004
    val pa = Ogg.parsePages(a).get
    val pb = Ogg.parsePages(b).get
    val muxed = pa.map(slice(a, _)).zip(pb.map(slice(b, _)))
      .flatMap { case (x, y) => Seq(x, y) }.reduce(_ ++ _)
    val streams = Ogg.parseComments(muxed)
      .getOrElse(fail("muxed comments did not decode"))
    assert(streams.map(_._1) === IndexedSeq(5003L, 5004L))
    assert(streams.map(_._2).toSet === Set("graft 3", "graft 4"))
    assert(streams.find(_._1 == 5003L).get._3.head ===
      ("TITLE" -> s"title_${3 * 7 % 1000}"))
    assert(streams.find(_._1 == 5004L).get._3.head ===
      ("TITLE" -> s"title_${4 * 7 % 1000}"))
  }

  test("invalid UTF-8 in a comment is corruption, not replacement chars") {
    val id = 8L // OpusTags form; TITLE value gets a lone 0x80 byte
    val raw = Ogg.syntheticCommentedOgg(id)
    val pages = Ogg.parsePages(raw).get
    val body1 = (pages(1).offset + pages(1).headerBytes).toInt
    // comment data starts at magic(8) + 4 + vendor(7) + 4 + len(4);
    // 'TITLE=t...' puts the first value byte at offset 6
    val vOff = body1 + 8 + 4 + 7 + 4 + 4 + 6
    val bad = raw.clone(); bad(vOff) = 0x80.toByte
    val from = pages(1).offset.toInt
    val until = (pages(1).offset + pages(1).headerBytes +
      pages(1).bodyBytes).toInt
    val c = Ogg.pageCrc(bad, from, until, from + 22)
    (0 until 4).foreach(i =>
      bad(from + 22 + i) = ((c >> (8 * i)) & 0xff).toByte)
    assert(Ogg.parseComments(bad) === None)
  }

  test("comment corrupt forms return None, never garbage rows") {
    // rebuild with surgical corruption: flip bytes in the comment page
    // and re-patch its CRC so the packet walk reaches the decode logic
    def corruptTags(id: Long, f: Array[Byte] => Unit): Option[_] = {
      val raw = Ogg.syntheticCommentedOgg(id)
      val pages = Ogg.parsePages(raw).get
      val bad = raw.clone()
      val p1 = pages(1)
      f(bad) // caller edits body bytes (absolute offsets)
      val from = p1.offset.toInt
      val until = (p1.offset + p1.headerBytes + p1.bodyBytes).toInt
      val c = Ogg.pageCrc(bad, from, until, from + 22)
      (0 until 4).foreach(i =>
        bad(from + 22 + i) = ((c >> (8 * i)) & 0xff).toByte)
      Ogg.parseComments(bad)
    }
    val id = 7L // vorbis form (odd)
    val pages = Ogg.parsePages(Ogg.syntheticCommentedOgg(id)).get
    val body1 = (pages(1).offset + pages(1).headerBytes).toInt
    // type byte 3 -> 4: neither OpusTags nor a vorbis comment header
    assert(corruptTags(id, b => b(body1) = 4) === None)
    // vendor length lies beyond the packet
    assert(corruptTags(id, b => b(body1 + 7 + 3) = 0x7f.toByte) === None)
    // the '=' of TITLE (first comment, after vendor) becomes '_' (a
    // legal key char, so the corruption is purely the missing
    // separator): no '=' -> None. Layout: 7 (type+magic) + 4 (vendor
    // len) + 7 ('graft N') + 4 (count) + 4 (comment len); 'TITLE=' puts
    // '=' at offset 5 of the comment data
    val cOff = body1 + 7 + 4 + 7 + 4 + 4 + 5
    assert(corruptTags(id, b => b(cOff) = '_'.toByte) === None)
    // a key byte outside 0x20..0x7D (0x1f in 'TITLE') -> None
    assert(corruptTags(id, b => b(cOff - 5) = 0x1f.toByte) === None)
    // vorbis framing bit cleared -> None (the spec REQUIRES it set)
    val lastBody = (pages(1).offset + pages(1).headerBytes +
      pages(1).bodyBytes - 1).toInt
    assert(corruptTags(id, b => b(lastBody) = 0) === None)
    // OpusTags (even id) has no framing byte and tolerates its absence
    assert(Ogg.parseComments(Ogg.syntheticCommentedOgg(8L)).isDefined)
  }

  test("audio header field validation: version/rate/channel corruption -> None") {
    // baseline fixtures decode
    val opus = Ogg.syntheticAudioOgg(0L) // even id: OpusHead
    val vorb = Ogg.syntheticAudioOgg(1L) // odd id: Vorbis
    assert(Ogg.parseAudioMeta(opus).exists(_.codec == "opus"))
    assert(Ogg.parseAudioMeta(vorb).exists(_.codec == "vorbis"))
    // the id header is the first packet: byte offsets inside page 0's
    // body (28 = 27-byte header + 1 lacing entry)
    def corrupt(raw: Array[Byte], bodyOff: Int, value: Byte): Array[Byte] = {
      val bad = raw.clone()
      bad(28 + bodyOff) = value
      val pages = Ogg.parsePages(raw).get
      val len = (pages(0).headerBytes + pages(0).bodyBytes).toInt
      val c = Ogg.pageCrc(bad, 0, len, 22)
      (0 until 4).foreach(i => bad(22 + i) = ((c >> (8 * i)) & 0xff).toByte)
      bad
    }
    // OpusHead major version nibble != 0 (RFC 7845 §5.1)
    assert(Ogg.parseAudioMeta(corrupt(opus, 8, 0x21.toByte)) === None)
    // zero channels / zero sample rate are corruption, not metadata
    assert(Ogg.parseAudioMeta(corrupt(opus, 9, 0)) === None)
    assert(Ogg.parseAudioMeta(
      corrupt(corrupt(corrupt(corrupt(opus, 12, 0), 13, 0), 14, 0), 15, 0))
      === None)
    assert(Ogg.parseAudioMeta(corrupt(vorb, 11, 0)) === None)
    assert(Ogg.parseAudioMeta(
      corrupt(corrupt(corrupt(corrupt(vorb, 12, 0), 13, 0), 14, 0), 15, 0))
      === None)
    // Vorbis id-header version u32 must be 0 (Vorbis I §4.2.2)
    assert(Ogg.parseAudioMeta(corrupt(vorb, 7, 1)) === None)
  }
}
