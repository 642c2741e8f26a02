package graft

import graft.functions.Mp3
import org.scalatest.funsuite.AnyFunSuite

/** MPEG-audio frame walk: the synthetic VBR fixture against an
 * independent closed-form replay, hand-built MPEG-2 / Layer-II / Layer-I
 * frames, and the corrupt-payload contract (None, never throw). */
class Mp3Spec extends AnyFunSuite {

  private def expected(id: Long): IndexedSeq[(Int, Long, Int, Int, Int)] = {
    val (n, srIdx, brIdx, pad) = Mp3.syntheticShape(id)
    val hz = Seq(44100, 48000, 32000)(srIdx)
    val table = Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    var off = if (id % 3 == 0) 27L + id % 23 else 0L
    (0 until n).map { i =>
      val kbps = table(brIdx(i) - 1)
      val size = 144000 * kbps / hz + pad(i)
      val r = (i, off, size, kbps, hz)
      off += size
      r
    }
  }

  test("synthetic VBR fixture resolves to the closed form (IDs 0-29)") {
    (0L until 30L).foreach { id =>
      val payload = Mp3.syntheticMp3(id)
      val frames = Mp3.parseFrames(payload)
        .getOrElse(fail(s"id=$id did not parse"))
      val want = expected(id)
      assert(frames.length === want.length, s"id=$id frame count")
      frames.zip(want).foreach { case (f, (no, off, sz, kbps, hz)) =>
        assert((f.no, f.offset, f.size, f.bitrateKbps, f.sampleRate,
          f.samplesPerFrame) === ((no, off, sz, kbps, hz, 1152)), s"id=$id #$no")
        // data byte probes: first data byte and last byte of the frame
        assert((payload(f.offset.toInt + 4) & 0xff) ===
          ((id + no * 131L + 4) % 256).toInt, s"id=$id #$no head")
        assert((payload((f.offset + f.size - 1).toInt) & 0xff) ===
          ((id + no * 131L + sz - 1) % 256).toInt, s"id=$id #$no tail")
      }
      assert(frames.last.offset + frames.last.size === payload.length.toLong)
    }
  }

  /** Hand-build one frame: header bytes + zero data of the right size. */
  private def frame(version: Int, layer: Int, brIdx: Int, srIdx: Int,
      pad: Int, kbps: Int, hz: Int): Array[Byte] = {
    val samples = layer match {
      case 3 => 384
      case 2 => 1152
      case _ => if (version == 3) 1152 else 576
    }
    val size = layer match {
      case 3 => (12 * kbps * 1000 / hz + pad) * 4
      case _ => samples / 8 * kbps * 1000 / hz + pad
    }
    val b = new Array[Byte](size)
    b(0) = 0xff.toByte
    b(1) = (0xe0 | (version << 3) | (layer << 1) | 1).toByte
    b(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
    b(3) = 0x40
    b
  }

  test("MPEG-2 and Layer I/II header forms resolve") {
    // MPEG-2 Layer III, brIdx 5 → 40 kbps (V2L23 table), 24000 Hz, 576 samples
    val v2 = frame(version = 2, layer = 1, brIdx = 5, srIdx = 1, pad = 0,
      kbps = 40, hz = 24000)
    val f2 = Mp3.parseFrames(v2).getOrElse(fail("v2 L3")).head
    assert((f2.bitrateKbps, f2.sampleRate, f2.samplesPerFrame, f2.size) ===
      ((40, 24000, 576, 576 / 8 * 40000 / 24000)))
    // MPEG-1 Layer II, brIdx 5 → 80 kbps, 44100 Hz, 1152 samples
    val l2 = frame(version = 3, layer = 2, brIdx = 5, srIdx = 0, pad = 1,
      kbps = 80, hz = 44100)
    val fl2 = Mp3.parseFrames(l2).getOrElse(fail("L2")).head
    assert((fl2.bitrateKbps, fl2.samplesPerFrame, fl2.size) ===
      ((80, 1152, 144 * 80000 / 44100 + 1)))
    // MPEG-1 Layer I, brIdx 5 → 160 kbps, 4-byte slot padding
    val l1 = frame(version = 3, layer = 3, brIdx = 5, srIdx = 0, pad = 1,
      kbps = 160, hz = 44100)
    val fl1 = Mp3.parseFrames(l1).getOrElse(fail("L1")).head
    assert((fl1.bitrateKbps, fl1.samplesPerFrame, fl1.size) ===
      ((160, 384, (12 * 160000 / 44100 + 1) * 4)))
  }

  test("ID3v2.4 footer flag skips 10 extra bytes before the first frame") {
    val stream = Mp3.syntheticMp3(4L) // id%3!=0 → no ID3 prefix of its own
    val sz = 21
    val bo = new java.io.ByteArrayOutputStream()
    def synchsafe(v: Int): Unit = { bo.write((v >> 21) & 0x7f)
      bo.write((v >> 14) & 0x7f); bo.write((v >> 7) & 0x7f); bo.write(v & 0x7f) }
    bo.write('I'); bo.write('D'); bo.write('3'); bo.write(4); bo.write(0)
    bo.write(0x10) // flags: footer present
    synchsafe(sz)
    (0 until sz).foreach(j => bo.write(j & 0x7f)) // tag body
    // the 10-byte footer the synchsafe size does NOT count (ID3v2.4 §3.4)
    bo.write('3'); bo.write('D'); bo.write('I'); bo.write(4); bo.write(0)
    bo.write(0x10); synchsafe(sz)
    val payload = bo.toByteArray ++ stream
    val got = Mp3.parseFrames(payload).getOrElse(fail("footer form did not parse"))
    assert(got.length === Mp3.parseFrames(stream).get.length)
    assert(got.head.offset === 10L + sz + 10)
  }

  test("ID3v2 text frames decode across versions and encodings (IDs 0-29)") {
    (0L until 30L).foreach { id =>
      val payload = Mp3.syntheticTaggedMp3(id)
      val frames = Mp3.parseId3TextFrames(payload)
        .getOrElse(fail(s"id=$id tag did not parse"))
      // text frames in tag order; the non-text frame (PRIV / v2.2 CNT)
      // skipped structurally; v2.2 ids (id%3 == 2) emitted RAW
      val want =
        if (id % 3 == 2) IndexedSeq(
          "TT2" -> s"title_${id * 7 % 1000}",
          "TP1" -> s"artist_${id % 50}",
          "TAL" -> s"album_${id % 20}",
          "TRK" -> s"${1 + id % 12}")
        else IndexedSeq(
          "TIT2" -> s"title_${id * 7 % 1000}",
          "TPE1" -> s"artist_${id % 50}",
          "TALB" -> s"album_${id % 20}",
          "TRCK" -> s"${1 + id % 12}")
      assert(frames === want, s"id=$id frames")
      // the MPEG stream behind the tag still frame-walks cleanly
      val audio = Mp3.parseFrames(payload)
        .getOrElse(fail(s"id=$id stream did not parse"))
      assert(audio.length === (3 + id % 6).toInt, s"id=$id stream frames")
    }
    // the sweep must cover all three tag versions AND both v2.2
    // encodings (latin-1 / UCS-2-with-BOM), or the 6-byte-header walk
    // went untested on one of them
    assert((0L until 30L).map(id => 4 - id % 3).distinct.sorted ===
      IndexedSeq(2L, 3L, 4L))
    assert((0L until 30L).filter(_ % 3 == 2).map(id => (id / 3) % 2)
      .distinct.sorted === IndexedSeq(0L, 1L))
    // per-version encoding rotations stay inside each version's
    // SPEC-VALID set (UTF-8 is v2.4-only) and cover it: v2.4 rotates all
    // three encodings, v2.3 both of its two — no spec-invalid v2.3
    // UTF-8 tags ride through on parser leniency (advisor finding)
    assert((0L until 30L).filter(_ % 3 == 0).map(id => (id / 3) % 3)
      .distinct.sorted === IndexedSeq(0L, 1L, 2L))
    assert((0L until 30L).filter(_ % 3 == 1).map(id => 1 - (id / 3) % 2)
      .distinct.sorted === IndexedSeq(0L, 1L))
    // ...and tag-level unsynchronisation with REAL stuffing (the UTF-16
    // BOM is 0xff-led) must occur for BOTH v2.3 and v2.2 in the sweep
    def unsyncWithStuffing(id: Long): Boolean = {
      val p = Mp3.syntheticTaggedMp3(id)
      (p(5) & 0x80) != 0 && {
        val size = ((p(6) & 0x7f) << 21) | ((p(7) & 0x7f) << 14) |
          ((p(8) & 0x7f) << 7) | (p(9) & 0x7f)
        (10 until (10 + size - 1)).exists(i =>
          (p(i) & 0xff) == 0xff && p(i + 1) == 0)
      }
    }
    assert((0L until 30L).exists(id => id % 3 == 1 && unsyncWithStuffing(id)),
      "no v2.3 unsync fixture with real stuffing in the sweep")
    assert((0L until 30L).exists(id => id % 3 == 2 && unsyncWithStuffing(id)),
      "no v2.2 unsync fixture with real stuffing in the sweep")
  }

  test("ID3v2.2: tag-level unsync, compression bit, corrupt encodings") {
    // id 2 → v2.2, latin-1; id 5 → v2.2, UCS-2 with BOM
    val plain = Mp3.syntheticTaggedMp3(2L)
    assert((plain(3) & 0xff) === 2)
    // a v2.2 tag with the compression header bit set must be ignored in
    // its entirety (ID3v2.2 §3.1), never half-decoded
    val compressed = plain.clone(); compressed(5) = 0x40.toByte
    assert(Mp3.parseId3TextFrames(compressed) === None)
    // an encoding byte above 1 inside a v2.2 text frame is corruption
    // (v2.2 defines only 0 and 1) — frame 0 body starts at 10 + 6
    val badEnc = plain.clone(); badEnc(16) = 3
    assert(Mp3.parseId3TextFrames(badEnc) === None)
    // v2.2 tag-level unsynchronisation: 0xff 0x00 stuffing removed
    // before the 6-byte frame walk — build one by hand around a 0xff-
    // leading title
    val raw = {
      val bo = new java.io.ByteArrayOutputStream()
      bo.write("TT2".getBytes("ISO-8859-1"))
      val body = Array[Byte](0, 0xff.toByte, 'A'.toByte)
      bo.write(0); bo.write(0); bo.write(body.length)
      bo.write(body, 0, body.length)
      bo.toByteArray
    }
    // unsync: every 0xff gets a 0x00 stuffed after it
    val stuffed = raw.flatMap(b =>
      if ((b & 0xff) == 0xff) Seq(b, 0.toByte) else Seq(b))
    val tagged = {
      val bo = new java.io.ByteArrayOutputStream()
      bo.write('I'); bo.write('D'); bo.write('3')
      bo.write(2); bo.write(0); bo.write(0x80) // v2.2, unsync flag
      val sz = stuffed.length
      bo.write((sz >> 21) & 0x7f); bo.write((sz >> 14) & 0x7f)
      bo.write((sz >> 7) & 0x7f); bo.write(sz & 0x7f)
      bo.write(stuffed, 0, stuffed.length)
      bo.toByteArray
    }
    assert(Mp3.parseId3TextFrames(tagged) ===
      Some(IndexedSeq("TT2" -> "ÿA")))
  }

  test("ID3v2 corrupt/edge tag forms") {
    val ok = Mp3.syntheticTaggedMp3(6L)
    // lying frame size overrunning the tag → None (frame starts at 10:
    // id 10..13, size 14..17)
    val lying = ok.clone()
    lying(14) = 0x7f.toByte // TIT2's synchsafe size byte 0 → huge
    assert(Mp3.parseId3TextFrames(lying) === None)
    // mangled frame id (non [A-Z0-9]) → None, not a silent skip
    val badId = ok.clone(); badId(13) = '~'.toByte
    assert(Mp3.parseId3TextFrames(badId) === None)
    // a v2.4 tag re-stamped v2.2: the body re-read through 6-byte frame
    // headers mis-slices (the first 24-bit "size" lands on 0x320000,
    // overrunning the tag) → None, not garbage
    val v22 = ok.clone(); v22(3) = 2
    assert(Mp3.parseId3TextFrames(v22) === None)
    // no tag at all
    assert(Mp3.parseId3TextFrames(Mp3.syntheticMp3(1L)) === None)
    assert(Mp3.parseId3TextFrames(null) === None)
    // v2.4 extended header: walker must skip it by its own size
    val bo = new java.io.ByteArrayOutputStream()
    bo.write('I'); bo.write('D'); bo.write('3'); bo.write(4); bo.write(0)
    bo.write(0x40) // extended header present
    val body = {
      val fb = new java.io.ByteArrayOutputStream()
      fb.write(0); fb.write(0); fb.write(0); fb.write(8) // ext size 8
      fb.write(1); fb.write(0); fb.write(0); fb.write(0) // ext payload
      fb.write("TIT2".getBytes("ISO-8859-1"))
      fb.write(0); fb.write(0); fb.write(0); fb.write(3) // size 3
      fb.write(0); fb.write(0) // flags
      fb.write(0); fb.write('h'); fb.write('i') // latin-1 "hi"
      fb.toByteArray
    }
    val sz = body.length
    bo.write((sz >> 21) & 0x7f); bo.write((sz >> 14) & 0x7f)
    bo.write((sz >> 7) & 0x7f); bo.write(sz & 0x7f)
    bo.write(body, 0, body.length)
    assert(Mp3.parseId3TextFrames(bo.toByteArray) ===
      Some(IndexedSeq("TIT2" -> "hi")))
  }

  test("ID3v2 unsynchronisation and undecodable-frame handling") {
    // v2.3 tag-level unsync: text contains ÿ (0xFF), stored as FF 00
    def tag23(frames: Array[Byte], unsync: Boolean): Array[Byte] = {
      val body = if (unsync) {
        val bo = new java.io.ByteArrayOutputStream()
        frames.foreach { b =>
          bo.write(b); if ((b & 0xff) == 0xff) bo.write(0)
        }
        bo.toByteArray
      } else frames
      val out = new java.io.ByteArrayOutputStream()
      out.write('I'); out.write('D'); out.write('3'); out.write(3); out.write(0)
      out.write(if (unsync) 0x80 else 0)
      val sz = body.length
      out.write((sz >> 21) & 0x7f); out.write((sz >> 14) & 0x7f)
      out.write((sz >> 7) & 0x7f); out.write(sz & 0x7f)
      out.write(body, 0, body.length)
      out.toByteArray
    }
    def frame23(fid: String, flags: Int, body: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      bo.write(fid.getBytes("ISO-8859-1"))
      val sz = body.length
      bo.write((sz >> 24) & 0xff); bo.write((sz >> 16) & 0xff)
      bo.write((sz >> 8) & 0xff); bo.write(sz & 0xff)
      bo.write(0); bo.write(flags)
      bo.write(body, 0, body.length)
      bo.toByteArray
    }
    val text = Array[Byte](0) ++ "aÿb".getBytes("ISO-8859-1")
    val plain = frame23("TIT2", 0, text)
    assert(Mp3.parseId3TextFrames(tag23(plain, unsync = true)) ===
      Some(IndexedSeq("TIT2" -> "aÿb")))
    // v2.3 compressed (0x80) and encrypted (0x40) frames are SKIPPED
    val mixed = frame23("TIT2", 0x80, text) ++ frame23("TALB", 0x40, text) ++
      frame23("TPE1", 0, Array[Byte](0) ++ "ok".getBytes("ISO-8859-1"))
    assert(Mp3.parseId3TextFrames(tag23(mixed, unsync = false)) ===
      Some(IndexedSeq("TPE1" -> "ok")))
    // v2.4 frame-level unsync (format flag 0x02) + data-length indicator
    // (0x01): body = DLI(4 synchsafe) + unsynced encoding byte + text
    val bo = new java.io.ByteArrayOutputStream()
    bo.write('I'); bo.write('D'); bo.write('3'); bo.write(4); bo.write(0)
    bo.write(0)
    val fr = {
      val fb = new java.io.ByteArrayOutputStream()
      val raw = Array[Byte](0) ++ "xÿy".getBytes("ISO-8859-1")
      val dli = Array[Byte](0, 0, 0, raw.length.toByte)
      val unsynced = {
        val u = new java.io.ByteArrayOutputStream()
        raw.foreach { b => u.write(b); if ((b & 0xff) == 0xff) u.write(0) }
        u.toByteArray
      }
      val body = dli ++ unsynced
      fb.write("TIT2".getBytes("ISO-8859-1"))
      fb.write((body.length >> 21) & 0x7f); fb.write((body.length >> 14) & 0x7f)
      fb.write((body.length >> 7) & 0x7f); fb.write(body.length & 0x7f)
      fb.write(0); fb.write(0x03) // unsync + DLI
      fb.write(body, 0, body.length)
      fb.toByteArray
    }
    bo.write((fr.length >> 21) & 0x7f); bo.write((fr.length >> 14) & 0x7f)
    bo.write((fr.length >> 7) & 0x7f); bo.write(fr.length & 0x7f)
    bo.write(fr, 0, fr.length)
    assert(Mp3.parseId3TextFrames(bo.toByteArray) ===
      Some(IndexedSeq("TIT2" -> "xÿy")))
  }

  test("trailing ID3v1 TAG terminates cleanly; corrupt forms return None") {
    val ok = Mp3.syntheticMp3(4L)
    val tagged = ok ++ ("TAG" + "x" * 125).getBytes("ISO-8859-1")
    assert(Mp3.parseFrames(tagged).get.length ===
      Mp3.parseFrames(ok).get.length)
    // truncated last frame
    assert(Mp3.parseFrames(ok.dropRight(3)) === None)
    // mid-stream corruption: flip a header byte of the second frame
    val frames = Mp3.parseFrames(ok).get
    val bad = ok.clone(); bad(frames(1).offset.toInt) = 0x00
    assert(Mp3.parseFrames(bad) === None)
    // trailing garbage that is neither a frame nor a TAG block
    assert(Mp3.parseFrames(ok ++ Array[Byte](1, 2, 3, 4, 5)) === None)
    // free-bitrate (0) and bad (15) indices rejected
    val free = ok.clone(); free(2) = ((0 << 4) | (free(2) & 0x0f)).toByte
    assert(Mp3.parseFrames(free) === None)
    assert(Mp3.parseFrames(null) === None)
    assert(Mp3.parseFrames("definitely not audio data".getBytes) === None)
    // ID3v2-only payload (no frames) is None, not an empty success
    assert(Mp3.parseFrames(Mp3.syntheticMp3(0L).take(27)) === None)
  }

  test("ID3v1: fixture decodes to the closed form; padding trimmed (IDs 0-47)") {
    (0L until 48L).foreach { id =>
      val payload = Mp3.syntheticV1TaggedMp3(id)
      Mp3.parseId3v1(payload) match {
        case Some(t) =>
          assert(id % 4 != 3, s"id=$id should be untagged")
          assert(t.title === s"title_${id * 7 % 1000}", s"id=$id")
          assert(t.artist === s"artist_${id % 50}", s"id=$id") // space-padded
          assert(t.album === s"album_${id % 20}")
          assert(t.year === s"${1970 + id % 55}")
          assert(t.comment === s"c_${id % 100}")
          assert(t.track ===
            (if (id % 3 == 0) Some((1 + id % 30).toInt) else None), s"id=$id")
          assert(t.genre === (id % 80).toInt)
          // the FRAME walk still terminates cleanly at the trailing TAG
          assert(Mp3.parseFrames(payload).exists(_.nonEmpty), s"id=$id")
        case None =>
          assert(id % 4 == 3, s"id=$id lost its tag")
      }
    }
  }

  test("ID3v1: absence and truncation contracts") {
    assert(Mp3.parseId3v1(null) === None)
    assert(Mp3.parseId3v1(Array.emptyByteArray) === None)
    assert(Mp3.parseId3v1(Mp3.syntheticMp3(1L)) === None) // no tag
    val tagged = Mp3.syntheticV1TaggedMp3(0L)
    assert(Mp3.parseId3v1(tagged.take(tagged.length - 1)) === None)
    // v1.0 vs v1.1 split: byte 125 nonzero means 30-byte comment
    val t1 = Mp3.parseId3v1(Mp3.syntheticV1TaggedMp3(1L)).get // 1%3!=0
    assert(t1.track === None)
  }
}
