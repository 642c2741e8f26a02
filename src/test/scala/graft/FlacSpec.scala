package graft

import graft.functions.Flac
import org.scalatest.funsuite.AnyFunSuite

/** FLAC STREAMINFO decode: the bit-packed fixture against its closed
 * form, metadata-chain validation, and the corrupt contract. */
class FlacSpec extends AnyFunSuite {

  test("synthetic fixture decodes to the closed form (IDs 0-29)") {
    (0L until 30L).foreach { id =>
      val si = Flac.parseStreamInfo(Flac.syntheticFlac(id))
        .getOrElse(fail(s"id=$id did not parse"))
      assert(si.sampleRate === Seq(44100, 48000, 96000, 22050)((id % 4).toInt))
      assert(si.channels === (1 + id % 3).toInt)
      assert(si.bitsPerSample === Seq(16, 24, 8)((id % 3).toInt))
      assert(si.totalSamples === 1000L + id % 9999)
      assert((si.minBlock, si.maxBlock) === ((16, 16)))
    }
    // a 36-bit total-samples value survives the packing
    val big = 0x8_1234_5678L // needs bits above 32
    assert(big < (1L << 36))
  }

  test("corrupt forms return None, never throw") {
    val ok = Flac.syntheticFlac(5L)
    // wrong magic
    val magic = ok.clone(); magic(0) = 'g'
    assert(Flac.parseStreamInfo(magic) === None)
    // STREAMINFO not first (type byte mangled to PADDING)
    val notFirst = ok.clone(); notFirst(4) = 0x01
    assert(Flac.parseStreamInfo(notFirst) === None)
    // wrong STREAMINFO size
    val badSize = ok.clone(); badSize(7) = 33
    assert(Flac.parseStreamInfo(badSize) === None)
    // a later metadata block overrunning the payload
    val overrun = ok.clone(); overrun(4 + 4 + 34 + 1) = 0x7f.toByte
    assert(Flac.parseStreamInfo(overrun) === None)
    // zero sample rate is invalid per spec
    val zeroRate = ok.clone()
    zeroRate(18) = 0; zeroRate(19) = 0
    zeroRate(20) = (zeroRate(20) & 0x0f).toByte
    assert(Flac.parseStreamInfo(zeroRate) === None)
    assert(Flac.parseStreamInfo(null) === None)
    assert(Flac.parseStreamInfo(Array.emptyByteArray) === None)
    assert(Flac.parseStreamInfo("fLaX plus random text data!!!{}{}{}{}[]".getBytes) === None)
    assert(Flac.parseStreamInfo(ok.take(30)) === None)
  }

  test("commented fixture decodes to the closed comment form (IDs 0-39)") {
    (0L until 40L).foreach { id =>
      val payload = Flac.syntheticCommentedFlac(id)
      // STREAMINFO still decodes through the multi-block chain
      val si = Flac.parseStreamInfo(payload)
        .getOrElse(fail(s"id=$id streaminfo did not parse"))
      assert(si.sampleRate === Seq(44100, 48000, 96000, 22050)((id % 4).toInt))
      Flac.parseComments(payload) match {
        case Some((vendor, cs)) =>
          assert(id % 5 != 4, s"id=$id is tagless but produced comments")
          assert(vendor === s"graft ${id % 7}")
          assert(cs === IndexedSeq(
            "TITLE" -> s"title_${id * 7 % 1000}",
            "ARTIST" -> s"artist_${id % 50}",
            "ALBUM" -> s"album_${id % 20}",
            "TRACKNUMBER" -> s"${1 + id % 12}",
            "DESCRIPTION" -> s"ünïcode_${id % 10}"))
        case None =>
          assert(id % 5 == 4, s"id=$id comments did not parse")
      }
    }
    // the sweep exercises padding-before, application-after, both, and
    // neither — the walk is tested on both sides of the tag
    val shapes = (0L until 40L).map(id => (id % 3 == 0, id % 4 == 1)).toSet
    assert(shapes.size === 4)
  }

  test("comment contract: duplicates, overruns and malformed bodies poison") {
    val ok = Flac.syntheticCommentedFlac(13L) // no padding, APPLICATION after
    assert(Flac.parseComments(ok).isDefined)
    // the m22 stride-over fixture's comment block holds junk bytes — a
    // malformed body is a detectable absence, never garbage rows
    assert(Flac.parseComments(Flac.syntheticFlac(7L)) === None)
    // tagless file: absence, not corruption
    assert(Flac.parseComments(Flac.syntheticCommentedFlac(4L)) === None)
    // duplicate VORBIS_COMMENT: the spec allows at most one — rewrite
    // id 13's APPLICATION block (follows the comment) into a copy-typed
    // comment block; the body is junk but the DUPLICATE must poison
    // before any body decode
    val si = 4 + 4 + 34
    val dup = ok.clone()
    // block after STREAMINFO is the comment; find the APPLICATION header
    val cSize = ((dup(si + 1) & 0xff) << 16) | ((dup(si + 2) & 0xff) << 8) |
      (dup(si + 3) & 0xff)
    val appHdr = si + 4 + cSize
    assert((dup(appHdr) & 0x7f) === 2, "fixture shape changed")
    dup(appHdr) = (dup(appHdr) & 0x80 | 4).toByte
    assert(Flac.parseComments(dup) === None)
    // corrupted length: comment block size points past the payload —
    // structural corruption rejects the whole file (parseStreamInfo
    // contract), so comments also come back None
    val overrun = ok.clone()
    overrun(si + 1) = 0x7f.toByte
    assert(Flac.parseComments(overrun) === None)
    assert(Flac.parseStreamInfo(overrun) === None)
    // a comment LENGTH field overrunning its block poisons even though
    // the bytes after the block would satisfy it: the decode is bounded
    // by the BLOCK, not the file
    val longLen = ok.clone()
    longLen(si + 4) = 0xff.toByte // vendor length low byte → huge
    longLen(si + 5) = 0xff.toByte
    assert(Flac.parseComments(longLen) === None)
    // comment without '=' and invalid UTF-8 poison via the shared body
    // decoder (pinned in depth in OggSpec; spot-checked here through the
    // FLAC path): flip the '=' of TITLE to '_'
    val noEq = ok.clone()
    val eqIdx = {
      val s = new String(noEq.map(b => (b & 0xff).toChar))
      s.indexOf("TITLE=")
    }
    assert(eqIdx > 0)
    noEq(eqIdx + 5) = '_'
    assert(Flac.parseComments(noEq) === None)
  }

  test("sniffMediaType classifies flac") {
    import graft.functions.{Multimodal => M}
    assert(M.sniffMediaType(Flac.syntheticFlac(3L)) === "flac")
    assert(M.sniffMediaType("fLaX not flac".getBytes) === "unknown")
  }
}
