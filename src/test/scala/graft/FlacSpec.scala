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

  test("sniffMediaType classifies flac") {
    import graft.functions.{Multimodal => M}
    assert(M.sniffMediaType(Flac.syntheticFlac(3L)) === "flac")
    assert(M.sniffMediaType("fLaX not flac".getBytes) === "unknown")
  }
}
