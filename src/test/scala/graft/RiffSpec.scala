package graft

import graft.functions.Riff
import org.scalatest.funsuite.AnyFunSuite

/** RIFF LIST/INFO tag walk: the tagged-WAV fixture against its closed
 * form, the odd-size pad rule, and the corrupt contract. */
class RiffSpec extends AnyFunSuite {

  test("tagged fixture decodes to the closed tag form (IDs 0-59)") {
    (0L until 60L).foreach { id =>
      val tags = Riff.parseInfoTags(Riff.syntheticTaggedWav(id))
        .getOrElse(fail(s"id=$id did not parse"))
      if (id % 5 == 3) assert(tags.isEmpty, s"id=$id should be tagless")
      else {
        assert(tags.map(t => (t.key, t.value)) === Seq(
          ("INAM", s"title_${id * 7 % 1000}"),
          ("IART", s"artist_${id % 50}"),
          ("ICRD", s"${1970 + id % 55}"),
          ("ICMT", s"cömment_${id % 10}")), s"id=$id")
      }
    }
  }

  test("odd data chunk exercises the pad rule: even ids have odd data size") {
    // 101 + id%50 is odd exactly when id is even; both parities appear
    // in the sweep, so a walker that forgets the pad byte desyncs on
    // half the fixtures before the LIST and fails the first test
    val even = Riff.syntheticTaggedWav(2L)
    val odd = Riff.syntheticTaggedWav(5L) // 5%5 == 0, so it carries tags
    assert((101 + 2 % 50) % 2 === 1)
    assert((101 + 5 % 50) % 2 === 0)
    assert(Riff.parseInfoTags(even).exists(_.nonEmpty))
    assert(Riff.parseInfoTags(odd).exists(_.nonEmpty))
  }

  test("values are trimmed at the stored NUL terminator") {
    val tags = Riff.parseInfoTags(Riff.syntheticTaggedWav(7L)).get
    assert(tags.forall(t => !t.value.contains('\u0000')))
  }

  test("trailing junk chunk after the LIST does not break the walk") {
    // id%3==0 appends an odd-size junk chunk AFTER the tags
    val tags = Riff.parseInfoTags(Riff.syntheticTaggedWav(6L)).get
    assert(tags.size === 4)
  }

  test("corrupt forms return None, never throw") {
    val ok = Riff.syntheticTaggedWav(1L)
    val magic = ok.clone(); magic(0) = 'X'
    assert(Riff.parseInfoTags(magic) === None)
    val notWave = ok.clone(); notWave(8) = 'A'
    assert(Riff.parseInfoTags(notWave) === None)
    // RIFF size overrunning the payload
    val overrun = ok.clone(); overrun(4) = (overrun(4) + 50).toByte
    assert(Riff.parseInfoTags(overrun) === None)
    // a chunk size overrunning the RIFF body (fmt size mangled huge)
    val badChunk = ok.clone(); badChunk(17) = 0x7f.toByte
    assert(Riff.parseInfoTags(badChunk) === None)
    assert(Riff.parseInfoTags(null) === None)
    assert(Riff.parseInfoTags(Array.emptyByteArray) === None)
    assert(Riff.parseInfoTags(ok.take(20)) === None)
    // truncated INSIDE the LIST: clamp RIFF size to cut the tag list
    // mid-subchunk — the inner walk must reject, not stride past
    val riffLen = ((ok(4) & 0xff) | ((ok(5) & 0xff) << 8) |
      ((ok(6) & 0xff) << 16) | ((ok(7) & 0xff) << 24))
    val cut = ok.take(8 + riffLen - 6)
    val cutLen = cut.length - 8
    cut(4) = (cutLen & 0xff).toByte; cut(5) = ((cutLen >> 8) & 0xff).toByte
    cut(6) = ((cutLen >> 16) & 0xff).toByte
    cut(7) = ((cutLen >> 24) & 0xff).toByte
    assert(Riff.parseInfoTags(cut) === None)
  }

  test("a clean WAV without fmt is rejected; tagless clean WAV is Some(empty)") {
    val tagless = Riff.syntheticTaggedWav(3L) // id%5==3 → no LIST
    assert(Riff.parseInfoTags(tagless) === Some(Vector.empty))
    // structurally clean RIFF/WAVE with only a data chunk: no fmt → None
    val bo = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = { bo.write(v & 0xff); bo.write((v >> 8) & 0xff)
      bo.write((v >> 16) & 0xff); bo.write((v >> 24) & 0xff) }
    bo.write("RIFF".getBytes, 0, 4); u32(4 + 8 + 4)
    bo.write("WAVE".getBytes, 0, 4)
    bo.write("data".getBytes, 0, 4); u32(4); u32(0)
    assert(Riff.parseInfoTags(bo.toByteArray) === None)
  }
}
