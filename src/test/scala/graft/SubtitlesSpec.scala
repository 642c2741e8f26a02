package graft

import graft.functions.Subtitles
import org.scalatest.funsuite.AnyFunSuite

/** SRT/WebVTT cue extraction: fixture vs closed form across format
 * rotations, the VTT-specific surfaces, and the reject contract. */
class SubtitlesSpec extends AnyFunSuite {

  test("fixture decodes to the closed cue form (IDs 0-83, all rotations)") {
    (0L until 84L).foreach { id =>
      val cues = Subtitles.parseCues(Subtitles.syntheticSubtitle(id))
        .getOrElse(fail(s"id=$id did not parse"))
      val n = if (id % 7 == 5) 0 else (2 + id % 3).toInt
      assert(cues.size === n, s"id=$id")
      cues.zipWithIndex.foreach { case (c, j) =>
        assert(c.startMs === j * 5000L + id % 1000, s"id=$id j=$j")
        assert(c.endMs === c.startMs + 2000 + (id + j) % 500, s"id=$id j=$j")
        val expect = s"line_${id}_$j" +
          (if ((id + j) % 2 == 0) s"\ncont_$j" else "")
        assert(c.text === expect, s"id=$id j=$j")
      }
    }
  }

  test("VTT surfaces: BOM, settings, identifiers, NOTE blocks, no-hours") {
    val doc = "\ufeffWEBVTT\n\nNOTE a comment\nmore comment\n\n" +
      "intro-cue\n00:01.000 --> 00:03.500 position:10% line:0\nhello\nworld\n\n" +
      "01:02:03.250 --> 01:02:04.000\nsecond\n"
    val cues = Subtitles.parseCues(doc).getOrElse(fail("did not parse"))
    assert(cues.size === 2)
    assert(cues(0) === Subtitles.Cue(1000L, 3500L, "hello\nworld"))
    assert(cues(1) === Subtitles.Cue(3723250L, 3724000L, "second"))
  }

  test("SRT: comma timings, CRLF, index not trusted for numbering") {
    val doc = "7\r\n00:00:01,500 --> 00:00:02,000\r\nfirst\r\n\r\n" +
      "2\r\n00:00:03,000 --> 00:00:04,250\r\nsecond line\r\n"
    val cues = Subtitles.parseCues(doc).getOrElse(fail("did not parse"))
    assert(cues.map(_.startMs) === Vector(1500L, 3000L))
    assert(cues(1).endMs === 4250L)
  }

  test("rejects: malformed timings, junk blocks, trailing settings in SRT") {
    assert(Subtitles.parseCues(null) === None)
    assert(Subtitles.parseCues("1\nnot a timing\ntext\n") === None)
    assert(Subtitles.parseCues("abc\n00:00:01,000 --> 00:00:02,000\nx\n")
      === None) // SRT index must be digits
    assert(Subtitles.parseCues(
      "1\n00:00:01,000 --> 00:00:02,000 position:5\nx\n") === None)
    assert(Subtitles.parseCues(
      "1\n00:00:01,00 --> 00:00:02,000\nx\n") === None) // 2-digit ms
    assert(Subtitles.parseCues(
      "WEBVTT\n\n00:01.000 --> garbage\nx\n") === None)
    // empty and header-only are clean
    assert(Subtitles.parseCues("") === Some(Vector.empty))
    assert(Subtitles.parseCues("WEBVTT\n") === Some(Vector.empty))
  }
}
