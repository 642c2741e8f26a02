package graft

import graft.functions.Ebml
import org.scalatest.funsuite.AnyFunSuite

/** Matroska/WebM EBML walk: the fixture against its closed form
 * (known- and unknown-size segments, float widths, non-minimal size
 * vints), and the corrupt contract. */
class EbmlSpec extends AnyFunSuite {

  private def meta(id: Long): Ebml.MkvMeta =
    Ebml.parseMkv(Ebml.syntheticMkv(id))
      .getOrElse(fail(s"id=$id did not parse"))

  test("fixture decodes to the closed form (IDs 0-59, all rotations)") {
    (0L until 60L).foreach { id =>
      val m = meta(id)
      assert(m.docType === (if (id % 2 == 0) "webm" else "matroska"), s"id=$id")
      assert(m.timestampScale === 1000000L)
      if (id % 5 == 2) assert(m.durationMs === None, s"id=$id")
      else assert(m.durationMs === Some(30000 + id % 10000), s"id=$id")
      assert(m.muxingApp === Some(s"graft_mux ${id % 7}"))
      val expectedTracks = (if (id % 5 != 4) 1 else 0) + 1
      assert(m.tracks.size === expectedTracks, s"id=$id")
      if (id % 5 != 4) {
        val v = m.tracks.head
        assert(v.trackNo === 1L)
        assert(v.trackType === "video")
        assert(v.codecId === (if (id % 2 == 0) "V_VP9" else "V_MPEG4/ISO/AVC"))
        assert(v.width === Some((160 + (id * 7) % 1760).toInt), s"id=$id")
        assert(v.height === Some((120 + (id * 3) % 960).toInt), s"id=$id")
        assert(v.channels === None)
        assert(v.sampleRate === None)
      }
      val a = m.tracks.last
      assert(a.trackNo === 2L)
      assert(a.trackType === "audio")
      assert(a.codecId === (if (id % 2 == 0) "A_OPUS" else "A_VORBIS"))
      assert(a.channels === Some((1 + id % 2).toInt))
      assert(a.sampleRate === Some(if (id % 2 == 0) 48000 else 44100))
      assert(a.width === None)
    }
  }

  test("unknown-size segments (id%3==0) and known-size agree on content") {
    // ids 0 and 6 are unknown-size, 2 and 4 known — all parse; the
    // rotations are closed-form so the first test already pins values.
    // Here: strip trailing bytes from a KNOWN-size segment → reject,
    // while the same strip on UNKNOWN-size (runs to EOF) re-parses as
    // long as the cut lands exactly on an element boundary... it does
    // not here, so both must reject — the walk never "rescues" a cut.
    val known = Ebml.syntheticMkv(2L)
    assert(Ebml.parseMkv(known.dropRight(5)) === None)
    val unknown = Ebml.syntheticMkv(3L)
    assert(Ebml.parseMkv(unknown.dropRight(5)) === None)
  }

  test("4-byte and 8-byte duration floats both decode exactly") {
    assert(meta(4L).durationMs === Some(30004L)) // float32 path
    assert(meta(9L).durationMs === Some(30009L)) // float64 path (9%5 != 2)
  }

  test("corrupt forms return None, never throw") {
    assert(Ebml.parseMkv(null) === None)
    assert(Ebml.parseMkv(Array.emptyByteArray) === None)
    assert(Ebml.parseMkv("utterly not ebml, not even close".getBytes) === None)
    val ok = Ebml.syntheticMkv(1L)
    // magic mangled
    val magic = ok.clone(); magic(0) = 0x1B
    assert(Ebml.parseMkv(magic) === None)
    // truncated mid-tracks
    assert(Ebml.parseMkv(ok.take(ok.length / 2)) === None)
    // trailing garbage after a known-size segment (id=1 is known-size)
    assert(Ebml.parseMkv(ok ++ Array[Byte](9, 9, 9)) === None)
    // a zero byte where an element id must start (invalid vint)
    val zid = ok.clone()
    // EBML header body starts after id(4)+size(1): mangle its first
    // child id to 0 → walkChildren rejects
    zid(5) = 0
    assert(Ebml.parseMkv(zid) === None)
  }

  test("a 36-hour float duration with a 1ms timestamp scale survives") {
    // closed-form guard on the ms conversion: duration is stored in
    // timestamp-scale units; scale 1e6 ns = 1 ms → value IS the ms
    val m = meta(8L)
    assert(m.durationMs === Some(30008L))
  }

  test("cues fixture: parse + locator replay match the closed form (IDs 0-120)") {
    (0L until 121L).foreach { id =>
      val b = Ebml.syntheticMkvCues(id)
      val (sbody, cues) = Ebml.parseMkvCues(b)
        .getOrElse(fail(s"id=$id did not parse"))
      if (id % 5 == 3) assert(cues.isEmpty, s"id=$id live-muxed has no cues")
      else {
        val n = (1 + id % 4).toInt
        assert(cues.size === n, s"id=$id")
        cues.zipWithIndex.foreach { case (c, k) =>
          assert(c.time === k * 1000L + id % 997, s"id=$id k=$k time")
          assert(c.track === 1L, s"id=$id k=$k track")
          val (found, ts) = Ebml.replayCueLocator(b, sbody, c.clusterPos)
          if (id % 9 == 7 && k == 0) {
            assert(!found || !ts.contains(c.time),
              s"id=$id forged locator must not agree")
          } else {
            assert(found, s"id=$id k=$k cluster found")
            assert(ts === Some(c.time), s"id=$id k=$k timestamp agrees")
          }
        }
        // the m30 walker also accepts the cues fixture (real clusters
        // stride like opaque ones) — cross-walker agreement
        assert(Ebml.parseMkv(b).isDefined, s"id=$id parseMkv accepts")
      }
    }
  }

  test("m60: frame extraction matches the closed form (IDs 0-120)") {
    (0L until 120L).foreach { id =>
      val b = Ebml.syntheticMkvFrames(id)
      val got = Ebml.extractCuedFrames(b)
      if (id % 8 == 5 && id % 5 != 3) {
        assert(got.isEmpty, s"id=$id laced file must refuse")
      } else if (id % 5 == 3) {
        assert(got.exists(_.isEmpty), s"id=$id no cues → zero frames")
      } else {
        val rows = got.getOrElse(fail(s"id=$id did not extract"))
        val want = for {
          k <- 0 until (1 + id % 4).toInt
          if !(id % 9 == 7 && k == 0) // forged cue: nothing for it
          m <- 0 until (1 + (id + k) % 3).toInt
        } yield (k, m)
        assert(rows.map(r => (r._1, r._2)) === want.toIndexedSeq, s"id=$id")
        rows.foreach { case (k, m, track, absTime, key, frame) =>
          assert(track === 1L, s"id=$id track")
          val rel = m * 40 - (if (id % 3 == 1) 20 else 0)
          assert(absTime === k * 1000L + id % 997 + rel,
            s"id=$id signed relative time")
          assert(key === (m == 0), s"id=$id keyframe")
          assert(frame.toSeq === Seq.tabulate((10 + (id + k + m) % 20).toInt)(
            j => ((id * 3 + k * 7 + m * 11 + j) & 0xff).toByte), s"id=$id frame")
        }
      }
    }
    // signedness really pinned: id=1 (id%3==1), block 0 of cluster 0
    // sits 20ms BEFORE the cluster timestamp
    val r1 = Ebml.extractCuedFrames(Ebml.syntheticMkvFrames(1L)).get
    assert(r1.head._4 === 1L % 997 - 20)
    // parseSimpleBlock refusals: short body, laced flags
    assert(Ebml.parseSimpleBlock(Array[Byte](0x81.toByte, 0, 0), 0, 3).isEmpty)
    assert(Ebml.parseSimpleBlock(
      Array[Byte](0x81.toByte, 0, 0, 0x06, 1, 2), 0, 6).isEmpty)
  }

  test("cues corrupt contract: truncation, double index, missing fields") {
    val good = Ebml.syntheticMkvCues(1L) // has cues (1%5 != 3)
    assert(Ebml.parseMkvCues(good).isDefined)
    // truncations never throw; most refuse (known-size segment must
    // close the payload exactly)
    (1 until good.length).foreach { cut =>
      val r = try Ebml.parseMkvCues(good.take(cut))
      catch { case e: Throwable => fail(s"threw at cut=$cut: $e") }
      assert(r.isEmpty, s"cut=$cut")
    }
    assert(Ebml.parseMkvCues(null).isEmpty)
    // a locator past end-of-payload reports not-found, never throws
    val (sbody, cues) = Ebml.parseMkvCues(good).get
    assert(Ebml.replayCueLocator(good, sbody, good.length.toLong)._1 === false)
    assert(Ebml.replayCueLocator(good, sbody, -1L)._1 === false)
    assert(Ebml.replayCueLocator(good, sbody, cues.head.clusterPos + 2)._1
      === false)
  }
}
