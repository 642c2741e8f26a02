package graft

import graft.functions.{Mp4, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF demux: progressive (stbl walk) and fragmented (moof/tfhd/trun)
 * forms against an INDEPENDENT closed-form replay of the fixture layout,
 * plus the corrupt-payload contract (None, never throw) and the
 * never-byte-window-a-sniffed-MP4 routing rule. */
class Mp4Spec extends SparkTestBase {

  // ---- independent closed-form replay of the fragmented fixture ----
  // (no, offset, size, keyframe, duration) per sample; mirrors the shape
  // documented on Mp4.syntheticFmp4Shape
  private def expectedFmp4(id: Long): IndexedSeq[(Int, Long, Long, Boolean, Long)] = {
    val nf = (2 + id % 3).toInt
    def kOf(f: Int) = (1 + ((id + f) % 4)).toInt
    def size(f: Int, i: Int): Long =
      if (f % 3 == 1) 40 + ((id * 37 + f * 19) % 50)
      else 40 + ((id * 37 + f * 19 + i * 13) % 50)
    def moofSize(f: Int): Long = {
      val k = kOf(f)
      if (f % 3 == 0) 72 + 4 * k
      else if (f % 3 == 1) 112
      // scheme C splits into two trafs at k>=2 (second on the implicit
      // end-of-previous-traf base) — bigger moof, same sample offsets
      else if (k >= 2) 108 + 16 * k
      else 68 + 16 * k
    }
    var pos = Mp4.FMp4DataStart.toLong
    var gi = 0
    val out = IndexedSeq.newBuilder[(Int, Long, Long, Boolean, Long)]
    (0 until nf).foreach { f =>
      val k = kOf(f)
      var off = pos + moofSize(f) + 8
      (0 until k).foreach { i =>
        val sz = size(f, i)
        val kf = if (f % 3 == 2) i % 3 == 0 else i == 0
        val dur: Long =
          if (f % 3 == 0) 800L
          else if (f % 3 == 1) 900 + ((id + 7L * f) % 5) * 50
          else 900 + ((id + 7L * f + 3L * i) % 5) * 50
        out += ((gi, off, sz, kf, dur))
        off += sz
        gi += 1
      }
      pos = off
    }
    out.result()
  }

  test("fragmented fixture: every sample resolves to the closed-form layout") {
    (0L until 24L).foreach { id =>
      val payload = Mp4.syntheticFmp4(id)
      val tr = Mp4.parseVideoTrack(payload)
        .getOrElse(fail(s"id=$id: fMP4 did not parse"))
      assert(tr.width === 16 * (1 + id % 3), s"id=$id width")
      assert(tr.height === 16 * (1 + id % 4), s"id=$id height")
      assert(tr.timescale === 25600L, s"id=$id timescale")
      val want = expectedFmp4(id)
      assert(tr.samples.length === want.length, s"id=$id sample count")
      tr.samples.zip(want).foreach { case (s, (no, off, sz, kf, dur)) =>
        assert((s.no, s.offset, s.size, s.keyframe, s.duration) ===
          ((no, off, sz, kf, dur)), s"id=$id sample $no")
        // byte probes: the slice must carry the deterministic content
        assert((payload(s.offset.toInt) & 0xff) === ((id + no * 131L) % 256).toInt,
          s"id=$id sample $no head byte")
        assert((payload((s.offset + s.size - 1).toInt) & 0xff) ===
          ((id + no * 131L + sz - 1) % 256).toInt, s"id=$id sample $no tail byte")
      }
      // total length consistency: last sample ends at EOF
      val last = tr.samples.last
      assert(last.offset + last.size === payload.length.toLong, s"id=$id EOF")
    }
  }

  test("fragmented init segment is the pinned 641-byte constant; first moof follows") {
    val p = Mp4.syntheticFmp4(5L)
    assert(new String(p, Mp4.FMp4DataStart + 4, 4, "ISO-8859-1") === "moof")
  }

  test("progressive fixture still resolves (v0/stco, v1, co64 forms)") {
    Seq((false, false), (true, false), (false, true)).foreach { case (co64, v1) =>
      (0L until 12L).foreach { id =>
        val tr = Mp4.parseVideoTrack(Mp4.syntheticMp4(id, co64 = co64, v1 = v1))
          .getOrElse(fail(s"id=$id co64=$co64 v1=$v1 did not parse"))
        val (n, size, w, h) = Mp4.syntheticShape(id)
        assert(tr.samples.length === n)
        assert((tr.width, tr.height) === ((w, h)))
        assert(tr.samples.map(_.size).sum === (0 until n).map(size(_).toLong).sum)
        assert(tr.samples.forall(s => s.keyframe == (s.no % 4 == 0)))
      }
    }
  }

  test("corrupt payloads return None, never throw") {
    val prog = Mp4.syntheticMp4(7L)
    val frag = Mp4.syntheticFmp4(7L)
    // truncation: progressive loses moov (at the end); fragmented loses
    // mdat bytes a trun still claims — range validation must catch it
    assert(Mp4.parseVideoTrack(prog.dropRight(10)) === None)
    assert(Mp4.parseVideoTrack(frag.dropRight(10)) === None)
    // lying stco: patch the first chunk offset to point past EOF
    val lying = prog.clone()
    val stcoAt = {
      val idx = (0 until lying.length - 8).find(i =>
        new String(lying, i + 4, 4, "ISO-8859-1") == "stco").get
      idx + 8 + 8 // header + ver/flags + count → first entry
    }
    lying(stcoAt) = 0x7f.toByte // ~2.1 GB offset, far past EOF
    assert(Mp4.parseVideoTrack(lying) === None)
    // lying trun sample_count must not spin or throw
    val lyingTrun = frag.clone()
    val trunAt = (0 until lyingTrun.length - 8).find(i =>
      new String(lyingTrun, i + 4, 4, "ISO-8859-1") == "trun").get
    lyingTrun(trunAt + 8 + 4) = 0x7f.toByte // sample_count ~2.1e9
    assert(Mp4.parseVideoTrack(lyingTrun) === None)
    // empty / tiny / non-media payloads
    assert(Mp4.parseVideoTrack(null) === None)
    assert(Mp4.parseVideoTrack(Array.emptyByteArray) === None)
    assert(Mp4.parseVideoTrack("not a video at all, just text".getBytes) === None)
  }

  test("sniffIsoBmff: true for MP4 forms (even undemuxable), false for other bytes") {
    assert(Mp4.sniffIsoBmff(Mp4.syntheticMp4(3L)))
    assert(Mp4.sniffIsoBmff(Mp4.syntheticFmp4(3L)))
    // init-only segment: sniffs as ISO-BMFF although demux yields nothing
    assert(Mp4.sniffIsoBmff(Mp4.syntheticFmp4(3L).take(Mp4.FMp4DataStart)))
    assert(!Mp4.sniffIsoBmff("plain text payload that is long enough".getBytes))
    assert(!Mp4.sniffIsoBmff(Array.fill(64)(0x42.toByte)))
    assert(!Mp4.sniffIsoBmff(null))
  }

  test("sniffMediaType classifies all payload families by magic bytes") {
    import graft.functions.{Mp3, Multimodal => M}
    assert(M.sniffMediaType(M.syntheticPng(16, 8, 3L)) === "png")
    assert(M.sniffMediaType(M.syntheticGif(8, 8, 3, 3L)) === "gif")
    assert(M.sniffMediaType(Mp4.syntheticMp4(3L)) === "mp4")
    assert(M.sniffMediaType(Mp4.syntheticFmp4(3L)) === "mp4")
    assert(M.sniffMediaType(Mp3.syntheticMp3(3L)) === "mp3")   // ID3-less frame
    assert(M.sniffMediaType(Mp3.syntheticMp3(3L * 3)) === "mp3") // ID3v2 lead
    assert(M.sniffMediaType(M.syntheticWav(8000, 1, 16, 3L)) === "wav")
    assert(M.sniffMediaType(graft.functions.Ogg.syntheticOgg(3L)) === "ogg")
    assert(M.sniffMediaType("just some text".getBytes) === "unknown")
    assert(M.sniffMediaType(Array.emptyByteArray) === "empty")
    assert(M.sniffMediaType(null) === "empty")
    assert(M.sniffMediaType(Array[Byte](0x1f, 0x8b.toByte, 8)) === "gzip")
    // 'BM'-prefixed TEXT is not a bitmap: the DIB header size must check out
    assert(M.sniffMediaType(
      "BMW manuals are long documents about cars".getBytes) === "unknown")
    // a real BMP header (BITMAPINFOHEADER, dib=40) classifies
    val bmp = new Array[Byte](26 + 14)
    bmp(0) = 'B'; bmp(1) = 'M'; bmp(14) = 40
    assert(M.sniffMediaType(bmp) === "bmp")
  }

  // ---- hand-built multi-traf moofs (muxed audio+video shape) ----
  private def mkBox(typ: String)(body: java.io.DataOutputStream => Unit): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    body(new java.io.DataOutputStream(bo))
    val payload = bo.toByteArray
    val out = java.nio.ByteBuffer.allocate(8 + payload.length)
    out.putInt(8 + payload.length)
    out.put(typ.getBytes("ISO-8859-1")); out.put(payload)
    out.array()
  }
  private val SyncFlags = 0x02000000

  test("multi-traf moof: a later video traf bases on the END of a foreign traf's data") {
    // init segment from the fixture (video track 2, trex for track 2 only)
    val init = Mp4.syntheticFmp4(3L).take(Mp4.FMp4DataStart)
    // moof: [mfhd][traf track 9: per-sample sizes 10,20][traf track 2:
    // NO base flags → base = end of track 9's data per §8.8.7]
    val moof = mkBox("moof") { o =>
      o.write(mkBox("mfhd") { m => m.writeInt(0); m.writeInt(1) })
      o.write(mkBox("traf") { t =>
        t.write(mkBox("tfhd") { h => h.writeInt(0); h.writeInt(9) })
        t.write(mkBox("trun") { r =>
          r.writeInt(0x1 | 0x200); r.writeInt(2)
          r.writeInt(136) // data_offset → mdat payload (moof is 128 bytes)
          r.writeInt(10); r.writeInt(20)
        })
      })
      o.write(mkBox("traf") { t =>
        t.write(mkBox("tfhd") { h => h.writeInt(0); h.writeInt(2) })
        t.write(mkBox("trun") { r =>
          r.writeInt(0x100 | 0x200 | 0x400); r.writeInt(1)
          r.writeInt(500); r.writeInt(30); r.writeInt(SyncFlags)
        })
      })
    }
    assert(moof.length === 128, "hand-built moof size drifted")
    val mdat = mkBox("mdat")(o => (0 until 60).foreach(i => o.write(i)))
    val tr = Mp4.parseVideoTrack(init ++ moof ++ mdat)
      .getOrElse(fail("multi-traf fMP4 did not parse"))
    assert(tr.samples.length === 1)
    val s = tr.samples.head
    // base = moofStart + 136 (foreign data start) + 10 + 20 (foreign sizes)
    assert(s.offset === Mp4.FMp4DataStart + 136L + 30L)
    assert(s.size === 30L && s.keyframe && s.duration === 500L)
    // the slice lands on mdat bytes 30..59, NOT on moof bytes
    val payload = init ++ moof ++ mdat
    assert((payload(s.offset.toInt) & 0xff) === 30)
  }

  test("multi-traf moof: unknowable foreign extent makes the parse fail, not guess") {
    val init = Mp4.syntheticFmp4(3L).take(Mp4.FMp4DataStart)
    // foreign traf has NO per-sample sizes, NO tfhd default, NO trex for
    // track 9 → its data extent is unknowable → the video traf's implicit
    // base is unresolvable → whole parse must return None (fallback),
    // never a moof-start guess whose slices are silently wrong
    val moof = mkBox("moof") { o =>
      o.write(mkBox("mfhd") { m => m.writeInt(0); m.writeInt(1) })
      o.write(mkBox("traf") { t =>
        t.write(mkBox("tfhd") { h => h.writeInt(0); h.writeInt(9) })
        t.write(mkBox("trun") { r =>
          r.writeInt(0x1); r.writeInt(2); r.writeInt(128)
        })
      })
      o.write(mkBox("traf") { t =>
        t.write(mkBox("tfhd") { h => h.writeInt(0); h.writeInt(2) })
        t.write(mkBox("trun") { r =>
          r.writeInt(0x100 | 0x200 | 0x400); r.writeInt(1)
          r.writeInt(500); r.writeInt(30); r.writeInt(SyncFlags)
        })
      })
    }
    val mdat = mkBox("mdat")(o => (0 until 60).foreach(i => o.write(i)))
    assert(Mp4.parseVideoTrack(init ++ moof ++ mdat) === None)
    // but an explicit default-base-is-moof flag on the video traf rescues
    // it even behind the unknowable foreign traf
    val moof2 = mkBox("moof") { o =>
      o.write(mkBox("mfhd") { m => m.writeInt(0); m.writeInt(1) })
      o.write(mkBox("traf") { t =>
        t.write(mkBox("tfhd") { h => h.writeInt(0); h.writeInt(9) })
        t.write(mkBox("trun") { r =>
          r.writeInt(0x1); r.writeInt(2); r.writeInt(128)
        })
      })
      o.write(mkBox("traf") { t =>
        t.write(mkBox("tfhd") { h => h.writeInt(0x020000); h.writeInt(2) })
        t.write(mkBox("trun") { r =>
          r.writeInt(0x1 | 0x100 | 0x200 | 0x400); r.writeInt(1)
          r.writeInt(150) // data_offset from moof start, into mdat
          r.writeInt(500); r.writeInt(30); r.writeInt(SyncFlags)
        })
      })
    }
    val tr2 = Mp4.parseVideoTrack(init ++ moof2 ++ mdat)
      .getOrElse(fail("default-base-is-moof traf did not parse"))
    assert(tr2.samples.length === 1)
    assert(tr2.samples.head.offset === Mp4.FMp4DataStart + 150L)
  }

  test("demuxFrames drops undemuxable ISO-BMFF instead of byte-windowing it") {
    import org.apache.spark.sql.types._
    val initOnly = Mp4.syntheticFmp4(3L).take(Mp4.FMp4DataStart)
    val garbage = Array.tabulate(4096)(i => (i * 7 % 251).toByte)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val rows = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, initOnly),
        org.apache.spark.sql.Row(2L, garbage),
        org.apache.spark.sql.Row(3L, Mp4.syntheticFmp4(9L))),
      schema)
    val out = Multimodal.demuxFrames(rows, "doc_id", "payload").collect()
    // the sniffed-but-undemuxable MP4 contributes NOTHING
    assert(!out.exists(_.getLong(0) == 1L))
    // garbage still byte-windows (width/height -1)
    assert(out.exists(r => r.getLong(0) == 2L && r.getInt(2) == -1))
    // the real fMP4 demuxes through the box walk with real dims
    val fragRows = out.filter(_.getLong(0) == 3L)
    assert(fragRows.nonEmpty && fragRows.forall(_.getInt(2) == 16))
    assert(fragRows.length === expectedFmp4(9L).length)
  }

  // ---- hand-rolled box assembly for ilst negatives: sizes explicit ----
  private def b32(v: Int): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def mkBox(typ: String, body: Array[Byte]): Array[Byte] =
    b32(body.length + 8) ++ typ.getBytes("ISO-8859-1") ++ body
  private def mkTagged(metaPrelude: Array[Byte],
      items: Array[Byte]): Array[Byte] =
    mkBox("ftyp", "M4A \u0000\u0000\u0002\u0000isom".getBytes("ISO-8859-1")) ++
      mkBox("moov", mkBox("udta",
        mkBox("meta", metaPrelude ++ mkBox("ilst", items))))

  test("ilst tags: closed-form sweep over all fixture shapes (IDs 0-39)") {
    (0L until 40L).foreach { id =>
      Mp4.parseIlstTags(Mp4.syntheticTaggedMp4(id)) match {
        case Some(tags) =>
          assert(id % 5 != 2, s"id=$id is tagless but produced tags")
          // binary trkn and (on id%3==0) covr strided; text in list order
          assert(tags === IndexedSeq(
            "©nam" -> s"title_${id * 7 % 1000}",
            "©ART" -> s"artist_${id % 50}",
            "©alb" -> s"album_${id % 20}",
            "©day" -> s"${1970 + id % 55}",
            "©cmt" -> s"cömment_${id % 10}"))
        case None =>
          assert(id % 5 == 2, s"id=$id tags did not parse")
      }
    }
    // the sweep exercises both with-covr and without-covr tagged shapes
    val covr = (0L until 40L).filter(_ % 5 != 2).map(_ % 3 == 0).toSet
    assert(covr === Set(true, false))
  }

  test("ilst contract: bad prelude, short data, bad UTF-8, truncation poison") {
    val textItem = mkBox("©nam",
      mkBox("data", b32(1) ++ b32(0) ++ "x".getBytes("UTF-8")))
    // positive control for the hand-rolled assembly
    assert(Mp4.parseIlstTags(mkTagged(b32(0), textItem)) ===
      Some(IndexedSeq("©nam" -> "x")))
    // nonzero meta version/flags: a layout the walk does not understand
    assert(Mp4.parseIlstTags(mkTagged(b32(0x01000000), textItem)) === None)
    // data atom shorter than its 8-byte type+locale prelude
    val shortData = mkBox("©nam", mkBox("data", b32(1)))
    assert(Mp4.parseIlstTags(mkTagged(b32(0), shortData)) === None)
    // invalid UTF-8 in a type-1 value: strict decode refuses (0xff can
    // never start a UTF-8 sequence)
    val badUtf8 = mkBox("©nam",
      mkBox("data", b32(1) ++ b32(0) ++ Array(0xff.toByte)))
    assert(Mp4.parseIlstTags(mkTagged(b32(0), badUtf8)) === None)
    // a lying item size truncates mid-list: None, never throw
    val ok = Mp4.syntheticTaggedMp4(1L)
    assert(Mp4.parseIlstTags(ok.take(ok.length - 20)) === None)
    // the untagged m13 fixture (no udta at all) is an absence
    assert(Mp4.parseIlstTags(Mp4.syntheticMp4(1L)) === None)
    // only-binary-atoms ilst: no text tag -> absence, not garbage
    val onlyBinary = mkBox("trkn", mkBox("data", b32(0) ++ b32(0) ++ b32(7)))
    assert(Mp4.parseIlstTags(mkTagged(b32(0), onlyBinary)) === None)
    assert(Mp4.parseIlstTags(null) === None)
    assert(Mp4.parseIlstTags(Array.emptyByteArray) === None)
  }
}
