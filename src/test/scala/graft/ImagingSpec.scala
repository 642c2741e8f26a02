package graft

import graft.functions.{Imaging, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** Image header census: the mixed fixture against its closed form per
 * family, EXIF endianness erasure, and the corrupt contract. */
class ImagingSpec extends AnyFunSuite {

  test("mixed fixture decodes to the closed form (IDs 0-139, all families x rotations)") {
    (0L until 140L).foreach { id =>
      val m = Imaging.parseImageMeta(Imaging.syntheticImage(id))
        .getOrElse(fail(s"id=$id did not parse"))
      val w = (16 + (id * 7) % 240).toInt
      val h = (16 + (id * 3) % 240).toInt
      assert(m.width === w, s"id=$id")
      assert(m.height === h, s"id=$id")
      (id % 7) match {
        case 0 =>
          assert(m.format === "jpeg")
          assert(m.orientation === Some((1 + id % 8).toInt), s"id=$id")
          assert(m.bitDepth === Some(8))
        case 1 =>
          assert(m.format === "jpeg")
          assert(m.orientation === None)
        case 2 =>
          assert(m.format === "png")
          assert(m.bitDepth === Some(8))
        case 3 =>
          assert(m.format === "gif")
          assert(m.orientation === None)
        case 4 =>
          assert(m.format === "bmp")
          assert(m.bitDepth === Some(Seq(24, 8, 32)(((id / 7) % 3).toInt)))
        case 5 =>
          assert(m.format === "webp")
          assert(m.bitDepth === None)
        case _ =>
          assert(m.format === "tiff")
          assert(m.bitDepth === Some(8))
          assert(m.orientation ===
            (if ((id / 7) % 2 == 0) Some((1 + id % 8).toInt) else None),
            s"id=$id")
      }
    }
  }

  test("TIFF: BitsPerSample count-3 indirection and both byte orders") {
    val ii = Imaging.syntheticTiff(99, 44, 16, Some(3), le = true, 1L)
    val mm = Imaging.syntheticTiff(99, 44, 16, Some(3), le = false, 1L)
    assert(Imaging.parseImageMeta(ii) === Imaging.parseImageMeta(mm))
    val m = Imaging.parseImageMeta(ii).get
    assert((m.format, m.width, m.height, m.orientation, m.bitDepth) ===
      (("tiff", 99, 44, Some(3), Some(16))))
    // mangled bits-array offset pointing past the payload → corrupt
    val bad = ii.clone()
    // entry 2 (BitsPerSample) value field: header 8 + count 2 + 2*12 + 8
    bad(8 + 2 + 24 + 8) = 0x7f.toByte
    assert(Imaging.parseImageMeta(bad) === None)
  }

  test("EXIF byte order is erased: II and MM fixtures agree") {
    val ii = Imaging.syntheticJpeg(100, 50, Some(6), le = true,
      progressive = false, 1L)
    val mm = Imaging.syntheticJpeg(100, 50, Some(6), le = false,
      progressive = false, 1L)
    assert(Imaging.parseImageMeta(ii) === Imaging.parseImageMeta(mm))
    assert(Imaging.parseImageMeta(ii).get.orientation === Some(6))
  }

  test("BMP top-down (negative height) reports |height|") {
    val td = Imaging.syntheticBmp(64, 32, 24, topDown = true, 1L)
    val bu = Imaging.syntheticBmp(64, 32, 24, topDown = false, 1L)
    assert(Imaging.parseImageMeta(td).get.height === 32)
    assert(Imaging.parseImageMeta(bu).get.height === 32)
  }

  test("WebP variants all decode the same dims") {
    (0 to 2).foreach { v =>
      val m = Imaging.parseImageMeta(Imaging.syntheticWebp(320, 240, v, 7L))
        .getOrElse(fail(s"variant=$v did not parse"))
      assert((m.width, m.height) === ((320, 240)), s"variant=$v")
    }
  }

  test("real-encoder PNG/GIF (ImageIO) parse to their encode dims") {
    val png = Multimodal.syntheticPng(33, 21, 9L)
    val gif = Multimodal.syntheticGif(17, 29, 2, 9L)
    assert(Imaging.parseImageMeta(png).map(m => (m.format, m.width, m.height))
      === Some(("png", 33, 21)))
    assert(Imaging.parseImageMeta(gif).map(m => (m.format, m.width, m.height))
      === Some(("gif", 17, 29)))
  }

  test("sniffMediaType classifies the r13 formats") {
    import graft.functions.{Ebml, Zip, Zstd, Multimodal => M}
    assert(M.sniffMediaType(Imaging.syntheticWebp(8, 8, 0, 1L)) === "webp")
    assert(M.sniffMediaType(Imaging.syntheticTiff(8, 8, 8, None,
      le = true, 1L)) === "tiff")
    assert(M.sniffMediaType(Imaging.syntheticTiff(8, 8, 8, None,
      le = false, 1L)) === "tiff")
    assert(M.sniffMediaType(Ebml.syntheticMkv(1L)) === "matroska")
    assert(M.sniffMediaType(Zip.syntheticZip(1L)) === "zip")
    assert(M.sniffMediaType(Zstd.syntheticZstd(1L)) === "zstd")
    // a skippable-first stream still sniffs zstd
    val sk = Array[Byte](0x53, 0x2a, 0x4d, 0x18, 0, 0, 0, 0)
    assert(M.sniffMediaType(sk) === "zstd")
    // WAV is unchanged by the WEBP branch
    assert(M.sniffMediaType(M.syntheticWav(8000, 1, 8, 1L)) === "wav")
  }

  test("corrupt forms return None, never throw") {
    assert(Imaging.parseImageMeta(null) === None)
    assert(Imaging.parseImageMeta(Array.emptyByteArray) === None)
    assert(Imaging.parseImageMeta("not an image at all, sorry".getBytes) === None)
    val jpg = Imaging.syntheticImage(0L) // jpeg with EXIF
    // truncated before SOF
    assert(Imaging.parseImageMeta(jpg.take(8)) === None)
    // segment length overrunning the payload (mangle SOF length high byte)
    val bad = jpg.clone()
    // find SOF0 marker
    val sof = (0 until bad.length - 1).find(i =>
      (bad(i) & 0xff) == 0xff && (bad(i + 1) & 0xff) == 0xc0).get
    bad(sof + 2) = 0x7f.toByte
    assert(Imaging.parseImageMeta(bad) === None)
    // malformed Exif body (TIFF magic mangled) is corruption, not salvage
    val badExif = jpg.clone()
    val app1 = (0 until badExif.length - 1).find(i =>
      (badExif(i) & 0xff) == 0xff && (badExif(i + 1) & 0xff) == 0xe1).get
    badExif(app1 + 12) = 99 // the 42 magic
    assert(Imaging.parseImageMeta(badExif) === None)
    // out-of-range orientation value: the SHORT lives at entry+8 —
    // APP1 marker(2) len(2) Exif00(6) → TIFF base app1+10, IFD0 at
    // base+8, entry 0 at base+10, value field at base+18 = app1+28
    val badOrient = jpg.clone()
    badOrient(app1 + 28) = 9 // II order: low byte first
    assert(Imaging.parseImageMeta(badOrient) === None)
    // BMP with a non-BITMAPINFOHEADER header size
    val bmp = Imaging.syntheticBmp(8, 8, 24, topDown = false, 1L)
    val badBmp = bmp.clone(); badBmp(14) = 12
    assert(Imaging.parseImageMeta(badBmp) === None)
    // WebP VP8 missing its sync code
    val webp = Imaging.syntheticWebp(8, 8, 0, 1L)
    val badWebp = webp.clone(); badWebp(23) = 0
    assert(Imaging.parseImageMeta(badWebp) === None)
  }

  test("EXIF deep walk: chain fixture matches its closed form (IDs 0-59)") {
    (0L until 60L).foreach { id =>
      val ex = Imaging.parseExif(Imaging.syntheticExifJpeg(id))
      if (id % 11 == 6) assert(ex.isEmpty, s"id=$id has no APP1")
      else {
        val m = ex.getOrElse(fail(s"id=$id did not parse"))
        assert(m.orientation === Some((1 + id % 8).toInt), s"id=$id")
        val dt = f"20${10 + id % 30}%02d:0${1 + id % 9}:${10 + id % 19} " +
          f"0${id % 10}:5${id % 10}:3${id % 6}"
        assert(m.dtOriginal === Some(dt), s"id=$id")
        assert(m.pixelX === Some(640 + id % 1280), s"id=$id")
        assert(m.pixelY === Some(480 + id % 960), s"id=$id")
        assert(m.hasThumbnail === (id % 6 == 1), s"id=$id IFD1 presence")
        if (id % 7 == 4) {
          assert(m.lat.isEmpty && m.lon.isEmpty, s"id=$id GPS-less")
        } else {
          val lat = (if (id % 3 == 0) -1 else 1) *
            ((id % 90) + (id % 60) / 60.0 + (id * 37 % 6000) / 100.0 / 3600.0)
          val lon = (if (id % 5 < 2) -1 else 1) *
            ((id % 180) + (id * 3 % 60) / 60.0 + (id * 53 % 6000) / 100.0 / 3600.0)
          assert(m.lat.exists(v => math.abs(v - lat) < 1e-9), s"id=$id lat")
          assert(m.lon.exists(v => math.abs(v - lon) < 1e-9), s"id=$id lon")
        }
      }
    }
    // a GPS rational with denominator zero is malformation, not Infinity
    // (id=5: GPS present, no IFD1 — the rationals ARE the APP1 tail)
    val good = Imaging.syntheticExifJpeg(5L)
    // lat rationals start right after the GPS IFD; find them by locating
    // the last 48 bytes of the APP1 (lat 24 + lon 24 as laid out)
    val seglen = ((good(4) & 0xff) << 8) | (good(5) & 0xff)
    val app1End = 4 + seglen
    val latDenOff = app1End - 48 + 4 // first rational's denominator (LE)
    val bad = good.clone()
    bad(latDenOff) = 0; bad(latDenOff + 1) = 0
    bad(latDenOff + 2) = 0; bad(latDenOff + 3) = 0
    val m = Imaging.parseExif(bad)
    assert(m.exists(_.lat.isEmpty), "zero denominator must null the field")
  }
}
