package graft

import graft.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-family consistency: for every synthetic payload family, the
 * magic-byte census must identify the format AND the format's own
 * walker must accept the payload — the two views of "what is in this
 * bucket" can never disagree on clean data. A census that says `zip`
 * for a payload the ZIP walker rejects (or vice versa) would make the
 * decode fan-out scheduled from census output silently lossy. */
class CensusAgreementSpec extends AnyFunSuite {

  private def sniff(b: Array[Byte]): String = Multimodal.sniffMediaType(b)

  test("every fixture family sniffs as itself and parses (IDs 0-39)") {
    (0L until 40L).foreach { id =>
      assert(sniff(Zip.syntheticZip(id)) === "zip", s"id=$id")
      assert(Zip.parseCentralDirectory(Zip.syntheticZip(id)).isDefined)

      assert(sniff(Zstd.syntheticZstd(id)) === "zstd", s"id=$id")
      assert(Zstd.parseFrames(Zstd.syntheticZstd(id)).isDefined)

      assert(sniff(Gzip.syntheticGzip(id)) === "gzip", s"id=$id")
      assert(Gzip.parseMembers(Gzip.syntheticGzip(id)).isDefined)

      assert(sniff(Avro.syntheticAvro(id)) === "avro", s"id=$id")
      assert(Avro.parseOcf(Avro.syntheticAvro(id)).isDefined)

      assert(sniff(Ebml.syntheticMkv(id)) === "matroska", s"id=$id")
      assert(Ebml.parseMkv(Ebml.syntheticMkv(id)).isDefined)

      assert(sniff(Png.syntheticTextPng(id)) === "png", s"id=$id")
      assert(Png.parseTextChunks(Png.syntheticTextPng(id)).isDefined)

      assert(sniff(Riff.syntheticTaggedWav(id)) === "wav", s"id=$id")
      assert(Riff.parseInfoTags(Riff.syntheticTaggedWav(id)).isDefined)

      assert(sniff(Flac.syntheticCommentedFlac(id)) === "flac", s"id=$id")

      assert(sniff(Ogg.syntheticOgg(id)) === "ogg", s"id=$id")
      assert(Ogg.parsePages(Ogg.syntheticOgg(id)).isDefined)

      assert(sniff(Mp3.syntheticMp3(id)) === "mp3", s"id=$id")
      assert(sniff(Mp4.syntheticMp4(id)) === "mp4", s"id=$id")

      assert(sniff(Imaging.syntheticWebp(24, 16, (id % 3).toInt, id))
        === "webp", s"id=$id")
      assert(sniff(Imaging.syntheticTiff(24, 16, 8, None,
        le = id % 2 == 0, id)) === "tiff", s"id=$id")

      // EXIF JPEGs: jpeg to the census; the deep walk accepts exactly
      // the ids that carry an APP1 chain
      val ej = Imaging.syntheticExifJpeg(id)
      assert(sniff(ej) === "jpeg", s"id=$id")
      assert(Imaging.parseExif(ej).isDefined === (id % 11 != 6), s"id=$id")
      // and the header census must also read the SAME payload cleanly
      assert(Imaging.parseImageMeta(ej).isDefined, s"id=$id")
    }
  }

  test("walkers refuse each other's formats (no cross-sniff acceptance)") {
    val zip = Zip.syntheticZip(3L)
    val mkv = Ebml.syntheticMkv(3L)
    val avro = Avro.syntheticAvro(3L)
    assert(Zstd.parseFrames(zip).isEmpty)
    assert(Gzip.parseMembers(mkv).isEmpty)
    assert(Avro.parseOcf(zip).isEmpty)
    assert(Ebml.parseMkv(avro).isEmpty)
    assert(Png.parseTextChunks(zip).isEmpty)
    assert(Zip.parseCentralDirectory(avro).isEmpty)
    assert(ParquetFooter.parseFooter(zip).isEmpty)
  }
}
