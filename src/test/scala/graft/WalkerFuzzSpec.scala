package graft

import graft.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executor-safety fuzz: every binary/text walker must return (Some|None)
 * and NEVER throw, on (a) random bytes and (b) valid fixtures with
 * random byte flips / truncations / extensions. A walker that throws
 * inside mapPartitions fails tasks and (after retries) whole jobs — the
 * strict-posture contract is "None on corruption", never an exception.
 * Seeded RNG — deterministic. */
class WalkerFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260816L)

  private def mutate(b: Array[Byte]): Array[Byte] = rnd.nextInt(4) match {
    case 0 => // flip 1-4 bytes
      val m = b.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        if (m.nonEmpty) {
          val i = rnd.nextInt(m.length)
          m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
        }
      }
      m
    case 1 => b.take(rnd.nextInt(b.length + 1)) // truncate
    case 2 => b ++ Array.fill(1 + rnd.nextInt(16))(rnd.nextInt(256).toByte)
    case _ => // splice a random window out
      if (b.length < 2) b
      else {
        val i = rnd.nextInt(b.length - 1)
        val j = i + 1 + rnd.nextInt(b.length - i - 1)
        b.take(i) ++ b.drop(j)
      }
  }

  private val binaryWalkers: Seq[(String, Array[Byte] => Any)] = Seq(
    ("zip", Zip.parseCentralDirectory _),
    ("zstd", Zstd.parseFrames _),
    ("gzip", Gzip.parseMembers _),
    ("avro", Avro.parseOcf _),
    ("mkv", Ebml.parseMkv _),
    ("pngText", Png.parseTextChunks _),
    ("riff", Riff.parseInfoTags _),
    ("flacInfo", Flac.parseStreamInfo _),
    ("flacComments", Flac.parseComments _),
    ("oggPages", (b: Array[Byte]) => Ogg.parsePages(b)),
    ("imageMeta", Imaging.parseImageMeta _),
    ("exif", Imaging.parseExif _),
    ("parquet", ParquetFooter.parseFooter _),
    ("orc", Orc.parseTail _),
    ("targz", (b: Array[Byte]) =>
      Tar.inflateTarGz(b).flatMap(Tar.parseTarEntries)),
    ("tar", Tar.parseTarEntries _),
    ("tfrecord", TfRecord.parseRecords _),
    ("tfrecordGz", (b: Array[Byte]) =>
      Gzip.inflateConcat(b).flatMap(TfRecord.parseRecords)),
    ("avroExtract", Avro.extractAllStringRecords _),
    ("avroRecords", (b: Array[Byte]) => AvroRecord.decodeFile(b,
      AvroRecord.parseSchema(AvroRecord.docSchemaJson)
        .get.asInstanceOf[AvroRecord.ARecord])),
    ("parquetPageIndex", ParquetFooter.parsePageIndexes _),
    ("parquetDecode", ParquetFooter.decodeFlatColumns _),
    ("orcDecode", Orc.decodeFlatColumns _),
    ("mkvCues", Ebml.parseMkvCues _),
    ("mkvFrames", Ebml.extractCuedFrames _),
    ("xz", Xz.parseBlocks _),
    ("id3v1", Mp3.parseId3v1 _))

  private def fixtures(id: Long): Seq[Array[Byte]] = Seq(
    Zip.syntheticZip(id), Zstd.syntheticZstd(id), Gzip.syntheticGzip(id),
    Avro.syntheticAvro(id), Ebml.syntheticMkv(id),
    Png.syntheticTextPng(id), Riff.syntheticTaggedWav(id),
    Flac.syntheticCommentedFlac(id), Ogg.syntheticOgg(id),
    Imaging.syntheticExifJpeg(id), Imaging.syntheticImage(id),
    Mp3.syntheticV1TaggedMp3(id), Zip.syntheticRealZip(id),
    Tar.syntheticTarGz(id), TfRecord.syntheticTfRecord(id),
    TfRecord.syntheticTfRecordGz(id), Sitemap.syntheticSitemapGz(id),
    Avro.syntheticRealAvro(id), Xz.syntheticXz(id),
    Ebml.syntheticMkvCues(id), AvroRecord.syntheticRecordAvro(id),
    Ebml.syntheticMkvFrames(id))

  test("binary walkers never throw on random bytes") {
    (0 until 300).foreach { trial =>
      val b = Array.fill(rnd.nextInt(600))(rnd.nextInt(256).toByte)
      binaryWalkers.foreach { case (name, f) =>
        try f(b)
        catch { case e: Throwable =>
          fail(s"$name threw on random bytes (trial=$trial): $e")
        }
      }
    }
  }

  test("binary walkers never throw on mutated fixtures") {
    (0L until 25L).foreach { id =>
      fixtures(id).foreach { fx =>
        (0 until 8).foreach { k =>
          val m = mutate(fx)
          binaryWalkers.foreach { case (name, f) =>
            try f(m)
            catch { case e: Throwable =>
              fail(s"$name threw on mutated fixture (id=$id k=$k): $e")
            }
          }
        }
      }
    }
  }

  test("locator-driven extractors never throw on fuzzed locators") {
    // the random-access extractors take UNTRUSTED (offset, size, ...)
    // tuples — a stale locator table must yield None per row, never an
    // executor throw. Fuzz both the payload and the locator fields.
    (0 until 400).foreach { trial =>
      val base = if (trial % 3 == 0)
        Array.fill(rnd.nextInt(400))(rnd.nextInt(256).toByte)
      else mutate(if (trial % 3 == 1) Zip.syntheticRealZip(trial.toLong)
      else Gzip.syntheticGzip(trial.toLong))
      val off = rnd.nextLong() % 500
      val len = rnd.nextLong() % 500
      try {
        Zip.extractEntryAt(base, off, len, rnd.nextInt(100),
          rnd.nextLong() & 0xffffffffL, rnd.nextLong() % 1000)
        Gzip.inflateMemberAt(base, off, len)
        val sync = Array.fill[Byte](16)(rnd.nextInt(256).toByte)
        Avro.extractBlockAt(base, off, rnd.nextLong() % 100, len,
          Seq("null", "deflate", "snappy", "zstandard", "xz", "bzip2")(
            trial % 6), sync)
        Ebml.replayCueLocator(base, (off % 100).toInt.abs, len)
      } catch { case e: Throwable =>
        fail(s"locator extractor threw (trial=$trial): $e")
      }
    }
  }

  test("crafted near-MaxValue varint lengths cannot wrap the bounds checks") {
    // Avro: metadata key length zigzag-decodes to Long.MaxValue (varint
    // bytes decode to -2). `pos + len` wraps negative, so an additive
    // bounds check passes and String(b, pos, len.toInt) throws; the
    // subtractive check must reject with None.
    val avro = Array[Byte]('O', 'b', 'j', 1,
      2, // map block count 1 (zigzag 1)
      0xfe.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x01) ++
      Array.fill(16)(0.toByte)
    assert(Avro.parseOcf(avro).isEmpty)

    // Avro: block byte-size near MaxValue after a valid header — the
    // `dataEnd + 16` form wrapped the same way.
    val hdr = Avro.syntheticAvro(0L)
    // header of id=0: magic+map(2 entries)+sync, then 1 block; splice a
    // crafted block whose byte-size varint decodes to Long.MaxValue
    val blockStart = {
      // id=0: schema 42B, codec "null": header = 4+1+(1+11+1+42)+(1+10+1+4)+1+16
      4 + 1 + (1 + 11 + 1 + 42) + (1 + 10 + 1 + 4) + 1 + 16
    }
    val crafted = hdr.take(blockStart) ++ Array[Byte](
      2, // row count 1
      0xfe.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x01) ++
      Array.fill(20)(0.toByte)
    assert(Avro.parseOcf(crafted).isEmpty)

    // Parquet: a binary field (created_by, id 6 type 8) whose plain
    // varint length decodes to Long.MaxValue; `pos + n` wraps negative
    // and the cursor would jump backwards without the subtractive check.
    val footer = Array[Byte](0x68) ++ Array.fill(8)(0xff.toByte) ++
      Array[Byte](0x7f)
    val pq = "PAR1".getBytes ++ footer ++
      Array[Byte](footer.length.toByte, 0, 0, 0) ++ "PAR1".getBytes
    assert(ParquetFooter.parseFooter(pq).isEmpty)
  }

  test("text walkers never throw on mutated/garbage text") {
    val texts = (0L until 25L).flatMap { id =>
      Seq(Robots.syntheticRobots(id), Eml.syntheticEml(id),
        Json.syntheticJson(id), Subtitles.syntheticSubtitle(id),
        Mime.syntheticMime(id), Sitemap.syntheticSitemap(id),
        Csv.syntheticCsv(id))
    } ++ Seq("", "\u0000\ufffd\uffff", "a" * 10000, null)
    texts.foreach { t0 =>
      val variants: Seq[String] =
        if (t0 == null) Seq(null)
        else Seq(t0,
          t0.take(rnd.nextInt(t0.length + 1)),
          new String(mutate(t0.getBytes("UTF-8")), "UTF-8"))
      variants.foreach { t =>
        try {
          Robots.parseRobots(t)
          Eml.parseHeaders(t)
          Json.topLevelShape(t)
          Subtitles.parseCues(t)
          Urls.canonicalize(t)
          Mime.parseParts(t)
          Sitemap.parseSitemap(t)
          Csv.sniff(t)
        } catch { case e: Throwable =>
          fail(s"text walker threw: $e on ${Option(t).map(_.take(60))}")
        }
      }
    }
  }
}
