package graft

import graft.functions.Png
import org.scalatest.funsuite.AnyFunSuite

/** PNG text-chunk extraction: the fixture against its closed form, a
 * REAL ImageIO-written PNG (no text chunks — clean, zero rows), and the
 * corrupt contract (CRC, structure order, inflate, strict UTF-8). */
class PngSpec extends AnyFunSuite {

  test("fixture decodes to the closed text form (IDs 0-59)") {
    (0L until 60L).foreach { id =>
      val cs = Png.parseTextChunks(Png.syntheticTextPng(id))
        .getOrElse(fail(s"id=$id did not parse"))
      if (id % 5 == 4) assert(cs.isEmpty, s"id=$id is textless")
      else {
        var i = 0
        assert(cs(i).kind === "text")
        assert(cs(i).keyword === "Title")
        assert(cs(i).text === s"title_${id * 7 % 1000}")
        assert(cs(i).lang === None)
        i += 1
        if (id % 4 != 2) {
          assert(cs(i).kind === "ztxt", s"id=$id")
          assert(cs(i).keyword === "Description")
          assert(cs(i).text === s"desc_${id % 100}")
          i += 1
        }
        assert(cs(i).kind === "itxt", s"id=$id")
        assert(cs(i).keyword === "Comment")
        assert(cs(i).lang === Some(if (id % 2 == 0) "en" else "de-DE"))
        assert(cs(i).translated ===
          Some(if (id % 2 == 0) "" else "Kommentar"))
        assert(cs(i).text === s"cömment_${id % 50}")
        assert(cs.size === i + 1, s"id=$id")
      }
    }
  }

  test("a real ImageIO PNG walks clean with zero text chunks") {
    val img = new java.awt.image.BufferedImage(
      13, 7, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 7).foreach(y => (0 until 13).foreach(x =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
    val bo = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bo)
    val cs = Png.parseTextChunks(bo.toByteArray)
    assert(cs === Some(IndexedSeq()), "real encoder output must walk clean")
  }

  test("corrupt contract: CRC, order, truncation, UTF-8, zlib") {
    val good = Png.syntheticTextPng(3L) // odd: de-DE iTXt, compressed (3%3==0)
    assert(Png.parseTextChunks(good).isDefined)
    // flip a byte inside the tEXt data: its CRC must catch it
    val crcBad = good.clone()
    // IHDR is 8+25 bytes; tEXt data starts at 8+25+8; flip its keyword
    crcBad(8 + 25 + 8) = (crcBad(8 + 25 + 8) ^ 0x01).toByte
    assert(Png.parseTextChunks(crcBad).isEmpty, "chunk CRC must be checked")
    // signature byte
    val sigBad = good.clone(); sigBad(0) = 0x88.toByte
    assert(Png.parseTextChunks(sigBad).isEmpty)
    // IHDR not first: prepend a valid sRGB chunk after the signature
    val notFirst = {
      val bo = new java.io.ByteArrayOutputStream()
      bo.write(good, 0, 8)
      val data = Array[Byte](1)
      def w32(v: Long): Unit = {
        bo.write(((v >> 24) & 0xff).toInt); bo.write(((v >> 16) & 0xff).toInt)
        bo.write(((v >> 8) & 0xff).toInt); bo.write((v & 0xff).toInt)
      }
      w32(1L); bo.write("sRGB".getBytes("ISO-8859-1"), 0, 4)
      bo.write(data, 0, 1)
      val crc = new java.util.zip.CRC32
      crc.update("sRGB".getBytes("ISO-8859-1"), 0, 4); crc.update(data, 0, 1)
      w32(crc.getValue)
      bo.write(good, 8, good.length - 8)
      bo.toByteArray
    }
    assert(Png.parseTextChunks(notFirst).isEmpty, "IHDR must be first")
    // truncation: drop IEND
    assert(Png.parseTextChunks(good.dropRight(12)).isEmpty, "IEND required")
    // bytes after IEND
    assert(Png.parseTextChunks(good ++ Array[Byte](0)).isEmpty)
    assert(Png.parseTextChunks(null).isEmpty)
  }

  test("invalid UTF-8 in iTXt and corrupt zlib in zTXt poison") {
    def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      def w32(v: Long): Unit = {
        bo.write(((v >> 24) & 0xff).toInt); bo.write(((v >> 16) & 0xff).toInt)
        bo.write(((v >> 8) & 0xff).toInt); bo.write((v & 0xff).toInt)
      }
      w32(data.length.toLong)
      val tb = ctype.getBytes("ISO-8859-1")
      bo.write(tb, 0, 4); bo.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32
      crc.update(tb, 0, 4); crc.update(data, 0, data.length)
      w32(crc.getValue)
      bo.toByteArray
    }
    val base = Png.syntheticTextPng(4L) // id%5==4: structural chunks only
    // splice before IEND (last 12 bytes): an iTXt with a lone 0xFF byte
    val badUtf = base.dropRight(12) ++
      chunk("iTXt", "K".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0) ++
        Array[Byte](0, 0) ++ Array[Byte](0xff.toByte)) ++
      base.takeRight(12)
    assert(Png.parseTextChunks(badUtf).isEmpty, "strict UTF-8 in iTXt")
    // a zTXt whose stream is not zlib
    val badZ = base.dropRight(12) ++
      chunk("zTXt", "K".getBytes("ISO-8859-1") ++ Array[Byte](0, 0) ++
        Array[Byte](1, 2, 3)) ++
      base.takeRight(12)
    assert(Png.parseTextChunks(badZ).isEmpty, "zTXt zlib must inflate")
    // sanity: the same splice with a VALID tEXt parses
    val okT = base.dropRight(12) ++
      chunk("tEXt", "K".getBytes("ISO-8859-1") ++ Array[Byte](0) ++
        "v".getBytes("ISO-8859-1")) ++
      base.takeRight(12)
    val cs = Png.parseTextChunks(okT).getOrElse(fail("splice"))
    assert(cs === IndexedSeq(Png.TextChunk("text", "K", None, None, "v")))
  }
}
