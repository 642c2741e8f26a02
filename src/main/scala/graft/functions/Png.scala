package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * PNG chunk walk + textual-metadata extraction — `tEXt` (latin-1),
 * `zTXt` (deflate-compressed latin-1) and `iTXt` (UTF-8, optionally
 * compressed, with language/translated-keyword fields) — the PNG member
 * of the tag family ([[Mp3]] ID3, [[Ogg]]/[[Flac]] VorbisComment,
 * [[Mp4]] ilst, [[Riff]] INFO): where image provenance strings
 * (Title/Author/Software/XML:com.adobe.xmp) live in a crawled image
 * lake. [[Imaging.parseImageMeta]] reads the IHDR dims; this reads the
 * rest of the chunk stream.
 *
 * Structure facts honored (PNG spec, W3C 2nd ed.):
 *   - 8-byte signature, then chunks of (u32be length, 4cc type, data,
 *     u32be CRC-32 over type+data — VERIFIED here, the format's own
 *     integrity seal);
 *   - IHDR must be first, IEND last and empty, closing the payload
 *     exactly;
 *   - keywords are latin-1, 1–79 bytes, no leading/trailing/consecutive
 *     spaces enforced structurally (1–79 and NUL-present checked; the
 *     space rules are writer etiquette, not parseable corruption);
 *   - `zTXt`: keyword NUL, compression method byte (0 = deflate), then
 *     a ZLIB stream (RFC 1950 — 2-byte header + deflate + adler32);
 *   - `iTXt`: keyword NUL, compression flag (0/1), compression method
 *     (0), language tag NUL, translated keyword NUL (both may be
 *     empty), then text — UTF-8, zlib-deflated when the flag is 1.
 *
 * Strict posture: bad signature, chunk overrun, CRC mismatch, IHDR not
 * first / IEND not closing, malformed text-chunk structure, inflate
 * failure, invalid UTF-8 in iTXt (strict decode, the never-garbage
 * contract) → None for the whole payload. Non-text chunks (IDAT, PLTE,
 * sRGB, …) are strided by length with their CRC still checked.
 *
 * Narrow mapPartitions — the only non-O(header) work is inflating the
 * (small) compressed text chunks themselves.
 */
object Png {

  /** One textual chunk. `lang`/`translated` only for iTXt. */
  final case class TextChunk(kind: String, keyword: String,
      lang: Option[String], translated: Option[String], text: String)

  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private val Signature =
    Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Inflate a ZLIB (RFC 1950) stream; None on any corruption or if the
   * output exceeds `cap` (text chunks are metadata — a multi-MB
   * expansion is a zip-bomb, not a title). */
  private def inflateZlib(b: Array[Byte], off: Int, len: Int,
      cap: Int = 1 << 20): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater() // zlib-wrapped
    try {
      inf.setInput(b, off, len)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => return None }
        if (n > 0) {
          out.write(buf, 0, n)
          if (out.size() > cap) return None
        } else if (!inf.finished()) return None // truncated / needs dict
      }
      if (inf.getRemaining != 0) return None // junk after the stream
      Some(out.toByteArray)
    } finally inf.end()
  }

  /** Find the NUL in [from, to); -1 when absent. */
  private def nulAt(b: Array[Byte], from: Int, to: Int): Int = {
    var i = from
    while (i < to && b(i) != 0) i += 1
    if (i < to) i else -1
  }

  /** Latin-1 keyword in [from, to): 1–79 bytes before a NUL. Returns
   * (keyword, position after NUL) or null. */
  private def keywordAt(b: Array[Byte], from: Int, to: Int): (String, Int) = {
    val nul = nulAt(b, from, to)
    if (nul < 0 || nul == from || nul - from > 79) null
    else (new String(b, from, nul - from, "ISO-8859-1"), nul + 1)
  }

  /**
   * Walk every chunk (verifying each CRC) and decode the text chunks,
   * in file order. None on any structural violation as documented on
   * the object; a clean PNG with no text chunks is Some(empty).
   */
  def parseTextChunks(payload: Array[Byte]): Option[IndexedSeq[TextChunk]] = {
    val b = payload
    if (b == null || b.length < 8 + 12 + 12) return None // sig + IHDR + IEND
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != Signature(i)) return None; i += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[TextChunk]
    var pos = 8
    var first = true
    var ended = false
    while (pos < b.length) {
      if (ended) return None // bytes after IEND
      if (pos + 8 > b.length) return None
      val len = u32be(b, pos)
      val ctype = new String(b, pos + 4, 4, "ISO-8859-1")
      val body = pos + 8
      if (body + len + 4 > b.length) return None
      val crc = new java.util.zip.CRC32
      crc.update(b, pos + 4, 4 + len.toInt)
      if (crc.getValue != u32be(b, body + len.toInt)) return None
      if (first && ctype != "IHDR") return None
      first = false
      val end = body + len.toInt
      ctype match {
        case "IEND" =>
          if (len != 0L) return None
          ended = true
        case "tEXt" =>
          val k = keywordAt(b, body, end)
          if (k == null) return None
          out += TextChunk("text", k._1, None, None,
            new String(b, k._2, end - k._2, "ISO-8859-1"))
        case "zTXt" =>
          val k = keywordAt(b, body, end)
          if (k == null || k._2 >= end || b(k._2) != 0) return None // method 0
          inflateZlib(b, k._2 + 1, end - k._2 - 1) match {
            case Some(t) => out += TextChunk("ztxt", k._1, None, None,
              new String(t, "ISO-8859-1"))
            case None => return None
          }
        case "iTXt" =>
          val k = keywordAt(b, body, end)
          if (k == null || k._2 + 2 > end) return None
          val compFlag = b(k._2) & 0xff
          val compMethod = b(k._2 + 1) & 0xff
          if (compFlag > 1 || compMethod != 0) return None
          val langNul = nulAt(b, k._2 + 2, end)
          if (langNul < 0) return None
          val lang = new String(b, k._2 + 2, langNul - k._2 - 2, "US-ASCII")
          val trNul = nulAt(b, langNul + 1, end)
          if (trNul < 0) return None
          // translated keyword is itself UTF-8 — strict decode
          val tr = Ogg.utf8Strict(b, langNul + 1, trNul - langNul - 1)
          if (tr.isEmpty) return None
          val raw: Option[Array[Byte]] =
            if (compFlag == 0)
              Some(java.util.Arrays.copyOfRange(b, trNul + 1, end))
            else inflateZlib(b, trNul + 1, end - trNul - 1)
          raw.flatMap(t => Ogg.utf8Strict(t, 0, t.length)) match {
            case Some(t) =>
              out += TextChunk("itxt", k._1, Some(lang), tr, t)
            case None => return None
          }
        case _ => () // IDAT/PLTE/sRGB/…: strided, CRC already checked
      }
      pos = end + 4
    }
    if (!ended) return None // no IEND
    Some(out.toIndexedSeq)
  }

  /** Output schema of [[pngTextChunks]]. */
  val textSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("chunk_no", IntegerType),
    StructField("kind", StringType),
    StructField("keyword", StringType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  /** One row per textual chunk (file order); payloads that are not
   * clean PNGs — or clean but textless — contribute nothing / zero
   * rows. Narrow mapPartitions. */
  def pngTextChunks(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseTextChunks(r.getAs[Array[Byte]](pIdx)) match {
          case Some(cs) => cs.iterator.zipWithIndex.map { case (c, i) =>
            Row(id, i, c.kind, c.keyword, c.lang.orNull, c.text)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(textSchema))
  }

  /** Deterministic text-chunked PNG fixture shared by the writer, the
   * m36 oracle and the spec: signature, IHDR (dims `8 + id%64` ×
   * `8 + (id*3)%64`, bit depth 8, truecolor), then in order —
   *
   *   - `tEXt` Title=`title_<id*7 % 1000>`;
   *   - a `sRGB` chunk (1 opaque byte) to stride;
   *   - `zTXt` Description=`desc_<id % 100>` (REAL `Deflater` zlib
   *     stream — the decoded text is what the oracle replays, so the
   *     encoder's byte choices don't matter) when `id%4 != 2`;
   *   - `iTXt` Comment, language `en`/`de-DE` by id parity, translated
   *     keyword `Kommentar` when odd, text `cömment_<id % 50>`
   *     (multi-byte UTF-8), zlib-compressed when `id%3 == 0`;
   *   - an `IDAT` of `20 + id%40` opaque bytes (never pixel-decoded);
   *   - `IEND`.
   *
   * ids with `id%5 == 4` carry ONLY the structural chunks (textless
   * clean file — zero rows, absence not corruption). Every chunk CRC is
   * real (java.util.zip.CRC32 — PNG's own polynomial). */
  def syntheticTextPng(id: Long): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    Signature.foreach(bo.write)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      def w32(v: Long): Unit = {
        bo.write(((v >> 24) & 0xff).toInt); bo.write(((v >> 16) & 0xff).toInt)
        bo.write(((v >> 8) & 0xff).toInt); bo.write((v & 0xff).toInt)
      }
      w32(data.length.toLong)
      val tb = ctype.getBytes("ISO-8859-1")
      bo.write(tb, 0, 4)
      bo.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32
      crc.update(tb, 0, 4)
      crc.update(data, 0, data.length)
      w32(crc.getValue)
    }
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    val w = (8 + id % 64).toInt
    val h = (8 + (id * 3) % 64).toInt
    val ihdr = new java.io.ByteArrayOutputStream()
    def i32(v: Int): Unit = {
      ihdr.write((v >> 24) & 0xff); ihdr.write((v >> 16) & 0xff)
      ihdr.write((v >> 8) & 0xff); ihdr.write(v & 0xff)
    }
    i32(w); i32(h)
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    if (id % 5 != 4) {
      chunk("tEXt",
        ("Title\u0000" + s"title_${id * 7 % 1000}").getBytes("ISO-8859-1"))
      chunk("sRGB", Array[Byte]((id % 4).toByte))
      if (id % 4 != 2) {
        val z = deflate(s"desc_${id % 100}".getBytes("ISO-8859-1"))
        val zb = new java.io.ByteArrayOutputStream()
        zb.write("Description".getBytes("ISO-8859-1"), 0, 11)
        zb.write(0); zb.write(0) // NUL, method 0
        zb.write(z, 0, z.length)
        chunk("zTXt", zb.toByteArray)
      }
      val lang = if (id % 2 == 0) "en" else "de-DE"
      val tr = if (id % 2 == 0) "" else "Kommentar"
      val text = s"cömment_${id % 50}".getBytes("UTF-8")
      val compressed = id % 3 == 0
      val ib = new java.io.ByteArrayOutputStream()
      ib.write("Comment".getBytes("ISO-8859-1"), 0, 7)
      ib.write(0)
      ib.write(if (compressed) 1 else 0); ib.write(0)
      ib.write(lang.getBytes("US-ASCII"), 0, lang.length); ib.write(0)
      val trb = tr.getBytes("UTF-8")
      ib.write(trb, 0, trb.length); ib.write(0)
      val payload = if (compressed) deflate(text) else text
      ib.write(payload, 0, payload.length)
      chunk("iTXt", ib.toByteArray)
    } else {
      chunk("sRGB", Array[Byte]((id % 4).toByte))
    }
    chunk("IDAT", Array.tabulate((20 + id % 40).toInt)(j =>
      ((id * 5 + j) & 0xff).toByte))
    chunk("IEND", Array.emptyByteArray)
    bo.toByteArray
  }

  /** Executor-side text-PNG fixtures — the m36 oracle replays the
   * keyword/text/lang formulas. */
  def syntheticTextPngs(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticTextPng)
}
