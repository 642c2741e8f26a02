package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * Ogg container page walk (RFC 3533) — the container analog of the
 * ISO-BMFF box walk ([[Mp4]]) and the MPEG-audio frame walk ([[Mp3]])
 * for the Vorbis/Opus/FLAC-in-Ogg audio share of a real media corpus.
 * Resolves every page's byte range, granule position, stream serial,
 * bos/eos flags and completed-packet count from the page headers alone
 * (no codec decode), with the page CRC verified — a corrupted or
 * truncated payload maps to None, never to silently shifted rows.
 *
 * Reference semantics: the reference treats binary media columns as
 * opaque payloads to slice and census (`/root/reference` multimodal
 * suite); the page walk is the Ogg-shaped slicing primitive. Narrow
 * mapPartitions, no shuffle, linear per row — at 100 TB this is the
 * ranged-read index an audio-ingest pipeline builds before decode
 * fan-out.
 */
object Ogg {

  /** One resolved page: byte offset of the page, header length
   * (27 + n_segments), body length (sum of lacing values), granule
   * position, stream serial, bos/eos flags and how many packets END on
   * this page (lacing values < 255 — a trailing 255 continues onto the
   * next page). */
  final case class Page(no: Int, offset: Long, headerBytes: Int,
      bodyBytes: Long, granule: Long, serial: Long, bos: Boolean,
      eos: Boolean, packetsDone: Int)

  // Ogg CRC32: poly 0x04c11db7, no reflection, init 0, no final xor —
  // NOT zlib's crc32 (which is reflected with init/xor 0xffffffff)
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  /** CRC over `[from, until)` with the 4 CRC-field bytes at `crcAt`
   * treated as zero (the spec computes the checksum with the field
   * zeroed, then patches it in). */
  private def pageCrc(b: Array[Byte], from: Int, until: Int,
      crcAt: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      val byte = if (i >= crcAt && i < crcAt + 4) 0 else b(i) & 0xff
      c = (c << 8) ^ CrcTable(((c >>> 24) ^ byte) & 0xff)
      i += 1
    }
    c
  }

  private def u32le(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def u64le(b: Array[Byte], i: Int): Long = {
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | (b(i + k) & 0xffL); k -= 1 }
    v
  }

  /**
   * Walk a payload's Ogg pages. None when the payload does not start
   * with a valid page, any page fails its CRC, a page overruns the
   * payload, a stream's page sequence numbers skip, or bytes trail the
   * last page — corrupt inputs must be distinguishable from clean ones,
   * not silently truncated. Multiplexed streams (distinct serials, e.g.
   * Ogg video with interleaved audio) are walked in file order with
   * per-serial sequence tracking.
   */
  def parsePages(payload: Array[Byte]): Option[IndexedSeq[Page]] = {
    if (payload == null || payload.length < 28) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Page]
    val seqBySerial = scala.collection.mutable.Map.empty[Long, Long]
    var pos = 0
    var no = 0
    while (pos < payload.length) {
      if (pos + 27 > payload.length) return None
      if (payload(pos) != 'O' || payload(pos + 1) != 'g' ||
          payload(pos + 2) != 'g' || payload(pos + 3) != 'S') return None
      if (payload(pos + 4) != 0) return None // stream_structure_version
      val flags = payload(pos + 5) & 0xff
      val granule = u64le(payload, pos + 6)
      val serial = u32le(payload, pos + 14)
      val pageSeq = u32le(payload, pos + 18)
      val nseg = payload(pos + 26) & 0xff
      val headerLen = 27 + nseg
      if (pos + headerLen > payload.length) return None
      var body = 0L
      var done = 0
      var k = 0
      while (k < nseg) {
        val lacing = payload(pos + 27 + k) & 0xff
        body += lacing
        if (lacing < 255) done += 1
        k += 1
      }
      if (pos + headerLen + body > payload.length) return None
      val want = pageCrc(payload, pos, pos + headerLen + body.toInt, pos + 22)
      if (want != u32le(payload, pos + 22).toInt) return None
      val expectSeq = seqBySerial.getOrElse(serial, 0L)
      if (pageSeq != expectSeq) return None // lost page / spliced stream
      seqBySerial(serial) = expectSeq + 1
      out += Page(no, pos.toLong, headerLen, body, granule, serial,
        (flags & 0x02) != 0, (flags & 0x04) != 0, done)
      pos += headerLen + body.toInt
      no += 1
    }
    if (out.isEmpty) None else Some(out.toIndexedSeq)
  }

  /** Output schema of [[oggPages]]. */
  val pageSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("page_no", IntegerType),
    StructField("offset", LongType),
    StructField("header_bytes", IntegerType),
    StructField("body_bytes", LongType),
    StructField("granule", LongType),
    StructField("serial", LongType),
    StructField("bos", IntegerType),
    StructField("eos", IntegerType),
    StructField("n_packets", IntegerType),
    StructField("body", BinaryType)))

  /** One row per Ogg page with its resolved byte range, granule, serial,
   * flags, completed-packet count and the extracted page BODY (sliced by
   * the lacing walk — extraction, not estimation); non-Ogg / corrupt
   * payloads are dropped. Narrow mapPartitions — no shuffle. */
  def oggPages(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val payload = r.getAs[Array[Byte]](pIdx)
        parsePages(payload) match {
          case Some(pages) => pages.iterator.map { p =>
            val bodyStart = (p.offset + p.headerBytes).toInt
            Row(id, p.no, p.offset, p.headerBytes, p.bodyBytes, p.granule,
              p.serial, if (p.bos) 1 else 0, if (p.eos) 1 else 0,
              p.packetsDone,
              java.util.Arrays.copyOfRange(payload, bodyStart,
                bodyStart + p.bodyBytes.toInt))
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(pageSchema))
  }

  // =====================================================================
  // Synthetic fixture: a VALID single-stream Ogg whose page arithmetic is
  // a pure function of the seed, so a SQL oracle can recompute every
  // page's offset/size/granule from first principles. Packet sizes span
  // the 255-lacing boundary (50..279), so pages mix one- and two-segment
  // lacings — a walker that counts segments instead of summing lacing
  // values, or treats 255 as a packet end, produces shifted offsets or
  // wrong packet counts; the CRC is real, so any byte slip fails loudly.
  // =====================================================================

  /** Deterministic shape shared by the writer, the m18 oracle and the
   * spec: pages `2 + id%5`; page p carries `1 + (id+p)%3` packets;
   * packet k of page p has size `50 + ((id*31 + p*17 + k*7) % 230)`
   * (so lacing is [size] below 255, [255, size-255] at or above);
   * granule `(p+1)*(100 + id%50)`; serial `1000 + id%100`; bos on the
   * first page, eos on the last; body byte j of page p is
   * `(id + p*131 + j) & 0xff`. */
  def syntheticShape(id: Long): (Int, Int => Int, (Int, Int) => Int) = {
    val nPages = (2 + id % 5).toInt
    val kOf = (p: Int) => (1 + ((id + p) % 3)).toInt
    val size = (p: Int, k: Int) =>
      (50 + ((id * 31 + p * 17 + k * 7) % 230)).toInt
    (nPages, kOf, size)
  }

  def syntheticOgg(id: Long): Array[Byte] = {
    val (nPages, kOf, size) = syntheticShape(id)
    val serial = 1000L + id % 100
    val bo = new java.io.ByteArrayOutputStream()
    (0 until nPages).foreach { p =>
      val pageStart = bo.size()
      val nk = kOf(p)
      val lacings = (0 until nk).flatMap { k =>
        val s = size(p, k)
        if (s < 255) Seq(s) else Seq(255, s - 255)
      }
      bo.write('O'); bo.write('g'); bo.write('g'); bo.write('S')
      bo.write(0) // version
      bo.write((if (p == 0) 0x02 else 0) | (if (p == nPages - 1) 0x04 else 0))
      val granule = (p + 1L) * (100 + id % 50)
      (0 until 8).foreach(i => bo.write(((granule >> (8 * i)) & 0xff).toInt))
      (0 until 4).foreach(i => bo.write(((serial >> (8 * i)) & 0xff).toInt))
      (0 until 4).foreach(i => bo.write(((p.toLong >> (8 * i)) & 0xff).toInt))
      (0 until 4).foreach(_ => bo.write(0)) // CRC placeholder
      bo.write(lacings.length)
      lacings.foreach(bo.write)
      val body = (0 until nk).map(size(p, _)).sum
      (0 until body).foreach(j => bo.write(((id + p * 131L + j) & 0xff).toInt))
      // patch the real CRC (computed with the field zeroed)
      val bytes = bo.toByteArray
      val c = pageCrc(bytes, pageStart, bytes.length, pageStart + 22)
      (0 until 4).foreach(i =>
        bytes(pageStart + 22 + i) = ((c >> (8 * i)) & 0xff).toByte)
      bo.reset(); bo.write(bytes, 0, bytes.length)
    }
    bo.toByteArray
  }

  /** Executor-side synthetic-Ogg fixtures — the m18 oracle recomputes the
   * full page arithmetic in SQL. */
  def syntheticOggs(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map(r => Row(r.getLong(idIdx), syntheticOgg(r.getLong(idIdx))))
    }(Encoders.row(schema))
  }
}
