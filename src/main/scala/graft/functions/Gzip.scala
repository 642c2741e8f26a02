package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * Gzip MEMBER walk (RFC 1952): per-member header fields (FLG, MTIME,
 * OS, FNAME, FCOMMENT) plus compressed/uncompressed sizes, with CRC32
 * and ISIZE verified against the inflated bytes. Multi-member files are
 * first-class because the dominant crawl format IS one: a `.warc.gz` is
 * one gzip member per WARC record (the `warc` census in [[Multimodal]]
 * reads the uncompressed form; this walk is what locates records in the
 * compressed form a crawler actually ships).
 *
 * Unlike every other walker in the family this one must INFLATE: deflate
 * carries no length field, so a member's end — and therefore the next
 * member's offset — is only discoverable by walking the stream
 * (RFC 1951 blocks are bit-packed with no byte-aligned skip). The
 * inflate is streaming through a fixed 16 KiB buffer (the JDK
 * Inflater keeps its own 32 KiB window), output is counted + CRC'd and
 * discarded — O(1) memory per row regardless of member size, so the
 * scale posture still holds: narrow mapPartitions, zero exchanges,
 * bounded heap.
 *
 * Strict-structure posture like the rest of the family: bad magic, a
 * compression method other than deflate, reserved FLG bits, a header
 * field overrunning the payload, a corrupt deflate stream, a trailer
 * CRC32/ISIZE mismatch, an FHCRC mismatch, or trailing garbage after
 * the last member → None for the whole payload.
 */
object Gzip {

  /** One gzip member. */
  final case class Member(offset: Long, compBytes: Long, uncompBytes: Long,
      fname: Option[String], comment: Option[String], mtime: Long, os: Int,
      ftext: Boolean)

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Zero-terminated ISO-8859-1 field (RFC 1952 specifies latin-1 for
   * FNAME/FCOMMENT). Returns (value, next position) or null when the
   * terminator is missing before end-of-payload. */
  private def zstr(b: Array[Byte], pos: Int): (String, Int) = {
    var e = pos
    while (e < b.length && b(e) != 0) e += 1
    if (e >= b.length) null
    else (new String(b, pos, e - pos, "ISO-8859-1"), e + 1)
  }

  /**
   * Walk every member. None on any structural violation as documented
   * on the object. The FHCRC field, when present, is verified (it is
   * the low 16 bits of the CRC32 of all header bytes before it —
   * RFC 1952 §2.3.1).
   */
  def parseMembers(payload: Array[Byte]): Option[IndexedSeq[Member]] =
    walkMembers(payload, keep = false).map(_._1)

  /**
   * Random-access extraction of ONE member located at `offset` with
   * compressed size `length` — exactly the values [[gzipMembers]]
   * reports. Inflates only the slice `[offset, offset+length)`,
   * verifies CRC32/ISIZE, and requires the member to END exactly at
   * `offset + length` (a slip means the locator row was stale). This is
   * the Common Crawl access pattern: fetch one (offset, size) range
   * from object storage and inflate one record, never the file.
   */
  def inflateMemberAt(payload: Array[Byte], offset: Long,
      length: Long): Option[Array[Byte]] = {
    if (payload == null || offset < 0 || length < 18 ||
      offset > (payload.length - length)) return None
    val slice = java.util.Arrays.copyOfRange(
      payload, offset.toInt, (offset + length).toInt)
    walkMembers(slice, keep = true) match {
      case Some((ms, bodies)) if ms.size == 1 => Some(bodies.head)
      case _ => None // zero or >1 members in the range: stale locator
    }
  }

  /** Inflate ALL members and concatenate their bodies — RFC 1952
   * member concatenation is ONE logical stream, the shape of every
   * `.gz` shard composition (`.tar.gz`, `.tfrecord.gz`,
   * `sitemap.xml.gz`, `.warc.gz`). Each member is re-extracted through
   * the verified [[inflateMemberAt]] locator path, so the census
   * locators and the decode path can never drift apart. None if any
   * member refuses or the total exceeds Int.MaxValue. */
  def inflateConcat(payload: Array[Byte]): Option[Array[Byte]] = {
    parseMembers(payload).flatMap { ms =>
      val bodies = new Array[Array[Byte]](ms.size)
      var total = 0L
      var i = 0
      while (i < ms.size) {
        inflateMemberAt(payload, ms(i).offset, ms(i).compBytes) match {
          case Some(body) =>
            bodies(i) = body
            total += body.length
            if (total > Int.MaxValue) return None
          case None => return None
        }
        i += 1
      }
      val out = new Array[Byte](total.toInt)
      var w = 0
      bodies.foreach { body =>
        System.arraycopy(body, 0, out, w, body.length)
        w += body.length
      }
      Some(out)
    }
  }

  private def walkMembers(payload: Array[Byte],
      keep: Boolean): Option[(IndexedSeq[Member], IndexedSeq[Array[Byte]])] = {
    val b = payload
    if (b == null || b.length < 18) return None // header 10 + trailer 8
    val out = scala.collection.mutable.ArrayBuffer.empty[Member]
    val bodies = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    while (pos < b.length) {
      val start = pos
      if (pos + 10 > b.length) return None
      if ((b(pos) & 0xff) != 0x1f || (b(pos + 1) & 0xff) != 0x8b) return None
      if ((b(pos + 2) & 0xff) != 8) return None // deflate only
      val flg = b(pos + 3) & 0xff
      if ((flg & 0xe0) != 0) return None // reserved bits
      val mtime = u32le(b, pos + 4)
      val os = b(pos + 9) & 0xff
      var p = pos + 10
      if ((flg & 0x04) != 0) { // FEXTRA
        if (p + 2 > b.length) return None
        val xlen = u16le(b, p)
        if (p + 2 + xlen > b.length) return None
        p += 2 + xlen
      }
      var fname: Option[String] = None
      if ((flg & 0x08) != 0) { // FNAME
        val r = zstr(b, p)
        if (r == null) return None
        fname = Some(r._1); p = r._2
      }
      var comment: Option[String] = None
      if ((flg & 0x10) != 0) { // FCOMMENT
        val r = zstr(b, p)
        if (r == null) return None
        comment = Some(r._1); p = r._2
      }
      if ((flg & 0x02) != 0) { // FHCRC: CRC16 of the header bytes so far
        if (p + 2 > b.length) return None
        val hc = new java.util.zip.CRC32
        hc.update(b, start, p - start)
        if ((hc.getValue & 0xffffL).toInt != u16le(b, p)) return None
        p += 2
      }
      // inflate: count + CRC the output (kept only in random-access
      // mode — the census walk stays O(1) memory); find the stream end
      val inf = new java.util.zip.Inflater(true) // raw deflate
      try {
        inf.setInput(b, p, b.length - p)
        val crc = new java.util.zip.CRC32
        val buf = new Array[Byte](16384)
        val kept = if (keep) new java.io.ByteArrayOutputStream() else null
        var total = 0L
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException => return None }
          if (n > 0) {
            crc.update(buf, 0, n); total += n
            if (keep) kept.write(buf, 0, n)
          }
          // no progress and not finished: truncated stream (needs more
          // input than the payload has) or a preset-dictionary demand —
          // both corruption for a gzip member
          else if (!inf.finished()) return None
        }
        val consumed = (b.length - p) - inf.getRemaining
        val trailer = p + consumed
        if (trailer + 8 > b.length) return None
        if (u32le(b, trailer) != crc.getValue) return None
        if (u32le(b, trailer + 4) != (total & 0xffffffffL)) return None
        pos = trailer + 8
        out += Member(start.toLong, (pos - start).toLong, total,
          fname, comment, mtime, os, ftext = (flg & 0x01) != 0)
        if (keep) bodies += kept.toByteArray
      } finally inf.end()
    }
    Some((out.toIndexedSeq, bodies.toIndexedSeq))
  }

  /** Output schema of [[gzipMembers]]. */
  val memberSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("member_no", IntegerType),
    StructField("offset", LongType),
    StructField("comp_bytes", LongType),
    StructField("uncomp_bytes", LongType),
    StructField("fname", StringType),
    StructField("comment", StringType),
    StructField("mtime", LongType),
    StructField("os", IntegerType),
    StructField("ftext", IntegerType)))

  /** One row per member (file order); payloads that are not clean
   * (possibly multi-member) gzip contribute nothing. Narrow
   * mapPartitions — streaming inflate, O(1) memory per row. */
  def gzipMembers(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseMembers(r.getAs[Array[Byte]](pIdx)) match {
          case Some(ms) => ms.iterator.zipWithIndex.map { case (m, i) =>
            Row(id, i, m.offset, m.compBytes, m.uncompBytes,
              m.fname.orNull, m.comment.orNull, m.mtime, m.os,
              if (m.ftext) 1 else 0)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(memberSchema))
  }

  /** Deterministic multi-member gzip fixture shared by the writer, the
   * m34 oracle and the spec. The deflate streams use STORED blocks
   * (RFC 1951 BTYPE=00: 1 mode byte + LEN/NLEN + raw bytes) so every
   * size is closed-form in (id, m) — a `Deflater`-compressed fixture
   * would make comp_bytes depend on zlib's encoder version. Per member
   * m of `1 + id%3`:
   *
   *   - content byte j is `(id*7 + m*13 + j) & 0xff`, length
   *     `30 + (id*3 + m*11) % 70`, split into stored blocks of ≤ 40
   *     bytes → `comp(deflate) = ceil(len/40)*5 + len`;
   *   - FNAME `f<id%10>_<m>.txt` (8 bytes + NUL) when `(id+m)%2 == 0`;
   *     FCOMMENT `gc<id%10>` (4 bytes + NUL) when `(id+m)%5 == 1`;
   *     FEXTRA of `4 + (id+m)%10` opaque bytes when `(id+m)%3 == 0`;
   *     FHCRC (real header CRC16) when `(id+m)%4 == 2`; FTEXT when
   *     `(id+m)%7 == 3`;
   *   - MTIME `(id*1000 + m) & 0xffffffff`, OS `(id+m)%14`, XFL 0;
   *   - trailer CRC32/ISIZE computed from the real content.
   */
  def syntheticGzip(id: Long): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def u16w(v: Int): Unit = { bo.write(v & 0xff); bo.write((v >> 8) & 0xff) }
    def u32w(v: Long): Unit = {
      bo.write((v & 0xff).toInt); bo.write(((v >> 8) & 0xff).toInt)
      bo.write(((v >> 16) & 0xff).toInt); bo.write(((v >> 24) & 0xff).toInt)
    }
    val n = (1 + id % 3).toInt
    (0 until n).foreach { m =>
      val start = bo.size()
      val len = (30 + (id * 3 + m * 11) % 70).toInt
      val content = Array.tabulate(len)(j => ((id * 7 + m * 13 + j) & 0xff).toByte)
      val hasName = (id + m) % 2 == 0
      val hasComment = (id + m) % 5 == 1
      val hasExtra = (id + m) % 3 == 0
      val hasHcrc = (id + m) % 4 == 2
      val ftext = (id + m) % 7 == 3
      val flg = (if (ftext) 0x01 else 0) | (if (hasHcrc) 0x02 else 0) |
        (if (hasExtra) 0x04 else 0) | (if (hasName) 0x08 else 0) |
        (if (hasComment) 0x10 else 0)
      bo.write(0x1f); bo.write(0x8b); bo.write(8); bo.write(flg)
      u32w((id * 1000 + m) & 0xffffffffL)
      bo.write(0) // XFL
      bo.write(((id + m) % 14).toInt) // OS
      if (hasExtra) {
        val xlen = (4 + (id + m) % 10).toInt
        u16w(xlen)
        (0 until xlen).foreach(j => bo.write(((id + m * 3 + j) & 0xff).toInt))
      }
      if (hasName) {
        bo.write(s"f${id % 10}_$m.txt".getBytes("ISO-8859-1")); bo.write(0)
      }
      if (hasComment) {
        bo.write(s"gc${id % 10}".getBytes("ISO-8859-1")); bo.write(0)
      }
      if (hasHcrc) {
        val snapshot = bo.toByteArray
        val hc = new java.util.zip.CRC32
        hc.update(snapshot, start, snapshot.length - start)
        u16w((hc.getValue & 0xffffL).toInt)
      }
      // stored deflate blocks of <= 40 bytes
      var off = 0
      while (off < len) {
        val c = math.min(40, len - off)
        val last = off + c == len
        bo.write(if (last) 1 else 0) // BFINAL + BTYPE=00
        u16w(c); u16w(c ^ 0xffff)
        bo.write(content, off, c)
        off += c
      }
      val crc = new java.util.zip.CRC32
      crc.update(content, 0, len)
      u32w(crc.getValue)
      u32w(len.toLong)
    }
    bo.toByteArray
  }

  /** Executor-side gzip fixtures — the m34 oracle replays the member
   * formulas (stored-block deflate keeps every size closed-form). */
  def syntheticGzips(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticGzip)
}
