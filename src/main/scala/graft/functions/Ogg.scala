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
   * zeroed, then patches it in). private[graft]: OggSpec re-patches
   * checksums after corrupting flag bytes, so flag-logic tests reach the
   * walker instead of bouncing off the CRC gate. */
  private[graft] def pageCrc(b: Array[Byte], from: Int, until: Int,
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

  /** One validated raw page with its lacing table retained — the shared
   * substrate of the page census and the packet reassembly. */
  private final case class RawPage(no: Int, offset: Long, headerLen: Int,
      flags: Int, granule: Long, serial: Long, lacings: Array[Int])

  /** Validated page walk: magic, version, CRC, bounds and per-serial
   * sequence continuity all checked; None on any violation. RFC 3533
   * chained bitstreams are accepted: after a serial's EOS page the SAME
   * serial may restart as a new link, but only cleanly — a fresh BOS
   * flag and sequence 0 (anything else after EOS, and any mid-stream
   * BOS or sequence skip before it, is lost-page/splice evidence). */
  private def walkPages(payload: Array[Byte]): Option[IndexedSeq[RawPage]] = {
    if (payload == null || payload.length < 28) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[RawPage]
    // per-serial (expected next sequence, eos-seen) continuity state
    val seqBySerial = scala.collection.mutable.Map.empty[Long, (Long, Boolean)]
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
      val lacings = new Array[Int](nseg)
      var body = 0L
      var k = 0
      while (k < nseg) {
        lacings(k) = payload(pos + 27 + k) & 0xff
        body += lacings(k)
        k += 1
      }
      if (pos + headerLen + body > payload.length) return None
      val want = pageCrc(payload, pos, pos + headerLen + body.toInt, pos + 22)
      if (want != u32le(payload, pos + 22).toInt) return None
      val bos = (flags & 0x02) != 0
      val eos = (flags & 0x04) != 0
      seqBySerial.get(serial) match {
        case None =>
          if (pageSeq != 0L) return None // lost page / spliced stream
        case Some((_, true)) =>
          // the serial completed with EOS: only a clean chain link
          // (BOS, sequence 0) may follow on this serial
          if (!bos || pageSeq != 0L) return None
        case Some((expect, false)) =>
          // mid-stream: exact sequence continuity, and a BOS page here
          // would be a spliced-in stream start, not a chain
          if (pageSeq != expect || bos) return None
      }
      seqBySerial(serial) = (pageSeq + 1, eos)
      out += RawPage(no, pos.toLong, headerLen, flags, granule, serial, lacings)
      pos += headerLen + body.toInt
      no += 1
    }
    if (out.isEmpty) None else Some(out.toIndexedSeq)
  }

  /**
   * Walk a payload's Ogg pages. None when the payload does not start
   * with a valid page, any page fails its CRC, a page overruns the
   * payload, a stream's page sequence numbers skip, or bytes trail the
   * last page — corrupt inputs must be distinguishable from clean ones,
   * not silently truncated. Multiplexed streams (distinct serials, e.g.
   * Ogg video with interleaved audio) are walked in file order with
   * per-serial sequence tracking. CHAINED bitstreams (RFC 3533: a
   * complete stream followed by another, possibly reusing the serial)
   * are accepted when the restart is clean — EOS seen, then BOS with
   * sequence 0; the emitted bos/eos flags let callers segment links.
   * Header-reading consumers ([[parseAudioMeta]], [[parseComments]])
   * decode the FIRST link of a reused serial (packets are per-serial in
   * file order, so link 1's headers come first).
   */
  def parsePages(payload: Array[Byte]): Option[IndexedSeq[Page]] =
    walkPages(payload).map(_.map { p =>
      Page(p.no, p.offset, p.headerLen, p.lacings.map(_.toLong).sum,
        p.granule, p.serial, (p.flags & 0x02) != 0, (p.flags & 0x04) != 0,
        p.lacings.count(_ < 255))
    })

  /** One reassembled logical packet: completion-ordered index within its
   * stream-interleaved file, total size, how many pages it spans, and
   * the page the packet COMPLETES on. */
  final case class Packet(no: Int, serial: Long, size: Long, nPages: Int,
      endPage: Int, bytes: Array[Byte])

  /**
   * Reassemble logical packets from the lacing tables (RFC 3533 §5): a
   * lacing value of 255 continues the packet into the next segment; a
   * value < 255 ends it; a packet whose page ends on 255 continues onto
   * the stream's next page, which must carry the continued-packet flag
   * (0x01). Packets are emitted in COMPLETION order (file order of their
   * final segment). Returns None on any page-level violation, on a
   * continued-flag mismatch (a flag without a pending partial, or a
   * pending partial into an unflagged page — spliced-stream evidence),
   * or on a stream ending with a dangling partial packet (a truncated
   * file, not a clean stream).
   */
  def parsePackets(payload: Array[Byte]): Option[IndexedSeq[Packet]] = {
    walkPages(payload).flatMap { pages =>
      // per-serial partial-packet assembly state
      final class Partial {
        val buf = new java.io.ByteArrayOutputStream()
        var pagesSpanned = 0
      }
      val partial = scala.collection.mutable.Map.empty[Long, Partial]
      val out = scala.collection.mutable.ArrayBuffer.empty[Packet]
      var no = 0
      // explicit early-exit flag, NOT a non-local return: `return` inside
      // the flatMap lambda rides NonLocalReturnControl (removed in Scala 3
      // and swallowed by any intervening catch-all) — r11 verdict #8
      var spliced = false
      val it = pages.iterator
      while (!spliced && it.hasNext) {
        val p = it.next()
        val continued = (p.flags & 0x01) != 0
        if (continued != partial.contains(p.serial)) spliced = true
        else {
          val st = partial.getOrElseUpdate(p.serial, new Partial)
          st.pagesSpanned += 1
          var segStart = p.offset + p.headerLen
          var k = 0
          while (k < p.lacings.length) {
            val lacing = p.lacings(k)
            st.buf.write(payload, segStart.toInt, lacing)
            if (lacing < 255) { // packet completes here
              out += Packet(no, p.serial, st.buf.size().toLong,
                st.pagesSpanned, p.no, st.buf.toByteArray)
              no += 1
              st.buf.reset()
              st.pagesSpanned = 1
            }
            segStart += lacing
            k += 1
          }
          if (st.buf.size() == 0) partial.remove(p.serial)
        }
      }
      if (spliced) None // continued-flag/partial mismatch: spliced stream
      else if (partial.nonEmpty) None // dangling partial at EOF: truncated
      else if (out.isEmpty) None
      else Some(out.toIndexedSeq)
    }
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

  /** Append one page (27-byte header, lacing table, body, REAL CRC
   * patched in) to `bo` — the single writer every synthetic fixture
   * shares, so a header or CRC fix can never diverge between families
   * (review finding: three hand-rolled copies had accumulated). */
  private def writePage(bo: java.io.ByteArrayOutputStream, serial: Long,
      pageNo: Int, flags: Int, granule: Long, lacings: Seq[Int],
      body: Array[Byte]): Unit = {
    val pageStart = bo.size()
    bo.write('O'); bo.write('g'); bo.write('g'); bo.write('S')
    bo.write(0) // stream_structure_version
    bo.write(flags)
    (0 until 8).foreach(i => bo.write(((granule >> (8 * i)) & 0xff).toInt))
    (0 until 4).foreach(i => bo.write(((serial >> (8 * i)) & 0xff).toInt))
    (0 until 4).foreach(i =>
      bo.write(((pageNo.toLong >> (8 * i)) & 0xff).toInt))
    (0 until 4).foreach(_ => bo.write(0)) // CRC placeholder
    bo.write(lacings.length)
    lacings.foreach(bo.write)
    bo.write(body, 0, body.length)
    val bytes = bo.toByteArray
    val c = pageCrc(bytes, pageStart, bytes.length, pageStart + 22)
    (0 until 4).foreach(i =>
      bytes(pageStart + 22 + i) = ((c >> (8 * i)) & 0xff).toByte)
    bo.reset(); bo.write(bytes, 0, bytes.length)
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
      val nk = kOf(p)
      val lacings = (0 until nk).flatMap { k =>
        val s = size(p, k)
        if (s < 255) Seq(s) else Seq(255, s - 255)
      }
      val body = (0 until nk).map(size(p, _)).sum
      writePage(bo, serial, p,
        (if (p == 0) 0x02 else 0) | (if (p == nPages - 1) 0x04 else 0),
        (p + 1L) * (100 + id % 50), lacings,
        Array.tabulate(body)(j => ((id + p * 131L + j) & 0xff).toByte))
    }
    bo.toByteArray
  }

  // =====================================================================
  // Chained fixture: every non-final page OPENS a packet that continues
  // onto the next page (one or TWO 255 lacings), and every non-first page
  // carries the continued flag and closes it — the cross-page packet
  // reassembly the m19 oracle recomputes. A demuxer that treats 255 as a
  // packet end, drops continuation chunks, or mis-orders completion
  // produces wrong sizes/probes. The sweep deliberately includes
  // ≥3-segment packets (two 255 openings + a closing, >510 bytes) and
  // EXACT-510 packets closed by a terminating 0 lacing — the two lacing
  // edge shapes RFC 3533 §5 allows that a 2-segment-only fixture never
  // exercises (r11 verdict #2).
  // =====================================================================

  /** Deterministic chained shape shared by the writer, the m19 oracle and
   * the spec: pages `3 + id%4`; page p carries (in order) the previous
   * long packet's closing chunk (`rem(p-1)` bytes — a single lacing,
   * which is the terminating 0 when `rem` is 0), a short packet
   * `a(p) = 60 + ((id*11 + p*17) % 90)`, and — on non-final pages — the
   * opening chunk of long packet L(p): `open(p) = 1 + (id+p)%2` 255
   * lacings. `rem(p)` is 0 when `open(p) == 2 && (id+p)%5 == 0` (an
   * exact-510 packet) and `40 + ((id*5 + p*7) % 200)` otherwise. So
   * packet completion order is A(0), L(0), A(1), L(1), …, A(np-1), with
   * |A(p)| = a(p) (1 page) and |L(p)| = 255·open(p) + rem(p) (2 pages,
   * up to 749 bytes over up to 3 segments). Granule `(p+1)*(90 +
   * id%40)`; serial `2000 + id%100`; body byte j of page p is
   * `(id + p*131 + j) & 0xff`. */
  def syntheticChainedShape(
      id: Long): (Int, Int => Int, Int => Int, Int => Int) = {
    val nPages = (3 + id % 4).toInt
    val a = (p: Int) => (60 + ((id * 11 + p * 17) % 90)).toInt
    val open = (p: Int) => (1 + ((id + p) % 2)).toInt
    val rem = (p: Int) =>
      if (open(p) == 2 && (id + p) % 5 == 0) 0
      else (40 + ((id * 5 + p * 7) % 200)).toInt
    (nPages, a, open, rem)
  }

  def syntheticChainedOgg(id: Long): Array[Byte] = {
    val (nPages, a, open, rem) = syntheticChainedShape(id)
    val serial = 2000L + id % 100
    val bo = new java.io.ByteArrayOutputStream()
    (0 until nPages).foreach { p =>
      val lacings =
        (if (p > 0) Seq(rem(p - 1)) else Seq.empty) ++ Seq(a(p)) ++
          (if (p < nPages - 1) Seq.fill(open(p))(255) else Seq.empty)
      writePage(bo, serial, p,
        (if (p > 0) 0x01 else 0x02) | (if (p == nPages - 1) 0x04 else 0),
        (p + 1L) * (90 + id % 40), lacings,
        Array.tabulate(lacings.sum)(j => ((id + p * 131L + j) & 0xff).toByte))
    }
    bo.toByteArray
  }

  /** Output schema of [[oggPackets]]. */
  val packetSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("packet_no", IntegerType),
    StructField("serial", LongType),
    StructField("size", LongType),
    StructField("n_pages", IntegerType),
    StructField("end_page", IntegerType),
    StructField("bytes", BinaryType)))

  /** One row per reassembled logical packet (completion order) with its
   * total size, page span and concatenated bytes; non-Ogg / corrupt /
   * truncated payloads are dropped. Narrow mapPartitions — no shuffle. */
  def oggPackets(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parsePackets(r.getAs[Array[Byte]](pIdx)) match {
          case Some(ps) => ps.iterator.map(p =>
            Row(id, p.no, p.serial, p.size, p.nPages, p.endPage, p.bytes))
          case None => Iterator.empty
        }
      }
    }(Encoders.row(packetSchema))
  }

  /** Typed audio metadata from an Ogg stream's identification header —
   * the audio analog of the MP4 tkhd dims: codec, channel count, sample
   * rate and (Opus) pre-skip, decoded from the FIRST packet per RFC 7845
   * §5.1 (OpusHead) / Vorbis I §4.2.2 (the type-1 identification
   * header). */
  final case class AudioMeta(codec: String, channels: Int,
      sampleRate: Long, preskip: Int)

  /** Decode the stream's identification header. None when the payload is
   * not clean Ogg or its first packet is neither an OpusHead nor a
   * Vorbis identification header — an unrecognized codec yields a
   * detectable absence, never garbage fields. */
  def parseAudioMeta(payload: Array[Byte]): Option[AudioMeta] =
    parsePackets(payload).flatMap { ps =>
      val b = ps.head.bytes
      // field validation (r11 advice): a recognized magic with a wrong
      // version nibble, zero channel count or zero sample rate is a
      // CORRUPTED header — None, never typed garbage. OpusHead's major
      // version (upper nibble of byte 8) must be 0 per RFC 7845 §5.1
      // ("version 1" has major 0); a Vorbis id header carries version
      // u32 = 0 per Vorbis I §4.2.2.
      if (b.length >= 19 && magicAt(b, 0, "OpusHead") && (b(8) & 0xf0) == 0 &&
          (b(9) & 0xff) != 0 && u32le(b, 12) != 0)
        Some(AudioMeta("opus", b(9) & 0xff,
          u32le(b, 12), ((b(10) & 0xff) | ((b(11) & 0xff) << 8))))
      else if (b.length >= 30 && b(0) == 1 && magicAt(b, 1, "vorbis") &&
          u32le(b, 7) == 0 && (b(11) & 0xff) != 0 && u32le(b, 12) != 0)
        Some(AudioMeta("vorbis", b(11) & 0xff, u32le(b, 12), 0))
      else None
    }

  /** True iff `s`'s ISO-8859-1 bytes sit at `off` in `b` — the magic
   * matcher every header decoder shares. */
  private def magicAt(b: Array[Byte], off: Int, s: String): Boolean =
    off + s.length <= b.length &&
      s.indices.forall(i => b(off + i) == s.charAt(i).toByte)

  /** Strict UTF-8 decode: None on malformed bytes. The default decoder's
   * U+FFFD replacement would turn a truncated/mojibake tag into a
   * plausible-looking garbage row — the exact failure mode the
   * never-garbage contract exists to prevent. Shared with the other
   * tag extractors ([[Flac.parseComments]] via [[decodeCommentBody]],
   * [[Mp4.parseIlstTags]] directly). */
  private[functions] def utf8Strict(b: Array[Byte], off: Int, len: Int): Option[String] =
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      Some(dec.decode(java.nio.ByteBuffer.wrap(b, off, len)).toString)
    } catch { case _: java.nio.charset.CharacterCodingException => None }

  /**
   * Decode every audio stream's comment header (the stream's SECOND
   * packet, per-serial — a multiplexed file tags each stream
   * independently, so file completion order must not be consulted): the
   * tag-metadata side of Ogg audio, where TITLE/ARTIST/ALBUM live for
   * .ogg/.opus crawls — the exact counterpart of
   * [[Mp3.parseId3TextFrames]] for MP3. Both containers share one
   * structure (Vorbis I §5 / RFC 7845 §5.2): a vendor string, then N
   * length-prefixed UTF-8 `KEY=value` comments — Vorbis wraps it in a
   * type-3 header with a mandatory framing bit, Opus in an `OpusTags`
   * magic with optional trailing padding.
   *
   * Returns one (serial, vendor, comments) per tagged stream, serials
   * in first-appearance order, keys RAW (the spec says keys are
   * case-insensitive, but extraction is not normalization policy). A
   * serial whose second packet bears NEITHER magic contributes nothing
   * (another codec, not corruption). None when the payload is not clean
   * Ogg, no stream carries a comment header, or any stream's comment
   * header is MALFORMED — a length overrunning the packet, a comment
   * without `=`, a key byte outside the spec's 0x20–0x7D-minus-`=`
   * range, invalid UTF-8, or a cleared Vorbis framing bit — corrupt
   * tags are a detectable absence, never garbage rows.
   */
  def parseComments(payload: Array[Byte]): Option[
      IndexedSeq[(Long, String, IndexedSeq[(String, String)])]] =
    parsePackets(payload).flatMap { ps =>
      val serials = ps.map(_.serial).distinct
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, IndexedSeq[(String, String)])]
      var bad = false
      val it = serials.iterator
      while (!bad && it.hasNext) {
        val serial = it.next()
        val mine = ps.filter(_.serial == serial)
        if (mine.length >= 2) {
          val b = mine(1).bytes
          commentStart(b) match {
            case Some((start, framed)) =>
              decodeCommentBody(b, start, framed) match {
                case Some((vendor, cs)) => out += ((serial, vendor, cs))
                case None => bad = true // malformed header: poison, not skip
              }
            case None => () // no comment magic: another codec, skip serial
          }
        }
      }
      if (bad || out.isEmpty) None else Some(out.toIndexedSeq)
    }

  /** (payload offset, framing-bit-required) when `b` opens a comment
   * header; None when the magic is absent. */
  private def commentStart(b: Array[Byte]): Option[(Int, Boolean)] =
    if (magicAt(b, 0, "OpusTags")) Some((8, false))
    else if (b.length >= 7 && b(0) == 3 && magicAt(b, 1, "vorbis"))
      Some((7, true))
    else None

  // plain method, not a closure: the early exits below are method-level
  // returns, never NonLocalReturnControl (the parsePackets lesson).
  // private[functions]: the identical structure appears INSIDE FLAC
  // metadata blocks (no magic, no framing bit) — [[Flac.flacComments]]
  // reuses this decoder with framed = false
  private[functions] def decodeCommentBody(b: Array[Byte], start: Int,
      framed: Boolean): Option[(String, IndexedSeq[(String, String)])] = {
    var pos = start
    def u32(): Long = // returns from u32 itself (nested def), -1 = short
      if (pos + 4 > b.length) -1L
      else { val v = u32le(b, pos); pos += 4; v }
    val vlen = u32()
    if (vlen < 0 || pos + vlen > b.length) return None
    // plain match, not getOrElse(return ...): a by-name default is a
    // closure, which would reintroduce the non-local-return hazard
    val vendor = utf8Strict(b, pos, vlen.toInt) match {
      case Some(v) => v
      case None => return None
    }
    pos += vlen.toInt
    val n = u32()
    if (n < 0 || n > b.length) return None // count cannot exceed byte count
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0L
    while (i < n) {
      val clen = u32()
      if (clen < 0 || pos + clen > b.length) return None
      val c = utf8Strict(b, pos, clen.toInt) match {
        case Some(v) => v
        case None => return None
      }
      pos += clen.toInt
      val eq = c.indexOf('=')
      if (eq < 1) return None // no '=' or empty key
      val key = c.substring(0, eq)
      if (!key.forall(ch => ch >= 0x20 && ch <= 0x7d && ch != '='))
        return None
      out += ((key, c.substring(eq + 1)))
      i += 1
    }
    // Vorbis I §5.2: the comment header ends with a set framing bit
    if (framed && (pos >= b.length || (b(pos) & 0x01) != 1)) return None
    Some((vendor, out.toIndexedSeq))
  }

  /** Output schema of [[oggComments]]. */
  val commentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("serial", LongType),
    StructField("vendor", StringType),
    StructField("comment_no", IntegerType),
    StructField("key", StringType),
    StructField("value", StringType)))

  /** One row per user comment (header order) per tagged stream, with the
   * stream serial and vendor; payloads without a clean comment header
   * contribute nothing. Narrow mapPartitions — header-only reads, no
   * shuffle. */
  def oggComments(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseComments(r.getAs[Array[Byte]](pIdx)) match {
          case Some(streams) => streams.iterator.flatMap {
            case (serial, vendor, cs) => cs.iterator.zipWithIndex.map {
              case ((k, v), i) => Row(id, serial, vendor, i, k, v)
            }
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(commentSchema))
  }

  /** Output schema of [[oggAudioMeta]]. */
  val audioMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("codec", StringType),
    StructField("channels", IntegerType),
    StructField("sample_rate", LongType),
    StructField("preskip", IntegerType)))

  /** One row per payload with its decoded identification header;
   * non-Ogg / unrecognized-codec payloads are dropped. Narrow map. */
  def oggAudioMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseAudioMeta(r.getAs[Array[Byte]](pIdx)).map(m =>
          Row(id, m.codec, m.channels, m.sampleRate, m.preskip)).iterator
      }
    }(Encoders.row(audioMetaSchema))
  }

  /** The id-derived identification header shared by the m20 and m24
   * fixtures: even ids are Opus (channels `1 + (id/2)%2`, preskip
   * `312 + id%100`, rate 48000/24000/16000 by `id%3`), odd ids are
   * Vorbis (channels `1 + (id/2)%2`, rate 44100/32000/22050 by
   * `id%3`). */
  private def audioIdHeader(id: Long): Array[Byte] =
    if (id % 2 == 0) {
      val bo = new java.io.ByteArrayOutputStream()
      bo.write("OpusHead".getBytes("ISO-8859-1"))
      bo.write(1) // version
      bo.write((1 + (id / 2) % 2).toInt) // channels
      val preskip = (312 + id % 100).toInt
      bo.write(preskip & 0xff); bo.write((preskip >> 8) & 0xff)
      val rate = Seq(48000L, 24000L, 16000L)((id % 3).toInt)
      (0 until 4).foreach(i => bo.write(((rate >> (8 * i)) & 0xff).toInt))
      bo.write(0); bo.write(0) // output gain
      bo.write(0)              // mapping family
      bo.toByteArray
    } else {
      val bo = new java.io.ByteArrayOutputStream()
      bo.write(1)
      bo.write("vorbis".getBytes("ISO-8859-1"))
      (0 until 4).foreach(_ => bo.write(0)) // version 0
      bo.write((1 + (id / 2) % 2).toInt)    // channels
      val rate = Seq(44100L, 32000L, 22050L)((id % 3).toInt)
      (0 until 4).foreach(i => bo.write(((rate >> (8 * i)) & 0xff).toInt))
      (0 until 12).foreach(_ => bo.write(0)) // bitrate max/nominal/min
      bo.write(0xb8)                          // blocksizes
      bo.write(1)                             // framing
      bo.toByteArray
    }

  /** The m20 fixture: one bos page carrying [[audioIdHeader]] + one eos
   * data page of `30 + id%20` bytes (both < 255, single lacings). */
  def syntheticAudioOgg(id: Long): Array[Byte] = {
    val serial = 3000L + id % 100
    val header = audioIdHeader(id)
    val bo = new java.io.ByteArrayOutputStream()
    writePage(bo, serial, 0, 0x02, 0L, Seq(header.length), header)
    val dataLen = (30 + id % 20).toInt
    writePage(bo, serial, 1, 0x04, 960L, Seq(dataLen),
      Array.tabulate(dataLen)(j => ((id + j) & 0xff).toByte))
    bo.toByteArray
  }

  // =====================================================================
  // Multiplexed fixture: TWO logical streams (serials X and Y) whose
  // pages strictly interleave in file order (X0 Y0 X1 Y1 …) while BOTH
  // keep a packet open across their page seams — so at every interior
  // file position two partial packets are pending simultaneously, one
  // per serial. A demuxer with a single shared partial buffer, or one
  // keyed on file order instead of serial, concatenates bytes across
  // streams; the m23 oracle's per-packet sizes and byte probes catch it.
  // =====================================================================

  /** Deterministic muxed shape shared by the writer, the m23 oracle and
   * the spec: `n = 2 + id%3` pages PER STREAM; file page `q` belongs to
   * stream `s = q%2` (0 = X serial `4000 + id%100`, 1 = Y serial
   * `4100 + id%100`) at stream position `p = q/2`. Stream-page (s, p)
   * carries (in order) the previous long packet's closing chunk
   * `r_s(p-1)` when p>0, a short packet `a_s(p)`, and a single 255
   * opening lacing when p<n-1 — with `a_X(p) = 50 + ((id*7 + p*13) %
   * 80)`, `r_X(p) = 30 + ((id*3 + p*11) % 100)`, `a_Y(p) = 55 + ((id*9 +
   * p*19) % 70)`, `r_Y(p) = 35 + ((id*13 + p*5) % 90)`. Granule
   * `(p+1)*(80 + id%30)` for X / `(p+1)*(70 + id%20)` for Y; body byte j
   * of FILE page q is `(id + q*131 + j) & 0xff`. Completion order: file
   * page 0 completes A_X(0) (packet 0), page 1 A_Y(0) (packet 1), and
   * every page q ≥ 2 completes L_s(p-1) (packet 2q−2, 2 stream pages)
   * then A_s(p) (packet 2q−1, 1 page). */
  def syntheticMuxedShape(
      id: Long): (Int, (Int, Int) => Int, (Int, Int) => Int) = {
    val nPerStream = (2 + id % 3).toInt
    val a = (s: Int, p: Int) =>
      if (s == 0) (50 + ((id * 7 + p * 13) % 80)).toInt
      else (55 + ((id * 9 + p * 19) % 70)).toInt
    val r = (s: Int, p: Int) =>
      if (s == 0) (30 + ((id * 3 + p * 11) % 100)).toInt
      else (35 + ((id * 13 + p * 5) % 90)).toInt
    (nPerStream, a, r)
  }

  def syntheticMuxedOgg(id: Long): Array[Byte] = {
    val (n, a, r) = syntheticMuxedShape(id)
    val bo = new java.io.ByteArrayOutputStream()
    (0 until 2 * n).foreach { q =>
      val s = q % 2
      val p = q / 2
      val lacings =
        (if (p > 0) Seq(r(s, p - 1)) else Seq.empty) ++ Seq(a(s, p)) ++
          (if (p < n - 1) Seq(255) else Seq.empty)
      writePage(bo, (if (s == 0) 4000L else 4100L) + id % 100, p,
        (if (p > 0) 0x01 else 0x02) | (if (p == n - 1) 0x04 else 0),
        (p + 1L) * (if (s == 0) 80 + id % 30 else 70 + id % 20), lacings,
        Array.tabulate(lacings.sum)(j => ((id + q * 131L + j) & 0xff).toByte))
    }
    bo.toByteArray
  }

  /** Deterministic commented-Ogg shape shared by the writer, the m24
   * oracle and the spec: a 3-page stream (id header / comment header /
   * eos data) whose packet-2 comments mirror the m21 tag formulas —
   * vendor `graft <id%7>`; TITLE `title_<id*7%1000>`, ARTIST
   * `artist_<id%50>`, ALBUM `album_<id%20>`, TRACKNUMBER `<1+id%12>`,
   * and a PAD comment of `200 + id%200` `x`s that pushes the comment
   * packet past one 255-lacing segment (the page's lacing table chains
   * inside the page). Even ids carry OpusTags, odd ids the Vorbis
   * type-3 header with its framing bit; serial `5000 + id%100`. */
  def syntheticCommentedOgg(id: Long): Array[Byte] = {
    val serial = 5000L + id % 100
    val comments = Seq(
      s"TITLE=title_${id * 7 % 1000}",
      s"ARTIST=artist_${id % 50}",
      s"ALBUM=album_${id % 20}",
      s"TRACKNUMBER=${1 + id % 12}",
      "PAD=" + ("x" * (200 + id % 200).toInt))
    val vendor = s"graft ${id % 7}"
    def u32le(v: Long, bo: java.io.ByteArrayOutputStream): Unit =
      (0 until 4).foreach(i => bo.write(((v >> (8 * i)) & 0xff).toInt))
    val tags = {
      val bo = new java.io.ByteArrayOutputStream()
      if (id % 2 == 0) bo.write("OpusTags".getBytes("ISO-8859-1"))
      else { bo.write(3); bo.write("vorbis".getBytes("ISO-8859-1")) }
      val vb = vendor.getBytes("UTF-8")
      u32le(vb.length.toLong, bo); bo.write(vb, 0, vb.length)
      u32le(comments.length.toLong, bo)
      comments.foreach { c =>
        val cb = c.getBytes("UTF-8")
        u32le(cb.length.toLong, bo); bo.write(cb, 0, cb.length)
      }
      if (id % 2 != 0) bo.write(1) // Vorbis framing bit
      bo.toByteArray
    }
    val bo = new java.io.ByteArrayOutputStream()
    // in-page lacing chain: 255s then the remainder (a natural 0 when
    // the body is an exact multiple)
    def chain(len: Int): Seq[Int] = Seq.fill(len / 255)(255) :+ len % 255
    def page(p: Int, flags: Int, granule: Long, body: Array[Byte]): Unit =
      writePage(bo, serial, p, flags, granule, chain(body.length), body)
    page(0, 0x02, 0L, audioIdHeader(id))
    page(1, 0, 0L, tags)
    val dataLen = (30 + id % 20).toInt
    page(2, 0x04, 960L,
      Array.tabulate(dataLen)(j => ((id + j) & 0xff).toByte))
    bo.toByteArray
  }

  /** Executor-side audio-header fixtures — the m20 oracle recomputes the
   * decoded fields in SQL. */
  def syntheticAudioOggs(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticAudioOgg)

  /** Executor-side commented-Ogg fixtures — the m24 oracle recomputes the
   * comment list in SQL. */
  def syntheticCommentedOggs(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticCommentedOgg)

  /** Executor-side chained-Ogg fixtures — the m19 oracle recomputes the
   * cross-page packet reassembly in SQL. */
  def syntheticChainedOggs(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticChainedOgg)

  /** Executor-side muxed two-serial fixtures — the m23 oracle recomputes
   * the interleaved reassembly in SQL. */
  def syntheticMuxedOggs(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticMuxedOgg)

  /** Executor-side synthetic-Ogg fixtures — the m18 oracle recomputes the
   * full page arithmetic in SQL. */
  def syntheticOggs(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticOgg)

  // =====================================================================
  // Linked (RFC 3533 CHAINED bitstream) fixture: two complete streams
  // back to back REUSING one serial — the first link ends with EOS, then
  // the same serial restarts with BOS + sequence 0. The page walk must
  // accept the clean restart (rejecting it would silently drop every
  // chained .ogg in a crawl — internet radio dumps are chained routinely)
  // while still refusing unclean ones; the m27 oracle recomputes every
  // page across the seam, where a walker that keeps counting sequence
  // numbers across links fails.
  // =====================================================================

  /** Deterministic chained-bitstream shape shared by the writer, the m27
   * oracle and the spec: 2 links on the SAME serial `4000 + id%100`;
   * link L has `2 + (id+L)%2` pages; page p of link L carries ONE
   * single-segment packet of `45 + ((id*7 + L*29 + p*13) % 90)` bytes
   * (body byte j is `(id + L*37 + p*11 + j) & 0xff`), granule
   * `(p+1)*(10+L)`; bos/eos bracket each link; page sequence numbers
   * restart at 0 on the second link. */
  def syntheticLinkedOgg(id: Long): Array[Byte] = {
    val serial = 4000L + id % 100
    val bo = new java.io.ByteArrayOutputStream()
    (0 until 2).foreach { l =>
      val np = (2 + (id + l) % 2).toInt
      (0 until np).foreach { p =>
        val a = (45 + ((id * 7 + l * 29 + p * 13) % 90)).toInt
        writePage(bo, serial, p,
          (if (p == 0) 0x02 else 0) | (if (p == np - 1) 0x04 else 0),
          (p + 1L) * (10 + l), Seq(a),
          Array.tabulate(a)(j => ((id + l * 37L + p * 11 + j) & 0xff).toByte))
      }
    }
    bo.toByteArray
  }

  /** Executor-side chained-bitstream fixtures — the m27 oracle replays
   * the link/page formulas across the EOS→BOS seam. */
  def syntheticLinkedOggs(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticLinkedOgg)
}
