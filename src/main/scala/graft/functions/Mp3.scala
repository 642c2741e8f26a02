package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * Pure-JVM MPEG-audio (MP3) frame walk: resolves every audio frame's
 * exact byte range, bitrate, sample rate and sample count from the frame
 * headers — no decoder, no third-party jar. The audio analog of [[Mp4]]'s
 * ISO-BMFF box walk: with (offset, size) per frame a cluster job can
 * slice or window audio shards out of object-store ranged reads without
 * shipping whole files, and per-frame bitrate/duration gives the segment
 * metadata an audio-training pipeline keys on (VBR-aware duration, talk
 * vs music bitrate profiles, silence-run detection downstream).
 *
 * Parsing scope (ISO/IEC 11172-3 / 13818-3 frame headers): the 11-bit
 * sync, MPEG-1/2/2.5 versions, Layers I-III, the per-version bitrate and
 * sample-rate tables, the padding bit, and the Layer-dependent frame
 * length arithmetic (Layer I padded in 4-byte slots, Layers II/III in
 * single bytes). A leading ID3v2 container (synchsafe 28-bit size) is
 * skipped; a trailing ID3v1 'TAG' block (128 bytes) terminates cleanly.
 * Truncated/corrupt payloads return None — callers fall back, they never
 * see a half-parsed stream (same contract as Mp4.parseVideoTrack).
 *
 * Reference behavior anchor: fugue treats binary media columns as opaque
 * payloads transformed per-partition (fugue/execution/execution_engine.py
 * map-style extensions); the frame walk itself is engine-added capability
 * (SURVEY §2 "beyond-reference pipeline operators").
 */
object Mp3 {

  /** One MPEG-audio frame resolved to its absolute byte range. */
  final case class Frame(no: Int, offset: Long, size: Int,
      bitrateKbps: Int, sampleRate: Int, samplesPerFrame: Int)

  // bitrate tables, kbps, index 1..14 (0 = free, 15 = bad) ------------
  private val BrV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val BrV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val BrV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BrV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val BrV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private val SrV1 = Array(44100, 48000, 32000)
  private val SrV2 = Array(22050, 24000, 16000)
  private val SrV25 = Array(11025, 12000, 8000)

  /** Parse one 4-byte frame header at `p`; None when it is not a valid
   * MPEG-audio frame header. Returns (frameSize, kbps, hz, samples). */
  private def header(b: Array[Byte], p: Long): Option[(Int, Int, Int, Int)] = {
    if (p < 0 || p + 4 > b.length) return None
    val h0 = b(p.toInt) & 0xff
    val h1 = b(p.toInt + 1) & 0xff
    val h2 = b(p.toInt + 2) & 0xff
    if (h0 != 0xff || (h1 & 0xe0) != 0xe0) return None
    val version = (h1 >> 3) & 0x3  // 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    val layer = (h1 >> 1) & 0x3    // 1=III, 2=II, 3=I
    if (version == 1 || layer == 0) return None
    val brIdx = (h2 >> 4) & 0xf
    val srIdx = (h2 >> 2) & 0x3
    val pad = (h2 >> 1) & 0x1
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None // free/bad
    val kbps = (version, layer) match {
      case (3, 3) => BrV1L1(brIdx)
      case (3, 2) => BrV1L2(brIdx)
      case (3, 1) => BrV1L3(brIdx)
      case (_, 3) => BrV2L1(brIdx)
      case _ => BrV2L23(brIdx)
    }
    val hz = version match {
      case 3 => SrV1(srIdx)
      case 2 => SrV2(srIdx)
      case _ => SrV25(srIdx)
    }
    // samples per frame: L1 384; L2 1152; L3 1152 (MPEG1) / 576 (2, 2.5)
    val samples = layer match {
      case 3 => 384
      case 2 => 1152
      case _ => if (version == 3) 1152 else 576
    }
    // frame length: L1 in 4-byte slots, L2/III in bytes (integer floor)
    val size = layer match {
      case 3 => (12 * kbps * 1000 / hz + pad) * 4
      case _ => samples / 8 * kbps * 1000 / hz + pad
    }
    if (size < 4) None else Some((size, kbps, hz, samples))
  }

  /**
   * Walk a payload's MPEG-audio frames. None when the payload does not
   * start (after an optional ID3v2 block) with a valid frame header or
   * any frame overruns the payload; parsing stops cleanly at a trailing
   * ID3v1 'TAG' block or end of payload. Corrupt mid-stream bytes map to
   * None rather than a silently short frame list — a training pipeline
   * must distinguish 'clean stream' from 'salvageable prefix' explicitly.
   */
  def parseFrames(payload: Array[Byte]): Option[IndexedSeq[Frame]] = {
    if (payload == null || payload.length < 4) return None
    var pos = 0L
    // ID3v2: 'ID3' + ver(2) + flags(1) + 28-bit synchsafe size(4)
    if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' &&
        payload(2) == '3') {
      val sz = ((payload(6) & 0x7f) << 21) | ((payload(7) & 0x7f) << 14) |
        ((payload(8) & 0x7f) << 7) | (payload(9) & 0x7f)
      // ID3v2.4 footer flag (header flags bit 0x10): 10 more bytes after
      // the tag body that the synchsafe size does NOT count
      val footer = if ((payload(5) & 0x10) != 0) 10 else 0
      pos = 10L + sz + footer
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Frame]
    var no = 0
    while (pos + 4 <= payload.length) {
      // trailing ID3v1 tag terminates the stream
      if (pos + 3 <= payload.length && payload(pos.toInt) == 'T' &&
          payload(pos.toInt + 1) == 'A' && payload(pos.toInt + 2) == 'G' &&
          payload.length - pos == 128) {
        return if (out.isEmpty) None else Some(out.toIndexedSeq)
      }
      header(payload, pos) match {
        case Some((size, kbps, hz, samples)) =>
          if (pos + size > payload.length) return None // truncated frame
          out += Frame(no, pos, size, kbps, hz, samples)
          pos += size
          no += 1
        case None => return None // corrupt header mid-stream
      }
    }
    if (out.isEmpty || pos != payload.length) None
    else Some(out.toIndexedSeq)
  }

  /** Output schema of [[mp3Frames]]. */
  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_no", IntegerType),
    StructField("offset", LongType),
    StructField("size", IntegerType),
    StructField("bitrate_kbps", IntegerType),
    StructField("hz", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("frame_bytes", BinaryType)))

  /** One row per MPEG-audio frame with its resolved byte range, VBR
   * bitrate, sample rate and sample count; non-MP3 / corrupt payloads
   * are dropped. Narrow mapPartitions — no shuffle; linear per row. */
  def mp3Frames(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val payload = r.getAs[Array[Byte]](pIdx)
        parseFrames(payload) match {
          case Some(frames) => frames.iterator.map { f =>
            Row(id, f.no, f.offset, f.size, f.bitrateKbps, f.sampleRate,
              f.samplesPerFrame,
              java.util.Arrays.copyOfRange(payload, f.offset.toInt,
                f.offset.toInt + f.size))
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(frameSchema))
  }

  // =====================================================================
  // ID3v2 tag frames (informal standard id3v2.4.0-structure / -frames;
  // v2.3 differs in frame-size encoding): the text-metadata side of an
  // audio corpus — title/artist/album extraction without touching the
  // MPEG stream.
  // =====================================================================

  /** Reverse ID3v2 unsynchronisation: every FF 00 pair collapses to FF
   * (the 00 was inserted so tag bytes never form a false MPEG sync). */
  private def deunsync(b: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(until - from)
    var i = from
    while (i < until) {
      out.write(b(i))
      if ((b(i) & 0xff) == 0xff && i + 1 < until && b(i + 1) == 0) i += 2
      else i += 1
    }
    out.toByteArray
  }

  /**
   * Decode the leading ID3v2 tag's TEXT frames (ids `T***`, or 3-char
   * `T**` in v2.2): one (frame_id, text) per frame, in tag order — v2.2
   * ids are emitted RAW (`TT2`, not remapped to `TIT2`: extraction, not
   * policy). Handles v2.4 synchsafe / v2.3 plain / v2.2 24-bit frame
   * sizes, the optional extended header, padding termination, tag-level
   * (v2.2/v2.3) and frame-level (v2.4) UNSYNCHRONISATION, the v2.4
   * data-length indicator, and the four text encodings (ISO-8859-1,
   * UTF-16 with BOM, UTF-16BE, UTF-8; v2.2 allows only the first two)
   * with trailing NUL stripping. Compressed/encrypted frames are SKIPPED
   * (structurally walked, never decoded as plain text — emitting garbage
   * rows would be worse than omission). None when there is no ID3v2 tag
   * or any frame overruns the tag — a corrupt tag is detectable, never a
   * silently short frame list.
   */
  def parseId3TextFrames(payload: Array[Byte]): Option[IndexedSeq[(String, String)]] = {
    if (payload == null || payload.length < 10 || payload(0) != 'I' ||
        payload(1) != 'D' || payload(2) != '3') return None
    val verMajor = payload(3) & 0xff
    if (verMajor < 2 || verMajor > 4) return None
    val hdrFlags = payload(5) & 0xff
    // v2.2's second flag bit is COMPRESSION (not the extended header):
    // the spec says a tag with it set "should be ignored in its entirety"
    if (verMajor == 2 && (hdrFlags & 0x40) != 0) return None
    def synchsafeAt(b: Array[Byte], i: Int): Int =
      ((b(i) & 0x7f) << 21) | ((b(i + 1) & 0x7f) << 14) |
        ((b(i + 2) & 0x7f) << 7) | (b(i + 3) & 0x7f)
    val tagEnd = 10 + synchsafeAt(payload, 6)
    if (tagEnd > payload.length) return None
    // tag-level unsynchronisation (the v2.2/v2.3 form; a v2.4 header flag
    // means every frame carries its own flag, handled below) — walk a
    // de-unsynced copy of the tag body
    val tag: Array[Byte] =
      if (verMajor <= 3 && (hdrFlags & 0x80) != 0)
        deunsync(payload, 10, tagEnd)
      else java.util.Arrays.copyOfRange(payload, 10, tagEnd)
    def u32(i: Int): Long =
      ((tag(i) & 0xffL) << 24) | ((tag(i + 1) & 0xffL) << 16) |
        ((tag(i + 2) & 0xffL) << 8) | (tag(i + 3) & 0xffL)
    var pos = 0
    if (verMajor >= 3 && (hdrFlags & 0x40) != 0) { // extended header
      if (pos + 4 > tag.length) return None
      val ehSize =
        if (verMajor == 4) synchsafeAt(tag, pos)
        else u32(pos).toInt + 4 // v2.3 size EXCLUDES its own 4 bytes
      pos += ehSize
      if (pos > tag.length) return None
    }
    // v2.2 frame headers are 6 bytes: a 3-char id + 24-bit big-endian
    // size, no per-frame flags (so nothing is compressed/encrypted/
    // unsynced at frame level in a v2.2 tag)
    val idLen = if (verMajor == 2) 3 else 4
    val hdrLen = if (verMajor == 2) 6 else 10
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (pos + hdrLen <= tag.length && tag(pos) != 0) {
      val fid = new String(tag, pos, idLen, "ISO-8859-1")
      if (!fid.forall(c => c.isUpper || c.isDigit)) return None
      val fsize: Long = verMajor match {
        case 2 => ((tag(pos + 3) & 0xffL) << 16) |
          ((tag(pos + 4) & 0xffL) << 8) | (tag(pos + 5) & 0xffL)
        case 4 => synchsafeAt(tag, pos + 4).toLong
        case _ => u32(pos + 4)
      }
      if (pos + hdrLen + fsize > tag.length) return None // overruns the tag
      val fmtFlags = if (verMajor == 2) 0 else tag(pos + 9) & 0xff
      // compressed/encrypted frames cannot be decoded as plain text:
      // v2.4 flags 0x08/0x04, v2.3 flags 0x80/0x40 — skip, don't guess
      val undecodable =
        if (verMajor == 4) (fmtFlags & 0x0c) != 0
        else if (verMajor == 3) (fmtFlags & 0xc0) != 0
        else false
      if (fid.startsWith("T") && fsize >= 1 && !undecodable) {
        var bodyStart = pos + hdrLen
        var bodyEnd = (pos + hdrLen + fsize).toInt
        // v2.4 data-length indicator precedes the data
        if (verMajor == 4 && (fmtFlags & 0x01) != 0) {
          if (bodyStart + 4 > bodyEnd) return None
          bodyStart += 4
        }
        val body =
          if (verMajor == 4 && (fmtFlags & 0x02) != 0)
            deunsync(tag, bodyStart, bodyEnd) // frame-level unsync
          else java.util.Arrays.copyOfRange(tag, bodyStart, bodyEnd)
        if (body.length >= 1) {
          // v2.2 defines only encodings 0 (ISO-8859-1) and 1 (UCS-2 with
          // BOM) — a higher byte in a v2.2 frame is corruption, not a
          // later-version encoding to guess at
          if (verMajor == 2 && (body(0) & 0xff) > 1) return None
          val cs = body(0) & 0xff match {
            case 0 => "ISO-8859-1"
            case 1 => "UTF-16"   // BOM-led
            case 2 => "UTF-16BE"
            case 3 => "UTF-8"
            case _ => return None
          }
          // strip trailing NUL terminator(s) — single or double byte
          val text0 = new String(body, 1, body.length - 1, cs)
          out += ((fid, text0.replaceAll("\\u0000+$", "")))
        }
      }
      pos += hdrLen + fsize.toInt
    }
    Some(out.toIndexedSeq)
  }

  /** Output schema of [[id3TextFrames]]. */
  val id3Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_id", StringType),
    StructField("text", StringType)))

  /** One row per ID3v2 text frame (tag order); payloads without a clean
   * ID3v2 tag contribute nothing. Narrow map, header-only reads. */
  def id3TextFrames(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseId3TextFrames(r.getAs[Array[Byte]](pIdx)) match {
          case Some(fs) => fs.iterator.map { case (fid, t) => Row(id, fid, t) }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(id3Schema))
  }

  /** Deterministic tagged-MP3 shape shared by the writer, the m21 oracle
   * and the spec: an ID3v2.4 (`id%3 == 0`), v2.3 (`id%3 == 1`) or v2.2
   * (`id%3 == 2`, 3-byte frame ids TT2/TP1/TAL/TRK) tag carrying
   * title `title_<id*7 % 1000>`, artist `artist_<id % 50>`, album
   * `album_<id % 20>`, track `<1 + id % 12>`, plus a non-text frame
   * (PRIV, or CNT in v2.2) the walker must stride over; text encodings
   * rotate over each version's SPEC-VALID set — `(id/3) % 3`
   * (ISO-8859-1 / UTF-16 with BOM / UTF-8) for v2.4,
   * `1 - (id/3) % 2` (UTF-16 with BOM / ISO-8859-1) for v2.3, and
   * `(id/3) % 2` (ISO-8859-1 / UCS-2 with BOM) for v2.2;
   * 7 padding bytes; odd v2.2/v2.3 ids apply tag-level
   * UNSYNCHRONISATION (0x00 stuffed after every 0xff — real stuffing
   * wherever a UTF-16 BOM appears), so the oracle-checked family walks
   * the de-unsync path, not only the spec; then the id-shaped MPEG
   * stream of [[syntheticMp3]] with its own optional ID3 replaced by
   * this one. */
  def syntheticTaggedMp3(id: Long): Array[Byte] = {
    val ver = 4 - (id % 3).toInt // 4, 3, 2
    // 0: latin-1, 1: utf-16+BOM, 3: utf-8. Per-version spec-valid sets:
    // ID3v2.3 defines only 0/1 (UTF-8 is a v2.4 addition; the earlier
    // Seq(0,1,3) rotation embedded spec-invalid v2.3 tags that only
    // decoded because the parser is lenient — advisor finding), v2.2
    // only 0/1 (latin-1 / UCS-2 with BOM)
    // v2.3's rotation is INVERTED (1 - …) so odd v2.3 ids (id ≡ 1 mod 6,
    // whose id/3 is always even) land on UTF-16 — the unsync fixtures
    // keep real 0xff-BOM stuffing to de-unsync
    val enc =
      if (ver == 4) Seq(0, 1, 3)(((id / 3) % 3).toInt)
      else if (ver == 3) (1 - (id / 3) % 2).toInt
      else ((id / 3) % 2).toInt
    val frames =
      if (ver == 2) Seq(
        "TT2" -> s"title_${id * 7 % 1000}",
        "TP1" -> s"artist_${id % 50}",
        "TAL" -> s"album_${id % 20}",
        "TRK" -> s"${1 + id % 12}")
      else Seq(
        "TIT2" -> s"title_${id * 7 % 1000}",
        "TPE1" -> s"artist_${id % 50}",
        "TALB" -> s"album_${id % 20}",
        "TRCK" -> s"${1 + id % 12}")
    val bo = new java.io.ByteArrayOutputStream()
    def frame(fid: String, body: Array[Byte]): Unit = {
      bo.write(fid.getBytes("ISO-8859-1"))
      val sz = body.length
      ver match {
        case 4 =>
          bo.write((sz >> 21) & 0x7f); bo.write((sz >> 14) & 0x7f)
          bo.write((sz >> 7) & 0x7f); bo.write(sz & 0x7f)
        case 3 =>
          bo.write((sz >> 24) & 0xff); bo.write((sz >> 16) & 0xff)
          bo.write((sz >> 8) & 0xff); bo.write(sz & 0xff)
        case _ => // v2.2: 24-bit big-endian, 6-byte header, no flags
          bo.write((sz >> 16) & 0xff); bo.write((sz >> 8) & 0xff)
          bo.write(sz & 0xff)
      }
      if (ver >= 3) { bo.write(0); bo.write(0) } // frame flags
      bo.write(body, 0, body.length)
    }
    frames.foreach { case (fid, text) =>
      val tb = new java.io.ByteArrayOutputStream()
      enc match {
        case 0 => tb.write(0); tb.write(text.getBytes("ISO-8859-1"))
        case 1 => tb.write(1); tb.write(0xff); tb.write(0xfe)
          tb.write(text.getBytes("UTF-16LE")); tb.write(0); tb.write(0)
        case _ => tb.write(3); tb.write(text.getBytes("UTF-8")); tb.write(0)
      }
      frame(fid, tb.toByteArray)
    }
    // a non-text frame the walker strides over structurally
    if (ver == 2) frame("CNT", Array[Byte](0, 0, 0, (id % 100).toByte))
    else frame("PRIV", s"owner$id".getBytes("ISO-8859-1"))
    // tag-level UNSYNCHRONISATION on odd v2.2/v2.3 ids: every 0xff gets
    // a 0x00 stuffed after it (bites on the UTF-16 BOMs), the header
    // flag is set, and the synchsafe size covers the STUFFED body — the
    // walker must de-unsync before the frame walk or sizes mis-slice
    val unsync = ver <= 3 && id % 2 == 1
    val rawBody = bo.toByteArray ++ Array.fill(7)(0.toByte) // + padding
    val body =
      if (unsync) rawBody.flatMap(b =>
        if ((b & 0xff) == 0xff) Seq(b, 0.toByte) else Seq(b))
      else rawBody
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); out.write('D'); out.write('3')
    out.write(ver); out.write(0)
    out.write(if (unsync) 0x80 else 0) // flags
    out.write((body.length >> 21) & 0x7f); out.write((body.length >> 14) & 0x7f)
    out.write((body.length >> 7) & 0x7f); out.write(body.length & 0x7f)
    out.write(body, 0, body.length)
    // the MPEG stream, with syntheticMp3's own optional ID3 stripped
    val stream = syntheticMp3(id)
    val skip =
      if (id % 3 == 0) 10 + (17 + id % 23).toInt else 0
    out.write(stream, skip, stream.length - skip)
    out.toByteArray
  }

  /** Executor-side tagged fixtures — the m21 oracle recomputes the frame
   * texts from the id formulas. */
  def syntheticTaggedMp3s(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticTaggedMp3)

  // =====================================================================
  // Synthetic fixture: a VALID VBR MPEG-1 Layer III stream whose frame
  // arithmetic is a pure function of the seed, so a SQL oracle can
  // recompute every frame's offset/size/bitrate from first principles.
  // Layout: [optional ID3v2 of id-derived size][n frames, VBR bitrate
  // per frame, id-derived padding bits]. A walker that assumes CBR or
  // ignores the padding bit produces shifted offsets — the head/tail
  // byte probes catch both.
  // =====================================================================

  /** Deterministic shape shared by the writer, the m16 oracle and the
   * spec: frames `3 + id%6`; MPEG-1 Layer III; sample-rate index `id%3`
   * (44100/48000/32000); per-frame bitrate index `1 + (id + 5i) % 14`
   * (VBR); padding bit `(id + i) % 2`; ID3v2 prefix iff `id % 3 == 0`
   * with synchsafe size `17 + id % 23`; data byte j of frame i is
   * `(id + i*131 + j) & 0xff`. */
  def syntheticShape(id: Long): (Int, Int, Int => Int, Int => Int) = {
    val n = (3 + id % 6).toInt
    val srIdx = (id % 3).toInt
    val brIdx = (i: Int) => (1 + (id + 5L * i) % 14).toInt
    val pad = (i: Int) => ((id + i) % 2).toInt
    (n, srIdx, brIdx, pad)
  }

  def syntheticMp3(id: Long): Array[Byte] = {
    val (n, srIdx, brIdx, pad) = syntheticShape(id)
    val hz = SrV1(srIdx)
    val bo = new java.io.ByteArrayOutputStream()
    if (id % 3 == 0) {
      val sz = (17 + id % 23).toInt
      bo.write('I'); bo.write('D'); bo.write('3')
      bo.write(4); bo.write(0) // version 2.4.0
      bo.write(0)              // flags
      bo.write((sz >> 21) & 0x7f); bo.write((sz >> 14) & 0x7f)
      bo.write((sz >> 7) & 0x7f); bo.write(sz & 0x7f)
      (0 until sz).foreach(j => bo.write((id + j) .toInt & 0x7f))
    }
    (0 until n).foreach { i =>
      val bi = brIdx(i)
      val kbps = BrV1L3(bi)
      val p = pad(i)
      val size = 1152 / 8 * kbps * 1000 / hz + p
      // header: sync(11) | version=3 (MPEG1) | layer=1 (III) | prot=1,
      // then brIdx | srIdx | pad | priv, then channel mode bits
      bo.write(0xff)
      bo.write(0xe0 | (3 << 3) | (1 << 1) | 1) // 0xfb
      bo.write((bi << 4) | (srIdx << 2) | (p << 1))
      bo.write(0x40) // joint stereo, no extensions
      var j = 4
      while (j < size) {
        bo.write(((id + i * 131L + j) & 0xff).toInt); j += 1
      }
    }
    bo.toByteArray
  }

  /** Executor-side synthetic-MP3 fixtures — the m16 oracle recomputes the
   * full frame arithmetic in SQL. */
  def syntheticMp3s(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticMp3)

  // ---- ID3v1 (the trailing 128-byte TAG block) -------------------------

  /** Decoded ID3v1/v1.1 tag. `track` only in v1.1 (comment byte 28 == 0
   * with byte 29 != 0). */
  final case class Id3v1(title: String, artist: String, album: String,
      year: String, comment: String, track: Option[Int], genre: Int)

  /** Decode the trailing 128-byte `TAG` block — the LEGACY tag format
   * that predates [[parseId3TextFrames]]'s ID3v2 and is still the only
   * tag on a large share of crawled MP3s (writers kept appending it for
   * player compatibility; a tag census that only reads ID3v2 undercounts
   * titled files). Fields are fixed-width ISO-8859-1, padded with NUL or
   * spaces; both paddings are trimmed (trailing only — interior spaces
   * are content). None when the payload is shorter than 128 bytes or the
   * last 128 don't start `TAG` (absence, indistinguishable from
   * corruption in v1 — the format has no length or checksum). */
  def parseId3v1(payload: Array[Byte]): Option[Id3v1] = {
    if (payload == null || payload.length < 128) return None
    val off = payload.length - 128
    if (payload(off) != 'T' || payload(off + 1) != 'A' ||
      payload(off + 2) != 'G') return None
    def field(start: Int, len: Int): String = {
      val s = new String(payload, off + start, len, "ISO-8859-1")
      // trim trailing NUL and space padding
      var end = s.length
      while (end > 0 && (s.charAt(end - 1) == '\u0000' ||
        s.charAt(end - 1) == ' ')) end -= 1
      s.substring(0, end)
    }
    val v11 = payload(off + 125) == 0 && payload(off + 126) != 0
    Some(Id3v1(
      field(3, 30), field(33, 30), field(63, 30), field(93, 4),
      if (v11) field(97, 28) else field(97, 30),
      if (v11) Some(payload(off + 126) & 0xff) else None,
      payload(off + 127) & 0xff))
  }

  /** Output schema of [[id3v1Tags]]. */
  val id3v1Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("title", StringType),
    StructField("artist", StringType),
    StructField("album", StringType),
    StructField("year", StringType),
    StructField("comment", StringType),
    StructField("track", IntegerType),
    StructField("genre", IntegerType)))

  /** One row per tagged payload; untagged payloads contribute nothing.
   * Narrow mapPartitions — a 128-byte read per row. */
  def id3v1Tags(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseId3v1(r.getAs[Array[Byte]](pIdx)).map { t =>
          Row(id, t.title, t.artist, t.album, t.year, t.comment,
            t.track.map(Int.box).orNull, t.genre)
        }.iterator
      }
    }(Encoders.row(id3v1Schema))
  }

  /** Deterministic v1-tagged fixture shared by the writer, the m33
   * oracle and the spec: [[syntheticMp3]]'s frames with a trailing
   * ID3v1 block appended — title `title_<id*7 % 1000>` (NUL-padded),
   * artist `artist_<id % 50>` (space-padded, the other legal padding),
   * album `album_<id % 20>`, year `<1970 + id%55>`,
   * comment `c_<id % 100>`; ids with `id%3 == 0` write v1.1 (track
   * `1 + id%30`), the rest v1.0 (30-byte comment, no track); genre
   * `id % 80`; ids with `id%4 == 3` carry NO trailing tag. */
  def syntheticV1TaggedMp3(id: Long): Array[Byte] = {
    val base = syntheticMp3(id)
    if (id % 4 == 3) return base
    val tag = new Array[Byte](128)
    def put(start: Int, len: Int, s: String, spacePad: Boolean): Unit = {
      val b = s.getBytes("ISO-8859-1")
      var i = 0
      while (i < len) {
        tag(start + i) =
          if (i < b.length) b(i) else if (spacePad) ' '.toByte else 0
        i += 1
      }
    }
    tag(0) = 'T'; tag(1) = 'A'; tag(2) = 'G'
    put(3, 30, s"title_${id * 7 % 1000}", spacePad = false)
    put(33, 30, s"artist_${id % 50}", spacePad = true)
    put(63, 30, s"album_${id % 20}", spacePad = false)
    put(93, 4, s"${1970 + id % 55}", spacePad = false)
    if (id % 3 == 0) {
      put(97, 28, s"c_${id % 100}", spacePad = false)
      tag(125) = 0
      tag(126) = (1 + id % 30).toByte
    } else {
      put(97, 30, s"c_${id % 100}", spacePad = false)
    }
    tag(127) = (id % 80).toByte
    base ++ tag
  }

  /** Executor-side v1-tagged fixtures — the m33 oracle replays the tag
   * formulas. */
  def syntheticV1TaggedMp3s(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticV1TaggedMp3)
}
