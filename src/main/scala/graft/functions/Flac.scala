package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * FLAC STREAMINFO decode (the format spec's mandatory first metadata
 * block): sample rate, channel count, bits per sample and total sample
 * count straight from the header — the lossless-audio member of the
 * typed-metadata family ([[Mp4]] dims, [[Ogg]] identification headers,
 * [[Mp3]] ID3 tags). Header-only reads, no frame decode.
 *
 * Reference semantics: binary media columns are opaque payloads to
 * census and project typed metadata from (`/root/reference` multimodal
 * suite); FLAC is the standard archival-audio format in crawled corpora.
 * Narrow mapPartitions — zero exchanges, O(metadata) per row.
 */
object Flac {

  /** Decoded STREAMINFO fields. */
  final case class StreamInfo(sampleRate: Int, channels: Int,
      bitsPerSample: Int, totalSamples: Long, minBlock: Int, maxBlock: Int)

  /**
   * Decode the STREAMINFO block. None unless the payload starts with
   * `fLaC` followed by a STREAMINFO (type 0) first metadata block of the
   * mandated 34 bytes — the spec requires STREAMINFO first, so anything
   * else is a corrupt or non-FLAC payload, never a field-guessing
   * opportunity. Later metadata blocks (padding, VORBIS_COMMENT, …) are
   * bounds-checked structurally via the is-last chain.
   */
  def parseStreamInfo(payload: Array[Byte]): Option[StreamInfo] = {
    if (payload == null || payload.length < 4 + 4 + 34) return None
    if (payload(0) != 'f' || payload(1) != 'L' || payload(2) != 'a' ||
        payload(3) != 'C') return None
    def u8(i: Int) = payload(i) & 0xff
    // first block header: is-last bit + 7-bit type, 24-bit size
    val h = u8(4)
    if ((h & 0x7f) != 0) return None // STREAMINFO must come first
    val size = (u8(5) << 16) | (u8(6) << 8) | u8(7)
    if (size != 34) return None
    val b = 8 // STREAMINFO body start
    val minBlock = (u8(b) << 8) | u8(b + 1)
    val maxBlock = (u8(b + 2) << 8) | u8(b + 3)
    // bytes b+10..b+17: 20-bit rate | 3-bit channels-1 | 5-bit bps-1 |
    // 36-bit total samples, big-endian packed
    val rate = (u8(b + 10) << 12) | (u8(b + 11) << 4) | (u8(b + 12) >> 4)
    val channels = ((u8(b + 12) >> 1) & 0x7) + 1
    val bps = (((u8(b + 12) & 0x1) << 4) | (u8(b + 13) >> 4)) + 1
    val total = ((u8(b + 13) & 0xfL) << 32) | ((u8(b + 14) & 0xffL) << 24) |
      ((u8(b + 15) & 0xffL) << 16) | ((u8(b + 16) & 0xffL) << 8) |
      (u8(b + 17) & 0xffL)
    if (rate == 0) return None // spec: 0 is invalid
    // walk the remaining metadata chain: every block must fit
    var pos = 4 + 4 + 34
    var last = (h & 0x80) != 0
    while (!last) {
      if (pos + 4 > payload.length) return None
      val bh = u8(pos)
      val bsz = (u8(pos + 1) << 16) | (u8(pos + 2) << 8) | u8(pos + 3)
      if (pos + 4L + bsz > payload.length) return None
      last = (bh & 0x80) != 0
      pos += 4 + bsz
    }
    Some(StreamInfo(rate, channels, bps, total, minBlock, maxBlock))
  }

  /** Output schema of [[flacInfo]]. */
  val infoSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("total_samples", LongType),
    StructField("duration_ms", LongType)))

  /** One row per payload with its STREAMINFO projection plus the derived
   * duration; non-FLAC / corrupt payloads are dropped. Narrow map. */
  def flacInfo(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseStreamInfo(r.getAs[Array[Byte]](pIdx)).map { si =>
          Row(id, si.sampleRate, si.channels, si.bitsPerSample,
            si.totalSamples, si.totalSamples * 1000L / si.sampleRate)
        }.iterator
      }
    }(Encoders.row(infoSchema))
  }

  /** Walk the metadata chain and decode the VORBIS_COMMENT block — the
   * tag-metadata side of a FLAC crawl (TITLE/ARTIST/ALBUM), completing
   * the audio-tag family ([[Mp3.parseId3TextFrames]] for MP3,
   * [[Ogg.parseComments]] for .ogg/.opus). The block body is the exact
   * Vorbis comment structure Ogg carries (vendor string + N
   * length-prefixed UTF-8 `KEY=value` comments, all lengths
   * little-endian) with no magic and NO framing bit — the FLAC format
   * spec embeds it raw — so the decode is [[Ogg.decodeCommentBody]]
   * with `framed = false`.
   *
   * None when the payload is not structurally clean FLAC ([[parseStreamInfo]]'s
   * contract), carries no VORBIS_COMMENT block (tagless is an absence,
   * not corruption), carries MORE than one (the spec allows at most
   * one — a duplicate is corruption, never a pick-one guess), or the
   * block body is malformed (overrunning length, missing `=`, invalid
   * UTF-8, key bytes outside 0x20–0x7D-minus-`=`). */
  def parseComments(payload: Array[Byte]): Option[
      (String, IndexedSeq[(String, String)])] = {
    if (parseStreamInfo(payload).isEmpty) return None
    // re-walk the chain to find the comment. parseStreamInfo already
    // validated it structurally, but the stride is bounds-checked HERE
    // TOO: relying on the other method's walk staying exactly as strict
    // is an implicit cross-function invariant that could drift into an
    // executor ArrayIndexOutOfBounds (review finding)
    var pos = 4
    var last = false
    var found: Option[(Int, Int)] = None // (body offset, size)
    var dup = false
    while (!last) {
      if (pos + 4 > payload.length) return None
      val h = payload(pos) & 0xff
      val bsz = ((payload(pos + 1) & 0xff) << 16) |
        ((payload(pos + 2) & 0xff) << 8) | (payload(pos + 3) & 0xff)
      if (pos + 4L + bsz > payload.length) return None
      if ((h & 0x7f) == 4) {
        if (found.isDefined) dup = true
        found = Some((pos + 4, bsz))
      }
      last = (h & 0x80) != 0
      pos += 4 + bsz
    }
    if (dup) None
    else found.flatMap { case (off, sz) =>
      // decode within the BLOCK's bounds only: a comment body that
      // says it is longer than its block is malformed even when the
      // trailing frame bytes would happen to satisfy the lengths
      val body = java.util.Arrays.copyOfRange(payload, off, off + sz)
      Ogg.decodeCommentBody(body, 0, framed = false)
    }
  }

  private def writeStreamInfo(bo: java.io.ByteArrayOutputStream,
      id: Long): Unit = {
    val rate = Seq(44100, 48000, 96000, 22050)((id % 4).toInt)
    val channels = (1 + id % 3).toInt
    val bps = Seq(16, 24, 8)((id % 3).toInt)
    val total = 1000L + id % 9999
    bo.write(0x00) // STREAMINFO, not last
    bo.write(0); bo.write(0); bo.write(34)
    bo.write(16 >> 8); bo.write(16 & 0xff) // min block 16
    bo.write(16 >> 8); bo.write(16 & 0xff) // max block 16
    (0 until 6).foreach(_ => bo.write(0))  // min/max frame size
    bo.write((rate >> 12) & 0xff)
    bo.write((rate >> 4) & 0xff)
    bo.write(((rate & 0xf) << 4) | ((channels - 1) << 1) | ((bps - 1) >> 4))
    bo.write((((bps - 1) & 0xf) << 4) | ((total >> 32) & 0xf).toInt)
    bo.write(((total >> 24) & 0xff).toInt); bo.write(((total >> 16) & 0xff).toInt)
    bo.write(((total >> 8) & 0xff).toInt); bo.write((total & 0xff).toInt)
    (0 until 16).foreach(_ => bo.write(0)) // MD5
  }

  /** Deterministic fixture shape shared by the writer, the m22 oracle and
   * the spec: rate 44100/48000/96000/22050 by `id%4`, channels `1+id%3`,
   * bits 16/24/8 by `id%3`, total samples `1000 + id%9999`; a
   * VORBIS_COMMENT block of `10 + id%30` bytes to stride over; then
   * `20 + id%40` opaque frame bytes. */
  def syntheticFlac(id: Long): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    bo.write('f'); bo.write('L'); bo.write('a'); bo.write('C')
    writeStreamInfo(bo, id)
    // a VORBIS_COMMENT block (type 4, LAST) the walker strides over
    val vc = (10 + id % 30).toInt
    bo.write(0x80 | 4)
    bo.write((vc >> 16) & 0xff); bo.write((vc >> 8) & 0xff); bo.write(vc & 0xff)
    (0 until vc).foreach(j => bo.write(((id + j) & 0xff).toInt))
    // opaque frame bytes (not parsed)
    (0 until (20 + id % 40).toInt).foreach(j =>
      bo.write(((id * 3 + j) & 0xff).toInt))
    bo.toByteArray
  }

  /** Executor-side FLAC fixtures — the m22 oracle replays the shape. */
  def syntheticFlacs(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticFlac)

  /** Output schema of [[flacComments]]. */
  val commentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("vendor", StringType),
    StructField("comment_no", IntegerType),
    StructField("key", StringType),
    StructField("value", StringType)))

  /** One row per user comment (block order) with the vendor string;
   * payloads without a clean single VORBIS_COMMENT block contribute
   * nothing. Narrow mapPartitions — header-only reads, zero exchanges,
   * the same scale posture as every media walk in the family. */
  def flacComments(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseComments(r.getAs[Array[Byte]](pIdx)) match {
          case Some((vendor, cs)) => cs.iterator.zipWithIndex.map {
            case ((k, v), i) => Row(id, vendor, i, k, v)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(commentSchema))
  }

  /** Deterministic TAGGED-FLAC fixture shared by the writer, the m25
   * oracle and the spec: [[writeStreamInfo]]'s STREAMINFO, then —
   * multi-block, so the walk is exercised on both sides of the tag — a
   * PADDING block of `5 + id%20` zero bytes when `id%3 == 0`, the
   * VORBIS_COMMENT block (vendor `graft <id%7>`, comments
   * TITLE=`title_<id*7 % 1000>`, ARTIST=`artist_<id % 50>`,
   * ALBUM=`album_<id % 20>`, TRACKNUMBER=`<1 + id%12>`,
   * DESCRIPTION=`ünïcode_<id%10>` — multi-byte UTF-8 on the strict
   * decode path), and an APPLICATION block of `4 + id%16` opaque bytes
   * when `id%4 == 1`; ids with `id%5 == 4` carry NO comment block
   * (tagless absence, not corruption); then `20 + id%40` frame bytes. */
  def syntheticCommentedFlac(id: Long): Array[Byte] = {
    def block(tpe: Int, body: Array[Byte], last: Boolean): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      bo.write((if (last) 0x80 else 0) | tpe)
      bo.write((body.length >> 16) & 0xff); bo.write((body.length >> 8) & 0xff)
      bo.write(body.length & 0xff)
      bo.write(body, 0, body.length)
      bo.toByteArray
    }
    def commentBody(): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      def u32(v: Int): Unit = {
        bo.write(v & 0xff); bo.write((v >> 8) & 0xff)
        bo.write((v >> 16) & 0xff); bo.write((v >> 24) & 0xff)
      }
      def str(s: String): Unit = {
        val b = s.getBytes("UTF-8"); u32(b.length); bo.write(b, 0, b.length)
      }
      str(s"graft ${id % 7}")
      val cs = Seq(
        s"TITLE=title_${id * 7 % 1000}",
        s"ARTIST=artist_${id % 50}",
        s"ALBUM=album_${id % 20}",
        s"TRACKNUMBER=${1 + id % 12}",
        s"DESCRIPTION=ünïcode_${id % 10}")
      u32(cs.length)
      cs.foreach(str)
      bo.toByteArray
    }
    val tailBlocks = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    if (id % 3 == 0) tailBlocks += ((1, new Array[Byte]((5 + id % 20).toInt)))
    if (id % 5 != 4) tailBlocks += ((4, commentBody()))
    if (id % 4 == 1) tailBlocks += ((2,
      Array.tabulate((4 + id % 16).toInt)(j => ((id * 5 + j) & 0xff).toByte)))
    val bo = new java.io.ByteArrayOutputStream()
    bo.write('f'); bo.write('L'); bo.write('a'); bo.write('C')
    if (tailBlocks.isEmpty) {
      // rewrite STREAMINFO as the LAST block: flip the is-last bit
      val si = new java.io.ByteArrayOutputStream()
      writeStreamInfo(si, id)
      val b = si.toByteArray; b(0) = (b(0) | 0x80).toByte
      bo.write(b, 0, b.length)
    } else {
      writeStreamInfo(bo, id)
      tailBlocks.zipWithIndex.foreach { case ((tpe, body), i) =>
        val b = block(tpe, body, last = i == tailBlocks.length - 1)
        bo.write(b, 0, b.length)
      }
    }
    (0 until (20 + id % 40).toInt).foreach(j =>
      bo.write(((id * 3 + j) & 0xff).toInt))
    bo.toByteArray
  }

  /** Executor-side tagged-FLAC fixtures — the m25 oracle replays the
   * comment formulas. */
  def syntheticCommentedFlacs(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticCommentedFlac)
}
