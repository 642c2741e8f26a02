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

  /** Deterministic fixture shape shared by the writer, the m22 oracle and
   * the spec: rate 44100/48000/96000/22050 by `id%4`, channels `1+id%3`,
   * bits 16/24/8 by `id%3`, total samples `1000 + id%9999`; a
   * VORBIS_COMMENT block of `10 + id%30` bytes to stride over; then
   * `20 + id%40` opaque frame bytes. */
  def syntheticFlac(id: Long): Array[Byte] = {
    val rate = Seq(44100, 48000, 96000, 22050)((id % 4).toInt)
    val channels = (1 + id % 3).toInt
    val bps = Seq(16, 24, 8)((id % 3).toInt)
    val total = 1000L + id % 9999
    val bo = new java.io.ByteArrayOutputStream()
    bo.write('f'); bo.write('L'); bo.write('a'); bo.write('C')
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
}
