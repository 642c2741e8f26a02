package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * Zstandard FRAME census (RFC 8878): per-frame content size, window
 * size, dictionary id, checksum flag and block count read from frame
 * and block HEADERS only — no entropy decode, nothing decompressed.
 * Zstd is the de-facto shard compression for training corpora; the
 * lake census needs "how many frames, how big when expanded, which
 * dictionary" without paying for decompression, and the format makes
 * that possible: every block carries a 3-byte header with its
 * compressed size, so a walk can stride frame-to-frame.
 *
 * Facts the walk must honor:
 *   - frame magic 0xFD2FB528 (LE); skippable frames 0x184D2A50–5F (LE)
 *     followed by a LE u32 size to stride;
 *   - frame header descriptor: fcsFlag (bits 6–7), singleSegment
 *     (bit 5), checksumFlag (bit 2), dictIdFlag (bits 0–1); reserved
 *     bit 3 must be 0;
 *   - window descriptor absent when singleSegment (the content size is
 *     the window); otherwise windowSize =
 *     2^(10+exp) + (2^(10+exp)/8)·mantissa;
 *   - frame content size: absent / 1B (singleSegment only) / 2B
 *     (value−256) / 4B / 8B per fcsFlag;
 *   - block header (LE u24): bit0 last, bits1–2 type (0 raw — size
 *     bytes follow; 1 RLE — ONE byte follows, size is the regenerated
 *     count; 2 compressed — size bytes follow; 3 reserved = corrupt);
 *   - a LE u32 xxhash64-low checksum after the last block when
 *     checksumFlag.
 *
 * Narrow mapPartitions — O(headers) per frame, zero exchanges.
 */
object Zstd {

  /** One frame of a (possibly multi-frame) zstd payload. */
  final case class Frame(kind: String, offset: Long, frameBytes: Long,
      contentSize: Option[Long], windowSize: Option[Long],
      dictId: Option[Long], hasChecksum: Boolean, nBlocks: Int)

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def u24le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)

  private def uintLe(b: Array[Byte], i: Int, len: Int): Long = {
    var v = 0L
    var k = len - 1
    while (k >= 0) { v = (v << 8) | (b(i + k) & 0xffL); k -= 1 }
    v
  }

  /**
   * Walk every frame. None on any structural violation: bad magic,
   * reserved descriptor bit, reserved block type, anything overrunning
   * the payload, or trailing garbage after the last frame — strict
   * posture like every walker in the family.
   */
  def parseFrames(payload: Array[Byte]): Option[IndexedSeq[Frame]] = {
    val b = payload
    if (b == null || b.length < 4) return None
    val frames = scala.collection.mutable.ArrayBuffer.empty[Frame]
    var pos = 0
    while (pos < b.length) {
      if (pos + 4 > b.length) return None
      val magic = u32le(b, pos)
      if ((magic & 0xfffffff0L) == 0x184D2A50L) { // skippable
        if (pos + 8 > b.length) return None
        val sz = u32le(b, pos + 4)
        if (pos + 8 + sz > b.length) return None
        frames += Frame("skippable", pos.toLong, 8 + sz, None, None, None,
          hasChecksum = false, nBlocks = 0)
        pos += (8 + sz).toInt
      } else if (magic == 0xFD2FB528L) {
        val start = pos
        var p = pos + 4
        if (p >= b.length) return None
        val fhd = b(p) & 0xff
        if ((fhd & 0x08) != 0) return None // reserved bit
        val singleSegment = (fhd & 0x20) != 0
        val hasChecksum = (fhd & 0x04) != 0
        val dictFlag = fhd & 0x03
        val fcsFlag = (fhd >> 6) & 0x03
        p += 1
        var windowSize: Option[Long] = None
        if (!singleSegment) {
          if (p >= b.length) return None
          val wd = b(p) & 0xff
          val base = 1L << (10 + (wd >> 3))
          windowSize = Some(base + (base / 8) * (wd & 0x07))
          p += 1
        }
        val dictLen = dictFlag match {
          case 0 => 0; case 1 => 1; case 2 => 2; case _ => 4
        }
        if (p + dictLen > b.length) return None
        val dictId = if (dictLen == 0) None else Some(uintLe(b, p, dictLen))
        p += dictLen
        val fcsLen = fcsFlag match {
          case 0 => if (singleSegment) 1 else 0
          case 1 => 2; case 2 => 4; case _ => 8
        }
        if (p + fcsLen > b.length) return None
        val contentSize = fcsLen match {
          case 0 => None
          case 2 => Some(uintLe(b, p, 2) + 256L)
          case l => Some(uintLe(b, p, l))
        }
        p += fcsLen
        // blocks
        var last = false
        var nBlocks = 0
        while (!last) {
          if (p + 3 > b.length) return None
          val bh = u24le(b, p)
          last = (bh & 1) != 0
          val btype = (bh >> 1) & 0x03
          val bsize = bh >>> 3
          p += 3
          val dataLen = btype match {
            case 0 => bsize // raw
            case 1 => 1 // RLE: one byte, bsize is the regenerated count
            case 2 => bsize // compressed
            case _ => return None // reserved
          }
          if (p + dataLen > b.length) return None
          p += dataLen
          nBlocks += 1
        }
        if (hasChecksum) {
          if (p + 4 > b.length) return None
          p += 4
        }
        frames += Frame("zstd", start.toLong, (p - start).toLong,
          contentSize, windowSize, dictId, hasChecksum, nBlocks)
        pos = p
      } else return None
    }
    Some(frames.toIndexedSeq)
  }

  /** Output schema of [[zstdFrames]]. */
  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_no", IntegerType),
    StructField("kind", StringType),
    StructField("offset", LongType),
    StructField("frame_bytes", LongType),
    StructField("content_size", LongType),
    StructField("window_size", LongType),
    StructField("dict_id", LongType),
    StructField("has_checksum", IntegerType),
    StructField("n_blocks", IntegerType)))

  /** One row per frame (file order); non-zstd / structurally unclean
   * payloads contribute nothing. Narrow mapPartitions. */
  def zstdFrames(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseFrames(r.getAs[Array[Byte]](pIdx)) match {
          case Some(fs) => fs.iterator.zipWithIndex.map { case (f, i) =>
            Row(id, i, f.kind, f.offset, f.frameBytes,
              f.contentSize.map(Long.box).orNull,
              f.windowSize.map(Long.box).orNull,
              f.dictId.map(Long.box).orNull,
              if (f.hasChecksum) 1 else 0, f.nBlocks)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(frameSchema))
  }

  /** Deterministic multi-frame fixture shared by the writer, the m32
   * oracle and the spec — all sizes and flags closed-form in (id, f, b):
   *
   *   - `1 + id%3` zstd frames; when `id%4 == 1` a SKIPPABLE frame
   *     (magic low nibble `id%16`, body `8 + id%16` bytes) follows the
   *     first zstd frame;
   *   - frame f: singleSegment when `(id+f)%5 == 0`; window descriptor
   *     byte `exp = (id+f)%10`, `mantissa = (id*3+f)%8` otherwise;
   *     dictIdFlag `(id+f)%4` (0 none / 1B `1+id%200` /
   *     2B `300+id%60000` / 4B `70000+id%100000`); checksum (4 opaque
   *     bytes) when `(id+f)%3 == 0`; content size field: always the
   *     1-byte form when singleSegment, else by `(id+f)%3` — 0 absent,
   *     1 the 4-byte form, 2 the 8-byte form (the 2-byte form needs
   *     values ≥ 256, above this fixture's totals — spec-pinned
   *     separately);
   *   - `1 + (id+f)%2` blocks; block b RAW of `10 + (id*3+f*7+b)%30`
   *     bytes when `(id+f+b)%2 == 0`, else RLE regenerating
   *     `5 + (id+f+b)%20` bytes; content size = Σ regenerated.
   */
  def syntheticZstd(id: Long): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def u32w(v: Long): Unit = {
      bo.write((v & 0xff).toInt); bo.write(((v >> 8) & 0xff).toInt)
      bo.write(((v >> 16) & 0xff).toInt); bo.write(((v >> 24) & 0xff).toInt)
    }
    def writeFrame(f: Int): Unit = {
      val nb = (1 + (id + f) % 2).toInt
      val regens = (0 until nb).map { bk =>
        if ((id + f + bk) % 2 == 0) (10 + (id * 3 + f * 7 + bk) % 30).toInt
        else (5 + (id + f + bk) % 20).toInt
      }
      val total = regens.sum.toLong
      val singleSegment = (id + f) % 5 == 0
      val dictFlag = ((id + f) % 4).toInt
      val hasChecksum = (id + f) % 3 == 0
      val fcsFlag =
        if (singleSegment) 0
        else ((id + f) % 3) match { case 0 => 0; case 1 => 2; case _ => 3 }
      u32w(0xFD2FB528L)
      val fhd = (fcsFlag << 6) | (if (singleSegment) 0x20 else 0) |
        (if (hasChecksum) 0x04 else 0) | dictFlag
      bo.write(fhd)
      if (!singleSegment) {
        val exp = ((id + f) % 10).toInt
        val man = ((id * 3 + f) % 8).toInt
        bo.write((exp << 3) | man)
      }
      dictFlag match {
        case 0 =>
        case 1 => bo.write((1 + id % 200).toInt)
        case 2 =>
          val v = (300 + id % 60000).toInt
          bo.write(v & 0xff); bo.write((v >> 8) & 0xff)
        case _ => u32w(70000L + id % 100000)
      }
      if (singleSegment) bo.write(total.toInt) // 1-byte FCS, total < 256
      else fcsFlag match {
        case 0 =>
        case 2 => u32w(total)
        case _ => u32w(total); u32w(0L)
      }
      regens.zipWithIndex.foreach { case (regen, bk) =>
        val raw = (id + f + bk) % 2 == 0
        val last = bk == nb - 1
        val bh = (if (last) 1 else 0) | ((if (raw) 0 else 1) << 1) |
          (regen << 3)
        bo.write(bh & 0xff); bo.write((bh >> 8) & 0xff)
        bo.write((bh >> 16) & 0xff)
        if (raw)
          (0 until regen).foreach(j =>
            bo.write(((id * 5 + f + j) & 0xff).toInt))
        else bo.write(((id + f + bk) & 0xff).toInt)
      }
      if (hasChecksum) u32w((id * 31 + f) & 0xffffffffL)
    }
    val n = (1 + id % 3).toInt
    writeFrame(0)
    if (id % 4 == 1) { // skippable after the first frame
      u32w(0x184D2A50L + id % 16)
      val sz = (8 + id % 16).toInt
      u32w(sz.toLong)
      (0 until sz).foreach(j => bo.write(((id + j) & 0xff).toInt))
    }
    (1 until n).foreach(writeFrame)
    bo.toByteArray
  }

  /** Executor-side zstd fixtures — the m32 oracle replays the frame
   * formulas. */
  def syntheticZstds(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticZstd)
}
