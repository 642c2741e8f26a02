package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * XZ stream/block census — metadata-only, like the zstd frame walk:
 * uncompressed sizes come from each stream's INDEX, so capacity
 * planning for an `.xz` shard lake never touches LZMA2 data. The walk
 * is anchored at the END (the xz random-access design): stream footer
 * → index → block headers, then every block header is forward-verified
 * against its index record.
 *
 * Facts honored (The .xz File Format spec, tukaani.org):
 *   - stream = header (magic FD 37 7A 58 5A 00, 2 flag bytes, CRC32)
 *     + blocks + index + footer (CRC32, backward size, the SAME flag
 *     bytes, magic YZ); concatenated streams and 4-aligned null
 *     stream padding between them are legal;
 *   - flags: first byte 0, second the check id (0 none, 1 CRC32,
 *     4 CRC64, 10 SHA-256); header and footer flags must agree;
 *   - index: indicator 0x00, record count, (unpadded, uncompressed)
 *     varint pairs, null padding to 4, CRC32 — all three structure
 *     CRCs (header, index, footer) are verified;
 *   - block header: size byte ((real+1)·4 ≠ 0), flags (filter count,
 *     optional compressed/uncompressed size varints), per-filter id +
 *     properties, null padding, CRC32 (verified); a declared
 *     uncompressed size must equal the index record's;
 *   - unpadded block size covers header + data + check (4/8/32 bytes
 *     by check id); blocks pad to 4 with nulls;
 *   - varints are 7-bit little-endian, ≤ 9 bytes, no dangling
 *     continuation.
 *
 * Strict posture: any CRC mismatch, flag disagreement, padding that
 * is not null, a block header contradicting its index record, or
 * leftover bytes that are not legal stream padding → None.
 *
 * Narrow mapPartitions — zero exchanges.
 */
object Xz {

  /** One block, file order. `unpadded` = header + data + check. */
  final case class Block(stream: Int, block: Int, unpadded: Long,
      uncompressed: Long, check: String)

  private final class Malformed extends RuntimeException

  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def crc32(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b, off, len)
    c.getValue
  }

  /** xz multibyte integer at `pos`; returns (value, next pos). */
  private def varint(b: Array[Byte], pos: Int, end: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    var p = pos
    while (i < 9) {
      if (p >= end) throw new Malformed
      val x = b(p) & 0xff
      p += 1
      v |= (x & 0x7fL) << (7 * i)
      if ((x & 0x80) == 0) {
        if (x == 0 && i > 0) throw new Malformed // non-minimal form
        return (v, p)
      }
      i += 1
    }
    throw new Malformed
  }

  private def checkName(id: Int): String = id match {
    case 0 => "none"
    case 1 => "crc32"
    case 4 => "crc64"
    case 10 => "sha256"
    case _ => throw new Malformed // reserved ids: refuse
  }

  private def checkSize(id: Int): Int = id match {
    case 0 => 0
    case 1 => 4
    case 4 => 8
    case _ => 32
  }

  private def ceil4(v: Long): Long = (v + 3) & ~3L

  /** Verify one block header at `pos` against its index record;
   * returns nothing (throws on contradiction). */
  private def verifyBlockHeader(b: Array[Byte], pos: Int, end: Int,
      unpadded: Long, uncomp: Long, checkId: Int): Unit = {
    if (pos >= end) throw new Malformed
    val hsB = b(pos) & 0xff
    if (hsB == 0) throw new Malformed // 0x00 is the index indicator
    val hSize = (hsB + 1) * 4
    if (hSize > end - pos) throw new Malformed
    if (crc32(b, pos, hSize - 4) != u32(b, pos + hSize - 4))
      throw new Malformed
    var p = pos + 1
    val flags = b(p) & 0xff; p += 1
    if ((flags & 0x3c) != 0) throw new Malformed // reserved bits
    val nFilters = (flags & 3) + 1
    var declaredComp = -1L
    var declaredUncomp = -1L
    if ((flags & 0x40) != 0) {
      val r = varint(b, p, pos + hSize - 4); declaredComp = r._1; p = r._2
    }
    if ((flags & 0x80) != 0) {
      val r = varint(b, p, pos + hSize - 4); declaredUncomp = r._1; p = r._2
    }
    var i = 0
    while (i < nFilters) {
      val id = varint(b, p, pos + hSize - 4); p = id._2
      val ps = varint(b, p, pos + hSize - 4); p = ps._2
      if (ps._1 < 0 || ps._1 > (pos + hSize - 4) - p) throw new Malformed
      p += ps._1.toInt
      i += 1
    }
    while (p < pos + hSize - 4) { // header padding must be null
      if (b(p) != 0) throw new Malformed
      p += 1
    }
    if (declaredUncomp >= 0 && declaredUncomp != uncomp) throw new Malformed
    val chk = checkSize(checkId)
    val dataBytes = unpadded - hSize - chk
    if (dataBytes <= 0) throw new Malformed
    if (declaredComp >= 0 && declaredComp != dataBytes) throw new Malformed
    // layout: header + data + NULL padding (to 4) + check — unpadded
    // size excludes only the padding, and every check size is a
    // multiple of 4, so total block size is ceil4(unpadded)
    val padded = ceil4(unpadded)
    if (padded > end - pos) throw new Malformed
    var q = pos + hSize + dataBytes.toInt
    val checkStart = pos + padded.toInt - chk
    while (q < checkStart) {
      if (b(q) != 0) throw new Malformed
      q += 1
    }
  }

  /**
   * Walk every stream (back to front, as xz readers do), emitting
   * blocks in FILE order. None on malformation as documented.
   */
  def parseBlocks(payload: Array[Byte]): Option[IndexedSeq[Block]] = {
    val b = payload
    if (b == null || b.length < 32) return None
    try {
      val streams = scala.collection.mutable.ArrayBuffer
        .empty[IndexedSeq[(Long, Long, String)]]
      var end = b.length
      while (end > 0) {
        // stream padding: 4-aligned null groups between/after streams —
        // a footer always ends in the non-null `YZ`, so stripping
        // trailing 4-null groups can never eat into a stream (a
        // non-multiple-of-4 null tail survives and fails the footer
        // magic check below, the strict refusal)
        var pe = end
        while (pe >= 4 && b(pe - 1) == 0 && b(pe - 2) == 0 &&
          b(pe - 3) == 0 && b(pe - 4) == 0) pe -= 4
        end = pe
        if (end == 0) { // the whole remainder was padding
          if (streams.isEmpty) throw new Malformed
        } else {
          if (end < 32) throw new Malformed
          // ---- footer ----
          if (b(end - 2) != 'Y' || b(end - 1) != 'Z') throw new Malformed
          val fCrc = u32(b, end - 12)
          if (crc32(b, end - 8, 6) != fCrc) throw new Malformed
          val backward = u32(b, end - 8)
          val fFlag0 = b(end - 4)
          val fCheck = b(end - 3) & 0xff
          if (fFlag0 != 0) throw new Malformed
          val check = checkName(fCheck)
          val indexSize = (backward + 1) * 4
          if (indexSize > end - 12 - 12) throw new Malformed
          val iStart = (end - 12 - indexSize).toInt
          // ---- index ----
          if (b(iStart) != 0) throw new Malformed
          if (crc32(b, iStart, indexSize.toInt - 4) !=
            u32(b, end - 12 - 4)) throw new Malformed
          var p = iStart + 1
          val iLim = end - 12 - 4
          val nRec = varint(b, p, iLim); p = nRec._2
          if (nRec._1 < 0 || nRec._1 > (iLim - p) / 2) throw new Malformed
          val recs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          var k = 0L
          var blocksBytes = 0L
          while (k < nRec._1) {
            val up = varint(b, p, iLim); p = up._2
            val uc = varint(b, p, iLim); p = uc._2
            // cap each size at the payload length BEFORE summing:
            // crafted near-MaxValue records would wrap ceil4/blocksBytes
            // and could slip past the sStart sign check
            if (up._1 <= 0 || uc._1 < 0 || up._1 > b.length.toLong)
              throw new Malformed
            recs += ((up._1, uc._1))
            blocksBytes += ceil4(up._1)
            if (blocksBytes > iStart.toLong) throw new Malformed
            k += 1
          }
          while (p < iLim) { // index padding must be null
            if (b(p) != 0) throw new Malformed
            p += 1
          }
          // ---- header + forward block verification ----
          val sStart = iStart - blocksBytes - 12
          if (sStart < 0) throw new Malformed
          val s = sStart.toInt
          if (b(s) != 0xfd.toByte || b(s + 1) != '7' || b(s + 2) != 'z' ||
            b(s + 3) != 'X' || b(s + 4) != 'Z' || b(s + 5) != 0)
            throw new Malformed
          if (b(s + 6) != fFlag0 || (b(s + 7) & 0xff) != fCheck)
            throw new Malformed // header/footer flag agreement
          if (crc32(b, s + 6, 2) != u32(b, s + 8)) throw new Malformed
          var bp = s + 12
          recs.foreach { case (up, uc) =>
            verifyBlockHeader(b, bp, iStart, up, uc, fCheck)
            bp += ceil4(up).toInt
          }
          if (bp != iStart) throw new Malformed
          streams += recs.toIndexedSeq.map { case (up, uc) =>
            (up, uc, check)
          }
          end = s
        }
      }
      if (streams.isEmpty) return None
      val ordered = streams.reverse // walked back-to-front
      Some(ordered.iterator.zipWithIndex.flatMap { case (recs, si) =>
        recs.iterator.zipWithIndex.map { case ((up, uc, ck), bi) =>
          Block(si, bi, up, uc, ck)
        }
      }.toIndexedSeq)
    } catch {
      case _: Malformed => None
      case _: IndexOutOfBoundsException => None // belt and braces
    }
  }

  /** Output schema of [[xzBlocks]]. */
  val blockSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("stream_no", IntegerType),
    StructField("block_no", IntegerType),
    StructField("unpadded_bytes", LongType),
    StructField("uncomp_bytes", LongType),
    StructField("check", StringType)))

  /** One row per block of each clean `.xz` payload (file order);
   * other payloads contribute nothing. Narrow mapPartitions. */
  def xzBlocks(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseBlocks(r.getAs[Array[Byte]](pIdx)) match {
          case Some(bs) => bs.iterator.map { blk =>
            Row(id, blk.stream, blk.block, blk.unpadded, blk.uncompressed,
              blk.check)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(blockSchema))
  }

  /** Deterministic `.xz` fixture written by the REAL encoder
   * (org.tukaani.xz `XZOutputStream`): `1 + id%3` blocks (forced with
   * `endBlock()`), block k holding `30 + (id*3 + k*7) % 100` bytes of
   * `(id + k*17 + j) % 256`; the integrity check rotates
   * CRC32/CRC64/NONE by id%3. `id%5 == 3` payloads are TWO
   * concatenated streams (the second a single block of
   * `20 + id % 50` bytes) separated by 4 null bytes of stream
   * padding. `id%8 == 6` payloads carry a flipped bit inside the
   * index CRC — the walk refuses, zero rows. */
  def syntheticXz(id: Long): Array[Byte] = {
    import org.tukaani.xz.{LZMA2Options, XZOutputStream, XZ}
    def oneStream(blocks: Seq[Array[Byte]], check: Int): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val opts = new LZMA2Options(0)
      val xz = new XZOutputStream(bo, opts, check)
      blocks.zipWithIndex.foreach { case (blk, i) =>
        xz.write(blk)
        if (i < blocks.size - 1) xz.endBlock()
      }
      xz.finish(); xz.close()
      bo.toByteArray
    }
    val check = (id % 3) match {
      case 0 => XZ.CHECK_CRC32
      case 1 => XZ.CHECK_CRC64
      case _ => XZ.CHECK_NONE
    }
    val nBlocks = (1 + id % 3).toInt
    val blocks = (0 until nBlocks).map { k =>
      Array.tabulate((30 + (id * 3 + k * 7) % 100).toInt)(j =>
        ((id + k * 17 + j) % 256).toByte)
    }
    val first = oneStream(blocks, check)
    val bytes =
      if (id % 5 == 3) {
        val second = oneStream(Seq(Array.tabulate((20 + id % 50).toInt)(j =>
          ((id * 3 + j) % 256).toByte)), check)
        first ++ new Array[Byte](4) ++ second
      } else first
    if (id % 8 == 6) { // flip a bit in the first stream's index CRC
      val out = bytes.clone()
      out(first.length - 13) = (out(first.length - 13) ^ 0x10).toByte
      out
    } else bytes
  }

  /** Executor-side `.xz` fixtures — the m46 oracle replays the block
   * shapes. */
  def syntheticXzs(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticXz)
}
