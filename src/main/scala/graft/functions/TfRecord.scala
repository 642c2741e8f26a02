package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * TFRecord shard census — the TensorFlow training-export container
 * (tensorflow.org TFRecord format spec). Each record is
 * `length:uint64le  masked_crc32c(length):uint32le  data[length]
 * masked_crc32c(data):uint32le`, where the mask is the public
 * `((crc >> 15) | (crc << 17)) + 0xa282ead8` rotation over CRC-32C
 * (Castagnoli — `java.util.zip.CRC32C`). The census walks records,
 * verifies BOTH checksums, and reports per-record offset/size plus
 * head/tail probe bytes into the record data — everything an ingest
 * audit of a 100 TB TFRecord lake needs, with zero example decoding
 * (the protobuf inside is the consumer's business).
 *
 * Strict posture: a truncated header/data/footer, a length that
 * overruns the payload (subtractive bounds — a crafted length near
 * Long.MaxValue must not wrap), or either checksum mismatching → None
 * for the whole payload. An empty payload is a clean empty shard.
 *
 * Narrow mapPartitions — zero exchanges; the walk reads every byte
 * only through the CRC (no copies).
 */
object TfRecord {

  /** One record locator: data begins at `offset + 12`. */
  final case class Rec(offset: Long, dataBytes: Long)

  private def maskedCrc(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(b, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  private def u32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def u64(b: Array[Byte], i: Int): Long =
    (u32(b, i) & 0xffffffffL) | ((u32(b, i + 4) & 0xffffffffL) << 32)

  /**
   * Walk one TFRecord payload. None on any structural or checksum
   * slip; Some(empty) for a zero-byte payload (an empty shard is
   * clean).
   */
  def parseRecords(payload: Array[Byte]): Option[IndexedSeq[Rec]] = {
    val b = payload
    if (b == null) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Rec]
    var pos = 0
    while (pos < b.length) {
      if (b.length - pos < 12) return None // truncated header
      val len = u64(b, pos)
      // subtractive bounds: len + 16 would wrap for crafted lengths
      if (len < 0 || len > (b.length - pos - 16).toLong) return None
      if (u32(b, pos + 8) != maskedCrc(b, pos, 8)) return None
      val dataStart = pos + 12
      if (u32(b, dataStart + len.toInt) != maskedCrc(b, dataStart, len.toInt))
        return None
      out += Rec(pos.toLong, len)
      pos = dataStart + len.toInt + 4
    }
    Some(out.toIndexedSeq)
  }

  /** Output schema of [[tfRecords]]. */
  val recordSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("record_no", IntegerType),
    StructField("offset", LongType),
    StructField("data_bytes", LongType),
    StructField("head_byte", IntegerType),
    StructField("tail_byte", IntegerType)))

  /** One row per CRC-verified record (shard order) with head/tail
   * probes into the record data (−1 for empty records); payloads that
   * are not clean TFRecord streams contribute nothing. Narrow
   * mapPartitions. */
  def tfRecords(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val p = r.getAs[Array[Byte]](pIdx)
        parseRecords(p) match {
          case Some(rs) => rs.iterator.zipWithIndex.map { case (m, i) =>
            val ds = (m.offset + 12).toInt
            val head = if (m.dataBytes > 0) p(ds) & 0xff else -1
            val tail = if (m.dataBytes > 0)
              p(ds + m.dataBytes.toInt - 1) & 0xff else -1
            Row(id, i, m.offset, m.dataBytes, head, tail)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(recordSchema))
  }

  /** One row per CRC-verified record of each `.tfrecord.gz` payload —
   * the [[tfRecords]] walk composed over the verified gzip member
   * locator path ([[Gzip.inflateConcat]]: members located, each
   * re-extracted by (offset, size), bodies concatenated per RFC 1952).
   * TFRecordOptions GZIP is the ubiquitous wire form of TFRecord
   * shards, so the compressed composition is first-class exactly like
   * `.tar.gz` (m44) and `.warc.gz` (m40). Payloads whose gzip layer OR
   * record layer refuses contribute nothing. Narrow mapPartitions. */
  def tfRecordsGz(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val decoded = Gzip.inflateConcat(r.getAs[Array[Byte]](pIdx))
        decoded.flatMap(p => parseRecords(p).map(p -> _)) match {
          case Some((p, rs)) => rs.iterator.zipWithIndex.map { case (m, i) =>
            val ds = (m.offset + 12).toInt
            val head = if (m.dataBytes > 0) p(ds) & 0xff else -1
            val tail = if (m.dataBytes > 0)
              p(ds + m.dataBytes.toInt - 1) & 0xff else -1
            Row(id, i, m.offset, m.dataBytes, head, tail)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(recordSchema))
  }

  /** Deterministic TFRecord fixture written per the public format
   * (lengths, rotation mask, CRC-32C via the JDK): `2 + id%5` records,
   * record k holding `10 + (id*7 + k*13) % 120` bytes whose j-th byte
   * is `(id + k*131 + j) % 256`; record 1 is EMPTY (zero data bytes —
   * legal) when `id%6 == 3`. `id%10 == 7` shards carry a flipped bit
   * inside record 0's data — the data CRC refuses, zero rows (the
   * corruption-detection contract IS the differential). */
  def syntheticTfRecord(id: Long): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def u32w(v: Int): Unit = {
      bo.write(v & 0xff); bo.write((v >> 8) & 0xff)
      bo.write((v >> 16) & 0xff); bo.write((v >> 24) & 0xff)
    }
    val n = (2 + id % 5).toInt
    (0 until n).foreach { k =>
      val m = if (k == 1 && id % 6 == 3) 0 else (10 + (id * 7 + k * 13) % 120).toInt
      val data = Array.tabulate(m)(j => ((id + k * 131 + j) % 256).toByte)
      val lenField = new Array[Byte](8)
      var v = m.toLong
      (0 until 8).foreach { i => lenField(i) = (v & 0xff).toByte; v >>= 8 }
      bo.write(lenField)
      u32w(maskedCrc(lenField, 0, 8))
      bo.write(data)
      u32w(maskedCrc(data, 0, m))
    }
    val bytes = bo.toByteArray
    if (id % 10 == 7 && bytes.length > 20) // flip a bit in record 0's data
      bytes(13) = (bytes(13) ^ 0x20).toByte
    bytes
  }

  /** Executor-side TFRecord fixtures — the m45 oracle replays the
   * record arithmetic. */
  def syntheticTfRecords(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticTfRecord)

  /** Deterministic `.tfrecord.gz` fixture: [[syntheticTfRecord]]'s
   * record stream compressed by the REAL `GZIPOutputStream` encoder —
   * as ONE member, or as TWO members split at the first record
   * boundary when `id%4 == 1` (RFC 1952 concatenation must reassemble
   * the identical stream, so the record oracle is member-layout
   * independent). `id%9 == 8` payloads have their trailing gzip ISIZE
   * byte flipped — the member locator refuses, zero rows; the
   * underlying `id%10 == 7` record-CRC corruption still refuses at the
   * record layer THROUGH the clean gzip layer. */
  def syntheticTfRecordGz(id: Long): Array[Byte] = {
    val raw = syntheticTfRecord(id)
    def gz(b: Array[Byte], off: Int, len: Int): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b, off, len); g.finish(); g.close()
      bo.toByteArray
    }
    val bytes =
      if (id % 4 == 1) {
        // split at the end of record 0: 16 bytes of framing + its data
        // (record 0 is never the empty record — that is k == 1)
        val cut = 16 + (10 + (id * 7) % 120).toInt
        gz(raw, 0, cut) ++ gz(raw, cut, raw.length - cut)
      } else gz(raw, 0, raw.length)
    if (id % 9 == 8 && bytes.length > 0)
      bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x55).toByte
    bytes
  }

  /** Executor-side `.tfrecord.gz` fixtures — the m47 oracle replays
   * the m45 record arithmetic minus the corrupted-gzip ids. */
  def syntheticTfRecordGzs(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticTfRecordGz)
}
