package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * ZIP central-directory walk: entry name, method, sizes, CRC and local
 * offset straight from the end-of-central-directory record and the CD
 * entries — NO decompression. Crawled corpora carry ZIPs both bare and
 * as document containers (epub/docx/jar are all ZIP); the census pass
 * needs the member listing without inflating anything, the exact
 * analog of [[Multimodal]]'s tar-shard manifest for the other archive
 * family.
 *
 * Strict-structure posture like every media walker: EOCD must close
 * the file exactly (its comment length reaching end-of-payload), the
 * CD walk must consume exactly the EOCD-declared size and count, and
 * every entry's local-header offset must point at a real local header
 * signature. Multi-disk archives are rejected (disk numbers != 0).
 * Spanned/ZIP64 archives are out of scope (rejected structurally:
 * 0xffff/0xffffffff sentinel fields fail the exact-walk checks).
 *
 * Narrow mapPartitions — O(directory) reads, zero exchanges.
 */
object Zip {

  /** One central-directory entry. */
  final case class Entry(name: String, method: Int, compSize: Long,
      uncompSize: Long, crc32: Long, localOffset: Long)

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /**
   * Parse the central directory. None unless the payload is a
   * structurally clean single-disk ZIP as documented above. Entry
   * names are UTF-8 decoded (the flags bit 11 / cp437 legacy split is
   * deliberately collapsed to UTF-8 — a census key, not a re-writer).
   */
  def parseCentralDirectory(payload: Array[Byte]): Option[IndexedSeq[Entry]] = {
    val b = payload
    if (b == null || b.length < 22) return None
    // EOCD: scan back over a possible comment (<= 64k) for PK\5\6 whose
    // declared comment length lands exactly on end-of-payload
    var eocd = -1
    var i = b.length - 22
    val stop = math.max(0, b.length - 22 - 0xffff)
    while (i >= stop && eocd < 0) {
      if (b(i) == 'P' && b(i + 1) == 'K' && b(i + 2) == 5 && b(i + 3) == 6 &&
        i + 22 + u16(b, i + 20) == b.length) eocd = i
      i -= 1
    }
    if (eocd < 0) return None
    if (u16(b, eocd + 4) != 0 || u16(b, eocd + 6) != 0) return None // disks
    val cdCount = u16(b, eocd + 10)
    if (u16(b, eocd + 8) != cdCount) return None // this-disk count
    val cdSize = u32(b, eocd + 12)
    val cdOff = u32(b, eocd + 16)
    if (cdOff + cdSize != eocd.toLong) return None // CD must abut EOCD
    val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]
    var pos = cdOff.toInt
    val cdEnd = eocd
    var k = 0
    while (k < cdCount) {
      if (pos + 46 > cdEnd) return None
      if (u32(b, pos) != 0x02014b50L) return None
      val method = u16(b, pos + 10)
      val crc = u32(b, pos + 16)
      val csize = u32(b, pos + 20)
      val usize = u32(b, pos + 24)
      val nameLen = u16(b, pos + 28)
      val extraLen = u16(b, pos + 30)
      val commentLen = u16(b, pos + 32)
      if (u16(b, pos + 34) != 0) return None // disk-number start
      val localOff = u32(b, pos + 42)
      if (pos + 46 + nameLen + extraLen + commentLen > cdEnd) return None
      val name = new String(b, pos + 46, nameLen, "UTF-8")
      // stored entries must agree on both sizes
      if (method == 0 && csize != usize) return None
      // the local header must really be there
      if (localOff + 4 > b.length || u32(b, localOff.toInt) != 0x04034b50L)
        return None
      entries += Entry(name, method, csize, usize, crc, localOff)
      pos += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    if (pos != cdEnd) return None // walk must consume exactly cdSize
    Some(entries.toIndexedSeq)
  }

  /** Output schema of [[zipEntries]]. */
  val entrySchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("entry_no", IntegerType),
    StructField("name", StringType),
    StructField("method", StringType),
    StructField("comp_size", LongType),
    StructField("uncomp_size", LongType),
    StructField("crc32", LongType),
    StructField("local_offset", LongType)))

  private def methodName(m: Int): String = m match {
    case 0 => "stored"
    case 8 => "deflated"
    case 12 => "bzip2"
    case 14 => "lzma"
    case 93 => "zstd"
    case other => s"method_$other"
  }

  /** One row per central-directory entry (directory order); payloads
   * that are not clean single-disk ZIPs contribute nothing. Narrow
   * mapPartitions. */
  def zipEntries(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseCentralDirectory(r.getAs[Array[Byte]](pIdx)) match {
          case Some(es) => es.iterator.zipWithIndex.map { case (e, i) =>
            Row(id, i, e.name, methodName(e.method), e.compSize,
              e.uncompSize, e.crc32, e.localOffset)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(entrySchema))
  }

  /** Deterministic ZIP fixture shared by the writer, the m31 oracle and
   * the spec: `1 + id%4` entries named `f<id>_<j>.txt`; even j stored
   * (`comp = uncomp = 20 + (id+j)%30`), odd j "deflated" with opaque
   * compressed bytes (`comp = 10 + (id+j*7)%40`,
   * `uncomp = 50 + (id*3+j)%100`); crc32 field
   * `(id*2654435761 + j*40503) & 0xffffffff` (a field replay — nothing
   * decompresses, so the census extracts, never verifies); each local
   * header is 30 + name + comp bytes with no extra fields, so
   * `local_offset(j)` is the running sum; a ZIP comment `zc<id%10>`
   * when `id%3 == 0` (the EOCD back-scan must handle both). */
  def syntheticZip(id: Long): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def u16w(v: Int): Unit = { bo.write(v & 0xff); bo.write((v >> 8) & 0xff) }
    def u32w(v: Long): Unit = {
      bo.write((v & 0xff).toInt); bo.write(((v >> 8) & 0xff).toInt)
      bo.write(((v >> 16) & 0xff).toInt); bo.write(((v >> 24) & 0xff).toInt)
    }
    val n = (1 + id % 4).toInt
    final case class E(name: Array[Byte], method: Int, csize: Int,
        usize: Int, crc: Long, off: Int)
    var off = 0
    val es = (0 until n).map { j =>
      val name = s"f${id}_$j.txt".getBytes("UTF-8")
      val stored = j % 2 == 0
      val csize = if (stored) (20 + (id + j) % 30).toInt
        else (10 + (id + j * 7) % 40).toInt
      val usize = if (stored) csize else (50 + (id * 3 + j) % 100).toInt
      val crc = (id * 2654435761L + j * 40503L) & 0xffffffffL
      val e = E(name, if (stored) 0 else 8, csize, usize, crc, off)
      off += 30 + name.length + csize
      e
    }
    es.foreach { e => // local headers + data
      u32w(0x04034b50L); u16w(20); u16w(0); u16w(e.method)
      u16w(0); u16w(0) // time, date
      u32w(e.crc); u32w(e.csize.toLong); u32w(e.usize.toLong)
      u16w(e.name.length); u16w(0)
      bo.write(e.name, 0, e.name.length)
      (0 until e.csize).foreach(j => bo.write(((id * 7 + j) & 0xff).toInt))
    }
    val cdOff = bo.size()
    es.foreach { e => // central directory
      u32w(0x02014b50L); u16w(20); u16w(20); u16w(0); u16w(e.method)
      u16w(0); u16w(0)
      u32w(e.crc); u32w(e.csize.toLong); u32w(e.usize.toLong)
      u16w(e.name.length); u16w(0); u16w(0)
      u16w(0); u16w(0); u32w(0)
      u32w(e.off.toLong)
      bo.write(e.name, 0, e.name.length)
    }
    val cdSize = bo.size() - cdOff
    val comment =
      if (id % 3 == 0) s"zc${id % 10}".getBytes("UTF-8")
      else Array.emptyByteArray
    u32w(0x06054b50L); u16w(0); u16w(0); u16w(n); u16w(n)
    u32w(cdSize.toLong); u32w(cdOff.toLong); u16w(comment.length)
    bo.write(comment, 0, comment.length)
    bo.toByteArray
  }

  /** Executor-side ZIP fixtures — the m31 oracle replays the entry
   * formulas. */
  def syntheticZips(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticZip)
}
