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
 *
 * ZIP64 (APPNOTE 4.5.3) is first-class — archives with >65,535 entries
 * or >4 GiB offsets are the NORM for shard lakes, so the sentinel forms
 * must walk, not fail:
 *   - EOCD fields at their 0xffff/0xffffffff sentinels are promoted
 *     from the EOCD64 record, located via the 20-byte EOCD64 LOCATOR
 *     (PK\6\7) that must sit immediately before the EOCD; the EOCD64
 *     record (PK\6\6) must abut the locator and the CD must abut the
 *     record;
 *   - CD-entry fields at sentinel are promoted from the 0x0001
 *     extensible extra field, whose data size must be EXACTLY the sum
 *     of the promoted field widths (APPNOTE: zip64 extra fields "MUST
 *     only appear" for fields at sentinel — exact-size is the strict
 *     reading);
 *   - non-sentinel EOCD fields must AGREE with the EOCD64 record when
 *     one is present (disagreement is splice evidence).
 *
 * Narrow mapPartitions — O(directory) reads, zero exchanges.
 */
object Zip {

  /** One central-directory entry. `zip64` marks entries whose sizes or
   * offset were promoted from the 0x0001 extra field. */
  final case class Entry(name: String, method: Int, compSize: Long,
      uncompSize: Long, crc32: Long, localOffset: Long,
      zip64: Boolean = false)

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def u64(b: Array[Byte], i: Int): Long =
    u32(b, i) | (u32(b, i + 4) << 32)

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
    val eDisk = u16(b, eocd + 4)
    val eCdDisk = u16(b, eocd + 6)
    val eThisCount = u16(b, eocd + 8)
    val eCount = u16(b, eocd + 10)
    val eCdSize = u32(b, eocd + 12)
    val eCdOff = u32(b, eocd + 16)
    val anySentinel = eDisk == 0xffff || eCdDisk == 0xffff ||
      eThisCount == 0xffff || eCount == 0xffff ||
      eCdSize == 0xffffffffL || eCdOff == 0xffffffffL
    // EOCD64 locator candidate: PK\6\7 immediately before the EOCD. The
    // signature ALONE is not proof — a non-ZIP64 archive whose last CD
    // entry's name/comment happens to end with those 4 bytes at that
    // offset would otherwise be forced down the EOCD64 path and refused
    // (a false rejection APPNOTE readers avoid by consulting the locator
    // only when a sentinel demands it). So: when a sentinel DEMANDS
    // promotion the EOCD64 chain must validate or the archive refuses;
    // with no sentinel, a failed EOCD64 validation falls back to the
    // plain-EOCD read of the same fields.
    val hasLocator = eocd >= 20 && u32(b, eocd - 20) == 0x07064b50L
    if (anySentinel && !hasLocator) return None // zip64 demands the locator
    // full EOCD64 chain validation: locator → record → field agreement →
    // CD abutting the record; None = the chain does not validate
    def eocd64(): Option[(Long, Long, Long)] = { // (count, cdSize, cdOff)
      val loc = eocd - 20
      if (u32(b, loc + 4) != 0) return None // disk holding the EOCD64
      if (u32(b, loc + 16) != 1) return None // total disks
      val recOff = u64(b, loc + 8)
      if (recOff < 0 || recOff > (loc - 56).toLong) return None
      val r = recOff.toInt
      if (u32(b, r) != 0x06064b50L) return None
      val recSize = u64(b, r + 4) // size of the record after this field+sig
      // the record (12 + recSize bytes, extensible data included) must
      // abut the locator exactly
      if (recSize < 44 || recSize > (loc - r - 12).toLong ||
        r + 12 + recSize.toInt != loc) return None
      if (u32(b, r + 16) != 0 || u32(b, r + 20) != 0) return None // disks
      val zThisCount = u64(b, r + 24)
      val zCount = u64(b, r + 32)
      val zCdSize = u64(b, r + 40)
      val zCdOff = u64(b, r + 48)
      if (zCount < 0 || zThisCount != zCount || zCdSize < 0 || zCdOff < 0)
        return None
      // every non-sentinel EOCD field must agree with the record
      if (eDisk != 0xffff && eDisk != 0) return None
      if (eCdDisk != 0xffff && eCdDisk != 0) return None
      if (eThisCount != 0xffff && eThisCount.toLong != zThisCount) return None
      if (eCount != 0xffff && eCount.toLong != zCount) return None
      if (eCdSize != 0xffffffffL && eCdSize != zCdSize) return None
      if (eCdOff != 0xffffffffL && eCdOff != zCdOff) return None
      // the CD must abut the EOCD64 record
      if (zCdOff + zCdSize != r.toLong) return None
      Some((zCount, zCdSize, zCdOff))
    }
    val resolved = if (hasLocator) eocd64() else None
    if (anySentinel && resolved.isEmpty) return None // demanded, not valid
    val (cdCount, cdSize, cdOff) = resolved match {
      case Some(t) => t
      case None => // plain EOCD (includes the coincidental-signature case)
        if (eDisk != 0 || eCdDisk != 0) return None // multi-disk
        if (eThisCount != eCount) return None
        if (eCdOff + eCdSize != eocd.toLong) return None // CD must abut EOCD
        (eCount.toLong, eCdSize, eCdOff)
    }
    val cdEnd = (cdOff + cdSize).toInt
    val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]
    var pos = cdOff.toInt
    var k = 0L
    while (k < cdCount) {
      if (pos + 46 > cdEnd) return None
      if (u32(b, pos) != 0x02014b50L) return None
      val method = u16(b, pos + 10)
      val crc = u32(b, pos + 16)
      var csize = u32(b, pos + 20)
      var usize = u32(b, pos + 24)
      val nameLen = u16(b, pos + 28)
      val extraLen = u16(b, pos + 30)
      val commentLen = u16(b, pos + 32)
      var diskStart = u16(b, pos + 34).toLong
      var localOff = u32(b, pos + 42)
      if (pos + 46 + nameLen + extraLen + commentLen > cdEnd) return None
      val name = new String(b, pos + 46, nameLen, "UTF-8")
      // zip64 promotion: any sentinel field must resolve through the
      // 0x0001 extra block, whose data size is exactly the promoted sum
      var z64 = false
      if (usize == 0xffffffffL || csize == 0xffffffffL ||
        localOff == 0xffffffffL || diskStart == 0xffffL) {
        val xStart = pos + 46 + nameLen
        val xEnd = xStart + extraLen
        var xp = xStart
        while (!z64 && xp + 4 <= xEnd) {
          val hid = u16(b, xp)
          val dsize = u16(b, xp + 2)
          if (xp + 4 + dsize > xEnd) return None
          if (hid == 0x0001) {
            val need = (if (usize == 0xffffffffL) 8 else 0) +
              (if (csize == 0xffffffffL) 8 else 0) +
              (if (localOff == 0xffffffffL) 8 else 0) +
              (if (diskStart == 0xffffL) 4 else 0)
            if (dsize != need) return None
            var fp = xp + 4
            if (usize == 0xffffffffL) { usize = u64(b, fp); fp += 8 }
            if (csize == 0xffffffffL) { csize = u64(b, fp); fp += 8 }
            if (localOff == 0xffffffffL) { localOff = u64(b, fp); fp += 8 }
            if (diskStart == 0xffffL) { diskStart = u32(b, fp); fp += 4 }
            if (usize < 0 || csize < 0 || localOff < 0) return None
            z64 = true
          } else xp += 4 + dsize
        }
        if (!z64) return None // sentinel with no 0x0001 block
      }
      if (diskStart != 0L) return None // disk-number start
      // stored entries must agree on both sizes
      if (method == 0 && csize != usize) return None
      // the local header must really be there
      if (localOff > (b.length - 4).toLong || u32(b, localOff.toInt) != 0x04034b50L)
        return None
      entries += Entry(name, method, csize, usize, crc, localOff, z64)
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
    StructField("local_offset", LongType),
    StructField("zip64", IntegerType)))

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
              e.uncompSize, e.crc32, e.localOffset, if (e.zip64) 1 else 0)
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
   * when `id%3 == 0` (the EOCD back-scan must handle both).
   *
   * ZIP64 rotation: `id%5 == 4` archives use the full ZIP64 shape —
   * even-j entries write all three of usize/csize/local_offset at their
   * 0xffffffff sentinels with a 24-byte 0x0001 extra, odd-j entries
   * promote only local_offset (8-byte extra); the EOCD carries sentinel
   * counts/size/offset resolved through a spec-exact EOCD64 record +
   * locator. Entry VALUES follow the same formulas as the plain form,
   * so the m31 oracle is shared; only `zip64` flips to 1. */
  def syntheticZip(id: Long): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def u16w(v: Int): Unit = { bo.write(v & 0xff); bo.write((v >> 8) & 0xff) }
    def u32w(v: Long): Unit = {
      bo.write((v & 0xff).toInt); bo.write(((v >> 8) & 0xff).toInt)
      bo.write(((v >> 16) & 0xff).toInt); bo.write(((v >> 24) & 0xff).toInt)
    }
    def u64w(v: Long): Unit = { u32w(v & 0xffffffffL); u32w(v >>> 32) }
    val zip64 = id % 5 == 4
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
    es.zipWithIndex.foreach { case (e, j) => // central directory
      val promoteAll = zip64 && j % 2 == 0
      val promoteOff = zip64
      val extraLen =
        if (promoteAll) 4 + 24 else if (promoteOff) 4 + 8 else 0
      u32w(0x02014b50L); u16w(if (zip64) 45 else 20)
      u16w(if (zip64) 45 else 20); u16w(0); u16w(e.method)
      u16w(0); u16w(0)
      u32w(e.crc)
      u32w(if (promoteAll) 0xffffffffL else e.csize.toLong)
      u32w(if (promoteAll) 0xffffffffL else e.usize.toLong)
      u16w(e.name.length); u16w(extraLen); u16w(0)
      u16w(0); u16w(0); u32w(0)
      u32w(if (promoteOff) 0xffffffffL else e.off.toLong)
      bo.write(e.name, 0, e.name.length)
      if (promoteAll) {
        u16w(0x0001); u16w(24)
        u64w(e.usize.toLong); u64w(e.csize.toLong); u64w(e.off.toLong)
      } else if (promoteOff) {
        u16w(0x0001); u16w(8); u64w(e.off.toLong)
      }
    }
    val cdSize = bo.size() - cdOff
    val comment =
      if (id % 3 == 0) s"zc${id % 10}".getBytes("UTF-8")
      else Array.emptyByteArray
    if (zip64) {
      val recOff = bo.size()
      u32w(0x06064b50L); u64w(44L) // EOCD64 record, fixed-size body
      u16w(45); u16w(45) // version made by / needed
      u32w(0); u32w(0) // this disk / CD start disk
      u64w(n.toLong); u64w(n.toLong)
      u64w(cdSize.toLong); u64w(cdOff.toLong)
      u32w(0x07064b50L); u32w(0) // locator: disk with the EOCD64
      u64w(recOff.toLong); u32w(1) // total disks
      u32w(0x06054b50L); u16w(0); u16w(0); u16w(0xffff); u16w(0xffff)
      u32w(0xffffffffL); u32w(0xffffffffL); u16w(comment.length)
    } else {
      u32w(0x06054b50L); u16w(0); u16w(0); u16w(n); u16w(n)
      u32w(cdSize.toLong); u32w(cdOff.toLong); u16w(comment.length)
    }
    bo.write(comment, 0, comment.length)
    bo.toByteArray
  }

  /** Executor-side ZIP fixtures — the m31 oracle replays the entry
   * formulas. */
  def syntheticZips(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticZip)

  /**
   * Random-access extraction of ONE entry from the bytes its
   * central-directory row locates — the ranged-GET access pattern for
   * ZIP shard lakes, the exact analog of [[Gzip.inflateMemberAt]] for
   * the other archive family. Reads the LOCAL header at `localOffset`
   * (APPNOTE 4.3.7: its name/extra lengths may differ from the CD's, so
   * they are re-read, never assumed), takes exactly `compSize` bytes of
   * entry data after it, decodes stored (method 0, sizes must agree) or
   * raw-deflate (method 8, via `Inflater(nowrap=true)` — the entry data
   * carries no zlib wrapper), and verifies BOTH the decoded length
   * against `uncompSize` and the decoded CRC-32 against `crc32`. Any
   * slip — bad signature, bounds, inflate error, trailing compressed
   * garbage, length or CRC mismatch — is a stale/forged locator: None.
   *
   * In-memory decode is capped at Int.MaxValue decoded bytes; a lake
   * with larger single entries streams through a sink instead of
   * materializing (this census-side helper never needs that).
   */
  def extractEntryAt(payload: Array[Byte], localOffset: Long,
      compSize: Long, method: Int, crc32: Long,
      uncompSize: Long): Option[Array[Byte]] = {
    val b = payload
    if (b == null || localOffset < 0 || compSize < 0 || uncompSize < 0 ||
      uncompSize > Int.MaxValue || localOffset > (b.length - 30).toLong)
      return None
    val off = localOffset.toInt
    if (u32(b, off) != 0x04034b50L) return None
    val nameLen = u16(b, off + 26)
    val extraLen = u16(b, off + 28)
    val dataStart = off + 30 + nameLen + extraLen
    // overflow-safe: compare by subtraction on the known-positive side
    if (dataStart > b.length || compSize > (b.length - dataStart).toLong)
      return None
    val dataEnd = dataStart + compSize.toInt
    val content: Array[Byte] = method match {
      case 0 =>
        if (compSize != uncompSize) return None
        java.util.Arrays.copyOfRange(b, dataStart, dataEnd)
      case 8 =>
        val inf = new java.util.zip.Inflater(true)
        try {
          inf.setInput(b, dataStart, compSize.toInt)
          val out = new Array[Byte](uncompSize.toInt)
          var got = 0
          while (got < out.length && !inf.finished()) {
            val k = inf.inflate(out, got, out.length - got)
            if (k == 0 && inf.needsInput()) return None // truncated stream
            got += k
          }
          // the stream must END here: exactly uncompSize bytes out and
          // exactly compSize bytes in (a longer stream means the locator
          // sizes are stale)
          if (got != out.length) return None
          if (!inf.finished()) {
            val probe = new Array[Byte](1)
            if (inf.inflate(probe, 0, 1) != 0 || !inf.finished()) return None
          }
          if (inf.getBytesRead != compSize) return None
          out
        } catch {
          case _: java.util.zip.DataFormatException => return None
        } finally inf.end()
      case _ => return None // census-only methods (bzip2/lzma/zstd/...)
    }
    if (content.length.toLong != uncompSize) return None
    val c = new java.util.zip.CRC32()
    c.update(content)
    if (c.getValue != crc32) return None
    Some(content)
  }

  /** REAL ZIP fixture written by `java.util.zip.ZipOutputStream` (true
   * deflate streams, true CRCs — the extraction differential runs
   * against a real encoder, not a replayed shape): `1 + id%4` entries
   * named `e<id>_<j>.txt` with ASCII content
   * `zip_<id>_<j>_` + `"ab" * ((id+j)%50)`; even j STORED, odd j
   * DEFLATED. Entry timestamps are pinned so the bytes are
   * deterministic across runs. */
  def syntheticRealZip(id: Long): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val zo = new java.util.zip.ZipOutputStream(bo)
    val n = (1 + id % 4).toInt
    (0 until n).foreach { j =>
      val content = (s"zip_${id}_${j}_" + "ab" * ((id + j) % 50).toInt)
        .getBytes("US-ASCII")
      val e = new java.util.zip.ZipEntry(s"e${id}_$j.txt")
      e.setTime(1700000000000L) // fixed mtime: byte-deterministic output
      if (j % 2 == 0) {
        e.setMethod(java.util.zip.ZipEntry.STORED)
        e.setSize(content.length.toLong)
        e.setCompressedSize(content.length.toLong)
        val c = new java.util.zip.CRC32(); c.update(content)
        e.setCrc(c.getValue)
      } else e.setMethod(java.util.zip.ZipEntry.DEFLATED)
      zo.putNextEntry(e)
      zo.write(content)
      zo.closeEntry()
    }
    zo.close()
    bo.toByteArray
  }

  /** Executor-side real-encoder ZIP fixtures (m42). */
  def syntheticRealZips(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticRealZip)

  /** Output schema of [[extractEntries]]. */
  val extractSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("entry_no", IntegerType),
    StructField("name", StringType),
    StructField("method", StringType),
    StructField("n_bytes", LongType),
    StructField("content", BinaryType)))

  /** Census + extraction in ONE narrow pass: every central-directory
   * entry located, then its bytes pulled through [[extractEntryAt]]
   * from the same in-hand payload (per-entry ranged reads on a lake;
   * here the shard is already resident). One row per successfully
   * extracted entry with its DECODED bytes; entries the locator cannot
   * verify (stale sizes, CRC slip, census-only methods) and payloads
   * that are not clean ZIPs contribute nothing. Zero exchanges. */
  def extractEntries(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val zip = r.getAs[Array[Byte]](pIdx)
        parseCentralDirectory(zip).toSeq.flatten.iterator.zipWithIndex
          .flatMap { case (e, i) =>
            extractEntryAt(zip, e.localOffset, e.compSize, e.method,
              e.crc32, e.uncompSize).map { c =>
              Row(id, i, e.name, methodName(e.method), c.length.toLong, c)
            }
          }
      }
    }(Encoders.row(extractSchema))
  }
}
