package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * Parquet FOOTER census from raw bytes: file version, total rows, leaf
 * column count, creating writer and per-row-group row/byte counts read
 * straight from the FileMetaData thrift — no page decode, no column
 * materialization, no Hadoop reader. THE lake format's own metadata is
 * the cheapest census there is: the footer is the last few KB of a
 * file that may be GBs, so "how many rows, how chunked, which writer
 * wrote this" costs a tail read per file. ([[Multimodal.loadBinaryFiles]]
 * ingests the bytes; this walks them.)
 *
 * Format facts honored (Apache Parquet format spec):
 *   - `PAR1` magic at offset 0 and at EOF; the u32-LE footer LENGTH
 *     sits 8 bytes before EOF, and the FileMetaData thrift starts
 *     `len + 8` bytes before EOF;
 *   - FileMetaData is THRIFT COMPACT PROTOCOL: struct fields are
 *     (id-delta << 4 | type) headers with zigzag-varint full ids on
 *     delta 0, BOOL values carried in the type nibble, i16/i32/i64 as
 *     zigzag varints, binary as varint-length + bytes, lists as
 *     (size << 4 | elemType) with varint size overflow at 15, structs
 *     recursing to a 0x00 stop byte;
 *   - projected fields: version (1), schema list (2 — leaf = element
 *     with no/zero num_children; the ROOT element is not a column),
 *     num_rows (3), row_groups (4 → total_byte_size 2, num_rows 3),
 *     created_by (6); everything else (key-value metadata, column
 *     orders, encryption, bloom offsets) is SKIPPED structurally.
 *
 * Strict posture: missing magic, a footer length overrunning the
 * payload, an unknown thrift type, or any varint/field overrun → None.
 *
 * Narrow mapPartitions — O(footer bytes) per file.
 */
object ParquetFooter {

  /** File-level projection plus one entry per row group. */
  final case class Footer(version: Int, numRows: Long, numLeafColumns: Int,
      createdBy: Option[String], rowGroups: IndexedSeq[(Long, Long)])
      // rowGroups: (num_rows, total_byte_size)

  // ---- thrift compact primitives --------------------------------------

  /** Mutable cursor over the footer slice; parse methods throw
   * [[Malformed]] on any overrun, caught once at the top. */
  private final class Malformed extends RuntimeException
  private final class Cur(val b: Array[Byte], var pos: Int, val end: Int) {
    def u8(): Int = {
      if (pos >= end) throw new Malformed
      val v = b(pos) & 0xff; pos += 1; v
    }
    def varint(): Long = {
      var v = 0L
      var shift = 0
      while (shift <= 63) {
        val x = u8()
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      throw new Malformed
    }
    def zigzag(): Long = { val z = varint(); (z >>> 1) ^ -(z & 1) }
    def bytes(n: Long): Int = { // returns start offset of the run
      // compare without addition: `pos + n` wraps negative for a crafted
      // length near Long.MaxValue, letting the cursor jump backwards
      if (n < 0 || n > end - pos) throw new Malformed
      val s = pos; pos += n.toInt; s
    }
  }

  /** Skip one value of compact type `tpe`. `inList` flips the two
   * bool encodings: as a STRUCT field the bool lives in the header
   * nibble (zero value bytes); as a list/map element it is one byte. */
  private def skipValue(c: Cur, tpe: Int, inList: Boolean = false): Unit =
    tpe match {
      case 1 | 2 => if (inList) c.u8(): Unit
      case 3 => c.u8(): Unit // i8: one raw byte
      case 4 | 5 | 6 => c.varint(): Unit // i16/i32/i64 zigzag varints
      case 7 => c.bytes(8): Unit // double
      case 8 => val n = c.varint(); c.bytes(n): Unit // binary/string
      case 9 | 10 => // list/set
        val h = c.u8()
        val et = h & 0x0f
        val n = (h >> 4) & 0x0f
        val size = if (n == 15) c.varint() else n.toLong
        var i = 0L
        while (i < size) { skipValue(c, et, inList = true); i += 1 }
      case 11 => // map
        val size = c.varint()
        if (size > 0) {
          val kv = c.u8()
          val kt = (kv >> 4) & 0x0f
          val vt = kv & 0x0f
          var i = 0L
          while (i < size) {
            skipValue(c, kt, inList = true); skipValue(c, vt, inList = true)
            i += 1
          }
        }
      case 12 => skipStruct(c)
      case _ => throw new Malformed
    }

  private def skipStruct(c: Cur): Unit = {
    var go = true
    while (go) {
      val h = c.u8()
      if (h == 0) go = false
      else {
        val tpe = h & 0x0f
        if ((h >> 4) == 0) c.zigzag(): Unit // long-form field id
        skipValue(c, tpe)
      }
    }
  }

  /** Walk one struct, calling `f(fieldId, type)` positioned AT the
   * value; f must either consume the value or leave it for skipValue
   * (return false = not consumed). */
  private def walkStruct(c: Cur)(f: (Long, Int) => Boolean): Unit = {
    var fid = 0L
    var go = true
    while (go) {
      val h = c.u8()
      if (h == 0) go = false
      else {
        val tpe = h & 0x0f
        val delta = (h >> 4) & 0x0f
        fid = if (delta == 0) c.zigzag() else fid + delta
        if (!f(fid, tpe)) skipValue(c, tpe)
      }
    }
  }

  private def listHeader(c: Cur): (Long, Int) = {
    val h = c.u8()
    val n = (h >> 4) & 0x0f
    ((if (n == 15) c.varint() else n.toLong), h & 0x0f)
  }

  // ---- the walk --------------------------------------------------------

  /** Parse the footer of a full parquet file payload. */
  def parseFooter(payload: Array[Byte]): Option[Footer] = {
    val b = payload
    if (b == null || b.length < 12) return None
    if (b(0) != 'P' || b(1) != 'A' || b(2) != 'R' || b(3) != '1') return None
    val n = b.length
    if (b(n - 4) != 'P' || b(n - 3) != 'A' || b(n - 2) != 'R' ||
      b(n - 1) != '1') return None
    val flen = (b(n - 8) & 0xffL) | ((b(n - 7) & 0xffL) << 8) |
      ((b(n - 6) & 0xffL) << 16) | ((b(n - 5) & 0xffL) << 24)
    if (flen <= 0 || flen > n - 12) return None
    val start = n - 8 - flen.toInt
    val c = new Cur(b, start, n - 8)
    try {
      var version = -1
      var numRows = -1L
      var leaves = 0
      var createdBy: Option[String] = None
      val rgs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      walkStruct(c) { (fid, tpe) =>
        (fid, tpe) match {
          case (1L, 5) => version = c.zigzag().toInt; true
          case (2L, 9) => // schema: list<SchemaElement>
            val (size, et) = listHeader(c)
            if (et != 12) throw new Malformed
            var i = 0L
            while (i < size) {
              var children = 0L
              walkStruct(c) { (sfid, stpe) =>
                if (sfid == 5L && stpe == 5) { children = c.zigzag(); true }
                else false
              }
              // the ROOT element (i == 0) is the message, not a column
              if (i > 0 && children == 0L) leaves += 1
              i += 1
            }
            true
          case (3L, 6) => numRows = c.zigzag(); true
          case (4L, 9) => // row_groups: list<RowGroup>
            val (size, et) = listHeader(c)
            if (et != 12) throw new Malformed
            var i = 0L
            while (i < size) {
              var rgRows = -1L
              var rgBytes = -1L
              walkStruct(c) { (rfid, rtpe) =>
                if (rfid == 2L && rtpe == 6) { rgBytes = c.zigzag(); true }
                else if (rfid == 3L && rtpe == 6) { rgRows = c.zigzag(); true }
                else false
              }
              rgs += ((rgRows, rgBytes))
              i += 1
            }
            true
          case (6L, 8) =>
            val len = c.varint()
            val off = c.bytes(len)
            createdBy = Some(new String(b, off, len.toInt, "UTF-8"))
            true
          case _ => false // skip
        }
      }
      if (version < 0 || numRows < 0) None
      else Some(Footer(version, numRows, leaves, createdBy, rgs.toIndexedSeq))
    } catch {
      // belt-and-braces: Malformed covers every deliberate reject; the
      // bounds exception guards any arithmetic slip on crafted footers
      case _: Malformed => None
      case _: IndexOutOfBoundsException => None
    }
  }

  // ---- per-column-chunk projection -------------------------------------

  /** One column chunk's ColumnMetaData projection. Stats carry the
   * DECODED min/max for INT32/INT64 (little-endian per the format spec)
   * and the UTF-8 reading for BYTE_ARRAY; other physical types report
   * null stats (structurally skipped, not failed). `min_value`/
   * `max_value` (fields 5/6) are preferred over the deprecated
   * `min`/`max` (1/2) when both are present. */
  final case class ChunkMeta(rgNo: Int, colNo: Int, path: String,
      ptype: Int, codec: Int, numValues: Long, uncompBytes: Long,
      compBytes: Long, encodings: IndexedSeq[Int], nullCount: Option[Long],
      minLong: Option[Long], maxLong: Option[Long],
      minStr: Option[String], maxStr: Option[String],
      bloomOffset: Option[Long] = None, bloomLength: Option[Long] = None,
      dataPageOffset: Long = -1L, dictPageOffset: Option[Long] = None)

  private def typeName(t: Int): String = t match {
    case 0 => "boolean"; case 1 => "int32"; case 2 => "int64"
    case 3 => "int96"; case 4 => "float"; case 5 => "double"
    case 6 => "byte_array"; case 7 => "fixed_len_byte_array"
    case other => s"type_$other"
  }
  private def codecName(c: Int): String = c match {
    case 0 => "uncompressed"; case 1 => "snappy"; case 2 => "gzip"
    case 3 => "lzo"; case 4 => "brotli"; case 5 => "lz4"; case 6 => "zstd"
    case 7 => "lz4_raw"; case other => s"codec_$other"
  }
  private def encodingName(e: Int): String = e match {
    case 0 => "plain"; case 2 => "plain_dictionary"; case 3 => "rle"
    case 4 => "bit_packed"; case 5 => "delta_binary_packed"
    case 6 => "delta_length_byte_array"; case 7 => "delta_byte_array"
    case 8 => "rle_dictionary"; case 9 => "byte_stream_split"
    case other => s"enc_$other"
  }

  private def i64le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)
  private def i32le(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)).toInt.toLong

  /** Decode one Statistics binary payload for the given physical type:
   * (asLong, asString) — exactly one side is set for the projected
   * types, both None otherwise. */
  private def decodeStat(b: Array[Byte], off: Int, len: Int,
      ptype: Int): (Option[Long], Option[String]) = ptype match {
    case 1 if len == 4 => (Some(i32le(b, off)), None)
    case 2 if len == 8 => (Some(i64le(b, off)), None)
    case 6 => (None, Some(new String(b, off, len, "UTF-8")))
    case _ => (None, None)
  }

  /**
   * Walk FileMetaData → row_groups → columns → ColumnMetaData and
   * project codec, encodings, value/byte counts and Statistics per
   * column chunk — the metadata that powers scan pruning and lake
   * capacity planning. Same strict posture and thrift walk as
   * [[parseFooter]]; None on any structural violation.
   */
  def parseColumnChunks(payload: Array[Byte]): Option[IndexedSeq[ChunkMeta]] = {
    val b = payload
    if (b == null || b.length < 12) return None
    if (b(0) != 'P' || b(1) != 'A' || b(2) != 'R' || b(3) != '1') return None
    val n = b.length
    if (b(n - 4) != 'P' || b(n - 3) != 'A' || b(n - 2) != 'R' ||
      b(n - 1) != '1') return None
    val flen = (b(n - 8) & 0xffL) | ((b(n - 7) & 0xffL) << 8) |
      ((b(n - 6) & 0xffL) << 16) | ((b(n - 5) & 0xffL) << 24)
    if (flen <= 0 || flen > n - 12) return None
    val c = new Cur(b, n - 8 - flen.toInt, n - 8)
    val out = scala.collection.mutable.ArrayBuffer.empty[ChunkMeta]
    try {
      walkStruct(c) { (fid, tpe) =>
        if (fid == 4L && tpe == 9) { // row_groups: list<RowGroup>
          val (nRg, et) = listHeader(c)
          if (et != 12) throw new Malformed
          var rg = 0L
          while (rg < nRg) {
            walkStruct(c) { (rfid, rtpe) =>
              if (rfid == 1L && rtpe == 9) { // columns: list<ColumnChunk>
                val (nCol, cet) = listHeader(c)
                if (cet != 12) throw new Malformed
                var ci = 0L
                while (ci < nCol) {
                  var meta: Option[ChunkMeta] = None
                  walkStruct(c) { (cfid, ctpe) =>
                    if (cfid == 3L && ctpe == 12) { // meta_data
                      meta = Some(parseColumnMetaData(c, rg.toInt, ci.toInt))
                      true
                    } else false
                  }
                  // a chunk without inline ColumnMetaData (offset-only
                  // encrypted form) is skipped, not failed
                  meta.foreach(out += _)
                  ci += 1
                }
                true
              } else false
            }
            rg += 1
          }
          true
        } else false
      }
      Some(out.toIndexedSeq)
    } catch {
      case _: Malformed => None
      case _: IndexOutOfBoundsException => None
    }
  }

  /** Cursor positioned AT a ColumnMetaData struct. */
  private def parseColumnMetaData(c: Cur, rgNo: Int, colNo: Int): ChunkMeta = {
    var ptype = -1
    var codec = -1
    var numValues = -1L
    var uncomp = -1L
    var comp = -1L
    val encs = scala.collection.mutable.ArrayBuffer.empty[Int]
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var nullCount: Option[Long] = None
    var minL: Option[Long] = None
    var maxL: Option[Long] = None
    var minS: Option[String] = None
    var maxS: Option[String] = None
    var bloomOff: Option[Long] = None
    var bloomLen: Option[Long] = None
    var dataPageOff = -1L
    var dictPageOff: Option[Long] = None
    // deprecated min/max kept only until min_value/max_value show up
    var sawNewMin = false
    var sawNewMax = false
    walkStruct(c) { (fid, tpe) =>
      (fid, tpe) match {
        case (1L, 5) => ptype = c.zigzag().toInt; true
        case (2L, 9) => // encodings: list<Encoding i32>
          val (sz, et) = listHeader(c)
          if (et != 5) throw new Malformed
          var i = 0L
          while (i < sz) { encs += c.zigzag().toInt; i += 1 }
          true
        case (3L, 9) => // path_in_schema: list<string>
          val (sz, et) = listHeader(c)
          if (et != 8) throw new Malformed
          var i = 0L
          while (i < sz) {
            val len = c.varint()
            val off = c.bytes(len)
            parts += new String(c.b, off, len.toInt, "UTF-8")
            i += 1
          }
          true
        case (4L, 5) => codec = c.zigzag().toInt; true
        case (5L, 6) => numValues = c.zigzag(); true
        case (6L, 6) => uncomp = c.zigzag(); true
        case (7L, 6) => comp = c.zigzag(); true
        case (12L, 12) => // statistics
          walkStruct(c) { (sfid, stpe) =>
            (sfid, stpe) match {
              case (1L, 8) => // deprecated max
                val len = c.varint(); val off = c.bytes(len)
                if (!sawNewMax) {
                  val (l, s) = decodeStat(c.b, off, len.toInt, ptype)
                  maxL = l; maxS = s
                }
                true
              case (2L, 8) => // deprecated min
                val len = c.varint(); val off = c.bytes(len)
                if (!sawNewMin) {
                  val (l, s) = decodeStat(c.b, off, len.toInt, ptype)
                  minL = l; minS = s
                }
                true
              case (3L, 6) => nullCount = Some(c.zigzag()); true
              case (5L, 8) => // max_value
                val len = c.varint(); val off = c.bytes(len)
                val (l, s) = decodeStat(c.b, off, len.toInt, ptype)
                maxL = l; maxS = s; sawNewMax = true
                true
              case (6L, 8) => // min_value
                val len = c.varint(); val off = c.bytes(len)
                val (l, s) = decodeStat(c.b, off, len.toInt, ptype)
                minL = l; minS = s; sawNewMin = true
                true
              case _ => false
            }
          }
          true
        case (9L, 6) => dataPageOff = c.zigzag(); true
        case (11L, 6) => dictPageOff = Some(c.zigzag()); true
        case (14L, 6) => bloomOff = Some(c.zigzag()); true
        case (15L, 5) => bloomLen = Some(c.zigzag()); true
        case _ => false
      }
    }
    if (ptype < 0 || codec < 0 || numValues < 0 || uncomp < 0 || comp < 0)
      throw new Malformed // required ColumnMetaData fields missing
    ChunkMeta(rgNo, colNo, parts.mkString("."), ptype, codec, numValues,
      uncomp, comp, encs.toIndexedSeq, nullCount, minL, maxL, minS, maxS,
      bloomOff, bloomLen, dataPageOff, dictPageOff)
  }

  // ---- page-index projection (ColumnIndex / OffsetIndex / bloom) ------

  /** One column chunk's page-level pruning metadata: the ColumnIndex
   * (per-page null flags, decoded min/max envelope, boundary order,
   * null-count sum), the OffsetIndex (page count + location-table
   * validity), the chunk-stats agreement verdict, and the bloom-filter
   * header when the chunk carries one. */
  final case class PageIndexMeta(rgNo: Int, colNo: Int, path: String,
      ptype: Int, nPages: Int, nullPages: Int, nullCountSum: Option[Long],
      boundaryOrder: Int, minLong: Option[Long], maxLong: Option[Long],
      minStr: Option[String], maxStr: Option[String], oiOk: Boolean,
      statsAgree: Boolean, bloomBytes: Option[Long], bloomOk: Boolean)

  private def boundaryName(b: Int): String = b match {
    case 0 => "unordered"; case 1 => "ascending"; case 2 => "descending"
    case other => s"order_$other"
  }

  /** Parse one ColumnIndex struct slice: (nullPages, minVals, maxVals,
   * boundaryOrder, nullCounts) with the raw binary min/max runs kept
   * as (offset, length) pairs into `b`. */
  private def parseColumnIndex(b: Array[Byte], off: Long, len: Long):
      (IndexedSeq[Boolean], IndexedSeq[(Int, Int)], IndexedSeq[(Int, Int)],
        Int, Option[IndexedSeq[Long]]) = {
    if (off < 0 || len <= 0 || len > b.length - off) throw new Malformed
    val c = new Cur(b, off.toInt, (off + len).toInt)
    var nullPages: IndexedSeq[Boolean] = IndexedSeq.empty
    val mins = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val maxs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var order = -1
    var nullCounts: Option[IndexedSeq[Long]] = None
    def binList(into: scala.collection.mutable.ArrayBuffer[(Int, Int)]): Unit = {
      val (sz, et) = listHeader(c)
      if (et != 8) throw new Malformed
      var i = 0L
      while (i < sz) {
        val n = c.varint()
        val s = c.bytes(n)
        into += ((s, n.toInt))
        i += 1
      }
    }
    walkStruct(c) { (fid, tpe) =>
      (fid, tpe) match {
        case (1L, 9) => // null_pages: list<bool> (one byte per element:
          // thrift compact CT_BOOLEAN_TRUE = 1, CT_BOOLEAN_FALSE = 2)
          val (sz, et) = listHeader(c)
          if (et != 1 && et != 2) throw new Malformed
          val buf = scala.collection.mutable.ArrayBuffer.empty[Boolean]
          var i = 0L
          while (i < sz) { buf += (c.u8() == 1); i += 1 }
          nullPages = buf.toIndexedSeq
          true
        case (2L, 9) => binList(mins); true
        case (3L, 9) => binList(maxs); true
        case (4L, 5) => order = c.zigzag().toInt; true
        case (5L, 9) => // null_counts: list<i64>
          val (sz, et) = listHeader(c)
          if (et != 6) throw new Malformed
          val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
          var i = 0L
          while (i < sz) { buf += c.zigzag(); i += 1 }
          nullCounts = Some(buf.toIndexedSeq)
          true
        case _ => false
      }
    }
    // the four parallel lists must agree on the page count
    if (nullPages.isEmpty || mins.size != nullPages.size ||
      maxs.size != nullPages.size ||
      nullCounts.exists(_.size != nullPages.size) || order < 0)
      throw new Malformed
    (nullPages, mins.toIndexedSeq, maxs.toIndexedSeq, order, nullCounts)
  }

  /** Parse one OffsetIndex struct slice: page locations as
   * (offset, compressedSize, firstRowIndex) triples. */
  private def parseOffsetIndex(b: Array[Byte], off: Long, len: Long):
      IndexedSeq[(Long, Long, Long)] = {
    if (off < 0 || len <= 0 || len > b.length - off) throw new Malformed
    val c = new Cur(b, off.toInt, (off + len).toInt)
    val pages = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    walkStruct(c) { (fid, tpe) =>
      if (fid == 1L && tpe == 9) { // page_locations: list<PageLocation>
        val (sz, et) = listHeader(c)
        if (et != 12) throw new Malformed
        var i = 0L
        while (i < sz) {
          var pOff = -1L
          var pSize = -1L
          var pRow = -1L
          walkStruct(c) { (pfid, ptpe) =>
            (pfid, ptpe) match {
              case (1L, 6) => pOff = c.zigzag(); true
              case (2L, 5) => pSize = c.zigzag(); true
              case (3L, 6) => pRow = c.zigzag(); true
              case _ => false
            }
          }
          if (pOff < 0 || pSize <= 0 || pRow < 0) throw new Malformed
          pages += ((pOff, pSize, pRow))
          i += 1
        }
        true
      } else false
    }
    if (pages.isEmpty) throw new Malformed
    pages.toIndexedSeq
  }

  /** Parse a BloomFilterHeader at `off`: Some(numBytes) when the
   * header walks cleanly AND the declared bitset fits in the payload
   * after it; None otherwise. */
  private def parseBloomHeader(b: Array[Byte], off: Long): Option[Long] = {
    if (off < 0 || off >= b.length) return None
    val c = new Cur(b, off.toInt, b.length)
    var numBytes = -1L
    var unions = 0
    try {
      walkStruct(c) { (fid, tpe) =>
        (fid, tpe) match {
          case (1L, 5) => numBytes = c.zigzag(); true
          case (2L, 12) | (3L, 12) | (4L, 12) => // algorithm/hash/compression
            skipStruct(c); unions += 1; true
          case _ => false
        }
      }
      if (numBytes > 0 && unions == 3 && numBytes <= b.length - c.pos)
        Some(numBytes)
      else None
    } catch {
      case _: Malformed => None
      case _: IndexOutOfBoundsException => None
    }
  }

  /**
   * Walk FileMetaData → row_groups → columns and project each chunk's
   * PAGE-LEVEL pruning metadata: the ColumnIndex / OffsetIndex pair
   * (parquet-format PageIndex — what modern readers skip pages with)
   * plus the bloom-filter header for chunks that carry one. Emits one
   * entry per chunk that has BOTH index structures; the decoded
   * min/max envelope over non-null pages is cross-checked against the
   * chunk's own Statistics (`statsAgree`), and the OffsetIndex is
   * validated structurally (`oiOk`: first_row_index starts at 0 and
   * strictly increases, page offsets strictly increase and stay inside
   * the payload). Same strict thrift posture as [[parseFooter]].
   */
  def parsePageIndexes(payload: Array[Byte]): Option[IndexedSeq[PageIndexMeta]] = {
    val b = payload
    if (b == null || b.length < 12) return None
    if (b(0) != 'P' || b(1) != 'A' || b(2) != 'R' || b(3) != '1') return None
    val n = b.length
    if (b(n - 4) != 'P' || b(n - 3) != 'A' || b(n - 2) != 'R' ||
      b(n - 1) != '1') return None
    val flen = (b(n - 8) & 0xffL) | ((b(n - 7) & 0xffL) << 8) |
      ((b(n - 6) & 0xffL) << 16) | ((b(n - 5) & 0xffL) << 24)
    if (flen <= 0 || flen > n - 12) return None
    val c = new Cur(b, n - 8 - flen.toInt, n - 8)
    val out = scala.collection.mutable.ArrayBuffer.empty[PageIndexMeta]
    try {
      walkStruct(c) { (fid, tpe) =>
        if (fid == 4L && tpe == 9) { // row_groups
          val (nRg, et) = listHeader(c)
          if (et != 12) throw new Malformed
          var rg = 0L
          while (rg < nRg) {
            walkStruct(c) { (rfid, rtpe) =>
              if (rfid == 1L && rtpe == 9) { // columns
                val (nCol, cet) = listHeader(c)
                if (cet != 12) throw new Malformed
                var ci = 0L
                while (ci < nCol) {
                  var meta: Option[ChunkMeta] = None
                  var oiOff = -1L; var oiLen = -1L
                  var ciOff = -1L; var ciLen = -1L
                  walkStruct(c) { (cfid, ctpe) =>
                    (cfid, ctpe) match {
                      case (3L, 12) =>
                        meta = Some(parseColumnMetaData(c, rg.toInt, ci.toInt))
                        true
                      case (4L, 6) => oiOff = c.zigzag(); true
                      case (5L, 5) => oiLen = c.zigzag(); true
                      case (6L, 6) => ciOff = c.zigzag(); true
                      case (7L, 5) => ciLen = c.zigzag(); true
                      case _ => false
                    }
                  }
                  meta.foreach { m =>
                    if (ciOff >= 0 && ciLen > 0 && oiOff >= 0 && oiLen > 0) {
                      val (nulls, mins, maxs, order, nullCounts) =
                        parseColumnIndex(b, ciOff, ciLen)
                      val pages = parseOffsetIndex(b, oiOff, oiLen)
                      // the two structures describe the SAME page list
                      if (pages.size != nulls.size) throw new Malformed
                      var oiOk = pages.head._3 == 0L
                      var i = 1
                      while (i < pages.size) {
                        if (pages(i)._1 <= pages(i - 1)._1 ||
                          pages(i)._3 <= pages(i - 1)._3) oiOk = false
                        i += 1
                      }
                      if (pages.exists(p => p._2 > b.length - p._1)) oiOk = false
                      // decoded min/max envelope over non-null pages
                      var mnL: Option[Long] = None
                      var mxL: Option[Long] = None
                      var mnS: Option[String] = None
                      var mxS: Option[String] = None
                      nulls.indices.foreach { k =>
                        if (!nulls(k)) {
                          val (l1, s1) = decodeStat(b, mins(k)._1, mins(k)._2, m.ptype)
                          val (l2, s2) = decodeStat(b, maxs(k)._1, maxs(k)._2, m.ptype)
                          l1.foreach(v => mnL = Some(mnL.fold(v)(math.min(_, v))))
                          l2.foreach(v => mxL = Some(mxL.fold(v)(math.max(_, v))))
                          s1.foreach(v => mnS = Some(mnS.fold(v)(o => if (v < o) v else o)))
                          s2.foreach(v => mxS = Some(mxS.fold(v)(o => if (v > o) v else o)))
                        }
                      }
                      val statsAgree = (m.ptype match {
                        case 1 | 2 => mnL.isDefined && mnL == m.minLong &&
                          mxL == m.maxLong
                        case 6 => mnS.isDefined && mnS == m.minStr &&
                          mxS == m.maxStr
                        case _ => true // types without a decoded projection
                      })
                      val bloom = m.bloomOffset.flatMap(parseBloomHeader(b, _))
                      val bloomOk = m.bloomOffset.isEmpty || bloom.isDefined
                      out += PageIndexMeta(rg.toInt, ci.toInt, m.path,
                        m.ptype, pages.size, nulls.count(identity),
                        nullCounts.map(_.sum), order, mnL, mxL, mnS, mxS,
                        oiOk, statsAgree, bloom, bloomOk)
                    }
                  }
                  ci += 1
                }
                true
              } else false
            }
            rg += 1
          }
          true
        } else false
      }
      Some(out.toIndexedSeq)
    } catch {
      case _: Malformed => None
      case _: IndexOutOfBoundsException => None
    }
  }

  /** Output schema of [[parquetPageIndexes]]. */
  val pageIndexSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("rg_no", IntegerType),
    StructField("col_no", IntegerType),
    StructField("path", StringType),
    StructField("ptype", StringType),
    StructField("n_pages", IntegerType),
    StructField("null_pages", IntegerType),
    StructField("null_count_sum", LongType),
    StructField("boundary_order", StringType),
    StructField("min_long", LongType),
    StructField("max_long", LongType),
    StructField("min_str", StringType),
    StructField("max_str", StringType),
    StructField("oi_ok", IntegerType),
    StructField("stats_agree", IntegerType),
    StructField("bloom_bytes", LongType),
    StructField("bloom_ok", IntegerType)))

  /** One row per column chunk carrying a ColumnIndex/OffsetIndex pair
   * (row-group then column order) — the page-pruning metadata census.
   * Non-parquet / structurally unclean payloads contribute nothing.
   * Narrow mapPartitions — O(footer + indexes) per file. */
  def parquetPageIndexes(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parsePageIndexes(r.getAs[Array[Byte]](pIdx)) match {
          case Some(ps) => ps.iterator.map { m =>
            Row(id, m.rgNo, m.colNo, m.path, typeName(m.ptype), m.nPages,
              m.nullPages, m.nullCountSum.map(Long.box).orNull,
              boundaryName(m.boundaryOrder),
              m.minLong.map(Long.box).orNull, m.maxLong.map(Long.box).orNull,
              m.minStr.orNull, m.maxStr.orNull,
              if (m.oiOk) 1 else 0, if (m.statsAgree) 1 else 0,
              m.bloomBytes.map(Long.box).orNull, if (m.bloomOk) 1 else 0)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(pageIndexSchema))
  }

  /** Output schema of [[parquetColumnChunks]]. */
  val chunkSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("rg_no", IntegerType),
    StructField("col_no", IntegerType),
    StructField("path", StringType),
    StructField("ptype", StringType),
    StructField("codec", StringType),
    StructField("n_values", LongType),
    StructField("uncomp_bytes", LongType),
    StructField("comp_bytes", LongType),
    StructField("encodings", StringType),
    StructField("null_count", LongType),
    StructField("min_long", LongType),
    StructField("max_long", LongType),
    StructField("min_str", StringType),
    StructField("max_str", StringType)))

  /** One row per column chunk (row-group then column order); encodings
   * are the sorted-distinct names joined with ','. Non-parquet /
   * structurally unclean payloads contribute nothing. Narrow
   * mapPartitions — O(footer) per file. */
  def parquetColumnChunks(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseColumnChunks(r.getAs[Array[Byte]](pIdx)) match {
          case Some(cs) => cs.iterator.map { m =>
            Row(id, m.rgNo, m.colNo, m.path, typeName(m.ptype),
              codecName(m.codec), m.numValues, m.uncompBytes, m.compBytes,
              m.encodings.map(encodingName).distinct.sorted.mkString(","),
              m.nullCount.map(Long.box).orNull,
              m.minLong.map(Long.box).orNull, m.maxLong.map(Long.box).orNull,
              m.minStr.orNull, m.maxStr.orNull)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(chunkSchema))
  }

  /** Output schema of [[parquetFooters]]. */
  val footerSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("version", IntegerType),
    StructField("num_rows", LongType),
    StructField("n_leaf_columns", IntegerType),
    StructField("created_by", StringType),
    StructField("rg_no", IntegerType),
    StructField("rg_rows", LongType),
    StructField("rg_bytes", LongType)))

  // ---- data-page VALUE decode (m50) -----------------------------------
  //
  // The m37→m39→m48 metadata ladder located pages; this rung DECODES
  // them — the end-to-end page-skip read a 100 TB parquet lake actually
  // performs: fetch the byte range an OffsetIndex locator names, parse
  // the PageHeader thrift, decompress the body per the chunk codec,
  // and decode values (parquet-format Encodings.md):
  //   - PLAIN: little-endian fixed-width runs (int32/int64/float/
  //     double), bit-packed booleans, BYTE_ARRAY as u32-LE length +
  //     bytes (strict UTF-8);
  //   - PLAIN_DICTIONARY / RLE_DICTIONARY: a PLAIN dictionary page
  //     (located by dictionary_page_offset) + 1 bit-width byte + an
  //     RLE/bit-packed hybrid run of indices;
  //   - DELTA_BINARY_PACKED (the v2 writer's INT64 fallback):
  //     block/miniblock bit-packed zigzag deltas;
  //   - DELTA_LENGTH_BYTE_ARRAY / DELTA_BYTE_ARRAY (the v2 writer's
  //     string fallback): delta-packed length runs (+ shared-prefix
  //     fronting) over concatenated bytes;
  //   - definition levels (nullable columns, max def 1): RLE with a
  //     u32-LE length prefix in v1 pages, a separate never-compressed
  //     section in v2 pages.
  // Schemas: flat leaves (no repetition levels), nested STRUCT leaves
  // (multi-level def, dotted paths), and single-level LISTs (one
  // repeated node per path — rep levels decoded and Dremel-assembled
  // into per-row lists, null/empty/null-element distinguished by the
  // def-level bands the schema tree defines). Deeper repetition
  // (lists of lists) refuses. Strict posture
  // throughout: every locator is re-validated (header+body must tile
  // the located range exactly, first_row_index must equal the running
  // row count, decoded totals must equal the chunk's num_values and
  // the row group's num_rows), and any slip refuses the file.

  /** One leaf of the schema tree: dotted path, physical type, and the
   * level geometry the Dremel record shredding defines — `maxDef` /
   * `maxRep` are the counts of optional-or-repeated / repeated nodes
   * on the path; for a leaf under a repeated node (`maxRep == 1`),
   * `defList` is the definition level accumulated BEFORE the repeated
   * node, so a value's def level d classifies as: `d < defList` →
   * null list, `d == defList` → empty list, `d == maxDef` → element
   * present, between → null element. */
  private final case class Leaf(path: String, ptype: Int, maxDef: Int,
      maxRep: Int, defList: Int)

  /** Raw schema element as stored (preorder with child counts). */
  private final case class SchemaElem(tpe: Int, rep: Int, name: String,
      children: Int)

  /** Cursor positioned AT the schema list value; walks the flattened
   * preorder tree and returns every PRIMITIVE leaf with its dotted
   * path and level geometry. Repetition deeper than one repeated node
   * per path is reported (maxRep > 1) and refused at decode time. */
  private def parseLeaves(c: Cur, b: Array[Byte]): IndexedSeq[Leaf] = {
    val (size, et) = listHeader(c)
    if (et != 12) throw new Malformed
    if (size <= 1 || size > (1 << 16)) throw new Malformed
    val elems = new Array[SchemaElem](size.toInt)
    var i = 0
    while (i < size) {
      var tpe = -1
      var rep = -1
      var name: String = null
      var children = 0L
      walkStruct(c) { (fid, t) =>
        (fid, t) match {
          case (1L, 5) => tpe = c.zigzag().toInt; true
          case (3L, 5) => rep = c.zigzag().toInt; true
          case (4L, 8) =>
            val len = c.varint()
            val off = c.bytes(len)
            name = new String(b, off, len.toInt, "UTF-8")
            true
          case (5L, 5) => children = c.zigzag(); true
          case _ => false
        }
      }
      if (children < 0 || children > (1 << 16)) throw new Malformed
      elems(i) = SchemaElem(tpe, rep, name, children.toInt)
      i += 1
    }
    if (elems(0).children <= 0) throw new Malformed // root must have children
    val out = scala.collection.mutable.ArrayBuffer.empty[Leaf]
    var idx = 1
    def walk(prefix: List[String], d: Int, r: Int, defList: Int): Unit = {
      if (idx >= elems.length) throw new Malformed
      if (prefix.length >= 64) throw new Malformed // crafted-depth guard
      val e = elems(idx)
      idx += 1
      if (e.name == null) throw new Malformed
      val (d2, r2) = e.rep match {
        case 1 => (d + 1, r) // optional
        case 2 => (d + 1, r + 1) // repeated
        case 0 => (d, r) // required
        case _ => throw new Malformed
      }
      val dl = if (e.rep == 2) d else defList
      val path = e.name :: prefix
      if (e.children == 0) {
        if (e.tpe < 0) throw new Malformed
        out += Leaf(path.reverse.mkString("."), e.tpe, d2, r2, dl)
      } else {
        var k = 0
        while (k < e.children) { walk(path, d2, r2, dl); k += 1 }
      }
    }
    var k = 0
    while (k < elems(0).children) { walk(Nil, 0, 0, -1); k += 1 }
    if (idx != elems.length) throw new Malformed // tree must tile the list
    out.toIndexedSeq
  }

  /** Projected PageHeader thrift. `end` is the absolute offset just
   * past the header (= start of the page body); `crc` is the optional
   * page checksum — CRC32 over the body bytes [end, end+comp)
   * (pinned empirically against parquet-mr; for v2 pages the body
   * includes the level sections, which matches the spec's
   * levels+data coverage). */
  private final case class PageHdr(ptype: Int, uncomp: Int, comp: Int,
      nValues: Int, enc: Int, defEnc: Int, dictN: Int, dictEnc: Int,
      nNulls: Int, defLen2: Int, repLen2: Int, compressed2: Boolean,
      crc: Option[Int], end: Int, repEnc: Int = 3)

  /** Verify the page CRC when the header carries one; a mismatch is
   * bit-rot or a stale locator — refuse. */
  private def checkPageCrc(b: Array[Byte], h: PageHdr): Unit =
    h.crc.foreach { want =>
      val c = new java.util.zip.CRC32
      c.update(b, h.end, h.comp)
      if (c.getValue.toInt != want) throw new Malformed
    }

  private def parsePageHeader(b: Array[Byte], off: Int, lim: Int): PageHdr = {
    val c = new Cur(b, off, lim)
    var ptype = -1
    var uncomp = -1
    var comp = -1
    var nValues = -1
    var enc = -1
    var defEnc = -1
    var repEnc = 3 // RLE unless the (legacy) header says otherwise
    var dictN = -1
    var dictEnc = -1
    var nNulls = -1
    var defLen2 = -1
    var repLen2 = -1
    var compressed2 = true // thrift default per parquet-format
    var crc: Option[Int] = None
    walkStruct(c) { (fid, tpe) =>
      (fid, tpe) match {
        case (1L, 5) => ptype = c.zigzag().toInt; true
        case (2L, 5) => uncomp = c.zigzag().toInt; true
        case (3L, 5) => comp = c.zigzag().toInt; true
        case (4L, 5) => crc = Some(c.zigzag().toInt); true
        case (5L, 12) => // DataPageHeader (v1)
          walkStruct(c) { (f2, t2) =>
            (f2, t2) match {
              case (1L, 5) => nValues = c.zigzag().toInt; true
              case (2L, 5) => enc = c.zigzag().toInt; true
              case (3L, 5) => defEnc = c.zigzag().toInt; true
              case (4L, 5) => repEnc = c.zigzag().toInt; true
              case _ => false
            }
          }
          true
        case (7L, 12) => // DictionaryPageHeader
          walkStruct(c) { (f2, t2) =>
            (f2, t2) match {
              case (1L, 5) => dictN = c.zigzag().toInt; true
              case (2L, 5) => dictEnc = c.zigzag().toInt; true
              case _ => false
            }
          }
          true
        case (8L, 12) => // DataPageHeaderV2
          walkStruct(c) { (f2, t2) =>
            (f2, t2) match {
              case (1L, 5) => nValues = c.zigzag().toInt; true
              case (2L, 5) => nNulls = c.zigzag().toInt; true
              case (4L, 5) => enc = c.zigzag().toInt; true
              case (5L, 5) => defLen2 = c.zigzag().toInt; true
              case (6L, 5) => repLen2 = c.zigzag().toInt; true
              case (7L, 1) | (7L, 2) => compressed2 = t2 == 1; true
              case _ => false
            }
          }
          true
        case _ => false
      }
    }
    if (ptype < 0 || uncomp < 0 || comp < 0) throw new Malformed
    PageHdr(ptype, uncomp, comp, nValues, enc, defEnc, dictN, dictEnc,
      nNulls, defLen2, repLen2, compressed2, crc, c.pos, repEnc)
  }

  /** Decompress one page body to EXACTLY `uncomp` bytes per the chunk
   * codec (uncompressed/snappy/gzip/zstd/lz4_raw — the codecs with
   * public exact-size decoders on the classpath); any length
   * disagreement or other codec refuses. */
  private def inflatePage(b: Array[Byte], off: Int, comp: Int, uncomp: Int,
      codec: Int): Array[Byte] = {
    if (comp < 0 || uncomp < 0 || comp > b.length - off) throw new Malformed
    codec match {
      case 0 =>
        if (comp != uncomp) throw new Malformed
        java.util.Arrays.copyOfRange(b, off, off + comp)
      case 1 => // snappy block
        val raw =
          try org.xerial.snappy.Snappy.uncompress(
            java.util.Arrays.copyOfRange(b, off, off + comp))
          catch { case _: java.io.IOException => throw new Malformed }
        if (raw.length != uncomp) throw new Malformed
        raw
      case 2 => // gzip member
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(b, off, comp))
        try {
          val out = new Array[Byte](uncomp)
          var w = 0
          var n = 0
          while (n >= 0 && w < uncomp) {
            n = try in.read(out, w, uncomp - w)
            catch { case _: java.io.IOException => throw new Malformed }
            if (n > 0) w += n
          }
          if (w != uncomp || in.read() != -1) throw new Malformed
          out
        } finally in.close()
      case 6 => // zstd frame
        val zin = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
          new java.io.ByteArrayInputStream(b, off, comp))
        try {
          val out = new Array[Byte](uncomp)
          var w = 0
          var n = 0
          while (n >= 0 && w < uncomp) {
            n = try zin.read(out, w, uncomp - w)
            catch { case _: java.io.IOException => throw new Malformed }
            if (n > 0) w += n
            else if (n == 0) throw new Malformed // zero-progress guard
          }
          if (w != uncomp || zin.read() != -1) throw new Malformed
          out
        } finally zin.close()
      case 7 => // lz4_raw: one LZ4 block, decoded size known up front
        val dec = net.jpountz.lz4.LZ4Factory.fastestInstance()
          .safeDecompressor()
        val out = new Array[Byte](uncomp)
        val k =
          try dec.decompress(b, off, comp, out, 0, uncomp)
          catch { case _: net.jpountz.lz4.LZ4Exception => throw new Malformed }
        if (k != uncomp) throw new Malformed
        out
      case _ => throw new Malformed // brotli/lzo/lz4(hadoop-framed): refused
    }
  }

  private def utf8Strict(b: Array[Byte], off: Int, len: Int): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(b, off, len)).toString
    catch {
      case _: java.nio.charset.CharacterCodingException => throw new Malformed
    }
  }

  /** RLE/bit-packed hybrid run: ULEB128 headers; even = RLE run (the
   * value in ceil(w/8) LE bytes), odd = bit-packed groups of 8 values
   * (LSB-first). Decodes exactly `n` values from [start,end); the run
   * must land on `end` with only final-group padding beyond `n`. */
  private def rleHybrid(b: Array[Byte], start: Int, end: Int, bitWidth: Int,
      n: Int): Array[Int] = {
    if (bitWidth < 0 || bitWidth > 32) throw new Malformed
    val out = new Array[Int](n)
    if (n == 0) return out
    var k = 0
    val c = new Cur(b, start, end)
    while (k < n) {
      val h = c.varint()
      if ((h & 1L) == 0L) { // RLE run
        val count = h >>> 1
        if (count <= 0 || count > n - k) throw new Malformed
        val byteW = (bitWidth + 7) / 8
        val s = c.bytes(byteW.toLong)
        var v = 0
        var i = 0
        while (i < byteW) { v |= (b(s + i) & 0xff) << (8 * i); i += 1 }
        var j = 0L
        while (j < count) { out(k) = v; k += 1; j += 1 }
      } else { // bit-packed groups
        val groups = h >>> 1
        if (groups <= 0 || groups > (n.toLong - k + 7) / 8) throw new Malformed
        val s = c.bytes(groups * bitWidth)
        val total = groups * 8
        var j = 0L
        while (j < total && k < n) {
          var v = 0
          var bi = 0
          val base = j * bitWidth
          while (bi < bitWidth) {
            val bit = base + bi
            if (((b(s + (bit >>> 3).toInt) >> (bit & 7).toInt) & 1) != 0)
              v |= 1 << bi
            bi += 1
          }
          out(k) = v
          k += 1
          j += 1
        }
      }
    }
    if (c.pos != end) throw new Malformed // trailing bytes: stale locator
    out
  }

  /** One DELTA_BINARY_PACKED run: header <blockSize>
   * <miniblocksPerBlock><totalCount><firstValue zigzag>, then per
   * block <minDelta zigzag>, one bit-width byte per miniblock, and the
   * used miniblocks' LSB-first bit-packed deltas (unused trailing
   * miniblocks carry no data). Self-delimiting via its own total
   * count; returns the values and the position just past the run.
   * Wrapping i64 arithmetic is the encoding's own definition. */
  private def deltaPackedRun(b: Array[Byte], start: Int,
      end: Int): (Array[Long], Int) = {
    val c = new Cur(b, start, end)
    val blockSize = c.varint()
    val mbPerBlock = c.varint()
    val total = c.varint()
    if (blockSize <= 0 || mbPerBlock <= 0 || mbPerBlock > 512 ||
      blockSize % (mbPerBlock * 8) != 0 || total < 0 || total > (1 << 26))
      throw new Malformed // count cap: a forged header cannot balloon
    val mbSize = (blockSize / mbPerBlock).toInt
    val n = total.toInt
    val out = new Array[Long](n)
    if (n == 0) return (out, c.pos)
    val z0 = c.varint()
    var prev = (z0 >>> 1) ^ -(z0 & 1)
    out(0) = prev
    var k = 1
    while (k < n) {
      val zm = c.varint()
      val minDelta = (zm >>> 1) ^ -(zm & 1)
      val widths = new Array[Int](mbPerBlock.toInt)
      var i = 0
      while (i < widths.length) { widths(i) = c.u8(); i += 1 }
      i = 0
      while (i < widths.length && k < n) {
        val w = widths(i)
        if (w > 64) throw new Malformed
        val s = c.bytes(mbSize.toLong * w / 8)
        var j = 0
        while (j < mbSize && k < n) {
          var v = 0L
          var bi = 0
          val base = j.toLong * w
          while (bi < w) {
            val bit = base + bi
            if (((b(s + (bit >>> 3).toInt) >> (bit & 7).toInt) & 1) != 0)
              v |= 1L << bi
            bi += 1
          }
          prev += minDelta + v
          out(k) = prev
          k += 1
          j += 1
        }
        i += 1
      }
    }
    (out, c.pos)
  }

  /** PLAIN-decode `n` values from [start,end) — must tile exactly.
   * Booleans are bit-packed LSB-first (1 bit per value, final byte
   * padded); the fixed-width types are little-endian runs. */
  private def plainValues(data: Array[Byte], start: Int, end: Int, n: Int,
      ptype: Int): Array[AnyRef] = {
    val out = new Array[AnyRef](n)
    var pos = start
    var k = 0
    ptype match {
      case 0 => // boolean: bit-packed, LSB-first
        if ((end - pos).toLong != (n.toLong + 7) / 8) throw new Malformed
        while (k < n) {
          out(k) = Boolean.box(((data(pos + (k >> 3)) >> (k & 7)) & 1) != 0)
          k += 1
        }
      case 1 => // int32
        if ((end - pos).toLong != n.toLong * 4) throw new Malformed
        while (k < n) { out(k) = Int.box(i32le(data, pos).toInt); pos += 4; k += 1 }
      case 2 => // int64
        if ((end - pos).toLong != n.toLong * 8) throw new Malformed
        while (k < n) { out(k) = Long.box(i64le(data, pos)); pos += 8; k += 1 }
      case 4 => // float
        if ((end - pos).toLong != n.toLong * 4) throw new Malformed
        while (k < n) {
          out(k) = Float.box(java.lang.Float.intBitsToFloat(i32le(data, pos).toInt))
          pos += 4
          k += 1
        }
      case 5 => // double
        if ((end - pos).toLong != n.toLong * 8) throw new Malformed
        while (k < n) {
          out(k) = Double.box(java.lang.Double.longBitsToDouble(i64le(data, pos)))
          pos += 8
          k += 1
        }
      case 6 => // byte_array (read as strict UTF-8 string)
        while (k < n) {
          if (end - pos < 4) throw new Malformed
          val len = i32le(data, pos).toInt
          pos += 4
          if (len < 0 || len > end - pos) throw new Malformed
          out(k) = utf8Strict(data, pos, len)
          pos += len
          k += 1
        }
        if (pos != end) throw new Malformed
      case _ => throw new Malformed // int96 / fixed_len_byte_array: refused
    }
    out
  }

  /** Decode the values section per its declared encoding. A page with
   * zero non-null values decodes to nothing regardless of encoding
   * (the def levels already carried every row; the region holds only
   * encoder scaffolding, e.g. empty delta-run headers). */
  private def decodeValues(data: Array[Byte], start: Int, end: Int, enc: Int,
      ptype: Int, n: Int, dict: Array[AnyRef]): Array[AnyRef] = {
    if (n == 0) return new Array[AnyRef](0)
    enc match {
      case 0 => plainValues(data, start, end, n, ptype)
      case 2 | 8 => // PLAIN_DICTIONARY (v1) / RLE_DICTIONARY (v2)
        if (dict == null) throw new Malformed // needs a dict the chunk lacks
        if (end - start < 1) throw new Malformed
        val w = data(start) & 0xff
        if (w > 32) throw new Malformed
        val idx = rleHybrid(data, start + 1, end, w, n)
        val out = new Array[AnyRef](n)
        var k = 0
        while (k < n) {
          val i = idx(k)
          if (i < 0 || i >= dict.length) throw new Malformed
          out(k) = dict(i)
          k += 1
        }
        out
      case 3 => // RLE as a VALUE encoding (v2 booleans): u32-LE length
        // prefix + one hybrid run of 1-bit values
        if (ptype != 0) throw new Malformed
        if (end - start < 4) throw new Malformed
        val rl = i32le(data, start).toInt
        if (rl < 0 || rl != end - start - 4) throw new Malformed
        val bits = rleHybrid(data, start + 4, end, 1, n)
        val out = new Array[AnyRef](n)
        var k = 0
        while (k < n) { out(k) = Boolean.box(bits(k) != 0); k += 1 }
        out
      case 5 => // DELTA_BINARY_PACKED (int64 or int32 — i32 wraps mod 2^32)
        if (ptype != 2 && ptype != 1) throw new Malformed
        val (longs, p) = deltaPackedRun(data, start, end)
        if (longs.length != n || p != end) throw new Malformed
        val out = new Array[AnyRef](n)
        var k = 0
        if (ptype == 2)
          while (k < n) { out(k) = Long.box(longs(k)); k += 1 }
        else
          while (k < n) { out(k) = Int.box(longs(k).toInt); k += 1 }
        out
      case 6 => // DELTA_LENGTH_BYTE_ARRAY: delta-packed lengths + bytes
        if (ptype != 6) throw new Malformed
        val (lens, p) = deltaPackedRun(data, start, end)
        if (lens.length != n) throw new Malformed
        val out = new Array[AnyRef](n)
        var pos = p
        var k = 0
        while (k < n) {
          val len = lens(k)
          if (len < 0 || len > end - pos) throw new Malformed
          out(k) = utf8Strict(data, pos, len.toInt)
          pos += len.toInt
          k += 1
        }
        if (pos != end) throw new Malformed
        out
      case 7 => // DELTA_BYTE_ARRAY: prefix lens + suffix lens + suffixes
        if (ptype != 6) throw new Malformed
        val (pre, p1) = deltaPackedRun(data, start, end)
        val (suf, p2) = deltaPackedRun(data, p1, end)
        if (pre.length != n || suf.length != n) throw new Malformed
        val out = new Array[AnyRef](n)
        var prev = new Array[Byte](0)
        var pos = p2
        var k = 0
        while (k < n) {
          val pl = pre(k)
          val sl = suf(k)
          if (pl < 0 || pl > prev.length || sl < 0 || sl > end - pos)
            throw new Malformed
          val v = new Array[Byte](pl.toInt + sl.toInt)
          System.arraycopy(prev, 0, v, 0, pl.toInt)
          System.arraycopy(data, pos, v, pl.toInt, sl.toInt)
          out(k) = utf8Strict(v, 0, v.length)
          prev = v
          pos += sl.toInt
          k += 1
        }
        if (pos != end) throw new Malformed
        out
      case _ => throw new Malformed // BYTE_STREAM_SPLIT etc.: refused
    }
  }

  /** Bits needed to carry values 0..max (parquet level width). */
  private def bitsFor(max: Int): Int =
    if (max <= 0) 0 else 32 - Integer.numberOfLeadingZeros(max)

  /** Dremel record assembly for a single-repeated-node leaf
   * (`maxRep == 1`): each rep==0 level entry starts a row, rep==1
   * continues the current list; the def level classifies null list /
   * empty list / null element / present element per [[Leaf]]. The
   * first entry of a page must start a row (pages are row-aligned —
   * a record split across pages refuses rather than mis-assembles).
   * Returns one value per ROW: null or a Vector of elements. */
  private def assembleRows(reps: Array[Int], defs: Array[Int],
      vals: Array[AnyRef], leaf: Leaf): Array[AnyRef] = {
    val n = defs.length
    if (reps.length != n) throw new Malformed
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](n)
    var cur: scala.collection.mutable.ArrayBuffer[AnyRef] = null
    var curNull = false
    var started = false
    def push(): Unit = if (started) {
      out += (if (curNull) null else Vector(cur.toSeq: _*))
    }
    var v = 0
    var k = 0
    while (k < n) {
      val r = reps(k)
      val d = defs(k)
      if (r < 0 || r > leaf.maxRep || d < 0 || d > leaf.maxDef)
        throw new Malformed
      if (r == 0) { // a new row
        push()
        started = true
        cur = new scala.collection.mutable.ArrayBuffer[AnyRef](4)
        curNull = false
        if (d < leaf.defList) curNull = true // list null at an ancestor
        else if (d == leaf.defList) () // empty list
        else if (d == leaf.maxDef) { cur += vals(v); v += 1 }
        else cur += null // element null
      } else { // continuation of the current list
        if (!started || curNull || // a null/absent list cannot continue
          d <= leaf.defList) throw new Malformed
        if (d == leaf.maxDef) { cur += vals(v); v += 1 }
        else cur += null
      }
      k += 1
    }
    push()
    if (v != vals.length) throw new Malformed
    out.toArray
  }

  /** Merge non-null values back into row order via the def levels. */
  private def assemble(defs: Array[Int], vals: Array[AnyRef], n: Int,
      maxDef: Int): Array[AnyRef] = {
    if (defs == null) {
      if (vals.length != n) throw new Malformed
      return vals
    }
    val out = new Array[AnyRef](n)
    var k = 0
    var v = 0
    while (k < n) {
      val d = defs(k)
      if (d < 0 || d > maxDef) throw new Malformed
      if (d == maxDef) { out(k) = vals(v); v += 1 }
      k += 1
    }
    if (v != vals.length) throw new Malformed
    out
  }

  /** Decode the chunk's dictionary page at `dictionary_page_offset`. */
  private def decodeDictPage(b: Array[Byte], off: Long, codec: Int,
      ptype: Int): Array[AnyRef] = {
    if (off < 0 || off >= b.length) throw new Malformed
    val h = parsePageHeader(b, off.toInt, b.length)
    if (h.ptype != 2 || h.dictN < 0) throw new Malformed
    if (h.dictEnc != 0 && h.dictEnc != 2) throw new Malformed // PLAIN forms
    if (h.comp < 0 || h.comp > b.length - h.end) throw new Malformed
    checkPageCrc(b, h)
    val data = inflatePage(b, h.end, h.comp, h.uncomp, codec)
    plainValues(data, 0, data.length, h.dictN, ptype)
  }

  /** Decode ONE data page from the byte range its OffsetIndex locator
   * names: [off, off+size) must hold exactly PageHeader + body.
   * Returns (per-ROW values, level-entry count): for a flat leaf the
   * two counts coincide; for a repeated leaf the rows are assembled
   * lists and the level count is the page's num_values. */
  private def decodeDataPage(b: Array[Byte], off: Long, size: Long,
      codec: Int, leaf: Leaf, dict: Array[AnyRef]): (Array[AnyRef], Int) = {
    if (off < 0 || size <= 0 || size > b.length - off) throw new Malformed
    val lim = (off + size).toInt
    val h = parsePageHeader(b, off.toInt, lim)
    if (h.end.toLong + h.comp != lim) throw new Malformed // exact tiling
    checkPageCrc(b, h)
    val maxDef = leaf.maxDef
    val maxRep = leaf.maxRep
    val defW = bitsFor(maxDef)
    val repW = bitsFor(maxRep)
    val rows = h.ptype match {
      case 0 => // v1 DATA_PAGE: body fully compressed (levels included);
        // rep levels precede def levels, each u32-LE length-prefixed RLE
        if (h.nValues < 0 || h.enc < 0) throw new Malformed
        val data = inflatePage(b, h.end, h.comp, h.uncomp, codec)
        var pos = 0
        def lvlRun(width: Int): Array[Int] = {
          if (h.defEnc != 3) throw new Malformed // RLE only
          if (data.length - pos < 4) throw new Malformed
          val dl = i32le(data, pos).toInt
          pos += 4
          if (dl < 0 || dl > data.length - pos) throw new Malformed
          val r = rleHybrid(data, pos, pos + dl, width, h.nValues)
          pos += dl
          r
        }
        val reps: Array[Int] =
          if (maxRep == 0) null
          else {
            if (h.repEnc != 3) throw new Malformed // RLE only (v1 field 4)
            lvlRun(repW)
          }
        val defs: Array[Int] = if (maxDef == 0) null else lvlRun(defW)
        val nNonNull = if (defs == null) h.nValues else defs.count(_ == maxDef)
        val vals = decodeValues(data, pos, data.length, h.enc, leaf.ptype,
          nNonNull, dict)
        if (reps == null) assemble(defs, vals, h.nValues, maxDef)
        else assembleRows(reps, defs, vals, leaf)
      case 3 => // DATA_PAGE_V2: level sections first, NEVER compressed,
        // no length prefixes — rep section is repLen2 bytes, def defLen2
        if (h.nValues < 0 || h.enc < 0 || h.defLen2 < 0 || h.repLen2 < 0)
          throw new Malformed
        if ((maxRep == 0) != (h.repLen2 == 0)) throw new Malformed
        val lvlStart = h.end
        if (h.repLen2.toLong + h.defLen2 > h.comp) throw new Malformed
        val reps: Array[Int] =
          if (maxRep == 0) null
          else rleHybrid(b, lvlStart, lvlStart + h.repLen2, repW, h.nValues)
        val defStart = lvlStart + h.repLen2
        val defs: Array[Int] =
          if (maxDef == 0) {
            if (h.defLen2 != 0) throw new Malformed
            null
          } else rleHybrid(b, defStart, defStart + h.defLen2, defW, h.nValues)
        val dataOff = defStart + h.defLen2
        val dataComp = h.comp - h.repLen2 - h.defLen2
        val dataUncomp = h.uncomp - h.repLen2 - h.defLen2
        if (dataUncomp < 0) throw new Malformed
        val data =
          if (h.compressed2) inflatePage(b, dataOff, dataComp, dataUncomp, codec)
          else {
            if (dataComp != dataUncomp) throw new Malformed
            java.util.Arrays.copyOfRange(b, dataOff, dataOff + dataComp)
          }
        val nNonNull = if (defs == null) h.nValues else defs.count(_ == maxDef)
        if (h.nNulls >= 0 && h.nValues - nNonNull != h.nNulls)
          throw new Malformed // header/levels disagreement
        val vals = decodeValues(data, 0, data.length, h.enc, leaf.ptype,
          nNonNull, dict)
        if (reps == null) assemble(defs, vals, h.nValues, maxDef)
        else assembleRows(reps, defs, vals, leaf)
      case _ => throw new Malformed // dictionary/index page at a data locator
    }
    (rows, h.nValues)
  }

  /** Decoded values of one column chunk, in row order, nulls in
   * place (boxed JVM primitives per physical type; String for
   * BYTE_ARRAY; for a repeated leaf each row value is a Vector of
   * element values — or null for a null list). */
  final case class DecodedChunk(rgNo: Int, path: String, ptype: Int,
      values: IndexedSeq[AnyRef])

  /**
   * Decode EVERY supported column chunk of a flat-schema parquet file.
   * Chunks carrying an OffsetIndex decode page-by-page through the
   * locators (the page-SKIP read path — each page from its located
   * byte range alone, `first_row_index` re-validated against the
   * running row count); chunks without one (pyarrow's default) walk
   * sequentially, with the pages required to tile the chunk's declared
   * `total_compressed_size` byte run exactly. BOOLEAN, INT32, INT64,
   * FLOAT, DOUBLE and BYTE_ARRAY leaves decode — flat, struct-nested,
   * or under one repeated node (single-level lists, Dremel-assembled
   * per row); INT96 and FIXED_LEN_BYTE_ARRAY are skipped (censused
   * above, not valued), deeper repetition is skipped per-leaf. None
   * on any structural violation, locator disagreement, row or level
   * count mismatch, or unsupported codec/encoding on a supported
   * leaf.
   */
  def decodeFlatColumns(payload: Array[Byte]): Option[IndexedSeq[DecodedChunk]] = {
    val b = payload
    if (b == null || b.length < 12) return None
    if (b(0) != 'P' || b(1) != 'A' || b(2) != 'R' || b(3) != '1') return None
    val n = b.length
    if (b(n - 4) != 'P' || b(n - 3) != 'A' || b(n - 2) != 'R' ||
      b(n - 1) != '1') return None
    val flen = (b(n - 8) & 0xffL) | ((b(n - 7) & 0xffL) << 8) |
      ((b(n - 6) & 0xffL) << 16) | ((b(n - 5) & 0xffL) << 24)
    if (flen <= 0 || flen > n - 12) return None
    val c = new Cur(b, n - 8 - flen.toInt, n - 8)
    try {
      var leaves: IndexedSeq[Leaf] = null
      // (meta, oiOff, oiLen, rgRows) per chunk
      val recs = scala.collection.mutable.ArrayBuffer
        .empty[(ChunkMeta, Long, Long, Long)]
      walkStruct(c) { (fid, tpe) =>
        (fid, tpe) match {
          case (2L, 9) => leaves = parseLeaves(c, b); true
          case (4L, 9) =>
            val (nRg, et) = listHeader(c)
            if (et != 12) throw new Malformed
            var rg = 0L
            while (rg < nRg) {
              var rgRows = -1L
              val rgChunks = scala.collection.mutable.ArrayBuffer
                .empty[(ChunkMeta, Long, Long)]
              walkStruct(c) { (rfid, rtpe) =>
                (rfid, rtpe) match {
                  case (1L, 9) =>
                    val (nCol, cet) = listHeader(c)
                    if (cet != 12) throw new Malformed
                    var ci = 0L
                    while (ci < nCol) {
                      var meta: Option[ChunkMeta] = None
                      var oiOff = -1L
                      var oiLen = -1L
                      walkStruct(c) { (cfid, ctpe) =>
                        (cfid, ctpe) match {
                          case (3L, 12) =>
                            meta = Some(parseColumnMetaData(c, rg.toInt, ci.toInt))
                            true
                          case (4L, 6) => oiOff = c.zigzag(); true
                          case (5L, 5) => oiLen = c.zigzag(); true
                          case _ => false
                        }
                      }
                      meta match {
                        case Some(m) => rgChunks += ((m, oiOff, oiLen))
                        case None => throw new Malformed // encrypted form
                      }
                      ci += 1
                    }
                    true
                  case (3L, 6) => rgRows = c.zigzag(); true
                  case _ => false
                }
              }
              if (rgRows < 0) throw new Malformed
              rgChunks.foreach { case (m, o, l) => recs += ((m, o, l, rgRows)) }
              rg += 1
            }
            true
          case _ => false
        }
      }
      if (leaves == null || recs.isEmpty) throw new Malformed
      val byName = leaves.map(l => l.path -> l).toMap
      val out = scala.collection.mutable.ArrayBuffer.empty[DecodedChunk]
      recs.foreach { case (m, oiOff, oiLen, rgRows) =>
        val leaf = byName.getOrElse(m.path, throw new Malformed)
        if (leaf.ptype != m.ptype) throw new Malformed
        // boolean/int32/int64/float/double/byte_array decode; int96 and
        // fixed_len_byte_array are censused above but not valued
        if ((m.ptype <= 2 || m.ptype == 4 || m.ptype == 5 || m.ptype == 6)
          && leaf.maxRep <= 1) {
          val vals = new scala.collection.mutable.ArrayBuffer[AnyRef](
            math.min(rgRows, 1 << 20).toInt)
          var levels = 0L
          if (oiOff >= 0 && oiLen > 0) {
            // page-SKIP path: every data page decoded from the byte
            // range its OffsetIndex locator names, alone
            val pages = parseOffsetIndex(b, oiOff, oiLen)
            val dict = m.dictPageOffset
              .map(decodeDictPage(b, _, m.codec, m.ptype)).orNull
            pages.foreach { case (pOff, pSize, pRow) =>
              if (pRow != vals.size.toLong) throw new Malformed // stale locator
              val (rows, nl) = decodeDataPage(b, pOff, pSize, m.codec, leaf,
                dict)
              vals ++= rows
              levels += nl
            }
          } else {
            // SEQUENTIAL path (no page index — e.g. pyarrow defaults):
            // pages must tile the chunk's declared byte run
            // [start, start + total_compressed_size) exactly
            val start = m.dictPageOffset.getOrElse(m.dataPageOffset)
            if (start < 0 || m.compBytes <= 0 ||
              m.compBytes > b.length - start) throw new Malformed
            val lim = start + m.compBytes
            var dict: Array[AnyRef] = null
            var pos = start
            while (pos < lim) {
              val h = parsePageHeader(b, pos.toInt, lim.toInt)
              h.ptype match {
                case 2 =>
                  if (dict != null || vals.nonEmpty) throw new Malformed
                  if (m.dictPageOffset.exists(_ != pos)) throw new Malformed
                  dict = decodeDictPage(b, pos, m.codec, m.ptype)
                case 0 | 3 =>
                  val (rows, nl) = decodeDataPage(b, pos,
                    (h.end - pos) + h.comp, m.codec, leaf, dict)
                  vals ++= rows
                  levels += nl
                case _ => throw new Malformed // index page mid-chunk
              }
              pos = h.end + h.comp
            }
            if (pos != lim) throw new Malformed
          }
          if (vals.size.toLong != rgRows || levels != m.numValues)
            throw new Malformed // row and level totals must both close
          out += DecodedChunk(m.rgNo, m.path, m.ptype, vals.toIndexedSeq)
        }
      }
      if (out.isEmpty) throw new Malformed
      Some(out.toIndexedSeq)
    } catch {
      case _: Malformed => None
      case _: IndexOutOfBoundsException => None
    }
  }

  /** Output schema of [[parquetDecodeLongStr]]. */
  val decodeLongStrSchema: StructType = StructType(Seq(
    StructField("file_id", LongType),
    StructField("long_val", LongType),
    StructField("str_val", StringType)))

  /** Decode one INT64 leaf and one BYTE_ARRAY leaf of each flat
   * parquet payload and emit their values ZIPPED per row (row-group
   * order) — the pairing proves cross-column row alignment of the
   * page-skip decode. Payloads that refuse contribute nothing.
   * Narrow mapPartitions. */
  def parquetDecodeLongStr(df: DataFrame, idCol: String, payloadCol: String,
      longPath: String, strPath: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val fid = r.getLong(idIdx)
        decodeFlatColumns(r.getAs[Array[Byte]](pIdx)) match {
          case Some(chunks) =>
            chunks.groupBy(_.rgNo).toSeq.sortBy(_._1).iterator.flatMap {
              case (_, cs) =>
                val lc = cs.find(c => c.path == longPath && c.ptype == 2)
                val sc = cs.find(c => c.path == strPath && c.ptype == 6)
                (lc, sc) match {
                  case (Some(l), Some(s0)) if l.values.size == s0.values.size =>
                    l.values.iterator.zip(s0.values.iterator).map {
                      case (lv, sv) => Row(fid, lv, sv)
                    }
                  case _ => Iterator.empty
                }
            }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(decodeLongStrSchema))
  }

  /** Output schema of [[parquetDecodeLists]]. */
  val decodeListsSchema: StructType = StructType(Seq(
    StructField("file_id", LongType),
    StructField("long_val", LongType),
    StructField("nums", ArrayType(LongType, true)),
    StructField("tags", ArrayType(StringType, true))))

  /** Output schema of [[parquetDecodeMap]]. */
  val decodeMapSchema: StructType = StructType(Seq(
    StructField("file_id", LongType),
    StructField("long_val", LongType),
    StructField("m", MapType(StringType, LongType, true))))

  /** Decode one MAP<STRING,INT64> column (the writer's
   * `col.key_value.{key,value}` shape) beside a flat INT64 key
   * column (m62): the map's two leaves Dremel-assemble as PARALLEL
   * per-row lists — the required key leaf has no null-element band,
   * the optional value leaf does — and zip into a Spark map per row.
   * A key/value row-shape disagreement (different list sizes or
   * one-sided nulls) refuses the file. Narrow mapPartitions. */
  def parquetDecodeMap(df: DataFrame, idCol: String, payloadCol: String,
      longPath: String, keyPath: String, valuePath: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val fid = r.getLong(idIdx)
        decodeFlatColumns(r.getAs[Array[Byte]](pIdx)) match {
          case Some(chunks) =>
            try {
              chunks.groupBy(_.rgNo).toSeq.sortBy(_._1).iterator.flatMap {
                case (_, cs) =>
                  val lc = cs.find(c => c.path == longPath && c.ptype == 2)
                  val kc = cs.find(c => c.path == keyPath && c.ptype == 6)
                  val vc = cs.find(c => c.path == valuePath && c.ptype == 2)
                  (lc, kc, vc) match {
                    case (Some(l), Some(k), Some(v))
                      if k.values.size == l.values.size &&
                        v.values.size == l.values.size =>
                      (0 until l.values.size).iterator.map { i =>
                        val m = (k.values(i), v.values(i)) match {
                          case (null, null) => null
                          case (ks: Vector[_], vs: Vector[_])
                            if ks.size == vs.size =>
                            ks.zip(vs).map { case (kk, vv) =>
                              (kk.asInstanceOf[String], vv)
                            }.toMap
                          case _ => throw new Malformed // shape split
                        }
                        Row(fid, l.values(i), m)
                      }
                    case _ => Iterator.empty
                  }
              }.toVector.iterator // force: surface Malformed here
            } catch { case _: Malformed => Iterator.empty }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(decodeMapSchema))
  }

  /** Decode one flat INT64 leaf plus one INT64 LIST and one
   * BYTE_ARRAY LIST (the Spark writer's 3-level
   * `col.list.element` shape) from each parquet payload and emit
   * them ZIPPED per row (m57) — null lists, empty lists and null
   * elements all faithfully distinguished through the Dremel
   * rep/def assembly. Payloads that refuse contribute nothing.
   * Narrow mapPartitions. */
  def parquetDecodeLists(df: DataFrame, idCol: String, payloadCol: String,
      longPath: String, numsPath: String, tagsPath: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val fid = r.getLong(idIdx)
        decodeFlatColumns(r.getAs[Array[Byte]](pIdx)) match {
          case Some(chunks) =>
            chunks.groupBy(_.rgNo).toSeq.sortBy(_._1).iterator.flatMap {
              case (_, cs) =>
                val lc = cs.find(c => c.path == longPath && c.ptype == 2)
                val nc = cs.find(c => c.path == numsPath && c.ptype == 2)
                val tc = cs.find(c => c.path == tagsPath && c.ptype == 6)
                (lc, nc, tc) match {
                  case (Some(l), Some(nn), Some(tt))
                    if nn.values.size == l.values.size &&
                      tt.values.size == l.values.size =>
                    (0 until l.values.size).iterator.map { i =>
                      def toSeq(v: AnyRef): Seq[Any] = v match {
                        case null => null
                        case xs: Vector[_] => xs
                        case _ => throw new Malformed
                      }
                      Row(fid, l.values(i), toSeq(nn.values(i)),
                        toSeq(tt.values(i)))
                    }
                  case _ => Iterator.empty
                }
            }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(decodeListsSchema))
  }

  /** One row per row group (file order) with the file-level projection
   * repeated; non-parquet / structurally unclean payloads contribute
   * nothing. Narrow mapPartitions — O(footer) per file. */
  def parquetFooters(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseFooter(r.getAs[Array[Byte]](pIdx)) match {
          case Some(f) => f.rowGroups.iterator.zipWithIndex.map {
            case ((rows, bytes), i) =>
              Row(id, f.version, f.numRows, f.numLeafColumns,
                f.createdBy.orNull, i, rows, bytes)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(footerSchema))
  }
}
