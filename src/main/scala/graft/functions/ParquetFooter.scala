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
      bloomOffset: Option[Long] = None, bloomLength: Option[Long] = None)

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
        case (14L, 6) => bloomOff = Some(c.zigzag()); true
        case (15L, 5) => bloomLen = Some(c.zigzag()); true
        case _ => false
      }
    }
    if (ptype < 0 || codec < 0 || numValues < 0 || uncomp < 0 || comp < 0)
      throw new Malformed // required ColumnMetaData fields missing
    ChunkMeta(rgNo, colNo, parts.mkString("."), ptype, codec, numValues,
      uncomp, comp, encs.toIndexedSeq, nullCount, minL, maxL, minS, maxS,
      bloomOff, bloomLen)
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
