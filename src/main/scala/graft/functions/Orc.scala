package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * ORC file-tail census — the [[ParquetFooter]] sibling for the other
 * columnar lake format. Reads ONLY the tail metadata: the 1-byte
 * postscript length, the (never-compressed) postscript protobuf, and
 * the footer protobuf it locates, decompressed when the postscript
 * declares ZLIB (raw-deflate chunks), SNAPPY (block format decoded
 * from the public format description), LZ4 (block format via the
 * public lz4-java decompressor Spark already ships) or ZSTD (frames
 * via the public zstd-jni stream decoder — the modern default ORC
 * codec, so the newest lakes census too). No stripe data is touched —
 * ~0.01% of the bytes a row-decoding census would read.
 *
 * Facts honored (ORC v1 specification, orc.apache.org):
 *   - the file opens with the 3-byte magic `ORC` and closes with
 *     [footer][postscript][psLen:1]; the postscript is at most 255
 *     bytes and is NEVER compressed;
 *   - postscript fields: footerLength(1), compression(2: 0 NONE,
 *     1 ZLIB, 2 SNAPPY, 3 LZO, 4 LZ4, 5 ZSTD), compressionBlockSize(3),
 *     version(4, packed), metadataLength(5), writerVersion(6),
 *     magic(8000) which must equal `ORC`;
 *   - compressed streams are CHUNKED: each chunk opens with a 3-byte
 *     little-endian header `(length << 1) | isOriginal`, an original
 *     chunk is stored raw, a compressed ZLIB chunk is a raw DEFLATE
 *     stream, a compressed SNAPPY chunk is one snappy block
 *     (varint uncompressed length + literal/copy tags);
 *   - footer fields: headerLength(1) = 3, contentLength(2),
 *     stripes(3: offset/indexLength/dataLength/footerLength/
 *     numberOfRows), types(4: kind/subtypes/fieldNames),
 *     numberOfRows(6), rowIndexStride(8).
 *
 * Strict posture: bad magic (either end), postscript overrun, a chunk
 * that does not tile its stream exactly, a deflate/snappy stream that
 * overruns or underruns its declared size, footer fields that
 * disagree (stripe row sum vs numberOfRows is REPORTED, not assumed),
 * or an unsupported decompression kind (LZO only — census can
 * still be had by rewriting the lake's tail, not by guessing) → None.
 * Unknown protobuf fields are skipped by wire type — forward
 * compatible, never a throw.
 *
 * Narrow mapPartitions — zero exchanges.
 */
object Orc {

  /** One file's tail projection. `stripeRows` preserves stripe order;
   * `stripes` carries the full per-stripe locator five-tuple
   * (offset, indexLength, dataLength, footerLength, numberOfRows) —
   * what a ranged reader needs to seek a stripe footer (r16). */
  final case class Tail(numRows: Long, contentBytes: Long,
      compression: String, footerBytes: Long, rowIndexStride: Long,
      nTypes: Int, nRootFields: Int, stripeRows: IndexedSeq[Long],
      stripeDataBytes: IndexedSeq[Long],
      stripes: IndexedSeq[(Long, Long, Long, Long, Long)] = IndexedSeq.empty,
      compressionKind: Int = 0,
      typeKinds: IndexedSeq[Int] = IndexedSeq.empty,
      rootSubtypes: IndexedSeq[Long] = IndexedSeq.empty,
      rootFieldNames: IndexedSeq[String] = IndexedSeq.empty,
      allSubtypes: IndexedSeq[IndexedSeq[Long]] = IndexedSeq.empty)

  private final class Malformed extends RuntimeException

  /** Protobuf cursor; every read is subtractive-bounds-checked. */
  private final class P(val b: Array[Byte], var pos: Int, val end: Int) {
    def done: Boolean = pos >= end
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
    def bytes(n: Long): Int = { // returns start offset of the run
      if (n < 0 || n > end - pos) throw new Malformed
      val s = pos; pos += n.toInt; s
    }
    def skipField(wire: Int): Unit = wire match {
      case 0 => varint(): Unit
      case 1 => bytes(8): Unit
      case 2 => val n = varint(); bytes(n): Unit
      case 5 => bytes(4): Unit
      case _ => throw new Malformed // groups (3/4) never appear in ORC
    }
  }

  // ---- chunked-stream decompression ------------------------------------

  /** Decode one snappy block (format_description.txt): varint
   * uncompressed length, then literal/copy elements. Returns bytes
   * written at `at`; strict overrun/underrun checks. */
  private def snappyChunk(b: Array[Byte], off: Int, len: Int,
      out: Array[Byte], at: Int): Int = {
    val c = new P(b, off, off + len)
    val want = c.varint()
    if (want < 0 || want > out.length - at) throw new Malformed
    var w = at
    val lim = at + want.toInt
    while (!c.done) {
      val tag = c.u8()
      (tag & 3) match {
        case 0 => // literal
          var n = (tag >> 2) + 1
          if (n > 60) {
            val extra = n - 60 // 1..4 length bytes, little-endian
            var v = 0L
            var i = 0
            while (i < extra) { v |= (c.u8().toLong << (8 * i)); i += 1 }
            if (v < 0 || v + 1 > Int.MaxValue) throw new Malformed
            n = v.toInt + 1
          }
          val s = c.bytes(n.toLong)
          if (n > lim - w) throw new Malformed
          System.arraycopy(b, s, out, w, n)
          w += n
        case t => // copy
          val (n, offBack) = t match {
            case 1 =>
              val nn = ((tag >> 2) & 7) + 4
              val o = ((tag >> 5) << 8) | c.u8()
              (nn, o)
            case 2 =>
              val o = c.u8() | (c.u8() << 8)
              ((tag >> 2) + 1, o)
            case _ =>
              val o = c.u8() | (c.u8() << 8) | (c.u8() << 16) |
                (c.u8() << 24)
              if (o < 0) throw new Malformed
              ((tag >> 2) + 1, o)
          }
          if (offBack <= 0 || offBack > w - at || n > lim - w)
            throw new Malformed
          var i = 0 // overlapping copies are byte-serial by definition
          while (i < n) { out(w + i) = out(w + i - offBack); i += 1 }
          w += n
      }
    }
    if (w != lim) throw new Malformed // underrun: declared length unmet
    w - at
  }

  // ---- tail walk --------------------------------------------------------

  private def compressionName(k: Long): String = k match {
    case 0 => "none"
    case 1 => "zlib"
    case 2 => "snappy"
    case 3 => "lzo"
    case 4 => "lz4"
    case 5 => "zstd"
    case other => s"kind_$other"
  }

  /**
   * Walk one ORC file's tail. None on anything but a structurally
   * clean v1 tail whose footer the declared compression lets us read
   * (NONE/ZLIB/SNAPPY/LZ4/ZSTD; LZO tails are recognized but refused —
   * a deliberate census-only boundary, like the ZIP walker's bzip2).
   */
  def parseTail(payload: Array[Byte]): Option[Tail] = {
    val b = payload
    if (b == null || b.length < 3 + 1 + 1 + 4) return None
    if (b(0) != 'O' || b(1) != 'R' || b(2) != 'C') return None
    try {
      val psLen = b(b.length - 1) & 0xff
      if (psLen < 1 || psLen > b.length - 4) return None
      val psStart = b.length - 1 - psLen
      // ---- postscript (never compressed) ----
      val ps = new P(b, psStart, psStart + psLen)
      var footerLen = -1L
      var kind = 0L
      var magicOk = false
      while (!ps.done) {
        val key = ps.varint()
        val field = (key >>> 3).toInt
        val wire = (key & 7).toInt
        (field, wire) match {
          case (1, 0) => footerLen = ps.varint()
          case (2, 0) => kind = ps.varint()
          case (8000, 2) =>
            val n = ps.varint()
            val s = ps.bytes(n)
            magicOk = n == 3 && b(s) == 'O' && b(s + 1) == 'R' && b(s + 2) == 'C'
          case _ => ps.skipField(wire)
        }
      }
      if (!magicOk || footerLen <= 0 || footerLen > psStart.toLong)
        return None
      val footerStart = psStart - footerLen.toInt
      // ---- footer (possibly chunk-compressed) ----
      val footer: Array[Byte] = kind match {
        case 0 =>
          java.util.Arrays.copyOfRange(b, footerStart, psStart)
        case 1 | 2 | 4 | 5 =>
          // decoded size is not declared for the footer stream; decode
          // chunk-by-chunk into a growable buffer. The footer is small
          // (KBs), so decode into a bounded scratch of 64 MiB max to
          // keep a forged tail from ballooning memory.
          decodeStreamUnsized(b, footerStart, footerLen, kind.toInt)
        case _ => return None // lzo: recognized, refused
      }
      val f = new P(footer, 0, footer.length)
      var headerLen = -1L
      var contentLen = -1L
      var numRows = -1L
      var stride = 0L
      var nTypes = 0
      var nRootFields = -1
      val stripeRows = scala.collection.mutable.ArrayBuffer.empty[Long]
      val stripeData = scala.collection.mutable.ArrayBuffer.empty[Long]
      val stripes = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long, Long)]
      val typeKinds = scala.collection.mutable.ArrayBuffer.empty[Int]
      val rootSubs = scala.collection.mutable.ArrayBuffer.empty[Long]
      val allSubs =
        scala.collection.mutable.ArrayBuffer.empty[IndexedSeq[Long]]
      val rootNames = scala.collection.mutable.ArrayBuffer.empty[String]
      while (!f.done) {
        val key = f.varint()
        val field = (key >>> 3).toInt
        val wire = (key & 7).toInt
        (field, wire) match {
          case (1, 0) => headerLen = f.varint()
          case (2, 0) => contentLen = f.varint()
          case (3, 2) => // StripeInformation
            val n = f.varint()
            val s = f.bytes(n)
            val sp = new P(footer, s, s + n.toInt)
            var off = -1L
            var idx = -1L
            var rows = -1L
            var data = -1L
            var flen2 = -1L
            while (!sp.done) {
              val k2 = sp.varint()
              ((k2 >>> 3).toInt, (k2 & 7).toInt) match {
                case (1, 0) => off = sp.varint()
                case (2, 0) => idx = sp.varint()
                case (3, 0) => data = sp.varint()
                case (4, 0) => flen2 = sp.varint()
                case (5, 0) => rows = sp.varint()
                case (_, w2) => sp.skipField(w2)
              }
            }
            if (rows < 0 || data < 0 || off < 0 || idx < 0 || flen2 < 0)
              return None
            stripeRows += rows
            stripeData += data
            stripes += ((off, idx, data, flen2, rows))
          case (4, 2) => // Type
            val n = f.varint()
            val s = f.bytes(n)
            nTypes += 1
            val tp = new P(footer, s, s + n.toInt)
            var kind2 = 0L // proto default: BOOLEAN(0) when omitted
            val subs = scala.collection.mutable.ArrayBuffer.empty[Long]
            while (!tp.done) {
              val k2 = tp.varint()
              ((k2 >>> 3).toInt, (k2 & 7).toInt) match {
                case (1, 0) => kind2 = tp.varint()
                case (2, 0) => // subtype id
                  subs += tp.varint()
                case (2, 2) => // packed repeated subtypes
                  val pn = tp.varint()
                  val pe = tp.bytes(pn) + pn.toInt
                  val pp = new P(footer, pe - pn.toInt, pe)
                  while (!pp.done) subs += pp.varint()
                case (3, 2) if nTypes == 1 => // root fieldNames
                  val fn = tp.varint()
                  val fs = tp.bytes(fn)
                  rootNames += new String(footer, fs, fn.toInt, "UTF-8")
                case (_, w2) => tp.skipField(w2)
              }
            }
            typeKinds += kind2.toInt
            allSubs += subs.toIndexedSeq
            if (nTypes == 1) { rootSubs ++= subs; nRootFields = rootSubs.size }
          case (6, 0) => numRows = f.varint()
          case (8, 0) => stride = f.varint()
          case (_, w) => f.skipField(w)
        }
      }
      if (headerLen != 3 || numRows < 0 || contentLen < 0 || nTypes == 0)
        return None
      Some(Tail(numRows, contentLen, compressionName(kind), footerLen,
        stride, nTypes, math.max(nRootFields, 0),
        stripeRows.toIndexedSeq, stripeData.toIndexedSeq,
        stripes.toIndexedSeq, kind.toInt, typeKinds.toIndexedSeq,
        rootSubs.toIndexedSeq, rootNames.toIndexedSeq,
        allSubs.toIndexedSeq))
    } catch {
      case _: Malformed => None
      case _: IndexOutOfBoundsException => None // belt and braces
    }
  }

  /** Decode a chunked stream whose decoded size is unknown (the footer
   * stream): chunks decode serially into a growing buffer, hard-capped
   * at 64 MiB so a forged tail cannot balloon executor memory. */
  private def decodeStreamUnsized(b: Array[Byte], start: Int,
      compLen: Long, kind: Int): Array[Byte] = {
    if (compLen < 0 || compLen > b.length - start) throw new Malformed
    val cap = 64 << 20
    var out = new Array[Byte](math.min(cap, math.max(1024, compLen.toInt * 4)))
    var pos = start
    val end = start + compLen.toInt
    var w = 0
    def ensure(n: Int): Unit = {
      if (n > cap - w) throw new Malformed
      if (w + n > out.length)
        out = java.util.Arrays.copyOf(out,
          math.min(cap, math.max(out.length * 2, w + n)))
    }
    while (pos < end) {
      if (end - pos < 3) throw new Malformed
      val h = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
        ((b(pos + 2) & 0xff) << 16)
      val clen = h >>> 1
      val original = (h & 1) == 1
      pos += 3
      if (clen <= 0 || clen > end - pos) throw new Malformed
      if (original) {
        ensure(clen)
        System.arraycopy(b, pos, out, w, clen)
        w += clen
      } else if (kind == 1) {
        // raw deflate of unknown decoded size: inflate incrementally
        val inf = new java.util.zip.Inflater(true)
        try {
          inf.setInput(b, pos, clen)
          while (!inf.finished()) {
            ensure(4096)
            val k = inf.inflate(out, w, math.min(4096, out.length - w))
            if (k == 0 && inf.needsInput()) throw new Malformed
            w += k
          }
          if (inf.getBytesRead != clen) throw new Malformed
        } catch {
          case _: java.util.zip.DataFormatException => throw new Malformed
        } finally inf.end()
      } else if (kind == 2) {
        // snappy declares its decoded size up front
        val peek = new P(b, pos, pos + clen)
        val want = peek.varint()
        if (want < 0 || want > cap - w) throw new Malformed
        ensure(want.toInt)
        snappyChunk(b, pos, clen, out, w): Unit
        w += want.toInt
      } else if (kind == 4) {
        // lz4 BLOCK format (what ORC's aircompressor-backed writer
        // emits) carries no decoded-size field: decompress with the
        // public lz4-java SAFE decompressor into the available scratch
        // and grow while it reports a short buffer. The decompressor
        // cannot distinguish "buffer too small" from "corrupt chunk"
        // (both are LZ4Exception), so the grow loop is bounded by the
        // FORMAT's own expansion limit — LZ4 output is < 256× the
        // compressed size, so a buffer of clen*255 can never be too
        // small for a VALID chunk; still throwing there (or at the
        // 64 MiB cap) is corruption, refused without further retries
        val dec = net.jpountz.lz4.LZ4Factory.fastestInstance()
          .safeDecompressor()
        val roomCap = math.min(cap.toLong - w, clen.toLong * 255).toInt
        var room = math.max(4096, math.min(roomCap, clen * 4))
        var decoded = -1
        while (decoded < 0) {
          ensure(room)
          try decoded = dec.decompress(b, pos, clen, out, w,
            math.min(room, out.length - w))
          catch {
            case _: net.jpountz.lz4.LZ4Exception =>
              if (room >= roomCap) throw new Malformed
              room = math.min(roomCap, room * 2)
          }
        }
        w += decoded
      } else {
        // zstd frame(s) — ORC 1.6+'s zstd-jni-backed writer emits
        // standard frames; stream-decode through the public inflater
        val zin = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
          new java.io.ByteArrayInputStream(b, pos, clen))
        try {
          var n = 1
          while (n >= 0) {
            ensure(4096)
            n = try zin.read(out, w, math.min(4096, out.length - w))
            catch { case _: java.io.IOException => throw new Malformed }
            if (n > 0) w += n
            else if (n == 0) throw new Malformed // zero-progress guard
          }
        } finally zin.close()
      }
      pos += clen
    }
    java.util.Arrays.copyOf(out, w)
  }

  // ---- data-stream VALUE decode (m53) ---------------------------------
  //
  // The m50 analog for ORC: the file footer locates stripes, each
  // stripe footer (m51) lays out the streams — and this rung DECODES
  // them. Facts honored (ORC v1 spec, orc.apache.org):
  //   - the data region starts at stripe offset + indexLength; streams
  //     occupy it in stripe-footer order (index-region streams first,
  //     inside [offset, offset+indexLength));
  //   - every stream is independently chunk-compressed with the file
  //     codec (the same framing the footer decode walks);
  //   - PRESENT streams are bits MSB-first through ORC's byte-level
  //     RLE (control 0..127 = run of 3..130 copies; 0x80.. = 1..128
  //     literals);
  //   - integer DATA streams are RLEv2: SHORT_REPEAT (BE value,
  //     zigzag when signed), DIRECT (bit-packed BE, zigzag when
  //     signed), PATCHED_BASE (sign-magnitude base + bit-packed
  //     deltas + byte-aligned patch list at closest-fixed-bit width),
  //     DELTA (varint base [zigzag when signed] + zigzag delta base +
  //     bit-packed delta magnitudes carrying delta-base's sign);
  //   - strings are DICTIONARY_V2 (DATA = unsigned indices, LENGTH =
  //     dictionary entry lengths, DICTIONARY_DATA = concatenated
  //     UTF-8) or DIRECT_V2 (DATA = concatenated UTF-8, LENGTH =
  //     per-value lengths).
  // LONG and STRING flat-schema columns decode; RLEv1 encodings
  // (DIRECT/DICTIONARY without _V2 — pre-Hive-0.12 writers) refuse.
  // Strict posture: stream byte runs must be consumed exactly, counts
  // must close against stripe rows, dictionary indices must be in
  // range, and UTF-8 is REPORT-mode.

  /** The 5-bit encoded bit-width table (ORC `FixedBitSizes`). */
  private val Fbs: Array[Int] = Array(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12,
    13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23, 24, 26, 28, 30, 32, 40, 48,
    56, 64)

  private def closestFixedBits(bits: Int): Int = {
    var i = 0
    while (i < Fbs.length && Fbs(i) < bits) i += 1
    if (i >= Fbs.length) throw new Malformed
    Fbs(i)
  }

  /** Big-endian MSB-first bit reader over a decoded stream. */
  private final class BitReader(val b: Array[Byte], var byte: Int) {
    private var bit = 0
    def read(width: Int): Long = {
      var v = 0L
      var i = 0
      while (i < width) {
        if (byte >= b.length) throw new Malformed
        v = (v << 1) | ((b(byte) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; byte += 1 }
        i += 1
      }
      v
    }
    def align(): Unit = if (bit != 0) { bit = 0; byte += 1 }
  }

  /** ORC byte-level RLE: decode exactly `n` bytes; the stream must be
   * consumed exactly. */
  private[graft] def decodeByteRle(s: Array[Byte], n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var w = 0
    var p = 0
    while (w < n) {
      if (p >= s.length) throw new Malformed
      val h = s(p) & 0xff
      p += 1
      if (h < 128) {
        val run = h + 3
        if (p >= s.length || run > n - w) throw new Malformed
        val v = s(p)
        p += 1
        var i = 0
        while (i < run) { out(w) = v; w += 1; i += 1 }
      } else {
        val lit = 256 - h
        if (lit > n - w || lit > s.length - p) throw new Malformed
        System.arraycopy(s, p, out, w, lit)
        w += lit
        p += lit
      }
    }
    if (p != s.length) throw new Malformed
    out
  }

  /** Base-128 little-endian varint (ORC's integer varint form). */
  private def orcVarint(s: Array[Byte], pos: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var p = pos
    while (shift <= 63) {
      if (p >= s.length) throw new Malformed
      val x = s(p) & 0xff
      v |= (x & 0x7fL) << shift
      p += 1
      if ((x & 0x80) == 0) return (v, p)
      shift += 7
    }
    throw new Malformed
  }

  /** Decode exactly `n` values of an RLEv2 integer stream; `signed`
   * per the column type (bigint DATA = signed, lengths / dictionary
   * indices = unsigned). The stream must be consumed exactly. */
  private[graft] def decodeRleV2(s: Array[Byte], n: Int,
      signed: Boolean): Array[Long] = {
    val out = new Array[Long](n)
    var w = 0
    var p = 0
    def zz(v: Long): Long = (v >>> 1) ^ -(v & 1)
    while (w < n) {
      if (p >= s.length) throw new Malformed
      val h = s(p) & 0xff
      (h >> 6) match {
        case 0 => // SHORT_REPEAT
          val width = ((h >> 3) & 7) + 1
          val rep = (h & 7) + 3
          if (rep > n - w || width > s.length - p - 1) throw new Malformed
          var v = 0L
          var i = 0
          while (i < width) { v = (v << 8) | (s(p + 1 + i) & 0xff); i += 1 }
          val dv = if (signed) zz(v) else v
          p += 1 + width
          var j = 0
          while (j < rep) { out(w) = dv; w += 1; j += 1 }
        case 1 => // DIRECT
          if (p + 1 >= s.length) throw new Malformed
          val width = Fbs((h >> 1) & 0x1f)
          val len = (((h & 1) << 8) | (s(p + 1) & 0xff)) + 1
          if (len > n - w) throw new Malformed
          val br = new BitReader(s, p + 2)
          var j = 0
          while (j < len) {
            val v = br.read(width)
            out(w) = if (signed) zz(v) else v
            w += 1
            j += 1
          }
          br.align()
          p = br.byte
        case 2 => // PATCHED_BASE
          if (p + 3 >= s.length) throw new Malformed
          val width = Fbs((h >> 1) & 0x1f)
          val len = (((h & 1) << 8) | (s(p + 1) & 0xff)) + 1
          val bw = ((s(p + 2) >> 5) & 7) + 1
          val pw = Fbs(s(p + 2) & 0x1f)
          val pgw = ((s(p + 3) >> 5) & 7) + 1
          val pll = s(p + 3) & 0x1f
          if (len > n - w || bw > s.length - p - 4) throw new Malformed
          var base = 0L
          var i = 0
          while (i < bw) { base = (base << 8) | (s(p + 4 + i) & 0xff); i += 1 }
          val signBit = 1L << (bw * 8 - 1)
          if ((base & signBit) != 0) base = -(base & (signBit - 1))
          val br = new BitReader(s, p + 4 + bw)
          val vals = new Array[Long](len)
          var j = 0
          while (j < len) { vals(j) = br.read(width); j += 1 }
          br.align() // patch list starts at the next byte boundary
          val pew = closestFixedBits(pgw + pw)
          var pos = 0
          var k = 0
          while (k < pll) {
            val e = br.read(pew)
            val gap = (e >>> pw).toInt
            val patch = if (pw == 64) e else e & ((1L << pw) - 1)
            pos += gap
            if (pos >= len) throw new Malformed
            vals(pos) = vals(pos) | (patch << width)
            k += 1
          }
          br.align()
          p = br.byte
          j = 0
          while (j < len) { out(w) = base + vals(j); w += 1; j += 1 }
        case _ => // DELTA
          if (p + 1 >= s.length) throw new Malformed
          val wEnc = (h >> 1) & 0x1f
          val width = if (wEnc == 0) 0 else Fbs(wEnc)
          val len = (((h & 1) << 8) | (s(p + 1) & 0xff)) + 1
          if (len > n - w) throw new Malformed
          val (bv, p1) = orcVarint(s, p + 2)
          val base = if (signed) zz(bv) else bv
          val (dbz, p2) = orcVarint(s, p1)
          val deltaBase = zz(dbz) // always signed
          out(w) = base
          w += 1
          var prev = base
          if (len >= 2) {
            prev = base + deltaBase
            out(w) = prev
            w += 1
          }
          if (len > 2) {
            if (width == 0) { // fixed delta: every step is deltaBase
              var j = 2
              while (j < len) {
                prev += deltaBase
                out(w) = prev
                w += 1
                j += 1
              }
              p = p2
            } else {
              val br = new BitReader(s, p2)
              var j = 2
              while (j < len) {
                val d = br.read(width)
                prev = if (deltaBase < 0) prev - d else prev + d
                out(w) = prev
                w += 1
                j += 1
              }
              br.align()
              p = br.byte
            }
          } else p = p2
      }
    }
    if (p != s.length || w != n) throw new Malformed
    out
  }

  /** Decoded values of one column in one stripe (boxed Long / String,
   * nulls in place). */
  final case class OrcColumn(stripeNo: Int, name: String, kind: Int,
      values: IndexedSeq[AnyRef])

  private def orcUtf8(b: Array[Byte], off: Int, len: Int): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(b, off, len)).toString
    catch {
      case _: java.nio.charset.CharacterCodingException => throw new Malformed
    }
  }

  /**
   * Decode every top-level BOOLEAN / INT / LONG / FLOAT / DOUBLE /
   * STRING column of a flat ORC file, stripe by stripe, entirely from
   * raw bytes: stripe footers give the stream layout, PRESENT streams
   * give the null mask, RLEv2 gives the integers/lengths/indices,
   * bit-packed byte-RLE gives the booleans, raw little-endian IEEE 754
   * words give the floats/doubles, and the dictionary or direct byte
   * streams give the strings. Other column types (timestamp, decimal,
   * binary, compound) are skipped — the censuses above still cover
   * them; RLEv1 column encodings refuse. None on any structural
   * violation or count mismatch.
   */
  def decodeFlatColumns(payload: Array[Byte]): Option[IndexedSeq[OrcColumn]] = {
    val b = payload
    parseTail(b) match {
      case None => None
      case Some(t) =>
        try {
          // flat schema: root struct (type 0) whose subtypes are leaves
          if (t.rootSubtypes.isEmpty ||
            t.rootFieldNames.size != t.rootSubtypes.size) throw new Malformed
          val leaves = t.rootSubtypes.zip(t.rootFieldNames).map {
            case (tid, name) =>
              if (tid <= 0 || tid >= t.typeKinds.size) throw new Malformed
              (tid.toInt, name, t.typeKinds(tid.toInt))
          }
          // boolean / int / bigint / float / double / string / binary /
          // timestamp / decimal / date leaves
          val wanted = leaves.filter(l =>
            l._3 == 0 || l._3 == 3 || l._3 == 4 || l._3 == 5 ||
            l._3 == 6 || l._3 == 7 || l._3 == 8 || l._3 == 9 ||
            l._3 == 14 || l._3 == 15)
          // LIST roots over a LONG or STRING child (m64)
          val listWanted = leaves.flatMap { case (tid, name, k) =>
            if (k != 10 || tid >= t.allSubtypes.size) None
            else t.allSubtypes(tid) match {
              case IndexedSeq(c) if c > 0 && c < t.typeKinds.size &&
                (t.typeKinds(c.toInt) == 4 || t.typeKinds(c.toInt) == 7) =>
                Some((tid, name, c.toInt, t.typeKinds(c.toInt)))
              case _ => None
            }
          }
          if (wanted.isEmpty && listWanted.isEmpty) throw new Malformed
          val out = scala.collection.mutable.ArrayBuffer.empty[OrcColumn]
          t.stripes.zipWithIndex.foreach {
            case ((sOff, sIdxLen, sDataLen, sFootLen, sRows), sNo) =>
              if (sRows <= 0 || sRows > Int.MaxValue) throw new Malformed
              val fStart = sOff + sIdxLen + sDataLen
              if (fStart < 0 || fStart > b.length - sFootLen)
                throw new Malformed
              val sf = parseStripeFooter(b, fStart.toInt, sFootLen,
                t.compressionKind)
              // stream offsets: cumulative in footer order from sOff
              var cursor = sOff
              val located = sf.streams.map { st =>
                val o = cursor
                cursor += st.length
                (st, o)
              }
              if (cursor != sOff + sIdxLen + sDataLen) throw new Malformed
              def streamBytes(st: StripeStream, off: Long): Array[Byte] = {
                if (off < 0 || st.length > b.length - off) throw new Malformed
                if (t.compressionKind == 0)
                  java.util.Arrays.copyOfRange(b, off.toInt,
                    (off + st.length).toInt)
                else decodeStreamUnsized(b, off.toInt, st.length,
                  t.compressionKind)
              }
              def find(col: Int, kind: Int): Option[(StripeStream, Long)] =
                located.find(s0 => s0._1.column == col && s0._1.kind == kind)
              wanted.foreach { case (cid, name, tkind) =>
                if (cid >= sf.encodings.size) throw new Malformed
                val (encKind, dictSize) = sf.encodings(cid)
                val nRows = sRows.toInt
                // null mask from the PRESENT stream (absent = no nulls)
                val present: Array[Boolean] = find(cid, 0) match {
                  case Some((st, off)) =>
                    val bits = decodeByteRle(streamBytes(st, off),
                      ((nRows + 7) / 8))
                    Array.tabulate(nRows)(i =>
                      ((bits(i >> 3) >> (7 - (i & 7))) & 1) != 0)
                  case None => null
                }
                val nNonNull =
                  if (present == null) nRows else present.count(identity)
                val vals = new Array[AnyRef](nRows)
                def assembleFrom(nn: Array[AnyRef]): Unit = {
                  if (present == null) {
                    if (nn.length != nRows) throw new Malformed
                    System.arraycopy(nn, 0, vals, 0, nRows)
                  } else {
                    var v = 0
                    var i = 0
                    while (i < nRows) {
                      if (present(i)) { vals(i) = nn(v); v += 1 }
                      i += 1
                    }
                    if (v != nn.length) throw new Malformed
                  }
                }
                if (tkind == 15 || tkind == 3 || tkind == 4) {
                  // date (epoch days) / int / bigint — all RLEv2 signed
                  if (encKind != 2) throw new Malformed // DIRECT_V2 only
                  val (st, off) = find(cid, 1).getOrElse(throw new Malformed)
                  val longs = decodeRleV2(streamBytes(st, off), nNonNull,
                    signed = true)
                  if (tkind == 4) assembleFrom(longs.map(Long.box(_): AnyRef))
                  else assembleFrom(longs.map { v =>
                    if (v < Int.MinValue || v > Int.MaxValue)
                      throw new Malformed
                    Int.box(v.toInt): AnyRef
                  })
                } else if (tkind == 8) { // binary: DIRECT_V2 bytes+lengths
                  if (encKind != 2) throw new Malformed
                  val (dst, doff) = find(cid, 1).getOrElse(throw new Malformed)
                  val (lst, loff) = find(cid, 2).getOrElse(throw new Malformed)
                  val lens = decodeRleV2(streamBytes(lst, loff), nNonNull,
                    signed = false)
                  val bytes = streamBytes(dst, doff)
                  var pos = 0
                  val nn = new Array[AnyRef](nNonNull)
                  var i = 0
                  while (i < nNonNull) {
                    val l = lens(i)
                    if (l < 0 || l > bytes.length - pos) throw new Malformed
                    nn(i) = java.util.Arrays.copyOfRange(bytes, pos,
                      pos + l.toInt)
                    pos += l.toInt
                    i += 1
                  }
                  if (pos != bytes.length) throw new Malformed
                  assembleFrom(nn)
                } else if (tkind == 9) { // timestamp: DATA seconds rel.
                  // 2015-01-01 UTC + SECONDARY nanos with the trailing-
                  // zero scheme; stored in the WRITER timezone — only
                  // UTC-written files decode (others refuse, never skew)
                  if (encKind != 2) throw new Malformed
                  if (!sf.timezone.forall(tz => tz == "UTC" ||
                    tz == "Etc/UTC" || tz == "GMT")) throw new Malformed
                  val (st, off) = find(cid, 1).getOrElse(throw new Malformed)
                  val (nst, noff) = find(cid, 5).getOrElse(throw new Malformed)
                  val secs = decodeRleV2(streamBytes(st, off), nNonNull,
                    signed = true)
                  val nanosRaw = decodeRleV2(streamBytes(nst, noff), nNonNull,
                    signed = false)
                  assembleFrom(Array.tabulate[AnyRef](nNonNull) { i =>
                    val zeros = (nanosRaw(i) & 7L).toInt
                    var nanos = nanosRaw(i) >>> 3
                    if (zeros != 0) {
                      var z = 0
                      while (z <= zeros) { nanos *= 10L; z += 1 }
                    }
                    if (nanos < 0 || nanos > 999999999L) throw new Malformed
                    var epochSec = 1420070400L + secs(i)
                    // pre-1970 rounding fix per the reference reader:
                    // the writer truncated millis/1000 toward zero, the
                    // nanos are the floor-second fraction
                    if (epochSec < 0 && nanos != 0) epochSec -= 1
                    val micros = epochSec * 1000000L + nanos / 1000
                    Long.box(micros): AnyRef
                  })
                } else if (tkind == 14) { // decimal: unbounded zigzag
                  // varint mantissa (DATA) + per-value scale (SECONDARY)
                  if (encKind != 2) throw new Malformed
                  val (dst, doff) = find(cid, 1).getOrElse(throw new Malformed)
                  val (sst, soff) = find(cid, 5).getOrElse(throw new Malformed)
                  val scales = decodeRleV2(streamBytes(sst, soff), nNonNull,
                    signed = true)
                  val mb = streamBytes(dst, doff)
                  var pos = 0
                  val nn = new Array[AnyRef](nNonNull)
                  var i = 0
                  while (i < nNonNull) {
                    val (raw, p2) = orcVarint(mb, pos) // throws past 64 bits
                    val mant = (raw >>> 1) ^ -(raw & 1L) // zigzag
                    pos = p2
                    val sc = scales(i)
                    if (sc < 0 || sc > 38) throw new Malformed
                    nn(i) = java.math.BigDecimal.valueOf(mant, sc.toInt)
                    i += 1
                  }
                  if (pos != mb.length) throw new Malformed
                  assembleFrom(nn)
                } else if (tkind == 0) { // boolean: bit-packed MSB-first,
                  // then byte-RLE — the PRESENT stream's own encoding
                  if (encKind != 0) throw new Malformed // DIRECT only
                  val (st, off) = find(cid, 1).getOrElse(throw new Malformed)
                  val bits = decodeByteRle(streamBytes(st, off),
                    (nNonNull + 7) / 8)
                  assembleFrom(Array.tabulate[AnyRef](nNonNull)(i =>
                    Boolean.box(((bits(i >> 3) >> (7 - (i & 7))) & 1) != 0)))
                } else if (tkind == 5 || tkind == 6) { // float / double:
                  // IEEE 754 little-endian, 4/8 bytes per non-null value
                  if (encKind != 0) throw new Malformed // DIRECT only
                  val (st, off) = find(cid, 1).getOrElse(throw new Malformed)
                  val bytes = streamBytes(st, off)
                  val w = if (tkind == 5) 4 else 8
                  if (bytes.length != w.toLong * nNonNull) throw new Malformed
                  assembleFrom(Array.tabulate[AnyRef](nNonNull) { i =>
                    val p = i * w
                    if (w == 4) {
                      val bits = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
                        ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 3) & 0xff) << 24)
                      Float.box(java.lang.Float.intBitsToFloat(bits))
                    } else {
                      var bits = 0L
                      var j = 0
                      while (j < 8) { bits |= (bytes(p + j) & 0xffL) << (8 * j); j += 1 }
                      Double.box(java.lang.Double.longBitsToDouble(bits))
                    }
                  })
                } else { // string
                  encKind match {
                    case 3 => // DICTIONARY_V2
                      val (dst, doff) =
                        find(cid, 1).getOrElse(throw new Malformed)
                      val (lst, loff) =
                        find(cid, 2).getOrElse(throw new Malformed)
                      val (bst, boff) =
                        find(cid, 3).getOrElse(throw new Malformed)
                      if (dictSize < 0 || dictSize > Int.MaxValue)
                        throw new Malformed
                      val nDict = dictSize.toInt
                      val lens = decodeRleV2(streamBytes(lst, loff), nDict,
                        signed = false)
                      val dictBytes = streamBytes(bst, boff)
                      val dict = new Array[String](nDict)
                      var pos = 0
                      var i = 0
                      while (i < nDict) {
                        val l = lens(i)
                        if (l < 0 || l > dictBytes.length - pos)
                          throw new Malformed
                        dict(i) = orcUtf8(dictBytes, pos, l.toInt)
                        pos += l.toInt
                        i += 1
                      }
                      if (pos != dictBytes.length) throw new Malformed
                      val idx = decodeRleV2(streamBytes(dst, doff), nNonNull,
                        signed = false)
                      assembleFrom(idx.map { ix =>
                        if (ix < 0 || ix >= nDict) throw new Malformed
                        dict(ix.toInt): AnyRef
                      })
                    case 2 => // DIRECT_V2
                      val (dst, doff) =
                        find(cid, 1).getOrElse(throw new Malformed)
                      val (lst, loff) =
                        find(cid, 2).getOrElse(throw new Malformed)
                      val lens = decodeRleV2(streamBytes(lst, loff), nNonNull,
                        signed = false)
                      val bytes = streamBytes(dst, doff)
                      var pos = 0
                      val nn = new Array[AnyRef](nNonNull)
                      var i = 0
                      while (i < nNonNull) {
                        val l = lens(i)
                        if (l < 0 || l > bytes.length - pos)
                          throw new Malformed
                        nn(i) = orcUtf8(bytes, pos, l.toInt)
                        pos += l.toInt
                        i += 1
                      }
                      if (pos != bytes.length) throw new Malformed
                      assembleFrom(nn)
                    case _ => throw new Malformed // RLEv1 forms refused
                  }
                }
                out += OrcColumn(sNo, name, tkind, vals.toIndexedSeq)
              }
              // ---- LIST columns (m64): the list column's LENGTH
              // stream partitions the CHILD column's value sequence;
              // both columns carry their own PRESENT masks, so null
              // list / empty list / null element all reassemble
              listWanted.foreach { case (cid, name, childId, childKind) =>
                if (cid >= sf.encodings.size || childId >= sf.encodings.size)
                  throw new Malformed
                val nRows = sRows.toInt
                def presentOf(col: Int, count: Int): Array[Boolean] =
                  find(col, 0) match {
                    case Some((st, off)) =>
                      val bits = decodeByteRle(streamBytes(st, off),
                        (count + 7) / 8)
                      Array.tabulate(count)(i =>
                        ((bits(i >> 3) >> (7 - (i & 7))) & 1) != 0)
                    case None => null
                  }
                val present = presentOf(cid, nRows)
                val nNonNull =
                  if (present == null) nRows else present.count(identity)
                if (sf.encodings(cid)._1 != 2) throw new Malformed
                val (lst, loff) = find(cid, 2).getOrElse(throw new Malformed)
                val lens = decodeRleV2(streamBytes(lst, loff), nNonNull,
                  signed = false)
                var totalChild = 0L
                lens.foreach { l =>
                  if (l < 0) throw new Malformed
                  totalChild += l
                }
                if (totalChild > Int.MaxValue) throw new Malformed
                val nChild = totalChild.toInt
                val childPresent = presentOf(childId, nChild)
                val childNonNull = if (childPresent == null) nChild
                  else childPresent.count(identity)
                val (cEnc, cDict) = sf.encodings(childId)
                val childNN: Array[AnyRef] = childKind match {
                  case 4 => // long child
                    if (cEnc != 2) throw new Malformed
                    val (st, off) =
                      find(childId, 1).getOrElse(throw new Malformed)
                    decodeRleV2(streamBytes(st, off), childNonNull,
                      signed = true).map(Long.box(_): AnyRef)
                  case _ => cEnc match { // string child
                    case 3 => // DICTIONARY_V2
                      val (dst, doff) =
                        find(childId, 1).getOrElse(throw new Malformed)
                      val (lst2, loff2) =
                        find(childId, 2).getOrElse(throw new Malformed)
                      val (bst, boff) =
                        find(childId, 3).getOrElse(throw new Malformed)
                      if (cDict < 0 || cDict > Int.MaxValue)
                        throw new Malformed
                      val nDict = cDict.toInt
                      val dlens = decodeRleV2(streamBytes(lst2, loff2),
                        nDict, signed = false)
                      val dictBytes = streamBytes(bst, boff)
                      val dict = new Array[String](nDict)
                      var pos = 0
                      var i = 0
                      while (i < nDict) {
                        val l = dlens(i)
                        if (l < 0 || l > dictBytes.length - pos)
                          throw new Malformed
                        dict(i) = orcUtf8(dictBytes, pos, l.toInt)
                        pos += l.toInt
                        i += 1
                      }
                      if (pos != dictBytes.length) throw new Malformed
                      decodeRleV2(streamBytes(dst, doff), childNonNull,
                        signed = false).map { ix =>
                        if (ix < 0 || ix >= nDict) throw new Malformed
                        dict(ix.toInt): AnyRef
                      }
                    case 2 => // DIRECT_V2
                      val (dst, doff) =
                        find(childId, 1).getOrElse(throw new Malformed)
                      val (lst2, loff2) =
                        find(childId, 2).getOrElse(throw new Malformed)
                      val slens = decodeRleV2(streamBytes(lst2, loff2),
                        childNonNull, signed = false)
                      val bytes = streamBytes(dst, doff)
                      var pos = 0
                      val nn = new Array[AnyRef](childNonNull)
                      var i = 0
                      while (i < childNonNull) {
                        val l = slens(i)
                        if (l < 0 || l > bytes.length - pos)
                          throw new Malformed
                        nn(i) = orcUtf8(bytes, pos, l.toInt)
                        pos += l.toInt
                        i += 1
                      }
                      if (pos != bytes.length) throw new Malformed
                      nn
                    case _ => throw new Malformed
                  }
                }
                val childAll = new Array[AnyRef](nChild)
                if (childPresent == null) {
                  if (childNN.length != nChild) throw new Malformed
                  System.arraycopy(childNN, 0, childAll, 0, nChild)
                } else {
                  var v = 0
                  var i = 0
                  while (i < nChild) {
                    if (childPresent(i)) { childAll(i) = childNN(v); v += 1 }
                    i += 1
                  }
                  if (v != childNN.length) throw new Malformed
                }
                val vals = new Array[AnyRef](nRows)
                var li = 0
                var cpos = 0
                var i = 0
                while (i < nRows) {
                  if (present == null || present(i)) {
                    val l = lens(li).toInt
                    li += 1
                    if (l > nChild - cpos) throw new Malformed
                    vals(i) = childAll.slice(cpos, cpos + l).toVector
                    cpos += l
                  }
                  i += 1
                }
                if (li != lens.length || cpos != nChild) throw new Malformed
                out += OrcColumn(sNo, name, 10, vals.toIndexedSeq)
              }
          }
          if (out.isEmpty) throw new Malformed
          Some(out.toIndexedSeq)
        } catch {
          case _: Malformed => None
          case _: IndexOutOfBoundsException => None
          case _: NegativeArraySizeException => None
        }
    }
  }

  /** Output schema of [[orcDecodeLongStr]]. */
  val decodeLongStrSchema: StructType = StructType(Seq(
    StructField("file_id", LongType),
    StructField("long_val", LongType),
    StructField("str_val", StringType)))

  /** Decode one LONG column and one STRING column of each flat ORC
   * payload and emit their values ZIPPED per row (stripe order) — the
   * cross-column row-alignment proof, the [[ParquetFooter
   * .parquetDecodeLongStr]] sibling. Payloads that refuse contribute
   * nothing. Narrow mapPartitions. */
  def orcDecodeLongStr(df: DataFrame, idCol: String, payloadCol: String,
      longName: String, strName: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val fid = r.getLong(idIdx)
        decodeFlatColumns(r.getAs[Array[Byte]](pIdx)) match {
          case Some(cols) =>
            cols.groupBy(_.stripeNo).toSeq.sortBy(_._1).iterator.flatMap {
              case (_, cs) =>
                val lc = cs.find(c => c.name == longName && c.kind == 4)
                val sc = cs.find(c => c.name == strName && c.kind == 7)
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

  /** Output schema of [[orcDecodeScalars]]. */
  val decodeScalarsSchema: StructType = StructType(Seq(
    StructField("file_id", LongType),
    StructField("long_val", LongType),
    StructField("dbl_val", DoubleType),
    StructField("flt_val", FloatType),
    StructField("bool_val", BooleanType),
    StructField("str_val", StringType)))

  /** Decode one column of EACH scalar family — LONG, DOUBLE, FLOAT,
   * BOOLEAN, STRING — from each flat ORC payload and emit their
   * values ZIPPED per row in stripe order (m55, widening
   * [[orcDecodeLongStr]] to the full scalar set): the five decode
   * paths must agree on row alignment or the file contributes
   * nothing. Narrow mapPartitions. */
  def orcDecodeScalars(df: DataFrame, idCol: String, payloadCol: String,
      longName: String, dblName: String, fltName: String,
      boolName: String, strName: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val fid = r.getLong(idIdx)
        decodeFlatColumns(r.getAs[Array[Byte]](pIdx)) match {
          case Some(cols) =>
            cols.groupBy(_.stripeNo).toSeq.sortBy(_._1).iterator.flatMap {
              case (_, cs) =>
                def pick(name: String, kind: Int) =
                  cs.find(c => c.name == name && c.kind == kind)
                (pick(longName, 4), pick(dblName, 6), pick(fltName, 5),
                  pick(boolName, 0), pick(strName, 7)) match {
                  case (Some(l), Some(d), Some(f), Some(bo), Some(s0))
                    if Seq(d, f, bo, s0).forall(_.values.size == l.values.size) =>
                    (0 until l.values.size).iterator.map { i =>
                      Row(fid, l.values(i), d.values(i), f.values(i),
                        bo.values(i), s0.values(i))
                    }
                  case _ => Iterator.empty
                }
            }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(decodeScalarsSchema))
  }

  /** Output schema of [[orcDecodeLists]]. */
  val decodeListsSchema: StructType = StructType(Seq(
    StructField("file_id", LongType),
    StructField("long_val", LongType),
    StructField("nums", ArrayType(LongType, true)),
    StructField("tags", ArrayType(StringType, true))))

  /** Decode one LONG list and one STRING list column beside a flat
   * LONG key, zipped per row in stripe order (m64 — the ORC nested
   * analog of the parquet m57 Dremel path: the LENGTH stream
   * partitions the child column, PRESENT masks at both levels give
   * null lists and null elements). Narrow mapPartitions. */
  def orcDecodeLists(df: DataFrame, idCol: String, payloadCol: String,
      longName: String, numsName: String, tagsName: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val fid = r.getLong(idIdx)
        decodeFlatColumns(r.getAs[Array[Byte]](pIdx)) match {
          case Some(cols) =>
            cols.groupBy(_.stripeNo).toSeq.sortBy(_._1).iterator.flatMap {
              case (_, cs) =>
                def pick(name: String, kind: Int) =
                  cs.find(c => c.name == name && c.kind == kind)
                (pick(longName, 4), pick(numsName, 10),
                  pick(tagsName, 10)) match {
                  case (Some(l), Some(nn), Some(tt))
                    if nn.values.size == l.values.size &&
                      tt.values.size == l.values.size =>
                    (0 until l.values.size).iterator.map { i =>
                      def toSeq(v: AnyRef): Seq[Any] = v match {
                        case null => null
                        case xs: Vector[_] => xs
                        case _ => null
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

  /** Output schema of [[orcDecodeTemporal]]. */
  val decodeTemporalSchema: StructType = StructType(Seq(
    StructField("file_id", LongType),
    StructField("long_val", LongType),
    StructField("ts_micros", LongType),
    StructField("date_days", IntegerType),
    StructField("bin", BinaryType),
    StructField("dec_str", StringType)))

  /** Decode one column each of TIMESTAMP (emitted as epoch MICROS),
   * DATE (epoch days), BINARY and DECIMAL (plain string) beside a
   * LONG key, zipped per row in stripe order (m61 — completing the
   * ORC type matrix over m53/m55). Narrow mapPartitions. */
  def orcDecodeTemporal(df: DataFrame, idCol: String, payloadCol: String,
      longName: String, tsName: String, dateName: String,
      binName: String, decName: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val fid = r.getLong(idIdx)
        decodeFlatColumns(r.getAs[Array[Byte]](pIdx)) match {
          case Some(cols) =>
            cols.groupBy(_.stripeNo).toSeq.sortBy(_._1).iterator.flatMap {
              case (_, cs) =>
                def pick(name: String, kind: Int) =
                  cs.find(c => c.name == name && c.kind == kind)
                (pick(longName, 4), pick(tsName, 9), pick(dateName, 15),
                  pick(binName, 8), pick(decName, 14)) match {
                  case (Some(l), Some(ts), Some(d), Some(bn), Some(dc))
                    if Seq(ts, d, bn, dc).forall(
                      _.values.size == l.values.size) =>
                    (0 until l.values.size).iterator.map { i =>
                      val decS = dc.values(i) match {
                        case null => null
                        case bd: java.math.BigDecimal => bd.toPlainString
                        case _ => null
                      }
                      Row(fid, l.values(i), ts.values(i), d.values(i),
                        bn.values(i), decS)
                    }
                  case _ => Iterator.empty
                }
            }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(decodeTemporalSchema))
  }

  /** Output schema of [[orcTails]]. */
  val tailSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_rows", LongType),
    StructField("content_bytes", LongType),
    StructField("compression", StringType),
    StructField("footer_bytes", LongType),
    StructField("row_index_stride", LongType),
    StructField("n_types", IntegerType),
    StructField("n_root_fields", IntegerType),
    StructField("n_stripes", IntegerType),
    StructField("stripe_rows_sum", LongType),
    StructField("stripe_data_bytes", LongType)))

  // ---- stripe-footer census (m51) -------------------------------------
  //
  // The file footer (above) locates stripes; each stripe's own FOOTER
  // — at offset + indexLength + dataLength, footerLength bytes,
  // compressed with the file codec — carries the stream layout
  // (kind/column/length per stream) and per-column encodings: the
  // metadata a column-pruning ranged reader actually seeks to before
  // touching any stream. Facts honored (ORC v1 spec): StripeFooter =
  // repeated Stream(1: kind, 2: column, 3: length), repeated
  // ColumnEncoding(2: kind [default DIRECT], dictionarySize), writer
  // timezone(3); the stripe's index-region streams (ROW_INDEX, bloom)
  // precede the data-region streams, and their lengths must sum to
  // indexLength / dataLength respectively — reported as verdicts.

  /** One stream of one stripe footer. */
  final case class StripeStream(kind: Int, column: Int, length: Long)

  /** One stripe footer's projection. */
  final case class StripeFooterInfo(streams: IndexedSeq[StripeStream],
      encodings: IndexedSeq[(Int, Long)], timezone: Option[String])

  private def streamKindName(k: Int): String = k match {
    case 0 => "present"; case 1 => "data"; case 2 => "length"
    case 3 => "dictionary_data"; case 4 => "dictionary_count"
    case 5 => "secondary"; case 6 => "row_index"; case 7 => "bloom_filter"
    case 8 => "bloom_filter_utf8"; case other => s"kind_$other"
  }
  private def encodingKindName(k: Int): String = k match {
    case 0 => "direct"; case 1 => "dictionary"; case 2 => "direct_v2"
    case 3 => "dictionary_v2"; case other => s"enc_$other"
  }
  private def isIndexKind(k: Int): Boolean = k == 6 || k == 7 || k == 8

  /** Walk one stripe footer at [start, start+len) with the file's
   * compression kind. Throws Malformed on anything unclean. */
  private def parseStripeFooter(b: Array[Byte], start: Int, len: Long,
      kind: Int): StripeFooterInfo = {
    if (start < 0 || len <= 0 || len > b.length - start) throw new Malformed
    val body: Array[Byte] =
      if (kind == 0) java.util.Arrays.copyOfRange(b, start, start + len.toInt)
      else decodeStreamUnsized(b, start, len, kind)
    val p = new P(body, 0, body.length)
    val streams = scala.collection.mutable.ArrayBuffer.empty[StripeStream]
    val encs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var tz: Option[String] = None
    while (!p.done) {
      val key = p.varint()
      ((key >>> 3).toInt, (key & 7).toInt) match {
        case (1, 2) => // Stream
          val n = p.varint()
          val s = p.bytes(n)
          val sp = new P(body, s, s + n.toInt)
          var k2 = -1L
          var col = -1L
          var slen = -1L
          while (!sp.done) {
            val kk = sp.varint()
            ((kk >>> 3).toInt, (kk & 7).toInt) match {
              case (1, 0) => k2 = sp.varint()
              case (2, 0) => col = sp.varint()
              case (3, 0) => slen = sp.varint()
              case (_, w) => sp.skipField(w)
            }
          }
          if (k2 < 0 || col < 0 || slen < 0) throw new Malformed
          streams += StripeStream(k2.toInt, col.toInt, slen)
        case (2, 2) => // ColumnEncoding (kind may be omitted = DIRECT)
          val n = p.varint()
          val s = p.bytes(n)
          val sp = new P(body, s, s + n.toInt)
          var k2 = 0L
          var dict = 0L
          while (!sp.done) {
            val kk = sp.varint()
            ((kk >>> 3).toInt, (kk & 7).toInt) match {
              case (1, 0) => k2 = sp.varint()
              case (2, 0) => dict = sp.varint()
              case (_, w) => sp.skipField(w)
            }
          }
          encs += ((k2.toInt, dict))
        case (3, 2) =>
          val n = p.varint()
          val s = p.bytes(n)
          tz = Some(new String(body, s, n.toInt, "UTF-8"))
        case (_, w) => p.skipField(w)
      }
    }
    if (streams.isEmpty || encs.isEmpty) throw new Malformed
    StripeFooterInfo(streams.toIndexedSeq, encs.toIndexedSeq, tz)
  }

  /** Output schema of [[orcStripeFooters]]. */
  val stripeFooterSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("stripe_no", IntegerType),
    StructField("compression", StringType),
    StructField("n_rows", LongType),
    StructField("n_streams", IntegerType),
    StructField("n_index_streams", IntegerType),
    StructField("index_bytes", LongType),
    StructField("data_bytes", LongType),
    StructField("index_agree", IntegerType),
    StructField("data_agree", IntegerType),
    StructField("n_encodings", IntegerType),
    StructField("n_types", IntegerType),
    StructField("enc_kinds", StringType),
    StructField("stream_kinds", StringType),
    StructField("has_timezone", IntegerType)))

  /** One row per stripe (file order): the stripe footer's stream
   * layout and column encodings, with the index/data byte-sum
   * agreement verdicts. A file whose ANY stripe footer fails to walk
   * contributes nothing (strict). Narrow mapPartitions — reads the
   * tail plus footerLength bytes per stripe, never index or data
   * streams. */
  def orcStripeFooters(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val b = r.getAs[Array[Byte]](pIdx)
        parseTail(b) match {
          case Some(t) =>
            try {
              t.stripes.zipWithIndex.map {
                case ((off, idxLen, dataLen, flen, rows), i) =>
                  if (off < 3 || idxLen < 0 || dataLen < 0)
                    throw new Malformed
                  val fStart = off + idxLen + dataLen
                  if (fStart < 0 || fStart > b.length - flen)
                    throw new Malformed
                  val sf = parseStripeFooter(b, fStart.toInt, flen,
                    t.compressionKind)
                  val idxSum = sf.streams.filter(s => isIndexKind(s.kind))
                    .map(_.length).sum
                  val dataSum = sf.streams.filterNot(s => isIndexKind(s.kind))
                    .map(_.length).sum
                  Row(id, i, t.compression, rows, sf.streams.size,
                    sf.streams.count(s => isIndexKind(s.kind)), idxSum,
                    dataSum, if (idxSum == idxLen) 1 else 0,
                    if (dataSum == dataLen) 1 else 0, sf.encodings.size,
                    t.nTypes,
                    sf.encodings.map(e => encodingKindName(e._1))
                      .distinct.sorted.mkString(","),
                    sf.streams.map(s => streamKindName(s.kind))
                      .distinct.sorted.mkString(","),
                    if (sf.timezone.isDefined) 1 else 0)
              }.iterator
            } catch {
              case _: Malformed => Iterator.empty
              case _: IndexOutOfBoundsException => Iterator.empty
            }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(stripeFooterSchema))
  }

  /** One row per clean ORC tail; other payloads contribute nothing.
   * Narrow mapPartitions — tail-only reads. */
  def orcTails(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseTail(r.getAs[Array[Byte]](pIdx)).map { t =>
          Row(id, t.numRows, t.contentBytes, t.compression, t.footerBytes,
            t.rowIndexStride, t.nTypes, t.nRootFields, t.stripeRows.size,
            t.stripeRows.sum, t.stripeDataBytes.sum)
        }.iterator
      }
    }(Encoders.row(tailSchema))
  }
}
