package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * Image HEADER census: width/height/bit-depth (and JPEG EXIF
 * orientation) read straight from container headers — JPEG SOF markers
 * + APP1 TIFF IFD, PNG IHDR, GIF logical screen descriptor, BMP
 * BITMAPINFOHEADER, WebP VP8/VP8L/VP8X — with NO pixel decode. At
 * corpus scale this is the pass that sizes an image lake before any
 * decode fan-out: [[Multimodal.decodeImages]] decodes pixels via the
 * JDK (right for features), this reads O(header) bytes per file and is
 * the only affordable way to get dims over 100 TB. Adds the formats the
 * JDK path can't census (WebP) and the field ImageIO discards (EXIF
 * orientation — without it, every phone photo's width/height are
 * transposed in the census).
 *
 * Reference semantics: binary media columns are opaque payloads to
 * census and project typed metadata from (`/root/reference` multimodal
 * suite). Narrow mapPartitions — header-only reads, zero exchanges.
 */
object Imaging {

  /** Decoded header metadata; orientation only from JPEG EXIF IFD0
   * (tag 0x0112), bitDepth only where the header carries one (JPEG
   * precision, PNG bit depth, BMP bpp). */
  final case class ImageMeta(format: String, width: Int, height: Int,
      orientation: Option[Int], bitDepth: Option[Int])

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def i32le(b: Array[Byte], i: Int): Int = u32le(b, i).toInt
  private def u24le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)

  /** Scalar tags we project out of a TIFF IFD0 (shared by the JPEG
   * APP1 Exif path and standalone TIFF files). */
  private val TagWidth = 0x0100
  private val TagHeight = 0x0101
  private val TagBits = 0x0102
  private val TagOrientation = 0x0112

  /** Walk a TIFF IFD0 at `tiff` (header offset) and project the scalar
   * tags above. `None` = structurally malformed (bad byte-order mark /
   * magic, IFD out of bounds, a projected tag with an unexpected type,
   * an out-of-range orientation) — the callers treat that as payload
   * corruption, strict posture. Unprojected tags are skipped by the
   * fixed 12-byte entry stride regardless of type. SHORT and LONG
   * scalars are both accepted for dims (the spec allows either); a
   * count > 1 BitsPerSample (RGB) reads its FIRST element through the
   * value-offset indirection. */
  private def parseIfd0(
      b: Array[Byte], tiff: Int, end: Int): Option[Map[Int, Long]] = {
    if (tiff + 8 > end) return None
    val le =
      if (b(tiff) == 'I' && b(tiff + 1) == 'I') true
      else if (b(tiff) == 'M' && b(tiff + 1) == 'M') false
      else return None
    def r16(i: Int) = if (le) u16le(b, i) else u16be(b, i)
    def r32(i: Int) = if (le) u32le(b, i) else u32be(b, i)
    if (r16(tiff + 2) != 42) return None
    val ifd = tiff + r32(tiff + 4)
    if (ifd < tiff || ifd + 2 > end) return None
    val n = r16(ifd.toInt)
    val base = ifd.toInt + 2
    if (base + 12 * n > end) return None
    val out = scala.collection.mutable.Map.empty[Int, Long]
    var i = 0
    while (i < n) {
      val e = base + 12 * i
      val tag = r16(e)
      if (tag == TagWidth || tag == TagHeight || tag == TagBits ||
        tag == TagOrientation) {
        val tpe = r16(e + 2)
        val cnt = r32(e + 4)
        val v: Long =
          if (tpe == 3 && cnt == 1L) r16(e + 8).toLong
          else if (tpe == 4 && cnt == 1L) r32(e + 8)
          else if (tpe == 3 && cnt > 1L && tag == TagBits) {
            // per-sample bits: the value field holds an OFFSET to the
            // SHORT array; read its first element
            val off = tiff + r32(e + 8)
            if (off < tiff || off + 2 > end) return None
            r16(off.toInt).toLong
          } else return None
        if (tag == TagOrientation && (v < 1 || v > 8)) return None
        out(tag) = v
      }
      i += 1
    }
    Some(out.toMap)
  }

  /** Standalone TIFF: IFD0 must carry both dims. */
  private def parseTiff(b: Array[Byte]): Option[ImageMeta] =
    parseIfd0(b, 0, b.length).flatMap { tags =>
      for {
        w <- tags.get(TagWidth) if w > 0 && w <= Int.MaxValue
        h <- tags.get(TagHeight) if h > 0 && h <= Int.MaxValue
      } yield ImageMeta("tiff", w.toInt, h.toInt,
        tags.get(TagOrientation).map(_.toInt),
        tags.get(TagBits).map(_.toInt))
    }

  /** JPEG marker walk: skip fill bytes, stride segments by their big-
   * endian lengths, read dims from the first SOF (any of C0–CF except
   * the non-frame C4/C8/CC) and orientation from an `Exif`
   * APP1, stop at SOS. Strict: marker desync, a segment overrunning the
   * payload, a malformed Exif body, or EOI/end before any SOF → None. */
  private def parseJpeg(b: Array[Byte]): Option[ImageMeta] = {
    var pos = 2
    var dims: Option[(Int, Int, Int)] = None
    var orient: Option[Int] = None
    while (pos + 2 <= b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      var mpos = pos + 1
      while (mpos < b.length && (b(mpos) & 0xff) == 0xff) mpos += 1
      if (mpos >= b.length) return None
      val m = b(mpos) & 0xff
      if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        pos = mpos + 1 // standalone markers carry no length field
      } else if (m == 0xd9) { // EOI (standalone) before any SOS
        return dims.map { case (w, h, p) =>
          ImageMeta("jpeg", w, h, orient, Some(p)) }
      } else {
        if (mpos + 3 > b.length) return None
        val seglen = u16be(b, mpos + 1)
        if (seglen < 2 || mpos + 1 + seglen > b.length) return None
        val body = mpos + 3
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (seglen < 8) return None
          val p = b(body) & 0xff
          val h = u16be(b, body + 1)
          val w = u16be(b, body + 3)
          if (w == 0 || h == 0) return None
          if (dims.isEmpty) dims = Some((w, h, p))
        } else if (m == 0xe1 && seglen >= 8 &&
            b(body) == 'E' && b(body + 1) == 'x' && b(body + 2) == 'i' &&
            b(body + 3) == 'f' && b(body + 4) == 0 && b(body + 5) == 0) {
          parseIfd0(b, body + 6, mpos + 1 + seglen) match {
            case Some(tags) =>
              if (orient.isEmpty) orient = tags.get(TagOrientation).map(_.toInt)
            case None => return None
          }
        }
        if (m == 0xda) { // SOS: entropy data follows, census is done
          return dims.map { case (w, h, p) =>
            ImageMeta("jpeg", w, h, orient, Some(p)) }
        }
        pos = mpos + 1 + seglen
      }
    }
    None
  }

  private def parseWebp(b: Array[Byte]): Option[ImageMeta] = {
    val csz = u32le(b, 16)
    val body = 20
    if (body + csz > b.length) return None
    val cid = new String(b, 12, 4, "ISO-8859-1")
    cid match {
      case "VP8 " =>
        // lossy: 3-byte frame tag (keyframe bit 0 = 0), sync 9D 01 2A,
        // then 14-bit dims in two LE u16s
        if (csz < 10) return None
        if ((b(body) & 1) != 0) return None // not a keyframe
        if ((b(body + 3) & 0xff) != 0x9d || (b(body + 4) & 0xff) != 0x01 ||
          (b(body + 5) & 0xff) != 0x2a) return None
        val w = u16le(b, body + 6) & 0x3fff
        val h = u16le(b, body + 8) & 0x3fff
        if (w == 0 || h == 0) return None
        Some(ImageMeta("webp", w, h, None, None))
      case "VP8L" =>
        // lossless: sig 0x2F then 14+14 bit dims-minus-one, version 0
        if (csz < 5 || (b(body) & 0xff) != 0x2f) return None
        val bits = u32le(b, body + 1)
        if (((bits >> 29) & 0x7) != 0) return None
        val w = (bits & 0x3fff).toInt + 1
        val h = ((bits >> 14) & 0x3fff).toInt + 1
        Some(ImageMeta("webp", w, h, None, None))
      case "VP8X" =>
        // extended: flags + 24-bit LE canvas dims-minus-one
        if (csz < 10) return None
        val w = u24le(b, body + 4) + 1
        val h = u24le(b, body + 7) + 1
        Some(ImageMeta("webp", w, h, None, None))
      case _ => None
    }
  }

  /**
   * Decode header metadata for the five families. None for anything
   * unrecognized or structurally unclean — a corrupt header is a drop,
   * never a field-guessing opportunity. BMP height is stored signed
   * (negative = top-down row order); the census reports |height| —
   * raster direction is not a dimension.
   */
  def parseImageMeta(b: Array[Byte]): Option[ImageMeta] = {
    if (b == null || b.length < 16) return None
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) return parseJpeg(b)
    if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
      if (b.length < 26) return None
      if (u32be(b, 8) != 13L || b(12) != 'I' || b(13) != 'H' ||
        b(14) != 'D' || b(15) != 'R') return None
      val w = u32be(b, 16)
      val h = u32be(b, 20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
      return Some(ImageMeta("png", w.toInt, h.toInt, None,
        Some(b(24) & 0xff)))
    }
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      val w = u16le(b, 6)
      val h = u16le(b, 8)
      if (w == 0 || h == 0) return None
      return Some(ImageMeta("gif", w, h, None, None))
    }
    if (b(0) == 'B' && b(1) == 'M') {
      if (b.length < 54) return None
      if (u32le(b, 14) != 40L) return None // BITMAPINFOHEADER only
      val w = i32le(b, 18)
      val rawH = i32le(b, 22)
      val planes = u16le(b, 26)
      val bpp = u16le(b, 28)
      if (w <= 0 || rawH == 0 || planes != 1) return None
      if (!Set(1, 4, 8, 16, 24, 32).contains(bpp)) return None
      return Some(ImageMeta("bmp", w, math.abs(rawH), None, Some(bpp)))
    }
    if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b.length >= 20 && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' &&
      b(11) == 'P') {
      if (8L + u32le(b, 4) > b.length) return None
      return parseWebp(b)
    }
    if ((b(0) == 'I' && b(1) == 'I' && (b(2) & 0xff) == 0x2a && b(3) == 0) ||
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && (b(3) & 0xff) == 0x2a))
      return parseTiff(b)
    None
  }

  /** Output schema of [[imageMeta]]. */
  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("orientation", IntegerType),
    StructField("bit_depth", IntegerType)))

  /** One row per recognized payload; unrecognized/corrupt payloads are
   * dropped. Narrow mapPartitions — O(header) bytes per row. */
  def imageMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseImageMeta(r.getAs[Array[Byte]](pIdx)).map { m =>
          Row(id, m.format, m.width, m.height,
            m.orientation.map(Int.box).orNull,
            m.bitDepth.map(Int.box).orNull)
        }.iterator
      }
    }(Encoders.row(metaSchema))
  }

  /** Minimal structurally-valid JPEG: SOI, optional APP1 Exif carrying
   * ONLY an IFD0 Orientation entry (byte order `le`), a dummy DQT, a
   * SOF (baseline C0 or progressive C2), SOS with `10 + id%20` entropy
   * bytes (never 0xFF, so no marker false-positives), EOI. */
  def syntheticJpeg(width: Int, height: Int, orientation: Option[Int],
      le: Boolean, progressive: Boolean, id: Long): Array[Byte] = {
    require(width > 0 && height > 0 && width < 65536 && height < 65536)
    val bo = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { bo.write(0xff); bo.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      val len = body.length + 2
      bo.write((len >> 8) & 0xff); bo.write(len & 0xff)
      bo.write(body, 0, body.length)
    }
    marker(0xd8)
    orientation.foreach { o =>
      val tb = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit =
        if (le) { tb.write(v & 0xff); tb.write((v >> 8) & 0xff) }
        else { tb.write((v >> 8) & 0xff); tb.write(v & 0xff) }
      def w32(v: Int): Unit =
        if (le) { tb.write(v & 0xff); tb.write((v >> 8) & 0xff)
          tb.write((v >> 16) & 0xff); tb.write((v >> 24) & 0xff) }
        else { tb.write((v >> 24) & 0xff); tb.write((v >> 16) & 0xff)
          tb.write((v >> 8) & 0xff); tb.write(v & 0xff) }
      tb.write("Exif".getBytes("ISO-8859-1"), 0, 4); tb.write(0); tb.write(0)
      if (le) { tb.write('I'); tb.write('I') } else { tb.write('M'); tb.write('M') }
      w16(42); w32(8)
      w16(1) // one IFD0 entry
      w16(0x0112); w16(3); w32(1)
      w16(o); w16(0) // SHORT value padded to 4 bytes
      w32(0) // no next IFD
      seg(0xe1, tb.toByteArray)
    }
    seg(0xdb, Array.tabulate(5)(j => ((id + j) & 0x7f).toByte))
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8) // precision
    sof.write((height >> 8) & 0xff); sof.write(height & 0xff)
    sof.write((width >> 8) & 0xff); sof.write(width & 0xff)
    sof.write(3)
    (1 to 3).foreach { c => sof.write(c); sof.write(0x11); sof.write(0) }
    seg(if (progressive) 0xc2 else 0xc0, sof.toByteArray)
    val sos = new java.io.ByteArrayOutputStream()
    sos.write(3)
    (1 to 3).foreach { c => sos.write(c); sos.write(0) }
    sos.write(0); sos.write(63); sos.write(0)
    seg(0xda, sos.toByteArray)
    (0 until (10 + id % 20).toInt).foreach(j =>
      bo.write(((id * 11 + j) % 255).toInt))
    marker(0xd9)
    bo.toByteArray
  }

  /** Minimal BITMAPINFOHEADER BMP; `topDown` stores height negated. */
  def syntheticBmp(width: Int, height: Int, bpp: Int, topDown: Boolean,
      id: Long): Array[Byte] = {
    require(width > 0 && height > 0)
    val bo = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { bo.write(v & 0xff); bo.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
    val pixels = (8 + id % 24).toInt // opaque, never parsed
    bo.write('B'); bo.write('M')
    u32(54 + pixels); u16(0); u16(0); u32(54)
    u32(40); u32(width); u32(if (topDown) -height else height)
    u16(1); u16(bpp); u32(0); u32(pixels); u32(2835); u32(2835)
    u32(0); u32(0)
    (0 until pixels).foreach(j => bo.write(((id * 13 + j) & 0xff).toInt))
    bo.toByteArray
  }

  /** Minimal WebP; `variant` 0=VP8 (lossy), 1=VP8L (lossless),
   * 2=VP8X (extended, canvas dims). */
  def syntheticWebp(width: Int, height: Int, variant: Int, id: Long): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0x3fff && height <= 0x3fff)
    val bo = new java.io.ByteArrayOutputStream()
    def cc(s: String): Unit = bo.write(s.getBytes("ISO-8859-1"), 0, 4)
    def u32(v: Int): Unit = {
      bo.write(v & 0xff); bo.write((v >> 8) & 0xff)
      bo.write((v >> 16) & 0xff); bo.write((v >> 24) & 0xff)
    }
    val body = new java.io.ByteArrayOutputStream()
    val tag = variant match {
      case 0 =>
        body.write(0); body.write(0); body.write(0) // frame tag: keyframe
        body.write(0x9d); body.write(0x01); body.write(0x2a)
        body.write(width & 0xff); body.write((width >> 8) & 0xff)
        body.write(height & 0xff); body.write((height >> 8) & 0xff)
        (0 until (6 + id % 10).toInt).foreach(j =>
          body.write(((id + j) & 0xff).toInt))
        "VP8 "
      case 1 =>
        body.write(0x2f)
        val bits = (width - 1) | ((height - 1) << 14)
        body.write(bits & 0xff); body.write((bits >> 8) & 0xff)
        body.write((bits >> 16) & 0xff); body.write((bits >> 24) & 0xff)
        (0 until (4 + id % 10).toInt).foreach(j =>
          body.write(((id * 3 + j) & 0xff).toInt))
        "VP8L"
      case _ =>
        body.write(0); body.write(0); body.write(0); body.write(0)
        val w1 = width - 1; val h1 = height - 1
        body.write(w1 & 0xff); body.write((w1 >> 8) & 0xff)
        body.write((w1 >> 16) & 0xff)
        body.write(h1 & 0xff); body.write((h1 >> 8) & 0xff)
        body.write((h1 >> 16) & 0xff)
        "VP8X"
    }
    val bb = body.toByteArray
    cc("RIFF"); u32(4 + 8 + bb.length + (bb.length & 1)); cc("WEBP")
    cc(tag); u32(bb.length)
    bo.write(bb, 0, bb.length)
    if ((bb.length & 1) == 1) bo.write(0)
    bo.toByteArray
  }

  /** Minimal single-IFD TIFF: dims as LONG entries, BitsPerSample a
   * count-3 SHORT array through the value-offset indirection (the RGB
   * shape real files have), optional Orientation; `le` picks II/MM. */
  def syntheticTiff(width: Int, height: Int, bits: Int,
      orientation: Option[Int], le: Boolean, id: Long): Array[Byte] = {
    require(width > 0 && height > 0)
    val bo = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (le) { bo.write(v & 0xff); bo.write((v >> 8) & 0xff) }
      else { bo.write((v >> 8) & 0xff); bo.write(v & 0xff) }
    def w32(v: Int): Unit =
      if (le) { bo.write(v & 0xff); bo.write((v >> 8) & 0xff)
        bo.write((v >> 16) & 0xff); bo.write((v >> 24) & 0xff) }
      else { bo.write((v >> 24) & 0xff); bo.write((v >> 16) & 0xff)
        bo.write((v >> 8) & 0xff); bo.write(v & 0xff) }
    if (le) { bo.write('I'); bo.write('I') } else { bo.write('M'); bo.write('M') }
    w16(42); w32(8)
    val n = 3 + orientation.size
    w16(n)
    val bitsArrayOff = 8 + 2 + 12 * n + 4
    def entry(tag: Int, tpe: Int, cnt: Int, value: Int): Unit = {
      w16(tag); w16(tpe); w32(cnt)
      if (tpe == 3 && cnt == 1) { w16(value); w16(0) } else w32(value)
    }
    entry(0x0100, 4, 1, width)
    entry(0x0101, 4, 1, height)
    entry(0x0102, 3, 3, bitsArrayOff) // offset to the SHORT[3] below
    orientation.foreach(o => entry(0x0112, 3, 1, o))
    w32(0) // no next IFD
    w16(bits); w16(bits); w16(bits)
    // trailing opaque strip bytes (never parsed)
    (0 until (12 + id % 20).toInt).foreach(j =>
      bo.write(((id * 7 + j) & 0xff).toInt))
    bo.toByteArray
  }

  /** Deterministic mixed-image fixture shared by the writer, the m29
   * oracle and the spec. Family by `id%7`, dims shared by all families:
   * `w = 16 + (id*7)%240`, `h = 16 + (id*3)%240`.
   *
   *   - 0 → JPEG with Exif orientation `1 + id%8`, byte order II when
   *     `(id/7)%2 == 0` else MM (endianness is the engine's to erase)
   *   - 1 → JPEG without APP1, progressive (SOF2) — orientation null
   *   - 2 → PNG ([[Multimodal.syntheticPng]]: real encoder, bit depth 8)
   *   - 3 → GIF ([[Multimodal.syntheticGif]], 2 frames; logical screen
   *     dims are the census dims)
   *   - 4 → BMP, bpp 24/8/32 by `(id/7)%3`, stored top-down (negative
   *     height) when `(id/7)%3 == 1`
   *   - 5 → WebP, variant VP8/VP8L/VP8X by `(id/7)%3`
   *   - 6 → TIFF, bits 8, orientation `1 + id%8` when `(id/7)%2 == 0`
   *     else absent, byte order MM when `(id/7)%2 == 0` else II
   */
  def syntheticImage(id: Long): Array[Byte] = {
    val w = (16 + (id * 7) % 240).toInt
    val h = (16 + (id * 3) % 240).toInt
    (id % 7) match {
      case 0 => syntheticJpeg(w, h, Some((1 + id % 8).toInt),
        le = (id / 7) % 2 == 0, progressive = false, id)
      case 1 => syntheticJpeg(w, h, None, le = true, progressive = true, id)
      case 2 => Multimodal.syntheticPng(w, h, id)
      case 3 => Multimodal.syntheticGif(w, h, 2, id)
      case 4 => syntheticBmp(w, h, Seq(24, 8, 32)(((id / 7) % 3).toInt),
        topDown = (id / 7) % 3 == 1, id)
      case 5 => syntheticWebp(w, h, ((id / 7) % 3).toInt, id)
      case _ => syntheticTiff(w, h, 8,
        if ((id / 7) % 2 == 0) Some((1 + id % 8).toInt) else None,
        le = (id / 7) % 2 == 1, id)
    }
  }

  /** Executor-side mixed-image fixtures — the m29 oracle replays the
   * family rotation and dim formulas. */
  def syntheticImages(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticImage)

  // =====================================================================
  // EXIF deep walk (m38): IFD0 → Exif sub-IFD (capture time, pixel
  // dims) → GPS sub-IFD (lat/lon rationals) — the photo-provenance
  // census a multimodal curation pipeline filters and dedups on
  // (capture-time clustering, geo fencing) before any pixel decode.
  // =====================================================================

  /** Deep EXIF projection — a PROJECTED SUBSET of the tag space, by
   * contract: IFD0 scalars plus the Exif and GPS sub-IFDs. IFD1
   * (the thumbnail IFD) is reported as a presence boolean only
   * (`hasThumbnail` = IFD0's next-IFD pointer is non-zero), never
   * walked; maker notes, interoperability IFDs and all unprojected
   * tags are strided structurally. Census consumers must not assume
   * tag completeness beyond the named fields.
   *
   * `lat`/`lon` are SIGNED decimal degrees computed as
   * `deg + min/60.0 + sec/3600.0` in exactly that IEEE operation order
   * (each component first divided by its own denominator) — documented
   * because the conformance oracle replays the same op order and
   * doubles compare exactly. */
  final case class ExifMeta(orientation: Option[Int],
      dtOriginal: Option[String], pixelX: Option[Long], pixelY: Option[Long],
      lat: Option[Double], lon: Option[Double], hasThumbnail: Boolean)

  /**
   * Walk the full EXIF chain of a JPEG (APP1 `Exif`) or standalone TIFF
   * payload. IFD0's scalar tags and its two sub-IFD pointer tags
   * (0x8769 Exif, 0x8825 GPS) are followed; inside Exif:
   * DateTimeOriginal (0x9003, ASCII, NUL trimmed), PixelXDimension /
   * PixelYDimension (0xA002/0xA003, SHORT or LONG); inside GPS: the
   * ref/rational quadruple (0x0001–0x0004), each coordinate a count-3
   * RATIONAL through the value-offset indirection, S/W refs negating.
   * Unprojected tags are strided by the fixed 12-byte entry layout.
   *
   * None when there is no TIFF header to walk (a JPEG without APP1
   * Exif, a non-JPEG/TIFF payload) or the structure is malformed —
   * absence and corruption both poison, matching [[parseImageMeta]]'s
   * strict Exif posture. Fields missing INSIDE a clean chain are
   * None-fields, not corruption.
   */
  def parseExif(b: Array[Byte]): Option[ExifMeta] = {
    if (b == null || b.length < 8) return None
    // locate the TIFF header: standalone TIFF at 0, or JPEG APP1 Exif
    val tiff: Option[(Int, Int)] = // (tiffStart, end)
      if ((b(0) == 'I' && b(1) == 'I') || (b(0) == 'M' && b(1) == 'M'))
        Some((0, b.length))
      else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        var pos = 2
        var found: Option[(Int, Int)] = None
        var stop = false
        while (!stop && found.isEmpty && pos + 4 <= b.length) {
          if ((b(pos) & 0xff) != 0xff) stop = true
          else {
            var mpos = pos + 1
            while (mpos < b.length && (b(mpos) & 0xff) == 0xff) mpos += 1
            if (mpos >= b.length) stop = true
            else {
              val m = b(mpos) & 0xff
              if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
                pos = mpos + 1
              } else if (m == 0xd9 || m == 0xda) stop = true
              else {
                if (mpos + 3 > b.length) stop = true
                else {
                  val seglen = u16be(b, mpos + 1)
                  if (seglen < 2 || mpos + 1 + seglen > b.length) stop = true
                  else {
                    val body = mpos + 3
                    if (m == 0xe1 && seglen >= 8 && b(body) == 'E' &&
                      b(body + 1) == 'x' && b(body + 2) == 'i' &&
                      b(body + 3) == 'f' && b(body + 4) == 0 &&
                      b(body + 5) == 0)
                      found = Some((body + 6, mpos + 1 + seglen))
                    pos = mpos + 1 + seglen
                  }
                }
              }
            }
          }
        }
        found
      } else None
    tiff.flatMap { case (t, end) => walkExifChain(b, t, end) }
  }

  private def walkExifChain(b: Array[Byte], tiff: Int, end: Int): Option[ExifMeta] = {
    val le =
      if (b(tiff) == 'I' && b(tiff + 1) == 'I') true
      else if (b(tiff) == 'M' && b(tiff + 1) == 'M') false
      else return None
    def r16(i: Int) = if (le) u16le(b, i) else u16be(b, i)
    def r32(i: Int) = if (le) u32le(b, i) else u32be(b, i)
    if (tiff + 8 > end || r16(tiff + 2) != 42) return None

    // one IFD pass: f(tag, type, count, valueFieldOffset); returns false
    // on structural malformation
    def walkIfd(ifdOff: Long)(f: (Int, Int, Long, Int) => Unit): Boolean = {
      val ifd = tiff + ifdOff
      if (ifd < tiff || ifd + 2 > end) return false
      val n = r16(ifd.toInt)
      val base = ifd.toInt + 2
      if (base + 12L * n > end) return false
      var i = 0
      while (i < n) {
        val e = base + 12 * i
        f(r16(e), r16(e + 2), r32(e + 4), e + 8)
        i += 1
      }
      true
    }
    // ASCII value of `count` bytes (incl. NUL): inline when <= 4, else
    // through the offset; trimmed at the first NUL
    def ascii(cnt: Long, vOff: Int): Option[String] = {
      if (cnt <= 0 || cnt > (1 << 16)) return None
      val off = if (cnt <= 4) vOff.toLong else tiff + r32(vOff)
      if (off < tiff || off + cnt > end) return None
      val raw = new String(b, off.toInt, cnt.toInt, "US-ASCII")
      val nul = raw.indexOf('\u0000')
      Some(if (nul >= 0) raw.substring(0, nul) else raw)
    }
    def shortOrLong(tpe: Int, vOff: Int): Option[Long] =
      if (tpe == 3) Some(r16(vOff).toLong)
      else if (tpe == 4) Some(r32(vOff))
      else None
    // count-3 RATIONAL coordinate → deg + min/60.0 + sec/3600.0
    def rational3(cnt: Long, vOff: Int): Option[Double] = {
      if (cnt != 3L) return None
      val off = tiff + r32(vOff)
      if (off < tiff || off + 24 > end) return None
      val o = off.toInt
      def part(k: Int): Option[Double] = {
        val num = r32(o + 8 * k)
        val den = r32(o + 8 * k + 4)
        if (den == 0L) None else Some(num.toDouble / den.toDouble)
      }
      for (d <- part(0); m <- part(1); s <- part(2))
        yield d + m / 60.0 + s / 3600.0
    }

    var orientation: Option[Int] = None
    var exifPtr: Option[Long] = None
    var gpsPtr: Option[Long] = None
    val ifd0Off = r32(tiff + 4)
    if (!walkIfd(ifd0Off) { (tag, tpe, cnt, vOff) =>
      tag match {
        case 0x0112 if tpe == 3 && cnt == 1L =>
          val v = r16(vOff)
          if (v >= 1 && v <= 8) orientation = Some(v)
        case 0x8769 if tpe == 4 && cnt == 1L => exifPtr = Some(r32(vOff))
        case 0x8825 if tpe == 4 && cnt == 1L => gpsPtr = Some(r32(vOff))
        case _ => ()
      }
    }) return None
    // IFD1 presence: IFD0's next-IFD pointer (4 bytes after the entry
    // table) — a non-zero pointer means a thumbnail IFD exists. The
    // pointer is REPORTED, never followed (projected-subset contract).
    val ifd0 = (tiff + ifd0Off).toInt
    val ifd0N = r16(ifd0)
    val nextOff = ifd0 + 2 + 12 * ifd0N
    val hasThumbnail = nextOff + 4 <= end && r32(nextOff) != 0L

    var dt: Option[String] = None
    var px: Option[Long] = None
    var py: Option[Long] = None
    // plain boolean accumulation, no `return` inside the foreach
    // closures (NonLocalReturnControl — the parsePackets lesson)
    var subOk = true
    exifPtr.foreach { p =>
      subOk = subOk && walkIfd(p) { (tag, tpe, cnt, vOff) =>
        tag match {
          case 0x9003 if tpe == 2 => dt = ascii(cnt, vOff)
          case 0xA002 => px = shortOrLong(tpe, vOff)
          case 0xA003 => py = shortOrLong(tpe, vOff)
          case _ => ()
        }
      }
    }

    var latRef, lonRef: Option[String] = None
    var latAbs, lonAbs: Option[Double] = None
    gpsPtr.foreach { p =>
      subOk = subOk && walkIfd(p) { (tag, tpe, cnt, vOff) =>
        tag match {
          case 0x0001 if tpe == 2 => latRef = ascii(cnt, vOff)
          case 0x0002 if tpe == 5 => latAbs = rational3(cnt, vOff)
          case 0x0003 if tpe == 2 => lonRef = ascii(cnt, vOff)
          case 0x0004 if tpe == 5 => lonAbs = rational3(cnt, vOff)
          case _ => ()
        }
      }
    }
    if (!subOk) return None
    val lat = for (v <- latAbs; r <- latRef)
      yield if (r == "S") -v else v
    val lon = for (v <- lonAbs; r <- lonRef)
      yield if (r == "W") -v else v
    Some(ExifMeta(orientation, dt, px, py, lat, lon, hasThumbnail))
  }

  /** Output schema of [[exifMeta]]. */
  val exifSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("orientation", IntegerType),
    StructField("dt_original", StringType),
    StructField("pixel_x", LongType),
    StructField("pixel_y", LongType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("has_thumbnail", IntegerType)))

  /** One row per payload with a walkable EXIF chain; payloads without
   * one contribute nothing. Narrow mapPartitions — header-only reads. */
  def exifMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseExif(r.getAs[Array[Byte]](pIdx)).map { m =>
          Row(id, m.orientation.map(Int.box).orNull, m.dtOriginal.orNull,
            m.pixelX.map(Long.box).orNull, m.pixelY.map(Long.box).orNull,
            m.lat.map(Double.box).orNull, m.lon.map(Double.box).orNull,
            if (m.hasThumbnail) 1 else 0)
        }.iterator
      }
    }(Encoders.row(exifSchema))
  }

  /** Deterministic GPS-tagged JPEG fixture shared by the writer, the
   * m38 oracle and the spec. Byte order II when `id%2 == 0` else MM
   * (endianness is the engine's to erase). IFD0: orientation
   * `1 + id%8`, Exif and GPS sub-IFD pointers. Exif IFD:
   * DateTimeOriginal `20<10 + id%30>:0<1 + id%9>:<10 + id%19>
   * 0<id%10>:5<id%10>:3<id%6>`, PixelXDimension `640 + id%1280`
   * (SHORT), PixelYDimension `480 + id%960` (LONG). GPS IFD: lat ref
   * N/S by `id%3 == 0`, lat `deg = id%90, min = id%60,
   * sec = (id*37 % 6000)/100` (denominators 1/1/100); lon ref E/W by
   * `id%5 < 2`, lon `deg = id%180, min = (id*3)%60,
   * sec = (id*53 % 6000)/100`; decimal degrees =
   * `±(deg + min/60.0 + (sec100/100.0)/3600.0)` in exactly that op
   * order. ids with `id%7 == 4` omit the GPS IFD (metadata absent, not
   * corruption); ids with `id%11 == 6` omit the whole APP1 (no chain —
   * zero rows); ids with `id%6 == 1` append a minimal IFD1 (one
   * Compression=6 entry) behind IFD0's next-IFD pointer —
   * `has_thumbnail` flips to 1, the thumbnail itself is never walked. */
  def syntheticExifJpeg(id: Long): Array[Byte] = {
    if (id % 11 == 6) return syntheticJpeg(
      (16 + (id * 7) % 240).toInt, (16 + (id * 3) % 240).toInt,
      None, le = true, progressive = false, id)
    val le = id % 2 == 0
    val tb = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (le) { tb.write(v & 0xff); tb.write((v >> 8) & 0xff) }
      else { tb.write((v >> 8) & 0xff); tb.write(v & 0xff) }
    def w32(v: Long): Unit =
      if (le) { tb.write((v & 0xff).toInt); tb.write(((v >> 8) & 0xff).toInt)
        tb.write(((v >> 16) & 0xff).toInt); tb.write(((v >> 24) & 0xff).toInt) }
      else { tb.write(((v >> 24) & 0xff).toInt); tb.write(((v >> 16) & 0xff).toInt)
        tb.write(((v >> 8) & 0xff).toInt); tb.write((v & 0xff).toInt) }
    val hasGps = id % 7 != 4
    val dt = f"20${10 + id % 30}%02d:0${1 + id % 9}:${10 + id % 19} " +
      f"0${id % 10}:5${id % 10}:3${id % 6}"
    val dtBytes = (dt + "\u0000").getBytes("US-ASCII") // 20 bytes
    require(dtBytes.length == 20)
    // layout (offsets relative to the TIFF header):
    //   8: IFD0 (2 + 2|3 entries*12 + 4)
    //   then Exif IFD (2 + 3*12 + 4), then dt bytes (20),
    //   then (if GPS) GPS IFD (2 + 4*12 + 4) + 2 rationals (24 + 24)
    val n0 = if (hasGps) 3 else 2
    val hasIfd1 = id % 6 == 1
    val ifd0 = 8L
    val exifIfd = ifd0 + 2 + 12 * n0 + 4
    val dtOff = exifIfd + 2 + 3 * 12 + 4
    val gpsIfd = dtOff + 20
    val latOff = gpsIfd + 2 + 4 * 12 + 4
    val lonOff = latOff + 24
    val ifd1Off = if (hasGps) lonOff + 24 else gpsIfd
    tb.write("Exif".getBytes("US-ASCII"), 0, 4); tb.write(0); tb.write(0)
    if (le) { tb.write('I'); tb.write('I') } else { tb.write('M'); tb.write('M') }
    w16(42); w32(ifd0)
    def entryShort(tag: Int, v: Int): Unit = {
      w16(tag); w16(3); w32(1L); w16(v); w16(0)
    }
    def entryLong(tag: Int, v: Long): Unit = { w16(tag); w16(4); w32(1L); w32(v) }
    // IFD0
    w16(n0)
    entryShort(0x0112, (1 + id % 8).toInt)
    entryLong(0x8769, exifIfd)
    if (hasGps) entryLong(0x8825, gpsIfd)
    w32(if (hasIfd1) ifd1Off else 0L) // next-IFD pointer (IFD1)
    // Exif IFD
    w16(3)
    w16(0x9003); w16(2); w32(20L); w32(dtOff)
    entryShort(0xA002, (640 + id % 1280).toInt)
    entryLong(0xA003, 480 + id % 960)
    w32(0L)
    tb.write(dtBytes, 0, 20)
    if (hasGps) {
      val latRef = if (id % 3 == 0) "S" else "N"
      val lonRef = if (id % 5 < 2) "W" else "E"
      def entryAscii2(tag: Int, s: String): Unit = {
        w16(tag); w16(2); w32(2L)
        // inline value: 2 ASCII bytes + 2 pad, NOT offset —
        // byte order does not apply to byte-wise values
        tb.write(s.charAt(0).toInt); tb.write(0); tb.write(0); tb.write(0)
      }
      def entryRational3(tag: Int, off: Long): Unit = {
        w16(tag); w16(5); w32(3L); w32(off)
      }
      w16(4)
      entryAscii2(0x0001, latRef)
      entryRational3(0x0002, latOff)
      entryAscii2(0x0003, lonRef)
      entryRational3(0x0004, lonOff)
      w32(0L)
      def rational(num: Long, den: Long): Unit = { w32(num); w32(den) }
      rational(id % 90, 1); rational(id % 60, 1); rational(id * 37 % 6000, 100)
      rational(id % 180, 1); rational(id * 3 % 60, 1)
      rational(id * 53 % 6000, 100)
    }
    if (hasIfd1) { // minimal thumbnail IFD: one Compression=6 entry
      w16(1)
      entryShort(0x0103, 6)
      w32(0L)
    }
    // wrap in the JPEG skeleton: SOI, APP1, DQT, SOF0, SOS, entropy, EOI
    val bo = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { bo.write(0xff); bo.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      val len = body.length + 2
      bo.write((len >> 8) & 0xff); bo.write(len & 0xff)
      bo.write(body, 0, body.length)
    }
    marker(0xd8)
    seg(0xe1, tb.toByteArray)
    seg(0xdb, Array.tabulate(5)(j => ((id + j) & 0x7f).toByte))
    val w = (16 + (id * 7) % 240).toInt
    val h = (16 + (id * 3) % 240).toInt
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8)
    sof.write((h >> 8) & 0xff); sof.write(h & 0xff)
    sof.write((w >> 8) & 0xff); sof.write(w & 0xff)
    sof.write(3)
    (1 to 3).foreach { c => sof.write(c); sof.write(0x11); sof.write(0) }
    seg(0xc0, sof.toByteArray)
    val sos = new java.io.ByteArrayOutputStream()
    sos.write(3)
    (1 to 3).foreach { c => sos.write(c); sos.write(0) }
    sos.write(0); sos.write(63); sos.write(0)
    seg(0xda, sos.toByteArray)
    (0 until (10 + id % 20).toInt).foreach(j =>
      bo.write(((id * 11 + j) % 255).toInt))
    marker(0xd9)
    bo.toByteArray
  }

  /** Executor-side EXIF fixtures — the m38 oracle replays the chain
   * formulas. */
  def syntheticExifJpegs(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticExifJpeg)
}
