package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * MIME multipart BODY census (RFC 2045/2046) — the walk [[Eml]] stops
 * short of by design: multipart boundaries (nested, depth-bounded),
 * per-part Content-Type/charset, and base64 / quoted-printable DECODED
 * size accounting WITHOUT payload retention. A mail/crawl corpus's
 * attachment mass lives behind transfer encodings; the census needs
 * "how many parts, what types, how many real bytes" — none of which
 * requires keeping a single decoded payload byte.
 *
 * Facts honored:
 *   - parts are delimited by `--boundary` lines and closed by
 *     `--boundary--` (RFC 2046 §5.1.1); the CRLF before a delimiter
 *     belongs to the delimiter; preamble and epilogue are ignored;
 *     transport padding (trailing SP/HT) on delimiter lines is allowed;
 *   - a part with a `multipart` top-level type recurses, DEPTH-BOUNDED
 *     at 8 (deeper nesting
 *     is pathological input → None, the family's strict posture);
 *   - only LEAF parts are emitted (containers contribute structure,
 *     not rows); the top level of a non-multipart message is its own
 *     single leaf at depth 0;
 *   - Content-Type params are parsed quoted or bare (RFC 2045 §5.1);
 *     charset is reported only when DECLARED (never defaulted);
 *   - decoded sizes: base64 = 3n/4 minus padding after whitespace
 *     strip, with the alphabet/padding/length validated (RFC 2045
 *     §6.8); quoted-printable counts `=XX` as one byte, soft breaks
 *     as zero, hard breaks as CRLF (§6.7), rejecting malformed escapes
 *     and non-ASCII; identity encodings (7bit/8bit/binary/absent)
 *     count raw UTF-8 bytes.
 *
 * Strict posture: declared multipart whose boundary never appears, a
 * missing close delimiter, an unparsable part header section, a bad
 * base64/QP stream, or depth overflow → None for the whole document.
 *
 * Narrow mapPartitions — zero exchanges.
 */
object Mime {

  /** One LEAF part, document order. */
  final case class Part(depth: Int, ctype: String, charset: Option[String],
      encoding: String, decodedBytes: Long)

  private val MaxDepth = 8

  /** Split one entity into (headers, raw body after the blank line).
   * An entity with no blank line is all-headers with an empty body; an
   * entity starting with a blank line has no headers. Header parsing
   * (folding, strict name charset) delegates to [[Eml.parseHeaders]]. */
  private def splitEntity(raw: String): Option[(IndexedSeq[Eml.Header], String)] = {
    // find the first blank line: a line terminator followed immediately
    // by another line terminator (\r\n or \n in any mix); headers end
    // before it, the body starts after it. An entity opening with a
    // blank line has no headers; no blank line = all-headers.
    var i = 0
    var headerEnd = -1 // exclusive end of the header text
    var bodyStart = -1
    if (raw.startsWith("\r\n")) { headerEnd = 0; bodyStart = 2 }
    else if (raw.startsWith("\n")) { headerEnd = 0; bodyStart = 1 }
    while (bodyStart < 0 && i < raw.length) {
      if (raw.charAt(i) == '\n') {
        if (raw.startsWith("\r\n", i + 1)) {
          headerEnd = i + 1; bodyStart = i + 3
        } else if (i + 1 < raw.length && raw.charAt(i + 1) == '\n') {
          headerEnd = i + 1; bodyStart = i + 2
        }
      }
      i += 1
    }
    val (hdrText, body) =
      if (bodyStart < 0) (raw, "") // all-headers entity
      else (raw.substring(0, headerEnd), raw.substring(bodyStart))
    if (hdrText.isEmpty) Some((IndexedSeq.empty, body))
    else Eml.parseHeaders(hdrText).map(hs => (hs, body))
  }

  /** `type/subtype` (lowercased) and the raw parameter tail. */
  private def contentType(hs: IndexedSeq[Eml.Header]): (String, String) =
    hs.find(_.name.equalsIgnoreCase("Content-Type")) match {
      case None => ("text/plain", "") // RFC 2045 §5.2 default
      case Some(h) =>
        val v = h.value
        val semi = v.indexOf(';')
        val t = (if (semi < 0) v else v.substring(0, semi)).trim
          .toLowerCase(java.util.Locale.ROOT)
        (t, if (semi < 0) "" else v.substring(semi + 1))
    }

  /** One Content-Type parameter, quoted or bare (case-insensitive
   * name). */
  private[graft] def param(tail: String, name: String): Option[String] = {
    val re = ("""(?i)(?:^|;)\s*""" + java.util.regex.Pattern.quote(name) +
      """\s*=\s*(?:"([^"]*)"|([^;\s]+))""").r
    re.findFirstMatchIn(tail).map(m =>
      Option(m.group(1)).getOrElse(m.group(2)))
  }

  private def transferEncoding(hs: IndexedSeq[Eml.Header]): String =
    hs.find(_.name.equalsIgnoreCase("Content-Transfer-Encoding"))
      .map(_.value.trim.toLowerCase(java.util.Locale.ROOT))
      .getOrElse("7bit")

  /** Base64 size accounting without retention: strip whitespace,
   * validate alphabet / padding position / length%4, return 3n/4 minus
   * padding. None on any violation. */
  private[graft] def base64Size(body: String): Option[Long] = {
    var n = 0L
    var pad = 0
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\r' || c == '\n' || c == ' ' || c == '\t') ()
      else if (c == '=') {
        if (pad >= 2) return None
        pad += 1; n += 1
      } else if (pad > 0) return None // data after padding
      else if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '/') n += 1
      else return None
      i += 1
    }
    if (n % 4 != 0) return None
    Some(n / 4 * 3 - pad)
  }

  /** Quoted-printable size accounting: `=XX` → 1 byte, `=CRLF`/`=LF`
   * soft break → 0, hard break → 2 (CRLF), printable ASCII → 1. None
   * on a malformed escape or a non-ASCII literal. */
  private[graft] def qpSize(body: String): Option[Long] = {
    var n = 0L
    var i = 0
    def hex(c: Char) = (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') ||
      (c >= 'a' && c <= 'f')
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '=') {
        if (i + 2 < body.length && body.charAt(i + 1) == '\r' &&
          body.charAt(i + 2) == '\n') i += 3 // soft break
        else if (i + 1 < body.length && body.charAt(i + 1) == '\n') i += 2
        else if (i + 2 < body.length && hex(body.charAt(i + 1)) &&
          hex(body.charAt(i + 2))) { n += 1; i += 3 }
        else if (i + 1 == body.length) i += 1 // trailing soft break at EOF
        else return None
      } else if (c == '\r' && i + 1 < body.length &&
        body.charAt(i + 1) == '\n') { n += 2; i += 2 }
      else if (c == '\n') { n += 2; i += 1 }
      else if (c == '\t' || (c >= ' ' && c < 0x7f)) { n += 1; i += 1 }
      else return None
    }
    Some(n)
  }

  private def identitySize(body: String): Long =
    body.getBytes("UTF-8").length.toLong

  /** Walk one entity (headers + body); emits leaves into `out`. False
   * on malformation. */
  private def walkEntity(raw: String, depth: Int,
      out: scala.collection.mutable.ArrayBuffer[Part]): Boolean = {
    if (depth > MaxDepth) return false
    splitEntity(raw) match {
      case None => false
      case Some((hs, body)) =>
        val (ctype, tail) = contentType(hs)
        if (ctype.startsWith("multipart/")) {
          param(tail, "boundary") match {
            case None => false
            case Some(bnd) if bnd.isEmpty => false
            case Some(bnd) => walkMultipart(body, bnd, depth + 1, out)
          }
        } else {
          val enc = transferEncoding(hs)
          val size = enc match {
            case "base64" => base64Size(body)
            case "quoted-printable" => qpSize(body)
            case _ => Some(identitySize(body))
          }
          size match {
            case None => false
            case Some(sz) =>
              out += Part(depth, ctype, param(tail, "charset")
                .map(_.toLowerCase(java.util.Locale.ROOT)), enc, sz)
              true
          }
        }
    }
  }

  /** Split `body` on `--bnd` delimiter lines and walk each part. The
   * close delimiter is mandatory; zero parts is malformation. */
  private def walkMultipart(body: String, bnd: String, depth: Int,
      out: scala.collection.mutable.ArrayBuffer[Part]): Boolean = {
    val delim = ("""(?:^|\r\n|\n)--""" +
      java.util.regex.Pattern.quote(bnd) +
      """(--)?[ \t]*(?:\r\n|\n|$)""").r
    val ms = delim.findAllMatchIn(body).toIndexedSeq
    if (ms.isEmpty) return false
    // parts live between consecutive delimiters; the close must exist
    // and nothing but delimiters may separate the parts
    val closeIdx = ms.indexWhere(_.group(1) != null)
    if (closeIdx < 0) return false // no --bnd-- close
    if (closeIdx < ms.size - 1) return false // delimiter after close
    if (closeIdx == 0) return false // close with zero parts
    var i = 0
    while (i < closeIdx) {
      val partStart = ms(i).end
      // the CRLF before the next delimiter belongs to the delimiter
      val partEnd = ms(i + 1).start
      if (!walkEntity(body.substring(partStart, partEnd), depth, out))
        return false
      i += 1
    }
    true
  }

  /**
   * Parse one document's MIME structure into its leaf parts. None on
   * malformation as documented on the object. A non-multipart document
   * yields exactly one leaf at depth 0.
   */
  def parseParts(text: String): Option[IndexedSeq[Part]] = {
    if (text == null) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Part]
    if (walkEntity(text, 0, out)) Some(out.toIndexedSeq) else None
  }

  /** Output schema of [[mimeParts]]. */
  val partSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("part_no", IntegerType),
    StructField("depth", IntegerType),
    StructField("ctype", StringType),
    StructField("charset", StringType),
    StructField("encoding", StringType),
    StructField("decoded_bytes", LongType)))

  /** One row per LEAF part (document order); documents whose MIME
   * structure is not clean contribute nothing. Narrow mapPartitions. */
  def mimeParts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val tIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val doc = if (r.isNullAt(tIdx)) null else r.getString(tIdx)
        parseParts(doc) match {
          case Some(ps) => ps.iterator.zipWithIndex.map { case (p, i) =>
            Row(id, i, p.depth, p.ctype, p.charset.orNull, p.encoding,
              p.decodedBytes)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(partSchema))
  }

  /** Deterministic MIME fixture shared by the writer, the t45 oracle
   * and the spec (CRLF line endings). `id%13 == 7` documents are the
   * MALFORMED-BOUNDARY negative: declared multipart whose body opens a
   * part but never carries the `--boundary--` close delimiter —
   * [[parseParts]] returns None, the document contributes zero rows
   * (strict posture pinned by the differential). `id%7 == 3` documents
   * are NON-multipart text/plain; charset=utf-8 with the transfer
   * encoding rotating by `id%3` (absent→7bit / quoted-printable /
   * base64).
   * All others are multipart/mixed with boundary `b<id%100>` (quoted
   * in the header on even ids, bare on odd), a preamble line when
   * `id%3 == 0`, an epilogue after the close when `id%6 == 5`, and
   * these parts:
   *
   *   - part 0: text/plain; charset=us-ascii, 7bit, body
   *     `p0_<id%100>` + "a"*(id%40) → decoded = 3 + len + id%40;
   *   - part 1: application/octet-stream, base64 of `20 + id%50`
   *     opaque bytes (MIME-wrapped at 76) → decoded = 20 + id%50;
   *   - when `id%4 == 1`: text/html; charset=iso-8859-1,
   *     quoted-printable `h_<id%100>` + "=E9"*(id%7) + soft break +
   *     `z` → decoded = 2 + len + id%7 + 1;
   *   - when `id%5 == 2`: a NESTED multipart/alternative (boundary
   *     `nb<id%10>`) holding text/plain `n1_<id%100>` (no charset) and
   *     text/html; charset=utf-8 `<b>n2_<id%100></b>` — two depth-2
   *     leaves.
   *
   * Quoted-printable bodies here decode to pure byte counts; the
   * engine never retains a decoded payload. */
  def syntheticMime(id: Long): String = {
    val k = id % 100
    val sb = new StringBuilder
    if (id % 13 == 7) { // malformed: a part opens, the close never comes
      sb ++= s"From: m${id % 20}@ex.example\r\n"
      sb ++= s"Content-Type: multipart/mixed; boundary=b$k\r\n\r\n"
      sb ++= s"--b$k\r\n"
      sb ++= "Content-Type: text/plain\r\n\r\n"
      sb ++= s"orphan_$k"
      return sb.toString
    }
    if (id % 7 == 3) {
      sb ++= s"From: m${id % 20}@ex.example\r\n"
      sb ++= "Content-Type: text/plain; charset=utf-8\r\n"
      (id % 3) match {
        case 0 => // absent → 7bit
          sb ++= "\r\n"
          sb ++= s"plain_${k}_" + "x" * (id % 30).toInt
        case 1 =>
          sb ++= "Content-Transfer-Encoding: quoted-printable\r\n\r\n"
          sb ++= s"plain_$k" + "=41" * (id % 5).toInt + "=\r\n" +
            s"t${id % 10}"
        case _ =>
          sb ++= "Content-Transfer-Encoding: base64\r\n\r\n"
          val bytes = Array.tabulate((15 + id % 40).toInt)(j =>
            ((id * 13 + j) & 0xff).toByte)
          sb ++= new String(java.util.Base64.getMimeEncoder(76,
            "\r\n".getBytes("US-ASCII")).encode(bytes), "US-ASCII")
      }
      return sb.toString
    }
    val b = s"b$k"
    sb ++= s"From: m${id % 20}@ex.example\r\n"
    if (id % 2 == 0)
      sb ++= s"""Content-Type: multipart/mixed; boundary="$b"\r\n\r\n"""
    else
      sb ++= s"Content-Type: multipart/mixed; boundary=$b\r\n\r\n"
    if (id % 3 == 0) sb ++= s"pre${id % 5}\r\n"
    sb ++= s"--$b\r\n"
    sb ++= "Content-Type: text/plain; charset=us-ascii\r\n\r\n"
    sb ++= s"p0_$k" + "a" * (id % 40).toInt
    sb ++= s"\r\n--$b\r\n"
    sb ++= "Content-Type: application/octet-stream\r\n"
    sb ++= "Content-Transfer-Encoding: base64\r\n\r\n"
    val bytes = Array.tabulate((20 + id % 50).toInt)(j =>
      ((id * 13 + j) & 0xff).toByte)
    sb ++= new String(java.util.Base64.getMimeEncoder(76,
      "\r\n".getBytes("US-ASCII")).encode(bytes), "US-ASCII")
    if (id % 4 == 1) {
      sb ++= s"\r\n--$b\r\n"
      sb ++= "Content-Type: text/html; charset=iso-8859-1\r\n"
      sb ++= "Content-Transfer-Encoding: quoted-printable\r\n\r\n"
      sb ++= s"h_$k" + "=E9" * (id % 7).toInt + "=\r\n" + "z"
    }
    if (id % 5 == 2) {
      val nb = s"nb${id % 10}"
      sb ++= s"\r\n--$b\r\n"
      sb ++= s"Content-Type: multipart/alternative; boundary=$nb\r\n\r\n"
      sb ++= s"--$nb\r\n"
      sb ++= "Content-Type: text/plain\r\n\r\n"
      sb ++= s"n1_$k"
      sb ++= s"\r\n--$nb\r\n"
      sb ++= "Content-Type: text/html; charset=utf-8\r\n\r\n"
      sb ++= s"<b>n2_$k</b>"
      sb ++= s"\r\n--$nb--"
    }
    sb ++= s"\r\n--$b--"
    if (id % 6 == 5) sb ++= s"\r\nep${id % 6}"
    sb.toString
  }

  /** Executor-side MIME fixtures — the t45 oracle replays the part
   * formulas. */
  def syntheticMimes(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("mime_text", StringType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        Row(id, syntheticMime(id))
      }
    }(Encoders.row(schema))
  }
}
