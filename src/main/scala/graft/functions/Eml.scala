package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * Email (EML / RFC 5322) header extraction with RFC 2047 encoded-word
 * decoding — the text-side sibling of the tag extractors: mail archives
 * (mailing lists, support dumps, Enron-style corpora) are a standard
 * crawled-text source, and their metadata lives in folded, MIME-encoded
 * headers that naive line-splitting mangles.
 *
 * Facts honored:
 *   - header section ends at the first empty line; each header is
 *     `Name: value` with folding — a CRLF (or LF) followed by SP/HT
 *     continues the previous header, unfolded to a single SP
 *     (RFC 5322 §2.2.3);
 *   - header names are printable US-ASCII except colon (§2.2); the
 *     walk is STRICT about this one thing — a non-header line that is
 *     not a continuation poisons the document (binary junk masquerading
 *     as mail), the same never-garbage posture as the media walkers;
 *   - encoded words `=?charset?B|Q?payload?=` (RFC 2047): B = base64,
 *     Q = quoted-printable variant (`_` is SPACE, `=XX` hex); adjacent
 *     encoded words separated only by whitespace join WITHOUT the
 *     whitespace (§6.2); an undecodable word (unknown charset, bad
 *     base64/hex, or bytes invalid in the declared charset) is left
 *     VERBATIM per the RFC's display rule, never replaced with
 *     mojibake.
 *
 * Narrow mapPartitions — zero exchanges.
 */
object Eml {

  /** One header, file order: original-case name, lowercased name, and
   * the unfolded + RFC 2047-decoded value. */
  final case class Header(name: String, value: String)

  private val EncodedWord =
    """=\?([^?\s]+)\?([bBqQ])\?([^?\s]*)\?=""".r

  /** Decode one encoded-word; None leaves it verbatim. */
  private def decodeWord(charset: String, enc: String,
      payload: String): Option[String] = {
    val bytes: Option[Array[Byte]] =
      if (enc == "B" || enc == "b") {
        try Some(java.util.Base64.getDecoder.decode(payload))
        catch { case _: IllegalArgumentException => None }
      } else { // Q
        val bo = new java.io.ByteArrayOutputStream()
        var i = 0
        var ok = true
        while (ok && i < payload.length) {
          payload.charAt(i) match {
            case '_' => bo.write(' '); i += 1
            case '=' =>
              if (i + 2 < payload.length) {
                val hex = payload.substring(i + 1, i + 3)
                try { bo.write(Integer.parseInt(hex, 16)); i += 3 }
                catch { case _: NumberFormatException => ok = false }
              } else ok = false
            case c if c < 0x80 => bo.write(c.toInt); i += 1
            case _ => ok = false
          }
        }
        if (ok) Some(bo.toByteArray) else None
      }
    bytes.flatMap { bs =>
      try {
        val dec = java.nio.charset.Charset.forName(charset).newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        Some(dec.decode(java.nio.ByteBuffer.wrap(bs)).toString)
      } catch { case _: Exception => None }
    }
  }

  /** RFC 2047 decode over a whole (already unfolded) value: encoded
   * words decoded in place, whitespace BETWEEN adjacent encoded words
   * dropped (§6.2), undecodable words left verbatim. */
  private[graft] def decodeValue(v: String): String = {
    val ms = EncodedWord.findAllMatchIn(v).toIndexedSeq
    if (ms.isEmpty) return v
    val sb = new StringBuilder
    var last = 0
    var prevWasDecoded = false
    ms.foreach { m =>
      val gap = v.substring(last, m.start)
      val decoded = decodeWord(m.group(1), m.group(2), m.group(3))
      // drop pure-whitespace separation between two DECODED words (§6.2)
      if (prevWasDecoded && decoded.isDefined &&
        gap.nonEmpty && gap.forall(c => c == ' ' || c == '\t')) ()
      else sb ++= gap
      sb ++= decoded.getOrElse(v.substring(m.start, m.end))
      prevWasDecoded = decoded.isDefined
      last = m.end
    }
    sb ++= v.substring(last)
    sb.toString
  }

  private def isFieldName(s: String): Boolean =
    s.nonEmpty && s.forall(c => c > 0x20 && c < 0x7f && c != ':')

  /**
   * Parse the header section. None when any line before the blank
   * separator is neither a `Name: value` header nor a folded
   * continuation, or a continuation appears before any header. A
   * document with no blank line is all-headers (a headers-only dump is
   * legal). Values are unfolded (single SP per fold), surrounding
   * whitespace trimmed, then RFC 2047-decoded.
   */
  def parseHeaders(text: String): Option[IndexedSeq[Header]] = {
    if (text == null) return None
    val lines = text.split("\r\n|\n|\r", -1)
    val raw = scala.collection.mutable.ArrayBuffer.empty[(String, StringBuilder)]
    var i = 0
    var done = false
    while (!done && i < lines.length) {
      val line = lines(i)
      if (line.isEmpty) done = true // header/body separator
      else if (line.charAt(0) == ' ' || line.charAt(0) == '\t') {
        if (raw.isEmpty) return None // continuation before any header
        raw.last._2 ++= " " ++= line.trim
      } else {
        val colon = line.indexOf(':')
        if (colon <= 0) return None
        val name = line.substring(0, colon)
        if (!isFieldName(name)) return None
        raw += ((name, new StringBuilder(line.substring(colon + 1).trim)))
      }
      i += 1
    }
    Some(raw.iterator.map { case (n, v) =>
      Header(n, decodeValue(v.toString))
    }.toIndexedSeq)
  }

  /** Output schema of [[emailHeaders]]. */
  val headerSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("header_no", IntegerType),
    StructField("name", StringType),
    StructField("name_lc", StringType),
    StructField("value", StringType)))

  /** One row per header (file order); documents whose header section is
   * not clean RFC 5322 contribute nothing. Narrow mapPartitions. */
  def emailHeaders(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val tIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val doc = if (r.isNullAt(tIdx)) null else r.getString(tIdx)
        parseHeaders(doc) match {
          case Some(hs) => hs.iterator.zipWithIndex.map { case (h, i) =>
            Row(id, i, h.name, h.name.toLowerCase(java.util.Locale.ROOT),
              h.value)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(headerSchema))
  }

  /** Deterministic EML fixture shared by the writer, the t43 oracle and
   * the spec (CRLF line endings — the wire format):
   *
   *   - `From: sender<id%50>@ex<id%7>.example` always;
   *   - `To: rcpt<id%30>@ex<id%5>.example`;
   *   - `Subject:` — plain `subject_<id%100>` on `id%3 == 1`; a
   *     UTF-8 B-encoded word decoding to `sübject_<id%100>` on
   *     `id%3 == 0`; TWO adjacent Q-encoded words (`süb` + `ject_<id%100>`,
   *     folded onto a continuation line, whitespace between them
   *     dropped per §6.2) on `id%3 == 2`;
   *   - `X-Folded:` a value folded across two lines (unfolds to
   *     `alpha beta_<id%10>`) when `id%4 == 2`;
   *   - `Message-ID: <m<id>@ex.example>`;
   *   - `Date: Mon, <1 + id%28> Jan 2024 0<id%10>:00:00 +0000` (an
   *     opaque census string — no date parsing);
   *   - a blank line then a body the parse must NOT read (it contains a
   *     `Colonless body line` that would poison the header section).
   */
  def syntheticEml(id: Long): String = {
    def b64(s: String): String =
      java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
    def q(s: String): String = {
      val sb = new StringBuilder
      s.getBytes("UTF-8").foreach { b =>
        val c = (b & 0xff).toChar
        if (c == ' ') sb += '_'
        else if (c > 0x20 && c < 0x7f && c != '=' && c != '?' && c != '_')
          sb += c
        else sb ++= f"=${b & 0xff}%02X"
      }
      sb.toString
    }
    val sb = new StringBuilder
    sb ++= s"From: sender${id % 50}@ex${id % 7}.example\r\n"
    sb ++= s"To: rcpt${id % 30}@ex${id % 5}.example\r\n"
    (id % 3) match {
      case 1 => sb ++= s"Subject: subject_${id % 100}\r\n"
      case 0 =>
        sb ++= s"Subject: =?UTF-8?B?${b64(s"sübject_${id % 100}")}?=\r\n"
      case _ =>
        sb ++= s"Subject: =?utf-8?Q?${q("süb")}?=\r\n"
        sb ++= s"\t=?utf-8?Q?${q(s"ject_${id % 100}")}?=\r\n"
    }
    if (id % 4 == 2)
      sb ++= s"X-Folded: alpha\r\n beta_${id % 10}\r\n"
    sb ++= s"Message-ID: <m$id@ex.example>\r\n"
    sb ++= s"Date: Mon, ${1 + id % 28} Jan 2024 0${id % 10}:00:00 +0000\r\n"
    sb ++= "\r\n"
    sb ++= s"Body paragraph for $id.\r\n"
    sb ++= "Colonless body line that must never be parsed\r\n"
    sb.toString
  }

  /** Executor-side EML fixtures — the t43 oracle replays the header
   * formulas. */
  def syntheticEmls(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("eml_text", StringType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        Row(id, syntheticEml(id))
      }
    }(Encoders.row(schema))
  }
}
