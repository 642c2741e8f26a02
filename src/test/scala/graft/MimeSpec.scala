package graft

import graft.functions.Mime
import org.scalatest.funsuite.AnyFunSuite

/** MIME multipart body census: the fixture against its closed part
 * form, size-accounting differentials against real encoders
 * (java.util.Base64, an independent canonical QP encoder), boundary
 * grammar corners (RFC 2046 §5.1.1) and the depth bound. */
class MimeSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260816L)

  test("fixture parses to the closed leaf form (IDs 0-199)") {
    (0L until 200L).foreach { id =>
      val got = Mime.parseParts(Mime.syntheticMime(id))
      if (id % 13 == 7) {
        assert(got.isEmpty, s"id=$id malformed boundary must be None")
      } else {
        val ps = got.getOrElse(fail(s"id=$id did not parse"))
        val dk = (id % 100).toString.length
        val want = scala.collection.mutable.ArrayBuffer.empty[Mime.Part]
        if (id % 7 == 3) {
          val (enc, sz) = (id % 3) match {
            case 0 => ("7bit", 7L + dk + id % 30)
            case 1 => ("quoted-printable", 8L + dk + id % 5)
            case _ => ("base64", 15L + id % 40)
          }
          want += Mime.Part(0, "text/plain", Some("utf-8"), enc, sz)
        } else {
          want += Mime.Part(1, "text/plain", Some("us-ascii"), "7bit",
            3L + dk + id % 40)
          want += Mime.Part(1, "application/octet-stream", None,
            "base64", 20L + id % 50)
          if (id % 4 == 1)
            want += Mime.Part(1, "text/html", Some("iso-8859-1"),
              "quoted-printable", 3L + dk + id % 7)
          if (id % 5 == 2) {
            want += Mime.Part(2, "text/plain", None, "7bit", 3L + dk)
            want += Mime.Part(2, "text/html", Some("utf-8"), "7bit",
              10L + dk)
          }
        }
        assert(ps === want.toIndexedSeq, s"id=$id")
      }
    }
  }

  test("base64 size accounting differential vs java.util.Base64") {
    (0 until 200).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      val basic = java.util.Base64.getEncoder.encodeToString(bytes)
      val mime = new String(java.util.Base64.getMimeEncoder(
        76, "\r\n".getBytes("US-ASCII")).encode(bytes), "US-ASCII")
      assert(Mime.base64Size(basic) === Some(bytes.length.toLong))
      assert(Mime.base64Size(mime) === Some(bytes.length.toLong))
    }
    // violations: alphabet, data after padding, length % 4, triple pad
    assert(Mime.base64Size("QUJD!") === None)
    assert(Mime.base64Size("QQ==QQ==") === None)
    assert(Mime.base64Size("QQ40Q") === None)
    assert(Mime.base64Size("Q===") === None)
    assert(Mime.base64Size("") === Some(0L))
  }

  test("quoted-printable size accounting vs an independent encoder") {
    // canonical encoder: printable ASCII except '=' stays literal,
    // everything else (incl. CR/LF individually) escapes to =XX; soft
    // breaks every ~60 output chars. Decoded size == original length.
    def qpEncode(bytes: Array[Byte]): String = {
      val sb = new StringBuilder
      var lineLen = 0
      bytes.foreach { b =>
        val u = b & 0xff
        val tok =
          if (u != '=' && u >= 0x20 && u < 0x7f) (u.toChar).toString
          else f"=${u}%02X"
        if (lineLen + tok.length > 60) { sb ++= "=\r\n"; lineLen = 0 }
        sb ++= tok; lineLen += tok.length
      }
      sb.toString
    }
    (0 until 200).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      assert(Mime.qpSize(qpEncode(bytes)) === Some(bytes.length.toLong))
    }
    // hard break counts CRLF; LF-only soft break; trailing '=' at EOF
    assert(Mime.qpSize("ab\r\ncd") === Some(6L))
    assert(Mime.qpSize("ab=\ncd") === Some(4L))
    assert(Mime.qpSize("ab=") === Some(2L))
    // malformed escape, non-ASCII literal
    assert(Mime.qpSize("ab=4") === None)
    assert(Mime.qpSize("ab=zz") === None)
    assert(Mime.qpSize("café") === None)
  }

  test("boundary grammar corners (RFC 2046 §5.1.1)") {
    def mp(body: String, bnd: String = "XX") =
      Mime.parseParts(
        s"Content-Type: multipart/mixed; boundary=$bnd\r\n\r\n" + body)
    // transport padding (trailing SP/HT) on delimiter lines is legal
    val padded = "--XX  \t\r\nContent-Type: text/plain\r\n\r\nhi\r\n--XX--  "
    assert(mp(padded) ===
      Some(IndexedSeq(Mime.Part(1, "text/plain", None, "7bit", 2L))))
    // preamble and epilogue are ignored
    assert(mp("junk preamble\r\n--XX\r\n\r\nhi\r\n--XX--\r\ntrailing junk")
      === Some(IndexedSeq(Mime.Part(1, "text/plain", None, "7bit", 2L))))
    // a boundary that PREFIXES another must not match its lines
    val pfx = "--B1\r\n\r\nline\r\n--B12\r\nnot a delimiter\r\n--B1--"
    assert(mp(pfx, "B1") === Some(IndexedSeq(Mime.Part(1, "text/plain",
      None, "7bit", ("line\r\n--B12\r\nnot a delimiter").length.toLong))))
    // missing close delimiter, delimiter after close, zero parts
    assert(mp("--XX\r\n\r\nhi") === None)
    assert(mp("--XX\r\n\r\nhi\r\n--XX--\r\n--XX\r\n\r\nagain\r\n--XX--")
      === None)
    assert(mp("--XX--") === None)
    // declared multipart but the boundary never appears
    assert(mp("no delimiters at all") === None)
    // boundary param missing or empty
    assert(Mime.parseParts(
      "Content-Type: multipart/mixed\r\n\r\n--X\r\n\r\nhi\r\n--X--")
      === None)
    // quoted boundary with specials; bare stops at ';'
    assert(Mime.parseParts(
      "Content-Type: multipart/mixed; boundary=\"a b\"\r\n\r\n" +
        "--a b\r\n\r\nhi\r\n--a b--")
      === Some(IndexedSeq(Mime.Part(1, "text/plain", None, "7bit", 2L))))
    assert(Mime.param("; boundary=zz; charset=utf-8", "boundary")
      === Some("zz"))
  }

  test("entity defaults and degenerate shapes") {
    // no Content-Type header → text/plain (RFC 2045 §5.2), no charset
    assert(Mime.parseParts("X-Other: v\r\n\r\nbody")
      === Some(IndexedSeq(Mime.Part(0, "text/plain", None, "7bit", 4L))))
    // entity with no blank line: all-headers, empty body
    assert(Mime.parseParts("X-Other: v")
      === Some(IndexedSeq(Mime.Part(0, "text/plain", None, "7bit", 0L))))
    // entity opening with a blank line: headerless
    assert(Mime.parseParts("\r\njust body")
      === Some(IndexedSeq(Mime.Part(0, "text/plain", None, "7bit", 9L))))
    // unparsable header section poisons the document
    assert(Mime.parseParts("not a header line\r\n\r\nbody") === None)
    // a bad base64 stream poisons the document
    assert(Mime.parseParts(
      "Content-Transfer-Encoding: base64\r\n\r\n!!!!") === None)
    // identity size counts UTF-8 bytes, not chars
    assert(Mime.parseParts("\r\ncafé")
      === Some(IndexedSeq(Mime.Part(0, "text/plain", None, "7bit", 5L))))
    assert(Mime.parseParts(null) === None)
  }

  test("nesting depth is bounded at 8") {
    def nest(n: Int): String =
      if (n == 0) "Content-Type: text/plain\r\n\r\nleaf"
      else s"Content-Type: multipart/mixed; boundary=b$n\r\n\r\n" +
        s"--b$n\r\n" + nest(n - 1) + s"\r\n--b$n--"
    // leaf lands at depth == number of multipart wrappers
    assert(Mime.parseParts(nest(8)) ===
      Some(IndexedSeq(Mime.Part(8, "text/plain", None, "7bit", 4L))))
    assert(Mime.parseParts(nest(9)) === None)
  }
}
