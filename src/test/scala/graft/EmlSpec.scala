package graft

import graft.functions.Eml
import org.scalatest.funsuite.AnyFunSuite

/** EML header extraction: the fixture against its closed form, RFC 2047
 * decoding corners (B/Q, adjacent-word joining, undecodable-verbatim),
 * folding, and the strict header-section contract. */
class EmlSpec extends AnyFunSuite {

  test("fixture parses to the closed header form (IDs 0-59)") {
    (0L until 60L).foreach { id =>
      val hs = Eml.parseHeaders(Eml.syntheticEml(id))
        .getOrElse(fail(s"id=$id did not parse"))
      var i = 0
      assert(hs(i) === Eml.Header("From",
        s"sender${id % 50}@ex${id % 7}.example")); i += 1
      assert(hs(i) === Eml.Header("To",
        s"rcpt${id % 30}@ex${id % 5}.example")); i += 1
      val subj =
        if (id % 3 == 1) s"subject_${id % 100}" else s"sübject_${id % 100}"
      assert(hs(i) === Eml.Header("Subject", subj), s"id=$id"); i += 1
      if (id % 4 == 2) {
        assert(hs(i) === Eml.Header("X-Folded", s"alpha beta_${id % 10}"))
        i += 1
      }
      assert(hs(i) === Eml.Header("Message-ID", s"<m$id@ex.example>")); i += 1
      assert(hs(i) === Eml.Header("Date",
        s"Mon, ${1 + id % 28} Jan 2024 0${id % 10}:00:00 +0000")); i += 1
      assert(hs.size === i, s"id=$id — body lines must never be read")
    }
  }

  test("RFC 2047 corners: joining, mixed charsets, verbatim fallback") {
    // adjacent encoded words joined without whitespace; text between an
    // encoded word and PLAIN text keeps its space
    assert(Eml.decodeValue("=?utf-8?B?YQ==?= =?utf-8?B?Yg==?=") === "ab")
    assert(Eml.decodeValue("=?utf-8?B?YQ==?= plain") === "a plain")
    assert(Eml.decodeValue("plain =?utf-8?Q?x_y?=") === "plain x y")
    // latin-1 B-word
    assert(Eml.decodeValue("=?ISO-8859-1?B?" +
      java.util.Base64.getEncoder.encodeToString(
        "café".getBytes("ISO-8859-1")) + "?=") === "café")
    // unknown charset: verbatim, not mojibake
    val unk = "=?x-nope?B?YQ==?="
    assert(Eml.decodeValue(unk) === unk)
    // bad base64: verbatim
    val bad = "=?utf-8?B?!!!?="
    assert(Eml.decodeValue(bad) === bad)
    // bytes invalid in the declared charset: verbatim
    val badUtf = "=?utf-8?Q?=FF?="
    assert(Eml.decodeValue(badUtf) === badUtf)
    // undecodable word between two decodable ones: the whitespace
    // around it survives (only decoded-to-decoded gaps collapse — a
    // verbatim token jammed against decoded text would be misleading)
    assert(Eml.decodeValue(s"=?utf-8?B?YQ==?= $unk =?utf-8?B?Yg==?=")
      === s"a $unk b")
  }

  test("strict header-section contract") {
    // a colonless line inside the header section poisons
    assert(Eml.parseHeaders("From: a@b\r\nnot a header\r\n\r\nbody").isEmpty)
    // continuation before any header poisons
    assert(Eml.parseHeaders(" folded\r\nFrom: a@b\r\n").isEmpty)
    // empty name poisons
    assert(Eml.parseHeaders(": v\r\n").isEmpty)
    // non-ASCII in a field name poisons
    assert(Eml.parseHeaders("Fröm: v\r\n\r\n").isEmpty)
    // headers-only document (no blank line) is legal
    val hs = Eml.parseHeaders("A: 1\nB: 2").get
    assert(hs === IndexedSeq(Eml.Header("A", "1"), Eml.Header("B", "2")))
    // LF-only and multi-space folding
    val f = Eml.parseHeaders("A: x\n   y\n\nbody: not : parsed").get
    assert(f === IndexedSeq(Eml.Header("A", "x y")))
    assert(Eml.parseHeaders(null).isEmpty)
  }
}
