package graft

import graft.functions.Csv
import org.scalatest.funsuite.AnyFunSuite

/** CSV dialect sniff: the fixture against its closed dialect form,
 * RFC 4180 quoting corners, and the deterministic scoring rules. */
class CsvSpec extends AnyFunSuite {

  test("fixture sniffs to the closed dialect form (IDs 0-299)") {
    (0L until 300L).foreach { id =>
      val got = Csv.sniff(Csv.syntheticCsv(id))
      if (id % 13 == 11) {
        assert(got.isEmpty, s"id=$id unterminated quote must refuse")
      } else if (id % 11 == 10) {
        assert(got === Some(Csv.Dialect("none", quoted = false,
          hasHeader = false, 1, 2 + id % 3, consistent = true,
          newline = if (id % 2 == 0) "crlf" else "lf")), s"id=$id")
      } else {
        val delim = Seq(",", ";", "tab", "|")((id % 4).toInt)
        val nRows = if (id % 7 == 2) Csv.SniffLines + 3 else (3 + id % 6)
        val want = Csv.Dialect(delim,
          quoted = id % 3 == 0,
          hasHeader = id % 5 != 1,
          (2 + id % 4).toInt,
          nRows + (if (id % 5 != 1) 1 else 0),
          consistent = id % 7 != 2,
          newline = if (id % 2 == 0) "crlf" else "lf")
        assert(got === Some(want), s"id=$id")
      }
    }
  }

  test("byte-level sniff: BOM/charset detection composes with the dialect walk") {
    (0L until 300L).foreach { id =>
      val got = Csv.sniffBytes(Csv.syntheticCsvBytes(id))
      if (id % 13 == 11) assert(got.isEmpty, s"id=$id")
      else {
        val (cs, d) = got.getOrElse(fail(s"id=$id refused"))
        assert(cs === Seq("ascii", "utf-8-bom", "utf-16le", "utf-16be")(
          (id % 4).toInt), s"id=$id charset")
        // the dialect through every charset equals the string sniff
        assert(Some(d) === Csv.sniff(Csv.syntheticCsv(id)), s"id=$id dialect")
      }
    }
    // BOM-less multibyte UTF-8 is utf-8, not ascii
    val utf8 = "hé,b\n1,2".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    assert(Csv.sniffBytes(utf8).map(_._1) === Some("utf-8"))
    // undecodable bytes refuse: a lone 0xFF continuation is not UTF-8
    assert(Csv.sniffBytes(Array[Byte](0x41, 0xff.toByte, 0x42)) === None)
    // truncated UTF-16 (odd byte count after the BOM) refuses
    assert(Csv.sniffBytes(Array[Byte](0xff.toByte, 0xfe.toByte, 0x41)) === None)
    // mixed separators report as mixed; CR-only reports as cr
    assert(Csv.sniff("a,b\r\nc,d\ne,f").map(_.newline) === Some("mixed"))
    assert(Csv.sniff("a,b\rc,d").map(_.newline) === Some("cr"))
    assert(Csv.sniff("a,b").map(_.newline) === Some("none"))
    // a quoted embedded newline does NOT count toward the convention
    assert(Csv.sniff("a,\"x\ny\"\r\nc,d").map(_.newline) === Some("crlf"))
  }

  test("RFC 4180 quoting corners") {
    // delimiter and newline inside quotes are literal; "" escapes
    val (recs, saw) = Csv.parseRecords(
      "a,\"b,c\nd\"\"e\",f\r\ng,h,i", ',')
    assert(saw)
    assert(recs === IndexedSeq(
      IndexedSeq("a", "b,c\nd\"e", "f"),
      IndexedSeq("g", "h", "i")))
    // a quoted record-spanning newline keeps the record whole in the
    // sniff sample too
    val doc = "x,\"line1\nline2\"\ny,z"
    assert(Csv.sniff(doc).map(_.nCols) === Some(2))
    assert(Csv.sniff(doc).map(_.nRecords) === Some(2L))
    // unrecoverable forms
    assert(Csv.sniff("a,\"unterminated") === None)
    assert(Csv.sniff("a,b\"c,d") === None) // quote opening mid-field
    assert(Csv.sniff("a,\"b\"junk,c") === None) // junk after close quote
    assert(Csv.sniff(null) === None)
    // empty and headerless numeric forms
    assert(Csv.sniff("").map(_.nRecords) === Some(0L))
    assert(Csv.sniff("1,2\n3,4").map(_.hasHeader) === Some(false))
    assert(Csv.sniff("a,b\n1,2").map(_.hasHeader) === Some(true))
    // all-text documents never claim a header
    assert(Csv.sniff("a,b\nc,d").map(_.hasHeader) === Some(false))
  }

  test("quote-aware parse agrees with univocity (Spark's CSV engine)") {
    // randomized grids WRITTEN by univocity's own writer (a real
    // encoder choosing its own quoting), read back by Csv.parseRecords
    val rnd = new scala.util.Random(20260816L)
    (0 until 120).foreach { trial =>
      val rows = 1 + rnd.nextInt(6)
      val cols = 1 + rnd.nextInt(5)
      val grid = IndexedSeq.tabulate(rows, cols) { (r, c) =>
        val base = s"v${trial}_${r}_$c"
        rnd.nextInt(6) match {
          case 0 => base + ",embedded"
          case 1 => base + "\"quote"
          case 2 => base + "\r\nnewline" // the writer normalizes EOLs
          case 3 => ""
          case _ => base
        }
      }
      val sw = new java.io.StringWriter()
      val ws = new com.univocity.parsers.csv.CsvWriterSettings()
      ws.getFormat.setLineSeparator("\r\n")
      // quote-all keeps the writer inside RFC 4180 — univocity's
      // unquoted mode emits BARE mid-field quotes, the exact form the
      // walker's strict posture refuses by documented design (pinned
      // in the corners test above)
      ws.setQuoteAllFields(true)
      // pass values through verbatim — univocity otherwise rewrites
      // EOLs inside quoted values to its normalized form
      ws.setNormalizeLineEndingsWithinQuotes(false)
      val w = new com.univocity.parsers.csv.CsvWriter(sw, ws)
      grid.foreach(r => w.writeRow(r.toArray: _*))
      w.close()
      val text = sw.toString
      val (mine, _) = Csv.parseRecords(text, ',')
      // univocity renders null/empty the same way; compare non-empty
      // cells exactly and shapes always
      assert(mine.size === rows, s"trial=$trial rows\n$text")
      (0 until rows).foreach { r =>
        assert(mine(r).size === cols, s"trial=$trial row=$r\n$text")
        (0 until cols).foreach { c =>
          if (grid(r)(c).nonEmpty)
            assert(mine(r)(c) === grid(r)(c), s"trial=$trial ($r,$c)\n$text")
        }
      }
    }
  }

  test("deterministic scoring: highest consistent field count wins") {
    // ';' splits every line into 3, ',' into 2 — ';' must win
    val doc = "a,x;b;c\nd,y;e;f\ng,z;h;i"
    assert(Csv.sniff(doc).map(d => (d.delimiter, d.nCols))
      === Some((";", 3)))
    // candidate order breaks exact ties: ',' before ';'
    val tie = "a,b;c\nd,e;f"
    val got = Csv.sniff(tie).get
    assert(got.delimiter === ",")
    assert(got.nCols === 2)
  }
}
