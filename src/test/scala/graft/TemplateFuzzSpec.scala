package graft

import graft.sql.Template
import org.scalatest.funsuite.AnyFunSuite

/** Replays the generated jinja2 differential corpus: 600 seeded-random
 * templates (incl. macros, call blocks, namespaces, the
 * sort/unique/min/max option surface over mixed-case lists) rendered by
 * REAL jinja2 3.1.6 (strict undefined) at generation time
 * (`scripts/gen_template_fuzz.py`), checked here against Template.render
 * byte-for-byte. Each case carries its OWN randomized context (column 2,
 * JSON) so value-dependent paths — case-folded duplicates, boundary
 * ints, duplicate list elements — vary across the corpus instead of
 * replaying one frozen snapshot. Regenerate with the script after
 * grammar-level template changes. */
class TemplateFuzzSpec extends AnyFunSuite {

  /** Minimal JSON decoder for the generator's restricted output: objects,
   * arrays, ASCII strings without escapes, integer numbers, booleans.
   * Ints decode to Long, matching how Template contexts carry numbers. */
  private def parseJson(s: String): Any = {
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def value(): Any = {
      ws()
      s.charAt(i) match {
        case '{' =>
          i += 1; ws()
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
          if (s.charAt(i) == '}') { i += 1 }
          else {
            var done = false
            while (!done) {
              ws()
              val k = value().asInstanceOf[String]
              ws(); require(s.charAt(i) == ':', s"expected ':' at $i"); i += 1
              m(k) = value()
              ws()
              if (s.charAt(i) == ',') i += 1
              else { require(s.charAt(i) == '}', s"expected '}}' at $i")
                i += 1; done = true }
            }
          }
          m.toMap
        case '[' =>
          i += 1; ws()
          val b = Seq.newBuilder[Any]
          if (s.charAt(i) == ']') { i += 1 }
          else {
            var done = false
            while (!done) {
              b += value(); ws()
              if (s.charAt(i) == ',') i += 1
              else { require(s.charAt(i) == ']', s"expected ']' at $i")
                i += 1; done = true }
            }
          }
          b.result()
        case '"' =>
          val end = s.indexOf('"', i + 1)
          require(end > 0 && !s.substring(i + 1, end).contains('\\'),
            "generator strings are escape-free by construction")
          val v = s.substring(i + 1, end); i = end + 1; v
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case c if c == '-' || c.isDigit =>
          val start = i
          if (c == '-') i += 1
          while (i < s.length && s.charAt(i).isDigit) i += 1
          var isFloat = false
          if (i < s.length && s.charAt(i) == '.') {
            isFloat = true; i += 1
            while (i < s.length && s.charAt(i).isDigit) i += 1
          }
          if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
            isFloat = true; i += 1
            if (s.charAt(i) == '-' || s.charAt(i) == '+') i += 1
            while (i < s.length && s.charAt(i).isDigit) i += 1
          }
          // python repr floats are shortest-round-trip: toDouble is exact
          if (isFloat) s.substring(start, i).toDouble
          else s.substring(start, i).toLong
        case other => fail(s"unexpected JSON char '$other' at $i")
      }
    }
    val v = value(); ws()
    require(i == s.length, s"trailing JSON at $i")
    v
  }

  test("600-case generated jinja2 3.1.6 corpus renders identically") {
    val in = getClass.getResourceAsStream("/template_fuzz.tsv")
    assert(in != null, "template_fuzz.tsv missing from test resources")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filterNot(_.startsWith("#")).toSeq
    assert(lines.size >= 300, s"corpus suspiciously small: ${lines.size}")
    def dec(s: String): String =
      java.net.URLDecoder.decode(s, "UTF-8")
    var failures = List.empty[String]
    lines.foreach { line =>
      val Array(te, ce, oe) = line.split("\t", 3)
      val (tpl, want) = (dec(te), dec(oe))
      val ctx = parseJson(dec(ce)).asInstanceOf[Map[String, Any]]
      val got =
        try Template.render(tpl, ctx)
        catch { case e: Exception => s"<THREW: ${e.getMessage}>" }
      if (got != want)
        failures ::= s"template: $tpl\n  ctx   : ${dec(ce)}\n" +
          s"  jinja2: ${want}\n  graft : ${got}"
    }
    assert(failures.isEmpty,
      s"${failures.size}/${lines.size} divergences:\n" +
        failures.take(5).mkString("\n---\n"))
  }
}
