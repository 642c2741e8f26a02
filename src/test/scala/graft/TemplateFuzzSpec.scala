package graft

import graft.sql.Template
import org.scalatest.funsuite.AnyFunSuite

/** Replays the generated jinja2 differential corpus: 600 seeded-random
 * templates (incl. macros, call blocks, namespaces) rendered by REAL jinja2 3.1.6 (strict undefined) at
 * generation time (`scripts/gen_template_fuzz.py`), checked here against
 * Template.render byte-for-byte. The corpus spans arithmetic, string
 * ops/filters, comparisons, in/is tests, and/or/not, conditionals,
 * if/for (with loop filters and loop.*), set, filter blocks, range(),
 * dict indexing, and the map/select/join filter family — regenerate with
 * the script after grammar-level template changes. */
class TemplateFuzzSpec extends AnyFunSuite {

  private val ctx: Map[String, Any] = Map(
    "n" -> 7L, "m" -> 3L, "z" -> 0L,
    "s" -> "Hello World", "t" -> "a-b c",
    "flag" -> true, "off" -> false,
    "xs" -> Seq(4L, 1L, 3L), "ys" -> Seq(10L, 20L),
    "ws" -> Seq("pear", "fig", "plum"),
    "d" -> Map("a" -> 1L, "b" -> 2L))

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
      val Array(te, oe) = line.split("\t", 2)
      val (tpl, want) = (dec(te), dec(oe))
      val got =
        try Template.render(tpl, ctx)
        catch { case e: Exception => s"<THREW: ${e.getMessage}>" }
      if (got != want)
        failures ::= s"template: $tpl\n  jinja2: ${want}\n  graft : ${got}"
    }
    assert(failures.isEmpty,
      s"${failures.size}/${lines.size} divergences:\n" +
        failures.take(5).mkString("\n---\n"))
  }
}
