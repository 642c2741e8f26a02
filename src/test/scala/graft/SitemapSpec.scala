package graft

import graft.functions.Sitemap
import org.scalatest.funsuite.AnyFunSuite

/** Sitemap census: the fixture against its closed record form, entity
 * decoding, extension-subtree skipping, and the strict grammar
 * boundary. */
class SitemapSpec extends AnyFunSuite {

  test("fixture parses to the closed record form (IDs 0-199)") {
    (0L until 200L).foreach { id =>
      val got = Sitemap.parseSitemap(Sitemap.syntheticSitemap(id))
      if (id % 11 == 9) {
        assert(got.isEmpty, s"id=$id unclosed root must be None")
      } else {
        val items = got.getOrElse(fail(s"id=$id did not parse"))
        if (id % 6 == 5) {
          val n = (2 + id % 3).toInt
          assert(items.size === n, s"id=$id")
          items.zipWithIndex.foreach { case (m, j) =>
            assert(m.kind === "sitemap")
            assert(m.loc === s"https://h${id % 20}.example/s$j.xml.gz")
            assert(m.lastmod === (if (j % 2 == 0)
              Some(s"2024-0${1 + id % 9}-1${j % 10}") else None))
            assert(m.changefreq.isEmpty && m.priority.isEmpty)
          }
        } else {
          val n = (1 + id % 5).toInt
          assert(items.size === n, s"id=$id")
          items.zipWithIndex.foreach { case (m, j) =>
            assert(m.kind === "url")
            val esc = if (id % 4 == 2) s"?a=1&b=$j" else ""
            assert(m.loc === s"https://site${id % 30}.example/p/$id/$j$esc",
              s"id=$id j=$j (decoded loc)")
            assert(m.lastmod === (if (id % 3 != 1)
              Some(s"2024-0${1 + j % 9}-0${1 + id % 9}") else None))
            assert(m.changefreq === (if (j % 2 == 0)
              Some(Seq("daily", "weekly", "monthly")(((id + j) % 3).toInt))
            else None))
            assert(m.priority === (if (j % 3 == 0)
              Some(s"0.${(id + j) % 10}") else None))
          }
        }
      }
    }
  }

  test("sitemap.xml.gz composition: gzip layer reassembles, both refusal layers hold") {
    (0L until 200L).foreach { id =>
      val gz = Sitemap.syntheticSitemapGz(id)
      val decoded = graft.functions.Gzip.inflateConcat(gz)
      if (id % 10 == 4) {
        assert(decoded.isEmpty, s"id=$id flipped ISIZE must refuse at the gzip layer")
      } else {
        // RFC 1952 reassembly must be byte-exact vs the XML fixture
        val raw = Sitemap.syntheticSitemap(id)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        assert(java.util.Arrays.equals(
          decoded.getOrElse(fail(s"id=$id gzip layer refused")), raw),
          s"id=$id reassembly")
        // member layout: two members split mid-document when id%5==0
        val nMembers = graft.functions.Gzip.parseMembers(gz).get.size
        assert(nMembers === (if (id % 5 == 0) 2 else 1), s"id=$id members")
        // the composed walk equals the plain walk on the decoded text
        val direct = Sitemap.parseSitemap(
          new String(decoded.get, java.nio.charset.StandardCharsets.UTF_8))
        if (id % 11 == 9) assert(direct.isEmpty,
          s"id=$id unclosed root must survive the gzip layer")
        else assert(direct === Sitemap.parseSitemap(Sitemap.syntheticSitemap(id)),
          s"id=$id")
      }
    }
    // the byte layer is STRICT UTF-8: a gzip of invalid UTF-8 refuses
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(Array[Byte]('<', 'u', 0xff.toByte, '>')); g.finish(); g.close()
    assert(Sitemap.decodeGzSitemap(bo.toByteArray).isEmpty)
    assert(Sitemap.decodeGzSitemap(null).isEmpty)
  }

  test("walk agrees with the JDK DOM parser on every clean fixture") {
    // a REAL XML stack reads the same records: loc/lastmod/changefreq/
    // priority extracted via DocumentBuilder must match the bounded
    // protocol walker field-for-field (entity decoding included)
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(false)
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    (0L until 120L).filter(_ % 11 != 9).foreach { id =>
      val text = Sitemap.syntheticSitemap(id)
      val mine = Sitemap.parseSitemap(text).getOrElse(fail(s"id=$id"))
      val doc = dbf.newDocumentBuilder().parse(
        new java.io.ByteArrayInputStream(text.getBytes("UTF-8")))
      val childTag = if (id % 6 == 5) "sitemap" else "url"
      val nodes = doc.getDocumentElement.getElementsByTagName(childTag)
      assert(mine.size === nodes.getLength, s"id=$id record count")
      (0 until nodes.getLength).foreach { i =>
        val el = nodes.item(i).asInstanceOf[org.w3c.dom.Element]
        def field(tag: String): Option[String] = {
          val ns = el.getElementsByTagName(tag)
          if (ns.getLength == 0) None
          else Some(ns.item(0).getTextContent.trim)
        }
        assert(Some(mine(i).loc) === field("loc"), s"id=$id i=$i loc")
        assert(mine(i).lastmod === field("lastmod"), s"id=$id i=$i lastmod")
        assert(mine(i).changefreq === field("changefreq"), s"id=$id i=$i")
        assert(mine(i).priority === field("priority"), s"id=$id i=$i")
      }
    }
  }

  test("entity decoding: named, decimal, hex; unknown refused") {
    def one(loc: String) = Sitemap.parseSitemap(
      s"<urlset><url><loc>$loc</loc></url></urlset>").map(_.head.loc)
    assert(one("a&amp;b&lt;c&gt;d&quot;e&apos;f") === Some("a&b<c>d\"e'f"))
    assert(one("x&#65;y&#x42;z") === Some("xAyBz"))
    assert(one("bad&nbsp;entity") === None)
    assert(one("dangling&amp") === None)
  }

  test("grammar boundary: the strict forms that must refuse") {
    // record without loc
    assert(Sitemap.parseSitemap(
      "<urlset><url><lastmod>2024-01-01</lastmod></url></urlset>") === None)
    // duplicate loc
    assert(Sitemap.parseSitemap(
      "<urlset><url><loc>a</loc><loc>b</loc></url></urlset>") === None)
    // wrong child element for the root
    assert(Sitemap.parseSitemap(
      "<urlset><sitemap><loc>a</loc></sitemap></urlset>") === None)
    // unknown root
    assert(Sitemap.parseSitemap("<rss><url/></rss>") === None)
    // nested markup inside a text element
    assert(Sitemap.parseSitemap(
      "<urlset><url><loc>a<b>c</b></loc></url></urlset>") === None)
    // CDATA and PIs past the prolog
    assert(Sitemap.parseSitemap(
      "<urlset><url><![CDATA[x]]><loc>a</loc></url></urlset>") === None)
    assert(Sitemap.parseSitemap(
      "<urlset><?pi x?><url><loc>a</loc></url></urlset>") === None)
    // trailing garbage after the root close
    assert(Sitemap.parseSitemap(
      "<urlset><url><loc>a</loc></url></urlset>junk") === None)
    // mis-nested close
    assert(Sitemap.parseSitemap(
      "<urlset><url><loc>a</loc></urlset></url>") === None)
    assert(Sitemap.parseSitemap(null) === None)
    assert(Sitemap.parseSitemap("") === None)
  }

  test("clean-but-empty and extension-skipping forms") {
    // empty roots: zero items, not corruption
    assert(Sitemap.parseSitemap("<urlset></urlset>") ===
      Some(IndexedSeq.empty))
    assert(Sitemap.parseSitemap("<urlset/>") === Some(IndexedSeq.empty))
    // a deep extension subtree is skipped; past the bound it refuses
    def nest(n: Int): String =
      if (n == 0) "<x>leaf</x>"
      else s"<e$n>${nest(n - 1)}</e$n>"
    def doc(inner: String) =
      s"<urlset><url>$inner<loc>a</loc></url></urlset>"
    assert(Sitemap.parseSitemap(doc(nest(10))).map(_.head.loc) === Some("a"))
    assert(Sitemap.parseSitemap(doc(nest(20))) === None)
    // attributes on extension tags, quoted '>' included
    assert(Sitemap.parseSitemap(doc(
      "<v:video attr=\"a>b\"><v:t>x</v:t></v:video>"))
      .map(_.head.loc) === Some("a"))
  }
}
