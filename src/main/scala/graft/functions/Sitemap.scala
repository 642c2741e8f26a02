package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * Sitemap census (sitemaps.org protocol 0.9) — the discovery half of
 * the crawl-politeness pair ([[Robots]] is the permission half; a
 * robots.txt's global `Sitemap:` lines point here). One row per
 * `<url>` (urlset files) or `<sitemap>` (sitemapindex files) with the
 * XML-unescaped `loc` and the optional lastmod / changefreq /
 * priority, so a crawl scheduler can join freshness and priority
 * against its frontier without a generic XML stack.
 *
 * The grammar is the protocol's, not general XML: an optional
 * `<?xml?>` prolog, comments, a single `urlset` or `sitemapindex`
 * root (attributes ignored), whose children are `url`/`sitemap`
 * records holding simple text elements. Entity escapes `&amp; &lt;
 * &gt; &quot; &apos;` and numeric `&#NNN;`/`&#xHH;` decode in text.
 * Extension subtrees (e.g. `image:image`) are SKIPPED with a balanced
 * scan, depth-bounded at 16.
 *
 * Strict posture: a missing/duplicate `loc`, an unclosed or
 * mis-nested tag, CDATA or processing instructions past the prolog,
 * a record outside its proper root, depth overflow, or an unknown
 * entity → None for the whole document.
 *
 * Narrow mapPartitions — zero exchanges.
 */
object Sitemap {

  /** One sitemap record, document order. `kind` is `url` or `sitemap`. */
  final case class Item(kind: String, loc: String,
      lastmod: Option[String], changefreq: Option[String],
      priority: Option[String])

  private val MaxDepth = 16

  private final class Malformed extends RuntimeException

  private final class S(val s: String) {
    var pos = 0
    def done: Boolean = pos >= s.length
    def ws(): Unit = {
      while (!done && (s.charAt(pos) == ' ' || s.charAt(pos) == '\t' ||
        s.charAt(pos) == '\r' || s.charAt(pos) == '\n')) pos += 1
    }
    /** Consume comments (and nothing else) until real content. */
    def gaps(): Unit = {
      ws()
      while (s.startsWith("<!--", pos)) {
        val e = s.indexOf("-->", pos + 4)
        if (e < 0) throw new Malformed
        pos = e + 3
        ws()
      }
    }
    def expect(lit: String): Unit = {
      if (!s.startsWith(lit, pos)) throw new Malformed
      pos += lit.length
    }
  }

  private def decodeEntities(t: String): String = {
    if (t.indexOf('&') < 0) return t
    val sb = new StringBuilder(t.length)
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c != '&') { sb += c; i += 1 }
      else {
        val semi = t.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 12) throw new Malformed
        val name = t.substring(i + 1, semi)
        name match {
          case "amp" => sb += '&'
          case "lt" => sb += '<'
          case "gt" => sb += '>'
          case "quot" => sb += '"'
          case "apos" => sb += '\''
          case _ if name.startsWith("#x") || name.startsWith("#X") =>
            val cp = Integer.parseInt(name.substring(2), 16)
            if (!Character.isValidCodePoint(cp)) throw new Malformed
            sb.appendAll(Character.toChars(cp))
          case _ if name.startsWith("#") =>
            val cp = Integer.parseInt(name.substring(1))
            if (!Character.isValidCodePoint(cp)) throw new Malformed
            sb.appendAll(Character.toChars(cp))
          case _ => throw new Malformed // unknown named entity
        }
        i = semi + 1
      }
    }
    sb.toString
  }

  /** Read `<name ...>`'s name starting after `<`. */
  private def tagName(c: S): String = {
    val start = c.pos
    while (!c.done) {
      val ch = c.s.charAt(c.pos)
      if (ch == '>' || ch == '/' || ch == ' ' || ch == '\t' ||
        ch == '\r' || ch == '\n') {
        if (c.pos == start) throw new Malformed
        return c.s.substring(start, c.pos)
      }
      c.pos += 1
    }
    throw new Malformed
  }

  /** After the name: skip attributes; returns true if self-closing. */
  private def finishOpenTag(c: S): Boolean = {
    var inQuote = 0.toChar
    while (!c.done) {
      val ch = c.s.charAt(c.pos)
      c.pos += 1
      if (inQuote != 0) { if (ch == inQuote) inQuote = 0 }
      else if (ch == '"' || ch == '\'') inQuote = ch
      else if (ch == '>') return false
      else if (ch == '/' && !c.done && c.s.charAt(c.pos) == '>') {
        c.pos += 1; return true
      }
    }
    throw new Malformed
  }

  /** Skip one balanced element whose open tag (incl. name) is already
   * consumed and was not self-closing. */
  private def skipBalanced(c: S, name: String, depth: Int): Unit = {
    if (depth > MaxDepth) throw new Malformed
    var open = 1
    while (open > 0) {
      val lt = c.s.indexOf('<', c.pos)
      if (lt < 0) throw new Malformed
      c.pos = lt + 1
      if (c.s.startsWith("!--", c.pos)) {
        val e = c.s.indexOf("-->", c.pos + 3)
        if (e < 0) throw new Malformed
        c.pos = e + 3
      } else if (c.s.startsWith("/", c.pos)) {
        c.pos += 1
        tagName(c): Unit
        c.ws()
        c.expect(">")
        open -= 1
      } else if (c.s.startsWith("![", c.pos) || c.s.startsWith("?", c.pos)) {
        throw new Malformed // CDATA / PI inside records: refused
      } else {
        tagName(c): Unit
        if (!finishOpenTag(c)) open += 1
        if (open > MaxDepth) throw new Malformed
      }
    }
  }

  /** Read a simple text element's body up to `</name>` and decode it. */
  private def textElement(c: S, name: String): String = {
    val close = s"</$name"
    val e = c.s.indexOf(close, c.pos)
    if (e < 0) throw new Malformed
    val raw = c.s.substring(c.pos, e)
    if (raw.indexOf('<') >= 0) throw new Malformed // nested markup
    c.pos = e + close.length
    c.ws()
    c.expect(">")
    decodeEntities(raw.trim)
  }

  /**
   * Parse one sitemap document. None on malformation as documented on
   * the object. An empty urlset/sitemapindex yields zero items (clean,
   * not corrupt).
   */
  def parseSitemap(text: String): Option[IndexedSeq[Item]] = {
    if (text == null) return None
    try {
      val c = new S(text)
      c.gaps()
      if (c.s.startsWith("<?xml", c.pos)) { // prolog
        val e = c.s.indexOf("?>", c.pos + 5)
        if (e < 0) throw new Malformed
        c.pos = e + 2
        c.gaps()
      }
      c.expect("<")
      val root = tagName(c)
      val childName = root match {
        case "urlset" => "url"
        case "sitemapindex" => "sitemap"
        case _ => throw new Malformed
      }
      if (finishOpenTag(c)) { // self-closing root: empty, clean
        c.gaps()
        if (!c.done) throw new Malformed
        return Some(IndexedSeq.empty)
      }
      val kind = childName
      val out = scala.collection.mutable.ArrayBuffer.empty[Item]
      var closed = false
      while (!closed) {
        c.gaps()
        c.expect("<")
        if (c.s.startsWith("/", c.pos)) {
          c.pos += 1
          if (tagName(c) != root) throw new Malformed
          c.ws()
          c.expect(">")
          closed = true
        } else {
          if (tagName(c) != childName) throw new Malformed
          if (finishOpenTag(c)) throw new Malformed // <url/> has no loc
          var loc: Option[String] = None
          var lastmod: Option[String] = None
          var changefreq: Option[String] = None
          var priority: Option[String] = None
          var recClosed = false
          while (!recClosed) {
            c.gaps()
            c.expect("<")
            if (c.s.startsWith("/", c.pos)) {
              c.pos += 1
              if (tagName(c) != childName) throw new Malformed
              c.ws()
              c.expect(">")
              recClosed = true
            } else {
              val el = tagName(c)
              val selfClosing = finishOpenTag(c)
              el match {
                case "loc" | "lastmod" | "changefreq" | "priority" =>
                  if (selfClosing) throw new Malformed
                  val v = textElement(c, el)
                  el match {
                    case "loc" =>
                      if (loc.isDefined) throw new Malformed // duplicate
                      loc = Some(v)
                    case "lastmod" => lastmod = Some(v)
                    case "changefreq" => changefreq = Some(v)
                    case _ => priority = Some(v)
                  }
                case _ => // extension subtree: balanced skip
                  if (!selfClosing) skipBalanced(c, el, 1)
              }
            }
          }
          out += Item(kind,
            loc.getOrElse(throw new Malformed), // loc is REQUIRED
            lastmod, changefreq, priority)
        }
      }
      c.gaps()
      if (!c.done) throw new Malformed // trailing garbage
      Some(out.toIndexedSeq)
    } catch {
      case _: Malformed => None
      case _: NumberFormatException => None // bad numeric entity
      case _: IndexOutOfBoundsException => None // belt and braces
    }
  }

  /** Output schema of [[sitemapItems]]. */
  val itemSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("item_no", IntegerType),
    StructField("kind", StringType),
    StructField("loc", StringType),
    StructField("lastmod", StringType),
    StructField("changefreq", StringType),
    StructField("priority", StringType)))

  /** One row per sitemap record (document order); documents that are
   * not clean sitemaps contribute nothing. Narrow mapPartitions. */
  def sitemapItems(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val tIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val doc = if (r.isNullAt(tIdx)) null else r.getString(tIdx)
        parseSitemap(doc) match {
          case Some(items) => items.iterator.zipWithIndex.map {
            case (m, i) => Row(id, i, m.kind, m.loc, m.lastmod.orNull,
              m.changefreq.orNull, m.priority.orNull)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(itemSchema))
  }

  /** One row per sitemap record of each `sitemap.xml.gz` payload — the
   * [[sitemapItems]] walk composed over the verified gzip member
   * locator path ([[Gzip.inflateConcat]]), then UTF-8 decoded. The
   * sitemaps.org protocol explicitly allows gzip-compressed sitemaps
   * (and sitemapindex `loc`s routinely point at `.xml.gz` URLs — this
   * fixture family's own index records do), so the compressed
   * composition is first-class like `.tar.gz`/`.tfrecord.gz`. Payloads
   * whose gzip layer OR sitemap grammar refuses contribute nothing.
   * Narrow mapPartitions. */
  def sitemapGzItems(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        decodeGzSitemap(r.getAs[Array[Byte]](pIdx))
          .flatMap(parseSitemap) match {
          case Some(items) => items.iterator.zipWithIndex.map {
            case (m, i) => Row(id, i, m.kind, m.loc, m.lastmod.orNull,
              m.changefreq.orNull, m.priority.orNull)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(itemSchema))
  }

  /** Deterministic sitemap fixture shared by the writer, the t46
   * oracle and the spec. `id%11 == 9` documents are the MALFORMED
   * negative (the root never closes → None, zero rows). `id%6 == 5`
   * documents are sitemapindex files with `2 + id%3` `<sitemap>`
   * records (loc `https://h<id%20>.example/s<j>.xml.gz`, lastmod
   * `2024-0<1+id%9>-1<j%10>` on even j). All others are urlset files
   * with `1 + id%5` `<url>` records:
   *
   *   - loc `https://site<id%30>.example/p/<id>/<j>`, with `?a=1&b=<j>`
   *     appended XML-ESCAPED (`&amp;`) when `id%4 == 2` — the census
   *     must emit the DECODED form;
   *   - lastmod `2024-0<1+j%9>-0<1+id%9>` unless `id%3 == 1`;
   *   - changefreq rotating daily/weekly/monthly on `j%2 == 0`;
   *   - priority `0.<(id+j)%10>` on `j%3 == 0`;
   *   - an `<image:image>` extension subtree (skipped, depth 2) inside
   *     record 0 when `id%7 == 3`, and a self-closed
   *     `<mobile:mobile/>` in record 0 when `id%7 == 5`;
   *   - a comment between records when `id%3 == 0`; an xml prolog on
   *     even ids; LF line endings. */
  def syntheticSitemap(id: Long): String = {
    val sb = new StringBuilder
    if (id % 2 == 0) sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    if (id % 11 == 9) { // malformed: root never closes
      sb ++= "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"
      sb ++= s"<url><loc>https://broken${id % 9}.example/</loc></url>\n"
      return sb.toString
    }
    if (id % 6 == 5) {
      sb ++= "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"
      val n = (2 + id % 3).toInt
      (0 until n).foreach { j =>
        sb ++= " <sitemap>\n"
        sb ++= s"  <loc>https://h${id % 20}.example/s$j.xml.gz</loc>\n"
        if (j % 2 == 0) sb ++= s"  <lastmod>2024-0${1 + id % 9}-1${j % 10}</lastmod>\n"
        sb ++= " </sitemap>\n"
      }
      sb ++= "</sitemapindex>\n"
      return sb.toString
    }
    sb ++= "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"
    val n = (1 + id % 5).toInt
    (0 until n).foreach { j =>
      if (j > 0 && id % 3 == 0) sb ++= s"<!-- between $j -->\n"
      sb ++= " <url>\n"
      val esc = if (id % 4 == 2) s"?a=1&amp;b=$j" else ""
      sb ++= s"  <loc>https://site${id % 30}.example/p/$id/$j$esc</loc>\n"
      if (j == 0 && id % 7 == 3) {
        sb ++= "  <image:image>\n"
        sb ++= s"   <image:loc>https://img${id % 5}.example/i.png</image:loc>\n"
        sb ++= "  </image:image>\n"
      }
      if (j == 0 && id % 7 == 5) sb ++= "  <mobile:mobile/>\n"
      if (id % 3 != 1) sb ++= s"  <lastmod>2024-0${1 + j % 9}-0${1 + id % 9}</lastmod>\n"
      if (j % 2 == 0) {
        val cf = Seq("daily", "weekly", "monthly")(((id + j) % 3).toInt)
        sb ++= s"  <changefreq>$cf</changefreq>\n"
      }
      if (j % 3 == 0) sb ++= s"  <priority>0.${(id + j) % 10}</priority>\n"
      sb ++= " </url>\n"
    }
    sb ++= "</urlset>\n"
    sb.toString
  }

  /** The `sitemap.xml.gz` byte layer: gzip members reassembled through
   * the verified locator path, then STRICT UTF-8 decoded (the family
   * posture — decompressed bytes that are not valid UTF-8 refuse
   * instead of silently walking replacement characters). */
  def decodeGzSitemap(payload: Array[Byte]): Option[String] =
    Gzip.inflateConcat(payload).flatMap { b =>
      try {
        val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        Some(dec.decode(java.nio.ByteBuffer.wrap(b)).toString)
      } catch { case _: java.nio.charset.CharacterCodingException => None }
    }

  /** Deterministic `sitemap.xml.gz` fixture: [[syntheticSitemap]]'s
   * UTF-8 bytes compressed by the REAL `GZIPOutputStream` encoder — as
   * ONE member, or TWO members split mid-document when `id%5 == 0`
   * (member boundaries are byte-level; concatenation must reassemble
   * the identical XML). `id%10 == 4` payloads have their trailing gzip
   * ISIZE byte flipped — the member locator refuses, zero rows; the
   * underlying `id%11 == 9` unclosed-root malformation still refuses
   * at the grammar layer THROUGH the clean gzip layer. */
  def syntheticSitemapGz(id: Long): Array[Byte] = {
    val raw = syntheticSitemap(id).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def gz(b: Array[Byte], off: Int, len: Int): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b, off, len); g.finish(); g.close()
      bo.toByteArray
    }
    val bytes =
      if (id % 5 == 0 && raw.length > 2) {
        val cut = raw.length / 2
        gz(raw, 0, cut) ++ gz(raw, cut, raw.length - cut)
      } else gz(raw, 0, raw.length)
    if (id % 10 == 4 && bytes.length > 0)
      bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x55).toByte
    bytes
  }

  /** Executor-side `sitemap.xml.gz` fixtures — the t48 oracle replays
   * the t46 item formulas minus the corrupted-gzip ids. */
  def syntheticSitemapGzs(df: DataFrame, idCol: String): DataFrame =
    Fixtures.syntheticPayloads(df, idCol)(syntheticSitemapGz)

  /** Executor-side sitemap fixtures — the t46 oracle replays the item
   * formulas. */
  def syntheticSitemaps(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sitemap_text", StringType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        Row(id, syntheticSitemap(id))
      }
    }(Encoders.row(schema))
  }
}
