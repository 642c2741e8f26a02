package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * URL canonicalization for web-crawl curation: the normalization pass
 * that runs BEFORE exact dedup so that the billions of
 * `HTTP://Example.com:80/a/../b#frag` spellings of one resource
 * hash-collide. Rules (the safe, semantics-preserving subset of
 * RFC 3986 §6):
 *
 *   - scheme and host lowercased;
 *   - default port stripped (`:80` for http, `:443` for https);
 *   - fragment dropped;
 *   - percent-escapes of UNRESERVED characters decoded
 *     (`%41` → `A`, `%7E` → `~`); all other escapes uppercased
 *     (`%3a` → `%3A`); malformed escapes left verbatim;
 *   - path dot-segments resolved (`/a/./b/../c` → `/a/c`);
 *   - empty path → `/`;
 *   - query parameters byte-wise sorted (stable), empty params dropped,
 *     a then-empty query dropped entirely.
 *
 * Deliberately NOT done (lossy at crawl scale): stripping `www.`,
 * dropping tracking params, or collapsing case in path/query — those
 * change which resource the URL names.
 *
 * Composes with [[Dedup.exactDups]] on the canonical column: the
 * normalization is a narrow map, the dedup is the usual hash
 * shuffle on the canonical key — nothing here adds an exchange.
 */
object Urls {

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Decode unreserved %XX escapes, uppercase the rest, pass malformed
   * triplets through verbatim. */
  private[functions] def normalizeEscapes(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
        hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = (hexVal(s.charAt(i + 1)) << 4) | hexVal(s.charAt(i + 2))
        if (isUnreserved(v.toChar)) sb.append(v.toChar)
        else {
          sb.append('%')
          sb.append(Character.toUpperCase(s.charAt(i + 1)))
          sb.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[functions] def removeDotSegments(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "/..") {
        in = "/"
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "." || in == "..") in = ""
      else {
        val next = in.indexOf('/', if (in.startsWith("/")) 1 else 0)
        if (next < 0) { out += in; in = "" }
        else { out += in.substring(0, next); in = in.substring(next) }
      }
    }
    out.mkString
  }

  /**
   * Canonicalize one URL. None when it is not an absolute
   * `scheme://host...` URL with an alphabetic scheme, a non-empty host
   * and (if present) an all-digit port — relative references and junk
   * are a drop for the dedup pass, not a guess.
   */
  def canonicalize(url: String): Option[String] = {
    if (url == null) return None
    val u = url.trim
    val ss = u.indexOf("://")
    if (ss <= 0) return None
    val scheme = u.substring(0, ss)
    if (!scheme.forall(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')))
      return None
    val schemeLc = scheme.toLowerCase(java.util.Locale.ROOT)
    val rest = u.substring(ss + 3)
    var authEnd = rest.length
    var i = 0
    var found = false
    while (i < rest.length && !found) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') { authEnd = i; found = true }
      i += 1
    }
    val authority = rest.substring(0, authEnd)
    if (authority.isEmpty) return None
    // userinfo (rare in a crawl) is kept verbatim — it is case-sensitive
    val at = authority.lastIndexOf('@')
    val userinfo = if (at >= 0) authority.substring(0, at + 1) else ""
    val hostPort = authority.substring(at + 1)
    if (hostPort.isEmpty) return None
    // an IPv6 literal keeps its colons inside [...]; only a colon after
    // the closing bracket separates a port
    val colon = {
      val ci = hostPort.lastIndexOf(':')
      if (ci > hostPort.lastIndexOf(']')) ci else -1
    }
    val (host, port) =
      if (colon < 0) (hostPort, "")
      else {
        val p = hostPort.substring(colon + 1)
        if (p.isEmpty || !p.forall(c => c >= '0' && c <= '9')) return None
        (hostPort.substring(0, colon), p)
      }
    if (host.isEmpty) return None
    val hostLc = host.toLowerCase(java.util.Locale.ROOT)
    val defaultPort =
      (schemeLc == "http" && port == "80") ||
        (schemeLc == "https" && port == "443")
    val portPart = if (port.isEmpty || defaultPort) "" else ":" + port

    var tail = rest.substring(authEnd)
    val hash = tail.indexOf('#')
    if (hash >= 0) tail = tail.substring(0, hash) // drop fragment
    val q = tail.indexOf('?')
    val rawPath = if (q < 0) tail else tail.substring(0, q)
    val rawQuery = if (q < 0) "" else tail.substring(q + 1)
    val path0 = removeDotSegments(normalizeEscapes(rawPath))
    val path = if (path0.isEmpty) "/" else path0
    val params = rawQuery.split("&", -1).iterator
      .filter(_.nonEmpty).map(normalizeEscapes).toIndexedSeq
    val queryPart =
      if (params.isEmpty) ""
      else "?" + params.sorted.mkString("&")
    Some(schemeLc + "://" + userinfo + hostLc + portPart + path + queryPart)
  }

  /** Output schema of [[canonicalizeUrls]]. */
  val canonSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("url", StringType),
    StructField("canon_url", StringType)))

  /** One row per input row; uncanonicalizable URLs get a null
   * canon_url (kept, so the census can count the junk share). Narrow
   * mapPartitions — zero exchanges; dedup downstream shuffles on the
   * canonical key only. */
  def canonicalizeUrls(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val uIdx = df.schema.fieldIndex(urlCol)
    df.mapPartitions { it =>
      it.map { r =>
        val url = if (r.isNullAt(uIdx)) null else r.getString(uIdx)
        Row(r.getLong(idIdx), url, canonicalize(url).orNull)
      }
    }(Encoders.row(canonSchema))
  }
}
