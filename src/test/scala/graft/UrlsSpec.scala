package graft

import graft.functions.Urls
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization: RFC 3986 §6 safe-normalization rules, hand
 * cases per rule, and the reject contract. */
class UrlsSpec extends AnyFunSuite {

  private def c(u: String): String =
    Urls.canonicalize(u).getOrElse(fail(s"did not canonicalize: $u"))

  test("scheme and host lowercase; default ports stripped; fragment dropped") {
    assert(c("HTTP://WWW.Example.COM/Path") === "http://www.example.com/Path")
    assert(c("http://a.com:80/x") === "http://a.com/x")
    assert(c("https://a.com:443/x") === "https://a.com/x")
    assert(c("http://a.com:8080/x") === "http://a.com:8080/x")
    assert(c("https://a.com:80/x") === "https://a.com:80/x") // not https default
    assert(c("http://a.com/x#frag") === "http://a.com/x")
    assert(c("http://a.com#frag") === "http://a.com/")
  }

  test("dot segments resolved; empty path becomes /") {
    assert(c("http://a.com") === "http://a.com/")
    assert(c("http://a.com/a/./b/../c") === "http://a.com/a/c")
    assert(c("http://a.com/a/b/../../c") === "http://a.com/c")
    assert(c("http://a.com/../x") === "http://a.com/x")
    assert(c("http://a.com/a/..") === "http://a.com/")
    assert(c("http://a.com/a/.") === "http://a.com/a/")
  }

  test("percent escapes: unreserved decoded, others uppercased, malformed verbatim") {
    assert(c("http://a.com/%41%62c") === "http://a.com/Abc")
    assert(c("http://a.com/%7Euser") === "http://a.com/~user")
    assert(c("http://a.com/a%3ab") === "http://a.com/a%3Ab")
    assert(c("http://a.com/a%zzb") === "http://a.com/a%zzb")
    assert(c("http://a.com/a%2") === "http://a.com/a%2")
  }

  test("query params byte-sorted stably; empties dropped; bare ? dropped") {
    assert(c("http://a.com/x?b=2&a=1") === "http://a.com/x?a=1&b=2")
    assert(c("http://a.com/x?b=2&&a=1&") === "http://a.com/x?a=1&b=2")
    assert(c("http://a.com/x?") === "http://a.com/x")
    assert(c("http://a.com/x?z") === "http://a.com/x?z")
    // duplicate keys keep both, sorted byte-wise
    assert(c("http://a.com/x?a=2&a=1") === "http://a.com/x?a=1&a=2")
    // escape normalization applies inside params before the sort
    assert(c("http://a.com/x?k=%41") === "http://a.com/x?k=A")
  }

  test("userinfo kept verbatim (case-sensitive); host after the last @") {
    assert(c("http://User:Pw@A.com/x") === "http://User:Pw@a.com/x")
  }

  test("IPv6 literals: bracket colons are not a port separator") {
    assert(c("http://[2001:DB8::1]/x") === "http://[2001:db8::1]/x")
    assert(c("http://[::1]:8080/x") === "http://[::1]:8080/x")
    assert(c("HTTP://[::1]:80/x") === "http://[::1]/x")
  }

  test("rejects: relative, empty host, bad port, non-alpha scheme") {
    assert(Urls.canonicalize(null) === None)
    assert(Urls.canonicalize("") === None)
    assert(Urls.canonicalize("/relative/path") === None)
    assert(Urls.canonicalize("not a url") === None)
    assert(Urls.canonicalize("http://") === None)
    assert(Urls.canonicalize("http://:80/x") === None)
    assert(Urls.canonicalize("http://a.com:8o80/x") === None)
    assert(Urls.canonicalize("ht tp://a.com/") === None)
    assert(Urls.canonicalize("://a.com/") === None)
  }

  test("idempotent: canonicalize(canonicalize(u)) == canonicalize(u)") {
    val urls = Seq(
      "HTTP://WWW.Example.COM:80/a/./b/../c%7E?b=%41&a=2#f",
      "https://x.org/%2F/..//y?q",
      "http://a.com")
    urls.foreach { u =>
      val once = c(u)
      assert(c(once) === once, s"not idempotent on $u")
    }
  }
}
