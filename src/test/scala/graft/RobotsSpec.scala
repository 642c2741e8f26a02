package graft

import graft.functions.Robots
import org.scalatest.funsuite.AnyFunSuite

/** robots.txt: the fixture against its closed group/rule form, the
 * RFC 9309 matching rules (longest-UA-prefix group selection,
 * longest-pattern rule, tie→allow, wildcard patterns and $ anchors),
 * and the best-effort parse posture (junk lines, casing, BOM, CRLF). */
class RobotsSpec extends AnyFunSuite {

  test("fixture parses to the closed group form (IDs 0-59)") {
    (0L until 60L).foreach { id =>
      val f = Robots.parseRobots(Robots.syntheticRobots(id))
      val n = (1 + id % 3).toInt
      val expectGroups = n + (if (id % 5 == 3) 1 else 0)
      assert(f.groups.size === expectGroups, s"id=$id")
      (0 until n).foreach { g =>
        val grp = f.groups(g)
        val uas = Seq(s"bot$g") ++
          (if ((id + g) % 2 == 0) Seq(s"crawler$g") else Nil)
        assert(grp.agents === uas.toIndexedSeq, s"id=$id g=$g")
        var rules = Seq[(Boolean, String)]((false, s"/private$g/"))
        if ((id + g) % 3 == 0)
          rules :+= ((true, s"/private$g/ok${id % 10}.html"))
        if ((id + g) % 4 == 1) rules :+= ((false, s"/tmp$g/*.log$$"))
        assert(grp.rules === rules.toIndexedSeq, s"id=$id g=$g")
        assert(grp.crawlDelay ===
          (if ((id + g) % 4 == 2) Some((1 + id % 9).toDouble) else None),
          s"id=$id g=$g")
      }
      if (id % 5 == 3) {
        val w = f.groups(n)
        assert(w.agents === IndexedSeq("*"))
        assert(w.rules === IndexedSeq((false, s"/all${id % 4}/")))
      }
      assert(f.sitemaps ===
        (if (id % 2 == 0)
          IndexedSeq(s"https://ex${id % 5}.com/sitemap.xml")
        else IndexedSeq()), s"id=$id")
    }
  }

  test("RFC 9309 matching: group selection and longest-match rules") {
    val f = Robots.parseRobots(
      """User-agent: FooBot
        |Disallow: /
        |Allow: /example/page.html
        |
        |User-agent: FooBot-News
        |Disallow: /news/
        |
        |User-agent: *
        |Disallow: /private/
        |""".stripMargin)
    // longest UA prefix wins: FooBot-News/1.1 picks the FooBot-News group
    assert(!Robots.isAllowed(f, "FooBot-News/1.1", "/news/today"))
    assert(Robots.isAllowed(f, "FooBot-News/1.1", "/example/page.html"))
    // FooBot/2.0 picks the FooBot group
    assert(!Robots.isAllowed(f, "FooBot/2.0", "/anything"))
    assert(Robots.isAllowed(f, "FooBot/2.0", "/example/page.html"))
    // unknown bot falls to *
    assert(!Robots.isAllowed(f, "BarBot", "/private/x"))
    assert(Robots.isAllowed(f, "BarBot", "/public/x"))
    // no group at all → allowed
    assert(Robots.isAllowed(Robots.parseRobots(""), "AnyBot", "/x"))
  }

  test("RFC 9309 matching: wildcards, anchors, tie toward allow") {
    val f = Robots.parseRobots(
      """User-agent: *
        |Disallow: /fish*.php
        |Disallow: /*.gif$
        |Allow: /fish/ok.php
        |""".stripMargin)
    assert(!Robots.isAllowed(f, "X", "/fishheads/catfish.php?p=1"))
    assert(!Robots.isAllowed(f, "X", "/a/b/pic.gif"))
    assert(Robots.isAllowed(f, "X", "/a/b/pic.gif?x=1"), "$ anchors the end")
    assert(Robots.isAllowed(f, "X", "/fish/ok.php"),
      "longer allow beats shorter disallow")
    // equal-length allow/disallow → allow wins
    val tie = Robots.parseRobots(
      """User-agent: *
        |Disallow: /page
        |Allow: /$age
        |""".stripMargin)
    val tie2 = Robots.parseRobots(
      """User-agent: *
        |Disallow: /p
        |Allow: /p
        |""".stripMargin)
    assert(Robots.isAllowed(tie2, "X", "/p/x"), "tie breaks toward allow")
    val _ = tie
  }

  test("REP reference examples: longest-match precedence table") {
    // the allow/disallow precedence examples from the public REP
    // documentation — each a (allow-pattern, disallow-pattern, path,
    // expected) quadruple
    val cases = Seq(
      ("/p", "/", "/page", true),          // longer allow wins
      ("/folder", "/folder", "/folder/page", true), // tie → allow
      ("/page", "/*.htm", "/page.htm", false),      // disallow longer
      ("/$", "/", "/", true),              // anchored allow exact root
      ("/$", "/", "/page.htm", false)      // anchor does not extend
    )
    cases.foreach { case (allow, dis, path, expect) =>
      val f = Robots.parseRobots(
        s"User-agent: *\nAllow: $allow\nDisallow: $dis\n")
      assert(Robots.isAllowed(f, "AnyBot", path) === expect,
        s"allow=$allow dis=$dis path=$path")
    }
  }

  test("pattern matcher corners") {
    import Robots.patternMatches
    assert(patternMatches("/", "/anything"))
    assert(patternMatches("/a/*/c", "/a/b/c/d"))
    assert(!patternMatches("/a/*/c", "/a/b/x"))
    assert(patternMatches("/a$", "/a"))
    assert(!patternMatches("/a$", "/ab"))
    assert(patternMatches("/*.log$", "/tmp/x.log"))
    assert(!patternMatches("/*.log$", "/tmp/x.log1"))
    assert(patternMatches("*", "/x"), "bare star matches everything")
    // a $ only anchors at the END; empty-parts from '**' are harmless
    assert(patternMatches("/a**b", "/axxb"))
  }

  test("filterByRobots: broadcast enforcement join verdicts") {
    val spark = SparkTestBase.session
    val robots = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row("a.com",
        "User-agent: bot\nDisallow: /priv/\nAllow: /priv/ok.html\n"),
      org.apache.spark.sql.Row("b.com",
        "User-agent: *\nDisallow: /\n")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("host",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("txt",
          org.apache.spark.sql.types.StringType))))
    val urls = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, "a.com", "/priv/x.html", "bot/1.0"),
      org.apache.spark.sql.Row(2L, "a.com", "/priv/ok.html", "bot/1.0"),
      org.apache.spark.sql.Row(3L, "a.com", "/pub/x.html", "bot/1.0"),
      org.apache.spark.sql.Row(4L, "b.com", "/anything", "whoever"),
      org.apache.spark.sql.Row(5L, "norobots.com", "/x", "bot")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("host",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ua",
          org.apache.spark.sql.types.StringType))))
    val out = Robots.filterByRobots(urls, "host", "path", "ua",
      robots, "host", "txt")
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(out === Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 0, 5L -> 1))
  }

  test("best-effort posture: junk, BOM, CRLF, casing, rules outside groups") {
    val f = Robots.parseRobots(
      "﻿DISALLOW: /orphan/\r\n" + // rule before any group: ignored
        "not a directive at all\r\n" +
        "USER-AGENT: Bot\r\n" +
        "# comment\r\n" +
        "disallow: /a/ # trailing comment\r\n" +
        "Crawl-Delay: 2.5\r\n" +
        "Sitemap: https://e.com/s.xml\r\n")
    assert(f.groups.size === 1)
    assert(f.groups.head.agents === IndexedSeq("Bot"))
    assert(f.groups.head.rules === IndexedSeq((false, "/a/")))
    assert(f.groups.head.crawlDelay === Some(2.5))
    assert(f.sitemaps === IndexedSeq("https://e.com/s.xml"))
    // null text parses to the empty file
    val empty = Robots.parseRobots(null)
    assert(empty.groups.isEmpty && empty.sitemaps.isEmpty)
  }
}
