package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * robots.txt parsing + allow/deny evaluation (RFC 9309) — the crawl-
 * curation pass that decides which fetched URLs a compliant corpus may
 * keep. At 100 TB the shape is: parse each host's robots.txt ONCE into
 * rule rows (this walk), broadcast-join the small rule side against the
 * URL stream, and evaluate [[isAllowed]] per URL — the parse is a
 * narrow map over the robots corpus, never over the crawl.
 *
 * Parsing facts honored (RFC 9309 §2):
 *   - lines are `field: value` with `#` comments stripped; field names
 *     case-insensitive; unknown fields ignored; BOM tolerated;
 *   - consecutive `user-agent` lines share one group; a `user-agent`
 *     line AFTER rules starts a new group; rules before any
 *     `user-agent` line are ignored (RFC: rules outside a group);
 *   - `allow`/`disallow` values are path patterns (`*` wildcard, `$`
 *     end anchor); an empty `disallow` value means allow-all and is
 *     kept as a rule row with an empty path;
 *   - `crawl-delay` (de-facto extension) attaches to the group;
 *   - `sitemap` is global, not group-scoped.
 *
 * Unlike the binary walkers this parser NEVER returns None: robots.txt
 * has no structural integrity contract (real files are full of junk
 * lines), and RFC 9309 mandates best-effort parsing — the never-garbage
 * posture here is "ignore what isn't a recognized line", not "poison
 * the file".
 *
 * Matching ([[isAllowed]], RFC 9309 §2.2.1–2.2.2): group selection is
 * the LONGEST user-agent token that is a case-insensitive prefix of the
 * product token, `*` only when nothing matches; rule selection is the
 * longest-match (in PATTERN length) rule across allow+disallow, ties
 * broken toward allow; no applicable rule or no group → allowed.
 */
object Robots {

  /** One group: its user-agent tokens and ordered (allow?, pattern)
   * rules. */
  final case class Group(agents: IndexedSeq[String],
      rules: IndexedSeq[(Boolean, String)], crawlDelay: Option[Double])

  /** Parsed file: groups in order plus global sitemap URLs. */
  final case class RobotsFile(groups: IndexedSeq[Group],
      sitemaps: IndexedSeq[String])

  /** Parse best-effort per RFC 9309 — total, never fails. */
  def parseRobots(text: String): RobotsFile = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[String]
    var agents = scala.collection.mutable.ArrayBuffer.empty[String]
    var rules = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    var delay: Option[Double] = None
    var inAgents = false // consecutive user-agent lines accumulate
    var open = false     // a group is being built
    def flush(): Unit = {
      if (open && agents.nonEmpty)
        groups += Group(agents.toIndexedSeq, rules.toIndexedSeq, delay)
      agents = scala.collection.mutable.ArrayBuffer.empty[String]
      rules = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
      delay = None
      open = false
    }
    val body =
      if (text == null) ""
      else if (text.startsWith("\ufeff")) text.substring(1)
      else text
    body.split("\r\n|\n|\r", -1).foreach { line0 =>
      val hash = line0.indexOf('#')
      val line = (if (hash >= 0) line0.substring(0, hash) else line0).trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents) flush()
            if (value.nonEmpty) { agents += value; open = true }
            inAgents = true
          case "allow" | "disallow" =>
            inAgents = false
            if (open) rules += ((field == "allow", value))
          case "crawl-delay" =>
            inAgents = false
            if (open) delay = value.toDoubleOption.orElse(delay)
          case "sitemap" =>
            inAgents = false
            if (value.nonEmpty) sitemaps += value
          case _ => inAgents = false // unknown field: ignored
        }
      }
      // non-field junk lines: ignored, and they do NOT split a
      // user-agent run (RFC: parseable lines only)
    }
    flush()
    RobotsFile(groups.toIndexedSeq, sitemaps.toIndexedSeq)
  }

  /** Does `pattern` (with `*` wildcards and an optional trailing `$`
   * anchor) match a PREFIX of `path` (or, anchored, all of it)? */
  private[graft] def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val parts = pat.split("\\*", -1)
    // greedy scan: each literal part must appear in order; the first
    // part must be a prefix; anchored additionally pins the last part
    // to the end of the path
    def scan(): Boolean = {
      var at = 0
      var i = 0
      while (i < parts.length) {
        val p = parts(i)
        if (i == 0) {
          if (!path.startsWith(p)) return false
          at = p.length
        } else if (i == parts.length - 1 && anchored) {
          // last literal must END the path at-or-after `at`
          return path.length - p.length >= at && path.endsWith(p)
        } else {
          val idx = path.indexOf(p, at)
          if (idx < 0) return false
          at = idx + p.length
        }
        i += 1
      }
      // unanchored: prefix match is enough; anchored with a single part
      // (no '*') requires exact equality — handled above unless
      // parts.length == 1
      if (anchored && parts.length == 1) path == parts(0) else true
    }
    scan()
  }

  /** RFC 9309 §2.2: select the group whose longest user-agent token
   * case-insensitively prefixes `productToken` (`*` as fallback), then
   * apply the longest-pattern rule; ties → allow; nothing applicable →
   * allowed. */
  def isAllowed(file: RobotsFile, productToken: String, path: String): Boolean = {
    val ua = productToken.toLowerCase(java.util.Locale.ROOT)
    var best: Option[Group] = None
    var bestLen = -1
    var star: Option[Group] = None
    file.groups.foreach { g =>
      g.agents.foreach { a =>
        val al = a.toLowerCase(java.util.Locale.ROOT)
        if (al == "*") { if (star.isEmpty) star = Some(g) }
        else if (ua.startsWith(al) && al.length > bestLen) {
          best = Some(g); bestLen = al.length
        }
      }
    }
    // plain method-level return, not a by-name thunk (getOrElse(return …)
    // would throw NonLocalReturnControl across the closure boundary)
    val groupOpt = best.orElse(star)
    if (groupOpt.isEmpty) return true
    val group = groupOpt.get
    var verdict = true
    var vlen = -1
    group.rules.foreach { case (allow, pattern) =>
      // the empty pattern (blank Disallow) matches nothing applicable:
      // RFC treats it as no-restriction
      if (pattern.nonEmpty && patternMatches(pattern, path)) {
        val plen = pattern.length
        if (plen > vlen || (plen == vlen && allow && !verdict)) {
          verdict = allow; vlen = plen
        }
      }
    }
    verdict
  }

  /** Output schema of [[robotsRules]]: one row per structural item in
   * file order — kind `ua` / `allow` / `disallow` / `crawl_delay`
   * (group-scoped, `group_no` set) or `sitemap` (global,
   * `group_no = -1`). */
  val ruleSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("group_no", IntegerType),
    StructField("item_no", IntegerType),
    StructField("kind", StringType),
    StructField("value", StringType)))

  /** Flatten parsed files to rule rows (the broadcastable side of the
   * crawl-filter join). `item_no` orders items within a group (agents
   * first, then rules in file order, then crawl_delay); sitemaps number
   * their own sequence under `group_no = -1`. Narrow mapPartitions. */
  def robotsRules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val tIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val f = parseRobots(if (r.isNullAt(tIdx)) null else r.getString(tIdx))
        val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
        f.groups.zipWithIndex.foreach { case (g, gi) =>
          var no = 0
          g.agents.foreach { a =>
            rows += Row(id, gi, no, "ua", a); no += 1 }
          g.rules.foreach { case (allow, p) =>
            rows += Row(id, gi, no, if (allow) "allow" else "disallow", p)
            no += 1
          }
          g.crawlDelay.foreach { d =>
            rows += Row(id, gi, no, "crawl_delay", d.toString); no += 1 }
        }
        f.sitemaps.zipWithIndex.foreach { case (s, si) =>
          rows += Row(id, -1, si, "sitemap", s)
        }
        rows.iterator
      }
    }(Encoders.row(ruleSchema))
  }

  /**
   * Evaluate every URL row against its host's robots.txt — the
   * 100 TB-shaped enforcement join: the robots side (one row per host,
   * bounded by the HOST count, not the crawl) is parsed once and
   * BROADCAST; the URL stream is then a narrow map adding an `allowed`
   * int column — the crawl never shuffles. Hosts with no robots row are
   * allowed (RFC 9309: unavailable robots.txt means no restrictions).
   *
   * The broadcast is a driver-side collect of the PARSED compact form —
   * the same bounded-small-side contract as the engine's dimension
   * broadcasts. For host sets too large to broadcast, pre-partition both
   * sides by host and evaluate per partition instead (the rules are
   * already plain rows via [[robotsRules]]); this entry point is the
   * broadcast path.
   */
  def filterByRobots(urls: DataFrame, hostCol: String, pathCol: String,
      uaCol: String, robots: DataFrame, robotsHostCol: String,
      robotsTextCol: String): DataFrame = {
    // collect the raw (host, text) pairs and parse on the driver — the
    // parse is ~µs per file, far cheaper than the collect itself; the
    // broadcast then ships the compact parsed form once per executor
    val parsed: Map[String, RobotsFile] = robots
      .select(robots.col(robotsHostCol).cast("string"),
        robots.col(robotsTextCol).cast("string"))
      .collect()
      .map(r => (r.getString(0),
        parseRobots(if (r.isNullAt(1)) null else r.getString(1))))
      .toMap
    val bc = urls.sparkSession.sparkContext.broadcast(parsed)
    val uHost = urls.schema.fieldIndex(hostCol)
    val uPath = urls.schema.fieldIndex(pathCol)
    val uUa = urls.schema.fieldIndex(uaCol)
    val outSchema = StructType(urls.schema.fields :+
      StructField("allowed", IntegerType))
    urls.mapPartitions { it =>
      val files = bc.value
      it.map { r =>
        // null host/ua/path must not NPE an executor: a null host has no
        // robots file (allowed); null ua/path evaluate as empty strings
        // (ua "" matches only the * group, path "" matches no pattern)
        val host = if (r.isNullAt(uHost)) null else r.getString(uHost)
        val ok =
          (if (host == null) None else files.get(host)) match {
            case None => true // no robots.txt for the host: no restrictions
            case Some(f) =>
              val ua = if (r.isNullAt(uUa)) "" else r.getString(uUa)
              val path = if (r.isNullAt(uPath)) "" else r.getString(uPath)
              isAllowed(f, ua, path)
          }
        Row.fromSeq(r.toSeq :+ (if (ok) 1 else 0))
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic robots.txt fixture shared by the writer, the t42
   * oracle and the spec: `1 + id%3` groups; group g declares UA
   * `bot<g>` plus `crawler<g>` when `(id+g)%2 == 0` (consecutive UA
   * lines, one group); rules `Disallow: /private<g>/`, then
   * `Allow: /private<g>/ok<id%10>.html` when `(id+g)%3 == 0`, then
   * a wildcard-anchored `Disallow` of `.log` files under `/tmp<g>/`
   * (star + dollar pattern) when `(id+g)%4 == 1`; `Crawl-delay:
   * <1 + id%9>` when `(id+g)%4 == 2` (rendered `<n>.0` by the rule
   * dump — the value is parsed, not echoed). Field-name casing rotates
   * by `(id+g)%3` (`User-agent` / `USER-AGENT` / `user-agent`, same for
   * the rule fields). A comment line and a junk line precede each
   * group; a global `Sitemap: https://ex<id%5>.com/sitemap.xml` is
   * emitted after the LAST group when `id%2 == 0`; a wildcard `*` group
   * (Disallow `/all<id%4>/`) closes the file when `id%5 == 3`. */
  def syntheticRobots(id: Long): String = {
    val sb = new StringBuilder
    val n = (1 + id % 3).toInt
    def field(base: String, g: Int): String = ((id + g) % 3) match {
      case 0 => base.head.toUpper + base.tail // User-agent
      case 1 => base.toUpperCase(java.util.Locale.ROOT)
      case _ => base
    }
    (0 until n).foreach { g =>
      sb ++= s"# group $g of doc $id\n"
      sb ++= "this line is junk and must be ignored\n"
      sb ++= s"${field("user-agent", g)}: bot$g\n"
      if ((id + g) % 2 == 0) sb ++= s"${field("user-agent", g)}: crawler$g\n"
      sb ++= s"${field("disallow", g)}: /private$g/\n"
      if ((id + g) % 3 == 0)
        sb ++= s"${field("allow", g)}: /private$g/ok${id % 10}.html\n"
      if ((id + g) % 4 == 1)
        sb ++= s"${field("disallow", g)}: /tmp$g/*.log$$\n"
      if ((id + g) % 4 == 2)
        sb ++= s"${field("crawl-delay", g)}: ${1 + id % 9}\n"
      sb ++= "\n"
    }
    if (id % 2 == 0)
      sb ++= s"Sitemap: https://ex${id % 5}.com/sitemap.xml\n"
    if (id % 5 == 3) {
      sb ++= "User-agent: *\n"
      sb ++= s"Disallow: /all${id % 4}/\n"
    }
    sb.toString
  }

  /** Executor-side robots fixtures — the t42 oracle replays the
   * group/rule formulas. */
  def syntheticRobotsFiles(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("robots_text", StringType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        Row(id, syntheticRobots(id))
      }
    }(Encoders.row(schema))
  }
}
