package graft.sql

import scala.collection.mutable

/**
 * Jinja-class template engine for GraftSql scripts — a from-scratch Scala
 * implementation of the template constructs the reference renders through
 * jinja2 (`fugue/sql/_utils.py:13-41`): `{{ expr }}` output, `{% if %}` /
 * `{% elif %}` / `{% else %}` / `{% endif %}`, `{% for x in xs %}` with
 * the `loop` helper (index/index0/first/last/length/revindex),
 * `{% set x = expr %}` assignment (and the `{% set x %}…{% endset %}`
 * block form), `{% macro name(a, b=default) %}…{% endmacro %}` with
 * positional/keyword call arguments, `{% raw %}…{% endraw %}`,
 * `{# comments #}`, whitespace-control minus markers (`{%- -%}`),
 * boolean/comparison/membership expressions, `~` string concatenation,
 * conditional expressions (`a if c else b`), `is [not]` tests (defined /
 * none / string / number / integer / float / boolean / true / false /
 * mapping / sequence / iterable / even / odd / divisibleby), loop
 * filters and tuple unpacking (`{% for k, v in m.items() if cond %}`),
 * `namespace()` objects with `{% set ns.attr %}` mutation, runtime
 * list/dict literals, dict `.items()/.keys()/.values()`, the `range()` /
 * `dict()` globals, `{% filter name | chain %}…{% endfilter %}` blocks,
 * `{% call[(params)] m(args) %}…{% endcall %}` with `caller()`, and the
 * filters
 * upper / lower / capitalize / title / trim / replace / length / join /
 * first / last / reverse / sort(reverse=, case_sensitive=, attribute=) /
 * unique(case_sensitive=, attribute=) / min / max (both
 * case_sensitive=, attribute=) / sum(attribute=) / abs / round / int /
 * float / string / default / list / map / select / reject / selectattr /
 * rejectattr / groupby(attribute, default=, case_sensitive=) /
 * dictsort(case_sensitive=, by=, reverse=) / batch / slice / tojson /
 * truncate(length=, killwords=, end=, leeway=) / wordcount /
 * indent(width=, first=, blank=) / center / format / count / attr.
 * The sort/unique/min/max/groupby/dictsort family follows jinja2's
 * defaults: string comparison is CASE-INSENSITIVE unless
 * case_sensitive=true, and unknown keyword options raise (never
 * silently drop). groupby/dictsort rows are (key, value) PAIRS that
 * unpack, index, and answer .grouper/.list like jinja's namedtuples;
 * rendering one directly prints a list-of-lists where python prints
 * tuples — a documented divergence alongside dict-method rendering.
 *
 * Scoping follows jinja2: `{% set %}` inside `{% if %}` propagates to the
 * rest of the template (if-blocks are not scopes), while a set inside a
 * `{% for %}` body or a macro body stays local to that iteration/call.
 *
 * Also mirrors `_utils.py`'s two defensive behaviors:
 *   - quoted-string protection: a quoted literal whose content consists
 *     ONLY of `{`, `%`, `}` characters (e.g. `'{%'`) is raw-escaped before
 *     parsing so it cannot open a bogus tag;
 *   - fallback: if the protected form fails to PARSE, the original text is
 *     parsed instead; only if both fail does the syntax error propagate.
 *
 * Strictness: rendering an undefined variable in `{{ }}` raises
 * `IllegalArgumentException` (pinned by GraftSqlFuzzSpec P2b) — stricter
 * than jinja's silent-empty default and kinder to SQL pipelines, where an
 * empty substitution is a silently wrong query. In BOOLEAN contexts
 * (`{% if %}`) an undefined name is simply falsy, matching jinja's
 * `Undefined` semantics, so optional knobs need not be declared.
 *
 * Unterminated `{{` / `{%` openers are treated as literal text (the
 * legacy `{{name}}`-only substituter passed them through, and template
 * VALUES frequently contain brace runs).
 */
object Template {

  /** Parse-time errors — eligible for the unprotected-retry fallback.
   * Extends IllegalArgumentException so callers see one exception type. */
  private class SyntaxError(msg: String) extends IllegalArgumentException(msg)

  /** Internal binding name carrying a filter block's rendered body into
   * its parsed `body | chain` expression. A reserved dunder name — a
   * template binding with this exact name would shadow it, which is
   * accepted (jinja reserves its internals the same way). */
  private val FilterBodyRef = "__graft_filter_body__"

  /** Macro-call nesting bound (thread-local — render has no context arg). */
  private val MaxMacroDepth = 64
  private val macroDepth = new scala.util.DynamicVariable[Int](0)

  private case object Undefined

  // ---- template-level tokens ----
  private sealed trait Tok
  private case class TText(s: String) extends Tok
  private case class TVar(body: String, lt: Boolean, rt: Boolean) extends Tok
  private case class TTag(body: String, lt: Boolean, rt: Boolean) extends Tok
  private case class TComment(lt: Boolean, rt: Boolean) extends Tok

  // ---- AST ----
  private sealed trait Node
  private case class Text(s: String) extends Node
  private case class Output(e: Expr, src: String) extends Node
  private case class IfNode(branches: List[(Expr, List[Node])],
      orElse: List[Node]) extends Node
  /** `{% for a[, b...] in expr [if filter] %}` — tuple unpacking binds
   * each item's elements to the names; the filter (evaluated with the
   * names bound, WITHOUT `loop`) selects items BEFORE loop.* indexing,
   * so loop.length/index count selected items only (jinja2 semantics). */
  private case class ForNode(names: List[String], list: Expr,
      filter: Option[Expr], body: List[Node],
      orElse: List[Node] = Nil) extends Node

  /** `loop.cycle(...)` callable: picks by the current 0-based index. */
  private final case class CycleVal(index0: Long)
  private case class SetNode(name: String, e: Expr) extends Node
  private case class SetBlockNode(name: String, body: List[Node]) extends Node
  /** `{% set ns.attr = e %}` — attribute assignment on a namespace()
   * object (jinja2.utils.Namespace), the documented escape hatch for
   * mutating state across scope boundaries (loop bodies, macros). */
  private case class SetAttrNode(target: String, attr: String, e: Expr)
    extends Node
  private case class SetAttrBlockNode(target: String, attr: String,
      body: List[Node]) extends Node
  private case class MacroNode(name: String,
      params: List[(String, Option[Expr])], body: List[Node]) extends Node
  /** `{% filter upper | trim %}…{% endfilter %}` — the rendered body
   * pushed through a filter chain. `chain` is parsed once as
   * `<bodyRef> | spec` so args/kwargs/chaining reuse the expression
   * grammar verbatim. */
  private case class FilterBlockNode(chain: Expr, body: List[Node])
    extends Node
  /** `{% call[(params)] m(args) %}body{% endcall %}` — invoke the macro
   * with `caller` bound to a callable that renders `body` in the CALL
   * SITE's scope (params bound from the caller(...) invocation args). */
  private case class CallBlockNode(params: List[String], target: Expr,
      body: List[Node]) extends Node

  /** The `caller` value a `{% call %}` block passes into its macro: a
   * zero-or-more-arg callable rendering the block body in the call-site
   * env. Re-renders on every invocation (jinja: caller() twice renders
   * twice). */
  private final case class CallerVal(params: List[String], body: List[Node],
      env: Map[String, Any])

  /** The pending caller for the NEXT macro invocation — set by a call
   * block around its target evaluation, consumed (and cleared, so nested
   * plain calls don't inherit it — jinja scopes caller to the directly
   * called macro) by MacroVal invocation. */
  private val pendingCaller =
    new scala.util.DynamicVariable[Option[CallerVal]](None)

  /** The live bindings of one template scope ("frame"). jinja2 compiles
   * a template to a module whose top-level `{% set %}`s mutate the module
   * namespace; macros resolve free names against that namespace AT CALL
   * TIME (late binding), so a set or macro definition AFTER a macro's
   * definition is visible inside its body — verified against jinja2
   * 3.1.6: `{% macro g() %}{{ v }}{% endmacro %}{% set v = 'X' %}{{ g()
   * }}` renders `X`, and a rebinding renders the NEW value. A mutable
   * cell (not the immutable threaded map) is the only way a macro can
   * observe bindings created after its definition. */
  private final class Frame(var env: Map[String, Any])

  /** jinja2 `namespace()` value: a MUTABLE attribute bag shared by
   * reference through env copies, so `{% set ns.x = v %}` inside a loop
   * or macro is visible after it — exactly the cross-scope channel
   * jinja2.utils.Namespace provides. */
  private final class NamespaceVal(fields0: Map[String, Any]) {
    // VectorMap: attribute INSERTION order is preserved and re-assignment
    // keeps the original position — exactly python-dict (and therefore
    // jinja2 Namespace repr) semantics
    var fields: Map[String, Any] =
      scala.collection.immutable.VectorMap.from(fields0)
    override def toString: String = {
      val inner = fields
        .map { case (k, v) => s"'$k': ${pyRepr(v)}" }.mkString(", ")
      s"<Namespace {$inner}>"
    }
  }

  /** Python-ish repr for NamespaceVal rendering parity. */
  private def pyRepr(v: Any): String = v match {
    case s: String => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case true => "True"
    case false => "False"
    case null => "None"
    case other => String.valueOf(other)
  }

  /** A defined macro, stored as an env value so calls resolve by name.
   * `defEnv` is the environment snapshot at the `{% macro %}` tag — it
   * carries definition-SITE locals (e.g. the loop variable when a macro
   * is defined inside `{% for %}`, which jinja2 does expose to the body).
   * `frame` is the LIVE scope the macro was defined in; at call time the
   * frame's current bindings overlay the snapshot, giving jinja2's
   * late-binding semantics while the caller's locals stay invisible
   * (they live in the caller's env, never in this frame). Both are
   * `var` only because the macro binds itself cyclically. */
  private case class MacroVal(name: String,
      params: List[(String, Option[Expr])], body: List[Node]) {
    var defEnv: Map[String, Any] = Map.empty
    var frame: Frame = null
    /** Call-time resolution scope: def-site locals, then the live frame
     * (later sets / rebindings / sibling macros win), per jinja2 3.1.6. */
    def callEnv: Map[String, Any] = defEnv ++ frame.env
  }

  private sealed trait Expr
  private case class Lit(v: Any) extends Expr
  private case class ListLit(items: List[Expr]) extends Expr
  private case class DictLit(items: List[(Expr, Expr)]) extends Expr
  private case class Ref(name: String) extends Expr
  private case class Attr(t: Expr, name: String) extends Expr
  private case class IndexOp(t: Expr, i: Expr) extends Expr
  /** `x[a:b:c]` — python slice semantics on sequences and strings. */
  private case class SliceOp(t: Expr, start: Option[Expr],
      stop: Option[Expr], step: Option[Expr]) extends Expr
  private case class Un(op: String, e: Expr) extends Expr
  private case class Bin(op: String, l: Expr, r: Expr) extends Expr
  private case class FilterOp(e: Expr, name: String, args: List[Expr],
      kwargs: List[(String, Expr)] = Nil) extends Expr
  /** `a if c else b` — jinja conditional expression; else-less false
   * renders '' (jinja yields a PLAIN Undefined there regardless of the
   * strict-undefined policy, which str()s to empty). Lazy branches. */
  private case class Cond(cond: Expr, ifTrue: Expr, orElse: Option[Expr]) extends Expr
  /** `x is [not] test[(arg)]` — jinja tests. */
  private case class TestOp(e: Expr, name: String, arg: Option[Expr],
      neg: Boolean) extends Expr
  private case class CallOp(t: Expr, args: List[Expr],
      kwargs: List[(String, Expr)]) extends Expr

  // ---- public API ----

  /** Render `script` against `params`. Values may be String, Boolean,
   * Int/Long/Double, Seq, Map[String, _] or null; anything else renders
   * via toString. */
  def render(script: String, params: Map[String, Any]): String = {
    // the reference drops a "self" key before rendering
    // (fugue/sql/_utils.py:23-24 — an artifact of passing python locals())
    val env = params - "self"
    def go(src: String): String = {
      val nodes = new Parser(applyTrims(lex(src))).parseAll()
      val sb = new StringBuilder
      renderNodes(nodes, env, sb, new Frame(env))
      sb.toString
    }
    val guarded = protectQuoted(script)
    try go(guarded)
    catch {
      case e: SyntaxError =>
        try go(script)
        catch { case _: SyntaxError => throw e }
    }
  }

  /** `_utils.py` MATCH_QUOTED_STRING: raw-escape quoted literals whose
   * content is only `{`/`%`/`}` characters so they cannot open a tag. */
  private[sql] def protectQuoted(s: String): String =
    "([\"'])([{%}]+)\\1".r.replaceAllIn(s, m => java.util.regex.Matcher
      .quoteReplacement(
        m.group(1) + "{% raw %}" + m.group(2) + "{% endraw %}" + m.group(1)))

  // ---- lexer ----

  private def lex(s: String): Vector[Tok] = {
    val out = mutable.ArrayBuffer.empty[Tok]
    val text = new StringBuilder
    def flush(): Unit =
      if (text.nonEmpty) { out += TText(text.toString); text.clear() }
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val kind = if (c == '{' && i + 1 < n) s.charAt(i + 1) else ' '
      if (kind == '{' || kind == '%' || kind == '#') {
        val close = kind match {
          case '{' => "}}"
          case '%' => "%}"
          case _ => "#}"
        }
        val end = s.indexOf(close, i + 2)
        if (end < 0) {
          // unterminated opener: literal text (legacy pass-through)
          text.append(c); i += 1
        } else {
          var from = i + 2
          val lt = from < end && s.charAt(from) == '-'
          if (lt) from += 1
          var to = end
          val rt = to > from && s.charAt(to - 1) == '-'
          if (rt) to -= 1
          val body = s.substring(from, to).trim
          flush()
          i = end + 2
          kind match {
            case '{' => out += TVar(body, lt, rt)
            case '#' => out += TComment(lt, rt)
            case _ if body == "raw" =>
              // scan verbatim to the matching endraw
              val endraw = "\\{%-?\\s*endraw\\s*-?%\\}".r
                .findFirstMatchIn(s.substring(i))
                .getOrElse(throw new SyntaxError("'{% raw %}' without '{% endraw %}'"))
              out += TText(s.substring(i, i + endraw.start))
              i += endraw.end
            case _ => out += TTag(body, lt, rt)
          }
        }
      } else { text.append(c); i += 1 }
    }
    flush()
    out.toVector
  }

  /** Apply `-` whitespace-control markers, then drop comments. */
  private def applyTrims(toks: Vector[Tok]): Vector[Tok] = {
    val arr = toks.toArray
    def trims(idx: Int): Option[(Boolean, Boolean)] = arr(idx) match {
      case TVar(_, lt, rt) => Some((lt, rt))
      case TTag(_, lt, rt) => Some((lt, rt))
      case TComment(lt, rt) => Some((lt, rt))
      case _ => None
    }
    for (i <- arr.indices; (lt, rt) <- trims(i)) {
      if (lt && i > 0) arr(i - 1) match {
        case TText(t) => arr(i - 1) = TText(t.replaceAll("\\s+$", ""))
        case _ => ()
      }
      if (rt && i + 1 < arr.length) arr(i + 1) match {
        case TText(t) => arr(i + 1) = TText(t.replaceAll("^\\s+", ""))
        case _ => ()
      }
    }
    arr.toVector.filter(!_.isInstanceOf[TComment])
  }

  // ---- parser ----

  private class Parser(toks: Vector[Tok]) {
    private var pos = 0

    def parseAll(): List[Node] = {
      val (nodes, term) = parseNodes(Set.empty)
      if (term.nonEmpty) throw new SyntaxError(s"unexpected '{% $term %}'")
      nodes
    }

    /** Parse until a tag whose first word is in `stop` (tag consumed;
     * its full body returned) or end of input (empty string returned). */
    private def parseNodes(stop: Set[String]): (List[Node], String) = {
      val out = mutable.ListBuffer.empty[Node]
      while (pos < toks.length) {
        toks(pos) match {
          case TText(s) => out += Text(s); pos += 1
          case TVar(body, _, _) =>
            out += Output(ExprParser.parse(body), body); pos += 1
          case TComment(_, _) => pos += 1
          case TTag(body, _, _) =>
            // the tag keyword is the leading identifier, not the first
            // whitespace token: '{% call(item) m() %}' starts 'call'
            val word = body.takeWhile(c => c.isLetterOrDigit || c == '_')
            if (stop(word)) { pos += 1; return (out.toList, body) }
            word match {
              case "if" => pos += 1; out += parseIf(body.drop(2).trim)
              case "for" => pos += 1; out += parseFor(body)
              case "set" => pos += 1; out += parseSet(body)
              case "macro" => pos += 1; out += parseMacro(body)
              case "filter" => pos += 1; out += parseFilterBlock(body)
              case "call" => pos += 1; out += parseCallBlock(body)
              case "elif" | "else" | "endif" | "endfor" | "endraw" |
                   "endset" | "endmacro" | "endfilter" | "endcall" =>
                throw new SyntaxError(s"unexpected '{% $word %}'")
              case other =>
                throw new SyntaxError(s"unknown template tag '$other'")
            }
        }
      }
      (out.toList, "")
    }

    private def parseIf(cond: String): IfNode = {
      val branches = mutable.ListBuffer.empty[(Expr, List[Node])]
      var c = cond
      var orElse: List[Node] = Nil
      var done = false
      while (!done) {
        val (body, term) = parseNodes(Set("elif", "else", "endif"))
        branches += ((ExprParser.parse(c), body))
        term.takeWhile(!_.isWhitespace) match {
          case "elif" => c = term.drop(4).trim
          case "else" =>
            val (eb, et) = parseNodes(Set("endif"))
            if (et.isEmpty) throw new SyntaxError("'{% else %}' without '{% endif %}'")
            orElse = eb
            done = true
          case "endif" => done = true
          case _ => throw new SyntaxError("'{% if %}' without '{% endif %}'")
        }
      }
      IfNode(branches.toList, orElse)
    }

    private def parseFor(body: String): ForNode = {
      val m = ("(?s)^for\\s+([A-Za-z_][A-Za-z0-9_]*" +
        "(?:\\s*,\\s*[A-Za-z_][A-Za-z0-9_]*)*)\\s+in\\s+(.+)$").r
        .findFirstMatchIn(body)
        .getOrElse(throw new SyntaxError(
          s"malformed for tag '{% $body %}' (expected '{% for name[, name] in expr [if cond] %}')"))
      val names = m.group(1).split(",").map(_.trim).toList
      val (inner, term) = parseNodes(Set("endfor", "else"))
      if (term.isEmpty) throw new SyntaxError("'{% for %}' without '{% endfor %}'")
      // for-else: the else block renders when the (filtered) sequence
      // yields NO iterations (jinja semantics)
      val orElse =
        if (term.takeWhile(c => c.isLetterOrDigit || c == '_') == "else") {
          val (eb, et) = parseNodes(Set("endfor"))
          if (et.isEmpty)
            throw new SyntaxError("'{% for %} ... {% else %}' without '{% endfor %}'")
          eb
        } else Nil
      val (it, filt) = ExprParser.parseForRest(m.group(2))
      ForNode(names, it, filt, inner, orElse)
    }

    private def parseCallBlock(body: String): Node = {
      val m = ("(?s)^call\\s*(?:\\(([^)]*)\\))?\\s*(.+)$").r
        .findFirstMatchIn(body)
        .getOrElse(throw new SyntaxError(
          s"malformed call tag '{% $body %}' (expected '{% call[(params)] macro(args) %}')"))
      val params = Option(m.group(1)).map(_.split(",").map(_.trim)
        .filter(_.nonEmpty).toList).getOrElse(Nil)
      params.foreach { p =>
        if (!p.matches("[A-Za-z_][A-Za-z0-9_]*"))
          throw new SyntaxError(s"bad caller parameter '$p' in '{% $body %}'")
      }
      val target = ExprParser.parse(m.group(2))
      val (inner, term) = parseNodes(Set("endcall"))
      if (term.isEmpty)
        throw new SyntaxError("'{% call %}' without '{% endcall %}'")
      CallBlockNode(params, target, inner)
    }

    private def parseFilterBlock(body: String): Node = {
      val spec = body.stripPrefix("filter").trim
      if (spec.isEmpty) throw new SyntaxError(
        "'{% filter %}' needs a filter name")
      val chain = ExprParser.parse(s"$FilterBodyRef | $spec")
      val (inner, term) = parseNodes(Set("endfilter"))
      if (term.isEmpty)
        throw new SyntaxError("'{% filter %}' without '{% endfilter %}'")
      FilterBlockNode(chain, inner)
    }

    private def parseSet(body: String): Node = {
      // attribute form: {% set ns.attr = expr %} — ONE level, on a
      // namespace() object only (jinja2 semantics)
      val attrEq = ("(?s)^set\\s+([A-Za-z_][A-Za-z0-9_]*)\\." +
        "([A-Za-z_][A-Za-z0-9_]*)\\s*=\\s*(.+)$").r
      attrEq.findFirstMatchIn(body).foreach { m =>
        return SetAttrNode(m.group(1), m.group(2), ExprParser.parse(m.group(3)))
      }
      // expression form: {% set name = expr %} — (?s) so a multi-line
      // expression (valid jinja) parses like parseMacro's signature does
      val eq = "(?s)^set\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*=\\s*(.+)$".r
      eq.findFirstMatchIn(body) match {
        case Some(m) => SetNode(m.group(1), ExprParser.parse(m.group(2)))
        case None =>
          // block form: {% set name %}...{% endset %} (rendered string)
          val blk = ("(?s)^set\\s+([A-Za-z_][A-Za-z0-9_]*)" +
            "(?:\\.([A-Za-z_][A-Za-z0-9_]*))?\\s*$").r
          val m = blk.findFirstMatchIn(body)
            .getOrElse(throw new SyntaxError(
              s"malformed set tag '{% $body %}' (expected " +
                "'{% set name = expr %}' or '{% set name %}...{% endset %}')"))
          val (inner, term) = parseNodes(Set("endset"))
          if (term.isEmpty)
            throw new SyntaxError("'{% set %}' block without '{% endset %}'")
          Option(m.group(2)) match {
            case Some(attr) => SetAttrBlockNode(m.group(1), attr, inner)
            case None => SetBlockNode(m.group(1), inner)
          }
      }
    }

    private def parseMacro(body: String): Node = {
      val m = "(?s)^macro\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*\\((.*)\\)\\s*$".r
        .findFirstMatchIn(body)
        .getOrElse(throw new SyntaxError(
          s"malformed macro tag '{% $body %}' " +
            "(expected '{% macro name(params) %}')"))
      val params = ExprParser.parseParams(m.group(2))
      // default params must trail required ones (jinja raises at call time;
      // raising at parse time is strictly kinder)
      params.map(_._2.isDefined).foldLeft(false) { (seen, hasDefault) =>
        if (seen && !hasDefault) throw new SyntaxError(
          s"macro '${m.group(1)}': required parameter after a defaulted one")
        seen || hasDefault
      }
      val (inner, term) = parseNodes(Set("endmacro"))
      if (term.isEmpty)
        throw new SyntaxError("'{% macro %}' without '{% endmacro %}'")
      MacroNode(m.group(1), params, inner)
    }
  }

  // ---- expression parsing ----

  private object ExprParser {
    private sealed trait ETok
    private case class EId(s: String) extends ETok
    private case class ENum(v: Any) extends ETok
    private case class EStr(s: String) extends ETok
    private case class EOp(s: String) extends ETok

    private def tokens(s: String): Vector[ETok] = {
      val out = mutable.ArrayBuffer.empty[ETok]
      var i = 0
      val n = s.length
      while (i < n) {
        val c = s.charAt(i)
        if (c.isWhitespace) i += 1
        else if (c.isDigit ||
            (c == '.' && i + 1 < n && s.charAt(i + 1).isDigit)) {
          val start = i
          while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
          val t = s.substring(start, i)
          // greedy digits-and-dots can capture malformed forms ('1.2.3',
          // '1.') — map them to the one documented exception type so the
          // protected-form retry contract holds, not NumberFormatException
          out += ENum(
            try { if (t.contains('.')) t.toDouble else t.toLong }
            catch { case _: NumberFormatException =>
              throw new SyntaxError(s"malformed number literal '$t' in '$s'")
            })
        } else if (c == '\'' || c == '"') {
          val end = s.indexOf(c, i + 1)
          if (end < 0) throw new SyntaxError(s"unterminated string in '$s'")
          out += EStr(s.substring(i + 1, end))
          i = end + 1
        } else if (c.isLetter || c == '_') {
          val start = i
          while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
          out += EId(s.substring(start, i))
        } else {
          val two = if (i + 1 < n) s.substring(i, i + 2) else ""
          if (Set("==", "!=", "<=", ">=", "//").contains(two)) { out += EOp(two); i += 2 }
          else if ("()[].,|~<>+-*/%={}:".indexOf(c) >= 0) { out += EOp(c.toString); i += 1 }
          else throw new SyntaxError(s"unexpected character '$c' in expression '$s'")
        }
      }
      out.toVector
    }

    def parse(src: String): Expr = {
      val toks = tokens(src)
      if (toks.isEmpty) throw new SyntaxError("empty template expression")
      val p = new P(toks, src)
      val e = p.condExpr()
      p.expectEnd()
      e
    }

    /** Parse a for-tag tail: `<iterable> [if <filter>]`. The iterable is
     * parsed WITHOUT the ternary (jinja's parse_tuple(with_condexpr=
     * False)) so the trailing `if` reads as the loop filter. */
    def parseForRest(src: String): (Expr, Option[Expr]) = {
      val toks = tokens(src)
      if (toks.isEmpty) throw new SyntaxError("empty for-loop expression")
      val p = new P(toks, src)
      val it = p.orExpr()
      val filt = if (p.acceptIdPub("if")) Some(p.condExpr()) else None
      p.expectEnd()
      (it, filt)
    }

    /** Parse a macro parameter list: `a, b=expr, ...` (possibly empty). */
    def parseParams(src: String): List[(String, Option[Expr])] = {
      val toks = tokens(src)
      if (toks.isEmpty) return Nil
      val p = new P(toks, src)
      val out = p.paramList()
      p.expectEnd()
      out
    }

    private class P(toks: Vector[ETok], src: String) {
      private var pos = 0
      private def peek: Option[ETok] = if (pos < toks.length) Some(toks(pos)) else None
      private def peek2: Option[ETok] =
        if (pos + 1 < toks.length) Some(toks(pos + 1)) else None
      private def advance(): ETok = {
        // a clean SyntaxError, not an IndexOutOfBounds escape, on truncated
        // input (trailing comma in a param list, '{{ m(a= }}', ...)
        if (pos >= toks.length)
          throw new SyntaxError(s"unexpected end of expression '$src'")
        val t = toks(pos); pos += 1; t
      }
      private def accept(op: String): Boolean = peek match {
        case Some(EOp(o)) if o == op => pos += 1; true
        case _ => false
      }
      private def acceptId(id: String): Boolean = peek match {
        case Some(EId(i)) if i == id => pos += 1; true
        case _ => false
      }
      private def expect(op: String): Unit =
        if (!accept(op)) throw new SyntaxError(s"expected '$op' in expression '$src'")
      def expectEnd(): Unit =
        if (pos < toks.length)
          throw new SyntaxError(s"trailing tokens in expression '$src'")

      def paramList(): List[(String, Option[Expr])] = {
        val out = mutable.ListBuffer.empty[(String, Option[Expr])]
        var going = true
        while (going) {
          advance() match {
            case EId(name) =>
              val dflt = if (accept("=")) Some(condExpr()) else None
              out += ((name, dflt))
            case t => throw new SyntaxError(
              s"expected parameter name, got $t in '$src'")
          }
          going = accept(",")
        }
        out.toList
      }

      def acceptIdPub(id: String): Boolean = acceptId(id)

      /** Lowest precedence: `a if c [else b]` (jinja CondExpr). */
      def condExpr(): Expr = {
        val e = orExpr()
        if (acceptId("if")) {
          val c = orExpr()
          val els = if (acceptId("else")) Some(condExpr()) else None
          Cond(c, e, els)
        } else e
      }

      def orExpr(): Expr = {
        var l = andExpr()
        while (acceptId("or")) l = Bin("or", l, andExpr())
        l
      }
      private def andExpr(): Expr = {
        var l = notExpr()
        while (acceptId("and")) l = Bin("and", l, notExpr())
        l
      }
      private def notExpr(): Expr =
        if (acceptId("not")) Un("not", notExpr()) else comparison()
      private def comparison(): Expr = {
        val l = concat()
        peek match {
          case Some(EOp(op)) if Set("==", "!=", "<", "<=", ">", ">=").contains(op) =>
            pos += 1
            Bin(op, l, concat())
          case Some(EId("in")) =>
            pos += 1
            Bin("in", l, concat())
          case Some(EId("not")) =>
            pos += 1
            if (!acceptId("in"))
              throw new SyntaxError(s"expected 'in' after 'not' in '$src'")
            Un("not", Bin("in", l, concat()))
          case Some(EId("is")) =>
            pos += 1
            val neg = acceptId("not")
            val tname = advance() match {
              case EId(n) => n
              case t => throw new SyntaxError(
                s"expected a test name after 'is', got $t in '$src'")
            }
            val arg = if (accept("(")) {
              val a = condExpr(); expect(")"); Some(a)
            } else None
            TestOp(l, tname, arg, neg)
          case _ => l
        }
      }
      private def concat(): Expr = {
        var l = additive()
        while (accept("~")) l = Bin("~", l, additive())
        l
      }
      private def additive(): Expr = {
        var l = multiplicative()
        var going = true
        while (going) {
          if (accept("+")) l = Bin("+", l, multiplicative())
          else if (accept("-")) l = Bin("-", l, multiplicative())
          else going = false
        }
        l
      }
      private def multiplicative(): Expr = {
        var l = unary()
        var going = true
        while (going) {
          if (accept("*")) l = Bin("*", l, unary())
          else if (accept("/")) l = Bin("/", l, unary())
          else if (accept("//")) l = Bin("//", l, unary())
          else if (accept("%")) l = Bin("%", l, unary())
          else going = false
        }
        l
      }
      private def unary(): Expr =
        if (accept("-")) Un("neg", unary())
        else if (accept("+")) unary()
        else postfix()
      private def postfix(): Expr = {
        var e = primary()
        var going = true
        while (going) {
          if (accept(".")) advance() match {
            case EId(name) => e = Attr(e, name)
            case _ => throw new SyntaxError(s"expected attribute name in '$src'")
          }
          else if (accept("(")) {
            // macro call: positional args, then name=value keyword args
            val args = mutable.ListBuffer.empty[Expr]
            val kwargs = mutable.ListBuffer.empty[(String, Expr)]
            if (!accept(")")) {
              var going = true
              while (going) {
                (peek, peek2) match {
                  case (Some(EId(name)), Some(EOp("="))) =>
                    pos += 2
                    kwargs += ((name, condExpr()))
                  case _ =>
                    if (kwargs.nonEmpty) throw new SyntaxError(
                      s"positional argument after keyword argument in '$src'")
                    args += condExpr()
                }
                going = accept(",")
              }
              expect(")")
            }
            e = CallOp(e, args.toList, kwargs.toList)
          }
          else if (accept("[")) {
            def isOp(op: String) = peek.contains(EOp(op))
            val start = if (isOp(":")) None else Some(condExpr())
            if (accept(":")) {
              val stop =
                if (isOp(":") || isOp("]")) None else Some(condExpr())
              val step = if (accept(":")) {
                if (isOp("]")) None else Some(condExpr())
              } else None
              expect("]")
              e = SliceOp(e, start, stop, step)
            } else { expect("]"); e = IndexOp(e, start.get) }
          }
          else if (accept("|")) advance() match {
            case EId(name) =>
              val args = mutable.ListBuffer.empty[Expr]
              val kwargs = mutable.ListBuffer.empty[(String, Expr)]
              if (accept("(")) {
                if (!accept(")")) {
                  var more = true
                  while (more) {
                    (peek, peek2) match {
                      case (Some(EId(k)), Some(EOp("="))) =>
                        pos += 2
                        kwargs += ((k, condExpr()))
                      case _ =>
                        if (kwargs.nonEmpty) throw new SyntaxError(
                          s"positional filter arg after keyword arg in '$src'")
                        args += condExpr()
                    }
                    more = accept(",")
                  }
                  expect(")")
                }
              }
              e = FilterOp(e, name, args.toList, kwargs.toList)
            case _ => throw new SyntaxError(s"expected filter name in '$src'")
          }
          else going = false
        }
        e
      }
      private def primary(): Expr = advance() match {
        case ENum(v) => Lit(v)
        case EStr(s) => Lit(s)
        case EId("true") | EId("True") => Lit(true)
        case EId("false") | EId("False") => Lit(false)
        case EId("none") | EId("None") | EId("null") => Lit(null)
        case EId(name) => Ref(name)
        case EOp("(") => val e = condExpr(); expect(")"); e
        case EOp("[") =>
          // list literal: elements are full expressions evaluated at
          // render time ([x, 1] is valid jinja, not only ['a','b'])
          val items = mutable.ListBuffer.empty[Expr]
          if (!accept("]")) {
            items += condExpr()
            while (accept(",")) items += condExpr()
            expect("]")
          }
          ListLit(items.toList)
        case EOp("{") =>
          // dict literal: {'a': 1, k: v} — keys and values are full
          // expressions (jinja dict syntax; namespace({'a': 5}) needs it)
          val items = mutable.ListBuffer.empty[(Expr, Expr)]
          if (!accept("}")) {
            def pair(): Unit = {
              val k = condExpr(); expect(":"); items += ((k, condExpr()))
            }
            pair()
            while (accept(",")) pair()
            expect("}")
          }
          DictLit(items.toList)
        case t => throw new SyntaxError(s"unexpected token $t in expression '$src'")
      }
    }
  }

  // ---- evaluation ----

  /** Render `nodes`, threading `{% set %}` / `{% macro %}` bindings through
   * the node list; returns the (possibly extended) environment so callers
   * that do NOT open a scope (the top level, if-branches) propagate
   * assignments, while scoped bodies (for iterations, macro calls) simply
   * discard the returned env — jinja2's scoping rules. `frame` is the
   * live scope cell the threaded env is mirrored into after every node,
   * so macros defined in this scope observe later bindings at call time
   * (jinja2 late binding); scope-opening bodies pass a FRESH frame so
   * their locals never leak into an enclosing macro's view. */
  private def renderNodes(nodes: List[Node], env: Map[String, Any],
      sb: StringBuilder, frame: Frame): Map[String, Any] =
    nodes.foldLeft(env) { (e, node) =>
      val e2 = renderNode(node, e, sb, frame)
      frame.env = e2
      e2
    }

  private def renderNode(node: Node, env: Map[String, Any],
      sb: StringBuilder, frame: Frame): Map[String, Any] = node match {
    case Text(s) => sb.append(s); env
    case Output(e, src) =>
      eval(e, env) match {
        case Undefined =>
          val name = e match {
            case Ref(n) => n
            case _ => src
          }
          throw new IllegalArgumentException(
            s"undefined template variable '$name'")
        case v => sb.append(show(v))
      }
      env
    case IfNode(branches, orElse) =>
      // if-blocks are NOT scopes in jinja: the taken branch's assignments
      // survive into the rest of the template
      branches.find { case (c, _) => truthy(eval(c, env)) } match {
        case Some((_, body)) => renderNodes(body, env, sb, frame)
        case None => renderNodes(orElse, env, sb, frame)
      }
    case ForNode(names, listE, filt, body, orElse) =>
      val items0: Seq[Any] = eval(listE, env) match {
        case s: Seq[_] => s
        case a: Array[_] => a.toSeq
        // jinja iterates a mapping's KEYS (use attr/index access in the
        // body for the values) — must precede the generic Iterable case,
        // which would yield (k, v) tuples
        case m: Map[_, _] => m.keys.toSeq
        case it: Iterable[_] => it.toSeq
        case s: String => s.map(_.toString)
        case Undefined | null => throw new IllegalArgumentException(
          s"'{% for %}' over undefined or non-iterable value")
        case other => throw new IllegalArgumentException(
          s"'{% for %}' over non-iterable ${other.getClass.getSimpleName}")
      }
      // tuple unpacking: bind each item's elements to the names
      def bind(item: Any): Map[String, Any] =
        if (names.length == 1) Map(names.head -> item)
        else item match {
          case s: Seq[_] if s.length == names.length =>
            names.zip(s).toMap
          case other => throw new IllegalArgumentException(
            s"'{% for ${names.mkString(", ")} %}': cannot unpack " +
              s"${kind(other)} into ${names.length} names")
        }
      // the filter selects BEFORE loop.* indexing (loop is not in scope
      // inside the filter expression, as in jinja)
      val items = filt match {
        case None => items0
        case Some(f) => items0.filter(it => truthy(eval(f, env ++ bind(it))))
      }
      val len = items.length
      if (items.isEmpty && orElse.nonEmpty) {
        // for-else: zero iterations (incl. filtered-to-nothing) renders
        // the else block IN the enclosing scope, assignments propagating
        // like an if-branch (jinja semantics)
        renderNodes(orElse, env, sb, new Frame(env))
      }
      items.zipWithIndex.foreach { case (item, i) =>
        val loop = Map(
          "index" -> (i + 1).toLong, "index0" -> i.toLong,
          "first" -> (i == 0), "last" -> (i == len - 1),
          "length" -> len.toLong, "revindex" -> (len - i).toLong,
          "previtem" -> (if (i > 0) items(i - 1) else Undefined),
          "nextitem" -> (if (i < len - 1) items(i + 1) else Undefined),
          "cycle" -> CycleVal(i.toLong))
        // loop body is a scope: per-iteration assignments don't escape —
        // fresh frame, so a macro defined OUTSIDE the loop never sees
        // loop-body sets (jinja2 renders such names as undefined)
        val bodyEnv = env ++ bind(item) + ("loop" -> loop)
        renderNodes(body, bodyEnv, sb, new Frame(bodyEnv))
      }
      env
    case SetNode(name, e) =>
      eval(e, env) match {
        case Undefined => throw new IllegalArgumentException(
          s"'{% set $name %}': assigning an undefined value")
        case v => env + (name -> v)
      }
    case SetBlockNode(name, body) =>
      val inner = new StringBuilder
      renderNodes(body, env, inner, new Frame(env))
      env + (name -> inner.toString)
    case CallBlockNode(params, target, body) =>
      val cv = CallerVal(params, body, env)
      val out = pendingCaller.withValue(Some(cv)) { eval(target, env) }
      sb.append(show(out))
      env
    case FilterBlockNode(chain, body) =>
      val inner = new StringBuilder
      renderNodes(body, env, inner, new Frame(env))
      sb.append(show(eval(chain, env + (FilterBodyRef -> inner.toString))))
      env
    case SetAttrNode(target, attr, e) =>
      env.getOrElse(target, Undefined) match {
        case ns: NamespaceVal =>
          eval(e, env) match {
            case Undefined => throw new IllegalArgumentException(
              s"'{% set $target.$attr %}': assigning an undefined value")
            case v => ns.fields += (attr -> v)
          }
          env // mutation, not rebinding: the env map is unchanged
        case Undefined => throw new IllegalArgumentException(
          s"'{% set $target.$attr %}': '$target' is undefined")
        case other => throw new IllegalArgumentException(
          s"'{% set $target.$attr %}': attribute assignment needs a " +
            s"namespace() object, got ${kind(other)} (jinja2 raises here too)")
      }
    case SetAttrBlockNode(target, attr, body) =>
      env.getOrElse(target, Undefined) match {
        case ns: NamespaceVal =>
          val inner = new StringBuilder
          renderNodes(body, env, inner, new Frame(env))
          ns.fields += (attr -> inner.toString)
          env
        case Undefined => throw new IllegalArgumentException(
          s"'{% set $target.$attr %}': '$target' is undefined")
        case other => throw new IllegalArgumentException(
          s"'{% set $target.$attr %}': attribute assignment needs a " +
            s"namespace() object, got ${kind(other)} (jinja2 raises here too)")
      }
    case MacroNode(name, params, body) =>
      val mv = MacroVal(name, params, body)
      val withSelf = env + (name -> mv)
      mv.defEnv = withSelf
      // the LIVE enclosing scope — later sets in this scope are visible
      // inside the body at call time (jinja2 late binding)
      mv.frame = frame
      withSelf
  }

  private def eval(e: Expr, env: Map[String, Any]): Any = e match {
    case Lit(v) => v
    case Cond(c, t, e) =>
      if (truthy(eval(c, env))) eval(t, env)
      // jinja: an else-less false conditional yields a PLAIN Undefined
      // that renders '' even under strict-undefined — match by yielding
      // the empty string (arithmetic on it still errors, as in jinja)
      else e.map(eval(_, env)).getOrElse("")
    case TestOp(e, name, argE, neg) =>
      val r = applyTest(eval(e, env), name, argE.map(eval(_, env)))
      if (neg) !r else r
    case ListLit(items) => items.map(eval(_, env))
    case DictLit(items) =>
      // VectorMap: insertion order preserved, matching python dicts —
      // .items()/for-iteration order is observable in rendered SQL
      scala.collection.immutable.VectorMap.from(items.map { case (k, v) =>
        val key = eval(k, env) match {
          case Undefined => throw new IllegalArgumentException(
            "dict literal: key evaluated to an undefined value")
          case other => other
        }
        key -> eval(v, env)
      })
    case Ref(n) => env.getOrElse(n, Undefined)
    case Attr(t, n) => eval(t, env) match {
      case ns: NamespaceVal => ns.fields.getOrElse(n, Undefined)
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].getOrElse(n, Undefined)
      // ONLY groupby rows act like jinja's (grouper, list) namedtuple —
      // ordinary 2-lists have no attributes (review finding)
      case g: GroupRow => groupRowField(g, n).getOrElse(Undefined)
      case _ => Undefined
    }
    case IndexOp(t, ie) => (eval(t, env), eval(ie, env)) match {
      // python indexing: negatives count from the end
      case (s: Seq[_], i0: Long) =>
        val i = if (i0 < 0) i0 + s.length else i0
        if (i >= 0 && i < s.length) s(i.toInt) else Undefined
      case (m: Map[_, _], k) =>
        m.asInstanceOf[Map[Any, Any]].getOrElse(k, Undefined)
      case (s: String, i0: Long) =>
        val i = if (i0 < 0) i0 + s.length else i0
        if (i >= 0 && i < s.length) s(i.toInt).toString else Undefined
      case _ => Undefined
    }
    case SliceOp(t, startE, stopE, stepE) =>
      def asIdx(oe: Option[Expr]): Option[Long] = oe.map(e => eval(e, env) match {
        case l: Long => l
        case i: Int => i.toLong
        case other => throw new IllegalArgumentException(
          s"slice bound must be an integer, got ${kind(other)}")
      })
      // python slice index resolution (CPython slice.indices())
      def indices(len: Int): Seq[Int] = {
        val step = asIdx(stepE).getOrElse(1L)
        require(step != 0, "slice step cannot be zero")
        def norm(v: Long, loClamp: Long, hiClamp: Long): Long = {
          val x = if (v < 0) v + len else v
          math.max(loClamp, math.min(hiClamp, x))
        }
        val (start, stop) =
          if (step > 0)
            (asIdx(startE).map(norm(_, 0, len)).getOrElse(0L),
              asIdx(stopE).map(norm(_, 0, len)).getOrElse(len.toLong))
          else
            (asIdx(startE).map(norm(_, -1, len - 1)).getOrElse(len - 1L),
              asIdx(stopE).map(norm(_, -1, len - 1)).getOrElse(-1L))
        val out = scala.collection.mutable.ArrayBuffer.empty[Int]
        var i = start
        while (if (step > 0) i < stop else i > stop) {
          out += i.toInt; i += step
        }
        out.toSeq
      }
      eval(t, env) match {
        case s: Seq[_] => indices(s.length).map(s(_))
        case s: String => indices(s.length).map(s(_)).mkString
        case Undefined => Undefined
        case other => throw new IllegalArgumentException(
          s"cannot slice ${kind(other)}")
      }
    case Un("not", x) => !truthy(eval(x, env))
    case Un("neg", x) => eval(x, env) match {
      case l: Long => -l
      case i: Int => -i.toLong
      case d: Double => -d
      case other => throw new IllegalArgumentException(
        s"cannot negate ${if (other == Undefined) "an undefined value" else other.getClass.getSimpleName}")
    }
    case Un(op, _) => throw new IllegalArgumentException(s"unknown unary op '$op'")
    // and/or return an OPERAND (Python semantics), not a coerced boolean
    case Bin("and", l, r) =>
      val lv = eval(l, env); if (!truthy(lv)) lv else eval(r, env)
    case Bin("or", l, r) =>
      val lv = eval(l, env); if (truthy(lv)) lv else eval(r, env)
    case Bin("~", l, r) => showConcat(eval(l, env)) + showConcat(eval(r, env))
    // arithmetic with Python semantics: ints stay ints (except true
    // division), int/float mixes widen, + concatenates strings and lists
    case Bin(op @ ("+" | "-" | "*" | "/" | "//" | "%"), l, r) =>
      (eval(l, env), eval(r, env), op) match {
        case (a: String, b: String, "+") => a + b
        case (a: Seq[_], b: Seq[_], "+") => a ++ b
        case (a, b, _) if isNum(a) && isNum(b) =>
          (a, b) match {
            case (x: Long, y: Long) if op != "/" => op match {
              case "+" => x + y
              case "-" => x - y
              case "*" => x * y
              case "//" => Math.floorDiv(x, y)
              case _ => Math.floorMod(x, y)
            }
            case _ => op match {
              case "+" => num(a) + num(b)
              case "-" => num(a) - num(b)
              case "*" => num(a) * num(b)
              case "/" => num(a) / num(b)
              case "//" => math.floor(num(a) / num(b))
              case _ => num(a) % num(b)
            }
          }
        case (a, b, _) => throw new IllegalArgumentException(
          s"cannot apply '$op' to ${kind(a)} and ${kind(b)}")
      }
    case Bin("in", l, r) => (eval(l, env), eval(r, env)) match {
      case (x, s: Seq[_]) => s.exists(looseEq(_, x))
      case (x: String, s: String) => s.contains(x)
      case (x, m: Map[_, _]) => m.asInstanceOf[Map[Any, Any]].keys.exists(looseEq(_, x))
      case _ => false
    }
    case Bin("==", l, r) => looseEq(eval(l, env), eval(r, env))
    case Bin("!=", l, r) => !looseEq(eval(l, env), eval(r, env))
    case Bin(op @ ("<" | "<=" | ">" | ">="), l, r) =>
      (eval(l, env), eval(r, env)) match {
        case (Undefined, _) | (_, Undefined) => false
        case (a, b) =>
          val c = (a, b) match {
            case (x: String, y: String) => x.compareTo(y)
            case (x, y) => java.lang.Double.compare(num(x), num(y))
          }
          op match {
            case "<" => c < 0
            case "<=" => c <= 0
            case ">" => c > 0
            case _ => c >= 0
          }
      }
    case Bin(op, _, _) => throw new IllegalArgumentException(s"unknown op '$op'")
    case FilterOp(x, name, args, kwargs) =>
      // VectorMap: python kwargs are insertion-ordered, and the format
      // filter's bare-%s path renders the whole mapping — a plain Map
      // switches to hash order above 4 entries (review finding)
      applyFilter(eval(x, env), name, args.map(eval(_, env)),
        scala.collection.immutable.VectorMap.from(
          kwargs.map { case (k, v) => k -> eval(v, env) }))
    case CallOp(Attr(t, method @ ("items" | "keys" | "values")), Nil, Nil)
        if eval(t, env).isInstanceOf[Map[_, _]] =>
      // dict methods, iteration order = the map's (VectorMap literals
      // preserve insertion order, matching python dicts)
      val m = eval(t, env).asInstanceOf[Map[Any, Any]]
      method match {
        case "items" => m.toSeq.map { case (k, v) => Seq(k, v) }
        case "keys" => m.keys.toSeq
        case "values" => m.values.toSeq
      }
    case CallOp(Ref("range"), args, Nil) if !env.contains("range") =>
      val vals = args.map(a => eval(a, env) match {
        case l: Long => l
        case i: Int => i.toLong
        case other => throw new IllegalArgumentException(
          s"range() arguments must be integers, got ${kind(other)}")
      })
      val (start, stop, step) = vals match {
        case Seq(b) => (0L, b, 1L)
        case Seq(a, b) => (a, b, 1L)
        case Seq(a, b, c) => (a, b, c)
        case _ => throw new IllegalArgumentException(
          s"range() takes 1..3 arguments, got ${vals.length}")
      }
      require(step != 0, "range() step must not be zero")
      val n = if (step > 0) math.max(0L, (stop - start + step - 1) / step)
              else math.max(0L, (start - stop - step - 1) / (-step))
      // jinja's range is a lazy python range; ours materializes — cap it
      // so a template typo cannot OOM the driver
      require(n <= 10000000L,
        s"range() of $n elements exceeds the 10M template cap")
      (0L until n).map(i => start + i * step)
    case CallOp(Ref("dict"), Nil, kwargs) if !env.contains("dict") =>
      scala.collection.immutable.VectorMap.from(
        kwargs.map { case (k, v) => (k: Any) -> eval(v, env) })
    case CallOp(Ref("namespace"), args, kwargs)
        if !env.contains("namespace") =>
      // jinja2.utils.Namespace: namespace(**attrs) or namespace(dict,
      // **attrs) — a user binding named 'namespace' shadows the builtin,
      // hence the env guard (same rule jinja applies to its globals)
      val init = args match {
        case Nil => Map.empty[String, Any]
        case one :: Nil => eval(one, env) match {
          case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
          case other => throw new IllegalArgumentException(
            s"namespace(): positional argument must be a mapping, " +
              s"got ${kind(other)}")
        }
        case _ => throw new IllegalArgumentException(
          "namespace() takes at most one positional (mapping) argument")
      }
      // Seq-concat before the map build: positional-mapping entries first,
      // then kwargs, preserving python's construction order
      new NamespaceVal(scala.collection.immutable.VectorMap.from(
        init.toSeq ++ kwargs.map { case (k, e) => k -> eval(e, env) }))
    case CallOp(t, args, kwargs) => eval(t, env) match {
      case mv @ MacroVal(mname, params, body) =>
        if (args.length > params.length) throw new IllegalArgumentException(
          s"macro '$mname' takes ${params.length} argument(s), " +
            s"got ${args.length} positional")
        val names = params.map(_._1).toSet
        kwargs.foreach { case (k, _) =>
          if (!names.contains(k)) throw new IllegalArgumentException(
            s"macro '$mname' has no parameter '$k'")
        }
        val kwMap = kwargs.toMap
        val macroScope = mv.callEnv
        // the pending {% call %} block belongs to THIS invocation only:
        // consume it BEFORE evaluating arguments, so a macro invoked
        // while computing an argument (`{% call m(g()) %}` → g()) does
        // NOT see `caller` bound (jinja scopes caller strictly to the
        // directly called macro; g() there raises 'no caller defined')
        val callerOpt = pendingCaller.value
        val bound = pendingCaller.withValue(None) {
          params.zipWithIndex.map { case ((p, dflt), i) =>
            if (i < args.length) {
              if (kwMap.contains(p)) throw new IllegalArgumentException(
                s"macro '$mname': parameter '$p' given positionally and by keyword")
              p -> eval(args(i), env)
            } else kwMap.get(p) match {
              case Some(a) => p -> eval(a, env)
              case None => dflt match {
                // defaults evaluate AT CALL TIME in the macro's own scope
                // (jinja2 3.1.6: `set d=1 → macro g(x=d) → set d=2 → g()`
                // renders 2, not 1)
                case Some(d) => p -> eval(d, macroScope)
                case None => throw new IllegalArgumentException(
                  s"macro '$mname': missing required parameter '$p'")
              }
            }
          }
        }
        // free names in the body resolve at CALL TIME against the
        // macro's definition scope — its live frame overlaying the
        // def-site snapshot (jinja2 late binding: sets, rebindings and
        // sibling macros AFTER the definition are visible; the caller's
        // locals are not) — plus its parameters; its own assignments
        // don't escape. Arguments evaluate in the call-site env, as in
        // jinja. Depth-bounded so a self-recursive macro raises cleanly
        // instead of blowing the caller's stack (jinja's RecursionError
        // equivalent).
        if (macroDepth.value >= MaxMacroDepth)
          throw new IllegalArgumentException(
            s"macro recursion deeper than $MaxMacroDepth (macro '$mname' " +
              "calls itself, directly or mutually)")
        val out = new StringBuilder
        // clear the consumed caller for the body too: jinja scopes
        // `caller` to the directly called macro, never to nested calls
        macroDepth.withValue(macroDepth.value + 1) {
          pendingCaller.withValue(None) {
            val bodyEnv = macroScope ++ bound ++
              callerOpt.map(cv => "caller" -> (cv: Any)).toMap
            renderNodes(body, bodyEnv, out, new Frame(bodyEnv))
          }
        }
        out.toString
      case CycleVal(i) =>
        if (args.isEmpty) throw new IllegalArgumentException(
          "loop.cycle() needs at least one argument")
        eval(args((i % args.length).toInt), env)
      case cv: CallerVal =>
        if (kwargs.nonEmpty) throw new IllegalArgumentException(
          "caller() takes positional arguments only")
        if (args.length > cv.params.length) throw new IllegalArgumentException(
          s"caller() takes ${cv.params.length} argument(s), got ${args.length}")
        val bound = cv.params.zip(args.map(eval(_, env))).toMap
        val out = new StringBuilder
        // the block body renders in the CALL-SITE scope (plus the
        // caller(...) arguments), never the macro's — jinja semantics
        val bodyEnv = cv.env ++ bound
        renderNodes(cv.body, bodyEnv, out, new Frame(bodyEnv))
        out.toString
      case Undefined => throw new IllegalArgumentException(
        s"call of undefined macro${t match {
          case Ref(n) => s" '$n'"
          case _ => ""
        }}")
      case other => throw new IllegalArgumentException(
        s"${kind(other)} is not callable")
    }
  }

  private def isIntegral(x: Any): Boolean = x match {
    case _: Long | _: Int | _: Short | _: Byte => true
    case _ => false
  }

  /** jinja tests — shared by `is` expressions and the select/reject
   * filters (which take a test NAME as their argument). */
  private def applyTest(v: Any, name: String, arg: Option[Any]): Boolean =
    name match {
      case "defined" => v != Undefined
      case "undefined" => v == Undefined
      case "none" => v == null
      case "string" => v.isInstanceOf[String]
      case "number" => isNum(v)
      case "integer" => isIntegral(v)
      case "float" => v.isInstanceOf[Double] || v.isInstanceOf[Float]
      case "boolean" => v.isInstanceOf[Boolean]
      case "true" => v == true
      case "false" => v == false
      case "mapping" => v.isInstanceOf[Map[_, _]]
      // jinja: sequence/iterable are true for strings AND mappings too
      // (anything with __len__/__getitem__ / __iter__)
      case "sequence" | "iterable" => v match {
        case _: Seq[_] | _: Array[_] | _: String | _: Map[_, _] => true
        case _ => false
      }
      case "even" =>
        require(isIntegral(v), s"'is even' needs an integer, got ${kind(v)}")
        num(v).toLong % 2 == 0
      case "odd" =>
        require(isIntegral(v), s"'is odd' needs an integer, got ${kind(v)}")
        num(v).toLong % 2 != 0
      case "divisibleby" =>
        val d = arg.getOrElse(throw new IllegalArgumentException(
          "'is divisibleby' needs an argument"))
        require(isIntegral(v) && isIntegral(d),
          s"'is divisibleby' needs integers, got ${kind(v)}/${kind(d)}")
        num(v).toLong % num(d).toLong == 0
      case other => throw new IllegalArgumentException(
        s"unknown test 'is $other'")
    }

  /** groupby row: unpacks, indexes and renders as a 2-seq AND answers
   * .grouper/.list like jinja's namedtuple — as a dedicated type, so
   * those attributes never leak onto ordinary 2-element lists. */
  private final class GroupRow(val key: Any, val items: Any)
      extends scala.collection.immutable.AbstractSeq[Any] {
    def apply(i: Int): Any = if (i == 0) key else if (i == 1) items
      else throw new IndexOutOfBoundsException(i.toString)
    def length: Int = 2
    override def iterator: Iterator[Any] = Iterator(key, items)
  }

  /** jinja's groupby rows are (grouper, list) namedtuples: ONE field map
   * shared by dotted access and the attr filter, so the two surfaces
   * cannot drift (review finding). */
  private def groupRowField(g: GroupRow, name: String): Option[Any] =
    name match {
      case "grouper" => Some(g.key)
      case "list" => Some(g.items)
      case _ => None
    }

  /** Element attribute access for map/sum/sort(attribute=...) — jinja's
   * getattr over dict items / namespaces. */
  private def elemAttr(x: Any, attr: String): Any = x match {
    case m: Map[_, _] => m.asInstanceOf[Map[Any, Any]].getOrElse(attr, Undefined)
    case ns: NamespaceVal => ns.fields.getOrElse(attr, Undefined)
    case other => throw new IllegalArgumentException(
      s"attribute '$attr': ${kind(other)} has no attributes")
  }

  /** Option plumbing for jinja2's do_sort/do_unique/do_min/do_max family:
   * options bind positionally in `names` order or by keyword; an unknown
   * keyword or a doubly-given option is an error (jinja raises TypeError),
   * never a silent no-op — `sort(reverse=true)` quietly sorting ascending
   * is exactly the bug class this guards against. */
  private def filterOpts(fname: String, args: Seq[Any],
      kwargs: Map[String, Any], names: Seq[String]): Map[String, Any] = {
    kwargs.keys.find(k => !names.contains(k)).foreach { k =>
      throw new IllegalArgumentException(
        s"$fname filter got an unexpected keyword argument '$k'")
    }
    if (args.length > names.length) throw new IllegalArgumentException(
      s"$fname filter takes at most ${names.length} option(s), " +
        s"got ${args.length}")
    val pos = names.zip(args).toMap
    pos.keySet.intersect(kwargs.keySet).foreach { k =>
      throw new IllegalArgumentException(
        s"$fname filter got multiple values for argument '$k'")
    }
    pos ++ kwargs
  }

  /** Key extractor for the sort family: `attribute=` pulls the key off
   * each element (none = identity, as jinja accepts). */
  private def sortFamilyKey(fname: String,
      opts: Map[String, Any]): Any => Any =
    opts.get("attribute") match {
      case None | Some(null) | Some(Undefined) => identity
      case Some(a: String) => elemAttr(_, a)
      case Some(other) => throw new IllegalArgumentException(
        s"$fname attribute must be a string, got ${kind(other)}")
    }

  /** Ordering over comparison keys: strings compare by LOWERCASE unless
   * case_sensitive — jinja2's documented default for sort/min/max — and
   * numbers numerically; mixed lists are errors like python's `<`. */
  private def sortFamilyOrdering(fname: String, keys: Seq[Any],
      caseSensitive: Boolean): Ordering[Any] =
    if (keys.forall(_.isInstanceOf[String])) {
      if (caseSensitive) Ordering.by((x: Any) => x.asInstanceOf[String])
      else Ordering.by((x: Any) =>
        x.asInstanceOf[String].toLowerCase(java.util.Locale.ROOT))
    } else if (keys.forall(isNum)) Ordering.by((x: Any) => num(x))
    else throw new IllegalArgumentException(
      s"$fname filter needs uniformly string or numeric comparison keys")

  private def applyFilter(v: Any, name: String, args: Seq[Any],
      kwargs: Map[String, Any] = Map.empty): Any =
    (name, v, args) match {
      // sequence re-shaping filters (jinja: generators need | list; ours
      // are strict, so list is mostly identity — kept for template parity)
      case ("list", s: Seq[_], _) => s
      case ("list", s: String, _) => s.map(_.toString)
      case ("list", m: Map[_, _], _) => m.keys.toSeq
      case ("map", s: Seq[_], fargs) => kwargs.get("attribute") match {
        case Some(a: String) => s.map(elemAttr(_, a))
        case _ =>
          val fname = fargs.headOption match {
            case Some(f: String) => f
            case _ => throw new IllegalArgumentException(
              "map filter needs a filter name or attribute=...")
          }
          s.map(applyFilter(_, fname, fargs.drop(1)))
      }
      case (sel @ ("select" | "reject"), s: Seq[_], fargs) =>
        val keep = (x: Any) => fargs.headOption match {
          case Some(t: String) => applyTest(x, t, fargs.drop(1).headOption)
          case None => truthy(x)
          case Some(other) => throw new IllegalArgumentException(
            s"$sel filter needs a test name, got ${kind(other)}")
        }
        if (sel == "select") s.filter(keep) else s.filterNot(keep)
      case (sel @ ("selectattr" | "rejectattr"), s: Seq[_], fargs) =>
        val attr = fargs.headOption match {
          case Some(a: String) => a
          case _ => throw new IllegalArgumentException(
            s"$sel filter needs an attribute name")
        }
        val keep = (x: Any) => fargs.drop(1).headOption match {
          case Some(t: String) =>
            applyTest(elemAttr(x, attr), t, fargs.drop(2).headOption)
          case None => truthy(elemAttr(x, attr))
          case Some(other) => throw new IllegalArgumentException(
            s"$sel filter needs a test name, got ${kind(other)}")
        }
        if (sel == "selectattr") s.filter(keep) else s.filterNot(keep)
      case ("sum", s: Seq[_], _) if kwargs.contains("attribute") =>
        val a = kwargs("attribute") match {
          case x: String => x
          case other => throw new IllegalArgumentException(
            s"sum attribute must be a string, got ${kind(other)}")
        }
        applyFilter(s.map(elemAttr(_, a)), "sum", Nil)
      case ("upper", s: String, _) => s.toUpperCase(java.util.Locale.ROOT)
      case ("lower", s: String, _) => s.toLowerCase(java.util.Locale.ROOT)
      case ("capitalize", s: String, _) =>
        if (s.isEmpty) s
        else s.head.toUpper.toString +
          s.tail.toLowerCase(java.util.Locale.ROOT)
      case ("title", s: String, _) =>
        // jinja title: capitalize after whitespace AND after the
        // delimiters its regex restarts on ('foo-bar' -> 'Foo-Bar',
        // '(x' -> '(X'); everything else lowered
        "[^-\\s({\\[<]+".r.replaceAllIn(s.toLowerCase(java.util.Locale.ROOT),
          m => java.util.regex.Matcher.quoteReplacement(
            m.matched.head.toUpper.toString + m.matched.tail))
      case ("trim", s: String, _) => s.trim
      case ("replace", s: String, Seq(from, to, _*)) =>
        s.replace(show(from), show(to))
      case ("length", s: String, _) => s.length.toLong
      case ("length", s: Seq[_], _) => s.length.toLong
      case ("length", m: Map[_, _], _) => m.size.toLong
      case ("join", s: Seq[_], sep) =>
        s.map(show).mkString(sep.headOption.map(show).getOrElse(""))
      case ("first", s: Seq[_], _) => s.headOption.getOrElse(Undefined)
      case ("first", s: String, _) => if (s.isEmpty) Undefined else s.head.toString
      case ("last", s: Seq[_], _) => s.lastOption.getOrElse(Undefined)
      case ("last", s: String, _) => if (s.isEmpty) Undefined else s.last.toString
      case ("reverse", s: String, _) => s.reverse
      case ("reverse", s: Seq[_], _) => s.reverse
      // jinja2 do_sort(value, reverse=False, case_sensitive=False,
      // attribute=None): stable; strings key by lowercase unless
      // case_sensitive; reverse goes INTO the ordering so equal keys keep
      // input order (python sorted(reverse=True) semantics, NOT a
      // post-hoc .reverse)
      case ("sort", s: Seq[_], fargs) =>
        val opts = filterOpts("sort", fargs, kwargs,
          Seq("reverse", "case_sensitive", "attribute"))
        val keyFn = sortFamilyKey("sort", opts)
        val keyed = s.map(x => (keyFn(x), x))
        val ord = sortFamilyOrdering("sort", keyed.map(_._1),
          opts.get("case_sensitive").exists(truthy))
        val eff = if (opts.get("reverse").exists(truthy)) ord.reverse else ord
        keyed.sortBy(_._1)(eff).map(_._2)
      case ("sort", s: String, fargs) => // jinja sorts any iterable: chars
        applyFilter(s.map(_.toString), "sort", fargs, kwargs)
      // jinja2 do_unique: keeps FIRST occurrence; equality is
      // case-insensitive for strings unless case_sensitive, and numeric
      // (1 == 1.0) for numbers, like python's ==
      case ("unique", s: Seq[_], fargs) =>
        val opts = filterOpts("unique", fargs, kwargs,
          Seq("case_sensitive", "attribute"))
        val keyFn = sortFamilyKey("unique", opts)
        val cs = opts.get("case_sensitive").exists(truthy)
        val seen = mutable.Set.empty[Any]
        s.filter { x =>
          val k = keyFn(x) match {
            case str: String if !cs => str.toLowerCase(java.util.Locale.ROOT)
            case n if isNum(n) => num(n)
            case other => other
          }
          seen.add(k)
        }
      case (agg @ ("min" | "max"), s: Seq[_], fargs) =>
        val opts = filterOpts(agg, fargs, kwargs,
          Seq("case_sensitive", "attribute"))
        if (s.isEmpty) throw new IllegalArgumentException(
          s"$agg filter: sequence was empty")
        val keyFn = sortFamilyKey(agg, opts)
        val keyed = s.map(x => (keyFn(x), x))
        val ord = sortFamilyOrdering(agg, keyed.map(_._1),
          opts.get("case_sensitive").exists(truthy))
        (if (agg == "min") keyed.minBy(_._1)(ord)
         else keyed.maxBy(_._1)(ord))._2
      // jinja2 do_groupby(value, attribute, default=None,
      // case_sensitive=False): groups sort like the sort filter
      // (case-folded unless case_sensitive), items keep input order, the
      // grouper is the first-seen raw key; rows act as (grouper, list)
      // pairs — unpackable, indexable, and .grouper/.list addressable
      case ("groupby", s: Seq[_], fargs) =>
        val opts = filterOpts("groupby", fargs, kwargs,
          Seq("attribute", "default", "case_sensitive"))
        val attr = opts.get("attribute") match {
          case Some(a: String) => a
          case _ => throw new IllegalArgumentException(
            "groupby filter needs an attribute name")
        }
        val dflt = opts.get("default")
        val cs = opts.get("case_sensitive").exists(truthy)
        val keyed = s.map { x =>
          val k0 = elemAttr(x, attr)
          val k = if (k0 == Undefined && dflt.isDefined) dflt.get else k0
          (k, x)
        }
        def foldK(k: Any): Any = k match {
          case str: String if !cs => str.toLowerCase(java.util.Locale.ROOT)
          case o => o
        }
        val groups = mutable.LinkedHashMap
          .empty[Any, (Any, mutable.ArrayBuffer[Any])]
        keyed.foreach { case (k, x) =>
          groups.getOrElseUpdate(foldK(k), (k, mutable.ArrayBuffer.empty[Any]))
            ._2 += x
        }
        val ord = sortFamilyOrdering("groupby", groups.keys.toSeq,
          caseSensitive = true) // keys pre-folded above
        groups.toSeq.sortBy(_._1)(ord)
          .map { case (_, (raw, items)) => new GroupRow(raw, items.toSeq) }
      // jinja2 do_dictsort(value, case_sensitive=False, by='key',
      // reverse=False) → (key, value) rows in sorted order
      case ("dictsort", m: Map[_, _], fargs) =>
        val opts = filterOpts("dictsort", fargs, kwargs,
          Seq("case_sensitive", "by", "reverse"))
        val by = opts.get("by") match {
          case None => "key"
          case Some("key") => "key"
          case Some("value") => "value"
          case Some(other) => throw new IllegalArgumentException(
            s"dictsort by must be 'key' or 'value', got ${show(other)}")
        }
        val entries = m.asInstanceOf[Map[Any, Any]].toSeq
        val keyOf = (e: (Any, Any)) => if (by == "key") e._1 else e._2
        val ord = sortFamilyOrdering("dictsort", entries.map(keyOf),
          opts.get("case_sensitive").exists(truthy))
        val eff = if (opts.get("reverse").exists(truthy)) ord.reverse else ord
        entries.sortBy(keyOf)(eff).map { case (k, v2) => Seq(k, v2) }
      // jinja2 do_batch(value, linecount, fill_with=None): rows of up to
      // n items; fill pads only the last short row
      case ("batch", s: Seq[_], fargs) =>
        val opts = filterOpts("batch", fargs, kwargs,
          Seq("linecount", "fill_with"))
        val n = opts.get("linecount") match {
          case Some(v) if isNum(v) && num(v) >= 1 => num(v).toInt
          case _ => throw new IllegalArgumentException(
            "batch filter needs a positive linecount")
        }
        val rows = s.grouped(n).map(_.toSeq).toSeq
        opts.get("fill_with") match {
          case Some(f) if rows.nonEmpty && rows.last.length < n =>
            rows.init :+ (rows.last ++ Seq.fill(n - rows.last.length)(f))
          case _ => rows
        }
      // jinja2 do_slice(value, slices, fill_with=None): n columns, the
      // first len%n columns one longer; fill pads the SHORT columns
      case ("slice", s: Seq[_], fargs) =>
        val opts = filterOpts("slice", fargs, kwargs,
          Seq("slices", "fill_with"))
        val n = opts.get("slices") match {
          case Some(v) if isNum(v) && num(v) >= 1 => num(v).toInt
          case _ => throw new IllegalArgumentException(
            "slice filter needs a positive slice count")
        }
        val per = s.length / n
        val extra = s.length % n
        val fill = opts.get("fill_with")
        var off = 0
        (0 until n).map { i =>
          val len = per + (if (i < extra) 1 else 0)
          val col = s.slice(off, off + len)
          off += len
          // jinja pads EVERY column without an extra item — including all
          // of them on an exact split (caught by the randomized corpus)
          if (fill.isDefined && i >= extra) col ++ Seq(fill.get)
          else col
        }
      case ("tojson", v, _) =>
        filterOpts("tojson", Nil, kwargs, Seq.empty)
        toJson(v)
      // jinja2 do_truncate(s, length=255, killwords=False, end='...',
      // leeway=5): strings within length+leeway pass through; otherwise
      // cut at length-|end| (to the last word boundary unless killwords)
      case ("truncate", s: String, fargs) =>
        val opts = filterOpts("truncate", fargs, kwargs,
          Seq("length", "killwords", "end", "leeway"))
        val length = opts.get("length").map(num(_).toInt).getOrElse(255)
        val end = opts.get("end").map(show).getOrElse("...")
        val leeway = opts.get("leeway").map(num(_).toInt).getOrElse(5)
        require(length >= end.length,
          s"truncate length $length shorter than the end marker")
        if (s.length <= length + leeway) s
        else {
          val cut = s.substring(0, length - end.length)
          val kept =
            if (opts.get("killwords").exists(truthy)) cut
            else {
              val i = cut.lastIndexOf(' ')
              if (i >= 0) cut.substring(0, i) else cut
            }
          kept + end
        }
      // jinja counts \w+ RUNS (its _word_re), so 'a-b' is two words —
      // caught by the randomized corpus; (?U) for python's unicode \w
      case ("wordcount", s: String, _) =>
        "(?U)\\w+".r.findAllIn(s).length.toLong
      // jinja2 do_indent(s, width=4, first=False, blank=False)
      case ("indent", s: String, fargs) =>
        val opts = filterOpts("indent", fargs, kwargs,
          Seq("width", "first", "blank"))
        val width = opts.get("width").map(num(_).toInt).getOrElse(4)
        val first = opts.get("first").exists(truthy)
        val blank = opts.get("blank").exists(truthy)
        val prefix = " " * width
        s.split("\n", -1).zipWithIndex.map { case (ln, i) =>
          if (i == 0 && !first) ln
          else if (ln.isEmpty && !blank) ln
          else prefix + ln
        }.mkString("\n")
      case ("center", s: String, fargs) =>
        val opts = filterOpts("center", fargs, kwargs, Seq("width"))
        val width = opts.get("width").map(num(_).toInt).getOrElse(80)
        if (s.length >= width) s
        else { // python str.center: left = marg/2 + (marg & width & 1) —
          // the EXTRA space goes LEFT exactly when margin and width are
          // both odd (CPython stringlib; review finding)
          val marg = width - s.length
          val left = marg / 2 + (marg & width & 1)
          (" " * left) + s + (" " * (marg - left))
        }
      // python %-formatting: positional AND %(name)s named conversions
      // (jinja do_format is `value % (kwargs or args)`); unsupported
      // conversions raise loudly instead of silently diverging
      case ("format", s: String, fargs) => pyFormat(s, fargs, kwargs)
      case ("count", v, fargs) => applyFilter(v, "length", fargs, kwargs)
      // jinja2 do_attr: TRUE attribute access only — never item lookup
      // (a dict key is not an attribute); missing → undefined, so
      // `| attr('x') | default(...)` composes
      case ("attr", v, fargs) =>
        val name = fargs.headOption match {
          case Some(a: String) => a
          case _ => throw new IllegalArgumentException(
            "attr filter needs an attribute name")
        }
        v match {
          case ns: NamespaceVal => ns.fields.getOrElse(name, Undefined)
          // groupby rows are (grouper, list) namedtuples in jinja, so
          // attr() reaches their fields exactly like dotted access does
          case g: GroupRow => groupRowField(g, name).getOrElse(Undefined)
          case _ => Undefined
        }
      case ("sum", s: Seq[_], _) =>
        if (s.forall { case _: Long | _: Int => true; case _ => false })
          s.map { case l: Long => l; case i: Int => i.toLong }.sum
        else if (s.forall(isNum)) s.map(num).sum
        else throw new IllegalArgumentException(
          "sum filter needs a numeric list")
      case ("abs", x, _) if isNum(x) => x match {
        case l: Long => math.abs(l)
        case i: Int => math.abs(i.toLong)
        case _ => math.abs(num(x))
      }
      case ("round", x, a) if isNum(x) =>
        val digits = a.headOption.map {
          case l: Long => l.toInt
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"round precision must be an integer, got $other")
        }.getOrElse(0)
        // jinja's default 'common' method delegates to Python round —
        // banker's rounding (half to EVEN: round(2.5) -> 2), not half-up
        try BigDecimal(num(x))
          .setScale(digits, BigDecimal.RoundingMode.HALF_EVEN)
          .toDouble // jinja round returns float
        catch { case _: NumberFormatException =>
          num(x) // NaN/Infinity pass through like Python round
        }
      case ("int", x, _) => x match {
        case l: Long => l
        case i: Int => i.toLong
        case d: Double => d.toLong
        case f: Float => f.toLong
        case s: String => try s.trim.toLong catch {
          case _: NumberFormatException =>
            try s.trim.toDouble.toLong catch {
              case _: NumberFormatException => 0L // jinja int default
            }
        }
        case true => 1L
        case false => 0L
        case _ => 0L
      }
      case ("float", x, _) => x match {
        case s: String => try s.trim.toDouble catch {
          case _: NumberFormatException => 0.0
        }
        case true => 1.0
        case false => 0.0
        case other => if (isNum(other)) num(other) else 0.0
      }
      case ("string", x, _) => show(x)
      case ("default", Undefined | null, d) => d.headOption.getOrElse("")
      case ("default", x, _) => x
      case (other, x, _) => throw new IllegalArgumentException(
        s"unknown filter '$other' (value: ${x.getClass.getSimpleName})")
    }

  private def truthy(v: Any): Boolean = v match {
    case Undefined | null | false => false
    case "" => false
    case s: Seq[_] => s.nonEmpty
    case m: Map[_, _] => m.nonEmpty
    case l: Long => l != 0L
    case i: Int => i != 0
    case d: Double => d != 0.0
    case _ => true
  }

  private def looseEq(a: Any, b: Any): Boolean = (a, b) match {
    case (Undefined, _) | (_, Undefined) => false
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: String, y: String) => x == y
    case (x: Boolean, y: Boolean) => x == y
    case (x, y) if isNum(x) && isNum(y) => num(x) == num(y)
    case (x, y) => x == y
  }

  private def kind(v: Any): String =
    if (v == Undefined) "an undefined value"
    else if (v == null) "None"
    else v match {
      case _: NamespaceVal => "a namespace"
      case _ => v.getClass.getSimpleName
    }

  private def isNum(v: Any): Boolean = v match {
    case _: Long | _: Int | _: Short | _: Byte | _: Double | _: Float => true
    case _ => false
  }
  private def num(v: Any): Double = v match {
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case d: Double => d
    case f: Float => f.toDouble
    case other => throw new IllegalArgumentException(
      s"cannot compare non-numeric ${other.getClass.getSimpleName}")
  }

  /** Python-`str` style rendering (matches what jinja2 would emit). */
  /** python %-formatting for the `format` filter: `%(name)conv` reads
   * kwargs, bare `%conv` consumes args positionally; flags `-+ 0#`,
   * width, precision; conversions s r d i u f F e E x X o and %%.
   * Mixed positional AND keyword arguments raise, as jinja's do_format
   * does (`value % (kwargs or args)` can't take both); with kwargs only,
   * a bare `%s` formats the whole mapping, python-style. Integer
   * conversions are rendered by hand to python's rules — sign before
   * zeros and prefix (`%08x` of −255 is `-00000ff`, not java's
   * two's-complement), `#` prefixes `0x`/`0X`/`0o`, precision is
   * min-digits, `-` beats `0`, and `0` still pads when a precision is
   * given (python diverges from C there) — all pinned differentially
   * against jinja2 3.1.6. Leftover positional args raise like python's
   * 'not all arguments converted'. %g/%G round the exact binary double
   * to p significant decimal digits half-even and apply the C99
   * fixed-vs-scientific rule with python's trailing-zero stripping,
   * '#' forms and zero-filled specials; %c takes an int code point or a
   * one-character string with space-only padding — both rendered by
   * hand (java diverges on every one of those points) and pinned
   * differentially against jinja2 3.1.6. */
  private def pyFormat(fmt: String, args: Seq[Any],
      kwargs: Map[String, Any]): String = {
    if (args.nonEmpty && kwargs.nonEmpty) throw new IllegalArgumentException(
      "format: can't handle positional and keyword arguments at the same time")
    // python formats `value % mapping` — a bare %s against a mapping
    // consumes the mapping itself as the single positional value
    val posArgs: Seq[Any] = if (kwargs.nonEmpty) Seq(kwargs) else args
    def asLong(v: Any): Long = v match {
      case l: Long => l
      case i: Int => i.toLong
      case b: Boolean => if (b) 1L else 0L
      case d: Double => d.toLong // python %d truncates floats
      case f: Float => f.toLong
      case other => throw new IllegalArgumentException(
        s"format: %d needs a number, got ${kind(other)}")
    }
    val out = new StringBuilder
    var i = 0
    var argi = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c != '%') { out += c; i += 1 }
      else if (i + 1 < fmt.length && fmt.charAt(i + 1) == '%') {
        out += '%'; i += 2
      } else {
        var j = i + 1
        var name: Option[String] = None
        if (j < fmt.length && fmt.charAt(j) == '(') {
          val close = fmt.indexOf(')', j)
          if (close < 0) throw new IllegalArgumentException(
            s"format: unterminated %(name) in '$fmt'")
          name = Some(fmt.substring(j + 1, close)); j = close + 1
        }
        val flagsStart = j
        while (j < fmt.length && "-+ 0#".indexOf(fmt.charAt(j)) >= 0) j += 1
        val flags = fmt.substring(flagsStart, j)
        val wStart = j
        while (j < fmt.length && fmt.charAt(j).isDigit) j += 1
        val width = fmt.substring(wStart, j)
        var prec = ""
        if (j < fmt.length && fmt.charAt(j) == '.') {
          val pStart = j; j += 1
          while (j < fmt.length && fmt.charAt(j).isDigit) j += 1
          prec = fmt.substring(pStart, j)
        }
        if (j >= fmt.length) throw new IllegalArgumentException(
          s"format: truncated conversion in '$fmt'")
        val conv = fmt.charAt(j)
        val v: Any = name match {
          case Some(nm) => kwargs.getOrElse(nm,
            throw new IllegalArgumentException(
              s"format: no keyword argument '$nm'"))
          case None =>
            if (argi >= posArgs.length) throw new IllegalArgumentException(
              "not enough arguments for format string")
            val a = posArgs(argi); argi += 1; a
        }
        // python's integer %-rules, by hand: magnitude digits, then the
        // sign/space/plus, then the # prefix, padded python's way (the
        // sign sits OUTSIDE zero padding; java %x of a negative long
        // would emit two's-complement instead)
        def intPiece(): String = {
          val l = asLong(v)
          val mag = java.math.BigInteger.valueOf(l).abs
          val digits = conv match {
            case 'o' => mag.toString(8)
            case 'x' => mag.toString(16)
            case 'X' => mag.toString(16).toUpperCase
            case _ => mag.toString
          }
          val precN =
            if (prec.isEmpty) -1
            else if (prec == ".") 0
            else prec.drop(1).toInt
          val body =
            if (precN > digits.length) ("0" * (precN - digits.length)) + digits
            else digits
          val sign =
            if (l < 0) "-"
            else if (flags.contains('+')) "+"
            else if (flags.contains(' ')) " "
            else ""
          val prefix = if (flags.contains('#')) (conv match {
            case 'o' => "0o"
            case 'x' => "0x"
            case 'X' => "0X"
            case _ => ""
          }) else ""
          // the 0x/0o prefix sits with the sign, OUTSIDE zero padding
          padNumeric(sign + prefix, body)
        }
        // shared width-padding tail: sign OUTSIDE zero padding ('-'
        // beats '0'), python's rule for every numeric conversion —
        // including %g of inf/nan, which python zero-FILLS ('%010g' of
        // inf is '0000000inf') where C pads with spaces
        def padNumeric(sign: String, body: String): String = {
          val w = if (width.isEmpty) 0 else width.toInt
          val core = sign + body
          if (core.length >= w) core
          else if (flags.contains('-')) core + (" " * (w - core.length))
          else if (flags.contains('0'))
            sign + ("0" * (w - core.length)) + body
          else (" " * (w - core.length)) + core
        }
        // python %g, by hand (java's %g neither strips trailing zeros,
        // nor zero-pads specials python's way, nor honors '#'): round
        // the EXACT binary double to p significant DECIMAL digits
        // half-even (BigDecimal(double) is the exact expansion, so this
        // is the correctly-rounded conversion python/glibc perform),
        // then pick fixed vs scientific by the C99 rule (exponent < -4
        // or >= p), strip trailing zeros unless '#' ('#' also keeps a
        // bare trailing point: '%#.1g' of 9.5 is '1.e+01') — all pinned
        // differentially against jinja2 3.1.6 in TemplateSpec
        def gPiece(): String = {
          val d0 = v match {
            case b: Boolean => if (b) 1.0 else 0.0
            case other => num(other)
          }
          val upper = conv == 'G'
          val p0 =
            if (prec.isEmpty) 6
            else if (prec == ".") 0
            else prec.drop(1).toInt
          val p = math.max(p0, 1) // C: precision 0 means 1
          val neg = d0 < 0 || (d0 == 0.0 && 1.0 / d0 < 0)
          val sign =
            if (neg) "-"
            else if (flags.contains('+')) "+"
            else if (flags.contains(' ')) " "
            else ""
          val alt = flags.contains('#')
          def strip(s: String): String =
            if (!s.contains('.')) s
            else {
              var e = s.length
              while (s.charAt(e - 1) == '0') e -= 1
              if (s.charAt(e - 1) == '.') e -= 1
              s.substring(0, e)
            }
          def dot(s: String): String = if (s.contains('.')) s else s + "."
          val body =
            if (java.lang.Double.isNaN(d0)) { if (upper) "NAN" else "nan" }
            else if (java.lang.Double.isInfinite(d0)) {
              if (upper) "INF" else "inf"
            } else {
              val md = new java.math.BigDecimal(math.abs(d0)).round(
                new java.math.MathContext(p,
                  java.math.RoundingMode.HALF_EVEN))
              val x = md.precision - md.scale - 1 // decimal exponent
              // setScale below only zero-extends (target scale >= the
              // rounded value's), so UNNECESSARY is provably safe
              if (x < -4 || x >= p) {
                val ms0 = md.movePointLeft(x)
                  .setScale(p - 1, java.math.RoundingMode.UNNECESSARY)
                  .toPlainString
                (if (alt) dot(ms0) else strip(ms0)) +
                  (if (upper) "E" else "e") +
                  (if (x < 0) "-" else "+") + f"${math.abs(x)}%02d"
              } else {
                val fx = md.setScale(p - 1 - x,
                  java.math.RoundingMode.UNNECESSARY).toPlainString
                if (alt) dot(fx) else strip(fx)
              }
            }
          padNumeric(sign, body)
        }
        // python %c: an int/bool code point in [0, 0x110000) or a
        // ONE-character string; width pads with SPACES (the '0' flag is
        // ignored — '%05c' of 66 is '    B') counted in code points, so
        // an astral char is width 1 even though it is 2 UTF-16 units
        def cPiece(): String = {
          def fromCode(l: Long): String =
            if (l < 0 || l >= 0x110000) throw new IllegalArgumentException(
              "format: %c arg not in range(0x110000)")
            else new String(Character.toChars(l.toInt))
          val ch = v match {
            case s: String if s.codePointCount(0, s.length) == 1 => s
            case b: Boolean => fromCode(if (b) 1L else 0L)
            case l: Long => fromCode(l)
            case i: Int => fromCode(i.toLong)
            case _ => throw new IllegalArgumentException(
              "format: %c requires int or char")
          }
          val w = if (width.isEmpty) 0 else width.toInt
          val n = ch.codePointCount(0, ch.length)
          if (n >= w) ch
          else if (flags.contains('-')) ch + (" " * (w - n))
          else (" " * (w - n)) + ch
        }
        val jspec = "%" + flags + width + prec
        val piece = conv match {
          case 's' => String.format(jspec + "s", show(v))
          case 'r' => String.format(jspec + "s", repr(v))
          case 'd' | 'i' | 'u' | 'x' | 'X' | 'o' => intPiece()
          case 'g' | 'G' => gPiece()
          case 'c' => cPiece()
          case 'f' | 'F' | 'e' | 'E' =>
            // bool is an int subclass in python: '%f' of True is
            // '1.000000' — coerce before num(), whose comparison-flavored
            // error would otherwise fire (review finding; %g/%c/%d
            // already handle bool)
            val dv = v match {
              case b: Boolean => if (b) 1.0 else 0.0
              case other => num(other)
            }
            String.format(jspec + conv, java.lang.Double.valueOf(dv))
          case other => throw new IllegalArgumentException(
            s"format: unsupported conversion '%$other'")
        }
        out ++= piece
        i = j + 1
      }
    }
    // python raises on leftover positionals only when formatting with
    // the args tuple (kwargs formatting ignores extras)
    if (kwargs.isEmpty && argi < posArgs.length)
      throw new IllegalArgumentException(
        "not all arguments converted during string formatting")
    out.toString
  }

  /** jinja2 `tojson` policy: json.dumps with sort_keys=True plus the
   * HTML-safety escapes (' < > & to \\u00xx) — byte-compatible with the
   * 3.1.6 output for the template-value domain (null/bool/num/str/
   * seq/map/namespace). */
  private def toJson(v: Any): String = v match {
    case null => "null"
    case true => "true"
    case false => "false"
    case Undefined => throw new IllegalArgumentException(
      "tojson of an undefined value")
    case s: String =>
      val sb = new StringBuilder("\"")
      s.foreach {
        case '"' => sb ++= "\\\""
        case '\\' => sb ++= "\\\\"
        case '\n' => sb ++= "\\n"
        case '\r' => sb ++= "\\r"
        case '\t' => sb ++= "\\t"
        case '\b' => sb ++= "\\b" // json.dumps shorthands, not \u0008
        case '\f' => sb ++= "\\f"
        case '\'' => sb ++= "\\u0027"
        case '<' => sb ++= "\\u003c"
        case '>' => sb ++= "\\u003e"
        case '&' => sb ++= "\\u0026"
        // ensure_ascii=True (json.dumps default): every non-ASCII
        // UTF-16 unit escapes, astral chars as surrogate pairs
        case c if c < 0x20 || c > 0x7e => sb ++= f"\\u${c.toInt}%04x"
        case c => sb += c
      }
      (sb += '"').toString
    case s: Seq[_] => s.map(toJson).mkString("[", ", ", "]")
    case m: Map[_, _] =>
      m.asInstanceOf[Map[Any, Any]].toSeq
        .map { case (k, x) => (show(k), x) }
        .sortBy(_._1)
        .map { case (k, x) => toJson(k) + ": " + toJson(x) }
        .mkString("{", ", ", "}")
    case ns: NamespaceVal =>
      ns.fields.toSeq.sortBy(_._1)
        .map { case (k, x) => toJson(k) + ": " + toJson(x) }
        .mkString("{", ", ", "}")
    case other => show(other) // numbers
  }

  private def show(v: Any): String = v match {
    case MacroVal(n, _, _) => s"<macro $n>"
    case null => "None"
    case true => "True"
    case false => "False"
    case s: String => s
    case s: Seq[_] => s.map(repr).mkString("[", ", ", "]")
    case m: Map[_, _] =>
      m.map { case (k, x) => s"${repr(k)}: ${repr(x)}" }.mkString("{", ", ", "}")
    case other => other.toString
  }

  /** `~` coerces like Python str() but rejects None (jinja renders it
   * 'None' too — keep it simple and identical). */
  private def showConcat(v: Any): String = v match {
    case Undefined => throw new IllegalArgumentException(
      "cannot concatenate an undefined value with '~'")
    case other => show(other)
  }

  private def repr(v: Any): String = v match {
    case s: String => "'" + s + "'"
    case other => show(other)
  }
}
