package graft

import graft.sql.{GraftSql, Template}
import org.scalatest.funsuite.AnyFunSuite

/** Jinja-parity cases for the GraftSql template engine (the reference
 * renders FugueSQL through real jinja2 — fugue/sql/_utils.py). Pure JVM,
 * no SparkSession. */
class TemplateSpec extends AnyFunSuite {

  private def r(s: String, p: Map[String, Any] = Map.empty): String =
    Template.render(s, p)

  test("variable output, whitespace forms, verbatim insertion") {
    assert(r("a {{x}} b {{ x }} c", Map("x" -> "V")) === "a V b V c")
    // regex-hostile values insert verbatim (the legacy substituter's pin)
    for (v <- Seq("$1", "\\d", "{{", "}}", "a$\\b"))
      assert(r("pre {{x}} post", Map("x" -> v)) === s"pre $v post")
    // non-string scalars render Python-style
    assert(r("{{n}}|{{f}}|{{t}}|{{z}}", Map("n" -> 7L, "f" -> 2.5,
      "t" -> true, "z" -> null)) === "7|2.5|True|None")
  }

  test("undefined variable raises; single braces and text pass through") {
    val e = intercept[IllegalArgumentException](r("x {{nope}} y"))
    assert(e.getMessage.contains("nope"))
    assert(r("a {not a var} b $c \\d") === "a {not a var} b $c \\d")
    // unterminated opener degrades to literal text
    assert(r("lone {{ brace") === "lone {{ brace")
  }

  test("if / elif / else with comparisons, boolean ops, membership") {
    val t = "{% if n > 10 %}big{% elif n > 5 %}mid{% else %}small{% endif %}"
    assert(r(t, Map("n" -> 20L)) === "big")
    assert(r(t, Map("n" -> 7L)) === "mid")
    assert(r(t, Map("n" -> 1L)) === "small")
    assert(r("{% if a and not b %}y{% endif %}",
      Map("a" -> true, "b" -> false)) === "y")
    assert(r("{% if 'x' in items %}has{% endif %}",
      Map("items" -> Seq("w", "x"))) === "has")
    assert(r("{% if 'q' not in items %}no-q{% endif %}",
      Map("items" -> Seq("w", "x"))) === "no-q")
    // undefined name is FALSY in boolean context (jinja Undefined), while
    // string/number comparisons follow loose numeric equality
    assert(r("{% if missing %}a{% else %}b{% endif %}") === "b")
    assert(r("{% if x == 3 %}eq{% endif %}", Map("x" -> 3.0)) === "eq")
  }

  test("for loops: loop helper, nesting, separators") {
    assert(r("{% for x in xs %}{{ x }};{% endfor %}",
      Map("xs" -> Seq("a", "b"))) === "a;b;")
    assert(r("{% for x in xs %}{{ loop.index }}:{{ x }}" +
      "{% if not loop.last %},{% endif %}{% endfor %}",
      Map("xs" -> Seq("p", "q", "r"))) === "1:p,2:q,3:r")
    // nested loops shadow `loop`
    assert(r("{% for a in xs %}{% for b in ys %}{{ loop.index0 }}{% endfor %}" +
      "|{% endfor %}", Map("xs" -> Seq(1L, 2L), "ys" -> Seq("u", "v")))
      === "01|01|")
    // inline list literal
    assert(r("{% for c in ['x', 'y'] %}{{ c }}{% endfor %}") === "xy")
    val e = intercept[IllegalArgumentException](
      r("{% for x in nope %}{{x}}{% endfor %}"))
    assert(e.getMessage.contains("for"))
  }

  test("attribute/index access and filters") {
    assert(r("{{ cfg.table }}", Map("cfg" -> Map("table" -> "docs"))) === "docs")
    assert(r("{{ xs[1] }}", Map("xs" -> Seq("a", "b"))) === "b")
    assert(r("{{ s | upper }}-{{ s | length }}", Map("s" -> "ab")) === "AB-2")
    assert(r("{{ xs | join(', ') }}", Map("xs" -> Seq("a", "b"))) === "a, b")
    assert(r("{{ missing | default('dflt') }}") === "dflt")
    assert(r("{{ xs | first }}{{ xs | last }}", Map("xs" -> Seq("a", "b"))) === "ab")
    assert(r("{{ a ~ '_' ~ n }}", Map("a" -> "x", "n" -> 3L)) === "x_3")
  }

  test("arithmetic: python semantics (ints stay ints, / is true division)") {
    assert(r("{{ n + 1 }}|{{ n - 1 }}|{{ n * 2 }}", Map("n" -> 3L)) === "4|2|6")
    assert(r("{{ 7 / 2 }}|{{ 7 // 2 }}|{{ 7 % 2 }}") === "3.5|3|1")
    assert(r("{{ -n }}|{{ 2 + 3 * 4 }}|{{ (2 + 3) * 4 }}", Map("n" -> 5L))
      === "-5|14|20")
    assert(r("{{ 'a' + 'b' }}") === "ab")
    assert(r("{% if xs | length - 1 == 1 %}two{% endif %}",
      Map("xs" -> Seq("p", "q"))) === "two")
  }

  test("raw blocks, comments, whitespace control") {
    assert(r("a {% raw %}{{ not rendered }}{% endraw %} b") ===
      "a {{ not rendered }} b")
    assert(r("a {# note #}b") === "a b")
    assert(r("x\n  {%- if true %} y {%- endif %}") === "x y")
    assert(r("{{ x -}}   z", Map("x" -> "w")) === "wz")
  }

  test("quoted {%}-only literals are protected like _utils.py") {
    // a quoted '{%' must not open a tag (fugue/sql/_utils.py:11,26-33)
    assert(r("SELECT '{%' AS t FROM x") === "SELECT '{%' AS t FROM x")
    assert(r("""SELECT "%}" AS t""") === """SELECT "%}" AS t""")
    assert(r("a '{}' b {{v}}", Map("v" -> "k")) === "a '{}' b k")
  }

  test("extended filter set matches jinja semantics") {
    assert(r("{{ 'wOrLd hi' | capitalize }}") === "World hi")
    assert(r("{{ 'wOrLd hi there' | title }}") === "World Hi There")
    // jinja's title regex restarts after hyphens/brackets, not only
    // whitespace: 'foo-bar' -> 'Foo-Bar', '(x y' -> '(X Y'
    assert(r("{{ 'foo-bar (baz [qux' | title }}") === "Foo-Bar (Baz [Qux")
    assert(r("{{ '  x  ' | trim }}|{{ 'a-b-c' | replace('-', '+') }}")
      === "x|a+b+c")
    assert(r("{{ xs | reverse | join(',') }}|{{ 'abc' | reverse }}",
      Map("xs" -> Seq(1L, 2L, 3L))) === "3,2,1|cba")
    assert(r("{{ xs | sort | join('') }}{{ ys | sort | join(',') }}",
      Map("xs" -> Seq("b", "a", "c"), "ys" -> Seq(3L, 1L, 2L)))
      === "abc1,2,3")
    assert(r("{{ xs | unique | join(',') }}",
      Map("xs" -> Seq(1L, 2L, 1L, 3L, 2L))) === "1,2,3")
    assert(r("{{ xs | min }}-{{ xs | max }}-{{ xs | sum }}",
      Map("xs" -> Seq(4L, 1L, 3L))) === "1-4-8")
    // sum of ints stays int; mixed numerics widen
    assert(r("{{ xs | sum }}", Map("xs" -> Seq(1L, 2.5))) === "3.5")
    // jinja gotcha preserved: filters bind tighter than unary minus, so
    // -3|abs is -(3|abs) = -3; parenthesize to take abs of the negative.
    // round is BANKER'S (Python round: 2.5 -> 2, 3.5 -> 4), like jinja's
    // default 'common' method
    assert(r("{{ -3 | abs }}|{{ (-3) | abs }}|{{ 2.5666 | round(2) }}|{{ 2.5 | round }}|{{ 3.5 | round }}")
      === "-3|3|2.57|2.0|4.0")
    assert(r("{{ '42' | int }}|{{ '4.9' | int }}|{{ 'junk' | int }}|{{ 3.9 | int }}")
      === "42|4|0|3")
    assert(r("{{ '2.5' | float }}|{{ true | float }}|{{ 'x' | float }}")
      === "2.5|1.0|0.0")
    assert(r("{{ 7 | string ~ '!' }}") === "7!")
    // filters compose left to right
    assert(r("{{ xs | sort | first }}", Map("xs" -> Seq("c", "a"))) === "a")
    intercept[IllegalArgumentException](r("{{ xs | sort }}",
      Map("xs" -> Seq(1L, "a"))))
  }

  test("sort/unique/min/max options match jinja2 3.1.6 (differentially pinned)") {
    // sort(reverse=) honored — kwarg AND jinja's positional form
    assert(r("{{ xs | sort(reverse=true) | join(',') }}",
      Map("xs" -> Seq(3L, 1L, 2L))) === "3,2,1")
    assert(r("{{ xs | sort(true) | join(',') }}",
      Map("xs" -> Seq(3L, 1L, 2L))) === "3,2,1")
    // jinja default string sort is CASE-INSENSITIVE and stable:
    // ['b','A','a','B'] → ['A','a','b','B'] (pinned against 3.1.6)
    assert(r("{{ xs | sort | join('') }}",
      Map("xs" -> Seq("b", "A", "a", "B"))) === "AabB")
    assert(r("{{ xs | sort(case_sensitive=true) | join('') }}",
      Map("xs" -> Seq("B", "a"))) === "Ba")
    // reverse goes INTO the comparator: equal keys keep input order
    // (['b','B','a'] reversed → ['b','B','a'], NOT ['B','b','a'])
    assert(r("{{ xs | sort(reverse=true) | join('') }}",
      Map("xs" -> Seq("b", "B", "a"))) === "bBa")
    // positional (reverse, case_sensitive, attribute) all at once
    assert(r("{{ xs | sort(false, false, 'k') | map(attribute='v') | join('') }}",
      Map("xs" -> Seq(Map("k" -> 2L, "v" -> "b"), Map("k" -> 1L, "v" -> "a"))))
      === "ab")
    // strings sort as char lists, like any python iterable
    assert(r("{{ 'hello' | sort | join('') }}") === "ehllo")
    // unknown / doubly-given options raise (jinja: TypeError), never
    // silently drop — the advisor's sort(reverse=) bug class
    intercept[IllegalArgumentException](r("{{ xs | sort(bogus=true) }}",
      Map("xs" -> Seq(1L, 2L))))
    intercept[IllegalArgumentException](r("{{ xs | sort(true, reverse=true) }}",
      Map("xs" -> Seq(1L, 2L))))
    // unique: case-insensitive by default, keeps FIRST occurrence;
    // numeric equality is python == (1 == 1.0)
    assert(r("{{ xs | unique | join('') }}",
      Map("xs" -> Seq("b", "A", "a", "B"))) === "bA")
    assert(r("{{ xs | unique(case_sensitive=true) | join('') }}",
      Map("xs" -> Seq("a", "A", "b"))) === "aAb")
    assert(r("{{ xs | unique | join(',') }}",
      Map("xs" -> Seq[Any](1L, 1.0, 2L))) === "1,2")
    assert(r("{{ xs | unique(attribute='k') | map(attribute='v') | join('') }}",
      Map("xs" -> Seq(Map("k" -> 1L, "v" -> "a"), Map("k" -> 1L, "v" -> "b"),
        Map("k" -> 2L, "v" -> "c")))) === "ac")
    // min/max: case-insensitive by default too ('a' beats 'B' both ways)
    assert(r("{{ xs | min }},{{ xs | max }}",
      Map("xs" -> Seq("B", "a"))) === "a,B")
    assert(r("{{ xs | min(case_sensitive=true) }}",
      Map("xs" -> Seq("B", "a"))) === "B")
    assert(r("{{ (xs | max(attribute='k'))['v'] }}",
      Map("xs" -> Seq(Map("k" -> 1L, "v" -> "a"), Map("k" -> 2L, "v" -> "b"))))
      === "b")
  }

  test("groupby/dictsort/batch/slice match jinja2 3.1.6 (differentially pinned)") {
    val xs = Seq(
      Map("k" -> "b", "v" -> 1L), Map("k" -> "a", "v" -> 2L),
      Map("k" -> "a", "v" -> 3L))
    assert(r("{% for g, items in xs | groupby('k') %}[{{ g }}:" +
      "{% for i in items %}{{ i.v }}{% endfor %}]{% endfor %}",
      Map("xs" -> xs)) === "[a:23][b:1]")
    assert(r("{{ (xs | groupby('k'))[0][0] }}", Map("xs" -> xs)) === "a")
    assert(r("{% for g in xs | groupby('k') %}{{ g.grouper }}:" +
      "{{ g.list | length }};{% endfor %}", Map("xs" -> xs)) === "a:2;b:1;")
    // default case-insensitive group sort; case_sensitive flips it
    val mixed = Seq(Map("k" -> "B"), Map("k" -> "a"), Map("k" -> "B"))
    assert(r("{% for g, it in xs | groupby('k') %}[{{ g }}:{{ it | length }}]{% endfor %}",
      Map("xs" -> mixed)) === "[a:1][B:2]")
    assert(r("{% for g, it in xs | groupby('k', case_sensitive=true) %}[{{ g }}]{% endfor %}",
      Map("xs" -> Seq(Map("k" -> "B"), Map("k" -> "a")))) === "[B][a]")
    // numeric group keys sort numerically
    assert(r("{% for g, it in xs | groupby('k') %}[{{ g }}]{% endfor %}",
      Map("xs" -> Seq(Map("k" -> 2L), Map("k" -> 1L)))) === "[1][2]")
    // dictsort: (k, v) rows; case-insensitive keys; by=value; reverse
    assert(r("{% for k, v in d | dictsort %}{{ k }}={{ v }};{% endfor %}",
      Map("d" -> Map("B" -> 1L, "a" -> 2L))) === "a=2;B=1;")
    assert(r("{% for k, v in d | dictsort(true) %}{{ k }};{% endfor %}",
      Map("d" -> Map("B" -> 1L, "a" -> 2L))) === "B;a;")
    assert(r("{% for k, v in d | dictsort(by='value') %}{{ k }};{% endfor %}",
      Map("d" -> Map("b" -> 1L, "a" -> 2L))) === "b;a;")
    assert(r("{% for k, v in d | dictsort(reverse=true) %}{{ k }};{% endfor %}",
      Map("d" -> Map("b" -> 1L, "a" -> 2L))) === "b;a;")
    // batch fills only the last row; slice gives the first len%n columns
    // one extra and fills the SHORT columns
    assert(r("{% for row in xs | batch(2) %}[{{ row | join(',') }}]{% endfor %}",
      Map("xs" -> Seq(1L, 2L, 3L, 4L, 5L))) === "[1,2][3,4][5]")
    assert(r("{% for row in xs | batch(2, 0) %}[{{ row | join(',') }}]{% endfor %}",
      Map("xs" -> Seq(1L, 2L, 3L))) === "[1,2][3,0]")
    assert(r("{% for c in xs | slice(3) %}[{{ c | join(',') }}]{% endfor %}",
      Map("xs" -> Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))) === "[1,2,3][4,5][6,7]")
    assert(r("{% for c in xs | slice(3, 0) %}[{{ c | join(',') }}]{% endfor %}",
      Map("xs" -> Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))) === "[1,2,3][4,5,0][6,7,0]")
    // exact split: jinja pads EVERY column (none has the extra item)
    assert(r("{% for c in xs | slice(3, 0) %}[{{ c | join(',') }}]{% endfor %}",
      Map("xs" -> Seq(1L, 2L, 3L, 4L, 5L, 6L))) === "[1,2,0][3,4,0][5,6,0]")
    intercept[IllegalArgumentException](r("{{ xs | groupby('k', bogus=1) }}",
      Map("xs" -> xs)))
  }

  test("tojson/truncate/wordcount/indent/center/format/count/attr match jinja2") {
    // tojson: sort_keys, HTML-safety escapes, python literals
    assert(r("{{ d | tojson }}",
      Map("d" -> Map("b" -> Seq(1L, 2L), "a" -> "x\"y")))
      === "{\"a\": \"x\\\"y\", \"b\": [1, 2]}")
    assert(r("{{ xs | tojson }}",
      Map("xs" -> Seq[Any](1L, 2.5, true, null, "s")))
      === "[1, 2.5, true, null, \"s\"]")
    assert(r("{{ s | tojson }}", Map("s" -> "a'<b>&c"))
      === "\"a\\u0027\\u003cb\\u003e\\u0026c\"")
    // truncate: leeway keeps near-misses whole; word-boundary cut;
    // killwords; custom end; no-space fallback
    assert(r("{{ 'hello world foo bar' | truncate(12) }}") === "hello...")
    assert(r("{{ 'hello world foo b' | truncate(12) }}") === "hello world foo b")
    assert(r("{{ 'hello world foo b' | truncate(12, leeway=0) }}") === "hello...")
    assert(r("{{ 'hello world foo bar' | truncate(12, True) }}") === "hello wor...")
    assert(r("{{ 'aaaaaaaaaaaaaaaaaaaa' | truncate(12) }}") === "aaaaaaaaa...")
    assert(r("{{ 'short' | truncate(12) }}") === "short")
    assert(r("{{ 'hello  world foo' | wordcount }}") === "3")
    // indent: first line and blank lines untouched by default
    assert(r("{{ s | indent(2) }}", Map("s" -> "a\n\nb")) === "a\n\n  b")
    assert(r("{{ s | indent(2, False, True) }}", Map("s" -> "a\n\nb"))
      === "a\n  \n  b")
    assert(r("{{ s | indent(2, True) }}", Map("s" -> "a\nb")) === "  a\n  b")
    assert(r("{{ 'abc' | center(6) }}|") === " abc  |")
    // python str.center: the EXTRA space goes LEFT when margin and width
    // are both odd (review finding, verified against CPython)
    assert(r("{{ 'ab' | center(5) }}|") === "  ab |")
    assert(r("{{ 'ab' | center(7) }}|") === "   ab  |")
    assert(r("{{ 'abc' | center(8) }}|") === "  abc   |")
    assert(r("{{ '%05d|%.2f|%%' | format(42, 2.5) }}") === "00042|2.50|%")
    assert(r("{{ '%s=%d' | format('x', 7) }}") === "x=7")
    // named %-formatting reads kwargs; %i works; hex/octal/sci; leftover
    // positionals raise like python (all verified against jinja2 3.1.6)
    assert(r("{{ '%(a)s=%(b)d' | format(a='x', b=7) }}") === "x=7")
    assert(r("{{ '%i' | format(42) }}") === "42")
    assert(r("{{ '%-5d|' | format(3) }}") === "3    |")
    assert(r("{{ '%x %o %e' | format(255, 8, 12345.678) }}")
      === "ff 10 1.234568e+04")
    assert(r("{{ '%.3s' | format('hello') }}") === "hel")
    intercept[IllegalArgumentException](r("{{ '%s %s' | format(1) }}"))
    intercept[IllegalArgumentException](r("{{ '%s' | format(1, 2) }}"))
    // negative integers sign OUTSIDE zero padding and # prefixes; python
    // zero-pads to width even WITH a precision — all jinja2-3.1.6-pinned
    // (the r11 advice finding: java %x of a negative long would emit
    // two's-complement ffffffffffffff01)
    assert(r("{{ '%x,%X,%o' | format(-255, -255, -8) }}") === "-ff,-FF,-10")
    assert(r("{{ '%08x' | format(-255) }}") === "-00000ff")
    assert(r("{{ '%8x|%-8x|' | format(-255, -255) }}")
      === "     -ff|-ff     |")
    assert(r("{{ '%#x %#o %#X' | format(-255, 255, 255) }}")
      === "-0xff 0o377 0XFF")
    assert(r("{{ '%#010x %010.4x %08.4d' | format(255, 255, -42) }}")
      === "0x000000ff 00000000ff -0000042")
    assert(r("{{ '%+x % x %+.4d' | format(255, 255, 42) }}")
      === "+ff  ff +0042")
    assert(r("{{ '%x' | format(n) }}",
      Map("n" -> Long.MinValue)) === "-8000000000000000")
    // %g: C99 fixed-vs-scientific switch, trailing-zero strip, half-even
    // rounding of the EXACT binary double, '#' forms, python's
    // zero-filled specials — every expected string is python3/jinja2
    // 3.1.6 output, captured verbatim
    assert(r("{{ '%g %g %g' | format(3.14159, 123456.0, 1234567.0) }}")
      === "3.14159 123456 1.23457e+06")
    assert(r("{{ '%g %g %g' | format(0.0001, 0.00001, 150000000.0) }}")
      === "0.0001 1e-05 1.5e+08")
    // 999999.5 and 1234565.0 round HALF-EVEN at 6 significant digits
    assert(r("{{ '%g %g' | format(999999.5, 1234565.0) }}")
      === "1e+06 1.23456e+06")
    assert(r("{{ '%.3g %.1g %.0g' | format(100.5, 9.5, 123.456) }}")
      === "100 1e+01 1e+02")
    // '#' keeps trailing zeros and the bare point
    assert(r("{{ '%#g|%#g|%#.1g' | format(123456.0, 0.0001, 9.5) }}")
      === "123456.|0.000100000|1.e+01")
    assert(r("{{ '%010g|%10.2g|%-10gX' | format(150000000.0, 123456.0, 3.14159) }}")
      === "0001.5e+08|   1.2e+05|3.14159   X")
    assert(r("{{ '%G %G' | format(0.00001, 1234567.0) }}")
      === "1E-05 1.23457E+06")
    assert(r("{{ '%g %g %+g % g' | format(0.0, -0.0, 5.0, 5.0) }}")
      === "0 -0 +5  5")
    assert(r("{{ '%#.1g %g' | format(0.0, 5) }}") === "0. 5")
    // exact-binary rounding: 0.1 at 17 significant digits shows the
    // double's true decimal expansion
    assert(r("{{ '%.17g' | format(0.1) }}") === "0.10000000000000001")
    // specials zero-FILL (python diverges from C's space padding) and
    // take sign flags
    assert(r("{{ '%g %G %010g %+010g %+g' | format(nan, inf, inf, inf, nan) }}",
      Map("nan" -> Double.NaN, "inf" -> Double.PositiveInfinity))
      === "nan INF 0000000inf +000000inf +nan")
    assert(r("{{ '%g %010g' | format(ninf, ninf) }}",
      Map("ninf" -> Double.NegativeInfinity)) === "-inf -000000inf")
    // %c: int code point (astral included, width counted in code
    // points), one-char string, bool; the 0 flag pads with SPACES
    assert(r("{{ '%c%c' | format(65, 'A') }}") === "AA")
    assert(r("{{ '%c' | format(128512) }}") === "😀")
    assert(r("{{ '%5c|%-5c|%05c|' | format(128512, 66, 66) }}")
      === "    😀|B    |    B|")
    assert(r("{{ '%c' | format(true) }}") === "\u0001")
    // bool is an int subclass in python: every numeric conversion takes it
    assert(r("{{ '%f' | format(true) }}") === "1.000000")
    assert(r("{{ '%.1e' | format(false) }}") === "0.0e+00")
    intercept[IllegalArgumentException](r("{{ '%c' | format('AB') }}"))
    intercept[IllegalArgumentException](r("{{ '%c' | format('') }}"))
    intercept[IllegalArgumentException](r("{{ '%c' | format(-1) }}"))
    intercept[IllegalArgumentException](r("{{ '%c' | format(1114112) }}"))
    intercept[IllegalArgumentException](r("{{ '%c' | format(65.5) }}"))
    // mixed positional + keyword args raise, as jinja's do_format does
    // (`value % (kwargs or args)` can't take both)
    intercept[IllegalArgumentException](
      r("{{ '%(a)s %s' | format(1, a=2) }}"))
    // kwargs-only with a bare %s formats the whole mapping, python-style,
    // in INSERTION order even past 4 entries where a plain scala Map
    // would switch to hash order (review finding)
    assert(r("{{ '%s' | format(a=1) }}") === "{'a': 1}")
    assert(r("{{ '%s' | format(e=5, a=1, d=4, b=2, c=3) }}")
      === "{'e': 5, 'a': 1, 'd': 4, 'b': 2, 'c': 3}")
    // tojson is ensure_ascii like json.dumps: non-ASCII escapes, astral
    // chars as surrogate pairs, \b/\f shorthands (review finding)
    assert(r("{{ s | tojson }}", Map("s" -> "café")) === "\"caf\\u00e9\"")
    assert(r("{{ s | tojson }}", Map("s" -> "a\bb\fc")) === "\"a\\bb\\fc\"")
    assert(r("{{ s | tojson }}", Map("s" -> "😀"))
      === "\"\\ud83d\\ude00\"")
    // .grouper must NOT leak onto ordinary 2-lists (review finding —
    // jinja: 'list object has no attribute grouper')
    intercept[IllegalArgumentException](r("{{ ys.grouper }}",
      Map("ys" -> Seq(10L, 20L))))
    assert(r("{{ xs | count }}", Map("xs" -> Seq(1L, 2L, 3L))) === "3")
    // attr is TRUE attribute access: dict keys are NOT attributes
    // (jinja raises on use under StrictUndefined; default() composes)
    intercept[IllegalArgumentException](r("{{ d | attr('a') }}",
      Map("d" -> Map("a" -> 5L))))
    assert(r("{{ d | attr('a') | default(0) }}",
      Map("d" -> Map("a" -> 5L))) === "0")
    assert(r("{% set ns = namespace(a=7) %}{{ ns | attr('a') }}") === "7")
    // attr reaches groupby rows' namedtuple fields exactly like dotted
    // access (r11 advice finding: attr returned Undefined for GroupRow)
    val rs = Seq(Map("k" -> "b", "v" -> 2L), Map("k" -> "a", "v" -> 1L),
      Map("k" -> "b", "v" -> 3L))
    assert(r("{% for g in rs | groupby('k') %}" +
      "{{ g | attr('grouper') }}:{{ g | attr('list') | length }};" +
      "{% endfor %}", Map("rs" -> rs)) === "a:1;b:2;")
    assert(r("{{ rs | groupby('k') | first | attr('nope') | default('D') }}",
      Map("rs" -> rs)) === "D")
  }

  test("malformed number literals raise SyntaxError, not NumberFormatException") {
    // '1.2.3' lexes greedily over both dots; the one-exception contract
    // (everything surfaces as the documented IllegalArgumentException
    // family) must hold so the protected-form retry path stays sound
    val e = intercept[IllegalArgumentException](r("{{ 1.2.3 }}"))
    assert(e.getMessage.contains("malformed number literal"))
    intercept[IllegalArgumentException](r("{% if 1.2.3 > 1 %}x{% endif %}"))
  }

  test("caller is scoped to the directly called macro, not to arg evaluation") {
    // jinja2: in {% call m(g()) %}, g() runs while EVALUATING m's
    // arguments and must NOT see `caller` (3.1.6 raises 'No caller
    // defined'); only m's body gets it
    val tpl = "{% macro g() %}{{ caller() }}{% endmacro %}" +
      "{% macro m(x) %}[{{ x }}]{% endmacro %}" +
      "{% call m(g()) %}BODY{% endcall %}"
    intercept[IllegalArgumentException](r(tpl))
    // the happy path: the outer macro's body does see the block
    val ok = "{% macro g() %}G{% endmacro %}" +
      "{% macro m(x) %}[{{ x }}|{{ caller() }}]{% endmacro %}" +
      "{% call m(g()) %}BODY{% endcall %}"
    assert(r(ok) === "[G|BODY]")
  }

  test("set: expression and block forms, jinja scoping") {
    assert(r("{% set x = 1 + 2 %}{{ x }}") === "3")
    assert(r("{% set x = a ~ '_t' %}{{ x }}|{{ x | upper }}",
      Map("a" -> "ab")) === "ab_t|AB_T")
    // set shadows a param for the rest of the template
    assert(r("{{ x }}{% set x = 9 %}{{ x }}", Map("x" -> 1L)) === "19")
    // if-blocks are not scopes: assignment inside the taken branch leaks
    assert(r("{% if true %}{% set x = 'in' %}{% endif %}{{ x }}") === "in")
    // for bodies ARE scopes: per-iteration set does not escape
    assert(r("{% set x = 'out' %}{% for i in [1, 2] %}{% set x = i %}" +
      "{{ x }}{% endfor %}{{ x }}") === "12out")
    // block form captures rendered output
    assert(r("{% set q %}a={{ n }}{% endset %}[{{ q }}]",
      Map("n" -> 5L)) === "[a=5]")
    // assigning an undefined value raises; referencing before set raises
    assert(intercept[IllegalArgumentException](
      r("{% set x = nope %}{{ x }}")).getMessage.contains("undefined"))
    assert(intercept[IllegalArgumentException](
      r("{{ x }}{% set x = 1 %}")).getMessage.contains("x"))
    // unterminated block form raises
    assert(intercept[IllegalArgumentException](
      r("{% set x %}body")).getMessage.contains("endset"))
  }

  test("macro: params, defaults, keyword args, scoping, errors") {
    val m = "{% macro sel(t, cols='*') %}SELECT {{ cols }} FROM {{ t }}{% endmacro %}"
    assert(r(s"$m{{ sel('a') }}") === "SELECT * FROM a")
    assert(r(s"$m{{ sel('a', 'x, y') }}") === "SELECT x, y FROM a")
    assert(r(s"$m{{ sel(cols='z', t='b') }}") === "SELECT z FROM b")
    // macros are CLOSURES over their definition env (jinja2): globals
    // and sets made BEFORE the definition are visible; their own sets
    // don't escape
    assert(r("{% macro g() %}{{ v }}{% set h = 1 %}{% endmacro %}" +
      "{{ g() }}", Map("v" -> "V")) === "V")
    assert(r("{% set v = 'S' %}{% macro g() %}{{ v }}{% endmacro %}" +
      "{{ g() }}") === "S")
    assert(intercept[IllegalArgumentException](
      r("{% macro g() %}{% set h = 1 %}{% endmacro %}{{ g() }}{{ h }}"))
      .getMessage.contains("h"))
    // free names are LATE-BOUND against the definition scope's live
    // frame (differentially verified on jinja2 3.1.6): a set AFTER the
    // definition is visible at call time...
    assert(r("{% macro g() %}{{ v }}{% endmacro %}{% set v = 'X' %}" +
      "{{ g() }}") === "X")
    // ...a rebinding renders the value current at each call...
    assert(r("{% set v = 'old' %}{% macro g() %}{{ v }}{% endmacro %}" +
      "{% set v = 'new' %}{{ g() }}") === "new")
    assert(r("{% set v = 'A' %}{% macro g() %}{{ v }}{% endmacro %}" +
      "{{ g() }}|{% set v = 'B' %}{{ g() }}") === "A|B")
    // ...param defaults evaluate at call time in the macro's scope...
    assert(r("{% set d = 1 %}{% macro g(x=d) %}{{ x }}{% endmacro %}" +
      "{% set d = 2 %}{{ g() }}") === "2")
    // ...a macro defined later is callable from an earlier macro's body...
    assert(r("{% macro a() %}{{ b() }}{% endmacro %}" +
      "{% macro b() %}B{% endmacro %}{{ a() }}") === "B")
    // ...a macro defined inside a loop sees its def-site loop variable
    // (jinja2 renders '12')...
    assert(r("{% for i in [1, 2] %}{% macro g() %}{{ i }}{% endmacro %}" +
      "{{ g() }}{% endfor %}") === "12")
    // ...a set taken inside an if-branch escapes (if is not a scope) and
    // is visible to a macro defined before the branch...
    assert(r("{% macro g() %}{{ v }}{% endmacro %}" +
      "{% if true %}{% set v = 'I' %}{% endif %}{{ g() }}") === "I")
    // ...but the CALLER's locals stay invisible: a loop-body set never
    // reaches a macro defined outside the loop (jinja2's lenient
    // Undefined renders ''; graft's strict-undefined policy raises —
    // the one deliberate divergence, fail-fast beats silent empty SQL)
    assert(intercept[IllegalArgumentException](
      r("{% macro g() %}{{ s }}{% endmacro %}{% for i in [1] %}" +
        "{% set s = 'L' %}{{ g() }}{% endfor %}"))
      .getMessage.contains("s"))
    // macros compose with loops and other macros
    assert(r("{% macro two(x) %}{{ x }}{{ x }}{% endmacro %}" +
      "{% for c in ['a', 'b'] %}{{ two(c) }}{% endfor %}") === "aabb")
    // call errors: missing required, unknown kw, double bind, not callable
    assert(intercept[IllegalArgumentException](
      r(s"$m{{ sel() }}")).getMessage.contains("missing required"))
    assert(intercept[IllegalArgumentException](
      r(s"$m{{ sel('a', bogus=1) }}")).getMessage.contains("bogus"))
    assert(intercept[IllegalArgumentException](
      r(s"$m{{ sel('a', t='b') }}")).getMessage.contains("positionally"))
    assert(intercept[IllegalArgumentException](
      r("{{ v(1) }}", Map("v" -> 3L))).getMessage.contains("not callable"))
    assert(intercept[IllegalArgumentException](
      r("{{ nope(1) }}")).getMessage.contains("undefined macro"))
    // parse errors: required-after-default, unterminated
    assert(intercept[IllegalArgumentException](
      r("{% macro bad(a=1, b) %}{% endmacro %}"))
      .getMessage.contains("required parameter after"))
    assert(intercept[IllegalArgumentException](
      r("{% macro g() %}x")).getMessage.contains("endmacro"))
  }

  test("review regressions: truncated exprs, multi-line set, recursion, empty min") {
    // trailing comma / truncated call args raise cleanly, never an
    // IndexOutOfBounds escape
    for (bad <- Seq("{% macro f(a,) %}x{% endmacro %}",
        "{% macro m(a) %}x{% endmacro %}{{ m(a= }}"))
      intercept[IllegalArgumentException](r(bad))
    // multi-line set expression parses like jinja (and like macro tags)
    assert(r("{% set x = 1 +\n 2 %}{{ x }}") === "3")
    assert(r("{% set q %}a\nb{% endset %}{{ q }}") === "a\nb")
    // self-recursive macro raises a bounded error, not StackOverflowError
    val rec = intercept[IllegalArgumentException](
      r("{% macro f(a) %}{{ f(a) }}{% endmacro %}{{ f(1) }}"))
    assert(rec.getMessage.contains("recursion"))
    // bounded nesting still works
    assert(r("{% macro g(a) %}{% if a > 0 %}{{ g(a - 1) }}{% else %}.{% endif %}{% endmacro %}{{ g(10) }}") === ".")
    // empty-sequence min/max name the real cause
    assert(intercept[IllegalArgumentException](
      r("{{ xs | min }}", Map("xs" -> Seq.empty)))
      .getMessage.contains("empty"))
    // for over a mapping iterates KEYS (jinja), not (k, v) tuples
    assert(r("{% for k in m %}{{ k }}={{ m[k] }};{% endfor %}",
      Map("m" -> scala.collection.immutable.ListMap("a" -> 1L, "b" -> 2L)))
      === "a=1;b=2;")
  }

  test("templated pipeline renders and runs end-to-end semantics") {
    // the rendered text IS the contract: check rendering of a realistic
    // multi-construct pipeline (execution is covered by GraftSqlSpec/q87)
    val script =
      """{% for t in tables %}
        |{{ t }}_f = SELECT * FROM {{ t }} WHERE v > {{ minV }}
        |{% endfor %}
        |out = SELECT k FROM {{ tables | first }}_f
        |{% if save %}SAVE out OVERWRITE PARQUET "/tmp/x"{% endif %}
        |""".stripMargin
    val got = r(script, Map("tables" -> Seq("a", "b"), "minV" -> 5L,
      "save" -> false))
    assert(got.contains("a_f = SELECT * FROM a WHERE v > 5"))
    assert(got.contains("b_f = SELECT * FROM b WHERE v > 5"))
    assert(got.contains("out = SELECT k FROM a_f"))
    assert(!got.contains("SAVE"))
  }

  test("reference fill_sql_template parity (tests/fugue/sql/test_utils.py)") {
    val data = Map[String, Any]("a" -> 1L, "b" -> "x")
    assert(r("select * from tbl where a = {{a}} and b = '{{b}}'", data) ===
      "select * from tbl where a = 1 and b = 'x'")
    assert(r("""select * from tbl where a = {{a}} and b = "{{b}}" """, data) ===
      """select * from tbl where a = 1 and b = "x" """)
    assert(r("""select * where b="%{{b}}" """, data) ===
      """select * where b="%x" """)
    assert(r("""select * where b="{{b}}%" """, data) ===
      """select * where b="x%" """)
    // quoted {%}-only content is raw (the json-pattern protection)
    assert(r("""select * b like "{}%{}" """, data) ===
      """select * b like "{}%{}" """)
    assert(r("""select * b like '%}' """, data) === """select * b like '%}' """)
    assert(r("a=select * from b like '{%'", data) ===
      "a=select * from b like '{%'")
    assert(r("""a=select * from b like "%}"""", data) ===
      """a=select * from b like "%}"""")
    assert(r("a=select ", data) === "a=select ")
    assert(r("{{a}}{{b}}{{a}}", data) === "1x1")
    assert(r("", data) === "")
    assert(r("%s", data) === "%s")
    assert(r("%%s", data) === "%%s")
    assert(r("{{a}}%%s{{b}}{{a}}", data) === "1%%sx1")
    // a "self" key is dropped before rendering (_utils.py:23-24)
    assert(r("{{a}}", Map("a" -> 1L, "self" -> 2L)) === "1")
    // the array rendering pattern from test_fill_sql_template_array,
    // with trim markers on every construct and a filter
    val arr =
      """select * from tbl where a in (
        |            {%- for i in a -%}
        |                {%- if loop.index0 < loop.length - 1 -%}'{{-i-}}',
        |                {%- else -%}'{{-i-}}'
        |                {%- endif -%}
        |            {%- endfor -%}
        |            )""".stripMargin
    assert(r(arr, Map("a" -> Seq(0L, 1L, 2L))) ===
      "select * from tbl where a in ('0','1','2')")
    assert(r(arr.replace("{{-i-}}", "{{-i|upper-}}"),
      Map("a" -> Seq("a", "b", "c"))) ===
      "select * from tbl where a in ('A','B','C')")
  }

  test("substituteVars keeps its legacy contract") {
    assert(GraftSql.substituteVars("pre {{a}} mid {{ a }}", Map("a" -> "$\\")) ===
      "pre $\\ mid $\\")
    intercept[IllegalArgumentException] {
      GraftSql.substituteVars("{{missing}}", Map("a" -> "x"))
    }
  }

  test("namespace(): construction, attr read, cross-scope mutation (jinja2 3.1.6 differential)") {
    // every expected value below was differentially executed against real
    // jinja2 3.1.6 (strict undefined) in r10
    assert(r("{% set ns = namespace(a=1, b='x') %}{{ ns.a }}|{{ ns.b }}") ===
      "1|x")
    // mutation inside a for body is visible after the loop — THE use case
    assert(r("{% set ns = namespace(found=false, n=0) %}" +
      "{% for i in [1,2,3] %}{% set ns.n = ns.n + i %}" +
      "{% if i == 2 %}{% set ns.found = true %}{% endif %}{% endfor %}" +
      "{{ ns.found }}:{{ ns.n }}") === "True:6")
    // mutation inside a macro body is visible at the call site
    assert(r("{% set ns = namespace(c=0) %}" +
      "{% macro bump() %}{% set ns.c = ns.c + 1 %}{% endmacro %}" +
      "{{ bump() }}{{ bump() }}{{ ns.c }}") === "2")
    // nested loops accumulate through the same object
    assert(r("{% set ns = namespace(total=0) %}{% for i in [1,2] %}" +
      "{% for j in [10,20] %}{% set ns.total = ns.total + i*j %}" +
      "{% endfor %}{% endfor %}{{ ns.total }}") === "90")
    // positional mapping + kwargs; kwargs win on collision
    assert(r("{% set ns = namespace({'a': 5}, b=6) %}{{ ns.a + ns.b }}") ===
      "11")
    assert(r("{% set ns = namespace({'a': 5}, a=7) %}{{ ns.a }}") === "7")
    // block-form attr set renders the body
    assert(r("{% set ns = namespace() %}{% set ns.t %}hello {{ 1 + 1 }}" +
      "{% endset %}{{ ns.t }}") === "hello 2")
    // namespaces alias by REFERENCE (jinja: b = a shares the object)
    assert(r("{% set a = namespace(v=1) %}{% set b = a %}" +
      "{% set b.v = 9 %}{{ a.v }}") === "9")
    // attr read drives conditionals
    assert(r("{% set ns = namespace(x=3) %}{% if ns.x > 2 %}big{% endif %}") ===
      "big")
    // repr: insertion order, re-assignment keeps position (python dicts)
    assert(r("{{ namespace(b=1, a='x') }}") === "<Namespace {'b': 1, 'a': 'x'}>")
    assert(r("{% set ns = namespace(b=1) %}{% set ns.a = 2 %}" +
      "{% set ns.b = 9 %}{{ ns }}") === "<Namespace {'b': 9, 'a': 2}>")
  }

  test("list/dict literals evaluate at render time (jinja2 3.1.6 differential)") {
    val p = Map[String, Any]("x" -> 9L)
    assert(r("{{ [x, 2] | join(',') }}", p) === "9,2")
    assert(r("{{ {'a': 1}['a'] }}") === "1")
    assert(r("{{ {1: 'x'}[1] }}") === "x")   // non-string keys index exactly
    assert(r("{{ {'k': x}.k }}", p) === "9")
    assert(r("{% for p in [[1,'a'],[2,'b']] %}{{ p[0] }}{{ p[1] }}{% endfor %}") ===
      "1a2b")
    assert(r("{{ {'a': 1} | length }}") === "1")
  }

  test("conditional expressions and is-tests (jinja2 3.1.6 differential)") {
    // each expected value differentially executed against jinja2 3.1.6
    assert(r("{{ 1 if x > 2 else 2 }}", Map("x" -> 5L)) === "1")
    assert(r("{{ 'big' if x > 2 }}", Map("x" -> 1L)) === "")   // no else, false
    assert(r("{{ (x if false) ~ 'end' }}", Map("x" -> 1L)) === "end")
    assert(r("{{ loop_free if false else 7 }}") === "7")       // dead branch lazy
    // ternary nests in call args, defaults, list/dict literals
    assert(r("{{ [1 if t else 0, 2] | join(',') }}", Map("t" -> true)) === "1,2")
    assert(r("{% if y is defined %}D{% else %}U{% endif %}") === "U")
    assert(r("{% if x is defined %}D{% else %}U{% endif %}", Map("x" -> 1L)) === "D")
    assert(r("{% if x is not none %}N{% endif %}", Map("x" -> 1L)) === "N")
    assert(r("{% if z is none %}isnone{% endif %}", Map("z" -> null)) === "isnone")
    assert(r("{% if x is string %}s{% else %}ns{% endif %}", Map("x" -> "a")) === "s")
    assert(r("{% if x is number %}n{% endif %}", Map("x" -> 2.5)) === "n")
    assert(r("{% if x is even %}e{% endif %}{% if y is odd %}o{% endif %}",
      Map("x" -> 4L, "y" -> 3L)) === "eo")
    assert(r("{% if m is mapping %}m{% endif %}{% if l is sequence %}sq{% endif %}",
      Map("m" -> Map("a" -> 1L), "l" -> Seq(1L))) === "msq")
    // jinja: sequence/iterable are true for mappings and strings too
    assert(r("{% if m is sequence %}Y{% else %}N{% endif %}",
      Map("m" -> Map("a" -> 1L))) === "Y")
    assert(r("{% if s is sequence %}Y{% endif %}{% if s is iterable %}I{% endif %}",
      Map("s" -> "ab")) === "YI")
    assert(r("{% if x is integer %}i{% endif %}{% if y is float %}f{% endif %}",
      Map("x" -> 1L, "y" -> 1.5)) === "if")
    assert(r("{% if b is boolean %}b{% endif %}", Map("b" -> true)) === "b")
    assert(r("{% if x is true %}T{% endif %}{% if y is false %}F{% endif %}",
      Map("x" -> true, "y" -> false)) === "TF")
    assert(r("{% if n is divisibleby(3) %}D{% endif %}", Map("n" -> 9L)) === "D")
    val e = intercept[IllegalArgumentException](r("{% if 1 is frobnicated %}x{% endif %}"))
    assert(e.getMessage.contains("unknown test"))
  }

  test("for-loop filters, tuple unpacking, dict methods (jinja2 3.1.6 differential)") {
    assert(r("{% for x in xs if x > 1 %}{{ x }}{% endfor %}",
      Map("xs" -> Seq(1L, 2L, 3L))) === "23")
    // loop.* indexes the FILTERED items (jinja semantics)
    assert(r("{% for x in xs if x > 1 %}{{ loop.index }}/{{ loop.length }};{% endfor %}",
      Map("xs" -> Seq(1L, 2L, 3L))) === "1/2;2/2;")
    assert(r("{% for a, b in ps %}{{ a }}{{ b }}{% endfor %}",
      Map("ps" -> Seq(Seq(1L, "x"), Seq(2L, "y")))) === "1x2y")
    // dict methods preserve insertion order, as python dicts do
    assert(r("{% for k, v in m.items() %}{{ k }}={{ v }};{% endfor %}" +
      "{{ m.keys() | join(',') }}|{{ m.values() | join(',') }}",
      Map("m" -> scala.collection.immutable.VectorMap("z" -> 1L, "a" -> 2L))) ===
      "z=1;a=2;z,a|1,2")
    // dict literal iteration order is the literal's order
    assert(r("{% for k, v in {'z': 1, 'a': 2}.items() %}{{ k }}{{ v }}{% endfor %}") ===
      "z1a2")
    // unpacking arity mismatch raises
    val e = intercept[IllegalArgumentException](
      r("{% for a, b in ps %}{{ a }}{% endfor %}", Map("ps" -> Seq(Seq(1L)))))
    assert(e.getMessage.contains("unpack"))
  }

  test("map/select/reject/attr filters (jinja2 3.1.6 differential)") {
    assert(r("{{ xs | select('odd') | list | join(',') }}",
      Map("xs" -> Seq(1L, 2L, 3L))) === "1,3")
    assert(r("{{ xs | select | join(',') }}",
      Map("xs" -> Seq(0L, 1L, "", 2L))) === "1,2")
    assert(r("{{ xs | reject('even') | join(',') }}",
      Map("xs" -> Seq(1L, 2L, 3L))) === "1,3")
    assert(r("{{ xs | map('upper') | join(',') }}",
      Map("xs" -> Seq("a", "b"))) === "A,B")
    assert(r("{{ xs | map('replace', 'a', 'o') | join(',') }}",
      Map("xs" -> Seq("cat", "hat"))) === "cot,hot")
    assert(r("{{ xs | sum(attribute='v') }}",
      Map("xs" -> Seq(Map("v" -> 1L), Map("v" -> 2L)))) === "3")
    assert(r("{{ xs | selectattr('on') | map(attribute='v') | join(',') }}",
      Map("xs" -> Seq(Map("on" -> true, "v" -> 1L),
        Map("on" -> false, "v" -> 2L), Map("on" -> true, "v" -> 3L)))) === "1,3")
    assert(r("{{ xs | rejectattr('on') | map(attribute='v') | join(',') }}",
      Map("xs" -> Seq(Map("on" -> true, "v" -> 1L),
        Map("on" -> false, "v" -> 2L)))) === "2")
    assert(r("{{ xs | selectattr('v', 'divisibleby', 2) | map(attribute='v') | join(',') }}",
      Map("xs" -> Seq(Map("v" -> 2L), Map("v" -> 3L), Map("v" -> 4L)))) === "2,4")
    assert(r("{{ xs | sort(attribute='k') | map(attribute='v') | join('') }}",
      Map("xs" -> Seq(Map("k" -> 2L, "v" -> "b"), Map("k" -> 1L, "v" -> "a")))) === "ab")
    assert(r("{{ xs | sort(attribute='k', reverse=true) | map(attribute='v') | join('') }}",
      Map("xs" -> Seq(Map("k" -> 2L, "v" -> "b"), Map("k" -> 1L, "v" -> "a")))) === "ba")
    // precedence: filters bind tighter than the conditional and ~
    assert(r("{{ 'a' | upper if t else 'b' }}", Map("t" -> true)) === "A")
    assert(r("{{ 'a' | upper if t else 'b' | upper }}", Map("t" -> false)) === "B")
    assert(r("{{ x ~ 'y' | upper }}", Map("x" -> "a")) === "aY")
    assert(r("{{ 'x' if not a is defined else 'y' }}") === "x")
  }

  test("range()/dict() globals and filter blocks (jinja2 3.1.6 differential)") {
    assert(r("{% for i in range(3) %}{{ i }}{% endfor %}") === "012")
    assert(r("{% for i in range(1, 4) %}{{ i }}{% endfor %}") === "123")
    assert(r("{% for i in range(0, 10, 3) %}{{ i }};{% endfor %}") === "0;3;6;9;")
    assert(r("{% for i in range(3, 0, -1) %}{{ i }}{% endfor %}") === "321")
    assert(r("{{ range(2, 2) | length }}") === "0")
    assert(r("{{ dict(a=1, b=2)['a'] }}") === "1")
    // dict() preserves kwarg order like python dicts
    assert(r("{% for k, v in dict(z=1, a=2).items() %}{{ k }}{{ v }}{% endfor %}") ===
      "z1a2")
    assert(r("{% filter upper %}abc {{ 1 + 1 }}{% endfilter %}") === "ABC 2")
    assert(r("{% filter replace('a', 'o') %}cat{% endfilter %}") === "cot")
    assert(r("{% filter trim | upper %}  pad  {% endfilter %}") === "PAD")
    // a user binding shadows the global, as in jinja
    assert(r("{% set range = [9] %}{{ range[0] }}") === "9")
    // materialization cap: a typo'd huge range raises instead of OOMing
    val e = intercept[IllegalArgumentException](r("{{ range(10000000000) | length }}"))
    assert(e.getMessage.contains("cap"))
    val e2 = intercept[IllegalArgumentException](r("{{ range(1, 2, 0) }}"))
    assert(e2.getMessage.contains("zero"))
  }

  test("call blocks and caller() (jinja2 3.1.6 differential)") {
    assert(r("{% macro wrap() %}<{{ caller() }}>{% endmacro %}" +
      "{% call wrap() %}body {{ 1+1 }}{% endcall %}") === "<body 2>")
    assert(r("{% macro wrap(t) %}[{{ t }}:{{ caller() }}]{% endmacro %}" +
      "{% call wrap('x') %}B{% endcall %}") === "[x:B]")
    // the block body renders in the CALL-SITE scope
    assert(r("{% set v = 7 %}{% macro w() %}({{ caller() }}){% endmacro %}" +
      "{% call w() %}{{ v }}{% endcall %}") === "(7)")
    // call with parameters: the macro passes values INTO the block
    assert(r("{% macro each(xs) %}{% for x in xs %}{{ caller(x) }}{% endfor %}" +
      "{% endmacro %}{% call(item) each([1,2]) %}<{{ item }}>{% endcall %}") ===
      "<1><2>")
    // caller() invoked twice renders twice
    assert(r("{% macro d() %}{{ caller() }}{{ caller() }}{% endmacro %}" +
      "{% call d() %}a{% endcall %}") === "aa")
    // macro locals are invisible to the block body (jinja: 'U')
    assert(r("{% macro w() %}{% set inner = 9 %}{{ caller() }}{% endmacro %}" +
      "{% call w() %}{{ inner if inner is defined else 'U' }}{% endcall %}") ===
      "U")
    // plain invocation without a call block: caller is undefined (jinja
    // raises 'No caller defined'; graft raises the undefined-macro error)
    val e = intercept[IllegalArgumentException](
      r("{% macro m() %}{{ caller() }}{% endmacro %}{{ m() }}"))
    assert(e.getMessage.contains("caller"))
    // a nested plain call does NOT inherit the outer block's caller
    val e2 = intercept[IllegalArgumentException](
      r("{% macro inner() %}{{ caller() }}{% endmacro %}" +
        "{% macro outer() %}{{ inner() }}{% endmacro %}" +
        "{% call outer() %}x{% endcall %}"))
    assert(e2.getMessage.contains("caller"))
  }

  test("for-else and loop.cycle/previtem/nextitem (jinja2 3.1.6 differential)") {
    assert(r("{% for x in xs %}{{ x }}{% else %}EMPTY{% endfor %}",
      Map("xs" -> Seq.empty[Long])) === "EMPTY")
    assert(r("{% for x in xs %}{{ x }}{% else %}EMPTY{% endfor %}",
      Map("xs" -> Seq(1L, 2L))) === "12")
    // a filter that rejects everything also triggers the else block
    assert(r("{% for x in xs if x > 9 %}{{ x }}{% else %}NONE{% endfor %}",
      Map("xs" -> Seq(1L, 2L))) === "NONE")
    assert(r("{% for x in xs %}{{ loop.cycle('a','b') }}{{ x }}{% endfor %}",
      Map("xs" -> Seq(1L, 2L, 3L))) === "a1b2a3")
    assert(r("{% for x in xs %}{{ loop.previtem if not loop.first else 'S' }}-{% endfor %}",
      Map("xs" -> Seq(1L, 2L, 3L))) === "S-1-2-")
    assert(r("{% for x in xs %}{{ loop.nextitem if not loop.last else 'E' }}-{% endfor %}",
      Map("xs" -> Seq(1L, 2L, 3L))) === "2-3-E-")
  }

  test("negative indexing and python slices (jinja2 3.1.6 differential)") {
    val p = Map[String, Any]("xs" -> Seq(10L, 20L, 30L, 40L), "s" -> "abcdef")
    assert(r("{{ xs[-1] }}{{ s[-3] }}", p) === "40d")
    assert(r("{{ xs[1:] | join(',') }}", p) === "20,30,40")
    assert(r("{{ xs[:2] | join(',') }}", p) === "10,20")
    assert(r("{{ s[2:5] }}", p) === "cde")
    assert(r("{{ xs[0:3:2] | join(',') }}", p) === "10,30")
    assert(r("{{ s[::-1] }}", p) === "fedcba")
    assert(r("{{ xs[-2:] | join(',') }}", p) === "30,40")
    assert(r("{{ s[1:-1] }}", p) === "bcde")
    // out-of-range slices clamp; zero step raises
    assert(r("{{ xs[10:20] | length }}", p) === "0")
    val e = intercept[IllegalArgumentException](r("{{ xs[::0] }}", p))
    assert(e.getMessage.contains("zero"))
  }

  test("namespace(): error cases match jinja2's (raise, message differs)") {
    // jinja2: 'cannot assign attribute on non-namespace object' for both
    val e1 = intercept[IllegalArgumentException](
      r("{% set x = 1 %}{% set x.y = 2 %}ok"))
    assert(e1.getMessage.contains("namespace"))
    val e2 = intercept[IllegalArgumentException](r("{% set ns.a = 1 %}ok"))
    assert(e2.getMessage.contains("undefined"))
    // jinja2: TypeError ('int' object is not iterable)
    val e3 = intercept[IllegalArgumentException](r("{{ namespace(1) }}"))
    assert(e3.getMessage.contains("mapping"))
    // a user binding named 'namespace' shadows the builtin (jinja global
    // shadowing rule); calling the shadowed non-callable then raises
    val e4 = intercept[IllegalArgumentException](
      r("{% set namespace = 3 %}{{ namespace(a=1) }}"))
    assert(e4.getMessage.contains("not callable"))
    // reading a missing attribute is Undefined → strict output raises
    // (graft's documented strict-undefined divergence applies here too)
    val e5 = intercept[IllegalArgumentException](
      r("{% set ns = namespace(a=1) %}{{ ns.missing }}"))
    assert(e5.getMessage.contains("undefined"))
  }
}
