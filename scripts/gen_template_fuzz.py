#!/usr/bin/env python3
"""Generate the jinja2 differential fuzz corpus for TemplateFuzzSpec.

Renders ~400 seeded-random templates with REAL jinja2 (3.1.6, strict
undefined) and writes src/test/resources/template_fuzz.tsv with one
URL-encoded (template, context-json, output) triple per line. The Scala
spec replays the corpus offline — the ground truth is captured here, so
the build never needs python.

The grammar intentionally avoids the documented divergences (strict
undefined output, float repr, namespace/dict direct rendering) and any
construct jinja itself errors on — error-path parity is pinned by the
hand-written TemplateSpec cases instead.

Usage: python3 scripts/gen_template_fuzz.py [seed] [count]
"""
import json
import random
import sys
import urllib.parse

import jinja2

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 20260815
COUNT = int(sys.argv[2]) if len(sys.argv) > 2 else 400

rng = random.Random(SEED)


def gen_ctx():
    """A fresh randomized context per case — same names and types every
    time (the grammar depends on them), fresh values, so the corpus
    exercises value-dependent paths (mixed-case sorts, duplicate
    elements, boundary ints) instead of one frozen snapshot."""
    def word():
        return "".join(rng.choice("abcdefghinoprstu")
                       for _ in range(rng.randint(2, 6)))

    def mixed():
        return "".join(c.upper() if rng.random() < 0.4 else c
                       for c in word())
    return {
        "n": rng.randint(0, 9),
        "m": rng.randint(0, 9),
        "z": rng.randint(0, 9),
        # negative operand for the %-format conversions ONLY (kept out of
        # INT_VARS so arithmetic grammar semantics stay unchanged)
        "neg": rng.randint(-9999, -1),
        "s": mixed() + " " + mixed(),
        "t": word() + "-" + word() + " " + word(),
        "flag": rng.random() < 0.5,
        "off": rng.random() < 0.5,
        "xs": [rng.randint(0, 20) for _ in range(rng.randint(2, 4))],
        "ys": [rng.randint(0, 20) for _ in range(rng.randint(2, 3))],
        "ws": [word() for _ in range(rng.randint(2, 4))],
        # mixed-case with likely case-folded duplicates: the
        # case_sensitive=/default split of sort/unique/min/max lives here
        "cs": (lambda base: [rng.choice(
            [w, w.upper(), w.capitalize()]) for w in
            [rng.choice(base) for _ in range(rng.randint(3, 5))]])(
            [word() for _ in range(3)]),
        "rs": [{"k": rng.randint(0, 5), "v": word()}
               for _ in range(rng.randint(2, 4))],
        "d": {"a": rng.randint(0, 9), "b": rng.randint(0, 9)},
        # float across magnitudes for %g/%G ONLY: the fixed-vs-scientific
        # switch, trailing-zero stripping and half-even rounding are all
        # value-dependent (inf/nan are not JSON-encodable — pinned in
        # TemplateSpec instead)
        "fl": rng.choice([
            rng.uniform(1, 10) * 10 ** rng.randint(-8, 8),
            float(rng.randint(0, 9)),
            -rng.uniform(0.9, 1.1) * 10 ** rng.randint(-6, 6),
            float(10 ** rng.randint(0, 9)) - rng.choice([0.0, 0.5]),
            0.0,
        ]),
    }


INT_VARS = ["n", "m", "z"]
STR_VARS = ["s", "t"]
LIST_VARS = ["xs", "ys"]
SLIST_VARS = ["ws", "cs"]
BOOL_VARS = ["flag", "off"]

INT_FILTERS = ["abs", "int"]
STR_FILTERS = ["upper", "lower", "trim", "title", "capitalize", "length"]
LIST_FILTERS = ["length", "first", "last", "min", "max", "sum", "unique | sum",
                "sort | join(',')", "reverse | join(',')",
                "sort(reverse=true) | join(',')", "unique | join(',')",
                "sort(true) | join('+')", "count", "tojson",
                "batch(2) | map('last') | join(',')",
                "slice(2) | map('length') | join(',')"]
SLIST_FILTERS = ["join('-')", "sort | join('+')", "map('upper') | join(',')",
                 "select('string') | length",
                 "sort(reverse=true) | join(',')",
                 "sort(case_sensitive=true) | join(',')",
                 "sort(true, true) | join(',')",
                 "unique | join(',')",
                 "unique(case_sensitive=true) | join(',')",
                 "min", "max", "min(case_sensitive=true)",
                 "max(case_sensitive=true)"]
RLIST_FILTERS = ["sort(attribute='k') | map(attribute='v') | join(',')",
                 "sort(attribute='k', reverse=true) | map(attribute='v') | join(',')",
                 "unique(attribute='k') | map(attribute='v') | join(',')",
                 "map(attribute='k') | sum",
                 "sort(false, false, 'v') | map(attribute='k') | join('.')"]
STR_EXTRA = ["truncate(9)", "truncate(9, true)", "truncate(9, leeway=0)",
             "wordcount", "center(12) | trim", "indent(2)",
             "indent(2, true)", "tojson",
             # odd/even width x odd/even margin: the extra-space side
             "center(11) | replace(' ', '.')",
             "center(13) | replace(' ', '.')"]
FORMAT_CASES = ["{{ '%d-%s' | format(n, s) }}",
                "{{ '%(a)s/%(b)d' | format(a=t, b=m) }}",
                "{{ '%05d|%x' | format(n, n) }}",
                "{{ '%i %o' | format(m, n) }}",
                "{{ '%.2s' | format(s) }}",
                # negatives, # prefixes, precision, sign flags (python
                # signs outside zero padding; java two's-complement would
                # diverge on every one of these)
                "{{ '%x,%X,%o' | format(neg, neg, neg) }}",
                "{{ '%#x_%#o_%#X' | format(n, neg, m) }}",
                "{{ '%08x|%-8x|' | format(neg, neg) }}",
                "{{ '%8.4d %+d % d' | format(neg, n, m) }}",
                "{{ '%#010x %010.4x' | format(n, m) }}",
                # kwargs-only with a bare %s: python formats the mapping
                "{{ '%s' | format(a=n) }}",
                "{{ '%(a)s~%(a)x' | format(a=n) }}",
                # %g/%G across magnitudes, precisions, flag combinations
                "{{ '%g %G' | format(fl, fl) }}",
                "{{ '%.3g|%#g|%.1g' | format(fl, fl, fl) }}",
                "{{ '%10.2g|%-12g|%012g|' | format(fl, fl, fl) }}",
                "{{ '%+g % g %g' | format(fl, fl, neg) }}",
                "{{ '%#.1G_%08.3g' | format(fl, fl) }}",
                # %c: int code points incl. an astral one; space-only
                # padding even with the 0 flag
                "{{ '%c%c%c' | format(n + 65, m + 97, z + 48) }}",
                "{{ '%5c|%-5c|%05c|' | format(n + 66, m + 167, 128512 + z) }}"]


def int_expr(depth=0):
    r = rng.random()
    if depth > 2 or r < 0.3:
        return rng.choice(INT_VARS + [str(rng.randint(0, 9))])
    if r < 0.5:
        return f"({int_expr(depth + 1)} + {int_expr(depth + 1)})"
    if r < 0.65:
        return f"({int_expr(depth + 1)} * {rng.randint(0, 3)})"
    if r < 0.8:
        return f"({int_expr(depth + 1)} - {int_expr(depth + 1)})"
    if r < 0.9:
        # floor division / modulo by a non-zero literal only
        return f"({int_expr(depth + 1)} // {rng.randint(1, 4)})"
    return f"({int_expr(depth + 1)} % {rng.randint(1, 5)})"


def str_expr(depth=0):
    r = rng.random()
    if depth > 2 or r < 0.4:
        return rng.choice(STR_VARS + ["'lit'", "'X Y'"])
    if r < 0.6:
        return f"({str_expr(depth + 1)} ~ {str_expr(depth + 1)})"
    if r < 0.8:
        return f"({str_expr(depth + 1)} | {rng.choice(['upper', 'lower', 'trim'])})"
    return f"({str_expr(depth + 1)} | replace('a', 'o'))"


def bool_expr(depth=0):
    r = rng.random()
    if depth > 2 or r < 0.25:
        return rng.choice(BOOL_VARS)
    if r < 0.45:
        op = rng.choice(["<", "<=", ">", ">=", "==", "!="])
        return f"({int_expr(depth + 1)} {op} {int_expr(depth + 1)})"
    if r < 0.6:
        return f"({int_expr(depth + 1)} in {rng.choice(LIST_VARS)})"
    if r < 0.7:
        return f"(not {bool_expr(depth + 1)})"
    if r < 0.8:
        t = rng.choice(["even", "odd", "number", "string", "defined"])
        side = rng.choice(INT_VARS + STR_VARS)
        return f"({side} is {t})"
    op = rng.choice(["and", "or"])
    return f"({bool_expr(depth + 1)} {op} {bool_expr(depth + 1)})"


def output_stmt():
    r = rng.random()
    if r < 0.3:
        return "{{ " + int_expr() + " }}"
    if r < 0.5:
        return "{{ " + str_expr() + " }}"
    if r < 0.6:
        lf = rng.choice(LIST_FILTERS)
        return "{{ " + rng.choice(LIST_VARS) + " | " + lf + " }}"
    if r < 0.64:
        return ("{{ " + rng.choice(SLIST_VARS) +
                " | " + rng.choice(SLIST_FILTERS) + " }}")
    if r < 0.66:
        return "{{ rs | " + rng.choice(RLIST_FILTERS) + " }}"
    if r < 0.675:
        return "{{ " + rng.choice(STR_VARS) + " | " + rng.choice(STR_EXTRA) + " }}"
    if r < 0.71:
        return rng.choice(FORMAT_CASES)
    if r < 0.73:
        return rng.choice([
            "{% for g, it in rs | groupby('k') %}[{{ g }}:{{ it | length }}]{% endfor %}",
            "{% for g in rs | groupby('k') %}{{ g.grouper }}={{ g.list | map(attribute='v') | join('.') }};{% endfor %}",
            "{% for g in rs | groupby('k') %}{{ g | attr('grouper') }}~{{ g | attr('list') | length }};{% endfor %}",
            "{% for k, v in d | dictsort %}{{ k }}={{ v }};{% endfor %}",
            "{% for k, v in d | dictsort(by='value', reverse=true) %}{{ k }};{% endfor %}",
            "{% for row in xs | batch(2, 0) %}[{{ row | join(',') }}]{% endfor %}",
            "{% for c in ws | slice(2, 'z') %}[{{ c | join('-') }}]{% endfor %}",
            "{{ d | tojson }}",
        ])
    if r < 0.8:
        return ("{{ " + int_expr() + " if " + bool_expr() +
                " else " + int_expr() + " }}")
    if r < 0.9:
        # slices and negative indexing over lists/strings
        tgt = rng.choice(LIST_VARS + SLIST_VARS + STR_VARS)
        sl = rng.choice(["[-1]", "[0]", "[1:]", "[:2]", "[::-1]", "[1:-1]",
                         "[::2]", "[-2:]"])
        joined = " | join('.')" if tgt in LIST_VARS + SLIST_VARS and \
            not sl.endswith("]0") and sl not in ("[-1]", "[0]") else ""
        return "{{ " + tgt + sl + joined + " }}"
    return "{{ d['a'] + d['b'] }}"


def block_stmt(depth=0):
    r = rng.random()
    if depth > 1 or r < 0.45:
        return output_stmt()
    if r < 0.6:
        return ("{% if " + bool_expr() + " %}" + body(depth + 1) +
                "{% else %}" + body(depth + 1) + "{% endif %}")
    if r < 0.75:
        var = f"i{depth}"
        src = rng.choice(LIST_VARS + [f"range({rng.randint(1, 4)})"])
        filt = f" if {var} % 2 == {rng.randint(0, 1)}" if rng.random() < 0.3 else ""
        inner = rng.choice([
            "{{ " + var + " }}", "{{ loop.index }}:{{ " + var + " }};",
            "{{ " + var + " * 2 }},",
            "{{ loop.cycle('x', 'y') }}{{ " + var + " }}"])
        els = "{% else %}none" if rng.random() < 0.25 else ""
        return ("{% for " + var + " in " + src + filt + " %}" + inner +
                els + "{% endfor %}")
    if r < 0.9:
        v = f"v{depth}{rng.randint(0, 9)}"
        return ("{% set " + v + " = " + int_expr() + " %}{{ " + v + " }}")
    return ("{% filter " + rng.choice(["upper", "lower", "trim"]) + " %}" +
            body(depth + 1) + "{% endfilter %}")


def macro_stmt(depth=0):
    """Self-contained macro/namespace/call constructs: params-only macro
    bodies (free names would exercise the documented strict-undefined
    divergence, which the hand-written spec pins instead)."""
    r = rng.random()
    name = f"mac{rng.randint(0, 99)}"
    if r < 0.35:
        # macro with params + default, called positionally and by keyword
        d = rng.randint(0, 9)
        return ("{% macro " + name + "(a, b=" + str(d) + ") %}" +
                "[{{ a + b }}]{% endmacro %}" +
                "{{ " + name + "(" + int_expr() + ") }}" +
                "{{ " + name + "(" + int_expr() + ", b=" + int_expr() + ") }}")
    if r < 0.6:
        # call block with caller(), optionally parameterized
        if rng.random() < 0.5:
            return ("{% macro " + name + "() %}<{{ caller() }}>{% endmacro %}" +
                    "{% call " + name + "() %}" + output_stmt() + "{% endcall %}")
        return ("{% macro " + name + "(xs) %}{% for x in xs %}{{ caller(x) }}"
                "{% endfor %}{% endmacro %}" +
                "{% call(item) " + name + "(" + rng.choice(LIST_VARS) + ") %}" +
                "({{ item * 2 }}){% endcall %}")
    # namespace accumulation across a loop
    v = f"ns{rng.randint(0, 99)}"
    return ("{% set " + v + " = namespace(acc=0) %}" +
            "{% for x in " + rng.choice(LIST_VARS) + " %}" +
            "{% set " + v + ".acc = " + v + ".acc + x %}{% endfor %}" +
            "{{ " + v + ".acc }}")


def body(depth=0):
    stmts = [block_stmt(depth) for _ in range(rng.randint(1, 2))]
    if depth == 0 and rng.random() < 0.3:
        stmts.append(macro_stmt(depth))
    return " ".join(stmts)


def main():
    env = jinja2.Environment(undefined=jinja2.StrictUndefined)
    rows = []
    attempts = 0
    while len(rows) < COUNT and attempts < COUNT * 20:
        attempts += 1
        ctx = gen_ctx()
        tpl = body()
        try:
            out = env.from_string(tpl).render(**ctx)
        except Exception:
            continue  # only keep templates jinja itself accepts
        rows.append((tpl, json.dumps(ctx, sort_keys=True), out))
    enc = urllib.parse.quote
    path = "src/test/resources/template_fuzz.tsv"
    with open(path, "w") as f:
        f.write(f"# jinja2 {jinja2.__version__} differential corpus, "
                f"seed={SEED}, per-case ctx in column 2\n")
        for tpl, ctx_json, out in rows:
            f.write(f"{enc(tpl)}\t{enc(ctx_json)}\t{enc(out)}\n")
    print(f"wrote {len(rows)} cases to {path} ({attempts} attempts)")


if __name__ == "__main__":
    main()
