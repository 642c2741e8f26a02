#!/usr/bin/env python3
"""Local differential check mimicking the driver: run Verify output parquet
vs DuckDB oracle on the same tables; sort columns by name, sort rows,
compare values.

Usage: check_correctness.py <sfDir> <verifyOutDir> [--json out.json] [--only a,b]

--json writes a driver-style artifact (per-query rows/schema/hash verdicts)
so the sf1.0 gate can commit a CORRECTNESS_sf1.json reproducibly.
--only restricts the check to a comma-separated name list.

Results past BIG_ROWS rows (e.g. d12_fuzzy_join at sf1.0: 26.9M pairs) are
compared inside DuckDB (EXCEPT ALL both ways on name-sorted columns) instead
of materializing python tuples — same verdict semantics, bounded memory.
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BIG_ROWS = 2_000_000

def canon(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    rows = []
    for batch in tbl.to_batches():
        d = batch.to_pylist()
        rows.extend(tuple(normv(r[c]) for c in cols) for r in d)
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows

def normv(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def big_compare(con, name, got_glob, oracle_sql, res):
    """DuckDB-side compare for huge results: column names must match, then
    row count and EXCEPT ALL in both directions must be empty. Exact-match
    semantics only (the big results here are integer pair lists, no FP)."""
    gc = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{got_glob}')").fetchall()]
    want_rel = f"({oracle_sql})"
    wc = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM {want_rel} w").fetchall()]
    if sorted(gc) != sorted(wc):
        print(f"{name}: FAIL cols got={sorted(gc)} want={sorted(wc)}")
        res["schema_match"] = False
        return False
    cols = ", ".join(f'"{c}"' for c in sorted(gc))
    con.execute(f"CREATE OR REPLACE TEMP TABLE _want AS SELECT {cols} FROM {want_rel} w")
    con.execute(f"CREATE OR REPLACE TEMP TABLE _got AS SELECT {cols} FROM read_parquet('{got_glob}')")
    ng = con.execute("SELECT count(*) FROM _got").fetchone()[0]
    nw = con.execute("SELECT count(*) FROM _want").fetchone()[0]
    res["spark_rows"], res["oracle_rows"] = ng, nw
    res["rows_match"] = ng == nw
    res["schema_match"] = True
    if ng != nw:
        print(f"{name}: FAIL rows got={ng} want={nw}")
        return False
    extra = con.execute("SELECT count(*) FROM (SELECT * FROM _got EXCEPT ALL SELECT * FROM _want)").fetchone()[0]
    missing = con.execute("SELECT count(*) FROM (SELECT * FROM _want EXCEPT ALL SELECT * FROM _got)").fetchone()[0]
    con.execute("DROP TABLE _got"); con.execute("DROP TABLE _want")
    if extra or missing:
        print(f"{name}: FAIL {extra} extra / {missing} missing rows (duckdb compare)")
        res["hash_match"] = False
        return False
    res["hash_match"] = True
    print(f"{name}: OK ({ng} rows, duckdb compare)")
    return True

def main(sf_dir, out_dir, json_out=None, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob, os
    failed = []
    results = {}
    def rec(name):
        return results.setdefault(name, {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None})
    # a query that THREW in Verify is simply absent from the dump — that
    # must fail the check, not silently narrow it. queries.json (written by
    # Verify) covers rows-only queries too; fall back to oracle keys.
    dumped = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    qlist = os.path.join(out_dir, "queries.json")
    expected = set(oracle)  # an oracle without a queries entry must also flag
    if os.path.exists(qlist):
        expected |= set(json.load(open(qlist)))
    if only:
        expected &= only
        dumped &= only
    for name in sorted(expected - dumped):
        print(f"{name}: FAIL missing from dump (query threw in Verify)")
        rec(name)["err"] = "missing_from_dump"
        failed.append(name)
    for name in sorted(dumped):
        p = os.path.join(out_dir, name)
        files = glob.glob(f"{p}/*.parquet")
        r = rec(name)
        if name not in oracle:
            got = pa.concat_tables([pq.read_table(f) for f in files]) if files else None
            n = got.num_rows if got is not None else -1
            print(f"{name}: rows-only n={n}" + (" FAIL(empty)" if not n or n < 0 else ""))
            r["spark_rows"] = n
            r["err"] = "no_oracle"
            if not n or n < 0:
                failed.append(name)
            continue
        try:
            nrow_got = sum(pq.read_metadata(f).num_rows for f in files) if files else 0
            if nrow_got >= BIG_ROWS:
                if not big_compare(con, name, f"{p}/*.parquet", oracle[name], r):
                    failed.append(name)
                continue
            got = pa.concat_tables([pq.read_table(f) for f in files]) if files else None
            want = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"{name}: FAIL oracle/read error: {e}")
            r["err"] = f"error: {e}"
            failed.append(name); continue
        gc, gr = canon(got)
        wc, wr = canon(want)
        r["spark_rows"], r["oracle_rows"] = len(gr), len(wr)
        r["schema_match"] = gc == wc
        if gc != wc:
            print(f"{name}: FAIL cols got={gc} want={wc}")
            failed.append(name); continue
        r["rows_match"] = len(gr) == len(wr)
        if len(gr) != len(wr):
            print(f"{name}: FAIL rows got={len(gr)} want={len(wr)}")
            failed.append(name); continue
        bad = 0
        for a, b in zip(gr, wr):
            if a != b:
                bad += 1
                if bad <= 3:
                    print(f"{name}: diff got={a} want={b}")
        r["hash_match"] = bad == 0
        if bad:
            print(f"{name}: FAIL {bad}/{len(gr)} differing rows")
            failed.append(name)
        else:
            print(f"{name}: OK ({len(gr)} rows)")
    print("\n== SUMMARY ==", "ALL OK" if not failed else f"FAILED: {failed}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if failed else 0

if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    json_out, only = None, None
    if "--json" in args:
        i = args.index("--json"); json_out = args[i + 1]; del args[i:i + 2]
    if "--only" in args:
        i = args.index("--only"); only = set(args[i + 1].split(",")); del args[i:i + 2]
    sys.exit(main(args[0], args[1], json_out, only))
