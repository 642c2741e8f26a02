#!/usr/bin/env python3
"""Local differential check mimicking the driver: run Verify output parquet
vs DuckDB oracle on the same tables; sort columns by name, sort rows,
compare values. Usage: check_correctness.py <sfDir> <verifyOutDir>"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

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

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob, os
    failed = []
    # a query that THREW in Verify is simply absent from the dump — that
    # must fail the check, not silently narrow it. queries.json (written by
    # Verify) covers rows-only queries too; fall back to oracle keys.
    dumped = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    qlist = os.path.join(out_dir, "queries.json")
    expected = set(oracle)  # an oracle without a queries entry must also flag
    if os.path.exists(qlist):
        expected |= set(json.load(open(qlist)))
    for name in sorted(expected - dumped):
        print(f"{name}: FAIL missing from dump (query threw in Verify)")
        failed.append(name)
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if not os.path.isdir(p):
            continue
        files = glob.glob(f"{p}/*.parquet")
        got = pa.concat_tables([pq.read_table(f) for f in files]) if files else None
        if name not in oracle:
            n = got.num_rows if got is not None else -1
            print(f"{name}: rows-only n={n}" + (" FAIL(empty)" if not n or n < 0 else ""))
            if not n or n < 0:
                failed.append(name)
            continue
        want = con.execute(oracle[name]).fetch_arrow_table()
        gc, gr = canon(got)
        wc, wr = canon(want)
        if gc != wc:
            print(f"{name}: FAIL cols got={gc} want={wc}")
            failed.append(name); continue
        if len(gr) != len(wr):
            print(f"{name}: FAIL rows got={len(gr)} want={len(wr)}")
            failed.append(name); continue
        bad = 0
        for a, b in zip(gr, wr):
            if a != b:
                bad += 1
                if bad <= 3:
                    print(f"{name}: diff got={a} want={b}")
        if bad:
            print(f"{name}: FAIL {bad}/{len(gr)} differing rows")
            failed.append(name)
        else:
            print(f"{name}: OK ({len(gr)} rows)")
    print("\n== SUMMARY ==", "ALL OK" if not failed else f"FAILED: {failed}")
    return 1 if failed else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
