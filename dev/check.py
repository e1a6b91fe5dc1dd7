#!/usr/bin/env python3
"""Dev-side mimic of the driver's correctness gate (NOT part of the shipped
library): runs DuckDB on oracle_sql.json against the sf parquet tables and
compares with the parquet dumps Verify wrote. Usage:
    python3 dev/check.py [sfDir] [outDir]
"""
import glob, json, math, sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        gcols = [d[0] for d in con.description]
        want = con.execute(sql).fetchall()
        wcols = [d[0] for d in con.description]
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fail += 1
        continue
    # driver sorts columns by name before hashing values
    gperm = sorted(range(len(gcols)), key=lambda i: gcols[i])
    wperm = sorted(range(len(wcols)), key=lambda i: wcols[i])
    if sorted(gcols) != sorted(wcols):
        print(f"FAIL {name}: schema {sorted(gcols)} != {sorted(wcols)}")
        fail += 1
        continue
    # column types must agree too (e.g. BIGINT vs HUGEINT sums, INT vs
    # BIGINT row_number) — value compare alone can mask these
    gtypes = con.execute(
        f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()
    wtypes = con.execute(f"DESCRIBE {sql}").fetchall()
    gt = {r[0]: r[1] for r in gtypes}
    wt = {r[0]: r[1] for r in wtypes}
    mismatched = {c for c in gt if gt[c] != wt.get(c)}
    if mismatched:
        print(f"WARN {name}: column type mismatch "
              f"{[(c, gt[c], wt.get(c)) for c in sorted(mismatched)]}")
    g = [tuple(r[i] for i in gperm) for r in got]
    w = [tuple(r[i] for i in wperm) for r in want]

    def norm(rows):
        return [tuple(round(v, 9) if isinstance(v, float) else v for v in r)
                for r in rows]
    g, w = norm(g), norm(w)
    ordered = g == w
    unordered = sorted(map(repr, g)) == sorted(map(repr, w))
    if ordered:
        print(f"PASS {name}: {len(g)} rows (ordered exact)")
    elif unordered:
        print(f"WARN {name}: rows match only after sorting ({len(g)} rows)")
    else:
        fail += 1
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
        gs, ws = set(map(repr, g)), set(map(repr, w))
        for d in list(gs - ws)[:3]:
            print(f"   spark-only: {d[:200]}")
        for d in list(ws - gs)[:3]:
            print(f"   duck-only:  {d[:200]}")
sys.exit(1 if fail else 0)
