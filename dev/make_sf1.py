#!/usr/bin/env python3
"""Dev-side sf1 fixture generator: 10x the sf0.1 FACT tables (documents,
embeddings, events, customer, orders, lineitem) with consistently offset
keys, dimensions (region/nation/supplier/part) passed through — the scale
rehearsal corpus for BENCH-style runs. Driver-side tooling only (duckdb);
never part of the Scala library.

Usage: python3 dev/make_sf1.py [src=/root/testdata/sf0.1] [dst=/tmp/sf1] [copies=10]
"""
import sys
import pathlib

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

pathlib.path = pathlib.Path  # alias guard
out = pathlib.Path(dst)
out.mkdir(parents=True, exist_ok=True)

con = duckdb.connect()
con.execute(f"CREATE VIEW copies AS SELECT unnest(range({copies})) AS c")


def copy_through(table: str) -> None:
    con.execute(
        f"COPY (SELECT * FROM '{src}/{table}.parquet') TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
    )


def scale(table: str, select: str) -> None:
    con.execute(
        f"""COPY (
              SELECT {select}
              FROM '{src}/{table}.parquet' t CROSS JOIN copies
            ) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"""
    )


for dim in ["region", "nation", "supplier", "part"]:
    copy_through(dim)

# offsets: next power of 10 above each key's max keeps copies disjoint
off = {
    k: con.execute(f"SELECT max({col}) FROM '{src}/{t}.parquet'").fetchone()[0] + 1
    for k, (t, col) in {
        "doc": ("documents", "doc_id"),
        "vec": ("embeddings", "vec_id"),
        "ev": ("events", "event_id"),
        "user": ("events", "user_id"),
        "cust": ("customer", "c_custkey"),
        "ord": ("orders", "o_orderkey"),
    }.items()
}

scale("documents", f"t.doc_id + c * {off['doc']} AS doc_id, t.text, t.lang, t.source, t.n_chars")
scale("embeddings", f"t.vec_id + c * {off['vec']} AS vec_id, t.embedding, t.label")
scale(
    "events",
    f"t.event_id + c * {off['ev']} AS event_id, t.ts, "
    f"t.user_id + c * {off['user']} AS user_id, t.event_type, t.value, t.props",
)
scale(
    "customer",
    f"t.c_custkey + c * {off['cust']} AS c_custkey, t.c_name, "
    "t.c_nationkey, t.c_acctbal, t.c_mktsegment",
)
scale(
    "orders",
    f"t.o_orderkey + c * {off['ord']} AS o_orderkey, "
    f"t.o_custkey + c * {off['cust']} AS o_custkey, t.o_orderstatus, t.o_totalprice, "
    "t.o_orderdate, t.o_orderpriority",
)
scale(
    "lineitem",
    f"t.l_orderkey + c * {off['ord']} AS l_orderkey, t.l_partkey, t.l_suppkey, "
    "t.l_linenumber, t.l_quantity, t.l_extendedprice, t.l_discount, t.l_tax, "
    "t.l_returnflag, t.l_linestatus, t.l_shipdate",
)

for t in ["documents", "embeddings", "events", "customer", "orders", "lineitem"]:
    n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n}")
print(f"sf1 fixture at {dst} ({copies} copies of sf0.1 facts)")
