#!/usr/bin/env python3
"""Replicate an sf directory K times with shifted keys -> a larger perf-test
corpus (dev-only; no oracle runs against it). Text/embeddings replicate
byte-identically, so the output is a duplicate-heavy corpus: every document
gains K-1 exact twins -- the adversarial case for the dedup pack.

Usage: gen_scaled.py <src_sf_dir> <dst_dir> [K=10]
"""
import sys
import duckdb

SRC, DST = sys.argv[1], sys.argv[2]
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# per-table key columns to shift by i*STRIDE per replica (refs stay aligned:
# orders.o_custkey shifts with customer.c_custkey, lineitem.l_orderkey with
# orders.o_orderkey; dims nation/region/part/supplier stay fixed).
STRIDE = 10_000_000
SHIFTS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
}
COPY_AS_IS = ["nation", "region", "part", "supplier"]

con = duckdb.connect()
import os
os.makedirs(DST, exist_ok=True)
for t in COPY_AS_IS:
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")
for t, keys in SHIFTS.items():
    cols = [f.strip('"') for f in con.execute(
        f"SELECT name FROM pragma_table_info(\"sel\")") .fetchall()] if False else None
    schema = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
    sel = ", ".join(
        f"({c} + i.i * {STRIDE})::BIGINT AS {c}" if c in keys else c
        for c in schema)
    con.execute(
        f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', range({K}) AS i(i)) "
        f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows ({K}x)")
