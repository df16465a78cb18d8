#!/usr/bin/env python3
"""Replicate an sf directory K times with shifted keys -> a larger perf-test
corpus (dev-only; no oracle runs against it). Text/embeddings replicate
byte-identically, so the output is a duplicate-heavy corpus: every document
gains K-1 exact twins -- the adversarial case for the dedup pack.

Usage: gen_scaled.py <src_sf_dir> <dst_dir> [K=10] [--fixed-eval]

--fixed-eval holds the decontamination eval splits at their 1x membership
while the corpus side still scales Kx: replicas i>0 drop embeddings rows
with vec_id %% 10 = 0 (x86's eval split) and documents rows with
doc_id %% 20 = 0 (x19/x34/x77's). The key stride (10M) preserves both
mods, so without this flag every replica lands IN the eval split too and
eval-vs-corpus probes measure K^2 pair growth instead of operator scaling
(the r10 x86c artifact). Use fixed-eval corpora for decontamination scale
probes; plain mode remains the adversarial duplicate-heavy corpus.
"""
import sys
import duckdb

SRC, DST = sys.argv[1], sys.argv[2]
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
FIXED_EVAL = "--fixed-eval" in sys.argv[4:]
# replica filter per table: keep replica 0 whole; i>0 keep corpus side only
EVAL_FILTER = {
    "embeddings": "vec_id % 10 <> 0",
    "documents": "doc_id % 20 <> 0",
} if FIXED_EVAL else {}

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
    where = (f"WHERE i.i = 0 OR ({EVAL_FILTER[t]}) "
             if t in EVAL_FILTER else "")
    con.execute(
        f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', range({K}) AS i(i) "
        f"{where}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows ({K}x{', fixed-eval' if t in EVAL_FILTER else ''})")
