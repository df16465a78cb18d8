#!/usr/bin/env python3
"""Compare two graft.Verify output dirs (engine-vs-engine, e.g. different
partition counts): same queries, same columns, same sorted values.

Usage: python3 tools/dump_compare.py <dirA> <dirB>
"""
import sys
from pathlib import Path

import duckdb


def main() -> None:
    a, b = Path(sys.argv[1]), Path(sys.argv[2])
    names = sorted(p.name for p in a.iterdir() if p.is_dir())
    names_b = {p.name for p in b.iterdir() if p.is_dir()}
    missing = [n for n in names if n not in names_b]
    extra = sorted(names_b - set(names))
    if missing:
        print("missing in B:", missing)
    if extra:
        print("only in B:", extra)
    bad = len(missing) + len(extra)
    for n in names:
        if n not in names_b:
            continue
        qa = f"SELECT * FROM '{a / n}/*.parquet'"
        qb = f"SELECT * FROM '{b / n}/*.parquet'"
        try:
            diff = duckdb.sql(
                f"SELECT count(*) FROM (({qa} EXCEPT ALL {qb}) UNION ALL ({qb} EXCEPT ALL {qa}))"
            ).fetchone()[0]
        except Exception as e:  # schema mismatch etc.
            print(f"[ERR] {n}: {e}")
            bad += 1
            continue
        if diff:
            print(f"[DIFF] {n}: {diff} asymmetric rows")
            bad += 1
        else:
            print(f"[ok] {n}")
    total = len(set(names) | names_b)
    print(f"== {total - bad}/{total} identical ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
