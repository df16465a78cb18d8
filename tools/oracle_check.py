#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate.

Reads the parquet dumps written by `graft.Verify` plus `oracle_sql.json`,
runs each oracle SQL in DuckDB against the same testdata parquet tables,
and compares: row count, column names (sorted), and values (exact for
ints/strings, tolerant-then-exact hashing for floats).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [only1,only2,...]

DuckDB holds instance memory for the life of the process, so a long sweep
in ONE process cascades into spurious "Out of Memory Error" failures at
sf0.1 after the heavy closure oracles (p1/p1b each run ~17-20 min and
poison everything after them). The sweep therefore runs CHUNKED by
default: fresh subprocess per ~3 names, the known-heavy oracles isolated
in their own. Set ORACLE_CHUNK=<n> to change the chunk size, or
ORACLE_CHUNK=0 to force the old single-process inline sweep.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp-ish columns to strings for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    scols, dcols = sorted(spark_df.columns), sorted(duck_df.columns)
    if scols != dcols:
        return [f"columns differ: spark={scols} duck={dcols}"]
    if len(spark_df) != len(duck_df):
        return [f"row count differs: spark={len(spark_df)} duck={len(duck_df)}"]
    a, b = canon(spark_df), canon(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        # The driver hashes raw values, so int64 5 vs float64 5.0 is a FAIL
        # even when numerically equal (DuckDB sum(int) -> HUGEINT -> float64).
        if (av.dtype.kind in "iu") != (bv.dtype.kind in "iu"):
            problems.append(f"col {c}: dtype kind differs: spark={av.dtype} duck={bv.dtype} "
                            f"(cast the oracle, e.g. CAST(sum(..) AS BIGINT))")
            continue
        try:
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                import numpy as np
                aa, bb = av.astype(float).to_numpy(), bv.astype(float).to_numpy()
                nan_match = (pd.isna(aa) == pd.isna(bb)).all()
                close = nan_match and np.allclose(aa[~pd.isna(aa)], bb[~pd.isna(bb)], rtol=0, atol=0)
                if not close:
                    close_tol = nan_match and np.allclose(aa[~pd.isna(aa)], bb[~pd.isna(bb)], rtol=1e-9, atol=1e-9)
                    bad = abs(pd.Series(aa) - pd.Series(bb)).idxmax()
                    problems.append(
                        f"col {c}: float mismatch (exact) tol_ok={close_tol} "
                        f"worst row {bad}: {aa[bad]!r} vs {bb[bad]!r}")
            else:
                eq = (av.fillna("\x00nul") == bv.fillna("\x00nul"))
                if not eq.all():
                    i = eq.idxmin()
                    problems.append(f"col {c}: value mismatch at row {i}: {av[i]!r} vs {bv[i]!r}")
        except Exception as e:  # noqa: BLE001
            problems.append(f"col {c}: compare error {e}")
    return problems


# oracles that need a whole process to themselves (minutes of runtime and
# gigabytes of residue each at sf0.1). x47's full RAG replay joined the
# set in r11 after OOM'ing a shared chunk; in r12 its oracle MATERIALIZED
# the multiply-referenced chunk-embedding pipeline stages (the inlining
# re-expansion was the whole cost: 122 s / OOM-adjacent -> 14 s / 1.4 GB
# peak) and it rejoined the normal chunks. A future surprise of the same
# class costs one auto-retry-solo line, not a poisoned sweep.
HEAVY = {"p1_pipeline", "p1b_pipeline_graded"}


def chunked_main(sf_dir: str, out_dir: str, names: list[str],
                 pre_fail: int = 0) -> None:
    """Run the sweep as fresh `--inline` subprocesses of ~ORACLE_CHUNK names
    each (HEAVY names isolated), aggregating the per-query result lines —
    one command, no OOM residue, no manual re-check pass. Any OOM casualty
    from an UNANTICIPATED heavy oracle is retried solo before the summary,
    so a new memory hog costs one retry line, never a failed sweep."""
    import os
    import re
    import subprocess
    size = int(os.environ.get("ORACLE_CHUNK", "3"))
    chunks: list[list[str]] = []
    light = [n for n in names if n not in HEAVY]
    for i in range(0, len(light), size):
        chunks.append(light[i:i + size])
    chunks += [[n] for n in names if n in HEAVY]
    results: dict[str, str] = {}  # name -> its final result line
    def run(chunk: list[str]) -> None:
        # Exactly-once accounting per oracle (r11 ADVICE): every name in
        # the chunk ends this call with a result line in `results` —
        # parsed from the subprocess if it printed one, synthesized as a
        # FAIL if the subprocess died without reporting it (kernel OOM /
        # crash kills the whole chunk with rc!=0 and NO per-oracle lines,
        # which the old chunk-level counter neither retried nor counted
        # per name). Retries overwrite the same key, so an oracle is
        # never double-counted across chunk + solo passes.
        proc = subprocess.run(
            [sys.executable, __file__, sf_dir, out_dir, ",".join(chunk),
             "--inline"],
            capture_output=True, text=True)
        reported = set()
        for line in proc.stdout.splitlines():
            if re.match(r"== \d+/\d+ oracle-checked", line):
                continue  # per-chunk summary; we print the aggregate
            m = re.match(r"\[(?:ok|FAIL|rows-only)\] ([^:]+):", line)
            if m:
                results[m.group(1)] = line
                reported.add(m.group(1))
            print(line)
        if proc.returncode != 0:
            err = proc.stderr.strip()[-300:].replace("\n", " ")
            for n in chunk:
                if n not in reported:
                    line = (f"[FAIL] {n}: no result line (chunk subprocess "
                            f"rc={proc.returncode}: {err})")
                    results[n] = line
                    print(line)
        sys.stdout.flush()
    for chunk in chunks:
        run(chunk)
    retry = sorted(n for n, l in results.items()
                   if l.startswith("[FAIL]") and
                   ("Out of Memory" in l or "no result line" in l))
    for n in retry:
        print(f"[retry-solo] {n}: chunk died or hit a DuckDB OOM; "
              f"re-running isolated")
        run([n])
    n_ok = sum(1 for l in results.values() if l.startswith("[ok]"))
    n_rows_only = sum(1 for l in results.values() if l.startswith("[rows-only]"))
    n_fail = pre_fail + sum(1 for l in results.values() if l.startswith("[FAIL]"))
    print(f"== {n_ok}/{n_ok + n_fail} oracle-checked ok, "
          f"{n_rows_only} rows-only ==")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional third arg: comma-separated query names (re-check a subset)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    inline = "--inline" in sys.argv[4:] or \
        int(__import__("os").environ.get("ORACLE_CHUNK", "3")) == 0
    if not inline:
        oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
        names = sorted(d.name for d in Path(out_dir).iterdir() if d.is_dir())
        if only is not None:
            names = [n for n in names if n in only]
        scope = only if only is not None else set(oracle)
        miss = sorted(n for n in scope
                      if n in oracle and n not in set(names))
        for m in miss:
            print(f"[FAIL] {m}: oracle present but no spark output")
        chunked_main(sf_dir, out_dir, names, pre_fail=len(miss))
        return

    # one FRESH connection per query: a shared connection accumulates
    # buffer/temp memory across 200+ oracles and at sf0.1 eventually turns
    # every later query into a spurious "Out of Memory Error" cascade
    def connect():
        con = duckdb.connect()
        # the comparison sorts both frames, so result order is free to
        # drop — and preserving it is what pinned x47's full-replay
        # oracle above DuckDB's 100 GiB ceiling at sf0.1 (OOM with
        # spilling never engaging); unordered it runs in ~2 min
        con.execute("SET preserve_insertion_order=false")
        for t in TABLES:
            p = Path(sf_dir) / f"{t}.parquet"
            if p.exists():
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        return con

    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_ok = 0
    names = sorted(d.name for d in Path(out_dir).iterdir() if d.is_dir())
    if only is not None:
        names = [n for n in names if n in only]
        oracle = {k: v for k, v in oracle.items() if k in only}
    for name in names:
        spark_df = pd.read_parquet(Path(out_dir) / name)
        if name not in oracle:
            print(f"[rows-only] {name}: {len(spark_df)} rows")
            continue
        try:
            con = connect()
            try:
                duck_df = con.execute(oracle[name]).df()
            finally:
                con.close()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            continue
        problems = compare(name, spark_df, duck_df)
        if problems:
            print(f"[FAIL] {name}:")
            for p in problems:
                print(f"       {p}")
        else:
            n_ok += 1
            print(f"[ok] {name}: {len(spark_df)} rows")
    missing = sorted(set(oracle) - set(names))
    for m in missing:
        print(f"[FAIL] {m}: oracle present but no spark output")
    print(f"== {n_ok}/{len([n for n in names if n in oracle])} oracle-checked ok, "
          f"{len([n for n in names if n not in oracle])} rows-only ==")


if __name__ == "__main__":
    main()
