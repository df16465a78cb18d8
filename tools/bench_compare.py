#!/usr/bin/env python3
"""Compare two graft.Bench JSON outputs per query.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [top_n]

Prints per-query ratios (new/old) sorted by regression severity, plus
totals. Use per-query ratios, not totals, on this machine — wall-clock
varies ±40% run to run (see NOTES.md).
"""
import json
import sys


def load(path):
    """Accept a per-query sidecar (queries + optional cohort_build_median),
    a merged totals object (queries + value), or a driver BENCH_r file.
    Driver files carry only the totals line in `parsed` (no per-query map;
    r01/r02 have parsed:null) — recover the per-query line from `tail`,
    or follow parsed.queries_file to an archived sidecar next to the
    driver file (BENCH_QUERIES_r{N}.json). Returns (queries, total)."""
    d = json.load(open(path))
    total_hint = None
    if "parsed" in d:
        p = d["parsed"]
        if isinstance(p, dict):
            total_hint = p.get("value")
        if isinstance(p, dict) and "queries" in p:
            d = p
        else:
            # per-query JSON line embedded in the kept stdout tail?
            found = None
            for line in reversed(d.get("tail", "").splitlines()):
                line = line.strip()
                if line.startswith("{") and '"queries"' in line:
                    try:
                        cand = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if "queries" in cand:
                        found = cand
                        break
            if found is None:
                # the tail is size-capped and usually cuts the per-query
                # line mid-JSON; prefer the round-matched archived sidecar
                # (BENCH_QUERIES_r{N}.json beside BENCH_r{N}.json) over the
                # live queries_file, which later rounds overwrite
                import pathlib
                import re
                fp = pathlib.Path(path)
                cands = []
                m = re.search(r"BENCH_(r\d+)\.json$", fp.name)
                if m:
                    cands.append(fp.parent / f"BENCH_QUERIES_{m.group(1)}.json")
                live = []
                if isinstance(p, dict) and p.get("queries_file"):
                    live += [fp.parent / p["queries_file"],
                             pathlib.Path(p["queries_file"])]
                for side in cands + live:
                    if side.is_file():
                        cand = json.load(open(side))
                        if side in live:
                            # the live sidecar is overwritten every round —
                            # it may belong to a NEWER round than this
                            # driver file; only trust it when the stat label
                            # matches, and say what happened either way
                            if cand.get("stat") != p.get("stat"):
                                print(f"note: skipping stale live sidecar "
                                      f"{side} (stat {cand.get('stat')!r} != "
                                      f"{p.get('stat')!r})", file=sys.stderr)
                                continue
                            print(f"warning: {path}: using live sidecar "
                                  f"{side}, which later rounds overwrite — "
                                  "archive it as BENCH_QUERIES_r{N}.json",
                                  file=sys.stderr)
                        found = cand
                        break
            if found is None:
                sys.exit(f"{path}: driver file has no per-query data: the "
                         "tail holds no queries line and no sidecar from "
                         "parsed.queries_file is readable. Archive the "
                         "round's BENCH_QUERIES.json (BENCH_QUERIES_r{N}"
                         ".json) or pass the sidecar directly.")
            d = found
    q = d["queries"]
    total = d.get("value", total_hint)
    if total is None:
        total = sum(q.values()) + sum(d.get("cohort_build_median",
                                            {}).values())
    return q, total


def main() -> None:
    if len(sys.argv) < 3 or sys.argv[1] in ("-h", "--help"):
        sys.exit("usage: bench_compare.py <old.json> <new.json> [top_n]")
    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    oq, old_total = load(old_path)
    nq, new_total = load(new_path)
    print(f"old total {old_total:.1f}s/{len(oq)}q   "
          f"new total {new_total:.1f}s/{len(nq)}q")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print("added:", ", ".join(added))
    if removed:
        print("removed:", ", ".join(removed))
    common = [(nq[k] / max(oq[k], 1e-9), oq[k], nq[k], k)
              for k in sorted(set(oq) & set(nq))]
    print(f"\n{'ratio':>7} {'old_s':>8} {'new_s':>8}  query (worst regressions first)")
    for ratio, o, n, k in sorted(common, reverse=True)[:top_n]:
        flag = " <-- regression" if ratio > 1.5 and n > 1.0 else ""
        print(f"{ratio:7.2f} {o:8.2f} {n:8.2f}  {k}{flag}")


if __name__ == "__main__":
    main()
