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
    a merged totals object (queries + value), or a driver BENCH_r file
    (parsed.queries). Returns (queries, total)."""
    d = json.load(open(path))
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    q = d["queries"]
    total = d.get("value",
                  sum(q.values()) + sum(d.get("cohort_build_median",
                                              {}).values()))
    return q, total


def main() -> None:
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
