#!/usr/bin/env python3
"""Render a scale-capstone per-cohort table from Bench's incremental
cohort JSONL (SPARK_GRAFT_COHORT_JSONL) against a 1x per-query sidecar
(BENCH_QUERIES_rN.json), in the NOTES round-10 capstone format.

Usage: python3 tools/capstone_table.py <cohorts.jsonl> <baseline_sidecar.json>
       [outlier_ratio]

Resume-aware: unparseable (partial) lines and lines with a non-empty
`failed` list are skipped, and when a (pass, cohort) key repeats (kill +
re-run), only the LAST clean line counts — matching Bench's own resume
loader.

Only queries present in BOTH files enter the comparison (the capstone may
exclude adjudicated brute-force diagnostics), so the 1x sums are over the
same query set as the scaled sums. Build = cold - warm per cohort (single
pass); the 1x build column reads the sidecar's cohort_build_median.
Per-query outliers above outlier_ratio (default 20x) print below the
table for adjudication.
"""
import json
import sys


def main():
    jsonl, base_path = sys.argv[1], sys.argv[2]
    outlier_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
    base = json.load(open(base_path))
    base_q = base["queries"]
    base_build = base.get("cohort_build_median", {})
    # Mirror Bench's resume semantics over the raw JSONL: killed/resumed
    # sweeps legitimately contain a partial trailing line, lines with a
    # non-empty `failed` list (fast-fail millisecond timings), and a clean
    # re-run line for the same (pass, cohort) key — keep only the last
    # clean line per key so failures and duplicates never enter the sums.
    by_key = {}
    seen_cohorts = set()
    for ln in open(jsonl):
        ln = ln.strip()
        if not ln:
            continue
        try:
            r = json.loads(ln)
        except json.JSONDecodeError:
            print(f"<!-- skipped unparseable line (partial write?) -->")
            continue
        seen_cohorts.add(r.get("cohort"))
        if r.get("failed"):
            print(f"<!-- {r.get('cohort')}: skipped line with failures: "
                  f"{','.join(r['failed'])} -->")
            continue
        by_key[(r.get("pass"), r.get("cohort"))] = r
    rows = list(by_key.values())
    # A cohort whose every line failed would otherwise vanish silently and
    # the table read as complete while covering fewer cohorts — same for a
    # baseline cohort with no scaled line at all. Warn VISIBLY + exit 1.
    clean_cohorts = {r["cohort"] for r in rows}
    dropped = sorted(seen_cohorts - clean_cohorts - {None})
    missing = sorted(set(base.get("cohort_build_median", {})) - seen_cohorts)
    print(f"| cohort | 1x warm | 100x warm | ratio | 1x build | 100x build |")
    print("|---|---|---|---|---|---|")
    tot1 = totN = 0.0
    outliers = []
    for r in rows:
        names = [n for n in r["warm"] if n in base_q]
        skipped = sorted(set(r["warm"]) - set(names))
        if skipped:
            print(f"<!-- {r['cohort']}: not in baseline, skipped: "
                  f"{','.join(skipped)} -->")
        w1 = sum(base_q[n] for n in names)
        wN = sum(r["warm"][n] for n in names)
        # replay rows (streaming re-consume per call): their cold-warm is
        # noise, not build cost — mirror Bench's cohort_build exclusion
        replay = set(r.get("replay", []))
        nonreplay = [n for n in names if n not in replay]
        bN = max(0.0, sum(r["cold"][n] for n in nonreplay)
                 - sum(r["warm"][n] for n in nonreplay))
        b1 = base_build.get(r["cohort"], float("nan"))
        tot1 += w1
        totN += wN
        ratio = wN / w1 if w1 > 0 else float("nan")
        print(f"| {r['cohort']} | {w1:.1f} | {wN:.1f} | {ratio:.1f}x "
              f"| {b1:.1f} | {bN:.1f} |")
        for n in names:
            if base_q[n] > 0 and r["warm"][n] / base_q[n] >= outlier_ratio:
                outliers.append((r["warm"][n] / base_q[n], n,
                                 base_q[n], r["warm"][n],
                                 " [replay]" if n in replay else ""))
    for c in dropped:
        print(f"| {c} | — | — | NO CLEAN LINE (all failed) | — | — |")
    for c in missing:
        print(f"| {c} | — | — | ABSENT FROM JSONL | — | — |")
    if tot1 > 0:
        print(f"| TOTAL | {tot1:.1f} | {totN:.1f} | {totN / tot1:.1f}x | | |")
    if dropped or missing:
        print(f"\nWARNING: incomplete capstone — "
              f"dropped={','.join(dropped) or 'none'} "
              f"missing={','.join(missing) or 'none'}")
    if outliers:
        print(f"\nper-query warm outliers (>= {outlier_ratio:g}x):")
        for ratio, n, v1, vN, tag in sorted(outliers, reverse=True):
            print(f"- {n}: {v1:.2f} -> {vN:.2f} s ({ratio:.1f}x){tag}")
    if dropped or missing:
        sys.exit(1)


if __name__ == "__main__":
    main()
