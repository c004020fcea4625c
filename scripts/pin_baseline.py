#!/usr/bin/env python3
"""Pin bench_baseline.json entries from a calm run, safely.

Usage: python3 scripts/pin_baseline.py run.json [--apply] [query ...]

Encodes the CLAUDE.md baseline protocol so summary fields can't drift
again (the round-9 advice: "value"/"nqueries" disagreed with the pinned
per-query map after manual appends):

 - Computes the run's MEDIAN per-query ratio vs the existing baseline
   (the load indicator). Entries are pinned at run_time / median, so a
   run captured under host load doesn't deflate the baseline.
 - With query args: pins only those queries (new queries pin at the
   deflated run time). Without: pins only queries MISSING from the
   baseline (never silently re-pins existing entries).
 - Always regenerates "value" = sum of entries and "nqueries" = map
   size from the final per-query map.
 - Dry-run by default; --apply writes the file.
"""
import json
import statistics
import sys


def main():
    args = [a for a in sys.argv[1:] if a != "--apply"]
    apply = "--apply" in sys.argv
    run_path, targets = args[0], set(args[1:])
    with open(run_path) as f:
        run = json.load(f)
    run_q = run["queries"] if "queries" in run else run
    with open("bench_baseline.json") as f:
        base = json.load(f)
    base_q = base["queries"]
    ratios = [run_q[q] / base_q[q] for q in run_q
              if q in base_q and base_q[q] > 0 and run_q[q] > 0]
    med = statistics.median(ratios) if ratios else 1.0
    print(f"median run/baseline ratio: {med:.3f} "
          f"(entries pinned at run_time / median)")
    pins = targets if targets else {q for q in run_q if q not in base_q}
    for q in sorted(pins):
        if q not in run_q or run_q[q] <= 0:
            print(f"  SKIP {q}: not in run / failed (-1)")
            continue
        val = round(run_q[q] / med, 6)
        old = base_q.get(q)
        base_q[q] = val
        print(f"  pin {q}: {old} -> {val}")
    base["value"] = round(sum(base_q.values()), 3)
    base["nqueries"] = len(base_q)
    print(f"summary: value={base['value']} nqueries={base['nqueries']}")
    if apply:
        with open("bench_baseline.json", "w") as f:
            json.dump(base, f, indent=1)
        print("written")
    else:
        print("dry run (pass --apply to write)")


if __name__ == "__main__":
    main()
