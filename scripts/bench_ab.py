#!/usr/bin/env python3
"""A/B a bench run (target/bench_result.json) against bench_baseline.json.

Usage: python3 scripts/bench_ab.py [run.json [baseline.json]]

Prints the run's median per-query ratio vs baseline (the CLAUDE.md load
indicator), the >2x tail, and the biggest improvements. Used when deciding
whether a run is calm enough to re-pin the baseline from.
"""
import json
import statistics
import sys


def queries(path):
    with open(path) as f:
        d = json.load(f)
    return d["queries"] if "queries" in d else d


def main():
    run_path = sys.argv[1] if len(sys.argv) > 1 else "target/bench_result.json"
    base_path = sys.argv[2] if len(sys.argv) > 2 else "bench_baseline.json"
    run, base = queries(run_path), queries(base_path)
    common = sorted(set(run) & set(base))
    ratios = {q: run[q] / base[q] for q in common if base[q] > 0 and run[q] > 0}
    med = statistics.median(ratios.values())
    print(f"queries: run={len(run)} base={len(base)} common={len(common)}")
    print(f"totals:  run={sum(run.values()):.1f}s base={sum(base.values()):.1f}s")
    print(f"median per-query ratio: {med:.3f}  (calm ~1.0; >1.3 = loaded run)")
    tail = sorted((r, q) for q, r in ratios.items() if r > 2 and base[q] > 0.5)
    print(f"\n>2x regressions (baseline >0.5s): {len(tail)}")
    for r, q in reversed(tail):
        print(f"  {q:28s} {base[q]:7.3f} -> {run[q]:7.3f}  ({r:.2f}x)")
    watch = sorted((r, q) for q, r in ratios.items()
                   if 1.5 < r <= 2 and base[q] > 0.5)
    print(f"\n1.5-2x watchlist (baseline >0.5s): {len(watch)}")
    for r, q in reversed(watch):
        print(f"  {q:28s} {base[q]:7.3f} -> {run[q]:7.3f}  ({r:.2f}x)")
    imp = sorted((r, q) for q, r in ratios.items() if r < 0.5 and base[q] > 0.5)
    print(f"\n<0.5x improvements (baseline >0.5s): {len(imp)}")
    for r, q in imp:
        print(f"  {q:28s} {base[q]:7.3f} -> {run[q]:7.3f}  ({r:.2f}x)")
    only_run = set(run) - set(base)
    if only_run:
        print(f"\nqueries missing from baseline: {sorted(only_run)}")


if __name__ == "__main__":
    main()
