#!/usr/bin/env python3
"""Render BASELINE_BENCH.md — the per-query honest-median baseline table —
from a Bench run's bench.json (round-7 directive, landed round 9).

Usage: python3 tools/bench_table.py [bench.json] [> BASELINE_BENCH.md]

The table records, per registered bench query, the cold (first-run) time and
the noise-robust median (3- or 5-sample, model caches cleared between reps —
see Bench.scala's methodology scaladoc). Future rounds adjudicate movers
against THIS table instead of re-deriving a baseline from memory each time.
"""
import json
import sys
from datetime import date


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "bench.json"
    with open(path) as f:
        b = json.load(f)
    cold = b["queries"]
    med = b.get("queries_median", {})
    print("# Per-query bench baseline (honest medians)")
    print()
    print(f"Generated {date.today().isoformat()} from `{path}` "
          f"(sf `{b['sf']}`, local[32]).")
    print(f"Total {b['value']:.1f} s cold / {b['median_total']:.1f} s median; "
          f"failed: {b['failed'] or 'none'}.")
    print()
    print("Median methodology: EVERY query reruns 2x (4x when cold is under "
          "2 s) — no single-sample entries (round-10 fix: the >=15 s tier "
          "used to get one sample, exactly where a contended sample poisons "
          "the baseline); the median is over cold+reruns with the library's "
          "model/candidate caches cleared before every rerun, so it measures "
          "steady-state computation, not a memo lookup. `_`-prefixed rows "
          "are engine fixtures (warmup, layout demos), not queries.")
    print()
    print("| query | cold s | median s |")
    print("|---|---:|---:|")
    for name in sorted(cold):
        c = cold[name]
        m = med.get(name)
        ms = f"{m:.3f}" if m is not None else "—"
        print(f"| {name} | {c:.3f} | {ms} |")


if __name__ == "__main__":
    main()
