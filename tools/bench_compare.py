#!/usr/bin/env python
"""Compare the latest bench run against prior runs per query.

Reads BENCH_HISTORY.jsonl (appended by bench.py), groups runs by scale
factor, and for the most recent run flags every query slower than
REGRESSION_FACTOR x its baseline at the same sf — the per-query
regressions a stable-looking total hides. Exit code 1 if any query
regressed (so the verify recipe can gate on it); 0 otherwise.

The default baseline is the MEDIAN of each query's prior times: one
lucky run on a quiet machine used to poison the best-prior baseline and
flag ambient drift (uniform ~1.3x swings on local[32] were repeatedly
chased and never real — see CLAUDE.md round-4 notes). The median
tolerates both lucky and contended outliers. ``--vs-best`` restores the
strict comparator for release gating.

Usage: python tools/bench_compare.py [path-to-history] [--factor 1.3]
                                     [--vs-best]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REGRESSION_FACTOR = 1.3
#: ignore sub-threshold queries: at sf0.1 a 0.3s query jitters well past
#: 1.3x from GC/JIT noise alone; regressions that matter move real time
MIN_SECONDS = 0.5


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    factor = REGRESSION_FACTOR
    vs_best = "--vs-best" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--factor"):
            factor = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    path = args[0] if args else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_HISTORY.jsonl",
    )
    if not os.path.exists(path):
        print(f"bench_compare: no history at {path} (first run?) — nothing to compare")
        return 0
    runs = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                runs.append(json.loads(line))
    if not runs:
        print("bench_compare: empty history — nothing to compare")
        return 0
    latest = runs[-1]
    prior = [r for r in runs[:-1] if r.get("sf") == latest.get("sf")]
    if not prior:
        print(
            f"bench_compare: first recorded run at sf={latest.get('sf')} "
            f"(total {latest['value']}s over {len(latest['queries'])} queries) — baseline set"
        )
        return 0
    times: dict[str, list[float]] = {}
    for r in prior:
        for q, t in r["queries"].items():
            times.setdefault(q, []).append(t)
    baseline = {
        q: (min(ts) if vs_best else statistics.median(ts))
        for q, ts in times.items()
    }
    mode = "best" if vs_best else "median"
    regressed = []
    for q, t in latest["queries"].items():
        if q in baseline and t > factor * baseline[q] and t >= MIN_SECONDS:
            regressed.append((q, baseline[q], t))
    prior_totals = min(r["value"] for r in prior)
    print(
        f"bench_compare: latest total {latest['value']}s vs best prior "
        f"{prior_totals}s at sf={latest.get('sf')} ({len(prior)} prior runs, "
        f"{mode} baseline)"
    )
    if regressed:
        print(f"REGRESSIONS (> {factor}x {mode} prior, >= {MIN_SECONDS}s):")
        for q, b, t in sorted(regressed, key=lambda x: x[2] / x[1], reverse=True):
            print(f"  {q}: {b:.3f}s -> {t}s ({t / b:.2f}x)")
        return 1
    print("no per-query regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
