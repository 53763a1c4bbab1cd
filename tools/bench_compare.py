#!/usr/bin/env python
"""Compare the latest bench run against prior runs per query.

Reads BENCH_HISTORY.jsonl (appended by bench.py), groups runs by scale
factor, and for the most recent run flags per-query regressions a
stable-looking total hides. Exit code 1 if any query regressed (so the
verify recipe can gate on it); 0 otherwise.

Methodology (VERDICT r4 item 4 — the ambient-drift fix):

1. Baseline = MEDIAN of each query's prior recorded times at the same sf
   (one lucky run on a quiet machine used to poison a best-prior
   baseline; ``--vs-best`` restores the strict comparator for gating).
2. AMBIENT DRIFT NORMALIZATION: local[32] wall time swings up to ±30%
   across days with zero code change — uniformly, across all queries.
   The comparator estimates the run's drift as the median of per-query
   ratios (latest/baseline over the >=MIN_SECONDS shared set) and flags
   only queries slower than ``factor × drift-adjusted baseline``: a
   uniform 1.25x-slower day moves every ratio but no RELATIVE ratio, so
   nothing is flagged; a single query that regressed 2x still sticks out.
3. VARIANCE BAND: bench.py records each query's within-run relative
   spread (median-of-3 sampling). A flag additionally requires the
   excess over the drift-adjusted baseline to exceed the measured
   within-run spread — a query whose own three samples disagree by more
   than its apparent regression is jitter, not signal.

Usage: python tools/bench_compare.py [path-to-history] [--factor 1.3]
                                     [--vs-best] [--no-drift]
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
    no_drift = "--no-drift" in sys.argv
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
    # rows marked exclude_from_baseline are adjudicated ambient-skewed
    # records (e.g. the three r10 runs captured under a ~1.4x host
    # slowdown — VERDICT r10 advisory 2): kept in the file as history,
    # never used as a comparison baseline
    prior = [
        r
        for r in runs[:-1]
        if r.get("sf") == latest.get("sf")
        and not r.get("exclude_from_baseline")
    ]
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

    # ambient-drift estimate: median latest/baseline ratio over the
    # material shared queries; clamped below at 1.0 so a FAST day never
    # relaxes the gate (speedups are free, slowdowns are graded)
    ratios = [
        t / baseline[q]
        for q, t in latest["queries"].items()
        if q in baseline and t >= MIN_SECONDS and baseline[q] > 0
    ]
    drift = 1.0
    if ratios and not no_drift:
        drift = max(1.0, statistics.median(ratios))
    spread = latest.get("spread", {})  # within-run rel spread (may be absent pre-r5)

    regressed = []
    for q, t in latest["queries"].items():
        if q not in baseline or t < MIN_SECONDS:
            continue
        adj_base = baseline[q] * drift
        # excess must beat the measured within-run jitter AND an absolute
        # floor: a quarter second of movement on local[32] is GC/JIT
        # noise regardless of the ratio it happens to produce
        band = max(spread.get(q, 0.0) * t, 0.25)
        if t > factor * adj_base and (t - adj_base) > band:
            regressed.append((q, baseline[q], adj_base, t))
    prior_totals = min(r["value"] for r in prior)
    print(
        f"bench_compare: latest total {latest['value']}s vs best prior "
        f"{prior_totals}s at sf={latest.get('sf')} ({len(prior)} prior runs, "
        f"{mode} baseline, ambient drift {drift:.2f}x over {len(ratios)} shared queries)"
    )
    if regressed:
        print(
            f"REGRESSIONS (> {factor}x drift-adjusted {mode} prior, "
            f">= {MIN_SECONDS}s, beyond within-run spread):"
        )
        for q, b, ab, t in sorted(regressed, key=lambda x: x[3] / x[2], reverse=True):
            print(f"  {q}: {b:.3f}s (adj {ab:.3f}s) -> {t}s ({t / ab:.2f}x)")
        return 1
    print("no per-query regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
