"""Quantitative error-bound evidence for the three rows-only registry
entries (VERDICT r1 §6): the sketches and the numpy fit have no SQL oracle
by construction, so these tests pin them to their exact twins instead —
HLL within its advertised rsd, KLL within its rank-error guarantee, the
per-user least-squares slope equal to a driver-side closed-form recompute.
Run at sf0.01 (the driver's correctness SF), not the smaller test default.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_engineer_interview_task_spark.operators import extended, multimodal
from data_engineer_interview_task_spark.sources import read_table

SF001 = "/root/testdata/sf0.01"


def test_hll_distinct_within_rsd_bound(spark):
    """approx_count_distinct(rsd=0.02): the estimate's standard error is
    rsd * true_count. Assert every supplier is within 5 sigma (no single
    gross outlier) and the mean relative error is within 2 sigma — the
    statistical contract the sketch replaces countDistinct for at scale.

    The query itself carries both columns, so the bound needs no second
    aggregation pass."""
    rows = extended.approx_distinct_parts(spark, SF001).collect()
    assert rows
    rel_errs = []
    for r in rows:
        err = abs(r.approx_parts - r.exact_parts)
        # small-cardinality regime uses exact linear counting -> tiny err
        assert err <= max(3.0, 5 * 0.02 * r.exact_parts), (
            r.l_suppkey,
            r.approx_parts,
            r.exact_parts,
        )
        rel_errs.append(err / r.exact_parts if r.exact_parts else 0.0)
    assert sum(rel_errs) / len(rel_errs) <= 2 * 0.02


@pytest.mark.parametrize("col_p", [("q25", 0.25), ("median", 0.5),
                                   ("q75", 0.75), ("q95", 0.95)])
def test_kll_percentile_within_rank_error(spark, col_p):
    """percentile_approx(accuracy=10000) guarantees the returned value is a
    real element whose rank is within eps = 1/accuracy of the target.
    Check against the fully-sorted per-flag quantity arrays with a +/-1
    slack for the floor/ceil convention at group-size ~20k."""
    col, p = col_p
    approx = {
        r.l_returnflag: r[col]
        for r in extended.approx_quantity_percentiles(spark, SF001).collect()
    }
    li = read_table(spark, SF001, "lineitem")
    eps = 1.0 / 10000
    for flag, got in approx.items():
        vals = sorted(
            r.l_quantity
            for r in li.filter(F.col("l_returnflag") == flag)
            .select("l_quantity")
            .collect()
        )
        n = len(vals)
        lo = vals[max(0, math.floor((p - eps) * (n - 1)) - 1)]
        hi = vals[min(n - 1, math.ceil((p + eps) * (n - 1)) + 1)]
        assert lo <= got <= hi, (flag, col, got, lo, hi)
        assert got in set(vals)  # a genuine element, not an interpolation


def test_user_value_trend_matches_closed_form_all_users(spark):
    """Every user's fitted slope/mean (not a single spot-check) equals the
    closed-form least-squares recompute on driver-collected events at
    sf0.01 — the strongest non-oracle evidence available for the
    applyInPandas path."""
    import numpy as np

    out = {
        r.user_id: r for r in multimodal.user_value_trend(spark, SF001).collect()
    }
    events = read_table(spark, SF001, "events")
    by_user: dict[int, list] = {}
    for r in events.select("user_id", "ts", "value").collect():
        by_user.setdefault(r.user_id, []).append(r)
    assert set(out) == set(by_user)
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: r.ts)
        t = np.array([r.ts.timestamp() / 86400.0 for r in rows])
        v = np.array([r.value for r in rows], dtype=float)
        if len(v) >= 2 and np.ptp(t) > 0:
            t0 = t - t.mean()
            want = float((t0 * (v - v.mean())).sum() / (t0 * t0).sum())
        else:
            want = 0.0
        assert abs(out[uid].slope_per_day - want) <= 1e-9 * max(1.0, abs(want)), uid
        assert abs(out[uid].mean_value - float(v.mean())) <= 1e-9
        assert out[uid].n_events == len(rows)


def test_count_min_one_sided_error(spark, sf_dir):
    """CM guarantee: estimate >= truth for every candidate, and the
    overshoot is bounded by corpus_tokens/width per row (loose check at
    3x slack for the min-over-depth)."""
    from pyspark.sql import functions as F

    from data_engineer_interview_task_spark.operators import text
    from data_engineer_interview_task_spark.sources import read_table

    rows = text.count_min_heavy_hitters(spark, sf_dir).collect()
    assert rows
    total_tokens = (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .filter("t <> ''")
        .count()
    )
    for r in rows:
        assert r.n_est >= r.n_true, (r.token, r.n_est, r.n_true)
        assert r.n_est - r.n_true <= 3 * total_tokens / 256, r


def test_hll_union_rollup_error_bound(spark, sf_dir):
    """Merged daily sketches must estimate weekly distinct users within
    5% of the exact count (lgK=12 default => ~1.6% std error) — and the
    exact column is itself independently computed, so the row also
    sanity-checks the week bucketing."""
    from data_engineer_interview_task_spark.operators import extended

    rows = extended.hll_union_weekly_users(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.exact_users > 0
        assert abs(r.approx_users - r.exact_users) <= max(
            2, 0.05 * r.exact_users
        ), (r.week_start, r.event_type, r.approx_users, r.exact_users)
