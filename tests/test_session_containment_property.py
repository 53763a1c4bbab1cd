"""Property tests for the round-4 semantics that have sharp boundary
rules: the built-in session_window merge condition (exact-gap ties start
a NEW session — `>=`, not `>`) and shingle-containment pairs — both
against pure-python reference models over randomized inputs. The fixture
oracles pin values on real data; these pin the RULES on adversarial
cases the fixtures may never hit (exact 30-minute gaps, subset docs)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

GAP_MIN = 30
BASE = dt.datetime(2024, 1, 1)

# offsets in MINUTES, deliberately includes exact multiples of the gap
OFFSETS = st.lists(
    st.integers(min_value=0, max_value=300).map(lambda m: m),
    min_size=1,
    max_size=12,
)


def _model_sessions(minutes):
    """Python reference for session_window: sorted event times, new
    session iff gap is STRICTLY GREATER than GAP_MIN — touching windows
    ([t, t+gap) meeting the session end exactly) MERGE, which this
    suite's falsifying example [0, 30] proved against a >= model (the
    originally documented rule was wrong; fixture microsecond times
    never produce exact ties, so only the property test could catch
    it); emits (start, end=last+gap, n)."""
    ts = sorted(BASE + dt.timedelta(minutes=m) for m in set(minutes))
    out, start, last, n = [], ts[0], ts[0], 1
    for t in ts[1:]:
        if (t - last).total_seconds() > GAP_MIN * 60:
            out.append((start, last + dt.timedelta(minutes=GAP_MIN), n))
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1
    out.append((start, last + dt.timedelta(minutes=GAP_MIN), n))
    return sorted(out)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(OFFSETS)
def test_session_window_merge_rule_matches_model(spark, minutes):
    df = spark.createDataFrame(
        [(1, BASE + dt.timedelta(minutes=m)) for m in set(minutes)],
        "user_id long, ts timestamp",
    )
    got = sorted(
        (r.start, r.end, r.n)
        for r in df.groupBy(F.session_window("ts", f"{GAP_MIN} minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("session_window.start").alias("start"),
            F.col("session_window.end").alias("end"),
            "n",
        )
        .collect()
    )
    assert got == _model_sessions(minutes)


DOCS = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
        min_size=3,
        max_size=9,
    ),
    min_size=2,
    max_size=6,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(DOCS)
def test_containment_pairs_match_model(spark, tmp_path_factory, token_docs):
    """ngram_containment_pairs on a synthesized corpus == the quadratic
    python definition (3-gram shingle sets, max-direction threshold)."""
    from data_engineer_interview_task_spark.operators import dedup

    tmp = tmp_path_factory.mktemp("cont")
    rows = [
        (i, " ".join(toks), "en", "src0", len(" ".join(toks)))
        for i, toks in enumerate(token_docs)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    def shingles(toks):
        if len(toks) < 3:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    expected = set()
    for a in range(len(token_docs)):
        for b in range(a + 1, len(token_docs)):
            sa, sb = shingles(token_docs[a]), shingles(token_docs[b])
            shared = len(sa & sb)
            if shared and max(shared / len(sa), shared / len(sb)) >= 0.6:
                expected.add((a, b))

    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_containment_pairs(spark, str(tmp)).collect()
    }
    assert got == expected


ASOF_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user key
        st.integers(min_value=0, max_value=20),  # day offset
    ),
    min_size=1,
    max_size=8,
)
ASOF_ORDERS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=20),
    ),
    min_size=0,
    max_size=8,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ASOF_EVENTS, ASOF_ORDERS)
def test_asof_forward_matches_model(spark, tmp_path_factory, events, orders):
    """Forward as-of against a quadratic python model on random (user,
    day) sets — DAY-granular event times make event==order instants
    common, exercising the strictness rule (same-instant orders must NOT
    attribute) far more often than the microsecond fixture can."""
    from data_engineer_interview_task_spark.operators import relational

    tmp = tmp_path_factory.mktemp("asof")
    ev_rows = [
        (i, BASE + dt.timedelta(days=d), k)
        for i, (k, d) in enumerate(events)
    ]
    spark.createDataFrame(
        ev_rows, "event_id long, ts timestamp, user_id long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    od_rows = [
        (100 + i, k, BASE + dt.timedelta(days=d))
        for i, (k, d) in enumerate(orders)
    ]
    spark.createDataFrame(
        od_rows or [(None, None, None)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    ).filter("o_orderkey IS NOT NULL").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/orders.parquet")

    # model: dedup orders to max key per (cust, date); next = strictly
    # later date, smallest date wins
    dedup_orders = {}
    for okey, k, t in od_rows:
        dedup_orders[(k, t)] = max(dedup_orders.get((k, t), -1), okey)
    expected = {}
    for eid, t, k in ev_rows:
        later = [(ot, okey) for (ok, ot), okey in dedup_orders.items() if ok == k and ot > t]
        expected[eid] = min(later) if later else (None, None)

    got = {
        r.event_id: (r.next_orderdate, r.next_orderkey)
        for r in relational.asof_join_forward(spark, str(tmp)).collect()
    }
    assert set(got) == set(expected)
    for eid, (ot, okey) in expected.items():
        assert got[eid] == (ot, okey), (eid, got[eid], (ot, okey))


RANGE_ORDERS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # customer
        st.integers(min_value=0, max_value=95),  # day offset — spans >3 buckets at days=30
    ),
    min_size=2,
    max_size=10,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(RANGE_ORDERS)
def test_range_join_bucket_decomposition_matches_model(
    spark, tmp_path_factory, orders
):
    """orders_range_join's bucket trick (explode over {b, b+1}, re-check)
    vs the quadratic definition on random day offsets — hammers the
    bucket EDGES (offsets 29/30/31, 59/60/61 cross bucket boundaries at
    days=30) and both range bounds (strictly-later, <= 30 days), which
    the fixture's spread never concentrates on."""
    from data_engineer_interview_task_spark.operators import extended

    tmp = tmp_path_factory.mktemp("rj")
    rows = [
        (i, k, BASE + dt.timedelta(days=d)) for i, (k, d) in enumerate(orders)
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")

    expected = {
        (k1, i, j)
        for i, k1, t1 in rows
        for j, k2, t2 in rows
        if k1 == k2 and t1 < t2 <= t1 + dt.timedelta(days=30)
    }
    got = {
        (r.custkey, r.first_orderkey, r.second_orderkey)
        for r in extended.orders_range_join(spark, str(tmp)).collect()
    }
    assert got == expected


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ASOF_EVENTS, ASOF_ORDERS)
def test_asof_backward_matches_model(spark, tmp_path_factory, events, orders):
    """BACKWARD as-of twin of the forward property test: latest order AT
    OR BEFORE each event (same-instant orders DO attribute here — the
    is_event sort-key rule, opposite of the forward strictness)."""
    from data_engineer_interview_task_spark.operators import relational

    tmp = tmp_path_factory.mktemp("asofb")
    ev_rows = [
        (i, BASE + dt.timedelta(days=d), k) for i, (k, d) in enumerate(events)
    ]
    spark.createDataFrame(
        ev_rows, "event_id long, ts timestamp, user_id long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    od_rows = [
        (100 + i, k, BASE + dt.timedelta(days=d))
        for i, (k, d) in enumerate(orders)
    ]
    spark.createDataFrame(
        od_rows or [(None, None, None)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    ).filter("o_orderkey IS NOT NULL").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/orders.parquet")

    dedup_orders = {}
    for okey, k, t in od_rows:
        dedup_orders[(k, t)] = max(dedup_orders.get((k, t), -1), okey)
    expected = {}
    for eid, t, k in ev_rows:
        at_or_before = [
            (ot, okey)
            for (ok, ot), okey in dedup_orders.items()
            if ok == k and ot <= t
        ]
        expected[eid] = max(at_or_before)[1] if at_or_before else None

    got = {
        r.event_id: r.o_orderkey
        for r in relational.asof_join_events_orders(spark, str(tmp)).collect()
    }
    assert got == expected


FUNNEL_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2),  # user
        st.sampled_from(["view", "click", "purchase", "other"]),
        st.integers(min_value=0, max_value=180),  # minute offset: 60 = exact horizon
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(FUNNEL_EVENTS)
def test_windowed_funnel_matches_model(spark, tmp_path_factory, evs):
    """Time-boxed funnel vs a python model on random event sets with
    exact-horizon offsets (minute 60 after a stage = still within, the
    <= bound; same-minute = excluded, the strict > bound)."""
    from data_engineer_interview_task_spark.operators import relational

    tmp = tmp_path_factory.mktemp("funnel")
    rows = [
        (i, BASE + dt.timedelta(minutes=m), k, typ, 1.0, "{}")
        for i, (k, typ, m) in enumerate(evs)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    H = dt.timedelta(hours=1)
    by_user: dict = {}
    for _, t, k, typ, _v, _p in rows:
        by_user.setdefault(k, []).append((t, typ))
    n_v = n_c = n_p = 0
    for seq in by_user.values():
        views = [t for t, ty in seq if ty == "view"]
        if not views:
            continue
        n_v += 1
        v = min(views)
        clicks = [t for t, ty in seq if ty == "click" and v < t <= v + H]
        if not clicks:
            continue
        n_c += 1
        c = min(clicks)
        if any(ty == "purchase" and c < t <= c + H for t, ty in seq):
            n_p += 1

    r = relational.funnel_conversion_windowed(spark, str(tmp)).first()
    assert (r.n_view, r.n_view_click, r.n_view_click_purchase) == (
        n_v,
        n_c,
        n_p,
    )
