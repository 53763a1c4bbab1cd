"""Property test: merge_upsert against a python reference model, over
randomized base tables and changesets (hypothesis)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_engineer_interview_task_spark.operators.maintenance import merge_upsert

KEYS = st.integers(min_value=0, max_value=9)


@st.composite
def scenario(draw):
    base = draw(st.dictionaries(KEYS, st.text(min_size=0, max_size=5), max_size=8))
    change_keys = draw(st.lists(KEYS, unique=True, max_size=8))
    changes = [
        (k, draw(st.text(min_size=0, max_size=5)), draw(st.booleans()))
        for k in change_keys
    ]
    return base, changes


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(scenario())
def test_merge_upsert_matches_model(spark, sc):
    base, changes = sc
    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(None, None)], "k bigint, v string"
    ).filter("k IS NOT NULL")
    changes_df = spark.createDataFrame(
        changes or [(None, None, None)], "k bigint, v string, is_delete boolean"
    ).filter("k IS NOT NULL")

    # python reference: apply upserts, then drop deletes
    model = dict(base)
    actions = {}
    for k, v, is_del in changes:
        if is_del:
            model.pop(k, None)
            actions.pop(k, None)
        else:
            actions[k] = "updated" if k in base else "inserted"
            model[k] = v
    expected = {
        k: (v, actions.get(k, "kept")) for k, v in model.items()
    }

    got = {
        r.row.k: (r.row.v, r.action)
        for r in merge_upsert(base_df, changes_df, key="k").collect()
    }
    assert got == expected
