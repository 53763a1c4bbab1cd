"""Previous-ISO-week logic (SURVEY §2 row 22, W:19-28) — pure function and
column-expression forms agree with each other and with hand-checked values."""

from __future__ import annotations

import datetime as dt

from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_engineer_interview_task_spark.functions.dates import (
    previous_week_dates,
    previous_week_exprs,
)


def test_known_values():
    # Wed 2024-06-05 -> previous week Mon 2024-05-27 .. Sun 2024-06-02
    assert previous_week_dates(dt.date(2024, 6, 5)) == ("2024-05-27", "2024-06-02")
    # Monday itself -> previous Monday
    assert previous_week_dates(dt.date(2024, 6, 3)) == ("2024-05-27", "2024-06-02")
    # Sunday -> Monday of the week before
    assert previous_week_dates(dt.date(2024, 6, 2)) == ("2024-05-20", "2024-05-26")


@given(st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2100, 1, 1)))
def test_invariants(today):
    ws, we = previous_week_dates(today)
    monday = dt.date.fromisoformat(ws)
    sunday = dt.date.fromisoformat(we)
    assert monday.weekday() == 0
    assert sunday - monday == dt.timedelta(days=6)
    assert dt.timedelta(days=1) <= today - sunday <= dt.timedelta(days=7)


def test_column_expr_matches_python_spark(spark):
    days = [dt.date(2024, 6, d) for d in range(1, 9)] + [
        dt.date(2023, 12, 31),
        dt.date(2024, 1, 1),
        dt.date(2021, 2, 28),
    ]
    df = spark.createDataFrame([(d,) for d in days], ["today"])
    ws, we = previous_week_exprs(F.col("today"))
    rows = df.select("today", ws.alias("ws"), we.alias("we")).collect()
    for r in rows:
        assert (r.ws, r.we) == previous_week_dates(r.today)


def test_previous_week_property(spark):
    """Property test: for ANY date, the previous-week window is a
    Monday..Sunday span of exactly 7 days that ends strictly before the
    input date's own week — and the column expressions agree with the pure
    function on every generated date."""
    import datetime as dt

    from hypothesis import given, settings, strategies as st

    from data_engineer_interview_task_spark.functions.dates import (
        previous_week_dates,
    )

    @given(
        st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2100, 12, 28))
    )
    @settings(max_examples=300, deadline=None)
    def check(today):
        ws, we = previous_week_dates(today)
        monday = dt.date.fromisoformat(ws)
        sunday = dt.date.fromisoformat(we)
        assert monday.weekday() == 0
        assert sunday.weekday() == 6
        assert (sunday - monday).days == 6
        assert sunday < today - dt.timedelta(days=today.weekday() - 0)
        assert (today - monday).days <= 13

    check()

    # spark column twin agrees on a sampled batch (one JVM round-trip,
    # not one per hypothesis example)
    import datetime as dt2

    days = [dt2.date(2021, 1, 4) + dt2.timedelta(days=i * 37) for i in range(40)]
    df = spark.createDataFrame([(d,) for d in days], "today date")
    from pyspark.sql import functions as F

    from data_engineer_interview_task_spark.functions.dates import (
        previous_week_exprs,
    )

    ws_c, we_c = previous_week_exprs(F.col("today"))
    got = df.select("today", ws_c.alias("ws"), we_c.alias("we")).collect()
    for r in got:
        assert (r.ws, r.we) == previous_week_dates(r.today)
