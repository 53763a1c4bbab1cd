"""Previous-ISO-week window logic.

Reference parity: ``get_previous_week_dates`` at
``dags/google_trends_to_bigquery.py:19-28`` — Monday..Sunday of the week
before "today", emitted as ``yyyy-MM-dd`` strings. The reference calls
``datetime.today()`` inside the function (untestable); per SURVEY.md §2 row
22 we make "today" injectable, matching the historical DAG's explicit-dates
form (``dags/google_trends_to_bigquery historical.py:19-20``).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F


def previous_week_dates(today: _dt.date) -> tuple[str, str]:
    """Pure-Python twin (for parameter computation on the driver side only).

    ``today.weekday()`` is 0 for Monday, so ``today - (weekday + 7)`` days is
    the Monday of the previous ISO week; +6 days is its Sunday.
    """
    monday = today - _dt.timedelta(days=today.weekday() + 7)
    sunday = monday + _dt.timedelta(days=6)
    return monday.strftime("%Y-%m-%d"), sunday.strftime("%Y-%m-%d")


def previous_week_exprs(today_col: Column) -> tuple[Column, Column]:
    """Column-expression form, fully JVM-side (codegen'd, no UDF).

    Spark's ``date_trunc('week', d)`` is Monday-based, matching Python
    ``weekday()``; subtracting 7 days lands on the previous Monday.
    """
    monday = F.date_sub(F.to_date(F.date_trunc("week", today_col)), 7)
    sunday = F.date_add(monday, 6)
    fmt = "yyyy-MM-dd"
    return F.date_format(monday, fmt), F.date_format(sunday, fmt)
