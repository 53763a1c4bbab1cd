"""Leaf-level shared constants (no intra-package imports).

Lives at the package root so both ``operators.trends`` and
``sources.ingest`` can import it without creating the
``sources -> operators -> relational -> sources`` cycle that made
``import data_engineer_interview_task_spark.sources`` order-dependent.
"""

from __future__ import annotations

#: The reference pipeline's five search terms
#: (``dags/google_trends_to_bigquery.py:31``).
DEFAULT_TERMS: tuple[str, ...] = ("vpn", "hack", "cyber", "security", "wifi")
