"""Process-level store for materialized derived tables ("artifacts").

Several operator families share one expensive corpus-derived table — the
co-purchase edge list (graph analytics), word-n-gram shingle sets and
MinHash band keys (the dedup family), SimHash signatures, bottom-k
chargram sketches, the IVF/MinHash persisted indexes. Recomputing such a
table inside every consuming query is the wrong 100 TB design: a
production deployment persists these as warehouse tables, refreshed with
the corpus, and every analytic SCANS them (getting parquet column
pruning / predicate pushdown for free, surviving sessions and executor
restarts). This module is the single implementation of that pattern:
``materialized()`` builds a parquet artifact at most once per key per
process and returns a DataFrame scanning it.

In-memory ``persist()`` cannot provide this sharing: caller unpersist
hygiene (ADVICE r4) means every CALL pays the full build, and cached
blocks add executor-storage pressure that a parquet artifact does not.

The cache key must include every parameter that changes the artifact's
CONTENT (source dir, n, hash family, ...). Source dirs under
``/root/testdata`` and the synthesized ``/tmp/sf1``/``/tmp/skew`` corpora
are immutable for the life of the process, so entries never invalidate;
callers materializing MUTABLE inputs should bypass this store (see
``minhash_index_append`` for the mutable-index path).
"""

from __future__ import annotations

import tempfile
import threading
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

#: key -> parquet dir holding the materialized artifact (process-level).
_CACHE: dict[tuple, str] = {}
#: RLock: an artifact build may itself consume another artifact (band
#: keys build from the shingle table), re-entering materialized() on the
#: same thread — a plain Lock would self-deadlock there.
_LOCK = threading.RLock()


def materialized(
    spark: SparkSession,
    key: tuple,
    prefix: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """A DataFrame scanning the parquet artifact for ``key``, building it
    with ``build()`` on first use (at most once per process; the lock
    also serializes concurrent first-builds of the same key, matching the
    graph/IVF/MinHash index caches this generalizes)."""
    with _LOCK:
        path = _CACHE.get(key)
        if path is None:
            path = tempfile.mkdtemp(prefix=prefix)
            build().write.mode("overwrite").parquet(path)
            _CACHE[key] = path
    return spark.read.parquet(path)
