"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference pipeline's operator
shape on lineitem) at sf0.001. ``queries()`` exposes every implemented
operator from SURVEY.md §2 (+ §2.8 extensions); ``oracle_sql()`` gives the
DuckDB ANSI-SQL twin for each SQL-expressible one.

Cross-engine determinism rules used throughout (so value hashes match):
- sums over doubles go through DECIMAL (exact, associative — partition-order
  independent) and the final value is cast to DOUBLE, which is bit-identical
  across engines (verified: both use correctly-rounded decimal->double);
- emitted doubles are otherwise single IEEE ops over exact integers;
- every rank/row_number has a full deterministic tie-break;
- timestamps are compared/aggregated in UTC (sessions are prepped).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_engineer_interview_task_spark.operators import (
    cleaning,
    clustering,
    dedup,
    extended,
    graph,
    maintenance,
    multimodal,
    relational,
    sampling,
    similarity,
    text,
    tpch_shapes,
    trends,
)
from data_engineer_interview_task_spark.functions.dates import previous_week_exprs
from data_engineer_interview_task_spark.sources import read_table

from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.flagship_pipeline(spark, SF0001)


# ---------------------------------------------------------------------------
# reference-surface queries (SURVEY §2)
# ---------------------------------------------------------------------------


def _unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 row 8 (melt, W:53): wide part metrics -> long (metric, value)."""
    part = read_table(spark, sf_dir, "part")
    wide = part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    return wide.unpivot(
        ids=["p_partkey"],
        values=["size", "retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )


def _filter_isin_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 rows 9+12 (isin filter W:54, projection W:64)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_returnflag").isin("A", "R")).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )


def _const_cols_rename_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 rows 10-12 (constant cols W:59, rename W:61, reorder W:64)."""
    nation = read_table(spark, sf_dir, "nation")
    return (
        nation.withColumnRenamed("n_name", "country")
        .withColumn("week_start", F.lit("2021-01-04"))
        .withColumn("week_end", F.lit("2021-01-10"))
        .select("country", "week_start", "week_end", "n_nationkey")
    )


def _group_count_distinct_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 rows 14-15 (groupby+nunique W:76, HAVING W:79)."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.countDistinct("o_orderstatus").alias("n_status"))
        .filter(F.col("n_status") < 3)
    )


def _semi_join_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 row 16: the collect+isin pattern (W:82-85) as a left-semi
    join — distributed, no driver roundtrip."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 300000).select("o_orderkey")
    return li.join(
        big.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey", "left_semi"
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")


def _rank_window_tiebreak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 rows 17-20: the verified ranking window (W:90-112) on
    lineitem — 'N' plays vpn's role in the tie-break."""
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    prio = F.when(F.col("l_returnflag") == "N", 0).otherwise(1)
    # testdata lineitem can repeat (l_orderkey, l_linenumber), so the flag
    # joins the tie-break to keep the total order genuinely total
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_quantity").desc(), prio.desc(), F.col("l_linenumber").asc(),
        F.col("l_returnflag").asc(),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.row_number().over(w).cast("int").alias("ranking"),
    )


def _previous_week_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 row 22 (W:19-28) applied per order date — injectable
    "today", JVM-side date arithmetic."""
    orders = read_table(spark, sf_dir, "orders")
    ws, we = previous_week_exprs(F.col("o_orderdate"))
    return orders.select(
        "o_orderkey",
        ws.alias("week_start"),
        we.alias("week_end"),
    )


def _trends_pipeline_synthetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENTIRE reference pipeline (W:45-112) end-to-end as one lazy
    lineage, on a deterministic trends-wide matrix derived from nation:
    25 countries x the 5 real search terms, interest = arithmetic on
    (nationkey, term index) with every 5th country forced all-42 so the
    same-interest drop rule (W:70-87) fires. Exercises SURVEY §2 rows
    8-20 verbatim, including the unpivot and the vpn-last tie-break."""
    nation = read_table(spark, sf_dir, "nation")

    def interest(term: str, ti: int):
        return F.when(F.col("n_nationkey") % 5 == 0, F.lit(42)).otherwise(
            (F.col("n_nationkey") * (ti + 3) * 7 + len(term)) % 101
        )

    wide = nation.select(
        F.col("n_name").alias("country"),
        *[
            interest(t, i).alias(t)
            for i, t in enumerate(trends.DEFAULT_TERMS)
        ],
    )
    out = trends.trends_pipeline(wide, "2021-01-04", "2021-01-10")
    return out.withColumn("interest", F.col("interest").cast("long"))


_WORK_DIRS: dict[tuple[str, str], str] = {}


def _work_dir(kind: str, sf_dir: str) -> str:
    """One cached scratch dir per (wrapper, sf_dir) per process, wiped on
    reuse — repeated driver/bench sweeps see a fresh dir without
    accumulating a copy per call under /tmp (ADVICE r3)."""
    import shutil
    import tempfile

    key = (kind, sf_dir)
    path = _WORK_DIRS.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix=f"{kind}_")
        _WORK_DIRS[key] = path
    else:
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
    return path


def _streaming_incremental_late_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental late-data audit (VERDICT r7 item 5): the stream runs
    to completion, new late files are appended to the cached source, and
    a second run RESTARTS from the same checkpoint — the appended
    tranche filters against the restored watermark and the surviving
    run-1 state is emitted by run-2's flush. The oracle is the one-run
    audit's SQL verbatim: incremental delivery must be
    indistinguishable from single-run delivery."""
    from data_engineer_interview_task_spark.streaming import (
        run_incremental_late_audit,
    )

    return run_incremental_late_audit(
        spark, sf_dir, _work_dir("stream_inc_late", sf_dir)
    )


def _streaming_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data accounting: deterministic two-batch replay
    (on-time file, then the late file, then a sentinel flush), per-day
    dropped-late counts vs the batch ground truth. The arrival order is
    arithmetic (calendar split + mtime-ordered files), so the whole
    audit is oracle-exact."""
    from data_engineer_interview_task_spark.streaming import (
        run_late_data_audit_once,
    )

    return run_late_data_audit_once(
        spark, sf_dir, _work_dir("stream_late", sf_dir)
    )


def _streaming_update_mode_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Update-mode delta emission: each micro-batch emits only the
    groups it changed with cumulative values; the mid-day split makes
    the straddling day appear twice (partial, then final). The emitted
    MULTISET is exactly predictable from the split, so the delta stream
    itself is oracle-checked."""
    from data_engineer_interview_task_spark.streaming import (
        run_update_mode_rollup_once,
    )

    return run_update_mode_rollup_once(
        spark, sf_dir, _work_dir("stream_upd", sf_dir)
    )


def _streaming_python_datasource_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming PYTHON DATA SOURCE (Spark 4 SimpleDataSourceStreamReader
    — the streaming half of the DataSource API, next to the batch
    date_spine seam): a deterministic paged md5 tick feed paces itself
    one page per micro-batch through the offset protocol, aggregated
    per page in complete mode. The feed is pure arithmetic, so the
    oracle rebuilds every page from range() + the md5 hex fold."""
    from data_engineer_interview_task_spark.sources.pydatasource import (
        run_tick_stream_rollup_once,
    )

    return run_tick_stream_rollup_once(
        spark, _work_dir("stream_pyds", sf_dir)
    )


def _streaming_tick_restart_continuity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Checkpoint-RESTART continuity of the streaming Python DataSource:
    run 1 parks a 3-page tick feed at its committed offset; run 2 reopens
    the SAME checkpoint with the feed extended to 6 pages and must resume
    exactly there — the oracle rebuilds all 6 pages arithmetically, so a
    re-emitted or missing page hash-mismatches."""
    from data_engineer_interview_task_spark.sources.pydatasource import (
        run_tick_stream_restart_once,
    )

    return run_tick_stream_restart_once(
        spark, _work_dir("stream_pyds_restart", sf_dir)
    )


def _streaming_dhash_index_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Crawl-shaped image-dedup index maintenance (VERDICT r11 item 4):
    stream the corpus in 3 micro-batches; foreachBatch hashes ONLY its
    batch and appends the signatures to the persisted index via the
    deterministic-per-batch-directory exactly-once recipe. The returned
    index must equal a one-shot batch rebuild — the oracle replays every
    doc's dHash closed-form, so a dropped, duplicated, or wrongly-hashed
    batch hash-mismatches."""
    from data_engineer_interview_task_spark.streaming import (
        run_dhash_index_maintenance_once,
    )

    return run_dhash_index_maintenance_once(
        spark, sf_dir, _work_dir("stream_dhash_idx", sf_dir)
    )


def _streaming_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-distinct via mergeable bitmap state (bit_or of
    62-bit words), popcount-rolled after the drain. Fully oracle-checked
    against the plain batch COUNT(DISTINCT) per epoch-aligned week."""
    from data_engineer_interview_task_spark.streaming import run_bitmap_distinct_once

    return run_bitmap_distinct_once(
        spark, sf_dir, _work_dir("stream_bitmap", sf_dir)
    )


def _streaming_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming weekly rollup run to completion (availableNow
    trigger, memory sink) and returned as a batch DataFrame. Fully
    oracle-checked: window("7 days") tumbling buckets are EPOCH-aligned,
    which DuckDB replicates exactly with epoch_us integer arithmetic."""
    from data_engineer_interview_task_spark.streaming import run_weekly_rollup_once

    return run_weekly_rollup_once(spark, sf_dir, _work_dir("stream_rollup", sf_dir))


def _streaming_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window streaming aggregation (7-day window, 1-day slide):
    each event contributes to 7 overlapping epoch-aligned windows. Fully
    oracle-checked: DuckDB replicates the window membership by exploding 7
    day-offsets per event with integer epoch arithmetic."""
    from data_engineer_interview_task_spark.streaming import run_sliding_rollup_once

    return run_sliding_rollup_once(spark, sf_dir, _work_dir("stream_sliding", sf_dir))


def _streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): gap-
    based sessionization with O(users) state. Fully ORACLE-CHECKED: under
    the availableNow harness the emitted (closed-session) set is batch-
    deterministic, so the DuckDB twin hash-matches; the batch-equivalence
    property is additionally pinned by tests/test_streaming_sessions.py."""
    from data_engineer_interview_task_spark.streaming import run_sessionize_once

    return run_sessionize_once(spark, sf_dir, _work_dir("stream_sessions", sf_dir))


def _chargram_minhash_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chargram_minhash with the xxhash64 PRODUCTION hash family — the
    JVM-native sketch loop (no hex decode), the measured 2-4x lever on
    the signature stage. Registered rows-only (xxhash64 has no DuckDB
    twin); structure is pinned by tests/test_dedup_fast.py (same
    cardinality, per-doc sketch sizes, and self-similarity behavior as
    the md5 oracle family)."""
    return text.chargram_minhash(spark, sf_dir, hash_family="xxhash64")


def _streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC enrichment join (stateless; static side broadcast,
    re-evaluated per micro-batch) — the third join family next to
    stream-stream and batch-batch. ORACLE-CHECKED: every stream row
    passes through exactly once, so emitted rows == the batch left
    join."""
    from data_engineer_interview_task_spark.streaming import (
        run_stream_static_enrich_once,
    )

    return run_stream_static_enrich_once(spark, sf_dir, _work_dir("stream_sse", sf_dir))


def _streaming_dedup_then_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful streaming (Spark 3.4+ multiple-stateful-operator
    support): event-time dedup -> windowed aggregation in ONE query.
    ORACLE-CHECKED: the dedup key (user, type, day) makes every survivor
    identical, so the weekly count equals the batch DISTINCT aggregate."""
    from data_engineer_interview_task_spark.streaming import (
        run_dedup_then_rollup_once,
    )

    return run_dedup_then_rollup_once(spark, sf_dir, _work_dir("stream_ddrl", sf_dir))


def _observed_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality_filter with Spark's ``observe`` metrics attached (named
    exact aggregates computed on the same pass — the zero-extra-scan
    observability contract; tests/test_sampling_cleaning.py checks the
    metric values). Row output is identical to quality_filter, so the
    oracle is the same SQL."""
    from data_engineer_interview_task_spark.operators import cleaning

    df, _obs = cleaning.observed_quality_filter(spark, sf_dir)
    return df


def _streaming_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER stream-stream join (both-side watermark eviction, both
    NULL-extension directions) — completes the inner/leftOuter/fullOuter
    matrix. ORACLE-CHECKED: the both-side sentinel flush protocol makes
    the emitted set equal the batch full join."""
    from data_engineer_interview_task_spark.streaming import (
        run_click_purchase_full_join_once,
    )

    return run_click_purchase_full_join_once(
        spark, sf_dir, _work_dir("stream_ssfoj", sf_dir)
    )


def _streaming_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI stream-stream join (converted clicks, no purchase
    payload) — completes the stream-stream join matrix next to inner /
    leftOuter / fullOuter. ORACLE-CHECKED: under availableNow every
    purchase is processed, so the emitted click set equals the batch
    EXISTS semi join."""
    from data_engineer_interview_task_spark.streaming import (
        run_click_purchase_semi_join_once,
    )

    return run_click_purchase_semi_join_once(
        spark, sf_dir, _work_dir("stream_sssj", sf_dir)
    )


def _streaming_user_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER-SENSITIVE stateful streaming fold (applyInPandasWithState):
    per-user running EWMA maintained across two time-split micro-batches.
    ORACLE-CHECKED with the SAME SQL as the batch ``user_value_ewma`` —
    the streaming recurrence's last emission is bit-identical to the
    batch F.aggregate fold (alpha=1/2 halvings are exact IEEE ops and the
    addition order matches)."""
    from data_engineer_interview_task_spark.streaming import run_user_ewma_once

    return run_user_ewma_once(spark, sf_dir, _work_dir("stream_ewma", sf_dir))


def _streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILT-IN session_window streaming aggregation run to completion
    (availableNow, complete mode, memory sink): mergeable session state
    finalized by the watermark — the declarative counterpart of the
    applyInPandasWithState sessionizer. Fully ORACLE-CHECKED against the
    same lag/cumsum island SQL as the batch ``session_window_rollup``
    (identical merge rule: a gap of exactly the threshold starts a new
    session); batch==stream equality additionally pinned by
    tests/test_streaming_sessions.py."""
    from data_engineer_interview_task_spark.streaming import run_session_window_once

    return run_session_window_once(spark, sf_dir, _work_dir("stream_swin", sf_dir))


def _streaming_first_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup (dropDuplicates under a watermark): emitted key set
    equals SELECT DISTINCT regardless of arrival order, so this streaming
    query is fully oracle-checkable."""
    from data_engineer_interview_task_spark.streaming import run_first_events_once

    return run_first_events_once(spark, sf_dir, _work_dir("stream_dedup", sf_dir))


def _streaming_first_events_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup via dropDuplicatesWithinWatermark — the
    BOUNDED-STATE production form (state GC'd past the watermark, so it
    holds the trailing window's keys, not every key ever seen). With the
    30-day delay >= the event span the emitted key set equals SELECT
    DISTINCT, so it shares streaming_first_events' oracle; the state
    bound itself is pinned by tests/test_streaming_late_data.py."""
    from data_engineer_interview_task_spark.streaming import (
        run_first_events_bounded_once,
    )

    return run_first_events_bounded_once(
        spark, sf_dir, _work_dir("stream_dedup_wm", sf_dir)
    )


def _streaming_running_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained per-user running aggregate (count + exact
    decimal total) via arbitrary stateful streaming
    (applyInPandasWithState; integer-cents state so the fold is exact),
    run over a two-micro-batch feed and resolved to each user's LAST
    emission — which provably equals the batch groupBy, the oracle. The
    transformWithStateInPandas twin of the same fold is a documented
    forward-compat seam (its state client needs protobuf, absent here;
    tests skip-guard it)."""
    from data_engineer_interview_task_spark.streaming import (
        run_running_user_stats_once,
    )

    return run_running_user_stats_once(
        spark, sf_dir, _work_dir("stream_running", sf_dir)
    )


def _streaming_join_then_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained stateful operators: the click→purchase time-range join
    feeding a per-day windowed conversion rollup in ONE streaming query
    (join state + agg state, watermark propagated through the join).
    The flush protocol makes the emission complete, so the oracle is
    the batch join + day rollup."""
    from data_engineer_interview_task_spark.streaming import (
        run_click_purchase_join_rollup_once,
    )

    return run_click_purchase_join_rollup_once(
        spark, sf_dir, _work_dir("stream_ssjr", sf_dir)
    )


def _streaming_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream join with watermarks on both sides (click -> purchase
    within 1h per user). Fully ORACLE-CHECKED against the batch-twin SQL
    (the availableNow emitted pair set is deterministic);
    tests/test_streaming_join.py additionally proves pair-equality with
    the batch DataFrame twin."""
    from data_engineer_interview_task_spark.streaming import (
        run_click_purchase_join_once,
    )

    return run_click_purchase_join_once(spark, sf_dir, _work_dir("stream_ssj", sf_dir))


def _schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution (column add) under mergeSchema: two batch
    writes with different schemas under one root, one merged read. Oracle =
    the UNION ALL the merged scan must be equivalent to."""
    from data_engineer_interview_task_spark.sources.ingest import (
        schema_evolution_read,
    )

    return schema_evolution_read(spark, sf_dir, _work_dir("schema_evo", sf_dir))


def _streaming_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join under watermarks. The harness appends
    far-future flush rows (one file per batch, maxFilesPerTrigger=1) so the
    watermark passes every real click's join window before the availableNow
    drain — the emitted set then EQUALS the batch left join, which is the
    oracle twin. Fully oracle-checked."""
    from data_engineer_interview_task_spark.streaming import (
        run_click_purchase_left_join_once,
    )

    return run_click_purchase_left_join_once(
        spark, sf_dir, _work_dir("stream_ssloj", sf_dir)
    )


def _ngram_jaccard_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ngram_jaccard_pairs with the hot-shingle document-frequency guard
    ACTIVE (df cap 4 — bites at both test SFs: max shingle df is 9 at
    sf0.001, 7 at sf0.01). Shingles shared by more than ``cap`` docs are
    dropped before the inverted-index self-join, bounding its per-key cost
    at cap² — the boilerplate guard that keeps the index sub-quadratic at
    corpus scale. Oracle twin applies the identical cap."""
    return dedup.ngram_jaccard_pairs(spark, sf_dir, max_shingle_df=4)


def _minhash_lsh_pairs_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minhash_lsh_pairs with the xxhash64 PRODUCTION hash family — the
    JVM-native sketch loop (no hex decode, 8-byte band keys), measured
    2-4x cheaper than the md5 oracle family on the signature stage.
    Registered rows-only: xxhash64 isn't reproducible in DuckDB, so
    correctness is pinned by tests/test_dedup_fast.py instead — on this
    corpus the verified pair set (and Jaccard values) are EXACTLY equal
    to the md5 twin's, because the exact-Jaccard verify step makes the
    output hash-family-independent given sufficient banding recall."""
    return dedup.minhash_lsh_pairs(spark, sf_dir, hash_family="xxhash64")


def _minhash_lsh_pairs_banddf_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minhash_lsh_pairs with the hot-band skew guard ACTIVE (cap 2 —
    bites at both test SFs: max band df is 4 at sf0.001, 3 at sf0.01).
    Band keys shared by more than ``cap`` docs are dropped before the
    band self-join, bounding every bucket's candidate contribution at
    cap² — the straggler guard for near-constant document clusters
    (exact-dup clusters larger than the cap belong to the exact-dedup
    pass that runs first). Oracle twin applies the identical cap."""
    return dedup.minhash_lsh_pairs(spark, sf_dir, max_band_df=2)


def _near_dup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash-LSH near-dup graph — the
    sub-quadratic 100 TB pair source (banded candidates + exact-Jaccard
    verify) feeding the same min-label-propagation loop. Oracle: recursive
    CTE over the bit-exact md5-affine LSH pair construction."""
    return dedup.near_dup_clusters(spark, sf_dir, pair_source="minhash")


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.8.

    Ordering is deliberate: the driver's correctness sweep processes the
    registry in order (each round records exactly the first 50), so
    entries WITHOUT a green driver record come first (VERDICT r3 item 1 /
    r4 items 1-2): the two-round driver-red ``table_checksum`` plus its
    two bisection diagnostics, then the 30 queries round 4 registered
    after its window filled, then round-5 additions. The union of the
    r01..r05 driver records then covers every query.
    tests/test_registry.py pins this invariant."""
    return {
        # --- ROUND-6 attestation front (VERDICT r5 items 1-2). Slot 0 is
        # the PROMOTED table_checksum — now the BIGINT-mod-2^62 transport
        # the r5 bisection proved driver-green (the DECIMAL transport was
        # the divergent driver stage; that body is retired to
        # maintenance.table_checksum_decimal, local tests only). Slots 1-8
        # are the eight round-5 session-3 tail queries the driver has
        # never attested (r5's ORACLE_DEFERRED_TO_NEXT_ROUND set); then
        # round-6 additions fill the window as they land. Everything after
        # the window is attested green by the union of r01..r05 records.
        # --- ROUND-12 attestation front. The r11 window closed with all
        # 13 entries green in CORRECTNESS_r11 (the r1-r11 union attests
        # every registered query), so the r12 window opens empty; new
        # round-12 entries fill it from the top. ---
        "image_dhash_dihedral": multimodal.image_dhash_dihedral,  # orientation-INVARIANT perceptual hash: min unsigned dHash over the 8 D4 orientations (exact by group closure), argmin orientation rides along
        "theil_sen_monthly_nation_revenue": cleaning.theil_sen_monthly_nation_revenue,  # per-GROUP Theil-Sen at nation grain: robust monthly-revenue slope per customer nation, micro-cents/month fixed-point key
        "winnowing_fingerprint_profile": dedup.winnowing_fingerprint_profile,  # MOSS winnowing selection per doc: k-gram window-min fingerprints, density ppm vs the 2/(w+1) theory
        "winnowing_dup_candidates": dedup.winnowing_dup_candidates,  # winnowing candidate pairs: >=3 shared df-capped fingerprints — catches every shared run of >= w+k-1 tokens, never all-pairs
        "sq8_recall_report": similarity.sq8_recall_report,  # SQ8 scalar-quantization recall vs the exact inner-product top-k: all-integer quantize/reconstruct rank key, per-query recall millis
        "streaming_dhash_index_maintenance": _streaming_dhash_index_maintenance,  # foreachBatch dHash index append (deterministic per-batch dir = replay-idempotent); index == batch rebuild, oracle-checked
        "rendezvous_shard_plan": maintenance.rendezvous_shard_plan,  # consistent-hashing HRW shard layout 8 vs 9 shards: per-shard counts + moved-in — the no-move theorem for old shards test-pinned
        "variant_event_props_rollup": relational.variant_event_props_rollup,  # Spark 4 VARIANT type: parse_json + typed variant_get over flat/nested/array/missing paths, prototype-verified DuckDB parity
        "bloom_fpr_curve": maintenance.bloom_fpr_curve,  # Bloom sizing sheet: k=1..4 filters built in ONE pass, exact fill + false-positive ppm per k
        "image_quadrant_dup_pairs": multimodal.image_quadrant_dup_pairs,  # tile-level partial-dup pairs: per-quadrant 56-bit gradient signatures, equi-join on (quadrant, sig), >=2 agreement
        "copurchase_degree_assortativity": graph.copurchase_degree_assortativity,  # degree-mixing summary: symmetric-marginal Pearson as an exact integer ratio, sign-split ppm, no sqrt
        "cross_source_dup_matrix": dedup.cross_source_dup_matrix,  # which sources copy from which: prefix-fingerprint dup pairs rolled up to normalized source-pair cells, df-capped
        "group_by_all_revenue": extended.group_by_all_revenue,  # Spark 4 GROUP BY ALL / ORDER BY ALL dialect: the SAME SQL text runs on both engines
        "good_turing_vocab_report": text.good_turing_vocab_report,  # Good-Turing frequency-of-frequencies over trigrams: exact-ppm smoothed counts r* = (r+1)N_{r+1}/N_r
        "heaps_law_curve": text.heaps_law_curve,  # Heaps'-law vocabulary growth at power-of-2 doc-prefix checkpoints via first-occurrence attribution
        # --- ROUND-11 attestation front (all 13 green in
        # CORRECTNESS_r11). ---
        "image_dhash_near_dup_pairs": multimodal.image_dhash_near_dup_pairs,  # perceptual near-dup IMAGE pairs: real decode + pinned resize -> 64-bit dHash -> 4x16-bit banded join (complete by pigeonhole for hamming<=3) -> bit_count verify; aHash hamming rides along
        "image_perceptual_hashes": multimodal.image_perceptual_hashes,  # per-doc dHash/aHash over the REAL decoded raster, SimHash 64-bit packing convention
        "image_histogram_equalization": multimodal.image_histogram_equalization,  # real decode -> integer CDF remap -> sha256(hex) of the equalized raster; closed-form md5 oracle
        "cramers_v_event_dow": cleaning.cramers_v_event_dow,  # association effect size for event_type x ISO dow: per-cell floor chi2*N ladder, all-integer v2_ppm
        "isotonic_calibration_per_source": cleaning.isotonic_calibration_per_source,  # per-source PAV calibration fit via the fixed-point minimax identity at partitionBy(source) grain
        "hard_negative_mining": similarity.hard_negative_mining,  # contrastive hard negatives: exact-decimal top-k most-similar WRONG-label candidates per query, WindowGroupLimit shape
        "multimodal_audio_quality_report": multimodal.multimodal_audio_quality_report,  # clipping/silence/DC-offset scan over REAL decoded 8-bit PCM, exact ppm facts
        "image_text_dedup_agreement": multimodal.image_text_dedup_agreement,  # cross-MODAL pair-set agreement: prefix-fingerprint text pairs vs dHash image pairs, exact Jaccard ppm
        "lateral_topk_orders_per_customer": extended.lateral_topk_orders_per_customer,  # SQL:2023 LATERAL correlated derived table with ORDER BY/LIMIT; oracle runs the SAME LATERAL shape in DuckDB
        "sql_udf_discounted_revenue": extended.sql_udf_discounted_revenue,  # Spark 4 SQL scalar UDF (CREATE FUNCTION ... RETURN) — Catalyst-inlined, zero serialization; oracle inlines the expression
        "token_budget_mixture_plan": sampling.token_budget_mixture_plan,  # recipe-weighted token-budget allocation with largest-remainder conservation + per-source epoch factors
        "image_dhash_resize_robustness": multimodal.image_dhash_resize_robustness,  # perceptual-hash robustness audit under the pinned 12x12 resample — honest worst case on white-noise rasters
        "image_dhash_index_dedup_batch": multimodal.image_dhash_index_dedup_batch,  # incremental image dedup: batch dHashes vs the PERSISTED corpus hash index, banded join, batch-sized codec cost
        # --- ROUND-10 attestation front (all 13 green in
        # CORRECTNESS_r10). ---
        "multimodal_image_metadata": multimodal.multimodal_image_metadata,  # header-only manifest scan: PNG IHDR / JPEG SOFn walk / GIF screen descriptor / BMP info header, md5-varying dims, zero decode
        "spearman_daily_correlation": cleaning.spearman_daily_correlation,  # rank correlation between daily series: doubled midranks, exact moments, IEEE sqrt tail
        "kendall_tau_b_daily": cleaning.kendall_tau_b_daily,  # tie-corrected concordance between daily series: exact nc/nd/tie counts, IEEE tail
        "perplexity_bucket_report": text.perplexity_bucket_report,  # CCNet head/middle/tail buckets per source on the exact surprisal score, two-phase grouped rank
        "priority_sample_per_source": sampling.priority_sample_per_source,  # stratified weighted sampling w/o replacement: per-source k smallest priority keys, WindowGroupLimit plan
        "ivfpq_recall_frontier": similarity.ivfpq_recall_frontier,  # recall@k vs n_probe curve for the full IVF-PQ path against the exact arm over the same candidate universe
        "multimodal_audio_metadata": multimodal.multimodal_audio_metadata,  # header-only RIFF/WAVE manifest scan: fmt/fact/data headers of PCM, ADPCM, mu-law, A-law — zero sample decode
        "copurchase_edge_jaccard": graph.copurchase_edge_jaccard,  # per-edge neighborhood Jaccard over the sparsified co-purchase graph, exact ppm, top-k
        "wilcoxon_signed_rank_daily": cleaning.wilcoxon_signed_rank_daily,  # paired signed-rank test on day-matched revenue: doubled midranks, zeros dropped
        "incremental_bitmap_distinct_merge": relational.incremental_bitmap_distinct_merge,  # exact-distinct IVM: weekly bitmap state OR delta == full COUNT(DISTINCT) recompute
        "pipe_syntax_revenue_profile": extended.pipe_syntax_revenue_profile,  # Spark 4 SQL |> pipe-chain dialect (FROM |> WHERE |> EXTEND |> AGGREGATE |> ORDER BY); oracle = the ANSI equivalent
        "cliffs_delta_daily": cleaning.cliffs_delta_daily,  # Cliff's delta effect size from the rank-sum identity 2U_a = u2x_a, exact signed ppm
        "doc_length_percentile_ladder": sampling.doc_length_percentile_ladder,  # per-source exact order-statistic token-length percentiles, grouped two-phase rank
        # --- ROUND-9 attestation front (all green in CORRECTNESS_r09) ---
        "multimodal_progressive_ac_refine_decode": multimodal.multimodal_progressive_ac_refine_decode,  # AC-band successive approximation: the G.1.2.3 correction-bit interleave (VERDICT r8 item 2)
        "dedup_family_agreement": dedup.dedup_family_agreement,  # cross-family pair-set agreement matrix: |A|,|B|,common,union,ppm per family pair
        "compaction_plan_report": maintenance.compaction_plan_report,  # small-files compaction dry-run: start-offset packing of (day,type) cells into row-balanced files
        "streaming_tick_restart_continuity": _streaming_tick_restart_continuity,  # Python DataSource checkpoint restart: resume at the committed offset, 6 pages exactly-once
        "cohens_kappa_langid": text.cohens_kappa_langid,  # chance-corrected lang-ID agreement: exact rational kappa in signed ppm, DECIMAL/HUGEINT products
        "mann_kendall_trend": cleaning.mann_kendall_trend,  # integer-exact monotone-trend test per event type: S, tau-a ppm, tie-adjusted 18*Var(S)
        "theil_sen_slope": cleaning.theil_sen_slope,  # robust median-of-pairwise-slopes per type: exact nanocent fixed-point order key, lower/upper medians
        "pettitt_change_point": cleaning.pettitt_change_point,  # rank-based change-point per type: K = max_t |U_t|, first argmax day, all-integer
        "bpe_train_merges_deep": text.bpe_train_merges_deep,  # 32-round/128-merge-capacity BPE: trains to exhaustion (89 merges) at driver scale (VERDICT r8 item 4)
        "multimodal_g711_roundtrip": multimodal.multimodal_g711_roundtrip,  # REAL G.711 telephony audio: mu-law AND A-law companding round-trip, hash-exact distortion
        "incremental_join_rollup_merge": relational.incremental_join_rollup_merge,  # delta-JOIN IVM: state + 3 delta partials re-aggregate == full recompute (the oracle)
        "quality_calibration_report": cleaning.quality_calibration_report,  # reliability diagram of the quality scorer: per-bin observed rate vs mean confidence, exact ppm
        "padding_waste_report": sampling.padding_waste_report,  # log2 length-bucket batching audit: per-bucket pad-token waste in exact ppm
        "zipf_fit_report": text.zipf_fit_report,  # per-source Zipf slope: exact bit-length log-log OLS over the ranked vocabulary
        "embedding_label_centroid_distances": similarity.embedding_label_centroid_distances,  # between-class scatter: fixed-point label centroids + pairwise squared L2
        "streaming_python_datasource_rollup": _streaming_python_datasource_rollup,  # Spark-4 streaming Python DataSource: paged md5 tick feed, per-page rollup
        "multimodal_bmp_rle_decode": multimodal.multimodal_bmp_rle_decode,  # REAL RLE8 BMP: runs + absolute segments + EOL/EOB escapes + bottom-up palette raster
        "ngram_novelty_curve": text.ngram_novelty_curve,  # per-doc 5-gram novelty via first-occurrence attribution (one aggregate, no prior-join)
        "stratified_holdout_exact": sampling.stratified_holdout_exact,  # exact-proportion 80/10/10 per-source split on the grouped two-phase rank
        "supplier_ktruss_profile": graph.supplier_ktruss_profile,  # k-truss peeling profile: triangle-support peel at the data-derived median threshold
        "pq_distortion_report": similarity.pq_distortion_report,  # PQ reconstruction loss per label: exact fixed-point squared L2 vs assigned centroids
        # --- ROUND-8 attestation front (all green in CORRECTNESS_r08) ---
        "copurchase_edges_capped": graph.copurchase_edges_capped,  # basket-capped co-occurrence build: the documented mega-basket skew remedy (VERDICT r7 item 6)
        "bpe_train_merges_bytelevel": text.bpe_train_merges_bytelevel,  # byte-level BPE, 64 merges in 16 batched non-interacting rounds (VERDICT r7 item 4)
        "streaming_incremental_late_audit": _streaming_incremental_late_audit,  # append new late files + checkpoint-restart continuity (VERDICT r7 item 5)
        "multimodal_thumbnail_grid": multimodal.multimodal_thumbnail_grid,  # decode once -> 4-size thumbnail pyramid, 1-in-k-out pandas fan-out (VERDICT r7 item 8)
        "bpe_fertility_report": text.bpe_fertility_report,  # per-source tokenizer fertility + bytes/token, exact fixed-point ratios
        "benchmark_contamination_13gram": text.benchmark_contamination_13gram,  # GPT-3-style 13-gram train/eval decontamination audit
        "dsir_importance_weights": sampling.dsir_importance_weights,  # DSIR importance resampling weights: integer log2(p_tgt/p_src) per doc
        "unigram_entropy_per_source": text.unigram_entropy_per_source,  # per-source Shannon entropy, bit-length log2, BIGINT-exact
        "curriculum_order_assignment": sampling.curriculum_order_assignment,  # short-to-long curriculum phase + step on the two-phase machinery
        "multimodal_gif_decode": multimodal.multimodal_gif_decode,  # REAL GIF87a decode: full LZW (KwKwK, 4096 resets), 256-entry table expansion
        "streaming_join_then_rollup": _streaming_join_then_rollup,  # chained stateful ops: stream-stream join feeding a windowed day rollup
        "embedding_stats_per_dim": similarity.embedding_stats_per_dim,  # per-dimension vector ANALYZE: fixed-point mean/variance, one scan
        "ivf_recall_report": similarity.ivf_recall_report,  # recall@k of the IVF probe path vs the exact top-k, hash-exact composition
        "near_dup_cluster_size_histogram": dedup.near_dup_cluster_size_histogram,  # log2 cluster-size distribution over the LSH components
        "lang_confusion_matrix": text.lang_confusion_matrix,  # lang-ID confusion matrix vs declared labels, exact shares
        "hashed_tf_features": text.hashed_tf_features,  # hashing-trick vectorizer: md5-bucketed term frequencies, long format
        "zorder_skipping_report": extended.zorder_skipping_report,  # z-order vs linear file-skipping effectiveness for a 2-D box query
        "minhash_estimate_error_audit": dedup.minhash_estimate_error_audit,  # signature-agreement estimate vs exact Jaccard per LSH candidate pair
        "multimodal_progressive_jpeg_decode": multimodal.multimodal_progressive_jpeg_decode,  # REAL SOF2 progressive JPEG: spectral-selection scans + EOB-run coding
        "multimodal_adpcm_roundtrip": multimodal.multimodal_adpcm_roundtrip,  # REAL IMA ADPCM compressed audio: encode -> RIFF round-trip -> decode, hash-exact distortion
        "multimodal_gif_interlaced_decode": multimodal.multimodal_gif_interlaced_decode,  # 4-pass interlaced GIF: de-interlace after LZW; raster == the plain query's
        "multimodal_gif_animation_frames": multimodal.multimodal_gif_animation_frames,  # animated GIF89a: real NETSCAPE/GCE framing, per-frame LZW decode fan-out
        "multimodal_progressive_sa_jpeg_decode": multimodal.multimodal_progressive_sa_jpeg_decode,  # DC-band successive approximation: shifted predictors + raw-bit refinement
        "dsir_resample_corpus": sampling.dsir_resample_corpus,  # DSIR end-to-end: rank-based importance resampling (top 25% target-like docs)
        # --- round-7 front (all green in CORRECTNESS_r07) ---
        "ivfpq_search": similarity.ivfpq_search,  # FULL IVF-PQ: probe-pruned ADC over cell-partitioned posting lists (VERDICT r6 item 1)
        "multimodal_resize": multimodal.multimodal_resize,  # REAL decode + pinned integer nearest-neighbor resample (VERDICT r6 item 2)
        "multimodal_color_jpeg_subsampled_decode": multimodal.multimodal_color_jpeg_subsampled_decode,  # REAL 4:2:0 chroma-subsampled JPEG decode (VERDICT r6 item 4)
        "shuffle_skew_report_composite": maintenance.shuffle_skew_report_composite,  # composite-key skew audit + AQE skew-join recommendation (VERDICT r6 item 5)
        "multimodal_wav_channel_features": multimodal.multimodal_wav_channel_features,  # per-channel short-time audio features over stereo PCM (VERDICT r6 item 6)
        "isotonic_revenue_curve": cleaning.isotonic_revenue_curve,  # shape-constrained PAV fit via the exact fixed-point minimax form (VERDICT r6 item 8)
        "multimodal_color_resize": multimodal.multimodal_color_resize,  # color-JPEG decode composed with the real RGB nearest-neighbor resample
        "multimodal_color_jpeg_422_decode": multimodal.multimodal_color_jpeg_422_decode,  # 4:2:2 horizontal-subsampling decode (completes the sampling family)
        "bigram_surprisal_score": text.bigram_surprisal_score,  # per-doc integer LM surprisal (bit-length log2, perplexity-style curation signal)
        "hybrid_search_rrf": similarity.hybrid_search_rrf,  # reciprocal-rank fusion of BM25 + cosine arms (the RAG hybrid-retrieval pattern)
        "streaming_late_data_audit": _streaming_late_data_audit,  # watermark dropped-late accounting, deterministic two-batch replay
        "bpe_train_merges": text.bpe_train_merges,  # REAL BPE tokenizer training: 8 exact merge steps over the corpus vocab
        "bpe_encode_token_counts": text.bpe_encode_token_counts,  # BPE encode: per-doc real post-merge token counts via the trained vocab
        "matryoshka_rank_agreement": similarity.matryoshka_rank_agreement,  # MRL truncation audit: full vs half-dim exact-cosine rank agreement
        "layout_advisor": maintenance.layout_advisor,  # physical-layout decision table over the ANALYZE profile (encoding/partition/sort-key)
        "streaming_update_mode_rollup": _streaming_update_mode_rollup,  # update-mode delta emission: per-batch changed groups with cumulative counts
        "pack_bpe_token_shards": sampling.pack_bpe_token_shards,  # sequence packing on REAL trained-BPE token counts
        "dataset_card_report": maintenance.dataset_card_report,  # one-page corpus fact sheet, exact BIGINT long format
        "eb_shrunk_source_quality": sampling.eb_shrunk_source_quality,  # empirical-Bayes shrunk per-source quality rates (fixed-point MoM beta-binomial)
        "multimodal_resize_420": multimodal.multimodal_resize_420,  # 4:2:0 decode + real thumbnail resample, the full production image chain
        # --- round-6 front (all green in CORRECTNESS_r06) ---
        "table_checksum": maintenance.table_checksum,  # canonical = BIGINT transport since r6
        "supplier_kcore": graph.supplier_kcore,  # iterative k-core peeling (unrolled; cascade pinned by constructed-graph test)
        "revenue_gini": extended.revenue_gini,  # exact rank-weighted concentration index, one IEEE division
        "trimmed_mean_order_value": extended.trimmed_mean_order_value,  # integer trim boundaries, exact kept-sum
        "bm25_doc_rank": text.bm25_doc_rank,  # exact-rational BM25 top-k (denominator-cleared, one integer DIV per term)
        "knn_label_vote": similarity.knn_label_vote,  # kNN majority-vote label audit (decimal-dot exact, total tie-breaks)
        "decile_lift_table": relational.decile_lift_table,  # model-eval lift/gains rollup (total-order ntile, cross-multiplied lift)
        "multimodal_jpeg_decode": multimodal.multimodal_jpeg_decode,  # REAL baseline-JPEG decode; oracle = closed-form lossy chain
        "lateral_top_customers_per_nation": extended.lateral_top_customers_per_nation,  # Spark 4 LATERAL correlated subquery; oracle = the VERBATIM same SQL
        # --- round-6 additions land here (inside the first-50 window) ---
        "knn_label_vote_ivf": similarity.knn_label_vote_ivf,  # ANN-backed vote: persisted-IVF probe pruning, exact oracle
        "multimodal_palette_png_decode": multimodal.multimodal_palette_png_decode,  # REAL color-type-3 PNG: PLTE expansion, oracle on RGB raster
        "multimodal_wav_decode": multimodal.multimodal_wav_decode,  # REAL RIFF/WAVE audio decode: chunk walk, exact energy, waveform hash
        "multimodal_mjpeg_frame_sample": multimodal.multimodal_mjpeg_frame_sample,  # video-container frame sampling: seek-skip parse + real JPEG decode of every 2nd frame
        "bitmap_weekly_users": relational.bitmap_weekly_users,  # EXACT mergeable bitmap distinct (62-bit words, OR-merge, popcount)
        "revenue_cusum_max": cleaning.revenue_cusum_max,  # CUSUM change-point locator, denominator-cleared exact integers
        "mann_whitney_u": cleaning.mann_whitney_u,  # rank-sum test, doubled midranks keep ties integral
        "bigram_collocations": text.bigram_collocations,  # PMI-core lift ranking, log dropped for the exact rational
        "source_vocab_jaccard": text.source_vocab_jaccard,  # pairwise source vocabulary overlap (token-join, never doc pairs)
        "simpson_token_diversity": text.simpson_token_diversity,  # Gini-Simpson 1-Σp² — the exact-rational diversity index
        "top_keywords_per_doc": text.top_keywords_per_doc,  # tf/df keyword extraction, per-doc windows
        "table_profile": maintenance.table_profile,  # one-pass ANALYZE: nulls/distinct/min/max per column, long-format
        "customer_order_streaks": relational.customer_order_streaks,  # gaps-and-islands longest consecutive-month run
        "weekly_seasonal_mae": relational.weekly_seasonal_mae,  # seasonal-naive forecast error, exact cents
        "customer_balance_band_pairs": extended.customer_balance_band_pairs,  # |a-b|<=δ band self-join via bucket+neighbor probe
        "dpp_partitioned_rollup": maintenance.dpp_partitioned_rollup,  # dynamic partition pruning over the day-partitioned artifact
        "copurchase_edge_support": graph.copurchase_edge_support,  # per-edge common-neighbor (k-truss support) over the edge artifact
        "orders_percentile_ladder": extended.orders_percentile_ladder,  # exact order-statistic p25/50/75/90/99 per priority
        "hhi_market_concentration": extended.hhi_market_concentration,  # Herfindahl index per region, exact rational shares
        "json_value_histogram": relational.json_value_histogram,  # engine-side JSON path extraction + bucket histogram
        "streaming_bitmap_distinct": _streaming_bitmap_distinct,  # streaming exact-distinct bitmap state (bit_or words)
        "checksum_replica_diff": maintenance.checksum_replica_diff,  # anti-entropy localization: differing buckets + corrupt counts
        "weekly_user_overlap": relational.weekly_user_overlap,  # bitmap AND/AND-NOT set algebra: returning/churned/new exact
        "supplier_label_propagation": graph.supplier_label_propagation,  # min-label k-round communities (unrolled, oracle-exact)
        "lsh_tuning_report": dedup.lsh_tuning_report,  # banding S-curve cost dry-run: buckets + candidate pairs per (b,r)
        "embedding_pq_codes": similarity.embedding_pq_codes,  # product-quantization 2-subspace code assignment
        "join_cardinality_estimate": maintenance.join_cardinality_estimate,  # exact join costing from per-side key aggregates
        "copurchase_degree_histogram": graph.copurchase_degree_histogram,  # log2-binned degree distribution (bit-length bins)
        "cv_fold_assignment": sampling.cv_fold_assignment,  # deterministic md5 k-fold split + per-fold audit
        "split_label_drift": sampling.split_label_drift,  # total-variation source drift per split, exact-rational
        "event_type_pivot": relational.event_type_pivot,  # native PIVOT to the wide weekly event matrix
        "bloom_membership_audit": maintenance.bloom_membership_audit,  # real Bloom filter, exact fill/hit/false-positive counts
        "bootstrap_mean_ci": cleaning.bootstrap_mean_ci,  # md5-deterministic bootstrap CI, order-statistic bounds
        "daily_lag_correlation": cleaning.daily_lag_correlation,  # lead/lag Pearson r, exact moments + IEEE sqrt tail
        "temporal_backtest_splits": sampling.temporal_backtest_splits,  # expanding-window time-series CV boundaries
        "quantile_normalize_per_source": sampling.quantile_normalize_per_source,  # rank-map lengths onto the global distribution
        "data_expectations_report": maintenance.data_expectations_report,  # declarative data-contract battery, exact violation counts
        "multimodal_color_jpeg_decode": multimodal.multimodal_color_jpeg_decode,  # REAL 3-component YCbCr 4:4:4 JPEG decode, closed-form color oracle
        "pq_search_adc": similarity.pq_search_adc,  # PQ asymmetric-distance top-k over the codes table (codebook lookups only)
        "shuffle_skew_report": maintenance.shuffle_skew_report,  # join-key skew audit: exact count percentiles + salt sizing
        "multimodal_wav_frame_features": multimodal.multimodal_wav_frame_features,  # short-time audio features (energy/ZCR/peak) per frame
        # --- everything below is driver-attested (r01..r05 union) ---
        "supplier_pagerank": graph.supplier_pagerank,  # fixed-point iterative graph (oracle-exact)
        "max_concurrent_sessions": relational.max_concurrent_sessions,
        "quality_threshold_for_budget": sampling.quality_threshold_for_budget,
        "edit_distance_pairs": dedup.edit_distance_pairs,
        "streaming_semi_join": _streaming_semi_join,  # oracle (emitted set == batch EXISTS)
        "supplier_triangles": graph.supplier_triangles,  # degree-oriented motif count vs naive 3-way-join oracle
        "brand_assoc_rules": extended.brand_assoc_rules,
        "user_value_ewma": relational.user_value_ewma,  # bit-exact ordered IEEE fold
        "supplier_bfs_hops": graph.supplier_bfs_hops,  # bounded-hop shortest paths (unrolled Pregel)
        "supplier_clustering_coeff": graph.supplier_clustering_coeff,
        "streaming_user_ewma": _streaming_user_ewma,  # order-sensitive stateful fold == batch EWMA
        "consensus_near_dup_pairs": dedup.consensus_near_dup_pairs,  # >=2-of-3 family vote
        "event_pattern_conversions": relational.event_pattern_conversions,  # regex sequence mining (MATCH_RECOGNIZE shape)
        "session_overlap_degree": relational.session_overlap_degree,  # interval-overlap via order statistics (oracle = quadratic IEJoin)
        "user_time_weighted_value": relational.user_time_weighted_value,  # exact cents-by-microseconds TWA
        "calendar_activity_spine": extended.calendar_activity_spine,  # Python DataSource spine, oracle-checked
        "recursive_supplier_reach": extended.recursive_supplier_reach,  # Spark 4 WITH RECURSIVE; oracle = the VERBATIM same SQL
        "quality_canonical_docs": dedup.quality_canonical_docs,  # best-quality survivor per near-dup cluster
        "systematic_token_sample": sampling.systematic_token_sample,  # weighted sampling, zero RNG, exact integers
        "rolling_7day_median_value": cleaning.rolling_7day_median_value,  # exact rolling median (non-decomposable rolling stat)
        "event_dow_chi2": cleaning.event_dow_chi2,  # exact-integer chi-square contingency
        "nation_share_of_region": extended.nation_share_of_region,  # hierarchical share-of-parent ladder
        "session_novelty": relational.session_novelty,  # set-valued window analytics (arrays through lag)
        "weighted_median_price": extended.weighted_median_price,  # weighted order statistic (exact, discrete)
        "time_grain_rollup": extended.time_grain_rollup,  # leaf-first calendar-hierarchy rollup
        "order_revenue_allocation": relational.order_revenue_allocation,  # largest-remainder exact allocation
        "corpus_curation_v2": sampling.corpus_curation_v2,  # composed: quality-canonical dedup -> floor -> systematic sample
        "customer_revenue_pareto": extended.customer_revenue_pareto,  # Lorenz curve + exact 80% crossing
        "chargram_minhash_fast": _chargram_minhash_fast,  # rows-only (xxhash64 family; shape-tested vs md5 twin)
        "hll_union_weekly_users": extended.hll_union_weekly_users,  # rows-only (mergeable-sketch rollup; error-bound test)
        # --- round-5 additions land here (inside the first-50 window) ---
        "multimodal_png_decode": multimodal.multimodal_png_decode,  # REAL stdlib PNG decode, oracle on decoded pixels
        "benford_price_digits": cleaning.benford_price_digits,  # first-digit audit, arithmetic digit extraction
        "ks_two_sample": cleaning.ks_two_sample,  # exact integer-scaled KS statistic
        "skyline_orders": extended.skyline_orders,  # Pareto frontier via two windows; oracle = quadratic NOT EXISTS
        "user_modal_event_type": relational.user_modal_event_type,  # grouped categorical mode, total tie-break
        "rfm_segments": relational.rfm_segments,  # ntile(5) quintile scoring over tie-broken orders
        "user_acquisition_curve": relational.user_acquisition_curve,  # running COUNT DISTINCT via first-seen decomposition
        "sparse_cosine_pairs": text.sparse_cosine_pairs,  # inverted-index lexical cosine, df-capped vocab
        "phrase_search": text.phrase_search,  # positional index: top bigram's per-doc matches
        "event_type_lift": relational.event_type_lift,  # association lift, decimal products
        "interval_coverage_per_user": relational.interval_coverage_per_user,  # union-of-intervals measure
        "asof_join_tolerance": relational.asof_join_tolerance,  # as-of with staleness bound
        "gdpr_erasure_audit": maintenance.gdpr_erasure_audit,  # FK-cascade delete impact dry-run
        "split_leakage_check": dedup.split_leakage_check,  # cross-split exact-dup contamination
        "chunk_documents_udtf": text.chunk_documents_udtf,  # Python UDTF twin, shares chunk_documents' oracle
        "priority_sample_topk": sampling.priority_sample_topk,  # DLT priority sampling: weighted-without-replacement, IEEE-division-exact
        "linear_touch_attribution": relational.linear_touch_attribution,  # equal-credit revenue attribution, conservation-exact cents
        # --- round-4 verification front, part 1 (all green in
        # CORRECTNESS_r04.json): the 22 entries registry reordering had
        # displaced from every driver first-50 window in rounds 1-3.
        "token_estimate": text.token_estimate,
        "salted_token_counts": text.salted_token_counts,
        "chargram_minhash": text.chargram_minhash,
        "doc_commonness": text.doc_commonness,
        "extract_event_props": extended.extract_event_props,
        "part_string_features": extended.part_string_features,
        "orders_range_join": extended.orders_range_join,
        "global_top_lineitems": extended.global_top_lineitems,
        "supplier_stats": extended.supplier_stats,
        "daily_spine_ffill": extended.daily_spine_ffill,
        "label_centroids": extended.label_centroids,
        "sql_interface_shipping_priority": extended.sql_interface_shipping_priority,
        "quantity_percentiles": extended.quantity_percentiles,
        "profile_lineitem": extended.profile_lineitem,
        "order_percentiles": extended.order_percentiles,
        "pivot_status_by_flag": extended.pivot_status_by_flag,
        "orders_above_global_avg": extended.orders_above_global_avg,
        "order_date_features": extended.order_date_features,
        "price_histogram": extended.price_histogram,
        "price_quantity_corr": extended.price_quantity_corr,
        "approx_distinct_parts": extended.approx_distinct_parts,  # rows-only (HLL)
        "approx_quantity_percentiles": extended.approx_quantity_percentiles,  # rows-only (sketch)
        # --- round-4 verification front, part 2: new round-4 operators
        # (inserted here as they land so the driver records them)
        "minhash_lsh_pairs_fast": _minhash_lsh_pairs_fast,  # rows-only (xxhash64 family; equality-tested vs md5 twin)
        "minhash_lsh_pairs_banddf_capped": _minhash_lsh_pairs_banddf_capped,  # hot-band skew guard active
        "streaming_first_events_bounded": _streaming_first_events_bounded,  # oracle (bounded-state dedup)
        "semantic_dedup": similarity.semantic_dedup,
        "semantic_dedup_scaled": similarity.semantic_dedup_scaled,  # srp-sub-bucketed cells (linear scale path)
        "streaming_running_user_stats": _streaming_running_user_stats,  # oracle (running fold == batch groupBy)
        "prefix_filter_jaccard_pairs": dedup.prefix_filter_jaccard_pairs,
        "event_value_outliers": cleaning.event_value_outliers,
        "asof_join_forward": relational.asof_join_forward,
        "salted_skew_join_rollup": maintenance.salted_skew_join_rollup,
        "bloom_filtered_join_rollup": maintenance.bloom_filtered_join_rollup,  # runtime-filter prune, exact-join verified
        "session_window_rollup": relational.session_window_rollup,  # built-in session_window (streamable form)
        "streaming_session_window": _streaming_session_window,  # oracle (same island SQL as batch)
        "ngram_containment_pairs": dedup.ngram_containment_pairs,  # asymmetric (excerpt) near-dup
        "per_source_quality_cap": sampling.per_source_quality_cap,  # domain cap, best-first
        "discounted_revenue": tpch_shapes.discounted_revenue,  # Q6 analog: pure pushdown scan-agg
        "kcenter_diversity_sample": clustering.kcenter_diversity_sample,  # greedy farthest-first coreset
        "streaming_full_outer_join": _streaming_full_outer_join,  # oracle (batch full join twin)
        "observed_quality_filter": _observed_quality_filter,  # observe() metrics on the same pass
        "grouped_linear_trend": extended.grouped_linear_trend,  # per-group closed-form OLS (exact moments)
        "streaming_dedup_then_rollup": _streaming_dedup_then_rollup,  # chained stateful ops, oracle
        "streaming_static_enrich": _streaming_static_enrich,  # stream-static broadcast join, oracle
        "daily_spine_interpolate": extended.daily_spine_interpolate,  # linear gap interpolation (cents-exact anchors)
        "latest_event_per_user": extended.latest_event_per_user,  # top-1 per key via max_by (no sort)
        "pack_token_shards_scalable": sampling.pack_token_shards_scalable,  # two-level prefix-sum decomposition
        "repetition_stats_long": cleaning.repetition_stats_long,  # linear explode+groupBy form (book-length docs)
        "count_min_heavy_hitters": text.count_min_heavy_hitters,  # CM sketch, md5 buckets => exactly oracle-checkable
        # --- round-3 additions (all green in CORRECTNESS_r03.json)
        "volume_shipping": tpch_shapes.volume_shipping,
        "nation_market_share": tpch_shapes.nation_market_share,
        "product_type_profit": tpch_shapes.product_type_profit,
        "returned_item_customers": tpch_shapes.returned_item_customers,
        "shipmode_priority_counts": tpch_shapes.shipmode_priority_counts,
        "duplicate_spans": dedup.duplicate_spans,
        "span_dup_coverage": dedup.span_dup_coverage,
        "merge_changeset": maintenance.merge_changeset,
        "referential_integrity_check": maintenance.referential_integrity_check,
        "grouping_sets_report": maintenance.grouping_sets_report,
        "streaming_left_outer_join": _streaming_left_outer_join,  # oracle (batch twin)
        "rolling_7day_distinct_users": relational.rolling_7day_distinct_users,
        "schema_evolution_read": _schema_evolution_read,
        "funnel_conversion_windowed": relational.funnel_conversion_windowed,
        "incremental_rollup_merge": relational.incremental_rollup_merge,
        "user_event_transitions": relational.user_event_transitions,
        "event_gap_histogram": relational.event_gap_histogram,
        "bucketed_join_rollup": maintenance.bucketed_join_rollup,
        "similarity_topk_ivf_prebuilt": similarity.ivf_topk_prebuilt,
        "scd2_as_of": relational.scd2_as_of,
        "incremental_minhash_dedup": dedup.incremental_minhash_dedup,
        "quality_score_model": text.quality_score_model,
        # --- round-2 verification front: r01-driver-unrecorded + new/changed
        # round-2 operator additions
        "chunk_documents": text.chunk_documents,
        "vocab_coverage": text.vocab_coverage,
        "heavy_hitters_per_source": text.heavy_hitters_per_source,
        "source_report": cleaning.source_report,
        "retention_cohorts": relational.retention_cohorts,
        "wow_event_growth": relational.wow_event_growth,
        # decision-support query-shape pack (TPC-H Q2/Q4/Q11/Q13/Q15/Q16/
        # Q17/Q19/Q20/Q21/Q22 analogs — correlated-subquery decorrelation,
        # nested semi/anti joins, disjunctive join predicates)
        "min_cost_supplier": tpch_shapes.min_cost_supplier,
        "late_order_priority_counts": tpch_shapes.late_order_priority_counts,
        "important_parts_value": tpch_shapes.important_parts_value,
        "customer_order_distribution": tpch_shapes.customer_order_distribution,
        "top_revenue_suppliers": tpch_shapes.top_revenue_suppliers,
        "supplier_count_by_part_attrs": tpch_shapes.supplier_count_by_part_attrs,
        "small_quantity_revenue": tpch_shapes.small_quantity_revenue,
        "disjunctive_part_revenue": tpch_shapes.disjunctive_part_revenue,
        "excess_stock_suppliers": tpch_shapes.excess_stock_suppliers,
        "waiting_orders_suppliers": tpch_shapes.waiting_orders_suppliers,
        "idle_rich_customers": tpch_shapes.idle_rich_customers,
        # corpus versioning + semi-structured (round 2)
        "snapshot_diff": cleaning.snapshot_diff,
        "variant_props_rollup": extended.variant_props_rollup,
        "price_equidepth_histogram": extended.price_equidepth_histogram,
        "recursive_week_spine": extended.recursive_week_spine,
        "importance_sample": sampling.importance_sample,
        "token_budget_mix": sampling.token_budget_mix,
        # structured streaming (availableNow harness)
        "streaming_weekly_rollup": _streaming_weekly_rollup,  # oracle (epoch-aligned windows)
        "streaming_sliding_rollup": _streaming_sliding_rollup,  # oracle (7d/1d sliding)
        "streaming_sessionize": _streaming_sessionize,  # oracle (closed sessions)
        "streaming_first_events": _streaming_first_events,  # oracle (set-deterministic)
        "streaming_click_purchase_join": _streaming_click_purchase_join,  # oracle (batch twin)
        # dedup additions / rebased pipeline (round 2)
        "ngram_jaccard_pairs_capped": _ngram_jaccard_pairs_capped,  # df-cap guard active
        "near_dup_clusters_lsh": _near_dup_clusters_lsh,  # sub-quadratic pair source
        "corpus_clean_pipeline": dedup.corpus_clean_pipeline,  # now defaults to LSH pairs
        # multimodal plumbing
        "multimodal_meta": multimodal.multimodal_meta,
        "multimodal_features": multimodal.multimodal_features,  # pandas-UDF path
        "user_value_trend": multimodal.user_value_trend,  # rows-only (float fit)
        "multimodal_frame_sample": multimodal.sample_frames,  # pandas fan-out, oracle
        # deterministic sampling / data mixing
        "hash_sample": sampling.hash_sample,
        "stratified_sample": sampling.stratified_sample,
        "weighted_source_mix": sampling.weighted_source_mix,
        "pack_token_shards": sampling.pack_token_shards,
        "dataset_splits": sampling.dataset_splits,
        # corpus cleaning beyond dedup
        "repetition_stats": cleaning.repetition_stats,
        "contamination_check": cleaning.contamination_check,
        "pii_scrub": cleaning.pii_scrub,
        # text analysis
        "text_quality": text.text_quality,
        "token_counts": text.token_counts,
        "lang_id": text.lang_id,
        "doc_fingerprints": text.doc_fingerprints,
        "term_doc_stats": text.term_doc_stats,
        "text_normalize": text.text_normalize,
        "quality_filter": text.quality_filter,
        # --- r01-driver-recorded block (all green in CORRECTNESS_r01.json)
        # reference surface
        "flagship_pipeline": relational.flagship_pipeline,
        "trends_pipeline_synthetic": _trends_pipeline_synthetic,
        "unpivot_part_metrics": _unpivot_part_metrics,
        "filter_isin_projection": _filter_isin_projection,
        "const_cols_rename_project": _const_cols_rename_project,
        "group_count_distinct_having": _group_count_distinct_having,
        "semi_join_filter": _semi_join_filter,
        "rank_window_tiebreak": _rank_window_tiebreak,
        "previous_week_dates": _previous_week_dates,
        # analytics / joins / windows at scale
        "pricing_summary": relational.pricing_summary,
        "revenue_by_nation": relational.revenue_by_nation,
        "top_orders_per_customer": relational.top_orders_per_customer,
        "asof_join_events_orders": relational.asof_join_events_orders,
        "weekly_event_rollup": relational.weekly_event_rollup,
        "sessionize_events": relational.sessionize_events,
        "scd2_user_type_history": relational.scd2_user_type_history,
        "funnel_conversion": relational.funnel_conversion,
        "rolling_7day_user_value": relational.rolling_7day_user_value,
        "user_event_sequences": relational.user_event_sequences,
        "nation_revenue_share": relational.nation_revenue_share,
        # dedup
        "exact_dedup": dedup.exact_dedup,
        "canonical_docs": dedup.canonical_docs,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "near_dup_clusters": dedup.near_dup_clusters,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,  # oracle (md5 hash family)
        "simhash_signatures": dedup.simhash_signatures,  # oracle (md5-derived bits)
        "simhash_near_dup_pairs": dedup.simhash_near_dup_pairs,  # oracle (md5-derived bits)
        # similarity search
        "similarity_topk": similarity.brute_force_topk,
        "similarity_topk_lsh": similarity.srp_lsh_topk,  # oracle (deterministic buckets)
        "similarity_topk_ivf": similarity.ivf_topk,  # oracle (deterministic probe)
        "embedding_near_dup": similarity.embedding_near_dup_pairs,
        "embedding_normalize": similarity.embedding_normalize,
        "embedding_quantize": similarity.embedding_quantize,
        "kmeans_assignments": clustering.kmeans_assignments,
        "kmeans_cluster_sizes": clustering.kmeans_cluster_sizes,
        # extended relational surface (absent from the reference, §2.7)
        "priority_class_by_status": extended.priority_class_by_status,
        "big_order_customers": extended.big_order_customers,
        "null_safe_event_join": extended.null_safe_event_join,
        "promo_revenue_share": extended.promo_revenue_share,
        "rollup_order_counts": extended.rollup_order_counts,
        "cube_lineitem_flags": extended.cube_lineitem_flags,
        "nations_set_ops": extended.nations_set_ops,
        "customers_without_orders": extended.customers_without_orders,
        "nation_order_outer": extended.nation_order_outer,
        "order_gaps_lead_lag": extended.order_gaps_lead_lag,
        "order_value_extremes": extended.order_value_extremes,
        "fuzzy_name_matches": extended.fuzzy_name_matches,
        "global_row_numbers": extended.global_row_numbers,
        "zorder_key": extended.zorder_key,
        # checksum-family diagnostic (attested green r5; kept registered
        # as the no-arithmetic probe isolating the md5 row-hash stage)
        "table_checksum_probe": maintenance.table_checksum_probe,
    }


def _hex_u32(expr: str, start: int) -> str:
    """DuckDB-version-robust unsigned fold of 8 hex digits of ``expr``
    (a lowercase hex string column) starting at 1-based ``start``.

    Replaces the ``CAST('0x' || substring(..) AS BIGINT)`` idiom, whose
    hex-literal string-cast behavior is DuckDB-version-sensitive
    (VERDICT r3 item 1): a plain arithmetic digit fold over strpos()
    works identically on any SQL engine."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substring({expr}, {start + i}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"({terms})"


def _hex_u60(expr: str, start: int = 1) -> str:
    """Nonnegative 60-bit fold of 15 hex digits of ``expr`` starting at
    1-based ``start`` — the same strpos digit arithmetic as
    :func:`_hex_u32` (max value 16^15−1 < 2^60, BIGINT-safe on both
    engines). Twin of Spark's ``conv(substring(md5(g), 1, 15), 16, 10)``
    (the winnowing fingerprint hash)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substring({expr}, {start + i}, 1)) - 1)"
        f" * {16 ** (14 - i)}"
        for i in range(15)
    )
    return f"({terms})"


def _zorder_expr(var: str, shift_base: int) -> str:
    """SQL for spreading the low 8 bits of ``var`` to every-other bit
    position — generated so the Spark expression and the oracle share one
    definition of the interleave."""
    return " + ".join(
        f"(({var} >> {i}) & 1) * {1 << (2 * i + shift_base)}" for i in range(8)
    )


def _kmeans_sql() -> str:
    """CTE chain mirroring clustering.py's two-round deterministic Lloyd:
    per-label init centroids -> assign -> update -> assign. Shares the
    bit-identity rules: fixed-point floor(x*1e9) means, list_reduce left-fold
    distances, (d, cl) total-order argmin."""
    cent = (
        "SELECT {key} AS cl, i AS dim, "
        "CAST(SUM(CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1000000000.0) "
        "AS BIGINT)) AS DOUBLE) / COUNT(*) / 1000000000.0 AS c "
        "FROM {src}, (SELECT unnest(range(64)) AS i) t GROUP BY {key}, i"
    )
    assign = """
a{r} AS (
  SELECT vec_id, embedding, cl,
         list_reduce(list_transform(range(64),
           i -> (CAST(embedding[i+1] AS DOUBLE) - cent[i+1]) *
                (CAST(embedding[i+1] AS DOUBLE) - cent[i+1])),
           (a, b) -> a + b) AS d
  FROM e CROSS JOIN c{r}
),
s{r} AS (
  SELECT vec_id, embedding, cl AS cluster FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY d ASC, cl ASC) AS rk
    FROM a{r}
  ) WHERE rk = 1
)"""
    return f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
c0d AS ({cent.format(key="label", src="embeddings")}),
c0 AS (SELECT cl, list(c ORDER BY dim ASC) AS cent FROM c0d GROUP BY cl),
{assign.format(r=0)},
c1d AS ({cent.format(key="cluster", src="s0")}),
c1 AS (SELECT cl, list(c ORDER BY dim ASC) AS cent FROM c1d GROUP BY cl),
{assign.format(r=1)}
"""


def _kcenter_sql(k: int = 8) -> str:
    """Twin of clustering.kcenter_diversity_sample: replays the greedy
    farthest-first trajectory step for step — DECIMAL dot/norm ladder,
    the same ``(nsq + c_nsq) - 2*dot`` association, (md DESC, vec_id)
    argmax tie-break. Generated as a k-step CTE chain (same unrolled
    pattern as _kmeans_sql)."""
    dot = (
        "list_sum(list_transform(range(64), i -> "
        "CAST(CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE) "
        "AS DECIMAL(28,14))))"
    )
    parts = [
        "WITH e AS (SELECT vec_id, embedding, CAST("
        + dot.format(a="embedding", b="embedding")
        + " AS DOUBLE) AS nsq FROM embeddings)",
        "c0 AS (SELECT vec_id, embedding, nsq FROM e ORDER BY vec_id ASC LIMIT 1)",
        "m1 AS (SELECT e.vec_id, e.embedding, e.nsq, (e.nsq + c0.nsq) - 2.0*CAST("
        + dot.format(a="e.embedding", b="c0.embedding")
        + " AS DOUBLE) AS md FROM e CROSS JOIN c0)",
    ]
    for j in range(1, k - 1):
        parts.append(
            f"c{j} AS (SELECT vec_id, embedding, nsq FROM m{j} "
            f"ORDER BY md DESC, vec_id ASC LIMIT 1)"
        )
        parts.append(
            f"m{j + 1} AS (SELECT m{j}.vec_id, m{j}.embedding, m{j}.nsq, "
            f"LEAST(m{j}.md, (m{j}.nsq + c{j}.nsq) - 2.0*CAST("
            + dot.format(a=f"m{j}.embedding", b=f"c{j}.embedding")
            + f" AS DOUBLE)) AS md FROM m{j} CROSS JOIN c{j})"
        )
    parts.append(
        f"c{k - 1} AS (SELECT vec_id, embedding, nsq FROM m{k - 1} "
        f"ORDER BY md DESC, vec_id ASC LIMIT 1)"
    )
    selects = " UNION ALL ".join(
        f"SELECT CAST({j} AS INTEGER) AS sel_rank, vec_id FROM c{j}"
        for j in range(k)
    )
    return ",\n".join(parts) + "\n" + selects


#: strict-left-fold double dot product over 64 dims — bit-identical to
#: Spark's F.aggregate/zip_with (see embedding_normalize)
_FOLD64 = (
    "list_reduce(list_transform(range(64), "
    "i -> CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE)), "
    "(x, y) -> x + y)"
)


def _srp_plane_values(n_tables: int, n_planes: int, dim: int = 64) -> str:
    """SQL VALUES rows of the deterministic SRP hyperplane weights —
    generated from the operator's own ``_srp_plane_weight`` so the Spark
    plan and every oracle twin share one source of truth."""
    from data_engineer_interview_task_spark.operators.similarity import (
        _srp_plane_weight,
    )

    return ", ".join(
        f"({t}, {p}, {d}, {_srp_plane_weight(t, p, d)!r})"
        for t in range(n_tables)
        for p in range(n_planes)
        for d in range(dim)
    )


def _srp_lsh_sql() -> str:
    """Twin of similarity.srp_lsh_topk: the same 2048 literal hyperplane
    weights (shared python source of truth), DECIMAL projection sums (sign
    bits deterministic), bucket collision candidates across 8 tables,
    exact left-fold-double cosine re-ranking."""
    values = _srp_plane_values(n_tables=8, n_planes=4)
    fold = (
        "list_reduce(list_transform(range(64), i -> "
        "CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE)), "
        "(x, y) -> x + y)"
    )
    return f"""
w(t, p, d, wt) AS (VALUES {values}),
ex AS (
  SELECT vec_id, embedding, i AS d, CAST(embedding[i + 1] AS DOUBLE) AS x
  FROM embeddings, (SELECT unnest(range(64)) AS i) dims
),
proj AS (
  SELECT vec_id, w.t, w.p,
         SUM(CAST(floor(x * wt * 1000000000.0) AS BIGINT)) AS s
  FROM ex JOIN w ON ex.d = w.d
  GROUP BY vec_id, w.t, w.p
),
buckets AS (
  SELECT vec_id, t,
         CAST(SUM(CASE WHEN s >= 0 THEN 1 << p ELSE 0 END) AS BIGINT)
           AS bucket
  FROM proj GROUP BY vec_id, t
),
b2 AS (SELECT b.vec_id, e.embedding, b.t, b.bucket
       FROM buckets b JOIN embeddings e ON b.vec_id = e.vec_id),
pairs AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  q.embedding AS qe, c.embedding AS ce
  FROM b2 q JOIN b2 c ON q.t = c.t AND q.bucket = c.bucket
  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
),
scored AS (
  SELECT query_id, neighbor_id,
         {fold.format(a='qe', b='ce')}
           / (sqrt({fold.format(a='qe', b='qe')})
              * sqrt({fold.format(a='ce', b='ce')})) AS cos
  FROM pairs
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
"""


def _minhash_sql() -> str:
    """Twin of dedup.minhash_lsh_pairs: one md5 per shingle split into two
    64-bit halves, affine family g_i = (p1 + i*p2) mod 2^64 mapped to the
    SIGNED long (matching Spark's wrapping arithmetic), 32 MIN columns,
    8 md5 band keys, band-collision candidates, exact-Jaccard verify."""
    return _minhash_ctes() + "\nSELECT doc_a, doc_b, jaccard FROM lsh_pairs"


def _minhash_ctes(max_band_df: int | None = None) -> str:
    """The minhash-LSH construction as a reusable CTE chain ending in
    ``lsh_pairs(doc_a, doc_b, jaccard)`` — composed by the pair query
    itself AND by the recursive connected-components oracles
    (near_dup_clusters_lsh, corpus_clean_pipeline). ``max_band_df``
    mirrors the operator's hot-band skew cap: band keys shared by more
    than that many docs are dropped before the self-join."""
    m_unsigned = "18446744073709551616"
    m_signbit = "9223372036854775808"

    def signed_g(i: int) -> str:
        g = f"(p1 + {i} * p2) % {m_unsigned}"
        return (
            f"MIN(CAST({g} - CASE WHEN {g} >= {m_signbit} "
            f"THEN {m_unsigned} ELSE 0 END AS BIGINT)) AS h{i}"
        )

    mins = ",\n         ".join(signed_g(i) for i in range(32))
    band_arms = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({key}) AS band_key FROM sig".format(
            b=b,
            key=" || '|' || ".join(
                f"CAST(h{b * 4 + j} AS VARCHAR)" for j in range(4)
            ),
        )
        for b in range(8)
    )
    return f"""
d AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) >= 3
              THEN list_distinct(list_transform(
                     range(len(string_split(text, ' ')) - 2),
                     i -> string_split(text, ' ')[i+1] || ' ' ||
                          string_split(text, ' ')[i+2] || ' ' ||
                          string_split(text, ' ')[i+3]))
              ELSE [text] END AS shingles
  FROM documents
),
e0 AS (SELECT doc_id, unnest(shingles) AS sh FROM d),
em AS (SELECT doc_id, md5(sh) AS m FROM e0),
e AS (
  SELECT doc_id,
         CAST({_hex_u32('m', 1)} AS HUGEINT)
           * 4294967296 + {_hex_u32('m', 9)}
           AS p1,
         CAST({_hex_u32('m', 17)} AS HUGEINT)
           * 4294967296 + {_hex_u32('m', 25)}
           AS p2
  FROM em
),
sig AS (
  SELECT doc_id,
         {mins}
  FROM e GROUP BY doc_id
),
bands0 AS (
  {band_arms}
),
bands AS ({
    "SELECT b0.doc_id, b0.band, b0.band_key FROM bands0 b0 JOIN "
    "(SELECT band, band_key FROM bands0 GROUP BY band, band_key "
    f"HAVING COUNT(*) <= {max_band_df}) bk "
    "ON b0.band = bk.band AND b0.band_key = bk.band_key"
    if max_band_df is not None
    else "SELECT doc_id, band, band_key FROM bands0"
}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
lsh_pairs AS (
  SELECT doc_a, doc_b,
         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
           / (len(sa.shingles) + len(sb.shingles)
              - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
  FROM cand
  JOIN d sa ON sa.doc_id = doc_a
  JOIN d sb ON sb.doc_id = doc_b
  WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
          / (len(sa.shingles) + len(sb.shingles)
             - len(list_intersect(sa.shingles, sb.shingles))) >= 0.5
)"""


def _simhash_sig_sql() -> str:
    """CTE chain producing (doc_id, simhash BIGINT) — bit-exact twin of
    dedup.simhash_signatures: distinct word-trigram shingles -> md5-derived
    signed 64-bit feature hash -> per-bit +/-1 votes -> sign bits packed
    into a two's-complement long (bit 63's weight is the long MIN, exactly
    Spark's wrapped shiftleft(1L, 63))."""
    votes = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(64)
    )
    packed = " + ".join(
        f"CASE WHEN v{b} > 0 THEN {(1 << b) if b < 63 else -(1 << 63)} "
        "ELSE 0 END"
        for b in range(64)
    )
    return f"""
d AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) >= 3
              THEN list_distinct(list_transform(
                     range(len(string_split(text, ' ')) - 2),
                     i -> string_split(text, ' ')[i+1] || ' ' ||
                          string_split(text, ' ')[i+2] || ' ' ||
                          string_split(text, ' ')[i+3]))
              ELSE [text] END AS shingles
  FROM documents
),
e AS (SELECT doc_id, unnest(shingles) AS tok FROM d),
em AS (SELECT doc_id, md5(tok) AS m FROM e),
hh AS (
  SELECT doc_id,
         CAST(CAST({_hex_u32('m', 1)} AS HUGEINT)
                * 4294967296
              + {_hex_u32('m', 9)}
              - CASE WHEN {_hex_u32('m', 1)} >= 2147483648
                     THEN 18446744073709551616 ELSE 0 END
              AS BIGINT) AS h
  FROM em
),
v AS (
  SELECT doc_id,
         {votes}
  FROM hh GROUP BY doc_id
),
sig AS (SELECT doc_id, CAST({packed} AS BIGINT) AS simhash FROM v)
"""


def _phash_sig_sql() -> str:
    """CTE chain producing ``psig(doc_id, dhash, ahash)`` — bit-exact twin
    of ``multimodal.image_perceptual_hashes``: the fixture raster is the
    md5 CHAIN of the first-20-token prefix (8 digests = 256 hex-char
    bytes) perturbed at ``P = int(md5(text)[:2], 16)`` with byte 122; the
    9×8 / 8×8 grids replay :func:`resize_image`'s pinned floor resample
    ``src = (r*16 DIV out_h, c*16 DIV out_w)``; dHash bit (r,c) compares
    horizontally adjacent resized pixels, aHash bit i compares against
    the floor-mean of the 64 resized pixels; bits pack LSB-first into a
    two's-complement BIGINT (bit 63's weight is long MIN — the SimHash
    convention). One wrong raster byte, resample index, or comparison
    anywhere breaks the downstream pair hashes."""
    return """
pbase AS (
  SELECT doc_id,
         array_to_string(list_slice(string_split(text, ' '), 1, 20), ' ')
           AS pfx,
         md5(text) AS mt
  FROM documents
),
prep AS (
  SELECT doc_id,
         md5(pfx || ':0') || md5(pfx || ':1') || md5(pfx || ':2')
         || md5(pfx || ':3') || md5(pfx || ':4') || md5(pfx || ':5')
         || md5(pfx || ':6') || md5(pfx || ':7') AS r256,
         (strpos('0123456789abcdef', substring(mt, 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substring(mt, 2, 1)) - 1) AS p
  FROM pbase
),
pg9 AS (
  SELECT doc_id, r256, p, rr.r AS r, cc.c AS c,
         (2 * rr.r) * 16 + (16 * cc.c) // 9 AS idx
  FROM prep, (SELECT unnest(range(8))::INT AS r) rr,
             (SELECT unnest(range(9))::INT AS c) cc
),
pg9v AS (
  SELECT doc_id, r, c,
         CASE WHEN idx = p THEN 122
              ELSE ascii(substring(r256, idx + 1, 1)) END AS v
  FROM pg9
),
pdbits AS (
  SELECT a.doc_id, a.r, a.c,
         CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
  FROM pg9v a
  JOIN pg9v b ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
  WHERE a.c < 8
),
pdsig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN r = 7 AND c = 7
                       THEN bit * (-9223372036854775807 - 1)
                       ELSE bit * (1::BIGINT << (r * 8 + c)) END)
              AS BIGINT) AS dhash
  FROM pdbits GROUP BY doc_id
),
pg8 AS (
  SELECT doc_id, r256, p, rr.r AS r, cc.c AS c,
         (2 * rr.r) * 16 + 2 * cc.c AS idx
  FROM prep, (SELECT unnest(range(8))::INT AS r) rr,
             (SELECT unnest(range(8))::INT AS c) cc
),
pg8v AS (
  SELECT doc_id, r, c,
         CASE WHEN idx = p THEN 122
              ELSE ascii(substring(r256, idx + 1, 1)) END AS v
  FROM pg8
),
pmeans AS (SELECT doc_id, SUM(v) // 64 AS mean FROM pg8v GROUP BY doc_id),
pasig AS (
  SELECT g.doc_id,
         CAST(SUM(CASE WHEN g.r = 7 AND g.c = 7
                       THEN (CASE WHEN g.v > m.mean THEN 1 ELSE 0 END)
                            * (-9223372036854775807 - 1)
                       ELSE (CASE WHEN g.v > m.mean THEN 1 ELSE 0 END)
                            * (1::BIGINT << (g.r * 8 + g.c)) END)
              AS BIGINT) AS ahash
  FROM pg8v g JOIN pmeans m ON m.doc_id = g.doc_id
  GROUP BY g.doc_id
),
psig AS (
  SELECT d.doc_id, d.dhash, a.ahash
  FROM pdsig d JOIN pasig a USING (doc_id)
)
"""


def _weights_values() -> str:
    """The sampling recipe as a SQL VALUES list — generated from the SAME
    ``sampling.source_weights()`` the Spark query broadcasts, so the two
    engines share one source of truth for the mixture config."""
    return ", ".join(f"('{s}', '{h}')" for s, h in sampling.source_weights())


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twins. ALL FOUR streaming queries are oracle-checked
    (the availableNow harness makes their emitted sets batch-deterministic —
    including the stateful sessionizer and the stream-stream join). Omitted
    only where genuinely engine-specific: sketch internals
    (approx_distinct_parts HLL, approx_quantity_percentiles KLL) and the
    numpy float model fit (user_value_trend)."""
    shingles_cte = """
d AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) >= 3
              THEN list_distinct(list_transform(
                     range(len(string_split(text, ' ')) - 2),
                     i -> string_split(text, ' ')[i+1] || ' ' ||
                          string_split(text, ' ')[i+2] || ' ' ||
                          string_split(text, ' ')[i+3]))
              ELSE [text] END AS shingles
  FROM documents
)"""
    dot64 = (
        "list_sum(list_transform(range(64), "
        "i -> CAST(CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE) "
        "AS DECIMAL(28,14))))"
    )
    dot32 = dot64.replace("range(64)", "range(32)")
    d = {
        "flagship_pipeline": """
WITH base AS (
  SELECT l_suppkey, l_returnflag,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey, l_returnflag
), keep AS (
  SELECT DISTINCT l_suppkey FROM (
    SELECT l_suppkey, total_qty, COUNT(DISTINCT l_returnflag) AS n_flags
    FROM base GROUP BY l_suppkey, total_qty
    HAVING COUNT(DISTINCT l_returnflag) < 3
  )
)
SELECT b.l_suppkey, b.l_returnflag,
       CAST(b.total_qty AS DOUBLE) AS total_qty,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY b.l_suppkey
         ORDER BY b.total_qty DESC,
                  CASE WHEN b.l_returnflag = 'N' THEN 0 ELSE 1 END DESC,
                  b.l_returnflag ASC) AS INTEGER) AS ranking
FROM base b WHERE b.l_suppkey IN (SELECT l_suppkey FROM keep)
""",
        "trends_pipeline_synthetic": """
WITH terms(search_term, ti) AS (
  VALUES ('vpn', 0), ('hack', 1), ('cyber', 2), ('security', 3), ('wifi', 4)
),
long AS (
  SELECT n_name AS country, '2021-01-04' AS week_start, '2021-01-10' AS week_end,
         search_term,
         CASE WHEN n_nationkey % 5 = 0 THEN 42
              ELSE (n_nationkey * (ti + 3) * 7 + length(search_term)) % 101
         END AS interest
  FROM nation CROSS JOIN terms
),
keep AS (
  SELECT DISTINCT country FROM (
    SELECT country, interest, COUNT(DISTINCT search_term) AS c
    FROM long GROUP BY country, interest HAVING COUNT(DISTINCT search_term) < 5
  )
)
SELECT country, week_start, week_end, search_term,
       CAST(interest AS BIGINT) AS interest,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY country, week_start
         ORDER BY interest DESC,
                  CASE WHEN search_term = 'vpn' THEN 0 ELSE 1 END DESC,
                  search_term ASC) AS INTEGER) AS ranking
FROM long WHERE country IN (SELECT country FROM keep)
""",
        "rollup_order_counts": """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
        "cube_lineitem_flags": """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
        "nations_set_ops": """
(SELECT DISTINCT c_nationkey AS nationkey FROM customer
 INTERSECT
 SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
EXCEPT ALL
(SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal < 0)
""",
        "customers_without_orders": """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
""",
        "nation_order_outer": """
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       c.n_customers, s.n_suppliers
FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
      FROM customer GROUP BY 1) c
FULL OUTER JOIN
     (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
      FROM supplier GROUP BY 1) s
USING (nationkey)
""",
        "order_gaps_lead_lag": """
SELECT o_custkey, o_orderkey,
       lag(o_orderkey) OVER w AS prev_orderkey,
       lead(o_orderkey) OVER w AS next_orderkey,
       CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS INTEGER)
         AS days_since_prev,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_3_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
""",
        "extract_event_props": """
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
""",
        "part_string_features": """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substring(p_name, 1, 5) AS name_prefix,
       string_split(p_name, ' ')[1] AS first_word,
       CAST(length(p_name) AS BIGINT) AS name_len,
       reverse(p_brand) AS brand_rev,
       lpad(p_type, 12, '_') AS type_padded,
       (p_name LIKE '%a%') AS has_a
FROM part
""",
        "orders_range_join": """
SELECT a.o_custkey AS custkey,
       a.o_orderkey AS first_orderkey,
       b.o_orderkey AS second_orderkey
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND b.o_orderdate > a.o_orderdate
 AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY
""",
        "global_top_lineitems": """
SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC, l_returnflag ASC
LIMIT 100
""",
        "supplier_stats": """
SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers,
       MIN(s_acctbal) AS min_bal, MAX(s_acctbal) AS max_bal,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
FROM supplier GROUP BY s_nationkey
""",
        "quantity_percentiles": """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.5)  AS median,
       quantile_cont(l_quantity, 0.75) AS q75,
       quantile_cont(l_quantity, 0.95) AS q95
FROM lineitem GROUP BY l_returnflag
""",
        "profile_lineitem": """
WITH one AS (
  SELECT
    CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS q_nulls,
    COUNT(DISTINCT l_quantity) AS q_distinct,
    MIN(CAST(l_quantity AS DOUBLE)) AS q_min, MAX(CAST(l_quantity AS DOUBLE)) AS q_max,
    CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_nulls,
    COUNT(DISTINCT l_extendedprice) AS p_distinct,
    MIN(CAST(l_extendedprice AS DOUBLE)) AS p_min, MAX(CAST(l_extendedprice AS DOUBLE)) AS p_max,
    CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d_nulls,
    COUNT(DISTINCT l_discount) AS d_distinct,
    MIN(CAST(l_discount AS DOUBLE)) AS d_min, MAX(CAST(l_discount AS DOUBLE)) AS d_max,
    CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_nulls,
    COUNT(DISTINCT l_orderkey) AS o_distinct,
    MIN(CAST(l_orderkey AS DOUBLE)) AS o_min, MAX(CAST(l_orderkey AS DOUBLE)) AS o_max
  FROM lineitem
)
SELECT 'l_quantity' AS column, q_nulls AS n_nulls, q_distinct AS n_distinct,
       q_min AS min_val, q_max AS max_val FROM one
UNION ALL
SELECT 'l_extendedprice', p_nulls, p_distinct, p_min, p_max FROM one
UNION ALL
SELECT 'l_discount', d_nulls, d_distinct, d_min, d_max FROM one
UNION ALL
SELECT 'l_orderkey', o_nulls, o_distinct, o_min, o_max FROM one
""",
        "daily_spine_ffill": """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,2))) AS day_value
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM (SELECT user_id, CAST(MIN(day) AS TIMESTAMP) AS d0,
               CAST(MAX(day) AS TIMESTAMP) AS d1
        FROM daily GROUP BY user_id)
)
SELECT s.user_id, s.day,
       (d.day_value IS NOT NULL) AS had_events,
       CAST(last_value(d.day_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS filled_value
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
""",
        "latest_event_per_user": """
SELECT user_id, ts AS last_ts, event_id AS last_event_id,
       event_type AS last_event_type, value AS last_value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
        "daily_spine_interpolate": """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS vc
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM (SELECT user_id, CAST(MIN(day) AS TIMESTAMP) AS d0,
               CAST(MAX(day) AS TIMESTAMP) AS d1
        FROM daily GROUP BY user_id)
),
anch AS (
  SELECT s.user_id, s.day, d.vc,
         last_value(d.vc IGNORE NULLS) OVER wp AS vp,
         last_value(CASE WHEN d.vc IS NOT NULL THEN s.day END IGNORE NULLS)
           OVER wp AS dp,
         first_value(d.vc IGNORE NULLS) OVER wn AS vn,
         first_value(CASE WHEN d.vc IS NOT NULL THEN s.day END IGNORE NULLS)
           OVER wn AS dn
  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
  WINDOW wp AS (PARTITION BY s.user_id ORDER BY s.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY s.user_id ORDER BY s.day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, day, (vc IS NOT NULL) AS had_events,
       (CASE WHEN date_diff('day', dp, dn) = 0 THEN CAST(vp AS DOUBLE)
             ELSE CAST(vp AS DOUBLE)
                  + CAST((vn - vp) * date_diff('day', dp, day) AS DOUBLE)
                    / CAST(date_diff('day', dp, dn) AS DOUBLE)
        END) / 100.0 AS interp_value
FROM anch
""",
        "label_centroids": """
SELECT label, CAST(i AS INTEGER) AS dim,
       CAST(SUM(CAST(floor(CAST(embedding[i + 1] AS DOUBLE)
                          * 1000000000.0) AS BIGINT))
            AS DOUBLE) / COUNT(*) / 1000000000.0 AS centroid,
       COUNT(*) AS n_vectors
FROM embeddings, (SELECT unnest(range(64)) AS i) t
GROUP BY label, i
""",
        "sql_interface_shipping_priority": """
SELECT l_orderkey,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6)))
            AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
""",
        "unpivot_part_metrics": """
SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
""",
        "filter_isin_projection": """
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
FROM lineitem WHERE l_returnflag IN ('A', 'R')
""",
        "const_cols_rename_project": """
SELECT n_name AS country, '2021-01-04' AS week_start,
       '2021-01-10' AS week_end, n_nationkey
FROM nation
""",
        "group_count_distinct_having": """
SELECT o_custkey, COUNT(DISTINCT o_orderstatus) AS n_status
FROM orders GROUP BY o_custkey HAVING COUNT(DISTINCT o_orderstatus) < 3
""",
        "semi_join_filter": """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000)
""",
        "rank_window_tiebreak": """
SELECT l_orderkey, l_linenumber, l_returnflag,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY l_orderkey
         ORDER BY l_quantity DESC,
                  CASE WHEN l_returnflag = 'N' THEN 0 ELSE 1 END DESC,
                  l_linenumber ASC, l_returnflag ASC) AS INTEGER) AS ranking
FROM lineitem
""",
        "previous_week_dates": """
SELECT o_orderkey,
       strftime(date_trunc('week', o_orderdate) - INTERVAL 7 DAY, '%Y-%m-%d') AS week_start,
       strftime(date_trunc('week', o_orderdate) - INTERVAL 1 DAY, '%Y-%m-%d') AS week_end
FROM orders
""",
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6)))
            AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "revenue_by_nation": """
SELECT r_name, n_name,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
        "top_orders_per_customer": """
SELECT o_custkey, o_orderkey,
       o_totalprice,
       CAST(rk AS INTEGER) AS rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
) WHERE rk <= 3
""",
        "asof_join_events_orders": """
WITH od AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, od.o_orderkey
FROM events e
ASOF LEFT JOIN od ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
""",
        "weekly_event_rollup": """
SELECT date_trunc('week', ts) AS week_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
""",
        "sessionize_events": """
WITH o AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), s AS (
  SELECT *, CAST(SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM o
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM s GROUP BY user_id, session_seq
""",
        # session_window MERGES touching windows (an exact 30min gap
        # stays one session — property-tested), so the island rule is the
        # same strict > as sessionize_events
        "session_window_rollup": """
WITH o AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), s AS (
  SELECT *, CAST(SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM o
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM s GROUP BY user_id, session_seq
""",
        "exact_dedup": """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
FROM documents GROUP BY text
""",
        "canonical_docs": """
SELECT doc_id, fp FROM (
  SELECT doc_id, md5(text) AS fp,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
  FROM documents
) WHERE rn = 1
""",
        "duplicate_spans": """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
spans AS (SELECT doc_id, array_to_string(t[i:i+7], ' ') AS span
          FROM toks, unnest(range(1, len(t) - 6)) AS u(i))
SELECT span, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occ
FROM spans GROUP BY span
HAVING COUNT(DISTINCT doc_id) >= 2
""",
        "span_dup_coverage": """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
spans AS (SELECT doc_id, array_to_string(t[i:i+7], ' ') AS span
          FROM toks, unnest(range(1, len(t) - 6)) AS u(i)),
dup AS (SELECT span FROM spans GROUP BY span
        HAVING COUNT(DISTINCT doc_id) >= 2),
per_doc_dup AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans
                FROM spans WHERE span IN (SELECT span FROM dup)
                GROUP BY doc_id),
totals AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
           FROM spans GROUP BY doc_id)
SELECT t.doc_id, n_spans,
       COALESCE(n_dup_spans, CAST(0 AS BIGINT)) AS n_dup_spans,
       CAST(COALESCE(n_dup_spans, 0) AS DOUBLE) / CAST(n_spans AS DOUBLE)
         AS dup_frac
FROM totals t LEFT JOIN per_doc_dup d ON t.doc_id = d.doc_id
""",
        "ngram_jaccard_pairs": f"""
WITH {shingles_cte},
e AS (SELECT doc_id, unnest(shingles) AS sh FROM d),
s AS (SELECT doc_id, len(shingles) AS n_sh FROM d),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, shared AS shared_shingles,
       CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) AS jaccard
FROM p
JOIN s sa ON sa.doc_id = doc_a
JOIN s sb ON sb.doc_id = doc_b
WHERE CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) >= 0.5
""",
        "ngram_containment_pairs": f"""
WITH {shingles_cte},
e AS (SELECT doc_id, unnest(shingles) AS sh FROM d),
s AS (SELECT doc_id, len(shingles) AS n_sh FROM d),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, shared AS shared_shingles,
       CAST(shared AS DOUBLE) / sa.n_sh AS containment_a,
       CAST(shared AS DOUBLE) / sb.n_sh AS containment_b
FROM p
JOIN s sa ON sa.doc_id = doc_a
JOIN s sb ON sb.doc_id = doc_b
WHERE greatest(CAST(shared AS DOUBLE) / sa.n_sh,
               CAST(shared AS DOUBLE) / sb.n_sh) >= 0.6
""",
        # prefix filtering is COMPLETE for Jaccard >= t (see the operator
        # docstring), so its oracle IS the quadratic definition — the same
        # SQL as the inverted-index path
        "prefix_filter_jaccard_pairs": f"""
WITH {shingles_cte},
e AS (SELECT doc_id, unnest(shingles) AS sh FROM d),
s AS (SELECT doc_id, len(shingles) AS n_sh FROM d),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, shared AS shared_shingles,
       CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) AS jaccard
FROM p
JOIN s sa ON sa.doc_id = doc_a
JOIN s sb ON sb.doc_id = doc_b
WHERE CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) >= 0.5
""",
        "near_dup_clusters": f"""
WITH RECURSIVE {shingles_cte},
e AS (SELECT doc_id, unnest(shingles) AS sh FROM d),
s AS (SELECT doc_id, len(shingles) AS n_sh FROM d),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT doc_a, doc_b FROM p
  JOIN s sa ON sa.doc_id = doc_a
  JOIN s sb ON sb.doc_id = doc_b
  WHERE CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) >= 0.5
),
und AS (SELECT doc_a AS u, doc_b AS v FROM edges
        UNION ALL SELECT doc_b, doc_a FROM edges),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT und.v, reach.r FROM reach JOIN und ON und.u = reach.id
)
SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
""",
        "chunk_documents": """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start FROM d)
SELECT doc_id,
       CAST(start / 48 AS INTEGER) AS chunk_id,
       array_to_string(list_slice(toks, start + 1, start + 64), ' ') AS chunk_text,
       CAST(least(64, len(toks) - start) AS INTEGER) AS n_tokens
FROM s
""",
        "vocab_coverage": """
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
v AS (SELECT tok FROM (
    SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok ASC) AS rk
    FROM t GROUP BY tok) WHERE rk <= 500),
j AS (SELECT t.doc_id, CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END AS iv
      FROM t LEFT JOIN v ON t.tok = v.tok)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) - SUM(iv) AS BIGINT) AS n_oov,
       CAST(COUNT(*) - SUM(iv) AS DOUBLE) / COUNT(*) AS oov_rate
FROM j GROUP BY doc_id
""",
        "heavy_hitters_per_source": """
SELECT source, CAST(rk AS INTEGER) AS rk, tok, cnt FROM (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY COUNT(*) DESC, tok ASC) AS rk
  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY source, tok
) WHERE rk <= 5
""",
        "source_report": """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
       CAST(COUNT(DISTINCT text) AS DOUBLE) / COUNT(*) AS unique_text_ratio
FROM documents GROUP BY source
""",
        "retention_cohorts": """
WITH wk AS (SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
f AS (SELECT user_id, MIN(wk) AS cohort_week FROM wk GROUP BY user_id)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, wk.wk) // 7 AS INTEGER) AS week_offset,
       CAST(COUNT(DISTINCT wk.user_id) AS BIGINT) AS n_users
FROM wk JOIN f ON wk.user_id = f.user_id
GROUP BY cohort_week, week_offset
""",
        "wow_event_growth": """
WITH weekly AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM events GROUP BY 1, 2
)
SELECT week_start, event_type, n_events, total_value,
       lag(total_value) OVER w AS prev_value,
       CASE WHEN lag(total_value) OVER w IS NOT NULL
             AND lag(total_value) OVER w <> 0
            THEN (total_value - lag(total_value) OVER w)
                 / lag(total_value) OVER w END AS wow_growth
FROM weekly
WINDOW w AS (PARTITION BY event_type ORDER BY week_start ASC)
""",
        # --- decision-support shape pack (TPC-H analogs) ---
        "min_cost_supplier": """
WITH offers AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, l_extendedprice
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  JOIN part     ON l_partkey = p_partkey
  WHERE r_name = 'EUROPE' AND p_size < 15
),
mp AS (SELECT p_partkey AS mp_partkey, MIN(l_extendedprice) AS min_price
       FROM offers GROUP BY 1)
SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, s_acctbal, min_price
FROM offers JOIN mp ON p_partkey = mp_partkey AND l_extendedprice = min_price
""",
        "late_order_priority_counts": """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
""",
        "important_parts_value": """
WITH vals AS (
  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,2)) AS price_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
),
per_part AS (SELECT l_partkey, SUM(price_dec) AS value_dec FROM vals GROUP BY 1),
total AS (SELECT SUM(price_dec) * CAST(0.001 AS DECIMAL(4,3)) AS threshold_dec
          FROM vals)
SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM per_part, total
WHERE value_dec > threshold_dec
""",
        "customer_order_distribution": """
WITH per_cust AS (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT OUTER JOIN (SELECT o_custkey, o_orderkey FROM orders
                   WHERE o_orderpriority <> '5-LOW') o
    ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
""",
        "top_revenue_suppliers": """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6)))
           AS total_rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev_dec AS DOUBLE) AS total_revenue
FROM rev
JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev_dec = (SELECT MAX(total_rev_dec) FROM rev)
""",
        "supplier_count_by_part_attrs": """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'ECONOMY%'
  AND p_size IN (1, 2, 3, 4, 5, 6, 7, 8)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
        "discounted_revenue": """
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(28,6)))
            AS DOUBLE) AS lost_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
        "small_quantity_revenue": """
WITH b2_li AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS price_dec
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#2'
),
stats AS (SELECT l_partkey AS s_partkey, CAST(SUM(qty) AS BIGINT) AS sum_qty,
                 CAST(COUNT(*) AS BIGINT) AS n_li
          FROM b2_li GROUP BY 1)
SELECT CAST(SUM(price_dec) AS DOUBLE) / 7.0 AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small
FROM b2_li JOIN stats ON l_partkey = s_partkey
WHERE 5 * qty * n_li < sum_qty
""",
        "disjunctive_part_revenue": """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6)))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey AND (
     (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
      AND l_quantity BETWEEN 1 AND 11)
  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
      AND l_quantity BETWEEN 10 AND 20)
  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
      AND l_quantity BETWEEN 20 AND 30))
""",
        "excess_stock_suppliers": """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 10)
    GROUP BY l_suppkey, l_partkey
    HAVING CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) > 30)
""",
        "waiting_orders_suppliers": """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
),
per_order AS (SELECT l_orderkey AS po_orderkey,
                     CAST(COUNT(*) AS BIGINT) AS n_supp,
                     CAST(SUM(late) AS BIGINT) AS n_late
              FROM per_os GROUP BY 1)
SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_os
JOIN per_order ON l_orderkey = po_orderkey
JOIN supplier  ON l_suppkey = s_suppkey
WHERE late = 1 AND n_supp > 1 AND n_late = 1
GROUP BY s_suppkey, s_name
""",
        "idle_rich_customers": """
WITH coded AS (
  SELECT c_custkey, substr(c_name, -1, 1) AS code, c_acctbal
  FROM customer
  WHERE substr(c_name, -1, 1) IN ('1', '3', '5', '7')
),
avg_row AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_bal
  FROM coded WHERE c_acctbal > 0
)
SELECT code, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM coded, avg_row
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY code
""",
        "quality_score_model": """
WITH f AS (
  SELECT doc_id,
         CAST(n_chars AS DOUBLE) AS x_chars,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS x_toks,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS x_ttr
  FROM documents
)
SELECT doc_id,
       0.001 * x_chars + 0.01 * x_toks + 2.0 * x_ttr AS quality_score,
       (0.001 * x_chars + 0.01 * x_toks + 2.0 * x_ttr) >= 1.5 AS keep
FROM f
""",
        "scd2_as_of": """
WITH hist AS (
  SELECT user_id, event_type, value,
         ts AS valid_from,
         lead(ts) OVER w AS valid_to
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC)
)
SELECT user_id, event_type, value AS value_as_of, valid_from, valid_to
FROM hist
WHERE valid_from <= TIMESTAMP '2024-01-15'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15')
""",
        "funnel_conversion_windowed": """
WITH wv AS (
  SELECT user_id, event_type, ts,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS v_ts
  FROM events
), wc AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > v_ts
                      AND ts <= v_ts + INTERVAL 1 HOUR THEN ts END)
              OVER (PARTITION BY user_id) AS c_ts
  FROM wv
), wp AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > c_ts
                      AND ts <= c_ts + INTERVAL 1 HOUR THEN ts END)
              OVER (PARTITION BY user_id) AS p_ts
  FROM wc
), pu AS (
  SELECT user_id, MAX(v_ts) AS v, MAX(c_ts) AS c, MAX(p_ts) AS p
  FROM wp GROUP BY user_id
)
SELECT CAST(SUM(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
       CAST(SUM(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view_click_purchase
FROM pu
""",
        "incremental_rollup_merge": """
SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
""",
        "user_event_transitions": """
WITH t AS (SELECT user_id, event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts ASC, event_id ASC)
                    AS prev_type
           FROM events)
SELECT prev_type, event_type AS next_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM t WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
""",
        "event_gap_histogram": """
WITH t AS (SELECT user_id, epoch_us(ts) // 1000000 AS cur_s,
                  lag(epoch_us(ts) // 1000000) OVER (
                    PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                    AS prev_s
           FROM events)
SELECT LEAST((cur_s - prev_s) // 3600, CAST(48 AS BIGINT))
         AS gap_bucket_hours,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM t WHERE prev_s IS NOT NULL
GROUP BY gap_bucket_hours
""",
        "bucketed_join_rollup": """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6)))
            AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
        # salting is a pure physical-layout trick: the oracle is the PLAIN
        # (unsalted) join — any salting bug that duplicates or drops a fact
        # row breaks the hash compare
        "salted_skew_join_rollup": """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6)))
            AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
        # the bloom prefilter is exactness-preserving (no false negatives;
        # false positives die in the exact join) — the oracle is the PLAIN
        # filtered join, so any fp that leaked through would hash-mismatch
        "bloom_filtered_join_rollup": """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6)))
            AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1995-04-01'
GROUP BY o_orderpriority
""",
        "asof_join_forward": """
WITH od AS (
  SELECT o_custkey AS k, o_orderdate AS t, MAX(o_orderkey) AS okey
  FROM orders GROUP BY 1, 2
),
u AS (
  SELECT user_id AS k, ts AS t, 1 AS is_event, event_id,
         CAST(NULL AS BIGINT) AS okey, CAST(NULL AS TIMESTAMP) AS ot
  FROM events
  UNION ALL
  SELECT k, t, 0 AS is_event, CAST(NULL AS BIGINT) AS event_id, okey,
         t AS ot
  FROM od
),
wnd AS (
  SELECT *,
         first_value(okey IGNORE NULLS) OVER
           (PARTITION BY k ORDER BY t, is_event
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_orderkey,
         first_value(ot IGNORE NULLS) OVER
           (PARTITION BY k ORDER BY t, is_event
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_orderdate
  FROM u
)
SELECT event_id, k AS user_id, next_orderkey, next_orderdate
FROM wnd WHERE is_event = 1
""",
        # canonical since r6 = the BIGINT-mod-2^62 transport the r5
        # bisection proved driver-green (the DECIMAL(38,0) transport was
        # the driver's divergent compare stage; that form is retired)
        "table_checksum": f"""
WITH h AS (SELECT doc_id % 32 AS bucket,
                  md5(CAST(doc_id AS VARCHAR) || '|' || md5(text)) AS hx
           FROM documents)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM({_hex_u32('hx', 1)}) % 4611686018427387904 AS BIGINT)
         AS checksum
FROM h GROUP BY bucket
""",
        # ... and the no-arithmetic probe isolating the md5 stage itself
        "table_checksum_probe": """
WITH h AS (SELECT doc_id % 32 AS bucket,
                  substring(md5(CAST(doc_id AS VARCHAR) || '|' || md5(text)), 1, 8) AS hx
           FROM documents)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(hx) AS min_hx,
       MAX(hx) AS max_hx
FROM h GROUP BY bucket
""",
        "schema_evolution_read": """
SELECT doc_id, CAST(NULL AS VARCHAR) AS lang, md5(text) AS fp FROM documents
UNION ALL
SELECT doc_id + 10000000 AS doc_id, lang, md5(text) AS fp FROM documents
""",
        "rolling_7day_distinct_users": """
WITH pairs AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id
               FROM events),
days AS (SELECT DISTINCT day FROM pairs),
contrib AS (SELECT day + k * INTERVAL 1 DAY AS report_day, user_id
            FROM pairs, (SELECT unnest(range(7)) AS k) offs)
SELECT report_day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users_7d
FROM contrib WHERE report_day IN (SELECT day FROM days)
GROUP BY report_day
""",
        "merge_changeset": """
WITH changes AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END AS text,
         (doc_id % 11 = 0) AS is_delete
  FROM documents WHERE doc_id % 7 = 0 OR doc_id % 11 = 0
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, 'added ' || text AS text,
         FALSE AS is_delete
  FROM documents WHERE doc_id % 13 = 0
),
merged AS (
  SELECT COALESCE(c.doc_id, b.doc_id) AS doc_id,
         COALESCE(c.text, b.text) AS text,
         CASE WHEN c.doc_id IS NULL THEN 'kept'
              WHEN b.doc_id IS NULL THEN 'inserted'
              ELSE 'updated' END AS action,
         COALESCE(c.is_delete, FALSE) AS del
  FROM documents b FULL OUTER JOIN changes c ON b.doc_id = c.doc_id
)
SELECT doc_id, md5(text) AS fp, action FROM merged WHERE NOT del
""",
        "referential_integrity_check": """
SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS relation,
       CAST(COUNT(*) AS BIGINT) AS child_rows,
       CAST(COUNT(DISTINCT fk) AS BIGINT) AS distinct_keys,
       CAST(SUM(CASE WHEN pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS orphan_rows
FROM (SELECT l_orderkey AS fk FROM lineitem) c
LEFT JOIN (SELECT DISTINCT o_orderkey AS pk FROM orders) p ON fk = pk
UNION ALL
SELECT 'lineitem.l_partkey->part.p_partkey',
       CAST(COUNT(*) AS BIGINT), CAST(COUNT(DISTINCT fk) AS BIGINT),
       CAST(SUM(CASE WHEN pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM (SELECT l_partkey AS fk FROM lineitem) c
LEFT JOIN (SELECT DISTINCT p_partkey AS pk FROM part) p ON fk = pk
UNION ALL
SELECT 'lineitem.l_suppkey->supplier.s_suppkey',
       CAST(COUNT(*) AS BIGINT), CAST(COUNT(DISTINCT fk) AS BIGINT),
       CAST(SUM(CASE WHEN pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM (SELECT l_suppkey AS fk FROM lineitem) c
LEFT JOIN (SELECT DISTINCT s_suppkey AS pk FROM supplier) p ON fk = pk
UNION ALL
SELECT 'orders.o_custkey->customer.c_custkey',
       CAST(COUNT(*) AS BIGINT), CAST(COUNT(DISTINCT fk) AS BIGINT),
       CAST(SUM(CASE WHEN pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM (SELECT o_custkey AS fk FROM orders) c
LEFT JOIN (SELECT DISTINCT c_custkey AS pk FROM customer) p ON fk = pk
UNION ALL
SELECT 'customer.c_nationkey->nation.n_nationkey',
       CAST(COUNT(*) AS BIGINT), CAST(COUNT(DISTINCT fk) AS BIGINT),
       CAST(SUM(CASE WHEN pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM (SELECT c_nationkey AS fk FROM customer) c
LEFT JOIN (SELECT DISTINCT n_nationkey AS pk FROM nation) p ON fk = pk
UNION ALL
SELECT 'supplier.s_nationkey->nation.n_nationkey',
       CAST(COUNT(*) AS BIGINT), CAST(COUNT(DISTINCT fk) AS BIGINT),
       CAST(SUM(CASE WHEN pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM (SELECT s_nationkey AS fk FROM supplier) c
LEFT JOIN (SELECT DISTINCT n_nationkey AS pk FROM nation) p ON fk = pk
UNION ALL
SELECT 'nation.n_regionkey->region.r_regionkey',
       CAST(COUNT(*) AS BIGINT), CAST(COUNT(DISTINCT fk) AS BIGINT),
       CAST(SUM(CASE WHEN pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM (SELECT n_regionkey AS fk FROM nation) c
LEFT JOIN (SELECT DISTINCT r_regionkey AS pk FROM region) p ON fk = pk
""",
        "grouping_sets_report": """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
        "volume_shipping": """
WITH supp_n AS (
  SELECT s_suppkey, n_name AS supp_nation
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_1', 'NATION_2')
),
cust_n AS (
  SELECT c_custkey, n_name AS cust_nation
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE n_name IN ('NATION_1', 'NATION_2')
)
SELECT supp_nation, cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN supp_n ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN cust_n ON o_custkey = c_custkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND supp_nation <> cust_nation
GROUP BY supp_nation, cust_nation, l_year
""",
        "nation_market_share": """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_1'
                     THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                               (1 - CAST(l_discount AS DECIMAL(18,2)))
                               AS DECIMAL(28,6)) END) AS DOUBLE)
       / CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       (1 - CAST(l_discount AS DECIMAL(18,2)))
                       AS DECIMAL(28,6))) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
  AND p_type LIKE 'PROMO%'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY o_year
""",
        "product_type_profit": """
SELECT n_name AS supp_nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
              (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))
         - CAST(l_quantity AS DECIMAL(18,0))
           * CAST(p_retailprice AS DECIMAL(18,2))
           * CAST(0.5 AS DECIMAL(2,1))
         AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_type LIKE 'STANDARD%'
GROUP BY supp_nation, o_year
""",
        "returned_item_customers": """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6)))
           AS rev_dec
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-10-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01'
  GROUP BY o_custkey
),
cut AS (SELECT MIN(v) AS cut_dec FROM (
          SELECT DISTINCT rev_dec AS v FROM per_cust
          ORDER BY v DESC LIMIT 20))
SELECT c_custkey, c_name, n_name AS nation, c_acctbal,
       CAST(rev_dec AS DOUBLE) AS revenue
FROM per_cust, cut
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE rev_dec >= cut_dec
""",
        "shipmode_priority_counts": """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
""",
        "snapshot_diff": """
WITH v1 AS (SELECT doc_id, md5(text) AS fp1 FROM documents),
v2 AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END)
           AS fp2
  FROM documents WHERE doc_id % 11 <> 0
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, md5('added ' || text) AS fp2
  FROM documents WHERE doc_id % 13 = 0
)
SELECT doc_id,
       CASE WHEN fp1 IS NULL THEN 'added'
            WHEN fp2 IS NULL THEN 'removed'
            WHEN fp1 <> fp2 THEN 'changed'
            ELSE 'unchanged' END AS status
FROM v1 FULL OUTER JOIN v2 USING (doc_id)
WHERE (CASE WHEN fp1 IS NULL THEN 'added'
            WHEN fp2 IS NULL THEN 'removed'
            WHEN fp1 <> fp2 THEN 'changed'
            ELSE 'unchanged' END) <> 'unchanged'
""",
        "variant_props_rollup": """
WITH k AS (SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k
           FROM events)
SELECT k % 10 AS k_bucket, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(k) AS BIGINT) AS sum_k, CAST(MAX(k) AS BIGINT) AS max_k
FROM k GROUP BY 1
""",
        "price_equidepth_histogram": """
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM orders),
b AS (
  SELECT o_totalprice,
         ((row_number() OVER (ORDER BY o_totalprice ASC, o_orderkey ASC)
           - 1) * 8) // n_total AS bucket
  FROM orders, n
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS bucket_value
FROM b GROUP BY bucket
""",
        "recursive_week_spine": """
WITH RECURSIVE bounds AS (
  SELECT MIN(epoch_us(ts_o) // 604800000000) AS w_lo,
         MAX(epoch_us(ts_o) // 604800000000) AS w_hi
  FROM (SELECT CAST(o_orderdate AS TIMESTAMP) AS ts_o FROM orders)
),
wk(w) AS (
  SELECT w_lo FROM bounds
  UNION ALL
  SELECT w + 1 FROM wk, bounds WHERE w + 1 <= w_hi
),
per_wk AS (
  SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 604800000000 AS w_o,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
)
SELECT make_timestamp(w * 604800000000) AS week_start,
       COALESCE(n, CAST(0 AS BIGINT)) AS n_orders
FROM wk LEFT JOIN per_wk ON w = w_o
""",
        "importance_sample": """
SELECT doc_id, source, n_chars,
       CASE WHEN n_chars < 200 THEN 'short' ELSE 'long' END AS stratum,
       substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS sample_key8
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      < CASE WHEN n_chars < 200 THEN '40000000' ELSE '10000000' END
""",
        "token_budget_mix": """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
  FROM documents
),
c AS (
  SELECT doc_id, source, n_toks,
         CAST(SUM(n_toks) OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_toks
  FROM t
)
SELECT doc_id, source, n_toks, cum_toks FROM c WHERE cum_toks <= 500
""",
        "ngram_jaccard_pairs_capped": f"""
WITH {shingles_cte},
e AS (SELECT doc_id, unnest(shingles) AS sh FROM d),
s AS (SELECT doc_id, len(shingles) AS n_sh FROM d),
keep AS (SELECT sh FROM (SELECT sh, COUNT(*) AS df FROM e GROUP BY sh)
         WHERE df <= 4),
ek AS (SELECT e.doc_id, e.sh FROM e JOIN keep USING (sh)),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM ek a JOIN ek b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, shared AS shared_shingles,
       CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) AS jaccard
FROM p
JOIN s sa ON sa.doc_id = doc_a
JOIN s sb ON sb.doc_id = doc_b
WHERE CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) >= 0.5
""",
        "near_dup_clusters_lsh": f"""
WITH RECURSIVE {_minhash_ctes()},
und AS (SELECT doc_a AS u, doc_b AS v FROM lsh_pairs
        UNION ALL SELECT doc_b, doc_a FROM lsh_pairs),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT und.v, reach.r FROM reach JOIN und ON und.u = reach.id
)
SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
""",
        "corpus_clean_pipeline": f"""
WITH RECURSIVE {_minhash_ctes()},
und AS (SELECT doc_a AS u, doc_b AS v FROM lsh_pairs
        UNION ALL SELECT doc_b, doc_a FROM lsh_pairs),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT und.v, reach.r FROM reach JOIN und ON und.u = reach.id
),
cl AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
q AS (
  SELECT doc_id,
         ((len(string_split(text, ' ')) >= 20 AND length(text) <= 10000)
          AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / len(string_split(text, ' ')) >= 0.45
          AND CAST(len(list_filter(string_split(text, ' '),
                   t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
              / len(string_split(text, ' ')) <= 0.5) AS keep,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
),
lab AS (
  SELECT cl.doc_id, cl.cluster_id, q.n_tokens, q.n_chars
  FROM cl JOIN q ON cl.doc_id = q.doc_id WHERE q.keep
)
SELECT doc_id, cluster_id, n_tokens, n_chars FROM (
  SELECT *, MIN(doc_id) OVER (PARTITION BY cluster_id) AS m FROM lab
) WHERE doc_id = m
""",
        "order_percentiles": """
SELECT o_custkey, o_orderkey,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cume,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC)
""",
        "text_normalize": """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                           ' +', ' ', 'g')) AS norm_text,
       CAST(length(text) AS BIGINT) AS n_chars_raw,
       CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                       ' +', ' ', 'g'))) AS BIGINT) AS n_chars_norm
FROM documents
""",
        "quality_filter": """
WITH q AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS distinct_ratio,
         CAST(len(list_filter(string_split(text, ' '),
                  t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
           / len(string_split(text, ' ')) AS stopword_ratio
  FROM documents
)
SELECT doc_id,
       (n_tokens >= 20 AND n_chars <= 10000) AS len_ok,
       (distinct_ratio >= 0.45) AS diversity_ok,
       (stopword_ratio <= 0.5) AS stopwords_ok,
       ((n_tokens >= 20 AND n_chars <= 10000)
        AND distinct_ratio >= 0.45 AND stopword_ratio <= 0.5) AS keep
FROM q
""",
        # identical rows to quality_filter — observe() only attaches
        # same-pass metrics, it must not change the data
        "observed_quality_filter": """
WITH q AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS distinct_ratio,
         CAST(len(list_filter(string_split(text, ' '),
                  t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
           / len(string_split(text, ' ')) AS stopword_ratio
  FROM documents
)
SELECT doc_id,
       (n_tokens >= 20 AND n_chars <= 10000) AS len_ok,
       (distinct_ratio >= 0.45) AS diversity_ok,
       (stopword_ratio <= 0.5) AS stopwords_ok,
       ((n_tokens >= 20 AND n_chars <= 10000)
        AND distinct_ratio >= 0.45 AND stopword_ratio <= 0.5) AS keep
FROM q
""",
        "token_estimate": """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT)
         AS bpe_ish_tokens,
       CAST(length(text) AS DOUBLE)
         / len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
         AS chars_per_token
FROM documents
""",
        "chargram_minhash": """
SELECT doc_id,
       array_to_string(
         list_sort(list_distinct(
           list_transform(range(greatest(length(text) - 7, 1)),
                          i -> md5(substring(text, i + 1, 8)))))[1:4],
         '|') AS sketch
FROM documents
""",
        "similarity_topk": f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, embedding AS c FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         CAST({dot64.format(a='q', b='c')} AS DOUBLE) AS dot,
         CAST({dot64.format(a='q', b='q')} AS DOUBLE) AS qn,
         CAST({dot64.format(a='c', b='c')} AS DOUBLE) AS cn
  FROM c, q WHERE query_id <> neighbor_id
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY dot * abs(dot) / (qn * cn) DESC,
                                     neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
""",
        "embedding_near_dup": f"""
WITH a AS (SELECT vec_id AS id_a, embedding AS va, label FROM embeddings),
b AS (SELECT vec_id AS id_b, embedding AS vb, label FROM embeddings),
j AS (
  SELECT a.label, id_a, id_b,
         CAST({dot64.format(a='va', b='vb')} AS DOUBLE) AS dot,
         CAST({dot64.format(a='va', b='va')} AS DOUBLE) AS na,
         CAST({dot64.format(a='vb', b='vb')} AS DOUBLE) AS nb
  FROM a JOIN b ON a.label = b.label AND id_a < id_b
)
SELECT label, id_a, id_b FROM j
WHERE dot * abs(dot) / (na * nb) >= 0.35 * 0.35
""",
        "semantic_dedup": f"""
WITH a AS (SELECT vec_id AS id_a, embedding AS va, label FROM embeddings),
b AS (SELECT vec_id AS id_b, embedding AS vb, label FROM embeddings),
j AS (
  SELECT a.label, id_a, id_b,
         CAST({dot64.format(a='va', b='vb')} AS DOUBLE) AS dot,
         CAST({dot64.format(a='va', b='va')} AS DOUBLE) AS na,
         CAST({dot64.format(a='vb', b='vb')} AS DOUBLE) AS nb
  FROM a JOIN b ON a.label = b.label AND id_a < id_b
),
dom AS (
  SELECT DISTINCT id_b FROM j
  WHERE dot * abs(dot) / (na * nb) >= 0.35 * 0.35
)
SELECT vec_id, label FROM embeddings
WHERE vec_id NOT IN (SELECT id_b FROM dom)
""",
        "semantic_dedup_scaled": f"""
WITH w(t, p, d, wt) AS (VALUES {_srp_plane_values(n_tables=2, n_planes=2)}),
ex AS (
  SELECT vec_id, i AS d, CAST(embedding[i + 1] AS DOUBLE) AS x
  FROM embeddings, (SELECT unnest(range(64)) AS i) dims
),
proj AS (
  SELECT vec_id, w.t, w.p,
         SUM(CAST(floor(x * wt * 1000000000.0) AS BIGINT)) AS s
  FROM ex JOIN w ON ex.d = w.d
  GROUP BY vec_id, w.t, w.p
),
buckets AS (
  SELECT vec_id, t,
         CAST(SUM(CASE WHEN s >= 0 THEN 1 << p ELSE 0 END) AS BIGINT)
           AS bucket
  FROM proj GROUP BY vec_id, t
),
b2 AS (SELECT b.vec_id, b.t, b.bucket, e.label, e.embedding
       FROM buckets b JOIN embeddings e ON b.vec_id = e.vec_id),
j AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CAST({dot64.format(a='a.embedding', b='b.embedding')} AS DOUBLE) AS dot,
         CAST({dot64.format(a='a.embedding', b='a.embedding')} AS DOUBLE) AS na,
         CAST({dot64.format(a='b.embedding', b='b.embedding')} AS DOUBLE) AS nb
  FROM b2 a JOIN b2 b
    ON a.t = b.t AND a.bucket = b.bucket AND a.label = b.label
       AND a.vec_id < b.vec_id
),
dom AS (
  SELECT DISTINCT id_b FROM j
  WHERE dot * abs(dot) / (na * nb) >= 0.35 * 0.35
)
SELECT vec_id, label FROM embeddings
WHERE vec_id NOT IN (SELECT id_b FROM dom)
""",
        "text_quality": """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / len(string_split(text, ' ')) AS distinct_ratio,
       CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS DOUBLE)
         / len(string_split(text, ' ')) AS avg_token_len,
       CAST(len(list_filter(string_split(text, ' '),
                t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
         / len(string_split(text, ' ')) AS stopword_ratio
FROM documents
""",
        "token_counts": """
SELECT token, COUNT(*) AS n FROM (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
) WHERE token <> '' GROUP BY token
""",
        "salted_token_counts": """
SELECT token, COUNT(*) AS n FROM (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
) WHERE token <> '' GROUP BY token
""",
        "lang_id": """
WITH sc AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text,' '), t -> t = 'the')) AS s_en,
         len(list_filter(string_split(text,' '), t -> t = 'el'))  AS s_es,
         len(list_filter(string_split(text,' '), t -> t = 'der')) AS s_de,
         len(list_filter(string_split(text,' '), t -> t = 'le'))  AS s_fr
  FROM documents
)
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN s_en > 0 THEN 'en'
            WHEN s_es > 0 AND s_es > s_en THEN 'es'
            WHEN s_de > 0 AND s_de > s_en AND s_de > s_es THEN 'de'
            WHEN s_fr > 0 AND s_fr > s_en AND s_fr > s_es AND s_fr > s_de THEN 'fr'
            ELSE 'und' END AS predicted_lang
FROM sc
""",
        "doc_fingerprints": """
SELECT doc_id,
       md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint,
       substring(md5(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 16) AS fingerprint64
FROM documents
""",
        "multimodal_frame_sample": """
SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
       sha256(text || '#' || CAST(i AS VARCHAR)) AS frame_sha
FROM documents, (SELECT unnest(range(4)) AS i) t
""",
        "orders_above_global_avg": """
WITH a AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
           AS avg_price
  FROM orders
)
SELECT o_orderkey, o_custkey, o_totalprice, avg_price
FROM orders, a WHERE o_totalprice > avg_price
""",
        "order_date_features": """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       CAST(month(o_orderdate) AS BIGINT) AS mon,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
       CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end
FROM orders
""",
        "price_histogram": """
WITH b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders)
SELECT CAST(least(floor((o_totalprice - lo) * 20 / (hi - lo)), 19) AS BIGINT)
         AS bin,
       lo, hi, COUNT(*) AS n_orders
FROM orders, b
GROUP BY 1, lo, hi
""",
        "price_quantity_corr": """
WITH a AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
                       CAST(l_extendedprice AS DECIMAL(18,2))
                       AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
                       CAST(l_quantity AS DECIMAL(18,2))
                       AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       CAST(l_extendedprice AS DECIMAL(18,2))
                       AS DECIMAL(28,6))) AS DOUBLE) AS syy
  FROM lineitem
)
SELECT n,
       (CAST(n AS DOUBLE) * sxy - sx * sy)
         / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
            * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS corr_qty_price
FROM a
""",
        "multimodal_meta": """
SELECT doc_id, 'text/plain' AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
""",
        "multimodal_features": """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256
FROM documents
""",
        # real-PNG round-trip: Spark encodes a 16x16 grayscale PNG whose
        # raster is the ASCII md5 hex repeated 8x, then DECODES the
        # container (inflate + CRC + all five filters) and reports facts
        # of the decoded raster; the oracle reconstructs the raster
        # directly — any wrong decoded byte breaks the sha
        "multimodal_png_decode": """
SELECT doc_id,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST(256 AS BIGINT) AS n_px_bytes,
       sha256(repeat(md5(text), 8)) AS pixel_sha
FROM documents
""",
        # real-resize twin (round 7): rebuild the 10x7 nearest-neighbor
        # resample of the 16x16 PNG raster symbolically — output pixel
        # (r, c) = source char (r*16 DIV 7)*16 + (c*16 DIV 10); the
        # raster is md5-hex ASCII, so sha256-over-VARCHAR == the
        # engine's sha256 over the raster bytes
        "multimodal_resize": """
WITH rast AS (SELECT doc_id, repeat(md5(text), 8) AS r FROM documents),
px AS (
  SELECT doc_id, ri * 10 + ci AS pos,
         substring(r, ((ri * 16) // 7) * 16 + ((ci * 16) // 10) + 1, 1)
           AS ch
  FROM rast,
       (SELECT unnest(range(7)) AS ri) rows_,
       (SELECT unnest(range(10)) AS ci) cols_
)
SELECT doc_id,
       CAST(10 AS BIGINT) AS width,
       CAST(7 AS BIGINT) AS height,
       CAST(70 AS BIGINT) AS n_px_bytes,
       sha256(string_agg(ch, '' ORDER BY pos)) AS pixel_sha
FROM px GROUP BY doc_id
""",
        "term_doc_stats": """
SELECT token, COUNT(DISTINCT doc_id) AS doc_freq, COUNT(*) AS term_freq
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> '' GROUP BY token
""",
        "minhash_lsh_pairs": "WITH " + _minhash_sql(),
        "minhash_lsh_pairs_banddf_capped": "WITH "
        + _minhash_ctes(max_band_df=2)
        + "\nSELECT doc_a, doc_b, jaccard FROM lsh_pairs",
        # incremental batch-vs-corpus dedup: same CTE chain, pair selection
        # crosses the batch (doc_id % 17 == 0) against the corpus split
        "incremental_minhash_dedup": "WITH "
        + _minhash_ctes()
        + """,
cand2 AS (
  SELECT DISTINCT b.doc_id AS batch_doc, a.doc_id AS corpus_doc
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key
   AND a.doc_id % 17 <> 0 AND b.doc_id % 17 = 0
)
SELECT batch_doc, corpus_doc,
       CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
         / (len(sa.shingles) + len(sb.shingles)
            - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
FROM cand2
JOIN d sa ON sa.doc_id = corpus_doc
JOIN d sb ON sb.doc_id = batch_doc
WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
      / (len(sa.shingles) + len(sb.shingles)
         - len(list_intersect(sa.shingles, sb.shingles))) >= 0.5
""",
        "similarity_topk_lsh": "WITH " + _srp_lsh_sql(),
        "similarity_topk_ivf": f"""
WITH cd AS (
  SELECT label AS cell, i AS dim,
         CAST(SUM(CAST(floor(CAST(embedding[i + 1] AS DOUBLE)
                            * 1000000000.0) AS BIGINT))
              AS DOUBLE) / COUNT(*) / 1000000000.0 AS c
  FROM embeddings, (SELECT unnest(range(64)) AS i) dims
  GROUP BY label, i
),
cents AS (SELECT cell, list(c ORDER BY dim ASC) AS centroid FROM cd GROUP BY cell),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
qcells AS (
  SELECT query_id, qe, cell,
         {_FOLD64.format(a="qe", b="centroid")}
           / (sqrt({_FOLD64.format(a="qe", b="qe")})
              * sqrt({_FOLD64.format(a="centroid", b="centroid")})) AS cell_cos
  FROM q CROSS JOIN cents
),
probed AS (
  SELECT query_id, qe, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cell_cos DESC, cell ASC) AS cr
    FROM qcells
  ) WHERE cr <= 3
),
pairs AS (
  SELECT p.query_id, p.qe, e.vec_id AS neighbor_id, e.embedding AS ce
  FROM embeddings e JOIN probed p ON e.label = p.cell
  WHERE e.vec_id <> p.query_id
),
scored AS (
  SELECT query_id, neighbor_id,
         {_FOLD64.format(a="qe", b="ce")}
           / (sqrt({_FOLD64.format(a="qe", b="qe")})
              * sqrt({_FOLD64.format(a="ce", b="ce")})) AS cos
  FROM pairs
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
""",
        "simhash_signatures": "WITH "
        + _simhash_sig_sql()
        + """
SELECT doc_id, simhash FROM sig
""",
        "simhash_near_dup_pairs": "WITH "
        + _simhash_sig_sql()
        + """,
banded AS (
  SELECT doc_id, simhash, t, (simhash >> (8 * t)) & 255 AS band_val
  FROM sig, (SELECT unnest(range(8)) AS t) bands
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.simhash AS sig_a, b.simhash AS sig_b
  FROM banded a JOIN banded b
    ON a.t = b.t AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 7
""",
        "kmeans_assignments": _kmeans_sql()
        + """
SELECT vec_id, CAST(cluster AS INTEGER) AS cluster FROM s1
""",
        "kmeans_cluster_sizes": _kmeans_sql()
        + """
SELECT CAST(cluster AS INTEGER) AS cluster, COUNT(*) AS n_vectors
FROM s1 GROUP BY cluster
""",
        "kcenter_diversity_sample": _kcenter_sql(),
        "global_row_numbers": """
SELECT doc_id, source,
       CAST(ROW_NUMBER() OVER (ORDER BY doc_id ASC) AS BIGINT) AS row_num
FROM documents
""",
        "zorder_key": f"""
WITH b AS (
  SELECT o_orderkey,
         CAST(o_custkey % 256 AS BIGINT) AS cust_bucket,
         CAST(dayofyear(o_orderdate) % 256 AS BIGINT) AS day_bucket
  FROM orders
)
SELECT o_orderkey, cust_bucket, day_bucket,
       CAST({_zorder_expr('cust_bucket', 0)}
            + {_zorder_expr('day_bucket', 1)} AS BIGINT) AS zkey
FROM b
""",
        "doc_commonness": """
WITH tt AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE token <> ''
),
f AS (SELECT token, COUNT(*) AS freq FROM tt GROUP BY token)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(freq) AS BIGINT) AS total_freq,
       CAST(SUM(freq) AS DOUBLE) / COUNT(*) AS mean_token_freq
FROM tt JOIN f USING (token) GROUP BY doc_id
""",
        "dataset_splits": """
SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
              THEN 'train'
            WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
              THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs
FROM documents GROUP BY 1
""",
        "user_event_sequences": """
SELECT user_id, COUNT(*) AS n_events,
       string_agg(event_type, '>' ORDER BY ts ASC, event_id ASC) AS sequence
FROM events GROUP BY user_id
""",
        "rolling_7day_user_value": """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
         PARTITION BY user_id ORDER BY epoch_s ASC
         RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS trailing_7d_value
FROM (SELECT *, CAST(epoch_us(ts) AS DOUBLE) / 1000000.0 AS epoch_s
      FROM events)
""",
        "nation_revenue_share": """
WITH pn AS (
  SELECT n_name,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6)))
           AS rev_dec
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name
),
t AS (SELECT SUM(rev_dec) AS total_dec FROM pn)
SELECT n_name, CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(rev_dec AS DOUBLE) / CAST(total_dec AS DOUBLE) AS revenue_share
FROM pn, t
""",
        "scd2_user_type_history": """
SELECT user_id, event_type, event_id, value,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       (lead(ts) OVER w IS NULL) AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC)
""",
        "funnel_conversion": """
WITH wv AS (
  SELECT user_id, event_type, ts,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS v_ts
  FROM events
), wc AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > v_ts THEN ts END)
              OVER (PARTITION BY user_id) AS c_ts
  FROM wv
), wp AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > c_ts THEN ts END)
              OVER (PARTITION BY user_id) AS p_ts
  FROM wc
), pu AS (
  SELECT user_id, MAX(v_ts) AS v, MAX(c_ts) AS c, MAX(p_ts) AS p
  FROM wp GROUP BY user_id
)
SELECT CAST(SUM(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
       CAST(SUM(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view_click_purchase
FROM pu
""",
        "embedding_normalize": """
WITH n AS (
  SELECT vec_id, embedding,
         sqrt(list_reduce(list_transform(embedding,
              e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)),
              (a, b) -> a + b)) AS norm
  FROM embeddings
)
SELECT vec_id, CAST(i AS INTEGER) AS dim, norm,
       CAST(embedding[i + 1] AS DOUBLE) / norm AS unit_val
FROM n, (SELECT unnest(range(64)) AS i) t
""",
        "embedding_quantize": """
WITH s AS (
  SELECT vec_id, embedding,
         CAST(list_min(embedding) AS DOUBLE) AS qmin,
         CAST(list_max(embedding) AS DOUBLE) AS qmax
  FROM embeddings
)
SELECT vec_id, CAST(i AS INTEGER) AS dim, qmin, qmax,
       CASE WHEN qmax - qmin > 0
            THEN CAST(floor((CAST(embedding[i + 1] AS DOUBLE) - qmin) * 255.0
                            / (qmax - qmin)) AS BIGINT)
            ELSE 0 END AS code
FROM s, (SELECT unnest(range(64)) AS i) t
""",
        "order_value_extremes": """
SELECT o_custkey, o_orderkey,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER wf AS last_price,
       nth_value(o_totalprice, 2) OVER wf AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
        "fuzzy_name_matches": """
WITH names AS (
  SELECT p_name, COUNT(*) AS n_parts, string_split(p_name, ' ')[1] AS w
  FROM part GROUP BY p_name
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS distance,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM names a JOIN names b ON a.w = b.w AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 4
""",
        # exact BIGINT moment sums (day index x, integer cents y), one
        # double division at the end — mirrors the Spark expression tree
        "grouped_linear_trend": """
WITH b AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
           AS x,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM events
),
m AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(x * x) AS sxx, SUM(y) AS sy, SUM(x * y) AS sxy
  FROM b GROUP BY event_type
)
SELECT event_type, n,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0 AS slope_per_day,
       CAST(sy * sxx - sx * sxy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0 AS intercept
FROM m
""",
        "streaming_static_enrich": """
WITH us AS (
  SELECT o_custkey AS user_id, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS lifetime_value
  FROM orders GROUP BY 1
)
SELECT event_id, e.user_id, event_type,
       COALESCE(us.n_orders, 0) AS n_orders,
       COALESCE(us.lifetime_value, 0.0) AS lifetime_value
FROM events e LEFT JOIN us ON e.user_id = us.user_id
""",
        "streaming_dedup_then_rollup": """
WITH dd AS (
  SELECT DISTINCT user_id, event_type, date_trunc('day', ts) AS day
  FROM events
)
SELECT make_timestamp((epoch_us(day) // 604800000000) * 604800000000)
         AS week_start,
       make_timestamp((epoch_us(day) // 604800000000) * 604800000000
                      + 604800000000) AS week_end,
       event_type, COUNT(*) AS n_user_days
FROM dd GROUP BY 1, 2, 3
""",
        "streaming_weekly_rollup": """
SELECT make_timestamp((epoch_us(ts) // 604800000000) * 604800000000)
         AS week_start,
       make_timestamp((epoch_us(ts) // 604800000000) * 604800000000
                      + 604800000000) AS week_end,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2, 3
""",
        "streaming_sliding_rollup": """
SELECT make_timestamp(((epoch_us(ts) // 86400000000) - k) * 86400000000)
         AS win_start,
       make_timestamp(((epoch_us(ts) // 86400000000) - k + 7) * 86400000000)
         AS win_end,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events, (SELECT unnest(range(7)) AS k) offs
GROUP BY 1, 2, 3
""",
        # identical island SQL as the batch session_window_rollup (same
        # strict-> gap rule; touching windows merge): the availableNow+
        # complete harness makes the streaming emitted set equal the batch
        # aggregation
        "streaming_session_window": """
WITH o AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), s AS (
  SELECT *, CAST(SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM o
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM s GROUP BY user_id, session_seq
""",
        "streaming_sessionize": """
WITH o AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), s AS (
  SELECT *, CAST(SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM o
), agg AS (
  SELECT user_id, session_seq, MIN(ts) AS session_start, MAX(ts) AS session_end,
         CAST(COUNT(*) AS INTEGER) AS n_events,
         -- sequential left-fold double sum in event order, matching the
         -- stateful operator's python accumulation bit-for-bit
         list_reduce(list(value ORDER BY ts ASC, event_id ASC),
                     (a, b) -> a + b) AS total_value
  FROM s GROUP BY user_id, session_seq
), last_seq AS (
  SELECT user_id, MAX(session_seq) AS open_seq FROM agg GROUP BY user_id
)
SELECT a.user_id, a.session_start, a.session_end, a.n_events, a.total_value
FROM agg a JOIN last_seq l
  ON a.user_id = l.user_id AND a.session_seq <> l.open_seq
""",
        "streaming_click_purchase_join": """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       c.ts AS click_ts, p.ts AS purchase_ts, p.value AS purchase_value
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
""",
        "streaming_left_outer_join": """
SELECT c.user_id, c.event_id AS click_id, p.purchase_id,
       c.ts AS click_ts, p.purchase_ts, p.purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
                  value AS purchase_value
           FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.purchase_ts > c.ts AND p.purchase_ts <= c.ts + INTERVAL 1 HOUR
""",
        "streaming_full_outer_join": """
SELECT COALESCE(c.user_id, p.user_id) AS user_id,
       c.event_id AS click_id, p.purchase_id,
       c.ts AS click_ts, p.purchase_ts, p.purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
FULL JOIN (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
                  value AS purchase_value
           FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.purchase_ts > c.ts AND p.purchase_ts <= c.ts + INTERVAL 1 HOUR
""",
        "streaming_first_events": """
SELECT DISTINCT user_id, event_type FROM events
""",
        "streaming_first_events_bounded": """
SELECT DISTINCT user_id, event_type FROM events
""",
        "streaming_running_user_stats": """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY user_id
""",
        "event_value_outliers": """
WITH ev AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
med AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
         quantile_cont(cents, 0.5) AS med_cents
  FROM ev GROUP BY event_type
),
dev AS (
  SELECT ev.event_type, cents, abs(cents - med_cents) AS adev
  FROM ev JOIN med ON ev.event_type = med.event_type
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad_cents
  FROM dev GROUP BY event_type
),
flagged AS (
  SELECT dev.event_type,
         CAST(SUM(CASE WHEN adev > 3.0 * 1.4826 * mad_cents
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
  FROM dev JOIN mad ON dev.event_type = mad.event_type
  GROUP BY dev.event_type
)
SELECT med.event_type, n_events,
       med_cents / 100.0 AS median_value,
       mad_cents / 100.0 AS mad_value,
       n_outliers
FROM med JOIN mad ON med.event_type = mad.event_type
JOIN flagged ON med.event_type = flagged.event_type
""",
        "big_order_customers": """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(qty_dec AS DOUBLE) AS total_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
""",
        "null_safe_event_join": """
WITH e AS (
  SELECT event_id, event_type,
         nullif(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k
  FROM events
)
SELECT a.k, COUNT(*) AS n_pairs
FROM (SELECT event_id, k FROM e WHERE event_type = 'error') a
JOIN (SELECT event_id, k FROM e WHERE event_type = 'signup') b
  ON a.k IS NOT DISTINCT FROM b.k
GROUP BY a.k
""",
        "priority_class_by_status": """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus
""",
        "promo_revenue_share": """
WITH s AS (
  SELECT
    CAST(SUM(CASE WHEN p_type = 'PROMO'
        THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))
        ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) AS promo_revenue,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6)))
         AS DOUBLE) AS total_revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT promo_revenue, total_revenue,
       promo_revenue / total_revenue AS promo_share
FROM s
""",
        "hash_sample": """
SELECT doc_id, source, lang, md5(CAST(doc_id AS VARCHAR)) AS sample_key
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '40000000'
""",
        "stratified_sample": """
SELECT doc_id, source, lang, CAST(rn AS INTEGER) AS rn FROM (
  SELECT doc_id, source, lang,
         ROW_NUMBER() OVER (PARTITION BY source, lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC,
                                     doc_id ASC) AS rn
  FROM documents
) WHERE rn <= 3
""",
        "per_source_quality_cap": """
SELECT doc_id, source, n_chars,
       CAST(quality_rank AS INTEGER) AS quality_rank FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC)
           AS quality_rank
  FROM documents
) WHERE quality_rank <= 15
""",
        "weighted_source_mix": f"""
WITH w(source, w_hex) AS (VALUES {_weights_values()})
SELECT d.source, w.w_hex, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
                          < w.w_hex THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents d LEFT JOIN w ON d.source = w.source
GROUP BY d.source, w.w_hex
""",
        # the two-level decomposition is EXACTLY the one-window prefix
        # sum (integer associativity), so both operators share this SQL
        "pack_token_shards_scalable": """
SELECT doc_id, source, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS tokens_before,
       CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id
FROM (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
           PARTITION BY source ORDER BY doc_id ASC
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents
)
""",
        "pack_token_shards": """
SELECT doc_id, source, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS tokens_before,
       CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id
FROM (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
           PARTITION BY source ORDER BY doc_id ASC
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents
)
""",
        # count-min: ONE md5 per token sliced into four u32 rows (digits
        # 8d+1..8d+8) — engine-neutral, so even the
        # APPROXIMATE sketch structure hash-matches exactly
        "count_min_heavy_hitters": f"""
WITH t2 AS (
  SELECT token FROM (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE token <> ''
),
tc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n_true
       FROM t2 GROUP BY token),
dd AS (SELECT unnest(range(4)) AS d),
cm AS (
  SELECT d, token, md5(token) AS m
  FROM t2 CROSS JOIN dd
),
cells AS (
  SELECT d, ((strpos('0123456789abcdef', substring(m, CAST(d*8+1 AS INTEGER), 1)) - 1) * 268435456 + (strpos('0123456789abcdef', substring(m, CAST(d*8+2 AS INTEGER), 1)) - 1) * 16777216 + (strpos('0123456789abcdef', substring(m, CAST(d*8+3 AS INTEGER), 1)) - 1) * 1048576 + (strpos('0123456789abcdef', substring(m, CAST(d*8+4 AS INTEGER), 1)) - 1) * 65536 + (strpos('0123456789abcdef', substring(m, CAST(d*8+5 AS INTEGER), 1)) - 1) * 4096 + (strpos('0123456789abcdef', substring(m, CAST(d*8+6 AS INTEGER), 1)) - 1) * 256 + (strpos('0123456789abcdef', substring(m, CAST(d*8+7 AS INTEGER), 1)) - 1) * 16 + (strpos('0123456789abcdef', substring(m, CAST(d*8+8 AS INTEGER), 1)) - 1) * 1) % 256 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM cm GROUP BY 1, 2
),
cands AS (SELECT token, n_true FROM tc
          ORDER BY n_true DESC, token ASC LIMIT 20),
pm AS (
  SELECT token, n_true, d, md5(token) AS m
  FROM cands CROSS JOIN dd
),
probes AS (SELECT token, n_true, d, ((strpos('0123456789abcdef', substring(m, CAST(d*8+1 AS INTEGER), 1)) - 1) * 268435456 + (strpos('0123456789abcdef', substring(m, CAST(d*8+2 AS INTEGER), 1)) - 1) * 16777216 + (strpos('0123456789abcdef', substring(m, CAST(d*8+3 AS INTEGER), 1)) - 1) * 1048576 + (strpos('0123456789abcdef', substring(m, CAST(d*8+4 AS INTEGER), 1)) - 1) * 65536 + (strpos('0123456789abcdef', substring(m, CAST(d*8+5 AS INTEGER), 1)) - 1) * 4096 + (strpos('0123456789abcdef', substring(m, CAST(d*8+6 AS INTEGER), 1)) - 1) * 256 + (strpos('0123456789abcdef', substring(m, CAST(d*8+7 AS INTEGER), 1)) - 1) * 16 + (strpos('0123456789abcdef', substring(m, CAST(d*8+8 AS INTEGER), 1)) - 1) * 1) % 256 AS bucket
           FROM pm)
SELECT p.token, p.n_true, CAST(MIN(c.c) AS BIGINT) AS n_est
FROM probes p JOIN cells c ON p.d = c.d AND p.bucket = c.bucket
GROUP BY 1, 2
""",
        # same SQL as repetition_stats: the explode+groupBy long form
        # must be value-identical to the array form
        "repetition_stats_long": """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id, toks, len(toks) AS n,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(len(toks) - 1),
                                  i -> toks[i+1] || ' ' || toks[i+2])
              ELSE [] END AS g2,
         CASE WHEN len(toks) >= 3
              THEN list_transform(range(len(toks) - 2),
                                  i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
              ELSE [] END AS g3
  FROM t
)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       CASE WHEN len(g2) > 0
            THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2)
            ELSE 0.0 END AS dup_bigram_frac,
       CASE WHEN len(g3) > 0
            THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
            ELSE 0.0 END AS dup_trigram_frac,
       CAST(list_max(list_transform(list_distinct(toks),
                     t2 -> len(list_filter(toks, x -> x = t2)))) AS DOUBLE) / n
         AS top_token_frac
FROM g
""",
        "repetition_stats": """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id, toks, len(toks) AS n,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(len(toks) - 1),
                                  i -> toks[i+1] || ' ' || toks[i+2])
              ELSE [] END AS g2,
         CASE WHEN len(toks) >= 3
              THEN list_transform(range(len(toks) - 2),
                                  i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
              ELSE [] END AS g3
  FROM t
)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       CASE WHEN len(g2) > 0
            THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2)
            ELSE 0.0 END AS dup_bigram_frac,
       CASE WHEN len(g3) > 0
            THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
            ELSE 0.0 END AS dup_trigram_frac,
       CAST(list_max(list_transform(list_distinct(toks),
                     t2 -> len(list_filter(toks, x -> x = t2)))) AS DOUBLE) / n
         AS top_token_frac
FROM g
""",
        "contamination_check": """
WITH d AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) >= 5
              THEN list_distinct(list_transform(
                     range(len(string_split(text, ' ')) - 4),
                     i -> string_split(text, ' ')[i+1] || ' ' ||
                          string_split(text, ' ')[i+2] || ' ' ||
                          string_split(text, ' ')[i+3] || ' ' ||
                          string_split(text, ' ')[i+4] || ' ' ||
                          string_split(text, ' ')[i+5]))
              ELSE [text] END AS shingles
  FROM documents
),
e AS (SELECT doc_id, unnest(shingles) AS sh FROM d)
SELECT ev.doc_id AS eval_doc_id, tr.doc_id AS train_doc_id,
       COUNT(*) AS n_shared_ngrams
FROM e ev JOIN e tr ON ev.sh = tr.sh
WHERE ev.doc_id % 50 = 0 AND tr.doc_id % 50 <> 0
GROUP BY 1, 2
""",
        "pii_scrub": """
SELECT c_custkey,
       regexp_replace(c_name, '[0-9]+', '<ID>', 'g') AS masked_name,
       CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS extracted_id,
       CAST(len(regexp_extract_all(c_name, '[0-9]+')) AS BIGINT) AS n_digit_runs
FROM customer
""",
        "pivot_status_by_flag": """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_A,
       CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_N,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_R
FROM lineitem GROUP BY l_linestatus
""",
    }
    # the persisted-index IVF is bit-identical to the in-memory probe —
    # one oracle serves both
    d["similarity_topk_ivf_prebuilt"] = d["similarity_topk_ivf"]

    # --- late round-4 additions -------------------------------------
    # iterative fixed-point PageRank: the unrolled-CTE twin is generated
    # next to the operator so both sides share one constant set
    d["supplier_pagerank"] = graph.pagerank_oracle_sql()

    # interval-concurrency sweep over gap sessions (closed intervals:
    # +1 at start sorts before the microsecond-shifted -1)
    d["max_concurrent_sessions"] = """
WITH o AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), s AS (
  SELECT *, SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM o
), sess AS (
  SELECT MIN(ts) AS session_start, MAX(ts) AS session_end
  FROM s GROUP BY user_id, session_seq
), spanned AS (
  SELECT session_start, session_end,
         CAST(UNNEST(generate_series(CAST(session_start AS DATE),
                                     CAST(session_end AS DATE),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM sess
), clipped AS (
  SELECT day,
         GREATEST(session_start, CAST(day AS TIMESTAMP)) AS s,
         LEAST(session_end,
               CAST(day AS TIMESTAMP) + INTERVAL 1 DAY
                 - INTERVAL 1 MICROSECOND) AS e
  FROM spanned
), bounds AS (
  SELECT day, s AS ts, 1 AS delta FROM clipped
  UNION ALL
  SELECT day, e + INTERVAL 1 MICROSECOND AS ts, -1 AS delta FROM clipped
), swept AS (
  SELECT day, SUM(delta) OVER (
      PARTITION BY day ORDER BY ts ASC, delta DESC
      ROWS UNBOUNDED PRECEDING) AS active
  FROM bounds
)
SELECT day, CAST(MAX(active) AS BIGINT) AS max_concurrent
FROM swept GROUP BY day
"""

    # quality-CDF token-budget calibration (budget = total*3 DIV 10)
    d["quality_threshold_for_budget"] = """
WITH scored AS (
  SELECT CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS score,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
  FROM documents
), per_score AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_toks) AS BIGINT) AS n_tokens
  FROM scored GROUP BY score
), total AS (
  SELECT CAST(SUM(n_toks) * 3 // 10 AS BIGINT) AS budget FROM scored
), cdf AS (
  SELECT score, n_docs, n_tokens,
         CAST(SUM(n_docs) OVER w AS BIGINT) AS cum_docs,
         CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens
  FROM per_score
  WINDOW w AS (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)
)
SELECT c.score, c.n_docs, c.n_tokens, c.cum_docs, c.cum_tokens, t.budget,
       (c.cum_tokens >= t.budget AND c.cum_tokens - c.n_tokens < t.budget)
         AS selected
FROM cdf c CROSS JOIN total t
"""

    # blocked exact edit distance (prefix blocks, df-capped)
    d["edit_distance_pairs"] = """
WITH b AS (
  SELECT doc_id, text, substring(text, 1, 24) AS blk FROM documents
), keep AS (
  SELECT blk FROM b GROUP BY blk HAVING COUNT(*) <= 50
), d2 AS (
  SELECT b.* FROM b JOIN keep USING (blk)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_distance
FROM d2 a JOIN d2 b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.text, b.text) <= 40
"""

    # triangle counts: the oracle is the NAIVE id-ordered 3-way join, so
    # it cross-checks the degree-oriented wedge formulation
    d["supplier_triangles"] = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), und AS (
  SELECT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 5
), e AS (
  SELECT src AS u, dst AS v FROM und WHERE src < dst
), tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (
  SELECT a AS s_suppkey FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
GROUP BY s_suppkey
"""

    # bounded-hop BFS: unrolled min-relaxation rounds (hops are exact
    # BIGINTs; rounds past the diameter are no-ops)
    d["supplier_bfs_hops"] = """
WITH edges AS (
  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
), d0 AS (
  SELECT s_suppkey AS node, CAST(0 AS BIGINT) AS hop
  FROM supplier WHERE s_suppkey % 7 = 0
), d1 AS (
  SELECT node, MIN(hop) AS hop FROM (
    SELECT node, hop FROM d0
    UNION ALL
    SELECT e.dst, r.hop + 1 FROM edges e JOIN d0 r ON e.src = r.node
  ) GROUP BY node
), d2 AS (
  SELECT node, MIN(hop) AS hop FROM (
    SELECT node, hop FROM d1
    UNION ALL
    SELECT e.dst, r.hop + 1 FROM edges e JOIN d1 r ON e.src = r.node
  ) GROUP BY node
), d3 AS (
  SELECT node, MIN(hop) AS hop FROM (
    SELECT node, hop FROM d2
    UNION ALL
    SELECT e.dst, r.hop + 1 FROM edges e JOIN d2 r ON e.src = r.node
  ) GROUP BY node
)
SELECT node AS s_suppkey, hop FROM d3
"""

    # local clustering coefficient from the naive triangle formulation
    d["supplier_clustering_coeff"] = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), und AS (
  SELECT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 5
), deg AS (
  SELECT src AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS degree
  FROM und GROUP BY src
), e AS (
  SELECT src AS u, dst AS v FROM und WHERE src < dst
), tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
), pernode AS (
  SELECT s_suppkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT a AS s_suppkey FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY s_suppkey
)
SELECT d.s_suppkey, d.degree, COALESCE(t.n, 0) AS n_triangles,
       CAST(2 * COALESCE(t.n, 0) AS DOUBLE) / (d.degree * (d.degree - 1))
         AS clustering_coeff
FROM deg d LEFT JOIN pernode t ON d.s_suppkey = t.s_suppkey
WHERE d.degree >= 2
"""

    # k-core peeling: the same statically unrolled rounds as the Spark
    # lineage (graph.KCORE_K / KCORE_ROUNDS), chained as e{i}/k{i} CTEs
    # AS MATERIALIZED: every e{{i}} is referenced twice by the next round
    # (both endpoint joins) — without it DuckDB may inline the CTE chain
    # and re-evaluate the corpus self-join exponentially many times
    _kcore_rounds = "".join(
        f""", k{i} AS MATERIALIZED (
  SELECT src FROM e{i} GROUP BY src HAVING COUNT(*) >= {graph.KCORE_K}
), e{i + 1} AS MATERIALIZED (
  SELECT e.src, e.dst
  FROM e{i} e JOIN k{i} a ON e.src = a.src JOIN k{i} b ON e.dst = b.src
)"""
        for i in range(graph.KCORE_ROUNDS)
    )
    d["supplier_kcore"] = f"""
WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), e0 AS MATERIALIZED (
  SELECT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 5
){_kcore_rounds}
SELECT src AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS degree
FROM e{graph.KCORE_ROUNDS} GROUP BY src
"""

    # Gini of per-customer revenue: exact decimal operands, one final
    # IEEE division (DECIMAL(38,0) on both engines so the double
    # rounding of numerator/denominator is identical)
    d["revenue_gini"] = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS rev_cents
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT rev_cents,
         ROW_NUMBER() OVER (ORDER BY rev_cents ASC, o_custkey ASC) AS rnk
  FROM per_cust
), a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
         SUM(rev_cents) AS tot_cents,
         SUM(CAST(rnk AS DECIMAL(38,0)) * CAST(rev_cents AS DECIMAL(38,0)))
           AS wsum
  FROM ranked
)
SELECT n_customers,
       tot_cents / 100.0 AS total_revenue,
       CAST(CAST(2 AS DECIMAL(38,0)) * wsum
            - CAST(n_customers + 1 AS DECIMAL(38,0))
              * CAST(tot_cents AS DECIMAL(38,0)) AS DOUBLE)
       / CAST(CAST(n_customers AS DECIMAL(38,0))
              * CAST(tot_cents AS DECIMAL(38,0)) AS DOUBLE) AS gini
FROM a
"""

    # per-priority trimmed mean: integer trim boundaries, exact kept sum
    d["trimmed_mean_order_value"] = """
WITH o AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
), ranked AS (
  SELECT o_orderpriority, cents,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY cents ASC, o_orderkey ASC) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM o
), kept AS (
  SELECT * FROM ranked
  WHERE rn > (n * 5) // 100 AND rn <= n - (n * 5) // 100
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(MAX(n) AS BIGINT) AS n_total,
       CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0 AS trimmed_mean
FROM kept GROUP BY o_orderpriority
"""

    # exact-rational BM25 (no ln, no float division): every term score is
    # one integer floor-division of exact products — HUGEINT here mirrors
    # Spark's DECIMAL(38,0) DIV
    d["bm25_doc_rank"] = """
WITH toks AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE token <> ''
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
), totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS total_len
  FROM dl
), df_tab AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY token
), qterms AS (
  SELECT token, df FROM df_tab ORDER BY df DESC, token ASC LIMIT 2
), tf AS (
  SELECT t.doc_id, t.token, q.df, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks t JOIN qterms q ON t.token = q.token
  GROUP BY t.doc_id, t.token, q.df
), scored AS (
  SELECT f.doc_id,
         (CAST(1000000 AS HUGEINT)
          * CAST(44 * f.tf AS HUGEINT)
          * CAST(tt.total_len AS HUGEINT)
          * CAST(2 * tt.n_docs - 2 * f.df + 1 AS HUGEINT))
         // ((CAST(20 * f.tf AS HUGEINT) * CAST(tt.total_len AS HUGEINT)
              + CAST(6 AS HUGEINT) * CAST(tt.total_len AS HUGEINT)
              + CAST(18 * d.dl AS HUGEINT) * CAST(tt.n_docs AS HUGEINT))
             * CAST(2 * f.df + 1 AS HUGEINT)) AS term_fp
  FROM tf f JOIN dl d ON f.doc_id = d.doc_id CROSS JOIN totals tt
)
SELECT doc_id, CAST(SUM(term_fp) AS BIGINT) AS score_fp
FROM scored GROUP BY doc_id
ORDER BY score_fp DESC, doc_id ASC LIMIT 20
"""

    # matryoshka truncation audit (round 7): full-dim vs first-half
    # exact-cosine rankings compared per query; ranks use the attested
    # similarity_topk ordering convention per slice
    d["matryoshka_rank_agreement"] = f"""
WITH mq AS (
  SELECT vec_id AS query_id, embedding AS q,
         embedding[1:32] AS q32 FROM embeddings WHERE vec_id < 4
),
mc AS (
  SELECT vec_id AS neighbor_id, embedding AS c,
         embedding[1:32] AS c32 FROM embeddings WHERE vec_id >= 4
),
mscored AS (
  SELECT query_id, neighbor_id,
         CAST({dot64.format(a='q', b='c')} AS DOUBLE) AS dot,
         CAST({dot64.format(a='q', b='q')} AS DOUBLE) AS qn,
         CAST({dot64.format(a='c', b='c')} AS DOUBLE) AS cn,
         CAST({dot32.format(a='q32', b='c32')} AS DOUBLE) AS dot32,
         CAST({dot32.format(a='q32', b='q32')} AS DOUBLE) AS qn32,
         CAST({dot32.format(a='c32', b='c32')} AS DOUBLE) AS cn32
  FROM mc, mq
),
mranked AS (
  SELECT query_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY dot * abs(dot) / (qn * cn) DESC,
                                     neighbor_id ASC) AS r64,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY dot32 * abs(dot32) / (qn32 * cn32)
                                       DESC,
                                     neighbor_id ASC) AS r32
  FROM mscored
)
SELECT query_id,
       CAST(SUM(CASE WHEN r32 <= 20 THEN 1 ELSE 0 END) AS BIGINT)
         AS overlap_at_k,
       CAST(SUM(ABS(r64 - r32)) AS BIGINT) AS footrule,
       CAST(MAX(r32) AS BIGINT) AS worst_trunc_rank
FROM mranked WHERE r64 <= 20
GROUP BY query_id
"""

    # hybrid retrieval via reciprocal-rank fusion (round 7): the bm25
    # oracle reused verbatim as the lexical arm, the decimal-dot cosine
    # ranking (similarity_topk convention) for query vector 0 as the
    # semantic arm, 1e-9 fixed-point reciprocals (ranks <= 20 make the
    # floor collision-free, so fp order == rational RRF order)
    d["hybrid_search_rrf"] = f"""
WITH lex_raw AS (SELECT * FROM ({d['bm25_doc_rank']}) lx),
lexr AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score_fp DESC, doc_id ASC)
           AS lex_rank
  FROM lex_raw
),
rrfq AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
rrfc AS (SELECT vec_id AS neighbor_id, embedding AS cemb
         FROM embeddings WHERE vec_id <> 0),
rrfscored AS (
  SELECT neighbor_id,
         CAST({dot64.format(a='q', b='cemb')} AS DOUBLE) AS dot,
         CAST({dot64.format(a='q', b='q')} AS DOUBLE) AS qn,
         CAST({dot64.format(a='cemb', b='cemb')} AS DOUBLE) AS cn
  FROM rrfc, rrfq
),
semr AS (
  SELECT neighbor_id AS doc_id, CAST(rank AS BIGINT) AS sem_rank FROM (
    SELECT neighbor_id,
           ROW_NUMBER() OVER (ORDER BY dot * abs(dot) / (qn * cn) DESC,
                              neighbor_id ASC) AS rank
    FROM rrfscored
  ) WHERE rank <= 20
),
fused AS (
  SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
         CAST(l.lex_rank AS BIGINT) AS lex_rank, s.sem_rank,
         COALESCE(1000000000 // (60 + l.lex_rank), 0)
           + COALESCE(1000000000 // (60 + s.sem_rank), 0) AS rrf_fp
  FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id
)
SELECT * FROM (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_fp DESC, doc_id ASC)
              AS BIGINT) AS rank,
         doc_id, lex_rank, sem_rank, CAST(rrf_fp AS BIGINT) AS rrf_fp
  FROM fused
) WHERE rank <= 10
"""

    # real LOSSY-codec decode: uniform 8x8 source blocks make the whole
    # baseline-JPEG encode∘decode chain (level shift, fixed-point DCT,
    # half-away quantization, dequant, integer IDCT) ONE closed-form
    # integer function per block value; the oracle walks md5-byte block
    # values through that chain and rebuilds the decoded raster as
    # lowercase hex (sha256 is VARCHAR-only in DuckDB)
    _jp = "0123456789abcdef"
    _jpx = lambda b: (  # noqa: E731 — 2-hex-char fold of md5 digest byte b
        f"((strpos('{_jp}', substring(m, {2 * b + 1}, 1)) - 1) * 16"
        f" + (strpos('{_jp}', substring(m, {2 * b + 2}, 1)) - 1))"
    )
    _jblocks = ",\n".join(
        f"       {_jpx(b)} AS v{b}" for b in range(4)
    )
    _jsteps = "".join(
        f""", st{b} AS (
  SELECT * , v{b} - 128 AS s FROM {f'p{b - 1}' if b else 'st'}
), f{b} AS (
  SELECT * EXCLUDE (s), s * 536756224 AS a1 FROM st{b}
), g{b} AS (
  SELECT * EXCLUDE (a1),
         CASE WHEN a1 >= 0 THEN (a1 + 33554432) // 67108864
              ELSE -((-a1 + 33554432) // 67108864) END AS f00u
  FROM f{b}
), h{b} AS (
  SELECT * EXCLUDE (f00u),
         (CASE WHEN f00u >= 0 THEN (f00u + 8) // 16
               ELSE -((-f00u + 8) // 16) END) * 16 * 8386816
           + 33554432 AS t
  FROM g{b}
), p{b} AS (
  SELECT * EXCLUDE (t),
         LEAST(255, GREATEST(0,
           128 + CASE WHEN t >= 0 THEN t // 67108864
                      ELSE -((-t + 67108863) // 67108864) END)) AS pv{b}
  FROM h{b}
)"""
        for b in range(4)
    )
    _jhex = lambda b: (  # noqa: E731 — 2-char lowercase hex of pixel pv{b}
        f"(substring('{_jp}', pv{b} // 16 + 1, 1)"
        f" || substring('{_jp}', pv{b} % 16 + 1, 1))"
    )
    d["multimodal_jpeg_decode"] = f"""
WITH base AS (
  SELECT doc_id, md5(text) AS m FROM documents
), st AS (
  SELECT doc_id,
{_jblocks}
  FROM base
){_jsteps}
SELECT doc_id,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST(256 AS BIGINT) AS n_px_bytes,
       sha256(
         repeat(repeat({_jhex(0)}, 8) || repeat({_jhex(1)}, 8), 8)
         || repeat(repeat({_jhex(2)}, 8) || repeat({_jhex(3)}, 8), 8)
       ) AS pixel_sha
FROM p3
"""

    # real THREE-COMPONENT lossy-codec decode (round 6): each block's
    # md5 byte TRIPLE walks the closed-form color chain — the pinned
    # integer forward transform (jpeg_codec module docstring), the
    # per-component DC-only lossy chain (luminance q=16 for Y,
    # chrominance q=17 for Cb/Cr), the pinned integer inverse transform
    # (+65536 bias makes every // dividend nonnegative, so truncating
    # and flooring division agree) — and the interleaved RGB raster is
    # rebuilt as lowercase hex
    _cjb = lambda expr: (  # noqa: E731 — md5 digest byte at index `expr`
        f"((strpos('{_jp}', substring(m, 2 * ({expr}) + 1, 1)) - 1) * 16"
        f" + (strpos('{_jp}', substring(m, 2 * ({expr}) + 2, 1)) - 1))"
    )
    # shared closed-form chain for BOTH color-JPEG oracles (4:4:4 per
    # 8x8 block, 4:2:0 per uniform 16x16 MCU — subsampling is lossless
    # on uniform groups, so the per-unit color math is IDENTICAL; only
    # the raster assembly differs)
    _color_chain = f"""
WITH base AS (
  SELECT doc_id, md5(text) AS m FROM documents
), blk AS (
  SELECT doc_id, CAST(g.i AS INTEGER) AS bi,
         {_cjb('3 * g.i')} AS r,
         {_cjb('3 * g.i + 1')} AS g_,
         {_cjb('3 * g.i + 2')} AS b
  FROM base, (SELECT unnest(range(4)) AS i) g
), cc AS (
  SELECT doc_id, bi,
         (77 * r + 150 * g_ + 29 * b + 128) // 256 AS y,
         LEAST(255, (32896 - 43 * r - 85 * g_ + 128 * b) // 256) AS cb,
         LEAST(255, (32896 + 128 * r - 107 * g_ - 21 * b) // 256) AS cr
  FROM blk
), s1 AS (
  SELECT doc_id, bi, (y - 128) * 536756224 AS ay,
         (cb - 128) * 536756224 AS ab, (cr - 128) * 536756224 AS ar
  FROM cc
), s2 AS (
  SELECT doc_id, bi,
         CASE WHEN ay >= 0 THEN (ay + 33554432) // 67108864
              ELSE -((-ay + 33554432) // 67108864) END AS fy,
         CASE WHEN ab >= 0 THEN (ab + 33554432) // 67108864
              ELSE -((-ab + 33554432) // 67108864) END AS fb,
         CASE WHEN ar >= 0 THEN (ar + 33554432) // 67108864
              ELSE -((-ar + 33554432) // 67108864) END AS fr
  FROM s1
), s3 AS (
  SELECT doc_id, bi,
         (CASE WHEN fy >= 0 THEN (fy + 8) // 16
               ELSE -((-fy + 8) // 16) END) * 16 * 8386816
           + 33554432 AS ty,
         (CASE WHEN fb >= 0 THEN (fb + 8) // 17
               ELSE -((-fb + 8) // 17) END) * 17 * 8386816
           + 33554432 AS tb,
         (CASE WHEN fr >= 0 THEN (fr + 8) // 17
               ELSE -((-fr + 8) // 17) END) * 17 * 8386816
           + 33554432 AS tr
  FROM s2
), s4 AS (
  SELECT doc_id, bi,
         LEAST(255, GREATEST(0, 128 +
           CASE WHEN ty >= 0 THEN ty // 67108864
                ELSE -((-ty + 67108863) // 67108864) END)) AS py,
         LEAST(255, GREATEST(0, 128 +
           CASE WHEN tb >= 0 THEN tb // 67108864
                ELSE -((-tb + 67108863) // 67108864) END)) AS pb,
         LEAST(255, GREATEST(0, 128 +
           CASE WHEN tr >= 0 THEN tr // 67108864
                ELSE -((-tr + 67108863) // 67108864) END)) AS pr
  FROM s3
), rgb AS (
  SELECT doc_id, bi,
         LEAST(255, GREATEST(0,
           py + (359 * (pr - 128) + 128 + 65536) // 256 - 256)) AS rr,
         LEAST(255, GREATEST(0,
           py + (65664 - 88 * (pb - 128) - 183 * (pr - 128)) // 256
              - 256)) AS gg,
         LEAST(255, GREATEST(0,
           py + (454 * (pb - 128) + 128 + 65536) // 256 - 256)) AS bb
  FROM s4
), hx AS (
  SELECT doc_id, bi,
         substring('{_jp}', rr // 16 + 1, 1) || substring('{_jp}', rr % 16 + 1, 1)
         || substring('{_jp}', gg // 16 + 1, 1) || substring('{_jp}', gg % 16 + 1, 1)
         || substring('{_jp}', bb // 16 + 1, 1) || substring('{_jp}', bb % 16 + 1, 1)
           AS h6
  FROM rgb
), piv AS (
  SELECT doc_id,
         MAX(CASE WHEN bi = 0 THEN h6 END) AS x0,
         MAX(CASE WHEN bi = 1 THEN h6 END) AS x1,
         MAX(CASE WHEN bi = 2 THEN h6 END) AS x2,
         MAX(CASE WHEN bi = 3 THEN h6 END) AS x3
  FROM hx GROUP BY doc_id
)"""
    d["multimodal_color_jpeg_decode"] = (
        _color_chain
        + """
SELECT doc_id,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST(2 AS BIGINT) AS color_type,
       CAST(768 AS BIGINT) AS n_px_bytes,
       sha256(
         repeat(repeat(x0, 8) || repeat(x1, 8), 8)
         || repeat(repeat(x2, 8) || repeat(x3, 8), 8)
       ) AS pixel_sha
FROM piv
"""
    )

    # color decode + nearest-neighbor resample composition (round 7):
    # output rows 0-3 read block row 0 (src row (16r DIV 7) < 8), rows
    # 4-6 block row 1; cols 0-4 read block col 0, cols 5-9 block col 1
    d["multimodal_color_resize"] = (
        _color_chain
        + """
SELECT doc_id,
       CAST(10 AS BIGINT) AS width,
       CAST(7 AS BIGINT) AS height,
       CAST(210 AS BIGINT) AS n_px_bytes,
       sha256(
         repeat(repeat(x0, 5) || repeat(x1, 5), 4)
         || repeat(repeat(x2, 5) || repeat(x3, 5), 3)
       ) AS pixel_sha
FROM piv
"""
    )

    # 4:2:2 twin (round 7): 32x16 raster of four uniform 16x8 MCUs
    d["multimodal_color_jpeg_422_decode"] = (
        _color_chain
        + """
SELECT doc_id,
       CAST(32 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST(2 AS BIGINT) AS color_type,
       CAST(1536 AS BIGINT) AS n_px_bytes,
       sha256(
         repeat(repeat(x0, 16) || repeat(x1, 16), 8)
         || repeat(repeat(x2, 16) || repeat(x3, 16), 8)
       ) AS pixel_sha
FROM piv
"""
    )

    # 4:2:0 decode + thumbnail composition (round 7): the 32x32 -> 10x7
    # floor mapping lands rows 0-3 / cols 0-4 in MCU (0,0) etc. — the
    # same 5/5 x 4/3 assembly as the 4:4:4 resize
    d["multimodal_resize_420"] = (
        _color_chain
        + """
SELECT doc_id,
       CAST(10 AS BIGINT) AS width,
       CAST(7 AS BIGINT) AS height,
       CAST(210 AS BIGINT) AS n_px_bytes,
       sha256(
         repeat(repeat(x0, 5) || repeat(x1, 5), 4)
         || repeat(repeat(x2, 5) || repeat(x3, 5), 3)
       ) AS pixel_sha
FROM piv
"""
    )

    # 4:2:0 twin (round 7): same per-unit color math, 32x32 raster of
    # four uniform 16x16 MCUs
    d["multimodal_color_jpeg_subsampled_decode"] = (
        _color_chain
        + """
SELECT doc_id,
       CAST(32 AS BIGINT) AS width,
       CAST(32 AS BIGINT) AS height,
       CAST(2 AS BIGINT) AS color_type,
       CAST(3072 AS BIGINT) AS n_px_bytes,
       sha256(
         repeat(repeat(x0, 16) || repeat(x1, 16), 16)
         || repeat(repeat(x2, 16) || repeat(x3, 16), 16)
       ) AS pixel_sha
FROM piv
"""
    )

    # exact bitmap distinct rollup: the oracle is the plain distinct
    # count — the whole 62-bit-word sketch path must reproduce it
    d["bitmap_weekly_users"] = """
SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1
"""

    # bitmap IVM: popcount(state OR delta) must equal the full distinct
    # recompute — the oracle IS the identity (incremental_rollup_merge
    # convention); same SQL as the one-shot bitmap query by design
    d["incremental_bitmap_distinct_merge"] = d["bitmap_weekly_users"]

    # CUSUM change-point: |N*S_k - k*S_N| in cleared-denominator integer
    # form; HUGEINT products, BIGINT transport (headroom to ~sf10000)
    d["revenue_cusum_max"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS rev
  FROM orders GROUP BY 1
), cum AS (
  SELECT day, SUM(rev) OVER (ORDER BY day) AS s_k,
         ROW_NUMBER() OVER (ORDER BY day) AS k
  FROM daily
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(rev) AS BIGINT) AS s_n
  FROM daily
)
SELECT day,
       CAST(ABS(CAST(n_days AS HUGEINT) * CAST(s_k AS HUGEINT)
                - CAST(k AS HUGEINT) * CAST(s_n AS HUGEINT)) AS BIGINT)
         AS dev_scaled
FROM cum CROSS JOIN tot
ORDER BY dev_scaled DESC, day ASC LIMIT 5
"""

    # Mann-Whitney rank-sum: doubled midranks (2*avg = 2*cum_end-cnt+1)
    # keep tie handling integral; identical leaf-aggregate-first shape
    d["mann_whitney_u"] = """
WITH tagged AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_b
  FROM events WHERE event_type IN ('click', 'purchase')
), pv AS (
  SELECT c, CAST(SUM(is_a) AS BIGINT) AS da,
         CAST(SUM(is_b) AS BIGINT) AS db
  FROM tagged GROUP BY c
), rk AS (
  SELECT da, db, da + db AS cnt,
         SUM(da + db) OVER (ORDER BY c) AS cum_end
  FROM pv
), s AS (
  SELECT CAST(SUM(da) AS BIGINT) AS n_a, CAST(SUM(db) AS BIGINT) AS n_b,
         CAST(SUM(da * (2 * cum_end - cnt + 1)) AS BIGINT) AS two_r_a,
         CAST(SUM(db * (2 * cum_end - cnt + 1)) AS BIGINT) AS two_r_b
  FROM rk
)
SELECT n_a, n_b,
       CAST(two_r_a - n_a * (n_a + 1) AS BIGINT) AS u2x_a,
       CAST(two_r_b - n_b * (n_b + 1) AS BIGINT) AS u2x_b
FROM s
"""

    # Cliff's delta: the MWU oracle composed verbatim, one arithmetic
    # map (2U_a - n_a n_b over n_a n_b) in sign-split exact ppm
    d["cliffs_delta_daily"] = f"""
WITH u AS (SELECT * FROM ({d["mann_whitney_u"]}) m)
SELECT n_a, n_b, u2x_a,
       CAST(CASE WHEN CAST(u2x_a AS HUGEINT)
                      - CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT) >= 0
            THEN (1000000 * (CAST(u2x_a AS HUGEINT)
                             - CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT)))
                 // (CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT))
            ELSE -((1000000 * (CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT)
                               - CAST(u2x_a AS HUGEINT)))
                   // (CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT)))
            END AS BIGINT) AS delta_ppm
FROM u
"""

    # one-pass column profile: native-type min/max stringified through
    # engine-stable casts (decimal two-places, date)
    _prof_cols = [
        ("o_orderkey", "o_orderkey", True),
        ("o_custkey", "o_custkey", True),
        ("o_orderstatus", "o_orderstatus", False),
        ("o_totalprice", "CAST(o_totalprice AS DECIMAL(18,2))", True),
        ("o_orderdate", "CAST(o_orderdate AS DATE)", True),
        ("o_orderpriority", "o_orderpriority", False),
    ]
    d["table_profile"] = "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({expr}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {expr}) AS BIGINT) AS n_distinct,
       {'CAST(MIN(' + expr + ') AS VARCHAR)' if cast else 'MIN(' + expr + ')'} AS min_val,
       {'CAST(MAX(' + expr + ') AS VARCHAR)' if cast else 'MAX(' + expr + ')'} AS max_val
FROM orders"""
        for name, expr, cast in _prof_cols
    )

    # layout advisor (round 7): pure arithmetic over the table_profile
    # statistics — its oracle SQL reused verbatim as the input frame
    d["layout_advisor"] = f"""
SELECT column_name, n_distinct,
       CAST(n_distinct * 1000000 // n_rows AS BIGINT) AS distinct_ppm,
       CAST(n_nulls * 1000000 // n_rows AS BIGINT) AS null_ppm,
       CASE WHEN n_distinct * 1000000 // n_rows < 100000
            THEN 'dictionary' ELSE 'plain' END AS encoding,
       CAST(CASE WHEN n_nulls = 0 AND n_distinct BETWEEN 2 AND 1000
                 THEN 1 ELSE 0 END AS BIGINT) AS partition_candidate,
       CAST(ROW_NUMBER() OVER (ORDER BY n_distinct DESC,
                               column_name ASC) AS BIGINT)
         AS sort_key_rank
FROM ({d['table_profile']}) prof
"""

    # gaps-and-islands: idx - dense_rank island key, total tie-breaks
    d["customer_order_streaks"] = """
WITH months AS (
  SELECT DISTINCT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m_idx
  FROM orders
), isl AS (
  SELECT o_custkey, m_idx,
         m_idx - DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY m_idx)
           AS island
  FROM months
), runs AS (
  SELECT o_custkey, island, CAST(COUNT(*) AS BIGINT) AS run_len,
         CAST(MIN(m_idx) AS BIGINT) AS start_idx
  FROM isl GROUP BY 1, 2
), best AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY run_len DESC, start_idx ASC) AS rn
    FROM runs
  ) WHERE rn = 1
), tot AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_active_months
  FROM months GROUP BY 1
)
SELECT b.o_custkey AS custkey, t.n_active_months, b.run_len AS longest_streak,
       CAST(b.start_idx // 12 AS BIGINT) AS streak_start_year,
       CAST(b.start_idx % 12 + 1 AS BIGINT) AS streak_start_month
FROM best b JOIN tot t ON b.o_custkey = t.o_custkey
"""

    # seasonal-naive baseline: self-join on day-7 (sparse-safe), exact
    # cents error total, one IEEE division
    d["weekly_seasonal_mae"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS v
  FROM events GROUP BY 1, 2
), pred AS (
  SELECT event_type, day + 7 AS day, v AS v_pred FROM daily
)
SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(ABS(d.v - p.v_pred)) AS BIGINT) AS total_abs_err,
       CAST(SUM(ABS(d.v - p.v_pred)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS mae_cents
FROM daily d JOIN pred p ON d.event_type = p.event_type AND d.day = p.day
GROUP BY d.event_type
"""

    # band self-join oracle: the quadratic within-nation theta-join the
    # bucketed form must reproduce exactly
    d["customer_balance_band_pairs"] = """
WITH s AS (
  SELECT c_custkey, c_nationkey,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM customer
)
SELECT a.c_nationkey AS nation, a.c_custkey AS key_a, b.c_custkey AS key_b,
       CAST(a.cents - b.cents AS BIGINT) AS diff_cents
FROM s a JOIN s b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE ABS(a.cents - b.cents) <= 10000
"""

    # dynamic-partition-pruning rollup: oracle is the plain filtered
    # aggregate (the join against the filtered calendar dim is identity
    # on these days)
    d["dpp_partitioned_rollup"] = """
SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS total_cents
FROM events
WHERE date_trunc('week', CAST(ts AS DATE)) = DATE '2024-01-15'
GROUP BY 1
"""

    # LSH banding tuning report: reuse the minhash CTE chain's `sig`
    # table; per config, band-key arms + occupancy counts (the chain's
    # own lsh_pairs tail goes unreferenced and is pruned by the planner)
    def _lsh_cfg(bands: int) -> str:
        rpb = 32 // bands
        arms = "\n  UNION ALL ".join(
            "SELECT doc_id, {b} AS band, md5({key}) AS band_key FROM sig".format(
                b=b,
                key=" || '|' || ".join(
                    f"CAST(h{b * rpb + j} AS VARCHAR)" for j in range(rpb)
                ),
            )
            for b in range(bands)
        )
        return f"""
arms{bands} AS (
  {arms}
), agg{bands} AS (
  SELECT band, band_key, CAST(COUNT(*) AS BIGINT) AS m
  FROM arms{bands} GROUP BY 1, 2 HAVING COUNT(*) >= 2
), stat{bands} AS (
  SELECT CAST({bands} AS BIGINT) AS bands,
         CAST({rpb} AS BIGINT) AS rows_per_band,
         CAST(COUNT(*) AS BIGINT) AS n_buckets,
         CAST(COALESCE(SUM(m * (m - 1) // 2), 0) AS BIGINT)
           AS n_candidate_pairs
  FROM agg{bands}
)"""

    d["lsh_tuning_report"] = (
        "WITH "
        + _minhash_ctes()
        + ","
        + ",".join(_lsh_cfg(b) for b in (4, 8, 16))
        + """
SELECT * FROM stat4
UNION ALL SELECT * FROM stat8
UNION ALL SELECT * FROM stat16
"""
    )

    # product-quantization codes: the ivf centroid/argmax ladder per
    # 32-dim half (list slices are 1-based inclusive in DuckDB)
    _FOLD32 = _FOLD64.replace("range(64)", "range(32)")

    def _pq_half(tag: str, lo: int, hi: int, code: str) -> str:
        return f"""
h{tag} AS (SELECT vec_id, label, embedding[{lo}:{hi}] AS sub FROM embeddings),
cd{tag} AS (
  SELECT label AS cell, i AS dim,
         CAST(SUM(CAST(floor(CAST(sub[i + 1] AS DOUBLE)
                            * 1000000000.0) AS BIGINT))
              AS DOUBLE) / COUNT(*) / 1000000000.0 AS c
  FROM h{tag}, (SELECT unnest(range(32)) AS i) dims
  GROUP BY label, i
),
cents{tag} AS (SELECT cell, list(c ORDER BY dim ASC) AS centroid
               FROM cd{tag} GROUP BY cell),
sc{tag} AS (
  SELECT vec_id, cell,
         {_FOLD32.format(a="sub", b="centroid")}
           / (sqrt({_FOLD32.format(a="sub", b="sub")})
              * sqrt({_FOLD32.format(a="centroid", b="centroid")})) AS cos
  FROM h{tag} CROSS JOIN cents{tag}
),
p{tag} AS (
  SELECT vec_id, CAST(cell AS BIGINT) AS {code} FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY cos DESC, cell ASC) AS rn
    FROM sc{tag}
  ) WHERE rn = 1
)"""

    d["embedding_pq_codes"] = (
        "WITH "
        + _pq_half("a", 1, 32, "code_a")
        + ","
        + _pq_half("b", 33, 64, "code_b")
        + """
SELECT pa.vec_id, code_a, code_b
FROM pa JOIN pb ON pa.vec_id = pb.vec_id
"""
    )

    # PQ asymmetric-distance search (round 6): exact integer floor-mean
    # codebooks (1e-9 fixed point), 1e-6 fixed-point queries, BIGINT
    # scores — the distance-table lookup path over the SAME code
    # assignment as embedding_pq_codes (its CTE chain reused verbatim)
    _adc_cbook = lambda tag, off: f"""
cb{tag} AS (
  SELECT cell, dim,
         (csum - ((csum % cnt) + cnt) % cnt) // cnt AS cfp
  FROM (
    SELECT label AS cell, i AS dim,
           SUM(CAST(floor(CAST(embedding[i + {off + 1}] AS DOUBLE)
                          * 1000000000.0) AS BIGINT)) AS csum,
           COUNT(*) AS cnt
    FROM embeddings, (SELECT unnest(range(32)) AS i) dims
    GROUP BY label, i
  )
), dt{tag} AS (
  SELECT q.vec_id AS query_id, c.cell,
         SUM(CAST(floor(CAST(q.embedding[c.dim + {off + 1}] AS DOUBLE)
                        * 1000000.0) AS BIGINT) * c.cfp) AS ip{tag}
  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 4) q,
       cb{tag} c
  GROUP BY 1, 2
)"""  # noqa: E731
    d["pq_search_adc"] = (
        "WITH "
        + _pq_half("a", 1, 32, "code_a")
        + ","
        + _pq_half("b", 33, 64, "code_b")
        + ","
        + _adc_cbook("a", 0)
        + ","
        + _adc_cbook("b", 32)
        + """
, scored AS (
  SELECT da.query_id, p.vec_id, da.ipa + db.ipb AS score
  FROM (SELECT pa.vec_id, code_a, code_b
        FROM pa JOIN pb ON pa.vec_id = pb.vec_id) p
  JOIN dta da ON da.cell = p.code_a
  JOIN dtb db ON db.cell = p.code_b AND db.query_id = da.query_id
  WHERE p.vec_id >= 4
)
SELECT query_id, CAST(rn AS BIGINT) AS rank, vec_id,
       CAST(score AS BIGINT) AS score
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, vec_id ASC) AS rn
  FROM scored
) WHERE rn <= 10
"""
    )

    # FULL IVF-PQ search (round 7, VERDICT r6 item 1): pq_search_adc's
    # ADC scoring chain composed with knn_label_vote_ivf's probe-cell
    # predicate — each query coarse-ranks the full-dim fixed-point
    # centroids, keeps its 3 nearest cells (double cosine, total
    # tie-break), and ADC-scores ONLY vectors whose cell (= label) was
    # probed by THAT query. CTEs pa/pb (code assignment) and dta/dtb
    # (distance tables) are the attested pq_search_adc chains verbatim.
    # parameterized by probe budget so the recall frontier composes the
    # SAME SQL once per n_probe value (no string-replace derivations —
    # the ADVICE r9 tick-feed lesson)
    def _ipq_sql(n_probe: int, k: int = 10) -> str:
        return (
            "WITH "
            + _pq_half("a", 1, 32, "code_a")
            + ","
            + _pq_half("b", 33, 64, "code_b")
            + ","
            + _adc_cbook("a", 0)
            + ","
            + _adc_cbook("b", 32)
            + f"""
, cd64 AS (
  SELECT label AS cell, i AS dim,
         CAST(SUM(CAST(floor(CAST(embedding[i + 1] AS DOUBLE)
                            * 1000000000.0) AS BIGINT))
              AS DOUBLE) / COUNT(*) / 1000000000.0 AS c
  FROM embeddings, (SELECT unnest(range(64)) AS i) dims
  GROUP BY label, i
),
cents64 AS (SELECT cell, list(c ORDER BY dim ASC) AS centroid
            FROM cd64 GROUP BY cell),
q64 AS (SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id < 4),
qcells64 AS (
  SELECT query_id, cell,
         {_FOLD64.format(a="qe", b="centroid")}
           / (sqrt({_FOLD64.format(a="qe", b="qe")})
              * sqrt({_FOLD64.format(a="centroid", b="centroid")}))
           AS cell_cos
  FROM q64 CROSS JOIN cents64
),
probed AS (
  SELECT query_id, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cell_cos DESC, cell ASC) AS cr
    FROM qcells64
  ) WHERE cr <= {n_probe}
),
cand AS (
  SELECT pr.query_id, p.vec_id, p.code_a, p.code_b
  FROM (SELECT pa.vec_id, code_a, code_b
        FROM pa JOIN pb ON pa.vec_id = pb.vec_id) p
  JOIN embeddings e ON e.vec_id = p.vec_id
  JOIN probed pr ON pr.cell = e.label
  WHERE p.vec_id >= 4
),
ipqscored AS (
  SELECT c.query_id, c.vec_id, da.ipa + db.ipb AS score
  FROM cand c
  JOIN dta da ON da.cell = c.code_a AND da.query_id = c.query_id
  JOIN dtb db ON db.cell = c.code_b AND db.query_id = c.query_id
)
SELECT query_id, CAST(rn AS BIGINT) AS rank, vec_id,
       CAST(score AS BIGINT) AS score
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, vec_id ASC) AS rn
  FROM ipqscored
) WHERE rn <= {k}
"""
        )

    d["ivfpq_search"] = _ipq_sql(3)

    # IVF-PQ recall frontier: the exact arm ranks the SAME candidate
    # universe (vec_id >= 4) by the decimal-dot cosine key; each probe
    # budget composes the parameterized IVF-PQ SQL verbatim
    # each arm over-fetches an ADC top-50 RERANK WINDOW (the production
    # two-stage pattern); recall counts exact top-10 members inside it
    _ipq_arm = "\nUNION ALL\n".join(
        f"SELECT {p} AS n_probe, query_id, vec_id AS neighbor_id"
        f" FROM ({_ipq_sql(p, 50)}) ipq{p}"
        for p in (1, 2, 3)
    )
    d["ivfpq_recall_frontier"] = f"""
WITH qx AS (SELECT vec_id AS query_id, embedding AS q
            FROM embeddings WHERE vec_id < 4),
cx AS (SELECT vec_id AS neighbor_id, embedding AS c
       FROM embeddings WHERE vec_id >= 4),
sx AS (
  SELECT query_id, neighbor_id,
         {dot64.format(a='q', b='c')} AS dot
  FROM cx, qx
), exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY dot DESC, neighbor_id ASC) AS rank
    FROM sx
  ) WHERE rank <= 10
), ann AS (
{_ipq_arm}
), ek AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS k_exact
  FROM exact GROUP BY 1
), h AS (
  SELECT a.n_probe, e.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM exact e JOIN ann a ON e.query_id = a.query_id
                         AND e.neighbor_id = a.neighbor_id
  GROUP BY 1, 2
), grid AS (
  SELECT p.n_probe, ek.query_id, ek.k_exact
  FROM (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS n_probe) p
  CROSS JOIN ek
)
SELECT g.n_probe, g.query_id, g.k_exact,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) * 1000 // g.k_exact AS BIGINT)
         AS recall_millis
FROM grid g LEFT JOIN h ON g.n_probe = h.n_probe
                       AND g.query_id = h.query_id
"""

    # anti-entropy replica diff: same BIGINT-fold checksum as
    # table_checksum, replica corruption derived arithmetically
    d["checksum_replica_diff"] = f"""
WITH base AS (
  SELECT doc_id % 32 AS bucket,
         md5(CAST(doc_id AS VARCHAR) || '|' || md5(text)) AS hx
  FROM documents
), rep AS (
  SELECT doc_id % 32 AS bucket,
         md5(CAST(doc_id AS VARCHAR) || '|' || md5(
           CASE WHEN doc_id % 97 = 0 THEN text || ' corrupted'
                ELSE text END)) AS hx
  FROM documents
), cb AS (
  SELECT bucket,
         CAST(SUM({_hex_u32('hx', 1)}) % 4611686018427387904 AS BIGINT)
           AS ck_base
  FROM base GROUP BY bucket
), cr AS (
  SELECT bucket,
         CAST(SUM({_hex_u32('hx', 1)}) % 4611686018427387904 AS BIGINT)
           AS ck_replica
  FROM rep GROUP BY bucket
), corrupt AS (
  SELECT doc_id % 32 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_corrupt
  FROM documents WHERE doc_id % 97 = 0 GROUP BY 1
)
SELECT cb.bucket, ck_base, ck_replica, n_corrupt
FROM cb JOIN cr ON cb.bucket = cr.bucket
        JOIN corrupt ON cb.bucket = corrupt.bucket
WHERE ck_base <> ck_replica
"""

    # bitmap set-algebra overlap == plain distinct-set arithmetic per
    # consecutive epoch... ISO-week pair (generated Monday series)
    d["weekly_user_overlap"] = """
WITH wu AS (
  SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS week_start,
                  user_id
  FROM events
), bounds AS (SELECT MIN(week_start) AS lo, MAX(week_start) AS hi FROM wu),
wk AS (
  SELECT CAST(unnest(generate_series(lo, hi - 7, INTERVAL 7 DAY)) AS DATE)
           AS week_start
  FROM bounds
), pairs AS (
  SELECT wk.week_start, wu.user_id,
         MAX(CASE WHEN wu.week_start = wk.week_start THEN 1 ELSE 0 END)
           AS in0,
         MAX(CASE WHEN wu.week_start = wk.week_start + 7 THEN 1 ELSE 0 END)
           AS in1
  FROM wk JOIN wu
    ON wu.week_start = wk.week_start OR wu.week_start = wk.week_start + 7
  GROUP BY 1, 2
)
SELECT week_start, week_start + 7 AS next_week,
       CAST(SUM(CASE WHEN in0 = 1 AND in1 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS returning,
       CAST(SUM(CASE WHEN in0 = 1 AND in1 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS churned,
       CAST(SUM(CASE WHEN in0 = 0 AND in1 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS new_users
FROM pairs GROUP BY week_start
"""

    # min-label propagation, unrolled 3 rounds (the BFS oracle pattern).
    # Every round frame is referenced TWICE (the union arm and the next
    # round's join), so the CTEs are AS MATERIALIZED — inlining would
    # re-evaluate the lineitem self-join 2^rounds times (the r8 BPE
    # lesson; this oracle dominated the sf1 sweep wall at ~694s before)
    d["supplier_label_propagation"] = """
WITH edges AS MATERIALIZED (
  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
), l0 AS MATERIALIZED (
  SELECT s_suppkey AS node, CAST(s_suppkey AS BIGINT) AS label FROM supplier
), l1 AS MATERIALIZED (
  SELECT node, MIN(label) AS label FROM (
    SELECT node, label FROM l0
    UNION ALL
    SELECT e.dst, r.label FROM edges e JOIN l0 r ON e.src = r.node
  ) GROUP BY node
), l2 AS MATERIALIZED (
  SELECT node, MIN(label) AS label FROM (
    SELECT node, label FROM l1
    UNION ALL
    SELECT e.dst, r.label FROM edges e JOIN l1 r ON e.src = r.node
  ) GROUP BY node
), l3 AS MATERIALIZED (
  SELECT node, MIN(label) AS label FROM (
    SELECT node, label FROM l2
    UNION ALL
    SELECT e.dst, r.label FROM edges e JOIN l2 r ON e.src = r.node
  ) GROUP BY node
), sizes AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS community_size
  FROM l3 GROUP BY label
)
SELECT l3.node AS s_suppkey, l3.label, sizes.community_size
FROM l3 JOIN sizes ON l3.label = sizes.label
"""

    # per-edge common-neighbor support over the same min_support=5
    # co-purchase graph as the triangle oracle; bridges survive via the
    # left join + zero fill
    d["copurchase_edge_support"] = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), und AS (
  SELECT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 5
), e AS (SELECT src AS u, dst AS v FROM und WHERE src < dst),
cn AS (
  SELECT e.u, e.v, CAST(COUNT(*) AS BIGINT) AS support
  FROM e JOIN und n1 ON n1.src = e.u
         JOIN und n2 ON n2.src = e.v AND n2.dst = n1.dst
  GROUP BY e.u, e.v
)
SELECT e.u, e.v, COALESCE(cn.support, 0) AS support
FROM e LEFT JOIN cn ON e.u = cn.u AND e.v = cn.v
ORDER BY support DESC, e.u ASC, e.v ASC LIMIT 100
"""

    # per-edge neighborhood Jaccard: the edge-support CTEs + symmetric
    # degrees; |N(u) u N(v)| = deg_u + deg_v - support, exact ppm
    d["copurchase_edge_jaccard"] = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), und AS (
  SELECT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 5
), e AS (SELECT src AS u, dst AS v FROM und WHERE src < dst),
cn AS (
  SELECT e.u, e.v, CAST(COUNT(*) AS BIGINT) AS support
  FROM e JOIN und n1 ON n1.src = e.u
         JOIN und n2 ON n2.src = e.v AND n2.dst = n1.dst
  GROUP BY e.u, e.v
), deg AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY src
), scored AS (
  SELECT e.u, e.v,
         CAST(COALESCE(cn.support, 0) AS BIGINT) AS support,
         du.deg AS deg_u, dv.deg AS deg_v,
         CAST(COALESCE(cn.support, 0) * 1000000
              // (du.deg + dv.deg - COALESCE(cn.support, 0))
              AS BIGINT) AS jaccard_ppm
  FROM e LEFT JOIN cn ON e.u = cn.u AND e.v = cn.v
         JOIN deg du ON du.src = e.u
         JOIN deg dv ON dv.src = e.v
)
SELECT u, v, support, deg_u, deg_v, jaccard_ppm
FROM scored ORDER BY jaccard_ppm DESC, u ASC, v ASC LIMIT 100
"""

    # exact order-statistic percentiles: rank probe ceil(p*n/100)
    d["orders_percentile_ladder"] = """
WITH o AS (
  SELECT o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         o_orderkey
  FROM orders
), ranked AS (
  SELECT o_orderpriority, cents,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY cents ASC, o_orderkey ASC) AS rn
  FROM o
), counts AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM o GROUP BY 1
), ps AS (SELECT CAST(unnest([25, 50, 75, 90, 99]) AS BIGINT) AS p)
SELECT c.o_orderpriority AS priority, p, n_orders, r.cents AS pct_value_cents
FROM counts c CROSS JOIN ps
JOIN ranked r ON r.o_orderpriority = c.o_orderpriority
             AND r.rn = (p * c.n_orders + 99) // 100
"""

    # Herfindahl concentration: Σrev²/total² exact, one IEEE division
    d["hhi_market_concentration"] = """
WITH per_sup AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem GROUP BY 1
), spine AS (
  SELECT s_suppkey, r_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
), pr AS (
  SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         CAST(SUM(rev) AS BIGINT) AS total_cents,
         SUM(CAST(rev AS HUGEINT) * CAST(rev AS HUGEINT)) AS sum_sq
  FROM per_sup JOIN spine ON l_suppkey = s_suppkey GROUP BY 1
)
SELECT r_name AS region, n_suppliers, total_cents,
       CAST(sum_sq AS DOUBLE)
         / CAST(CAST(total_cents AS HUGEINT) * CAST(total_cents AS HUGEINT)
                AS DOUBLE) AS hhi
FROM pr
"""

    # engine-side JSON path extraction parity (get_json_object vs
    # json_extract); missing keys land in the NULL bucket on both sides
    # integer-pattern guard mirrored with the Spark side (ADVICE r6):
    # extract the raw string, convert only ^-?[0-9]{1,18} matches, else
    # NULL; the width bound (ADVICE r7) keeps every admitted string
    # inside BIGINT, where Spark's cast would NULL but DuckDB's raises
    d["json_value_histogram"] = """
WITH ext AS (
  SELECT event_type, json_extract_string(props, '$.k') AS ks FROM events
)
SELECT event_type,
       CAST(floor(CAST(CASE WHEN regexp_matches(ks, '^-?[0-9]{1,18}$')
                            THEN CAST(ks AS BIGINT) END AS BIGINT) / 10)
            AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM ext GROUP BY 1, 2
"""

    # streaming bitmap sketch == plain batch distinct per epoch week
    d["streaming_bitmap_distinct"] = """
SELECT make_timestamp((epoch_us(ts) // 604800000000) * 604800000000)
         AS week_start,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1
"""

    # collocation lift: exact rational PMI core, one monotone IEEE
    # division as the ranking key, (tx, ty) total tie-break
    d["bigram_collocations"] = """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
toks AS (
  SELECT token FROM (SELECT unnest(toks) AS token FROM docs) WHERE token <> ''
),
uni AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY token),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM toks),
bi_raw AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                               i -> {'tx': toks[i], 'ty': toks[i + 1]})) AS p
  FROM docs
),
bi AS (
  SELECT p.tx AS tx, p.ty AS ty, CAST(COUNT(*) AS BIGINT) AS n_xy
  FROM bi_raw WHERE p.tx <> '' AND p.ty <> ''
  GROUP BY 1, 2 HAVING COUNT(*) >= 5
)
SELECT tx, ty, n_xy, ux.n AS n_x, uy.n AS n_y,
       CAST(n_xy * n_total AS DOUBLE) / CAST(ux.n * uy.n AS DOUBLE) AS lift
FROM bi JOIN uni ux ON bi.tx = ux.token
        JOIN uni uy ON bi.ty = uy.token
        CROSS JOIN total
ORDER BY lift DESC, tx ASC, ty ASC LIMIT 25
"""

    # pairwise source vocabulary Jaccard (token-level set overlap)
    d["source_vocab_jaccard"] = """
WITH st AS (
  SELECT DISTINCT source, token FROM (
    SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE token <> ''
),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab FROM st GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_inter, va.vocab AS vocab_a, vb.vocab AS vocab_b,
       CAST(n_inter AS DOUBLE)
         / CAST(va.vocab + vb.vocab - n_inter AS DOUBLE) AS jaccard
FROM inter JOIN sizes va ON inter.src_a = va.source
           JOIN sizes vb ON inter.src_b = vb.source
"""

    # Gini-Simpson diversity: (N² - Σn²)/N², exact integers + one division
    d["simpson_token_diversity"] = """
WITH toks AS (
  SELECT source, token FROM (
    SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE token <> ''
),
counts AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2
),
per AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
         CAST(SUM(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS BIGINT) AS sum_sq
  FROM counts GROUP BY source
)
SELECT source, n_tokens, sum_sq,
       CAST(CAST(n_tokens AS HUGEINT) * CAST(n_tokens AS HUGEINT) - sum_sq
            AS DOUBLE)
         / CAST(CAST(n_tokens AS HUGEINT) * CAST(n_tokens AS HUGEINT)
                AS DOUBLE) AS simpson
FROM per
"""

    # tf/df keyword extraction: per-doc row_number over the monotone
    # IEEE-division key with token tie-break
    d["top_keywords_per_doc"] = """
WITH toks AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE token <> ''
),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
),
dfx AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token)
SELECT doc_id, CAST(rank AS INTEGER) AS rank, token, tf, df FROM (
  SELECT t.doc_id, t.token, t.tf, d.df,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id
                            ORDER BY CAST(t.tf AS DOUBLE) / CAST(d.df AS DOUBLE)
                                     DESC, t.token ASC) AS rank
  FROM tf t JOIN dfx d ON t.token = d.token
) WHERE rank <= 3
"""

    # real AUDIO-codec decode (round 6): the WAV fixture's samples are
    # the md5 DIGEST bytes repeated 16x, so the lowercase-hex transport
    # is just the md5 hexdigest repeated and the energy is 16x the sum
    # of squared midpoint deviations of the 16 digest bytes
    d["multimodal_wav_decode"] = f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
bb AS (
  SELECT doc_id, i,
         ((strpos('0123456789abcdef', substring(h, 2 * i + 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substring(h, 2 * i + 2, 1)) - 1)) AS v
  FROM m, (SELECT unnest(range(16)) AS i) g
),
e AS (
  SELECT doc_id,
         CAST(SUM((v - 128) * (v - 128)) AS BIGINT) * 16 AS energy
  FROM bb GROUP BY doc_id
)
SELECT m.doc_id,
       CAST(256 AS BIGINT) AS n_samples,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(32000 AS BIGINT) AS duration_us,
       e.energy,
       sha256(repeat(m.h, 16)) AS sample_sha
FROM m JOIN e ON m.doc_id = e.doc_id
"""

    # short-time audio features (round 6): sample i of the decoded
    # waveform is digest byte (i mod 16); frames are 24 samples (full
    # frames only: 240 of 256), crossings pair i with i+1 inside the
    # frame — all integer-exact
    d["multimodal_wav_frame_features"] = f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
s AS (
  SELECT doc_id, i,
         ((strpos('{_jp}', substring(h, 2 * (i % 16) + 1, 1)) - 1) * 16
          + (strpos('{_jp}', substring(h, 2 * (i % 16) + 2, 1)) - 1)) AS v,
         ((strpos('{_jp}', substring(h, 2 * ((i + 1) % 16) + 1, 1)) - 1) * 16
          + (strpos('{_jp}', substring(h, 2 * ((i + 1) % 16) + 2, 1)) - 1))
           AS vn
  FROM m, (SELECT unnest(range(240)) AS i) g
)
SELECT doc_id, CAST(i // 24 AS BIGINT) AS frame_idx,
       CAST(SUM((v - 128) * (v - 128)) AS BIGINT) AS energy,
       CAST(SUM(CASE WHEN i % 24 < 23 AND ((v >= 128) <> (vn >= 128))
                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
       CAST(MAX(ABS(v - 128)) AS BIGINT) AS peak_dev
FROM s GROUP BY doc_id, i // 24
"""

    # multi-channel frame features (round 7): channel c sample i is
    # digest byte (2i + c) mod 16 (the interleaved block-align
    # contract); 6 full 20-sample frames per channel (120 of 128)
    d["multimodal_wav_channel_features"] = f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
s AS (
  SELECT doc_id, c, i,
         ((strpos('{_jp}', substring(h, 2 * ((2 * i + c) % 16) + 1, 1)) - 1)
            * 16
          + (strpos('{_jp}', substring(h, 2 * ((2 * i + c) % 16) + 2, 1))
             - 1)) AS v,
         ((strpos('{_jp}', substring(h, 2 * ((2 * i + 2 + c) % 16) + 1, 1))
             - 1) * 16
          + (strpos('{_jp}', substring(h, 2 * ((2 * i + 2 + c) % 16) + 2, 1))
             - 1)) AS vn
  FROM m,
       (SELECT unnest(range(2)) AS c) ch,
       (SELECT unnest(range(120)) AS i) g
)
SELECT doc_id, CAST(c AS BIGINT) AS channel,
       CAST(i // 20 AS BIGINT) AS frame_idx,
       CAST(SUM((v - 128) * (v - 128)) AS BIGINT) AS energy,
       CAST(SUM(CASE WHEN i % 20 < 19 AND ((v >= 128) <> (vn >= 128))
                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
       CAST(MAX(ABS(v - 128)) AS BIGINT) AS peak_dev
FROM s GROUP BY doc_id, c, i // 20
"""

    # update-mode delta stream (round 7): batch 0 emits its own days
    # (partial count for the straddling day), batch 1 re-emits every
    # day it touches with the cumulative (= final) count — the emitted
    # multiset is the union of those two sets. Batch-1's re-emitted day
    # set is DERIVED from the actual pre-split events (ADVICE r7): the
    # old `day <= split_day` shortcut assumed the straddling day has
    # events on BOTH sides of the split, which is a corpus property,
    # not a semantics one
    d["streaming_update_mode_rollup"] = """
SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events WHERE ts >= TIMESTAMP '2024-01-20 12:00:00'
GROUP BY 1
UNION ALL
SELECT day, n_events FROM (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
) WHERE day IN (SELECT DISTINCT CAST(ts AS DATE) FROM events
                WHERE ts < TIMESTAMP '2024-01-20 12:00:00')
"""

    # REAL BPE tokenizer training (round 7): 8 unrolled merge steps —
    # each picks the (freq-weighted count DESC, l ASC, r ASC) argmax
    # adjacent symbol pair over the vocab and applies it via the SAME
    # literal replace as the engine ('/l//r/' -> '/lr/': every symbol
    # owns its surrounding slashes, so left-to-right non-overlapping
    # replace IS the BPE application convention with no boundary
    # false-matches)
    _bpe_step = lambda n: f"""
sp{n} AS (
  SELECT string_split(trim(s, '/'), '//') AS syms, freq FROM w{n - 1}
),
pr{n} AS (
  SELECT p.l AS l, p.r AS r, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_transform(range(1, len(syms)),
                                 i -> {{'l': syms[i], 'r': syms[i + 1]}}))
             AS p, freq
    FROM sp{n}
  ) GROUP BY 1, 2
),
b{n} AS (SELECT l, r, cnt FROM pr{n}
         ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
w{n} AS (
  SELECT replace(s, '/' || b.l || '//' || b.r || '/',
                 '/' || b.l || b.r || '/') AS s, freq
  FROM w{n - 1}, b{n} b
)"""  # noqa: E731
    d["bpe_train_merges"] = (
        """
WITH w0 AS (
  SELECT regexp_replace(word, '(.)', '/\\1/', 'g') AS s, freq FROM (
    SELECT token AS word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ) WHERE token <> '' AND NOT contains(token, '/')
    GROUP BY token
  )
),"""
        + ",".join(_bpe_step(n) for n in range(1, 9))
        + "\n"
        + "\nUNION ALL\n".join(
            f"SELECT CAST({n} AS BIGINT) AS step, l AS left, r AS right,"
            f" cnt AS pair_count FROM b{n}"
            for n in range(1, 9)
        )
    )
    _BPE_CHAIN = (
        d["bpe_train_merges"].split("\nSELECT CAST(1 AS BIGINT)")[0]
    )

    # BPE encode (round 7): the trained vocab's final symbolization
    # (w8) joined back onto the doc->word incidence — same chain as
    # training, then one join + aggregate
    d["bpe_encode_token_counts"] = (
        _BPE_CHAIN
        + """
, bpe_sized AS (
  SELECT trim(s, '/') AS bare, len(string_split(trim(s, '/'), '//'))
           AS n_syms, s
  FROM w8
), bpe_vocab AS (
  SELECT replace(replace(bare, '//', ''), '/', '') AS word,
         CAST(n_syms AS BIGINT) AS n_syms
  FROM bpe_sized
), bpe_inc AS (
  SELECT doc_id, token AS word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
  ) WHERE token <> '' AND NOT contains(token, '/')
)
SELECT i.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(v.n_syms) AS BIGINT) AS n_bpe_tokens
FROM bpe_inc i JOIN bpe_vocab v ON i.word = v.word
GROUP BY i.doc_id
"""
    )

    # empirical-Bayes shrinkage (round 7): the pinned 1e-9 fixed-point
    # method-of-moments chain, every step one floor DIV over nonneg
    # integers, overflow-prone products in HUGEINT
    d["eb_shrunk_source_quality"] = """
WITH per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT)
           AS k_success
  FROM documents GROUP BY source
),
rates AS (
  SELECT source, n_docs, k_success,
         k_success * 1000000000 // n_docs AS rate_fp
  FROM per
),
mstats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
         CAST(SUM(rate_fp) // COUNT(*) AS BIGINT) AS m_fp
  FROM rates
),
vstats AS (
  SELECT m.n_sources, m.m_fp,
         CASE WHEN m.n_sources >= 2 THEN
           CAST(SUM(CAST(r.rate_fp - m.m_fp AS HUGEINT)
                    * (r.rate_fp - m.m_fp)) // (m.n_sources - 1)
                AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS var_fp
  FROM rates r, mstats m
  GROUP BY m.n_sources, m.m_fp
),
prior AS (
  SELECT m_fp, var_fp,
         CASE WHEN var_fp <= 0 THEN CAST(0 AS BIGINT)
              WHEN CAST(m_fp AS HUGEINT) * (1000000000 - m_fp)
                   * 1000000000
                   >= CAST(1000000001000000000 AS HUGEINT) * var_fp
              THEN CAST(1000000000000000000 AS BIGINT)
              ELSE GREATEST(CAST(0 AS BIGINT),
                            CAST(CAST(m_fp AS HUGEINT)
                                 * (1000000000 - m_fp)
                                 * 1000000000 // var_fp - 1000000000
                                 AS BIGINT))
         END AS apb_fp
  FROM vstats
),
prior2 AS (
  SELECT m_fp, var_fp, apb_fp,
         CAST(CAST(m_fp AS HUGEINT) * apb_fp // 1000000000 AS BIGINT)
           AS a_fp
  FROM prior
)
SELECT r.source, r.n_docs, r.k_success, r.rate_fp,
       CAST(p.a_fp AS BIGINT) AS alpha_fp,
       CAST(p.apb_fp - p.a_fp AS BIGINT) AS beta_fp,
       CAST((CAST(r.k_success AS HUGEINT) * 1000000000 + p.a_fp)
            * 1000000000
            // (CAST(r.n_docs AS HUGEINT) * 1000000000 + p.apb_fp)
            AS BIGINT) AS shrunk_rate_fp
FROM rates r, prior2 p
"""

    # dataset card (round 7): long-format exact-BIGINT corpus facts;
    # the median is the (50n+99)//100 order statistic at value grain
    d["dataset_card_report"] = """
WITH med AS (
  SELECT MIN(n_chars) AS v FROM (
    SELECT n_chars,
           SUM(c) OVER (ORDER BY n_chars ASC ROWS UNBOUNDED PRECEDING)
             AS cum,
           SUM(c) OVER () AS n
    FROM (SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS c
          FROM documents GROUP BY 1)
  ) WHERE cum >= (50 * n + 99) // 100
)
SELECT 'n_docs' AS metric, CAST(COUNT(*) AS BIGINT) AS value FROM documents
UNION ALL SELECT 'n_tokens',
  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) FROM documents
UNION ALL SELECT 'n_sources',
  CAST(COUNT(DISTINCT source) AS BIGINT) FROM documents
UNION ALL SELECT 'n_langs',
  CAST(COUNT(DISTINCT lang) AS BIGINT) FROM documents
UNION ALL SELECT 'total_chars', CAST(SUM(n_chars) AS BIGINT) FROM documents
UNION ALL SELECT 'median_doc_chars', CAST(v AS BIGINT) FROM med
UNION ALL SELECT 'n_events', CAST(COUNT(*) AS BIGINT) FROM events
UNION ALL SELECT 'n_event_users',
  CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events
UNION ALL SELECT 'n_event_days',
  CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) FROM events
UNION ALL SELECT 'n_orders', CAST(COUNT(*) AS BIGINT) FROM orders
UNION ALL SELECT 'n_order_customers',
  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders
"""

    # BPE-count sequence packing (round 7): the pack window over the
    # encode oracle's real per-doc counts
    d["pack_bpe_token_shards"] = f"""
SELECT doc_id, source, n_bpe_tokens,
       CAST(cum - n_bpe_tokens AS BIGINT) AS tokens_before,
       CAST((cum - n_bpe_tokens) // 512 AS BIGINT) AS pack_id
FROM (
  SELECT d.doc_id, d.source, e.n_bpe_tokens,
         SUM(e.n_bpe_tokens) OVER (
           PARTITION BY d.source ORDER BY d.doc_id ASC
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents d JOIN ({d['bpe_encode_token_counts']}) e
    ON d.doc_id = e.doc_id
)
"""

    # streaming late-data audit (round 7): replay of the two-batch
    # arrival order in arithmetic — a late row of day d survives iff
    # its window end (in Spark's millisecond event-time clock) is newer
    # than max(ts) - 14d; on-time rows (ts >= the calendar split) are
    # never dropped; fully-dropped days surface with n_streamed = 0
    d["streaming_late_data_audit"] = """
WITH mx AS (SELECT MAX(ts) AS max_ts FROM events),
truth AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_total
  FROM events GROUP BY 1
),
streamed AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events, mx
  WHERE ts >= TIMESTAMP '2024-01-20'
     OR epoch_ms(CAST(CAST(ts AS DATE) + 1 AS TIMESTAMP))
        > epoch_us(max_ts) // 1000 - 1209600000
  GROUP BY 1
)
SELECT t.day, t.n_total,
       CAST(COALESCE(s.n, 0) AS BIGINT) AS n_streamed,
       CAST(t.n_total - COALESCE(s.n, 0) AS BIGINT) AS n_dropped_late
FROM truth t LEFT JOIN streamed s ON t.day = s.day
"""

    # incremental delivery + checkpoint restart must be emission-
    # indistinguishable from the one-run replay (both tranches test
    # against the same persisted watermark) — the SQL is reused
    # VERBATIM; a lost watermark or lost state hash-mismatches it
    d["streaming_incremental_late_audit"] = d["streaming_late_data_audit"]

    # multi-size thumbnail grid (VERDICT r7 item 8): decode once, emit
    # one row per size; each thumbnail of the four-uniform-quadrant
    # 32x32 source is a closed-form block grid under the pinned
    # (r*src DIV out) nearest-neighbor map — top/left block counts per
    # size: 16x16 -> 8/8, 10x7 -> 5/4, 8x8 -> 4/4, 5x4 -> 3/2
    d["multimodal_thumbnail_grid"] = (
        _color_chain
        + """
SELECT doc_id, CAST(0 AS BIGINT) AS grid_idx,
       CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
       CAST(768 AS BIGINT) AS n_px_bytes,
       sha256(repeat(repeat(x0, 8) || repeat(x1, 8), 8)
              || repeat(repeat(x2, 8) || repeat(x3, 8), 8)) AS pixel_sha
FROM piv
UNION ALL
SELECT doc_id, CAST(1 AS BIGINT), CAST(10 AS BIGINT), CAST(7 AS BIGINT),
       CAST(210 AS BIGINT),
       sha256(repeat(repeat(x0, 5) || repeat(x1, 5), 4)
              || repeat(repeat(x2, 5) || repeat(x3, 5), 3))
FROM piv
UNION ALL
SELECT doc_id, CAST(2 AS BIGINT), CAST(8 AS BIGINT), CAST(8 AS BIGINT),
       CAST(192 AS BIGINT),
       sha256(repeat(repeat(x0, 4) || repeat(x1, 4), 4)
              || repeat(repeat(x2, 4) || repeat(x3, 4), 4))
FROM piv
UNION ALL
SELECT doc_id, CAST(3 AS BIGINT), CAST(5 AS BIGINT), CAST(4 AS BIGINT),
       CAST(60 AS BIGINT),
       sha256(repeat(repeat(x0, 3) || repeat(x1, 2), 2)
              || repeat(repeat(x2, 3) || repeat(x3, 2), 2))
FROM piv
"""
    )

    # tokenizer fertility per source: the trained-vocab chain reused
    # verbatim; ratios are exact fixed-point over BIGINT sums
    d["bpe_fertility_report"] = (
        _BPE_CHAIN
        + """
, bpe_sized AS (
  SELECT trim(s, '/') AS bare, len(string_split(trim(s, '/'), '//'))
           AS n_syms, s
  FROM w8
), bpe_vocab AS (
  SELECT replace(replace(bare, '//', ''), '/', '') AS word,
         CAST(n_syms AS BIGINT) AS n_syms
  FROM bpe_sized
), inc AS (
  SELECT doc_id, source, token AS word FROM (
    SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
    FROM documents
  ) WHERE token <> '' AND NOT contains(token, '/')
)
SELECT i.source,
       CAST(COUNT(DISTINCT i.doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(v.n_syms) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(strlen(i.word)) AS BIGINT) AS n_utf8_bytes,
       CAST(SUM(v.n_syms) * 1000000 // COUNT(*) AS BIGINT)
         AS fertility_fp,
       CAST(SUM(strlen(i.word)) * 1000000 // SUM(v.n_syms) AS BIGINT)
         AS bytes_per_token_fp
FROM inc i JOIN bpe_vocab v ON i.word = v.word
GROUP BY i.source
"""
    )

    # GPT-3-style 13-gram decontamination audit; list slice [i:i+12] is
    # inclusive on both ends = 13 tokens, matching Spark slice(toks,i,13)
    d["benchmark_contamination_13gram"] = """
WITH g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, len(toks) - 11),
           i -> array_to_string(toks[i:i+12], ' ')))) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
  WHERE len(toks) >= 13
),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 31 = 0),
train AS (SELECT * FROM g WHERE doc_id % 31 <> 0),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
  FROM train GROUP BY 1
),
hits AS (
  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bench_hits
  FROM train t JOIN bench b ON t.gram = b.gram GROUP BY 1
)
SELECT h.doc_id, p.n_grams, h.n_bench_hits
FROM hits h JOIN per_doc p USING (doc_id)
"""

    # DSIR importance weights: integer log2(p_tgt/p_src) via bit
    # lengths, add-one smoothing over the corpus vocab; the per-token
    # average uses the nonnegative-shift floor (Spark DIV truncates
    # toward zero, DuckDB // floors — the shift makes them agree)
    d["dsir_importance_weights"] = """
WITH inc AS (
  SELECT doc_id, lang, token AS word FROM (
    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
    FROM documents
  ) WHERE token <> ''
),
src AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c_src FROM inc GROUP BY 1),
tgt AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c_tgt FROM inc
        WHERE lang = 'en' GROUP BY 1),
scal AS (
  SELECT (SELECT SUM(c_src) FROM src) AS n_src,
         (SELECT COUNT(*) FROM src) AS v,
         (SELECT SUM(c_tgt) FROM tgt) AS n_tgt
),
dic AS (
  SELECT s.word,
         CAST(((length(bin(n_src + v)) - 1) - (length(bin(c_src + 1)) - 1))
            - ((length(bin(n_tgt + v)) - 1)
               - (length(bin(COALESCE(t.c_tgt, 0) + 1)) - 1))
              AS BIGINT) AS bits
  FROM src s LEFT JOIN tgt t USING (word), scal
)
SELECT i.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(d.bits) AS BIGINT) AS dsir_bits,
       CAST((SUM(d.bits) * 1000 + COUNT(*) * 100000) // COUNT(*)
            - 100000 AS BIGINT) AS avg_millibits
FROM inc i JOIN dic d USING (word) GROUP BY 1
"""

    # per-source unigram entropy, bit-length log2 convention
    d["unigram_entropy_per_source"] = """
WITH wc AS (
  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE word <> '' GROUP BY 1, 2
),
tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens FROM wc GROUP BY 1)
SELECT w.source, t.n_tokens,
       CAST(SUM(w.c * ((length(bin(t.n_tokens)) - 1)
                       - (length(bin(w.c)) - 1))) AS BIGINT) AS total_bits,
       CAST(SUM(w.c * ((length(bin(t.n_tokens)) - 1)
                       - (length(bin(w.c)) - 1))) * 1000 // t.n_tokens
            AS BIGINT) AS milli_bits_per_token
FROM wc w JOIN tot t USING (source) GROUP BY w.source, t.n_tokens
"""

    # REAL GIF decode (round 8): lossless, so the oracle rebuilds the
    # denoted raster arithmetically — ascii code v of each md5 hex char
    # maps to the fixed 256-entry palette triple (v, 7v%256, 13v%256)
    d["multimodal_gif_decode"] = """
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
tr AS (
  SELECT doc_id, i,
         printf('%02x%02x%02x', v, (7 * v) % 256, (13 * v) % 256) AS t
  FROM (SELECT doc_id, i,
               ascii(substring(h, i + 1, 1)) AS v
        FROM m, (SELECT unnest(range(32)) AS i) g)
),
hexes AS (SELECT doc_id, string_agg(t, '' ORDER BY i) AS row32
          FROM tr GROUP BY doc_id)
SELECT doc_id, CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
       CAST(768 AS BIGINT) AS n_px_bytes,
       sha256(repeat(row32, 8)) AS pixel_sha
FROM hexes
"""

    # chained stateful ops: batch join + day rollup == the complete
    # emission of the join->window streaming chain under the flush
    # protocol; revenue in exact cents
    d["streaming_join_then_rollup"] = """
WITH conv AS (
  SELECT c.ts AS click_ts, p.value AS v
  FROM events c JOIN events p
    ON c.user_id = p.user_id
   AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
  WHERE c.event_type = 'click' AND p.event_type = 'purchase'
)
SELECT CAST(click_ts AS DATE) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(SUM(CAST(CAST(v AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM conv GROUP BY 1
"""

    # per-dimension embedding ANALYZE: fixed-point floor(x*1e9) elements
    # (bit-identical IEEE multiply+floor), nonnegative-shift mean floor,
    # Cauchy-Schwarz-nonnegative variance numerator in HUGEINT
    d["embedding_stats_per_dim"] = """
WITH vals AS (
  SELECT CAST(j + 1 AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[j + 1] AS DOUBLE) * 1000000000)
              AS BIGINT) AS v_fp
  FROM embeddings, (SELECT unnest(range(64)) AS j) g
),
agg AS (
  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(v_fp AS HUGEINT)) AS s,
         SUM(CAST(v_fp AS HUGEINT) * v_fp) AS ssq
  FROM vals GROUP BY 1
)
SELECT dim, n, CAST(s AS BIGINT) AS sum_fp,
       CAST((s + CAST(n AS HUGEINT) * 10000000000) // n
            - 10000000000 AS BIGINT) AS mean_fp,
       CAST((CAST(n AS HUGEINT) * ssq - s * s)
            // (CAST(n AS HUGEINT) * n * 1000000000) AS BIGINT) AS var_fp
FROM agg
"""

    # ANN recall@k: both arms' oracle SQL composed VERBATIM as
    # subqueries, joined on (query, neighbor)
    d["ivf_recall_report"] = f"""
WITH e AS (SELECT * FROM ({d["similarity_topk"]}) ex),
a AS (SELECT * FROM ({d["similarity_topk_ivf"]}) iv),
ek AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS k_exact
       FROM e GROUP BY 1),
h AS (SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM e JOIN a ON e.query_id = a.query_id
                   AND e.neighbor_id = a.neighbor_id
      GROUP BY 1)
SELECT ek.query_id, ek.k_exact,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) * 1000 // ek.k_exact AS BIGINT)
         AS recall_millis
FROM ek LEFT JOIN h ON ek.query_id = h.query_id
"""

    # duplicate-cluster size histogram over the production LSH
    # components; bit-length bins (the degree-histogram convention)
    d["near_dup_cluster_size_histogram"] = f"""
WITH cc AS (SELECT * FROM ({d["near_dup_clusters_lsh"]}) q),
sizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS size
          FROM cc GROUP BY 1)
SELECT CAST(length(bin(size)) - 1 AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(MIN(size) AS BIGINT) AS min_size,
       CAST(MAX(size) AS BIGINT) AS max_size,
       CAST(SUM(size) AS BIGINT) AS n_docs
FROM sizes GROUP BY 1
"""

    # lang-ID confusion matrix: the classifier oracle composed verbatim
    d["lang_confusion_matrix"] = f"""
WITH pred AS (SELECT * FROM ({d["lang_id"]}) p),
cells AS (
  SELECT labeled_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2
),
totals AS (
  SELECT labeled_lang, CAST(COUNT(*) AS BIGINT) AS n_labeled
  FROM pred GROUP BY 1
)
SELECT c.labeled_lang, c.predicted_lang, c.n, t.n_labeled,
       CAST(c.n * 1000 // t.n_labeled AS BIGINT) AS share_millis
FROM cells c JOIN totals t USING (labeled_lang)
"""

    # Cohen's kappa: the same classifier oracle, folded to the exact
    # rational chance-corrected agreement; sign split so every floor
    # division is nonnegative, products in HUGEINT
    d["cohens_kappa_langid"] = f"""
WITH pred AS (SELECT labeled_lang, predicted_lang FROM ({d["lang_id"]}) p),
cells AS (
  SELECT labeled_lang, predicted_lang, CAST(COUNT(*) AS HUGEINT) AS n
  FROM pred GROUP BY 1, 2
),
r AS (SELECT labeled_lang AS k, SUM(n) AS r FROM cells GROUP BY 1),
c AS (SELECT predicted_lang AS k, SUM(n) AS c FROM cells GROUP BY 1),
t AS (
  SELECT (SELECT SUM(n) FROM cells) AS n_docs,
         (SELECT COALESCE(SUM(n), 0) FROM cells
          WHERE labeled_lang = predicted_lang) AS n_agree,
         (SELECT COALESCE(SUM(r.r * c.c), 0)
          FROM r JOIN c USING (k)) AS sum_rc
)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_agree AS BIGINT) AS n_agree,
       CAST(1000000 * n_agree // n_docs AS BIGINT) AS accuracy_ppm,
       CAST(1000000 * sum_rc // (n_docs * n_docs) AS BIGINT)
         AS chance_ppm,
       CAST(CASE WHEN n_docs * n_docs = sum_rc THEN 0
            WHEN n_docs * n_agree >= sum_rc THEN
              1000000 * (n_docs * n_agree - sum_rc)
                // (n_docs * n_docs - sum_rc)
            ELSE -(1000000 * (sum_rc - n_docs * n_agree)
                // (n_docs * n_docs - sum_rc)) END AS BIGINT)
         AS kappa_ppm
FROM t
"""

    # feature hashing: md5 bucket fold (the engine-independent hash
    # convention), long-format per-bucket term frequencies
    d["hashed_tf_features"] = f"""
WITH toks AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE token <> ''
)
SELECT doc_id,
       CAST({_hex_u32("md5(token)", 1)} % 32 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS tf
FROM toks GROUP BY 1, 2
"""

    # z-order vs linear file skipping: ROW_NUMBER file assignment over
    # each layout order, integer min/max envelopes, closed-interval box
    # overlap; the zkey construction is the zorder_key oracle verbatim
    d["zorder_skipping_report"] = f"""
WITH z AS (SELECT * FROM ({d["zorder_key"]}) zz),
zf AS (
  SELECT 'zorder' AS layout,
         (ROW_NUMBER() OVER (ORDER BY zkey ASC, o_orderkey ASC) - 1)
           // 4096 AS file_id,
         cust_bucket, day_bucket
  FROM z
  UNION ALL
  SELECT 'linear',
         (ROW_NUMBER() OVER (ORDER BY day_bucket ASC, o_orderkey ASC) - 1)
           // 4096,
         cust_bucket, day_bucket
  FROM z
),
env AS (
  SELECT layout, file_id,
         MIN(cust_bucket) AS min_x, MAX(cust_bucket) AS max_x,
         MIN(day_bucket) AS min_y, MAX(day_bucket) AS max_y,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM zf GROUP BY 1, 2
),
hits AS (
  SELECT layout, n_rows,
         CASE WHEN max_x >= 64 AND min_x <= 127
               AND max_y >= 100 AND min_y <= 163
              THEN 1 ELSE 0 END AS hit
  FROM env
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(hit) AS BIGINT) AS n_files_scanned,
       CAST(SUM(hit * n_rows) AS BIGINT) AS rows_scanned,
       CAST((COUNT(*) - SUM(hit)) * 1000 // COUNT(*) AS BIGINT)
         AS skip_millis
FROM hits GROUP BY 1
"""

    # MinHash estimator-vs-exact audit over the banded candidate set:
    # the signature CTEs reused verbatim, per-pair integer arithmetic
    _agree32 = " + ".join(
        f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)" for i in range(32)
    )
    d["minhash_estimate_error_audit"] = f"""
WITH {_minhash_ctes()},
ag AS (
  SELECT c.doc_a, c.doc_b, CAST({_agree32} AS BIGINT) AS sig_agree
  FROM cand c
  JOIN sig a ON a.doc_id = c.doc_a
  JOIN sig b ON b.doc_id = c.doc_b
),
ex AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT)
           AS n_inter,
         CAST(len(sa.shingles) + len(sb.shingles)
              - len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT)
           AS n_union
  FROM cand c
  JOIN d sa ON sa.doc_id = c.doc_a
  JOIN d sb ON sb.doc_id = c.doc_b
)
SELECT g.doc_a, g.doc_b, g.sig_agree, e.n_inter, e.n_union,
       CAST(g.sig_agree * 1000 // 32 AS BIGINT) AS est_millis,
       CAST(e.n_inter * 1000 // e.n_union AS BIGINT) AS jac_millis,
       CAST(abs(g.sig_agree * 1000 // 32
                - e.n_inter * 1000 // e.n_union) AS BIGINT) AS err_millis
FROM ag g JOIN ex e ON g.doc_a = e.doc_a AND g.doc_b = e.doc_b
"""

    # progressive JPEG: spectral selection reconstructs the EXACT
    # baseline coefficient array, so the closed-form lossy chain is the
    # baseline decode oracle VERBATIM
    d["multimodal_progressive_jpeg_decode"] = d["multimodal_jpeg_decode"]
    # DC successive approximation also reconstructs exactly:
    # (dc >> 1) << 1 | (dc & 1) == dc in two's complement
    d["multimodal_progressive_sa_jpeg_decode"] = d["multimodal_jpeg_decode"]

    # AC-band successive approximation (round 9): the fixture is a STEP
    # block (left half a, right half b), NOT uniform — uniform blocks
    # have no AC coefficients and would leave the refinement machinery
    # vacuous. The FDCT of a y-constant x-step block is nonzero ONLY at
    # (0,v), v in {0,1,3,5,7}: acc0 = 23168*11584*(A+B) and
    # acc_v = 23168*L_v*(A-B) with the half-block cosine sums
    # L1=10498, L3=-3686, L5=2464, L7=-2088 (odd rows of the 4096-scale
    # cosine table are antisymmetric; even rows cancel on each half).
    # Each coefficient walks the codec's exact rounding chain
    # (half-away-from-zero DCT scale, half-away quantize by the Annex-K
    # row 16/11/16/40/61, dequantize), and each of the 8 distinct pixel
    # columns is the fixed-point IDCT row closed form
    # clip(128 + floor((2896*(f0*2896 + sum f_v*T_v[x]) + HALF)/SCALE)).
    # Verified equal to the real encoder+decoder for 509 (a,b) pairs at
    # build time; refinement reconstructs coefficients exactly, so this
    # IS the decoded raster. DuckDB's // truncates toward zero, so the
    # IDCT floor uses the explicit negative-branch form.
    _sa_t = {
        1: (4017, 3406, 2276, 799, -799, -2276, -3406, -4017),
        3: (3406, -799, -4017, -2276, 2276, 4017, 799, -3406),
        5: (2276, -4017, 799, 3406, -3406, -799, 4017, -2276),
        7: (799, -2276, 3406, -4017, 4017, -3406, 2276, -799),
    }
    _sa_px = []
    for _x in range(8):
        _t = (
            f"2896 * (f0 * 2896 + f1 * ({_sa_t[1][_x]}) + f3 * ({_sa_t[3][_x]})"
            f" + f5 * ({_sa_t[5][_x]}) + f7 * ({_sa_t[7][_x]})) + 33554432"
        )
        _sa_px.append(
            f"LEAST(255, GREATEST(0, 128 + (CASE WHEN ({_t}) >= 0"
            f" THEN ({_t}) // 67108864"
            f" ELSE -((-({_t}) + 67108863) // 67108864) END))) AS px{_x}"
        )
    _sa_pxcols = ",\n         ".join(_sa_px)
    _sa_hex = lambda c: (  # noqa: E731 — 2-char lowercase hex of column c
        f"(substring('{_jp}', {c} // 16 + 1, 1)"
        f" || substring('{_jp}', {c} % 16 + 1, 1))"
    )
    _sa_rowhex = " || ".join(_sa_hex(f"px{_x}") for _x in range(8))

    def _sa_round(col: str) -> str:
        # fixed-point scale-down: round half away from zero
        return (
            f"CASE WHEN {col} >= 0 THEN ({col} + 33554432) // 67108864"
            f" ELSE -((-{col} + 33554432) // 67108864) END"
        )

    def _sa_quant(col: str, q: int) -> str:
        # quantize half away from zero, then dequantize
        return (
            f"(CASE WHEN {col} >= 0 THEN ({col} + {q // 2}) // {q}"
            f" ELSE -((-{col} + {q // 2}) // {q}) END) * {q}"
        )

    d["multimodal_progressive_ac_refine_decode"] = f"""
WITH base AS (
  SELECT doc_id, md5(text) AS m FROM documents
), blk AS (
  SELECT doc_id, CAST(g.i AS INTEGER) AS bi,
         {_cjb('2 * g.i')} AS av,
         {_cjb('2 * g.i + 1')} AS bv
  FROM base, (SELECT unnest(range(4)) AS i) g
), ac AS (
  SELECT doc_id, bi,
         268378112 * (av + bv - 256) AS a0,
         243217664 * (av - bv) AS a1,
         -85397248 * (av - bv) AS a3,
         57085952 * (av - bv) AS a5,
         -48374784 * (av - bv) AS a7
  FROM blk
), cf AS (
  SELECT doc_id, bi,
         {_sa_round('a0')} AS c0,
         {_sa_round('a1')} AS c1,
         {_sa_round('a3')} AS c3,
         {_sa_round('a5')} AS c5,
         {_sa_round('a7')} AS c7
  FROM ac
), fq AS (
  SELECT doc_id, bi,
         {_sa_quant('c0', 16)} AS f0,
         {_sa_quant('c1', 11)} AS f1,
         {_sa_quant('c3', 16)} AS f3,
         {_sa_quant('c5', 40)} AS f5,
         {_sa_quant('c7', 61)} AS f7
  FROM cf
), pxs AS (
  SELECT doc_id, bi,
         {_sa_pxcols}
  FROM fq
), rh AS (
  SELECT doc_id, bi, {_sa_rowhex} AS rowhex FROM pxs
), asm AS (
  SELECT doc_id,
         MAX(CASE WHEN bi = 0 THEN rowhex END) AS r0,
         MAX(CASE WHEN bi = 1 THEN rowhex END) AS r1,
         MAX(CASE WHEN bi = 2 THEN rowhex END) AS r2,
         MAX(CASE WHEN bi = 3 THEN rowhex END) AS r3
  FROM rh GROUP BY doc_id
)
SELECT doc_id,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST(256 AS BIGINT) AS n_px_bytes,
       sha256(repeat(r0 || r1, 8) || repeat(r2 || r3, 8)) AS pixel_sha
FROM asm
"""

    # IMA ADPCM encode -> decode round-trip (round 8): the lossy state
    # machine replayed step for step in a 128-deep recursive CTE —
    # quantize (3 threshold bits against the step size) then
    # reconstruct (the decoder's dequantized delta + int16/index
    # clamps); even the distortion err_sq is hash-exact. n_wav_bytes
    # pins the RIFF framing: 12 hdr + 28 fmt + 12 fact + 76 data = 128
    _steps89 = (
        "[7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,45,50,"
        "55,60,66,73,80,88,97,107,118,130,143,157,173,190,209,230,253,"
        "279,307,337,371,408,449,494,544,598,658,724,796,876,963,1060,"
        "1166,1282,1411,1552,1707,1878,2066,2272,2499,2749,3024,3327,"
        "3660,4026,4428,4871,5358,5894,6484,7132,7845,8630,9493,10442,"
        "11487,12635,13899,15289,16818,18500,20350,22385,24623,27086,"
        "29794,32767]"
    )
    _byte_j = (
        f"((strpos('{_jp}', substring(h, 2 * (({{j}}) % 16) + 1, 1)) - 1)"
        f" * 16"
        f" + (strpos('{_jp}', substring(h, 2 * (({{j}}) % 16) + 2, 1)) - 1))"
    )
    d["multimodal_adpcm_roundtrip"] = f"""
WITH RECURSIVE m AS (SELECT doc_id, md5(text) AS h FROM documents),
smp AS (
  SELECT doc_id,
         list_transform(range(128), i ->
           CAST(({_byte_j.format(j="2 * i")} - 128) * 255
                + ({_byte_j.format(j="2 * i + 1")} - 128) AS BIGINT)) AS s
  FROM m
),
adp(doc_id, i, pred, idx, abs_sum, err_sq) AS (
  SELECT doc_id, 1, s[1], 0, CAST(abs(s[1]) AS BIGINT), CAST(0 AS BIGINT)
  FROM smp
  UNION ALL
  SELECT doc_id, i + 1, new_pred, new_idx,
         abs_sum + abs(new_pred),
         err_sq + (sv - new_pred) * (sv - new_pred)
  FROM (
    SELECT l5.*,
           CASE WHEN diff < 0 THEN GREATEST(-32768, pred - diffq)
                ELSE LEAST(32767, pred + diffq) END AS new_pred,
           LEAST(88, GREATEST(0, idx +
             [-1,-1,-1,-1,2,4,6,8][b4 * 4 + b2 * 2 + b1 + 1])) AS new_idx
    FROM (
      SELECT l4.*,
             step // 8 + b4 * step + b2 * (step // 2)
               + b1 * (step // 4) AS diffq
      FROM (
        SELECT l3.*,
               CASE WHEN r2 >= step // 4 THEN 1 ELSE 0 END AS b1
        FROM (
          SELECT l2.*,
                 CASE WHEN r1 >= step // 2 THEN 1 ELSE 0 END AS b2,
                 r1 - (CASE WHEN r1 >= step // 2 THEN 1 ELSE 0 END)
                   * (step // 2) AS r2
          FROM (
            SELECT l1.*,
                   CASE WHEN ad >= step THEN 1 ELSE 0 END AS b4,
                   ad - (CASE WHEN ad >= step THEN 1 ELSE 0 END) * step
                     AS r1
            FROM (
              SELECT a.doc_id, a.i, a.pred, a.idx, a.abs_sum, a.err_sq,
                     p.s[a.i + 1] AS sv,
                     p.s[a.i + 1] - a.pred AS diff,
                     abs(p.s[a.i + 1] - a.pred) AS ad,
                     {_steps89}[a.idx + 1] AS step
              FROM adp a JOIN smp p USING (doc_id)
              WHERE a.i < 128
            ) l1
          ) l2
        ) l3
      ) l4
    ) l5
  )
)
SELECT doc_id,
       CAST(128 AS BIGINT) AS n_samples,
       CAST(128 AS BIGINT) AS n_wav_bytes,
       CAST(abs_sum AS BIGINT) AS sum_abs_recon,
       CAST(err_sq AS BIGINT) AS err_sq,
       CAST(pred AS BIGINT) AS final_pred
FROM adp WHERE i = 128
"""

    # interlacing is pure row reordering -> decoded raster identical
    d["multimodal_gif_interlaced_decode"] = d["multimodal_gif_decode"]

    # animated GIF frame extraction: per-frame rasters rebuilt
    # arithmetically from md5(text#f) through the fixed palette
    d["multimodal_gif_animation_frames"] = f"""
WITH fr AS (
  SELECT doc_id, f, md5(text || '#' || CAST(f AS VARCHAR)) AS h
  FROM documents, (SELECT unnest(range(3)) AS f) g
),
tr AS (
  SELECT doc_id, f, i,
         printf('%02x%02x%02x', v, (7 * v) % 256, (13 * v) % 256) AS t
  FROM (SELECT doc_id, f, i, ascii(substring(h, i + 1, 1)) AS v
        FROM fr, (SELECT unnest(range(32)) AS i) gi)
),
hexes AS (SELECT doc_id, f, string_agg(t, '' ORDER BY i) AS row32
          FROM tr GROUP BY 1, 2)
SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
       CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
       sha256(repeat(row32, 8)) AS pixel_sha
FROM hexes
"""

    # DSIR end-to-end: the scoring oracle composed verbatim, rank
    # selection == ROW_NUMBER over the same tie-broken order
    d["dsir_resample_corpus"] = f"""
WITH sc AS (SELECT * FROM ({d["dsir_importance_weights"]}) s),
r AS (
  SELECT doc_id, n_tokens, dsir_bits,
         CAST(ROW_NUMBER() OVER (ORDER BY dsir_bits DESC, doc_id ASC)
              AS BIGINT) AS sel_rank
  FROM sc
),
n AS (SELECT COUNT(*) AS n_docs FROM sc)
SELECT doc_id, n_tokens, dsir_bits, sel_rank
FROM r, n WHERE sel_rank <= n.n_docs * 25 // 100
"""

    # curriculum phases/steps == plain NTILE/ROW_NUMBER over the same
    # tie-broken total order (the two-phase machinery is bit-identical)
    d["curriculum_order_assignment"] = """
SELECT doc_id, n_chars,
       CAST(NTILE(4) OVER w AS BIGINT) AS phase,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS step
FROM documents
WINDOW w AS (ORDER BY n_chars ASC, doc_id ASC)
"""

    # integer bigram surprisal (round 7): bit-length log2 convention
    # (length(bin(x)) - 1, the degree-histogram rule); docs with < 2
    # tokens have no bigrams and are absent on both engines
    d["bigram_surprisal_score"] = """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
bi_doc AS (
  SELECT doc_id, p.tx AS tx, p.ty AS ty FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks)),
                                 i -> {'tx': toks[i], 'ty': toks[i + 1]}))
             AS p
    FROM docs
  ) WHERE p.tx <> '' AND p.ty <> ''
),
bi_cnt AS (
  SELECT tx, ty, CAST(COUNT(*) AS BIGINT) AS n_xy
  FROM bi_doc GROUP BY 1, 2
),
prefix AS (SELECT tx, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM bi_cnt GROUP BY tx),
vocab AS (
  SELECT b.tx, b.ty,
         CAST((length(bin(p.n_x)) - 1) - (length(bin(b.n_xy)) - 1)
              AS BIGINT) AS bits
  FROM bi_cnt b JOIN prefix p ON b.tx = p.tx
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(v.bits) AS BIGINT) AS surprisal_bits,
       CAST(SUM(v.bits) * 1000 // COUNT(*) AS BIGINT) AS avg_millibits
FROM bi_doc d JOIN vocab v ON d.tx = v.tx AND d.ty = v.ty
GROUP BY d.doc_id
"""

    # CCNet perplexity bucketing: the surprisal oracle composed VERBATIM
    # as the score CTE, then exact per-source rank cuts at 30%/60% under
    # the total (score, doc_id) tie-break
    d["perplexity_bucket_report"] = f"""
WITH scores AS (
  SELECT * FROM ({d["bigram_surprisal_score"]}) s0
), j AS (
  SELECT s.doc_id, s.n_bigrams, s.avg_millibits, dd.source
  FROM scores s JOIN documents dd ON s.doc_id = dd.doc_id
), r AS (
  SELECT source, doc_id, n_bigrams, avg_millibits,
         ROW_NUMBER() OVER (PARTITION BY source
           ORDER BY avg_millibits ASC, doc_id ASC) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS n_src
  FROM j
)
SELECT source,
       CASE WHEN rk <= 3 * n_src // 10 THEN 'head'
            WHEN rk <= 6 * n_src // 10 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
       CAST(MIN(avg_millibits) AS BIGINT) AS min_millibits,
       CAST(MAX(avg_millibits) AS BIGINT) AS max_millibits
FROM r GROUP BY 1, 2
"""

    # isotonic regression (round 7): the minimax representation
    # fit(i) = max_{j<=i} min_{k>=i} mean(j..k) in 1e-6 fixed point —
    # floor∘scale is monotone, so this equals floor(1e6 * PAV fit)
    # exactly (prototype swept 300 random instances against an exact
    # Fraction PAV; a python replay test pins it in CI)
    d["isotonic_revenue_curve"] = """
WITH per AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS x,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS cents
  FROM orders GROUP BY o_custkey
), lev AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS w, CAST(SUM(cents) AS BIGINT) AS s
  FROM per GROUP BY x
), idx AS (
  SELECT x, w, s,
         ROW_NUMBER() OVER (ORDER BY x ASC) AS i,
         SUM(w) OVER (ORDER BY x ASC) AS cw,
         SUM(s) OVER (ORDER BY x ASC) AS cs
  FROM lev
), pairs AS (
  SELECT l.j, r.k,
         CAST(CAST(r.sk - l.sp AS HUGEINT) * 1000000
              // (r.ck - l.wp) AS BIGINT) AS afp
  FROM (SELECT i AS j, cw - w AS wp, cs - s AS sp FROM idx) l
  JOIN (SELECT i AS k, cw AS ck, cs AS sk FROM idx) r ON l.j <= r.k
), inner_min AS (
  SELECT p.j, c.i, MIN(p.afp) AS mn
  FROM pairs p JOIN (SELECT i FROM idx) c
    ON p.j <= c.i AND p.k >= c.i
  GROUP BY p.j, c.i
), fit AS (
  SELECT i, MAX(mn) AS iso_fit_fp FROM inner_min GROUP BY i
)
SELECT CAST(idx.x AS BIGINT) AS n_orders,
       CAST(idx.w AS BIGINT) AS n_customers,
       CAST(idx.s AS BIGINT) AS sum_cents,
       CAST(fit.iso_fit_fp AS BIGINT) AS iso_fit_fp
FROM idx JOIN fit ON idx.i = fit.i
"""

    # join-key skew audit (round 6): exact order-statistic percentiles
    # over the per-key counts, ceil arithmetic for the salt factor —
    # the same (cnt ASC, key DESC) rank frame as the engine
    _skew_rel = lambda rel, key: f"""
SELECT relation, join_key, n_rows, n_keys, hot_key, max_key_rows,
       p50_key_rows, p99_key_rows,
       CAST(max_key_rows * 1000000 // n_rows AS BIGINT) AS top1_share_ppm,
       CAST((max_key_rows * n_keys + n_rows - 1) // n_rows AS BIGINT)
         AS salt_factor
FROM (
  SELECT '{rel}' AS relation, '{key}' AS join_key,
         t.n_rows, t.n_keys,
         CAST(MAX(CASE WHEN rn = t.n_keys THEN k END) AS BIGINT) AS hot_key,
         CAST(MAX(CASE WHEN rn = t.n_keys THEN cnt END) AS BIGINT)
           AS max_key_rows,
         CAST(MAX(CASE WHEN rn = t.t50 THEN cnt END) AS BIGINT)
           AS p50_key_rows,
         CAST(MAX(CASE WHEN rn = t.t99 THEN cnt END) AS BIGINT)
           AS p99_key_rows
  FROM (
    SELECT k, cnt, ROW_NUMBER() OVER (ORDER BY cnt ASC, k DESC) AS rn
    FROM (SELECT {key} AS k, COUNT(*) AS cnt FROM {rel} GROUP BY 1)
  ) r, (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           (50 * COUNT(*) + 99) // 100 AS t50,
           (99 * COUNT(*) + 99) // 100 AS t99
    FROM (SELECT {key} AS k, COUNT(*) AS cnt FROM {rel} GROUP BY 1)
  ) t
  GROUP BY t.n_rows, t.n_keys
)"""  # noqa: E731
    d["shuffle_skew_report"] = "\nUNION ALL\n".join(
        _skew_rel(rel, key)
        for rel, key in (
            ("lineitem", "l_partkey"),
            ("orders", "o_custkey"),
            ("events", "user_id"),
        )
    )

    # composite-key skew audit + AQE skew-join recommendation (round 7):
    # same rank frame over a '|'-joined string key; aqe_skew_flag is the
    # default skewedPartitionFactor=5 rule, aqe_threshold_rows the
    # row-denominated skewedPartitionThresholdInBytes recommendation
    _skew_comp = lambda rel, label, kexpr: f"""
SELECT relation, join_key, n_rows, n_keys, hot_key, max_key_rows,
       p50_key_rows, p99_key_rows,
       CAST(max_key_rows * 1000000 // n_rows AS BIGINT) AS top1_share_ppm,
       CAST((max_key_rows * n_keys + n_rows - 1) // n_rows AS BIGINT)
         AS salt_factor,
       CAST(CASE WHEN max_key_rows > 5 * p50_key_rows
                 THEN 1 ELSE 0 END AS BIGINT) AS aqe_skew_flag,
       CAST(5 * p50_key_rows AS BIGINT) AS aqe_threshold_rows
FROM (
  SELECT '{rel}' AS relation, '{label}' AS join_key,
         t.n_rows, t.n_keys,
         MAX(CASE WHEN rn = t.n_keys THEN k END) AS hot_key,
         CAST(MAX(CASE WHEN rn = t.n_keys THEN cnt END) AS BIGINT)
           AS max_key_rows,
         CAST(MAX(CASE WHEN rn = t.t50 THEN cnt END) AS BIGINT)
           AS p50_key_rows,
         CAST(MAX(CASE WHEN rn = t.t99 THEN cnt END) AS BIGINT)
           AS p99_key_rows
  FROM (
    SELECT k, cnt, ROW_NUMBER() OVER (ORDER BY cnt ASC, k DESC) AS rn
    FROM (SELECT {kexpr} AS k, COUNT(*) AS cnt FROM {rel} GROUP BY 1)
  ) r, (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           (50 * COUNT(*) + 99) // 100 AS t50,
           (99 * COUNT(*) + 99) // 100 AS t99
    FROM (SELECT {kexpr} AS k, COUNT(*) AS cnt FROM {rel} GROUP BY 1)
  ) t
  GROUP BY t.n_rows, t.n_keys
)"""  # noqa: E731
    d["shuffle_skew_report_composite"] = "\nUNION ALL\n".join(
        (
            _skew_comp(
                "orders",
                "o_custkey,o_orderpriority",
                "CAST(o_custkey AS VARCHAR) || '|' || o_orderpriority",
            ),
            _skew_comp(
                "lineitem",
                "l_suppkey,l_returnflag",
                "CAST(l_suppkey AS VARCHAR) || '|' || l_returnflag",
            ),
        )
    )

    # motion-JPEG frame sampling (round 6): sampled frames 0 and 2 of
    # the 4-frame clip use md5 digest bytes 0-3 and 8-11; each sampled
    # frame's decoded raster follows the SAME closed-form lossy chain as
    # multimodal_jpeg_decode, instantiated per digest byte below
    _mj_bytes = [0, 1, 2, 3, 8, 9, 10, 11]
    _mjblocks = ",\n".join(
        f"       {_jpx(b)} AS w{n}" for n, b in enumerate(_mj_bytes)
    )
    _mjsteps = "".join(
        f""", mst{n} AS (
  SELECT * , w{n} - 128 AS s FROM {f'mp{n - 1}' if n else 'mst'}
), mf{n} AS (
  SELECT * EXCLUDE (s), s * 536756224 AS a1 FROM mst{n}
), mg{n} AS (
  SELECT * EXCLUDE (a1),
         CASE WHEN a1 >= 0 THEN (a1 + 33554432) // 67108864
              ELSE -((-a1 + 33554432) // 67108864) END AS f00u
  FROM mf{n}
), mh{n} AS (
  SELECT * EXCLUDE (f00u),
         (CASE WHEN f00u >= 0 THEN (f00u + 8) // 16
               ELSE -((-f00u + 8) // 16) END) * 16 * 8386816
           + 33554432 AS t
  FROM mg{n}
), mp{n} AS (
  SELECT * EXCLUDE (t),
         LEAST(255, GREATEST(0,
           128 + CASE WHEN t >= 0 THEN t // 67108864
                      ELSE -((-t + 67108863) // 67108864) END)) AS pw{n}
  FROM mh{n}
)"""
        for n in range(8)
    )
    _mjhex = lambda n: (  # noqa: E731 — 2-char lowercase hex of pixel pw{n}
        f"(substring('{_jp}', pw{n} // 16 + 1, 1)"
        f" || substring('{_jp}', pw{n} % 16 + 1, 1))"
    )
    _mjraster = lambda a, b, c, dd: (  # noqa: E731 — 16x16 2x2-block raster hex
        f"repeat(repeat({_mjhex(a)}, 8) || repeat({_mjhex(b)}, 8), 8)"
        f" || repeat(repeat({_mjhex(c)}, 8) || repeat({_mjhex(dd)}, 8), 8)"
    )
    d["multimodal_mjpeg_frame_sample"] = f"""
WITH base AS (
  SELECT doc_id, md5(text) AS m FROM documents
), mst AS (
  SELECT doc_id,
{_mjblocks}
  FROM base
){_mjsteps}
SELECT doc_id, CAST(0 AS BIGINT) AS frame_idx,
       CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
       CAST(256 AS BIGINT) AS n_px_bytes,
       sha256({_mjraster(0, 1, 2, 3)}) AS pixel_sha
FROM mp7
UNION ALL
SELECT doc_id, CAST(2 AS BIGINT) AS frame_idx,
       CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
       CAST(256 AS BIGINT) AS n_px_bytes,
       sha256({_mjraster(4, 5, 6, 7)}) AS pixel_sha
FROM mp7
"""

    # kNN majority vote: brute-force decimal-dot ranking with the
    # candidate label carried through; both argmaxes totally ordered
    d["knn_label_vote"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS true_label, embedding AS q
  FROM embeddings WHERE vec_id < 25
), c AS (
  SELECT vec_id AS neighbor_id, label AS cand_label, embedding AS c
  FROM embeddings WHERE vec_id >= 25
), scored AS (
  SELECT query_id, true_label, neighbor_id, cand_label,
         CAST({dot64.format(a='q', b='c')} AS DOUBLE) AS dot,
         CAST({dot64.format(a='q', b='q')} AS DOUBLE) AS qn,
         CAST({dot64.format(a='c', b='c')} AS DOUBLE) AS cn
  FROM c, q
), top AS (
  SELECT query_id, true_label, cand_label FROM (
    SELECT query_id, true_label, cand_label,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY dot * abs(dot) / (qn * cn) DESC,
                                       neighbor_id ASC) AS rank
    FROM scored
  ) WHERE rank <= 10
), votes AS (
  SELECT query_id, true_label, cand_label,
         CAST(COUNT(*) AS BIGINT) AS n_votes
  FROM top GROUP BY query_id, true_label, cand_label
)
SELECT query_id, CAST(true_label AS INTEGER) AS true_label,
       CAST(cand_label AS INTEGER) AS predicted_label, n_votes
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY n_votes DESC, cand_label ASC) AS vr
  FROM votes
) WHERE vr = 1
"""

    # decile lift/gains: total-order ntile, exact counts, one IEEE
    # division per emitted ratio (cross-multiplied lift)
    d["decile_lift_table"] = """
WITH o AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(o_orderpriority = '1-URGENT' AS INTEGER) AS pos
  FROM orders
), binned AS (
  SELECT CAST(NTILE(10) OVER (ORDER BY cents DESC, o_orderkey ASC)
              AS BIGINT) AS decile, pos
  FROM o
), per AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS positives
  FROM binned GROUP BY decile
), tot AS (
  SELECT decile, n, positives,
         CAST(SUM(n) OVER () AS BIGINT) AS n_total,
         CAST(SUM(positives) OVER () AS BIGINT) AS pos_total,
         CAST(SUM(positives) OVER (ORDER BY decile
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_pos
  FROM per
)
SELECT decile, n, positives,
       CAST(positives AS DOUBLE) / n AS response_rate,
       CAST(positives * n_total AS DOUBLE) / (n * pos_total) AS lift,
       CAST(cum_pos AS DOUBLE) / pos_total AS cum_gain
FROM tot
"""

    # market-basket rules over order baskets at brand granularity
    d["brand_assoc_rules"] = """
WITH baskets AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), totals AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM baskets
), item AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS s_item FROM baskets GROUP BY p_brand
), pairs AS (
  SELECT a.p_brand AS antecedent, b.p_brand AS consequent,
         CAST(COUNT(*) AS BIGINT) AS s_pair
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand <> b.p_brand
  GROUP BY a.p_brand, b.p_brand
  HAVING COUNT(*) >= 20
)
SELECT p.antecedent, p.consequent, p.s_pair,
       ia.s_item AS s_ante, ic.s_item AS s_cons,
       CAST(p.s_pair AS DOUBLE) / ia.s_item AS confidence,
       CAST(p.s_pair * t.n_baskets AS DOUBLE) / (ia.s_item * ic.s_item) AS lift
FROM pairs p
JOIN item ia ON p.antecedent = ia.p_brand
JOIN item ic ON p.consequent = ic.p_brand
CROSS JOIN totals t
"""

    # per-user EWMA: the identical ordered IEEE fold on both engines
    d["user_value_ewma"] = """
WITH g AS (
  SELECT user_id, list(value ORDER BY ts ASC, event_id ASC) AS vals
  FROM events GROUP BY user_id
)
SELECT user_id, CAST(len(vals) AS BIGINT) AS n_events,
       list_reduce(vals, (acc, x) -> (acc + x) / 2) AS ewma_value
FROM g
"""
    # the streaming recurrence's last emission == the batch fold
    d["streaming_user_ewma"] = d["user_value_ewma"]

    # consensus dedup: >=2-of-3 family vote, each family's full oracle
    # embedded as a derived subquery (nested WITH is legal in a subquery)
    _fam_parts = " UNION ALL ".join(
        f"SELECT doc_a, doc_b FROM ({d[k]})"
        for k in (
            "ngram_jaccard_pairs",
            "minhash_lsh_pairs",
            "simhash_near_dup_pairs",
        )
    )
    d["consensus_near_dup_pairs"] = (
        "WITH fam AS (" + _fam_parts + ") "
        "SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS n_votes "
        "FROM fam GROUP BY doc_a, doc_b HAVING COUNT(*) >= 2"
    )

    # family agreement matrix: the same three family oracles composed
    # verbatim, folded to per-pair membership flags, then one row of
    # nine counters projected into the three unordered family pairs
    _fam_tagged = " UNION ALL ".join(
        f"SELECT doc_a, doc_b, '{tag}' AS fam FROM ({d[k]})"
        for tag, k in (
            ("ngram", "ngram_jaccard_pairs"),
            ("minhash", "minhash_lsh_pairs"),
            ("simhash", "simhash_near_dup_pairs"),
        )
    )
    d["dedup_family_agreement"] = (
        "WITH fam AS (" + _fam_tagged + """
), m AS (
  SELECT doc_a, doc_b,
         MAX(CASE WHEN fam = 'ngram' THEN 1 ELSE 0 END) AS f_n,
         MAX(CASE WHEN fam = 'minhash' THEN 1 ELSE 0 END) AS f_m,
         MAX(CASE WHEN fam = 'simhash' THEN 1 ELSE 0 END) AS f_s
  FROM fam GROUP BY doc_a, doc_b
), t AS (
  SELECT COALESCE(SUM(f_n), 0) AS n_n, COALESCE(SUM(f_m), 0) AS n_m,
         COALESCE(SUM(f_s), 0) AS n_s,
         COALESCE(SUM(f_n * f_m), 0) AS c_nm,
         COALESCE(SUM(f_n * f_s), 0) AS c_ns,
         COALESCE(SUM(f_m * f_s), 0) AS c_ms,
         COALESCE(SUM(GREATEST(f_n, f_m)), 0) AS u_nm,
         COALESCE(SUM(GREATEST(f_n, f_s)), 0) AS u_ns,
         COALESCE(SUM(GREATEST(f_m, f_s)), 0) AS u_ms
  FROM m
)
SELECT 'minhash' AS fam_a, 'ngram' AS fam_b,
       CAST(n_m AS BIGINT) AS n_a, CAST(n_n AS BIGINT) AS n_b,
       CAST(c_nm AS BIGINT) AS n_common, CAST(u_nm AS BIGINT) AS n_union,
       CAST(CASE WHEN u_nm = 0 THEN 1000000
            ELSE 1000000 * c_nm // u_nm END AS BIGINT) AS agreement_ppm
FROM t
UNION ALL
SELECT 'minhash', 'simhash',
       CAST(n_m AS BIGINT), CAST(n_s AS BIGINT),
       CAST(c_ms AS BIGINT), CAST(u_ms AS BIGINT),
       CAST(CASE WHEN u_ms = 0 THEN 1000000
            ELSE 1000000 * c_ms // u_ms END AS BIGINT)
FROM t
UNION ALL
SELECT 'ngram', 'simhash',
       CAST(n_n AS BIGINT), CAST(n_s AS BIGINT),
       CAST(c_ns AS BIGINT), CAST(u_ns AS BIGINT),
       CAST(CASE WHEN u_ns = 0 THEN 1000000
            ELSE 1000000 * c_ns // u_ns END AS BIGINT)
FROM t
"""
    )

    # largest-remainder proportional allocation (sums exactly to total)
    d["order_revenue_allocation"] = """
WITH li AS (
  SELECT l_orderkey, l_linenumber,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w
  FROM lineitem
), o AS (
  SELECT o_orderkey AS l_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS total
  FROM orders
), j AS (
  SELECT li.l_orderkey, li.l_linenumber, li.w, o.total,
         SUM(li.w) OVER (PARTITION BY li.l_orderkey) AS sumw
  FROM li JOIN o ON li.l_orderkey = o.l_orderkey
), k AS (
  SELECT l_orderkey, l_linenumber,
         (total * w) // sumw AS base,
         (total * w) % sumw AS rem_part,
         total - SUM((total * w) // sumw)
                   OVER (PARTITION BY l_orderkey) AS leftover
  FROM j
)
SELECT l_orderkey, l_linenumber,
       CAST(base + CASE WHEN ROW_NUMBER() OVER (
                          PARTITION BY l_orderkey
                          ORDER BY rem_part DESC, l_linenumber ASC)
                        <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS alloc_cents
FROM k
"""

    # leaf-first calendar rollup: day leaves re-aggregate exactly
    d["time_grain_rollup"] = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(value AS DECIMAL(18,2))) AS v
  FROM events GROUP BY 1
)
SELECT 'day' AS grain, day AS period_start,
       CAST(n AS BIGINT) AS n_events, CAST(v AS DOUBLE) AS total_value
FROM daily
UNION ALL
SELECT 'week', CAST(date_trunc('week', day) AS DATE),
       CAST(SUM(n) AS BIGINT), CAST(SUM(v) AS DOUBLE)
FROM daily GROUP BY 2
UNION ALL
SELECT 'month', CAST(date_trunc('month', day) AS DATE),
       CAST(SUM(n) AS BIGINT), CAST(SUM(v) AS DOUBLE)
FROM daily GROUP BY 2
"""

    # weighted (lower) median via cumulative-weight crossing
    d["weighted_median_price"] = """
WITH li AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS price_cents,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
), tot AS (
  SELECT l_returnflag, SUM(w) AS total_w,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM li GROUP BY 1
), cum AS (
  SELECT li.l_returnflag, li.price_cents, t.total_w, t.n_rows,
         SUM(li.w) OVER (PARTITION BY li.l_returnflag
                         ORDER BY li.price_cents ASC
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM li JOIN tot t ON li.l_returnflag = t.l_returnflag
)
SELECT l_returnflag, n_rows,
       CAST(total_w AS BIGINT) AS total_quantity,
       MIN(price_cents) / 100.0 AS weighted_median_price
FROM cum WHERE 2 * cum >= total_w
GROUP BY l_returnflag, n_rows, total_w
"""

    # hierarchical share-of-parent ladder on the aggregated frame
    d["nation_share_of_region"] = """
WITH rev AS (
  SELECT n.n_regionkey, r.r_name AS region, n.n_name AS nation,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS nat_rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  GROUP BY n.n_regionkey, r.r_name, n.n_name
)
SELECT region, nation,
       CAST(nat_rev AS DOUBLE) AS nation_revenue,
       CAST(nat_rev AS DOUBLE)
         / CAST(SUM(nat_rev) OVER (PARTITION BY n_regionkey) AS DOUBLE)
         AS share_of_region,
       CAST(SUM(nat_rev) OVER (PARTITION BY n_regionkey) AS DOUBLE)
         / CAST(SUM(nat_rev) OVER () AS DOUBLE)
         AS region_share_of_global
FROM rev
"""

    # set-valued window analytics: distinct-type sets through lag
    d["session_novelty"] = """
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), s AS (
  SELECT *, CAST(SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM o
), per_sess AS (
  SELECT user_id, session_seq,
         list_sort(list_distinct(list(event_type))) AS types
  FROM s GROUP BY user_id, session_seq
), lagged AS (
  SELECT user_id, session_seq, types,
         lag(types) OVER (PARTITION BY user_id
                          ORDER BY session_seq ASC) AS prev_types
  FROM per_sess
)
SELECT user_id, session_seq,
       CAST(len(types) AS BIGINT) AS n_types,
       CAST(len(list_intersect(types, prev_types)) AS BIGINT) AS n_shared,
       CAST(len(list_intersect(types, prev_types)) AS DOUBLE)
         / (len(types) + len(prev_types)
            - len(list_intersect(types, prev_types))) AS jaccard_prev
FROM lagged WHERE prev_types IS NOT NULL
"""

    # chi-square cells from exact integer marginals (ISO weekday)
    d["event_dow_chi2"] = """
WITH cells AS (
  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS iso_dow,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
), r AS (SELECT event_type, SUM(o) AS r FROM cells GROUP BY 1),
c AS (SELECT iso_dow, SUM(o) AS c FROM cells GROUP BY 1),
n AS (SELECT SUM(o) AS n FROM cells)
SELECT cells.event_type, cells.iso_dow, cells.o AS observed,
       CAST(n.n * cells.o - r.r * c.c AS DOUBLE)
         * CAST(n.n * cells.o - r.r * c.c AS DOUBLE)
         / CAST(n.n * r.r * c.c AS DOUBLE) AS chi2_contrib
FROM cells
JOIN r ON cells.event_type = r.event_type
JOIN c ON cells.iso_dow = c.iso_dow
CROSS JOIN n
"""

    # rolling exact median: 7-window membership explode + quantile_cont
    d["rolling_7day_median_value"] = """
WITH e AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(ts AS DATE) AS day
  FROM events
), b AS (
  SELECT MIN(day) AS d0, MAX(day) AS d1 FROM e
), spanned AS (
  SELECT cents,
         CAST(UNNEST(generate_series(CAST(day AS TIMESTAMP),
                                     CAST(day AS TIMESTAMP) + INTERVAL 6 DAY,
                                     INTERVAL 1 DAY)) AS DATE) AS win_end
  FROM e
), rolled AS (
  SELECT win_end, CAST(COUNT(*) AS BIGINT) AS n_events,
         quantile_cont(cents, 0.5) AS med_cents
  FROM spanned GROUP BY win_end
)
SELECT r.win_end, r.n_events, r.med_cents / 100.0 AS median_value
FROM rolled r CROSS JOIN b
WHERE r.win_end >= b.d0 + 6 AND r.win_end <= b.d1
"""

    # weighted systematic sampling on the cumulative token axis
    d["systematic_token_sample"] = """
WITH d AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS w
  FROM documents
), t AS (
  SELECT source, SUM(w) AS src_tokens FROM d GROUP BY source
), c AS (
  SELECT d.doc_id, d.source, d.w,
         SUM(d.w) OVER (PARTITION BY d.source
                        ORDER BY md5(CAST(d.doc_id AS VARCHAR)) ASC,
                                 d.doc_id ASC
                        ROWS UNBOUNDED PRECEDING) AS cum,
         GREATEST(t.src_tokens // 8, 1) AS step
  FROM d JOIN t ON d.source = t.source
)
SELECT doc_id, source, w, CAST(cum AS BIGINT) AS cum,
       CAST(cum // step - (cum - w) // step AS BIGINT) AS n_picks
FROM c
WHERE cum // step - (cum - w) // step > 0
"""

    # quality-aware survivor per cluster: compose the LSH-CC oracle with
    # the quality argmax
    d["quality_canonical_docs"] = (
        "WITH clusters AS (SELECT * FROM (" + d["near_dup_clusters_lsh"] + ")), "
        """q AS (
  SELECT doc_id,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS quality
  FROM documents
), j AS (
  SELECT c.cluster_id, c.doc_id, q.quality,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.quality DESC, c.doc_id ASC) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY c.cluster_id) AS BIGINT)
           AS cluster_size
  FROM clusters c JOIN q ON c.doc_id = q.doc_id
)
SELECT cluster_id, doc_id AS survivor_id, cluster_size, quality
FROM j WHERE rn = 1"""
    )

    # Spark 4 recursive CTE: BOTH engines execute the identical text
    d["recursive_supplier_reach"] = extended.RECURSIVE_REACH_SQL
    d["lateral_top_customers_per_nation"] = extended.LATERAL_TOP_CUSTOMERS_SQL

    # palette-PNG end-to-end decode (VERDICT r5 item 5): the oracle
    # rebuilds the PLTE-expanded RGB raster arithmetically — hex digit
    # v of md5(text) selects the fixed triple (17v, 255-17v, 17v^85) —
    # and sha256's its lowercase-hex transport (RGB bytes aren't UTF-8,
    # same rule as the JPEG twin). The 32-triple row is built once and
    # repeated 8x, mirroring the encoder's md5-hex repetition.
    d["multimodal_palette_png_decode"] = """
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
tr AS (
  SELECT doc_id, i,
         printf('%02x%02x%02x', 17 * v, 255 - 17 * v, xor(17 * v, 85)) AS t
  FROM (SELECT doc_id, i,
               CAST(strpos('0123456789abcdef', substring(h, i + 1, 1)) - 1
                    AS INTEGER) AS v
        FROM m, (SELECT unnest(range(32)) AS i) g)
),
hexes AS (SELECT doc_id, string_agg(t, '' ORDER BY i) AS row32
          FROM tr GROUP BY doc_id)
SELECT doc_id, CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
       CAST(768 AS BIGINT) AS n_px_bytes,
       sha256(repeat(row32, 8)) AS pixel_sha
FROM hexes
"""

    # ANN-backed production twin of knn_label_vote (VERDICT r5 item 3):
    # the deterministic IVF probe (fixed-point centroids, total
    # tie-breaks) makes the WHOLE approximate pipeline exactly
    # oracle-checkable — same CTE ladder as similarity_topk_ivf, with
    # the modal-label vote appended and query vectors excluded from the
    # candidate pool like the exact form
    d["knn_label_vote_ivf"] = f"""
WITH cd AS (
  SELECT label AS cell, i AS dim,
         CAST(SUM(CAST(floor(CAST(embedding[i + 1] AS DOUBLE)
                            * 1000000000.0) AS BIGINT))
              AS DOUBLE) / COUNT(*) / 1000000000.0 AS c
  FROM embeddings, (SELECT unnest(range(64)) AS i) dims
  GROUP BY label, i
),
cents AS (SELECT cell, list(c ORDER BY dim ASC) AS centroid FROM cd GROUP BY cell),
q AS (SELECT vec_id AS query_id, label AS true_label, embedding AS qe
      FROM embeddings WHERE vec_id < 25),
qcells AS (
  SELECT query_id, true_label, qe, cell,
         {_FOLD64.format(a="qe", b="centroid")}
           / (sqrt({_FOLD64.format(a="qe", b="qe")})
              * sqrt({_FOLD64.format(a="centroid", b="centroid")})) AS cell_cos
  FROM q CROSS JOIN cents
),
probed AS (
  SELECT query_id, true_label, qe, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cell_cos DESC, cell ASC) AS cr
    FROM qcells
  ) WHERE cr <= 3
),
pairs AS (
  SELECT p.query_id, p.true_label, p.qe,
         e.vec_id AS neighbor_id, e.label AS cand_label, e.embedding AS ce
  FROM embeddings e JOIN probed p ON e.label = p.cell
  WHERE e.vec_id >= 25
),
scored AS (
  SELECT query_id, true_label, neighbor_id, cand_label,
         {_FOLD64.format(a="qe", b="ce")}
           / (sqrt({_FOLD64.format(a="qe", b="qe")})
              * sqrt({_FOLD64.format(a="ce", b="ce")})) AS cos
  FROM pairs
),
top AS (
  SELECT query_id, true_label, cand_label FROM (
    SELECT query_id, true_label, cand_label,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM scored
  ) WHERE rank <= 10
),
votes AS (
  SELECT query_id, true_label, cand_label,
         CAST(COUNT(*) AS BIGINT) AS n_votes
  FROM top GROUP BY query_id, true_label, cand_label
)
SELECT query_id, CAST(true_label AS INTEGER) AS true_label,
       CAST(cand_label AS INTEGER) AS predicted_label, n_votes
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY n_votes DESC, cand_label ASC) AS vr
  FROM votes
) WHERE vr = 1
"""

    # the Python DataSource date spine, zero-filled against daily activity
    d["calendar_activity_spine"] = """
WITH spine AS (
  SELECT CAST(UNNEST(generate_series(DATE '2024-01-01', DATE '2024-02-04',
                                     INTERVAL 1 DAY)) AS DATE) AS day
), spine_i AS (
  SELECT day, CAST(day - DATE '2024-01-01' AS BIGINT) AS day_index FROM spine
), daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM events GROUP BY 1
)
SELECT s.day, s.day_index,
       COALESCE(d.n_events, 0) AS n_events,
       COALESCE(d.total_value, 0.0) AS total_value
FROM spine_i s LEFT JOIN daily d ON s.day = d.day
"""

    # time-weighted average: exact cents x microseconds in DECIMAL(38,0)
    d["user_time_weighted_value"] = """
WITH s AS (
  SELECT user_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         epoch_us(ts) AS t_us,
         epoch_us(lead(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC))
           - epoch_us(ts) AS d_us
  FROM events
), a AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         SUM(CAST(cents * d_us AS DECIMAL(38,0))) AS num,
         MAX(t_us) - MIN(t_us) AS span_us
  FROM s GROUP BY user_id
)
SELECT user_id, n_events, CAST(span_us AS BIGINT) AS span_us,
       CAST(num AS DOUBLE) / CAST(span_us AS DOUBLE) AS twa_cents
FROM a WHERE span_us > 0
"""

    # interval-overlap degree: oracle = the QUADRATIC interval self-join
    # (the definition), cross-checking the sweep formulation
    d["session_overlap_degree"] = """
WITH o AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), s AS (
  SELECT *, CAST(SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM o
), sess AS (
  SELECT user_id, session_seq, MIN(ts) AS s, MAX(ts) AS e
  FROM s GROUP BY user_id, session_seq
)
SELECT a.user_id, a.session_seq,
       CAST(COUNT(b.user_id) AS BIGINT) AS n_overlaps
FROM sess a
LEFT JOIN sess b
  ON a.s <= b.e AND b.s <= a.e
 AND NOT (a.user_id = b.user_id AND a.session_seq = b.session_seq)
GROUP BY a.user_id, a.session_seq
"""

    # regex sequence mining: ordered one-char event codes, leftmost
    # non-overlapping matches (alphabet disjoint from the terminator, so
    # Java regex and RE2 produce identical counts)
    d["event_pattern_conversions"] = """
WITH g AS (
  SELECT user_id,
         string_agg(substring(event_type, 1, 1), '' ORDER BY ts ASC, event_id ASC) AS seq,
         COUNT(*) AS n
  FROM events GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(seq, 'c[ve]*p')) AS BIGINT) AS n_conversions
FROM g
"""

    # stream-stream LEFT SEMI join == batch EXISTS under availableNow
    d["streaming_semi_join"] = """
SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts
FROM events c
WHERE c.event_type = 'click'
  AND EXISTS (
    SELECT 1 FROM events p
    WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
      AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR)
"""
    # curation v2: composes the quality-canonical oracle with the
    # systematic sampling grid over survivors
    d["corpus_curation_v2"] = (
        "WITH canon AS (SELECT * FROM ("
        + d["quality_canonical_docs"]
        + ")), "
        + """surv AS (
  SELECT c.cluster_id, c.survivor_id, c.cluster_size, c.quality,
         d.source, CAST(len(string_split(d.text, ' ')) AS BIGINT) AS w
  FROM canon c JOIN documents d ON c.survivor_id = d.doc_id
  WHERE c.quality >= 0.4
), t AS (
  SELECT source, SUM(w) AS src_tokens FROM surv GROUP BY source
), cm AS (
  SELECT s.survivor_id, s.source, s.cluster_id, s.cluster_size,
         s.quality, s.w,
         SUM(s.w) OVER (PARTITION BY s.source
                        ORDER BY md5(CAST(s.survivor_id AS VARCHAR)) ASC,
                                 s.survivor_id ASC
                        ROWS UNBOUNDED PRECEDING) AS cum,
         GREATEST(t.src_tokens // 8, 1) AS step
  FROM surv s JOIN t ON s.source = t.source
)
SELECT survivor_id, source, cluster_id, cluster_size, quality, w,
       CAST(cum // step - (cum - w) // step AS BIGINT) AS n_picks
FROM cm WHERE cum // step - (cum - w) // step > 0"""
    )

    # Lorenz concentration curve with an exact integer 80% crossing test
    d["customer_revenue_pareto"] = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS rev_cents
  FROM orders GROUP BY o_custkey
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cust, SUM(rev_cents) AS tot_cents
  FROM per_cust
), c AS (
  SELECT o_custkey, rev_cents,
         SUM(rev_cents) OVER (ORDER BY rev_cents DESC, o_custkey ASC
                              ROWS UNBOUNDED PRECEDING) AS cum_cents,
         ROW_NUMBER() OVER (ORDER BY rev_cents DESC, o_custkey ASC) AS rank
  FROM per_cust
)
SELECT c.o_custkey, c.rev_cents / 100.0 AS revenue,
       CAST(c.rank AS DOUBLE) / t.n_cust AS cust_share,
       CAST(c.cum_cents AS DOUBLE) / CAST(t.tot_cents AS DOUBLE) AS rev_share,
       (5 * c.cum_cents >= 4 * t.tot_cents
        AND 5 * (c.cum_cents - c.rev_cents) < 4 * t.tot_cents) AS crosses_p80
FROM c CROSS JOIN t
"""

    # --- round-5 additions ---
    d["benford_price_digits"] = """
WITH c AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders WHERE o_totalprice > 0
), g AS (
  SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM c GROUP BY 1
)
SELECT digit, n_orders,
       CAST(n_orders AS DOUBLE) /
       CAST((SELECT SUM(n_orders) FROM g) AS DOUBLE) AS share
FROM g
"""

    # DuckDB's SUM() marginals are HUGEINT (128-bit exact), so the scaled
    # ECDF differences stay exact without explicit DECIMAL casts; Spark's
    # side does the same in DECIMAL(38,0)
    d["ks_two_sample"] = """
WITH t AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         CAST(event_type = 'click' AS BIGINT) AS is_a,
         CAST(event_type = 'purchase' AS BIGINT) AS is_b
  FROM events WHERE event_type IN ('click', 'purchase')
), pv AS (
  SELECT c, SUM(is_a) AS da, SUM(is_b) AS db FROM t GROUP BY c
), cums AS (
  SELECT SUM(da) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cum_a,
         SUM(db) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cum_b
  FROM pv
), tot AS (
  SELECT CAST(SUM(is_a) AS BIGINT) AS n_a, CAST(SUM(is_b) AS BIGINT) AS n_b
  FROM t
)
SELECT n_a, n_b,
       CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS DOUBLE) /
       CAST(n_a * n_b AS DOUBLE) AS ks_stat
FROM cums CROSS JOIN tot
GROUP BY n_a, n_b
"""

    # the quadratic dominance DEFINITION — deliberately a different
    # formulation than Spark's two-window linearithmic one, so each
    # verifies the other (skip at sf1: O(n^2) oracle)
    d["skyline_orders"] = """
WITH b AS (
  SELECT o_orderkey,
         CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS day,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
SELECT t.o_orderkey, t.day, t.cents
FROM b t
WHERE NOT EXISTS (
  SELECT 1 FROM b a
  WHERE a.day <= t.day AND a.cents >= t.cents
    AND (a.day < t.day OR a.cents > t.cents)
)
"""

    d["user_modal_event_type"] = """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT user_id, event_type AS modal_type, cnt FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY cnt DESC, event_type ASC) AS rn
  FROM c
) WHERE rn = 1
"""

    d["rfm_segments"] = """
WITH per AS (
  SELECT o_custkey,
         MAX(CAST(o_orderdate AS DATE)) AS last_day,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS m_cents
  FROM orders GROUP BY 1
), base AS (
  SELECT o_custkey,
         CAST(date_diff('day', last_day, (SELECT MAX(last_day) FROM per))
              AS BIGINT) AS recency_days,
         n_orders, m_cents
  FROM per
), scored AS (
  SELECT o_custkey, recency_days, n_orders, m_cents,
         CAST(NTILE(5) OVER (ORDER BY recency_days ASC, o_custkey ASC)
              AS BIGINT) AS r_score,
         CAST(NTILE(5) OVER (ORDER BY n_orders DESC, o_custkey ASC)
              AS BIGINT) AS f_score,
         CAST(NTILE(5) OVER (ORDER BY m_cents DESC, o_custkey ASC)
              AS BIGINT) AS m_score
  FROM base
)
SELECT o_custkey, recency_days, n_orders, m_cents, r_score, f_score, m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm_code
FROM scored
"""

    d["user_acquisition_curve"] = """
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY 1
), by_day AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users FROM firsts GROUP BY 1
)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_users
FROM by_day
"""

    d["sparse_cosine_pairs"] = """
WITH tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id,
               unnest(list_transform(range(array_length(arr) - 1),
                                     i -> arr[i + 1] || ' ' || arr[i + 2]))
                 AS token
        FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents))
  GROUP BY doc_id, token
), rare AS (
  SELECT tf.* FROM tf
  WHERE token IN (SELECT token FROM tf GROUP BY token HAVING COUNT(*) <= 20)
), norms AS (
  SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS n2 FROM rare GROUP BY doc_id
), dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM rare a JOIN rare b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, dot,
       CAST(dot AS DOUBLE) /
       (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos_sim
FROM dots
JOIN norms na ON dots.doc_a = na.doc_id
JOIN norms nb ON dots.doc_b = nb.doc_id
WHERE CAST(dot AS DOUBLE) /
      (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.5
"""

    d["phrase_search"] = """
WITH bi AS (
  SELECT doc_id,
         unnest(list_transform(range(array_length(arr) - 1),
                               i -> arr[i + 1] || ' ' || arr[i + 2])) AS bigram
  FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents)
), top AS (
  SELECT bigram FROM bi GROUP BY bigram
  ORDER BY COUNT(*) DESC, bigram ASC LIMIT 1
)
SELECT doc_id, bigram, CAST(COUNT(*) AS BIGINT) AS n_matches
FROM bi WHERE bigram IN (SELECT bigram FROM top)
GROUP BY doc_id, bigram
"""

    d["event_type_lift"] = """
WITH du AS (SELECT DISTINCT user_id, event_type FROM events),
s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM du GROUP BY 1),
u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM du),
pairs AS (
  SELECT a.event_type AS type_x, b.event_type AS type_y,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_x, type_y, sx.n AS n_x, sy.n AS n_y, n_both,
       CAST(n_both * n_users AS DOUBLE) / CAST(sx.n * sy.n AS DOUBLE) AS lift
FROM pairs
JOIN s sx ON pairs.type_x = sx.event_type
JOIN s sy ON pairs.type_y = sy.event_type
CROSS JOIN u
"""

    d["interval_coverage_per_user"] = """
WITH lagged AS (
  SELECT user_id, epoch_us(ts) AS t,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
           AS prev_t
  FROM events
), isl AS (
  SELECT user_id, t,
         SUM(CASE WHEN prev_t IS NULL OR t - prev_t > 1800000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING)
           AS island
  FROM lagged
), per AS (
  SELECT user_id, island, MAX(t) - MIN(t) + 1800000000 AS covered_us
  FROM isl GROUP BY 1, 2
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(covered_us) AS BIGINT) AS covered_us
FROM per GROUP BY 1
"""

    d["asof_join_tolerance"] = """
WITH o AS (
  SELECT o_custkey AS k, o_orderdate AS t, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
), u AS (
  SELECT user_id AS k, ts AS t, 1 AS is_event, event_id,
         CAST(NULL AS BIGINT) AS o_orderkey, CAST(NULL AS TIMESTAMP) AS ot
  FROM events
  UNION ALL
  SELECT k, t, 0, CAST(NULL AS BIGINT), o_orderkey, t FROM o
), wnd AS (
  SELECT *,
         last_value(o_orderkey IGNORE NULLS) OVER
           (PARTITION BY k ORDER BY t, is_event ROWS UNBOUNDED PRECEDING)
           AS last_orderkey,
         last_value(ot IGNORE NULLS) OVER
           (PARTITION BY k ORDER BY t, is_event ROWS UNBOUNDED PRECEDING)
           AS last_order_t
  FROM u
)
SELECT event_id, k AS user_id,
       CASE WHEN epoch_us(t) - epoch_us(last_order_t) <= 604800000000
            THEN last_orderkey END AS o_orderkey_within
FROM wnd WHERE is_event = 1
"""

    # membership via IN-subqueries (vs Spark's broadcast joins) — same
    # cascade, different join mechanics, so the engines cross-check
    d["gdpr_erasure_audit"] = """
SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_erased
FROM customer
UNION ALL
SELECT 'orders', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o_custkey IN
                 (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0)
                 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN l_orderkey IN
                 (SELECT o_orderkey FROM orders WHERE o_custkey IN
                   (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0))
                 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'events', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM events
"""

    d["split_leakage_check"] = """
WITH base AS (
  SELECT md5(array_to_string(list_slice(string_split(text, ' '), 1, 20), ' '))
           AS fingerprint,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
                THEN 'train'
              WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
                THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT fingerprint,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(COUNT(DISTINCT split) AS BIGINT) AS n_splits,
       CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_train,
       CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
       CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_test
FROM base GROUP BY fingerprint
HAVING COUNT(DISTINCT split) >= 2
"""

    # the Python-UDTF twin emits the exact rows of the JVM chunker
    d["chunk_documents_udtf"] = d["chunk_documents"]

    # Duffield-Lund-Thorup priority sampling: u = 52-bit md5 prefix (exact
    # as a double), priority key q = u / w — ONE correctly-rounded IEEE
    # division from exact operands, bit-identical on any IEEE engine, so
    # unlike A-ES (which needs log()) the top-k hashes exactly. The fold
    # below is the 13-digit sibling of _hex_u32 (DuckDB-version-robust).
    _u52 = " + ".join(
        f"(strpos('0123456789abcdef', substring(m, {1 + i}, 1)) - 1)"
        f" * {16 ** (12 - i)}"
        for i in range(13)
    )
    d["priority_sample_topk"] = f"""
WITH c AS (
  SELECT doc_id, source,
         GREATEST(CAST(len(string_split(text, ' ')) AS BIGINT), 1) AS w,
         md5(CAST(doc_id AS VARCHAR)) AS m
  FROM documents
), q AS (
  SELECT doc_id, source, w,
         CAST({_u52} AS DOUBLE) / CAST(w AS DOUBLE) AS q
  FROM c
)
SELECT doc_id, source, w,
       CAST(ROW_NUMBER() OVER (ORDER BY q ASC, doc_id ASC) AS INTEGER) AS rk
FROM q ORDER BY q ASC, doc_id ASC LIMIT 25
"""

    # stratified twin: identical key chain, rank partitioned by source
    d["priority_sample_per_source"] = f"""
WITH c AS (
  SELECT doc_id, source,
         GREATEST(CAST(len(string_split(text, ' ')) AS BIGINT), 1) AS w,
         md5(CAST(doc_id AS VARCHAR)) AS m
  FROM documents
), q AS (
  SELECT doc_id, source, w,
         CAST({_u52} AS DOUBLE) / CAST(w AS DOUBLE) AS q
  FROM c
), r AS (
  SELECT doc_id, source, w,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY q ASC, doc_id ASC) AS INTEGER) AS rk
  FROM q
)
SELECT doc_id, source, w, rk FROM r WHERE rk <= 5
"""

    # CLV channel attribution, equal-credit largest-remainder exact:
    # Σ attributed_cents == Σ all order totals bit-exactly (the hash pins it)
    d["linear_touch_attribution"] = """
WITH ut AS (
  SELECT o_custkey AS user_id,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS total
  FROM orders GROUP BY 1
), t AS (
  SELECT e.user_id, ut.total, e.event_id, e.ts, e.event_type
  FROM events e JOIN ut ON e.user_id = ut.user_id
), c AS (
  SELECT user_id, event_type,
         total // n + CASE WHEN rk <= total % n THEN 1 ELSE 0 END AS cents
  FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY user_id) AS n,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rk
    FROM t
  )
), direct AS (
  SELECT ut.user_id, 'direct' AS event_type, ut.total AS cents
  FROM ut
  WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.user_id = ut.user_id)
), u AS (
  SELECT * FROM c UNION ALL SELECT * FROM direct
)
SELECT event_type,
       CAST(SUM(cents) AS BIGINT) AS attributed_cents,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_touches
FROM u GROUP BY event_type
"""

    # join costing from per-side key aggregates (never the join itself);
    # HUGEINT products mirror the engine's DECIMAL(38,0) pre-casts
    def _join_card(lt: str, lk: str, rt: str, rk: str, name: str) -> str:
        return f"""
SELECT '{name}' AS join_name,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {lt}) AS n_left,
       (SELECT CAST(COUNT(DISTINCT {lk}) AS BIGINT) FROM {lt}) AS ndv_left,
       (SELECT CAST(MAX(c) AS BIGINT) FROM
          (SELECT COUNT(*) AS c FROM {lt} GROUP BY {lk})) AS max_left_per_key,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {rt}) AS n_right,
       (SELECT CAST(COUNT(DISTINCT {rk}) AS BIGINT) FROM {rt}) AS ndv_right,
       (SELECT CAST(MAX(c) AS BIGINT) FROM
          (SELECT COUNT(*) AS c FROM {rt} GROUP BY {rk})) AS max_right_per_key,
       (SELECT CAST(COALESCE(SUM(CAST(nl AS HUGEINT) * CAST(nr AS HUGEINT)), 0)
               AS BIGINT)
        FROM (SELECT {lk} AS k, COUNT(*) AS nl FROM {lt} GROUP BY 1) la
        JOIN (SELECT {rk} AS k, COUNT(*) AS nr FROM {rt} GROUP BY 1) ra
          ON la.k = ra.k) AS inner_join_rows
"""

    d["join_cardinality_estimate"] = (
        _join_card("customer", "c_custkey", "orders", "o_custkey", "customer_orders")
        + " UNION ALL "
        + _join_card(
            "orders", "o_orderkey", "lineitem", "l_orderkey", "orders_lineitem"
        )
    )

    # bit-length bins: length(bin(d)) - 1 == floor(log2(d)) exactly
    d["copurchase_degree_histogram"] = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), edges AS (
  SELECT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 5
), deg AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS degree FROM edges GROUP BY src
)
SELECT CAST(length(bin(degree)) - 1 AS BIGINT) AS bin,
       CAST(2 ** (length(bin(degree)) - 1) AS BIGINT) AS bin_lo_degree,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       MIN(degree) AS min_degree,
       MAX(degree) AS max_degree
FROM deg GROUP BY 1, 2
"""

    d["cv_fold_assignment"] = f"""
SELECT {_hex_u32('md5(CAST(doc_id AS VARCHAR))', 1)} % 5 AS fold,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM documents GROUP BY 1
"""

    # TV distance |n·M - m·N| summed in HUGEINT, ONE final IEEE division
    d["split_label_drift"] = """
WITH lab AS (
  SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
                THEN 'train'
              WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
                THEN 'val'
              ELSE 'test' END AS split,
         source
  FROM documents
), cell AS (
  SELECT split, source, CAST(COUNT(*) AS BIGINT) AS n FROM lab GROUP BY 1, 2
), marg AS (SELECT source, SUM(n) AS m FROM cell GROUP BY 1),
sn AS (SELECT split, SUM(n) AS n_split FROM cell GROUP BY 1),
tot AS (SELECT SUM(m) AS m_total FROM marg),
grid AS (
  SELECT sn.split, sn.n_split, marg.source, marg.m,
         COALESCE(cell.n, 0) AS n
  FROM sn CROSS JOIN marg
  LEFT JOIN cell ON cell.split = sn.split AND cell.source = marg.source
)
SELECT split, CAST(n_split AS BIGINT) AS n_docs,
       CAST(SUM(abs(CAST(n AS HUGEINT) * CAST(m_total AS HUGEINT)
                    - CAST(m AS HUGEINT) * CAST(n_split AS HUGEINT)))
            AS DOUBLE)
         / CAST(2 * CAST(n_split AS HUGEINT) * CAST(m_total AS HUGEINT)
                AS DOUBLE) AS tv_distance
FROM grid CROSS JOIN tot GROUP BY split, n_split, m_total
"""

    d["event_type_pivot"] = """
SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view
FROM events GROUP BY 1
"""

    # Bloom filter: 64 words x 62 sign-safe bits, k=3 md5 positions;
    # every count is exact because the hashes are md5 arithmetic
    _bm = 64 * 62
    _bpos = " UNION ALL ".join(
        f"SELECT c_custkey, ({_hex_u32('hx', 1 + 8 * i)}) % {_bm} AS pos FROM mh"
        for i in range(3)
    )
    _bprobe = " UNION ALL ".join(
        f"SELECT key, ({_hex_u32('hx', 1 + 8 * i)}) % {_bm} AS pos FROM ph"
        for i in range(3)
    )
    d["bloom_membership_audit"] = f"""
WITH members AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0),
mh AS (SELECT c_custkey, md5(CAST(c_custkey AS VARCHAR)) AS hx FROM members),
pos AS ({_bpos}),
words AS (
  SELECT pos // 62 AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 62 AS INT)) AS word
  FROM pos GROUP BY 1
),
probes AS (SELECT DISTINCT o_custkey AS key FROM orders),
ph AS (SELECT key, md5(CAST(key AS VARCHAR)) AS hx FROM probes),
parm AS ({_bprobe}),
checked AS (
  SELECT key,
         CASE WHEN (word >> CAST(pos % 62 AS INT)) & 1 = 1 THEN 1 ELSE 0 END
           AS hit
  FROM parm LEFT JOIN words ON words.word_idx = parm.pos // 62
),
verd AS (SELECT key, MIN(hit) AS all_hit FROM checked GROUP BY key),
lab AS (
  SELECT v.key, v.all_hit,
         CASE WHEN m.c_custkey IS NULL THEN 0 ELSE 1 END AS is_member
  FROM verd v LEFT JOIN members m ON m.c_custkey = v.key
),
fill AS (SELECT SUM(bit_count(word)) AS n_bits_set FROM words)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(is_member) AS BIGINT) AS n_true_members,
       CAST(SUM(all_hit) AS BIGINT) AS n_bloom_hits,
       CAST(SUM(CASE WHEN all_hit = 1 AND is_member = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_positives,
       CAST((SELECT n_bits_set FROM fill) AS BIGINT) AS n_bits_set
FROM lab
"""

    # bootstrap: draw (b,i) -> index md5(b|i) % n; CI = order statistics
    # rank 5/195 of the 200 resample means (ceil(q*B), no interpolation)
    d["bootstrap_mean_ci"] = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
idx AS (
  SELECT ROW_NUMBER() OVER (ORDER BY day ASC) - 1 AS idx, cents FROM daily
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM idx),
draws AS (
  SELECT b, i,
         md5(CAST(b AS VARCHAR) || '|' || CAST(i AS VARCHAR)) AS hx
  FROM (SELECT unnest(range(200)) AS b),
       (SELECT unnest(range((SELECT n FROM nn))) AS i)
),
means AS (
  SELECT b,
         CAST(SUM(v.cents) AS DOUBLE) / CAST((SELECT n FROM nn) AS DOUBLE)
           AS mean_cents
  FROM (SELECT b, ({_hex_u32('hx', 1)}) % (SELECT n FROM nn) AS sidx
        FROM draws) dr
  JOIN idx v ON v.idx = dr.sidx
  GROUP BY b
),
ranked AS (
  SELECT mean_cents,
         ROW_NUMBER() OVER (ORDER BY mean_cents ASC, b ASC) AS rn
  FROM means
)
SELECT (SELECT n FROM nn) AS n_days,
       CAST(200 AS BIGINT) AS n_resamples,
       (SELECT CAST(SUM(cents) AS DOUBLE) / COUNT(*) FROM daily) AS mean_cents,
       (SELECT mean_cents FROM ranked WHERE rn = 5) AS ci_lo,
       (SELECT mean_cents FROM ranked WHERE rn = 195) AS ci_hi
"""

    # lead/lag Pearson r: exact HUGEINT moments, IEEE sqrt tail mirrored
    d["daily_lag_correlation"] = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1
),
lags AS (SELECT CAST(unnest(range(-3, 4)) AS INT) AS lag),
grid AS (
  SELECT l.lag, a.x AS xa, b.y AS yb
  FROM daily a CROSS JOIN lags l
  JOIN daily b ON b.day = a.day + l.lag
),
mom AS (
  SELECT lag, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(xa AS HUGEINT)) AS sx,
         SUM(CAST(yb AS HUGEINT)) AS sy,
         SUM(CAST(xa AS HUGEINT) * CAST(yb AS HUGEINT)) AS sxy,
         SUM(CAST(xa AS HUGEINT) * CAST(xa AS HUGEINT)) AS sxx,
         SUM(CAST(yb AS HUGEINT) * CAST(yb AS HUGEINT)) AS syy
  FROM grid GROUP BY lag
)
SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_days,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0.0) AS pearson_r
FROM mom
"""

    # Spearman: doubled midranks over the day-grain frame (the
    # mann_whitney identity 2*midrank = 2*RANK + t - 1), exact HUGEINT
    # moments, IEEE sqrt/divide tail op-mirrored with the engine
    d["spearman_daily_correlation"] = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1
), ranked AS (
  SELECT 2 * RANK() OVER (ORDER BY x)
           + COUNT(*) OVER (PARTITION BY x) - 1 AS dx,
         2 * RANK() OVER (ORDER BY y)
           + COUNT(*) OVER (PARTITION BY y) - 1 AS dy
  FROM daily
), mom AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(dx AS HUGEINT)) AS sdx,
         SUM(CAST(dy AS HUGEINT)) AS sdy,
         SUM(CAST(dx AS HUGEINT) * CAST(dy AS HUGEINT)) AS sdxy,
         SUM(CAST(dx AS HUGEINT) * CAST(dx AS HUGEINT)) AS sdxx,
         SUM(CAST(dy AS HUGEINT) * CAST(dy AS HUGEINT)) AS sdyy
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(sdx AS BIGINT) AS sum2r_x,
       CAST(sdy AS BIGINT) AS sum2r_y,
       CAST(n * sdxy - sdx * sdy AS DOUBLE)
         / nullif(sqrt(CAST(n * sdxx - sdx * sdx AS DOUBLE))
                  * sqrt(CAST(n * sdyy - sdy * sdy AS DOUBLE)), 0.0)
         AS spearman_rho
FROM mom
"""

    # Kendall tau-b: sign-compared day pairs (no dx*dy product — cents
    # deltas times count deltas would brush BIGINT at extreme scale),
    # tie-pair counts via nonnegative floor division
    d["kendall_tau_b_daily"] = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1
), pairs AS (
  SELECT CAST(SUM(CASE WHEN (b.x > a.x AND b.y > a.y)
                         OR (b.x < a.x AND b.y < a.y)
                       THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         CAST(SUM(CASE WHEN (b.x > a.x AND b.y < a.y)
                         OR (b.x < a.x AND b.y > a.y)
                       THEN 1 ELSE 0 END) AS BIGINT) AS nd,
         CAST(COUNT(*) AS BIGINT) AS n0
  FROM daily a JOIN daily b ON a.day < b.day
), t1 AS (
  SELECT CAST(SUM(t * (t - 1)) // 2 AS BIGINT) AS n1
  FROM (SELECT COUNT(*) AS t FROM daily GROUP BY x)
), t2 AS (
  SELECT CAST(SUM(t * (t - 1)) // 2 AS BIGINT) AS n2
  FROM (SELECT COUNT(*) AS t FROM daily GROUP BY y)
)
SELECT nc, nd, n0, n1, n2,
       (CAST(nc AS DOUBLE) - CAST(nd AS DOUBLE))
         / nullif(sqrt(CAST(n0 AS DOUBLE) - CAST(n1 AS DOUBLE))
                  * sqrt(CAST(n0 AS DOUBLE) - CAST(n2 AS DOUBLE)), 0.0)
         AS tau_b
FROM pairs CROSS JOIN t1 CROSS JOIN t2
"""

    # per-source token-length percentile ladder: exact rank probes
    # ceil(p*n/100), no interpolation (orders_percentile_ladder pattern)
    d["doc_length_percentile_ladder"] = """
WITH docs AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
  FROM documents
), ranked AS (
  SELECT source, n_toks,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_toks ASC, doc_id ASC) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS n_docs
  FROM docs
), ps AS (SELECT CAST(unnest([25, 50, 75, 90, 99]) AS BIGINT) AS p)
SELECT source, p, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_toks AS BIGINT) AS p_tokens
FROM ranked JOIN ps ON rk = (p * n_docs + 99) // 100
"""

    # Wilcoxon signed-rank: per-day paired cent differences, zeros
    # dropped (the standard convention), doubled |d| midranks
    d["wilcoxon_signed_rank_daily"] = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  ELSE 0 END)
         - SUM(CASE WHEN event_type = 'click'
                    THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                    ELSE 0 END) AS d
  FROM events WHERE event_type IN ('purchase', 'click') GROUP BY 1
), nz AS (
  SELECT abs(d) AS ad, CASE WHEN d > 0 THEN 1 ELSE 0 END AS pos
  FROM daily WHERE d <> 0
), ranked AS (
  SELECT pos,
         2 * RANK() OVER (ORDER BY ad)
           + COUNT(*) OVER (PARTITION BY ad) - 1 AS dr
  FROM nz
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_nonzero,
       CAST(SUM(CASE WHEN pos = 1 THEN dr ELSE 0 END) AS BIGINT)
         AS w2x_pos,
       CAST(SUM(CASE WHEN pos = 0 THEN dr ELSE 0 END) AS BIGINT)
         AS w2x_neg
FROM ranked
"""

    # pipe-syntax twin: the plain ANSI form of the |> chain
    d["pipe_syntax_revenue_profile"] = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(cents) AS BIGINT) AS rev_cents,
       CAST(SUM(cents) // COUNT(*) AS BIGINT) AS avg_cents
FROM (
  SELECT l_returnflag, l_linestatus,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
)
GROUP BY 1, 2 ORDER BY 1, 2
"""

    # expanding-window CV: integer day-boundary arithmetic both engines
    d["temporal_backtest_splits"] = """
WITH o AS (SELECT CAST(o_orderdate AS DATE) AS day FROM orders),
b AS (SELECT MIN(day) AS lo,
             date_diff('day', MIN(day), MAX(day)) AS span FROM o),
folds AS (SELECT CAST(unnest(range(1, 5)) AS INT) AS fold),
grid AS (
  SELECT fold,
         lo + CAST(span * fold // 5 AS INT) AS train_end,
         lo + CAST(span * (fold + 1) // 5 AS INT) AS test_end
  FROM b CROSS JOIN folds
)
SELECT fold, train_end, test_end,
       CAST(SUM(CASE WHEN day <= train_end THEN 1 ELSE 0 END) AS BIGINT)
         AS n_train,
       CAST(SUM(CASE WHEN day > train_end AND day <= test_end
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_test
FROM o CROSS JOIN grid GROUP BY 1, 2, 3
"""

    # rank-map each source's lengths onto the global order statistics
    d["quantile_normalize_per_source"] = """
WITH d AS (SELECT doc_id, source, n_chars FROM documents),
nt AS (SELECT COUNT(*) AS n FROM d),
ps AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars ASC, doc_id ASC) AS r
  FROM d
),
sn AS (SELECT source, COUNT(*) AS n_src FROM d GROUP BY 1),
g AS (
  SELECT ROW_NUMBER() OVER (ORDER BY n_chars ASC, doc_id ASC) AS g_rank,
         n_chars AS g_chars
  FROM d
)
SELECT ps.doc_id, ps.source, ps.n_chars, g.g_chars AS normalized_chars
FROM ps JOIN sn USING (source)
JOIN g ON g.g_rank = (ps.r * (SELECT n FROM nt) + sn.n_src - 1) // sn.n_src
"""

    d["data_expectations_report"] = """
SELECT 'order_totalprice_positive' AS "check",
       CAST(SUM(CASE WHEN CAST(o_totalprice AS DECIMAL(18,2)) <= 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'order_status_in_domain',
       CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'order_date_in_range',
       CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1990-01-01'
                       OR CAST(o_orderdate AS DATE) > DATE '2005-12-31'
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'order_keys_not_null',
       CAST(SUM(CASE WHEN o_orderkey IS NULL OR o_custkey IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'order_key_unique',
       CAST(COALESCE((SELECT SUM(c - 1) FROM (
         SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey
         HAVING COUNT(*) > 1)), 0) AS BIGINT)
UNION ALL
SELECT 'lineitem_fk_to_orders',
       CAST(COALESCE((SELECT SUM(c) FROM (
         SELECT l_orderkey, COUNT(*) AS c FROM lineitem GROUP BY 1) li
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_orderkey = li.l_orderkey)), 0) AS BIGINT)
"""

    # ---- round 8 ----------------------------------------------------

    # basket-capped co-purchase edges (VERDICT r7 item 6): each order's
    # basket truncated to its 4 smallest supplier keys BEFORE pair
    # fan-out; support = shared capped orders per ordered pair
    d["copurchase_edges_capped"] = """
WITH b AS (
  SELECT l_orderkey, list_sort(list(DISTINCT l_suppkey))[1:4] AS ss
  FROM lineitem GROUP BY l_orderkey
),
e AS (SELECT unnest(ss) AS src, ss FROM b),
p AS (SELECT src, unnest(ss) AS dst FROM e)
SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
       CAST(COUNT(*) AS BIGINT) AS support
FROM p WHERE src <> dst GROUP BY src, dst
"""

    # byte-level batched BPE (VERDICT r7 item 4): symbols are hex byte
    # pairs (hex() is bit-identical across engines); per round up to 4
    # greedy NON-INTERACTING picks (argmax among pairs whose symbols
    # avoid every earlier pick's {l, r, l||r}) applied as chained
    # replaces in rank order — the same selection rule and chain as the
    # engine, unrolled over 16 rounds. v{n} is AS MATERIALIZED: each
    # round references the previous vocab twice (pair count + replace),
    # so inlining would duplicate the tree 2^16-fold (DuckDB ran out of
    # file handles re-opening the parquet before it ran out of CPU)
    def _bl_round(n: int, batch: int = 4) -> str:
        parts = [
            f"""
sp{n} AS (
  SELECT string_split(trim(s, '/'), '//') AS syms, freq FROM v{n - 1}
),
pr{n} AS (
  SELECT p.l AS l, p.r AS r, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_transform(range(1, len(syms)),
                                 i -> {{'l': syms[i], 'r': syms[i + 1]}}))
             AS p, freq
    FROM sp{n}
  ) GROUP BY 1, 2
),
b{n}_1 AS (SELECT l, r, cnt FROM pr{n}
           ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),"""
        ]
        for k in range(2, batch + 1):
            froms = ", ".join(
                [f"pr{n} cand"] + [f"b{n}_{j} p{j}" for j in range(1, k)]
            )
            conds = "\n               AND ".join(
                f"cand.l <> p{j}.l AND cand.l <> p{j}.r"
                f" AND cand.l <> p{j}.l || p{j}.r"
                f" AND cand.r <> p{j}.l AND cand.r <> p{j}.r"
                f" AND cand.r <> p{j}.l || p{j}.r"
                for j in range(1, k)
            )
            parts.append(
                f"""
b{n}_{k} AS (SELECT cand.l AS l, cand.r AS r, cand.cnt AS cnt
             FROM {froms}
             WHERE {conds}
             ORDER BY cand.cnt DESC, cand.l ASC, cand.r ASC LIMIT 1),"""
            )
        repl = "s"
        for k in range(1, batch + 1):
            repl = (
                f"CASE WHEN p{k}.l IS NULL THEN {repl} ELSE replace({repl},"
                f" '/' || p{k}.l || '//' || p{k}.r || '/',"
                f" '/' || p{k}.l || p{k}.r || '/') END"
            )
        joins = " ".join(
            f"LEFT JOIN b{n}_{k} p{k} ON TRUE" for k in range(1, batch + 1)
        )
        parts.append(
            f"""
v{n} AS MATERIALIZED (
  SELECT {repl} AS s, freq FROM v{n - 1} {joins}
),"""
        )
        return "".join(parts)

    def _bl_oracle(n_rounds: int) -> str:
        return (
            """
WITH v0 AS (
  SELECT regexp_replace(hex(word), '(..)', '/\\1/', 'g') AS s, freq FROM (
    SELECT token AS word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ) WHERE token <> '' GROUP BY token
  )
),"""
            + "".join(
                _bl_round(n) for n in range(1, n_rounds + 1)
            ).rstrip(",")
            + "\n"
            + "\nUNION ALL\n".join(
                f"SELECT CAST({n} AS BIGINT) AS round,"
                f" CAST({k} AS BIGINT) AS rk,"
                f" l AS left, r AS right, cnt AS pair_count FROM b{n}_{k}"
                for n in range(1, n_rounds + 1)
                for k in range(1, 5)
            )
        )

    d["bpe_train_merges_bytelevel"] = _bl_oracle(16)
    # deep variant (round 9, VERDICT r8 item 4): a 32-round cap = 128
    # merge capacity; on this corpus training EXHAUSTS first (round 23,
    # 89 merges — every word fully merged), so the entry pins the fixed
    # point too: post-exhaustion rounds pick nothing on BOTH engines
    # (the SQL's LIMIT-1 frames go empty and every CASE keeps s). The
    # same parameterization was one-off re-gated at 128 rounds against
    # /tmp/sf1 (see SCALE.md) — the batched round count stays
    # ~merges/4 until the exhaustion tail.
    d["bpe_train_merges_deep"] = _bl_oracle(32)

    # ---- round 9 ----------------------------------------------------

    # delta-join IVM: the oracle is the FULL RECOMPUTE — the query's
    # state+three-delta-partials merge must equal it exactly (the join
    # distributes over the disjoint splits; count/decimal-sum monoids)
    d["incremental_join_rollup_merge"] = """
SELECT c.c_nationkey,
       o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_nationkey, o.o_orderpriority
"""

    # quality calibration: per-bin reliability with exact ppm floors;
    # every division here has NONNEGATIVE operands, so DuckDB's
    # truncating // and Spark's DIV agree (both == floor)
    d["quality_calibration_report"] = """
WITH s AS (
  SELECT len(list_distinct(string_split(text, ' '))) AS nd,
         len(string_split(text, ' ')) AS nt,
         CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS pos
  FROM documents
), b AS (
  SELECT LEAST(9, (10 * nd) // nt) AS bin,
         (1000000 * nd) // nt AS conf_ppm, pos
  FROM s
), a AS (
  SELECT bin, COUNT(*) AS n_docs, SUM(pos) AS n_pos,
         SUM(conf_ppm) AS sum_conf
  FROM b GROUP BY bin
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(1000000 * n_pos // n_docs AS BIGINT) AS pos_rate_ppm,
       CAST(sum_conf // n_docs AS BIGINT) AS avg_conf_ppm,
       CAST(ABS(sum_conf // n_docs - 1000000 * n_pos // n_docs) AS BIGINT)
         AS gap_ppm
FROM a
"""

    # padding waste: log2 token-length buckets (the bin() bit-length
    # idiom), worst-case per-bucket pad bill; nonnegative floors only
    d["padding_waste_report"] = """
WITH s AS (
  SELECT len(string_split(text, ' ')) AS n_toks FROM documents
), b AS (
  SELECT CAST(length(bin(n_toks)) - 1 AS BIGINT) AS bucket, n_toks FROM s
), a AS (
  SELECT bucket, COUNT(*) AS n_docs, MIN(n_toks) AS min_tokens,
         MAX(n_toks) AS max_tokens, SUM(n_toks) AS sum_tokens
  FROM b GROUP BY bucket
)
SELECT bucket,
       CAST(2 ** bucket AS BIGINT) AS bucket_lo,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(min_tokens AS BIGINT) AS min_tokens,
       CAST(max_tokens AS BIGINT) AS max_tokens,
       CAST(sum_tokens AS BIGINT) AS sum_tokens,
       CAST(n_docs * max_tokens AS BIGINT) AS padded_tokens,
       CAST(1000000 * (n_docs * max_tokens - sum_tokens)
            // (n_docs * max_tokens) AS BIGINT) AS waste_ppm
FROM a
"""

    # Zipf fit: bit-length logs, BIGINT OLS moments, NEGATED slope so
    # the division operands stay nonnegative on natural text
    d["zipf_fit_report"] = """
WITH c AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY source, tok
), r AS (
  SELECT source,
         CAST(length(bin(freq)) - 1 AS BIGINT) AS y,
         CAST(length(bin(ROW_NUMBER() OVER (
             PARTITION BY source ORDER BY freq DESC, tok ASC))) - 1
           AS BIGINT) AS x
  FROM c
), m AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM r GROUP BY source
)
SELECT source, n_terms,
       CAST(sx AS BIGINT) AS sum_log_rank,
       CAST(sy AS BIGINT) AS sum_log_freq,
       CAST(1000 * (sx * sy - n_terms * sxy)
            // (n_terms * sxx - sx * sx) AS BIGINT) AS neg_slope_milli
FROM m
"""

    # label-centroid distances: the stats-per-dim fixed-point mean per
    # (label, dim), then HUGEINT squared-diff sums scaled back to BIGINT
    d["embedding_label_centroid_distances"] = """
WITH vals AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(j + 1 AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[j + 1] AS DOUBLE) * 1000000000)
              AS BIGINT) AS v_fp
  FROM embeddings, (SELECT unnest(range(64)) AS j) g
), cent AS (
  SELECT label, dim,
         CAST((SUM(CAST(v_fp AS HUGEINT))
               + CAST(COUNT(*) AS HUGEINT) * 10000000000) // COUNT(*)
              - 10000000000 AS BIGINT) AS mean_fp
  FROM vals GROUP BY 1, 2
)
SELECT a.label AS label_a, b.label AS label_b,
       CAST(SUM(CAST(a.mean_fp - b.mean_fp AS HUGEINT)
                * (a.mean_fp - b.mean_fp)) // 1000000000 AS BIGINT)
         AS dist_sq_fp
FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
GROUP BY 1, 2
"""

    # streaming python data source: the tick feed is range() + an md5
    # fold, so the oracle regenerates every page the reader emitted.
    # One parameterized helper serves both the single-run rollup and
    # the restart-continuity twin (ADVICE r9: the twin used to be a
    # string-replace on the base SQL, which would silently no-op if
    # the base's page constant or formatting ever changed).
    def _tick_feed_rollup_sql(pages: int) -> str:
        return f"""
WITH g AS (
  SELECT p.p AS page, i.i AS i,
         md5(CAST(p.p AS VARCHAR) || '|' || CAST(i.i AS VARCHAR)) AS m
  FROM (SELECT unnest(range({pages})) AS p) p,
       (SELECT unnest(range(32)) AS i) i
), v AS (
  SELECT page, ({_hex_u32('m', 1)}) % 1000 AS v FROM g
)
SELECT CAST(page AS BIGINT) AS page,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(v) AS BIGINT) AS sum_v,
       CAST(MIN(v) AS BIGINT) AS min_v,
       CAST(MAX(v) AS BIGINT) AS max_v
FROM v GROUP BY page
"""

    d["streaming_python_datasource_rollup"] = _tick_feed_rollup_sql(4)

    # restart continuity: the same feed oracle over the EXTENDED 6-page
    # range — run 1's pages must survive the checkpoint restart and run
    # 2's must append exactly once, or the hash mismatches
    d["streaming_tick_restart_continuity"] = _tick_feed_rollup_sql(6)

    # PQ distortion: the attested code-assignment chain (pa/pb) composed
    # with the exact integer floor-mean codebooks; squared diffs sum in
    # HUGEINT and scale back with nonnegative floor divisions
    d["pq_distortion_report"] = (
        "WITH "
        + _pq_half("a", 1, 32, "code_a")
        + ","
        + _pq_half("b", 33, 64, "code_b")
        + """,
codes AS (SELECT pa.vec_id, code_a, code_b
          FROM pa JOIN pb ON pa.vec_id = pb.vec_id),
qca AS (
  SELECT cell, dim, (csum - ((csum % cnt) + cnt) % cnt) // cnt AS cfp
  FROM (
    SELECT label AS cell, i AS dim,
           SUM(CAST(floor(CAST(embedding[i + 1] AS DOUBLE)
                          * 1000000000.0) AS BIGINT)) AS csum,
           COUNT(*) AS cnt
    FROM embeddings, (SELECT unnest(range(32)) AS i) dims
    GROUP BY label, i
  )
),
qcb AS (
  SELECT cell, dim, (csum - ((csum % cnt) + cnt) % cnt) // cnt AS cfp
  FROM (
    SELECT label AS cell, i AS dim,
           SUM(CAST(floor(CAST(embedding[i + 33] AS DOUBLE)
                          * 1000000000.0) AS BIGINT)) AS csum,
           COUNT(*) AS cnt
    FROM embeddings, (SELECT unnest(range(32)) AS i) dims
    GROUP BY label, i
  )
),
va AS (
  SELECT e.vec_id, e.label, CAST(i AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1000000000.0)
              AS BIGINT) AS vfp
  FROM embeddings e, (SELECT unnest(range(32)) AS i) dims
),
vb AS (
  SELECT e.vec_id, e.label, CAST(i AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[i + 33] AS DOUBLE) * 1000000000.0)
              AS BIGINT) AS vfp
  FROM embeddings e, (SELECT unnest(range(32)) AS i) dims
),
da AS (
  SELECT v.vec_id, v.label,
         SUM(CAST(v.vfp - c.cfp AS HUGEINT) * (v.vfp - c.cfp)) AS d
  FROM va v JOIN codes k ON k.vec_id = v.vec_id
  JOIN qca c ON c.cell = k.code_a AND c.dim = v.dim
  GROUP BY 1, 2
),
db AS (
  SELECT v.vec_id, v.label,
         SUM(CAST(v.vfp - c.cfp AS HUGEINT) * (v.vfp - c.cfp)) AS d
  FROM vb v JOIN codes k ON k.vec_id = v.vec_id
  JOIN qcb c ON c.cell = k.code_b AND c.dim = v.dim
  GROUP BY 1, 2
),
per AS (
  SELECT da.vec_id, da.label, da.d + db.d AS d
  FROM da JOIN db ON da.vec_id = db.vec_id
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(d) // 1000000000 AS BIGINT) AS sum_dist_fp,
       CAST(SUM(d) // (CAST(COUNT(*) AS HUGEINT) * 1000000000) AS BIGINT)
         AS mean_dist_fp
FROM per GROUP BY label
"""
    )

    # k-truss profile: 3 unrolled support-peel rounds over the capped,
    # min_support=4-sparsified co-purchase graph (near-complete raw
    # graphs make the support join |E| x avg_degree — the sparsified
    # input keeps the same peel semantics at a fraction of the cost);
    # the threshold is the lower median of round-0
    # supports (data-derived, so the peel bites at every SF). Every
    # round frame is MATERIALIZED — each is referenced several times
    # (the 2^rounds inlining lesson)
    def _truss_round(r: int) -> str:
        return f"""
e{r} AS MATERIALIZED (SELECT u, v FROM s{r - 1}, thr WHERE sup >= thr.thr),
sym{r} AS MATERIALIZED (SELECT u AS src, v AS dst FROM e{r}
                        UNION ALL SELECT v AS src, u AS dst FROM e{r}),
s{r} AS MATERIALIZED (
  SELECT e{r}.u, e{r}.v, COALESCE(cn.s, 0) AS sup
  FROM e{r} LEFT JOIN (
    SELECT e{r}.u AS u, e{r}.v AS v, COUNT(*) AS s
    FROM e{r}
    JOIN sym{r} a ON a.src = e{r}.u
    JOIN sym{r} b2 ON b2.src = e{r}.v AND b2.dst = a.dst
    GROUP BY 1, 2
  ) cn ON cn.u = e{r}.u AND cn.v = e{r}.v
),"""

    _truss_stats = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round,"
        f" (SELECT CAST(thr AS BIGINT) FROM thr) AS threshold,"
        f" (SELECT CAST(COUNT(*) AS BIGINT) FROM s{r}) AS n_edges,"
        f" (SELECT CAST(COUNT(DISTINCT x) AS BIGINT) FROM"
        f" (SELECT u AS x FROM s{r} UNION ALL SELECT v FROM s{r}))"
        f" AS n_nodes"
        for r in range(0, 4)
    )
    d["supplier_ktruss_profile"] = (
        """
WITH bsk AS (
  SELECT l_orderkey, list_sort(list(DISTINCT l_suppkey))[1:4] AS ss
  FROM lineitem GROUP BY l_orderkey
),
eb AS (SELECT unnest(ss) AS src, ss FROM bsk),
ep AS (SELECT src, unnest(ss) AS dst FROM eb),
sym0 AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst, COUNT(*) AS sup FROM ep WHERE src <> dst GROUP BY 1, 2
  ) WHERE sup >= 4
),
uv0 AS MATERIALIZED (SELECT src AS u, dst AS v FROM sym0 WHERE src < dst),
s0 AS MATERIALIZED (
  SELECT uv0.u, uv0.v, COALESCE(cn.s, 0) AS sup
  FROM uv0 LEFT JOIN (
    SELECT uv0.u AS u, uv0.v AS v, COUNT(*) AS s
    FROM uv0
    JOIN sym0 a ON a.src = uv0.u
    JOIN sym0 b2 ON b2.src = uv0.v AND b2.dst = a.dst
    GROUP BY 1, 2
  ) cn ON cn.u = uv0.u AND cn.v = uv0.v
),
thr AS (
  SELECT MIN(sup) AS thr FROM (
    SELECT sup, SUM(cnt) OVER (ORDER BY sup ASC) AS cum,
           SUM(cnt) OVER () AS n
    FROM (SELECT sup, COUNT(*) AS cnt FROM s0 GROUP BY sup)
  ) WHERE cum >= (n + 1) // 2
),"""
        + "".join(_truss_round(r) for r in range(1, 4)).rstrip(",")
        + "\n"
        + _truss_stats
    )

    # exact stratified holdout: per-source rank in (md5, doc_id) order,
    # integer-threshold cuts at 8n/10 and 9n/10
    d["stratified_holdout_exact"] = """
WITH d AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n_toks,
         md5(CAST(doc_id AS VARCHAR)) AS k
  FROM documents
), r AS (
  SELECT source, n_toks,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY k ASC, doc_id ASC) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS n_src
  FROM d
), s AS (
  SELECT source, n_toks,
         CASE WHEN rk <= 8 * n_src // 10 THEN 'train'
              WHEN rk <= 9 * n_src // 10 THEN 'val'
              ELSE 'test' END AS split
  FROM r
)
SELECT source, split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens
FROM s GROUP BY source, split
"""

    # n-gram novelty: first-occurrence attribution (MIN(doc_id) per
    # gram); DuckDB list slicing t[i:i+4] is 1-based INCLUSIVE = the
    # 5-gram at i, matching Spark's slice(toks, i, 5)
    d["ngram_novelty_curve"] = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), g AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks) - 3),
                                 i -> array_to_string(toks[i:i+4], ' ')))
             AS gram
    FROM t WHERE len(toks) >= 5
  )
), f AS (
  SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram
), p AS (
  SELECT g.doc_id,
         COUNT(*) AS n_grams,
         SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS n_novel
  FROM g JOIN f USING (gram) GROUP BY g.doc_id
)
SELECT doc_id,
       CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_novel AS BIGINT) AS n_novel,
       CAST(1000000 * n_novel // n_grams AS BIGINT) AS novelty_ppm
FROM p
"""

    # RLE8 BMP: the oracle rebuilds the decoded RGB raster directly —
    # index bytes from md5, palette (i, 7i, 13i) mod 256 (RLE itself is
    # lossless framing, so pixels are a pure md5 function)
    _bmp_hex = lambda c: (  # noqa: E731 — 2-char lowercase hex of expr c
        f"(substring('{_jp}', ({c}) // 16 + 1, 1)"
        f" || substring('{_jp}', ({c}) % 16 + 1, 1))"
    )

    def _bmp_h6(idx: str) -> str:
        # palette triple hex of index expression: (i, 7i%256, 13i%256)
        return (
            f"({_bmp_hex(idx)} || {_bmp_hex(f'(7 * ({idx})) % 256')}"
            f" || {_bmp_hex(f'(13 * ({idx})) % 256')})"
        )

    _bmp_lits = " || ".join(
        _bmp_h6(_cjb("(g.y + %d) %% 16" % x)) for x in range(8, 13)
    )
    # header-only metadata scan: the fixture dims are closed-form in
    # md5(text) nibbles (engine encodes REAL containers at those dims,
    # then parses them back header-only), so the oracle recomputes every
    # row arithmetically — one mis-parsed header byte breaks the hash
    _nib = (
        lambda i: "strpos('0123456789abcdef', substring(m, "
        f"{i}, 1)) - 1"
    )
    d["multimodal_image_metadata"] = f"""
WITH m AS (SELECT doc_id, md5(text) AS m FROM documents),
n AS (
  SELECT doc_id,
         {_nib(1)} AS n0, {_nib(2)} AS n1, {_nib(3)} AS n2,
         {_nib(4)} AS n3, {_nib(5)} AS n4, {_nib(6)} AS n5,
         {_nib(7)} AS n6, {_nib(8)} AS n7
  FROM m
)
SELECT doc_id, 'png' AS fmt, CAST(9 + n0 AS BIGINT) AS width,
       CAST(9 + n1 AS BIGINT) AS height, CAST(8 AS BIGINT) AS bit_depth,
       CAST(1 AS BIGINT) AS n_components
FROM n
UNION ALL
SELECT doc_id, 'jpeg', CAST(8 * (1 + n2 % 2) AS BIGINT),
       CAST(8 * (1 + n3 % 2) AS BIGINT), CAST(8 AS BIGINT),
       CAST(3 AS BIGINT)
FROM n
UNION ALL
SELECT doc_id, 'gif', CAST(5 + n4 AS BIGINT), CAST(5 + n5 AS BIGINT),
       CAST(8 AS BIGINT), CAST(1 AS BIGINT)
FROM n
UNION ALL
SELECT doc_id, 'bmp', CAST(5 + n6 AS BIGINT),
       CAST(3 + n7 % 8 AS BIGINT), CAST(8 AS BIGINT), CAST(1 AS BIGINT)
FROM n
"""

    # header-only AUDIO metadata scan: every field closed-form in the
    # md5 nibbles (the image-metadata convention); adpcm data bytes =
    # 4-byte block header + one nibble per sample after the first
    d["multimodal_audio_metadata"] = f"""
WITH m AS (SELECT doc_id, md5(text) AS m FROM documents),
n AS (
  SELECT doc_id,
         {_nib(9)} AS n8, {_nib(10)} AS n9, {_nib(11)} AS n10,
         {_nib(12)} AS n11, {_nib(13)} AS n12, {_nib(14)} AS n13
  FROM m
)
SELECT doc_id, 'pcm' AS codec, CAST(1 AS BIGINT) AS fmt_tag,
       CAST(1 + n8 % 2 AS BIGINT) AS n_channels,
       CAST(8000 + 100 * n9 AS BIGINT) AS sample_rate,
       CAST(8 AS BIGINT) AS bits_per_sample,
       CAST((40 + n10) * (1 + n8 % 2) AS BIGINT) AS data_bytes,
       CAST(40 + n10 AS BIGINT) AS n_samples
FROM n
UNION ALL
SELECT doc_id, 'adpcm', CAST(17 AS BIGINT), CAST(1 AS BIGINT),
       CAST(8000 AS BIGINT), CAST(4 AS BIGINT),
       CAST(4 + (30 + n11) // 2 AS BIGINT), CAST(30 + n11 AS BIGINT)
FROM n
UNION ALL
SELECT doc_id, 'ulaw', CAST(7 AS BIGINT), CAST(1 AS BIGINT),
       CAST(8000 AS BIGINT), CAST(8 AS BIGINT),
       CAST(20 + n12 AS BIGINT), CAST(20 + n12 AS BIGINT)
FROM n
UNION ALL
SELECT doc_id, 'alaw', CAST(6 AS BIGINT), CAST(1 AS BIGINT),
       CAST(8000 AS BIGINT), CAST(8 AS BIGINT),
       CAST(20 + n13 AS BIGINT), CAST(20 + n13 AS BIGINT)
FROM n
"""

    d["multimodal_bmp_rle_decode"] = f"""
WITH base AS (
  SELECT doc_id, md5(text) AS m FROM documents
), rows_ AS (
  SELECT doc_id, CAST(g.y AS INTEGER) AS y,
         repeat({_bmp_h6(_cjb('g.y'))}, 8)
           || {_bmp_lits}
           || repeat({_bmp_h6(_cjb('15 - g.y'))}, 3) AS rowhex
  FROM base, (SELECT unnest(range(16)) AS y) g
)
SELECT doc_id,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST(768 AS BIGINT) AS n_px_bytes,
       sha256(string_agg(rowhex, '' ORDER BY y)) AS pixel_sha
FROM rows_ GROUP BY doc_id
"""

    # G.711 µ-law + A-law round-trip: per-sample (memoryless) companding
    # replayed independently per sample — sign/clip/bias, threshold-CASE
    # segment (the floor-log2), mantissa, and the exact reconstruction
    # shifts, for BOTH laws. The 64-sample payload is the 8-distinct-
    # sample block repeated 8x, so payload hex = repeat(hex8, 8) and
    # the distortion sums are 8x the per-block sums. Arithmetic-shift
    # (s >> 3) is floor division, so the negative branch is explicit.
    # A-law's negative fold is ONE'S complement (-p - 1), its sign bit
    # marks POSITIVE samples, and bytes XOR 0x55.
    _g7_hex = lambda c: (  # noqa: E731 — 2-char lowercase hex of column c
        f"(substring('{_jp}', {c} // 16 + 1, 1)"
        f" || substring('{_jp}', {c} % 16 + 1, 1))"
    )
    d["multimodal_g711_roundtrip"] = f"""
WITH base AS (
  SELECT doc_id, md5(text) AS m FROM documents
), smp AS (
  SELECT doc_id, CAST(g.i AS INTEGER) AS i,
         ({_cjb('2 * g.i')} - 128) * 255 + ({_cjb('2 * g.i + 1')} - 128) AS s
  FROM base, (SELECT unnest(range(8)) AS i) g
), mu1 AS (
  SELECT doc_id, i, s,
         s < 0 AS neg,
         LEAST(ABS(s), 32635) + 132 AS mm,
         CASE WHEN s >= 0 THEN s // 8 ELSE -((-s + 7) // 8) END AS ap0
  FROM smp
), mu2 AS (
  SELECT *,
         CASE WHEN mm >= 16384 THEN 7 WHEN mm >= 8192 THEN 6
              WHEN mm >= 4096 THEN 5 WHEN mm >= 2048 THEN 4
              WHEN mm >= 1024 THEN 3 WHEN mm >= 512 THEN 2
              WHEN mm >= 256 THEN 1 ELSE 0 END AS uexp,
         CASE WHEN ap0 < 0 THEN -ap0 - 1 ELSE ap0 END AS ap
  FROM mu1
), mu3 AS (
  SELECT *,
         (mm // (8 * (1 << uexp))) % 16 AS umant,
         CASE WHEN ap <= 31 THEN 0 WHEN ap <= 63 THEN 1
              WHEN ap <= 127 THEN 2 WHEN ap <= 255 THEN 3
              WHEN ap <= 511 THEN 4 WHEN ap <= 1023 THEN 5
              WHEN ap <= 2047 THEN 6 ELSE 7 END AS aseg
  FROM mu2
), mu4 AS (
  SELECT *,
         255 - ((CASE WHEN neg THEN 128 ELSE 0 END) + uexp * 16 + umant)
           AS ubyte,
         (umant * 8 + 132) * (1 << uexp) - 132 AS umag,
         CASE WHEN aseg < 2 THEN (ap // 2) % 16
              ELSE (ap // (1 << aseg)) % 16 END AS amant
  FROM mu3
), mu5 AS (
  SELECT *,
         xor((CASE WHEN neg THEN 0 ELSE 128 END) + aseg * 16 + amant, 85)
           AS abyte,
         CASE WHEN aseg = 0 THEN amant * 16 + 8
              WHEN aseg = 1 THEN amant * 16 + 264
              ELSE (amant * 16 + 264) * (1 << (aseg - 1)) END AS amag
  FROM mu4
), px AS (
  SELECT doc_id, i, s,
         ubyte, abyte,
         CASE WHEN neg THEN -umag ELSE umag END AS urecon,
         CASE WHEN neg THEN -amag ELSE amag END AS arecon
  FROM mu5
)
SELECT doc_id,
       CAST(64 AS BIGINT) AS n_samples,
       CAST(120 AS BIGINT) AS n_wav_bytes,
       sha256(repeat(string_agg({_g7_hex('ubyte')}, '' ORDER BY i), 8))
         AS ulaw_sha,
       sha256(repeat(string_agg({_g7_hex('abyte')}, '' ORDER BY i), 8))
         AS alaw_sha,
       CAST(8 * SUM(ABS(urecon)) AS BIGINT) AS ulaw_sum_abs_recon,
       CAST(8 * SUM(ABS(arecon)) AS BIGINT) AS alaw_sum_abs_recon,
       CAST(8 * SUM((s - urecon) * (s - urecon)) AS BIGINT) AS ulaw_err_sq,
       CAST(8 * SUM((s - arecon) * (s - arecon)) AS BIGINT) AS alaw_err_sq
FROM px GROUP BY doc_id
"""

    # compaction plan: deterministic start-offset packing of the
    # (day, event_type) cells into ~12 row-balanced output files
    d["compaction_plan_report"] = """
WITH cells AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM events GROUP BY 1, 2
), tot AS (SELECT SUM(n_rows) AS total_rows FROM cells),
cum AS (
  SELECT day, n_rows,
         SUM(n_rows) OVER (ORDER BY day ASC, event_type ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rows
  FROM cells
), planned AS (
  SELECT c.day, c.n_rows,
         GREATEST(1, t.total_rows // 12) AS target_rows,
         c.cum_rows - c.n_rows AS cum_before
  FROM cum c CROSS JOIN tot t
)
SELECT CAST(cum_before // target_rows AS BIGINT) AS out_file_id,
       CAST(COUNT(*) AS BIGINT) AS n_source_parts,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       MIN(day) AS first_day,
       MAX(day) AS last_day,
       CAST(MAX(target_rows) AS BIGINT) AS target_rows,
       CAST(1000000 * SUM(n_rows) // MAX(target_rows) AS BIGINT)
         AS fill_ppm
FROM planned GROUP BY 1
"""

    # Mann-Kendall: bounded (type, day) frame, pairwise sign fold +
    # tie-adjusted variance numerator, all-integer
    d["mann_kendall_trend"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS y
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type,
         COALESCE(SUM(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1
                           ELSE 0 END), 0) AS s_stat,
         COUNT(*) AS n_pairs
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
  GROUP BY 1
), ties AS (
  -- SUM(t) == day count (ADVICE r9: COUNT(*) counted distinct daily
  -- values, undercounting n_days whenever two days tie on the sum)
  SELECT event_type, SUM(t) AS n_days,
         SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
  FROM (SELECT event_type, y, COUNT(*) AS t FROM daily GROUP BY 1, 2)
  GROUP BY 1
)
SELECT p.event_type,
       CAST(t.n_days AS BIGINT) AS n_days,
       CAST(p.n_pairs AS BIGINT) AS n_pairs,
       CAST(p.s_stat AS BIGINT) AS s_stat,
       CAST(CASE WHEN p.n_pairs = 0 THEN 0
            WHEN p.s_stat >= 0 THEN 1000000 * p.s_stat // p.n_pairs
            ELSE -(1000000 * (-p.s_stat) // p.n_pairs) END AS BIGINT)
         AS tau_ppm,
       CAST(t.n_days * (t.n_days - 1) * (2 * t.n_days + 5) - t.tie_term
            AS BIGINT) AS var18
FROM pairs p JOIN ties t USING (event_type)
"""

    # Theil-Sen: median pairwise slope under the collision-free
    # nanocent fixed-point order key (truncation toward zero on both
    # engines; sign split keeps the floor divisions nonnegative)
    d["theil_sen_slope"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS y
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type, a.day AS day_i, b.day AS day_j,
         b.y - a.y AS dy, date_diff('day', a.day, b.day) AS dx
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
), keyed AS (
  SELECT event_type, day_i, day_j,
         CAST(CASE WHEN dy >= 0 THEN
                (1000000000 * CAST(dy AS HUGEINT)) // dx
              ELSE -((1000000000 * CAST(-dy AS HUGEINT)) // dx)
              END AS BIGINT) AS slope_nanos
  FROM pairs
), ranked AS (
  SELECT event_type, slope_nanos,
         ROW_NUMBER() OVER (PARTITION BY event_type
           ORDER BY slope_nanos ASC, day_i ASC, day_j ASC) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_slopes
  FROM keyed
)
SELECT event_type,
       CAST(MAX(n_slopes) AS BIGINT) AS n_slopes,
       CAST(MIN(slope_nanos) AS BIGINT) AS sen_lo_nanos,
       CAST(MAX(slope_nanos) AS BIGINT) AS sen_hi_nanos
FROM ranked
WHERE rn = (n_slopes + 1) // 2 OR rn = n_slopes // 2 + 1
GROUP BY event_type
"""

    # per-group Theil-Sen at nation grain: monthly revenue cents per
    # customer nation, micro-cents/month fixed-point slope key (the r9
    # collision-freedom argument re-derived for the ~100-month span)
    d["theil_sen_monthly_nation_revenue"] = """
WITH monthly AS (
  SELECT n.n_name,
         CAST(EXTRACT(year FROM o.o_orderdate) * 12
              + EXTRACT(month FROM o.o_orderdate) - 1 AS BIGINT) AS m,
         SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS y
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
), pairs AS (
  SELECT a.n_name, a.m AS m_i, b.m AS m_j,
         b.y - a.y AS dy, b.m - a.m AS dx
  FROM monthly a JOIN monthly b
    ON a.n_name = b.n_name AND a.m < b.m
), keyed AS (
  SELECT n_name, m_i, m_j,
         CAST(CASE WHEN dy >= 0 THEN
                (1000000 * CAST(dy AS HUGEINT)) // dx
              ELSE -((1000000 * CAST(-dy AS HUGEINT)) // dx)
              END AS BIGINT) AS slope_micros
  FROM pairs
), ranked AS (
  SELECT n_name, slope_micros,
         ROW_NUMBER() OVER (PARTITION BY n_name
           ORDER BY slope_micros ASC, m_i ASC, m_j ASC) AS rn,
         COUNT(*) OVER (PARTITION BY n_name) AS n_slopes
  FROM keyed
)
SELECT n_name,
       CAST(MAX(n_slopes) AS BIGINT) AS n_slopes,
       CAST(MIN(slope_micros) AS BIGINT) AS sen_lo_micros,
       CAST(MAX(slope_micros) AS BIGINT) AS sen_hi_micros
FROM ranked
WHERE rn = (n_slopes + 1) // 2 OR rn = n_slopes // 2 + 1
GROUP BY n_name
"""

    # Pettitt: U_t via the bounded pairs x thresholds band join; first
    # day attaining max |U_t| (tie-break day ASC), all-integer
    d["pettitt_change_point"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS y
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type, a.day AS day_i, b.day AS day_j,
         CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END
           AS sgn
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
), thresholds AS (
  SELECT d.event_type, d.day AS t_day
  FROM daily d
  JOIN (SELECT event_type, MAX(day) AS max_day
        FROM daily GROUP BY 1) m
    ON d.event_type = m.event_type AND d.day < m.max_day
), ut AS (
  SELECT t.event_type, t.t_day, CAST(SUM(p.sgn) AS BIGINT) AS u
  FROM thresholds t JOIN pairs p
    ON p.event_type = t.event_type
   AND p.day_i <= t.t_day AND p.day_j > t.t_day
  GROUP BY 1, 2
), picked AS (
  SELECT event_type, t_day, u,
         ROW_NUMBER() OVER (PARTITION BY event_type
           ORDER BY ABS(u) DESC, t_day ASC) AS rn
  FROM ut
), nd AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily GROUP BY 1
)
SELECT p.event_type, nd.n_days,
       CAST(ABS(p.u) AS BIGINT) AS k_stat,
       p.u AS u_at_k,
       p.t_day AS change_day
FROM picked p JOIN nd USING (event_type)
WHERE p.rn = 1
"""

    # ------------------------------------------------------------------
    # round 11: perceptual image hashing family — the sig CTE chain is
    # shared between the per-doc hash table and the banded pair join
    # (prototype-verified bit-equal to the python reference on all 500
    # sf0.001 docs before registration)
    # ------------------------------------------------------------------
    d["image_perceptual_hashes"] = (
        "WITH " + _phash_sig_sql() + """
SELECT doc_id, dhash, ahash FROM psig
"""
    )

    d["image_dhash_near_dup_pairs"] = (
        "WITH " + _phash_sig_sql() + """,
pbanded AS (
  SELECT doc_id, dhash, ahash, t, (dhash >> (16 * t)) & 65535 AS band_val
  FROM psig, (SELECT unnest(range(4))::INT AS t) bands
),
pcand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.dhash AS da, b.dhash AS db, a.ahash AS aa, b.ahash AS ab
  FROM pbanded a
  JOIN pbanded b ON a.t = b.t AND a.band_val = b.band_val
                AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(da, db)) AS INTEGER) AS dhash_hamming,
       CAST(bit_count(xor(aa, ab)) AS INTEGER) AS ahash_hamming
FROM pcand
WHERE bit_count(xor(da, db)) <= 3
"""
    )

    # histogram equalization: the fixture raster is repeat(md5(text), 8),
    # so per-char counts x8 give the histogram and the integer CDF remap
    # is closed-form; sha256 over the lowercase-hex transport (the r6
    # JPEG convention — equalized bytes aren't valid UTF-8)
    d["image_histogram_equalization"] = """
WITH m AS (SELECT doc_id, md5(text) AS m FROM documents),
ch AS (
  SELECT doc_id, i.i AS i, ascii(substring(m, (i.i % 32) + 1, 1)) AS v
  FROM m, (SELECT unnest(range(256))::INT AS i) i
),
hist AS (SELECT doc_id, v, COUNT(*) AS cnt FROM ch GROUP BY doc_id, v),
cdf AS (
  SELECT doc_id, v, cnt,
         SUM(cnt) OVER (PARTITION BY doc_id ORDER BY v) AS cdf
  FROM hist
),
mins AS (SELECT doc_id, MIN(cdf) AS cdf_min FROM cdf GROUP BY doc_id),
lut AS (
  SELECT c.doc_id, c.v,
         CAST(CASE WHEN 256 - mi.cdf_min > 0
              THEN (c.cdf - mi.cdf_min) * 255 // (256 - mi.cdf_min)
              ELSE 0 END AS BIGINT) AS ev
  FROM cdf c JOIN mins mi ON mi.doc_id = c.doc_id
),
eq AS (
  SELECT ch.doc_id, ch.i, l.ev
  FROM ch JOIN lut l ON l.doc_id = ch.doc_id AND l.v = ch.v
),
hexes AS (
  SELECT doc_id,
         string_agg(lpad(lower(to_hex(ev)), 2, '0'), '' ORDER BY i) AS hx
  FROM eq GROUP BY doc_id
),
stats AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_levels_in,
         CAST(COUNT(DISTINCT ev) AS BIGINT) AS n_levels_out,
         CAST(MIN(ev) AS BIGINT) AS eq_min,
         CAST(MAX(ev) AS BIGINT) AS eq_max
  FROM lut GROUP BY doc_id
)
SELECT s.doc_id, s.n_levels_in, s.n_levels_out, s.eq_min, s.eq_max,
       sha256(h.hx) AS eq_sha
FROM stats s JOIN hexes h ON h.doc_id = s.doc_id
"""

    # Cramér's V: per-cell floored chi2*N ladder (HUGEINT == the Spark
    # DECIMAL(38,0) chain within the documented N <= ~3e9 domain)
    d["cramers_v_event_dow"] = """
WITH obs AS (
  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS iso_dow,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
), rl AS (SELECT DISTINCT event_type FROM obs),
cl AS (SELECT DISTINCT iso_dow FROM obs),
cells AS (
  SELECT rl.event_type, cl.iso_dow, COALESCE(o0.o, 0) AS o
  FROM rl CROSS JOIN cl
  LEFT JOIN obs o0
    ON o0.event_type = rl.event_type AND o0.iso_dow = cl.iso_dow
), r AS (SELECT event_type, SUM(o) AS r FROM cells GROUP BY 1),
c AS (SELECT iso_dow, SUM(o) AS c FROM cells GROUP BY 1),
n AS (
  SELECT SUM(o) AS n, COUNT(DISTINCT event_type) AS n_rows,
         COUNT(DISTINCT iso_dow) AS n_cols
  FROM cells
), summed AS (
  SELECT n.n, n.n_rows, n.n_cols,
         SUM((CAST(n.n AS HUGEINT) * cells.o - CAST(r.r AS HUGEINT) * c.c)
             * (CAST(n.n AS HUGEINT) * cells.o - CAST(r.r AS HUGEINT) * c.c)
             // (CAST(r.r AS HUGEINT) * c.c)) AS chi2n_floor
  FROM cells
  JOIN r ON cells.event_type = r.event_type
  JOIN c ON cells.iso_dow = c.iso_dow
  CROSS JOIN n
  GROUP BY n.n, n.n_rows, n.n_cols
)
SELECT CAST(n AS BIGINT) AS n_events,
       CAST(n_rows AS BIGINT) AS n_levels_row,
       CAST(n_cols AS BIGINT) AS n_levels_col,
       CAST(chi2n_floor AS BIGINT) AS chi2n_floor,
       CASE WHEN least(n_rows, n_cols) - 1 > 0
            THEN CAST(CAST(chi2n_floor AS HUGEINT) * 1000000
                 // (CAST(n AS HUGEINT) * n * (least(n_rows, n_cols) - 1))
                 AS BIGINT)
            ELSE 0 END AS v2_ppm
FROM summed
"""

    # hard-negative mining: the ivfpq exact-arm ranking restricted to
    # label-mismatched candidates; score = the one-time double cast of
    # the exact DECIMAL(28,14) dot (decimal-sum→double convention)
    d["hard_negative_mining"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q, label AS query_label
  FROM embeddings WHERE vec_id < 4
), c AS (
  SELECT vec_id AS neighbor_id, embedding AS c, label AS neighbor_label
  FROM embeddings WHERE vec_id >= 4
), s AS (
  SELECT query_id, query_label, neighbor_id, neighbor_label,
         {dot64.format(a='q', b='c')} AS ord_key
  FROM c, q
  WHERE neighbor_label <> query_label
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY ord_key DESC, neighbor_id ASC) AS rank
  FROM s
)
SELECT query_id, query_label, CAST(rank AS BIGINT) AS rank,
       neighbor_id, neighbor_label
FROM r WHERE rank <= 10
"""

    # dHash resize-robustness audit: both hash grids replay as pure
    # compositions of the pinned floor resample (the 12x12 branch is
    # idx = ((r*12 DIV 8)*16 DIV 12)*16 + ((c*12 DIV 9)*16 DIV 12));
    # prototype-verified bit-equal on all 500 sf0.001 docs
    d["image_dhash_resize_robustness"] = """
WITH pbase AS (
  SELECT doc_id,
         array_to_string(list_slice(string_split(text, ' '), 1, 20), ' ')
           AS pfx,
         md5(text) AS mt
  FROM documents
),
prep AS (
  SELECT doc_id,
         md5(pfx || ':0') || md5(pfx || ':1') || md5(pfx || ':2')
         || md5(pfx || ':3') || md5(pfx || ':4') || md5(pfx || ':5')
         || md5(pfx || ':6') || md5(pfx || ':7') AS r256,
         (strpos('0123456789abcdef', substring(mt, 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substring(mt, 2, 1)) - 1) AS p
  FROM pbase
),
grids AS (
  SELECT doc_id, r256, p, rr.r AS r, cc.c AS c,
         (2 * rr.r) * 16 + (16 * cc.c) // 9 AS idx_a,
         (((rr.r * 12 // 8) * 16) // 12) * 16
           + (((cc.c * 12 // 9) * 16) // 12) AS idx_b
  FROM prep, (SELECT unnest(range(8))::INT AS r) rr,
             (SELECT unnest(range(9))::INT AS c) cc
),
vals AS (
  SELECT doc_id, r, c,
         CASE WHEN idx_a = p THEN 122
              ELSE ascii(substring(r256, idx_a + 1, 1)) END AS va,
         CASE WHEN idx_b = p THEN 122
              ELSE ascii(substring(r256, idx_b + 1, 1)) END AS vb
  FROM grids
),
bits AS (
  SELECT a.doc_id, a.r, a.c,
         CASE WHEN b.va > a.va THEN 1 ELSE 0 END AS bit_a,
         CASE WHEN b.vb > a.vb THEN 1 ELSE 0 END AS bit_b
  FROM vals a
  JOIN vals b ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
  WHERE a.c < 8
),
sigs AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN r = 7 AND c = 7
                       THEN bit_a * (-9223372036854775807 - 1)
                       ELSE bit_a * (1::BIGINT << (r * 8 + c)) END)
              AS BIGINT) AS da,
         CAST(SUM(CASE WHEN r = 7 AND c = 7
                       THEN bit_b * (-9223372036854775807 - 1)
                       ELSE bit_b * (1::BIGINT << (r * 8 + c)) END)
              AS BIGINT) AS db
  FROM bits GROUP BY doc_id
)
SELECT doc_id, da AS dhash_orig, db AS dhash_resized,
       CAST(bit_count(xor(da, db)) AS BIGINT) AS hamming
FROM sigs
"""

    # degree assortativity: symmetric-marginal Pearson collapses the
    # sqrt — pure integer ratio in sign-split ppm over the same edge CTE
    d["copurchase_degree_assortativity"] = """
WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
und AS (
  SELECT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 5
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY src),
scored AS (
  SELECT du.deg AS deg_u, dv.deg AS deg_v
  FROM und e JOIN deg du ON du.src = e.src JOIN deg dv ON dv.src = e.dst
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m_edges,
         CAST(SUM(deg_u) AS BIGINT) AS sum_deg,
         SUM(CAST(deg_u AS HUGEINT) * deg_u) AS sx2,
         SUM(CAST(deg_u AS HUGEINT) * deg_v) AS sxy
  FROM scored
)
SELECT m_edges, sum_deg,
       CAST(sx2 AS BIGINT) AS sum_deg_sq,
       CAST(sxy AS BIGINT) AS sum_deg_prod,
       CAST(CASE
         WHEN m_edges * sx2 - CAST(sum_deg AS HUGEINT) * sum_deg = 0 THEN 0
         WHEN m_edges * sxy - CAST(sum_deg AS HUGEINT) * sum_deg >= 0 THEN
           (m_edges * sxy - CAST(sum_deg AS HUGEINT) * sum_deg) * 1000000
           // (m_edges * sx2 - CAST(sum_deg AS HUGEINT) * sum_deg)
         ELSE -((CAST(sum_deg AS HUGEINT) * sum_deg - m_edges * sxy)
           * 1000000
           // (m_edges * sx2 - CAST(sum_deg AS HUGEINT) * sum_deg))
       END AS BIGINT) AS assortativity_ppm
FROM m
"""

    # cross-source dup matrix: prefix-fingerprint incidence, df cap,
    # normalized source-pair rollup
    d["cross_source_dup_matrix"] = """
WITH inc AS (
  SELECT md5(array_to_string(
           list_slice(string_split(text, ' '), 1, 20), ' ')) AS fingerprint,
         doc_id, source
  FROM documents
),
ok AS (
  SELECT fingerprint FROM inc GROUP BY fingerprint HAVING COUNT(*) <= 50
),
capped AS (SELECT i.* FROM inc i JOIN ok USING (fingerprint))
SELECT LEAST(a.source, b.source) AS source_a,
       GREATEST(a.source, b.source) AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT a.fingerprint) AS BIGINT) AS n_fingerprints
FROM capped a JOIN capped b
  ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""

    # GROUP BY ALL / ORDER BY ALL: the SAME SQL text on both engines
    d["group_by_all_revenue"] = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
FROM lineitem
GROUP BY ALL
ORDER BY ALL
"""

    # Good-Turing frequency-of-frequencies over trigrams: exact-ppm
    # smoothed counts via the r -> r+1 self-join on the N_r frame
    d["good_turing_vocab_report"] = """
WITH docs AS (SELECT string_split(text, ' ') AS toks FROM documents),
grams AS (
  SELECT unnest(list_transform(range(1, len(toks) - 1),
           i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS gram
  FROM docs
),
g3 AS (
  SELECT gram FROM grams WHERE len(string_split(gram, ' ')) = 3
),
counts AS (SELECT gram, COUNT(*) AS r FROM g3 GROUP BY gram),
nr AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM counts GROUP BY r)
SELECT CAST(a.r AS BIGINT) AS r, a.n_r,
       CAST(COALESCE((a.r + 1) * b.n_r * 1000000 // a.n_r, 0) AS BIGINT)
         AS r_star_ppm
FROM nr a LEFT JOIN nr b ON b.r = a.r + 1
"""

    # Heaps'-law curve: first-occurrence attribution x power-of-2
    # doc-prefix checkpoints (checkpoint list generated from the corpus
    # row count — shared arithmetic with the Spark driver loop)
    d["heaps_law_curve"] = """
WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
cps AS (
  SELECT DISTINCT cp FROM (
    SELECT LEAST(1::BIGINT << CAST(j AS INT), n_docs) AS cp
    FROM n, (SELECT unnest(range(40))::BIGINT AS j) jj
    WHERE (1::BIGINT << CAST(j AS INT)) < 2 * n_docs
  )
),
graw AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
           i -> array_to_string(
                  list_slice(string_split(text, ' '), i, i + 2), ' ')))
           AS gram
  FROM documents
),
grams AS (
  SELECT doc_id, gram FROM graw WHERE len(string_split(gram, ' ')) = 3
),
first_occ AS (SELECT gram, MIN(doc_id) AS first_doc FROM grams GROUP BY gram),
vocab AS (
  SELECT cp, CAST(COUNT(*) AS BIGINT) AS vocab_size
  FROM first_occ, cps WHERE first_doc < cp GROUP BY cp
),
lens AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nt FROM grams GROUP BY doc_id
),
mass AS (
  SELECT cp, CAST(SUM(nt) AS BIGINT) AS n_gram_instances
  FROM lens, cps WHERE doc_id < cp GROUP BY cp
)
SELECT v.cp AS n_docs_prefix, m.n_gram_instances, v.vocab_size,
       CAST(v.vocab_size * 1000000 // m.n_gram_instances AS BIGINT)
         AS vocab_per_gram_ppm
FROM vocab v JOIN mass m ON v.cp = m.cp
"""

    # quadrant-hash crop pairs: per-quadrant 56-bit gradient signatures
    # replayed from the md5-chain raster; equi-join on (q, sig)
    d["image_quadrant_dup_pairs"] = """
WITH pbase AS (
  SELECT doc_id,
         array_to_string(list_slice(string_split(text, ' '), 1, 20), ' ')
           AS pfx,
         md5(text) AS mt
  FROM documents
),
prep AS (
  SELECT doc_id,
         md5(pfx || ':0') || md5(pfx || ':1') || md5(pfx || ':2')
         || md5(pfx || ':3') || md5(pfx || ':4') || md5(pfx || ':5')
         || md5(pfx || ':6') || md5(pfx || ':7') AS r256,
         (strpos('0123456789abcdef', substring(mt, 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substring(mt, 2, 1)) - 1) AS p
  FROM pbase
),
qgrid AS (
  SELECT doc_id, r256, p, qq.q AS q, rr.r AS r, cc.c AS c,
         (8 * (qq.q // 2) + rr.r) * 16 + 8 * (qq.q % 2) + cc.c AS idx
  FROM prep, (SELECT unnest(range(4))::INT AS q) qq,
             (SELECT unnest(range(8))::INT AS r) rr,
             (SELECT unnest(range(8))::INT AS c) cc
),
qvals AS (
  SELECT doc_id, q, r, c,
         CASE WHEN idx = p THEN 122
              ELSE ascii(substring(r256, idx + 1, 1)) END AS v
  FROM qgrid
),
qbits AS (
  SELECT a.doc_id, a.q, a.r, a.c,
         CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
  FROM qvals a JOIN qvals b
    ON b.doc_id = a.doc_id AND b.q = a.q AND b.r = a.r AND b.c = a.c + 1
  WHERE a.c < 7
),
qsigs AS (
  SELECT doc_id, q,
         CAST(SUM(bit * (1::BIGINT << (r * 7 + c))) AS BIGINT) AS qsig
  FROM qbits GROUP BY 1, 2
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_quadrants_match
FROM qsigs a JOIN qsigs b
  ON a.q = b.q AND a.qsig = b.qsig AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""

    # Bloom FPR curve: the k=1..4 filter family rebuilt arithmetically
    # (generic md5 digit fold with an expression start offset)
    _bloom_fold = " + ".join(
        "(strpos('0123456789abcdef',"
        f" substring(md, 1 + 8 * i + {j}, 1)) - 1) * {16 ** (7 - j)}"
        for j in range(8)
    )
    d["bloom_fpr_curve"] = f"""
WITH members AS (
  SELECT c_custkey AS key FROM customer WHERE c_acctbal < 0
),
probes AS (SELECT DISTINCT o_custkey AS key FROM orders),
kg AS (SELECT unnest(range(1, 5))::BIGINT AS k),
ii AS (SELECT unnest(range(4))::INT AS i),
sizing AS (
  SELECT 62 * ((COUNT(1) * 9 + 61) // 62) AS m_bits FROM members
),
marms AS (
  SELECT kg.k, t.key, ({_bloom_fold}) % s.m_bits AS pos
  FROM (SELECT key, md5(CAST(key AS VARCHAR)) AS md FROM members) t,
       ii, kg, sizing s
  WHERE ii.i < kg.k
),
words AS (
  SELECT k, pos // 62 AS word_idx,
         bit_or(1::BIGINT << CAST(pos % 62 AS INT)) AS word
  FROM marms GROUP BY 1, 2
),
parms AS (
  SELECT kg.k, t.key, ({_bloom_fold}) % s.m_bits AS pos
  FROM (SELECT key, md5(CAST(key AS VARCHAR)) AS md FROM probes) t,
       ii, kg, sizing s
  WHERE ii.i < kg.k
),
checked AS (
  SELECT p.k, p.key,
         CASE WHEN (COALESCE(w.word, 0) >> CAST(p.pos % 62 AS INT)) & 1 = 1
              THEN 1 ELSE 0 END AS hit
  FROM parms p
  LEFT JOIN words w ON w.k = p.k AND w.word_idx = p.pos // 62
),
verdicts AS (SELECT k, key, MIN(hit) AS all_hit FROM checked GROUP BY 1, 2),
labeled AS (
  SELECT v.k, v.all_hit,
         CASE WHEN m.key IS NULL THEN 0 ELSE 1 END AS is_member
  FROM verdicts v LEFT JOIN members m ON v.key = m.key
),
fill AS (
  SELECT k, CAST(SUM(bit_count(word)) AS BIGINT) AS n_bits_set
  FROM words GROUP BY 1
),
agg AS (
  SELECT k,
         CAST(COUNT(*) AS BIGINT) AS n_probes,
         CAST(SUM(1 - is_member) AS BIGINT) AS n_nonmembers,
         CAST(SUM(CASE WHEN all_hit = 1 AND is_member = 0 THEN 1 ELSE 0
                  END) AS BIGINT) AS n_false_positives
  FROM labeled GROUP BY 1
)
SELECT agg.k, agg.n_probes, agg.n_nonmembers, agg.n_false_positives,
       fill.n_bits_set,
       CAST(agg.n_false_positives * 1000000 // agg.n_nonmembers AS BIGINT)
         AS fpr_ppm
FROM agg JOIN fill ON agg.k = fill.k
"""

    # Spark 4 VARIANT parity: the same constructed nested document
    # extracted via DuckDB JSON paths (prototype-verified exact MATCH)
    d["variant_event_props_rollup"] = """
WITH j AS (
  SELECT event_type,
         '{"meta": {"type": "' || event_type || '", "vals": ['
         || CAST(CAST(user_id % 7 AS BIGINT) AS VARCHAR) || ', '
         || json_extract_string(props, '$.k')
         || ']}, "k": ' || json_extract_string(props, '$.k') || '}' AS v
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract_string(v, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(SUM(CAST(json_extract_string(v, '$.meta.vals[0]') AS BIGINT))
            AS BIGINT) AS sum_val0,
       CAST(SUM(CAST(json_extract_string(v, '$.meta.vals[1]') AS BIGINT))
            AS BIGINT) AS sum_val1,
       CAST(SUM(CASE WHEN json_extract_string(v, '$.meta.type')
                          = event_type THEN 1 ELSE 0 END) AS BIGINT)
         AS n_type_match,
       CAST(SUM(CASE WHEN json_extract_string(v, '$.missing') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_null
FROM j
GROUP BY event_type
"""

    # rendezvous sharding: HRW argmax over md5 hex strings (VARCHAR
    # lexicographic order — identical on every engine); both layouts
    # recomputed independently, the HRW no-move theorem checked by test
    d["rendezvous_shard_plan"] = """
WITH docs AS (SELECT doc_id FROM documents),
old_a AS (
  SELECT doc_id, arg_max(s, m) AS shard_old FROM (
    SELECT doc_id, ss.s AS s,
           md5(CAST(doc_id AS VARCHAR) || ':' || CAST(ss.s AS VARCHAR))
             AS m
    FROM docs, (SELECT unnest(range(8))::BIGINT AS s) ss
  ) GROUP BY doc_id
),
new_a AS (
  SELECT doc_id, arg_max(s, m) AS shard_new FROM (
    SELECT doc_id, ss.s AS s,
           md5(CAST(doc_id AS VARCHAR) || ':' || CAST(ss.s AS VARCHAR))
             AS m
    FROM docs, (SELECT unnest(range(9))::BIGINT AS s) ss
  ) GROUP BY doc_id
),
a AS (
  SELECT o.doc_id, o.shard_old, n.shard_new
  FROM old_a o JOIN new_a n ON o.doc_id = n.doc_id
),
co AS (SELECT shard_old AS shard, COUNT(*) AS n_at_old FROM a GROUP BY 1),
cn AS (SELECT shard_new AS shard, COUNT(*) AS n_at_new FROM a GROUP BY 1),
mv AS (
  SELECT shard_new AS shard, COUNT(*) AS n_moved_in
  FROM a WHERE shard_old <> shard_new GROUP BY 1
)
SELECT cn.shard,
       CAST(COALESCE(co.n_at_old, 0) AS BIGINT) AS n_at_old,
       CAST(cn.n_at_new AS BIGINT) AS n_at_new,
       CAST(COALESCE(mv.n_moved_in, 0) AS BIGINT) AS n_moved_in
FROM cn
LEFT JOIN co ON cn.shard = co.shard
LEFT JOIN mv ON cn.shard = mv.shard
"""

    # streaming dHash index maintenance: after the stream drains the
    # index must equal the batch rebuild — the closed-form psig replay
    d["streaming_dhash_index_maintenance"] = (
        "WITH " + _phash_sig_sql() + """
SELECT doc_id, dhash FROM psig
"""
    )

    # incremental dHash index dedup: the phash sig chain split at
    # doc_id % 10 (batch vs indexed corpus), banded join across the
    # split — the same definition the persisted-index Spark path applies
    d["image_dhash_index_dedup_batch"] = (
        "WITH " + _phash_sig_sql() + """,
corpus AS (
  SELECT doc_id AS corpus_doc, dhash AS dc FROM psig WHERE doc_id % 10 <> 0
),
batch AS (
  SELECT doc_id AS batch_doc, dhash AS db FROM psig WHERE doc_id % 10 = 0
),
cband AS (
  SELECT corpus_doc, dc, t, (dc >> (16 * t)) & 65535 AS band_val
  FROM corpus, (SELECT unnest(range(4))::INT AS t) bands
),
bband AS (
  SELECT batch_doc, db, t, (db >> (16 * t)) & 65535 AS band_val
  FROM batch, (SELECT unnest(range(4))::INT AS t) bands
),
cand AS (
  SELECT DISTINCT b.batch_doc, c.corpus_doc, b.db, c.dc
  FROM cband c JOIN bband b ON c.t = b.t AND c.band_val = b.band_val
)
SELECT batch_doc, corpus_doc,
       CAST(bit_count(xor(db, dc)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(db, dc)) <= 3
"""
    )

    # SQ8 recall: all-integer scalar quantization against per-dim
    # min/max of the floor(x*1e9) elements; the 255x reconstruction is
    # the rank key (HUGEINT products), exact arm = the dot64 convention
    d["sq8_recall_report"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q FROM embeddings
  WHERE vec_id < 4
), c AS (
  SELECT vec_id AS neighbor_id, embedding AS c FROM embeddings
  WHERE vec_id >= 4
), cd AS (
  SELECT neighbor_id, dd.dim AS dim,
         CAST(floor(CAST(c[dd.dim + 1] AS DOUBLE) * 1e9) AS BIGINT) AS v
  FROM c, (SELECT unnest(range(64))::INT AS dim) dd
), stats AS (
  SELECT dim, MIN(v) AS lo, MAX(v) AS hi FROM cd GROUP BY dim
), recon AS (
  SELECT neighbor_id, cd.dim AS dim,
         CASE WHEN hi > lo
              THEN 255 * lo + ((v - lo) * 255 // (hi - lo)) * (hi - lo)
              ELSE 255 * lo END AS r
  FROM cd JOIN stats ON cd.dim = stats.dim
), qd AS (
  SELECT query_id, dd.dim AS dim,
         CAST(floor(CAST(q[dd.dim + 1] AS DOUBLE) * 1e9) AS BIGINT) AS qv
  FROM q, (SELECT unnest(range(64))::INT AS dim) dd
), approx AS (
  SELECT query_id, neighbor_id, SUM(CAST(r AS HUGEINT) * qv) AS s
  FROM recon JOIN qd USING (dim)
  GROUP BY 1, 2
), ann AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY s DESC, neighbor_id ASC) AS rn
    FROM approx
  ) WHERE rn <= 10
), exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY {dot64.format(a='q', b='c')} DESC,
                      neighbor_id ASC) AS rn
    FROM c, q
  ) WHERE rn <= 10
), ek AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS k_exact
  FROM exact GROUP BY 1
), hits AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM exact JOIN ann USING (query_id, neighbor_id)
  GROUP BY 1
)
SELECT ek.query_id, ek.k_exact,
       CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(hits.n_hits, 0) * 1000 // ek.k_exact AS BIGINT)
         AS recall_millis
FROM ek LEFT JOIN hits ON ek.query_id = hits.query_id
"""

    # winnowing fingerprints: shared k-gram/window-min CTE chain, the
    # Spark selection replayed verbatim (k=3, w=4, 60-bit md5 fold)
    _winnow_ctes = f"""
wdocs AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 6
),
wgrams AS (
  SELECT doc_id, CAST(len(toks) - 2 AS BIGINT) AS n_grams,
         unnest(list_transform(range(1, len(toks) - 1),
           i -> {{'pos': i - 1,
                 'gram': array_to_string(list_slice(toks, i, i + 2), ' ')}}))
           AS g
  FROM wdocs
),
whashed AS (
  SELECT doc_id, n_grams, g.pos AS pos,
         {_hex_u60("md5(g.gram)")} AS h
  FROM wgrams
),
wmins AS (
  SELECT doc_id, n_grams, pos,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
  FROM whashed
),
wsel AS (
  SELECT doc_id, n_grams, pos, wmin FROM wmins WHERE pos <= n_grams - 4
)"""

    d["winnowing_fingerprint_profile"] = (
        "WITH " + _winnow_ctes + """
SELECT doc_id, n_grams,
       CAST(n_grams - 3 AS BIGINT) AS n_windows,
       CAST(COUNT(DISTINCT wmin) AS BIGINT) AS n_fingerprints,
       CAST(COUNT(DISTINCT wmin) * 1000000 // (n_grams - 3) AS BIGINT)
         AS density_ppm,
       CAST(MIN(wmin) AS BIGINT) AS fp_min,
       CAST(MAX(wmin) AS BIGINT) AS fp_max
FROM wsel
GROUP BY doc_id, n_grams
"""
    )

    d["winnowing_dup_candidates"] = (
        "WITH " + _winnow_ctes + """,
winc AS (SELECT DISTINCT doc_id, wmin FROM wsel),
wok AS (
  SELECT wmin FROM winc GROUP BY wmin HAVING COUNT(*) <= 20
),
wcap AS (SELECT i.doc_id, i.wmin FROM winc i JOIN wok USING (wmin))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM wcap a JOIN wcap b
  ON a.wmin = b.wmin AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 3
"""
    )

    # dihedral-canonical dHash: replay all 8 D4 orientations closed-form
    # (transformed[R][C] = source[m_o(R,C)] composed with the pinned
    # 9x8 floor resample), pack each with the SimHash bit-63 convention,
    # take the UNSIGNED min per doc = signed order with negatives LAST
    # (two's-complement identity), smallest-orientation tie-break
    d["image_dhash_dihedral"] = """
WITH pbase AS (
  SELECT doc_id,
         array_to_string(list_slice(string_split(text, ' '), 1, 20), ' ')
           AS pfx,
         md5(text) AS mt
  FROM documents
),
prep AS (
  SELECT doc_id,
         md5(pfx || ':0') || md5(pfx || ':1') || md5(pfx || ':2')
         || md5(pfx || ':3') || md5(pfx || ':4') || md5(pfx || ':5')
         || md5(pfx || ':6') || md5(pfx || ':7') AS r256,
         (strpos('0123456789abcdef', substring(mt, 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substring(mt, 2, 1)) - 1) AS p
  FROM pbase
),
grid AS (
  SELECT doc_id, r256, p, oo.o AS o, rr.r AS r, cc.c AS c,
         2 * rr.r AS sr, (16 * cc.c) // 9 AS sc
  FROM prep, (SELECT unnest(range(8))::INT AS o) oo,
             (SELECT unnest(range(8))::INT AS r) rr,
             (SELECT unnest(range(9))::INT AS c) cc
),
gidx AS (
  SELECT doc_id, r256, p, o, r, c,
         CASE o WHEN 0 THEN sr * 16 + sc
                WHEN 1 THEN (15 - sc) * 16 + sr
                WHEN 2 THEN (15 - sr) * 16 + (15 - sc)
                WHEN 3 THEN sc * 16 + (15 - sr)
                WHEN 4 THEN sr * 16 + (15 - sc)
                WHEN 5 THEN (15 - sr) * 16 + sc
                WHEN 6 THEN sc * 16 + sr
                ELSE (15 - sc) * 16 + (15 - sr) END AS idx
  FROM grid
),
vals AS (
  SELECT doc_id, o, r, c,
         CASE WHEN idx = p THEN 122
              ELSE ascii(substring(r256, idx + 1, 1)) END AS v
  FROM gidx
),
bits AS (
  SELECT a.doc_id, a.o, a.r, a.c,
         CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
  FROM vals a
  JOIN vals b ON b.doc_id = a.doc_id AND b.o = a.o
             AND b.r = a.r AND b.c = a.c + 1
  WHERE a.c < 8
),
sigs AS (
  SELECT doc_id, o,
         CAST(SUM(CASE WHEN r = 7 AND c = 7
                       THEN bit * (-9223372036854775807 - 1)
                       ELSE bit * (1::BIGINT << (r * 8 + c)) END)
              AS BIGINT) AS sig
  FROM bits GROUP BY doc_id, o
),
ranked AS (
  SELECT doc_id, sig, o,
         ROW_NUMBER() OVER (PARTITION BY doc_id
           ORDER BY CASE WHEN sig < 0 THEN 1 ELSE 0 END, sig, o) AS rn
  FROM sigs
)
SELECT doc_id, sig AS dhash_canon, CAST(o AS BIGINT) AS orientation
FROM ranked WHERE rn = 1
"""

    # token-budget mixture plan: integer weights from the SAME
    # source_weights() recipe the Spark side broadcasts; largest
    # remainder ranked (rem DESC, source ASC)
    _mix_weights = ", ".join(
        f"('{s}', {int(h, 16)})" for s, h in sampling.source_weights()
    )
    d["token_budget_mixture_plan"] = f"""
WITH w(source, weight_64k) AS (VALUES {_mix_weights}),
avail AS (
  SELECT source,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail_tokens
  FROM documents GROUP BY source
),
frame AS (
  SELECT a.source, a.avail_tokens, w.weight_64k
  FROM avail a JOIN w ON w.source = a.source
),
tot AS (
  SELECT SUM(avail_tokens) AS t_total, SUM(weight_64k) AS w_total
  FROM frame
),
j AS (
  SELECT f.source, f.avail_tokens, f.weight_64k, t.w_total,
         CAST(CAST(t.t_total AS HUGEINT) * 500000 // 1000000 AS BIGINT)
           AS budget
  FROM frame f CROSS JOIN tot t
),
k AS (
  SELECT *,
         CAST(CAST(budget AS HUGEINT) * weight_64k // w_total AS BIGINT)
           AS base,
         CAST(CAST(budget AS HUGEINT) * weight_64k % w_total AS BIGINT)
           AS rem
  FROM j
),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS rem_rank,
         SUM(base) OVER () AS base_sum
  FROM k
),
fin AS (
  SELECT source, avail_tokens, weight_64k,
         CAST(base + CASE WHEN rem_rank <= budget - base_sum
                          THEN 1 ELSE 0 END AS BIGINT) AS target_tokens
  FROM r
)
SELECT source, avail_tokens, CAST(weight_64k AS BIGINT) AS weight_64k,
       target_tokens,
       CAST(CAST(target_tokens AS HUGEINT) * 1000000 // avail_tokens
            AS BIGINT)
         AS epochs_ppm
FROM fin
"""

    # LATERAL correlated derived table: DuckDB runs the SAME SQL shape
    # (only the view names differ), so the hash compare pins Catalyst's
    # decorrelation against DuckDB's direct evaluation
    d["lateral_topk_orders_per_customer"] = """
SELECT c.c_custkey, o.o_orderkey,
       CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         AS price_cents
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey ASC
  LIMIT 3
) o
WHERE c.c_nationkey = 3
"""

    # SQL scalar UDF: the oracle inlines the function body (exact cents
    # minus the floored discount product — floor, never a scale-0 CAST,
    # whose rounding mode differs between the engines)
    d["sql_udf_discounted_revenue"] = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                - CAST(floor(CAST(l_extendedprice AS DECIMAL(18,2))
                             * CAST(l_discount AS DECIMAL(18,2)) * 100)
                       AS BIGINT))
            AS BIGINT) AS disc_rev_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
GROUP BY l_returnflag
"""

    # cross-modal dedup agreement: the text side is the split_leakage
    # prefix fingerprint at pair grain; the image side composes the
    # phash pair chain verbatim
    d["image_text_dedup_agreement"] = (
        "WITH " + _phash_sig_sql() + """,
pbanded AS (
  SELECT doc_id, dhash, t, (dhash >> (16 * t)) & 65535 AS band_val
  FROM psig, (SELECT unnest(range(4))::INT AS t) bands
),
ipairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pbanded a
  JOIN pbanded b ON a.t = b.t AND a.band_val = b.band_val
                AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
),
fps AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(string_split(text, ' '), 1, 20),
                             ' ')) AS fp
  FROM documents
),
tpairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
),
j AS (
  SELECT COALESCE(t.doc_a, i.doc_a) AS doc_a,
         COALESCE(t.doc_b, i.doc_b) AS doc_b,
         CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_t,
         CASE WHEN i.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_i
  FROM tpairs t
  FULL OUTER JOIN ipairs i
    ON t.doc_a = i.doc_a AND t.doc_b = i.doc_b
),
agg AS (
  SELECT CAST(SUM(in_t) AS BIGINT) AS n_text_pairs,
         CAST(SUM(in_i) AS BIGINT) AS n_image_pairs,
         CAST(SUM(in_t * in_i) AS BIGINT) AS n_both
  FROM j
)
SELECT n_text_pairs, n_image_pairs, n_both,
       CAST(CASE WHEN n_text_pairs + n_image_pairs - n_both > 0
            THEN n_both * 1000000
                 // (n_text_pairs + n_image_pairs - n_both)
            ELSE 0 END AS BIGINT) AS agreement_ppm
FROM agg
"""
    )

    # audio quality manifest: the fixture waveform is md5 digest bytes
    # x16, so every fact replays from the 16 digest bytes (counts x16,
    # peak = byte max, dc x16); ppm floors run on nonneg operands
    d["multimodal_audio_quality_report"] = f"""
WITH base AS (SELECT doc_id, md5(text) AS m FROM documents),
b AS (
  SELECT doc_id, g.i AS i, {_cjb('g.i')} - 128 AS d
  FROM base, (SELECT unnest(range(16)) AS i) g
),
agg AS (
  SELECT doc_id,
         CAST(256 AS BIGINT) AS n_samples,
         CAST(16 * SUM(CASE WHEN ABS(d) >= 96 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_clipped,
         CAST(16 * SUM(CASE WHEN ABS(d) <= 8 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_silent,
         CAST(MAX(ABS(d)) AS BIGINT) AS peak_dev,
         CAST(16 * SUM(d) AS BIGINT) AS dc_offset
  FROM b GROUP BY doc_id
)
SELECT doc_id, n_samples, n_clipped, n_silent, peak_dev, dc_offset,
       CAST(n_clipped * 1000000 // 256 AS BIGINT) AS clip_ppm,
       CAST(n_silent * 1000000 // 256 AS BIGINT) AS silence_ppm
FROM agg
"""

    # per-source isotonic calibration: the revenue-curve minimax oracle
    # with source added to every key (windows partition by source; the
    # minimax joins carry the source equality)
    d["isotonic_calibration_per_source"] = """
WITH scored AS (
  SELECT source,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS nd,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
         CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS pos
  FROM documents
), lev AS (
  SELECT source, least(9, (10 * nd) // nt) AS bin,
         CAST(COUNT(*) AS BIGINT) AS w, CAST(SUM(pos) AS BIGINT) AS s
  FROM scored GROUP BY 1, 2
), idx AS (
  SELECT source, bin, w, s,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY bin ASC) AS i,
         SUM(w) OVER (PARTITION BY source ORDER BY bin ASC) AS cw,
         SUM(s) OVER (PARTITION BY source ORDER BY bin ASC) AS cs
  FROM lev
), pairs AS (
  SELECT l.source, l.j, r.k,
         CAST(CAST(r.sk - l.sp AS HUGEINT) * 1000000
              // (r.ck - l.wp) AS BIGINT) AS afp
  FROM (SELECT source, i AS j, cw - w AS wp, cs - s AS sp FROM idx) l
  JOIN (SELECT source, i AS k, cw AS ck, cs AS sk FROM idx) r
    ON l.source = r.source AND l.j <= r.k
), inner_min AS (
  SELECT p.source, p.j, c.i, MIN(p.afp) AS mn
  FROM pairs p
  JOIN (SELECT source, i FROM idx) c
    ON p.source = c.source AND p.j <= c.i AND p.k >= c.i
  GROUP BY p.source, p.j, c.i
), fit AS (
  SELECT source, i, MAX(mn) AS iso_fit_ppm FROM inner_min GROUP BY source, i
)
SELECT idx.source,
       CAST(idx.bin AS BIGINT) AS bin,
       CAST(idx.w AS BIGINT) AS n_docs,
       CAST(idx.s AS BIGINT) AS n_pos,
       CAST(fit.iso_fit_ppm AS BIGINT) AS iso_fit_ppm
FROM idx JOIN fit ON idx.source = fit.source AND idx.i = fit.i
"""

    return d
