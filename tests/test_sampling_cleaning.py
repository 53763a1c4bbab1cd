"""Semantics tests for the sampling / data-mixing and cleaning operators
(cross-engine value parity is covered by the DuckDB oracles; these pin the
*meaning*: determinism, exact per-key replication, structural invariants)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_engineer_interview_task_spark.operators import cleaning, sampling
from data_engineer_interview_task_spark.sources import read_table


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_hash_sample_deterministic_and_thresholded(spark, sf_dir):
    got = sampling.hash_sample(spark, sf_dir).collect()
    assert 0 < len(got)
    for r in got:
        assert r.sample_key == _md5(str(r.doc_id))
        assert r.sample_key[:8] < sampling.HASH_SAMPLE_THRESHOLD
    # exact replication driver-side: the kept set is a pure function of ids
    all_ids = [
        r.doc_id
        for r in read_table(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    want = {
        i for i in all_ids if _md5(str(i))[:8] < sampling.HASH_SAMPLE_THRESHOLD
    }
    assert {r.doc_id for r in got} == want
    # ~25% rate, binomial tolerance
    assert abs(len(want) / len(all_ids) - 0.25) < 0.08


def test_stratified_sample_quota_and_order(spark, sf_dir):
    got = sampling.stratified_sample(spark, sf_dir).collect()
    by_stratum: dict[tuple, list] = {}
    for r in got:
        by_stratum.setdefault((r.source, r.lang), []).append(r)
    for rows in by_stratum.values():
        assert 1 <= len(rows) <= sampling.STRATUM_N
        assert sorted(r.rn for r in rows) == list(range(1, len(rows) + 1))
        # rank order follows the hashed key
        rows.sort(key=lambda r: r.rn)
        keys = [(_md5(str(r.doc_id)), r.doc_id) for r in rows]
        assert keys == sorted(keys)


def test_weighted_source_mix_exact_counts(spark, sf_dir):
    weights = dict(sampling.source_weights())
    docs = [
        (r.doc_id, r.source)
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .collect()
    ]
    want: dict[str, list[int]] = {}
    for doc_id, source in docs:
        n, k = want.setdefault(source, [0, 0])
        want[source][0] = n + 1
        want[source][1] = k + (_md5(str(doc_id))[:4] < weights[source])
    got = sampling.weighted_source_mix(spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        assert [r.n_docs, r.n_kept] == want[r.source]
        assert r.w_hex == weights[r.source]


def test_pack_token_shards_invariants(spark, sf_dir):
    rows = sampling.pack_token_shards(spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        assert r.pack_id == r.tokens_before // sampling.PACK_CAPACITY
        by_source.setdefault(r.source, []).append(r)
    for group in by_source.values():
        group.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in group:
            assert r.tokens_before == cum  # contiguous, gapless packing
            cum += r.n_tokens
        packs = [r.pack_id for r in group]
        assert packs == sorted(packs)  # monotone in doc order


def test_repetition_stats_closed_form(spark, sf_dir):
    got = {r.doc_id: r for r in cleaning.repetition_stats(spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").limit(5).collect()
    for d in docs:
        toks = d.text.split(" ")
        r = got[d.doc_id]
        assert r.n_tokens == len(toks)
        g2 = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        want = (len(g2) - len(set(g2))) / len(g2) if g2 else 0.0
        assert r.dup_bigram_frac == pytest.approx(want, abs=1e-12)
        top = max(toks.count(t) for t in set(toks))
        assert r.top_token_frac == pytest.approx(top / len(toks), abs=1e-12)


def test_contamination_check_pairs_really_overlap(spark, sf_dir):
    got = cleaning.contamination_check(spark, sf_dir).collect()
    assert len(got) > 0
    texts = {
        r.doc_id: r.text
        for r in read_table(spark, sf_dir, "documents").collect()
    }

    def grams(t: str) -> set[str]:
        w = t.split(" ")
        if len(w) < cleaning.CONTAM_N:
            return {t}
        return {
            " ".join(w[i : i + cleaning.CONTAM_N])
            for i in range(len(w) - cleaning.CONTAM_N + 1)
        }

    for r in got:
        assert r.eval_doc_id % cleaning.EVAL_MODULUS == 0
        assert r.train_doc_id % cleaning.EVAL_MODULUS != 0
        shared = grams(texts[r.eval_doc_id]) & grams(texts[r.train_doc_id])
        assert len(shared) == r.n_shared_ngrams > 0


def test_pii_scrub_masks_all_digits(spark, sf_dir):
    rows = cleaning.pii_scrub(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert not any(c.isdigit() for c in r.masked_name)
        assert "<ID>" in r.masked_name
        assert r.extracted_id == r.c_custkey  # Customer#%09d numbering
        assert r.n_digit_runs == 1


def test_dataset_splits_cover_and_proportion(spark, sf_dir):
    got = {r.split: r.n_docs for r in sampling.dataset_splits(spark, sf_dir).collect()}
    total = sum(got.values())
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert total == n_docs
    assert set(got) == {"train", "val", "test"}
    assert 0.7 < got["train"] / total < 0.9
    assert got["val"] / total < 0.2 and got["test"] / total < 0.2


def test_rolling_7day_window_matches_python(spark, sf_dir):
    from data_engineer_interview_task_spark.operators import relational

    rows = relational.rolling_7day_user_value(spark, sf_dir).collect()
    events = sorted(
        read_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    got = {r.event_id: r.trailing_7d_value for r in rows}
    by_user: dict[int, list] = {}
    for e in events:
        by_user.setdefault(e.user_id, []).append(e)
    import decimal

    checked = 0
    for user, evs in list(by_user.items())[:20]:
        for i, e in enumerate(evs):
            want = sum(
                (decimal.Decimal(str(round(o.value, 2))) for o in evs
                 if 0 <= (e.ts - o.ts).total_seconds() <= 604800),
                decimal.Decimal(0),
            )
            assert abs(got[e.event_id] - float(want)) < 1e-9, (user, i)
            checked += 1
    assert checked > 100


def test_snapshot_diff_statuses(spark, sf_dir):
    from data_engineer_interview_task_spark.operators.cleaning import snapshot_diff
    from data_engineer_interview_task_spark.sources import read_table

    diff = snapshot_diff(spark, sf_dir)
    by = {r["status"]: r["n"] for r in diff.groupBy("status").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    docs = read_table(spark, sf_dir, "documents")
    n_removed = docs.filter(F.col("doc_id") % 11 == 0).count()
    n_added = docs.filter(F.col("doc_id") % 13 == 0).count()
    n_changed = docs.filter(
        (F.col("doc_id") % 11 != 0) & (F.col("doc_id") % 7 == 0)
    ).count()
    assert by.get("removed", 0) == n_removed
    assert by.get("added", 0) == n_added
    assert by.get("changed", 0) == n_changed
    # nothing else leaks through the unchanged filter
    assert diff.count() == n_removed + n_added + n_changed


def test_variant_rollup_matches_json_path(spark, sf_dir):
    """VARIANT extraction must agree with the string JSON-path route."""
    from data_engineer_interview_task_spark.operators.extended import (
        variant_props_rollup,
    )
    from data_engineer_interview_task_spark.sources import read_table

    got = {r.k_bucket: (r.n_events, r.sum_k) for r in
           variant_props_rollup(spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select(
        F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )
    want = {r.k_bucket: (r.n, r.s) for r in ev.groupBy(
        (F.col("k") % 10).alias("k_bucket")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("k").alias("s")).collect()}
    assert got == want


def test_observed_quality_filter_metrics_exact(spark, sf_dir):
    """observe() metrics must equal independently recomputed aggregates —
    the zero-extra-scan observability contract."""
    from data_engineer_interview_task_spark.operators import cleaning

    df, obs = cleaning.observed_quality_filter(spark, sf_dir)
    rows = df.collect()
    got = obs.get
    assert got["n_docs"] == len(rows)
    assert got["n_kept"] == sum(1 for r in rows if r.keep)
    assert got["n_len_fail"] == sum(1 for r in rows if not r.len_ok)
    assert got["n_diversity_fail"] == sum(1 for r in rows if not r.diversity_ok)
    assert got["n_stopwords_fail"] == sum(1 for r in rows if not r.stopwords_ok)
    assert 0 < got["n_kept"] < got["n_docs"]  # filter is non-degenerate


def test_curate_corpus_cli_smoke(tmp_path):
    """The end-to-end curation CLI runs, writes JSONL, and reports
    consistent metrics (rows written == after_source_cap <= survivors
    <= docs_in)."""
    import glob
    import json
    import subprocess
    import sys
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "curated")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "tools", "curate_corpus.py"),
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--out",
            out,
            "--cpus",
            "4",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    metrics = json.loads(proc.stdout.strip().splitlines()[-1])
    rows = [
        json.loads(l)
        for f in glob.glob(f"{out}/part-*.json")
        for l in open(f)
    ]
    assert len(rows) == metrics["after_source_cap"]
    assert (
        0
        < metrics["after_source_cap"]
        <= metrics["dedup_quality_survivors"]
        <= metrics["docs_in"]
    )


def test_two_level_packing_identical_to_single_window(spark, sf_dir):
    """The (bucket totals -> base offsets -> within-bucket prefix)
    decomposition must reproduce the single-window pack assignment
    BIT-EXACTLY — including with a bucket span small enough that every
    source spans many buckets."""
    from data_engineer_interview_task_spark.operators import sampling

    one = sorted(map(tuple, sampling.pack_token_shards(spark, sf_dir).collect()))
    two = sorted(
        map(
            tuple,
            sampling.pack_token_shards_scalable(
                spark, sf_dir, bucket_span=7
            ).collect(),
        )
    )
    assert one == two and len(one) > 0


def test_repetition_long_form_identical_to_array_form(spark, sf_dir):
    """explode+groupBy (linear, book-safe) must equal the per-row array
    scan bit-for-bit — same exact integer counts into one division."""
    from data_engineer_interview_task_spark.operators import cleaning

    a = sorted(map(tuple, cleaning.repetition_stats(spark, sf_dir).collect()))
    b = sorted(
        map(tuple, cleaning.repetition_stats_long(spark, sf_dir).collect())
    )
    assert a == b and len(a) > 0


def test_skew_report_cli_smoke(tmp_path):
    """skew_report prints a JSON profile whose totals reconcile and whose
    remedy tiers match the max/mean ratio."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "tools", "skew_report.py"),
            "lineitem",
            "l_orderkey",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--cpus",
            "4",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rep["total_rows"] == 6000 and rep["distinct_keys"] > 0
    assert rep["max"] >= rep["p99"] >= rep["p50"] >= 1
    assert rep["top_keys"][0]["rows"] == rep["max"]
    assert ("none" in rep["remedy"]) == (rep["max_over_mean"] <= 4)


def test_priority_sample_topk_matches_python_model(spark, sf_dir):
    """The DLT priority order is a pure function of (md5(doc_id), token
    count): replay it driver-side and demand the exact same top-25 in the
    exact same rank order."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    model = []
    for r in docs:
        u = int(_md5(str(r.doc_id))[:13], 16)
        w = max(len(r.text.split(" ")), 1)
        model.append((u / w, r.doc_id, w))
    model.sort()
    want = [(doc_id, w, rk + 1) for rk, (_, doc_id, w) in enumerate(model[:25])]
    got = [
        (r.doc_id, r.w, r.rk)
        for r in sampling.priority_sample_topk(spark, sf_dir).orderBy("rk").collect()
    ]
    assert got == want


def test_priority_sample_topk_weight_bias(spark, sf_dir):
    """Structural DLT property: the sampled docs' mean token weight must
    exceed the corpus mean (inclusion probability grows with weight)."""
    docs = read_table(spark, sf_dir, "documents").select(
        F.greatest(F.size(F.split("text", " ")), F.lit(1)).alias("w")
    ).collect()
    corpus_mean = sum(r.w for r in docs) / len(docs)
    sample = sampling.priority_sample_topk(spark, sf_dir).collect()
    sample_mean = sum(r.w for r in sample) / len(sample)
    assert sample_mean > corpus_mean
