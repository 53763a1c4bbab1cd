"""Text-analysis + multimodal plumbing tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_engineer_interview_task_spark.operators import multimodal, text


def test_text_quality_ranges(spark, sf_dir):
    out = text.text_quality(spark, sf_dir)
    bad = out.filter(
        (F.col("distinct_ratio") <= 0)
        | (F.col("distinct_ratio") > 1)
        | (F.col("stopword_ratio") < 0)
        | (F.col("stopword_ratio") > 1)
        | (F.col("n_tokens") <= 0)
    )
    assert bad.count() == 0


def test_token_counts_total(spark, sf_dir):
    out = text.token_counts(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).first()[0]
    assert out.agg(F.sum("n")).first()[0] == total_tokens


def test_lang_id_deterministic_and_total(spark, sf_dir):
    out = text.lang_id(spark, sf_dir)
    assert out.filter(F.col("predicted_lang").isNull()).count() == 0
    langs = {r.predicted_lang for r in out.select("predicted_lang").distinct().collect()}
    assert langs <= {"en", "es", "de", "fr", "und"}


def test_fingerprint_is_md5_of_normalized(spark, sf_dir):
    row = (
        text.doc_fingerprints(spark, sf_dir)
        .join(spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id")
        .first()
    )
    import re

    expected = hashlib.md5(re.sub(r"\s+", " ", row.text.lower()).encode()).hexdigest()
    assert row.fingerprint == expected
    assert row.fingerprint64 == expected[:16]


def test_multimodal_feature_extraction(spark, sf_dir):
    payloads = multimodal.attach_payload(spark, sf_dir)
    feats = multimodal.extract_features(payloads)
    assert feats.schema == multimodal.FEATURE_SCHEMA
    got = {r.doc_id: r for r in feats.collect()}
    docs = {r.doc_id: r.text for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    assert set(got) == set(docs)
    some = next(iter(docs))
    assert got[some].sha1 == hashlib.sha1(docs[some].encode()).hexdigest()
    assert got[some].n_bytes == len(docs[some].encode())
    assert got[some].modality == "text/plain"


def test_user_value_trend(spark, sf_dir):
    from data_engineer_interview_task_spark.sources import read_table

    out = {r.user_id: r for r in multimodal.user_value_trend(spark, sf_dir).collect()}
    # read_table, not raw spark.read: under nanosAsLong the raw ts is a long
    events = read_table(spark, sf_dir, "events")
    n_users = events.select("user_id").distinct().count()
    assert len(out) == n_users
    # cross-check one user against a driver-side closed-form fit
    import numpy as np

    some = sorted(out)[0]
    rows = sorted(
        events.filter(F.col("user_id") == some).select("ts", "value").collect(),
        key=lambda r: r.ts,
    )
    t = np.array([r.ts.timestamp() / 86400.0 for r in rows])
    v = np.array([r.value for r in rows])
    t0 = t - t.mean()
    want = float((t0 * (v - v.mean())).sum() / (t0 * t0).sum())
    assert abs(out[some].slope_per_day - want) < 1e-6
    assert out[some].n_events == len(rows)


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_resize_real_on_png_fake_double_shape():
    # real resize decodes for real; undecodable bytes fail loudly via
    # the decode seam
    with pytest.raises(NotImplementedError):
        multimodal.resize_image(b"\x89PNG", 8, 8)
    from data_engineer_interview_task_spark.functions.png_codec import (
        png_encode,
    )

    p = png_encode(bytes([7, 9, 11, 13]), 2, 2, 0)
    assert multimodal.resize_image(p, 2, 2) == bytes([7, 9, 11, 13])
    out = multimodal.fake_resize(b"payload", 16, 9)
    assert len(out) == 16 * 9 * 3
    assert out == multimodal.fake_resize(b"payload", 16, 9)  # deterministic


def test_frame_sample_fan_out(spark, sf_dir):
    import hashlib

    from data_engineer_interview_task_spark.sources import read_table

    got = multimodal.sample_frames(spark, sf_dir, n_frames=3).collect()
    docs = {r.doc_id: r.text for r in read_table(spark, sf_dir, "documents").collect()}
    assert len(got) == 3 * len(docs)
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    some = sorted(by_doc)[0]
    frames = sorted(by_doc[some], key=lambda r: r.frame_idx)
    assert [f.frame_idx for f in frames] == [0, 1, 2]
    want = hashlib.sha256(f"{docs[some]}#1".encode()).hexdigest()
    assert frames[1].frame_sha == want


def test_chunk_documents_reconstructs(spark, sf_dir):
    """Chunking invariants: chunk 0 is the doc's first min(64, n) tokens,
    chunk count = ceil(n/stride), and stitching each chunk's first
    `stride` tokens (plus the last chunk's tail) reproduces the document
    exactly — no token lost or duplicated by the windowing."""
    import math

    from data_engineer_interview_task_spark.operators.text import chunk_documents
    from data_engineer_interview_task_spark.sources import read_table

    chunks = chunk_documents(spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text.split(" ")
        for r in read_table(spark, sf_dir, "documents").collect()
    }
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r
    assert set(by_doc) == set(docs)
    for doc_id, toks in list(docs.items())[:50]:
        got = by_doc[doc_id]
        n = len(toks)
        assert len(got) == max(1, math.ceil(n / 48))
        assert got[0].chunk_text.split(" ")[: min(64, n)] == toks[: min(64, n)]
        rebuilt = []
        for cid in sorted(got):
            ctoks = got[cid].chunk_text.split(" ")
            assert got[cid].n_tokens == len(ctoks) <= 64
            rebuilt.extend(ctoks if cid == max(got) else ctoks[:48])
        # overlap tokens beyond stride are re-context, drop the double-count
        assert rebuilt[:n] == toks


def test_vocab_coverage_bounds(spark, sf_dir):
    from data_engineer_interview_task_spark.operators.text import vocab_coverage

    rows = vocab_coverage(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert abs(r.oov_rate - r.n_oov / r.n_tokens) < 1e-12


def test_heavy_hitters_ranked_per_source(spark, sf_dir):
    from data_engineer_interview_task_spark.operators.text import (
        heavy_hitters_per_source,
    )

    rows = heavy_hitters_per_source(spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        counts = [r.cnt for r in rs]
        assert counts == sorted(counts, reverse=True)


def test_source_report_totals(spark, sf_dir):
    from data_engineer_interview_task_spark.operators.cleaning import source_report
    from data_engineer_interview_task_spark.sources import read_table

    rows = source_report(spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 0 < r.unique_text_ratio <= 1.0


def test_retention_cohort_week_zero_is_cohort_size(spark, sf_dir):
    """Every user appears in their own cohort at offset 0, so the offset-0
    cell must equal the cohort's size and offsets are non-negative."""
    from data_engineer_interview_task_spark.operators.relational import (
        retention_cohorts,
    )
    from data_engineer_interview_task_spark.sources import read_table

    rows = retention_cohorts(spark, sf_dir).collect()
    assert all(r.week_offset >= 0 for r in rows)
    zero = {r.cohort_week: r.n_users for r in rows if r.week_offset == 0}
    events = read_table(spark, sf_dir, "events")
    n_users = events.select("user_id").distinct().count()
    assert sum(zero.values()) == n_users  # every user is in exactly one cohort


def test_quality_score_model_is_map_only(spark, sf_dir):
    from data_engineer_interview_task_spark.operators import text
    from data_engineer_interview_task_spark.plans import explain_str

    df = text.quality_score_model(spark, sf_dir)
    plan = explain_str(df)
    assert "Exchange" not in plan  # pure map-side scoring
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.keep == (r.quality_score >= 1.5)
        assert r.quality_score > 0


def test_python_udtf_seam_matches_builtin_explode(spark, sf_dir):
    """PySpark 4 UDTF surface (the lateral-join extension point for
    logic that genuinely cannot be a column expression): a sentence-
    splitting UDTF must agree with the preferred BUILT-IN formulation
    (split + posexplode) — which is the repo's standing rule: UDTF/UDF
    only where expressions can't go; this test documents the seam and
    pins its semantics."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx: int, sentence: string")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, s in enumerate(text.split(". ")):
                if s:
                    yield i, s

    spark.udtf.register("sentence_split", SentenceSplit)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence
        FROM udtf_docs d, LATERAL sentence_split(d.text) s
        """
    )
    via_builtin = docs.select(
        "doc_id",
        F.posexplode(F.filter(F.split("text", "\\. "), lambda s: s != "")).alias(
            "sent_idx", "sentence"
        ),
    )
    assert sorted(map(tuple, via_udtf.collect())) == sorted(
        map(tuple, via_builtin.collect())
    )
