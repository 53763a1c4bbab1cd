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


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")
