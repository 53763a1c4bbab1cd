"""The xxhash64 production hash family vs the md5 oracle family.

md5 is the engine-independent family every oracle twin reproduces
bit-for-bit; xxhash64 is the JVM-native production family (no hex
decode, 8-byte band keys) measured 2-4x cheaper on the sketch hot
loops. The fast family can't be DuckDB-checked, so these tests pin it
to the md5 twin instead (VERDICT r3 item 2):

- MinHash-LSH: candidates are verified by EXACT Jaccard, so as long as
  banding recall covers the same true pairs, the final pair set is
  hash-family-INDEPENDENT — and on this corpus it is, exactly (verified
  at both test SFs; sf0.001 pinned here).
- SimHash: the signature itself is family-defined, so borderline
  hamming<=7 pairs may legitimately differ — the test pins high overlap
  rather than equality (at sf0.01 the families agree on 22 of 25 pairs).
"""
from __future__ import annotations

from pyspark.sql import functions as F

from data_engineer_interview_task_spark.operators import dedup, text


def test_minhash_fast_pairs_equal_md5_twin(spark, sf_dir):
    md5_pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(spark, sf_dir).collect()
    }
    fast_pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(
            spark, sf_dir, hash_family="xxhash64"
        ).collect()
    }
    assert md5_pairs, "corpus must contain near-dups for this test to bite"
    assert fast_pairs == md5_pairs


def test_minhash_fast_jaccard_values_match(spark, sf_dir):
    # the verify step computes exact Jaccard from the shingle sets, so the
    # VALUES must also be identical, not just the pair keys
    md5_j = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(spark, sf_dir).collect()
    }
    fast_j = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(
            spark, sf_dir, hash_family="xxhash64"
        ).collect()
    }
    assert fast_j == md5_j


def test_simhash_fast_family_overlap(spark, sf_dir):
    md5_pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.simhash_near_dup_pairs(spark, sf_dir).collect()
    }
    fast_pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.simhash_near_dup_pairs(
            spark, sf_dir, hash_family="xxhash64"
        ).collect()
    }
    assert md5_pairs
    inter = md5_pairs & fast_pairs
    # signatures are family-defined; borderline pairs may differ, but the
    # families must agree on the bulk of the near-dup graph
    assert len(inter) >= 0.8 * len(md5_pairs), (len(inter), len(md5_pairs))
    assert len(fast_pairs) <= 1.2 * len(md5_pairs)


def test_chargram_fast_family_shape(spark, sf_dir):
    md5_sk = text.chargram_minhash(spark, sf_dir)
    fast_sk = text.chargram_minhash(spark, sf_dir, hash_family="xxhash64")
    n_docs = md5_sk.count()
    assert fast_sk.count() == n_docs
    assert fast_sk.filter(F.col("sketch") == "").count() == 0
    # bottom-k property: every sketch has exactly `bottom` components
    # (docs here always have >= 4 distinct grams)
    assert (
        fast_sk.filter(F.size(F.split("sketch", r"\|")) != 4).count() == 0
    )


def _write_adversarial_corpus(spark, root):
    """documents.parquet with a 40-doc EXACT-duplicate cluster (hot in
    every band — the LSH straggler shape), two genuine near-dup pairs,
    and unrelated background docs."""
    hot = "the quick brown fox jumps over the lazy dog near the river bank today"
    near_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = [(i, hot) for i in range(40)]
    rows += [(100, near_a + " end"), (101, near_a + " fin")]
    rows += [(200, near_a.upper() + " END"), (201, near_a.upper() + " FIN")]
    rows += [
        (300 + i, f"background document number {i} talks about topic{i} only " * 2)
        for i in range(20)
    ]
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{root}/documents.parquet")


def test_max_band_df_skew_guard(spark, tmp_path):
    """Adversarial near-constant cluster (VERDICT r3 item 4): a band key
    shared by the whole cluster makes the band self-join quadratic in the
    cluster size. The cap must (a) drop the exact-dup cluster's buckets —
    that cluster belongs to the exact-dedup pass that runs first — while
    (b) keeping every pair whose buckets sit below the cap, with
    identical Jaccard values."""
    root = str(tmp_path)
    _write_adversarial_corpus(spark, root)

    uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(spark, root).collect()
    }
    # the hot cluster dominates the uncapped join: 40*39/2 identical pairs
    hot_pairs = {k for k in uncapped if k[0] < 40 and k[1] < 40}
    assert len(hot_pairs) == 40 * 39 // 2

    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(spark, root, max_band_df=10).collect()
    }
    # (a) every hot-cluster bucket exceeded the cap in every band
    assert not {k for k in capped if k[0] < 40 and k[1] < 40}
    # (b) the genuine near-dup pairs (bucket df == 2) survive, values intact
    assert (100, 101) in capped and (200, 201) in capped
    for k, v in capped.items():
        assert uncapped[k] == v
    # nothing new appears under the cap
    assert set(capped) <= set(uncapped)


def test_max_band_df_candidate_bound(spark, tmp_path):
    """The cap bounds the candidate build itself (df <= cap ⇒ each bucket
    contributes <= cap(cap-1)/2 candidate rows) — checked through the
    public pair surface with a cap of 1: no bucket can pair at all."""
    root = str(tmp_path)
    _write_adversarial_corpus(spark, root)
    none = dedup.minhash_lsh_pairs(spark, root, max_band_df=1).collect()
    assert none == []


def test_incremental_index_roundtrip_equals_rebuild(spark, sf_dir, tmp_path):
    """Continuous index maintenance (VERDICT r3 item 5): build the index
    from split A, dedup batch B against it, APPEND B, dedup batch C
    against the grown index — the C results must equal deduping C against
    a one-shot index rebuilt over A ∪ B, and the grown index's contents
    must equal the rebuilt index's."""
    from data_engineer_interview_task_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 3 == 0)
    b = docs.filter(F.col("doc_id") % 3 == 1)
    c = docs.filter(F.col("doc_id") % 3 == 2)

    grown = str(tmp_path / "grown")
    dedup._minhash_index_write(
        dedup.shingle_documents(a).localCheckpoint(), grown, mode="overwrite"
    )
    pairs_b = dedup.minhash_dedup_batch(spark, grown, b).collect()
    dedup.minhash_index_append(b, grown)
    pairs_c_incr = {
        (r.batch_doc, r.corpus_doc, r.jaccard)
        for r in dedup.minhash_dedup_batch(spark, grown, c).collect()
    }

    rebuilt = str(tmp_path / "rebuilt")
    dedup._minhash_index_write(
        dedup.shingle_documents(a.unionByName(b)).localCheckpoint(),
        rebuilt,
        mode="overwrite",
    )
    pairs_c_oneshot = {
        (r.batch_doc, r.corpus_doc, r.jaccard)
        for r in dedup.minhash_dedup_batch(spark, rebuilt, c).collect()
    }
    assert pairs_c_incr == pairs_c_oneshot
    assert pairs_c_incr, "splits must produce cross-split near-dups"
    assert pairs_b is not None  # batch-B leg ran against the A-only index

    # the grown index is content-equal to the one-shot rebuild
    for part in ("band_keys", "shingles"):
        g = spark.read.parquet(f"{grown}/{part}")
        r = spark.read.parquet(f"{rebuilt}/{part}")
        if part == "shingles":
            g = g.select("doc_id", F.to_json("shingles").alias("s"))
            r = r.select("doc_id", F.to_json("shingles").alias("s"))
        assert {tuple(x) for x in g.collect()} == {tuple(x) for x in r.collect()}


def test_unknown_hash_family_raises(spark, sf_dir):
    import pytest

    with pytest.raises(ValueError):
        dedup.minhash_lsh_pairs(spark, sf_dir, hash_family="fnv")
    with pytest.raises(ValueError):
        dedup.simhash_signatures(spark, sf_dir, hash_family="fnv")
    with pytest.raises(ValueError):
        text.chargram_minhash(spark, sf_dir, hash_family="fnv")


def test_prefix_filter_equals_inverted_index(spark, sf_dir):
    """Prefix filtering is COMPLETE for Jaccard >= t — the pair set (and
    values) must exactly equal the quadratic inverted-index path."""
    full = {
        (r.doc_a, r.doc_b): (r.shared_shingles, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    pf = {
        (r.doc_a, r.doc_b): (r.shared_shingles, r.jaccard)
        for r in dedup.prefix_filter_jaccard_pairs(spark, sf_dir).collect()
    }
    assert full
    assert pf == full


def test_prefix_filter_skips_hot_shingles(spark, tmp_path):
    """The candidate join must only touch PREFIX (rare) shingles: on the
    adversarial corpus, background docs share no rare shingles with
    anything, so only the genuine near-dup pairs and the exact-dup
    cluster survive — and the pair set still exactly matches the
    quadratic definition (completeness under adversarial df skew)."""
    root = str(tmp_path)
    _write_adversarial_corpus(spark, root)
    full = {
        (r.doc_a, r.doc_b) for r in dedup.ngram_jaccard_pairs(spark, root).collect()
    }
    pf = {
        (r.doc_a, r.doc_b)
        for r in dedup.prefix_filter_jaccard_pairs(spark, root).collect()
    }
    assert pf == full
    assert (100, 101) in pf and (200, 201) in pf
