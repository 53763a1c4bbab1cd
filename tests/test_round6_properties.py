"""Model/invariant tests for the round-6 batch-6 operators.

Each operator also carries a DuckDB oracle swept at
sf0.001/sf0.01/sf1/skew; these tests pin the pieces the hash compare
cannot see (python set-model replays, structural invariants, the LSH
banding monotonicity theorem).
"""
from __future__ import annotations

from collections import Counter, defaultdict

import duckdb


def test_weekly_user_overlap_matches_set_model(spark, sf_dir):
    """Bitmap AND/AND-NOT algebra == plain python set arithmetic over
    the distinct weekly user populations, for every consecutive pair."""
    from data_engineer_interview_task_spark.operators import relational

    rows = duckdb.sql(
        "SELECT CAST(date_trunc('week', ts) AS DATE) AS w, user_id "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    weeks: dict = defaultdict(set)
    for w, u in rows:
        weeks[w].add(u)
    got = {
        r["week_start"]: (r["returning"], r["churned"], r["new_users"])
        for r in relational.weekly_user_overlap(spark, sf_dir).collect()
    }
    ordered = sorted(weeks)
    assert set(got) == set(ordered[:-1])
    for w0, w1 in zip(ordered, ordered[1:]):
        a, b = weeks[w0], weeks[w1]
        assert got[w0] == (len(a & b), len(a - b), len(b - a))


def test_checksum_replica_diff_localizes_corruption(spark, sf_dir):
    """Differing buckets == exactly the buckets holding a doc_id % 97
    row, and the per-bucket corrupt counts re-derive from the ids."""
    from data_engineer_interview_task_spark.operators import maintenance

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet' "
            "WHERE doc_id % 97 = 0"
        ).fetchall()
    ]
    expect = Counter(i % 32 for i in ids)
    got = maintenance.checksum_replica_diff(spark, sf_dir).collect()
    assert {r["bucket"]: r["n_corrupt"] for r in got} == dict(expect)
    assert all(r["ck_base"] != r["ck_replica"] for r in got)


def test_label_propagation_is_min_within_k_hops(spark, sf_dir):
    """After k rounds label(v) == min node id within k hops of v on the
    co-purchase graph — replayed with a python BFS model; community
    sizes re-count the label table."""
    from data_engineer_interview_task_spark.operators import graph

    out = graph.supplier_label_propagation(spark, sf_dir, rounds=3).collect()
    edges = graph._cached_edges(spark, sf_dir).collect()
    adj: dict = defaultdict(set)
    for e in edges:
        adj[e["src"]].add(e["dst"])
    labels = {}
    for r in out:
        node = r["s_suppkey"]
        frontier, seen = {node}, {node}
        for _ in range(3):
            frontier = {
                m for v in frontier for m in adj[v] if m not in seen
            }
            seen |= frontier
        labels[node] = min(seen)
        assert r["label"] == min(seen)
    sizes = Counter(labels.values())
    for r in out:
        assert r["community_size"] == sizes[r["label"]]


def test_lsh_tuning_candidates_monotone_in_bands(spark, sf_dir):
    """Banding theorem: a collision on an r-row band implies collisions
    on both of its r/2-row halves, so the candidate-pair count is
    non-decreasing as bands double (4 -> 8 -> 16) over the same
    32-hash signature."""
    from data_engineer_interview_task_spark.operators import dedup

    rows = {
        r["bands"]: r["n_candidate_pairs"]
        for r in dedup.lsh_tuning_report(spark, sf_dir).collect()
    }
    assert set(rows) == {4, 8, 16}
    assert rows[4] <= rows[8] <= rows[16]


def test_pq_codes_shape_and_cell_range(spark, sf_dir):
    """One row per vector; both codes land in the label codebook."""
    from data_engineer_interview_task_spark.operators import similarity

    emb = duckdb.sql(
        f"SELECT vec_id, label FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    label_set = {l for _, l in emb}
    out = similarity.embedding_pq_codes(spark, sf_dir).collect()
    assert len(out) == len(emb)
    assert {r["vec_id"] for r in out} == {v for v, _ in emb}
    assert all(
        r["code_a"] in label_set and r["code_b"] in label_set for r in out
    )
