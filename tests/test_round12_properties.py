"""Round-12 model/property tests: ADVICE-r11 closures — Cramér's V
densification on a SPARSE contingency table (zero cells contribute r·c,
pinned on Spark AND DuckDB), and the BPE ordered-prefix cap guard (a
binding cap raises instead of silently diverging from the uncapped
selection rule).
"""
from __future__ import annotations

import datetime as dt

import pytest

from data_engineer_interview_task_spark.operators import cleaning, text


# --- Cramér's V on a sparse contingency table ------------------------------


@pytest.fixture(scope="module")
def sparse_sf_dir(spark, tmp_path_factory):
    """Events corpus where event_type 'b' misses four ISO weekdays
    entirely (2024-01-01 is a Monday, so day offset k has iso_dow k+1):
    type 'a' covers all 7 weekdays, type 'b' only Mon-Wed — 4 zero cells
    that the densified statistic must count as r·c each."""
    rows = []
    eid = 0
    for k in range(7):  # type a: 2 events on Monday, 1 elsewhere
        for _ in range(2 if k == 0 else 1):
            eid += 1
            rows.append(
                (
                    eid,
                    eid,
                    dt.datetime(2024, 1, 1 + k, 12, 0, 0),
                    "a",
                    1.0,
                    "{}",
                )
            )
    for k in range(3):  # type b: 3 events Mon, 2 Tue, 1 Wed
        for _ in range(3 - k):
            eid += 1
            rows.append(
                (
                    eid,
                    eid,
                    dt.datetime(2024, 1, 1 + k, 9, 0, 0),
                    "b",
                    1.0,
                    "{}",
                )
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    d = tmp_path_factory.mktemp("sparse_contingency")
    df.write.parquet(str(d / "events.parquet"))
    return str(d)


def _dense_replay(cells: dict) -> dict:
    """Exact python replay of the DENSIFIED per-cell floor ladder."""
    rt: dict = {}
    ct: dict = {}
    n = 0
    for (et, dow), o in cells.items():
        rt[et] = rt.get(et, 0) + o
        ct[dow] = ct.get(dow, 0) + o
        n += o
    chi2n = 0
    for et in rt:
        for dow in ct:
            o = cells.get((et, dow), 0)
            rc = rt[et] * ct[dow]
            chi2n += (n * o - rc) ** 2 // rc
    k1 = min(len(rt), len(ct)) - 1
    return {
        "n_events": n,
        "n_levels_row": len(rt),
        "n_levels_col": len(ct),
        "chi2n_floor": chi2n,
        "v2_ppm": chi2n * 1_000_000 // (n * n * k1) if k1 > 0 else 0,
    }


SPARSE_CELLS = {
    ("a", 1): 2,
    ("a", 2): 1,
    ("a", 3): 1,
    ("a", 4): 1,
    ("a", 5): 1,
    ("a", 6): 1,
    ("a", 7): 1,
    ("b", 1): 3,
    ("b", 2): 2,
    ("b", 3): 1,
}


def test_cramers_v_densifies_zero_cells_spark(spark, sparse_sf_dir):
    """Zero (type, dow) cells must contribute r·c each — the observed-only
    sum understates chi2·N by exactly sum(r·c over missing cells)."""
    want = _dense_replay(SPARSE_CELLS)
    observed_only = sum(
        (want["n_events"] * o
         - sum(v for (e2, _), v in SPARSE_CELLS.items() if e2 == et)
         * sum(v for (_, d2), v in SPARSE_CELLS.items() if d2 == dow)) ** 2
        // (sum(v for (e2, _), v in SPARSE_CELLS.items() if e2 == et)
            * sum(v for (_, d2), v in SPARSE_CELLS.items() if d2 == dow))
        for (et, dow), o in SPARSE_CELLS.items()
    )
    assert want["chi2n_floor"] > observed_only  # the fixture is non-vacuous
    out = cleaning.cramers_v_event_dow(spark, sparse_sf_dir).collect()
    assert len(out) == 1
    got = out[0].asDict()
    assert got == want


def test_cramers_v_densifies_zero_cells_duckdb(sparse_sf_dir):
    """The DuckDB oracle must densify identically (same level cross)."""
    import duckdb

    import __spark_entry__ as entrymod

    sql = entrymod.oracle_sql()["cramers_v_event_dow"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{sparse_sf_dir}/events.parquet/*.parquet')"
    )
    rows = con.execute(sql).fetchall()
    cols = [d[0] for d in con.description]
    got = dict(zip(cols, rows[0]))
    assert len(rows) == 1
    assert got == _dense_replay(SPARSE_CELLS)


# --- BPE ordered-prefix cap guard ------------------------------------------


def _pair_rows(n, interacting=False):
    """n synthetic pair rows; interacting=True makes every row past the
    first share its left symbol with the first pick's right symbol."""
    if interacting:
        return [{"l": "aa", "r": "bb", "cnt": 999}] + [
            {"l": "bb", "r": f"c{i:04d}", "cnt": 900 - i % 800}
            for i in range(n - 1)
        ]
    return [
        {"l": f"l{i:04d}", "r": f"r{i:04d}", "cnt": 900} for i in range(n)
    ]


def test_bpe_cap_guard_raises_when_prefix_full_and_underfilled():
    rows = _pair_rows(4096, interacting=True)
    with pytest.raises(RuntimeError, match="top-4096 ordered-prefix cap"):
        text._greedy_noninteracting(rows, batch=4, rnd=1)


def test_bpe_cap_guard_allows_genuine_exhaustion():
    # a sub-cap prefix that under-fills is TRUE exhaustion, not the cap
    rows = _pair_rows(3, interacting=True)
    picked = text._greedy_noninteracting(rows, batch=4, rnd=1)
    assert picked == [("aa", "bb", 999)]


def test_bpe_cap_guard_allows_full_batch_within_prefix():
    rows = _pair_rows(4096, interacting=False)
    picked = text._greedy_noninteracting(rows, batch=4, rnd=1)
    assert len(picked) == 4
    assert picked == [(f"l{i:04d}", f"r{i:04d}", 900) for i in range(4)]


# --- dihedral-canonical dHash ----------------------------------------------


def _transform(raster: bytes, size: int, o: int) -> bytes:
    """Independent re-implementation of the D4 action (transformed[R][C]
    = source[m_o(R, C)]) — the test must not share the operator's code."""
    n = size - 1
    maps = [
        lambda R, C: (R, C),
        lambda R, C: (n - C, R),
        lambda R, C: (n - R, n - C),
        lambda R, C: (C, n - R),
        lambda R, C: (R, n - C),
        lambda R, C: (n - R, C),
        lambda R, C: (C, R),
        lambda R, C: (n - C, n - R),
    ]
    m = maps[o]
    out = bytearray(size * size)
    for R in range(size):
        for C in range(size):
            Rp, Cp = m(R, C)
            out[R * size + C] = raster[Rp * size + Cp]
    return bytes(out)


def test_dihedral_dhash_invariant_under_all_8_orientations():
    """The canonical hash of EVERY rotated/flipped copy must equal the
    original's exactly (D4 orbit closure) — in particular a rot90 pair
    lands at Hamming 0, the property VERDICT r11 item 3 asks for."""
    import hashlib

    from data_engineer_interview_task_spark.functions.png_codec import (
        png_encode,
    )
    from data_engineer_interview_task_spark.operators.multimodal import (
        dihedral_dhash_unsigned,
    )

    raster = bytearray()
    for i in range(8):  # md5 chain — a non-degenerate white-noise raster
        raster += hashlib.md5(f"dihedral:{i}".encode()).hexdigest().encode()
    base = bytes(raster)
    canon0, _o0 = dihedral_dhash_unsigned(png_encode(base, 16, 16))
    seen_hashes = set()
    for o in range(8):
        t = _transform(base, 16, o)
        seen_hashes.add(t)
        canon, _ = dihedral_dhash_unsigned(png_encode(t, 16, 16))
        assert canon == canon0, f"orientation {o} broke canonicalization"
    assert len(seen_hashes) == 8, "transforms degenerate — vacuous fixture"
    # rot90 pair at Hamming 0, explicitly
    rot = dihedral_dhash_unsigned(png_encode(_transform(base, 16, 1), 16, 16))
    assert bin(rot[0] ^ canon0).count("1") == 0


def test_dihedral_dhash_rejects_non_square():
    import pytest as _pytest

    from data_engineer_interview_task_spark.functions.png_codec import (
        png_encode,
    )
    from data_engineer_interview_task_spark.operators.multimodal import (
        dihedral_dhash_unsigned,
    )

    with _pytest.raises(ValueError, match="square"):
        dihedral_dhash_unsigned(png_encode(bytes(range(16)) * 8, 16, 8))


def test_dihedral_canonical_is_orbit_min_of_plain_dhash(spark, sf_dir):
    """Per doc: canonical unsigned <= plain dHash unsigned (identity is
    in the orbit), equality iff orientation 0 wins; and the argmin
    orientation must VARY across the corpus (non-vacancy — white-noise
    rasters spread the argmin over all 8)."""
    from data_engineer_interview_task_spark.operators import multimodal

    plain = {
        r.doc_id: r.dhash & ((1 << 64) - 1)
        for r in multimodal.image_perceptual_hashes(spark, sf_dir).collect()
    }
    rows = multimodal.image_dhash_dihedral(spark, sf_dir).collect()
    assert len(rows) == len(plain)
    orients = set()
    for r in rows:
        canon = r.dhash_canon & ((1 << 64) - 1)
        assert canon <= plain[r.doc_id]
        if r.orientation == 0:
            assert canon == plain[r.doc_id]
        orients.add(r.orientation)
    assert len(orients) >= 4, f"argmin orientations degenerate: {orients}"


# --- streaming dHash index maintenance ---------------------------------------


def test_dhash_index_stream_restart_and_replay(spark, sf_dir, tmp_path):
    """The crawl loop end to end (VERDICT r11 item 4): (1) run the
    stream over the first two feed files and park; (2) extend the feed,
    restart from the SAME checkpoint — only the new file is consumed;
    (3) the maintained index equals the one-shot batch rebuild exactly;
    (4) a forced REPLAY of a committed batch leaves the index unchanged
    (the deterministic-per-batch-directory overwrite is idempotent)."""
    from data_engineer_interview_task_spark.operators.multimodal import (
        image_perceptual_hashes,
    )
    from data_engineer_interview_task_spark.streaming.images import (
        append_sigs_batch,
        read_dhash_index,
        run_dhash_index_stream,
        write_docs_feed,
    )

    src = str(tmp_path / "docs_src")
    idx = str(tmp_path / "dhash_index")
    ckpt = str(tmp_path / "ckpt")
    # run 1: two of three residues
    write_docs_feed(spark, sf_dir, src, n_files=3, only_mods=(0, 1))
    run_dhash_index_stream(spark, src, idx, ckpt)
    part1 = {
        (r.doc_id, r.dhash) for r in read_dhash_index(spark, idx).collect()
    }
    # restart: extend the feed, reopen the SAME checkpoint
    write_docs_feed(spark, sf_dir, src, n_files=3, only_mods=(2,))
    run_dhash_index_stream(spark, src, idx, ckpt)
    got = {(r.doc_id, r.dhash) for r in read_dhash_index(spark, idx).collect()}
    want = {
        (r.doc_id, r.dhash)
        for r in image_perceptual_hashes(spark, sf_dir).collect()
    }
    assert part1 < got, "restart consumed nothing new"
    assert got == want, "maintained index != batch rebuild"
    n_docs = len(want)
    assert len({d for d, _ in got}) == n_docs, "duplicate doc_ids in index"
    # forced replay of batch 0: overwrite its own directory, no growth
    import os as _os

    dirs_before = sorted(_os.listdir(idx))
    batch0 = (
        spark.read.parquet(src)
        .filter("doc_id % 3 = 0")
        .select("doc_id", "text")
    )
    append_sigs_batch(batch0, 0, idx)
    replayed = {
        (r.doc_id, r.dhash) for r in read_dhash_index(spark, idx).collect()
    }
    assert replayed == want, "replay changed the index"
    assert sorted(_os.listdir(idx)) == dirs_before


# --- rendezvous shard plan ---------------------------------------------------


def test_rendezvous_no_move_theorem(spark, sf_dir):
    """HRW consistent hashing: growing 8→9 shards can only move docs INTO
    the new shard — n_moved_in must be 0 for every old shard, old-shard
    populations can only shrink, and the totals conserve."""
    from data_engineer_interview_task_spark.operators import maintenance

    rows = maintenance.rendezvous_shard_plan(spark, sf_dir).collect()
    by = {r.shard: r for r in rows}
    assert set(by) == set(range(9))
    for s in range(8):
        assert by[s].n_moved_in == 0, f"old shard {s} gained docs"
        assert by[s].n_at_new <= by[s].n_at_old
    assert by[8].n_at_old == 0
    assert by[8].n_moved_in == by[8].n_at_new > 0
    assert sum(r.n_at_old for r in rows) == sum(r.n_at_new for r in rows)


# --- Spark 4 VARIANT ---------------------------------------------------------


def test_variant_rollup_invariants(spark, sf_dir):
    """Typed VARIANT extraction invariants: the nested type string always
    round-trips (n_type_match == n), the missing path is NULL on every
    row (n_missing_null == n), and vals[1] mirrors $.k by construction
    (sum_val1 == sum_k)."""
    from data_engineer_interview_task_spark.operators import relational

    rows = relational.variant_event_props_rollup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_type_match == r.n
        assert r.n_missing_null == r.n
        assert r.sum_val1 == r.sum_k


# --- quadrant-hash crop pairs -------------------------------------------------


def test_quadrant_pairs_contain_dhash_near_dups(spark, sf_dir):
    """A dHash near-dup pair differs in ≤2 perturbation pixels, so at
    least two quadrants are byte-identical — every whole-image near-dup
    must appear among the quadrant pairs (with ≥2 matches), and the
    quadrant report must be non-vacuous."""
    from data_engineer_interview_task_spark.operators import multimodal

    qp = {
        (r.doc_a, r.doc_b): r.n_quadrants_match
        for r in multimodal.image_quadrant_dup_pairs(spark, sf_dir).collect()
    }
    nd = {
        (r.doc_a, r.doc_b)
        for r in multimodal.image_dhash_near_dup_pairs(
            spark, sf_dir
        ).collect()
    }
    assert qp and nd
    for pair in nd:
        assert pair in qp, f"near-dup {pair} missing from quadrant pairs"
        assert qp[pair] >= 2


# --- batch-3 entries ---------------------------------------------------------


def test_assortativity_matches_python_replay(spark, sf_dir):
    from data_engineer_interview_task_spark.operators import graph

    edges = [
        (r.src, r.dst)
        for r in graph.co_purchase_edges(spark, sf_dir, 5).collect()
    ]
    deg: dict = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    m = len(edges)
    sx = sum(deg[s] for s, _ in edges)
    sx2 = sum(deg[s] ** 2 for s, _ in edges)
    sxy = sum(deg[s] * deg[d] for s, d in edges)
    num = m * sxy - sx * sx
    den = m * sx2 - sx * sx
    want = (
        0
        if den == 0
        else (num * 1_000_000 // den if num >= 0 else -((-num) * 1_000_000 // den))
    )
    row = graph.copurchase_degree_assortativity(spark, sf_dir).collect()[0]
    assert row.m_edges == m
    assert row.sum_deg == sx
    assert row.sum_deg_sq == sx2
    assert row.sum_deg_prod == sxy
    assert row.assortativity_ppm == want


def test_cross_source_matrix_conserves_pairs(spark, sf_dir):
    from data_engineer_interview_task_spark.operators import dedup
    from data_engineer_interview_task_spark.sources import read_table
    import hashlib

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    fams: dict = {}
    for r in docs:
        fp = hashlib.md5(
            " ".join(r.text.split(" ")[:20]).encode()
        ).hexdigest()
        fams.setdefault(fp, []).append(r)
    want_pairs = sum(
        len(v) * (len(v) - 1) // 2 for v in fams.values() if len(v) <= 50
    )
    rows = dedup.cross_source_dup_matrix(spark, sf_dir).collect()
    assert sum(r.n_pairs for r in rows) == want_pairs
    assert want_pairs > 0, "vacuous fixture — no prefix dup pairs"
    for r in rows:
        assert r.source_a <= r.source_b


def test_group_by_all_equals_explicit(spark, sf_dir):
    from data_engineer_interview_task_spark.operators import extended
    from data_engineer_interview_task_spark.sources import read_table
    from pyspark.sql import functions as F

    got = {
        (r.l_returnflag, r.l_linestatus): (r.n_items, r.sum_qty, r.sum_price)
        for r in extended.group_by_all_revenue(spark, sf_dir).collect()
    }
    li = read_table(spark, sf_dir, "lineitem")
    want = {
        (r.l_returnflag, r.l_linestatus): (r.n, float(r.q), float(r.p))
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("p"),
        )
        .collect()
    }
    assert got == want
