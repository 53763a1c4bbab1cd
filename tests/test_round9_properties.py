"""Round-9 property tests.

1. Plan pins for the five de-weakened queries (VERDICT r8 item 1 + 6):
   no unbounded-grain global-window sort survives in
   ``customer_revenue_pareto``, ``shuffle_skew_report`` (both
   variants), ``quality_threshold_for_budget``, ``vocab_coverage``, or
   ``dataset_card_report`` — every remaining window is _pid-scoped
   (the two-phase in-partition pass) or runs on the n_parts-row offset
   frame, and the vocab top-k is a TakeOrderedAndProject.
2. The ``two_phase_cumsum`` generalization (``extra=``/``totals=``):
   multi-aggregate single-pass output must be bit-identical to the
   built-in global windows and a plain aggregate.
"""
from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineer_interview_task_spark.operators.relational import (
    two_phase_cumsum,
)
from data_engineer_interview_task_spark.plans import explain_str


def _window_lines(plan: str):
    return [
        ln for ln in plan.splitlines() if "windowspecdefinition(" in ln
    ]


def test_pareto_plan_has_no_global_sort_window(spark, sf_dir):
    from data_engineer_interview_task_spark.operators import extended

    plan = explain_str(extended.customer_revenue_pareto(spark, sf_dir))
    for ln in _window_lines(plan):
        assert "_pid" in ln, f"customer-grain global window: {ln}"


@pytest.mark.parametrize("variant", ["single", "composite"])
def test_skew_report_plan_has_no_global_sort_window(spark, sf_dir, variant):
    from data_engineer_interview_task_spark.operators import maintenance

    fn = (
        maintenance.shuffle_skew_report
        if variant == "single"
        else maintenance.shuffle_skew_report_composite
    )
    plan = explain_str(fn(spark, sf_dir))
    for ln in _window_lines(plan):
        assert "_pid" in ln, f"key-grain global window: {ln}"


def test_quality_threshold_plan_has_no_global_sort_window(spark, sf_dir):
    from data_engineer_interview_task_spark.operators import sampling

    plan = explain_str(sampling.quality_threshold_for_budget(spark, sf_dir))
    for ln in _window_lines(plan):
        assert "_pid" in ln, f"score-grain global window: {ln}"


def test_vocab_coverage_plan_uses_take_ordered(spark, sf_dir):
    from data_engineer_interview_task_spark.operators import text

    plan = explain_str(text.vocab_coverage(spark, sf_dir))
    assert "windowspecdefinition" not in plan, "vocab-grain rank window"
    assert "TakeOrderedAndProject" in plan


def test_dataset_card_plan_has_no_global_sort_window(spark, sf_dir):
    from data_engineer_interview_task_spark.operators import maintenance

    plan = explain_str(maintenance.dataset_card_report(spark, sf_dir))
    for ln in _window_lines(plan):
        assert "_pid" in ln, f"value-grain global window: {ln}"


# --- G.711 mu-law / A-law codec ------------------------------------------


def test_g711_fixed_points_and_reference_values():
    """Value-level fixed point decode∘encode∘decode == decode for every
    byte of both laws (the ±0 byte pair makes byte-level idempotence too
    strong for µ-law — 0xFF and 0x7F both decode to 0), plus the classic
    reference spot values from the CCITT tables and the WAV walk guards."""
    from data_engineer_interview_task_spark.functions.g711_codec import (
        alaw_decode_sample,
        alaw_decode_wav,
        alaw_encode_sample,
        alaw_encode_wav,
        mulaw_decode_sample,
        mulaw_decode_wav,
        mulaw_encode_sample,
        mulaw_encode_wav,
    )

    for b in range(256):
        r = mulaw_decode_sample(b)
        assert mulaw_decode_sample(mulaw_encode_sample(r)) == r
        r = alaw_decode_sample(b)
        assert alaw_decode_sample(alaw_encode_sample(r)) == r
    assert mulaw_encode_sample(0) == 0xFF
    assert mulaw_encode_sample(-1) == 0x7F
    assert mulaw_encode_sample(32635) == 0x80
    assert mulaw_encode_sample(-32768) == 0x00
    assert alaw_encode_sample(0) == 0xD5
    assert alaw_encode_sample(-1) == 0x55
    assert alaw_encode_sample(32767) == 0xAA
    assert alaw_encode_sample(-32768) == 0x2A

    import random

    rng = random.Random(2)
    samples = [rng.randrange(-32768, 32768) for _ in range(64)]
    assert mulaw_decode_wav(mulaw_encode_wav(samples)) == [
        mulaw_decode_sample(mulaw_encode_sample(s)) for s in samples
    ]
    assert alaw_decode_wav(alaw_encode_wav(samples)) == [
        alaw_decode_sample(alaw_encode_sample(s)) for s in samples
    ]
    with pytest.raises(ValueError):
        mulaw_decode_wav(alaw_encode_wav(samples))  # fmt tag mismatch
    with pytest.raises(ValueError):
        mulaw_encode_wav([])


# --- RLE8 BMP codec -------------------------------------------------------


def test_bmp_rle8_roundtrip_and_escapes():
    """Random index rasters round-trip bit-exactly through encode/decode
    (mixed runs and literals force both encodings); the fixture shape
    provably contains an absolute-mode escape; delta escapes decode with
    the skipped-pixels-are-zero rule; guards reject non-BMP payloads and
    mismatched rows."""
    import hashlib
    import random
    import struct

    from data_engineer_interview_task_spark.functions.bmp_codec import (
        bmp_decode_rle8,
        bmp_encode_rle8,
    )

    pal = bytes(
        b for i in range(256) for b in (i, (7 * i) % 256, (13 * i) % 256)
    )

    def expand(rows):
        return b"".join(
            bytes((pal[3 * v], pal[3 * v + 1], pal[3 * v + 2]))
            for r in rows
            for v in r
        )

    rng = random.Random(9)
    for _ in range(20):
        w = rng.choice([5, 8, 16, 33])
        h = rng.choice([1, 4, 16])
        rows = [
            bytes(rng.choice([rng.randrange(256), 7]) for _ in range(w))
            for _ in range(h)
        ]
        rgb, dw, dh = bmp_decode_rle8(bmp_encode_rle8(rows, w, h, pal))
        assert (dw, dh) == (w, h) and rgb == expand(rows)

    # the registered fixture contains a genuine absolute-mode escape
    d = hashlib.md5(b"fixture").digest()
    rows = [
        bytes(
            [d[y]] * 8
            + [d[(y + x) % 16] for x in range(8, 13)]
            + [d[15 - y]] * 3
        )
        for y in range(16)
    ]
    payload = bmp_encode_rle8(rows, 16, 16, pal)
    off = struct.unpack_from("<I", payload, 10)[0]
    data = payload[off:]
    assert any(
        data[i] == 0 and data[i + 1] >= 3 for i in range(len(data) - 1)
    )
    rgb, *_ = bmp_decode_rle8(payload)
    assert rgb == expand(rows)

    # hand-built delta escape: run(2, 5), delta(+2, 0), run(1, 9), EOL,
    # EOB over a 5x1 image — skipped pixels read as index 0
    hand = bytearray(payload[: off])
    # rebuild a minimal payload via the encoder's framing: reuse header
    # of a 5x1 encode then substitute the data section
    base = bmp_encode_rle8([bytes([5, 5, 0, 0, 9])], 5, 1, pal)
    boff = struct.unpack_from("<I", base, 10)[0]
    delta_data = bytes([2, 5, 0, 2, 2, 0, 1, 9, 0, 0, 0, 1])
    patched = bytearray(base[:boff]) + delta_data
    struct.pack_into("<I", patched, 34, len(delta_data))
    rgb, w, h = bmp_decode_rle8(bytes(patched))
    assert (w, h) == (5, 1)
    assert rgb == expand([bytes([5, 5, 0, 0, 9])])

    with pytest.raises(ValueError):
        bmp_decode_rle8(b"PNG whatever")
    with pytest.raises(ValueError):
        bmp_encode_rle8([b"abc"], 4, 1, pal)


# --- two_phase_cumsum extra=/totals= generalization ----------------------


@pytest.mark.parametrize("n_parts", [1, 3, 8])
def test_two_phase_extra_and_totals_match_builtin(spark, n_parts):
    rows = [(i, (i * 37) % 101, (i * 13) % 7 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, key long, w long")
    order = [F.col("key").asc(), F.col("id").asc()]
    got = (
        two_phase_cumsum(
            df,
            order,
            F.col("w"),
            "cum_w",
            n_parts=n_parts,
            extra=((F.lit(1), "rk"), (F.col("id"), "cum_id")),
            totals=(
                (F.count(F.lit(1)).cast("long"), "n"),
                (F.sum("w"), "tot_w"),
            ),
        )
        .orderBy("id")
        .collect()
    )
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    exp = (
        df.select(
            "id",
            F.sum("w").over(w).alias("cum_w"),
            F.row_number().over(Window.orderBy(*order)).alias("rk"),
            F.sum("id").over(w).alias("cum_id"),
        )
        .orderBy("id")
        .collect()
    )
    tot_w = sum(r[2] for r in rows)
    for g, e in zip(got, exp):
        assert (g["id"], g["cum_w"], g["rk"], g["cum_id"]) == (
            e["id"], e["cum_w"], e["rk"], e["cum_id"],
        )
        assert g["n"] == 500 and g["tot_w"] == tot_w


# --- AC-band successive-approximation JPEG (T.81 G.1.2.3) ----------------


def test_ac_sa_progressive_equals_baseline_raster():
    """The AC-refinement encode/decode pair must reconstruct the exact
    baseline raster on arbitrary content: random rasters (mixed runs,
    signs, correction bits 0 and 1), AC-rich gradients (long runs +
    byte stuffing), and step blocks (the registered fixture shape)."""
    import random

    from data_engineer_interview_task_spark.functions.jpeg_codec import (
        jpeg_decode,
        jpeg_decode_progressive,
        jpeg_encode,
        jpeg_encode_progressive_ac_sa,
    )

    rng = random.Random(11)
    cases = []
    for _ in range(8):
        w = h = 8 * rng.choice([1, 2, 3])
        cases.append((bytes(rng.randrange(256) for _ in range(w * h)), w, h))
    for a, b in [(13, 7), (255, 0), (1, 254)]:
        cases.append((
            bytes((a * x + b * y) % 256 for y in range(16) for x in range(16)),
            16, 16,
        ))
    for a, b in [(0, 255), (200, 10), (128, 128), (37, 36)]:
        cases.append((
            bytes((a if x % 8 < 4 else b) for y in range(16) for x in range(16)),
            16, 16,
        ))
    for px, w, h in cases:
        base, bw_, bh_ = jpeg_decode(jpeg_encode(px, w, h))
        sa, sw, sh = jpeg_decode_progressive(
            jpeg_encode_progressive_ac_sa(px, w, h)
        )
        assert (sw, sh) == (bw_, bh_) == (w, h)
        assert sa == base


def test_ac_sa_refinement_zrl_path():
    """A block whose ONLY nonzero coefficient is a lone +1 at (4,4)
    (zigzag 35) is invisible to the Al=1 first scan (|1| >> 1 == 0), so
    the refinement scan must introduce it as newly-nonzero after a
    29-position still-zero run — exercising the refinement ZRL branch
    (run > 15) that the step fixture never reaches. The sign-alternating
    +/-amp pattern of the (4,4) cosine basis quantizes to exactly that
    lone coefficient for amp in 5..12 (verified against the raw FDCT at
    authoring time)."""
    from data_engineer_interview_task_spark.functions.jpeg_codec import (
        jpeg_decode,
        jpeg_decode_progressive,
        jpeg_encode,
        jpeg_encode_progressive_ac_sa,
    )

    sgn = (1, -1, -1, 1, 1, -1, -1, 1)
    for amp in (5, 12):
        px = bytes(
            128 + amp * sgn[x] * sgn[y] for y in range(8) for x in range(8)
        )
        base, *_ = jpeg_decode(jpeg_encode(px, 8, 8))
        sa, *_ = jpeg_decode_progressive(
            jpeg_encode_progressive_ac_sa(px, 8, 8)
        )
        assert sa == base


def test_ac_sa_encoder_guards():
    from data_engineer_interview_task_spark.functions.jpeg_codec import (
        jpeg_encode_progressive_ac_sa,
    )

    with pytest.raises(ValueError):
        jpeg_encode_progressive_ac_sa(bytes(100), 10, 10)
    with pytest.raises(ValueError):
        jpeg_encode_progressive_ac_sa(bytes(63), 8, 8)


def test_plain_progressive_unchanged_by_scan_refactor():
    """``jpeg_encode_progressive`` now routes through the generalized
    ``_ac_first_scan`` (al=0); its output must still decode to the
    baseline raster (the refactor is byte-identical by construction,
    raster-identical by this pin)."""
    import random

    from data_engineer_interview_task_spark.functions.jpeg_codec import (
        jpeg_decode,
        jpeg_decode_progressive,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = random.Random(4)
    for _ in range(4):
        px = bytes(rng.randrange(256) for _ in range(16 * 16))
        base, *_ = jpeg_decode(jpeg_encode(px, 16, 16))
        prog, *_ = jpeg_decode_progressive(jpeg_encode_progressive(px, 16, 16))
        assert prog == base


def test_two_phase_grouped_totals_are_per_group(spark):
    rows = [(i, i % 3, i % 5 + 1) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, g long, w long")
    got = two_phase_cumsum(
        df,
        [F.col("id").asc()],
        F.col("w"),
        "cum",
        part_cols=("g",),
        n_parts=4,
        totals=((F.sum("w"), "tot"),),
    ).collect()
    exp_tot = {}
    for i, g, w_ in rows:
        exp_tot[g] = exp_tot.get(g, 0) + w_
    for r in got:
        assert r["tot"] == exp_tot[r["g"]]


def test_dedup_family_agreement_matches_direct_recomputation(spark, sf_dir):
    """The agreement matrix must equal a python recomputation from the
    three family pair sets collected directly, and the matrix must be
    non-vacuous on the fixture corpus (simhash disagrees with the other
    two at the registered defaults)."""
    from data_engineer_interview_task_spark.operators import dedup

    sets = {
        "ngram": {
            (r.doc_a, r.doc_b)
            for r in dedup.ngram_jaccard_pairs(spark, sf_dir)
            .select("doc_a", "doc_b")
            .collect()
        },
        "minhash": {
            (r.doc_a, r.doc_b)
            for r in dedup.minhash_lsh_pairs(spark, sf_dir)
            .select("doc_a", "doc_b")
            .collect()
        },
        "simhash": {
            (r.doc_a, r.doc_b)
            for r in dedup.simhash_near_dup_pairs(spark, sf_dir)
            .select("doc_a", "doc_b")
            .collect()
        },
    }
    got = {
        (r.fam_a, r.fam_b): r.asDict()
        for r in dedup.dedup_family_agreement(spark, sf_dir).collect()
    }
    assert len(got) == 3
    for fam_a, fam_b in (
        ("minhash", "ngram"),
        ("minhash", "simhash"),
        ("ngram", "simhash"),
    ):
        a, b = sets[fam_a], sets[fam_b]
        row = got[(fam_a, fam_b)]
        assert row["n_a"] == len(a)
        assert row["n_b"] == len(b)
        assert row["n_common"] == len(a & b)
        assert row["n_union"] == len(a | b)
        expect_ppm = (
            1_000_000
            if not (a | b)
            else 1_000_000 * len(a & b) // len(a | b)
        )
        assert row["agreement_ppm"] == expect_ppm
        assert row["n_union"] == row["n_a"] + row["n_b"] - row["n_common"]
    # non-vacuous: the strict-Hamming simhash family must genuinely
    # disagree with the token-set families on this corpus
    assert got[("ngram", "simhash")]["agreement_ppm"] < 1_000_000
    assert got[("minhash", "ngram")]["n_a"] > 0


def test_compaction_plan_matches_python_packing(spark, sf_dir):
    """The planned layout must equal a direct python replay of the
    start-offset packing contract over the collected cell frame, rows
    must be conserved, and no planned file may overshoot target by a
    whole cell."""
    from data_engineer_interview_task_spark.operators import maintenance
    from data_engineer_interview_task_spark.sources import read_table

    cells = sorted(
        (
            (r.day, r.event_type, r.n)
            for r in read_table(spark, sf_dir, "events")
            .groupBy(
                F.to_date("ts").alias("day"),
                F.col("event_type"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ),
    )
    total = sum(n for _, _, n in cells)
    target = max(1, total // 12)
    plan: dict[int, dict] = {}
    cum = 0
    for day, _etype, n in cells:
        fid = cum // target
        rec = plan.setdefault(
            fid, {"parts": 0, "rows": 0, "days": []}
        )
        rec["parts"] += 1
        rec["rows"] += n
        rec["days"].append(day)
        cum += n
    got = {
        r.out_file_id: r.asDict()
        for r in maintenance.compaction_plan_report(spark, sf_dir).collect()
    }
    assert set(got) == set(plan)
    max_cell = max(n for _, _, n in cells)
    assert sum(g["n_rows"] for g in got.values()) == total
    for fid, rec in plan.items():
        g = got[fid]
        assert g["n_source_parts"] == rec["parts"]
        assert g["n_rows"] == rec["rows"]
        assert g["first_day"] == min(rec["days"])
        assert g["last_day"] == max(rec["days"])
        assert g["target_rows"] == target
        assert g["fill_ppm"] == 1_000_000 * rec["rows"] // target
        # a cell is assigned where its first row lands, so the
        # overshoot past target is strictly less than one cell
        assert g["n_rows"] < target + max_cell
    # the plan genuinely compacts: fewer output files than source cells
    assert len(got) < len(cells)


def test_compaction_plan_windows_are_pid_scoped(spark, sf_dir):
    from data_engineer_interview_task_spark.operators import maintenance
    from data_engineer_interview_task_spark.plans import explain_str

    plan = explain_str(
        maintenance.compaction_plan_report(spark, sf_dir)
    )
    for ln in _window_lines(plan):
        assert "_pid" in ln, f"cell-grain global window: {ln}"


def test_cohens_kappa_matches_direct_computation(spark, sf_dir):
    """kappa_ppm must equal the textbook statistic computed from the
    collected (labeled, predicted) pairs with exact integer arithmetic,
    and chance correction must genuinely bite (kappa < accuracy)."""
    from collections import Counter

    from data_engineer_interview_task_spark.operators import text

    pairs = [
        (r.labeled_lang, r.predicted_lang)
        for r in text.lang_id(spark, sf_dir)
        .select("labeled_lang", "predicted_lang")
        .collect()
    ]
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    rows = Counter(a for a, _ in pairs)
    cols = Counter(b for _, b in pairs)
    sum_rc = sum(rows[k] * cols.get(k, 0) for k in rows)
    num = n * agree - sum_rc
    den = n * n - sum_rc
    expect = (
        0
        if den == 0
        else (
            1_000_000 * num // den
            if num >= 0
            else -(1_000_000 * (-num) // den)
        )
    )
    got = text.cohens_kappa_langid(spark, sf_dir).collect()[0]
    assert got.n_docs == n and got.n_agree == agree
    assert got.accuracy_ppm == 1_000_000 * agree // n
    assert got.chance_ppm == 1_000_000 * sum_rc // (n * n)
    assert got.kappa_ppm == expect
    # non-vacuous: imbalanced marginals make kappa < raw accuracy
    assert got.kappa_ppm < got.accuracy_ppm


def test_mann_kendall_matches_direct_computation(spark, sf_dir):
    """S, tau-a ppm and the tie-adjusted variance numerator must equal
    a direct python replay over the collected daily series."""
    from collections import Counter, defaultdict

    from data_engineer_interview_task_spark.operators import cleaning
    from data_engineer_interview_task_spark.sources import read_table

    daily = defaultdict(dict)
    rows = (
        read_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                (F.col("value").cast("decimal(18,2)") * 100).cast("long")
            ).alias("y")
        )
        .collect()
    )
    for r in rows:
        daily[r.event_type][r.day] = r.y
    got = {
        r.event_type: r.asDict()
        for r in cleaning.mann_kendall_trend(spark, sf_dir).collect()
    }
    # single-day types have no pairs and are DROPPED (documented in the
    # operator docstring) — guard the expectation instead of assuming
    # every type survives (ADVICE r9)
    multi = {e for e, s in daily.items() if len(s) >= 2}
    assert set(got) == multi
    any_nonzero = False
    for etype in multi:
        series = daily[etype]
        ys = [series[d] for d in sorted(series)]
        n = len(ys)
        s = sum(
            (ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        n_pairs = n * (n - 1) // 2
        tie_term = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(ys).values()
        )
        g = got[etype]
        assert g["n_days"] == n
        assert g["n_pairs"] == n_pairs
        assert g["s_stat"] == s
        expect_tau = (
            1_000_000 * s // n_pairs
            if s >= 0
            else -(1_000_000 * (-s) // n_pairs)
        )
        assert g["tau_ppm"] == expect_tau
        assert g["var18"] == n * (n - 1) * (2 * n + 5) - tie_term
        any_nonzero = any_nonzero or s != 0
    assert any_nonzero  # the test corpus genuinely trends somewhere


def test_theil_sen_matches_fraction_median(spark, sf_dir):
    """The fixed-point key medians must equal the TRUE rational slope
    medians (computed with Fraction) pushed through trunc(1e9·x) — the
    collision-free-key claim verified on real data, not just argued."""
    from collections import defaultdict
    from fractions import Fraction

    from data_engineer_interview_task_spark.operators import cleaning
    from data_engineer_interview_task_spark.sources import read_table

    daily = defaultdict(dict)
    for r in (
        read_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                (F.col("value").cast("decimal(18,2)") * 100).cast("long")
            ).alias("y")
        )
        .collect()
    ):
        daily[r.event_type][r.day] = r.y
    got = {
        r.event_type: r.asDict()
        for r in cleaning.theil_sen_slope(spark, sf_dir).collect()
    }
    # single-day types yield no pairwise slopes and are DROPPED
    # (documented) — guard the expectation (ADVICE r9)
    multi = {e for e, s in daily.items() if len(s) >= 2}
    assert set(got) == multi
    for etype in multi:
        series = daily[etype]
        days = sorted(series)
        slopes = sorted(
            Fraction(series[d2] - series[d1], (d2 - d1).days)
            for i, d1 in enumerate(days)
            for d2 in days[i + 1 :]
        )
        n = len(slopes)
        lo, hi = slopes[(n + 1) // 2 - 1], slopes[n // 2]
        g = got[etype]
        assert g["n_slopes"] == n
        # int() of a Fraction truncates toward zero — the same rounding
        # as the engines' sign-split floor division
        assert g["sen_lo_nanos"] == int(Fraction(10**9) * lo)
        assert g["sen_hi_nanos"] == int(Fraction(10**9) * hi)


def test_pettitt_matches_direct_computation(spark, sf_dir):
    """K, U_at_K and the change day must equal a direct python replay
    of the Pettitt statistic over the collected daily series."""
    from collections import defaultdict

    from data_engineer_interview_task_spark.operators import cleaning
    from data_engineer_interview_task_spark.sources import read_table

    daily = defaultdict(dict)
    for r in (
        read_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                (F.col("value").cast("decimal(18,2)") * 100).cast("long")
            ).alias("y")
        )
        .collect()
    ):
        daily[r.event_type][r.day] = r.y
    got = {
        r.event_type: r.asDict()
        for r in cleaning.pettitt_change_point(spark, sf_dir).collect()
    }
    # single-day types have no (i <= t < j) pairs and are DROPPED
    # (documented) — guard the expectation (ADVICE r9)
    multi = {e for e, s in daily.items() if len(s) >= 2}
    assert set(got) == multi
    for etype in multi:
        series = daily[etype]
        days = sorted(series)
        ys = [series[d] for d in days]
        n = len(ys)
        best = None
        for t in range(n - 1):
            u = sum(
                (ys[j] > ys[i]) - (ys[j] < ys[i])
                for i in range(t + 1)
                for j in range(t + 1, n)
            )
            # first day attaining the max |U| wins (day ASC tie-break)
            if best is None or abs(u) > abs(best[1]):
                best = (days[t], u)
        g = got[etype]
        assert g["n_days"] == n
        assert g["change_day"] == best[0]
        assert g["u_at_k"] == best[1]
        assert g["k_stat"] == abs(best[1])
        assert g["k_stat"] > 0  # non-vacuous: some level shift exists
