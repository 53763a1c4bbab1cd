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
