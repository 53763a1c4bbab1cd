"""Real-codec tests (VERDICT r4 item 3): the pure-stdlib PNG codec that
closes the "multimodal decode never ran on real bytes" gap. Covers the
codec in isolation (round-trip across color types/shapes, every scanline
filter's inverse, spec-level chunk framing + CRC integrity, corruption
detection) and the Spark seam end-to-end: ``decode_image`` dispatches
real PNG payloads to the decoder, and ``multimodal_png_decode`` publishes
n_px_bytes/sha computed from the genuinely DECODED raster."""
from __future__ import annotations

import hashlib
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineer_interview_task_spark.functions.png_codec import (
    PNG_SIGNATURE,
    png_decode,
    png_encode,
)
from data_engineer_interview_task_spark.operators import multimodal

CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


@settings(max_examples=40, deadline=None)
@given(
    ct=st.sampled_from([0, 2, 4, 6]),
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    data=st.data(),
)
def test_roundtrip_identity(ct, w, h, data):
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=w * h * CHANNELS[ct],
                max_size=w * h * CHANNELS[ct],
            )
        )
    )
    dec, W, H, CT = png_decode(png_encode(px, w, h, ct))
    assert (dec, W, H, CT) == (px, w, h, ct)


def test_all_five_filters_are_exercised_and_inverted():
    # height >= 5 makes the encoder's row%5 cycle hit every filter type;
    # adversarial rasters (constant, ramp, alternating) stress each
    # predictor's wrap-around arithmetic
    w, h = 9, 10
    for px in (
        bytes(w * h),
        bytes(range(256))[: w * h] * 1,
        bytes([0, 255] * (w * h // 2)),
        hashlib.sha256(b"seed").digest() * ((w * h) // 32 + 1),
    ):
        px = px[: w * h]
        payload = png_encode(px, w, h, 0)
        raw = _inflate_idat(payload)
        assert {raw[y * (w + 1)] for y in range(h)} == {0, 1, 2, 3, 4}
        assert png_decode(payload)[0] == px


def _inflate_idat(payload: bytes) -> bytes:
    pos, idat = 8, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat.append(payload[pos + 8 : pos + 8 + length])
        pos += 12 + length
    return zlib.decompress(b"".join(idat))


def test_encoder_emits_spec_compliant_chunk_framing():
    payload = png_encode(bytes(range(48)), 4, 4, 2)
    assert payload[:8] == PNG_SIGNATURE
    pos, tags = 8, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        assert zlib.crc32(tag + data) & 0xFFFFFFFF == crc
        tags.append(tag)
        pos += 12 + length
    assert pos == len(payload)  # no trailing garbage
    assert tags == [b"IHDR", b"IDAT", b"IEND"]
    width, height, depth, ct, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", payload[16:29]
    )
    assert (width, height, depth, ct, comp, filt, interlace) == (4, 4, 8, 2, 0, 0, 0)


def test_corruption_and_out_of_scope_shapes_fail_loudly():
    payload = png_encode(bytes(16), 4, 4, 0)
    for cut in (1, 7, 13, 30):
        with pytest.raises(ValueError):
            png_decode(payload[:-cut])
    flipped = bytearray(payload)
    flipped[40] ^= 1  # inside IDAT -> CRC mismatch
    with pytest.raises(ValueError):
        png_decode(bytes(flipped))
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")
    # interlaced flag rejected (out of scope, not silently misdecoded)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="interlaced"):
        png_decode(PNG_SIGNATURE + chunk + payload[8 + 25 :])


def test_decode_image_seam_dispatches_real_png():
    px = hashlib.sha256(b"pixels").digest()[:27]
    payload = png_encode(px, 3, 3, 2)
    dec, w, h, ct = multimodal.decode_image(payload)
    assert (dec, w, h, ct) == (px, 3, 3, 2)
    # JPEG signatures now dispatch to the REAL jpeg decoder (which rejects
    # this garbage stream as corrupt, not as unimplemented)...
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
    # ...while genuinely impossible modalities stay the documented seam
    with pytest.raises(NotImplementedError) as e:
        multimodal.decode_image(b"RIFF....WEBPvideo-ish")
    assert "fake_decode" in str(e.value)


def test_png_decode_query_reads_truly_decoded_raster(spark, sf_dir):
    """The published n_px_bytes/pixel_sha must be computed from the raster
    the DECODER produced, which must equal the known construction
    (md5-hex of the text repeated to 256 gray bytes)."""
    out = {r.doc_id: r for r in multimodal.multimodal_png_decode(spark, sf_dir).collect()}
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    assert set(out) == set(docs)
    for doc_id, text in docs.items():
        raster = (hashlib.md5(text.encode()).hexdigest() * 8).encode()
        r = out[doc_id]
        assert (r.width, r.height, r.n_px_bytes) == (16, 16, 256)
        assert r.pixel_sha == hashlib.sha256(raster).hexdigest()


# --- palette (color type 3) — round 6, VERDICT r5 item 5 ---------------


@settings(max_examples=25, deadline=None)
@given(w=st.integers(1, 12), h=st.integers(1, 12), data=st.data())
def test_palette_roundtrip_expands_plte(w, h, data):
    n_entries = data.draw(st.integers(1, 256))
    palette = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=3 * n_entries,
                max_size=3 * n_entries,
            )
        )
    )
    idx = bytes(
        data.draw(
            st.lists(st.integers(0, n_entries - 1), min_size=w * h, max_size=w * h)
        )
    )
    payload = png_encode(idx, w, h, 3, palette=palette)
    px, rw, rh, ct = png_decode(payload)
    assert (rw, rh, ct) == (w, h, 3)
    assert px == bytes(b for v in idx for b in palette[3 * v : 3 * v + 3])


def test_palette_error_paths():
    pal = bytes(range(48))  # 16 entries
    with pytest.raises(ValueError, match="palette"):
        png_encode(bytes(16), 4, 4, 3)  # missing palette
    with pytest.raises(ValueError, match="index out of range"):
        png_encode(bytes([16] * 16), 4, 4, 3, palette=pal)
    with pytest.raises(ValueError, match="palette"):
        png_encode(bytes(16), 4, 4, 0, palette=pal)  # palette w/o ct=3
    # decoder: a palette payload whose PLTE chunk is stripped must fail
    payload = png_encode(bytes(16), 4, 4, 3, palette=pal)
    pos, stripped = 8, bytearray(payload[:8])
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        if tag != b"PLTE":
            stripped += payload[pos : pos + 12 + length]
        pos += 12 + length
    with pytest.raises(ValueError, match="PLTE"):
        png_decode(bytes(stripped))


def test_palette_decode_query_matches_arithmetic_raster(spark, sf_dir):
    rows = multimodal.multimodal_palette_png_decode(spark, sf_dir).limit(5).collect()
    assert rows
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(500)
        .collect()
    }
    pal = multimodal.PALETTE16
    for r in rows:
        hx = hashlib.md5(docs[r.doc_id].encode()).hexdigest() * 8
        rgb = bytes(b for c in hx for b in pal[3 * int(c, 16) : 3 * int(c, 16) + 3])
        assert (r.width, r.height, r.n_px_bytes) == (16, 16, len(rgb))
        assert r.pixel_sha == hashlib.sha256(rgb.hex().encode()).hexdigest()
