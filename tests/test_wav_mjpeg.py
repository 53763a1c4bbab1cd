"""Round-6 multimodal extensions: the pure-stdlib WAV (RIFF PCM) codec
behind the audio seam, and the MJPG length-prefixed video container's
seek-skip frame sampling."""
from __future__ import annotations

import hashlib
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineer_interview_task_spark.functions.wav_codec import (
    WAV_SIGNATURE,
    wav_decode,
    wav_encode,
)
from data_engineer_interview_task_spark.operators import multimodal


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(0, 400),
    rate=st.sampled_from([8000, 16000, 44100]),
    nch=st.integers(1, 3),
    data=st.data(),
)
def test_wav_roundtrip(n, rate, nch, data):
    samples = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=n * nch, max_size=n * nch))
    )
    payload = wav_encode(samples, rate, nch)
    assert payload[:4] == WAV_SIGNATURE
    out, r, c, bits = wav_decode(payload)
    assert (out, r, c, bits) == (samples, rate, nch, 8)


def test_wav_skips_unknown_chunks_with_word_alignment():
    samples = bytes(range(100))
    payload = wav_encode(samples, 8000)
    # splice an odd-length LIST chunk (forcing the alignment pad) between
    # fmt and data: a correct walker skips it, a sloppy one desyncs
    fmt_end = payload.index(b"data")
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = payload[:fmt_end] + junk + payload[fmt_end:]
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    out, r, c, bits = wav_decode(spliced)
    assert out == samples and r == 8000


def test_wav_corruption_and_out_of_scope_fail_loudly():
    payload = wav_encode(bytes(64), 8000)
    with pytest.raises(ValueError):
        wav_decode(payload[:-9])
    with pytest.raises(ValueError):
        wav_decode(b"RIFX" + payload[4:])
    # non-PCM format code rejected, not misread
    fmt_pos = payload.index(b"fmt ") + 8
    nonpcm = bytearray(payload)
    nonpcm[fmt_pos] = 3  # IEEE float
    with pytest.raises(ValueError, match="non-PCM"):
        wav_decode(bytes(nonpcm))
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"ID3\x04mp3-ish payload")


def test_decode_audio_seam_dispatches_real_wav():
    samples = hashlib.sha256(b"audio").digest()
    out, r, c, bits = multimodal.decode_audio(wav_encode(samples, 16000))
    assert (out, r, c, bits) == (samples, 16000, 1, 8)


def test_mjpeg_container_sampling_decodes_only_every_kth(spark, sf_dir):
    rows = (
        multimodal.multimodal_mjpeg_frame_sample(spark, sf_dir)
        .filter("doc_id < 3")
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {0, 1, 2}
    for doc_rows in by_doc.values():
        assert sorted(r.frame_idx for r in doc_rows) == [0, 2]
        for r in doc_rows:
            assert (r.width, r.height, r.n_px_bytes) == (16, 16, 256)
    # sampled frame 0 of the clip equals the single-image jpeg query's
    # decode (same digest bytes 0-3, same codec) for the same doc
    single = {
        r.doc_id: r.pixel_sha
        for r in multimodal.multimodal_jpeg_decode(spark, sf_dir)
        .filter("doc_id < 3")
        .collect()
    }
    for doc_id, doc_rows in by_doc.items():
        f0 = next(r for r in doc_rows if r.frame_idx == 0)
        assert f0.pixel_sha == single[doc_id]
