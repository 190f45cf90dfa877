"""Property-based tests (hypothesis) for the round-6 operators —
driver-side replicas of the exact kernel code, so the properties run
thousands of cases without a Spark job per example (the Spark-side
integration is covered by tests/test_round6_ops.py)."""

from __future__ import annotations

import io
import struct
import wave

from hypothesis import given, settings
from hypothesis import strategies as st


from awskinesisconsumer_spark.operators.text import (
    _normalize_string as _normalize_one,
)


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=200))
def test_normalize_text_kernel_is_idempotent(s):
    once = _normalize_one(s)
    assert _normalize_one(once) == once


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=200))
def test_normalize_text_kernel_output_is_clean(s):
    out = _normalize_one(s)
    assert "​" not in out and "﻿" not in out
    assert not any(0 <= ord(c) <= 8 or 0x0B <= ord(c) <= 0x1F
                   or ord(c) == 0x7F for c in out)
    assert "  " not in out and "\t" not in out and " \n" not in out
    assert out == out.strip(" \n")


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=1, max_size=400),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_pcm16_roundtrip_exact(samples, rate):
    # Any int16 sample vector survives the stdlib wave encode/decode
    # bit-exactly — the invariant decode_wav's statistics rest on.
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    with wave.open(io.BytesIO(buf.getvalue()), "rb") as r:
        assert (r.getnchannels(), r.getsampwidth(), r.getframerate(),
                r.getnframes()) == (1, 2, rate, len(samples))
        back = struct.unpack(f"<{len(samples)}h", r.readframes(len(samples)))
    assert list(back) == samples


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=1, max_value=12),
       st.integers(min_value=1, max_value=12),
       st.integers(min_value=0, max_value=10_000))
def test_png_encode_decode_pixel_roundtrip(h, w, seed):
    # The engine's PNG subset roundtrips pixel-exactly at any shape.
    import pandas as pd

    from awskinesisconsumer_spark.operators import multimodal as mm

    # drive the kernels directly (mapInPandas closures) on one batch
    import struct as _struct
    import zlib as _zlib

    def chunk(tag, body):
        return (_struct.pack(">I", len(body)) + tag + body
                + _struct.pack(">I", _zlib.crc32(tag + body) & 0xFFFFFFFF))

    raw = bytearray()
    expect = 0
    for y in range(h):
        raw.append(0)
        for x in range(w):
            for c in range(3):
                v = (seed * 7 + y * 131 + x * 17 + c * 43) % 256
                raw.append(v)
                expect += v
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", _zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))

    # replay decode_png's kernel logic through its mapInPandas fn by
    # invoking the module function on a local pandas batch
    out = []
    for pdf in _decode_png_batches(mm, pd.DataFrame(
            {"doc_id": [seed], "payload": [png]})):
        out.append(pdf)
    row = pd.concat(out).iloc[0]
    assert (int(row.height), int(row.width)) == (h, w)
    assert bool(row.crc_ok) and int(row.sum_pixels) == expect


def _decode_png_batches(mm, pdf):
    """Extract decode_png's inner kernel by running the operator's
    mapInPandas function body: build the same closure via a tiny
    DataFrame-less shim (the function only needs batch iterables)."""
    captured = {}

    class _FakeDF:
        def mapInPandas(self, fn, schema):
            captured["fn"] = fn
            return None

    mm.decode_png(_FakeDF())
    return captured["fn"](iter([pdf]))


@settings(max_examples=500, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=200), max_size=60),
       st.integers(min_value=1, max_value=128))
def test_next_fit_invariants(tokens, capacity):
    # pack_nofragment's kernel: no positive-token doc straddles its
    # sequence (unless it alone exceeds capacity -> dedicated seq at
    # offset 0); sequence indices are non-decreasing, step <= 1;
    # offsets equal the running fill within each sequence.
    from awskinesisconsumer_spark.operators.corpus_prep import _next_fit

    seqs, offs = _next_fit(tokens, capacity)
    assert len(seqs) == len(offs) == len(tokens)
    fill = {}
    for t, sq, off in zip(tokens, seqs, offs):
        assert off == fill.get(sq, 0)
        fill[sq] = fill.get(sq, 0) + t
        if 0 < t <= capacity:
            assert off + t <= capacity
        elif t > capacity:
            assert off == 0
    if seqs:
        assert seqs[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(seqs, seqs[1:]))
        # a sequence break only happens on a genuine overflow
        for i in range(1, len(seqs)):
            if seqs[i] == seqs[i - 1] + 1:
                assert tokens[i] > 0 and offs[i] == 0
