"""Property-based tests (hypothesis) for the EBML codecs: encode ->
decode roundtrips across the full value/width space, plus tokenizer
robustness on arbitrary junk bytes (permissive, never crashes)."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from awskinesisconsumer_spark.functions.ebml_decode import (
    EBML_UNKNOWN_SIZE,
    decode_float,
    decode_sint,
    decode_uint,
    read_varint,
)
from awskinesisconsumer_spark.sources.ebml import (
    _encode_varint,
    encode_element,
    tokenize_bytes,
)


@given(st.integers(min_value=0, max_value=(1 << 56) - 2))
def test_size_varint_roundtrip(value):
    raw = _encode_varint(value, keep_marker=False)
    got, pos = read_varint(raw, 0, keep_marker=False)
    assert got == value
    assert pos == len(raw)


@given(st.integers(min_value=0, max_value=(1 << 56) - 2),
       st.integers(min_value=1, max_value=8))
def test_size_varint_roundtrip_forced_width(value, width):
    if value >= (1 << (7 * width)) - 1:
        return  # doesn't fit (or is the unknown pattern) at this width
    raw = _encode_varint(value, keep_marker=False, width=width)
    got, pos = read_varint(raw, 0, keep_marker=False)
    assert got == value and pos == width


@given(st.binary(min_size=0, max_size=8))
def test_uint_matches_int_from_bytes(data):
    assert decode_uint(data) == int.from_bytes(data, "big")


@given(st.binary(min_size=1, max_size=8))
def test_sint_matches_int_from_bytes_signed(data):
    assert decode_sint(data) == int.from_bytes(data, "big", signed=True)


@given(st.floats(allow_nan=False, width=32))
def test_float32_roundtrip(x):
    assert decode_float(struct.pack(">f", x)) == x


@given(st.floats(allow_nan=False))
def test_float64_roundtrip(x):
    assert decode_float(struct.pack(">d", x)) == x


@given(st.binary(min_size=0, max_size=256))
@settings(max_examples=200)
def test_tokenizer_never_crashes_on_junk(junk):
    # Permissive scan: arbitrary bytes must produce a (possibly empty)
    # row list, never an exception (ref tolerates unknown ids,
    # ebml.py:293-297; we additionally tolerate truncation).
    rows = list(tokenize_bytes(junk, max_errors=16))
    for r in rows:
        assert r["position"] >= 0


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=200),
                          st.binary(max_size=32)), max_size=8))
def test_encode_tokenize_roundtrip_tags(items):
    # Encode a run of TagString elements; tokenizer must return them
    # in order with exact payloads.
    payload = b"".join(encode_element(0x4487, b) for _, b in items)
    rows = [r for r in tokenize_bytes(payload) if r["name"] == "TagString"]
    assert len(rows) == len(items)
    for r, (_, b) in zip(rows, items):
        assert r["value_str"] == b.decode("utf-8", errors="replace")
