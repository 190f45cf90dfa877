"""Unit tests for the EBML decode layer (SURVEY §5 item 3): varint
widths 1-8, unknown-size sentinels per width, signed fixup, date epoch,
and the 5-byte-width regression (the reference compares against a
decimal 0x00001000 literal at /root/reference/ebml.py:228 — we must
decode 5-byte sizes correctly).
"""

from __future__ import annotations

import datetime as dt
import struct

import pytest

from awskinesisconsumer_spark.functions.ebml_decode import (
    EBML_UNKNOWN_SIZE,
    decode_date_ns,
    decode_float,
    decode_sint,
    decode_uint,
    read_varint,
    varint_width,
)
from awskinesisconsumer_spark.sources.ebml import (
    encode_element,
    encode_unknown_size,
    tokenize_bytes,
)


@pytest.mark.parametrize("width", range(1, 9))
def test_varint_roundtrip_all_widths(width):
    # a mid-range value needing exactly `width` bytes
    value = 1 << (7 * (width - 1)) if width > 1 else 5
    marker = 1 << (7 * width)
    raw = (value | marker).to_bytes(width, "big")
    got, pos = read_varint(raw, 0, keep_marker=False)
    assert got == value
    assert pos == width


@pytest.mark.parametrize("width", range(1, 9))
def test_unknown_size_sentinel_every_width(width):
    unknown = (1 << (7 * width)) - 1
    marker = 1 << (7 * width)
    raw = (unknown | marker).to_bytes(width, "big")
    got, _ = read_varint(raw, 0, keep_marker=False)
    assert got == EBML_UNKNOWN_SIZE


def test_five_byte_size_regression():
    """The reference's 5-byte path compares against decimal 0x00001000
    (ebml.py:228) and so mis-handles 5-byte sizes; assert ours decodes
    an arbitrary 5-byte size exactly."""
    value = 0x0123456789  # needs 5 bytes of VINT_DATA
    raw = (value | (1 << 35)).to_bytes(5, "big")
    got, pos = read_varint(raw, 0, keep_marker=False)
    assert got == value and pos == 5


def test_element_id_keeps_marker():
    got, pos = read_varint(bytes([0x1A, 0x45, 0xDF, 0xA3]), 0, keep_marker=True)
    assert got == 0x1A45DFA3 and pos == 4


def test_varint_width_invalid_zero():
    with pytest.raises(ValueError):
        varint_width(0x00)


def test_uint_sint_sign_fixup():
    assert decode_uint(b"\x01\x00") == 256
    assert decode_sint(b"\xff") == -1
    assert decode_sint(b"\x80") == -128
    assert decode_sint(b"\x7f") == 127
    assert decode_sint(b"\xff\xfe") == -2
    assert decode_sint(b"") == 0
    # full 8-byte two's complement
    assert decode_sint(b"\xff" * 8) == -1


def test_float_widths():
    assert decode_float(struct.pack(">f", 1.5)) == 1.5
    assert decode_float(struct.pack(">d", -2.25)) == -2.25
    assert decode_float(b"") == 0.0
    with pytest.raises(ValueError):
        decode_float(b"\x00\x00\x00")


def test_date_epoch_2001():
    # 1e9 ns = 1 s after 2001-01-01T00:00:00Z
    data = int(1e9).to_bytes(8, "big", signed=True)
    got = decode_date_ns(data)
    assert got == dt.datetime(2001, 1, 1, 0, 0, 1, tzinfo=dt.timezone.utc)
    # negative: 1 us before the epoch
    data = (-1000).to_bytes(8, "big", signed=True)
    assert decode_date_ns(data) == dt.datetime(
        2000, 12, 31, 23, 59, 59, 999999, tzinfo=dt.timezone.utc
    )


# ---------------------------------------------------------------------------
# Tokenizer over synthetic KVS-like fragments
# ---------------------------------------------------------------------------

def _kvs_fragment(frag_no: str, token: str) -> bytes:
    """A miniature Kinesis-Video-style MKV fragment: header + tags +
    cluster, the structure the reference consumes."""
    header = (
        encode_element(0x4282, b"matroska")                 # DocType
        + encode_element(0x4285, (2).to_bytes(1, "big"))    # DocTypeReadVersion
    )
    tags = (
        encode_element(0x45A3, b"AWS_KINESISVIDEO_FRAGMENT_NUMBER")  # TagName
        + encode_element(0x4487, frag_no.encode())                   # TagString
        + encode_element(0x45A3, b"AWS_KINESISVIDEO_CONTINUATION_TOKEN")
        + encode_element(0x4487, token.encode())
    )
    cluster = (
        encode_element(0xE7, (1234).to_bytes(2, "big"))     # Timestamp (uint)
        + encode_element(0xA3, b"\x81\x00\x00\x00FRAME")    # SimpleBlock (binary)
    )
    return header + tags + cluster


def test_tokenize_full_fragment():
    rows = list(tokenize_bytes(_kvs_fragment("91343852333", "tok-1")))
    by_name = {}
    for r in rows:
        by_name.setdefault(r["name"], []).append(r)
    assert by_name["DocType"][0]["value_str"] == "matroska"
    assert by_name["DocTypeReadVersion"][0]["value_uint"] == 2
    assert [r["value_str"] for r in by_name["TagName"]] == [
        "AWS_KINESISVIDEO_FRAGMENT_NUMBER",
        "AWS_KINESISVIDEO_CONTINUATION_TOKEN",
    ]
    assert [r["value_str"] for r in by_name["TagString"]] == [
        "91343852333", "tok-1",
    ]
    assert by_name["Timestamp"][0]["value_uint"] == 1234
    assert by_name["SimpleBlock"][0]["value_bin"].endswith(b"FRAME")
    # positions are monotone
    positions = [r["position"] for r in rows]
    assert positions == sorted(positions)


def test_tokenize_prunes_uninteresting():
    allow = {"TagName", "TagString"}
    rows = list(tokenize_bytes(_kvs_fragment("1", "t"), interesting_names=allow))
    assert {r["name"] for r in rows} == allow
    # values of uninteresting elements were never decoded (skip-by-size)
    assert all(r["name"] in allow for r in rows)


def test_tokenize_unknown_id_permissive():
    # 0x6EEB is not in the registry; parser must surface it with null
    # name and keep going.
    payload = encode_element(0x6EEB, b"??") + encode_element(0xE7, b"\x01")
    rows = list(tokenize_bytes(payload))
    assert rows[0]["name"] is None and rows[0]["element_id"] == 0x6EEB
    assert rows[1]["name"] == "Timestamp" and rows[1]["value_uint"] == 1


def test_tokenize_unknown_size_descends():
    # Segment with unknown size: children follow inline.
    payload = (
        bytes([0x18, 0x53, 0x80, 0x67])         # Segment id
        + b"\xff"                                # unknown size (1-byte)
        + encode_element(0xE7, b"\x05")
    )
    rows = list(tokenize_bytes(payload))
    assert rows[0]["name"] == "Segment" and rows[0]["size"] is None
    assert rows[1]["name"] == "Timestamp" and rows[1]["value_uint"] == 5


def test_tokenize_spark_stage(spark):
    frags = [(i, _kvs_fragment(str(i), f"tok-{i}")) for i in range(20)]
    df = spark.createDataFrame(frags, "chunk_id bigint, payload binary")
    from awskinesisconsumer_spark.sources.ebml import parse_ebml_chunks

    out = parse_ebml_chunks(df.repartition(4))
    rows = out.collect()
    assert len(rows) == 20 * 8  # 8 elements per fragment
    tag_strings = [
        r for r in rows if r.name == "TagString" and r.value_str.startswith("tok-")
    ]
    assert len(tag_strings) == 20
    # chunk-parallel: every chunk contributed
    assert {r.chunk_id for r in rows} == set(range(20))


def test_parse_simple_block():
    from awskinesisconsumer_spark.functions.ebml_decode import parse_simple_block

    # track 1 (varint 0x81), timecode -2, keyframe, no lacing, payload
    data = b"\x81" + (-2).to_bytes(2, "big", signed=True) + b"\x80" + b"PAYLOAD"
    m = parse_simple_block(data)
    assert m["track"] == 1 and m["timecode"] == -2
    assert m["keyframe"] and m["lacing"] == "none" and m["n_frames"] == 1
    assert m["body_bytes"] == 7

    # track 2, fixed lacing (flags 0x04), 3 frames -> lace head 0x02
    data = b"\x82" + (100).to_bytes(2, "big", signed=True) + b"\x04" + b"\x02" + b"xxyyzz"
    m = parse_simple_block(data)
    assert m["track"] == 2 and m["lacing"] == "fixed" and m["n_frames"] == 3
    assert not m["keyframe"]


def _block(flags: int, body: bytes, track: bytes = b"\x81") -> bytes:
    return track + (0).to_bytes(2, "big", signed=True) + bytes([flags]) + body


def test_split_laced_frames_none_and_fixed():
    from awskinesisconsumer_spark.functions.ebml_decode import split_laced_frames

    assert split_laced_frames(_block(0x80, b"PAYLOAD")) == [b"PAYLOAD"]
    # fixed lacing: 4 frames of 3 bytes each
    body = b"\x03" + b"aaabbbcccddd"
    assert split_laced_frames(_block(0x04, body)) == [b"aaa", b"bbb", b"ccc", b"ddd"]
    # body not divisible by frame count -> error, not a guess
    with pytest.raises(ValueError):
        split_laced_frames(_block(0x04, b"\x02" + b"abcd"))


def test_split_laced_frames_xiph():
    from awskinesisconsumer_spark.functions.ebml_decode import split_laced_frames

    # 3 frames: sizes 300 (=255+45) and 255 (=255+0, the exact-255
    # run-length edge), last = remainder
    f0, f1, f2 = b"x" * 300, b"y" * 255, b"z" * 17
    body = b"\x02" + bytes([255, 45, 255, 0]) + f0 + f1 + f2
    assert split_laced_frames(_block(0x02, body)) == [f0, f1, f2]
    # truncated size run -> error
    with pytest.raises(ValueError):
        split_laced_frames(_block(0x02, b"\x02" + bytes([255])))


def test_split_laced_frames_ebml():
    from awskinesisconsumer_spark.functions.ebml_decode import split_laced_frames

    # 3 frames: first size 500 (2-byte varint 0x41F4), then delta -100
    # -> 400 (2-byte signed varint: raw = -100 + (2^13 - 1) = 8091)
    f0, f1, f2 = b"a" * 500, b"b" * 400, b"c" * 9
    body = b"\x02" + b"\x41\xf4" + (0x4000 | 8091).to_bytes(2, "big") + f0 + f1 + f2
    assert split_laced_frames(_block(0x06, body)) == [f0, f1, f2]
    # lace sizes exceeding the body -> error
    body = b"\x01" + b"\x41\xf4" + b"short"
    with pytest.raises(ValueError):
        split_laced_frames(_block(0x06, body))
    # frame-count byte 0x00 (1 frame, zero lace-size fields) is legal
    # per RFC 9559: the remainder is the single frame, NOT a varint.
    assert split_laced_frames(_block(0x06, b"\x00HELLO")) == [b"HELLO"]
    # body cut off right after the first lace varint's width byte ->
    # ValueError (not IndexError), so demux routes it, not crashes
    with pytest.raises(ValueError):
        split_laced_frames(_block(0x06, b"\x02\x83"))
    with pytest.raises(ValueError):
        split_laced_frames(b"\x81\x00")  # truncated block header


def test_heads_only_traversal():
    """Head-callback analogue (ref ebml.py:157,300-301): every element
    head surfaces with null values and no payload decode; master
    elements still descend."""
    frag = _kvs_fragment("91", "tok")
    full = list(tokenize_bytes(frag))
    heads = list(tokenize_bytes(frag, heads_only=True))
    # identical boundary walk: same ids/positions/sizes, in order
    assert [(h["element_id"], h["position"], h["size"]) for h in heads] == [
        (f["element_id"], f["position"], f["size"]) for f in full
    ]
    # no value ever decoded
    assert all(
        h[k] is None
        for h in heads
        for k in ("value_uint", "value_str", "value_bin", "value_ts")
    )
    # filter still applies
    only = list(tokenize_bytes(frag, interesting_names={"TagName"}, heads_only=True))
    assert only and all(h["name"] == "TagName" for h in only)


def test_heads_only_spark_stage(spark):
    from awskinesisconsumer_spark.sources.ebml import HEAD_SCHEMA, parse_ebml_chunks

    frags = [(i, _kvs_fragment(str(i), f"t{i}")) for i in range(4)]
    df = spark.createDataFrame(frags, "chunk_id bigint, payload binary")
    out = parse_ebml_chunks(df, heads_only=True)
    assert out.schema == HEAD_SCHEMA
    rows = out.collect()
    assert len(rows) == 4 * len(list(tokenize_bytes(_kvs_fragment("0", "t0"))))
    assert all(r.size is not None for r in rows)
