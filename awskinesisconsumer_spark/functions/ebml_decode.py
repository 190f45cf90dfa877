"""EBML primitive decoders (SURVEY §2 rows 4-5: `decode-varint`,
`decode-scalars`).

Pure-Python byte-level decode kernels plus their vectorized pandas-UDF
wrappers. The kernels implement RFC 8794 semantics:

* element id: 1-4 byte varint, marker bits KEPT (Matroska convention);
* element size: 1-8 byte varint, marker stripped; the all-VINT_DATA-ones
  pattern per width means "unknown size" -> sentinel EBML_UNKNOWN_SIZE.
  NB the reference has a latent 5-byte-path bug — a decimal `0x00001000`
  comparison literal (/root/reference/ebml.py:228) — which this
  implementation deliberately does NOT replicate (regression-tested in
  tests/test_ebml.py).
* integers: big-endian 1-8 bytes, two's-complement sign fixup for SINT;
* floats: 4/8-byte big-endian IEEE 754;
* date: signed nanoseconds since 2001-01-01T00:00:00 UTC.

Inside Spark these run batch-at-a-time via Arrow (pandas UDFs), never
row-at-a-time Python UDFs — and only in the scan/parse stage; once
elements are relational rows everything downstream is JVM expressions.
"""

from __future__ import annotations

import datetime as _dt
import struct

import pandas as pd

from pyspark.sql.functions import pandas_udf

EBML_UNKNOWN_SIZE = -1
EBML_EPOCH = _dt.datetime(2001, 1, 1, tzinfo=_dt.timezone.utc)

# Per-width "all data bits set" values for the unknown-size encoding:
# width w has 7*w usable bits.
_UNKNOWN_BY_WIDTH = {w: (1 << (7 * w)) - 1 for w in range(1, 9)}


def varint_width(first_byte: int) -> int:
    """Number of bytes in a varint whose first byte is given: position
    of the leading 1 bit. 0x80->1, 0x40->2 ... 0x01->8. 0x00 is invalid."""
    for w in range(1, 9):
        if first_byte & (0x80 >> (w - 1)):
            return w
    raise ValueError("invalid EBML varint: first byte 0x00")


def read_varint(buf: bytes, pos: int = 0, *, keep_marker: bool) -> tuple[int, int]:
    """Decode one varint at buf[pos]. Returns (value, new_pos).

    keep_marker=True -> element-id semantics (marker bit retained);
    keep_marker=False -> size semantics (marker stripped, all-ones ->
    EBML_UNKNOWN_SIZE).
    """
    if pos >= len(buf):
        raise ValueError("truncated varint")
    first = buf[pos]
    w = varint_width(first)
    if pos + w > len(buf):
        raise ValueError("truncated varint")
    value = first if keep_marker else first & (0xFF >> w)
    for i in range(1, w):
        value = (value << 8) | buf[pos + i]
    if not keep_marker and value == _UNKNOWN_BY_WIDTH[w]:
        return EBML_UNKNOWN_SIZE, pos + w
    return value, pos + w


def decode_uint(data: bytes) -> int:
    value = 0
    for b in data:
        value = (value << 8) | b
    return value


def decode_sint(data: bytes) -> int:
    if not data:
        return 0
    value = decode_uint(data)
    if data[0] & 0x80:  # two's-complement sign fixup
        value -= 1 << (8 * len(data))
    return value


def decode_float(data: bytes) -> float:
    if len(data) == 4:
        return struct.unpack(">f", data)[0]
    if len(data) == 8:
        return struct.unpack(">d", data)[0]
    if len(data) == 0:
        return 0.0
    raise ValueError(f"invalid EBML float width {len(data)}")


def decode_date_ns(data: bytes) -> _dt.datetime:
    """EBML DATE: signed ns since 2001-01-01T00:00:00 UTC (truncated to
    microseconds, the finest Spark/DuckDB-portable resolution)."""
    ns = decode_sint(data)
    return EBML_EPOCH + _dt.timedelta(microseconds=ns // 1000)


def parse_simple_block(data: bytes) -> dict:
    """Parse a Matroska SimpleBlock payload header (public spec,
    matroska.org "SimpleBlock structure"): track-number varint,
    signed 16-bit big-endian relative timecode, flags byte
    (keyframe 0x80, invisible 0x08, lacing 0x06, discardable 0x01),
    then 0..n laced frame payloads.

    The reference hands this to libav (parser.py:415-442); parsing the
    header ourselves gives the demux-level columns (track, timecode,
    keyframe) relationally, so `demux(video=0)` becomes a plain
    `filter(track == 0)` on real data. Lacing: NONE -> 1 frame;
    EBML/Xiph/fixed lacing -> frame count from the lace header (frame
    payloads stay opaque bytes).
    """
    track, pos = read_varint(data, 0, keep_marker=False)
    if pos + 3 > len(data):
        raise ValueError("truncated SimpleBlock header")
    timecode = int.from_bytes(data[pos:pos + 2], "big", signed=True)
    flags = data[pos + 2]
    body = data[pos + 3:]
    lacing = (flags & 0x06) >> 1
    if lacing == 0:
        n_frames = 1
    else:
        # all lace modes lead with (frame_count - 1)
        n_frames = (body[0] + 1) if body else 1
    return {
        "track": track,
        "timecode": timecode,
        "keyframe": bool(flags & 0x80),
        "invisible": bool(flags & 0x08),
        "discardable": bool(flags & 0x01),
        "lacing": ("none", "xiph", "fixed", "ebml")[lacing],
        "n_frames": n_frames,
        "body_bytes": len(body),
    }


def _read_lace_raw(buf: bytes, pos: int) -> tuple[int, int, int]:
    """Decode one lace-size varint WITHOUT the unknown-size sentinel
    mapping (all-data-bits-ones is a legal lace size, not "unknown").
    Returns (value, width, new_pos)."""
    if pos >= len(buf):
        raise ValueError("truncated lace varint")
    w = varint_width(buf[pos])
    if pos + w > len(buf):
        raise ValueError("truncated lace varint")
    value = buf[pos] & (0xFF >> w)
    for i in range(1, w):
        value = (value << 8) | buf[pos + i]
    return value, w, pos + w


def split_laced_frames(data: bytes) -> list[bytes]:
    """Split a SimpleBlock payload into its individual frame payloads,
    implementing all three Matroska lacing modes (public spec,
    matroska.org "Lacing" / RFC 9559 §10) — the part the reference
    delegates wholesale to libav (parser.py:415-442):

    * no lacing: the body is the single frame;
    * Xiph: sizes of frames 0..n-2 as 255-run-length byte sums
      (each size = sum of bytes until one < 255); last = remainder;
    * fixed-size: body divides evenly into n frames;
    * EBML: first size as a plain varint, then signed varint deltas
      (range-shifted by 2^(7w-1)-1) against the previous size;
      last = remainder.

    Raises ValueError on truncated/inconsistent lace headers (callers
    route those blocks to the error channel rather than guessing).
    """
    _track, pos = read_varint(data, 0, keep_marker=False)
    if pos + 3 > len(data):
        raise ValueError("truncated SimpleBlock header")
    flags = data[pos + 2]
    body = data[pos + 3:]
    lacing = (flags & 0x06) >> 1
    if lacing == 0:
        return [body]
    if not body:
        raise ValueError("laced SimpleBlock with empty body")
    n_frames = body[0] + 1
    sizes: list[int] = []
    lpos = 1  # past the frame-count byte
    if lacing == 1:  # Xiph
        for _ in range(n_frames - 1):
            size = 0
            while True:
                if lpos >= len(body):
                    raise ValueError("truncated Xiph lace sizes")
                b = body[lpos]
                lpos += 1
                size += b
                if b != 255:
                    break
            sizes.append(size)
    elif lacing == 2:  # fixed-size
        total = len(body) - 1
        if total % n_frames:
            raise ValueError(
                f"fixed lacing: {total} bytes not divisible by {n_frames} frames"
            )
        sizes = [total // n_frames] * (n_frames - 1)
    else:  # EBML
        # n_frames == 1 (count byte 0x00) is legal: zero lace-size
        # fields, the remainder is the single frame.
        if n_frames > 1:
            prev, _, lpos = _read_lace_raw(body, lpos)
            sizes.append(prev)
            for _ in range(n_frames - 2):
                raw, w, lpos = _read_lace_raw(body, lpos)
                prev += raw - ((1 << (7 * w - 1)) - 1)  # signed range shift
                if prev < 0:
                    raise ValueError("EBML lacing: negative frame size")
                sizes.append(prev)
    frames: list[bytes] = []
    for size in sizes:
        if lpos + size > len(body):
            raise ValueError("lace sizes exceed block body")
        frames.append(body[lpos:lpos + size])
        lpos += size
    frames.append(body[lpos:])  # last frame = remainder (all modes)
    return frames


# ---------------------------------------------------------------------------
# Vectorized (Arrow-batched) wrappers for use in DataFrame plans.
# Built lazily: pandas_udf registration needs an active SparkSession,
# so module import must stay session-free.
# ---------------------------------------------------------------------------

_UDF_SPECS = {
    "udf_decode_uint": ("bigint", decode_uint),
    "udf_decode_sint": ("bigint", decode_sint),
    "udf_decode_float": ("double", decode_float),
    "udf_decode_date": ("timestamp", decode_date_ns),
    "udf_varint_value": (
        "bigint", lambda b: read_varint(b, 0, keep_marker=False)[0]
    ),
}
_UDF_CACHE: dict[str, object] = {}


def _make_udf(name: str):
    if name not in _UDF_CACHE:
        ret_type, kernel = _UDF_SPECS[name]

        def wrapped(col: pd.Series) -> pd.Series:
            return col.map(lambda b: kernel(b) if b is not None else None)

        _UDF_CACHE[name] = pandas_udf(ret_type)(wrapped)
    return _UDF_CACHE[name]


def __getattr__(name: str):
    if name in _UDF_SPECS:
        return _make_udf(name)
    raise AttributeError(name)
