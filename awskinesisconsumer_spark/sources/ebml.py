"""EBML tokenizer as a Spark scan stage (SURVEY §2 rows 3-6:
`scan-ebml-tokenize`, `decode-varint`, `decode-scalars`,
`scan-prune-elements`).

The reference parses ONE unbounded byte stream sequentially
(/root/reference/ebml.py:307-349). That shape cannot scale: a single
cursor means a single task. The Spark-first design exploits the
format's own framing instead — Kinesis Video delivers self-contained
MKV fragments, so the unit of parallelism is the *chunk* (one fragment
payload per row). Each chunk parses independently inside
``mapInPandas`` (Arrow-batched), giving one task per input split at
100 TB with zero coordination; within a chunk the tokenizer is the
same single-pass non-seekable loop as the reference.

Element pruning (the reference's skip-by-size, ebml.py:309-327) is
preserved: pass ``interesting_names`` and the tokenizer seeks past
uninteresting non-MASTER elements without decoding their values —
and, when a name filter is set, emits only matching elements, the
in-UDF analogue of projection pushdown.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType, DoubleType, LongType, StringType, StructField, StructType,
    TimestampType,
)

from awskinesisconsumer_spark.functions.ebml_decode import (
    EBML_UNKNOWN_SIZE,
    decode_date_ns,
    decode_float,
    decode_sint,
    decode_uint,
    read_varint,
)
from awskinesisconsumer_spark.functions.registry import EBML_REGISTRY, EbmlType

ELEMENT_SCHEMA = StructType([
    StructField("chunk_id", LongType()),
    StructField("position", LongType()),      # byte offset after the element head
    StructField("element_id", LongType()),
    StructField("name", StringType()),        # null for out-of-registry ids
    StructField("ebml_type", StringType()),
    StructField("size", LongType()),          # null <=> unknown-size sentinel
    StructField("value_uint", LongType()),
    StructField("value_sint", LongType()),
    StructField("value_float", DoubleType()),
    StructField("value_str", StringType()),
    StructField("value_ts", TimestampType()),
    StructField("value_bin", BinaryType()),
])

_EMPTY = {f.name: None for f in ELEMENT_SCHEMA.fields}

# Heads-only scan schema: element boundaries without any value decode —
# the relational analogue of the reference's per-element head callback
# (ebml.py:157,300-301: the hook fires with (id, size, position) BEFORE
# the payload is read). Narrow on purpose: Arrow batches carry 6 columns
# instead of 12, and no payload byte is ever copied.
HEAD_SCHEMA = StructType([f for f in ELEMENT_SCHEMA.fields
                          if not f.name.startswith("value_")])


def tokenize_bytes(
    payload: bytes,
    chunk_id: int = 0,
    interesting_names: set[str] | None = None,
    max_errors: int = 0,
    heads_only: bool = False,
    head_callback=None,
) -> Iterator[dict]:
    """Single-pass tokenizer over one chunk. Yields one dict per
    element (ELEMENT_SCHEMA fields). Permissive: unknown ids yield
    name/type None with the raw value skipped; MASTER elements are
    descended into (children follow inline), matching the flattening
    behavior of the reference (ebml.py:312-315).

    heads_only=True is the head-callback analogue (ref ebml.py:157,
    300-301): every element head is yielded with values left null and
    NO payload byte decoded — pure skip-by-size traversal.

    head_callback — the reference's `elementHeadCalback` extension
    point made explicit (ref ebml.py:157, 300-301 invokes it for
    EVERY element head read, BEFORE the interesting-name filter):
    a callable `(size, element_id, name, ebml_type) -> str | None`
    invoked per head in stream order; its result is attached to the
    yielded rows as `cb_value`. Like the reference hook it observes
    heads the allowlist later drops (size is None for
    unknown-size/streamed elements, matching the `size` column)."""
    pos = 0
    n = len(payload)
    errors = 0
    while pos < n:
        try:
            element_id, p1 = read_varint(payload, pos, keep_marker=True)
            size, p2 = read_varint(payload, p1, keep_marker=False)
        except (ValueError, IndexError):
            errors += 1
            if errors > max_errors:
                return
            pos += 1
            continue
        name, etype = EBML_REGISTRY.get(element_id, (None, None))
        row = dict(_EMPTY)
        row.update(
            chunk_id=chunk_id, position=p2, element_id=element_id,
            name=name,
            ebml_type=etype.value if etype else None,
            size=None if size == EBML_UNKNOWN_SIZE else size,
        )
        if head_callback is not None:
            # fires for EVERY head, like the reference hook — even
            # when the allowlist drops the row below
            row["cb_value"] = head_callback(
                row["size"], element_id, name,
                etype.value if etype else None,
            )
        if heads_only:
            if interesting_names is None or name in interesting_names:
                yield row
            descend = etype is EbmlType.MASTER or size == EBML_UNKNOWN_SIZE
            pos = p2 if descend else min(p2 + size, n)
            continue
        if etype is EbmlType.MASTER or size == EBML_UNKNOWN_SIZE:
            # Descend: children follow inline; no value to decode.
            if interesting_names is None or name in interesting_names:
                yield row
            pos = p2
            continue
        end = min(p2 + size, n)
        interesting = interesting_names is None or name in interesting_names
        if not interesting or name is None:
            # skip-by-size: never decode uninteresting/unknown values
            pos = end
            if interesting and name is None:
                yield row  # unknown id, still surfaced (permissive)
            continue
        data = payload[p2:end]
        try:
            if etype is EbmlType.UINT:
                row["value_uint"] = decode_uint(data)
            elif etype is EbmlType.SINT:
                row["value_sint"] = decode_sint(data)
            elif etype is EbmlType.FLOAT:
                row["value_float"] = decode_float(data)
            elif etype in (EbmlType.STRING, EbmlType.UTF8):
                row["value_str"] = data.decode(
                    "ascii" if etype is EbmlType.STRING else "utf-8",
                    errors="replace",
                )
            elif etype is EbmlType.DATE:
                row["value_ts"] = decode_date_ns(data)
            else:  # BINARY
                row["value_bin"] = bytes(data)
        except (ValueError, UnicodeDecodeError):
            row["value_bin"] = bytes(data)
        yield row
        pos = end


def parse_ebml_chunks(
    chunks: DataFrame,
    *,
    payload_col: str = "payload",
    chunk_id_col: str = "chunk_id",
    interesting_names: list[str] | None = None,
    heads_only: bool = False,
    element_head_callback=None,
) -> DataFrame:
    """Scan stage: (chunk_id, payload binary) -> element rows.

    mapInPandas keeps the decode Arrow-batched and embarrassingly
    parallel across chunks; `interesting_names` is the projection
    allowlist pushed INTO the parse (ref parser.py:324-332).

    heads_only=True returns the narrow HEAD_SCHEMA (no value columns,
    no payload decode) — the structural-index scan used for fragment
    inventory/stats, analogous to the reference's head callback.

    element_head_callback — the reference's user-supplied
    `elementHeadCalback` (ref ebml.py:157, 300-301), Spark-first: a
    plain Python callable `(size, element_id, name, ebml_type) ->
    str | None` shipped to the executors inside the parse UDF and
    invoked for EVERY element head in stream order (before the
    allowlist filter, matching the reference's firing point); its
    per-element result comes back as an extra `cb_value` string
    column. Must be a deterministic pure function — it runs
    per-partition with no cross-task state, so stateful reference
    callbacks (accumulating telemetry) map to aggregating `cb_value`
    downstream instead."""
    from pyspark.sql.types import StringType, StructField, StructType

    allow = set(interesting_names) if interesting_names else None
    schema = HEAD_SCHEMA if heads_only else ELEMENT_SCHEMA
    if element_head_callback is not None:
        schema = StructType(
            list(schema.fields) + [StructField("cb_value", StringType())]
        )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            rows: list[dict] = []
            for cid, payload in zip(pdf[chunk_id_col], pdf[payload_col]):
                if payload is None:
                    continue
                rows.extend(
                    tokenize_bytes(bytes(payload), int(cid), allow,
                                   heads_only=heads_only,
                                   head_callback=element_head_callback)
                )
            yield pd.DataFrame(rows, columns=cols)

    return chunks.mapInPandas(parse, schema)


# ---------------------------------------------------------------------------
# Encoder — for building deterministic test streams (and the sink side).
# ---------------------------------------------------------------------------

def _encode_varint(value: int, *, keep_marker: bool, width: int | None = None) -> bytes:
    if keep_marker:
        # value already contains its marker (element-id convention)
        w = (value.bit_length() + 7) // 8 or 1
        return value.to_bytes(w, "big")
    w = width
    if w is None:
        w = 1
        while value >= (1 << (7 * w)) - 1 and w < 8:  # avoid the unknown-size pattern
            w += 1
    out = value | (1 << (7 * w))
    return out.to_bytes(w, "big")


def encode_element(element_id: int, payload: bytes, *, size_width: int | None = None) -> bytes:
    """id varint + size varint + payload (size in `size_width` bytes if
    forced — used by tests to pin specific varint widths)."""
    return (
        _encode_varint(element_id, keep_marker=True)
        + _encode_varint(len(payload), keep_marker=False, width=size_width)
        + payload
    )


def encode_unknown_size(element_id: int, width: int = 1) -> bytes:
    """Element head with the all-ones unknown-size pattern."""
    unknown = (1 << (7 * width)) - 1
    head = unknown | (1 << (7 * width))
    return _encode_varint(element_id, keep_marker=True) + head.to_bytes(width, "big")
