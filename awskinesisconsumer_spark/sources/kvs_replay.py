"""`kvs-replay` — a Python DataSource (Spark 4 DataSourceV2 API) that
synthesizes Kinesis-Video-style MKV fragments, batch AND streaming.

This is the custom-source formulation of SURVEY §2 rows 1-2: the
production swap-in point is the JVM Kinesis connector
(streaming/replay.py:kinesis_stream), but a DSv2 source shows the
engine-native way to feed raw fragment bytes without files:

* batch: `spark.read.format("kvs-replay").option("n_fragments", 100)`
  — partitions carve the fragment id range, so the scan parallelizes
  like any other source (one task per partition, no driver loop).
* streaming: `spark.readStream.format("kvs-replay")` — offsets are
  fragment indices; each micro-batch emits the fragments between the
  last committed offset and the configured head, giving real
  offset/resume semantics through Spark's checkpoint (the
  continuation-token analogue, ref parser.py:292-303).

Fragments are deterministic (seeded by fragment id), so replays and
restarts reproduce byte-identical data — what makes the
checkpoint-recovery tests meaningful.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

SCHEMA = StructType([
    StructField("chunk_id", LongType()),
    StructField("payload", BinaryType()),
])


def make_fragment(frag_no: int, n_frames: int | None = None) -> bytes:
    """Deterministic KVS-style fragment (header + AWS tags + blocks)."""
    from awskinesisconsumer_spark.sources.ebml import encode_element

    if n_frames is None:
        n_frames = frag_no % 3 + 1
    p = encode_element(0x4285, (2).to_bytes(1, "big"))
    p += encode_element(0x45A3, b"AWS_KINESISVIDEO_FRAGMENT_NUMBER")
    p += encode_element(0x4487, str(91340000000 + frag_no).encode())
    p += encode_element(0x45A3, b"AWS_KINESISVIDEO_CONTINUATION_TOKEN")
    p += encode_element(0x4487, f"tok-{frag_no}".encode())
    for i in range(n_frames):
        body = bytes([(frag_no + i) % 256]) * 16
        p += encode_element(0xA3, b"\x81\x00\x00\x00" + body)
    return p


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class KvsReplayBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n_fragments", 100))
        self.n_parts = int(options.get("num_partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, -(-self.n // self.n_parts))
        return [
            _RangePartition(i, min(i + step, self.n))
            for i in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (i, make_fragment(i))


class KvsReplayStreamReader(DataSourceStreamReader):
    """Offsets are fragment indices — the continuation token analogue.
    `head` advances `rate` fragments per micro-batch up to
    `n_fragments`; Spark's offset log handles resume."""

    def __init__(self, options):
        self.n = int(options.get("n_fragments", 100))
        self.rate = int(options.get("fragments_per_batch", 10))
        self._head = 0

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        self._head = min(self.n, self._head + self.rate)
        return {"index": self._head}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # Restart safety: a fresh reader has _head=0, but the committed
        # start offset from the checkpoint may be ahead of it — clamp
        # so we never hand Spark a regressed (end < start) range, and
        # fast-forward the head to the committed position.
        s, e = start["index"], end["index"]
        if e < s:
            e = s
        self._head = max(self._head, e)
        return [_RangePartition(s, e)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (i, make_fragment(i))

    def commit(self, end: dict) -> None:
        self._head = max(self._head, end["index"])

    def stop(self) -> None:
        pass


class KvsReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kvs-replay"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return KvsReplayBatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return KvsReplayStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(KvsReplayDataSource)
