"""The reference's ACTUAL pipeline, end-to-end on Spark: a stream of
raw MKV fragment bytes -> EBML tokenize -> per-fragment tag pivot ->
frames joined to their fragment's tags.

This is the full composition the reference hand-fuses across two
threads and a FIFO (/root/reference/parser.py:313-449), expressed as
one streaming DataFrame DAG:

  chunks (binary)                      GetMedia payload, pre-framed per
      |                                fragment (KVS delivers fragments)
  parse_ebml_chunks (mapInPandas)      ebml.py:307-349 tokenizer
      |
  +---+--------------------+
  |                        |
  tag KV rows          SimpleBlock rows
  (TagName/TagString)  (the packet/frame payloads)
      |                        |
  pivot per chunk          frame id assign
      |                        |
  +---+------------------------+
  |
  broadcast-free equi-join on chunk_id  (the as-of join degenerates to
  |                                      an equi-join once fragments
  frames-with-tags                       are the parallelism unit —
                                         position-based matching was an
                                         artifact of the byte-stream
                                         cursor, ref parser.py:421-432)

Why the join simplifies: the reference matches packets to tags by byte
position because both interleave in ONE unbounded stream. Framing the
source per fragment (which Kinesis Video already guarantees — each
GetMedia fragment is a self-contained MKV segment) makes fragment
membership explicit, so the monotone-position as-of collapses into a
keyed equi-join with no ordering dependence at all. That is the
100 TB-correct formulation; the general as-of operators remain in
operators/asof_join.py for sources without framing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from awskinesisconsumer_spark.sources.ebml import parse_ebml_chunks

KVS_TAG_NAMES = [
    "AWS_KINESISVIDEO_FRAGMENT_NUMBER",
    "AWS_KINESISVIDEO_SERVER_TIMESTAMP",
    "AWS_KINESISVIDEO_PRODUCER_TIMESTAMP",
    "AWS_KINESISVIDEO_MILLIS_BEHIND_NOW",
    "AWS_KINESISVIDEO_CONTINUATION_TOKEN",
]

INTERESTING = ["TagName", "TagString", "SimpleBlock", "DocTypeReadVersion"]


def kvs_frames_with_tags(chunks: DataFrame) -> DataFrame:
    """(chunk_id, payload) -> one row per frame with its fragment tags.

    Batch DataFrames only: the pivot aggregates and the left join are
    not expressible in a single streaming append-mode DAG. Streaming
    inputs go through `kvs_stream`, whose foreachBatch executes this
    SAME batch DAG per micro-batch — semantically equivalent because
    every stage is per-chunk-keyed and a chunk arrives whole in one
    micro-batch row, so no state ever spans batches.
    """
    elements = parse_ebml_chunks(chunks, interesting_names=INTERESTING)
    tags = pivot_tags(elements)
    frames = demux_blocks(
        elements.where(F.col("name") == "SimpleBlock").select(
            "chunk_id",
            F.col("position").alias("frame_position"),
            F.col("value_bin").alias("frame_payload"),
        )
    )
    # LEFT join: a fragment with no (or corrupt) Tags section must not
    # silently lose its frames — they surface with null tag columns so
    # callers can route them (the late/missing-data-routed policy,
    # vs the reference's hard error at parser.py:429).
    return frames.join(tags, "chunk_id", "left")


def demux_blocks(blocks: DataFrame, *, payload_col: str = "frame_payload",
                 explode_laced: bool = False) -> DataFrame:
    """Demux stage (SURVEY row 11): parse each SimpleBlock's header
    into relational columns (track/timecode/keyframe/lacing/n_frames)
    via an Arrow-batched mapInPandas — `demux(video=0)` becomes
    `filter(track == 0)` downstream, and the lace count feeds the
    frame explode.

    explode_laced=True additionally splits each block's laced frame
    payloads (Xiph / fixed-size / EBML lacing, the part the reference
    delegates to libav) and emits one row per laced frame with
    `lace_index` (0-based) and `lace_payload`. A block whose lace
    header is corrupt stays visible as ONE row with null lace columns
    — never silently dropped — so callers can route it to the error
    channel (the late/missing-data-routed policy)."""
    from collections.abc import Iterator as _It

    import pandas as pd

    from awskinesisconsumer_spark.functions.ebml_decode import (
        parse_simple_block,
        split_laced_frames,
    )

    in_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in blocks.schema.fields
    )
    out_schema = (
        f"{in_fields}, track bigint, timecode int, keyframe boolean, "
        "lacing string, n_frames int"
    )
    if explode_laced:
        out_schema += ", lace_index int, lace_payload binary"

    def parse_or_empty(b) -> dict:
        # A truncated/corrupt block header must surface as one row of
        # null metadata, not abort the whole Arrow batch.
        if b is None:
            return {}
        try:
            return parse_simple_block(bytes(b))
        except ValueError:
            return {}

    def demux(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            meta = [parse_or_empty(b) for b in pdf[payload_col]]
            out = pdf.copy()
            out["track"] = [m.get("track") for m in meta]
            out["timecode"] = [m.get("timecode") for m in meta]
            out["keyframe"] = [m.get("keyframe") for m in meta]
            out["lacing"] = [m.get("lacing") for m in meta]
            out["n_frames"] = [m.get("n_frames") for m in meta]
            if not explode_laced:
                yield out
                continue
            rows = []
            for i in range(len(out)):
                payload = pdf[payload_col].iloc[i]
                base = out.iloc[i]
                try:
                    frames = (split_laced_frames(bytes(payload))
                              if payload is not None else [])
                except ValueError:
                    frames = []
                if not frames:
                    rows.append({**base, "lace_index": None,
                                 "lace_payload": None})
                    continue
                for j, fb in enumerate(frames):
                    rows.append({**base, "lace_index": j,
                                 "lace_payload": fb})
            yield pd.DataFrame(rows, columns=list(out.columns)
                               + ["lace_index", "lace_payload"])

    return blocks.mapInPandas(demux, out_schema)


def kvs_stream(chunks_stream: DataFrame, *, out_path: str,
               checkpoint: str, available_now: bool = True):
    """Streaming form: every stage of kvs_frames_with_tags is
    chunk-local (a chunk arrives whole in one micro-batch row), so the
    correct streaming execution is foreachBatch over the SAME batch
    DAG — no cross-batch state, no watermark.

    Delivery semantics: AT-LEAST-ONCE. foreachBatch re-runs a batch if
    the driver dies between the parquet append and the offset-log
    commit, so a crash can duplicate that batch's rows. Exactly-once
    needs a transactional sink (Delta/Iceberg `txnAppId=batch_id`) or
    a downstream dedup on (chunk_id, frame_position); clean
    stop/restart (the tested path) replays nothing."""

    def write_batch(batch: DataFrame, _batch_id: int) -> None:
        kvs_frames_with_tags(batch).write.mode("append").parquet(out_path)

    writer = (
        chunks_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def pivot_tags(elements: DataFrame) -> DataFrame:
    """TagName/TagString pairing + pivot, per chunk.

    Pairing rule: a TagString belongs to the NEAREST TagName at a
    smaller byte position — the reference's lastTagName adjacency
    (parser.py:349-356), computed as a running `last(TagName)` window
    over position order. Position pairing (not index zip) means a
    corrupt fragment missing one TagString mid-stream leaves only that
    name unset instead of shifting every later string onto the wrong
    name. Repeated TagNames stay last-wins via max_by on position
    (the reference's setattr overwrite, parser.py:349-360).

    One shuffle: the window partitions by chunk_id and the groupBy
    reuses that partitioning (only an extra in-partition sort).
    """
    from pyspark.sql import Window

    kv = elements.where(F.col("name").isin("TagName", "TagString")).select(
        "chunk_id", "position", "name", "value_str"
    )
    w = (
        Window.partitionBy("chunk_id")
        .orderBy("position")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    paired = kv.withColumn(
        "_k",
        F.last(
            F.when(F.col("name") == "TagName", F.col("value_str")),
            ignorenulls=True,
        ).over(w),
    ).where(
        # Overwrite-only-on-valid-TagString (parser.py:349-360): a
        # string before any name, or a null string value, is dropped so
        # a corrupt pair can't mask an earlier valid value.
        (F.col("name") == "TagString")
        & F.col("_k").isNotNull()
        & F.col("value_str").isNotNull()
    )
    cols = [
        F.max_by(
            F.when(F.col("_k") == t, F.col("value_str")),
            F.when(F.col("_k") == t, F.col("position")),
        ).alias(t)
        for t in KVS_TAG_NAMES
    ]
    return paired.groupBy("chunk_id").agg(*cols)
