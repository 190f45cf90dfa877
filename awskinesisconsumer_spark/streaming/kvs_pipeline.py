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

    Works identically on batch and streaming inputs (the parse + pivot
    + join are all per-chunk-keyed, so streaming needs no watermark:
    state never spans chunks).
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


def demux_blocks(blocks: DataFrame, *, payload_col: str = "frame_payload") -> DataFrame:
    """Demux stage (SURVEY row 11): parse each SimpleBlock's header
    into relational columns (track/timecode/keyframe/lacing/n_frames)
    via an Arrow-batched mapInPandas — `demux(video=0)` becomes
    `filter(track == 0)` downstream, and the lace count feeds the
    frame explode."""
    from collections.abc import Iterator as _It

    import pandas as pd

    from awskinesisconsumer_spark.functions.ebml_decode import parse_simple_block

    in_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in blocks.schema.fields
    )
    out_schema = (
        f"{in_fields}, track bigint, timecode int, keyframe boolean, "
        "lacing string, n_frames int"
    )

    def demux(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            meta = [
                parse_simple_block(bytes(b)) if b is not None else {}
                for b in pdf[payload_col]
            ]
            out = pdf.copy()
            out["track"] = [m.get("track") for m in meta]
            out["timecode"] = [m.get("timecode") for m in meta]
            out["keyframe"] = [m.get("keyframe") for m in meta]
            out["lacing"] = [m.get("lacing") for m in meta]
            out["n_frames"] = [m.get("n_frames") for m in meta]
            yield out

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

    Pairing trick: a TagString at position p belongs to the TagName
    that immediately precedes it. Collect both streams per chunk,
    sort by position, and zip name[i] -> string[i] (KVS emits strict
    alternation, one TagString per TagName — ref parser.py:349-356).
    Entirely aggregation-based: one shuffle on chunk_id, no windows.
    """
    names = (
        elements.where(F.col("name") == "TagName")
        .groupBy("chunk_id")
        .agg(F.array_sort(F.collect_list(F.struct("position", "value_str")))
             .alias("_names"))
    )
    strings = (
        elements.where(F.col("name") == "TagString")
        .groupBy("chunk_id")
        .agg(F.array_sort(F.collect_list(F.struct("position", "value_str")))
             .alias("_strings"))
    )
    paired = names.join(strings, "chunk_id").select(
        "chunk_id",
        F.zip_with(
            "_names", "_strings",
            lambda n, s: F.struct(
                n["value_str"].alias("k"), s["value_str"].alias("v")
            ),
        ).alias("kv"),
    )
    # Extract each fixed tag as the LAST matching pair (element_at -1):
    # Matroska legally repeats TagNames and the reference's setattr is
    # last-wins (parser.py:349-360). A map_from_entries here would
    # THROW on duplicate keys under the default mapKeyDedupPolicy.
    # try_element_at: an absent tag filters to an empty array, where
    # plain element_at(-1) throws under ANSI mode. Null-valued entries
    # (an unpaired trailing TagName zip-padded with null) are excluded
    # so a corrupt tail can't mask an earlier valid value — matching
    # the reference's overwrite-only-on-TagString (parser.py:349-360).
    cols = [
        F.try_element_at(
            F.filter("kv",
                     lambda e: (e["k"] == F.lit(t)) & e["v"].isNotNull()),
            F.lit(-1),
        )["v"].alias(t)
        for t in KVS_TAG_NAMES
    ]
    return paired.select("chunk_id", *cols)
