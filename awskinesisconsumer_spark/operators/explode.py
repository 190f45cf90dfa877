"""Demux-filter + decode-explode (SURVEY §2 row 11, `demux-decode-explode`).

Reference semantics (/root/reference/parser.py:415-442): demux selects
the video track (`demux(video=0)` == a stream-type filter), each packet
then decodes into 0..n frames (one-to-many explode).

Spark-first: filter + `explode(sequence(...))` (or explode over an
array produced by a decode pandas UDF for real media, see
streaming/multimodal). Both are narrow ops — no shuffle — and stay
inside whole-stage codegen when the per-row frame count is a column
expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decode_explode(
    df: DataFrame,
    *,
    track_filter: Column,
    n_frames: Column,
    seq_col: str = "frame_seq",
) -> DataFrame:
    """Keep rows passing `track_filter`, emit `n_frames` rows each with
    a 1-based `seq_col`. n_frames<=0 → row disappears (a packet that
    decodes to zero frames, exactly the reference's inner-loop shape).
    """
    return (
        df.where(track_filter)
        .where(n_frames > 0)
        .withColumn(seq_col, F.explode(F.sequence(F.lit(1), n_frames.cast("int"))))
    )
