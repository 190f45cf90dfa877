"""Stream segmentation (SURVEY §2 row 9, `segment-fragments`).

Reference semantics (/root/reference/parser.py:362-375): a boundary
element (`DocTypeReadVersion`) closes the current fragment; everything
since the previous boundary belongs to one fragment, which is emitted
as a single record stamped with its end position.

Spark-first: mint a segment id with a running count of boundaries over
an ordered window, then group by it. Partitioned by a stream key so the
window never degenerates to a single-task global sort — at 100 TB a
global ordered window is the one plan shape that cannot scale, so the
key is mandatory here (the reference's single stream == one key value).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def segment_by_boundary(
    df: DataFrame,
    *,
    key: str,
    order: str,
    is_boundary: Column,
    segment_col: str = "segment_id",
) -> DataFrame:
    """Assign a segment id per row: boundaries CLOSE segments, so a
    row's segment = number of boundaries strictly before it (within
    key, in `order` order). The boundary row itself belongs to the
    segment it closes, matching the reference where the closing element
    is the last event of its fragment.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_before = F.coalesce(
        F.sum(F.when(is_boundary, 1).otherwise(0)).over(w), F.lit(0)
    )
    return df.withColumn(segment_col, n_before.cast("bigint"))


def sessionize_by_gap(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization (the inactivity-gap complement of the
    boundary rule): a new session starts when the time since the
    previous event within the key exceeds the gap. Same single-shuffle
    window shape as segment_by_boundary — lag + running sum — and
    (unlike F.session_window) trivially expressible in ANSI SQL, so
    the operator is oracle-checkable."""
    w = Window.partitionBy(key).orderBy(ts)
    # microsecond-exact gap: unix_timestamp() truncates to seconds,
    # which shifts session boundaries for sub-second timestamps.
    micros = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    prev_ts = F.lag(ts).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((micros(F.col(ts)) - micros(prev_ts)) > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    running = (
        Window.partitionBy(key).orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        session_col, F.sum(new_session).over(running).cast("bigint")
    )


def aggregate_segments(
    segmented: DataFrame,
    *,
    key: str,
    order: str,
    value: str,
    segment_col: str = "segment_id",
) -> DataFrame:
    """Per-segment rollup: row count, value sum, and the segment-end
    position — the analogue of emitting one Tags row per fragment
    stamped with its end byte offset (/root/reference/parser.py:363).
    """
    return segmented.groupBy(key, segment_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(value), 2).alias("sum_value"),
        F.max(order).alias("end_position"),
    )
