"""Time-based sampling / throttling (SURVEY §2 row 14, `sample-throttle-time`).

Reference semantics (/root/reference/parser.py:460-463): drop frames
arriving before ``next_frame_time``; admit one, schedule the next
admission ``span`` seconds later. Wall-clock and order-dependent.

Spark-first deterministic variant (divergence documented per SURVEY §7
hard-part b): first-row-per-(key, time-bucket). Same downsampling
effect, but reproducible and parallel: tumbling buckets via epoch
arithmetic + min-struct per group. One shuffle, map-side combine,
no window function needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def throttle_first_per_window(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    order: str,
    span_seconds: int,
) -> DataFrame:
    """Keep the first row (by `order`) of every `span_seconds` bucket
    per key. span<=0 disables (reference: negative span admits all,
    /root/reference/parser.py:543,460).

    Implemented as groupBy + min_by instead of row_number() over a
    window: aggregation gets map-side partial combine (each task keeps
    only one candidate row per bucket), so at 100 TB the shuffle moves
    ~one row per bucket, not every row.
    """
    if span_seconds <= 0:
        return df
    bucket = F.floor(F.unix_timestamp(F.col(ts)) / span_seconds).alias("_bucket")
    winner = df.groupBy(F.col(key).alias("_key"), bucket).agg(
        F.min_by(F.struct(*df.columns), F.col(order)).alias("_row")
    )
    return winner.select("_row.*")
