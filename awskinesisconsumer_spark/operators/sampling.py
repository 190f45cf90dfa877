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


def reservoir_sample_deterministic(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Fixed-size k-row sample per group, deterministic across runs,
    engines, and partitionings: rank rows inside each group by
    ``md5(group || '|' || id)`` and keep the k smallest digests. This
    is the reproducible equivalent of per-group reservoir sampling —
    the hash order is uniform (md5 avalanche) but replayable, unlike
    a true reservoir's RNG-and-arrival-order state.

    One shuffle keyed on the group. Hot groups bound their window
    state to the partition's rows; for pathologically hot groups
    compose with the salted two-level rank (see skew.py) — hash-rank
    commutes with partial top-k because min-k of a union is the
    min-k of per-part min-k's.
    """
    from pyspark.sql import Window

    digest = F.md5(
        F.concat_ws("|", F.col(group_col).cast("string"),
                    F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(digest.asc(), F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .withColumn("sample_rank", F.col("_rn").cast("long"))
        .drop("_rn")
    )
