"""Interval (range-containment) join: match point rows to interval
rows with start <= point < end.

Spark has no native range-join operator (Catalyst plans an inequality
join as BroadcastNestedLoopJoin when one side is small and falls back
to a cartesian product otherwise — both quadratic shapes that die at
scale). The standard distributed plan is BUCKETING: quantize the range
dimension into fixed-width buckets, explode each interval into every
bucket it overlaps, and equi-join points to interval-buckets on the
bucket id, re-checking the exact predicate after the join. The shuffle
is then keyed and linear in (points + interval-bucket rows), and
Catalyst treats it like any other equi-join (AQE, broadcast, skew
handling all apply).

Reference parity note: the reference's only join is the positional
as-of join (parser.py:421-432); range containment is the natural
generalization the relational surface needs (windows, maintenance
intervals, session attribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    `start <= point < end` (half-open, the usual windowing convention).

    `point_col`, `start_col`, `end_col` must be numeric-castable to
    long (epoch seconds for timestamps — cast upstream). `bucket_width`
    (same unit) trades explode factor against bucket selectivity: pick
    it near the TYPICAL interval length so most intervals explode into
    O(1) buckets. Long intervals explode into length/width rows — cap
    or split pathological ones upstream.

    `how` = 'inner' (matched pairs only) or 'left' (keep unmatched
    points with null interval columns — attribution semantics).

    Output: all point columns + all interval columns. Column names must
    not collide (select/alias upstream).

    Scale shape: interval explode is a narrow generator (sequence() +
    explode — no shuffle); the join is a plain equi-join on bucket id,
    so it shuffles each side once, hash-partitioned; a point matching
    an interval shares exactly one bucket with it (the point's own
    bucket), so no post-join dedup is needed. Overlapping intervals
    produce one output row per (point, interval) pair, as a range join
    must.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")

    p = F.col(point_col).cast("long")
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")

    pts = points.withColumn("_bucket", F.floor(p / bucket_width))
    # A half-open [s, e) interval overlaps buckets floor(s/w) ..
    # floor((e-1)/w); empty intervals (e <= s) cover nothing and are
    # dropped by the sequence guard.
    ivs = intervals.withColumn(
        "_bucket",
        F.explode(
            F.when(
                e > s,
                F.sequence(F.floor(s / bucket_width),
                           F.floor((e - 1) / bucket_width)),
            ).otherwise(F.array().cast("array<bigint>"))
        ),
    )

    cond = [
        pts["_bucket"] == ivs["_bucket"],
        p >= ivs[start_col].cast("long"),
        p < ivs[end_col].cast("long"),
    ]
    joined = pts.join(ivs, cond, how)
    return joined.select(
        *[pts[c] for c in points.columns],
        *[ivs[c] for c in intervals.columns],
    )
