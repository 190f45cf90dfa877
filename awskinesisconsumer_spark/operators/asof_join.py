"""As-of joins (SURVEY §2 row 12, `join-asof-tags`).

Reference semantics (/root/reference/parser.py:421-432): for each
packet at byte offset ``packet.pos``, find the FIRST tags row whose
``position > packet.pos`` (fragment boundaries carry the metadata for
everything before them), then evict consumed state. That is a
forward-looking as-of join on a monotone key.

Scale design — two strategies, both shuffle-once:

* ``asof_join_next_boundary`` — the **union-window** strategy. When the
  "tags" rows live in the same keyed stream as the packets (as in the
  reference: boundaries are interleaved with data), DON'T join at all:
  union is free, and one window pass ordered DESC computes, for every
  row, the minimum boundary position at-or-after it (a running min over
  the reversed order). One shuffle on the partition key, no join state,
  no skew risk beyond the key distribution itself. At 100 TB this beats
  any join-based plan: the alternative range join is O(n·m) per key.

* ``asof_join_backward`` — the general two-table form for independent
  left/right inputs, expressed as union-window over the merged key
  space (the classic "merge-asof" trick: tag each side, sort within
  key, carry the last right value forward). Still a single shuffle;
  never a cartesian range join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_next_boundary(
    df: DataFrame,
    *,
    key: str,
    order: str,
    is_boundary: Column,
    boundary_cols: list[str],
    prefix: str = "tag_",
) -> DataFrame:
    """Attach, to every non-boundary row, the columns of the next
    boundary row (smallest ``order`` strictly greater) within ``key``.

    Rows with no following boundary get nulls — the reference raises
    'No tag for packet!' (/root/reference/parser.py:429); we keep them
    null so callers can route them to the error channel instead
    (late-data-as-error becomes late-data-routed, SURVEY §7 step 4).
    """
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(order).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # Running min over the reversed order == first boundary strictly after.
    struct_cols = F.when(is_boundary, F.struct(order, *boundary_cols))
    joined = df.withColumn("_next_boundary", F.min(struct_cols).over(w))
    out = joined.where(~is_boundary)
    for c in boundary_cols:
        out = out.withColumn(f"{prefix}{c}", F.col(f"_next_boundary.{c}"))
    return out.withColumn(f"{prefix}{order}", F.col(f"_next_boundary.{order}")).drop(
        "_next_boundary"
    )


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_on: str,
    right_on: str,
    right_cols: list[str] | None = None,
    allow_exact: bool = True,
) -> DataFrame:
    """Backward as-of join: for each left row, attach the right row with
    the greatest ``right_on`` <= ``left_on`` (or < if not allow_exact)
    within the same ``key``.

    Implemented as union + one window pass (merge-asof): a single
    shuffle on ``key``, no range-join explosion. Right columns come
    back nullable (no prior right row -> null).
    """
    right_cols = right_cols or [c for c in right.columns if c not in (key, right_on)]
    clash = set(left.columns) & ({right_on, *right_cols})
    if clash:
        raise ValueError(
            f"asof_join_backward: right columns {sorted(clash)} collide with "
            "left columns — rename one side before joining (the merge-asof "
            "union would silently overwrite them otherwise)"
        )
    l = left.withColumn("_side", F.lit(1)).withColumn("_t", F.col(left_on))
    r = right.withColumn("_side", F.lit(0)).withColumn("_t", F.col(right_on))
    merged = l.unionByName(r, allowMissingColumns=True)
    # Order so that at ties the right row sorts first iff exact matches count.
    tie = F.col("_side").asc() if allow_exact else F.col("_side").desc()
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t").asc(), tie)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.withColumn(
        "_last_right",
        F.last(
            F.when(F.col("_side") == 0, F.struct(right_on, *right_cols)),
            ignorenulls=True,
        ).over(w),
    )
    out = carried.where(F.col("_side") == 1)
    for c in [right_on, *right_cols]:
        out = out.withColumn(c, F.col(f"_last_right.{c}"))
    return out.drop("_side", "_t", "_last_right")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_on: str,
    right_on: str,
    right_cols: list[str] | None = None,
    right_order: str | None = None,
) -> DataFrame:
    """Nearest as-of join: for each left row, the right row minimizing
    ``|right_on - left_on|`` within the key (ties -> the earlier/
    backward side). Completes the direction family (forward:
    asof_join_next_boundary, backward: asof_join_backward).

    Same merge-asof shape: union + ONE key-partitioned sort carrying
    BOTH the last-before and first-after right rows as two frames over
    the same window spec — still a single exchange, no range join. At
    equal timestamps the right row sorts before the left row, so an
    exact match is captured by (and only by) the backward carry.

    ``right_order``: a right-side column appended to the window
    ordering so the carry is a TOTAL order even when several right
    rows share one (key, timestamp) — without it the carried payload
    among such ties follows physical row order (non-deterministic
    under retries / partition changes). Among equal-timestamp right
    rows the backward carry takes the highest ``right_order`` value,
    the forward carry the lowest.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (key, right_on)
    ]
    clash = set(left.columns) & ({right_on, *right_cols})
    if clash:
        raise ValueError(
            f"asof_join_nearest: right columns {sorted(clash)} collide "
            "with left columns — rename one side first"
        )
    l = left.withColumn("_side", F.lit(1)).withColumn("_t", F.col(left_on))
    r = right.withColumn("_side", F.lit(0)).withColumn("_t", F.col(right_on))
    merged = l.unionByName(r, allowMissingColumns=True)
    payload = F.when(
        F.col("_side") == 0, F.struct(right_on, *right_cols)
    )
    order = [F.col("_t").asc(), F.col("_side").asc()]
    if right_order is not None:
        # Right-only column: NULL on the left rows after the union,
        # which is harmless — ordering inside a (_t, _side=left) tie
        # group never selects a carry.
        order.append(F.col(right_order).asc())
    base = Window.partitionBy(key).orderBy(*order)
    prev = F.last(payload, ignorenulls=True).over(
        base.rowsBetween(Window.unboundedPreceding, 0)
    )
    nxt = F.first(payload, ignorenulls=True).over(
        base.rowsBetween(0, Window.unboundedFollowing)
    )
    carried = (
        merged.withColumn("_prev", prev).withColumn("_next", nxt)
        .where(F.col("_side") == 1)
    )
    # Distance in exact integer MICROSECONDS: fractional-second
    # truncation would make the pick rule engine-dependent. The
    # intermediate timestamp cast handles ntz inputs (session tz is
    # UTC, so it is value-preserving).
    def _us(c):
        return F.unix_micros(c.cast("timestamp"))

    d_prev = _us(F.col("_t")) - _us(F.col(f"_prev.{right_on}"))
    d_next = _us(F.col(f"_next.{right_on}")) - _us(F.col("_t"))
    pick_prev = F.col("_next").isNull() | (
        F.col("_prev").isNotNull() & (d_prev <= d_next)
    )
    chosen = F.when(pick_prev, F.col("_prev")).otherwise(F.col("_next"))
    out = carried.withColumn("_chosen", chosen)
    for c in [right_on, *right_cols]:
        out = out.withColumn(c, F.col(f"_chosen.{c}"))
    return out.drop("_side", "_t", "_prev", "_next", "_chosen")
