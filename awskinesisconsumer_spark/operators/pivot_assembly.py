"""Stateful KV → wide-row assembly (SURVEY §2 row 8, `pivot-tag-assembly`).

Reference semantics (/root/reference/parser.py:349-360): TagName /
TagString element pairs are setattr'd onto the in-flight Tags record —
a running pivot of key-value rows into one wide row per fragment.

Spark-first: `groupBy(...).pivot(values).agg(first(...))` when the key
set is known (it is — the reference's Tags class is a fixed 6-field
schema, parser.py:30-37), else `map_from_entries(collect_list(...))`.
Supplying the pivot values up front matters at scale: without them
Spark runs an extra distinct-collect job over 100 TB just to learn the
column set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_event_counts(
    df: DataFrame,
    *,
    key: str,
    pivot_col: str,
    values: list[str],
    value_expr: str,
) -> DataFrame:
    """Wide row per key: one column per known pivot value. Map-side
    partial aggregation makes this a single shuffle on `key`."""
    agg = df.groupBy(key).pivot(pivot_col, values).agg(
        F.round(F.sum(value_expr), 2)
    )
    # Pivot null-fills absent combos; make that explicit + typed.
    out = agg
    for v in values:
        out = out.withColumn(v, F.coalesce(F.col(v), F.lit(0.0)))
    return out


def assemble_kv_map(
    df: DataFrame,
    *,
    key: str,
    k_col: str,
    v_col: str,
    map_col: str = "tags",
    order_col: str | None = None,
) -> DataFrame:
    """The map-typed variant: collapse KV rows into one map per key,
    the direct analogue of the Tags record when the key set is
    open-ended. Duplicate map keys are resolved BEFORE map construction
    (`map_from_entries` on raw pairs throws DUPLICATED_MAP_KEY under
    Spark's default policy): pass `order_col` for the reference's
    last-wins semantics (max order per key wins, parser.py:349-360);
    without an ordering the fallback is deterministic min(value)."""
    if order_col is not None:
        winner = F.max_by(F.col(v_col), F.col(order_col)).alias("_v")
    else:
        winner = F.min(v_col).alias("_v")
    deduped = df.groupBy(key, k_col).agg(winner)
    return deduped.groupBy(key).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col(k_col), F.col("_v"))))
        ).alias(map_col)
    )
