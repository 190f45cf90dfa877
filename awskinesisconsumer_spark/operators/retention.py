"""Bounded retention / top-K by recency (SURVEY §2 row 15,
`enqueue-bounded-retention`).

Reference semantics (/root/reference/parser.py:470-481): the Frames
queue keeps at most K rows; older rows are evicted (and their sink
files deleted — multi-sink retention, handled by the streaming layer).

Spark-first: top-K per key via window rank. For the global-K case at
scale prefer `orderBy(desc).limit(K)` — Spark plans that as
TakeOrderedAndProject (per-partition top-K then a K-row merge at the
driver), never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_by_recency(
    df: DataFrame,
    *,
    order: str,
    k: int,
    key: str | None = None,
) -> DataFrame:
    """Newest k rows per key (or globally when key is None)."""
    if key is None:
        # TakeOrderedAndProject: O(k) per partition + O(k·P) merge.
        return df.orderBy(F.col(order).desc()).limit(k)
    w = Window.partitionBy(key).orderBy(F.col(order).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
