"""Monotonic id assignment (SURVEY §2 row 13, `id-assign-monotonic`).

Reference semantics (/root/reference/parser.py:162,440): a per-frame
counter incremented in decode order.

Spark-first: two tiers —
* exact dense sequence: row_number over an ordered window (requires a
  partition key at scale; the global variant is only for bounded
  results like the retained top-K set);
* uniqueness + per-partition monotonicity only:
  `monotonically_increasing_id()` — zero shuffle, the right default at
  100 TB when downstream only needs a stable unique id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_monotonic_id(
    df: DataFrame,
    *,
    order: str,
    key: str | None = None,
    id_col: str = "row_id",
    exact: bool = True,
) -> DataFrame:
    if not exact:
        return df.withColumn(id_col, F.monotonically_increasing_id())
    w = (Window.partitionBy(key) if key else Window.partitionBy()).orderBy(order)
    return df.withColumn(id_col, F.row_number().over(w).cast("bigint"))
