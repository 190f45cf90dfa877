"""Point / latest-row queries (SURVEY §2 rows 18-19, `query-point-lookup`,
`query-last-row`).

Reference semantics: thread-safe list index with bounds check →
row-or-None (/root/reference/parser.py:489-512).

Spark-first: a filter (pushed to the parquet scan — min/max row-group
stats prune everything else) and a max_by aggregation. `GetLastFrame`
deliberately avoids orderBy+limit: `max_by` is a full map-side-combined
aggregation, one pass, no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_lookup(df: DataFrame, *, id_col: str, id_value: int) -> DataFrame:
    """Row-or-empty by id — empty DataFrame ⇔ the reference's None."""
    return df.where(F.col(id_col) == F.lit(id_value))


def last_row(df: DataFrame, *, order: str) -> DataFrame:
    """The max-`order` row, via a single max_by aggregation."""
    row = F.max_by(F.struct(*df.columns), F.col(order)).alias("_row")
    return df.agg(row).select("_row.*")
