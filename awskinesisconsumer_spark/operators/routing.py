"""Error-record routing (SURVEY §2 row 10, `error-route`).

Reference semantics (/root/reference/parser.py:357-360): records whose
tag name marks an error (AWS_KINESISVIDEO_ERROR_CODE / _ERROR_ID) are
diverted off the data path into the error channel.

Spark-first: a predicate split. Both halves share one scan when used
under the same action (or via persist in the streaming foreachBatch
fan-out); the filter itself pushes down to parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def route_errors(df: DataFrame, is_error: Column) -> tuple[DataFrame, DataFrame]:
    """(data, errors) split — the dead-letter pattern."""
    return df.where(~is_error), df.where(is_error)
