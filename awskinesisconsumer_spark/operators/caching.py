"""Deterministic cache lifecycle for operators that persist an
intermediate feeding multiple branches of their own plan.

The contract: an operator may persist internal DataFrames freely, but
must release every one of them before returning, leaving at most its
RESULT cached (which the caller owns and may unpersist). Without this,
repeated calls accumulate orphaned cache blocks for the session — the
caller has no handle to the internal DataFrame, so nothing can ever
free it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_after(out: DataFrame, cached: DataFrame) -> DataFrame:
    """Persist+materialize the (small) result, then release the big
    cached intermediate. persist (not localCheckpoint) keeps lineage,
    so executor loss recomputes instead of failing; the result stays
    cached for the caller, who may unpersist it when done."""
    out = out.persist()
    out.count()
    cached.unpersist()
    return out
