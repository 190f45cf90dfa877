"""Round-17 (optimization round 2) focused tests: the r16-ADVICE
memory-safety gate on the semantic-dedup auto kernel, the
duplicate-id parity fix in the numpy cell-pair kernel, and the
fan_out_small env-parse hardening."""

import os

import pytest
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# _resolve_vectorized: auto must be memory-safe (r16 ADVICE, medium)
# ---------------------------------------------------------------------------


def _base(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    return emb.select(
        F.col("vec_id"), (F.col("vec_id") % 4).alias("cell"),
        F.col("embedding"),
    )


def test_auto_kernel_requires_bounded_memory_regime(spark, monkeypatch):
    from awskinesisconsumer_spark.operators.similarity import (
        _resolve_vectorized,
    )

    base = _base(spark)
    # small sized input, LongType ids -> kernel
    assert _resolve_vectorized(base, "vec_id", None) is True
    # cell_cap set -> kernel regardless of size (the documented
    # enforcement: no task sees more than cell_cap rows)
    assert _resolve_vectorized(base, "vec_id", None, 64) is True
    # the size gate refuses when the input is "too big to prove the
    # one-task-per-cell regime safe" (simulated via the env knob)
    monkeypatch.setenv("SPARK_GRAFT_SEMDEDUP_AUTO_BYTES", "1")
    assert _resolve_vectorized(base, "vec_id", None) is False
    # ... but cell_cap still opts in
    assert _resolve_vectorized(base, "vec_id", None, 64) is True
    # malformed env must fall back, not raise at plan-build time
    monkeypatch.setenv("SPARK_GRAFT_SEMDEDUP_AUTO_BYTES", "not-a-number")
    assert _resolve_vectorized(base, "vec_id", None) is True
    # explicit force always wins
    assert _resolve_vectorized(base, "vec_id", True) is True
    assert _resolve_vectorized(base, "vec_id", False, 64) is False
    # non-long ids never take the kernel (it emits BIGINT ids)
    sbase = base.withColumn("vec_id", F.col("vec_id").cast("string"))
    assert _resolve_vectorized(sbase, "vec_id", None, 64) is False


def test_auto_kernel_gate_entries_still_take_kernel(spark):
    # the bench/gate semantic entries rely on auto -> kernel at gate
    # SFs; the safety gate must not flip them (input ~200 KB << 4 MiB)
    from awskinesisconsumer_spark.operators.similarity import (
        _resolve_vectorized,
    )

    assert _resolve_vectorized(_base(spark), "vec_id", None) is True


# ---------------------------------------------------------------------------
# duplicate-id parity in the numpy kernel (r16 ADVICE, low)
# ---------------------------------------------------------------------------


def test_cell_pairs_duplicate_ids_match_hof(spark):
    # a duplicated id inside a cell must not emit id_a == id_b
    # self-pairs on the kernel path (the HOF path's id_a < id_b
    # filter excludes them); both paths must agree row-for-row
    from awskinesisconsumer_spark.operators.similarity import (
        _cell_pairs,
    )

    rows = [
        (1, 0, [1.0, 0.0]), (1, 0, [1.0, 0.0]),  # duplicate id 1
        (2, 0, [1.0, 0.1]), (3, 0, [-1.0, 0.0]),
        (4, 1, [0.5, 0.5]), (5, 1, [0.5, 0.49]),
    ]
    base = spark.createDataFrame(
        rows, "vec_id long, cell int, embedding array<double>")
    kw = dict(id_col="vec_id", vec_col="embedding", threshold=0.9,
              cell_cap=None, caller="t")
    vec = sorted(tuple(r) for r in _cell_pairs(
        base, vectorized=True, **kw).collect())
    hof = sorted(tuple(r) for r in _cell_pairs(
        base, vectorized=False, **kw).collect())
    assert vec == hof
    assert all(a < b for a, b in vec)  # no self-pairs, ordered


# ---------------------------------------------------------------------------
# fan_out_small env hardening (r16 ADVICE, low)
# ---------------------------------------------------------------------------


def test_fan_out_small_malformed_env_falls_back(spark, monkeypatch):
    from awskinesisconsumer_spark.operators.skew import fan_out_small

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    monkeypatch.setenv("SPARK_GRAFT_FANOUT_TASK_BYTES", "4MiB")
    out = fan_out_small(docs)  # must not raise
    assert out.count() == docs.count()
