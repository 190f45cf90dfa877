from __future__ import annotations

import pytest

from awskinesisconsumer_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # 8 shuffle/state partitions: stateful streaming runs one task per
    # state partition per micro-batch — 32 is pure overhead at test SF.
    s = get_spark(
        "awskinesisconsumer-tests",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(params=["hdfs", "rocksdb"])
def state_store(spark, request):
    """Run a stateful-streaming test under both state-store providers.

    At 100 TB of state the heap-bound HDFS-backed store is the first
    thing swapped for RocksDB (spill-to-SSD, changelog checkpointing)
    — streaming/lifecycle.py use_rocksdb_state_store. Each test
    creates fresh checkpoints, so switching the session-level
    provider between runs never mixes providers within one
    checkpoint lineage.
    """
    keys = (
        "spark.sql.streaming.stateStore.providerClass",
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled",
    )
    old = {k: spark.conf.get(k, None) for k in keys}
    if request.param == "rocksdb":
        from awskinesisconsumer_spark.streaming.lifecycle import (
            use_rocksdb_state_store,
        )

        use_rocksdb_state_store(spark)
    yield request.param
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
