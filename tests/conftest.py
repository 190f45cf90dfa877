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
