"""Loaders for the driver-generated test tables (/root/testdata/sf*).

All reads are plain ``spark.read.parquet`` so Catalyst keeps predicate
pushdown + column pruning (the Spark-native analogue of the reference's
skip-by-size element pruning, /root/reference/ebml.py:309-327).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns written as parquet TIMESTAMP(NANOS) — Spark 4 rejects the
# physical type outright (PARQUET_TYPE_ILLEGAL), so we read them as
# nano-longs (legacy conf) and convert to microsecond timestamps
# ourselves. DuckDB truncates ns->us the same way, so oracles agree.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    path = os.path.join(sf_dir, f"{name}.parquet")
    nano_cols = _NANO_TS_COLS.get(name, ())
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nano_cols:
        if isinstance(df.schema[c].dataType, LongType):
            # integer `div`, not `/`: ns epochs exceed double's exact
            # integer range, so float division is off by ±1 us. Cast to
            # NTZ: parquet wrote naive timestamps, and Spark 4 reads
            # the other tables' (us/ms) timestamps as timestamp_ntz —
            # this keeps events.ts consistent with them and with the
            # DuckDB oracle's naive values.
            df = df.withColumn(
                c,
                F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz"),
            )
    return df


def load_all(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every test table as a temp view for spark.sql use."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
