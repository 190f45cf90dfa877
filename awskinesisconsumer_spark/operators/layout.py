"""Lake-layout operators: z-order (Morton) clustering for
multi-dimensional data skipping.

The reference writes its frame sink in arrival order
(`/root/reference/parser.py:483-485`) — fine for a bounded queue,
useless for selective scans over 100 TB. Modern lakehouse engines
cluster files by a space-filling curve over the hot filter columns so
min/max footer stats prune files for predicates on ANY of the curve's
dimensions (Delta/Iceberg `OPTIMIZE ZORDER BY`). This module computes
the curve key with plain integer column arithmetic — deterministic,
engine-portable, whole-stage-codegen'd — so `df.repartitionByRange/
sortWithinPartitions(zvalue)` before a parquet write yields the
clustered layout.

Scale shape: the z-value is a map-only projection (2*bits AND/shift
terms folded into one expression); the only wide operation a writer
adds is the range partition by zvalue — exactly one shuffle, same as
any sorted write. File-stat audit is an n_files-row aggregate.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(x: Column, y: Column, *, bits: int = 16) -> Column:
    """Interleave the low `bits` bits of two non-negative ints into a
    Morton z-value (x in even positions, y in odd). 2*bits <= 62 keeps
    everything in signed-int64 territory."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in 1..31")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x.cast("long"), i)
                                 .bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y.cast("long"), i)
                                 .bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_sql(x: str, y: str, *, bits: int = 16) -> str:
    """The identical z-value as an ANSI SQL expression string (same
    bit math the Column form folds), for cross-engine replay."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_file_stats(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_files: int = 64,
) -> DataFrame:
    """Assign every row to one of `n_files` z-ordered output files
    (file_id = top log2(n_files) bits of the z-value) and return the
    per-file min/max footer stats for BOTH dimensions — the audit a
    writer runs to verify the layout actually skips: with z-order,
    every file covers a narrow range of x AND of y, so a predicate on
    either column prunes ~sqrt-proportionally many files (vs. a
    single-column sort, which prunes only its own column).
    """
    if n_files & (n_files - 1) or n_files <= 0:
        raise ValueError("n_files must be a power of two")
    shift = 2 * bits - n_files.bit_length() + 1
    z = zorder_value(F.col(x_col), F.col(y_col), bits=bits)
    return (
        df.select(
            F.col(x_col), F.col(y_col),
            F.shiftright(z, shift).alias("file_id"),
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(x_col).alias("min_x"),
            F.max(x_col).alias("max_x"),
            F.min(y_col).alias("min_y"),
            F.max(y_col).alias("max_y"),
        )
    )
