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


def compact_small_files(
    spark,
    path: str,
    *,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict:
    """Small-file compaction — the lake-maintenance OPTIMIZE pass:
    streaming sinks and fine-grained partitioned writes leave
    directories full of KB-scale parquet files whose per-file open/
    footer cost dominates scans at 100 TB. Rewrites the dataset into
    ceil(total_bytes / target_bytes) files when the directory holds at
    least `min_files` data files; otherwise a no-op.

    The rewrite is atomic-by-rename at directory granularity: the
    compacted copy lands in a sibling temp dir, the original moves
    aside, the new one renames into place, the old tree deletes last
    — a reader mid-swap sees the old or the new complete directory on
    any rename-atomic filesystem (the same guarantee class the
    manifest sink provides at file level; on object stores, pair with
    the manifest writer instead of relying on renames). Row content
    is preserved exactly (one read -> repartition(n) -> write: no
    shuffle beyond the single repartition exchange, no column
    rewrite).

    Returns {"n_files_before", "n_files_after", "bytes_total",
    "compacted": bool} for the maintenance-job log.
    """
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(hconf)

    def data_files(p):
        out = []
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if st.isDirectory():
                out.extend(data_files(st.getPath()))
            elif not name.startswith(("_", ".")):
                out.append(st)
        return out

    files = data_files(hpath)
    total = sum(st.getLen() for st in files)
    n_before = len(files)
    n_target = max(1, -(-total // target_bytes))
    if n_before < min_files or n_target >= n_before:
        return {"n_files_before": n_before, "n_files_after": n_before,
                "bytes_total": total, "compacted": False}

    tmp = jvm.org.apache.hadoop.fs.Path(path + "._compact_tmp")
    old = jvm.org.apache.hadoop.fs.Path(path + "._compact_old")
    fs.delete(tmp, True)
    fs.delete(old, True)
    (spark.read.parquet(path)
     .repartition(int(n_target))
     .write.mode("overwrite").parquet(str(tmp.toString())))
    if not fs.rename(hpath, old):
        raise IOError(f"compact_small_files: cannot move {path} aside")
    if not fs.rename(tmp, hpath):
        fs.rename(old, hpath)  # roll back
        raise IOError(f"compact_small_files: cannot install compacted {path}")
    fs.delete(old, True)
    n_after = len(data_files(hpath))
    return {"n_files_before": n_before, "n_files_after": n_after,
            "bytes_total": total, "compacted": True}
