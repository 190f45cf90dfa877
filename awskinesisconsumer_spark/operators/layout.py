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

    Hive-partitioned layouts (every data file under `key=value`
    subdirectories) are compacted per-partition: the rewrite
    repartitions ON the discovered partition columns and writes with
    `partitionBy`, so directory structure, partition pruning, and
    directory-inferred partition-column types are all preserved (one
    compacted file per partition in the common case). A layout that
    mixes root-level files with subdirectories, or whose
    subdirectories are not `key=value`, is NOT a valid single dataset
    — the call is a safe no-op (`"compacted": False`).

    The swap is two renames (original aside to `._compact_old`, then
    temp into place), each atomic on a rename-atomic filesystem —
    but BETWEEN them there is a brief window where `path` does not
    exist: a concurrent reader can see file-not-found (never a
    partial or mixed directory), and a crash inside the window
    leaves the data only in `._compact_old`. Both are handled: rerun
    this function (or any caller) and the leading recovery step
    restores `._compact_old` to `path` before doing anything else.
    For truly concurrent readers, pair with the manifest writer —
    on object stores renames are copies anyway, so the manifest
    sink is the right commit protocol there. Row content is
    preserved exactly (one read -> repartition(n) -> write: no
    shuffle beyond the single repartition exchange, no column
    rewrite).

    Returns {"n_files_before", "n_files_after", "bytes_total",
    "compacted": bool} for the maintenance-job log.
    """
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(hconf)
    old = jvm.org.apache.hadoop.fs.Path(path + "._compact_old")

    # Crash recovery: a previous run that died between the two swap
    # renames left the live data only in ._compact_old — restore it
    # before doing anything else.
    if fs.exists(old) and not fs.exists(hpath):
        if not fs.rename(old, hpath):
            raise IOError(
                f"compact_small_files: cannot recover {path} from "
                f"{old.toString()}"
            )

    def data_files(p, rel=()):
        out = []
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if st.isDirectory():
                out.extend(data_files(st.getPath(), rel + (name,)))
            elif not name.startswith(("_", ".")):
                out.append((st, rel))
        return out

    files = data_files(hpath)
    total = sum(st.getLen() for st, _rel in files)
    n_before = len(files)
    n_target = max(1, -(-total // target_bytes))
    if n_before < min_files or n_target >= n_before:
        return {"n_files_before": n_before, "n_files_after": n_before,
                "bytes_total": total, "compacted": False}

    # Hive-partition detection: either EVERY data file sits under a
    # chain of key=value directories (same key sequence at every
    # depth), or every file sits at the root. Anything else is not
    # one dataset — refuse rather than flatten it.
    depths = {len(rel) for _st, rel in files}
    part_cols: list[str] = []
    if depths != {0}:
        key_seqs = set()
        valid = len(depths) == 1
        if valid:
            for _st, rel in files:
                keys = tuple(
                    seg.split("=", 1)[0] if "=" in seg else None
                    for seg in rel
                )
                key_seqs.add(keys)
            valid = (
                len(key_seqs) == 1 and None not in next(iter(key_seqs))
            )
        if not valid:
            return {"n_files_before": n_before, "n_files_after": n_before,
                    "bytes_total": total, "compacted": False}
        part_cols = list(next(iter(key_seqs)))

    tmp = jvm.org.apache.hadoop.fs.Path(path + "._compact_tmp")
    fs.delete(tmp, True)
    fs.delete(old, True)
    # Disable partition-column TYPE INFERENCE for the rewrite: the
    # round-trip (read inferred -> partitionBy write) would otherwise
    # re-render directory spellings (key=00123 -> key=123, date
    # strings re-formatted) and silently change the layout for
    # downstream readers. As plain strings the values rename
    # byte-identically.
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    infer_prev = spark.conf.get(infer_key, "true")
    try:
        spark.conf.set(infer_key, "false")
        src = spark.read.parquet(path)
        if part_cols:
            # Repartition ON the partition columns so each hive
            # partition lands in one task -> one compacted file per
            # partition, and write with partitionBy to keep layout +
            # pruning intact.
            writer = (src.repartition(int(n_target), *part_cols)
                      .write.mode("overwrite").partitionBy(*part_cols))
        else:
            writer = (src.repartition(int(n_target))
                      .write.mode("overwrite"))
        writer.parquet(str(tmp.toString()))
    finally:
        spark.conf.set(infer_key, infer_prev)
    if not fs.rename(hpath, old):
        raise IOError(f"compact_small_files: cannot move {path} aside")
    if not fs.rename(tmp, hpath):
        fs.rename(old, hpath)  # roll back
        raise IOError(f"compact_small_files: cannot install compacted {path}")
    fs.delete(old, True)
    n_after = len(data_files(hpath))
    return {"n_files_before": n_before, "n_files_after": n_after,
            "bytes_total": total, "compacted": True}
