"""Changelog compaction (CDC upsert/delete resolution).

The reference's bounded frame queue keeps only the newest rows per
stream (parser.py:470-481 evicts oldest). The large-scale analog every
lakehouse ingestion pipeline needs is *keyed* latest-row resolution
over an upsert/delete changelog: given a stream of (key, seq, op,
payload) rows, produce the current table state — the compaction step
behind Delta/Iceberg MERGE and Kafka compacted topics.

Scale shape: ONE hash aggregation on the key (map-side partial
`max_by` combines before the shuffle, so the exchange carries one row
per distinct key per map partition — not one per version). No window,
no sort: `max_by(struct(...), seq)` resolves the winner inside the
aggregate. A window `row_number() = 1` plan would sort every key group
at 100 TB; this one never sorts anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _check_audit_collisions(columns: list[str]) -> None:
    clash = {"last_seq", "n_versions"} & set(columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with the audit "
            "columns compaction appends (last_seq, n_versions) — "
            "rename them before compacting"
        )


def compact_latest(
    df: DataFrame,
    *,
    key_cols: list[str],
    seq_col: str,
    op_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """Resolve a changelog to its latest state per key.

    For every distinct `key_cols` group, keep the payload of the row
    with the highest `seq_col` (ties are caller's responsibility —
    pass a unique sequence). If `op_col` is given, keys whose winning
    row carries `op_col == delete_op` are dropped (tombstone
    semantics). Adds `n_versions` (changelog depth per key) and
    `last_seq` for audit; raises if the payload already carries either
    name (the winner-struct expansion would otherwise emit duplicate
    column names that break any downstream select).
    """
    _check_audit_collisions(df.columns)
    payload_cols = [
        c for c in df.columns if c not in set(key_cols) | {seq_col}
    ]
    winner = F.max_by(
        F.struct(*[F.col(c) for c in payload_cols]), F.col(seq_col)
    ).alias("_w")
    out = df.groupBy(*key_cols).agg(
        winner,
        F.max(seq_col).alias("last_seq"),
        F.count(F.lit(1)).alias("n_versions"),
    )
    out = out.select(
        *key_cols,
        *[F.col(f"_w.{c}").alias(c) for c in payload_cols],
        "last_seq",
        "n_versions",
    )
    if op_col is not None:
        # NULL op is "no marker", i.e. an upsert — a bare `!=` filter
        # would silently drop NULL-op winners (NULL comparison).
        out = out.where(
            (F.col(op_col) != delete_op) | F.col(op_col).isNull()
        ).drop(op_col)
    return out


def scd2_versions(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    order_col: str,
    state_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 build from a changelog: keep
    one version row per RUN of equal `state_col` values per key (in
    (ts, order) time), stamped with effective_from / effective_to /
    is_current. Consecutive duplicate states collapse into the run's
    first row; effective_to is the NEXT version's start (NULL while
    current).

    Shape: one key-partitioned window (change-flag via lag, version
    start via lead after the collapse) — a single keyed shuffle, no
    self-join, run-length state bounded by the partition sort. The
    100 TB form of "replay the changelog into a dimension table".
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    changed = df.withColumn(
        "_prev", F.lag(state_col).over(w)
    ).where(
        F.col("_prev").isNull() | (F.col("_prev") != F.col(state_col))
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    return (
        changed.withColumn("effective_from", F.col(ts_col))
        .withColumn("effective_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("effective_to").isNull())
        .drop("_prev")
    )


def scd2_as_of(
    versions: DataFrame,
    *,
    at,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
) -> DataFrame:
    """Point-in-time view of an SCD2 dimension: the version rows
    valid AT the given instant (effective_from <= at < effective_to,
    open versions matching to the end of time). Map-only filter —
    with the dimension partitioned/z-ordered on effective_from the
    scan prunes to the files overlapping `at`.

    Gated as `ext-scd2-asof` (r5): the ext-scd2-versions CTE plus
    the same BETWEEN predicate.
    """
    t = F.lit(at).cast("timestamp")
    return versions.where(
        (F.col(from_col) <= t)
        & (F.col(to_col).isNull() | (F.col(to_col) > t))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    status_col: str = "diff_status",
) -> DataFrame:
    """Diff two snapshots of a keyed table: per key, `added` (new
    only), `removed` (old only), `changed` (both, any compared column
    differs), `unchanged`. The lake-maintenance primitive behind
    incremental publishing, CDC backfill audits, and "what moved
    between yesterday's and today's corpus" reports.

    Each side is reduced to (key, 256-bit sha2 row digest) BEFORE the
    join, so the full-outer join shuffles 32-byte digests instead of
    whole rows — at 100 TB the compare never moves the payload, only
    the keys. NULL-safe: every column serializes with a length prefix
    (length|value, NULL length -1), so ('a', NULL) never collides
    with ('a', '') and adjacent columns cannot bleed into each other.

    Returns key_cols + (old_digest, new_digest, status). Keys must be
    unique per snapshot (the standard snapshot contract; duplicate
    keys make "the row for key K" ill-defined and surface naturally
    as multiplied join rows) and NON-NULL: the full-outer join uses
    plain (non-null-safe) equality — the same semantics as the SQL
    oracle twin — so a NULL key present in both snapshots reports as
    one 'removed' plus one 'added' row rather than being compared.
    """
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in set(key_cols)]
    missing = [c for c in compare_cols if c not in old.columns]
    if missing:
        raise ValueError(
            f"snapshot_diff: compare columns {missing} absent from the "
            "old snapshot — pass compare_cols explicitly under schema "
            "evolution"
        )

    def digest(df: DataFrame):
        parts = []
        for c in compare_cols:
            s = df[c].cast("string")
            parts.append(
                F.concat(
                    F.coalesce(F.length(s), F.lit(-1)).cast("string"),
                    F.lit("|"),
                    F.coalesce(s, F.lit("")),
                )
            )
        return F.sha2(F.concat_ws("", *parts).cast("binary"), 256)

    o = old.select(*key_cols, digest(old).alias("old_digest"))
    n = new.select(*key_cols, digest(new).alias("new_digest"))
    joined = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") == F.col("new_digest"),
              F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.withColumn(status_col, status)
