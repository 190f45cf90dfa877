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
