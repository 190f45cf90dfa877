"""Local replica of the driver's correctness gate: run every
`queries()` entry on Spark AND its `oracle_sql()` twin on DuckDB at a
small SF, compare row-count + order-insensitive values (columns sorted
by name, rows sorted, floats canonicalized) — so CORRECTNESS_r{N}.json
holds no surprises.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style canonicalization: fixed-point string
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):  # datetime/date
        s = v.isoformat()
        return s[:-6] if s.endswith("+00:00") else s
    return str(v)


def _rowset(rows):
    return sorted(tuple(_canon(v) for v in row) for row in rows)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def duck():
    con = _duck(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    assert name in QUERIES, f"oracle {name} has no queries() entry"
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sorted(sdf.columns)
    srows = [
        tuple(row[c] for c in spark_cols) for row in sdf.collect()
    ]
    ddf = duck.execute(ORACLES[name]).fetch_arrow_table()
    duck_cols = sorted(ddf.column_names)
    assert spark_cols == duck_cols, (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    drows = [
        tuple(r[c] for c in duck_cols)
        for r in ddf.to_pylist()
    ]
    assert len(srows) == len(drows), (
        f"{name}: rowcount spark={len(srows)} duck={len(drows)}"
    )
    s_sorted, d_sorted = _rowset(srows), _rowset(drows)
    mism = [
        (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
    ][:5]
    assert s_sorted == d_sorted, f"{name}: value mismatch, first diffs: {mism}"


def test_rows_only_queries_run(spark):
    """Queries without oracles must still execute and return a stable schema."""
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        n = df.count()
        assert n >= 0, name
        assert df.columns, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns


def test_gate_rotation_invariant():
    """Every queries() entry past the external gate's 50-entry window
    must already be hash-green in the most recent CORRECTNESS_r*.json
    — the rotation contract documented in README. A new/changed query
    accidentally ordered past position 50 fails here instead of
    silently shipping ungated."""
    import glob
    import json
    import re

    import __spark_entry__ as m

    snaps = sorted(
        glob.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    )
    assert snaps, "no correctness snapshot found"
    latest = json.load(open(snaps[-1]))
    past_horizon = list(m.queries())[50:]
    ungated = [
        q for q in past_horizon
        if q not in latest or not latest[q].get("hash_match")
    ]
    assert not ungated, (
        f"entries past the 50-query gate window lack a green external "
        f"record in {snaps[-1]}: {ungated} — reorder queries() so they "
        f"sit inside the window"
    )
