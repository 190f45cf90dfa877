"""Oracle parity for the operators BANKED for r5 (not yet in
`queries()` — the r4 gate head is full). Proving their DuckDB twins
here means r5's registration is a copy-paste of already-verified SQL.
Same canonicalization as tests/test_oracle_parity.py."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from awskinesisconsumer_spark.io import load_table

SF = "/root/testdata/sf0.001"


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6f}"
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s[:-6] if s.endswith("+00:00") else s
    return str(v)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "events", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


def _compare(sdf, duck, sql):
    cols = sorted(sdf.columns)
    srows = sorted(tuple(_canon(r[c]) for c in cols) for r in sdf.collect())
    tbl = duck.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(
        tuple(_canon(r[c]) for c in sorted(tbl.column_names))
        for r in tbl.to_pylist()
    )
    assert srows == drows, (srows[:3], drows[:3])


def test_dedup_incremental_oracle(spark, duck):
    from awskinesisconsumer_spark.operators.dedup import dedup_incremental

    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    new = docs.where(F.col("doc_id") % 3 == 0)
    corpus = docs.where(F.col("doc_id") % 3 != 0)
    out = dedup_incremental(
        new, corpus, id_col="doc_id", text_col="text", min_overlap=5
    )
    _compare(out, duck, r"""
        WITH newb AS (SELECT doc_id, text FROM documents
                      WHERE doc_id % 3 = 0),
        corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
        dg AS (SELECT DISTINCT sha256(trim(lower(coalesce(text, ''))))
                 AS d FROM corp),
        ng AS (
          SELECT DISTINCT doc_id,
                 ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS s
          FROM (SELECT doc_id,
                  string_split_regex(trim(lower(text)), '\s+') AS ws
                FROM newb WHERE length(trim(coalesce(text, ''))) > 0),
               (SELECT UNNEST(generate_series(1, 200)) AS i)
          WHERE i <= len(ws) - 2 AND ws[i] <> ''),
        cg AS (
          SELECT DISTINCT doc_id,
                 ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS s
          FROM (SELECT doc_id,
                  string_split_regex(trim(lower(text)), '\s+') AS ws
                FROM corp WHERE length(trim(coalesce(text, ''))) > 0),
               (SELECT UNNEST(generate_series(1, 200)) AS i)
          WHERE i <= len(ws) - 2 AND ws[i] <> ''),
        hot AS (SELECT s FROM cg GROUP BY s HAVING COUNT(*) > 100),
        capped AS (SELECT doc_id, s FROM cg
                   WHERE s NOT IN (SELECT s FROM hot)),
        ov AS (
          SELECT n.doc_id, MAX(cnt) AS max_overlap
          FROM (SELECT ng.doc_id AS doc_id, capped.doc_id AS cid,
                       COUNT(*) AS cnt
                FROM ng JOIN capped ON ng.s = capped.s
                GROUP BY 1, 2) sub
          JOIN newb n ON n.doc_id = sub.doc_id
          GROUP BY 1)
        SELECT n.doc_id, n.text,
          (sha256(trim(lower(coalesce(n.text, '')))) IN
             (SELECT d FROM dg)) AS exact_dup,
          CAST(COALESCE(ov.max_overlap, 0) AS BIGINT) AS max_overlap,
          COALESCE(ov.max_overlap, 0) >= 5 AS near_dup
        FROM newb n LEFT JOIN ov ON ov.doc_id = n.doc_id
    """)


def test_winsorize_oracle(spark, duck):
    from awskinesisconsumer_spark.operators.sketches import winsorize

    orders = load_table(spark, "orders", SF).select(
        "o_orderkey", "o_totalprice"
    )
    out = winsorize(
        orders, value_col="o_totalprice", lo=0.0, hi=600000.0,
        n_bins=200, p_low=0.01, p_high=0.99,
    )
    _compare(out, duck, """
        WITH b AS (
          SELECT LEAST(GREATEST(
                   CAST(FLOOR(o_totalprice / 3000.0) AS INT), 0), 199)
                 AS bin
          FROM orders WHERE o_totalprice IS NOT NULL),
        c AS (SELECT bin, COUNT(*) AS c FROM b GROUP BY 1),
        cum AS (SELECT bin, c, SUM(c) OVER (ORDER BY bin) AS cum,
                       SUM(c) OVER () AS total FROM c),
        q AS (SELECT UNNEST(CAST([0.01, 0.99] AS DOUBLE[])) AS q),
        cuts AS (
          SELECT q.q,
            MIN_BY(ROUND(0.0 + (bin
              + (CEIL(q.q * total) - (cum - c)) / CAST(c AS DOUBLE))
              * 3000.0, 4), bin) AS est
          FROM cum CROSS JOIN q
          WHERE cum >= CEIL(q.q * total)
          GROUP BY q.q),
        lohi AS (
          SELECT MIN(CASE WHEN q = 0.01 THEN est END) AS lo_cut,
                 MIN(CASE WHEN q = 0.99 THEN est END) AS hi_cut
          FROM cuts)
        SELECT o_orderkey, o_totalprice,
               LEAST(GREATEST(o_totalprice, lo_cut), hi_cut)
                 AS winsorized,
               o_totalprice <> LEAST(GREATEST(o_totalprice, lo_cut),
                                     hi_cut) AS clipped
        FROM orders CROSS JOIN lohi
    """)


def test_scd2_as_of_oracle(spark, duck):
    from awskinesisconsumer_spark.operators.compaction import (
        scd2_as_of, scd2_versions,
    )

    ev = load_table(spark, "events", SF).select(
        "user_id", "ts", "event_id", "event_type"
    )
    dim = scd2_versions(
        ev, key_col="user_id", ts_col="ts", order_col="event_id",
        state_col="event_type",
    )
    mid = ev.agg(F.max("ts")).first()[0]
    out = scd2_as_of(dim, at=mid)
    _compare(out, duck, """
        WITH c AS (
          SELECT user_id, ts, event_id, event_type,
            LAG(event_type) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events),
        ch AS (SELECT user_id, ts, event_id, event_type FROM c
               WHERE prev IS NULL OR prev <> event_type),
        v AS (
          SELECT user_id, ts, event_id, event_type,
            ts AS effective_from,
            LEAD(ts) OVER
              (PARTITION BY user_id ORDER BY ts, event_id)
              AS effective_to
          FROM ch),
        t AS (SELECT MAX(ts) AS at FROM events)
        SELECT user_id, ts, event_id, event_type,
               effective_from, effective_to,
               effective_to IS NULL AS is_current
        FROM v CROSS JOIN t
        WHERE effective_from <= at
          AND (effective_to IS NULL OR effective_to > at)
    """)
