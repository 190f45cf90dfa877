"""Oracle parity for operators banked ahead of registration.

Part 1: the r4-banked trio registered as gated entries in r5
(ext-dedup-incremental, ext-winsorize, ext-scd2-asof) — kept as fast
unit-level parity at sf0.001; the registered twins are additionally
re-verified at sf0.01 by tests/test_oracle_parity.py.

Part 2: the r5-banked trio, registered as gated entries in r6
(ext-bpe-encode, ext-snapshot-diff, ext-domain-cap) — kept as fast
unit-level parity at sf0.001; proving the DuckDB twins here first
made each round's registration a copy-paste of verified SQL (the
pattern that has worked r4 -> r5 -> r6). The r6-banked streaming
form semantic_decontaminate_stream is covered in
tests/test_round6_ops.py (chunking-invariance vs the batch operator,
whose oracle applies verbatim to the union).

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
    for t in ("documents", "events", "orders", "embeddings"):
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
        -- positions generated per row from len(ws): a fixed series
        -- cap would silently drop grams of documents longer than the
        -- cap (the registered sf0.01 twin uses this same form).
        nw AS (SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\s+') AS ws
               FROM newb WHERE length(trim(coalesce(text, ''))) > 0),
        cw AS (SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\s+') AS ws
               FROM corp WHERE length(trim(coalesce(text, ''))) > 0),
        ng AS (
          SELECT DISTINCT doc_id,
                 ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS s
          FROM (SELECT doc_id, ws,
                       UNNEST(generate_series(1, len(ws) - 2)) AS i
                FROM nw WHERE len(ws) >= 3)
          WHERE ws[i] <> ''),
        cg AS (
          SELECT DISTINCT doc_id,
                 ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS s
          FROM (SELECT doc_id, ws,
                       UNNEST(generate_series(1, len(ws) - 2)) AS i
                FROM cw WHERE len(ws) >= 3)
          WHERE ws[i] <> ''),
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


def test_domain_cap_oracle(spark, duck):
    from awskinesisconsumer_spark.operators.corpus_prep import domain_cap

    orders = load_table(spark, "orders", SF).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    out = domain_cap(
        orders, group_col="o_orderpriority", cap=20,
        order_by=[F.col("o_totalprice").desc()], id_col="o_orderkey",
    )
    _compare(out, duck, """
        WITH r AS (
          SELECT o_orderkey, o_orderpriority, o_totalprice,
                 CAST(ROW_NUMBER() OVER (
                     PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey) AS INT)
                   AS rank_in_group
          FROM orders)
        SELECT *, rank_in_group <= 20 AS kept FROM r
    """)


def test_snapshot_diff_oracle(spark, duck):
    # Two deterministic event-table snapshots: % 5 drops on the old
    # side, % 7 drops on the new side, % 11 mutates event_type —
    # exercising removed/added/changed/unchanged in one diff. Compare
    # columns are long/string only, so the digest serialization is
    # engine-portable (double-to-string formatting is not).
    from awskinesisconsumer_spark.operators.compaction import snapshot_diff

    ev = load_table(spark, "events", SF).select(
        "event_id", "user_id", "event_type"
    )
    old = ev.where(F.col("event_id") % 5 != 0)
    new = ev.where(F.col("event_id") % 7 != 0).withColumn(
        "event_type",
        F.when(F.col("event_id") % 11 == 0, F.lit("mutated"))
        .otherwise(F.col("event_type")),
    )
    out = snapshot_diff(
        old, new, key_cols=["event_id"],
        compare_cols=["user_id", "event_type"],
    )
    # sha256(VARCHAR) hashes the UTF-8 bytes — identical to Spark's
    # string -> binary cast feeding sha2.
    dig = ("sha256(concat(CAST(length(CAST(user_id AS VARCHAR)) "
           "AS VARCHAR), '|', CAST(user_id AS VARCHAR), "
           "CAST(length(event_type) AS VARCHAR), '|', event_type))")
    _compare(out, duck, f"""
        WITH o AS (
          SELECT event_id, {dig} AS old_digest
          FROM events WHERE event_id % 5 <> 0),
        n AS (
          SELECT event_id, {dig} AS new_digest
          FROM (SELECT event_id, user_id,
                  CASE WHEN event_id % 11 = 0 THEN 'mutated'
                       ELSE event_type END AS event_type
                FROM events WHERE event_id % 7 <> 0))
        SELECT COALESCE(o.event_id, n.event_id) AS event_id,
               old_digest, new_digest,
               CASE WHEN old_digest IS NULL THEN 'added'
                    WHEN new_digest IS NULL THEN 'removed'
                    WHEN old_digest = new_digest THEN 'unchanged'
                    ELSE 'changed' END AS diff_status
        FROM o FULL OUTER JOIN n ON o.event_id = n.event_id
    """)


def test_bpe_encode_oracle(spark, duck):
    # Encode with the merges trained on the SAME corpus: the train
    # twin's final vocab state v10 IS the per-word tokenization, so
    # the encode twin is the same recursive chain + a doc-level join
    # (__spark_entry__._bpe_oracle_sql(encode=True)).
    from __spark_entry__ import _bpe_oracle_sql
    from awskinesisconsumer_spark.operators.text import (
        bpe_encode_corpus, bpe_train_merges,
    )

    docs = load_table(spark, "documents", SF)
    rows = (bpe_train_merges(docs, text_col="text", n_merges=10)
            .orderBy("rank").collect())
    # The encode twin applies ALL 10 merges unconditionally, so it is
    # sound only when the trainer's early stop (pair_count < 2) never
    # triggered — assert that precondition, not just the count (the
    # registered ext-bpe-encode entry raises on it at gate time too).
    assert len(rows) == 10
    assert min(r["pair_count"] for r in rows) >= 2
    merges = [(r["left"], r["right"]) for r in rows]
    out = bpe_encode_corpus(
        docs, id_col="doc_id", text_col="text", merges=merges
    )
    _compare(out, duck, _bpe_oracle_sql(10, encode=True))


def test_semantic_decontaminate_oracle(spark, duck):
    # Embedding-based decontamination: corpus = vec_id % 13 != 0,
    # benchmark = the rest. The oracle replays the broadcast
    # cross-score + (sim DESC, bench_id) argmax in SQL with the same
    # left-fold cosine the ANN oracles use.
    from __spark_entry__ import _sql_cosine
    from awskinesisconsumer_spark.operators.similarity import (
        semantic_decontaminate,
    )

    emb = load_table(spark, "embeddings", SF)
    corpus = emb.where(F.col("vec_id") % 13 != 0)
    bench = emb.where(F.col("vec_id") % 13 == 0).select(
        F.col("vec_id").alias("bid"), F.col("embedding").alias("bvec")
    )
    out = semantic_decontaminate(
        corpus, bench, id_col="vec_id", vec_col="embedding",
        bench_id_col="bid", bench_vec_col="bvec", threshold=0.8,
    )
    cos = _sql_cosine("c.embedding", "b.embedding")
    _compare(out, duck, f"""
        WITH c AS (SELECT vec_id, embedding FROM embeddings
                   WHERE vec_id % 13 <> 0),
        b AS (SELECT vec_id AS bid, embedding FROM embeddings
              WHERE vec_id % 13 = 0),
        scored AS (
          SELECT c.vec_id, b.bid, {cos} AS sim
          FROM c CROSS JOIN b),
        ranked AS (
          SELECT vec_id, bid, sim,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, bid) AS rn
          FROM scored WHERE sim IS NOT NULL),
        best AS (SELECT vec_id, sim AS max_bench_cosine,
                        bid AS matched_bench_id
                 FROM ranked WHERE rn = 1)
        SELECT c.vec_id, max_bench_cosine, matched_bench_id,
               COALESCE(max_bench_cosine >= 0.8, FALSE) AS contaminated
        FROM c LEFT JOIN best ON best.vec_id = c.vec_id
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
