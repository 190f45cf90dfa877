"""Round-4 operators: token-window chunking, Bloom membership
prefilter, z-order layout, per-group top-N, sliding stream windows."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------- chunking

def test_chunk_text_covers_every_token_exactly(spark):
    from awskinesisconsumer_spark.operators.corpus_prep import chunk_text

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))),   # 10 toks: starts 0,4,8
         (2, "a b c"),                                 # 3 toks: one chunk
         (3, "solo"),                                  # 1 tok
         (4, ""), (5, "   "), (6, None)],              # no chunks
        "doc_id int, text string",
    )
    rows = chunk_text(docs, id_col="doc_id", text_col="text",
                      chunk_tokens=5, stride=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2, 3}
    d1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.chunk_start for r in d1] == [0, 4, 8]
    assert [r.n_chunk_tokens for r in d1] == [5, 5, 2]   # short tail
    assert d1[0].chunk_text == "w0 w1 w2 w3 w4"
    assert d1[2].chunk_text == "w8 w9"
    # overlap: chunk i starts inside chunk i-1 (stride < chunk_tokens)
    assert d1[1].chunk_text.startswith("w4")
    assert by_doc[2][0].chunk_text == "a b c"
    assert by_doc[3][0].n_chunk_tokens == 1


def test_chunk_text_validates_params(spark):
    from awskinesisconsumer_spark.operators.corpus_prep import chunk_text

    docs = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(ValueError):
        chunk_text(docs, id_col="doc_id", text_col="text", stride=0)


# ---------------------------------------------------------------- bloom

def test_bloom_no_false_negatives_and_some_rejections(spark):
    from awskinesisconsumer_spark.operators.sketches import (
        bloom_build, bloom_probe,
    )

    members = spark.range(100).select(
        F.concat(F.lit("key"), F.col("id")).alias("k")
    )
    words = bloom_build(members, key_col="k", m_bits=1 << 12, k=3)
    assert len(words) == (1 << 12) // 32
    probes = spark.range(1000).select(
        F.concat(F.lit("key"), F.col("id")).alias("k")
    )
    got = {r["k"]: r["hit"] for r in bloom_probe(
        probes, key_col="k", words=words, k=3, out_col="hit"
    ).collect()}
    # no false negatives: every member hits
    assert all(got[f"key{i}"] for i in range(100))
    # the filter actually filters: most non-members rejected
    non_member_hits = sum(got[f"key{i}"] for i in range(100, 1000))
    assert non_member_hits < 100


def test_bloom_decontaminate_audit_is_consistent(spark):
    from awskinesisconsumer_spark.operators.sketches import (
        bloom_decontaminate,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3}") for i in range(30)],
        "doc_id int, text string",
    )
    bench = docs.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("bid"), F.col("text").alias("btxt")
    )
    out = bloom_decontaminate(
        docs, bench, id_col="doc_id", text_col="text",
        bench_id_col="bid", bench_text_col="btxt",
        n=3, m_bits=1 << 10, k=3,
    ).collect()
    by_id = {r.doc_id: r for r in out}
    for r in out:
        # candidates ⊇ exact matches; fp = candidates - exact
        assert r.n_candidates >= r.n_exact_matches
        assert r.n_false_positives == r.n_candidates - r.n_exact_matches
        assert r.n_grams >= r.n_candidates
    # benchmark docs match all their own grams exactly (no false negs)
    for i in range(3):
        assert by_id[i].n_exact_matches == by_id[i].n_grams
    # doc 1 shares grams with bench docs 0-3's overlapping vocab
    assert by_id[3].n_exact_matches > 0   # "tok3 tok4 tok5" ∈ bench doc 2?
    # (doc 2's grams: tok2..tok5 → "tok3 tok4 tok5" yes)


# ---------------------------------------------------------------- z-order

def test_zorder_value_interleaves_bits(spark):
    from awskinesisconsumer_spark.operators.layout import zorder_value

    df = spark.createDataFrame(
        [(0b1010, 0b0110)], "x long, y long"
    ).select(zorder_value(F.col("x"), F.col("y"), bits=4).alias("z"))
    # x bits in even positions, y in odd:
    # x=1010, y=0110 -> z bits (msb..lsb): y3x3 y2x2 y1x1 y0x0
    #   = 01 10 11 00 -> 0b01101100 = 108
    assert df.head()["z"] == 0b01101100


def test_zorder_sql_matches_column_form(spark):
    from awskinesisconsumer_spark.operators.layout import (
        zorder_sql, zorder_value,
    )

    df = spark.range(256).select(
        ((F.col("id") * 7) % 64).alias("xb"),
        ((F.col("id") * 13) % 64).alias("yb"),
    )
    got = df.select(
        zorder_value(F.col("xb"), F.col("yb"), bits=6).alias("a"),
        F.expr(zorder_sql("xb", "yb", bits=6)).alias("b"),
    ).where(F.col("a") != F.col("b")).count()
    assert got == 0


def test_zorder_file_stats_locality(spark):
    from awskinesisconsumer_spark.operators.layout import zorder_file_stats

    # dense 64x64 grid -> with 16 files each file must cover a narrow
    # square-ish region: both dims' spans well below the full range.
    df = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    stats = zorder_file_stats(df, x_col="x", y_col="y", bits=6,
                              n_files=16).collect()
    assert len(stats) == 16
    assert sum(r.n_rows for r in stats) == 64 * 64
    for r in stats:
        # a z-range covering 1/16 of a 64x64 grid spans at most a
        # 32x16 (or 16x32) block of the plane
        assert (r.max_x - r.min_x + 1) * (r.max_y - r.min_y + 1) <= 32 * 16

    with pytest.raises(ValueError):
        zorder_file_stats(df, x_col="x", y_col="y", n_files=10)


# ---------------------------------------------------------------- sliding

def test_sliding_agg_stream_matches_batch_grid(spark, tmp_path):
    from awskinesisconsumer_spark.streaming.pipeline import (
        sliding_agg_stream,
    )

    ev = spark.createDataFrame(
        [(i, float(i), "2024-01-01 0%d:%02d:00" % (i // 4, (i % 4) * 15))
         for i in range(24)],
        "event_id long, value double, ts_s string",
    ).select("event_id", "value", F.col("ts_s").cast("timestamp").alias("ts"))
    src = str(tmp_path / "src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        sliding_agg_stream(stream.select("ts", "value", "event_id"))
        .writeStream.format("memory").queryName("slide_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r.w_start, r.w_end): (r.n_events, r.max_event_id)
        for r in spark.sql("select * from slide_t").collect()
    }
    # events span 6 h; watermark = max_ts - 1 h closes windows ending
    # <= 04:45. 2 h windows sliding 1 h: starts 23:00..03:00 end <=
    # 04:45 -> ends 01:00..04:00 emitted? ends at 01..04 inclusive.
    assert len(got) > 0
    for (ws, we), (n, _) in got.items():
        assert (we - ws).total_seconds() == 7200
        # re-derive the count from the batch side
        n_batch = ev.where(
            (F.col("ts") >= F.lit(ws)) & (F.col("ts") < F.lit(we))
        ).count()
        assert n == n_batch
    # overlap: hour 01:00-02:00's events appear in two emitted windows
    starts = sorted(ws for ws, _ in got)
    assert len(starts) >= 2


# ---------------------------------------------------------------- buckets

def test_equidepth_buckets_ntile_semantics(spark):
    from awskinesisconsumer_spark.operators.corpus_prep import (
        equidepth_buckets,
    )

    # 21 rows into 4 buckets: NTILE gives sizes 6,5,5,5 (larger first)
    df = spark.range(21).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 50).alias("v")
    )
    out = {r.bucket: r for r in equidepth_buckets(
        df, order_col="v", id_col="k", n_buckets=4, group_width=8
    ).collect()}
    assert [out[b].n_rows for b in sorted(out)] == [6, 5, 5, 5]
    # buckets are value-ordered: max of bucket b <= min of bucket b+1
    for b in range(1, 4):
        assert out[b].max_val <= out[b + 1].min_val


def test_equidepth_buckets_fewer_rows_than_buckets(spark):
    from awskinesisconsumer_spark.operators.corpus_prep import (
        equidepth_buckets,
    )

    df = spark.createDataFrame([(1, 10), (2, 30)], "k int, v int")
    out = sorted(equidepth_buckets(
        df, order_col="v", id_col="k", n_buckets=8
    ).collect(), key=lambda r: r.bucket)
    assert [(r.bucket, r.n_rows) for r in out] == [(1, 1), (2, 1)]


# ---------------------------------------------------------------- enrich

def test_enrich_stream_static_broadcast_and_modes(spark, tmp_path):
    from awskinesisconsumer_spark.streaming.pipeline import (
        enrich_stream_static,
    )

    ev = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99)], "event_id long, k long"
    )
    src = str(tmp_path / "esrc")
    ev.write.parquet(src)
    dim = spark.createDataFrame(
        [(10, "A"), (20, "B")], "k long, seg string"
    )
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = enrich_stream_static(stream, dim, on="k", how="left")
    q = (
        out.writeStream.format("memory").queryName("enrich_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r.event_id: r.seg for r in
           spark.sql("select * from enrich_t").collect()}
    assert got == {1: "A", 2: "B", 3: None}

    with pytest.raises(ValueError):
        enrich_stream_static(stream, dim, on="k", how="full")


# ------------------------------------------------------------ interval join

def test_interval_join_stream_matches_batch(spark, tmp_path, state_store):
    # Parametrized over HDFS- and RocksDB-backed state stores (the
    # stream-stream join keeps both sides' buffers in the store; at
    # 100 TB RocksDB is mandatory) — identical join output on both.
    from awskinesisconsumer_spark.streaming.pipeline import (
        interval_join_stream,
    )

    # clicks at :00,:20,:40 each hour for 3 users; purchases at :50.
    rows = []
    for u in range(3):
        for h in range(4):
            for m in (0, 20, 40):
                rows.append((u, len(rows), "c", f"2024-01-01 0{h}:{m:02d}:00"))
            rows.append((u, len(rows), "p", f"2024-01-01 0{h}:50:00"))
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, kind string, ts_s string"
    ).select("user_id", "event_id", "kind",
             F.col("ts_s").cast("timestamp").alias("ts"))
    src = str(tmp_path / "ijsrc")
    ev.coalesce(1).write.parquet(src)

    def side(kind, idc, tsc):
        return (
            spark.readStream.schema(ev.schema).parquet(src)
            .where(F.col("kind") == kind)
            .select("user_id", F.col("event_id").alias(idc),
                    F.col("ts").alias(tsc))
        )

    out = interval_join_stream(
        side("c", "click_id", "click_ts"), side("p", "buy_id", "buy_ts"),
        key="user_id", left_ts="click_ts", right_ts="buy_ts",
        lookback="1 hour", delay="1 hour",
    )
    q = (
        out.writeStream.format("memory").queryName("ij_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.click_id, r.buy_id)
        for r in spark.sql("select * from ij_t").collect()
    )
    want = sorted(
        (c.user_id, c.event_id, p.event_id)
        for c in ev.where("kind = 'c'").collect()
        for p in ev.where("kind = 'p'").collect()
        if c.user_id == p.user_id and c.ts <= p.ts
        and (p.ts - c.ts).total_seconds() <= 3600
    )
    assert got == want
    # every purchase attributes to exactly its 3 same-hour clicks
    # (:00/:20/:40 are all within 60 min of :50; the previous hour's
    # :40 click is 70 min back — outside the lookback)
    per_buy = {}
    for u, c, b in got:
        per_buy[b] = per_buy.get(b, 0) + 1
    assert sorted(per_buy.values()) == [3] * 12  # 4 hours x 3 users
