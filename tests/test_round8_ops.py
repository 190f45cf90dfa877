"""Round-8 additions: ADVICE fixes (partition-spelling-preserving
compaction, per-attempt PNG sink temp names, atomic corpus-drift
stream publish + release handle, histogram degenerate-signal
validation, quality-blend degenerate-cut oracle guard), the fused
one-scan domain_cap_topk totals, the elementHeadCalback scan hook,
and the r9-banked operator proofs (decimate_wav,
quality_blend_stream, content_defined_chunks, sample_frames_ordered) —
the bank-then-register pattern, one round ahead.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_compact_preserves_partition_value_spelling(spark, tmp_path):
    # ADVICE r7: the rewrite must not round-trip partition values
    # through type inference — key=00123 must stay key=00123, not be
    # re-rendered as key=123.
    from awskinesisconsumer_spark.operators.layout import (
        compact_small_files,
    )

    df = spark.createDataFrame(
        [(i, f"{i % 3:05d}") for i in range(300)], "id long, key string"
    )
    path = str(tmp_path / "padded")
    df.repartition(6).write.partitionBy("key").parquet(path)
    parts_before = sorted(
        d for d in os.listdir(path) if d.startswith("key=")
    )
    assert parts_before == ["key=00000", "key=00001", "key=00002"]

    report = compact_small_files(spark, path, target_bytes=1 << 30)
    assert report["compacted"] is True

    parts_after = sorted(
        d for d in os.listdir(path) if d.startswith("key=")
    )
    assert parts_after == parts_before
    # rows survive with the padded spelling readable as before (read
    # with inference off — the default reader parses key=00000 as int
    # 0 even on the pristine original, which is exactly the ambiguity
    # the preserved spelling protects downstream string readers from)
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    spark.conf.set(infer_key, "false")
    try:
        got = spark.read.parquet(path)
        assert got.count() == 300
        assert sorted(
            r["key"] for r in got.select("key").distinct().collect()
        ) == ["00000", "00001", "00002"]
    finally:
        spark.conf.set(infer_key, "true")
    # and the session conf was restored
    assert spark.conf.get(
        "spark.sql.sources.partitionColumnTypeInference.enabled"
    ) in ("true", "True")


def test_png_sink_temp_names_are_attempt_unique(spark, tmp_path):
    # ADVICE r7 (medium): with speculative execution two concurrent
    # attempts of one task must never interleave writes into ONE temp
    # file. The temp name embeds the task attempt id, which Spark
    # makes unique across attempts of the same task; assert the final
    # files land correctly and no temp debris survives.
    from awskinesisconsumer_spark.operators.multimodal import (
        encode_png_rgb, png_file_sink,
    )

    frames = spark.range(6)
    png = encode_png_rgb(frames, id_col="id", height=4, width=4)
    out_dir = str(tmp_path / "png_out")
    manifest = png_file_sink(
        png, id_col="doc_id", payload_col="payload", out_dir=out_dir
    ).collect()
    assert len(manifest) == 6
    names = sorted(os.listdir(out_dir))
    assert names == [f"frame_{i}.png" for i in range(6)]
    assert not [n for n in names if n.startswith("._tmp")]


def test_histogram_quantiles_degenerate_signal_raises(spark):
    # ADVICE r7: a lo == hi signal used to be silently dropped (the
    # zero-width bin expression goes NULL and the rows filter away);
    # now it fails fast in both the single and multi forms.
    from awskinesisconsumer_spark.operators.sketches import (
        histogram_quantiles, histogram_quantiles_multi,
    )

    df = spark.range(10).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="hi > lo"):
        histogram_quantiles(df, value_col="v", lo=5.0, hi=5.0)
    with pytest.raises(ValueError, match="hi > lo"):
        histogram_quantiles_multi(
            df, signals={"v": (0.0, 10.0), "w": (3.0, 3.0)}
        )


def test_quality_blend_degenerate_cut_oracle_parity(spark, tmp_path):
    # ADVICE r7: the ext-quality-blend DuckDB twin divided by
    # (hi_cut - lo_cut) unguarded; on a constant-valued signal the
    # operator emits 0.5 while the twin went NULL/inf. The twin now
    # carries the same degenerate branch — prove parity on a corpus
    # with ONE non-null document: rank(0.01) == rank(0.99) == 1, so
    # both cut points land on the same in-bin interpolation and
    # hi_cut == lo_cut exactly (constant values alone do NOT collapse
    # the cuts — the rank offset interpolates WITHIN the bin).
    import duckdb

    import __spark_entry__ as entry

    docs = spark.createDataFrame(
        [(0, "five words of fixed text"), (99, None)],
        "doc_id long, text string",
    )
    sf = str(tmp_path / "sfdeg")
    docs.coalesce(1).write.parquet(f"{sf}/documents.parquet")

    got = {
        r["doc_id"]: (
            r["norm_n_chars"], r["norm_n_words"], r["quality_blend"]
        )
        for r in entry.queries()["ext-quality-blend"](spark, sf).collect()
    }
    assert got[0] == (0.5, 0.5, 0.5)
    assert got[99] == (None, None, None)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            "SELECT doc_id, norm_n_chars, norm_n_words, quality_blend "
            f"FROM ({entry.oracle_sql()['ext-quality-blend']})"
        ).fetchall()
    }
    assert want == got


def test_element_head_callback_fires_for_every_head():
    # The reference's elementHeadCalback fires for EVERY element head
    # read, BEFORE the interesting-name filter (ref ebml.py:157,
    # 300-301). The tokenizer-level hook must match: with an
    # allowlist that drops most elements, the callback still observes
    # all heads, and yielded rows carry its per-head result.
    from awskinesisconsumer_spark.sources.ebml import (
        encode_element, tokenize_bytes,
    )

    payload = (
        encode_element(0x4285, (2).to_bytes(1, "big"))      # DocTypeReadVersion
        + encode_element(0x45A3, b"tagname")                # TagName
        + encode_element(0x4487, b"42")                     # TagString
        + encode_element(0xA3, b"framebytes")               # SimpleBlock
    )
    seen = []

    def cb(size, element_id, name, ebml_type):
        seen.append((name, size))
        return f"{ebml_type}:{(size or 0) % 5}"

    rows = list(tokenize_bytes(
        payload, 7, interesting_names={"SimpleBlock"}, head_callback=cb
    ))
    # all four heads observed despite the one-name allowlist
    assert [n for n, _ in seen] == [
        "DocTypeReadVersion", "TagName", "TagString", "SimpleBlock"
    ]
    assert [s for _, s in seen] == [1, 7, 2, 10]
    # only the allowlisted row is yielded, carrying the callback value
    assert len(rows) == 1
    assert rows[0]["name"] == "SimpleBlock"
    assert rows[0]["cb_value"] == "BINARY:0"


def test_scan_element_callback_gate_parity(spark):
    # The gated scan-element-callback entry vs its DuckDB twin at
    # sf0.001 (the driver's canonicalization).
    import math

    import duckdb

    import __spark_entry__ as entry

    SF = "/root/testdata/sf0.001"
    out = entry.queries()["scan-element-callback"](spark, SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(
        entry.oracle_sql()["scan-element-callback"]
    ).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) > 4


# --- r9-banked operators: proofs one round ahead (the established
# --- bank-then-register pattern) -----------------------------------------


def test_decimate_wav_roundtrip_and_oracle(spark):
    # Banked for r9 as `ext-audio-resample`: integer-factor
    # decimation on REAL WAV payloads — decode, stride, RE-ENCODE a
    # genuine WAV at rate/factor. Stats must equal the DuckDB replay
    # of the synthesis formula over strided indices, and the emitted
    # payload must decode again through the real codec.
    import duckdb

    from awskinesisconsumer_spark.operators.multimodal import (
        decimate_wav, decode_wav, synth_wav_pcm16,
    )

    ids = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    wavs = synth_wav_pcm16(ids, id_col="doc_id", n_frames=441,
                           sample_rate=8000)
    dec = decimate_wav(wavs, factor=3)
    got = [
        (r.doc_id, r.sample_rate, r.n_frames, r.sum_samples,
         r.sum_abs_samples)
        for r in dec.orderBy("doc_id").collect()
    ]
    want = duckdb.sql("""
        SELECT i, 8000 // 3, 147,
               SUM(((i * 31 + (3 * j) * 17) % 65536) - 32768),
               SUM(ABS(((i * 31 + (3 * j) * 17) % 65536) - 32768))
        FROM range(0, 30) t(i), range(0, 147) s(j)
        GROUP BY i ORDER BY i
    """).fetchall()
    assert got == [tuple(int(x) for x in w) for w in want]

    # the re-encoded payload is a real WAV: full decode roundtrip
    back = decode_wav(dec.select("doc_id", "payload")).orderBy("doc_id")
    rows = back.collect()
    assert all(r.sample_rate == 2666 and r.n_frames == 147 for r in rows)
    assert [(r.doc_id, r.sum_samples) for r in rows] == [
        (g[0], g[3]) for g in got
    ]
    # garbage/NULL payloads follow the error-routing convention
    bad = spark.createDataFrame(
        [(1, bytearray(b"not a riff")), (2, None)],
        "doc_id long, payload binary",
    )
    flags = {r.doc_id: r.n_frames for r in decimate_wav(bad, factor=2).collect()}
    assert flags == {1: None, 2: None}


def test_quality_blend_stream_equals_batch_and_oracle(spark, tmp_path):
    # Banked for r9 as `stream-quality-blend`: arriving docs scored
    # map-only against FROZEN cut points from the reference half.
    # The 3-batch union must equal the single-batch
    # quality_blend_with_cuts(all_arrived, cuts), and the chained
    # DuckDB twin (cut CTEs over the reference half, normalization
    # over the arriving half) must hash-match — the r9 gate SQL.
    import math

    import duckdb

    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.corpus_prep import (
        quality_blend_with_cuts, quality_cut_points,
    )
    from awskinesisconsumer_spark.streaming.pipeline import (
        quality_blend_stream,
    )

    SF = "/root/testdata/sf0.001"
    signals = {"n_chars": (0.0, 2000.0, 0.6), "n_words": (0.0, 400.0, 0.4)}

    def sig_of(docs):
        return docs.select(
            "doc_id",
            F.length("text").cast("double").alias("n_chars"),
            F.when(
                F.length(F.trim(F.coalesce(F.col("text"), F.lit("")))) > 0,
                F.size(F.split(F.trim(F.col("text")), r"\s+"))
                .cast("double"),
            ).alias("n_words"),
        )

    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    reference = sig_of(docs.where(F.col("doc_id") % 2 == 0))
    arriving = sig_of(docs.where(F.col("doc_id") % 2 == 1))

    src = str(tmp_path / "qb_src")
    arriving.repartition(3).write.parquet(src)
    out_path = str(tmp_path / "qb_out")
    q = quality_blend_stream(
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", "1").parquet(src),
        reference, signals=signals,
        out_path=out_path, checkpoint=str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(180)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 3

    cuts = quality_cut_points(reference, signals=signals)
    got = sorted(tuple(r) for r in spark.read.parquet(out_path).collect())
    want = sorted(
        tuple(r)
        for r in quality_blend_with_cuts(
            arriving, signals=signals, cuts=cuts
        ).select(*spark.read.parquet(out_path).columns).collect()
    )
    assert got == want and len(got) == 250

    # the r9 gate twin: reference-half cuts, arriving-half blend
    from __spark_entry__ import _quality_blend_cut_cte

    def norm_expr(tag, expr):
        return (f"CASE WHEN ({expr}) IS NULL THEN NULL"
                f" WHEN lohi_{tag}.hi_cut = lohi_{tag}.lo_cut THEN 0.5"
                f" ELSE ROUND((LEAST(GREATEST(CAST({expr} AS DOUBLE), "
                f"lohi_{tag}.lo_cut), lohi_{tag}.hi_cut)"
                f" - lohi_{tag}.lo_cut)"
                f" / (lohi_{tag}.hi_cut - lohi_{tag}.lo_cut), 6) END")

    chars = "CAST(length(text) AS DOUBLE)"
    words = ("CASE WHEN length(trim(coalesce(text, ''))) > 0 THEN "
             "CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)"
             " END")
    nc, nw = norm_expr("c", chars), norm_expr("w", words)
    sql = f"""
        WITH sig AS (SELECT doc_id, text FROM documents
                     WHERE doc_id % 2 = 0),
        q AS (SELECT UNNEST(CAST([0.01, 0.99] AS DOUBLE[])) AS q),
        {_quality_blend_cut_cte('c', chars, 0.0, 2000.0, 200).lstrip()},
        {_quality_blend_cut_cte('w', words, 0.0, 400.0, 200).lstrip()}
        SELECT doc_id,
               {nc} AS norm_n_chars,
               {nw} AS norm_n_words,
               CASE WHEN (CASE WHEN {nc} IS NOT NULL THEN 0.6 ELSE 0 END
                        + CASE WHEN {nw} IS NOT NULL THEN 0.4 ELSE 0 END) > 0
                 THEN ROUND(
                   (COALESCE({nc} * 0.6, 0) + COALESCE({nw} * 0.4, 0))
                   / (CASE WHEN {nc} IS NOT NULL THEN 0.6 ELSE 0 END
                    + CASE WHEN {nw} IS NOT NULL THEN 0.4 ELSE 0 END), 6)
               END AS quality_blend
        FROM (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1)
        CROSS JOIN lohi_c CROSS JOIN lohi_w
    """
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    out = spark.read.parquet(out_path).select(
        "doc_id", "norm_n_chars", "norm_n_words", "quality_blend"
    )
    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows


def test_content_defined_chunks_oracle(spark):
    # Banked for r9 as `ext-cdc-chunk-text`: char-level
    # content-defined chunking (stateless FastCDC form); the twin
    # replays window hashing, boundary election, segment
    # reconstruction, and chunk hashing.
    import math

    import duckdb

    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.corpus_prep import (
        content_defined_chunks,
    )
    from awskinesisconsumer_spark.operators.dedup import portable_hash52

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    out = content_defined_chunks(
        docs, id_col="doc_id", text_col="text", window=8, divisor=64,
        hash_fn=portable_hash52,
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    h52 = "('0x' || substr(md5({x}), 1, 13))::BIGINT"
    sql = f"""
        WITH d AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents),
        cand AS (SELECT doc_id, t, CAST(p AS INT) AS p
                 FROM d, UNNEST(range(8, length(t) + 1)) AS u(p)
                 WHERE length(t) >= 8),
        bnd AS (SELECT doc_id, p FROM cand
                WHERE {h52.format(x="substr(t, p - 7, 8)")} % 64 = 0),
        seg AS (
          SELECT doc_id,
                 COALESCE(LAG(p) OVER (PARTITION BY doc_id ORDER BY p),
                          0) AS s,
                 p AS e
          FROM bnd
          UNION ALL
          SELECT d.doc_id,
                 COALESCE((SELECT MAX(p) FROM bnd b
                           WHERE b.doc_id = d.doc_id), 0),
                 length(t)
          FROM d),
        idx AS (
          SELECT doc_id, s, e,
                 CAST(ROW_NUMBER() OVER (
                     PARTITION BY doc_id ORDER BY s) - 1 AS INT)
                   AS chunk_idx
          FROM seg)
        SELECT i.doc_id, chunk_idx,
               CAST(s AS BIGINT) AS chunk_start,
               CAST(e - s AS BIGINT) AS chunk_len,
               {h52.format(x="substr(t, CAST(s AS INT) + 1, "
                             "CAST(e - s AS INT))")} AS chunk_hash
        FROM idx i JOIN d USING (doc_id) WHERE e - s > 0
    """

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names), (cols, tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) > 500


def test_content_defined_chunks_shift_resistance(spark):
    # THE property fixed-width chunking lacks: prepending one char
    # re-aligns — every chunk after the first boundary keeps its
    # hash, so chunk-level dedup still matches the unshifted copy.
    import hashlib

    from awskinesisconsumer_spark.operators.corpus_prep import (
        content_defined_chunks,
    )
    from awskinesisconsumer_spark.operators.dedup import portable_hash52

    # non-repeating text (distinct numbered words) so any chunk-hash
    # agreement is genuine re-alignment, not periodicity
    text = " ".join(f"word{i:04d}" for i in range(120))
    df = spark.createDataFrame(
        [(1, text), (2, "X" + text)], "doc_id long, text string"
    )
    out = content_defined_chunks(
        df, id_col="doc_id", text_col="text", window=8, divisor=32,
        hash_fn=portable_hash52,
    ).collect()
    h1 = [r.chunk_hash for r in sorted(
        (r for r in out if r.doc_id == 1), key=lambda r: r.chunk_idx)]
    h2 = [r.chunk_hash for r in sorted(
        (r for r in out if r.doc_id == 2), key=lambda r: r.chunk_idx)]
    assert len(h1) > 3
    # all chunks of doc 1 except its first are recovered verbatim in
    # the shifted doc — the re-alignment fixed-offset chunking lacks
    assert set(h1[1:]) <= set(h2)
    # the contrast: fixed 64-char windows over the same pair share
    # NOTHING after a one-char shift (computed host-side — the
    # property is about the chunking scheme, not the engine)
    fixed1 = {hashlib.md5(text[i:i + 64].encode()).hexdigest()
              for i in range(0, len(text), 64)}
    fixed2 = {hashlib.md5(("X" + text)[i:i + 64].encode()).hexdigest()
              for i in range(0, len("X" + text), 64)}
    assert not (fixed1 & fixed2)


def test_sample_frames_oracle_and_first_frame_guarantee(spark):
    # Banked for r9 as `ext-frame-sample`: deterministic every-k-th
    # frame sampling per stream over the composed KVS pipeline — the
    # reproducible form of the reference's wall-clock frame throttle
    # (parser.py:460-463), run BEFORE decode so skipped payloads are
    # never touched. Twin = the kvs-frames arithmetic with the
    # 1-based index filter i % 2 = 1.
    import math

    import duckdb

    import __spark_entry__ as entry
    from awskinesisconsumer_spark.operators.multimodal import (
        sample_frames_ordered,
    )

    SF = "/root/testdata/sf0.001"
    frames = entry.queries()["kvs-frames-with-tags"](spark, SF)
    out = sample_frames_ordered(
        frames, stream_col="chunk_id", order_col="frame_position",
        every=2,
    ).select("chunk_id", "frame_idx", "frame_position",
             "AWS_KINESISVIDEO_FRAGMENT_NUMBER")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sql = """
        WITH d AS (
          SELECT doc_id,
                 length(CAST(doc_id AS VARCHAR)) AS idlen,
                 octet_length(encode(CASE WHEN text IS NULL OR text = ''
                                          THEN 'x' ELSE text END)) AS tb,
                 CAST(doc_id % 3 + 1 AS BIGINT) AS nf
          FROM documents),
        f AS (
          SELECT doc_id AS chunk_id,
                 CAST(UNNEST(generate_series(1, nf)) AS INT) AS frame_idx,
                 CAST(100 + idlen
                      + (UNNEST(generate_series(1, nf)) - 1)
                        * (6 + LEAST(16, tb)) AS BIGINT) AS frame_position,
                 CAST(91340000000 + doc_id AS VARCHAR)
                   AS "AWS_KINESISVIDEO_FRAGMENT_NUMBER"
          FROM d)
        SELECT * FROM f WHERE frame_idx % 2 = 1
    """

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names), (cols, tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) > 500

    # first-frame guarantee: every stream survives sampling at any k
    n_streams = frames.select("chunk_id").distinct().count()
    for k in (2, 3, 10):
        kept = sample_frames_ordered(
            frames, stream_col="chunk_id", order_col="frame_position",
            every=k,
        )
        assert kept.select("chunk_id").distinct().count() == n_streams


def test_dataset_card_oracle(spark):
    # Banked for r9 as `ext-dataset-card`: the corpus-release summary
    # block (docs/tokens/emptiness/exact-dup rate/length quantiles)
    # as ONE (metric, value) table. Fixture injects duplicates and
    # whitespace-only docs so every metric is non-degenerate; twin
    # replays the aggregates + the histogram-quantile interpolation.
    import math

    import duckdb

    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.corpus_prep import dataset_card

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", SF).select(
        "doc_id",
        F.when(F.col("doc_id") % 13 == 0, F.lit("duplicated short text"))
        .when(F.col("doc_id") % 17 == 0, F.lit("   "))
        .otherwise(F.col("text")).alias("text"),
    )
    out = dataset_card(docs, id_col="doc_id", text_col="text")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sql = r"""
        WITH injected AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 13 = 0 THEN 'duplicated short text'
                      WHEN doc_id % 17 = 0 THEN '   '
                      ELSE text END AS text
          FROM documents),
        pd AS (
          SELECT doc_id,
                 length(COALESCE(text, '')) AS nc,
                 CASE WHEN length(trim(COALESCE(text, ''))) > 0
                      THEN len(string_split_regex(
                             trim(COALESCE(text, '')), '\s+'))
                      ELSE 0 END AS nw,
                 COALESCE(text, '') AS t
          FROM injected),
        base AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                 CAST(SUM(CASE WHEN nw = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                   AS n_empty,
                 CAST(SUM(nc) AS DOUBLE) AS n_chars_total,
                 CAST(SUM(nw) AS DOUBLE) AS n_words_total,
                 CAST(COUNT(DISTINCT t) AS DOUBLE) AS n_distinct_texts,
                 ROUND(AVG(nw), 6) AS mean_words
          FROM pd),
        b AS (SELECT LEAST(GREATEST(
                CAST(FLOOR(CAST(nw AS DOUBLE) / 2.0) AS INT), 0), 199)
                AS bin FROM pd),
        c AS (SELECT bin, COUNT(*) AS c FROM b GROUP BY 1),
        cum AS (SELECT bin, c, SUM(c) OVER (ORDER BY bin) AS cum,
                       SUM(c) OVER () AS total FROM c),
        q AS (SELECT UNNEST(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS q),
        cuts AS (
          SELECT q.q,
                 MIN_BY(ROUND((bin
                   + (CEIL(q.q * total) - (cum - c)) / CAST(c AS DOUBLE))
                   * 2.0, 4), bin) AS est
          FROM cum CROSS JOIN q
          WHERE cum >= CEIL(q.q * total) GROUP BY q.q)
        SELECT 'n_docs' AS metric, n_docs AS value FROM base
        UNION ALL SELECT 'n_empty', n_empty FROM base
        UNION ALL SELECT 'n_chars_total', n_chars_total FROM base
        UNION ALL SELECT 'n_words_total', n_words_total FROM base
        UNION ALL SELECT 'n_distinct_texts', n_distinct_texts FROM base
        UNION ALL SELECT 'n_exact_dup_docs', n_docs - n_distinct_texts
          FROM base
        UNION ALL SELECT 'mean_words', mean_words FROM base
        UNION ALL
        SELECT 'words_p' || CAST(CAST(q * 100 AS INT) AS VARCHAR), est
        FROM cuts
    """

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) == 10
    # non-degenerate fixture: dups and empties were actually counted
    vals = {m: float(v) for m, v in
            ((r["metric"], r["value"]) for r in out.collect())}
    assert vals["n_exact_dup_docs"] > 0
    assert vals["n_empty"] > 0
    assert vals["words_p50"] <= vals["words_p90"] <= vals["words_p99"]


def test_strip_html_oracle(spark):
    # Banked for r9 as `ext-html-strip`: HTML boilerplate removal —
    # script/style/comment blocks dropped wholesale, tags stripped,
    # the six dominant entities decoded (&amp; strictly last so
    # double-escaped text stays text), whitespace collapsed. The
    # corpus is plain text, so the fixture wraps EVERY document in
    # deterministic markup (with %7 plain-text and %19 NULL branches
    # so the had_html flag is exercised in all three states); the
    # DuckDB twin replays the SAME regex chain (RE2/Java-portable
    # subset) + ordered entity replaces.
    import math

    import duckdb

    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.text import strip_html

    SF = "/root/testdata/sf0.001"
    sfx = (
        '</p><script type="text/javascript">var x = "<b>1</b>";'
        "</script><style>.a { color: red; }</style><!-- tracked -->"
        "<div>A &amp;lt; B &nbsp;&quot;q&quot; &#39;s&#39; "
        "&lt;tag&gt; C</div>"
    )
    docs = load_table(spark, "documents", SF).select(
        "doc_id",
        F.when(F.col("doc_id") % 19 == 0, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 7 == 0, F.coalesce("text", F.lit("")))
        .otherwise(
            F.concat(
                F.lit('<p class="lead">'),
                F.coalesce("text", F.lit("")),
                F.lit(sfx),
            )
        )
        .alias("text"),
    )
    out = strip_html(docs, text_col="text").select(
        "doc_id", "text_clean", "had_html"
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sfx_sql = sfx.replace("'", "''")
    sql = rf"""
        WITH inj AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 19 = 0 THEN NULL
                      WHEN doc_id % 7 = 0 THEN COALESCE(text, '')
                      ELSE '<p class="lead">' || COALESCE(text, '')
                           || '{sfx_sql}' END AS text
          FROM documents),
        s1 AS (
          SELECT doc_id, text,
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(text,
                    '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
                  '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
                '(?s)<!--.*?-->', ' ', 'g'),
              '(?s)<[^>]*>', ' ', 'g') AS t
          FROM inj),
        s2 AS (
          SELECT doc_id, text,
            replace(replace(replace(replace(replace(replace(t,
              '&nbsp;', ' '), '&quot;', '"'), '&#39;', ''''),
              '&lt;', '<'), '&gt;', '>'), '&amp;', '&') AS t
          FROM s1)
        SELECT doc_id,
               trim(regexp_replace(t, '[ \t\r\n\f]+', ' ', 'g'))
                 AS text_clean,
               CASE WHEN text IS NOT NULL
                    THEN regexp_matches(text, '(?s)<[^>]*>') END
                 AS had_html
        FROM s2
    """

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) == 500

    # semantic spot-checks on one wrapped row: tags gone, entities
    # decoded, double-escape preserved as text, script payload dropped
    row = {r["doc_id"]: r for r in out.collect()}
    wrapped = next(
        i for i in range(1, 500) if i % 19 != 0 and i % 7 != 0
    )
    t = row[wrapped]["text_clean"]
    assert "<b>" not in t and "var x" not in t and "color: red" not in t
    assert '"q"' in t and "'s'" in t and "<tag>" in t and "&lt;" in t
    assert row[wrapped]["had_html"] is True
    plain = next(i for i in range(1, 500) if i % 7 == 0 and i % 19 != 0)
    assert row[plain]["had_html"] is False
    assert row[0]["had_html"] is None and row[0]["text_clean"] is None


def test_bigram_perplexity_oracle(spark):
    # Banked for r9 as `ext-perplexity-bigram`: per-doc average
    # bigram log-probability under the corpus' own add-one-smoothed
    # bigram LM (the CCNet-style fluency score one tier above
    # ext-unigram-logprob — word ORDER matters here). Fixture injects
    # a single-word doc (%23) and a NULL doc (%29) so the no-bigram
    # branch gates. Twin replays tokenization, pair formation,
    # count tables, and the sorted-fold mean verbatim.
    import math

    import duckdb

    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.text import bigram_perplexity

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", SF).select(
        "doc_id",
        F.when(F.col("doc_id") % 23 == 0, F.lit("solo"))
        .when(F.col("doc_id") % 29 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    out = bigram_perplexity(docs, id_col="doc_id", text_col="text")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sql = r"""
        WITH inj AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 23 = 0 THEN 'solo'
                      WHEN doc_id % 29 = 0 THEN NULL
                      ELSE text END AS text
          FROM documents),
        w AS (
          SELECT doc_id,
            CASE WHEN length(trim(COALESCE(text, ''))) = 0
                 THEN CAST([] AS VARCHAR[])
                 ELSE string_split_regex(
                        lower(trim(COALESCE(text, ''))), '\s+')
            END AS words
          FROM inj),
        idx AS (
          SELECT doc_id, words,
                 UNNEST(generate_series(1, len(words) - 1)) AS i
          FROM w WHERE len(words) >= 2),
        pairs AS (
          SELECT doc_id, words[i] AS w1, words[i + 1] AS w2 FROM idx
          WHERE words[i] <> '' AND words[i + 1] <> ''),
        dbg AS (SELECT doc_id, w1, w2, COUNT(*) AS c
                FROM pairs GROUP BY 1, 2, 3),
        cbg AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY 1, 2),
        cuni AS (SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY 1),
        voc AS (
          SELECT CAST(COUNT(DISTINCT wd) AS DOUBLE) AS v
          FROM (SELECT UNNEST([w1, w2]) AS wd FROM pairs)),
        per AS (
          SELECT doc_id, SUM(c) AS n,
                 list(struct_pack(c := c, c12 := c12, c1 := c1)
                      ORDER BY w1, w2) AS es,
                 ANY_VALUE(v) AS v
          FROM dbg JOIN cbg USING (w1, w2) JOIN cuni USING (w1)
               CROSS JOIN voc
          GROUP BY doc_id),
        sc AS (
          SELECT doc_id, CAST(n AS BIGINT) AS n_bigrams,
            ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list_transform(es, e -> CAST(e.c AS DOUBLE)
                * (ln(CAST(e.c12 AS DOUBLE) + 1.0)
                   - ln(CAST(e.c1 AS DOUBLE) + v)))),
              (a, x) -> a + x) / CAST(n AS DOUBLE), 4) AS avg_logprob
          FROM per)
        SELECT i.doc_id, COALESCE(sc.n_bigrams, 0) AS n_bigrams,
               sc.avg_logprob
        FROM inj i LEFT JOIN sc USING (doc_id)
    """

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) == 500

    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[23]["n_bigrams"] == 0 and rows[23]["avg_logprob"] is None
    assert rows[29]["n_bigrams"] == 0 and rows[29]["avg_logprob"] is None
    scored = [r for r in rows.values() if r["avg_logprob"] is not None]
    assert len(scored) > 400
    assert all(r["avg_logprob"] < 0.0 for r in scored)


def test_frame_sample_stream_equals_batch_and_oracle(spark, tmp_path):
    # Banked for r9 as `stream-frame-sample`: stateful streaming
    # every-k-th frame sampler — per-stream running frame count in
    # the state store, survives micro-batch boundaries. With arrival
    # arranged frame_position-ascending (3 chunk files, mtimes forcing
    # FileStreamSource order), the emitted union must equal batch
    # sample_frames_ordered(all_arrived, every) and hash-match the
    # kvs-frames arithmetic twin filtered to sampled indices.
    import math
    import os

    import duckdb

    import __spark_entry__ as entry
    from awskinesisconsumer_spark.operators.multimodal import (
        sample_frames_ordered,
    )
    from awskinesisconsumer_spark.streaming.pipeline import (
        frame_sample_stream,
    )
    from pyspark.sql import Window

    SF = "/root/testdata/sf0.001"
    frames = entry.queries()["kvs-frames-with-tags"](spark, SF).select(
        "chunk_id", "frame_position"
    )

    # three arrival chunks, globally frame_position-ascending (ntile
    # over the full ordering => every stream's frames arrive in
    # position order across batches), built Spark-side
    src = str(tmp_path / "fs_src")
    chunked = frames.withColumn(
        "_chunk",
        F.ntile(3).over(Window.orderBy("frame_position", "chunk_id")),
    )
    for i in range(3):
        part = os.path.join(src, f"part{i}")
        (chunked.where(F.col("_chunk") == i + 1).drop("_chunk")
         .coalesce(1).write.mode("overwrite").parquet(part))
        for root, _dirs, files in os.walk(part):
            for fname in files:
                os.utime(os.path.join(root, fname),
                         (1_000_000 + i, 1_000_000 + i))

    stream = (
        spark.readStream.schema("chunk_id long, frame_position bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "part*"))
    )
    out = frame_sample_stream(
        stream, stream_col="chunk_id", order_col="frame_position",
        every=2,
    )
    q = (
        out.writeStream.format("memory").queryName("fs_stream_bank")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(180)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 3

    got = sorted(
        tuple(r) for r in spark.table("fs_stream_bank")
        .select("chunk_id", "frame_position", "frame_idx").collect()
    )
    want = sorted(
        tuple(r) for r in sample_frames_ordered(
            frames, stream_col="chunk_id", order_col="frame_position",
            every=2,
        ).select("chunk_id", "frame_position", "frame_idx").collect()
    )
    assert got == want and len(got) > 500

    # the r9 gate twin: kvs arithmetic + sampled-index filter
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sql = """
        WITH d AS (
          SELECT doc_id,
                 length(CAST(doc_id AS VARCHAR)) AS idlen,
                 octet_length(encode(CASE WHEN text IS NULL OR text = ''
                                          THEN 'x' ELSE text END)) AS tb,
                 CAST(doc_id % 3 + 1 AS BIGINT) AS nf
          FROM documents),
        f AS (
          SELECT doc_id AS chunk_id,
                 CAST(UNNEST(generate_series(1, nf)) AS INT) AS frame_idx,
                 CAST(100 + idlen
                      + (UNNEST(generate_series(1, nf)) - 1)
                        * (6 + LEAST(16, tb)) AS BIGINT) AS frame_position
          FROM d)
        SELECT chunk_id, frame_position, frame_idx
        FROM f WHERE frame_idx % 2 = 1
    """

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    sout = spark.table("fs_stream_bank").select(
        "chunk_id", "frame_position", "frame_idx"
    )
    cols = sorted(sout.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in sout.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows


def test_rank_fusion_oracle(spark):
    # Banked for r9 as `ext-rank-fusion`: reciprocal-rank fusion of
    # two retrieval lists — exact cosine top-10 and SRP-bucketed ANN
    # top-10 over the same probes — the standard hybrid-search
    # combiner (1/(60+rank) summed per candidate; high-anywhere beats
    # mid-everywhere; incomparable raw scores never compared). Twin =
    # the proven exact/ann CTEs from ext-ann-recall + the RRF
    # arithmetic replayed.
    import math

    import duckdb

    from __spark_entry__ import _sql_cosine, _sql_srp_bucket
    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.similarity import (
        ann_join_srp, deterministic_planes, knn_join_topk, rank_fusion,
    )

    SF = "/root/testdata/sf0.001"
    emb = load_table(spark, "embeddings", SF)
    probes = list(range(8))
    planes = deterministic_planes(64, 8)
    exact = knn_join_topk(
        emb, id_col="vec_id", vec_col="embedding", probe_ids=probes, k=10
    )
    ann = ann_join_srp(
        emb, id_col="vec_id", vec_col="embedding", probe_ids=probes,
        planes=planes, k=10,
    )
    out = rank_fusion(
        [(exact, "knn_rank"), (ann, "ann_rank")], rrf_k=60, top_n=10
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    cos = _sql_cosine("e.embedding", "p.probe_vec")
    cos_c = _sql_cosine("c.embedding", "p.probe_vec")
    sql = f"""
        WITH probes AS (
          SELECT vec_id AS probe_id, embedding AS probe_vec
          FROM embeddings WHERE vec_id BETWEEN 0 AND 7),
        pb AS (
          SELECT probe_id, probe_vec,
                 {_sql_srp_bucket("probe_vec", planes)} AS qbkt
          FROM probes),
        cb AS (
          SELECT vec_id, embedding,
                 {_sql_srp_bucket("embedding", planes)} AS bkt
          FROM embeddings),
        exact AS (
          SELECT p.probe_id, e.vec_id AS neighbor_id,
                 {cos} AS cs,
                 ROW_NUMBER() OVER (PARTITION BY p.probe_id
                   ORDER BY {cos} DESC, e.vec_id) AS r
          FROM embeddings e CROSS JOIN probes p
          WHERE e.vec_id <> p.probe_id
          QUALIFY r <= 10),
        ann AS (
          SELECT p.probe_id, c.vec_id AS neighbor_id,
                 {cos_c} AS cs,
                 ROW_NUMBER() OVER (PARTITION BY p.probe_id
                   ORDER BY {cos_c} DESC, c.vec_id) AS r
          FROM cb c JOIN pb p
            ON (c.bkt = p.qbkt OR bit_count(xor(c.bkt, p.qbkt)) = 1)
          WHERE c.vec_id <> p.probe_id
          QUALIFY r <= 10),
        u AS (
          SELECT probe_id, neighbor_id, 1.0 / (60 + r) AS contrib
          FROM exact
          UNION ALL
          SELECT probe_id, neighbor_id, 1.0 / (60 + r) FROM ann),
        f AS (
          SELECT probe_id, neighbor_id,
                 ROUND(SUM(contrib), 6) AS rrf_score,
                 CAST(COUNT(*) AS BIGINT) AS n_systems
          FROM u GROUP BY 1, 2)
        SELECT probe_id, neighbor_id, rrf_score, n_systems,
               CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
                 ORDER BY rrf_score DESC, neighbor_id) AS BIGINT)
                 AS fused_rank
        FROM f
        QUALIFY fused_rank <= 10
    """

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) == 80

    # RRF semantics: every probe got a full fused top-10; two-system
    # consensus candidates exist and, where present, lead (a leader
    # can be single-system only when the ANN bucket probe missed the
    # exact list entirely for that probe)
    rows = out.collect()
    leaders = [r for r in rows if r["fused_rank"] == 1]
    assert len(leaders) == 8
    assert any(r["n_systems"] == 2 for r in leaders)
    two_sys = [r for r in rows if r["n_systems"] == 2]
    assert two_sys
    # a consensus candidate's score always exceeds the best possible
    # single-system score at the same ranks
    assert all(r["rrf_score"] > 1.0 / 61.0 - 1e-9 for r in two_sys)


def test_pack_sequences_stream_equals_batch_and_oracle(spark, tmp_path):
    # Banked for r9 as `stream-pack-sequences`: stateful streaming
    # per-shard sequence packing — the shard's running token offset
    # (one long) in the state store, documents assigned their
    # training-sequence spans at ARRIVAL. With per-shard id-ordered
    # arrival (3 chunk files, mtimes forcing order) the union must
    # equal batch pack_sequences run per shard, and hash-match the
    # per-shard cumsum twin.
    import math
    import os

    import duckdb

    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.corpus_prep import (
        pack_sequences,
    )
    from awskinesisconsumer_spark.operators.text import token_count
    from awskinesisconsumer_spark.streaming.pipeline import (
        pack_sequences_stream,
    )
    from pyspark.sql import Window

    SF = "/root/testdata/sf0.001"
    docs = token_count(
        load_table(spark, "documents", SF), text_col="text"
    ).select(
        (F.col("doc_id") % 4).alias("shard"), "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
    )

    src = str(tmp_path / "ps_src")
    chunked = docs.withColumn(
        "_chunk", F.ntile(3).over(Window.orderBy("doc_id"))
    )
    for i in range(3):
        part = os.path.join(src, f"part{i}")
        (chunked.where(F.col("_chunk") == i + 1).drop("_chunk")
         .coalesce(1).write.mode("overwrite").parquet(part))
        for root, _dirs, files in os.walk(part):
            for fname in files:
                os.utime(os.path.join(root, fname),
                         (1_000_000 + i, 1_000_000 + i))

    stream = (
        spark.readStream
        .schema("shard long, doc_id long, n_tokens bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "part*"))
    )
    out = pack_sequences_stream(
        stream, shard_col="shard", id_col="doc_id",
        token_col="n_tokens", capacity=128,
    )
    q = (
        out.writeStream.format("memory").queryName("ps_stream_bank")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(180)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 3

    cols = ["shard", "doc_id", "n_tokens", "tok_start", "tok_end",
            "seq_first", "seq_last", "n_seqs"]
    got = sorted(
        tuple(r) for r in spark.table("ps_stream_bank")
        .select(*cols).collect()
    )
    # batch comparator: pack each shard's corpus independently
    want = []
    for s in range(4):
        part = pack_sequences(
            docs.where(F.col("shard") == s),
            id_col="doc_id", token_col="n_tokens", capacity=128,
        ).select(
            F.lit(s).cast("long").alias("shard"), "doc_id", "n_tokens",
            "tok_start", "tok_end", "seq_first", "seq_last", "n_seqs",
        )
        want.extend(tuple(r) for r in part.collect())
    assert got == sorted(want) and len(got) == 500

    # the r9 gate twin: per-shard cumulative sum + span arithmetic
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sql = r"""
        WITH t AS (
          SELECT doc_id % 4 AS shard, doc_id,
                 CAST(CASE WHEN length(trim(COALESCE(text, ''))) = 0
                      THEN 0
                      ELSE len(string_split_regex(
                             trim(COALESCE(text, '')), '\s+'))
                 END AS BIGINT) AS n_tokens
          FROM documents),
        c AS (
          SELECT shard, doc_id, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY shard
                   ORDER BY doc_id) AS tok_end
          FROM t)
        SELECT shard, doc_id, n_tokens,
               tok_end - n_tokens AS tok_start, tok_end,
               (tok_end - n_tokens) // 128 AS seq_first,
               CASE WHEN n_tokens > 0 THEN (tok_end - 1) // 128
                    ELSE (tok_end - n_tokens) // 128 END AS seq_last,
               (CASE WHEN n_tokens > 0 THEN (tok_end - 1) // 128
                     ELSE (tok_end - n_tokens) // 128 END)
                 - ((tok_end - n_tokens) // 128) + 1 AS n_seqs
        FROM c
    """

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    sout = spark.table("ps_stream_bank").select(*cols)
    scols = sorted(sout.columns)
    srows = sorted(tuple(canon(r[c]) for c in scols)
                   for r in sout.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert scols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows


def test_shuffle_order_oracle_and_determinism(spark):
    # Banked + registered in r8 as `ext-shuffle-order`: deterministic
    # global corpus shuffle — pseudorandom-but-reproducible training
    # order (hash-mod shard + within-shard hash rank), the layout
    # step between curation and pack_sequences. Twin replays the
    # portable hash + the per-shard window rank.
    import math

    import duckdb

    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.corpus_prep import (
        shuffle_order,
    )

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", SF)
    out = shuffle_order(docs, id_col="doc_id", n_shards=8)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sql = """
        WITH k AS (
          SELECT doc_id,
                 ('0x' || substr(md5(doc_id::VARCHAR || chr(31)
                                     || 'v1'), 1, 13))::BIGINT
                   AS shuffle_key
          FROM documents)
        SELECT doc_id, shuffle_key,
               CAST(shuffle_key % 8 AS INT) AS shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY shuffle_key % 8
                 ORDER BY shuffle_key, doc_id) AS BIGINT)
                 AS pos_in_shard
        FROM k
    """

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) == 500

    # shuffle semantics: positions are contiguous 1..n per shard,
    # every doc appears once, and the order decorrelates from ingest
    # order (ids adjacent in the corpus land in different shards)
    rows = out.collect()
    assert len({r["doc_id"] for r in rows}) == 500
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    assert set(by_shard) == set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    same_shard_adjacent = sum(
        1 for r in rows for s in rows
        if s["doc_id"] == r["doc_id"] + 1 and s["shard"] == r["shard"]
    )
    assert same_shard_adjacent < 250  # ~1/8 expected, far below half

    # salt change is a fresh epoch: a different permutation
    out2 = shuffle_order(docs, id_col="doc_id", n_shards=8, salt="v2")
    m1 = {r["doc_id"]: (r["shard"], r["pos_in_shard"]) for r in rows}
    m2 = {r["doc_id"]: (r["shard"], r["pos_in_shard"])
          for r in out2.collect()}
    assert m1 != m2 and set(m1) == set(m2)


def test_interleave_mixture_oracle_and_proportions(spark):
    # Banked + registered in r8 as `ext-interleave-mixture`: stride
    # scheduling (weighted fair queueing) as a corpus layout — the
    # step between mixture_allocation (how much of each source) and
    # pack_sequences (packing the ordered stream): WHERE each doc
    # sits. Twin replays hash positions, stride keys, and the merge
    # rank; unlisted sources are excluded by contract.
    import math

    import duckdb

    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.corpus_prep import (
        interleave_mixture,
    )

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", SF)
    weights = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    out = interleave_mixture(
        docs, id_col="doc_id", source_col="source", weights=weights,
        n_shards=4,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sql = """
        WITH w AS (
          SELECT doc_id, source,
                 CASE source WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.3
                             WHEN 'src2' THEN 0.2 WHEN 'src3' THEN 0.1
                 END AS wt,
                 ('0x' || substr(md5(doc_id::VARCHAR || chr(31)
                                     || 'v1'), 1, 13))::BIGINT AS sk
          FROM documents),
        f AS (SELECT * FROM w WHERE wt IS NOT NULL),
        p AS (
          SELECT doc_id, source, wt, sk, CAST(sk % 4 AS INT) AS shard,
                 CAST(ROW_NUMBER() OVER (PARTITION BY source, sk % 4
                   ORDER BY sk, doc_id) AS DOUBLE) AS p
          FROM f),
        k AS (SELECT doc_id, source, shard,
                     (p - 0.5) / wt AS stride_key
              FROM p)
        SELECT doc_id, source, shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard
                 ORDER BY stride_key, source, doc_id) AS BIGINT)
                 AS pos_in_shard,
               ROUND(stride_key, 6) AS stride_key
        FROM k
    """

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) == 100  # 4 sources x 25

    rows = out.collect()
    # unlisted sources excluded
    assert {r["source"] for r in rows} == set(weights)
    # interleaving: within each shard the heaviest source leads the
    # prefix and sources appear spread, not in runs — check that
    # among the first half of every shard, src0 (w=0.4) appears at
    # least as often as src3 (w=0.1)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["pos_in_shard"])
        half = shard_rows[: max(4, len(shard_rows) // 2)]
        n0 = sum(1 for r in half if r["source"] == "src0")
        n3 = sum(1 for r in half if r["source"] == "src3")
        assert n0 >= n3
    # weights must be validated
    import pytest

    with pytest.raises(ValueError, match="positive"):
        interleave_mixture(
            docs, id_col="doc_id", source_col="source",
            weights={"src0": 0.0}, n_shards=2,
        )


def test_layout_corpus_oracle_and_exchange_reuse(spark):
    # Banked + registered in r8 as `ext-layout-corpus`: the composed
    # layout pipeline (token-count -> weighted stride interleave ->
    # per-shard packing in that order). Twin = the interleave chain
    # + one per-shard cumsum in pos order + pack span arithmetic;
    # the pack stage must REUSE the interleave's shard exchange
    # (no new shuffle of the corpus).
    import math

    import duckdb

    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.corpus_prep import (
        layout_corpus,
    )

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", SF)
    weights = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    out = layout_corpus(
        docs, id_col="doc_id", source_col="source", text_col="text",
        weights=weights, n_shards=4, capacity=128,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sql = r"""
        WITH w AS (
          SELECT doc_id, source,
                 CASE source WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.3
                             WHEN 'src2' THEN 0.2 WHEN 'src3' THEN 0.1
                 END AS wt,
                 ('0x' || substr(md5(doc_id::VARCHAR || chr(31)
                                     || 'v1'), 1, 13))::BIGINT AS sk,
                 CAST(CASE WHEN length(trim(COALESCE(text, ''))) = 0
                      THEN 0
                      ELSE len(string_split_regex(
                             trim(COALESCE(text, '')), '\s+'))
                 END AS BIGINT) AS n_tokens
          FROM documents),
        f AS (SELECT * FROM w WHERE wt IS NOT NULL),
        p AS (
          SELECT doc_id, source, wt, sk, n_tokens,
                 CAST(sk % 4 AS INT) AS shard,
                 CAST(ROW_NUMBER() OVER (PARTITION BY source, sk % 4
                   ORDER BY sk, doc_id) AS DOUBLE) AS p
          FROM f),
        k AS (SELECT doc_id, source, shard, n_tokens,
                     (p - 0.5) / wt AS stride_key
              FROM p),
        o AS (
          SELECT doc_id, source, shard, n_tokens,
                 ROUND(stride_key, 6) AS stride_key,
                 CAST(ROW_NUMBER() OVER (PARTITION BY shard
                   ORDER BY stride_key, source, doc_id) AS BIGINT)
                   AS pos_in_shard
          FROM k),
        c AS (
          SELECT *, SUM(n_tokens) OVER (PARTITION BY shard
                      ORDER BY pos_in_shard) AS tok_end
          FROM o)
        SELECT doc_id, source, shard, pos_in_shard, stride_key,
               n_tokens, tok_end - n_tokens AS tok_start, tok_end,
               (tok_end - n_tokens) // 128 AS seq_first,
               CASE WHEN n_tokens > 0 THEN (tok_end - 1) // 128
                    ELSE (tok_end - n_tokens) // 128 END AS seq_last,
               (CASE WHEN n_tokens > 0 THEN (tok_end - 1) // 128
                     ELSE (tok_end - n_tokens) // 128 END)
                 - ((tok_end - n_tokens) // 128) + 1 AS n_seqs
        FROM c
    """

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names), (cols, tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) == 100

    # packing invariant: per shard, token spans tile [0, total] in
    # pos order with no gaps
    rows = sorted(out.collect(), key=lambda r: (r["shard"],
                                                r["pos_in_shard"]))
    from itertools import groupby
    for shard, grp in groupby(rows, key=lambda r: r["shard"]):
        off = 0
        for r in grp:
            assert r["tok_start"] == off
            off = r["tok_end"]

    # exchange reuse: ONE corpus scan, TWO exchanges (positions +
    # merge windows — the pack cumsum rides the merge's shard
    # partitioning), and NO join anywhere (n_tokens is carried
    # through the interleave, not joined back). Fresh plan — an
    # executed AQE plan prints Final + Initial sections and
    # double-counts every node.
    fresh = layout_corpus(
        docs, id_col="doc_id", source_col="source", text_col="text",
        weights=weights, n_shards=4, capacity=128,
    )
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 2
    assert "Join" not in plan


def test_strip_html_adversarial_vs_python_reference(spark):
    # Third-engine check for the strip_html regex chain: Spark (Java
    # regex) vs an independent Python `re` replay of the SAME
    # patterns, over adversarial markup — nested/unterminated tags,
    # script-with-markup payloads, double-escaped entities, entity
    # fragments, mixed whitespace. The DuckDB twin already pins
    # Spark==RE2; this pins intent on the edge inputs.
    import re

    from awskinesisconsumer_spark.operators.text import (
        _HTML_COMMENT_RE, _HTML_ENTITIES, _HTML_SCRIPT_RE,
        _HTML_STYLE_RE, _HTML_TAG_RE, _HTML_WS_RE, strip_html,
    )

    cases = [
        "",
        "plain text no markup",
        "<p>simple</p>",
        "<P CLASS='x'>upper</P>",
        "a < b and c > d",                      # bare angle brackets
        "<unterminated tag with no close",
        "text <b>bold <i>nested</i></b> tail",
        '<script>if (a<b) { document.write("<p>x</p>"); }</script>ok',
        "<style>p > span { color: red }</style>styled",
        "<!-- <b>commented out</b> -->visible",
        "&amp;lt; stays &lt; becomes",
        "&amp;amp; double amp",
        "&nbsp;&nbsp;spaced&nbsp;",
        "&unknown; &#39;q&#39; &#x27;",          # unknown entities survive
        "tabs\tand\nnewlines\r\nand\fforms",
        "<br><br/><br />breaks",
        "<div\nclass='multi\nline'>attr newlines</div>",
        "<<double open>>",
        "<>empty tag<>",
        "<script>no close tag",                  # unterminated script
        "< spaced > not a tag? <real>",
        "&lt;script&gt;escaped script&lt;/script&gt;",
    ]

    def py_ref(s):
        if s is None:
            return None
        t = re.sub(_HTML_SCRIPT_RE, " ", s)
        t = re.sub(_HTML_STYLE_RE, " ", t)
        t = re.sub(_HTML_COMMENT_RE, " ", t)
        t = re.sub(_HTML_TAG_RE, " ", t)
        for ent, rep in _HTML_ENTITIES:
            t = t.replace(ent, rep)
        t = re.sub(_HTML_WS_RE, " ", t)
        return t.strip()

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["text_clean"]
        for r in strip_html(df, text_col="text").collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == py_ref(c), (c, got[i], py_ref(c))


def test_rank_fusion_self_fusion_preserves_order(spark):
    # RRF invariant: fusing a list with ITSELF reproduces its order
    # (scores are a strictly decreasing function of rank), and a
    # candidate's n_systems doubles. Catches accidental
    # score-vs-rank inversions in the fusion arithmetic.
    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.similarity import (
        knn_join_topk, rank_fusion,
    )

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    exact = knn_join_topk(
        emb, id_col="vec_id", vec_col="embedding", probe_ids=[0, 1], k=8
    )
    fused = rank_fusion([(exact, "knn_rank"), (exact, "knn_rank")],
                        rrf_k=60, top_n=8)
    orig = {(r["probe_id"], r["neighbor_id"]): r["knn_rank"]
            for r in exact.collect()}
    for r in fused.collect():
        assert r["n_systems"] == 2
        assert r["fused_rank"] == orig[(r["probe_id"], r["neighbor_id"])]


def test_dedup_recall_audit_gate_parity_and_s_curve(spark):
    # Registered in r8 as `ext-dedup-recall`: the dedup-quality
    # audit — per true-Jaccard bucket, the fraction of exact n-gram
    # near-dup pairs the banded MinHash candidate generator
    # surfaces. The gate fixture injects a Jaccard SPECTRUM (mutated
    # prefix-overlap near-dups) so the recall curve is non-vacuous;
    # parity vs the composed twin + the S-curve shape are asserted.
    import math

    import duckdb

    import __spark_entry__ as entry

    SF = "/root/testdata/sf0.001"
    out = entry.queries()["ext-dedup-recall"](spark, SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(
        entry.oracle_sql()["ext-dedup-recall"]
    ).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows

    rows = {r["bucket_lo"]: r for r in out.collect()}
    # the fixture populates the curve from the S-curve's foot up
    assert len(rows) >= 5
    assert all(0.0 <= r["recall"] <= 1.0 for r in rows.values())
    # high-similarity pairs are (near-)fully caught; the foot is not
    assert rows[max(rows)]["recall"] == 1.0
    assert rows[min(rows)]["recall"] < 0.8
    # recall weakly increases from foot to shoulder (allow plateau)
    ordered = [rows[b]["recall"] for b in sorted(rows)]
    assert ordered[0] <= ordered[-1]


def test_interleave_mixture_stride_fairness_bound(spark):
    # The WFQ fairness invariant: in ANY prefix of a shard's order,
    # each source's count stays within a small constant of
    # prefix_len * weight (stride scheduling's defining property) —
    # while sources still have items to contribute. Synthetic corpus
    # with ample items per source, one shard so the whole order is a
    # single stream.
    from awskinesisconsumer_spark.operators.corpus_prep import (
        interleave_mixture,
    )

    weights = {"a": 0.5, "b": 0.3, "c": 0.2}
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = interleave_mixture(
        df, id_col="doc_id", source_col="source", weights=weights,
        n_shards=1,
    )
    ordered = [r["source"] for r in sorted(
        out.collect(), key=lambda r: r["pos_in_shard"]
    )]
    # all sources have 100 items; check prefixes while none depleted:
    # the heaviest source (0.5) depletes first around position 200
    counts = {s: 0 for s in weights}
    for pos, src in enumerate(ordered[:190], start=1):
        counts[src] += 1
        for s, w in weights.items():
            assert abs(counts[s] - pos * w) <= 2.0, (
                pos, s, counts[s], pos * w
            )


def test_split_sentences_oracle(spark):
    # Banked for r9 as `ext-sentence-split`: regex-rule sentence
    # segmentation (terminal [.!?] + whitespace; RE2-portable
    # mark-then-split, no lookbehind). The corpus has no punctuation,
    # so the fixture joins each doc's words into chunks of
    # (doc_id % 5 + 3) words terminated by a cycling [. ! ?] — real
    # multi-sentence docs, engine-replayable. %19 docs go NULL.
    import math

    import duckdb

    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.text import split_sentences

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", SF)
    words = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    csz = (F.col("doc_id") % 5 + 3).cast("int")
    n_chunks = F.greatest(
        F.ceil(F.size(words) / csz).cast("int"), F.lit(1)
    )
    sentenced = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_chunks),
            lambda i: F.concat(
                F.concat_ws(
                    " ", F.slice(words, (i - 1) * csz + 1, csz)
                ),
                F.element_at(
                    F.array(F.lit("."), F.lit("!"), F.lit("?")),
                    (i % 3) + 1,
                ),
            ),
        ),
        " ",
    )
    fixture = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 19 == 0, F.lit(None).cast("string"))
        .otherwise(sentenced).alias("text"),
    )
    out = split_sentences(fixture, id_col="doc_id", text_col="text")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sql = r"""
        WITH base AS (
          SELECT doc_id,
                 string_split(COALESCE(text, ''), ' ') AS ws,
                 CAST(doc_id % 5 + 3 AS INT) AS csz
          FROM documents),
        nch AS (
          SELECT doc_id, ws, csz,
                 GREATEST(CAST(CEIL(len(ws) / CAST(csz AS DOUBLE))
                               AS INT), 1) AS n_chunks
          FROM base),
        fix AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 19 = 0 THEN NULL ELSE
                   array_to_string(
                     list_transform(range(1, n_chunks + 1), i ->
                       array_to_string(
                         ws[(i - 1) * csz + 1 : i * csz], ' ')
                       || ['.', '!', '?'][(i % 3) + 1]),
                     ' ')
                 END AS text
          FROM nch),
        marked AS (
          SELECT doc_id,
                 regexp_replace(text, '([.!?])[ \t\r\n\f]+',
                                '\1' || chr(30), 'g') AS m
          FROM fix),
        parts AS (
          SELECT doc_id, string_split(m, chr(30)) AS ps
          FROM marked WHERE m IS NOT NULL),
        ex AS (
          SELECT doc_id,
                 CAST(i - 1 AS INT) AS sent_idx,
                 trim(ps[i]) AS sentence
          FROM parts, UNNEST(generate_series(1, len(ps))) AS u(i))
        SELECT doc_id, sent_idx, sentence
        FROM ex WHERE length(sentence) > 0
    """

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) > 2000

    # semantics: punctuation stays attached; indices contiguous per
    # doc; NULL docs yield nothing
    rows = out.collect()
    assert all(r["sentence"][-1] in ".!?" for r in rows)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["sent_idx"])
    for idxs in by_doc.values():
        assert sorted(idxs) == list(range(len(idxs)))
    assert 0 not in by_doc and 19 not in by_doc


def test_pack_nofragment_oracle_and_invariants(spark):
    # Banked for r9 as `ext-pack-nofragment`: document-preserving
    # next-fit packing per shard (doc never straddles; zero-token
    # docs never open a sequence; oversized docs get a dedicated
    # sequence). Twin replays the sequential fold as a per-shard
    # recursive CTE advancing one doc per step.
    import math

    import duckdb

    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.corpus_prep import (
        pack_nofragment,
    )
    from awskinesisconsumer_spark.operators.text import token_count

    SF = "/root/testdata/sf0.001"
    docs = token_count(
        load_table(spark, "documents", SF), text_col="text"
    ).select(
        (F.col("doc_id") % 4).alias("shard"), "doc_id",
        # inject a zero-token (%17) and an oversized (%23) doc so
        # both special rules gate
        F.when(F.col("doc_id") % 17 == 0, F.lit(0))
        .when(F.col("doc_id") % 23 == 0, F.lit(500))
        .otherwise(F.col("n_tokens")).cast("bigint").alias("n_tokens"),
    )
    out = pack_nofragment(
        docs, shard_col="shard", id_col="doc_id",
        token_col="n_tokens", capacity=128,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sql = r"""
        WITH RECURSIVE toks AS MATERIALIZED (
          SELECT doc_id % 4 AS shard, doc_id,
                 CAST(CASE WHEN doc_id % 17 = 0 THEN 0
                           WHEN doc_id % 23 = 0 THEN 500
                           ELSE CASE WHEN length(trim(COALESCE(text,
                                       ''))) = 0 THEN 0
                                ELSE len(string_split_regex(
                                       trim(COALESCE(text, '')),
                                       '\s+')) END
                      END AS BIGINT) AS n_tokens,
                 ROW_NUMBER() OVER (PARTITION BY doc_id % 4
                                    ORDER BY doc_id) AS rn
          FROM documents),
        st AS (
          SELECT shard, rn, doc_id, n_tokens,
                 CAST(0 AS BIGINT) AS seq_idx,
                 CAST(0 AS BIGINT) AS offset_in_seq,
                 n_tokens AS fill
          FROM toks WHERE rn = 1
          UNION ALL
          SELECT t.shard, t.rn, t.doc_id, t.n_tokens,
                 CASE WHEN st.fill > 0 AND t.n_tokens > 0
                           AND st.fill + t.n_tokens > 128
                      THEN st.seq_idx + 1 ELSE st.seq_idx END,
                 CASE WHEN st.fill > 0 AND t.n_tokens > 0
                           AND st.fill + t.n_tokens > 128
                      THEN 0 ELSE st.fill END,
                 CASE WHEN st.fill > 0 AND t.n_tokens > 0
                           AND st.fill + t.n_tokens > 128
                      THEN t.n_tokens
                      ELSE st.fill + t.n_tokens END
          FROM st JOIN toks t
            ON t.shard = st.shard AND t.rn = st.rn + 1)
        SELECT shard, doc_id, n_tokens, seq_idx, offset_in_seq
        FROM st
    """

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) == 500

    # invariants: no doc straddles (offset + tokens <= capacity
    # unless the doc alone exceeds it); sequences are contiguous
    # per shard; zero-token docs never sit at offset 0 of a fresh
    # non-first sequence they opened
    rows = sorted(out.collect(), key=lambda r: (r["shard"], r["doc_id"]))
    from itertools import groupby
    for shard, grp in groupby(rows, key=lambda r: r["shard"]):
        grp = list(grp)
        seqs = [r["seq_idx"] for r in grp]
        assert seqs[0] == 0 and all(
            b - a in (0, 1) for a, b in zip(seqs, seqs[1:])
        )
        for r in grp:
            if 0 < r["n_tokens"] <= 128:
                assert r["offset_in_seq"] + r["n_tokens"] <= 128
            elif r["n_tokens"] > 128:
                assert r["offset_in_seq"] == 0  # dedicated sequence
            # zero-token docs attach at the current fill (no space,
            # no constraint — may trail an oversized doc)


def test_tokenizer_fertility_oracle(spark):
    # Banked for r9 as `ext-tokenizer-fertility`: BPE tokens-per-word
    # by language — the multilingual tokenizer-choice audit,
    # completing train -> encode -> coverage -> fertility. Twin wraps
    # the proven encode oracle (v10 vocab state) in the per-group
    # rollup.
    import math

    import duckdb

    from __spark_entry__ import _bpe_oracle_sql
    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.text import (
        bpe_train_merges, tokenizer_fertility,
    )

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", SF)
    trained = bpe_train_merges(docs, text_col="text", n_merges=10)
    rows = trained.orderBy("rank").collect()
    assert len(rows) == 10 and min(r["pair_count"] for r in rows) >= 2
    merges = [(r["left"], r["right"]) for r in rows]

    out = tokenizer_fertility(
        docs, id_col="doc_id", text_col="text", group_col="lang",
        merges=merges,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sql = f"""
        SELECT d.lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(e.n_words) AS BIGINT) AS n_words,
               CAST(SUM(e.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
               CASE WHEN SUM(e.n_words) > 0
                    THEN ROUND(SUM(e.n_bpe_tokens)
                               / CAST(SUM(e.n_words) AS DOUBLE), 4)
               END AS fertility
        FROM ({_bpe_oracle_sql(10, encode=True)}) e
        JOIN documents d USING (doc_id)
        GROUP BY d.lang
    """

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) >= 3

    # fertility is a tokens-per-word ratio: > 1 always (</w> alone
    # guarantees one token per word), finite, and every lang present
    vals = {r["lang"]: r["fertility"] for r in out.collect()}
    assert all(v is not None and v > 1.0 for v in vals.values())


def test_whiten_embeddings_oracle(spark):
    # Banked for r9 as `ext-embedding-whiten`: per-dimension
    # z-scoring before cosine ANN — 6-dp stats collected (dim-sized,
    # the centroid-table pattern) and baked into a map-only
    # transform; long-format output. Twin replays stats + normalize.
    import math

    import duckdb

    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.similarity import (
        whiten_embeddings,
    )

    SF = "/root/testdata/sf0.001"
    emb = load_table(spark, "embeddings", SF)
    out = whiten_embeddings(emb, id_col="vec_id", vec_col="embedding")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    sql = """
        WITH ex AS (
          SELECT vec_id, i - 1 AS dim,
                 CAST(embedding[i] AS DOUBLE) AS v
          FROM embeddings,
               (SELECT UNNEST(generate_series(1, 64)) AS i)),
        stats AS (
          SELECT dim, ROUND(AVG(v), 6) AS m,
                 ROUND(STDDEV_SAMP(v), 6) AS s
          FROM ex GROUP BY 1)
        SELECT vec_id, dim,
               ROUND(CASE WHEN s > 0 THEN (v - m) / s
                          ELSE 0.0 END, 6) AS white_val
        FROM ex JOIN stats USING (dim)
    """

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) == 500 * 64

    # whitening property: each dim is ~zero-mean unit-variance after
    from collections import defaultdict
    vals = defaultdict(list)
    for r in out.collect():
        vals[r["dim"]].append(r["white_val"])
    import statistics
    for d in (0, 31, 63):
        assert abs(statistics.mean(vals[d])) < 1e-3
        assert abs(statistics.stdev(vals[d]) - 1.0) < 1e-2


def test_expand_mixture_epochs_oracle(spark):
    # Banked for r9 as `ext-mixture-expand`: materialize per-source
    # epoch repetition — floor(epochs) always, +1 for a
    # deterministic hash-gated fraction; sources absent default 1,
    # epochs 0 drops. Twin replays the when-chain, gate, and
    # generate_series explode.
    import math

    import duckdb

    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.corpus_prep import (
        expand_mixture_epochs,
    )
    from awskinesisconsumer_spark.operators.dedup import portable_hash52

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", SF).select("doc_id", "source")
    epochs = {"src0": 2.3, "src1": 0.0, "src2": 1.0, "src3": 0.4}
    out = expand_mixture_epochs(
        docs, id_col="doc_id", source_col="source", epochs=epochs,
        hash_fn=portable_hash52,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sql = """
        WITH e AS (
          SELECT doc_id, source,
                 CAST(CASE source
                      WHEN 'src0' THEN 2.3 WHEN 'src1' THEN 0.0
                      WHEN 'src2' THEN 1.0 WHEN 'src3' THEN 0.4
                      ELSE 1.0 END AS DOUBLE) AS ep,
                 ('0x' || substr(md5(doc_id::VARCHAR || chr(31)
                                     || 'v1'), 1, 13))::BIGINT
                   % 1000000 AS gate
          FROM documents),
        n AS (
          SELECT doc_id, source,
                 CAST(FLOOR(ep) AS BIGINT)
                   -- DOUBLE + TRUNC replays Spark's truncating cast
                   -- (2.3 - 2.0 -> threshold 299999, not 300000)
                   + CASE WHEN gate < CAST(TRUNC((ep - FLOOR(ep))
                                           * 1000000) AS BIGINT)
                          THEN 1 ELSE 0 END AS n_rep
          FROM e)
        SELECT doc_id, source,
               CAST(UNNEST(generate_series(0, n_rep - 1)) AS INT)
                 AS repeat_idx
        FROM n WHERE n_rep > 0
    """

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows

    # semantics: src1 fully dropped; src2 exactly once; src0 repeated
    # 2-3x converging to 2.3x; unlisted sources once; determinism
    from collections import Counter
    per_src = Counter(r["source"] for r in out.collect())
    assert "src1" not in per_src
    assert per_src["src2"] == 25
    assert 2 * 25 <= per_src["src0"] <= 3 * 25
    assert per_src["src4"] == 25  # unlisted default 1
    reps = Counter(r["doc_id"] for r in out.collect()
                   if r["source"] == "src0")
    assert set(reps.values()) <= {2, 3}


def test_expand_mixture_epochs_streaming_native(spark, tmp_path):
    # expand_mixture_epochs is map-only + explode — legal in a
    # streaming SELECT as-is, no wrapper operator needed. Prove the
    # 3-batch streaming union equals the batch expansion (per-row
    # determinism => chunking-invariant).
    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.corpus_prep import (
        expand_mixture_epochs,
    )
    from awskinesisconsumer_spark.operators.dedup import portable_hash52

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", SF).select("doc_id", "source")
    epochs = {"src0": 2.3, "src1": 0.0, "src2": 1.0, "src3": 0.4}

    src = str(tmp_path / "me_src")
    docs.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, source string")
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    out = expand_mixture_epochs(
        stream, id_col="doc_id", source_col="source", epochs=epochs,
        hash_fn=portable_hash52,
    )
    q = (
        out.writeStream.format("memory").queryName("me_stream_bank")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(180)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 3

    got = sorted(tuple(r) for r in spark.table("me_stream_bank").collect())
    want = sorted(
        tuple(r) for r in expand_mixture_epochs(
            docs, id_col="doc_id", source_col="source", epochs=epochs,
            hash_fn=portable_hash52,
        ).collect()
    )
    assert got == want and len(got) > 400


def test_whiten_with_frozen_stats_streaming_native(spark, tmp_path):
    # The frozen-calibration split: stats from the even vec_id half,
    # applied to the odd half arriving as a 3-batch stream — union
    # must equal the batch application (map-only, per-row
    # deterministic), the quality-blend-stream contract for
    # embeddings.
    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.similarity import (
        whiten_embeddings_with_stats, whitening_stats,
    )

    SF = "/root/testdata/sf0.001"
    emb = load_table(spark, "embeddings", SF)
    reference = emb.where(F.col("vec_id") % 2 == 0)
    arriving = emb.where(F.col("vec_id") % 2 == 1).select(
        "vec_id", "embedding"
    )
    stats = whitening_stats(reference, vec_col="embedding")

    src = str(tmp_path / "wh_src")
    arriving.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    out = whiten_embeddings_with_stats(
        stream, id_col="vec_id", vec_col="embedding", stats=stats
    )
    q = (
        out.writeStream.format("memory").queryName("wh_stream_bank")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(180)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 3

    got = sorted(tuple(r) for r in spark.table("wh_stream_bank").collect())
    want = sorted(
        tuple(r) for r in whiten_embeddings_with_stats(
            arriving, id_col="vec_id", vec_col="embedding", stats=stats
        ).collect()
    )
    assert got == want and len(got) == 250 * 64


def test_simhash_near_dup_pairs_oracle_and_losslessness(spark):
    # Banked for r9 as `ext-dedup-simhash-pairs`: Hamming-banded
    # SimHash near-dup pairs (pigeonhole construction) — candidate
    # generation is LOSSLESS for hamming <= bands-1, unlike MinHash
    # banding. Twin replays fingerprints, banding, the band join,
    # and bit_count verify; a brute-force all-pairs check proves
    # completeness at test scale.
    import math

    import duckdb

    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.dedup import (
        portable_hash52, simhash_near_dup_pairs,
    )

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", SF)
    out = simhash_near_dup_pairs(
        docs, id_col="doc_id", text_col="text", bits=16,
        max_hamming=3, bands=4, hash_fn=portable_hash52,
    )

    p52 = "('0x' || substr(md5({x}), 1, 13))::BIGINT"
    votes = ",\n                   ".join(
        f"SUM(CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END)"
        f" AS b{i}" for i in range(16)
    )
    fp = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(16)
    )
    bands_sql = "\n              UNION ALL\n              ".join(
        f"SELECT doc_id, fp, {i} AS band_idx,"
        f" (fp >> {i * 4}) & 15 AS band_val FROM sig"
        for i in range(4)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sql = f"""
        WITH w AS (
          SELECT doc_id,
            CASE WHEN text IS NULL OR length(trim(text)) = 0
                 THEN CAST([] AS VARCHAR[])
                 ELSE string_split_regex(trim(lower(text)), '\\s+') END
              AS ws
          FROM documents),
        tok AS (SELECT doc_id, UNNEST(ws) AS t FROM w),
        hashed AS (
          SELECT doc_id, {p52.format(x='t')} AS h FROM tok
          WHERE t <> ''),
        v AS (SELECT doc_id,
                   {votes}
              FROM hashed GROUP BY doc_id),
        sig AS (SELECT doc_id, CAST({fp} AS BIGINT) AS fp FROM v),
        banded AS (
              {bands_sql}),
        hot AS (SELECT band_idx, band_val FROM banded
                GROUP BY 1, 2 HAVING COUNT(*) > 200),
        kept AS (
          SELECT bd.* FROM banded bd
          LEFT JOIN hot ON bd.band_idx = hot.band_idx
                       AND bd.band_val = hot.band_val
          WHERE hot.band_idx IS NULL),
        cand AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
                 l.fp AS fa, r.fp AS fb
          FROM kept l JOIN kept r
            ON l.band_idx = r.band_idx AND l.band_val = r.band_val
           AND l.doc_id < r.doc_id)
        SELECT id_a, id_b,
               CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(fa, fb)) <= 3
    """

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) > 100

    # pigeonhole losslessness: if no band bucket hit the hot cap,
    # the banded pair set must EQUAL the brute-force all-pairs set
    hot_hit = con.execute(f"""
        WITH w AS (
          SELECT doc_id,
            CASE WHEN text IS NULL OR length(trim(text)) = 0
                 THEN CAST([] AS VARCHAR[])
                 ELSE string_split_regex(trim(lower(text)), '\\s+') END
              AS ws
          FROM documents),
        tok AS (SELECT doc_id, UNNEST(ws) AS t FROM w),
        hashed AS (SELECT doc_id, {p52.format(x='t')} AS h FROM tok
                   WHERE t <> ''),
        v AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id),
        sig AS (SELECT doc_id, CAST({fp} AS BIGINT) AS fp FROM v),
        banded AS ({bands_sql})
        SELECT COUNT(*) FROM (
          SELECT band_idx, band_val FROM banded
          GROUP BY 1, 2 HAVING COUNT(*) > 200)
    """).fetchone()[0]
    assert hot_hit == 0
    brute = con.execute(f"""
        WITH w AS (
          SELECT doc_id,
            CASE WHEN text IS NULL OR length(trim(text)) = 0
                 THEN CAST([] AS VARCHAR[])
                 ELSE string_split_regex(trim(lower(text)), '\\s+') END
              AS ws
          FROM documents),
        tok AS (SELECT doc_id, UNNEST(ws) AS t FROM w),
        hashed AS (SELECT doc_id, {p52.format(x='t')} AS h FROM tok
                   WHERE t <> ''),
        v AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id),
        sig AS (SELECT doc_id, CAST({fp} AS BIGINT) AS fp FROM v)
        SELECT a.doc_id, b.doc_id,
               CAST(bit_count(xor(a.fp, b.fp)) AS INT)
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.fp, b.fp)) <= 3
    """).fetchall()
    # srows tuples follow sorted(column names) = (hamming, id_a, id_b)
    assert sorted(
        (canon(r[2]), canon(r[0]), canon(r[1])) for r in brute
    ) == srows
