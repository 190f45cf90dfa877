"""Round-8 additions: ADVICE fixes (partition-spelling-preserving
compaction, per-attempt PNG sink temp names, atomic corpus-drift
stream publish + release handle, histogram degenerate-signal
validation, quality-blend degenerate-cut oracle guard) and the fused
one-scan domain_cap_topk totals.
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
