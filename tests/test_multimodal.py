"""Multimodal plumbing tests: binary payload column + metadata struct,
Arrow round-trips, frame sampling, resize stub, audio-feature stub."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from awskinesisconsumer_spark.io import load_table
from awskinesisconsumer_spark.operators.explode import decode_explode
from awskinesisconsumer_spark.operators.multimodal import (
    decode_frames,
    extract_audio_features,
    resize_frames,
    sample_frames,
    to_binary_payload,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def payloads(spark):
    docs = load_table(spark, "documents", SF)
    return to_binary_payload(docs, id_col="doc_id", text_col="text")


def test_decode_frames_schema_and_dims(spark, payloads):
    out = decode_frames(payloads)
    rows = out.collect()
    assert len(rows) == payloads.count()
    for r in rows[:20]:
        assert r.n_bytes == (len(r.payload) if r.payload else 0)
        assert 1 <= r.height <= 480 and 1 <= r.width <= 640
        assert r.channels == 3 and r.format == "bgr24"


def test_real_codec_is_explicitly_stubbed(spark, payloads):
    with pytest.raises(NotImplementedError):
        decode_frames(payloads, real_codec=True)
    with pytest.raises(NotImplementedError):
        resize_frames(decode_frames(payloads), height=2, width=2, real_codec=True)


def test_sample_and_resize_pipeline(spark, payloads):
    frames = decode_explode(
        decode_frames(payloads),
        track_filter=F.lit(True),
        n_frames=F.pmod(F.col("n_bytes"), F.lit(6)) + 1,
    )
    sampled = sample_frames(frames, seq_col="frame_seq", every_k=2)
    # every_k=2 keeps exactly the even seqs
    assert sampled.where(F.pmod("frame_seq", F.lit(2)) != 0).count() == 0
    resized = resize_frames(sampled, height=224, width=224)
    row = resized.head()
    assert row.height == 224 and row.width == 224
    assert row.format.endswith("-resized")


def test_audio_features_deterministic(spark, payloads):
    out = extract_audio_features(payloads, window_bytes=64)
    rows = {r.doc_id: r for r in out.collect()}
    # spot-check one doc against a direct python computation
    docs = {r.doc_id: r.text for r in
            load_table(spark, "documents", SF).collect()}
    did = next(iter(rows))
    b = docs[did].encode()
    want_mean = (sum(b) / len(b)) if b else 0.0  # unrounded: exact IEEE division
    assert rows[did].mean_byte == want_mean
    assert rows[did].n_windows == max(1, (len(b) + 63) // 64)
