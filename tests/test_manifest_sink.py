"""Commit-protocol tests for the manifest-jsonl DSv2 writer: the
manifest is the source of truth (stale shards invisible), and abort
sweeps temp shards without touching committed data."""

from __future__ import annotations

import json
import os

from awskinesisconsumer_spark.sources.manifest_sink import (
    MANIFEST,
    ManifestJsonlWriter,
    _ShardCommit,
    read_manifest,
    register,
)


def test_append_merges_manifest_overwrite_replaces(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "sink")
    df1 = spark.range(0, 100).selectExpr("id", "CAST(id AS STRING) AS s")
    df1.write.format("manifest-jsonl").option("path", out).mode(
        "append"
    ).save()
    first = read_manifest(out)
    assert first["total_rows"] == 100
    # An orphan shard (crashed task of some other attempt) must never
    # become visible: it is not in any manifest.
    with open(os.path.join(out, "part-orphan.jsonl"), "w") as f:
        f.write(json.dumps({"id": 999999, "s": "ghost"}) + "\n")
    df2 = spark.range(100, 150).selectExpr("id", "CAST(id AS STRING) AS s")
    df2.write.format("manifest-jsonl").option("path", out).mode(
        "append"
    ).save()
    # append MERGES the prior manifest: both writes are visible.
    man = read_manifest(out)
    assert man["total_rows"] == 150
    paths = [os.path.join(out, s["file"]) for s in man["shards"]]
    assert all("orphan" not in p for p in paths)
    back = spark.read.schema("id long, s string").json(paths)
    assert sorted(r.id for r in back.collect()) == list(range(150))
    # The orphan still exists on disk but only the manifest decides
    # visibility.
    assert sum(
        1 for f in os.listdir(out) if f.endswith(".jsonl")
    ) > len(man["shards"])
    # overwrite REPLACES the manifest and sweeps the replaced shards.
    df3 = spark.range(500, 520).selectExpr("id", "CAST(id AS STRING) AS s")
    df3.write.format("manifest-jsonl").option("path", out).mode(
        "overwrite"
    ).save()
    man = read_manifest(out)
    assert man["total_rows"] == 20
    for s in first["shards"]:
        assert not os.path.exists(os.path.join(out, s["file"]))
    paths = [os.path.join(out, s["file"]) for s in man["shards"]]
    back = spark.read.schema("id long, s string").json(paths)
    assert sorted(r.id for r in back.collect()) == list(range(500, 520))


def test_abort_removes_temp_shards_only(tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    out = str(tmp_path / "sink2")
    os.makedirs(out)
    committed = os.path.join(out, "part-keep.jsonl")
    with open(committed, "w") as f:
        f.write("{}\n")
    tmp = os.path.join(out, "part-dead.jsonl.tmp")
    with open(tmp, "w") as f:
        f.write("{}\n")
    w = ManifestJsonlWriter(
        {"path": out}, StructType([StructField("id", LongType())])
    )
    w.abort([_ShardCommit(tmp, os.path.join(out, "part-dead.jsonl"), 1)])
    assert not os.path.exists(tmp)
    assert os.path.exists(committed)
    # Aborting again is idempotent (file already gone).
    w.abort([_ShardCommit(tmp, os.path.join(out, "part-dead.jsonl"), 1)])


def test_manifest_written_last(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "sink3")
    spark.range(0, 10).write.format("manifest-jsonl").option(
        "path", out
    ).mode("append").save()
    # No stray manifest temp, exactly one manifest, totals consistent.
    assert not os.path.exists(os.path.join(out, MANIFEST + ".tmp"))
    man = read_manifest(out)
    n = 0
    for s in man["shards"]:
        with open(os.path.join(out, s["file"])) as f:
            n += sum(1 for _ in f)
    assert n == man["total_rows"] == 10


def test_stream_epoch_commit_is_idempotent(tmp_path):
    # A replayed epoch REPLACES its manifest slot: the retry's shard
    # set wins, first-attempt shards fall out of visibility, totals
    # never double-count.
    from pyspark.sql.types import LongType, StructField, StructType

    from awskinesisconsumer_spark.sources.manifest_sink import (
        ManifestJsonlStreamWriter, read_manifest,
    )

    out = str(tmp_path / "stream_sink")
    os.makedirs(out)
    schema = StructType([StructField("id", LongType())])
    w = ManifestJsonlStreamWriter({"path": out}, schema)

    def fake_shard(name, rows):
        tmp = os.path.join(out, name + ".tmp")
        with open(tmp, "w") as f:
            for i in range(rows):
                f.write(json.dumps({"id": i}) + "\n")
        return _ShardCommit(tmp, os.path.join(out, name), rows)

    w.commit([fake_shard("part-e0.jsonl", 5)], batchId=0)
    w.commit([fake_shard("part-e1a.jsonl", 3)], batchId=1)
    # Epoch 1 replays with a different shard (task retry after crash).
    w.commit([fake_shard("part-e1b.jsonl", 3)], batchId=1)
    man = read_manifest(out)
    assert man["total_rows"] == 8
    files = [s["file"] for s in man["shards"]]
    assert files == ["part-e0.jsonl", "part-e1b.jsonl"]
    # The superseded attempt's shard may exist on disk but is not
    # visible through the manifest.
    assert os.path.exists(os.path.join(out, "part-e1a.jsonl"))
