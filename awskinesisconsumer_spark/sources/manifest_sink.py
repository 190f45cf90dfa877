"""`manifest-jsonl` — a Python DataSource (Spark 4 DataSourceV2 API)
WRITER with a two-phase commit protocol, the sink-side twin of the
`kvs-replay` source (SURVEY §2 rows 16-17 generalized).

Why it exists: the reference's file sink writes frames one PNG at a
time with no atomicity (parser.py:483-485) — a crashed run leaves a
half-written directory indistinguishable from a complete one. The
Spark-native answer is the DSv2 commit protocol:

* each write TASK streams its partition to a `*.tmp` shard and
  returns a commit message (shard name, row count) — nothing is
  visible yet;
* the driver's `commit()` renames every shard into place and writes
  `_MANIFEST.json` (shard list + totals) LAST, so readers that
  consult the manifest see either the whole dataset or nothing;
* `abort()` removes the temp shards, leaving prior committed data
  untouched.

Speculative/retried tasks are safe: a task's shard only becomes
visible if ITS commit message reaches `commit()` — a duplicate
attempt's `.tmp` file is never renamed and is swept by `abort()`.

Local-filesystem rename stands in for the object-store finalize;
the protocol shape (task message -> driver commit -> manifest-last)
is exactly what production table formats build on.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

MANIFEST = "_MANIFEST.json"


class _ShardCommit(WriterCommitMessage):
    def __init__(self, tmp_name: str, final_name: str, n_rows: int):
        self.tmp_name = tmp_name
        self.final_name = final_name
        self.n_rows = n_rows


class ManifestJsonlWriter(DataSourceWriter):
    def __init__(self, options, schema: StructType, overwrite: bool = False):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest-jsonl requires option('path', ...)")
        self.fields = schema.fieldNames()
        self.overwrite = overwrite

    def write(self, rows: Iterator) -> _ShardCommit:
        os.makedirs(self.path, exist_ok=True)
        shard = f"part-{uuid.uuid4().hex}.jsonl"
        tmp = os.path.join(self.path, shard + ".tmp")
        n = 0
        with open(tmp, "w") as f:
            for row in rows:
                f.write(json.dumps(
                    {k: row[i] for i, k in enumerate(self.fields)},
                    default=str,
                ))
                f.write("\n")
                n += 1
        return _ShardCommit(tmp, os.path.join(self.path, shard), n)

    def commit(self, messages) -> None:
        # mode semantics: append MERGES the prior manifest's shard
        # list (old data stays visible alongside the new shards);
        # overwrite REPLACES it and sweeps the replaced shard files
        # AFTER the new manifest is in place, so manifest readers see
        # old-complete -> new-complete with no intermediate state.
        shards = []
        for m in messages:
            os.rename(m.tmp_name, m.final_name)
            shards.append(
                {"file": os.path.basename(m.final_name), "rows": m.n_rows}
            )
        mpath = os.path.join(self.path, MANIFEST)
        prior: list[dict] = []
        if os.path.exists(mpath):
            with open(mpath) as f:
                prior = json.load(f).get("shards", [])
        merged = shards if self.overwrite else prior + shards
        manifest = {
            "shards": sorted(merged, key=lambda s: s["file"]),
            "total_rows": sum(s["rows"] for s in merged),
        }
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, mpath)
        if self.overwrite:
            keep = {s["file"] for s in merged}
            for s in prior:
                if s["file"] not in keep:
                    try:
                        os.remove(os.path.join(self.path, s["file"]))
                    except FileNotFoundError:
                        pass

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_name)
            except FileNotFoundError:
                pass


class ManifestJsonlStreamWriter(DataSourceStreamWriter):
    """Streaming form: one commit per EPOCH, keyed by batchId in the
    manifest — `epochs[batchId] = shards` is a REPLACE, so a replayed
    epoch (restart mid-batch) commits idempotently: the retry's
    shards take the slot, the orphaned first-attempt shards are never
    in any manifest and stay invisible. This is the
    idempotent-sink-by-batchId pattern Structured Streaming's
    exactly-once story is built on."""

    def __init__(self, options, schema: StructType):
        self._w = ManifestJsonlWriter(options, schema)
        self.path = self._w.path

    def write(self, iterator: Iterator) -> _ShardCommit:
        return self._w.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        shards = []
        for m in messages:
            os.rename(m.tmp_name, m.final_name)
            shards.append(
                {"file": os.path.basename(m.final_name), "rows": m.n_rows}
            )
        mpath = os.path.join(self.path, MANIFEST)
        manifest = {"epochs": {}}
        if os.path.exists(mpath):
            with open(mpath) as f:
                manifest = json.load(f)
            manifest.setdefault("epochs", {})
        manifest["epochs"][str(batchId)] = sorted(
            shards, key=lambda s: s["file"]
        )
        manifest["shards"] = [
            s for _, ss in sorted(manifest["epochs"].items(),
                                  key=lambda kv: int(kv[0]))
            for s in ss
        ]
        manifest["total_rows"] = sum(s["rows"] for s in manifest["shards"])
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, mpath)

    def abort(self, messages, batchId: int) -> None:
        self._w.abort(messages)


class ManifestJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest-jsonl"

    def writer(self, schema: StructType, overwrite: bool):
        return ManifestJsonlWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return ManifestJsonlStreamWriter(self.options, schema)


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)


def register(spark) -> None:
    spark.dataSource.register(ManifestJsonlDataSource)
