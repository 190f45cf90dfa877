"""Pipeline lifecycle + observability (SURVEY §2 rows 20-24).

* `flow-pause-resume` (ref parser.py:514-523): StopCatchFrames/
  StartCatchFrames == stop the query / restart from the same
  checkpoint. The offset log guarantees no loss or duplication across
  the gap — strictly stronger than the reference's boolean gate, which
  silently drops frames while paused.
* `backpressure-pipe` (ref parser.py:250-252): the blocking FIFO
  becomes per-trigger admission control (maxFilesPerTrigger /
  maxOffsetsPerTrigger) — the source never outruns the sink.
* `recover-restart` (ref parser.py:178-269): a bounded-retry restart
  loop around start(); Spark's checkpoint makes each retry resume, so
  the retry budget only spends on *real* failures — the reference's
  renewal-vs-failure classification (parser.py:382-385) falls away.
* `lifecycle-dispose` (ref parser.py:62-121): context manager that
  stops queries with a grace timeout.
* `log-observability` (ref logger.py): a StreamingQueryListener
  collecting per-batch progress (rows, durations) — the structured
  replacement for the rotating-file logger.
"""

from __future__ import annotations

import threading
import time

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.listener import StreamingQueryListener


class ProgressListener(StreamingQueryListener):
    """Collects micro-batch progress events (row counts, durations) —
    queryable in-process, the analogue of the reference's throughput
    log loop (parser.py:566-577)."""

    def __init__(self) -> None:
        self.progress: list[dict] = []
        self._lock = threading.Lock()

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        observed = {}
        try:
            observed = {
                name: row.asDict() for name, row in p.observedMetrics.items()
            }
        except Exception:
            pass
        with self._lock:
            self.progress.append({
                "id": str(p.id),
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "durationMs": dict(p.durationMs) if p.durationMs else {},
                "observed": observed,
            })

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def total_rows(self) -> int:
        with self._lock:
            return sum(p["numInputRows"] for p in self.progress)

    def observed_totals(self, metric_name: str) -> dict[str, int]:
        """Sum each observed-metric column across batches (e.g. the
        frame_pipeline's n_events/n_errors counters, row 24)."""
        totals: dict[str, int] = {}
        with self._lock:
            for p in self.progress:
                for col, val in p["observed"].get(metric_name, {}).items():
                    if isinstance(val, (int, float)):
                        totals[col] = totals.get(col, 0) + int(val)
        return totals


class PipelineHandle:
    """Start/pause/resume/dispose around a streaming query factory.

    `factory()` must build and .start() the query from its checkpoint
    — so every (re)start resumes exactly where the last run stopped.
    """

    def __init__(self, spark: SparkSession, factory, *,
                 reconnect_max_count: int = 3):
        self.spark = spark
        self.factory = factory
        self.reconnect_max_count = reconnect_max_count
        self.query: StreamingQuery | None = None
        self.listener = ProgressListener()
        self._listener_registered = False
        # Synchronous row count harvested from each stopped query's
        # recentProgress — the listener bus is async and may DROP
        # events under load, so observability assertions should read
        # total_input_rows(), not the listener alone.
        self._sync_rows = 0

    # -- row 20: pause/resume ------------------------------------------------
    def start(self) -> StreamingQuery:
        if not self._listener_registered:
            self.spark.streams.addListener(self.listener)
            self._listener_registered = True
        self.query = self.factory()
        return self.query

    def pause(self, timeout_s: float = 30.0) -> None:
        """StopCatchFrames: stop the query; state + offsets persist."""
        if self.query is not None:
            self.query.stop()
            self.query.awaitTermination(int(timeout_s))
            self._sync_rows += self._query_rows(self.query)
            self.query = None

    @staticmethod
    def _query_rows(query: StreamingQuery) -> int:
        """Sum numInputRows from the query's own recentProgress —
        synchronous, unlike the listener bus (readable after stop)."""
        try:
            return sum(int(p.numInputRows) for p in query.recentProgress)
        except Exception:
            return 0

    def total_input_rows(self) -> int:
        """Rows across every query leg this handle ran, by the stronger
        of the two observability channels: the async listener (may drop
        events under load) and each leg's synchronous recentProgress
        (capped at the last ~100 batches per leg)."""
        sync = self._sync_rows
        if self.query is not None:
            sync += self._query_rows(self.query)
        return max(sync, self.listener.total_rows())

    def resume(self) -> StreamingQuery:
        """StartCatchFrames: restart from the checkpoint."""
        return self.start()

    # -- row 22: bounded-retry restart --------------------------------------
    def run_with_retries(self, await_s: float = 300.0) -> None:
        attempts = 0
        while True:
            try:
                q = self.query or self.start()
                q.awaitTermination(int(await_s))
                return
            except Exception:
                attempts += 1
                self.query = None
                if attempts >= self.reconnect_max_count:
                    raise
                time.sleep(1.0)

    # -- row 23: dispose ----------------------------------------------------
    def dispose(self, timeout_s: float = 30.0) -> None:
        self.pause(timeout_s)
        if self._listener_registered:
            self.spark.streams.removeListener(self.listener)
            self._listener_registered = False

    def __enter__(self) -> "PipelineHandle":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.dispose()


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def use_rocksdb_state_store(
    spark: SparkSession, *, changelog_checkpointing: bool = True,
) -> None:
    """Switch stateful streaming operators (session windows, asof
    state, dropDuplicatesWithinWatermark) to the RocksDB state store.

    The default HDFS-backed provider keeps every key in executor heap
    — at 100 TB of state (billions of session/dedup keys) that is an
    OOM, full stop. RocksDB spills to local SSD with a bounded block
    cache, and changelog checkpointing uploads per-batch deltas
    instead of full snapshots, shrinking both commit latency and
    checkpoint storage. Ships inside Spark 4 core (no extra jar);
    applies to queries STARTED after this call — restarting an
    existing checkpointed query with a different provider is fine
    (state files are provider-specific but rebuilt from the changelog
    / source replay per Spark's recovery semantics is NOT supported:
    keep one provider per checkpoint lineage, which is why this is a
    session-level, set-once switch).
    """
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true" if changelog_checkpointing else "false",
    )
