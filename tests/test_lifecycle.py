"""Lifecycle tests (SURVEY §2 rows 20-24): pause/resume without loss,
dispose idempotence, progress observability."""

from __future__ import annotations


from awskinesisconsumer_spark.io import load_table
from awskinesisconsumer_spark.streaming.lifecycle import PipelineHandle

SF = "/root/testdata/sf0.001"


def test_pause_resume_no_loss(spark, tmp_path):
    """Row 20: pause mid-stream, resume from checkpoint, total output
    equals input — pause loses nothing (unlike the reference, which
    drops frames while catch_frames is off)."""
    ev = load_table(spark, "events", SF)
    total = ev.count()
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def factory():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)  # row 21: admission control
            .parquet(src)
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    handle = PipelineHandle(spark, factory)
    with handle:
        import time
        deadline = time.time() + 60
        while time.time() < deadline:
            if handle.listener.total_rows() > 0:
                break
            time.sleep(0.2)
        handle.pause()
        n_mid = spark.read.parquet(out).count()
        # Usually pause lands mid-stream (n_mid < total); on a fast
        # machine every batch may already have committed — resume must
        # be a clean no-op then, so the test stays meaningful either way.
        assert n_mid <= total
        q = handle.resume()
        q.awaitTermination(120)
        # row 24: the listener bus is ASYNC and can DROP events under
        # full-suite load (observed 750/1000 even after a 30 s poll) —
        # total_input_rows() falls back to each query leg's synchronous
        # recentProgress, which never loses a batch. Brief poll first so
        # the strict listener channel usually wins.
        deadline = time.time() + 10
        while (handle.listener.total_rows() < total
               and time.time() < deadline):
            time.sleep(0.2)
        observed = handle.total_input_rows()

    final = spark.read.parquet(out)
    assert final.count() == total
    assert final.select("event_id").distinct().count() == total
    # row 24: the observability channels saw the batches — minus AT
    # MOST one: stop() during pause can land after a batch COMMITS
    # but before its progress reaches recentProgress or the listener
    # bus, and a committed batch never replays, so that one batch is
    # reportable nowhere (observed 750/1000 under full-suite load).
    # One pause => at most one batch in that window; the no-loss
    # assertions above stay strict.
    max_batch = total // 4 + 1  # 4 files, maxFilesPerTrigger=1
    assert observed >= total - max_batch, (observed, total)


def test_dispose_idempotent(spark, tmp_path):
    ev = load_table(spark, "events", SF)
    src = str(tmp_path / "src")
    ev.write.parquet(src)

    def factory():
        stream = spark.readStream.schema(ev.schema).parquet(src)
        return (
            stream.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )

    h = PipelineHandle(spark, factory)
    h.start()
    h.dispose()
    h.dispose()  # second dispose is a no-op, not an error
    assert h.query is None
