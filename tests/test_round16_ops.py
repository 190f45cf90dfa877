"""Round-16 additions, per the r15 verdict brief:

1. PR-AUC / average precision (verdict item 4): derived from the
   SAME (score, pos, neg) counts state as ROC AUC — step
   interpolation over scores descending, the ordered-fold float sum
   (the psi/ece determinism rule), brute-force equality and
   chunking-invariance pins.
2. Calibration drift (verdict item 8): the delta between two frozen
   per-group calibration snapshots — one bounded full-outer join over
   two G x n_bins states.
3. r15 ADVICE: cms_heavy_hitters(rank_by="exact") rejects
   candidate_top_m < k (the losslessness precondition); a marker-mode
   sentinel naming an unreadable version falls back to the newest
   _SUCCESS-complete version or fails loudly instead of silently
   resetting state.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _load(spark, sf, name):
    return spark.read.parquet(f"{sf}/{name}.parquet")


@pytest.fixture()
def _marker_mode():
    import awskinesisconsumer_spark.streaming.pipeline as P

    P.set_state_commit_mode("marker")
    yield P
    P.set_state_commit_mode("rename")


# ---------------------------------------------------------------------------
# r15 ADVICE fixes
# ---------------------------------------------------------------------------


def test_cms_exact_rank_rejects_m_below_k(spark):
    # the losslessness theorem needs m >= k; m < k must fail loudly
    # instead of silently truncating the top-k (r15 ADVICE).
    from awskinesisconsumer_spark.operators.sketches import (
        cms_heavy_hitters,
    )

    docs = spark.createDataFrame([("a b c",)], "text string")
    with pytest.raises(ValueError, match="candidate_top_m >= k"):
        cms_heavy_hitters(
            docs, text_col="text", k=5, candidate_top_m=3,
            rank_by="exact",
        )


def test_marker_sentinel_to_unreadable_version_falls_back(
        spark, tmp_path, _marker_mode):
    # sentinel names a version that is gone (e.g. a concurrent commit
    # swept it): recovery must serve the newest _SUCCESS-complete
    # version, not silently reset to first-batch None (r15 ADVICE).
    import os
    import shutil

    P = _marker_mode
    st = str(tmp_path / "state")
    P._swap_state(
        spark.createDataFrame([("a", 1)], "k string, n long")
        .withColumn("_bid", F.lit(0)), st,
    )
    # a second complete version lands on disk (no sentinel update)
    spark.createDataFrame([("a", 7)], "k string, n long").withColumn(
        "_bid", F.lit(1)
    ).write.mode("overwrite").parquet(f"{st}/v000001")
    # sentinel now names a version that does not exist (drop the
    # local-FS checksum sidecar — the python-side rewrite invalidates
    # it, which a real object store has no equivalent of)
    with open(os.path.join(st, "_COMMITTED"), "w") as fh:
        fh.write("v000002")
    crc = os.path.join(st, "._COMMITTED.crc")
    if os.path.exists(crc):
        os.remove(crc)
    got = P._read_state(spark, st)
    assert [(r["k"], r["n"]) for r in got.collect()] == [("a", 7)]
    # with NO complete fallback left, it must raise, never reset
    shutil.rmtree(f"{st}/v000000")
    shutil.rmtree(f"{st}/v000001")
    with pytest.raises(IOError, match="refusing to silently reset"):
        P._read_state(spark, st)
