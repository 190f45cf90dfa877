"""Round-15 additions, per the r14 verdict brief:

1. Grouped judge calibration (verdict item 6): per-group ECE/Brier
   equal the ungrouped ops run per group; streaming maintainers
   SUM-merge the factored integer state and replay-skip.
2. Frozen source-fair percentile (verdict item 7): per-group
   quantile-grid cuts via integer reach tests; the apply half is a
   bounded array fold with NULL routing for unknown scores/groups.
3. Lossless CMS pre-filter (verdict item 4): the high-collision
   divergence the r14 docstring conceded is EXHIBITED, and
   rank_by="exact" closes it (filtered == unfiltered, a theorem).
4. Marker-based state commit (verdict item 5): versioned-dir +
   sentinel protocol survives the crash windows and refuses the
   wrong layout.
5. r14 ADVICE: ECE bin clamps both ends; psi_from_binned fails
   loudly on out-of-range bins; dedup_reweight prunes superset
   pair tables.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _load(spark, sf, name):
    return spark.read.parquet(f"{sf}/{name}.parquet")


@pytest.fixture(scope="module")
def _lang_pred(spark):
    from awskinesisconsumer_spark.operators.text import language_id

    docs = _load(spark, SF_SMOKE, "documents")
    return language_id(
        docs, text_col="text", with_confidence=True
    ).select("lang", "lang_pred", "lang_conf").localCheckpoint()


# ---------------------------------------------------------------------------
# verdict item 6: grouped ECE / Brier
# ---------------------------------------------------------------------------


def test_ece_grouped_equals_per_group_ungrouped(spark, _lang_pred):
    from awskinesisconsumer_spark.operators.evaluation import (
        expected_calibration_error, expected_calibration_error_grouped,
    )

    kw = dict(label_col="lang", pred_col="lang_pred",
              conf_col="lang_conf", n_bins=10)
    grouped = expected_calibration_error_grouped(
        _lang_pred, group_col="lang", **kw
    ).collect()
    assert len(grouped) >= 2
    for r in grouped:
        one = expected_calibration_error(
            _lang_pred.where(F.col("lang") == r["group"]), **kw
        ).first()
        assert (r["n_items"], r["ece"], r["max_gap"]) == (
            one["n_items"], one["ece"], one["max_gap"]
        ), r["group"]


def test_brier_grouped_equals_per_group_ungrouped(spark, _lang_pred):
    from awskinesisconsumer_spark.operators.evaluation import (
        brier_score, brier_score_grouped,
    )

    kw = dict(label_col="lang", pred_col="lang_pred",
              conf_col="lang_conf")
    grouped = brier_score_grouped(
        _lang_pred, group_col="lang", **kw
    ).collect()
    assert len(grouped) >= 2
    for r in grouped:
        one = brier_score(
            _lang_pred.where(F.col("lang") == r["group"]), **kw
        ).first()
        assert (r["n_items"], r["accuracy"], r["brier"]) == (
            one["n_items"], one["accuracy"], one["brier"]
        ), r["group"]


def test_ece_bin_clamps_both_ends(spark):
    # r14 ADVICE: an out-of-contract conf < 0 must land in bin 0
    # (mirroring psi_binned_counts), never bin -1; conf = 1.0 stays
    # in the top bin.
    from awskinesisconsumer_spark.operators.evaluation import (
        ece_binned_counts,
    )

    df = spark.createDataFrame(
        [("a", "a", -0.2), ("a", "b", 1.0), ("a", "a", 0.05)],
        "lab string, prd string, cf double",
    )
    rows = {r["bin"]: r["nb"] for r in ece_binned_counts(
        df, label_col="lab", pred_col="prd", conf_col="cf", n_bins=10,
    ).collect()}
    assert rows == {0: 2, 9: 1}


def test_ece_stream_state_replay_and_equality(spark, tmp_path):
    # SUM-merged (group, bin, nb, ok, c6) state + ece_from_binned
    # must equal batch expected_calibration_error_grouped over the
    # union of arrivals; a replayed batch id is skipped.
    from awskinesisconsumer_spark.operators.evaluation import (
        ece_from_binned, expected_calibration_error_grouped,
    )
    from awskinesisconsumer_spark.streaming.pipeline import _ece_merge_fn

    out = str(tmp_path / "ece")
    merge = _ece_merge_fn(
        label_col="lab", pred_col="prd", conf_col="cf",
        group_col="g", n_bins=4, out_path=out,
    )
    schema = "g string, lab string, prd string, cf double"
    b0 = spark.createDataFrame(
        [("en", "a", "a", 0.9), ("en", "a", "b", 0.6),
         ("fr", "x", "x", 0.3)], schema)
    b1 = spark.createDataFrame(
        [("fr", "x", "y", 0.95), ("en", "a", "a", 0.2)], schema)
    merge(b0, 0)
    merge(b1, 1)
    merge(b1, 1)  # replay must be skipped
    got = ece_from_binned(
        spark.read.parquet(out).select("group", "bin", "nb", "ok", "c6"),
        n_bins=4,
    ).orderBy("group").collect()
    want = expected_calibration_error_grouped(
        b0.unionByName(b1), label_col="lab", pred_col="prd",
        conf_col="cf", group_col="g", n_bins=4,
    ).orderBy("group").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_brier_stream_state_replay_and_equality(spark, tmp_path):
    from awskinesisconsumer_spark.operators.evaluation import (
        brier_from_sums, brier_score_grouped,
    )
    from awskinesisconsumer_spark.streaming.pipeline import (
        _brier_merge_fn,
    )

    out = str(tmp_path / "brier")
    merge = _brier_merge_fn(
        label_col="lab", pred_col="prd", conf_col="cf",
        group_col="g", out_path=out,
    )
    schema = "g string, lab string, prd string, cf double"
    b0 = spark.createDataFrame(
        [("en", "a", "a", 0.9), ("fr", "x", "y", 0.6)], schema)
    b1 = spark.createDataFrame(
        [("en", "a", "b", 0.4), ("fr", "x", "x", 0.8)], schema)
    merge(b0, 0)
    merge(b1, 1)
    merge(b1, 1)  # replay must be skipped
    got = brier_from_sums(
        spark.read.parquet(out).select("group", "n_items", "oks", "sq")
    ).orderBy("group").collect()
    want = brier_score_grouped(
        b0.unionByName(b1), label_col="lab", pred_col="prd",
        conf_col="cf", group_col="g",
    ).orderBy("group").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_psi_from_binned_rejects_out_of_range_bin(spark):
    # r14 ADVICE: a state bin outside [0, n_bins) means the reader's
    # n_bins disagrees with the state's frozen binning — silently
    # dropping it yields a quietly wrong PSI, so it must raise.
    from awskinesisconsumer_spark.operators.evaluation import (
        psi_from_binned,
    )

    bad = spark.createDataFrame(
        [(0, 5, 5), (99, 1, 1)], "bin int, ca long, cb long"
    )
    with pytest.raises(Exception, match="outside"):
        psi_from_binned(bad, n_bins=4).collect()


# ---------------------------------------------------------------------------
# verdict item 7: frozen source-fair percentile
# ---------------------------------------------------------------------------


def test_group_percentile_cuts_are_grid_quantiles(spark):
    # cuts[i-1] = the smallest score whose within-group inclusive
    # ECDF reaches i/n_cuts — brute-forced per group; the reach test
    # is integer arithmetic (cum * n >= i * total).
    from awskinesisconsumer_spark.operators.corpus_prep import (
        group_percentile_cuts,
    )

    rows = [("a", float(s)) for s in (1, 1, 2, 3, 5, 8, 13, 21)]
    rows += [("b", float(s)) for s in (10, 20, 30)]
    df = spark.createDataFrame(rows, "g string, s double")
    got = {r["group"]: r["cuts"] for r in group_percentile_cuts(
        df, score_col="s", group_col="g", n_cuts=4,
    ).collect()}

    def brute(scores, n):
        import collections
        cnt = collections.Counter(scores)
        uniq = sorted(cnt)
        total = len(scores)
        cuts = []
        for i in range(1, n):
            cum = 0
            for s in uniq:
                cum += cnt[s]
                if cum * n >= i * total:
                    cuts.append(s)
                    break
        return cuts

    assert got["a"] == brute([1, 1, 2, 3, 5, 8, 13, 21], 4)
    assert got["b"] == brute([10, 20, 30], 4)


def test_apply_cuts_semantics_and_null_routing(spark):
    # pctile_frozen = (#cuts <= score) / n_cuts; NULL score and
    # unknown group -> NULL (routing decision, not worst/best).
    from awskinesisconsumer_spark.operators.corpus_prep import (
        apply_group_percentile_cuts, group_percentile_cuts,
    )

    ref = spark.createDataFrame(
        [("a", float(s)) for s in range(1, 11)], "g string, s double"
    )
    cuts = group_percentile_cuts(
        ref, score_col="s", group_col="g", n_cuts=10
    )
    live = spark.createDataFrame(
        [("a", 0.5), ("a", 5.0), ("a", 100.0), ("a", None),
         ("zz", 5.0)],
        "g string, s double",
    )
    got = {(r["g"], r["s"]): r["pctile_frozen"]
           for r in apply_group_percentile_cuts(
               live, cuts, score_col="s", group_col="g").collect()}
    assert got[("a", 0.5)] == 0.0       # below every cut
    assert got[("a", 100.0)] == 0.9     # above all 9 interior cuts
    assert got[("a", 5.0)] == 0.5       # cuts {1..5} <= 5 -> 5/10
    assert got[("a", None)] is None
    assert got[("zz", 5.0)] is None


def test_apply_cuts_is_chunking_invariant(spark):
    # map-only: union of per-chunk applies == one batch apply — the
    # invariance that lets ONE twin gate percentile_gate_stream.
    from awskinesisconsumer_spark.operators.corpus_prep import (
        apply_group_percentile_cuts, group_percentile_cuts,
    )
    from awskinesisconsumer_spark.operators.text import quality_score

    docs = _load(spark, SF_SMOKE, "documents")
    scored = quality_score(docs, text_col="text").select(
        "doc_id", "lang", "quality"
    )
    cuts = group_percentile_cuts(
        scored.where(F.col("doc_id") % 4 == 0),
        score_col="quality", group_col="lang", n_cuts=10,
    ).localCheckpoint()
    whole = apply_group_percentile_cuts(
        scored, cuts, score_col="quality", group_col="lang"
    )
    parts = [
        apply_group_percentile_cuts(
            scored.where(F.col("doc_id") % 3 == i), cuts,
            score_col="quality", group_col="lang",
        )
        for i in range(3)
    ]
    union = parts[0].unionByName(parts[1]).unionByName(parts[2])
    a = sorted(tuple(r) for r in whole.collect())
    b = sorted(tuple(r) for r in union.collect())
    assert a == b


# ---------------------------------------------------------------------------
# verdict item 4: the CMS pre-filter divergence + the exact escape hatch
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def _zipf_docs(spark):
    # vocabulary (100) >> width (2): every estimate is a bucket
    # total, the regime where estimate order scrambles exact order.
    rows = []
    for i in range(100):
        rows.extend([(f"t{i:03d}",)] * (101 - i))
    return spark.createDataFrame(rows, "text string").localCheckpoint()


def test_cms_prefilter_divergence_exhibited(spark, _zipf_docs):
    # The r14-conceded caveat as a TESTED behavior, not prose: under
    # heavy collisions a tight candidate_top_m changes the
    # estimate-ranked top-k for some k.
    from awskinesisconsumer_spark.operators.dedup import portable_hash52
    from awskinesisconsumer_spark.operators.sketches import (
        cms_heavy_hitters,
    )

    kw = dict(text_col="text", depth=1, width=2,
              hash_fn=portable_hash52)
    diverged = False
    for k in (3, 5, 10, 20):
        full = [tuple(r) for r in cms_heavy_hitters(
            _zipf_docs, k=k, **kw).collect()]
        with pytest.warns(UserWarning, match="slack"):
            pre = [tuple(r) for r in cms_heavy_hitters(
                _zipf_docs, k=k, candidate_top_m=1, **kw).collect()]
        if pre != full:
            diverged = True
            break
    assert diverged, (
        "vocabulary >> width fixture failed to exhibit the "
        "documented estimate-ranking divergence"
    )


def test_cms_exact_rank_mode_is_lossless(spark, _zipf_docs):
    # rank_by='exact': filtered == unfiltered for m >= k — the
    # theorem (survivors are a superset of the exact top-m), in the
    # SAME high-collision regime where estimate ranking diverges.
    from awskinesisconsumer_spark.operators.dedup import portable_hash52
    from awskinesisconsumer_spark.operators.sketches import (
        cms_heavy_hitters,
    )

    kw = dict(text_col="text", depth=1, width=2,
              hash_fn=portable_hash52, rank_by="exact")
    for k, m in ((5, 5), (10, 12)):
        full = [tuple(r) for r in cms_heavy_hitters(
            _zipf_docs, k=k, **kw).collect()]
        pre = [tuple(r) for r in cms_heavy_hitters(
            _zipf_docs, k=k, candidate_top_m=m, **kw).collect()]
        assert pre == full, (k, m)
    # exact ranking is by true count: t000 (count 101) leads
    assert full[0][0] == "t000"
    with pytest.raises(ValueError, match="rank_by"):
        cms_heavy_hitters(_zipf_docs, k=5, rank_by="nope", **{
            k: v for k, v in kw.items() if k != "rank_by"})


# ---------------------------------------------------------------------------
# verdict item 5: marker-based state commits
# ---------------------------------------------------------------------------


@pytest.fixture()
def _marker_mode():
    import awskinesisconsumer_spark.streaming.pipeline as P

    P.set_state_commit_mode("marker")
    yield P
    P.set_state_commit_mode("rename")


def test_marker_commit_roundtrip_and_supersede(spark, tmp_path,
                                               _marker_mode):
    P = _marker_mode
    st = str(tmp_path / "state")
    assert P._read_state(spark, st) is None
    df1 = spark.createDataFrame(
        [("a", 1), ("b", 2)], "k string, n long"
    ).withColumn("_bid", F.lit(0))
    P._swap_state(df1, st)
    got = P._read_state(spark, st)
    assert sorted((r["k"], r["n"]) for r in got.collect()) == [
        ("a", 1), ("b", 2)]
    df2 = spark.createDataFrame(
        [("a", 5)], "k string, n long").withColumn("_bid", F.lit(1))
    P._swap_state(df2, st)
    assert [(r["k"], r["n"]) for r in
            P._read_state(spark, st).collect()] == [("a", 5)]
    # superseded version dirs are swept; exactly one version remains
    import os

    versions = [d for d in os.listdir(st)
                if d.startswith("v") and d[1:].isdigit()]
    assert len(versions) == 1


def test_marker_lost_sentinel_recovers_newest_complete(
        spark, tmp_path, _marker_mode):
    # the one marker-mode crash window: sentinel lost mid-overwrite
    # -> recovery picks the newest _SUCCESS-complete version.
    import os

    P = _marker_mode
    st = str(tmp_path / "state")
    df1 = spark.createDataFrame([("a", 1)], "k string, n long")
    df2 = spark.createDataFrame([("a", 9)], "k string, n long")
    P._swap_state(df1.withColumn("_bid", F.lit(0)), st)
    P._swap_state(df2.withColumn("_bid", F.lit(1)), st)
    os.remove(os.path.join(st, "_COMMITTED"))
    got = P._read_state(spark, st)
    assert [(r["k"], r["n"]) for r in got.collect()] == [("a", 9)]


def test_marker_partial_version_invisible(spark, tmp_path,
                                          _marker_mode):
    # a crash AFTER writing the new version dir but BEFORE the
    # sentinel overwrite must keep serving the old committed state.
    P = _marker_mode
    st = str(tmp_path / "state")
    df1 = spark.createDataFrame([("a", 1)], "k string, n long")
    P._swap_state(df1.withColumn("_bid", F.lit(0)), st)
    # simulate the crash window: the next version lands on disk but
    # the sentinel still names v000000
    df2 = spark.createDataFrame([("a", 9)], "k string, n long")
    df2.withColumn("_bid", F.lit(1)).write.mode("overwrite").parquet(
        f"{st}/v000001"
    )
    got = P._read_state(spark, st)
    assert [(r["k"], r["n"]) for r in got.collect()] == [("a", 1)]


def test_marker_and_rename_layouts_refuse_each_other(
        spark, tmp_path):
    import awskinesisconsumer_spark.streaming.pipeline as P

    df = spark.createDataFrame([("a", 1)], "k string, n long")
    # rename-mode dir read under... written under marker mode
    st1 = str(tmp_path / "m")
    P.set_state_commit_mode("marker")
    try:
        P._swap_state(df.withColumn("_bid", F.lit(0)), st1)
    finally:
        P.set_state_commit_mode("rename")
    with pytest.raises(IOError, match="marker-mode state dir"):
        P._read_state(spark, st1)
    # marker-mode commit onto a rename-layout dir
    st2 = str(tmp_path / "r")
    P._swap_state(df.withColumn("_bid", F.lit(0)), st2)
    P.set_state_commit_mode("marker")
    try:
        with pytest.raises(IOError, match="rename-mode state dir"):
            P._swap_state(df.withColumn("_bid", F.lit(1)), st2)
    finally:
        P.set_state_commit_mode("rename")
    with pytest.raises(ValueError, match="rename.*marker"):
        P.set_state_commit_mode("s3")


def test_marker_mode_merge_fn_end_to_end(spark, tmp_path,
                                         _marker_mode):
    # a real SUM-merge family (brier) under marker commits: state
    # merges, replays skip, final stage equals batch — the protocol
    # is a drop-in for all seven families.
    from awskinesisconsumer_spark.operators.evaluation import (
        brier_from_sums, brier_score_grouped,
    )
    from awskinesisconsumer_spark.streaming.pipeline import (
        _brier_merge_fn,
    )

    out = str(tmp_path / "brier_marker")
    merge = _brier_merge_fn(
        label_col="lab", pred_col="prd", conf_col="cf",
        group_col="g", out_path=out,
    )
    schema = "g string, lab string, prd string, cf double"
    b0 = spark.createDataFrame([("en", "a", "a", 0.9)], schema)
    b1 = spark.createDataFrame([("en", "a", "b", 0.4)], schema)
    merge(b0, 0)
    merge(b1, 1)
    merge(b1, 1)
    got = brier_from_sums(
        spark.read.parquet(f"{out}/v000001")
        .select("group", "n_items", "oks", "sq")
    ).collect()
    want = brier_score_grouped(
        b0.unionByName(b1), label_col="lab", pred_col="prd",
        conf_col="cf", group_col="g",
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


# ---------------------------------------------------------------------------
# r14 ADVICE: dedup_reweight superset-pair pruning
# ---------------------------------------------------------------------------


def test_dedup_reweight_prunes_superset_pairs(spark):
    # pairs mined from a superset of df must not inflate cluster
    # sizes (absent endpoints are semi-joined away) nor drag absent
    # vertices into clusters.
    from awskinesisconsumer_spark.operators.dedup import dedup_reweight

    df = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "id string"
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "zzz"), ("x", "y")],
        "id_a string, id_b string",
    )
    got = sorted(
        (r["id"], r["weight"])
        for r in dedup_reweight(df, pairs, id_col="id").collect()
    )
    assert got == [("a", 0.5), ("b", 0.5), ("c", 1.0), ("d", 1.0)]


# ---------------------------------------------------------------------------
# r15 third wave: reliability diagram + multiclass MCC
# ---------------------------------------------------------------------------


def test_reliability_diagram_consistent_with_ece(spark, _lang_pred):
    # ECE == sum over occupied bins of (nb/N) * gap — the diagram is
    # the uncompressed form of the same integer state.
    from awskinesisconsumer_spark.operators.evaluation import (
        expected_calibration_error, reliability_diagram,
    )

    kw = dict(label_col="lang", pred_col="lang_pred",
              conf_col="lang_conf", n_bins=10)
    bins = reliability_diagram(_lang_pred, **kw).collect()
    assert bins and all(0 <= r["bin"] < 10 for r in bins)
    n = sum(r["nb"] for r in bins)
    recomposed = sum(r["nb"] / n * abs(r["acc"] - r["conf"])
                     for r in bins)
    ece = expected_calibration_error(_lang_pred, **kw).first()
    assert ece["n_items"] == n
    assert abs(recomposed - ece["ece"]) < 2e-5
    for r in bins:
        assert abs(r["gap"] - round(abs(r["acc"] - r["conf"]), 6)) \
            <= 2e-6


def test_mcc_binary_closed_form_and_degenerate(spark):
    # Gorodkin's R_K reduces to the textbook binary MCC; a
    # single-class marginal (the undefined case) yields NULL.
    import math

    from awskinesisconsumer_spark.operators.evaluation import mcc_score

    # TP=4 (a/a), FN=1 (a/b), FP=2 (b/a), TN=3 (b/b)
    rows = ([("a", "a")] * 4 + [("a", "b")] * 1
            + [("b", "a")] * 2 + [("b", "b")] * 3)
    df = spark.createDataFrame(rows, "lab string, prd string")
    got = mcc_score(df, label_col="lab", pred_col="prd").first()
    tp, fn, fp, tn = 4, 1, 2, 3
    want = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    assert got["n_items"] == 10
    assert abs(got["mcc"] - round(want, 6)) <= 1e-6
    assert got["accuracy"] == 0.7
    # perfect predictor -> 1.0
    perfect = spark.createDataFrame(
        [("a", "a"), ("b", "b"), ("c", "c")], "lab string, prd string")
    assert mcc_score(
        perfect, label_col="lab", pred_col="prd").first()["mcc"] == 1.0
    # constant predictor -> NULL (s^2 == sum p_k^2)
    const = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a")], "lab string, prd string")
    assert mcc_score(
        const, label_col="lab", pred_col="prd").first()["mcc"] is None


def test_apply_cuts_plan_is_broadcast_map_only(spark):
    # the map-only claim, plan-asserted: ONE broadcast join, and the
    # corpus side never shuffles (no ShuffleExchange anywhere).
    from awskinesisconsumer_spark.operators.corpus_prep import (
        apply_group_percentile_cuts, group_percentile_cuts,
    )
    from awskinesisconsumer_spark.operators.text import quality_score

    docs = _load(spark, SF_SMOKE, "documents")
    scored = quality_score(docs, text_col="text").select(
        "doc_id", "lang", "quality"
    )
    cuts = group_percentile_cuts(
        scored.where(F.col("doc_id") % 4 == 0),
        score_col="quality", group_col="lang", n_cuts=10,
    ).localCheckpoint()
    out = apply_group_percentile_cuts(
        scored, cuts, score_col="quality", group_col="lang"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "ShuffleExchange" not in plan


def test_auc_matches_pairwise_brute_force(spark):
    # AUC == P(random positive outscores random negative, ties 1/2)
    # — brute-forced over all pos x neg pairs on a tie-heavy fixture.
    from awskinesisconsumer_spark.operators.evaluation import auc_score

    rows = [(1, 0.9), (1, 0.7), (1, 0.7), (1, 0.3),
            (0, 0.7), (0, 0.5), (0, 0.3), (0, 0.3), (0, 0.1)]
    df = spark.createDataFrame(rows, "y int, s double")
    got = auc_score(df, label_col="y", score_col="s").first()
    pos = [s for y, s in rows if y]
    neg = [s for y, s in rows if not y]
    brute = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p in pos for n in neg
    ) / (len(pos) * len(neg))
    assert (got["n_pos"], got["n_neg"]) == (len(pos), len(neg))
    assert got["auc"] == round(brute, 6)
    # perfect separation -> 1.0; one empty class -> NULL
    sep = spark.createDataFrame(
        [(1, 0.9), (1, 0.8), (0, 0.2)], "y int, s double")
    assert auc_score(sep, label_col="y", score_col="s").first()["auc"] == 1.0
    onec = spark.createDataFrame([(1, 0.9), (1, 0.1)], "y int, s double")
    assert auc_score(onec, label_col="y", score_col="s").first()["auc"] is None


def test_auc_stream_state_replay_and_equality(spark, tmp_path):
    from awskinesisconsumer_spark.operators.evaluation import (
        auc_from_counts, auc_score,
    )
    from awskinesisconsumer_spark.streaming.pipeline import _auc_merge_fn

    out = str(tmp_path / "auc")
    merge = _auc_merge_fn(label_col="y", score_col="s", out_path=out)
    b0 = spark.createDataFrame(
        [(1, 0.9), (0, 0.7), (1, 0.7)], "y int, s double")
    b1 = spark.createDataFrame(
        [(0, 0.3), (1, 0.3), (0, 0.1)], "y int, s double")
    merge(b0, 0)
    merge(b1, 1)
    merge(b1, 1)  # replay must be skipped
    got = auc_from_counts(
        spark.read.parquet(out).select("score", "pos", "neg")
    ).first()
    want = auc_score(
        b0.unionByName(b1), label_col="y", score_col="s"
    ).first()
    assert tuple(got) == tuple(want)


def test_auc_from_counts_tolerates_unmerged_duplicates(spark):
    # duplicate score rows (per-batch counts concatenated without the
    # SUM-merge) must produce the MERGED answer, not an arbitrary
    # tie-order-dependent prefix.
    from awskinesisconsumer_spark.operators.evaluation import (
        auc_from_counts,
    )

    merged = spark.createDataFrame(
        [(0.9, 3, 1), (0.5, 1, 4)], "score double, pos long, neg long"
    )
    split = spark.createDataFrame(
        [(0.9, 2, 0), (0.5, 1, 3), (0.9, 1, 1), (0.5, 0, 1)],
        "score double, pos long, neg long",
    )
    a = auc_from_counts(merged).first()
    b = auc_from_counts(split).first()
    assert tuple(a) == tuple(b)


def test_marker_versions_order_numerically(spark, tmp_path,
                                           _marker_mode):
    # v%06d names sort lexicographically only up to v999999; the
    # protocol must order versions NUMERICALLY or a long-running
    # monitor's "newest" regresses at v1000000.
    P = _marker_mode
    st = str(tmp_path / "state")
    df1 = spark.createDataFrame([("a", 1)], "k string, n long")
    df1.withColumn("_bid", F.lit(0)).write.parquet(f"{st}/v999999")
    import os

    with open(os.path.join(st, "_COMMITTED"), "w") as f:
        f.write("v999999")
    df2 = spark.createDataFrame([("a", 2)], "k string, n long")
    P._swap_state(df2.withColumn("_bid", F.lit(1)), st)
    assert os.path.isdir(f"{st}/v1000000")
    got = P._read_state(spark, st)
    assert [(r["k"], r["n"]) for r in got.collect()] == [("a", 2)]
    # lost sentinel: numeric-newest complete version wins
    os.remove(os.path.join(st, "_COMMITTED"))
    got = P._read_state(spark, st)
    assert [(r["k"], r["n"]) for r in got.collect()] == [("a", 2)]


def test_auc_grouped_equals_per_group_ungrouped(spark, _lang_pred):
    from awskinesisconsumer_spark.operators.evaluation import (
        auc_score, auc_score_grouped,
    )

    scored = _lang_pred.where(F.col("lang").isNotNull()).select(
        "lang",
        (F.col("lang") == F.col("lang_pred")).cast("int").alias("y"),
        "lang_conf",
    )
    grouped = auc_score_grouped(
        scored, label_col="y", score_col="lang_conf",
        group_col="lang",
    ).collect()
    assert len(grouped) >= 2
    for r in grouped:
        one = auc_score(
            scored.where(F.col("lang") == r["group"]),
            label_col="y", score_col="lang_conf",
        ).first()
        assert (r["n_pos"], r["n_neg"], r["auc"]) == (
            one["n_pos"], one["n_neg"], one["auc"]
        ), r["group"]
