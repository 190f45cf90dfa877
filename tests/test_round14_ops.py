"""Round-14 additions, per the r13 verdict brief:

1. `semantic_dedup_recall_audit` truth-leg guard (verdict item 2):
   the exact all-pairs truth join is bounded by `truth_max_rows` —
   a corpus-sized input raises loudly instead of silently launching
   an O(n^2) join from inside a composed report.
2. Single-mine multi-level recall audit (verdict item 6): with
   cell_cap=None the candidate mine runs ONCE at max(n_assign)
   tagged with the minimal co-location rank; every audited level
   filters the one tagged pair table, plan-asserted.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _load(spark, sf, name):
    return spark.read.parquet(f"{sf}/{name}.parquet")


@pytest.fixture(scope="module")
def _emb_cents(spark):
    from awskinesisconsumer_spark.operators.similarity import (
        ivf_centroids_from_sample,
    )

    emb = _load(spark, SF_SMOKE, "embeddings")
    cents = ivf_centroids_from_sample(
        emb, id_col="vec_id", vec_col="embedding", n_centroids=8
    )
    return emb, cents


# ---------------------------------------------------------------------------
# verdict item 2: the truth-leg guard
# ---------------------------------------------------------------------------


def test_recall_audit_truth_guard_raises(spark, _emb_cents):
    # An input past truth_max_rows must raise BEFORE any quadratic
    # work — the audit's all-pairs truth leg is the one deliberate
    # O(n^2) in the repo, and it must be loud, not silent (r13
    # verdict item 2: handed a 200k-row table, the composed report
    # used to just run ~2e10 cosine pairs).
    from awskinesisconsumer_spark.operators.similarity import (
        semantic_dedup_recall_audit,
    )

    emb, cents = _emb_cents
    with pytest.raises(ValueError, match="truth_max_rows"):
        semantic_dedup_recall_audit(
            emb, id_col="vec_id", vec_col="embedding", centroids=cents,
            threshold=0.3, truth_max_rows=10,
        )


def test_recall_audit_truth_guard_opt_outs(spark, _emb_cents):
    # truth_max_rows=None is the deliberate opt-out; a bound at
    # exactly n rows passes; the degenerate bound (< 2 rows cannot
    # form a pair) is rejected as caller error.
    from awskinesisconsumer_spark.operators.similarity import (
        semantic_dedup_recall_audit,
    )

    emb, cents = _emb_cents
    n = emb.count()
    kw = dict(id_col="vec_id", vec_col="embedding", centroids=cents,
              threshold=0.3, n_assign_values=(1,))
    assert semantic_dedup_recall_audit(
        emb, truth_max_rows=None, **kw
    ).count() > 0
    assert semantic_dedup_recall_audit(
        emb, truth_max_rows=n, **kw
    ).count() > 0
    with pytest.raises(ValueError, match="truth_max_rows must be"):
        semantic_dedup_recall_audit(emb, truth_max_rows=1, **kw)


# ---------------------------------------------------------------------------
# verdict item 6: single-mine multi-level audit
# ---------------------------------------------------------------------------


def test_recall_audit_single_mine_in_plan(spark, _emb_cents):
    # With cell_cap=None the audit's candidate leg must hold exactly
    # ONE pair mine however many levels are audited. The vectorized
    # mine is an applyInPandas (FlatMapGroupsInPandas in the plan) —
    # under the old per-level loop three levels meant three of them.
    from awskinesisconsumer_spark.operators.similarity import (
        semantic_dedup_recall_audit,
    )

    emb, cents = _emb_cents
    aud = semantic_dedup_recall_audit(
        emb, id_col="vec_id", vec_col="embedding", centroids=cents,
        threshold=0.3, n_assign_values=(1, 2, 3), vectorized=True,
    )
    # analyzed logical plan: structural and deterministic (the
    # executed plan prints AQE Initial/Final sections, duplicating
    # shared subtrees)
    plan = aud._jdf.queryExecution().analyzed().toString()
    assert plan.count("FlatMapGroupsInPandas") == 1, plan


def test_recall_audit_multi_level_equals_per_level(spark, _emb_cents):
    # The single-mine (1, 2, 3) audit must emit exactly the union of
    # the three single-level audits — the minimal co-location rank
    # tagging is a pure refactor of the per-level mines, not a new
    # semantics (each single-level call mines at its own depth, so
    # it IS the old loop body).
    from awskinesisconsumer_spark.operators.similarity import (
        semantic_dedup_recall_audit,
    )

    emb, cents = _emb_cents
    kw = dict(id_col="vec_id", vec_col="embedding", centroids=cents,
              threshold=0.3)
    multi = sorted(
        tuple(r) for r in semantic_dedup_recall_audit(
            emb, n_assign_values=(1, 2, 3), **kw
        ).collect()
    )
    singles = sorted(
        tuple(r)
        for n in (1, 2, 3)
        for r in semantic_dedup_recall_audit(
            emb, n_assign_values=(n,), **kw
        ).collect()
    )
    assert multi == singles


def test_recall_audit_capped_fallback_still_bounded(spark, _emb_cents):
    # With a cell_cap the per-level cap pair genuinely differs per
    # level, so the audit falls back to one mine per level — output
    # still well-formed and recall still within [0, 1].
    from awskinesisconsumer_spark.operators.similarity import (
        semantic_dedup_recall_audit,
    )

    emb, cents = _emb_cents
    rows = semantic_dedup_recall_audit(
        emb, id_col="vec_id", vec_col="embedding", centroids=cents,
        threshold=0.3, n_assign_values=(1, 2), cell_cap=50,
    ).collect()
    assert rows
    assert all(0.0 <= r["recall"] <= 1.0 for r in rows)
    assert all(r["n_caught"] <= r["n_true_pairs"] for r in rows)


# ---------------------------------------------------------------------------
# verdict item 7: grouped/stratified bootstrap CI
# ---------------------------------------------------------------------------


def test_bootstrap_ci_grouped_equals_per_group_ungrouped(spark):
    # Stratification must be exact: each group's CI row equals
    # running the ungrouped bootstrap_ci on that group's slice alone
    # (the (id, salt, b) weight hash never sees the group, so the
    # draws are identical).
    from awskinesisconsumer_spark.operators.evaluation import (
        bootstrap_ci, bootstrap_ci_grouped,
    )
    from awskinesisconsumer_spark.operators.text import token_count

    docs = token_count(
        _load(spark, SF_SMOKE, "documents"), text_col="text"
    )
    grouped = {
        r["group"]: tuple(r)[1:]
        for r in bootstrap_ci_grouped(
            docs, id_col="doc_id", value_col="n_tokens",
            group_col="lang", n_boot=50,
        ).collect()
    }
    assert len(grouped) >= 2, "fixture must have >= 2 languages"
    for g, want in grouped.items():
        solo = bootstrap_ci(
            docs.where(F.col("lang") == g),
            id_col="doc_id", value_col="n_tokens", n_boot=50,
        ).collect()
        assert len(solo) == 1
        assert tuple(solo[0]) == want, g


def test_bootstrap_ci_grouped_validation(spark):
    from awskinesisconsumer_spark.operators.evaluation import (
        bootstrap_ci_grouped,
    )

    docs = _load(spark, SF_SMOKE, "documents")
    with pytest.raises(ValueError, match="n_boot"):
        bootstrap_ci_grouped(
            docs, id_col="doc_id", value_col="doc_id",
            group_col="lang", n_boot=1,
        )


# ---------------------------------------------------------------------------
# r14 second wave: evaluation & drift completion
# ---------------------------------------------------------------------------


def test_classification_report_hand_counts(spark):
    # 2x2 fixture with known counts: labels a,a,a,b; preds a,b,a,b
    # -> class a: tp=2 n_true=3 n_pred=2; class b: tp=1 n_true=1
    # n_pred=2; accuracy 3/4.
    from awskinesisconsumer_spark.operators.evaluation import (
        classification_report,
    )

    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("a", "a"), ("b", "b")],
        "label string, pred string",
    )
    rows = {r["cls"]: r for r in classification_report(
        df, label_col="label", pred_col="pred"
    ).collect()}
    a, b, al = rows["a"], rows["b"], rows["__all__"]
    assert (a["tp"], a["n_true"], a["n_pred"]) == (2, 3, 2)
    assert a["precision"] == 1.0 and a["recall"] == 0.666667
    assert a["f1"] == 0.8  # 2*2/(2+3)
    assert (b["tp"], b["n_true"], b["n_pred"]) == (1, 1, 2)
    assert b["precision"] == 0.5 and b["recall"] == 1.0
    assert al["tp"] == 3 and al["precision"] == 0.75
    assert al["precision"] == al["recall"] == al["f1"]


def test_classification_report_unseen_class_nulls(spark):
    # A class never predicted gets NULL precision (0/0), one never
    # labeled gets NULL recall — not a crash, not a fake 0.
    from awskinesisconsumer_spark.operators.evaluation import (
        classification_report,
    )

    df = spark.createDataFrame(
        [("a", "b"), ("a", "b")], "label string, pred string"
    )
    rows = {r["cls"]: r for r in classification_report(
        df, label_col="label", pred_col="pred"
    ).collect()}
    assert rows["a"]["precision"] is None and rows["a"]["recall"] == 0.0
    assert rows["b"]["recall"] is None and rows["b"]["precision"] == 0.0


def test_ks_matrix_rows_equal_pairwise_ks(spark):
    # Every matrix row must replay ks_statistic on that pair exactly
    # — the kmv_overlap_matrix contract applied to drift.
    from awskinesisconsumer_spark.operators.evaluation import (
        ks_matrix, ks_statistic,
    )

    docs = _load(spark, SF_SMOKE, "documents").select(
        "lang", F.length("text").alias("n_chars")
    )
    mat = ks_matrix(docs, value_col="n_chars", group_col="lang")
    rows = mat.collect()
    assert len(rows) >= 3
    for r in rows[:4]:
        solo = ks_statistic(
            docs, value_col="n_chars", group_col="lang",
            group_a=r["group_a"], group_b=r["group_b"],
        ).collect()[0]
        assert tuple(r)[2:] == tuple(solo), (r["group_a"], r["group_b"])


def test_psi_drift_symmetric_and_nonnegative(spark):
    # (p-q)ln(p/q) >= 0 per bin, and swapping the slices leaves psi
    # unchanged (shared union edges make it truly symmetric).
    from awskinesisconsumer_spark.operators.evaluation import psi_drift

    docs = _load(spark, SF_SMOKE, "documents").select(
        "lang", F.length("text").alias("n_chars")
    )
    kw = dict(value_col="n_chars", group_col="lang", n_bins=10)
    ab = psi_drift(docs, group_a="en", group_b="fr", **kw).collect()[0]
    ba = psi_drift(docs, group_a="fr", group_b="en", **kw).collect()[0]
    assert ab["psi"] >= 0.0
    assert ab["psi"] == ba["psi"]
    assert (ab["n_a"], ab["n_b"]) == (ba["n_b"], ba["n_a"])
    with pytest.raises(ValueError, match="n_bins"):
        psi_drift(docs, group_a="en", group_b="fr",
                  value_col="n_chars", group_col="lang", n_bins=1)


def test_chao1_hand_fixture(spark):
    # terms: x x y z -> D=3, f1=2 (y,z), f2=1 (x);
    # chao1 = 3 + 2*1/(2*2) = 3.5
    from awskinesisconsumer_spark.operators.evaluation import chao1_vocab

    df = spark.createDataFrame(
        [(1, "x x y"), (2, "z")], "doc_id long, text string"
    )
    r = chao1_vocab(df, text_col="text").collect()[0]
    assert (r["n_tokens"], r["vocab_size"], r["f1"], r["f2"]) == (4, 3, 2, 1)
    assert r["chao1_est"] == 3.5


def test_confusion_stream_replay_and_equality(spark, tmp_path):
    # The streaming maintainer must (a) SUM-merge to exactly the
    # batch build over the union of arrivals and (b) skip an
    # at-least-once replay of a committed batch id instead of
    # double-counting — the cms/histogram state contract.
    from awskinesisconsumer_spark.operators.evaluation import (
        classification_report, classification_report_from_counts,
    )
    from awskinesisconsumer_spark.streaming.pipeline import (
        _confusion_merge_fn,
    )

    out = str(tmp_path / "conf")
    merge = _confusion_merge_fn(
        label_col="label", pred_col="pred", out_path=out
    )
    b0 = spark.createDataFrame(
        [("a", "a"), ("a", "b")], "label string, pred string"
    )
    b1 = spark.createDataFrame(
        [("b", "b"), ("a", "a"), ("c", "a")], "label string, pred string"
    )
    merge(b0, 0)
    merge(b1, 1)
    merge(b1, 1)  # checkpoint replay after a crash-before-commit
    got = sorted(tuple(r) for r in classification_report_from_counts(
        spark.read.parquet(out).select("label", "pred", "n")
    ).collect())
    want = sorted(tuple(r) for r in classification_report(
        b0.unionByName(b1), label_col="label", pred_col="pred"
    ).collect())
    assert got == want
