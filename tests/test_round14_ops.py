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
