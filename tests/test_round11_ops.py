"""Round-11 operator tests: the two r9-advised dedup scale/observability
items that r10's docstring falsely claimed (verdict r10 items 2-3) —
the keep-best per-doc pair cap (`cap_pairs_per_doc`, wired into
`dedup_keep_best(pair_cap=...)`) and the simhash capped-bucket audit
column (`with_capped_audit`) — plus the r10 ADVICE regression pins
(CDC warning dedup is filter-governed, `truncated_dim_recall`
validate_dims override).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from awskinesisconsumer_spark.io import load_table
from awskinesisconsumer_spark.operators.dedup import (
    cap_pairs_per_doc,
    dedup_keep_best,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)

SF = "/root/testdata/sf0.001"


def _scored_docs_and_pairs(spark):
    docs = load_table(spark, "documents", SF)
    scored = docs.select(
        "doc_id",
        F.length(F.coalesce(F.col("text"), F.lit("")))
        .cast("double").alias("score"),
    )
    pairs = ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", n=3, threshold=0.3
    )
    return scored, pairs


def test_cap_pairs_per_doc_bound_and_connectivity(spark):
    # A 20-doc near-clique (every pair a candidate) plus one isolated
    # pair: raw edges = C(20,2) + 1 = 191; with cap=2 the survivor
    # table must respect the 2*cap*docs bound and both components
    # must stay internally connected (the union-of-endpoints rule
    # keeps the min-id hub edges).
    n = 20
    rows = [(a, b, 1.0) for a in range(n) for b in range(a + 1, n)]
    rows.append((100, 101, 1.0))
    pairs = spark.createDataFrame(rows, "id_a long, id_b long, j double")
    assert pairs.count() == (n * (n - 1)) // 2 + 1

    capped = cap_pairs_per_doc(pairs, cap=2, order_col="j")
    n_capped = capped.count()
    n_docs = n + 2
    assert n_capped <= 2 * 2 * n_docs
    assert n_capped < (n * (n - 1)) // 2 + 1  # actually pruned

    # all-equal order values tie-break on ascending other-id, so every
    # doc keeps (min_id, self) — the hub star keeps the clique one
    # component; the isolated pair survives verbatim.
    from awskinesisconsumer_spark.operators.dedup import (
        connected_components,
    )
    cc = {
        r["id"]: r["cluster_id"]
        for r in connected_components(capped).collect()
    }
    assert len({cc[i] for i in range(n)}) == 1
    assert cc[100] == cc[101] == 100
    assert cc[0] != cc[100]


def test_cap_pairs_per_doc_validates(spark):
    pairs = spark.createDataFrame(
        [(1, 2)], "id_a long, id_b long"
    )
    with pytest.raises(ValueError, match="cap must be >= 1"):
        cap_pairs_per_doc(pairs, cap=0)


def test_keep_best_pair_cap_generous_equals_uncapped(spark):
    # With cap >= the max candidate degree the capped graph IS the raw
    # graph, so winners, clusters, and kept flags are identical — the
    # verdict's "identical winners on the fixture" leg.
    scored, pairs = _scored_docs_and_pairs(spark)
    base = dedup_keep_best(
        scored, pairs, id_col="doc_id", score_col="score"
    )
    capped = dedup_keep_best(
        scored, pairs, id_col="doc_id", score_col="score",
        pair_cap=10_000, pair_order_col="jaccard",
    )
    cols = ["doc_id", "cluster_id", "score", "kept"]
    assert sorted(map(tuple, base.select(cols).collect())) == sorted(
        map(tuple, capped.select(cols).collect())
    )


def test_keep_best_pair_cap_tight_keeps_one_winner_per_cluster(spark):
    # Tight cap on the real fixture: still a partition into clusters
    # with EXACTLY one kept doc per cluster, and every kept doc is its
    # cluster's (score desc, id asc) argmax — the invariant the cap
    # must not break even where it splits an over-merged cluster.
    scored, pairs = _scored_docs_and_pairs(spark)
    out = dedup_keep_best(
        scored, pairs, id_col="doc_id", score_col="score",
        pair_cap=2, pair_order_col="jaccard",
    ).collect()
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert sum(len(v) for v in by_cluster.values()) == len(out)
    for cid, members in by_cluster.items():
        kept = [m for m in members if m["kept"]]
        assert len(kept) == 1, f"cluster {cid}: {len(kept)} kept"
        best = min(members, key=lambda m: (-m["score"], m["doc_id"]))
        assert kept[0]["doc_id"] == best["doc_id"]


def _near_dup_fixture(spark):
    # 10 identical docs (ids 0..9) -> every one of their band buckets
    # exceeds a hot_cap of 5; 2 identical docs far away in id space
    # (100, 101) whose buckets hold ~2 docs and survive.
    hot_text = "alpha beta gamma delta epsilon zeta eta theta"
    cold_text = "completely different words about maritime navigation"
    rows = [(i, hot_text) for i in range(10)]
    rows += [(100, cold_text), (101, cold_text)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_capped_audit_fires_on_hot_fixture(spark):
    docs = _near_dup_fixture(spark)
    out = simhash_near_dup_pairs(
        docs, id_col="doc_id", text_col="text", bits=16,
        max_hamming=3, bands=4, hot_cap=5, with_capped_audit=True,
    ).collect()
    # the cold identical pair survives (its buckets are size <= 2+
    # collisions, under the cap via at least one untouched band)
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert (100, 101) in got
    # the hot group's 4 band buckets (10 docs each) were all capped —
    # the audit column reports them on every emitted row
    assert all(r["n_capped_buckets"] >= 4 for r in out)
    # and the hot group emitted no pairs at all (the silent loss the
    # audit makes visible)
    assert not any(a < 10 and b < 10 for a, b in got)


def test_simhash_capped_audit_zero_when_uncapped(spark):
    docs = _near_dup_fixture(spark)
    out = simhash_near_dup_pairs(
        docs, id_col="doc_id", text_col="text", bits=16,
        max_hamming=3, bands=4, hot_cap=None, with_capped_audit=True,
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    # lossless form: the hot clique's 45 pairs all come back
    assert sum(1 for a, b in got if a < 10 and b < 10) == 45
    assert all(r["n_capped_buckets"] == 0 for r in out)


def test_simhash_audit_default_off_schema_unchanged(spark):
    docs = _near_dup_fixture(spark)
    out = simhash_near_dup_pairs(
        docs, id_col="doc_id", text_col="text", bits=16,
        max_hamming=3, bands=4, hot_cap=5,
    )
    assert out.columns == ["id_a", "id_b", "hamming"]


def test_truncated_dim_recall_validate_override(spark):
    # ADVICE r10: the oversized-tier guard is an eager full-corpus
    # scan and a single short vector blocks the audit; the
    # validate_dims=False override must skip the raise (accepting the
    # documented clamp semantics) while the default still fails fast.
    from awskinesisconsumer_spark.operators.similarity import (
        truncated_dim_recall,
    )

    emb = load_table(spark, "embeddings", SF)
    short = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 0, F.slice("embedding", 1, 4))
        .otherwise(F.col("embedding")),
    )
    probes = [r["vec_id"] for r in emb.select("vec_id").limit(2).collect()]
    with pytest.raises(ValueError, match="exceeds the shortest"):
        truncated_dim_recall(
            short, id_col="vec_id", vec_col="embedding",
            probe_ids=probes, k=3, dim_tiers=(8,),
        )
    rows = truncated_dim_recall(
        short, id_col="vec_id", vec_col="embedding",
        probe_ids=probes, k=3, dim_tiers=(8,), validate_dims=False,
    ).collect()
    assert len(rows) > 0
