"""Round-3 operators: interval join, int8 quantization, user-sequence
construction, URL features."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def test_interval_join_matches_bruteforce(spark):
    # Randomized-ish (deterministic seed via id arithmetic) points and
    # intervals, including multi-bucket and overlapping intervals.
    pts = spark.range(200).select(
        F.col("id").alias("pid"), ((F.col("id") * 37) % 500).alias("p")
    )
    ivs = spark.range(40).select(
        F.col("id").alias("iid"),
        ((F.col("id") * 61) % 450).alias("s"),
    ).withColumn("e", F.col("s") + (F.col("iid") % 5) * 40)

    from awskinesisconsumer_spark.operators.range_join import interval_join

    got = interval_join(
        pts, ivs, point_col="p", start_col="s", end_col="e",
        bucket_width=32,
    ).select("pid", "iid").collect()
    want = (
        pts.crossJoin(ivs)
        .where((F.col("p") >= F.col("s")) & (F.col("p") < F.col("e")))
        .select("pid", "iid").collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(want) > 0  # the fixture actually exercises matches


def test_interval_join_left_and_boundaries(spark):
    pts = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99)], "pid int, p int"
    )
    ivs = spark.createDataFrame(
        [(100, 10, 20), (200, 20, 20)], "iid int, s int, e int"
    )
    from awskinesisconsumer_spark.operators.range_join import interval_join

    rows = {
        r.pid: r.iid
        for r in interval_join(
            pts, ivs, point_col="p", start_col="s", end_col="e",
            bucket_width=7, how="left",
        ).collect()
    }
    assert rows[1] == 100      # start is inclusive
    assert rows[2] is None     # end is exclusive; empty [20,20) matches nothing
    assert rows[3] is None     # unmatched point kept by left join
    with pytest.raises(ValueError):
        interval_join(pts, ivs, point_col="p", start_col="s",
                      end_col="e", bucket_width=7, how="full")


def test_quantize_embeddings_int8(spark):
    from awskinesisconsumer_spark.operators.similarity import (
        quantize_embeddings_int8,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, -2.0, 0.5]),
            (2, [0.0, 0.0]),
            (3, []),
            (4, None),
        ],
        "vec_id int, embedding array<float>",
    )
    out = {r.vec_id: r for r in
           quantize_embeddings_int8(df, vec_col="embedding").collect()}

    r1 = out[1]
    assert r1.qvec == [64, -127, 32]   # round(63.5) half-up, clamp, round(31.75)
    assert abs(r1.scale - 2.0 / 127) < 1e-8
    # reconstruction error bounded by half a quantization step
    assert 0 < r1.max_abs_err <= r1.scale / 2 + 1e-9

    assert out[2].scale == 0.0 and out[2].qvec == [0, 0]
    assert out[2].max_abs_err == 0.0
    assert out[3].qvec == [] and out[3].scale == 0.0
    assert out[3].max_abs_err is None
    assert out[4].qvec is None and out[4].max_abs_err is None


def test_build_user_sequences(spark):
    from awskinesisconsumer_spark.operators.corpus_prep import (
        build_user_sequences,
    )

    rows = [
        # user 1: 4 events, max_len 3 keeps the 3 most recent,
        # emitted in chronological order
        (1, 100, 1, "a"), (1, 200, 2, "b"), (1, 300, 3, "c"),
        (1, 400, 4, "d"),
        # user 2: tie on ts broken by event id (higher id = more recent)
        (2, 100, 10, "x"), (2, 100, 11, "y"),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts long, event_id long, event_type string"
    )
    out = {r.user_id: r for r in build_user_sequences(
        df, user_col="user_id", ts_col="ts", item_col="event_type",
        tiebreak_col="event_id", max_len=3,
    ).collect()}

    assert out[1].n_events == 4
    assert out[1].seq == ["b", "c", "d"]
    assert out[1].seq_start_ts == 200 and out[1].seq_end_ts == 400
    assert out[2].n_events == 2 and out[2].seq == ["x", "y"]


def test_url_features(spark):
    from awskinesisconsumer_spark.operators.text import url_features

    df = spark.createDataFrame(
        [
            (1, "HTTPS://WWW.Example.COM:443/Path/Sub/?q=1#frag"),
            (2, "http://spam-mill.com/offers"),
            (3, "not a url"),
            (4, None),
            (5, "http://localhost/x"),   # single-label host: no domain
        ],
        "doc_id int, url string",
    )
    out = {r.doc_id: r for r in url_features(df, url_col="url").collect()}

    assert out[1].norm_url == "https://example.com/Path/Sub"
    assert out[1].domain == "example.com" and out[1].blocked is False
    assert out[2].domain == "spam-mill.com" and out[2].blocked is True
    assert out[3].norm_url is None and out[3].blocked is False
    assert out[4].norm_url is None and out[4].blocked is False
    assert out[5].norm_url == "http://localhost/x"
    assert out[5].domain is None and out[5].blocked is False


# ---- BM25 ----------------------------------------------------------------

def test_bm25_rank_basic(spark):
    from awskinesisconsumer_spark.operators.text import bm25_rank

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark join"),
            (2, "spark filter"),
            (3, "filter scan sort merge"),
            (4, None),
        ],
        "doc_id int, text string",
    )
    out = bm25_rank(
        docs, id_col="doc_id", text_col="text",
        query_terms=["spark", "join"], k=10,
    ).collect()
    by_id = {r.doc_id: r for r in out}
    # doc 1 has both terms and the highest tf -> best score, rank 1
    assert by_id[1].rank == 1 and by_id[1].bm25 > by_id[2].bm25
    # doc with no query terms scores 0; null text scores 0 with dl 0
    assert by_id[3].bm25 == 0.0
    assert by_id[4].bm25 == 0.0 and by_id[4].doc_len == 0
    # ranks are dense 1..n with doc_id tiebreak on equal scores
    assert sorted(r.rank for r in out) == list(range(1, len(out) + 1))


def test_bm25_respects_k(spark):
    from awskinesisconsumer_spark.operators.text import bm25_rank

    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("spark word"), F.col("id")).alias("text"),
    )
    out = bm25_rank(
        docs, id_col="doc_id", text_col="text", query_terms=["spark"], k=7
    )
    assert out.count() == 7


# ---- word entropy --------------------------------------------------------

def test_word_entropy_values(spark):
    import math

    from awskinesisconsumer_spark.operators.text import word_entropy

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),          # single symbol -> 0
            (2, "a b a b"),          # two equiprobable -> ln 2
            (3, ""),                 # empty -> 0
            (4, None),               # null -> 0
            (5, "a b c d"),          # uniform over 4 -> ln 4
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.entropy for r in
           word_entropy(docs, text_col="text").collect()}
    assert got[1] == 0.0
    assert got[2] == round(math.log(2), 4)
    assert got[3] == 0.0 and got[4] == 0.0
    assert got[5] == round(math.log(4), 4)


def test_word_entropy_fallback_path_is_bit_identical(spark):
    # The explode+groupBy long-doc path must agree bit-for-bit with
    # the narrow sorted-fold path: same exact integer counts, same
    # word-sorted float summation order. fallback_tokens=0 forces
    # EVERY non-empty doc through the fallback; compare against the
    # all-narrow plan on mixed skewed/uniform/empty docs.
    import random

    from awskinesisconsumer_spark.operators.text import word_entropy

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 300))))
        for i in range(30)
    ] + [(97, "zz " * 500), (98, ""), (99, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    narrow = {r.doc_id: r.entropy for r in word_entropy(
        docs, text_col="text"
    ).collect()}
    mixed = {r.doc_id: r.entropy for r in word_entropy(
        docs, text_col="text", id_col="doc_id", fallback_tokens=0
    ).collect()}
    assert mixed == narrow
    # Threshold routing keeps every row exactly once.
    split = word_entropy(
        docs, text_col="text", id_col="doc_id", fallback_tokens=150
    )
    assert sorted(r.doc_id for r in split.collect()) == sorted(
        r[0] for r in rows
    )


# ---- changelog compaction ------------------------------------------------

def test_compact_latest_upserts_and_tombstones(spark):
    from awskinesisconsumer_spark.operators.compaction import compact_latest

    log = spark.createDataFrame(
        [
            # key (k) : seq, payload v, op
            ("a", 1, 10, "upsert"),
            ("a", 3, 30, "upsert"),
            ("a", 2, 20, "upsert"),
            ("b", 1, 1, "upsert"),
            ("b", 5, 5, "delete"),   # latest is a tombstone -> dropped
            ("c", 9, 99, "delete"),
            ("c", 10, 100, "upsert"),  # delete then re-insert -> kept
        ],
        "k string, seq int, v int, op string",
    )
    out = {r.k: r for r in compact_latest(
        log, key_cols=["k"], seq_col="seq", op_col="op"
    ).collect()}
    assert set(out) == {"a", "c"}
    assert out["a"].v == 30 and out["a"].last_seq == 3 and out["a"].n_versions == 3
    assert out["c"].v == 100 and out["c"].n_versions == 2
    assert "op" not in compact_latest(
        log, key_cols=["k"], seq_col="seq", op_col="op"
    ).columns


def test_compact_latest_no_op_col(spark):
    from awskinesisconsumer_spark.operators.compaction import compact_latest

    log = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20)], "k string, seq int, v int"
    )
    rows = compact_latest(log, key_cols=["k"], seq_col="seq").collect()
    assert len(rows) == 1 and rows[0].v == 20 and rows[0].n_versions == 2


# ---- shard assignment ----------------------------------------------------

def test_shard_assign_deterministic_and_complete(spark):
    from awskinesisconsumer_spark.operators.corpus_prep import shard_assign

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("toks")
    )
    out = shard_assign(
        df, key_col="k", n_shards=8, token_col="toks"
    ).collect()
    assert sum(r.n_rows for r in out) == 1000
    assert {r.shard for r in out} <= set(range(8))
    # same inputs -> identical assignment (rerun)
    out2 = shard_assign(
        df, key_col="k", n_shards=8, token_col="toks"
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # different salt -> different routing (with overwhelming probability)
    out3 = shard_assign(
        df, key_col="k", n_shards=8, salt="v2", token_col="toks"
    ).collect()
    assert sorted(map(tuple, out3)) != sorted(map(tuple, out))


def test_shard_assign_no_tokens(spark):
    from awskinesisconsumer_spark.operators.corpus_prep import shard_assign

    df = spark.range(100).select(F.col("id").alias("k"))
    cols = shard_assign(df, key_col="k", n_shards=4).columns
    assert cols == ["shard", "n_rows", "min_key", "max_key"]


def test_compact_latest_null_op_is_upsert(spark):
    # Regression: a NULL op marker means "no marker" (upsert), and a
    # bare != filter would silently drop the key (NULL comparison).
    from awskinesisconsumer_spark.operators.compaction import compact_latest

    log = spark.createDataFrame(
        [("a", 1, 10, "upsert"), ("a", 2, 20, None),
         ("b", 1, 1, "delete")],
        "k string, seq int, v int, op string",
    )
    out = {r.k: r for r in compact_latest(
        log, key_cols=["k"], seq_col="seq", op_col="op"
    ).collect()}
    assert set(out) == {"a"} and out["a"].v == 20


# ---- count-min sketch ----------------------------------------------------

def test_cms_overcounts_never_undercounts(spark):
    from awskinesisconsumer_spark.operators.sketches import cms_heavy_hitters

    docs = spark.createDataFrame(
        [(i, "alpha beta " + ("gamma " * (i % 4))) for i in range(60)],
        "doc_id int, text string",
    )
    # Tiny width forces collisions -> estimates must still be >= exact.
    out = cms_heavy_hitters(
        docs, text_col="text", k=10, depth=3, width=8
    ).collect()
    assert len(out) > 0
    for r in out:
        assert r.cms_est >= r.exact
    # With ample width there are no collisions: est == exact.
    wide = cms_heavy_hitters(
        docs, text_col="text", k=10, depth=4, width=4096
    ).collect()
    assert all(r.cms_est == r.exact for r in wide)
    # ranks deterministic and dense
    assert sorted(r.rank for r in wide) == list(range(1, len(wide) + 1))


def test_split_leakage_free_clusters_never_straddle(spark):
    from awskinesisconsumer_spark.operators.corpus_prep import (
        split_leakage_free,
    )

    docs = spark.range(100).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (50, 99)], "id_a long, id_b long"
    )
    out = split_leakage_free(
        docs, id_col="doc_id", pairs=pairs, val_fraction=0.3
    )
    rows = out.collect()
    assert len(rows) == 100
    # every cluster maps to exactly one split
    per_cluster = out.groupBy("cluster_id").agg(
        F.countDistinct("split").alias("n")
    ).collect()
    assert all(r.n == 1 for r in per_cluster)
    # linked docs share cluster AND split
    by_id = {r.doc_id: r for r in rows}
    assert by_id[0].split == by_id[1].split == by_id[2].split
    assert by_id[50].split == by_id[99].split
    # both splits are populated at 30%
    splits = {r.split for r in rows}
    assert splits == {"train", "val"}


def test_pq_adc_recall_and_code_shape(spark):
    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.similarity import (
        knn_brute_force, knn_pq_adc, pq_codebooks_from_sample,
    )

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    probe = emb.where(F.col("vec_id") == 0).select("embedding").head()
    corpus = emb.where(F.col("vec_id") != 0)
    q = [float(x) for x in probe.embedding]
    cbs = pq_codebooks_from_sample(
        corpus, id_col="vec_id", vec_col="embedding", m=8, ksub=16
    )
    assert len(cbs) == 8 and len(cbs[0]) == 16 and len(cbs[0][0]) == 8
    approx = knn_pq_adc(
        corpus, id_col="vec_id", vec_col="embedding", query=q,
        codebooks=cbs, k=10,
    ).collect()
    assert len(approx) == 10
    assert all(len(r.pq_code) == 8 for r in approx)
    assert all(0 <= c < 16 for r in approx for c in r.pq_code)
    # quantized distances approximate L2 — compare against the exact
    # L2 top-10 (NOT cosine: different metric on unnormalized
    # vectors). A 16-centroid/subspace seed quantizer is coarse, so
    # assert the recall properties that matter: the exact winners sit
    # inside a modest ADC shortlist, and the re-rank path recovers
    # them near-perfectly.
    import numpy as np

    rows = corpus.select("vec_id", "embedding").collect()
    qv = np.array(q)
    l2 = sorted(
        (float(((np.array(r.embedding) - qv) ** 2).sum()), r.vec_id)
        for r in rows
    )
    exact_ids = {vid for _, vid in l2[:10]}
    shortlist = knn_pq_adc(
        corpus, id_col="vec_id", vec_col="embedding", query=q,
        codebooks=cbs, k=100,
    ).collect()
    assert len(exact_ids & {r.vec_id for r in shortlist}) >= 8
    reranked = knn_pq_adc(
        corpus, id_col="vec_id", vec_col="embedding", query=q,
        codebooks=cbs, k=10, rerank=100,
    ).collect()
    assert len(exact_ids & {r.vec_id for r in reranked}) >= 8

    # Lloyd-trained codebooks (pq_codebooks_refined) must not degrade
    # recall@10-in-shortlist vs the sampled seed, and must strictly
    # reduce per-subspace quantization error (the k-means objective).
    from awskinesisconsumer_spark.operators.similarity import (
        pq_codebooks_refined, pq_encode,
    )

    rcbs = pq_codebooks_refined(
        corpus, id_col="vec_id", vec_col="embedding", m=8, ksub=16,
        n_iter=2, order_col="vec_id",
    )
    assert len(rcbs) == 8 and len(rcbs[0]) == 16 and len(rcbs[0][0]) == 8

    def sq_err(codebooks):
        enc = pq_encode(
            corpus, vec_col="embedding", codebooks=codebooks
        ).collect()
        tot = 0.0
        for r in enc:
            v = np.array(r.embedding, dtype=float)
            rec = np.concatenate([
                np.array(codebooks[j][c]) for j, c in enumerate(r.pq_code)
            ])
            tot += float(((v - rec) ** 2).sum())
        return tot

    assert sq_err(rcbs) < sq_err(cbs), (
        "refinement did not reduce quantization error"
    )

    # Recall compared as the MEAN over 20 probe vectors (a single
    # probe on a 499-vector fixture is coin-flip noise): the trained
    # codebooks must not lose to the sampled seed on shortlist-100
    # recall of the exact L2 top-10.
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows], dtype=float)

    def mean_recall(codebooks, K=100):
        enc = pq_encode(
            corpus, vec_col="embedding", codebooks=codebooks
        ).select("vec_id", "pq_code").collect()
        by_id = {r.vec_id: r.pq_code for r in enc}
        code_mat = np.array([by_id[v] for v in ids])
        recalls = []
        for pi in range(20):
            pq_q = V[pi]
            luts = [
                np.array([
                    ((pq_q[j * 8:(j + 1) * 8] - np.array(c)) ** 2).sum()
                    for c in cb
                ])
                for j, cb in enumerate(codebooks)
            ]
            adc = np.array([
                sum(luts[j][code_mat[i, j]] for j in range(8))
                for i in range(len(ids))
            ])
            adc[pi] = np.inf
            d = ((V - pq_q) ** 2).sum(1)
            d[pi] = np.inf
            exact10 = set(ids[np.argsort(d)[:10]])
            short = set(ids[np.argsort(adc)[:K]])
            recalls.append(len(exact10 & short) / 10)
        return float(np.mean(recalls))

    assert mean_recall(rcbs) >= mean_recall(cbs), (
        "trained codebooks lost shortlist recall vs the sampled seed"
    )


def test_ngram_containment_catches_subdocument(spark):
    from awskinesisconsumer_spark.operators.dedup import (
        ngram_containment_pairs, ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, "totally different words here now")],
        "doc_id int, text string",
    )
    cont = {(r.id_a, r.id_b): r.containment
            for r in ngram_containment_pairs(
                docs, id_col="doc_id", text_col="text", threshold=0.8
            ).collect()}
    # the short doc is fully contained -> containment 1.0
    assert cont.get((1, 2)) == 1.0
    # ...but Jaccard at the same bar misses it (union is huge)
    jac = ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", threshold=0.8
    ).collect()
    assert (1, 2) not in {(r.id_a, r.id_b) for r in jac}


def test_salted_join_matches_plain_join(spark):
    from awskinesisconsumer_spark.operators.skew import salted_join

    facts = spark.range(500).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(7)], "k long, label string"
    )
    got = salted_join(facts, dim, key="k", salt_buckets=4)
    want = facts.join(dim, "k")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert "_salt" not in got.columns

    # left join: unmatched FACT rows survive exactly once
    sparse_dim = dim.where(F.col("k") < 3)
    got_l = salted_join(facts, sparse_dim, key="k", salt_buckets=4,
                        how="left")
    want_l = facts.join(sparse_dim, "k", "left")
    assert sorted(map(tuple, got_l.collect())) == \
        sorted(map(tuple, want_l.collect()))

    # right/full would emit unmatched dim rows once per salt replica —
    # rejected up front
    import pytest as _pytest
    for bad in ("right", "full", "outer"):
        with _pytest.raises(ValueError, match="inner/left"):
            salted_join(facts, dim, key="k", salt_buckets=4, how=bad)

    # MapType fact columns must not break the salt derivation (the old
    # whole-row-hash salt raised AnalysisException on maps)
    mfacts = facts.withColumn("m", F.create_map(F.lit("a"), F.col("v")))
    got_m = salted_join(mfacts.select("k", "v", "m"), dim, key="k",
                        salt_buckets=4)
    assert got_m.count() == want.count()


def test_compaction_rejects_audit_column_collision(spark):
    from awskinesisconsumer_spark.operators.compaction import (
        compact_latest,
    )

    log = spark.createDataFrame(
        [(1, 1, "a", 7)], "k int, seq int, payload string, last_seq int"
    )
    import pytest as _pytest
    with _pytest.raises(ValueError, match="last_seq"):
        compact_latest(log, key_cols=["k"], seq_col="seq")


def test_ngram_novelty_ordering(spark):
    from awskinesisconsumer_spark.operators.text import ngram_novelty

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x"), (4, None)],
        "doc_id int, text string",
    )
    got = {r.doc_id: r for r in ngram_novelty(
        docs, id_col="doc_id", text_col="text", n=3
    ).collect()}
    assert got[1].novelty == 1.0          # first occurrence
    assert got[2].novelty == 0.0          # exact repeat of doc 1
    assert got[3].n_grams == 0 and got[3].novelty == 1.0  # too short
    assert got[4].n_grams == 0 and got[4].novelty == 1.0  # null text


def test_containment_symmetric_under_hot_cap(spark):
    # Boilerplate quoted in MANY docs: with a symmetric filtered
    # universe the pair surfaces at full containment when the cap is
    # raised, and is absent (not falsely low) at the default cap.
    from awskinesisconsumer_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    boiler = "lorem ipsum dolor sit amet consectetur"
    docs = [(0, boiler)] + [
        (i, boiler + f" unique tail {i} words {i * 7} here {i * 13}")
        for i in range(1, 9)
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    # cap low enough that the boilerplate shingles are hot (8+ docs)
    low = ngram_containment_pairs(
        df, id_col="doc_id", text_col="text", threshold=0.9, hot_cap=4
    ).collect()
    assert (0, 1) not in {(r.id_a, r.id_b) for r in low}
    # raised cap: full-containment pairs for the boilerplate doc
    high = {(r.id_a, r.id_b): r.containment
            for r in ngram_containment_pairs(
                df, id_col="doc_id", text_col="text", threshold=0.9,
                hot_cap=50,
            ).collect()}
    assert high.get((0, 1)) == 1.0
