"""Unit/property tests for the round-4 analytics additions: the
distributed 2-D skyline, the salted batch k-NN join, deterministic
reservoir sampling, histogram quantiles, and PMI collocations —
each checked against an independent in-Python or single-window
formulation (the DuckDB twins live in test_oracle_parity)."""

from __future__ import annotations

import hashlib
import math
import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from awskinesisconsumer_spark.operators.analytics import skyline_2d
from awskinesisconsumer_spark.operators.sampling import (
    reservoir_sample_deterministic,
)
from awskinesisconsumer_spark.operators.similarity import (
    knn_join_topk,
    pairwise_topk_cosine,
)
from awskinesisconsumer_spark.operators.sketches import histogram_quantiles


def _brute_skyline(points):
    out = []
    for i, (x, y) in enumerate(points):
        dominated = any(
            (x2 <= x and y2 >= y and (x2 < x or y2 > y))
            for j, (x2, y2) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append((x, y))
    return sorted(out)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_skyline_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    # Duplicate-heavy grid so axis ties and full-point ties both occur.
    pts = [
        (float(rng.randint(0, 20)), float(rng.randint(0, 20)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "id long, x double, y double"
    )
    got = sorted(
        (r.x, r.y)
        for r in skyline_2d(df, x_col="x", y_col="y", n_buckets=7).collect()
    )
    assert got == _brute_skyline(pts)


def test_skyline_single_bucket_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 5.0), (2, 2.0, 9.0), (3, None, 9.0), (4, 2.0, None)],
        "id long, x double, y double",
    )
    got = sorted(
        (r.x, r.y)
        for r in skyline_2d(df, x_col="x", y_col="y", n_buckets=1).collect()
    )
    assert got == [(1.0, 5.0), (2.0, 9.0)]


def test_knn_join_equals_single_window(spark, sf_dir):
    from awskinesisconsumer_spark.io import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    probes = [0, 1, 2, 3]
    two_level = {
        (r.probe_id, r.knn_rank): r.neighbor_id
        for r in knn_join_topk(
            emb, id_col="vec_id", vec_col="embedding",
            probe_ids=probes, k=5, salt_buckets=4,
        ).collect()
    }
    single = pairwise_topk_cosine(
        emb, id_col="vec_id", vec_col="embedding", probe_ids=probes, k=5
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    expect = {
        (r.probe_id, r.rn): r.neighbor_id
        for r in single.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert two_level == {(p, int(r)): n for (p, r), n in expect.items()}


def test_reservoir_sample_deterministic_and_uniformish(spark):
    rows = [(i, f"g{i % 3}") for i in range(600)]
    df = spark.createDataFrame(rows, "id long, grp string")
    a = reservoir_sample_deterministic(
        df, group_col="grp", id_col="id", k=10
    )
    got = sorted((r.grp, r.id) for r in a.collect())
    # Replayable: same result on a repartitioned input.
    b = reservoir_sample_deterministic(
        df.repartition(13), group_col="grp", id_col="id", k=10
    )
    assert got == sorted((r.grp, r.id) for r in b.collect())
    assert len(got) == 30
    # Matches the md5-rank definition computed in plain Python.
    for grp in ("g0", "g1", "g2"):
        ids = [i for i, g in rows if g == grp]
        ranked = sorted(
            ids, key=lambda i: hashlib.md5(f"{grp}|{i}".encode()).hexdigest()
        )[:10]
        assert sorted(ranked) == [i for g, i in got if g == grp]


def test_histogram_quantiles_within_bin_width(spark):
    vals = [(float(i),) for i in range(1, 10001)]
    df = spark.createDataFrame(vals, "v double")
    out = {
        r.q: r.estimate
        for r in histogram_quantiles(
            df, value_col="v", lo=0.0, hi=10000.0, n_bins=100,
            quantiles=(0.5, 0.9),
        ).collect()
    }
    width = 100.0
    assert math.isclose(out[0.5], 5000.0, abs_tol=width)
    assert math.isclose(out[0.9], 9000.0, abs_tol=width)


def test_collocations_pmi_prefers_fixed_phrase(spark):
    # "alpha beta" always co-occurs; filler words are shuffled noise —
    # the fixed phrase must take rank 1.
    rng = random.Random(7)
    docs = []
    filler = ["x", "y", "z", "w", "v"]
    for i in range(60):
        ws = [rng.choice(filler) for _ in range(20)]
        ws.insert(rng.randint(0, 19), "alpha beta")
        docs.append((i, " ".join(ws)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from awskinesisconsumer_spark.operators.text import collocations_pmi

    top = collocations_pmi(df, text_col="text", min_count=5, k=5).collect()
    best = [r for r in top if r.rnk == 1][0]
    assert (best.w1, best.w2) == ("alpha", "beta")
    assert best.c_xy == 60


def test_pagerank_tiny_graph_matches_hand_calc(spark):
    # Path graph 0-1-2 (symmetric): deg(0)=deg(2)=1, deg(1)=2.
    from awskinesisconsumer_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1)], "src long, dst long"
    )
    got = {r.node: r.pagerank for r in pagerank(edges, iters=3).collect()}
    # Replay the same arithmetic in plain Python.
    pr = {0: 1 / 3, 1: 1 / 3, 2: 1 / 3}
    deg = {0: 1, 1: 2, 2: 1}
    base = (1.0 - 0.85) / 3
    for _ in range(3):
        nxt = {}
        for v, ins in {0: [1], 1: [0, 2], 2: [1]}.items():
            nxt[v] = base + 0.85 * sum(pr[u] / deg[u] for u in ins)
        pr = nxt
    assert got == {v: round(p, 6) for v, p in pr.items()}
    # Rank mass is conserved up to rounding.
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_pagerank_directed_dangling_and_sink_nodes(spark):
    # DIRECTED graph 0->1, 0->2, 1->2: node 2 appears only as a
    # destination (sink-only) AND has no out-edges (dangling). It must
    # stay in the output every iteration, and its mass must teleport
    # uniformly — total rank stays 1.
    from awskinesisconsumer_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2)], "src long, dst long"
    )
    got = {r.node: r.pagerank for r in pagerank(edges, iters=4).collect()}
    assert set(got) == {0, 1, 2}
    pr = {0: 1 / 3, 1: 1 / 3, 2: 1 / 3}
    base = (1.0 - 0.85) / 3
    for _ in range(4):
        dm = pr[2]  # node 2 is the only dangling node
        pr = {
            0: base + 0.85 * (0.0 + dm / 3.0),
            1: base + 0.85 * (pr[0] / 2 + dm / 3.0),
            2: base + 0.85 * ((pr[0] / 2 + pr[1] / 1) + dm / 3.0),
        }
    assert got == {v: round(p, 6) for v, p in pr.items()}
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_conversion_funnel_ordering_is_strict(spark):
    from awskinesisconsumer_spark.operators.analytics import (
        conversion_funnel,
    )
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # user 1 converts fully in order.
        (1, t(1), "signup"), (1, t(2), "click"), (1, t(3), "purchase"),
        # user 2 clicked BEFORE signup — click must not count.
        (2, t(2), "click"), (2, t(5), "signup"),
        # user 3 purchase before click-after-signup — not converted.
        (3, t(1), "signup"), (3, t(2), "purchase"), (3, t(3), "click"),
        # user 4 never signs up.
        (4, t(1), "click"), (4, t(2), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = conversion_funnel(
        df, user_col="user_id", ts_col="ts", type_col="event_type"
    ).collect()[0]
    assert (out.n_users, out.n_step0, out.n_step1, out.n_step2) == (4, 3, 2, 1)
    assert out.conv_1 == round(2 / 3, 4)
    assert out.conv_2 == 0.5


def test_zscore_outliers_flags_only_extremes(spark):
    from awskinesisconsumer_spark.operators.analytics import zscore_outliers

    rows = [(i, "g", 10.0) for i in range(50)] + [(99, "g", 1000.0)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    out = zscore_outliers(df, key_col="grp", value_col="v", threshold=3.0)
    got = out.collect()
    assert [r.id for r in got] == [99]
    # Constant group (sd == 0) produces no rows instead of dividing by 0.
    const = spark.createDataFrame(
        [(1, "c", 5.0), (2, "c", 5.0)], "id long, grp string, v double"
    )
    assert zscore_outliers(
        const, key_col="grp", value_col="v", threshold=1.0
    ).count() == 0


def test_scd2_collapses_runs_and_stamps_validity(spark):
    from awskinesisconsumer_spark.operators.compaction import scd2_versions
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        (1, t(1), 1, "a"), (1, t(2), 2, "a"), (1, t(3), 3, "b"),
        (1, t(4), 4, "b"), (1, t(5), 5, "a"),
        (2, t(1), 6, "x"),
    ]
    df = spark.createDataFrame(
        rows, "k long, ts timestamp, oid long, st string"
    )
    out = sorted(
        (r.k, r.st, r.effective_from.second,
         r.effective_to.second if r.effective_to else None, r.is_current)
        for r in scd2_versions(
            df, key_col="k", ts_col="ts", order_col="oid", state_col="st"
        ).collect()
    )
    assert out == [
        (1, "a", 1, 3, False),
        (1, "a", 5, None, True),
        (1, "b", 3, 5, False),
        (2, "x", 1, None, True),
    ]


def test_ann_join_recall_is_reasonable_and_subset_of_buckets(spark, sf_dir):
    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.similarity import (
        ann_join_srp, deterministic_planes, srp_bucket,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    planes = deterministic_planes(64, 8)
    out = ann_join_srp(
        emb, id_col="vec_id", vec_col="embedding",
        probe_ids=[0, 1], planes=planes, k=10,
    ).collect()
    assert {r.probe_id for r in out} == {0, 1}
    # Every returned neighbor really is within Hamming<=1 of its
    # probe's bucket.
    buckets = {
        r.vec_id: r.bucket
        for r in srp_bucket(
            emb, vec_col="embedding", planes=planes
        ).select("vec_id", "bucket").collect()
    }
    for r in out:
        h = bin(buckets[r.neighbor_id] ^ buckets[r.probe_id]).count("1")
        assert h <= 1
        assert r.neighbor_id != r.probe_id


def test_pagerank_empty_graph_returns_empty_not_error(spark):
    from awskinesisconsumer_spark.operators.graph import pagerank

    edges = spark.createDataFrame([], "src long, dst long")
    out = pagerank(edges, iters=3)
    assert out.count() == 0
    assert out.columns == ["node", "pagerank"]


def test_weighted_sample_prefers_heavy_rows(spark):
    # 500 rows, weight 100 for ids < 50, weight 1 otherwise: the
    # heavy 10% should take well over half of a k=50 sample under
    # A-ES; determinism across partitionings must hold exactly.
    from awskinesisconsumer_spark.operators.corpus_prep import (
        sample_weighted,
    )

    rows = [(i, 100 if i < 50 else 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = sample_weighted(df, id_col="id", weight_col="w", k=50).collect()
    heavy = sum(1 for r in got if r.id < 50)
    assert heavy >= 30, heavy
    again = sample_weighted(
        df.repartition(17), id_col="id", weight_col="w", k=50
    ).collect()
    assert sorted((r.id, r.sample_rank) for r in got) == sorted(
        (r.id, r.sample_rank) for r in again
    )


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_scd2_matches_bruteforce_on_random_changelogs(spark, seed):
    from awskinesisconsumer_spark.operators.compaction import scd2_versions
    import datetime as dt

    rng = random.Random(seed)
    rows = []
    oid = 0
    for k in range(8):
        for _ in range(rng.randint(1, 25)):
            oid += 1
            # Duplicate timestamps on purpose: the (ts, oid) tie-break
            # must decide run boundaries identically everywhere.
            rows.append((k, dt.datetime(2024, 1, 1, 0, 0,
                                        rng.randint(0, 30)),
                         oid, rng.choice("abc")))
    df = spark.createDataFrame(rows, "k long, ts timestamp, oid long, st string")
    got = sorted(
        (r.k, r.oid, r.st,
         r.effective_from, r.effective_to, r.is_current)
        for r in scd2_versions(
            df, key_col="k", ts_col="ts", order_col="oid", state_col="st"
        ).collect()
    )
    # Brute force in python: same (ts, oid) order, same run collapse.
    want = []
    for k in {r[0] for r in rows}:
        seq = sorted([r for r in rows if r[0] == k],
                     key=lambda r: (r[1], r[2]))
        runs = []
        for _, ts, o, st in seq:
            if not runs or runs[-1][2] != st:
                runs.append((ts, o, st))
        for i, (ts, o, st) in enumerate(runs):
            to = runs[i + 1][0] if i + 1 < len(runs) else None
            want.append((k, o, st, ts, to, to is None))
    assert got == sorted(want)


@pytest.mark.parametrize("seed", [21, 22])
def test_funnel_matches_bruteforce_on_random_events(spark, seed):
    from awskinesisconsumer_spark.operators.analytics import (
        conversion_funnel,
    )
    import datetime as dt

    rng = random.Random(seed)
    types = ["signup", "click", "purchase", "view"]
    rows = [
        (u, dt.datetime(2024, 1, 1, 0, 0, rng.randint(0, 59)),
         rng.choice(types))
        for u in range(30) for _ in range(rng.randint(0, 8))
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, "u long, ts timestamp, et string")
    out = conversion_funnel(
        df, user_col="u", ts_col="ts", type_col="et",
    ).collect()[0]

    def first_after(seq, typ, after):
        cands = [ts for ts, et in seq if et == typ
                 and (after is None or ts > after)]
        return min(cands) if cands else None

    r = [0, 0, 0]
    users = {u for u, _, _ in rows}
    for u in users:
        seq = [(ts, et) for uu, ts, et in rows if uu == u]
        t0 = first_after(seq, "signup", None)
        t1 = first_after(seq, "click", t0) if t0 else None
        t2 = first_after(seq, "purchase", t1) if t1 else None
        r[0] += t0 is not None
        r[1] += t1 is not None
        r[2] += t2 is not None
    assert (out.n_users, out.n_step0, out.n_step1, out.n_step2) == (
        len(users), r[0], r[1], r[2]
    )


@pytest.mark.parametrize("seed", [31, 32])
def test_histogram_quantiles_random_within_width(spark, seed):
    rng = random.Random(seed)
    vals = sorted(rng.uniform(0, 1000) for _ in range(5000))
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {
        r.q: r.estimate
        for r in histogram_quantiles(
            df, value_col="v", lo=0.0, hi=1000.0, n_bins=100,
            quantiles=(0.5, 0.99),
        ).collect()
    }
    for q in (0.5, 0.99):
        exact = vals[int(q * len(vals)) - 1]
        assert abs(out[q] - exact) <= 10.0 + 1e-6, (q, out[q], exact)


def test_round4_operators_tolerate_empty_input(spark):
    # Empty-input edge: none of the round-4 operators may raise on a
    # zero-row frame under ANSI mode (the pagerank 1/0 bug class).
    import datetime as dt  # noqa: F401
    from awskinesisconsumer_spark.operators.analytics import (
        conversion_funnel, zscore_outliers,
    )
    from awskinesisconsumer_spark.operators.compaction import scd2_versions
    from awskinesisconsumer_spark.operators.corpus_prep import (
        mixture_temperature_weights, sample_weighted,
    )
    from awskinesisconsumer_spark.operators.sampling import (
        reservoir_sample_deterministic,
    )
    from awskinesisconsumer_spark.operators.sketches import (
        histogram_quantiles,
    )
    from awskinesisconsumer_spark.operators.text import collocations_pmi

    ev = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_type string, "
            "event_id long, value double"
    )
    docs = spark.createDataFrame([], "doc_id long, text string, n_chars long")

    assert conversion_funnel(
        ev, user_col="user_id", ts_col="ts", type_col="event_type"
    ).collect()[0].n_users == 0
    assert zscore_outliers(
        ev, key_col="event_type", value_col="value"
    ).count() == 0
    assert scd2_versions(
        ev, key_col="user_id", ts_col="ts", order_col="event_id",
        state_col="event_type",
    ).count() == 0
    assert reservoir_sample_deterministic(
        ev, group_col="event_type", id_col="event_id", k=5
    ).count() == 0
    assert histogram_quantiles(
        ev, value_col="value", lo=0.0, hi=1.0, n_bins=10,
        quantiles=(0.5,),
    ).count() == 0
    assert collocations_pmi(docs, text_col="text").count() == 0
    assert sample_weighted(
        docs, id_col="doc_id", weight_col="n_chars", k=5
    ).count() == 0
    assert mixture_temperature_weights(
        docs.withColumn("source", docs.text), source_col="source"
    ).count() == 0


@pytest.mark.parametrize("seed", [41, 42])
def test_asof_nearest_matches_bruteforce(spark, seed):
    from awskinesisconsumer_spark.operators.asof_join import (
        asof_join_nearest,
    )
    import datetime as dt

    rng = random.Random(seed)
    lefts, rights = [], []
    for k in range(6):
        for i in range(rng.randint(0, 10)):
            lefts.append((k, 1000 + len(lefts),
                          dt.datetime(2024, 1, 1, 0, 0, rng.randint(0, 59))))
        for i in range(rng.randint(0, 5)):
            rights.append((k, 2000 + len(rights),
                           dt.datetime(2024, 1, 1, 0, 0, rng.randint(0, 59))))
    ldf = spark.createDataFrame(lefts, "k long, lid long, ts timestamp")
    rdf = spark.createDataFrame(
        rights, "k long, rid long, rts timestamp"
    )
    got = {
        r.lid: r.rid
        for r in asof_join_nearest(
            ldf, rdf, key="k", left_on="ts", right_on="rts"
        ).collect()
    }
    for k, lid, ts in lefts:
        cands = [(rts, rid) for kk, rid, rts in rights if kk == k]
        if not cands:
            assert got[lid] is None
            continue
        # nearest by |dt|; ties -> the backward (<=) side, i.e. prefer
        # rts <= ts; ties within a side -> the window's (rts, side)
        # order carries the LAST prior / FIRST next row.
        best = min(
            cands,
            key=lambda c: (abs((c[0] - ts).total_seconds()),
                           0 if c[0] <= ts else 1),
        )
        d_best = abs((best[0] - ts).total_seconds())
        chosen_ts = next(rts for kk, rid, rts in rights
                         if kk == k and rid == got[lid])
        # The operator must pick A nearest-timestamp row on the
        # correct side (equal-timestamp right rows are interchangeable
        # up to the window's internal order).
        assert abs((chosen_ts - ts).total_seconds()) == d_best
        if d_best > 0:
            assert (chosen_ts <= ts) == (best[0] <= ts)


def test_dedup_incremental_flags_exact_and_near(spark):
    from awskinesisconsumer_spark.operators.dedup import dedup_incremental

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            # exact duplicate (case/space-normalized)
            (10, "  ALPHA beta gamma delta epsilon zeta eta theta "),
            # near duplicate: long shared prefix with doc 2
            (11, "one two three four five six seven eight nine extra"),
            # fresh
            (12, "completely different words nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.exact_dup, r.near_dup, r.max_overlap)
        for r in dedup_incremental(
            new, corpus, id_col="doc_id", text_col="text", min_overlap=5
        ).collect()
    }
    assert out[10][0] is True
    assert out[11] == (False, True, 7)
    assert out[12] == (False, False, 0)


def test_winsorize_clips_at_histogram_quantiles(spark):
    from awskinesisconsumer_spark.operators.sketches import winsorize

    vals = [(float(i),) for i in range(1, 1001)]
    df = spark.createDataFrame(vals, "v double")
    out = winsorize(
        df, value_col="v", lo=0.0, hi=1000.0, n_bins=100,
        p_low=0.05, p_high=0.95,
    )
    rows = out.collect()
    mn = min(r.winsorized for r in rows)
    mx = max(r.winsorized for r in rows)
    # Cut points land within a bin width (10.0) of the exact p5/p95.
    assert abs(mn - 50.0) <= 10.0 and abs(mx - 950.0) <= 10.0
    n_clipped = sum(1 for r in rows if r.clipped)
    assert 80 <= n_clipped <= 120


@pytest.mark.parametrize("seed", [51, 52])
def test_asof_backward_matches_bruteforce(spark, seed):
    from awskinesisconsumer_spark.operators.asof_join import (
        asof_join_backward,
    )
    import datetime as dt

    rng = random.Random(seed)
    lefts, rights = [], []
    for k in range(6):
        for _ in range(rng.randint(0, 10)):
            lefts.append((k, 1000 + len(lefts),
                          dt.datetime(2024, 1, 1, 0, 0, rng.randint(0, 59))))
        for _ in range(rng.randint(0, 5)):
            rights.append((k, 2000 + len(rights),
                           dt.datetime(2024, 1, 1, 0, 0, rng.randint(0, 59))))
    ldf = spark.createDataFrame(lefts, "k long, lid long, ts timestamp")
    rdf = spark.createDataFrame(rights, "k long, rid long, rts timestamp")
    got = {
        r.lid: (r.rid, r.rts)
        for r in asof_join_backward(
            ldf, rdf, key="k", left_on="ts", right_on="rts"
        ).collect()
    }
    for k, lid, ts in lefts:
        cands = [(rts, rid) for kk, rid, rts in rights
                 if kk == k and rts <= ts]
        if not cands:
            assert got[lid] == (None, None)
        else:
            best_ts = max(c[0] for c in cands)
            # Greatest rts at-or-before; equal-rts rows are
            # interchangeable up to the window's internal order.
            assert got[lid][1] == best_ts
            assert got[lid][0] in {rid for rts, rid in cands
                                   if rts == best_ts}


def test_scd2_as_of_returns_one_version_per_active_key(spark):
    from awskinesisconsumer_spark.operators.compaction import (
        scd2_as_of, scd2_versions,
    )
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        (1, t(1), 1, "a"), (1, t(3), 2, "b"), (1, t(5), 3, "a"),
        (2, t(4), 4, "x"),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, oid long, st string")
    dim = scd2_versions(
        df, key_col="k", ts_col="ts", order_col="oid", state_col="st"
    )
    at = {r.k: r.st for r in scd2_as_of(dim, at=t(4)).collect()}
    assert at == {1: "b", 2: "x"}
    # Before any version of key 2 exists.
    at2 = {r.k: r.st for r in scd2_as_of(dim, at=t(2)).collect()}
    assert at2 == {1: "a"}
    # Open (current) versions match arbitrarily late instants.
    at3 = {r.k: r.st for r in scd2_as_of(dim, at=t(59)).collect()}
    assert at3 == {1: "a", 2: "x"}
