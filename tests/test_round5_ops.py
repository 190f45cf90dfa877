"""Unit tests for the round-5 additions: the r6-banked trio
(snapshot_diff, domain_cap, bpe_encode_corpus) plus edge semantics
the sf-fixture parity tests (test_banked_parity.py) cannot reach."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------ snapshot diff

def test_snapshot_diff_statuses(spark):
    from awskinesisconsumer_spark.operators.compaction import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 99), (4, "d", 40)],
        "k long, s string, v long",
    )
    got = {r.k: r.diff_status for r in snapshot_diff(
        old, new, key_cols=["k"]
    ).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_null_vs_empty_and_column_bleed(spark):
    # The length-prefixed serialization must distinguish NULL from ''
    # and ('ab','c') from ('a','bc') — naive concat collides on both.
    from awskinesisconsumer_spark.operators.compaction import snapshot_diff

    old = spark.createDataFrame(
        [(1, None, ""), (2, "ab", "c")], "k long, a string, b string"
    )
    new = spark.createDataFrame(
        [(1, "", None), (2, "a", "bc")], "k long, a string, b string"
    )
    got = {r.k: r.diff_status for r in snapshot_diff(
        old, new, key_cols=["k"]
    ).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_snapshot_diff_missing_compare_col_raises(spark):
    from awskinesisconsumer_spark.operators.compaction import snapshot_diff

    old = spark.createDataFrame([(1, "a")], "k long, a string")
    new = spark.createDataFrame([(1, "a", "x")], "k long, a string, b string")
    with pytest.raises(ValueError, match="absent from the old snapshot"):
        snapshot_diff(old, new, key_cols=["k"])
    # Explicit compare_cols on the shared subset works.
    out = snapshot_diff(old, new, key_cols=["k"], compare_cols=["a"])
    assert out.collect()[0].diff_status == "unchanged"


# ------------------------------------------------------------ domain cap

def test_domain_cap_priority_and_tiebreak(spark):
    from awskinesisconsumer_spark.operators.corpus_prep import domain_cap

    rows = [("d1", 1, 0.9), ("d1", 2, 0.9), ("d1", 3, 0.5),
            ("d2", 4, 0.1)]
    df = spark.createDataFrame(rows, "dom string, id long, q double")
    out = {r.id: (r.rank_in_group, r.kept) for r in domain_cap(
        df, group_col="dom", cap=2,
        order_by=[F.col("q").desc()], id_col="id",
    ).collect()}
    # Equal quality ties break on id ascending; rank 3 is cut.
    assert out[1] == (1, True) and out[2] == (2, True)
    assert out[3] == (3, False)
    assert out[4] == (1, True)


def test_domain_cap_hash_path_is_deterministic(spark):
    from awskinesisconsumer_spark.operators.corpus_prep import domain_cap

    df = spark.createDataFrame(
        [("d", i) for i in range(50)], "dom string, id long"
    ).repartition(8)
    kept1 = sorted(
        r.id for r in domain_cap(
            df, group_col="dom", cap=10, id_col="id"
        ).where("kept").collect()
    )
    kept2 = sorted(
        r.id for r in domain_cap(
            df.repartition(3), group_col="dom", cap=10, id_col="id"
        ).where("kept").collect()
    )
    assert kept1 == kept2 and len(kept1) == 10
    # Hash order is not id order (it is a spread sample).
    assert kept1 != list(range(10))


def test_domain_cap_rejects_ambiguous_call(spark):
    from awskinesisconsumer_spark.operators.corpus_prep import domain_cap

    df = spark.createDataFrame([("d", 1, 0.5)], "dom string, id long, q double")
    with pytest.raises(ValueError, match="nondeterministic"):
        domain_cap(df, group_col="dom", cap=1)
    # order_by alone is not enough: its ties need the id tie-break.
    with pytest.raises(ValueError, match="nondeterministic"):
        domain_cap(df, group_col="dom", cap=1,
                   order_by=[F.col("q").desc()])
    with pytest.raises(ValueError, match="cap must be"):
        domain_cap(df, group_col="dom", cap=0, id_col="id")


# ------------------------------------------------------------ bpe encode

def test_bpe_encode_matches_hand_tokenization(spark):
    from awskinesisconsumer_spark.operators.text import bpe_encode_corpus

    docs = spark.createDataFrame(
        [(1, "aaab aaab ab"), (2, "b b b"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    # merges in rank order: (a,a) then (aa,b)
    out = {r.doc_id: (r.n_words, r.n_bpe_tokens) for r in bpe_encode_corpus(
        docs, id_col="doc_id", text_col="text",
        merges=[("a", "a"), ("aa", "b")],
    ).collect()}
    # 'aaab' -> a a a b </w> -> aa a b </w> (greedy left-to-right, no
    # re-scan of the merged symbol within the same pass) -> aa a b
    # stays (the second merge needs adjacent (aa, b)): a-a merge
    # yields [aa, a, b, </w>]; (aa,b) not adjacent -> 4 tokens.
    # 'ab' -> a b </w> -> 3 tokens. 'b' -> b </w> -> 2 tokens.
    assert out[1] == (3, 4 + 4 + 3)
    assert out[2] == (3, 6)
    assert out[3] == (0, 0) and out[4] == (0, 0)


def test_bpe_encode_agrees_with_trainer_vocab_state(spark):
    # Encoding with the trainer's merges must reproduce the trainer's
    # own final vocab tokenization: total bpe tokens == sum over the
    # vocab of freq * len(final toks). Random-ish corpus via fixed
    # seed words.
    from awskinesisconsumer_spark.operators.text import (
        bpe_encode_corpus, bpe_train_merges,
    )

    texts = ["lower lowest low", "newer newest new wider", "low low"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = [
        (r["left"], r["right"])
        for r in bpe_train_merges(docs, text_col="text", n_merges=5)
        .orderBy("rank").collect()
    ]
    out = bpe_encode_corpus(
        docs, id_col="doc_id", text_col="text", merges=merges
    )
    total = out.agg(F.sum("n_bpe_tokens")).first()[0]

    # Hand replay: tokenize each word, apply merges greedily.
    def enc(word):
        ts = list(word) + ["</w>"]
        for left, right in merges:
            o, i = [], 0
            while i < len(ts):
                if i + 1 < len(ts) and ts[i] == left and ts[i + 1] == right:
                    o.append(left + right)
                    i += 2
                else:
                    o.append(ts[i])
                    i += 1
            ts = o
        return len(ts)

    want = sum(enc(w) for t in texts for w in t.split())
    assert total == want


# ------------------------------------------------- streaming incremental dedup

def test_incremental_dedup_stream_equals_batch(spark, sf_dir, tmp_path):
    # Multi-batch streaming ingest (maxFilesPerTrigger=1 over a
    # 3-file source) must produce EXACTLY the single-batch result:
    # every flag depends only on (new doc, corpus), so chunking the
    # arrivals cannot change anything.
    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.dedup import dedup_incremental
    from awskinesisconsumer_spark.streaming.pipeline import (
        incremental_dedup_stream,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    new = docs.where(F.col("doc_id") % 3 == 0)
    corpus = docs.where(F.col("doc_id") % 3 != 0)

    src = str(tmp_path / "new_src")
    new.repartition(3).write.parquet(src)
    out_path = str(tmp_path / "flags")
    q = incremental_dedup_stream(
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", "1").parquet(src),
        corpus, id_col="doc_id", text_col="text",
        out_path=out_path, checkpoint=str(tmp_path / "ckpt"),
        min_overlap=5,
    )
    assert q.awaitTermination(180)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 3  # genuinely multi-batch

    got = sorted(
        (r.doc_id, r.exact_dup, r.max_overlap, r.near_dup)
        for r in spark.read.parquet(out_path).collect()
    )
    want = sorted(
        (r.doc_id, r.exact_dup, r.max_overlap, r.near_dup)
        for r in dedup_incremental(
            new, corpus, id_col="doc_id", text_col="text", min_overlap=5
        ).collect()
    )
    assert got == want and len(got) > 0


# ------------------------------------------------------- randomized checks

def test_snapshot_diff_random_tables_match_python_replay(spark):
    # Randomized keyed snapshots (fixed seed): statuses must equal a
    # plain-Python diff of the same rows.
    import random

    from awskinesisconsumer_spark.operators.compaction import snapshot_diff

    rng = random.Random(11)
    keys = list(range(60))
    old_rows = {
        k: (f"u{rng.randint(0, 5)}", f"t{rng.randint(0, 3)}")
        for k in keys if rng.random() < 0.8
    }
    new_rows = {
        k: (f"u{rng.randint(0, 5)}", f"t{rng.randint(0, 3)}")
        for k in keys if rng.random() < 0.8
    }
    old = spark.createDataFrame(
        [(k, a, b) for k, (a, b) in old_rows.items()],
        "k long, a string, b string",
    )
    new = spark.createDataFrame(
        [(k, a, b) for k, (a, b) in new_rows.items()],
        "k long, a string, b string",
    )
    got = {r.k: r.diff_status for r in snapshot_diff(
        old, new, key_cols=["k"]
    ).collect()}
    want = {}
    for k in set(old_rows) | set(new_rows):
        if k not in old_rows:
            want[k] = "added"
        elif k not in new_rows:
            want[k] = "removed"
        elif old_rows[k] == new_rows[k]:
            want[k] = "unchanged"
        else:
            want[k] = "changed"
    assert got == want


def test_domain_cap_random_matches_python_hash_replay(spark):
    # The hash-spread kept set must equal a Python replay of the
    # md5-slice priority (portable_hash52 semantics), per group.
    import hashlib
    import random

    from awskinesisconsumer_spark.operators.corpus_prep import domain_cap

    rng = random.Random(23)
    rows = [(f"d{rng.randint(0, 4)}", i) for i in range(300)]
    df = spark.createDataFrame(rows, "dom string, id long").repartition(7)
    cap = 12
    got = sorted(
        (r.dom, r.id) for r in domain_cap(
            df, group_col="dom", cap=cap, id_col="id"
        ).where("kept").collect()
    )

    def h(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)

    want = []
    by_dom: dict[str, list[int]] = {}
    for dom, i in rows:
        by_dom.setdefault(dom, []).append(i)
    for dom, ids in by_dom.items():
        for i in sorted(ids, key=lambda x: (h(x), x))[:cap]:
            want.append((dom, i))
    assert got == sorted(want)


def test_semantic_decontaminate_vectorized_bit_equal(spark, sf_dir):
    # The numpy kernel folds dims sequentially (same float order as
    # the HOF left fold) and replays HALF_UP rounding — results must
    # be IDENTICAL, not approximately equal.
    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.similarity import (
        semantic_decontaminate,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    corpus = emb.where(F.col("vec_id") % 13 != 0)
    bench = emb.where(F.col("vec_id") % 13 == 0).select(
        F.col("vec_id").alias("bid"), F.col("embedding").alias("bvec")
    )
    kw = dict(id_col="vec_id", vec_col="embedding",
              bench_id_col="bid", bench_vec_col="bvec", threshold=0.8)
    hof = sorted(tuple(r) for r in semantic_decontaminate(
        corpus, bench, **kw
    ).collect())
    vec = sorted(tuple(r) for r in semantic_decontaminate(
        corpus, bench, vectorized=True, **kw
    ).collect())
    assert hof == vec and len(hof) > 0


def test_knn_join_vectorized_bit_equal(spark, sf_dir):
    from awskinesisconsumer_spark.io import load_table
    from awskinesisconsumer_spark.operators.similarity import knn_join_topk

    emb = load_table(spark, "embeddings", sf_dir)
    kw = dict(id_col="vec_id", vec_col="embedding",
              probe_ids=[0, 3, 7, 11], k=10)
    hof = sorted(tuple(r) for r in knn_join_topk(emb, **kw).collect())
    vec = sorted(tuple(r) for r in knn_join_topk(
        emb, vectorized=True, **kw
    ).collect())
    assert hof == vec and len(hof) == 40


def test_np_round6_matches_spark_round_on_boundaries(spark):
    # Doubles whose SHORTEST decimal representation ends exactly at
    # the .5e-7 boundary (e.g. 0.0588235) round UP through Spark's
    # BigDecimal HALF_UP but DOWN through a binary-value*1e6 floor —
    # the decimal-replay patch in _np_round6_half_up must agree with
    # Spark on them, and everywhere else.
    import numpy as np

    from awskinesisconsumer_spark.operators.similarity import (
        _np_round6_half_up,
    )

    vals = [0.0588235, -0.0588235, 0.1234565, 1.9999995, 5e-7,
            -5e-7, 123.4567895, 0.1, 0.25, 1.0 / 3.0, 0.9999995]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got_spark = [r[0] for r in df.select(
        F.round("x", 6).alias("r")
    ).collect()]
    got_np = [float(v) for v in _np_round6_half_up(np.array(vals))]
    assert got_spark == got_np


# ----------------------------------------- randomized replays, gated r5 trio

def test_winsorize_random_matches_python_replay(spark):
    # Independent python replay of the histogram-quantile
    # interpolation + clip (same expression order as the operator and
    # its DuckDB twin).
    import math
    import random

    from awskinesisconsumer_spark.operators.sketches import winsorize

    rng = random.Random(41)
    vals = [round(rng.uniform(0.37, 99.13), 3) for _ in range(500)]
    lo, hi, n_bins, p_lo, p_hi = 0.0, 100.0, 25, 0.05, 0.95
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {(round(r.v, 6)): (r.winsorized, r.clipped) for r in winsorize(
        df, value_col="v", lo=lo, hi=hi, n_bins=n_bins,
        p_low=p_lo, p_high=p_hi,
    ).collect()}

    width = (hi - lo) / n_bins
    bins: dict[int, int] = {}
    for v in vals:
        b = min(max(math.floor((v - lo) / width), 0), n_bins - 1)
        bins[b] = bins.get(b, 0) + 1
    total = sum(bins.values())

    def est(q):
        rank = math.ceil(q * total)
        cum = 0
        for b in sorted(bins):
            c = bins[b]
            cum += c
            if cum >= rank:
                return round(lo + (b + (rank - (cum - c)) / c) * width, 4)

    lo_cut, hi_cut = est(p_lo), est(p_hi)
    for v in vals:
        w = min(max(v, lo_cut), hi_cut)
        assert got[round(v, 6)] == (w, v != w)


def test_scd2_as_of_random_matches_python_replay(spark):
    import random

    from awskinesisconsumer_spark.operators.compaction import (
        scd2_as_of, scd2_versions,
    )

    rng = random.Random(43)
    rows = []
    oid = 0
    for k in range(10):
        t = 0
        for _ in range(rng.randint(1, 15)):
            t += rng.randint(1, 5)
            oid += 1
            rows.append((k, t, oid, rng.choice("abc")))
    df = spark.createDataFrame(
        rows, "k long, t long, o long, s string"
    ).selectExpr("k", "timestamp_seconds(t) AS t", "o", "s")
    dim = scd2_versions(df, key_col="k", ts_col="t", order_col="o",
                        state_col="s")
    import datetime as dt
    at = dt.datetime(1970, 1, 1, 0, 0, 20)
    got = sorted((r.k, r.o, r.s) for r in scd2_as_of(dim, at=at).collect())

    want = []
    by_key: dict[int, list] = {}
    for k, t, o, s in rows:
        by_key.setdefault(k, []).append((t, o, s))
    for k, evs in by_key.items():
        evs.sort()
        versions = []
        prev = None
        for t, o, s in evs:
            if prev is None or s != prev:
                versions.append([t, None, o, s])
            prev = s
        for i in range(len(versions) - 1):
            versions[i][1] = versions[i + 1][0]
        for t0, t1, o, s in versions:
            if t0 <= 20 and (t1 is None or t1 > 20):
                want.append((k, o, s))
    assert got == sorted(want) and len(got) == 10


def test_dedup_incremental_random_matches_python_replay(spark):
    # Includes a HOT 3-gram shared by >100 corpus docs, which the
    # postings cap must exclude from overlap counting.
    import hashlib
    import random

    from awskinesisconsumer_spark.operators.dedup import dedup_incremental

    rng = random.Random(47)
    vocab = [f"w{i}" for i in range(12)]
    hot = "h1 h2 h3"  # one shared gram across all corpus docs

    def doc(i, corpus):
        base = " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 10)))
        return (i, (hot + " " + base) if corpus else base)

    corpus_rows = [doc(i, True) for i in range(200)]
    new_rows = [doc(1000 + i, False) for i in range(40)]
    # one exact duplicate and one near duplicate of a corpus doc
    new_rows.append((2000, corpus_rows[0][1]))
    new_rows.append((2001, corpus_rows[1][1] + " tail"))
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    got = {r.doc_id: (r.exact_dup, r.max_overlap, r.near_dup)
           for r in dedup_incremental(
               new, corpus, id_col="doc_id", text_col="text",
               min_overlap=3,
           ).collect()}

    def norm(t):
        return t.strip().lower()

    def grams(t):
        ws = [w for w in norm(t).split() if w]
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    digests = {hashlib.sha256(norm(t).encode()).hexdigest()
               for _, t in corpus_rows}
    postings: dict[str, int] = {}
    cg = {i: grams(t) for i, t in corpus_rows}
    for gs in cg.values():
        for g in gs:
            postings[g] = postings.get(g, 0) + 1
    capped = {g for g, c in postings.items() if c > 100}
    assert "h1 h2 h3" in capped  # the hot gram really is capped
    for i, t in new_rows:
        exact = hashlib.sha256(norm(t).encode()).hexdigest() in digests
        best = 0
        ng = grams(t)
        for gs in cg.values():
            best = max(best, len((ng & gs) - capped))
        assert got[i] == (exact, best, best >= 3), i
    assert got[2000][0] is True and got[2001][2] is True


# ------------------------------------------------------ bench line contract

def test_bench_compact_line_fits_driver_tail_window():
    # The external driver stores ~1.1 KB of stdout tail and parses
    # JSON from it (BENCH_r04 recorded parsed=null when the line
    # overflowed). The compact line must parse, carry the required
    # keys, and stay under 950 bytes even with pathological timings.
    import json

    import bench

    timings = {n: 123.456 for n in bench.HEADLINE}
    full = {"metric": "headline_queries_total",
            "value": round(sum(timings.values()), 3), "unit": "sec",
            "queries": timings, "sf": 0.1, "reps": 3}
    line = bench.compact_line(full)
    assert len(line) <= 950
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["unit"] == "sec" and parsed["sf"] == 0.1
    assert 0 < len(parsed["queries"]) <= len(bench.CORE)
    assert set(parsed["queries"]) <= set(bench.HEADLINE)
    assert parsed["n_timed"] == len(bench.HEADLINE)
    # Every HEADLINE name must be a registered query.
    import __spark_entry__ as entry

    assert set(bench.HEADLINE) <= set(entry.queries())


def test_conf_mutating_entries_restore_session_conf(spark, sf_dir):
    # Entries that clamp spark.sql.shuffle.partitions for their
    # streaming phases / vocab loops run inside the DRIVER'S session
    # at the gate — leaking the clamp would poison every later entry
    # in the same run.
    import __spark_entry__ as entry

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    for name in ["stream-pause-resume", "sink-memory-bounded",
                 "ext-bpe-train"]:
        assert entry.queries()[name](spark, sf_dir).count() > 0, name
        assert spark.conf.get(key) == before, name
