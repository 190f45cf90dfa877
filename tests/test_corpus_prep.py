"""Corpus-prep operators: decontamination and sequence packing."""

from pyspark.sql import functions as F

from awskinesisconsumer_spark.operators.corpus_prep import (
    decontaminate,
    mixture_allocation,
    pack_sequences,
    sample_stratified,
)


def test_decontaminate_flags_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely different sentence with unique words"),
            (3, "quick brown fox appears here too somehow"),
            (4, None),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")],
        "bench_id bigint, bench_text string",
    )
    out = {
        r.doc_id: r
        for r in decontaminate(
            docs, bench, id_col="doc_id", text_col="text",
            bench_id_col="bench_id", bench_text_col="bench_text",
            n=3, min_overlap=2,
        ).collect()
    }
    # doc 1 shares 3 distinct 3-grams with the benchmark; doc 3 only
    # one ("quick brown fox"); doc 2 and the null doc share none.
    assert out[1].contaminated and out[1].n_matched_ngrams == 3
    assert not out[3].contaminated and out[3].n_matched_ngrams == 1
    assert not out[2].contaminated and out[2].n_matched_ngrams == 0
    assert not out[4].contaminated and out[4].n_matched_ngrams == 0


def test_decontaminate_min_overlap_threshold(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id bigint, text string"
    )
    bench = spark.createDataFrame(
        [(9, "alpha beta gamma delta")], "bench_id bigint, bench_text string"
    )
    strict = decontaminate(
        docs, bench, id_col="doc_id", text_col="text",
        bench_id_col="bench_id", bench_text_col="bench_text",
        n=3, min_overlap=3,
    ).collect()[0]
    # only 2 distinct 3-grams exist in a 4-word doc
    assert strict.n_matched_ngrams == 2 and not strict.contaminated


def test_pack_sequences_layout(spark):
    # 5 docs, capacity 10: offsets 0-7, 7-12, 12-12 (empty), 12-22, 22-25
    rows = [(1, 7), (2, 5), (3, 0), (4, 10), (5, 3)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
    out = {
        r.doc_id: r
        for r in pack_sequences(
            df, id_col="doc_id", token_col="n_tokens",
            capacity=10, group_size=2,
        ).collect()
    }
    assert (out[1].tok_start, out[1].tok_end) == (0, 7)
    assert (out[1].seq_first, out[1].seq_last, out[1].n_seqs) == (0, 0, 1)
    # doc 2 straddles the seq 0/1 boundary (tokens 7..11)
    assert (out[2].tok_start, out[2].tok_end) == (7, 12)
    assert (out[2].seq_first, out[2].seq_last, out[2].n_seqs) == (0, 1, 2)
    # zero-token doc occupies no space, lands at its offset's sequence
    assert (out[3].tok_start, out[3].tok_end) == (12, 12)
    assert (out[3].seq_first, out[3].seq_last, out[3].n_seqs) == (1, 1, 1)
    # doc 4 spans tokens 12..21 -> seqs 1..2
    assert (out[4].seq_first, out[4].seq_last, out[4].n_seqs) == (1, 2, 2)
    assert (out[5].tok_start, out[5].tok_end) == (22, 25)


def test_decontaminate_plan_broadcasts_benchmark(spark):
    # The scale contract: the corpus is NEVER shuffled for the gram
    # join — the benchmark gram set broadcasts. A sort-merge join here
    # would shuffle 100 TB of (doc, gram) rows.
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), F.col("id").cast("string"),
                 F.lit(" a b c d e")).alias("text"),
    )
    bench = spark.createDataFrame(
        [(1, "a b c d e")], "bench_id bigint, bench_text string"
    )
    out = decontaminate(
        docs, bench, id_col="doc_id", text_col="text",
        bench_id_col="bench_id", bench_text_col="bench_text",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pack_sequences_plan_no_global_window(spark):
    # The two-pass prefix sum must keep the corpus-sized window
    # PARTITIONED (by _g); only the tiny per-group offsets table may
    # pass through a single partition. The naive formulation
    # (Window.orderBy with no partitionBy over the full input) shows
    # up as a corpus-side Exchange SinglePartition — exactly one such
    # exchange (the offsets table) is allowed.
    df = spark.range(10000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 17).alias("n_tokens")
    )
    # cache_input=False: the cached variant's executedPlan prints the
    # result InMemoryRelation's stored plan AND the scan, double-
    # counting every exchange in the text; the plan SHAPE is identical.
    out = pack_sequences(df, id_col="doc_id", token_col="n_tokens",
                         capacity=128, group_size=256, cache_input=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange SinglePartition") <= 1, plan
    # and the corpus-side cumsum window is keyed by the group column
    assert "[_g" in plan.replace("#", " #"), plan


def test_pack_sequences_releases_internal_cache(spark):
    # cache_input=True persists an internal projection the caller never
    # sees; the operator must release it before returning, leaving only
    # the RESULT cached (the caller's to unpersist). Orphaned blocks
    # would accumulate across repeated calls for the whole session.
    # Delta-based: earlier tests in the shared session may hold
    # localCheckpoint blocks (e.g. pagerank at iters > 3), which
    # catalog.clearCache() does not touch — the operator's contract
    # is "exactly one NEW persistent entry, released on unpersist".
    # Assert on the DELTA OF RDD IDS, not counts: the async
    # ContextCleaner can reclaim earlier tests' localCheckpoint blocks
    # between reads, shifting a count-based baseline (order-flaky).
    spark.catalog.clearCache()

    def persistent_ids():
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().keysIterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    before = persistent_ids()
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("n_tokens")
    )
    out = pack_sequences(df, id_col="doc_id", token_col="n_tokens",
                         capacity=64, group_size=128)
    new_ids = persistent_ids() - before
    assert len(new_ids) == 1
    out.unpersist()
    assert not (persistent_ids() & new_ids)


def test_sample_stratified_deterministic_and_nested(spark):
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "web").otherwise("books").alias("src"),
    )

    def keep_ids(rates):
        out = sample_stratified(
            docs, strata_col="src", key_col="doc_id", rates=rates,
            default_rate=0.0, salt="s",
        )
        return {r.doc_id for r in out.collect()}

    half = keep_ids({"web": 0.5, "books": 1.0})
    # books stratum kept fully, web roughly half (hash-gated)
    assert all(i in half for i in range(1, 2000, 2))
    n_web = sum(1 for i in half if i % 2 == 0)
    assert 350 < n_web < 650
    # determinism: exact same membership on re-run
    assert keep_ids({"web": 0.5, "books": 1.0}) == half
    # nested samples: raising a rate only ADDS rows
    fuller = keep_ids({"web": 0.8, "books": 1.0})
    assert half <= fuller
    # unknown stratum with default_rate=0 drops everything
    assert keep_ids({"nope": 1.0}) == set()


def test_mixture_allocation(spark):
    rows = [("web", 100), ("web", 300), ("books", 50), ("code", 1000)]
    df = spark.createDataFrame(rows, "src string, n_tokens bigint")
    out = {
        r.src: r
        for r in mixture_allocation(
            df, source_col="src", token_col="n_tokens",
            weights={"web": 0.5, "books": 0.5}, token_budget=1000,
        ).collect()
    }
    # web: 400 available, target 500 -> allocate 400, epochs 1.25
    assert out["web"].available_tokens == 400
    assert out["web"].target_tokens == 500.0
    assert out["web"].allocated_tokens == 400.0
    assert out["web"].epochs == 1.25
    # books: 50 available, target 500 -> 10 epochs needed
    assert out["books"].allocated_tokens == 50.0
    assert out["books"].epochs == 10.0
    # unweighted source: target 0, allocate 0
    assert out["code"].target_tokens == 0.0
    assert out["code"].allocated_tokens == 0.0
    assert out["code"].epochs == 0.0


def test_pack_sequences_group_size_invariant(spark):
    # The two-pass prefix sum must be independent of group_size.
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 13).alias("n_tokens")
    )
    a = pack_sequences(df, id_col="doc_id", token_col="n_tokens",
                       capacity=64, group_size=7).orderBy("doc_id").collect()
    b = pack_sequences(df, id_col="doc_id", token_col="n_tokens",
                       capacity=64, group_size=1000).orderBy("doc_id").collect()
    assert a == b
    # contiguity: each doc starts where the previous ended
    for prev, cur in zip(a, a[1:]):
        assert cur.tok_start == prev.tok_end


def test_mean_pool_embeddings(spark):
    from awskinesisconsumer_spark.operators.similarity import (
        mean_pool_embeddings,
    )

    df = spark.createDataFrame(
        [("x", [1.0, 2.0]), ("x", [3.0, 6.0]), ("y", [5.0, 5.0])],
        "label string, embedding array<double>",
    )
    got = {
        (r.label, r.pos): r.mean_val
        for r in mean_pool_embeddings(
            df, group_col="label", vec_col="embedding"
        ).collect()
    }
    assert got == {("x", 0): 2.0, ("x", 1): 4.0, ("y", 0): 5.0, ("y", 1): 5.0}


def test_mixture_temperature_flattens_skewed_sources(spark):
    from awskinesisconsumer_spark.operators.corpus_prep import (
        mixture_temperature_weights,
    )

    rows = [(i, "big") for i in range(900)] + [
        (1000 + i, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    w = {
        r.source: (r.p_source, r.w_alpha)
        for r in mixture_temperature_weights(
            df, source_col="source", alpha=0.3
        ).collect()
    }
    # alpha < 1 moves weight from the big source to the small one...
    assert w["big"][1] < w["big"][0]
    assert w["small"][1] > w["small"][0]
    # ...weights still sum to 1, and the exact formula holds.
    assert abs(w["big"][1] + w["small"][1] - 1.0) < 1e-4
    num_big, num_small = 0.9 ** 0.3, 0.1 ** 0.3
    assert w["big"][1] == round(num_big / (num_big + num_small), 6)
