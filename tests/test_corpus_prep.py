"""Corpus-prep operators: decontamination and sequence packing."""

from pyspark.sql import functions as F

from awskinesisconsumer_spark.operators.corpus_prep import (
    decontaminate,
    pack_sequences,
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
