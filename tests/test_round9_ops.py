"""Round-9 operators: clamped FastCDC, sentence-level
decontamination, and the r9 advisor items (simhash hot_cap exposure,
whiten length-mismatch visibility, CDC hash-default flip)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from awskinesisconsumer_spark.io import load_table

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# content_defined_chunks_clamped
# ---------------------------------------------------------------------------

def _python_clamp_fold(cands, L, min_len, max_len):
    """Reference resolution: next boundary = first candidate in
    [last+min, last+max], else forced at last+max while more than
    max chars remain."""
    last, res = 0, []
    for c in sorted(cands):
        while c - last > max_len:
            last += max_len
            res.append(last)
        if c - last >= min_len:
            res.append(c)
            last = c
    while L - last > max_len:
        last += max_len
        res.append(last)
    return res


def test_cdc_clamped_matches_reference_fold(spark):
    # the F.aggregate fold must equal the sequential reference
    # resolution on every doc, with candidates taken from the
    # stateless form's elected boundaries
    from awskinesisconsumer_spark.operators.corpus_prep import (
        content_defined_chunks, content_defined_chunks_clamped,
    )
    from awskinesisconsumer_spark.operators.dedup import portable_hash52

    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    MINL, MAXL = 32, 128
    out = content_defined_chunks_clamped(
        docs, id_col="doc_id", text_col="text", window=8, divisor=64,
        min_len=MINL, max_len=MAXL, hash_fn=portable_hash52,
    ).collect()
    stateless = content_defined_chunks(
        docs, id_col="doc_id", text_col="text", window=8, divisor=64,
        hash_fn=portable_hash52,
    ).collect()
    texts = {r.doc_id: (r.text or "") for r in docs.collect()}
    cands: dict = {}
    for r in stateless:
        if r.chunk_start > 0:
            cands.setdefault(r.doc_id, []).append(int(r.chunk_start))
    got_by_doc: dict = {}
    for r in out:
        got_by_doc.setdefault(r.doc_id, []).append(
            (r.chunk_idx, int(r.chunk_start), int(r.chunk_len))
        )
    n_checked = 0
    for did, text in texts.items():
        L = len(text)
        bnd = _python_clamp_fold(cands.get(did, []), L, MINL, MAXL)
        starts, ends = [0] + bnd, bnd + [L]
        want = [
            (i, s, e - s)
            for i, (s, e) in enumerate(zip(starts, ends)) if e - s > 0
        ]
        assert sorted(got_by_doc.get(did, [])) == want, f"doc {did}"
        n_checked += 1
    assert n_checked == 500


def test_cdc_clamped_invariants(spark):
    # every chunk <= max_len; every NON-final chunk >= min_len;
    # chunks tile the document exactly
    from awskinesisconsumer_spark.operators.corpus_prep import (
        content_defined_chunks_clamped,
    )

    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    MINL, MAXL = 20, 100
    rows = content_defined_chunks_clamped(
        docs, id_col="doc_id", text_col="text", window=8, divisor=64,
        min_len=MINL, max_len=MAXL,
    ).collect()
    assert rows
    texts = {r.doc_id: (r.text or "") for r in docs.collect()}
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for did, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        pos = 0
        for r in rs:
            assert r.chunk_start == pos, f"doc {did}: gap/overlap"
            assert 1 <= r.chunk_len <= MAXL
            pos += r.chunk_len
        assert pos == len(texts[did]), f"doc {did}: doesn't tile"
        for r in rs[:-1]:
            assert r.chunk_len >= MINL, f"doc {did}: short non-final"


def test_cdc_hash_defaults_same_boundary_structure(spark):
    # the xxhash64 default (production) and portable_hash52 (gate)
    # elect different boundaries but the SAME chunk structure: both
    # tile every document contiguously, respect the clamps, and land
    # the same expected-length regime (~divisor). Pins the r9 default
    # flip: callers switching hash_fn change speed, not semantics.
    from awskinesisconsumer_spark.operators.corpus_prep import (
        content_defined_chunks,
    )
    from awskinesisconsumer_spark.operators.dedup import portable_hash52

    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    texts = {r.doc_id: len(r.text or "") for r in docs.collect()}
    for kwargs in ({}, {"hash_fn": portable_hash52}):
        rows = content_defined_chunks(
            docs, id_col="doc_id", text_col="text", window=8,
            divisor=64, **kwargs,
        ).collect()
        by_doc: dict = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        total = 0
        for did, rs in by_doc.items():
            rs.sort(key=lambda r: r.chunk_idx)
            pos = 0
            for r in rs:
                assert r.chunk_start == pos
                pos += r.chunk_len
            assert pos == texts[did]
            total += len(rs)
        # expected chunk length ~ divisor=64: the corpus-wide mean
        # must sit in the same regime for BOTH hash families
        n_chars = sum(texts.values())
        assert 0.5 * 64 <= n_chars / total <= 2.0 * 64


def test_cdc_clamped_validation(spark):
    from awskinesisconsumer_spark.operators.corpus_prep import (
        content_defined_chunks_clamped,
    )

    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    with pytest.raises(ValueError, match="min_len"):
        content_defined_chunks_clamped(
            docs, id_col="doc_id", text_col="text",
            min_len=100, max_len=50,
        )
    with pytest.raises(ValueError, match="min_len"):
        content_defined_chunks_clamped(
            docs, id_col="doc_id", text_col="text",
            min_len=0, max_len=50,
        )


def test_cdc_clamped_forced_boundaries_on_pathological_text(spark):
    # text that never elects a boundary (constant char -> one window
    # hash; choose divisor so it never fires) must still chunk at
    # exactly max_len steps
    from awskinesisconsumer_spark.operators.corpus_prep import (
        content_defined_chunks_clamped,
    )
    from awskinesisconsumer_spark.operators.dedup import portable_hash52
    import hashlib

    # find a divisor the constant window hash does NOT divide
    h = int(hashlib.md5(("Z" * 8).encode()).hexdigest()[:13], 16)
    divisor = 64 if h % 64 != 0 else 63
    df = spark.createDataFrame([(1, "Z" * 1000)], "doc_id long, text string")
    rows = sorted(
        content_defined_chunks_clamped(
            df, id_col="doc_id", text_col="text", window=8,
            divisor=divisor, min_len=32, max_len=128,
            hash_fn=portable_hash52,
        ).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [r.chunk_len for r in rows] == [128] * 7 + [1000 - 7 * 128]


# ---------------------------------------------------------------------------
# sentence_decontaminate
# ---------------------------------------------------------------------------

def test_sentence_decontaminate_semantics(spark):
    from awskinesisconsumer_spark.operators.corpus_prep import (
        sentence_decontaminate,
    )

    docs = spark.createDataFrame(
        [
            (1, "The answer is forty two. Some harmless filler here."),
            (2, "Completely unrelated text. Nothing shared at all."),
            (3, "the  ANSWER is   forty two!  Different punctuation."),
            (4, None),
            (5, "Yes. No. Ok."),  # only sub-min_words sentences
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "The answer is forty two. Yes.")],
        "bench_id long, bench_text string",
    )
    out = {
        r.doc_id: (r.n_leaked_sentences, r.contaminated)
        for r in sentence_decontaminate(
            docs, bench, id_col="doc_id", text_col="text",
            bench_id_col="bench_id", bench_text_col="bench_text",
            min_words=3,
        ).collect()
    }
    assert out[1] == (1, True)
    assert out[2] == (0, False)
    # doc 3: same words but '!' terminal -> different normalized
    # sentence than the benchmark's '.' form -> clean (punctuation
    # stays attached by design)
    assert out[3] == (0, False)
    assert out[4] == (0, False)
    # doc 5: "Yes." appears in the benchmark but is below the word
    # floor on BOTH sides -> clean
    assert out[5] == (0, False)


def test_sentence_decontaminate_whitespace_case_insensitive(spark):
    from awskinesisconsumer_spark.operators.corpus_prep import (
        sentence_decontaminate,
    )

    docs = spark.createDataFrame(
        [(1, "THE  SECRET   benchmark answer.")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "the secret benchmark answer.")],
        "bench_id long, bench_text string",
    )
    out = sentence_decontaminate(
        docs, bench, id_col="doc_id", text_col="text",
        bench_id_col="bench_id", bench_text_col="bench_text",
    ).collect()[0]
    assert out.contaminated and out.n_leaked_sentences == 1


def test_sentence_decontaminate_counts_distinct_sentences(spark):
    # the same leaked sentence repeated in one doc counts ONCE;
    # two different leaked sentences count twice
    from awskinesisconsumer_spark.operators.corpus_prep import (
        sentence_decontaminate,
    )

    docs = spark.createDataFrame(
        [
            (1, "Leak sentence one here. Leak sentence one here."),
            (2, "Leak sentence one here. Leak sentence two here."),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "Leak sentence one here. Leak sentence two here.")],
        "bench_id long, bench_text string",
    )
    out = {
        r.doc_id: r.n_leaked_sentences
        for r in sentence_decontaminate(
            docs, bench, id_col="doc_id", text_col="text",
            bench_id_col="bench_id", bench_text_col="bench_text",
        ).collect()
    }
    assert out == {1: 1, 2: 2}


# ---------------------------------------------------------------------------
# advisor items
# ---------------------------------------------------------------------------

def test_simhash_pairs_hot_cap_none_is_superset(spark):
    # hot_cap=None disables the skew cap: the unconditional lossless
    # form must return a SUPERSET of the capped form's pairs
    from awskinesisconsumer_spark.operators.dedup import (
        portable_hash52, simhash_near_dup_pairs,
    )

    docs = load_table(spark, "documents", SF)
    kw = dict(id_col="doc_id", text_col="text", bits=16,
              max_hamming=3, bands=4, hash_fn=portable_hash52)
    capped = {
        (r.id_a, r.id_b)
        for r in simhash_near_dup_pairs(docs, hot_cap=5, **kw).collect()
    }
    full = {
        (r.id_a, r.id_b)
        for r in simhash_near_dup_pairs(docs, hot_cap=None, **kw).collect()
    }
    assert capped <= full
    # at this corpus a cap of 5 docs/bucket must actually bite
    assert len(full) > len(capped)


def test_whiten_stats_length_mismatch_stays_null(spark):
    # dims beyond the calibration must surface as NULL, not 0.0
    from awskinesisconsumer_spark.operators.similarity import (
        whiten_embeddings_with_stats,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    rows = sorted(
        whiten_embeddings_with_stats(
            df, id_col="vec_id", vec_col="embedding",
            stats=[(0.0, 1.0), (0.0, 0.0)],  # only 2 calibrated dims
        ).collect(),
        key=lambda r: r.dim,
    )
    assert rows[0].white_val == 1.0   # (1-0)/1
    assert rows[1].white_val == 0.0   # degenerate in-range dim
    assert rows[2].white_val is None  # OUT of calibration -> visible


def test_split_sentences_strips_reserved_marker(spark):
    from awskinesisconsumer_spark.operators.text import split_sentences

    df = spark.createDataFrame(
        [(1, "Adversarial\x1emarker inside. Second sentence here.")],
        "doc_id long, text string",
    )
    rows = sorted(
        split_sentences(df, id_col="doc_id", text_col="text").collect(),
        key=lambda r: r.sent_idx,
    )
    # the pre-existing \x1e must NOT fabricate an extra split
    assert [r.sentence for r in rows] == [
        "Adversarialmarker inside.", "Second sentence here.",
    ]
