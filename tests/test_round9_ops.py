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
    from awskinesisconsumer_spark.operators.corpus_prep import xxhash64_col

    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    MINL, MAXL = 20, 100
    rows = content_defined_chunks_clamped(
        docs, id_col="doc_id", text_col="text", window=8, divisor=64,
        min_len=MINL, max_len=MAXL, hash_fn=xxhash64_col,
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
        content_defined_chunks, xxhash64_col,
    )
    from awskinesisconsumer_spark.operators.dedup import portable_hash52

    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    texts = {r.doc_id: len(r.text or "") for r in docs.collect()}
    # both families pinned EXPLICITLY (r13 VERDICT nit 5): the
    # default-reliance FutureWarning itself is pinned in
    # test_round10_ops; here the subject is the family flip, so name
    # the production family rather than relying on the default.
    for kwargs in ({"hash_fn": xxhash64_col}, {"hash_fn": portable_hash52}):
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


# ---------------------------------------------------------------------------
# second wave: dedup_keep_best, sentence_decontaminate_stream
# ---------------------------------------------------------------------------

def test_dedup_keep_best_semantics(spark):
    # clusters {1,2,3} (chain), {5,6}; 4 is a singleton. Best-by-score
    # wins (NOT min id); ties break to ascending id; exactly one kept
    # row per cluster.
    from awskinesisconsumer_spark.operators.dedup import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, 10.0), (2, 30.0), (3, 20.0), (4, 1.0), (5, 7.0), (6, 7.0)],
        "doc_id long, score double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    out = {
        r.doc_id: (r.cluster_id, r.kept)
        for r in dedup_keep_best(
            docs, pairs, id_col="doc_id", score_col="score"
        ).collect()
    }
    assert out == {
        1: (1, False), 2: (1, True), 3: (1, False),  # best score wins
        4: (4, True),                                # singleton kept
        5: (5, True), 6: (5, False),                 # tie -> min id
    }


def test_dedup_keep_best_one_winner_per_cluster(spark):
    # fixture-scale check: every cluster has EXACTLY one kept doc and
    # the winner's score is the cluster max
    from awskinesisconsumer_spark.operators.dedup import (
        dedup_keep_best, ngram_jaccard_pairs,
    )

    docs = load_table(spark, "documents", SF)
    scored = docs.select(
        "doc_id",
        F.length(F.coalesce(F.col("text"), F.lit("")))
        .cast("double").alias("score"),
    )
    pairs = ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", n=3, threshold=0.3
    )
    rows = dedup_keep_best(
        scored, pairs, id_col="doc_id", score_col="score"
    ).collect()
    assert len(rows) == 500
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert sum(len(v) > 1 for v in by_cluster.values()) > 0  # real clusters
    for cid, rs in by_cluster.items():
        winners = [r for r in rs if r.kept]
        assert len(winners) == 1, f"cluster {cid}"
        assert winners[0].score == max(r.score for r in rs)


def test_sentence_decontaminate_stream_equals_batch(spark, tmp_path):
    # 3-file multi-batch arrival must produce EXACTLY the batch
    # result: a doc's flag depends only on (its sentences, benchmark),
    # so chunking is invisible.
    from awskinesisconsumer_spark.operators.corpus_prep import (
        sentence_decontaminate,
    )
    from awskinesisconsumer_spark.streaming.pipeline import (
        sentence_decontaminate_stream,
    )

    docs = spark.createDataFrame(
        [(i, f"Shared leak sentence number {i % 3}. Filler text {i}.")
         for i in range(30)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "Shared leak sentence number 1.")],
        "bench_id long, bench_text string",
    )
    src = str(tmp_path / "src")
    out_path = str(tmp_path / "out")
    docs.repartition(3).write.parquet(src)
    q = sentence_decontaminate_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(src),
        bench, id_col="doc_id", text_col="text",
        bench_id_col="bench_id", bench_text_col="bench_text",
        out_path=out_path, checkpoint=str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(180)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 3
    got = sorted(
        tuple(r) for r in spark.read.parquet(out_path)
        .select("doc_id", "n_leaked_sentences", "contaminated").collect()
    )
    want = sorted(
        tuple(r) for r in sentence_decontaminate(
            docs, bench, id_col="doc_id", text_col="text",
            bench_id_col="bench_id", bench_text_col="bench_text",
        ).select("doc_id", "n_leaked_sentences", "contaminated").collect()
    )
    assert got == want
    assert sum(1 for _, n, c in got if c) == 10  # the %3==1 docs


# ---------------------------------------------------------------------------
# r10 bank: truncated-dim (Matryoshka) recall audit + composed IVF-PQ
# ---------------------------------------------------------------------------

def test_truncated_dim_recall_oracle_and_monotonicity(spark):
    # Banked for r10 as `ext-ann-dim-recall`: recall@k of prefix-dim
    # cosine top-k vs full-dim truth per tier — the measurement behind
    # shorten-the-vectors decisions (MRL embeddings, dim-sliced
    # indexes). Twin replays slicing, per-tier top-k, and the audit
    # join; the full-dim tier must audit at exactly 1.0.
    import duckdb

    from awskinesisconsumer_spark.operators.similarity import (
        truncated_dim_recall,
    )

    SFE = "/root/testdata/sf0.001"
    emb = load_table(spark, "embeddings", SFE)
    probes = list(range(8))
    tiers = (8, 16, 32, 64)
    out = truncated_dim_recall(
        emb, id_col="vec_id", vec_col="embedding", probe_ids=probes,
        k=10, dim_tiers=tiers,
    )

    def topk_cte(name, d):
        va = f"list_transform(e.embedding[1:{d}], x -> CAST(x AS DOUBLE))"
        vb = f"list_transform(p.probe_vec[1:{d}], x -> CAST(x AS DOUBLE))"
        c = (
            f"CASE WHEN sqrt(list_dot_product({va}, {va})) * "
            f"sqrt(list_dot_product({vb}, {vb})) > 0 THEN "
            f"ROUND(list_dot_product({va}, {vb}) / "
            f"(sqrt(list_dot_product({va}, {va})) * "
            f"sqrt(list_dot_product({vb}, {vb}))), 6) END"
        )
        return f"""
            {name} AS (
              SELECT {d} AS dims, p.probe_id, e.vec_id AS neighbor_id
              FROM embeddings e CROSS JOIN probes p
              WHERE e.vec_id <> p.probe_id
              QUALIFY ROW_NUMBER() OVER (PARTITION BY p.probe_id
                ORDER BY {c} DESC NULLS LAST, e.vec_id) <= 10)"""

    tier_ctes = ",".join(topk_cte(f"t{d}", d) for d in tiers)
    tier_union = "\n              UNION ALL ".join(
        f"SELECT * FROM t{d}" for d in tiers
    )
    sql = f"""
        WITH probes AS (
          SELECT vec_id AS probe_id, embedding AS probe_vec
          FROM embeddings WHERE vec_id BETWEEN 0 AND 7),
        {topk_cte("exact", 64)},
        {tier_ctes},
        alltiers AS ({tier_union}),
        hits AS (
          SELECT a.dims, a.probe_id, COUNT(*) AS n_hits
          FROM alltiers a
          JOIN exact x ON x.probe_id = a.probe_id
                      AND x.neighbor_id = a.neighbor_id
          GROUP BY 1, 2),
        base AS (SELECT DISTINCT dims, probe_id FROM alltiers)
        SELECT b.dims, b.probe_id,
               CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
               ROUND(COALESCE(n_hits, 0) / 10.0, 4) AS recall_at_k
        FROM base b LEFT JOIN hits h
          ON h.dims = b.dims AND h.probe_id = b.probe_id
    """
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SFE}/embeddings.parquet'"
    )
    import math

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) == len(tiers) * len(probes)

    # semantics: full-dim tier IS the truth -> recall exactly 1.0;
    # and mean recall is weakly monotone in dims on this fixture
    rows = out.collect()
    by_tier: dict = {}
    for r in rows:
        by_tier.setdefault(r.dims, []).append(r.recall_at_k)
    assert all(v == 1.0 for v in by_tier[64])
    means = {d: sum(v) / len(v) for d, v in by_tier.items()}
    assert means[8] <= means[16] <= means[32] <= means[64]


def test_knn_ivf_pq_oracle(spark):
    # Banked for r10 as `ext-similarity-ivf-pq`: the production ANN
    # layout (coarse IVF probe restricts candidates -> PQ-ADC scores
    # codes only), composed from the two gated halves with their
    # proven twin fragments chained: hash-spread centroids + 2-cell
    # probe (the ivf twin) and seed + 2 Lloyd rounds + encode + LUT
    # fold (the pq twin), candidates filtered between them.
    import duckdb

    from __spark_entry__ import _sql_l2
    from awskinesisconsumer_spark.operators.similarity import (
        ivf_centroids_from_sample, knn_ivf_pq, pq_codebooks_refined,
    )

    SFE = "/root/testdata/sf0.001"
    emb = load_table(spark, "embeddings", SFE)
    probe = emb.where(F.col("vec_id") == 0).select("embedding").head()
    corpus = emb.where(F.col("vec_id") != 0)
    centroids = ivf_centroids_from_sample(
        corpus, id_col="vec_id", vec_col="embedding", n_centroids=8
    )
    cbs = pq_codebooks_refined(
        corpus, id_col="vec_id", vec_col="embedding", m=8, ksub=16,
        n_iter=2, order_col="vec_id",
    )
    out = knn_ivf_pq(
        corpus, id_col="vec_id", vec_col="embedding",
        query=[float(x) for x in probe.embedding], centroids=centroids,
        codebooks=cbs, n_probes=2, k=10,
    ).select(
        "vec_id", "adc_dist",
        F.concat_ws(",", F.col("pq_code").cast("array<string>"))
        .alias("pq_code"),
        "rank",
    )

    def pq_lloyd_round(r: int) -> str:
        return f"""
            passign{r} AS (
              SELECT s.vec_id, s.j, s.vs, t.i,
                     ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j
                       ORDER BY {_sql_l2('s.vs', 't.cs')}, t.i) AS rn
              FROM sub s JOIN pcent{r} t ON t.j = s.j),
            pmean{r} AS (
              SELECT j, i, pos,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list(CAST(val AS DOUBLE) ORDER BY vec_id)),
                  (acc, v) -> acc + v) / COUNT(*) AS m
              FROM (SELECT vec_id, j, i, UNNEST(vs) AS val,
                           UNNEST(generate_series(1, len(vs))) AS pos
                    FROM passign{r} WHERE rn = 1)
              GROUP BY j, i, pos),
            pcent{r + 1} AS (
              SELECT p.j, p.i, COALESCE(n.cs, p.cs) AS cs
              FROM pcent{r} p
              LEFT JOIN (SELECT j, i, list(m ORDER BY pos) AS cs
                         FROM pmean{r} GROUP BY j, i) n
                ON n.j = p.j AND n.i = p.i)"""

    lloyd = ",".join(pq_lloyd_round(r) for r in range(2))
    sql = f"""
        WITH corpus AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                 embedding
          FROM embeddings WHERE vec_id <> 0),
        q AS (
          SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv,
                 embedding AS qe
          FROM embeddings WHERE vec_id = 0),
        icent AS (
          SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS i, cv
          FROM (SELECT vec_id, embedding AS cv,
                       ('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
                                       1, 13))::BIGINT AS h
                FROM corpus)
          ORDER BY h, vec_id LIMIT 8),
        iassign AS (
          SELECT vec_id, i,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY {_sql_l2('embedding', 'cv')}, i) AS rn
          FROM corpus CROSS JOIN icent),
        cells AS (SELECT vec_id, i AS cell FROM iassign WHERE rn = 1),
        iprobe AS (
          SELECT i FROM icent, q
          ORDER BY {_sql_l2('qe', 'cv')}, i LIMIT 2),
        cand AS (
          SELECT vec_id FROM cells
          WHERE cell IN (SELECT i FROM iprobe)),
        seeds AS (
          SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS i, v AS cv
          FROM corpus ORDER BY vec_id LIMIT 16),
        js AS (SELECT UNNEST(generate_series(0, 7)) AS j),
        pcent0 AS (
          SELECT j, i, list_slice(cv, j * 8 + 1, j * 8 + 8) AS cs
          FROM seeds CROSS JOIN js),
        sub AS (
          SELECT vec_id, j, list_slice(v, j * 8 + 1, j * 8 + 8) AS vs
          FROM corpus CROSS JOIN js),
        {lloyd},
        cent AS (SELECT j, i, cs FROM pcent2),
        assign AS (
          SELECT vec_id, j, i,
                 ROW_NUMBER() OVER (PARTITION BY vec_id, j
                   ORDER BY {_sql_l2('vs', 'cs')}, i) AS rn
          FROM sub JOIN cent USING (j)),
        codes AS (SELECT vec_id, j, i AS code FROM assign WHERE rn = 1),
        lut AS (
          SELECT j, i,
                 {_sql_l2("list_slice(qv, j * 8 + 1, j * 8 + 8)", "cs")}
                   AS d
          FROM cent, q),
        per AS (
          SELECT c.vec_id, c.j, c.code, l.d
          FROM codes c
          JOIN cand USING (vec_id)
          JOIN lut l ON l.j = c.j AND l.i = c.code),
        adc AS (
          SELECT vec_id,
                 ROUND(list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                                list(d ORDER BY j)),
                   (a, x) -> a + x), 6) AS adc_dist,
                 list(code ORDER BY j) AS pq_code
          FROM per GROUP BY vec_id)
        SELECT vec_id, adc_dist,
               array_to_string(pq_code, ',') AS pq_code,
               CAST(ROW_NUMBER() OVER (ORDER BY adc_dist, vec_id)
                    AS INT) AS rank
        FROM adc
        QUALIFY rank <= 10
    """
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SFE}/embeddings.parquet'"
    )
    import math

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) == 10


def test_knn_ivf_pq_only_scores_probed_cells(spark):
    # every returned id must belong to one of the n_probes nearest
    # cells — the candidate restriction IS the operator's point
    from awskinesisconsumer_spark.operators.similarity import (
        ivf_assign, ivf_centroids_from_sample, knn_ivf_pq,
        pq_codebooks_from_sample,
    )

    SFE = "/root/testdata/sf0.001"
    emb = load_table(spark, "embeddings", SFE)
    probe = emb.where(F.col("vec_id") == 0).select("embedding").head()
    query = [float(x) for x in probe.embedding]
    corpus = emb.where(F.col("vec_id") != 0)
    centroids = ivf_centroids_from_sample(
        corpus, id_col="vec_id", vec_col="embedding", n_centroids=8
    )
    cbs = pq_codebooks_from_sample(
        corpus, id_col="vec_id", vec_col="embedding", m=8, ksub=16
    )
    out = knn_ivf_pq(
        corpus, id_col="vec_id", vec_col="embedding", query=query,
        centroids=centroids, codebooks=cbs, n_probes=2, k=10,
    )

    def l2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    probed = set(sorted(
        range(len(centroids)), key=lambda i: (l2(query, centroids[i]), i)
    )[:2])
    cells = {
        r.vec_id: r.cell
        for r in ivf_assign(
            corpus, vec_col="embedding", centroids=centroids
        ).select("vec_id", "cell").collect()
    }
    got = out.collect()
    assert len(got) == 10
    assert all(cells[r.vec_id] in probed for r in got)


def test_cdc_clamped_property_random_inputs(spark):
    # property check: for random (window, divisor, min, max) and
    # adversarial text shapes, the F.aggregate fold always equals the
    # sequential reference resolution and the tiling invariants hold
    import hashlib

    from awskinesisconsumer_spark.operators.corpus_prep import (
        content_defined_chunks, content_defined_chunks_clamped,
    )
    from awskinesisconsumer_spark.operators.dedup import portable_hash52

    import random

    rng = random.Random(9)
    alphabet = "ab X.\n"
    cases = []
    for i in range(24):
        n = rng.randrange(0, 600)
        cases.append((i, "".join(rng.choice(alphabet) for _ in range(n))))
    cases += [
        (100, ""), (101, None), (102, "a"), (103, "a" * 7),
        (104, "a" * 8), (105, "xyz" * 200),
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    for window, divisor, mn, mx in [(4, 16, 8, 40), (8, 64, 32, 128),
                                    (2, 4, 1, 6), (5, 32, 30, 30)]:
        out = content_defined_chunks_clamped(
            df, id_col="doc_id", text_col="text", window=window,
            divisor=divisor, min_len=mn, max_len=mx,
            hash_fn=portable_hash52,
        ).collect()
        stateless = content_defined_chunks(
            df, id_col="doc_id", text_col="text", window=window,
            divisor=divisor, hash_fn=portable_hash52,
        ).collect()
        cands: dict = {}
        for r in stateless:
            if r.chunk_start > 0:
                cands.setdefault(r.doc_id, []).append(int(r.chunk_start))
        got: dict = {}
        for r in out:
            got.setdefault(r.doc_id, []).append(
                (r.chunk_idx, int(r.chunk_start), int(r.chunk_len))
            )
        for did, text in cases:
            text = text or ""
            L = len(text)
            bnd = _python_clamp_fold(cands.get(did, []), L, mn, mx)
            starts, ends = [0] + bnd, bnd + [L]
            want = [(i, s, e - s)
                    for i, (s, e) in enumerate(zip(starts, ends))
                    if e - s > 0]
            assert sorted(got.get(did, [])) == want, (
                f"doc {did} w={window} d={divisor} mn={mn} mx={mx}"
            )


def test_importance_score_oracle_and_semantics(spark):
    # Banked for r10 as `ext-importance-score`: DSIR-style per-doc
    # mean unigram log-likelihood ratio (target domain sample over
    # the corpus' own distribution, both add-one smoothed on the
    # UNION vocabulary). Twin replays counts, smoothing masses, and
    # the sorted-fold sum; target-domain docs must outrank the rest.
    import duckdb
    import math

    from awskinesisconsumer_spark.operators.text import importance_score

    SFD = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", SFD)
    # target domain sample = the src0 docs' text
    target = docs.where(F.col("source") == "src0").select(
        F.col("text").alias("t_text")
    )
    out = importance_score(
        docs, target, id_col="doc_id", text_col="text",
        target_text_col="t_text",
    )

    wl = ("CASE WHEN length(trim(COALESCE(text, ''))) = 0 "
          "THEN CAST([] AS VARCHAR[]) "
          "ELSE string_split_regex(lower(trim(COALESCE(text, ''))), "
          "'\\s+') END")
    sql = f"""
        WITH w AS (SELECT doc_id, source, {wl} AS words FROM documents),
        tok AS (SELECT doc_id, source, UNNEST(words) AS term FROM w),
        tok2 AS (SELECT * FROM tok WHERE term <> ''),
        dtf AS (SELECT doc_id, term, COUNT(*) AS c
                FROM tok2 GROUP BY 1, 2),
        src AS (SELECT term, COUNT(*) AS cf FROM tok2 GROUP BY 1),
        tgt AS (SELECT term, COUNT(*) AS tf FROM tok2
                WHERE source = 'src0' GROUP BY 1),
        uni AS (
          SELECT COALESCE(s.term, t.term) AS term,
                 COALESCE(cf, 0) AS cf, COALESCE(tf, 0) AS tf
          FROM src s FULL OUTER JOIN tgt t ON s.term = t.term),
        tot AS (SELECT SUM(cf) AS ns, SUM(tf) AS nt,
                       COUNT(*) AS vocab FROM uni),
        per AS (
          SELECT doc_id, SUM(c) AS n,
                 list(struct_pack(term := d.term, c := c, cf := cf,
                                  tf := tf) ORDER BY d.term) AS es,
                 ANY_VALUE(CAST(ns + vocab AS DOUBLE)) AS dsrc,
                 ANY_VALUE(CAST(nt + vocab AS DOUBLE)) AS dtgt
          FROM dtf d JOIN uni USING (term) CROSS JOIN tot
          GROUP BY doc_id),
        sc AS (
          SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
            ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(es, e -> CAST(e.c AS DOUBLE)
                 * ((ln(CAST(e.tf AS DOUBLE) + 1.0) - ln(dtgt))
                    - (ln(CAST(e.cf AS DOUBLE) + 1.0) - ln(dsrc))))),
               (a, x) -> a + x) / CAST(n AS DOUBLE), 4) AS importance
          FROM per)
        SELECT d.doc_id,
               CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
               importance
        FROM documents d LEFT JOIN sc USING (doc_id)
    """
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SFD}/documents.parquet'"
    )

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) == 500

    # semantics: docs OF the target domain must score higher on
    # average than the rest (their unigrams define the target)
    rows = [r for r in docs.select("doc_id", "source").collect()]
    src_of = {r.doc_id: r.source for r in rows}
    scores = {r.doc_id: r.importance for r in out.collect()
              if r.importance is not None}
    tgt_scores = [v for d, v in scores.items() if src_of[d] == "src0"]
    rest = [v for d, v in scores.items() if src_of[d] != "src0"]
    assert sum(tgt_scores) / len(tgt_scores) > sum(rest) / len(rest)


def test_importance_freeze_apply_and_stream_equals_batch(spark, tmp_path):
    # Banked for r10 as `stream-importance-score`: the freeze/apply
    # split must (a) reproduce the monolithic batch op exactly and
    # (b) produce IDENTICAL results when the corpus arrives as a
    # 3-file stream — every score depends only on (doc, frozen
    # stats), the quality-blend-stream contract for data selection.
    from awskinesisconsumer_spark.operators.text import (
        importance_score, importance_score_with_stats, importance_stats,
    )
    from awskinesisconsumer_spark.streaming.pipeline import (
        importance_score_stream,
    )

    SFD = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", SFD).select("doc_id", "text")
    target = load_table(spark, "documents", SFD).where(
        F.col("source") == "src0"
    ).select(F.col("text").alias("t_text"))

    mono = sorted(
        tuple(r) for r in importance_score(
            docs, target, id_col="doc_id", text_col="text",
            target_text_col="t_text",
        ).collect()
    )
    stats, ns, nt, vocab = importance_stats(
        docs, target, text_col="text", target_text_col="t_text"
    )
    split = sorted(
        tuple(r) for r in importance_score_with_stats(
            docs, stats, id_col="doc_id", text_col="text",
            n_src=ns, n_tgt=nt, vocab=vocab,
        ).collect()
    )
    assert mono == split and len(mono) == 500

    src = str(tmp_path / "imp_src")
    out_path = str(tmp_path / "imp_out")
    docs.repartition(3).write.parquet(src)
    q = importance_score_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(src),
        stats, id_col="doc_id", text_col="text",
        n_src=ns, n_tgt=nt, vocab=vocab,
        out_path=out_path, checkpoint=str(tmp_path / "imp_ckpt"),
    )
    assert q.awaitTermination(180)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 3
    streamed = sorted(
        tuple(r) for r in spark.read.parquet(out_path)
        .select("doc_id", "n_tokens", "importance").collect()
    )
    assert streamed == mono


def test_grouped_drift_oracle_and_semantics(spark):
    # Banked for r10 as `ext-grouped-drift`: per-SOURCE term
    # distribution drift between the even/odd doc_id halves — the
    # WHERE-did-it-drift breakdown of ext-corpus-drift. Twin replays
    # the composite-keyed counts, per-group masses, and KL/JS at the
    # same micro-nat rounding.
    import duckdb
    import math

    from awskinesisconsumer_spark.operators.text import grouped_drift

    SFD = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", SFD).select(
        "doc_id", "source", "text"
    )
    out = grouped_drift(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
        group_col="source", text_col="text",
    )

    wl = ("CASE WHEN length(trim(COALESCE(text, ''))) = 0 "
          "THEN CAST([] AS VARCHAR[]) "
          "ELSE string_split_regex(lower(trim(COALESCE(text, ''))), "
          "'\\s+') END")
    sql = f"""
        WITH lw AS (SELECT source AS grp, {wl} AS words FROM documents
                    WHERE doc_id % 2 = 0),
        rw AS (SELECT source AS grp, {wl} AS words FROM documents
               WHERE doc_id % 2 = 1),
        cl AS (SELECT grp, term, COUNT(*) AS c
               FROM (SELECT grp, UNNEST(words) AS term FROM lw)
               WHERE term <> '' GROUP BY 1, 2),
        cr AS (SELECT grp, term, COUNT(*) AS c
               FROM (SELECT grp, UNNEST(words) AS term FROM rw)
               WHERE term <> '' GROUP BY 1, 2),
        t AS (SELECT COALESCE(cl.grp, cr.grp) AS grp,
                     COALESCE(cl.term, cr.term) AS term,
                     COALESCE(cl.c, 0) AS c_left,
                     COALESCE(cr.c, 0) AS c_right
              FROM cl FULL OUTER JOIN cr
                ON cl.term = cr.term AND cl.grp = cr.grp),
        tot AS (SELECT grp, SUM(c_left) AS nl, SUM(c_right) AS nr,
                       COUNT(*) AS v FROM t GROUP BY 1),
        pq AS (SELECT t.grp, term, c_left, c_right,
                      CAST(c_left + 1 AS DOUBLE)
                        / CAST(nl + v AS DOUBLE) AS p,
                      CAST(c_right + 1 AS DOUBLE)
                        / CAST(nr + v AS DOUBLE) AS q
               FROM t JOIN tot ON tot.grp = t.grp),
        pqm AS (SELECT *, (p + q) / 2.0 AS m FROM pq)
        SELECT grp AS "group", term,
               CAST(c_left AS BIGINT) AS c_left,
               CAST(c_right AS BIGINT) AS c_right,
               ROUND(p * 1000000.0, 4) AS p_left_micro,
               ROUND(q * 1000000.0, 4) AS p_right_micro,
               ROUND(p * (ln(p) - ln(q)) * 1000000.0, 4) AS kl_micro,
               ROUND((p * (ln(p) - ln(m)) + q * (ln(q) - ln(m))) / 2.0
                 * 1000000.0, 4) AS js_micro
        FROM pqm
    """
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SFD}/documents.parquet'"
    )

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) > 500

    # semantics: every source present; per-group KL totals are finite
    # and non-negative up to rounding; a group's rows are
    # self-contained (its union vocab)
    rows = out.collect()
    groups = {r.group for r in rows}
    assert groups == {r.source for r in docs.select("source").collect()}
    from collections import defaultdict
    kl = defaultdict(float)
    for r in rows:
        kl[r.group] += r.kl_micro
    for g, v in kl.items():
        assert v / 1e6 >= -1e-6, f"group {g}: negative KL total"


def test_grouped_drift_stream_equals_batch(spark, tmp_path):
    # Banked for r10 as `stream-grouped-drift`: the running
    # (group, term) count state makes the final emission equal batch
    # grouped_drift exactly — same contract as stream-corpus-drift,
    # so the batch twin is shared verbatim when it gates.
    from awskinesisconsumer_spark.operators.text import grouped_drift
    from awskinesisconsumer_spark.streaming.pipeline import (
        grouped_drift_stream,
    )

    SFD = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", SFD).select(
        "doc_id", "source", "text"
    )
    reference = docs.where(F.col("doc_id") % 2 == 0)
    arriving = docs.where(F.col("doc_id") % 2 == 1)

    src = str(tmp_path / "gd_src")
    out_path = str(tmp_path / "gd_out")
    arriving.repartition(3).write.parquet(src)
    handle = grouped_drift_stream(
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", "1").parquet(src),
        reference, group_col="source", text_col="text",
        out_path=out_path, checkpoint=str(tmp_path / "gd_ckpt"),
    )
    try:
        assert handle.awaitTermination(180)
        n_batches = len([
            p for p in handle.query.recentProgress
            if p["numInputRows"] > 0
        ])
        assert n_batches >= 3
        got = sorted(
            tuple(r) for r in spark.read.parquet(out_path).collect()
        )
        want = sorted(
            tuple(r) for r in grouped_drift(
                reference, arriving, group_col="source", text_col="text",
            ).collect()
        )
        assert got == want and len(got) > 500
    finally:
        handle.release()


def test_corruption_spans_oracle_and_invariants(spark):
    # Banked for r10 as `ext-corruption-spans`: deterministic
    # T5-style span-corruption plan — hash-gated span starts/lengths,
    # left-to-right overlap resolution via the clamp-fold shape. Twin
    # replays elections + the fold as a per-doc recursive CTE.
    import duckdb
    import math

    from awskinesisconsumer_spark.operators.corpus_prep import (
        corruption_spans,
    )
    from awskinesisconsumer_spark.operators.dedup import portable_hash52

    SFD = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", SFD).select("doc_id", "text")
    out = corruption_spans(
        docs, id_col="doc_id", text_col="text", corruption_rate=0.15,
        mean_span_len=3, salt="v1", hash_fn=portable_hash52,
    )

    h = ("('0x' || substr(md5(doc_id::VARCHAR || chr(31) || "
         "p::VARCHAR || chr(31) || 'v1'{extra}), 1, 13))::BIGINT")
    sql = f"""
        WITH RECURSIVE d AS (
          SELECT doc_id, trim(COALESCE(text, '')) AS t FROM documents),
        w AS (
          SELECT doc_id,
                 CASE WHEN length(t) = 0 THEN 0
                      ELSE len(string_split_regex(t, '\\s+')) END AS n
          FROM d),
        cand AS (
          SELECT doc_id, n, CAST(p AS INT) AS p,
                 CAST({h.format(extra=" || chr(31) || 'len'")} % 5 + 1
                      AS INT) AS l,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p)
                   AS rn
          FROM w, UNNEST(range(1, n + 1)) AS u(p)
          WHERE {h.format(extra="")} % 20 = 0),
        st AS (
          SELECT doc_id, rn, n, p, l, TRUE AS accepted,
                 LEAST(l, n - p + 1) AS tl,
                 p + LEAST(l, n - p + 1) - 1 AS last_end
          FROM cand WHERE rn = 1
          UNION ALL
          SELECT c.doc_id, c.rn, c.n, c.p, c.l,
                 c.p > st.last_end AS accepted,
                 LEAST(c.l, c.n - c.p + 1) AS tl,
                 CASE WHEN c.p > st.last_end
                      THEN c.p + LEAST(c.l, c.n - c.p + 1) - 1
                      ELSE st.last_end END AS last_end
          FROM st JOIN cand c
            ON c.doc_id = st.doc_id AND c.rn = st.rn + 1)
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                    ORDER BY p) - 1 AS INT) AS span_idx,
               CAST(p AS INT) AS start_word,
               CAST(tl AS INT) AS span_len
        FROM st WHERE accepted
    """
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SFD}/documents.parquet'"
    )

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) > 1000

    # invariants: spans never overlap within a doc, never cross the
    # doc end, lengths in [1, 2m-1], and corpus coverage lands near
    # the target rate (biased slightly low by overlap drops)
    rows = out.collect()
    texts = {r.doc_id: (r.text or "") for r in docs.collect()}
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    covered = 0
    for did, rs in by_doc.items():
        n = len(texts[did].split()) if texts[did].strip() else 0
        rs.sort(key=lambda r: r.span_idx)
        last_end = 0
        for r in rs:
            assert 1 <= r.span_len <= 5
            assert r.start_word > last_end, f"doc {did}: overlap"
            assert r.start_word + r.span_len - 1 <= n, f"doc {did}: past end"
            last_end = r.start_word + r.span_len - 1
            covered += r.span_len
    n_total = sum(len(t.split()) for t in texts.values() if t.strip())
    assert 0.10 <= covered / n_total <= 0.16


def test_corruption_spans_salt_changes_draw(spark):
    # a new salt is a fresh deterministic draw: different spans, same
    # coverage regime; same salt reproduces exactly
    from awskinesisconsumer_spark.operators.corpus_prep import (
        corruption_spans,
    )

    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    a1 = sorted(tuple(r) for r in corruption_spans(
        docs, id_col="doc_id", text_col="text", salt="v1").collect())
    a2 = sorted(tuple(r) for r in corruption_spans(
        docs, id_col="doc_id", text_col="text", salt="v1").collect())
    b = sorted(tuple(r) for r in corruption_spans(
        docs, id_col="doc_id", text_col="text", salt="v2").collect())
    assert a1 == a2
    assert a1 != b
    assert 0.5 <= len(b) / len(a1) <= 2.0


def test_denoising_pairs_oracle_and_structure(spark):
    # Banked for r10 as `ext-denoise-pairs`: the denoising objective
    # end-to-end — same deterministic span plan as corruption_spans,
    # rendered as T5 (input_text, target_text) pairs. Twin extends the
    # plan's recursive CTE with the indexed list-building passes.
    import duckdb
    import math

    from awskinesisconsumer_spark.operators.corpus_prep import (
        denoising_pairs,
    )
    from awskinesisconsumer_spark.operators.dedup import portable_hash52

    SFD = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", SFD).select("doc_id", "text")
    out = denoising_pairs(
        docs, id_col="doc_id", text_col="text", corruption_rate=0.15,
        mean_span_len=3, salt="v1", hash_fn=portable_hash52,
    )

    h = ("('0x' || substr(md5(doc_id::VARCHAR || chr(31) || "
         "p::VARCHAR || chr(31) || 'v1'{extra}), 1, 13))::BIGINT")
    sql = f"""
        WITH RECURSIVE d AS (
          SELECT doc_id, trim(COALESCE(text, '')) AS t FROM documents),
        w AS (
          SELECT doc_id,
                 CASE WHEN length(t) = 0 THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(t, '\\s+') END AS ws,
                 CASE WHEN length(t) = 0 THEN 0
                      ELSE len(string_split_regex(t, '\\s+')) END AS n
          FROM d),
        cand AS (
          SELECT doc_id, n, CAST(p AS INT) AS p,
                 CAST({h.format(extra=" || chr(31) || 'len'")} % 5 + 1
                      AS INT) AS l,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p)
                   AS rn
          FROM w, UNNEST(range(1, n + 1)) AS u(p)
          WHERE {h.format(extra="")} % 20 = 0),
        st AS (
          SELECT doc_id, rn, n, p, l, TRUE AS accepted,
                 LEAST(l, n - p + 1) AS tl,
                 p + LEAST(l, n - p + 1) - 1 AS last_end
          FROM cand WHERE rn = 1
          UNION ALL
          SELECT c.doc_id, c.rn, c.n, c.p, c.l,
                 c.p > st.last_end AS accepted,
                 LEAST(c.l, c.n - c.p + 1) AS tl,
                 CASE WHEN c.p > st.last_end
                      THEN c.p + LEAST(c.l, c.n - c.p + 1) - 1
                      ELSE st.last_end END AS last_end
          FROM st JOIN cand c
            ON c.doc_id = st.doc_id AND c.rn = st.rn + 1),
        sp AS (
          SELECT doc_id,
                 list(struct_pack(s := CAST(p AS INT),
                                  l := CAST(tl AS INT)) ORDER BY p)
                   AS spans
          FROM st WHERE accepted GROUP BY doc_id),
        full_sp AS (
          SELECT w.doc_id, w.ws, w.n,
                 COALESCE(sp.spans,
                          CAST([] AS STRUCT(s INT, l INT)[])) AS spans
          FROM w LEFT JOIN sp ON sp.doc_id = w.doc_id),
        built AS (
          SELECT doc_id, n, len(spans) AS k,
            list_concat(
              flatten(list_transform(spans, (x, i) ->
                list_concat(
                  ws[(CASE WHEN i = 1 THEN 0
                      ELSE spans[i - 1].s + spans[i - 1].l - 1 END) + 1
                     : x.s - 1],
                  ['<extra_id_' || (i - 1)::VARCHAR || '>']))),
              ws[(CASE WHEN len(spans) = 0 THEN 0
                  ELSE spans[len(spans)].s + spans[len(spans)].l - 1
                  END) + 1 : n]) AS in_words,
            list_concat(
              flatten(list_transform(spans, (x, i) ->
                list_concat(['<extra_id_' || (i - 1)::VARCHAR || '>'],
                            ws[x.s : x.s + x.l - 1]))),
              ['<extra_id_' || len(spans)::VARCHAR || '>']) AS tgt_words
          FROM full_sp)
        SELECT doc_id, CAST(n AS INT) AS n_words, CAST(k AS INT) AS n_spans,
               array_to_string(in_words, ' ') AS input_text,
               array_to_string(tgt_words, ' ') AS target_text
        FROM built
    """
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SFD}/documents.parquet'"
    )

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) == 500

    # structure: sentinel counts line up (input has k, target k+1);
    # word conservation: input non-sentinel words + target
    # non-sentinel words == original words
    import re as _re
    rows = out.collect()
    texts = {r.doc_id: (r.text or "") for r in docs.collect()}
    for r in rows:
        k = r.n_spans
        assert len(_re.findall(r"<extra_id_\d+>", r.input_text)) == k
        assert len(_re.findall(r"<extra_id_\d+>", r.target_text)) == k + 1
        strip = lambda s: [w for w in s.split()
                           if not _re.fullmatch(r"<extra_id_\d+>", w)]
        assert (len(strip(r.input_text)) + len(strip(r.target_text))
                == len(texts[r.doc_id].split()))


def test_fim_split_oracle_and_invariants(spark):
    # Banked for r10 as `ext-fim-split`: deterministic
    # fill-in-the-middle splits — hash-gated doc selection, two
    # hash-chosen cut points, (prefix, middle, suffix) word slices.
    # Twin replays gates, cuts, and slicing verbatim.
    import duckdb
    import math

    from awskinesisconsumer_spark.operators.corpus_prep import fim_split
    from awskinesisconsumer_spark.operators.dedup import portable_hash52

    SFD = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", SFD).select("doc_id", "text")
    out = fim_split(
        docs, id_col="doc_id", text_col="text", fim_rate=0.5,
        salt="v1", hash_fn=portable_hash52,
    )

    def h(tag):
        return ("('0x' || substr(md5(doc_id::VARCHAR || chr(31) || 'v1' "
                f"|| chr(31) || '{tag}'), 1, 13))::BIGINT")

    sql = f"""
        WITH d AS (
          SELECT doc_id, trim(COALESCE(text, '')) AS t FROM documents),
        w AS (
          SELECT doc_id,
                 CASE WHEN length(t) = 0 THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(t, '\\s+') END AS ws,
                 CASE WHEN length(t) = 0 THEN 0
                      ELSE len(string_split_regex(t, '\\s+')) END AS n
          FROM d),
        g AS (
          SELECT doc_id, ws, n,
                 ({h('gate')} % 1000000 < 500000 AND n > 0) AS applied,
                 CAST({h('c1')} % (n + 1) AS INT) AS ca,
                 CAST({h('c2')} % (n + 1) AS INT) AS cb
          FROM w),
        c AS (
          SELECT doc_id, ws, n, applied,
                 LEAST(ca, cb) AS c1, GREATEST(ca, cb) AS c2
          FROM g)
        SELECT doc_id, CAST(n AS INT) AS n_words, applied AS fim_applied,
               -- COALESCE: DuckDB's array_to_string([]) is NULL where
               -- Spark's array_join([]) is ''
               CASE WHEN applied
                    THEN COALESCE(array_to_string(ws[1 : c1], ' '), '')
                    ELSE COALESCE(array_to_string(ws, ' '), '')
               END AS prefix,
               CASE WHEN applied
                    THEN COALESCE(array_to_string(ws[c1 + 1 : c2], ' '),
                                  '')
                    ELSE '' END AS middle,
               CASE WHEN applied
                    THEN COALESCE(array_to_string(ws[c2 + 1 : n], ' '),
                                  '')
                    ELSE '' END AS suffix
        FROM c
    """
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SFD}/documents.parquet'"
    )

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    cols = sorted(out.columns)
    srows = sorted(tuple(canon(r[c]) for c in cols) for r in out.collect())
    tbl = con.execute(sql).fetch_arrow_table()
    assert cols == sorted(tbl.column_names)
    drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names))
                   for r in tbl.to_pylist())
    assert srows == drows and len(srows) == 500

    # invariants: word conservation for applied docs; passthrough for
    # the rest; rate lands near 0.5
    rows = out.collect()
    texts = {r.doc_id: (r.text or "") for r in docs.collect()}
    n_applied = 0
    for r in rows:
        ws = texts[r.doc_id].split()
        if r.fim_applied:
            n_applied += 1
            rebuilt = (r.prefix.split() + r.middle.split()
                       + r.suffix.split())
            assert rebuilt == ws, f"doc {r.doc_id}: words not conserved"
        else:
            assert r.prefix.split() == ws
            assert r.middle == "" and r.suffix == ""
    n_nonempty = sum(1 for t in texts.values() if t.strip())
    assert 0.35 <= n_applied / n_nonempty <= 0.65


def test_grouped_drift_null_group_bucket(spark):
    # NULL group keys must land in the "(null)" bucket, not vanish
    # through the equi-joins — a monitoring blind spot otherwise
    from awskinesisconsumer_spark.operators.text import grouped_drift

    left = spark.createDataFrame(
        [(1, None, "alpha beta gamma"), (2, "src0", "alpha alpha")],
        "doc_id long, source string, text string",
    )
    right = spark.createDataFrame(
        [(3, None, "delta delta epsilon"), (4, "src0", "alpha beta")],
        "doc_id long, source string, text string",
    )
    rows = grouped_drift(
        left, right, group_col="source", text_col="text"
    ).collect()
    groups = {r.group for r in rows}
    assert groups == {"(null)", "src0"}
    null_terms = {r.term for r in rows if r.group == "(null)"}
    assert null_terms == {"alpha", "beta", "gamma", "delta", "epsilon"}


def test_importance_stats_tokenless_corpus_degrades(spark):
    # all-empty corpus/target: masses are zero, scores come back NULL
    # (the monolithic op's behavior) instead of a TypeError
    from awskinesisconsumer_spark.operators.text import (
        importance_score, importance_stats,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    target = spark.createDataFrame([("",)], "t_text string")
    stats, ns, nt, vocab = importance_stats(
        docs, target, text_col="text", target_text_col="t_text"
    )
    assert (ns, nt, vocab) == (0, 0, 0)
    out = importance_score(
        docs, target, id_col="doc_id", text_col="text",
        target_text_col="t_text",
    ).collect()
    assert len(out) == 3
    assert all(r.n_tokens == 0 and r.importance is None for r in out)
