"""Sketch operators: count-min heavy hitters.

The reference keeps no aggregate state beyond its bounded queue
(parser.py:470-481); a 100 TB corpus pipeline needs sublinear-memory
frequency estimation — the count-min sketch (Cormode & Muthukrishnan
2005) is the standard choice for heavy-hitter detection over token
streams (vocabulary pruning, hot-key detection before a skewed join,
trending-term monitors).

Scale shape: ONE explode pass over the tokens; each token contributes
`depth` (row, bucket) increments via a narrow posexplode — the shuffle
then carries at most depth x width counter rows per map partition
(map-side combine collapses everything else). The finished sketch is
depth x width rows (a few thousand) — broadcast it; estimation joins
never shuffle the corpus. Estimates are deterministic given the hash:
with `portable_hash52` the whole sketch (and therefore every estimate)
is reproducible bit-for-bit in any engine with md5 — which is what
makes an approximate structure oracle-checkable: the oracle replays
the same sketch, not the true counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import xxhash64_col


def _bucket(term: Column, row: int, width: int, salt: str, hash_fn) -> Column:
    return F.pmod(
        hash_fn(F.concat_ws("\x1f", term, F.lit(f"{salt}:{row}"))),
        F.lit(width),
    )


def cms_build(
    tokens: DataFrame,
    *,
    term_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms1",
    hash_fn=xxhash64_col,
) -> DataFrame:
    """Build a count-min sketch from token ROWS (one row per token
    occurrence). Returns (row, bucket, n) — depth x width counters.
    One explode + one groupBy; the depth hash family is salted
    instances of `hash_fn`."""
    pairs = tokens.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("row"),
                    _bucket(F.col(term_col), j, width, salt, hash_fn)
                    .alias("bucket"),
                )
                for j in range(depth)
            ])
        ).alias("rb")
    )
    return pairs.groupBy("rb.row", "rb.bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


def cms_tokens(docs: DataFrame, *, text_col: str) -> DataFrame:
    """The CMS token stream: whitespace terms of the lower-cased
    text, empties dropped — one `term` row per occurrence. Split out
    so the streaming sketch maintainer (`pipeline.cms_sketch_stream`)
    tokenizes each micro-batch EXACTLY as the batch build does."""
    words = F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))),
                    r"\s+")
    return (
        docs.select(F.explode(words).alias("term"))
        .where(F.col("term") != "")
    )


def cms_heavy_hitters_from_state(
    sketch: DataFrame,
    cand: DataFrame,
    *,
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms1",
    hash_fn=xxhash64_col,
    rank_by: str = "estimate",
) -> DataFrame:
    """The probe/rank stage of `cms_heavy_hitters` over EXISTING
    state: `sketch` = (row, bucket, n) CMS counters, `cand` =
    (term, exact) candidate counts. Both are plain sums, so state
    maintained incrementally (per shard / per micro-batch, merged by
    groupBy-sum) feeds this bit-identically to a single batch build
    — the streaming form's whole correctness argument. Each
    candidate probes the sketch via a broadcast equi-join on
    (row, bucket); the estimate is the MIN across the depth rows;
    ranking is (estimate DESC, term ASC), or (exact DESC, term ASC)
    with `rank_by="exact"` — the escape hatch that makes the
    `candidate_top_m` pre-filter LOSSLESS (r14 verdict item 4): the
    candidate table already carries exact counts, and
    `cms_candidates_top_m(m)`'s survivors are a superset of the
    global exact top-m, so exact-ranked top-k over the filtered
    candidates EQUALS exact-ranked top-k over all candidates
    whenever m >= k — a theorem, where estimate-ranking under heavy
    collisions (vocabulary >> width) is not (pinned by
    tests/test_round15_ops.py's divergence fixture)."""
    from pyspark.sql import Window

    if rank_by not in ("estimate", "exact"):
        raise ValueError(
            f"cms_heavy_hitters_from_state: rank_by must be "
            f"'estimate' or 'exact', got {rank_by!r}"
        )
    key = F.col("cms_est" if rank_by == "estimate" else "exact")
    probes = cand.select(
        "term", "exact",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("row"),
                    _bucket(F.col("term"), j, width, salt, hash_fn)
                    .alias("bucket"),
                )
                for j in range(depth)
            ])
        ).alias("rb"),
    ).select("term", "exact", "rb.row", "rb.bucket")
    est = (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("term", "exact")
        .agg(F.min("n").alias("cms_est"))
    )
    top = est.orderBy(key.desc(), F.col("term")).limit(k)
    w = Window.orderBy(key.desc(), F.col("term"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "term", "cms_est", "exact", "rank"
    )


def cms_candidates_top_m(
    tok: DataFrame, *, term_col: str = "term", m: int = 1000,
    n_buckets: int = 64, salt: str = "cmscand1",
    hash_fn=xxhash64_col,
) -> DataFrame:
    """The bounded candidate source the `cms_heavy_hitters` docstring
    promises for 100 TB: exact per-term counts (the same map-side-
    combined groupBy the default path pays), each term assigned to
    ONE of `n_buckets` by a salted hash of the TERM — deterministic
    and layout-independent, never `spark_partition_id` — then only
    each bucket's top-m by (count DESC, term ASC) survive, via the
    skew-safe `domain_cap_topk` salted two-level rank.

    Bounds the candidate TABLE at m x n_buckets rows where the full
    distinct-term table is vocabulary-sized — the downstream
    heavy-hitter rank then never sorts more than that. Survivors are
    a SUPERSET of the global top-m by EXACT count (min-k composition:
    a term dropped from its bucket is out-ranked by >= m terms there,
    so its global rank exceeds m). Caveat (r13 ADVICE): downstream
    `cms_heavy_hitters_from_state` ranks by CMS ESTIMATE, not exact
    count, so `cms_heavy_hitters(k=k, candidate_top_m=m)` with m >= k
    equals the exact-candidates path only when estimates preserve
    exact-count order across the m boundary — i.e. no term outside
    the exact top-m carries a collision-inflated estimate above the
    k-th survivor's. That holds whenever width comfortably exceeds
    the heavy tail (the regime the tests pin) but is NOT a theorem in
    the high-collision vocabulary >> width regime; there the filtered
    top-k can differ from the unfiltered one on collision-lucky
    tail terms (exhibited by tests/test_round15_ops.py's divergence
    fixture). Pick m with slack (m >> k) to shrink the exposure —
    `cms_heavy_hitters` warns below 4x — or close it entirely with
    `rank_by="exact"`: survivors are a superset of the exact top-m,
    so exact-ranked top-k over them is LOSSLESS for m >= k.
    No broadcast anywhere; same hash-portability contract as the
    sketch (pass the portable hash for oracle-replayable runs).
    Returns (term, exact) — the columns
    `cms_heavy_hitters_from_state` expects, whatever `term_col` was.
    """
    if m < 1:
        raise ValueError(f"cms_candidates_top_m: m must be >= 1, got {m}")
    from .corpus_prep import domain_cap_topk

    counts = (
        tok.groupBy(term_col)
        .agg(F.count(F.lit(1)).alias("exact"))
        .withColumn(
            "_b",
            F.pmod(
                hash_fn(F.concat_ws(
                    "\x1f", F.col(term_col).cast("string"),
                    F.lit(salt),
                )),
                F.lit(n_buckets),
            ),
        )
    )
    kept = domain_cap_topk(
        counts, group_col="_b", cap=m,
        order_by=[F.col("exact").desc(), F.col(term_col).asc()],
        id_col=term_col, with_totals=False,
    )
    return kept.select(F.col(term_col).alias("term"), "exact")


def cms_heavy_hitters(
    docs: DataFrame,
    *,
    text_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms1",
    hash_fn=xxhash64_col,
    candidate_top_m: int | None = None,
    rank_by: str = "estimate",
) -> DataFrame:
    """Top-k heavy-hitter terms by count-min estimate, with the exact
    count alongside (est >= exact always — CMS errs by overcounting).

    Candidates are the corpus' distinct terms with their exact counts
    (one groupBy); at 100 TB pass `candidate_top_m` to swap in the
    salted term-hash bucket top-m pre-filter (`cms_candidates_top_m`)
    so the candidate table is m x n_buckets rows (bucketing is by a
    salted hash of the TERM, independent of data partitioning)
    instead of vocabulary-sized — the sketch itself never needs
    candidates to be
    exact, and any other cheap candidate source plugs into
    `cms_heavy_hitters_from_state` directly. Each candidate probes
    the sketch via a broadcast equi-join on (row, bucket); the
    estimate is the MIN across the depth rows. Ranking is
    deterministic: (estimate DESC, term ASC). Composed from
    `cms_tokens` -> (`cms_build` + exact counts) ->
    `cms_heavy_hitters_from_state`, each reusable by the streaming
    maintainer.

    `rank_by="exact"` ranks the final top-k by the exact candidate
    counts instead of the CMS estimate — with `candidate_top_m` >= k
    the pre-filter is then LOSSLESS (see
    `cms_heavy_hitters_from_state`). Under the default estimate
    ranking, a `candidate_top_m` close to k in the high-collision
    vocabulary >> width regime can change the top-k (the
    `cms_candidates_top_m` caveat), so that combination WARNS unless
    m carries 4x slack over k.
    """
    if (rank_by == "exact" and candidate_top_m is not None
            and candidate_top_m < k):
        # the losslessness theorem REQUIRES m >= k (the per-bucket
        # survivors are a superset of the exact top-m, hence of the
        # top-k only when m >= k) — m < k would silently return a
        # truncated top-k, so it fails loudly (r15 ADVICE)
        raise ValueError(
            f"cms_heavy_hitters: rank_by='exact' needs "
            f"candidate_top_m >= k for the lossless guarantee, got "
            f"m={candidate_top_m} < k={k}"
        )
    # persist: the tokenize+explode subtree feeds BOTH the sketch and
    # the candidate counts — uncached it would re-scan the corpus.
    tok = cms_tokens(docs, text_col=text_col).persist()
    sketch = cms_build(
        tok, term_col="term", depth=depth, width=width, salt=salt,
        hash_fn=hash_fn,
    )
    if candidate_top_m is None:
        cand = tok.groupBy("term").agg(F.count(F.lit(1)).alias("exact"))
    else:
        if rank_by == "estimate" and candidate_top_m < 4 * k:
            import warnings

            warnings.warn(
                f"cms_heavy_hitters: candidate_top_m={candidate_top_m}"
                f" carries < 4x slack over k={k} while ranking by CMS"
                " estimate — under heavy collisions the filtered"
                " top-k can diverge from the unfiltered one; raise m"
                " or pass rank_by='exact' (lossless for m >= k)",
                stacklevel=2,
            )
        cand = cms_candidates_top_m(tok, term_col="term",
                                    m=candidate_top_m)
    out = cms_heavy_hitters_from_state(
        sketch, cand, k=k, depth=depth, width=width, salt=salt,
        hash_fn=hash_fn, rank_by=rank_by,
    )
    from .caching import release_after

    return release_after(out, tok)


def _bloom_positions(key: Column, *, m_bits: int, k: int, salt: str,
                     hash_fn) -> list[Column]:
    """The k salted hash positions of `key` in an m_bits Bloom filter."""
    return [
        F.pmod(
            hash_fn(F.concat_ws("\x1f", key.cast("string"),
                                F.lit(f"{salt}:{i}"))),
            F.lit(m_bits),
        )
        for i in range(k)
    ]


def bloom_build(
    keys: DataFrame,
    *,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 4,
    salt: str = "bloom1",
    hash_fn=xxhash64_col,
) -> list[int]:
    """Build a Bloom bitset over a (small) key set; returns the dense
    word array (m_bits/32 32-bit words) for broadcasting into probes.

    The classic decontamination / membership pre-filter shape at
    100 TB: the key side (an eval suite, a blocklist, yesterday's key
    set) is bounded and sketchable; the corpus side is not. The bitset
    is built distributed (explode to positions, bit_or per word — one
    narrow shuffle bounded by m_bits/32 rows) and only the finished
    words are pulled to the driver — bounded state exactly like the
    k x dim centroid pulls in `similarity.py`, m_bits/32 ints
    regardless of key cardinality (2 KB per 2^16 bits).

    32-bit words keep every mask an exact power of two below 2^31, so
    the pack/probe bit math is plain integer arithmetic that any
    engine reproduces (no 2^63 sign edge).
    """
    pos = keys.select(
        F.explode(
            F.array(*_bloom_positions(F.col(key_col), m_bits=m_bits,
                                      k=k, salt=salt, hash_fn=hash_fn))
        ).alias("p")
    ).distinct()
    words = (
        pos.select(
            (F.col("p") / 32).cast("int").alias("w"),
            F.pow(F.lit(2.0), F.pmod("p", F.lit(32)).cast("double"))
            .cast("long").alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
    )
    dense = [0] * ((m_bits + 31) // 32)
    for r in words.collect():  # bounded: m_bits/32 rows
        dense[r["w"]] = r["bits"]
    return dense


def bloom_probe(
    df: DataFrame,
    *,
    key_col: str,
    words: list[int],
    k: int = 4,
    salt: str = "bloom1",
    hash_fn=xxhash64_col,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Probe a Bloom bitset: adds `out_col` (true iff ALL k bits are
    set — i.e. the key is a membership candidate; false positives
    possible at the standard (1-e^{-kn/m})^k rate, false negatives
    never).

    Map-only: the words array rides along as an array literal in the
    plan (broadcast to every task), each probe is k element_at + AND
    chains inside whole-stage codegen — the corpus never shuffles."""
    m_bits = len(words) * 32
    arr = F.lit(words)
    checks = []
    for p in _bloom_positions(F.col(key_col), m_bits=m_bits, k=k,
                              salt=salt, hash_fn=hash_fn):
        word = F.element_at(arr, (p / 32).cast("int") + 1)
        mask = (
            F.pow(F.lit(2.0), F.pmod(p, F.lit(32)).cast("double"))
            .cast("long")
        )
        checks.append(word.bitwiseAND(mask) != 0)
    hit = checks[0]
    for c in checks[1:]:
        hit = hit & c
    return df.withColumn(out_col, hit)


def bloom_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    n: int = 3,
    m_bits: int = 1 << 16,
    k: int = 4,
    salt: str = "bloom1",
    hash_fn=xxhash64_col,
) -> DataFrame:
    """Bloom-prefiltered n-gram decontamination, with a built-in
    false-positive audit.

    Pipeline: benchmark n-grams -> Bloom bitset (bounded);
    corpus n-grams -> map-only Bloom probe; ONLY candidate grams (a
    tiny fraction of the corpus at any realistic m/n) proceed to the
    exact broadcast join. Per doc: total grams, Bloom candidates,
    exact matches, and the false-positive remainder. This is the scale
    path of `corpus_prep.decontaminate`: the exact join there streams
    EVERY corpus gram past the broadcast set; here the non-candidate
    grams (the overwhelming majority) short-circuit on 2 KB of bits
    without even materializing the probe join.
    """
    from .dedup import shingle_rows

    doc_grams = shingle_rows(docs, id_col=id_col, text_col=text_col,
                             n=n, distinct=True)
    bench_grams = (
        shingle_rows(benchmark, id_col=bench_id_col,
                     text_col=bench_text_col, n=n, distinct=True)
        .select("shingle").distinct()
    )
    words = bloom_build(bench_grams, key_col="shingle", m_bits=m_bits,
                        k=k, salt=salt, hash_fn=hash_fn)
    probed = bloom_probe(doc_grams, key_col="shingle", words=words,
                         k=k, salt=salt, hash_fn=hash_fn)
    # ONE corpus-gram pass, ONE doc-keyed shuffle: the exact check
    # rides the same scan as the probe (left broadcast join gated on
    # bloom_hit — no false negatives, so every bench gram is a
    # candidate and the gate never hides a true match), and all three
    # counters collapse in a single conditional aggregation. The
    # previous two-groupBy + join form scanned the corpus grams twice
    # and shuffled twice. When the bench-gram set outgrows a
    # broadcast, switch back to `probed.where("bloom_hit")` feeding a
    # shuffled join — then the Bloom's candidate cut IS what bounds
    # the join input.
    bench_marked = bench_grams.select(
        F.col("shingle").alias("_bs"), F.lit(True).alias("_in_bench")
    )
    exact = probed.join(
        F.broadcast(bench_marked),
        (F.col("shingle") == F.col("_bs")) & F.col("bloom_hit"),
        "left",
    )
    return exact.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count_if(F.col("bloom_hit")).alias("n_candidates"),
        F.count("_in_bench").alias("n_exact_matches"),
        (F.count_if(F.col("bloom_hit")) - F.count("_in_bench"))
        .alias("n_false_positives"),
    )


def hll_alpha(m: int) -> float:
    """Bias-correction constant from the HyperLogLog paper (Flajolet
    et al. 2007) for m >= 128 registers."""
    if m < 128:
        raise ValueError("hll_distinct supports p >= 7 (m >= 128)")
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame,
    *,
    key_col: str,
    group_col: str,
    p: int = 9,
    hash_fn=None,
    out_col: str = "hll_estimate",
) -> DataFrame:
    """Per-group approximate distinct count via an explicitly-built
    HyperLogLog sketch (Flajolet et al. 2007) — the constant-memory
    answer to COUNT(DISTINCT) at 100 TB, where the exact form shuffles
    every distinct key.

    Built from first principles on a portable hash so the WHOLE sketch
    is deterministic and engine-replayable (unlike
    `approx_count_distinct`, whose internal HLL++ registers are not
    reproducible outside Spark — that makes this one oracle-checkable):

      bucket = h mod m            (m = 2^p registers)
      w      = h div m            (remaining 52-p bits)
      rho    = (52-p) - bitlen(w) + 1     [all-zero w -> (52-p)+1]
      M_b    = max rho per bucket
      E      = alpha_m * m^2 / (sum_b 2^-M_b)   [empty buckets add 1]
      E      = m * ln(m / V)  when E <= 2.5m and V = empty buckets > 0
                                        (small-range correction)

    bitlen() is string-length-of-binary — exact integer bit math on
    both engines, no float log2 edge cases. The register fold is
    ordered by bucket id, so the double summation is bit-reproducible.

    Scale shape: one narrow projection computes (group, bucket, rho);
    ONE shuffle carries at most m rows per (group, map partition)
    thanks to map-side max; per-group state is m integers regardless
    of cardinality. The exact count is emitted alongside for error
    audit — drop it in production (it is the expensive thing the
    sketch replaces).
    """
    from .dedup import portable_hash52

    hash_fn = hash_fn or portable_hash52
    m = 1 << p
    wbits = 52 - p

    keyed = df.select(
        F.col(group_col).alias("_g"),
        hash_fn(F.col(key_col).cast("string")).alias("_h"),
    ).select(
        "_g",
        F.pmod("_h", F.lit(m)).alias("_bucket"),
        F.expr(f"_h div {m}").alias("_w"),
    ).select(
        "_g", "_bucket",
        F.when(F.col("_w") == 0, F.lit(wbits + 1))
        .otherwise(
            F.lit(wbits)
            - F.length(F.conv(F.col("_w").cast("string"), 10, 2)) + 1
        ).alias("_rho"),
    )
    regs = keyed.groupBy("_g", "_bucket").agg(F.max("_rho").alias("_m"))
    per_group = regs.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_n_used"),
        F.array_sort(F.collect_list(F.struct("_bucket", "_m"))).alias("_rs"),
    )
    inv_sum = F.aggregate(
        F.col("_rs"), F.lit(0.0),
        lambda a, s: a + F.pow(F.lit(2.0), -s["_m"].cast("double")),
    ) + (F.lit(m) - F.col("_n_used")).cast("double")
    raw = F.lit(hll_alpha(m) * m * m) / inv_sum
    zeros = (F.lit(m) - F.col("_n_used")).cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    exact = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.countDistinct(key_col).alias("n_exact")
    )
    return (
        per_group.join(exact, "_g")
        .select(
            F.col("_g").alias(group_col),
            "n_exact",
            F.round(est, 4).alias(out_col),
            F.col("_n_used").cast("int").alias("registers_used"),
        )
    )


def histogram_quantiles(
    df: DataFrame,
    *,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 200,
    quantiles: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Mergeable equi-width-histogram quantile estimates: one
    map-side-combined count per bin (the sketch — ``n_bins`` longs,
    corpus-size-independent, trivially mergeable across partitions /
    days / shards), then linear interpolation inside the bin that
    crosses each requested rank. Out-of-range values clamp into the
    edge bins, matching fixed-bound production histograms.

    Exactly the shape a 100 TB percentile dashboard needs: the scan
    is a single pass with a ``n_bins``-row shuffle; the interpolation
    runs on the n_bins-row aggregate (single-partition window over a
    constant-size set). Estimates round to 4 dp so the DuckDB twin
    replaying the same arithmetic hashes identically.
    """
    from pyspark.sql import Window

    if not hi > lo:
        raise ValueError(
            f"histogram_quantiles: need hi > lo for {value_col!r}, "
            f"got [{lo}, {hi}] (zero-width bins would silently drop "
            "every row)"
        )
    counts = histogram_bin_counts(
        df, value_col=value_col, lo=lo, hi=hi, n_bins=n_bins
    )
    return histogram_quantiles_from_counts(
        counts, lo=lo, hi=hi, n_bins=n_bins, quantiles=quantiles
    )


def histogram_bin_counts(
    df: DataFrame, *, value_col: str, lo: float, hi: float,
    n_bins: int = 200,
) -> DataFrame:
    """The (bin, c) histogram SKETCH under `histogram_quantiles`:
    one map-side-combined long counter per equi-width bin,
    out-of-range values clamped into the edge bins. Plain sums, so
    per-shard / per-micro-batch counts merged by groupBy-sum equal
    the single-pass build exactly — the mergeability the streaming
    maintainer (`pipeline.histogram_counts_stream`) rides."""
    if not hi > lo:
        raise ValueError(
            f"histogram_bin_counts: need hi > lo for {value_col!r}, "
            f"got [{lo}, {hi}]"
        )
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    bin_ = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    return (
        df.where(v.isNotNull())
        .groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def histogram_quantiles_from_counts(
    counts: DataFrame, *, lo: float, hi: float, n_bins: int = 200,
    quantiles: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """The interpolation stage of `histogram_quantiles` over an
    EXISTING (bin, c) counter table — exact-identity mergeable, so
    incrementally maintained counts feed it bit-identically to a
    batch build (the `cms_heavy_hitters_from_state` contract)."""
    from pyspark.sql import Window

    width = (hi - lo) / n_bins
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        counts.withColumn("cum", F.sum("c").over(wcum))
        .withColumn("total", F.max(F.col("cum")).over(
            Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)))
    )
    # All quantiles in ONE pass: broadcast the (tiny) quantile list
    # against the n_bins-row cumulative table, keep each quantile's
    # first crossing bin with min_by, interpolate. rank is the
    # ceil(q*N)-th row (1-based); its offset inside the crossing bin
    # is rank - cum_before.
    spark = counts.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    rank = F.ceil(F.col("q") * F.col("total"))
    return (
        cum.crossJoin(F.broadcast(qdf))
        .where(F.col("cum") >= rank)
        .groupBy("q")
        .agg(
            F.min_by(
                F.round(
                    F.lit(lo)
                    + (F.col("bin")
                       + (rank - (F.col("cum") - F.col("c"))) / F.col("c"))
                    * F.lit(width),
                    4,
                ),
                F.col("bin"),
            ).alias("estimate"),
            F.max("total").alias("n_rows"),
        )
    )


def histogram_quantiles_multi(
    df: DataFrame,
    *,
    signals: dict,
    n_bins: int = 200,
    quantiles: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """N signals' histogram quantiles in ONE input scan.

    ``signals`` maps column -> (lo, hi). Per-signal arithmetic is
    bit-identical to :func:`histogram_quantiles` (same bin clamp, same
    interpolation, same 4 dp rounding) — an oracle proven against the
    single-signal form stays valid. The scan explodes each row into
    one (signal, bin) pair per non-null signal, so the shuffle carries
    at most ``len(signals) * n_bins`` counter rows after map-side
    combine; the window + interpolation run per-signal over that
    constant-size aggregate. At 100 TB, 5 signals cost 1 scan, not 5.

    Returns (sig, q, estimate, n_rows) — ``n_rows`` is the signal's
    non-null count.
    """
    from pyspark.sql import Window

    if not signals:
        raise ValueError("histogram_quantiles_multi: signals empty")
    structs = []
    lo_expr = None
    width_expr = None
    for col, (lo, hi) in signals.items():
        if not hi > lo:
            raise ValueError(
                f"histogram_quantiles_multi: need hi > lo for "
                f"{col!r}, got [{lo}, {hi}] (a zero-width signal "
                "would be silently dropped from the output)"
            )
        width = (hi - lo) / n_bins
        v = F.col(col).cast("double")
        bin_ = F.least(
            F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(0)),
            F.lit(n_bins - 1),
        ).cast("int")
        # NULL guard OUTSIDE the clamp: greatest(NULL, 0) is 0 in
        # Spark (NULL-skipping), so an unguarded clamp would count
        # NULL values into bin 0 instead of dropping them.
        structs.append(
            F.struct(
                F.lit(col).alias("sig"),
                F.when(v.isNotNull(), bin_).alias("bin"),
            )
        )
        # Per-signal (lo, width) as a literal CASE mapping rather than
        # a joined lookup table: a broadcast of even a 2-row local
        # relation costs its own job — the mapping keeps the whole
        # cut-point build at exactly ONE job.
        s_lo, s_w = F.lit(float(lo)), F.lit(float(width))
        m = F.col("sig") == col
        lo_expr = (F.when(m, s_lo) if lo_expr is None
                   else lo_expr.when(m, s_lo))
        width_expr = (F.when(m, s_w) if width_expr is None
                      else width_expr.when(m, s_w))
    pairs = (
        df.select(F.explode(F.array(*structs)).alias("sb"))
        .select("sb.sig", "sb.bin")
        .where(F.col("bin").isNotNull())
    )
    counts = pairs.groupBy("sig", "bin").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("sig").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("sig").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = (
        counts.withColumn("cum", F.sum("c").over(wcum))
        .withColumn("total", F.max("cum").over(wall))
    )
    rank = F.ceil(F.col("q") * F.col("total"))
    return (
        cum.select(
            "*",
            F.explode(
                F.array(*[F.lit(float(q)) for q in quantiles])
            ).alias("q"),
        )
        .withColumn("lo", lo_expr)
        .withColumn("width", width_expr)
        .where(F.col("cum") >= rank)
        .groupBy("sig", "q")
        .agg(
            F.min_by(
                F.round(
                    F.col("lo")
                    + (F.col("bin")
                       + (rank - (F.col("cum") - F.col("c"))) / F.col("c"))
                    * F.col("width"),
                    4,
                ),
                F.col("bin"),
            ).alias("estimate"),
            F.max("total").alias("n_rows"),
        )
    )


def hll_merge_estimate(
    df: DataFrame,
    *,
    key_col: str,
    shard_col: str,
    p: int = 9,
    hash_fn=None,
    out_col: str = "hll_estimate",
) -> DataFrame:
    """Register-level HLL MERGE: build one sketch per shard (the m
    small-int register table each ingestion shard / day / partition
    would persist), then fold shards together with a per-bucket MAX
    and estimate once. MAX is associative and commutative, so the
    merged estimate is IDENTICAL to a sketch built over the raw
    union — the property that lets 100 TB distinct-count dashboards
    aggregate daily sketches instead of re-scanning history. The
    oracle replays the GLOBAL build, which the merge must equal
    bit-for-bit (same registers, same ordered fold).

    Same register arithmetic as `hll_distinct` (portable hash, exact
    bit math); one narrow projection + two bounded shuffles
    (shard×m rows, then m rows).
    """
    from .dedup import portable_hash52

    hash_fn = hash_fn or portable_hash52
    m = 1 << p
    wbits = 52 - p

    keyed = df.select(
        F.col(shard_col).alias("_s"),
        hash_fn(F.col(key_col).cast("string")).alias("_h"),
    ).select(
        "_s",
        F.pmod("_h", F.lit(m)).alias("_bucket"),
        F.expr(f"_h div {m}").alias("_w"),
    ).select(
        "_s", "_bucket",
        F.when(F.col("_w") == 0, F.lit(wbits + 1))
        .otherwise(
            F.lit(wbits)
            - F.length(F.conv(F.col("_w").cast("string"), 10, 2)) + 1
        ).alias("_rho"),
    )
    # Per-shard sketch state (what each shard persists) ...
    shard_regs = keyed.groupBy("_s", "_bucket").agg(
        F.max("_rho").alias("_m")
    )
    # ... and THE merge: associative per-bucket max across shards.
    merged = shard_regs.groupBy("_bucket").agg(F.max("_m").alias("_m"))
    one = merged.agg(
        F.count(F.lit(1)).alias("_n_used"),
        F.array_sort(F.collect_list(F.struct("_bucket", "_m"))).alias("_rs"),
    )
    inv_sum = F.aggregate(
        F.col("_rs"), F.lit(0.0),
        lambda a, s: a + F.pow(F.lit(2.0), -s["_m"].cast("double")),
    ) + (F.lit(m) - F.col("_n_used")).cast("double")
    raw = F.lit(hll_alpha(m) * m * m) / inv_sum
    zeros = (F.lit(m) - F.col("_n_used")).cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    exact = df.agg(F.countDistinct(key_col).alias("n_exact"))
    shards = shard_regs.agg(F.countDistinct("_s").alias("n_shards"))
    return (
        one.crossJoin(exact).crossJoin(shards)
        .select(
            "n_exact",
            F.round(est, 4).alias(out_col),
            F.col("_n_used").cast("int").alias("registers_used"),
            "n_shards",
        )
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    *,
    bucket_col: str = "bucket",
    rho_col: str = "mr",
    p: int = 9,
    out_col: str = "hll_estimate",
) -> DataFrame:
    """Finish an HLL estimate from a (bucket, max-rho) register table
    — the read-side half of the sketch, shared by the streaming
    register aggregation (whose state IS this table) and any stored
    daily sketch. Same ordered fold + small-range correction as
    hll_distinct/hll_merge_estimate, so every path lands on identical
    doubles."""
    m = 1 << p
    one = regs.agg(
        F.count(F.lit(1)).alias("_n_used"),
        F.array_sort(
            F.collect_list(F.struct(F.col(bucket_col).alias("_bucket"),
                                    F.col(rho_col).alias("_m")))
        ).alias("_rs"),
    )
    inv_sum = F.aggregate(
        F.col("_rs"), F.lit(0.0),
        lambda a, s: a + F.pow(F.lit(2.0), -s["_m"].cast("double")),
    ) + (F.lit(m) - F.col("_n_used")).cast("double")
    raw = F.lit(hll_alpha(m) * m * m) / inv_sum
    zeros = (F.lit(m) - F.col("_n_used")).cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return one.select(
        F.round(est, 4).alias(out_col),
        F.col("_n_used").cast("int").alias("registers_used"),
    )


def winsorize(
    df: DataFrame,
    *,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 200,
    p_low: float = 0.01,
    p_high: float = 0.99,
    out_col: str = "winsorized",
) -> DataFrame:
    """Winsorize (clip) a value column at the [p_low, p_high]
    histogram-quantile estimates — outlier taming for training-data
    numeric features without a global sort: the cut points come from
    the mergeable n_bins histogram (one map-side-combined pass), then
    the clip is a map-only projection. Two scans total, no shuffle of
    the data itself, constant driver state (two doubles).

    Empty / all-null value columns yield no quantile estimates; in
    that case there is nothing to clip — the input passes through
    with ``out_col = value`` (and ``clipped`` NULL for NULL values,
    false otherwise, same expression as the clipping path).
    """
    qs = {
        r.q: r.estimate
        for r in histogram_quantiles(
            df, value_col=value_col, lo=lo, hi=hi, n_bins=n_bins,
            quantiles=(p_low, p_high),
        ).collect()
    }
    if p_low not in qs or p_high not in qs:
        return df.withColumn(out_col, F.col(value_col)).withColumn(
            "clipped", (F.col(value_col) != F.col(out_col))
        )
    lo_cut, hi_cut = qs[p_low], qs[p_high]
    return df.withColumn(
        out_col,
        F.least(
            F.greatest(F.col(value_col), F.lit(lo_cut)), F.lit(hi_cut)
        ),
    ).withColumn("clipped", (F.col(value_col) != F.col(out_col)))


# --- KMV (bottom-k / theta-style) distinct sketches -------------------

KMV_HASH_SPACE = float(1 << 52)
"""Size of the `portable_hash52` hash space as a double (exact: 2^52
is representable). The KMV estimator treats hashes as uniform draws
from [0, 2^52)."""


def kmv_numerator(k: int) -> float:
    """(k-1) * 2^52 as ONE double literal, computed once in Python so
    the Spark plan and the DuckDB twin bake the identical constant
    (the `_HLL_ALPHA_M2` pattern). Exact for any practical k."""
    return float(k - 1) * KMV_HASH_SPACE


def kmv_sketch(
    df: DataFrame,
    *,
    key_col: str,
    group_col: str,
    k: int = 256,
    salt_buckets: int = 16,
    hash_fn=None,
    group_out: str = "group",
) -> DataFrame:
    """Per-group bottom-k (KMV / theta-style) distinct-value sketch
    (Beyer et al., SIGMOD 2007: "On synopses for distinct value
    estimation under multiset operations") — the sketch family that,
    unlike HyperLogLog (`hll_distinct`), supports SET INTERSECTION
    estimates (`kmv_set_ops`): "how many distinct users did BOTH X and
    Y" over 100 TB without shuffling distinct keys to one place.

    Returns (group, kmv_hash, rank): the k smallest distinct
    `portable_hash52` values per group, rank 1..k by hash. The whole
    sketch is a deterministic function of the key set, so every
    downstream estimate is engine-replayable — the oracle replays the
    sketch, which is what makes an approximate structure
    hash-checkable.

    Scale shape: (1) groupBy(group, hash) dedups occurrences with
    map-side combine — the shuffle carries at most one row per
    distinct (group, key) per map partition; (2) a salted two-level
    bottom-k (the `dedup_keep_best` rank pattern): row_number within
    (group, hash mod salt_buckets) prunes to <= salt_buckets*k rows
    per group before (3) the final per-group rank — no group's full
    distinct set ever sorts on one task. Driver state: none; the
    sketch stays distributed (k rows per group) and is broadcastable.

    Mergeability (exact, not approximate): bottom-k of a union equals
    bottom-k of the union of per-shard bottom-k's — `kmv_merge` of
    per-shard sketches is bit-identical to the global build.
    """
    from pyspark.sql import Window

    from .dedup import portable_hash52

    hash_fn = hash_fn or portable_hash52
    distinct = (
        df.select(
            F.col(group_col).alias("_g"),
            hash_fn(F.col(key_col).cast("string")).alias("_h"),
        )
        .groupBy("_g", "_h")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    lvl1 = distinct.withColumn("_s", F.pmod("_h", F.lit(salt_buckets)))
    w1 = Window.partitionBy("_g", "_s").orderBy("_h")
    survivors = (
        lvl1.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_s", "_r1")
    )
    w2 = Window.partitionBy("_g").orderBy("_h")
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_g").alias(group_out),
            F.col("_h").alias("kmv_hash"),
            "rank",
        )
    )


def kmv_merge(
    sketches: DataFrame,
    *,
    k: int,
    group_col: str = "group",
) -> DataFrame:
    """Merge per-shard KMV sketches into the global per-group sketch:
    union the hash sets, re-rank, keep the bottom k. EXACT identity —
    the k smallest of a union are among the k smallest of each part —
    so the merged sketch is bit-identical to one built over the raw
    union (the mergeability claim the `ext-kmv-merge` gate checks by
    replaying the GLOBAL build as the oracle). Input rows per group
    are <= n_shards * k, so the final rank is cheap by construction.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy("kmv_hash")
    return (
        sketches.select(group_col, "kmv_hash")
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def kmv_distinct_estimate(
    sketch: DataFrame,
    *,
    k: int,
    group_col: str = "group",
) -> DataFrame:
    """Per-group distinct-count estimate from a `kmv_sketch`:
    (k-1) / U_(k) with U_(k) = kth_smallest_hash / 2^52 — i.e.
    (k-1)*2^52 / h_(k), the unbiased KMV estimator. A group whose
    sketch holds fewer than k values is EXACT (the sketch saw every
    distinct hash), so the count itself is returned. One aggregate
    over k rows per group; the numerator literal is shared with the
    SQL twin via `kmv_numerator`."""
    num = kmv_numerator(k)
    return (
        sketch.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_sketch"),
            F.max("kmv_hash").alias("_kth"),
        )
        .select(
            group_col,
            "n_sketch",
            F.round(
                F.when(
                    F.col("n_sketch") < k, F.col("n_sketch").cast("double")
                ).otherwise(F.lit(num) / F.col("_kth").cast("double")),
                4,
            ).alias("kmv_estimate"),
        )
    )


def kmv_set_ops(
    sketch: DataFrame,
    *,
    group_a,
    group_b,
    k: int,
    group_col: str = "group",
) -> DataFrame:
    """Union / Jaccard / intersection estimates for two groups from
    ONE `kmv_sketch` (Beyer et al. 2007 §4): the bottom-k of the
    merged hash sets is a valid KMV sketch of the UNION, and the
    fraction of those k values present in BOTH input sketches is an
    unbiased Jaccard estimate — so

        union_est     = (k-1)*2^52 / h_(k)   [exact count if < k]
        jaccard       = |bottom-k(A u B)  in A and B| / K
        intersect_est = jaccard * union_est

    — the distinct-intersection question HLL structurally cannot
    answer (register maxes only union). Inputs are two k-row sketch
    slices: the merge, rank and aggregate all run on <= 2k rows
    (bounded by construction — the corpus was only touched by
    `kmv_sketch`). Exactness: if the merged set has < k values, both
    sketches were exhaustive, so union (and hence intersection) are
    exact counts, emitted through the same expressions.

    Output: one row (group_a, group_b, n_merged, union_est, jaccard,
    intersect_est). Floats rounded to 4 dp; the division and product
    order is pinned (matches/K, then * union) so the DuckDB twin
    replays bit-for-bit.
    """
    from pyspark.sql import Window

    num = kmv_numerator(k)
    marked = sketch.filter(
        F.col(group_col).isin([group_a, group_b])
    ).select(
        "kmv_hash",
        F.when(F.col(group_col) == group_a, 1).otherwise(0).alias("_in_a"),
        F.when(F.col(group_col) == group_b, 1).otherwise(0).alias("_in_b"),
    )
    merged = marked.groupBy("kmv_hash").agg(
        F.max("_in_a").alias("_in_a"), F.max("_in_b").alias("_in_b")
    )
    # Whole-frame window over <= 2k rows — bounded by construction.
    ranked = merged.withColumn(
        "_r", F.row_number().over(Window.orderBy("kmv_hash"))
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_merged"),
        F.max(F.when(F.col("_r") == k, F.col("kmv_hash"))).alias("_kth"),
        F.sum(
            F.when(F.col("_r") <= k, F.col("_in_a") * F.col("_in_b"))
            .otherwise(0)
        ).alias("_matches"),
    )
    big_k = F.least(F.col("n_merged"), F.lit(k)).cast("double")
    union_raw = F.when(
        F.col("n_merged") < k, F.col("n_merged").cast("double")
    ).otherwise(F.lit(num) / F.col("_kth").cast("double"))
    jac_raw = F.col("_matches").cast("double") / big_k
    return agg.select(
        F.lit(group_a).alias("group_a"),
        F.lit(group_b).alias("group_b"),
        F.col("n_merged").cast("long").alias("n_merged"),
        F.round(union_raw, 4).alias("union_est"),
        F.round(jac_raw, 4).alias("jaccard"),
        F.round(jac_raw * union_raw, 4).alias("intersect_est"),
    )


def kmv_overlap_matrix(
    sketch: DataFrame,
    *,
    k: int,
    group_col: str = "group",
) -> DataFrame:
    """ALL-PAIRS overlap audit from ONE `kmv_sketch` pass: for every
    unordered group pair (g1 < g2), the same union / Jaccard /
    intersection estimates as `kmv_set_ops` — the per-source-pair
    duplication matrix a corpus card wants ("how much of src3 is also
    in src17"), computed WITHOUT touching the corpus again. With G
    groups the exact answer needs G(G-1)/2 distinct-intersection
    jobs over the raw data; here everything downstream of the sketch
    is bounded by G^2 * k rows (tens of groups x hundreds of hashes —
    trivially small at any corpus size).

    Scale notes: the group list and the pair table are
    group-count-bounded (broadcast); each sketch row fans out to its
    G-1 partner pairs, the per-pair rank window holds <= 2k rows.
    Estimator arithmetic is shared with `kmv_set_ops` expression for
    expression, so the twin replays bit-for-bit.
    """
    from pyspark.sql import Window

    num = kmv_numerator(k)
    groups = sketch.select(F.col(group_col).alias("_g")).distinct()
    pairs = (
        groups.select(F.col("_g").alias("g1"))
        .crossJoin(F.broadcast(groups.select(F.col("_g").alias("g2"))))
        .where(F.col("g1") < F.col("g2"))
    )
    a = sketch.select(F.col(group_col).alias("g1"), "kmv_hash")
    b = sketch.select(F.col(group_col).alias("g2"), "kmv_hash")
    left = F.broadcast(pairs).join(a, "g1").select(
        "g1", "g2", "kmv_hash",
        F.lit(1).alias("_in_a"), F.lit(0).alias("_in_b"),
    )
    right = F.broadcast(pairs).join(b, "g2").select(
        "g1", "g2", "kmv_hash",
        F.lit(0).alias("_in_a"), F.lit(1).alias("_in_b"),
    )
    merged = left.unionByName(right).groupBy("g1", "g2", "kmv_hash").agg(
        F.max("_in_a").alias("_in_a"), F.max("_in_b").alias("_in_b")
    )
    ranked = merged.withColumn(
        "_r",
        F.row_number().over(
            Window.partitionBy("g1", "g2").orderBy("kmv_hash")
        ),
    )
    agg = ranked.groupBy("g1", "g2").agg(
        F.count(F.lit(1)).alias("n_merged"),
        F.max(F.when(F.col("_r") == k, F.col("kmv_hash"))).alias("_kth"),
        F.sum(
            F.when(F.col("_r") <= k, F.col("_in_a") * F.col("_in_b"))
            .otherwise(0)
        ).alias("_matches"),
    )
    big_k = F.least(F.col("n_merged"), F.lit(k)).cast("double")
    union_raw = F.when(
        F.col("n_merged") < k, F.col("n_merged").cast("double")
    ).otherwise(F.lit(num) / F.col("_kth").cast("double"))
    jac_raw = F.col("_matches").cast("double") / big_k
    return agg.select(
        F.col("g1").alias("group_a"),
        F.col("g2").alias("group_b"),
        F.col("n_merged").cast("long").alias("n_merged"),
        F.round(union_raw, 4).alias("union_est"),
        F.round(jac_raw, 4).alias("jaccard"),
        F.round(jac_raw * union_raw, 4).alias("intersect_est"),
    )
