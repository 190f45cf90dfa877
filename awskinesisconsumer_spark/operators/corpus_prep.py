"""Corpus-preparation operators for training-data pipelines:
benchmark decontamination and fixed-budget sequence packing.

Both are pure DataFrame compositions (no Python UDFs), so they run
inside whole-stage codegen and scale by partitioning:

- `decontaminate` broadcasts the (small) benchmark n-gram set against
  the (huge) corpus — the corpus is never shuffled by the join; only
  the matched rows (a tiny fraction) shuffle for the per-doc rollup.
- `pack_sequences` computes a global token prefix-sum with the
  classic two-pass pattern (per-group cumsum + tiny group-offset
  broadcast) instead of a single-partition global window, which is
  the canonical Spark scaling trap for cumulative sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .caching import release_after as _release_after
from .dedup import portable_hash52, shingle_rows, xxhash64_col
from .text import _words as _ws_words

# Version marker for the content-defined-chunking DEFAULT hash family.
# v1 (<= round 8): portable_hash52 (md5-derived, DuckDB-replayable).
# v2 (round 9+):   xxhash64_col (JVM-side, measured ~3.3x faster).
# Chunk boundaries AND chunk_hash values differ between families, so
# chunk tables / dedup indexes persisted under v1 do NOT reproduce
# under the v2 default — callers re-running an existing pipeline must
# pass hash_fn=portable_hash52 explicitly. Each CDC function warns
# when the default is relied upon (a plain warnings.warn — how often
# it surfaces is governed by the caller's warning filters: once per
# call site under Python's default filter, every call under
# "always"; ADVICE r10 — there is deliberately no process-level
# latch, so test harnesses that reset filters still see it).
CDC_HASH_DEFAULT_VERSION = 2


def _cdc_default_hash(hash_fn, op: str):
    """Resolve the CDC hash family, loudly: relying on the default
    gets a FutureWarning naming the v1 -> v2 change (ADVICE r9 —
    bit-identical re-runs are the framework's core contract, so a
    silently different default is a compat trap). Deduplication is
    left to the caller's warning filters (see the module comment at
    CDC_HASH_DEFAULT_VERSION)."""
    if hash_fn is not None:
        return hash_fn
    import warnings

    warnings.warn(
        f"{op}: the default hash_fn changed in "
        f"CDC_HASH_DEFAULT_VERSION={CDC_HASH_DEFAULT_VERSION} from "
        "portable_hash52 to xxhash64_col; chunk boundaries and "
        "chunk_hash values differ from tables persisted under the old "
        "default. Pass hash_fn=portable_hash52 to reproduce them, or "
        "hash_fn=xxhash64_col to pin the new family and silence this.",
        FutureWarning,
        stacklevel=3,
    )
    return xxhash64_col


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    n: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """Flag corpus documents that share >= `min_overlap` distinct word
    n-grams with ANY benchmark document (training-set decontamination
    against an evaluation suite).

    Returns `docs` plus `n_matched_ngrams` (distinct corpus-side
    n-grams that appear anywhere in the benchmark; 0 when clean) and
    `contaminated` (boolean).

    Scale shape: the benchmark n-gram set is tiny relative to a
    training corpus (eval suites are fixed-size), so the join is a
    broadcast hash join — the corpus side streams through map-side
    with NO shuffle; only matched (doc, gram) rows (rare) shuffle for
    the groupBy, and the final re-attach keys on `id_col` with the
    match table on the small side, broadcast again. Hot/stop-word
    grams never explode the join because both sides are per-doc
    DISTINCT and the benchmark side is bounded by its corpus size.
    """
    doc_grams = shingle_rows(docs, id_col=id_col, text_col=text_col,
                             n=n, distinct=True)
    bench_grams = (
        shingle_rows(benchmark, id_col=bench_id_col,
                     text_col=bench_text_col, n=n, distinct=True)
        .select(F.col("shingle")).distinct()
    )
    # No threshold filter here: docs below min_overlap must still
    # report their true overlap count (contaminated=false), not 0.
    matched = (
        doc_grams.join(F.broadcast(bench_grams), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_matched_ngrams"))
    )
    # No broadcast hint on the re-attach: `matched` is usually tiny
    # (AQE will broadcast it), but its size is bounded only by the
    # corpus — a FORCED broadcast would OOM if contamination is
    # widespread. The bench-gram broadcast above is the safe one (its
    # bound is the benchmark's size).
    return (
        docs.join(matched, id_col, "left")
        .withColumn("n_matched_ngrams",
                    F.coalesce(F.col("n_matched_ngrams"), F.lit(0)))
        .withColumn("contaminated", F.col("n_matched_ngrams") >= min_overlap)
    )


def corruption_spans(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    corruption_rate: float = 0.15,
    mean_span_len: int = 3,
    salt: str = "v1",
    hash_fn=None,
) -> DataFrame:
    """T5/UL2-style span-corruption PLAN: deterministically sample
    non-overlapping word spans covering ~`corruption_rate` of each
    document's tokens with mean span length `mean_span_len`, emitted
    as (id, span_idx, start_word, span_len) — the masking/sentinel
    insertion itself is a cheap downstream map over this plan. The
    denoising-objective data-prep step, made REPRODUCIBLE: span
    starts and lengths are hash gates of (doc id, position, salt) —
    no RNG — so re-runs, retried tasks, and engines agree, and a new
    `salt` is a fresh corruption draw (the `sample_stratified` /
    `expand_mixture_epochs` determinism rule).

    Election: position p starts a candidate span where
    hash(id, p, salt) % K == 0 with K = round(mean_span_len /
    corruption_rate) (expected fraction of starts = rate / mean_len,
    so coverage approaches `corruption_rate`, biased slightly low by
    overlap drops and end truncation — measured ~0.13 at rate 0.15
    on the fixture, the same bias real T5 span sampling has); its length
    is 1 + hash(id, p, salt, 'len') % (2 * mean_span_len - 1)
    (uniform 1..2m-1, mean m). Overlaps resolve LEFT-TO-RIGHT: a
    candidate starting inside the previous accepted span is dropped;
    spans truncate at the document end. Docs with no words — AND docs
    whose positions elect no spans (likely below ~K words) — yield
    no plan rows; consumers needing every doc accounted for use
    `denoising_pairs`, the lossless form (its no-span docs emit a
    passthrough pair).

    Scale shape: elections are pure column expressions over the
    position sequence; overlap resolution is the `_clamp_boundaries`
    F.aggregate shape (one fold over the sparse candidate array,
    state = last span end + accumulator) — zero shuffles, zero
    Python. The twin replays the fold as a per-doc recursive CTE
    advancing one candidate per step (the pack_nofragment idiom;
    DuckDB's list_reduce mis-threads struct accumulators, measured,
    so the CTE form is the reliable replay).
    """
    words, spans = _corruption_plan(
        id_col=id_col, text_col=text_col,
        corruption_rate=corruption_rate, mean_span_len=mean_span_len,
        salt=salt, hash_fn=hash_fn, op="corruption_spans",
    )
    # posexplode_OUTER + isNotNull (r16 optimization round): non-outer
    # Generate restates the whole span-plan election in an inferred
    # Filter below it (the _cdc_spans_to_chunks fix); the NULL row an
    # empty plan emits under outer is dropped by the guard, so the
    # row set is identical.
    return (
        df.select(F.col(id_col), spans.alias("_sp"))
        .select(id_col, F.posexplode_outer("_sp").alias("span_idx", "_s"))
        .where(F.col("_s").isNotNull())
        .select(
            id_col,
            F.col("span_idx").cast("int").alias("span_idx"),
            F.col("_s.s").cast("int").alias("start_word"),
            F.col("_s.l").cast("int").alias("span_len"),
        )
    )


def _corruption_plan(*, id_col: str, text_col: str,
                     corruption_rate: float, mean_span_len: int,
                     salt: str, hash_fn, op: str):
    """The span-corruption election + overlap fold as COLUMNS
    (words array, resolved span array) — shared by `corruption_spans`
    (which explodes the plan) and `denoising_pairs` (which builds the
    masked input/target strings from it, map-only, no re-join)."""
    if not (0.0 < corruption_rate <= 1.0):
        raise ValueError(
            f"{op}: corruption_rate in (0, 1], got {corruption_rate}"
        )
    if mean_span_len < 1:
        raise ValueError(
            f"{op}: mean_span_len >= 1, got {mean_span_len}"
        )
    hash_fn = hash_fn or xxhash64_col
    k_gate = max(1, round(mean_span_len / corruption_rate))
    len_mod = 2 * mean_span_len - 1
    # the shared empty-guarded whitespace split (text._words), WITHOUT
    # lowercasing — masking must preserve the original words
    words = _ws_words(F.col(text_col))
    n = F.size(words)
    sid = F.col(id_col).cast("string")

    def _h(p: Column, *extra: str) -> Column:
        parts = [sid, p.cast("string"), F.lit(salt)]
        parts += [F.lit(e) for e in extra]
        return hash_fn(F.concat_ws("\x1f", *parts))

    starts = F.filter(
        F.when(n >= 1, F.sequence(F.lit(1), n))
        .otherwise(F.array().cast("array<int>")),
        lambda p: F.pmod(_h(p), F.lit(k_gate)) == 0,
    )
    cand = F.transform(
        starts,
        lambda p: F.struct(
            p.alias("s"),
            (F.pmod(_h(p, "len"), F.lit(len_mod)) + 1)
            .cast("int").alias("l"),
        ),
    )
    empty_spans = F.array().cast("array<struct<s:int,l:int>>")

    def _step(st: Column, c: Column) -> Column:
        accept = c["s"] > st["last_end"]
        tl = F.least(c["l"], n - c["s"] + 1)
        return F.struct(
            F.when(accept, c["s"] + tl - 1)
            .otherwise(st["last_end"]).alias("last_end"),
            F.when(
                accept,
                F.concat(
                    st["spans"],
                    F.array(F.struct(c["s"].alias("s"), tl.alias("l"))),
                ),
            ).otherwise(st["spans"]).alias("spans"),
        )

    init = F.struct(
        F.lit(0).cast("int").alias("last_end"),
        empty_spans.alias("spans"),
    )
    return words, F.aggregate(cand, init, _step)["spans"]


def denoising_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    corruption_rate: float = 0.15,
    mean_span_len: int = 3,
    salt: str = "v1",
    hash_fn=None,
) -> DataFrame:
    """The denoising objective END-TO-END: turn each document into a
    T5-style (input_text, target_text) training pair — corrupted
    spans replaced by numbered sentinels in the input, and the target
    holding each sentinel followed by the words it hides, closed by a
    final sentinel:

        input:  w1 w2 <extra_id_0> w6 <extra_id_1> w9
        target: <extra_id_0> w3 w4 w5 <extra_id_1> w7 w8 <extra_id_2>

    Spans come from the SAME deterministic plan as `corruption_spans`
    (same salt => byte-identical pairs; the plan op exists for
    auditing the layout, this one for producing the data). Docs with
    no elected spans yield input == the whitespace-normalized text
    and target == the lone closing sentinel <extra_id_0>; empty/NULL
    docs yield empty input and that same lone sentinel.

    Scale shape: strictly map-only — the plan fold plus two indexed
    array-transform/flatten passes over the words array; no shuffle,
    no join, no Python. Emits (id, n_words, n_spans, input_text,
    target_text).

    The words array and the resolved span plan are STAGED into their
    own projection before the sentinel rendering: the rendering
    lambdas index into both (`element_at(spans, i)`,
    `slice(words, ...)`), and codegen subexpression elimination
    cannot hoist an expression OUT of a lambda scope — referenced
    inline, the whole election+fold (and the regex split) re-ran per
    span element, measured 10x the staged wall at sf0.1 (14.5 s ->
    1.5 s, identical output). Collapse-project leaves the stage in
    place because the aliases are non-cheap and multiply referenced.
    """
    raw_words, raw_spans = _corruption_plan(
        id_col=id_col, text_col=text_col,
        corruption_rate=corruption_rate, mean_span_len=mean_span_len,
        salt=salt, hash_fn=hash_fn, op="denoising_pairs",
    )
    staged = df.select(
        F.col(id_col), raw_words.alias("_w"), raw_spans.alias("_sp")
    )
    words, spans = F.col("_w"), F.col("_sp")
    n = F.size(words)
    k = F.size(spans)

    def sentinel(i: Column) -> Column:
        return F.concat(F.lit("<extra_id_"), i.cast("string"), F.lit(">"))

    # input pieces: for span i (0-based), the gap words since the
    # previous span's end, then sentinel_i; prev end comes from the
    # spans array itself (element_at is 1-based, so element i IS the
    # previous span inside transform's 0-based index)
    def prev_end(i: Column) -> Column:
        return F.when(i == 0, F.lit(0)).otherwise(
            F.element_at(spans, i)["s"] + F.element_at(spans, i)["l"] - 1
        )

    in_pieces = F.flatten(
        F.transform(
            spans,
            lambda sp, i: F.concat(
                F.slice(words, prev_end(i) + 1,
                        sp["s"] - prev_end(i) - 1),
                F.array(sentinel(i)),
            ),
        )
    )
    last_end = F.when(k == 0, F.lit(0)).otherwise(
        F.element_at(spans, k)["s"] + F.element_at(spans, k)["l"] - 1
    )
    input_words = F.concat(
        in_pieces, F.slice(words, last_end + 1, n - last_end)
    )
    tgt_pieces = F.flatten(
        F.transform(
            spans,
            lambda sp, i: F.concat(
                F.array(sentinel(i)), F.slice(words, sp["s"], sp["l"])
            ),
        )
    )
    target_words = F.concat(tgt_pieces, F.array(sentinel(k)))
    return staged.select(
        F.col(id_col),
        n.cast("int").alias("n_words"),
        k.cast("int").alias("n_spans"),
        F.array_join(input_words, " ").alias("input_text"),
        F.array_join(target_words, " ").alias("target_text"),
    )


def ul2_plan(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    regimes: tuple = (
        ("R", 0.15, 3),    # regular T5 span corruption
        ("X", 0.5, 8),     # extreme denoising (high rate, long spans)
        ("S", None, None),  # sequential / prefix-LM: one suffix span
    ),
    salt: str = "v1",
    hash_fn=None,
) -> DataFrame:
    """UL2 mixture-of-denoisers PLAN (Tay et al., UL2): every document
    is hash-assigned ONE denoiser regime (uniform over `regimes` —
    the paper's mixing step), then planned under that regime's
    parameters: R/X regimes run the `corruption_spans` election
    (per-regime (rate, mean) and a per-regime salt, so the same doc
    draws independent plans under different regimes); the S regime
    emits a single suffix span — words[c+1..n] with the cut c =
    hash(id, salt, 's_cut') % n in 0..n-1, so the target is never
    empty — which downstream renders as the prefix-LM objective.
    Like `corruption_spans`, zero-word docs and R/X docs electing no
    spans yield no rows (the sentinel/passthrough rendering is
    `denoising_pairs`' job per regime).

    Emitted: (id, regime, span_idx, start_word, span_len) — the
    union of per-regime plans; downstream maps render each regime's
    masking/serialization from the same span rows.

    NO RNG anywhere: the regime gate, elections, lengths and the S
    cut are all portable-hash functions of (id, salt), so re-runs,
    engines, and resumed jobs agree; a salt change redraws the whole
    mixture (the `expand_mixture_epochs` determinism rule).

    Scale shape: map-only end to end — the regime gate is one hash
    projection, each regime's plan is the `_corruption_plan`
    fold/arithmetic over ITS hash-defined subset (disjoint filters
    over one scan; Spark unions them without a shuffle), the S span
    is pure arithmetic. No joins, no aggregation, no Python.

    Default hash is the engine-portable 52-bit md5 prefix for EVERY
    draw (gate, elections, lengths, S cut — resolved ONCE here and
    passed through to `corruption_spans`, overriding its xxhash64
    default so one `hash_fn` governs the whole mixture); swap
    hash_fn=xxhash64_col for the production family.
    """
    from awskinesisconsumer_spark.operators.dedup import portable_hash52

    if not regimes:
        raise ValueError("ul2_plan: regimes must be non-empty")
    names = [r[0] for r in regimes]
    if len(set(names)) != len(names):
        raise ValueError(f"ul2_plan: duplicate regime names in {names}")
    hash_fn = hash_fn or portable_hash52
    h = hash_fn
    sid = F.col(id_col).cast("string")
    ridx = F.pmod(
        h(F.concat_ws("\x1f", sid, F.lit(salt), F.lit("regime"))),
        F.lit(len(regimes)),
    )
    base = df.select(F.col(id_col), F.col(text_col)).withColumn(
        "_ridx", ridx
    )
    out = None
    for i, (name, rate, mean) in enumerate(regimes):
        sub = base.where(F.col("_ridx") == i)
        if rate is None:  # S: sequential / prefix-LM suffix span
            words = _ws_words(F.col(text_col))
            n = F.size(words)
            cut = F.pmod(
                h(F.concat_ws("\x1f", sid, F.lit(salt),
                              F.lit("s_cut"))),
                n,
            ).cast("int")
            plan = sub.where(n > 0).select(
                F.col(id_col), F.lit(name).alias("regime"),
                F.lit(0).cast("int").alias("span_idx"),
                (cut + 1).cast("int").alias("start_word"),
                (n - cut).cast("int").alias("span_len"),
            )
        else:
            plan = corruption_spans(
                sub, id_col=id_col, text_col=text_col,
                corruption_rate=rate, mean_span_len=mean,
                salt=f"{salt}/{name}", hash_fn=hash_fn,
            ).select(
                F.col(id_col), F.lit(name).alias("regime"),
                "span_idx", "start_word", "span_len",
            )
        out = plan if out is None else out.unionByName(plan)
    return out


def ul2_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    regimes: tuple = (
        ("R", 0.15, 3),
        ("X", 0.5, 8),
        ("S", None, None),
    ),
    salt: str = "v1",
    hash_fn=None,
) -> DataFrame:
    """UL2 mixture-of-denoisers rendered END-TO-END: `ul2_plan`'s
    regime assignment (same gate hash — a doc's pair here corresponds
    to its plan rows there) with each regime's plan serialized into a
    (input_text, target_text) training pair. R/X regimes reuse
    `denoising_pairs`' sentinel rendering under the regime's
    (rate, mean) and per-regime salt; the S regime renders its suffix
    span through the SAME sentinel convention — the suffix IS a
    single span, so

        input:  w1 .. w_cut <extra_id_0>
        target: <extra_id_0> w_cut+1 .. w_n <extra_id_1>

    — which downstream serializers turn into the prefix-LM format by
    stripping the sentinels (kept here so one schema and one
    detokenizer covers all three regimes). LOSSLESS like
    `denoising_pairs`: empty/zero-word docs emit input "" and the
    lone closing sentinel (S included), so every input doc yields
    exactly one pair.

    Emits (id, regime, n_words, n_spans, input_text, target_text).

    Scale shape: map-only union of disjoint hash-gated subsets (the
    `ul2_plan` argument); each regime's rendering is
    `denoising_pairs`' one-projection fold + indexed transforms — no
    joins, no shuffle, no Python. One hash_fn governs every draw
    (resolved once, portable default).
    """
    from awskinesisconsumer_spark.operators.dedup import portable_hash52

    if not regimes:
        raise ValueError("ul2_pairs: regimes must be non-empty")
    names = [r[0] for r in regimes]
    if len(set(names)) != len(names):
        raise ValueError(f"ul2_pairs: duplicate regime names in {names}")
    hash_fn = hash_fn or portable_hash52
    sid = F.col(id_col).cast("string")
    ridx = F.pmod(
        hash_fn(F.concat_ws("\x1f", sid, F.lit(salt), F.lit("regime"))),
        F.lit(len(regimes)),
    )
    base = df.select(F.col(id_col), F.col(text_col)).withColumn(
        "_ridx", ridx
    )
    out = None
    for i, (name, rate, mean) in enumerate(regimes):
        sub = base.where(F.col("_ridx") == i)
        if rate is None:  # S: prefix-LM pair via the sentinel form
            words = _ws_words(F.col(text_col))
            n = F.size(words)
            cut = F.pmod(
                hash_fn(F.concat_ws("\x1f", sid, F.lit(salt),
                                    F.lit("s_cut"))),
                n,
            ).cast("int")
            s0 = F.array(F.lit("<extra_id_0>"))
            s1 = F.array(F.lit("<extra_id_1>"))
            pair = sub.select(
                F.col(id_col), F.lit(name).alias("regime"),
                n.cast("int").alias("n_words"),
                F.when(n > 0, F.lit(1)).otherwise(F.lit(0))
                .cast("int").alias("n_spans"),
                F.when(
                    n > 0,
                    F.array_join(
                        F.concat(F.slice(words, 1, cut), s0), " "
                    ),
                ).otherwise(F.lit("")).alias("input_text"),
                F.when(
                    n > 0,
                    F.array_join(
                        F.concat(s0, F.slice(words, cut + 1, n - cut),
                                 s1),
                        " ",
                    ),
                ).otherwise(F.lit("<extra_id_0>")).alias("target_text"),
            )
        else:
            pair = denoising_pairs(
                sub, id_col=id_col, text_col=text_col,
                corruption_rate=rate, mean_span_len=mean,
                salt=f"{salt}/{name}", hash_fn=hash_fn,
            ).select(
                F.col(id_col), F.lit(name).alias("regime"),
                "n_words", "n_spans", "input_text", "target_text",
            )
        out = pair if out is None else out.unionByName(pair)
    return out


def fim_split(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    fim_rate: float = 0.5,
    salt: str = "v1",
    hash_fn=None,
) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al., the
    standard infilling objective for code models), made
    REPRODUCIBLE: a deterministic hash gate selects ~`fim_rate` of
    documents; each selected doc gets two hash-chosen word cut points
    c1 <= c2 and splits into (prefix, middle, suffix) = words[1..c1],
    words[c1+1..c2], words[c2+1..n] — the PSM/SPM serialization
    (sentinel order, token glue) is a trivial downstream map over
    these columns. Unselected docs pass through whole (prefix = the
    whitespace-normalized text, middle/suffix empty, fim_applied
    false) — exactly the mixed AR+FIM batch recipe. No RNG anywhere:
    gate and cuts are portable-hash functions of (id, salt), so
    re-runs/engines agree and a salt change is a fresh draw.

    Cut determinism: c_a = h(id,'c1') % (n+1), c_b = h(id,'c2') %
    (n+1), (c1, c2) = (min, max) — uniform over split points
    including empty prefix/middle/suffix edges (the paper keeps
    them; degenerate middles are the caller's filter).

    Scale shape: strictly map-only — one projection of hash gates +
    three F.slice/array_join calls; no shuffle, no join, no Python.
    Emits (id, n_words, fim_applied, prefix, middle, suffix).
    """
    if not (0.0 <= fim_rate <= 1.0):
        raise ValueError(
            f"fim_split: fim_rate in [0, 1], got {fim_rate}"
        )
    hash_fn = hash_fn or xxhash64_col
    words = _ws_words(F.col(text_col))  # no lowercasing: splits must
    n = F.size(words)                   # preserve the original words
    sid = F.col(id_col).cast("string")

    def _h(tag: str) -> Column:
        return hash_fn(F.concat_ws("\x1f", sid, F.lit(salt), F.lit(tag)))

    # the ext-sample-stratified gate rule: threshold computed the
    # Spark way (double multiply, truncating cast)
    gate = F.pmod(_h("gate"), F.lit(1_000_000))
    applied = (gate < F.lit(int(fim_rate * 1_000_000))) & (n > 0)
    ca = F.pmod(_h("c1"), n + 1).cast("int")
    cb = F.pmod(_h("c2"), n + 1).cast("int")
    c1, c2 = F.least(ca, cb), F.greatest(ca, cb)
    return df.select(
        F.col(id_col),
        n.cast("int").alias("n_words"),
        applied.alias("fim_applied"),
        F.when(
            applied, F.array_join(F.slice(words, 1, c1), " ")
        ).otherwise(F.array_join(words, " ")).alias("prefix"),
        F.when(
            applied, F.array_join(F.slice(words, c1 + 1, c2 - c1), " ")
        ).otherwise(F.lit("")).alias("middle"),
        F.when(
            applied, F.array_join(F.slice(words, c2 + 1, n - c2), " ")
        ).otherwise(F.lit("")).alias("suffix"),
    )


def fim_serialize(
    df: DataFrame,
    *,
    mode: str = "psm",
    prefix_col: str = "prefix",
    middle_col: str = "middle",
    suffix_col: str = "suffix",
    applied_col: str = "fim_applied",
    out_col: str = "text_fim",
    prefix_tok: str = "<fim_prefix>",
    middle_tok: str = "<fim_middle>",
    suffix_tok: str = "<fim_suffix>",
) -> DataFrame:
    """Serialize `fim_split` rows into the single-string FIM training
    format (Bavarian et al. §3; the StarCoder/santacoder layout) —
    the step between the split and the tokenizer:

        psm: <fim_prefix>P<fim_suffix>S<fim_middle>M
        spm: <fim_suffix>S<fim_prefix>P<fim_middle>M

    (PSM presents prefix-then-suffix context; SPM leads with the
    suffix — trained together they make the model robust to either
    prompting order, which is why pipelines emit both.) Documents
    the split left UNTOUCHED (`fim_applied` false — the mixed AR+FIM
    batch recipe) pass through as their plain text (the whole doc
    lives in `prefix_col`), no sentinels, so one column feeds the
    tokenizer for both example kinds.

    Scale shape: ONE concat projection per row — map-only, no
    shuffle, fuses with whatever produced the split columns.
    """
    if mode not in ("psm", "spm"):
        raise ValueError(
            f"fim_serialize: mode must be 'psm' or 'spm', got {mode!r}"
        )
    p, mid, s = F.col(prefix_col), F.col(middle_col), F.col(suffix_col)
    if mode == "psm":
        serialized = F.concat(
            F.lit(prefix_tok), p, F.lit(suffix_tok), s,
            F.lit(middle_tok), mid,
        )
    else:
        serialized = F.concat(
            F.lit(suffix_tok), s, F.lit(prefix_tok), p,
            F.lit(middle_tok), mid,
        )
    return df.withColumn(
        out_col, F.when(F.col(applied_col), serialized).otherwise(p)
    )


def sentence_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    min_words: int = 3,
) -> DataFrame:
    """SENTENCE-granularity decontamination — the leak case n-gram
    `decontaminate` is blunt about: a benchmark answer that leaks as
    one whole sentence inside an otherwise-clean document. Both sides
    are segmented with `split_sentences`, normalized (lowercased,
    whitespace collapsed — punctuation stays attached, so "The answer
    is 42." only matches as a full sentence), and a document is
    contaminated iff at least one of its sentences of >= `min_words`
    words appears verbatim among the benchmark's sentences (the
    word floor keeps "Yes." from flagging everything).

    Returns `docs` plus `n_leaked_sentences` (distinct leaked
    sentences per doc, 0 when clean) and `contaminated` (boolean).

    Scale shape: the benchmark sentence set is eval-suite-bounded ->
    broadcast; the corpus sentence explosion streams map-side through
    the broadcast join, so only MATCHED (doc, sentence) rows — rare
    by construction — reach the distinct + groupBy shuffle, and the
    final re-attach joins a match table bounded by contaminated docs
    (AQE broadcasts it). Same shuffle contract as `decontaminate`.
    """
    from .text import split_sentences

    def _norm(c: Column) -> Column:
        return F.lower(F.regexp_replace(c, r"\s+", " "))

    def _sents(df: DataFrame, idc: str, txtc: str) -> DataFrame:
        s = split_sentences(df, id_col=idc, text_col=txtc)
        return (
            s.select(F.col(idc), _norm(F.col("sentence")).alias("_sn"))
            .where(F.size(F.split(F.col("_sn"), " ")) >= min_words)
        )

    bench_sn = (
        _sents(benchmark, bench_id_col, bench_text_col)
        .select("_sn").distinct()
    )
    matched = (
        _sents(docs, id_col, text_col)
        .join(F.broadcast(bench_sn), "_sn")
        .select(id_col, "_sn")
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_leaked_sentences"))
    )
    return (
        docs.join(matched, id_col, "left")
        .withColumn(
            "n_leaked_sentences",
            F.coalesce(F.col("n_leaked_sentences"), F.lit(0)),
        )
        .withColumn("contaminated", F.col("n_leaked_sentences") >= 1)
    )


def sample_stratified(
    df: DataFrame,
    *,
    strata_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "v1",
    hash_fn=xxhash64_col,
) -> DataFrame:
    """Deterministic per-stratum subsampling: keep a row iff
    ``hash(key, salt) mod 1e6 < rate(stratum) * 1e6``. The standard
    corpus-mixture downsampler ("keep 10% of crawl, 100% of books"),
    but reproducible: membership depends only on (key, salt, rate),
    never on partitioning, ordering, or a session RNG — so reruns,
    retried tasks, and incremental appends all agree, and raising a
    rate strictly grows the kept set (nested samples).

    Narrow (filter only, no shuffle). `hash_fn=portable_hash52` makes
    the gate engine-portable (md5-based) for cross-engine checks;
    the default xxhash64 is the fast 100 TB path.
    """
    gate = F.pmod(hash_fn(F.concat_ws("\x1f", F.col(key_col).cast("string"),
                                      F.lit(salt))), F.lit(1_000_000))
    rate_expr: Column = F.lit(float(default_rate))
    for stratum, rate in sorted(rates.items()):
        rate_expr = F.when(F.col(strata_col) == stratum,
                           F.lit(float(rate))).otherwise(rate_expr)
    return df.where(gate < (rate_expr * 1_000_000).cast("long"))


def mixture_allocation(
    df: DataFrame,
    *,
    source_col: str,
    token_col: str,
    weights: dict[str, float],
    token_budget: int,
) -> DataFrame:
    """Data-mixture planning: given per-source mixture `weights` and a
    total `token_budget`, report per source the available tokens, the
    target (= budget x normalized weight), the allocation
    (= min(available, target)) and `epochs` (= target / available —
    >1 means the source must repeat to hit its target, the standard
    up-sampling diagnostic). One tiny agg (one row per source): the
    corpus is reduced map-side; everything downstream is driver-scale.
    """
    total_w = sum(weights.values()) or 1.0
    target: Column = F.lit(0.0)
    for source, w in sorted(weights.items()):
        target = F.when(F.col(source_col) == source,
                        F.lit(float(w) / total_w * token_budget)
                        ).otherwise(target)
    avail = F.col("available_tokens").cast("double")
    return (
        df.groupBy(source_col)
        .agg(F.sum(F.coalesce(F.col(token_col), F.lit(0)).cast("bigint"))
             .alias("available_tokens"))
        .withColumn("target_tokens", F.round(target, 2))
        .withColumn(
            "allocated_tokens",
            F.round(F.least(avail, F.col("target_tokens")), 2),
        )
        .withColumn(
            "epochs",
            F.round(F.when(avail > 0, F.col("target_tokens") / avail)
                    .otherwise(F.lit(0.0)), 4),
        )
    )


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str,
    token_col: str,
    capacity: int,
    group_size: int = 1024,
    cache_input: bool = True,
) -> DataFrame:
    """Concatenate documents in `id_col` order into one token stream
    and split it into fixed-`capacity` training sequences (GPT-style
    packing where documents may straddle sequence boundaries).

    Returns one row per document: `tok_start` / `tok_end` (global
    token offsets, end exclusive), `seq_first` / `seq_last` (the
    sequence indices the document lands in), `n_seqs` (how many
    sequences it spans). Zero-token documents occupy no space and map
    to the sequence at their offset.

    `id_col` must be non-null, UNIQUE, and numeric-orderable; ordering
    is by its value, so the layout is deterministic (and
    SQL-reproducible) — unlike `spark_partition_id`-based numbering.
    (Duplicate ids would tie in the cumsum's RANGE frame and overlap
    in the token stream.)

    Scale shape: a global cumulative sum via the two-pass prefix-sum
    pattern — a window partitioned by `floor(id / group_size)` (many
    small groups, parallel), then per-group totals prefix-summed on a
    group-count-sized table that broadcasts back. The naive
    formulation (`Window.orderBy(id)` with no partitionBy) funnels
    the whole corpus through ONE task and is the thing this operator
    exists to avoid.
    """
    from pyspark.sql import Window

    toks = F.coalesce(F.col(token_col).cast("bigint"), F.lit(0))
    g = F.floor(F.col(id_col).cast("bigint") / group_size).alias("_g")
    base = df.select(F.col(id_col), toks.alias("_t"), g)
    if cache_input:
        # `base` feeds BOTH branches of the prefix sum (the per-group
        # cumsum and the group-totals table). Without materializing,
        # Spark recomputes the ENTIRE upstream plan twice — ruinous
        # when the input is the tail of an expensive pipeline (e.g.
        # dedup -> decontaminate -> quality). The cached projection is
        # three fixed-width columns per row, orders of magnitude
        # smaller than any realistic upstream; eager count guarantees
        # single computation even when the two consumer stages are
        # scheduled concurrently. Released via release_after below —
        # the caller never sees `base`, so it must not outlive the
        # call (the RESULT stays cached and is the caller's to free).
        base = base.persist()
        base.count()

    in_group = Window.partitionBy("_g").orderBy(id_col)
    local = base.withColumn("_local_end", F.sum("_t").over(in_group))

    # Tiny: one row per group. The running offset over groups is a
    # window on this small table only, then broadcast back.
    group_w = Window.orderBy("_g").rowsBetween(
        Window.unboundedPreceding, -1)
    offsets = (
        base.groupBy("_g").agg(F.sum("_t").alias("_gtot"))
        .withColumn("_goff", F.coalesce(F.sum("_gtot").over(group_w),
                                        F.lit(0)))
        .select("_g", "_goff")
    )

    tok_end = F.col("_goff") + F.col("_local_end")
    tok_start = tok_end - F.col("_t")
    out = (
        local.join(F.broadcast(offsets), "_g")
        .select(
            F.col(id_col),
            F.col("_t").alias("n_tokens"),
            tok_start.alias("tok_start"),
            tok_end.alias("tok_end"),
            F.floor(tok_start / capacity).alias("seq_first"),
            F.when(F.col("_t") > 0, F.floor((tok_end - 1) / capacity))
            .otherwise(F.floor(tok_start / capacity)).alias("seq_last"),
        )
        .withColumn("n_seqs", F.col("seq_last") - F.col("seq_first") + 1)
    )
    if cache_input:
        out = _release_after(out, base)
    return out


def build_user_sequences(
    df: DataFrame,
    *,
    user_col: str,
    ts_col: str,
    item_col: str,
    tiebreak_col: str,
    max_len: int,
) -> DataFrame:
    """Per-user ordered interaction sequence — the training-example
    construction step for behavioral/session models: each user's
    events sorted by (ts, tiebreak), truncated to the MOST RECENT
    `max_len`, emitted as one row per user with the item sequence in
    chronological order plus span metadata (`n_events` = total before
    truncation, `seq_start_ts`/`seq_end_ts` = kept-window span).

    `tiebreak_col` must make (ts, tiebreak) unique per user, so the
    layout is fully deterministic and SQL-reproducible.

    Scale shape: the recency cap is applied BEFORE any collection — a
    row_number window keeps at most `max_len` rows per user, so the
    later collect_list buffers are bounded by `max_len`, not by the
    heaviest user's history (power-law users would otherwise OOM the
    agg buffer). The window and the groupBy hash-partition on the same
    key, so Catalyst reuses one shuffle for both.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    ranked = (
        df.select(user_col, ts_col, tiebreak_col, item_col)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(
            Window.partitionBy(user_col)))
        .where(F.col("_rn") <= max_len)
    )
    ordered = F.array_sort(F.collect_list(
        F.struct(F.col(ts_col).alias("t"),
                 F.col(tiebreak_col).alias("k"),
                 F.col(item_col).alias("i"))
    ))
    return (
        ranked.groupBy(user_col, "_n")
        .agg(ordered.alias("_seq"))
        .select(
            F.col(user_col),
            F.col("_n").alias("n_events"),
            F.transform("_seq", lambda s: s["i"]).alias("seq"),
            F.element_at("_seq", 1)["t"].alias("seq_start_ts"),
            F.element_at("_seq", -1)["t"].alias("seq_end_ts"),
        )
    )


def shard_assign(
    df: DataFrame,
    *,
    key_col: str,
    n_shards: int,
    salt: str = "v1",
    token_col: str | None = None,
    hash_fn=xxhash64_col,
) -> DataFrame:
    """Deterministic training-shard assignment + balance audit: every
    row gets `shard = hash(key, salt) mod n_shards`, and the result is
    the per-shard summary (row count, token mass, key span) a writer
    job uses to validate balance before `partitionBy(shard)` output.

    Assignment depends only on (key, salt, n_shards) — never on
    partitioning or execution order — so re-runs and incremental
    appends route identically (the property resharding-free appends
    need). One narrow projection + one n_shards-row aggregate; the
    shuffle carries one row per shard per map partition.
    `hash_fn=portable_hash52` makes shard routing engine-portable.
    """
    shard = F.pmod(
        hash_fn(F.concat_ws("\x1f", F.col(key_col).cast("string"),
                            F.lit(salt))),
        F.lit(n_shards),
    )
    assigned = df.withColumn("shard", shard.cast("int"))
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.min(key_col).alias("min_key"),
        F.max(key_col).alias("max_key"),
    ]
    if token_col is not None:
        aggs.append(F.sum(token_col).alias("sum_tokens"))
    return assigned.groupBy("shard").agg(*aggs)


def equidepth_buckets(
    df: DataFrame,
    *,
    order_col: str,
    id_col: str,
    n_buckets: int = 8,
    group_width: int = 16,
    cache_input: bool = True,
) -> DataFrame:
    """Exact equi-depth bucketize (NTILE semantics: bucket sizes
    differ by at most one, larger buckets first) WITHOUT the global
    single-partition sort `Window.orderBy()` would cost — the
    length-bucketing step of curriculum/packing pipelines, where docs
    are binned by token count into equal-population groups.

    Global rank is computed with the same two-pass pattern as
    `pack_sequences`, but grouped by VALUE range (`_g = floor(order /
    group_width)` — monotone in the sort key, so per-group row_numbers
    + a cumulative group-count offset compose into the exact global
    rank; many small parallel windows instead of one task holding the
    corpus). Value-range groups can skew if the distribution is
    spiky — at production scale swap the grouper for
    `repartitionByRange` partition ids (sampled boundaries), which
    keeps the same offset composition. The NTILE arithmetic is then
    pure column math off a broadcast (group, offset, total) table.

    Returns per-bucket stats: bucket (1-based), n_rows, min/max/sum of
    `order_col`. Ties are broken by `id_col` (must be unique) so the
    assignment is deterministic and SQL-reproducible.
    """
    from pyspark.sql import Window

    v = F.coalesce(F.col(order_col).cast("bigint"), F.lit(0))
    base = df.select(
        F.col(id_col), v.alias("_v"),
        F.floor(v / group_width).alias("_g"),
    )
    if cache_input:
        base = base.persist()
        base.count()

    in_group = Window.partitionBy("_g").orderBy("_v", id_col)
    local = base.withColumn("_lr", F.row_number().over(in_group))

    group_w = Window.orderBy("_g").rowsBetween(
        Window.unboundedPreceding, -1)
    total_w = Window.rowsBetween(Window.unboundedPreceding,
                                 Window.unboundedFollowing)
    offsets = (
        base.groupBy("_g").agg(F.count(F.lit(1)).alias("_gc"))
        .withColumn("_goff", F.coalesce(F.sum("_gc").over(group_w),
                                        F.lit(0)))
        .withColumn("_n", F.sum("_gc").over(total_w))
        .select("_g", "_goff", "_n")
    )

    rank = F.col("_goff") + F.col("_lr")
    q = F.expr("_n div %d" % n_buckets)
    r = F.pmod("_n", F.lit(n_buckets))
    t = (q + 1) * r
    # integer division in both branches (q may be 0 only when n <
    # n_buckets, in which case every rank takes the first branch)
    first = F.expr(f"(( _goff + _lr ) - 1) div ((_n div {n_buckets}) + 1)") + 1
    rest = (
        F.pmod("_n", F.lit(n_buckets))
        + F.expr(
            f"(( _goff + _lr ) - ((_n div {n_buckets}) + 1) * "
            f"(_n % {n_buckets}) - 1) div (_n div {n_buckets})"
        )
        + 1
    )
    out = (
        local.join(F.broadcast(offsets), "_g")
        .withColumn("bucket",
                    F.when(rank <= t, first).otherwise(rest).cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_v").alias("min_val"),
            F.max("_v").alias("max_val"),
            F.sum("_v").alias("sum_val"),
        )
    )
    if cache_input:
        out = _release_after(out, base)
    return out


def chunk_text(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding token-window chunking: split each document into
    overlapping fixed-budget chunks (`chunk_tokens` wide, advancing by
    `stride` — overlap = chunk_tokens - stride), the standard long-doc
    -> training-example / embedding-input expansion.

    Chunk starts are 0, stride, 2*stride, ... while start < n_tokens,
    so every token is covered and the tail chunk may be short. Output
    one row per (doc, chunk): chunk_id, chunk_start (token offset),
    n_chunk_tokens, chunk_text. Empty/whitespace-only docs yield no
    chunks.

    Scale shape: narrow (tokenize -> posexplode over per-doc start
    sequence -> slice), zero shuffles — expansion factor is
    ~n_tokens/stride per doc, a constant the writer controls, so the
    operator streams at scan speed at any corpus size. No Python UDFs;
    the slice/join runs inside whole-stage codegen.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = (
        df.select(F.col(id_col), words.alias("_ws"))
        .where((F.size("_ws") > 0) & (F.element_at("_ws", 1) != ""))
    )
    starts = F.sequence(F.lit(0), F.size("_ws") - 1, F.lit(stride))
    ex = base.select(
        id_col, "_ws", F.posexplode(starts).alias("chunk_id", "_start")
    )
    piece = F.slice(F.col("_ws"), F.col("_start") + 1, chunk_tokens)
    return ex.select(
        id_col,
        F.col("chunk_id"),
        F.col("_start").alias("chunk_start"),
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def _cdc_boundary_candidates(t: Column, L: Column, window: int,
                             divisor: int, hash_fn) -> Column:
    """Content-defined boundary ELECTION (shared by the stateless and
    clamped CDC forms): a boundary is a candidate after 1-based
    position p in [window, L] wherever the rolling window hash
    divides `divisor`. Guard: sequence(a, b) runs DESCENDING when
    b < a, so short docs must produce an empty array, not a
    backwards range."""
    return F.when(
        L >= window,
        F.filter(
            F.sequence(F.lit(window), L),
            lambda p: F.pmod(
                hash_fn(t.substr(p - F.lit(window - 1), F.lit(window))),
                F.lit(divisor),
            ) == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))


def _cdc_spans_to_chunks(df: DataFrame, *, id_col: str, t: Column,
                         starts: Column, ends: Column,
                         hash_fn) -> DataFrame:
    """Shared CDC tail: (starts, ends) arrays -> one row per chunk
    with offsets, lengths, and the chunk-text hash (posexplode +
    substr, all codegen).

    posexplode_OUTER, deliberately (r16 optimization round): a
    non-outer Generate makes the optimizer infer a
    `size(input) > 0 AND isnotnull(input)` Filter BELOW it
    (InferFiltersFromGenerate), restating the WHOLE boundary-election
    expression — per-character rolling hash and clamp fold included —
    a second/third time in an operator where interpreted evaluation
    cannot share it with the projection (measured 43 -> 15 md5
    subtrees in the optimized plan and ~5x the wall of the staged
    parts at sf0.1). `_se` is never empty (starts always leads with
    0, ends always closes with L), so outer adds no rows on real
    input; a NULL row from a hypothetical empty array would die at
    the existing `clen > 0` filter. Output is bit-identical —
    equality over the gate corpus pinned in tests."""
    base = df.select(
        F.col(id_col),
        t.alias("_t"),
        F.arrays_zip(starts.alias("s"), ends.alias("e")).alias("_se"),
    ).select(
        id_col,
        "_t",
        F.posexplode_outer("_se").alias("chunk_idx", "_p"),
    )
    clen = (F.col("_p.e") - F.col("_p.s")).cast("int")
    chunk = F.col("_t").substr(F.col("_p.s") + 1, clen)
    return (
        base.where(clen > 0)
        .select(
            id_col,
            F.col("chunk_idx"),
            F.col("_p.s").cast("long").alias("chunk_start"),
            clen.cast("long").alias("chunk_len"),
            hash_fn(chunk).alias("chunk_hash"),
        )
    )


def content_defined_chunks(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    window: int = 8,
    divisor: int = 64,
    hash_fn=None,
) -> DataFrame:
    """CONTENT-DEFINED chunking (the CDC idea behind FastCDC /
    rsync-style dedup storage, char-level): a chunk boundary falls
    after character position p wherever
    hash(text[p-window+1 .. p]) % divisor == 0, so boundaries travel
    WITH the content — insert one byte at the front of a document and
    every chunk after the edit re-aligns, where fixed-width chunking
    (`chunk_text`) shifts every subsequent chunk and defeats
    chunk-hash dedup. Expected chunk length ~= `divisor` chars.

    This is the STATELESS form: no min/max chunk clamps (real FastCDC
    adds them, which makes boundary choice sequential per document —
    the clamped variant would need a per-doc fold; the stateless form
    keeps the shift-resistance property AND stays a pure column
    expression, so the DuckDB twin replays it exactly). Same
    content-defined principle as `_span_occurrences(anchored=True)`,
    at character level with variable-length segments.

    Output: one row per (doc, chunk): chunk_idx (0-based in document
    order), chunk_start (0-based char offset), chunk_len, chunk_hash
    (of the chunk text, `hash_fn`). Empty/NULL docs yield no rows.
    Downstream exact dedup of storage segments = groupBy chunk_hash —
    bounded by distinct content, never doc pairs.

    Scale shape: narrow per-row higher-order expressions (sequence ->
    filter -> zip -> posexplode), ZERO shuffles — at 100 TB the cost
    is one pass over the text bytes; the per-doc position sequence is
    len(text) longs, transient inside codegen.

    `hash_fn` defaults to xxhash64_col (JVM-side, measured 3.3x
    faster than the md5-derived portable_hash52 on this operator —
    SCALING.md r8); pass portable_hash52 only when a DuckDB oracle
    must replay boundaries bit-for-bit (the gate entries do).

    .. versionchanged:: CDC_HASH_DEFAULT_VERSION 2
       The DEFAULT hash_fn changed from portable_hash52 to
       xxhash64_col: different boundary elections AND different
       chunk_hash values than chunk tables persisted under the old
       default. Relying on the default emits a one-shot
       FutureWarning; pass hash_fn explicitly to pin a family."""
    if window < 1:
        raise ValueError(f"content_defined_chunks: window >= 1, got {window}")
    if divisor < 1:
        raise ValueError(
            f"content_defined_chunks: divisor >= 1, got {divisor}"
        )
    hash_fn = _cdc_default_hash(hash_fn, "content_defined_chunks")
    # Parallelism floor for the per-character election (see
    # skew.fan_out_small): tiny single-row-group inputs otherwise run
    # the whole rolling-hash scan on one core. No-op at scale.
    from awskinesisconsumer_spark.operators.skew import fan_out_small

    df = fan_out_small(df)
    t = F.coalesce(F.col(text_col), F.lit(""))
    L = F.length(t)
    bnd = _cdc_boundary_candidates(t, L, window, divisor, hash_fn)
    starts = F.concat(F.array(F.lit(0)), bnd)
    ends = F.concat(bnd, F.array(L))
    return _cdc_spans_to_chunks(
        df, id_col=id_col, t=t, starts=starts, ends=ends,
        hash_fn=hash_fn,
    )


def content_defined_chunks_clamped(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    window: int = 8,
    divisor: int = 64,
    min_len: int = 32,
    max_len: int = 128,
    hash_fn=None,
) -> DataFrame:
    """CLAMPED content-defined chunking — the form real chunk-dedup
    storage runs (FastCDC's min/max bounds): candidate boundaries
    are elected exactly as in `content_defined_chunks`, then resolved
    LEFT-TO-RIGHT per document under two clamps —
      * a candidate closer than `min_len` to the previous boundary is
        skipped (tiny chunks thrash the chunk index), and
      * a gap longer than `max_len` forces a boundary at
        previous + max_len (pathological content that never elects a
        boundary cannot produce unbounded chunks).
    Equivalently: the next boundary after `last` is the FIRST
    candidate in [last+min_len, last+max_len], else last+max_len if
    more than max_len chars remain, else end-of-document.

    The resolution is sequential per document, but it needs NO
    per-doc Python fold: forced boundaries between consecutive
    candidates form an arithmetic sequence, so one `F.aggregate`
    left fold over the candidate array — state is (last, acc), each
    step appends F.sequence(last+max, last+k*max, max) plus the
    candidate when accepted — resolves the clamps entirely inside
    codegen. ZERO shuffles, zero Python, same scale shape as the
    stateless form. Output schema and hash conventions identical to
    `content_defined_chunks`; the DuckDB twin replays the fold as a
    per-document recursive CTE (the `ext-pack-nofragment` idiom).

    `hash_fn` follows the same v2 default (xxhash64_col) and one-shot
    FutureWarning as `content_defined_chunks` — see
    CDC_HASH_DEFAULT_VERSION.
    """
    if window < 1:
        raise ValueError(
            f"content_defined_chunks_clamped: window >= 1, got {window}"
        )
    if divisor < 1:
        raise ValueError(
            f"content_defined_chunks_clamped: divisor >= 1, got {divisor}"
        )
    if not (1 <= min_len <= max_len):
        raise ValueError(
            "content_defined_chunks_clamped: need 1 <= min_len <= "
            f"max_len, got min_len={min_len} max_len={max_len}"
        )
    hash_fn = _cdc_default_hash(hash_fn, "content_defined_chunks_clamped")
    # Parallelism floor, as in content_defined_chunks. No-op at scale.
    from awskinesisconsumer_spark.operators.skew import fan_out_small

    df = fan_out_small(df)
    t = F.coalesce(F.col(text_col), F.lit(""))
    L = F.length(t)
    cand = _cdc_boundary_candidates(t, L, window, divisor, hash_fn)
    bnd = _clamp_boundaries(cand, L, min_len, max_len)
    starts = F.concat(F.array(F.lit(0)), bnd)
    ends = F.concat(bnd, F.array(L))
    return _cdc_spans_to_chunks(
        df, id_col=id_col, t=t, starts=starts, ends=ends,
        hash_fn=hash_fn,
    )


def _clamp_boundaries(cand: Column, L: Column, min_len: int,
                      max_len: int) -> Column:
    """The FastCDC min/max clamp resolution as ONE F.aggregate left
    fold over the elected-candidate array (shared by the md5/xxhash
    and rolling-hash CDC forms): next boundary = first candidate in
    [last+min, last+max], else forced at last+max while more than
    max_len chars remain. Forced boundaries between two candidates
    form an arithmetic sequence, so each fold step is
    concat(F.sequence(...), candidate) — no per-doc Python."""
    empty_int = F.array().cast("array<int>")
    mx = F.lit(max_len)

    def _forced(last: Column, k: Column) -> Column:
        # the k boundaries forced at last+max, last+2*max, ...
        return F.when(
            k > 0, F.sequence(last + mx, last + k * mx, mx)
        ).otherwise(empty_int)

    def _n_forced(last: Column, nxt: Column) -> Column:
        # boundaries forced before `nxt` = max(0, ceil(gap/max) - 1);
        # gap fits an int so the double division below is exact
        return F.when(
            nxt - last > mx,
            F.floor((nxt - last - 1) / mx).cast("int"),
        ).otherwise(F.lit(0))

    def _step(st: Column, c: Column) -> Column:
        last = st["last"]
        k = _n_forced(last, c)
        last2 = (last + k * mx).cast("int")
        accept = (c - last2) >= min_len
        return F.struct(
            F.when(accept, c).otherwise(last2).alias("last"),
            F.concat(
                st["acc"],
                _forced(last, k),
                F.when(accept, F.array(c)).otherwise(empty_int),
            ).alias("acc"),
        )

    init = F.struct(
        F.lit(0).cast("int").alias("last"), empty_int.alias("acc")
    )
    folded = F.aggregate(cand, init, _step)
    k_tail = _n_forced(folded["last"], L)
    return F.concat(folded["acc"], _forced(folded["last"], k_tail))


def dataset_card(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    words_hi: float = 400.0,
    n_bins: int = 200,
) -> DataFrame:
    """The DATASET CARD numbers — the summary block a corpus release
    ships (docs, tokens, emptiness, exact-dup rate, length
    distribution) as ONE queryable (metric, value) table, so the
    audit that usually lives in a hand-run notebook is a pinned,
    oracle-checkable operator.

    Metrics: n_docs, n_empty (whitespace-only/NULL), n_chars_total,
    n_words_total, n_distinct_texts (sha256 digest — 32-byte keys
    shuffle, never text), n_exact_dup_docs (docs minus distinct),
    mean_words (6 dp), words_p50/p90/p99 (mergeable equi-width
    histogram estimates over [0, words_hi], 4 dp — the
    `sketches.histogram_quantiles` arithmetic, so the twin replays
    them exactly).

    Scale shape: one narrow per-doc projection (chars/words/digest —
    column-pruned scan), lazily localCheckpoint'ed because two
    aggregates consume it: a single global agg (count/sum/
    countDistinct partial-aggregated map-side) and the n_bins-row
    histogram. Output is ~10 rows regardless of corpus size."""
    words = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    n_words = F.when(
        F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) > 0,
        F.size(words),
    ).otherwise(F.lit(0))
    per_doc = df.select(
        F.col(id_col),
        F.length(F.coalesce(F.col(text_col), F.lit("")))
        .cast("long").alias("_nc"),
        n_words.cast("long").alias("_nw"),
        F.sha2(F.coalesce(F.col(text_col), F.lit("")).cast("binary"), 256)
        .alias("_dig"),
    ).localCheckpoint(eager=False)

    from .sketches import histogram_quantiles

    agg = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum((F.col("_nw") == 0).cast("long")).cast("double")
        .alias("n_empty"),
        F.sum("_nc").cast("double").alias("n_chars_total"),
        F.sum("_nw").cast("double").alias("n_words_total"),
        F.countDistinct("_dig").cast("double").alias("n_distinct_texts"),
        F.round(F.avg("_nw"), 6).alias("mean_words"),
    ).withColumn(
        "n_exact_dup_docs", F.col("n_docs") - F.col("n_distinct_texts")
    )
    flat = agg.selectExpr(
        "stack(7, "
        "'n_docs', n_docs, "
        "'n_empty', n_empty, "
        "'n_chars_total', n_chars_total, "
        "'n_words_total', n_words_total, "
        "'n_distinct_texts', n_distinct_texts, "
        "'n_exact_dup_docs', n_exact_dup_docs, "
        "'mean_words', mean_words) AS (metric, value)"
    )
    hq = histogram_quantiles(
        per_doc, value_col="_nw", lo=0.0, hi=float(words_hi),
        n_bins=n_bins, quantiles=(0.5, 0.9, 0.99),
    ).select(
        F.concat(
            F.lit("words_p"),
            F.round(F.col("q") * 100, 0).cast("int").cast("string"),
        ).alias("metric"),
        F.col("estimate").alias("value"),
    )
    return flat.unionByName(hq)


def split_leakage_free(
    docs: DataFrame,
    *,
    id_col: str,
    pairs: DataFrame,
    val_fraction: float,
    salt: str = "split1",
    hash_fn=xxhash64_col,
) -> DataFrame:
    """Leakage-free train/validation split: assign DUPLICATE CLUSTERS,
    not documents, so a near-duplicate of a validation doc can never
    land in train (the eval-contamination mode a per-doc hash split
    silently permits). `pairs` is any near-dup candidate edge list
    (minhash / simhash / n-gram / embedding — caller's choice of
    generator); docs absent from `pairs` are singleton clusters.

    Split membership is `hash(cluster_id, salt) mod 1e6 <
    val_fraction * 1e6` — deterministic, rerun-stable, and nested
    (raising val_fraction strictly grows val), the same gate contract
    as `sample_stratified`. Cost beyond the caller's pair generation:
    the connected-components rounds (diameter-bounded) plus one narrow
    projection.
    """
    from .dedup import connected_components

    cc = connected_components(
        pairs, vertices=docs.select(F.col(id_col).alias("id"))
    )
    gate = F.pmod(
        hash_fn(F.concat_ws("\x1f", F.col("cluster_id").cast("string"),
                            F.lit(salt))),
        F.lit(1_000_000),
    )
    return cc.select(
        F.col("id").alias(id_col),
        "cluster_id",
        F.when(gate < int(val_fraction * 1_000_000), F.lit("val"))
        .otherwise(F.lit("train")).alias("split"),
    )


def sample_weighted(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each row draws u from the portable
    52-bit hash of its id (uniform, replayable) and ranks by
    u^(1/weight) descending — the top-k is then a weight-proportional
    sample, reproducible on any engine. The mixture-weighted cousin
    of `sample_stratified` (hash gate) and the reservoir sample
    (uniform rank).

    Scale shape: one narrow projection (hash, pow) + the salted
    two-level top-k; nothing global but the k*64-row final rank.
    Zero-weight rows are excluded (their key is pow(u, inf) -> 0
    anyway; the filter keeps ANSI semantics obvious).
    """
    from pyspark.sql import Window

    from .dedup import portable_hash52

    u = (portable_hash52(F.col(id_col).cast("string")) + F.lit(1)) / F.lit(
        float(1 << 52)
    )
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    scored = (
        df.where(F.col(weight_col) > 0)
        .withColumn("_key", key)
    )
    order = (F.col("_key").desc(), F.col(id_col))
    wp = Window.partitionBy(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(64))
    ).orderBy(*order)
    wg = Window.orderBy(*order)
    return (
        scored.withColumn("_prn", F.row_number().over(wp))
        .where(F.col("_prn") <= k)
        .withColumn("sample_rank", F.row_number().over(wg).cast("long"))
        .where(F.col("sample_rank") <= k)
        .select(
            id_col, weight_col,
            F.round("_key", 6).alias("es_key"), "sample_rank",
        )
    )


def mixture_temperature_weights(
    df: DataFrame,
    *,
    source_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-scaled mixture weights over corpus sources:
    w_i = p_i^alpha / sum_j p_j^alpha — the standard up-sampling of
    low-resource sources (alpha < 1 flattens the source distribution,
    alpha = 1 keeps it, alpha = 0 is uniform). The sampling-ratio
    companion to `mixture_allocate` (which takes target ratios as
    input; this computes them from the corpus itself).

    One source-keyed hash agg (map-side combine) produces the
    n_sources-row table; everything downstream is arithmetic on that
    constant-size aggregate (two one-row cross joins). Weights round
    to 6 dp so cross-engine pow/summation noise cannot flip the hash.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("_tot"))
    scored = counts.crossJoin(F.broadcast(total)).select(
        source_col, "n_docs",
        (F.col("n_docs") / F.col("_tot").cast("double")).alias("_p"),
        F.pow(
            F.col("n_docs") / F.col("_tot").cast("double"), F.lit(alpha)
        ).alias("_num"),
    )
    z = scored.agg(F.sum("_num").alias("_z"))
    return scored.crossJoin(F.broadcast(z)).select(
        source_col, "n_docs",
        F.round("_p", 6).alias("p_source"),
        F.round(F.col("_num") / F.col("_z"), 6).alias("w_alpha"),
    )


def domain_cap(
    df: DataFrame,
    *,
    group_col: str,
    cap: int,
    order_by: list | None = None,
    id_col: str | None = None,
    keep_col: str = "kept",
) -> DataFrame:
    """Per-source quota sampling: keep at most `cap` rows per group
    (URL domain, data source, license bucket), chosen by a
    DETERMINISTIC priority — the per-source balancing step every
    web-scale corpus runs so a handful of mega-domains cannot
    dominate the training mixture.

    `order_by` is the keep-priority (e.g. quality score descending);
    `id_col` (REQUIRED — it totalizes the order, since any
    caller-supplied priority can tie) is appended as the final
    tie-break. Without `order_by`, rows are prioritized by the
    engine-portable md5 hash of `id_col` — a deterministic uniform
    subsample within each group.

    Returns the input plus (rank_in_group, kept). Filtering is left
    to the caller so the rejected rows remain auditable (the usual
    pipeline writes both partitions).

    Scale shape: ONE group-keyed window sort — the same single
    exchange as any per-group top-k. Mega-domains make the window
    partition wide but the sort is (group)-local and spills; for the
    pathological single-domain-dominates case use `domain_cap_topk`,
    which bounds every reducer with a salted two-level rank and
    emits the kept rows + per-group totals instead of ranking every
    dropped row.
    """
    from pyspark.sql import Window

    if cap < 1:
        raise ValueError(f"domain_cap: cap must be >= 1, got {cap}")
    if id_col is None:
        # Even with order_by given, ties in the caller's priority
        # would make the kept subset depend on physical row order.
        raise ValueError(
            "domain_cap: id_col is required — without a unique "
            "tie-break the kept subset would be nondeterministic"
        )
    if order_by is None:
        order = [portable_hash52(F.col(id_col).cast("string")).asc()]
    else:
        order = list(order_by)
    order.append(F.col(id_col).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("rank_in_group", F.row_number().over(w))
        .withColumn(keep_col, F.col("rank_in_group") <= cap)
    )


def domain_cap_topk(
    df: DataFrame,
    *,
    group_col: str,
    cap: int,
    order_by: list | None = None,
    id_col: str | None = None,
    salt_buckets: int = 16,
    with_totals: bool = True,
) -> DataFrame:
    """Skew-safe per-source quota: the KEPT rows (at most `cap` per
    group) with their exact `rank_in_group`, plus the group's total
    row count — the mega-domain-proof form of `domain_cap` for the
    case where one domain holds a material fraction of the corpus
    and a single group-keyed window sort would funnel it through one
    reducer.

    Two-level rank (the `similarity.knn_join_topk` template): a
    first window partitioned by (group, salt-of-id) bounds each of
    the `salt_buckets` shards to its local top-`cap`, then the exact
    per-group rank runs on <= cap * salt_buckets candidate rows per
    group — no reducer ever sorts more than its salt shard, and the
    final window's partitions are quota-sized regardless of domain
    size. Exact by the min-k composition property (top-k of a union
    == top-k of the per-shard top-k's), so the kept set and ranks
    EQUAL `domain_cap`'s kept rows for the same priority; the salt
    never influences the result. Dropped rows are not emitted (at
    mega-domain scale ranking every rejected row is the cost being
    avoided); their volume stays auditable via `n_in_group`.

    `n_in_group` is FUSED into the salted pass (when
    `with_totals=True`): the per-(group, salt) shard count rides the
    SAME window sort that ranks the shard (an unbounded count over
    the partition already being sorted), survives on the shard's
    kept rows, and the group total is one narrow sum over the
    quota-bounded candidate set — the input is scanned EXACTLY once,
    not re-read for audit metadata (the r7 double-scan fix;
    plan-asserted in tests/test_plans.py). Pass `with_totals=False`
    to skip the totals join entirely when the caller doesn't need
    the audit column.

    Priority contract matches `domain_cap`: `order_by` + ascending
    `id_col` totalizer, or the portable md5-hash order when
    `order_by` is None. Returns the kept input rows plus
    rank_in_group (and n_in_group when `with_totals`).
    """
    from pyspark.sql import Window

    if cap < 1:
        raise ValueError(f"domain_cap_topk: cap must be >= 1, got {cap}")
    if id_col is None:
        raise ValueError(
            "domain_cap_topk: id_col is required — without a unique "
            "tie-break the kept subset would be nondeterministic"
        )
    if salt_buckets < 1:
        raise ValueError("domain_cap_topk: salt_buckets must be >= 1")
    if order_by is None:
        order = [portable_hash52(F.col(id_col).cast("string")).asc()]
    else:
        order = list(order_by)
    order.append(F.col(id_col).asc())
    salt = F.pmod(
        F.xxhash64(F.col(id_col).cast("string")), F.lit(salt_buckets)
    )
    w1 = Window.partitionBy(group_col, "_salt").orderBy(*order)
    w1_all = Window.partitionBy(group_col, "_salt")
    local = (
        df.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        # shard count rides the same window sort — no second scan
        .withColumn("_n1", F.count(F.lit(1)).over(w1_all))
        .where(F.col("_r1") <= cap)
    )
    w2 = Window.partitionBy(group_col).orderBy(*order)
    kept = local.withColumn(
        "rank_in_group", F.row_number().over(w2).cast("int")
    )
    if with_totals:
        # Every non-empty shard's rank-1 row survives the local
        # filter carrying the shard's count, so the group total is
        # the sum of _n1 over rank-1 rows — an unbounded window over
        # the SAME group partitioning the exact-rank window just
        # shuffled, computed on the quota-bounded candidate set. One
        # linear plan, input scanned exactly once.
        kept = kept.withColumn(
            "n_in_group",
            F.sum(F.when(F.col("_r1") == 1, F.col("_n1"))).over(
                Window.partitionBy(group_col)
            ),
        )
    return (
        kept.where(F.col("rank_in_group") <= cap)
        .drop("_salt", "_r1", "_n1")
    )


def quality_blend(
    df: DataFrame,
    *,
    signals: dict[str, tuple[float, float, float]],
    n_bins: int = 200,
    p_low: float = 0.01,
    p_high: float = 0.99,
    out_col: str = "quality_blend",
) -> DataFrame:
    """Blend several per-document quality signals into ONE comparable
    score — the signal-combination step every curation pipeline runs
    before thresholding/bucketing, where raw signals live on wildly
    different scales (chars vs ratios vs entropies).

    `signals` maps column -> (lo, hi, weight): each signal is
    winsorize-normalized to [0, 1] using its [p_low, p_high]
    histogram-quantile cut points over fixed [lo, hi] bins (NO global
    sort or percent_rank — ALL signals' cut points come from ONE
    map-side-combined input scan via `histogram_quantiles_multi`,
    constant driver state, then the normalization is a map-only
    projection; the scale story is `sketches.winsorize`'s).
    The blend is the weighted mean over the document's NON-NULL
    signals (weights renormalize, so a missing signal neither sinks
    nor inflates the score); documents with every signal NULL get
    NULL. A degenerate signal (hi_cut == lo_cut — constant within the
    clip range) carries no information and contributes 0.5.

    Normalized signals and the blend round to 6 dp, cut points to
    4 dp (inside histogram_quantiles), so a SQL twin replaying the
    same arithmetic hashes identically. Returns the input plus one
    `norm_<signal>` column per signal and `out_col`.
    """
    cuts = quality_cut_points(
        df, signals=signals, n_bins=n_bins, p_low=p_low, p_high=p_high
    )
    return quality_blend_with_cuts(
        df, signals=signals, cuts=cuts, out_col=out_col
    )


def quality_cut_points(
    df: DataFrame,
    *,
    signals: dict[str, tuple[float, float, float]],
    n_bins: int = 200,
    p_low: float = 0.01,
    p_high: float = 0.99,
) -> dict[str, tuple[float, float]]:
    """The cut-point half of `quality_blend`: ALL signals'
    [p_low, p_high] histogram-quantile cuts from ONE
    map-side-combined scan (`histogram_quantiles_multi`), returned
    as constant driver state — the frozen calibration a streaming
    monitor or a later incremental batch reuses. Signals whose
    column is empty/all-NULL get no entry (the blend then emits
    NULL for them, matching the batch contract)."""
    from .sketches import histogram_quantiles_multi

    if not signals:
        raise ValueError("quality_blend: signals must be non-empty")
    est = {
        (r.sig, r.q): r.estimate
        for r in histogram_quantiles_multi(
            df,
            signals={c: (lo, hi) for c, (lo, hi, _w) in signals.items()},
            n_bins=n_bins,
            quantiles=(p_low, p_high),
        ).collect()
    }
    cuts: dict[str, tuple[float, float]] = {}
    for col in signals:
        if (col, p_low) in est and (col, p_high) in est:
            cuts[col] = (est[(col, p_low)], est[(col, p_high)])
    return cuts


def quality_blend_with_cuts(
    df: DataFrame,
    *,
    signals: dict[str, tuple[float, float, float]],
    cuts: dict[str, tuple[float, float]],
    out_col: str = "quality_blend",
) -> DataFrame:
    """The map-only half of `quality_blend`: normalize + weight-blend
    against ALREADY-KNOWN cut points (from `quality_cut_points`, a
    frozen calibration file, or a reference corpus). Pure column
    expressions — no scan beyond the projection, no shuffle — so it
    applies identically to a batch DataFrame or each streaming
    micro-batch, and per-row results depend only on (row, cuts):
    the chunking-invariance that lets the batch oracle gate the
    streaming form verbatim."""
    out = df
    num = F.lit(0.0)
    den = F.lit(0.0)
    for col, (lo, hi, w) in signals.items():
        v = F.col(col).cast("double")
        if col not in cuts:  # empty/all-null signal column
            norm = F.lit(None).cast("double")
        else:
            lo_cut, hi_cut = cuts[col]
            if hi_cut == lo_cut:
                norm = F.when(v.isNotNull(), F.lit(0.5))
            else:
                clipped = F.least(
                    F.greatest(v, F.lit(lo_cut)), F.lit(hi_cut)
                )
                # guard BEFORE the clamp: least/greatest skip NULLs,
                # so an unguarded clip would map a NULL signal to
                # lo_cut (norm 0.0) instead of staying NULL
                norm = F.when(
                    v.isNotNull(),
                    F.round(
                        (clipped - F.lit(lo_cut))
                        / F.lit(float(hi_cut - lo_cut)),
                        6,
                    ),
                )
        out = out.withColumn(f"norm_{col}", norm)
        nn = F.col(f"norm_{col}")
        num = num + F.when(nn.isNotNull(), nn * F.lit(w)).otherwise(F.lit(0.0))
        den = den + F.when(nn.isNotNull(), F.lit(w)).otherwise(F.lit(0.0))
    blend = F.when(den > 0, F.round(num / den, 6))
    return out.withColumn(out_col, blend)


def curate_corpus(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    group_col: str,
    cap: int,
    span_len: int = 8,
    stride: int = 4,
    min_docs: int = 2,
    signals: dict | None = None,
    n_bins: int = 200,
    hash_fn=None,
) -> DataFrame:
    """The COMPOSED curation pipeline a training-data build actually
    runs, end to end in one call: unicode/whitespace normalization ->
    surgical cross-doc span dedup (anchored windows) -> exact dedup
    (first copy survives) -> multi-signal quality blend -> per-source
    quota. Each stage is the individually-proven operator
    (`text.normalize_text`, `dedup.remove_duplicate_spans`,
    digest-keyed first-copy election, `quality_blend`, `domain_cap`);
    this function proves the COMPOSITION — how span cuts reshape the
    dedup classes, how cleaning reshapes the quality distribution the
    blend's cut points are sketched from, and how the blend orders
    the quota.

    Documents whose cleaned text is empty (or was NULL) drop out
    after the span stage — empty-after-hygiene means "remove", the
    standard convention. `signals` defaults to the char/word pair the
    quality-blend gate uses; ordering inside each quota group is
    (quality_blend DESC, id ASC) — totalized, so the kept set is
    engine-replayable.

    Scale shape is the union of the stages': one Arrow pass
    (normalize), the span table + position anti-join (span dedup),
    ONE digest-keyed window (exact dedup), one fused histogram scan +
    map-only blend, one group-keyed window (quota). Nothing pairwise,
    nothing driver-side beyond the blend's constant cut points.

    Returns (id_col, group_col, text_clean, n_removed, quality_blend,
    rank_in_group, kept).
    """
    from pyspark.sql import Window

    from .dedup import portable_hash52, remove_duplicate_spans
    from .text import normalize_text

    if hash_fn is None:
        hash_fn = portable_hash52
    if signals is None:
        signals = {"n_chars": (0.0, 2000.0, 0.6),
                   "n_words_sig": (0.0, 400.0, 0.4)}

    # Lazy localCheckpoints at the two fan-out points: the span stage
    # consumes its input in ~4 branches and the blend/quota stages
    # re-scan theirs 3 more times — without materialization the
    # normalize Arrow pass (and then the whole span machinery) would
    # re-run per branch (~3.5x measured at sf0.1). Lazy, so nothing
    # materializes until the blend's cut-point collect — the
    # pipeline stays one job chain; blocks free when the caller
    # drops the result (ContextCleaner), no unpersist lifecycle.
    norm = normalize_text(df, text_col=text_col).localCheckpoint(
        eager=False
    )
    cleaned = remove_duplicate_spans(
        norm.select(id_col, F.col("text_norm").alias("_t")),
        id_col=id_col, text_col="_t",
        span_len=span_len, stride=stride, min_docs=min_docs,
        hash_fn=hash_fn, anchored=True,
    ).select(id_col, "text_clean", "n_removed")
    # The group re-attach is corpus JOIN corpus: BOTH sides have the
    # input's cardinality, so neither may ever broadcast — but the
    # column-pruned (id, group) projection's size ESTIMATE shrinks
    # under autoBroadcastJoinThreshold while its true build size is
    # corpus-bound (guide §3.1: estimates lie after transforms).
    # Found by the r17 sf1 tier: at 1.28M docs the planner broadcast
    # the pruned side and the build OOM'd ("Not enough memory to
    # build and broadcast"). MERGE-hint the join — id-keyed
    # sort-merge, always works, spills gracefully; same rows.
    withg = cleaned.hint("merge").join(
        df.select(id_col, group_col), id_col
    ).where(
        F.coalesce(F.length("text_clean"), F.lit(0)) > 0
    ).localCheckpoint(eager=False)
    # exact dedup, first copy (min id) survives; 32-byte digest keys
    # the shuffle, never the text
    digest = F.sha2(F.col("text_clean").cast("binary"), 256)
    wdup = Window.partitionBy(digest)
    survivors = (
        withg.withColumn("_min_id", F.min(id_col).over(wdup))
        .where(F.col(id_col) == F.col("_min_id"))
        .drop("_min_id")
    )
    sig = survivors.select(
        "*",
        F.length("text_clean").cast("double").alias("n_chars"),
        F.size(F.split(F.col("text_clean"), r"\s+")).cast("double")
        .alias("n_words_sig"),
    )
    blended = quality_blend(sig, signals=signals, n_bins=n_bins)
    capped = domain_cap(
        blended, group_col=group_col, cap=cap,
        order_by=[F.col("quality_blend").desc()], id_col=id_col,
    )
    return capped.select(
        id_col, group_col, "text_clean", "n_removed",
        "quality_blend", "rank_in_group", "kept",
    )


def shuffle_order(
    df: DataFrame,
    *,
    id_col: str,
    n_shards: int,
    salt: str = "v1",
    hash_fn=None,
) -> DataFrame:
    """Deterministic global corpus shuffle: every row gets a
    pseudorandom but fully reproducible training position —
    `shard = hash(id, salt) mod n_shards`, `pos_in_shard` = rank of
    the hash within the shard. The layout step between curation and
    `pack_sequences`: a training run must read documents in an order
    that is uncorrelated with ingest order (adjacent crawl pages are
    near-duplicates — reading them consecutively wrecks gradient
    quality) yet IDENTICAL across re-runs, resumes, and engines
    (`ORDER BY rand()` is neither).

    Changing `salt` is a fresh epoch-level reshuffle; changing
    nothing reproduces the exact layout — the property a resumable
    multi-epoch training job needs.

    Scale shape: one narrow projection (the hash) + per-shard window
    sorts that run in PARALLEL — n_shards controls sort granularity,
    so at 100 TB each reducer sorts corpus/n_shards rows (size
    n_shards to the cluster; each sort spills via
    UnsafeExternalSorter if needed). A single global `ORDER BY
    hash` would funnel the corpus through one task — the same
    one-task cliff `pack_sequences`' grouped prefix sum avoids.
    Default hash is the engine-portable 52-bit md5 prefix
    (`dedup.portable_hash52`) so the layout is oracle-checkable;
    swap `hash_fn=xxhash64_col` for the cheaper production hash.
    """
    from pyspark.sql import Window

    from awskinesisconsumer_spark.operators.dedup import portable_hash52

    if n_shards < 1:
        raise ValueError(
            f"shuffle_order: n_shards must be >= 1, got {n_shards}"
        )
    h = hash_fn or portable_hash52
    key = h(F.concat_ws("\x1f", F.col(id_col).cast("string"),
                        F.lit(salt)))
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return (
        df.select(id_col)
        .withColumn("shuffle_key", key)
        .withColumn(
            "shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards)).cast("int")
        )
        .withColumn("pos_in_shard",
                    F.row_number().over(w).cast("long"))
    )


def budget_select(
    df: DataFrame,
    *,
    id_col: str,
    token_col: str,
    priority_col: str,
    budget: int,
    lo: float,
    hi: float,
    n_bins: int = 200,
) -> DataFrame:
    """Token-BUDGET selection: keep the highest-priority documents
    until the running token total reaches `budget` — the "we can
    afford B tokens of pretraining data, which docs make the cut"
    decision every scaled run makes after scoring (quality_blend,
    importance_score). Deterministic: docs are ordered by
    (priority DESC, id ASC); a doc is kept iff the cumulative token
    count INCLUDING itself is <= budget (zero-token docs cost
    nothing and ride along when reached). NULL-priority docs sort
    LAST (selected only if budget outlasts every scored doc); NaN
    priorities are treated AS NULL — Spark orders NaN above every
    double, so an unmapped NaN would silently outrank every scored
    doc (land in bin 0 via the clip and sort first within it), the
    exact opposite of the unscored-sorts-last contract (r11 ADVICE;
    pinned in tests/test_round12_ops.py).

    Returns the input keys plus n_tokens, cum_tokens and kept.

    Scale shape: the global priority-ordered cumsum is the
    one-task-cliff risk (`ORDER BY priority` over the corpus), so it
    runs as the `pack_sequences` two-pass prefix sum keyed on a
    FIXED-WIDTH priority bin: bin = floor((hi - clip(p)) / w) over
    `n_bins` bins of [lo, hi] (descending priority = ascending bin,
    NULLs in a sentinel bin after all real bins), per-bin window
    cumsum in PARALLEL, then bin totals (an n_bins-row table)
    prefix-summed and broadcast back. Bin boundaries are literals,
    so the layout is engine-replayable; the twin uses one window
    (oracle-side only). Priorities denser than w within one bin
    still order exactly — the bin only CHUNKS the sort, the
    (priority DESC, id) order within a bin is exact and bins are
    disjoint ranges.
    """
    from pyspark.sql import Window

    if budget < 0:
        raise ValueError(
            f"budget_select: budget must be >= 0, got {budget}"
        )
    if n_bins < 1 or not (hi > lo):
        raise ValueError(
            f"budget_select: need n_bins >= 1 and hi > lo, got "
            f"n_bins={n_bins}, lo={lo}, hi={hi}"
        )
    w = (float(hi) - float(lo)) / n_bins
    # NaN -> NULL BEFORE any ordering/clipping touches it (see
    # docstring: NaN would otherwise win bin 0 and sort first)
    raw_p = F.col(priority_col).cast("double")
    p = F.when(F.isnan(raw_p), F.lit(None).cast("double")).otherwise(raw_p)
    clipped = F.least(F.greatest(p, F.lit(float(lo))), F.lit(float(hi)))
    bin_ = F.when(p.isNull(), F.lit(n_bins)).otherwise(
        F.least(F.floor((F.lit(float(hi)) - clipped) / F.lit(w)),
                F.lit(n_bins - 1))
    )
    toks = F.coalesce(F.col(token_col).cast("bigint"), F.lit(0))
    base = df.select(
        F.col(id_col), toks.alias("n_tokens"), p.alias("_p"),
        bin_.cast("int").alias("_bin"),
    )
    in_bin = Window.partitionBy("_bin").orderBy(
        F.col("_p").desc_nulls_last(), F.col(id_col).asc()
    )
    local = base.withColumn(
        "_local_cum", F.sum("n_tokens").over(in_bin)
    )
    bins_w = Window.orderBy("_bin").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        base.groupBy("_bin").agg(F.sum("n_tokens").alias("_btot"))
        .withColumn("_boff", F.coalesce(F.sum("_btot").over(bins_w),
                                        F.lit(0)))
        .select("_bin", "_boff")
    )
    cum = F.col("_boff") + F.col("_local_cum")
    return (
        local.join(F.broadcast(offsets), "_bin")
        .select(
            F.col(id_col), F.col("n_tokens"),
            cum.alias("cum_tokens"),
            (cum <= F.lit(int(budget))).alias("kept"),
        )
    )


def curriculum_order(
    df: DataFrame,
    *,
    id_col: str,
    score_col: str,
    n_shards: int,
    salt: str = "v1",
    hash_fn=None,
) -> DataFrame:
    """Curriculum layout: a training order sorted by a DIFFICULTY
    score ascending (easy-first — swap the score's sign for
    hard-first) without a global sort. Each doc gets
    shard = hash(id, salt) mod n_shards (a uniform random split, the
    `shuffle_order` assignment), pos_in_shard = rank by (score ASC,
    id ASC) within its shard, and curriculum_pos =
    (pos_in_shard - 1) * n_shards + shard — the round-robin
    interleave of n_shards independently-sorted uniform samples.
    NULL scores sort LAST (unscored docs arrive after the scored
    curriculum).

    APPROXIMATION, stated: the interleaved order is not the exact
    global score order — a doc's global displacement is bounded by
    the shard imbalance at its score prefix (O(sqrt(n/n_shards))
    whp for a uniform hash split), which is curriculum-grade: what
    matters is the easy->hard TREND, not total order (training
    shuffles within windows anyway). The exact order needs the
    one-task global sort this operator exists to avoid.

    Scale shape: identical to `shuffle_order` — one narrow hash
    projection + per-shard PARALLEL window sorts (each reducer
    sorts corpus/n_shards rows); portable default hash keeps the
    layout oracle-replayable, swap hash_fn=xxhash64_col in
    production.
    """
    from pyspark.sql import Window

    from awskinesisconsumer_spark.operators.dedup import portable_hash52

    if n_shards < 1:
        raise ValueError(
            f"curriculum_order: n_shards must be >= 1, got {n_shards}"
        )
    h = hash_fn or portable_hash52
    shard = F.pmod(
        h(F.concat_ws("\x1f", F.col(id_col).cast("string"),
                      F.lit(salt))),
        F.lit(n_shards),
    ).cast("int")
    w = Window.partitionBy("shard").orderBy(
        F.col(score_col).asc_nulls_last(), F.col(id_col).asc()
    )
    return (
        df.select(id_col, score_col)
        .withColumn("shard", shard)
        .withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
        .withColumn(
            "curriculum_pos",
            (F.col("pos_in_shard") - 1) * n_shards + F.col("shard"),
        )
    )


def interleave_mixture(
    df: DataFrame,
    *,
    id_col: str,
    source_col: str,
    weights: dict,
    n_shards: int,
    salt: str = "v1",
    hash_fn=None,
    carry_cols: tuple = (),
) -> DataFrame:
    """Deterministic weighted source interleaving — STRIDE scheduling
    (weighted fair queueing) as a corpus layout: given per-source
    mixture weights, emit the actual training order in which a
    source with weight 0.7 contributes ~7 of every 10 consecutive
    documents, evenly spread rather than in runs. The step between
    `mixture_allocation` (which decides HOW MUCH of each source) and
    `pack_sequences` (which packs the ordered stream): this decides
    WHERE each document sits.

    Each document gets a pseudorandom per-(source, shard) position p
    (portable-hash rank — the `shuffle_order` permutation), then the
    stride key (p - 0.5) / weight; within a shard, sources merge by
    ascending key (ties: source, id), which provably interleaves
    them in weight proportion (classic stride-scheduling argument).
    The whole layout is reproducible across re-runs and engines:
    positions come from the hash, keys from exact IEEE arithmetic on
    (exact integer p, literal weight).

    Scale shape: two window families, both parallel — per
    (source, shard) for positions, per shard for the merge rank;
    n_shards is the sort-granularity dial exactly as in
    `shuffle_order` (each reducer sorts corpus/n_shards rows). No
    global sort anywhere. Weights must be positive; sources absent
    from `weights` are EXCLUDED (the mixture contract: an unlisted
    source has weight zero). `carry_cols` rides extra columns
    through the layout so a composed caller (`layout_corpus`) never
    has to join them back by id — a composition-breaking extra
    corpus shuffle.
    """
    from pyspark.sql import Window

    from awskinesisconsumer_spark.operators.dedup import portable_hash52

    if n_shards < 1:
        raise ValueError(
            f"interleave_mixture: n_shards must be >= 1, got {n_shards}"
        )
    if not weights:
        raise ValueError("interleave_mixture: weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(
            "interleave_mixture: weights must be positive, got "
            f"{weights}"
        )
    h = hash_fn or portable_hash52
    wexpr = None
    for src, wt in sorted(weights.items()):
        cond = F.col(source_col) == src
        wexpr = (F.when(cond, F.lit(float(wt))) if wexpr is None
                 else wexpr.when(cond, F.lit(float(wt))))
    key = h(F.concat_ws("\x1f", F.col(id_col).cast("string"),
                        F.lit(salt)))
    pos_w = Window.partitionBy(source_col, "shard").orderBy(
        "shuffle_key", id_col
    )
    merge_w = Window.partitionBy("shard").orderBy(
        "stride_key", source_col, id_col
    )
    return (
        df.select(id_col, source_col, *carry_cols)
        .withColumn("_w", wexpr)
        .where(F.col("_w").isNotNull())
        .withColumn("shuffle_key", key)
        .withColumn(
            "shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards)).cast("int")
        )
        .withColumn("_p", F.row_number().over(pos_w).cast("double"))
        .withColumn("stride_key", (F.col("_p") - 0.5) / F.col("_w"))
        .withColumn("pos_in_shard",
                    F.row_number().over(merge_w).cast("long"))
        .select(id_col, source_col, "shard", "pos_in_shard",
                F.round("stride_key", 6).alias("stride_key"),
                *carry_cols)
    )


def layout_corpus(
    df: DataFrame,
    *,
    id_col: str,
    source_col: str,
    text_col: str,
    weights: dict,
    n_shards: int,
    capacity: int,
) -> DataFrame:
    """The composed LAYOUT pipeline — token-count ->
    `interleave_mixture` (weighted stride order) -> per-shard
    sequence packing in that order: one call turns a curated corpus
    into the physical training layout (which shard, which position,
    which fixed-capacity sequences) a loader consumes. The
    layout-side sibling of `curate_corpus` (which owns the
    filter/dedup side).

    Per document: shard, pos_in_shard, stride_key (the mixture
    order), n_tokens, tok_start/tok_end (shard-local token offsets
    in interleaved order), seq_first/seq_last/n_seqs (the
    fixed-`capacity` sequences it occupies — `pack_sequences`
    semantics, per shard).

    Scale shape: every stage is already proven individually — the
    interleave's two parallel window families plus ONE more
    per-shard cumulative-sum window over the same shard partitioning
    (Catalyst reuses the exchange: packing adds no new shuffle of
    the corpus). Zero-token docs occupy no space; unlisted sources
    are excluded by the mixture contract.
    """
    from pyspark.sql import Window

    from awskinesisconsumer_spark.operators.text import token_count

    if capacity < 1:
        raise ValueError(
            f"layout_corpus: capacity must be >= 1, got {capacity}"
        )
    toks = token_count(
        df.select(id_col, source_col, text_col), text_col=text_col
    ).select(
        id_col, source_col,
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
    )
    # n_tokens rides THROUGH the interleave (carry_cols) — joining it
    # back by id afterwards would re-shuffle the corpus once more.
    joined = interleave_mixture(
        toks, id_col=id_col, source_col=source_col, weights=weights,
        n_shards=n_shards, carry_cols=("n_tokens",),
    )
    w = Window.partitionBy("shard").orderBy("pos_in_shard")
    tok_end = F.sum("n_tokens").over(w)
    tok_start = tok_end - F.col("n_tokens")
    return (
        joined.withColumn("tok_end", tok_end)
        .withColumn("tok_start", tok_start)
        .select(
            id_col, source_col, "shard", "pos_in_shard", "stride_key",
            "n_tokens", "tok_start", "tok_end",
            F.floor(F.col("tok_start") / capacity).alias("seq_first"),
            F.when(
                F.col("n_tokens") > 0,
                F.floor((F.col("tok_end") - 1) / capacity),
            ).otherwise(F.floor(F.col("tok_start") / capacity))
            .alias("seq_last"),
        )
        .withColumn("n_seqs", F.col("seq_last") - F.col("seq_first") + 1)
    )


def _next_fit(tokens, capacity: int):
    """pack_nofragment's sequential fold, module-level so property
    tests exercise the exact production kernel: next-fit over token
    counts in order — a new sequence opens iff the current one is
    non-empty AND the doc has tokens AND it would overflow;
    zero-token docs attach at the current fill; oversized docs get a
    dedicated sequence. Returns (seq_idx list, offset list)."""
    seqs, offs = [], []
    seq, fill = 0, 0
    for t in tokens:
        t = int(t)
        if fill > 0 and t > 0 and fill + t > capacity:
            seq += 1
            fill = 0
        seqs.append(seq)
        offs.append(fill)
        fill += t
    return seqs, offs


def pack_nofragment(
    df: DataFrame,
    *,
    shard_col: str,
    id_col: str,
    token_col: str,
    capacity: int,
) -> DataFrame:
    """Document-PRESERVING sequence packing (next-fit, per shard):
    docs are laid into fixed-`capacity` sequences in `id_col` order
    and a document NEVER straddles a sequence boundary — the
    pad-and-pack mode used when examples must stay intact
    (instruction tuning, eval sets), the complement of
    `pack_sequences`' concat-and-split mode. The tail of each
    sequence is padding; the packer's quality is the padding rate,
    which the caller audits as capacity*n_seqs - sum(tokens).

    Per document: `seq_idx` (0-based per shard) and `offset_in_seq`.
    Rules: a new sequence opens iff the current one is non-empty AND
    the doc has tokens AND it would overflow; zero-token docs attach
    at the current offset (they never open a sequence); a doc longer
    than `capacity` gets a dedicated sequence (emitted, not dropped —
    truncation policy belongs to the caller).

    Next-fit is inherently sequential, so the parallel unit is the
    SHARD (the `pack_sequences_stream` argument): one
    applyInPandas group per shard, each a linear integer fold —
    shards pack concurrently, no shuffle beyond the one groupBy.
    At 100 TB size n_shards to the cluster; the per-shard state is
    two integers. (First-fit-decreasing packs ~2-4% tighter but
    destroys id-order locality and reproducible streaming parity —
    next-fit is the deterministic, order-preserving choice.)
    """
    from pyspark.sql.types import (
        LongType, StructField, StructType,
    )

    if capacity < 1:
        raise ValueError(
            f"pack_nofragment: capacity must be >= 1, got {capacity}"
        )
    base = df.select(
        shard_col, id_col,
        F.coalesce(F.col(token_col).cast("bigint"), F.lit(0))
        .alias("n_tokens"),
    )
    out_schema = StructType(
        list(base.schema.fields)
        + [
            StructField("seq_idx", LongType()),
            StructField("offset_in_seq", LongType()),
        ]
    )

    def pack(pdf):
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(
            drop=True
        )
        seqs, offs = _next_fit(pdf["n_tokens"], capacity)
        pdf["seq_idx"] = seqs
        pdf["offset_in_seq"] = offs
        return pdf

    return base.groupBy(shard_col).applyInPandas(pack, out_schema)


def expand_mixture_epochs(
    df: DataFrame,
    *,
    id_col: str,
    source_col: str,
    epochs: dict,
    salt: str = "v1",
    hash_fn=None,
) -> DataFrame:
    """Materialize a mixture's up-sampling decision: repeat each
    document `epochs[source]` times — the expansion step between
    `mixture_allocation` (which computes per-source epochs > 1 for
    under-represented sources) and `shuffle_order`/`pack_sequences`
    (which lay the expanded stream out). A doc in a source with
    epochs 2.3 appears 2 times always, 3 times for a deterministic
    30% of docs (portable-hash gate, the `sample_stratified` rule) —
    so the expanded token mass converges to available * epochs
    without any RNG, and re-runs/appends expand identically.

    Output: input rows repeated with `repeat_idx` (0-based) —
    (id, repeat_idx) is the new unique key downstream ops order by.
    Sources absent from `epochs` default to 1 (kept once); epochs
    must be >= 0 (0 drops the source — the cap-to-zero case).

    Scale shape: map-only — one when-chain for the epoch, one hash
    gate, one explode(sequence(...)); no shuffle, no join, output
    size = input * mean(epochs). The explode multiplies rows BEFORE
    the heavy layout stages, which is the right order: repetition is
    a layout-time decision, so nothing upstream (dedup, quality)
    ever sees a repeated doc.
    """
    from awskinesisconsumer_spark.operators.dedup import portable_hash52

    if not epochs:
        raise ValueError("expand_mixture_epochs: epochs must be non-empty")
    if any(e < 0 for e in epochs.values()):
        raise ValueError(
            f"expand_mixture_epochs: epochs must be >= 0, got {epochs}"
        )
    h = hash_fn or portable_hash52
    eexpr: Column = F.lit(1.0)
    for src, e in sorted(epochs.items()):
        eexpr = F.when(F.col(source_col) == src,
                       F.lit(float(e))).otherwise(eexpr)
    base = F.floor(eexpr).cast("long")
    frac = eexpr - base.cast("double")
    gate = F.pmod(
        h(F.concat_ws("\x1f", F.col(id_col).cast("string"),
                      F.lit(salt))),
        F.lit(1_000_000),
    )
    n_rep = base + F.when(
        gate < (frac * 1_000_000).cast("long"), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.withColumn("_n_rep", n_rep)
        .where(F.col("_n_rep") > 0)
        .withColumn(
            "repeat_idx",
            F.explode(F.sequence(F.lit(0), (F.col("_n_rep") - 1).cast("int"))),
        )
        .drop("_n_rep")
    )


def score_percentile_by_group(
    df: DataFrame,
    *,
    score_col: str,
    group_col: str,
    out_col: str = "pctile",
) -> DataFrame:
    """Per-group ECDF percentile of a score — SOURCE-FAIR quality
    calibration: absolute quality scores are not comparable across
    sources (a mid-tier web page outscores a top-tier forum post
    under most heuristics), so curation thresholds should cut at a
    percentile WITHIN source, not a global score. Each row gets
    `out_col` = fraction of same-group rows with STRICTLY smaller
    score (6 dp): 0 for a group's minimum, approaching 1 for its
    maximum; "keep the top 30% of every source" is then
    `pctile >= 0.7` regardless of the sources' score ranges. NULL
    scores pass through with NULL percentile (unknown quality is a
    routing decision, not silently worst/best).

    Scale shape — deliberately NOT a per-group percent_rank window
    over raw rows (that sorts each entire source on ONE task, the
    single-reducer trap `domain_cap_topk` exists to avoid): per
    (group, score) counts first (map-side combined), then the
    cumulative window runs over DISTINCT scores per group — bounded
    by score cardinality (quality scores are rounded to 4 dp by
    construction), never corpus rows — and the result joins back on
    (group, score). The join is AQE-broadcastable when the distinct
    score table is small, a plain shuffle join otherwise; either
    way no task ever holds a whole source."""
    from pyspark.sql import Window

    g, sc = F.col(group_col), F.col(score_col)
    counts = (
        df.where(g.isNotNull() & sc.isNotNull())
        .groupBy(g.alias("_pg"), sc.alias("_ps"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    wcum = Window.partitionBy("_pg").orderBy("_ps").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("_pg")
    pct_map = counts.select(
        "_pg", "_ps",
        F.round(
            (F.sum("_c").over(wcum) - F.col("_c"))
            / F.sum("_c").over(wall),
            6,
        ).alias(out_col),
    )
    joined = df.join(
        pct_map,
        (g == F.col("_pg")) & (sc == F.col("_ps")),
        "left",
    ).drop("_pg", "_ps")
    return joined


def group_percentile_cuts(
    ref: DataFrame,
    *,
    score_col: str,
    group_col: str,
    n_cuts: int = 20,
) -> DataFrame:
    """FREEZE `score_percentile_by_group`'s per-group calibration
    into cut points (r14 verdict item 7): for each group, the scores
    at the interior quantile grid i/n_cuts (i = 1 .. n_cuts-1) of
    the REFERENCE corpus — cuts[i-1] = the smallest score whose
    within-group inclusive ECDF reaches i/n_cuts. A streaming
    quality gate must cut at a FROZEN per-source percentile
    (re-deriving the ECDF per micro-batch silently shifts the
    threshold as the stream grows — the `quality_cut_points` /
    `importance_stats` / whitening freeze rule, here at group
    grain).

    The reach test is INTEGER arithmetic (cum * n_cuts >= i * total
    — never a float ratio), so the frozen table replays bit-for-bit
    in any engine. Scale shape: per-(group, score) counts (map-side
    combined), the cumulative window over DISTINCT scores per group
    (bounded by score cardinality, never corpus rows — the
    `score_percentile_by_group` layout), a (distinct scores) x
    (n_cuts-1) grid join, one min per (group, i). Returns one row
    per group: (group, cuts array<double> of n_cuts-1 ascending cut
    points) — G rows, broadcastable."""
    if n_cuts < 2:
        raise ValueError(
            f"group_percentile_cuts: n_cuts must be >= 2, got {n_cuts}"
        )
    from pyspark.sql import Window

    g, sc = F.col(group_col), F.col(score_col)
    counts = (
        ref.where(g.isNotNull() & sc.isNotNull())
        .groupBy(g.alias("group"), sc.cast("double").alias("_ps"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    wcum = Window.partitionBy("group").orderBy("_ps").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("group")
    ecdf = counts.select(
        "group", "_ps",
        F.sum("_c").over(wcum).alias("_cum"),
        F.sum("_c").over(wall).alias("_tot"),
    )
    grid = ref.sparkSession.range(1, n_cuts).select(
        F.col("id").cast("int").alias("_i")
    )
    cuts_long = (
        ecdf.join(F.broadcast(grid))
        .where(
            F.col("_cum") * n_cuts >= F.col("_i") * F.col("_tot")
        )
        .groupBy("group", "_i")
        .agg(F.min("_ps").alias("_cut"))
    )
    return cuts_long.groupBy("group").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("_i", "_cut"))),
            lambda x: x["_cut"],
        ).alias("cuts")
    )


def apply_group_percentile_cuts(
    df: DataFrame,
    cuts: DataFrame,
    *,
    score_col: str,
    group_col: str,
    out_col: str = "pctile_frozen",
) -> DataFrame:
    """The MAP-ONLY half of the frozen source-fair percentile: each
    row's `out_col` = (number of its group's frozen cut points <=
    its score) / n_cuts — the quantile-grid percentile of the score
    under the REFERENCE corpus' per-group calibration
    (`group_percentile_cuts`), quantized to the grid
    {0, 1/n, ..., (n-1)/n}. "Keep the top 30% of every source by
    the reference calibration" is then `pctile_frozen >= 0.7`,
    stable however the live corpus drifts.

    One broadcast join on group (the cuts table is G rows) plus a
    <= n_cuts-element array fold per row — no shuffle of `df`, no
    scan beyond the projection, so it applies identically to a
    batch DataFrame or each streaming micro-batch: per-row results
    depend only on (row, cuts), the chunking-invariance that lets
    ONE batch oracle gate the streaming form verbatim
    (`streaming.pipeline.percentile_gate_stream`). NULL scores and
    groups absent from the calibration get NULL (unknown quality /
    uncalibrated source is a routing decision, not silently
    worst/best)."""
    g, sc = F.col(group_col), F.col(score_col)
    cts = cuts.select(
        F.col("group").alias("_cg"), F.col("cuts").alias("_cuts")
    )
    kept = F.aggregate(
        F.col("_cuts"),
        F.lit(0),
        lambda acc, c: acc
        + F.when(sc.cast("double") >= c, 1).otherwise(0),
    )
    pct = F.when(
        sc.isNotNull() & F.col("_cuts").isNotNull(),
        F.round(
            kept / (F.size("_cuts") + F.lit(1)).cast("double"), 6
        ),
    )
    return (
        df.join(F.broadcast(cts), g == F.col("_cg"), "left")
        .withColumn(out_col, pct)
        .drop("_cg", "_cuts")
    )
