"""Text analysis operators (north-star `ext-text-analysis`): quality
scoring, token counting, language-ID heuristic, fingerprinting. All
pure column expressions over the `documents` table — no Python UDFs in
the hot path, so every one of these runs inside whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic (public-knowledge common words).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def _words(text: Column) -> Column:
    # NULL text == empty document (n_words 0, ratios 0.0) — not NULL
    # metrics: dedup/quality pipelines treat absent text as empty, and
    # the DuckDB oracles COALESCE identically.
    trimmed = F.trim(F.coalesce(text, F.lit("")))
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def text_stats(df: DataFrame, *, text_col: str) -> DataFrame:
    """Per-document quality metrics: char/word counts, average word
    length, stopword ratio, distinct-word ratio. Narrow — no shuffle."""
    words = _words(F.col(text_col))
    n_words = F.size(words)
    n_chars = F.length(F.col(text_col))
    n_distinct = F.size(F.array_distinct(words))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    return (
        df.withColumn("n_chars_calc", n_chars.cast("bigint"))
        .withColumn("n_words", n_words.cast("bigint"))
        .withColumn(
            "avg_word_len",
            F.round(
                F.when(n_words > 0, (F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
                                     / n_words)).otherwise(F.lit(0.0)),
                4,
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.round(F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0)), 4),
        )
        .withColumn(
            "distinct_ratio",
            F.round(F.when(n_words > 0, n_distinct / n_words).otherwise(F.lit(0.0)), 4),
        )
    )


def readability_scores(
    df: DataFrame, *, text_col: str,
) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade per document — the
    classic readability axis quality filters add next to the
    Gopher-style structural rules: word/sentence/syllable ratios with
    the published coefficients (206.835/1.015/84.6 and
    0.39/11.8/15.59).

    Syllables are approximated as VOWEL GROUPS ([aeiouy]+ runs in the
    lower-cased text) and sentences as terminal-punctuation runs
    ([.!?]+), both via one regexp_extract_all — deterministic,
    engine-portable counting (no dictionary), the standard cheap
    proxy; scores are a ranking signal, not linguistics. Zero-word
    docs (NULL/empty text) get NULL scores; sentence count clamps to
    >= 1 so headline-like fragments still score. Map-only, narrow;
    adds n_words / n_sentences / n_syllables / flesch / fk_grade."""
    words = _words(F.col(text_col))
    n_words = F.size(words).cast("bigint")
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    n_syll = F.size(F.regexp_extract_all(low, F.lit("[aeiouy]+"), 0)) \
        .cast("bigint")
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(low, F.lit("[.!?]+"), 0)),
        F.lit(1),
    ).cast("bigint")
    wps = n_words / n_sent
    spw = n_syll / n_words
    return (
        df.withColumn("n_words", n_words)
        .withColumn("n_sentences", n_sent)
        .withColumn("n_syllables", n_syll)
        .withColumn(
            "flesch",
            F.round(
                F.when(
                    n_words > 0,
                    F.lit(206.835) - F.lit(1.015) * wps
                    - F.lit(84.6) * spw,
                ),
                4,
            ),
        )
        .withColumn(
            "fk_grade",
            F.round(
                F.when(
                    n_words > 0,
                    F.lit(0.39) * wps + F.lit(11.8) * spw
                    - F.lit(15.59),
                ),
                4,
            ),
        )
    )


def quality_score(df: DataFrame, *, text_col: str,
                  out_col: str = "quality") -> DataFrame:
    """Composite document-quality score in [0,1]: length signal
    (saturating at 100 words), low stopword density, lexical diversity
    — the standard cheap pre-filter for LLM training corpora. One
    narrow pass; identical arithmetic is expressible in ANSI SQL so the
    score is oracle-checkable."""
    words = _words(F.col(text_col))
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    n_distinct = F.size(F.array_distinct(words))
    nw = n_words.cast("double")
    score = F.when(n_words == 0, F.lit(0.0)).otherwise(
        0.4 * F.least(nw / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - n_stop / nw)
        + 0.3 * (n_distinct / nw)
    )
    return df.withColumn(out_col, F.round(score, 4))


def token_count(df: DataFrame, *, text_col: str, out_col: str = "n_tokens") -> DataFrame:
    """BPE-ish token counting: alphanumeric runs + each punctuation
    char counts as a token (a deterministic stand-in for a real BPE
    vocab; the regex is the public GPT-2-style pre-tokenizer shape)."""
    pattern = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"
    return df.withColumn(
        out_col,
        F.regexp_count(F.coalesce(F.col(text_col), F.lit("")), F.lit(pattern))
        .cast("bigint"),
    )


def language_id(df: DataFrame, *, text_col: str, out_col: str = "lang_pred",
                with_confidence: bool = False,
                conf_col: str = "lang_conf") -> DataFrame:
    """Stopword-marker language ID: score each candidate language by
    marker-word hits, pick the argmax (ties -> lexicographic, 'und'
    when no marker hits). Pure expressions: the scores form a small
    array of structs reduced with array_max.

    `with_confidence` adds `conf_col` = best score / total marker
    hits (6 dp; 0.0 when no marker hits) — an honest HEURISTIC
    confidence (marker-share, not a calibrated probability), which is
    exactly what makes it the worked input for
    `evaluation.expected_calibration_error`: a calibration harness
    exists to measure how mis-calibrated such scores are."""
    # The word array is STAGED into its own column (r16 optimization
    # round): every language's marker filter re-derives `words`, and
    # the per-lang scores are each referenced again by the argmax
    # when-chain, the greatest(), and the confidence total — inline,
    # the trim/lower/split re-ran per reference inside the
    # interpreted HOF filters (measured 0.49s -> 0.30s per 5k docs
    # per core at sf0.1, identical output; the denoising_pairs
    # staging rule). CollapseProject keeps the stage because the
    # alias is non-cheap and multiply referenced. An array_remove
    # codegen rewrite was measured SLOWER (20 array allocations per
    # row) and rejected.
    tmp = "__langid_words"
    staged = df.withColumn(tmp, _words(F.lower(F.col(text_col))))
    words = F.col(tmp)
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        marr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(words, lambda w: F.array_contains(marr, w)))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    # array_max on struct compares score first, then lang DESC would be
    # wrong — invert: max (score, reversed-lang) so ties break to the
    # lexicographically smallest language. Simpler: pick max score then
    # first lang matching it in sorted order via when-chain.
    best = F.greatest(*[s["score"] for s in scores])
    pred = F.lit("und")
    for s in reversed(scores):
        pred = F.when((best > 0) & (s["score"] == best), s["lang"]).otherwise(pred)
    out = staged.withColumn(out_col, pred)
    if with_confidence:
        total = scores[0]["score"]
        for s in scores[1:]:
            total = total + s["score"]
        out = out.withColumn(
            conf_col,
            F.when(total > 0, F.round(best / total, 6)).otherwise(
                F.lit(0.0)
            ),
        )
    return out.drop(tmp)


def fingerprint(df: DataFrame, *, text_col: str, out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint: polynomial rolling hash over normalized
    words (char hash base-31, word fold base-1000003, both mod 2^31-1
    — plain integer arithmetic, so any engine reproduces the values).

    Implemented as an Arrow-batched pandas UDF: the fold is
    order-dependent and inherently sequential *per document*, and a
    nested Catalyst `aggregate()` lambda falls out of codegen into
    interpreted eval (~10x slower measured). Per-doc Python over Arrow
    batches is the vectorized-decode-path choice (the reference made
    the same call for frame decode, parser.py:441-442). Parallelism
    comes from partitioning across docs, which is the axis that scales.
    """
    mod = (1 << 31) - 1

    @pandas_udf("bigint")
    def fp_udf(texts: pd.Series) -> pd.Series:
        def one(t) -> int:
            if t is None:
                return 0
            acc = 0
            for w in t.lower().split():
                wh = 0
                for ch in w:
                    wh = (wh * 31 + ord(ch)) % mod
                acc = (acc * 1000003 + wh) % mod
            return acc

        return texts.map(one)

    # NOT fanned out (r16 optimization round): the interleaved on/off
    # A/B measured the size-gated fan-out a wash on this kernel at
    # gate SF — the per-doc fold is too cheap to pay the exchange.
    return df.withColumn(out_col, fp_udf(F.col(text_col)))


def repetition_stats(df: DataFrame, *, id_col: str,
                     text_col: str) -> DataFrame:
    """Gopher-style repetition quality metrics (Rae et al. 2021,
    "Scaling Language Models", table A1 — the standard LLM-corpus
    repetition filters): per document,

    * dup_line_frac — fraction of lines that are repeats of an
      earlier identical line;
    * dup_line_char_frac — fraction of line characters inside those
      repeats;
    * top_2gram / top_2gram_char_frac — the most frequent word 2-gram
      (count ties break to the lexicographically largest gram, so the
      result is deterministic) and the fraction of text characters its
      occurrences cover. Occurrences may overlap ("spam spam spam"
      counts 'spam spam' twice), so the raw product can exceed the
      text length; the fraction is clamped to 1.0 to stay a [0,1]
      filterable quantity.

    Unlike the other text ops this one shuffles: per-(doc, line) and
    per-(doc, gram) counts need a groupBy. All keys are doc-prefixed,
    so partial aggregation combines map-side and the shuffle carries
    one row per distinct line/gram per doc — no global state. Joins at
    the end are id-keyed and AQE-broadcastable.
    """
    from awskinesisconsumer_spark.operators.dedup import shingle_rows

    text = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    base = df.select(id_col, text.alias("_t"))

    lines = base.select(
        id_col,
        F.length("_t").alias("_len"),
        F.explode(F.split(F.col("_t"), "\n", -1)).alias("_line"),
    )
    per_line = lines.groupBy(id_col, "_line").agg(
        F.count(F.lit(1)).alias("_c"), F.first("_len").alias("_len")
    )
    line_stats = per_line.groupBy(id_col).agg(
        F.sum("_c").alias("n_lines"),
        F.sum(F.col("_c") - 1).alias("_dups"),
        F.sum(F.col("_c") * F.length("_line")).alias("_tot"),
        F.sum((F.col("_c") - 1) * F.length("_line")).alias("_dupc"),
        F.first("_len").alias("_len"),
    )

    grams = shingle_rows(base, id_col=id_col, text_col="_t", n=2)
    per_gram = grams.groupBy(id_col, "shingle").agg(
        F.count(F.lit(1)).alias("_c")
    )
    top = per_gram.groupBy(id_col).agg(
        F.max(F.struct("_c", "shingle")).alias("_top")
    )

    return line_stats.join(top, id_col, "left").select(
        id_col,
        F.col("n_lines"),
        F.round(F.col("_dups") / F.col("n_lines"), 4).alias("dup_line_frac"),
        F.when(F.col("_tot") > 0,
               F.round(F.col("_dupc") / F.col("_tot"), 4))
        .otherwise(F.lit(0.0)).alias("dup_line_char_frac"),
        F.coalesce(F.col("_top.shingle"), F.lit("")).alias("top_2gram"),
        F.when(
            (F.col("_len") > 0) & F.col("_top").isNotNull(),
            F.round(F.least(F.col("_top._c") * F.length("_top.shingle")
                            / F.col("_len"), F.lit(1.0)), 4),
        ).otherwise(F.lit(0.0)).alias("top_2gram_char_frac"),
    )


# Default PII patterns, ordered: earlier patterns are redacted first,
# so e.g. the email rule consumes 'user@host' before the phone rule
# can see digit runs inside it. Every pattern stays inside the common
# Java-regex/RE2 subset (no lookaround, no backrefs), so the same
# strings drive Spark's regexp_replace and an external engine's
# byte-for-byte.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, regex, replacement token)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def redact_pii(df: DataFrame, *, text_col: str,
               out_col: str = "redacted") -> DataFrame:
    """PII redaction — the scrub pass every LLM training corpus runs
    before anything else ships: emails, SSN-shaped ids, IPv4 addresses,
    and phone-shaped numbers are replaced with typed tokens, and a
    per-category match count (`n_email`, `n_ssn`, `n_ip`, `n_phone`)
    comes along for audit/filter use.

    Each category is counted against the text AFTER all earlier
    patterns were redacted, so the counts agree exactly with the tokens
    visible in the output: a phone- or IP-shaped run inside an email
    local part is consumed by the email rule and counted once, as
    email. (Counting every category on the raw text would let one
    substring increment two counters while the replacement chain emits
    only the first-matching token.)

    Narrow, pure column expressions (regexp_count + a regexp_replace
    chain) — no shuffle, no UDF, whole-stage codegen; at 100 TB this is
    a map-only pass that pipelines into whatever scan feeds it. Pattern
    order matters and is part of the contract (see PII_PATTERNS).
    """
    cur = F.coalesce(F.col(text_col), F.lit(""))
    out = df
    for name, pat, tok in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.regexp_count(cur, F.lit(pat)).cast("bigint"),
        )
        cur = F.regexp_replace(cur, pat, tok)
    return out.withColumn(out_col, cur)


def tfidf_top_terms(df: DataFrame, *, id_col: str, text_col: str,
                    k: int = 5) -> DataFrame:
    """Top-k TF-IDF terms per document (smoothed sklearn-style idf:
    ln((N+1)/(df+1)) + 1), the standard keyword/topic signal for corpus
    curation. Returns (id, term, tf, score, term_rank), term_rank 1..k
    by (score DESC, term ASC) — fully deterministic.

    Scale shape: tf = groupBy(doc, term) with map-side combine (the
    shuffle carries one row per distinct term per doc); document
    frequency = groupBy(term) count over those rows (stopword keys are
    hot but it's a partial-aggregated count, not a list); N = scalar
    subquery broadcast, never collected; idf joins back on term
    (AQE broadcasts it when the vocabulary is small); final top-k is a
    doc-partitioned window — no global sort anywhere.
    """
    words = _words(F.lower(F.col(text_col)))
    tok = (
        df.select(id_col, F.explode(words).alias("term"))
        .where(F.col("term") != "")
    )
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("_n") + 1.0) / (F.col("_df") + 1.0)) + 1.0),
                4,
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= k)
        .select(id_col, "term", "tf", "score", "term_rank")
    )


def top_terms(df: DataFrame, *, text_col: str, k: int = 100) -> DataFrame:
    """Corpus-wide vocabulary building: the k most frequent lowercased
    whitespace terms with deterministic ranking (count DESC, term ASC)
    — the counting pass behind tokenizer-vocab / BPE-seed preparation.

    Shape: explode -> groupBy(term) with map-side partial counts (the
    shuffle carries one row per distinct term per partition), then a
    k-row TakeOrderedAndProject; the rank window runs AFTER the limit,
    so its single-partition exchange sees k rows, never the corpus.
    """
    from pyspark.sql import Window

    words = _words(F.lower(F.col(text_col)))
    counts = (
        df.select(F.explode(words).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term"))
        .limit(k)
    )
    w = Window.orderBy(F.col("n").desc(), F.col("term"))
    return counts.withColumn("rank", F.row_number().over(w))


# Domains filtered by default in url_features: the usual curation
# blocklist shape (link farms, shorteners). Deliberately tiny — real
# pipelines load theirs from config; the operator takes an override.
URL_BLOCKLIST_DEFAULT: list[str] = [
    "spam-mill.com",
    "link-farm.net",
    "t.co",
]


def url_features(df: DataFrame, *, url_col: str,
                 blocklist: list[str] | None = None) -> DataFrame:
    """URL normalization + domain curation signals — the dedup/filter
    key derivation every crawl pipeline runs: web corpora dedup by
    normalized URL before any content hash, and domain blocklists are
    the first quality gate.

    Adds:
      * `norm_url` — scheme/host lowercased, `www.` and default ports
        (:80/:443) stripped from the host, query string and fragment
        dropped, trailing slashes trimmed;
      * `domain` — registrable domain approximated as the last two
        host labels (a public-suffix list is a config concern);
      * `blocked` — domain membership in `blocklist` (default
        URL_BLOCKLIST_DEFAULT).

    Everything is regexp_extract/regexp_replace in the shared
    Java-regex/RE2 subset (no lookaround): narrow, codegen'd, no
    shuffle — and replayable verbatim in any engine for verification.
    Rows that don't parse as scheme://host... yield NULL norm_url and
    domain, blocked = false (route, don't drop, upstream).
    """
    url = F.coalesce(F.col(url_col), F.lit(""))
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = F.regexp_replace(host, r":(80|443)$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.regexp_replace(path, r"/+$", "")
    ok = (scheme != "") & (host != "")
    domain = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    blocked = domain.isin(
        *(blocklist if blocklist is not None else URL_BLOCKLIST_DEFAULT)
    )
    return (
        df.withColumn(
            "norm_url",
            F.when(ok, F.concat(scheme, F.lit("://"), host, path)),
        )
        .withColumn("domain", F.when(ok & (domain != ""), domain))
        .withColumn("blocked", F.when(ok, blocked).otherwise(F.lit(False)))
    )


def bm25_rank(df: DataFrame, *, id_col: str, text_col: str,
              query_terms: list[str], k1: float = 1.5, b: float = 0.75,
              k: int = 20) -> DataFrame:
    """BM25 relevance ranking of documents against a fixed query-term
    set — the retrieval-side scoring every decontamination / curation
    pipeline runs when it filters a corpus against benchmark queries.

    Shape chosen for 100 TB, not textbook fidelity to an inverted
    index: with a small bounded query (|Q| terms), per-document term
    frequencies are plain vectorized array expressions over the token
    array — NO doc x term explode, NO shuffle to build tf. The only
    wide operation is one global aggregate producing a SINGLE row of
    corpus statistics (N, avg doclen, per-term document frequencies),
    which is cross-joined back (broadcast of 1 row) so scoring stays
    narrow and codegen'd. Final top-k is a TakeOrderedAndProject (k
    rows to the driver-side sort, never the corpus).

    Determinism across engines: every float input (tf, dl, df_t, N) is
    an exact integer; the score is a fixed-order chain of float ops, so
    a DuckDB oracle replaying the same expression order is
    bit-identical. idf uses the +1 "Lucene" form, always positive.
    """
    words = _words(F.lower(F.col(text_col)))

    # NB: a `lambda w, t=t:` two-arg lambda would select F.filter's
    # (element, index) overload and bind the INDEX to t — close over
    # the term with a factory instead.
    def _tf(term: str):
        return F.size(F.filter(words, lambda w: w == F.lit(term)))

    tf_cols = [_tf(t).alias(f"_tf_{i}") for i, t in enumerate(query_terms)]
    base = df.select(F.col(id_col), F.size(words).alias("_dl"), *tf_cols)
    stats = base.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.sum("_dl").alias("_sum_dl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("_sum_dl").cast("double") / F.col("_n_docs").cast("double")
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        tf = F.col(f"_tf_{i}").cast("double")
        idf = F.log(
            (F.col("_n_docs") - F.col(f"_df_{i}") + 0.5)
            / (F.col(f"_df_{i}") + 0.5)
            + 1.0
        )
        score = score + idf * (
            tf * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * (F.col("_dl").cast("double") / avgdl)))
        )
    out = scored.select(
        F.col(id_col),
        F.col("_dl").cast("bigint").alias("doc_len"),
        F.round(score, 4).alias("bm25"),
    )
    from pyspark.sql import Window

    top = out.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def _apply_merge(ts: list, left: str, right: str) -> list:
    """One greedy left-to-right pass of a BPE merge over a token
    list: each (left, right) adjacency collapses and the scan resumes
    AFTER the merged symbol (no re-scan within the pass). The single
    definition shared by the trainer's driver loop, the trainer's
    distributed UDF, and the encoder — the train/encode parity
    contract (and the recursive-CTE oracle) depends on all call
    sites applying byte-identical semantics."""
    out, i = [], 0
    while i < len(ts):
        if i + 1 < len(ts) and ts[i] == left and ts[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(ts[i])
            i += 1
    return out


def bpe_encode_corpus(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Apply a trained BPE merge table to a corpus — the tokenizer
    APPLY step that pairs with `bpe_train_merges` (train -> encode ->
    token budgets feed `pack_sequences` / `chunk_text`). Returns one
    row per input document: (id, n_words, n_bpe_tokens).

    Scale shape: documents explode to (doc, word) counts ONCE; the
    merge loop then runs over the DISTINCT-word table only (Zipf-
    bounded — millions of rows at 100 TB, not corpus-sized), via one
    Arrow-batched pandas UDF carrying the merge list in its closure
    (n_merges pairs — broadcast-small by construction). Per-word
    token counts join back on the word key (AQE broadcasts the vocab
    side when it fits) and aggregate per document. The corpus text
    itself is never shuffled and Python touches only distinct words.

    Merge application is the trainer's exact semantics: merges in
    rank order, each applied greedily left-to-right over the
    char+'</w>' token list (same tie behavior as bpe_train_merges'
    per-round _apply).
    """
    import pandas as pd
    from pyspark.sql.types import IntegerType

    seq = [(str(left), str(right)) for left, right in merges]
    words = _words(F.col(text_col))
    tok = (
        df.select(id_col, F.explode(words).alias("_w"))
        .where(F.col("_w") != "")
        .groupBy(id_col, "_w")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    vocab = tok.select("_w").distinct()

    @F.pandas_udf(IntegerType())
    def _n_tokens(ws: pd.Series) -> pd.Series:
        def encode(word: str) -> int:
            ts = list(word) + ["</w>"]
            for left, right in seq:
                ts = _apply_merge(ts, left, right)
            return len(ts)

        return ws.map(encode)

    vt = vocab.withColumn("_nt", _n_tokens("_w"))
    per_doc = (
        tok.join(vt, "_w")
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_words"),
            F.sum(F.col("_c") * F.col("_nt")).alias("n_bpe_tokens"),
        )
    )
    return (
        df.select(id_col).join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0)).cast("long")
            .alias("n_bpe_tokens"),
        )
    )


def word_entropy(df: DataFrame, *, text_col: str,
                 out_col: str = "entropy", id_col: str | None = None,
                 fallback_tokens: int = 4096) -> DataFrame:
    """Per-document unigram (word) Shannon entropy in nats — a cheap
    information-density quality signal: near-zero entropy flags
    boilerplate/repeated-token documents that slip past length filters.

    H = ln(n) - (1/n) * sum_w c_w ln c_w. Two physically different
    plans, same bit-exact values:

    * docs with <= `fallback_tokens` words: array expressions
      (distinct -> sort -> fold) — narrow, no shuffle, no Python. The
      fold runs over the SORTED distinct-word list so the float
      summation order is engine-independent — a DuckDB list_reduce
      over the same sorted list reproduces the value bit-for-bit
      (same trick as the ANN oracles).
    * docs ABOVE the threshold (requires `id_col`, which must be
      unique AND non-null: the inner join back on id_col never
      matches a NULL id, so an over-threshold row with a NULL id
      would silently vanish from the output — small-path rows keep
      NULL ids, making the loss asymmetric): explode -> (id, word)
      count -> per-doc sorted fold
      over collect_list(struct(word, count)). The narrow form's count
      step is O(distinct x n) per document in interpreted HOF lambdas
      — fine at normal doc sizes, pathological on single multi-MB
      docs; the explode form is linear with one doc-keyed shuffle.
      Counts are exact ints and the fold order is the same
      word-sorted order, so both paths agree bit-for-bit (asserted in
      tests/test_text.py).

    With id_col=None every row takes the narrow path regardless of
    size.
    """
    words = _words(F.lower(F.col(text_col)))
    n = F.size(words)
    dw = F.array_sort(F.array_distinct(words))
    # Count each distinct word ONCE (transform), then fold — HOF
    # lambdas run interpreted with no subexpression elimination, so
    # inlining the count twice (multiplier + log argument) would
    # double the dominant O(distinct x n) scan.
    counts = F.transform(
        dw, lambda d: F.size(F.filter(words, lambda w: w == d)).cast("double")
    )
    acc = F.aggregate(
        counts, F.lit(0.0), lambda a, c: a + c * F.log(c)
    )
    ent = F.when(n <= 0, F.lit(0.0)).otherwise(
        F.round(F.log(n.cast("double")) - acc / n.cast("double"), 4)
    )
    if id_col is None:
        return df.withColumn(out_col, ent)
    small = df.where(n <= fallback_tokens).withColumn(out_col, ent)
    big = df.where(n > fallback_tokens)
    per_doc = (
        big.select(id_col, F.explode(words).alias("_w"))
        .groupBy(id_col, "_w")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("_w", "_c"))),
                F.lit(0.0),
                lambda a, s: a + s["_c"].cast("double")
                * F.log(s["_c"].cast("double")),
            ).alias("_acc"),
            F.sum("_c").alias("_n"),
        )
    )
    big_out = (
        big.join(per_doc, id_col)  # n > threshold > 0: always matches
        .withColumn(
            out_col,
            F.round(
                F.log(F.col("_n").cast("double"))
                - F.col("_acc") / F.col("_n").cast("double"),
                4,
            ),
        )
        .drop("_acc", "_n")
    )
    return small.unionByName(big_out)


def unigram_logprob(df: DataFrame, *, id_col: str, text_col: str,
                    out_col: str = "avg_logprob") -> DataFrame:
    """Per-document average unigram log-probability under the corpus'
    own empirical word distribution (add-one smoothed) — the cheap
    "perplexity-ish" fluency score used to rank documents before a
    real LM gets involved: boilerplate and keyword-stuffed docs sit in
    the tails.

    Two passes: (1) corpus term frequencies — explode + groupBy(term)
    with map-side combine, the same shape as vocabulary building;
    (2) per-(doc, term) counts joined against the term table on the
    term key, then a doc-keyed weighted average. Both shuffles carry
    one row per distinct term (per doc), never raw tokens. At 100 TB
    the term table is Zipf-bounded (millions of rows, not corpus-
    sized) and AQE broadcasts it when it fits.

    Determinism: log-prob inputs are exact integers (counts), and the
    per-doc mean is computed as sum(c_t * ln p_t) / n in a single
    aggregate whose addends are folded over the SORTED term list via
    collect_list + array_sort + fold — engine-independent summation
    order, same trick as word_entropy.
    """
    words = _words(F.lower(F.col(text_col)))
    tok = (
        df.select(id_col, F.explode(words).alias("term"))
        .where(F.col("term") != "")
    )
    doc_tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("_c"))
    corpus = tok.groupBy("term").agg(F.count(F.lit(1)).alias("_cf"))
    totals = corpus.agg(
        F.sum("_cf").alias("_n_tokens"),
        F.count(F.lit(1)).alias("_vocab"),
    )
    # ln p_t = ln(cf_t + 1) - ln(N + V)  (add-one smoothing)
    joined = (
        doc_tf.join(corpus, "term")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.col("_c"),
            F.struct("term", "_c", "_cf").alias("_e"),
            (F.col("_n_tokens") + F.col("_vocab")).cast("double").alias("_denom"),
        )
    )
    per_doc = joined.groupBy(id_col).agg(
        F.sum("_c").alias("_n"),
        F.array_sort(F.collect_list("_e")).alias("_es"),
        F.first("_denom").alias("_denom"),
    )
    acc = F.aggregate(
        F.col("_es"),
        F.lit(0.0),
        lambda a, e: a
        + e["_c"].cast("double")
        * (F.log(e["_cf"].cast("double") + 1.0) - F.log(F.col("_denom"))),
    )
    out = per_doc.select(
        F.col(id_col),
        F.col("_n").cast("bigint").alias("n_tokens"),
        F.round(acc / F.col("_n").cast("double"), 4).alias(out_col),
    )
    # Docs with zero words have no tok rows — restore them with NULL
    # score (absent text is "no evidence", not "improbable").
    return (
        df.select(id_col).join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            out_col,
        )
    )


def importance_score(
    df: DataFrame,
    target: DataFrame,
    *,
    id_col: str,
    text_col: str,
    target_text_col: str,
    out_col: str = "importance",
) -> DataFrame:
    """DSIR-style importance score (Xie et al., Data Selection via
    Importance Resampling): per-document mean unigram log-likelihood
    RATIO of a TARGET domain sample over the corpus' own
    distribution —

        score(d) = (1/n_d) * sum_t c_t * (ln p_tgt(t) - ln p_src(t))

    with both distributions add-one smoothed over the UNION
    vocabulary (terms unseen in the target get a finite penalty, not
    -inf). Docs whose word mix resembles the target score high; the
    standard pick-pretraining-data-that-looks-like-the-eval-domain
    signal, one tier above raw `unigram_logprob` fluency. Selection
    composes downstream: `quality_blend` on the score, or a
    hash-gated keep on score buckets (`sample_stratified`) — scoring
    and sampling stay separate operators by design.

    Empty/NULL docs -> NULL score ("no evidence"), n_tokens 0.

    Scale shape: same contract as `unigram_logprob` — shuffles carry
    one row per distinct (doc, term) / term, never raw tokens; the
    corpus term table is Zipf-bounded; the TARGET term table is
    domain-sample-bounded (tiny: eval suites / domain seeds) and
    rides a left join that AQE broadcasts. The per-doc sum folds
    over the SORTED term list (collect_list + array_sort +
    F.aggregate) so summation order is engine-independent.
    """
    stats, n_src, n_tgt, vocab = importance_stats(
        df, target, text_col=text_col, target_text_col=target_text_col
    )
    return importance_score_with_stats(
        df, stats, id_col=id_col, text_col=text_col,
        n_src=n_src, n_tgt=n_tgt, vocab=vocab, out_col=out_col,
    )


def importance_stats(
    corpus: DataFrame,
    target: DataFrame,
    *,
    text_col: str,
    target_text_col: str,
):
    """Freeze the DSIR calibration: the UNION-vocabulary term table
    with both distributions' counts, plus the three smoothing masses
    — computed ONCE on a reference corpus + target seed, then applied
    to any batch or stream with `importance_score_with_stats` (the
    `quality_cut_points` / `whitening_stats` freeze/apply split, for
    the data-selection signal).

    Returns (stats_df[term, cf, tf], n_src, n_tgt, vocab). The stats
    DataFrame is vocab-bounded (NOT collected — at 100 TB it is
    millions of rows, joined broadcast-or-shuffle by the applier);
    only the three masses are driver scalars.
    """
    words = _words(F.lower(F.col(text_col)))
    tok = (
        corpus.select(F.explode(words).alias("term"))
        .where(F.col("term") != "")
    )
    twords = _words(F.lower(F.col(target_text_col)))
    ttok = (
        target.select(F.explode(twords).alias("term"))
        .where(F.col("term") != "")
    )
    cf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    tf = ttok.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    stats = cf.join(tf, "term", "full_outer").select(
        "term",
        F.coalesce("cf", F.lit(0)).alias("cf"),
        F.coalesce("tf", F.lit(0)).alias("tf"),
    )
    # Materialize ONCE: the masses collect below and every downstream
    # apply (batch scoring join, each streaming micro-batch) reuse the
    # checkpointed table instead of re-tokenizing both corpora per
    # use; blocks are reclaimed by the ContextCleaner when the
    # reference drops (the connected_components rule).
    stats = stats.localCheckpoint(eager=True)
    masses = stats.agg(
        F.sum("cf"), F.sum("tf"), F.count(F.lit(1))
    ).collect()[0]
    # token-less corpus+target -> SUM over zero rows is NULL; the
    # calibration is legitimately all-zero masses and the applier
    # degrades to NULL scores, matching the monolithic op's behavior
    return (stats, int(masses[0] or 0), int(masses[1] or 0),
            int(masses[2] or 0))


def importance_score_with_stats(
    df: DataFrame,
    stats: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n_src: int,
    n_tgt: int,
    vocab: int,
    out_col: str = "importance",
) -> DataFrame:
    """Apply a FROZEN DSIR calibration (from `importance_stats`) to
    score documents. A term NOT in the frozen union vocabulary
    contributes c * ln(dsrc/dtgt) (cf = tf = 0 under add-one
    smoothing) — new words are neither evidence for nor against the
    target beyond the mass ratio. Every score depends only on (the
    doc's own tokens, the frozen stats), so per-micro-batch
    application inside foreachBatch equals the batch result — the
    streaming form `importance_score_stream` relies on exactly this.

    Scale shape: explode -> per-(doc, term) count -> LEFT join the
    vocab-bounded stats table (AQE broadcasts when it fits) -> one
    doc-keyed agg whose addends fold over the SORTED term list
    (engine-independent summation, the `unigram_logprob` trick).
    """
    dsrc = float(n_src + vocab)
    dtgt = float(n_tgt + vocab)
    words = _words(F.lower(F.col(text_col)))
    tok = (
        df.select(id_col, F.explode(words).alias("term"))
        .where(F.col("term") != "")
    )
    doc_tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("_c"))
    joined = (
        doc_tf.join(stats, "term", "left")
        .select(
            F.col(id_col),
            F.col("_c"),
            F.struct(
                "term",
                "_c",
                F.coalesce("cf", F.lit(0)).alias("_cf"),
                F.coalesce("tf", F.lit(0)).alias("_tf"),
            ).alias("_e"),
        )
    )
    per_doc = joined.groupBy(id_col).agg(
        F.sum("_c").alias("_n"),
        F.array_sort(F.collect_list("_e")).alias("_es"),
    )
    # logs stay JVM-side (F.log over literals, constant-folded by
    # Catalyst) so the doubles match DuckDB's ln() the way the proven
    # unigram twins do — never Python's math.log
    acc = F.aggregate(
        F.col("_es"),
        F.lit(0.0),
        lambda a, e: a
        + e["_c"].cast("double")
        * (
            (F.log(e["_tf"].cast("double") + 1.0) - F.log(F.lit(dtgt)))
            - (F.log(e["_cf"].cast("double") + 1.0) - F.log(F.lit(dsrc)))
        ),
    )
    out = per_doc.select(
        F.col(id_col),
        F.col("_n").cast("bigint").alias("n_tokens"),
        F.round(acc / F.col("_n").cast("double"), 4).alias(out_col),
    )
    return (
        df.select(id_col).join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            out_col,
        )
    )


def token_length_histogram(df: DataFrame, *, text_col: str,
                           bucket_width: int = 50) -> DataFrame:
    """Corpus token-length histogram: docs bucketed by BPE-ish token
    count into fixed-width bins — the standard corpus-audit view
    (sequence-length planning, truncation-rate estimates). One
    narrow projection + one tiny groupBy(bucket) — the shuffle
    carries one row per bucket per partition."""
    counted = token_count(df, text_col=text_col, out_col="_nt")
    bucket = (F.col("_nt") / bucket_width).cast("bigint") * bucket_width
    return (
        counted.groupBy(bucket.alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("_nt").alias("min_tokens"),
            F.max("_nt").alias("max_tokens"),
        )
    )


def gopher_rules(df: DataFrame, *, text_col: str) -> DataFrame:
    """Gopher rule-based quality flags (Rae et al. 2021, table A1 —
    the public rule set): per document,

    * n_words, mean_word_len — basic size signals;
    * flag_len — word count outside [50, 100_000];
    * flag_word_len — mean word length outside [3, 10];
    * flag_symbol — (# or ...) to-word ratio > 0.1;
    * flag_bullet / flag_ellipsis — >90% lines start with a bullet /
      >30% end with an ellipsis;
    * keep — passes every rule.

    All narrow column expressions (no shuffle, codegen'd); thresholds
    are the published constants, exposed as output columns rather than
    config so the oracle replays them verbatim.
    """
    words = _words(F.col(text_col))
    n_words = F.size(words)
    nw = n_words.cast("double")
    mean_wl = F.when(
        n_words > 0,
        F.length(F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")),
                                  r"\s+", "")) / nw,
    ).otherwise(F.lit(0.0))
    txt = F.coalesce(F.col(text_col), F.lit(""))
    n_hash = F.length(txt) - F.length(F.regexp_replace(txt, r"#", ""))
    n_ell = F.regexp_count(txt, F.lit(r"\.\.\."))
    sym_ratio = F.when(n_words > 0, (n_hash + n_ell) / nw).otherwise(F.lit(0.0))
    lines = F.split(txt, "\n", -1)
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
    n_ell_end = F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.\s*$")))
    flag_len = (n_words < 50) | (n_words > 100_000)
    flag_word_len = (mean_wl < 3.0) | (mean_wl > 10.0)
    flag_symbol = sym_ratio > 0.1
    flag_bullet = (n_bullet / n_lines.cast("double")) > 0.9
    flag_ellipsis = (n_ell_end / n_lines.cast("double")) > 0.3
    return df.select(
        "*",
        n_words.cast("bigint").alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        flag_len.alias("flag_len"),
        flag_word_len.alias("flag_word_len"),
        flag_symbol.alias("flag_symbol"),
        flag_bullet.alias("flag_bullet"),
        flag_ellipsis.alias("flag_ellipsis"),
        (~(flag_len | flag_word_len | flag_symbol | flag_bullet
           | flag_ellipsis)).alias("keep"),
    )


def ngram_novelty(df: DataFrame, *, id_col: str, text_col: str,
                  n: int = 3) -> DataFrame:
    """Per-document n-gram novelty: the fraction of the doc's DISTINCT
    word n-grams whose FIRST corpus occurrence (minimum id over all
    docs containing the gram) is this doc — the CCNet-style ordered
    novelty signal: boilerplate-heavy late documents score near 0,
    genuinely new content near 1. Docs too short to form a gram score
    1.0 (nothing seen before, nothing copied).

    Shape: distinct (doc, gram) rows -> one groupBy(gram) for the
    first-occurrence id (map-side combine; shuffle carries one row per
    distinct gram) -> re-join on gram -> doc-keyed ratio. Both
    shuffles are gram/doc-keyed — no all-pairs anything.
    """
    from awskinesisconsumer_spark.operators.dedup import shingle_rows

    grams = shingle_rows(
        df.select(id_col, text_col), id_col=id_col, text_col=text_col,
        n=n, distinct=True,
    )
    first = grams.groupBy("shingle").agg(F.min(id_col).alias("_first"))
    scored = (
        grams.join(first, "shingle")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("_first") == F.col(id_col)).cast("long"))
            .alias("_novel"),
        )
        .select(
            id_col, "n_grams",
            F.round(F.col("_novel") / F.col("n_grams"), 4).alias("novelty"),
        )
    )
    return (
        df.select(id_col).join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("novelty", F.lit(1.0)).alias("novelty"),
        )
    )


def collocations_pmi(df: DataFrame, *, text_col: str,
                     min_count: int = 5, k: int = 50) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information:
    PMI(x, y) = ln( P(x y) / (P(x) P(y)) ) with bigram probability
    over the corpus bigram total and unigram probabilities over the
    corpus token total. Bigrams never cross document boundaries.

    Shape: one tokenize pass feeds BOTH the unigram and the bigram
    counts (the bigram list is a zip of the word array with itself
    shifted — no second scan); each count is a hash aggregate with
    map-side combine whose shuffle carries one row per distinct
    (bi)gram — Zipf-bounded, corpus-size-independent. The unigram
    table joins back to bigram counts twice on the word key; the
    rare-gram floor (`min_count`) prunes the bigram side before the
    joins, and the final top-k is the standard two-level rank. PMI
    rounds to 4 dp so cross-engine double noise cannot flip the hash.
    """
    words = _words(F.col(text_col))
    toks = df.select(words.alias("_ws")).where(F.size("_ws") > 0)

    uni = (
        toks.select(F.explode("_ws").alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    )
    bi = (
        toks.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("_ws"), 1, F.size("_ws") - 1),
                    F.slice(F.col("_ws"), 2, F.size("_ws") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= min_count)
    )

    totals = (
        toks.agg(
            F.sum(F.size("_ws")).alias("n_tok"),
            F.sum(F.size("_ws") - 1).alias("n_bi"),
        )
    )
    scored = (
        bi.join(F.broadcast(totals))
        .join(uni.withColumnRenamed("w", "w1")
                 .withColumnRenamed("c_w", "c_x"), "w1")
        .join(uni.withColumnRenamed("w", "w2")
                 .withColumnRenamed("c_w", "c_y"), "w2")
        .select(
            "w1", "w2", "c_xy",
            F.round(
                F.log(
                    (F.col("c_xy") / F.col("n_bi"))
                    / ((F.col("c_x") / F.col("n_tok"))
                       * (F.col("c_y") / F.col("n_tok")))
                ),
                4,
            ).alias("pmi"),
        )
    )
    # Two-level top-k: a salted partial rank bounds every partition's
    # contribution to k rows before the k*64-row global rank — the
    # scored set is Zipf-bounded but still corpus-wide, so the global
    # window never sees more than k rows per salt bucket.
    from pyspark.sql import Window

    order = (F.col("pmi").desc(), F.col("w1"), F.col("w2"))
    wp = Window.partitionBy(
        F.pmod(F.xxhash64("w1", "w2"), F.lit(64))
    ).orderBy(*order)
    wg = Window.orderBy(*order)
    return (
        scored.withColumn("_prn", F.row_number().over(wp))
        .where(F.col("_prn") <= k)
        .withColumn("rnk", F.row_number().over(wg).cast("long"))
        .where(F.col("rnk") <= k)
        .drop("_prn")
    )


def bpe_train_merges(
    df: DataFrame,
    *,
    text_col: str,
    n_merges: int = 10,
    driver_vocab_limit: int = 100_000,
) -> "DataFrame":
    """Greedy byte-pair-encoding merge training with a FIXED merge
    count — the tokenizer-training step of an LLM data pipeline,
    in the standard vocab-weighted formulation: ONE corpus scan
    builds the (word, freq) vocabulary, and every merge iteration
    runs on that Zipf-bounded table, never the corpus. Each
    iteration: adjacent-pair counts weighted by word frequency (hash
    agg, map-side combine), argmax with a deterministic
    (count DESC, left, right) tie-break (TakeOrdered — per-partition
    top-1s merged on the driver, no sort shuffle), then the merge
    applied to the token arrays via an Arrow-batched pandas UDF
    (short per-word python loop; the vocab table is the small side
    by construction).

    Strategy is ADAPTIVE on the measured vocab size, the same
    small-side decision as a broadcast join:

    * vocab <= `driver_vocab_limit` rows (one corpus-scan count
      decides): the merge loop runs DRIVER-SIDE on the collected
      (freq, toks) table — identical arithmetic and tie-breaks, zero
      per-round Spark jobs. A 100k-word vocab is a few MB; per-round
      cluster scheduling (~2 jobs x round, Python-worker spin-up for
      the Arrow UDF) costs ~1-2 s/round regardless of data size, so
      below the threshold the driver loop wins by >10x and the ONLY
      data-sized cost is the single corpus scan.
    * larger vocabs: distributed rounds. The working vocab is
      persisted LAZILY and swapped per round — round k's argmax
      materializes vocab_k into the cache as a side effect, and
      vocab_{k-1} is released only after that, so nothing is
      recomputed from the corpus and no eager count() jobs run.
      Shuffle partitions are clamped to 16 for the duration (saved /
      restored): every post-scan stage runs on the Zipf-bounded
      vocab (even a billion-doc corpus has ~millions of distinct
      words), so a 200-partition default would pay ~12x
      task-scheduling overhead per round for nothing.

    Returns the merge table (rank, left, right, pair_count) — the
    artifact a tokenizer ships. End-of-word is marked with '</w>' so
    merges never cross word boundaries (classic Sennrich-style BPE).
    Gated as `ext-bpe-train` with a recursive-CTE DuckDB twin; the
    apply step pairs with `bpe_encode_corpus`.
    """
    import pandas as pd
    from pyspark.sql.types import ArrayType, StringType

    spark = df.sparkSession
    vocab = (
        df.select(_words(F.col(text_col)).alias("_ws"))
        .select(F.explode("_ws").alias("_w"))
        .where(F.col("_w") != "")
        .groupBy("_w").agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "freq",
            F.concat(
                F.split(F.col("_w"), ""),
                F.array(F.lit("</w>")),
            ).alias("toks"),
        )
        .persist()
    )

    merges = []
    if vocab.count() <= driver_vocab_limit:
        items = [
            (int(r["freq"]), list(r["toks"])) for r in vocab.collect()
        ]
        vocab.unpersist()
        for rank in range(n_merges):
            counts: dict[tuple[str, str], int] = {}
            for freq, ts in items:
                for a, b in zip(ts, ts[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + freq
            if not counts:
                break
            # (count DESC, left, right) — same total order as the
            # distributed argmax and the DuckDB twin.
            (left, right), c = min(
                counts.items(),
                key=lambda kv: (-kv[1], kv[0][0], kv[0][1]),
            )
            if c < 2:
                break
            merges.append((rank, left, right, int(c)))
            items = [
                (freq, _apply_merge(ts, left, right)) for freq, ts in items
            ]
        return spark.createDataFrame(
            merges, "rank long, left string, right string, pair_count long"
        )

    prev = None  # previous round's vocab, released once the current
    # round's argmax has materialized `vocab` into the cache
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        for rank in range(n_merges):
            pairs = (
                vocab.select(
                    "freq",
                    F.explode(
                        F.zip_with(
                            F.slice(F.col("toks"), 1, F.size("toks") - 1),
                            F.slice(F.col("toks"), 2, F.size("toks") - 1),
                            lambda a, b: F.struct(
                                a.alias("l"), b.alias("r")
                            ),
                        )
                    ).alias("p"),
                )
                .groupBy("p.l", "p.r")
                .agg(F.sum("freq").alias("c"))
            )
            top = pairs.orderBy(
                F.col("c").desc(), F.col("l"), F.col("r")
            ).limit(1).collect()
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top or top[0]["c"] < 2:
                break
            left, right = top[0]["l"], top[0]["r"]
            merges.append((rank, left, right, int(top[0]["c"])))

            # Factory scope: the UDF executes LAZILY (next round's
            # argmax, or a cache-eviction recompute), so the merge
            # pair must be bound in its own closure cell — capturing
            # the loop variables directly would resolve to a LATER
            # round's pair at execution time.
            def _make_apply(left: str, right: str):
                @F.pandas_udf(ArrayType(StringType()))
                def _apply(toks: pd.Series) -> pd.Series:
                    return toks.map(
                        lambda ts: _apply_merge(list(ts), left, right)
                    )
                return _apply

            nxt = vocab.select(
                "freq", _make_apply(left, right)("toks").alias("toks")
            ).persist()
            prev, vocab = vocab, nxt
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        if prev is not None:
            prev.unpersist()
        vocab.unpersist()
    return spark.createDataFrame(
        merges, "rank long, left string, right string, pair_count long"
    )


import re as _re_norm
import unicodedata as _ud_norm

_NORM_ZW = _re_norm.compile("[​‌‍﻿]")
_NORM_CTL = _re_norm.compile("[\x00-\x08\x0b-\x1f\x7f]")
_NORM_WS = _re_norm.compile("[ \t]+")
_NORM_EOL = _re_norm.compile(" \n")


def _normalize_string(s: str) -> str:
    """normalize_text's per-string kernel, module-level so the
    property tests exercise the exact production code (NFC ->
    zero-width strip -> control strip -> space/tab collapse -> trim).
    Trim uses an explicit charset: after the strips the only
    whitespace left is space/newline, and an engine-portable trim
    must not depend on Python's unicode-aware str.strip()."""
    s = _ud_norm.normalize("NFC", s)
    s = _NORM_ZW.sub("", s)
    s = _NORM_CTL.sub("", s)
    s = _NORM_WS.sub(" ", s)
    s = _NORM_EOL.sub("\n", s)
    return s.strip(" \n")


def normalize_text(
    df: DataFrame,
    *,
    text_col: str,
    out_col: str = "text_norm",
    changed_col: str = "norm_changed",
) -> DataFrame:
    """Unicode + whitespace hygiene — the normalization pass every
    web-scale corpus runs before dedup/tokenization, so that visually
    identical documents (NFC vs NFD accents, zero-width joiners,
    stray control bytes, ragged spacing) hash identically downstream:

      1. Unicode NFC (canonical composition),
      2. strip zero-width characters (ZWSP/ZWNJ/ZWJ/BOM),
      3. strip C0/DEL control characters except tab + newline,
      4. collapse runs of spaces/tabs to one space, trim line ends,
      5. trim the document.

    NULL stays NULL; `changed_col` flags rows the pass altered (the
    audit a curation pipeline logs). Implemented as ONE Arrow-batched
    pandas UDF (unicodedata lives Python-side — the portable stand-in
    for an ICU JVM UDF at 100 TB): linear, map-only, no shuffle; the
    whole transform is a projection over the scan.
    """
    import pandas as pd
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _norm(col: pd.Series) -> pd.Series:
        return col.map(_normalize_string, na_action="ignore")

    # NOT fanned out (r16 optimization round): the interleaved on/off
    # A/B measured the size-gated fan-out a net LOSS here (0.52s ->
    # 0.71s) — NFC normalization per doc is too cheap to pay the
    # exchange at gate SF.
    out = df.withColumn(out_col, _norm(F.col(text_col)))
    return out.withColumn(
        changed_col,
        F.when(
            F.col(text_col).isNotNull(),
            F.col(out_col) != F.col(text_col),
        ),
    )


def vocab_coverage(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    vocab_size: int = 1000,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Vocabulary-coverage / OOV-rate audit: per document, the count
    and fraction of word tokens NOT covered by a vocabulary — the
    check a tokenizer build runs to size its vocab (coverage vs table
    size) and an ingest monitor runs to spot out-of-domain batches
    (OOV spikes mean the incoming data does not look like the corpus
    the vocab was built from).

    `vocab` defaults to the corpus' own top-`vocab_size` terms
    (`top_terms` — count DESC, term ASC deterministic ranking); pass a
    frozen vocab DataFrame (one `term` column) to audit new data
    against a trained tokenizer's word list instead.

    Shape: one tokenize pass; per-(doc, term) counts shuffle one row
    per distinct term per doc; membership is a LEFT join against the
    vocab, which is vocab_size rows — broadcast, so the probe adds no
    exchange. Per-doc rollup is one keyed aggregate. Zero-token docs
    report (0, 0, NULL): no tokens is "no evidence", not "all OOV".

    Returns (id_col, n_tokens, n_oov, oov_rate) with oov_rate rounded
    to 6 dp for cross-engine hash agreement.
    """
    if vocab is None:
        vocab = top_terms(df, text_col=text_col, k=vocab_size)
    vocab_terms = vocab.select("term").distinct().withColumn(
        "_in_vocab", F.lit(True)
    )
    words = _words(F.lower(F.col(text_col)))
    tok = (
        df.select(id_col, F.explode(words).alias("term"))
        .where(F.col("term") != "")
    )
    doc_tf = tok.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("_c")
    )
    flagged = doc_tf.join(F.broadcast(vocab_terms), "term", "left")
    per_doc = flagged.groupBy(id_col).agg(
        F.sum("_c").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("_in_vocab").isNull(), F.col("_c"))
              .otherwise(F.lit(0))).cast("bigint").alias("n_oov"),
    )
    return (
        df.select(id_col).join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            F.round(
                F.when(
                    F.coalesce("n_tokens", F.lit(0)) > 0,
                    F.coalesce("n_oov", F.lit(0)).cast("double")
                    / F.col("n_tokens").cast("double"),
                ),
                6,
            ).alias("oov_rate"),
        )
    )


def corpus_drift(
    left: DataFrame,
    right: DataFrame,
    *,
    text_col: str,
) -> DataFrame:
    """Term-distribution drift between two corpus snapshots (last
    week's crawl vs this week's, corpus vs incoming batch): add-one
    smoothed unigram distributions on the UNION vocabulary, with each
    term's KL(P||Q) and Jensen-Shannon contribution — the ingest-time
    distribution monitor that catches a scraper gone wrong or a
    domain-mix shift before it trains into a model. Total divergence
    is SUM(kl_micro)/1e6 (resp. js) over the returned table; the top
    |contribution| terms name WHAT drifted.

    Shape: one tokenize+count pass per side (term tables are
    Zipf-bounded — millions of rows at 100 TB, never corpus-sized), a
    term-keyed FULL OUTER join, and one broadcast one-row totals join
    for the smoothing scalars. No per-row Python, no global sort.

    Determinism: probabilities derive from exact integer counts;
    contributions are scaled to MICRO-nats and rounded to 4 dp
    (resolution ~1e-10 nats) so a SQL twin replaying ln() on the same
    exact-count-derived doubles hashes identically — the same
    margin-of-rounding contract as `unigram_logprob`.

    Returns (term, c_left, c_right, p_left_micro, p_right_micro,
    kl_micro, js_micro).
    """
    cl = term_counts(left, text_col=text_col, out_col="_cl")
    cr = term_counts(right, text_col=text_col, out_col="_cr")
    return drift_from_term_counts(cl, cr)


def term_counts(
    df: DataFrame, *, text_col: str, out_col: str = "c"
) -> DataFrame:
    """Corpus term-frequency table (term, out_col) with the engine's
    standard lowercased-whitespace tokenization — the Zipf-bounded
    sketch `corpus_drift` and its streaming form score from."""
    words = _words(F.lower(F.col(text_col)))
    return (
        df.select(F.explode(words).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term").agg(F.count(F.lit(1)).alias(out_col))
    )


def drift_from_term_counts(cl: DataFrame, cr: DataFrame) -> DataFrame:
    """`corpus_drift`'s scoring core over two pre-built term-count
    tables (columns (term, _cl) and (term, _cr)) — shared by the
    batch operator and the streaming monitor, which holds the right
    side's counts as its running state. Same output contract as
    `corpus_drift`."""
    terms = cl.join(cr, "term", "full_outer").select(
        "term",
        F.coalesce("_cl", F.lit(0)).alias("c_left"),
        F.coalesce("_cr", F.lit(0)).alias("c_right"),
    )
    totals = terms.agg(
        F.sum("c_left").alias("_nl"),
        F.sum("c_right").alias("_nr"),
        F.count(F.lit(1)).alias("_v"),
    )
    p = (F.col("c_left") + 1).cast("double") / (
        F.col("_nl") + F.col("_v")
    ).cast("double")
    q = (F.col("c_right") + 1).cast("double") / (
        F.col("_nr") + F.col("_v")
    ).cast("double")
    withpq = (
        terms.crossJoin(F.broadcast(totals))
        .withColumn("_p", p)
        .withColumn("_q", q)
        .withColumn("_m", (F.col("_p") + F.col("_q")) / F.lit(2.0))
    )
    micro = F.lit(1_000_000.0)
    return withpq.select(
        "term", "c_left", "c_right",
        F.round(F.col("_p") * micro, 4).alias("p_left_micro"),
        F.round(F.col("_q") * micro, 4).alias("p_right_micro"),
        F.round(
            F.col("_p") * (F.log("_p") - F.log("_q")) * micro, 4
        ).alias("kl_micro"),
        F.round(
            (F.col("_p") * (F.log("_p") - F.log("_m"))
             + F.col("_q") * (F.log("_q") - F.log("_m"))) / F.lit(2.0)
            * micro,
            4,
        ).alias("js_micro"),
    )


def grouped_drift(
    left: DataFrame,
    right: DataFrame,
    *,
    group_col: str,
    text_col: str,
) -> DataFrame:
    """PER-GROUP term-distribution drift between two corpus snapshots
    — the monitoring granularity `corpus_drift` lacks: a global KL
    that moved tells you THAT something changed; the per-source
    (per-domain, per-language) breakdown tells you WHERE. Each group
    gets its own add-one-smoothed distributions over the GROUP's
    union vocabulary, so a group's divergence is self-contained and
    comparable across snapshots (a group absent from one side
    diverges maximally, by construction — every term sits at count 0
    on that side).

    Returns per-(group, term) rows: (group, term, c_left, c_right,
    p_left_micro, p_right_micro, kl_micro, js_micro) — same contract
    as `corpus_drift` with the group key prefixed; per-group totals
    are SUM(kl_micro)/1e6 over the group's rows (a trivial follow-up
    rollup; kept out of the operator so the gate hashes exact per-term
    values rather than order-dependent double sums).

    Scale shape: one tokenize+count pass per side keyed by
    (group, term) — still Zipf-bounded per group; a composite-keyed
    FULL OUTER join; per-group smoothing masses come from one
    group-keyed agg (group-table-sized) joined back broadcast. No
    per-row Python, no global sort.
    """
    return grouped_drift_from_counts(
        grouped_term_counts(left, group_col=group_col,
                            text_col=text_col, out_col="_cl"),
        grouped_term_counts(right, group_col=group_col,
                            text_col=text_col, out_col="_cr"),
    )


def grouped_term_counts(
    df: DataFrame, *, group_col: str, text_col: str, out_col: str = "c"
) -> DataFrame:
    """(group, term, out_col) count table — the composite-keyed
    sketch `grouped_drift` and its streaming monitor score from.
    NULL group keys become the named "(null)" bucket: equi-joins
    never match NULL keys, so without the coalesce every
    NULL-group document would silently VANISH from the drift report
    — a monitoring blind spot exactly where crawl metadata is
    dirtiest."""
    words = _words(F.lower(F.col(text_col)))
    return (
        df.select(
            F.coalesce(F.col(group_col).cast("string"), F.lit("(null)"))
            .alias("group"),
            F.explode(words).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("group", "term")
        .agg(F.count(F.lit(1)).alias(out_col))
    )


def grouped_drift_from_counts(cl: DataFrame, cr: DataFrame) -> DataFrame:
    """`grouped_drift`'s scoring core over two pre-built
    (group, term) count tables (columns (group, term, _cl) /
    (group, term, _cr)) — shared by the batch operator and the
    streaming monitor, which holds the right side's counts as its
    running state. Same output contract as `grouped_drift`."""
    terms = cl.join(cr, ["group", "term"], "full_outer").select(
        "group", "term",
        F.coalesce("_cl", F.lit(0)).alias("c_left"),
        F.coalesce("_cr", F.lit(0)).alias("c_right"),
    )
    gtotals = terms.groupBy("group").agg(
        F.sum("c_left").alias("_nl"),
        F.sum("c_right").alias("_nr"),
        F.count(F.lit(1)).alias("_v"),
    )
    p = (F.col("c_left") + 1).cast("double") / (
        F.col("_nl") + F.col("_v")
    ).cast("double")
    q = (F.col("c_right") + 1).cast("double") / (
        F.col("_nr") + F.col("_v")
    ).cast("double")
    withpq = (
        terms.join(F.broadcast(gtotals), "group")
        .withColumn("_p", p)
        .withColumn("_q", q)
        .withColumn("_m", (F.col("_p") + F.col("_q")) / F.lit(2.0))
    )
    micro = F.lit(1_000_000.0)
    return withpq.select(
        "group", "term", "c_left", "c_right",
        F.round(F.col("_p") * micro, 4).alias("p_left_micro"),
        F.round(F.col("_q") * micro, 4).alias("p_right_micro"),
        F.round(
            F.col("_p") * (F.log("_p") - F.log("_q")) * micro, 4
        ).alias("kl_micro"),
        F.round(
            (F.col("_p") * (F.log("_p") - F.log("_m"))
             + F.col("_q") * (F.log("_q") - F.log("_m"))) / F.lit(2.0)
            * micro,
            4,
        ).alias("js_micro"),
    )


# HTML tag-strip regexes, shared verbatim with the DuckDB oracle twin
# (inline (?i)/(?s) flags + explicit whitespace class keep Java regex
# and RE2 behavior identical; Java \s includes \x0B, RE2's does not,
# so the collapse class is spelled out).
_HTML_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script>"
_HTML_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style>"
_HTML_COMMENT_RE = r"(?s)<!--.*?-->"
_HTML_TAG_RE = r"(?s)<[^>]*>"
_HTML_WS_RE = r"[ \t\r\n\f]+"
# Entity decode pairs, applied IN ORDER (&amp; strictly last so
# "&amp;lt;" decodes to the literal text "&lt;", not to "<").
_HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
)


def strip_html(
    df: DataFrame,
    *,
    text_col: str,
    out_col: str = "text_clean",
    flag_col: str = "had_html",
) -> DataFrame:
    """HTML boilerplate removal — the first transform a web-crawl
    corpus runs before any quality/dedup stage (the reference consumes
    already-demuxed media, but a text-training pipeline's raw input is
    markup): drop <script>/<style> payloads wholesale (their content
    is code, not prose), drop comments, strip remaining tags, decode
    the six dominant entities (&amp; last, so double-escaped text
    stays text), collapse whitespace, trim.

    NULL stays NULL; `flag_col` audits which rows carried markup
    (tag-shaped match on the RAW text). Entirely built-in
    regexp_replace/replace over one projection: map-only, no shuffle,
    no Python — the whole pass stays inside whole-stage codegen, and
    at 100 TB it fuses with the scan (a projection over parquet, zero
    exchange). The same regexes run verbatim in the DuckDB twin
    (RE2/Java-portable subset: inline flags, lazy quantifiers,
    explicit whitespace class).
    """
    c = F.col(text_col)
    cleaned = F.regexp_replace(c, _HTML_SCRIPT_RE, " ")
    cleaned = F.regexp_replace(cleaned, _HTML_STYLE_RE, " ")
    cleaned = F.regexp_replace(cleaned, _HTML_COMMENT_RE, " ")
    cleaned = F.regexp_replace(cleaned, _HTML_TAG_RE, " ")
    for ent, rep in _HTML_ENTITIES:
        cleaned = F.replace(cleaned, F.lit(ent), F.lit(rep))
    cleaned = F.trim(F.regexp_replace(cleaned, _HTML_WS_RE, " "))
    return df.withColumn(out_col, cleaned).withColumn(
        flag_col,
        F.when(c.isNotNull(), c.rlike(_HTML_TAG_RE)),
    )


def bigram_perplexity(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    out_col: str = "avg_logprob",
) -> DataFrame:
    """Per-document average bigram log-probability under the corpus'
    own add-one-smoothed bigram LM — the CCNet-style fluency score one
    tier above `unigram_logprob`: keyword-stuffed or shuffled-word
    documents score near the unigram baseline, while natural word
    ORDER (which unigrams cannot see) raises p(w2|w1).

      ln p(w2|w1) = ln(c(w1,w2) + 1) - ln(c(w1) + V)

    Shapes, scan to result: bigram formation is a pure ARRAY
    expression (arrays_zip of the word list against its own tail) —
    map-only, no window, no per-doc shuffle, unlike the lag() form
    which would shuffle the full token stream by doc. The corpus
    bigram/unigram tables are groupBy counts with map-side combine,
    Zipf-bounded (term-table-sized, not corpus-sized); the per-(doc,
    bigram) table joins them on the bigram/first-word keys (AQE
    broadcasts when they fit). Determinism: the per-doc mean folds
    addends over the SORTED bigram list (collect_list + array_sort +
    aggregate), the same engine-independent-summation trick as
    `unigram_logprob`/`word_entropy`; emitted scores round to 4 dp.

    Docs with fewer than two words have no bigrams -> NULL score,
    n_bigrams = 0 ("no evidence", not "improbable").
    """
    words = _words(F.lower(F.col(text_col)))
    pairs = df.select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
                F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
            )
        ).alias("_bg"),
    ).select(
        id_col,
        F.col("_bg")["0"].alias("w1"),
        F.col("_bg")["1"].alias("w2"),
    ).where((F.col("w1") != "") & (F.col("w2") != ""))

    doc_bg = pairs.groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).alias("_c")
    )
    corpus_bg = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("_c12")
    )
    corpus_uni = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("_c1"))
    vocab = pairs.select(
        F.explode(F.array("w1", "w2")).alias("_w")
    ).agg(F.count_distinct("_w").alias("_v"))

    joined = (
        doc_bg.join(corpus_bg, ["w1", "w2"])
        .join(corpus_uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.col("_c"),
            F.struct("w1", "w2", "_c", "_c12", "_c1").alias("_e"),
            F.col("_v").cast("double").alias("_v"),
        )
    )
    per_doc = joined.groupBy(id_col).agg(
        F.sum("_c").alias("_n"),
        F.array_sort(F.collect_list("_e")).alias("_es"),
        F.first("_v").alias("_v"),
    )
    acc = F.aggregate(
        F.col("_es"),
        F.lit(0.0),
        lambda a, e: a
        + e["_c"].cast("double")
        * (
            F.log(e["_c12"].cast("double") + 1.0)
            - F.log(e["_c1"].cast("double") + F.col("_v"))
        ),
    )
    out = per_doc.select(
        F.col(id_col),
        F.col("_n").cast("bigint").alias("n_bigrams"),
        F.round(acc / F.col("_n").cast("double"), 4).alias(out_col),
    )
    return (
        df.select(id_col).join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            out_col,
        )
    )


# Sentence-boundary marker: terminal punctuation followed by
# whitespace. RE2 has no lookbehind, so both engines mark boundaries
# with a capture-group replace (keeping the punctuation attached to
# its sentence) and split on the marker — the portable formulation.
_SENT_BOUNDARY_RE = r"([.!?])[ \t\r\n\f]+"
_SENT_MARKER = "\x1e"


def split_sentences(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Sentence segmentation: one row per sentence with its 0-based
    index — the granularity sentence-level dedup, decontamination,
    and sequence-boundary-aware packing operate at (a benchmark
    answer leaks as a SENTENCE, not as a whole document; CCNet-style
    filtering drops repeated sentences, not repeated docs).

    Regex-rule segmentation (terminal [.!?] + whitespace), the
    deterministic 95% answer; an ML segmenter slots into the same
    explode shape. Terminal punctuation stays attached to its
    sentence; empty fragments are dropped; a document with no
    boundary yields itself as sentence 0; NULL/empty text yields no
    rows. \\x1e (ASCII record separator) is RESERVED as the internal
    boundary marker and is stripped from input text up front.

    Map-only: one regexp_replace (boundary -> marker, no lookbehind
    so the same rule runs on RE2/DuckDB) + split + posexplode — no
    shuffle, fuses with the scan. At 100 TB sentence explosion
    multiplies row count ~20-40x but each row is a short string; the
    downstream grouping key (sentence hash) is where the first
    exchange happens, exactly as in `dedup_lines`.
    """
    # \x1e (ASCII record separator) is the reserved boundary marker:
    # strip any pre-existing occurrence first so adversarial input
    # can't fabricate sentence splits (it is a control char with no
    # legitimate in-text meaning)
    marked = F.regexp_replace(
        F.regexp_replace(F.col(text_col), _SENT_MARKER, ""),
        _SENT_BOUNDARY_RE, "$1" + _SENT_MARKER,
    )
    parts = F.split(marked, _SENT_MARKER)
    # posexplode_OUTER (r16): stops InferFiltersFromGenerate from
    # restating the regexp_replace+split chain in a Filter below the
    # Generate; a NULL sentence row (empty/NULL parts) fails the
    # existing length(trim(sentence)) > 0 filter, so the row set is
    # identical.
    out = df.select(
        id_col, F.posexplode_outer(parts).alias("sent_idx", "sentence")
    )
    return (
        out.withColumn("sentence", F.trim("sentence"))
        .where(F.length("sentence") > 0)
        .select(
            id_col,
            F.col("sent_idx").cast("int").alias("sent_idx"),
            "sentence",
        )
    )


def tokenizer_fertility(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    group_col: str,
    merges: list,
) -> DataFrame:
    """Tokenizer fertility audit: BPE tokens per word, aggregated by
    `group_col` (language, source, domain) — the number a tokenizer
    choice is judged by: a fertility of 1.3 for English but 2.8 for
    an under-represented script means that script pays ~2x the
    sequence length (and compute) per word, the classic
    multilingual-tokenizer failure mode. Completes the tokenizer
    family: train (`bpe_train_merges`) -> encode
    (`bpe_encode_corpus`) -> coverage (`vocab_coverage`) ->
    fertility (this).

    Per group: n_docs, n_words, n_bpe_tokens, fertility (4 dp;
    NULL for an all-empty group — "no evidence"). Scale shape: the
    encode pass dominates and keeps its corpus-never-shuffled /
    Python-touches-distinct-words-only contract; this adds one
    map-side-combined agg over per-doc counts — group-table-sized
    output.
    """
    enc = bpe_encode_corpus(
        df, id_col=id_col, text_col=text_col, merges=merges
    )
    joined = df.select(id_col, group_col).join(enc, id_col)
    return joined.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
        F.round(
            F.when(
                F.sum("n_words") > 0,
                F.sum("n_bpe_tokens") / F.sum("n_words"),
            ),
            4,
        ).alias("fertility"),
    )
