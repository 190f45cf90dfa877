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


def cms_heavy_hitters(
    docs: DataFrame,
    *,
    text_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms1",
    hash_fn=xxhash64_col,
) -> DataFrame:
    """Top-k heavy-hitter terms by count-min estimate, with the exact
    count alongside (est >= exact always — CMS errs by overcounting).

    Candidates are the corpus' distinct terms with their exact counts
    (one groupBy — at 100 TB swap in any cheap candidate source, e.g.
    a per-partition top-m pre-filter; the sketch itself never needs
    candidates to be exact). Each candidate probes the sketch via a
    broadcast equi-join on (row, bucket); the estimate is the MIN
    across the depth rows. Ranking is deterministic: (estimate DESC,
    term ASC).
    """
    from pyspark.sql import Window

    words = F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))),
                    r"\s+")
    # persist: the tokenize+explode subtree feeds BOTH the sketch and
    # the candidate counts — uncached it would re-scan the corpus.
    tok = (
        docs.select(F.explode(words).alias("term"))
        .where(F.col("term") != "")
        .persist()
    )
    sketch = cms_build(
        tok, term_col="term", depth=depth, width=width, salt=salt,
        hash_fn=hash_fn,
    )
    cand = tok.groupBy("term").agg(F.count(F.lit(1)).alias("exact"))
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
    top = est.orderBy(F.col("cms_est").desc(), F.col("term")).limit(k)
    w = Window.orderBy(F.col("cms_est").desc(), F.col("term"))
    out = top.withColumn("rank", F.row_number().over(w)).select(
        "term", "cms_est", "exact", "rank"
    )
    from .caching import release_after

    return release_after(out, tok)
