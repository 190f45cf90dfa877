"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing = full query execution to a count-style action (foreach-noop
would skip result materialization; collect would bottleneck the driver
at larger SFs). Each query runs once after a shared session warmup.
"""

from __future__ import annotations

import json
import os
import time

from awskinesisconsumer_spark.session import get_spark

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline subset: the reference-pipeline ops + heaviest extension ops.
HEADLINE = [
    "agg-pricing-summary",
    "join-revenue-by-nation",
    "join-asof-tags",
    "join-asof-backward",
    "segment-fragments",
    "pivot-tag-assembly",
    "sample-throttle-time",
    "enqueue-bounded-retention",
    "demux-decode-explode",
    "ext-dedup-exact",
    "ext-text-stats",
    "ext-token-count",
    "ext-quality-score",
    "ext-fingerprint",
    "ext-similarity-knn",
    "ext-similarity-ivf",
    "ext-dedup-minhash",
    "ext-dedup-lines",
    "ext-dedup-cluster",
    "ext-quality-repetition",
    "ext-pii-redact",
    "ext-tfidf-terms",
    "ext-decontaminate",
    "ext-pack-sequences",
    "ext-prepare-corpus",
    "ext-sample-stratified",
    "ext-mixture-allocate",
    "ext-vocabulary",
    "ext-embedding-pool",
    "stream-asof-tags",
    # round 3 additions — totals across rounds are not comparable
    # 1:1 (headline set grew 30 -> 38, and round-3 testdata scales
    # documents 500 -> 5,000 and embeddings 500 -> 2,000 at sf0.1);
    # compare per-query times.
    "ext-bm25-rank",
    "ext-word-entropy",
    "ext-unigram-logprob",
    "ext-heavy-hitters-cms",
    "ext-cdc-compact",
    "ext-shard-assign",
    "agg-moving-avg",
    "agg-grouping-sets",
]


def main() -> None:
    spark = get_spark("awskinesisconsumer-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # Warm the JVM + parquet footers with a trivial action.
    qs["query-point-lookup"](spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
