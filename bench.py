"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE compact JSON line LAST on stdout: {"metric": ..., "value":
total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...}.

Driver parseability (the r4 lesson): the external driver records only
a bounded TAIL of stdout and parses the JSON from it — r4's single
fat line (75 queries, ~2.5 KB) overflowed the capture window and
recorded `"parsed": null`. So the machine-first line now carries the
total plus a fixed CORE subset of per-query timings (stable
round-over-round comparison anchor, sized well under the window), and
the FULL per-query map is written to BENCH_FULL_LOCAL.json (committed
per round) and echoed on stderr for humans.

Timing = full query execution to a noop write (foreach-noop would skip
result materialization; collect would bottleneck the driver at larger
SFs). Each query runs $SPARK_GRAFT_REPS times (default 3) and reports
the MEDIAN — r3 showed untouched queries drifting 1.3-1.7x round over
round from single-shot timing in a shared JVM (JIT/GC load from the
growing harness), so a single sample is noise, not signal. A GC hint
runs before each query's first rep to decouple queries from each
other's heap debris.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from awskinesisconsumer_spark.session import get_spark

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))
FULL_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_FULL_LOCAL.json")

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
    # round 4 additions (38 -> 42): PQ trains 2 Lloyd rounds before
    # encode+ADC; restart-resume runs two checkpointed stream phases.
    "ext-similarity-pq",
    "ext-embedding-quantize",
    "ext-sequence-build",
    "stream-restart-resume",
    # round 4 additions, second batch (42 -> 47)
    "ext-chunk-text",
    "ext-bloom-prefilter",
    "ext-zorder-layout",
    "agg-topn-per-group",
    "stream-sliding-agg",
    "ext-length-buckets",
    "stream-enrich-static",
    "stream-join-interval",
    # round 4 additions, third batch (47 -> 52)
    "join-shipping-priority",
    "join-large-orders",
    "agg-skyline-2d",
    "ext-collocations-pmi",
    "ext-knn-join",
    "ext-pagerank-dups",
    "agg-conversion-funnel",
    "ext-anomaly-zscore",
    "ext-scd2-versions",
    "ext-ann-recall",
    "sink-bucketed-join",
    "agg-retention-cohorts",
    "stream-scd2",
    "ext-hll-merge",
    "join-top-supplier",
    "stream-hll-distinct",
    "ext-sample-weighted",
    "ext-embedding-dim-stats",
    "ext-mixture-temperature",
    "stream-backpressure-multibatch",
    "sink-manifest-commit",
    "agg-forecast-revenue",
    "join-late-orders-exists",
    "stream-manifest-sink",
    "join-asof-nearest",
    # round 5 additions: the registered banked four + pause/resume
    # lifecycle artifact (two checkpointed phases by construction).
    "ext-dedup-incremental",
    "ext-winsorize",
    "ext-scd2-asof",
    "ext-bpe-train",
    "stream-pause-resume",
    "sink-memory-bounded",
    # round 6 additions: the registered banked five (the streaming
    # dedup runs a real 3-batch file stream by construction).
    "ext-bpe-encode",
    "ext-snapshot-diff",
    "ext-domain-cap",
    "ext-semantic-decontaminate",
    "stream-dedup-incremental",
    # round 7 additions: the registered banked four (both streaming
    # entries run real 3-batch file streams by construction).
    "stream-semantic-decontaminate",
    "stream-domain-cap",
    "ext-quality-blend",
    "ext-normalize-text",
    # round 8 additions: the registered banked thirteen (the codec
    # entries synthesize fixed-size payload sets; compact-files and
    # sink-png-files do real file-system work by construction; both
    # streaming entries run real 3-batch file streams).
    "ext-multimodal-wav",
    "ext-multimodal-png",
    "ext-tokenize-pack",
    "ext-validate-expectations",
    "ext-compact-files",
    "ext-vocab-coverage",
    "ext-corpus-drift",
    "ext-domain-cap-topk",
    "ext-dedup-span-removal",
    "ext-curate-corpus",
    "sink-png-files",
    "stream-corpus-drift",
    "stream-vocab-coverage",
    "scan-element-callback",
    # round 8 second wave
    "ext-audio-resample",
    "ext-cdc-chunk-text",
    "ext-frame-sample",
    "ext-dataset-card",
    "ext-html-strip",
    "ext-perplexity-bigram",
    "ext-rank-fusion",
    "stream-quality-blend",
    "stream-frame-sample",
    "stream-pack-sequences",
    "ext-shuffle-order",
    "ext-interleave-mixture",
    "ext-layout-corpus",
    "ext-dedup-recall",
    "ext-sentence-split",
    "ext-pack-nofragment",
    "ext-tokenizer-fertility",
    # round 9
    "ext-dedup-simhash-pairs",
    "ext-mixture-expand",
    "ext-embedding-whiten",
    "ext-cdc-chunk-clamped",
    "ext-sentence-decontaminate",
    "ext-dedup-keep-best",
    "stream-sentence-decontaminate",
    # round 11: the composed training-batch gate, the pair-capped
    # keep-best, and the two PRODUCTION-hash CDC lines (xxhash64 —
    # the r10 verdict asked for the production path to be timed
    # alongside the md5-twin gate forms above).
    "ext-train-batch",
    "ext-dedup-keep-best-capped",
    "ext-cdc-chunk-text-prod",
    "ext-cdc-chunk-clamped-prod",
    # round 11 second wave: budget selection, curriculum layout,
    # SemDeDup, and the streaming mixture expansion (a real 3-batch
    # file stream by construction).
    "ext-budget-select",
    "ext-curriculum-order",
    "ext-dedup-semantic",
    "stream-mixture-expand",
    "ext-ul2-plan",
    "ext-ul2-pairs",
    "ext-contrastive-triplets",
    "stream-token-quota",
    "ext-fim-serialize",
    # round 12: the centroid-table / vectorized production kernels
    # (compare against their literal/HOF gate forms ext-dedup-semantic
    # / ext-knn-join above), the cell-local contrastive miner, the
    # frozen-SemDeDup stream (a real 3-batch file stream by
    # construction), and the standalone simhash cap audit.
    "ext-dedup-semantic-table",
    "ext-dedup-semantic-vec",
    "ext-knn-join-vec",
    "ext-contrastive-by-cell",
    "stream-dedup-semantic",
    "ext-simhash-cap-audit",
    "ext-dedup-semantic-keep-best",
    "ext-similarity-ivf-kmeans-table",
    "ext-similarity-ivf-table",
    "ext-similarity-ivf-pq-table",
    # round 12 second group: the five registry-tail queries the r11
    # verdict named as untimed-but-notable (closing the silent gap).
    "ext-similarity-ivf-pq",
    "ext-importance-score",
    "ext-grouped-drift",
    "stream-cdc-compact",
    "ext-dup-spans",
    # round 12 third wave: the KMV (bottom-k) sketch family and the
    # rank-aware retrieval metrics over the exact-vs-ANN pair.
    "ext-distinct-intersect",
    "ext-kmv-merge",
    "ext-retrieval-metrics",
    "stream-distinct-intersect",
    "ext-source-overlap",
    "ext-rank-overlap",
    "ext-audit-report",
    # round 13: the SemDeDup recall audit (exact all-pairs truth — a
    # genuinely heavy new workload) + the n_assign=2 multi-probe form
    # vs its n=1 sibling, the three new sum-merged sketch streams,
    # the 200-replicate bootstrap, and the group-MinHash family
    # (events-scaled shard merge + shingle overlap matrix).
    "ext-dedup-semantic-recall",
    "ext-dedup-semantic-multi",
    "stream-source-overlap",
    "stream-heavy-hitters",
    "stream-histogram-quantile",
    "ext-bootstrap-ci",
    "ext-minhash-shard-merge",
    "ext-minhash-overlap",
    # r13 eval/readability stats: documents SCALES with SF (sf0.1 = 5,000
    # rows, 10x sf0.01) — corpus-scaling scans belong in the timed set
    "ext-rater-kappa",
    "ext-fleiss-kappa",
    "ext-ks-drift",
    "ext-readability",
    # r14 evaluation & drift wave — all scan documents (a
    # corpus-scaling table), so they are timed: the stratified
    # bootstrap (n_boot x rows narrow explode), the lang-id
    # confusion report (batch + genuinely multi-micro-batch
    # streaming state), Chao1 (vocab groupBy), the KS matrix
    # (values x groups grid) and PSI (binned fold).
    "ext-bootstrap-ci-grouped",
    "ext-eval-confusion",
    "stream-eval-confusion",
    "ext-chao1-vocab",
    "ext-ks-matrix",
    "ext-psi-drift",
    # r14 third wave: agreement over 3 synthetic raters, the
    # corpus-wide percentile join, and the multi-micro-batch PSI
    # monitor — all documents-scanning.
    "ext-krippendorff-alpha",
    "ext-quality-percentile",
    "stream-psi-drift",
    "stream-ks-drift",
    "stream-chao1-vocab",
    "stream-bootstrap-ci",
    "stream-rater-kappa",
    "ext-dedup-reweight",
    "ext-eval-ece",
    "ext-eval-brier",
    # r15: per-group judge calibration (batch + multi-micro-batch
    # streaming maintainers), the frozen source-fair percentile gate
    # (freeze + map-only apply, batch and stream), and the lossless
    # exact-ranked CMS pre-filter — all documents-scanning.
    "ext-eval-ece-grouped",
    "ext-eval-brier-grouped",
    "stream-eval-ece",
    "stream-eval-brier",
    "ext-quality-percentile-frozen",
    "stream-quality-percentile",
    "ext-cms-topk-exact",
    "ext-eval-reliability",
    "ext-eval-mcc",
    "ext-eval-auc",
    "stream-eval-auc",
    "ext-eval-auc-grouped",
    # r16: PR-AUC off the shared auc_counts state (batch + multi-
    # micro-batch streaming + grouped) and the two-snapshot
    # calibration-drift gate — all documents-scanning.
    "ext-eval-pr-auc",
    "stream-eval-pr-auc",
    "ext-eval-pr-auc-grouped",
    "ext-eval-calibration-drift",
    # r16: rank correlation (Kendall tau-b + Spearman rho) over the
    # quality-vs-awl contingency — documents-scanning, with the
    # densified-grid dominance sweep downstream.
    "ext-eval-rankcorr",
    "stream-eval-rankcorr",
    "ext-eval-rankcorr-grouped",
]

# Registered queries DELIBERATELY not timed (the no-silent-caps rule:
# this list + HEADLINE must exactly cover the registry — asserted by
# tests/test_round12_ops.py::test_bench_coverage_rule). Rationale per
# group:
# - cheap variants of timed siblings (same plan shape, narrower
#   params): the agg-*/join-*/set-ops relational one-liners, the
#   dedup/similarity family members whose heavy representative is
#   timed (minhash/simhash/knn/ivf/pq cover their variants);
# - roundtrip/IO smoke entries (source-*/sink-*) whose cost is
#   dominated by tmpdir writes, not engine work — timing them
#   benchmarks the filesystem;
# - frozen/streaming twins that share a timed batch plan verbatim
#   (stream-dedup-exact, stream-grouped-drift, ...) where the timed
#   stream-* representatives already capture micro-batch overhead;
# - fixture-bound micro-entries (query-point-lookup is the bench
#   warmup; kvs/ebml scans are timed via scan-ebml-tokenize's family).
#   NOTE the r13 kappa/KS/readability stats were briefly here under a
#   "documents is 500 rows at every SF" premise that is FALSE for this
#   round's testdata (sf0.1 documents = 5,000 rows) — they scan a
#   corpus-scaling table, so they are timed in HEADLINE now.
UNTIMED = [
    "agg-distinct-users",
    "agg-percentiles",
    "agg-robust-mad",
    "agg-rollup-revenue",
    "agg-salted-sum",
    "agg-shipmode-priority",
    "agg-tumbling-window",
    "agg-unpivot-melt",
    "agg-window-ranks",
    "decode-scalars-roundtrip",
    "error-route",
    "ext-ann-dim-recall",
    "ext-corruption-spans",
    "ext-dedup-embedding",
    "ext-dedup-embedding-lsh",
    "ext-dedup-ngram-containment",
    "ext-dedup-ngram-jaccard",
    "ext-dedup-simhash",
    "ext-denoise-pairs",
    "ext-distinct-hll",
    "ext-fim-split",
    "ext-histogram-quantile",
    "ext-join-range",
    "ext-lang-id",
    "ext-multimodal-audio",
    "ext-multimodal-decode",
    "ext-multimodal-pipeline",
    "ext-ngram-novelty",
    "ext-quality-gopher-rules",
    "ext-reservoir-sample",
    "ext-similarity-ann",
    "ext-similarity-ivf-kmeans",
    "ext-split-leakage-free",
    "ext-token-histogram",
    "ext-url-curation",
    "id-assign-monotonic",
    "join-above-nation-avg",
    "join-full-outer-activity",
    "join-salted-skew",
    "join-semi-anti",
    "json-extract-props",
    "kvs-frames-with-tags",
    "query-last-row",
    "query-point-lookup",
    "scan-ebml-heads",
    "scan-ebml-tokenize",
    "scan-prune-elements",
    "segment-sessions-gap",
    "set-ops-users",
    "sink-fanout-roundtrip",
    "sink-jsonl-roundtrip",
    "sink-partitioned-prune",
    "source-csv-roundtrip",
    "source-json-permissive",
    "source-kvs-replay",
    "source-orc-roundtrip",
    "source-parquet-evolve",
    "stream-dedup-exact",
    "stream-grouped-drift",
    "stream-importance-score",
    "stream-segment-rollup",
    "stream-throttle",
    "stream-tumbling-agg",
    "topk-customers",
]

# Fixed cross-round comparison anchor — the compact stdout line
# carries ONLY these (the full map goes to BENCH_FULL_LOCAL.json).
# Reference-pipeline ops + the heaviest representative of each
# extension family + this round's additions.
CORE = [
    "agg-pricing-summary",
    "join-revenue-by-nation",
    "join-asof-tags",
    "segment-fragments",
    "pivot-tag-assembly",
    "sample-throttle-time",
    "demux-decode-explode",
    "ext-dedup-exact",
    "ext-dedup-minhash",
    "ext-dedup-cluster",
    "ext-similarity-knn",
    "ext-similarity-pq",
    "ext-knn-join",
    "ext-bm25-rank",
    "ext-word-entropy",
    "ext-collocations-pmi",
    "ext-bloom-prefilter",
    "ext-pagerank-dups",
    "ext-prepare-corpus",
    "ext-pack-sequences",
    "stream-asof-tags",
    "stream-restart-resume",
    "stream-manifest-sink",
    "ext-bpe-train",
    "ext-dedup-incremental",
    "stream-dedup-incremental",
    # round 8: the curation composition flagship + the span cut
    # (the two heaviest of the 13 new registrations).
    "ext-curate-corpus",
    "ext-dedup-span-removal",
    # round 9: the lossless near-dup join + the clamped-CDC fold
    # (the two heaviest new registrations).
    "ext-dedup-simhash-pairs",
    "ext-cdc-chunk-clamped",
    # round 11: the composed training-batch flagship + the
    # production-hash CDC lines (compare against the md5 gate forms
    # ext-cdc-chunk-text / ext-cdc-chunk-clamped above) + SemDeDup
    # (the heaviest second-wave registration).
    "ext-train-batch",
    "ext-cdc-chunk-text-prod",
    "ext-cdc-chunk-clamped-prod",
    "ext-dedup-semantic",
    # round 12: the production kernels vs their gate forms (table/vec
    # SemDeDup vs ext-dedup-semantic, vectorized knn vs ext-knn-join)
    # + the cell-local contrastive miner.
    "ext-dedup-semantic-table",
    "ext-dedup-semantic-vec",
    "ext-knn-join-vec",
    "ext-contrastive-by-cell",
    # round 12 third wave: the KMV sketch flagship (shingle explode +
    # salted bottom-k — the heaviest of the three new registrations).
    "ext-distinct-intersect",
    # round 13: the SemDeDup recall audit (exact all-pairs truth) and
    # the n_assign=2 multi-probe form (compare against
    # ext-dedup-semantic above for the widened-candidate cost).
    "ext-dedup-semantic-recall",
    "ext-dedup-semantic-multi",
]


def compact_line(full: dict) -> str:
    """The machine-first stdout line: the full payload with `queries`
    reduced to the CORE subset, hard-capped under the driver's ~1.1 KB
    tail-capture window (drops trailing CORE entries if a pathological
    timing widens the JSON past 950 bytes). Unit-tested in
    tests/test_round5_ops.py."""
    timings = full["queries"]
    core = [n for n in CORE if n in timings]
    compact = dict(full, queries={n: timings[n] for n in core},
                   n_timed=len(timings), full_map="BENCH_FULL_LOCAL.json")
    line = json.dumps(compact, separators=(",", ":"))
    while len(line) > 950 and core:
        core.pop()
        compact["queries"] = {n: timings[n] for n in core}
        line = json.dumps(compact, separators=(",", ":"))
    return line


def main() -> None:
    spark = get_spark("awskinesisconsumer-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # Warm the JVM + parquet footers with a trivial action.
    qs["query-point-lookup"](spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spark._jvm.System.gc()  # noqa: SLF001 — isolate heap debris
        reps = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            reps.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(reps), 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    full = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "reps": REPS,
    }
    with open(FULL_OUT, "w") as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    print(json.dumps(full), file=sys.stderr)

    print(compact_line(full))
    spark.stop()


if __name__ == "__main__":
    main()
