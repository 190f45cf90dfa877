"""Same-session interleaved A/B for the r17 audit-report seam change
(VERDICT item 1): the OLD composition (duplicated KMV sketch +
duplicated exact/ANN rankings — reconstructed verbatim from the gate
helpers, which still exist as standalone entries) vs the NEW
checkpoint-seam composition (the committed `_audit_report`). Leg
order alternates per round; GC hint before every leg.

Usage: python scripts/ab_audit_report.py [rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from awskinesisconsumer_spark.session import get_spark  # noqa: E402

import __spark_entry__ as m  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def audit_old(spark, sf):
    """The pre-r17 composition: each leg built from its own gate
    helper (so kmv+overlap re-derive the sketch and retrieval+rbo
    re-derive both rankings), with the r15 lang-id checkpoint seam
    exactly as committed then."""
    from awskinesisconsumer_spark.operators.dedup import dedup_exact
    from awskinesisconsumer_spark.operators.evaluation import (
        brier_score_grouped, calibration_drift, ece_binned_counts,
        expected_calibration_error_grouped,
    )
    from awskinesisconsumer_spark.operators.text import language_id

    docs = m.load_table(spark, "documents", sf)
    n_docs = docs.agg(
        F.lit("n_docs").alias("metric"),
        F.count(F.lit(1)).cast("double").alias("value"),
    )
    dups = dedup_exact(docs, text_col="text", id_col="doc_id").agg(
        F.lit("n_exact_dup_docs").alias("metric"),
        F.sum(F.col("n_dups") - 1).cast("double").alias("value"),
    )
    kmv = m._kmv_lang_distinct(spark, sf).select(
        F.concat(F.lit("kmv_distinct_shingles:"), F.col("group"))
        .alias("metric"),
        F.col("kmv_estimate").alias("value"),
    )
    overlap = m._source_overlap(spark, sf).select(
        F.concat(
            F.lit("overlap_jaccard:"), F.col("group_a"),
            F.lit("/"), F.col("group_b"),
        ).alias("metric"),
        F.col("jaccard").alias("value"),
    )
    recall = m._retrieval_metrics(spark, sf).select(
        F.concat(F.lit("ann_recall@10:probe_"), F.col("probe_id"))
        .alias("metric"),
        F.col("recall_at_k").alias("value"),
    )
    rbo = m._rank_overlap(spark, sf).select(
        F.concat(F.lit("rbo@10:probe_"), F.col("probe_id"))
        .alias("metric"),
        F.col("rbo").alias("value"),
    )
    semrec = m._semantic_dedup_recall(spark, sf).select(
        F.concat(
            F.lit("semdedup_recall:n"),
            F.col("n_assign").cast("string"),
            F.lit(":"), F.col("bucket_lo").cast("string"),
        ).alias("metric"),
        F.col("recall").alias("value"),
    )
    tokci = m._bootstrap_ci_grouped(spark, sf)
    tok_parts = [
        tokci.select(
            F.concat(F.lit(f"token_mean{tag}:"), F.col("group"))
            .alias("metric"),
            F.col(src).alias("value"),
        )
        for tag, src in (
            ("", "estimate"), ("_ci_lo", "ci_lo"), ("_ci_hi", "ci_hi"),
        )
    ]
    pred = language_id(
        docs, text_col="text", with_confidence=True
    ).select("doc_id", "lang", "lang_pred", "lang_conf"
             ).localCheckpoint()
    cal_kw = dict(label_col="lang", pred_col="lang_pred",
                  conf_col="lang_conf", group_col="lang")
    eceg = expected_calibration_error_grouped(
        pred, n_bins=10, **cal_kw
    ).select(
        F.concat(F.lit("ece:"), F.col("group")).alias("metric"),
        F.col("ece").alias("value"),
    )
    brig = brier_score_grouped(pred, **cal_kw).select(
        F.concat(F.lit("brier:"), F.col("group")).alias("metric"),
        F.col("brier").alias("value"),
    )
    predl = pred.where(F.col("lang").isNotNull())
    drift = calibration_drift(
        ece_binned_counts(
            predl.where(F.col("doc_id") % 2 == 0), **cal_kw),
        ece_binned_counts(
            predl.where(F.col("doc_id") % 2 == 1).withColumn(
                "lang_conf",
                F.least(F.col("lang_conf") * 1.15, F.lit(1.0)),
            ), **cal_kw),
    ).select(
        F.concat(F.lit("ece_drift:"), F.col("group")).alias("metric"),
        F.col("ece_delta").alias("value"),
    )
    out = n_docs
    for part in (dups, kmv, overlap, recall, rbo, semrec, *tok_parts,
                 eceg, brig, drift):
        out = out.unionByName(part)
    return out


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ab-audit-report")
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()
    qs["query-point-lookup"](spark, SF_DIR).count()  # warm

    def timed(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def gc() -> None:
        spark._jvm.System.gc()  # noqa: SLF001
        time.sleep(0.2)

    # both legs pay their cold-codegen rep outside the clock
    timed(audit_old)
    timed(m._audit_report)
    legs: dict[str, list[float]] = {"old": [], "new": []}
    for i in range(rounds):
        order = (("old", audit_old), ("new", m._audit_report))
        if i % 2:
            order = order[::-1]
        for name, fn in order:
            gc()
            spark.sparkContext.setJobDescription(f"ab audit: {name}")
            legs[name].append(timed(fn))
    for name, xs in legs.items():
        print(f"{name}: median {statistics.median(xs):.3f}s  reps "
              + ", ".join(f"{x:.3f}" for x in xs), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
