"""Evaluation statistics for LLM-data / LLM-judge pipelines:
inter-rater agreement (Cohen's and Fleiss' kappa), Poisson-bootstrap
confidence intervals for corpus metrics, and the two-sample
Kolmogorov-Smirnov drift statistic.

Design rule shared by every op here (the audit-report rule, applied
to statistics): cross-row aggregation happens on INTEGERS (counts,
squared counts, integer-weighted sums) whose sums are exactly
associative, and floats appear only in the final per-row arithmetic
over those sums — so the values are independent of partitioning /
summation order and a SQL oracle replays them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Poisson(1) inverse-CDF ladder (cumulative P(X <= k), k = 0..8; u
# past the last threshold draws 9). Shared verbatim with the SQL
# twins — the whole bootstrap is deterministic given these literals
# and the portable hash.
POISSON1_CDF = (
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253, 0.999998874797402,
)

# Two-sided KS critical-value coefficient at alpha = 0.05:
# c(alpha) = sqrt(-ln(alpha/2) / 2). Literal shared with SQL twins.
KS_COEF_05 = 1.3581015157406195


def cohen_kappa(
    df: DataFrame, *, rater_a_col: str, rater_b_col: str,
) -> DataFrame:
    """Cohen's kappa between two raters (one row per rated item,
    one label column per rater) — the agreement statistic an
    LLM-judge calibration loop reports: observed agreement corrected
    for the agreement two independent raters with these marginals
    would reach by chance.

    Returns ONE row: (n_items, po, pe, kappa), 6 dp. Items where
    either label is NULL are excluded. Arithmetic is
    order-independent: po = agree/n and pe = sum_l(ca_l * cb_l) / n^2
    are ratios of exact integer sums (never a float sum across label
    rows). kappa is NULL when pe == 1 (degenerate single-label
    marginals leave no chance-correctable signal).

    Scale shape: one narrow pass for (n, agree), two label-keyed
    groupBys (label cardinality-bounded) and a label equi-join for
    sum(ca*cb); everything after the map-side-combined counts is
    constant-size."""
    return cohen_kappa_from_counts(
        kappa_pair_counts(
            df, rater_a_col=rater_a_col, rater_b_col=rater_b_col
        )
    )


def kappa_pair_counts(
    df: DataFrame, *, rater_a_col: str, rater_b_col: str,
) -> DataFrame:
    """The (label_a, label_b, n) pair-count stage of `cohen_kappa` —
    the mergeable state the streaming maintainer
    (`streaming.pipeline.cohen_kappa_stream`) SUM-merges per
    micro-batch (the confusion_counts shape with rater labels):
    observed agreement, both marginals, and the chance-agreement
    cross term all derive from these counts, so the state is
    (label-cardinality)^2 rows, corpus-size-independent.

    LABEL CANONICALIZATION (r14 ADVICE): both rater columns are cast
    to STRING before comparison, so agreement is string equality —
    int 1 vs string '1' agree ('1' == '1'), but double 1.0 vs int 1
    do NOT ('1.0' != '1'), where Spark's coercing `a == b` would say
    they do. Mixed-type rater columns should be cast to one
    comparable type by the caller first; same-type columns (the
    normal case) are unaffected."""
    a, b = F.col(rater_a_col), F.col(rater_b_col)
    return (
        df.where(a.isNotNull() & b.isNotNull())
        .groupBy(
            a.cast("string").alias("label_a"),
            b.cast("string").alias("label_b"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cohen_kappa_from_counts(counts: DataFrame) -> DataFrame:
    """`cohen_kappa`'s final stage over a (label_a, label_b, n)
    pair-count table (see `kappa_pair_counts`) — factored out so the
    streaming state feeds the LITERAL batch code and the batch twin
    gates the stream verbatim (the family contract)."""
    totals = counts.agg(
        F.coalesce(F.sum("n"), F.lit(0).cast("long")).alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("label_a") == F.col("label_b"),
                         F.col("n"))),
            F.lit(0).cast("long"),
        ).alias("agree"),
    )
    ca = counts.groupBy(F.col("label_a").alias("label")).agg(
        F.sum("n").alias("ca")
    )
    cb = counts.groupBy(F.col("label_b").alias("label")).agg(
        F.sum("n").alias("cb")
    )
    # inner join: a label absent from either marginal contributes 0
    cross = ca.join(cb, "label").agg(
        F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0))
        .alias("s_ab")
    )
    # n > 0 guards: ANSI mode (the driver's session) raises on 0/0
    # instead of returning NULL — an all-NULL or empty rated set must
    # yield NULL statistics, not DIVIDE_BY_ZERO (the module's sibling
    # ops all guard their denominators the same way)
    po = F.when(F.col("n") > 0, F.col("agree") / F.col("n"))
    pe = F.when(
        F.col("n") > 0, F.col("s_ab") / (F.col("n") * F.col("n"))
    )
    return totals.crossJoin(cross).select(
        F.col("n").alias("n_items"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(
            F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe)), 6
        ).alias("kappa"),
    )


def fleiss_kappa(
    ratings: DataFrame, *, item_col: str, label_col: str,
) -> DataFrame:
    """Fleiss' kappa over a LONG ratings table (one row per
    (item, rating); rater identity irrelevant by construction) — the
    n-rater panel agreement statistic. Requires the SAME number of
    ratings per item (the statistic's own assumption); raises on
    ragged input via one cheap bounded agg.

    Returns ONE row: (n_items, n_raters, p_bar, p_e, kappa), 6 dp.
    Everything derives from two exact integer sums — S = sum over
    (item, label) cells of n_ij^2, and c_j = per-label totals —
    P_bar = (S - N*n) / (N*n*(n-1)), P_e = sum_j c_j^2 / (N*n)^2,
    so no float crosses a row boundary. kappa NULL when P_e == 1."""
    rated = ratings.where(
        F.col(item_col).isNotNull() & F.col(label_col).isNotNull()
    )
    per_item = rated.groupBy(item_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    shape = per_item.agg(
        F.count(F.lit(1)).alias("N"),
        F.min("_n").alias("n_lo"),
        F.max("_n").alias("n_hi"),
    ).first()
    if shape["N"] == 0:
        raise ValueError("fleiss_kappa: no rated items")
    if shape["n_lo"] != shape["n_hi"]:
        raise ValueError(
            "fleiss_kappa: ratings per item must be constant, got "
            f"{shape['n_lo']}..{shape['n_hi']}"
        )
    n = int(shape["n_hi"])
    if n < 2:
        raise ValueError(
            f"fleiss_kappa: need >= 2 ratings per item, got {n}"
        )
    cells = rated.groupBy(item_col, label_col).agg(
        F.count(F.lit(1)).alias("n_ij")
    )
    s_df = cells.agg(
        F.sum(F.col("n_ij") * F.col("n_ij")).alias("S")
    )
    labels = rated.groupBy(label_col).agg(
        F.count(F.lit(1)).alias("c_j")
    )
    c2_df = labels.agg(
        F.sum(F.col("c_j") * F.col("c_j")).alias("C2")
    )
    N = F.lit(int(shape["N"])).cast("long")
    nn = F.lit(n).cast("long")
    p_bar = (F.col("S") - N * nn) / (N * nn * (nn - 1)).cast("double")
    p_e = F.col("C2") / ((N * nn) * (N * nn)).cast("double")
    return s_df.crossJoin(c2_df).select(
        N.alias("n_items"),
        nn.cast("int").alias("n_raters"),
        F.round(p_bar, 6).alias("p_bar"),
        F.round(p_e, 6).alias("p_e"),
        F.round(
            F.when(p_e < 1.0, (p_bar - p_e) / (F.lit(1.0) - p_e)), 6
        ).alias("kappa"),
    )


def bootstrap_ci(
    df: DataFrame,
    *,
    id_col: str,
    value_col: str,
    n_boot: int = 200,
    conf: float = 0.95,
    salt: str = "boot1",
    hash_fn=None,
) -> DataFrame:
    """Poisson bootstrap CI for the MEAN of an integer metric (token
    counts, dup counts, label flags) — the error bar an eval report
    should put on every corpus-level mean. Each (row, replicate)
    draws a Poisson(1) weight from the portable hash of
    (id, salt, b), so the procedure is DETERMINISTIC, engine-portable
    (no RNG state), and embarrassingly parallel: the explode is
    narrow and the per-replicate sums are map-side-combined longs.

    `value_col` must be integral — that is what keeps every
    cross-row sum exact (the module's order-independence rule);
    scale-and-round a float metric first. Returns ONE row:
    (n_items, n_boot, estimate, ci_lo, ci_hi), 6 dp — estimate the
    plain mean, bounds the empirical ceil(q*B)-th replicate means
    (replicates with zero total weight are skipped by NULL mean).

    Scale shape: n_boot x corpus rows flow through one narrow
    projection into a B-row aggregate; no corpus-sized shuffle, no
    driver state. At 100 TB run it on the metric table you are
    reporting (usually already aggregated) or a sampled slab.
    """
    from .dedup import portable_hash52

    if hash_fn is None:
        hash_fn = portable_hash52
    if n_boot < 2:
        raise ValueError(f"bootstrap_ci: n_boot must be >= 2, got {n_boot}")
    v = F.col(value_col)
    # fan_out_small (r16 optimization round): the n_boot-way explode
    # + per-replicate hash ladder below is n_boot md5s PER INPUT ROW
    # before the first shuffle — a tiny single-row-group input would
    # run all of it on one core. No-op on streams and at scale; the
    # downstream sums are integer and group-keyed, so partition
    # layout cannot change any value.
    from awskinesisconsumer_spark.operators.skew import fan_out_small

    base = fan_out_small(
        df.where(v.isNotNull() & F.col(id_col).isNotNull()).select(
            F.col(id_col).cast("string").alias("_id"),
            v.cast("long").alias("_v"),
        )
    )
    totals = base.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("_v").alias("sum_v"),
    )
    b = F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("b")
    u = hash_fn(
        F.concat_ws("\x1f", F.col("_id"), F.lit(salt),
                    F.col("b").cast("string"))
    ) / F.lit(float(2 ** 52))
    w = F.lit(len(POISSON1_CDF))
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    reps = (
        base.select("_id", "_v", b)
        .withColumn("_w", w.cast("long"))
        .groupBy("b")
        .agg(
            F.sum(F.col("_w") * F.col("_v")).alias("wv"),
            F.sum("_w").alias("wn"),
        )
        .select(
            # wn > 0 guard: ANSI mode (the driver's session) raises
            # on division by zero instead of returning NULL
            F.when(F.col("wn") > 0, F.col("wv") / F.col("wn"))
            .alias("mean_b")
        )
        .where(F.col("mean_b").isNotNull())
    )
    from pyspark.sql import Window

    ranked = reps.withColumn(
        "r", F.row_number().over(Window.orderBy("mean_b"))
    ).withColumn("B", F.count(F.lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)))
    # round the tail mass to 9 dp: (1 - 0.95)/2 in binary is
    # 0.025000000000000022, and ceil(that * B) can land one rank
    # past ceil(0.025 * B) — the SQL twin (and any reader) computes
    # with the clean decimal, so normalize before the rank math
    alpha = round((1.0 - conf) / 2.0, 9)
    lo_r = F.ceil(F.lit(alpha) * F.col("B"))
    hi_r = F.ceil(F.lit(1.0 - alpha) * F.col("B"))
    bounds = ranked.agg(
        F.min(F.when(F.col("r") == F.greatest(lo_r, F.lit(1)),
                     F.col("mean_b"))).alias("ci_lo"),
        F.min(F.when(F.col("r") == hi_r, F.col("mean_b"))).alias("ci_hi"),
        F.max("B").alias("n_reps"),
    )
    return totals.crossJoin(bounds).select(
        "n_items",
        F.col("n_reps").cast("int").alias("n_boot"),
        F.round(
            F.when(F.col("n_items") > 0,
                   F.col("sum_v") / F.col("n_items")), 6
        ).alias("estimate"),
        F.round("ci_lo", 6).alias("ci_lo"),
        F.round("ci_hi", 6).alias("ci_hi"),
    )


def bootstrap_ci_grouped(
    df: DataFrame,
    *,
    id_col: str,
    value_col: str,
    group_col: str,
    n_boot: int = 200,
    conf: float = 0.95,
    salt: str = "boot1",
    hash_fn=None,
) -> DataFrame:
    """`bootstrap_ci` stratified by `group_col` (r13 verdict item 7):
    one Poisson-bootstrap CI row PER GROUP — the per-source /
    per-language error bar the dataset card and the audit report's
    per-group rows actually need. Same deterministic ladder: each
    (row, replicate) draws its Poisson(1) weight from the portable
    hash of (id, salt, b) — identical to the ungrouped op, so a
    single-group input replays `bootstrap_ci` exactly (pinned) and
    each stratum's resample is independent of every other's by
    construction (the weight never sees the group).

    Scale shape: the one extra group key rides the existing
    replicate agg (map-side-combined integer sums, keyed (group, b)
    instead of (b)); the rank-and-bound stage is G x B rows
    partitioned by group — never corpus-sized. Returns one row per
    group: (group, n_items, n_boot, estimate, ci_lo, ci_hi), 6 dp.
    A group whose every replicate draws zero total weight (only
    plausible for single-digit-row strata) keeps its count/estimate
    row with NULL bounds."""
    return bootstrap_ci_grouped_from_sums(
        bootstrap_replicate_sums(
            df, id_col=id_col, value_col=value_col,
            group_col=group_col, n_boot=n_boot, salt=salt,
            hash_fn=hash_fn,
        ),
        conf=conf,
    )


def bootstrap_replicate_sums(
    df: DataFrame,
    *,
    id_col: str,
    value_col: str,
    group_col: str,
    n_boot: int = 200,
    salt: str = "boot1",
    hash_fn=None,
) -> DataFrame:
    """The (group, b, wv, wn) integer-sum stage of
    `bootstrap_ci_grouped` — the mergeable state the streaming
    maintainer (`streaming.pipeline.bootstrap_ci_stream`) SUM-merges
    per micro-batch: each (row, replicate) Poisson weight depends
    only on (id, salt, b), never on which batch the row arrived in,
    so the per-(group, replicate) weighted sums are exactly
    associative across arrivals. Rows with b = -1 carry the plain
    totals (wn = n_items, wv = sum_v) so ONE state table serves the
    estimate and the bounds. State is G x (n_boot + 1) rows,
    CARDINALITY-INDEPENDENT of corpus size."""
    from .dedup import portable_hash52

    if hash_fn is None:
        hash_fn = portable_hash52
    if n_boot < 2:
        raise ValueError(
            f"bootstrap_replicate_sums: n_boot must be >= 2, "
            f"got {n_boot}"
        )
    v = F.col(value_col)
    # fan_out_small: see bootstrap_ci — the n_boot explode + hash
    # ladder is the cost; integer group-keyed sums downstream.
    from awskinesisconsumer_spark.operators.skew import fan_out_small

    base = fan_out_small(
        df.where(
            v.isNotNull() & F.col(id_col).isNotNull()
            & F.col(group_col).isNotNull()
        ).select(
            F.col(group_col).alias("_g"),
            F.col(id_col).cast("string").alias("_id"),
            v.cast("long").alias("_v"),
        )
    )
    totals = base.groupBy("_g").agg(
        F.count(F.lit(1)).alias("wn"),
        F.sum("_v").alias("wv"),
    ).select("_g", F.lit(-1).alias("b"), "wv", "wn")
    b = F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("b")
    u = hash_fn(
        F.concat_ws("\x1f", F.col("_id"), F.lit(salt),
                    F.col("b").cast("string"))
    ) / F.lit(float(2 ** 52))
    w = F.lit(len(POISSON1_CDF))
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    reps = (
        base.select("_g", "_id", "_v", b)
        .withColumn("_w", w.cast("long"))
        .groupBy("_g", "b")
        .agg(
            F.sum(F.col("_w") * F.col("_v")).alias("wv"),
            F.sum("_w").alias("wn"),
        )
        .select("_g", "b", "wv", "wn")
    )
    return totals.unionByName(reps)


def bootstrap_ci_grouped_from_sums(
    sums: DataFrame, *, conf: float = 0.95,
) -> DataFrame:
    """`bootstrap_ci_grouped`'s final stage over a
    (group, b, wv, wn) sums table (see `bootstrap_replicate_sums`;
    b = -1 rows carry the totals) — factored out so the streaming
    state feeds the LITERAL batch code and the batch twin gates the
    stream verbatim (the family contract)."""
    totals = sums.where(F.col("b") == -1).select(
        F.col("_g"),
        F.col("wn").alias("n_items"),
        F.col("wv").alias("sum_v"),
    )
    reps = (
        sums.where(F.col("b") >= 0)
        .select(
            "_g",
            # wn > 0 guard: ANSI mode raises on division by zero
            F.when(F.col("wn") > 0, F.col("wv") / F.col("wn"))
            .alias("mean_b"),
        )
        .where(F.col("mean_b").isNotNull())
    )
    from pyspark.sql import Window

    ranked = reps.withColumn(
        "r",
        F.row_number().over(Window.partitionBy("_g").orderBy("mean_b")),
    ).withColumn(
        "B", F.count(F.lit(1)).over(Window.partitionBy("_g"))
    )
    # decimal-normalized tail mass — see bootstrap_ci
    alpha = round((1.0 - conf) / 2.0, 9)
    lo_r = F.ceil(F.lit(alpha) * F.col("B"))
    hi_r = F.ceil(F.lit(1.0 - alpha) * F.col("B"))
    bounds = ranked.groupBy("_g").agg(
        F.min(F.when(F.col("r") == F.greatest(lo_r, F.lit(1)),
                     F.col("mean_b"))).alias("ci_lo"),
        F.min(F.when(F.col("r") == hi_r, F.col("mean_b"))).alias("ci_hi"),
        F.max("B").alias("n_reps"),
    )
    return (
        totals.join(bounds, "_g", "left")
        .select(
            F.col("_g").alias("group"),
            "n_items",
            F.col("n_reps").cast("int").alias("n_boot"),
            F.round(
                F.when(F.col("n_items") > 0,
                       F.col("sum_v") / F.col("n_items")), 6
            ).alias("estimate"),
            F.round("ci_lo", 6).alias("ci_lo"),
            F.round("ci_hi", 6).alias("ci_hi"),
        )
    )


def ks_statistic(
    df: DataFrame,
    *,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    alpha_coef: float = KS_COEF_05,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test between the
    `value_col` distributions of two groups — the distribution-shape
    companion to the binned PSI drift ops (`ext-corpus-drift`): D =
    max over observed values of |ECDF_a - ECDF_b|, sensitive to ANY
    shape change, no binning choices.

    Returns ONE row: (n_a, n_b, d_stat, d_crit, drifted) — d_crit =
    coef * sqrt((n_a+n_b)/(n_a*n_b)) at alpha = 0.05 by default,
    drifted = d_stat > d_crit. Exact, not sketched: cumulative
    counts per distinct value (integer window sums over value order)
    make each per-value ECDF gap a ratio of exact integers, and D a
    max — order-independent throughout (the module rule).

    Scale shape: one groupBy(value) to per-value counts, one global
    window over DISTINCT values (bounded by value cardinality, not
    corpus rows — for continuous metrics at 100 TB, quantize to
    meaningful precision first, e.g. round scores to 4 dp, exactly
    as a production KS monitor does)."""
    return ks_from_value_counts(
        ks_value_counts(
            df, value_col=value_col, group_col=group_col,
            group_a=group_a, group_b=group_b,
        ),
        alpha_coef=alpha_coef,
    )


def ks_value_counts(
    df: DataFrame, *, value_col: str, group_col: str, group_a, group_b,
) -> DataFrame:
    """The (val, ca, cb) per-distinct-value counting stage of
    `ks_statistic` — the mergeable state the streaming maintainer
    (`streaming.pipeline.ks_drift_stream`) SUM-merges per
    micro-batch: counter sums are exactly associative, so the merged
    state equals one batch count over the union of arrivals. Bounded
    by value cardinality (quantize continuous metrics first — the
    ks_statistic rule; that bound is also the STATE bound for the
    stream)."""
    g = F.col(group_col)
    v = F.col(value_col)
    two = df.where(v.isNotNull() & g.isin([group_a, group_b]))
    return two.groupBy(v.alias("val")).agg(
        F.sum((g == group_a).cast("long")).alias("ca"),
        F.sum((g == group_b).cast("long")).alias("cb"),
    )


def ks_from_value_counts(
    per_val: DataFrame, *, alpha_coef: float = KS_COEF_05,
) -> DataFrame:
    """`ks_statistic`'s final stage over a (val, ca, cb) count table
    (see `ks_value_counts`) — factored out so the streaming state
    feeds the LITERAL batch code and the batch twin gates the stream
    verbatim (the cms/histogram/confusion/psi contract)."""
    from pyspark.sql import Window

    wcum = Window.orderBy("val").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    gaps = (
        per_val.select(
            F.sum("ca").over(wcum).alias("cum_a"),
            F.sum("cb").over(wcum).alias("cum_b"),
        )
        .withColumn("na", F.max("cum_a").over(wall))
        .withColumn("nb", F.max("cum_b").over(wall))
        .withColumn(
            "gap",
            # n > 0 guards: ANSI-safe when one group is absent
            F.when(
                (F.col("na") > 0) & (F.col("nb") > 0),
                F.abs(F.col("cum_a") / F.col("na")
                      - F.col("cum_b") / F.col("nb")),
            ),
        )
    )
    crit = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.lit(alpha_coef)
        * F.sqrt((F.col("n_a") + F.col("n_b"))
                 / (F.col("n_a") * F.col("n_b")).cast("double")),
    )
    return gaps.agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        F.max("gap").alias("_d"),
    ).select(
        "n_a", "n_b",
        F.round("_d", 6).alias("d_stat"),
        F.round(crit, 6).alias("d_crit"),
        (F.col("_d") > crit).alias("drifted"),
    )


def confusion_counts(
    df: DataFrame, *, label_col: str, pred_col: str,
) -> DataFrame:
    """(label, pred, n) integer confusion counts — the mergeable
    state behind `classification_report`. Counter sums are exactly
    associative, so the streaming maintainer
    (`streaming.pipeline.confusion_counts_stream`) SUM-merges this
    per micro-batch and the final state is bit-identical to one
    batch build over the union of arrivals — the cms/histogram
    streaming-state pattern applied to classifier calibration.

    Scale shape: one map-side-combined groupBy; the table is bounded
    by (label cardinality) x (pred cardinality), never corpus rows.
    """
    lab, pr = F.col(label_col), F.col(pred_col)
    return (
        df.where(lab.isNotNull() & pr.isNotNull())
        .groupBy(
            lab.cast("string").alias("label"),
            pr.cast("string").alias("pred"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def classification_report_from_counts(counts: DataFrame) -> DataFrame:
    """Per-class precision / recall / F1 from a (label, pred, n)
    confusion-count table (see `confusion_counts`) — the LLM-judge /
    lang-id calibration report. One row per class seen as label OR
    prediction, plus the '__all__' micro row (accuracy; for
    single-label classification micro-P = micro-R = micro-F1 =
    accuracy).

    Every metric derives from integer counts in per-row arithmetic —
    F1 uses the identity F1 = 2*TP / (n_pred + n_true), so no
    intermediate float ratios compound (the module rule). Returns
    (cls, n_true, n_pred, tp, precision, recall, f1), 6 dp; a class
    absent from predictions gets NULL precision (0/0), absent from
    labels NULL recall.
    """
    truec = counts.groupBy(F.col("label").alias("cls")).agg(
        F.sum("n").alias("n_true")
    )
    predc = counts.groupBy(F.col("pred").alias("cls")).agg(
        F.sum("n").alias("n_pred")
    )
    tpc = counts.where(F.col("label") == F.col("pred")).select(
        F.col("label").alias("cls"), F.col("n").alias("tp")
    )
    zero = F.lit(0).cast("long")
    per = (
        truec.join(predc, "cls", "full")
        .join(tpc, "cls", "left")
        .select(
            "cls",
            F.coalesce("n_true", zero).alias("n_true"),
            F.coalesce("n_pred", zero).alias("n_pred"),
            F.coalesce("tp", zero).alias("tp"),
        )
    )
    # ANSI-safe guards: 0/0 stays NULL instead of raising
    prec = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred"))
    rec = F.when(F.col("n_true") > 0, F.col("tp") / F.col("n_true"))
    f1 = F.when(
        (F.col("n_pred") + F.col("n_true")) > 0,
        2.0 * F.col("tp") / (F.col("n_pred") + F.col("n_true")),
    )
    rows = per.select(
        "cls", "n_true", "n_pred", "tp",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
    # micro row: integer sums over the tiny class table
    acc = F.when(F.col("n_true") > 0, F.col("tp") / F.col("n_true"))
    micro = per.agg(
        F.sum("n_true").alias("n_true"), F.sum("tp").alias("tp")
    ).select(
        F.lit("__all__").alias("cls"),
        F.col("n_true"),
        F.col("n_true").alias("n_pred"),
        "tp",
        F.round(acc, 6).alias("precision"),
        F.round(acc, 6).alias("recall"),
        F.round(acc, 6).alias("f1"),
    )
    return rows.unionByName(micro)


def classification_report(
    df: DataFrame, *, label_col: str, pred_col: str,
) -> DataFrame:
    """`confusion_counts` -> `classification_report_from_counts` in
    one call — see those for the contracts. The factoring is the
    streaming guarantee: stream state feeds the literal batch final
    stage, so the batch twin gates the stream verbatim."""
    return classification_report_from_counts(
        confusion_counts(df, label_col=label_col, pred_col=pred_col)
    )


def chao1_vocab(df: DataFrame, *, text_col: str) -> DataFrame:
    """Chao1 species-richness estimate of the corpus vocabulary
    (Chao 1984; the standard "how many distinct terms would an
    infinite corpus show" lower bound): from the term
    frequency-of-frequencies, chao1 = D + f1*(f1-1) / (2*(f2+1)) —
    the bias-corrected form, defined even when no term occurs
    exactly twice. The coverage companion to `vocab_coverage`: it
    estimates the UNSEEN vocabulary mass a bigger crawl would add.

    Same tokenization as `text.top_terms` (lowercased whitespace
    split, empty terms dropped) so the twin reuses the proven
    fragment. One map-side-combined groupBy(term) then a
    constant-size aggregate of integer counts; the float division
    happens once, in the final row (the module rule). Returns ONE
    row: (n_tokens, vocab_size, f1, f2, chao1_est 4 dp).
    """
    return chao1_from_counts(
        chao1_term_counts(df, text_col=text_col)
    )


def chao1_term_counts(df: DataFrame, *, text_col: str) -> DataFrame:
    """The (term, n) counting stage of `chao1_vocab` — the mergeable
    state the streaming maintainer
    (`streaming.pipeline.chao1_vocab_stream`) SUM-merges per
    micro-batch (term-count sums are exactly associative). Same
    tokenization as `text.top_terms`; state vocabulary-bounded
    (Zipf: sublinear in corpus size)."""
    from .text import _words

    return (
        df.select(F.explode(_words(F.lower(F.col(text_col))))
                  .alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def chao1_from_counts(counts: DataFrame) -> DataFrame:
    """`chao1_vocab`'s final stage over a (term, n) count table (see
    `chao1_term_counts`) — factored out so the streaming state feeds
    the LITERAL batch code and the batch twin gates the stream
    verbatim (the cms/histogram/confusion/psi/ks contract)."""
    d = F.count(F.lit(1))
    f1 = F.sum((F.col("n") == 1).cast("long"))
    f2 = F.sum((F.col("n") == 2).cast("long"))
    return counts.agg(
        F.sum("n").alias("n_tokens"),
        d.alias("vocab_size"),
        f1.alias("f1"),
        f2.alias("f2"),
    ).select(
        "n_tokens", "vocab_size", "f1", "f2",
        F.round(
            F.col("vocab_size")
            + (F.col("f1") * (F.col("f1") - 1))
            / (2.0 * (F.col("f2") + 1)),
            4,
        ).alias("chao1_est"),
    )


def ks_matrix(
    df: DataFrame,
    *,
    value_col: str,
    group_col: str,
    alpha_coef: float = KS_COEF_05,
) -> DataFrame:
    """All-pairs two-sample KS drift matrix over the groups of
    `group_col` — `ks_statistic` generalized the way
    `kmv_overlap_matrix` generalizes `kmv_set_ops`: every group's
    ECDF comes from ONE pass, then every unordered pair's D is a
    G^2-bounded join. Per pair the arithmetic is identical to
    `ks_statistic(group_a, group_b)` (pinned), so each row replays
    the pairwise op exactly.

    Scale shape: groupBy(group, value) counts, then a (distinct
    values x groups) grid for the cumulative sums — bounded by value
    cardinality x G, never corpus rows (quantize continuous metrics
    first, the ks_statistic rule); the pair join carries that grid
    keyed on value with a G^2 output. The grid crossJoin is the
    bounded small-x-small pattern (values x groups), not a corpus
    cartesian. Returns one row per unordered pair:
    (group_a, group_b, n_a, n_b, d_stat, d_crit, drifted).
    """
    from pyspark.sql import Window

    g, v = F.col(group_col), F.col(value_col)
    # persist: three branches (distinct values, distinct groups, the
    # grid fill) all read the counts — uncached each branch re-scans
    # the CORPUS to rebuild this bounded (values x groups) aggregate;
    # released before returning (the caching-module contract)
    counts = (
        df.where(v.isNotNull() & g.isNotNull())
        .groupBy(g.cast("string").alias("g"), v.alias("val"))
        .agg(F.count(F.lit(1)).alias("c"))
    ).persist()
    vals = counts.select("val").distinct()
    groups = counts.select("g").distinct()
    filled = (
        vals.crossJoin(F.broadcast(groups))
        .join(counts, ["g", "val"], "left")
        .select("g", "val", F.coalesce("c", F.lit(0).cast("long"))
                .alias("c"))
    )
    wcum = Window.partitionBy("g").orderBy("val").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("g")
    ecdf = filled.select(
        "g", "val",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    a = ecdf.select(
        F.col("g").alias("group_a"), "val",
        F.col("cum").alias("cum_a"), F.col("n").alias("n_a"),
    )
    b = ecdf.select(
        F.col("g").alias("group_b"), F.col("val").alias("val_b"),
        F.col("cum").alias("cum_b"), F.col("n").alias("n_b"),
    )
    gap = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.abs(F.col("cum_a") / F.col("n_a")
              - F.col("cum_b") / F.col("n_b")),
    )
    pairs = (
        a.join(b, (F.col("val") == F.col("val_b"))
               & (F.col("group_a") < F.col("group_b")))
        .groupBy("group_a", "group_b")
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max(gap).alias("_d"),
        )
    )
    crit = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.lit(alpha_coef)
        * F.sqrt((F.col("n_a") + F.col("n_b"))
                 / (F.col("n_a") * F.col("n_b")).cast("double")),
    )
    out = pairs.select(
        "group_a", "group_b", "n_a", "n_b",
        F.round("_d", 6).alias("d_stat"),
        F.round(crit, 6).alias("d_crit"),
        (F.col("_d") > crit).alias("drifted"),
    )
    from .caching import release_after

    return release_after(out, counts)


def psi_binned_counts(
    df: DataFrame,
    *,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    n_bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """The (bin, ca, cb) counting stage of `psi_drift` — the
    mergeable state the streaming maintainer
    (`streaming.pipeline.psi_drift_stream`) SUM-merges per
    micro-batch: counter sums are exactly associative, so the merged
    state equals one batch count over the union of arrivals.

    Edges: with `lo`/`hi` given (the streaming monitor form — edges
    must be FROZEN before data arrives), equi-width bins over
    [lo, hi) with out-of-range values CLAMPED into the end bins;
    without, derived from the union min/max (the batch audit form).
    Only observed bins appear — `psi_from_binned` materializes the
    empties."""
    if n_bins < 2:
        raise ValueError(
            f"psi_binned_counts: n_bins must be >= 2, got {n_bins}"
        )
    if (lo is None) != (hi is None):
        raise ValueError(
            "psi_binned_counts: pass both lo and hi (frozen edges) "
            "or neither (derived edges)"
        )
    if lo is not None and not (float(hi) > float(lo)):
        raise ValueError(
            f"psi_binned_counts: hi must exceed lo, got [{lo}, {hi})"
        )
    g, v = F.col(group_col), F.col(value_col)
    two = df.where(v.isNotNull() & g.isin([group_a, group_b])).select(
        g.alias("_g"), v.cast("double").alias("_v")
    )
    if lo is None:
        span = two.agg(
            F.min("_v").alias("lo"), F.max("_v").alias("hi")
        )
    else:
        # frozen edges ride as literals; the degenerate hi == lo case
        # is rejected above, so the when() branch never fires here
        span = two.sparkSession.range(1).select(
            F.lit(float(lo)).alias("lo"), F.lit(float(hi)).alias("hi")
        )
    return (
        two.crossJoin(F.broadcast(span))
        .select(
            "_g",
            F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
                F.least(
                    F.greatest(
                        F.floor(
                            (F.col("_v") - F.col("lo"))
                            / ((F.col("hi") - F.col("lo")) / n_bins)
                        ).cast("int"),
                        F.lit(0),
                    ),
                    F.lit(n_bins - 1),
                )
            ).alias("bin"),
        )
        .groupBy("bin")
        .agg(
            F.sum((F.col("_g") == group_a).cast("long")).alias("ca"),
            F.sum((F.col("_g") == group_b).cast("long")).alias("cb"),
        )
    )


def psi_from_binned(
    binned: DataFrame, *, n_bins: int = 10, smooth: float = 0.5,
) -> DataFrame:
    """`psi_drift`'s final stage over a (bin, ca, cb) count table
    (see `psi_binned_counts`) — factored out so the streaming state
    feeds the LITERAL batch code and the batch twin gates the stream
    verbatim (the cms/histogram/confusion contract). Materializes
    ALL n_bins bins (empty bins still contribute when n_a != n_b),
    then the ordered-by-bin float fold. An input bin outside
    [0, n_bins) — a reader passing a smaller n_bins than the state
    was counted under — would silently vanish in the bin join, so it
    FAILS LOUDLY instead (r14 ADVICE): the out-of-range count rides
    the plan as a lazy assert, no extra job."""
    spark = binned.sparkSession
    all_bins = spark.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    zero = F.lit(0).cast("long")
    full = all_bins.join(binned, "bin", "left").select(
        "bin",
        F.coalesce("ca", zero).alias("ca"),
        F.coalesce("cb", zero).alias("cb"),
    )
    oob = binned.agg(
        F.coalesce(
            F.sum(((F.col("bin") < 0) | (F.col("bin") >= n_bins))
                  .cast("long")),
            zero,
        ).alias("_oob")
    )
    s = float(smooth)
    agg = full.agg(
        F.sort_array(
            F.collect_list(F.struct("bin", "ca", "cb"))
        ).alias("arr"),
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
    ).crossJoin(F.broadcast(oob))
    p = lambda x, n: (x + F.lit(s)) / (n + F.lit(s * n_bins))  # noqa: E731
    psi_fold = F.aggregate(
        F.col("arr"),
        F.lit(0.0),
        lambda acc, x: acc
        + (p(x["ca"], F.col("n_a")) - p(x["cb"], F.col("n_b")))
        * F.log(p(x["ca"], F.col("n_a")) / p(x["cb"], F.col("n_b"))),
    )
    psi = F.when(
        F.assert_true(
            F.col("_oob") == 0,
            F.lit("psi_from_binned: input bin outside [0, n_bins) — "
                  "n_bins smaller than the state's frozen binning?"),
        ).isNull(),
        psi_fold,
    )
    return agg.select(
        "n_a", "n_b",
        F.lit(n_bins).alias("n_bins"),
        F.round(psi, 6).alias("psi"),
        F.when(psi < 0.1, F.lit("stable"))
        .when(psi < 0.25, F.lit("moderate"))
        .otherwise(F.lit("shifted")).alias("drift_level"),
    )


def psi_drift(
    df: DataFrame,
    *,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    n_bins: int = 10,
    smooth: float = 0.5,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Population Stability Index between two slices' `value_col`
    distributions — the binned, magnitude-interpretable drift score
    the industry monitors alongside KS: psi = sum over bins of
    (p_i - q_i) * ln(p_i / q_i), with the conventional reading
    psi < 0.1 stable, < 0.25 moderate, else shifted.

    Deterministic by construction: equi-width bins over the UNION
    min/max (both slices share the edges — binning against one
    slice's edges makes psi asymmetric under renaming), and
    additive smoothing (count + smooth) / (n + smooth * n_bins) so
    EMPTY bins stay finite — note an all-empty bin still contributes
    when n_a != n_b (the smoothed masses differ), which is why all
    n_bins bins materialize, not just observed ones. The final sum
    is a float fold ORDERED BY bin over the n_bins-row table (the
    RBO/embedding-pool rule), so the value replays bit-for-bit.

    Scale shape: one min/max agg, one binned groupBy (map-side
    combined, <= n_bins rows out), one n_bins-row fold. Returns ONE
    row: (n_a, n_b, n_bins, psi, drift_level).

    `lo`/`hi` (both or neither): FREEZE the bin edges instead of
    deriving them — the streaming-monitor form (edges must exist
    before data arrives; out-of-range values clamp into the end
    bins). Composed from `psi_binned_counts` -> `psi_from_binned`,
    the factoring that lets the streaming maintainer's SUM-merged
    state feed the literal batch final stage.
    """
    return psi_from_binned(
        psi_binned_counts(
            df, value_col=value_col, group_col=group_col,
            group_a=group_a, group_b=group_b, n_bins=n_bins,
            lo=lo, hi=hi,
        ),
        n_bins=n_bins, smooth=smooth,
    )


def krippendorff_alpha(
    ratings: DataFrame, *, item_col: str, label_col: str,
) -> DataFrame:
    """Krippendorff's alpha (nominal metric, complete data — same
    long (item, rating) shape and constant-ratings-per-item
    requirement as `fleiss_kappa`): alpha = 1 - Do/De over the
    coincidence matrix. The third agreement statistic an LLM-judge
    calibration suite reports: unlike Fleiss' kappa it is built from
    PAIRABLE-VALUE coincidences, so it generalizes to other metrics
    and missing data — this implementation covers the
    nominal/complete case, where it derives from EXACTLY the two
    integer sums Fleiss uses (the module rule, shared machinery):

        S  = sum over (item, label) cells of n_ij^2
        C2 = sum over labels of c_j^2
        Do = (N*R^2 - S) / ((R - 1) * N * R)
        De = ((N*R)^2 - C2) / (N*R * (N*R - 1))

    (sum over u of sum_{c != k} n_uc * n_uk = N*R^2 - S; pairable
    values per unit = R). Returns ONE row:
    (n_items, n_raters, d_o, d_e, alpha), 6 dp; alpha NULL when
    De == 0 (a single observed label leaves no expected
    disagreement to correct against)."""
    rated = ratings.where(
        F.col(item_col).isNotNull() & F.col(label_col).isNotNull()
    )
    per_item = rated.groupBy(item_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    shape = per_item.agg(
        F.count(F.lit(1)).alias("N"),
        F.min("_n").alias("n_lo"),
        F.max("_n").alias("n_hi"),
    ).first()
    if shape["N"] == 0:
        raise ValueError("krippendorff_alpha: no rated items")
    if shape["n_lo"] != shape["n_hi"]:
        raise ValueError(
            "krippendorff_alpha: ratings per item must be constant, "
            f"got {shape['n_lo']}..{shape['n_hi']}"
        )
    r = int(shape["n_hi"])
    if r < 2:
        raise ValueError(
            f"krippendorff_alpha: need >= 2 ratings per item, got {r}"
        )
    cells = rated.groupBy(item_col, label_col).agg(
        F.count(F.lit(1)).alias("n_ij")
    )
    s_df = cells.agg(F.sum(F.col("n_ij") * F.col("n_ij")).alias("S"))
    labels = rated.groupBy(label_col).agg(
        F.count(F.lit(1)).alias("c_j")
    )
    c2_df = labels.agg(F.sum(F.col("c_j") * F.col("c_j")).alias("C2"))
    n = int(shape["N"])
    N, R = F.lit(n).cast("long"), F.lit(r).cast("long")
    ntot = N * R
    d_o = (N * R * R - F.col("S")) / ((R - 1) * ntot).cast("double")
    d_e = (ntot * ntot - F.col("C2")) / (ntot * (ntot - 1)).cast(
        "double"
    )
    return s_df.crossJoin(c2_df).select(
        N.alias("n_items"),
        R.cast("int").alias("n_raters"),
        F.round(d_o, 6).alias("d_o"),
        F.round(d_e, 6).alias("d_e"),
        F.round(F.when(d_e > 0, 1.0 - d_o / d_e), 6).alias("alpha"),
    )


def expected_calibration_error(
    df: DataFrame,
    *,
    label_col: str,
    pred_col: str,
    conf_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Expected Calibration Error of a classifier's confidence
    scores (Naeini et al. 2015; the standard LLM-judge calibration
    number): bin predictions by confidence into `n_bins` equal-width
    bins over [0, 1], then ECE = sum over bins of
    (n_b / N) * |accuracy_b - mean_confidence_b|. A perfectly
    calibrated judge has ECE 0; marker-share heuristics
    (`text.language_id(with_confidence=True)`) do not — which is the
    point of measuring.

    Order-independence under the module rule: confidences are
    QUANTIZED to 6 dp and summed as scaled integers (round(c * 1e6)
    as long), so the per-bin mean confidence is a ratio of exact
    integer sums like the accuracy — no float crosses a row
    boundary; the final cross-bin sum is an ordered <= n_bins fold
    (the PSI pattern). Confidence must lie in [0, 1] (c = 1.0 lands
    in the top bin); NULL label/pred/conf rows are excluded.

    Returns ONE row: (n_items, n_bins, ece, max_gap) — max_gap the
    largest per-bin |acc - conf| (the "maximum calibration error"
    companion). Scale shape: one map-side-combined n_bins-row
    groupBy, one bounded fold. Composed from `ece_binned_counts` ->
    `ece_from_binned`, the factoring that lets the streaming
    maintainer's SUM-merged state feed the literal batch final
    stage (the psi/confusion family contract)."""
    return ece_from_binned(
        ece_binned_counts(
            df, label_col=label_col, pred_col=pred_col,
            conf_col=conf_col, n_bins=n_bins,
        ),
        n_bins=n_bins,
    )


def expected_calibration_error_grouped(
    df: DataFrame,
    *,
    label_col: str,
    pred_col: str,
    conf_col: str,
    group_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """`expected_calibration_error` stratified by `group_col` — one
    calibration row PER GROUP (language / source / judge version):
    the aggregate ECE of an LLM judge can look healthy while one
    language's confidence is badly miscalibrated, which is exactly
    what a per-group ECE surfaces. Same quantized-integer bin sums
    as the ungrouped op, keyed (group, bin) instead of (bin), so a
    single-group input replays `expected_calibration_error` exactly
    (pinned in tests) and the state stays G x n_bins rows —
    CARDINALITY-INDEPENDENT of corpus size. Rows with NULL group are
    excluded (unattributable predictions can't be calibrated
    per-group). Returns one row per group:
    (group, n_items, n_bins, ece, max_gap), 6 dp."""
    return ece_from_binned(
        ece_binned_counts(
            df, label_col=label_col, pred_col=pred_col,
            conf_col=conf_col, n_bins=n_bins, group_col=group_col,
        ),
        n_bins=n_bins,
    )


def ece_binned_counts(
    df: DataFrame,
    *,
    label_col: str,
    pred_col: str,
    conf_col: str,
    n_bins: int = 10,
    group_col: str | None = None,
) -> DataFrame:
    """The (group?, bin, nb, ok, c6) integer-count stage of
    `expected_calibration_error` — the mergeable state the streaming
    maintainer (`streaming.pipeline.ece_stream`) SUM-merges per
    micro-batch: every column is an exact integer sum, so the
    per-(group, bin) counts are exactly associative across arrivals
    and the merged state equals the single-pass batch count. The
    confidence bin clamps at BOTH ends (the psi_binned_counts
    value-clamp rule — r14 ADVICE): an out-of-contract conf < 0
    cannot mint a bin -1 key that `ece_from_binned`'s bin fold never
    visits — it lands (and still counts) in bin 0, exactly as
    conf > 1 lands in the top bin; conf is contractually [0, 1], and
    inputs outside it are the caller's bug, merely kept visible
    rather than dropped.
    With `group_col` the output carries a leading `group` column and
    the state is G x n_bins rows."""
    if n_bins < 1:
        raise ValueError(
            f"ece_binned_counts: n_bins must be >= 1, got {n_bins}"
        )
    lab, pr, cf = F.col(label_col), F.col(pred_col), F.col(conf_col)
    keep = lab.isNotNull() & pr.isNotNull() & cf.isNotNull()
    cols = [
        F.greatest(
            F.least(
                F.floor(cf * n_bins).cast("int"), F.lit(n_bins - 1)
            ),
            F.lit(0),
        ).alias("bin"),
        (lab == pr).cast("long").alias("_ok"),
        F.round(cf * 1e6).cast("long").alias("_c6"),
    ]
    keys = ["bin"]
    if group_col is not None:
        keep = keep & F.col(group_col).isNotNull()
        cols = [F.col(group_col).alias("group"), *cols]
        keys = ["group", "bin"]
    return df.where(keep).select(*cols).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("_ok").alias("ok"),
        F.sum("_c6").alias("c6"),
    )


def ece_from_binned(
    binned: DataFrame, *, n_bins: int = 10,
) -> DataFrame:
    """`expected_calibration_error`'s final stage over a
    (bin, nb, ok, c6) count table (see `ece_binned_counts`) —
    factored out so the streaming state feeds the LITERAL batch code
    and the batch twin gates the stream verbatim (the family
    contract). A leading `group` column (the grouped form's state)
    turns the single fold into one fold per group — still bounded by
    n_bins per group."""
    grouped = "group" in binned.columns
    aggs = [
        F.sort_array(
            F.collect_list(F.struct("bin", "nb", "ok", "c6"))
        ).alias("arr"),
        F.coalesce(F.sum("nb"), F.lit(0).cast("long")).alias("n_items"),
    ]
    agg = (binned.groupBy("group").agg(*aggs) if grouped
           else binned.agg(*aggs))
    gap = lambda x: F.abs(  # noqa: E731
        x["ok"] / x["nb"] - x["c6"] / (x["nb"] * F.lit(1e6))
    )
    ece = F.aggregate(
        F.col("arr"), F.lit(0.0),
        lambda acc, x: acc + (x["nb"] / F.col("n_items")) * gap(x),
    )
    max_gap = F.aggregate(
        F.col("arr"), F.lit(0.0),
        lambda acc, x: F.greatest(acc, gap(x)),
    )
    return agg.select(
        *(["group"] if grouped else []),
        "n_items",
        F.lit(n_bins).alias("n_bins"),
        F.round(F.when(F.col("n_items") > 0, ece), 6).alias("ece"),
        F.round(F.when(F.col("n_items") > 0, max_gap), 6)
        .alias("max_gap"),
    )


def brier_score(
    df: DataFrame,
    *,
    label_col: str,
    pred_col: str,
    conf_col: str,
) -> DataFrame:
    """Brier score of a classifier's confidence against its binary
    correctness (Brier 1950): mean over predictions of
    (correct - confidence)^2 — ECE's proper-scoring-rule companion
    (`expected_calibration_error` measures calibration alone; the
    Brier score is calibration + refinement in one number, and
    unlike ECE needs no binning choice).

    Order-independence under the module rule, overflow-aware:
    confidences quantize to 4 dp and the per-row squared gap is an
    INTEGER ((correct*1e4 - round(conf*1e4))^2 <= 1e8), so the
    cross-row sum is an exact long — safe to ~9e10 rows, corpus
    scale — and the single float division happens in the final row:
    brier = sum_sq / (n * 1e8). Confidence must lie in [0, 1]; NULL
    label/pred/conf rows are excluded. Returns ONE row:
    (n_items, accuracy, brier), 6 dp. Composed from `brier_sums` ->
    `brier_from_sums` (the psi/confusion streaming-state
    factoring)."""
    return brier_from_sums(
        brier_sums(
            df, label_col=label_col, pred_col=pred_col,
            conf_col=conf_col,
        )
    )


def brier_score_grouped(
    df: DataFrame,
    *,
    label_col: str,
    pred_col: str,
    conf_col: str,
    group_col: str,
) -> DataFrame:
    """`brier_score` stratified by `group_col` — one
    (group, n_items, accuracy, brier) row per group, the per-language
    / per-source proper-scoring companion of
    `expected_calibration_error_grouped`: same exact-integer row
    sums keyed by group, so a single-group input replays
    `brier_score` exactly (pinned in tests) and the state is G rows,
    CARDINALITY-INDEPENDENT. Rows with NULL group are excluded."""
    return brier_from_sums(
        brier_sums(
            df, label_col=label_col, pred_col=pred_col,
            conf_col=conf_col, group_col=group_col,
        )
    )


def brier_sums(
    df: DataFrame,
    *,
    label_col: str,
    pred_col: str,
    conf_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """The (group?, n_items, oks, sq) integer-sum stage of
    `brier_score` — the mergeable state the streaming maintainer
    (`streaming.pipeline.brier_stream`) SUM-merges per micro-batch:
    all three columns are exact long sums (the per-row squared gap
    (ok*1e4 - round(conf*1e4))^2 <= 1e8 is itself an integer), so
    the merged state equals the single-pass batch sums regardless
    of chunking. Ungrouped state is ONE row; grouped, G rows."""
    lab, pr, cf = F.col(label_col), F.col(pred_col), F.col(conf_col)
    keep = lab.isNotNull() & pr.isNotNull() & cf.isNotNull()
    cols = [
        (lab == pr).cast("long").alias("_ok"),
        F.round(cf * 1e4).cast("long").alias("_c4"),
    ]
    if group_col is not None:
        keep = keep & F.col(group_col).isNotNull()
        cols = [F.col(group_col).alias("group"), *cols]
    base = df.where(keep).select(*cols)
    d = F.col("_ok") * 10000 - F.col("_c4")
    aggs = [
        F.count(F.lit(1)).alias("n_items"),
        F.coalesce(F.sum("_ok"), F.lit(0).cast("long")).alias("oks"),
        F.coalesce(F.sum(d * d), F.lit(0).cast("long")).alias("sq"),
    ]
    return (base.groupBy("group").agg(*aggs) if group_col is not None
            else base.agg(*aggs))


def brier_from_sums(sums: DataFrame) -> DataFrame:
    """`brier_score`'s final stage over a (n_items, oks, sq) sums
    table (see `brier_sums`) — factored out so the streaming state
    feeds the LITERAL batch code and the batch twin gates the stream
    verbatim (the family contract). A leading `group` column (the
    grouped form's state) passes through."""
    grouped = "group" in sums.columns
    ok = F.when(F.col("n_items") > 0,
                F.col("oks") / F.col("n_items"))
    br = F.when(F.col("n_items") > 0,
                F.col("sq") / (F.col("n_items") * F.lit(1e8)))
    return sums.select(
        *(["group"] if grouped else []),
        "n_items",
        F.round(ok, 6).alias("accuracy"),
        F.round(br, 6).alias("brier"),
    )


def reliability_diagram(
    df: DataFrame,
    *,
    label_col: str,
    pred_col: str,
    conf_col: str,
    n_bins: int = 10,
    group_col: str | None = None,
) -> DataFrame:
    """The per-bin calibration table behind
    `expected_calibration_error` — the data a reliability diagram
    (Niculescu-Mizil & Caruana 2005) plots: for each occupied
    confidence bin, the count, the observed accuracy, the mean
    confidence, and their gap. ECE compresses this table to one
    number; the diagram is what a calibration REVIEW actually reads
    (which bins are over/under-confident, and with how much mass).

    Same quantized-integer bin state as ECE (`ece_binned_counts` —
    both ratios are exact-integer quotients computed per bin, never
    summed as floats across bins), so the table replays bit-for-bit
    and the streaming ECE state (`streaming.pipeline.ece_stream`)
    feeds it directly. Empty bins are omitted (a diagram plots
    occupied bins; ECE's fold never needed the empty ones either).
    Returns one row per (group?,) occupied bin:
    (group?, bin, nb, acc, conf, gap), 6 dp."""
    return reliability_from_binned(
        ece_binned_counts(
            df, label_col=label_col, pred_col=pred_col,
            conf_col=conf_col, n_bins=n_bins, group_col=group_col,
        )
    )


def reliability_from_binned(binned: DataFrame) -> DataFrame:
    """`reliability_diagram`'s final stage over a (bin, nb, ok, c6)
    count table (see `ece_binned_counts`) — per-bin exact-integer
    quotients only; a leading `group` column passes through."""
    grouped = "group" in binned.columns
    acc = F.col("ok") / F.col("nb")
    conf = F.col("c6") / (F.col("nb") * F.lit(1e6))
    return binned.select(
        *(["group"] if grouped else []),
        "bin",
        "nb",
        F.round(acc, 6).alias("acc"),
        F.round(conf, 6).alias("conf"),
        F.round(F.abs(acc - conf), 6).alias("gap"),
    )


def mcc_score(
    df: DataFrame, *, label_col: str, pred_col: str,
) -> DataFrame:
    """Multiclass Matthews correlation coefficient (Gorodkin 2004's
    R_K) of a classifier — the single-number summary that, unlike
    accuracy or macro-F1, stays honest under class imbalance (a
    majority-class guesser scores ~0, not ~majority share):

        mcc = (c*s - sum_k p_k*t_k)
              / sqrt((s^2 - sum_k p_k^2) * (s^2 - sum_k t_k^2))

    with s total predictions, c correct, t_k/p_k the true/predicted
    counts of class k. Derives entirely from the (label, pred, n)
    confusion counts, so the streaming state
    (`streaming.pipeline.confusion_counts_stream`) feeds
    `mcc_from_counts` directly and batch gates stream for free.
    Returns ONE row: (n_items, accuracy, mcc), 6 dp; mcc NULL when a
    marginal is degenerate (single observed class on either side —
    the statistic's own undefined case)."""
    return mcc_from_counts(
        confusion_counts(df, label_col=label_col, pred_col=pred_col)
    )


def mcc_from_counts(counts: DataFrame) -> DataFrame:
    """`mcc_score`'s final stage over a (label, pred, n) confusion
    count table (see `confusion_counts`). Overflow-aware under the
    module rule: every cross-class sum (sum p_k*t_k, sum p_k^2,
    sum t_k^2, and c*s) is computed in DECIMAL(38,0) — p_k^2 alone
    exceeds long range past ~3e9 rows per class — and the single
    float conversion happens in the final row's division. All sums
    are integer-exact, so the value replays bit-for-bit."""
    dec = "decimal(38,0)"
    totals = counts.agg(
        F.coalesce(F.sum("n"), F.lit(0).cast("long")).alias("s"),
        F.coalesce(
            F.sum(F.when(F.col("label") == F.col("pred"),
                         F.col("n"))),
            F.lit(0).cast("long"),
        ).alias("c"),
    )
    t = counts.groupBy(F.col("label").alias("k")).agg(
        F.sum("n").alias("tk")
    )
    p = counts.groupBy(F.col("pred").alias("k")).agg(
        F.sum("n").alias("pk")
    )
    spt = p.join(t, "k").agg(
        F.coalesce(
            F.sum(F.col("pk").cast(dec) * F.col("tk").cast(dec)),
            F.lit(0).cast(dec),
        ).alias("spt")
    )
    sp2 = p.agg(
        F.coalesce(
            F.sum(F.col("pk").cast(dec) * F.col("pk").cast(dec)),
            F.lit(0).cast(dec),
        ).alias("sp2")
    )
    st2 = t.agg(
        F.coalesce(
            F.sum(F.col("tk").cast(dec) * F.col("tk").cast(dec)),
            F.lit(0).cast(dec),
        ).alias("st2")
    )
    s, c = F.col("s").cast(dec), F.col("c").cast(dec)
    d1 = s * s - F.col("sp2")
    d2 = s * s - F.col("st2")
    mcc = F.when(
        (d1 > 0) & (d2 > 0),
        (c * s - F.col("spt")).cast("double")
        / F.sqrt(d1.cast("double") * d2.cast("double")),
    )
    acc = F.when(F.col("s") > 0, F.col("c") / F.col("s"))
    return (
        totals.crossJoin(spt).crossJoin(sp2).crossJoin(st2)
        .select(
            F.col("s").alias("n_items"),
            F.round(acc, 6).alias("accuracy"),
            F.round(mcc, 6).alias("mcc"),
        )
    )


def auc_score(
    df: DataFrame, *, label_col: str, score_col: str,
) -> DataFrame:
    """Binary ROC AUC of a score against a 0/1 (or boolean) label —
    the discrimination companion to the calibration suite: ECE asks
    "is the confidence honest", AUC asks "does a higher score
    actually mean a higher chance of being right" (for an LLM judge:
    label = judged-correct, score = its confidence). Equals the
    probability a random positive outscores a random negative, ties
    counted half (the Mann-Whitney U form).

    Order-independence under the module rule with EXACT tie
    handling: per-distinct-score (pos, neg) counts first, then over
    scores ascending U2 = sum_s pos_s * (2 * neg_below_s + neg_s) —
    an exact integer (the half-tie credit rides the factor of 2) —
    and auc = U2 / (2 * n_pos * n_neg) is the single float division
    in the final row. Cross-score products ride DECIMAL(38,0) (the
    mcc rule). Returns ONE row: (n_pos, n_neg, auc), 6 dp; auc NULL
    when either class is empty. NULL labels/scores are excluded.

    Scale shape: one map-side-combined groupBy(score) — bounded by
    SCORE CARDINALITY, which is why scores should be quantized (the
    ks_statistic rule: quantize-first is also the state-size rule) —
    then one ordered cumulative over the distinct-score table and a
    constant-size agg. Composed from `auc_counts` ->
    `auc_from_counts`, the factoring that lets the streaming
    maintainer (`streaming.pipeline.auc_stream`) SUM-merge the
    counts."""
    return auc_from_counts(
        auc_counts(df, label_col=label_col, score_col=score_col)
    )


def auc_score_grouped(
    df: DataFrame, *, label_col: str, score_col: str, group_col: str,
) -> DataFrame:
    """`auc_score` stratified by `group_col` — one
    (group, n_pos, n_neg, auc) row per group: a judge that
    discriminates well overall can be near-random on one language,
    which is exactly what the per-group AUC surfaces (the
    discrimination sibling of `expected_calibration_error_grouped`).
    Same tie-exact integer rank sums keyed by group, so a
    single-group input replays `auc_score` exactly (pinned in
    tests); the per-group cumulative runs inside a
    partitionBy(group) window — bounded by per-group score
    cardinality, never corpus rows. Rows with NULL group are
    excluded."""
    return auc_from_counts(
        auc_counts(df, label_col=label_col, score_col=score_col,
                   group_col=group_col)
    )


def auc_counts(
    df: DataFrame, *, label_col: str, score_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """The (group?, score, pos, neg) counting stage of `auc_score` —
    the mergeable state the streaming maintainer SUM-merges per
    micro-batch (per-score class counts are exactly associative).
    State bounded by score cardinality (x G when grouped),
    corpus-size-independent for quantized scores."""
    y = F.col(label_col).cast("boolean").cast("long")
    s = F.col(score_col)
    keep = s.isNotNull() & F.col(label_col).isNotNull()
    cols = [s.cast("double").alias("score"), y.alias("_y")]
    keys = ["score"]
    if group_col is not None:
        keep = keep & F.col(group_col).isNotNull()
        cols = [F.col(group_col).alias("group"), *cols]
        keys = ["group", "score"]
    return (
        df.where(keep)
        .select(*cols)
        .groupBy(*keys)
        .agg(
            F.sum("_y").alias("pos"),
            F.sum(F.lit(1) - F.col("_y")).alias("neg"),
        )
    )


def auc_from_counts(counts: DataFrame) -> DataFrame:
    """`auc_score`'s final stage over a (score, pos, neg) count table
    (see `auc_counts`) — factored out so the streaming state feeds
    the LITERAL batch code and the batch twin gates the stream
    verbatim (the family contract).

    Defensive re-merge: the cumulative window must see ONE row per
    score — duplicate score rows (e.g. per-batch counts concatenated
    without the SUM-merge) would make the neg-below prefix depend on
    arbitrary tie order, a silently NONDETERMINISTIC result — so the
    stage sums per score first (a no-op on already-merged state).
    A leading `group` column (the grouped form's state) turns the
    cumulative and the aggregate into per-group computations —
    the window partitions by group, so no task ever holds more than
    one group's distinct scores."""
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    grouped = "group" in counts.columns
    gkeys = ["group"] if grouped else []
    merged = counts.groupBy(*gkeys, "score").agg(
        F.sum("pos").alias("pos"), F.sum("neg").alias("neg")
    )
    w = (Window.partitionBy("group") if grouped else Window
         ).orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = merged.select(
        *gkeys, "pos", "neg",
        F.coalesce(F.sum("neg").over(w), F.lit(0).cast("long"))
        .alias("_bneg"),
    )
    u2 = F.sum(
        F.col("pos").cast(dec)
        * (F.lit(2).cast(dec) * F.col("_bneg").cast(dec)
           + F.col("neg").cast(dec))
    )
    aggs = [
        F.coalesce(u2, F.lit(0).cast(dec)).alias("u2"),
        F.coalesce(F.sum("pos"), F.lit(0).cast("long")).alias("np"),
        F.coalesce(F.sum("neg"), F.lit(0).cast("long")).alias("nn"),
    ]
    agg = (cum.groupBy("group").agg(*aggs) if grouped
           else cum.agg(*aggs))
    auc = F.when(
        (F.col("np") > 0) & (F.col("nn") > 0),
        F.col("u2").cast("double")
        / (F.lit(2.0) * F.col("np").cast("double")
           * F.col("nn").cast("double")),
    )
    return agg.select(
        *gkeys,
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        F.round(auc, 6).alias("auc"),
    )


def pr_auc_score(
    df: DataFrame, *, label_col: str, score_col: str,
) -> DataFrame:
    """Area under the precision-recall curve (average precision, the
    step-interpolated form — Zhu 2004; sklearn's
    `average_precision_score`): AP = sum_k (R_k - R_{k-1}) * P_k over
    score thresholds descending, ties grouped. The
    imbalance-appropriate companion to `auc_score`: when positives
    are rare (contamination, PII, judge failures in a mostly-correct
    corpus), ROC AUC is dominated by the abundant negatives while PR
    directly measures "of what the gate flags, how much is real" —
    a near-useless detector can post ROC AUC 0.9 at 0.1% prevalence
    and PR-AUC near the prevalence floor.

    Derives from the SAME (score, pos, neg) counts state as
    `auc_score` (`auc_counts` — one maintained state serves both
    discrimination summaries): per distinct score descending,
    TP/FP are INCLUSIVE cumulative class counts (exact integers),
    the per-threshold term is pos * (TP / (TP + FP)) — each float op
    a single IEEE rounding from exact-integer operands — and the
    cross-threshold sum is an ORDERED LEFT FOLD in score-descending
    order (the psi/ece determinism rule: a groupBy float sum would
    depend on partial-aggregation order), with AP = fold / n_pos the
    single final division. Returns ONE row: (n_pos, n_neg, pr_auc),
    6 dp; pr_auc NULL when there are no positives (recall
    undefined). NULL labels/scores are excluded.

    Scale shape: identical to `auc_score` — one map-side-combined
    groupBy(score) bounded by SCORE CARDINALITY (quantize scores —
    the state-size rule), then one ordered cumulative + one bounded
    collect over the distinct-score table only."""
    return pr_auc_from_counts(
        auc_counts(df, label_col=label_col, score_col=score_col)
    )


def pr_auc_score_grouped(
    df: DataFrame, *, label_col: str, score_col: str, group_col: str,
) -> DataFrame:
    """`pr_auc_score` stratified by `group_col` — one
    (group, n_pos, n_neg, pr_auc) row per group: class balance
    varies BY SOURCE (one language's corpus can be 50x dirtier), so
    the per-group PR summary catches a gate that only works where
    positives are common. Same inclusive cumulative counts keyed by
    group (a single-group input replays `pr_auc_score` exactly —
    pinned in tests); the per-group fold is bounded by per-group
    score cardinality. Rows with NULL group are excluded."""
    return pr_auc_from_counts(
        auc_counts(df, label_col=label_col, score_col=score_col,
                   group_col=group_col)
    )


def pr_auc_from_counts(counts: DataFrame) -> DataFrame:
    """`pr_auc_score`'s final stage over a (group?, score, pos, neg)
    count table (see `auc_counts`) — factored out so the SAME
    streaming state (`streaming.pipeline.auc_stream`) feeds both the
    ROC and PR summaries and the batch twin gates the stream
    verbatim (the family contract). Defensive re-merge first, like
    `auc_from_counts`: duplicate score rows would corrupt the
    cumulative TP/FP. The ordered fold keeps the float summation
    order pinned (score descending) so the DuckDB twin replays
    bit-for-bit; the collect_list is over DISTINCT scores only —
    the same cardinality bound as the cumulative window."""
    from pyspark.sql import Window

    grouped = "group" in counts.columns
    gkeys = ["group"] if grouped else []
    merged = counts.groupBy(*gkeys, "score").agg(
        F.sum("pos").alias("pos"), F.sum("neg").alias("neg")
    )
    w = (Window.partitionBy("group") if grouped else Window
         ).orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = merged.select(
        *gkeys, "score", "pos", "neg",
        F.sum("pos").over(w).alias("_tp"),
        F.sum("neg").over(w).alias("_fp"),
    )
    # dRecall * precision with n_pos deferred: pos * (tp / (tp + fp)).
    # Division FIRST — tp, fp, pos are exact integers (< 2^53, hence
    # exact doubles), so each op is one IEEE rounding and the product
    # never overflows, unlike an integer pos * tp at corpus scale.
    term = (
        F.col("pos").cast("double")
        * (F.col("_tp").cast("double")
           / (F.col("_tp") + F.col("_fp")).cast("double"))
    )
    rows = cum.select(*gkeys, "score", "pos", "neg",
                      term.alias("_term"))
    aggs = [
        F.sort_array(
            F.collect_list(F.struct("score", "_term"))
        ).alias("arr"),
        F.coalesce(F.sum("pos"), F.lit(0).cast("long")).alias("np"),
        F.coalesce(F.sum("neg"), F.lit(0).cast("long")).alias("nn"),
    ]
    agg = (rows.groupBy("group").agg(*aggs) if grouped
           else rows.agg(*aggs))
    ap_sum = F.aggregate(
        F.reverse(F.col("arr")), F.lit(0.0),
        lambda acc, x: acc + x["_term"],
    )
    ap = F.when(F.col("np") > 0, ap_sum / F.col("np").cast("double"))
    return agg.select(
        *gkeys,
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        F.round(ap, 6).alias("pr_auc"),
    )


def calibration_drift(
    ref_binned: DataFrame, cur_binned: DataFrame, *, n_bins: int = 10,
) -> DataFrame:
    """Per-group calibration DELTA between two frozen calibration
    snapshots — "which group's calibration MOVED since the reference
    freeze": the per-group ECE/AUC monitors detect a judge drifting
    on one language, but nothing alarms on the difference between
    two snapshots until this op (the `corpus_drift`/`grouped_drift`
    pattern applied to the G x n_bins calibration state).

    Inputs are two GROUPED `ece_binned_counts` states (the frozen
    reference — e.g. the calibration at dataset-freeze time, possibly
    read back from a streaming maintainer's state dir — and the
    current one). Each side reduces through the LITERAL
    `ece_from_binned` batch stage (G rows), then ONE bounded
    full-outer join on group — G rows total, never corpus rows — so
    a group present in only one snapshot surfaces as 'new' (appeared
    since the freeze) or 'gone' rather than vanishing in an inner
    join. ece_delta = |ece_cur - ece_ref| (both already 6-dp — the
    subtraction is deterministic), classified against literal
    thresholds: < 0.02 'stable', < 0.05 'moderate', else 'shifted'.
    Returns one row per group:
    (group, n_ref, n_cur, ece_ref, ece_cur, ece_delta, drift_level),
    6 dp."""
    a = ece_from_binned(ref_binned, n_bins=n_bins).select(
        "group",
        F.col("n_items").alias("n_ref"),
        F.col("ece").alias("ece_ref"),
    )
    b = ece_from_binned(cur_binned, n_bins=n_bins).select(
        "group",
        F.col("n_items").alias("n_cur"),
        F.col("ece").alias("ece_cur"),
    )
    j = a.join(b, "group", "full_outer")
    delta = F.round(F.abs(F.col("ece_cur") - F.col("ece_ref")), 6)
    zero = F.lit(0).cast("long")
    return j.select(
        "group",
        F.coalesce("n_ref", zero).alias("n_ref"),
        F.coalesce("n_cur", zero).alias("n_cur"),
        "ece_ref",
        "ece_cur",
        delta.alias("ece_delta"),
        F.when(F.col("n_ref").isNull(), F.lit("new"))
        .when(F.col("n_cur").isNull(), F.lit("gone"))
        .when(delta < 0.02, F.lit("stable"))
        .when(delta < 0.05, F.lit("moderate"))
        .otherwise(F.lit("shifted")).alias("drift_level"),
    )


def rank_correlation(
    df: DataFrame, *, a_col: str, b_col: str,
) -> DataFrame:
    """Kendall tau-b and Spearman rho between two per-document
    scores — "do two scorers RANK the corpus the same way", the
    continuous-score sibling of the kappa trio (kappa compares
    CATEGORICAL judges; a quality-gate pipeline's judges are usually
    continuous scorers, and what selection cares about is rank
    agreement, not value agreement: if a cheap proxy rank-agrees
    with the expensive composite, the proxy can drive the 100 TB
    pre-filter).

    Both statistics reduce over the JOINT CONTINGENCY of the two
    quantized scores — (a, b, n) cell counts (`rankcorr_counts`),
    the SUM-mergeable state the streaming maintainer keeps — so the
    whole computation is bounded by SCORE CARDINALITY (quantize
    first: the auc/ks state-size rule), never corpus rows, and every
    cross-row sum is an exact integer (the module rule).

    Tie-exact algebra, all from cell/marginal counts:
    - Concordant/discordant pair counts P, Q by 2D dominance sweep
      on the DENSIFIED grid (distinct-a x distinct-b, absent cells
      n=0): cb_lt(a,b) = sum_{b'<b} n(a,b') per a-row, then
      p_lt(a,b) = sum_{a'<a} cb_lt(a',b) per b-column — two chained
      windows, no self-join — and P = sum n*p_lt (each unordered
      concordant pair counted once, at its larger-a member); Q the
      same with cb_gt. Products ride DECIMAL(38,0) (the mcc rule).
    - Doubled tie terms Da = n(n-1) - sum_a r_a(r_a-1) (and Db),
      so tau_b = 2(P - Q) / (sqrt(Da) * sqrt(Db)) with NO /2
      anywhere — every intermediate stays integer.
    - Spearman via Pearson over DOUBLED average ranks (invariant
      under the x2 affine scale): da = 2*below_a + r_a + 1 is an
      exact integer, and the six weighted power sums
      (S1, Sa, Sb, Saa, Sbb, Sab) are DECIMAL(38,0)-exact for
      n <~ 2.9e12 rows (Saa <= 4n^3 < 10^38).
    Floats appear only in the final row: each exact sum casts to
    double once, then tau = 2(P-Q)/(sqrt(Da)sqrt(Db)) and
    rho = (S1*Sab - Sa*Sb)/(sqrt(S1*Saa - Sa^2)*sqrt(S1*Sbb - Sb^2))
    — the identical expression tree in the DuckDB twin, so the twin
    replays bit-for-bit. Degeneracy is decided on EXACT integers,
    not float variance: Da > 0 and Db > 0 (i.e. both scores take
    >= 2 distinct values) or both statistics are NULL.

    Returns ONE row (n, tau_b, spearman_rho), 6 dp; NULL a/b rows
    are excluded. Scale shape: one map-side-combined
    groupBy(a, b) over the corpus, then everything downstream runs
    on the K_a x K_b dense grid (quantized: thousands of cells) —
    two windows, two marginal aggregates, one constant-size final
    row. Quantize-first is a HARD precondition here, not advice:
    the densified grid is K_a * K_b cells — QUADRATIC in
    unquantized per-axis cardinality (raw 5-dp scores over 200k
    rows would densify to ~4e10 cells), where the AUC/KS state
    rule is merely linear. FLOOR(score * scale) bucket indexes are
    the right quantizer (monotone, engine-portable — see the gated
    entries); up to ~1000 buckets per axis costs seconds, a
    5000x1000 grid (5e6 dense cells) ~86 s — measured in
    SCALING.md."""
    return rankcorr_from_counts(
        rankcorr_counts(df, a_col=a_col, b_col=b_col)
    )


def rank_correlation_grouped(
    df: DataFrame, *, a_col: str, b_col: str, group_col: str,
) -> DataFrame:
    """`rank_correlation` stratified by `group_col` — one
    (group, n, tau_b, spearman_rho) row per group: two scorers can
    rank-agree overall yet disagree on ONE language (different
    stopword lists, different length norms), which is exactly when
    a proxy-driven pre-filter silently skews that source. Same
    tie-exact cell algebra keyed by group — the dominance windows
    partition by group, so no task ever holds more than one group's
    grid; a single-group input replays `rank_correlation` exactly
    (pinned in tests). Rows with NULL group are excluded."""
    return rankcorr_from_counts(
        rankcorr_counts(df, a_col=a_col, b_col=b_col,
                        group_col=group_col)
    )


def rankcorr_counts(
    df: DataFrame, *, a_col: str, b_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """The (group?, a, b, n) joint-contingency stage of
    `rank_correlation` — the mergeable state the streaming
    maintainer SUM-merges per micro-batch (cell counts are exactly
    associative). State bounded by K_a x K_b score cardinality
    (x G when grouped) — quantize scores first."""
    a = F.col(a_col)
    b = F.col(b_col)
    keep = a.isNotNull() & b.isNotNull()
    cols = [a.cast("double").alias("a"), b.cast("double").alias("b")]
    keys = ["a", "b"]
    if group_col is not None:
        keep = keep & F.col(group_col).isNotNull()
        cols = [F.col(group_col).alias("group"), *cols]
        keys = ["group", "a", "b"]
    return (
        df.where(keep)
        .select(*cols)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def rankcorr_from_counts(counts: DataFrame) -> DataFrame:
    """`rank_correlation`'s final stage over a (group?, a, b, n)
    cell table (see `rankcorr_counts`) — factored out so the
    streaming state feeds the LITERAL batch code and the batch twin
    gates the stream verbatim (the family contract). Defensive
    re-merge first (the auc_from_counts rule): duplicate cell rows
    would corrupt the dominance prefix sums. See
    `rank_correlation` for the algebra and determinism contract."""
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    grouped = "group" in counts.columns
    gkeys = ["group"] if grouped else []
    merged = counts.groupBy(*gkeys, "a", "b").agg(
        F.sum("n").alias("n")
    )
    # The cell table feeds EIGHT downstream subtrees (grid distincts,
    # densify, both marginals, the power-sum join) — without a
    # lineage cut Catalyst recomputes it per subtree, i.e. EIGHT
    # corpus scans (measured; the scan-budget test pins the fix).
    # A LAZY localCheckpoint materializes the bounded K_a x K_b
    # table once at first action and keeps this function
    # transformation-only; recompute-on-executor-loss is cheap at
    # grid size (the dedup.py localCheckpoint rationale, inverted:
    # there the intermediate was big and lineage the hazard, here
    # the intermediate is tiny and the 8x scan is).
    merged = merged.localCheckpoint(eager=False)

    # Densify: the dominance sweep needs every (a, b) grid point so
    # the per-column prefix over a sees an aligned b value.
    das = merged.select(*gkeys, "a").distinct()
    dbs = merged.select(*gkeys, "b").distinct()
    grid = das.join(dbs, on=gkeys) if grouped else das.crossJoin(dbs)
    dense = grid.join(merged, on=[*gkeys, "a", "b"], how="left").select(
        *gkeys, "a", "b",
        F.coalesce("n", F.lit(0).cast("long")).alias("n"),
    )

    zero = F.lit(0).cast("long")
    wb = Window.partitionBy(*gkeys, "a").orderBy("b")
    cb = dense.select(
        *gkeys, "a", "b", "n",
        F.coalesce(
            F.sum("n").over(
                wb.rowsBetween(Window.unboundedPreceding, -1)),
            zero).alias("cb_lt"),
        F.coalesce(
            F.sum("n").over(
                wb.rowsBetween(1, Window.unboundedFollowing)),
            zero).alias("cb_gt"),
    )
    wa = Window.partitionBy(*gkeys, "b").orderBy("a").rowsBetween(
        Window.unboundedPreceding, -1
    )
    dom = cb.select(
        *gkeys, "n",
        F.coalesce(F.sum("cb_lt").over(wa), zero).alias("p_lt"),
        F.coalesce(F.sum("cb_gt").over(wa), zero).alias("q_lt"),
    )
    zdec = F.lit(0).cast(dec)
    pq_aggs = [
        F.coalesce(F.sum(F.col("n").cast(dec)
                         * F.col("p_lt").cast(dec)), zdec).alias("p"),
        F.coalesce(F.sum(F.col("n").cast(dec)
                         * F.col("q_lt").cast(dec)), zdec).alias("q"),
        F.coalesce(F.sum("n"), zero).alias("n_total"),
    ]
    pq = (dom.groupBy("group").agg(*pq_aggs) if grouped
          else dom.agg(*pq_aggs))

    def _marginal(key):
        # (group?, key, r, dr): marginal count r and DOUBLED average
        # rank dr = 2*below + r + 1 (exact integer), plus the doubled
        # tie sum per group.
        marg = merged.groupBy(*gkeys, key).agg(F.sum("n").alias("r"))
        w = Window.partitionBy(*gkeys).orderBy(key).rowsBetween(
            Window.unboundedPreceding, -1
        )
        ranked = marg.select(
            *gkeys, key, "r",
            (F.lit(2) * F.coalesce(F.sum("r").over(w), zero)
             + F.col("r") + F.lit(1)).alias(f"d{key}"),
        )
        t_aggs = [
            F.coalesce(
                F.sum(F.col("r").cast(dec)
                      * (F.col("r") - 1).cast(dec)), zdec
            ).alias(f"t{key}")
        ]
        ties = (ranked.groupBy("group").agg(*t_aggs) if grouped
                else ranked.agg(*t_aggs))
        return ranked, ties

    ra, ta = _marginal("a")
    rb, tb = _marginal("b")

    cells = (
        merged
        .join(ra.select(*gkeys, "a", "da"), on=[*gkeys, "a"])
        .join(rb.select(*gkeys, "b", "db"), on=[*gkeys, "b"])
    )
    nd = F.col("n").cast(dec)
    sp_aggs = [
        F.coalesce(F.sum(nd), zdec).alias("s1"),
        F.coalesce(F.sum(nd * F.col("da").cast(dec)), zdec).alias("sa"),
        F.coalesce(F.sum(nd * F.col("db").cast(dec)), zdec).alias("sb"),
        F.coalesce(F.sum(nd * F.col("da").cast(dec)
                         * F.col("da").cast(dec)), zdec).alias("saa"),
        F.coalesce(F.sum(nd * F.col("db").cast(dec)
                         * F.col("db").cast(dec)), zdec).alias("sbb"),
        F.coalesce(F.sum(nd * F.col("da").cast(dec)
                         * F.col("db").cast(dec)), zdec).alias("sab"),
    ]
    sp = (cells.groupBy("group").agg(*sp_aggs) if grouped
          else cells.agg(*sp_aggs))

    if grouped:
        # Every group with >= 1 cell appears in all three one-row-
        # per-group tables — inner joins on the bounded G-row frames.
        full = pq.join(ta, "group").join(tb, "group").join(sp, "group")
    else:
        full = pq.crossJoin(ta).crossJoin(tb).crossJoin(sp)

    n_t = F.col("n_total")
    da2 = (n_t.cast(dec) * (n_t - 1).cast(dec) - F.col("ta")).alias("da2")
    db2 = (n_t.cast(dec) * (n_t - 1).cast(dec) - F.col("tb")).alias("db2")
    full = full.select(*gkeys, "p", "q", "n_total",
                       "s1", "sa", "sb", "saa", "sbb", "sab",
                       da2, db2)
    ok = (F.col("da2") > 0) & (F.col("db2") > 0)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    tau = F.when(
        ok,
        F.lit(2.0) * (d("p") - d("q"))
        / (F.sqrt(d("da2")) * F.sqrt(d("db2"))),
    )
    rho = F.when(
        ok,
        (d("s1") * d("sab") - d("sa") * d("sb"))
        / (F.sqrt(d("s1") * d("saa") - d("sa") * d("sa"))
           * F.sqrt(d("s1") * d("sbb") - d("sb") * d("sb"))),
    )
    return full.select(
        *gkeys,
        F.col("n_total").alias("n"),
        F.round(tau, 6).alias("tau_b"),
        F.round(rho, 6).alias("spearman_rho"),
    )
