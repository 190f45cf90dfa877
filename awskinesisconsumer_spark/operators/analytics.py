"""Analytical operators beyond the plain SQL surface.

`skyline_2d` — distributed Pareto frontier (skyline) over two metric
columns. The naive formulation is a self-join (``NOT EXISTS`` over
all pairs — quadratic) or a single global sort window (one
partition — a driver-shaped bottleneck at scale). This implementation
is the classic two-phase distributed skyline specialized to 2-D,
where it becomes *exact* with no final merge pass:

1. range-bucket the minimized axis ``x`` into ``n_buckets`` fixed
   intervals (one cheap min/max agg for the bounds);
2. local skyline inside each bucket — a window partitioned BY BUCKET
   (parallel, never global) using a running lexicographic
   ``max(struct(y, -x))`` over the (x asc, y desc) prefix;
3. cross-bucket pruning with the per-bucket max-``y`` prefix maxima
   (an ``n_buckets``-row aggregate, broadcast back): every point in a
   strictly-lower bucket has strictly lower ``x``, so a survivor is
   globally non-dominated iff no cheaper bucket reaches its ``y``.

Total cost: one scan + one bucket-keyed shuffle + one tiny broadcast.
No reference analogue (the reference has no analytical query layer);
this extends the query surface the way SURVEY §2's extension rows do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Rows not dominated by any other row, where domination means
    ``other.x <= x AND other.y >= y`` with at least one strict
    inequality (minimize ``x``, maximize ``y``). Ties on both axes are
    mutually non-dominating: all tied rows are kept, so the output is
    a deterministic set. NULL metric rows are excluded.
    """
    x, y = F.col(x_col), F.col(y_col)
    base = df.where(x.isNotNull() & y.isNotNull())

    lo, hi = base.agg(F.min(x), F.max(x)).first()
    if lo is None:
        return base  # empty input
    width = (float(hi) - float(lo)) / n_buckets or 1.0

    bucketed = base.withColumn(
        "_b",
        F.least(
            F.floor((x - F.lit(float(lo))) / F.lit(width)),
            F.lit(n_buckets - 1),
        ).cast("int"),
    )

    # Phase 2 input first (computed from ALL rows of a bucket, but the
    # bucket max-y always survives the local skyline, so either input
    # gives the same maxima): per-bucket max y, then the prefix max
    # over strictly-lower buckets. n_buckets rows — the single-
    # partition window is a constant-size step, not a scale risk.
    wb = (
        Window.orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cheaper = (
        bucketed.groupBy("_b")
        .agg(F.max(y).alias("_bmax"))
        .select("_b", F.max("_bmax").over(wb).alias("_cheaper_max"))
    )

    # Phase 1: local skyline. In (x asc, y desc) prefix order, a
    # prior row dominates iff its y strictly exceeds ours, or ties
    # our y at strictly lower x — read both off the running
    # lexicographic max of struct(y, -x).
    wl = (
        Window.partitionBy("_b")
        .orderBy(x.asc(), y.desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = F.max(F.struct(y.alias("_my"), (-x).alias("_mnx"))).over(wl)
    local = bucketed.withColumn("_m", m).where(
        F.col("_m").isNull()
        | ~(
            (F.col("_m._my") > y)
            | ((F.col("_m._my") == y) & (-F.col("_m._mnx") < x))
        )
    )

    return (
        local.join(F.broadcast(cheaper), "_b", "left")
        .where(
            F.col("_cheaper_max").isNull() | (F.col("_cheaper_max") < y)
        )
        .drop("_b", "_m", "_cheaper_max")
    )


def conversion_funnel(
    df: DataFrame,
    *,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: tuple = ("signup", "click", "purchase"),
) -> DataFrame:
    """Ordered conversion funnel: a user reaches step i when an event
    of type steps[i] occurs STRICTLY AFTER their step i-1 time (first
    qualifying occurrence). Returns one row: total users, users
    reaching each step, and step-over-step conversion rates.

    Shape: the step times are chained per-user window minima — every
    window shares the user partition key, so Catalyst plans ONE
    shuffle and a chain of Window nodes over it; the per-user
    collapse and the final global rollup are hash aggregates with
    map-side combine. Nothing driver-side; at 100 TB the only wide
    exchange is the single user-keyed one.
    """
    cur = df
    prev_t = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev_t is not None:
            cond = cond & (F.col(ts_col) > F.col(prev_t))
        w = Window.partitionBy(user_col)
        cur = cur.withColumn(
            f"_t{i}", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev_t = f"_t{i}"

    per_user = cur.groupBy(user_col).agg(
        *[
            F.max(F.col(f"_t{i}").isNotNull().cast("long")).alias(f"_r{i}")
            for i in range(len(steps))
        ]
    )
    aggs = [F.count(F.lit(1)).alias("n_users")] + [
        F.sum(f"_r{i}").alias(f"n_step{i}") for i in range(len(steps))
    ]
    out = per_user.agg(*aggs)
    for i in range(1, len(steps)):
        out = out.withColumn(
            f"conv_{i}",
            F.when(
                F.col(f"n_step{i - 1}") > 0,
                F.round(
                    F.col(f"n_step{i}")
                    / F.col(f"n_step{i - 1}").cast("double"),
                    4,
                ),
            ),
        )
    return out


def zscore_outliers(
    df: DataFrame,
    *,
    key_col: str,
    value_col: str,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-group z-score outliers: rows whose value deviates from the
    group mean by at least `threshold` sample standard deviations.
    One grouped aggregate (map-side combine) + one join keyed on the
    group (AQE broadcasts the stats side — one row per group).

    Cross-engine determinism: the mean and stddev round to 6 dp FIRST,
    then the z-score is computed from the rounded stats and rounds to
    4 dp — so engine-level summation-order noise (~1e-15) is quantized
    away before it can flip the outlier threshold comparison.
    """
    stats = df.groupBy(key_col).agg(
        F.round(F.avg(value_col), 6).alias("_mu"),
        F.round(F.stddev_samp(value_col), 6).alias("_sd"),
    )
    return (
        df.join(stats, key_col)
        .where(F.col("_sd") > 0)
        .withColumn(
            "z",
            F.round(
                (F.col(value_col) - F.col("_mu")) / F.col("_sd"), 4
            ),
        )
        .where(F.abs(F.col("z")) >= threshold)
        .drop("_mu", "_sd")
    )
