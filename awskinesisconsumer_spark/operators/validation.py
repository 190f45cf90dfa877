"""Rule-based data validation (expectation checks) — the data-QA gate
every production corpus build runs before publishing a snapshot:
null-rate ceilings, range checks, set membership, uniqueness,
referential integrity. The reference has no equivalent (its inputs are
trusted AWS streams); this is north-star pipeline surface.

Scale shape: `validate_expectations` evaluates EVERY rule in ONE scan
as conditional aggregates (count_if of the violated predicate) — no
joins, no shuffle beyond the single final aggregate, output is
n_rules rows regardless of input size. `check_referential` is one
left-anti aggregate per foreign key (broadcast when the dimension
fits). Both emit plain counts so the SQL twin is trivial aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate_expectations(
    df: DataFrame,
    rules: dict[str, Column],
    *,
    round_dp: int = 6,
) -> DataFrame:
    """Evaluate named expectation rules in ONE pass.

    `rules` maps rule name -> boolean Column that is TRUE when the row
    SATISFIES the expectation (NULL counts as a violation — an
    expectation that cannot be proven holds is treated as failed,
    the conservative convention). Returns one row per rule:
    (rule, n_rows, n_violations, violation_rate, passed).

    The whole check is a single aggregate over one scan: each rule
    becomes a count_if(NOT coalesce(cond, false)) running in the same
    stage, so adding rules costs columns, not passes. Rates round to
    `round_dp` so cross-engine hashes agree.
    """
    if not rules:
        raise ValueError("validate_expectations: rules must be non-empty")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, cond in rules.items():
        aggs.append(
            F.count_if(~F.coalesce(cond, F.lit(False))).alias(f"_v_{name}")
        )
    row = df.agg(*aggs)
    # One agg row -> explode a rule-struct array: a union of per-rule
    # selects would re-embed the aggregate subplan once per rule and
    # can replan the scan per branch; the explode keeps it ONE
    # scan + ONE aggregate no matter how many rules.
    structs = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col("_n").alias("n_rows"),
            F.col(f"_v_{name}").alias("n_violations"),
            F.round(
                F.when(F.col("_n") > 0,
                       F.col(f"_v_{name}") / F.col("_n"))
                .otherwise(F.lit(0.0)),
                round_dp,
            ).alias("violation_rate"),
            (F.col(f"_v_{name}") == 0).alias("passed"),
        )
        for name in rules
    ]
    return (
        row.select(F.explode(F.array(*structs)).alias("_r"))
        .select("_r.*")
    )


def check_referential(
    fact: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str,
    dim_key: str,
    rule: str | None = None,
) -> DataFrame:
    """Referential-integrity check: count fact rows whose non-null key
    has no match in the dimension. ONE left join of the fact keys to
    the distinct dimension keys (broadcast when the dimension fits)
    with a match flag, then one aggregate computing total and orphan
    counts together — the fact side is scanned once and NOTHING runs
    until the returned DataFrame is executed (fully lazy, matching
    `validate_expectations`). NULL keys are skipped (they belong to a
    null-rate rule, not an FK rule). Output matches
    `validate_expectations`' row shape, so the two union into one
    validation report.
    """
    name = rule or f"fk_{fact_key}_in_{dim_key}"
    keys = fact.where(F.col(fact_key).isNotNull()).select(fact_key)
    dim_keys = (
        dim.select(F.col(dim_key).alias(fact_key)).distinct()
        .withColumn("_matched", F.lit(True))
    )
    joined = keys.join(dim_keys, fact_key, "left")
    n = F.count(F.lit(1))
    v = F.count_if(F.col("_matched").isNull())
    return joined.agg(
        F.lit(name).alias("rule"),
        n.alias("n_rows"),
        v.alias("n_violations"),
        F.round(
            F.when(n > 0, v / n).otherwise(F.lit(0.0)), 6
        ).alias("violation_rate"),
        (v == F.lit(0)).alias("passed"),
    )
