"""Skew/bucketing utilities: salted agg equivalence + bucketed join
plans with no Exchange."""

from __future__ import annotations


from pyspark.sql import functions as F

from awskinesisconsumer_spark.io import load_table
from awskinesisconsumer_spark.operators.skew import (
    bucketed_join,
    salted_agg_sum,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


def test_salted_sum_equals_plain_sum(spark):
    ev = load_table(spark, "events", SF)
    salted = {
        (r.event_type): r.sum_value
        for r in salted_agg_sum(ev, key="event_type", value="value").collect()
    }
    plain = {
        (r.event_type): r.sum_value
        for r in ev.groupBy("event_type")
        .agg(F.round(F.sum("value"), 2).alias("sum_value"))
        .collect()
    }
    assert salted == plain


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = load_table(spark, "orders", SF)
    lineitem = load_table(spark, "lineitem", SF)
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "okey"),
        table="b_orders", bucket_col="okey", num_buckets=8,
        path=str(tmp_path / "b_orders"),
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "okey"),
        table="b_lineitem", bucket_col="okey", num_buckets=8,
        path=str(tmp_path / "b_lineitem"),
    )
    # Force the sort-merge path: broadcast would win at this tiny SF
    # and bypass bucketing entirely (which is correct planner behavior
    # — bucketing pays off when BOTH sides are too big to broadcast).
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", on="okey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # and the join result is correct
    want = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).count()
    assert joined.count() == want
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
