"""The flagship end-to-end plan: the reference's whole pipeline condensed
into one batch DAG over the `events` table (SURVEY §7 step 1).

Pipeline (reference analogue in parens):
  route errors off the data path   (parser.py:357-360)
  -> as-of join each event to the next 'signup' boundary per user
                                   (parser.py:421-432)
  -> throttle: first event per (user, 10 min)   (parser.py:460-463)
  -> retention: newest 5 per user               (parser.py:470-481)
  -> per-user rollup of what survived

One scan, two shuffles (both on user_id — the as-of window and the
throttle agg share the key, and AQE coalesces the tail). No joins at
all: the boundary metadata rides the same keyed stream, so the
union-window as-of strategy applies (see operators/asof_join.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from awskinesisconsumer_spark.io import load_table
from awskinesisconsumer_spark.operators import (
    asof_join_next_boundary,
    throttle_first_per_window,
    top_k_by_recency,
)


def flagship_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    data = events.where(F.col("event_type") != "error")

    tagged = asof_join_next_boundary(
        data,
        key="user_id",
        order="event_id",
        is_boundary=F.col("event_type") == "signup",
        boundary_cols=["ts"],
    )
    sampled = throttle_first_per_window(
        tagged, key="user_id", ts="ts", order="event_id", span_seconds=600
    )
    retained = top_k_by_recency(sampled, order="event_id", k=5, key="user_id")

    return retained.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.max("event_id").alias("last_event_id"),
        F.count("tag_event_id").alias("n_tagged"),
    )
