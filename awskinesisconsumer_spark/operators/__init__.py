"""Batch operators — each module implements one or more rows of the
SURVEY.md §2 operator inventory, Spark-first (no RDDs, no driver loops).
"""

from awskinesisconsumer_spark.operators.asof_join import asof_join_next_boundary, asof_join_backward
from awskinesisconsumer_spark.operators.segmentation import segment_by_boundary, aggregate_segments
from awskinesisconsumer_spark.operators.pivot_assembly import pivot_event_counts, assemble_kv_map
from awskinesisconsumer_spark.operators.sampling import throttle_first_per_window
from awskinesisconsumer_spark.operators.retention import top_k_by_recency
from awskinesisconsumer_spark.operators.lookup import point_lookup, last_row
from awskinesisconsumer_spark.operators.routing import route_errors
from awskinesisconsumer_spark.operators.explode import decode_explode
from awskinesisconsumer_spark.operators.ids import assign_monotonic_id

__all__ = [
    "asof_join_next_boundary", "asof_join_backward",
    "segment_by_boundary", "aggregate_segments",
    "pivot_event_counts", "assemble_kv_map",
    "throttle_first_per_window",
    "top_k_by_recency",
    "point_lookup", "last_row",
    "route_errors",
    "decode_explode",
    "assign_monotonic_id",
]
