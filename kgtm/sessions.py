"""Sessionization + multi-level rollup metrics.

Batch analogs of the proxy's connection/session notion (a CONNECT's state
spans the requests inside it — custom_proxy.py:69-77,190-195): group events
into gap-bounded sessions and aggregate at multiple grouping levels.

Both are pure built-in operators: ``session_window`` (Spark's native
gap-session assignment, also usable in Structured Streaming with watermarks)
and ``rollup``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """(key, session_start, n_events, total_value) per gap-bounded session.

    session_window assigns each row to a session that closes after `gap` of
    inactivity — one shuffle on (key), map-side mergeable session states.
    session_start (the min ts) is the portable session identity; the window
    *end* is ts+gap-ish and engine-specific, so it is not part of the
    contract columns.
    """
    return (
        events.groupBy(
            F.col(key), F.session_window(F.col(ts_col), gap).alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col(key),
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact interpolated percentiles of `value` per event_type.

    percentile() is the exact (sort-based) aggregate — at 100 TB you would
    swap in percentile_approx (t-digest sketch, mergeable, one pass); both
    are one-line changes and the approx twin is exposed as
    ``value_percentiles_approx``.
    """
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


def value_percentiles_approx(events: DataFrame, accuracy: int = 10000) -> DataFrame:
    """Sketch-based percentiles (mergeable, single-pass — the scale path)."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.percentile_approx("value", 0.5, accuracy).alias("p50"),
        F.percentile_approx("value", 0.95, accuracy).alias("p95"),
        F.percentile_approx("value", 0.99, accuracy).alias("p99"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    )


def rollup_event_metrics(events: DataFrame) -> DataFrame:
    """Multi-level aggregate: (event_type, user_id) rollup with grand total.

    grouping_id disambiguates NULL-as-rollup from NULL-as-data.
    """
    return (
        events.rollup("event_type", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.grouping_id().alias("gid"),
        )
    )
