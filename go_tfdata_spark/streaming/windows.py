"""Watermarked event-time window aggregation over the change stream.

The reference has no watermarks (finite archives — SURVEY.md §2.9); the
engine needs them wherever stateful streaming aggregation must bound state.
This is the standard composition: `withWatermark` bounds how late an event
may arrive before its window closes; closed windows emit exactly once in
append mode. Note the MERGE ingest path deliberately does NOT drop late
data (late events re-merge idempotently via the order-conditional LWW
merge); watermarks apply only to these derived streaming aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_change_counts(
    changes: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time window of change counts per op kind,
    state bounded by `watermark`."""
    w = F.window("ts", window_duration, slide) if slide else F.window("ts", window_duration)
    # NB: exact distinct aggregation is unsupported on streams; use
    # approx_count_distinct where cardinalities are needed.
    return (
        changes.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), F.col("op"))
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.approx_count_distinct("conv_id").alias("approx_convs"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "op", "n_changes", "approx_convs",
        )
    )
