"""Skew diagnostics — choosing when/how to salt.

Zipf-skewed conv_ids are a named hard part of the north rule: the LWW fold
already absorbs duplicate-heavy keys via map-side combine, AQE splits
skewed join partitions at runtime, and `lww_latest(salt_buckets=N)` adds an
explicit two-phase fold. This module provides the measurement that drives
those choices."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key_cols: list[str], top: int = 20) -> DataFrame:
    """Top-N keys by row count (deterministic tiebreak on the key)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), *[F.asc(c) for c in key_cols])
        .limit(top)
    )


def skew_stats(df: DataFrame, key_cols: list[str]) -> dict:
    """One-pass skew summary: rows, distinct keys, max/mean key frequency,
    and the skew ratio (max/mean) — salt when the ratio is large relative
    to the shuffle partition count."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    row = counts.agg(
        F.count(F.lit(1)).alias("distinct_keys"),
        F.sum("n").alias("rows"),
        F.max("n").alias("max_freq"),
        F.avg("n").alias("mean_freq"),
    ).first()
    ratio = float(row["max_freq"]) / float(row["mean_freq"]) if row["mean_freq"] else 0.0
    return {
        "rows": int(row["rows"]),
        "distinct_keys": int(row["distinct_keys"]),
        "max_freq": int(row["max_freq"]),
        "mean_freq": float(row["mean_freq"]),
        "skew_ratio": ratio,
    }


def recommend_salt_buckets(stats: dict, shuffle_partitions: int) -> int:
    """Heuristic: salt a hot key into enough sub-groups that its largest
    reducer share drops to ~the mean partition load; 1 = no salting."""
    if stats["distinct_keys"] == 0:
        return 1
    per_partition = max(stats["rows"] / max(shuffle_partitions, 1), 1.0)
    need = int(stats["max_freq"] / per_partition)
    return max(1, min(need, shuffle_partitions))
