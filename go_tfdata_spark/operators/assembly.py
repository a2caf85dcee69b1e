"""Keyed record assembly — reference §2.1 S6/S7 and §2.5.

The reference folds an unordered stream of (key, field, value) members into
one record per key (tfdata/archive/manager.go:57-63 upsert into a per-key
member map; greedy scan loop greedyreader.go:56-87). Spark-side this is a
hash aggregation building a map per key — with map-side partial aggregation,
the pattern that scales to 10^10 members."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_records(
    df: DataFrame,
    key_cols: list[str],
    field_col: str,
    value_col: str,
    order_col: str | None = None,
) -> DataFrame:
    """Fold (key, field, value[, order]) rows into one row per key with a
    `members` map<field, value>.

    Duplicate members: the reference's UpdateRecord overwrites, i.e. the
    last-processed member wins (manager.go:57-63) — with `order_col` the
    winner per (key, field) is chosen by max order (deterministic);
    without, any-wins (matching the reference's nondeterministic map order).
    """
    if order_col is not None:
        df = df.groupBy(*key_cols, field_col).agg(
            F.max_by(F.col(value_col), F.col(order_col)).alias(value_col)
        )
    return (
        df.groupBy(*key_cols)
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct(F.col(field_col), F.col(value_col))))
            ).alias("members")
        )
    )


def complete_records(df: DataFrame, expected_fields: list[str], members_col: str = "members") -> DataFrame:
    """S7 — SameMembers completeness (manager.go:33-43): keep records whose
    member-name set equals `expected_fields` (the seek reader emits a record
    the moment its member set is complete, seekreader.go:125-135)."""
    expected = F.array([F.lit(x) for x in sorted(expected_fields)])
    return df.filter(F.array_sort(F.map_keys(F.col(members_col))) == expected)
