"""Row filters — reference §2.2 F1/F2 (tfdata/filter/filter.go).

The reference drops records that are empty or contain only the key
(filter.go:59-68). CDC analogs: `non_empty` drops rows whose payload
columns are all NULL/empty; tombstone folding itself lives in
operators/merge.py (fold_changes)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def non_empty(df: DataFrame, payload_cols: list[str] | None = None, key_cols: tuple = ()) -> DataFrame:
    """Drop rows where every payload column is NULL or '' — the analog of
    EmptySamples/EmptyExamples (filter.go:28-57: a record with only
    `__key__` is empty)."""
    cols = payload_cols or [c for c in df.columns if c not in key_cols]
    pred = None
    for c in cols:
        p = F.col(c).isNotNull() & (F.col(c).cast("string") != F.lit(""))
        pred = p if pred is None else (pred | p)
    return df.filter(pred) if pred is not None else df
