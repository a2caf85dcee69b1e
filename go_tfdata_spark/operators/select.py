"""Selections / projections — reference §2.2 (P1-P6).

The reference selects *fields of a record* by name, prefix, suffix,
substring, exact value, or a user function
(tfdata/transform/selection/selection.go:52-139); the union of selections
is kept, everything else dropped
(tfdata/transform/transformation.go:86-121). Spark-side these are
column-pruning projections — driver-side schema work that Catalyst pushes
into the scan (`ReadSchema`), which is exactly what you want at 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Selection = Callable[[DataFrame], list[str]]


def by_key(*names: str) -> Selection:
    """selection.ByKey (selection.go:52-54)."""
    return lambda df: [c for c in df.columns if c in names]


def by_prefix(prefix: str) -> Selection:
    """selection.ByPrefix (selection.go:56-60)."""
    return lambda df: [c for c in df.columns if c.startswith(prefix)]


def by_suffix(suffix: str) -> Selection:
    """selection.BySuffix (selection.go:62-65)."""
    return lambda df: [c for c in df.columns if c.endswith(suffix)]


def by_substring(sub: str) -> Selection:
    """selection.BySubstring (selection.go:67-69)."""
    return lambda df: [c for c in df.columns if sub in c]


def select_union(df: DataFrame, *selections: Selection, keep: tuple[str, ...] = ()) -> DataFrame:
    """Keep the union of the selected columns (P1/P2 semantics:
    transformation.go:102-116 keeps `__key__` implicitly; `keep` plays that
    role for the CDC key columns)."""
    chosen: list[str] = [c for c in keep if c in df.columns]
    for sel in selections:
        for c in sel(df):
            if c not in chosen:
                chosen.append(c)
    return df.select(*chosen)


def where_key_value(df: DataFrame, key: str, value) -> DataFrame:
    """selection.ByKeyValue used as a row predicate (selection.go:117-139;
    predicate use test/filter_test.go:29-47): keep rows where df[key] == value."""
    return df.filter(F.col(key) == F.lit(value))
